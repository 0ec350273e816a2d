"""End-to-end pipeline drivers (the framework's model families)."""

from .cluster_ply import (  # noqa: F401
    cluster_point_cloud,
    process_ply_clustering,
    subsample_cloud,
)
from .denoiser import DenoiseResult, run_denoising_pipeline  # noqa: F401
from .fusion_builder import (  # noqa: F401
    build_gain_comparison,
    build_individual_frames,
    build_stacked_sequence,
)
from .ingest import FrameBatchLoader, IngestedFrames  # noqa: F401
from .stack_builder import build_stacked_clouds, combine_clouds  # noqa: F401
from .tracker import (  # noqa: F401
    TrackingPipeline,
    TrackingResult,
    run_tracking_pipeline,
)
