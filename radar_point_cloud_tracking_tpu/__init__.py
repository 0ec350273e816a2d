"""radar_point_cloud_tracking_tpu — TPU-native marine-radar point-cloud
processing and object tracking.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference ``radar-point-cloud-tracking`` project: radar CSV ingestion,
polar->Cartesian conversion, multi-gain fusion, persistence-based land
filtering, ST-DBSCAN spatio-temporal clustering, Hungarian tracking with
buoy/boat classification, and PLY/CSV/PNG artifact generation — with the
compute path expressed as batched, statically-shaped XLA programs sharded
over a TPU device mesh.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: the tunneled TPU compiler costs tens of
# seconds per program, the cache brings warm starts down to ~1s.  Opt out
# with RADAR_TPU_NO_COMPILE_CACHE=1.
if (_os.environ.get("RADAR_TPU_NO_COMPILE_CACHE", "0") != "1"
        and "cpu" not in _os.environ.get("JAX_PLATFORMS", "")):
    # TPU only: local CPU compiles are fast, and cached CPU AOT artifacts
    # from other machines trigger feature-mismatch fallbacks
    import jax as _jax

    _cache_dir = _os.environ.get(
        "RADAR_TPU_COMPILE_CACHE",
        _os.path.join(_os.path.dirname(__file__), "..", ".jax_cache_tpu"))
    try:
        _jax.config.update("jax_compilation_cache_dir", _cache_dir)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:  # pragma: no cover - older jax without the option
        pass

from .config import (  # noqa: F401
    ClusteringConfig,
    DeviceConfig,
    FusionConfig,
    GainConfig,
    LandFilterConfig,
    PipelineConfig,
    ProcessingConfig,
    RadarConfig,
    TrackingConfig,
)
from .core import (  # noqa: F401
    Cluster,
    PointCloud,
    RadarFrame,
    RadarSweep,
    TrackedObject,
    detect_csv_format,
    load_cartesian_csv,
    load_ply,
    load_points_auto,
    load_radar_csv,
    load_radar_sweep_simple,
    write_cartesian_csv,
    write_labels_csv,
    write_ply,
)
from .utils import (  # noqa: F401
    discover_files,
    find_gain_sweeps,
    group_files_by_frame,
    parse_timestamp,
)
