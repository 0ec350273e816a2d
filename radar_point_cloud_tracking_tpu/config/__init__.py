"""Hierarchical configuration for the TPU radar pipeline.

Mirrors the reference config surface (radar-pipeline config/models.py:11-81 and
the script-level constants in PointCloudWork/4_temporal_object_tracker.py:55-91,
PointCloudWorkF/stdbscan_denoising_pipeline.py:63-80) as pydantic models with
YAML round-trip.  Precedence everywhere: CLI flag > YAML > default.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional, Tuple

from pydantic import BaseModel, Field

__all__ = [
    "GainConfig",
    "RadarConfig",
    "ProcessingConfig",
    "ClusteringConfig",
    "LandFilterConfig",
    "TrackingConfig",
    "FusionConfig",
    "DeviceConfig",
    "PipelineConfig",
]


class GainConfig(BaseModel):
    """Radar gain levels, their display colors and stacked-view z offsets."""

    values: Tuple[int, ...] = (40, 50, 75)
    colors: Dict[int, Tuple[int, int, int]] = Field(
        default={
            40: (0, 114, 255),  # blue
            50: (0, 200, 83),  # green
            75: (255, 87, 34),  # orange
        }
    )
    z_offsets: Dict[int, float] = Field(
        default={
            75: 0.0,  # bottom layer
            50: 250.0,  # middle layer
            40: 500.0,  # top layer
        }
    )


class RadarConfig(BaseModel):
    """Physical radar sweep parameters."""

    angle_scale: float = 360.0 / 8196.0  # radar angle units -> degrees
    num_echo_columns: int = 1024
    range_bin_width_m: float = 0.5
    range_start_m: float = 0.0
    max_sweep_rows: int = 8192  # static padding bound for batched device sweeps


class ProcessingConfig(BaseModel):
    """Point-cloud construction parameters."""

    intensity_threshold: float = 0.0
    point_stride: int = 16
    max_points_per_gain: int = 10_000_000
    max_points_stack: int = 20_000_000
    plot_max_points: int = 1_000_000
    # static device-side capacity for one compacted sweep (points after
    # threshold+stride); sweeps producing more points are truncated with a
    # warning.  8196*1024/16 covers stride>=16 worst case fully.
    sweep_point_capacity: int = 600_000


class ClusteringConfig(BaseModel):
    """ST-DBSCAN parameters."""

    eps_space: float = 5.0
    eps_time: float = 1.0
    min_samples: int = 10
    min_frames: int = 1  # >=2 enables temporal-persistence core test
    max_points: int = 10_000_000
    # device engine tuning
    # points per tile in the neighbor engine.  1024 won the round-4 chip
    # A/B at every measured scale (tracker 385k/1.55M pts, denoise
    # 2.4M/4.7M/9.5M pts: -1.8% to -14.7% cluster program, labels
    # bit-equal; .chip_logs/tile_sweep_r4.log, tile_tracker_r4.log) —
    # halving the tile-pair count outweighs the larger (T, T) predicate
    # block.  512 remains a supported knob.
    tile_size: int = 1024
    cell_size: Optional[float] = None  # spatial hash cell; default = eps_space
    max_label_sweeps: int = 64  # safety bound on label-propagation rounds


class LandFilterConfig(BaseModel):
    """Persistence-based land/background filtering."""

    enabled: bool = True
    persistence_threshold: float = 0.8  # fraction of frames a cell is occupied
    grid_resolution_m: float = 5.0
    min_intensity: float = 100.0
    min_frames_required: int = 10  # skip filter below this many frames
    # decide land verdicts on the host straight from the sparse parse output
    # (bit-identical to the reference composition: float64 np.arange edges,
    # np.digitize semantics, float64 intensity sums) so filtered points
    # never cross the host->device wire; requires the native sparse ingest
    # path.  The device fallback digitizes bit-exactly against the same
    # float64 edges (ops/grid.py edges_hilo) but accumulates intensity in
    # float32 — a cell whose float64 average sits within f32-accumulation
    # error of min_intensity may receive a different verdict there.
    host_prefilter: bool = True


class TrackingConfig(BaseModel):
    """Hungarian tracker + motion classifier parameters."""

    max_association_distance: float = 50.0
    max_missed_frames: int = 10
    stationary_velocity_threshold: float = 1.0  # m/frame
    motion_history_frames: int = 5
    # static device capacities (also the Hungarian problem size — keep
    # modest: the solver's sequential augmenting loop scales with capacity)
    max_objects: int = 64
    max_clusters_per_frame: int = 64


class FusionConfig(BaseModel):
    """Multi-gain fusion parameters."""

    mode: str = "absolute"  # "absolute" | "max"
    grid_resolution_m: float = 1.0  # cell size for max-pool fusion
    normalize_intensity: bool = True
    intensity_percentile: float = 99.0
    max_time_diff_ms: int = 2000  # frame grouping window
    intensity_threshold: float = 10.0
    point_stride: int = 4


class DeviceConfig(BaseModel):
    """Device-mesh / execution parameters."""

    num_devices: int = 0  # 0 = all available
    mesh_axis: str = "frames"
    # Hybrid Pallas engine (TPU only): the degree-stats full sweep runs as
    # the manual-DMA Pallas kernel — measured 186 ms vs 235 ms XLA
    # standalone at the bench scene's 1.55M points (in the full cluster
    # program the difference is within noise: 1433 vs 1430 ms) — while the
    # min sweeps stay XLA (DMA min kernel measured a wash, 290 vs 284 ms,
    # and the gated incremental tail is XLA's strength).  Full A/B record
    # in ROUND3.md.
    use_pallas: bool = True
    ingest_prefetch: int = 2  # host->device pipelining depth
    # host CSV-parse thread pool size; 0 = one worker per host core (the
    # native parser releases the GIL, so parsing scales across cores)
    parse_workers: int = 0


class PipelineConfig(BaseModel):
    """Main pipeline configuration combining all sub-configs."""

    gains: GainConfig = Field(default_factory=GainConfig)
    radar: RadarConfig = Field(default_factory=RadarConfig)
    processing: ProcessingConfig = Field(default_factory=ProcessingConfig)
    clustering: ClusteringConfig = Field(default_factory=ClusteringConfig)
    land_filter: LandFilterConfig = Field(default_factory=LandFilterConfig)
    tracking: TrackingConfig = Field(default_factory=TrackingConfig)
    fusion: FusionConfig = Field(default_factory=FusionConfig)
    device: DeviceConfig = Field(default_factory=DeviceConfig)

    @classmethod
    def from_yaml(cls, path: Path) -> "PipelineConfig":
        """Load configuration from a YAML file."""
        import yaml

        with Path(path).open("r", encoding="utf-8") as fh:
            data = yaml.safe_load(fh) or {}
        return cls(**data)

    def to_yaml(self, path: Path) -> None:
        """Save configuration to a YAML file."""
        import yaml

        with Path(path).open("w", encoding="utf-8") as fh:
            yaml.dump(self.model_dump(mode="json"), fh,
                      default_flow_style=False)
