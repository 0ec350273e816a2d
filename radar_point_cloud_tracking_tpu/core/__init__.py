"""Core data model and I/O."""

from .containers import (  # noqa: F401
    Cluster,
    FramePoints,
    PointCloud,
    RadarFrame,
    RadarSweep,
    TrackedObject,
)
from .loaders import (  # noqa: F401
    detect_csv_format,
    load_cartesian_csv,
    load_ply,
    load_points_auto,
    load_radar_csv,
    load_radar_sweep_simple,
    load_radar_table,
)
from .transforms import (  # noqa: F401
    apply_stride,
    apply_z_offset,
    gain_to_colors,
    intensity_to_colors,
    polar_to_cartesian,
    subsample_cloud,
    sweep_to_point_cloud,
    sweep_to_points_simple,
)
from .writers import (  # noqa: F401
    ply_header,
    write_cartesian_csv,
    write_labels_csv,
    write_ply,
    write_ply_arrays,
)
