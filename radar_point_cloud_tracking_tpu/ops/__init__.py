"""Device compute ops (jax/XLA/pallas)."""

from .geometry import polar_to_cartesian, sweep_to_point_cloud_host  # noqa: F401
from .hungarian import solve_lsa, solve_lsa_host  # noqa: F401
from .stdbscan import st_dbscan, st_dbscan_device  # noqa: F401
from .tracking import track_sequence  # noqa: F401
