"""Visualization suite (matplotlib Agg + PIL)."""

from .plotting import (  # noqa: F401
    labels_to_colors,
    plot_labeled_cloud,
    plot_ply_preview,
    plot_point_cloud,
)
