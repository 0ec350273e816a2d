"""Color-derived metadata ops: time inference from gain tints, object colors.

Reference: radar-pipeline processors/clustering.py:17-46 (color -> time),
4_temporal_object_tracker.py:666-688 (golden-ratio object colors).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "infer_time_from_colors",
    "golden_ratio_color",
    "label_palette_tab20",
]


def infer_time_from_colors(
    colors: np.ndarray,
    gain_colors: Optional[Dict[int, Tuple[int, int, int]]] = None,
) -> np.ndarray:
    """Nearest-gain-tint time inference: each point's RGB maps to the index
    of its closest palette entry in sorted-gain order (the per-gain layer it
    came from acts as the time step)."""
    if gain_colors is None:
        from ..config import GainConfig

        gain_colors = GainConfig().colors
    gains_sorted = sorted(gain_colors.keys())
    palette = np.array([gain_colors[g] for g in gains_sorted], dtype=np.float32)
    return np.asarray(
        _nearest_palette(jnp.asarray(colors, dtype=jnp.float32),
                         jnp.asarray(palette))
    ).astype(np.float32)


@jax.jit
def _nearest_palette(colors: jnp.ndarray, palette: jnp.ndarray) -> jnp.ndarray:
    diffs = colors[:, None, :] - palette[None, :, :]
    dist2 = jnp.sum(diffs * diffs, axis=2)
    return jnp.argmin(dist2, axis=1)


def golden_ratio_color(obj_id: int) -> Tuple[int, int, int]:
    """Distinct per-object RGB from a golden-ratio hue walk
    (4_temporal_object_tracker.py:666-688)."""
    hue = (obj_id * 0.618033988749895) % 1.0
    h_i = int(hue * 6)
    f = hue * 6 - h_i
    q = 1 - f
    table = {
        0: (1, f, 0), 1: (q, 1, 0), 2: (0, 1, f),
        3: (0, q, 1), 4: (f, 0, 1), 5: (1, 0, q),
    }
    r, g, b = table.get(h_i, (1, 0, q))
    return (int(r * 255), int(g * 255), int(b * 255))


def label_palette_tab20(labels: np.ndarray,
                        noise_gray: int = 128) -> np.ndarray:
    """tab20-style color LUT for cluster labels; noise (-1) is gray
    (stdbscan_denoising_pipeline.py:780-791)."""
    import matplotlib.pyplot as plt

    labels = np.asarray(labels)
    colors = np.full((labels.shape[0], 3), noise_gray, dtype=np.uint8)
    mask = labels >= 0
    if mask.any():
        cmap = plt.get_cmap("tab20")
        lut = (np.array([cmap(i)[:3] for i in range(20)]) * 255).astype(np.uint8)
        colors[mask] = lut[labels[mask] % 20]
    return colors
