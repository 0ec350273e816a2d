"""Intensity normalization and color mapping ops.

Device equivalents of 5_gain_fusion_ply_builder.py:276-338 and
core/transforms.py:225-263.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "normalize_intensity",
    "intensity_to_heat_rgb",
    "intensity_to_grayscale",
    "gains_to_rgb",
    "gain_constant_colors",
]


@jax.jit
def normalize_intensity(
    intensity: jnp.ndarray,
    valid: Optional[jnp.ndarray] = None,
    percentile: float = 99.0,
) -> jnp.ndarray:
    """Percentile normalization to 0-255
    (5_gain_fusion_ply_builder.py:276-289): max = percentile(p), min = min,
    clipped linear rescale.  ``valid`` masks padding out of the statistics.
    """
    if valid is None:
        vals = intensity
        max_val = jnp.percentile(vals, percentile)
        min_val = jnp.min(vals)
    else:
        # replace padding with NaN and use NaN-aware statistics
        vals = jnp.where(valid, intensity, jnp.nan)
        max_val = jnp.nanpercentile(vals, percentile)
        min_val = jnp.nanmin(vals)
    span = max_val - min_val
    normalized = (intensity - min_val) / jnp.where(span > 0, span, 1.0) * 255.0
    normalized = jnp.where(span > 0, normalized, 0.0)
    return jnp.clip(normalized, 0.0, 255.0)


@jax.jit
def intensity_to_heat_rgb(intensity: jnp.ndarray) -> jnp.ndarray:
    """4-segment heat colormap blue->cyan->green->yellow->red over a 0-255
    input (5_gain_fusion_ply_builder.py:292-327).  Returns (N, 3) uint8."""
    t = intensity / 255.0
    seg = jnp.clip((t * 4).astype(jnp.int32), 0, 3)
    frac = t * 4 - seg  # position within segment

    def u8(v):
        return (v * 255).astype(jnp.uint8)

    r = jnp.select(
        [seg == 0, seg == 1, seg == 2, seg == 3],
        [jnp.zeros_like(frac), jnp.zeros_like(frac), frac, jnp.ones_like(frac)],
    )
    g = jnp.select(
        [seg == 0, seg == 1, seg == 2, seg == 3],
        [frac, jnp.ones_like(frac), jnp.ones_like(frac), 1.0 - frac],
    )
    b = jnp.select(
        [seg == 0, seg == 1, seg == 2, seg == 3],
        [jnp.ones_like(frac), 1.0 - frac, jnp.zeros_like(frac),
         jnp.zeros_like(frac)],
    )
    return jnp.stack([u8(r), u8(g), u8(b)], axis=-1)


@jax.jit
def intensity_to_grayscale(values: jnp.ndarray) -> jnp.ndarray:
    """Grayscale RGB from a 0-255 intensity (core/transforms.py:225-240)."""
    clipped = jnp.clip(values, 0, 255).astype(jnp.uint8)
    return jnp.stack([clipped, clipped, clipped], axis=-1)


def gains_to_rgb(
    gains: np.ndarray,
    gain_colors: Dict[int, Tuple[int, int, int]],
    default: Tuple[int, int, int] = (0, 0, 0),
) -> np.ndarray:
    """Per-point RGB from per-point gain labels
    (5_gain_fusion_ply_builder.py:330-338)."""
    gains = np.asarray(gains)
    rgb = np.full((gains.shape[0], 3), default, dtype=np.uint8)
    for gain, color in gain_colors.items():
        rgb[gains == gain] = color
    return rgb


def gain_constant_colors(
    n: int,
    gain: int,
    gain_colors: Dict[int, Tuple[int, int, int]],
    default: Tuple[int, int, int] = (180, 180, 180),
) -> np.ndarray:
    """Constant tint for all points of one gain (core/transforms.py:243-262)."""
    rgb = np.array(gain_colors.get(gain, default), dtype=np.uint8)
    return np.repeat(rgb[None, :], n, axis=0)
