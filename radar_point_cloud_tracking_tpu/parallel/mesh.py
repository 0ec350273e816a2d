"""Device-mesh helpers for the frame-sharded pipeline."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

__all__ = ["make_frames_mesh", "FRAMES_AXIS"]

FRAMES_AXIS = "frames"


def make_frames_mesh(num_devices: int = 0,
                     devices: Optional[Sequence] = None) -> Mesh:
    """1D mesh over the frame/time axis.

    The radar pipeline's natural parallel dimension is the frame sequence
    (SURVEY §2.6): conversion and fusion are embarrassingly parallel per
    frame, the land grid reduces with a psum, and clustering only couples
    shards within the eps_time halo.
    """
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (FRAMES_AXIS,))
