"""Conversion stage: radar CSVs to Cartesian x,y,z CSVs.

Capability parity with radar-pipeline processors/cartesian.py:16-125 (single
+ batch-aligned modes) with the conversion itself running on device through
the fused geometry program.
"""

from __future__ import annotations

from itertools import islice
from pathlib import Path
from typing import Dict, Iterable, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..config import GainConfig, RadarConfig
from ..core.loaders import load_radar_csv
from ..core.writers import write_cartesian_csv
from ..core.containers import PointCloud
from ..ops.geometry import _auto_capacity, convert_sweep

__all__ = ["convert_single_csv", "aligned_inputs", "convert_batch_aligned"]


def convert_single_csv(
    input_path: Path,
    output_path: Path,
    threshold: float = 0.0,
    config: Optional[RadarConfig] = None,
) -> int:
    """Convert one radar CSV to an x,y,z CSV (threshold mask, no stride,
    reference processors/cartesian.py:16-55).  Returns points written."""
    sweep = load_radar_csv(input_path, config)
    echo = jnp.asarray(sweep.intensities)
    cap = _auto_capacity(int(echo.size), 1)
    xyz, count = convert_sweep(
        echo, jnp.asarray(sweep.angles_rad), jnp.asarray(sweep.scale),
        jnp.ones(echo.shape[0], bool), jnp.float32(threshold),
        1, cap, echo.shape[1])
    n = int(count)
    arr = np.asarray(xyz)[:n]
    write_cartesian_csv(Path(output_path),
                        PointCloud(x=arr[:, 0], y=arr[:, 1], z=arr[:, 2]))
    return n


def aligned_inputs(
    base_dir: Path,
    gains: Tuple[int, ...],
) -> Iterable[Tuple[int, Dict[int, Path]]]:
    """k-th file of each gain folder by sort order -> aligned sets
    (reference processors/cartesian.py:58-87)."""
    listing: Dict[int, list] = {}
    for g in gains:
        folder = Path(base_dir) / f"gain_{g}"
        files = sorted(folder.glob("*.csv"))
        if not files:
            raise FileNotFoundError(f"No CSVs found in {folder}")
        listing[g] = files
    count = min(len(v) for v in listing.values())
    for idx in range(count):
        yield idx + 1, {g: listing[g][idx] for g in gains}


def convert_batch_aligned(
    base_dir: Path,
    output_dir: Path,
    gains: Optional[Tuple[int, ...]] = None,
    threshold: float = 0.0,
    limit: Optional[int] = None,
    config: Optional[RadarConfig] = None,
    verbose: bool = True,
) -> int:
    """Batch conversion of aligned gain sets; outputs
    ``NNNN_gain_G_cartesian.csv`` under per-gain folders.  Returns the number
    of files written."""
    if gains is None:
        gains = GainConfig().values
    written = 0
    for idx, group in islice(aligned_inputs(base_dir, gains), limit):
        for gain, src in group.items():
            out_name = f"{idx:04d}_gain_{gain}_cartesian.csv"
            out_path = Path(output_dir) / f"gain_{gain}" / out_name
            n = convert_single_csv(src, out_path, threshold, config)
            written += 1
            if verbose:
                print(f"[{idx:04d}] gain {gain}: {src.name} -> {out_path} "
                      f"({n:,} points)")
    return written
