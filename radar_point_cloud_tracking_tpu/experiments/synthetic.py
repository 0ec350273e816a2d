"""Synthetic radar scene generator.

The reference repo ships no data (its .gitignore excludes *.csv/*.ply), so
benchmarks and experiments synthesize physically-plausible scenes: a
persistent land mass, stationary buoys, moving boats and background noise,
rendered into the radar CSV format (Status,Scale,Range,Gain,Angle,Echo_*)
with per-gain sensitivity differences and timestamped filenames.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path
from typing import Sequence, Tuple

import numpy as np

__all__ = ["SceneConfig", "generate_scene_dataset"]


@dataclass
class SceneConfig:
    num_frames: int = 20
    num_rows: int = 512  # angle rows per sweep
    num_bins: int = 256  # echo columns
    scale_m: float = 496.0  # radar Scale (max range)
    gains: Sequence[int] = (40, 50, 75)
    num_boats: int = 3
    num_buoys: int = 4
    boat_speed: float = 3.0  # meters per frame
    noise_rate: float = 0.001  # fraction of cells with random noise
    land_arc: Tuple[float, float] = (0.3, 1.2)  # radians of the land sector
    land_range: Tuple[float, float] = (0.55, 0.9)  # fraction of scale
    frame_period_s: int = 3
    seed: int = 0


def _world_to_cell(x, y, cfg: SceneConfig):
    """Map world coordinates into (row, bin) sweep cells (row-index angle
    convention)."""
    r = np.hypot(x, y)
    theta = np.mod(np.arctan2(y, x), 2 * np.pi)
    row = (theta / (2 * np.pi) * cfg.num_rows).astype(int) % cfg.num_rows
    bin_width = cfg.scale_m / cfg.num_bins
    b = (r / bin_width).astype(int)
    ok = (b >= 0) & (b < cfg.num_bins)
    return row[ok], b[ok]


def _paint_blob(echo, cx, cy, radius_m, intensity, cfg, rng, density=60):
    ang = rng.uniform(0, 2 * np.pi, density)
    rad = np.abs(rng.normal(0, radius_m, density))
    x = cx + rad * np.cos(ang)
    y = cy + rad * np.sin(ang)
    rows, bins = _world_to_cell(x, y, cfg)
    echo[rows, bins] = np.maximum(
        echo[rows, bins], intensity + rng.normal(0, 10, len(rows)))


def generate_scene_dataset(out_dir: Path, cfg: SceneConfig) -> Path:
    """Write gain_NN/timestamped CSVs for a moving-object scene."""
    rng = np.random.default_rng(cfg.seed)
    out_dir = Path(out_dir)

    # object tracks in world space
    boats = []
    for _ in range(cfg.num_boats):
        start = rng.uniform(-0.4, 0.4, 2) * cfg.scale_m
        heading = rng.uniform(0, 2 * np.pi)
        vel = cfg.boat_speed * np.array([np.cos(heading), np.sin(heading)])
        boats.append((start, vel))
    buoys = [rng.uniform(-0.45, 0.45, 2) * cfg.scale_m
             for _ in range(cfg.num_buoys)]

    # gain sensitivity: higher gain sees weaker returns (more noise too)
    gain_bias = {g: (g - 40) * 0.8 for g in cfg.gains}

    angle_units = np.round(
        np.linspace(0, 8196, cfg.num_rows, endpoint=False)).astype(int)

    for gain in cfg.gains:
        gdir = out_dir / f"gain_{gain}"
        gdir.mkdir(parents=True, exist_ok=True)

    header = ("Status,Scale,Range,Gain,Angle,"
              + ",".join(f"Echo_{i}" for i in range(cfg.num_bins)))

    for f in range(cfg.num_frames):
        for gi, gain in enumerate(cfg.gains):
            echo = np.zeros((cfg.num_rows, cfg.num_bins), np.float32)

            # land: persistent high-intensity sector.  Painted densely (every
            # cell of the sector every frame) so the persistence filter sees
            # a solid mass — sparse sampling would leave half-persistent
            # fringe cells that survive filtering as clutter clusters.
            a0, a1 = cfg.land_arc
            r0 = cfg.land_range[0] * cfg.scale_m
            r1 = cfg.land_range[1] * cfg.scale_m
            row_lo = int(a0 / (2 * np.pi) * cfg.num_rows)
            row_hi = int(a1 / (2 * np.pi) * cfg.num_rows)
            bin_w = cfg.scale_m / cfg.num_bins
            bin_lo = int(r0 / bin_w)
            bin_hi = min(int(r1 / bin_w), cfg.num_bins)
            land_block = 180 + rng.normal(
                0, 15, (row_hi - row_lo, bin_hi - bin_lo))
            echo[row_lo:row_hi, bin_lo:bin_hi] = np.maximum(
                echo[row_lo:row_hi, bin_lo:bin_hi], land_block)

            # boats (move) + buoys (stay)
            for start, vel in boats:
                pos = start + vel * f
                _paint_blob(echo, pos[0], pos[1], 4.0,
                            150 + gain_bias[gain], cfg, rng)
            for pos in buoys:
                _paint_blob(echo, pos[0], pos[1], 2.5,
                            130 + gain_bias[gain], cfg, rng, density=40)

            # background noise
            n_noise = int(cfg.num_rows * cfg.num_bins * cfg.noise_rate
                          * (1 + 0.3 * gi))
            nr = rng.integers(0, cfg.num_rows, n_noise)
            nb = rng.integers(0, cfg.num_bins, n_noise)
            echo[nr, nb] = rng.uniform(15, 80, n_noise)

            # quantize to the radar's integer echo range
            echo = np.clip(np.round(echo), 0, 255).astype(np.float32)

            # render CSV
            sec = f * cfg.frame_period_s
            ts = f"20250813_14{sec // 60:02d}{sec % 60:02d}_{(gi * 100):03d}"
            path = out_dir / f"gain_{gain}" / f"{ts}.csv"
            _write_sweep_csv(path, header, echo, angle_units, cfg, gain)
    return out_dir


def _write_sweep_csv(path, header, echo, angle_units, cfg, gain):
    meta = np.empty((cfg.num_rows, 5), np.float32)
    meta[:, 0] = 1
    meta[:, 1] = cfg.scale_m
    meta[:, 2] = 3
    meta[:, 3] = gain
    meta[:, 4] = angle_units
    table = np.concatenate([meta, echo], axis=1)
    int_table = table.astype(np.int64)
    with Path(path).open("w", encoding="utf-8") as fh:
        fh.write(header + "\n")
        if np.array_equal(int_table, table) and float(cfg.scale_m).is_integer():
            # integral data: pandas' C writer is ~10x faster than savetxt
            import pandas as pd

            pd.DataFrame(int_table).to_csv(fh, header=False, index=False)
        else:
            np.savetxt(fh, table, fmt="%g", delimiter=",")
