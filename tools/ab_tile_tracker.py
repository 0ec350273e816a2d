#!/usr/bin/env python3
"""Tile-size A/B at TRACKER scale (land-filtered bench scene, ~1.55M pts).

The round-4 denoise-scale sweep (.chip_logs/tile_sweep_r4.log) showed
tile=1024 beating 512 at every measured density (2.4M: -14.7%, 4.7M:
-6.4%, 9.5M: -3.3%).  This measures the remaining scale — the tracker
flagship's land-filtered scene with the tracker's exact clustering call
(time = frame id column 4, min_frames=1, border "always") — to place the
auto tile-size rule's crossover.  Labels must be identical across tile
sizes (tiling is an implementation detail of the canonicalized engine).

Usage: python tools/ab_tile_tracker.py [frames=N] [tile ...]
       (default frames=100, tiles 512 1024)
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def main():
    frames = 100
    args = []
    for a in sys.argv[1:]:
        if a.startswith("frames="):
            frames = int(a.split("=", 1)[1])
        else:
            args.append(int(a))
    tiles = args or [512, 1024]
    from tools._scene import load_bench_scene
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        build_spatial_index)
    from radar_point_cloud_tracking_tpu.ops.stdbscan import cluster_index

    points, n, cap, cfg = load_bench_scene(frames)
    print(f"tracker scene: {n:,} points, capacity {cap:,}")
    es, et = jnp.float32(8.0), jnp.float32(2.0)
    valid = jnp.arange(cap) < jnp.int32(n)

    ref_labels = None
    for tile in tiles:
        t0 = time.perf_counter()
        idx = build_spatial_index(points[:, :2], points[:, 4], valid,
                                  8.0, 2.0, tile=tile, pairs=True)
        jax.block_until_ready(idx.cand_idx)
        tb = time.perf_counter() - t0
        print(f"tile={tile}: nt={idx.num_tiles}, "
              f"k_pad={idx.cand_idx.shape[1]}, "
              f"max_cand={int(np.asarray(idx.cand_count).max())}, "
              f"pairs={int(idx.pair_count):,} "
              f"(P_pad={idx.pair_a.shape[0]}), build {tb:.2f}s")

        def prog():
            lbl, k = cluster_index(idx, es, et, 15, 1, 0, "always",
                                   256, use_pallas=True)
            jax.block_until_ready(lbl)
            return lbl, k

        lbl, k = prog()  # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            lbl, k = prog()
            ts.append(time.perf_counter() - t0)
        la = np.asarray(lbl)[:n]
        if ref_labels is None:
            ref_labels = la
            eq = True
        else:
            eq = bool(np.array_equal(ref_labels, la))
        print(f"tile={tile}: cluster program {min(ts)*1e3:7.0f} ms "
              f"({int(k)} clusters, labels==tile{tiles[0]}: {eq})")
        assert eq


if __name__ == "__main__":
    main()
