#!/usr/bin/env python3
"""Diagnose the candidate-count hotspot on the denoise bench scene.

Prints the per-tile candidate-count distribution and, for the widest
tiles, their bbox extent, time span, point count, and location — to tell
whether the k_pad=8192 hotspot is a spatial pile-up (one cell, many
frames), a bbox artifact (tile spanning distant cells), or something
else worth engineering against.

Usage: python tools/diag_hotspot.py [tracker|denoise] [tile]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax.numpy as jnp


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "denoise"
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    from tools._scene import load_bench_scene, load_bench_scene_denoise
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        build_spatial_index)

    load = load_bench_scene_denoise if mode == "denoise" else load_bench_scene
    points, n, cap, cfg = load(100)
    print(f"{mode} scene: {n:,} points, capacity {cap:,}")
    es, et = 8.0, 2.0
    idx = build_spatial_index(points[:, :2], points[:, 3],
                              jnp.arange(cap) < jnp.int32(n),
                              es, et, tile=tile, pairs=True)
    cc = np.asarray(idx.cand_count)
    pc = int(np.asarray(idx.pair_count))
    print(f"nt={idx.num_tiles} tile={tile} pairs={pc:,} "
          f"k_pad={idx.cand_idx.shape[1]}")
    print(f"cand_count: mean={cc.mean():.1f} median={np.median(cc):.0f} "
          f"p90={np.percentile(cc, 90):.0f} p99={np.percentile(cc, 99):.0f} "
          f"p99.9={np.percentile(cc, 99.9):.0f} max={cc.max()}")
    # how much of the table do the top tiles own?
    s = np.sort(cc)[::-1]
    tot = s.sum()
    for k in (10, 100, 1000):
        print(f"  top {k} tiles hold {s[:k].sum():,} of {tot:,} "
              f"candidates ({100.0 * s[:k].sum() / tot:.1f}%)")

    coords = np.asarray(idx.coords)
    times = np.asarray(idx.times)
    valid = np.asarray(idx.valid)
    order = np.argsort(cc)[::-1]
    print("\nwidest tiles:")
    for t in order[:12]:
        v = valid[t]
        if not v.any():
            continue
        xy = coords[t][v]
        tt = times[t][v]
        print(f"  tile {t}: cand={cc[t]} npts={v.sum()} "
              f"bbox=({xy[:, 0].min():.0f}..{xy[:, 0].max():.0f}, "
              f"{xy[:, 1].min():.0f}..{xy[:, 1].max():.0f}) "
              f"extent=({np.ptp(xy[:, 0]):.0f}x{np.ptp(xy[:, 1]):.0f})m "
              f"t={tt.min():.0f}..{tt.max():.0f}")
    # and the distribution of tile time spans / extents overall
    ext = np.full(idx.num_tiles, np.nan)
    tspan = np.full(idx.num_tiles, np.nan)
    for t in range(idx.num_tiles):
        v = valid[t]
        if v.any():
            xy = coords[t][v]
            ext[t] = max(np.ptp(xy[:, 0]), np.ptp(xy[:, 1]))
            tspan[t] = np.ptp(times[t][v])
    ok = ~np.isnan(ext)
    print(f"\ntile max-extent: median={np.nanmedian(ext):.0f}m "
          f"p90={np.nanpercentile(ext, 90):.0f} max={np.nanmax(ext):.0f}")
    print(f"tile time-span: median={np.nanmedian(tspan):.0f} "
          f"p90={np.nanpercentile(tspan, 90):.0f} "
          f"frac(tspan<=2)={np.mean(tspan[ok] <= 2):.2f}")


if __name__ == "__main__":
    main()
