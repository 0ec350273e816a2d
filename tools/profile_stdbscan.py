#!/usr/bin/env python3
"""Stage-level profile of the clustering engine on the cached bench scene.

Times, on the real device with the actual post-land-filter bench points
(~1.55M): index build, core stats, full XLA sweep vs the Pallas manual-DMA
sweep, hooking, pointer jumps, the gated incremental sweep, and the whole
cluster_index program — at several tile sizes.  One measurement at a time;
run with an idle host (see ROUND2.md measurement discipline).

Usage: python tools/profile_stdbscan.py [tile ...]
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def t(fn, *args, reps=3, **kw):
    fn(*args, **kw)  # compile
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kw))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    tiles = [int(a) for a in sys.argv[1:]] or [512, 256]

    import bench
    import radar_point_cloud_tracking_tpu as rpt
    from radar_point_cloud_tracking_tpu.config import PipelineConfig
    from radar_point_cloud_tracking_tpu.models.ingest import FrameBatchLoader
    from radar_point_cloud_tracking_tpu.models.tracker import (
        TrackingPipeline, _quarter_pow2, _flatten_and_compact)
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        INT_MAX, build_spatial_index, neighbor_core_stats,
        neighbor_min_sweep, neighbor_min_sweep_gated)
    from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
        core_stats_pallas_dma, min_sweep_pallas_dma)
    from radar_point_cloud_tracking_tpu.ops.stdbscan import (
        cluster_index, _perm2d_and_inv, _cc_step)

    np.asarray(jnp.ones(8))
    data_dir = bench._dataset(100)
    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = bench.NUM_BINS
    files = rpt.discover_files(data_dir)
    frames = rpt.group_files_by_frame(files)[:100]
    loader = FrameBatchLoader(cfg, intensity_threshold=10.0, point_stride=4,
                              verbose=False, frame_capacity=131072)
    pipe = TrackingPipeline(cfg, verbose=False)
    lf = cfg.land_filter
    ing, info = loader.load_sequence_land_filtered(
        frames, grid_resolution_m=lf.grid_resolution_m,
        persistence_threshold=lf.persistence_threshold,
        min_intensity=lf.min_intensity,
        min_frames_required=lf.min_frames_required)
    n = int(ing.count_host.sum())
    cap = _quarter_pow2(n)
    points, n_dev = _flatten_and_compact(
        ing.xyi, ing.gain, ing.count, jnp.asarray(ing.frame_ids),
        ing.valid_mask().reshape(-1), cap)
    jax.block_until_ready(points)
    print(f"bench scene: {n:,} points, capacity {cap:,}")

    es, et = jnp.float32(8.0), jnp.float32(2.0)
    for tile in tiles:
        valid = jnp.arange(cap) < jnp.int32(n)
        t0 = time.perf_counter()
        index = build_spatial_index(points[:, :2], points[:, 4], valid,
                                    8.0, 2.0, tile=tile)
        jax.block_until_ready(index.cand_idx)
        t_build_cold = time.perf_counter() - t0
        t_build = t(lambda: jax.block_until_ready(build_spatial_index(
            points[:, :2], points[:, 4], valid, 8.0, 2.0,
            tile=tile).cand_idx))
        k_pad = index.cand_idx.shape[1]
        counts = np.asarray(index.cand_count)
        print(f"\n== tile={tile}: {index.num_tiles} tiles, k_pad={k_pad}, "
              f"cand sum={counts.sum():,} max={counts.max()} "
              f"mean={counts.mean():.1f}")
        print(f"  index build: {t_build*1e3:.0f} ms (cold {t_build_cold:.1f}s)")

        t_stats = t(neighbor_core_stats, index, es, et)
        print(f"  core_stats XLA: {t_stats*1e3:.0f} ms")
        try:
            t_pstats = t(core_stats_pallas_dma, index, es, et)
            ok = bool(jnp.array_equal(
                neighbor_core_stats(index, es, et)[0],
                core_stats_pallas_dma(index, es, et)))
            print(f"  core_stats Pallas-DMA: {t_pstats*1e3:.0f} ms "
                  f"(equal={ok})")
        except Exception as e:
            print(f"  core_stats Pallas-DMA failed: {e}")

        payload = jnp.where(index.valid,
                            jnp.arange(index.num_tiles * tile,
                                       dtype=jnp.int32).reshape(
                                           index.num_tiles, tile),
                            INT_MAX)
        t_xla = t(neighbor_min_sweep, index, payload, es, et)
        print(f"  full min sweep XLA: {t_xla*1e3:.0f} ms")
        try:
            t_pal = t(min_sweep_pallas_dma, index, payload, es, et)
            ok = bool(jnp.array_equal(
                neighbor_min_sweep(index, payload, es, et),
                min_sweep_pallas_dma(index, payload, es, et)))
            print(f"  full min sweep Pallas-DMA: {t_pal*1e3:.0f} ms "
                  f"(equal={ok})")
        except Exception as e:
            print(f"  Pallas-DMA failed: {e}")

        acc = jnp.full((index.num_tiles, tile), INT_MAX, jnp.int32)
        all_changed = jnp.ones((index.num_tiles,), bool)
        t_gated_full = t(neighbor_min_sweep_gated, index, payload, es, et,
                         acc, all_changed)
        few = jnp.zeros((index.num_tiles,), bool).at[:8].set(True)
        t_gated_few = t(neighbor_min_sweep_gated, index, payload, es, et,
                        acc, few)
        print(f"  gated sweep (all changed): {t_gated_full*1e3:.0f} ms; "
              f"(8 tiles): {t_gated_few*1e3:.0f} ms")

        core = index.valid  # worst-case: everything core
        perm2d, inv = _perm2d_and_inv(index, core)
        label0 = jnp.where(core, perm2d, INT_MAX)
        t_step = t(_cc_step, index, label0, core, inv, es, et)
        print(f"  one _cc_step (sweep+hook+jumps): {t_step*1e3:.0f} ms")

        for use_pallas in (False, True):
            try:
                tt = t(cluster_index, index, es, et, 15, 1, 0, "always",
                       256, use_pallas=use_pallas)
                lbl, k = cluster_index(index, es, et, 15, 1, 0, "always",
                                       256, use_pallas=use_pallas)
                print(f"  cluster_index use_pallas={use_pallas}: "
                      f"{tt*1e3:.0f} ms ({int(k)} clusters)")
            except Exception as e:
                print(f"  cluster_index use_pallas={use_pallas} failed: {e}")


if __name__ == "__main__":
    main()
