#!/usr/bin/env python3
"""Count label-propagation rounds + frontier sizes, premerge off vs on.

Round counts and frontier tile sets are backend-independent (the
propagation is deterministic integer math), so this runs fine on the CPU
backend while the TPU tunnel is down and predicts whether the pre-merge
seeding can remove whole rounds on the real bench geometry.

Usage: [FRAMES=20] python tools/premerge_rounds.py
"""
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def run_loop(index, label0, lslot0, core, inv, es, et, max_sweeps=256):
    """Mirror cluster_index's hoisted + gated loop, counting rounds."""
    from radar_point_cloud_tracking_tpu.ops.stdbscan import (
        _cc_step, _cc_step_gated)
    rounds = []
    label1, lslot1, acc1, _ = _cc_step(index, label0, lslot0, core, inv,
                                       es, et, use_pallas=False)
    changed_tiles = jnp.any(label1 != label0, axis=1)
    rounds.append(int(changed_tiles.sum()))
    lbl, ls, acc, tchanged = label1, lslot1, acc1, changed_tiles
    cont = bool(jnp.any(changed_tiles))
    it = 1
    while cont and it < max_sweeps:
        new, ls2, acc2, changed = _cc_step_gated(
            index, lbl, ls, core, inv, acc, tchanged, es, et, jump_cap=2)
        tchanged = jnp.any(new != lbl, axis=1)
        rounds.append(int(tchanged.sum()))
        cont = bool(changed)
        lbl, ls, acc = new, ls2, acc2
        it += 1
    return lbl, acc, rounds


def main():
    n_frames = int(os.environ.get("FRAMES", "20"))
    denoise = bool(int(os.environ.get("DENOISE", "0")))
    min_samples = 15
    min_frames = 2 if denoise else 1
    import bench
    import radar_point_cloud_tracking_tpu as rpt
    from radar_point_cloud_tracking_tpu.config import PipelineConfig
    from radar_point_cloud_tracking_tpu.models.ingest import FrameBatchLoader
    from radar_point_cloud_tracking_tpu.models.tracker import (
        TrackingPipeline, _quarter_pow2, _flatten_and_compact)
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        build_spatial_index, INT_MAX)
    from radar_point_cloud_tracking_tpu.ops.stdbscan import (
        _perm2d_and_inv, _core_stats)

    data_dir = bench._dataset(100)
    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = bench.NUM_BINS
    files = rpt.discover_files(data_dir)
    frames = rpt.group_files_by_frame(files)[:n_frames]
    loader = FrameBatchLoader(cfg, intensity_threshold=10.0, point_stride=4,
                              verbose=False, frame_capacity=131072)
    TrackingPipeline(cfg, verbose=False)
    if denoise:
        ing = loader.load_sequence(frames)
    else:
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
    print(f"{n_frames} frames (denoise={denoise}): {n:,} points, "
          f"capacity {cap:,}")

    es, et = jnp.float32(8.0), jnp.float32(2.0)
    valid = jnp.arange(cap) < jnp.int32(n)

    results = {}
    for premerge in (False, True):
        t0 = time.perf_counter()
        index = build_spatial_index(points[:, :2], points[:, 4], valid,
                                    8.0, 2.0, tile=512, premerge=premerge)
        n_off = 2 if min_frames > 1 else 0
        degree, fc = _core_stats(index, es, et, n_off, False)
        core = index.valid & (degree >= jnp.int32(min_samples))
        if min_frames > 1:
            core = core & (fc >= jnp.int32(min_frames))
        perm2d, inv = _perm2d_and_inv(index, core)
        label0 = jnp.where(core, perm2d, INT_MAX)
        if index.group_id is not None:
            n_sorted = label0.size
            gid = index.group_id.reshape(-1)
            gmin = jnp.full((n_sorted,), INT_MAX, jnp.int32).at[gid].min(
                label0.reshape(-1), mode="drop")
            label0 = jnp.where(core, gmin[gid].reshape(label0.shape),
                               INT_MAX)
            nlab0 = len(np.unique(np.asarray(label0)[np.asarray(core)]))
            print(f"  premerge=on: {nlab0:,} distinct initial labels "
                  f"over {int(core.sum()):,} cores")
        n_sorted = label0.size
        flat0 = label0.reshape(-1)
        lslot0 = jnp.where(
            flat0 < INT_MAX,
            jnp.asarray(inv)[jnp.clip(flat0, 0, inv.shape[0] - 1)],
            n_sorted).reshape(label0.shape)
        lbl, acc, rounds = run_loop(index, label0, lslot0, core, inv, es, et)
        jax.block_until_ready(lbl)
        dt = time.perf_counter() - t0
        nt = index.cand_idx.shape[0]
        c = np.asarray(index.cand_count)
        print(f"premerge={premerge}: {len(rounds)} rounds, frontiers "
              f"{rounds} of {nt} tiles  (cand sum={c.sum():,} "
              f"mean={c.mean():.1f}; wall {dt:.1f}s)")
        comp = np.asarray(jnp.where(core, lbl, INT_MAX))
        results[premerge] = comp
    same = np.array_equal(results[False], results[True])
    print(f"converged component keys identical: {same}")


if __name__ == "__main__":
    main()
