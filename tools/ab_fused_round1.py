#!/usr/bin/env python3
"""Chip A/B of the FUSED ROUND-1 (stats pass folds the unmasked
neighbor-id minimum; round 1 resolves from it plus a scoped residual
sweep — see stdbscan.cluster_index fused_round1) vs the unfused program
(separate stats + hoisted full round-1 sweep).

Whole-program wall both ways, labels bit-equality, and the fused path's
stage decomposition: fused-stats cost vs plain stats, residual scope
(unresolved points / scoped tiles / scoped pairs), scoped-sweep cost.

ARCHIVED RECORD — cannot run at HEAD.  The fused round-1 path was
chip-refuted at both scales and removed per flip-or-remove (commit
6b0837b; results in .chip_logs/ab_fused_round1_{denoise,tracker}_r4.log
and ROUND4.md).  To reproduce, check out the last commit that carries the
fused path: ``git checkout d92f0bf``.

Usage: python tools/ab_fused_round1.py [tracker|denoise] [frames=N] [tile=N]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

_PINNED = "d92f0bf"
sys.exit(
    f"ab_fused_round1.py is an archived record: the fused round-1 path was "
    f"removed at HEAD (commit 6b0837b) after losing chip A/Bs at both "
    f"scales. Reproduce with: git checkout {_PINNED}  "
    f"(results: .chip_logs/ab_fused_round1_*.log, ROUND4.md)")

import jax
import jax.numpy as jnp


def t(fn, reps=3):
    out = fn()
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    scene, frames, tile = "denoise", 100, None
    for a in sys.argv[1:]:
        if a.startswith("frames="):
            frames = int(a.split("=", 1)[1])
        elif a.startswith("tile="):
            tile = int(a.split("=", 1)[1])
        else:
            scene = a
    from tools._scene import load_bench_scene, load_bench_scene_denoise
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        INT_MAX, build_spatial_index)
    from radar_point_cloud_tracking_tpu.ops import stdbscan as sd

    if scene == "denoise":
        points, n, cap, cfg = load_bench_scene_denoise(frames)
        es_f, et_f = 8.0, 2.0
        min_samples, min_frames, n_offsets, bm = 15, 2, 2, "if_earlier"
    else:
        points, n, cap, cfg = load_bench_scene(frames)
        es_f, et_f = 8.0, 2.0
        min_samples, min_frames, n_offsets, bm = 15, 1, 0, "always"
    if tile is None:
        tile = cfg.clustering.tile_size
    es, et = jnp.float32(es_f), jnp.float32(et_f)
    valid = jnp.arange(cap) < jnp.int32(n)
    print(f"{scene} scene: {n:,} points, capacity {cap:,}, tile={tile}, "
          f"mf={min_frames}, border={bm}")

    tb, index = t(lambda: build_spatial_index(
        points[:, :2], points[:, 3], valid, es_f, et_f, tile=tile,
        pairs=True, directed=False), reps=1)
    print(f"index build (pairs-only):   {tb*1e3:7.0f} ms "
          f"(pairs {int(index.pair_count):,})")

    # --- stage decomposition: plain stats vs fused stats -------------
    perm2d, inv = sd._perm2d_and_inv(index, index.valid)
    if n_offsets == 0:
        from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
            core_stats_pallas_sym)
        ts0, deg0 = t(lambda: core_stats_pallas_sym(index, es, et))
        ts1, (deg1, m_all) = t(lambda: core_stats_pallas_sym(
            index, es, et, min_payload=perm2d))
        fc1 = jnp.zeros_like(deg1)
    else:
        from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
            core_stats_pallas_sym_mf)
        ts0, (deg0, _) = t(lambda: core_stats_pallas_sym_mf(
            index, es, et, n_offsets))
        ts1, (deg1, fc1, m_all) = t(lambda: core_stats_pallas_sym_mf(
            index, es, et, n_offsets, min_payload=perm2d))
    print(f"stats plain:                {ts0*1e3:7.0f} ms")
    print(f"stats fused (+min fold):    {ts1*1e3:7.0f} ms "
          f"(+{(ts1-ts0)*1e3:.0f} ms)")

    core = index.valid & (deg1 >= jnp.int32(min_samples))
    if min_frames > 1:
        core = core & (fc1 >= jnp.int32(min_frames))
    n_orig = index.perm.shape[0]
    m_slot = inv[jnp.clip(m_all, 0, n_orig - 1)]
    m_core = (m_all < INT_MAX) & core.reshape(-1)[m_slot]
    unresolved = index.valid & ~m_core
    scope = jnp.any(unresolved, axis=1)
    pc = int(index.pair_count)
    la, lb_ = index.pair_a[:pc], index.pair_b[:pc]
    sc_pairs = int(jnp.sum(scope[la] | scope[lb_]))
    print(f"residual: {int(jnp.sum(unresolved)):,} unresolved pts in "
          f"{int(jnp.sum(scope))}/{index.num_tiles} tiles; scoped pairs "
          f"{sc_pairs:,}/{pc:,}")
    label0 = jnp.where(core, perm2d, INT_MAX)
    from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
        min_sweep_pallas_sym_scoped)
    tsc, _ = t(lambda: min_sweep_pallas_sym_scoped(
        index, label0, es, et, scope))
    print(f"residual scoped sweep:      {tsc*1e3:7.0f} ms")
    # the hoisted full round-1 sweep this replaces
    from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
        min_sweep_pallas_sym)
    tr1, _ = t(lambda: min_sweep_pallas_sym(index, label0, es, et))
    print(f"(replaced) full min sweep:  {tr1*1e3:7.0f} ms")

    # --- whole program A/B -------------------------------------------
    tf, (lf, kf) = t(lambda: sd.cluster_index(
        index, es, et, min_samples, min_frames, n_offsets, bm, 256,
        use_pallas=True, fused_round1=True), reps=3)
    tu, (lu, ku) = t(lambda: sd.cluster_index(
        index, es, et, min_samples, min_frames, n_offsets, bm, 256,
        use_pallas=True, fused_round1=False), reps=3)
    eq = bool(np.array_equal(np.asarray(lf), np.asarray(lu)))
    print(f"whole cluster_index fused:  {tf*1e3:7.0f} ms "
          f"({int(kf)} clusters)")
    print(f"whole cluster_index plain:  {tu*1e3:7.0f} ms "
          f"({int(ku)} clusters)")
    print(f"labels bit-equal: {eq}   delta: {(tf-tu)*1e3:+.0f} ms "
          f"({(tf/tu-1)*100:+.1f}%)")


if __name__ == "__main__":
    main()
