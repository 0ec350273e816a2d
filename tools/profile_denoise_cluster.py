#!/usr/bin/env python3
"""Stage decomposition of the DENOISE-scale cluster program (9.5M points,
min_frames=2, if_earlier borders): mirrors cluster_index round by round
with host-side timing so the 26 s whole-program number (ab_denoise) can be
attributed — stats sweep, hoisted full round, each gated round, border
sweep.  Also standalone costs of one jump pass and one hook scatter at
this scale.

Usage: python tools/profile_denoise_cluster.py [use_pallas: 0/1, default 1]
                                               [tile=N (default: config)]
                                               [jc=N tail jump cap]
With jc nonstandard the whole-program run also label-checks against the
default-knob program (bit-equality printed).
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp


def t(fn, reps=2):
    out = fn()
    jax.block_until_ready(out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        times.append(time.perf_counter() - t0)
    return min(times), out


def main():
    use_pallas, tile, jc = True, None, 2
    for a in sys.argv[1:]:
        if a.startswith("tile="):
            tile = int(a.split("=", 1)[1])
        elif a.startswith("jc="):
            jc = int(a.split("=", 1)[1])
        else:
            use_pallas = bool(int(a))
    from tools._scene import load_bench_scene_denoise
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        INT_MAX, build_spatial_index)
    from radar_point_cloud_tracking_tpu.ops import stdbscan as sd

    points, n, cap, cfg = load_bench_scene_denoise(100)
    if tile is None:
        tile = cfg.clustering.tile_size
    print(f"denoise scene: {n:,} points, capacity {cap:,} "
          f"use_pallas={use_pallas} tile={tile} jc={jc}")
    es, et = jnp.float32(8.0), jnp.float32(2.0)
    valid = jnp.arange(cap) < jnp.int32(n)
    min_samples, min_frames, n_offsets = 15, 2, 2

    tb, index = t(lambda: build_spatial_index(
        points[:, :2], points[:, 3], valid, 8.0, 2.0, tile=tile,
        pairs=use_pallas))
    print(f"index build (pairs={use_pallas}):    {tb*1e3:7.0f} ms")

    tstats, (degree, frame_count) = t(lambda: sd._core_stats(
        index, es, et, n_offsets, use_pallas))
    print(f"core stats (mf, full):        {tstats*1e3:7.0f} ms")

    core = index.valid & (degree >= jnp.int32(min_samples))
    core = core & (frame_count >= jnp.int32(min_frames))
    perm2d, inv = sd._perm2d_and_inv(index, core)
    label0 = jnp.where(core, perm2d, INT_MAX)
    n_sorted = label0.size
    own_slot = jnp.arange(n_sorted, dtype=jnp.int32).reshape(label0.shape)
    lslot0 = jnp.where(core, own_slot, n_sorted)

    th, (label1, lslot1, acc1, _) = t(lambda: sd._cc_step(
        index, label0, lslot0, core, inv, es, et, use_pallas=False,
        sym=use_pallas))
    print(f"hoisted full round 1:         {th*1e3:7.0f} ms")

    # gated rounds, each timed (no warm rep — each round's compacted
    # candidate geometry differs; the jit program is shared after round 2)
    label, lslot = label1, lslot1
    acc = acc1
    changed = jnp.any(label1 != label0, axis=1)
    total_gated = 0.0
    for r in range(2, 40):
        nt_changed = int(jnp.sum(changed))
        t0 = time.perf_counter()
        new, ls2, acc2, any_changed = sd._cc_step_gated(
            index, label, lslot, core, inv, acc, changed, es, et,
            jump_cap=jc, sym=use_pallas)
        jax.block_until_ready(new)
        dt = time.perf_counter() - t0
        total_gated += dt
        print(f"gated round {r}: frontier {nt_changed:5d}/"
              f"{index.num_tiles} tiles  {dt*1e3:7.0f} ms")
        moved = bool(any_changed)
        changed = jnp.any(new != label, axis=1)
        label, lslot, acc = new, ls2, acc2
        if not moved:
            break
    print(f"gated rounds total:           {total_gated*1e3:7.0f} ms")

    comp_key = jnp.where(core, label, INT_MAX)
    sweep = sd._min_sweep_impl(use_pallas)
    is_root = core & (comp_key == perm2d)
    tb2, border_key = t(lambda: sweep(
        index, comp_key, es, et, query_limit=perm2d, bypass_limit=is_root,
        use_limit=True))
    print(f"border sweep (if_earlier):    {tb2*1e3:7.0f} ms")

    # border-gated sweep feasibility: the border sweep only needs OUTPUT at
    # valid non-core points, so pairs touching no non-core tile could skip
    noncore_tile = jnp.any(index.valid & ~core, axis=1)
    n_noncore_tiles = int(jnp.sum(noncore_tile))
    pa = index.pair_a if index.pair_a is not None else None
    if pa is not None:
        pc = int(index.pair_count)
        live_a, live_b = index.pair_a[:pc], index.pair_b[:pc]
        needed = noncore_tile[live_a] | noncore_tile[live_b]
        print(f"border-gate: {int(jnp.sum(index.valid & ~core)):,} non-core "
              f"pts in {n_noncore_tiles}/{index.num_tiles} tiles; pairs "
              f"touching one: {int(jnp.sum(needed)):,}/{pc:,}")
        from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
            min_sweep_pallas_sym_scoped)
        tg, border_gated = t(lambda: min_sweep_pallas_sym_scoped(
            index, comp_key, es, et, noncore_tile, query_limit=perm2d,
            bypass_limit=is_root))
        nc_pts = index.valid & ~core
        eq = bool(jnp.all(jnp.where(nc_pts, border_gated == border_key,
                                    True)))
        print(f"border sweep (GATED):         {tg*1e3:7.0f} ms "
              f"(equal at non-core pts: {eq})")

    # standalone primitive costs at this scale
    flat = label.reshape(-1)
    ls = lslot.reshape(-1)
    tj, _ = t(lambda: sd._jump_pass(flat, ls, n_sorted))
    print(f"one jump pass:                {tj*1e3:7.0f} ms")
    tgt = jnp.where(flat < INT_MAX, ls, n_sorted)
    th2, _ = t(lambda: jnp.full((n_sorted + 1,), INT_MAX, jnp.int32)
               .at[tgt].min(flat, mode="drop"))
    print(f"one hook scatter-min:         {th2*1e3:7.0f} ms")
    tr, _ = t(lambda: sd._refresh_slots(flat, flat, ls, inv, n_sorted))
    print(f"one slot refresh:             {tr*1e3:7.0f} ms")

    # full program for reference
    tp, (lbl, k) = t(lambda: sd.cluster_index(
        index, es, et, min_samples, min_frames, n_offsets, "if_earlier",
        256, use_pallas=use_pallas, tail_jump_cap=jc), reps=1)
    noise = int(jnp.sum(lbl[:n] == -1))
    print(f"whole cluster_index:          {tp*1e3:7.0f} ms "
          f"({int(k)} clusters, {noise:,} noise pts)")
    if jc != 2:
        lbl0, k0 = sd.cluster_index(
            index, es, et, min_samples, min_frames, n_offsets, "if_earlier",
            256, use_pallas=use_pallas)
        eq = bool(jnp.all(lbl[:n] == lbl0[:n])) and int(k) == int(k0)
        print(f"labels bit-equal to default-knob program: {eq}")


if __name__ == "__main__":
    main()
