#!/usr/bin/env python3
"""A/B the single-gather (slot-carrying) pointer jumps vs the old chained
inv[label]->flat[tgt] form, paired in one process on the real bench scene.

The OLD loop is reconstructed here self-contained (same sweeps, same hook,
same gating) so both engines alternate against identical inputs — ROUND3.md
measurement discipline (this host/tunnel's mood swings exceed most real
effects).

Usage: python tools/ab_jump.py [reps]
"""
import functools
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from radar_point_cloud_tracking_tpu.ops.neighbors import (
    INT_MAX, build_spatial_index, neighbor_min_sweep,
    neighbor_min_sweep_gated)
from radar_point_cloud_tracking_tpu.ops.stdbscan import (
    _assemble_labels, _core_stats, _finalize_keys, _min_sweep_impl,
    _perm2d_and_inv, cluster_index)


# --------------------------------------------------------------------------
# OLD engine: chained-gather jumps (pre slot-carrying rewrite), verbatim
# semantics of the round-3 cluster_index before commit 1c0c304.
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("use_pallas",))
def _cc_step_old(index, label, core, inv, es, et, use_pallas=False):
    n_sorted = label.size
    n_orig = inv.shape[0]
    sweep = _min_sweep_impl(use_pallas)

    def jump(lbl):
        flat = lbl.reshape(-1)
        tgt = inv[jnp.clip(flat, 0, n_orig - 1)]
        jumped = jnp.where(flat < INT_MAX, flat[tgt], INT_MAX)
        return jnp.minimum(flat, jumped).reshape(lbl.shape)

    payload = jnp.where(core, label, INT_MAX)
    nbr_min = sweep(index, payload, es, et)
    new = jnp.where(core, jnp.minimum(label, nbr_min), INT_MAX)
    flat_old = payload.reshape(-1)
    tgt = jnp.where(flat_old < INT_MAX,
                    inv[jnp.clip(flat_old, 0, n_orig - 1)], n_sorted)
    vals = jnp.where(core, nbr_min, INT_MAX).reshape(-1)
    root_min = jnp.full((n_sorted + 1,), INT_MAX, jnp.int32).at[tgt].min(
        vals, mode="drop")[:n_sorted]
    new = jnp.minimum(new, jnp.where(core, root_min.reshape(new.shape),
                                     INT_MAX))

    def jump_until(state):
        lbl2, changed, it = state
        j = jump(lbl2)
        return j, jnp.any(j != lbl2), it + 1

    def jump_cond(state):
        return state[1] & (state[2] < 16)

    new, _, _ = jax.lax.while_loop(jump_cond, jump_until,
                                   (new, jnp.bool_(True), jnp.int32(0)))
    return new, nbr_min, jnp.any(new != label)


@functools.partial(jax.jit, static_argnames=("jump_cap",))
def _cc_step_gated_old(index, label, core, inv, acc, tile_changed, es, et,
                       jump_cap=2):
    n_sorted = label.size
    n_orig = inv.shape[0]

    def jump(lbl):
        flat = lbl.reshape(-1)
        tgt = inv[jnp.clip(flat, 0, n_orig - 1)]
        jumped = jnp.where(flat < INT_MAX, flat[tgt], INT_MAX)
        return jnp.minimum(flat, jumped).reshape(lbl.shape)

    payload = jnp.where(core, label, INT_MAX)
    nbr_min = neighbor_min_sweep_gated(index, payload, es, et, acc,
                                       tile_changed)
    direct = jnp.where(core, jnp.minimum(label, nbr_min), INT_MAX)
    sweep_changed = jnp.any(direct != payload)

    def converge(lbl):
        flat_old = payload.reshape(-1)
        tgt = jnp.where(flat_old < INT_MAX,
                        inv[jnp.clip(flat_old, 0, n_orig - 1)], n_sorted)
        vals = jnp.where(core, nbr_min, INT_MAX).reshape(-1)
        root_min = jnp.full((n_sorted + 1,), INT_MAX,
                            jnp.int32).at[tgt].min(
            vals, mode="drop")[:n_sorted]
        new = jnp.minimum(lbl, jnp.where(core, root_min.reshape(lbl.shape),
                                         INT_MAX))

        def jump_until(state):
            l2, changed, it = state
            j = jump(l2)
            return j, jnp.any(j != l2), it + 1

        def jump_cond(state):
            return state[1] & (state[2] < jump_cap)

        new, _, _ = jax.lax.while_loop(jump_cond, jump_until,
                                       (new, jnp.bool_(True), jnp.int32(0)))
        return new

    new = jax.lax.cond(sweep_changed, converge, jump, direct)
    return new, nbr_min, jnp.any(new != label)


@functools.partial(jax.jit, static_argnames=(
    "min_samples", "min_frames", "n_offsets", "border_mode", "max_sweeps",
    "use_pallas"))
def cluster_index_old(index, es, et, min_samples, min_frames, n_offsets,
                      border_mode, max_sweeps, use_pallas=False):
    degree, frame_count = _core_stats(index, es, et, n_offsets, use_pallas)
    core = index.valid & (degree >= jnp.int32(min_samples))
    if min_frames > 1:
        core = core & (frame_count >= jnp.int32(min_frames))
    perm2d, inv = _perm2d_and_inv(index, core)
    label0 = jnp.where(core, perm2d, INT_MAX)

    label1, acc1, _ = _cc_step_old(index, label0, core, inv, es, et,
                                   use_pallas=False)
    changed1 = jnp.any(label1 != label0, axis=1)

    def cond(state):
        return state[3] & (state[4] < max_sweeps)

    def body(state):
        lbl, acc, tchanged, _, it = state
        new, acc2, changed = _cc_step_gated_old(index, lbl, core, inv, acc,
                                                tchanged, es, et, jump_cap=2)
        return (new, acc2, jnp.any(new != lbl, axis=1), changed, it + 1)

    label, last_nbr_min, _, _, _ = jax.lax.while_loop(
        cond, body, (label1, acc1, changed1, jnp.any(changed1),
                     jnp.int32(1)))

    comp_key = jnp.where(core, label, INT_MAX)
    rank_lookup, num_clusters = _finalize_keys(index, comp_key, core)
    if border_mode == "if_earlier":
        sweep = _min_sweep_impl(use_pallas)
        is_root = core & (comp_key == perm2d)
        border_key = sweep(index, comp_key, es, et, query_limit=perm2d,
                           bypass_limit=is_root, use_limit=True)
    else:
        border_key = last_nbr_min
    labels = _assemble_labels(index, core, comp_key, border_key, rank_lookup)
    return labels, num_clusters


def main():
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 4


    from tools._scene import load_bench_scene

    points, n, cap, cfg = load_bench_scene(100)
    print(f"bench scene: {n:,} points, capacity {cap:,}")

    es, et = jnp.float32(8.0), jnp.float32(2.0)
    valid = jnp.arange(cap) < jnp.int32(n)
    use_pallas = jax.default_backend() == "tpu"
    index = build_spatial_index(points[:, :2], points[:, 4], valid,
                                8.0, 2.0, tile=512)
    jax.block_until_ready(index.cand_idx)

    def run_new():
        lbl, k = cluster_index(index, es, et, 15, 1, 0, "always", 256,
                               use_pallas=use_pallas)
        jax.block_until_ready(lbl)
        return lbl, k

    def run_old():
        lbl, k = cluster_index_old(index, es, et, 15, 1, 0, "always", 256,
                                   use_pallas=use_pallas)
        jax.block_until_ready(lbl)
        return lbl, k

    lbl_new, k_new = run_new()  # compile
    lbl_old, k_old = run_old()
    same = bool(jnp.array_equal(lbl_new, lbl_old))
    print(f"clusters: old={int(k_old)} new={int(k_new)}  labels equal: "
          f"{same}")
    assert same

    times = {"old": [], "new": []}
    for r in range(reps):
        for name, fn in (("old", run_old), ("new", run_new)):
            t0 = time.perf_counter()
            fn()
            times[name].append(time.perf_counter() - t0)
    for name in ("old", "new"):
        med = np.median(times[name]) * 1e3
        print(f"{name}: cluster_index {med:.0f} ms  "
              f"(reps {[f'{x*1e3:.0f}' for x in times[name]]})")


if __name__ == "__main__":
    main()
