"""Device ST-DBSCAN: core-point test + iterative min-label propagation with
pointer jumping, canonicalized to the reference's sequential visit-order
labels.

The reference clusters with a sequential BFS expansion
(radar-pipeline processors/clustering.py:49-115; min_frames variant
stdbscan_denoising_pipeline.py:264-369); the Rust port merges with a CAS
atomic union-find (radar-pipeline-rs clustering.rs:209-325).  TPUs have no
CAS, so connected components are computed by synchronous min-label
propagation over core-core edges with pointer jumping — O(log n) sweeps,
fully deterministic, converging inside one bounded ``lax.while_loop`` on
device.  The neighbor sweeps run either as XLA-composed programs
(ops/neighbors.py) or as Pallas scalar-prefetch kernels
(ops/pallas_neighbors.py) selected by ``use_pallas``.

Exact-match argument (tests verify against the CPU oracle):
- a cluster = connected component of core points under the symmetric
  ST-neighbor relation, plus border points having a core neighbor;
- the reference numbers clusters in creation order = ascending minimum
  original index of their core points (the scan at clustering.py:88 visits
  indices in order and each component is created when its smallest core
  index is reached);
- a border point takes the earliest-created cluster among those whose cores
  reach it = the neighboring cluster with the smallest min-core-index.

The reference ships two border-attachment variants (see
reference_impl/oracle.py): the package/tracker BFS attaches every border
point ("always"), while the denoiser only attaches border points scanned
after their cluster was created — a border point may only join clusters
whose min-core-index is smaller than its own index ("if_earlier").  Both
reduce to a thresholded min-sweep here.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ClusteringConfig
from .neighbors import (
    INT_MAX,
    SpatialIndex,
    build_spatial_index,
    neighbor_core_stats,
    neighbor_min_sweep,
    neighbor_min_sweep_gated,
)

__all__ = ["st_dbscan_device", "st_dbscan", "compute_core_mask",
           "sym_engine_ok"]

# per-process verdicts of the symmetric-pair Pallas engine on the active
# backend, keyed by the kernel-variant configuration actually requested
_SYM_STATUS: dict = {}


def sym_engine_ok(tile: int = 512, has_z: bool = False,
                  n_offsets: int = 0) -> bool:
    """Probe the symmetric-pair Pallas kernels ONCE per configuration on
    the active backend: compile + run the variants the caller will use
    (degree stats or the min_frames variant, min sweep, thresholded min
    sweep) at the caller's tile size and dimensionality on a tiny
    deterministic scene, comparing against the XLA engine.  A Mosaic
    rejection or a numeric mismatch disables the symmetric engine for
    that configuration (callers then build indexes without the pair
    list, falling back to the directed manual-DMA/XLA hybrid) — an
    unvalidated kernel must never be able to take down or corrupt a
    production run."""
    mf = n_offsets if 1 <= n_offsets <= 3 else 0
    key = (int(tile), bool(has_z), int(mf))
    hit = _SYM_STATUS.get(key)
    if hit is not None:
        return hit
    if jax.default_backend() != "tpu":
        _SYM_STATUS[key] = True  # interpret mode, exercised by the tests
        return True
    try:
        from .pallas_neighbors import (core_stats_pallas_sym,
                                       core_stats_pallas_sym_mf,
                                       min_sweep_pallas_sym)

        rng = np.random.default_rng(12345)
        n = 4 * tile
        d = 3 if has_z else 2
        coords = jnp.asarray(rng.uniform(0, 60, (n, d)), jnp.float32)
        times = jnp.asarray(rng.integers(0, 5, n), jnp.float32)
        valid = jnp.asarray(rng.random(n) < 0.9)
        es, et = jnp.float32(6.0), jnp.float32(2.0)
        idx = build_spatial_index(coords, times, valid, 6.0, 2.0,
                                  tile=tile, pairs=True)
        v = np.asarray(idx.valid)
        if mf:
            dmf_s, fmf_s = core_stats_pallas_sym_mf(idx, es, et, mf)
            dmf_x, fmf_x = neighbor_core_stats(idx, es, et, n_offsets=mf)
            ok = bool(
                np.array_equal(np.asarray(dmf_s)[v], np.asarray(dmf_x)[v])
                and np.array_equal(np.asarray(fmf_s)[v],
                                   np.asarray(fmf_x)[v]))
        else:
            deg_s = np.asarray(core_stats_pallas_sym(idx, es, et))
            deg_x = np.asarray(
                neighbor_core_stats(idx, es, et, n_offsets=0)[0])
            ok = bool(np.array_equal(deg_s[v], deg_x[v]))
        pay = np.asarray(rng.integers(0, n, idx.valid.shape), np.int32)
        pay[~v] = INT_MAX
        pay = jnp.asarray(pay)
        min_s = np.asarray(min_sweep_pallas_sym(idx, pay, es, et))
        min_x = np.asarray(neighbor_min_sweep(idx, pay, es, et))
        ok = ok and bool(np.array_equal(min_s[v], min_x[v]))
        qlim = jnp.asarray(rng.integers(0, n, idx.valid.shape), jnp.int32)
        byp = jnp.asarray(rng.random(idx.valid.shape) < 0.2)
        lim_s = np.asarray(min_sweep_pallas_sym(
            idx, pay, es, et, query_limit=qlim, bypass_limit=byp,
            use_limit=True))
        lim_x = np.asarray(neighbor_min_sweep(
            idx, pay, es, et, query_limit=qlim, bypass_limit=byp,
            use_limit=True))
        ok = ok and bool(np.array_equal(lim_s[v], lim_x[v]))
        # chunked dispatch (pair lists past the SMEM prefetch budget run
        # as several kernel calls + a combine): force multiple chunks on
        # this tiny scene so the combine path is validated on-backend too
        from .pallas_neighbors import (_core_stats_sym, _core_stats_sym_mf,
                                       _min_sweep_sym)

        cap = max(8, idx.pair_a.shape[0] // 4)
        if mf:
            dmc, fmc = _core_stats_sym_mf(idx, es, et, mf, cap=cap)
            ok = ok and bool(
                np.array_equal(np.asarray(dmc)[v], np.asarray(dmf_x)[v])
                and np.array_equal(np.asarray(fmc)[v],
                                   np.asarray(fmf_x)[v]))
        else:
            deg_c = np.asarray(_core_stats_sym(idx, es, et, cap=cap))
            ok = ok and bool(np.array_equal(deg_c[v], deg_x[v]))
        minc = np.asarray(_min_sweep_sym(idx, pay, es, et, cap=cap))
        ok = ok and bool(np.array_equal(minc[v], min_x[v]))
        _SYM_STATUS[key] = ok
        if not ok:
            import warnings

            warnings.warn(
                f"symmetric-pair Pallas engine mismatched at {key}; "
                "falling back to the directed kernels")
    except Exception as e:  # Mosaic rejection, OOM, anything
        import warnings

        warnings.warn(
            f"symmetric-pair Pallas engine unavailable at {key} "
            f"({type(e).__name__}: {e}); falling back to the directed "
            "kernels")
        _SYM_STATUS[key] = False
    return _SYM_STATUS[key]


@jax.jit
def _perm2d_and_inv(index: SpatialIndex,
                    core: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Original index per sorted slot (padded INT_MAX) and the inverse
    original->slot map used to chase label chains."""
    num_tiles, tile = core.shape
    n_sorted = num_tiles * tile
    n_orig = index.perm.shape[0]
    perm2d = index.perm.astype(jnp.int32)
    pad = n_sorted - n_orig
    if pad:
        perm2d = jnp.concatenate(
            [perm2d, jnp.full((pad,), INT_MAX, jnp.int32)])
    inv = jnp.zeros((n_orig,), jnp.int32).at[index.perm].set(
        jnp.arange(n_orig, dtype=jnp.int32))
    return perm2d.reshape(num_tiles, tile), inv


def _jump_pass(flat: jnp.ndarray, ls: jnp.ndarray,
               n_sorted: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One pointer-jump pass on the (label, label-slot) pair representation.

    ``ls[i]`` is the sorted-slot index of the point whose ORIGINAL index is
    ``flat[i]`` (sentinel ``n_sorted`` when ``flat[i] == INT_MAX``), so a
    jump is ONE row gather from the stacked pair table — no inv-permutation
    gather and no gather->gather dependency chain (the chained form measured
    ~50 ms per pass at 1.5M points; the row gather reads the same bytes in
    a single independent op)."""
    pair = jnp.stack([flat, ls], axis=1)
    g = pair[jnp.clip(ls, 0, n_sorted - 1)]
    jl, js = g[:, 0], g[:, 1]
    better = (flat < INT_MAX) & (jl < flat)
    return jnp.where(better, jl, flat), jnp.where(better, js, ls)


def _refresh_slots(flat_new: jnp.ndarray, flat_old: jnp.ndarray,
                   ls_old: jnp.ndarray, inv: jnp.ndarray,
                   n_sorted: int) -> jnp.ndarray:
    """Re-derive label slots after a sweep/hook changed some labels: one
    inv gather per ROUND (instead of one per jump pass), selected only
    where the label actually moved."""
    n_orig = inv.shape[0]
    fresh = inv[jnp.clip(flat_new, 0, n_orig - 1)]
    ls = jnp.where(flat_new == flat_old, ls_old, fresh)
    return jnp.where(flat_new < INT_MAX, ls, n_sorted)


@functools.partial(jax.jit, static_argnames=("use_pallas", "sym"))
def _cc_step(
    index: SpatialIndex,
    label: jnp.ndarray,
    lslot: jnp.ndarray,
    core: jnp.ndarray,
    inv: jnp.ndarray,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    use_pallas: bool = False,
    sym: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One propagation round: neighbor-min sweep + grandparent hooking +
    pointer jumps.  Labels are ORIGINAL point indices, so the fixpoint label
    is directly the component key (min original core index); ``lslot``
    carries each label's sorted slot so jump passes are single row gathers
    (see :func:`_jump_pass`).  ``sym`` selects the symmetric-pair Pallas
    full sweep when the index carries the pair list.  Returns (new labels,
    new label slots, this round's raw neighbor minima, changed?)."""
    n_sorted = label.size
    if sym and index.pair_a is not None:
        from .pallas_neighbors import min_sweep_pallas_sym

        def sweep(ix, pay, es, et):
            return min_sweep_pallas_sym(ix, pay, es, et)
    else:
        sweep = _min_sweep_impl(use_pallas)

    payload = jnp.where(core, label, INT_MAX)
    nbr_min = sweep(index, payload, eps_space, eps_time)
    new = jnp.where(core, jnp.minimum(label, nbr_min), INT_MAX)

    # Grandparent hooking (FastSV-style): scatter each point's neighborhood
    # minimum onto its current root slot, so a basin's representative learns
    # in one sweep what any member saw.  Without this, adjacent ids make
    # label chains descend in unit steps and clutter snakes take tens of
    # sweeps (41 observed) instead of a handful (5).  The hook target IS
    # the maintained label slot — no inv gather here.
    tgt = jnp.where(payload.reshape(-1) < INT_MAX, lslot.reshape(-1),
                    n_sorted)
    vals = jnp.where(core, nbr_min, INT_MAX).reshape(-1)
    root_min = jnp.full((n_sorted + 1,), INT_MAX, jnp.int32).at[tgt].min(
        vals, mode="drop")[:n_sorted]
    new = jnp.minimum(new, jnp.where(core, root_min.reshape(new.shape),
                                     INT_MAX))
    flat = new.reshape(-1)
    ls = _refresh_slots(flat, payload.reshape(-1), lslot.reshape(-1), inv,
                        n_sorted)

    # Pointer-jump to fixpoint: each round halves chain lengths; jumps are
    # dense gathers (cheap), sweeps are not.
    def jump_until(state):
        f, s, changed, it = state
        f2, s2 = _jump_pass(f, s, n_sorted)
        return f2, s2, jnp.any(f2 != f), it + 1

    def jump_cond(state):
        return state[2] & (state[3] < 16)

    flat, ls, _, _ = jax.lax.while_loop(
        jump_cond, jump_until, (flat, ls, jnp.bool_(True), jnp.int32(0)))
    new = flat.reshape(label.shape)
    return new, ls.reshape(label.shape), nbr_min, jnp.any(new != label)


@functools.partial(jax.jit, static_argnames=("jump_cap", "sym"))
def _cc_step_gated(
    index: SpatialIndex,
    label: jnp.ndarray,
    lslot: jnp.ndarray,
    core: jnp.ndarray,
    inv: jnp.ndarray,
    acc: jnp.ndarray,
    tile_changed: jnp.ndarray,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    jump_cap: int = 2,
    sym: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Incremental :func:`_cc_step`: the neighbor-min sweep rescans only
    candidates in changed tiles (see neighbor_min_sweep_gated); hooking and
    pointer jumps are identical.  ``acc`` carries the monotone per-point
    neighbor minima across rounds and equals the full sweep's result.

    With ``sym`` (pair list present), the round instead dispatches the
    GATED SYMMETRIC sweep: the pairs touching a changed tile compact to a
    prefix of the static pair list (O(P_pad) elementwise) and only those
    dispatch, so round cost scales with active pairs.  The directed gated
    sweep's dense (nt, k_pad) candidate compaction is a frontier-
    independent floor (~2.8 s/round at denoise scale, where a tile
    hotspot widens k_pad to 8192) and its sweep does 2x the predicate
    work per unordered pair (measured: ~90%-frontier rounds 5.1 s
    directed vs 2.66 s full-symmetric)."""
    n_sorted = label.size
    shape = label.shape

    payload = jnp.where(core, label, INT_MAX)
    if sym and index.pair_a is not None:
        from .pallas_neighbors import min_sweep_pallas_sym_gated

        nbr_min = min_sweep_pallas_sym_gated(index, payload, eps_space,
                                             eps_time, acc, tile_changed)
    else:
        nbr_min = neighbor_min_sweep_gated(index, payload, eps_space,
                                           eps_time, acc, tile_changed)
    direct = jnp.where(core, jnp.minimum(label, nbr_min), INT_MAX)
    sweep_changed = jnp.any(direct != payload)

    def converge(args):
        lbl, ls_old = args
        tgt = jnp.where(payload.reshape(-1) < INT_MAX,
                        ls_old.reshape(-1), n_sorted)
        vals = jnp.where(core, nbr_min, INT_MAX).reshape(-1)
        root_min = jnp.full((n_sorted + 1,), INT_MAX, jnp.int32).at[tgt].min(
            vals, mode="drop")[:n_sorted]
        new = jnp.minimum(lbl, jnp.where(core, root_min.reshape(shape),
                                         INT_MAX))
        flat = new.reshape(-1)
        ls = _refresh_slots(flat, payload.reshape(-1), ls_old.reshape(-1),
                            inv, n_sorted)

        def jump_until(state):
            f, s, changed, it = state
            f2, s2 = _jump_pass(f, s, n_sorted)
            return f2, s2, jnp.any(f2 != f), it + 1

        def jump_cond(state):
            # capped passes per round (default 2): each pass halves chain
            # depth, and leftover chains finish in later rounds (a
            # no-change round is still a sound global fixpoint test — one
            # identity pass implies jump fixpoint); uncapped detection
            # passes cost a full dense pass each
            return state[2] & (state[3] < jump_cap)

        flat, ls, _, _ = jax.lax.while_loop(
            jump_cond, jump_until, (flat, ls, jnp.bool_(True), jnp.int32(0)))
        return flat.reshape(shape), ls.reshape(shape)

    def quiescent_jump(args):
        lbl, ls_old = args
        f, s = _jump_pass(lbl.reshape(-1), ls_old.reshape(-1), n_sorted)
        return f.reshape(shape), s.reshape(shape)

    # Hooking only matters when the sweep decreased some label: with
    # nbr_min_i >= label_i everywhere, root_min >= the root's own label
    # (hook target p = the point named by label_i, and p's label <= p <=
    # nbr_min_i), so the quiescent-sweep branch skips the hook scatter and
    # runs a SINGLE jump pass — residual chains from earlier capped jump
    # rounds must still collapse, and the exit test stays sound: the loop
    # only stops when the sweep is quiescent AND that jump is an identity,
    # i.e. every label already names a root.
    new, ls_new = jax.lax.cond(sweep_changed, converge, quiescent_jump,
                               (direct, lslot))
    return new, ls_new, nbr_min, jnp.any(new != label)


def _min_sweep_impl(use_pallas: bool):
    if not use_pallas:
        return neighbor_min_sweep
    from .pallas_neighbors import min_sweep_pallas_dma, min_sweep_pallas_sym

    def sweep(index, payload, eps_space, eps_time, query_limit=None,
              bypass_limit=None, use_limit=False):
        # the symmetric-pair kernel covers every case (2D/3D, thresholded
        # border sweeps) when the index carries the pair list; without it,
        # 2D unthresholded sweeps take the directed manual-DMA kernel and
        # everything else falls back to XLA
        if index.pair_a is not None:
            return min_sweep_pallas_sym(index, payload, eps_space, eps_time,
                                        query_limit=query_limit,
                                        bypass_limit=bypass_limit,
                                        use_limit=use_limit)
        if use_limit or index.coords.shape[-1] != 2:
            return neighbor_min_sweep(index, payload, eps_space, eps_time,
                                      query_limit=query_limit,
                                      bypass_limit=bypass_limit,
                                      use_limit=use_limit)
        return min_sweep_pallas_dma(index, payload, eps_space, eps_time)

    return sweep


def _core_stats(index: SpatialIndex, eps_space, eps_time, n_offsets: int,
                use_pallas: bool):
    """Degree (+ frame presence) sweep: the Pallas kernels cover the hot
    tracker case (2D coords, no min_frames) — the symmetric-pair kernel
    when the index carries the unordered pair list (each pair block
    evaluated once), else the manual-DMA directed kernel; other cases use
    the XLA engine."""
    if use_pallas:
        if index.pair_a is not None:  # symmetric engine covers 2D and 3D
            if n_offsets == 0:
                from .pallas_neighbors import core_stats_pallas_sym

                degree = core_stats_pallas_sym(index, eps_space, eps_time)
                return degree, jnp.zeros_like(degree)
            if n_offsets <= 3:  # 1 + (2k+1) partial rows must fit 8
                from .pallas_neighbors import core_stats_pallas_sym_mf

                return core_stats_pallas_sym_mf(index, eps_space, eps_time,
                                                n_offsets)
        elif n_offsets == 0 and index.coords.shape[-1] == 2:
            from .pallas_neighbors import core_stats_pallas_dma

            degree = core_stats_pallas_dma(index, eps_space, eps_time)
            return degree, jnp.zeros_like(degree)
    return neighbor_core_stats(index, eps_space, eps_time,
                               n_offsets=n_offsets)


@jax.jit
def _finalize_keys(
    index: SpatialIndex,
    comp_key: jnp.ndarray,
    core: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster-id lookup table from converged component keys (labels ARE the
    min original core index per component).  Returns (rank_lookup,
    num_clusters)."""
    n_orig = index.perm.shape[0]
    presence = jnp.zeros((n_orig + 1,), jnp.int32).at[
        jnp.clip(comp_key.reshape(-1), 0, n_orig)].max(
        jnp.where(core.reshape(-1), 1, 0), mode="drop")
    rank_lookup = jnp.cumsum(presence) - 1  # key -> cluster id
    num_clusters = rank_lookup[n_orig] + 1 - presence[n_orig]
    return rank_lookup, num_clusters


@jax.jit
def _assemble_labels(
    index: SpatialIndex,
    core: jnp.ndarray,
    comp_key: jnp.ndarray,
    border_key: jnp.ndarray,
    rank_lookup: jnp.ndarray,
) -> jnp.ndarray:
    n_orig = index.perm.shape[0]
    core_labels = rank_lookup[jnp.clip(comp_key, 0, n_orig)]
    border_labels = jnp.where(
        border_key < INT_MAX,
        rank_lookup[jnp.clip(border_key, 0, n_orig)], -1)
    labels_sorted = jnp.where(core, core_labels,
                              jnp.where(index.valid, border_labels, -1))
    return jnp.zeros((n_orig,), jnp.int32).at[index.perm].set(
        labels_sorted.reshape(-1)[:n_orig])


def compute_core_mask(
    index: SpatialIndex,
    eps_space: float,
    eps_time: float,
    min_samples: int,
    min_frames: int = 1,
) -> jnp.ndarray:
    """ST-DBSCAN core-point mask over a built spatial index."""
    n_offsets = int(math.floor(eps_time)) if min_frames > 1 else 0
    degree, frame_count = neighbor_core_stats(
        index, jnp.float32(eps_space), jnp.float32(eps_time),
        n_offsets=n_offsets)
    core = index.valid & (degree >= jnp.int32(min_samples))
    if min_frames > 1:
        core = core & (frame_count >= jnp.int32(min_frames))
    return core


def st_dbscan_device(
    coords: jnp.ndarray,  # (N, D) padded
    times: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,) bool
    eps_space: float,
    eps_time: float,
    min_samples: int,
    min_frames: int = 1,
    border_mode: str = "always",
    tile: int = 512,
    cell_size: Optional[float] = None,
    max_sweeps: int = 256,
    use_pallas: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full device ST-DBSCAN over a padded point buffer.

    One host sync total (the candidate-width pull inside the index build);
    the convergence loop runs on device.  Returns (labels (N,) int32 —
    noise/padding -1, num_clusters).
    """
    n_offsets = int(math.floor(eps_time)) if min_frames > 1 else 0
    pairs = bool(use_pallas) and sym_engine_ok(
        tile=tile, has_z=coords.shape[1] >= 3, n_offsets=n_offsets)
    # with the symmetric engine live and every sweep it will run covered
    # (the min_frames stats kernel handles n_offsets <= 3; beyond that
    # _core_stats falls back to the XLA engine, which needs the table),
    # the directed candidate table is never read — skip building it
    directed = (not pairs) or n_offsets > 3
    index = build_spatial_index(coords, times, valid, eps_space, eps_time,
                                tile=tile, cell_size=cell_size, pairs=pairs,
                                directed=directed)
    return cluster_index(
        index, jnp.float32(eps_space), jnp.float32(eps_time),
        int(min_samples), int(min_frames), n_offsets, border_mode,
        int(max_sweeps), use_pallas=bool(use_pallas))


@functools.partial(jax.jit, static_argnames=("min_samples", "min_frames",
                                             "n_offsets", "border_mode",
                                             "max_sweeps", "use_pallas",
                                             "hoisted_rounds",
                                             "tail_jump_cap"))
def cluster_index(
    index: SpatialIndex,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    min_samples: int,
    min_frames: int,
    n_offsets: int,
    border_mode: str,
    max_sweeps: int,
    use_pallas: bool = False,
    hoisted_rounds: int = 1,
    tail_jump_cap: int = 2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cluster a built spatial index as one device program: the convergence
    loop is a bounded ``lax.while_loop`` (zero host syncs — the only sync in
    the whole clustering path is the candidate-width pull in the index
    build).

    ``use_pallas`` selects the HYBRID engine: the degree-stats full sweep
    runs as the manual-DMA Pallas kernel (measured 186 ms vs 235 ms XLA at
    the bench scene's 1.55M points), while the min sweeps stay XLA — the
    DMA min kernel measured a wash there (290 ms vs 284 ms; both numbers
    in ROUND3.md) and the gated incremental tail is XLA's strength.
    """
    degree, frame_count = _core_stats(index, eps_space, eps_time, n_offsets,
                                      use_pallas)
    core = index.valid & (degree >= jnp.int32(min_samples))
    if min_frames > 1:
        core = core & (frame_count >= jnp.int32(min_frames))

    perm2d, inv = _perm2d_and_inv(index, core)
    label0 = jnp.where(core, perm2d, INT_MAX)
    n_sorted = label0.size
    own_slot = jnp.arange(n_sorted, dtype=jnp.int32).reshape(label0.shape)
    # initial labels are each core's own original index -> own slot
    lslot0 = jnp.where(core, own_slot, n_sorted)

    # Incremental frontier loop: propagation is monotone, so each round
    # rescans only candidates in tiles whose labels changed last round,
    # folding minima into a per-point accumulator.  The accumulator
    # equals the full sweep's neighbor-min at every round (every label
    # decrease marks its tile changed, forcing a rescan), so at
    # convergence it is also exactly the "always" border key — and the
    # tail rounds plus the final confirming round shrink from full
    # candidate-table sweeps to a near-empty frontier.  Round 1 always
    # scans everything, so it runs hoisted as a plain full sweep with
    # none of the gating's candidate-compaction overhead.
    label1, lslot1, acc1, _ = _cc_step(index, label0, lslot0, core, inv,
                                       eps_space, eps_time, use_pallas=False,
                                       sym=use_pallas)
    prev = label0
    for _ in range(hoisted_rounds - 1):
        # early rounds rescan essentially everything (the round-2 frontier
        # on the bench scene is 3037/3072 tiles), so additional hoisted
        # full rounds skip the gating's candidate-compaction overhead and
        # keep round 1's deeper jump-to-fixpoint collapse
        prev = label1
        label1, lslot1, nbr1, _ = _cc_step(index, label1, lslot1, core, inv,
                                           eps_space, eps_time,
                                           use_pallas=False,
                                           sym=use_pallas)
        acc1 = jnp.minimum(acc1, nbr1)
    # the gated loop's frontier: tiles whose labels changed in the LAST
    # hoisted round (monotone labels make this exactly the set whose
    # candidates round hoisted+1 must rescan)
    changed1 = jnp.any(label1 != prev, axis=1)

    def cond(state):
        return state[4] & (state[5] < max_sweeps)

    def body(state):
        lbl, ls, acc, tchanged, _, it = state
        new, ls2, acc2, changed = _cc_step_gated(index, lbl, ls, core, inv,
                                                 acc, tchanged, eps_space,
                                                 eps_time,
                                                 jump_cap=tail_jump_cap,
                                                 sym=use_pallas)
        return (new, ls2, acc2, jnp.any(new != lbl, axis=1), changed, it + 1)

    label, _, last_nbr_min, _, _, _ = jax.lax.while_loop(
        cond, body,
        (label1, lslot1, acc1, changed1, jnp.any(changed1), jnp.int32(1)))

    comp_key = jnp.where(core, label, INT_MAX)
    rank_lookup, num_clusters = _finalize_keys(index, comp_key, core)
    if border_mode == "if_earlier":
        # a cluster claims border b when it was created before b was scanned
        # (key < b's original index) OR b directly neighbors the cluster's
        # root core (initial seeds are enqueued unconditionally in the
        # reference BFS, stdbscan_denoising_pipeline.py:343-344)
        is_root = core & (comp_key == perm2d)
        if use_pallas and index.pair_a is not None:
            # border-gated: _assemble_labels reads border_key only at valid
            # NON-CORE points, so pairs between two all-core tiles are dead
            # — scope the sweep to pairs touching a non-core tile (exact)
            from .pallas_neighbors import min_sweep_pallas_sym_scoped

            noncore_tile = jnp.any(index.valid & ~core, axis=1)
            border_key = min_sweep_pallas_sym_scoped(
                index, comp_key, eps_space, eps_time, noncore_tile,
                query_limit=perm2d, bypass_limit=is_root)
        else:
            sweep = _min_sweep_impl(use_pallas)
            border_key = sweep(index, comp_key, eps_space, eps_time,
                               query_limit=perm2d,
                               bypass_limit=is_root, use_limit=True)
    else:
        border_key = last_nbr_min
    labels = _assemble_labels(index, core, comp_key, border_key, rank_lookup)
    return labels, num_clusters


def st_dbscan_traceable(
    coords: jnp.ndarray,
    times: jnp.ndarray,
    valid: jnp.ndarray,
    eps_space: float,
    eps_time: float,
    min_samples: int,
    tile: int = 256,
    max_sweeps: int = 64,
    k_pad: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fully-jittable ST-DBSCAN ('always' border mode): static candidate
    width (no host sync) and a bounded ``lax.while_loop`` for the label
    propagation.  Used by fused single-program pipelines and the graft
    entry; the host-driven :func:`st_dbscan_device` is preferred
    interactively (adaptive K, early exit).

    ``k_pad`` bounds the candidate-table width (0 = the dense num_tiles
    table, safe but O(num_tiles^2) memory — fine for small fused programs;
    at scale pass a bound and validate ``max(index.cand_count) <= k_pad``
    like models/tracker.py does, or results silently drop edges)."""
    index = build_spatial_index(coords, times, valid, eps_space, eps_time,
                                tile=tile,
                                k_pad=k_pad if k_pad > 0 else 1 << 30)
    return cluster_index(index, jnp.float32(eps_space),
                         jnp.float32(eps_time), int(min_samples), 1, 0,
                         "always", int(max_sweeps))


def st_dbscan(
    coords: np.ndarray,
    times: np.ndarray,
    eps_space: float,
    eps_time: float,
    min_samples: int,
    min_frames: int = 1,
    border_mode: str = "always",
    config: Optional[ClusteringConfig] = None,
    use_pallas: Optional[bool] = None,
) -> np.ndarray:
    """Host-facing ST-DBSCAN (reference API parity, processors/
    clustering.py:49-115): takes unpadded arrays, returns int32 labels.

    ``use_pallas=None`` auto-selects the hybrid Pallas engine on the TPU
    backend (the symmetric-pair kernels cover 2D and 3D)."""
    coords = np.asarray(coords, dtype=np.float32)
    n = coords.shape[0]
    if n == 0:
        return np.empty((0,), dtype=np.int32)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    tile = config.tile_size if config else 512
    tile = min(tile, max(64, 1 << (n - 1).bit_length()))
    labels, _ = st_dbscan_device(
        jnp.asarray(coords), jnp.asarray(times, dtype=jnp.float32),
        jnp.ones((n,), bool), eps_space, eps_time, min_samples,
        min_frames=min_frames, border_mode=border_mode, tile=tile,
        cell_size=config.cell_size if config else None,
        max_sweeps=config.max_label_sweeps if config else 256,
        use_pallas=bool(use_pallas))
    return np.asarray(labels)
