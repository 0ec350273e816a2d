"""Spatio-temporal neighbor engine: Morton-sorted tile pairs with bounding-box
pruning.

This replaces the reference's BallTree / KD-tree radius queries
(radar-pipeline processors/clustering.py:84-85; radar-pipeline-rs
clustering.rs:228-258) with a TPU-shaped design:

1. hash points into eps-sized cells and sort by Morton code (device sort) —
   spatial locality becomes memory locality;
2. group sorted points into fixed tiles; compute per-tile space/time bounding
   boxes;
3. prune: tile pair (q, c) interacts only if boxes overlap within eps_space /
   eps_time — a (T, T) boolean matrix reduced to per-query candidate lists;
4. sweep: for each query tile, scan its candidate tiles and evaluate the
   dense (tile x tile) pair predicate on the VPU, accumulating per-point
   reductions (neighbor counts, frame-presence bitmasks, label minima).

All shapes static; candidate-list width K is bucketed to limit recompiles.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "SpatialIndex",
    "build_spatial_index",
    "neighbor_core_stats",
    "neighbor_min_sweep",
    "neighbor_min_sweep_gated",
]

INT_MAX = np.int32(2**31 - 1)
# largest tile count the index supports: _pairs_from_mask scatters the flat
# int32 position a * nt + b, so nt*nt must stay below 2^31 (isqrt(2^31-1));
# the (nt, nt) overlap mask stops fitting in HBM well before this anyway
MAX_NUM_TILES = 46_340
# invalid points' coordinates inside the sorted index (matches
# ops/geometry.PAD_COORD): any valid-invalid pair fails the distance test
# by construction, so the pair predicate needs no validity operands
_PAD_SENTINEL = np.float32(1.0e9)
# dead candidate slots' time: |dt| is huge, so they fail the temporal test
_DEAD_TIME = np.float32(4.0e9)
# combined SMEM budget for the symmetric kernels' prefetched pair lists
# (pair_a + pair_b, int32 each -> 8 bytes/pair); v5e SMEM is 1 MiB and a
# request past it fails Mosaic allocation (measured: the 9.5M-point denoise
# scene's 524288-wide list asks 2 MiB), so lists wider than the budget are
# dispatched in SMEM-sized CHUNKS by the symmetric wrappers
# (ops/pallas_neighbors.py) — build_spatial_index rounds the list width up
# to a whole number of chunks so every chunk compiles to the same shape
SYM_PAIR_SMEM_BUDGET = 512 * 1024


def sym_pair_chunk_cap() -> int:
    """Pairs per symmetric-kernel dispatch: both int32 lists of one chunk
    must fit the SMEM prefetch budget (8 bytes per pair)."""
    return max(8, SYM_PAIR_SMEM_BUDGET // 8)


_QUERY_CHUNK = 16  # query tiles per sweep step (lax.map runs chunks
# sequentially; measured optimum at bench scale — smaller chunks tighten
# the per-chunk dynamic loop bound, larger ones amortize per-step
# overhead: 16/32/64/96 -> 1459/1484/1557/1594 ms cluster program).
# Scaling the chunk with the scene (nt//192, i.e. 80 tiles/chunk at the
# denoise scene's 20480 tiles) was measured and REJECTED: the directed
# whole program slowed 26.5 -> 28.8 s (coarser chunks inflate each
# chunk's dynamic loop bound faster than they amortize dispatch), and
# the gated sweep's sparse-frontier floor did not move at all.


def _query_chunk(num_tiles: int) -> int:
    """Tiles per sweep step (see _QUERY_CHUNK: constant measured optimum;
    scene-scaled variants lose)."""
    return _QUERY_CHUNK


@jax.tree_util.register_pytree_node_class
@dataclass
class SpatialIndex:
    """Morton-sorted, tiled view of a point set plus pruned tile-pair lists.

    ``qorder`` lists query-tile ids in ascending candidate count: sweeping in
    that order groups tiles of similar workload into the same chunk, whose
    dynamic loop then runs only the chunk's own maximum — dense-region
    worst cases stop inflating the whole grid (candidate counts are heavily
    skewed: the p50 tile has 0 pruned candidates, the max can have hundreds).
    """

    coords: jnp.ndarray  # (Ntiles, T, D) sorted
    times: jnp.ndarray  # (Ntiles, T)
    valid: jnp.ndarray  # (Ntiles, T)
    perm: jnp.ndarray  # (N,) original index of each sorted slot
    # directed candidate table (None on a pairs-only build: the symmetric
    # kernels never read it, and at the denoise flagship's ~18.5k tiles it
    # costs ~600 MB of HBM plus a (nt, nt) row argsort to build)
    cand_idx: Optional[jnp.ndarray] = None  # (Ntiles, K) candidate tile ids
    cand_count: Optional[jnp.ndarray] = None  # (Ntiles,) valid candidates
    qorder: Optional[jnp.ndarray] = None  # tile ids by ascending cand_count
    # optional unordered tile-pair list (a-major sorted, a <= b, self pairs
    # included once): the symmetric Pallas sweeps evaluate each pair block
    # ONCE and fold it into both tiles' outputs, halving predicate work on
    # full-table sweeps.  pair_count (device scalar) is the live length;
    # entries beyond it are (last live a, 0) — the dead tail repeats the
    # final live a-tile so the kernels' a-side output block never revisits
    # an earlier tile's accumulator (see _pairs_from_mask).
    pair_a: Optional[jnp.ndarray] = None  # (P_pad,) int32
    pair_b: Optional[jnp.ndarray] = None  # (P_pad,) int32
    pair_count: Optional[jnp.ndarray] = None  # () int32

    def tree_flatten(self):
        return ((self.coords, self.times, self.valid, self.perm,
                 self.cand_idx, self.cand_count, self.qorder,
                 self.pair_a, self.pair_b, self.pair_count), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def num_tiles(self) -> int:
        return self.coords.shape[0]

    @property
    def tile(self) -> int:
        return self.coords.shape[1]


def _morton_interleave(v: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 16 bits of v so they occupy even bit positions."""
    v = v & 0xFFFF
    v = (v | (v << 8)) & 0x00FF00FF
    v = (v | (v << 4)) & 0x0F0F0F0F
    v = (v | (v << 2)) & 0x33333333
    v = (v | (v << 1)) & 0x55555555
    return v


@functools.partial(jax.jit, static_argnames=("num_tiles", "tile"))
def _sort_and_tile(coords, times, valid, cell_size, num_tiles, tile):
    n = coords.shape[0]
    d = coords.shape[1]
    x = coords[:, 0]
    y = coords[:, 1]
    safe = valid
    xmin = jnp.min(jnp.where(safe, x, jnp.inf))
    ymin = jnp.min(jnp.where(safe, y, jnp.inf))
    cx = jnp.clip(((x - xmin) / cell_size).astype(jnp.int32), 0, 0x7FFF)
    cy = jnp.clip(((y - ymin) / cell_size).astype(jnp.int32), 0, 0x7FFF)
    morton = _morton_interleave(cx) | (_morton_interleave(cy) << 1)
    key = jnp.where(valid, morton, INT_MAX)
    perm = jnp.argsort(key, stable=True)

    pad = num_tiles * tile - n
    # invalid points take a far-away sentinel coordinate so the distance
    # predicate rejects any valid-invalid pair BY CONSTRUCTION — the
    # sweeps then evaluate d2/dt without per-point validity operands
    # (invalid-invalid pairs can pass, but invalid points never carry a
    # payload and their own stats are masked by index.valid downstream)
    coords_s = jnp.where(valid[:, None], coords, _PAD_SENTINEL)[perm]
    times_s = times[perm]
    valid_s = valid[perm]
    if pad:
        coords_s = jnp.pad(coords_s, ((0, pad), (0, 0)),
                           constant_values=_PAD_SENTINEL)
        times_s = jnp.pad(times_s, ((0, pad),))
        valid_s = jnp.pad(valid_s, ((0, pad),))
    coords_t = coords_s.reshape(num_tiles, tile, d)
    times_t = times_s.reshape(num_tiles, tile)
    valid_t = valid_s.reshape(num_tiles, tile)

    # per-tile bounding boxes over valid points only
    big = jnp.float32(np.inf)
    lo = jnp.min(jnp.where(valid_t[..., None], coords_t, big), axis=1)
    hi = jnp.max(jnp.where(valid_t[..., None], coords_t, -big), axis=1)
    tlo = jnp.min(jnp.where(valid_t, times_t, big), axis=1)
    thi = jnp.max(jnp.where(valid_t, times_t, -big), axis=1)
    return coords_t, times_t, valid_t, perm, lo, hi, tlo, thi


@jax.jit
def _tile_pair_mask(lo, hi, tlo, thi, eps_space, eps_time):
    """(Ntiles, Ntiles) bool: bounding boxes within eps in every spatial dim
    and within eps_time temporally."""
    sep = jnp.maximum(lo[:, None, :] - hi[None, :, :],
                      lo[None, :, :] - hi[:, None, :])  # per-dim gap (can be -inf)
    gap = jnp.maximum(sep, 0.0)
    space_ok = jnp.sum(gap * gap, axis=-1) <= eps_space * eps_space
    tgap = jnp.maximum(jnp.maximum(tlo[:, None] - thi[None, :],
                                   tlo[None, :] - thi[:, None]), 0.0)
    time_ok = tgap <= eps_time
    nonempty = jnp.isfinite(tlo)
    return space_ok & time_ok & nonempty[:, None] & nonempty[None, :]


def quarter_pow2_bucket(n: int, floor: int = 64) -> int:
    """Smallest quarter-power-of-two >= n: bounds compiled-shape churn
    while capping padding at 25% (pure pow2 wastes up to 2x — at the
    denoise flagship's ~294k pairs that is ~1 GB of per-pair partial
    buffer per symmetric sweep)."""
    n = max(n, 1)
    if n <= floor:
        return floor
    half = 1 << ((n - 1).bit_length() - 1)
    step = max(half // 4, 1)
    return half + -(-(n - half) // step) * step


@functools.partial(jax.jit, static_argnames=("p_pad",))
def _pairs_from_mask(mask, p_pad):
    """Unordered tile-pair list (a <= b, self pairs included once) compacted
    directly from the (nt, nt) overlap mask in row-major order (ascending a,
    then ascending b) — no directed candidate table required, so a
    pairs-only index build skips that table entirely.  Entries beyond the
    true count are (last live a, 0); the true count returns as a device
    scalar so callers with a static ``p_pad`` hint can detect overflow
    (dropped pairs) and rebuild."""
    nt = mask.shape[0]
    tri = jnp.arange(nt, dtype=jnp.int32)
    keep = mask & (tri[None, :] >= tri[:, None])
    # two-level compaction: position within row + exclusive row offsets
    # (cumsum + scatter, not argsort: the flat argsort this replaced costs
    # a full O(nt*k log) sort; these are elementwise passes)
    row_counts = jnp.sum(keep, axis=1, dtype=jnp.int32)
    row_off = jnp.cumsum(row_counts) - row_counts
    within = jnp.cumsum(keep, axis=1, dtype=jnp.int32) - 1
    dest = jnp.where(keep, row_off[:, None] + within, p_pad)
    # scatter the flat (a * nt + b) position; (a, b) derive on the narrow
    # output instead of scattering two full-size operands.  int32 bounds
    # nt at 46k (~23M points at tile 512) — far past where the (nt, nt)
    # mask itself stops fitting, so the mask is the binding constraint
    flatpos = tri[:, None] * nt + tri[None, :]
    pos = jnp.zeros((p_pad + 1,), jnp.int32).at[
        jnp.minimum(dest, p_pad).reshape(-1)].set(
        flatpos.reshape(-1), mode="drop")[:p_pad]
    count = jnp.sum(row_counts)
    live = jnp.arange(p_pad, dtype=jnp.int32) < count
    # dead-tail entries repeat the LAST live a (live as are ascending, so
    # max == last): the symmetric kernels' a-side output block then never
    # revisits (and re-initializes) an earlier tile's accumulator
    pa_live = jnp.where(live, pos // nt, 0)
    pa = jnp.where(live, pa_live, jnp.max(pa_live)).astype(jnp.int32)
    pb = jnp.where(live, pos % nt, 0).astype(jnp.int32)
    return pa, pb, count.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k_pad",))
def _candidates_from_mask(mask, k_pad):
    # argsort(~mask) stable puts True entries first in ascending column
    # order; a cumsum + flat-scatter compaction (the gated sweep's trick)
    # was A/B'd here and LOST on the dense (nt, nt) mask (148 vs 97 ms
    # index build at 3072 tiles) — the trick only wins on the gated
    # sweep's narrow (nt, K) lists
    count = jnp.sum(mask, axis=1).astype(jnp.int32)
    order = jnp.argsort(~mask, axis=1, stable=True)
    return order[:, :k_pad].astype(jnp.int32), count


def build_spatial_index(
    coords: jnp.ndarray,  # (N, D) padded
    times: jnp.ndarray,  # (N,)
    valid: jnp.ndarray,  # (N,) bool
    eps_space: float,
    eps_time: float,
    tile: int = 512,
    cell_size: Optional[float] = None,
    k_pad: Optional[int] = None,
    pairs: bool = False,
    p_pad: Optional[int] = None,
    directed: bool = True,
) -> SpatialIndex:
    """Build the sorted tile index + pruned candidate lists.

    Without ``k_pad``: one host sync (the candidate-list width) per distinct
    data distribution; K is bucketed to powers of two to bound
    recompilation.  With a static ``k_pad`` the build is fully traceable
    (required inside shard_map for the multi-chip path); candidates beyond
    k_pad would be silently dropped, so callers pass k_pad >= worst case
    (num_tiles is always safe).

    ``pairs`` additionally compacts the UNORDERED tile-pair list (a <= b)
    for the symmetric Pallas sweeps; its static width comes from ``p_pad``
    (hint; true count returns on the index for overflow detection) or the
    same single host sync that sizes k_pad.

    ``directed=False`` (requires ``pairs``) skips the directed (nt, k_pad)
    candidate table entirely — callers whose every sweep runs the symmetric
    pair engine never read it, and at the denoise flagship's scale it costs
    ~600 MB of HBM plus a (nt, nt) row argsort (the XLA fallback sweeps
    then raise on such an index, by design).
    """
    if not directed and not pairs:
        raise ValueError("directed=False requires pairs=True")
    if tile < 8 or (tile & (tile - 1)) != 0:
        # the Pallas sweeps reduce (T, T) blocks by power-of-two halving
        # (pallas_neighbors._or_fold_rows/_cols) and TPU lane layouts want
        # power-of-two minor dims; a non-power-of-two tile would silently
        # drop lanes from the fold, corrupting frame counts and labels
        raise ValueError(
            f"tile_size must be a power of two >= 8, got {tile} "
            f"(try {1 << max(3, (tile - 1).bit_length())})")
    if cell_size is None:
        cell_size = eps_space
    n = coords.shape[0]
    num_tiles = max(1, -(-n // tile))
    if num_tiles > MAX_NUM_TILES:
        # fail fast with the remedy instead of an opaque OOM: the (nt, nt)
        # overlap mask and _pairs_from_mask's int32 flat position a*nt+b
        # both bound nt (the int32 bound, 46,340, is binding — the bool
        # mask alone would be ~2.1 GB there).  ~23M points at tile=512.
        raise ValueError(
            f"spatial index would need {num_tiles} tiles for {n} points at "
            f"tile={tile}, past the supported maximum of {MAX_NUM_TILES} "
            f"(the (nt, nt) tile-overlap mask / int32 pair-position bound). "
            f"Raise tile_size (e.g. {1 << (-(-n // MAX_NUM_TILES) - 1).bit_length()}) "
            "or reduce the point count per clustering call.")
    max_pairs = num_tiles * (num_tiles + 1) // 2
    coords_t, times_t, valid_t, perm, lo, hi, tlo, thi = _sort_and_tile(
        jnp.asarray(coords, jnp.float32), jnp.asarray(times, jnp.float32),
        jnp.asarray(valid), jnp.float32(cell_size), num_tiles, tile)
    mask = _tile_pair_mask(lo, hi, tlo, thi, jnp.float32(eps_space),
                           jnp.float32(eps_time))
    if (directed and k_pad is None) or (pairs and p_pad is None):
        # ONE host sync covers both static widths (tiny packed array)
        counts = jnp.sum(mask, axis=1)
        tri = jnp.arange(num_tiles, dtype=jnp.int32)
        n_upper = jnp.sum(mask & (tri[None, :] >= tri[:, None]))
        k_max, p_true = (int(v) for v in
                         np.asarray(jnp.stack([jnp.max(counts), n_upper])))
        if k_pad is None:
            k_pad = 1
            while k_pad < max(k_max, 1):
                k_pad *= 2
            k_pad = min(k_pad, num_tiles)
        if pairs and p_pad is None:
            p_pad = quarter_pow2_bucket(p_true)
    cand_idx = cand_count = qorder = None
    if directed:
        k_pad = min(k_pad, num_tiles)
        cand_idx, cand_count = _candidates_from_mask(mask, k_pad)
        qorder = jnp.argsort(cand_count, stable=True).astype(jnp.int32)
    pair_a = pair_b = pair_count = None
    if pairs:
        width = min(p_pad, max_pairs)
        cap = sym_pair_chunk_cap()
        if width > cap:
            # past the SMEM prefetch budget the symmetric wrappers dispatch
            # the list in chunks; rounding the width up to a whole number
            # of chunks keeps every chunk the same compiled shape (clamped
            # to the maximum possible pair count — a short final chunk is
            # still correct, it just compiles one extra kernel shape)
            width = min(cap * -(-width // cap), max_pairs)
        pair_a, pair_b, pair_count = _pairs_from_mask(mask, width)
    return SpatialIndex(coords=coords_t, times=times_t, valid=valid_t,
                        perm=perm, cand_idx=cand_idx, cand_count=cand_count,
                        qorder=qorder, pair_a=pair_a, pair_b=pair_b,
                        pair_count=pair_count)


# ---------------------------------------------------------------------------
# Sweeps
# ---------------------------------------------------------------------------


def _pair_mask(qc, qt, cc, ct, eps2, eps_time):
    """Dense (QC, T, T) spatio-temporal neighbor predicate for a chunk of
    query tiles against one gathered candidate tile each.

    No validity operands: the index build substitutes a far-away sentinel
    coordinate for invalid points (valid-invalid pairs fail the distance
    test by construction) and callers fold candidate-slot liveness into
    ``ct`` (dead slots carry a huge time).  Invalid-invalid pairs can pass,
    but invalid points never carry payloads and their own statistics are
    masked by ``index.valid`` downstream."""
    diff = qc[:, :, None, :] - cc[:, None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    dt = ct[:, None, :] - qt[:, :, None]
    return (d2 <= eps2) & (jnp.abs(dt) <= eps_time), dt


@functools.partial(jax.jit, static_argnames=("n_offsets",))
def neighbor_core_stats(
    index: SpatialIndex,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    n_offsets: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-point ST-neighbor count (self included) and, when n_offsets > 0,
    the count of distinct integer frame offsets covered by neighbors
    (for the min_frames temporal-persistence core test,
    stdbscan_denoising_pipeline.py:308-315).

    Returns (degree (Ntiles, T) int32, frame_count (Ntiles, T) int32).
    Outputs at invalid/padded slots are unspecified (the sentinel-
    coordinate design lets invalid-invalid pairs count there); consumers
    must mask with ``index.valid``.
    """
    eps2 = eps_space * eps_space
    coords, times, valid = index.coords, index.times, index.valid
    num_tiles, tile = index.num_tiles, index.tile
    ki = n_offsets  # frame offsets in [-ki, ki]

    def chunk_fn(args):
        qc, qt, qv, cands, ccount = args
        # counts can exceed the static candidate width when the caller
        # passed an undersized k_pad hint (detected + retried after the
        # run); the clamp keeps the loop in bounds instead of re-reading
        # the clamped last column
        kmax = jnp.minimum(jnp.max(ccount), cands.shape[1])
        qshape = qc.shape[:2]

        def cond(state):
            return state[0] < kmax

        def body(state):
            k, deg, fbits = state
            cidx = cands[:, k]
            live = k < ccount
            cc = coords[cidx]
            ct = jnp.where(live[:, None], times[cidx], _DEAD_TIME)
            mask, dt = _pair_mask(qc, qt, cc, ct, eps2, eps_time)
            deg = deg + jnp.sum(mask, axis=2, dtype=jnp.int32)
            if ki > 0:
                dti = jnp.round(dt).astype(jnp.int32)
                for off in range(-ki, ki + 1):
                    hit = jnp.any(mask & (dti == off), axis=2)
                    fbits = fbits | jnp.where(hit, np.int32(1 << (off + ki)),
                                              0).astype(jnp.int32)
            return k + 1, deg, fbits

        init = (jnp.int32(0), jnp.zeros(qshape, jnp.int32),
                jnp.zeros(qshape, jnp.int32))
        _, deg, fbits = jax.lax.while_loop(cond, body, init)
        return deg, fbits

    qcs, qorder = _chunked(index, _query_chunk(index.num_tiles))
    deg_c, fbits_c = jax.lax.map(chunk_fn, qcs)
    deg = _unchunk(deg_c, qorder, num_tiles, tile)
    fbits = _unchunk(fbits_c, qorder, num_tiles, tile)
    frame_count = _popcount(fbits) if ki > 0 else jnp.zeros_like(deg)
    return deg, frame_count


@functools.partial(jax.jit, static_argnames=("use_limit",))
def neighbor_min_sweep(
    index: SpatialIndex,
    payload: jnp.ndarray,  # (Ntiles, T) int32; masked-out points = INT_MAX
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    query_limit: Optional[jnp.ndarray] = None,  # (Ntiles, T) int32
    bypass_limit: Optional[jnp.ndarray] = None,  # (Ntiles, T) bool
    use_limit: bool = False,
) -> jnp.ndarray:
    """Per-point minimum of ``payload`` over ST-neighbors (self included).

    Contract: ``payload`` must be INT_MAX at invalid/padded slots (the
    sentinel-coordinate design evaluates invalid-invalid pairs as
    neighbors, which is harmless exactly because their payloads are
    identity), and outputs at invalid slots are unspecified.

    With ``use_limit`` a neighbor's payload participates only when it is
    strictly below the query point's ``query_limit`` OR the neighbor carries
    ``bypass_limit`` (used for the denoiser's scan-order-dependent border
    attachment, where a cluster's root core claims its direct neighbors
    unconditionally).  Used both for connected-component label propagation
    over core points and for border-point cluster attachment.
    """
    eps2 = eps_space * eps_space
    coords, times, valid = index.coords, index.times, index.valid
    num_tiles, tile = index.num_tiles, index.tile
    if query_limit is None:
        query_limit = jnp.zeros((1, 1), jnp.int32)  # placeholder
    if bypass_limit is None:
        bypass_limit = jnp.zeros((num_tiles, tile), bool)
    limit_c = query_limit.reshape(num_tiles, tile) if use_limit else None

    def chunk_fn(args):
        qc, qt, qv, cands, ccount, qlim = args
        kmax = jnp.minimum(jnp.max(ccount), cands.shape[1])

        def cond(state):
            return state[0] < kmax

        def body(state):
            k, acc = state
            cidx = cands[:, k]
            live = k < ccount
            cc = coords[cidx]
            ct = jnp.where(live[:, None], times[cidx], _DEAD_TIME)
            mask, _ = _pair_mask(qc, qt, cc, ct, eps2, eps_time)
            pay = pb = payload[cidx][:, None, :]  # (QC, 1, T)
            if use_limit:
                byp = bypass_limit[cidx][:, None, :]
                mask = mask & ((pb < qlim[:, :, None]) | byp)
            cand_min = jnp.min(jnp.where(mask, pay, INT_MAX), axis=2)
            return k + 1, jnp.minimum(acc, cand_min)

        init = (jnp.int32(0), jnp.full(qc.shape[:2], INT_MAX, jnp.int32))
        _, acc = jax.lax.while_loop(cond, body, init)
        return acc

    qcs, qorder = _chunked(index, _query_chunk(index.num_tiles))
    nc = qcs[0].shape[0]
    if use_limit:
        qcs = qcs + (limit_c[qorder].reshape(nc, -1, tile),)
    else:
        qcs = qcs + (jnp.zeros((nc, qcs[0].shape[1], 1), jnp.int32),)
    out = jax.lax.map(chunk_fn, qcs)
    return _unchunk(out, qorder, num_tiles, tile)


def _chunked(index: SpatialIndex, chunk: int, qorder=None, cand_idx=None,
             cand_count=None):
    """Gather tile arrays in candidate-count-sorted order and reshape to
    (num_chunks, chunk, ...) for lax.map.  Returns (chunk arrays, qorder).
    ``qorder``/``cand_idx``/``cand_count`` override the index's own (used by
    the gated incremental sweep, whose candidate lists shrink per round)."""
    num_tiles, tile = index.num_tiles, index.tile
    c = min(chunk, num_tiles)
    while num_tiles % c:
        c -= 1
    nc = num_tiles // c
    d = index.coords.shape[-1]
    o = index.qorder if qorder is None else qorder
    ci = index.cand_idx if cand_idx is None else cand_idx
    cc = index.cand_count if cand_count is None else cand_count
    if o is None or ci is None or cc is None:
        raise ValueError(
            "index was built pairs-only (directed=False); this XLA fallback "
            "sweep needs the directed candidate table — rebuild with "
            "build_spatial_index(..., directed=True)")
    return (
        index.coords[o].reshape(nc, c, tile, d),
        index.times[o].reshape(nc, c, tile),
        index.valid[o].reshape(nc, c, tile),
        ci[o].reshape(nc, c, -1),
        cc[o].reshape(nc, c),
    ), o


@jax.jit
def neighbor_min_sweep_gated(
    index: SpatialIndex,
    payload: jnp.ndarray,  # (Ntiles, T) int32; masked-out points = INT_MAX
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    acc: jnp.ndarray,  # (Ntiles, T) int32 monotone accumulator
    tile_changed: jnp.ndarray,  # (Ntiles,) bool
) -> jnp.ndarray:
    """Incremental neighbor-min: rescan only candidates in changed tiles,
    folding their payload minima into ``acc``.

    Because label propagation is monotone (payloads only decrease) and every
    decrease marks its tile changed, ``min(acc, fresh gated minima)`` equals
    the full sweep's result at every round — later rounds touch a shrinking
    frontier instead of the whole candidate table.  With ``tile_changed``
    all-True and ``acc`` all-INT_MAX this is exactly ``neighbor_min_sweep``.
    """
    eps2 = eps_space * eps_space
    coords, times, valid = index.coords, index.times, index.valid
    num_tiles, tile = index.num_tiles, index.tile
    if index.cand_idx is None:
        raise ValueError(
            "index was built pairs-only (directed=False); the gated XLA "
            "sweep needs the directed candidate table — rebuild with "
            "build_spatial_index(..., directed=True)")
    k = index.cand_idx.shape[1]

    def chunk_fn(args):
        qc, qt, qv, cands, ccount, acc0 = args
        kmax = jnp.minimum(jnp.max(ccount), cands.shape[1])

        def cond(state):
            return state[0] < kmax

        def body(state):
            kk, a = state
            cidx = cands[:, kk]
            live = kk < ccount
            cc = coords[cidx]
            ct = jnp.where(live[:, None], times[cidx], _DEAD_TIME)
            mask, _ = _pair_mask(qc, qt, cc, ct, eps2, eps_time)
            pay = payload[cidx][:, None, :]
            cand_min = jnp.min(jnp.where(mask, pay, INT_MAX), axis=2)
            return kk + 1, jnp.minimum(a, cand_min)

        _, a = jax.lax.while_loop(cond, body, (jnp.int32(0), acc0))
        return a

    # candidate lists narrowed to changed tiles, changed-first (cumsum +
    # flat scatter: ~25% cheaper than a row-wise argsort, order kept; a
    # lax.cond that skips this for dense frontiers measured SLOWER than
    # just always compacting — conditional dispatch beats the saving)
    cvalid = (jnp.arange(k, dtype=jnp.int32)[None, :]
              < index.cand_count[:, None])
    want = tile_changed[index.cand_idx] & cvalid
    dest = jnp.where(want, jnp.cumsum(want, axis=1) - 1, k)
    rows = jnp.broadcast_to(
        jnp.arange(num_tiles, dtype=jnp.int32)[:, None], dest.shape)
    cand_idx2 = jnp.zeros((num_tiles * (k + 1),), jnp.int32).at[
        (rows * (k + 1) + dest).reshape(-1)].set(
        index.cand_idx.reshape(-1), mode="drop").reshape(
        num_tiles, k + 1)[:, :k]
    cand_count2 = jnp.sum(want, axis=1, dtype=jnp.int32)
    qorder2 = jnp.argsort(cand_count2, stable=True).astype(jnp.int32)

    qcs, qorder = _chunked(index, _query_chunk(index.num_tiles), qorder=qorder2,
                           cand_idx=cand_idx2, cand_count=cand_count2)
    nc = qcs[0].shape[0]
    qcs = qcs + (acc[qorder].reshape(nc, -1, tile),)
    out = jax.lax.map(chunk_fn, qcs)
    return _unchunk(out, qorder, num_tiles, tile)


def _unchunk(chunked: jnp.ndarray, qorder: jnp.ndarray, num_tiles: int,
             tile: int) -> jnp.ndarray:
    """Scatter per-chunk results back to sorted-tile order."""
    flat = chunked.reshape(num_tiles, tile)
    return jnp.zeros_like(flat).at[qorder].set(flat)


def _popcount(v: jnp.ndarray) -> jnp.ndarray:
    v = v - ((v >> 1) & 0x55555555)
    v = (v & 0x33333333) + ((v >> 2) & 0x33333333)
    v = (v + (v >> 4)) & 0x0F0F0F0F
    return (v * 0x01010101) >> 24
