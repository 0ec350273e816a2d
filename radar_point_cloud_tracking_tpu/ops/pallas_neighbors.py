"""Pallas TPU kernels for the ST-neighbor sweeps.

The XLA-composed engine (ops/neighbors.py) gathers each candidate tile with
a separate dynamic-slice inside a scan; these kernels instead drive the
candidate stream through Pallas' scalar-prefetch pipeline: the grid is
(query_tile, candidate_slot) and the candidate block index comes from the
prefetched candidate table, so Mosaic double-buffers candidate tiles straight
from HBM while the VPU evaluates the (T x T) pair predicate.  Accumulators
live in the revisited output block (same index across the candidate axis).

Coordinates are passed as separate (Ntiles, 1, T) planes (lane-aligned,
legal (1, 1, T) Mosaic blocks); masks ride as int32 planes (Mosaic cannot
insert minor dims on sub-32-bit vectors).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .neighbors import INT_MAX, SpatialIndex

__all__ = ["min_sweep_pallas", "core_stats_pallas", "min_sweep_pallas_dma",
           "core_stats_pallas_dma", "core_stats_pallas_sym",
           "min_sweep_pallas_sym", "min_sweep_pallas_sym_scoped"]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pair_mask_block(xq, yq, zq, xc, yc, zc, tq, tc, vq, vc, eps2, eps_t):
    dx = xq[:, None] - xc[None, :]
    dy = yq[:, None] - yc[None, :]
    d2 = dx * dx + dy * dy
    if zq is not None:
        dz = zq[:, None] - zc[None, :]
        d2 = d2 + dz * dz
    dt = tc[None, :] - tq[:, None]
    return ((d2 <= eps2) & (jnp.abs(dt) <= eps_t)
            & (vq[:, None] > 0) & (vc[None, :] > 0)), dt


def _make_min_kernel(has_z: bool, use_limit: bool):
    def kernel(cand_ref, count_ref, *refs):
        # tensor refs layout (all blocks (1, 1, T) unless noted):
        #   queries: x, y, [z], t, v, [qlim]
        #   candidates: x, y, [z], t, v, payload, [bypass]
        #   scalars: eps2, eps_t  (1, 1) SMEM
        #   out: (1, 1, T) int32
        i = 0
        xq = refs[i][0, 0]; i += 1
        yq = refs[i][0, 0]; i += 1
        zq = refs[i][0, 0] if has_z else None
        i += 1 if has_z else 0
        tq = refs[i][0, 0]; i += 1
        vq = refs[i][0, 0]; i += 1
        qlim = refs[i][0, 0] if use_limit else None
        i += 1 if use_limit else 0
        xc = refs[i][0, 0]; i += 1
        yc = refs[i][0, 0]; i += 1
        zc = refs[i][0, 0] if has_z else None
        i += 1 if has_z else 0
        tc = refs[i][0, 0]; i += 1
        vc = refs[i][0, 0]; i += 1
        pay = refs[i][0, 0]; i += 1
        byp = refs[i][0, 0] if use_limit else None
        i += 1 if use_limit else 0
        eps2 = refs[i][0, 0]; i += 1
        eps_t = refs[i][0, 0]; i += 1
        out_ref = refs[i]

        q = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            out_ref[...] = jnp.full_like(out_ref, INT_MAX)

        live = k < count_ref[q]

        @pl.when(live)
        def _():
            mask, _ = _pair_mask_block(xq, yq, zq, xc, yc, zc, tq, tc,
                                       vq, vc, eps2, eps_t)
            if use_limit:
                ok = (pay[None, :] < qlim[:, None]) | (byp[None, :] > 0)
                m = mask & ok
            else:
                m = mask
            cand_min = jnp.min(
                jnp.where(m, pay[None, :], INT_MAX), axis=1)
            out_ref[0, 0] = jnp.minimum(out_ref[0, 0], cand_min)

    return kernel


@functools.partial(jax.jit, static_argnames=("use_limit",))
def min_sweep_pallas(
    index: SpatialIndex,
    payload: jnp.ndarray,  # (Ntiles, T) int32 (masked entries INT_MAX)
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    query_limit: Optional[jnp.ndarray] = None,
    bypass_limit: Optional[jnp.ndarray] = None,
    use_limit: bool = False,
) -> jnp.ndarray:
    """Pallas implementation of neighbors.neighbor_min_sweep."""
    nt, t = index.num_tiles, index.tile
    d = index.coords.shape[-1]
    has_z = d >= 3
    k_pad = index.cand_idx.shape[1]

    def p3(a):  # (nt, t) -> (nt, 1, t): legal Mosaic blocks (1, 1, t)
        return a.reshape(nt, 1, t)

    planes_q = [p3(index.coords[..., 0]), p3(index.coords[..., 1])]
    if has_z:
        planes_q.append(p3(index.coords[..., 2]))
    planes_q += [p3(index.times), p3(index.valid.astype(jnp.int32))]
    if use_limit:
        planes_q.append(p3(query_limit))
    planes_c = list(planes_q[:2 + (1 if has_z else 0)])
    planes_c += [p3(index.times), p3(index.valid.astype(jnp.int32)),
                 p3(payload)]
    if use_limit:
        if bypass_limit is None:
            bypass_limit = jnp.zeros((nt, t), jnp.int32)
        planes_c.append(p3(bypass_limit.astype(jnp.int32)))

    q_spec = pl.BlockSpec((1, 1, t), lambda q, k, cand, cnt: (q, 0, 0))
    c_spec = pl.BlockSpec((1, 1, t),
                          lambda q, k, cand, cnt: (cand[q, k], 0, 0))
    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt, k_pad),
        in_specs=([q_spec] * len(planes_q) + [c_spec] * len(planes_c)
                  + [s_spec, s_spec]),
        out_specs=pl.BlockSpec((1, 1, t), lambda q, k, cand, cnt: (q, 0, 0)),
    )

    out = pl.pallas_call(
        _make_min_kernel(has_z, use_limit),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, 1, t), jnp.int32),
        interpret=_interpret(),
    )(index.cand_idx, index.cand_count,
      *planes_q, *planes_c,
      (eps_space * eps_space).reshape(1, 1),
      eps_time.reshape(1, 1))
    return out.reshape(nt, t)


def _make_stats_kernel(has_z: bool, n_offsets: int):
    ki = n_offsets

    def kernel(cand_ref, count_ref, *refs):
        i = 0
        xq = refs[i][0, 0]; i += 1
        yq = refs[i][0, 0]; i += 1
        zq = refs[i][0, 0] if has_z else None
        i += 1 if has_z else 0
        tq = refs[i][0, 0]; i += 1
        vq = refs[i][0, 0]; i += 1
        xc = refs[i][0, 0]; i += 1
        yc = refs[i][0, 0]; i += 1
        zc = refs[i][0, 0] if has_z else None
        i += 1 if has_z else 0
        tc = refs[i][0, 0]; i += 1
        vc = refs[i][0, 0]; i += 1
        eps2 = refs[i][0, 0]; i += 1
        eps_t = refs[i][0, 0]; i += 1
        deg_ref = refs[i]; i += 1
        bits_ref = refs[i]

        q = pl.program_id(0)
        k = pl.program_id(1)

        @pl.when(k == 0)
        def _():
            deg_ref[...] = jnp.zeros_like(deg_ref)
            bits_ref[...] = jnp.zeros_like(bits_ref)

        live = k < count_ref[q]

        @pl.when(live)
        def _():
            mask, dt = _pair_mask_block(xq, yq, zq, xc, yc, zc, tq, tc,
                                        vq, vc, eps2, eps_t)
            deg_ref[0, 0] = deg_ref[0, 0] + jnp.sum(
                mask, axis=1, dtype=jnp.int32)
            if ki > 0:
                dti = jnp.round(dt).astype(jnp.int32)
                bits = bits_ref[0, 0]
                for off in range(-ki, ki + 1):
                    hit = jnp.any(mask & (dti == off), axis=1)
                    bits = bits | jnp.where(
                        hit, np.int32(1 << (off + ki)), 0).astype(jnp.int32)
                bits_ref[0, 0] = bits

    return kernel


@functools.partial(jax.jit, static_argnames=("n_offsets",))
def core_stats_pallas(
    index: SpatialIndex,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    n_offsets: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pallas implementation of neighbors.neighbor_core_stats."""
    from .neighbors import _popcount

    nt, t = index.num_tiles, index.tile
    d = index.coords.shape[-1]
    has_z = d >= 3
    k_pad = index.cand_idx.shape[1]

    def p3(a):
        return a.reshape(nt, 1, t)

    planes_q = [p3(index.coords[..., 0]), p3(index.coords[..., 1])]
    if has_z:
        planes_q.append(p3(index.coords[..., 2]))
    planes_q += [p3(index.times), p3(index.valid.astype(jnp.int32))]
    planes_c = list(planes_q)

    q_spec = pl.BlockSpec((1, 1, t), lambda q, k, cand, cnt: (q, 0, 0))
    c_spec = pl.BlockSpec((1, 1, t),
                          lambda q, k, cand, cnt: (cand[q, k], 0, 0))
    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    o_spec = pl.BlockSpec((1, 1, t), lambda q, k, cand, cnt: (q, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nt, k_pad),
        in_specs=([q_spec] * len(planes_q) + [c_spec] * len(planes_c)
                  + [s_spec, s_spec]),
        out_specs=(o_spec, o_spec),
    )

    deg, bits = pl.pallas_call(
        _make_stats_kernel(has_z, n_offsets),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((nt, 1, t), jnp.int32),
                   jax.ShapeDtypeStruct((nt, 1, t), jnp.int32)),
        interpret=_interpret(),
    )(index.cand_idx, index.cand_count,
      *planes_q, *planes_c,
      (eps_space * eps_space).reshape(1, 1),
      eps_time.reshape(1, 1))
    deg = deg.reshape(nt, t)
    bits = bits.reshape(nt, t)
    frame_count = _popcount(bits) if n_offsets > 0 else jnp.zeros_like(deg)
    return deg, frame_count


# ---------------------------------------------------------------------------
# Manual-DMA variant: unbounded candidate tables
# ---------------------------------------------------------------------------
#
# The scalar-prefetch kernels above keep the whole (Ntiles, K) candidate
# table in SMEM, which caps problem size (~1 MB SMEM).  This variant streams
# candidates per query tile: the kernel DMAs its own candidate row from HBM
# into SMEM, then double-buffers candidate planes HBM -> VMEM while the VPU
# evaluates the previous tile's pair predicate.


def _make_dma_min_kernel(k_pad: int, tile: int):
    def kernel(count_ref, cand_hbm, fplanes_hbm, iplanes_hbm,
               qf_ref, eps_ref, out_ref,
               cand_smem, fbuf, ibuf, acc, sems, row_sem):
        q = pl.program_id(0)

        # candidate row: HBM -> SMEM ((1, K) slice covers the full trailing
        # dims, which Mosaic requires for leading-dim slicing)
        row = pltpu.make_async_copy(cand_hbm.at[q], cand_smem, row_sem)
        row.start()
        row.wait()

        # counts can exceed the static table width under an undersized
        # k_pad hint (detected + retried by the caller); stay in bounds
        n = jnp.minimum(count_ref[q], k_pad)
        eps2 = eps_ref[0, 0]
        eps_t = eps_ref[0, 1]

        xq = qf_ref[0, 0]
        yq = qf_ref[0, 1]
        tq = qf_ref[0, 2]

        def start_fetch(slot, k):
            c = cand_smem[0, k]
            f = pltpu.make_async_copy(fplanes_hbm.at[c], fbuf.at[slot],
                                      sems.at[slot, 0])
            i = pltpu.make_async_copy(iplanes_hbm.at[c], ibuf.at[slot],
                                      sems.at[slot, 1])
            f.start()
            i.start()

        def wait_fetch(slot, k):
            c = cand_smem[0, k]
            pltpu.make_async_copy(fplanes_hbm.at[c], fbuf.at[slot],
                                  sems.at[slot, 0]).wait()
            pltpu.make_async_copy(iplanes_hbm.at[c], ibuf.at[slot],
                                  sems.at[slot, 1]).wait()

        acc[...] = jnp.full_like(acc, INT_MAX)

        @pl.when(n > 0)
        def _():
            start_fetch(0, 0)

            def body(k, _):
                slot = jax.lax.rem(k, 2)

                @pl.when(k + 1 < n)
                def _():
                    start_fetch(jax.lax.rem(k + 1, 2), k + 1)

                wait_fetch(slot, k)
                xc = fbuf[slot, 0]
                yc = fbuf[slot, 1]
                tc = fbuf[slot, 2]
                pay = ibuf[slot, 1]
                dx = xq[:, None] - xc[None, :]
                dy = yq[:, None] - yc[None, :]
                dt = tc[None, :] - tq[:, None]
                # no validity operands: invalid points carry the far-away
                # sentinel coordinate (see neighbors._sort_and_tile), and
                # the fori_loop covers exactly the live candidates
                mask = ((dx * dx + dy * dy <= eps2)
                        & (jnp.abs(dt) <= eps_t))
                cand_min = jnp.min(jnp.where(mask, pay[None, :], INT_MAX),
                                   axis=1)
                acc[0] = jnp.minimum(acc[0], cand_min)
                return 0

            jax.lax.fori_loop(0, n, body, 0)

        out_ref[0, 0] = acc[0]

    return kernel


def _make_dma_stats_kernel(k_pad: int, tile: int):
    # degree needs only the float planes (x, y, t): no payload/validity
    # stream — the min kernel's second (iplanes) DMA would double this
    # kernel's HBM traffic for data it never reads
    def kernel(count_ref, cand_hbm, fplanes_hbm,
               qf_ref, eps_ref, deg_ref,
               cand_smem, fbuf, acc, sems, row_sem):
        q = pl.program_id(0)

        row = pltpu.make_async_copy(cand_hbm.at[q], cand_smem, row_sem)
        row.start()
        row.wait()

        n = jnp.minimum(count_ref[q], k_pad)
        eps2 = eps_ref[0, 0]
        eps_t = eps_ref[0, 1]

        xq = qf_ref[0, 0]
        yq = qf_ref[0, 1]
        tq = qf_ref[0, 2]

        def start_fetch(slot, k):
            c = cand_smem[0, k]
            pltpu.make_async_copy(fplanes_hbm.at[c], fbuf.at[slot],
                                  sems.at[slot]).start()

        def wait_fetch(slot, k):
            c = cand_smem[0, k]
            pltpu.make_async_copy(fplanes_hbm.at[c], fbuf.at[slot],
                                  sems.at[slot]).wait()

        acc[...] = jnp.zeros_like(acc)

        @pl.when(n > 0)
        def _():
            start_fetch(0, 0)

            def body(k, _):
                slot = jax.lax.rem(k, 2)

                @pl.when(k + 1 < n)
                def _():
                    start_fetch(jax.lax.rem(k + 1, 2), k + 1)

                wait_fetch(slot, k)
                xc = fbuf[slot, 0]
                yc = fbuf[slot, 1]
                tc = fbuf[slot, 2]
                dx = xq[:, None] - xc[None, :]
                dy = yq[:, None] - yc[None, :]
                dt = tc[None, :] - tq[:, None]
                # sentinel-coordinate invalid points need no validity test
                mask = ((dx * dx + dy * dy <= eps2)
                        & (jnp.abs(dt) <= eps_t))
                acc[0] = acc[0] + jnp.sum(mask, axis=1, dtype=jnp.int32)
                return 0

            jax.lax.fori_loop(0, n, body, 0)

        deg_ref[0, 0] = acc[0]

    return kernel


@jax.jit
def core_stats_pallas_dma(
    index: SpatialIndex,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
) -> jnp.ndarray:
    """Manual-DMA ST-neighbor degree sweep (2D coords, no min_frames): the
    Pallas twin of neighbors.neighbor_core_stats' degree output.  Used by
    the hybrid clustering path (ops/stdbscan.py) for the min_frames == 1
    tracker case; the frame-presence variant falls back to XLA."""
    nt, t = index.num_tiles, index.tile
    k_pad = index.cand_idx.shape[1]

    zf = jnp.zeros_like(index.times)
    fplanes = jnp.stack([index.coords[..., 0], index.coords[..., 1],
                         index.times, zf, zf, zf, zf, zf], axis=1)
    eps = jnp.stack([eps_space * eps_space, eps_time]).reshape(1, 2)

    q_spec_f = pl.BlockSpec((1, 8, t), lambda q, cnt: (q, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.HBM),
            q_spec_f,
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, t), lambda q, cnt: (q, 0, 0)),
        scratch_shapes=[
            pltpu.SMEM((1, k_pad), jnp.int32),
            pltpu.VMEM((2, 8, t), jnp.float32),
            pltpu.VMEM((1, t), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    deg = pl.pallas_call(
        _make_dma_stats_kernel(k_pad, t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, 1, t), jnp.int32),
        interpret=_interpret(),
    )(index.cand_count, index.cand_idx.reshape(nt, 1, k_pad),
      fplanes, fplanes, eps)
    return deg.reshape(nt, t)


@jax.jit
def min_sweep_pallas_dma(
    index: SpatialIndex,
    payload: jnp.ndarray,  # (Ntiles, T) int32
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
) -> jnp.ndarray:
    """Manual-DMA min sweep (2D coords, no limit variant): candidate table
    stays in HBM, tiles stream through double-buffered VMEM scratch."""
    nt, t = index.num_tiles, index.tile
    k_pad = index.cand_idx.shape[1]

    # packed candidate planes: one f32 stack (x, y, t), one i32 (valid,
    # pay) — padded to 8 rows so Mosaic can slice the leading dim (sublane
    # alignment)
    zf = jnp.zeros_like(index.times)
    fplanes = jnp.stack([index.coords[..., 0], index.coords[..., 1],
                         index.times, zf, zf, zf, zf, zf],
                        axis=1)  # (nt, 8, T)
    zi = jnp.zeros_like(payload)
    iplanes = jnp.stack([index.valid.astype(jnp.int32), payload,
                         zi, zi, zi, zi, zi, zi], axis=1)  # (nt, 8, T)
    eps = jnp.stack([eps_space * eps_space, eps_time]).reshape(1, 2)

    q_spec_f = pl.BlockSpec((1, 8, t), lambda q, cnt: (q, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # cand_count
        grid=(nt,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # cand_idx stays in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),  # fplanes stay in HBM
            pl.BlockSpec(memory_space=pltpu.HBM),  # iplanes stay in HBM
            q_spec_f,  # query f32 planes (pipelined to VMEM)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # eps scalars
        ],
        out_specs=pl.BlockSpec((1, 1, t), lambda q, cnt: (q, 0, 0)),
        scratch_shapes=[
            pltpu.SMEM((1, k_pad), jnp.int32),
            pltpu.VMEM((2, 8, t), jnp.float32),
            pltpu.VMEM((2, 8, t), jnp.int32),
            pltpu.VMEM((1, t), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    out = pl.pallas_call(
        _make_dma_min_kernel(k_pad, t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nt, 1, t), jnp.int32),
        interpret=_interpret(),
    )(index.cand_count, index.cand_idx.reshape(nt, 1, k_pad),
      fplanes, iplanes, fplanes, eps)
    return out.reshape(nt, t)


# ---------------------------------------------------------------------------
# Symmetric-pair variants: each unordered tile pair computed ONCE
# ---------------------------------------------------------------------------
#
# The directed kernels above evaluate the (T x T) pair predicate twice per
# unordered tile pair (once per direction).  These variants walk the
# a-major-sorted unordered pair list (SpatialIndex.pair_a/pair_b, a <= b)
# and fold each block into BOTH tiles' outputs: the query (a) side
# accumulates in the revisited output block (consecutive steps share a, the
# same mechanism the prefetch kernels use across their candidate axis); the
# candidate (b) side emits one partial row per pair, reduced by a row
# scatter in the XLA wrapper.  Predicate work on full-table sweeps halves;
# DMA volume is unchanged (each pair fetches two tiles instead of each
# directed candidate fetching one).


def _pair_fetchers(pa_ref, pb_ref, fplanes_hbm, fbuf, sems):
    """start/wait closures for the symmetric kernels' double-buffered
    per-pair DMA (two tile streams per pair, slots alternate per grid
    step) — ONE copy of the protocol shared by every symmetric kernel."""

    def start_fetch(slot, k):
        pltpu.make_async_copy(fplanes_hbm.at[pa_ref[k]],
                              fbuf.at[slot, 0], sems.at[slot, 0]).start()
        pltpu.make_async_copy(fplanes_hbm.at[pb_ref[k]],
                              fbuf.at[slot, 1], sems.at[slot, 1]).start()

    def wait_fetch(slot, k):
        pltpu.make_async_copy(fplanes_hbm.at[pa_ref[k]],
                              fbuf.at[slot, 0], sems.at[slot, 0]).wait()
        pltpu.make_async_copy(fplanes_hbm.at[pb_ref[k]],
                              fbuf.at[slot, 1], sems.at[slot, 1]).wait()

    return start_fetch, wait_fetch


def _sym_prefetch(p, p_pad: int, cnt, start_fetch):
    """Issue this step's / the next step's tile fetches, GUARDED to live
    pairs (p < cnt): dead-tail and gated-out steps then cost only the grid
    bookkeeping instead of two 16 KB DMA streams each — essential for the
    gated dispatch, where most of the static grid can be dead, and a free
    ~up-to-25% DMA cut on the bucketed tail of full sweeps.  The matching
    wait must be guarded by the caller with ``p < cnt`` (an unstarted
    fetch's semaphore never signals)."""

    @pl.when((p == 0) & (cnt > 0))
    def _():
        start_fetch(0, 0)

    @pl.when(p + 1 < jnp.minimum(p_pad, cnt))
    def _():
        start_fetch(jax.lax.rem(p + 1, 2), p + 1)


def _make_sym_stats_kernel(p_pad: int, has_z: bool = False):
    def kernel(pa_ref, pb_ref, cnt_ref, fplanes_hbm,
               eps_ref, deg_ref, partial_ref,
               fbuf, sems):
        p = pl.program_id(0)
        live = p < cnt_ref[0]
        a = pa_ref[p]
        b = pb_ref[p]

        start_fetch, wait_fetch = _pair_fetchers(
            pa_ref, pb_ref, fplanes_hbm, fbuf, sems)
        _sym_prefetch(p, p_pad, cnt_ref[0], start_fetch)

        # dead-tail pairs repeat the last live a (see _pairs_from_
        # candidates), so this init can never clobber an earlier block
        first = jnp.logical_or(
            p == 0, a != pa_ref[jnp.maximum(p - 1, 0)])

        @pl.when(first)
        def _():
            deg_ref[...] = jnp.zeros_like(deg_ref)

        slot = jax.lax.rem(p, 2)
        partial_ref[...] = jnp.zeros_like(partial_ref)

        @pl.when(live)
        def _():
            wait_fetch(slot, p)
            eps2 = eps_ref[0, 0]
            eps_t = eps_ref[0, 1]
            xa = fbuf[slot, 0, 0]
            ya = fbuf[slot, 0, 1]
            ta = fbuf[slot, 0, 2]
            xb = fbuf[slot, 1, 0]
            yb = fbuf[slot, 1, 1]
            tb = fbuf[slot, 1, 2]
            dx = xa[:, None] - xb[None, :]
            dy = ya[:, None] - yb[None, :]
            dt = tb[None, :] - ta[:, None]
            d2 = dx * dx + dy * dy
            if has_z:
                dz = fbuf[slot, 0, 6][:, None] - fbuf[slot, 1, 6][None, :]
                d2 = d2 + dz * dz
            # sentinel-coordinate invalid points need no validity operands
            mask = ((d2 <= eps2) & (jnp.abs(dt) <= eps_t))
            deg_ref[0, 0] = deg_ref[0, 0] + jnp.sum(mask, axis=1,
                                                    dtype=jnp.int32)

            @pl.when(a != b)
            def _():
                # diagonal blocks fold once (row sums only): the column
                # sums would double-count intra-tile pairs
                partial_ref[0, 0] = jnp.sum(mask, axis=0, dtype=jnp.int32)

    return kernel


def _make_sym_min_kernel(p_pad: int, use_limit: bool = False,
                         has_z: bool = False):
    def kernel(pa_ref, pb_ref, cnt_ref, fplanes_hbm,
               eps_ref, acc_ref, partial_ref,
               fbuf, sems):
        p = pl.program_id(0)
        live = p < cnt_ref[0]
        a = pa_ref[p]

        start_fetch, wait_fetch = _pair_fetchers(
            pa_ref, pb_ref, fplanes_hbm, fbuf, sems)
        _sym_prefetch(p, p_pad, cnt_ref[0], start_fetch)

        first = jnp.logical_or(
            p == 0, a != pa_ref[jnp.maximum(p - 1, 0)])

        @pl.when(first)
        def _():
            acc_ref[...] = jnp.full_like(acc_ref, INT_MAX)

        slot = jax.lax.rem(p, 2)
        partial_ref[...] = jnp.full_like(partial_ref, INT_MAX)

        @pl.when(live)
        def _():
            wait_fetch(slot, p)
            eps2 = eps_ref[0, 0]
            eps_t = eps_ref[0, 1]
            xa = fbuf[slot, 0, 0]
            ya = fbuf[slot, 0, 1]
            ta = fbuf[slot, 0, 2]
            pay_a = jax.lax.bitcast_convert_type(fbuf[slot, 0, 3],
                                                 jnp.int32)
            xb = fbuf[slot, 1, 0]
            yb = fbuf[slot, 1, 1]
            tb = fbuf[slot, 1, 2]
            pay_b = jax.lax.bitcast_convert_type(fbuf[slot, 1, 3],
                                                 jnp.int32)
            dx = xa[:, None] - xb[None, :]
            dy = ya[:, None] - yb[None, :]
            dt = tb[None, :] - ta[:, None]
            d2 = dx * dx + dy * dy
            if has_z:
                dz = fbuf[slot, 0, 6][:, None] - fbuf[slot, 1, 6][None, :]
                d2 = d2 + dz * dz
            mask = ((d2 <= eps2) & (jnp.abs(dt) <= eps_t))
            if use_limit:
                # a neighbor participates only when its payload is strictly
                # below the QUERY point's limit, or it carries the bypass
                # flag (denoiser scan-order border attachment) — evaluated
                # in both directions from the same block
                lim_a = jax.lax.bitcast_convert_type(fbuf[slot, 0, 4],
                                                     jnp.int32)
                byp_a = jax.lax.bitcast_convert_type(fbuf[slot, 0, 5],
                                                     jnp.int32)
                lim_b = jax.lax.bitcast_convert_type(fbuf[slot, 1, 4],
                                                     jnp.int32)
                byp_b = jax.lax.bitcast_convert_type(fbuf[slot, 1, 5],
                                                     jnp.int32)
                mask_ab = mask & ((pay_b[None, :] < lim_a[:, None])
                                  | (byp_b[None, :] > 0))
                mask_ba = mask & ((pay_a[:, None] < lim_b[None, :])
                                  | (byp_a[:, None] > 0))
            else:
                mask_ab = mask_ba = mask
            row_min = jnp.min(jnp.where(mask_ab, pay_b[None, :], INT_MAX),
                              axis=1)
            acc_ref[0, 0] = jnp.minimum(acc_ref[0, 0], row_min)
            # min is idempotent, so the diagonal's column emission is
            # harmless (same values the row side already folded)
            partial_ref[0, 0] = jnp.min(
                jnp.where(mask_ba, pay_a[:, None], INT_MAX), axis=0)

    return kernel


def _sym_fplanes(index: SpatialIndex,
                 payload: Optional[jnp.ndarray],
                 query_limit: Optional[jnp.ndarray] = None,
                 bypass_limit: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """(nt, 8, T) f32 planes: x, y, t[, payload, limit, bypass bits]
    (sublane-padded; integer operands ride as bitcasts so each tile is ONE
    DMA stream)."""
    zf = jnp.zeros_like(index.times)

    def bits(a):
        return (jax.lax.bitcast_convert_type(a.astype(jnp.int32),
                                             jnp.float32)
                if a is not None else zf)

    z = (index.coords[..., 2] if index.coords.shape[-1] >= 3 else zf)
    return jnp.stack([index.coords[..., 0], index.coords[..., 1],
                      index.times, bits(payload), bits(query_limit),
                      bits(bypass_limit), z, zf], axis=1)


def _pair_chunks(p_pad: int, cap: int):
    """Static (start, length) slices of the pair list, each fitting the
    SMEM prefetch budget (see neighbors.sym_pair_chunk_cap)."""
    out = []
    s = 0
    while s < p_pad:
        out.append((s, min(cap, p_pad - s)))
        s += cap
    return out or [(0, p_pad)]


# the symmetric kernels materialize a handful of (T, T) int32/f32
# intermediates per pair block (~1 MB each at T=512, ~4 MB at T=1024);
# the default 16 MB scoped-VMEM budget fits T=512 but not T=1024, so the
# limit is raised explicitly (v5e VMEM is 128 MB)
_SYM_COMPILER_PARAMS = pltpu.CompilerParams(
    vmem_limit_bytes=100 * 1024 * 1024)


def _sym_grid_spec(t: int, ln: int, n_a_outs: int):
    """Grid spec shared by the symmetric kernels: one grid step per pair,
    ``n_a_outs`` revisited a-side output blocks followed by the same number
    of per-pair partial (b-side) blocks."""
    a = [pl.BlockSpec((1, 1, t), lambda p, pa, pb, cnt: (pa[p], 0, 0))
         for _ in range(n_a_outs)]
    b = [pl.BlockSpec((1, 1, t), lambda p, pa, pb, cnt: (p, 0, 0))
         for _ in range(n_a_outs)]
    return pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # pair_a, pair_b, pair_count
        grid=(ln,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=tuple(a + b),
        scratch_shapes=[
            pltpu.VMEM((2, 2, 8, t), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )


def _chunk_args(pa_full, pb_full, count, base: int, ln: int):
    """Slice a pair list for one chunk; the live count clamps to the
    chunk (dead-tail entries repeat the last live ``a`` with ``b = 0`` and
    identity partial rows, so they contribute nothing downstream)."""
    pa = jax.lax.slice_in_dim(pa_full, base, base + ln)
    pb = jax.lax.slice_in_dim(pb_full, base, base + ln)
    cnt = jnp.clip(count - base, 0, ln).astype(jnp.int32)
    return pa, pb, cnt


def _compact_active_pairs(index: SpatialIndex, tile_changed):
    """Stable-compact the pairs touching a changed tile to a prefix of the
    static-width list (order preserved, so it stays a-major sorted; the
    tail repeats the LAST active ``a`` so the kernels' a-side block never
    revisits an earlier tile).  O(P_pad) elementwise work — replacing the
    directed gated sweep's dense (nt, k_pad) candidate compaction, whose
    hotspot-widened table costs ~2.8 s per round at denoise scale."""
    pa, pb = index.pair_a, index.pair_b
    p_pad = pa.shape[0]
    live = jnp.arange(p_pad, dtype=jnp.int32) < index.pair_count
    act = live & (tile_changed[pa] | tile_changed[pb])
    n_act = jnp.sum(act, dtype=jnp.int32)
    dest = jnp.where(act, jnp.cumsum(act, dtype=jnp.int32) - 1,
                     jnp.int32(p_pad))
    fill = jnp.max(jnp.where(act, pa, 0))
    pa2 = jnp.full((p_pad + 1,), fill, jnp.int32).at[dest].set(pa)[:p_pad]
    pb2 = jnp.zeros((p_pad + 1,), jnp.int32).at[dest].set(pb)[:p_pad]
    return pa2, pb2, n_act


def core_stats_pallas_sym(
    index: SpatialIndex,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
) -> jnp.ndarray:
    """Symmetric-pair degree sweep (2D coords, no min_frames): each
    unordered tile pair's predicate evaluated once.  Requires an index
    built with ``pairs=True``; lists wider than the SMEM prefetch budget
    dispatch in chunks."""
    from .neighbors import sym_pair_chunk_cap

    return _core_stats_sym(index, eps_space, eps_time,
                           cap=sym_pair_chunk_cap())


@functools.partial(jax.jit, static_argnames=("cap",))
def _core_stats_sym(
    index: SpatialIndex,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    cap: int,
) -> jnp.ndarray:
    nt, t = index.num_tiles, index.tile
    p_pad = index.pair_a.shape[0]
    fplanes = _sym_fplanes(index, None)
    eps = jnp.stack([eps_space * eps_space, eps_time]).reshape(1, 2)
    chunks = _pair_chunks(p_pad, cap)

    deg_a_tot = jnp.zeros((nt, t), jnp.int32)
    deg_b = jnp.zeros((nt, t), jnp.int32)
    for base, ln in chunks:
        pa, pb, cnt = _chunk_args(index.pair_a, index.pair_b,
                                  index.pair_count, base, ln)
        deg_a, partial_b = pl.pallas_call(
            _make_sym_stats_kernel(ln,
                                   has_z=index.coords.shape[-1] >= 3),
            grid_spec=_sym_grid_spec(t, ln, 1),
            out_shape=(jax.ShapeDtypeStruct((nt, 1, t), jnp.int32),
                       jax.ShapeDtypeStruct((ln, 1, t), jnp.int32)),
            interpret=_interpret(),
            compiler_params=_SYM_COMPILER_PARAMS,
        )(pa, pb, cnt.reshape(1), fplanes, eps)
        da = deg_a.reshape(nt, t)
        if len(chunks) == 1:
            # single chunk: every tile with pairs is visited as ``a`` (the
            # self pair), so only all-invalid tiles hold garbage — masked
            # by index.valid below
            deg_a_tot = da
        else:
            # a tile's pairs may span chunks; unvisited-in-this-chunk
            # blocks hold garbage, so mask by this chunk's visited set
            visited = jnp.zeros((nt,), bool).at[pa].set(True)
            deg_a_tot = deg_a_tot + jnp.where(visited[:, None], da, 0)
        deg_b = deg_b.at[pb].add(partial_b.reshape(ln, t), mode="drop")
    # blocks of all-invalid tiles are never visited (no pairs) and hold
    # whatever was in the output buffer; their degrees are unused (core
    # requires index.valid) but zero them for deterministic output
    return jnp.where(index.valid, deg_a_tot + deg_b, 0)


def min_sweep_pallas_sym(
    index: SpatialIndex,
    payload: jnp.ndarray,  # (Ntiles, T) int32
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    query_limit: Optional[jnp.ndarray] = None,
    bypass_limit: Optional[jnp.ndarray] = None,
    use_limit: bool = False,
) -> jnp.ndarray:
    """Symmetric-pair min sweep (2D coords): the Pallas twin of
    neighbors.neighbor_min_sweep over the unordered pair list, including
    the thresholded (``use_limit``) border-attachment variant — the limit
    test is evaluated in both directions from each pair block.  Lists
    wider than the SMEM prefetch budget dispatch in chunks."""
    from .neighbors import sym_pair_chunk_cap

    return _min_sweep_sym(index, payload, eps_space, eps_time,
                          query_limit=query_limit,
                          bypass_limit=bypass_limit, use_limit=use_limit,
                          cap=sym_pair_chunk_cap())


def min_sweep_pallas_sym_gated(
    index: SpatialIndex,
    payload: jnp.ndarray,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    acc: jnp.ndarray,  # (Ntiles, T) int32 monotone accumulator
    tile_changed: jnp.ndarray,  # (Ntiles,) bool
) -> jnp.ndarray:
    """Gated symmetric min sweep: dispatches ONLY the pairs touching a
    changed tile (compacted prefix of the static list; guarded DMA skips
    the dead tail), folding fresh minima into ``acc``.  Same monotone
    contract as neighbors.neighbor_min_sweep_gated — equals the full
    sweep's result at every round — but work scales with ACTIVE PAIRS
    instead of paying the dense candidate-table compaction floor."""
    from .neighbors import sym_pair_chunk_cap

    pa2, pb2, n_act = _compact_active_pairs(index, tile_changed)
    fresh = _min_sweep_sym(index, payload, eps_space, eps_time,
                           cap=sym_pair_chunk_cap(),
                           pairs_override=(pa2, pb2, n_act))
    return jnp.minimum(acc, fresh)


def min_sweep_pallas_sym_scoped(
    index: SpatialIndex,
    payload: jnp.ndarray,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    tile_mask: jnp.ndarray,  # (Ntiles,) bool — tiles whose output is read
    query_limit: Optional[jnp.ndarray] = None,
    bypass_limit: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Thresholded symmetric min sweep restricted to pairs touching a tile
    in ``tile_mask``.  A pair contributes output only to its two tiles, so
    dropping pairs between two unmasked tiles is EXACT at every point in a
    masked tile; output elsewhere is garbage-masked to INT_MAX only for
    all-invalid tiles and must not be read.  Used by the border-gated
    ``if_earlier`` sweep (stdbscan.cluster_index), which reads border keys
    only at valid non-core points — at denoise scale those concentrate in
    ~11% of tiles / 13% of pairs (ROUND4.md), shrinking the full-table
    border sweep ~8x."""
    from .neighbors import sym_pair_chunk_cap

    pairs_scoped = _compact_active_pairs(index, tile_mask)
    return _min_sweep_sym(index, payload, eps_space, eps_time,
                          query_limit=query_limit,
                          bypass_limit=bypass_limit, use_limit=True,
                          cap=sym_pair_chunk_cap(),
                          pairs_override=pairs_scoped)


@functools.partial(jax.jit, static_argnames=("use_limit", "cap"))
def _min_sweep_sym(
    index: SpatialIndex,
    payload: jnp.ndarray,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    query_limit: Optional[jnp.ndarray] = None,
    bypass_limit: Optional[jnp.ndarray] = None,
    use_limit: bool = False,
    cap: int = 1 << 30,
    pairs_override=None,  # (pa, pb, count): a compacted (gated) pair list
) -> jnp.ndarray:
    nt, t = index.num_tiles, index.tile
    if pairs_override is not None:
        pa_full, pb_full, count = pairs_override
    else:
        pa_full, pb_full, count = (index.pair_a, index.pair_b,
                                   index.pair_count)
    p_pad = pa_full.shape[0]
    if use_limit and bypass_limit is None:
        bypass_limit = jnp.zeros((nt, t), jnp.int32)
    fplanes = _sym_fplanes(index, payload,
                           query_limit if use_limit else None,
                           bypass_limit if use_limit else None)
    eps = jnp.stack([eps_space * eps_space, eps_time]).reshape(1, 2)
    chunks = _pair_chunks(p_pad, cap)
    # a gated (override) list can leave ANY tile unvisited on the a side,
    # so its blocks must always combine under the per-chunk visited mask
    masked = pairs_override is not None or len(chunks) > 1

    acc_tot = jnp.full((nt, t), INT_MAX, jnp.int32)
    min_b = jnp.full((nt, t), INT_MAX, jnp.int32)
    for base, ln in chunks:
        pa, pb, cnt = _chunk_args(pa_full, pb_full, count, base, ln)
        acc_a, partial_b = pl.pallas_call(
            _make_sym_min_kernel(ln, use_limit=use_limit,
                                 has_z=index.coords.shape[-1] >= 3),
            grid_spec=_sym_grid_spec(t, ln, 1),
            out_shape=(jax.ShapeDtypeStruct((nt, 1, t), jnp.int32),
                       jax.ShapeDtypeStruct((ln, 1, t), jnp.int32)),
            interpret=_interpret(),
            compiler_params=_SYM_COMPILER_PARAMS,
        )(pa, pb, cnt.reshape(1), fplanes, eps)
        aa = acc_a.reshape(nt, t)
        if not masked:
            acc_tot = aa
        else:
            visited = jnp.zeros((nt,), bool).at[pa].set(True)
            acc_tot = jnp.minimum(acc_tot,
                                  jnp.where(visited[:, None], aa, INT_MAX))
        min_b = min_b.at[pb].min(partial_b.reshape(ln, t), mode="drop")
    out = jnp.minimum(acc_tot, min_b)
    # unvisited blocks (all-invalid tiles) hold garbage; mask to INT_MAX
    return jnp.where(index.valid, out, INT_MAX)


def _or_fold_rows(x):
    """OR-reduce a (R, C) int32 block along axis=1 by halving (C a power
    of two) -> (R,).  Halving slices stay at power-of-2 lane boundaries,
    the layout Mosaic's own reductions use."""
    c = x.shape[1]
    assert (c & (c - 1)) == 0, f"or-fold needs power-of-two width, got {c}"
    while c > 1:
        c //= 2
        x = x[:, :c] | x[:, c:2 * c]
    return x[:, 0]


def _or_fold_cols(x):
    """OR-reduce a (R, C) int32 block along axis=0 by halving -> (C,)."""
    r = x.shape[0]
    assert (r & (r - 1)) == 0, f"or-fold needs power-of-two height, got {r}"
    while r > 1:
        r //= 2
        x = x[:r, :] | x[r:2 * r, :]
    return x[0, :]


def _make_sym_stats_mf_kernel(p_pad: int, n_offsets: int,
                              has_z: bool = False):
    """Symmetric degree + frame-presence kernel (min_frames core test).

    The b side cannot OR a bitmask through an XLA scatter (no bitwise-or
    scatter), so it emits the per-pair presence BITMASK as one (1, 1, T)
    partial row; the wrapper extracts each bit ((mask >> k) & 1 is 0/1,
    where a row scatter-max IS the or-reduction) — one int32 row per pair
    instead of per-offset planes, keeping the partial buffer the same size
    as the other symmetric kernels' (~1 GB, not ~8.6 GB, at the
    denoise-flagship scale).  n_offsets <= 15 (bitmask width).

    Presence bits are computed as ONE per-element bitmask ``1 << (dti + k)``
    plus two halving OR-folds (~8 VPU ops/lane-pair); the b side's negated
    offsets are the a-side bits REVERSED within the (2k+1)-bit field,
    recovered on the folded (T,) row for free.  This replaced a per-offset
    loop (2k+1 masked any-reductions per side, ~30 ops/lane-pair at k=2)
    after chip A/Bs at two denoise scales showed it bit-equal and decisively
    faster (f100: stats 3639->2292 ms, whole cluster program 12798->11450
    ms; f25: 698->443 / 2518->2264 ms — .chip_logs/ab_mf_orfold_r5_*.log);
    the loop was removed per flip-or-remove (reproduce at commit 9bf885b,
    tools/archive note)."""
    ki = n_offsets
    assert 2 * ki + 1 <= 31

    def kernel(pa_ref, pb_ref, cnt_ref, fplanes_hbm,
               eps_ref, deg_ref, bits_ref, pdeg_ref, pbits_ref,
               fbuf, sems):
        p = pl.program_id(0)
        live = p < cnt_ref[0]
        a = pa_ref[p]
        b = pb_ref[p]

        start_fetch, wait_fetch = _pair_fetchers(
            pa_ref, pb_ref, fplanes_hbm, fbuf, sems)
        _sym_prefetch(p, p_pad, cnt_ref[0], start_fetch)

        first = jnp.logical_or(p == 0, a != pa_ref[jnp.maximum(p - 1, 0)])

        @pl.when(first)
        def _():
            deg_ref[...] = jnp.zeros_like(deg_ref)
            bits_ref[...] = jnp.zeros_like(bits_ref)

        slot = jax.lax.rem(p, 2)
        pdeg_ref[...] = jnp.zeros_like(pdeg_ref)
        pbits_ref[...] = jnp.zeros_like(pbits_ref)

        @pl.when(live)
        def _():
            wait_fetch(slot, p)
            eps2 = eps_ref[0, 0]
            eps_t = eps_ref[0, 1]
            xa = fbuf[slot, 0, 0]
            ya = fbuf[slot, 0, 1]
            ta = fbuf[slot, 0, 2]
            xb = fbuf[slot, 1, 0]
            yb = fbuf[slot, 1, 1]
            tb = fbuf[slot, 1, 2]
            dx = xa[:, None] - xb[None, :]
            dy = ya[:, None] - yb[None, :]
            dt = tb[None, :] - ta[:, None]
            d2 = dx * dx + dy * dy
            if has_z:
                dz = fbuf[slot, 0, 6][:, None] - fbuf[slot, 1, 6][None, :]
                d2 = d2 + dz * dz
            mask = ((d2 <= eps2) & (jnp.abs(dt) <= eps_t))
            deg_ref[0, 0] = deg_ref[0, 0] + jnp.sum(mask, axis=1,
                                                    dtype=jnp.int32)
            dti = jnp.round(dt).astype(jnp.int32)
            # per-element bitmask once; a lane whose ROUNDED offset
            # falls outside [-ki, ki] (possible with non-integer times
            # when frac(eps_time) >= 0.5) gets NO bit, matching the
            # directed / XLA stats paths — clamping it to a boundary bit
            # would diverge per dispatch path
            inr = mask & (jnp.abs(dti) <= ki)
            sh = jnp.clip(dti + ki, 0, 2 * ki)
            bm = jnp.where(inr,
                           jnp.left_shift(jnp.int32(1), sh),
                           jnp.int32(0))
            bits_ref[0, 0] = bits_ref[0, 0] | _or_fold_rows(bm)
            colb = _or_fold_cols(bm)
            # b-side presence: b queries a, so the offset negates —
            # i.e. the (2k+1)-bit field reverses
            bits_b = jnp.zeros_like(colb)
            for k in range(2 * ki + 1):
                bits_b = bits_b | (((colb >> k) & 1) << (2 * ki - k))

            @pl.when(a != b)
            def _():
                pdeg_ref[0, 0] = jnp.sum(mask, axis=0, dtype=jnp.int32)
                pbits_ref[0, 0] = bits_b

    return kernel


def core_stats_pallas_sym_mf(
    index: SpatialIndex,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    n_offsets: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric-pair degree + frame-count sweep (min_frames variant).
    Returns (degree, frame_count) like neighbors.neighbor_core_stats.
    Lists wider than the SMEM prefetch budget dispatch in chunks."""
    from .neighbors import sym_pair_chunk_cap

    return _core_stats_sym_mf(index, eps_space, eps_time, n_offsets,
                              cap=sym_pair_chunk_cap())


@functools.partial(jax.jit, static_argnames=("n_offsets", "cap"))
def _core_stats_sym_mf(
    index: SpatialIndex,
    eps_space: jnp.ndarray,
    eps_time: jnp.ndarray,
    n_offsets: int,
    cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from .neighbors import _popcount

    nt, t = index.num_tiles, index.tile
    p_pad = index.pair_a.shape[0]
    ki = n_offsets
    fplanes = _sym_fplanes(index, None)
    eps = jnp.stack([eps_space * eps_space, eps_time]).reshape(1, 2)
    chunks = _pair_chunks(p_pad, cap)

    deg_a_tot = jnp.zeros((nt, t), jnp.int32)
    bits_a_tot = jnp.zeros((nt, t), jnp.int32)
    deg_b = jnp.zeros((nt, t), jnp.int32)
    # per-offset b-side presence accumulators: extracted bits are 0/1, so
    # scatter-max is the or-reduction (an int32 scatter-max of the whole
    # bitmask would NOT be an or)
    pk_acc = [jnp.zeros((nt, t), jnp.int32) for _ in range(2 * ki + 1)]
    for base, ln in chunks:
        pa, pb, cnt = _chunk_args(index.pair_a, index.pair_b,
                                  index.pair_count, base, ln)
        deg_a, bits_a, pdeg, pbits = pl.pallas_call(
            _make_sym_stats_mf_kernel(ln, ki,
                                      has_z=index.coords.shape[-1] >= 3),
            grid_spec=_sym_grid_spec(t, ln, 2),
            out_shape=(jax.ShapeDtypeStruct((nt, 1, t), jnp.int32),
                       jax.ShapeDtypeStruct((nt, 1, t), jnp.int32),
                       jax.ShapeDtypeStruct((ln, 1, t), jnp.int32),
                       jax.ShapeDtypeStruct((ln, 1, t), jnp.int32)),
            interpret=_interpret(),
            compiler_params=_SYM_COMPILER_PARAMS,
        )(pa, pb, cnt.reshape(1), fplanes, eps)
        da = deg_a.reshape(nt, t)
        ba = bits_a.reshape(nt, t)
        if len(chunks) == 1:
            deg_a_tot, bits_a_tot = da, ba
        else:
            visited = jnp.zeros((nt,), bool).at[pa].set(True)
            deg_a_tot = deg_a_tot + jnp.where(visited[:, None], da, 0)
            bits_a_tot = bits_a_tot | jnp.where(visited[:, None], ba, 0)
        deg_b = deg_b.at[pb].add(pdeg.reshape(ln, t), mode="drop")
        pb2 = pbits.reshape(ln, t)
        for k in range(2 * ki + 1):
            pk_acc[k] = pk_acc[k].at[pb].max((pb2 >> k) & 1, mode="drop")
    deg = jnp.where(index.valid, deg_a_tot + deg_b, 0)
    bits = bits_a_tot
    for k in range(2 * ki + 1):
        bits = bits | (pk_acc[k] << k)
    frame_count = jnp.where(index.valid, _popcount(bits), 0)
    return deg, frame_count
