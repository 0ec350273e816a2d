"""Symmetric-pair Pallas sweeps vs the directed XLA engine: the unordered
pair list (ops/neighbors.py build_spatial_index(pairs=True)) plus the
symmetric kernels (ops/pallas_neighbors.py *_sym) must reproduce the
directed sweeps bit-for-bit — degree counts and min-label payloads — on
scenes with padding, invalid points, and multi-tile candidate fans."""

import numpy as np
import jax.numpy as jnp
import pytest

from radar_point_cloud_tracking_tpu.ops.neighbors import (
    INT_MAX,
    build_spatial_index,
    neighbor_core_stats,
    neighbor_min_sweep,
)
from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
    core_stats_pallas_sym,
    min_sweep_pallas_sym,
)


def _scene(seed, n=900, with_invalid=True):
    rng = np.random.default_rng(seed)
    blobs = [rng.normal(rng.uniform(0, 150, 2), 3.0, (n // 6, 2))
             for _ in range(4)]
    coords = np.concatenate(
        blobs + [rng.uniform(-20, 170, (n - 4 * (n // 6), 2))])
    coords = coords.astype(np.float32)
    times = rng.integers(0, 8, n).astype(np.float32)
    valid = np.ones((n,), bool)
    if with_invalid:
        valid[rng.choice(n, n // 10, replace=False)] = False
    return coords, times, valid


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("tile", [64, 128])
def test_sym_degree_matches_directed(seed, tile):
    coords, times, valid = _scene(seed)
    es, et = jnp.float32(7.0), jnp.float32(2.0)
    idx = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                              jnp.asarray(valid), 7.0, 2.0, tile=tile,
                              pairs=True)
    assert idx.pair_a is not None
    want, _ = neighbor_core_stats(idx, es, et, n_offsets=0)
    got = core_stats_pallas_sym(idx, es, et)
    want = jnp.where(idx.valid, want, 0)
    assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("seed", [3, 4])
def test_sym_min_sweep_matches_directed(seed):
    coords, times, valid = _scene(seed)
    n = coords.shape[0]
    es, et = jnp.float32(7.0), jnp.float32(2.0)
    idx = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                              jnp.asarray(valid), 7.0, 2.0, tile=64,
                              pairs=True)
    rng = np.random.default_rng(seed + 100)
    pay_np = rng.integers(0, n, idx.valid.shape).astype(np.int32)
    pay_np[~np.asarray(idx.valid)] = INT_MAX
    payload = jnp.asarray(pay_np)
    want = neighbor_min_sweep(idx, payload, es, et)
    got = min_sweep_pallas_sym(idx, payload, es, et)
    v = np.asarray(idx.valid)
    assert np.array_equal(np.asarray(got)[v], np.asarray(want)[v])
    # invalid slots are INT_MAX by contract in the symmetric engine
    assert (np.asarray(got)[~v] == INT_MAX).all()


def test_pair_list_is_unordered_and_complete():
    coords, times, valid = _scene(7, n=600)
    idx = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                              jnp.asarray(valid), 7.0, 2.0, tile=64,
                              pairs=True)
    nt = idx.num_tiles
    cnt = int(idx.pair_count)
    pa = np.asarray(idx.pair_a)[:cnt]
    pb = np.asarray(idx.pair_b)[:cnt]
    assert (pa <= pb).all()
    assert (np.diff(pa) >= 0).all()  # a-major sorted
    # reconstruct the directed candidate relation from the pair list
    directed = set()
    for a, b in zip(pa, pb):
        directed.add((int(a), int(b)))
        directed.add((int(b), int(a)))
    cc = np.asarray(idx.cand_count)
    ci = np.asarray(idx.cand_idx)
    want = {(i, int(ci[i, k])) for i in range(nt) for k in range(cc[i])}
    assert directed == want
    # dead tail repeats the last live a (never revisits an earlier block)
    tail = np.asarray(idx.pair_a)[cnt:]
    if len(tail):
        assert (tail == pa[-1]).all()


def test_pair_overflow_detectable():
    """With an undersized static p_pad the true count exceeds the list
    length, which callers use to grow-and-retry."""
    coords, times, valid = _scene(9, n=600)
    idx = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                              jnp.asarray(valid), 7.0, 2.0, tile=64,
                              pairs=True, p_pad=2)
    assert int(idx.pair_count) > idx.pair_a.shape[0]


@pytest.mark.parametrize("border_mode", ["always", "if_earlier"])
def test_full_cluster_program_sym_engine_matches_plain(border_mode):
    """st_dbscan_device(use_pallas=True) routes the stats sweep and the
    hoisted full min sweep through the symmetric kernels (interpret mode
    here); converged labels must bit-match the plain XLA engine."""
    from radar_point_cloud_tracking_tpu.ops.stdbscan import st_dbscan_device

    coords, times, valid = _scene(11, n=1200)
    n = coords.shape[0]
    args = (jnp.asarray(coords), jnp.asarray(times), jnp.asarray(valid),
            7.0, 2.0, 8)
    base, kb = st_dbscan_device(*args, border_mode=border_mode, tile=64,
                                use_pallas=False)
    sym, ks = st_dbscan_device(*args, border_mode=border_mode, tile=64,
                               use_pallas=True)
    assert int(kb) == int(ks)
    assert np.array_equal(np.asarray(base), np.asarray(sym))


def test_full_cluster_program_sym_min_frames():
    from radar_point_cloud_tracking_tpu.ops.stdbscan import st_dbscan_device

    coords, times, valid = _scene(13, n=1000)
    args = (jnp.asarray(coords), jnp.asarray(times), jnp.asarray(valid),
            7.0, 2.0, 8)
    base, kb = st_dbscan_device(*args, min_frames=3,
                                border_mode="if_earlier", tile=64,
                                use_pallas=False)
    sym, ks = st_dbscan_device(*args, min_frames=3,
                               border_mode="if_earlier", tile=64,
                               use_pallas=True)
    assert int(kb) == int(ks)
    assert np.array_equal(np.asarray(base), np.asarray(sym))


@pytest.mark.parametrize("seed", [5, 6])
def test_sym_limit_sweep_matches_directed(seed):
    """The thresholded (border-attachment) variant: neighbor participates
    iff payload < query's limit OR neighbor bypasses — both directions
    evaluated from each symmetric pair block."""
    coords, times, valid = _scene(seed, n=800)
    es, et = jnp.float32(7.0), jnp.float32(2.0)
    idx = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                              jnp.asarray(valid), 7.0, 2.0, tile=64,
                              pairs=True)
    from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
        min_sweep_pallas_sym as sym)

    rng = np.random.default_rng(seed + 50)
    shape = idx.valid.shape
    pay_np = rng.integers(0, 500, shape).astype(np.int32)
    pay_np[~np.asarray(idx.valid)] = INT_MAX
    payload = jnp.asarray(pay_np)
    qlim = jnp.asarray(rng.integers(0, 500, shape).astype(np.int32))
    byp = jnp.asarray(rng.random(shape) < 0.15)
    want = neighbor_min_sweep(idx, payload, es, et, query_limit=qlim,
                              bypass_limit=byp, use_limit=True)
    got = sym(idx, payload, es, et, query_limit=qlim, bypass_limit=byp,
              use_limit=True)
    v = np.asarray(idx.valid)
    assert np.array_equal(np.asarray(got)[v], np.asarray(want)[v])


def _scene3d(seed, n=800):
    rng = np.random.default_rng(seed)
    blobs = [np.column_stack([
        rng.normal(rng.uniform(0, 120, 2), 2.5, (n // 5, 2)),
        rng.uniform(0, 40, (n // 5, 1))]) for _ in range(3)]
    rest = np.column_stack([rng.uniform(-20, 140, (n - 3 * (n // 5), 2)),
                            rng.uniform(0, 40, (n - 3 * (n // 5), 1))])
    coords = np.concatenate(blobs + [rest]).astype(np.float32)
    times = rng.integers(0, 6, n).astype(np.float32)
    valid = np.ones((n,), bool)
    valid[rng.choice(n, n // 12, replace=False)] = False
    return coords, times, valid


def test_sym_degree_and_min_match_directed_3d():
    coords, times, valid = _scene3d(21)
    es, et = jnp.float32(6.0), jnp.float32(2.0)
    idx = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                              jnp.asarray(valid), 6.0, 2.0, tile=64,
                              pairs=True)
    want, _ = neighbor_core_stats(idx, es, et, n_offsets=0)
    got = core_stats_pallas_sym(idx, es, et)
    v = np.asarray(idx.valid)
    assert np.array_equal(np.asarray(got)[v], np.asarray(want)[v])
    rng = np.random.default_rng(99)
    pay_np = rng.integers(0, coords.shape[0], idx.valid.shape).astype(
        np.int32)
    pay_np[~v] = INT_MAX
    payload = jnp.asarray(pay_np)
    want_m = neighbor_min_sweep(idx, payload, es, et)
    got_m = min_sweep_pallas_sym(idx, payload, es, et)
    assert np.array_equal(np.asarray(got_m)[v], np.asarray(want_m)[v])


def test_full_cluster_program_sym_engine_3d():
    from radar_point_cloud_tracking_tpu.ops.stdbscan import st_dbscan_device

    coords, times, valid = _scene3d(23, n=1000)
    args = (jnp.asarray(coords), jnp.asarray(times), jnp.asarray(valid),
            6.0, 2.0, 6)
    base, kb = st_dbscan_device(*args, border_mode="always", tile=64,
                                use_pallas=False)
    sym, ks = st_dbscan_device(*args, border_mode="always", tile=64,
                               use_pallas=True)
    assert int(kb) == int(ks)
    assert np.array_equal(np.asarray(base), np.asarray(sym))


@pytest.mark.parametrize("seed", [31, 32])
def test_sym_stats_min_frames_matches_directed(seed):
    """The min_frames symmetric stats kernel: degree AND frame-presence
    count must match the directed engine (per-offset presence planes
    or-reduce via 0/1 scatter-max)."""
    from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
        core_stats_pallas_sym_mf)

    coords, times, valid = _scene(seed)
    es, et = jnp.float32(7.0), jnp.float32(2.0)
    idx = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                              jnp.asarray(valid), 7.0, 2.0, tile=64,
                              pairs=True)
    want_d, want_f = neighbor_core_stats(idx, es, et, n_offsets=2)
    got_d, got_f = core_stats_pallas_sym_mf(idx, es, et, 2)
    v = np.asarray(idx.valid)
    assert np.array_equal(np.asarray(got_d)[v], np.asarray(want_d)[v])
    assert np.array_equal(np.asarray(got_f)[v], np.asarray(want_f)[v])


def test_sym_stats_mf_fractional_times_out_of_range_offset():
    """Non-integer times with frac(eps_time) >= 0.5: an in-mask neighbor
    whose ROUNDED offset falls outside [-ki, ki] (dt=1.5, et=1.5, ki=1
    rounds to 2) must contribute NO presence bit — matching the XLA stats
    path's per-offset equality test — so the same input cannot label
    differently per dispatch path."""
    from radar_point_cloud_tracking_tpu.ops import pallas_neighbors as pn

    rng = np.random.default_rng(7)
    n = 200
    coords = rng.normal(0.0, 4.0, (n, 2)).astype(np.float32)
    # times on a 1.5 grid: dt in {0, 1.5, 3.0, ...}; et=1.5 admits dt=1.5
    # into the mask but round(1.5) = 2 > ki = 1
    times = (rng.integers(0, 4, n) * 1.5).astype(np.float32)
    valid = np.ones((n,), bool)
    es, et = jnp.float32(6.0), jnp.float32(1.5)
    idx = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                              jnp.asarray(valid), 6.0, 1.5, tile=64,
                              pairs=True)
    want_d, want_f = neighbor_core_stats(idx, es, et, n_offsets=1)
    got_d, got_f = pn.core_stats_pallas_sym_mf(idx, es, et, 1)
    v = np.asarray(idx.valid)
    assert np.array_equal(np.asarray(got_d)[v], np.asarray(want_d)[v])
    assert np.array_equal(np.asarray(got_f)[v], np.asarray(want_f)[v])


def test_build_spatial_index_rejects_non_pow2_tile():
    """tile_size reaches the Pallas or-folds, which reduce (T, T) blocks
    by power-of-two halving — a non-power-of-two tile would silently drop
    lanes (wrong frame counts, wrong labels), so the build must fail fast
    with the remedy instead."""
    coords, times, valid = _scene(5, n=100)
    args = (jnp.asarray(coords), jnp.asarray(times), jnp.asarray(valid),
            7.0, 2.0)
    with pytest.raises(ValueError, match="power of two"):
        build_spatial_index(*args, tile=768)
    with pytest.raises(ValueError, match="power of two"):
        build_spatial_index(*args, tile=4)


def test_smem_budget_rounds_width_to_chunks(monkeypatch):
    """Past SYM_PAIR_SMEM_BUDGET the build keeps the pair list but rounds
    its width up to a whole number of SMEM-sized chunks (the symmetric
    kernels prefetch both lists into 1 MiB SMEM; measured on chip: the
    9.5M-point denoise scene's 524288-wide list fails Mosaic allocation,
    so wide lists dispatch chunked instead of falling back)."""
    from radar_point_cloud_tracking_tpu.ops import neighbors

    coords, times, valid = _scene(11)
    args = (jnp.asarray(coords), jnp.asarray(times), jnp.asarray(valid),
            7.0, 2.0)
    monkeypatch.setattr(neighbors, "SYM_PAIR_SMEM_BUDGET", 64)
    cap = neighbors.sym_pair_chunk_cap()
    idx = build_spatial_index(*args, tile=64, pairs=True)
    assert idx.pair_a is not None
    assert idx.pair_a.shape[0] % cap == 0
    assert idx.pair_a.shape[0] >= int(idx.pair_count)


@pytest.mark.parametrize("cap", [8, 16])
def test_chunked_sym_sweeps_match_single_call(cap):
    """The chunked dispatch (wide pair lists split into SMEM-sized kernel
    calls + a visited-masked combine) must bit-match both the single-call
    symmetric path and the directed engine for every sweep family."""
    from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
        _core_stats_sym, _core_stats_sym_mf, _min_sweep_sym)

    coords, times, valid = _scene(17)
    n = coords.shape[0]
    es, et = jnp.float32(7.0), jnp.float32(2.0)
    idx = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                              jnp.asarray(valid), 7.0, 2.0, tile=64,
                              pairs=True)
    assert idx.pair_a.shape[0] > 2 * cap  # really exercises >2 chunks
    v = np.asarray(idx.valid)

    want_d, want_f = neighbor_core_stats(idx, es, et, n_offsets=2)
    got_d = _core_stats_sym(idx, es, et, cap=cap)
    assert np.array_equal(np.asarray(got_d)[v], np.asarray(want_d)[v])
    gmf_d, gmf_f = _core_stats_sym_mf(idx, es, et, 2, cap=cap)
    assert np.array_equal(np.asarray(gmf_d)[v], np.asarray(want_d)[v])
    assert np.array_equal(np.asarray(gmf_f)[v], np.asarray(want_f)[v])

    rng = np.random.default_rng(1000 + cap)
    pay_np = rng.integers(0, n, idx.valid.shape).astype(np.int32)
    pay_np[~v] = INT_MAX
    payload = jnp.asarray(pay_np)
    want_m = neighbor_min_sweep(idx, payload, es, et)
    got_m = _min_sweep_sym(idx, payload, es, et, cap=cap)
    assert np.array_equal(np.asarray(got_m)[v], np.asarray(want_m)[v])

    qlim = jnp.asarray(rng.integers(0, n, idx.valid.shape).astype(np.int32))
    byp = jnp.asarray(rng.random(idx.valid.shape) < 0.15)
    want_l = neighbor_min_sweep(idx, payload, es, et, query_limit=qlim,
                                bypass_limit=byp, use_limit=True)
    got_l = _min_sweep_sym(idx, payload, es, et, query_limit=qlim,
                           bypass_limit=byp, use_limit=True, cap=cap)
    assert np.array_equal(np.asarray(got_l)[v], np.asarray(want_l)[v])


@pytest.mark.parametrize("cap_budget", [None, 128])
def test_gated_sym_sweep_matches_full_and_directed(monkeypatch, cap_budget):
    """The gated symmetric sweep (active-pair compaction + guarded DMA)
    must reproduce the monotone-accumulator contract: starting from a
    full sweep's accumulator, after payloads decrease in marked tiles it
    equals BOTH the full sweep of the new payload and the directed gated
    sweep — at full width and chunked (tiny SMEM budget)."""
    from radar_point_cloud_tracking_tpu.ops import neighbors
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        neighbor_min_sweep_gated)
    from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
        min_sweep_pallas_sym_gated)

    if cap_budget is not None:
        monkeypatch.setattr(neighbors, "SYM_PAIR_SMEM_BUDGET", cap_budget)
    coords, times, valid = _scene(27)
    n = coords.shape[0]
    es, et = jnp.float32(7.0), jnp.float32(2.0)
    idx = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                              jnp.asarray(valid), 7.0, 2.0, tile=64,
                              pairs=True)
    rng = np.random.default_rng(500)
    pay0 = rng.integers(100, n, idx.valid.shape).astype(np.int32)
    pay0[~np.asarray(idx.valid)] = INT_MAX
    acc0 = neighbor_min_sweep(idx, jnp.asarray(pay0), es, et)

    # decrease payloads in some tiles; mark exactly those tiles changed
    changed_np = np.zeros((idx.num_tiles,), bool)
    changed_np[rng.choice(idx.num_tiles, max(1, idx.num_tiles // 5),
                          replace=False)] = True
    pay1 = pay0.copy()
    sel = changed_np[:, None] & np.asarray(idx.valid)
    pay1[sel] = np.maximum(pay1[sel] - 80, 0)
    payload1 = jnp.asarray(pay1)
    changed = jnp.asarray(changed_np)

    want_full = neighbor_min_sweep(idx, payload1, es, et)
    want_directed = neighbor_min_sweep_gated(idx, payload1, es, et, acc0,
                                             changed)
    got = min_sweep_pallas_sym_gated(idx, payload1, es, et, acc0, changed)
    v = np.asarray(idx.valid)
    assert np.array_equal(np.asarray(got)[v], np.asarray(want_full)[v])
    assert np.array_equal(np.asarray(got)[v], np.asarray(want_directed)[v])

    # degenerate frontiers: nothing changed -> acc unchanged; all changed
    # -> equals the full sweep
    got_none = min_sweep_pallas_sym_gated(
        idx, payload1, es, et, acc0, jnp.zeros((idx.num_tiles,), bool))
    assert np.array_equal(np.asarray(got_none)[v], np.asarray(acc0)[v])
    got_all = min_sweep_pallas_sym_gated(
        idx, payload1, es, et,
        jnp.full(idx.valid.shape, INT_MAX, jnp.int32),
        jnp.ones((idx.num_tiles,), bool))
    assert np.array_equal(np.asarray(got_all)[v], np.asarray(want_full)[v])


def test_full_cluster_program_chunked_sym_engine(monkeypatch):
    """End-to-end: with the SMEM budget forced tiny, st_dbscan_device's
    symmetric engine runs fully chunked and must still bit-match the
    plain XLA engine (tracker 'always' AND denoiser min_frames modes)."""
    from radar_point_cloud_tracking_tpu.ops import neighbors
    from radar_point_cloud_tracking_tpu.ops.stdbscan import st_dbscan_device

    coords, times, valid = _scene(19, n=1100)
    args = (jnp.asarray(coords), jnp.asarray(times), jnp.asarray(valid),
            7.0, 2.0, 6)
    base, kb = st_dbscan_device(*args, border_mode="always", tile=64,
                                use_pallas=False)
    base_mf, kmf = st_dbscan_device(*args, min_frames=2,
                                    border_mode="if_earlier", tile=64,
                                    use_pallas=False)
    monkeypatch.setattr(neighbors, "SYM_PAIR_SMEM_BUDGET", 128)
    sym, ks = st_dbscan_device(*args, border_mode="always", tile=64,
                               use_pallas=True)
    sym_mf, ksmf = st_dbscan_device(*args, min_frames=2,
                                    border_mode="if_earlier", tile=64,
                                    use_pallas=True)
    assert int(kb) == int(ks)
    assert np.array_equal(np.asarray(base), np.asarray(sym))
    assert int(kmf) == int(ksmf)
    assert np.array_equal(np.asarray(base_mf), np.asarray(sym_mf))


def test_pairs_only_build_matches_directed_build():
    """directed=False (pairs-only) must produce the IDENTICAL pair list
    the directed build derives — same width, same (a, b) entries, same
    dead-tail fill — while skipping the candidate table entirely."""
    for seed in (21, 22):
        coords, times, valid = _scene(seed, n=1100)
        args = (jnp.asarray(coords), jnp.asarray(times), jnp.asarray(valid),
                7.0, 2.0)
        full = build_spatial_index(*args, tile=64, pairs=True)
        slim = build_spatial_index(*args, tile=64, pairs=True,
                                   directed=False)
        assert slim.cand_idx is None
        assert slim.cand_count is None
        assert slim.qorder is None
        assert slim.pair_a.shape == full.pair_a.shape
        assert int(slim.pair_count) == int(full.pair_count)
        assert np.array_equal(np.asarray(slim.pair_a),
                              np.asarray(full.pair_a))
        assert np.array_equal(np.asarray(slim.pair_b),
                              np.asarray(full.pair_b))
        # sorted tile views identical too (same program input either way)
        assert np.array_equal(np.asarray(slim.coords),
                              np.asarray(full.coords))
        assert np.array_equal(np.asarray(slim.perm), np.asarray(full.perm))


def test_pairs_only_requires_pairs():
    coords, times, valid = _scene(23, n=200)
    with pytest.raises(ValueError):
        build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                            jnp.asarray(valid), 7.0, 2.0, tile=64,
                            directed=False)


def test_full_cluster_program_on_pairs_only_index():
    """cluster_index(use_pallas=True) over a pairs-only index (no directed
    candidate table at all) must bit-match the plain XLA engine — every
    sweep in the program routes through the symmetric kernels."""
    from radar_point_cloud_tracking_tpu.ops.stdbscan import cluster_index

    coords, times, valid = _scene(25, n=1300)
    args = (jnp.asarray(coords), jnp.asarray(times), jnp.asarray(valid),
            7.0, 2.0)
    full = build_spatial_index(*args, tile=64)
    slim = build_spatial_index(*args, tile=64, pairs=True, directed=False)
    es, et = jnp.float32(7.0), jnp.float32(2.0)
    for border_mode, mf, ko in (("always", 1, 0), ("if_earlier", 2, 2)):
        want, kw = cluster_index(full, es, et, 8, mf, ko, border_mode, 256,
                                 use_pallas=False)
        got, kg = cluster_index(slim, es, et, 8, mf, ko, border_mode, 256,
                                use_pallas=True)
        assert int(kw) == int(kg)
        assert np.array_equal(np.asarray(want), np.asarray(got))


def test_fallback_sweeps_raise_clearly_on_pairs_only_index():
    """The XLA fallback sweeps need the directed candidate table; on a
    pairs-only index they must fail with an actionable ValueError, not an
    AttributeError on a None field."""
    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        neighbor_min_sweep_gated,
    )

    coords, times, valid = _scene(31, n=300)
    slim = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                               jnp.asarray(valid), 7.0, 2.0, tile=64,
                               pairs=True, directed=False)
    es, et = jnp.float32(7.0), jnp.float32(2.0)
    with pytest.raises(ValueError, match="pairs-only"):
        neighbor_core_stats(slim, es, et)
    with pytest.raises(ValueError, match="pairs-only"):
        neighbor_min_sweep(slim, jnp.zeros_like(slim.times, jnp.int32),
                           es, et)
    nt, t = slim.coords.shape[:2]
    with pytest.raises(ValueError, match="pairs-only"):
        neighbor_min_sweep_gated(
            slim, jnp.zeros((nt, t), jnp.int32), es, et,
            jnp.full((nt, t), INT_MAX, jnp.int32), jnp.ones((nt,), bool))


def test_build_spatial_index_tile_count_guard():
    """Past MAX_NUM_TILES the build must fail fast with the remedy (raise
    tile_size), not fall into an opaque (nt, nt) allocation failure."""
    from radar_point_cloud_tracking_tpu.ops.neighbors import MAX_NUM_TILES

    n = MAX_NUM_TILES + 1
    coords = jnp.zeros((n, 2), jnp.float32)
    times = jnp.zeros((n,), jnp.float32)
    valid = jnp.ones((n,), bool)
    with pytest.raises(ValueError, match="tile_size"):
        build_spatial_index(coords, times, valid, 7.0, 2.0, tile=1)


def _clustered_scene(seed, n_blobs=12, per_blob=120, n_border=30):
    """Dense well-separated blobs (all-core interiors spanning many tiles)
    plus a few stragglers near blob edges (the only non-core points) —
    makes the border-gated if_earlier sweep actually drop pairs."""
    rng = np.random.default_rng(seed)
    pts, ts = [], []
    for i in range(n_blobs):
        c = np.array([(i % 4) * 400.0, (i // 4) * 400.0])
        pts.append(rng.normal(c, 2.0, (per_blob, 2)))
        ts.append(rng.integers(0, 4, per_blob))
    # stragglers: just outside a blob's dense core (border or noise)
    for i in range(n_border):
        c = np.array([(i % 4) * 400.0, (i // 4 % 3) * 400.0])
        pts.append((c + rng.uniform(5.0, 9.0, (1, 2))))
        ts.append(rng.integers(0, 4, 1))
    coords = np.concatenate(pts).astype(np.float32)
    times = np.concatenate(ts).astype(np.float32)
    valid = np.ones((coords.shape[0],), bool)
    return coords, times, valid


def test_border_gated_if_earlier_matches_plain_xla():
    """cluster_index(use_pallas=True, if_earlier) scopes the border sweep
    to pairs touching a non-core tile; on a scene where most tiles are
    all-core the scoped list is a strict subset and labels must still
    bit-match the (ungated, full-sweep) XLA engine."""
    from radar_point_cloud_tracking_tpu.ops.stdbscan import (
        cluster_index, compute_core_mask)

    coords, times, valid = _clustered_scene(41)
    args = (jnp.asarray(coords), jnp.asarray(times), jnp.asarray(valid),
            7.0, 2.0)
    full = build_spatial_index(*args, tile=64)
    slim = build_spatial_index(*args, tile=64, pairs=True, directed=False)
    es, et = jnp.float32(7.0), jnp.float32(2.0)
    # precondition: the gate has something to drop — some tile is all-core
    core = compute_core_mask(full, 7.0, 2.0, 8, min_frames=2)
    noncore_tile = np.asarray(jnp.any(full.valid & ~core, axis=1))
    assert (~noncore_tile).sum() > 0, "scene has no all-core tile"
    want, kw = cluster_index(full, es, et, 8, 2, 2, "if_earlier", 256,
                             use_pallas=False)
    got, kg = cluster_index(slim, es, et, 8, 2, 2, "if_earlier", 256,
                            use_pallas=True)
    assert int(kw) == int(kg)
    assert np.array_equal(np.asarray(want), np.asarray(got))


def test_border_gated_sweep_empty_scope():
    """Zero non-core valid points -> the scoped pair list is empty; the
    sweep's output is never read (no border points) and the program must
    still converge to the XLA engine's labels."""
    from radar_point_cloud_tracking_tpu.ops.stdbscan import cluster_index

    # one dense blob, min_samples low: every valid point is core
    rng = np.random.default_rng(43)
    coords = rng.normal(0.0, 2.0, (300, 2)).astype(np.float32)
    times = rng.integers(0, 3, 300).astype(np.float32)
    valid = np.ones((300,), bool)
    args = (jnp.asarray(coords), jnp.asarray(times), jnp.asarray(valid),
            7.0, 2.0)
    full = build_spatial_index(*args, tile=64)
    slim = build_spatial_index(*args, tile=64, pairs=True, directed=False)
    es, et = jnp.float32(7.0), jnp.float32(2.0)
    want, kw = cluster_index(full, es, et, 4, 1, 0, "if_earlier", 256,
                             use_pallas=False)
    got, kg = cluster_index(slim, es, et, 4, 1, 0, "if_earlier", 256,
                            use_pallas=True)
    assert int(kw) == int(kg)
    assert np.array_equal(np.asarray(want), np.asarray(got))


@pytest.mark.parametrize("seed", [7, 8])
def test_scoped_sweep_exact_at_masked_tiles(seed):
    """min_sweep_pallas_sym_scoped: for ANY tile mask, output at points in
    masked tiles must equal the full thresholded sweep (pairs between two
    unmasked tiles contribute only to unmasked tiles)."""
    from radar_point_cloud_tracking_tpu.ops.pallas_neighbors import (
        min_sweep_pallas_sym, min_sweep_pallas_sym_scoped)

    coords, times, valid = _scene(seed, n=800)
    es, et = jnp.float32(7.0), jnp.float32(2.0)
    idx = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                              jnp.asarray(valid), 7.0, 2.0, tile=64,
                              pairs=True)
    rng = np.random.default_rng(seed + 60)
    shape = idx.valid.shape
    pay_np = rng.integers(0, 500, shape).astype(np.int32)
    pay_np[~np.asarray(idx.valid)] = INT_MAX
    payload = jnp.asarray(pay_np)
    qlim = jnp.asarray(rng.integers(0, 500, shape).astype(np.int32))
    byp = jnp.asarray(rng.random(shape) < 0.15)
    full = min_sweep_pallas_sym(idx, payload, es, et, query_limit=qlim,
                                bypass_limit=byp, use_limit=True)
    nt = idx.num_tiles
    for frac in (0.0, 0.3, 1.0):
        mask_np = rng.random(nt) < frac
        scoped = min_sweep_pallas_sym_scoped(
            idx, payload, es, et, jnp.asarray(mask_np),
            query_limit=qlim, bypass_limit=byp)
        sel = np.asarray(idx.valid) & mask_np[:, None]
        assert np.array_equal(np.asarray(scoped)[sel],
                              np.asarray(full)[sel]), f"frac={frac}"
