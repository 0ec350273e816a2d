"""Pre-merge group label seeding: exactness vs the plain engine and vs the
CPU oracle, including adversarial bucket-edge scenes.

Pre-merge (ops/neighbors.py build_spatial_index(premerge=True)) groups
points into eps/2-sized subcells crossed with eps_time/2 time buckets; all
core points in one group are mutual ST-neighbors by construction, so
cluster_index may seed them with the group's minimum core index.  The
converged labels must be bit-identical to the unseeded engine on any scene.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from radar_point_cloud_tracking_tpu.ops.neighbors import build_spatial_index
from radar_point_cloud_tracking_tpu.ops.stdbscan import (
    cluster_index,
    st_dbscan_device,
)
from radar_point_cloud_tracking_tpu.reference_impl.oracle import (
    oracle_st_dbscan,
)


def _labels(coords, times, es, et, ms, premerge, border_mode="always",
            min_frames=1, tile=64):
    n = coords.shape[0]
    lbl, k = st_dbscan_device(
        jnp.asarray(coords, jnp.float32), jnp.asarray(times, jnp.float32),
        jnp.ones((n,), bool), es, et, ms, min_frames=min_frames,
        border_mode=border_mode, tile=tile, premerge=premerge)
    return np.asarray(lbl), int(k)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("border_mode", ["always", "if_earlier"])
def test_premerge_matches_plain_engine_random(seed, border_mode):
    rng = np.random.default_rng(seed)
    blobs = [rng.normal(rng.uniform(0, 200, 2), 2.5, (120, 2))
             for _ in range(6)]
    noise = rng.uniform(-20, 220, (150, 2))
    coords = np.concatenate(blobs + [noise]).astype(np.float32)
    times = rng.integers(0, 12, coords.shape[0]).astype(np.float32)
    es, et, ms = 8.0, 2.0, 10
    base, kb = _labels(coords, times, es, et, ms, False, border_mode)
    seeded, ks = _labels(coords, times, es, et, ms, True, border_mode)
    assert kb == ks
    assert np.array_equal(base, seeded)


def test_premerge_matches_oracle():
    rng = np.random.default_rng(7)
    blobs = [rng.normal(rng.uniform(0, 100, 2), 2.0, (80, 2))
             for _ in range(4)]
    coords = np.concatenate(blobs + [rng.uniform(-10, 110, (60, 2))])
    coords = coords.astype(np.float32)
    times = rng.integers(0, 8, coords.shape[0]).astype(np.float32)
    seeded, _ = _labels(coords, times, 6.0, 2.0, 8, True)
    oracle = oracle_st_dbscan(coords, times, 6.0, 2.0, 8)
    assert np.array_equal(seeded, oracle)


def test_premerge_min_frames_matches_plain():
    rng = np.random.default_rng(11)
    coords = np.concatenate([
        rng.normal((30, 30), 2.0, (200, 2)),
        rng.normal((80, 10), 2.0, (90, 2)),
        rng.uniform(0, 100, (80, 2)),
    ]).astype(np.float32)
    times = rng.integers(0, 10, coords.shape[0]).astype(np.float32)
    base, kb = _labels(coords, times, 7.0, 2.0, 8, False, "if_earlier",
                       min_frames=3)
    seeded, ks = _labels(coords, times, 7.0, 2.0, 8, True, "if_earlier",
                         min_frames=3)
    assert kb == ks
    assert np.array_equal(base, seeded)


def test_premerge_bucket_edges_adversarial():
    """Points sitting exactly at subcell / time-bucket boundaries: grouping
    may only ever merge true neighbors, so the converged labels still
    bit-match the plain engine even when the f32 bucket assignment of an
    edge-straddling point is ambiguous."""
    es, et = 8.0, 2.0
    s = es / 2.0
    xs = []
    for k in range(12):
        # pairs straddling subcell edge k*s by one ulp each side
        e = np.float32(k * s)
        xs += [np.nextafter(e, -np.inf, dtype=np.float32),
               e, np.nextafter(e, np.inf, dtype=np.float32)]
    xs = np.asarray(xs, np.float32)
    coords = np.stack([xs, np.zeros_like(xs)], 1)
    # times straddling bucket edges (multiples of et/2)
    tvals = []
    for k in range(len(xs)):
        b = np.float32((k % 5) * et / 2.0)
        tvals.append(np.nextafter(b, np.inf, dtype=np.float32)
                     if k % 2 else b)
    times = np.asarray(tvals, np.float32)
    base, kb = _labels(coords, times, es, et, 2, False)
    seeded, ks = _labels(coords, times, es, et, 2, True)
    assert kb == ks
    assert np.array_equal(base, seeded)


def test_premerge_eps_time_zero_degrades_safely():
    """eps_time == 0 disables time bucketing (only exactly-equal times are
    neighbors); the pre-merge must degrade to per-point groups or
    exact-time groups, never wrongly merge across times."""
    rng = np.random.default_rng(3)
    coords = rng.normal((10, 10), 1.0, (120, 2)).astype(np.float32)
    times = (rng.integers(0, 3, 120)).astype(np.float32)
    base, kb = _labels(coords, times, 5.0, 0.0, 5, False)
    seeded, ks = _labels(coords, times, 5.0, 0.0, 5, True)
    assert kb == ks
    assert np.array_equal(base, seeded)


def test_premerge_group_invariant():
    """Structural check: every pre-merge group's members really are
    pairwise ST-neighbors under the device predicate."""
    rng = np.random.default_rng(5)
    coords = rng.uniform(0, 60, (800, 2)).astype(np.float32)
    times = rng.integers(0, 6, 800).astype(np.float32)
    es, et = 8.0, 2.0
    idx = build_spatial_index(jnp.asarray(coords), jnp.asarray(times),
                              jnp.ones((800,), bool), es, et, tile=64,
                              premerge=True)
    gid = np.asarray(idx.group_id).reshape(-1)
    c = np.asarray(idx.coords).reshape(-1, 2)
    t = np.asarray(idx.times).reshape(-1)
    v = np.asarray(idx.valid).reshape(-1)
    for g in np.unique(gid[v]):
        members = np.where((gid == g) & v)[0]
        if len(members) < 2:
            continue
        pc, pt = c[members], t[members]
        d2 = ((pc[:, None] - pc[None, :]) ** 2).sum(-1)
        dt = np.abs(pt[:, None] - pt[None, :])
        assert (d2 <= es * es).all() and (dt <= et).all()
