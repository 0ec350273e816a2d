"""The cached candidate-width hint must never change results: an
undersized hint is detected in-program and triggers an exact rebuild."""

import jax.numpy as jnp
import numpy as np
import pytest

from radar_point_cloud_tracking_tpu.config import PipelineConfig
from radar_point_cloud_tracking_tpu.models import tracker as tracker_mod
from radar_point_cloud_tracking_tpu.models.ingest import IngestedFrames


@pytest.fixture
def _clean_cache():
    saved = dict(tracker_mod._KPAD_CACHE)
    tracker_mod._KPAD_CACHE.clear()
    yield
    tracker_mod._KPAD_CACHE.clear()
    tracker_mod._KPAD_CACHE.update(saved)


def _ingested(f=4, c=2048, seed=12):
    """Dense-enough scene that the spatial index really has multi-tile
    candidate lists (a trivially small scene has max candidate count 1 and
    can never exercise the undersized-hint retry)."""
    rng = np.random.default_rng(seed)
    xyi = np.full((f, c, 3), 1e9, np.float32)
    count = np.zeros((f,), np.int32)
    for fi in range(f):
        centers = rng.uniform(-300, 300, (18, 2))
        blob = (np.repeat(centers, 100, axis=0)
                + rng.normal(0, 2.0, (1800, 2)))
        pts = np.concatenate(
            [blob, rng.uniform(-300, 300, (200, 2))]).astype(np.float32)
        arr = np.column_stack(
            [pts, rng.uniform(50, 255, len(pts))]).astype(np.float32)
        xyi[fi, :len(arr)] = arr
        count[fi] = len(arr)
    return IngestedFrames(
        xyi=jnp.asarray(xyi),
        gain=jnp.asarray(np.full((f, c), 75, np.int32)),
        count=jnp.asarray(count),
        frame_ids=np.arange(f, dtype=np.int32),
        timestamps_ms=np.arange(f, dtype=np.int64) * 1000,
        count_host=count)


def _run(ingested, cfg):
    pipe = tracker_mod.TrackingPipeline(cfg, verbose=False)
    return pipe.run_on_frames(ingested, eps_space=8.0, eps_time=2.0,
                              min_samples=5, skip_land_filter=True,
                              quiet_land_skip=True)


def test_undersized_kpad_hint_is_detected_and_exact(_clean_cache):
    import jax.numpy as jnp

    from radar_point_cloud_tracking_tpu.ops.neighbors import (
        build_spatial_index)

    cfg = PipelineConfig()
    ingested = _ingested()
    ref = _run(ingested, cfg)
    ref_labels = np.asarray(ref.labels)

    # the true candidate geometry of this scene must be non-trivial, or the
    # poisoned hint below would never overflow and the test is vacuous
    cell = cfg.clustering.cell_size
    tile_sz = cfg.clustering.tile_size
    cap = ref.points_dev.shape[0]
    n = ref.n_points
    idx = build_spatial_index(
        ref.points_dev[:, :2], ref.points_dev[:, 4],
        jnp.arange(cap) < n, 8.0, 2.0, tile=tile_sz, cell_size=cell)
    true_max = int(jnp.max(idx.cand_count))
    assert true_max > 1, "fixture too small: a hint of 1 is not undersized"

    # poison the cache key with uselessly small hints; the in-program
    # overflow check must force an exact rebuild
    tracker_mod._KPAD_CACHE.clear()
    key = (int(cap), tile_sz, 8.0, 2.0, cell)
    tracker_mod._KPAD_CACHE[key] = (1, 1)

    out = _run(ingested, cfg)
    assert np.array_equal(np.asarray(out.labels), ref_labels)
    assert out.num_clusters == ref.num_clusters
    # the retry must have repaired the cache to a width covering the true
    # candidate maximum (not just any >= 1 value)
    assert tracker_mod._KPAD_CACHE[key][0] >= true_max
