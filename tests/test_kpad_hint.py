"""The cached candidate-width hint must never change results: an
undersized hint is detected in-program and triggers an exact rebuild."""

import numpy as np
import pytest

from radar_point_cloud_tracking_tpu.models import tracker as tracker_mod


@pytest.fixture
def _clean_cache():
    saved = dict(tracker_mod._KPAD_CACHE)
    tracker_mod._KPAD_CACHE.clear()
    yield
    tracker_mod._KPAD_CACHE.clear()
    tracker_mod._KPAD_CACHE.update(saved)


def _run(gain_dataset_dir, cfg=None):
    import radar_point_cloud_tracking_tpu as rpt
    from radar_point_cloud_tracking_tpu.config import PipelineConfig
    from radar_point_cloud_tracking_tpu.models.ingest import FrameBatchLoader

    cfg = cfg or PipelineConfig()
    files = rpt.discover_files(gain_dataset_dir)
    frames = rpt.group_files_by_frame(files)
    loader = FrameBatchLoader(cfg, intensity_threshold=10.0, point_stride=4,
                              verbose=False, frame_capacity=8192)
    pipe = tracker_mod.TrackingPipeline(cfg, verbose=False)
    ing = loader.load_sequence(frames)
    return pipe.run_on_frames(ing, eps_space=8.0, eps_time=2.0,
                              min_samples=3, skip_land_filter=True,
                              quiet_land_skip=True)


def test_undersized_kpad_hint_is_detected_and_exact(gain_dataset, _clean_cache):
    ref = _run(gain_dataset)
    ref_labels = np.asarray(ref.labels)

    # poison every plausible cache key with a uselessly small hint; the
    # in-program overflow check must force an exact rebuild
    tracker_mod._KPAD_CACHE.clear()
    cap = ref.points_dev.shape[0]
    for tile in (64, 128, 256, 512):
        tracker_mod._KPAD_CACHE[(int(cap), tile)] = 1

    out = _run(gain_dataset)
    assert np.array_equal(np.asarray(out.labels), ref_labels)
    assert out.num_clusters == ref.num_clusters
    # the retry must also have repaired the cache to a sufficient width
    for key, v in tracker_mod._KPAD_CACHE.items():
        assert v >= 1
