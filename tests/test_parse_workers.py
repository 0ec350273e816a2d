"""Thread-pool parse path (models/ingest.py _parsed_stream): the bounded-
window ordered yield must be bit-identical to the sequential path.

The pool only engages when parse_workers > 1; this host has one core, so
the default never exercises it — these tests force workers=4 and compare
every ingested buffer bit-for-bit against workers=1 (an ordering bug there
would scramble frame order silently).  Reference analog: the denoiser's
ProcessPoolExecutor frame loading (stdbscan_denoising_pipeline.py:234-257).
"""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from radar_point_cloud_tracking_tpu.models.ingest import FrameBatchLoader
from radar_point_cloud_tracking_tpu.utils.timestamps import (
    discover_files,
    group_files_by_frame,
)


def _frame_files(gain_dataset):
    files_by_gain = discover_files(gain_dataset)
    return group_files_by_frame(files_by_gain)


def _loader(workers: int, sparse=None) -> FrameBatchLoader:
    loader = FrameBatchLoader(intensity_threshold=10.0, point_stride=2,
                              verbose=False, frame_capacity=4096,
                              parse_workers=workers, sparse=sparse)
    loader.config.radar.num_echo_columns = 64
    return loader


def _assert_ingested_equal(a, b):
    assert np.array_equal(np.asarray(a.xyi), np.asarray(b.xyi))
    assert np.array_equal(np.asarray(a.gain), np.asarray(b.gain))
    assert np.array_equal(np.asarray(a.count), np.asarray(b.count))
    assert np.array_equal(a.frame_ids, b.frame_ids)
    assert np.array_equal(a.timestamps_ms, b.timestamps_ms)


@pytest.mark.parametrize("sparse", [None, False])
def test_parse_workers_bitequal_load_sequence(gain_dataset, sparse):
    ff = _frame_files(gain_dataset)
    assert len(ff) >= 3  # the window logic needs multiple frames
    seq = _loader(1, sparse).load_sequence(ff)
    pooled = _loader(4, sparse).load_sequence(ff)
    _assert_ingested_equal(seq, pooled)


def test_parse_workers_bitequal_land_filtered(gain_dataset):
    """The host land-prefilter path consumes the same stream."""
    kw = dict(grid_resolution_m=5.0, persistence_threshold=0.8,
              min_intensity=100.0, min_frames_required=2)
    ff = _frame_files(gain_dataset)
    l1 = _loader(1)
    if not l1.sparse:
        pytest.skip("native sparse parse unavailable")
    seq, info1 = l1.load_sequence_land_filtered(ff, **kw)
    pooled, info4 = _loader(4).load_sequence_land_filtered(ff, **kw)
    _assert_ingested_equal(seq, pooled)
    assert info1["land_cells"] == info4["land_cells"]
    assert info1["points_removed"] == info4["points_removed"]


def test_parse_workers_stream_order(gain_dataset):
    """_parsed_stream yields strictly ascending frame indices with a pool."""
    ff = _frame_files(gain_dataset)
    loader = _loader(3)
    order = [i for i, _ts, _parsed in loader._parsed_stream(ff)]
    assert order == sorted(order)
    assert len(order) == len(ff)
