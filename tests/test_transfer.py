"""Device->host pull helpers: prefix slicing and int16 label narrowing
must be value-exact and dtype-stable (utils/transfer.py)."""

import jax.numpy as jnp
import numpy as np

from radar_point_cloud_tracking_tpu.utils.transfer import (
    pull_labels,
    pull_prefix,
)


def test_pull_prefix_drops_padding():
    buf = jnp.arange(32, dtype=jnp.float32).reshape(16, 2)
    out = pull_prefix(buf, 5)
    assert out.shape == (5, 2)
    assert np.array_equal(out, np.arange(10, dtype=np.float32).reshape(5, 2))


def test_pull_labels_narrow_path_exact():
    lbl = jnp.asarray([-1, 0, 5, 32766, -1, 7], jnp.int32)
    out = pull_labels(lbl, 5, num_clusters=32767)
    assert out.dtype == np.int32
    assert np.array_equal(out, np.asarray([-1, 0, 5, 32766, -1], np.int32))


def test_pull_labels_wide_fallback():
    # labels beyond int16 range force the full-width pull
    lbl = jnp.asarray([-1, 40000, 70000], jnp.int32)
    out = pull_labels(lbl, 3, num_clusters=70001)
    assert out.dtype == np.int32
    assert np.array_equal(out, np.asarray([-1, 40000, 70000], np.int32))


def test_pull_labels_boundary_values():
    m = np.iinfo(np.int16).max
    lbl = jnp.asarray([m - 1, -1, 0], jnp.int32)
    out = pull_labels(lbl, 3, num_clusters=m)
    assert np.array_equal(out, np.asarray([m - 1, -1, 0], np.int32))
    # one past the int16 ceiling must take the wide path and stay exact
    lbl2 = jnp.asarray([m, -1], jnp.int32)
    out2 = pull_labels(lbl2, 2, num_clusters=m + 1)
    assert np.array_equal(out2, np.asarray([m, -1], np.int32))
