"""Shared bench-scene loader for the A/B tools.

ONE copy of the bench scene recipe (dataset signature, threshold 10,
stride 4, frame capacity 131072, default land filter) so every paired A/B
measures exactly the scene bench.py records — if the bench recipe moves,
the tools move with it.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_bench_scene(num_frames: int = 100):
    """Returns (points (cap, 6) device array, n, capacity, cfg)."""
    import jax
    import jax.numpy as jnp

    import bench
    import radar_point_cloud_tracking_tpu as rpt
    from radar_point_cloud_tracking_tpu.config import PipelineConfig
    from radar_point_cloud_tracking_tpu.models.ingest import FrameBatchLoader
    from radar_point_cloud_tracking_tpu.models.tracker import (
        TrackingPipeline, _flatten_and_compact, _quarter_pow2)

    np.asarray(jnp.ones(8))  # handshake
    data_dir = bench._dataset(num_frames)
    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = bench.NUM_BINS
    files = rpt.discover_files(data_dir)
    frames = rpt.group_files_by_frame(files)[:num_frames]
    loader = FrameBatchLoader(cfg, intensity_threshold=bench.THRESHOLD,
                              point_stride=bench.STRIDE, verbose=False,
                              frame_capacity=bench.FRAME_CAP)
    TrackingPipeline(cfg, verbose=False)
    lf = cfg.land_filter
    ing, _info = loader.load_sequence_land_filtered(
        frames, grid_resolution_m=lf.grid_resolution_m,
        persistence_threshold=lf.persistence_threshold,
        min_intensity=lf.min_intensity,
        min_frames_required=lf.min_frames_required)
    n = int(ing.count_host.sum())
    cap = _quarter_pow2(n)
    points, _n_dev = _flatten_and_compact(
        ing.xyi, ing.gain, ing.count, jnp.asarray(ing.frame_ids),
        ing.valid_mask().reshape(-1), cap)
    jax.block_until_ready(points)
    return points, n, cap, cfg


def load_bench_scene_denoise(num_frames: int = 100):
    """Denoise-flagship scene: same dataset, NO land filter, frame-INDEX
    time axis (bench.py BENCH_DENOISE composition).  Returns
    (points (cap, 6), n, capacity, cfg)."""
    import jax
    import jax.numpy as jnp

    import bench
    import radar_point_cloud_tracking_tpu as rpt
    from radar_point_cloud_tracking_tpu.config import PipelineConfig
    from radar_point_cloud_tracking_tpu.models.ingest import FrameBatchLoader
    from radar_point_cloud_tracking_tpu.models.tracker import _quarter_pow2
    from radar_point_cloud_tracking_tpu.ops.geometry import compact_masked

    np.asarray(jnp.ones(8))
    data_dir = bench._dataset(num_frames)
    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = bench.NUM_BINS
    files = rpt.discover_files(data_dir)
    frames = rpt.group_files_by_frame(files)[:num_frames]
    loader = FrameBatchLoader(cfg, intensity_threshold=bench.THRESHOLD,
                              point_stride=bench.STRIDE, verbose=False,
                              frame_capacity=bench.FRAME_CAP)
    ing = loader.load_sequence(frames)
    f, c = ing.num_frames, ing.capacity
    valid = ing.valid_mask()
    local = jnp.broadcast_to(jnp.arange(f, dtype=jnp.float32)[:, None],
                             (f, c))
    fid = jnp.broadcast_to(jnp.asarray(ing.frame_ids, jnp.float32)[:, None],
                           (f, c))
    vals = jnp.concatenate([
        ing.xyi, local[..., None], fid[..., None],
        ing.gain.astype(jnp.float32)[..., None]], axis=-1).reshape(f * c, 6)
    n = int(jnp.sum(ing.count))
    cap = _quarter_pow2(n)
    points, _ = compact_masked(vals, valid.reshape(f * c), cap)
    jax.block_until_ready(points)
    return points, n, cap, cfg
