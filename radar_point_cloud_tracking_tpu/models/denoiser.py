"""ST-DBSCAN denoising pipeline (TPU).

End-to-end equivalent of PointCloudWorkF/stdbscan_denoising_pipeline.py:
862-1046 — discover -> group -> batched device conversion -> temporal
ST-DBSCAN with the min_frames persistence core test -> noise statistics ->
binary PLYs + CSVs + plots/GIF.  Clustering uses the denoiser's scan-order
border semantics ("if_earlier", see ops/stdbscan.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..core.writers import write_ply_arrays
from ..ops.cluster_stats import per_frame_cluster_stats
from ..ops.colors import label_palette_tab20
from ..ops.stdbscan import st_dbscan_device
from ..utils import checkpoint as _ckpt
from ..utils.profiling import StageTimer
from ..utils.timestamps import discover_files, group_files_by_frame
from ..utils.transfer import pull_labels, pull_prefix
from .ingest import FrameBatchLoader, IngestedFrames
from .tracker import _flatten_and_compact, _quarter_pow2

__all__ = ["DenoiseResult", "denoise_frames",
           "denoise_frames_sharded", "run_denoising_pipeline"]


@dataclass
class DenoiseResult:
    """Clustered sequence with LAZY host materialization: the padded point
    buffer is hundreds of MB at the 10M-point scale and this rig's tunnel
    moves ~17 MB/s, so ``points``/``labels`` stay on device until a consumer
    (PLY writers, plots) actually dereferences them — callers that only need
    stats/cluster tables never pay the bulk d2h (same discipline as
    TrackingResult, models/tracker.py)."""

    # repr=False on the device fields: dataclass __repr__ would otherwise
    # print the jax arrays, forcing the very bulk d2h this class avoids
    points_dev: jnp.ndarray = field(
        repr=False)  # (cap, 6) x, y, intensity, local, frame_id, gain
    labels_dev: jnp.ndarray = field(repr=False)  # (cap,)
    n_points: int
    num_clusters: int
    stats: Dict[str, float]
    cluster_table: List[dict]
    frame_ids: np.ndarray
    timings: Dict[str, float] = field(default_factory=dict)
    _points_np: Optional[np.ndarray] = field(default=None, repr=False)
    _labels_np: Optional[np.ndarray] = field(default=None, repr=False)

    @property
    def points(self) -> np.ndarray:
        if self._points_np is None:
            self._points_np = pull_prefix(self.points_dev, self.n_points)
        return self._points_np

    @property
    def labels(self) -> np.ndarray:
        if self._labels_np is None:
            self._labels_np = pull_labels(self.labels_dev, self.n_points,
                                          self.num_clusters)
        return self._labels_np

    @property
    def signal_mask(self) -> np.ndarray:
        return self.labels >= 0


def _global_cluster_table(points, intensity, labels, valid, num_clusters):
    """Global per-cluster stats (clusters.csv of the denoiser,
    stdbscan_denoising_pipeline.py:998-1013)."""
    label_cap = 1 << max(4, (max(num_clusters, 1) - 1).bit_length())
    # max_clusters == label_cap: the global table keeps every cluster, so
    # the present-count can never overflow the compacted width
    cs = per_frame_cluster_stats(
        points, intensity, jnp.zeros(points.shape[0], jnp.int32), labels,
        valid, num_frames=1, label_cap=label_cap, max_clusters=label_cap)
    rows = []
    cvalid = np.asarray(cs.valid)[0]
    clabel = np.asarray(cs.label)[0]
    cnum = np.asarray(cs.num_points)[0]
    cents = np.asarray(cs.centroids)[0]
    cmi = np.asarray(cs.mean_intensity)[0]
    for k in range(len(cvalid)):
        if cvalid[k]:
            rows.append({
                "cluster_id": int(clabel[k]),
                "num_points": int(cnum[k]),
                "centroid_x": float(cents[k, 0]),
                "centroid_y": float(cents[k, 1]),
                "mean_intensity": float(cmi[k]),
            })
    return rows


def _save_denoise_stage(checkpoint_dir: Path, result: DenoiseResult,
                        params: tuple) -> None:
    """Persist the cluster stage (the denoiser's one whole-sequence stage —
    eps_time couples frames, so it checkpoints as ONE artifact once done;
    SURVEY §5 stage-artifact model, the analog of the reference's binary-PLY
    stage outputs at stdbscan_denoising_pipeline.py:986-1013).  Everything
    downstream (stats CSV, PLYs, plots, GIF) is a pure function of it."""
    n = result.n_points
    _ckpt.save_stage_artifact(
        Path(checkpoint_dir) / _ckpt.DENOISE_STAGE_FILE,
        points=np.asarray(result.points_dev[:n]),
        labels=np.asarray(result.labels_dev[:n]),
        num_clusters=np.asarray(result.num_clusters, np.int64),
        frame_ids=np.asarray(result.frame_ids, np.int32),
        params=np.asarray(params, np.float64))


def _result_from_denoise_artifact(checkpoint_dir: Path,
                                  expected_params: tuple,
                                  timer: StageTimer) -> DenoiseResult:
    """Rebuild a DenoiseResult from a denoise_stage.npz artifact, skipping
    ingest + clustering.  Stats and the cluster table are deterministic
    functions of (points, labels), recomputed at the same padded capacity
    the original run used (_quarter_pow2), so every downstream artifact is
    byte-identical to the uninterrupted run (tests/test_checkpoint.py)."""
    with timer.stage("load_checkpoint"):
        art = _ckpt.load_stage_artifact(
            Path(checkpoint_dir) / _ckpt.DENOISE_STAGE_FILE)
        _ckpt.check_stage_params(
            checkpoint_dir, art, expected_params,
            "(eps_space, eps_time, min_samples, min_frames, max_frames, "
            "intensity_threshold, point_stride)")
        num_clusters = int(art["num_clusters"])
        capacity = _quarter_pow2(int(art["points"].shape[0]))
        points, labels, n_points = _ckpt.rebuild_stage_points_labels(
            art, capacity)

    with timer.stage("stats"):
        pvalid = jnp.arange(capacity) < n_points
        sig = int(jnp.sum((labels >= 0) & pvalid))
        noise = n_points - sig
        stats = {
            "total_points": n_points,
            "noise_points": noise,
            "signal_points": sig,
            "num_clusters": num_clusters,
            "noise_reduction_pct": 100.0 * noise / max(n_points, 1),
        }
        cluster_table = _global_cluster_table(
            points[:, :2], points[:, 2], labels, pvalid, num_clusters)

    return DenoiseResult(
        points_dev=points,
        labels_dev=labels,
        n_points=n_points,
        num_clusters=num_clusters,
        stats=stats,
        cluster_table=cluster_table,
        frame_ids=np.asarray(art["frame_ids"], np.int32),
        timings=timer.report(),
    )


def denoise_frames(
    ingested: IngestedFrames,
    eps_space: float,
    eps_time: float,
    min_samples: int,
    min_frames: int,
    config: Optional[PipelineConfig] = None,
    verbose: bool = True,
    low_memory: bool = False,
) -> DenoiseResult:
    """Cluster an ingested sequence with temporal-persistence denoising.

    ``low_memory`` releases the padded per-frame ingest buffers (xyi/gain)
    on device right after the tight repack, so they don't ride HBM through
    the clustering program — the caller's ``ingested`` must not be reused
    afterwards.  Host RAM needs no equivalent flag: the streaming parse
    window already bounds it (models/ingest.py _parsed_stream), which is
    this design's analog of the reference denoiser's --low-memory
    free-and-reload (stdbscan_denoising_pipeline.py:1156-1159)."""
    cfg = config or PipelineConfig()
    timer = StageTimer(verbose=verbose)
    f, c = ingested.num_frames, ingested.capacity

    with timer.stage("repack"):
        # per-frame valid sets are prefixes (slot < count), so the tracker's
        # searchsorted prefix-gather assembles the tight buffer without the
        # (f*c, 6) concat + boolean argsort this path used to allocate
        total = (int(ingested.count_host.sum())
                 if ingested.count_host is not None
                 else int(jnp.sum(ingested.count)))
        capacity = _quarter_pow2(total)
        points, n_dev = _flatten_and_compact(
            ingested.xyi, ingested.gain, ingested.count,
            jnp.asarray(ingested.frame_ids),
            ingested.valid_mask().reshape(f * c), capacity)
        n_points = int(n_dev)
        if low_memory:
            for buf in (ingested.xyi, ingested.gain):
                try:
                    buf.delete()
                except Exception:  # non-jax leaves (e.g. numpy in tests)
                    pass

    with timer.stage("st_dbscan"):
        pvalid = jnp.arange(capacity) < n_points
        # the denoiser's time axis is the frame POSITION in the grouped list
        # (stdbscan_denoising_pipeline.py:933-939) — column 3, NOT the real
        # frame id in column 4 (the loader's ids happen to be positional,
        # but caller-constructed IngestedFrames may carry arbitrary ids)
        labels, num_clusters = st_dbscan_device(
            points[:, :2], points[:, 3], pvalid,
            eps_space, eps_time, min_samples,
            min_frames=min_frames, border_mode="if_earlier",
            tile=cfg.clustering.tile_size,
            max_sweeps=cfg.clustering.max_label_sweeps,
            use_pallas=(cfg.device.use_pallas
                        and jax.default_backend() == "tpu"))
        num_clusters = int(num_clusters)

    with timer.stage("stats"):
        sig = int(jnp.sum((labels >= 0) & pvalid))
        noise = n_points - sig
        stats = {
            "total_points": n_points,
            "noise_points": noise,
            "signal_points": sig,
            "num_clusters": num_clusters,
            "noise_reduction_pct": 100.0 * noise / max(n_points, 1),
        }
        cluster_table = _global_cluster_table(
            points[:, :2], points[:, 2], labels, pvalid, num_clusters)

    return DenoiseResult(
        points_dev=points,
        labels_dev=labels,
        n_points=n_points,
        num_clusters=num_clusters,
        stats=stats,
        cluster_table=cluster_table,
        frame_ids=ingested.frame_ids,
        timings=timer.report(),
    )


def denoise_frames_sharded(
    ingested: IngestedFrames,
    eps_space: float,
    eps_time: float,
    min_samples: int,
    min_frames: int,
    config: Optional[PipelineConfig] = None,
    n_devices: int = 0,
    verbose: bool = True,
) -> DenoiseResult:
    """Multi-chip denoiser: the min_frames ST-DBSCAN as ONE sharded program
    over a frame-axis device mesh (parallel/pipeline.py — eps_time halo
    exchange, owner-refresh label propagation, scan-order border
    attachment).  The denoiser's time axis is the frame POSITION in the
    grouped list, so the sharded step receives positional ids; real frame
    ids ride only into the result metadata.  Exact-match to
    :func:`denoise_frames` is covered by tests/test_parallel.py."""
    from ..parallel.mesh import make_frames_mesh
    from ..parallel.pipeline import sharded_tracking_step
    from .tracker import _SHARD_KPAD_CACHE, _compact_sharded_result

    cfg = config or PipelineConfig()
    timer = StageTimer(verbose=verbose)
    devices = jax.devices()
    n_dev = n_devices or cfg.device.num_devices or len(devices)
    if len(devices) < n_dev:
        raise RuntimeError(
            f"sharded denoiser needs {n_dev} devices, have {len(devices)}")

    f, c = ingested.num_frames, ingested.capacity
    halo_k = max(1, int(np.floor(eps_time)))
    n_dev = min(n_dev, max(1, f // halo_k))
    mesh = make_frames_mesh(n_dev)
    f_pad = -(-f // n_dev) * n_dev
    xyi, count = ingested.xyi, ingested.count
    if f_pad > f:
        from ..ops.geometry import PAD_COORD

        xyi = jnp.concatenate([
            xyi, jnp.full((f_pad - f, c, 3), PAD_COORD, xyi.dtype)])
        count = jnp.concatenate([
            count, jnp.zeros((f_pad - f,), count.dtype)])
    positions = jnp.arange(f_pad, dtype=jnp.int32)

    tile_sz = cfg.clustering.tile_size
    kk = ("denoise", n_dev, f_pad, c, tile_sz, float(eps_space),
          float(eps_time), int(min_frames))
    k_pad = _SHARD_KPAD_CACHE.get(kk, 64)
    with timer.stage("sharded_step"):
        while True:
            step = sharded_tracking_step(
                mesh, eps_space, eps_time, min_samples,
                min_frames=min_frames, border_mode="if_earlier",
                num_frames_real=f, tile=tile_sz,
                max_sweeps=cfg.clustering.max_label_sweeps,
                k_pad=k_pad, with_tracking=False)
            labels_fc, num_clusters, converged, _state, _records, stats = \
                step(xyi, count, positions)
            max_cand = int(stats["max_cand"])
            if max_cand > k_pad:
                k_pad = 1 << (max_cand - 1).bit_length()
                _SHARD_KPAD_CACHE[kk] = k_pad
                continue
            _SHARD_KPAD_CACHE[kk] = k_pad
            if not bool(converged):
                raise RuntimeError(
                    "distributed label propagation hit max_label_sweeps "
                    f"({cfg.clustering.max_label_sweeps}) before "
                    "converging; raise clustering.max_label_sweeps")
            break
        num_clusters = int(num_clusters)

    with timer.stage("gather"):
        kept_count = np.asarray(stats["kept_count"])[:f]
        n_points = int(kept_count.sum())
        cap = _quarter_pow2(n_points)
        compacted = _compact_sharded_result(
            ingested.xyi, ingested.gain, jnp.asarray(ingested.frame_ids),
            labels_fc[:f], stats["keep"][:f], cap)
        points = compacted[:, :6]
        labels = compacted[:, 6].astype(jnp.int32)

    with timer.stage("stats"):
        pvalid = jnp.arange(cap) < n_points
        sig = int(jnp.sum((labels >= 0) & pvalid))
        noise = n_points - sig
        den_stats = {
            "total_points": n_points,
            "noise_points": noise,
            "signal_points": sig,
            "num_clusters": num_clusters,
            "noise_reduction_pct": 100.0 * noise / max(n_points, 1),
        }
        cluster_table = _global_cluster_table(
            points[:, :2], points[:, 2], labels, pvalid, num_clusters)

    return DenoiseResult(
        points_dev=points,
        labels_dev=labels,
        n_points=n_points,
        num_clusters=num_clusters,
        stats=den_stats,
        cluster_table=cluster_table,
        frame_ids=ingested.frame_ids,
        timings=timer.report(),
    )


def run_denoising_pipeline(
    data_dir: Path,
    output_dir: Path,
    eps_space: float = 8.0,
    eps_time: float = 2.0,
    min_samples: int = 15,
    min_frames: int = 2,
    max_frames: int = 0,
    no_viz: bool = False,
    skip_gif: bool = True,
    intensity_threshold: float = 10.0,
    point_stride: int = 4,
    config: Optional[PipelineConfig] = None,
    verbose: bool = True,
    devices: int = 0,
    low_memory: bool = False,
    parse_workers: Optional[int] = None,
    checkpoint_dir: Optional[Path] = None,
    resume: bool = False,
    interrupt_after_cluster: bool = False,
) -> DenoiseResult:
    """Full denoising pipeline from a gain_XX tree to artifacts.

    ``devices`` > 1 shards the clustering over a frame-axis device mesh
    (:func:`denoise_frames_sharded`); 0/1 runs the single-chip engine.

    ``low_memory``/``parse_workers`` are the reference denoiser's
    --low-memory/--no-parallel parity controls
    (stdbscan_denoising_pipeline.py:1156-1159): host RAM is bounded by the
    streaming parse window either way (the TPU-design equivalence of the
    reference's free-and-reload), low_memory additionally frees the padded
    device ingest buffers after repack, and parse_workers=1 disables the
    parse thread pool (the ProcessPoolExecutor analog).

    ``checkpoint_dir`` persists the cluster stage once done (it is the
    denoiser's one whole-sequence stage; everything after it is a pure
    function of the artifact), and works with sharded runs too — the
    artifact is the gathered host-side result, identical either way.
    ``resume`` skips ingest + clustering by reloading it; downstream
    artifacts are byte-identical (tests/test_checkpoint.py).
    ``interrupt_after_cluster`` is the testing/ops preemption hook: raise
    right after the artifact lands, before any output is written."""
    cfg = config or PipelineConfig()
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    # the full parameter set the artifact's contents depend on: the cluster
    # params AND the ingest knobs (a resume with a different max_frames /
    # threshold / stride would silently re-emit the old run's outputs)
    params = (eps_space, eps_time, min_samples, min_frames,
              max_frames, intensity_threshold, point_stride)
    if resume and checkpoint_dir is None:
        raise ValueError("--resume requires --checkpoint-dir")

    def log(msg):
        if verbose:
            print(msg)

    log("=" * 60)
    log("ST-DBSCAN RADAR POINT CLOUD DENOISING PIPELINE (TPU)")
    log("=" * 60)

    if resume:
        # mirror run_tracking_pipeline's fallback: a preempted run may have
        # died before the artifact landed — run from scratch, don't crash
        if (Path(checkpoint_dir) / _ckpt.DENOISE_STAGE_FILE).exists():
            log("\n[1-4/5] Resuming from checkpoint (ingest + clustering "
                "skipped)...")
            result = _result_from_denoise_artifact(
                checkpoint_dir, params, StageTimer(verbose=verbose))
            _write_denoise_outputs(result, output_dir, no_viz, skip_gif, log)
            return result
        log(f"No checkpoint found at {checkpoint_dir}; running from scratch")

    log("\n[1/5] Discovering data files...")
    gain_files = discover_files(Path(data_dir))
    if not gain_files:
        raise FileNotFoundError(f"No gain folders found in {data_dir}")
    for gain, files in sorted(gain_files.items()):
        log(f"  Gain {gain}: {len(files)} files")

    log("\n[2/5] Grouping files into temporal frames...")
    frames = group_files_by_frame(gain_files, cfg.fusion.max_time_diff_ms)
    log(f"  Found {len(frames)} frames")
    if max_frames > 0:
        frames = frames[:max_frames]

    log("\n[3/5] Converting radar data to point clouds (device)...")
    loader = FrameBatchLoader(cfg, intensity_threshold=intensity_threshold,
                              point_stride=point_stride, verbose=verbose,
                              parse_workers=parse_workers)
    ingested = loader.load_sequence(frames)
    log(f"  Total points: {int(jnp.sum(ingested.count)):,}")

    log("\n[4/5] Applying ST-DBSCAN clustering for denoising...")
    log(f"  Parameters: eps_space={eps_space}, eps_time={eps_time}, "
        f"min_samples={min_samples}, min_frames={min_frames}")
    if devices and devices > 1:
        result = denoise_frames_sharded(
            ingested, eps_space, eps_time, min_samples, min_frames, cfg,
            n_devices=devices, verbose=verbose)
    else:
        result = denoise_frames(ingested, eps_space, eps_time, min_samples,
                                min_frames, cfg, verbose=verbose,
                                low_memory=low_memory)
    st = result.stats
    log(f"    Total points:      {st['total_points']:,}")
    log(f"    Noise (removed):   {st['noise_points']:,} "
        f"({st['noise_reduction_pct']:.1f}%)")
    log(f"    Signal (kept):     {st['signal_points']:,}")
    log(f"    Clusters found:    {st['num_clusters']}")

    if checkpoint_dir is not None:
        _save_denoise_stage(checkpoint_dir, result, params)
        log(f"  Checkpoint saved to: {checkpoint_dir}")
        if interrupt_after_cluster:
            raise _ckpt.CheckpointInterrupt(len(frames), checkpoint_dir)

    _write_denoise_outputs(result, output_dir, no_viz, skip_gif, log)
    return result


def _write_denoise_outputs(result: DenoiseResult, output_dir: Path,
                           no_viz: bool, skip_gif: bool, log) -> None:
    """Stage [5/5]: every denoiser artifact — binary PLYs, stats CSV,
    clusters CSV, plots/GIF — as a pure function of the clustered result
    (stdbscan_denoising_pipeline.py:986-1041), shared by the live and the
    resumed-from-checkpoint paths so resume is byte-identical."""
    st = result.stats
    log("\n[5/5] Saving results...")
    sig = result.signal_mask
    pts = result.points
    # binary PLYs: denoised (tab20 per-cluster colors) + raw (intensity)
    write_ply_arrays(
        output_dir / "denoised_point_cloud.ply",
        pts[sig, 0], pts[sig, 1], pts[sig, 2],
        label_palette_tab20(result.labels[sig]), use_binary=True)
    try:
        import matplotlib.pyplot as plt

        z_norm = np.clip(pts[:, 2] / 255.0, 0, 1)
        raw_colors = (plt.cm.viridis(z_norm)[:, :3] * 255).astype(np.uint8)
    except ModuleNotFoundError:  # pragma: no cover
        raw_colors = None
    write_ply_arrays(output_dir / "raw_point_cloud.ply",
                     pts[:, 0], pts[:, 1], pts[:, 2], raw_colors,
                     use_binary=True)

    import pandas as pd

    pd.DataFrame([st]).to_csv(output_dir / "denoising_stats.csv", index=False)
    if result.cluster_table:
        pd.DataFrame(result.cluster_table).to_csv(
            output_dir / "clusters.csv", index=False)

    if not no_viz:
        from ..viz.denoise_plots import render_denoise_outputs

        render_denoise_outputs(result, output_dir, skip_gif=skip_gif)

    log("\nPIPELINE COMPLETE")
    log(f"Results saved to: {output_dir}")
