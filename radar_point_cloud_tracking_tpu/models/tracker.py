"""Flagship temporal object-tracking pipeline (TPU).

End-to-end equivalent of the reference tracker script
(PointCloudWork/4_temporal_object_tracker.py:893-1038): discover -> group ->
fuse gains -> persistence land filter -> ST-DBSCAN -> Hungarian tracking ->
buoy/boat classification -> CSV artifacts + plots.  All numeric stages run
on device with static shapes; the host only parses CSVs, orchestrates, and
writes artifacts.
"""

from __future__ import annotations

import functools
import time as _time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..ops import grid as grid_ops
from ..ops.cluster_stats import per_frame_cluster_stats
from ..ops.geometry import PAD_COORD, compact_masked
from ..ops.neighbors import build_spatial_index
from ..ops.stdbscan import cluster_index, sym_engine_ok
from ..ops.tracking import (
    TYPE_BOAT,
    TYPE_BUOY,
    TYPE_UNKNOWN,
    TrackerState,
    grow_records,
    grow_state,
    init_tracker_state,
    pack_state_with,
    track_sequence,
    unpack_state,
)
from ..utils import checkpoint as _ckpt
from ..utils.profiling import StageTimer
from ..utils.timestamps import discover_files, group_files_by_frame
from ..utils.transfer import pull_labels, pull_prefix
from .ingest import FrameBatchLoader, IngestedFrames

__all__ = ["TrackingResult", "run_tracking_pipeline", "TrackingPipeline"]

_TYPE_NAME = {TYPE_UNKNOWN: "unknown", TYPE_BUOY: "buoy", TYPE_BOAT: "boat"}

# candidate-width (k_pad) per (capacity, tile, eps_space, eps_time,
# cell_size), process-wide: repeat runs (even across pipeline instances,
# e.g. bench warmup -> measured) build the spatial index without the
# candidate-width host sync; the true maximum rides the packed pull and
# triggers an exact rebuild when a cached hint is too small.  The eps/cell
# terms are in the key because they change the candidate geometry — an
# undersized stale hint is detected but costs a wasted cluster pass.
_KPAD_CACHE: Dict[Tuple[int, int, float, float, Optional[float]], int] = {}


@dataclass
class TrackingResult:
    """Everything the tracker pipeline produces, device-side + summaries.

    ``labels``/``points`` pull from device lazily (d2h transfers through the
    tunnel are expensive; many callers only need the track summaries)."""

    # repr=False on device-holding fields: dataclass __repr__ would otherwise
    # print the jax arrays, forcing the bulk d2h the lazy properties avoid
    ingested: IngestedFrames = field(repr=False)
    labels_dev: object = field(repr=False)  # (cap,) labels, tight buffer
    points_dev: object = field(
        repr=False)  # (cap, 6) x, y, intensity, frame_local, frame_id, gain
    n_points: int
    num_clusters: int
    state: TrackerState  # final tracker state (numpy leaves)
    records_dev: dict = field(
        repr=False)  # per-frame tracking records (device or numpy leaves)
    cluster_stats_dev: object = field(
        repr=False)  # per-frame compacted ClusterStats (device)
    land_cells: int = 0
    land_points_removed: int = 0
    timings: Dict[str, float] = field(default_factory=dict)
    _labels_np: Optional[np.ndarray] = field(default=None, repr=False)
    _points_np: Optional[np.ndarray] = field(default=None, repr=False)
    _records_np: Optional[dict] = field(default=None, repr=False)
    _cluster_stats_np: Optional[dict] = field(default=None, repr=False)

    @property
    def labels(self) -> np.ndarray:
        if self._labels_np is None:
            self._labels_np = pull_labels(self.labels_dev, self.n_points,
                                          self.num_clusters)
        return self._labels_np

    @property
    def points(self) -> np.ndarray:
        if self._points_np is None:
            self._points_np = pull_prefix(self.points_dev, self.n_points)
        return self._points_np

    @property
    def records(self) -> dict:
        if self._records_np is None:
            self._records_np = jax.tree_util.tree_map(np.asarray,
                                                      self.records_dev)
        return self._records_np

    @property
    def cluster_stats(self) -> dict:
        if self._cluster_stats_np is None:
            cs = self.cluster_stats_dev
            self._cluster_stats_np = {
                "centroids": np.asarray(cs["centroids"]),
                "valid": np.asarray(cs["valid"]),
                "label": np.asarray(cs["label"]),
                "num_points": np.asarray(cs["num_points"]),
                "mean_intensity": np.asarray(cs["mean_intensity"]),
            }
        return self._cluster_stats_np

    # -- summaries --------------------------------------------------------
    def objects_rows(self) -> List[dict]:
        st = self.state
        rows = []
        for slot in np.nonzero(st.active)[0]:
            vel_count = int(st.vel_count[slot])
            if vel_count >= 2:
                h = st.vel_ring.shape[1]
                k = min(vel_count, h)
                speeds = np.linalg.norm(st.vel_ring[slot], axis=-1)
                mask = np.arange(h) < k
                avg_vel = float(speeds[mask].mean())
            else:
                avg_vel = 0.0
            rows.append({
                "object_id": int(st.object_id[slot]),
                "object_type": _TYPE_NAME[int(st.type_code[slot])],
                "num_frames_seen": int(st.frames_seen[slot]),
                "first_frame": int(st.first_frame[slot]),
                "last_frame": int(st.last_seen[slot]),
                "avg_velocity": avg_vel,
                "final_x": float(st.last_pos[slot, 0]),
                "final_y": float(st.last_pos[slot, 1]),
            })
        rows.sort(key=lambda r: r["object_id"])
        return rows

    def trajectory_rows(self) -> List[dict]:
        st = self.state
        surviving = {int(st.object_id[s]): _TYPE_NAME[int(st.type_code[s])]
                     for s in np.nonzero(st.active)[0]}
        rows = []
        seen = self.records["seen"]
        oid = self.records["object_id"]
        pos = self.records["pos"]
        f, o = seen.shape
        for fi in range(f):
            fid = int(self.ingested.frame_ids[fi])
            for slot in range(o):
                if seen[fi, slot]:
                    obj = int(oid[fi, slot])
                    if obj in surviving:
                        rows.append({
                            "object_id": obj,
                            "object_type": surviving[obj],
                            "frame_id": fid,
                            "x": float(pos[fi, slot, 0]),
                            "y": float(pos[fi, slot, 1]),
                        })
        rows.sort(key=lambda r: (r["object_id"], r["frame_id"]))
        return rows

    def cluster_rows(self) -> List[dict]:
        cs = self.cluster_stats
        rows = []
        f, m = cs["valid"].shape
        for fi in range(f):
            fid = int(self.ingested.frame_ids[fi])
            for k in range(m):
                if cs["valid"][fi, k]:
                    rows.append({
                        "frame_id": fid,
                        "cluster_id": int(cs["label"][fi, k]),
                        "num_points": int(cs["num_points"][fi, k]),
                        "centroid_x": float(cs["centroids"][fi, k, 0]),
                        "centroid_y": float(cs["centroids"][fi, k, 1]),
                        "mean_intensity": float(cs["mean_intensity"][fi, k]),
                    })
        return rows

    def save_csvs(self, output_dir: Path) -> None:
        """tracked_objects.csv / trajectories.csv / clusters.csv with the
        reference's column sets (4_temporal_object_tracker.py:832-886)."""
        import pandas as pd

        output_dir = Path(output_dir)
        output_dir.mkdir(parents=True, exist_ok=True)
        pd.DataFrame(self.objects_rows(), columns=[
            "object_id", "object_type", "num_frames_seen", "first_frame",
            "last_frame", "avg_velocity", "final_x", "final_y",
        ]).to_csv(output_dir / "tracked_objects.csv", index=False)
        pd.DataFrame(self.trajectory_rows(), columns=[
            "object_id", "object_type", "frame_id", "x", "y",
        ]).to_csv(output_dir / "trajectories.csv", index=False)
        pd.DataFrame(self.cluster_rows(), columns=[
            "frame_id", "cluster_id", "num_points", "centroid_x",
            "centroid_y", "mean_intensity",
        ]).to_csv(output_dir / "clusters.csv", index=False)


# sharded candidate-width hints per (n_dev, f_pad, capacity, tile, eps);
# like _KPAD_CACHE, an undersized hint is detected in-program (the true
# maximum returns in stats['max_cand']) and triggers an exact retry
_SHARD_KPAD_CACHE: Dict[Tuple, int] = {}


@dataclass
class _ResumedSequence:
    """Minimal ingested-sequence stand-in for checkpoint resume: carries only
    what TrackingResult consumers read (frame ids + per-frame kept counts)."""

    frame_ids: np.ndarray
    timestamps_ms: np.ndarray
    count: np.ndarray
    num_frames: int


@functools.partial(jax.jit, static_argnames=("capacity",))
def _compact_sharded_result(xyi, gain, frame_ids, labels_fc, keep, capacity):
    """Device-side assembly of the sharded result's tight point buffer:
    [x, y, intensity, frame_local, frame_id, gain, label] compacted to the
    kept points in row-major (frame-major, slot) order."""
    f, c, _ = xyi.shape
    fl = jnp.repeat(jnp.arange(f, dtype=jnp.float32), c)
    fid_col = jnp.repeat(frame_ids.astype(jnp.float32), c)
    vals = jnp.concatenate([
        xyi.reshape(f * c, 3),
        fl[:, None], fid_col[:, None],
        gain.reshape(f * c).astype(jnp.float32)[:, None],
        labels_fc.reshape(f * c).astype(jnp.float32)[:, None],
    ], axis=-1)
    out, _ = compact_masked(vals, keep.reshape(-1), capacity)
    return out


@jax.jit
def _bounds(flat_xy, flat_valid):
    x = jnp.where(flat_valid, flat_xy[:, 0], jnp.inf)
    y = jnp.where(flat_valid, flat_xy[:, 1], jnp.inf)
    xm = jnp.where(flat_valid, flat_xy[:, 0], -jnp.inf)
    ym = jnp.where(flat_valid, flat_xy[:, 1], -jnp.inf)
    return jnp.stack([jnp.min(x), jnp.min(y), jnp.max(xm), jnp.max(ym)])


@functools.partial(jax.jit, static_argnames=("nx", "ny"))
def _land_keep(flat_xy, flat_int, flat_valid, x_edges, y_edges, nx, ny,
               num_frames, persistence, min_intensity):
    return grid_ops.land_filter_keep(
        flat_xy, flat_int, flat_valid, x_edges, y_edges, nx, ny,
        num_frames, persistence, min_intensity)


def _quarter_pow2(n: int, floor: int = 1024) -> int:
    """Smallest quarter-power-of-two bucket >= n (1024-aligned).

    Full pow2 rounding wastes up to ~2x buffer (9.47M pts -> 16.8M slots);
    quarter steps cap padding at 25% while keeping the set of compiled
    program shapes small.
    """
    n = max(n, 1)
    if n <= floor:
        return floor
    half = 1 << ((n - 1).bit_length() - 1)
    step = max(half // 4, 1024)
    return half + -(-(n - half) // step) * step


@functools.partial(jax.jit, static_argnames=("capacity",))
def _flatten_and_compact(xyi, gain, count, frame_ids, keep, capacity):
    """Flatten (F, C) frame buffers into one tight (capacity, 6) buffer:
    columns x, y, intensity, local frame index, frame id, gain.

    The per-frame valid set is a PREFIX (slot < count), so no sort is
    needed: output position i maps back to its frame by one searchsorted
    over the frame offsets and to its slot by subtraction, then a single
    gather pulls the values.  This replaces a 13M-element boolean argsort
    (the generic compact_masked path) with pure index arithmetic; `keep`
    is accepted for signature compatibility but the prefix structure is
    what is used.
    """
    f, c, _ = xyi.shape
    del keep
    offsets = jnp.concatenate([
        jnp.zeros((1,), jnp.int32), jnp.cumsum(count.astype(jnp.int32))])
    total = jnp.minimum(offsets[-1], capacity)
    i = jnp.arange(capacity, dtype=jnp.int32)
    fi = jnp.clip(
        jnp.searchsorted(offsets, i, side="right", method="sort") - 1,
        0, f - 1)
    src = fi * c + (i - offsets[fi])
    src = jnp.clip(src, 0, f * c - 1)
    pts = xyi.reshape(f * c, 3)[src]
    out = jnp.concatenate([
        pts,
        fi.astype(jnp.float32)[:, None],
        jnp.asarray(frame_ids, jnp.float32)[fi][:, None],
        gain.reshape(f * c)[src].astype(jnp.float32)[:, None],
    ], axis=-1)
    out = jnp.where((i < total)[:, None], out, PAD_COORD)
    return out, total


class TrackingPipeline:
    """Programmatic pipeline object (the CLI and bench drive this)."""

    def __init__(self, config: Optional[PipelineConfig] = None,
                 verbose: bool = True) -> None:
        self.config = config or PipelineConfig()
        self.verbose = verbose
        # extra values appended to the cluster-stage checkpoint's params
        # tuple (run_tracking_pipeline sets the ingest knobs here so a
        # resume with a different max_frames / threshold / stride fails
        # loudly instead of re-emitting the old run's outputs)
        self.checkpoint_ingest_params: tuple = ()

    def _log(self, msg: str) -> None:
        if self.verbose:
            print(msg)

    def ingest_and_run(
        self,
        frame_files: List[Dict[int, Path]],
        loader: FrameBatchLoader,
        eps_space: float = 8.0,
        eps_time: float = 2.0,
        min_samples: int = 15,
        skip_land_filter: bool = False,
        checkpoint_dir: Optional[Path] = None,
        checkpoint_every: int = 0,
        interrupt_after_frames: int = 0,
    ) -> TrackingResult:
        """Parse + ingest + full pipeline, choosing the host land prefilter
        when available.

        With the sparse native ingest and ``land_filter.host_prefilter``,
        land verdicts are decided on the host straight from the parse output
        (bit-identical to the device path) so filtered points never cross
        the host->device wire; otherwise the device land stage runs inside
        :meth:`run_on_frames`.  ``timings['ingest']`` records the parse +
        transfer wall time either way.
        """
        lf = self.config.land_filter
        sharded = self.config.device.num_devices > 1
        if interrupt_after_frames and sharded:
            raise ValueError(
                "--interrupt-after-frames needs the chunked single-chip "
                "tracking scan; the sharded pipeline runs clustering + "
                "tracking as ONE program with no mid-scan snapshot point "
                "(drop --devices or --interrupt-after-frames)")
        use_prefilter = (not skip_land_filter and lf.enabled
                         and lf.host_prefilter and loader.sparse)
        run = (self.run_on_frames_sharded if sharded else
               functools.partial(self.run_on_frames,
                                 quiet_land_skip=use_prefilter,
                                 checkpoint_dir=checkpoint_dir,
                                 checkpoint_every=checkpoint_every,
                                 interrupt_after_frames=interrupt_after_frames))
        t0 = _time.perf_counter()
        if use_prefilter:
            ingested, info = loader.load_sequence_land_filtered(
                frame_files,
                grid_resolution_m=lf.grid_resolution_m,
                persistence_threshold=lf.persistence_threshold,
                min_intensity=lf.min_intensity,
                min_frames_required=lf.min_frames_required)
            t_ingest = _time.perf_counter() - t0
            result = run(
                ingested, eps_space=eps_space, eps_time=eps_time,
                min_samples=min_samples, skip_land_filter=True)
            result.land_cells = info["land_cells"]
            result.land_points_removed = info["points_removed"]
            for k in ("t_parse", "t_grid", "t_pack"):
                if k in info:
                    result.timings[f"ingest_{k[2:]}"] = info[k]
        else:
            ingested = loader.load_sequence(frame_files)
            t_ingest = _time.perf_counter() - t0
            result = run(
                ingested, eps_space=eps_space, eps_time=eps_time,
                min_samples=min_samples, skip_land_filter=skip_land_filter)
        result.timings = {"ingest": t_ingest, **result.timings}
        if checkpoint_dir is not None and sharded:
            # the sharded program computes clustering + tracking in ONE
            # dispatch, so the snapshot pair lands once, when it completes:
            # the cluster-stage artifact (gathered points/labels — identical
            # to the single-chip stage, tests/test_parallel.py) plus the
            # final tracker state at cursor == num_frames.  A later --resume
            # run (any device count) re-emits every artifact byte-
            # identically without re-clustering or re-tracking.
            # checkpoint_every has no effect here: there is no mid-scan
            # snapshot point inside one compiled program.
            f = ingested.num_frames
            self._save_cluster_stage(
                checkpoint_dir, result.points_dev, result.labels_dev,
                result.n_points, result.num_clusters, ingested.frame_ids,
                f, result.land_cells, result.land_points_removed,
                (float(eps_space), float(eps_time), float(min_samples))
                + tuple(self.checkpoint_ingest_params))
            _ckpt.save_tracker_snapshot(
                Path(checkpoint_dir),
                jax.tree_util.tree_map(np.asarray, result.state), f,
                jax.tree_util.tree_map(np.asarray, result.records_dev))
        return result

    def run_on_frames_sharded(
        self,
        ingested: IngestedFrames,
        eps_space: float = 8.0,
        eps_time: float = 2.0,
        min_samples: int = 15,
        skip_land_filter: bool = False,
        n_devices: int = 0,
    ) -> TrackingResult:
        """Multi-chip path: the full pipeline as ONE sharded program over a
        frame-axis device mesh (parallel/pipeline.py).

        Frame count pads to a multiple of the mesh size with empty frames
        carrying the last real frame id (a no-op for the tracker, sliced off
        the records).  Capacity overflows (cluster label table, per-frame
        cluster slots, object table) grow-and-retry like the single-chip
        path — results are never silently truncated.  Exact-match to the
        single-chip engine is covered by tests/test_parallel.py.
        """
        from ..parallel.mesh import make_frames_mesh
        from ..parallel.pipeline import sharded_tracking_step

        cfg = self.config
        timer = StageTimer(verbose=self.verbose)
        devices = jax.devices()
        n_dev = n_devices or cfg.device.num_devices or len(devices)
        if len(devices) < n_dev:
            raise RuntimeError(
                f"sharded pipeline needs {n_dev} devices, have "
                f"{len(devices)}")

        f = ingested.num_frames
        c = ingested.capacity
        # the single-hop ppermute halo needs >= halo_k frames per shard
        halo_k = max(1, int(np.floor(eps_time)))
        max_shards = max(1, f // halo_k)
        if n_dev > max_shards:
            self._log(f"  [mesh] {f} frames support at most {max_shards} "
                      f"shards at eps_time={eps_time}; using {max_shards} "
                      f"of {n_dev} devices")
            n_dev = max_shards
        mesh = make_frames_mesh(n_dev)
        f_pad = -(-f // n_dev) * n_dev
        xyi = ingested.xyi
        gain = ingested.gain
        count = ingested.count
        frame_ids = jnp.asarray(ingested.frame_ids)
        if f_pad > f:
            from ..ops.geometry import PAD_COORD

            xyi = jnp.concatenate([
                xyi, jnp.full((f_pad - f, c, 3), PAD_COORD, xyi.dtype)])
            gain = jnp.concatenate([
                gain, jnp.zeros((f_pad - f, c), gain.dtype)])
            count = jnp.concatenate([
                count, jnp.zeros((f_pad - f,), count.dtype)])
            frame_ids = jnp.concatenate([
                frame_ids,
                jnp.full((f_pad - f,), ingested.frame_ids[-1], jnp.int32)])

        lf = cfg.land_filter
        use_land = not skip_land_filter and f > lf.min_frames_required
        land_args = ()
        land_shape = None
        if use_land:
            with timer.stage("land_edges"):
                valid0 = ingested.valid_mask().reshape(-1)
                bounds = _bounds(ingested.xyi.reshape(f * c, 3)[:, :2], valid0)
                x_min, y_min, x_max, y_max = [float(b) for b in bounds]
                x_edges = grid_ops.make_edges(x_min, x_max,
                                              lf.grid_resolution_m)
                y_edges = grid_ops.make_edges(y_min, y_max,
                                              lf.grid_resolution_m)
                land_shape = (len(x_edges) - 1, len(y_edges) - 1)
                # (2, E) [hi, lo] planes: digitize verdicts are bit-exact
                # to the host's float64 np.digitize (ops/grid.py)
                land_args = (jnp.asarray(grid_ops.edges_hilo(x_edges)),
                             jnp.asarray(grid_ops.edges_hilo(y_edges)))

        label_cap = 1024
        max_c = cfg.tracking.max_clusters_per_frame
        max_obj = cfg.tracking.max_objects
        tile_sz = cfg.clustering.tile_size
        kk = (n_dev, f_pad, c, tile_sz, float(eps_space), float(eps_time))
        k_pad = _SHARD_KPAD_CACHE.get(kk, 64)
        with timer.stage("sharded_step"):
            while True:
                step = sharded_tracking_step(
                    mesh, eps_space, eps_time, min_samples,
                    land_grid_shape=land_shape,
                    land_persistence=lf.persistence_threshold,
                    land_min_intensity=lf.min_intensity,
                    num_frames_real=f,
                    tile=tile_sz,
                    max_sweeps=cfg.clustering.max_label_sweeps,
                    label_cap=label_cap, max_clusters=max_c,
                    max_objects=max_obj,
                    history=cfg.tracking.motion_history_frames,
                    max_missed=cfg.tracking.max_missed_frames,
                    max_dist=cfg.tracking.max_association_distance,
                    stationary=cfg.tracking.stationary_velocity_threshold,
                    k_pad=k_pad)
                labels_fc, num_clusters, converged, state, records, stats = \
                    step(xyi, count, frame_ids, *land_args)
                # the bounded candidate table must cover the true maximum
                # FIRST: an overflowed table means this run's labels (and
                # every count derived from them) are invalid
                max_cand = int(stats["max_cand"])
                if max_cand > k_pad:
                    k_pad = 1 << (max_cand - 1).bit_length()
                    self._log(f"  [capacity] candidate width {max_cand} "
                              f"exceeds k_pad; growing to {k_pad}")
                    _SHARD_KPAD_CACHE[kk] = k_pad
                    continue
                _SHARD_KPAD_CACHE[kk] = k_pad
                num_clusters = int(num_clusters)
                if not bool(converged):
                    raise RuntimeError(
                        "distributed label propagation hit max_label_sweeps "
                        f"({cfg.clustering.max_label_sweeps}) before "
                        "converging; raise clustering.max_label_sweeps")
                grown = False
                if int(stats["label_overflow"]) > 0 or num_clusters > label_cap:
                    label_cap = 1 << max(num_clusters - 1, 1).bit_length()
                    self._log(f"  [capacity] cluster label table overflow; "
                              f"growing label_cap to {label_cap}")
                    grown = True
                needed = int(jnp.max(stats["present_count"]))
                if needed > max_c:
                    max_c = 1 << (needed - 1).bit_length()
                    self._log(f"  [capacity] {needed} clusters in one frame; "
                              f"growing max_clusters to {max_c}")
                    grown = True
                if int(jnp.sum(records["dropped"])) > 0:
                    max_obj *= 2
                    self._log(f"  [capacity] object table full; growing "
                              f"max_objects to {max_obj}")
                    grown = True
                if not grown:
                    break

        # Lazy gather: compact labels + point columns into one tight device
        # buffer (same row-major kept order as the single-chip path); only
        # the tiny per-frame kept counts and the final tracker state cross
        # to the host here.  The bulky labels/points pull on property
        # access exactly like run_on_frames' result (callers that only
        # consume CSV summaries never transfer the point buffer).
        with timer.stage("gather"):
            kept_count = np.asarray(stats["kept_count"])[:f]
            n_points = int(kept_count.sum())
            cap = _quarter_pow2(n_points)
            compacted = _compact_sharded_result(
                ingested.xyi, ingested.gain,
                jnp.asarray(ingested.frame_ids),
                labels_fc[:f], stats["keep"][:f], cap)
            points_dev = compacted[:, :6]
            # cluster ids < label_cap << 2^24, so the float32 ride through
            # the single compaction is exact
            labels_dev = compacted[:, 6].astype(jnp.int32)
            state = jax.tree_util.tree_map(np.asarray, state)
            records_dev = jax.tree_util.tree_map(
                lambda a: a[:f] if getattr(a, "ndim", 0) else a, records)

        raw_total = (int(ingested.count_host.sum())
                     if ingested.count_host is not None
                     else int(jnp.sum(ingested.count)))
        return TrackingResult(
            ingested=ingested,
            labels_dev=labels_dev,
            points_dev=points_dev,
            n_points=n_points,
            num_clusters=num_clusters,
            state=state,
            records_dev=records_dev,
            cluster_stats_dev={
                "centroids": stats["centroids"][:f],
                "valid": stats["valid"][:f],
                "label": stats["label"][:f],
                "num_points": stats["num_points"][:f],
                "mean_intensity": stats["mean_intensity"][:f],
            },
            land_cells=int(stats["land_cells"]),
            land_points_removed=raw_total - n_points if use_land else 0,
            timings=timer.report(),
        )

    # ---- checkpoint/resume (SURVEY §5: stage-artifact model + tracker-
    # state snapshot).  Clustering is whole-sequence (eps_time couples
    # frames), so it checkpoints as ONE artifact when done; the tracking
    # scan is Markovian over absolute frame ids, so it checkpoints every
    # ``checkpoint_every`` frames and resumes bit-exactly. ------------------

    def _resolve_cluster_stats(self, points, labels, pvalid, num_clusters,
                               f: int):
        """Per-frame cluster stats with the label/cluster capacities
        resolved by grow-and-retry (same discipline as run_on_frames)."""
        cfg = self.config
        label_cap = 1 << max(6, (max(num_clusters, 1) - 1).bit_length())
        max_c = cfg.tracking.max_clusters_per_frame
        while True:
            cs = per_frame_cluster_stats(
                points[:, :2], points[:, 2],
                points[:, 3].astype(jnp.int32), labels, pvalid,
                num_frames=f, label_cap=label_cap, max_clusters=max_c)
            needed = int(jnp.max(cs.present_count))
            if needed > max_c:
                self._log(f"  [capacity] {needed} clusters in one frame "
                          f"exceeds max_clusters_per_frame={max_c}; "
                          "growing and recomputing")
                max_c = 1 << (needed - 1).bit_length()
                continue
            return cs

    def _track_chunked(
        self,
        cs,
        frame_ids: np.ndarray,
        f: int,
        checkpoint_dir: Optional[Path],
        checkpoint_every: int,
        interrupt_after_frames: int = 0,
        snapshot=None,
    ):
        """Tracking scan in checkpoint_every-frame chunks with carried state.

        Chunked == single-scan bit-exact (the per-step body is identical and
        the state is the full Markov carry; tests/test_checkpoint.py).  An
        object-table overflow re-runs only the current chunk with a grown
        table: earlier chunks never dropped a creation, and slot assignment
        is padding-invariant (ops/tracking.py grow_state), so their records
        stay exact after padding."""
        cfg = self.config
        h = cfg.tracking.motion_history_frames
        if snapshot is not None:
            state, cursor, rec_prev = snapshot
            max_obj = int(state.active.shape[0])
            parts = [rec_prev] if cursor > 0 else []
            self._log(f"  Resuming tracking at frame {cursor}/{f} "
                      f"(object table {max_obj})")
        else:
            max_obj = cfg.tracking.max_objects
            state = init_tracker_state(max_obj, h)
            cursor, parts = 0, []
        every = checkpoint_every if checkpoint_every > 0 else f
        fid_dev = jnp.asarray(frame_ids, jnp.int32)
        records = parts[0] if parts else None
        while cursor < f:
            end = min(cursor + every, f)
            while True:
                st2, rec = track_sequence(
                    cs.centroids[cursor:end], cs.valid[cursor:end],
                    fid_dev[cursor:end], max_objects=max_obj,
                    history=h, max_missed=cfg.tracking.max_missed_frames,
                    max_dist=cfg.tracking.max_association_distance,
                    stationary=cfg.tracking.stationary_velocity_threshold,
                    init_state=state)
                n_dropped = int(jnp.sum(rec["dropped"]))
                if n_dropped > 0:
                    self._log(f"  [capacity] object table full: {n_dropped} "
                              f"creation(s) dropped at max_objects="
                              f"{max_obj}; growing and re-running the chunk")
                    max_obj *= 2
                    state = grow_state(state, max_obj)
                    parts = [grow_records(p, max_obj) for p in parts]
                    continue
                break
            state = st2
            parts.append(jax.tree_util.tree_map(np.asarray, rec))
            cursor = end
            records = {k: np.concatenate([p[k] for p in parts], axis=0)
                       for k in parts[0]}
            if checkpoint_dir is not None:
                _ckpt.save_tracker_snapshot(
                    Path(checkpoint_dir),
                    jax.tree_util.tree_map(np.asarray, state),
                    cursor, records)
            if (interrupt_after_frames and cursor >= interrupt_after_frames
                    and cursor < f):
                raise _ckpt.CheckpointInterrupt(cursor, checkpoint_dir)
        state_np = jax.tree_util.tree_map(np.asarray, state)
        return state_np, records

    def _save_cluster_stage(self, checkpoint_dir: Path, points, labels,
                            n_points: int, num_clusters: int,
                            frame_ids, f: int, land_cells: int,
                            removed: int, params: tuple) -> None:
        _ckpt.save_stage_artifact(
            Path(checkpoint_dir) / _ckpt.CLUSTER_STAGE_FILE,
            points=np.asarray(points[:n_points]),
            labels=np.asarray(labels[:n_points]),
            num_clusters=np.asarray(num_clusters, np.int64),
            frame_ids=np.asarray(frame_ids, np.int32),
            num_frames=np.asarray(f, np.int64),
            land_cells=np.asarray(land_cells, np.int64),
            land_points_removed=np.asarray(removed, np.int64),
            params=np.asarray(params, np.float64))

    def resume_from_checkpoint(
        self,
        checkpoint_dir: Path,
        checkpoint_every: int = 0,
        interrupt_after_frames: int = 0,
        expected_params: Optional[tuple] = None,
    ) -> TrackingResult:
        """Resume a checkpointed tracking run: load the cluster-stage
        artifact (skipping ingest + clustering), restore the latest tracker
        snapshot if one exists, finish the tracking scan, and return a
        TrackingResult whose CSV artifacts are byte-identical to an
        uninterrupted run (tests/test_checkpoint.py)."""
        checkpoint_dir = Path(checkpoint_dir)
        timer = StageTimer(verbose=self.verbose)
        with timer.stage("load_checkpoint"):
            art = _ckpt.load_stage_artifact(
                checkpoint_dir / _ckpt.CLUSTER_STAGE_FILE)
            if expected_params is not None:
                _ckpt.check_stage_params(
                    checkpoint_dir, art, expected_params,
                    "(eps_space, eps_time, min_samples, max_frames, "
                    "intensity_threshold, point_stride)")
            pts_np = art["points"]
            num_clusters = int(art["num_clusters"])
            f = int(art["num_frames"])
            frame_ids = np.asarray(art["frame_ids"], np.int32)
            capacity = _quarter_pow2(int(pts_np.shape[0]))
            points, labels, n_points = _ckpt.rebuild_stage_points_labels(
                art, capacity)
            pvalid = jnp.arange(capacity) < n_points
            snapshot = _ckpt.load_tracker_snapshot(checkpoint_dir)

        with timer.stage("tracking"):
            cs = self._resolve_cluster_stats(points, labels, pvalid,
                                             num_clusters, f)
            state, records = self._track_chunked(
                cs, frame_ids, f, checkpoint_dir, checkpoint_every,
                interrupt_after_frames, snapshot=snapshot)

        counts = np.bincount(pts_np[:, 3].astype(np.int64), minlength=f)
        ingested = _ResumedSequence(
            frame_ids=frame_ids,
            timestamps_ms=np.zeros((f,), np.int64),
            count=counts.astype(np.int64),
            num_frames=f,
        )
        return TrackingResult(
            ingested=ingested,
            labels_dev=labels,
            points_dev=points,
            n_points=n_points,
            num_clusters=num_clusters,
            state=state,
            records_dev=records,
            cluster_stats_dev={
                "centroids": cs.centroids,
                "valid": cs.valid,
                "label": cs.label,
                "num_points": cs.num_points,
                "mean_intensity": cs.mean_intensity,
            },
            land_cells=int(art["land_cells"]),
            land_points_removed=int(art["land_points_removed"]),
            timings=timer.report(),
        )

    def run_on_frames(
        self,
        ingested: IngestedFrames,
        eps_space: float = 8.0,
        eps_time: float = 2.0,
        min_samples: int = 15,
        skip_land_filter: bool = False,
        quiet_land_skip: bool = False,
        checkpoint_dir: Optional[Path] = None,
        checkpoint_every: int = 0,
        interrupt_after_frames: int = 0,
    ) -> TrackingResult:
        cfg = self.config
        timer = StageTimer(verbose=self.verbose)
        f = ingested.num_frames
        c = ingested.capacity

        # ---- tight pre-filter buffer ------------------------------------
        # compact the padded frame buffers down to actual points FIRST so
        # every later scatter/sweep works on ~N instead of F*C padded slots
        with timer.stage("repack"):
            # sizing needs no device sync when the ingest path kept a host
            # copy of the per-frame counts (~30 ms saved per run)
            raw_total = (int(ingested.count_host.sum())
                         if ingested.count_host is not None
                         else int(jnp.sum(ingested.count)))
            cap0 = _quarter_pow2(raw_total)
            points0, n_raw = _flatten_and_compact(
                ingested.xyi, ingested.gain, ingested.count,
                jnp.asarray(ingested.frame_ids),
                ingested.valid_mask().reshape(f * c), cap0)

        # ---- land filter --------------------------------------------------
        land_cells = 0
        removed = 0
        lf = cfg.land_filter
        valid0 = jnp.arange(cap0) < n_raw
        if not skip_land_filter and f > lf.min_frames_required:
            with timer.stage("land_filter"):
                bounds = _bounds(points0[:, :2], valid0)
                x_min, y_min, x_max, y_max = [float(b) for b in bounds]
                x_edges = grid_ops.make_edges(x_min, x_max, lf.grid_resolution_m)
                y_edges = grid_ops.make_edges(y_min, y_max, lf.grid_resolution_m)
                nx, ny = len(x_edges) - 1, len(y_edges) - 1
                keep, n_land = _land_keep(
                    points0[:, :2], points0[:, 2], valid0,
                    jnp.asarray(grid_ops.edges_hilo(x_edges)),
                    jnp.asarray(grid_ops.edges_hilo(y_edges)), nx, ny,
                    jnp.int32(f), jnp.float32(lf.persistence_threshold),
                    jnp.float32(lf.min_intensity))
                total = int(jnp.sum(keep))  # sync: sizes the cluster buffer
                if self.verbose:
                    land_cells = int(n_land)
                    removed = raw_total - total
                    self._log(f"  Identified {land_cells} land cells; removed "
                              f"{removed:,} land points")
                capacity = _quarter_pow2(total)
                points, n_points = compact_masked(points0, keep, capacity)
        else:
            if not quiet_land_skip:
                self._log("  Skipping land filter")
            points, n_points, capacity = points0, n_raw, cap0

        with timer.stage("st_dbscan"):
            pvalid = jnp.arange(capacity) < n_points  # device scalar compare
            use_pallas = (cfg.device.use_pallas
                          and jax.default_backend() == "tpu")
            tile_sz = cfg.clustering.tile_size
            sym = use_pallas and sym_engine_ok(tile=tile_sz)
            # with the symmetric engine live every sweep in this program
            # runs on the pair list; the directed candidate table is never
            # read, so skip its build (and the k_pad hint discipline)
            ck = (int(capacity), tile_sz, float(eps_space), float(eps_time),
                  cfg.clustering.cell_size)
            hints = _KPAD_CACHE.get(ck)
            k_hint, p_hint = hints if hints else (None, None)
            if not p_hint:
                p_hint = None
            if not k_hint:
                k_hint = None
            index = build_spatial_index(
                points[:, :2], points[:, 4], pvalid, eps_space, eps_time,
                tile=tile_sz, cell_size=cfg.clustering.cell_size,
                k_pad=None if sym else k_hint,
                pairs=sym, p_pad=p_hint, directed=not sym)
            while True:
                labels, num_clusters = cluster_index(
                    index, jnp.float32(eps_space), jnp.float32(eps_time),
                    int(min_samples), 1, 0, "always",
                    int(cfg.clustering.max_label_sweeps),
                    use_pallas=use_pallas)
                # one packed pull (each d2h costs ~30 ms flat); the true
                # candidate-width maximum (directed builds) and unordered
                # pair count (symmetric builds) ride along to validate hints
                true_pairs = (index.pair_count if index.pair_count
                              is not None else jnp.int32(0))
                true_cand = (jnp.max(index.cand_count)
                             if index.cand_count is not None
                             else jnp.int32(0))
                trip = np.asarray(jnp.stack(
                    [jnp.asarray(num_clusters, jnp.int32),
                     jnp.asarray(n_points, jnp.int32),
                     true_cand.astype(jnp.int32),
                     jnp.asarray(true_pairs, jnp.int32)]))
                max_cand, n_pairs = int(trip[2]), int(trip[3])
                overflow = (index.cand_idx is not None and k_hint is not None
                            and max_cand > index.cand_idx.shape[1])
                if (not overflow and index.pair_a is not None
                        and n_pairs > index.pair_a.shape[0]):
                    overflow = True
                if overflow:
                    self._log(f"  [capacity] candidate width {max_cand} / "
                              f"pair count {n_pairs} exceeds cached hints "
                              f"{hints}; rebuilding index exactly")
                    k_hint = p_hint = None
                    index = build_spatial_index(
                        points[:, :2], points[:, 4], pvalid, eps_space,
                        eps_time, tile=tile_sz,
                        cell_size=cfg.clustering.cell_size,
                        pairs=sym, directed=not sym)
                    continue
                break
            from ..ops.neighbors import quarter_pow2_bucket

            if index.cand_idx is not None:
                # pow2 buckets keep the compiled shapes stable across runs
                kp = 1
                while kp < max(max_cand, 1):
                    kp *= 2
            else:
                # directed table wasn't built (symmetric run): keep whatever
                # hint a directed run recorded; 0 = unknown, which makes the
                # next directed run take the single-sync exact path instead
                # of a guaranteed-overflow guess
                kp = hints[0] if hints else 0
            if index.pair_a is not None:
                pp = quarter_pow2_bucket(n_pairs)
            else:
                # symmetric discipline for the pair hint (non-pallas run)
                pp = hints[1] if hints else 0
            _KPAD_CACHE[ck] = (kp, pp)
            num_clusters, n_points = int(trip[0]), int(trip[1])
            self._log(f"  Found {num_clusters} clusters over {n_points:,} points")

        if checkpoint_dir is not None:
            # stage-artifact checkpoint: the global cluster stage is done,
            # so a killed-and-resumed run never re-ingests or re-clusters
            with timer.stage("checkpoint_cluster"):
                self._save_cluster_stage(
                    checkpoint_dir, points, labels, n_points, num_clusters,
                    ingested.frame_ids, f, land_cells, removed,
                    (float(eps_space), float(eps_time), float(min_samples))
                + tuple(self.checkpoint_ingest_params))
            with timer.stage("tracking"):
                cs = self._resolve_cluster_stats(
                    points, labels, pvalid, num_clusters, f)
                state, records = self._track_chunked(
                    cs, np.asarray(ingested.frame_ids), f, checkpoint_dir,
                    checkpoint_every, interrupt_after_frames)
            return TrackingResult(
                ingested=ingested,
                labels_dev=labels,
                points_dev=points,
                n_points=n_points,
                num_clusters=num_clusters,
                state=state,
                records_dev=records,
                cluster_stats_dev={
                    "centroids": cs.centroids,
                    "valid": cs.valid,
                    "label": cs.label,
                    "num_points": cs.num_points,
                    "mean_intensity": cs.mean_intensity,
                },
                land_cells=land_cells,
                land_points_removed=removed,
                timings=timer.report(),
            )

        # ---- per-frame cluster stats + tracking (one stage: the stats
        # program and the tracking scan dispatch back-to-back) ------------
        # capacities grow-and-retry on overflow: the reference tracker is
        # unbounded, so a saturated fixed table must never silently drop
        # clusters/objects (it would quietly break exactness).  Both
        # overflow counters and the full final state ride ONE packed d2h
        # (each transfer costs ~30 ms flat; the ten state leaves pulled
        # separately cost ~0.3 s).  The bulky per-frame records/cluster
        # tables stay on device and pull lazily — only artifact writers
        # and plots need them.
        with timer.stage("tracking"):
            label_cap = 1 << max(6, (max(num_clusters, 1) - 1).bit_length())
            max_c = cfg.tracking.max_clusters_per_frame
            max_obj = cfg.tracking.max_objects
            while True:
                cs = per_frame_cluster_stats(
                    points[:, :2], points[:, 2],
                    points[:, 3].astype(jnp.int32), labels, pvalid,
                    num_frames=f, label_cap=label_cap, max_clusters=max_c)
                state, records = track_sequence(
                    cs.centroids, cs.valid, jnp.asarray(ingested.frame_ids),
                    max_objects=max_obj,
                    history=cfg.tracking.motion_history_frames,
                    max_missed=cfg.tracking.max_missed_frames,
                    max_dist=cfg.tracking.max_association_distance,
                    stationary=cfg.tracking.stationary_velocity_threshold)
                packed = np.asarray(pack_state_with(
                    state,
                    jnp.stack([jnp.sum(records["dropped"]),
                               jnp.max(cs.present_count)]).astype(jnp.int32)))
                extra, state_np = unpack_state(
                    packed, max_obj, cfg.tracking.motion_history_frames, 2)
                n_dropped, needed = int(extra[0]), int(extra[1])
                if needed > max_c:
                    self._log(f"  [capacity] {needed} clusters in one frame "
                              f"exceeds max_clusters_per_frame={max_c}; "
                              "growing and recomputing")
                    max_c = 1 << (needed - 1).bit_length()
                    continue
                if n_dropped > 0:
                    self._log(f"  [capacity] object table full: {n_dropped} "
                              f"creation(s) dropped at max_objects={max_obj}; "
                              "growing and re-tracking")
                    max_obj *= 2
                    continue
                state = state_np
                break
            centroids, cvalid, clabel, cnum, cmi = (
                cs.centroids, cs.valid, cs.label, cs.num_points,
                cs.mean_intensity)

        return TrackingResult(
            ingested=ingested,
            labels_dev=labels,
            points_dev=points,
            n_points=n_points,
            num_clusters=num_clusters,
            state=state,
            records_dev=records,
            cluster_stats_dev={
                "centroids": centroids,
                "valid": cvalid,
                "label": clabel,
                "num_points": cnum,
                "mean_intensity": cmi,
            },
            land_cells=land_cells,
            land_points_removed=removed,
            timings=timer.report(),
        )


def run_tracking_pipeline(
    data_dir: Path,
    output_dir: Path,
    max_frames: int = 0,
    skip_land_filter: bool = False,
    visualize: bool = True,
    eps_space: float = 8.0,
    eps_time: float = 2.0,
    min_samples: int = 15,
    intensity_threshold: float = 10.0,
    point_stride: int = 4,
    config: Optional[PipelineConfig] = None,
    verbose: bool = True,
    checkpoint_dir: Optional[Path] = None,
    checkpoint_every: int = 0,
    resume: bool = False,
    interrupt_after_frames: int = 0,
    parse_workers: Optional[int] = None,
) -> TrackingResult:
    """Full tracker pipeline from a gain_XX directory tree to artifacts.

    ``checkpoint_dir`` enables the stage-artifact + tracker-snapshot
    checkpoints (utils/checkpoint.py); ``resume`` restarts from them,
    skipping ingest + clustering and any already-tracked frames, with
    byte-identical CSV artifacts.  ``interrupt_after_frames`` simulates a
    preemption right after the snapshot covering that frame lands (testing
    and ops drills)."""
    config = config or PipelineConfig()
    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    pipe = TrackingPipeline(config, verbose=verbose)
    # the artifact's contents also depend on these ingest knobs; save and
    # validate them so a resume under different settings fails loudly
    ingest_params = (float(max_frames), float(intensity_threshold),
                     float(point_stride))
    pipe.checkpoint_ingest_params = ingest_params

    if resume:
        if checkpoint_dir is None:
            raise ValueError("--resume requires --checkpoint-dir")
        art = Path(checkpoint_dir) / _ckpt.CLUSTER_STAGE_FILE
        if art.exists():
            pipe._log("=" * 60)
            pipe._log("TEMPORAL OBJECT TRACKING PIPELINE (TPU) — RESUME")
            pipe._log("=" * 60)
            result = pipe.resume_from_checkpoint(
                checkpoint_dir, checkpoint_every, interrupt_after_frames,
                expected_params=(eps_space, eps_time, min_samples)
                + ingest_params)
            result.save_csvs(output_dir)
            pipe._log(f"\nSaved CSV artifacts to {output_dir}")
            if visualize:
                from ..viz.tracking_plots import render_tracking_outputs

                render_tracking_outputs(result, output_dir, config)
            return result
        pipe._log(f"No checkpoint found at {checkpoint_dir}; "
                  "running from scratch")

    pipe._log("=" * 60)
    pipe._log("TEMPORAL OBJECT TRACKING PIPELINE (TPU)")
    pipe._log("=" * 60)

    pipe._log("\n[1/6] Discovering data files...")
    files_by_gain = discover_files(Path(data_dir))
    if not files_by_gain:
        raise FileNotFoundError(f"No valid data files found in {data_dir}")
    for gain, files in sorted(files_by_gain.items()):
        pipe._log(f"  Gain {gain}: {len(files)} files")

    pipe._log("\n[2/6] Grouping files into temporal frames...")
    frame_files = group_files_by_frame(
        files_by_gain, config.fusion.max_time_diff_ms)
    pipe._log(f"  Found {len(frame_files)} frames")
    if max_frames > 0:
        frame_files = frame_files[:max_frames]

    pipe._log("\n[3/6] Building point cloud frames (device conversion)...")
    loader = FrameBatchLoader(
        config, intensity_threshold=intensity_threshold,
        point_stride=point_stride, verbose=verbose,
        parse_workers=parse_workers)
    pipe._log("\n[4/6] Land filtering...")
    pipe._log("\n[5/6] + [6/6] Clustering and tracking...")
    result = pipe.ingest_and_run(
        frame_files, loader, eps_space=eps_space, eps_time=eps_time,
        min_samples=min_samples, skip_land_filter=skip_land_filter,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        interrupt_after_frames=interrupt_after_frames)
    total_points = int(jnp.sum(result.ingested.count))
    pipe._log(f"  Built {result.ingested.num_frames} frames, "
              f"{total_points:,} points after filtering")

    result.save_csvs(output_dir)
    pipe._log(f"\nSaved CSV artifacts to {output_dir}")

    if visualize:
        from ..viz.tracking_plots import render_tracking_outputs

        render_tracking_outputs(result, output_dir, config)

    return result
