"""Checkpoint / resume support.

The reference has no mid-pipeline checkpointing — its stage outputs on disk
act as implicit checkpoints between independently-runnable stages, and the
experiment harness saves intermediate JSON after every experiment
(PointCloudWorkF/run_experiments.py:492-494; SURVEY §5).  This module keeps
that stage-artifact model and adds what the reference lacks: a tracker-state
snapshot so a streaming tracking run can resume mid-sequence with
bit-identical results.

Layout of a checkpoint directory (models/tracker.py writes it when
``track --checkpoint-dir`` is given):

- ``cluster_stage.npz``   — the global cluster stage's outputs (tight point
  buffer, labels, frame ids, land stats).  Clustering is whole-sequence
  (eps_time couples frames), so it checkpoints as one artifact once done;
  a resumed run skips ingest + clustering entirely.
- ``tracker_state.npz``   — tracker state + resume cursor, refreshed every
  ``checkpoint_every`` frames during the tracking scan.
- ``tracker_records.npz`` — per-frame tracking records accumulated so far
  (needed to emit trajectories.csv without re-tracking resumed frames).
"""

from __future__ import annotations

from pathlib import Path
import numpy as np

from ..ops.tracking import TrackerState

__all__ = ["CheckpointInterrupt", "save_tracker_state", "load_tracker_state",
           "save_stage_artifact", "load_stage_artifact",
           "check_stage_params", "rebuild_stage_points_labels",
           "CLUSTER_STAGE_FILE", "DENOISE_STAGE_FILE", "TRACKER_STATE_FILE",
           "TRACKER_RECORDS_FILE",
           "save_tracker_snapshot", "load_tracker_snapshot"]

_STATE_FIELDS = TrackerState._fields

CLUSTER_STAGE_FILE = "cluster_stage.npz"
# the denoiser's cluster-stage artifact (models/denoiser.py): the analog of
# the reference denoiser's binary-PLY stage outputs
# (stdbscan_denoising_pipeline.py:986-1013) — everything downstream
# (stats CSV, PLYs, plots/GIF) is a pure function of it
DENOISE_STAGE_FILE = "denoise_stage.npz"
TRACKER_STATE_FILE = "tracker_state.npz"
TRACKER_RECORDS_FILE = "tracker_records.npz"


class CheckpointInterrupt(RuntimeError):
    """Raised by the tracking driver's simulated-preemption hook
    (``interrupt_after_frames``) right after a snapshot lands on disk, so
    tests and ops drills can exercise resume without killing the process."""

    def __init__(self, frames_done: int, checkpoint_dir: Path):
        self.frames_done = frames_done
        self.checkpoint_dir = Path(checkpoint_dir)
        super().__init__(
            f"pipeline interrupted after {frames_done} frames; resume from "
            f"{checkpoint_dir}")


def save_tracker_state(path: Path, state: TrackerState,
                       next_frame_pos: int = 0) -> None:
    """Snapshot tracker state (+ the resume cursor) to an .npz file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = {name: np.asarray(getattr(state, name))
              for name in _STATE_FIELDS}
    arrays["__next_frame_pos__"] = np.asarray(next_frame_pos, np.int64)
    np.savez(path, **arrays)


def load_tracker_state(path: Path):
    """Restore (TrackerState, next_frame_pos) from an .npz snapshot."""
    import jax.numpy as jnp

    data = np.load(Path(path))
    state = TrackerState(**{
        name: jnp.asarray(data[name]) for name in _STATE_FIELDS})
    return state, int(data["__next_frame_pos__"])


def save_stage_artifact(path: Path, **arrays) -> None:
    """Persist intermediate stage outputs (labels, points, stats arrays) so a
    later stage can restart without recomputation.

    Writes land via a temp file + rename (same discipline as
    ``save_tracker_snapshot``): a preemption mid-write — the very event this
    artifact exists to survive — must not leave a truncated .npz at the
    final path."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    tmp = path.with_name(path.name + ".tmp.npz")
    np.savez_compressed(tmp, **{k: np.asarray(v) for k, v in arrays.items()})
    tmp.replace(path)


def load_stage_artifact(path: Path) -> dict:
    data = np.load(Path(path), allow_pickle=False)
    return {k: data[k] for k in data.files}


def check_stage_params(checkpoint_dir: Path, art: dict,
                       expected_params, names: str) -> None:
    """Refuse to resume from an artifact written under different parameters.

    ``names`` is the human-readable tuple of parameter names baked into the
    error (shared by the tracker and denoiser resume paths so the message
    format cannot drift between them)."""
    saved = tuple(float(p) for p in art["params"])
    if tuple(float(p) for p in expected_params) != saved:
        raise ValueError(
            f"checkpoint at {checkpoint_dir} was written with "
            f"{names}={saved}; resume requested {tuple(expected_params)} — "
            "rerun without --resume or match the parameters")


def rebuild_stage_points_labels(art: dict, capacity: int):
    """Rebuild padded device (points, labels) from a stage artifact's tight
    host buffers: pad slots get PAD_COORD coordinates / -1 labels, exactly
    as the live cluster stage laid them out, so every downstream program
    sees bit-identical inputs (tests/test_checkpoint.py)."""
    import jax.numpy as jnp

    from ..ops.geometry import PAD_COORD

    pts_np = art["points"]
    n_points = int(pts_np.shape[0])
    pad = capacity - n_points
    points = jnp.concatenate([
        jnp.asarray(pts_np, jnp.float32),
        jnp.full((pad, pts_np.shape[1]), PAD_COORD, jnp.float32)])
    labels = jnp.concatenate([
        jnp.asarray(art["labels"], jnp.int32),
        jnp.full((pad,), -1, jnp.int32)])
    return points, labels, n_points


def save_tracker_snapshot(checkpoint_dir: Path, state: TrackerState,
                          next_frame_pos: int, records: dict) -> None:
    """Atomically refresh the tracker snapshot pair (state+cursor, records).

    Writes land via a temp file + rename so a kill mid-write leaves the
    previous consistent snapshot in place."""
    checkpoint_dir = Path(checkpoint_dir)
    checkpoint_dir.mkdir(parents=True, exist_ok=True)
    for name, write in (
        (TRACKER_STATE_FILE,
         lambda p: save_tracker_state(p, state, next_frame_pos)),
        (TRACKER_RECORDS_FILE,
         lambda p: np.savez(p, **{k: np.asarray(v)
                                  for k, v in records.items()})),
    ):
        tmp = checkpoint_dir / (name + ".tmp.npz")
        write(tmp)
        tmp.replace(checkpoint_dir / name)


def load_tracker_snapshot(checkpoint_dir: Path):
    """Load (state, next_frame_pos, records) or None if no snapshot exists."""
    checkpoint_dir = Path(checkpoint_dir)
    state_path = checkpoint_dir / TRACKER_STATE_FILE
    records_path = checkpoint_dir / TRACKER_RECORDS_FILE
    if not (state_path.exists() and records_path.exists()):
        return None
    state, pos = load_tracker_state(state_path)
    with np.load(records_path) as data:
        records = {k: data[k] for k in data.files}
    return state, pos, records
