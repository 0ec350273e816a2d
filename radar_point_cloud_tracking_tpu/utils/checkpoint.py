"""Checkpoint / resume support.

The reference has no mid-pipeline checkpointing — its stage outputs on disk
act as implicit checkpoints between independently-runnable stages (SURVEY
§5).  This module keeps that stage-artifact model and adds what the
reference lacks: a tracker-state snapshot so a streaming tracking run can
resume mid-sequence with identical results.
"""

from __future__ import annotations

from pathlib import Path
import numpy as np

from ..ops.tracking import TrackerState

__all__ = ["save_tracker_state", "load_tracker_state",
           "save_stage_artifact", "load_stage_artifact"]

_STATE_FIELDS = TrackerState._fields


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
    later stage can restart without recomputation."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in arrays.items()})


def load_stage_artifact(path: Path) -> dict:
    data = np.load(Path(path), allow_pickle=False)
    return {k: data[k] for k in data.files}
