"""Host->device ingestion runtime: CSV tables to batched, compacted frame
points.

Replaces the reference's per-file pandas loops
(4_temporal_object_tracker.py:312-352, stdbscan_denoising_pipeline.py:219-257)
with: native C++ CSV parse (no pandas), row-bucketed padding into static
shapes, one fused device conversion program per frame (all gains batched),
and device-side repacking into fixed-capacity per-frame buffers.
"""

from __future__ import annotations

import sys
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..core.loaders import load_radar_table
from ..ops.geometry import PAD_COORD, convert_sweeps_batched, repack_padded
from ..utils.timestamps import parse_timestamp

__all__ = ["FrameBatchLoader", "IngestedFrames"]


def _bucket(n: int, step: int = 1024) -> int:
    return max(step, -(-n // step) * step)


@dataclass
class IngestedFrames:
    """Device-resident compacted points for a frame sequence.

    ``xyi`` (F, C, 3) — x, y, intensity; padded slots have coordinates
    PAD_COORD.  ``gain`` (F, C) int32; ``count`` (F,); ``frame_ids`` (F,)
    original frame indices; ``timestamps_ms`` (F,).
    """

    xyi: jnp.ndarray
    gain: jnp.ndarray
    count: jnp.ndarray
    frame_ids: np.ndarray
    timestamps_ms: np.ndarray

    @property
    def num_frames(self) -> int:
        return int(self.xyi.shape[0])

    @property
    def capacity(self) -> int:
        return int(self.xyi.shape[1])

    def valid_mask(self) -> jnp.ndarray:
        c = self.capacity
        return jnp.arange(c)[None, :] < self.count[:, None]


class FrameBatchLoader:
    """Streams frame-file groups through the device conversion program.

    One ``convert_sweeps_batched`` + ``repack_padded`` jit pair is reused for
    every frame (shapes bucketed), overlapping host CSV parse of frame f+1
    with device conversion of frame f via JAX async dispatch.
    """

    def __init__(
        self,
        config: Optional[PipelineConfig] = None,
        intensity_threshold: Optional[float] = None,
        point_stride: Optional[int] = None,
        frame_capacity: int = 262_144,
        verbose: bool = True,
    ) -> None:
        self.config = config or PipelineConfig()
        self.threshold = (self.config.fusion.intensity_threshold
                          if intensity_threshold is None else intensity_threshold)
        self.stride = (self.config.fusion.point_stride
                       if point_stride is None else point_stride)
        self.frame_capacity = frame_capacity
        self.verbose = verbose
        self._truncated = 0

    # -- single frame -----------------------------------------------------
    def load_frame_tables(self, frame_files: Dict[int, Path]) -> List[Tuple[int, np.ndarray]]:
        """Parse this frame's CSVs (ascending gain order, as the reference
        fuses them, 4_temporal_object_tracker.py:322)."""
        tables = []
        for gain in sorted(frame_files):
            try:
                table = load_radar_table(frame_files[gain],
                                         self.config.radar.num_echo_columns)
            except Exception as exc:  # lenient per-file failure (ref :192-195)
                print(f"Error loading {frame_files[gain]}: {exc}",
                      file=sys.stderr)
                continue
            if table.shape[0]:
                tables.append((gain, table))
        return tables

    def convert_frame(
        self, tables: List[Tuple[int, np.ndarray]]
    ) -> Optional[Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
        """Batched device conversion of one frame's sweeps.

        Returns (xyi (C, 3), gain (C,), count) or None if the frame is empty.
        """
        if not tables:
            return None
        num_bins = self.config.radar.num_echo_columns
        rows = _bucket(max(t.shape[0] for _, t in tables))
        g = len(tables)

        echo = np.zeros((g, rows, num_bins), np.float32)
        angles = np.zeros((g, rows), np.float32)
        scale = np.zeros((g, rows), np.float32)
        row_valid = np.zeros((g, rows), bool)
        gains = np.zeros((g,), np.int32)
        for i, (gain, table) in enumerate(tables):
            r = table.shape[0]
            echo[i, :r] = table[:, 5:]
            angles[i, :r] = np.deg2rad(
                table[:, 4] * np.float32(self.config.radar.angle_scale))
            scale[i, :r] = table[:, 1]
            row_valid[i, :r] = True
            gains[i] = gain

        cap_sweep = -(-rows * num_bins // max(self.stride, 1))
        cap_sweep = int(-(-cap_sweep // 8) * 8)
        xyz, counts = convert_sweeps_batched(
            jnp.asarray(echo), jnp.asarray(angles), jnp.asarray(scale),
            jnp.asarray(row_valid), jnp.float32(self.threshold),
            self.stride, cap_sweep, num_bins)

        # attach per-sweep gain labels, then repack (gain-ascending order)
        gcol = jnp.broadcast_to(
            jnp.asarray(gains, jnp.float32)[:, None, None],
            (g, cap_sweep, 1))
        vals = jnp.concatenate([xyz, gcol], axis=-1)
        packed, total = repack_padded(vals, counts, self.frame_capacity)
        if self.verbose:
            t = int(total)
            want = int(jnp.sum(counts))
            if t < want:
                self._truncated += want - t
                print(f"warning: frame truncated {want}->{t} points "
                      f"(raise frame_capacity)", file=sys.stderr)
        return packed[:, :3], packed[:, 3].astype(jnp.int32), total

    # -- sequence ---------------------------------------------------------
    def load_sequence(
        self,
        frame_files_list: Sequence[Dict[int, Path]],
        progress_every: int = 50,
    ) -> IngestedFrames:
        """Convert a grouped frame sequence (skipping empty frames, keeping
        original frame ids like the reference enumeration at :941-944)."""
        xyi_list, gain_list, count_list = [], [], []
        frame_ids, ts_list = [], []
        for i, ff in enumerate(frame_files_list):
            tables = self.load_frame_tables(ff)
            out = self.convert_frame(tables)
            if out is None:
                continue
            xyi, gain, count = out
            xyi_list.append(xyi)
            gain_list.append(gain)
            count_list.append(count)
            frame_ids.append(i)
            first = sorted(ff)[0]
            try:
                _, ts_ms = parse_timestamp(ff[first].name)
            except ValueError:
                ts_ms = 0
            ts_list.append(ts_ms)
            if self.verbose and (i + 1) % progress_every == 0:
                print(f"  Processed {i + 1}/{len(frame_files_list)} frames...")

        if not xyi_list:
            raise ValueError("No frames produced any points")
        return IngestedFrames(
            xyi=jnp.stack(xyi_list),
            gain=jnp.stack(gain_list),
            count=jnp.stack(count_list),
            frame_ids=np.asarray(frame_ids, np.int32),
            timestamps_ms=np.asarray(ts_list, np.int64),
        )
