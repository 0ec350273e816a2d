"""Host->device ingestion runtime: CSV tables to batched, compacted frame
points.

Replaces the reference's per-file pandas loops
(4_temporal_object_tracker.py:312-352, stdbscan_denoising_pipeline.py:219-257)
with: native C++ CSV parse (no pandas), row-bucketed padding into static
shapes, one fused device conversion program per frame (all gains batched),
and device-side repacking into fixed-capacity per-frame buffers.
"""

from __future__ import annotations

import os
import sys
from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PipelineConfig
from ..core.loaders import load_radar_table
from ..ops.geometry import convert_sweeps_batched, repack_padded
from ..utils.timestamps import parse_timestamp

__all__ = ["FrameBatchLoader", "IngestedFrames"]


def _bucket(n: int, step: int = 1024) -> int:
    return max(step, -(-n // step) * step)


# (sweep, row, bin) packed-index budget; tests shrink this to force the wide
# wire layout
_PACK_LIMIT_BITS = 31
# largest intra-sweep key delta the uint16 wire can carry; tests shrink this
# to force the int32 packed layout
_DELTA_MAX = 0xFFFF


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
    # host copy of ``count`` when the ingest path computed it on host (the
    # sparse parse does): lets callers size buffers without a device sync
    count_host: "np.ndarray | None" = None

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

    One ``convert_sweeps_batched`` + ``repack_padded`` jit pair is reused
    for every frame (shapes bucketed).  On a single-core host ingest is
    parse-bound and measured strictly serial (parse ~0.7 s + pack/dispatch
    ~0.3 s at bench scale; a 1-worker parse-ahead pool was chip-refuted —
    see ``_parsed_stream`` and ARCHITECTURE.md roofline section); with
    ``parse_workers`` > 1 the thread pool parses ahead of the consumer and
    the pack/dispatch work overlaps parsing for real.
    """

    def __init__(
        self,
        config: Optional[PipelineConfig] = None,
        intensity_threshold: Optional[float] = None,
        point_stride: Optional[int] = None,
        frame_capacity: int = 262_144,
        verbose: bool = True,
        sparse: Optional[bool] = None,
        parse_workers: Optional[int] = None,
    ) -> None:
        self.config = config or PipelineConfig()
        self.threshold = (self.config.fusion.intensity_threshold
                          if intensity_threshold is None else intensity_threshold)
        self.stride = (self.config.fusion.point_stride
                       if point_stride is None else point_stride)
        self.frame_capacity = frame_capacity
        self.verbose = verbose
        self._truncated = 0
        # sparse ingest: the native parser applies threshold+stride on host
        # and only surviving (row, bin, echo) triplets cross to the device —
        # ~300x less transfer than shipping full echo grids
        from .. import native as _native

        self.sparse = _native.HAVE_NATIVE if sparse is None else sparse
        # host parse parallelism: the native parser releases the GIL (ctypes
        # CDLL), so a thread pool scales CSV parsing across host cores while
        # the main thread feeds the device in frame order
        if parse_workers is None:
            parse_workers = getattr(self.config.device, "parse_workers", 0)
        self.parse_workers = (min(8, os.cpu_count() or 1)
                              if parse_workers in (None, 0)
                              else max(1, parse_workers))

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

    # -- sparse (host-compacted) path -------------------------------------
    def parse_frame_sparse(self, frame_files: Dict[int, Path]):
        """Native one-pass parse+compact of one frame's sweeps (ascending
        gain order).  Returns None for empty frames."""
        from .. import native

        num_bins = self.config.radar.num_echo_columns
        max_rows = self.config.radar.max_sweep_rows
        cap = self.frame_capacity
        sweeps = []
        total = 0
        for gain in sorted(frame_files):
            try:
                rows_a, bins_a, vals_a, angles, scales, _, u8_ok = \
                    native.parse_radar_points(
                        frame_files[gain], num_bins,
                        float(self.threshold), int(self.stride),
                        max_rows, cap)
            except Exception as exc:  # lenient per-file failure
                print(f"Error loading {frame_files[gain]}: {exc}",
                      file=sys.stderr)
                continue
            if angles.shape[0] == 0:
                continue
            sweeps.append((gain, rows_a, bins_a, vals_a, angles, scales,
                           u8_ok))
            total += len(rows_a)
        if not sweeps:
            return None
        if total > cap:
            self._truncated += total - cap
            if self.verbose:
                print(f"warning: frame truncated {total}->{cap} points "
                      f"(raise frame_capacity)", file=sys.stderr)
        return sweeps

    def _convert_chunk_sparse(self, chunk_sweeps, rows):
        """One device dispatch for several sparse-parsed frames.

        Host buffers are sized to the chunk's own point maximum (power-of-two
        bucketed), then the device output pads up to the uniform frame
        capacity — the wire carries only real points.  The tunnel to the
        device is bandwidth-bound, so each point ships as ONE packed int32
        (sweep, row, bin) plus a uint8 echo when the parser proved echoes
        integral in [0, 255] (5 B/point); per-point gain is reconstructed on
        device from a per-sweep table.  Falls back to the wide layout when
        the index fields overflow 31 bits or echoes need float precision.
        """
        from ..ops.geometry import (PAD_COORD, convert_sparse_frames,
                                    convert_sparse_frames_delta,
                                    convert_sparse_frames_packed)

        nf = len(chunk_sweeps)
        g = max(len(s) for s in chunk_sweeps)
        cap = self.frame_capacity
        chunk_max = max(1, max(sum(len(s[1]) for s in sweeps)
                               for sweeps in chunk_sweeps))
        c = min(cap, 1 << (min(chunk_max, cap) - 1).bit_length())
        c = max(c, 1024)
        num_bins = self.config.radar.num_echo_columns
        bin_bits = max(1, (num_bins - 1).bit_length())
        row_bits = max(1, (rows - 1).bit_length())
        sweep_bits = max(1, (g - 1).bit_length())
        packed_ok = sweep_bits + row_bits + bin_bits <= _PACK_LIMIT_BITS
        u8_ok = all(s[6] for sweeps in chunk_sweeps for s in sweeps)

        counts = np.zeros((nf,), np.int32)
        angles = np.zeros((nf, g, rows), np.float32)
        scales = np.zeros((nf, g, rows), np.float32)

        def narrow_u16(a):
            """Ship per-row Angle/Scale tables as uint16 when exact (the CSV
            columns are integer-valued in practice); device promotion back to
            f32 reproduces the same values bit-for-bit."""
            if (a.size and float(a.min()) >= 0.0 and float(a.max()) <= 65535.0
                    and bool(np.all(a == np.trunc(a)))):
                return a.astype(np.uint16)
            return a

        if packed_ok:
            pt_key = np.zeros((nf, c), np.int32)
            pt_val = np.zeros((nf, c), np.uint8 if u8_ok else np.float32)
            gain_table = np.zeros((nf, g), np.int32)
            sweep_offsets = np.zeros((nf, g + 1), np.int32)
            start_keys = np.zeros((nf, g), np.int32)
            for fi, sweeps in enumerate(chunk_sweeps):
                off = 0
                for si, (gain, rows_a, bins_a, vals_a, ang, sc, _) \
                        in enumerate(sweeps):
                    n = min(len(rows_a), c - off)
                    sweep_offsets[fi, si] = off
                    pt_key[fi, off:off + n] = (
                        (si << (row_bits + bin_bits))
                        | (rows_a[:n].astype(np.int32) << bin_bits)
                        | bins_a[:n])
                    if n:
                        start_keys[fi, si] = pt_key[fi, off]
                    pt_val[fi, off:off + n] = vals_a[:n]
                    gain_table[fi, si] = gain
                    angles[fi, si, :len(ang)] = ang
                    scales[fi, si, :len(sc)] = sc
                    off += n
                sweep_offsets[fi, len(sweeps):] = off
                counts[fi] = off
            # keys ascend strictly within a sweep, so intra-sweep uint16
            # deltas (2 B) usually replace the int32 keys (4 B) on the
            # bandwidth-bound wire; sweep starts ship absolute keys in the
            # tiny start_keys table (their delta slot is zero)
            d = np.empty_like(pt_key)
            d[:, 0] = pt_key[:, 0]
            d[:, 1:] = pt_key[:, 1:] - pt_key[:, :-1]
            d[np.arange(c)[None, :] >= counts[:, None]] = 0
            off_flat = sweep_offsets[:, :g]
            real_start = (off_flat < counts[:, None]).ravel()
            d[np.repeat(np.arange(nf), g)[real_start],
              off_flat.ravel()[real_start]] = 0
            convert_args = (
                jnp.asarray(pt_val), jnp.asarray(counts),
                jnp.asarray(gain_table), jnp.asarray(narrow_u16(angles)),
                jnp.asarray(narrow_u16(scales)),
                jnp.float32(self.config.radar.angle_scale))
            if d.max(initial=0) <= _DELTA_MAX and d.min(initial=0) >= 0:
                xyi, gain_dev = convert_sparse_frames_delta(
                    jnp.asarray(d.astype(np.uint16)), convert_args[0],
                    convert_args[1], jnp.asarray(sweep_offsets),
                    jnp.asarray(start_keys), *convert_args[2:],
                    num_bins, row_bits, bin_bits)
            else:
                xyi, gain_dev = convert_sparse_frames_packed(
                    jnp.asarray(pt_key), *convert_args,
                    num_bins, row_bits, bin_bits)
        else:
            pt_row = np.zeros((nf, c), np.int16)
            pt_bin = np.zeros((nf, c), np.int16)
            pt_val = np.zeros((nf, c), np.float32)
            pt_sweep = np.zeros((nf, c), np.int8)
            pt_gain = np.zeros((nf, c), np.uint8)
            for fi, sweeps in enumerate(chunk_sweeps):
                off = 0
                for si, (gain, rows_a, bins_a, vals_a, ang, sc, _) \
                        in enumerate(sweeps):
                    n = min(len(rows_a), c - off)
                    pt_row[fi, off:off + n] = rows_a[:n]
                    pt_bin[fi, off:off + n] = bins_a[:n]
                    pt_val[fi, off:off + n] = vals_a[:n]
                    pt_sweep[fi, off:off + n] = si
                    pt_gain[fi, off:off + n] = gain
                    angles[fi, si, :len(ang)] = ang
                    scales[fi, si, :len(sc)] = sc
                    off += n
                counts[fi] = off
            xyi = convert_sparse_frames(
                jnp.asarray(pt_row), jnp.asarray(pt_bin), jnp.asarray(pt_val),
                jnp.asarray(pt_sweep), jnp.asarray(counts),
                jnp.asarray(angles), jnp.asarray(scales),
                jnp.float32(self.config.radar.angle_scale), num_bins)
            gain_dev = jnp.asarray(pt_gain).astype(jnp.int32)
        if c < cap:  # pad on device up to the uniform frame capacity
            xyi = jnp.pad(xyi, ((0, 0), (0, cap - c), (0, 0)),
                          constant_values=PAD_COORD)
            gain_dev = jnp.pad(gain_dev, ((0, 0), (0, cap - c)))
        return xyi, gain_dev, jnp.asarray(counts), counts

    # -- chunked sequence -------------------------------------------------
    def _convert_chunk(self, chunk_tables, rows):
        """One device dispatch for several frames: conversion over the
        (frames*gains) sweep axis + batched per-frame repack."""
        num_bins = self.config.radar.num_echo_columns
        nf = len(chunk_tables)
        g = len(chunk_tables[0])
        b = nf * g
        echo = np.zeros((b, rows, num_bins), np.float32)
        angles = np.zeros((b, rows), np.float32)
        scale = np.zeros((b, rows), np.float32)
        row_valid = np.zeros((b, rows), bool)
        gains = np.zeros((b,), np.int32)
        for fi, tables in enumerate(chunk_tables):
            for si, (gain, table) in enumerate(tables):
                i = fi * g + si
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
        gcol = jnp.broadcast_to(
            jnp.asarray(gains, jnp.float32)[:, None, None], (b, cap_sweep, 1))
        vals = jnp.concatenate([xyz, gcol], axis=-1)
        packed, totals = jax.vmap(
            lambda v, c: repack_padded(v, c, self.frame_capacity)
        )(vals.reshape(nf, g, cap_sweep, 4), counts.reshape(nf, g))
        return packed[..., :3], packed[..., 3].astype(jnp.int32), totals

    def _parsed_stream(self, frame_files_list):
        """Yield (i, ts_ms, parsed) in frame order for non-empty frames,
        parsing ahead on a thread pool (native parse releases the GIL; the
        window bounds RAM).

        With parse_workers <= 1 the stream is a plain sequential generator.
        A 1-worker parse-AHEAD pool was built and chip-refuted on this rig:
        ingest is measured strictly serial (full == parse + pack,
        .chip_logs/profile_ingest_overlap_r5.log), but on a single host
        core the handoff/GIL ping-pong costs ~100-140 ms while the device
        dispatch it would hide blocks in-line on the tunnel anyway
        (990 -> ~1124 ms full ingest, profile_ingest_overlap_r5_after.log)
        — so overlap only engages where it can win, parse_workers > 1."""
        parse_one = (self.parse_frame_sparse if self.sparse
                     else self.load_frame_tables)

        def ts_of(ff):
            try:
                return parse_timestamp(ff[sorted(ff)[0]].name)[1]
            except ValueError:
                return 0

        if self.parse_workers <= 1 or len(frame_files_list) <= 1:
            for i, ff in enumerate(frame_files_list):
                parsed = parse_one(ff)
                if parsed:
                    yield i, ts_of(ff), parsed
            return
        window = 2 * self.parse_workers
        with ThreadPoolExecutor(self.parse_workers) as pool:
            futs: list = []
            it = iter(enumerate(frame_files_list))
            for i, ff in it:
                futs.append((i, ff, pool.submit(parse_one, ff)))
                if len(futs) >= window:
                    break
            while futs:
                i, ff, fut = futs.pop(0)
                parsed = fut.result()
                if parsed:
                    yield i, ts_of(ff), parsed
                for j, ff2 in it:
                    futs.append((j, ff2, pool.submit(parse_one, ff2)))
                    break

    def _pack_stream(self, stream, total_frames: int, chunk_frames: int,
                     progress_every: int) -> IngestedFrames:
        """Batch a (frame_idx, ts, parsed) stream into multi-frame device
        dispatches; a chunk flushes early when the sweep shape (gain count or
        row bucket) changes, so programs stay uniform and cached."""
        xyi_parts, gain_parts, count_parts = [], [], []
        count_host_parts = []
        frame_ids, ts_list = [], []
        pending: list = []  # (frame_idx, ts, parsed)
        pending_shape = None

        def flush():
            nonlocal pending, pending_shape
            if not pending:
                return
            rows = pending_shape[1]
            parsed = [t for _, _, t in pending]
            if self.sparse:
                xyi, gain, totals, totals_np = \
                    self._convert_chunk_sparse(parsed, rows)
            else:
                xyi, gain, totals = self._convert_chunk(parsed, rows)
                totals_np = None
            xyi_parts.append(xyi)
            gain_parts.append(gain)
            count_parts.append(totals)
            count_host_parts.append(totals_np)
            for idx, ts, _ in pending:
                frame_ids.append(idx)
                ts_list.append(ts)
            pending = []
            pending_shape = None

        for i, ts_ms, parsed in stream:
            if self.sparse:
                rows = _bucket(max(len(s[4]) for s in parsed))
            else:
                rows = _bucket(max(t.shape[0] for _, t in parsed))
            shape = (len(parsed), rows)
            if pending_shape is not None and (shape != pending_shape
                                              or len(pending) >= chunk_frames):
                flush()
            pending_shape = shape
            pending.append((i, ts_ms, parsed))
            if self.verbose and (i + 1) % progress_every == 0:
                print(f"  Processed {i + 1}/{total_frames} frames...")
        flush()

        if not xyi_parts:
            raise ValueError("No frames produced any points")
        return IngestedFrames(
            xyi=jnp.concatenate(xyi_parts),
            gain=jnp.concatenate(gain_parts),
            count=jnp.concatenate(count_parts),
            frame_ids=np.asarray(frame_ids, np.int32),
            timestamps_ms=np.asarray(ts_list, np.int64),
            count_host=(np.concatenate(count_host_parts)
                        if all(p is not None for p in count_host_parts)
                        else None),
        )

    def load_sequence(
        self,
        frame_files_list: Sequence[Dict[int, Path]],
        progress_every: int = 50,
        chunk_frames: int = 32,
    ) -> IngestedFrames:
        """Convert a grouped frame sequence (skipping empty frames, keeping
        original frame ids like the reference enumeration at :941-944)."""
        return self._pack_stream(self._parsed_stream(frame_files_list),
                                 len(frame_files_list), chunk_frames,
                                 progress_every)

    def load_sequence_land_filtered(
        self,
        frame_files_list: Sequence[Dict[int, Path]],
        grid_resolution_m: float = 5.0,
        persistence_threshold: float = 0.8,
        min_intensity: float = 100.0,
        min_frames_required: int = 0,
        progress_every: int = 50,
        chunk_frames: int = 32,
    ) -> Tuple[IngestedFrames, Dict[str, int]]:
        """Parse everything, apply the persistence land filter on the HOST,
        ship only surviving points.

        The land verdict needs the whole sequence (per-cell persistence,
        4_temporal_object_tracker.py:359-436) and typically removes the vast
        majority of points on clutter-heavy scenes, so deciding it host-side
        — straight from the sparse parse output, before any device transfer —
        shrinks the host->device wire by the same factor and removes the
        on-device land stage entirely.  Verdicts are bit-identical to the
        reference composition: float32 conversion in the reference's op
        order, np.digitize on np.arange edges, float64 intensity sums.

        Requires the sparse (native-parse) ingest path.  Returns
        (IngestedFrames of surviving points, info dict with ``land_cells``,
        ``points_removed``, ``raw_points``, ``num_frames``).
        """
        if not self.sparse:
            raise RuntimeError(
                "host land prefiltering requires the sparse native-parse "
                "ingest path (sparse=True)")
        import time as _t

        num_bins = self.config.radar.num_echo_columns
        angle_scale = np.float32(self.config.radar.angle_scale)

        from .. import native

        t0 = _t.perf_counter()
        # consume the parse-ahead stream and fold the per-sweep trig tables
        # + running xy bounds in as frames arrive: this work rides INSIDE
        # the parse wall (the worker thread parses the next file meanwhile)
        # instead of serializing after it
        frames = []
        tables = []  # per (frame, sweep): (scale_div, cos_r, sin_r)
        raw_points = 0
        bounds = np.array([np.inf, -np.inf, np.inf, -np.inf], np.float32)
        for item in self._parsed_stream(frame_files_list):
            frames.append(item)
            row = []
            for gain, rows_a, bins_a, vals_a, ang_units, scales, _ \
                    in item[2]:
                ang = np.deg2rad(ang_units * angle_scale)
                t = (scales / np.float32(num_bins), np.cos(ang), np.sin(ang))
                row.append(t)
                native.sweep_xy_bounds(rows_a, bins_a, *t, bounds)
                raw_points += len(rows_a)
            tables.append(row)
        t_parse = _t.perf_counter() - t0
        if len(frames) <= min_frames_required:
            # too few frames for a persistence verdict (reference skips the
            # filter below this count, 4_temporal_object_tracker.py:952)
            ingested = self._pack_stream(iter(frames),
                                         len(frame_files_list),
                                         chunk_frames, progress_every)
            return ingested, {"land_cells": 0, "points_removed": 0,
                              "raw_points": int(np.sum(np.asarray(
                                  ingested.count))),
                              "num_frames": len(frames), "skipped": 1}

        t0 = _t.perf_counter()
        # Per-row float32 tables (built above, in the reference's op order):
        # the native streaming kernels compute x = (scale_div[r]*bin)*cos_r[r]
        # bit-identically, with no per-point Python-heap arrays (this host's
        # large-allocation page faults are pathologically slow and variable).
        if not raw_points:
            raise ValueError("No frames produced any points")

        # persistence occupancy grid (np.digitize semantics on np.arange
        # edges; float64 intensity accumulation like the reference)
        x_edges = np.arange(float(bounds[0]),
                            float(bounds[1]) + grid_resolution_m,
                            grid_resolution_m)
        y_edges = np.arange(float(bounds[2]),
                            float(bounds[3]) + grid_resolution_m,
                            grid_resolution_m)
        nx, ny = len(x_edges) - 1, len(y_edges) - 1
        if nx <= 0 or ny <= 0:
            # all points share one x (or y) value: the grid degenerates to
            # zero cells (np.bincount would raise on the same input)
            raise ValueError(
                "land grid degenerate: all points share a single "
                f"{'x' if nx <= 0 else 'y'} coordinate")
        count = np.zeros(nx * ny, np.int64)
        isum = np.zeros(nx * ny, np.float64)
        for (_, _, sweeps), row in zip(frames, tables):
            for (gain, rows_a, bins_a, vals_a, *_), t in zip(sweeps, row):
                native.land_grid_accumulate(rows_a, bins_a, vals_a, *t,
                                            x_edges, y_edges, count, isum)
        num_frames = len(frames)
        persistence = count / max(num_frames, 1)
        with np.errstate(divide="ignore", invalid="ignore"):
            avg = np.where(count > 0, isum / count, 0)
        land = ((persistence >= persistence_threshold)
                & (avg >= min_intensity))
        land_u8 = land.astype(np.uint8)
        t_grid = _t.perf_counter() - t0

        # filter the sparse arrays in place (order preserved); frames and
        # sweeps are kept even when fully emptied — the reference tracker
        # still steps on land-emptied frames, so they must occupy a slot
        filtered = []
        removed = 0
        for (i, ts_ms, sweeps), row in zip(frames, tables):
            new_sweeps = []
            for (gain, rows_a, bins_a, vals_a, ang_units, scales, u8), t \
                    in zip(sweeps, row):
                n = len(rows_a)
                kept = native.land_filter_sweep(rows_a, bins_a, vals_a, *t,
                                                x_edges, y_edges, land_u8)
                removed += n - kept
                new_sweeps.append((gain, rows_a[:kept], bins_a[:kept],
                                   vals_a[:kept], ang_units, scales, u8))
            filtered.append((i, ts_ms, new_sweeps))
        if self.verbose:
            print(f"  Host land prefilter: {int(land.sum())} land cells; "
                  f"removed {removed:,}/{raw_points:,} points before "
                  "device transfer")

        t0 = _t.perf_counter()
        ingested = self._pack_stream(iter(filtered), len(frame_files_list),
                                     chunk_frames, progress_every)
        info = {"land_cells": int(land.sum()), "points_removed": removed,
                "raw_points": raw_points, "num_frames": num_frames,
                "t_parse": t_parse, "t_grid": t_grid,
                "t_pack": _t.perf_counter() - t0}
        return ingested, info
