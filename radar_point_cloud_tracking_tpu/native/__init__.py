"""ctypes bindings for the native C++ runtime (CSV/PLY codecs).

Builds ``_radar_native.so`` from ``radar_native.cpp`` on first import (cached,
rebuilt when the source is newer).  Every entry point has a pure-NumPy
fallback in core/loaders.py and core/writers.py, gated on ``HAVE_NATIVE``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = [
    "HAVE_NATIVE",
    "parse_numeric_csv",
    "count_csv_rows",
    "write_ply_ascii",
    "parse_ascii_rows",
]

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "radar_native.cpp"
_SO = _HERE / "_radar_native.so"

_lib: Optional[ctypes.CDLL] = None
HAVE_NATIVE = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_SO), str(_SRC),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        # some toolchains reject -march=native; retry portable before
        # falling back to NumPy
        try:
            subprocess.run([c for c in cmd if c != "-march=native"],
                           check=True, capture_output=True, timeout=120)
            return True
        except Exception as exc:  # noqa: BLE001 - any failure -> fallback
            print(f"[radar_native] build failed, using NumPy fallbacks: "
                  f"{exc}", file=sys.stderr)
            return False


def _load() -> Optional[ctypes.CDLL]:
    if not _SO.exists() or (_SRC.exists() and _SRC.stat().st_mtime > _SO.stat().st_mtime):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError as exc:
        print(f"[radar_native] load failed: {exc}", file=sys.stderr)
        return None

    lib.parse_numeric_csv.restype = ctypes.c_int
    lib.parse_numeric_csv.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.count_csv_rows.restype = ctypes.c_int
    lib.count_csv_rows.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.write_ply_ascii.restype = ctypes.c_int
    lib.write_ply_ascii.argtypes = [
        ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
    ]
    lib.parse_ascii_rows.restype = ctypes.c_int
    lib.parse_ascii_rows.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.parse_radar_points.restype = ctypes.c_int
    lib.parse_radar_points.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_float, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_uint16),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_longlong,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int),
    ]
    u16p = ctypes.POINTER(ctypes.c_uint16)
    f32p = ctypes.POINTER(ctypes.c_float)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.sweep_xy_bounds.restype = None
    lib.sweep_xy_bounds.argtypes = [
        u16p, u16p, ctypes.c_longlong, f32p, f32p, f32p, f32p,
    ]
    lib.land_grid_accumulate.restype = None
    lib.land_grid_accumulate.argtypes = [
        u16p, u16p, f32p, ctypes.c_longlong, f32p, f32p, f32p,
        f64p, ctypes.c_int, f64p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_longlong), f64p,
    ]
    lib.land_filter_sweep.restype = ctypes.c_longlong
    lib.land_filter_sweep.argtypes = [
        u16p, u16p, f32p, ctypes.c_longlong, f32p, f32p, f32p,
        f64p, ctypes.c_int, f64p, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    return lib


if os.environ.get("RADAR_TPU_NO_NATIVE", "0") != "1":
    _lib = _load()
    HAVE_NATIVE = _lib is not None


def _fptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def count_csv_rows(path: Path, skip_rows: int = 1) -> int:
    assert _lib is not None
    n = _lib.count_csv_rows(str(path).encode(), skip_rows)
    if n < 0:
        raise IOError(f"count_csv_rows failed for {path}")
    return n


def parse_numeric_csv(path: Path, ncols: int, skip_rows: int = 1,
                      max_rows: Optional[int] = None) -> np.ndarray:
    """Parse a numeric CSV into a (rows, ncols) float32 array (missing -> 0)."""
    assert _lib is not None
    if max_rows is None:
        max_rows = count_csv_rows(path, skip_rows)
    out = np.empty((max(max_rows, 1), ncols), dtype=np.float32)
    n = _lib.parse_numeric_csv(str(path).encode(), ncols, skip_rows,
                               _fptr(out), max_rows)
    if n < 0:
        raise IOError(f"parse_numeric_csv failed for {path}")
    return out[:n]


def write_ply_ascii(path: Path, header: str, x: np.ndarray, y: np.ndarray,
                    z: np.ndarray, rgb: np.ndarray, precision: int = 6) -> None:
    assert _lib is not None
    n = int(x.size)
    x = np.ascontiguousarray(x, dtype=np.float32)
    y = np.ascontiguousarray(y, dtype=np.float32)
    z = np.ascontiguousarray(z, dtype=np.float32)
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    rc = _lib.write_ply_ascii(
        str(path).encode(), header.encode(), n,
        _fptr(x), _fptr(y), _fptr(z),
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), precision,
    )
    if rc != 0:
        raise IOError(f"write_ply_ascii failed for {path}")


def parse_ascii_rows(path: Path, offset: int, n_rows: int, ncols: int) -> np.ndarray:
    assert _lib is not None
    out = np.empty((max(n_rows, 1), ncols), dtype=np.float32)
    n = _lib.parse_ascii_rows(str(path).encode(), offset, n_rows, ncols, _fptr(out))
    if n < 0:
        raise IOError(f"parse_ascii_rows failed for {path}")
    return out[:n]


def parse_radar_points(path: Path, num_echo: int, threshold: float,
                       stride: int, max_rows: int, max_pts: int):
    """One-pass parse + threshold + stride compaction.

    Returns (rows u16 (P,), bins u16 (P,), vals f32 (P,),
    angle_units f32 (R,), scale f32 (R,), gain int, u8_ok bool).

    ``u8_ok`` is True when every shipped echo is integral in [0, 255] —
    the caller may then ship intensities as uint8 with no precision loss
    (the tunnel to the device is bandwidth-bound).
    """
    assert _lib is not None
    pt_row = np.empty(max_pts, np.uint16)
    pt_bin = np.empty(max_pts, np.uint16)
    pt_val = np.empty(max_pts, np.float32)
    row_angle = np.zeros(max_rows, np.float32)
    row_scale = np.zeros(max_rows, np.float32)
    rows_out = ctypes.c_int(0)
    gain_out = ctypes.c_float(0)
    u8_ok = ctypes.c_int(0)
    n = _lib.parse_radar_points(
        str(path).encode(), num_echo, threshold, stride,
        pt_row.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        pt_bin.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        _fptr(pt_val), _fptr(row_angle), _fptr(row_scale),
        max_rows, max_pts, ctypes.byref(rows_out), ctypes.byref(gain_out),
        ctypes.byref(u8_ok))
    if n < 0:
        raise IOError(f"parse_radar_points failed for {path}")
    r = rows_out.value
    return (pt_row[:n], pt_bin[:n], pt_val[:n], row_angle[:r], row_scale[:r],
            int(gain_out.value), bool(u8_ok.value))


def _u16p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16))


def _f64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def sweep_xy_bounds(rows: np.ndarray, bins: np.ndarray, scale_div: np.ndarray,
                    cos_r: np.ndarray, sin_r: np.ndarray,
                    io_bounds: np.ndarray) -> None:
    """Fold one sweep's x/y extents into io_bounds {xmin,xmax,ymin,ymax}."""
    assert _lib is not None
    _lib.sweep_xy_bounds(_u16p(rows), _u16p(bins), len(rows),
                         _fptr(scale_div), _fptr(cos_r), _fptr(sin_r),
                         _fptr(io_bounds))


def land_grid_accumulate(rows, bins, vals, scale_div, cos_r, sin_r,
                         x_edges, y_edges, count, vsum) -> None:
    """Accumulate one sweep into per-cell (count int64, intensity-sum f64)."""
    assert _lib is not None
    _lib.land_grid_accumulate(
        _u16p(rows), _u16p(bins), _fptr(vals), len(rows),
        _fptr(scale_div), _fptr(cos_r), _fptr(sin_r),
        _f64p(x_edges), len(x_edges), _f64p(y_edges), len(y_edges),
        count.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        _f64p(vsum))


def land_filter_sweep(rows, bins, vals, scale_div, cos_r, sin_r,
                      x_edges, y_edges, land_u8) -> int:
    """In-place compaction of one sweep's points to non-land cells; returns
    the surviving count."""
    assert _lib is not None
    return int(_lib.land_filter_sweep(
        _u16p(rows), _u16p(bins), _fptr(vals), len(rows),
        _fptr(scale_div), _fptr(cos_r), _fptr(sin_r),
        _f64p(x_edges), len(x_edges), _f64p(y_edges), len(y_edges),
        land_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))))
