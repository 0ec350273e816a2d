"""Adversarial tokens through the native radar-CSV parser.

The bit-parallel scan (native/radar_native.cpp) decides threshold verdicts
from comma/digit bitmasks with a numeric-parse fallback for non-canonical
tokens; every token class here must match a pure-NumPy oracle of the
reference semantics (pandas read_csv + fillna(0) + flatten-mask-stride,
radar-pipeline core/loaders.py:46-101, transforms.py:37-79).
"""

from pathlib import Path

import numpy as np
import pytest

from radar_point_cloud_tracking_tpu import native

pytestmark = pytest.mark.skipif(not native.HAVE_NATIVE,
                                reason="native library unavailable")


def _numpy_oracle(path: Path, num_echo: int, threshold: float, stride: int):
    """Reference-semantics parse: ragged/empty/garbage fields -> 0."""
    rows = []
    with open(path) as fh:
        next(fh)  # header
        for line in fh:
            line = line.rstrip("\r\n")
            if not line:
                continue
            fields = line.split(",")
            vals = np.zeros(5 + num_echo, np.float32)
            for i, f in enumerate(fields[:5 + num_echo]):
                try:
                    vals[i] = np.float32(f)
                except ValueError:
                    vals[i] = np.float32(_leading_float(f))
            rows.append(vals)
    table = np.stack(rows) if rows else np.zeros((0, 5 + num_echo))
    echo = table[:, 5:]
    mask = echo > threshold
    rr, bb = np.nonzero(mask)
    keep = np.arange(len(rr)) % stride == 0
    return (rr[keep].astype(np.uint16), bb[keep].astype(np.uint16),
            echo[rr[keep], bb[keep]].astype(np.float32),
            table[:, 4], table[:, 1])


def _leading_float(tok: str) -> float:
    """strtof-style leading-prefix parse (what the C fast path does)."""
    import re

    m = re.match(r"\s*[+-]?(\d+(\.\d*)?|\.\d+)([eE][+-]?\d+)?", tok)
    return float(m.group(0)) if m and m.group(0).strip() else 0.0


CASES = [
    # canonical integers around the threshold boundary
    ["0", "9", "10", "11", "12", "100", "255", "256", "999"],
    # leading zeros (length-compare trap), floats, signs, exponents
    ["007", "0", "010", "10.5", "9.99", "11.0", "-5", "+12", "2e3", "1e-2"],
    # empties and whitespace
    ["", "0", "", "42", " 13", "7 ", "", ""],
    # long runs of zeros with sparse hits (zero-skip boundaries)
    ["0"] * 31 + ["77"] + ["0"] * 40 + ["12"],
    # long tokens (beyond the 7-digit integer fast path) + padding
    ["123456789012345678", "99999999", "1000000"] + ["0"] * 20,
]


@pytest.mark.parametrize("case_idx", range(len(CASES)))
@pytest.mark.parametrize("threshold,stride", [(10.0, 4), (10.0, 1),
                                              (0.5, 2), (99.5, 3)])
def test_native_parse_matches_oracle(tmp_path, case_idx, threshold, stride):
    tokens = CASES[case_idx]
    num_echo = len(tokens)
    lines = ["Status,Scale,Range,Gain,Angle,"
             + ",".join(f"E{i}" for i in range(num_echo))]
    # several rows: the case tokens, a rotation, and an all-zero row
    lines.append("1,496,3,75,0," + ",".join(tokens))
    lines.append("1,496,3,75,16," + ",".join(tokens[::-1]))
    lines.append("1,496,3,75,32," + ",".join(["0"] * num_echo))
    path = tmp_path / "20250813_142600_000.csv"
    path.write_text("\n".join(lines) + "\n")

    rr, bb, vv, ang, sc, gain, u8 = native.parse_radar_points(
        path, num_echo, threshold, stride, 64, 1 << 16)
    orr, obb, ovv, oang, osc = _numpy_oracle(path, num_echo, threshold,
                                             stride)
    np.testing.assert_array_equal(rr, orr)
    np.testing.assert_array_equal(bb, obb)
    np.testing.assert_array_equal(vv, ovv)
    np.testing.assert_array_equal(ang, oang)
    np.testing.assert_array_equal(sc, osc)
    assert gain == 75


def test_crlf_and_wide_rows(tmp_path):
    """CRLF line endings and rows longer than 64-byte chunks."""
    num_echo = 200
    rng = np.random.default_rng(5)
    echo = rng.integers(0, 40, (4, num_echo))
    echo[1, 150] = 77
    echo[2, 199] = 200  # last column, token against line end
    lines = ["Status,Scale,Range,Gain,Angle,"
             + ",".join(f"E{i}" for i in range(num_echo))]
    for r in range(4):
        lines.append(f"1,496,3,75,{r * 16},"
                     + ",".join(map(str, echo[r])))
    path = tmp_path / "20250813_142601_000.csv"
    path.write_bytes(("\r\n".join(lines) + "\r\n").encode())

    rr, bb, vv, *_ = native.parse_radar_points(path, num_echo, 10.0, 1,
                                               64, 1 << 16)
    orr, obb, ovv, *_o = _numpy_oracle(path, num_echo, 10.0, 1)
    np.testing.assert_array_equal(rr, orr)
    np.testing.assert_array_equal(bb, obb)
    np.testing.assert_array_equal(vv, ovv)


def test_f32_boundary_large_integers(tmp_path):
    """Integers beyond 2^24 are not exactly float32-representable: the
    reference compares float32(token) > threshold, so 16777217 does NOT
    exceed a threshold of 16777216.0 (it rounds to 16777216).  The native
    integer fast path must defer to the numeric path above 7 digits; an
    exact-integer verdict here would also shift the stride rank of every
    later survivor."""
    tokens = ["16777217", "16777216", "16777219", "33554433",
              "9999999", "10000001"] + ["0"] * 10 + ["42"]
    num_echo = len(tokens)
    lines = ["Status,Scale,Range,Gain,Angle,"
             + ",".join(f"E{i}" for i in range(num_echo)),
             "1,496,3,75,0," + ",".join(tokens),
             "1,496,3,75,16," + ",".join(tokens[::-1])]
    path = tmp_path / "20250813_142602_000.csv"
    path.write_text("\n".join(lines) + "\n")

    for threshold, stride in [(16777216.0, 1), (16777216.0, 2),
                              (9999999.5, 1), (10.0, 3)]:
        rr, bb, vv, *_ = native.parse_radar_points(
            path, num_echo, threshold, stride, 64, 1 << 16)
        orr, obb, ovv, *_o = _numpy_oracle(path, num_echo, threshold, stride)
        np.testing.assert_array_equal(rr, orr)
        np.testing.assert_array_equal(bb, obb)
        np.testing.assert_array_equal(vv, ovv)
