"""RADAR_NATIVE_READBUF=1 (read(2) into a reused thread-local buffer) must
parse byte-identically to the default mmap mode."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from radar_point_cloud_tracking_tpu import native

pytestmark = pytest.mark.skipif(not native.HAVE_NATIVE,
                                reason="native library unavailable")

_SNIPPET = """
import json, sys
import numpy as np
from radar_point_cloud_tracking_tpu import native

out = native.parse_radar_points(sys.argv[1], 32, 10.0, 2, 64, 4096)
pt_row, pt_bin, pt_val, row_angle, row_scale, gain, u8_ok = out
print(json.dumps({
    "rows": pt_row.tolist(), "bins": pt_bin.tolist(),
    "vals": pt_val.tolist(), "angles": row_angle.tolist(),
    "scales": row_scale.tolist(), "gain": gain, "u8": u8_ok,
}))
"""


def _parse_in_subprocess(csv_path: Path, readbuf: bool) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["RADAR_NATIVE_READBUF"] = "1" if readbuf else "0"
    proc = subprocess.run(
        [sys.executable, "-c", _SNIPPET, str(csv_path)],
        capture_output=True, text=True, env=env, timeout=300,
        cwd=Path(__file__).resolve().parent.parent)
    assert proc.returncode == 0, proc.stderr[-800:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_readbuf_mode_matches_mmap(tmp_path):
    rng_rows = []
    import numpy as np
    rng = np.random.default_rng(5)
    header = "Status,Scale,Range,Gain,Angle," + ",".join(
        f"e{i}" for i in range(32))
    for r in range(6):
        echo = np.zeros(32, int)
        nz = rng.choice(32, 5, replace=False)
        echo[nz] = rng.integers(11, 200, 5)
        rng_rows.append(
            f"1,496,3,40,{r * 100}," + ",".join(map(str, echo)))
    csv_path = tmp_path / "sweep.csv"
    csv_path.write_text(header + "\n" + "\n".join(rng_rows) + "\n")

    a = _parse_in_subprocess(csv_path, readbuf=False)
    b = _parse_in_subprocess(csv_path, readbuf=True)
    assert a == b
    assert len(a["rows"]) > 0
