"""Pytest fixtures: synthetic radar CSVs, Cartesian CSVs and PLY files.

Tests run on CPU with 8 virtual devices so sharding/multi-chip code paths are
exercised without TPU hardware (bench.py runs on the real chip).  The env
vars must be set before jax is first imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize force-registers the tunneled TPU backend
# and overrides JAX_PLATFORMS; the config update wins over both.
jax.config.update("jax_platforms", "cpu")

from pathlib import Path  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def make_radar_csv(
    path: Path,
    num_rows: int = 64,
    num_echo: int = 1024,
    gain: int = 75,
    scale: float = 496.0,
    range_val: int = 3,
    seed: int = 0,
    angle_step: float = 16.0,
    echo_fn=None,
) -> Path:
    """Write a synthetic radar CSV in the reference format (header + rows of
    Status,Scale,Range,Gain,Angle,Echo_0..)."""
    rng = np.random.default_rng(seed)
    header = "Status,Scale,Range,Gain,Angle," + ",".join(
        f"Echo_{i}" for i in range(num_echo))
    lines = [header]
    for r in range(num_rows):
        if echo_fn is not None:
            echo = np.asarray(echo_fn(r), dtype=int)
        else:
            echo = rng.integers(0, 256, num_echo)
        angle = r * angle_step
        lines.append(
            f"1,{scale:g},{range_val},{gain},{angle:g}," +
            ",".join(map(str, echo)))
    path.write_text("\n".join(lines) + "\n")
    return path


@pytest.fixture
def sample_radar_csv(tmp_path: Path) -> Path:
    return make_radar_csv(tmp_path / "20250813_142602_181.csv", num_rows=8,
                          num_echo=1024)


@pytest.fixture
def small_radar_csv(tmp_path: Path) -> Path:
    """Tiny sweep (few echo columns) for fast unit tests."""
    header = "Status,Scale,Range,Gain,Angle," + ",".join(
        f"Echo_{i}" for i in range(8))
    rows = [
        "1,496,3,75,0,0,10,20,30,40,50,60,70",
        "1,496,3,75,2049,5,15,25,35,45,55,65,75",
    ]
    path = tmp_path / "tiny.csv"
    path.write_text("\n".join([header] + rows) + "\n")
    return path


@pytest.fixture
def sample_cartesian_csv(tmp_path: Path) -> Path:
    path = tmp_path / "cart.csv"
    path.write_text("x,y,z\n1.0,2.0,128\n3.0,4.0,64\n5.0,6.0,32\n")
    return path


@pytest.fixture
def sample_ply(tmp_path: Path) -> Path:
    content = (
        "ply\nformat ascii 1.0\nelement vertex 3\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\nproperty uchar green\nproperty uchar blue\n"
        "end_header\n"
        "1.0 2.0 3.0 255 0 0\n"
        "4.0 5.0 6.0 0 255 0\n"
        "7.0 8.0 9.0 0 0 255\n"
    )
    path = tmp_path / "cloud.ply"
    path.write_text(content)
    return path


@pytest.fixture
def gain_dataset(tmp_path: Path) -> Path:
    """A small multi-gain dataset: gain_40/50/75 dirs, 4 frames each, with two
    persistent blobs and random noise."""
    rng = np.random.default_rng(42)
    base = tmp_path / "data"
    num_echo = 64
    for gain in (40, 50, 75):
        gdir = base / f"gain_{gain}"
        gdir.mkdir(parents=True)
        for f in range(4):
            sec = 10 + f * 3  # 3 s apart -> distinct frames (2 s window)

            def echo_fn(r, _rng=rng):
                e = _rng.integers(0, 8, num_echo)  # below threshold noise
                if 10 <= r < 14:
                    e[20:24] = 200  # persistent blob
                if 30 <= r < 33:
                    e[40:43] = 150  # second blob
                return e

            make_radar_csv(
                gdir / f"20250813_1426{sec:02d}_000.csv",
                num_rows=48, num_echo=num_echo, gain=gain,
                angle_step=170.0, echo_fn=echo_fn)
    return base
