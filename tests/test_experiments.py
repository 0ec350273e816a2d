"""Experiment harness + synthetic generator + checkpoint tests."""

from pathlib import Path

import numpy as np
import jax.numpy as jnp

import radar_point_cloud_tracking_tpu as rpt
from radar_point_cloud_tracking_tpu.config import PipelineConfig
from radar_point_cloud_tracking_tpu.experiments.harness import (
    ExperimentSpec,
    run_experiments,
)
from radar_point_cloud_tracking_tpu.experiments.synthetic import (
    SceneConfig,
    generate_scene_dataset,
)


def test_synthetic_generator_roundtrip(tmp_path):
    cfg = SceneConfig(num_frames=3, num_rows=64, num_bins=32, seed=1)
    data_dir = generate_scene_dataset(tmp_path / "scene", cfg)
    files_by_gain = rpt.discover_files(data_dir)
    assert set(files_by_gain) == {40, 50, 75}
    assert all(len(v) == 3 for v in files_by_gain.values())

    sweep = rpt.load_radar_csv(files_by_gain[75][0],
                               rpt.RadarConfig(num_echo_columns=32))
    assert sweep.gain == 75
    assert sweep.intensities.shape == (64, 32)
    assert sweep.intensities.max() > 100  # land/objects present

    frames = rpt.group_files_by_frame(files_by_gain)
    assert len(frames) == 3
    assert all(len(ff) == 3 for ff in frames)


def test_run_experiments_full_sweep(tmp_path):
    cfg = SceneConfig(num_frames=4, num_rows=96, num_bins=48, seed=2,
                      num_boats=1, num_buoys=1, noise_rate=0.01)
    data_dir = generate_scene_dataset(tmp_path / "scene", cfg)

    pcfg = PipelineConfig()
    pcfg.radar.num_echo_columns = 48

    specs = [
        ExperimentSpec("a", eps_space=8.0, min_samples=5, min_frames=2),
        ExperimentSpec("b", eps_space=5.0, min_samples=8, min_frames=2),
    ]
    out = tmp_path / "exp"
    results = run_experiments(data_dir, out, specs, max_frames=4,
                              config=pcfg, verbose=False)
    assert len(results) == 2
    assert all(r["total_points"] > 0 for r in results)
    assert (out / "experiment_results.json").exists()
    assert (out / "stdbscan_comparison_report.tex").exists()
    assert (out / "experiment_comparison.png").exists()
    assert (out / "results_summary_table.png").exists()
    assert (out / "parameter_exploration.png").exists()
    tex = (out / "stdbscan_comparison_report.tex").read_text()
    assert r"\begin{document}" in tex and "Noise" in tex


def test_subprocess_mode_timeout_kills_and_flags(tmp_path, monkeypatch):
    """The reference harness kills runs after a timeout and records the
    fact (run_experiments.py:154-159): subprocess_mode with a timeout the
    child cannot possibly meet must set row['timeout'] and leave the stats
    fields at their zero defaults (no stats file was ever written)."""
    import time

    from radar_point_cloud_tracking_tpu.experiments.harness import (
        run_experiment)

    cfg = SceneConfig(num_frames=2, num_rows=48, num_bins=32, seed=4)
    data_dir = generate_scene_dataset(tmp_path / "scene", cfg)
    # the child must never touch the TPU tunnel (killing a tunnel-holding
    # process poisons it): force the CPU backend through the inherited env
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")

    spec = ExperimentSpec("hang", min_samples=5)
    t0 = time.time()
    row = run_experiment(spec, data_dir, tmp_path / "exp", max_frames=2,
                         subprocess_mode=True, timeout_s=2, verbose=False)
    assert row["timeout"] is True
    assert time.time() - t0 < 60  # the child was killed, not waited out
    assert row["total_points"] == 0 and row["num_clusters"] == 0
    assert row["elapsed_seconds"] >= 2


def test_subprocess_mode_completed_run_reads_stats_back(tmp_path,
                                                        monkeypatch):
    """A completed subprocess run's stats are read back from its
    denoising_stats.csv (the reference's read-back contract,
    run_experiments.py:168-189)."""
    from radar_point_cloud_tracking_tpu.experiments.harness import (
        run_experiment)

    cfg = SceneConfig(num_frames=3, num_rows=96, num_bins=48, seed=2,
                      num_boats=1, num_buoys=1, noise_rate=0.01)
    data_dir = generate_scene_dataset(tmp_path / "scene", cfg)
    monkeypatch.delenv("PALLAS_AXON_POOL_IPS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    # the child parses the dataset with the default 1024-column radar
    # config unless the harness ships it one
    pcfg = PipelineConfig()
    pcfg.radar.num_echo_columns = 48
    pcfg.clustering.tile_size = 128

    spec = ExperimentSpec("ok", min_samples=5, min_frames=2)
    row = run_experiment(spec, data_dir, tmp_path / "exp", max_frames=3,
                         config=pcfg, subprocess_mode=True, timeout_s=600,
                         verbose=False)
    assert "timeout" not in row
    assert row["total_points"] > 0
    assert row["signal_points"] + row["noise_points"] == row["total_points"]
    assert row["elapsed_seconds"] > 0


def test_tracker_checkpoint_resume(tmp_path):
    """Resuming a split sequence reproduces the unsplit run exactly."""
    from radar_point_cloud_tracking_tpu.ops.tracking import (
        init_tracker_state, tracker_step, track_sequence)
    from radar_point_cloud_tracking_tpu.utils.checkpoint import (
        load_tracker_state, save_tracker_state)

    rng = np.random.default_rng(3)
    f, c = 10, 4
    cents = rng.uniform(-50, 50, (f, c, 2)).astype(np.float32)
    for fi in range(1, f):
        cents[fi, 0] = cents[0, 0] + fi * np.array([2.0, 0])
    valid = np.ones((f, c), bool)
    fids = np.arange(f, dtype=np.int32)

    full_state, _ = track_sequence(
        jnp.asarray(cents), jnp.asarray(valid), jnp.asarray(fids),
        max_objects=16, history=5, max_missed=10, max_dist=50.0,
        stationary=1.0)

    # run first half step-by-step, checkpoint, restore, run second half
    state = init_tracker_state(16, 5)
    for fi in range(5):
        state, _ = tracker_step(state, jnp.asarray(cents[fi]),
                                jnp.asarray(valid[fi]), jnp.int32(fi),
                                5, 10, 50.0, 1.0)
    save_tracker_state(tmp_path / "ckpt.npz", state, next_frame_pos=5)
    restored, pos = load_tracker_state(tmp_path / "ckpt.npz")
    assert pos == 5
    state = restored
    for fi in range(5, f):
        state, _ = tracker_step(state, jnp.asarray(cents[fi]),
                                jnp.asarray(valid[fi]), jnp.int32(fi),
                                5, 10, 50.0, 1.0)

    for name in full_state._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(state, name)),
            np.asarray(getattr(full_state, name)), atol=1e-5,
            err_msg=name)
