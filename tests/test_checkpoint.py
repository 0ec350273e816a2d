"""Checkpoint/resume: chunked-scan exactness, snapshot roundtrip, and the
end-to-end interrupted-run -> resumed-run byte-identity of CSV artifacts.

The reference has no mid-pipeline checkpointing (stage outputs act as
implicit checkpoints; run_experiments.py:492-494 saves intermediate JSON);
SURVEY §5 names the tracker-state snapshot as the TPU framework's addition.
"""

from pathlib import Path

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

from radar_point_cloud_tracking_tpu.config import PipelineConfig
from radar_point_cloud_tracking_tpu.models.tracker import (
    run_tracking_pipeline,
)
from radar_point_cloud_tracking_tpu.ops.tracking import (
    grow_records,
    grow_state,
    track_sequence,
)
from radar_point_cloud_tracking_tpu.utils import checkpoint as ckpt

from tests.conftest import make_radar_csv

CSV_NAMES = ("tracked_objects.csv", "trajectories.csv", "clusters.csv")


# ---------------------------------------------------------------------------
# unit: chunked scan == single scan, grow-state padding invariance
# ---------------------------------------------------------------------------

def _random_scene(f=12, c=5, seed=0):
    rng = np.random.default_rng(seed)
    cents = rng.uniform(-100.0, 100.0, (f, c, 2)).astype(np.float32)
    valid = rng.random((f, c)) < 0.7
    fids = (np.arange(f, dtype=np.int32) * 2 + 1)  # id gaps like real frames
    return jnp.asarray(cents), jnp.asarray(valid), jnp.asarray(fids)


_KW = dict(history=5, max_missed=3, max_dist=60.0, stationary=1.0)


def _assert_state_equal(a, b):
    for name, la, lb in zip(a._fields, a, b):
        assert np.array_equal(np.asarray(la), np.asarray(lb)), name


def test_chunked_scan_bitexact():
    """Scanning [0,k) then [k,F) with the carried state must bit-match one
    [0,F) scan — the property checkpoint/resume rests on."""
    cents, valid, fids = _random_scene()
    f = cents.shape[0]
    st_full, rec_full = track_sequence(cents, valid, fids, max_objects=8,
                                       **_KW)
    for split in (1, 4, 5, 11):
        st = None
        parts = []
        for s in range(0, f, split):
            e = min(s + split, f)
            st, rec = track_sequence(cents[s:e], valid[s:e], fids[s:e],
                                     max_objects=8, init_state=st, **_KW)
            parts.append(jax.tree_util.tree_map(np.asarray, rec))
        _assert_state_equal(st_full, st)
        for k in rec_full:
            got = np.concatenate([p[k] for p in parts], axis=0)
            assert np.array_equal(np.asarray(rec_full[k]), got), (split, k)


def test_grow_state_padding_invariance():
    """A chunk tracked at table size O (no drops), then grown to 2O for the
    rest, must match the full scan at 2O after record padding — the per-chunk
    grow-and-retry contract."""
    cents, valid, fids = _random_scene(f=10, c=3, seed=3)
    st_full, rec_full = track_sequence(cents, valid, fids, max_objects=16,
                                       **_KW)
    st_small, rec1 = track_sequence(cents[:5], valid[:5], fids[:5],
                                    max_objects=8, **_KW)
    assert int(jnp.sum(rec1["dropped"])) == 0
    st_grown = grow_state(st_small, 16)
    st2, rec2 = track_sequence(cents[5:], valid[5:], fids[5:],
                               max_objects=16, init_state=st_grown, **_KW)
    _assert_state_equal(st_full, st2)
    rec1p = grow_records(jax.tree_util.tree_map(np.asarray, rec1), 16)
    rec2 = jax.tree_util.tree_map(np.asarray, rec2)
    for k in rec_full:
        got = np.concatenate([rec1p[k], rec2[k]], axis=0)
        assert np.array_equal(np.asarray(rec_full[k]), got), k


def test_tracker_snapshot_roundtrip(tmp_path):
    cents, valid, fids = _random_scene(f=6, c=4, seed=7)
    st, rec = track_sequence(cents, valid, fids, max_objects=8, **_KW)
    rec = jax.tree_util.tree_map(np.asarray, rec)
    ckpt.save_tracker_snapshot(tmp_path, st, 6, rec)
    loaded = ckpt.load_tracker_snapshot(tmp_path)
    assert loaded is not None
    st2, pos, rec2 = loaded
    assert pos == 6
    _assert_state_equal(st, st2)
    for k in rec:
        assert np.array_equal(rec[k], rec2[k]), k


def test_load_snapshot_missing_returns_none(tmp_path):
    assert ckpt.load_tracker_snapshot(tmp_path) is None


# ---------------------------------------------------------------------------
# end-to-end: interrupted + resumed == uninterrupted, byte-identical CSVs
# ---------------------------------------------------------------------------

@pytest.fixture()
def moving_dataset(tmp_path: Path) -> Path:
    """9-frame multi-gain dataset: one moving blob (boat) + one static blob
    + sub-threshold noise, so tracking produces non-trivial trajectories."""
    rng = np.random.default_rng(11)
    base = tmp_path / "data"
    num_echo = 64
    for gain in (40, 50, 75):
        gdir = base / f"gain_{gain}"
        gdir.mkdir(parents=True)
        for f in range(9):
            sec = 10 + f * 3

            def echo_fn(r, _rng=rng, _f=f):
                e = _rng.integers(0, 8, num_echo)
                if 10 <= r < 14:
                    # moving blob: 1 col (~7.7 m at scale 496) per frame —
                    # within eps_space=8 of the previous frame -> boat
                    c0 = 14 + _f
                    e[c0:c0 + 4] = 200
                if 30 <= r < 33 and _f < 7:
                    # static blob present in 7/9 frames: persistence
                    # 0.78 < 0.8 keeps it out of the land mask -> buoy
                    e[40:43] = 150
                return e

            make_radar_csv(
                gdir / f"20250813_1426{sec:02d}_000.csv",
                num_rows=48, num_echo=num_echo, gain=gain,
                angle_step=170.0, echo_fn=echo_fn)
    return base


def _cfg() -> PipelineConfig:
    cfg = PipelineConfig()
    cfg.radar.num_echo_columns = 64
    cfg.clustering.tile_size = 128
    cfg.land_filter.min_frames_required = 2
    return cfg


def _run_kw():
    return dict(min_samples=5, intensity_threshold=10.0, visualize=False,
                verbose=False)


def test_e2e_interrupt_resume_byte_identical(moving_dataset, tmp_path):
    out_a = tmp_path / "uninterrupted"
    res_a = run_tracking_pipeline(moving_dataset, out_a, config=_cfg(),
                                  **_run_kw())
    assert len(res_a.objects_rows()) >= 1  # non-trivial scene

    out_b = tmp_path / "resumed"
    ck = tmp_path / "ckpt"
    with pytest.raises(ckpt.CheckpointInterrupt) as ei:
        run_tracking_pipeline(moving_dataset, out_b, config=_cfg(),
                              checkpoint_dir=ck, checkpoint_every=3,
                              interrupt_after_frames=6, **_run_kw())
    assert ei.value.frames_done == 6
    assert (ck / ckpt.CLUSTER_STAGE_FILE).exists()
    assert (ck / ckpt.TRACKER_STATE_FILE).exists()
    # the interrupt fired before any artifact was written
    assert not (out_b / "tracked_objects.csv").exists()

    res_b = run_tracking_pipeline(moving_dataset, out_b, config=_cfg(),
                                  checkpoint_dir=ck, checkpoint_every=3,
                                  resume=True, **_run_kw())
    # resume skipped ingest + clustering: only checkpoint-load + tracking ran
    assert "st_dbscan" not in res_b.timings
    assert "load_checkpoint" in res_b.timings
    for name in CSV_NAMES:
        assert (out_a / name).read_bytes() == (out_b / name).read_bytes(), \
            name


def test_resume_param_mismatch_raises(moving_dataset, tmp_path):
    ck = tmp_path / "ckpt"
    run_tracking_pipeline(moving_dataset, tmp_path / "o1", config=_cfg(),
                          checkpoint_dir=ck, **_run_kw())
    with pytest.raises(ValueError, match="eps_space"):
        run_tracking_pipeline(moving_dataset, tmp_path / "o2", config=_cfg(),
                              checkpoint_dir=ck, resume=True, eps_space=9.5,
                              **_run_kw())


def test_resume_without_checkpoint_dir_raises(moving_dataset, tmp_path):
    with pytest.raises(ValueError, match="checkpoint-dir"):
        run_tracking_pipeline(moving_dataset, tmp_path / "o", config=_cfg(),
                              resume=True, **_run_kw())


def test_resume_after_completion_reproduces(moving_dataset, tmp_path):
    """Resuming a checkpoint whose tracking already finished re-emits the
    same artifacts without re-clustering."""
    out_a = tmp_path / "first"
    ck = tmp_path / "ckpt"
    run_tracking_pipeline(moving_dataset, out_a, config=_cfg(),
                          checkpoint_dir=ck, checkpoint_every=4, **_run_kw())
    out_b = tmp_path / "again"
    run_tracking_pipeline(moving_dataset, out_b, config=_cfg(),
                          checkpoint_dir=ck, resume=True, **_run_kw())
    for name in CSV_NAMES:
        assert (out_a / name).read_bytes() == (out_b / name).read_bytes(), \
            name


def test_checkpointed_run_matches_plain(moving_dataset, tmp_path):
    """Checkpointing on (chunked tracking scan) must not change artifacts."""
    out_a = tmp_path / "plain"
    run_tracking_pipeline(moving_dataset, out_a, config=_cfg(), **_run_kw())
    out_b = tmp_path / "chunked"
    run_tracking_pipeline(moving_dataset, out_b, config=_cfg(),
                          checkpoint_dir=tmp_path / "ck", checkpoint_every=2,
                          **_run_kw())
    for name in CSV_NAMES:
        assert (out_a / name).read_bytes() == (out_b / name).read_bytes(), \
            name


def test_resume_with_visualization(moving_dataset, tmp_path):
    """A resumed run can render the tracking plots (the _ResumedSequence
    shim must satisfy everything the viz path reads)."""
    pytest.importorskip("matplotlib")
    ck = tmp_path / "ckpt"
    run_tracking_pipeline(moving_dataset, tmp_path / "o1", config=_cfg(),
                          checkpoint_dir=ck, **_run_kw())
    out = tmp_path / "o2"
    kw = _run_kw()
    kw["visualize"] = True
    run_tracking_pipeline(moving_dataset, out, config=_cfg(),
                          checkpoint_dir=ck, resume=True, **kw)
    viz = out / "visualizations"
    assert viz.exists() and list(viz.glob("*.png"))


def test_sharded_checkpoint_then_resume(moving_dataset, tmp_path):
    """A sharded run with --checkpoint-dir snapshots the (gathered) cluster
    stage + final tracker state once its single program completes; --resume
    then re-emits every artifact byte-identically — to the sharded run AND
    to a plain single-chip run (the sharded engine exact-matches it)."""
    out_a = tmp_path / "single"
    run_tracking_pipeline(moving_dataset, out_a, config=_cfg(), **_run_kw())

    cfg = _cfg()
    cfg.device.num_devices = 4
    out_b = tmp_path / "sharded"
    ck = tmp_path / "ckpt"
    run_tracking_pipeline(moving_dataset, out_b, config=cfg,
                          checkpoint_dir=ck, **_run_kw())
    assert (ck / ckpt.CLUSTER_STAGE_FILE).exists()
    assert (ck / ckpt.TRACKER_STATE_FILE).exists()

    out_c = tmp_path / "resumed"
    run_tracking_pipeline(moving_dataset, out_c, config=_cfg(),
                          checkpoint_dir=ck, resume=True, **_run_kw())
    for name in CSV_NAMES:
        ref = (out_a / name).read_bytes()
        assert ref == (out_b / name).read_bytes(), name
        assert ref == (out_c / name).read_bytes(), name


def test_sharded_interrupt_hook_rejected(moving_dataset, tmp_path):
    """The mid-scan preemption hook needs the chunked single-chip scan; the
    sharded one-program pipeline rejects it with an actionable error."""
    cfg = _cfg()
    cfg.device.num_devices = 4
    with pytest.raises(ValueError, match="interrupt-after-frames"):
        run_tracking_pipeline(moving_dataset, tmp_path / "o", config=cfg,
                              checkpoint_dir=tmp_path / "ck",
                              interrupt_after_frames=3, **_run_kw())


# ---------------------------------------------------------------------------
# denoiser: cluster-stage artifact checkpoint + byte-identical resume
# ---------------------------------------------------------------------------

DENOISE_ARTIFACTS = ("denoising_stats.csv", "clusters.csv",
                     "denoised_point_cloud.ply", "raw_point_cloud.ply")


def _denoise_kw():
    return dict(min_samples=5, min_frames=2, intensity_threshold=10.0,
                no_viz=True, skip_gif=True, max_frames=0, verbose=False)


def test_denoise_interrupt_resume_byte_identical(moving_dataset, tmp_path):
    from radar_point_cloud_tracking_tpu.models.denoiser import (
        run_denoising_pipeline,
    )

    out_a = tmp_path / "uninterrupted"
    res_a = run_denoising_pipeline(moving_dataset, out_a, config=_cfg(),
                                   **_denoise_kw())
    assert res_a.num_clusters >= 1  # non-trivial scene

    out_b = tmp_path / "resumed"
    ck = tmp_path / "ckpt"
    with pytest.raises(ckpt.CheckpointInterrupt):
        run_denoising_pipeline(moving_dataset, out_b, config=_cfg(),
                               checkpoint_dir=ck,
                               interrupt_after_cluster=True, **_denoise_kw())
    assert (ck / ckpt.DENOISE_STAGE_FILE).exists()
    # the interrupt fired before any artifact was written
    assert not (out_b / "denoising_stats.csv").exists()

    res_b = run_denoising_pipeline(moving_dataset, out_b, config=_cfg(),
                                   checkpoint_dir=ck, resume=True,
                                   **_denoise_kw())
    # resume skipped ingest + clustering
    assert "st_dbscan" not in res_b.timings
    assert "load_checkpoint" in res_b.timings
    assert res_b.stats == res_a.stats
    for name in DENOISE_ARTIFACTS:
        assert (out_a / name).read_bytes() == (out_b / name).read_bytes(), \
            name


def test_denoise_sharded_checkpoint_then_resume(moving_dataset, tmp_path):
    """A sharded denoise run with --checkpoint-dir writes the same gathered
    cluster-stage artifact; --resume re-emits artifacts byte-identically to
    BOTH the sharded run and a plain single-chip run."""
    from radar_point_cloud_tracking_tpu.models.denoiser import (
        run_denoising_pipeline,
    )

    out_a = tmp_path / "single"
    run_denoising_pipeline(moving_dataset, out_a, config=_cfg(),
                           **_denoise_kw())

    out_b = tmp_path / "sharded"
    ck = tmp_path / "ckpt"
    run_denoising_pipeline(moving_dataset, out_b, config=_cfg(), devices=4,
                           checkpoint_dir=ck, **_denoise_kw())
    assert (ck / ckpt.DENOISE_STAGE_FILE).exists()

    out_c = tmp_path / "resumed"
    run_denoising_pipeline(moving_dataset, out_c, config=_cfg(),
                           checkpoint_dir=ck, resume=True, **_denoise_kw())
    for name in DENOISE_ARTIFACTS:
        ref = (out_a / name).read_bytes()
        assert ref == (out_b / name).read_bytes(), name
        assert ref == (out_c / name).read_bytes(), name


def test_denoise_resume_param_mismatch_raises(moving_dataset, tmp_path):
    from radar_point_cloud_tracking_tpu.models.denoiser import (
        run_denoising_pipeline,
    )

    ck = tmp_path / "ckpt"
    run_denoising_pipeline(moving_dataset, tmp_path / "o1", config=_cfg(),
                           checkpoint_dir=ck, **_denoise_kw())
    kw = _denoise_kw()
    kw["min_frames"] = 3
    with pytest.raises(ValueError, match="min_frames"):
        run_denoising_pipeline(moving_dataset, tmp_path / "o2", config=_cfg(),
                               checkpoint_dir=ck, resume=True, **kw)


def test_denoise_resume_without_checkpoint_dir_raises(moving_dataset,
                                                      tmp_path):
    from radar_point_cloud_tracking_tpu.models.denoiser import (
        run_denoising_pipeline,
    )

    with pytest.raises(ValueError, match="checkpoint-dir"):
        run_denoising_pipeline(moving_dataset, tmp_path / "o", config=_cfg(),
                               resume=True, **_denoise_kw())


def test_denoise_resume_with_viz(moving_dataset, tmp_path):
    """A resumed run can render the denoise plots (the artifact carries
    everything the viz path reads: points incl. frame ids, labels)."""
    pytest.importorskip("matplotlib")
    from radar_point_cloud_tracking_tpu.models.denoiser import (
        run_denoising_pipeline,
    )

    ck = tmp_path / "ckpt"
    run_denoising_pipeline(moving_dataset, tmp_path / "o1", config=_cfg(),
                           checkpoint_dir=ck, **_denoise_kw())
    out = tmp_path / "o2"
    kw = _denoise_kw()
    kw["no_viz"] = False
    run_denoising_pipeline(moving_dataset, out, config=_cfg(),
                           checkpoint_dir=ck, resume=True, **kw)
    assert list(out.glob("*.png"))


def test_denoise_cli_checkpoint_resume(moving_dataset, tmp_path):
    """CLI wiring: denoise --checkpoint-dir + hidden
    --interrupt-after-cluster, then denoise --resume, byte-identical to a
    plain CLI run."""
    from click.testing import CliRunner

    from radar_point_cloud_tracking_tpu.cli.main import cli

    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(
        "radar:\n  num_echo_columns: 64\n"
        "clustering:\n  tile_size: 128\n")
    runner = CliRunner()
    base = ["-c", str(cfg_path), "denoise", "--data-dir",
            str(moving_dataset), "--min-samples", "5", "--min-frames", "2",
            "--max-frames", "0", "--no-viz", "--skip-gif"]
    out_a = tmp_path / "plain"
    r = runner.invoke(cli, base + ["--output-dir", str(out_a)])
    assert r.exit_code == 0, r.output

    out_b = tmp_path / "ckpt_run"
    ck = tmp_path / "ck"
    r = runner.invoke(cli, base + [
        "--output-dir", str(out_b), "--checkpoint-dir", str(ck),
        "--interrupt-after-cluster"])
    assert r.exit_code != 0  # simulated preemption
    assert isinstance(r.exception, ckpt.CheckpointInterrupt)

    r = runner.invoke(cli, base + [
        "--output-dir", str(out_b), "--checkpoint-dir", str(ck), "--resume"])
    assert r.exit_code == 0, r.output
    for name in DENOISE_ARTIFACTS:
        assert (out_a / name).read_bytes() == (out_b / name).read_bytes(), \
            name


def test_track_cli_checkpoint_resume(moving_dataset, tmp_path):
    """CLI wiring: track --checkpoint-dir + hidden --interrupt-after-frames,
    then track --resume, byte-identical to a plain CLI run."""
    from click.testing import CliRunner

    from radar_point_cloud_tracking_tpu.cli.main import cli

    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(
        "radar:\n  num_echo_columns: 64\n"
        "clustering:\n  tile_size: 128\n"
        "land_filter:\n  min_frames_required: 2\n")
    runner = CliRunner()
    base = ["-c", str(cfg_path), "track", "--data-dir", str(moving_dataset),
            "--min-samples", "5", "--intensity-threshold", "10", "--no-viz"]
    out_a = tmp_path / "plain"
    r = runner.invoke(cli, base + ["--output-dir", str(out_a)])
    assert r.exit_code == 0, r.output

    out_b = tmp_path / "ckpt_run"
    ck = tmp_path / "ck"
    r = runner.invoke(cli, base + [
        "--output-dir", str(out_b), "--checkpoint-dir", str(ck),
        "--checkpoint-every", "3", "--interrupt-after-frames", "6"])
    assert r.exit_code != 0  # simulated preemption
    assert isinstance(r.exception, ckpt.CheckpointInterrupt)

    r = runner.invoke(cli, base + [
        "--output-dir", str(out_b), "--checkpoint-dir", str(ck), "--resume"])
    assert r.exit_code == 0, r.output
    for name in CSV_NAMES:
        assert (out_a / name).read_bytes() == (out_b / name).read_bytes(), \
            name


def test_denoise_resume_ingest_param_mismatch_raises(moving_dataset,
                                                     tmp_path):
    """The artifact's contents depend on the ingest knobs too: resuming
    with a different max_frames must fail loudly, not silently re-emit the
    old run's outputs."""
    from radar_point_cloud_tracking_tpu.models.denoiser import (
        run_denoising_pipeline,
    )

    ck = tmp_path / "ckpt"
    kw = _denoise_kw()
    kw["max_frames"] = 4
    run_denoising_pipeline(moving_dataset, tmp_path / "o1", config=_cfg(),
                           checkpoint_dir=ck, **kw)
    kw["max_frames"] = 0
    with pytest.raises(ValueError, match="max_frames"):
        run_denoising_pipeline(moving_dataset, tmp_path / "o2", config=_cfg(),
                               checkpoint_dir=ck, resume=True, **kw)


def test_resume_ingest_param_mismatch_raises(moving_dataset, tmp_path):
    """Tracker analog: point_stride changes what the artifact would have
    contained, so resume under a different stride is refused."""
    ck = tmp_path / "ckpt"
    run_tracking_pipeline(moving_dataset, tmp_path / "o1", config=_cfg(),
                          checkpoint_dir=ck, point_stride=4, **_run_kw())
    with pytest.raises(ValueError, match="point_stride"):
        run_tracking_pipeline(moving_dataset, tmp_path / "o2", config=_cfg(),
                              checkpoint_dir=ck, resume=True, point_stride=2,
                              **_run_kw())


def test_denoise_resume_missing_checkpoint_runs_from_scratch(moving_dataset,
                                                             tmp_path):
    """--resume with an empty checkpoint dir (a run preempted before the
    artifact landed) must fall back to a from-scratch run, mirroring
    run_tracking_pipeline — and produce identical artifacts to a plain run."""
    from radar_point_cloud_tracking_tpu.models.denoiser import (
        run_denoising_pipeline,
    )

    out_a = tmp_path / "plain"
    run_denoising_pipeline(moving_dataset, out_a, config=_cfg(),
                           **_denoise_kw())
    out_b = tmp_path / "fallback"
    ck = tmp_path / "empty_ck"
    run_denoising_pipeline(moving_dataset, out_b, config=_cfg(),
                           checkpoint_dir=ck, resume=True, **_denoise_kw())
    # the fallback run completed AND saved the checkpoint it was asked for
    assert (ck / ckpt.DENOISE_STAGE_FILE).exists()
    for name in ("denoising_stats.csv", "clusters.csv"):
        assert (out_a / name).read_bytes() == (out_b / name).read_bytes(), \
            name


def test_stage_artifact_write_is_atomic(tmp_path):
    """save_stage_artifact lands via tmp+rename: no .tmp file survives, and
    an interrupted write (simulated by pre-seeding a stale artifact) never
    leaves a truncated file at the final path."""
    path = tmp_path / "stage.npz"
    ckpt.save_stage_artifact(path, a=np.arange(5), b=np.ones((2, 2)))
    assert path.exists()
    assert not list(tmp_path.glob("*.tmp.npz"))
    art = ckpt.load_stage_artifact(path)
    assert np.array_equal(art["a"], np.arange(5))
    # overwrite keeps the same discipline
    ckpt.save_stage_artifact(path, a=np.arange(3))
    assert np.array_equal(ckpt.load_stage_artifact(path)["a"], np.arange(3))
    assert not list(tmp_path.glob("*.tmp.npz"))
