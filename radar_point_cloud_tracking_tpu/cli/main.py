"""radar-tpu command line interface.

Mirrors the reference CLI surface (radar-pipeline cli/main.py:17-257:
sort-by-gain / filter-range / convert / build / visualize / cluster) and
adds the script-level drivers as subcommands: ``track`` (the temporal object
tracker, 4_temporal_object_tracker.py:1041-1101), ``denoise`` (the
ST-DBSCAN denoising pipeline, stdbscan_denoising_pipeline.py:1111-1173) and
``fuse`` (the gain-fusion PLY builder, 5_gain_fusion_ply_builder.py:680-737).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import click

from .. import __version__
from ..config import PipelineConfig


def _load_config(ctx) -> PipelineConfig:
    return ctx.obj["config"]


@click.group()
@click.option("-c", "--config", "config_path",
              type=click.Path(exists=True, path_type=Path),
              help="Path to YAML config file.")
@click.option("-v", "--verbose", count=True, help="Increase verbosity.")
@click.version_option(version=__version__)
@click.pass_context
def cli(ctx: click.Context, config_path: Optional[Path], verbose: int) -> None:
    """TPU-native radar point cloud processing pipeline."""
    from ..utils.logging import configure_logging

    ctx.ensure_object(dict)
    ctx.obj["config"] = (PipelineConfig.from_yaml(config_path)
                         if config_path else PipelineConfig())
    ctx.obj["verbose"] = verbose
    configure_logging(verbose)


@cli.command("sort-by-gain")
@click.argument("directory", type=click.Path(exists=True, path_type=Path))
@click.option("--dry-run", is_flag=True,
              help="Preview the moves without touching any files.")
@click.pass_context
def sort_by_gain(ctx, directory: Path, dry_run: bool) -> None:
    """Group radar CSVs into per-gain folders (gain_40/50/75)."""
    from ..processors.sorting import move_files_to_gain_folders

    cfg = _load_config(ctx)
    moved = move_files_to_gain_folders(directory, cfg.gains.values,
                                       dry_run=dry_run)
    total = sum(len(v) for v in moved.values())
    if dry_run:
        click.echo(f"Would move {total} file(s) into gain folders.")
    else:
        click.echo(f"Sorted {total} file(s) into gain folders.")


@cli.command("filter-range")
@click.argument("directory", type=click.Path(exists=True, path_type=Path))
@click.option("--ranges", "-r", multiple=True, type=int, default=[1, 2],
              help="Range field values whose files should be deleted.")
@click.option("--dry-run", is_flag=True,
              help="Preview the deletions without touching any files.")
@click.pass_context
def filter_range(ctx, directory: Path, ranges, dry_run: bool) -> None:
    """Delete radar CSVs whose Range column matches the given values."""
    from ..processors.filtering import remove_files_by_range

    cfg = _load_config(ctx)
    removed = remove_files_by_range(directory, set(ranges), cfg.gains.values,
                                    dry_run=dry_run)
    if dry_run:
        click.echo(f"Would remove {len(removed)} file(s).")
    else:
        click.echo(f"Deleted {len(removed)} file(s).")


@cli.command("convert")
@click.argument("input_path", type=click.Path(exists=True, path_type=Path))
@click.argument("output_path", type=click.Path(path_type=Path))
@click.option("--threshold", "-t", type=float, default=0.0,
              help="Minimum echo intensity to keep.")
@click.option("--batch/--single", default=False,
              help="Convert timestamp-aligned per-gain trios in one pass.")
@click.option("--limit", type=int,
              help="Cap on the number of files converted in batch mode.")
@click.pass_context
def convert(ctx, input_path: Path, output_path: Path, threshold: float,
            batch: bool, limit: Optional[int]) -> None:
    """Project radar sweep CSVs into Cartesian point coordinates."""
    cfg = _load_config(ctx)
    if batch:
        from ..processors.cartesian import convert_batch_aligned

        convert_batch_aligned(input_path, output_path, cfg.gains.values,
                              threshold, limit, cfg.radar)
        click.echo("Batch conversion finished.")
    else:
        from ..processors.cartesian import convert_single_csv

        n = convert_single_csv(input_path, output_path, threshold, cfg.radar)
        click.echo(f"Wrote {n:,} Cartesian points -> {output_path}")


@cli.command("build")
@click.argument("input_dir", type=click.Path(exists=True, path_type=Path))
@click.argument("output_dir", type=click.Path(path_type=Path))
@click.option("--flat/--no-flat", default=True, help="Generate flat stack.")
@click.option("--offset/--no-offset", default=True,
              help="Generate offset stack.")
@click.option("--plot/--no-plot", default=True, help="Generate PNG previews.")
@click.pass_context
def build(ctx, input_dir: Path, output_dir: Path, flat: bool, offset: bool,
          plot: bool) -> None:
    """Build stacked PLY point clouds from per-gain CSVs."""
    from ..models.stack_builder import build_stacked_clouds

    cfg = _load_config(ctx)
    outputs = build_stacked_clouds(
        input_dir, output_dir, cfg.processing, cfg.gains, cfg.radar,
        generate_flat=flat, generate_offset=offset)
    if plot:
        from ..viz.plotting import plot_ply_preview

        for name, ply_path in outputs.items():
            png = plot_ply_preview(ply_path,
                                   max_points=cfg.processing.plot_max_points)
            click.echo(f"Plot saved: {png.name}")
    click.echo("Build complete.")


@cli.command("visualize")
@click.argument("ply_path", type=click.Path(exists=True, path_type=Path))
@click.option("--output", "-o", type=click.Path(path_type=Path),
              help="Output PNG path (single-file mode).")
@click.option("--max-points", type=int, default=1_000_000,
              help="Maximum points to plot.")
@click.option("--alpha", type=float, default=0.5, help="Marker opacity.")
@click.option("--raster", is_flag=True,
              help="Use the device rasterizer instead of matplotlib.")
@click.pass_context
def visualize(ctx, ply_path: Path, output: Optional[Path], max_points: int,
              alpha: float, raster: bool) -> None:
    """Generate PNG previews from a PLY file or every PLY in a directory."""
    from ..core.loaders import load_ply
    from ..viz.plotting import plot_ply_preview
    from ..viz.raster import render_scatter_png

    targets = (sorted(ply_path.glob("*.ply")) if ply_path.is_dir()
               else [ply_path])
    if not targets:
        click.echo("No PLY files found.")
        return
    for ply_file in targets:
        if raster:
            cloud = load_ply(ply_file)
            out = render_scatter_png(
                output or ply_file.with_suffix(".png"),
                cloud.x, cloud.y, colors=cloud.colors)
        else:
            out = plot_ply_preview(ply_file, output if len(targets) == 1
                                   else None, max_points, alpha)
        click.echo(f"Preview saved to {out}")


@cli.command("cluster")
@click.argument("ply_file", type=click.Path(exists=True, path_type=Path))
@click.option("--output-dir", "-o", type=click.Path(path_type=Path),
              help="Output directory.")
@click.option("--eps-space", type=float, help="Spatial epsilon.")
@click.option("--eps-time", type=float, help="Temporal epsilon.")
@click.option("--min-samples", type=int, help="Minimum samples per cluster.")
@click.option("--max-points", type=int, help="Maximum points to process.")
@click.option("--plot/--no-plot", default=True,
              help="Generate PNG visualization.")
@click.pass_context
def cluster(ctx, ply_file: Path, output_dir: Optional[Path],
            eps_space: Optional[float], eps_time: Optional[float],
            min_samples: Optional[int], max_points: Optional[int],
            plot: bool) -> None:
    """Run ST-DBSCAN clustering on a PLY point cloud."""
    from ..models.cluster_ply import process_ply_clustering

    cfg = _load_config(ctx)
    ccfg = cfg.clustering.model_copy()
    if eps_space is not None:
        ccfg.eps_space = eps_space
    if eps_time is not None:
        ccfg.eps_time = eps_time
    if min_samples is not None:
        ccfg.min_samples = min_samples
    if max_points is not None:
        ccfg.max_points = max_points
    if output_dir is None:
        output_dir = ply_file.parent

    csv_path, labels = process_ply_clustering(ply_file, output_dir, ccfg,
                                              cfg.gains)
    if plot:
        from ..core.loaders import load_ply
        from ..viz.plotting import plot_labeled_cloud

        cloud = load_ply(ply_file)
        n = min(cloud.size, len(labels))
        png = Path(output_dir) / f"{ply_file.stem}_dbscan_labels.png"
        plot_labeled_cloud(png, cloud.to_coords()[:n], labels[:n],
                           cloud.colors[:n] if cloud.colors is not None else None,
                           title=f"ST-DBSCAN: {ply_file.name}",
                           max_points=cfg.processing.plot_max_points)
        click.echo(f"Plot saved: {png}")
    click.echo(f"Clustering complete. Labels saved to {csv_path}")


@cli.command("track")
@click.option("--data-dir", type=click.Path(exists=True, path_type=Path),
              required=True, help="Directory containing gain subdirectories.")
@click.option("--output-dir", type=click.Path(path_type=Path), required=True)
@click.option("--max-frames", type=int, default=0,
              help="Maximum frames to process (0 = all).")
@click.option("--no-land-filter", is_flag=True, help="Skip land filtering.")
@click.option("--no-viz", is_flag=True, help="Skip visualizations.")
@click.option("--eps-space", type=float, default=8.0)
@click.option("--eps-time", type=float, default=2.0)
@click.option("--min-samples", type=int, default=15)
@click.option("--intensity-threshold", type=float, default=10.0)
@click.option("--devices", type=int, default=0,
              help="Shard the pipeline over this many devices of a frame-"
                   "axis mesh (0/1 = single chip).")
@click.option("--checkpoint-dir", type=click.Path(path_type=Path),
              default=None,
              help="Write stage-artifact + tracker-state checkpoints here "
                   "(cluster stage once done; tracker snapshot every "
                   "--checkpoint-every frames).")
@click.option("--checkpoint-every", type=int, default=0,
              help="Tracker snapshot cadence in frames (0 = snapshot only "
                   "when tracking completes).")
@click.option("--resume", is_flag=True,
              help="Resume from --checkpoint-dir: skips ingest + clustering "
                   "and already-tracked frames; outputs are byte-identical "
                   "to an uninterrupted run.")
@click.option("--interrupt-after-frames", type=int, default=0, hidden=True,
              help="Testing/ops hook: simulate preemption after this many "
                   "tracked frames (right after the covering snapshot).")
@click.option("--parse-workers", type=int, default=None,
              help="Host CSV parse thread count (0 = auto from CPU count; "
                   "1 = sequential).")
@click.pass_context
def track(ctx, data_dir: Path, output_dir: Path, max_frames: int,
          no_land_filter: bool, no_viz: bool, eps_space: float,
          eps_time: float, min_samples: int,
          intensity_threshold: float, devices: int,
          checkpoint_dir: Optional[Path], checkpoint_every: int,
          resume: bool, interrupt_after_frames: int,
          parse_workers: Optional[int]) -> None:
    """Run the temporal object tracking pipeline."""
    from ..models.tracker import run_tracking_pipeline
    from ..utils.logging import CommandTimer, print_summary

    cfg = _load_config(ctx)
    if devices:
        cfg = cfg.model_copy(deep=True)
        cfg.device.num_devices = devices
    timer = CommandTimer()
    result = run_tracking_pipeline(
        data_dir, output_dir, max_frames=max_frames,
        skip_land_filter=no_land_filter, visualize=not no_viz,
        eps_space=eps_space, eps_time=eps_time, min_samples=min_samples,
        intensity_threshold=intensity_threshold, config=cfg,
        checkpoint_dir=checkpoint_dir, checkpoint_every=checkpoint_every,
        resume=resume, interrupt_after_frames=interrupt_after_frames,
        parse_workers=parse_workers)
    rows = {
        "Frames": str(result.ingested.num_frames),
        "Points": f"{result.n_points:,}",
        "Clusters": str(result.num_clusters),
        "Objects": str(len(result.objects_rows())),
    }
    rows[timer.row()[0]] = timer.row()[1]
    print_summary("Tracking complete", rows)


@cli.command("denoise")
@click.option("--data-dir", type=click.Path(exists=True, path_type=Path),
              required=True, help="Directory containing gain_XX folders.")
@click.option("--output-dir", type=click.Path(path_type=Path), required=True)
@click.option("--eps-space", type=float, default=8.0)
@click.option("--eps-time", type=float, default=2.0)
@click.option("--min-samples", type=int, default=15)
@click.option("--min-frames", type=int, default=2,
              help="Minimum frames a cluster must span.")
@click.option("--max-frames", type=int, default=5,
              help="Maximum frames to process (0 = all).")
@click.option("--no-viz", is_flag=True, help="Skip visualizations.")
@click.option("--skip-gif", is_flag=True, help="Skip GIF generation.")
@click.option("--devices", type=int, default=0,
              help="Shard the clustering over this many devices of a "
                   "frame-axis mesh (0/1 = single chip).")
@click.option("--low-memory", is_flag=True,
              help="Free the padded device ingest buffers after repack "
                   "(host RAM is bounded by the streaming parse window "
                   "either way — the TPU equivalent of the reference "
                   "denoiser's free-and-reload --low-memory).")
@click.option("--parse-workers", type=int, default=None,
              help="Host CSV parse thread count (0 = auto from CPU count; "
                   "1 = sequential, the reference's --no-parallel).")
@click.option("--checkpoint-dir", type=click.Path(path_type=Path),
              default=None,
              help="Persist the cluster-stage artifact here once clustering "
                   "completes (everything downstream is a pure function of "
                   "it).")
@click.option("--resume", is_flag=True,
              help="Resume from --checkpoint-dir: skips ingest + clustering "
                   "and regenerates the outputs byte-identically to an "
                   "uninterrupted run.")
@click.option("--interrupt-after-cluster", is_flag=True, hidden=True,
              help="Testing/ops hook: simulate preemption right after the "
                   "cluster-stage checkpoint lands, before outputs.")
@click.pass_context
def denoise(ctx, data_dir: Path, output_dir: Path, eps_space: float,
            eps_time: float, min_samples: int, min_frames: int,
            max_frames: int, no_viz: bool, skip_gif: bool,
            devices: int, low_memory: bool,
            parse_workers: Optional[int], checkpoint_dir: Optional[Path],
            resume: bool, interrupt_after_cluster: bool) -> None:
    """Run the ST-DBSCAN denoising pipeline."""
    from ..models.denoiser import run_denoising_pipeline

    run_denoising_pipeline(
        data_dir, output_dir, eps_space=eps_space, eps_time=eps_time,
        min_samples=min_samples, min_frames=min_frames,
        max_frames=max_frames, no_viz=no_viz, skip_gif=skip_gif,
        config=_load_config(ctx), devices=devices, low_memory=low_memory,
        parse_workers=parse_workers, checkpoint_dir=checkpoint_dir,
        resume=resume, interrupt_after_cluster=interrupt_after_cluster)


@cli.command("fuse")
@click.argument("mode", type=click.Choice(["individual", "stacked",
                                           "comparison"]))
@click.option("--data-dir", type=click.Path(exists=True, path_type=Path),
              required=True)
@click.option("--output-dir", type=click.Path(path_type=Path), required=True)
@click.option("--max-frames", type=int, default=0)
@click.option("--fusion-mode", type=click.Choice(["absolute", "max"]),
              default="absolute")
@click.option("--time-spacing", type=float, default=10.0,
              help="Z spacing between stacked frames.")
@click.option("--frame", type=int, default=0,
              help="Frame index for comparison mode.")
@click.pass_context
def fuse(ctx, mode: str, data_dir: Path, output_dir: Path, max_frames: int,
         fusion_mode: str, time_spacing: float, frame: int) -> None:
    """Build gain-fused PLY point clouds."""
    from ..models import fusion_builder as fb

    cfg = _load_config(ctx)
    if mode == "individual":
        n = fb.build_individual_frames(data_dir, output_dir, max_frames,
                                       fusion_mode, cfg)
        click.echo(f"Wrote {n} frame PLYs.")
    elif mode == "stacked":
        path = fb.build_stacked_sequence(data_dir, output_dir,
                                         max_frames or 100, time_spacing,
                                         fusion_mode, cfg)
        click.echo(f"Stacked PLY: {path}")
    else:
        outputs = fb.build_gain_comparison(data_dir, output_dir, frame, cfg)
        click.echo(f"Wrote {len(outputs)} comparison PLYs.")


@cli.command("experiment")
@click.option("--data-dir", type=click.Path(exists=True, path_type=Path),
              required=True, help="Directory containing gain_XX folders.")
@click.option("--output-dir", type=click.Path(path_type=Path), required=True)
@click.option("--max-frames", type=int, default=10)
@click.option("--quick", is_flag=True,
              help="Run only the default parameter set.")
@click.pass_context
def experiment(ctx, data_dir: Path, output_dir: Path, max_frames: int,
               quick: bool) -> None:
    """Run the ST-DBSCAN parameter-comparison experiment sweep
    (JSON + LaTeX report + summary charts)."""
    from ..experiments.harness import DEFAULT_EXPERIMENTS, run_experiments

    specs = DEFAULT_EXPERIMENTS[:1] if quick else DEFAULT_EXPERIMENTS
    results = run_experiments(data_dir, output_dir, specs,
                              max_frames=max_frames,
                              config=_load_config(ctx))
    click.echo(f"Completed {len(results)} experiments -> {output_dir}")


if __name__ == "__main__":
    cli()
