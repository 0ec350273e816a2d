"""Experiment harness + synthetic data generation."""

from .harness import (  # noqa: F401
    DEFAULT_EXPERIMENTS,
    ExperimentSpec,
    generate_latex_report,
    run_experiment,
    run_experiments,
)
from .synthetic import SceneConfig, generate_scene_dataset  # noqa: F401
