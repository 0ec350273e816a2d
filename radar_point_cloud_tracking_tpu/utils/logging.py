"""Verbosity-mapped logging + box-drawn command summaries.

Parity with the native CLI's observability (env_logger verbosity mapping and
box-drawing `print_summary` in the reference's native CLI, cli/mod.rs:137-165)
plus the Python scripts' stage banners.
"""

from __future__ import annotations

import logging
import sys
import time
from typing import Dict, Optional, Tuple

__all__ = ["configure_logging", "banner", "print_summary", "CommandTimer"]

_LEVELS = {0: logging.WARNING, 1: logging.INFO, 2: logging.DEBUG}


def configure_logging(verbosity: int = 0) -> logging.Logger:
    """-v count -> WARNING/INFO/DEBUG, like the reference CLI mapping."""
    level = _LEVELS.get(min(verbosity, 2), logging.DEBUG)
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname)-7s %(name)s: %(message)s",
        stream=sys.stderr,
        force=True,
    )
    return logging.getLogger("radar_tpu")


def banner(title: str, step: Optional[Tuple[int, int]] = None) -> str:
    """Stage banner like the scripts' ``[1/6] ...`` headers."""
    prefix = f"[{step[0]}/{step[1]}] " if step else ""
    return f"{prefix}{title}"


def print_summary(title: str, rows: Dict[str, str], stream=None) -> None:
    """Box-drawn key/value summary."""
    if stream is None:  # bind at call time so output redirection works
        stream = sys.stdout
    width = max([len(title)] + [len(k) + len(str(v)) + 3
                                for k, v in rows.items()]) + 2
    print("┌" + "─" * width + "┐", file=stream)
    print(f"│ {title.ljust(width - 1)}│", file=stream)
    print("├" + "─" * width + "┤", file=stream)
    for key, value in rows.items():
        line = f"{key}: {value}"
        print(f"│ {line.ljust(width - 1)}│", file=stream)
    print("└" + "─" * width + "┘", file=stream)


class CommandTimer:
    """Wall-clock per command with a Duration row for summaries."""

    def __init__(self) -> None:
        self._t0 = time.perf_counter()

    @property
    def duration(self) -> float:
        return time.perf_counter() - self._t0

    def row(self) -> Tuple[str, str]:
        return "Duration", f"{self.duration:.2f}s"
