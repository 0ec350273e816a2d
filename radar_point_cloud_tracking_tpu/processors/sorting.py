"""File organization stage: sort raw CSV captures into gain_NN folders.

Capability parity with radar-pipeline processors/sorting.py:12-125 and the
legacy (.125NM)…/0_Sort_Files_By_Gain.py script: sniff the Gain column from
the first data row, group or move files accordingly, with dry-run support.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional, Tuple

from ..config import GainConfig

__all__ = ["sniff_gain", "sort_files_by_gain", "move_files_to_gain_folders"]


def sniff_gain(csv_path: Path) -> Optional[int]:
    """Gain value (4th column) of the first data row, or None."""
    try:
        with Path(csv_path).open("r", newline="") as fh:
            fh.readline()  # header
            row = fh.readline().strip()
    except OSError:
        return None
    if not row:
        return None
    fields = row.split(",")
    if len(fields) < 4:
        return None
    try:
        return int(float(fields[3]))
    except ValueError:
        return None


def sort_files_by_gain(
    source_dir: Path,
    gains: Optional[Tuple[int, ...]] = None,
) -> Dict[int, List[Path]]:
    """Group CSVs by sniffed gain without moving anything."""
    if gains is None:
        gains = GainConfig().values
    grouped: Dict[int, List[Path]] = {g: [] for g in gains}
    for csv_path in sorted(Path(source_dir).glob("*.csv")):
        gain = sniff_gain(csv_path)
        if gain in grouped:
            grouped[gain].append(csv_path)
    return grouped


def move_files_to_gain_folders(
    source_dir: Path,
    gains: Optional[Tuple[int, ...]] = None,
    dry_run: bool = False,
    verbose: bool = True,
) -> Dict[int, List[Path]]:
    """Move CSVs into ``gain_NN/`` subdirectories by sniffed gain.

    With ``dry_run`` nothing moves; the returned mapping lists the files that
    would move (at their current locations).
    """
    source_dir = Path(source_dir)
    if gains is None:
        gains = GainConfig().values
    moved: Dict[int, List[Path]] = {g: [] for g in gains}

    if not dry_run:
        for g in gains:
            (source_dir / f"gain_{g}").mkdir(parents=True, exist_ok=True)

    for csv_path in sorted(source_dir.glob("*.csv")):
        gain = sniff_gain(csv_path)
        if gain not in moved:
            continue
        dest = source_dir / f"gain_{gain}" / csv_path.name
        if dry_run:
            if verbose:
                print(f"[dry-run] {csv_path.name}: gain {gain} "
                      f"-> gain_{gain}/")
            moved[gain].append(csv_path)
        else:
            csv_path.rename(dest)
            if verbose:
                print(f"{csv_path.name}: gain {gain} -> gain_{gain}/")
            moved[gain].append(dest)
    return moved
