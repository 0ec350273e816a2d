"""File filtering stage: remove captures with unwanted Range settings.

Capability parity with radar-pipeline processors/filtering.py:12-141 and the
legacy remove_range_1&2_csvs.py script: sniff the Range column (3rd) of the
first data row, find or delete matching files across gain folders, with
dry-run support.
"""

from __future__ import annotations

from pathlib import Path
from typing import Iterable, List, Optional, Set, Tuple

from ..config import GainConfig

__all__ = ["get_csv_range", "find_targets", "find_files_by_range",
           "remove_files_by_range"]


def get_csv_range(path: Path) -> Optional[int]:
    """Range value (3rd column) of the first data row, or None."""
    try:
        with Path(path).open("r", newline="") as fh:
            fh.readline()  # header
            row = fh.readline().strip()
    except OSError:
        return None
    if not row:
        return None
    fields = row.split(",")
    if len(fields) < 3:
        return None
    try:
        return int(float(fields[2]))
    except ValueError:
        return None


def find_targets(
    base_dir: Path,
    gains: Optional[Tuple[int, ...]] = None,
) -> Iterable[Path]:
    """All CSVs under the gain_NN subdirectories of ``base_dir``."""
    if gains is None:
        gains = GainConfig().values
    for g in gains:
        folder = Path(base_dir) / f"gain_{g}"
        if folder.is_dir():
            yield from folder.glob("*.csv")


def find_files_by_range(
    base_dir: Path,
    ranges_to_find: Set[int],
    gains: Optional[Tuple[int, ...]] = None,
) -> List[Path]:
    return [p for p in find_targets(base_dir, gains)
            if get_csv_range(p) in ranges_to_find]


def remove_files_by_range(
    base_dir: Path,
    ranges_to_remove: Set[int],
    gains: Optional[Tuple[int, ...]] = None,
    dry_run: bool = False,
    verbose: bool = True,
) -> List[Path]:
    """Delete (or list, with dry_run) CSVs whose Range is in the given set."""
    targets = find_files_by_range(base_dir, ranges_to_remove, gains)
    if not targets:
        if verbose:
            print(f"Range filter: nothing matches {sorted(ranges_to_remove)}.")
        return []
    if verbose:
        verb = "match" if dry_run else "deleted"
        print(f"Range filter: {len(targets)} file(s) {verb}:")
    for path in targets:
        if verbose:
            print(f"    {path}")
        if not dry_run:
            path.unlink(missing_ok=True)
    return targets
