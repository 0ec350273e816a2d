#!/usr/bin/env python3
"""Chip A/B of the FUSED ROUND-1 (stats pass folds the unmasked
neighbor-id minimum; round 1 resolves from it plus a scoped residual
sweep — see stdbscan.cluster_index fused_round1) vs the unfused program
(separate stats + hoisted full round-1 sweep).

Whole-program wall both ways, labels bit-equality, and the fused path's
stage decomposition: fused-stats cost vs plain stats, residual scope
(unresolved points / scoped tiles / scoped pairs), scoped-sweep cost.

ARCHIVED RECORD — cannot run at HEAD.  The fused round-1 path was
chip-refuted at both scales and removed per flip-or-remove (commit
6b0837b; results in .chip_logs/ab_fused_round1_{denoise,tracker}_r4.log
and ROUND4.md).  To reproduce, check out the last commit that carries the
fused path: ``git checkout d92f0bf``.

Usage: python tools/ab_fused_round1.py [tracker|denoise] [frames=N] [tile=N]
"""
import sys

_PINNED = "d92f0bf"
sys.exit(
    f"ab_fused_round1.py is an archived record: the fused round-1 path was "
    f"removed at HEAD (commit 6b0837b) after losing chip A/Bs at both "
    f"scales. Reproduce with: git checkout {_PINNED}  "
    f"(results: .chip_logs/ab_fused_round1_*.log, ROUND4.md)")
