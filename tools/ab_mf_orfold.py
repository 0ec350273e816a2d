#!/usr/bin/env python3
"""Chip A/B of the mf stats kernel's presence computation: per-offset
masked any-reduction loop (original) vs one per-element offset bitmask +
halving OR-folds (pallas_neighbors._make_sym_stats_mf_kernel).

Denoise-scale stats sweep timing both ways, outputs bit-equality, and the
whole cluster program both ways.

ARCHIVED RECORD — cannot run at HEAD.  The OR-fold won at both denoise
scales with bit-equal outputs (f100: stats 3639->2292 ms, whole program
12798->11450 ms; f25: 698->443 / 2518->2264 ms — see
.chip_logs/ab_mf_orfold_r5_f{25,100}.log and ROUND5.md) and the per-offset
loop was removed per flip-or-remove.  To reproduce, check out the last
commit that carries both paths: ``git checkout 9bf885b``.

Usage: python tools/ab_mf_orfold.py [frames=N] [tile=N]
"""
import sys

sys.exit(
    "ab_mf_orfold.py is an archived record: the per-offset presence loop "
    "was removed at HEAD after losing the chip A/B at both scales "
    "(.chip_logs/ab_mf_orfold_r5_f{25,100}.log). Reproduce at commit "
    "9bf885b: git checkout 9bf885b && python tools/ab_mf_orfold.py")
