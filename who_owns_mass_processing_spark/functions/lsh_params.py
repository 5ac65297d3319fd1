"""Threshold-derived LSH banding parameters.

The (bands b, rows-per-band r) operating point decides candidate recall:
P(candidate | J) = 1 - (1 - J^r)^b.  Round 1 hard-coded (16, 8) — right
for the J>=0.8 engine default but badly miscalibrated when callers pass
a looser verify threshold (e.g. dedupe_entities at tau=0.70 got ~0.61
candidate recall).  This solver picks, among the divisor pairs of
num_perm, the cheapest banding that clears a recall floor AT the verify
threshold, preferring larger r (fewer, more selective bands = smaller
band-table shuffle) and breaking ties toward fewer bands.

Reference analog: the reference fixes min_simil per tier in config.R:28-29
and relies on quanteda's exact all-pairs; here blocking is probabilistic,
so the knob must follow the threshold.
"""

from __future__ import annotations


def candidate_recall(j: float, bands: int, rows: int) -> float:
    """P(pair with Jaccard j shares >= 1 band) = 1 - (1 - j^r)^b."""
    return 1.0 - (1.0 - j**rows) ** bands


def solve_bands(
    num_perm: int, threshold: float, min_recall: float = 0.95
) -> tuple[int, int]:
    """Pick (bands, rows_per_band) with bands*rows == num_perm such that
    candidate_recall(threshold) >= min_recall, maximizing selectivity
    (largest feasible r).  Falls back to the most-recall pair (r=1) if
    nothing clears the floor — never silently under-recalls more than
    the best available banding.
    """
    if num_perm < 1:
        raise ValueError("num_perm must be positive")
    if not (0.0 < threshold <= 1.0):
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    pairs = [
        (num_perm // r, r)
        for r in range(num_perm, 0, -1)
        if num_perm % r == 0
    ]  # descending r: most selective first
    for bands, rows in pairs:
        if candidate_recall(threshold, bands, rows) >= min_recall:
            return bands, rows
    return pairs[-1]  # (num_perm, 1): maximum recall available
