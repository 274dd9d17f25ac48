"""Hash-stable rounding shared by Ray results and DuckDB oracles.

Two engines computing the same aggregate produce doubles differing by
accumulation order (~1e-15 relative); and numpy/pyarrow round half-even
while DuckDB rounds half-away. Both problems break value-hash equality.
Fix: one explicit rounding definition used on BOTH sides —
``floor(x * 10^d + 0.5) / 10^d`` (half-up) — with digit counts chosen so
the rounding granularity dwarfs the accumulation noise (2 dp for
money-scale sums, 6 dp for unit-scale stats).
"""

from __future__ import annotations

import numpy as np


def round_half_up(x, digits: int = 6):
    """Vectorized two-stage half-up rounding; identical formula to
    sql_round.

    Stage 1 rounds at digits+2 — fine enough that both engines' noisy
    doubles land in the same bin (noise ≪ granularity), coarse enough
    that true data values essentially never sit on its ties. After
    stage 1 both engines hold bit-identical doubles, so stage 2 (the
    requested precision) is deterministic even on exact decimal ties
    like 0.7703125 → 6 dp."""
    s1 = 10.0 ** (digits + 2)
    s2 = 10.0 ** digits
    arr = np.asarray(x, dtype=np.float64)
    y = np.floor(arr * s1 + 0.5) / s1
    return np.floor(y * s2 + 0.5) / s2


def sql_round(expr: str, digits: int = 6) -> str:
    s1 = 10 ** (digits + 2)
    s2 = 10 ** digits
    return (f"floor(floor(({expr}) * {s1} + 0.5) / {s1} * {s2} + 0.5) / {s2}")
