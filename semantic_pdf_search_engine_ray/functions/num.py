"""Shared numeric pinning helpers (oracle-compatibility rules)."""

from __future__ import annotations

import math

import numpy as np


def round6_half_away(x: float) -> float:
    """round(x, 6) with DuckDB's tie rule — half AWAY from zero, i.e.
    floor(|x| * 1e6 + 0.5) * sign / 1e6 (verified bit-identical to
    DuckDB 1.0 ``round(x, 6)`` on tie cases). Python's round() is
    half-to-even and silently disagrees on exact .5 ties; every engine
    value that is compared against a SQL ``round(.., 6)`` must go
    through THIS function."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def round6_half_away_arr(x: "np.ndarray") -> "np.ndarray":
    """Vectorized ``round6_half_away`` over a float array — same
    half-away-from-zero tie rule, element-identical to the scalar form
    (np.floor/np.copysign mirror math.floor/math.copysign on float64).
    Use this in hot paths instead of np.vectorize(round6_half_away),
    which is a per-element Python call."""
    x = np.asarray(x, dtype=np.float64)
    return np.copysign(np.floor(np.abs(x) * 1e6 + 0.5), x) / 1e6
