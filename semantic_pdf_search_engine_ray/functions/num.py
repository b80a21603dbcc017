"""Shared numeric pinning helpers (oracle-compatibility rules)."""

from __future__ import annotations

import math


def round6_half_away(x: float) -> float:
    """round(x, 6) with DuckDB's tie rule — half AWAY from zero, i.e.
    floor(|x| * 1e6 + 0.5) * sign / 1e6 (verified bit-identical to
    DuckDB 1.0 ``round(x, 6)`` on tie cases). Python's round() is
    half-to-even and silently disagrees on exact .5 ties; every engine
    value that is compared against a SQL ``round(.., 6)`` must go
    through THIS function."""
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6
