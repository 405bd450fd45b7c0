"""Half-away-from-zero rounding, matching ANSI-SQL / DuckDB ROUND semantics.

Arrow's ``pc.round`` and numpy/pandas ``round`` default to banker's rounding
(ties-to-even); DuckDB rounds ties away from zero. Every computed float column
that is compared against a SQL oracle must round through these helpers or
exact-half values (e.g. ratios of small integers like 1/32 = 0.03125) hash
differently on the two sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def pa_round_half_away(arr, ndigits: int):
    return pc.round(arr, ndigits=ndigits, round_mode="half_towards_infinity")


def np_round_half_away(x: np.ndarray, ndigits: int) -> np.ndarray:
    s = 10.0**ndigits
    x = np.asarray(x, dtype=np.float64)
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s
