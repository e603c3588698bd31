"""Join strategy helpers for skew and scale.

AQE's skew-join splitting handles most skew automatically (enabled in
``session.py``); :func:`salted_join` is the explicit fallback for
joins AQE can't split — e.g. a skewed aggregation feeding a join, or
engines/configs where AQE is off. Salting fans each hot key into
``n_salts`` synthetic sub-keys: each big-side row picks one salt (any
choice is correct — every salt co-locates with a replica of the
matching small-side row), the small side replicates to all salts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with key salting. ``big`` rows get a deterministic
    salt in [0, n_salts); ``small`` rows are replicated once per salt,
    so every (key, salt) pair co-locates. Shuffle skew per key drops
    by ~n_salts at the cost of replicating the small side.

    Only ``inner`` and ``left`` are supported: under right/full outer
    joins an UNMATCHED small-side row would surface once per salt
    replica (n_salts duplicate rows). Those modes need a post-join
    replica dedup that would re-shuffle on the key — at which point
    salting bought nothing; use a plain join (AQE skew-split) instead."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left, not {how!r}: unmatched "
            "small-side rows would duplicate once per salt replica"
        )
    big_salted = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(big_key), F.monotonically_increasing_id()), F.lit(n_salts))
    )
    small_salted = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = big_salted.join(
        small_salted,
        (F.col(big_key) == F.col(small_key)) & (big_salted["_salt"] == small_salted["_salt"]),
        how,
    )
    return joined.drop("_salt")
