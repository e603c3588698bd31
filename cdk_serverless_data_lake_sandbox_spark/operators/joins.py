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


def auto_salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    hot_threshold: int = 100_000,
    sample_frac: float = 0.02,
    max_hot: int = 1_000,
    how: str = "inner",
) -> DataFrame:
    """:func:`salted_join` with automatic hot-key detection, salting
    ONLY the keys that need it: a sampled count estimates per-key
    cardinality (the same cheap-probe-decides-the-plan contract as
    the dedup family's hot-posting guard), keys whose estimated count
    clears ``hot_threshold`` take the salted path, everything else
    joins plain — so the small side replicates |hot| * n_salts rows
    instead of |small| * n_salts, which is what makes salting
    affordable when the dimension is large.

    The hot set is a bounded driver list (<= max_hot; real skew means
    FEW dominant keys — if the sample surfaces more than max_hot hot
    keys the distribution isn't skewed, it's just big, and plain
    shuffle parallelism already handles it). Detection cost is one
    sample-aggregate over ~sample_frac of the big side. Same
    inner/left restriction as salted_join, for the same replica-
    duplication reason."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"auto_salted_join supports inner/left, not {how!r}"
        )
    est = (
        big.sample(fraction=sample_frac, seed=7)
        .groupBy(big_key)
        .count()
        .where(F.col("count") >= hot_threshold * sample_frac)
        .orderBy(F.desc("count"))
        .limit(max_hot)
        .collect()
    )
    hot = [r[big_key] for r in est if r[big_key] is not None]
    if not hot:
        return big.join(small, big[big_key] == small[small_key], how)
    big_hot = big.where(F.col(big_key).isin(hot))
    # null big keys survive a left join; ~isin() would drop them, so
    # route them (and every cold key) through the plain path
    cold_pred = ~F.col(big_key).isin(hot)
    if how != "inner":
        cold_pred = cold_pred | F.col(big_key).isNull()
    big_cold = big.where(cold_pred)
    salted = salted_join(
        big_hot, small.where(F.col(small_key).isin(hot)), big_key, small_key,
        n_salts=n_salts, how=how,
    )
    plain = big_cold.join(small, big_cold[big_key] == small[small_key], how)
    return salted.unionByName(plain)
