"""Skew-mitigation utilities.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) splits
oversized sort-merge partitions at runtime and is the first line of
defense — it's on in the tuned session.  Manual salting remains
necessary where AQE can't reach: shuffle-hash joins against a
replicable (but not broadcastable) side, and window/groupBy hot keys.
These helpers encode the pattern once, deterministically (hash-derived
salt, no ``rand()`` — keeps every run and every retry identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 16


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_by: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big``'s join key is heavily skewed and
    ``small`` is replicable: big rows get a deterministic salt from
    ``salt_by`` (any reasonably-unique column), small rows are
    exploded ×``n_salts``, and the join runs on (key, salt) — a hot
    key's rows now spread over ``n_salts`` shuffle partitions instead
    of one straggler task.

    Cost model: small side shuffles ×n_salts; pick n_salts ≈ the skew
    factor, not the cluster size.  Columns of both inputs are
    preserved (join key once)."""
    salt = F.pmod(F.xxhash64(F.col(salt_by)), F.lit(n_salts)).alias("_salt")
    big_s = big.withColumn("_salt", salt)
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<long>"))
    )
    return big_s.join(small_s, [on, "_salt"], how).drop("_salt")


def salted_topk_per_key(
    df: DataFrame,
    key: str,
    order_col: str,
    k: int,
    salt_by: str,
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Top-k per key for skewed keys in two phases: local top-k inside
    each (key, salt) slice, then exact top-k over the ≤ n_salts·k
    survivors — the hot key's sort spreads across n_salts tasks and
    the final window touches only survivors.  Equivalent to a direct
    ``row_number`` top-k (any global survivor is a survivor of its
    slice); ties broken on ``salt_by`` for determinism."""
    from pyspark.sql import Window

    salt = F.pmod(F.xxhash64(F.col(salt_by)), F.lit(n_salts))
    w_local = Window.partitionBy(key, "_salt").orderBy(
        F.desc(order_col), F.asc(salt_by)
    )
    w_final = Window.partitionBy(key).orderBy(F.desc(order_col), F.asc(salt_by))
    return (
        df.withColumn("_salt", salt)
        .withColumn("_rn", F.row_number().over(w_local))
        .filter(F.col("_rn") <= k)
        .withColumn("_rn", F.row_number().over(w_final))
        .filter(F.col("_rn") <= k)
        .drop("_salt", "_rn")
    )


def key_skew_profile(df: DataFrame, key: str, top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts vs the mean — the number you
    check before choosing n_salts."""
    counts = df.groupBy(key).agg(F.count("*").alias("n"))
    stats = counts.agg(F.avg("n").alias("mean_n")).crossJoin(
        counts.orderBy(F.desc("n")).limit(top)
    )
    return stats.select(
        key, "n", F.round(F.col("n") / F.col("mean_n"), 2).alias("skew_factor")
    )
