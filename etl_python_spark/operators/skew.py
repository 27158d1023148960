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

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

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


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew report over orders.o_custkey — the pre-flight
    diagnostic a 100 TB job runs BEFORE picking a strategy for a
    skewed join (AQE skew split vs :func:`salted_join` n_salts): the
    10 hottest keys with exact counts, their corpus share, and the
    skew factor vs the mean key (the suggested salt count).

    Exactness: counts are integers; share and skew factor are
    floor-quantized micro ratios computed from integer count pairs by
    identical expressions (total and mean derive from the SAME count
    relation, so no float accumulates across rows).  Deterministic
    top-10 tie-break on the key.

    Scale shape: ONE hash aggregate to the key-cardinality relation
    (map-side partial combine), a 2-scalar fold for total/key-count,
    and a top-10 sort of the aggregate — nothing corpus-sized moves
    after the first shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    counts = orders.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n")
    )
    totals = counts.agg(
        F.sum("n").alias("total_rows"), F.count(F.lit(1)).alias("n_keys")
    )
    top = counts.orderBy(F.desc("n"), F.asc("k")).limit(10)
    ranked = top.crossJoin(F.broadcast(totals))
    share_micro = F.floor(
        F.col("n").cast("double") / F.col("total_rows").cast("double") * 1e6
        + F.lit(0.5)
    ).cast("long")
    # skew factor = n / mean = n * n_keys / total — integer numerator
    skew_micro = F.floor(
        (F.col("n") * F.col("n_keys")).cast("double")
        / F.col("total_rows").cast("double")
        * 1e6
        + F.lit(0.5)
    ).cast("long")
    w = Window.orderBy(F.desc("n"), F.asc("k"))
    return ranked.select(
        F.row_number().over(w).alias("rank"),
        "k",
        "n",
        "total_rows",
        "n_keys",
        share_micro.alias("share_micro"),
        skew_micro.alias("skew_factor_micro"),
    )


ORACLE_SKEW_REPORT = """
WITH counts AS (
  SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS n
  FROM orders GROUP BY 1
), totals AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total_rows,
         CAST(COUNT(*) AS BIGINT) AS n_keys
  FROM counts
), top AS (
  SELECT k, n FROM counts ORDER BY n DESC, k ASC LIMIT 10
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n DESC, k ASC) AS INT) AS rank,
       k, n, t.total_rows, t.n_keys,
       CAST(FLOOR(CAST(n AS DOUBLE) / CAST(t.total_rows AS DOUBLE) * 1e6
                  + 0.5) AS BIGINT) AS share_micro,
       CAST(FLOOR(CAST(n * t.n_keys AS DOUBLE) / CAST(t.total_rows AS DOUBLE)
                  * 1e6 + 0.5) AS BIGINT) AS skew_factor_micro
FROM top, totals t
"""


QUERIES = {"skew_report": q_skew_report}
ORACLES = {"skew_report": ORACLE_SKEW_REPORT}
