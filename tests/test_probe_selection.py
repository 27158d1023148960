"""Focused equivalence test for the r17 IVF probe-cell selection
rewrite (similarity._probe_cells): the array_sort + slice form must
select EXACTLY the cells the former per-query rank window selected,
including under exact rounded-d2 ties, because structs sort by
(d2, c_id) — the window's orderBy.  Built with deliberate multi-way
ties so a regression in tie order cannot pass.
"""

from pyspark.sql import Window
from pyspark.sql import functions as F


# Four unit centroids at symmetric positions plus one far cell: the
# origin query is an exact 4-way d2 tie, [1,1] a 2-way tie, so the
# lowest-c_id tie-break is load-bearing for every assertion below.
CENTROIDS = [
    [1.0, 0.0],
    [0.0, 1.0],
    [-1.0, 0.0],
    [0.0, -1.0],
    [2.0, 2.0],
]
VECS = [
    (0, [0.0, 0.0]),  # d2 = 1.0 to all four unit centroids (4-way tie)
    (1, [1.0, 1.0]),  # tie between c_id 0 and 1
    (2, [0.5, 0.25]),  # no tie: strict order 0, 1, 3, 2, 4
    (3, [-1.0, -1.0]),  # tie between c_id 2 and 3
]
N_PROBE = 3


def _selected(spark):
    from etl_python_spark.operators import similarity as S

    df = spark.createDataFrame(VECS, "vec_id int, v array<double>")
    rows = (
        df.select(
            "vec_id",
            F.explode(
                S._probe_cells(F.col("v"), CENTROIDS, N_PROBE)
            ).alias("dc"),
        )
        .select("vec_id", F.col("dc.c_id").alias("c_id"))
        .collect()
    )
    out: dict[int, list[int]] = {}
    for r in rows:
        out.setdefault(r.vec_id, []).append(r.c_id)
    return out


def _window_reference(spark):
    """The pre-r17 form: explode every (d2, c_id) cell distance and
    keep row_number() <= N_PROBE over (d2 asc, c_id asc)."""
    from etl_python_spark.operators import similarity as S

    df = spark.createDataFrame(VECS, "vec_id int, v array<double>")
    cells = F.array(
        *[
            F.struct(
                S._dist2_lit(F.col("v"), c).alias("d2"),
                F.lit(k).alias("c_id"),
            )
            for k, c in enumerate(CENTROIDS)
        ]
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("dc.d2").asc(), F.col("dc.c_id").asc()
    )
    rows = (
        df.select("vec_id", F.explode(cells).alias("dc"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= N_PROBE)
        .select("vec_id", F.col("dc.c_id").alias("c_id"), "rnk")
        .collect()
    )
    out: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r.vec_id, r.rnk)):
        out.setdefault(r.vec_id, []).append(r.c_id)
    return out


def test_probe_cells_match_rank_window_under_ties(spark):
    got = _selected(spark)
    ref = _window_reference(spark)
    assert got == ref
    # The ties resolve by lowest c_id, in cell order:
    assert got[0] == [0, 1, 2]
    assert got[1][:2] == [0, 1]
    assert got[3][:2] == [2, 3]
    # And the untied query's order is the strict d2 order:
    assert got[2] == [0, 1, 3]


def test_probe_cells_count_and_bounds(spark):
    """slice(…, 1, n_probe) must return exactly n_probe cells with
    valid ids even when n_probe equals the cell count."""
    from etl_python_spark.operators import similarity as S

    df = spark.createDataFrame(VECS, "vec_id int, v array<double>")
    n = len(CENTROIDS)
    rows = df.select(
        F.size(S._probe_cells(F.col("v"), CENTROIDS, n)).alias("sz"),
        S._probe_cells(F.col("v"), CENTROIDS, n).alias("cells"),
    ).collect()
    for r in rows:
        assert r.sz == n
        assert sorted(dc.c_id for dc in r.cells) == list(range(n))
