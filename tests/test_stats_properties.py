"""Property-based checks for the inferential-stats family: each
example synthesizes a small orders/customer fixture, runs the Spark
operator, and compares against an independent pure-Python reference
(or a closed-form range invariant).  Few examples, one Spark job
each — these guard the algebra, the oracle sweep guards the engines.
"""

import datetime as dt
import math
import pathlib
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

SETTINGS = dict(max_examples=4, deadline=None)


_TMP = pathlib.Path(tempfile.mkdtemp(prefix="stats_props_"))


def _write(spark, tmp_path, spends, bals=None, sub=""):
    base = _TMP / sub if sub else _TMP
    base.mkdir(exist_ok=True)
    bals = bals if bals is not None else [0.0] * len(spends)
    spark.createDataFrame(
        [(0, "N0", 0, "x")],
        "n_nationkey long, n_name string, n_regionkey long,"
        " n_comment string",
    ).write.mode("overwrite").parquet(str(base / "nation.parquet"))
    spark.createDataFrame(
        [
            (i, f"c{i}", 0, float(b), "BUILDING")
            for i, b in enumerate(bals)
        ],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    ).write.mode("overwrite").parquet(str(base / "customer.parquet"))
    spark.createDataFrame(
        [
            (i, i, "O", float(v), dt.date(2024, 1, 1), "1-URGENT")
            for i, v in enumerate(spends)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(base / "orders.parquet"))
    return str(base)


def _py_spearman(xs, ys):
    """Reference: the same doubled-average-rank integer formula."""
    def dranks(vs):
        s = sorted(vs)
        return [
            2 * (s.index(v) + 1) + s.count(v) - 1  # 2*r_min + ties - 1
            for v in vs
        ]

    dx, dy = dranks(xs), dranks(ys)
    n = len(xs)
    sx, sy = sum(dx), sum(dy)
    sxx = sum(a * a for a in dx)
    syy = sum(a * a for a in dy)
    sxy = sum(a * b for a, b in zip(dx, dy))
    num = n * sxy - sx * sy
    denx, deny = n * sxx - sx * sx, n * syy - sy * sy
    if denx == 0 or deny == 0:
        return None
    return math.floor(
        num / (math.sqrt(denx) * math.sqrt(deny)) * 1e6 + 0.5
    )


cents_vals = st.integers(min_value=1, max_value=10_000_000)


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(cents_vals, cents_vals), min_size=3, max_size=25
    )
)
def test_spearman_matches_python_reference(spark, pairs):
    from etl_python_spark.operators.stats import q_spearman_corr

    bals = [b / 100.0 for b, _ in pairs]
    spends = [s / 100.0 for _, s in pairs]
    sf = _write(spark, None, spends, bals, sub="sp")
    (r,) = q_spearman_corr(spark, sf).collect()
    want = _py_spearman(
        [round(b * 100) for b in bals], [round(s * 100) for s in spends]
    )
    assert r.rho_micro == want
    if want is not None:
        assert -1_000_000 <= r.rho_micro <= 1_000_000


@settings(**SETTINGS)
@given(st.lists(cents_vals, min_size=2, max_size=25))
def test_gini_hhi_ranges(spark, spends_c):
    from etl_python_spark.operators.stats import (
        q_gini_concentration,
        q_hhi_concentration,
    )

    spends = [c / 100.0 for c in spends_c]
    sf = _write(spark, None, spends, sub="gh")
    (g,) = q_gini_concentration(spark, sf).collect()
    (h,) = q_hhi_concentration(spark, sf).collect()
    n = len(spends)
    assert 0 <= g.gini_micro < 1_000_000  # [0, 1)
    # HHI in [1/n, 1]; quantization can dip one micro below 1/n
    assert h.hhi_micro >= math.floor(1e6 / n + 0.5) - 1
    assert h.hhi_micro <= 1_000_000
    if len(set(spends_c)) == 1:
        assert g.gini_micro == 0  # perfectly even


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["P1", "P2", "P3"]),
            st.sampled_from(["A", "B"]),
        ),
        min_size=8,
        max_size=60,
    )
)
def test_chi_square_nonnegative_and_dof(spark, cats):
    from etl_python_spark.operators.stats import q_chi_square_independence

    base = _TMP / "chi"
    base.mkdir(exist_ok=True)
    spark.createDataFrame(
        [
            (k, 1, s, 100.0, dt.date(2024, 1, 1), p)
            for k, (p, s) in enumerate(cats)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.mode("overwrite").parquet(str(base / "orders.parquet"))
    out = q_chi_square_independence(spark, str(base)).collect()
    rs = len({p for p, _ in cats})
    cs = len({s for _, s in cats})
    assert all(r.contrib_micro >= 0 for r in out)
    assert all(r.chi2_micro >= 0 for r in out)
    assert out[0].dof == (rs - 1) * (cs - 1)
