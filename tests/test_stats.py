"""Semantic invariants for the stats family (round 8): attribution
credit rules on constructed event streams, EWMA equivalence to the
pandas reference, and KS extremes with known closed-form answers."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, d, h, m), u, t, 1.0, "{}")
            for i, (d, h, m, u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_attribution_credit_rules(spark, tmp_path):
    from etl_python_spark.operators.stats import q_attribution_last_touch

    rows = [
        # user 1: click then purchase 1h later -> credited
        (1, 9, 0, 1, "click"),
        (1, 10, 0, 1, "purchase"),
        # user 2: view 10 days before purchase -> outside lookback
        (1, 9, 0, 2, "view"),
        (11, 9, 0, 2, "purchase"),
        # user 3: purchase with NO touch -> unattributed row kept
        (5, 9, 0, 3, "purchase"),
        # user 4: click AFTER the purchase must not be credited
        (7, 9, 0, 4, "purchase"),
        (7, 10, 0, 4, "click"),
        # user 5: two touches -> the LATER one wins
        (3, 8, 0, 5, "view"),
        (3, 9, 0, 5, "click"),
        (3, 10, 0, 5, "purchase"),
    ]
    _ev(spark, rows).write.parquet(str(tmp_path / "events.parquet"))
    out = {
        r.user_id: r
        for r in q_attribution_last_touch(spark, str(tmp_path)).collect()
    }
    assert out[1].touch_type == "click" and out[1].delay_us == 3_600_000_000
    assert out[2].touch_id is None  # beyond 7-day lookback
    assert out[3].touch_id is None  # no touch at all
    assert out[4].touch_id is None  # only a post-purchase touch
    assert out[5].touch_type == "click"  # later touch wins
    assert len(out) == 5  # every purchase present exactly once


def test_ewma_matches_pandas(spark, tmp_path):
    """The truncated-lag EWMA must equal pandas ewm(alpha=.5,
    adjust=True) wherever >= EWMA_LAGS observations exist (the
    truncation tail 2^-7 is below the 4dp quantum for these values)."""
    import pandas as pd

    from etl_python_spark.operators.stats import q_ewma_revenue

    vals = [100.0, 200.0, 150.0, 300.0, 250.0, 400.0, 350.0, 500.0,
            450.0, 600.0]
    orders = spark.createDataFrame(
        [
            (i, 1, "O", float(v), dt.date(2024, 1, i + 1), "1-URGENT")
            for i, v in enumerate(vals)
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    )
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "c", 0, 0.0, "BUILDING")],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(0, "BRAZIL", 0)],
        "n_nationkey long, n_name string, n_regionkey long",
    ).write.parquet(str(tmp_path / "nation.parquet"))

    got = {
        r.dia.day: r.ewma
        for r in q_ewma_revenue(spark, str(tmp_path)).collect()
    }
    ref = (
        pd.Series(vals).ewm(alpha=0.5, adjust=True).mean().tolist()
    )
    for day, want in zip(range(1, 11), ref):
        if day >= 8:  # truncated tail: 2^-7 of the weight ≈ 1% of value
            assert got[day] == pytest.approx(want, rel=2e-2), day
        else:  # head (≤7 obs): all terms present — exact up to the 4dp quantum
            assert got[day] == pytest.approx(want, abs=1e-4), day


def test_ks_extremes(spark, tmp_path):
    """Two identical samples -> D = 0; two disjoint samples -> D = 1
    (dmax_scaled = n_a * n_b)."""
    from etl_python_spark.operators.stats import q_ks_segments

    custs, orders = [], []
    # AUTOMOBILE and BUILDING customers get IDENTICAL order values;
    # FURNITURE orders sit strictly above everything else.
    for i, seg in enumerate(["AUTOMOBILE", "BUILDING", "FURNITURE"]):
        custs.append((i, f"c{i}", 0, 0.0, seg))
    for k in range(20):
        orders.append((len(orders), 0, "O", 100.0 + k, dt.date(2024, 1, 1), "x"))
        orders.append((len(orders), 1, "O", 100.0 + k, dt.date(2024, 1, 1), "x"))
        orders.append((len(orders), 2, "O", 9000.0 + k, dt.date(2024, 1, 1), "x"))
    spark.createDataFrame(
        custs,
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    out = {
        (r.seg_a, r.seg_b): r
        for r in q_ks_segments(spark, str(tmp_path)).collect()
    }
    same = out[("AUTOMOBILE", "BUILDING")]
    assert same.dmax_scaled == 0 and same.d_stat == 0.0
    disj = out[("AUTOMOBILE", "FURNITURE")]
    assert disj.d_stat == 1.0
    assert disj.dmax_scaled == disj.n_a * disj.n_b


def test_mann_whitney_identity_and_known_value(spark, tmp_path):
    """U_a + U_b = n_a·n_b always; and on a constructed two-sample
    input with ties the U statistic matches the hand-computed value."""
    import datetime as dt

    from etl_python_spark.operators.stats import q_mann_whitney

    custs = [
        (0, "a", 0, 0.0, "AUTOMOBILE"),
        (1, "b", 0, 0.0, "BUILDING"),
    ]
    # AUTOMOBILE: values [1, 2, 2];  BUILDING: values [2, 3]
    # pooled sorted: 1(r1), 2,2,2 (avg r3), 3(r5)
    # R_auto = 1 + 3 + 3 = 7 ; U_auto = 7 - 3*4/2 = 1
    vals = [(0, 1.0), (0, 2.0), (0, 2.0), (1, 2.0), (1, 3.0)]
    orders = [
        (k, cust, "O", v, dt.date(2024, 1, 1), "x")
        for k, (cust, v) in enumerate(vals)
    ]
    spark.createDataFrame(
        custs,
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))

    out = {
        (r.seg_a, r.seg_b): r
        for r in q_mann_whitney(spark, str(tmp_path)).collect()
    }
    ab = out[("AUTOMOBILE", "BUILDING")]
    assert ab.n_a == 3 and ab.n_b == 2
    assert ab.r2_a == 14  # 2·R_a
    assert ab.u_a == 1.0
    assert ab.u_a + ab.u_b == ab.n_a * ab.n_b
    for r in out.values():  # identity holds for every pair incl. empty
        if r.n_a and r.n_b:
            assert r.u_a + r.u_b == r.n_a * r.n_b


def _write_orders(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate date, o_orderpriority string",
    ).write.parquet(str(tmp_path / "orders.parquet"))


def test_chi_square_known_2x2(spark, tmp_path):
    """Hand-computed 2x2 table: obs [[10,20],[20,10]] has every
    expected cell = 15, per-cell contribution 25/15, chi2 = 20/3."""
    from etl_python_spark.operators.stats import q_chi_square_independence

    rows = []
    k = 0
    for pri, st, cnt in (
        ("P1", "A", 10), ("P1", "B", 20), ("P2", "A", 20), ("P2", "B", 10)
    ):
        for _ in range(cnt):
            rows.append((k, 1, st, 100.0, dt.date(2024, 1, 1), pri))
            k += 1
    _write_orders(spark, tmp_path, rows)
    out = {
        (r.o_orderpriority, r.o_orderstatus): r
        for r in q_chi_square_independence(spark, str(tmp_path)).collect()
    }
    assert len(out) == 4
    for r in out.values():
        assert r.exp_micro == 15_000_000  # exp = 15 exactly
        assert r.contrib_micro == 1_666_667  # floor(25/15*1e6+.5)
        assert r.chi2_micro == 4 * 1_666_667
        assert r.dof == 1


def test_chi_square_independent_is_zero(spark, tmp_path):
    from etl_python_spark.operators.stats import q_chi_square_independence

    rows = []
    k = 0
    for pri in ("P1", "P2", "P3"):
        for st in ("A", "B"):
            for _ in range(7):
                rows.append((k, 1, st, 50.0, dt.date(2024, 2, 1), pri))
                k += 1
    _write_orders(spark, tmp_path, rows)
    out = q_chi_square_independence(spark, str(tmp_path)).collect()
    assert all(r.contrib_micro == 0 and r.chi2_micro == 0 for r in out)
    assert out[0].dof == 2  # (3-1)*(2-1)


def _write_nation_customers(spark, tmp_path, bals):
    spark.createDataFrame(
        [(0, "N0", 0, "x")],
        "n_nationkey long, n_name string, n_regionkey long,"
        " n_comment string",
    ).write.parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(i, f"c{i}", 0, float(b), "BUILDING") for i, b in enumerate(bals)],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))


def test_spearman_extremes_and_ties(spark, tmp_path):
    """Monotone spend in balance order -> rho = +1; the tied-balance
    case matches the textbook average-rank value 72/sqrt(72*80)."""
    from etl_python_spark.operators.stats import q_spearman_corr

    # balances [10, 20, 20, 30]; spends [100, 200, 300, 400]
    _write_nation_customers(spark, tmp_path, [10, 20, 20, 30])
    _write_orders(
        spark,
        tmp_path,
        [
            (i, i, "O", sp, dt.date(2024, 1, 1), "1-URGENT")
            for i, sp in enumerate([100.0, 200.0, 300.0, 400.0])
        ],
    )
    (r,) = q_spearman_corr(spark, str(tmp_path)).collect()
    assert r.n == 4
    assert (r.num, r.denx, r.deny) == (72, 72, 80)
    assert r.rho_micro == 948_683  # floor(72/sqrt(5760)*1e6+.5)


def test_spearman_perfect_negative(spark, tmp_path):
    from etl_python_spark.operators.stats import q_spearman_corr

    _write_nation_customers(spark, tmp_path, [10, 20, 30, 40])
    _write_orders(
        spark,
        tmp_path,
        [
            (i, i, "O", sp, dt.date(2024, 1, 1), "1-URGENT")
            for i, sp in enumerate([400.0, 300.0, 200.0, 100.0])
        ],
    )
    (r,) = q_spearman_corr(spark, str(tmp_path)).collect()
    assert r.rho_micro == -1_000_000


SEAS = [600, -200, 400, -600, 200, -400, 300, -300, 100, -100, 500, -500]


def test_seasonal_decompose_recovers_pure_signal(spark, tmp_path):
    """Linear trend + zero-sum period-12 seasonal: the 2x12 MA
    reproduces the trend EXACTLY, the seasonal indexes equal the
    injected pattern, and every interior residual is exactly zero."""
    from etl_python_spark.operators.stats import q_seasonal_decompose

    _write_nation_customers(spark, tmp_path, [0.0])
    rows = []
    for t in range(48):  # 4 full years, one order per month
        y, m = 2000 + t // 12, 1 + t % 12
        cents_val = 100_000 + 1000 * t + SEAS[t % 12]
        rows.append(
            (t, 0, "O", cents_val / 100.0, dt.date(y, m, 1), "1-URGENT")
        )
    _write_orders(spark, tmp_path, rows)
    out = sorted(
        q_seasonal_decompose(spark, str(tmp_path)).collect(),
        key=lambda r: r.t,
    )
    assert len(out) == 48
    t0 = out[0].t
    for r in out:
        t = r.t - t0
        moy = t % 12  # SEAS is indexed from the series origin
        if 6 <= t < 42:  # interior: full 13-month window exists
            assert r.trend24 == 24 * (100_000 + 1000 * t), r
            assert r.residual_micro == 0, r
        else:
            assert r.trend24 is None and r.residual_micro is None
        # the seasonal index is defined for every month-of-year here
        assert r.seasonal_micro == SEAS[moy] * 1_000_000, r


def test_gini_and_hhi_known_values(spark, tmp_path):
    """Four customers, spends [100, 100, 100, 500] in one segment:
    Gini = (2*W - (n+1)*S)/(n*S) with W = 1*100+2*100+3*100+4*500
    = 2600 -> (5200 - 4000)/3200 = 0.375; HHI = (3*100^2 + 500^2)
    / 800^2 = 0.4375.  Equal spends -> Gini 0, HHI 1/n."""
    from etl_python_spark.operators.stats import (
        q_gini_concentration,
        q_hhi_concentration,
    )

    spark.createDataFrame(
        [(i, f"c{i}", 0, 0.0, "BUILDING") for i in range(4)]
        + [(i, f"c{i}", 0, 0.0, "MACHINERY") for i in range(4, 8)],
        "c_custkey long, c_name string, c_nationkey long,"
        " c_acctbal double, c_mktsegment string",
    ).write.parquet(str(tmp_path / "customer.parquet"))
    spends = {0: 1.0, 1: 1.0, 2: 1.0, 3: 5.0,  # BUILDING (cents 100..500)
              4: 2.0, 5: 2.0, 6: 2.0, 7: 2.0}  # MACHINERY: all equal
    _write_orders(
        spark,
        tmp_path,
        [
            (k, k, "O", v, dt.date(2024, 1, 1), "1-URGENT")
            for k, v in spends.items()
        ],
    )
    gini = {
        r.c_mktsegment: r
        for r in q_gini_concentration(spark, str(tmp_path)).collect()
    }
    assert gini["BUILDING"].gini_micro == 375_000
    assert gini["MACHINERY"].gini_micro == 0
    hhi = {
        r.c_mktsegment: r
        for r in q_hhi_concentration(spark, str(tmp_path)).collect()
    }
    assert hhi["BUILDING"].hhi_micro == 437_500
    assert hhi["MACHINERY"].hhi_micro == 250_000  # 1/n, n = 4


def test_psi_identical_distributions_is_zero(spark, tmp_path):
    """The same value histogram in both periods -> every term 0."""
    from etl_python_spark.operators.stats import q_psi_drift

    rows = []
    k = 0
    for year in (1996, 2000):  # one reference year, one current year
        for v in [10.0, 20.0, 30.0, 40.0, 50.0] * 4:
            rows.append((k, 1, "O", v, dt.date(year, 1, 1), "1-URGENT"))
            k += 1
    _write_orders(spark, tmp_path, rows)
    out = q_psi_drift(spark, str(tmp_path)).collect()
    assert all(r.term_micro == 0 and r.psi_micro == 0 for r in out)


def test_psi_shift_is_positive_and_clamps(spark, tmp_path):
    """Current-period values far above the reference range clamp into
    the top bucket and produce a large positive PSI."""
    from etl_python_spark.operators.stats import q_psi_drift

    rows = []
    k = 0
    for v in [10.0, 20.0, 30.0, 40.0, 50.0] * 4:  # reference
        rows.append((k, 1, "O", v, dt.date(1996, 1, 1), "1-URGENT"))
        k += 1
    for v in [900.0] * 20:  # current: everything out of range (above)
        rows.append((k, 1, "O", v, dt.date(2000, 1, 1), "1-URGENT"))
        k += 1
    _write_orders(spark, tmp_path, rows)
    out = {r.bucket: r for r in q_psi_drift(spark, str(tmp_path)).collect()}
    top = max(out)
    assert out[top].b_raw == 20  # all current rows clamped to top bucket
    psi = out[top].psi_micro
    assert psi > 250_000  # way past the 0.25 "shifted" threshold


def test_walk_forward_split_windows_and_embargo(spark, tmp_path):
    """One order per month across 1996-2000: each fold's train set
    ends exactly embargo+1 months before its test start, the embargo
    month itself is absent, and the test window spans the horizon."""
    from etl_python_spark.operators.stats import (
        WF_EMBARGO_M,
        WF_FIRST_TEST_M,
        WF_FOLDS,
        WF_HORIZON_M,
        WF_STEP_M,
        q_walk_forward_split,
    )

    rows = []
    k = 0
    for y in range(1996, 2001):
        for m in range(1, 13):
            rows.append((k, 1, "O", 10.0, dt.date(y, m, 1), "x"))
            k += 1
    _write_orders(spark, tmp_path, rows)
    out = q_walk_forward_split(spark, str(tmp_path)).collect()
    by_fold = {}
    for r in out:
        t = r.o_orderdate.year * 12 + r.o_orderdate.month
        by_fold.setdefault(r.fold, {"train": [], "test": []})[
            r.split
        ].append(t)
    assert set(by_fold) == set(range(WF_FOLDS))
    for fold, d in by_fold.items():
        ts = WF_FIRST_TEST_M + fold * WF_STEP_M
        assert max(d["train"]) == ts - 1 - WF_EMBARGO_M  # embargo gap
        assert min(d["test"]) == ts
        assert max(d["test"]) == ts + WF_HORIZON_M - 1
        # embargo months appear in NEITHER set
        gap = set(range(ts - WF_EMBARGO_M, ts))
        assert gap.isdisjoint(set(d["train"]) | set(d["test"]))


def test_zipf_slope_on_constructed_power_law(spark, tmp_path):
    """A corpus with freq(rank r) = round(1000 / r) must fit a Zipf
    slope near -1; a uniform-frequency corpus fits slope 0."""
    from etl_python_spark.operators.vocab import q_zipf_vocab_stats

    docs = []

    def add_doc(i, words, source):
        docs.append((i, " ".join(words), "en", source, len(words)))

    words = []
    for r in range(1, 51):  # 50 types, freq 1000/r
        words += [f"w{r:03d}"] * round(1000 / r)
    add_doc(1, words, "zipf")
    add_doc(2, [f"u{j:03d}" for j in range(200)] * 5, "uniform")
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in q_zipf_vocab_stats(
        spark, str(tmp_path)
    ).collect()}
    z = out["zipf"]
    assert z.distinct_tokens == 50 and z.zipf_k == 50
    assert abs(z.zipf_slope_micro + 1_000_000) < 30_000  # slope ~ -1
    u = out["uniform"]
    assert u.zipf_slope_micro == 0  # all counts equal -> flat fit
    assert u.distinct_tokens == 200 and u.total_tokens == 1000


def test_heaps_growth_on_constructed_corpora(spark, tmp_path):
    """A corpus where every doc repeats the same vocabulary has a flat
    growth curve after doc 1 (beta near 0); a corpus where every doc
    introduces only fresh tokens grows linearly (beta = 1 exactly,
    since V = N at every prefix)."""
    from etl_python_spark.operators.vocab import q_heaps_vocab_growth

    docs = []
    fixed = " ".join(f"f{j}" for j in range(20))
    for i in range(10):  # same 20 types every doc
        docs.append((i, fixed, "en", "flat", 20))
    k = 0
    for i in range(10, 20):  # 20 fresh types per doc
        docs.append(
            (i, " ".join(f"n{k + j}" for j in range(20)), "en", "lin", 20)
        )
        k += 20
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.source: r for r in q_heaps_vocab_growth(
        spark, str(tmp_path)
    ).collect()}
    lin = out["lin"]
    assert lin.vocab_size == lin.total_tokens == 200
    assert lin.heaps_beta_micro == 1_000_000  # V = N exactly -> beta 1
    assert lin.heaps_logk_micro == 0          # ln k = 0 -> k = 1
    flat = out["flat"]
    assert flat.vocab_size == 20 and flat.total_tokens == 200
    assert 0 <= flat.heaps_beta_micro < 200_000  # near-flat growth


def test_mad_outliers_robust_to_contamination(spark, tmp_path):
    """Ten clustered values plus two enormous ones: both extremes are
    flagged (the pair inflates a stddev enough that a plain z-score
    screen at 3 sigma misses them — the robustness argument), the
    group median ignores the contamination, and the top-N output is
    ranked by extremeness."""
    from etl_python_spark.operators.stats import q_mad_outliers

    vals = [100.0, 101.0, 99.0, 100.0, 102.0, 98.0, 100.0, 101.0,
            99.0, 100.0, 90000.0, 80000.0]
    _write_orders(
        spark,
        tmp_path,
        [
            (k, 1, "O", v, dt.date(2024, 1, 1), "1-URGENT")
            for k, v in enumerate(vals)
        ],
    )
    out = sorted(
        q_mad_outliers(spark, str(tmp_path)).collect(),
        key=lambda r: r.extremeness_rank,
    )
    assert len(out) == 12  # fewer rows than TOP-N: all kept
    assert out[0].amount_c == 9_000_000 and out[0].is_outlier
    assert out[1].amount_c == 8_000_000 and out[1].is_outlier
    assert not any(r.is_outlier for r in out[2:])  # cluster all clean
    assert out[0].med == 10_000.0  # median untouched by the extremes
