"""Property-based tests (hypothesis) for the scalar library: each
property generates a batch of examples and pushes them through Spark
in ONE job, comparing against an independent Python reference
implementation.  (Per-example Spark jobs would be prohibitively slow —
batching keeps each property to a single collect.)"""

import math
from datetime import date

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_python_spark.functions.cleaning import cnpj_check_digit_ok, parse_brl
from etl_python_spark.functions.dates import week_of_month

SETTINGS = dict(max_examples=8, deadline=None)

amounts = st.decimals(
    min_value="0.00", max_value="99999999.99", places=2, allow_nan=False
)


def _fmt_ptbr(x: float) -> str:
    whole, cents = divmod(round(x * 100), 100)
    g = f"{whole:,}".replace(",", ".")
    return f"R$ {g},{cents:02d}"


@settings(**SETTINGS)
@given(st.lists(amounts, min_size=1, max_size=40))
def test_parse_brl_roundtrips_ptbr_format(spark, values):
    vals = [float(v) for v in values]
    rows = [(i, _fmt_ptbr(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i int, txt string")
    got = {
        r.i: r.parsed
        for r in df.select("i", parse_brl("txt").alias("parsed")).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] is not None and math.isclose(got[i], v, abs_tol=1e-9), (
            vals[i],
            rows[i],
            got[i],
        )


@settings(**SETTINGS)
@given(st.lists(amounts, min_size=1, max_size=40))
def test_parse_brl_accepts_plain_en_us(spark, values):
    vals = [float(v) for v in values]
    rows = [(i, f"{v:.2f}") for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i int, txt string")
    got = {
        r.i: r.parsed
        for r in df.select("i", parse_brl("txt").alias("parsed")).collect()
    }
    for i, v in enumerate(vals):
        assert math.isclose(got[i], v, abs_tol=1e-9)


def _cnpj_dv(digits: str) -> str:
    # independent mod-11 reference (public algorithm)
    def dv(ds, weights):
        s = sum(int(d) * w for d, w in zip(ds, weights))
        r = s % 11
        return 0 if r < 2 else 11 - r

    w1 = [5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2]
    w2 = [6, 5, 4, 3, 2, 9, 8, 7, 6, 5, 4, 3, 2]
    d1 = dv(digits, w1)
    d2 = dv(digits + str(d1), w2)
    return f"{digits}{d1}{d2}"


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="0123456789", min_size=12, max_size=12),
            st.booleans(),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_cnpj_check_digits_match_reference_impl(spark, cases):
    rows = []
    for i, (base, corrupt) in enumerate(cases):
        cnpj = _cnpj_dv(base)
        if corrupt:
            cnpj = cnpj[:-1] + str((int(cnpj[-1]) + 1) % 10)
        all_same = cnpj == cnpj[0] * 14
        rows.append((i, cnpj, (not corrupt) and not all_same))
    df = spark.createDataFrame(rows, "i int, cnpj string, expected boolean")
    got = df.select(
        "i", "expected", cnpj_check_digit_ok("cnpj").alias("ok")
    ).collect()
    for r in got:
        assert r.ok == r.expected, r


@settings(**SETTINGS)
@given(
    st.lists(
        st.dates(min_value=date(1990, 1, 1), max_value=date(2035, 12, 31)),
        min_size=1,
        max_size=40,
    )
)
def test_week_of_month_matches_ceil_rule(spark, dates):
    rows = [(i, d) for i, d in enumerate(dates)]
    df = spark.createDataFrame(rows, "i int, d date")
    got = {r.i: r.w for r in df.select("i", week_of_month("d").alias("w")).collect()}
    for i, d in enumerate(dates):
        assert got[i] == math.ceil(d.day / 7), (d, got[i])


@settings(**SETTINGS)
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(1, 2000)),
        min_size=1,
        max_size=60,
        unique_by=lambda t: t[0],
    ),
    st.integers(1, 9),
)
def test_pack_spans_invariants(spark, rows, n_shards):
    """Sequence-packing invariants against a Python reference, for any
    shard count: within each shard the spans tile the concatenated
    token stream exactly — start = floor(offset/L),
    end = floor((offset+n-1)/L), offsets accumulate in doc_id order
    with no gaps or overlaps."""
    from etl_python_spark.operators.corpus import pack_spans

    L = 128
    data = [(doc_id, doc_id % n_shards, n) for doc_id, n in rows]
    df = spark.createDataFrame(data, "doc_id long, shard long, n_tokens int")
    got = {r.doc_id: r for r in pack_spans(df, seq_len=L).collect()}

    offsets: dict[int, int] = {}
    for doc_id, shard, n in sorted(data):
        off = offsets.get(shard, 0)
        r = got[doc_id]
        assert (r.start_seq, r.end_seq) == (off // L, (off + n - 1) // L), (
            doc_id, off, n, r,
        )
        assert r.start_seq <= r.end_seq
        offsets[shard] = off + n


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.one_of(
            st.none(),
            st.from_regex(r"(_c[0-9]|[a-z]{1,4})(_[0-9]{1,2})?", fullmatch=True),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_unique_column_names_always_unique(cells):
    """Pure property (no Spark): for ANY header row — nulls, repeats,
    literal cells that look like generated ``_c{i}`` names or suffixes
    — the promoted names are pairwise unique, non-null cells keep
    their text as a prefix, and the FIRST occurrence of every literal
    keeps its exact text (a generated positional name never steals
    it)."""
    from etl_python_spark.sources.readers import unique_column_names

    names = unique_column_names(cells)
    assert len(names) == len(cells)
    assert len(set(names)) == len(names), (cells, names)
    first_seen: set = set()
    for i, (cell, name) in enumerate(zip(cells, names)):
        if cell is None:
            assert name.startswith(f"_c{i}")
        else:
            assert name == cell or name.startswith(cell + "_"), (cells, names)
            if cell not in first_seen:
                assert name == cell, (cells, names)
                first_seen.add(cell)


def test_unique_column_names_generated_never_steals_literal():
    """Regression: a None header at position 0 must not claim '_c0'
    when a later literal cell IS '_c0'."""
    from etl_python_spark.sources.readers import unique_column_names

    assert unique_column_names([None, "_c0"]) == ["_c0_2", "_c0"]
    assert unique_column_names(["valor", "valor", "valor_2"]) == [
        "valor",
        "valor_3",
        "valor_2",
    ]


def test_pack_sequences_shards_follow_parallelism(spark):
    """Without an explicit shard count the packing window must scale
    with the cluster: shard keys span exactly defaultParallelism, and
    pinning shards reproduces the fixed layout."""
    from etl_python_spark.operators.corpus import pack_sequences

    docs = spark.createDataFrame(
        [(i, "w " * 40) for i in range(200)], "doc_id long, text string"
    )
    p = spark.sparkContext.defaultParallelism
    auto = pack_sequences(docs)
    assert {r.shard for r in auto.select("shard").distinct().collect()} == set(
        range(min(p, 200))
    )
    pinned = pack_sequences(docs, shards=4)
    assert {r.shard for r in pinned.select("shard").distinct().collect()} == set(
        range(4)
    )


_pii_token = st.one_of(
    st.from_regex(r"[0-9]{1,10}", fullmatch=True),
    st.from_regex(r"[a-zA-Z#*\-. ]{1,8}", fullmatch=True),
)


@settings(**SETTINGS)
@given(st.lists(st.lists(_pii_token, max_size=8).map("".join), min_size=1, max_size=30))
def test_mask_numeric_ids_matches_python_re(spark, strings):
    """The Spark (java.util.regex) masker must agree with an
    independent Python re implementation on arbitrary digit/word
    soup, and full masking must leave no 6+-digit run behind."""
    import re

    from pyspark.sql import functions as F

    from etl_python_spark.operators.curation import mask_numeric_ids

    df = spark.createDataFrame([(i, s) for i, s in enumerate(strings)], "i long, s string")
    got = {
        r.i: (r.tail, r.full)
        for r in df.select(
            "i",
            mask_numeric_ids(F.col("s")).alias("tail"),
            mask_numeric_ids(F.col("s"), keep_tail=False).alias("full"),
        ).collect()
    }
    for i, s in enumerate(strings):
        assert got[i][0] == re.sub(r"[0-9]{4,}([0-9]{2})", r"###\1", s), s
        assert got[i][1] == re.sub(r"[0-9]{6,}", "###", s), s
        assert re.search(r"[0-9]{6,}", got[i][1]) is None


@given(
    st.lists(
        st.lists(
            st.one_of(
                st.none(),
                st.text(
                    alphabet=st.characters(
                        blacklist_categories=("Cs",), blacklist_characters="\x00"
                    ),
                    max_size=20,
                ),
                st.floats(
                    allow_nan=False, allow_infinity=False,
                    min_value=-1e12, max_value=1e12,
                ),
                st.booleans(),
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(max_examples=40, deadline=None)
def test_xlsx_codec_roundtrip_property(tmp_path_factory, rows):
    """The stdlib xlsx codec round-trips arbitrary cell grids: write →
    read returns the same header and data values (floats exact, text
    XML-escaped-and-back, None preserved; control chars the XML spec
    forbids become U+FFFD — asserted against the same substitution).  Load-bearing for S1/S2/S9, the distributed reader,
    and the workbook sweep."""
    import re as _re

    from etl_python_spark.sources import xlsx

    invalid = _re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f]")

    def norm(v):
        if isinstance(v, bool):
            return float(v)  # xlsx has no bare bool in this writer: 1.0/0.0
        if isinstance(v, str):
            # the writer substitutes XML-forbidden control chars with
            # U+FFFD rather than dropping them (information preserved
            # as "something was here"); XML parsers additionally
            # normalize \r\n and bare \r to \n per the XML spec
            # (end-of-line handling) — found by this very fuzz
            v = invalid.sub("\ufffd", v)
            return v.replace("\r\n", "\n").replace("\r", "\n")
        return v

    header = [f"c{i}" for i in range(max(len(r) for r in rows))]
    padded = [list(r) + [None] * (len(header) - len(r)) for r in rows]
    p = str(tmp_path_factory.mktemp("xlsxfuzz") / "f.xlsx")
    xlsx.write_xlsx(p, {"S": (header, padded)})
    got_header, got_rows = xlsx.read_sheet(p, "S")
    assert got_header == header
    assert len(got_rows) == len(padded)
    for want_row, got_row in zip(padded, got_rows):
        got_row = list(got_row) + [None] * (len(header) - len(got_row))
        for want, got in zip(want_row, got_row):
            w = norm(want)
            if isinstance(w, float) and isinstance(got, float):
                assert got == w or abs(got - w) < 1e-9 * max(1.0, abs(w))
            else:
                assert got == w, (want, got)
