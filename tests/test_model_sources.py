"""Tests for the model/ and sources/ layers (registry, profiler, star
builder, integrity checks, readers/writers round-trips)."""

import os

from pyspark.sql import functions as F

from etl_python_spark.model.integrity import check_balance, check_no_negative, verify_catalog
from etl_python_spark.model.profiler import profile, suggest_primary_key
from etl_python_spark.model.registry import DatasetSchema
from etl_python_spark.model.star import build_star
from etl_python_spark.sources.readers import read_csv_sniffed
from etl_python_spark.sources.writers import (
    aggregate_to_json,
    upsert_period,
    write_csv_ptbr,
    write_staging,
)
from tests.conftest import SF_SMOKE


def test_registry_tolerant_apply(spark):
    schema = DatasetSchema(
        name="vendas",
        mapping={
            "Número Nota": ("numero_nota", "int"),
            "Valor": ("valor", "decimal(15,2)"),
            "Vendedor": ("vendedor", "string"),
            "Coluna Ausente": ("ausente", "double"),
        },
        required=["numero_nota"],
    )
    df = spark.createDataFrame(
        [(1, "10.50", "ANA"), (None, "2.00", "BIA")],
        "`Número Nota` int, Valor string, Vendedor string",
    )
    out = schema.apply(df)
    assert out.columns == ["numero_nota", "valor", "vendedor", "ausente"]
    rows = out.collect()
    assert len(rows) == 1  # required dropna removed the null-key row
    assert str(rows[0].valor) == "10.50"
    assert rows[0].ausente is None


def test_profiler_roles(spark):
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    stats = {s.column: s for s in profile(cust)}
    assert stats["c_custkey"].role == "key"
    assert stats["c_mktsegment"].role == "dimension"
    assert stats["c_acctbal"].role == "measure"
    assert stats["c_custkey"].nulls == 0
    pk = suggest_primary_key(cust)
    assert pk == ["c_custkey"]


def test_suggest_pk_pair_search_guard(spark):
    """The 2-column pair search (one distinct().count() shuffle per
    candidate pair) is dim-scale-only: fact-sized input without a
    single-column key must fail fast instead of launching dozens of
    fact-wide shuffles.  A single-column key short-circuits before the
    guard regardless of size."""
    import pytest

    # no single unique column, two >0.5-uniqueness candidates whose
    # combination IS unique → reaches the pair search → guarded
    a_vals = [0, 1, 2, 3, 4, 4, 4, 4]
    b_vals = [0, 0, 0, 3, 4, 5, 6, 7]
    dup = spark.createDataFrame(
        [(a, b, 1.0) for a, b in zip(a_vals, b_vals)], "a int, b int, v double"
    )
    with pytest.raises(ValueError, match="dim-scale-only"):
        suggest_primary_key(dup, max_rows=4)
    assert suggest_primary_key(dup, max_rows=1000) == ["a", "b"]


def test_star_builder(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").limit(200)
    fact, dims = build_star(orders, {"status": ["o_orderstatus"]})
    dim = dims["status"]
    assert dim.columns == ["sk_status", "o_orderstatus"]
    n_status = orders.select("o_orderstatus").distinct().count()
    assert dim.count() == n_status
    assert "sk_status" in fact.columns and "o_orderstatus" not in fact.columns
    assert fact.count() == 200
    assert fact.filter(F.col("sk_status").isNull()).count() == 0


def test_integrity_checks(spark):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    assert check_no_negative(orders, "o_totalprice") == 0
    bal = spark.createDataFrame(
        [(100.0, -100.005), (50.0, -20.0)], "ativo double, passivo double"
    )
    out = {r.ativo: r.integridade for r in check_balance(bal, "ativo", "passivo").collect()}
    assert out[100.0] == "Íntegro" and out[50.0] == "Inconsistente"
    orders.createOrReplaceTempView("orders_v")
    cat = verify_catalog(spark, ["orders_v"])
    assert cat[0].has_id_column


def test_csv_sniffing_roundtrip(spark, tmp_path):
    p = str(tmp_path / "ptbr.csv")
    with open(p, "w", encoding="utf-8") as f:
        f.write("nome;valor\nANA;10\nBIA;20\n")
    df = read_csv_sniffed(spark, p)
    assert df.columns == ["nome", "valor"]
    assert df.count() == 2


def test_write_staging_and_upsert(spark, tmp_path):
    path = str(tmp_path / "staging")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").withColumn(
        "ano", F.year("o_orderdate")
    )
    n = write_staging(orders, path, partition_by=["ano"], audit=True)
    assert n == orders.count()
    # upsert: replace only ano=1998 with a 1-row frame
    one = orders.filter(F.col("ano") == 1998).limit(1)
    upsert_period(one, path, "ano", spark)
    re = spark.read.parquet(path)
    assert re.filter(F.col("ano") == 1998).count() == 1
    assert re.filter(F.col("ano") == 1997).count() == orders.filter(
        F.col("ano") == 1997
    ).count()


def test_csv_ptbr_and_json_agg(spark, tmp_path):
    df = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 2, 20.0), ("B", 3, 5.0)], "g string, id int, v double"
    )
    out = str(tmp_path / "out_csv")
    write_csv_ptbr(df, out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files
    with open(os.path.join(out, files[0])) as f:
        assert ";" in f.readline()
    agg = aggregate_to_json(df, ["g"]).collect()
    payload = {r.g: r.payload_json for r in agg}
    assert '"id":1' in payload["A"].replace(" ", "")


def test_merge_upsert_keyed(spark, tmp_path):
    """Row-keyed MERGE on a partitioned parquet table: matched keys are
    replaced, new keys inserted, untouched partitions and unmatched
    rows survive byte-identically; re-running the same merge is a
    content no-op."""
    from etl_python_spark.sources.writers import merge_upsert

    path = str(tmp_path / "merged")
    base = spark.createDataFrame(
        [(1, 2024, "a"), (2, 2024, "b"), (3, 2025, "c"), (4, 2026, "d")],
        "id long, ano int, v string",
    )
    merge_upsert(spark, base, path, keys=["id"], partition_col="ano")  # creates
    src = spark.createDataFrame(
        [(2, 2024, "B2"), (5, 2025, "e")], "id long, ano int, v string"
    )
    merge_upsert(spark, src, path, keys=["id"], partition_col="ano")
    got = {r.id: (r.ano, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {
        1: (2024, "a"),
        2: (2024, "B2"),
        3: (2025, "c"),
        4: (2026, "d"),
        5: (2025, "e"),
    }
    merge_upsert(spark, src, path, keys=["id"], partition_col="ano")  # idempotent
    again = {r.id: (r.ano, r.v) for r in spark.read.parquet(path).collect()}
    assert again == got


def test_merge_upsert_null_partition(spark, tmp_path):
    """Source rows with a NULL partition value must MERGE into the null
    partition, not wipe it: pre-existing unmatched keys living under
    __HIVE_DEFAULT_PARTITION__ survive the dynamic overwrite."""
    from etl_python_spark.sources.writers import merge_upsert

    path = str(tmp_path / "merged_null")
    base = spark.createDataFrame(
        [(1, 2024, "a"), (2, None, "b"), (3, None, "c")],
        "id long, ano int, v string",
    )
    merge_upsert(spark, base, path, keys=["id"], partition_col="ano")
    src = spark.createDataFrame([(2, None, "B2")], "id long, ano int, v string")
    merge_upsert(spark, src, path, keys=["id"], partition_col="ano")
    got = {r.id: (r.ano, r.v) for r in spark.read.parquet(path).collect()}
    # id=3 (unmatched, null partition) must survive; id=1's partition untouched
    assert got == {1: (2024, "a"), 2: (None, "B2"), 3: (None, "c")}
    # NULL-only source must not touch non-null partitions at all
    src2 = spark.createDataFrame([(4, None, "d")], "id long, ano int, v string")
    merge_upsert(spark, src2, path, keys=["id"], partition_col="ano")
    again = {r.id: (r.ano, r.v) for r in spark.read.parquet(path).collect()}
    assert again == {
        1: (2024, "a"),
        2: (None, "B2"),
        3: (None, "c"),
        4: (None, "d"),
    }


def test_merge_upsert_unpartitioned(spark, tmp_path):
    from etl_python_spark.sources.writers import merge_upsert

    path = str(tmp_path / "merged_flat")
    merge_upsert(
        spark,
        spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"),
        path,
        keys=["id"],
    )
    merge_upsert(
        spark,
        spark.createDataFrame([(2, "B"), (3, "c")], "id long, v string"),
        path,
        keys=["id"],
    )
    got = {r.id: r.v for r in spark.read.parquet(path).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}


def test_upsert_does_not_leak_overwrite_mode(spark, tmp_path):
    """upsert_period must scope dynamic partition overwrite to its own
    write: a later write_staging full-replace has to actually replace —
    partitions absent from the new frame must NOT survive."""
    path = str(tmp_path / "staging2")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").withColumn(
        "ano", F.year("o_orderdate")
    )
    write_staging(orders, path, partition_by=["ano"])
    upsert_period(orders.filter(F.col("ano") == 1998).limit(1), path, "ano", spark)
    # full replace with ONLY 1997 rows: every other year must vanish
    only_1997 = orders.filter(F.col("ano") == 1997)
    write_staging(only_1997, path, partition_by=["ano"])
    re = spark.read.parquet(path)
    assert {r.ano for r in re.select("ano").distinct().collect()} == {1997}


def test_promote_header_keeps_duplicate_rows(spark):
    """promote_header must drop exactly the first row — not dedup the
    rest (the subtract(limit(1)) bug: EXCEPT DISTINCT semantics)."""
    from etl_python_spark.sources.readers import promote_header

    df = spark.createDataFrame(
        [("nome", "uf"), ("ANA", "SP"), ("ANA", "SP"), ("nome", "uf")],
        "c0 string, c1 string",
    )
    out = promote_header(df)
    assert out.columns == ["nome", "uf"]
    rows = [(r["nome"], r["uf"]) for r in out.collect()]
    # both duplicate data rows survive, as does the header-valued row
    assert sorted(rows) == [("ANA", "SP"), ("ANA", "SP"), ("nome", "uf")]


def test_promote_header_null_and_duplicate_names(spark):
    """Null header cells become positional _c{i} names and repeated
    names get a _2/_3 suffix — columns must stay addressable (no
    AMBIGUOUS_REFERENCE downstream)."""
    from etl_python_spark.sources.readers import promote_header

    df = spark.createDataFrame(
        [("valor", None, "valor", "valor"), ("1", "2", "3", "4")],
        "c0 string, c1 string, c2 string, c3 string",
    )
    out = promote_header(df)
    assert out.columns == ["valor", "_c1", "valor_2", "valor_3"]
    row = out.collect()[0]
    assert (row["valor"], row["_c1"], row["valor_2"], row["valor_3"]) == (
        "1", "2", "3", "4",
    )


def test_promote_header_suffix_collides_with_literal_header(spark):
    """A generated _2 suffix can collide with a literal header cell
    (['valor','valor','valor_2'] once yielded 'valor_2' twice); the
    suffix loop must keep incrementing until unique."""
    from etl_python_spark.sources.readers import promote_header

    df = spark.createDataFrame(
        [("valor", "valor", "valor_2"), ("1", "2", "3")],
        "c0 string, c1 string, c2 string",
    )
    out = promote_header(df)
    assert len(set(out.columns)) == 3, out.columns
    assert out.columns == ["valor", "valor_3", "valor_2"]
    row = out.collect()[0]
    assert (row["valor"], row["valor_3"], row["valor_2"]) == ("1", "2", "3")


def test_excel_serial_to_date_1900_leap_bug():
    """Serials 1-59 predate Excel's fictitious 1900-02-29 (serial 60)
    and use the unshifted base; 60 clamps to 1900-02-28; 61+ carry the
    historical off-by-one."""
    import datetime

    from etl_python_spark.sources.xlsx import excel_serial_to_date

    assert excel_serial_to_date(1) == datetime.date(1900, 1, 1)
    assert excel_serial_to_date(59) == datetime.date(1900, 2, 28)
    assert excel_serial_to_date(60) == datetime.date(1900, 2, 28)
    assert excel_serial_to_date(61) == datetime.date(1900, 3, 1)
    # modern serials unchanged by the fix
    assert excel_serial_to_date(45000) == datetime.date(2023, 3, 15)


def test_sniffer_tolerates_multibyte_cut_at_probe_boundary(tmp_path):
    """A UTF-8 file whose probe window ends mid-character must still
    sniff as UTF-8, not fall through to cp1252."""
    from etl_python_spark.sources import readers

    p = str(tmp_path / "cut.csv")
    prefix = "coluna;valor\n".encode("utf-8")
    filler = b"a" * (readers._PROBE_BYTES - len(prefix) - 1)
    # byte at index _PROBE_BYTES-1 is the FIRST byte of the 2-byte 'ç',
    # so the probe window ends mid-character
    payload = prefix + filler + "ç".encode("utf-8") + b";1\n"
    with open(p, "wb") as f:
        f.write(payload)
    enc, sep = readers._sniff_dialect(
        p, readers.ENCODING_CANDIDATES, readers.SEP_CANDIDATES
    )
    assert enc in ("utf-8", "utf-8-sig") and sep == ";"


def test_export_csv_ptbr_single_file_has_bom(spark, tmp_path):
    from etl_python_spark.sources.writers import export_csv_ptbr_file

    df = spark.createDataFrame([("ação", 1.5)], "nome string, valor double")
    p = str(tmp_path / "rel.csv")
    n = export_csv_ptbr_file(df, p)
    assert n == 1
    raw = open(p, "rb").read()
    assert raw.startswith(b"\xef\xbb\xbf")  # utf-8-sig BOM for Excel pt-BR
    assert ";".encode() in raw and "ação".encode() in raw


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """S5/S6/S7 executed end-to-end against embedded Derby (ships with
    Spark): overwrite-mode write with explicit column types, query
    pushdown read, and partitioned parallel read."""
    from etl_python_spark.sources.readers import read_jdbc
    from etl_python_spark.sources.writers import write_jdbc

    url = f"jdbc:derby:{tmp_path}/db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    nation = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    write_jdbc(
        nation,
        url,
        "staging_nation",
        mode="overwrite",
        properties=props,
        create_table_column_types="n_name VARCHAR(64)",
    )
    # full-replace semantics: second overwrite must not duplicate
    write_jdbc(nation, url, "staging_nation", mode="overwrite", properties=props)
    # Derby folds unquoted identifiers to UPPER; Spark writes quoted
    # lowercase names, so the pushdown query quotes them
    back = read_jdbc(
        spark,
        url,
        'SELECT "n_nationkey", "n_name" FROM staging_nation '
        'WHERE "n_regionkey" = 1',
        properties=props,
    )
    expected = nation.filter("n_regionkey = 1").count()
    assert back.count() == expected
    assert set(c.lower() for c in back.columns) == {"n_nationkey", "n_name"}
    # partitioned parallel read fans out over the key range
    par = read_jdbc(
        spark,
        url,
        "SELECT * FROM staging_nation",
        properties=props,
        partition_column='"n_nationkey"',
        num_partitions=4,
        lower_bound=0,
        upper_bound=25,
    )
    assert par.rdd.getNumPartitions() == 4
    assert par.count() == nation.count()


def test_forecast_per_group(spark):
    from etl_python_spark.ml.forecast import forecast_per_group

    out = forecast_per_group(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) > 0
    assert {r.n_name for r in rows}  # at least one group forecast
    sample = rows[0]
    assert sample.previsao is not None and sample.n_obs >= 6
    # 3 months per qualifying group
    by_group = {}
    for r in rows:
        by_group.setdefault(r.n_name, 0)
        by_group[r.n_name] += 1
    assert all(v == 3 for v in by_group.values())


def test_faturamento_proc_params(spark):
    """Parameterized stored-proc surface (Faturamento.sql:9-32): pt-BR
    month normalization incl. the unaccented MARCO alias, and the
    SIGNAL-analogue error on invalid input."""
    import pytest

    from etl_python_spark.operators.analytics_core import (
        faturamento,
        month_number_pt_or_raise,
    )

    assert month_number_pt_or_raise(" marco ") == 3
    assert month_number_pt_or_raise("MARÇO") == 3
    assert month_number_pt_or_raise("dezembro") == 12
    with pytest.raises(ValueError, match="Nome de mês inválido"):
        month_number_pt_or_raise("SMARCH")
    df = faturamento(spark, SF_SMOKE, "novembro", 1998)
    rows = {r.vendedor: r for r in df.collect()}
    assert "SOMA" in rows
    detail_sum = sum(r.faturamento for v, r in rows.items() if v != "SOMA")
    assert abs(rows["SOMA"].faturamento - detail_sum) < 0.01


def test_forecast_per_group_rf_seam(spark):
    """The grouped-sklearn pattern (ML.py:89-154): model injected via
    the factory seam runs the full applyInPandas path; the default
    factory fails fast (driver-side) when sklearn is absent."""
    import numpy as np
    import pytest

    from etl_python_spark.ml.forecast import forecast_per_group_rf

    class MeanRegressor:
        def fit(self, X, y):
            self.mu = float(np.mean(y))
            return self

        def predict(self, X):
            return np.full(len(X), self.mu)

    out = forecast_per_group_rf(spark, SF_SMOKE, regressor_factory=MeanRegressor)
    rows = out.collect()
    assert rows and all(r.previsao is not None and r.n_obs >= 6 for r in rows)
    assert all(r.mae >= 0.0 for r in rows)
    # one next-month prediction per qualifying group
    assert len({r.n_name for r in rows}) == len(rows)

    try:
        import sklearn  # noqa: F401

        has_sklearn = True
    except ImportError:
        has_sklearn = False
    if not has_sklearn:
        with pytest.raises(ImportError, match="scikit-learn"):
            forecast_per_group_rf(spark, SF_SMOKE)


def test_forecast_to_horizon_fixed_end_and_modes(spark):
    """Fixed-end-date horizon + multiplicative seasonality (Modelo de
    Previsão de Vendas.py:42-83 semantics)."""
    import datetime

    from etl_python_spark.ml.forecast import forecast_to_horizon

    mult = forecast_to_horizon(spark, SF_SMOKE, "2003-06", multiplicative=True)
    rows = sorted(mult.collect(), key=lambda r: r.mes)
    assert rows[-1].mes == datetime.date(2003, 6, 1)  # horizon reaches end
    assert all(r.previsao > 0 for r in rows)  # multiplicative never negative
    assert all(r.tipo == "multiplicativa" for r in rows)
    add = forecast_to_horizon(spark, SF_SMOKE, "2003-06", multiplicative=False)
    rows_a = sorted(add.collect(), key=lambda r: r.mes)
    assert rows_a[-1].mes == datetime.date(2003, 6, 1)
    assert len(rows_a) == len(rows)
    assert all(r.tipo == "aditiva" for r in rows_a)
    # the two decompositions are genuinely different fits
    assert any(
        abs(m.previsao - a.previsao) > 1e-6 for m, a in zip(rows, rows_a)
    )


def test_union_sheet_frames_lineage_and_missing_columns(spark):
    import pandas as pd

    from etl_python_spark.sources.readers import union_sheet_frames

    sheets = {
        "Ana": pd.DataFrame({"cliente": ["a", "b"], "valor": [1.0, 2.0]}),
        "Vazia": pd.DataFrame({"cliente": []}),
        "Beto": pd.DataFrame({"cliente": ["c"], "extra": ["x"]}),
    }
    df = union_sheet_frames(spark, sheets, lineage_col="aba_origem")
    rows = {r.cliente: r for r in df.collect()}
    assert set(rows) == {"a", "b", "c"}
    assert rows["a"].aba_origem == "Ana"
    assert rows["c"].aba_origem == "Beto"
    assert rows["c"].valor is None and rows["a"].extra is None


def test_observed_audit_rides_the_action(spark):
    from etl_python_spark.sources.audit import observed_checksum, observed_counts
    from etl_python_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    orders = load_table(spark, SF_SMOKE, "orders")
    df, obs = observed_counts(orders, "staging_audit", null_cols=["o_orderstatus"])
    n = df.count()  # the single action both computes and audits
    got = obs.get
    assert got["rows"] == n
    assert got["nulls_o_orderstatus"] >= 0

    df2, obs2 = observed_checksum(orders, "money_audit", "o_totalprice")
    df2.write.format("noop").mode("overwrite").save()
    import pyspark.sql.functions as F

    expected = orders.agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2)
    ).first()[0]
    assert obs2.get["sum_o_totalprice"] == expected


def test_write_excel_report_roundtrip_and_cap(spark, tmp_path):
    import pytest

    from etl_python_spark.sources.readers import read_excel
    from etl_python_spark.sources.tables import load_table
    from etl_python_spark.sources.writers import write_excel_report
    from tests.conftest import SF_SMOKE

    nation = load_table(spark, SF_SMOKE, "nation").select(
        "n_nationkey", "n_name"
    )
    p = str(tmp_path / "r.xlsx")
    write_excel_report(nation, p, sheet_name="Nações")
    back = read_excel(spark, p, sheet="Nações")
    assert back.count() == nation.count()
    got = {(int(r.n_nationkey), r.n_name) for r in back.collect()}
    want = {(int(r.n_nationkey), r.n_name) for r in nation.collect()}
    assert got == want
    with pytest.raises(ValueError, match="presentation sink"):
        write_excel_report(
            load_table(spark, SF_SMOKE, "lineitem"),
            str(tmp_path / "r2.xlsx"),
            max_rows=10,
        )


def test_write_excel_report_styles(spark, tmp_path):
    """S9 styling tail: money number format, pinned + autosized column
    widths, bold header — verified in the emitted SpreadsheetML parts,
    and the values still read back unchanged."""
    import xml.etree.ElementTree as ET
    import zipfile

    from etl_python_spark.sources.readers import read_excel
    from etl_python_spark.sources.writers import write_excel_report

    from decimal import Decimal

    df = spark.createDataFrame(
        [("ANA LONGNAME CO", Decimal("1234.50")), ("B", Decimal("7.25"))],
        "cliente string, valor decimal(15,2)",
    )
    p = str(tmp_path / "styled.xlsx")
    write_excel_report(df, p, sheet_name="Rel", col_widths={"cliente": 30})
    ns = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main"}
    with zipfile.ZipFile(p) as zf:
        styles = ET.fromstring(zf.read("xl/styles.xml"))
        sheet = ET.fromstring(zf.read("xl/worksheets/sheet1.xml"))
    # the DecimalType column got the default money format
    numfmts = {
        f.get("numFmtId"): f.get("formatCode")
        for f in styles.find("m:numFmts", ns)
    }
    assert "#,##0.00" in numfmts.values()
    # cellXfs: 0 default, 1 bold header, 2 the money format
    xfs = styles.find("m:cellXfs", ns).findall("m:xf", ns)
    assert xfs[1].get("applyFont") == "1"
    fmt_idx = next(
        i for i, xf in enumerate(xfs) if xf.get("numFmtId") in numfmts
    )
    # widths: pinned for cliente (col 1), autosized for valor (col 2)
    cols = {c.get("min"): float(c.get("width")) for c in sheet.find("m:cols", ns)}
    assert cols["1"] == 30 and cols["2"] >= len("valor")
    # header row bold, data cells of valor carry the money style
    rows = sheet.find("m:sheetData", ns).findall("m:row", ns)
    assert all(c.get("s") == "1" for c in rows[0].findall("m:c", ns))
    valor_cells = [
        c for r in rows[1:] for c in r.findall("m:c", ns)
        if c.get("r", "").startswith("B")
    ]
    assert valor_cells and all(int(c.get("s")) == fmt_idx for c in valor_cells)
    # decimal cells are numeric (no inlineStr), and values roundtrip
    assert all(c.get("t") is None for c in valor_cells)
    back = {r.cliente: float(r.valor) for r in read_excel(spark, p, sheet="Rel").collect()}
    assert back == {"ANA LONGNAME CO": 1234.5, "B": 7.25}


def test_write_excel_report_embedded_images(spark, tmp_path):
    """S9 image tail (ref Base de Produtos Mais Vendidos.py:139-145):
    pictures anchored per data row via oneCellAnchor drawings — parts,
    relationships, anchors, and payload bytes all verified in the
    emitted package; values still read back."""
    import base64
    import xml.etree.ElementTree as ET
    import zipfile

    from etl_python_spark.sources.readers import read_excel
    from etl_python_spark.sources.writers import write_excel_report

    png = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGNg"
        "YGBgAAAABQABh6FO1AAAAABJRU5ErkJggg=="
    )
    df = spark.createDataFrame(
        [(101, "PROD A"), (102, "PROD B")], "cod int, descricao string"
    )
    p = str(tmp_path / "fotos.xlsx")
    write_excel_report(
        df,
        p,
        sheet_name="Relatorio",
        images=[
            {"cell": "C2", "data": png, "ext": "png", "width": 100, "height": 100},
            {"cell": "C3", "data": png, "ext": "png"},
        ],
    )
    xdr = "{http://schemas.openxmlformats.org/drawingml/2006/spreadsheetDrawing}"
    with zipfile.ZipFile(p) as zf:
        names = set(zf.namelist())
        assert {"xl/drawings/drawing1.xml", "xl/media/image1.png",
                "xl/media/image2.png",
                "xl/worksheets/_rels/sheet1.xml.rels",
                "xl/drawings/_rels/drawing1.xml.rels"} <= names
        assert zf.read("xl/media/image1.png") == png
        # content types declare the png default + the drawing part
        ct = zf.read("[Content_Types].xml").decode()
        assert 'Extension="png"' in ct and "drawing+xml" in ct
        # worksheet references the drawing
        assert "<drawing" in zf.read("xl/worksheets/sheet1.xml").decode()
        drawing = ET.fromstring(zf.read("xl/drawings/drawing1.xml"))
    anchors = drawing.findall(f"{xdr}oneCellAnchor")
    assert len(anchors) == 2
    frm = anchors[0].find(f"{xdr}from")
    assert frm.find(f"{xdr}col").text == "2"  # C → 2
    assert frm.find(f"{xdr}row").text == "1"  # row 2 → 1
    assert anchors[0].find(f"{xdr}ext").get("cx") == str(100 * 9525)
    # data cells unaffected by the drawing part
    back = {int(r.cod): r.descricao for r in read_excel(spark, p, sheet="Relatorio").collect()}
    assert back == {101: "PROD A", 102: "PROD B"}


def test_excel_multisheet_union_lineage_roundtrip(spark, tmp_path):
    """S1/S2/S9 end-to-end on a real workbook: stdlib writer → stdlib
    multi-sheet reader with lineage column and tolerated missing
    columns (ref ETL - CRM.py:67-76)."""
    from etl_python_spark.sources import xlsx
    from etl_python_spark.sources.readers import read_excel, read_excel_all_sheets

    p = str(tmp_path / "crm.xlsx")
    xlsx.write_xlsx(
        p,
        {
            "Ana": (["cliente", "valor"], [["a", 1.0], ["b", 2.0]]),
            "Vazia": (["cliente"], []),
            "Beto": (["cliente", "extra"], [["c", "x"], ["ação", None]]),
        },
    )
    assert xlsx.sheet_names(p) == ["Ana", "Vazia", "Beto"]
    df = read_excel_all_sheets(spark, p)
    rows = {r.cliente: r for r in df.collect()}
    assert set(rows) == {"a", "b", "c", "ação"}  # unicode survives
    assert rows["a"].aba_origem == "Ana"
    assert rows["c"].aba_origem == "Beto"
    assert rows["c"].valor is None and rows["a"].extra is None
    assert rows["a"].valor == 1.0  # numeric column typed double
    # projection at scan (usecols) keeps only requested columns
    only = read_excel(spark, p, sheet="Ana", usecols=["cliente"])
    assert only.columns == ["cliente"]


def test_read_excel_distributed_matches_driver_path(spark, tmp_path):
    """Executor-side workbook ingestion: a directory of workbooks read
    via binaryFile + mapInPandas yields the same rows as the
    driver-side per-file path, with sheet + file lineage; the parse
    runs in a MapInPandas stage (plan assert), not on the driver."""
    from etl_python_spark.sources import xlsx
    from etl_python_spark.sources.readers import (
        read_excel_all_sheets,
        read_excel_distributed,
    )

    land = tmp_path / "workbooks"
    land.mkdir()
    xlsx.write_xlsx(
        str(land / "w1.xlsx"),
        {
            "Ana": (["cliente", "valor"], [["a", 1.0], ["b", 2.0]]),
            "Vazia": (["cliente"], []),
            "Beto": (["cliente", "extra"], [["c", "x"], ["ação", None]]),
        },
    )
    xlsx.write_xlsx(
        str(land / "w2.xlsx"),
        {"Caio": (["cliente", "valor"], [["d", 9.5], ["e", None]])},
    )

    dist = read_excel_distributed(
        spark,
        str(land),
        "cliente string, valor double, extra string",
    )
    plan = dist._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # the parse is executor-side

    got = sorted(
        (r.cliente, r.valor, r.extra, r.aba_origem, r.arquivo_origem.rsplit("/", 1)[-1])
        for r in dist.collect()
    )

    # driver path per file, projected to the same contract
    want = []
    for f in ("w1.xlsx", "w2.xlsx"):
        df = read_excel_all_sheets(spark, str(land / f))
        for r in df.collect():
            d = r.asDict()
            want.append(
                (d["cliente"], d.get("valor"), d.get("extra"), d["aba_origem"], f)
            )
    assert got == sorted(want)
    assert ("ação", None, None, "Beto", "w1.xlsx") in got  # unicode survives
    # missing declared column tolerated as NULL, not an error
    assert all(v is None for (_, v, _, aba, _) in got if aba == "Beto")


def test_normalize_event_ts_all_physical_shapes(spark):
    """normalize_event_ts canonicalizes every physical shape the
    events table has shipped in.  The nanos case uses a value where
    float64 division by 1000 rounds UP a microsecond
    (1600000000123456875 ns: float gives ...457 µs, integer DIV gives
    ...456) — the exact 1-µs drift that failed round 2's driver hashes
    must stay fixed by integer arithmetic."""
    import datetime

    from pyspark.sql import functions as F

    from etl_python_spark.sources.tables import normalize_event_ts

    # LongType epoch-nanos, adversarial for float division
    ns = spark.createDataFrame([(1600000000123456875,)], "ts long")
    out = normalize_event_ts(ns)
    assert out.schema["ts"].dataType.typeName() == "timestamp"
    micros = out.select(
        (F.unix_timestamp("ts") * 1_000_000
         + F.date_format("ts", "SSSSSS").cast("long")).alias("us")
    ).collect()[0]["us"]
    assert micros == 1600000000123456, micros

    # TIMESTAMP_NTZ → TimestampType, value preserved (session TZ UTC)
    ntz = spark.createDataFrame(
        [(datetime.datetime(2026, 3, 1, 12, 30, 0, 123456),)], "ts timestamp_ntz"
    )
    out2 = normalize_event_ts(ntz)
    assert out2.schema["ts"].dataType.typeName() == "timestamp"
    assert out2.collect()[0]["ts"] == datetime.datetime(2026, 3, 1, 12, 30, 0, 123456)

    # already TimestampType → untouched passthrough
    ts = spark.createDataFrame(
        [(datetime.datetime(2026, 3, 1, 12, 0, 0),)], "ts timestamp"
    )
    assert normalize_event_ts(ts) is ts


def test_profiler_approx_distinct_close_to_exact(spark):
    """The scale path (approx_count_distinct, default 5% rsd) must
    track the exact profile closely on a dim-sized table and share
    every non-cardinality stat exactly."""
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    exact = {s.column: s for s in profile(cust)}
    approx = {s.column: s for s in profile(cust, exact_distinct=False)}
    assert set(exact) == set(approx)
    for col, e in exact.items():
        a = approx[col]
        assert a.nulls == e.nulls and a.role == e.role, col
        assert abs(a.distinct - e.distinct) <= max(3, 0.15 * e.distinct), col


def test_read_text_corpus_stable_ids_and_lineage(spark, tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    (d / "b.txt").write_text("gamma three\n\n")
    (d / "a.txt").write_text("alpha one\nbeta two\n")
    from etl_python_spark.sources.readers import read_text_corpus

    out = read_text_corpus(spark, str(d))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PythonRDD" not in plan and "EvalPython" not in plan  # JVM-side
    first = out.collect()
    again = read_text_corpus(spark, str(d)).collect()
    assert sorted(map(tuple, first)) == sorted(map(tuple, again))  # stable ids
    by_text = {r.text: r for r in first}
    assert set(by_text) == {"alpha one", "beta two", "gamma three"}  # blank dropped
    assert by_text["alpha one"].file.endswith("a.txt")
    assert by_text["gamma three"].file.endswith("b.txt")
    assert by_text["alpha one"].source == "corpus"
    assert by_text["beta two"].doc_id == by_text["alpha one"].doc_id + 1
    assert by_text["alpha one"].n_chars == 9


def test_read_text_corpus_ids_match_zip_with_index(spark, tmp_path):
    """The two-phase offset ids must be EXACTLY the ids the old
    rdd.zipWithIndex path assigned (round-12 verdict item 3 'identical
    doc_ids'), on a fixture wide enough to span several input splits
    and files — including blank lines, which consume an id before the
    non-empty filter, exactly as before."""
    from pyspark.sql import functions as F

    from etl_python_spark.sources.readers import read_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    for i in range(5):
        body = "\n".join(
            f"file{i} line{j}" if j % 7 else "" for j in range(200)
        )
        (d / f"f{i}.txt").write_text(body + "\n")

    got = {
        (r.text, r.file.rsplit("/", 1)[-1]): r.doc_id
        for r in read_text_corpus(spark, str(d)).collect()
    }

    lines = spark.read.text(str(d)).select(
        F.col("value").alias("text"),
        F.col("_metadata.file_path").alias("file"),
    )
    want = {
        (row["text"], row["file"].rsplit("/", 1)[-1]): idx
        for row, idx in lines.rdd.zipWithIndex().collect()
        if row["text"].strip()
    }
    assert got == want


def test_read_jsonl_corpus_id_modes(spark, tmp_path):
    p = tmp_path / "docs.jsonl"
    p.write_text(
        '{"id": 7, "text": "hello world", "lang": "en"}\n'
        '{"id": 9, "text": "ola mundo", "lang": "pt"}\n'
    )
    from etl_python_spark.sources.readers import read_jsonl_corpus

    with_id = {r.doc_id: r for r in read_jsonl_corpus(spark, str(p), id_field="id").collect()}
    assert set(with_id) == {7, 9}
    assert with_id[7].text == "hello world" and with_id[7].lang == "en"
    hashed = read_jsonl_corpus(spark, str(p)).collect()
    assert len({r.doc_id for r in hashed}) == 2  # content-hash ids distinct
    rerun = read_jsonl_corpus(spark, str(p)).collect()
    assert {r.doc_id for r in hashed} == {r.doc_id for r in rerun}  # stable


def test_write_training_shards_deterministic(spark, tmp_path):
    from etl_python_spark.sources.writers import write_training_shards

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(100)], "doc_id long, text string"
    )
    out1, out2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    write_training_shards(df, out1, shards=4, fmt="json")
    write_training_shards(df, out2, shards=4, fmt="json")

    import glob, json

    def shard_map(out):
        m = {}
        for d in sorted(glob.glob(f"{out}/shard=*")):
            k = int(d.rsplit("=", 1)[1])
            ids = set()
            for f in glob.glob(f"{d}/part-*"):
                with open(f) as fh:
                    ids |= {json.loads(l)["doc_id"] for l in fh if l.strip()}
            if ids:
                m[k] = frozenset(ids)
        return m

    m1, m2 = shard_map(out1), shard_map(out2)
    assert sum(len(v) for v in m1.values()) == 100
    assert m1 == m2  # same doc→shard assignment both runs
    assert len(m1) == 4

    # placement IS the audited mapping: hash60(doc_id) % shards
    from etl_python_spark.operators.dedup import hash60

    expected = {
        r.doc_id: r.shard
        for r in df.select(
            "doc_id",
            (hash60(F.col("doc_id").cast("string")) % 4).cast("int").alias("shard"),
        ).collect()
    }
    for k, ids in m1.items():
        assert all(expected[i] == k for i in ids)
    import pytest

    with pytest.raises(ValueError, match="fmt"):
        write_training_shards(df, str(tmp_path / "bad"), shards=2, fmt="csvx")


def test_compact_table_unpartitioned(spark, tmp_path):
    """50 tiny files collapse to the byte-targeted count; content is
    byte-identical; a second run is a stats-only no-op."""
    from etl_python_spark.sources.writers import compact_table

    path = str(tmp_path / "frag")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(50).write.parquet(path)

    stats = compact_table(spark, path, target_file_bytes=512 * 1024 * 1024)
    assert stats["rewritten"] and stats["files_before"] == 50
    assert stats["files_after"] < 50
    got = sorted(r.id for r in spark.read.parquet(path).collect())
    assert got == list(range(10_000))

    again = compact_table(spark, path, target_file_bytes=512 * 1024 * 1024)
    assert not again["rewritten"]
    assert again["files_before"] == again["files_after"] == stats["files_after"]


def test_compact_table_partitioned(spark, tmp_path):
    """Partitioned compaction: one data file per partition value."""
    from etl_python_spark.sources.writers import compact_table

    path = str(tmp_path / "frag_part")
    df = spark.range(0, 3_000).withColumn("p", (F.col("id") % 3).cast("int"))
    df.repartition(20).write.partitionBy("p").parquet(path)

    stats = compact_table(spark, path, partition_by=["p"])
    assert stats["rewritten"]
    assert stats["files_after"] == 3  # one per partition value
    out = spark.read.parquet(path)
    assert out.count() == 3_000
    assert sorted(r.p for r in out.select("p").distinct().collect()) == [0, 1, 2]


def test_schema_drift_classification(spark):
    from pyspark.sql import types as T

    from etl_python_spark.model.registry import schema_drift

    before = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("Nome", T.StringType()),
            T.StructField("valor", T.DoubleType()),
        ]
    )
    after = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("nome", T.StringType()),      # case-only: no drift
            T.StructField("valor", T.StringType()),     # type change
            T.StructField("extra", T.DateType()),       # added
        ]
    )
    report = schema_drift(before, after)
    kinds = {(r["column"], r["kind"]) for r in report}
    assert kinds == {("extra", "added"), ("valor", "type_changed")}
    tc = next(r for r in report if r["kind"] == "type_changed")
    assert tc["type"] == "double -> string"
    assert schema_drift(before, before) == []


def test_write_range_sorted_files_have_disjoint_ranges(spark, tmp_path):
    """Range-sorted layout: every output file's parquet footer min/max
    on the sort key is disjoint from every other file's, so a point
    predicate prunes to exactly one file."""
    import glob as _glob

    import pyarrow.parquet as pq

    from etl_python_spark.sources.writers import write_range_sorted

    path = str(tmp_path / "sorted")
    df = spark.range(0, 20_000).withColumn("k", (F.col("id") * 7919) % 20011)
    write_range_sorted(df, path, sort_cols=["k"], n_files=8)

    ranges = []
    for f in _glob.glob(path + "/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        ks = [
            (md.row_group(i).column(c).statistics.min,
             md.row_group(i).column(c).statistics.max)
            for i in range(md.num_row_groups)
            for c in range(md.num_columns)
            if md.row_group(i).column(c).path_in_schema == "k"
        ]
        ranges.append((min(lo for lo, _ in ks), max(hi for _, hi in ks)))
    assert len(ranges) == 8
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev < lo_next  # disjoint key ranges across files

    # content survives the layout rewrite
    assert spark.read.parquet(path).count() == 20_000


def test_read_incremental_manifest(spark, tmp_path):
    """Incremental batch ingest: second run sees only new files; a
    rewritten (size/mtime-changed) file re-ingests; empty delta returns
    None without touching the manifest."""
    import os
    import time as _time

    from etl_python_spark.sources.readers import read_incremental

    landing = tmp_path / "landing"
    landing.mkdir()
    manifest = str(tmp_path / "manifest.jsonl")

    def land(name, ids):
        staging = str(tmp_path / f"_stg_{name}")
        spark.createDataFrame([(i,) for i in ids], "id long").coalesce(1) \
            .write.mode("overwrite").parquet(staging)
        import glob as _glob
        (part,) = _glob.glob(staging + "/part-*.parquet")
        import shutil as _sh
        _sh.copy(part, str(landing / name))

    land("a.parquet", [1, 2, 3])
    df1, new1, commit1 = read_incremental(spark, str(landing), manifest)
    assert sorted(r.id for r in df1.collect()) == [1, 2, 3]
    assert len(new1) == 1

    # the manifest commit is DEFERRED: before commit() a rerun sees the
    # same files again (a failed downstream write must not lose them)
    assert not os.path.exists(manifest)
    df1b, new1b, commit1b = read_incremental(spark, str(landing), manifest)
    assert [os.path.basename(p) for p in new1b] == ["a.parquet"]
    commit1b()

    # no new files -> None, manifest untouched
    df2, new2, _ = read_incremental(spark, str(landing), manifest)
    assert df2 is None and new2 == []

    # a second file -> only its rows
    land("b.parquet", [10, 11])
    df3, new3, commit3 = read_incremental(spark, str(landing), manifest)
    assert sorted(r.id for r in df3.collect()) == [10, 11]
    assert [os.path.basename(p) for p in new3] == ["b.parquet"]
    commit3()

    # rewrite a.parquet with different content (size/mtime change) -> re-ingest
    land("a.parquet", [7, 8, 9, 100])
    os.utime(str(landing / "a.parquet"), None)
    df4, new4, commit4 = read_incremental(spark, str(landing), manifest)
    assert [os.path.basename(p) for p in new4] == ["a.parquet"]
    assert sorted(r.id for r in df4.collect()) == [7, 8, 9, 100]
    commit4()
    df5, new5, _ = read_incremental(spark, str(landing), manifest)
    assert df5 is None and new5 == []


def test_read_incremental_torn_manifest_recovery(spark, tmp_path):
    """Crash-consistency of the ingest manifest: a torn final line
    (crash mid-append) is skipped — that file simply re-ingests
    (at-least-once) — while a commit() goes through write-temp+rename
    and can never itself tear; corruption anywhere but the tail
    raises instead of silently dropping history."""
    import json
    import os

    import pytest

    from etl_python_spark.sources.readers import (
        _load_manifest,
        commit_manifest,
        read_incremental,
    )

    landing = tmp_path / "landing"
    landing.mkdir()
    manifest = str(tmp_path / "manifest.jsonl")

    spark.createDataFrame([(1,)], "id long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "stg"))
    import glob as _glob
    import shutil as _sh

    (part,) = _glob.glob(str(tmp_path / "stg") + "/part-*.parquet")
    _sh.copy(part, str(landing / "a.parquet"))

    df, new, commit = read_incremental(spark, str(landing), manifest)
    commit()
    good = open(manifest).read()
    assert len(_load_manifest(manifest)) == 1

    # torn tail: crash mid-append left a partial record
    with open(manifest, "a") as f:
        f.write('{"path": "/x/b.parquet", "si')
    df2, new2, _ = read_incremental(spark, str(landing), manifest)
    assert df2 is None  # a.parquet record survived the torn tail
    # a fresh commit heals the manifest (rewrites only valid records)
    commit_manifest(manifest, [{"path": "/x/c", "size": 1, "mtime_ns": 2}])
    recs = _load_manifest(manifest)
    assert [os.path.basename(r["path"]) for r in recs] == ["a.parquet", "c"]
    assert all(json.loads(l) for l in open(manifest) if l.strip())

    # corruption NOT at the tail is an error, never silent loss
    with open(manifest, "w") as f:
        f.write('{"torn...\n' + good)
    with pytest.raises(json.JSONDecodeError):
        _load_manifest(manifest)


def test_fit_changepoint_trend_recovers_two_slope_series():
    """A noiseless series with one kink: the piecewise fit reproduces
    it near-exactly, and extrapolation continues the FINAL slope (not
    the average slope a single OLS line would give)."""
    import numpy as np

    from etl_python_spark.ml.forecast import fit_changepoint_trend

    # slope 2 for t<12, slope -1 after; kink at t=12 sits EXACTLY on
    # the candidate grid (n=25, range=1.0, k=3 → cps at 6, 12, 18)
    t = np.arange(25)
    y = np.where(t < 12, 2.0 * t, 24.0 - (t - 12.0))
    params, cps, trend_fn = fit_changepoint_trend(
        y, n_changepoints=3, changepoint_range=1.0
    )
    assert 12.0 in set(np.round(cps, 6))
    assert np.abs(trend_fn(t) - y).max() < 1e-8  # on-grid kink: exact
    # extrapolation follows the -1 tail slope
    future = trend_fn(np.array([25.0, 26.0, 27.0]))
    assert np.allclose(np.diff(future), -1.0, atol=1e-8)
    # a plain OLS line cannot do this (its slope is ~ the mixture)
    single, _, single_fn = fit_changepoint_trend(y, n_changepoints=0)
    assert np.abs(single_fn(t) - y).max() > 5.0
    # off-grid kink: approximates within a grid cell, still far better
    # than the single line
    _, _, approx_fn = fit_changepoint_trend(y, n_changepoints=5)
    assert np.abs(approx_fn(t) - y).max() < 2.0
    # determinism
    p2, _, _ = fit_changepoint_trend(y, n_changepoints=3, changepoint_range=1.0)
    assert np.array_equal(params, p2)


def test_changepoint_exact_betas_match_lstsq():
    """Ties the ml_changepoint_fit oracle to the real code path: the
    exact integer Cramer solve (_cp_exact_betas) must reproduce
    fit_changepoint_trend's numpy lstsq solution on the same quantized
    series — identical design (the k=3 hinge grid IS linspace(0,
    0.8(n-1), 5) interior = i(n-1)/5), so for a full-rank Gram the
    normal-equations and lstsq solutions coincide up to float error +
    the 1e-6 micro quantization."""
    import random

    import numpy as np

    from etl_python_spark.ml.forecast import (
        _cp_exact_betas,
        fit_changepoint_trend,
    )

    rng = random.Random(7)
    series = [
        [rng.randint(8_000, 15_000) for _ in range(n)] for n in (6, 23, 80)
    ]
    # a kinked trend like the real revenue series
    series.append(
        [2_000 + 120 * t if t < 40 else 6_800 - 40 * (t - 40) for t in range(77)]
    )
    for y in series:
        exact = _cp_exact_betas(y)
        assert exact is not None
        params, cps, _ = fit_changepoint_trend(
            np.asarray(y, dtype="float64"), n_changepoints=3
        )
        assert len(params) == 5 and len(cps) == 3
        got = np.array(exact, dtype="float64") / 1e6
        assert np.allclose(got, params, rtol=1e-6, atol=2e-5), (
            y[:5],
            got,
            params,
        )


def test_changepoint_micro_ratio_half_away_matches_duckdb():
    """Pins the sign-split round-half-away device AND its DuckDB
    restatement: Python // floors on negatives, DuckDB // truncates,
    so the shared formula must keep every division non-negative."""
    import duckdb

    from etl_python_spark.ml.forecast import _micro_ratio

    cases = [
        (1, 3),
        (-1, 3),
        (3, 2),
        (-3, 2),  # halves round AWAY: ±1.5e6 → ±1500000? (1.5 exact)
        (1, 2_000_000),  # 0.5 micro → rounds up to 1
        (-1, 2_000_000),  # -0.5 micro → rounds away to -1
        (7, 2_000_000),
        (10**30 + 7, 10**24 + 3),
        (-(10**30) - 7, 10**24 + 3),
        (0, 5),
    ]
    sql = """
    SELECT CASE WHEN num >= 0 THEN
             (num // den) * 1000000
             + (2 * (num % den) * 1000000 + den) // (2 * den)
           ELSE
             -(((-num) // den) * 1000000
               + (2 * ((-num) % den) * 1000000 + den) // (2 * den))
           END
    FROM (SELECT CAST(? AS HUGEINT) AS num, CAST(? AS HUGEINT) AS den)
    """
    for num, den in cases:
        py = _micro_ratio(num, den)
        (db,) = duckdb.execute(sql, [str(num), str(den)]).fetchone()
        assert py == int(db), (num, den, py, db)
    assert _micro_ratio(1, 2_000_000) == 1  # half rounds up
    assert _micro_ratio(-1, 2_000_000) == -1  # half rounds away
    assert _micro_ratio(1, 3_000_000) == 0  # below half rounds down


def test_changepoint_det_sql_matches_python_det():
    """The SQL Leibniz expansion (symmetric gAB naming) evaluates to
    the same integer as _det5 on the same entries — random integer
    Gram-shaped (symmetric) matrices + moment vectors, via DuckDB."""
    import random

    import duckdb

    from etl_python_spark.ml.forecast import _cp_det_sql, _det5

    rng = random.Random(13)
    for _ in range(5):
        G = [[0] * 5 for _ in range(5)]
        for a in range(5):
            for b in range(a, 5):
                G[a][b] = G[b][a] = rng.randint(-(10**6), 10**6)
        m = [rng.randint(-(10**9), 10**9) for _ in range(5)]
        binds = ", ".join(
            f"CAST({G[a][b]} AS HUGEINT) AS g{a}{b}"
            for a in range(5)
            for b in range(a, 5)
        )
        binds += ", " + ", ".join(
            f"CAST({m[a]} AS HUGEINT) AS m{a}" for a in range(5)
        )
        exprs = ", ".join(
            _cp_det_sql(i) for i in [None, 0, 1, 2, 3, 4]
        )
        row = duckdb.sql(f"SELECT {exprs} FROM (SELECT {binds})").fetchone()
        want = [_det5(lambda a, c: G[a][c])] + [
            _det5(lambda a, c, i=i: m[a] if c == i else G[a][c])
            for i in range(5)
        ]
        assert [int(v) for v in row] == want


def test_changepoint_fit_spark_matches_exact_betas(spark):
    """q_changepoint_fit's Spark-aggregated solve equals the pure-
    Python reference on the reconstructed quantized series — verifies
    the window/aggregate plumbing, not just the driver math."""
    from tests.conftest import SF_SMOKE

    from etl_python_spark.ml.forecast import (
        _CP_COEFS,
        _cp_exact_betas,
        q_changepoint_fit,
    )
    from etl_python_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    out = {
        (r.n_name, r.coef): (r.beta_micro, r.n_obs)
        for r in q_changepoint_fit(spark, SF_SMOKE).collect()
    }
    assert out, "no groups met MIN_OBS"
    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")
    monthly = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            F.date_trunc("month", "o_orderdate").cast("date").alias("mes"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(38,0)")
            .cast("long")
            .alias("cents")
        )
        .collect()
    )
    by_nation: dict[str, list] = {}
    for r in monthly:
        by_nation.setdefault(r.n_name, []).append((r.mes, r.cents))
    checked = 0
    for n_name, rows in by_nation.items():
        y = [(2 * c + 100000) // 200000 for _, c in sorted(rows)]
        exact = _cp_exact_betas(y)
        if exact is None:
            assert not any(k[0] == n_name for k in out)
            continue
        for i, coef in enumerate(_CP_COEFS):
            assert out[(n_name, coef)] == (exact[i], len(y))
            checked += 1
    assert checked >= 5


def test_div_half_away_matches_duckdb():
    """Pins the bands ladder's sign-split round-half-away division and
    its SQL restatement (DuckDB // truncates on negatives, Python
    floors — the split keeps operands non-negative)."""
    import duckdb

    from etl_python_spark.ml.forecast import (
        _div_half_away,
        _div_half_away_sql,
    )

    cases = [
        (7, 2), (-7, 2), (1, 2), (-1, 2), (3, 2), (-3, 2), (0, 9),
        (10**25 + 3, 10**7 + 1), (-(10**25) - 3, 10**7 + 1),
        (4999, 10_000), (5000, 10_000), (-5000, 10_000), (5001, 10_000),
    ]
    expr = _div_half_away_sql("num", "den")
    for num, den in cases:
        py = _div_half_away(num, den)
        (db,) = duckdb.execute(
            f"SELECT {expr} FROM (SELECT CAST(? AS HUGEINT) AS num, "
            f"CAST(? AS HUGEINT) AS den)",
            [str(num), str(den)],
        ).fetchone()
        assert py == int(db), (num, den, py, db)
    assert _div_half_away(5000, 10_000) == 1   # half rounds away
    assert _div_half_away(-5000, 10_000) == -1
    assert _div_half_away(4999, 10_000) == 0


def test_changepoint_hugeint_headroom_guard():
    """Round-14 ADVICE: the fit/bands oracles' HUGEINT headroom is
    data-dependent — a series large enough to overflow the DuckDB
    Leibniz partials must fail the SPARK side first with an
    actionable message, never a mid-oracle HUGEINT hard error."""
    import pytest

    from etl_python_spark.ml.forecast import (
        _assert_hugeint_headroom,
        _cp_exact_betas,
        _det5_checked,
    )

    # direct: the checked det tracks left-assoc partials in SQL order
    val, mx = _det5_checked(lambda a, c: 10**8)
    assert val == 0 and mx >= 10**40  # prefix products dominate
    with pytest.raises(ValueError, match="HUGEINT headroom"):
        _assert_hugeint_headroom(mx, "test")
    # integration: a series ~1e7x the sf0.1 revenue scale trips the
    # guard inside the exact solve (empirically DuckDB overflows at
    # exactly this magnitude — predicted partial 2.7e38); the real
    # scales stay clear with ~8600x headroom (sf0.1 measured max
    # partial 1.85e31, scaling linearly in y)
    big = [(10**4 + 137 * t) * 10**7 for t in range(84)]
    with pytest.raises(ValueError, match="oarsen the y quantization"):
        _cp_exact_betas(big)
    ok = [10**4 + 7 * t for t in range(84)]  # ~sf0.1 magnitudes
    assert _cp_exact_betas(ok) is not None


def test_changepoint_bands_match_float_composition(spark):
    """Ties ml_changepoint_bands to the real float code path (the
    forecast_changepoints_per_group composition): on the SAME
    quantized series, the exact-integer ladder must reproduce the
    numpy trend + seasonal-residual + z·σ·sqrt(1+h/n) band up to the
    micro/centi quantization — the transitive pin that makes the
    DuckDB oracle evidence about the library composition, not just
    about the integer restatement."""
    import math

    import numpy as np

    from tests.conftest import SF_SMOKE

    from etl_python_spark.ml.forecast import (
        CP_BANDS_HORIZON,
        CP_BANDS_Z,
        MIN_OBS,
        _add_months,
        fit_changepoint_trend,
        q_changepoint_bands,
    )
    from etl_python_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    out = {
        (r.n_name, r.h): r
        for r in q_changepoint_bands(spark, SF_SMOKE).collect()
    }
    assert out, "no groups met MIN_OBS"

    orders = load_table(spark, SF_SMOKE, "orders")
    customer = load_table(spark, SF_SMOKE, "customer")
    nation = load_table(spark, SF_SMOKE, "nation")
    monthly = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(nation, customer.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            F.date_trunc("month", "o_orderdate").cast("date").alias("mes"),
        )
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("decimal(38,0)")
            .cast("long")
            .alias("cents")
        )
        .collect()
    )
    by_nation: dict[str, list] = {}
    for r in monthly:
        by_nation.setdefault(r.n_name, []).append((r.mes, r.cents))
    checked = 0
    for name, rows in sorted(by_nation.items()):
        pts = sorted(rows)
        y = [(2 * c + 100000) // 200000 for _, c in pts]
        n = len(y)
        if n < MIN_OBS:
            assert not any(k[0] == name for k in out)
            continue
        months = np.array([d.month for d, _ in pts])
        _, _, trend_fn = fit_changepoint_trend(
            np.asarray(y, dtype="float64"), n_changepoints=3
        )
        resid = np.asarray(y, dtype="float64") - trend_fn(np.arange(n))
        seas = {
            int(m): float(resid[months == m].mean()) for m in set(months)
        }
        s_in = np.array([seas[int(m)] for m in months])
        sigma = float((resid - s_in).std())
        last = pts[-1][0]
        for h in range(1, CP_BANDS_HORIZON + 1):
            row = out[(name, h)]
            mes_f = _add_months(last, h)
            assert row.mes == mes_f and row.n_obs == n
            yhat = float(trend_fn(np.array([n - 1.0 + h]))[0]) + seas.get(
                mes_f.month, 0.0
            )
            widen = sigma * CP_BANDS_Z * math.sqrt(1.0 + h / n)
            # micro-beta rounding propagates ≤ ~5e-7·Σ|z| ≈ 2e-4; the
            # centi band carries σ's centi² quantization + its own
            # half-centi rounding
            assert abs(row.previsao_micro / 1e6 - yhat) < max(
                1e-2, 1e-5 * abs(yhat)
            ), (name, h, row.previsao_micro / 1e6, yhat)
            assert abs(row.band_centi / 100 - widen) < max(
                5e-2, 1e-3 * widen
            ), (name, h, row.band_centi / 100, widen)
            # min/max bracket the (centi-rounded) point forecast
            assert row.previsao_min_centi <= round(
                row.previsao_micro / 1e4
            ) + 1
            assert row.previsao_max_centi >= round(
                row.previsao_micro / 1e4
            ) - 1
            checked += 1
    assert checked >= 6 * 5


def test_forecast_changepoints_per_group(spark):
    """The grouped Prophet-parity surface: per-nation forecasts with
    intervals that (a) bracket the point forecast, (b) widen with
    horizon distance, over the real monthly feature frame."""
    from tests.conftest import SF_SMOKE

    from etl_python_spark.ml.forecast import forecast_changepoints_per_group

    out = forecast_changepoints_per_group(spark, SF_SMOKE, horizon=6)
    rows = out.collect()
    assert rows, "no groups met MIN_OBS"
    by_nation = {}
    for r in rows:
        assert r.previsao_min <= r.previsao <= r.previsao_max, r
        by_nation.setdefault(r.n_name, []).append(r)
    for name, rs in by_nation.items():
        rs.sort(key=lambda r: r.mes)
        assert len(rs) == 6
        widths = [r.previsao_max - r.previsao_min for r in rs]
        # the band widens (weakly) with horizon distance
        assert all(b >= a - 1e-9 for a, b in zip(widths, widths[1:])), (
            name,
            widths,
        )


def test_read_excel_distributed_date_coercion(spark, tmp_path):
    """Declared DateType columns convert Excel day serials (and
    tolerate ISO strings); junk becomes NULL."""
    import datetime

    from etl_python_spark.sources import xlsx
    from etl_python_spark.sources.readers import read_excel_distributed

    land = tmp_path / "wb"
    land.mkdir()
    # serial 45292 = 2024-01-01 (1900 system)
    xlsx.write_xlsx(
        str(land / "w.xlsx"),
        {"S": (["cliente", "data"], [["a", 45292.0], ["b", "2023-06-15"], ["c", "???"]])},
    )
    out = {r.cliente: r.data for r in read_excel_distributed(
        spark, str(land), "cliente string, data date"
    ).collect()}
    assert out["a"] == datetime.date(2024, 1, 1)
    assert out["b"] == datetime.date(2023, 6, 15)
    assert out["c"] is None


def test_read_excel_distributed_int_coercion_nullifies_fractions(spark, tmp_path):
    """ADVICE r7 (readers.py:234): a fractional cell in a declared
    int column must become NULL under the PERMISSIVE contract — the
    bare Int64 astype raised 'cannot safely cast' and killed the task."""
    from etl_python_spark.sources import xlsx
    from etl_python_spark.sources.readers import read_excel_distributed

    land = tmp_path / "wb"
    land.mkdir()
    xlsx.write_xlsx(
        str(land / "w.xlsx"),
        {"S": (["k", "qty"],
               [["a", 3], ["b", "1.5"], ["c", 2.0], ["d", "junk"], ["e", None]])},
    )
    out = {r.k: r.qty for r in read_excel_distributed(
        spark, str(land), "k string, qty bigint"
    ).collect()}
    assert out == {"a": 3, "b": None, "c": 2, "d": None, "e": None}


def test_read_excel_distributed_boolean_text_cells(spark, tmp_path):
    """ADVICE r7 (readers.py:236): textual booleans from text-formatted
    cells parse by value — 'FALSE'/'0'/'no' are False, not truthy-True;
    unrecognized text is NULL."""
    from etl_python_spark.sources import xlsx
    from etl_python_spark.sources.readers import read_excel_distributed

    land = tmp_path / "wb"
    land.mkdir()
    rows = [
        ["a", True], ["b", "FALSE"], ["c", "0"], ["d", "no"],
        ["e", "true"], ["f", 1], ["g", "maybe"], ["h", None], ["i", "Sim"],
    ]
    xlsx.write_xlsx(str(land / "w.xlsx"), {"S": (["k", "flag"], rows)})
    out = {r.k: r.flag for r in read_excel_distributed(
        spark, str(land), "k string, flag boolean"
    ).collect()}
    assert out == {
        "a": True, "b": False, "c": False, "d": False,
        "e": True, "f": True, "g": None, "h": None, "i": True,
    }


def test_changepoint_single_segment_fit_matches_population_moments():
    """Ties the ml_changepoint_spine oracle to the real code path: the
    library's lstsq fit with n_changepoints=0 must equal the
    population-moment OLS (_trend_fit ≡ DuckDB regr_slope/
    regr_intercept) to well past the 2dp the oracle rounds at."""
    import numpy as np

    from etl_python_spark.ml.forecast import _trend_fit, fit_changepoint_trend

    rng = np.random.RandomState(7)
    for n in (6, 24, 84):
        y = np.round(rng.uniform(1e5, 1e7, n), 2)
        params, cps, _ = fit_changepoint_trend(y, n_changepoints=0)
        assert len(cps) == 0 and len(params) == 2
        slope, icept = _trend_fit(
            np.arange(n, dtype="float64"), y, prec=6
        )
        assert abs(params[1] - slope) < 1e-4
        assert abs(params[0] - icept) < 1e-4


def test_changepoint_spine_knot_grid_is_closed_form():
    """The knot positions the spine query publishes are exactly the
    grid fit_changepoint_trend lays down: i·hi/(k+1) over the first
    80% of the series, k = min(3, n-2)."""
    import numpy as np

    from etl_python_spark.ml.forecast import fit_changepoint_trend

    for n in (6, 10, 84):
        y = np.arange(n, dtype="float64")
        _, cps, _ = fit_changepoint_trend(y, n_changepoints=3)
        k = min(3, n - 2)
        hi = max(0.8 * (n - 1), 1.0)
        want = [i * (hi / (k + 1)) for i in range(1, k + 1)]
        assert np.allclose(cps, want, atol=1e-12), (n, cps, want)


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    """ORC sink/scan roundtrip: values survive bit-for-bit, the scan
    prunes columns, and a key predicate reaches the ORC reader as a
    pushed filter (the same contract the parquet paths rely on)."""
    import contextlib
    import io

    from etl_python_spark.sources.readers import read_orc
    from etl_python_spark.sources.tables import load_table
    from etl_python_spark.sources.writers import write_orc

    src = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "orders_orc")
    write_orc(src, path)

    back = read_orc(spark, path)
    assert back.count() == src.count()
    # exact value parity on an order-independent digest
    import pyspark.sql.functions as F

    def digest(df):
        return df.select(
            F.sum(F.crc32(F.concat_ws("|", *sorted(df.columns)))).alias("d")
        ).collect()[0]["d"]

    assert digest(back) == digest(src)

    probe = back.filter(F.col("o_orderkey") == 42).select("o_totalprice")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]" in plan
    # column pruning: untouched columns absent from the read schema
    scan = next(s for s in plan.split("(") if "ReadSchema" in s)
    assert "o_orderpriority" not in scan


def test_changepoint_micro_ratio_property_matches_fraction():
    """Property: _micro_ratio is round-half-away-from-zero of the
    exact rational 1e6·num/den — checked against fractions.Fraction,
    an independent exact-arithmetic path, across sign/magnitude/tie
    structure."""
    import math
    from fractions import Fraction

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from etl_python_spark.ml.forecast import _micro_ratio

    @settings(max_examples=300, deadline=None)
    @given(
        num=st.integers(min_value=-(10**30), max_value=10**30),
        den=st.integers(min_value=1, max_value=10**25),
    )
    def check(num: int, den: int) -> None:
        mag = math.floor(Fraction(abs(num) * 1_000_000, den) + Fraction(1, 2))
        want = mag if num >= 0 else -mag
        assert _micro_ratio(num, den) == want

    check()


def test_changepoint_cramer_matches_fraction_gaussian_solve():
    """Independent-solver cross-check: _cp_exact_betas (Cramer over
    Leibniz determinants) must agree with exact Gaussian elimination
    over fractions.Fraction on the same normal equations — a wholly
    different algorithm on the same integers, so a bug in either the
    permutation signs, the symmetric-entry indexing, or the micro
    rounding cannot cancel out."""
    import math
    import random
    from fractions import Fraction

    from etl_python_spark.ml.forecast import MIN_OBS, _cp_exact_betas

    def fraction_solve(y):
        n = len(y)
        if n < MIN_OBS:
            return None
        z = [
            [5, 5 * t] + [max(0, 5 * t - i * (n - 1)) for i in (1, 2, 3)]
            for t in range(n)
        ]
        A = [
            [Fraction(sum(r[a] * r[b] for r in z)) for b in range(5)]
            + [Fraction(sum(z[t][a] * y[t] for t in range(n)))]
            for a in range(5)
        ]
        for col in range(5):  # partial-pivot Gaussian elimination
            piv = max(range(col, 5), key=lambda r: abs(A[r][col]))
            if A[piv][col] == 0:
                return None
            A[col], A[piv] = A[piv], A[col]
            for r in range(5):
                if r != col and A[r][col]:
                    f = A[r][col] / A[col][col]
                    A[r] = [a - f * b for a, b in zip(A[r], A[col])]
        betas = [A[i][5] / A[i][i] for i in range(5)]
        out = []
        for b in betas:
            v = 5 * b * 1_000_000  # unscale the 5x design, micro-quantize
            mag = math.floor(abs(v) + Fraction(1, 2))
            out.append(mag if v >= 0 else -mag)
        return out

    rng = random.Random(99)
    series = [
        [rng.randint(1, 20_000) for _ in range(n)] for n in (6, 7, 19, 80)
    ]
    series.append([100 + 7 * t for t in range(25)])  # exactly linear
    for y in series:
        assert _cp_exact_betas(y) == fraction_solve(y), y[:6]
