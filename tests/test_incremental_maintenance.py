"""Incremental snapshot maintenance (round-11 verdict item 3): after
the corpus grows, the ANN index gains ONLY the new vectors' code rows
via txn MERGE (coded against the FROZEN model, no Lloyd job) and the
dedup endgame gains only delta-touched pairs/labels — and in both
cases merge-then-serve is byte-identical to a from-scratch rebuild on
the grown corpus under the same semantics."""

import os

import pytest

from tests.conftest import SF_SMOKE


def _split_corpus(spark, tmp_path, table, id_col, mod, rem):
    """base/ and grown/ corpus dirs: grown = the sf0.001 table, base =
    grown minus the (id % mod == rem) delta slice."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SF_SMOKE}/{table}.parquet")
    ids = tbl[id_col].to_pylist()
    keep = [i % mod != rem for i in ids]
    base_dir, grown_dir = tmp_path / "base", tmp_path / "grown"
    base_dir.mkdir(exist_ok=True)
    grown_dir.mkdir(exist_ok=True)
    pq.write_table(tbl.filter(keep), base_dir / f"{table}.parquet")
    pq.write_table(tbl, grown_dir / f"{table}.parquet")
    return str(base_dir), str(grown_dir)


def _canon(df):
    return sorted(tuple(str(v) for v in r) for r in df.collect())


class TestAnnIncremental:
    @pytest.fixture(scope="class")
    def dirs(self, spark, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("ann_incr")
        base, grown = _split_corpus(
            spark, tmp, "embeddings", "vec_id", 100, 97
        )
        root = str(tmp / "root")
        from etl_python_spark.operators.similarity import materialize_ann_index

        versions = materialize_ann_index(spark, base, root)
        assert versions == {"model": 1, "index": 1}
        return base, grown, root

    def test_stale_root_refuses_grown_corpus_until_refreshed(
        self, spark, dirs, monkeypatch
    ):
        from etl_python_spark import operators
        from etl_python_spark.sources.fingerprint import StaleSnapshotError

        base, grown, root = dirs
        monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", root)
        q = operators.all_queries()["ivf_pq_search"]
        with pytest.raises(StaleSnapshotError):
            q(spark, grown).count()

    def test_merge_is_byte_identical_to_frozen_model_recode(
        self, spark, dirs, monkeypatch
    ):
        from etl_python_spark.operators import similarity as S
        from etl_python_spark.sources.txn import txn_read

        base, grown, root = dirs
        versions = S.refresh_ann_index_incremental(spark, grown, root)
        assert versions == {"index": 2, "model": 2}

        # merged snapshot == from-scratch recode of the grown corpus
        # under the SAME frozen model, byte-for-byte
        centroids, cb = S._snapshot_model(spark, root)
        emb = S._kmeans_emb(spark, grown)
        rebuilt = S._ivf_pq_index(S._unit_emb(emb), centroids, cb)
        merged = txn_read(spark, f"{root}/index")
        assert _canon(merged) == _canon(rebuilt)

        # refresh re-banked the grown fingerprint: serving now works,
        # and with NO Lloyd fit (the index/model are served frozen)
        def boom(*a, **k):
            raise AssertionError("Lloyd fit ran on the incremental path")

        monkeypatch.setattr(S, "_kmeans_fit", boom)
        monkeypatch.setattr(S, "_pq_fit", boom)
        monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", root)
        from etl_python_spark import operators

        assert operators.all_queries()["ivf_pq_search"](spark, grown).count() == 50

    def test_refresh_runs_no_lloyd_fit(self, spark, dirs, monkeypatch):
        from etl_python_spark.operators import similarity as S

        base, grown, root = dirs

        def boom(*a, **k):
            raise AssertionError("Lloyd fit ran during incremental refresh")

        monkeypatch.setattr(S, "_kmeans_fit", boom)
        monkeypatch.setattr(S, "_pq_fit", boom)
        # idempotent re-run: nothing new to code, still commits cleanly
        versions = S.refresh_ann_index_incremental(spark, grown, root)
        assert versions["index"] >= 3
