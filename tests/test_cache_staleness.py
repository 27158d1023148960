"""Staleness guards for the two materialized-snapshot caches
(round-11 verdict item 2): a snapshot banked under
SPARK_GRAFT_ANN_CACHE / SPARK_GRAFT_DEDUP_CACHE records the source
corpus's fingerprint in its txn commit app_meta; the cached read paths
re-fingerprint the corpus they are asked to serve and RAISE
StaleSnapshotError on mismatch — never silently serve stale results.
"""

import shutil
from pathlib import Path

import pytest

from tests.conftest import SF_SMOKE


def _make_corpus(tmp_path: Path) -> str:
    """A mutable copy of the sf0.001 documents/embeddings tables."""
    sf = tmp_path / "sf"
    sf.mkdir()
    for t in ("documents", "embeddings"):
        shutil.copy(f"{SF_SMOKE}/{t}.parquet", sf / f"{t}.parquet")
    return str(sf)


def _mutate(sf_dir: str, table: str) -> None:
    """Rewrite the table minus its last row — a real corpus change."""
    import pyarrow.parquet as pq

    p = Path(sf_dir) / f"{table}.parquet"
    tbl = pq.read_table(p)
    pq.write_table(tbl.slice(0, tbl.num_rows - 1), p)


def test_corpus_fingerprint_is_stable_and_mutation_sensitive(tmp_path):
    from etl_python_spark.sources.fingerprint import corpus_fingerprint

    sf = _make_corpus(tmp_path)
    fp1 = corpus_fingerprint(sf, "documents")
    assert fp1 == corpus_fingerprint(sf, "documents")  # pure stat, stable
    assert fp1 != corpus_fingerprint(sf, "embeddings")
    _mutate(sf, "documents")
    assert corpus_fingerprint(sf, "documents") != fp1
    with pytest.raises(FileNotFoundError):
        corpus_fingerprint(sf, "no_such_table")


def test_ann_cache_refuses_mutated_corpus(spark, tmp_path, monkeypatch):
    from etl_python_spark import operators
    from etl_python_spark.operators.similarity import materialize_ann_index
    from etl_python_spark.sources.fingerprint import StaleSnapshotError

    sf = _make_corpus(tmp_path)
    root = str(tmp_path / "ann")
    materialize_ann_index(spark, sf, root)
    monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", root)
    q = operators.all_queries()["ivf_pq_search"]
    assert q(spark, sf).count() == 50  # fresh snapshot serves fine

    _mutate(sf, "embeddings")
    with pytest.raises(StaleSnapshotError, match="embeddings"):
        q(spark, sf).count()

    # rebuild against the mutated corpus clears the refusal
    materialize_ann_index(spark, sf, root)
    assert q(spark, sf).count() == 50


def test_dedup_cache_refuses_mutated_corpus(spark, tmp_path, monkeypatch):
    from etl_python_spark import operators
    from etl_python_spark.operators.dedup import materialize_dedup_endgame
    from etl_python_spark.sources.fingerprint import StaleSnapshotError

    sf = _make_corpus(tmp_path)
    root = str(tmp_path / "dedup")
    materialize_dedup_endgame(spark, sf, root)
    monkeypatch.setenv("SPARK_GRAFT_DEDUP_CACHE", root)
    q = operators.all_queries()["dedup_components"]
    assert q(spark, sf).count() > 0

    _mutate(sf, "documents")
    with pytest.raises(StaleSnapshotError, match="documents"):
        q(spark, sf).count()


def test_unstamped_snapshot_is_refused_not_trusted(spark, tmp_path):
    """A snapshot committed WITHOUT a fingerprint (pre-guard or foreign
    writer) is unverifiable — the guard treats it as stale rather than
    serving it blind."""
    from etl_python_spark.sources.fingerprint import (
        StaleSnapshotError,
        check_snapshot_fresh,
    )
    from etl_python_spark.sources.txn import txn_write

    sf = _make_corpus(tmp_path)
    path = str(tmp_path / "bare")
    txn_write(spark, spark.range(3), path)  # no app_meta
    with pytest.raises(StaleSnapshotError):
        check_snapshot_fresh(spark, path, sf, "documents")
