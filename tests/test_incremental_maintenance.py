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


class TestDedupIncremental:
    @pytest.fixture(scope="class")
    def dirs(self, spark, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("dedup_incr")
        base, grown = _split_corpus(
            spark, tmp, "documents", "doc_id", 10, 9
        )
        root = str(tmp / "root")
        from etl_python_spark.operators.dedup import materialize_dedup_endgame

        materialize_dedup_endgame(spark, base, root)
        return base, grown, root

    def test_refresh_matches_from_scratch_rebuild(self, spark, dirs, tmp_path):
        """The whole point: incremental refresh on the grown corpus is
        byte-identical — pairs, components, counts — to a from-scratch
        materialization of the grown corpus."""
        from etl_python_spark.operators.dedup import (
            materialize_dedup_endgame,
            refresh_dedup_endgame_incremental,
        )
        from etl_python_spark.sources.txn import txn_read

        base, grown, root = dirs
        versions = refresh_dedup_endgame_incremental(spark, grown, root)
        assert len(versions) == 6 and all(v == 2 for v in versions.values())

        scratch = str(tmp_path / "scratch")
        materialize_dedup_endgame(spark, grown, scratch)
        for table in ("pairs", "components"):
            got = _canon(txn_read(spark, f"{root}/{table}"))
            want = _canon(txn_read(spark, f"{scratch}/{table}"))
            assert got == want, f"{table}: incremental != rebuild"
        # counts may carry inert inter=0 tombstones; compare live rows
        import pyspark.sql.functions as F

        got = _canon(txn_read(spark, f"{root}/counts").filter(F.col("inter") > 0))
        want = _canon(txn_read(spark, f"{scratch}/counts"))
        assert got == want, "counts: incremental != rebuild"

    def test_refreshed_cache_serves_grown_corpus(self, spark, dirs, monkeypatch):
        """After the refresh the staleness guard accepts the grown
        corpus and the endgame queries serve from the snapshot with
        results identical to inline."""
        from etl_python_spark import operators

        base, grown, root = dirs
        qs = operators.all_queries()
        inline = _canon(qs["dedup_components"](spark, grown))
        monkeypatch.setenv("SPARK_GRAFT_DEDUP_CACHE", root)
        cached = _canon(qs["dedup_components"](spark, grown))
        assert cached == inline

    def test_refresh_is_idempotent(self, spark, dirs):
        """Re-running with no new docs publishes clean no-op versions."""
        from etl_python_spark.operators.dedup import (
            refresh_dedup_endgame_incremental,
        )
        from etl_python_spark.sources.txn import txn_read

        base, grown, root = dirs
        before = _canon(txn_read(spark, f"{root}/pairs"))
        refresh_dedup_endgame_incremental(spark, grown, root)
        assert _canon(txn_read(spark, f"{root}/pairs")) == before


def test_cap_crossing_adjustment_is_exact(spark, tmp_path):
    """Synthetic hot shingle: a base pair exists only through a
    shingle at df = MAX_DF; delta docs push that shingle over the cap,
    so the pair must VANISH from the incremental result exactly as it
    does from a full recompute."""
    import pyspark.sql.functions as F

    from etl_python_spark.operators.dedup import (
        MAX_DF,
        _incremental_pair_counts,
        _jaccard_from_counts,
        _pair_counts,
        hashed_shingle_stream,
    )

    # base: MAX_DF docs all sharing one hot text (df(shingles)=MAX_DF,
    # exactly at the cap -> pairs exist); delta: 2 more copies -> over
    # the cap -> every pair through it must disappear
    hot = "alpha beta gamma delta epsilon"
    base_rows = [(i, hot) for i in range(MAX_DF)]
    delta_rows = [(1000 + i, hot) for i in range(2)]
    base_docs = spark.createDataFrame(base_rows, "doc_id long, text string")
    delta_docs = spark.createDataFrame(delta_rows, "doc_id long, text string")

    base_sh = hashed_shingle_stream(base_docs).localCheckpoint(eager=True)
    delta_sh = hashed_shingle_stream(delta_docs).localCheckpoint(eager=True)
    base_df = base_sh.groupBy("h").agg(F.count("*").alias("df"))
    base_kept = base_sh.join(
        base_df.filter((F.col("df") >= 2) & (F.col("df") <= MAX_DF)),
        "h",
        "left_semi",
    )
    base_counts = _pair_counts(base_kept)
    assert base_counts.count() == MAX_DF * (MAX_DF - 1) // 2  # at the cap

    counts_new, changed, df_changed = _incremental_pair_counts(
        base_sh, base_df, base_counts, delta_sh
    )
    assert _jaccard_from_counts(counts_new).count() == 0  # all pairs gone
    # the changed-rows feed carries the tombstones for the merge
    assert changed.filter(F.col("inter") > 0).count() == 0
    # full recompute agrees
    grown_sh = base_sh.unionByName(delta_sh)
    grown_df = grown_sh.groupBy("h").agg(F.count("*").alias("df"))
    grown_kept = grown_sh.join(
        grown_df.filter((F.col("df") >= 2) & (F.col("df") <= MAX_DF)),
        "h",
        "left_semi",
    )
    assert _jaccard_from_counts(_pair_counts(grown_kept)).count() == 0


class TestAnnOnDelete:
    """Round-12 late addition: the takedown mirror of growth — purge a
    slice, delete exactly its index rows under the byte-frozen model,
    byte-identical to a from-scratch recode of the survivors."""

    @pytest.fixture(scope="class")
    def dirs(self, spark, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("ann_del")
        shrunk, full = _split_corpus(
            spark, tmp, "embeddings", "vec_id", 100, 3
        )
        root = str(tmp / "root")
        from etl_python_spark.operators.similarity import materialize_ann_index

        materialize_ann_index(spark, full, root)
        return shrunk, full, root

    def test_delete_refresh_is_byte_identical_and_runs_no_fit(
        self, spark, dirs, monkeypatch
    ):
        from etl_python_spark.operators import similarity as S
        from etl_python_spark.sources.txn import txn_read

        shrunk, full, root = dirs

        def boom(*a, **k):
            raise AssertionError("Lloyd fit ran during delete refresh")

        monkeypatch.setattr(S, "_kmeans_fit", boom)
        monkeypatch.setattr(S, "_pq_fit", boom)
        versions = S.refresh_ann_index_on_delete(spark, shrunk, root)
        assert versions == {"index": 2, "model": 2}

        centroids, cb = S._snapshot_model(spark, root)
        rebuilt = S._ivf_pq_index(
            S._unit_emb(S._kmeans_emb(spark, shrunk)), centroids, cb
        )
        assert _canon(txn_read(spark, f"{root}/index")) == _canon(rebuilt)

        # purged ids are gone and the shrunk corpus now serves
        gone = (
            txn_read(spark, f"{root}/index")
            .filter("n_id % 100 = 3")
            .count()
        )
        assert gone == 0
        monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", root)
        from etl_python_spark import operators

        # the guard accepts the shrunk corpus and the query serves
        # (row count < the full corpus's 50: vec_id 3 was BOTH a query
        # vector and a corpus member, and it is gone — purging shrinks
        # the query batch too, which is exactly right for a takedown)
        assert operators.all_queries()["ivf_pq_search"](spark, shrunk).count() > 0

    def test_delete_refresh_is_idempotent(self, spark, dirs):
        from etl_python_spark.operators import similarity as S
        from etl_python_spark.sources.txn import txn_read

        shrunk, full, root = dirs
        before = _canon(txn_read(spark, f"{root}/index"))
        S.refresh_ann_index_on_delete(spark, shrunk, root)
        assert _canon(txn_read(spark, f"{root}/index")) == before


class TestDedupOnDelete:
    @pytest.fixture(scope="class")
    def dirs(self, spark, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("dedup_del")
        shrunk, full = _split_corpus(spark, tmp, "documents", "doc_id", 10, 3)
        root = str(tmp / "root")
        from etl_python_spark.operators.dedup import materialize_dedup_endgame

        materialize_dedup_endgame(spark, full, root)
        return shrunk, full, root

    def test_delete_refresh_matches_from_scratch_rebuild(
        self, spark, dirs, tmp_path
    ):
        import pyspark.sql.functions as F

        from etl_python_spark.operators.dedup import (
            materialize_dedup_endgame,
            refresh_dedup_endgame_on_delete,
        )
        from etl_python_spark.sources.txn import txn_read

        shrunk, full, root = dirs
        refresh_dedup_endgame_on_delete(spark, shrunk, root)

        scratch = str(tmp_path / "scratch")
        materialize_dedup_endgame(spark, shrunk, scratch)
        for table in ("pairs", "components"):
            got = _canon(txn_read(spark, f"{root}/{table}"))
            want = _canon(txn_read(spark, f"{scratch}/{table}"))
            assert got == want, f"{table}: delete refresh != rebuild"
        got = _canon(
            txn_read(spark, f"{root}/counts").filter(F.col("inter") > 0)
        )
        want = _canon(txn_read(spark, f"{scratch}/counts"))
        assert got == want, "counts: delete refresh != rebuild"
        # purged docs left every per-doc table
        for table in ("sizes", "postings"):
            n = (
                txn_read(spark, f"{root}/{table}")
                .filter("doc_id % 10 = 3")
                .count()
            )
            assert n == 0, f"{table} still holds purged docs"

    def test_refreshed_cache_serves_shrunk_corpus(
        self, spark, dirs, monkeypatch
    ):
        from etl_python_spark import operators

        shrunk, full, root = dirs
        qs = operators.all_queries()
        inline = _canon(qs["dedup_components"](spark, shrunk))
        monkeypatch.setenv("SPARK_GRAFT_DEDUP_CACHE", root)
        assert _canon(qs["dedup_components"](spark, shrunk)) == inline


def test_cap_recross_addition_is_exact(spark):
    """The delete-side mirror of the cap-crossing test: a hot shingle
    sits just OVER the cap (df = MAX_DF + 2, no pairs through it);
    purging two holders brings it back to df = MAX_DF, so every
    survivor pair through it must APPEAR in the decremental result
    exactly as in a full recompute of the survivors."""
    import pyspark.sql.functions as F

    from etl_python_spark.operators.dedup import (
        MAX_DF,
        _decremental_pair_counts,
        _jaccard_from_counts,
        _pair_counts,
        hashed_shingle_stream,
    )

    hot = "alpha beta gamma delta epsilon"
    rows = [(i, hot) for i in range(MAX_DF + 2)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    base_sh = hashed_shingle_stream(docs).localCheckpoint(eager=True)
    base_df = base_sh.groupBy("h").agg(F.count("*").alias("df"))
    base_kept = base_sh.join(
        base_df.filter((F.col("df") >= 2) & (F.col("df") <= MAX_DF)),
        "h",
        "left_semi",
    )
    base_counts = _pair_counts(base_kept)
    assert base_counts.count() == 0  # over the cap: no pairs banked

    removed = spark.createDataFrame(
        [(MAX_DF,), (MAX_DF + 1,)], "doc_id long"
    )
    surv_sh = base_sh.join(removed, "doc_id", "left_anti")
    counts_new, changed, df_changed = _decremental_pair_counts(
        surv_sh, base_df, base_counts, removed
    )
    expect = MAX_DF * (MAX_DF - 1) // 2
    assert _jaccard_from_counts(counts_new).count() == expect
    assert changed.filter(F.col("inter") > 0).count() == expect
    # full recompute of the survivors agrees
    surv_df = surv_sh.groupBy("h").agg(F.count("*").alias("df"))
    surv_kept = surv_sh.join(
        surv_df.filter((F.col("df") >= 2) & (F.col("df") <= MAX_DF)),
        "h",
        "left_semi",
    )
    assert _jaccard_from_counts(_pair_counts(surv_kept)).count() == expect


class TestRightToBeForgotten:
    """Composed right-to-be-forgotten flagship (round-12 verdict item
    4): ONE purge request drives every mutation the lake must make —
    txn key-frame DELETE on the master corpus table, the training-
    shard rewrite, BOTH cache delete-refreshes, and vacuum on every
    root — and afterwards no serve path shows a trace: master, shards,
    endgame queries, and ANN search all return zero rows for the
    purged ids and byte-match a from-scratch build of the shrunk
    corpus, and no vacuumed version dir survives on disk."""

    @pytest.fixture(scope="class")
    def world(self, spark, tmp_path_factory):
        import shutil

        from etl_python_spark.operators.dedup import (
            materialize_dedup_endgame,
            refresh_dedup_endgame_on_delete,
        )
        from etl_python_spark.operators.similarity import (
            materialize_ann_index,
            refresh_ann_index_on_delete,
        )
        from etl_python_spark.sources.txn import (
            txn_delete_keys,
            txn_read,
            txn_write,
            vacuum,
            vacuum_root,
        )
        from etl_python_spark.sources.writers import write_training_shards

        tmp = tmp_path_factory.mktemp("rtbf")
        (tmp / "docs").mkdir()
        (tmp / "emb").mkdir()
        doc_shrunk, doc_full = _split_corpus(
            spark, tmp / "docs", "documents", "doc_id", 10, 3
        )
        emb_shrunk, emb_full = _split_corpus(
            spark, tmp / "emb", "embeddings", "vec_id", 100, 3
        )

        # the pre-purge world: txn master copy, shards, both caches
        master = str(tmp / "master_documents")
        txn_write(
            spark, spark.read.parquet(f"{doc_full}/documents.parquet"), master
        )
        shards = str(tmp / "shards")
        write_training_shards(
            txn_read(spark, master), shards, shards=4, fmt="json"
        )
        dedup_root = str(tmp / "dedup_root")
        ann_root = str(tmp / "ann_root")
        materialize_dedup_endgame(spark, doc_full, dedup_root)
        materialize_ann_index(spark, emb_full, ann_root)

        # THE PURGE REQUEST: docs doc_id % 10 == 3 (and their vectors,
        # vec_id % 100 == 3), expressed once as key frames
        purged = txn_read(spark, master).filter("doc_id % 10 = 3").select(
            "doc_id"
        )
        txn_delete_keys(spark, master, purged, on=["doc_id"])
        shutil.rmtree(shards)
        write_training_shards(
            txn_read(spark, master), shards, shards=4, fmt="json"
        )
        refresh_dedup_endgame_on_delete(spark, doc_shrunk, dedup_root)
        refresh_ann_index_on_delete(spark, emb_shrunk, ann_root)
        vacuum(spark, master, min_age_seconds=0)
        vacuum_root(spark, dedup_root, min_age_seconds=0)
        vacuum_root(spark, ann_root, min_age_seconds=0)
        return {
            "doc_shrunk": doc_shrunk,
            "emb_shrunk": emb_shrunk,
            "emb_full": emb_full,
            "master": master,
            "shards": shards,
            "dedup_root": dedup_root,
            "ann_root": ann_root,
            "tmp": tmp,
        }

    def test_master_and_disk_hold_no_trace(self, spark, world):
        from pathlib import Path

        from etl_python_spark.sources.txn import read_commit, txn_read

        assert (
            txn_read(spark, world["master"]).filter("doc_id % 10 = 3").count()
            == 0
        )
        # every table root holds ONLY the live snapshot's version dirs
        roots = [world["master"]] + [
            str(t)
            for cache in ("dedup_root", "ann_root")
            for t in Path(world[cache]).iterdir()
            if t.is_dir()
        ]
        for root in roots:
            live = set(read_commit(spark, root)["dirs"])
            on_disk = {
                p.name
                for p in Path(root).iterdir()
                if p.is_dir() and p.name.startswith("v-")
            }
            assert on_disk == live, f"{root}: historical dirs survive vacuum"

    def test_shards_match_from_scratch_rewrite(self, spark, world):
        import glob
        import json

        from etl_python_spark.sources.writers import write_training_shards

        def shard_map(out):
            m = {}
            for d in sorted(glob.glob(f"{out}/shard=*")):
                ids = set()
                for f in glob.glob(f"{d}/part-*"):
                    with open(f) as fh:
                        ids |= {
                            json.loads(line)["doc_id"]
                            for line in fh
                            if line.strip()
                        }
                m[int(d.rsplit("=", 1)[1])] = frozenset(ids)
            return m

        got = shard_map(world["shards"])
        assert all(i % 10 != 3 for ids in got.values() for i in ids)
        scratch = str(world["tmp"] / "shards_scratch")
        write_training_shards(
            spark.read.parquet(f"{world['doc_shrunk']}/documents.parquet"),
            scratch,
            shards=4,
            fmt="json",
        )
        assert got == shard_map(scratch)

    def test_endgame_serve_is_scratch_identical_and_purged_free(
        self, spark, world, tmp_path, monkeypatch
    ):
        import pyspark.sql.functions as F

        from etl_python_spark import operators
        from etl_python_spark.operators.dedup import materialize_dedup_endgame
        from etl_python_spark.sources.txn import txn_read

        root = world["dedup_root"]
        scratch = str(tmp_path / "scratch_endgame")
        materialize_dedup_endgame(spark, world["doc_shrunk"], scratch)
        for table in ("pairs", "components", "sizes", "postings"):
            got = txn_read(spark, f"{root}/{table}")
            if "doc_id" in got.columns:
                assert got.filter("doc_id % 10 = 3").count() == 0, table
            want = txn_read(spark, f"{scratch}/{table}")
            if table in ("pairs", "components"):
                assert _canon(got) == _canon(want), table
        got_counts = _canon(
            txn_read(spark, f"{root}/counts").filter(F.col("inter") > 0)
        )
        assert got_counts == _canon(txn_read(spark, f"{scratch}/counts"))

        qs = operators.all_queries()
        inline = _canon(qs["dedup_components"](spark, world["doc_shrunk"]))
        monkeypatch.setenv("SPARK_GRAFT_DEDUP_CACHE", root)
        assert (
            _canon(qs["dedup_components"](spark, world["doc_shrunk"]))
            == inline
        )

    def test_ann_serve_is_frozen_model_identical_and_purged_free(
        self, spark, world, monkeypatch
    ):
        """The ANN serve ground truth after a takedown is NOT an
        inline re-fit on the shrunk corpus — the model is FROZEN at
        its pre-delete fit (an inline fit would even fail here: the
        purge removed init-sample vector vec_id=3).  Truth = an
        INDEPENDENTLY built cache that runs the same lifecycle
        (full-corpus fit, then the takedown refresh): the composed
        flow must serve byte-identically to it, return results, and
        never surface a purged neighbor."""
        from etl_python_spark import operators
        from etl_python_spark.operators.similarity import (
            materialize_ann_index,
            refresh_ann_index_on_delete,
        )
        from etl_python_spark.sources.txn import txn_read

        root = world["ann_root"]
        assert (
            txn_read(spark, f"{root}/index").filter("n_id % 100 = 3").count()
            == 0
        )
        qs = operators.all_queries()
        scratch = str(world["tmp"] / "ann_scratch")
        materialize_ann_index(spark, world["emb_full"], scratch)
        refresh_ann_index_on_delete(spark, world["emb_shrunk"], scratch)
        monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", scratch)
        want = _canon(qs["ivf_pq_search"](spark, world["emb_shrunk"]))
        monkeypatch.setenv("SPARK_GRAFT_ANN_CACHE", root)
        served = qs["ivf_pq_search"](spark, world["emb_shrunk"])
        rows = served.collect()
        assert rows, "served search returned nothing"
        assert all(r.n_id % 100 != 3 for r in rows)  # no purged neighbor
        assert _canon(served) == want
