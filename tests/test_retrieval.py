"""BM25 lexical retrieval (operators/retrieval.py).

Hand-computed scores on a tiny corpus, rank/tie-break discipline,
partition invariance, and the broadcast-prune plan shape.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.retrieval import (
    BM25_B,
    BM25_K1,
    bm25_scores,
    bm25_topk,
    doc_lengths,
    queries_df,
)
from xarray_dataaccessor_spark.operators.text import word_counts


@pytest.fixture(scope="module")
def tiny(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "c c c c")],
        "doc_id bigint, text string",
    )
    return word_counts(docs)


def _bm25(tf: int, dl: int, df: int, n: int, avgdl: float) -> float:
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    tfn = (tf * (BM25_K1 + 1.0)) / (
        tf + BM25_K1 * ((1.0 - BM25_B) + BM25_B * dl / avgdl)
    )
    return round(idf * tfn, 6)


def test_hand_computed_scores(spark, tiny):
    q = queries_df(spark, {0: "a c"})
    got = {
        r["doc_id"]: float(r["score"])
        for r in bm25_scores(tiny, q).collect()
    }
    # corpus: d1='a b a' (dl 3), d2='b c' (dl 2), d3='c c c c' (dl 4)
    # N=3, avgdl=3; df(a)=1, df(c)=2
    assert got == {
        1: _bm25(2, 3, 1, 3, 3.0),
        2: _bm25(1, 2, 2, 3, 3.0),
        3: _bm25(4, 4, 2, 3, 3.0),
    }


def test_multi_term_sum_and_rank(spark, tiny):
    q = queries_df(spark, {0: "a c", 1: "b"})
    out = bm25_topk(tiny, q, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["rk"], r["doc_id"]))
    # q0: d1 (a twice, short doc) outranks d3 (c four times, long doc)
    assert sorted(by_q[0]) == [(1, 1), (2, 3)]
    # q1 'b': tf=1 in both d1 (dl 3) and d2 (dl 2) — shorter doc wins
    assert sorted(by_q[1]) == [(1, 2), (2, 1)]


def test_tie_break_on_doc_id(spark):
    docs = spark.createDataFrame(
        [(7, "x y"), (3, "x y"), (5, "x y")], "doc_id bigint, text string"
    )
    out = bm25_topk(word_counts(docs), queries_df(spark, ["x"]), k=3).collect()
    assert [(r["rk"], r["doc_id"]) for r in sorted(out, key=lambda r: r["rk"])] == [
        (1, 3), (2, 5), (3, 7)
    ]


def test_only_matching_docs_scored(spark, tiny):
    q = queries_df(spark, {0: "a"})
    got = bm25_scores(tiny, q).select("doc_id").collect()
    assert {r["doc_id"] for r in got} == {1}


def test_duplicate_query_terms_dropped(spark, tiny):
    one = bm25_scores(tiny, queries_df(spark, {0: "a c"})).collect()
    two = bm25_scores(tiny, queries_df(spark, {0: "a a c c"})).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, two))


def test_partition_invariance(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    q = queries_df(spark, {0: "hash join", 1: "customer query fast"})
    a = bm25_topk(word_counts(docs), q, k=5).collect()
    b = bm25_topk(word_counts(docs.repartition(13)), q, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_doc_lengths_from_postings(spark, tiny):
    got = {r["doc_id"]: r["dl"] for r in doc_lengths(tiny).collect()}
    assert got == {1: 3, 2: 2, 3: 4}


def test_precomputed_dl_matches_derived(spark, tiny):
    q = queries_df(spark, {0: "a c"})
    dl = doc_lengths(tiny).cache()
    try:
        a = bm25_scores(tiny, q).collect()
        b = bm25_scores(tiny, q, dl=dl).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    finally:
        dl.unpersist()


def test_rrf_fuse_hand_computed(spark):
    """RRF of two ranked lists: overlapping docs sum both reciprocals,
    single-list docs contribute one; ranks re-derive from the fused
    score with the doc-id tie-break."""
    from xarray_dataaccessor_spark.operators.retrieval import rrf_fuse

    dense = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        "query_id bigint, doc_id bigint, rk int",
    )
    lex = spark.createDataFrame(
        [(0, 11, 1), (0, 13, 2)],
        "query_id bigint, doc_id bigint, rk int",
    )
    out = {
        r["doc_id"]: (float(r["score"]), r["rk"])
        for r in rrf_fuse(dense, lex, k=4).collect()
    }
    r = lambda x: round(1.0 / (60 + x), 6)
    assert out[11] == (r(2) + r(1), 1)  # in both lists -> top
    assert out[10] == (r(1), 2)
    assert out[13] == (r(2), 3)
    assert out[12] == (r(3), 4)


def test_rrf_tie_breaks_on_doc_id(spark):
    from xarray_dataaccessor_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame(
        [(0, 9, 1)], "query_id bigint, doc_id bigint, rk int"
    )
    b = spark.createDataFrame(
        [(0, 4, 1)], "query_id bigint, doc_id bigint, rk int"
    )
    out = sorted(
        (r["rk"], r["doc_id"]) for r in rrf_fuse(a, b, k=2).collect()
    )
    assert out == [(1, 4), (2, 9)]  # equal scores -> lower id first


def _snapshot_files(root):
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.startswith("_") or f.startswith("."):
                continue
            p = os.path.join(dirpath, f)
            st = os.stat(p)
            out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime_ns)
    return out


QUERIES = {0: "hash join", 1: "customer query fast"}


def test_persisted_index_parity(spark, sf_dir, tmp_path):
    """query_bm25_index == bm25_topk bit-exactly over the same corpus
    (shared _bm25_contrib expression; stats via meta.json)."""
    from xarray_dataaccessor_spark.operators.retrieval import (
        build_bm25_index,
        query_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    wc = word_counts(docs)
    path = str(tmp_path / "bm25")
    build_bm25_index(wc, path, n_buckets=16)
    a = bm25_topk(wc, queries_df(spark, QUERIES), k=5).collect()
    b = query_bm25_index(spark, path, QUERIES, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_append_parity_and_no_rewrite(spark, sf_dir, tmp_path):
    """build(part1) + append(part2) answers queries exactly like
    build(full), and the append never rewrites a pre-existing file."""
    from xarray_dataaccessor_spark.operators.retrieval import (
        append_to_bm25_index,
        build_bm25_index,
        query_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    part1 = word_counts(docs.filter(F.col("doc_id") % 3 != 0))
    part2 = word_counts(docs.filter(F.col("doc_id") % 3 == 0))
    full = word_counts(docs)
    inc = str(tmp_path / "inc")
    ref = str(tmp_path / "ref")
    build_bm25_index(part1, inc, n_buckets=16)
    before = _snapshot_files(f"{inc}/postings")
    append_to_bm25_index(part2, inc)
    after = _snapshot_files(f"{inc}/postings")
    for rel, sig in before.items():
        assert after.get(rel) == sig, f"pre-existing posting file rewritten: {rel}"
    build_bm25_index(full, ref, n_buckets=16)
    a = query_bm25_index(spark, inc, QUERIES, k=5).collect()
    b = query_bm25_index(spark, ref, QUERIES, k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_index_query_prunes_partitions(spark, sf_dir, tmp_path):
    """The postings scan carries a static partition filter on the
    query's term buckets — unqueried buckets are never read."""
    from xarray_dataaccessor_spark.operators.retrieval import (
        _term_bucket,
        build_bm25_index,
        query_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "pruned")
    build_bm25_index(word_counts(docs), path, n_buckets=16)
    q = {0: "hash join"}
    plan = (
        query_bm25_index(spark, path, q, k=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    buckets = sorted({_term_bucket(w, 16) for w in ("hash", "join")})
    assert "PartitionFilters" in plan
    assert any(f"tb#" in line and " IN " in line
               for line in plan.splitlines() if "PartitionFilters" in line), plan
    # and the pruned scan matches a fresh in-plan run's answer
    out = query_bm25_index(spark, path, q, k=3).collect()
    assert len(out) == 3 and {b for b in buckets} <= set(range(16))


def test_index_query_is_pure_plan_build(spark, sf_dir, tmp_path):
    """Building the probe plan fires ZERO Spark jobs — buckets/stats
    come from meta.json and both scans carry recorded schemas (no
    parquet footer inference)."""
    from xarray_dataaccessor_spark.operators.retrieval import (
        build_bm25_index,
        query_bm25_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    path = str(tmp_path / "pure")
    build_bm25_index(word_counts(docs), path, n_buckets=16)
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None))
    df = query_bm25_index(spark, path, QUERIES, k=3)
    df.explain(mode="simple")  # force analysis + physical planning
    after = len(tracker.getJobIdsForGroup(None))
    assert after == before, "plan build fired a Spark job"
    assert df.count() > 0


def test_index_missing_meta_fails_fast(spark, tmp_path):
    from xarray_dataaccessor_spark.operators.retrieval import query_bm25_index

    with pytest.raises(ValueError, match="meta.json"):
        query_bm25_index(spark, str(tmp_path / "nope"), {0: "x"})


def test_term_bucket_matches_plan_hash(spark):
    """The driver-side bucket twin must agree with the in-plan
    portable_hash32 — otherwise pruning would silently read the wrong
    partitions."""
    from xarray_dataaccessor_spark.functions.hashing import portable_hash32
    from xarray_dataaccessor_spark.operators.retrieval import _term_bucket

    words = ["hash", "join", "customer", "the", "a", "zzz"]
    df = spark.createDataFrame([(w,) for w in words], "w string").select(
        "w", F.pmod(portable_hash32(F.col("w")), F.lit(16)).alias("tb")
    )
    got = {r["w"]: r["tb"] for r in df.collect()}
    assert got == {w: _term_bucket(w, 16) for w in words}


def test_plan_prunes_postings_before_shuffle(spark, tiny):
    """The query-term dictionary must broadcast — no corpus-sized
    shuffle on the term key, and no cartesian product anywhere."""
    q = queries_df(spark, {0: "a c"})
    plan = bm25_topk(tiny, q, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # every join against the query/term-side tables is a broadcast join
    assert "BroadcastHashJoin" in plan
