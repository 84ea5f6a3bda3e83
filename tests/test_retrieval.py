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


def test_plan_prunes_postings_before_shuffle(spark, tiny):
    """The query-term dictionary must broadcast — no corpus-sized
    shuffle on the term key, and no cartesian product anywhere."""
    q = queries_df(spark, {0: "a c"})
    plan = bm25_topk(tiny, q, k=2)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    # every join against the query/term-side tables is a broadcast join
    assert "BroadcastHashJoin" in plan
