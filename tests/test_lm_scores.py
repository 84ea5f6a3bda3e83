"""Bigram LM fluency scoring (operators/text.py::bigram_lm_scores):
hand-computed probabilities on a tiny corpus, plus the ordering property
the score exists for (predictable text scores lower than word salad)."""

from __future__ import annotations

import math

import pytest

from xarray_dataaccessor_spark.operators.text import bigram_lm_scores


def test_hand_computed_bigram_probabilities(spark):
    # corpus: "a b a b" and "a b c"
    # vocab = {a, b, c} -> V = 4
    # unigrams: a=3, b=3, c=1
    # bigrams:  (a,b)=3, (b,a)=1, (b,c)=1
    df = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    p_ab = (3 + 1) / (3 + 4)  # c(ab)+1 / c(a)+V
    p_ba = (1 + 1) / (3 + 4)
    p_bc = (1 + 1) / (3 + 4)

    def terms(*ps):
        return sum(round(-math.log2(p), 6) for p in ps) / len(ps)

    # doc 1: bigrams ab, ba, ab
    assert out[1]["lm_bigrams"] == 3
    assert out[1]["lm_neg_log2p"] == pytest.approx(
        terms(p_ab, p_ba, p_ab), abs=1e-12
    )
    # doc 2: bigrams ab, bc
    assert out[2]["lm_bigrams"] == 2
    assert out[2]["lm_neg_log2p"] == pytest.approx(
        terms(p_ab, p_bc), abs=1e-12
    )


def test_single_word_doc_has_no_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "hello"), (2, "two words")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert 1 not in out  # no bigram occurrences -> no row (query LEFT-joins)
    assert out[2]["lm_bigrams"] == 1


def test_repetitive_text_scores_more_fluent_than_salad(spark):
    rows = [(i, "the cat sat on the mat and the cat sat again") for i in range(10)]
    rows.append((100, "zeppelin quartz bishop nimbus fjord crayon velvet osprey"))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r["doc_id"]: r["lm_neg_log2p"] for r in bigram_lm_scores(df).collect()}
    assert out[0] < out[100]  # predictable text -> lower mean -log2 p


def test_perplexity_buckets_hand_and_sql_replay(spark):
    """CCNet head/middle/tail tiers: histogram-threshold cuts replay
    exactly in DuckDB; NULL scores keep NULL buckets; bucket 0 is the
    most fluent (lowest neg-log2-p) tier."""
    import duckdb
    import pandas as pd
    from pyspark.sql import functions as F

    from xarray_dataaccessor_spark.operators.text import perplexity_buckets

    rows = [(i, float(s)) for i, s in enumerate(
        [1.0, 1.2, 1.2, 2.0, 2.5, 3.0, 3.1, 4.0, 9.9]
    )] + [(99, None)]
    scores = spark.createDataFrame(rows, "doc_id bigint, lm_neg_log2p double")
    got = perplexity_buckets(scores).orderBy("doc_id").toPandas()
    # doc 0 (1.0) most fluent -> head; doc with 9.9 -> tail; NULL -> NULL
    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "ppl_tier"] == "head"
    assert by_id.loc[8, "ppl_tier"] == "tail"
    assert pd.isna(by_id.loc[99, "ppl_bucket"])

    con = duckdb.connect()
    con.register("scores", pd.DataFrame(rows, columns=["doc_id", "lm_neg_log2p"]))
    oracle = con.execute("""
        WITH hist AS (
            SELECT round(lm_neg_log2p, 2) AS q, COUNT(*) AS c
            FROM scores WHERE lm_neg_log2p IS NOT NULL GROUP BY 1
        ),
        cum AS (
            SELECT q,
                   SUM(c) OVER (ORDER BY q ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS cs,
                   SUM(c) OVER () AS n
            FROM hist
        ),
        thr AS (
            SELECT MIN(CASE WHEN cs * 3 >= n * 1 THEN q END) AS t1,
                   MIN(CASE WHEN cs * 3 >= n * 2 THEN q END) AS t2
            FROM cum
        )
        SELECT doc_id,
               CASE WHEN lm_neg_log2p IS NULL THEN NULL
                    ELSE CAST((round(lm_neg_log2p, 2) > t1)::INT
                             + (round(lm_neg_log2p, 2) > t2)::INT AS INT)
               END AS ppl_bucket
        FROM scores CROSS JOIN thr ORDER BY doc_id
    """).fetchdf()
    a = got[["doc_id", "ppl_bucket"]].reset_index(drop=True)
    b = oracle.reset_index(drop=True)
    assert ((a["ppl_bucket"].isna() & b["ppl_bucket"].isna())
            | (a["ppl_bucket"] == b["ppl_bucket"])).all()


def test_perplexity_buckets_partition_invariant_and_even(spark):
    from pyspark.sql import functions as F

    from xarray_dataaccessor_spark.operators.text import perplexity_buckets

    scores = spark.range(90).select(
        F.col("id").alias("doc_id"),
        (F.col("id").cast("double") / 10.0).alias("lm_neg_log2p"),
    )
    a = perplexity_buckets(scores).groupBy("ppl_bucket").count().collect()
    counts = {r["ppl_bucket"]: r["count"] for r in a}
    # 90 distinct-ish quantized values -> 3 nearly even tiers
    assert set(counts) == {0, 1, 2}
    assert all(25 <= v <= 35 for v in counts.values()), counts
    b = perplexity_buckets(scores.repartition(7)).groupBy(
        "ppl_bucket"
    ).count().collect()
    assert counts == {r["ppl_bucket"]: r["count"] for r in b}
