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


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM (round 8)
# ---------------------------------------------------------------------------
def _kn_fixture(spark):
    from xarray_dataaccessor_spark.operators.text import (
        bigram_counts,
        word_counts,
    )

    docs = spark.createDataFrame(
        [
            (0, "a b a b a c"),
            (1, "a b c a b"),
            (2, "b c a a b b"),
            (3, "c c a b"),
        ],
        "doc_id bigint, text string",
    )
    return docs, word_counts(docs), bigram_counts(docs)


def test_kneser_ney_matches_hand_model(spark):
    """Scores match a from-scratch python KN model built on the same
    corpus (same discount, same continuation counts, same rounding)."""
    import math
    from collections import Counter

    from xarray_dataaccessor_spark.operators.text import kneser_ney_from_counts

    docs, wc, bc = _kn_fixture(spark)
    got = {r["doc_id"]: (r["kn_bigrams"], r["kn_neg_log2p"])
           for r in kneser_ney_from_counts(wc, bc).collect()}

    texts = {r["doc_id"]: r["text"].split() for r in docs.collect()}
    big = Counter()
    for ws in texts.values():
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
    cw1 = Counter()
    ncont = Counter()
    nleft = Counter()
    for (a, b), c in big.items():
        cw1[a] += c
        ncont[a] += 1
        nleft[b] += 1
    n_big = len(big)
    n1 = sum(1 for c in big.values() if c == 1)
    n2 = sum(1 for c in big.values() if c == 2)
    d = n1 / (n1 + 2.0 * n2)

    def p(a, b):
        return (max(big[(a, b)] - d, 0.0) / cw1[a]
                + d * ncont[a] / cw1[a] * (nleft[b] / n_big))

    from decimal import Decimal

    for did, ws in texts.items():
        pairs = list(zip(ws, ws[1:]))
        total = sum(
            (Decimal(str(round(-math.log2(p(a, b)), 6))) for a, b in pairs),
            Decimal(0),
        )
        want = float(total) / len(pairs)
        assert got[did][0] == len(pairs)
        assert abs(got[did][1] - want) < 1e-9, did


def test_kneser_ney_sums_to_one_per_context(spark):
    """The defining property add-one lacks: for every observed context
    w1, sum over the OBSERVED vocabulary... is < 1 by the unseen mass,
    and adding P_cont-weighted unseen mass closes it to exactly 1."""
    from collections import Counter

    docs, wc, bc = _kn_fixture(spark)
    texts = {r["doc_id"]: r["text"].split() for r in docs.collect()}
    big = Counter()
    for ws in texts.values():
        for a, b in zip(ws, ws[1:]):
            big[(a, b)] += 1
    cw1 = Counter()
    ncont = Counter()
    nleft = Counter()
    for (a, b), c in big.items():
        cw1[a] += c
        ncont[a] += 1
        nleft[b] += 1
    n_big = len(big)
    n1 = sum(1 for c in big.values() if c == 1)
    n2 = sum(1 for c in big.values() if c == 2)
    d = n1 / (n1 + 2.0 * n2)
    vocab = set(nleft)  # continuation support
    for a in cw1:
        s = sum(
            max(big.get((a, b), 0) - d, 0.0) / cw1[a]
            + d * ncont[a] / cw1[a] * (nleft[b] / n_big)
            for b in vocab
        )
        assert abs(s - 1.0) < 1e-12, a


def test_kneser_ney_duckdb_replay(spark):
    """The doc scores replay exactly in SQL — same discount scalar,
    same 6-decimal terms, same decimal fold."""
    import duckdb

    from xarray_dataaccessor_spark.operators.text import kneser_ney_from_counts

    docs, wc, bc = _kn_fixture(spark)
    got = {r["doc_id"]: r["kn_neg_log2p"]
           for r in kneser_ney_from_counts(wc, bc).collect()}
    con = duckdb.connect()
    con.register("docs", docs.toPandas())
    exp = dict(con.execute("""
        WITH toks AS (
            SELECT doc_id, string_split(text, ' ') AS w FROM docs
        ),
        occ AS (
            SELECT doc_id, b.w1 AS w1, b.w2 AS w2, COUNT(*) AS c FROM (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(w)),
                              i -> {'w1': w[i], 'w2': w[i+1]})) AS b
                FROM toks
            ) GROUP BY 1, 2, 3
        ),
        big AS (SELECT w1, w2, SUM(c) AS cb FROM occ GROUP BY 1, 2),
        ctx AS (SELECT w1, SUM(cb) AS cw1, COUNT(*) AS n_cont
                FROM big GROUP BY 1),
        rgt AS (SELECT w2, COUNT(*) AS n_left FROM big GROUP BY 1),
        tot AS (SELECT COUNT(*) AS n_big FROM big),
        coc AS (SELECT SUM(CASE WHEN cb = 1 THEN 1 ELSE 0 END) AS n1,
                       SUM(CASE WHEN cb = 2 THEN 1 ELSE 0 END) AS n2
                FROM big),
        dd AS (SELECT CAST(n1 AS DOUBLE) / (n1 + 2.0 * n2) AS d FROM coc)
        SELECT doc_id,
               CAST(SUM(CAST(round(-log2(
                   greatest(cb - d, 0.0) / cw1
                   + d * n_cont / cw1 * (n_left / CAST(n_big AS DOUBLE))
               ), 6) * c AS DECIMAL(28,14))) AS DOUBLE) / SUM(c)
        FROM occ JOIN big USING (w1, w2) JOIN ctx USING (w1)
        JOIN rgt USING (w2), tot, dd
        GROUP BY doc_id
    """).fetchall())
    assert got == exp
