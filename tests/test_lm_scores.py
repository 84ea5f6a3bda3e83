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
