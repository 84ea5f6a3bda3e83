"""BPE tokenizer (operators/tokenize.py): merge learning vs a brute
reference, GPT-2 application order, distributed/driver parity, and
round-trip invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.tokenize import (
    bpe_encode,
    bpe_train,
    encode_word,
    train_merges_from_histogram,
    word_histogram,
)


def test_train_merges_tiny_histogram():
    # "ab" appears weighted 5+2=7 times -> first merge; then "ab"+"c"
    hist = [("abc", 5), ("abd", 2), ("xy", 1)]
    merges = train_merges_from_histogram(hist, n_merges=3)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("ab", "c")


def test_tie_breaks_are_lexicographic():
    hist = [("ab", 3), ("cd", 3)]
    merges = train_merges_from_histogram(hist, n_merges=1)
    assert merges == [("a", "b")]


def test_encode_word_uses_rank_order_not_scan_order():
    # ranks: ("b","c") rank 0 beats ("a","b") rank 1 — a left-to-right
    # scanner would wrongly merge "ab" first
    ranks = {("b", "c"): 0, ("a", "b"): 1}
    assert encode_word("abc", ranks) == ["a", "bc"]


def test_encode_roundtrip_and_histogram(spark):
    from xarray_dataaccessor_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    merges = bpe_train(docs, n_merges=100, max_words=5000)
    # training stops at convergence (31 distinct words in this corpus)
    assert 50 < len(merges) <= 100
    out = bpe_encode(docs, merges)
    rows = out.select("text", "tokens", "n_tokens").limit(200).collect()
    for r in rows:
        # concatenating tokens reproduces the whitespace-normalized text
        assert "".join(r["tokens"]) == "".join((r["text"] or "").split())
        assert r["n_tokens"] == len(r["tokens"])
    # merges actually compress: fewer tokens than characters
    stats = out.agg(
        F.sum("n_tokens").alias("t"),
        F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("c"),
    ).first()
    assert stats["t"] < stats["c"]


def test_distributed_encode_matches_driver_reference(spark):
    from xarray_dataaccessor_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").limit(50)
    merges = bpe_train(docs, n_merges=60, max_words=2000)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    got = {
        r["doc_id"]: r["tokens"]
        for r in bpe_encode(docs, merges).select("doc_id", "tokens").collect()
    }
    for r in docs.select("doc_id", "text").collect():
        want = []
        for w in (r["text"] or "").split():
            want.extend(encode_word(w, ranks))
        assert got[r["doc_id"]] == want


def test_histogram_deterministic_and_bounded(spark):
    from xarray_dataaccessor_spark.sources.tables import load

    docs = load(spark, "/root/testdata/sf0.001", "documents")
    h1 = word_histogram(docs, max_words=100)
    h2 = word_histogram(docs, max_words=100)
    assert h1 == h2
    n_distinct = docs.select(F.explode(F.split("text", r"\s+")).alias("w")).filter(
        F.length("w") > 0
    ).distinct().count()
    assert len(h1) == min(100, n_distinct)
    # truncation respected on a larger cap
    assert len(word_histogram(docs, max_words=10)) == 10
    # descending by count, ties ascending by word
    for (wa, na), (wb, nb) in zip(h1, h1[1:]):
        assert (na > nb) or (na == nb and wa < wb)


def test_bpe_roundtrip_property():
    """Hypothesis: for ANY histogram and ANY word, encoding never alters
    the character stream and merges never cross word boundaries."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    word = st.text(alphabet="abcdef", min_size=1, max_size=8)

    @settings(max_examples=200, deadline=None)
    @given(
        hist=st.lists(
            st.tuples(word, st.integers(min_value=1, max_value=50)),
            min_size=1,
            max_size=12,
        ),
        probe=word,
    )
    def run(hist, probe):
        merges = train_merges_from_histogram(hist, n_merges=20)
        ranks = {tuple(m): i for i, m in enumerate(merges)}
        toks = encode_word(probe, ranks)
        assert "".join(toks) == probe
        assert all(toks)

    run()
