"""Lexical retrieval: distributed BM25 over an inverted-index shape.

Extension surface (SURVEY §7.8) — the reference has no text/retrieval
path at all; this complements the dense-vector ANN stack
(``operators/similarity.py``) with the lexical ranking a training-data
pipeline needs for retrieval-based decontamination, targeted corpus
mining, and hard-negative selection.

Scale design (100 TB corpus, query sets of 10²-10⁶):

- The postings table IS :func:`text.word_counts` — one corpus scan, one
  (doc, term)-keyed aggregation, exactly the table the quality stack
  already shares. Nothing here re-tokenizes.
- The query-term dictionary broadcasts; postings are pruned to query
  terms MAP-SIDE before anything shuffles, so every downstream stage is
  sized by ``matching postings``, not by the corpus.
- Per-term document frequencies aggregate over the pruned postings
  (terms-sized shuffle); corpus-wide N / avgdl come from the doc-length
  table as one broadcast 1-row aggregate.
- Scoring is pure whole-stage-codegen arithmetic; per-(query, doc)
  accumulation shuffles on the (query, doc) key only. Top-k uses a
  per-query window over the scored candidates (queries are the
  partition key, so parallelism = number of queries × AQE splits).

Engine-portable exactness ([[oracle-exactness]]): every per-term
contribution is an IEEE-double expression both Spark and DuckDB
evaluate bit-identically (int/int and int/double divisions only,
binary-exact literals where possible), rounded to 6 decimals and summed
as DECIMAL(28,14) — so scores, ranks, and tie-breaks replay exactly in
SQL, the same discipline as the bigram-LM and DSIR operators.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Lucene-style BM25 constants (k1, b). 1.2 / 0.75 / 0.25 spelled the
# same way in the SQL oracle so both engines parse identical doubles.
BM25_K1 = 1.2
BM25_B = 0.75


def doc_lengths(wc: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-document token counts ``(id, dl)`` from the shared
    :func:`text.word_counts` postings — the doc-norm half of a BM25
    index. One id-keyed aggregation; persist it next to the postings
    when building a reusable index."""
    return wc.groupBy(id_col).agg(F.sum("c").alias("dl"))


def queries_df(
    spark: SparkSession, queries: Mapping[int, str] | Sequence[str]
) -> DataFrame:
    """Build the broadcastable ``(query_id, w)`` term table from query
    strings (whitespace-split, duplicate terms dropped — standard bag
    retrieval uses query-term presence, not query-side tf)."""
    if not isinstance(queries, Mapping):
        queries = dict(enumerate(queries))
    rows = sorted(
        {(int(qid), w) for qid, q in queries.items() for w in q.split() if w}
    )
    return spark.createDataFrame(rows, "query_id bigint, w string")


def bm25_scores(
    wc: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
    dl: DataFrame | None = None,
) -> DataFrame:
    """Score every document containing at least one query term:
    ``(query_id, id, score)`` with Lucene BM25
    ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` and the usual
    ``tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))`` saturation.

    ``wc`` is the ``(id, w, c)`` postings table (:func:`text.word_counts`);
    ``queries`` the ``(query_id, w)`` term table. Plan: broadcast the
    query dictionary, prune postings map-side, df over the pruned
    postings, one broadcast 1-row (N, avgdl) aggregate, then a
    (query, doc)-keyed decimal sum. The corpus-sized tables touched are
    the postings scan and the doc-length join — both unavoidable parts
    of any BM25 evaluation — and everything after the prune is sized by
    the match set."""
    dl = doc_lengths(wc, id_col) if dl is None else dl
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("dl").alias("tot_dl")
    )
    qterms = queries.select("w").distinct()
    pruned = wc.join(F.broadcast(qterms), "w")
    dft = pruned.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n = F.col("n_docs").cast("double")
    idf = F.log(1.0 + (n - F.col("df") + 0.5) / (F.col("df") + 0.5))
    avgdl = F.col("tot_dl") / F.col("n_docs").cast("double")
    tfn = (F.col("c") * (k1 + 1.0)) / (
        F.col("c") + k1 * ((1.0 - b) + b * (F.col("dl") / avgdl))
    )
    contrib = F.round(idf * tfn, 6).cast("decimal(28,14)")
    return (
        pruned.join(F.broadcast(dft), "w")
        .join(F.broadcast(queries), "w")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", id_col)
        .agg(F.sum(contrib).alias("score"))
    )


def bm25_topk(
    wc: DataFrame,
    queries: DataFrame,
    k: int = 5,
    *,
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
    dl: DataFrame | None = None,
) -> DataFrame:
    """Top-``k`` BM25 hits per query: ``(query_id, id, score, rk)``,
    rank ties broken by ascending document id — the same rank/tie-break
    discipline as the dense-retrieval slots, stable across engines
    because the score is an exact DECIMAL before the final double
    cast."""
    scored = bm25_scores(wc, queries, id_col=id_col, k1=k1, b=b, dl=dl)
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            id_col,
            F.col("score").cast("double").alias("score"),
            F.col("rk").cast("int").alias("rk"),
        )
    )
