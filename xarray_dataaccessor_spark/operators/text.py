"""Text-analysis operators for large-scale training-data pipelines
(SURVEY §7.8 extension surface; no reference counterpart — the reference
has no string library of its own, §2.7).

All operators are pure built-in expressions (whole-stage codegen, no
Python in the hot path) and scale by embarrassing parallelism: one pass
over the documents table, no shuffle except final aggregations.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.functions.hashing import portable_hash64

# Small marker-word sets for the language-ID heuristic. Real pipelines
# use character n-gram models (fasttext-style); the mechanism here — per
# language score as a sum of marker hits, argmax with a deterministic
# tie-break — is the same shape, entirely JVM-side.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "value", "table"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "es": ("el", "la", "los", "de", "que", "es"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "zh": ("的", "是", "不", "了", "在"),
}

STOPWORDS = ("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

# BPE-ish tokenizer regex: runs of letters, single digits, or single
# punctuation marks — the classic pre-tokenization split.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"


def _word_count(text: Column) -> Column:
    return F.size(F.split(F.trim(text), "\\s+"))


def _marker_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Count occurrences of any marker word (word-boundary regex)."""
    pattern = "\\b(" + "|".join(words) + ")\\b"
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(pattern), F.lit(0)))


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality-scoring statistics per document: lengths, punctuation /
    digit / stopword ratios, mean word length, and a composite quality
    flag (length + stopword-presence heuristics a la C4/Gopher rules)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_words = _word_count(t)
    n_punct = F.size(F.regexp_extract_all(t, F.lit("[^A-Za-z0-9\\s]"), F.lit(0)))
    n_digits = F.size(F.regexp_extract_all(t, F.lit("[0-9]"), F.lit(0)))
    n_stop = _marker_hits(t, STOPWORDS)
    return df.withColumns(
        {
            "n_chars": n_chars,
            "n_words": n_words,
            "mean_word_len": (n_chars - (n_words - F.lit(1)))
            / n_words.cast("double"),
            "punct_ratio": n_punct / n_chars.cast("double"),
            "digit_ratio": n_digits / n_chars.cast("double"),
            "stopword_ratio": n_stop / n_words.cast("double"),
            "quality_ok": (n_words >= 5)
            & (n_chars >= 30)
            & (n_punct / n_chars.cast("double") < 0.2),
        }
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-hit language ID with deterministic tie-break (language name
    ascending on equal score, 'und' when nothing matches)."""
    t = F.col(text_col)
    scored = df
    for lang, words in LANG_MARKERS.items():
        scored = scored.withColumn(f"score_{lang}", _marker_hits(t, words))
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_MARKERS, reverse=True):
        s = F.col(f"score_{lang}")
        # iterate reversed so that on ties the alphabetically-first wins;
        # a zero score never beats the 'und' default
        best = F.when((s >= best_score) & (s > 0), F.lit(lang)).otherwise(best)
        best_score = F.greatest(s, best_score)
    return scored.withColumn("lang_pred", best).withColumn(
        "lang_score", best_score
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "ws_tokens": _word_count(t),
            "bpe_tokens": F.size(
                F.regexp_extract_all(t, F.lit(BPE_TOKEN_RE), F.lit(0))
            ),
        }
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprint: md5 of the whitespace-normalized lowercased
    text plus a 60-bit numeric fold of it (join-key friendly)."""
    normalized = F.lower(F.regexp_replace(F.col(text_col), "\\s+", " "))
    return df.withColumns(
        {
            "fp_md5": F.md5(normalized),
            "fp_num": portable_hash64(normalized),
        }
    )


def remove_duplicate_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_words: int = 10,
) -> DataFrame:
    """C4-style duplicate-passage removal: documents are split into
    non-overlapping ``chunk_words``-word chunks, each chunk is kept only
    at its globally-first occurrence (smallest (doc_id, position)), and
    documents are reassembled from their surviving chunks.

    Scale shape: one explode, one window rank partitioned by the chunk
    hash (the shuffle key is a 60-bit fingerprint, never the text), one
    groupBy to reassemble. Output: ``(id, text, n_chunks_total,
    n_chunks_kept)`` with ``text`` rebuilt in original chunk order.
    """
    from pyspark.sql.window import Window

    words = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(chunk_words)).cast("int")
    chunk_idx = F.sequence(F.lit(0), n_chunks - F.lit(1))
    chunks = df.select(
        F.col(id_col),
        F.explode(chunk_idx).alias("pos"),
        words.alias("__w"),
    ).select(
        id_col,
        "pos",
        F.concat_ws(
            " ",
            F.slice(F.col("__w"), F.col("pos") * chunk_words + 1, chunk_words),
        ).alias("chunk"),
    )
    hashed = chunks.withColumn("h", portable_hash64(F.col("chunk")))
    w = Window.partitionBy("h").orderBy(id_col, "pos")
    kept = hashed.withColumn("__rk", F.row_number().over(w)).filter(
        F.col("__rk") == 1
    )
    reassembled = kept.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
        ).alias("text"),
        F.count(F.lit(1)).alias("n_chunks_kept"),
    )
    totals = hashed.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_chunks_total"))
    return totals.join(reassembled, on=id_col, how="left").select(
        id_col,
        F.coalesce(F.col("text"), F.lit("")).alias("text"),
        "n_chunks_total",
        F.coalesce(F.col("n_chunks_kept"), F.lit(0)).alias("n_chunks_kept"),
    )
