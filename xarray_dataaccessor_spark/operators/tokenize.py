"""Byte-pair-encoding tokenization for the training-data pipeline
(SURVEY §7.8 extension; the regex token ESTIMATE in ``text.py`` stays the
cheap JVM-side path — this module is the real subword tokenizer).

Scale split, the standard one for BPE at corpus scale:

- ``bpe_train``: the only pass that touches the corpus is a distributed
  word-frequency aggregation (one shuffle on the word). Merge-rule
  learning then runs driver-side over the TOP-``max_words`` histogram —
  the histogram is vocabulary-sized (bounded by ``max_words``), not
  corpus-sized, exactly like sentencepiece/HF trainers that ingest a
  word-count file. Training is pure Python over ≤ max_words entries with
  an incremental pair-count index.
- ``bpe_encode``: merges ship to executors in the UDF closure (a
  broadcast-sized list); application is an Arrow-batched pandas UDF —
  tokenization is inherently per-row string work, the canonical Python-
  boundary workload, with an LRU word cache per batch (Zipf: most word
  occurrences are cache hits).

Determinism: ties in pair frequency break lexicographically, so the
merge list is a pure function of the histogram.
"""

from __future__ import annotations

from typing import Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_histogram(
    df: DataFrame, text_col: str = "text", max_words: int = 50_000
) -> list[tuple[str, int]]:
    """Distributed word-frequency histogram, truncated to the
    ``max_words`` most frequent words (ties break on the word so the
    result is deterministic). One shuffle; the driver receives at most
    ``max_words`` rows."""
    counts = (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("w"))
        .limit(max_words)
    )
    return [(r["w"], int(r["n"])) for r in counts.collect()]


def train_merges_from_histogram(
    histogram: Sequence[tuple[str, int]], n_merges: int = 200
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a word-frequency histogram
    (driver-side — the histogram is vocabulary-sized). Standard greedy
    BPE: repeatedly merge the most frequent adjacent symbol pair,
    weighting each word's pairs by its corpus count; frequency ties break
    lexicographically for determinism."""
    words = [(tuple(w), n) for w, n in histogram]
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, n in words:
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        merged = best[0] + best[1]
        new_words = []
        for syms, n in words:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_words.append((tuple(out), n))
        words = new_words
    return merges


def bpe_train(
    df: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """End-to-end BPE training: distributed histogram, driver-side merge
    learning. Returns the ordered merge list (rank = priority)."""
    return train_merges_from_histogram(
        word_histogram(df, text_col, max_words), n_merges
    )


def _make_word_encoder(ranks: dict[tuple[str, str], int]):
    """Build a self-contained word encoder closure. The closure captures
    only ``ranks`` and builtins, so cloudpickle serializes it BY VALUE —
    executors need no importable copy of this package (a UDF that
    references a module-level function pickles by reference and fails on
    a cluster where the library isn't installed executor-side)."""

    def enc_word(word: str) -> list[str]:
        # lowest-rank adjacent pair first (the exact GPT-2 application
        # order — NOT left-to-right scanning, which diverges from
        # training for overlapping pairs)
        syms = list(word)
        while len(syms) > 1:
            ranked = [
                (ranks[p], i)
                for i, p in enumerate(zip(syms, syms[1:]))
                if p in ranks
            ]
            if not ranked:
                break
            _, i = min(ranked)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]
        return syms

    return enc_word


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word (driver-side reference entry point)."""
    return _make_word_encoder(ranks)(word)


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "tokens",
) -> DataFrame:
    """Tokenize ``text_col`` with a trained merge list: whitespace
    pre-split, then per-word BPE merge application. Arrow-batched
    ``mapInPandas`` with a per-worker word cache (Zipfian corpora hit the
    cache for almost every occurrence). Adds ``out_col`` (array<string>)
    and ``n_{out_col}`` (bigint)."""
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    enc_word = _make_word_encoder(ranks)
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    out_schema = f"{fields}, {out_col} array<string>, n_{out_col} bigint"

    def run(batches: Iterator) -> Iterator:
        cache: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            toks: list[str] = []
            for w in (text or "").split():
                got = cache.get(w)
                if got is None:
                    got = enc_word(w)
                    if len(cache) < 200_000:
                        cache[w] = got
                toks.extend(got)
            return toks

        for pdf in batches:
            toks = pdf[text_col].map(enc)
            yield pdf.assign(**{out_col: toks, f"n_{out_col}": toks.map(len)})

    return df.mapInPandas(run, out_schema)
