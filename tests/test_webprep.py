"""Web-corpus preparation (operators/webprep.py): HTML stripping, URL
normalization / domain filtering, overlapping chunking."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from xarray_dataaccessor_spark.operators.webprep import (
    chunk_documents,
    domain_filter,
    html_to_text,
    normalize_url,
    url_parts,
)

HTML = """<!DOCTYPE html><html><head><title>junk</title>
<style>body { color: red }</style></head>
<body><!-- a comment --><script>var x = "<p>not text</p>";</script>
<h1>Heading</h1><p>First  paragraph &amp; more.</p>
<div>Second <b>bold</b> line&nbsp;here</div>
<ul><li>item one</li><li>item two</li></ul></body></html>"""


def _strip(spark, html):
    df = spark.createDataFrame([(html,)], "text string")
    return html_to_text(df).first()["text"]


def test_html_to_text_strips_boilerplate(spark):
    out = _strip(spark, HTML)
    assert "Heading" in out and "First paragraph & more." in out
    assert "bold" in out and "item one" in out and "item two" in out
    for junk in ("junk", "color: red", "not text", "a comment", "<"):
        assert junk not in out


def test_html_block_tags_break_lines(spark):
    out = _strip(spark, "<p>alpha</p><p>beta</p>")
    assert out.splitlines() == ["alpha", "beta"]
    # inline tags must NOT break words apart
    assert _strip(spark, "co<b>gna</b>c") == "co gna c".replace(" ", " ")


def test_html_unclosed_script_at_eof(spark):
    assert _strip(spark, "<p>keep</p><script>drop()") == "keep"


def test_url_parts_and_domain(spark):
    df = spark.createDataFrame(
        [("HTTPS://Sub.Example.COM:8443/A/b?x=1#f",)], "url string"
    )
    p = url_parts(F.col("url"))
    row = df.select(
        p["scheme"].alias("s"), p["host"].alias("h"),
        p["domain"].alias("d"), p["path"].alias("p"),
    ).first()
    assert (row["s"], row["h"], row["d"], row["p"]) == (
        "https", "sub.example.com", "example.com", "/A/b"
    )


@pytest.mark.parametrize(
    "raw,want",
    [
        ("HTTP://Example.com:80", "http://example.com/"),
        ("https://example.com:443/x", "https://example.com/x"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://example.com/a//b#frag", "http://example.com/a/b"),
        (
            "http://example.com/p?b=2&utm_source=tw&a=1&fbclid=zz",
            "http://example.com/p?a=1&b=2",
        ),
        ("http://example.com/p?utm_campaign=x", "http://example.com/p"),
    ],
)
def test_normalize_url(spark, raw, want):
    df = spark.createDataFrame([(raw,)], "url string")
    assert df.select(normalize_url(F.col("url")).alias("u")).first()["u"] == want


def test_domain_filter_block_and_keep(spark):
    df = spark.createDataFrame(
        [
            (1, "https://spam.bad-site.com/x"),
            (2, "https://example.com/y"),
            (3, "http://mirror.bad-site.com:8080/z"),
        ],
        "id bigint, url string",
    )
    kept = {r["id"] for r in domain_filter(df, ["bad-site.com"]).collect()}
    assert kept == {2}
    only = {r["id"] for r in domain_filter(df, ["bad-site.com"], keep=True).collect()}
    assert only == {1, 3}


def test_chunk_documents_no_overlap(spark):
    words = " ".join(f"w{i}" for i in range(300))
    df = spark.createDataFrame([(1, words)], "doc_id bigint, text string")
    out = sorted(
        (r["chunk_id"], r["n_tokens"], r["text"])
        for r in chunk_documents(df, chunk_tokens=128).collect()
    )
    assert [(c, n) for c, n, _ in out] == [(0, 128), (1, 128), (2, 44)]
    assert out[0][2].split()[0] == "w0" and out[1][2].split()[0] == "w128"
    # token conservation: concatenation reproduces the document
    assert " ".join(t for _, _, t in out) == words


def test_chunk_documents_overlap(spark):
    words = " ".join(f"w{i}" for i in range(250))
    df = spark.createDataFrame([(1, words)], "doc_id bigint, text string")
    rows = sorted(
        (r["chunk_id"], r["text"].split())
        for r in chunk_documents(df, chunk_tokens=100, overlap=20).collect()
    )
    # starts step by 80; adjacent chunks share exactly 20 tokens
    assert [c for c, _ in rows] == [0, 1, 2]
    assert rows[0][1][-20:] == rows[1][1][:20]
    assert rows[1][1][-20:] == rows[2][1][:20]
    # full coverage: last chunk ends at the last token
    assert rows[2][1][-1] == "w249"


def test_chunk_documents_short_and_empty(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "   ")], "doc_id bigint, text string"
    )
    out = chunk_documents(df, chunk_tokens=10).collect()
    assert len(out) == 1 and out[0]["doc_id"] == 1 and out[0]["n_tokens"] == 3


def test_chunk_documents_bad_overlap(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=10, overlap=10)


def test_pipeline_html_chunks_compose(spark):
    """HTML -> text -> chunks composes with the quality stack's
    whitespace tokenization (same splitter)."""
    html = "<p>" + " ".join(f"tok{i}" for i in range(60)) + "</p>"
    df = spark.createDataFrame([(1, html)], "doc_id bigint, text string")
    chunks = chunk_documents(html_to_text(df), chunk_tokens=25)
    got = sorted((r["chunk_id"], r["n_tokens"]) for r in chunks.collect())
    assert got == [(0, 25), (1, 25), (2, 10)]


def test_chunk_documents_properties(spark):
    """Hypothesis-style sweep over (n_tokens, chunk, overlap): every
    token covered in order, exact overlap between neighbours, chunk
    count matches the closed form."""
    import math

    cases = [
        (n, c, o)
        for n in (0, 1, 7, 64, 65, 129, 250)
        for c, o in ((16, 0), (16, 5), (64, 8), (64, 63), (100, 20))
        if o < c
    ]
    rows = []
    for i, (n, _, _) in enumerate(cases):
        rows.append((i, " ".join(f"t{j}" for j in range(n))))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    for i, (n, c, o) in enumerate(cases):
        got = sorted(
            (r["chunk_id"], r["text"].split())
            for r in chunk_documents(
                df.filter(f"doc_id = {i}"), chunk_tokens=c, overlap=o
            ).collect()
        )
        if n == 0:
            assert got == []
            continue
        step = c - o
        want_chunks = 1 + max(0, math.ceil((n - c) / step))
        assert len(got) == want_chunks, (n, c, o, len(got))
        # reconstruction: drop the first `o` tokens of every chunk but
        # the first, concatenate -> the original token stream
        rebuilt = got[0][1][:]
        for _, toks in got[1:]:
            assert rebuilt[-o:] == toks[:o] if o else True
            rebuilt += toks[o:]
        assert rebuilt == [f"t{j}" for j in range(n)], (n, c, o)
