"""Web-corpus preparation operators: HTML -> text, URL normalization /
domain filtering, and overlapping document chunking.

Extension surface (SURVEY §7.8; the reference has no text path) — the
stages a crawl passes through BEFORE the quality/dedup stack in
`operators/text.py` / `operators/dedup.py`: strip markup, key documents
by a canonical URL + registrable domain, and split long documents into
model-window chunks. Everything here is pure built-in expressions
(regexp chains, map-side), so the operators are embarrassingly parallel
with no shuffle of their own; chunking explodes map-side and is the
only row-multiplying step.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tags whose CONTENT is boilerplate, not prose (case-insensitive, with
# attributes, tolerant of missing close tag at end-of-document)
_CONTENT_TAGS = ("script", "style", "noscript", "template", "head")
# block-level tags whose boundaries imply a line break when stripped
_BLOCK_RE = (
    "(?i)</?(p|div|br|li|ul|ol|h[1-6]|tr|table|section|article|header|"
    "footer|blockquote|pre)\\b[^>]*>"
)


def html_to_text(
    df: DataFrame, html_col: str = "text", out_col: str = "text"
) -> DataFrame:
    """Boilerplate-stripping HTML -> plain text as one codegen regexp
    chain (the trafilatura-lite step every crawl pipeline runs before
    quality scoring):

    1. drop comments and the full content of script/style/noscript/
       template/head blocks,
    2. turn block-tag boundaries into newlines (so words across
       paragraphs don't fuse),
    3. strip every remaining tag,
    4. decode the common HTML entities (named + numeric),
    5. collapse runs of whitespace per line and blank lines.

    Regex-based stripping is the honest scalable shape (no DOM; a real
    DOM parser would be a per-row Python UDF) — malformed markup
    degrades to extra whitespace, never to lost prose.

    The chain is a module-level spec shared with
    :func:`html_to_text_sql` (the DuckDB spelling), so the Spark
    operator and the oracle replay the IDENTICAL patterns in the
    identical order — every pattern stays inside the Java-regex ∩ RE2
    syntax both engines parse the same way (no backrefs, no lookaround;
    ``$`` only where no trailing line terminator can make Java's
    before-final-newline ``$`` semantics diverge from RE2's
    end-of-text)."""
    t = F.col(html_col)
    for pat, rep in _HTML_PRE_CHAIN:
        t = F.regexp_replace(t, pat, rep)
    for ent, rep in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    for pat, rep in _HTML_POST_CHAIN:
        t = F.regexp_replace(t, pat, rep)
    return df.withColumn(out_col, t)


#: tag-stripping regexp chain (applied first), shared Spark/SQL
_HTML_PRE_CHAIN: "list[tuple[str, str]]" = [
    ("(?s)<!--.*?-->", " "),
    *[
        (f"(?is)<{tag}\\b[^>]*>.*?(</{tag}>|$)", " ")
        for tag in _CONTENT_TAGS
    ],
    (_BLOCK_RE, "\n"),
    ("(?s)<[^>]*>", " "),
]

#: literal entity decodes (order matters: &amp; after the others would
#: double-decode '&amp;lt;' — kept in the long-standing order)
_HTML_ENTITIES: "list[tuple[str, str]]" = [
    ("&nbsp;", " "), ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
    ("&quot;", "\""), ("&#39;", "'"), ("&apos;", "'"),
]

#: numeric entities + whitespace normalization (applied last)
_HTML_POST_CHAIN: "list[tuple[str, str]]" = [
    ("&#x([0-9a-fA-F]{1,6});", " "),
    ("&#[0-9]{1,7};", " "),
    ("[ \\t\\x0b\\f\\r]+", " "),
    (" ?\\n ?", "\n"),
    ("\\n{2,}", "\n"),
    # Spark's trim() strips spaces only — newlines need the regexp
    ("^[\\s]+|[\\s]+$", ""),
]


def html_to_text_sql(expr: str) -> str:
    """DuckDB spelling of the identical :func:`html_to_text` chain over
    the SQL expression ``expr`` — generated from the same module-level
    spec, so the two engines can never drift. Newline replacements ride
    ``chr(10)`` (a raw newline inside a SQL literal survives, but reads
    as an accident); every regexp_replace carries the ``'g'`` flag to
    match Java's replace-all default."""

    def _sql_str(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    def _rep(s: str) -> str:
        if "\n" in s:
            parts = [p for p in s.split("\n")]
            pieces: list[str] = []
            for i, p in enumerate(parts):
                if i:
                    pieces.append("chr(10)")
                if p:
                    pieces.append(_sql_str(p))
            return " || ".join(pieces) if pieces else "chr(10)"
        return _sql_str(s)

    t = expr
    for pat, rep in _HTML_PRE_CHAIN:
        t = f"regexp_replace({t}, {_sql_str(pat)}, {_rep(rep)}, 'g')"
    for ent, rep in _HTML_ENTITIES:
        t = f"replace({t}, {_sql_str(ent)}, {_sql_str(rep)})"
    for pat, rep in _HTML_POST_CHAIN:
        t = f"regexp_replace({t}, {_sql_str(pat)}, {_rep(rep)}, 'g')"
    return t


def url_parts(url: Column) -> dict[str, Column]:
    """Decompose a URL into engine-portable pieces with
    ``parse_url``-free regexps (identical semantics in the SQL oracle):
    scheme, host (lowercased, port stripped), registrable domain
    (last two host labels — the eTLD+1 approximation public-suffix-less
    pipelines use), and path."""
    scheme = F.lower(F.regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(
        F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#:]+)", 1)
    )
    domain = F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    path = F.regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    return {"scheme": scheme, "host": host, "domain": domain, "path": path}


def normalize_url(url: Column) -> Column:
    """Canonical URL for dedup keys: lowercase scheme+host, strip
    the default ports, drop the fragment, drop a trailing '/' on a
    bare host, drop common tracking params (utm_*, fbclid, gclid) and
    sort the surviving query params — so syntactic variants of the same
    resource collide. Pure codegen (split + filter + array_sort +
    concat); no UDF."""
    p = url_parts(url)
    frag_free = F.regexp_replace(url, "#.*$", "")
    query = F.regexp_extract(frag_free, "\\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda kv: (F.length(kv) > 0)
        & ~kv.rlike("^(utm_[A-Za-z0-9_]*|fbclid|gclid)="),
    )
    qnorm = F.array_join(F.array_sort(params), "&")
    path = F.when(p["path"] == "", F.lit("/")).otherwise(
        F.regexp_replace(p["path"], "/+", "/")
    )
    hostport = F.regexp_extract(
        frag_free, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)", 1
    )
    port = F.regexp_extract(hostport, ":([0-9]+)$", 1)
    keep_port = (
        (port != "")
        & ~((p["scheme"] == "http") & (port == "80"))
        & ~((p["scheme"] == "https") & (port == "443"))
    )
    host = F.when(keep_port, F.concat(p["host"], F.lit(":"), port)).otherwise(
        p["host"]
    )
    base = F.concat(p["scheme"], F.lit("://"), host, path)
    return F.when(qnorm == "", base).otherwise(
        F.concat(base, F.lit("?"), qnorm)
    )


def domain_filter(
    df: DataFrame,
    blocked_domains: Sequence[str],
    url_col: str = "url",
    keep: bool = False,
) -> DataFrame:
    """UT1/RefinedWeb-style domain gate: drop (or with ``keep=True``,
    retain only) rows whose registrable domain is in the list. The list
    broadcasts as a literal set (IN on a small array — blocklists of
    millions of domains should join against a broadcast table instead;
    this is the inline path for curated lists)."""
    dom = url_parts(F.col(url_col))["domain"]
    hit = dom.isin([d.lower() for d in blocked_domains])
    return df.filter(hit if keep else ~hit)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split every document into whitespace-token chunks of
    ``chunk_tokens`` with ``overlap`` tokens carried between adjacent
    chunks — the RAG/embedding window step. Pure map-side: tokenize
    once per row, generate chunk starts with ``sequence``, slice the
    token array per chunk and re-join. Output: one row per chunk with
    ``(id, chunk_id, n_tokens, <text_col>)``; short documents yield
    exactly one chunk; every token lands in at least one chunk and
    consecutive chunks share exactly ``overlap`` tokens (except a
    possibly-shorter final chunk)."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), "\\s+"), lambda w: F.length(w) > 0
    )
    n = F.size(toks)
    # last start <= max(n - chunk, 0), stepping by (chunk - overlap)
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.ceil((n - F.lit(chunk_tokens)) / F.lit(step)).cast("int"),
            F.lit(0),
        ),
    )
    return (
        df.select(
            F.col(id_col),
            toks.alias("__toks"),
            F.explode(starts).alias("chunk_id"),
        )
        .select(
            id_col,
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.slice(
                "__toks", F.col("chunk_id") * step + 1, chunk_tokens
            ).alias("__chunk"),
        )
        .filter(F.size("__chunk") > 0)
        .select(
            id_col,
            "chunk_id",
            F.size("__chunk").alias("n_tokens"),
            F.array_join("__chunk", " ").alias(text_col),
        )
    )
