

def test_corpus_report_hand_computed(spark):
    from xarray_dataaccessor_spark.operators.text import corpus_report

    docs = spark.createDataFrame(
        [
            (1, "a b c", "s1"),
            (2, "a b c", "s1"),      # exact dup of 1
            (3, "x y", "s1"),
            (4, "p q r s t u", "s2"),
        ],
        "doc_id bigint, text string, source string",
    )
    r = corpus_report(docs).first()
    assert r["n_docs"] == 4 and r["n_unique_texts"] == 3
    assert r["dup_rate"] == 0.25
    assert r["total_tokens"] == 3 + 3 + 2 + 6
    assert r["min_tokens"] == 2 and r["max_tokens"] == 6
    assert r["mean_tokens"] == 14 / 4
    assert r["p50_tokens"] == 3.0

    by_src = {
        row["source"]: row
        for row in corpus_report(docs, group_col="source").collect()
    }
    assert by_src["s1"]["n_docs"] == 3 and by_src["s1"]["n_unique_texts"] == 2
    assert by_src["s2"]["dup_rate"] == 0.0


def test_corpus_report_real_corpus(spark, sf_dir):
    from xarray_dataaccessor_spark.operators.text import corpus_report

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    r = corpus_report(docs).first()
    assert r["n_docs"] == docs.count()
    assert 0.0 <= r["dup_rate"] < 1.0
    assert r["min_tokens"] <= r["p50_tokens"] <= r["p95_tokens"] <= r["max_tokens"]


def test_dedup_within_doc_lines(spark):
    from xarray_dataaccessor_spark.operators.text import dedup_within_doc

    docs = spark.createDataFrame(
        [
            (0, "keep me\nnav bar junk\nbody text\nnav bar junk\nend"),
            (1, "all\nunique\nlines"),
            (2, "same\nsame\nsame"),
        ],
        "doc_id bigint, text string",
    )
    out = {r["doc_id"]: r for r in dedup_within_doc(docs).collect()}
    assert out[0]["text_dedup"] == "keep me\nnav bar junk\nbody text\nend"
    assert out[0]["n_units"] == 5 and out[0]["n_unique_units"] == 4
    assert out[1]["text_dedup"] == out[1]["text"]
    assert out[1]["intra_dup_ratio"] == 0.0
    assert out[2]["text_dedup"] == "same"
    assert abs(out[2]["intra_dup_ratio"] - 2 / 3) < 1e-12


def test_dedup_within_doc_min_len_and_paragraphs(spark):
    from xarray_dataaccessor_spark.operators.text import dedup_within_doc

    docs = spark.createDataFrame(
        [(0, "-\nlong repeated unit here\n-\nlong repeated unit here\n-")],
        "doc_id bigint, text string",
    )
    out = dedup_within_doc(docs, min_len=5).first()
    # the '-' bullets (short) all survive; the long unit dedupes
    assert out["text_dedup"] == "-\nlong repeated unit here\n-\n-"
    paras = spark.createDataFrame(
        [(0, "para one\n\npara two\n\npara one")],
        "doc_id bigint, text string",
    )
    p = dedup_within_doc(paras, unit="paragraph").first()
    assert p["text_dedup"] == "para one\n\npara two"
    import pytest as _pt

    with _pt.raises(ValueError, match="unit"):
        dedup_within_doc(docs, unit="sentence").first()


def test_dedup_within_doc_plan_is_mapside(spark):
    from xarray_dataaccessor_spark.operators.text import dedup_within_doc

    docs = spark.createDataFrame([(0, "a\nb")], "doc_id bigint, text string")
    plan = dedup_within_doc(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: pure projection


def test_corpus_report_bottomk_quantiles(spark):
    """The 'bottomk' quantile execution returns the SAME schema and,
    when sample_k covers the corpus, the same p50/p95 as the exact
    path; on a larger corpus the estimates stay inside the
    O(1/sqrt(k)) rank window."""
    import pytest

    from xarray_dataaccessor_spark.operators.text import corpus_report

    rows = [(i, " ".join(["w"] * (1 + (i * i) % 37)), f"s{i % 2}")
            for i in range(200)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")

    exact = corpus_report(docs, group_col="source").toPandas().set_index(
        "source").sort_index()
    whole = corpus_report(docs, group_col="source", quantiles="bottomk",
                          sample_k=500).toPandas().set_index(
        "source").sort_index()
    assert list(whole.columns) == list(exact.columns)
    assert whole["p50_tokens"].tolist() == [
        round(v, 6) for v in exact["p50_tokens"]]
    assert whole["n_docs"].tolist() == exact["n_docs"].tolist()

    est = corpus_report(docs, group_col="source", quantiles="bottomk",
                        sample_k=64).toPandas().set_index("source").sort_index()
    for src in est.index:
        lo, hi = exact.loc[src, "min_tokens"], exact.loc[src, "max_tokens"]
        assert lo <= est.loc[src, "p50_tokens"] <= hi
    with pytest.raises(ValueError, match="quantiles"):
        corpus_report(docs, quantiles="approx")
