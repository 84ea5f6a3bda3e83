

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
