"""Null/empty/whitespace text through every text function (the corpus
fixtures contain none of these, so without this test the behavior is
unpinned): NULL propagates as NULL (matching the DuckDB oracle's
NULL-in-NULL-out), empty and whitespace-only text count as zero tokens,
and the near-dup operators simply produce no rows for such documents.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from citibike_analysis_spark.functions.text import (
    bag_fingerprint,
    bpe_ish_token_count,
    lang_id,
    punct_ratio,
    shingles,
    token_count,
)
from citibike_analysis_spark.operators.dedup import (
    minhash_signatures,
    ngram_jaccard_pairs,
    winnow_overlap_pairs,
)

ROWS = [(0, None), (1, ""), (2, "   "), (3, "the cat sat on the mat")]


def _df(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_scalar_functions_null_and_empty(spark):
    out = {
        r["doc_id"]: r
        for r in _df(spark)
        .select(
            "doc_id",
            token_count("text").alias("tc"),
            bpe_ish_token_count("text").alias("bpe"),
            punct_ratio("text").alias("pr"),
            lang_id("text").alias("lang"),
            shingles(F.col("text"), 3).alias("sh"),
        )
        .collect()
    }
    assert (out[0]["tc"], out[0]["bpe"], out[0]["pr"]) == (None, None, None)
    for i in (1, 2):
        assert (out[i]["tc"], out[i]["bpe"], out[i]["sh"]) == (0, 0, [])
    assert out[0]["lang"] == out[1]["lang"] == "unk"
    assert out[3]["tc"] == 6 and out[3]["lang"] == "en"


def test_near_dup_operators_skip_degenerate_docs(spark):
    df = _df(spark)
    # no crash, and degenerate docs never appear in signatures or pairs
    sigs = minhash_signatures(df, "doc_id", "text")
    assert {r["_id"] for r in sigs.collect()} == {3}
    assert ngram_jaccard_pairs(df, "doc_id", "text").count() == 0
    assert winnow_overlap_pairs(df, "doc_id", "text").count() == 0


def test_bag_fingerprint_distinguishes_null_from_empty(spark):
    out = {r["doc_id"]: r["fp"] for r in _df(spark).select(
        "doc_id", bag_fingerprint(F.col("text")).alias("fp")).collect()}
    assert out[0] is None          # NULL text → NULL fingerprint
    assert out[1] == out[2]        # empty and whitespace-only agree
    assert out[3] not in (None, out[1])
