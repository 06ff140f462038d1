"""Winnowing fingerprint tests (functions.text.winnow_of /
operators.dedup.winnow_overlap_pairs).

Pins the paper's guarantee — documents sharing a token run of length
≥ w+k-1 share at least one fingerprint — plus edge cases (short and
empty documents) and the no-false-sharing behavior on disjoint
vocabulary.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from citibike_analysis_spark.functions.text import kgram_hashes_of, tokens, winnow_of
from citibike_analysis_spark.operators.dedup import winnow_overlap_pairs

K, W = 3, 4
GUARANTEE = W + K - 1  # shared token run this long ⇒ ≥1 shared fingerprint


def _fps(spark, texts):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], ["id", "text"])
    out = (
        df.select("id", tokens(F.col("text")).alias("tk"))
        .select("id", kgram_hashes_of(F.col("tk"), K).alias("kh"))
        .select("id", winnow_of(F.col("kh"), W).alias("fp"))
    )
    return {r["id"]: set(r["fp"]) for r in out.collect()}


def test_shared_long_span_shares_a_fingerprint(spark):
    span = " ".join(f"s{i}" for i in range(GUARANTEE))  # exactly w+k-1 tokens
    a = "alpha beta gamma " + span + " delta epsilon"
    b = "one two three four five " + span + " six seven"
    fps = _fps(spark, [a, b])
    assert fps[0] & fps[1], "w+k-1 span guarantee violated"


def test_disjoint_vocabulary_shares_nothing(spark):
    fps = _fps(spark, [
        " ".join(f"a{i}" for i in range(30)),
        " ".join(f"b{i}" for i in range(30)),
    ])
    assert not (fps[0] & fps[1])


def test_short_and_empty_documents(spark):
    fps = _fps(spark, ["", "one two", "one two three"])
    assert fps[0] == set()          # empty doc: no fingerprints
    assert fps[1] == set()          # < k tokens: no k-grams
    assert len(fps[2]) == 1         # single k-gram: one fingerprint


def test_shingles_of_short_documents(spark):
    # regression: the n-gram path used sequence(1, 0) (which counts DOWN)
    # for < n-token docs and threw INVALID_ARRAY_INDEX under ANSI mode
    from citibike_analysis_spark.functions.text import shingles

    df = spark.createDataFrame([("",), ("one two",)], ["text"])
    got = [r["s"] for r in df.select(shingles(F.col("text"), 3).alias("s")).collect()]
    assert got == [[], []]


def test_identical_documents_identical_fingerprints(spark):
    t = " ".join(f"w{i % 7}" for i in range(40))
    fps = _fps(spark, [t, t])
    assert fps[0] == fps[1] and fps[0]


def test_overlap_pairs_finds_planted_boilerplate(spark):
    boiler = " ".join(f"b{i}" for i in range(12))
    docs = [
        (0, "intro text here " + boiler + " closing words"),
        (1, "completely different start " + boiler + " other ending"),
        (2, " ".join(f"u{i}" for i in range(25))),  # unrelated
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs = winnow_overlap_pairs(df, "doc_id", "text", k=K, w=W, min_shared=2)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert all(2 not in p for p in got)
