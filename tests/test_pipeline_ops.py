"""Training-pipeline operator tests (r2 additions):

- benchmark decontamination: constructed overlap, clean docs flagged 0
- deterministic stratified sampling: repartition-stable, fraction
  concentration, independent samples per salt
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


class TestContamination:
    @pytest.fixture(scope="class")
    def corpora(self, spark):
        bench = spark.createDataFrame(
            [
                (100, "the quick brown fox jumps over the lazy dog"),
                (101, "pack my box with five dozen liquor jugs"),
            ],
            "doc_id: long, text: string",
        )
        corpus = spark.createDataFrame(
            [
                # contains a full benchmark 5-gram ("the quick brown fox jumps")
                (0, "note that the quick brown fox jumps again today"),
                # shares words but no 5-gram run
                (1, "the lazy brown dog naps beside the quick fox"),
                # disjoint vocabulary
                (2, "alpha beta gamma delta epsilon zeta eta theta"),
                # too short for any 5-gram
                (3, "tiny doc"),
            ],
            "doc_id: long, text: string",
        )
        return corpus, bench

    def test_flags_and_counts(self, spark, corpora):
        from citibike_analysis_spark.operators.dedup import contamination_flags

        corpus, bench = corpora
        got = {
            r["doc_id"]: (r["n_shared"], r["contaminated"])
            for r in contamination_flags(corpus, bench, "doc_id", "text", n=5).collect()
        }
        # doc 0 shares exactly two 5-grams: "the quick brown fox jumps"
        # is one; windows shifted by one word don't match ("note that the
        # quick brown" etc.) — recount: benchmark 5-grams of doc 100 are
        # positions 1-5..5-9; doc 0 contains "the quick brown fox jumps"
        # only. So n_shared == 1.
        assert got[0] == (1, True)
        assert got[1] == (0, False)
        assert got[2] == (0, False)
        assert got[3] == (0, False)
        assert len(got) == 4  # every corpus doc present, clean ones included


class TestStratifiedSample:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        from citibike_analysis_spark.sources.tables import load_table

        return load_table(spark, "/root/testdata/sf0.01", "documents")

    def test_deterministic_under_repartitioning(self, spark, docs):
        from citibike_analysis_spark.operators.sampling import stratified_sample

        a = {
            r["doc_id"]
            for r in stratified_sample(docs, "doc_id", 0.25, ["lang"]).select("doc_id").collect()
        }
        b = {
            r["doc_id"]
            for r in stratified_sample(
                docs.repartition(17, "source"), "doc_id", 0.25, ["lang"]
            ).select("doc_id").collect()
        }
        assert a == b, "sample membership changed under repartitioning"
        assert a, "empty sample at fraction 0.25"

    def test_fraction_concentrates(self, spark, docs):
        from citibike_analysis_spark.operators.sampling import stratified_sample

        n = docs.count()
        k = stratified_sample(docs, "doc_id", 0.25).count()
        # binomial(500, .25): 5 sigma ≈ 48
        assert abs(k - 0.25 * n) < 50, f"{k}/{n} far from 25%"

    def test_salts_draw_independent_samples(self, spark, docs):
        from citibike_analysis_spark.operators.sampling import stratified_sample

        a = {r["doc_id"] for r in stratified_sample(docs, "doc_id", 0.5, salt="s1").collect()}
        b = {r["doc_id"] for r in stratified_sample(docs, "doc_id", 0.5, salt="s2").collect()}
        assert a != b
        # independence: overlap ≈ 25% of corpus, nowhere near either set
        n = docs.count()
        assert abs(len(a & b) - 0.25 * n) < 60

    def test_edge_fractions(self, spark, docs):
        from citibike_analysis_spark.operators.sampling import stratified_sample

        assert stratified_sample(docs, "doc_id", 0.0).count() == 0
        assert stratified_sample(docs, "doc_id", 1.0).count() == docs.count()
        with pytest.raises(ValueError):
            stratified_sample(docs, "doc_id", 1.5)
