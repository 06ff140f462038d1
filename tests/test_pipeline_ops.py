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
        # doc 0 shares exactly one benchmark 5-gram ("the quick brown fox
        # jumps"); its other windows are shifted and don't match
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


class TestWeightedMixture:
    def test_per_stratum_rates(self, spark):
        from citibike_analysis_spark.operators.sampling import weighted_mixture
        from citibike_analysis_spark.sources.tables import load_table

        d = load_table(spark, "/root/testdata/sf0.01", "documents")
        kept = weighted_mixture(d, "doc_id", "lang", {"en": 0.5}, 0.125)
        tot = {r["lang"]: r["n"] for r in d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        got = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        # en ≈ 50% (binomial 218×.5: 5σ ≈ 37); others ≈ 12.5% each
        assert abs(got.get("en", 0) - 0.5 * tot["en"]) < 40
        for lang in tot:
            if lang != "en":
                assert abs(got.get(lang, 0) - 0.125 * tot[lang]) < 25

    def test_rejects_bad_fractions(self, spark):
        from citibike_analysis_spark.operators.sampling import weighted_mixture
        from citibike_analysis_spark.sources.tables import load_table

        d = load_table(spark, "/root/testdata/sf0.01", "documents")
        with pytest.raises(ValueError):
            weighted_mixture(d, "doc_id", "lang", {"en": 1.5})


class TestBudgetSelect:
    def test_greedy_semantics_and_tiebreak(self, spark):
        from citibike_analysis_spark.operators.windows import budget_select

        rows = [
            # group a: costs 5,4,3 (ordered desc) — budget 10 keeps 5,4
            ("a", 1, 4), ("a", 2, 5), ("a", 3, 3),
            # group b: first row alone exceeds budget → empty
            ("b", 4, 50),
            # group c: tie on cost — doc 5 sorts before doc 6
            ("c", 5, 6), ("c", 6, 6),
        ]
        df = spark.createDataFrame(rows, "g: string, id: long, cost: long")
        out = budget_select(
            df, ["g"], [F.desc("cost"), F.asc("id")], "cost", 10
        )
        got = {(r["g"], r["id"]): r["cum_cost"] for r in out.collect()}
        assert got == {("a", 2): 5, ("a", 1): 9, ("c", 5): 6}


class TestNullSafety:
    def test_contamination_null_and_empty_text(self, spark):
        from citibike_analysis_spark.operators.dedup import contamination_flags

        corpus = spark.createDataFrame(
            [(0, None), (1, ""), (2, "the quick brown fox jumps over")],
            "doc_id: long, text: string",
        )
        bench = spark.createDataFrame(
            [(9, "the quick brown fox jumps")], "doc_id: long, text: string"
        )
        got = {
            r["doc_id"]: (r["n_shared"], r["contaminated"])
            for r in contamination_flags(corpus, bench, "doc_id", "text", 5).collect()
        }
        # null/empty text can share nothing but must still appear as clean
        assert got == {0: (0, False), 1: (0, False), 2: (1, True)}

    def test_sampling_null_stratum_still_deterministic(self, spark):
        from citibike_analysis_spark.operators.sampling import stratified_sample

        df = spark.createDataFrame(
            [(i, None if i % 3 == 0 else "s") for i in range(300)],
            "id: long, grp: string",
        )
        a = {r["id"] for r in stratified_sample(df, "id", 0.5, ["grp"]).collect()}
        b = {r["id"] for r in stratified_sample(df, "id", 0.5, ["grp"]).collect()}
        assert a == b and a  # null strata neither crash nor drop rows wholesale

    def test_repetition_scores_empty_doc(self, spark):
        from citibike_analysis_spark.plans.llm import q64_repetition_scores

        # the declared query itself tolerates empty docs (oracle parity
        # covers the fixture; this pins the n_tokens=0 division guard)
        import tempfile

        d = spark.createDataFrame(
            [(0, "", "en", "s", 0), (1, "a a b", "en", "s", 5)],
            "doc_id: long, text: string, lang: string, source: string, n_chars: long",
        )
        tmp = tempfile.mkdtemp()
        d.write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        got = {
            r["doc_id"]: (r["n_tokens"], r["dup_token_frac"], r["top_bigram_frac"])
            for r in q64_repetition_scores(spark, tmp).collect()
        }
        assert got[0] == (0, 0.0, 0.0)
        assert got[1][0] == 3 and abs(got[1][1] - (1 - 2 / 3)) < 1e-6


class TestCorpusStats:
    def test_unigram_logprob_known_values(self, spark):
        import math

        from citibike_analysis_spark.operators.corpus_stats import unigram_logprob

        # corpus of 4 tokens total: a×2, b×1, c×1
        df = spark.createDataFrame(
            [(1, "a a b"), (2, "c"), (3, "")], "doc_id: long, text: string"
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["avg_logp"])
            for r in unigram_logprob(df, "doc_id", "text").collect()
        }
        d1 = (2 * math.log(2 / 4) + math.log(1 / 4)) / 3
        assert got[1][0] == 3 and abs(got[1][1] - round(d1, 6)) < 1e-9
        assert got[2] == (1, round(math.log(1 / 4), 6))
        assert got[3] == (0, None)  # empty doc: no likelihood, not a crash

    def test_tfidf_topk_ranks_salient_tokens(self, spark):
        from citibike_analysis_spark.operators.corpus_stats import tfidf_topk

        df = spark.createDataFrame(
            [
                (1, "common rare1 common"),
                (2, "common rare2"),
                (3, "common"),
            ],
            "doc_id: long, text: string",
        )
        out = tfidf_topk(df, "doc_id", "text", k=1).collect()
        top = {r["doc_id"]: r["token"] for r in out}
        # 'common' appears in every doc → idf ln(1) = 0; the rare tokens win
        assert top[1] == "rare1" and top[2] == "rare2"
        # doc 3 has only zero-idf tokens; deterministic tie-break still ranks it
        assert top[3] == "common"
        # scale shape: per-doc top-k limits below the shuffle
        plan = (
            tfidf_topk(df, "doc_id", "text", k=1)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "WindowGroupLimit" in plan


class TestFrequentTokens:
    def test_exact_above_threshold_with_eviction(self, spark):
        """Vocab far wider than the sketch capacity: pass-1 eviction must
        still never drop a true heavy hitter, and pass-2 recount makes
        the final set exact."""
        from citibike_analysis_spark.operators.sketches import frequent_tokens

        # 2 heavy tokens (100 + 60 occurrences) drowned in a 300-token
        # distinct tail; total N = 460, so fractions are ~0.217 / ~0.130.
        rows = (
            [(i, "heavy") for i in range(100)]
            + [(1000 + i, "warm") for i in range(60)]
            + [(2000 + i, f"tail{i}") for i in range(300)]
        )
        df = spark.createDataFrame(rows, "doc_id: long, text: string").repartition(7)
        got = {
            r["token"]: r["n_occurrences"]
            for r in frequent_tokens(df, "text", min_fraction=0.1, capacity=10).collect()
        }
        assert got == {"heavy": 100, "warm": 60}

    def test_frequency_and_gate_boundary(self, spark):
        from citibike_analysis_spark.operators.sketches import frequent_tokens

        # 10 tokens total: "a" x5, "b" x3, c,d: 1 each.  min_fraction=0.3
        # keeps a (0.5) and b (exactly 0.3 — >= gate keeps it).
        df = spark.createDataFrame(
            [(0, "a a a a a b b"), (1, "b c d")], "doc_id: long, text: string"
        )
        got = {
            r["token"]: r["frequency"]
            for r in frequent_tokens(df, "text", min_fraction=0.3).collect()
        }
        assert got == {"a": 0.5, "b": 0.3}

    def test_capacity_below_guarantee_raises(self, spark):
        from citibike_analysis_spark.operators.sketches import frequent_tokens

        df = spark.createDataFrame([(0, "x")], "doc_id: long, text: string")
        with pytest.raises(ValueError, match="capacity"):
            frequent_tokens(df, "text", min_fraction=0.1, capacity=5)


class TestChunkDedup:
    def test_first_occurrence_wins_and_reassembly(self, spark):
        from citibike_analysis_spark.operators.dedup import dedup_chunks

        # chunk size 2: doc 0 = [a b][c d], doc 1 = [a b][x y] (first chunk
        # duplicates doc 0's), doc 2 = [c d] (duplicates doc 0's 2nd chunk),
        # doc 3 repeats its own chunk, doc 4 is empty.
        df = spark.createDataFrame(
            [
                (0, "a b c d"),
                (1, "a b x y"),
                (2, "c d"),
                (3, "p q p q"),
                (4, ""),
            ],
            "doc_id: long, text: string",
        )
        got = {
            r["doc_id"]: (r["n_chunks"], r["n_kept"], r["deduped_text"])
            for r in dedup_chunks(df, "doc_id", "text", chunk_tokens=2).collect()
        }
        assert got[0] == (2, 2, "a b c d")
        assert got[1] == (2, 1, "x y")
        assert got[2] == (1, 0, "")
        assert got[3] == (2, 1, "p q")
        assert got[4] == (0, 0, "")

    def test_tail_chunk_shorter_than_width_is_its_own_unit(self, spark):
        from citibike_analysis_spark.operators.dedup import dedup_chunks

        # "e" tail chunk of doc 0 equals doc 1's whole text — dedup'd.
        df = spark.createDataFrame(
            [(0, "a b c d e"), (1, "e")], "doc_id: long, text: string"
        )
        got = {
            r["doc_id"]: (r["n_chunks"], r["n_kept"], r["deduped_text"])
            for r in dedup_chunks(df, "doc_id", "text", chunk_tokens=2).collect()
        }
        assert got[0] == (3, 3, "a b c d e")
        assert got[1] == (1, 0, "")


class TestShuffleShards:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        from citibike_analysis_spark.sources.tables import load_table

        return load_table(spark, "/root/testdata/sf0.001", "documents").select(
            "doc_id"
        )

    def test_is_a_permutation(self, spark, docs):
        from citibike_analysis_spark.operators.sampling import shuffle_shards

        out = shuffle_shards(docs, "doc_id", n_shards=4).collect()
        n = docs.count()
        assert len(out) == n
        assert len({r["doc_id"] for r in out}) == n  # every row exactly once
        by_shard: dict[int, list[int]] = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        for shard, poss in by_shard.items():
            assert sorted(poss) == list(range(1, len(poss) + 1)), shard

    def test_stable_under_repartition(self, spark, docs):
        from citibike_analysis_spark.operators.sampling import shuffle_shards

        a = {
            (r["doc_id"], r["shard"], r["pos"])
            for r in shuffle_shards(docs, "doc_id", n_shards=4).collect()
        }
        b = {
            (r["doc_id"], r["shard"], r["pos"])
            for r in shuffle_shards(docs.repartition(13), "doc_id", n_shards=4).collect()
        }
        assert a == b

    def test_salt_draws_independent_permutation(self, spark, docs):
        from citibike_analysis_spark.operators.sampling import shuffle_shards

        a = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in shuffle_shards(docs, "doc_id", n_shards=4).collect()
        }
        b = {
            r["doc_id"]: (r["shard"], r["pos"])
            for r in shuffle_shards(docs, "doc_id", n_shards=4, salt="epoch1").collect()
        }
        assert a != b  # astronomically unlikely to coincide


class TestBigramLogprob:
    def test_hand_corpus(self, spark):
        import math

        from citibike_analysis_spark.operators.corpus_stats import bigram_logprob

        # corpus bigrams: "a b" x2 (docs 0,1), "b a" x1 (doc 1).
        # contexts: c(a .) = 2, c(b .) = 1.
        df = spark.createDataFrame(
            [(0, "a b"), (1, "a b a"), (2, "solo"), (3, "")],
            "doc_id: long, text: string",
        )
        got = {
            r["doc_id"]: (r["n_bigrams"], r["avg_logp"])
            for r in bigram_logprob(df, "doc_id", "text").collect()
        }
        # doc 0: one bigram "a b": ln(2/2) = 0
        assert got[0] == (1, 0.0)
        # doc 1: "a b" -> ln(2/2)=0, "b a" -> ln(1/1)=0 => avg 0
        assert got[1] == (2, 0.0)
        # one-token and empty docs: no bigrams, null score
        assert got[2] == (0, None)
        assert got[3] == (0, None)

    def test_word_salad_scores_below_fluent(self, spark):
        from citibike_analysis_spark.operators.corpus_stats import bigram_logprob

        fluent = [(i, "the cat sat on the mat") for i in range(20)]
        salad = [(100, "mat the on cat the sat")]  # same unigrams, rare order
        df = spark.createDataFrame(fluent + salad, "doc_id: long, text: string")
        got = {r["doc_id"]: r["avg_logp"] for r in bigram_logprob(df, "doc_id", "text").collect()}
        assert got[100] < got[0]


class TestNfcLower:
    def test_duckdb_parity_on_unicode(self, spark):
        """The convention is pinned to DuckDB's lower(nfc_normalize()):
        composed/decomposed accents, case variants, Greek sigma."""
        import duckdb

        from citibike_analysis_spark.functions.text import nfc_lower

        samples = [
            "Café",          # decomposed é → composed + lower
            "Café",           # composed é
            "STRASSE und ß",  # sharp s stays ß under lower (not casefold)
            "ΣΑΣ",  # final sigma: simple mapping gives σασ (not full's σας)
            "İstanbul I",     # dotted capital I: simple mapping İ → i
            "Å",              # Angstrom sign → NFC composes to Å
            "ＡＢＣ ǅungla",   # fullwidth + titlecase digraph
            "mixed ASCII Text",
        ]
        df = spark.createDataFrame([(i, s) for i, s in enumerate(samples)], "i: long, t: string")
        got = {r["i"]: r["n"] for r in df.select("i", nfc_lower("t").alias("n")).collect()}
        con = duckdb.connect()
        for i, s in enumerate(samples):
            want = con.execute("SELECT lower(nfc_normalize(?))", [s]).fetchone()[0]
            assert got[i] == want, (s, got[i], want)

    def test_null_passthrough(self, spark):
        from citibike_analysis_spark.functions.text import nfc_lower

        df = spark.createDataFrame([(0, None)], "i: long, t: string")
        assert df.select(nfc_lower("t").alias("n")).collect()[0]["n"] is None

    def test_dedups_encoding_variants(self, spark):
        from citibike_analysis_spark.functions.text import nfc_lower
        from pyspark.sql import functions as F2

        df = spark.createDataFrame(
            [(0, "Café Latte"), (1, "café latte"), (2, "other")],
            "doc_id: long, text: string",
        )
        groups = (
            df.groupBy(F2.md5(nfc_lower("text")).alias("h"))
            .agg(F2.min("doc_id").alias("canon"), F2.count("*").alias("n"))
            .collect()
        )
        got = {r["canon"]: r["n"] for r in groups}
        assert got == {0: 2, 2: 1}


class TestPackOffsets:
    def test_offsets_windows_and_spans(self, spark):
        from citibike_analysis_spark.operators.windows import pack_offsets

        # one group, window 10: costs 4, 8, 10, 3 → offsets 0, 4, 12, 22
        df = spark.createDataFrame(
            [(0, "s", 4), (1, "s", 8), (2, "s", 10), (3, "s", 3)],
            "doc_id: long, source: string, n: long",
        )
        got = {
            r["doc_id"]: (r["offset"], r["window_idx"], r["window_offset"], r["n_windows"])
            for r in pack_offsets(
                df, ["source"], [F.asc("doc_id")], "n", 10
            ).collect()
        }
        assert got[0] == (0, 0, 0, 1)    # [0,4) inside window 0
        assert got[1] == (4, 0, 4, 2)    # [4,12) spans windows 0-1
        assert got[2] == (12, 1, 2, 2)   # [12,22) spans windows 1-2
        assert got[3] == (22, 2, 2, 1)   # [22,25) inside window 2

    def test_zero_cost_rows_span_nothing(self, spark):
        from citibike_analysis_spark.operators.windows import pack_offsets

        df = spark.createDataFrame(
            [(0, "s", 5), (1, "s", 0), (2, "s", 5)],
            "doc_id: long, source: string, n: long",
        )
        got = {
            r["doc_id"]: (r["offset"], r["n_windows"])
            for r in pack_offsets(df, ["source"], [F.asc("doc_id")], "n", 10).collect()
        }
        assert got[1] == (5, 0)
        assert got[2] == (5, 1)

    def test_groups_pack_independently(self, spark):
        from citibike_analysis_spark.operators.windows import pack_offsets

        df = spark.createDataFrame(
            [(0, "a", 7), (1, "b", 7)], "doc_id: long, source: string, n: long"
        )
        got = {
            r["doc_id"]: r["offset"]
            for r in pack_offsets(df, ["source"], [F.asc("doc_id")], "n", 10).collect()
        }
        assert got == {0: 0, 1: 0}


class TestPCA:
    def test_numpy_parity(self, spark):
        import numpy as np

        from citibike_analysis_spark.operators.decomposition import pca_project
        from citibike_analysis_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        vecs = {
            r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
            for r in emb.collect()
        }
        x = np.array([vecs[k] for k in sorted(vecs)])
        mean = x.mean(axis=0)
        cov = (x.T @ x) / len(x) - np.outer(mean, mean)
        vals, evecs = np.linalg.eigh(cov)
        comps = evecs[:, ::-1][:, :4].T
        for i in range(4):
            j = int(np.argmax(np.abs(comps[i])))
            if comps[i, j] < 0:
                comps[i] = -comps[i]
        want = (x - mean) @ comps.T
        got = {r["vec_id"]: r["pcs"] for r in pca_project(emb, n_components=4).collect()}
        for row_idx, vid in enumerate(sorted(vecs)):
            assert np.allclose(got[vid], want[row_idx], atol=1e-5), vid

    def test_projection_stable_under_repartition(self, spark):
        from citibike_analysis_spark.operators.decomposition import pca_project
        from citibike_analysis_spark.sources.tables import load_table

        emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
        a = sorted(tuple(r["pcs"]) for r in pca_project(emb, n_components=2).collect())
        b = sorted(
            tuple(r["pcs"])
            for r in pca_project(emb.repartition(9), n_components=2).collect()
        )
        import numpy as np

        assert np.allclose(np.array(a), np.array(b), atol=1e-6)


class TestPiiRedaction:
    SAMPLES = [
        "contact jane.doe+x@example.co.uk or call 555-867-5309 now",
        "ssn 123-45-6789 phone 555 123 4567 ip 10.0.255.1",
        "server at 192.168.1.1 mail root@localhost.localdomain",
        "+1 555-867-5309 and 555.867.5309 and bare 5558675309",
        "no pii here at all",
        "a@b.io 999-99-9999 1.2.3.4 123-456-7890",
    ]

    def test_duckdb_parity_counts_and_redaction(self, spark):
        """The same pattern strings must match identically in Java regex
        and RE2 — counts and the sequentially redacted text both."""
        import duckdb

        from citibike_analysis_spark.functions.text import PII_PATTERNS, pii_counts, redact_pii

        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(self.SAMPLES)], "i: long, t: string"
        )
        counts = pii_counts(F.col("t"))
        got = {
            r["i"]: r
            for r in df.select(
                "i",
                *[counts[name].alias(name) for name, _, _ in PII_PATTERNS],
                redact_pii(F.col("t")).alias("red"),
            ).collect()
        }
        con = duckdb.connect()
        for i, s in enumerate(self.SAMPLES):
            red = s
            for _, p, placeholder in PII_PATTERNS:
                red = con.execute(
                    "SELECT regexp_replace(?, ?, ?, 'g')", [red, p, placeholder]
                ).fetchone()[0]
            assert got[i]["red"] == red, (s, got[i]["red"], red)
            for name, p, _ in PII_PATTERNS:
                want = con.execute(
                    "SELECT len(regexp_extract_all(?, ?))", [s, p]
                ).fetchone()[0]
                assert got[i][name] == want, (s, name, got[i][name], want)

    def test_redaction_precedence(self, spark):
        from citibike_analysis_spark.functions.text import redact_pii

        df = spark.createDataFrame(
            [(0, "ssn 123-45-6789 and ip 1.2.3.4 and a@b.io")], "i: long, t: string"
        )
        red = df.select(redact_pii("t").alias("r")).collect()[0]["r"]
        # SSN redacted as SSN (not eaten by the phone pattern), IP as IP
        assert red == "ssn [SSN] and ip [IP] and [EMAIL]"

    def test_clean_text_untouched(self, spark):
        from citibike_analysis_spark.functions.text import redact_pii

        df = spark.createDataFrame([(0, "just words 42 here")], "i: long, t: string")
        assert df.select(redact_pii("t").alias("r")).collect()[0]["r"] == "just words 42 here"


class TestDupNgramCoverage:
    def test_hand_case(self, spark):
        from citibike_analysis_spark.plans.llm import q84_dup_ngram_coverage  # noqa: F401
        from citibike_analysis_spark.functions.text import ngrams_of

        # doc 0: "a b c a b c a b c" — trigram "a b c" occurs 3x (pos 0,3,6),
        # "b c a" 2x (1,4), "c a b" 2x (2,5): every position covered.
        # doc 1: all distinct tokens — nothing repeats.
        df = spark.createDataFrame(
            [(0, "a b c a b c a b c"), (1, "p q r s t u")],
            "doc_id: long, text: string",
        )
        from pyspark.sql import functions as F2

        tk = df.select(F2.col("doc_id").alias("_id"), F2.split("text", " ").alias("_tk"))
        grams = tk.select("_id", F2.posexplode(ngrams_of(F2.col("_tk"), 3)).alias("pos", "g"))
        dup = grams.groupBy("_id", "g").count().filter("count >= 2")
        cov = (
            grams.join(dup, ["_id", "g"])
            .select("_id", F2.explode(F2.sequence("pos", F2.col("pos") + 2)).alias("tp"))
            .distinct()
            .groupBy("_id")
            .count()
            .collect()
        )
        got = {r["_id"]: r["count"] for r in cov}
        assert got == {0: 9}  # doc 1 absent: zero coverage


class TestIncrementalDedup:
    def test_batch_vs_corpus_and_within_batch(self, spark):
        from citibike_analysis_spark.operators.dedup import dedup_against_corpus

        corpus = spark.createDataFrame(
            [(0, "old text one"), (1, "old text two")], "doc_id: long, text: string"
        )
        batch = spark.createDataFrame(
            [
                (10, "old text one"),   # exists in corpus → dropped
                (11, "brand new"),      # fresh → kept
                (12, "brand new"),      # within-batch dup → dropped (11 wins)
                (13, "also new"),       # fresh → kept
            ],
            "doc_id: long, text: string",
        )
        got = sorted(
            r["doc_id"]
            for r in dedup_against_corpus(batch, corpus, "doc_id", "text").collect()
        )
        assert got == [11, 13]

    def test_corpus_side_never_emitted(self, spark):
        from citibike_analysis_spark.operators.dedup import dedup_against_corpus

        corpus = spark.createDataFrame([(0, "x")], "doc_id: long, text: string")
        batch = spark.createDataFrame([(5, "y")], "doc_id: long, text: string")
        out = dedup_against_corpus(batch, corpus, "doc_id", "text").collect()
        assert [r["doc_id"] for r in out] == [5]
        assert "content_hash" in out[0].asDict()


class TestCorpusPipelinePlan:
    def test_no_cartesian_product(self, spark):
        """The composed corpus build must stay equi-join-shaped end to
        end — a cartesian anywhere would be a scale regression."""
        from citibike_analysis_spark.plans.llm import q86_corpus_pipeline

        d = q86_corpus_pipeline(spark, "/root/testdata/sf0.001")
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert d.count() > 0


class TestFixedSample:
    def test_exactly_k_per_stratum(self, spark):
        from citibike_analysis_spark.operators.sampling import stratified_fixed_sample
        from citibike_analysis_spark.sources.tables import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        out = stratified_fixed_sample(d, "doc_id", 5, strata_cols=["source"])
        counts = {r["source"]: r["n"] for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
        totals = {r["source"]: r["n"] for r in d.groupBy("source").agg(F.count("*").alias("n")).collect()}
        for src, n in counts.items():
            assert n == min(5, totals[src]), src

    def test_stable_under_repartition_and_salt_independent(self, spark):
        from citibike_analysis_spark.operators.sampling import stratified_fixed_sample
        from citibike_analysis_spark.sources.tables import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents")
        a = {r["doc_id"] for r in stratified_fixed_sample(d, "doc_id", 5, ["source"]).collect()}
        b = {
            r["doc_id"]
            for r in stratified_fixed_sample(d.repartition(9), "doc_id", 5, ["source"]).collect()
        }
        c = {
            r["doc_id"]
            for r in stratified_fixed_sample(d, "doc_id", 5, ["source"], salt="v2").collect()
        }
        assert a == b
        assert a != c

    def test_small_stratum_kept_whole(self, spark):
        from citibike_analysis_spark.operators.sampling import stratified_fixed_sample

        df = spark.createDataFrame(
            [(0, "a"), (1, "a"), (2, "b")], "doc_id: long, source: string"
        )
        out = stratified_fixed_sample(df, "doc_id", 10, ["source"])
        assert out.count() == 3


class TestGroupZscore:
    def test_values_and_constant_group_null(self, spark):
        from citibike_analysis_spark.operators.corpus_stats import group_zscore

        df = spark.createDataFrame(
            [(0, "a", 1.0), (1, "a", 2.0), (2, "a", 3.0), (3, "b", 7.0), (4, "b", 7.0)],
            "i: long, g: string, x: double",
        )
        got = {r["i"]: r["zscore"] for r in group_zscore(df, "x", ["g"]).collect()}
        assert got[0] == -1.0 and got[1] == 0.0 and got[2] == 1.0
        assert got[3] is None and got[4] is None  # zero-variance group


class TestVocabEncode:
    def test_roundtrip_decode_recovers_text(self, spark):
        """Encoding then decoding through the vocab must reproduce the
        token stream exactly — the property a trainer depends on."""
        from citibike_analysis_spark.operators.corpus_stats import (
            build_vocab,
            encode_documents,
        )

        df = spark.createDataFrame(
            [(0, "b a a c"), (1, "a b"), (2, "")], "doc_id: long, text: string"
        )
        vocab = build_vocab(df, "text")
        v = {r["token"]: r["token_id"] for r in vocab.collect()}
        # frequency ranks: a(3) → 0, then b(2) → 1, c(1) → 2
        assert v == {"a": 0, "b": 1, "c": 2}
        inv = {i: t for t, i in v.items()}
        got = {
            r["doc_id"]: [inv[i] for i in r["token_ids"]]
            for r in encode_documents(df, "doc_id", "text", vocab).collect()
        }
        assert got[0] == ["b", "a", "a", "c"]
        assert got[1] == ["a", "b"]
        assert got[2] == []

    def test_unknown_tokens_encode_minus_one(self, spark):
        from citibike_analysis_spark.operators.corpus_stats import (
            build_vocab,
            encode_documents,
        )

        train = spark.createDataFrame([(0, "a b")], "doc_id: long, text: string")
        apply_to = spark.createDataFrame([(9, "a zzz b")], "doc_id: long, text: string")
        vocab = build_vocab(train, "text")
        got = encode_documents(apply_to, "doc_id", "text", vocab).collect()[0]
        assert got["token_ids"][1] == -1
        assert got["n_tokens"] == 3


class TestContainment:
    def test_quote_inside_long_doc(self, spark):
        """A short doc quoted whole inside a long one: containment ≈ 1
        in the contained direction, low the other way, and Jaccard
        misses the pair entirely at the same threshold."""
        from citibike_analysis_spark.operators.dedup import (
            ngram_containment_pairs,
            ngram_jaccard_pairs,
        )

        short = "the quick brown fox jumps"
        filler = " ".join(f"w{i}" for i in range(40))
        df = spark.createDataFrame(
            [(0, short), (1, f"{filler} {short}")], "doc_id: long, text: string"
        )
        cont = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in ngram_containment_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
        }
        assert cont[(0, 1)] == 1.0          # every shingle of 0 is in 1
        assert (1, 0) not in cont           # the long side is not contained
        jac = ngram_jaccard_pairs(df, "doc_id", "text", n=3, threshold=0.9).collect()
        assert jac == []                    # Jaccard blind to the quote

    def test_identical_docs_bidirectional(self, spark):
        from citibike_analysis_spark.operators.dedup import ngram_containment_pairs

        df = spark.createDataFrame(
            [(0, "a b c d e"), (1, "a b c d e")], "doc_id: long, text: string"
        )
        got = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in ngram_containment_pairs(df, "doc_id", "text", n=3, threshold=0.5).collect()
        }
        assert got == {(0, 1): 1.0, (1, 0): 1.0}


class TestTokenEntropy:
    def test_known_values(self, spark):
        import math

        from citibike_analysis_spark.plans.llm import q91_token_entropy  # noqa: F401
        # computed through the registered query shape on a tiny frame
        from citibike_analysis_spark.functions.text import tokens as _tokens
        from pyspark.sql import functions as F2

        df = spark.createDataFrame(
            [(0, "a a a a"), (1, "a b c d"), (2, "a a b b")],
            "doc_id: long, text: string",
        )
        tf = (
            df.select(F2.col("doc_id").alias("_id"), F2.explode(_tokens(F2.col("text"))).alias("t"))
            .groupBy("_id", "t").count()
        )
        ent = tf.groupBy("_id").agg(
            (F2.log(F2.sum("count")) - F2.sum(F2.col("count") * F2.log("count")) / F2.sum("count")).alias("h")
        )
        got = {r["_id"]: r["h"] for r in ent.collect()}
        assert got[0] == pytest.approx(0.0, abs=1e-12)          # constant doc
        assert got[1] == pytest.approx(math.log(4), abs=1e-12)  # uniform over 4
        assert got[2] == pytest.approx(math.log(2), abs=1e-12)  # two 50/50 tokens


class TestRobustStats:
    def test_group_mad_known_values(self, spark):
        from citibike_analysis_spark.operators.corpus_stats import group_mad

        # group a: [1, 2, 3, 100] -> median 2.5, deviations [1.5, .5, .5, 97.5]
        # -> MAD 1.0; the outlier barely moves it (vs stddev ~ 48)
        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 100.0), ("b", 7.0)],
            "g: string, x: double",
        )
        got = {r["g"]: (r["n"], r["median"], r["mad"]) for r in group_mad(df, "x", ["g"]).collect()}
        assert got["a"] == (4, 2.5, 1.0)
        assert got["b"] == (1, 7.0, 0.0)

    def test_trimmed_mean_drops_tails(self, spark):
        from citibike_analysis_spark.operators.corpus_stats import trimmed_mean_udaf

        # 10 values incl. one huge outlier; 10% trim drops exactly the
        # min and max -> mean of 2..9 = 5.5
        vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
        df = spark.createDataFrame([("a", v) for v in vals], "g: string, x: double")
        trimmed = trimmed_mean_udaf(0.1)
        got = df.groupBy("g").agg(trimmed(F.col("x")).alias("t")).collect()[0]["t"]
        assert got == pytest.approx(5.5)

    def test_trimmed_mean_tiny_groups_fall_back_to_mean(self, spark):
        from citibike_analysis_spark.operators.corpus_stats import trimmed_mean_udaf

        df = spark.createDataFrame([("a", 3.0), ("a", 5.0)], "g: string, x: double")
        trimmed = trimmed_mean_udaf(0.25)
        got = df.groupBy("g").agg(trimmed(F.col("x")).alias("t")).collect()[0]["t"]
        assert got == pytest.approx(4.0)  # k clamps to 0 for n=2


class TestGlobalPositions:
    def test_dense_zero_based_permutation(self, spark):
        from citibike_analysis_spark.operators.sampling import global_positions
        from citibike_analysis_spark.sources.tables import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents").select("doc_id")
        out = global_positions(d, "doc_id", n_shards=4).collect()
        n = d.count()
        poss = sorted(r["global_pos"] for r in out)
        assert poss == list(range(n))  # dense, 0-based, no gaps
        # global order is (shard, pos): positions within a shard contiguous
        by_shard = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append((r["pos"], r["global_pos"]))
        running = 0
        for shard in sorted(by_shard):
            rows = sorted(by_shard[shard])
            assert [g for _, g in rows] == list(range(running, running + len(rows)))
            running += len(rows)

    def test_stable_under_repartition(self, spark):
        from citibike_analysis_spark.operators.sampling import global_positions
        from citibike_analysis_spark.sources.tables import load_table

        d = load_table(spark, "/root/testdata/sf0.001", "documents").select("doc_id")
        a = {(r["doc_id"], r["global_pos"]) for r in global_positions(d, "doc_id", 4).collect()}
        b = {
            (r["doc_id"], r["global_pos"])
            for r in global_positions(d.repartition(7), "doc_id", 4).collect()
        }
        assert a == b


class TestScd2:
    def test_runs_collapse_and_intervals_chain(self, spark):
        import datetime as dt

        from citibike_analysis_spark.operators.windows import scd2_intervals

        t = lambda m: dt.datetime(2024, 1, 1, 0, m)
        df = spark.createDataFrame(
            [
                (1, t(0), "a", 100),
                (1, t(1), "a", 101),   # same state -> merges
                (1, t(2), "b", 102),   # change
                (1, t(3), "a", 103),   # back to a -> NEW interval (not merged)
                (2, t(0), "x", 104),
            ],
            "user_id: long, ts: timestamp, state: string, event_id: long",
        )
        out = scd2_intervals(df, ["user_id"], "ts", "state", tie_break=["event_id"]).collect()
        ivs = sorted(
            (r["user_id"], r["valid_from"], r["valid_to"], r["state"]) for r in out
        )
        assert ivs == [
            (1, t(0), t(2), "a"),
            (1, t(2), t(3), "b"),
            (1, t(3), None, "a"),
            (2, t(0), None, "x"),
        ]

    def test_null_state_runs_merge_and_first_null_opens(self, spark):
        import datetime as dt

        from citibike_analysis_spark.operators.windows import scd2_intervals

        t = lambda m: dt.datetime(2024, 1, 1, 0, m)
        df = spark.createDataFrame(
            [(1, t(0), None, 0), (1, t(1), None, 1), (1, t(2), "a", 2)],
            "user_id: long, ts: timestamp, state: string, event_id: long",
        )
        out = scd2_intervals(df, ["user_id"], "ts", "state", tie_break=["event_id"]).collect()
        assert len(out) == 2
        states = {r["state"]: (r["valid_from"], r["valid_to"]) for r in out}
        assert states[None] == (t(0), t(2))
        assert states["a"] == (t(2), None)


class TestWeightedSample:
    def test_heavy_weights_dominate_inclusion(self, spark):
        """A-ES property: across independent draws (salts), an item with
        10x weight is included far more often than a 1x item when k
        covers a fraction of the population."""
        from citibike_analysis_spark.operators.sampling import (
            weighted_sample_without_replacement,
        )

        rows = [(i, 10.0 if i < 5 else 1.0) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id: long, w: double")
        heavy_hits = light_hits = 0
        for salt in ("s1", "s2", "s3", "s4", "s5", "s6"):
            got = {
                r["doc_id"]
                for r in weighted_sample_without_replacement(
                    df, "doc_id", "w", 10, salt=salt
                ).collect()
            }
            assert len(got) == 10
            heavy_hits += sum(1 for i in range(5) if i in got)
            light_hits += sum(1 for i in range(5, 50) if i in got)
        # heavy items: weight share 50/95 over 6 draws of k=10.
        # Expected inclusion ~5-6x the per-item light rate.
        assert heavy_hits / 5 > 3 * (light_hits / 45)

    def test_deterministic_and_nonpositive_weight_excluded(self, spark):
        from citibike_analysis_spark.operators.sampling import (
            weighted_sample_without_replacement,
        )

        df = spark.createDataFrame(
            [(0, 1.0), (1, 0.0), (2, -3.0), (3, None), (4, 2.0)],
            "doc_id: long, w: double",
        )
        a = {r["doc_id"] for r in weighted_sample_without_replacement(df, "doc_id", "w", 10).collect()}
        b = {
            r["doc_id"]
            for r in weighted_sample_without_replacement(
                df.repartition(5), "doc_id", "w", 10
            ).collect()
        }
        assert a == b == {0, 4}


class TestImportanceWeights:
    def test_target_like_docs_score_higher(self, spark):
        # target domain speaks "alpha beta"; pool doc 1 mimics it, pool
        # doc 2 speaks unrelated tokens — the DSIR logratio must rank
        # doc 1 above doc 2, and only POOL docs come back
        from citibike_analysis_spark.operators.corpus_stats import (
            importance_weights,
        )

        df = spark.createDataFrame(
            [
                (0, "alpha beta alpha beta alpha", True),
                (1, "alpha beta alpha", False),
                (2, "zeta eta theta iota", False),
                (3, "", False),
            ],
            "doc_id: long, text: string, is_target: boolean",
        )
        out = {
            r["doc_id"]: r
            for r in importance_weights(df, "doc_id", "text", "is_target").collect()
        }
        assert set(out) == {1, 2, 3}  # target row 0 is never scored
        assert out[1]["logratio"] > out[2]["logratio"]
        # empty pool doc: zero tokens, null score (gate-droppable)
        assert out[3]["n_tokens"] == 0 and out[3]["logratio"] is None

    def test_smoothing_matches_hand_computation(self, spark):
        # one-token corpus keeps the closed form checkable by hand:
        # target = "a", pool doc = "b". V=2, N_t=1, N_r=1.
        # p_t(b) = (0+1)/(1+2) = 1/3; p_r(b) = (1+1)/(1+2) = 2/3;
        # logratio = ln(1/3) - ln(2/3) = -ln 2
        import math

        from citibike_analysis_spark.operators.corpus_stats import (
            importance_weights,
        )

        df = spark.createDataFrame(
            [(0, "a", True), (1, "b", False)],
            "doc_id: long, text: string, is_target: boolean",
        )
        row = importance_weights(df, "doc_id", "text", "is_target").collect()[0]
        assert row["doc_id"] == 1
        assert row["logratio"] == pytest.approx(-math.log(2), abs=1e-6)


class TestTemperatureMixture:
    def test_tail_boosted_head_flattened(self, spark):
        # 400 docs of src "big", 16 of "small"; alpha=0.5 gives the
        # small source a keep-fraction ~sqrt-proportionally LARGER than
        # the big one — the whole point of temperature sampling
        from citibike_analysis_spark.operators.sampling import (
            temperature_mixture,
        )

        rows = [(i, "big") for i in range(400)] + [
            (1000 + i, "small") for i in range(16)
        ]
        df = spark.createDataFrame(rows, "doc_id: long, source: string")
        kept = temperature_mixture(
            df, "doc_id", "source", alpha=0.5, total_fraction=0.5
        )
        frac = {
            r["source"]: r["n"]
            for r in kept.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        big_frac = frac.get("big", 0) / 400
        small_frac = frac.get("small", 0) / 16
        # quotas: total_sel=208, z=sqrt(400)+sqrt(16)=24 → big 174/400
        # (~0.43), small capped at 16/16 (=1.0, kept whole)
        assert small_frac == 1.0
        assert 0.3 < big_frac < 0.6
        assert small_frac > big_frac

    def test_deterministic_and_validates(self, spark):
        from citibike_analysis_spark.operators.sampling import (
            temperature_mixture,
        )

        df = spark.createDataFrame(
            [(i, f"s{i % 3}") for i in range(90)], "doc_id: long, source: string"
        )
        a = {r["doc_id"] for r in
             temperature_mixture(df, "doc_id", "source").collect()}
        b = {r["doc_id"] for r in
             temperature_mixture(df.repartition(7), "doc_id", "source").collect()}
        assert a == b  # pure function of row identity
        c = {r["doc_id"] for r in
             temperature_mixture(df, "doc_id", "source", salt="x").collect()}
        assert c != a  # independent draw per salt
        with pytest.raises(ValueError, match="total_fraction"):
            temperature_mixture(df, "doc_id", "source", total_fraction=0.0)
        with pytest.raises(ValueError, match="alpha"):
            temperature_mixture(df, "doc_id", "source", alpha=0.0)


class TestBloomDecontamination:
    def test_equals_exact_operator_including_planted_hits(self, spark):
        """r08: the bloom gate must be invisible in the OUTPUT — exact
        equality with contamination_flags, with contamination actually
        present (a clean-only fixture would pass a broken gate too)."""
        from citibike_analysis_spark.operators.dedup import (
            contamination_flags,
            contamination_flags_bloom,
        )

        bench = spark.createDataFrame(
            [(1000, "the quick brown fox jumps over the lazy dog tonight")],
            "doc_id long, text string",
        )
        corpus = spark.createDataFrame(
            [
                # contains a bench 5-gram -> contaminated
                (1, "we saw the quick brown fox jumps over a fence"),
                (2, "completely unrelated text with no shared phrases at all"),
                (3, "quick brown fox jumps over the lazy dog tonight again"),
            ],
            "doc_id long, text string",
        )
        exact = sorted(
            map(tuple, contamination_flags(corpus, bench, "doc_id", "text", n=5).collect())
        )
        bloom = sorted(
            map(
                tuple,
                contamination_flags_bloom(corpus, bench, "doc_id", "text", n=5).collect(),
            )
        )
        assert bloom == exact
        assert sum(1 for r in exact if r[2]) == 2  # planted hits found

    def test_sf_corpus_equality(self, spark):
        from citibike_analysis_spark.operators.dedup import (
            contamination_flags,
            contamination_flags_bloom,
        )
        from citibike_analysis_spark.sources.tables import load_table
        from pyspark.sql import functions as F

        d = load_table(spark, "/root/testdata/sf0.01", "documents")
        corpus = d.filter(F.col("source") != "src0")
        bench = d.filter(F.col("source") == "src0")
        a = sorted(
            map(tuple, contamination_flags(corpus, bench, "doc_id", "text", n=5).collect())
        )
        b = sorted(
            map(
                tuple,
                contamination_flags_bloom(corpus, bench, "doc_id", "text", n=5).collect(),
            )
        )
        assert a and a == b

    def test_empty_benchmark_everything_clean(self, spark):
        from citibike_analysis_spark.operators.dedup import contamination_flags_bloom

        corpus = spark.createDataFrame(
            [(1, "some text here"), (2, "other text there")],
            "doc_id long, text string",
        )
        bench = spark.createDataFrame([], "doc_id long, text string")
        rows = contamination_flags_bloom(corpus, bench, "doc_id", "text").collect()
        assert len(rows) == 2
        assert all(r["n_shared"] == 0 and r["contaminated"] is False for r in rows)


class TestDuplicatedSpans:
    """Span-level dedup (r14): maximal duplicated k-gram runs + the
    keep-first-occurrence scrub (operators/dedup.py, q143/q144)."""

    @pytest.fixture(scope="class")
    def docs(self, spark):
        # k=3 fixtures: doc 5 is an exact copy of doc 0; doc 1 shares the
        # interior run "c d e f" with them; doc 2 repeats its own 4-token
        # phrase; doc 3 is shorter than k; doc 4 is empty.
        return spark.createDataFrame(
            [
                (0, "a b c d e f g h"),
                (1, "z z c d e f z q"),
                (2, "m n o p m n o p"),
                (3, "a b"),
                (4, ""),
                (5, "a b c d e f g h"),
            ],
            "doc_id: long, text: string",
        )

    def spans_of(self, df, **kw):
        from citibike_analysis_spark.operators.dedup import duplicated_spans

        kw.setdefault("k", 3)
        out = duplicated_spans(df, "doc_id", "text", **kw).collect()
        return sorted((r.doc_id, r.span_start, r.span_end, r.span_tokens) for r in out)

    def test_cross_doc_within_doc_and_merge(self, spark, docs):
        assert self.spans_of(docs) == [
            (0, 0, 7, 8),  # whole doc duplicated by doc 5
            (1, 2, 5, 4),  # shared interior run only
            (2, 0, 3, 4),  # first copy of the self-repeat
            (2, 4, 7, 4),  # second copy (non-adjacent -> separate span)
            (5, 0, 7, 8),
        ]

    def test_min_occurrences_threshold(self, spark, docs):
        # only "c d e"/"d e f" occur >= 3x (docs 0, 1, 5)
        assert self.spans_of(docs, min_occurrences=3) == [
            (0, 2, 5, 4),
            (1, 2, 5, 4),
            (5, 2, 5, 4),
        ]

    def test_min_span_tokens_filter(self, spark, docs):
        assert self.spans_of(docs, min_span_tokens=5) == [
            (0, 0, 7, 8),
            (5, 0, 7, 8),
        ]

    def test_no_cartesian_and_no_gram_partition_sort(self, spark, docs):
        from citibike_analysis_spark.operators.dedup import duplicated_spans

        plan = duplicated_spans(docs, "doc_id", "text", k=3)._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        # candidate reduction is the partial-agg'd groupBy + semi-join on
        # the gram hash, never a windowed count over the gram partition
        # (hot-gram skew would sort 1e9 rows on one reducer)
        assert "LeftSemi" in plan

    def test_scrub_keeps_first_occurrence(self, spark, docs):
        from citibike_analysis_spark.operators.dedup import scrub_duplicated_spans

        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.scrubbed_text)
            for r in scrub_duplicated_spans(docs, "doc_id", "text", k=3).collect()
        }
        assert got[0] == (8, 0, "a b c d e f g h")  # canonical copy untouched
        assert got[1] == (8, 4, "z z z q")  # interior run cut, flanks kept
        assert got[2] == (8, 4, "m n o p")  # self-repeat keeps first copy
        assert got[3] == (2, 0, "a b")  # shorter than k: no grams
        assert got[4] == (0, 0, "")
        assert got[5] == (8, 8, "")  # exact copy fully scrubbed

    def test_scrub_removed_counts_are_consistent(self, spark, docs):
        from citibike_analysis_spark.operators.dedup import scrub_duplicated_spans

        for r in scrub_duplicated_spans(docs, "doc_id", "text", k=3).collect():
            kept = [t for t in r.scrubbed_text.split(" ") if t]
            assert r.n_tokens - r.n_removed == len(kept)


class TestContaminatedSpans:
    """Span-level decontamination (r14, q145): leaked-region localization
    against a benchmark gram set."""

    @pytest.fixture(scope="class")
    def frames(self, spark):
        bench = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon")],
            "doc_id: long, text: string",
        )
        corpus = spark.createDataFrame(
            [
                (0, "x y alpha beta gamma delta epsilon z"),  # full quote at 2
                (1, "alpha beta gamma q r s"),  # leading partial overlap
                (2, "no leak in this document"),
                (3, "alpha beta"),  # shorter than k
                (4, "x y z x y z x y z"),  # corpus-internal repeat only
            ],
            "doc_id: long, text: string",
        )
        return corpus, bench

    def test_localizes_leaked_regions_only(self, spark, frames):
        from citibike_analysis_spark.operators.dedup import contaminated_spans

        corpus, bench = frames
        got = sorted(
            (r.doc_id, r.span_start, r.span_end, r.span_tokens)
            for r in contaminated_spans(corpus, bench, "doc_id", "text", k=3).collect()
        )
        # doc 4's internal repeats and doc 2 are invisible: only grams in
        # the BENCHMARK set count
        assert got == [(0, 2, 6, 5), (1, 0, 2, 3)]

    def test_min_span_tokens_gate(self, spark, frames):
        from citibike_analysis_spark.operators.dedup import contaminated_spans

        corpus, bench = frames
        got = [
            (r.doc_id, r.span_tokens)
            for r in contaminated_spans(
                corpus, bench, "doc_id", "text", k=3, min_span_tokens=5
            ).collect()
        ]
        assert got == [(0, 5)]

    def test_benchmark_side_reduces_before_join(self, spark, frames):
        from citibike_analysis_spark.operators.dedup import contaminated_spans

        corpus, bench = frames
        plan = (
            contaminated_spans(corpus, bench, "doc_id", "text", k=3)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "LeftSemi" in plan

    def test_scrub_cuts_every_leaked_span(self, spark, frames):
        from citibike_analysis_spark.operators.dedup import (
            scrub_contaminated_spans,
        )

        corpus, bench = frames
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.scrubbed_text)
            for r in scrub_contaminated_spans(
                corpus, bench, "doc_id", "text", k=3
            ).collect()
        }
        # no keep-first rule: the quote goes even on its first occurrence
        assert got[0] == (8, 5, "x y z")
        assert got[1] == (6, 3, "q r s")
        assert got[2] == (5, 0, "no leak in this document")
        assert got[3] == (2, 0, "alpha beta")  # shorter than k: untouchable
        assert got[4] == (9, 0, "x y z x y z x y z")

    def test_null_text_reads_as_empty_document(self, spark):
        from citibike_analysis_spark.operators.dedup import (
            scrub_duplicated_spans,
        )

        df = spark.createDataFrame(
            [(0, "a b c a b c a b c"), (1, None)],
            "doc_id: long, text: string",
        )
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.scrubbed_text)
            for r in scrub_duplicated_spans(df, "doc_id", "text", k=3).collect()
        }
        # size(NULL) is -1 under default sizeOfNull; the scrub must not
        # leak that as a negative token count
        assert got[1] == (0, 0, "")
        assert got[0][0] == 9


class TestGramIndex:
    """Persisted gram index (r14): build / append / coverage lifecycle —
    the 100 TB form of span dedup (probe without rescanning the corpus)."""

    T = "gram_idx_test"

    @pytest.fixture()
    def table(self, spark):
        yield self.T
        spark.sql(f"DROP TABLE IF EXISTS {self.T}")

    def cov(self, spark, df):
        from citibike_analysis_spark.operators.dedup import gram_index_coverage

        return {
            r.doc_id: (r.n_grams, r.n_covered, r.coverage)
            for r in gram_index_coverage(spark, self.T, df).collect()
        }

    def test_build_probe_append_lifecycle(self, spark, table):
        from citibike_analysis_spark.operators.dedup import (
            append_to_gram_index,
            build_gram_index,
        )

        corpus = spark.createDataFrame(
            [(0, "a b c d e f"), (1, "m n o p q r")],
            "doc_id: long, text: string",
        )
        n = build_gram_index(corpus, self.T, k=3, num_buckets=4)
        assert n == 8  # 4 grams per doc, all distinct
        probes = spark.createDataFrame(
            [
                (10, "a b c d e f"),  # verbatim corpus doc -> full coverage
                (11, "x y a b c z w"),  # one corpus gram at offset 2
                (12, "u v w x y z"),  # nothing shared
                (13, "a b"),  # shorter than k: no grams
            ],
            "doc_id: long, text: string",
        )
        got = self.cov(spark, probes)
        assert got[10] == (4, 4, 1.0)
        assert got[11] == (5, 1, 0.2)
        assert got[12] == (4, 0, 0.0)
        assert got[13] == (0, 0, 0.0)
        # append the novel batch; its grams become corpus for LATER probes
        added = append_to_gram_index(spark, self.T, probes)
        assert added > 0
        spark.catalog.refreshTable(self.T)
        later = spark.createDataFrame(
            [(20, "u v w x y z")], "doc_id: long, text: string"
        )
        assert self.cov(spark, later)[20] == (4, 4, 1.0)

    def test_append_is_idempotent_and_coverage_replay_stable(self, spark, table):
        from citibike_analysis_spark.operators.dedup import (
            append_to_gram_index,
            build_gram_index,
        )

        corpus = spark.createDataFrame(
            [(0, "a b c d e f")], "doc_id: long, text: string"
        )
        build_gram_index(corpus, self.T, k=3, num_buckets=4)
        batch = spark.createDataFrame(
            [(5, "p q r s t u")], "doc_id: long, text: string"
        )
        before = self.cov(spark, batch)[5]
        assert append_to_gram_index(spark, self.T, batch) == 4
        spark.catalog.refreshTable(self.T)
        # replayed epoch: same batch again -> nothing novel
        assert append_to_gram_index(spark, self.T, batch) == 0
        # replay STABILITY: the batch's own grams are in the index now
        # (contributor = itself), yet its coverage must read unchanged —
        # an admission decision cannot flip on a crash replay
        assert self.cov(spark, batch)[5] == before == (4, 0, 0.0)
        # a DIFFERENT doc with the same text is genuinely covered
        other = spark.createDataFrame(
            [(6, "p q r s t u")], "doc_id: long, text: string"
        )
        assert self.cov(spark, other)[6] == (4, 4, 1.0)

    def test_probe_refuses_non_gram_index_table(self, spark, table):
        from citibike_analysis_spark.operators.dedup import gram_index_coverage

        spark.createDataFrame([(1,)], "x: long").write.saveAsTable(self.T)
        with pytest.raises(ValueError, match="not a gram index"):
            gram_index_coverage(
                spark,
                self.T,
                spark.createDataFrame([(0, "a b c")], "doc_id: long, text: string"),
            )
