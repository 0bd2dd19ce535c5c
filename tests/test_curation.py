"""Unit tests for the corpus-curation operators (functions/curation.py):
PII redaction, cross-document paragraph dedup, Gopher repetition
signals, URL canonicalization, stratified sampling, context packing.

These ops are the post-extraction layer the reference lacks (Lexoid
stops at markdown, api.py:235-441); each also has an oracled driver
query in __spark_entry__ — here we pin the exact semantics on crafted
micro-inputs.
"""

import pytest
from pyspark.sql import functions as F

from lexoid_spark.functions.curation import (
    normalize_url,
    packed_bins,
    paragraph_dedup,
    pii_redact,
    repetition_table,
    stratified_sample,
)


def _one(df, col):
    return df.select(F.col(col)).collect()[0][0]


class TestPiiRedact:
    def test_email_ip_phone(self, spark):
        df = spark.createDataFrame(
            [("write a.b-c+d@sub.example.org from 192.168.0.1 "
              "or call +4917212345678 / 415-555-0134",)], ["t"])
        out = _one(df.select(pii_redact("t").alias("r")), "r")
        assert out == ("write <EMAIL> from <IP> or call <PHONE> / <PHONE>")

    def test_leaves_clean_text(self, spark):
        df = spark.createDataFrame(
            [("version 1.2 costs $3 at 5pm on 2024-01-01",)], ["t"])
        out = _one(df.select(pii_redact("t").alias("r")), "r")
        assert out == "version 1.2 costs $3 at 5pm on 2024-01-01"

    def test_multiple_emails_all_replaced(self, spark):
        df = spark.createDataFrame([("a@b.co x c@d.org",)], ["t"])
        assert _one(df.select(pii_redact("t").alias("r")), "r") == \
            "<EMAIL> x <EMAIL>"


class TestParagraphDedup:
    def test_keeps_first_occurrence_only(self, spark):
        df = spark.createDataFrame(
            [(1, "shared\n\nown one"),
             (2, "shared\n\nown two"),
             (3, "own three\n\nshared")],
            ["id", "text"])
        out = {r["id"]: r for r in
               paragraph_dedup(df, "id", "text").collect()}
        assert out[1]["text_dedup"] == "shared\n\nown one"
        assert out[2]["text_dedup"] == "own two"
        assert out[3]["text_dedup"] == "own three"
        assert (out[1]["n_paras"], out[1]["n_kept"]) == (2, 2)
        assert (out[2]["n_paras"], out[2]["n_kept"]) == (2, 1)

    def test_duplicate_within_one_doc(self, spark):
        df = spark.createDataFrame([(1, "p\n\nq\n\np")], ["id", "text"])
        row = paragraph_dedup(df, "id", "text").collect()[0]
        assert row["text_dedup"] == "p\n\nq"
        assert row["n_paras"] == 3 and row["n_kept"] == 2

    def test_all_paragraphs_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "only"), (2, "only")], ["id", "text"])
        out = {r["id"]: r for r in
               paragraph_dedup(df, "id", "text").collect()}
        assert out[2]["text_dedup"] == "" and out[2]["n_kept"] == 0

    def test_blank_paragraphs_ignored(self, spark):
        df = spark.createDataFrame([(1, "a\n\n   \n\nb")], ["id", "text"])
        row = paragraph_dedup(df, "id", "text").collect()[0]
        assert row["text_dedup"] == "a\n\nb" and row["n_paras"] == 2


class TestRepetitionTable:
    def test_duplicate_lines(self, spark):
        df = spark.createDataFrame(
            [(1, "dup\ndup\nunique line here")], ["id", "text"])
        row = repetition_table(df, "id", "text").collect()[0]
        assert row["n_lines"] == 3
        assert row["dup_line_frac"] == pytest.approx(2 / 3)
        # dup chars 6 of 6+16=22
        assert row["dup_line_char_frac"] == pytest.approx(6 / 22)

    def test_top_2gram(self, spark):
        df = spark.createDataFrame([(1, "go go go stop")], ["id", "text"])
        row = repetition_table(df, "id", "text").collect()[0]
        assert row["top_2gram"] == "go go"
        # "go go" occurs twice, covers 2*4=8 word chars of 2+2+2+4=10
        assert row["top_2gram_frac"] == pytest.approx(8 / 10)

    def test_empty_text(self, spark):
        df = spark.createDataFrame([(1, "")], ["id", "text"])
        row = repetition_table(df, "id", "text").collect()[0]
        assert row["n_lines"] == 0 and row["dup_line_frac"] == 0.0
        assert row["top_2gram"] == "" and row["top_2gram_frac"] == 0.0


class TestNormalizeUrl:
    CASES = [
        ("HTTPS://WWW.Ex.COM/Path?utm_source=a&q=1&utm_x=2#frag",
         "https://www.ex.com/Path?q=1"),
        ("http://A.B/p/", "http://a.b/p"),
        ("https://ex.com/?utm_a=1", "https://ex.com"),
        ("https://ex.com/a?gclid=z&fbclid=y&keep=2",
         "https://ex.com/a?keep=2"),
        ("https://ex.com/a", "https://ex.com/a"),
    ]

    def test_cases(self, spark):
        df = spark.createDataFrame(
            [(i, u) for i, (u, _) in enumerate(self.CASES)], ["i", "u"])
        got = {r["i"]: r["n"] for r in
               df.select("i", normalize_url("u").alias("n")).collect()}
        for i, (_, want) in enumerate(self.CASES):
            assert got[i] == want, self.CASES[i]


class TestDecontaminate:
    def test_flags_docs_quoting_benchmark(self, spark):
        from lexoid_spark.functions.curation import decontaminate

        bench = spark.createDataFrame(
            [("the quick brown fox jumps over the lazy dog tonight",)],
            ["text"])
        docs = spark.createDataFrame(
            [(1, "intro words then the quick brown fox jumps over the "
                 "lazy dog tonight and more"),
             (2, "completely unrelated text with no overlap at all here"),
             (3, "the quick brown fox but then it diverges entirely "
                 "from the benchmark wording")],
            ["id", "text"])
        flagged = {r["id"] for r in
                   decontaminate(docs, bench, "id", "text", n=10).collect()}
        assert flagged == {1}

    def test_short_benchmark_full_text_rule(self, spark):
        from lexoid_spark.functions.curation import decontaminate

        bench = spark.createDataFrame([("secret eval answer",)], ["text"])
        docs = spark.createDataFrame(
            [(1, "secret eval answer"), (2, "secret eval question")],
            ["id", "text"])
        flagged = {r["id"] for r in
                   decontaminate(docs, bench, "id", "text", n=13).collect()}
        assert flagged == {1}


class TestStratifiedSample:
    def test_rate_bounds_and_determinism(self, spark):
        df = spark.createDataFrame(
            [(i, "en" if i % 2 == 0 else "de") for i in range(400)],
            ["id", "lang"])
        full = stratified_sample(df, "id", "lang", {"en": 1.0, "de": 0.0})
        rows = full.collect()
        assert all(r["lang"] == "en" for r in rows)
        assert len(rows) == 200
        half = stratified_sample(df, "id", "lang", {"en": 0.5, "de": 0.5})
        n1, n2 = half.count(), half.count()
        assert n1 == n2  # deterministic, no RNG
        assert 120 <= n1 <= 280  # ~200 expected

    def test_default_rate(self, spark):
        df = spark.createDataFrame([(i, "xx") for i in range(100)],
                                   ["id", "lang"])
        assert stratified_sample(df, "id", "lang", {}, 1.0).count() == 100
        assert stratified_sample(df, "id", "lang", {}, 0.0).count() == 0


class TestChunking:
    def test_char_windows_cover_and_overlap(self, spark):
        from lexoid_spark.functions.curation import chunk_by_chars

        text = "abcdefghijklmnopqrstuvwxyz"  # 26 chars
        df = spark.createDataFrame([(1, text)], ["id", "text"])
        rows = sorted(chunk_by_chars(df, "id", "text", 10, 4).collect(),
                      key=lambda r: r["chunk_id"])
        chunks = [r["chunk"] for r in rows]
        assert chunks == ["abcdefghij", "ghijklmnop", "mnopqrstuv",
                          "stuvwxyz", "yz"]
        # reconstruction: drop each chunk's overlap prefix after the first
        rebuilt = chunks[0] + "".join(c[4:] for c in chunks[1:])
        assert rebuilt == text

    def test_token_windows(self, spark):
        from lexoid_spark.functions.curation import chunk_by_tokens

        text = " ".join(f"w{i}" for i in range(10))
        df = spark.createDataFrame([(1, text)], ["id", "text"])
        rows = sorted(chunk_by_tokens(df, "id", "text", 4, 1).collect(),
                      key=lambda r: r["chunk_id"])
        assert [r["chunk"] for r in rows] == [
            "w0 w1 w2 w3", "w3 w4 w5 w6", "w6 w7 w8 w9", "w9"]
        assert [r["n_tokens"] for r in rows] == [4, 4, 4, 1]

    def test_empty_text_single_empty_chunk(self, spark):
        from lexoid_spark.functions.curation import chunk_by_tokens

        df = spark.createDataFrame([(1, "")], ["id", "text"])
        rows = chunk_by_tokens(df, "id", "text", 4).collect()
        assert len(rows) == 1 and rows[0]["chunk"] == ""

    def test_overlap_validation(self, spark):
        from lexoid_spark.functions.curation import chunk_by_chars

        df = spark.createDataFrame([(1, "x")], ["id", "text"])
        with pytest.raises(ValueError):
            chunk_by_chars(df, "id", "text", 5, 5)


class TestRebalanceMixture:
    def test_downsamples_overrepresented_stratum(self, spark):
        from lexoid_spark.functions.curation import rebalance_mixture

        # 90% of weight in "big", 10% in "small"; target 50/50
        rows = [(i, "big", 10) for i in range(900)]
        rows += [(900 + i, "small", 10) for i in range(100)]
        df = spark.createDataFrame(rows, "id long, s string, w long")
        kept = rebalance_mixture(
            df, "id", "s", "w", {"big": 5000, "small": 5000}
        )
        by = {r["s"]: r["n"] for r in
              kept.groupBy("s").agg(F.count("*").alias("n")).collect()}
        # small is under target → keeps all; big halves-ish (hash noise)
        assert by["small"] == 100
        assert 400 <= by["big"] <= 600

    def test_deterministic(self, spark):
        from lexoid_spark.functions.curation import rebalance_mixture

        df = spark.createDataFrame(
            [(i, "a" if i % 3 else "b", 5) for i in range(300)],
            "id long, s string, w long")
        a = sorted(r["id"] for r in rebalance_mixture(
            df, "id", "s", "w", {"a": 3000, "b": 7000}).collect())
        b = sorted(r["id"] for r in rebalance_mixture(
            df, "id", "s", "w", {"a": 3000, "b": 7000}).collect())
        assert a == b


class TestPackedBins:
    def test_bins_match_sequential_cumsum(self, spark):
        data = [(i, (i * 37) % 90 + 10) for i in range(200)]
        df = spark.createDataFrame(data, ["id", "nt"])
        got = {r["id"]: r["bin"] for r in
               packed_bins(df, "id", "nt", 512, num_parts=7).collect()}
        cum = 0
        for i, nt in data:
            assert got[i] == cum // 512, f"id {i}"
            cum += nt

    def test_partition_count_invariance(self, spark):
        data = [(i, 100) for i in range(50)]
        df = spark.createDataFrame(data, ["id", "nt"])
        a = sorted(packed_bins(df, "id", "nt", 256, num_parts=2).collect())
        b = sorted(packed_bins(df, "id", "nt", 256, num_parts=13).collect())
        assert a == b


class TestCountMinSketch:
    def test_estimate_never_undercounts_and_absent_small(self, spark):
        from lexoid_spark.functions.textstats import (
            cms_estimate,
            count_min_sketch,
        )

        df = spark.createDataFrame(
            [(i, "alpha beta " * (i % 3 + 1) + "gamma") for i in range(50)],
            "id long, text string")
        sk = count_min_sketch(df, "text", depth=4, width=64)
        est = {r["tok"]: r["est"] for r in cms_estimate(
            sk, ["alpha", "gamma", "absent"], depth=4, width=64).collect()}
        n_alpha = sum(i % 3 + 1 for i in range(50))
        assert est["alpha"] >= n_alpha       # CMS never undercounts
        assert est["gamma"] >= 50
        assert est["absent"] <= est["alpha"]  # collision bound, small

    def test_sketch_is_mergeable(self, spark):
        from pyspark.sql import functions as F
        from lexoid_spark.functions.textstats import (
            cms_estimate,
            count_min_sketch,
        )

        a = spark.createDataFrame([(1, "x y z")], "id long, text string")
        b = spark.createDataFrame([(2, "x x w")], "id long, text string")
        both = a.unionByName(b)
        merged = (
            count_min_sketch(a, "text").unionByName(
                count_min_sketch(b, "text"))
            .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))
        )
        direct = count_min_sketch(both, "text")
        ma = sorted(map(tuple, merged.collect()))
        da = sorted(map(tuple, direct.collect()))
        assert ma == da  # cell-wise addition == sketch of the union


class TestBloomFilter:
    def test_no_false_negatives(self, spark):
        from lexoid_spark.functions.textstats import (
            bloom_build,
            bloom_probe,
        )

        seen = spark.createDataFrame(
            [(f"key{i}",) for i in range(100)], ["k"])
        bloom = bloom_build(seen, "k", n_hashes=4, n_bits=2048)
        probes = spark.createDataFrame(
            [(f"key{i}",) for i in range(150)], ["k"])
        res = {r["key"]: r["maybe_present"] for r in
               bloom_probe(bloom, probes, "k", n_hashes=4,
                           n_bits=2048).collect()}
        for i in range(100):
            assert res[f"key{i}"]  # NEVER a false negative
        fps = sum(res[f"key{i}"] for i in range(100, 150))
        assert fps <= 10  # 4 hashes / 2048 bits / 100 keys → tiny FP rate

    def test_mergeable(self, spark):
        from lexoid_spark.functions.textstats import bloom_build

        a = spark.createDataFrame([("x",), ("y",)], ["k"])
        b = spark.createDataFrame([("y",), ("z",)], ["k"])
        both = a.unionByName(b)
        merged = bloom_build(a, "k").unionByName(
            bloom_build(b, "k")).distinct()
        direct = bloom_build(both, "k")
        assert sorted(r["bit"] for r in merged.collect()) == \
            sorted(r["bit"] for r in direct.collect())


class TestHyperLogLog:
    def test_estimate_accuracy(self, spark):
        from lexoid_spark.functions.textstats import (
            hll_estimate,
            hll_registers,
        )

        n = 5000
        df = spark.createDataFrame(
            [(f"unique-key-{i}",) for i in range(n)], ["k"])
        regs = hll_registers(df, "k", n_buckets=256)
        est = hll_estimate(regs, n_buckets=256)
        assert abs(est - n) / n < 0.15  # ~1.04/sqrt(256) = 6.5% stderr

    def test_merge_is_cellwise_max(self, spark):
        from pyspark.sql import functions as F
        from lexoid_spark.functions.textstats import hll_registers

        a = spark.createDataFrame([(f"a{i}",) for i in range(200)], ["k"])
        b = spark.createDataFrame([(f"b{i}",) for i in range(200)], ["k"])
        merged = (
            hll_registers(a, "k").unionByName(hll_registers(b, "k"))
            .groupBy("bucket").agg(F.max("max_rho").alias("max_rho"))
        )
        direct = hll_registers(a.unionByName(b), "k")
        assert sorted(map(tuple, merged.collect())) == \
            sorted(map(tuple, direct.collect()))


class TestCharlmFamiliarity:
    def test_scores_orderable_and_exact(self, spark):
        from lexoid_spark.functions.curation import charlm_familiarity

        rows = [
            (0, "the cat sat on the mat", "en"),
            (1, "the cat sat on the hat", "en"),
            (2, "zq xv jk qq zz", "en"),       # unusual bigrams
            (3, "der hund lief schnell", "de"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        got = {r["doc_id"]: r for r in
               charlm_familiarity(df, "doc_id", "text", "lang").collect()}
        assert set(got) == {0, 1, 2, 3}
        # the common-English docs score far above the junk doc
        assert got[0]["familiarity"] > got[2]["familiarity"]
        assert got[1]["familiarity"] > got[2]["familiarity"]
        # n_bigrams = len(text) - 1
        for i, (_, txt, _l) in ((r[0], r) for r in rows):
            assert got[i]["n_bigrams"] == len(txt) - 1

    def test_short_text_excluded(self, spark):
        from lexoid_spark.functions.curation import charlm_familiarity

        df = spark.createDataFrame(
            [(0, "x", "en"), (1, "long enough text", "en")],
            "doc_id long, text string, lang string")
        ids = {r["doc_id"] for r in
               charlm_familiarity(df, "doc_id", "text", "lang").collect()}
        assert ids == {1}  # 1-char doc has no bigrams -> no score row


class TestC4LineFilter:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, text string")

    def test_line_rules(self, spark):
        from lexoid_spark.functions.curation import c4_line_filter

        page = "\n".join([
            "this line ends with a terminal period.",     # kept
            "this one has no terminal punctuation at all",  # dropped
            "short line.",                                  # dropped <5 words
            "please enable Javascript to view content.",    # dropped js
            'a quoted line with five words here"',          # kept
            "does this question line survive the filter?",  # kept
        ])
        out = c4_line_filter(self._df(spark, [(1, page)]), "id", "text")
        r = out.collect()[0]
        assert r["n_lines"] == 6 and r["n_kept"] == 3
        assert "Javascript" not in r["text_clean"]
        assert r["text_clean"].count("\n") == 2

    def test_page_rules(self, spark):
        from lexoid_spark.functions.curation import c4_line_filter

        good = "\n".join(
            [f"good line number {i} has enough words here." for i in range(4)]
        )
        rows = [
            (1, good),
            (2, good + "\nsome Lorem Ipsum placeholder."),   # page drop
            (3, good + "\nfunction f() { return 1; }"),      # brace drop
            (4, "only one surviving line is not enough here."),  # < 3 lines
        ]
        ids = {r["id"] for r in
               c4_line_filter(self._df(spark, rows), "id", "text").collect()}
        assert ids == {1}


class TestDsirWeights:
    def test_exact_ratio(self, spark):
        from pyspark.sql import functions as F

        from lexoid_spark.functions.curation import dsir_weights

        # 2 target docs + 1 raw-only doc over a tiny vocabulary.
        rows = [(0, "aa bb", "en"), (1, "aa aa", "en"), (2, "aa cc", "de")]
        df = spark.createDataFrame(rows, "id long, text string, lang string")
        out = {r["id"]: r for r in
               dsir_weights(df, "id", "text", F.col("lang") == "en",
                            n_buckets=1024).collect()}
        # corpus counts: aa=4 bb=1 cc=1; target counts: aa=3 bb=1
        # (bucket collisions impossible to rule out a priori, but with
        # 3 distinct words in 1024 buckets a collision would break the
        # hand numbers below loudly, not silently)
        assert out[0]["sum_t"] == 3 + 1 and out[0]["sum_r"] == 4 + 1
        assert out[1]["sum_t"] == 6 and out[1]["sum_r"] == 8
        assert out[2]["sum_t"] == 3 + 0 and out[2]["sum_r"] == 4 + 1
        assert out[1]["importance"] == 0.75
        assert out[0]["importance"] == 0.8
        assert out[2]["importance"] == 0.6

    def test_empty_text_excluded(self, spark):
        from pyspark.sql import functions as F

        from lexoid_spark.functions.curation import dsir_weights

        df = spark.createDataFrame(
            [(0, "  ", "en"), (1, "word", "en")],
            "id long, text string, lang string")
        ids = {r["id"] for r in
               dsir_weights(df, "id", "text",
                            F.col("lang") == "en").collect()}
        assert ids == {1}


class TestUnimax:
    def _alloc(self, spark, caps, pct):
        from lexoid_spark.functions.curation import unimax_allocation

        rows = [(f"{s}-{i}", s) for s, c in caps.items() for i in range(c)]
        df = spark.createDataFrame(rows, "id string, stratum string")
        return {r["stratum"]: (r["cap"], r["alloc"]) for r in
                unimax_allocation(df, "id", "stratum",
                                  budget_pct=pct).collect()}

    def test_waterfill_mixed(self, spark):
        # caps 64/70/73/75/218 at 80% budget (B=400): the four small
        # strata are fully taken, the big one gets the remaining 118.
        got = self._alloc(
            spark, {"fr": 64, "de": 70, "es": 73, "zh": 75, "en": 218}, 80)
        assert got == {"fr": (64, 64), "de": (70, 70), "es": (73, 73),
                       "zh": (75, 75), "en": (218, 118)}

    def test_uniform_when_budget_small(self, spark):
        # B = 500*45//100 = 225 -> nobody capped, share 45 each.
        got = self._alloc(
            spark, {"fr": 64, "de": 70, "es": 73, "zh": 75, "en": 218}, 45)
        assert all(a == 45 for _c, a in got.values())

    def test_remainder_distribution(self, spark):
        # caps 10/10/10, B = 30*90//100 = 27 -> share 9 each, rem 0;
        # caps 2/10/10, B = 22*90//100 = 19 -> a capped at 2,
        # share (19-2)//2 = 8 rem 1 -> first uncapped gets 9.
        got = self._alloc(spark, {"a": 2, "b": 10, "c": 10}, 90)
        assert got["a"] == (2, 2)
        assert sorted([got["b"][1], got["c"][1]]) == [8, 9]
        # +1 goes to the FIRST uncapped stratum in (cap, name) order
        assert got["b"][1] == 9

    def test_all_capped(self, spark):
        # 100% budget: everything fits, alloc == cap everywhere.
        got = self._alloc(spark, {"a": 3, "b": 5}, 100)
        assert got == {"a": (3, 3), "b": (5, 5)}

    def test_sample_counts_match_alloc(self, spark):
        from lexoid_spark.functions.curation import (
            unimax_allocation,
            unimax_sample,
        )

        rows = [(s * 100 + i, lang)
                for s, (lang, c) in enumerate([("en", 40), ("de", 7)])
                for i in range(c)]
        df = spark.createDataFrame(rows, "id long, lang string")
        alloc = {r["stratum"]: r["alloc"] for r in
                 unimax_allocation(df, "id", "lang", 50).collect()}
        picked = unimax_sample(df, "id", "lang", 50).collect()
        by_lang = {}
        for r in picked:
            by_lang[r["stratum"]] = by_lang.get(r["stratum"], 0) + 1
        assert by_lang == {k: v for k, v in alloc.items() if v}
        # deterministic across runs
        again = unimax_sample(df, "id", "lang", 50).collect()
        assert sorted(map(tuple, picked)) == sorted(map(tuple, again))


class TestSemDedupKeepers:
    def test_dominated_by_lower_id(self, spark):
        from lexoid_spark.functions.similarity import semdedup_keepers

        # dominance policy: drop anything within tau of a lower id;
        # two tight clusters of near-identical vectors + one outlier;
        # n_centroids=2 -> centroids are vec 0 and 1 (first ids).
        rows = [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (2, [0.999, 0.01, 0.0]),   # dup of 0
            (3, [0.0, 0.998, 0.02]),   # dup of 1
            (4, [0.0, 0.6, 0.8]),      # same cluster as 1, not a dup
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        kept = {r["vec_id"] for r in
                semdedup_keepers(df, tau=0.95, n_centroids=2).collect()}
        assert kept == {0, 1, 4}


class TestSemDedupGreedy:
    def test_chain_keeps_first_and_third(self, spark):
        """The policy divergence case: a~b~c chain (cos(a,c) < tau).
        Greedy keep-first keeps {a, c}; the dominance policy keeps
        only {a}."""
        import math

        from lexoid_spark.functions.similarity import (
            semdedup_keepers,
            semdedup_keepers_greedy,
        )

        def at(deg):
            r = math.radians(deg)
            return [math.cos(r), math.sin(r), 0.0]

        # cos(25°)=0.906 >= tau, cos(50°)=0.643 < tau at tau=0.87
        rows = [(0, at(0)), (1, at(25)), (2, at(50))]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        greedy = {r["vec_id"] for r in semdedup_keepers_greedy(
            df, tau=0.87, n_centroids=1).collect()}
        dom = {r["vec_id"] for r in semdedup_keepers(
            df, tau=0.87, n_centroids=1).collect()}
        assert greedy == {0, 2}
        assert dom == {0}

    def test_matches_sequential_scan(self, spark):
        """Round-based MIS == the literal sequential greedy scan over
        the same pair set, on a seeded random corpus."""
        import random

        from lexoid_spark.functions.similarity import (
            embedding_near_dup_pairs,
            semdedup_keepers_greedy,
        )

        rng = random.Random(7)
        rows = [(i, [rng.uniform(-1, 1) for _ in range(4)])
                for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        pairs = {(r["id_a"], r["id_b"]) for r in embedding_near_dup_pairs(
            df, tau=0.8, n_centroids=4).collect()}
        kept_ref = set()
        for i in range(40):  # the paper's scan: drop iff near a KEPT lower id
            if not any((a, i) in pairs for a in kept_ref):
                kept_ref.add(i)
        got = {r["vec_id"] for r in semdedup_keepers_greedy(
            df, tau=0.8, n_centroids=4).collect()}
        assert got == kept_ref

    def test_empty_input(self, spark):
        from lexoid_spark.functions.similarity import semdedup_keepers_greedy

        df = spark.createDataFrame([], "vec_id long, embedding array<float>")
        assert semdedup_keepers_greedy(df, tau=0.9).count() == 0


class TestDuplicateSpanRemoval:
    def test_cross_doc_spans_removed(self, spark):
        from lexoid_spark.functions.curation import duplicate_span_removal

        shared = "one two three four five six seven eight"  # 8 words
        rows = [
            (0, shared + " alpha beta gamma"),
            (1, shared + " delta epsilon zeta"),
            (2, "totally different words that never repeat anywhere else"),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {r["id"]: r for r in
               duplicate_span_removal(df, "id", "text", n=8).collect()}
        # the shared 8-gram occurs in docs 0 and 1 -> removed from both
        assert got[0]["text_clean"] == "alpha beta gamma"
        assert got[1]["text_clean"] == "delta epsilon zeta"
        assert got[0]["n_dup_starts"] == 1 and got[1]["n_dup_starts"] == 1
        # doc 2 untouched
        assert got[2]["text_clean"] == rows[2][1]
        assert got[2]["n_dup_starts"] == 0

    def test_within_doc_repeat_not_removed(self, spark):
        from lexoid_spark.functions.curation import duplicate_span_removal

        # the same 8-gram twice in ONE doc: count(DISTINCT id) == 1,
        # so nothing is removed (within-doc repetition is Gopher's job)
        span = "a b c d e f g h"
        df = spark.createDataFrame([(0, span + " x " + span)],
                                   "id long, text string")
        r = duplicate_span_removal(df, "id", "text", n=8).collect()[0]
        assert r["n_dup_starts"] == 0
        assert r["text_clean"] == span + " x " + span

    def test_overlapping_spans_merge(self, spark):
        from lexoid_spark.functions.curation import duplicate_span_removal

        # 9 shared words -> two overlapping dup 8-grams; coverage is
        # the union, so all 9 go and the unique tail stays
        shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9"
        df = spark.createDataFrame(
            [(0, shared + " unique0 tail0"), (1, shared + " unique1 tail1")],
            "id long, text string")
        got = {r["id"]: r for r in
               duplicate_span_removal(df, "id", "text", n=8).collect()}
        assert got[0]["text_clean"] == "unique0 tail0"
        assert got[0]["n_dup_starts"] == 2


class TestCharSpanRemoval:
    def test_matches_python_reference(self, spark):
        """Exhaustive check vs a brute-force char-window reference,
        including boundary-crossing punctuation, a fully-duplicated
        doc, and sub-window docs."""
        from lexoid_spark.functions.curation import char_span_removal

        W = 40
        shared = "©nav?id=1&s=2|header—menu::links;contact/about"
        rows = [
            (0, "aaa " + shared + " unique tail zero"),
            (1, "bbb prefix " + shared + " unique tail one"),
            (2, "totally unique document with no duplicated spans xyzzy"),
            (3, "short"),
            (4, shared),  # entirely duplicated → empty clean text
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {r["id"]: r for r in
               char_span_removal(df, "id", "text", w=W).collect()}

        from collections import defaultdict
        windows = defaultdict(set)
        for i, t in rows:
            for p in range(len(t) - W + 1):
                windows[t[p:p + W]].add(i)
        dup = {g for g, ids in windows.items() if len(ids) >= 2}
        for i, t in rows:
            starts = [p for p in range(max(0, len(t) - W + 1))
                      if len(t) >= W and t[p:p + W] in dup]
            covered = set()
            for s in starts:
                covered.update(range(s, s + W))
            clean = "".join(c for k, c in enumerate(t) if k not in covered)
            assert got[i]["n_chars"] == len(t)
            assert got[i]["n_dup_starts"] == len(starts)
            assert got[i]["text_clean"] == clean, (i, got[i]["text_clean"])
        assert got[4]["text_clean"] == ""  # the all-dup doc is emptied

    def test_word_variant_misses_punctuation_span_char_catches(self, spark):
        """The motivating delta: a duplicated span with NO spaces is
        invisible to word 8-grams but removed by char windows."""
        from lexoid_spark.functions.curation import (
            char_span_removal, duplicate_span_removal)

        blob = "x" * 20 + "::" + "y" * 20  # 42 chars, one 'word'
        rows = [(0, "left " + blob + " right0"),
                (1, "open " + blob + " right1")]
        df = spark.createDataFrame(rows, "id long, text string")
        wr = {r["id"]: r for r in
              duplicate_span_removal(df, "id", "text", n=8).collect()}
        assert wr[0]["n_dup_starts"] == 0  # word-gram variant blind
        cr = {r["id"]: r for r in
              char_span_removal(df, "id", "text", w=40).collect()}
        assert cr[0]["n_dup_starts"] > 0
        assert blob not in cr[0]["text_clean"]


class TestTfidfInverted:
    def test_tfidf_ranks(self, spark):
        from lexoid_spark.functions.textstats import tfidf_topk

        rows = [(0, "apple apple banana"), (1, "banana cherry"),
                (2, "cherry cherry cherry durian")]
        df = spark.createDataFrame(rows, "id long, text string")
        out = tfidf_topk(df, "id", "text", k=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["id"], []).append(r)
        # doc 0: apple tf=2 df=1 -> 2*3e6; banana tf=1 df=2 -> 1.5e6
        top0 = sorted(by_doc[0], key=lambda r: r["rank"])
        assert top0[0]["term"] == "apple"
        assert top0[0]["score_micros"] == 2 * 3_000_000
        assert top0[1]["term"] == "banana"
        assert top0[1]["score_micros"] == 1_500_000
        # doc 2: cherry tf=3 df=2 -> 4.5e6 beats durian 3e6
        top2 = sorted(by_doc[2], key=lambda r: r["rank"])
        assert [r["term"] for r in top2] == ["cherry", "durian"]

    def test_inverted_postings_capped(self, spark):
        from lexoid_spark.functions.textstats import inverted_postings

        df = spark.createDataFrame(
            [(i, "stopword unique%d" % i) for i in range(30)],
            "id long, text string")
        got = {r["term"]: r for r in
               inverted_postings(df, "id", "text",
                                 max_postings=5).collect()}
        # df stays exact; posting list caps at 5 sorted ids
        assert got["stopword"]["df"] == 30
        assert got["stopword"]["postings"] == "0,1,2,3,4"
        assert got["unique7"]["df"] == 1
        assert got["unique7"]["postings"] == "7"


class TestAnchorTextIndex:
    def test_aggregates_and_caps(self, spark):
        from lexoid_spark.functions.columns import anchor_text_index

        rows = [
            (0, "see [home page](http://x.test/) and [docs](http://x.test/d)"),
            (1, "go [homepage](http://x.test/) now"),
            (2, "again [home page](http://x.test/) twice "
                "[home page](http://x.test/)"),
            (3, "no links here"),
        ]
        df = spark.createDataFrame(rows, "id long, md string")
        got = {r["url"]: r for r in
               anchor_text_index(df, "id", "md", max_anchors=2).collect()}
        root = got["http://x.test/"]
        assert root["n_refs"] == 4 and root["n_docs"] == 3
        # distinct anchors sorted, capped at 2
        assert root["anchors"] == "home page|homepage"
        assert got["http://x.test/d"]["n_refs"] == 1
        assert "no links here" not in got


class TestLinearQualityClassifier:
    def test_closed_form_weights(self, spark):
        """Stand-in weights reproduce the documented formula exactly;
        integer sums, one final division."""
        import hashlib

        from lexoid_spark.functions.curation import (
            linear_quality_classifier,
        )

        rows = [(1, "alpha beta gamma"), (2, ""), (3, "zz zz")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r.asDict() for r in
               linear_quality_classifier(df, "doc_id", "text").collect()}

        def w(tok):
            h = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            return ((h % 1024) * 37 + 11) % 201 - 100

        for did, text in rows:
            toks = text.split()
            sw = sum(w(t) for t in toks)
            assert got[did]["n_toks"] == len(toks)
            assert got[did]["sum_w"] == sw
            exp_score = sw / len(toks) if toks else 0.0
            assert got[did]["score"] == exp_score
            assert got[did]["keep"] == (exp_score >= 0)

    def test_custom_weights_broadcast_table(self, spark):
        from lexoid_spark.functions.curation import (
            linear_quality_classifier,
        )

        df = spark.createDataFrame(
            [(1, "x y"), (2, "x")], "doc_id long, text string")
        # all buckets weight -1 -> every non-empty doc drops
        out = {r["doc_id"]: r["keep"] for r in linear_quality_classifier(
            df, "doc_id", "text", n_buckets=4,
            weights={b: -1 for b in range(4)}).collect()}
        assert out == {1: False, 2: False}


class TestCharSpanWinnow:
    def test_matches_python_reference(self, spark):
        """Exhaustive check vs a brute-force winnowing reference:
        stride-1 window hashes (double 32-bit polynomial, Horner mod
        2^32 — the oracle-mirrorable hash), rightmost-minimal
        selection per k-run, duplicated SELECTED fingerprints mask
        their windows."""
        from lexoid_spark.functions.curation import (
            WINNOW_B1, WINNOW_B2, char_span_removal_winnow)

        W, K = 20, 4
        shared = "the quick brown fox jumps over the lazy dog!"
        rows = [
            (0, "aaa " + shared + " unique tail zero"),
            (1, "bbb prefix " + shared + " unique tail one"),
            (2, "totally unique document with no duplicated spans xy"),
            (3, "short"),
            (4, ""),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {r["id"]: r for r in char_span_removal_winnow(
            df, "id", "text", w=W, k=K).collect()}

        def h64(s):
            a = b = 0
            for ch in s:
                a = (a * WINNOW_B1 + ord(ch)) % 2 ** 32
                b = (b * WINNOW_B2 + ord(ch)) % 2 ** 32
            return (a % 2 ** 31) * 2 ** 32 + b

        def selected(t):
            n = len(t) - W + 1
            if n < K:
                return []
            H = [h64(t[p:p + W]) for p in range(n)]
            sel = set()
            for tt in range(n - K + 1):
                win = H[tt:tt + K]
                m = min(win)
                sel.add(tt + max(j for j, x in enumerate(win) if x == m))
            return sorted(sel)

        fps = {}
        for i, t in rows:
            fps[i] = {(p, t[p:p + W]) for p in selected(t)}
        from collections import defaultdict
        by_g = defaultdict(set)
        for i, s in fps.items():
            for _p, g in s:
                by_g[g].add(i)
        dup = {g for g, ids in by_g.items() if len(ids) >= 2}
        for i, t in rows:
            starts = sorted(p for p, g in fps[i] if g in dup)
            covered = set()
            for s in starts:
                covered.update(range(s, s + W))
            clean = "".join(c for p, c in enumerate(t) if p not in covered)
            assert got[i]["n_chars"] == len(t)
            assert got[i]["n_dup_starts"] == len(starts), i
            assert got[i]["text_clean"] == clean, (i, got[i]["text_clean"])

    def test_long_spans_always_detected(self, spark):
        """The winnowing guarantee: every duplicated span of at least
        w + k - 1 chars is detected (some selected window inside it
        fingerprints identically in both copies)."""
        from lexoid_spark.functions.curation import char_span_removal_winnow

        W, K = 20, 4
        span = "Z" * 0 + "shared-span:0123456789abcdefghijklmnop"  # 38 >= 23
        rows = [(0, "docA " + span + " tailA"),
                (1, "docB prefix " + span + " tailB"),
                (2, "unrelated content entirely its own here ok")]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {r["id"]: r for r in char_span_removal_winnow(
            df, "id", "text", w=W, k=K).collect()}
        assert got[0]["n_dup_starts"] > 0
        assert got[1]["n_dup_starts"] > 0
        assert got[2]["n_dup_starts"] == 0

    def test_selection_density_drops_explode_volume(self, spark):
        """The point of winnowing: far fewer fingerprints than the
        exact variant's one-per-char (expected density 2/(k+1))."""
        from lexoid_spark.functions.curation import char_span_removal_winnow

        text = "the quick brown fox jumps over the lazy dog " * 8
        rows = [(0, text + "zero"), (1, text + "one")]
        df = spark.createDataFrame(rows, "id long, text string")
        out = {r["id"]: r for r in char_span_removal_winnow(
            df, "id", "text", w=40, k=8).collect()}
        n_wins = len(text + "zero") - 40 + 1
        # selected duplicated fingerprints are a small fraction of
        # the stride-1 windows (2/(k+1) ~ 0.22 expected)
        assert 0 < out[0]["n_dup_starts"] < 0.5 * n_wins
