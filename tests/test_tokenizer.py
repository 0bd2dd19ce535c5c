"""phrase_merges: BPE-style corpus merge training (word level)."""


class TestPhraseMerges:
    def test_learns_and_applies_top_pairs(self, spark):
        from lexoid_spark.functions.tokenizer import phrase_merges

        rows = [
            (0, "new york is a big city"),
            (1, "i love new york and new jersey"),
            (2, "york new is reversed new york here"),
            (3, ""),
            (4, "solo"),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        out = phrase_merges(df, "id", "text", n_merges=2)
        res = {r["id"]: r for r in out.collect()}
        # most frequent adjacent pair corpus-wide is (new, york) x3
        assert out.merges[0] == ("new", "york", 3)
        assert res[0]["text_merged"].startswith("new_york is")
        assert res[1]["text_merged"] == "i love new_york and new jersey"
        # order matters: "york new" is NOT the learned pair
        assert res[2]["text_merged"] == \
            "york new is reversed new_york here"
        # second merge is the deterministic (count, a, b) tie-break
        assert out.merges[1][2] == 1
        # degenerate docs survive
        assert res[3]["text_merged"] == "" and res[3]["n_tokens_out"] == 0
        assert res[4]["text_merged"] == "solo"

    def test_greedy_nonoverlap(self, spark):
        from lexoid_spark.functions.tokenizer import phrase_merges

        # a b a b: marks at 1 and 3 don't overlap -> both merge
        df = spark.createDataFrame(
            [(0, "a b a b"), (1, "a b a b")], "id long, text string")
        out = phrase_merges(df, "id", "text", n_merges=1)
        r = out.collect()[0]
        assert r["text_merged"] == "a_b a_b"
        assert r["n_tokens_in"] == 4 and r["n_tokens_out"] == 2

    def test_self_pairs_merge_greedily(self, spark):
        """Round-4 upgrade: self pairs are full citizens. 'x x'
        dominates by count and wins; runs pair NON-OVERLAPPING left to
        right exactly like a sequential BPE scan (the F.aggregate fold
        — the round-3 relational mark had to exclude this case)."""
        from lexoid_spark.functions.tokenizer import phrase_merges

        df = spark.createDataFrame(
            [(0, "x x x x x a b"), (1, "a b")], "id long, text string")
        out = phrase_merges(df, "id", "text", n_merges=1)
        assert out.merges[0][:2] == ("x", "x")
        got = {r["id"]: r["text_merged"] for r in out.collect()}
        # run of 5: two merges + one leftover, greedy from the left
        assert got[0] == "x_x x_x x a b"
        assert got[1] == "a b"

    def test_self_pair_run_parities(self, spark):
        from lexoid_spark.functions.tokenizer import phrase_merges

        rows = [(0, "x x x x y"), (1, "x x x y y x x"),
                (2, "x x x x x x")]
        df = spark.createDataFrame(rows, "id long, text string")
        out = phrase_merges(df, "id", "text", n_merges=1)
        assert out.merges[0][:2] == ("x", "x")
        got = {r["id"]: r["text_merged"] for r in out.collect()}
        assert got[0] == "x_x x_x y"
        assert got[1] == "x_x x y y x_x"
        assert got[2] == "x_x x_x x_x"

    def test_checkpoint_bounds_lineage(self, spark):
        """Lineage truncation: the live plan never holds more than
        checkpoint_every rewrite layers, whatever n_merges is — the
        30k-merge BPE shape. Results must be bit-identical with and
        without truncation."""
        from lexoid_spark.functions.tokenizer import phrase_merges

        rows = [(i, "a b c d a b c a b a e f g e f e") for i in range(6)]
        rows += [(6, "h i j h i h"), (7, "")]
        df = spark.createDataFrame(rows, "id long, text string")

        ck = phrase_merges(df, "id", "text", n_merges=6,
                           checkpoint_every=2)
        raw = phrase_merges(df, "id", "text", n_merges=6,
                            checkpoint_every=0)
        assert ck.merges == raw.merges
        assert sorted(map(tuple, ck.collect())) == \
            sorted(map(tuple, raw.collect()))

        # plan-size pin: without truncation 6 rewrite layers stack up;
        # with it the live plan starts from a checkpointed scan and the
        # analyzed tree is a fraction of the size
        def plan_len(out):
            return len(out._jdf.queryExecution().analyzed().toString())

        assert plan_len(ck) * 2 < plan_len(raw)

    def test_plan_pair_row_broadcast(self, spark):
        from lexoid_spark.functions.tokenizer import phrase_merges

        df = spark.createDataFrame(
            [(i, "p q r") for i in range(10)], "id long, text string")
        out = phrase_merges(df, "id", "text", n_merges=1)
        plan = out._sc._jvm.PythonSQLUtils.explainString(
            out._jdf.queryExecution(), "formatted")
        # the learned pair joins back as a one-row broadcast, never a
        # cartesian against the corpus
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" in plan
