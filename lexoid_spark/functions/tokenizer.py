"""Corpus-driven tokenizer training shapes.

``phrase_merges`` is BPE's training loop at word level (the
word2phrase / "merge the most frequent adjacent pair, repeat" rule):
each iteration counts adjacent token pairs corpus-wide, picks the top
pair, and rewrites every occurrence into one merged token. It is the
canonical iterative-aggregation pattern a tokenizer-training pipeline
runs over a 100 TB corpus, expressed Spark-first:

  * pair counting is one explode + map-side-combinable groupBy —
    the heavy step, and it partially aggregates;
  * the winning pair is ONE control-plane row (same collect-then-
    broadcast pattern as the IVF centroids), re-joined as a one-row
    broadcast so the rewrite stays codegen'd columns, not
    per-iteration literal recompiles;
  * the rewrite is ONE ``regexp_replace`` over a delimiter-doubled
    join of the token array — no Python in the data path.

Greedy-scan correctness including self pairs (``a == b``): Java's
``replaceAll`` scans left to right and never re-matches inside a
replacement, which is EXACTLY sequential BPE's non-overlapping
pairing — a run ``x x x x`` under merge ``(x, x)`` becomes
``x_x x_x``. The only trick is the encoding: tokens are joined with
TWO spaces and the pattern claims one space from each side
(`` a  b ``  → `` a_b ``), so consecutive matches each still see
their boundary space without lookarounds. An earlier revision
expressed the same scan as an ``F.aggregate`` left fold; that is
O(n²) per row (the accumulator array is copied per element), while
the regex pass is O(n) — ~3x on the bench corpus at 6 merges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lexoid_spark.functions.textstats import tokens


def _rx_literal(tok: str) -> str:
    """Quote a corpus token for use inside a Java regex (\\Q...\\E,
    with embedded \\E split-escaped the way Pattern.quote does)."""
    return "\\Q" + tok.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def _rx_replacement(tok: str) -> str:
    """Quote a token for a Java replacement string ($ and \\ are
    live there — Matcher.quoteReplacement semantics)."""
    return tok.replace("\\", "\\\\").replace("$", "\\$")


def phrase_merges(df: DataFrame, id_col: str, text_col: str,
                  n_merges: int = 3, sep: str = "_",
                  checkpoint_every: int = 4,
                  sample_mod: int = 0) -> DataFrame:
    """Learn and apply ``n_merges`` corpus-wide adjacent-pair merges.

    Tie-break: (count desc, a asc, b asc) — deterministic and
    SQL-mirrorable. Returns ``(id, n_tokens_in, n_tokens_out,
    text_merged)``; the learned merges are also available on the
    returned DataFrame as ``.merges`` (list of (a, b, count)).

    ``sample_mod >= 2`` trains on the deterministic 1/sample_mod
    document subsample (md5-prefix hash of the id — the portable
    bucketing used throughout) and then applies ALL learned merges to
    the FULL corpus in ONE fused projection (a chain of greedy regex
    scans over the double-space encoding; the chain composes because
    each rewrite consumes one boundary space per side and re-emits
    it). This is how a real tokenizer trainer handles 100 TB — the
    iterated pair-count passes touch only the sample; the corpus is
    touched once — at the cost that merges reflect sample statistics.

    Every ``checkpoint_every`` iterations the working frame is
    ``localCheckpoint``-ed (same lineage-truncation pattern as the
    connected-components loop in ``dedup.py``): each merge stacks a
    crossJoin + regex rewrite on the plan, so a real BPE run (30k
    merges) would otherwise blow the analyzer. With truncation the
    live plan never holds more than ``checkpoint_every`` rewrite
    layers regardless of ``n_merges``."""
    if any(c.isspace() for c in sep):
        # the rewrite encodes token boundaries as TWO spaces; a sep
        # containing whitespace would corrupt that delimiter scheme in
        # later merge iterations (merged tokens must stay space-free)
        raise ValueError(f"sep must not contain whitespace: {sep!r}")
    spark = df.sparkSession
    # n_tokens_in rides the loop as a precomputed int column: deriving
    # it at the END via a join of the rewritten frame back onto the
    # source re-read + re-tokenized the whole corpus and paid a join
    # shuffle for one integer (guide §2.4: remove shuffles outright)
    base = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
    ).withColumn("n_in", F.size("t"))
    if sample_mod >= 2:
        from lexoid_spark.functions.dedup import _md5_hash64

        cur = base.filter(
            F.pmod(_md5_hash64(F.col("id").cast("string")),
                   F.lit(sample_mod)) == 0)
    else:
        cur = base
    # pin the TRAINING frame, fanned out to the session's shuffle
    # parallelism: every merge iteration launches a pair-count job
    # over `cur`, and an un-pinned base re-reads + re-tokenizes the
    # corpus per job on however few splits the input happens to have
    # (guide §2.4/§5 — one spill-backed materialization of the
    # tokenized sample against n_merges re-scans; the apply phase of
    # the sampled variant still streams the full corpus exactly once,
    # un-pinned). persist() is lazy: the FIRST pair-count job both
    # populates the cache and aggregates — no separate
    # materialization job, halving the loop's job count vs the eager
    # per-step checkpoint this replaces.
    n_fan = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    cur = cur.repartition(n_fan).persist()
    merges: list[tuple[str, str, int]] = []
    for _step in range(n_merges):
        pairs = (
            cur.select(
                F.explode(
                    F.when(
                        F.size("t") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("t") - 1),
                            lambda i: F.struct(
                                F.element_at(F.col("t"), i).alias("a"),
                                F.element_at(F.col("t"), i + 1).alias("b"),
                            ),
                        ),
                    ).otherwise(
                        F.array().cast(
                            "array<struct<a:string,b:string>>")
                    )
                ).alias("p")
            )
            .select("p.a", "p.b")
        )
        top = (
            pairs.groupBy("a", "b").agg(F.count("*").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, c = top[0]["a"], top[0]["b"], int(top[0]["c"])
        merges.append((a, b, c))
        # greedy left-to-right non-overlapping pairing IS Java
        # replaceAll's scan: encode the array with DOUBLE spaces so the
        # pattern ' a  b ' claims one boundary space from each side and
        # consecutive matches (self-pair runs) each still see theirs.
        # Pattern/replacement are plain STRING literals: scalar-string
        # Literal codegen goes through the references array, so the
        # generated class is value-independent and the codegen cache
        # hits across iterations (measured: 6-merge loop 2.77 s with
        # literals vs 3.89 s with a 1-slice broadcast row vs 5.00 s
        # with the former driver-parallelized broadcast row, whose
        # default-parallelism ParallelCollectionRDD cost a 32-task
        # Python job PER MERGE just to broadcast one row; the Janino
        # recompile hazard in the project notes is about literal
        # ARRAYS, not scalar strings).
        pat = " " + _rx_literal(a) + "  " + _rx_literal(b) + " "
        rep = " " + _rx_replacement(a + sep + b) + " "
        enc = F.concat(F.lit(" "), F.array_join("t", "  "), F.lit(" "))
        new_t = F.when(
            F.size("t") < 2, F.col("t")
        ).otherwise(
            F.split(F.trim(F.regexp_replace(enc, F.lit(pat),
                                            F.lit(rep))), "  ")
        )
        cur = cur.select("id", new_t.alias("t"), "n_in").persist()
        # each step's rewrite is persisted LAZILY: the next pair-count
        # (or the final output pass) materializes it in the same job
        # that consumes it — one job per merge instead of the former
        # count-job + eager-checkpoint pair, with recompute still
        # bounded to one rewrite layer. checkpoint_every now only
        # bounds the PLAN depth (a 30k-merge run would otherwise stack
        # 30k crossJoin layers onto the analyzer); recompute cost is
        # already flat from the per-step persist.
        if checkpoint_every > 0 and (_step + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)

    if sample_mod >= 2:
        # apply the learned merges to the FULL corpus in one fused
        # projection: the greedy rewrites compose directly on the
        # double-space encoding (each match consumes one boundary
        # space per side and re-emits it, so the invariant survives
        # the chain). Patterns/replacements are scalar string
        # literals — value-independent generated code per chain
        # LENGTH (see the training-loop note; this drops the former
        # broadcast-row join and its one-row Python parallelize job)
        if merges:
            enc = F.concat(F.lit(" "), F.array_join("t", "  "),
                           F.lit(" "))
            for a, b, _c in merges:
                enc = F.regexp_replace(
                    enc,
                    F.lit(" " + _rx_literal(a) + "  "
                          + _rx_literal(b) + " "),
                    F.lit(" " + _rx_replacement(a + sep + b) + " "))
            applied = F.when(
                F.size("t") < 2, F.col("t")
            ).otherwise(F.split(F.trim(enc), "  "))
            # the one full-corpus pass: fan the chained-regex apply
            # out to the session's parallelism — the raw scan's few
            # input splits would run the whole rewrite chain on that
            # many cores (same rationale as the training repartition)
            cur = base.repartition(n_fan).select(
                "id", applied.alias("t"), "n_in")
        else:
            cur = base

    out = cur.select(
        F.col("id").alias(id_col),
        F.col("n_in").alias("n_tokens_in"),
        F.size("t").alias("n_tokens_out"),
        F.array_join("t", " ").alias("text_merged"),
    )
    out.merges = merges  # driver-side training artifact
    return out
