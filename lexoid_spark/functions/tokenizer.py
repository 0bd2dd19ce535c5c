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
  * the rewrite is ONE higher-order left fold (``F.aggregate``) that
    IS the greedy scan — no Python in the data path.

Greedy-scan correctness including self pairs (``a == b``): the fold
walks the token array left to right, merging the current token into
the accumulator's tail exactly when the tail equals ``a`` and the
current token equals ``b``. Because the merged token ``a_b`` differs
from ``a``, a run ``x x x x`` under merge ``(x, x)`` folds to
``x_x x_x`` — the non-overlapping left-to-right pairing real BPE
produces — which the round-3 relational mark could not express (it
was documented as excluding self pairs; that exclusion is gone).
The fold is sequential WITHIN a row but stays whole-stage-codegen'd
and map-only across rows — the same cost class as the transform it
replaces.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lexoid_spark.functions.textstats import tokens


def _empty_str_array() -> Column:
    return F.array().cast("array<string>")


def phrase_merges(df: DataFrame, id_col: str, text_col: str,
                  n_merges: int = 3, sep: str = "_",
                  checkpoint_every: int = 4) -> DataFrame:
    """Learn and apply ``n_merges`` corpus-wide adjacent-pair merges.

    Tie-break: (count desc, a asc, b asc) — deterministic and
    SQL-mirrorable. Returns ``(id, n_tokens_in, n_tokens_out,
    text_merged)``; the learned merges are also available on the
    returned DataFrame as ``.merges`` (list of (a, b, count)).

    Every ``checkpoint_every`` iterations the working frame is
    ``localCheckpoint``-ed (same lineage-truncation pattern as the
    connected-components loop in ``dedup.py``): each merge stacks a
    crossJoin + HOF rewrite on the plan, so a real BPE run (30k
    merges) would otherwise blow the analyzer. With truncation the
    live plan never holds more than ``checkpoint_every`` rewrite
    layers regardless of ``n_merges``."""
    spark = df.sparkSession
    base = df.select(
        F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t")
    )
    cur = base
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
        pairrow = spark.createDataFrame(
            [(a, b, a + sep + b)], "ma string, mb string, mm string"
        )

        # greedy left-to-right scan as a fold: merge the incoming
        # token into the accumulator tail when (tail, token) == (a, b);
        # the merged token a_b never re-matches a, so "x x x x" under
        # (x, x) pairs non-overlapping exactly like sequential BPE
        new_t = F.aggregate(
            F.col("t"),
            _empty_str_array(),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.col("ma"))
                & (x == F.col("mb")),
                F.concat(F.slice(acc, 1, F.size(acc) - 1),
                         F.array(F.col("mm"))),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        cur = cur.crossJoin(F.broadcast(pairrow)).select(
            "id", new_t.alias("t")
        )
        if checkpoint_every > 0 and (_step + 1) % checkpoint_every == 0:
            cur = cur.localCheckpoint(eager=True)

    out = (
        base.select("id", F.size("t").alias("n_tokens_in"))
        .join(
            cur.select(
                "id",
                F.size("t").alias("n_tokens_out"),
                F.array_join("t", " ").alias("text_merged"),
            ),
            "id",
        )
        .select(
            F.col("id").alias(id_col), "n_tokens_in", "n_tokens_out",
            "text_merged",
        )
    )
    out.merges = merges  # driver-side training artifact
    return out
