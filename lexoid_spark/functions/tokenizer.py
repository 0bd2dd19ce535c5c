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
  * the rewrite itself is pure higher-order functions (mark + filter
    + transform), no Python in the data path.

Greedy-scan correctness without a sequential scan: self pairs
(``a == b``) are EXCLUDED from candidates, because for ``a != b`` two
matches can never overlap (a match at ``i`` and ``i+1`` would force
``a == b``), so marking every match independently and dropping the
following position reproduces the left-to-right scan exactly — a
relational mark can't express the order-dependent self-pair case, so
it is out of scope by construction (documented, deterministic).
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
            .filter(F.col("a") != F.col("b"))
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

        def mark(i):
            return (
                (i <= F.size(F.col("t")) - 1)
                & (F.element_at(F.col("t"), i) == F.col("ma"))
                & (F.element_at(F.col("t"), i + 1) == F.col("mb"))
            )

        new_t = F.when(
            F.size("t") > 0,
            F.transform(
                F.filter(
                    F.sequence(F.lit(1), F.size("t")),
                    lambda i: (i == F.lit(1)) | ~mark(i - 1),
                ),
                lambda i: F.when(mark(i), F.col("mm")).otherwise(
                    F.element_at(F.col("t"), i)
                ),
            ),
        ).otherwise(_empty_str_array())
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
