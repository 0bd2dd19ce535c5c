"""Link-graph operators: PageRank over crawl edges.

The training-data analogue of Common Crawl's domain ranking: crawl
prioritization and per-domain quality priors both start from a rank
over the hyperlink graph that ``operators/crawl.py`` (J3) and
``functions/columns.extract_md_urls`` (F4/A8) produce.

Spark-first shape (the canonical iterative-DataFrame algorithm):

- one shuffle per iteration — contributions ``join`` on src +
  ``groupBy(dst)``, shipping only ``(node, double)`` pairs, never
  payloads;
- the edge+degree frame is built once and ``localCheckpoint``-ed; each
  iteration's rank frame is checkpointed too, truncating the logical
  plan that otherwise doubles per round and OOMs the DRIVER (same
  lesson as ``dedup.connected_components``; on a cluster with flaky
  executors swap for reliable ``checkpoint(dir)``);
- dangling mass (nodes with no out-edges) is redistributed uniformly —
  its total rides the SAME job as the rank update (a one-row aggregated
  frame broadcast into the update), so each iteration is exactly ONE
  action, and the mass never becomes a per-iteration Python literal
  (distinct literals would trigger a fresh Janino compile per round);
- ranks are rounded in-engine each iteration (``F.round`` HALF_UP ==
  DuckDB ``ROUND`` for positives), so a SQL oracle can replay the
  iteration in lockstep without float-drift accumulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, iterations: int = 10,
             damping: float = 0.85, round_dp: int = 8,
             handle_dangling: bool = True) -> DataFrame:
    """PageRank over an edge list ``(src, dst)`` (long ids; parallel
    edges count as repeated links). Returns ``(id, rank)`` for every
    node appearing as src or dst; ranks sum to ~1."""
    nodes = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    ed = edges.join(deg, "src").localCheckpoint(eager=True)
    base = (1.0 - damping) / n
    # dangling node set, computed ONCE (nodes that never appear as src)
    dang_ids = (
        nodes.join(deg.select(F.col("src").alias("id")), "id", "left_anti")
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0) / F.lit(float(n)))
    for _ in range(iterations):
        if handle_dangling:
            # one-row frame; rides the same action as the rank update
            # (ranks is checkpointed, so this branch re-reads cached
            # blocks, not the lineage)
            dm = (
                ranks.join(dang_ids, "id", "left_semi")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dm"))
            )
        else:
            dm = ranks.sparkSession.range(1).select(
                F.lit(0.0).alias("_dm"))
        sums = (
            ed.join(ranks.select(F.col("id").alias("src"), "rank"), "src")
            .select(F.col("dst").alias("id"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(sums, "id", "left")
            .crossJoin(F.broadcast(dm))
            .select(
                "id",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0))
                       + F.col("_dm") / F.lit(float(n))),
                    round_dp,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
