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
  its total is ONE scalar aggregation per round (control-plane);
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
    ranks = nodes.withColumn("rank", F.lit(1.0) / F.lit(float(n)))
    for _ in range(iterations):
        dangling = 0.0
        if handle_dangling:
            dangling = (
                ranks.join(deg.select(F.col("src").alias("id")),
                           "id", "left_anti")
                .agg(F.sum("rank")).collect()[0][0] or 0.0
            )
        sums = (
            ed.join(ranks.select(F.col("id").alias("src"), "rank"), "src")
            .select(F.col("dst").alias("id"),
                    (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(sums, "id", "left")
            .select(
                "id",
                F.round(
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("s"), F.lit(0.0))
                       + F.lit(dangling / n)),
                    round_dp,
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
