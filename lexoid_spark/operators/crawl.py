"""Recursive-crawl analogue (reference: ``recursive_read_html``,
``lexoid/core/utils.py:410-464`` + ``api.py:413-439``).

The reference recurses ``parse()`` over URLs extracted from each page's
markdown, with a visited-set to prevent cycles. At corpus scale there
is no network: the crawl becomes an **iterative driver loop over the
pages table** (Spark SQL has no recursion) —

  frontier ⋈ corpus (url equi-join, frontier broadcast)
    → extract links (native regexp over the extracted markdown)
    → explode → dedup → anti-join visited (J3/U1)
    → next frontier; edges accumulated per depth.

Each round is one narrow plan; ``depth`` bounds the loop as in the
reference's ``depth`` kwarg. Returns the reachable-edge table
(parent_url, child_url, depth) — the relational form of the
``recursive_docs`` tree (SURVEY.md §1.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lexoid_spark.functions.columns import extract_md_urls


def crawl_edges(pages: DataFrame, seed_urls: list[str], depth: int = 2,
                md_col: str | None = None,
                broadcast_threshold: int = 1_000_000) -> DataFrame:
    """BFS over in-corpus links; one DataFrame round per depth level.

    ``pages`` must carry ``url`` and either ``md_col`` (pre-extracted
    markdown) or a ``text``-like column holding link-bearing content.
    Links pointing outside the corpus are dropped by the inner join
    (the reference skips un-fetchable URLs the same way).

    The frontier is broadcast only while its known row count stays
    under ``broadcast_threshold`` — depth≥2 frontiers can approach
    corpus size at web scale, and a forced broadcast of an unbounded
    frontier is a driver-OOM; past the threshold the join falls back
    to a plain shuffle (AQE may still re-plan it at runtime).
    """
    spark = pages.sparkSession
    content = F.col(md_col) if md_col else F.col("text")
    # the edge table is re-joined every BFS round — cache it so link
    # extraction (regexp over every document) runs once, not per depth
    links = pages.select(
        F.col("url").alias("parent_url"),
        F.explode(extract_md_urls(content)).alias("child_url"),
    ).distinct().persist()
    corpus_urls = pages.select(
        F.col("url").alias("child_url")
    ).distinct().persist()

    frontier = spark.createDataFrame(
        [(u,) for u in seed_urls], "url string"
    ).distinct().persist()
    frontier_size = len(set(seed_urls))
    visited = frontier
    edge_parts: list[DataFrame] = []
    # superseded per-round caches (frontiers, old visited sets) are
    # released at loop end; the step caches stay — they back the
    # returned edge DataFrame
    spent_caches: list[DataFrame] = []

    for d in range(1, depth + 1):
        frontier_side = (
            F.broadcast(frontier)
            if frontier_size <= broadcast_threshold else frontier
        )
        step = (
            links.join(
                frontier_side,
                links.parent_url == frontier.url,
            )
            .select("parent_url", "child_url")
            .distinct()
            # only edges INTO the corpus (child must exist as a page)
            .join(corpus_urls, "child_url")
            .persist()
        )
        new_frontier = (
            step.select(F.col("child_url").alias("url"))
            .distinct()
            .join(visited, "url", "left_anti")  # cycle prevention (J3)
            .persist()
        )
        edge_parts.append(step.withColumn("depth", F.lit(d)))
        spent_caches.append(frontier)
        # per-round persist keeps the loop's lineage flat (each round
        # reads the previous round's cache, not a growing plan) with
        # ONE materializing job per round (the count doubles as the
        # broadcastability probe) and no driver collect of frontier rows
        frontier_size = new_frontier.count()
        if frontier_size == 0:
            frontier = new_frontier
            spent_caches.append(new_frontier)
            break
        spent_caches.append(visited)
        visited = visited.unionByName(new_frontier).distinct().persist()
        frontier = new_frontier

    spent_caches.extend([visited, frontier])  # final round's sets
    for c in spent_caches:
        c.unpersist()  # idempotent; steps/links stay cached for the caller

    if not edge_parts:  # depth=0: no rounds ran
        return spark.createDataFrame(
            [], "parent_url string, child_url string, depth int"
        )

    out = edge_parts[0]
    for p in edge_parts[1:]:
        out = out.unionByName(p)
    # an edge discovered at several depths keeps its first depth (BFS)
    from pyspark.sql import Window

    w = Window.partitionBy("parent_url", "child_url").orderBy("depth")
    return (
        out.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select("parent_url", "child_url", "depth")
    )


def reachable_docs(edges: DataFrame, docs: DataFrame,
                   url_col: str = "url",
                   title_col: str = "title") -> DataFrame:
    """Flat relational form of the reference's nested ``recursive_docs``
    tree (``api.py:413-439``, ``utils.py:410-464``): one row per
    reachable document carrying its parent's url AND title — the
    ``parent_title`` field the reference stamps on every sub-doc. A
    broadcast join on the (small relative to corpus) edge table; the
    edge table IS the tree, this view just decorates it."""
    parents = docs.select(
        F.col(url_col).alias("parent_url"),
        F.col(title_col).alias("parent_title"),
    )
    children = docs.select(
        F.col(url_col).alias("child_url"),
        F.col(title_col).alias("title"),
    )
    return (
        edges.join(parents, "parent_url", "left")
        .join(children, "child_url", "left")
        .select("child_url", "parent_url", "parent_title", "title", "depth")
    )


def edges_to_tree(edge_rows, docs_by_url: dict, root_url: str,
                  parent_title: str = "", _visited: set | None = None) -> dict:
    """Driver-side reconstruction of the reference's nested per-doc
    dict (``recursive_read_html`` return shape): {raw, title, url,
    parent_title, recursive_docs=[...]}, visited-set cycle prevention
    included (``utils.py:423-436``). Control-plane only — use for
    single-root inspection of a bounded crawl, never over the corpus
    (the distributed form is :func:`reachable_docs`)."""
    if _visited is None:
        _visited = set()
    _visited.add(root_url)
    doc = docs_by_url.get(root_url, {})
    node = {
        "raw": doc.get("raw", ""),
        "segments": doc.get("segments", []),
        "title": doc.get("title", ""),
        "url": root_url,
        "parent_title": parent_title,
        "recursive_docs": [],
    }
    children = sorted(c for p, c in edge_rows if p == root_url)
    for child in children:
        if child in _visited:
            continue
        node["recursive_docs"].append(
            edges_to_tree(edge_rows, docs_by_url, child,
                          node["title"], _visited)
        )
    return node
