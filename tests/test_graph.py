"""PageRank over crawl-style edge lists (operators/graph.py)."""

import pytest
from pyspark.sql import functions as F

from lexoid_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_star_graph_hub_ranks_highest(spark):
    # 1..4 all link to 0; 0 links back to 1 (so 0 isn't dangling).
    # 0 and 1 form a 2-cycle whose ranks oscillate at finite iteration
    # counts — both must dominate the leaves; mass is conserved.
    e = _edges(spark, [(1, 0), (2, 0), (3, 0), (4, 0), (0, 1)])
    r = {row["id"]: row["rank"] for row in pagerank(e, iterations=10).collect()}
    assert min(r[0], r[1]) > r[2]
    assert r[2] == r[3] == r[4]  # symmetric leaves
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)


def test_dangling_mass_redistributed(spark):
    # 2 is a sink (no out-edges): without dangling handling rank leaks
    e = _edges(spark, [(0, 1), (1, 2), (0, 2)])
    r = {row["id"]: row["rank"] for row in pagerank(e, iterations=8).collect()}
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-6)
    assert r[2] == max(r.values())  # the sink accumulates

    leaky = {row["id"]: row["rank"] for row in
             pagerank(e, iterations=8, handle_dangling=False).collect()}
    assert sum(leaky.values()) < 0.9  # leak is real without it


def test_ring_is_uniform(spark):
    n = 6
    e = _edges(spark, [(i, (i + 1) % n) for i in range(n)])
    r = [row["rank"] for row in pagerank(e, iterations=12).collect()]
    assert all(x == pytest.approx(1.0 / n, abs=1e-6) for x in r)


def test_deterministic_across_runs(spark):
    e = _edges(spark, [(i, (i * 3 + 1) % 17) for i in range(17)]
               + [(i, (i * 5 + 2) % 17) for i in range(17)])
    a = sorted(pagerank(e, iterations=5).collect())
    b = sorted(pagerank(e, iterations=5).collect())
    assert a == b
