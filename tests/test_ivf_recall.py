"""IVF quality: Lloyd refinement must recover recall that the
first-C-vectors seed loses on clustered embedding distributions.

Data: 8 deterministic cluster centers in R^16, 25 members each with
small per-member offsets. The first 8 vectors (the seed) all come from
the first two clusters, so seed-IVF partitions the space badly;
one Lloyd step moves centroids onto the real clusters.
"""

import math

import pytest
from pyspark.sql import functions as F

from lexoid_spark.functions.similarity import cosine_topk, ivf_topk

N_CLUSTERS = 8
PER_CLUSTER = 25
DIM = 16


def _vec(cluster: int, member: int) -> list[float]:
    base = [
        math.sin(0.7 * cluster * (d + 1)) + (2.0 if d == cluster * 2 else 0.0)
        for d in range(DIM)
    ]
    return [
        round(b + 0.03 * math.cos(1.3 * member * (d + 1)), 6)
        for d, b in enumerate(base)
    ]


@pytest.fixture(scope="module")
def clustered(spark):
    rows = []
    vid = 0
    # interleave so ids 0..7 span only clusters 0 and 1 (bad seed)
    for member in range(PER_CLUSTER):
        for cluster in range(N_CLUSTERS):
            order = cluster if member else cluster % 2
            rows.append((vid, _vec(order, member)))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _recall(approx, exact) -> float:
    a = {(r["qid"], r["nid"]) for r in approx.collect()}
    e = {(r["qid"], r["nid"]) for r in exact.collect()}
    return len(a & e) / len(e)


def test_lloyd_refinement_recall(clustered):
    qids = list(range(0, 200, 25))
    exact = cosine_topk(clustered, qids, k=5)
    refined = ivf_topk(clustered, qids, k=5, n_centroids=N_CLUSTERS,
                       nprobe=2, n_iter=2)
    r_refined = _recall(refined, exact)
    assert r_refined >= 0.8, f"refined recall {r_refined}"

    seed = ivf_topk(clustered, qids, k=5, n_centroids=N_CLUSTERS,
                    nprobe=2, n_iter=0)
    r_seed = _recall(seed, exact)
    assert r_refined >= r_seed  # refinement never hurts here


def test_refine_centroids_is_member_mean(spark):
    from lexoid_spark.functions.similarity import refine_centroids

    assigned = spark.createDataFrame(
        [(0, [1.0, 2.0], 1), (1, [3.0, 4.0], 1), (2, [10.0, 0.0], 2)],
        "vid long, vvec array<double>, cid long",
    )
    got = {r["cid"]: r["cvec"] for r in refine_centroids(assigned).collect()}
    assert got == {1: [2.0, 3.0], 2: [10.0, 0.0]}


def test_near_dup_numpy_impl_matches_hof(spark):
    from lexoid_spark.functions.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    hof = {(r["id_a"], r["id_b"])
           for r in embedding_near_dup_pairs(emb, tau=0.35).collect()}
    fast = {(r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(emb, tau=0.35,
                                              impl="numpy").collect()}
    assert hof and fast == hof


def test_near_dup_gemm_impl_matches_hof(spark):
    from lexoid_spark.functions.similarity import embedding_near_dup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    hof = {(r["id_a"], r["id_b"])
           for r in embedding_near_dup_pairs(emb, tau=0.35).collect()}
    gemm = {(r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(emb, tau=0.35,
                                              impl="gemm").collect()}
    assert hof and gemm == hof


def test_sq8_matches_python_reference(spark):
    """sq8_topk's integer scoring must equal a literal python replay of
    the same math (quantize -> int dot -> ranking) over the same
    probed candidate sets."""
    import math

    from lexoid_spark.functions.similarity import sq8_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = [(r["qid"], r["nid"], r["rank"]) for r in
           sq8_topk(emb, query_ids=list(range(6)), k=4, n_centroids=4,
                    nprobe=2).orderBy("qid", "rank").collect()]

    rows = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}

    def q8(v):
        ma = max(abs(x) for x in v)
        if ma == 0:
            return [0] * len(v)
        return [math.floor(x * 127.0 / ma + 0.5) for x in v]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na, nb = sum(x * x for x in a), sum(y * y for y in b)
        return -2.0 if not na or not nb else d / math.sqrt(na * nb)

    cents = {c: rows[c] for c in range(4)}
    assigned = {}
    for vid, v in rows.items():
        assigned[vid] = max(
            cents, key=lambda c: (cos(v, cents[c]), -c))
    codes = {vid: q8(v) for vid, v in rows.items()}
    want = []
    for qid in range(6):
        probes = sorted(cents, key=lambda c: (-cos(rows[qid], cents[c]), c))[:2]
        cand = [v for v, c in assigned.items() if c in set(probes) and v != qid]
        qq = codes[qid]
        ranked = sorted(cand, key=lambda n: (-cos(qq, codes[n]), n))[:4]
        want += [(qid, n, i + 1) for i, n in enumerate(ranked)]
    assert got == want


def test_ivfpq_matches_python_reference(spark):
    """ivfpq_topk == a literal python replay of quantize -> codebook
    -> encode -> ADC over the same probed candidates."""
    import math

    from lexoid_spark.functions.similarity import ivfpq_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    got = [(r["qid"], r["nid"], r["rank"]) for r in
           ivfpq_topk(emb, query_ids=list(range(5)), k=4, n_centroids=4,
                      nprobe=2, m=8, k_pq=16).orderBy("qid", "rank").collect()]

    rows = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    dim = len(rows[0])
    sd = dim // 8

    def q8(v):
        ma = max(abs(x) for x in v)
        return [0] * len(v) if ma == 0 else \
            [math.floor(x * 127.0 / ma + 0.5) for x in v]

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na, nb = sum(x * x for x in a), sum(y * y for y in b)
        return -2.0 if not na or not nb else d / math.sqrt(na * nb)

    codes8 = {vid: q8(v) for vid, v in rows.items()}
    cb = [[[codes8[c][j * sd + t] for t in range(sd)] for c in range(16)]
          for j in range(8)]

    def sub_l2(qv, j, c):
        return sum((qv[j * sd + t] - cb[j][c][t]) ** 2 for t in range(sd))

    def encode(vid):
        qv = codes8[vid]
        return [min(range(16), key=lambda c: (sub_l2(qv, j, c), c))
                for j in range(8)]

    cents = {c: rows[c] for c in range(4)}
    assigned = {vid: max(cents, key=lambda c: (cos(v, cents[c]), -c))
                for vid, v in rows.items()}
    want = []
    for qid in range(5):
        probes = sorted(cents, key=lambda c: (-cos(rows[qid], cents[c]), c))[:2]
        cand = [v for v, c in assigned.items() if c in set(probes) and v != qid]
        qq = codes8[qid]
        enc = {n: encode(n) for n in cand}
        ranked = sorted(cand, key=lambda n: (
            sum(sub_l2(qq, j, enc[n][j]) for j in range(8)), n))[:4]
        want += [(qid, n, i + 1) for i, n in enumerate(ranked)]
    assert got == want
