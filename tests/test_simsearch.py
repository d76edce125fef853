"""simsearch: exact top-k vs a numpy oracle; LSH/IVF recall floors."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from pdf_parser_spark import simsearch

N, DIM, K = 300, 16, 5


def _np_corpus():
    # deterministic: splitmix-style per-element hashing, no RNG state
    out = np.zeros((N, DIM), dtype=np.float64)
    for i in range(N):
        for j in range(DIM):
            h = simsearch._splitmix(i * 131 + j * 7 + 13)
            out[i, j] = (h / 2**64) * 2 - 1
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    vecs = _np_corpus()
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(N)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, vecs


def _np_topk(vecs, qids, k):
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    out = {}
    for q in qids:
        s = sims[q].copy()
        s[q] = -np.inf
        # ties broken by vec_id ascending, like the engine
        order = sorted(range(N), key=lambda i: (-s[i], i))[:k]
        out[q] = order
    return out


def test_cosine_topk_matches_numpy(spark, corpus):
    df, vecs = corpus
    qids = [0, 1, 2, 3]
    queries = df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = simsearch.cosine_topk(df, queries, k=K).collect()
    expected = _np_topk(vecs, qids, K)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["cosine_sim"]))
    for q in qids:
        ranked = [v for _, v, _ in sorted(by_q[q])]
        assert ranked == expected[q]
    # scores match numpy to float tolerance
    norms = np.linalg.norm(vecs, axis=1)
    for r in got:
        want = float(
            vecs[r["query_id"]] @ vecs[r["vec_id"]] / (norms[r["query_id"]] * norms[r["vec_id"]])
        )
        assert abs(r["cosine_sim"] - want) < 1e-9


def test_rp_lsh_recall(spark, corpus):
    df, vecs = corpus
    queries = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = simsearch.rp_lsh_topk(df, queries, dim=DIM, k=K, bits=6, tables=6).collect()
    expected = _np_topk(vecs, range(8), K)
    hits = total = 0
    for q in range(8):
        approx = {r["vec_id"] for r in got if r["query_id"] == q}
        hits += len(approx & set(expected[q]))
        total += K
    assert hits / total >= 0.5, f"LSH recall {hits}/{total}"


def test_ivf_recall_and_cost(spark, corpus):
    df, vecs = corpus
    queries = df.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = simsearch.ivf_topk(df, queries, k=K, n_centroids=8, nprobe=4).collect()
    expected = _np_topk(vecs, range(8), K)
    hits = total = 0
    for q in range(8):
        approx = {r["vec_id"] for r in got if r["query_id"] == q}
        hits += len(approx & set(expected[q]))
        total += K
    assert hits / total >= 0.5, f"IVF recall {hits}/{total}"


def test_ivf_assign_covers_all(spark, corpus):
    df, _ = corpus
    assigned = simsearch.ivf_assign(df, n_centroids=8)
    assert assigned.filter(F.col("list_id").isNull()).count() == 0
    n_lists = assigned.select("list_id").distinct().count()
    assert 2 <= n_lists <= 8
