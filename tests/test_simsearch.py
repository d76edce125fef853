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


def test_lsh_sign_margin_far_above_ulp():
    """ADVICE round-2: the bucket sign bit is an exact `dot >= 0`
    comparison computed by numpy einsum Spark-side but by sequential
    list_inner_product in the DuckDB oracle; different summation orders
    can differ by ~1 ulp, so a near-zero dot could flip a bucket and
    break parity only at larger corpora. This asserts the ACTUAL margin:
    across every testdata embedding (all three SFs), the planted
    near-dup twins (+0.25 first coord), the sf1 mutation copies
    (+k/1000), and every hyperplane either driver query uses, the
    minimum |dot| is >= 1e-9. Worst-case cross-engine reassociation
    error for a 64-term float64 dot of O(1) values is ~64 ulp ≈ 1e-14,
    so a 1e-9 floor leaves 5 orders of magnitude of margin (measured
    actual minimum: ~3.8e-7). If testdata regeneration ever lands a vector
    near a plane, this fails loudly instead of a mystery hash mismatch."""
    import duckdb
    import numpy as np

    from pdf_parser_spark import simsearch

    plane_sets = []
    for bits, tables in ((6, 4), (8, 6)):  # ann_rp_lsh / embedding_near_dups_lsh
        plane_sets.append(
            np.array(
                [
                    [simsearch.hyperplane(7 + t * 10_007 + b, 64) for b in range(bits)]
                    for t in range(tables)
                ]
            ).reshape(-1, 64)
        )
    planes = np.vstack(plane_sets)  # (total_planes, 64)

    min_abs = np.inf
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        rows = duckdb.sql(
            f"SELECT embedding FROM read_parquet('/root/testdata/{sf}/embeddings.parquet')"
        ).fetchall()
        v = np.array([r[0] for r in rows], dtype="float64")
        variants = [v]
        tw = v.copy()
        tw[:, 0] += 0.25  # _near_dup_corpus planted twins
        variants.append(tw)
        for k in range(1, 10):  # scripts/make_sf1.py perturbation ladder
            mk = v.copy()
            mk[:, 0] += np.float32(k / 1000.0)
            variants.append(mk)
        for arr in variants:
            dots = arr @ planes.T
            min_abs = min(min_abs, float(np.abs(dots).min()))
    assert min_abs >= 1e-9, f"min |dot| = {min_abs:.3e} — too close to a plane"
