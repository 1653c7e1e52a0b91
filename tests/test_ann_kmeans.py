"""Recall and determinism bounds for the learned-IVF ANN path.

The IVF index is approximate by construction, so it is not hash-gated
against an oracle; instead we bound its recall against the exact brute
force and pin the parts that ARE deterministic (centroid training, cell
assignment).
"""

import pytest

from one_one_one_rule_spark.operators.similarity import (
    assign_cells,
    brute_force_topk,
    ivf_kmeans_topk,
    kmeans_centroids,
)
from one_one_one_rule_spark.sources.fixtures import load_table

QUERY_IDS = [0, 1, 2, 3, 4]


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_kmeans_centroids_deterministic(embeddings):
    a = kmeans_centroids(embeddings, k=4, iters=2)
    b = kmeans_centroids(embeddings, k=4, iters=2)
    assert a == b  # exact-decimal updates: bit-identical across runs


def test_assign_cells_partitions_all_vectors(embeddings):
    cents = kmeans_centroids(embeddings, k=4, iters=2)
    assigned = assign_cells(embeddings, cents)
    n = embeddings.count()
    assert assigned.count() == n
    cells = {r.cell for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(4)) and len(cells) > 1


def test_ivf_kmeans_recall_vs_brute_force(embeddings):
    exact = {
        (r.qid, r.vec_id)
        for r in brute_force_topk(embeddings, QUERY_IDS, k=5).collect()
    }
    approx = {
        (r.qid, r.vec_id)
        for r in ivf_kmeans_topk(
            embeddings, QUERY_IDS, k=5, n_cells=8, nprobe=2
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"IVF recall {recall:.2f} below bound"


def test_ivf_kmeans_rows_shape(embeddings):
    out = ivf_kmeans_topk(embeddings, QUERY_IDS, k=5, n_cells=8, nprobe=2)
    rows = out.collect()
    assert len(rows) == len(QUERY_IDS) * 5
    assert out.columns == ["qid", "vec_id", "cosine", "rn"]
    per_q = {}
    for r in rows:
        per_q.setdefault(r.qid, []).append(r.rn)
    assert all(sorted(v) == [1, 2, 3, 4, 5] for v in per_q.values())
