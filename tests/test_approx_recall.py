"""Recall of the approximate operators measured against their exact
siblings on the sf0.001 fixture tables — the approximate paths'
recall is a tracked number with a floor, not a hope (VERDICT r02 §9).

Precision is exact by construction everywhere (every approximate
candidate is re-verified with the exact similarity before emission),
so only recall can drift; these tests pin it.
"""

import os

import pytest
from pyspark.sql import functions as F

from nutch_spark.operators.ann import (
    cosine_neardup_exact, cosine_topk, embedding_neardup, lsh_topk,
)
from nutch_spark.operators.dedup_text import (
    minhash_lsh, ngram_jaccard_exact, ngram_jaccard_pairs,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL",
                        "/root/testdata/sf0.001")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="fixture parquet not present")


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text").persist())


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
            .persist())


def _pairset(df):
    return {(r.id_a, r.id_b) for r in df.select("id_a", "id_b").collect()}


def test_minhash_lsh_recall_vs_exact(docs):
    exact = _pairset(ngram_jaccard_exact(docs, threshold=0.7))
    approx = _pairset(minhash_lsh(docs, verify_threshold=0.7))
    assert approx <= exact | approx  # precision is exact-verified
    extra = approx - exact
    assert not extra, f"minhash emitted non-pairs: {sorted(extra)[:5]}"
    recall = len(approx & exact) / max(1, len(exact))
    assert recall >= 0.9, f"minhash_lsh recall {recall:.3f} < 0.9"


def test_minhash_candidates_superset_of_verified(docs):
    """The unverified banded candidates must cover every verified pair
    (the verify step only filters, never invents)."""
    cand = _pairset(minhash_lsh(docs, verify_threshold=None))
    verified = _pairset(minhash_lsh(docs, verify_threshold=0.7))
    assert verified <= cand


def test_embedding_neardup_recall_vs_exact(emb):
    """Self-tuned LSH params (auto_lsh_params) hit the recall target
    at the fixture's similarity level (66 exact pairs at cosine 0.4)."""
    exact = _pairset(cosine_neardup_exact(emb, threshold=0.4))
    assert len(exact) > 10, "fixture sanity: exact set non-trivial"
    approx = _pairset(embedding_neardup(emb, threshold=0.4))
    assert approx <= exact, "verified cosine filter must kill non-dups"
    recall = len(approx) / len(exact)
    assert recall >= 0.8, f"embedding_neardup recall {recall:.3f} < 0.8"


def test_auto_lsh_params_math():
    from nutch_spark.operators.ann import auto_lsh_params
    # tighter threshold -> fewer tables needed at same planes budget
    p_lo, t_lo = auto_lsh_params(0.4, 500)
    p_hi, t_hi = auto_lsh_params(0.95, 500)
    assert t_hi <= t_lo
    # planes grow with n (bucket occupancy control)
    p_big, _ = auto_lsh_params(0.9, 10_000_000)
    assert p_big > p_lo
    # table budget respected
    _, t_cap = auto_lsh_params(0.1, 500, max_tables=16)
    assert t_cap <= 16


def test_ann_lsh_recall_at_k(emb):
    queries = emb.orderBy("vec_id").limit(8)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, queries, k=5).collect()}
    # fixture top-5 sims sit at cosine 0.26-0.39 — weak neighbors, so
    # the probe budget must be generous (auto_lsh_params(0.3, 500)
    # territory); measured: (4, 24) ≈ 0.9, (5, 16) ≈ 0.58
    approx = {(r.query_id, r.neighbor_id)
              for r in lsh_topk(emb, queries, k=5,
                                n_planes=4, n_tables=24).collect()}
    recall = len(approx & exact) / max(1, len(exact))
    assert recall >= 0.7, f"ann_lsh recall@5 {recall:.3f} < 0.7"


def test_ngram_jaccard_blocked_recall_vs_exact(docs):
    """ngram_jaccard_pairs (minhash-blocked candidates) against the
    lossless prefix-filtered exact join at the same threshold: a
    subset, with recall pinned."""
    exact = _pairset(ngram_jaccard_exact(docs, threshold=0.8))
    blocked = _pairset(ngram_jaccard_pairs(docs, threshold=0.8))
    assert blocked <= exact
    recall = len(blocked) / max(1, len(exact))
    assert recall >= 0.9, f"ngram_jaccard recall {recall:.3f} < 0.9"


def test_ann_ivf_recall_at_k(emb):
    """IVF top-k recall vs the exact baseline; probing more cells
    monotonically helps (same codebook)."""
    from nutch_spark.operators.ann import ivf_centroids, ivf_topk
    queries = emb.orderBy("vec_id").limit(8)
    exact = {(r.query_id, r.neighbor_id)
             for r in cosine_topk(emb, queries, k=5).collect()}
    cents = ivf_centroids(emb, n_centroids=16)
    few = {(r.query_id, r.neighbor_id)
           for r in ivf_topk(emb, queries, k=5, n_probe=2,
                             centroids=cents).collect()}
    many = {(r.query_id, r.neighbor_id)
            for r in ivf_topk(emb, queries, k=5, n_probe=8,
                              centroids=cents).collect()}
    r_few = len(few & exact) / len(exact)
    r_many = len(many & exact) / len(exact)
    assert r_many >= r_few
    assert r_many >= 0.5, f"ivf recall@5 nprobe=8 {r_many:.3f} < 0.5"


def test_ivf_centroids_deterministic(emb):
    from nutch_spark.operators.ann import ivf_centroids
    a = ivf_centroids(emb, n_centroids=8, lloyd_iters=1)
    b = ivf_centroids(emb, n_centroids=8, lloyd_iters=1)
    assert a == b
