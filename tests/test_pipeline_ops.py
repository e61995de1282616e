"""Training-data pipeline operators: URL-seen bloom layer, text
analysis, text dedup (exact/MinHash/SimHash), ANN, multimodal
plumbing."""

import pyspark.sql.functions as F
import pytest

from nutch_spark.operators import ann, dedup_text, multimodal, textops
from nutch_spark.operators.urlseen import (build_bloom, filter_unseen,
                                           split_seen)


# --- URL-seen bloom -----------------------------------------------------

def test_bloom_no_false_negatives(spark):
    urls = spark.createDataFrame(
        [(f"http://h{i % 7}.test/p{i}",) for i in range(500)], "url string")
    bloom = build_bloom(urls, n_buckets=8)
    new, maybe = split_seen(urls, bloom, n_buckets=8)
    assert new.count() == 0          # every seen url must hit
    assert maybe.count() == 500


def test_bloom_prunes_unseen(spark):
    seen = spark.createDataFrame(
        [(f"http://h.test/p{i}",) for i in range(300)], "url string")
    bloom = build_bloom(seen, n_buckets=4)
    fresh = spark.createDataFrame(
        [(f"http://new.test/x{i}",) for i in range(300)], "url string")
    new, maybe = split_seen(fresh, bloom, n_buckets=4)
    # fpp ~1% at 10 bits/item → the vast majority short-circuit
    assert new.count() >= 280


def test_filter_unseen_exact(spark):
    seen = spark.createDataFrame(
        [(f"http://h.test/p{i}",) for i in range(100)], "url string")
    bloom = build_bloom(seen, n_buckets=4)
    mixed = spark.createDataFrame(
        [(f"http://h.test/p{i}",) for i in range(50)]      # seen
        + [(f"http://x.test/n{i}",) for i in range(60)],   # new
        "url string")
    out = {r.url for r in
           filter_unseen(mixed, seen, bloom, n_buckets=4).collect()}
    assert out == {f"http://x.test/n{i}" for i in range(60)}


# --- textops ------------------------------------------------------------

@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "The quick brown fox jumps over the lazy dog and runs", "en"),
        (1, "der hund und die katze ist nicht mit dem ball", "de"),
        (2, "xyzzy qwerty 12345", "xx"),
        (3, "THE THE THE AND AND THE OF THE", "en"),
        (4, "  spaced   out\ttext  with   gaps ", "en"),
        (5, "dup dup dup shared text here", "en"),
        (6, "dup dup dup shared text here", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, "
                                       "lang string")


def test_token_counts(spark, docs):
    out = {r.doc_id: (r.tokens_ws, r.tokens_bpe) for r in docs.select(
        "doc_id",
        textops.token_count_ws(F.col("text")).alias("tokens_ws"),
        textops.token_count_bpe(F.col("text")).alias("tokens_bpe"))
        .collect()}
    assert out[0] == (11, 11)
    assert out[4][0] == 5           # whitespace collapsed + trimmed
    assert out[2] == (3, 3)


def test_lang_id(spark, docs):
    out = {r.doc_id: r.lang_pred for r in docs.select(
        "doc_id", textops.lang_id(F.col("text")).alias("lang_pred"))
        .collect()}
    assert out[0] == "en"
    assert out[1] == "de"
    assert out[2] == "und"


def test_quality_score_ordering(spark, docs):
    out = {r.doc_id: r.q for r in docs.select(
        "doc_id", textops.quality_score(F.col("text")).alias("q"))
        .collect()}
    # real sentence beats keyword mash and shouting
    assert out[0] > out[3]
    assert out[0] > out[2]
    assert all(0.0 <= v <= 1.0 for v in out.values())


def test_fingerprint_normalization(spark):
    d = spark.createDataFrame(
        [(0, "Hello  World"), (1, "hello world"), (2, " HELLO\tWORLD ")],
        "doc_id long, text string")
    fps = [r.fp for r in d.select(
        textops.fingerprint(F.col("text")).alias("fp")).collect()]
    assert len(set(fps)) == 1


# --- text dedup ---------------------------------------------------------

def test_exact_dedup(spark, docs):
    out = dedup_text.exact_dedup(docs).collect()
    ids = sorted(r.doc_id for r in out)
    assert ids == [5, 6]
    assert all(r.keep_id == 5 for r in out)


def test_minhash_lsh_finds_neardups(spark):
    base = ("the quick brown fox jumps over the lazy dog again and "
            "again every single day of the long week")
    rows = [(0, base), (1, base.replace("long", "short")),
            (2, "completely different content about spark shuffles "
                "partitions and broadcast joins at scale")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup_text.minhash_lsh(d, num_hashes=32, bands=16,
                                   verify_threshold=0.4).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(0, 1)}
    assert pairs[0].jaccard > 0.5


def test_simhash_similar_vs_different(spark):
    base = ("one two three four five six seven eight nine ten eleven "
            "twelve thirteen fourteen fifteen")
    rows = [(0, base), (1, base + " sixteen"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(p.id_a, p.id_b): p.hamming
             for p in dedup_text.simhash_neardup(d, max_hamming=16)
             .collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_simhash_md5_family_matches_xxhash_semantics(spark):
    """The md5-60 token-hash family (cross-engine oracle path) finds
    the same near/far structure as the default xxhash64 family."""
    base = ("one two three four five six seven eight nine ten eleven "
            "twelve thirteen fourteen fifteen")
    rows = [(0, base), (1, base + " sixteen"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(p.id_a, p.id_b)
             for p in dedup_text.simhash_neardup(
                 d, max_hamming=16, n_bits=60, token_hash="md5")
             .collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_ngram_jaccard_exact_equals_bruteforce(spark):
    """Prefix-filtered exact join returns EXACTLY the brute-force
    all-pairs result (recall proof on a fixture with shared and
    disjoint shingle sets)."""
    rows = [
        (0, "a b c d e f g h"),
        (1, "a b c d e f g x"),       # high overlap with 0
        (2, "a b c q r s t u"),       # low overlap with 0/1
        (3, "v w x y z zz zzz zzzz"),  # disjoint
        (4, "a b c d e f g h"),       # identical to 0
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(p.id_a, p.id_b): p.jaccard
           for p in dedup_text.ngram_jaccard_exact(
               d, n=3, threshold=0.3).collect()}

    # brute force over distinct word-3-gram string sets
    def sh(t):
        w = t.split()
        return set(" ".join(w[i:i + 3]) for i in range(len(w) - 2))
    want = {}
    for i in range(5):
        for j in range(i + 1, 5):
            a, b = sh(rows[i][1]), sh(rows[j][1])
            jac = len(a & b) / len(a | b)
            if jac >= 0.3:
                want[(i, j)] = round(jac, 6)
    assert got == want
    assert got[(0, 4)] == 1.0


def test_cosine_neardup_exact(spark):
    import math
    rows = [(0, [1.0, 0.0]), (1, [math.cos(0.1), math.sin(0.1)]),
            (2, [0.0, 1.0])]
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<float>")
    got = {(r.id_a, r.id_b): r.cos_sim
           for r in ann.cosine_neardup_exact(emb, threshold=0.9)
           .collect()}
    assert set(got) == {(0, 1)}
    assert abs(got[(0, 1)] - math.cos(0.1)) < 1e-5


# --- ANN ----------------------------------------------------------------

def _emb(spark):
    import math
    rows = []
    for i in range(20):
        angle = (i % 10) * math.pi / 20
        rows.append((i, [math.cos(angle), math.sin(angle), 0.01 * i]))
    return spark.createDataFrame(rows, "vec_id long, "
                                       "embedding array<float>")


def test_cosine_topk_exact(spark):
    emb = _emb(spark)
    out = ann.cosine_topk(emb, emb.where(F.col("vec_id") == 0), k=3)
    rows = out.orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3]
    assert rows[0].cos_sim >= rows[1].cos_sim >= rows[2].cos_sim
    # vec 10 has the same angle as vec 0 → top neighbor
    assert rows[0].neighbor_id == 10


def test_lsh_topk_recall(spark):
    emb = _emb(spark)
    q = emb.where(F.col("vec_id") < 3)
    exact = {(r.query_id, r.neighbor_id) for r in
             ann.cosine_topk(emb, q, k=3).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in
              ann.lsh_topk(emb, q, k=3, n_planes=4, n_tables=8)
              .collect()}
    # high-table LSH on a tiny set should recover most exact pairs
    assert len(exact & approx) >= len(exact) // 2


# --- multimodal ---------------------------------------------------------

def test_image_features_plumbing(spark):
    media = multimodal.make_media_fixture(spark, n=30)
    feats = multimodal.image_features(media, dims=8).collect()
    assert len(feats) == len([1 for i in range(30) if i % 3 == 0])
    assert all(len(f.embedding) == 8 for f in feats)
    # deterministic: same payload → same embedding
    again = multimodal.image_features(
        multimodal.make_media_fixture(spark, n=30), dims=8).collect()
    assert sorted((f.media_id, tuple(f.embedding)) for f in feats) \
        == sorted((f.media_id, tuple(f.embedding)) for f in again)


def test_audio_features_plumbing(spark):
    media = multimodal.make_media_fixture(spark, n=30)
    feats = multimodal.audio_features(media, dims=8).collect()
    assert len(feats) == len([1 for i in range(30) if i % 3 == 1])
    assert all(len(f.embedding) == 8 for f in feats)
    assert all(f.sample_rate in (8000, 16000, 44100) for f in feats)
    again = multimodal.audio_features(
        multimodal.make_media_fixture(spark, n=30), dims=8).collect()
    assert sorted((f.media_id, f.duration_ms, tuple(f.embedding))
                  for f in feats) \
        == sorted((f.media_id, f.duration_ms, tuple(f.embedding))
                  for f in again)


def test_resize_images_bounded_payload(spark):
    media = multimodal.make_media_fixture(spark, n=30)
    out = multimodal.resize_images(media, width=16, height=12).collect()
    assert len(out) == len([1 for i in range(30) if i % 3 == 0])
    # thumbnail contract: output byte-size fixed regardless of input
    assert all(len(r.payload) == 16 * 12 for r in out)
    assert all((r.width, r.height) == (16, 12) for r in out)
    again = multimodal.resize_images(
        multimodal.make_media_fixture(spark, n=30),
        width=16, height=12).collect()
    assert sorted((r.media_id, bytes(r.payload)) for r in out) \
        == sorted((r.media_id, bytes(r.payload)) for r in again)


def test_frame_sampling(spark):
    media = multimodal.make_media_fixture(spark, n=12)
    frames = multimodal.sample_frames(media, every_n=16).collect()
    assert frames
    by_id = {}
    for f in frames:
        by_id.setdefault(f.media_id, []).append(f.frame_idx)
    for idxs in by_id.values():
        assert sorted(idxs) == list(range(len(idxs)))
