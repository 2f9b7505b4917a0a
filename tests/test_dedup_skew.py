"""Degenerate-bucket bounds for the LSH dedup/ANN paths (VERDICT r2 #9).

At 100TB one hot signature (e.g. millions of byte-identical boilerplate
docs) must not make the bucket self-join quadratic. Both LSH queries
rank-cap their buckets; these tests feed a pathological all-identical
corpus and assert the pair count is exactly the capped C(cap, 2)."""

import math

import pandas as pd
import pytest

from planetiler_spark.plans import queries as Q


N_DOCS = 3000


@pytest.fixture(scope="module")
def skew_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("skew")
    text = "the same boilerplate paragraph repeated in every document " * 4
    pd.DataFrame({
        "doc_id": [f"doc{i:05d}" for i in range(N_DOCS)],
        "text": [text] * N_DOCS,
        "n_chars": [len(text)] * N_DOCS,
    }).to_parquet(d / "documents.parquet")
    return str(d)


def test_minhash_lsh_bucket_cap(spark, skew_dir):
    # 3000 identical docs -> identical minhashes -> one bucket per band.
    # Uncapped this is C(3000,2) = 4,498,500 pairs; the cap bounds it.
    n = Q.dedup_minhash_lsh(spark, skew_dir).count()
    assert n == math.comb(Q._LSH_DOC_CAP, 2)  # 499,500


M31 = 2147483647


def _lcg_py(x, steps):
    x %= M31
    for _ in range(steps):
        x = (x * 48271) % M31
    return x


def _phash_py(key):
    g = key // 4
    base = _lcg_py(g, 4) * 2147483648 + _lcg_py(g, 5)
    return base ^ Q._PH_MASKS[key % 4]


def test_phash_near_dup_planted_pairs_exact(spark, tmp_path):
    """Output == the Python ground truth pair set: per 4-group exactly
    (base, v1, h=2) and (base, v2, h=5); brute force confirms nothing else
    within the Hamming radius, and the band join loses none of them."""
    keys = list(range(400))
    pd.DataFrame({"p_partkey": keys}).to_parquet(tmp_path / "part.parquet")
    got = {(r.id_a, r.id_b, r.hamming)
           for r in Q.phash_near_dup(spark, str(tmp_path)).collect()}

    ph = {k: _phash_py(k) for k in keys}
    brute = {(a, b, bin(ph[a] ^ ph[b]).count("1"))
             for i, a in enumerate(keys) for b in keys[i + 1:]
             if bin(ph[a] ^ ph[b]).count("1") <= Q._PH_T}
    expected = {(4 * g, 4 * g + 1, 2) for g in range(100)} | \
               {(4 * g, 4 * g + 2, 5) for g in range(100)}
    assert brute == expected          # fixture separation holds
    assert got == expected            # band join recalls every true pair


def test_phash_near_dup_bucket_cap(spark, tmp_path):
    """Hot-bucket bound: keys k + 4*j*(2^31-1) share k's full Lehmer stream
    AND k % 4, hence an identical phash — 2200 such ids collide in every
    band. Rank-capped at _PH_BUCKET_CAP, output is exactly C(cap, 2) instead
    of C(2200, 2)."""
    n, cap = 2200, Q._PH_BUCKET_CAP
    keys = [7 + 4 * j * M31 for j in range(n)]
    pd.DataFrame({"p_partkey": keys}).to_parquet(tmp_path / "part.parquet")
    out = Q.phash_near_dup(spark, str(tmp_path))
    assert out.count() == math.comb(cap, 2)
    assert out.filter("hamming <> 0").count() == 0


def test_dedup_components_planted_structure(spark, tmp_path):
    """Each 4-group's near-dup pairs {(b,v1),(b,v2)} must collapse into ONE
    component labeled by the base id with exactly 3 members (v3 sits beyond
    the Hamming radius and never appears)."""
    keys = list(range(400))
    pd.DataFrame({"p_partkey": keys}).to_parquet(tmp_path / "part.parquet")
    rows = {r.component: (r.n_members, r.sum_ids)
            for r in Q.dedup_components(spark, str(tmp_path)).collect()}
    assert rows == {4 * g: (3, 12 * g + 3) for g in range(100)}


def test_lsh_ann_bucket_cap(spark, tmp_path):
    # 3000 identical embeddings -> one (band, sig) bucket per band; each
    # query's candidates are bounded by the indexed-side cap.
    n_vecs, cap = 3000, Q._LSH_BUCKET_CAP
    vec = [0.1] * 64
    pd.DataFrame({
        "vec_id": [f"v{i:05d}" for i in range(n_vecs)],
        "embedding": [vec] * n_vecs,
    }).to_parquet(tmp_path / "embeddings.parquet")
    out = Q.embedding_lsh_ann(spark, str(tmp_path))
    # top-5 per vector, every candidate is an exact duplicate (cos = 1):
    # candidates per query <= cap, so output is exactly 5 rows per vector
    assert out.count() == n_vecs * 5
    # and the candidate stage never exceeded bands x probes x cap rows per
    # query: spot-check one vector's neighbor set is drawn from the capped
    # first `cap` vec_ids (plus itself excluded)
    rows = out.filter("vec_id = 'v02999'").orderBy("rank").collect()
    assert [r.rank for r in rows] == [1, 2, 3, 4, 5]
    assert all(r.neighbor_id <= f"v{cap:05d}" for r in rows)
