"""SemDedup semantic dedup: engine vs independent brute-force reference."""
import numpy as np
import pyarrow.parquet as pq
import pytest

from text_extraction_system_ray.pipelines import semdedup as S

SF = "/root/testdata/sf0.001"


def _reference(sf_dir):
    """Independent numpy implementation of the whole contract (no shared
    code with the pipeline beyond the constants)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t.column("vec_id").to_numpy()
    order = np.argsort(ids)
    ids = ids[order]
    m = np.stack([np.asarray(x, np.float64)
                  for x in t.column("embedding").to_pylist()])[order]
    q = np.floor(m * S.QUANT + 0.5).astype(np.int64)
    n = len(ids)
    k = max(S.MIN_K, n // S.TARGET_CLUSTER)
    step = n // k
    seeds = q[np.searchsorted(ids, [j * step for j in range(k)])]
    d2 = ((q[:, None, :] - seeds[None, :, :]) ** 2).sum(axis=2)
    cluster = d2.argmin(axis=1)
    norms = (q * q).sum(axis=1)
    dup = np.zeros(n, bool)
    for i in range(n):
        for j in range(i):
            if cluster[i] != cluster[j]:
                continue
            dot = int(q[i] @ q[j])
            if dot > 0 and S.COS_DEN2 * dot * dot >= \
                    S.COS_NUM2 * int(norms[i]) * int(norms[j]):
                dup[i] = True
                break
    return ids, cluster, dup


def test_semantic_dedup_matches_bruteforce(ray_session):
    df = S.semantic_dedup(SF).to_pandas().sort_values("vec_id")
    ids, cluster, dup = _reference(SF)
    assert (df["vec_id"].to_numpy() == ids).all()
    assert (df["cluster_id"].to_numpy() == cluster).all()
    assert (df["is_dup"].to_numpy() == dup).all()


def test_quantize_matches_sql_floor_semantics():
    # floor(x*1024 + 0.5): round-half-up incl. negatives — the exact
    # expression the DuckDB oracle uses
    x = np.array([0.0, 0.00048828125, -0.00048828125, 0.5, -0.5, 1.0])
    got = S._quantize(x)
    assert got.tolist() == [0, 1, 0, 512, -512, 1024]


def test_cluster_count_scales_with_corpus():
    assert max(S.MIN_K, 500 // S.TARGET_CLUSTER) == S.MIN_K
    assert max(S.MIN_K, 10 ** 6 // S.TARGET_CLUSTER) == 3906


def test_two_level_assignment_bit_equal(ray_session, monkeypatch):
    """The √k-group probe path must reproduce the flat argmin
    bit-for-bit on the whole pipeline output (VERDICT r4 item 5)."""
    flat = S.semantic_dedup(SF).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    monkeypatch.setattr(S, "TWO_LEVEL_MIN_K", 0)
    two = S.semantic_dedup(SF).to_pandas().sort_values(
        "vec_id").reset_index(drop=True)
    import pandas as pd
    pd.testing.assert_frame_equal(flat, two)


def test_two_level_argmin_exact_with_ties():
    """Adversarial unit check: duplicate seeds (forced distance ties)
    and clustered queries — the probe must match np.argmin's
    first-minimum rule on every row."""
    rng = np.random.RandomState(7)
    k, d, n = 300, 16, 400
    seeds = rng.randint(-50, 50, size=(k, d)).astype(np.int64)
    seeds[37] = seeds[251]          # exact tie pair: lowest index wins
    seeds[0] = seeds[199]
    q = np.vstack([
        seeds[rng.randint(0, k, n // 2)] + rng.randint(-2, 3, (n // 2, d)),
        rng.randint(-60, 60, size=(n - n // 2, d)),
    ]).astype(np.int64)
    norms = (q * q).sum(axis=1)
    snorm = (seeds * seeds).sum(axis=1)
    want = np.argmin(norms[:, None] - 2 * (q @ seeds.T) + snorm[None, :],
                     axis=1)
    groups = S._seed_groups(seeds)
    got = S._two_level_argmin(q, norms, seeds, snorm, groups)
    assert np.array_equal(got, want)
