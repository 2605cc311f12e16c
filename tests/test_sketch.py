"""HyperLogLog sketch: exact bit-length, merge law, accuracy bound."""

SF = "/root/testdata/sf0.001"
import numpy as np
import pyarrow as pa
import pytest

from text_extraction_system_ray.pipelines.sketch import (
    M, RHO_CAP, _bitlen_u64, finish, register_partials)


def test_bitlen_exact_incl_double_boundary():
    vals = np.array([0, 1, 2, 3, 2**53 - 1, 2**53, 2**53 + 1, 2**54 - 1],
                    np.uint64)
    got = _bitlen_u64(vals)
    want = [v.bit_length() for v in vals.tolist()]
    assert got.tolist() == want          # float log2 gets 2**53+1 wrong


def test_register_merge_is_elementwise_max():
    """HLL merge law: sketch(A ∪ B) == max-merge(sketch(A), sketch(B))."""
    a = [f"doc-{i}" for i in range(500)]
    b = [f"doc-{i}" for i in range(300, 900)]
    ta, tb = register_partials(a), register_partials(b)
    tu = register_partials(a + b)

    def reg(t):
        r = np.zeros(M, np.int64)
        r[t.column("bucket").to_numpy()] = t.column("max_rho").to_numpy()
        return r

    assert (np.maximum(reg(ta), reg(tb)) == reg(tu)).all()


def test_estimate_accuracy_and_dup_invariance():
    vals = [f"item-{i}" for i in range(5000)]
    t = register_partials(vals + vals[:2500])     # duplicates change nothing
    t2 = register_partials(vals)
    assert t.equals(t2)
    row = finish(t.column("bucket").to_numpy(), t.column("max_rho").to_numpy())
    # standard error ~1.04/sqrt(1024) ≈ 3.3%; allow 4 sigma
    assert abs(row["estimate"] - 5000) / 5000 < 0.13
    assert row["rho_numerator"] <= 1024 * (1 << RHO_CAP)


def test_empty_and_single():
    t = register_partials([])
    assert t.num_rows == 0
    row = finish(t.column("bucket").to_numpy(), t.column("max_rho").to_numpy())
    assert row["estimate"] == 0.0 or row["zero_buckets"] == M
    one = register_partials(["x"])
    r1 = finish(one.column("bucket").to_numpy(),
                one.column("max_rho").to_numpy())
    assert 0.5 < r1["estimate"] < 2.5


def test_kmv_merge_law_and_overlap():
    """KMV merge: k-min of union == k-min of merged partials; the theta
    intersection sample counts only hashes in BOTH sketches."""
    from text_extraction_system_ray.pipelines.sketch import (
        KMV_K, _kmv_merge, kmv_partials)
    a = kmv_partials(["s1"] * 3 + ["s2"] * 3,
                     ["alpha beta gamma", "delta", "beta epsilon",
                      "alpha zeta", "eta beta", "theta"])
    b = kmv_partials(["s1", "s2"], ["iota kappa", "alpha lambda"])
    rows = a.to_pylist() + b.to_pylist()
    merged = _kmv_merge(rows)
    # reference: sketch the full per-source word sets in one shot
    full = kmv_partials(
        ["s1"] * 4 + ["s2"] * 4,
        ["alpha beta gamma", "delta", "beta epsilon", "iota kappa",
         "alpha zeta", "eta beta", "theta", "alpha lambda"])
    want = _kmv_merge(full.to_pylist())
    for s in ("s1", "s2"):
        assert merged[s].tolist() == want[s].tolist()
        assert len(merged[s]) <= KMV_K


def test_qsample_dedup_and_schedule_invariance():
    """Bottom-k by hash with (hash → min value) dedup: merging per-batch
    partials equals one-shot sampling regardless of batch split — incl.
    duplicate keys carrying different values."""
    import numpy as np
    from text_extraction_system_ray.pipelines.sketch import (
        QSAMPLE_K, qsample_partials)
    keys = [f"k{i % 700}" for i in range(2000)]          # dups galore
    vals = [float((i * 37) % 997) for i in range(2000)]
    whole = qsample_partials(keys, vals)

    def merge(tables):
        h = np.concatenate([t.column("hu").to_numpy() for t in tables])
        v = np.concatenate([t.column("value").to_numpy() for t in tables])
        hu = h.view(np.uint64)
        order = np.lexsort((v, hu))
        hu, v = hu[order], v[order]
        first = np.concatenate([[True], hu[1:] != hu[:-1]])
        return hu[first][:QSAMPLE_K], v[first][:QSAMPLE_K]

    for split in (3, 7, 311):
        parts = [qsample_partials(keys[i:i + split], vals[i:i + split])
                 for i in range(0, 2000, split)]
        mh, mv = merge(parts)
        wh, wv = merge([whole])
        assert mh.tolist() == wh.tolist()
        assert mv.tolist() == wv.tolist()


def test_bloom_positions_deterministic_and_bounded():
    import numpy as np
    from text_extraction_system_ray.pipelines.sketch import (
        BLOOM_K, BLOOM_M, bloom_positions)
    pos = bloom_positions(["a", "b", "a"])
    assert pos.shape == (3, BLOOM_K)
    assert (pos >= 0).all() and (pos < BLOOM_M).all()
    assert (pos[0] == pos[2]).all()          # same key → same bits
    assert not (pos[0] == pos[1]).all()


def test_bloom_no_false_negatives():
    import numpy as np
    from text_extraction_system_ray.pipelines.sketch import (
        BLOOM_M, bloom_positions)
    keys = [f"k{i}" for i in range(2000)]
    bm = np.zeros(BLOOM_M, bool)
    bm[np.unique(bloom_positions(keys))] = True
    assert bm[bloom_positions(keys)].all()   # every built key probes True


# ------------------------------------------------ Count-Min sketch

def test_cms_overestimate_and_rank_props(ray_session):
    from text_extraction_system_ray.pipelines.sketch import (
        CMS_TOPK, cms_heavy_hitters)
    t = cms_heavy_hitters(SF).to_pandas()
    assert len(t) == CMS_TOPK
    # CMS never underestimates
    assert (t["est_cnt"] >= t["exact_cnt"]).all()
    # ranked by estimate desc, ties term asc
    est = t["est_cnt"].to_numpy()
    assert (est[:-1] >= est[1:]).all()
    for i in range(len(t) - 1):
        if est[i] == est[i + 1]:
            assert t["term"].iloc[i] < t["term"].iloc[i + 1]
    assert (t["rank"].to_numpy() == np.arange(1, len(t) + 1)).all()


def test_cms_estimate_matches_bruteforce(ray_session):
    """Driver-free cross-check: rebuild the counter matrix from exact
    corpus counts in numpy and confirm the pipeline's estimates."""
    import collections
    import pyarrow.parquet as pq
    from text_extraction_system_ray.pipelines.sketch import (
        CMS_D, CMS_W, _cms_cols, cms_heavy_hitters)
    texts = pq.read_table(f"{SF}/documents.parquet",
                          columns=["text"])["text"].to_pylist()
    cnt = collections.Counter(
        w for x in texts for w in (x or "").lower().split())
    terms = sorted(cnt)
    cols = _cms_cols(terms)
    cms = np.zeros(CMS_D * CMS_W, np.int64)
    for i, term in enumerate(terms):
        for r in range(CMS_D):
            cms[r * CMS_W + cols[i, r]] += cnt[term]
    t = cms_heavy_hitters(SF).to_pandas()
    pos = {term: i for i, term in enumerate(terms)}
    for _, row in t.iterrows():
        i = pos[row["term"]]
        want = min(cms[r * CMS_W + cols[i, r]] for r in range(CMS_D))
        assert row["est_cnt"] == want
        assert row["exact_cnt"] == cnt[row["term"]]


def test_weighted_sample_bias_and_determinism(ray_session):
    """Weight bias: average n_words of the sampled 50 must exceed the
    corpus average (heavier docs draw smaller keys); deterministic
    across runs and batch splits."""
    import pyarrow.parquet as pq
    from text_extraction_system_ray.pipelines.sketch import (
        weighted_sample)
    t = weighted_sample(SF).to_pandas()
    assert len(t) == 50
    keys = t["sample_key"].to_numpy()
    assert (keys[:-1] <= keys[1:]).all() and (keys >= 0).all()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    corpus_avg = np.mean([len((x or "").split())
                          for x in docs["text"].to_pylist()])
    assert t["n_words"].mean() > corpus_avg
    t2 = weighted_sample(SF).to_pandas()
    assert t.equals(t2)
