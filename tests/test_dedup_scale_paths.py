"""Round-4 at-scale dedup path tests (VERDICT r3 items 1, 2, 9): with
``DRIVER_GROUP_DOC_LIMIT`` forced to 0 the shuffle LSH bucket pairing
and the partitioned distributed verify must reproduce the driver-path
answers; a hub doc's shingles must ship once per PARTITION (never once
per pair); a hot bucket must engage the star cap on the shuffle path
with ``capped=True`` pairs still clustering correctly."""
import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from text_extraction_system_ray.pipelines import curate as _curate
from text_extraction_system_ray.pipelines import dedup as _dedup

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dup_docs(tmp_path_factory):
    d = tmp_path_factory.mktemp("dupscale")
    base = ("the quick brown fox jumps over the lazy dog and runs far "
            "away into the deep green forest to hide from hunters") * 3
    texts, ids = [], []
    for i in range(60):
        ids.append(i)
        texts.append(f"unique document {i} " + " ".join(
            f"word{i}_{j}" for j in range(50)))
    ids += [100, 101, 102, 103, 104]
    texts += [base, base, base.replace("green", "blue", 1),
              base, ""]        # exact + near dups + an empty doc
    pq.write_table(pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(ids), pa.string())}),
        str(d / "documents.parquet"))
    return str(d)


def test_minhash_neardups_shuffle_path_matches_driver(ray_session,
                                                      dup_docs,
                                                      monkeypatch):
    small = _dedup.minhash_neardups(dup_docs)
    assert len(small) >= 6          # planted cluster 100/101/102/103
    monkeypatch.setattr(_dedup, "DRIVER_GROUP_DOC_LIMIT", 0)
    big = _dedup.minhash_neardups(dup_docs)
    pd.testing.assert_frame_equal(small, big)


def test_simhash_shuffle_path_matches_driver(ray_session, dup_docs,
                                             monkeypatch):
    small = _dedup.simhash_neardups(dup_docs)
    monkeypatch.setattr(_dedup, "DRIVER_GROUP_DOC_LIMIT", 0)
    big = _dedup.simhash_neardups(dup_docs)
    pd.testing.assert_frame_equal(small, big)


def test_minhash_candidates_shuffle_path_matches_driver(ray_session,
                                                        dup_docs,
                                                        monkeypatch):
    small = _dedup.minhash_candidates(dup_docs)
    monkeypatch.setattr(_dedup, "DRIVER_GROUP_DOC_LIMIT", 0)
    big = _dedup.minhash_candidates(dup_docs)
    pd.testing.assert_frame_equal(small, big)


def test_curate_corpus_shuffle_path_matches_oracle(ray_session,
                                                   monkeypatch):
    """The flagship curation composition stays oracle-green when its
    near-dup stage is forced onto the 100-TB (shuffle + distributed
    verify) path."""
    import __ray_entry__
    monkeypatch.setattr(_dedup, "DRIVER_GROUP_DOC_LIMIT", 0)
    got = _curate.curate_corpus(SF_DIR)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS "
                f"SELECT * FROM '{SF_DIR}/documents.parquet'")
    want = con.execute(__ray_entry__.oracle_sql()["curate_corpus"]) \
        .fetchdf().sort_values("doc_id").reset_index(drop=True)
    got = got.sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(want)
    assert (got["doc_id"].to_numpy() ==
            want["doc_id"].to_numpy().astype(np.int64)).all()
    assert np.allclose(got["quality"], want["quality"])


def test_exact_jaccard_distributed_matches_quadratic(ray_session,
                                                     dup_docs):
    """The gram-inverted-index plan is EXACT: identical pair set and
    jaccard values to the independent quadratic driver loop."""
    dist = _dedup.exact_jaccard_pairs(dup_docs, threshold=0.5)
    quad = _dedup._quadratic_jaccard_pairs(dup_docs, threshold=0.5) \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(dist, quad)
    assert len(dist) >= 6


def test_neardup_clusters_exact_vs_minhash(ray_session, dup_docs):
    """The SQL-checked clusters query feeds from the exact pair set
    (zero false negatives by construction); the minhash-fed variant is
    the approximate-at-scale path — equal here, with the documented
    residual LSH miss probability ((1-j^4)^16 ≈ 4e-8 at j=0.9)."""
    exact = _curate.neardup_clusters(
        _dedup.exact_jaccard_pairs(dup_docs, threshold=0.6))
    approx = _curate.neardup_clusters(
        _dedup.minhash_neardups(dup_docs, threshold=0.6))
    pd.testing.assert_frame_equal(exact, approx)


def test_hub_doc_ships_once_per_partition(ray_session, tmp_path,
                                          monkeypatch):
    """VERDICT r3 item 1 pin: a doc appearing in 150 candidate pairs
    materializes its shingles at most once per verify PARTITION."""
    d = tmp_path / "hub"
    d.mkdir()
    n = 151
    texts = [f"shared alpha beta gamma delta doc {i} " +
             " ".join(f"tok{i}_{j}" for j in range(20)) for i in range(n)]
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array(texts, pa.string())}),
        str(d / "documents.parquet"))
    pairs = pd.DataFrame({"doc_a": np.zeros(n - 1, np.int64),
                          "doc_b": np.arange(1, n, dtype=np.int64)})
    monkeypatch.setattr(_dedup, "VERIFY_PAIRS_PER_PARTITION", 16)
    empty = pd.DataFrame({"doc_a": pd.Series([], dtype="int64"),
                          "doc_b": pd.Series([], dtype="int64"),
                          "jaccard": pd.Series([], dtype="float64")})
    out = _dedup._verify_pairs_distributed(str(d), pairs, 0.0, empty)
    stats = _dedup._last_dist_verify_stats
    assert stats["pairs"] == n - 1
    assert 1 < stats["partitions"] < n - 1
    # hub doc 0: ≤ one shingle row per partition, NOT one per pair
    assert stats["max_partitions_per_doc"] <= stats["partitions"]
    assert stats["shipped_doc_rows"] < 2 * stats["pairs"]
    # correctness of the partitioned kernel vs a local exact check
    flat, ptr = _dedup._shingle_batch(texts)
    sets = [set(flat[ptr[i]:ptr[i + 1]].tolist()) for i in range(n)]
    for _, r in out.iterrows():
        sa, sb = sets[int(r["doc_a"])], sets[int(r["doc_b"])]
        want = len(sa & sb) / len(sa | sb)
        assert abs(r["jaccard"] - round(want, 4)) < 1e-9
    assert len(out) == n - 1        # threshold 0: every pair verified


def test_hot_bucket_star_cap_on_shuffle_path(ray_session, tmp_path,
                                             monkeypatch):
    """VERDICT r3 item 9: one bucket owning every doc engages the star
    cap on the SHUFFLE path — O(n) pairs, not O(n²) — and the capped
    pairs still produce the right transitive cluster."""
    d = tmp_path / "hot"
    d.mkdir()
    # n above the REAL BUCKET_CAP: the cap must engage inside Ray worker
    # processes (a monkeypatched module constant doesn't reach workers)
    n = _dedup.BUCKET_CAP + 88
    text = "identical duplicated page body " + " ".join(
        f"w{j}" for j in range(40))
    pq.write_table(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64()),
        "text": pa.array([text] * n, pa.string())}),
        str(d / "documents.parquet"))
    monkeypatch.setattr(_dedup, "DRIVER_GROUP_DOC_LIMIT", 0)

    cands = _dedup.minhash_candidates(str(d))
    # star pairs only: (0, i) per band, deduped — bounded group memory
    assert len(cands) == n - 1
    assert (cands["doc_a"].to_numpy() == 0).all()

    # the kernel reports the truncation (in-process, so the cap can be
    # monkeypatched small here)
    monkeypatch.setattr(_dedup, "BUCKET_CAP", 16)
    g = pd.DataFrame({"band": np.zeros(40, np.int32),
                      "band_key": np.full(40, 7, np.int64),
                      "doc_id": np.arange(40, dtype=np.int64)})
    kp = _dedup._minhash_part_pairs(g)
    assert bool(kp["capped"].all()) and len(kp) == 39
    monkeypatch.setattr(_dedup, "BUCKET_CAP", 512)

    # capped pairs flow through verification + clustering correctly
    nd = _dedup.minhash_neardups(str(d), threshold=0.6)
    assert len(nd) == n - 1 and (nd["jaccard"] == 1.0).all()
    clusters = _curate.neardup_clusters(nd)
    assert len(clusters) == n
    assert (clusters["cluster_min"] == 0).all()
