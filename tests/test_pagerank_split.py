"""Behavioral tests for the iterative PageRank op and the corpus-split
manifest: exact-integer determinism across batch sizes, a hand-checked
tiny fixed point, and split-rule reproducibility."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from text_extraction_system_ray.pipelines import pagerank as _pr
from text_extraction_system_ray.pipelines import split as _split


@pytest.fixture(scope="module")
def tiny_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("pr")
    n = 37
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i} " + "tok " * (i % 5) for i in range(n)],
                         pa.string()),
        "lang": pa.array(["en" if i % 3 else "de" for i in range(n)],
                         pa.string()),
        "n_chars": pa.array([7 + 4 * (i % 5) for i in range(n)], pa.int64()),
    })
    pq.write_table(tbl, str(d / "documents.parquet"))
    return str(d)


def _reference_ranks(n: int, iterations: int) -> np.ndarray:
    """Straight-line python re-derivation of the planted-graph recurrence."""
    ranks = np.full(n, _pr.SCALE, np.int64)
    edges = []
    for u in range(n):
        for j in range(1 + u % 4):
            edges.append((u, (u * 31 + 17 + j * 7919) % n, 1 + u % 4))
    for _ in range(iterations):
        s = np.zeros(n, np.int64)
        for u, v, deg in edges:
            s[v] += ranks[u] // deg
        ranks = _pr.TELEPORT + (_pr.DAMP_NUM * s) // _pr.DAMP_DEN
    return ranks


def test_pagerank_matches_scalar_reference(ray_session, tiny_dir):
    got = _pr.pagerank_ranks(tiny_dir, iterations=4)
    want = _reference_ranks(37, 4)
    assert np.array_equal(got, want)


def test_pagerank_rank_mass_reasonable(ray_session, tiny_dir):
    # every node keeps at least the teleport mass; total stays bounded
    r = _pr.pagerank_ranks(tiny_dir, iterations=3)
    assert (r >= _pr.TELEPORT).all()
    assert r.sum() < 2 * 37 * _pr.SCALE


def test_pagerank_topk_sorted_and_ties_by_id(ray_session, tiny_dir):
    df = _pr.pagerank_topk(tiny_dir, k=10)
    r = df["rank_units"].to_numpy()
    assert (np.diff(r) <= 0).all()
    ties = df.groupby("rank_units")["doc_id"].apply(
        lambda s: (s.diff().dropna() > 0).all())
    assert ties.all()


def test_corpus_split_shares_and_totals(ray_session, tiny_dir):
    df = _split.corpus_split(tiny_dir)
    assert set(df["split"]) <= {"train", "val", "test"}
    assert int(df["n_docs"].sum()) == 37
    # char totals conserved vs the source table
    src = pq.read_table(tiny_dir + "/documents.parquet")
    assert int(df["n_chars"].sum()) == int(
        pa.compute.sum(src["n_chars"]).as_py())
    # deterministic: second run identical
    df2 = _split.corpus_split(tiny_dir)
    pd.testing.assert_frame_equal(df, df2)


def test_pagerank_join_plan_bit_equal_to_broadcast(ray_session, tiny_dir):
    """The co-partitioned join plan (no driver rank vector) must be
    bit-equal to the broadcast plan — identical exact-int recurrence,
    different dataflow."""
    want = _pr.pagerank_ranks(tiny_dir, iterations=4)
    rds = _pr.pagerank_ranks_ds(tiny_dir, iterations=4)
    df = rds.to_pandas().sort_values("node").reset_index(drop=True)
    assert np.array_equal(df["rank"].to_numpy(), want)
    assert np.array_equal(df["node"].to_numpy(), np.arange(37))


def test_pagerank_topk_routes_through_join_plan(ray_session, tiny_dir,
                                                monkeypatch):
    """With the broadcast limit forced to 0 the n > limit branch
    executes end-to-end (join plan + distributed top-k combiner) and
    matches the broadcast-plan answer."""
    want = _pr.pagerank_topk(tiny_dir, k=10)
    monkeypatch.setattr(_pr, "RANK_BROADCAST_LIMIT", 0)
    got = _pr.pagerank_topk(tiny_dir, k=10)
    pd.testing.assert_frame_equal(got, want)
