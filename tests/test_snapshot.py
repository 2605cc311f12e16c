"""Snapshot delta: both plans equal; content-level (not id-level) novelty."""
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_plans_equal(ray_session):
    from text_extraction_system_ray.pipelines.snapshot import \
        snapshot_delta
    a = (snapshot_delta(SF).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    b = (snapshot_delta(SF, force_shuffle=True).to_pandas()
         .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(a) > 0


def test_moved_content_is_not_novel(ray_session, tmp_path):
    # doc 2 is new-only (2 % 3 == 2) but repeats doc 0's text: content
    # already existed in the old snapshot, so it must NOT be novel
    from text_extraction_system_ray.pipelines.snapshot import \
        snapshot_delta
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array([0, 1, 2, 5], pa.int64()),
        "text": pa.array(["alpha", "beta", "alpha", "brand new"],
                         pa.string())}), d / "documents.parquet")
    out = (snapshot_delta(str(d)).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    assert out["doc_id"].tolist() == [5]
