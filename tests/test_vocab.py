"""vocab_topk: tie-breaking and partition-candidate exactness."""
import pyarrow as pa
import pyarrow.parquet as pq


def test_ties_and_partition_union(ray_session, tmp_path):
    from text_extraction_system_ray.pipelines.textstats import vocab_topk
    d = tmp_path / "sf"
    d.mkdir()
    # zz and aa tie at 3; bb wins at 4; k=3 must produce bb, aa, zz
    docs = ["bb aa zz", "bb aa zz", "bb aa zz", "bb solo"]
    pq.write_table(pa.table({
        "doc_id": pa.array(range(len(docs)), pa.int64()),
        "text": pa.array(docs, pa.string())}), d / "documents.parquet")
    df = vocab_topk(str(d), k=3).to_pandas()
    assert df["term"].tolist() == ["bb", "aa", "zz"]
    assert df["cnt"].tolist() == [4, 3, 3]
    assert df["rank"].tolist() == [1, 2, 3]
