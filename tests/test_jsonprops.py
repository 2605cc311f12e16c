"""JSON props extraction: malformed rows counted, not fatal."""
import pyarrow as pa
import pyarrow.parquet as pq


def test_malformed_json_counted(ray_session, tmp_path):
    from text_extraction_system_ray.pipelines.jsonprops import \
        json_props_stats
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(pa.table({
        "event_type": pa.array(["a", "a", "a", "b", "b"], pa.string()),
        "props": pa.array(['{"k": 5}', "not json", '{"nokey": 1}',
                           '{"k": 2}', '{"k": 10}'], pa.string())}),
        d / "events.parquet")
    df = (json_props_stats(str(d)).to_pandas()
          .sort_values("event_type").reset_index(drop=True))
    assert df["n_events"].tolist() == [3, 2]
    assert df["n_invalid"].tolist() == [2, 0]
    assert df["sum_k"].tolist() == [5, 12]
    assert df["min_k"].tolist() == [5, 2]
    assert df["max_k"].tolist() == [5, 10]
    assert df["avg_k"].tolist() == [5.0, 6.0]
