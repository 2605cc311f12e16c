"""JSONL/CSV source round-trips: same rows, payload bytes intact, and
the extraction pipeline runs unchanged on the re-read dataset."""
import pandas as pd
import ray.data


def _corpus(tmp_path):
    import sys
    sys.path.insert(0, "/root/repo")
    from tests.gen_fixtures import write_corpus
    p = tmp_path / "pages.parquet"
    write_corpus("tiny", str(p))
    return str(p)


def _df(ds):
    return (ds.to_pandas().sort_values("url").reset_index(drop=True))


def test_jsonl_roundtrip_and_extract(ray_session, tmp_path):
    from text_extraction_system_ray.pipelines.extraction import \
        extract_dataset
    from text_extraction_system_ray.sources.altformats import (
        read_pages_jsonl, write_pages_jsonl)
    src = ray.data.read_parquet(_corpus(tmp_path))
    out = str(tmp_path / "jl")
    write_pages_jsonl(src, out)
    back = read_pages_jsonl(out)
    a, b = _df(src), _df(back)
    assert a["url"].tolist() == b["url"].tolist()
    assert a["html"].tolist() == b["html"].tolist()
    # the pipeline treats the re-read dataset identically
    ex = _df(extract_dataset(back.map_batches(lambda t: t)))
    base = _df(extract_dataset(src))
    pd.testing.assert_series_equal(ex["status"], base["status"])
    pd.testing.assert_series_equal(ex["text"], base["text"])


def test_csv_roundtrip(ray_session, tmp_path):
    from text_extraction_system_ray.sources.altformats import (
        read_pages_csv, write_pages_csv)
    src = ray.data.read_parquet(_corpus(tmp_path))
    out = str(tmp_path / "cs")
    write_pages_csv(src, out)
    back = read_pages_csv(out)
    a, b = _df(src), _df(back)
    assert a["url"].tolist() == b["url"].tolist()
    assert a["html"].tolist() == b["html"].tolist()
