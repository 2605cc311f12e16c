"""URL parse stage: grammar edges on hand-built URLs + blocklist filter."""
import pyarrow as pa


def _parse(urls):
    from text_extraction_system_ray.pipelines.urlstats import parse_urls
    t = pa.table({"doc_id": pa.array(range(len(urls)), pa.int64()),
                  "url": pa.array(urls, pa.string())})
    return parse_urls(t).to_pandas()


def test_parse_edges():
    df = _parse([
        "https://www.Site3.CO.UK:8080/a/b/c?x=1&y=2&z=3",
        "http://site9.org",
        "https://site13.io/p",
        "http://host.com?only=query",
    ])
    assert df["host"].tolist() == ["www.site3.co.uk", "site9.org",
                                   "site13.io", "host.com"]
    assert df["port"].tolist() == [8080, 80, 443, 80]
    assert df["registered_domain"].tolist() == [
        "site3.co.uk", "site9.org", "site13.io", "host.com"]
    assert df["tld"].tolist() == ["co.uk", "org", "io", "com"]
    assert df["path_depth"].tolist() == [3, 0, 1, 0]
    assert df["n_query_params"].tolist() == [3, 0, 0, 1]
    assert df["is_blocked"].tolist() == [False, False, True, False]


def test_filter_blocked(ray_session):
    import ray.data
    from text_extraction_system_ray.pipelines.urlstats import (
        filter_blocked, parse_urls)
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "url": pa.array(["https://site13.io/x",
                                   "https://keep.me/y"], pa.string())})
    out = filter_blocked(
        ray.data.from_arrow(parse_urls(t))).to_pandas()
    assert out["host"].tolist() == ["keep.me"]
