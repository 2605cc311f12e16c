"""E2E: the distributed pipeline is byte-identical to the serial oracle.

THE correctness gate of BASELINE.json ("byte-identical extracted text per
url ... verified with pytest against golden fixtures"). The oracle is
``extract_row`` applied serially; the plan under test is read →
map_batches(ExtractText actor pool) [→ explode/groupby] → Arrow.
"""
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from text_extraction_system_ray.extract import extract_row
from text_extraction_system_ray.pipelines.extraction import (
    extract_dataset, extract_dataset_exploded)


def _oracle_map(tiny_corpus):
    out = {}
    for i in range(tiny_corpus.num_rows):
        url = tiny_corpus.column("url")[i].as_py()
        r = extract_row(url, tiny_corpus.column("html")[i].as_py(),
                        tiny_corpus.column("lang")[i].as_py())
        out[url] = r
    return out


def _collect(ds) -> dict:
    rows = {}
    for batch in ds.iter_batches(batch_size=256, batch_format="pyarrow"):
        for i in range(batch.num_rows):
            url = batch.column("url")[i].as_py()
            rows[url] = {
                "text": batch.column("text")[i].as_py(),
                "status": batch.column("status")[i].as_py(),
                "language": batch.column("language")[i].as_py(),
                "char_spans": batch.column("char_spans")[i].as_py(),
                "sentences": batch.column("sentences")[i].as_py(),
                "pages": batch.column("pages")[i].as_py(),
            }
    return rows


@pytest.fixture(scope="module")
def oracle(tiny_corpus):
    return _oracle_map(tiny_corpus)


def test_pipeline_matches_oracle(ray_session, tiny_corpus, oracle):
    ds = ray.data.from_arrow(tiny_corpus).repartition(8)
    got = _collect(extract_dataset(ds))
    assert set(got) == set(oracle)
    for url, o in oracle.items():
        g = got[url]
        assert g["status"] == o["status"], url
        assert g["text"] == o["text"], url          # byte identity
        assert g["language"] == o["language"], url
        spans = np.asarray(g["char_spans"], np.float32).reshape(-1, 4)
        assert np.array_equal(spans, o["char_spans"]), url
        assert g["sentences"] == o["sentences"], url


def test_exploded_path_matches_oracle(ray_session, tiny_corpus, oracle):
    # /dup/ rows share a url → excluded (groupby would merge them;
    # exact-dedup is its own operator)
    mask = [not u.as_py().startswith("https://test.example/dup/")
            for u in tiny_corpus.column("url")]
    tbl = tiny_corpus.filter(pa.array(mask))
    ds = ray.data.from_arrow(tbl).repartition(8)
    got = _collect(extract_dataset_exploded(ds))
    for url in got:
        o, g = oracle[url], got[url]
        assert g["text"] == o["text"], url
        assert g["status"] == o["status"], url
        spans = np.asarray(g["char_spans"], np.float32).reshape(-1, 4)
        assert np.array_equal(spans, o["char_spans"]), url
        assert g["pages"] == o["pages"], url
        assert g["sentences"] == o["sentences"], url
        assert g["language"] == o["language"], url


def test_parallelism_invariance(ray_session, tiny_corpus, oracle):
    # FIXTURES.md §4.5: identical output at different parallelism
    for nparts in (1, 13):
        ds = ray.data.from_arrow(tiny_corpus).repartition(nparts)
        got = _collect(extract_dataset(ds))
        for url, o in oracle.items():
            assert got[url]["text"] == o["text"], (nparts, url)
