"""Invariant tests over the whole tiny corpus (FIXTURES.md §4)."""
import numpy as np
import pytest

from text_extraction_system_ray.extract import extract_row


def _rows(tiny_corpus):
    for i in range(tiny_corpus.num_rows):
        yield (tiny_corpus.column("url")[i].as_py(),
               tiny_corpus.column("html")[i].as_py(),
               tiny_corpus.column("lang")[i].as_py())


def test_corpus_invariants(tiny_corpus):
    for url, payload, lang in _rows(tiny_corpus):
        r = extract_row(url, payload, lang)
        # I1: span alignment
        assert r["char_spans"].shape == (len(r["text"]), 4), url
        # I2: pages partition text; non-empty page text ends \n\f or \f
        pos = 0
        for p in r["pages"]:
            assert p["start"] == pos, url
            pos = p["end"]
            seg = r["text"][p["start"]:p["end"]]
            assert seg.endswith("\x0c"), url
        assert pos == len(r["text"]), url
        # I3: no NULs
        assert "\x00" not in r["text"], url
        # I4: spans in range; sections sorted
        for coll in ("sentences", "paragraphs"):
            for s in r[coll]:
                assert 0 <= s["start"] <= s["end"] <= len(r["text"]), url
        starts = [s["start"] for s in r["sections"]]
        assert starts == sorted(starts), url
        # I7: poison rows never crash; unparseable payloads error cleanly
        if "/poison/" in url:
            assert r["status"] in ("ok", "error"), url
            if payload.startswith(b"%PDF-") or payload[:1] == b"\x00":
                assert r["status"] == "error", url


def test_multilang_forced_propagation(tiny_corpus):
    # FIXTURES.md §4.6 / ref test_data_extract.py:45-57
    for url, payload, lang in _rows(tiny_corpus):
        if "/multilang/" not in url:
            continue
        r = extract_row(url, payload, lang)
        if lang:
            assert r["language"] == lang
            assert all(s["language"] == lang for s in r["sentences"])
            assert all(p["language"] == lang for p in r["paragraphs"])
        else:
            langs = {p["language"] for p in r["paragraphs"]}
            # seeded corpus has en/de/ru/uk/fr/es paragraphs
            assert {"en", "de", "ru", "uk", "fr", "es"} <= langs


def test_empty_rows(tiny_corpus):
    for url, payload, lang in _rows(tiny_corpus):
        if "/empty/" not in url:
            continue
        r = extract_row(url, payload, lang)
        assert r["status"] == "ok"
        assert r["text"] == ""
        assert r["language"] == "en"
        assert r["sentences"] == [] and r["pages"] == []


def test_determinism_repeat(tiny_corpus):
    for url, payload, lang in _rows(tiny_corpus):
        a = extract_row(url, payload, lang)
        b = extract_row(url, payload, lang)
        assert a["text"] == b["text"]
        assert np.array_equal(a["char_spans"], b["char_spans"])
        assert a["sentences"] == b["sentences"]
