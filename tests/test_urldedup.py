"""URL canonicalization rules N1-N5 (vectorized normalizer)."""
import pyarrow as pa

from text_extraction_system_ray.pipelines.urldedup import normalize_urls


def _n(urls):
    return normalize_urls(pa.array(urls, pa.string())).to_pylist()


def test_case_and_default_port():
    assert _n(["HTTPS://EXAMPLE.ORG:443/A/b"]) == ["https://example.org/A/b"]
    assert _n(["HTTP://Example.Org:80/x"]) == ["http://example.org/x"]
    # non-default port kept; path case preserved
    assert _n(["https://example.org:8443/P"]) == ["https://example.org:8443/P"]
    assert _n(["http://example.org:443/x"]) == ["http://example.org:443/x"]


def test_fragment_dropped():
    assert _n(["https://e.org/p#sec2"]) == ["https://e.org/p"]
    assert _n(["https://e.org/p?a=1#sec"]) == ["https://e.org/p?a=1"]


def test_tracking_params_dropped_and_sorted():
    assert _n(["https://e.org/p?utm_source=x&b=2&a=1&fbclid=z"]) == \
        ["https://e.org/p?a=1&b=2"]
    assert _n(["https://e.org/p?gclid=1&utm_campaign=c&ref=tw"]) == \
        ["https://e.org/p"]
    # sort is lexicographic on the whole 'k=v' token
    assert _n(["https://e.org/p?b=1&a=2&aa=3"]) == \
        ["https://e.org/p?a=2&aa=3&b=1"]


def test_empty_and_mixed_batch():
    got = _n(["https://e.org/", "HTTPS://E.ORG:443/?utm_source=1",
              "https://e.org/q?z=9&y=8"])
    assert got == ["https://e.org/", "https://e.org/",
                   "https://e.org/q?y=8&z=9"]


def test_normalize_idempotent_and_total():
    """Property: normalization is idempotent and never raises on junk."""
    import random
    rng = random.Random(7)
    atoms = ["https://", "HTTP://", "e.ORG", ":443", ":80", ":8080", "/p",
             "?", "&", "a=1", "b=2", "utm_source=x", "#f", "%20", "//",
             "", "x y", "☃", ":", "="]
    urls = ["".join(rng.choice(atoms) for _ in range(rng.randint(1, 8)))
            for _ in range(500)]
    once = normalize_urls(pa.array(urls, pa.string())).to_pylist()
    twice = normalize_urls(pa.array(once, pa.string())).to_pylist()
    assert once == twice


def test_ipv6_and_userinfo_hosts_not_collapsed():
    got = _n(["https://[2001:db8::1]/p", "https://[2001:db8::2]/p",
              "https://user:pw@e.org/p"])
    assert got[0] != got[1]
    assert got[0] == "https://[2001:db8::1]/p"
    # unsplittable authority passes through whole, never ''
    assert "user:pw@e.org" in got[2]
