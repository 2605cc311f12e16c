"""Unit tests: HTML block parse + boilerplate classification.

Style mirrors the reference's golden-count unit tests
(``data_extract/tests/test_data_extract.py:30-41``)."""
from text_extraction_system_ray.config import DEFAULT_CONFIG as CFG
from text_extraction_system_ray.extract import extract_row
from text_extraction_system_ray.functions.html_extract import (
    classify_blocks, extract_html, parse_html_blocks)


def test_basic_blocks_and_boilerplate():
    html = (b"<html><head><title>T</title><script>var x=1;</script></head><body>"
            b"<nav><a href='/'>Home</a> <a href='/b'>B</a></nav>"
            b"<p>Real content paragraph with enough words to stay.</p>"
            b"<footer>short footer <a href='/x'>x</a></footer></body></html>")
    blocks, title, _ = extract_html(html, CFG)
    assert title == "T"
    assert [b.text for b in blocks] == [
        "Real content paragraph with enough words to stay."]


def test_boilerplate_rescue():
    # long, link-free text inside a nav survives (content rescue)
    long_text = "word " * 30
    html = f"<nav><p>{long_text}</p></nav>".encode()
    blocks, _, _ = extract_html(html, CFG)
    assert len(blocks) == 1


def test_link_farm_dropped_outside_bp():
    html = (b"<div><a href='/1'>one</a> <a href='/2'>two</a> "
            b"<a href='/3'>three</a></div>")
    blocks, _, _ = extract_html(html, CFG)
    assert blocks == []


def test_entities_and_whitespace():
    html = b"<p>Fish &amp; chips\n\t  and   &#65;&#x42;</p>"
    blocks, _, _ = extract_html(html, CFG)
    assert blocks[0].text == "Fish & chips and AB"


def test_pre_preserves_newlines():
    html = b"<pre>line1\n  line2\n</pre>"
    blocks, _, _ = extract_html(html, CFG)
    assert blocks[0].text == "line1\n  line2"
    assert blocks[0].kind == "pre"


def test_br_splits_blocks():
    html = b"<p>one one one<br>two two two</p>"
    blocks, _, _ = extract_html(html, CFG)
    assert [b.text for b in blocks] == ["one one one", "two two two"]


def test_script_style_dropped():
    html = (b"<body><style>.a{color:red}</style><script>if(a<b){}</script>"
            b"<p>kept text here</p><noscript>no</noscript></body>")
    blocks, _, _ = extract_html(html, CFG)
    assert [b.text for b in blocks] == ["kept text here"]


def test_nested_table_capture():
    html = (b"<table><tr><th>H1</th><th>H2</th></tr>"
            b"<tr><td>a</td><td>b</td></tr></table>")
    blocks, _, tables = extract_html(html, CFG)
    assert len(tables) == 1
    assert tables[0].rows == [["H1", "H2"], ["a", "b"]]
    assert tables[0].n_cols == 2
    # cells are also text blocks
    assert [b.text for b in blocks] == ["H1", "H2", "a", "b"]


def test_malformed_html_no_crash():
    html = b"<p>ok <b>unclosed <p>next</i></zzz> tail"
    blocks, _, _ = extract_html(html, CFG)
    assert any("ok" in b.text for b in blocks)


def test_deep_nesting_is_bounded():
    html = b"<div>" * 20000 + b"deep text center" + b"</div>" * 20000
    r = extract_row("u", b"<html><body>" + html + b"</body></html>")
    # either extracted fine (iterative parser) or a clean error row
    assert r["status"] in ("ok", "error")
    if r["status"] == "ok":
        assert "deep text center" in r["text"]


def test_title_fallback_to_h1():
    html = b"<body><h1>The Heading</h1><p>some content text here</p></body>"
    _, title, _ = extract_html(html, CFG)
    assert title == "The Heading"


def test_fast_engine_matches_stdlib_on_corpus():
    """The fast tokenizer drives the same handlers as html.parser; on the
    whole tiny corpus the two engines agree block-for-block (the single
    known divergence class is unterminated-quote malformed tags, where
    both behaviors are defensible and self-consistent)."""
    from tests.gen_fixtures import generate_corpus
    t = generate_corpus("tiny")
    n_checked = 0
    for i in range(t.num_rows):
        url = t.column("url")[i].as_py()
        payload = t.column("html")[i].as_py()
        if not payload or payload[:5] == b"%PDF-" or "/poison/" in url \
                or "/image/" in url or "entities/000007" in url:
            continue
        text = payload.decode("utf-8", errors="replace")
        fast = parse_html_blocks(text, CFG, engine="fast")
        std = parse_html_blocks(text, CFG, engine="stdlib")
        assert [(b.text, b.kind, b.bp) for b in fast[0]] == \
               [(b.text, b.kind, b.bp) for b in std[0]], url
        assert fast[1] == std[1], url
        n_checked += 1
    assert n_checked > 40


def test_unterminated_attr_heavy_tag_is_linear_and_matches_stdlib():
    """ReDoS regression (ADVICE r01): an unterminated tag stuffed with
    stray quotes must tokenize in linear time (the old backtracking attrs
    regex was exponential — hours at ~50 quotes) and agree with stdlib."""
    import time

    bad = "<p>before</p><div " + '" ' * 3000 + "x"
    t0 = time.monotonic()
    fast = parse_html_blocks(bad, CFG, engine="fast")
    elapsed = time.monotonic() - t0
    assert elapsed < 1.0, f"ReDoS: {elapsed:.2f}s for 3000 stray quotes"
    std = parse_html_blocks(bad, CFG, engine="stdlib")
    assert [(b.text, b.kind) for b in fast[0]] == \
           [(b.text, b.kind) for b in std[0]]


def test_truncated_tag_recovery_matches_stdlib():
    """Truncated/malformed start tags: the fast tokenizer mirrors
    html.parser's EOF recovery (emit up to next '>' or '<' as data) and
    its value-position quote rule (quotes open a section only after '=';
    an unterminated value quote makes the tag incomplete)."""
    cases = [
        '<p>a</p><a href="x>y" ',       # unterminated after quoted value
        '<p>a</p><a href="x>after',     # unterminated value quote w/ '>' inside
        '<p>a</p><div foo',             # unterminated bare tag
        '<a href=foo" bar>baz</a>',     # stray quote in bare value
        '<a foo"x>y">z',                # stray quote in attr-name position
        '<p>x</p><a href = "u">link</a>',  # spaces around '='
        "<p>a<span data-x='v>w'>b</span></p>",  # '>' inside quoted value
    ]
    for c in cases:
        fast = parse_html_blocks(c, CFG, engine="fast")
        std = parse_html_blocks(c, CFG, engine="stdlib")
        assert [(b.text, b.kind) for b in fast[0]] == \
               [(b.text, b.kind) for b in std[0]], c
