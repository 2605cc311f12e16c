"""RSS 2.0 / Atom feed parsing (crawl-pipeline source format)."""
import datetime as dt

import pytest

from text_extraction_system_ray.functions.feeds import (
    build_atom, build_rss, feed_item_day, parse_feed)

TS = dt.datetime(2021, 3, 4, 5, 6, 7, tzinfo=dt.timezone.utc)


def test_rss_roundtrip():
    items = [("A & B <c>", "https://x/1", TS),
             ("second", "https://x/2", TS + dt.timedelta(days=2))]
    f = parse_feed(build_rss("My <feed>", items))
    assert f["feed_type"] == "rss"
    assert f["title"] == "My <feed>"
    assert [(t, ln) for t, ln, _ in f["items"]] \
        == [("A & B <c>", "https://x/1"), ("second", "https://x/2")]
    assert f["items"][0][2] == TS


def test_atom_roundtrip():
    items = [("entry", "https://x/9", TS)]
    f = parse_feed(build_atom("T", items))
    assert f["feed_type"] == "atom"
    assert f["items"][0] == ("entry", "https://x/9", TS)


def test_non_feed_and_malformed():
    assert parse_feed(b"<html><body>nope</body></html>") is None
    assert parse_feed(b"not xml at all <<<") is None
    assert parse_feed(b"<rss version='2.0'></rss>") is None  # no channel


def test_bad_dates_null_filled():
    xml = (b'<?xml version="1.0"?><rss version="2.0"><channel>'
           b"<title>t</title>"
           b"<item><title>x</title><link>l</link>"
           b"<pubDate>not a date</pubDate></item>"
           b"<item><title>y</title><link>m</link></item>"
           b"</channel></rss>")
    f = parse_feed(xml)
    assert [ts for _t, _l, ts in f["items"]] == [None, None]
    assert feed_item_day(None) == -1


def test_feed_item_day_epoch_arith():
    assert feed_item_day(dt.datetime(1970, 1, 2,
                                     tzinfo=dt.timezone.utc)) == 1
    assert feed_item_day(dt.datetime(2021, 1, 1,
                                     tzinfo=dt.timezone.utc)) == 18628
    # naive datetimes treated as UTC
    assert feed_item_day(dt.datetime(2021, 1, 1)) == 18628
