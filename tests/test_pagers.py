"""Unit pins for sources/pagers.py edge semantics the golden
transcripts don't reach: link-header parsing quirks, timestamp-shape
parsing, the convertkit incremental list-hop, and the twilio
empty-page epoch rule. (The URL sequences themselves are pinned
against the reference's own spec transcripts in
test_golden_payloads.py.)"""

from __future__ import annotations

import datetime as dt
import json

from webhookdb_spark.sources.pagers import (
    _paged_to_seen,
    _ts,
    convertkit_subscribers_page_fetcher,
    parse_link_header,
    twilio_page_fetcher,
)


def test_parse_link_header_reference_shapes():
    # shopify.rb:14-24 — next + previous, previous ignored by callers
    h = ('<https://x.test/a.json?limit=2&page_info=abc>; rel="next", '
         '<irrelevant_link>; rel="previous"')
    assert parse_link_header(h) == {
        "next": "https://x.test/a.json?limit=2&page_info=abc",
        "previous": "irrelevant_link",
    }
    # github: single rel
    assert parse_link_header('<https://g.test?page=2>; rel="next"') == {
        "next": "https://g.test?page=2"}
    # malformed sections are skipped, not fatal
    assert parse_link_header("junk") == {}
    assert parse_link_header("<only-url-no-rel>") == {}


def test_ts_accepts_reference_timestamp_shapes():
    utc = dt.timezone.utc
    assert _ts("2021-03-31T10:06:08.582-07:00") == dt.datetime(
        2021, 3, 31, 17, 6, 8, 582000, tzinfo=utc)
    assert _ts("2021-09-20T10:06:08.582Z") == dt.datetime(
        2021, 9, 20, 10, 6, 8, 582000, tzinfo=utc)
    # twilio RFC-2822 date_created
    assert _ts("Mon, 13 Sep 2021 20:55:47 +0000") == dt.datetime(
        2021, 9, 13, 20, 55, 47, tzinfo=utc)
    # intercom unix seconds
    assert _ts(1609459200) == dt.datetime(2021, 1, 1, tzinfo=utc)
    # naive datetime treated as UTC
    assert _ts(dt.datetime(2020, 1, 1)) == dt.datetime(2020, 1, 1, tzinfo=utc)


def test_paged_to_seen_empty_page_counts_as_epoch():
    # transistor_episode_v1.rb:184 — empty page -> Time.at(0), which is
    # older than any real cursor, so incremental paging stops
    assert _paged_to_seen([], "created_at", "2020-01-01T00:00:00Z")
    assert not _paged_to_seen([], "created_at", None)


def test_convertkit_incremental_hops_lists_instead_of_stopping():
    """convertkit_subscriber_v1.rb:175-186 — paging past the cursor on
    the SUBSCRIBED list hops to (cancelled, 1); on the CANCELLED list
    it ends; and updated_from rides the incremental URL."""
    urls = []

    def http_get(url):
        urls.append(url)
        return json.dumps({
            "page": 1, "total_pages": 5,
            "subscribers": [
                {"id": 1, "created_at": "2019-01-01T00:00:00Z"}],
        })

    fetch = convertkit_subscribers_page_fetcher(http_get, "sek")
    last = "2020-01-01T00:00:00Z"
    subs, tok = fetch(None, last)          # subscribed page 1, all old
    assert tok == ("cancelled", 1)
    assert "updated_from=2020-01-01T00:00:00Z" in urls[0]
    assert "sort_field" not in urls[0]
    subs, tok = fetch(tok, last)           # cancelled page 1, all old
    assert tok is None
    assert "sort_field=cancelled_at" in urls[1]


def test_twilio_first_url_caps_datesend_at_utc_plus_2d():
    urls = []

    def http_get(url):
        urls.append(url)
        return json.dumps({"messages": [], "next_page_uri": None})

    frozen = dt.datetime(2020, 11, 22, 23, 59, tzinfo=dt.timezone.utc)
    fetch = twilio_page_fetcher(http_get, "AC1", now=lambda: frozen)
    fetch(None, None)
    assert urls[0] == ("https://api.twilio.com/2010-04-01/Accounts/AC1/"
                       "Messages.json?PageSize=100&DateSend%3C=2020-11-24")
