"""Atom feed source + replicator (reference: lib/webhookdb/xml.rb,
lib/webhookdb/replicator/atom_single_feed_v1.rb)."""

from __future__ import annotations

from decimal import Decimal

from webhookdb_spark.sources.atom import atom_entries, parse_atom_feed, upsert_atom_feeds
from webhookdb_spark.storage import Warehouse

FEED = """<?xml version="1.0" encoding="utf-8"?>
<feed xmlns="http://www.w3.org/2005/Atom" xmlns:georss="http://www.georss.org/georss">
  <title>Quake reports</title>
  <updated>2024-05-01T10:00:00Z</updated>
  <link rel="self" href="https://example.org/feed"/>
  <author><name>USGS</name></author>
  <entry>
    <id>urn:quake:1</id>
    <title>M 4.2 - somewhere</title>
    <updated>2024-05-01T09:00:00Z</updated>
    <published>2024-05-01T08:30:00Z</published>
    <georss:point>34.12 -118.3</georss:point>
    <link href="https://example.org/quake/1"/>
    <category term="quake" label="Earthquake"/>
    <content type="html">&lt;p&gt;shaking&lt;/p&gt;</content>
  </entry>
  <entry>
    <id>urn:quake:2</id>
    <title>M 2.0 - elsewhere</title>
    <updated>2024-05-01T09:30:00Z</updated>
  </entry>
</feed>
"""


def test_parse_atom_feed_shape():
    feed = parse_atom_feed(FEED)
    assert feed["title"] == "Quake reports"
    assert feed["link"] == {"rel": "self", "href": "https://example.org/feed"}
    assert feed["author"] == {"name": "USGS"}
    e1, e2 = feed["entries"]
    assert e1["id"] == "urn:quake:1"
    assert e1["georss:point"] == "34.12 -118.3"
    assert e1["link"] == {"href": "https://example.org/quake/1"}
    assert e1["category"] == {"term": "quake", "label": "Earthquake"}
    # named entity refs drop wholesale — the reference's own golden
    # behavior (spec/webhookdb/xml_spec.rb:44-72, pinned in
    # test_golden_payloads.py::test_xml_spec_full_feed_golden)
    assert e1["content"] == {"value": "pshaking/p", "type": "html"}
    assert "published" not in e2


def test_atom_entries_dataframe(spark):
    feeds = spark.createDataFrame([("https://example.org/feed", FEED)], "feed_url string, xml string")
    rows = atom_entries(feeds).collect()
    assert len(rows) == 2
    assert all(r.feed_url == "https://example.org/feed" for r in rows)


def test_upsert_atom_feed_geo_and_created_at(spark, tmp_warehouse):
    t = Warehouse(spark, str(tmp_warehouse)).table("org", "atom_single_feed_v1")
    feeds = spark.createDataFrame([("u", FEED)], "feed_url string, xml string")
    res = upsert_atom_feeds(t, feeds)
    assert res.inserted == 2
    rows = {r.entry_id: r for r in t.read().collect()}
    assert rows["urn:quake:1"].geo_lat == Decimal("34.12")
    assert rows["urn:quake:1"].geo_lng == Decimal("-118.3")
    assert rows["urn:quake:2"].geo_lat is None
    created = rows["urn:quake:1"].row_created_at
    assert created is not None

    # re-sync with a newer updated: row updates but row_created_at is
    # kept from the first write (coalesce-on-update)
    res2 = upsert_atom_feeds(
        t,
        spark.createDataFrame(
            [("u", FEED.replace("2024-05-01T09:00:00Z", "2024-06-01T09:00:00Z"))],
            "feed_url string, xml string",
        ),
    )
    assert res2.updated >= 1
    rows2 = {r.entry_id: r for r in t.read().collect()}
    assert rows2["urn:quake:1"].row_created_at == created
    assert rows2["urn:quake:1"].updated.year == 2024 and rows2["urn:quake:1"].updated.month == 6

    # stale feed must not regress rows
    res3 = upsert_atom_feeds(
        t,
        spark.createDataFrame(
            [("u", FEED.replace("2024-05-01T09:00:00Z", "2023-01-01T00:00:00Z"))],
            "feed_url string, xml string",
        ),
    )
    rows3 = {r.entry_id: r for r in t.read().collect()}
    assert rows3["urn:quake:1"].updated.month == 6


def test_parse_atom_feed_nokogiri_entity_contract():
    """The reference's parse drops every NAMED entity ref — valid
    ('&lt;', '&amp;') or broken ('&qu', the truncated ref its own
    fixture embeds, atom_single_feed_v1_spec.rb:21) — while numeric
    character references decode and bare ampersands survive as
    literal text (spec/webhookdb/xml_spec.rb golden; full-hash pin in
    test_golden_payloads.py). Our strict stdlib parser must not choke
    on any of these."""
    feed = parse_atom_feed(
        '<feed xmlns="http://www.w3.org/2005/Atom">'
        "<entry><id>1</id>"
        '<content type="html">&lt;img border=&qu</content>'
        "<title>a &amp; b &#65; AT&T x & y</title>"
        "</entry></feed>"
    )
    e = feed["entries"][0]
    assert e["content"] == {"value": "img border=", "type": "html"}
    # '&amp;' and '&T' are named-ref-shaped → dropped (like the
    # reference's icon '&a'); '&#65;' decodes; a bare '& ' is literal
    assert e["title"] == "a  b A AT x & y"
