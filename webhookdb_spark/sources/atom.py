"""Atom XML feed source (reference: lib/webhookdb/xml.rb Atom parser,
lib/webhookdb/replicator/atom_single_feed_v1.rb:60-66 backfill).

Parsing reproduces the reference's hash shape:

- entry child elements become ``"prefix:name"`` keys holding text
  (namespace PREFIXES, not URIs — ``georss:point``, not
  ``{http://...}point``);
- ``link`` / ``category`` become attribute dicts (+ ``text`` when the
  element has simple text);
- ``content`` becomes ``{value: inner-xml-ish, <attrs>...}``.

Spark-first shape: feeds arrive as (url, xml) rows; a ``mapInPandas``
stage parses each feed ON THE EXECUTORS with the stdlib parser and
yields one envelope row per entry, which flows into the standard
shape→MERGE path. One feed is one row, so 10k feeds parse with
full-cluster parallelism — the reference's one-feed-at-a-time HTTP loop
(atom_single_feed_v1.rb:60-63) becomes an embarrassingly parallel map.
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET
from collections.abc import Iterator
from io import StringIO
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from webhookdb_spark.operators.util import scale_out

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

_SPEC_ATTR = ("link", "category")


# Entity contract pinned by the reference's OWN golden
# (spec/webhookdb/xml_spec.rb:44-72): its Nokogiri parse (xml.rb:18)
# drops EVERY named entity reference from the document — valid
# ('&lt;', '&quot;', '&amp;' vanish from the content value) and
# invalid ('&a' in the icon URL, '&qu' truncated in
# atom_single_feed_v1_spec.rb:21) alike, semicolon or not — while
# numeric character references decode normally. We reproduce exactly
# that: delete named refs before the strict stdlib parse and escape
# any remaining bare '&' so it survives as a literal ampersand.
# CDATA sections are exempt (entity syntax is inert inside them).
_NAMED_REF = re.compile(r"&[A-Za-z][A-Za-z0-9]*;?")
_BARE_AMP = re.compile(r"&(?!#[0-9]+;|#x[0-9a-fA-F]+;)")
_CDATA = re.compile(r"(<!\[CDATA\[.*?\]\]>)", re.S)


def _nokogiri_entity_contract(xml_text: str) -> str:
    parts = _CDATA.split(xml_text)
    return "".join(
        p if p.startswith("<![CDATA[")
        else _BARE_AMP.sub("&amp;", _NAMED_REF.sub("", p))
        for p in parts
    )


def _parse_with_prefixes(xml_text: str):
    """Parse, collecting namespace prefix declarations so element names
    can be rendered as ``prefix:name`` (ElementTree exposes URIs)."""
    uri_to_prefix: dict[str, str] = {}
    it = ET.iterparse(
        StringIO(_nokogiri_entity_contract(xml_text)),
        events=("start-ns", "end"),
    )
    root = None
    for event, payload in it:
        if event == "start-ns":
            prefix, uri = payload
            # first declaration wins, matching document order
            uri_to_prefix.setdefault(uri, prefix)
        else:
            root = payload if root is None else root
    root = it.root  # type: ignore[attr-defined]
    return root, uri_to_prefix


def _fqn(tag: str, uri_to_prefix: dict[str, str]) -> str:
    if tag.startswith("{"):
        uri, name = tag[1:].split("}", 1)
        prefix = uri_to_prefix.get(uri, "")
        return f"{prefix}:{name}" if prefix else name
    return tag


def _text(el: ET.Element) -> str:
    return el.text or ""


def _spec_attr(el: ET.Element) -> dict:
    h = {k: v for k, v in el.attrib.items()}
    if len(el) == 0 and el.text:  # simple text child (self-closed → none)
        h["text"] = el.text
    return h


def _parse_entry(entry: ET.Element, uri_to_prefix: dict[str, str]) -> dict:
    h: dict = {}
    for c in entry:
        name = _fqn(c.tag, uri_to_prefix)
        if name == "content":
            content: dict = {}
            lead = c.text or ""
            if len(c) and not lead.strip():
                lead = ""  # noblanks: whitespace-only node before children
            inner = lead + "".join(
                ET.tostring(cc, encoding="unicode") for cc in c
            )
            # Rails .present? gate (xml.rb:57): whitespace-only inner
            # XML is absent, but non-blank values keep their leading
            # whitespace (xml_spec.rb pins '\n      img border=0 …').
            if inner.strip():
                content["value"] = inner
            content.update(c.attrib)
            h["content"] = content
        elif name.split(":")[-1] in _SPEC_ATTR:
            h[name] = _spec_attr(c)
        else:
            h[name] = "".join(c.itertext())
    return h


def parse_atom_feed(xml_text: str) -> dict:
    """Feed XML → {"entries": [entry-hash…], <feed attrs>…}."""
    root, uri_to_prefix = _parse_with_prefixes(xml_text)
    entries: list[dict] = []
    feed: dict = {"entries": entries}
    for c in root:
        name = _fqn(c.tag, uri_to_prefix)
        if name == "entry":
            entries.append(_parse_entry(c, uri_to_prefix))
        elif name in _SPEC_ATTR:
            feed[name] = _spec_attr(c)
        elif len(c) == 0:
            feed[name] = _text(c)
        else:
            feed[name] = {
                _fqn(cc.tag, uri_to_prefix): _text(cc) for cc in c
            }
    return feed


_ENTRIES_SCHEMA = T.StructType(
    [
        T.StructField("feed_url", T.StringType()),
        T.StructField("body", T.StringType()),
    ]
)


def atom_entries(
    feeds: DataFrame, url_col: str = "feed_url", xml_col: str = "xml"
) -> DataFrame:
    """(feed_url, xml) rows → one (feed_url, body-JSON) envelope row per
    entry, parsed executor-side in Arrow batches."""

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            urls, bodies = [], []
            for url, xml_text in zip(pdf[url_col], pdf[xml_col]):
                for entry in parse_atom_feed(xml_text)["entries"]:
                    urls.append(url)
                    bodies.append(json.dumps(entry))
            yield pd.DataFrame({"feed_url": urls, "body": bodies})

    return scale_out(feeds.select(url_col, xml_col)).mapInPandas(
        parse, schema=_ENTRIES_SCHEMA
    )


def upsert_atom_feeds(table, feeds: DataFrame):
    """Backfill path: feeds → entries → conditional MERGE under
    ATOM_SINGLE_FEED_V1 (bulk conditional upsert,
    atom_single_feed_v1.rb:71-82)."""
    from webhookdb_spark.operators.upsert import upsert_envelopes
    from webhookdb_spark.replicators.atom_single_feed_v1 import ATOM_SINGLE_FEED_V1

    return upsert_envelopes(table, atom_entries(feeds), ATOM_SINGLE_FEED_V1)
