"""Per-family backfill pagers — the reference's ``_fetch_backfill_page``
implementations re-expressed as transport-injectable ``PageFetcher``
builders for :class:`webhookdb_spark.sources.backfill.Backfiller`.

Each builder mirrors one reference family byte for byte at the
pagination level: how the first URL is formed, where the continuation
token lives (Link header, cursor field, page number, next-path), and
the family's incremental early-stop rule. The HTTP transport is a
plain callable so drivers plug requests/urllib and tests replay the
reference's own golden page transcripts.

Transport signatures (kept minimal per family):

- ``http_get(url) -> str``                      body only
- ``http_get(url) -> (str, dict)``              body + response headers
  (families whose continuation rides the Link header)
- ``http_get(url_or_page, query) -> ...``       families that pass a
  query dict separately

HTTP errors surface as :class:`HttpStatusError` so a family's
tolerated statuses (sponsy 404, intercom 403 / suspended 401) can be
absorbed exactly where the reference absorbs them.

Scale note: pagination is inherently driver-side sequential HTTP (the
cursor and the rate limit live with the token); everything fetched
flows into the same distributed shape-and-merge as streaming intake.
"""

from __future__ import annotations

import datetime as dt
import json
from collections.abc import Callable
from urllib.parse import quote


class HttpStatusError(RuntimeError):
    """A non-2xx HTTP response, carrying enough for family-specific
    tolerance rules (intercom_v1_mixin.rb:95-126, sponsy 404)."""

    def __init__(self, status: int, body: str = "", parsed=None):
        super().__init__(f"HTTP {status}")
        self.status = status
        self.body = body
        self.parsed = parsed if parsed is not None else _maybe_json(body)


def _maybe_json(body: str):
    try:
        return json.loads(body)
    except (ValueError, TypeError):
        return None


def parse_link_header(header: str) -> dict[str, str]:
    """``Link: <url>; rel="next", <url>; rel="previous"`` → {rel: url}
    (shopify.rb:14-24 / github.rb — both use the same split-on-comma
    parser)."""
    import re

    out: dict[str, str] = {}
    for part in header.split(","):
        section = part.split(";")
        if len(section) < 2:
            continue
        m_url = re.search(r"<(.*)>", section[0])
        m_rel = re.search(r'rel="(.*)"', section[1])
        if m_url and m_rel:
            out[m_rel.group(1)] = m_url.group(1)
    return out


def _ts(v) -> dt.datetime:
    """Parse the reference's timestamp shapes (ISO string with any
    offset, RFC-2822 string, unix seconds, datetime) to an aware UTC
    datetime for early-stop comparisons."""
    if isinstance(v, dt.datetime):
        t = v
    elif isinstance(v, (int, float)):
        return dt.datetime.fromtimestamp(v, dt.timezone.utc)
    else:
        s = str(v)
        try:
            t = dt.datetime.fromisoformat(s.replace("Z", "+00:00"))
        except ValueError:
            from email.utils import parsedate_to_datetime

            t = parsedate_to_datetime(s)
    if t.tzinfo is None:
        t = t.replace(tzinfo=dt.timezone.utc)
    return t


def _paged_to_seen(items, created_key: str, last_backfilled) -> bool:
    """The shared "newest-first list paged past the cursor" rule
    (transistor_episode_v1.rb:183-188, twilio_sms_v1.rb:141-146,
    convertkit_subscriber_v1.rb:175-186): compare the page's OLDEST
    item timestamp against last_backfilled; empty page counts as
    epoch (older than everything)."""
    if not last_backfilled:
        return False
    earliest = (
        dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        if not items
        else _ts(items[-1][created_key])
    )
    return earliest < _ts(last_backfilled)


def shopify_page_fetcher(
    http_get: Callable[[str], tuple[str, dict]],
    api_url: str,
    backfill_path: str,
    items_key: str,
):
    """shopify_v1_mixin.rb:139-159 — first page at
    ``api_url + backfill_path``; continuation is the FULL url from the
    response's ``Link: ...; rel="next"`` header. ``http_get(url) ->
    (body, headers)`` (headers lower-cased by the transport or not —
    both checked)."""

    def fetch(token, _last):
        url = token or (api_url + backfill_path)
        body, headers = http_get(url)
        data = json.loads(body)
        link = headers.get("link") or headers.get("Link")
        nxt = parse_link_header(link).get("next") if link else None
        return data[items_key], nxt

    return fetch


def github_page_fetcher(
    http_get: Callable[[str, dict], tuple[str, dict]],
    repo: str,
    backfill_path: str,
    query_params: Callable[[object], dict] | None = None,
):
    """github_repo_v1_mixin.rb:178-194 — first page at
    ``https://api.github.com/repos/<repo><path>?per_page=100`` plus the
    replicator's query params (issues/pulls add ``state=all`` and, in
    incremental mode, ``sort=updated&since=<iso>`` —
    github_issue_v1.rb:16-22); continuation is the Link rel="next" full
    URL with no extra query. ``http_get(url, query) -> (body, headers)``.
    The response body is the items array itself."""

    def fetch(token, last_backfilled):
        if token:
            url, query = token, {}
        else:
            url = f"https://api.github.com/repos/{repo}{backfill_path}"
            query = {"per_page": 100}
            if query_params:
                query.update(query_params(last_backfilled))
        body, headers = http_get(url, query)
        data = json.loads(body)
        link = headers.get("link") or headers.get("Link")
        nxt = parse_link_header(link).get("next") if link else None
        return data, nxt

    return fetch


def github_issue_query_params(last_backfilled) -> dict:
    """github_issue_v1.rb:16-22 / github_pull_v1.rb — ``state=all``
    always; incremental adds ``sort=updated&since=<utc iso8601>``."""
    q = {"state": "all"}
    if last_backfilled:
        q["sort"] = "updated"
        q["since"] = _ts(last_backfilled).astimezone(dt.timezone.utc).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )
    return q


def intercom_page_fetcher(
    http_get: Callable[[str, dict], str],
    url: str,
    items_key: str,
    per_page: int = 20,
):
    """intercom_v1_mixin.rb:78-136 — ``?per_page=N`` with the
    ``starting_after`` cursor from ``pages.next.starting_after``;
    newest-first ``updated_at`` (unix seconds) early-stop; a 403 ("api
    plan restricted") and a 401 whose errors include token_suspended
    both degrade to an empty final page instead of failing the job."""

    def fetch(token, last_backfilled):
        query = {"per_page": per_page}
        if token:
            query["starting_after"] = token
        try:
            data = json.loads(http_get(url, query))
        except HttpStatusError as e:
            if e.status == 403:
                return [], None
            errors = (e.parsed or {}).get("errors") or []
            if e.status == 401 and any(
                er.get("code") == "token_suspended" for er in errors
            ):
                return [], None
            raise
        items = data[items_key]
        nxt = (data.get("pages") or {}).get("next", {})
        nxt = nxt.get("starting_after") if isinstance(nxt, dict) else None
        if last_backfilled and items and items[-1].get("updated_at"):
            if _ts(items[-1]["updated_at"]) < _ts(last_backfilled):
                nxt = None
        return items, nxt

    return fetch


def increase_page_fetcher(
    http_get: Callable[[str, dict], str],
    url: str,
    now: Callable[[], dt.datetime] | None = None,
):
    """increase_v1_mixin.rb:79-100 — ``?cursor=<tok>``; continuation at
    ``response_metadata.next_cursor``; every backfilled row's
    ``updated_at`` is STAMPED with the fetch time (backfills cannot
    reconstruct update history, so the rows must look fresh to the
    staleness guard)."""

    def fetch(token, _last):
        query = {"cursor": token} if token else {}
        fetched_at = (now or _utcnow)()
        data = json.loads(http_get(url, query))
        rows = data["data"]
        for r in rows:
            r["updated_at"] = fetched_at.strftime("%Y-%m-%dT%H:%M:%SZ")
        return rows, (data.get("response_metadata") or {}).get("next_cursor")

    return fetch


def _utcnow() -> dt.datetime:
    return dt.datetime.now(dt.timezone.utc)


def convertkit_subscribers_page_fetcher(
    http_get: Callable[[str], str],
    api_secret: str,
):
    """convertkit_subscriber_v1.rb:161-199 — the dual-list walk: pages
    of the ``subscribed`` list (sort_order=desc), then pages of the
    ``cancelled`` list (adds ``sort_field=cancelled_at``). The token is
    the composite ``(list, page)``; incremental adds ``updated_from``
    and early-stops each list on created_at, hopping subscribed →
    cancelled instead of finishing."""

    def fetch(token, last_backfilled):
        lst, page = token or ("subscribed", 1)
        url = (
            "https://api.convertkit.com/v3/subscribers"
            f"?api_secret={api_secret}&page={page}&sort_order=desc"
        )
        if last_backfilled:
            url += "&updated_from=" + _ts(last_backfilled).astimezone(
                dt.timezone.utc
            ).strftime("%Y-%m-%dT%H:%M:%SZ")
        if lst == "cancelled":
            url += "&sort_field=cancelled_at"
        data = json.loads(http_get(url))
        subs = data["subscribers"]
        if _paged_to_seen(subs, "created_at", last_backfilled):
            if lst == "subscribed":
                return subs, ("cancelled", 1)
            return subs, None
        if data["page"] < data["total_pages"]:
            return subs, (lst, data["page"] + 1)
        if lst == "subscribed":
            return subs, ("cancelled", 1)
        return subs, None

    return fetch


def email_octopus_page_fetcher(
    http_get: Callable[[str], str],
    api_key: str,
    first_path: str,
    base_url: str = "https://emailoctopus.com",
    limit: int = 100,
):
    """email_octopus_list_v1.rb:75-88 (campaign/contact identical) —
    the token IS the next endpoint path from ``paging.next``; the
    first path carries the api key and limit."""

    def fetch(token, _last):
        path = token or first_path.format(api_key=api_key, limit=limit)
        data = json.loads(http_get(base_url + path))
        return data["data"], (data.get("paging") or {}).get("next")

    return fetch


def sponsy_page_fetcher(
    http_get: Callable[[str, dict], str],
    api_url: str,
    tail: str,
    page_size: int = 100,
):
    """sponsy_v1_mixin.rb:81-109 — ``afterCursor`` pagination ordered
    updatedAt DESC; a 404 absorbs to done (deleted publication); no
    cursor → done; empty page with a cursor → done; incremental stops
    once the page's last updatedAt predates the cursor."""

    def fetch(token, last_backfilled):
        try:
            body = http_get(
                api_url + tail,
                {
                    "limit": str(page_size),
                    "afterCursor": token,
                    "orderBy": "updatedAt",
                    "orderDirection": "DESC",
                },
            )
        except HttpStatusError as e:
            if e.status == 404:
                return [], None
            raise
        parsed = json.loads(body)
        data = parsed["data"]
        after = (parsed.get("cursor") or {}).get("afterCursor")
        if after is None:
            return data, None
        if not data:
            return [], None
        if last_backfilled and _ts(data[-1]["updatedAt"]) < _ts(last_backfilled):
            return data, None
        return data, after

    return fetch


def twilio_page_fetcher(
    http_get: Callable[[str], str],
    account_key: str,
    base_url: str = "https://api.twilio.com",
    first_path: str | None = None,
    now: Callable[[], dt.datetime] | None = None,
):
    """twilio_sms_v1.rb:120-150 (signalwire_message_v1.rb:161-181 is
    the same shape with a laml path prefix, passed via first_path) —
    the first URL caps DateSend at utc+2d ("tomorrow the day after",
    handling non-UTC hosts); continuation is the API's relative
    ``next_page_uri`` appended to the host; newest-first
    ``date_created`` (RFC-2822) early-stop."""

    def fetch(token, last_backfilled):
        if token:
            urltail = token
        else:
            date_send_max = ((now or _utcnow)() + dt.timedelta(days=2)).date()
            path = first_path or f"/2010-04-01/Accounts/{account_key}/Messages.json"
            urltail = f"{path}?PageSize=100&DateSend{quote('<')}={date_send_max}"
        data = json.loads(http_get(base_url + urltail))
        messages = data["messages"]
        if _paged_to_seen(messages, "date_created", last_backfilled):
            return messages, None
        return messages, data.get("next_page_uri")

    return fetch
