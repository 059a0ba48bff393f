"""Webhook signature verification (reference: per-service
``webhook_response`` implementations, base.rb:114-136 dispatch).

Schemes reproduced from the reference:

- **GitHub** (github.rb:18-20): ``X-Hub-Signature-256: sha256=<hex>``
  of HMAC-SHA256(body).
- **Stripe** (stripe.rb:19-35 via Stripe::Webhook): header
  ``Stripe-Signature: t=<ts>,v1=<hex>[,v1=<hex>…]``; signature =
  HMAC-SHA256 over ``"{t}.{body}"``; any v1 may match and the
  timestamp must be within tolerance (300 s default).
- **Shopify** (shopify.rb:31-34): ``X-Shopify-Hmac-SHA256``, base64 of
  the HMAC-SHA256 digest.
- **Front** (front.rb:28-41): ``X-Front-Signature`` = base64
  HMAC-SHA256 over ``"{X-Front-Request-Timestamp}:{body}"``.
- **Intercom** (intercom.rb:15-24): ``X-Hub-Signature`` =
  ``sha1=<hex>`` of HMAC-SHA1(body).
- **Increase** (increase.rb:40-88): ``Increase-Webhook-Signature`` =
  ``t=<rfc3339>,v1=<hex>[,v1=…]``; signature = HMAC-SHA256 over
  ``"{t_iso}.{body}"``; timestamp must be within (-35 d, +4 d).

- **Twilio** (twilio_sms_v1.rb:20-44): the reference authenticates
  Twilio webhooks with HTTP Basic auth against the integration's
  webhook secret (not Twilio's URL-signing scheme). Reproduced as
  ``verify_twilio_basic``. The public ``X-Twilio-Signature`` scheme
  (base64 HMAC-SHA1 over URL + sorted POST params) is ALSO provided as
  ``verify_twilio_signature``, reconstructing the signed URL from the
  envelope's forwarded-proto/host headers + request_path.

All comparisons are constant-time. The ingest-path stage is an
Arrow-batched verdict column over the envelope stream: rejected rows
keep a reason (the ``Whdb-Rejected-Reason`` header analog,
api/helpers.rb:208-211) and stay in the audit log; only accepted rows
flow to replication. Verification is per-row compute with secrets
broadcast to executors — no shuffle at any scale.
"""

from __future__ import annotations

import hashlib
import hmac as hmac_mod
from base64 import b64encode
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_STRIPE_TOLERANCE_S = 300


def verify_github(body: str, sig_header: str | None, secret: str) -> str | None:
    """None = verified; otherwise the rejection reason."""
    if not sig_header:
        return "missing sha256"
    digest = hmac_mod.new(secret.encode(), body.encode(), hashlib.sha256).hexdigest()
    if hmac_mod.compare_digest("sha256=" + digest, sig_header):
        return None
    return "invalid sha256"


def verify_shopify(body: str, sig_header: str | None, secret: str) -> str | None:
    if not sig_header:
        return "missing hmac"
    digest = b64encode(
        hmac_mod.new(secret.encode(), body.encode(), hashlib.sha256).digest()
    ).decode()
    if hmac_mod.compare_digest(digest, sig_header):
        return None
    return "invalid hmac"


def verify_stripe(
    body: str,
    sig_header: str | None,
    secret: str,
    now_ts: int,
    tolerance_s: int = DEFAULT_STRIPE_TOLERANCE_S,
) -> str | None:
    if not sig_header:
        return "missing hmac"
    ts, v1s = None, []
    for part in sig_header.split(","):
        k, _, v = part.strip().partition("=")
        if k == "t":
            ts = v
        elif k == "v1":
            v1s.append(v)
    if ts is None or not v1s:
        return "invalid hmac"
    expected = hmac_mod.new(
        secret.encode(), f"{ts}.{body}".encode(), hashlib.sha256
    ).hexdigest()
    if not any(hmac_mod.compare_digest(expected, v) for v in v1s):
        return "invalid hmac"
    try:
        if abs(now_ts - int(ts)) > tolerance_s:
            return "timestamp outside tolerance"
    except ValueError:
        return "invalid hmac"
    return None


def verify_front(
    body: str, sig_header: str | None, ts_header: str | None, secret: str
) -> str | None:
    if not sig_header:
        return "missing signature"
    base = f"{ts_header or ''}:{body}"
    digest = b64encode(
        hmac_mod.new(secret.encode(), base.encode(), hashlib.sha256).digest()
    ).decode()
    if hmac_mod.compare_digest(digest, sig_header):
        return None
    return "invalid signature"


def verify_intercom(body: str, sig_header: str | None, secret: str) -> str | None:
    if not sig_header:
        return "missing hmac"
    digest = hmac_mod.new(secret.encode(), body.encode(), hashlib.sha1).hexdigest()
    if hmac_mod.compare_digest("sha1=" + digest, sig_header):
        return None
    return "invalid hmac"


INCREASE_OLD_CUTOFF_S = 35 * 86400
INCREASE_NEW_CUTOFF_S = 4 * 86400


def verify_increase(
    body: str, sig_header: str | None, secret: str, now_ts: int
) -> str | None:
    import datetime as _dt

    if not sig_header:
        return "missing header"
    t_iso, v1s = None, []
    for part in sig_header.split(","):
        k, _, v = part.strip().partition("=")
        if k == "t":
            t_iso = v
        elif k == "v1":
            v1s.append(v)
    if t_iso is None:
        return "missing timestamp"
    if not v1s:
        return "missing signatures"
    try:
        t = _dt.datetime.fromisoformat(t_iso.replace("Z", "+00:00"))
    except ValueError:
        return "missing timestamp"
    ts = t.timestamp()
    if ts < now_ts - INCREASE_OLD_CUTOFF_S:
        return "too old"
    if ts > now_ts + INCREASE_NEW_CUTOFF_S:
        return "too new"
    # The reference signs the PARSED time re-serialized as UTC ISO8601
    # (Increase.compute_signature: t.utc.iso8601), not the raw header
    # string — a t= with a non-Z offset or fractional seconds must still
    # verify against the canonical form.
    if t.tzinfo is None:
        t = t.replace(tzinfo=_dt.timezone.utc)
    t_signed = t.astimezone(_dt.timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
    expected = hmac_mod.new(
        secret.encode(), f"{t_signed}.{body}".encode(), hashlib.sha256
    ).hexdigest()
    if any(hmac_mod.compare_digest(expected, v) for v in v1s):
        return None
    return "invalid signature"


def verify_email_octopus(body: str, sig_header: str | None, secret: str) -> str | None:
    """EmailOctopus scheme (email_octopus.rb:16-22 via
    email_octopus_event_v1.rb:109-117): ``sha256=<hex HMAC-SHA256>``
    over the raw body."""
    if sig_header is None:
        return "missing signature"
    digest = hmac_mod.new(secret.encode(), body.encode(), hashlib.sha256).hexdigest()
    if hmac_mod.compare_digest("sha256=" + digest, sig_header):
        return None
    return "invalid signature"


def verify_plivo_v2(
    sig_header: str | None,
    nonce_header: str | None,
    auth_token: str,
    url: str,
) -> str | None:
    """Plivo X-Plivo-Signature-V2 (plivo.rb:27-51): base64(HMAC-SHA256(
    auth_token, canonical_url + nonce)) where the canonical URL is
    rebuilt from ONLY scheme+host+path — the query string AND any
    non-default port drop out (URI::HTTPS.build(host:, path:)), exactly
    as the reference copies from plivo-ruby."""
    from urllib.parse import urlsplit

    if not auth_token:
        raise ValueError("auth_token cannot be nil/blank")
    if sig_header is None:
        return "missing signature"
    if nonce_header is None:
        return "missing nonce"
    parts = urlsplit(url.split("?")[0])
    canonical = f"{parts.scheme}://{parts.hostname or ''}{parts.path}"
    digest = b64encode(
        hmac_mod.new(
            auth_token.encode(), (canonical + nonce_header).encode(), hashlib.sha256
        ).digest()
    ).decode()
    if hmac_mod.compare_digest(digest, sig_header):
        return None
    return "invalid signature"


# postmark.rb:10-13 — the published Postmark webhook source IPs.
POSTMARK_ALLOWED_IPS = (
    "127.0.0.1", "3.134.147.250", "50.31.156.6", "50.31.156.77",
    "18.217.206.57",
)


def verify_postmark_ip(ip: str | None) -> str | None:
    """Postmark verifies by SOURCE IP, not signature (postmark.rb:15-19)."""
    if ip in POSTMARK_ALLOWED_IPS:
        return None
    return "invalid ip"


def verify_standard_secret(hdr_secret: str | None, secret: str) -> str | None:
    """The Whdb-Webhook-Secret header equality check
    (webhook_response.rb:15-21, used by icalendar_calendar_v1)."""
    if hdr_secret is None:
        return "missing secret header"
    if hmac_mod.compare_digest(secret, hdr_secret):
        return None
    return "secret mismatch"


def verify_whdb_customer(hdr_secret: str | None, secret: str) -> str | None:
    """webhookdb_customer_v1.rb:17-22 — plain Whdb-Secret equality
    (reference uses ==, not constant-time; we keep compare_digest)."""
    if hdr_secret is None:
        return "Whdb-Secret header is missing"
    if hmac_mod.compare_digest(secret, hdr_secret):
        return None
    return "Whdb-Secret value does not match configured secret"


def verify_twilio_basic(auth_header: str | None, secret: str) -> str | None:
    """Reference-faithful Twilio check (twilio_sms_v1.rb:20-44): the
    webhook must carry HTTP Basic auth whose decoded ``user:pass`` equals
    the integration's webhook secret. 401 "challenge" when absent, 401
    "invalid" on mismatch, 202 otherwise."""
    from base64 import b64decode

    if auth_header is None or not auth_header.startswith("Basic "):
        return "challenge"
    try:
        user_and_pass = b64decode(auth_header[len("Basic "):]).decode()
    except Exception:
        return "invalid"
    if hmac_mod.compare_digest(user_and_pass, secret):
        return None
    return "invalid"


def verify_twilio_signature(
    body: str,
    sig_header: str | None,
    auth_token: str,
    url: str,
) -> str | None:
    """Twilio's public ``X-Twilio-Signature`` scheme (the reference takes
    the Basic-auth path above instead; this covers users pointing real
    Twilio webhooks at the intake): base64(HMAC-SHA1(auth_token,
    url + concat(sorted POST param key+value)))."""
    from urllib.parse import parse_qsl

    if not sig_header:
        return "missing signature"
    signed = url
    if body:
        for k, v in sorted(parse_qsl(body, keep_blank_values=True)):
            signed += k + v
    digest = b64encode(
        hmac_mod.new(auth_token.encode(), signed.encode(), hashlib.sha1).digest()
    ).decode()
    if hmac_mod.compare_digest(digest, sig_header):
        return None
    return "invalid signature"


def _twilio_url_from_envelope(headers: dict, request_path: str) -> str:
    """Reconstruct the signed URL from proxy headers + request path.

    Twilio signs the exact public URL it POSTed to; behind a proxy that
    is scheme://host/path[?query] from the forwarded headers."""
    proto = headers.get("x-forwarded-proto") or "https"
    host = headers.get("host") or headers.get("x-forwarded-host") or ""
    return f"{proto}://{host}{request_path or ''}"


# header each scheme reads (lower-cased; envelope headers are a map)
SCHEME_HEADERS = {
    "github": "x-hub-signature-256",
    "stripe": "stripe-signature",
    "shopify": "x-shopify-hmac-sha256",
    "front": "x-front-signature",
    "intercom": "x-hub-signature",
    "increase": "increase-webhook-signature",
    "twilio": "authorization",
    "twilio_signature": "x-twilio-signature",
    "email_octopus": "emailoctopus-signature",
    "plivo": "x-plivo-signature-v2",
    "postmark": "remote-addr",
    "standard_secret": "whdb-webhook-secret",
    "whdb_customer": "whdb-secret",
}


def verify_envelopes(
    envelopes: DataFrame,
    secrets: dict[str, tuple[str, str]],
    now_ts: int | None = None,
) -> DataFrame:
    """Adds ``_reject_reason`` (NULL = verified) per envelope.

    ``secrets`` maps integration_opaque_id → (scheme, secret).
    Unknown integrations are rejected, matching the reference's 401 on
    unknown opaque ids. Arrow-batched; secrets ride the closure
    (broadcast) so the stage is narrow.
    """
    verifiers: dict[str, Callable[..., str | None]] = {}

    def make(scheme: str, secret: str):
        # each returns fn(body, headers, path, now) -> reason|None; `now`
        # is resolved PER BATCH inside the executor closure — capturing it
        # at plan-build time would evaluate the Stripe/Increase timestamp
        # windows against an ever-staler clock on a long-running stream.
        if scheme == "github":
            return lambda body, h, p, now: verify_github(
                body, h.get("x-hub-signature-256"), secret)
        if scheme == "shopify":
            return lambda body, h, p, now: verify_shopify(
                body, h.get("x-shopify-hmac-sha256"), secret)
        if scheme == "stripe":
            return lambda body, h, p, now: verify_stripe(
                body, h.get("stripe-signature"), secret, now)
        if scheme == "front":
            return lambda body, h, p, now: verify_front(
                body, h.get("x-front-signature"),
                h.get("x-front-request-timestamp"), secret)
        if scheme == "intercom":
            return lambda body, h, p, now: verify_intercom(
                body, h.get("x-hub-signature"), secret)
        if scheme == "increase":
            return lambda body, h, p, now: verify_increase(
                body, h.get("increase-webhook-signature"), secret, now)
        if scheme == "twilio":
            return lambda body, h, p, now: verify_twilio_basic(
                h.get("authorization"), secret)
        if scheme == "twilio_signature":
            return lambda body, h, p, now: verify_twilio_signature(
                body, h.get("x-twilio-signature"), secret,
                _twilio_url_from_envelope(h, p))
        if scheme == "email_octopus":
            return lambda body, h, p, now: verify_email_octopus(
                body, h.get("emailoctopus-signature"), secret)
        if scheme == "plivo":
            return lambda body, h, p, now: verify_plivo_v2(
                h.get("x-plivo-signature-v2"),
                h.get("x-plivo-signature-v2-nonce"), secret,
                _twilio_url_from_envelope(h, p))
        if scheme == "postmark":
            # request.ip: the proxy chain's client address rides the
            # envelope headers (x-forwarded-for first hop, else remote-addr)
            return lambda body, h, p, now: verify_postmark_ip(
                (h.get("x-forwarded-for") or h.get("remote-addr") or "")
                .split(",")[0].strip() or None)
        if scheme == "standard_secret":
            return lambda body, h, p, now: verify_standard_secret(
                h.get("whdb-webhook-secret"), secret)
        if scheme == "whdb_customer":
            return lambda body, h, p, now: verify_whdb_customer(
                h.get("whdb-secret"), secret)
        raise ValueError(f"unknown scheme {scheme!r}")

    for opaque_id, (scheme, secret) in secrets.items():
        verifiers[opaque_id] = make(scheme, secret)

    fixed_now = now_ts

    def check(batches):
        import datetime as _dt

        import pandas as pd

        has_path = None
        for pdf in batches:
            now = (
                fixed_now
                if fixed_now is not None
                else int(_dt.datetime.now(_dt.timezone.utc).timestamp())
            )
            if has_path is None:
                has_path = "request_path" in pdf.columns
            paths = pdf["request_path"] if has_path else [""] * len(pdf)
            reasons = [
                "unknown integration"
                if (fn := verifiers.get(opaque)) is None
                else fn(body, headers or {}, path, now)
                for opaque, body, headers, path in zip(
                    pdf["integration_opaque_id"], pdf["body"], pdf["headers"], paths
                )
            ]
            out = pdf.copy()
            out["_reject_reason"] = pd.Series(reasons, index=pdf.index, dtype="object")
            yield out

    from pyspark.sql import types as T

    schema = T.StructType(
        list(envelopes.schema.fields) + [T.StructField("_reject_reason", T.StringType())]
    )
    return envelopes.mapInPandas(check, schema=schema)


def accepted(verified: DataFrame) -> DataFrame:
    return verified.where(F.col("_reject_reason").isNull()).drop("_reject_reason")


def rejected(verified: DataFrame) -> DataFrame:
    return verified.where(F.col("_reject_reason").isNotNull())
