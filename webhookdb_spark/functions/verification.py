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


# header each scheme reads (lower-cased; envelope headers are a map)
SCHEME_HEADERS = {
    "github": "x-hub-signature-256",
    "stripe": "stripe-signature",
    "shopify": "x-shopify-hmac-sha256",
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
    import datetime as _dt

    now = now_ts if now_ts is not None else int(_dt.datetime.now().timestamp())

    verifiers: dict[str, Callable[[str, str | None], str | None]] = {}

    def make(scheme: str, secret: str):
        if scheme == "github":
            return lambda body, sig: verify_github(body, sig, secret)
        if scheme == "shopify":
            return lambda body, sig: verify_shopify(body, sig, secret)
        if scheme == "stripe":
            return lambda body, sig: verify_stripe(body, sig, secret, now)
        raise ValueError(f"unknown scheme {scheme!r}")

    for opaque_id, (scheme, secret) in secrets.items():
        verifiers[opaque_id] = (SCHEME_HEADERS[scheme], make(scheme, secret))

    def check(batches):
        import pandas as pd

        for pdf in batches:
            reasons = []
            for _, row in pdf.iterrows():
                v = verifiers.get(row["integration_opaque_id"])
                if v is None:
                    reasons.append("unknown integration")
                    continue
                header_name, fn = v
                headers = row["headers"] or {}
                sig = headers.get(header_name)
                reasons.append(fn(row["body"], sig))
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
