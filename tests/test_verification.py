"""Webhook signature verification schemes + the envelope verdict stage."""

from __future__ import annotations

import datetime as dt
import hashlib
import hmac
from base64 import b64encode

from webhookdb_spark.functions.verification import (
    accepted,
    rejected,
    verify_envelopes,
    verify_github,
    verify_shopify,
    verify_stripe,
)

SECRET = "whsec_test"
BODY = '{"id": "x", "v": 1}'


def _github_sig(body=BODY, secret=SECRET):
    return "sha256=" + hmac.new(secret.encode(), body.encode(), hashlib.sha256).hexdigest()


def _stripe_sig(ts, body=BODY, secret=SECRET):
    mac = hmac.new(secret.encode(), f"{ts}.{body}".encode(), hashlib.sha256).hexdigest()
    return f"t={ts},v1={mac}"


def test_github_scheme():
    assert verify_github(BODY, _github_sig(), SECRET) is None
    assert verify_github(BODY, None, SECRET) == "missing sha256"
    assert verify_github(BODY, "sha256=deadbeef", SECRET) == "invalid sha256"
    assert verify_github(BODY + " ", _github_sig(), SECRET) == "invalid sha256"


def test_shopify_scheme():
    good = b64encode(hmac.new(SECRET.encode(), BODY.encode(), hashlib.sha256).digest()).decode()
    assert verify_shopify(BODY, good, SECRET) is None
    assert verify_shopify(BODY, "nope", SECRET) == "invalid hmac"


def test_stripe_scheme_and_tolerance():
    now = 1_750_000_000
    assert verify_stripe(BODY, _stripe_sig(now), SECRET, now) is None
    assert verify_stripe(BODY, _stripe_sig(now - 600), SECRET, now) == "timestamp outside tolerance"
    assert verify_stripe(BODY, "t=1,v1=bad", SECRET, now) == "invalid hmac"
    assert verify_stripe(BODY, None, SECRET, now) == "missing hmac"
    # any v1 may match (key-roll window)
    two = _stripe_sig(now) + ",v1=deadbeef"
    assert verify_stripe(BODY, two, SECRET, now) is None


def test_verify_envelopes_stage(spark):
    now = 1_750_000_000
    rows = [
        ("gh", "github", "GET", "/v1", {"x-hub-signature-256": _github_sig()}, BODY,
         dt.datetime(2026, 1, 1)),
        ("gh", "github", "GET", "/v1", {"x-hub-signature-256": "sha256=bad"}, BODY,
         dt.datetime(2026, 1, 1)),
        ("st", "stripe", "POST", "/v1", {"stripe-signature": _stripe_sig(now)}, BODY,
         dt.datetime(2026, 1, 1)),
        ("??", "other", "POST", "/v1", {}, BODY, dt.datetime(2026, 1, 1)),
    ]
    env = spark.createDataFrame(
        rows,
        "integration_opaque_id string, service_name string, request_method string,"
        " request_path string, headers map<string,string>, body string,"
        " received_at timestamp",
    )
    verified = verify_envelopes(
        env, {"gh": ("github", SECRET), "st": ("stripe", SECRET)}, now_ts=now
    )
    ok = accepted(verified).select("integration_opaque_id").collect()
    assert sorted(r[0] for r in ok) == ["gh", "st"]
    bad = {
        r.integration_opaque_id: r._reject_reason for r in rejected(verified).collect()
    }
    assert bad == {"gh": "invalid sha256", "??": "unknown integration"}


def test_front_scheme():
    from webhookdb_spark.functions.verification import verify_front

    ts = "1700000000"
    good = b64encode(
        hmac.new(SECRET.encode(), f"{ts}:{BODY}".encode(), hashlib.sha256).digest()
    ).decode()
    assert verify_front(BODY, good, ts, SECRET) is None
    assert verify_front(BODY, None, ts, SECRET) == "missing signature"
    assert verify_front(BODY, good, "1700000001", SECRET) == "invalid signature"


def test_intercom_scheme():
    from webhookdb_spark.functions.verification import verify_intercom

    good = "sha1=" + hmac.new(SECRET.encode(), BODY.encode(), hashlib.sha1).hexdigest()
    assert verify_intercom(BODY, good, SECRET) is None
    assert verify_intercom(BODY, None, SECRET) == "missing hmac"
    assert verify_intercom(BODY, "sha1=bad", SECRET) == "invalid hmac"


def test_increase_signs_canonical_utc_iso8601():
    """The HMAC is computed over the parsed time re-serialized as UTC
    ISO8601 (reference Increase.compute_signature: t.utc.iso8601), so a
    t= with a non-Z offset or fractional seconds must still verify."""
    from webhookdb_spark.functions.verification import verify_increase

    now = 1_750_000_000
    canonical = dt.datetime.fromtimestamp(now, dt.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    mac = hmac.new(
        SECRET.encode(), f"{canonical}.{BODY}".encode(), hashlib.sha256
    ).hexdigest()
    # same instant expressed with a +02:00 offset and fractional seconds
    offset_form = (
        dt.datetime.fromtimestamp(now, dt.timezone(dt.timedelta(hours=2)))
        .strftime("%Y-%m-%dT%H:%M:%S.000000+02:00")
    )
    assert verify_increase(BODY, f"t={offset_form},v1={mac}", SECRET, now) is None


def test_twilio_basic_scheme():
    from base64 import b64encode as _b64

    from webhookdb_spark.functions.verification import verify_twilio_basic

    good = "Basic " + _b64(b"user:pass").decode()
    assert verify_twilio_basic(good, "user:pass") is None
    assert verify_twilio_basic(None, "user:pass") == "challenge"
    assert verify_twilio_basic("Bearer tok", "user:pass") == "challenge"
    assert verify_twilio_basic(good, "other:secret") == "invalid"
    assert verify_twilio_basic("Basic !!notb64", "user:pass") == "invalid"


def test_twilio_signature_scheme():
    """Public X-Twilio-Signature: base64(HMAC-SHA1(token, url + sorted
    k+v of the form-encoded POST params))."""
    from webhookdb_spark.functions.verification import verify_twilio_signature

    token = "twilio_auth_token"
    url = "https://api.example.com/v1/service_integrations/svi_x"
    body = "To=%2B15558675310&From=%2B14158141829&Body=Hi+there"
    signed = url + "Body" + "Hi there" + "From" + "+14158141829" + "To" + "+15558675310"
    sig = b64encode(hmac.new(token.encode(), signed.encode(), hashlib.sha1).digest()).decode()
    assert verify_twilio_signature(body, sig, token, url) is None
    assert verify_twilio_signature(body, None, token, url) == "missing signature"
    assert verify_twilio_signature(body, sig, token, url + "x") == "invalid signature"
    assert verify_twilio_signature("A=1&" + body, sig, token, url) == "invalid signature"


def test_twilio_envelope_stage(spark):
    """End-to-end through verify_envelopes: Basic-auth twilio accepted,
    signature-scheme twilio verified from reconstructed URL."""
    from base64 import b64encode as _b64

    from webhookdb_spark.functions.verification import verify_envelopes

    token = "tok_secret"
    path = "/v1/service_integrations/svi_tw"
    url = f"https://hooks.example.com{path}"
    body = "Body=Yo&From=%2B1555"
    signed = url + "Body" + "Yo" + "From" + "+1555"
    sig = b64encode(hmac.new(token.encode(), signed.encode(), hashlib.sha1).digest()).decode()
    rows = [
        ("tw", "twilio_sms_v1", "POST", path,
         {"authorization": "Basic " + _b64(b"user:pass").decode()}, body,
         dt.datetime(2026, 1, 1)),
        ("tw", "twilio_sms_v1", "POST", path, {}, body, dt.datetime(2026, 1, 1)),
        ("tws", "twilio_sms_v1", "POST", path,
         {"x-twilio-signature": sig, "host": "hooks.example.com",
          "x-forwarded-proto": "https"}, body, dt.datetime(2026, 1, 1)),
    ]
    env = spark.createDataFrame(
        rows,
        "integration_opaque_id string, service_name string, request_method string,"
        " request_path string, headers map<string,string>, body string,"
        " received_at timestamp",
    )
    verified = verify_envelopes(
        env, {"tw": ("twilio", "user:pass"), "tws": ("twilio_signature", token)}
    )
    got = {
        (r.integration_opaque_id, r._reject_reason)
        for r in verified.select("integration_opaque_id", "_reject_reason").collect()
    }
    assert got == {("tw", None), ("tw", "challenge"), ("tws", None)}


def test_increase_scheme_and_cutoffs():
    from webhookdb_spark.functions.verification import verify_increase

    now = 1_750_000_000
    t_iso = dt.datetime.fromtimestamp(now, dt.timezone.utc).strftime(
        "%Y-%m-%dT%H:%M:%SZ"
    )
    mac = hmac.new(
        SECRET.encode(), f"{t_iso}.{BODY}".encode(), hashlib.sha256
    ).hexdigest()
    sig = f"t={t_iso},v1={mac}"
    assert verify_increase(BODY, sig, SECRET, now) is None
    assert verify_increase(BODY, None, SECRET, now) == "missing header"
    assert verify_increase(BODY, f"v1={mac}", SECRET, now) == "missing timestamp"
    assert verify_increase(BODY, f"t={t_iso}", SECRET, now) == "missing signatures"
    # 36 days old → too old; 5 days ahead → too new
    assert verify_increase(BODY, sig, SECRET, now + 36 * 86400) == "too old"
    assert verify_increase(BODY, sig, SECRET, now - 5 * 86400) == "too new"
    assert verify_increase(BODY, f"t={t_iso},v1=bad", SECRET, now) == "invalid signature"
