"""RedactStage unit behavior (catalog oracle parity is in
test_queries.py: redacted_events / pii_redact)."""

import pyarrow as pa

from fastdup_ray.stages.redact import PII_PATTERNS, RedactStage


def _one(text: str, patterns=None, **kw):
    stage = RedactStage(patterns, column="text", keep=[], **kw)
    out = stage(pa.table({"text": pa.array([text])}))
    return {c: out[c][0].as_py() for c in out.column_names}


def test_pii_presets():
    r = _one("mail a.b+c@ex-1.org from 192.168.0.1 call +44 20 7946 0958 ok")
    assert r["text_redacted"] == "mail <EMAIL> from <IP> call <PHONE> ok"
    assert (r["n_email"], r["n_ipv4"], r["n_phone"]) == (1, 1, 1)


def test_no_hits_identity():
    r = _one("plain words only")
    assert r["text_redacted"] == "plain words only"
    assert r["n_email"] == r["n_ipv4"] == r["n_phone"] == 0


def test_rule_order_counts():
    # counts are measured on the text as left by PREVIOUS rules: the
    # email's digit run is gone before the phone rule looks, so only the
    # standalone digit run counts as a phone
    text = "x 123456789 y a1234567890b@e.io"
    r = _one(text)
    assert r["n_email"] == 1
    assert r["n_phone"] == 1
    assert r["text_redacted"] == "x <PHONE> y <EMAIL>"
    # email rule disabled -> the email's digits now count as a phone too
    pats = {"phone": PII_PATTERNS["phone"]}
    r2 = _one(text, patterns=pats)
    assert r2["n_phone"] == 2


def test_keep_and_multiple_rows():
    stage = RedactStage({"num": (r"\d+", "#")}, column="t", keep=["id"])
    out = stage(pa.table({"id": [1, 2], "t": ["a1b22", "no"]}))
    assert out["t_redacted"].to_pylist() == ["a#b#", "no"]
    assert out["n_num"].to_pylist() == [2, 0]
    assert out["id"].to_pylist() == [1, 2]
