"""PII detection/redaction on crafted strings: counts, replace-all,
pattern ordering (SSN wins over phone), clean-text negatives."""

from __future__ import annotations

from pyspark.sql import functions as F

from getml_community_spark.operators.pii import pii_redact, pii_stats


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pii_stats_counts(spark):
    df = _df(
        spark,
        [
            "mail a@b.co and c.d+e@f-g.org plus ip 192.168.0.1",
            "ssn 123-45-6789 phone +44 20 7946 0958 end",
            "perfectly clean text with no identifiers at all",
            "two ips 10.0.0.1 8.8.8.8 and one mail x@y.io",
        ],
    )
    rows = {r["doc_id"]: r for r in pii_stats(df).collect()}
    assert (rows[0]["n_email"], rows[0]["n_ipv4"]) == (2, 1)
    assert (rows[1]["n_ssn"], rows[1]["n_phone"]) == (1, 1)
    assert rows[2]["n_pii_total"] == 0
    assert (rows[3]["n_ipv4"], rows[3]["n_email"], rows[3]["n_pii_total"]) == (2, 1, 3)


def test_pii_redact_replaces_all_and_orders(spark):
    df = _df(
        spark,
        ["a@b.co then c@d.net", "ssn 123-45-6789 and +1-555-0100 x"],
    )
    got = {r["doc_id"]: r["text"] for r in pii_redact(df).collect()}
    assert got[0] == "<EMAIL> then <EMAIL>"
    # SSN pattern consumes 123-45-6789 BEFORE the phone pattern can
    assert got[1] == "ssn <SSN> and <PHONE> x"


def test_pii_redact_out_col_and_custom_patterns(spark):
    df = _df(spark, ["order ref ABC-123 and mail a@b.co"])
    out = pii_redact(
        df,
        patterns={"ref": (r"\bABC-\d+\b", "<REF>")},
        out_col="clean",
    ).collect()[0]
    assert out["text"].startswith("order ref ABC-123")  # original kept
    assert out["clean"] == "order ref <REF> and mail a@b.co"


def test_pii_stats_is_shuffle_free(spark):
    df = _df(spark, ["a@b.co"])
    plan = pii_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_normalize_text_forms_and_cleanups(spark):
    from getml_community_spark.operators.textnorm import normalize_text

    rows = [
        ("a", "café"),            # NFC composes to café
        ("b", "café"),             # already composed — unchanged
        ("c", "ﬁn ²"),        # NFKC folds ﬁ→fi, ²→2
        ("d", "x\x00y\x07z\x7f"),       # control chars stripped
        ("e", "a \t b\n\nc"),           # whitespace collapsed
        ("f", None),                    # NULL passes through
    ]
    df = spark.createDataFrame(rows, "id string, text string")

    nfc = dict(
        normalize_text(df, collapse_ws=True).select("id", "text").collect()
    )
    assert nfc["a"] == nfc["b"] == "café"
    assert nfc["c"] == "ﬁn ²"  # NFC keeps compatibility chars
    assert nfc["d"] == "xyz"
    assert nfc["e"] == "a b c"
    assert nfc["f"] is None

    nfkc = dict(
        normalize_text(df, form="NFKC").select("id", "text").collect()
    )
    assert nfkc["c"] == "fin 2"

    # out_col keeps the original column intact
    both = normalize_text(df, out_col="norm").select("id", "text", "norm")
    r = {x["id"]: x for x in both.collect()}
    assert r["a"]["text"] == "café" and r["a"]["norm"] == "café"

    import pytest as _pytest

    with _pytest.raises(ValueError):
        normalize_text(df, form="NFX")
