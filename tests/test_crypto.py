"""HMAC-SHA256 known-answer tests (F8).

The f8 oracle uses the tamper-pattern construction (sign, corrupt
where event_id % 2 = 0, verify), which is self-consistent: the same
UDF signs and verifies, so a deterministic-but-wrong digest would
still produce the expected verdict column. These known-answer tests
close that hole by pinning the digest itself against RFC 4231 test
vectors — together, KAT + tamper oracle make any sign/verify bug
observable.

Reference behavior: dbt-webhook/webhook_utils.py:49-56 (verify with
constant-time compare), bad-HMAC-403 test dbt-webhook/main_test.py:362-374.
"""

from __future__ import annotations

import hashlib
import hmac

from pyspark.sql import functions as F

from dot_spark.functions.crypto import hmac_sha256_udf, verify_signature

# RFC 4231 test case 2: short key, short data.
RFC4231_KEY = "Jefe"
RFC4231_DATA = "what do ya want for nothing?"
RFC4231_HMAC = "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843"


def test_udf_matches_rfc4231_vector(spark):
    df = spark.createDataFrame([(RFC4231_DATA,)], "body string")
    sig = hmac_sha256_udf(RFC4231_KEY)
    got = df.select(sig(F.col("body")).alias("sig")).first().sig
    assert got == RFC4231_HMAC


def test_udf_null_and_empty_body(spark):
    # None is treated as "" (the reference signs the raw request body;
    # an absent body is the empty string, webhook_utils.py:49-56).
    df = spark.createDataFrame([(None,), ("",)], "body string")
    sig = hmac_sha256_udf("k")
    got = [r.sig for r in df.select(sig(F.col("body")).alias("sig")).collect()]
    want = hmac.new(b"k", b"", hashlib.sha256).hexdigest()
    assert got == [want, want]


def test_verify_signature_accepts_good_rejects_tampered(spark):
    good = hmac.new(b"s3cret", b"payload-1", hashlib.sha256).hexdigest()
    bad = ("0" if good[0] != "0" else "1") + good[1:]
    df = spark.createDataFrame(
        [("payload-1", good), ("payload-1", bad)], "body string, sig string"
    )
    out = [
        r.ok
        for r in df.select(
            verify_signature("body", "sig", "s3cret").alias("ok")
        ).collect()
    ]
    assert out == [True, False]
