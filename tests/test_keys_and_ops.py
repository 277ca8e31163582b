"""Key converters (SURVEY.md §2.3) + scalar operator exactness."""

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from upgini_spark.functions import keys as K
from upgini_spark.operators import binary as B
from upgini_spark.operators import unary as U


def _one(spark, expr, **cols):
    df = spark.createDataFrame([tuple(cols.values())], list(cols.keys()))
    return df.select(expr.alias("r")).collect()[0]["r"]


def test_email_converters(spark):
    e = "John.Doe+x@Example.COM"
    hem = _one(spark, K.email_to_hem(F.col("e")), e=e)
    assert hem == hashlib.sha256(e.lower().encode()).hexdigest()
    assert _one(spark, K.email_one_domain(F.col("e")), e=e) == "jexample.com"
    assert _one(spark, K.email_domain(F.col("e")), e=e) == "example.com"
    assert _one(spark, K.email_to_hem(F.col("e")), e="not-an-email") is None


def test_phone_converter(spark):
    assert _one(spark, K.phone_to_int(F.col("p")), p="+1 (212) 555-0198") == 12125550198
    assert _one(spark, K.phone_to_int(F.col("p")), p="1234567") is None  # 7 digits
    assert _one(spark, K.phone_to_int(F.col("p")), p="1" * 16) is None  # 16 digits


def test_ip_converters(spark):
    assert _one(spark, K.ipv4_to_int(F.col("ip")), ip="192.168.1.10") == (
        192 * 16777216 + 168 * 65536 + 256 + 10
    )
    assert _one(spark, K.ipv4_prefix(F.col("ip"), 2), ip="10.20.30.40") == "10.20"
    assert _one(spark, K.ipv4_to_int(F.col("ip")), ip="300.1.2.3") is None


def test_country_and_postal(spark):
    assert _one(spark, K.country_to_iso(F.col("c")), c="United Kingdom") == "GB"
    assert _one(spark, K.country_to_iso(F.col("c")), c="uk") == "GB"
    assert _one(spark, K.country_to_iso(F.col("c")), c="US") == "US"
    assert _one(spark, K.country_to_iso(F.col("c")), c="Germany") == "DE"
    assert _one(spark, K.postal_normalize(F.col("p")), p="02134") == "2134"
    assert _one(spark, K.postal_normalize(F.col("p")), p="2134.0") == "2134"
    assert _one(spark, K.postal_normalize(F.col("p")), p="ab-1 2c") == "AB12C"
    assert _one(spark, K.postal_normalize(F.col("p")), p="000") is None


def test_date_parsing(spark):
    for raw in ["2023-07-15", "15.07.2023", "2023/07/15", "20230715"]:
        got = _one(spark, K.parse_datetime_multi(F.col("d")), d=raw)
        assert str(got)[:10] == "2023-07-15", raw
    assert _one(spark, K.parse_datetime_multi(F.col("d")), d="---") is None
    # epoch unit ladder (datetime_utils.py:108-126)
    s = 1_689_379_200  # 2023-07-15 00:00:00 UTC
    for mul in [1, 1_000, 1_000_000]:
        got = _one(spark, K.parse_epoch_auto(F.col("d")), d=float(s * mul))
        assert str(got)[:10] == "2023-07-15", mul
    # old-date cleanup
    assert _one(
        spark, K.clean_old_dates(F.col("d").cast("timestamp")), d="1999-12-31"
    ) is None


def test_unary_trunc_semantics(spark):
    # log truncates toward zero at 10 dp (operator.py:162-172)
    x = 7.3
    expected = math.floor(math.log(abs(x)) * 1e10) / 1e10
    got = _one(spark, U.log_(F.col("x")), x=x)
    assert got == pytest.approx(expected, abs=1e-12)
    assert _one(spark, U.log_(F.col("x")), x=0.0) is None
    assert _one(spark, U.sigmoid_(F.col("x")), x=0.0) == 0.5
    assert _one(spark, U.residual_(F.col("x")), x=-1.25) == 0.75  # x - floor(x)


def test_binary_divide_and_sim(spark):
    assert _one(spark, B.divide(F.col("a"), F.col("b")), a=1.0, b=0.0) is None
    null_df = spark.createDataFrame([("x", None)], "a string, b string")
    assert null_df.select(B.combine(F.col("a"), F.col("b")).alias("r")).collect()[0]["r"] is None
    assert _one(
        spark, B.sim_levenshtein(F.col("a"), F.col("b")), a="kitten", b="sitting"
    ) == pytest.approx(1 - 3 / 7)
    # Jaro-Winkler sanity against known value
    got = _one(spark, B.sim_jaro_winkler(F.col("a"), F.col("b")), a="MARTHA", b="MARHTA")
    assert got == pytest.approx(0.9611111111, abs=1e-6)


def test_cosine_ops(spark):
    df = spark.createDataFrame([([1.0, 0.0], [0.0, 1.0]), ([1.0, 1.0], [1.0, 1.0])], ["a", "b"])
    rows = df.select(
        B.cosine_similarity(F.col("a"), F.col("b")).alias("cos"),
        B.distance(F.col("a"), F.col("b")).alias("dist"),
    ).collect()
    assert rows[0]["cos"] == pytest.approx(0.0)
    assert rows[1]["cos"] == pytest.approx(1.0)
    assert rows[0]["dist"] == pytest.approx(1.0)
