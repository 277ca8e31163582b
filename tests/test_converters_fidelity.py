"""Converter fidelity vs reference semantics: phone country prefixes
(phone_utils.py:32-42,108-354), full country-name map
(country_utils.py:36-48,50-251), and IPv6 / ipv4-mapped parsing
(ip_utils.py:37-100, ground truth = python ipaddress)."""

from ipaddress import IPv6Address, ip_address

import pandas as pd
import pytest
from pyspark.sql import functions as F

from upgini_spark.functions import keys as K
from upgini_spark.functions.keys_tables import (
    COUNTRY_NAMES_TO_ISO,
    PHONE_COUNTRY_PREFIXES,
)


def _ref_phone(value, country):
    """Inline replica of PhoneSearchKeyConverter (phone_utils.py:32-106)."""
    def to_int(v):
        if v is None:
            return None
        v = str(v)
        if v.endswith(".0"):
            v = v[:-2]
        digits = "".join(filter(str.isdigit, v))
        try:
            n = int(digits)
        except ValueError:
            return None
        return None if (n < 10_000_000 or n > 999_999_999_999_999) else n

    p = to_int(value)
    if p is None:
        return None
    t = PHONE_COUNTRY_PREFIXES.get(country)
    if t is not None:
        pre, nd = t
        if len(str(p)) == nd:
            return int(pre + str(p))
    return p


def test_phone_prefix_matches_reference(spark):
    phones = ["+41 79 383 43 15", "41793834315", "0793834315", "793834315",
              "1234567", "18143008198.0", "8143008198", "abc",
              "99999999999999999", None]
    countries = ["CH", "CH", "CH", "CH", "US", "US", "US", "US", "DE", None]
    df = spark.createDataFrame(pd.DataFrame({"phone": phones, "country": countries}))
    got = df.select(
        K.phone_with_country_prefix(F.col("phone"), F.col("country")).alias("p")
    ).toPandas()["p"]
    for g, ph, cc in zip(got.tolist(), phones, countries):
        exp = _ref_phone(ph, cc)
        g = None if pd.isna(g) else int(g)
        assert g == exp, (ph, cc, g, exp)


def test_country_full_map(spark):
    names = ["United States", "COTE D'IVOIRE", "Bosnia and Herzegovina",
             "france", "Ukraine", "ZZ", "NORTH MACEDONIA", None]
    df = spark.createDataFrame(pd.DataFrame({"c": names}))
    got = df.select(K.country_full_name_to_iso(F.col("c")).alias("c")).toPandas()["c"]
    for n, g in zip(names, got.tolist()):
        exp = None if n is None else COUNTRY_NAMES_TO_ISO.get(str(n).upper(), str(n))
        g = None if pd.isna(g) else g
        assert g == exp, (n, g, exp)
    assert len(COUNTRY_NAMES_TO_ISO) >= 190  # full table, not the 30-entry slice
    assert len(PHONE_COUNTRY_PREFIXES) >= 240


@pytest.mark.parametrize(
    "ip",
    ["192.168.1.2", "2001:db8::1", "::1", "::", "::ffff:10.0.0.1",
     "fe80::1:2:3:4", "1:2:3:4:5:6:7:8",
     "2001:0db8:0000:0000:0000:ff00:0042:8329", "notanip", "1::2::3",
     "300.1.2.3", "::ffff:1.2.3.300", "1:2:3:4:5:6:7::8",
     "2001:db8::192.168.0.5", "0:0:0:0:0:ffff:c0a8:0101"],
)
def test_ip_parsing_matches_ipaddress(spark, ip):
    df = spark.createDataFrame([(ip,)], "ip string").withColumn(
        "g", K.ipv6_groups(F.col("ip"))
    )
    r = df.select(
        K.ipv6_exploded(F.col("ip"), groups=F.col("g")).alias("exploded"),
        K.ip_prefix(F.col("ip"), groups=F.col("g")).alias("prefix"),
        K.ip_binary_hex(F.col("ip"), groups=F.col("g")).alias("binhex"),
    ).collect()[0]

    try:
        parsed = ip_address(ip)
    except ValueError:
        parsed = None
    if parsed is None:
        assert r.prefix is None and r.binhex is None
        return
    if isinstance(parsed, IPv6Address):
        assert r.exploded == parsed.exploded
        if parsed.ipv4_mapped is not None:
            assert r.prefix == ".".join(parsed.ipv4_mapped.exploded.split(".")[:2])
            assert r.binhex == parsed.ipv4_mapped.packed.hex()
        else:
            assert r.prefix == ":".join(parsed.exploded.split(":")[:2])
            assert r.binhex == parsed.packed.hex()
    else:
        assert r.prefix == ".".join(parsed.exploded.split(".")[:2])
        assert r.binhex == parsed.packed.hex()


def test_email_hem_reference_golden(spark):
    """Replays reference tests/test_email_utils.py:test_convertion_to_hem:
    exact sha256 HEM + one-domain values, invalid shapes → null."""
    emails = ["test@google.com", "", "@", None, "0.0", "asdf@oiouo@asdf"]
    df = spark.createDataFrame([(e,) for e in emails], "email string")
    out = df.select(
        K.email_to_hem(F.col("email")).alias("hem"),
        K.email_one_domain(F.col("email")).alias("od"),
    ).collect()
    exp_hem = ["8b0080a904da73e6e500ada3d09a88037289b5c08e03d3a09546ffacc5b5fd57",
               None, None, None, None, None]
    exp_od = ["tgoogle.com", None, None, None, None, None]
    assert [r["hem"] for r in out] == exp_hem
    assert [r["od"] for r in out] == exp_od
