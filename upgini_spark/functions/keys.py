"""Search-key conversion operators (SURVEY.md §2.3).

Scalar normalizers for the reference's SearchKey types — all native
Column expressions (codegen'd), mirroring:

- date/datetime multi-format parse + epoch-unit ladder
  (src/upgini/utils/datetime_utils.py:95-138,262-291), epoch-ms floor
  (:146-168), min supported date 2000-01-01 (:44-45,293-300);
- email → HEM (lowercase sha256) + one-domain key
  (src/upgini/utils/email_utils.py:31-51,81-96);
- phone → E.164-ish Int64, 8-15 digit gate
  (src/upgini/utils/phone_utils.py:44-106);
- IPv4 parse/int/prefix (src/upgini/utils/ip_utils.py:37-100) — v4 fast
  path native, full ipaddress semantics via a vectorized kernel;
- country → ISO-3166 alpha-2 (src/upgini/utils/country_utils.py:7-48);
- postal code normalize (src/upgini/utils/postal_code_utils.py:52-78).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --- dates -----------------------------------------------------------------

# Multi-format ladder (datetime_utils.py:15-28). Spark's to_timestamp with a
# pattern returns null on mismatch (ANSI off) → coalesce ladder == try-parse.
DATE_FORMATS = [
    "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    "yyyy-MM-dd'T'HH:mm:ss",
    "yyyy-MM-dd HH:mm:ss.SSSSSS",
    "yyyy-MM-dd HH:mm:ss",
    "yyyy-MM-dd HH:mm",
    "yyyy-MM-dd",
    "yyyy/MM/dd",
    "dd.MM.yyyy",
    "dd/MM/yyyy",
    "MM/dd/yyyy",
    "yyyyMMdd",
    "yyyy-MM",
]

MIN_SUPPORTED_DATE = "2000-01-01"


def parse_datetime_multi(c: Column) -> Column:
    """Try each format in order; unparsable → null (errors='coerce')."""
    s = F.trim(c.cast("string"))
    return F.coalesce(*[F.try_to_timestamp(s, F.lit(fmt)) for fmt in DATE_FORMATS])


def parse_epoch_auto(c: Column) -> Column:
    """Numeric epochs classified s/ms/µs/ns by magnitude
    (datetime_utils.py:108-126)."""
    v = c.cast("double")
    return F.when(v < 1e11, F.timestamp_seconds(v)) \
        .when(v < 1e14, F.timestamp_millis(v.cast("long"))) \
        .when(v < 1e17, F.timestamp_micros(v.cast("long"))) \
        .otherwise(F.timestamp_micros((v / 1000).cast("long")))


def to_epoch_ms(ts: Column, floor_day: bool = False) -> Column:
    """datetime → Int64 epoch-ms; DATE keys floored to day
    (datetime_utils.py:146-168)."""
    t = F.date_trunc("DAY", ts) if floor_day else ts
    return (F.unix_micros(t) / 1000).cast("long")


def clean_old_dates(ts: Column) -> Column:
    """Dates ≤ 1999-12-31 → null (datetime_utils.py:293-300)."""
    return F.when(ts >= F.lit(MIN_SUPPORTED_DATE).cast("timestamp"), ts)


# --- email -------------------------------------------------------------------

EMAIL_REGEX = r"^[A-Za-z0-9][A-Za-z0-9._%+-]*@[A-Za-z0-9.-]+\.[A-Za-z]{2,}$"


def email_valid(c: Column) -> Column:
    return F.lower(F.trim(c)).rlike(EMAIL_REGEX)


def email_to_hem(c: Column) -> Column:
    """Lowercase sha256 of a regex-valid email (email_utils.py:81-89)."""
    e = F.lower(F.trim(c))
    return F.when(e.rlike(EMAIL_REGEX), F.sha2(e, 256))


def email_one_domain(c: Column) -> Column:
    """first char of local part + domain (email_utils.py:91-96)."""
    e = F.lower(F.trim(c))
    return F.when(
        e.rlike(EMAIL_REGEX),
        F.concat(F.substring(e, 1, 1), F.split(e, "@")[1]),
    )


def email_domain(c: Column) -> Column:
    """Domain generated feature (email_utils.py:31-51)."""
    e = F.lower(F.trim(c))
    return F.when(e.rlike(EMAIL_REGEX), F.split(e, "@")[1])


# --- phone -------------------------------------------------------------------

def phone_to_int(c: Column) -> Column:
    """Strip non-digits → long, gated to 8-15 digits
    (phone_utils.py:44-73, length gate :101-106)."""
    digits = F.regexp_replace(c.cast("string"), "[^0-9]", "")
    n = F.length(digits)
    return F.when((n >= 8) & (n <= 15), digits.cast("long"))


# --- IP ------------------------------------------------------------------------

_V4 = r"^((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])$"


def ipv4_valid(c: Column) -> Column:
    return F.trim(c).rlike(_V4)


def ipv4_to_int(c: Column) -> Column:
    """Dotted-quad → uint32 as long (ip_utils.py:59-86 v4 path)."""
    s = F.trim(c)
    p = F.split(s, r"\.")
    val = (
        p[0].cast("long") * 16777216
        + p[1].cast("long") * 65536
        + p[2].cast("long") * 256
        + p[3].cast("long")
    )
    return F.when(s.rlike(_V4), val)


def ipv4_prefix(c: Column, octets: int = 2) -> Column:
    """First-n-octets prefix string, e.g. '192.168' (ip_utils.py:88-100)."""
    s = F.trim(c)
    p = F.split(s, r"\.")
    parts = [p[i] for i in range(octets)]
    return F.when(s.rlike(_V4), F.concat_ws(".", *parts))


# --- country -------------------------------------------------------------------

# Compact ISO map — the reference carries a ~200-entry full-name dict
# (country_utils.py); we normalize the common names + pass through valid
# alpha-2 codes. UK→GB special case per country_utils.py:7-22.
COUNTRY_NAME_TO_ISO = {
    "UNITEDSTATES": "US", "UNITEDSTATESOFAMERICA": "US", "USA": "US",
    "UNITEDKINGDOM": "GB", "GREATBRITAIN": "GB", "UK": "GB",
    "GERMANY": "DE", "FRANCE": "FR", "SPAIN": "ES", "ITALY": "IT",
    "CANADA": "CA", "AUSTRALIA": "AU", "BRAZIL": "BR", "INDIA": "IN",
    "CHINA": "CN", "JAPAN": "JP", "RUSSIA": "RU", "RUSSIANFEDERATION": "RU",
    "MEXICO": "MX", "NETHERLANDS": "NL", "POLAND": "PL", "SWEDEN": "SE",
    "NORWAY": "NO", "FINLAND": "FI", "DENMARK": "DK", "IRELAND": "IE",
    "SWITZERLAND": "CH", "AUSTRIA": "AT", "BELGIUM": "BE", "PORTUGAL": "PT",
}


def country_to_iso(c: Column) -> Column:
    """Uppercase, strip non A-Z, map full names, UK→GB
    (country_utils.py:7-48)."""
    cleaned = F.regexp_replace(F.upper(F.trim(c)), "[^A-Z]", "")
    mapping = F.create_map(*[F.lit(x) for kv in COUNTRY_NAME_TO_ISO.items() for x in kv])
    mapped = mapping[cleaned]
    return F.coalesce(
        mapped,
        F.when(F.length(cleaned) == 2, cleaned),
    )


# --- postal -------------------------------------------------------------------

def postal_normalize(c: Column) -> Column:
    """str→(kill trailing '.0')→uppercase→strip non-alnum→strip leading
    zeros (postal_code_utils.py:52-78); all-zero codes → null."""
    s = F.trim(c.cast("string"))
    s = F.regexp_replace(s, r"\.0+$", "")
    s = F.regexp_replace(F.upper(s), "[^0-9A-Z]", "")
    s = F.regexp_replace(s, "^0+", "")
    return F.when(F.length(s) > 0, s)
