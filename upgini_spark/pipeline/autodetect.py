"""Search-key autodetection (reference: features_enricher.py:5198-5265,
per-type detectors in utils/*_utils.py).

The reference probes a 100-row head — tiny by design, so the probe runs
driver-side on ``df.limit(head_rows).toPandas()`` with the same decision
rules:

- DATE/DATETIME: name hints (datetime_utils.py:33-39) or ≥50% of sampled
  values parse as datetimes;
- EMAIL: >10% of values match the email regex (email_utils.py:16-28);
- PHONE: name hints (phone_utils.py:11-16) + digit-shape share;
- COUNTRY: >10% of values resolve to ISO codes (country_utils.py:23-33);
- POSTAL: postal-shape regex share (postal_code_utils.py:12-49).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

DATE_NAME_HINTS = ("date", "time", "day", "_dt", "timestamp")
PHONE_NAME_HINTS = ("phone", "msisdn", "mobile", "tel")

_EMAIL_RE = re.compile(r"^[^@\s]+@[^@\s]+\.[A-Za-z]{2,}$")
_PHONE_RE = re.compile(r"^\+?[0-9 ()\-\.]{8,20}$")
_POSTAL_RE = re.compile(r"^[0-9]{4,6}$|^[A-Za-z][0-9][A-Za-z] ?[0-9][A-Za-z][0-9]$")
_DATE_RES = [
    re.compile(r"^\d{4}-\d{2}-\d{2}([ T].*)?$"),
    re.compile(r"^\d{2}[./]\d{2}[./]\d{4}$"),
    re.compile(r"^\d{4}/\d{2}/\d{2}$"),
    re.compile(r"^\d{8}$"),
]

def _country_tokens() -> set[str]:
    """Reference COUNTRY_CODES (country_utils.py:253): all full-name keys
    plus all alpha-2 codes — here with non-letters stripped to match the
    probe normalization."""
    from upgini_spark.functions.keys_tables import COUNTRY_NAMES_TO_ISO

    names = {re.sub("[^A-Z]", "", k) for k in COUNTRY_NAMES_TO_ISO}
    return names | set(COUNTRY_NAMES_TO_ISO.values()) | {"UK"}


COUNTRY_TOKENS = _country_tokens()


def _share(vals: list, pred) -> float:
    vals = [v for v in vals if v is not None]
    if not vals:
        return 0.0
    return sum(1 for v in vals if pred(str(v))) / len(vals)


# reference per-type name rules (phone_utils.py:11-16, email_utils.py:17-18,
# country_utils.py:23-25, postal_code_utils.py:15-16)
PHONE_NAMES = {"cellphone", "msisdn", "phone", "phonenumber", "phone_number"}
EMAIL_NAMES = {"email", "e_mail", "e-mail"}


def detect_search_keys(df: DataFrame, head_rows: int = 100) -> dict[str, str]:
    """column → SearchKey type ('DATE', 'EMAIL', 'PHONE', 'COUNTRY',
    'POSTAL_CODE'); undetected columns are omitted.

    Name rules match the reference detectors exactly: PHONE and EMAIL
    names alone suffice; COUNTRY needs >10% resolvable values; POSTAL
    needs the zip/postal name plus value shape."""
    head = df.limit(head_rows).toPandas()
    out: dict[str, str] = {}
    for c in df.columns:
        lc = c.lower()
        vals = head[c].tolist() if c in head else []
        dtype = dict(df.dtypes).get(c, "")
        if lc in PHONE_NAMES:
            out[c] = "PHONE"
            continue
        if lc in EMAIL_NAMES:
            out[c] = "EMAIL"
            continue
        if dtype.startswith(("timestamp", "date")):
            out[c] = "DATE"
            continue
        # name-alone rules (country_utils.py:23-25, postal_code_utils.py:15-16)
        if "country" in lc:
            out[c] = "COUNTRY"
            continue
        if "zip" in lc or "postal" in lc:
            out[c] = "POSTAL_CODE"
            continue
        date_share = _share(vals, lambda s: any(r.match(s) for r in _DATE_RES))
        if any(h in lc for h in DATE_NAME_HINTS) and date_share >= 0.5:
            out[c] = "DATE"
            continue
        if date_share >= 0.9:
            out[c] = "DATE"
            continue
        if _share(vals, lambda s: bool(_EMAIL_RE.match(s))) > 0.1:
            out[c] = "EMAIL"
            continue
        if any(h in lc for h in PHONE_NAME_HINTS) and _share(
            vals, lambda s: bool(_PHONE_RE.match(s))
        ) > 0.5:
            out[c] = "PHONE"
            continue
        if _share(
            vals, lambda s: re.sub(r"[^A-Z]", "", s.upper()) in COUNTRY_TOKENS
        ) > 0.1:
            out[c] = "COUNTRY"
            continue
        if "post" in lc or "zip" in lc:
            if _share(vals, lambda s: bool(_POSTAL_RE.match(s))) > 0.5:
                out[c] = "POSTAL_CODE"
    return out


MULTI_ALLOWED_KEYS = {"PHONE", "IP", "POSTAL_CODE", "EMAIL", "HEM", "CUSTOM_KEY"}


def validate_search_keys(
    search_keys: dict[str, str], country_code: str | None = None
) -> None:
    """Search-key combination rules (features_enricher.py:3254-3301,
    replayed from test_search_keys_validation): only PHONE/IP/POSTAL_CODE/
    EMAIL/HEM/CUSTOM_KEY may appear on multiple columns; DATE and DATETIME
    are mutually exclusive, as are EMAIL and HEM; POSTAL_CODE requires a
    COUNTRY key (or an explicit country_code). Raises ValueError."""
    from collections import Counter

    key_types = list(search_keys.values())
    for key, count in Counter(key_types).items():
        if count > 1 and key not in MULTI_ALLOWED_KEYS:
            raise ValueError(f"multiple {key} search keys are not supported")
    if "DATE" in key_types and "DATETIME" in key_types:
        raise ValueError(
            "date and datetime search keys cannot be used simultaneously"
        )
    if "EMAIL" in key_types and "HEM" in key_types:
        raise ValueError(
            "email and hem search keys cannot be used simultaneously"
        )
    if "POSTAL_CODE" in key_types and "COUNTRY" not in key_types and country_code is None:
        raise ValueError("postal code search key requires a country key")
