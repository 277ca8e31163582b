"""End-to-end fit lifecycle over the FIXTURES.md F3-style messy frame:
autodetect keys → convert → normalize → validate → dedup → record ids →
as-of enrich → generated features. Mirrors __inner_fit steps 1-16
(reference features_enricher.py:3316-3674)."""

import pytest
from pyspark.sql import functions as F

from upgini_spark.functions import keys as K
from upgini_spark.functions.dedup import drop_full_duplicates, fintech_dedup
from upgini_spark.joins.asof import asof_join
from upgini_spark.pipeline.autodetect import detect_search_keys
from upgini_spark.pipeline.normalizer import (
    detect_decimal_comma,
    normalize_types,
    validate_features,
)
from upgini_spark.pipeline.sort import deterministic_fit_sort


@pytest.fixture(scope="module")
def f3_frame(spark):
    """F3 fixture: phone key, mixed-format date key, messy features,
    binary target, planted duplicates + a fintech-conflict group."""
    rows = []
    for i in range(300):
        phone = f"+1 (2{i % 10:02d}) 555-{1000 + i:04d}"
        date = ["2023-03-%02d" % (1 + i % 28), "%02d.03.2023" % (1 + i % 28),
                "2023/03/%02d" % (1 + i % 28)][i % 3]
        rows.append((
            i, phone, date,
            float(i % 50) + 0.5,            # client_feature
            "1,5" if i % 2 else "2,5",       # decimal-comma feature
            "const",                          # constant -> dropped
            f"uid{i}",                        # high-card string -> dropped
            1 if i % 10 == 0 else 0,          # ~10% positives
        ))
    # full duplicate of row 0 (dedup check)
    rows.append((300, rows[0][1], rows[0][2], rows[0][3], rows[0][4],
                 "const", "uid0", rows[0][7]))
    # fintech conflict: same phone+date-window, flipped target within 60 days
    rows.append((301, "+1 (299) 555-9999", "2023-03-10", 7.5, "1,5", "const", "uidX", 0))
    rows.append((302, "+1 (299) 555-9999", "2023-03-20", 7.5, "1,5", "const", "uidY", 1))
    return spark.createDataFrame(
        rows,
        "rid int, phone_num string, rep_date string, client_feature double, "
        "dec_feature string, const_col string, uid string, target int",
    )


def test_full_fit_lifecycle(spark, f3_frame):
    df = f3_frame

    # 1. key autodetection on the 100-row head
    keys = detect_search_keys(df)
    assert keys.get("phone_num") == "PHONE"
    assert keys.get("rep_date") == "DATE"

    # 2. key conversion
    df = df.withColumn("phone_int", K.phone_to_int(F.col("phone_num")))
    df = df.withColumn("event_ts", K.parse_datetime_multi(F.col("rep_date")))
    assert df.filter("phone_int IS NULL").count() == 0
    assert df.filter("event_ts IS NULL").count() == 0

    # 3. normalization (decimal comma) + validator drops
    feats = ["client_feature", "dec_feature", "const_col", "uid"]
    dc = detect_decimal_comma(df, feats)
    assert dc == ["dec_feature"]
    df = normalize_types(df, feats, decimal_comma_cols=dc)
    assert dict(df.dtypes)["dec_feature"] == "double"
    df, dropped = validate_features(df, feats, exact=True)
    assert dropped == {"const_col": "constant", "uid": "high_cardinality"}

    # 4. dedup: fintech conflict group removed, full dup removed
    n0 = df.count()
    df = fintech_dedup(df, ["phone_int"], "target", "event_ts",
                       window_seconds=60 * 86400)
    assert df.filter("phone_int = 12995559999").count() == 0  # conflict group gone
    df = drop_full_duplicates(
        df, subset=["phone_int", "event_ts", "client_feature", "target"],
        order_col="rid",
    )
    assert df.count() == n0 - 2 - 1  # 2 conflict rows + 1 duplicate

    # 5. deterministic record ids (partition-invariant)
    sorted_df = deterministic_fit_sort(
        df, "event_ts", ["phone_int"], ["client_feature", "dec_feature"], "target"
    )
    ids_a = {r["rid"]: r["system_record_id"] for r in sorted_df.collect()}
    ids_b = {
        r["rid"]: r["system_record_id"]
        for r in deterministic_fit_sort(
            df.repartition(7), "event_ts", ["phone_int"],
            ["client_feature", "dec_feature"], "target",
        ).collect()
    }
    assert ids_a == ids_b

    # 6. as-of enrichment against a small feature store keyed by phone
    store = df.select(
        F.col("phone_int").alias("entity_id"),
        (F.col("event_ts") - F.expr("INTERVAL 10 DAYS")).alias("feature_ts"),
        (F.col("client_feature") * 2).alias("ext_feat"),
    )
    enriched = asof_join(
        sorted_df, store, left_on="event_ts", right_on="feature_ts",
        by_left="phone_int", by_right="entity_id", keep_match_ts=True,
    )
    assert enriched.count() == df.count()
    assert enriched.filter(
        "matched_ts IS NOT NULL AND matched_ts > event_ts"
    ).count() == 0
    assert enriched.filter("ext_feat IS NOT NULL").count() > 0
