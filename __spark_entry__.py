"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one named query per implemented operator from
SURVEY.md §2, each runnable as ``fn(spark, sf_dir)``; ``oracle_sql()``
gives the DuckDB-checkable ANSI-SQL equivalent (same column names, same
values). Queries exercise the upgini_spark library operators — not ad-hoc
SQL — so the correctness gate actually covers the engine.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from upgini_spark.functions import keys as K
from upgini_spark.joins.asof import asof_join
from upgini_spark.operators import binary as B
from upgini_spark.operators import date as D
from upgini_spark.operators import groupby as G
from upgini_spark.operators import unary as U
from upgini_spark.operators import vector as V
from upgini_spark.operators.timeseries import (
    ewma_volatility,
    lag_feature,
    roll_features,
    sessionize,
    trend_coefficient,
)

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _clicks(spark, sf_dir):
    """Right side for as-of joins: click events as a feature stream."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
            F.col("value").alias("click_value"),
        )
    )


_CLICKS_SQL = (
    "SELECT user_id AS r_user, ts AS r_ts, value AS click_value "
    "FROM events WHERE event_type = 'click'"
)


# ===========================================================================
# As-of joins (SURVEY.md §2.4 point-in-time enrichment)
# ===========================================================================

@_q(
    "asof_join_backward",
    f"""
    SELECT l.event_id, l.user_id, l.ts, r.r_ts AS matched_ts, r.click_value
    FROM events l
    ASOF LEFT JOIN ({_CLICKS_SQL}) r
      ON l.user_id = r.r_user AND l.ts >= r.r_ts
    """,
)
def asof_join_backward(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = asof_join(
        ev, _clicks(spark, sf_dir),
        left_on="ts", right_on="r_ts", by_left="user_id", by_right="r_user",
        engine="native", keep_match_ts=True,
    )
    return out.select("event_id", "user_id", "ts", F.col("matched_ts"), "click_value")


@_q(
    "asof_join_arrow",
    f"""
    SELECT l.event_id, l.user_id, l.ts, r.r_ts AS matched_ts, r.click_value
    FROM events l
    ASOF LEFT JOIN ({_CLICKS_SQL}) r
      ON l.user_id = r.r_user AND l.ts >= r.r_ts
    """,
)
def asof_join_arrow(spark, sf_dir):
    """Same semantics through the salted Arrow merge_asof kernel."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = asof_join(
        ev, _clicks(spark, sf_dir),
        left_on="ts", right_on="r_ts", by_left="user_id", by_right="r_user",
        engine="arrow", salt=2, keep_match_ts=True,
    )
    return out.select("event_id", "user_id", "ts", F.col("matched_ts"), "click_value")


@_q(
    "asof_join_tolerance",
    f"""
    WITH ranked AS (
      SELECT l.event_id, l.user_id, l.ts, r.r_ts, r.click_value,
             row_number() OVER (
               PARTITION BY l.event_id ORDER BY r.r_ts DESC
             ) AS rn
      FROM events l
      LEFT JOIN ({_CLICKS_SQL}) r
        ON l.user_id = r.r_user
       AND r.r_ts <= l.ts
       AND r.r_ts >= l.ts - INTERVAL 1 DAY
    )
    SELECT event_id, user_id, ts, r_ts AS matched_ts, click_value
    FROM ranked WHERE rn = 1
    """,
)
def asof_join_tolerance(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = asof_join(
        ev, _clicks(spark, sf_dir),
        left_on="ts", right_on="r_ts", by_left="user_id", by_right="r_user",
        engine="native", tolerance_seconds=86400, keep_match_ts=True,
    )
    return out.select("event_id", "user_id", "ts", "matched_ts", "click_value")


@_q(
    "asof_join_forward",
    """
    SELECT l.event_id, l.user_id, l.ts, r.r_ts AS matched_ts, r.click_value
    FROM events l
    ASOF LEFT JOIN (
      SELECT user_id AS r_user, ts AS r_ts, value AS click_value
      FROM events WHERE event_type = 'click'
    ) r ON l.user_id = r.r_user AND l.ts <= r.r_ts
    """,
)
def asof_join_forward(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = asof_join(
        ev, _clicks(spark, sf_dir),
        left_on="ts", right_on="r_ts", by_left="user_id", by_right="r_user",
        direction="forward", keep_match_ts=True,
    )
    return out.select("event_id", "user_id", "ts", "matched_ts", "click_value")


@_q(
    "enrich_entity_join",
    """
    WITH feat AS (
      SELECT md5(concat_ws(chr(31), CAST(user_id AS VARCHAR))) AS entity_system_record_id,
             round(avg(value), 6) AS user_avg_value,
             count(*) AS user_events
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.user_id, f.user_avg_value, f.user_events
    FROM (
      SELECT event_id, user_id,
             md5(concat_ws(chr(31), CAST(user_id AS VARCHAR))) AS entity_system_record_id
      FROM events
    ) e
    LEFT JOIN feat f USING (entity_system_record_id)
    """,
)
def enrich_entity_join(spark, sf_dir):
    """Enrichment equi-join on a deterministic entity id
    (features_enricher.py:4630-4698); md5 id for oracle portability."""
    from upgini_spark.joins.enrich import enrich
    from upgini_spark.pipeline.record_ids import row_hash

    ev = _t(spark, sf_dir, "events")
    with_id = ev.withColumn("entity_system_record_id", row_hash(["user_id"]))
    feats = (
        with_id.groupBy("entity_system_record_id")
        .agg(
            F.round(F.avg("value"), 6).alias("user_avg_value"),
            F.count(F.lit(1)).alias("user_events"),
        )
    )
    out = enrich(
        with_id.select("event_id", "user_id", "entity_system_record_id"),
        feats, broadcast_features=True,
    )
    return out.select("event_id", "user_id", "user_avg_value", "user_events")


# ===========================================================================
# Window / time-series operators (SURVEY.md §2.6)
# ===========================================================================

@_q(
    "roll_windows_7d",
    """
    SELECT event_id,
           round(avg(value) OVER w, 6) AS roll_mean,
           min(value) OVER w AS roll_min,
           max(value) OVER w AS roll_max,
           count(value) OVER w AS roll_count,
           round(coalesce(stddev_samp(value) OVER w, 0.0), 6) AS roll_std,
           round(sum(value) OVER w, 6) AS roll_sum
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_ms(ts)
      RANGE BETWEEN 604799999 PRECEDING AND CURRENT ROW
    )
    """,
)
def roll_windows_7d(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = roll_features(
        ev, "ts", ["user_id"], "value",
        [(7, "D", "mean"), (7, "D", "min"), (7, "D", "max"),
         (7, "D", "count"), (7, "D", "std"), (7, "D", "sum")],
    )
    return out.select(
        "event_id",
        F.round("value_roll_7D_mean", 6).alias("roll_mean"),
        F.col("value_roll_7D_min").alias("roll_min"),
        F.col("value_roll_7D_max").alias("roll_max"),
        F.col("value_roll_7D_count").alias("roll_count"),
        F.round(F.coalesce(F.col("value_roll_7D_std"), F.lit(0.0)), 6).alias("roll_std"),
        F.round("value_roll_7D_sum", 6).alias("roll_sum"),
    )


@_q(
    "roll_quantiles_7d",
    """
    SELECT event_id,
           round(median(value) OVER w, 6) AS roll_median,
           round(quantile_cont(value, 0.25) OVER w, 6) AS roll_q25,
           round(quantile_cont(value, 0.75) OVER w, 6) AS roll_q75,
           round(quantile_cont(value, 0.75) OVER w
                 - quantile_cont(value, 0.25) OVER w, 6) AS roll_iqr
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_ms(ts)
      RANGE BETWEEN 604799999 PRECEDING AND CURRENT ROW
    )
    """,
)
def roll_quantiles_7d(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = roll_features(
        ev, "ts", ["user_id"], "value",
        [(7, "D", "median"), (7, "D", "q25"), (7, "D", "q75"), (7, "D", "iqr")],
    )
    return out.select(
        "event_id",
        F.round("value_roll_7D_median", 6).alias("roll_median"),
        F.round("value_roll_7D_q25", 6).alias("roll_q25"),
        F.round("value_roll_7D_q75", 6).alias("roll_q75"),
        F.round("value_roll_7D_iqr", 6).alias("roll_iqr"),
    )


@_q(
    "time_lag_1d",
    """
    SELECT event_id,
           CASE WHEN min(epoch_ms(ts)) OVER w <= epoch_ms(ts) - 86400000
                THEN arg_min(value, epoch_ms(ts)) OVER w
           END AS lag_1d
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_ms(ts)
      RANGE BETWEEN 172799999 PRECEDING AND CURRENT ROW
    )
    """,
)
def time_lag_1d(spark, sf_dir):
    """Reference Lag semantics (lag.py:64-68): value as of t−1D within a
    2-day lookback, NaN when nothing is old enough."""
    ev = _t(spark, sf_dir, "events")
    out = lag_feature(ev, "ts", ["user_id"], "value", 1, "D", out_col="lag_1d")
    return out.select("event_id", "lag_1d")


@_q(
    "row_lag_delta",
    """
    SELECT event_id,
           lag(value) OVER w AS prev_value,
           round(value - lag(value) OVER w, 6) AS delta
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def row_lag_delta(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        prev.alias("prev_value"),
        F.round(F.col("value") - prev, 6).alias("delta"),
    )


@_q(
    "sessionize_30m",
    """
    SELECT event_id, user_id,
           CAST(sum(CASE WHEN prev_ts IS NULL
                     OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
                    THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
    FROM (
      SELECT event_id, user_id, ts,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
    """,
)
def sessionize_30m(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = sessionize(ev, "ts", ["user_id"], gap_seconds=1800, tie_cols=["event_id"])
    return out.select("event_id", "user_id", "session_id")


@_q(
    "session_stats",
    """
    WITH s AS (
      SELECT user_id, value, ts,
             CAST(sum(CASE WHEN prev_ts IS NULL
                       OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM (
        SELECT event_id, user_id, value, ts,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
      )
    )
    SELECT user_id, session_id,
           count(*) AS n_events,
           round(sum(value), 6) AS sum_value,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
    FROM s GROUP BY user_id, session_id
    """,
)
def session_stats(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    s = sessionize(ev, "ts", ["user_id"], gap_seconds=1800, tie_cols=["event_id"])
    return s.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 6).alias("sum_value"),
        (
            F.unix_micros(F.max("ts").cast("timestamp"))
            - F.unix_micros(F.min("ts").cast("timestamp"))
        ).alias("duration_us"),
    )


@_q(
    "trend_per_user",
    """
    WITH g AS (
      SELECT user_id, value,
             CAST(floor((epoch_ms(ts) - min(epoch_ms(ts)) OVER (PARTITION BY user_id))
                  / 86400000.0) AS DOUBLE) AS i
      FROM events
    )
    SELECT user_id,
           round(CASE WHEN (avg(i*i) - avg(i)*avg(i)) = 0 THEN 0.0
                 ELSE (avg(i*value) - avg(i)*avg(value))
                      / (avg(i*i) - avg(i)*avg(i)) END, 6) AS trend_coef
    FROM g GROUP BY user_id
    """,
)
def trend_per_user(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = trend_coefficient(ev, "ts", ["user_id"], "value", out_col="tc")
    return out.groupBy("user_id").agg(F.round(F.first("tc"), 6).alias("trend_coef"))


@_q("ewma_volatility_span10")  # recursive EWM: no clean ANSI-SQL oracle → rows-only
def ewma_volatility_span10(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = ewma_volatility(ev, "ts", ["user_id"], "value", span=10, out_col="ewma_vol")
    return out.select("event_id", "user_id", F.round("ewma_vol", 6).alias("ewma_vol"))


# ===========================================================================
# GroupByThen* (SURVEY.md §2.5)
# ===========================================================================

@_q(
    "groupby_then_ops",
    """
    SELECT o_orderkey,
           round(avg(o_totalprice) OVER (PARTITION BY o_orderpriority), 6) AS gb_mean,
           min(o_totalprice) OVER (PARTITION BY o_orderpriority) AS gb_min,
           max(o_totalprice) OVER (PARTITION BY o_orderpriority) AS gb_max,
           round(sum(o_totalprice) OVER (PARTITION BY o_orderpriority), 4) AS gb_sum,
           round(stddev_samp(o_totalprice) OVER (PARTITION BY o_orderpriority), 6) AS gb_std,
           count(DISTINCT o_orderstatus) OVER (PARTITION BY o_orderpriority) AS gb_nunique,
           round(CAST(count(*) OVER (PARTITION BY o_orderpriority, o_orderstatus) AS DOUBLE)
                 / count(*) OVER (PARTITION BY o_orderpriority), 6) AS gb_freq,
           round((CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice) AS DOUBLE)
                  + (count(*) OVER (PARTITION BY o_orderpriority, o_totalprice) - 1) / 2.0)
                 / count(*) OVER (PARTITION BY o_orderpriority), 6) AS gb_rank
    FROM orders
    """,
)
def groupby_then_ops(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    key = F.col("o_orderpriority")
    val = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.round(G.group_by_then("mean", key, val), 6).alias("gb_mean"),
        G.group_by_then("min", key, val).alias("gb_min"),
        G.group_by_then("max", key, val).alias("gb_max"),
        F.round(G.group_by_then("sum", key, val), 4).alias("gb_sum"),
        F.round(G.group_by_then("std", key, val), 6).alias("gb_std"),
        G.group_by_then_nunique(key, F.col("o_orderstatus")).cast("long").alias("gb_nunique"),
        F.round(G.group_by_then_freq(key, F.col("o_orderstatus")), 6).alias("gb_freq"),
        F.round(G.group_by_then_rank(key, val), 6).alias("gb_rank"),
    )


# ===========================================================================
# Contract functions
# ===========================================================================

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: as-of enrichment of events against the click stream +
    windowed temporal features + sessions, at sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    ev = _t(spark, sf_dir, "events")
    enriched = asof_join(
        ev, _clicks(spark, sf_dir),
        left_on="ts", right_on="r_ts", by_left="user_id", by_right="r_user",
        keep_match_ts=True,
    )
    feat = roll_features(
        enriched, "ts", ["user_id"], "value",
        [(7, "D", "mean"), (7, "D", "std"), (1, "D", "count")],
    )
    feat = sessionize(feat, "ts", ["user_id"], gap_seconds=1800, tie_cols=["event_id"])
    return feat


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(_ORACLES)
