"""Streaming variants of the temporal feature operators.

The reference is batch-only; the north rule adds the streaming discipline:
event-time watermarks guarantee zero temporal leakage for late data, and
session windows keyed by entity gaps. Mapping:

- windowed aggregates → ``F.window`` + ``withWatermark`` (append mode);
- sessionization → ``F.session_window`` (gap-based, watermark-closed);
- enrichment → stream-static join against the (slowly-changing) feature
  snapshot; PIT discipline holds because the static side carries
  ``feature_ts`` and the join filters ``feature_ts <= event_time``
  (stream-static joins allow arbitrary static-side predicates);
- custom stateful ops (EWMA) → ``applyInPandasWithState`` (not needed for
  the batch-parity surface; provided as the designated extension point).

Batch equivalence is tested by running the same aggregation over a file
stream with ``Trigger.AvailableNow`` and over the plain batch frame.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_agg_stream(
    stream: DataFrame,
    ts_col: str,
    groups: list[str],
    value_col: str,
    window_duration: str = "1 hour",
    watermark: str = "1 day",
) -> DataFrame:
    """Tumbling-window mean/count/sum per entity with a watermark; append
    mode emits each window once it is closed by the watermark."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*groups, F.window(F.col(ts_col), window_duration).alias("win"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(value_col), 6).alias("mean_value"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            *groups,
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "n_events", "mean_value", "sum_value",
        )
    )


def session_agg_stream(
    stream: DataFrame,
    ts_col: str,
    groups: list[str],
    value_col: str,
    gap: str = "30 minutes",
    watermark: str = "1 day",
) -> DataFrame:
    """Gap-based session windows (north rule: sessions keyed by doc_id
    gaps) — the streaming twin of operators.timeseries.sessionize."""
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(*groups, F.session_window(F.col(ts_col), gap).alias("sess"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("sum_value"),
        )
        .select(
            *groups,
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events", "sum_value",
        )
    )


def enrich_stream_static(
    stream: DataFrame,
    feature_snapshot: DataFrame,
    entity_col: str,
    ts_col: str,
    source_entity_col: str = "entity_id",
    source_ts_col: str = "feature_ts",
) -> DataFrame:
    """Point-in-time stream enrichment against a static feature snapshot:
    most-recent feature row with ``feature_ts <= event_time``.

    Implemented as stream-static left join on entity with the PIT predicate
    + per-input-row max-ts dedup; static side is broadcast by Catalyst when
    small. (True stream-stream as-of needs applyInPandasWithState; the
    snapshot join is the production-common case.)
    """
    feat_cols = [
        c for c in feature_snapshot.columns
        if c not in (source_entity_col, source_ts_col)
    ]
    snap = feature_snapshot.groupBy(source_entity_col).agg(
        F.max_by(F.struct(source_ts_col, *feat_cols), F.col(source_ts_col)).alias("__latest__"),
        F.sort_array(
            F.collect_list(F.struct(source_ts_col, *feat_cols)), asc=True
        ).alias("__history__"),
    ).select(source_entity_col, "__history__")

    joined = stream.join(
        snap, stream[entity_col] == snap[source_entity_col], "left"
    ).drop(source_entity_col)
    # last history element with feature_ts <= event_time (arrays are tiny:
    # one entity's history); element_at(-1) of the filtered prefix
    valid = F.filter(
        F.col("__history__"),
        lambda s: s[source_ts_col] <= F.col(ts_col),
    )
    picked = F.try_element_at(valid, F.lit(-1))  # empty history -> null
    out_cols = [F.col(c) for c in stream.columns]
    out_cols.append(picked[source_ts_col].alias("matched_ts"))
    out_cols.extend(picked[c].alias(c) for c in feat_cols)
    return joined.select(*out_cols)


def running_entity_stats_stream(
    stream: DataFrame,
    ts_col: str,
    entity_col: str,
    value_col: str,
    watermark: str = "1 day",
    timeout_conf: str = "NoTimeout",
) -> DataFrame:
    """Custom stateful per-entity running statistics via
    ``applyInPandasWithState`` — the extension point for recursive
    operators (EWMA-style) that window aggregates cannot express.

    State per entity: (n, mean, M2) — Welford's algorithm, so the running
    std is exact and mergeable across micro-batches. Emits one row per
    entity per micro-batch with the post-batch running stats.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType, LongType, StringType, StructField, StructType,
    )

    out_schema = StructType([
        StructField("entity", StringType()),
        StructField("n", LongType()),
        StructField("running_mean", DoubleType()),
        StructField("running_std", DoubleType()),
    ])
    state_schema = StructType([
        StructField("n", LongType()),
        StructField("mean", DoubleType()),
        StructField("m2", DoubleType()),
    ])

    def update(key, pdf_iter, state: GroupState):
        n, mean, m2 = state.get if state.exists else (0, 0.0, 0.0)
        for pdf in pdf_iter:
            for v in pdf[value_col].astype("float64"):
                n += 1
                d = v - mean
                mean += d / n
                m2 += d * (v - mean)
        state.update((n, mean, m2))
        std = (m2 / (n - 1)) ** 0.5 if n > 1 else None
        yield pd.DataFrame(
            {"entity": [key[0]], "n": [n], "running_mean": [mean], "running_std": [std]}
        )

    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(entity_col)
        .applyInPandasWithState(
            update, out_schema, state_schema, "append",
            GroupStateTimeout.NoTimeout,
        )
    )


def asof_join_stream_stream(
    events: DataFrame,
    features: DataFrame,
    entity_col: str = "entity",
    event_ts_col: str = "event_time",
    event_id_col: str = "event_id",
    feature_ts_col: str = "feature_ts",
    feature_val_col: str = "value",
    watermark: str = "1 day",
    emit: str = "immediate",
    feature_val_cols: list[str] | None = None,
) -> DataFrame:
    """True stream-stream point-in-time as-of join via
    ``applyInPandasWithState`` (the north rule's custom stateful operator).

    Both streams are unioned into one keyed stream (side marker), grouped
    by entity; per-entity state holds the sorted feature history plus any
    buffered events. Each event matches the latest feature with
    ``feature_ts <= event_time`` — zero temporal leakage by construction,
    regardless of arrival order ACROSS micro-batches for history that has
    already arrived.

    ``emit`` modes:

    - ``immediate``: events are matched and emitted in their arrival
      micro-batch (features of the same batch are applied first). Lowest
      latency; a feature row arriving in a LATER batch than an already
      emitted event cannot retro-update it.
    - ``watermark``: events buffer in state until the event-time watermark
      passes their timestamp, so every feature row ≤ the event time is
      guaranteed to have arrived (late data bounded by the watermark
      delay) — exact batch-as-of parity at the cost of watermark latency.

    History pruning: rows older than the newest history row that is ≤ the
    watermark can never match a future event (events below the watermark
    are final) — state stays O(updates within the watermark horizon),
    PLUS one retained row per entity: a dormant entity's last feature is
    still the point-in-time-correct match for an event arriving years
    later, so state is never fully dropped by design. If business rules
    bound feature validity, filter dormant entities upstream (an
    event-time TTL here would silently break PIT correctness for
    long-gap entities).

    Contract: events(entity, event_id, event_time), features(entity,
    feature_ts, *payload). ``feature_val_cols`` carries WIDE payloads
    through state directly (one typed array per column in the
    dynamically-built state schema) — no join-back on event_id; the
    default ``[feature_val_col]`` keeps the narrow round-2 contract.
    Output columns keep each payload's source type.
    """
    import pandas as pd  # noqa: F811 (kernel-side import)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        ArrayType, LongType, StructField, StructType,
    )

    payload_cols = list(feature_val_cols) if feature_val_cols else [feature_val_col]
    ftypes = {f.name: f.dataType for f in features.schema.fields}
    etype = {f.name: f.dataType for f in events.schema.fields}[entity_col]

    out_schema = StructType(
        [
            StructField("entity", etype),
            StructField("event_id", LongType()),
            StructField("event_time_us", LongType()),
            StructField("matched_ts_us", LongType()),
        ]
        + [StructField(c, ftypes[c]) for c in payload_cols]
    )
    state_schema = StructType(
        [StructField("hist_ts", ArrayType(LongType()))]
        + [StructField(f"hist_p{i}", ArrayType(ftypes[c]))
           for i, c in enumerate(payload_cols)]
        + [
            StructField("pend_ts", ArrayType(LongType())),
            StructField("pend_id", ArrayType(LongType())),
        ]
    )
    n_p = len(payload_cols)

    ev = events.withWatermark(event_ts_col, watermark).select(
        F.col(entity_col).alias("entity"),
        F.col(event_ts_col).alias("ts"),
        F.lit(1).alias("side"),
        F.col(event_id_col).cast("long").alias("event_id"),
        *[F.lit(None).cast(ftypes[c]).alias(c) for c in payload_cols],
    )
    ft = features.withWatermark(feature_ts_col, watermark).select(
        F.col(entity_col).alias("entity"),
        F.col(feature_ts_col).alias("ts"),
        F.lit(0).alias("side"),
        F.lit(None).cast("long").alias("event_id"),
        *payload_cols,
    )
    unioned = ev.unionByName(ft)
    buffered = emit == "watermark"

    def update(key, pdf_iter, state: GroupState):
        import bisect

        if state.exists:
            st = state.get
            hist_ts = list(st[0])
            hist_p = [list(st[1 + i]) for i in range(n_p)]
            pend_ts, pend_id = list(st[1 + n_p]), list(st[2 + n_p])
        else:
            hist_ts, hist_p = [], [[] for _ in range(n_p)]
            pend_ts, pend_id = [], []

        def _clean(x):
            # token arrays (array<int32>) are first-class payload: pd.isna
            # on a list/ndarray cell raises or returns elementwise — only
            # scalar cells get the null normalization
            if x is None:
                return None
            if isinstance(x, (list, tuple, dict)):
                return x
            if hasattr(x, "tolist") and getattr(x, "ndim", 0):
                return x.tolist()  # ndarray cell from Arrow
            try:
                return None if pd.isna(x) else x
            except (TypeError, ValueError):
                return x

        new_events = []
        for pdf in pdf_iter:
            ts_us = (pdf["ts"].astype("datetime64[us]").astype("int64")).tolist()
            payload_lists = [
                [_clean(x) for x in pdf[c].tolist()] for c in payload_cols
            ]
            for j, (t, side, eid) in enumerate(
                zip(ts_us, pdf["side"].tolist(), pdf["event_id"].tolist())
            ):
                if side == 0:
                    i = bisect.bisect_right(hist_ts, t)
                    hist_ts.insert(i, t)
                    for pi in range(n_p):
                        hist_p[pi].insert(i, payload_lists[pi][j])
                else:
                    new_events.append((t, int(eid)))

        wm_ms = state.getCurrentWatermarkMs()
        wm_us = wm_ms * 1000 if wm_ms > 0 else None

        def match(t):
            i = bisect.bisect_right(hist_ts, t)
            if i == 0:
                return (None,) + (None,) * n_p
            return (hist_ts[i - 1],) + tuple(hist_p[pi][i - 1] for pi in range(n_p))

        out = []
        if buffered:
            pend = sorted(zip(pend_ts, pend_id)) + sorted(new_events)
            still = []
            for t, eid in pend:
                if wm_us is not None and t <= wm_us:
                    out.append((key[0], eid, t) + match(t))
                else:
                    still.append((t, eid))
            pend_ts = [t for t, _ in still]
            pend_id = [i for _, i in still]
        else:
            for t, eid in sorted(new_events):
                out.append((key[0], eid, t) + match(t))

        # prune: history strictly older than the newest row <= watermark is
        # unreachable for any future (post-watermark) event
        if wm_us is not None and hist_ts:
            cut = bisect.bisect_right(hist_ts, wm_us) - 1
            if cut > 0:
                hist_ts = hist_ts[cut:]
                hist_p = [p[cut:] for p in hist_p]
        state.update(tuple([hist_ts] + hist_p + [pend_ts, pend_id]))
        if out:
            yield pd.DataFrame(
                out,
                columns=["entity", "event_id", "event_time_us", "matched_ts_us"]
                + payload_cols,
            )

    return unioned.groupBy("entity").applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def dedup_stream(
    stream: DataFrame,
    subset: list[str],
    ts_col: str,
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming exact dedup: first arrival of each ``subset`` key wins;
    duplicates arriving within the event-time watermark horizon are
    dropped (``dropDuplicatesWithinWatermark``), so state stays bounded
    by the horizon instead of growing with the stream — the streaming
    twin of dedup.drop_full_duplicates for at-least-once sources whose
    replays land inside the watermark."""
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        subset
    )
