"""Deterministic synthetic fixtures (FIXTURES.md F1/F2).

Everything derives from ``spark.range(n)`` + hash expressions, so tables
are (a) reproducible bit-for-bit at any scale without external data and
(b) generated fully distributed — no driver-side loops, no Python UDFs.
This is how we synthesize the ``BASELINE.json`` input_hint shape
``(doc_id:string, tokens:array<int32>, n_tok:int32, source:string)`` for
tests and for the sequences/sec benchmark.

Skew contract (FIXTURES.md F1): ~10% of rows hash onto a small hot set of
entities so the as-of join's salting path is actually exercised.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VOCAB_SIZE = 50257  # GPT-2-ish vocab, per FIXTURES.md F1
MIN_TOK, MAX_TOK = 8, 512
SOURCES = ["web", "books", "code", "wiki"]


def _h(*cols) -> F.Column:
    """Deterministic non-negative 64-bit hash of the given columns."""
    return F.abs(F.xxhash64(*cols))


def tokenized_sequences(
    spark: SparkSession,
    n_rows: int,
    *,
    seed: int = 42,
    n_partitions: int | None = None,
) -> DataFrame:
    """F1: the primary tokenized-sequence table.

    Columns: doc_id string, tokens array<int32> (byte-identity payload),
    n_tok int32, source string, event_time timestamp, eval_set_index int32
    (0 train / 1 eval / 2 OOT — mirrors EVAL_SET_INDEX semantics,
    reference: src/upgini/features_enricher.py:2483-2501), target double
    (null for OOT rows).
    """
    df = spark.range(0, n_rows, numPartitions=n_partitions)
    i = F.col("id")
    s = F.lit(seed)

    # ~10% of rows collapse onto a hot entity set of max(n//1000, 1) ids.
    n_hot = max(n_rows // 1000, 1)
    is_hot = _h(i, s, F.lit("hot?")) % 10 == 0
    entity = F.when(is_hot, _h(i, s, F.lit("hot")) % n_hot).otherwise(i)

    n_tok = (F.lit(MIN_TOK) + _h(i, s, F.lit("ntok")) % (MAX_TOK - MIN_TOK + 1)).cast("int")
    tokens = F.transform(
        F.sequence(F.lit(0), n_tok - 1),
        lambda j: (_h(i, s, j) % VOCAB_SIZE).cast("int"),
    )

    event_time = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2023-01-01 00:00:00"))
        + (_h(i, s, F.lit("day")) % 365) * 86400
        + _h(i, s, F.lit("sec")) % 86400
    )

    split = _h(i, s, F.lit("split")) % 100
    eval_set_index = (
        F.when(split < 80, 0).when(split < 95, 1).otherwise(2).cast("int")
    )
    target = F.when(
        eval_set_index < 2, F.sin((_h(i, s, F.lit("y")) % 100000).cast("double") / 1000.0)
    )

    return df.select(
        F.format_string("doc%09d", entity).alias("doc_id"),
        tokens.alias("tokens"),
        n_tok.alias("n_tok"),
        F.element_at(F.array(*[F.lit(x) for x in SOURCES]), (_h(i, s, F.lit("src")) % 4 + 1).cast("int")).alias("source"),
        event_time.alias("event_time"),
        eval_set_index.alias("eval_set_index"),
        target.alias("target"),
    )


def feature_source(
    spark: SparkSession,
    n_entities: int,
    *,
    points_per_entity: int = 12,
    seed: int = 42,
    hit_rate: float = 0.85,
    n_partitions: int | None = None,
) -> DataFrame:
    """F2: external feature-source table (right side of the as-of join).

    Irregular per-entity timestamp grid over 2022-06-01..2023-12-31 so
    backward as-of matching is non-trivial; ~``hit_rate`` of entities from
    the F1 doc_id space appear (hit-rate reporting mirrors
    src/upgini/metadata.py:308-314).
    """
    base = spark.range(0, n_entities * points_per_entity, numPartitions=n_partitions)
    s = F.lit(seed)
    ent = (F.col("id") / points_per_entity).cast("long")
    k = F.col("id") % points_per_entity

    present = (_h(ent, s, F.lit("hit")) % 100) < int(hit_rate * 100)
    span = F.unix_timestamp(F.lit("2023-12-31 23:59:59")) - F.unix_timestamp(
        F.lit("2022-06-01 00:00:00")
    )
    feature_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit("2022-06-01 00:00:00"))
        + _h(ent, s, k, F.lit("ts")) % span
    )

    def walk(tag: str) -> F.Column:
        # deterministic pseudo random walk: cumulative-free but smooth-ish
        return (
            (_h(ent, s, F.lit(tag)) % 1000).cast("double") / 100.0
            + (k.cast("double")) * ((_h(ent, s, F.lit(tag + "slope")) % 200).cast("double") / 100.0 - 1.0)
            + (_h(ent, s, k, F.lit(tag + "noise")) % 100).cast("double") / 100.0
        )

    return (
        base.filter(present)
        .select(
            F.format_string("doc%09d", ent).alias("entity_id"),
            feature_ts.alias("feature_ts"),
            F.round(walk("f1"), 4).alias("f_ext_num_1"),
            F.round(walk("f2"), 4).alias("f_ext_num_2"),
            F.round(walk("f3"), 4).alias("f_ext_num_3"),
            F.element_at(
                F.array(F.lit("A"), F.lit("B"), F.lit("C"), F.lit("D")),
                (_h(ent, s, k, F.lit("cat")) % 4 + 1).cast("int"),
            ).alias("f_ext_cat"),
        )
        .dropDuplicates(["entity_id", "feature_ts"])
    )
