"""Token-array operators for training-data pipelines.

The north-rule payload is pre-tokenized sequences (``tokens:
array<int32>``); these are the array-level operators a 100 TB pipeline
runs between enrichment and training: packing variable-length documents
into fixed-length chunks, truncation/padding, and token stats. No
reference counterpart (the reference is tabular-only) — first-class per
the task brief's training-data-pipeline mandate.

All operators are native expressions or single explode+agg passes; the
deterministic total order comes from the distributed
``global_running_sum`` (pipeline/record_ids.py), so there is no
single-partition stage at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def truncate_pad_tokens(
    tokens, max_len: int, pad_id: int = 0
) -> F.Column:
    """Fixed-length token rows: truncate to ``max_len`` or right-pad with
    ``pad_id`` — pure native array expression (slice + concat + repeat)."""
    t = tokens if not isinstance(tokens, str) else F.col(tokens)
    cut = F.slice(t, 1, max_len)
    pad_n = F.greatest(F.lit(0), F.lit(max_len) - F.size(t))
    pad = F.array_repeat(F.lit(pad_id).cast("int"), pad_n.cast("int"))
    return F.concat(cut, pad)


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    max_len: int,
    group_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing (the standard pretraining
    layout): documents are laid end-to-end along the deterministic total
    order (``id_col`` asc) and the concatenated token stream is cut into
    fixed ``max_len`` chunks — zero padding waste except the final chunk.

    Returns one row per chunk: (chunk_id, n_tokens, n_docs, first_doc,
    last_doc, tokens). Deterministic on any cluster size: document
    offsets come from the distributed running sum (range-partition +
    per-partition totals + broadcast prefix offsets — no
    ``Exchange SinglePartition``); the explode shuffles each token once
    on chunk_id, which is the honest cost of re-laying out a token
    stream and is embarrassingly parallel.

    Greedy first-fit bin packing (no cross-document splits) is the other
    classical layout; concat-and-chunk is chosen because it is
    order-deterministic, engine-portable (SQL-replayable — see the
    pack_sequences oracle), and what GPT-style pipelines actually do.

    ``group_cols`` packs WITHIN each group (per-source shards — documents
    never cross a group boundary; chunk ids restart per group): offsets
    then come from a per-group window cumsum, distributed across groups
    (each group is one window partition — use coarse groups like
    'source', not high-cardinality keys).
    """
    from pyspark.sql.window import Window

    from upgini_spark.pipeline.record_ids import global_running_sum

    groups = list(group_cols or [])
    d = df.select(
        *groups,
        F.col(id_col).alias("__pid__"),
        F.col(tokens_col).alias("__ptok__"),
        F.size(tokens_col).cast("long").alias("__pnt__"),
    )
    if groups:
        w = (
            Window.partitionBy(*groups)
            .orderBy(F.col("__pid__").asc())
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        d = d.withColumn("__pend__", F.sum("__pnt__").over(w))
    else:
        # offsets on the NARROW (id, count) projection — the running
        # sum's consistency checkpoint then materializes ~16 bytes/doc
        # instead of the full token arrays (measured: the wide variant's
        # checkpoint was a fixed serial floor that capped 2→8-core
        # scaling at 0.47); the arrays join back on id, one shuffle each
        # side, and are only ever shuffled twice total (join + chunk agg)
        offs = global_running_sum(
            d.select("__pid__", "__pnt__"),
            [F.col("__pid__").asc()], "__pnt__", "__pend__",
            num_partitions=num_partitions,
        ).select("__pid__", "__pend__")
        d = d.join(offs, "__pid__")
    tok = (
        d.select(
            *groups,
            "__pid__",
            (F.col("__pend__").cast("long") - F.col("__pnt__")).alias("__poff__"),
            F.posexplode("__ptok__").alias("__pi__", "tok"),
        )
        .withColumn("__pp__", F.col("__poff__") + F.col("__pi__"))
        .withColumn("chunk_id", (F.col("__pp__") / max_len).cast("long"))
        .withColumn("pos", (F.col("__pp__") % max_len).cast("int"))
    )
    # NO countDistinct in this agg: a DISTINCT aggregate mixed with the
    # collect_list forces the Expand rewrite — every token row is
    # duplicated through the aggregation (measured 2× the chunk-agg
    # stage). The doc id rides inside the sort struct instead and
    # n_docs folds out per chunk afterwards (≤ max_len ids per row).
    # pos is unique within a chunk, so the struct sort order — and the
    # token stream — is unchanged.
    agged = tok.groupBy(*groups, "chunk_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.min("__pid__").alias("first_doc"),
        F.max("__pid__").alias("last_doc"),
        F.array_sort(
            F.collect_list(F.struct("pos", "tok", "__pid__"))
        ).alias("__st__"),
    )
    return agged.select(
        *groups,
        "chunk_id",
        "n_tokens",
        F.size(
            F.array_distinct(
                F.transform(F.col("__st__"), lambda s: s["__pid__"])
            )
        ).cast("int").alias("n_docs"),
        "first_doc",
        "last_doc",
        F.transform(F.col("__st__"), lambda s: s["tok"]).alias("tokens"),
    )


# --------------------------------------------------------------------------
# Vocabulary build + word-id encoding (the tokenizer front of the pipeline)
# --------------------------------------------------------------------------


def build_word_vocab(
    df: DataFrame, text_col: str, k: int, min_count: int = 1
) -> DataFrame:
    """Frequency vocabulary over whitespace words: the top-``k`` words by
    (count DESC, word ASC — a total order, so the vocabulary is
    partition- and engine-deterministic) get ids 1..k; id 0 is reserved
    for OOV at encode time. Returns (word, token_id, cnt).

    Scale shape: one map-side-combinable word-count agg, then
    ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject (per-
    partition heaps + a k-row merge), never a global sort. The final
    row_number ranks the ALREADY-REDUCED k-row frame: its single
    partition holds k rows by construction (k = vocabulary size, 10^4-ish
    even at 100 TB), not corpus rows."""
    from pyspark.sql.window import Window

    counts = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    top = counts.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(k)
    w = Window.orderBy(F.col("cnt").desc(), F.col("word").asc())
    return top.select(
        "word", F.row_number().over(w).cast("int").alias("token_id"), "cnt"
    )


def encode_words(
    df: DataFrame, id_col: str, text_col: str, vocab: DataFrame
) -> DataFrame:
    """Encode text into vocabulary ids (OOV → 0), preserving word order.
    Returns (id, token_ids:array<int>, n_tok, n_oov).

    One posexplode + a broadcast join against the (bounded-size) vocab +
    one per-doc re-collect; the (pos, id) structs are sorted INSIDE the
    row (sort_array), never via an order-dependent collect_list. Empty
    texts survive with an empty array (posexplode_outer + coalesce)."""
    words = F.filter(
        F.split(F.col(text_col), " "), lambda x: x != ""
    )
    exploded = df.select(
        F.col(id_col).alias("__eid__"),
        F.posexplode_outer(words).alias("__pos__", "word"),
    )
    joined = exploded.join(F.broadcast(vocab.select("word", "token_id")),
                           "word", "left")
    tok = F.when(
        F.col("word").isNotNull(), F.coalesce("token_id", F.lit(0))
    ).cast("int")
    agged = joined.select("__eid__", "__pos__", tok.alias("__tok__")).groupBy(
        "__eid__"
    ).agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("__tok__").isNotNull(),
                        F.struct("__pos__", "__tok__"),
                    )
                )
            ),
            lambda s: s["__tok__"],
        ).alias("token_ids"),
    )
    return agged.select(
        F.col("__eid__").alias(id_col),
        "token_ids",
        F.size("token_ids").cast("int").alias("n_tok"),
        F.size(
            F.filter(F.col("token_ids"), lambda t: t == 0)
        ).cast("int").alias("n_oov"),
    )


def chunk_tokens_sliding(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    window: int,
    stride: int,
) -> DataFrame:
    """Per-document sliding-window chunking with overlap — the
    long-document op of embedding/eval pipelines (each doc becomes
    ⌈n/stride⌉ windows of ``window`` tokens starting at 0, stride,
    2·stride, …; stride < window overlaps, stride = window tiles).
    Complements :func:`pack_sequences` (which CONCATENATES docs — here a
    chunk never mixes documents and every token is covered).

    Returns one row per chunk: (id, chunk_idx, chunk:array<int>,
    n_chunk_tokens). The final window may be short (kept — dropping it
    would lose tail tokens); empty docs yield no rows.

    Scale shape: a pure per-row explode of ``sequence()`` starts +
    ``slice()`` — narrow, no shuffle, no state; the ~window/stride
    duplication factor is the honest cost of overlap and is capped by
    construction."""
    if stride <= 0 or window <= 0:
        raise ValueError("window and stride must be positive")
    t = F.col(tokens_col)
    n = F.size(t)
    # starts 0..last, last = floor((n-1)/stride); guard n=0 docs
    starts = F.sequence(
        F.lit(0), F.floor((n - F.lit(1)) / F.lit(stride)).cast("int")
    )
    out = df.filter(n > 0).select(
        F.col(id_col),
        F.explode(starts).alias("chunk_idx"),
        t.alias("__toks__"),
    )
    chunk = F.slice(
        F.col("__toks__"), F.col("chunk_idx") * stride + 1, window
    )
    return out.select(
        id_col,
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        chunk.alias("chunk"),
        F.size(chunk).cast("int").alias("n_chunk_tokens"),
    )


def mask_tokens(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    mask_id: int = -1,
    rate: float = 0.15,
    salt: str = "",
) -> DataFrame:
    """Deterministic MLM-style token masking — the corruption step of a
    masked-LM / span-corruption pretraining pipeline, made seed-free:
    position ``p`` of document ``d`` is masked iff the md5-uniform of
    (d, p, salt) < ``rate`` (same 60-bit hash-uniform construction as
    sampling.hash_uniform, so the SAME positions mask on any cluster
    size, any engine, and ``salt`` derives independent corruption
    epochs). Returns (id, masked:array<int>, labels:array<int>,
    n_masked): ``labels`` keeps the original id at masked positions and
    ``mask_id`` elsewhere (the loss-target convention), so
    ``masked[i] == mask_id  XOR  labels[i] == mask_id`` except that a
    document with zero masked positions keeps all-``mask_id`` labels.

    Pure per-row array transform (the two-arg ``F.transform`` lambda's
    index IS the position — used deliberately, see CLAUDE.md's trap
    note), no shuffle, no RNG state."""
    t = F.col(tokens_col)

    def u(i):
        h = F.md5(
            F.concat_ws(
                "\x1f",
                F.col(id_col).cast("string"),
                i.cast("string"),
                F.lit(salt),
            )
        )
        return (
            F.conv(F.substring(h, 1, 15), 16, 10).cast("double")
            / F.lit(float(1 << 60))
        )

    hit = lambda tok, i: u(i) < F.lit(float(rate))  # noqa: E731
    masked = F.transform(
        t, lambda tok, i: F.when(hit(tok, i), F.lit(mask_id)).otherwise(tok)
    )
    labels = F.transform(
        t, lambda tok, i: F.when(hit(tok, i), tok).otherwise(F.lit(mask_id))
    )
    return df.select(
        id_col,
        masked.cast("array<int>").alias("masked"),
        labels.cast("array<int>").alias("labels"),
        F.size(
            F.filter(labels, lambda x: x != mask_id)
        ).cast("int").alias("n_masked"),
    )
