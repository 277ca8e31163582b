"""Deduplication operators.

Reference semantics (src/upgini/utils/deduplicate_utils.py):
- full-row keep-first dedup excluding system columns (:162-255, keep-first
  at :188-192);
- key-conflict dedup: rows whose search keys collide with *different
  targets* are all removed, keep=False (:228-253);
- fintech dedup: among key-duplicate groups, drop groups whose differing
  targets occur within a 60-day window (:21-159, window :95-100).

Scale additions (not in the reference; first-class per the task brief):
MinHash-LSH, SimHash and n-gram-Jaccard near-duplicate detection over a
document corpus — all expressed with native array/higher-order functions
(hashes are md5-based so an ANSI-SQL oracle can reproduce them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def drop_full_duplicates(
    df: DataFrame, subset: list[str] | None = None, order_col: str | None = None
) -> DataFrame:
    """Keep-first full dedup (deduplicate_utils.py:188-192) with an explicit
    total order: "first" = smallest ``order_col`` (required at scale —
    Spark has no implicit row order)."""
    cols = subset or df.columns
    if order_col is None:
        return df.dropDuplicates(cols)
    w = Window.partitionBy(*cols).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn__", F.row_number().over(w))
        .filter(F.col("__rn__") == 1)
        .drop("__rn__")
    )


def drop_key_conflicts(df: DataFrame, keys: list[str], target: str) -> DataFrame:
    """Remove ALL rows of key groups holding >1 distinct target
    (keep=False semantics, deduplicate_utils.py:228-253)."""
    w = Window.partitionBy(*keys)
    n_targets = F.size(F.collect_set(F.col(target)).over(w))
    return (
        df.withColumn("__nt__", n_targets)
        .filter(F.col("__nt__") <= 1)
        .drop("__nt__")
    )


def fintech_dedup(
    df: DataFrame,
    keys: list[str],
    target: str,
    ts_col: str,
    window_seconds: int = 60 * 86400,
) -> DataFrame:
    """Drop whole key groups where two *different* targets occur within
    ``window_seconds`` of each other (deduplicate_utils.py:95-100: sorted
    adjacent diff < 60 days ms with target change)."""
    w = Window.partitionBy(*keys).orderBy(F.col(ts_col).asc())
    prev_t = F.lag(F.col(target)).over(w)
    prev_ts = F.lag(F.col(ts_col)).over(w)
    close_conflict = (
        prev_t.isNotNull()
        & (prev_t != F.col(target))
        & (
            (F.unix_micros(F.col(ts_col).cast("timestamp"))
             - F.unix_micros(prev_ts.cast("timestamp")))
            < window_seconds * 1_000_000
        )
    ).cast("int")
    wg = Window.partitionBy(*keys)
    flagged = F.max(close_conflict).over(wg)
    return (
        df.withColumn("__flag__", flagged)
        .filter(F.col("__flag__") == 0)
        .drop("__flag__")
    )


# --------------------------------------------------------------------------
# Near-duplicate detection at scale
# --------------------------------------------------------------------------

def shingle_array(words: F.Column, n: int, fallback: F.Column) -> F.Column:
    """n-gram shingles of a token array via n shifted slices zipped with
    concat — the array expression is referenced O(n) times (n slices +
    one size), NOT O(n·k) as the element_at-per-index form was: inside a
    higher-order lambda each element_at re-evaluates the whole source
    expression per element (the round-4 decontaminate cliff, 150× on
    50-shingle docs). Shorter-than-n docs yield ``[fallback]``."""
    k = F.size(words) - (n - 1)
    kk = F.greatest(k, F.lit(0))
    parts = [F.slice(words, j + 1, kk) for j in range(n)]
    zipped = parts[0]
    for p in parts[1:]:
        zipped = F.zip_with(zipped, p, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.when(k >= 1, zipped).otherwise(F.array(fallback))


def word_shingles(text_col: str, n: int = 3) -> F.Column:
    """n-word shingles of a whitespace-tokenized text column (native
    higher-order functions, no Python)."""
    c = F.col(text_col)
    return shingle_array(F.split(c, " "), n, c)


def _minhash_perm_constants(k: int) -> list[int]:
    """Deterministic 60-bit XOR masks, one per permutation — md5-derived so
    any engine can regenerate them."""
    import hashlib

    return [int(hashlib.md5(f"perm{j}".encode()).hexdigest()[:15], 16) for j in range(k)]


def minhash_signature(
    df: DataFrame, text_col: str, k: int = 8, shingle_n: int = 3,
    out_prefix: str = "mh",
) -> DataFrame:
    """k minhashes over word shingles. Each WORD is md5-hashed once
    (first 48 bits → bigint); a shingle's hash is the Rabin-Karp roll
    ``(w1*31 + w2)*31 + w3`` of its word hashes; permutation j = XOR with
    a fixed md5-derived 60-bit mask (the standard XOR-family trick), so
    the md5 cost is one per word, not per shingle per permutation.
    Engine-portable — DuckDB replays it as::

        word hash:   ('0x' || substr(md5(w), 1, 12))::BIGINT
        shingle:     (w1*31 + w2)*31 + w3
        minhash_j:   min(xor(shingle, mask_j))   -- masks from
                     _minhash_perm_constants: md5('perm{j}') first 15 hex

    (see the minhash_signatures oracle in __spark_entry__.py for the full
    SQL). Scales: per-row arrays only, no shuffle.
    """
    masks = _minhash_perm_constants(k)
    if shingle_n != 3:
        raise ValueError("rolling shingle hash is specialized to shingle_n=3")
    # Hash each WORD once (first 48 md5 bits), then the shingle hash is the
    # Rabin-Karp style roll (w1*31 + w2)*31 + w3 — no per-shingle string
    # concat or md5 (measured 5x vs md5-per-shingle at sf0.1). Max value
    # 2^48 * 993 < 2^58, safe under ANSI long arithmetic. Docs shorter than
    # one shingle fall back to the left-fold of all word hashes.
    words = F.split(F.col(text_col), " ")
    wh = F.transform(
        words, lambda w: F.conv(F.substring(F.md5(w), 1, 12), 16, 10).cast("long")
    )
    n_sh = F.size(words) - (shingle_n - 1)
    staged = df.withColumn("__wh__", wh).withColumn(
        "__hs__",
        F.when(
            n_sh >= 1,
            F.transform(
                F.sequence(F.lit(1), n_sh),
                lambda i: (
                    F.element_at(F.col("__wh__"), i.cast("int")) * 31
                    + F.element_at(F.col("__wh__"), (i + 1).cast("int"))
                ) * 31
                + F.element_at(F.col("__wh__"), (i + 2).cast("int")),
            ),
        ).otherwise(
            F.array(
                F.aggregate(
                    F.col("__wh__"), F.lit(0).cast("long"), lambda a, x: a * 31 + x
                )
            )
        ),
    )
    def _xored(m: int):
        # single-arg lambda: a two-arg one would receive (element, index)
        # and the mask default would be shadowed by the index
        return lambda h: h.bitwiseXOR(F.lit(m))

    cols = [
        F.array_min(F.transform(F.col("__hs__"), _xored(masks[j]))).alias(
            f"{out_prefix}{j}"
        )
        for j in range(k)
    ]
    return staged.select(*df.columns, *cols)


def minhash_band_pairs(
    df: DataFrame, id_col: str, text_col: str,
    k: int = 8, bands: int = 4, shingle_n: int = 3,
) -> DataFrame:
    """LSH candidate pairs: signatures banded into ``bands`` groups of
    k/bands rows; docs sharing any full band collide. One shuffle on the
    band key — the scale path for near-dup at 10^12 rows (band key is
    uniformly distributed; no hot keys)."""
    rows_per_band = k // bands
    sig = minhash_signature(df.select(id_col, text_col), text_col, k, shingle_n)
    band_cols = [
        F.md5(F.concat_ws("|", *[F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)])).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    banded = sig.select(id_col, *band_cols)
    melted = banded.select(
        id_col,
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_no"), F.col(f"band{b}").alias("band_key"))
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select(id_col, "bk.band_no", "bk.band_key")
    # materialize the melted band keys ONCE (eager localCheckpoint): the
    # band SELF-join consumes the frame as both sides and exchange reuse
    # does not fire for the aliased twin, so the shingle+minhash
    # signature chain otherwise computes twice (the
    # embedding_near_dup_lsh lesson; the frame is 16-byte keys ×
    # bands per doc — tiny at any scale)
    melted = melted.localCheckpoint(eager=True)
    a = melted.alias("a")
    b = melted.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_no") == F.col("b.band_no"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def ngram_jaccard(
    a_text: F.Column, b_text: F.Column, n: int = 3
) -> F.Column:
    """Exact n-gram (word) Jaccard similarity between two text columns."""
    def sh(c):
        return F.array_distinct(shingle_array(F.split(c, " "), n, c))

    sa, sb = sh(a_text), sh(b_text)
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = F.size(F.array_union(sa, sb)).cast("double")
    return F.try_divide(inter, union)


def simhash_table(
    df: DataFrame, text_col: str, out_col: str = "simhash",
    bits: int = 32, keep: list[str] | None = None,
) -> DataFrame:
    """SimHash over whitespace tokens, staged: the md5 token-hash array
    materializes as ONE column, then the ``bits`` per-bit majority
    aggregates read that attribute — the Column-expression form
    (:func:`simhash64`) re-evaluates the md5 transform once per bit
    (32× per row, measured 9 s → sub-second on 5k docs at sf0.1)."""
    keep = list(keep if keep is not None else df.columns)
    words = F.split(F.col(text_col), " ")
    staged = df.select(
        *keep,
        F.transform(
            words, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        ).alias("__th__"),
    )
    th = F.col("__th__")

    def bit_sum(b: int) -> F.Column:
        return F.aggregate(
            th,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1),
        )

    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(bit_sum(b) > 0, F.lit(1 << b).cast("long")).otherwise(0)
    return staged.select(*keep, out.alias(out_col))


def simhash64(text_col: str, bits: int = 32) -> F.Column:
    """SimHash over whitespace tokens: bit b of the fingerprint is the
    majority vote of bit b across md5(token) hashes. md5-hex → integer via
    conv(); ``bits``≤32 keeps the per-bit sum in long range. Native
    higher-order expressions only.

    NOTE: as a bare Column the token-hash transform is re-evaluated once
    per bit — prefer :func:`simhash_table` (staged, one md5 pass) for
    anything beyond a handful of rows."""
    words = F.split(F.col(text_col), " ")
    tok_hash = F.transform(words, lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"))
    def bit_sum(b: int) -> F.Column:
        return F.aggregate(
            tok_hash,
            F.lit(0).cast("long"),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(1 << b)) != 0, 1).otherwise(-1),
        )
    out = F.lit(0).cast("long")
    for b in range(bits):
        out = out + F.when(bit_sum(b) > 0, F.lit(1 << b).cast("long")).otherwise(0)
    return out


def embedding_near_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.95
) -> DataFrame:
    """Embedding-cosine near-dup pairs (brute force; compose with LSH
    bucketing from similarity.py for the scale path)."""
    from upgini_spark.functions.similarity import _staged_cos
    from upgini_spark.operators.binary import _norm2

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                  _norm2(F.col(vec_col)).alias("__an__"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                  _norm2(F.col(vec_col)).alias("__bn__"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", _staged_cos("va", "vb", "__an__", "__bn__"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def remove_fintech_duplicates(
    df: DataFrame,
    personal_cols: list[str],
    target_col: str,
    date_col: str,
    eval_set_index_col: str = "eval_set_index",
    window_seconds: int = 60 * 86400,
) -> DataFrame:
    """Full remove_fintech_duplicates pipeline with the reference's
    applicability gates (deduplicate_utils.py:21-135), per eval segment:

    1. BINARY task only (exactly 2 distinct targets) and personal keys
       present — otherwise unchanged;
    2. skip the segment when >=60% of duplicated personal-key groups span
       multiple dates (looks like a legitimate time series, not fintech
       repeat applications);
    3. remove ALL rows of personal-key groups whose target CHANGES between
       date-adjacent rows less than 60 days apart.

    ALL segments fold into ONE stats job — a grouped aggregation over
    (segment, personal_keys) rolled up to one row per segment (bounded
    collect: segments are 2-4 in practice) — and ONE conditional filter
    pass, instead of a per-segment collect + union loop whose plan and
    job count grew linearly with the segment count.
    """
    if not personal_cols:
        return df
    n_targets = df.select(target_col).distinct().limit(3).count()
    if n_targets != 2:
        return df

    has_eval = eval_set_index_col in df.columns
    seg = (
        F.col(eval_set_index_col) if has_eval else F.lit(0)
    ).alias("__seg__")

    groups = df.select(seg, *personal_cols, date_col, target_col).groupBy(
        "__seg__", *personal_cols
    ).agg(
        F.count(F.lit(1)).alias("__n__"),
        F.countDistinct(F.col(date_col)).alias("__nd__"),
        F.countDistinct(F.col(target_col)).alias("__nt__"),
    )
    seg_stats = groups.groupBy("__seg__").agg(
        F.count(F.lit(1)).alias("total"),
        F.sum((F.col("__n__") > 1).cast("int")).alias("dups"),
        F.sum((F.col("__nd__") > 1).cast("int")).alias("diff_dates"),
        F.sum(((F.col("__n__") > 1) & (F.col("__nt__") > 1)).cast("int"))
        .alias("conflicts"),
    ).collect()
    dedup_segs = [
        r["__seg__"]
        for r in seg_stats
        if r["dups"]
        and r["total"]
        and r["diff_dates"] / r["total"] < 0.6
        and r["conflicts"]
    ]
    if not dedup_segs:
        return df

    # one adjacency-window pass over (segment, keys); rows in segments
    # that failed a gate pass through untouched. Null segments group fine
    # under partitionBy and match via eqNullSafe.
    w = Window.partitionBy(seg, *[F.col(c) for c in personal_cols]).orderBy(
        F.col(date_col).asc()
    )
    prev_t = F.lag(F.col(target_col)).over(w)
    prev_ts = F.lag(F.col(date_col)).over(w)
    close_conflict = (
        prev_t.isNotNull()
        & (prev_t != F.col(target_col))
        & (
            (F.unix_micros(F.col(date_col).cast("timestamp"))
             - F.unix_micros(prev_ts.cast("timestamp")))
            < window_seconds * 1_000_000
        )
    ).cast("int")
    wg = Window.partitionBy(seg, *[F.col(c) for c in personal_cols])
    in_dedup_seg = None
    seg_val = F.col(eval_set_index_col) if has_eval else F.lit(0)
    for s in dedup_segs:
        cond = seg_val.eqNullSafe(F.lit(s))
        in_dedup_seg = cond if in_dedup_seg is None else (in_dedup_seg | cond)
    return (
        df.withColumn("__flag__", F.max(close_conflict).over(wg))
        .filter(~in_dedup_seg | (F.col("__flag__") == 0))
        .drop("__flag__")
    )


# --------------------------------------------------------------------------
# Duplicate-cluster resolution (beyond-reference scale operator): LSH/band
# joins emit candidate PAIRS; an actual dedup pass must group pairs into
# clusters and keep one document per cluster. Connected components via
# distributed min-label propagation.
# --------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
    driver_edge_cap: int = 1_000_000,
) -> DataFrame:
    """Connected components of the duplicate-pair graph → (node, component)
    where ``component`` is the MINIMUM node id in the component (canonical,
    deterministic, engine-portable).

    Distributed min-label propagation WITH pointer jumping: each
    iteration takes ``label(n) = min(label(n), min over neighbors'
    labels, label(label(n)))``. The neighbor term moves labels one hop;
    the label-of-label term halves pointer chains (path doubling), so the
    worst case — a pure chain — converges in O(log n) rounds, not
    O(diameter). Near-dup clusters from banded LSH are near-cliques and
    finish in 2-4 rounds either way. Per iteration: one edge equi-join +
    one map-side-combinable min agg + one self-join of the (small) label
    table; each round's labels are cut from the lineage with an eager
    ``localCheckpoint`` — iterative Spark plans otherwise grow
    exponentially and re-execute from scratch every round.

    Raises ``RuntimeError`` if ``max_iter`` rounds do not reach the
    fixpoint (silently-wrong components would poison a dedup pass); 20
    rounds cover any graph up to ~2^20-deep chains with pointer jumping.

    Only nodes that appear in ``pairs`` are returned; callers treat
    missing ids as singleton components.

    Size dispatch (same spirit as Spark's broadcast-join threshold): up
    to ``driver_edge_cap`` DISTINCT edges, the component labels are
    computed with a driver-side union-find instead — a near-dup pair
    graph from banded LSH is tiny relative to its corpus (edges ∝
    duplicates, not rows), and the distributed loop costs ~2 jobs per
    round in fixed scheduling overhead. Identical output by
    construction (min-id labeling either way); graphs over the cap take
    the distributed min-label-propagation path unchanged.
    """
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    dedges = edges.distinct().localCheckpoint(eager=True)
    if dedges.count() <= driver_edge_cap:
        rows = dedges.collect()
        parent: dict = {}

        def find(x):
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for r in rows:
            a, b = r["a"], r["b"]
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[ra] = rb
        comp: dict = {}
        for node in parent:
            root = find(node)
            cur = comp.get(root)
            if cur is None or node < cur:
                comp[root] = node
        spark = pairs.sparkSession
        from pyspark.sql.types import StructField, StructType

        schema = StructType(
            [
                StructField("node", pairs.schema[id_a].dataType, True),
                StructField("component", pairs.schema[id_a].dataType, True),
            ]
        )
        data = [(node, comp[find(node)]) for node in parent]
        return spark.createDataFrame(data, schema)

    sym = dedges.unionByName(
        dedges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=True)
    )
    n_changed = 0
    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy("a")
            .agg(F.min("label").alias("__nl__"))
        )
        ptr = labels.select(
            F.col("node").alias("__pn__"), F.col("label").alias("__pl__")
        )
        stepped = (
            labels.join(nbr, labels["node"] == nbr["a"], "left")
            .join(ptr, labels["label"] == ptr["__pn__"], "left")
            .select(
                "node",
                F.col("label").alias("__old__"),
                F.least(
                    F.col("label"),
                    F.coalesce("__nl__", "label"),
                    F.coalesce("__pl__", "label"),
                ).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = stepped.filter(F.col("label") != F.col("__old__")).count()
        labels = stepped.select("node", "label")
        if n_changed == 0:
            break
    if n_changed:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({n_changed} labels still moving) — raise max_iter"
        )
    return labels.select("node", F.col("label").alias("component"))


def near_dup_keep_canonical(
    df: DataFrame,
    id_col: str,
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep one row per duplicate cluster: the row whose id equals its
    component's canonical (minimum) id; rows in no pair are singletons and
    always kept. The drop list scales with the duplicate COUNT (at a 30%
    dup rate on 10^9 docs it is 3·10^8 ids — far past any broadcast
    limit), so the anti-join is left un-hinted: AQE broadcasts it when it
    actually is small and falls back to a shuffled anti-join otherwise."""
    cc = connected_components(pairs, id_a, id_b)
    drop = cc.filter(F.col("component") != F.col("node")).select(
        F.col("node").alias(id_col)
    )
    return df.join(drop, on=id_col, how="left_anti")


def decontaminate_ngrams(
    corpus: DataFrame,
    benchmark: DataFrame,
    corpus_id: str,
    corpus_text: str,
    benchmark_text: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing any word
    ``shingle_n``-gram with the benchmark/eval set (the GPT-3-style
    overlap check that keeps test answers out of training data).

    Shingles are hashed with the same 48-bit-word-hash Rabin-Karp roll as
    :func:`minhash_signature` (engine-portable), so the check is one
    explode of the corpus shingles + one semi-join against the DISTINCT
    benchmark shingle-hash set — broadcast when the benchmark is
    benchmark-sized, shuffled equi-join otherwise (AQE decides; no hint).
    Returns (corpus_id, contaminated) one row per corpus document.
    """
    if shingle_n != 3:
        raise ValueError("specialized to shingle_n=3 (see minhash_signature)")

    def shingle_rows(df: DataFrame, text_col: str, keep: list[str]) -> DataFrame:
        # STAGE the word-hash array as a real column before the rolling
        # shingle transform (same two-select shape as minhash_signature):
        # inlined, every element_at inside the roll lambda re-evaluates
        # the whole md5-per-word transform — measured ~150x slower on
        # 54-word docs (48 s -> 0.9 s at sf0.1). CollapseProject keeps the
        # stage because __wh__ is non-cheap and multiply referenced.
        words = F.split(F.col(text_col), " ")
        staged = df.select(
            *keep,
            F.transform(
                words,
                lambda w: F.conv(F.substring(F.md5(w), 1, 12), 16, 10).cast("long"),
            ).alias("__wh__"),
        )
        wh = F.col("__wh__")
        n_sh = F.size(wh) - (shingle_n - 1)
        sh = F.when(
            n_sh >= 1,
            F.transform(
                F.sequence(F.lit(1), n_sh),
                lambda i: (
                    F.element_at(wh, i.cast("int")) * 31
                    + F.element_at(wh, (i + 1).cast("int"))
                ) * 31
                + F.element_at(wh, (i + 2).cast("int")),
            ),
        ).otherwise(
            F.array(F.aggregate(wh, F.lit(0).cast("long"), lambda a, x: a * 31 + x))
        )
        return staged.select(*keep, F.explode(sh).alias("__h__"))

    bench_h = shingle_rows(benchmark, benchmark_text, []).distinct()
    corp_h = shingle_rows(
        corpus.select(F.col(corpus_id).alias("__cid__"), F.col(corpus_text)),
        corpus_text,
        ["__cid__"],
    )
    hits = corp_h.join(bench_h, "__h__", "leftsemi").select("__cid__").distinct()
    return corpus.select(F.col(corpus_id).alias("__cid__")).distinct().join(
        hits.withColumn("__hit__", F.lit(True)), "__cid__", "left"
    ).select(
        F.col("__cid__").alias(corpus_id),
        F.coalesce("__hit__", F.lit(False)).alias("contaminated"),
    )


# --------------------------------------------------------------------------
# Paragraph-level corpus dedup (CCNet-style; task brief first-class op)
# --------------------------------------------------------------------------

PARA_SPLIT_RE = r"\n{2,}"


def normalize_paragraph(c: F.Column) -> F.Column:
    """CCNet-style paragraph normalization before hashing: lowercase,
    strip everything outside [a-z0-9] to a single space, trim — so case,
    punctuation and whitespace variants of the same boilerplate hash
    identically. Engine-portable (same chain replays in ANSI SQL)."""
    return F.trim(
        F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " ")
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    split_pattern: str = PARA_SPLIT_RE,
    sep: str = "\n\n",
) -> DataFrame:
    """Corpus-wide duplicate-paragraph removal, CCNet-style: split each
    document into paragraphs, hash the normalized paragraph, keep only
    the globally FIRST occurrence of each hash (min (id, idx)), and
    re-assemble the document from its surviving paragraphs in original
    order. Returns one row per input document:
    (id, n_paras, n_dup_paras, dup_share, clean_text).

    Scale shape: whitespace-only paragraphs are filtered INSIDE the
    array before posexplode (indices are positions in the filtered
    array). First-occurrence is `groupBy(hash).agg(min(struct(id, idx)))`
    + an equi-join back on the hash — deliberately NOT
    `row_number().over(Window.partitionBy(hash))`: boilerplate
    paragraphs ("subscribe to our newsletter") occur 10^8+ times at
    corpus scale and a window would sort each hot hash on a single
    partition, while the min-struct agg collapses map-side and the
    skewed join is AQE-splittable. Final per-doc reassembly sorts the
    (idx, para) structs inside the row — no order-dependent
    collect_list. No reference counterpart (upgini has no text surface);
    sits with minhash/simhash per the task brief.
    """
    idc = F.col("__pid__")
    # NOT F.transform(..., F.trim): pyspark-4 trim has an optional 2nd
    # arg, so transform would pass (element, index) and trim by the
    # index's digit characters — the single-arg lambda pins arity
    paras = F.filter(
        F.transform(F.split(F.col(text_col), split_pattern), lambda p: F.trim(p)),
        lambda p: p != "",
    )
    exploded = (
        df.select(F.col(id_col).alias("__pid__"), paras.alias("__ps__"))
        .select(idc, F.posexplode_outer("__ps__").alias("__idx__", "__para__"))
    )
    # materialize the exploded+hashed paragraphs ONCE (eager
    # localCheckpoint): the first-occurrence agg and the join-back are
    # two consumers whose differing shapes defeat ReuseExchange, so the
    # split+trim+normalize+md5 chain (and any upstream spread shuffle)
    # otherwise executes twice (measured 2.3 → 1.8 s at a 500k-para
    # corpus); one linear write beats the second full re-execution at
    # any scale
    hashed = exploded.withColumn(
        "__h__", F.md5(normalize_paragraph(F.col("__para__")))
    ).localCheckpoint(eager=True)
    first = hashed.groupBy("__h__").agg(
        F.min(F.struct("__pid__", "__idx__")).alias("__first__")
    )
    # left join: a zero-paragraph doc has one posexplode_outer row with a
    # NULL hash, which an inner join on __h__ would silently drop
    marked = hashed.join(first, "__h__", "left").withColumn(
        "__keep__",
        (F.col("__first__.__pid__") == idc)
        & (F.col("__first__.__idx__") == F.col("__idx__")),
    )
    kept_structs = F.sort_array(
        F.collect_list(
            F.when(F.col("__keep__"), F.struct("__idx__", "__para__"))
        )
    )
    out = marked.groupBy("__pid__").agg(
        F.count("__para__").cast("int").alias("n_paras"),
        F.coalesce(
            F.sum(F.when(~F.col("__keep__"), 1)), F.lit(0)
        ).cast("int").alias("n_dup_paras"),
        F.array_join(
            F.transform(kept_structs, lambda s: s["__para__"]), sep
        ).alias("clean_text"),
    )
    return out.select(
        idc.alias(id_col),
        "n_paras",
        "n_dup_paras",
        F.when(
            F.col("n_paras") > 0,
            F.round(F.col("n_dup_paras") / F.col("n_paras"), 6),
        ).otherwise(F.lit(0.0)).alias("dup_share"),
        "clean_text",
    )


def dedup_against_index(
    new_df: DataFrame,
    index_df: DataFrame,
    content_cols: list[str],
    hash_col: str = "content_hash",
) -> tuple[DataFrame, DataFrame]:
    """INCREMENTAL dedup — the snapshot-to-snapshot shape of a continuous
    ingestion pipeline (today's crawl vs everything already accepted):
    ``index_df`` holds one md5 content hash per previously-kept row;
    returns (fresh, index_delta) where ``fresh`` is the new rows whose
    content hash is neither in the index NOR duplicated within the batch
    (keep-first by the hash's min over the batch would need an order —
    here ANY one row per new hash survives deterministically via
    min-struct on the full content tuple), and ``index_delta`` is the
    hash rows to append to the index for the next increment.

    Scale shape: one hash projection + one left ANTI join against the
    index (both sides shuffle only the 16-byte hash key — at 10^12
    indexed rows the index table should be bucketed on the hash so the
    anti join co-locates) + one keep-one agg on the batch. The index
    never stores content, only hashes."""
    h = F.md5(
        F.concat_ws(
            "\x1f", *[F.col(c).cast("string") for c in content_cols]
        )
    ).alias(hash_col)
    hashed = new_df.select(h, F.struct(*new_df.columns).alias("__row__"))
    novel = hashed.join(
        index_df.select(hash_col), on=hash_col, how="left_anti"
    )
    # one row per new hash: min-struct is a total order over the full
    # content tuple -> deterministic winner on any partitioning
    fresh = (
        novel.groupBy(hash_col)
        .agg(F.min("__row__").alias("__row__"))
        .select(F.col(hash_col), F.col("__row__.*"))
    )
    return fresh.drop(hash_col), fresh.select(hash_col)
