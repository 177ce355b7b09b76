"""Fixed-length sequence packing — the tokenize -> pack -> shard step
of an LM training-data pipeline (GPT-style "concatenate and chunk":
documents are laid out in a deterministic order as one virtual token
stream, an end-of-document sentinel optionally separating them, and the
stream is sliced into consecutive ``seq_len`` windows; Brown et al.
2020 §2.3 describe exactly this packing, with the document-boundary
spans kept so the trainer can mask cross-document attention).

Spark-first shape — the interesting problem is the GLOBAL token offset
of every document (a prefix sum over a total order), which must not
become a single-partition window:

- bucket boundaries over the order key come from ``approxQuantile`` on
  a slim (order, length) projection and become DRIVER LITERALS, so the
  bucketing is deterministic under re-evaluation — nothing needs to be
  persisted to pin it (``repartitionByRange`` would re-SAMPLE per
  evaluation, which is why it is not used here);
- per-bucket totals collect to the driver (one row per bucket —
  bounded by the bucket count, never by the corpus) and come back as
  broadcast base offsets: the classic two-pass distributed prefix sum,
  the running sum a window WITHIN each bucket, all buckets in
  parallel;
- offsets join back to the token arrays (token bytes cross the wire
  once), each document explodes into ``ceil``-bounded (chunk, slice)
  fragments in the scan stage, and ONE shuffle keyed by chunk id
  assembles the output — chunk keys are fine-grained (a chunk never
  exceeds ``seq_len`` tokens), so a giant document spreads across many
  keys instead of concentrating on one.

Everything below is built-in array functions (``sequence`` / ``slice``
/ ``flatten`` / ``array_sort`` / ``aggregate``) — zero Python in the
row path, no ``mapInPandas``.

At 10^12-document scale a single global stream is usually packed per
shard (per date bucket, per language, ...) — run this operator per
group; the global order is then the order WITHIN the group, which is
what trainers actually require (determinism, not one world-wide
stream).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["pack_sequences", "shuffle_sequences", "write_training_shards"]


def _default_buckets(spark) -> int:
    """The session's shuffle fan-out, tolerating non-numeric values
    ('auto' under AQE-managed platforms) by falling back to the
    cluster's default parallelism."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except ValueError:
        return spark.sparkContext.defaultParallelism


def pack_sequences(
    df: DataFrame,
    seq_len: int,
    tokens_col: str = "token_ids",
    order_col: str = "doc_id",
    eod_id: Optional[int] = None,
    pad_id: Optional[int] = None,
    drop_incomplete: bool = False,
    buckets: Optional[int] = None,
) -> DataFrame:
    """Pack per-document token arrays into consecutive ``seq_len``
    windows of the concatenated stream (documents ordered by
    ``order_col``, which must be a unique non-null key — numeric or
    string; offsets join back on it).  Numeric keys quantile directly
    for the prefix-sum buckets; string keys (the north-star corpus is
    ``url``-keyed) bucket via a byte-prefix surrogate — 7 UTF-8 bytes
    read as a right-padded big-endian integer, which is monotone in
    Spark's (byte-wise) string ordering, so bucket i's keys still all
    precede bucket i+1's.  The surrogate bytes are taken AFTER the
    corpus's longest common key prefix (one extra column-pruned
    min/max aggregate — the lexicographic min and max bound every key,
    so their shared prefix is shared by all keys): url keys share a
    scheme prefix (``https://www.``) that would otherwise collapse
    every surrogate to one value and the prefix sum into a single
    bucket.  Surrogate ties only affect bucket BALANCE (they land in
    the same bucket), never values: the within-bucket running sum
    orders by the exact key.

    Returns one row per window::

        seq_id     long          0-based window index
        token_ids  array<T>      the window's tokens (element type
                                 preserved from the input column)
        n_tokens   int           real tokens (pre-padding)
        n_docs     int           documents contributing >= 1 token
        doc_spans  array<struct<doc,start,n>>  per-document boundary
                                 spans inside the window, in order —
                                 what attention masking consumes

    ``eod_id`` appends a sentinel token after every document (a
    zero-token document still contributes its sentinel; with no
    sentinel it vanishes from the stream).  The final window is
    usually partial: kept as-is by default, padded to ``seq_len`` with
    ``pad_id`` if given (``n_tokens`` still reports real tokens), or
    dropped with ``drop_incomplete=True``.

    ``buckets`` sizes the prefix-sum fan-out (default: the session's
    ``spark.sql.shuffle.partitions``); it affects balance only, never
    values.

    The input plan is evaluated more than once (quantile pass over the
    order column — column-pruned, so token bytes are not read — then
    a length pass, then the token join).  If ``tokens_col`` comes from
    an EXPENSIVE upstream (e.g. an Arrow-stage BPE encode), persist
    that DataFrame before packing; for plain column reads the extra
    passes are column-pruned scans.
    """
    if seq_len <= 0:
        raise ValueError("seq_len must be positive, got %d" % seq_len)
    if pad_id is not None and drop_incomplete:
        raise ValueError("pad_id and drop_incomplete are mutually exclusive")

    elem_type = df.schema[tokens_col].dataType.elementType
    toks = F.coalesce(
        F.col(tokens_col),
        F.array().cast("array<%s>" % elem_type.simpleString()),
    )
    if eod_id is not None:
        toks = F.concat(toks, F.array(F.lit(eod_id).cast(elem_type)))

    ordered = df.select(F.col(order_col).alias("_ord"), toks.alias("_toks"))
    spark = df.sparkSession

    # --- two-pass distributed prefix sum over the slim (order, len) table
    lens = ordered.select("_ord", F.size("_toks").alias("_len"))
    n_buckets = buckets or _default_buckets(spark)
    from pyspark.sql.types import NumericType

    cuts = []
    if n_buckets > 1:
        if isinstance(df.schema[order_col].dataType, NumericType):
            qk = F.col("_ord").cast("double")
        else:
            # strip the longest common prefix shared by ALL keys (the
            # byte-wise lexicographic min/max bound every key, so their
            # common prefix is everyone's common prefix — url corpora
            # share "https://" and would otherwise all surrogate to the
            # same value, collapsing the prefix sum into one bucket),
            # then read 7 suffix bytes hex right-padded to 14 chars,
            # base-16: a left-aligned fixed-width integer IS byte-order
            # comparison of the suffixes, hence of the keys
            mm = lens.agg(
                F.min(F.col("_ord").cast("string")).alias("lo"),
                F.max(F.col("_ord").cast("string")).alias("hi"),
            ).first()
            lo = (mm["lo"] or "").encode("utf-8")
            hi = (mm["hi"] or "").encode("utf-8")
            lcp = 0
            for x, y in zip(lo, hi):
                if x != y:
                    break
                lcp += 1
            qk = F.conv(
                F.rpad(
                    F.substring(
                        F.hex(F.encode(F.col("_ord").cast("string"), "UTF-8")),
                        2 * lcp + 1,
                        14,
                    ),
                    14,
                    "0",
                ),
                16,
                10,
            ).cast("long").cast("double")
        lens = lens.withColumn("_qk", qk)
        qs = [i / n_buckets for i in range(1, n_buckets)]
        cuts = sorted(set(lens.stat.approxQuantile("_qk", qs, 0.001)))
    # bucket id = how many cut literals the surrogate exceeds —
    # deterministic under re-evaluation (the cuts are driver literals),
    # monotone in the order key, so bucket i's keys all precede bucket
    # i+1's
    pid = sum(
        (F.col("_qk") > F.lit(c)).cast("int") for c in cuts
    ) if cuts else F.lit(0)
    lens = lens.withColumn("_pid", pid).drop("_qk")
    # the length pass doubles as the order-key contract check: a duplicate
    # or NULL order key would fan out the _ord join below and corrupt
    # offsets SILENTLY (equal keys share one offset row), so the already-
    # running aggregate also counts rows vs non-null vs distinct keys and
    # fails fast.  Duplicates of a key always share a bucket (the surrogate
    # is deterministic), so per-bucket distinct counts are sufficient.
    total_rows = (
        lens.groupBy("_pid")
        .agg(
            F.sum("_len").alias("_t"),
            F.count(F.lit(1)).alias("_n"),
            F.count("_ord").alias("_nn"),
            F.countDistinct("_ord").alias("_nd"),
        )
        .collect()
    )
    bad_null = sum(r["_n"] - r["_nn"] for r in total_rows)
    if bad_null:
        raise ValueError(
            "pack_sequences: order_col %r has %d NULL key(s); the packing "
            "order must be a unique non-null key" % (order_col, bad_null)
        )
    bad_dup = sum(r["_n"] - r["_nd"] for r in total_rows)
    if bad_dup:
        raise ValueError(
            "pack_sequences: order_col %r has %d duplicate key row(s) "
            "(e.g. mix_corpora epochs re-emit the same id — derive a "
            "composite (key, source, epoch) order key first); duplicate "
            "keys would corrupt stream offsets silently" % (order_col, bad_dup)
        )
    totals = {r["_pid"]: r["_t"] for r in total_rows}
    base, bases = 0, []
    for b in sorted(totals):
        bases.append((b, base))
        base += totals[b]
    base_df = spark.createDataFrame(bases or [(0, 0)], "_pid int, _base long")
    running = (
        F.sum("_len")
        .over(
            Window.partitionBy("_pid")
            .orderBy("_ord")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        .cast("long")
    )
    offsets = lens.join(F.broadcast(base_df), "_pid").select(
        "_ord",
        "_len",
        (F.col("_base") + F.coalesce(running, F.lit(0))).alias("_off"),
    )

    # --- fragment explosion: each doc covers chunks c0..c1 of the stream
    L = F.lit(seq_len).cast("long")
    joined = ordered.join(offsets, "_ord").where(F.col("_len") > 0)
    c0 = F.floor(F.col("_off") / L)
    c1 = F.floor((F.col("_off") + F.col("_len") - 1) / L)
    frags = joined.select(
        "_ord",
        "_toks",
        "_off",
        F.explode(F.sequence(c0, c1)).alias("seq_id"),
    )
    gstart = F.greatest(F.col("_off"), F.col("seq_id") * L)
    gend = F.least(
        F.col("_off") + F.size("_toks"), (F.col("seq_id") + 1) * L
    )
    frags = frags.select(
        "seq_id",
        F.struct(
            (gstart - F.col("seq_id") * L).cast("int").alias("start"),
            F.col("_ord").alias("doc"),
            F.slice(
                "_toks",
                (gstart - F.col("_off") + 1).cast("int"),
                (gend - gstart).cast("int"),
            ).alias("toks"),
        ).alias("_frag"),
    )

    # --- ONE chunk-keyed shuffle; fragments are disjoint, sort by start
    packed = frags.groupBy("seq_id").agg(
        F.array_sort(F.collect_list("_frag")).alias("_fr")
    )
    token_ids = F.flatten(F.transform("_fr", lambda s: s["toks"]))
    doc_spans = F.transform(
        "_fr",
        lambda s: F.struct(
            s["doc"].alias("doc"),
            s["start"].alias("start"),
            F.size(s["toks"]).alias("n"),
        ),
    )
    packed = packed.select(
        "seq_id",
        token_ids.alias("token_ids"),
        F.size(token_ids).alias("n_tokens"),
        F.size("_fr").alias("n_docs"),
        doc_spans.alias("doc_spans"),
    )
    if drop_incomplete:
        packed = packed.where(F.col("n_tokens") == seq_len)
    elif pad_id is not None:
        packed = packed.withColumn(
            "token_ids",
            F.when(
                F.col("n_tokens") < seq_len,
                F.concat(
                    F.col("token_ids"),
                    F.array_repeat(
                        F.lit(pad_id).cast(elem_type),
                        F.lit(seq_len) - F.col("n_tokens"),
                    ),
                ),
            ).otherwise(F.col("token_ids")),
        )
    return packed


_SHUFFLE_HEX_PREFIX = 3  # 16^3 = 4096 fixed equal-width rank buckets


def shuffle_sequences(
    packed: DataFrame,
    salt: str = "shuffle",
    id_col: str = "seq_id",
) -> DataFrame:
    """Deterministic GLOBAL pseudo-shuffle of packed windows before
    sharding: re-key ``id_col`` to the dense 0-based rank of
    ``md5(salt:seq_id)`` over the whole table.  Trainers consume shards
    in order, and :func:`pack_sequences` emits the token stream in
    document order — adjacent windows share documents, hosts, and
    crawl-time locality, so sharding the sequential ids would feed the
    model highly correlated batches.  Shuffling the IDS (then sharding
    with the unchanged ``seq_id // N`` rule) gives every shard an
    unbiased global sample while keeping membership a pure function of
    the data — re-running the job reproduces byte-identical shards, and
    a different ``salt`` re-deals the whole permutation.

    Spark-first shape — a global rank without a global sort bottleneck:

    - the rank key is ``md5(salt:id)``; md5 is UNIFORM, so its first
      3 hex chars define 4096 fixed equal-width buckets with NO
      quantile/sampling pass (fixed-width lowercase hex compares
      lexicographically == numerically, so bucketing is monotone in
      key order and per-bucket ranks concatenate into the global
      rank);
    - per-bucket counts collect to the driver (<= 4096 rows, bounded
      regardless of corpus size) and come back as broadcast base
      offsets — the same two-pass prefix-sum shape as
      :func:`pack_sequences`;
    - the payload crosses the wire ONCE: a single Exchange on the
      bucket key, ``row_number`` within each bucket (4096 independent
      sorts, no single-partition window).

    The input is evaluated twice (the slim count pass is pruned to
    ``id_col`` only); persist upstream if the packed table is an
    expensive in-flight plan.  ``id_col`` values must be unique and
    non-null (pack_sequences ids are); ties beyond an md5 collision
    are broken by the id itself, so the permutation is total and
    deterministic either way.
    """
    spark = packed.sparkSession
    key = F.md5(
        F.concat(
            F.lit("%s:" % salt), F.col(id_col).cast("string")
        )
    )
    bucket = F.conv(
        F.substring(key, 1, _SHUFFLE_HEX_PREFIX), 16, 10
    ).cast("int")
    with_key = packed.withColumn("_sk", key).withColumn("_sb", bucket)
    counts = {
        r["_sb"]: r["_c"]
        for r in with_key.groupBy("_sb")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    }
    base, bases = 0, []
    for b in sorted(counts):
        bases.append((b, base))
        base += counts[b]
    base_df = spark.createDataFrame(bases or [(0, 0)], "_sb int, _base long")
    rn = F.row_number().over(
        Window.partitionBy("_sb").orderBy("_sk", id_col)
    )
    # LEFT join + fail-fast: the base offsets were collected from a separate
    # evaluation of the input; if any upstream nondeterminism lands a row in
    # a bucket the count pass never saw, an inner join would silently drop
    # it and leave the ranks non-dense (silent shard corruption).  A missing
    # _base now raises inside the payload pass instead.
    guarded_base = F.coalesce(
        F.col("_base"),
        F.raise_error(
            F.concat(
                F.lit(
                    "shuffle_sequences: bucket unseen by the count pass "
                    "(nondeterministic input between evaluations?): _sb="
                ),
                F.col("_sb").cast("string"),
            )
        ).cast("long"),
    )
    return (
        with_key.join(F.broadcast(base_df), "_sb", "left")
        .withColumn(id_col, (guarded_base + rn - 1).cast("long"))
        .drop("_sk", "_sb", "_base")
    )


def write_training_shards(
    packed: DataFrame,
    path: str,
    seqs_per_shard: int = 1024,
    mode: str = "error",
) -> DataFrame:
    """The shard step of tokenize -> pack -> shard: write the output of
    :func:`pack_sequences` as deterministic fixed-size training shards
    (``shard = seq_id // seqs_per_shard``) — trainers stream shards in
    order, so membership must be a pure function of ``seq_id``, never
    of task layout.

    One parquet file per shard: ``repartition("shard")`` co-locates
    each shard's rows, ``partitionBy("shard")`` splits the directory —
    a trainer reads ``shard=N/`` without touching the rest (partition
    pruning), and a resumed writer job reproduces identical shard
    membership.  Returns the manifest (shard, n_seqs, n_tokens,
    seq_min, seq_max) read back FROM the written files — it reports
    what landed on disk, not what the plan intended.
    """
    if seqs_per_shard <= 0:
        raise ValueError(
            "seqs_per_shard must be positive, got %d" % seqs_per_shard
        )
    sharded = packed.withColumn(
        "shard", F.floor(F.col("seq_id") / seqs_per_shard).cast("long")
    )
    (
        sharded.repartition("shard")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )
    # explicit schema on the read-back: an EMPTY split writes no data
    # files (just _SUCCESS) and inference would fail — and at scale the
    # known schema skips the footer-sampling job entirely
    written = packed.sparkSession.read.schema(sharded.schema).parquet(path)
    return (
        written.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("seq_id").alias("seq_min"),
            F.max("seq_id").alias("seq_max"),
        )
        .orderBy("shard")
    )
