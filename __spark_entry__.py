"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator inventory over the driver's
testdata tables; each oracle-checked entry has a matching ANSI-SQL string in
``oracle_sql()`` executed by DuckDB on the same parquet — column names and
rounding are aligned on both sides.  Kernel-backed queries (fuzzy alignment,
minhash/simhash near-dup, the flagship extraction pipeline) that are not
SQL-expressible omit the oracle (driver records rows-only checks).
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from sciencebeam_trainer_grobid_tools_spark.operators import (
    dedup,
    packing,
    similarity,
    textstats,
    webfilters,
)
from sciencebeam_trainer_grobid_tools_spark.operators.multimodal import (
    attach_fake_media,
    extract_media_features,
)
from sciencebeam_trainer_grobid_tools_spark.plans.pipeline import (
    annotate_documents,
    spans_table,
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


# DataFrame HANDLE memo (metadata only, never results): a fresh
# spark.read.parquet costs ~100 ms of driver work per call (file listing,
# footer/schema read, py4j round-trips), and the repeated-timing protocol
# re-builds every query per iteration.  Reusing the immutable DataFrame
# handle removes that driver-side constant; every action still computes
# from the parquet files.  Entries hold the session strongly so a live
# key's id can never be reused; bounded FIFO.
from collections import OrderedDict as _OrderedDict

_LOAD_CACHE: "_OrderedDict[tuple, tuple]" = _OrderedDict()
_SPREAD_CACHE: "_OrderedDict[int, tuple]" = _OrderedDict()


def _load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (id(spark), sf_dir.rstrip("/"), name)
    hit = _LOAD_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    df = spark.read.parquet("%s/%s.parquet" % (sf_dir.rstrip("/"), name))
    _LOAD_CACHE[key] = (spark, df)
    while len(_LOAD_CACHE) > 64:
        _LOAD_CACHE.popitem(last=False)
    return df


def _spread(df: DataFrame, spark: SparkSession) -> DataFrame:
    """Widen an under-partitioned scan before a compute-heavy map stage.

    The local testdata tables are single parquet files (one row group ->
    one input partition), which serializes per-row work like shingling or
    regexp extraction onto one core.  On a production corpus the table's
    file/row-group layout provides the parallelism and this is a no-op; the
    repartition only fires when the scan has fewer partitions than cores.
    The scan partition count is memoized per DataFrame handle — the
    df.rdd conversion that reads it is pure driver work repeated per
    bench iteration otherwise.
    """
    target = spark.sparkContext.defaultParallelism
    key = id(df)
    hit = _SPREAD_CACHE.get(key)
    if hit is not None and hit[0] is df:
        n = hit[1]
    else:
        n = df.rdd.getNumPartitions()
        _SPREAD_CACHE[key] = (df, n)
        while len(_SPREAD_CACHE) > 64:
            _SPREAD_CACHE.popitem(last=False)
    if n < target:
        return df.repartition(target)
    return df


def _register(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for name in names:
        _load(spark, sf_dir, name).createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# relational shell (SURVEY.md §2: S/P/J/A/O operator classes)


def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + filter pushdown + hash aggregate (A-class)."""
    _register(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_discount), 6) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        """
    )


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join + top-k with deterministic tie-break (J/O-class)."""
    customer = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    lineitem = _load(spark, sf_dir, "lineitem")
    return (
        customer.filter(F.col("c_mktsegment") == "MACHINERY")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(lineitem, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_orderdate", "revenue")
    )


def q_region_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join with broadcast dimensions (J-class; broadcast is explicit)."""
    region = F.broadcast(_load(spark, sf_dir, "region"))
    nation = F.broadcast(_load(spark, sf_dir, "nation"))
    supplier = F.broadcast(_load(spark, sf_dir, "supplier"))
    lineitem = _load(spark, sf_dir, "lineitem")
    return (
        region.filter(F.col("r_name") == "ASIA")
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supplier, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(lineitem, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
        .select(F.col("n_name").alias("nation"), "revenue", "n_lineitems")
    )


def q_resume_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resume/checkpoint primitive (reference S2/J2): left-anti join."""
    customer = _load(spark, sf_dir, "customer")
    urgent = _load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        customer.join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


def q_regex_rename_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 analogue: join via regex-derived key (utils/regex.py:17-37)."""
    customer = _load(spark, sf_dir, "customer")
    orders = _load(spark, sf_dir, "orders")
    derived = customer.select(
        F.regexp_extract(F.col("c_name"), r"([0-9]+)", 1).cast("bigint").alias("derived_key")
    )
    return (
        derived.join(orders, F.col("o_custkey") == F.col("derived_key"))
        .groupBy("derived_key")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


def q_event_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/W-class analogue: ordered change-point detection via window lag +
    running sum (sessionize events with a 30-minute gap rule)."""
    _register(spark, sf_dir, "events")
    return spark.sql(
        """
        WITH deltas AS (
            SELECT user_id, ts,
                   CASE WHEN unix_timestamp(ts) - unix_timestamp(
                            LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                        ) > 1800 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        )
        SELECT user_id,
               CAST(SUM(new_session) AS BIGINT) AS n_sessions,
               COUNT(*) AS n_events
        FROM deltas
        GROUP BY user_id
        """
    )


def q_event_majority_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 analogue: per-partition majority vote with deterministic ties."""
    _register(spark, sf_dir, "events")
    return spark.sql(
        """
        SELECT user_id, event_type AS top_event, cnt AS n_events
        FROM (
            SELECT user_id, event_type, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (
                       PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type
                   ) AS rn
            FROM events GROUP BY user_id, event_type
        ) WHERE rn = 1
        """
    )


def q_event_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling time-window aggregate (streaming-shaped, batch-executed)."""
    events = _load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )


def q_event_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two event-window aggregates in ONE labeled entry (same-family
    gate merge, freeing a 50-cap slot for `crawl_snapshot_diff`):
    `majority_vote` — per-user majority with deterministic ties (A2
    analogue); `hourly_rollup` — the tumbling time-window aggregate
    (streaming-shaped, batch-executed; its streaming twin is pytest-
    pinned in tests/test_streaming.py).  NULL-padded variant columns,
    the established merge shape."""
    mv = q_event_majority_vote(spark, sf_dir).select(
        F.lit("majority_vote").alias("variant"),
        "user_id",
        F.lit(None).cast("timestamp").alias("hour"),
        F.col("top_event").alias("event_type"),
        F.col("n_events").cast("long").alias("n"),
        F.lit(None).cast("double").alias("total_value"),
    )
    hr = q_event_hourly_rollup(spark, sf_dir).select(
        F.lit("hourly_rollup").alias("variant"),
        F.lit(None).cast("long").alias("user_id"),
        "hour",
        "event_type",
        F.col("n").cast("long").alias("n"),
        "total_value",
    )
    return mv.unionByName(hr)


def q_crawl_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-crawl snapshot delta (operators/urlnorm.snapshot_diff) with
    the new crawl DISCOVERED through sitemap extraction and enriched
    with page-declared HTML metadata — three operator families value-
    checked in one entry:

    - diff statuses: the old snapshot holds every URL except the
      doc_id%5==1 cohort, the new every URL except doc_id%5==2, and
      doc_id%5==3 changed content — added/removed/changed/same all
      appear closed-form;
    - sitemap ``<loc>`` extraction (linkgraph.sitemap_locs): the new
      crawl's URL set is NOT built directly — per-group sitemap XML
      documents (uppercase ``<LOC>``, planted padding whitespace) are
      synthesized and the membership comes out of the extractor, so a
      broken regex changes which rows exist and the hash diverges;
    - HTML metadata (htmlmeta.page_title / canonical_hint /
      og_property): every new-crawl page plants a ``<TITLE>``, a
      canonical link cycling double-/single-/unquoted href by
      doc_id%3, and an og:description; the extracted values are output
      columns the closed-form oracle pins (NULL on removed rows —
      no page was fetched).

    Plan: one groupBy building the sitemaps, explode + join back to the
    page table, ONE full-outer join on the bare URL + a presence-flag
    CASE, metadata extracted in the scan projection."""
    from sciencebeam_trainer_grobid_tools_spark.operators.htmlmeta import (
        canonical_hint,
        og_property,
        page_title,
    )
    from sciencebeam_trainer_grobid_tools_spark.operators.linkgraph import (
        sitemap_locs,
    )
    from sciencebeam_trainer_grobid_tools_spark.operators.urlnorm import (
        snapshot_diff,
    )

    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    did = F.col("doc_id")
    url = F.concat(F.lit("https://example.org/page/"), did)
    old = docs.where(did % 5 != 1).select(
        url.alias("url"), F.md5("text").alias("fingerprint")
    )
    # the new crawl's pages declare their metadata in mixed case/quoting
    canon_decl = F.concat(F.lit("https://example.org/canon/"), did)
    link = (
        F.when(
            did % 3 == 0,
            F.concat(
                F.lit('<link rel="canonical" href="'), canon_decl, F.lit('">')
            ),
        )
        .when(
            did % 3 == 1,
            F.concat(
                F.lit("<LINK REL='canonical' HREF='"), canon_decl, F.lit("'>")
            ),
        )
        .otherwise(
            F.concat(F.lit("<link rel=canonical href="), canon_decl, F.lit(">"))
        )
    )
    html = F.concat(
        F.lit("<html><head><TITLE>Doc "),
        did,
        F.lit("</TITLE>"),
        link,
        F.lit('<meta property="og:description" content="d'),
        did,
        F.lit('"></head></html>'),
    )
    # new-crawl membership is discovered FROM the synthesized sitemaps
    members = docs.where(did % 5 != 2)
    entry_xml = F.concat(
        F.lit("<url><LOC>  https://example.org/page/"), did, F.lit(" </LOC></url>")
    )
    sitemaps = members.groupBy((did % 10).alias("g")).agg(
        F.concat(
            F.lit('<?xml version="1.0"?><urlset>'),
            F.array_join(F.collect_list(entry_xml), ""),
            F.lit("</urlset>"),
        ).alias("xml")
    )
    discovered = sitemaps.select(
        F.explode(sitemap_locs(F.col("xml"))).alias("url")
    )
    pages = docs.select(
        url.alias("url"),
        F.md5(
            F.when(did % 5 == 3, F.concat(F.col("text"), F.lit("X"))).otherwise(
                F.col("text")
            )
        ).alias("fingerprint"),
        html.alias("html"),
    )
    new = discovered.join(pages, "url")
    meta = new.select(
        "url",
        page_title(F.col("html")).alias("title"),
        canonical_hint(F.col("html")).alias("canonical_decl"),
        og_property(F.col("html"), "description").alias("og_desc"),
    )
    return snapshot_diff(old, new.select("url", "fingerprint")).join(
        meta, "url", "left"
    )


def q_events_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 analogue: structured field extraction from semi-structured
    payloads (JSON props), aggregated per event type."""
    events = _load(spark, sf_dir, "events")
    k_value = F.get_json_object(F.col("props"), "$.k").cast("int")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k_value).alias("k_sum"),
        F.max(k_value).alias("k_max"),
    )


def q_levenshtein_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/F14: built-in levenshtein as the quality-check ratio."""
    customer = _load(spark, sf_dir, "customer")
    ref = "Customer#000000000"
    lev = F.levenshtein(F.col("c_name"), F.lit(ref))
    return customer.select(
        "c_custkey",
        lev.alias("lev"),
        F.round(
            1.0 - lev / F.greatest(F.length("c_name"), F.lit(len(ref))), 6
        ).alias("lev_ratio"),
    )


# ---------------------------------------------------------------------------
# documents: text analysis + dedup


def q_docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    fp = F.md5(F.lower(F.replace(F.col("text"), F.lit("\n"), F.lit(" ")))).alias("fingerprint")
    return (
        docs.select("doc_id", fp)
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.min("doc_id").alias("keep_id"))
    )


def q_docs_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both fingerprint-family shapes in ONE labeled gate entry (merged to
    keep the 50-entry gate all-oracle): ``per_doc`` — the 16-char content
    fingerprint per document; ``groups`` — the exact-dedup groupBy over
    the full fingerprint (n_docs, keep = lowest id).  Same normalization
    (lowercase, newline -> space) in both; each variant value-checks
    independently under the label."""
    per_doc = q_docs_fingerprint(spark, sf_dir).select(
        F.lit("per_doc").alias("variant"),
        "doc_id",
        "fingerprint",
        F.lit(None).cast("long").alias("n_docs"),
        F.lit(None).cast("long").alias("keep_id"),
    )
    groups = q_docs_exact_dedup(spark, sf_dir).select(
        F.lit("groups").alias("variant"),
        F.lit(None).cast("long").alias("doc_id"),
        "fingerprint",
        F.col("n_docs").cast("long"),
        F.col("keep_id").cast("long"),
    )
    # third variant since round 8: winnowing fingerprint sets (rolling-
    # hash family — same fingerprint-family merge, freeing the former
    # docs_winnowing slot for urls_bloom_membership); hash rendered as
    # string to share the fingerprint column
    winnow = q_docs_winnowing(spark, sf_dir).select(
        F.lit("winnowing").alias("variant"),
        "doc_id",
        F.col("fingerprint").cast("string").alias("fingerprint"),
        F.lit(None).cast("long").alias("n_docs"),
        F.lit(None).cast("long").alias("keep_id"),
    )
    return (
        per_doc.unionByName(groups)
        .unionByName(winnow)
        .orderBy("variant", "doc_id", "fingerprint")
    )


def q_docs_remove_common_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate LINE-level dedup (CCNet/RefinedWeb granularity,
    dedup.remove_common_lines): a footer line is planted onto every
    ``doc_id % 5 == 0`` document (cross-doc boilerplate), and the corpus's
    natural exact-duplicate documents share EVERY line — both classes must
    be stripped while unique lines keep their order.  The oracle replays
    the whole construction (distinct-doc counts per exact line, drop at
    df >= 2, ordered reassembly, emptied docs kept as empty strings)."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.col("text"), F.lit("\ncopyright example press all rights reserved")),
        ).otherwise(F.col("text")).alias("text"),
    )
    out = dedup.remove_common_lines(planted, min_docs=2)
    return out.select(
        "doc_id",
        "n_lines_before",
        "n_lines_removed",
        F.md5("clean_text").alias("clean_md5"),
    ).orderBy("doc_id")


def q_docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents").select("doc_id", "text")
    return textstats.quality_features(docs).drop("text")


def q_docs_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    return docs.select(
        "doc_id",
        textstats.whitespace_token_count(F.col("text")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\w+"), 0)).alias("word_tokens"),
        F.length("text").alias("n_chars_computed"),
    )


def q_docs_text_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID, token/char counts AND the encoding-damage signals in
    ONE gate entry (merged to free a 50-entry-gate slot for the
    web-filter suite): a single per-row codegen projection — no join, no
    shuffle — emitting the n-gram-heuristic language guess, the
    whitespace/word-regex token counts (the former docs_lang_id +
    docs_token_counts entries; docs_token_counts stays a bench headline
    via demo_queries) and ``textstats.cleanliness_columns`` over a
    PLANTED-damage variant of the text (every doc_id % 5 == 0 gains a
    U+FFFD, a C0 control char, accented letters, digits and uppercase —
    the clean corpus would otherwise never exercise the ratios; token
    counts stay on the raw text)."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    damaged = F.when(
        F.col("doc_id") % 5 == 0,
        F.concat(
            F.col("text"), F.lit(" �"), F.lit("\x01"),
            F.lit("Ünïcødé 42 UPPER"),
        ),
    ).otherwise(F.col("text"))
    clean_cols = textstats.cleanliness_columns(damaged)
    tri_scores = textstats.trigram_lang_scores(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        textstats.lang_id(F.col("text")).alias("lang_guess"),
        textstats.whitespace_token_count(F.col("text")).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"\w+"), 0)).alias(
            "word_tokens"
        ),
        F.length("text").alias("n_chars_computed"),
        *(expr.alias(name) for name, expr in clean_cols.items()),
        # round-8 trigram-profile language ID (Cavnar-Trenkle shape):
        # pure-codegen weighted profile scores + deterministic argmax,
        # replicated term-for-term by the generated DuckDB fragment
        textstats.trigram_lang_id(F.col("text")).alias("lang_trigram"),
        *(
            F.round(tri_scores[lang], 6).alias("tri_" + lang)
            for lang in sorted(tri_scores)
        ),
    )


def q_docs_web_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three web-corpus heuristic-filter families in ONE wide gate
    entry, joined per document: Gopher quality rules (Rae et al. 2021 —
    word/word-length bands, symbol/bullet/ellipsis ratios, alpha-word
    ratio, required stopwords), the C4 cleaning pass (Raffel et al. 2020
    — terminal-punctuation line filter, sentence minimum, brace and
    lorem-ipsum page rules; cleaned text value-checked by md5), and
    fastText-shaped hashed linear classifier inference (Joulin et al.
    2016) in the oracle-portable derived-weight configuration.  Composed
    via ``web_filter_features``: Gopher and C4 are per-row, so they share
    ONE projection over one scan; the classifier — the only aggregating
    family — is the plan's single join (LEFT: a zero-token document has
    no classifier row)."""
    # Sort the NARROW input instead of the wide output: a trailing orderBy
    # would range-partition the projected rows, and range partitioning
    # SAMPLES its child — executing the whole expensive projection twice
    # (guide §2.4/§7.2; measured 1.83s vs 0.84s at sf1.0).  Range-sorting
    # (doc_id, text) first yields the identical global doc_id order (unique
    # key, range partitions concatenate in order) with the projection run
    # once, and doubles as the under-partitioned-scan spread.
    docs = (
        _load(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .repartitionByRange(spark.sparkContext.defaultParallelism, "doc_id")
        .sortWithinPartitions("doc_id")
    )
    return (
        webfilters.web_filter_features(docs)
        .withColumn("c4_clean_md5", F.md5("clean_text"))
        .drop("clean_text")
    )


def q_docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", textstats.normalized_fingerprint(F.col("text")).alias("fingerprint")
    )


def q_docs_minhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidates (kernel hash not SQL-portable: rows-only).

    ``persist_intermediate=False``: the signature table feeds its three
    consumers through ONE shuffle that Spark de-duplicates via
    ReusedExchange, so an explicit cache only adds memory-serialization
    cost here (measured 2.53s vs 1.73s noop at sf1.0) — and a per-invocation
    persist in a repeatedly-run query leaks cached blocks (the gate variant
    already runs uncached for the same reason).  A multi-stage production
    pipeline materializes the signature table to storage instead
    (documented on minhash_candidate_pairs)."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    return dedup.minhash_candidate_pairs(
        docs, k=5, num_hashes=32, bands=8, persist_intermediate=False
    )


def q_docs_minhash_xxhash_crosscheck(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-family check of the PRODUCTION xxhash64 minhash path: at the
    HEADLINE query's exact parameters (k=5, num_hashes=32, bands=8), the
    xxhash64-banding pair set restricted to true near-dups (exact Jaccard
    >= 0.95) must equal the portable md5-banding pair set under the same
    restriction — DuckDB computes the portable side, so the equality is
    value-checked.

    Validity note: the two hash families draw banding collisions
    INDEPENDENTLY, so an exact-equality gate is only sound where BOTH
    families' banding recall is effectively 1.  At r=4,b=8 the per-pair
    miss probability (1-j^4)^8 is ~8.6e-4 at j=0.875 — across the seeded
    pairs (25 at sf0.01, scaling with sf) a gate at 0.8 has a ~4% chance
    per regenerated sf0.01 corpus (tens of percent at larger sf) of one
    spurious set difference, even though the current corpus happens to be
    green.  At the j >= 0.95 gate used here the per-pair miss probability
    is ~1.4e-6 per family (expected misses < 1e-4 at sf0.01, < 0.1 even at
    ~10^4 retained pairs), so equality holds for any plausible regeneration
    while still exercising 24 of the 25 seeded near-dup pairs at sf0.01."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    pairs = dedup.minhash_candidate_pairs(
        docs, k=5, num_hashes=32, bands=8, persist_intermediate=False
    )
    return pairs.filter(F.col("jaccard") >= 0.95)


def q_docs_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three MinHash verification shapes in ONE labeled gate entry
    (merged to keep the 50-entry gate all-oracle): ``portable`` — the
    full md5-family MinHash+LSH pipeline (8 hashes, 4 bands), every value
    DuckDB-reproducible; ``xxhash_crosscheck`` — the PRODUCTION xxhash64
    path at the headline parameters (32 hashes, 8 bands) restricted to
    exact-Jaccard >= 0.95, where per-family banding miss probability
    (~1.4e-6) makes the cross-family pair-set equality sound (full
    validity analysis on q_docs_minhash_xxhash_crosscheck); ``clusters``
    — connected components over the portable pair set (large-star/
    small-star, Kiveris et al. 2014), the transitive pairs -> clusters ->
    representative step a keep-one dedup needs, labels re-derived by the
    oracle's recursive closure (doc_id_b carries the cluster id, jaccard
    is NULL).  Each variant value-checks independently under the label."""
    a = q_docs_minhash_portable(spark, sf_dir).select(
        F.lit("portable").alias("variant"), "doc_id_a", "doc_id_b", "jaccard"
    )
    b = q_docs_minhash_xxhash_crosscheck(spark, sf_dir).select(
        F.lit("xxhash_crosscheck").alias("variant"), "doc_id_a", "doc_id_b", "jaccard"
    )
    c = dedup.duplicate_clusters(q_docs_minhash_portable(spark, sf_dir)).select(
        F.lit("clusters").alias("variant"),
        F.col("doc_id").alias("doc_id_a"),
        F.col("cluster_id").alias("doc_id_b"),
        F.lit(None).cast("double").alias("jaccard"),
    )
    return (
        a.unionByName(b).unionByName(c)
        .orderBy("variant", "doc_id_a", "doc_id_b")
    )


def q_emb_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (Jegou et al. 2011) end-to-end: train the
    per-subspace codebooks (iters=0 -> the 8 lowest-id vectors' subvectors,
    the SQL-replicable configuration; Lloyd iterations are differential-
    pytest-verified), encode every vector to its m=8 subspace codes
    (codegen argmin, lowest code on ties), and rank by ADC — the exact
    query against the m x 8 driver-side lookup table, one codegen fold
    over the code column.  The returned distances value-check the
    codebooks, the encoding AND the table walk in one oracle."""
    embeddings = _load(spark, sf_dir, "embeddings")
    books = similarity.pq_train(embeddings, m=8, n_codes=8, iters=0, dim=64)
    encoded = similarity.pq_encode(embeddings, books, method="expr")
    return similarity.pq_adc_topk(
        encoded, _query_vector(spark, sf_dir), books, k=10, round_digits=4
    )


def q_docs_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures, oracle-portable form: per-token md5 top-bits,
    bitwise majority vote, '0'/'1' bit-string output (DuckDB-reproducible).
    Same one-shuffle aggregation shape as the production 64-bit
    xxhash64 variant (dedup.simhash_table)."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    return dedup.portable_simhash_table(docs)


def q_docs_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full MinHash+LSH banding pipeline with an oracle-portable hash
    family (md5 minima, md5 band keys): signatures -> band buckets ->
    candidate pairs -> exact-Jaccard verification, every value reproducible
    in DuckDB.  Verifies the banding LOGIC the production xxhash64 path
    (docs_minhash_near_dups) shares."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    # persist_intermediate=False: the gate runs every query repeatedly in one
    # session; an unreleased cache per invocation would accumulate blocks.
    return dedup.portable_minhash_pairs(
        docs, k=5, num_hashes=8, bands=4, persist_intermediate=False
    )


def q_docs_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition signals (Gopher-style quality rule):
    per-doc bigram occurrence totals, top-ngram fraction and
    duplicate-ngram fraction — codegen'd explode+hash construction, two
    partial-aggregated shuffles, nothing wider than (id, hash, count)
    shuffled.  Output fractions are hash-identity-independent, so the
    oracle groups by the gram string."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    return dedup.repetition_features(docs, k=2).orderBy("doc_id")


def q_docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination (GPT-3 appendix-C 13-gram rule).  The
    'eval set' is a deterministic PROMPT slice — the first 20 tokens of
    every doc_id % 83 == 1 document — so a flagged training document is
    one whose body CONTAINS an eval prompt's 13-gram (partial overlap,
    the realistic contamination shape), not merely an exact duplicate.
    Eval k-gram set broadcasts; the corpus side explodes inside codegen
    and only collision rows reach a shuffle."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    prompt = F.concat_ws(
        " ",
        F.slice(F.split(F.lower(F.replace(F.col("text"), F.lit("\n"), F.lit(" "))), " "), 1, 20),
    )
    eval_df = docs.filter(F.col("doc_id") % 83 == 1).select(
        "doc_id", prompt.alias("text")
    )
    return dedup.ngram_contamination(docs, eval_df, k=13).orderBy("doc_id")


def q_docs_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality score (CCNet-style filter shape): per-doc mean
    -ln p(token) under the corpus's own smoothed unigram model — the
    corpus-level statistic (one vocab shuffle + a 1-row N/V collect)
    re-joined per token, then a per-doc mean."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    # persist_vocab=False: the gate runs every query repeatedly in one
    # session; an unreleased cache per invocation would accumulate blocks
    return textstats.unigram_logprob_features(
        docs, persist_vocab=False
    ).orderBy("doc_id")


def q_docs_remove_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup (Lee et al. 2022 ExactSubstr rule, re-expressed
    shard-local — see dedup.remove_repeated_spans): a shared 9-token
    boilerplate sentence is planted onto every ``doc_id % 4 == 0`` document
    (each preceded by a different last word, so the duplicated run is
    exactly the boilerplate), and the corpus's natural exact-duplicate
    documents duplicate EVERY k-gram — both classes must be stripped.  The
    oracle replays the construction relationally and verifies the cleaned
    text md5 per document."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    boiler = " subscribe to our newsletter for updates and offers today"
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 4 == 0, F.concat(F.col("text"), F.lit(boiler))
        ).otherwise(F.col("text")).alias("text"),
    )
    cleaned = dedup.remove_repeated_spans(planted, k=8)
    return cleaned.select(
        "doc_id",
        "n_tokens_before",
        "n_tokens_removed",
        F.md5("clean_text").alias("clean_md5"),
    ).orderBy("doc_id")


def q_docs_rewrite_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two REWRITE-granularity dedup families in ONE labeled entry
    (same-family gate merge, freeing a 50-cap slot for `robots_policy`):
    `common_lines` — boilerplate line-level dedup (CCNet/RefinedWeb
    granularity); `repeated_spans` — exact-substring dedup (Lee et al.
    2022 ExactSubstr).  Each variant's construction, plan and DuckDB
    replay are unchanged from the standalone entries (see the two
    wrapped builders); units_before/units_removed are lines for the
    line variant, tokens for the span variant."""
    lines = q_docs_remove_common_lines(spark, sf_dir).select(
        F.lit("common_lines").alias("variant"),
        "doc_id",
        F.col("n_lines_before").alias("units_before"),
        F.col("n_lines_removed").alias("units_removed"),
        "clean_md5",
    )
    spans = q_docs_remove_repeated_spans(spark, sf_dir).select(
        F.lit("repeated_spans").alias("variant"),
        "doc_id",
        F.col("n_tokens_before").alias("units_before"),
        F.col("n_tokens_removed").alias("units_removed"),
        "clean_md5",
    )
    return lines.unionByName(spans)


def q_robots_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt crawl policy end to end (operators/robots.py),
    value-checked both halves: each of the 40 synthetic hosts publishes
    a robots.txt with a megabot-only group (must be IGNORED for ua=*),
    three prefix rules parameterized by the host index, and two RFC
    9309 §2.2.3 PATTERN rules (``/wild*card`` and the anchored
    ``/*.pdf$``); `rule` variant rows are the honest parser's output
    (DuckDB rebuilds the expected rules closed-form — group selection
    and pattern passthrough are therefore value-pinned), and `decision`
    variant rows run the RFC 9309 longest-pattern/allow-tie fold over
    one synthetic URL per document (eight path cases cycling by doc_id,
    including wildcard hits, a ``$``-anchored block and the
    ``$``-must-not-match counter-case; DuckDB knows which cases block).
    The URL side is never shuffled or exploded — rules broadcast as one
    array row per host and a codegen aggregate picks the winner."""
    from sciencebeam_trainer_grobid_tools_spark.operators import robots

    docs = _spread(_load(spark, sf_dir, "documents").select("doc_id"), spark)
    k = (F.col("doc_id") % 40).cast("string")
    host = F.concat(F.lit("h"), k, F.lit(".com"))
    hosts = docs.select(host.alias("host"), k.alias("k")).distinct()
    rtxt = F.concat(
        F.lit("# corpus policy\nUser-agent: megabot\nDisallow: /secret/\n\n"
              "User-agent: *\nDisallow: /d"),
        F.col("k"),
        F.lit("/\nAllow: /d"),
        F.col("k"),
        F.lit("/pub/\nDisallow: /q\nDisallow: /wild*card\n"
              "Disallow: /*.pdf$\n"),
    )
    rules = robots.parse_robots(hosts.select("host", rtxt.alias("robots_txt")))
    m = F.col("doc_id") % 8
    path = (
        F.when(m == 0, F.concat(F.lit("/d"), k, F.lit("/x")))
        .when(m == 1, F.concat(F.lit("/d"), k, F.lit("/pub/x")))
        .when(m == 2, F.lit("/q?y=1"))
        .when(m == 3, F.lit("/open"))
        .when(m == 4, F.lit(""))
        .when(m == 5, F.lit("/wildAAAcard"))
        .when(m == 6, F.lit("/file.pdf"))
        .otherwise(F.lit("/file.pdfx"))
    )
    # adversarial: the m==6 case ships an UPPERCASE scheme — RFC says
    # scheme is case-insensitive, so /file.pdf must still be blocked by
    # /*.pdf$ (a lowercase-only scheme parser fails open here)
    scheme = F.when(m == 6, F.lit("HTTPS://")).otherwise(F.lit("https://"))
    urls = docs.select(
        "doc_id", F.concat(scheme, host, path).alias("url")
    )
    decisions = robots.robots_blocked(urls, rules)
    rule_rows = rules.select(
        F.lit("rule").alias("variant"),
        "host",
        "seq",
        "allow",
        "prefix",
        F.lit(None).cast("long").alias("doc_id"),
        F.lit(None).cast("string").alias("url"),
        F.lit(None).cast("boolean").alias("blocked"),
    )
    decision_rows = decisions.select(
        F.lit("decision").alias("variant"),
        F.concat(
            F.lit("h"), (F.col("doc_id") % 40).cast("string"), F.lit(".com")
        ).alias("host"),
        F.lit(None).cast("int").alias("seq"),
        F.lit(None).cast("boolean").alias("allow"),
        F.lit(None).cast("string").alias("prefix"),
        "doc_id",
        "url",
        F.col("robots_blocked").alias("blocked"),
    )
    return rule_rows.unionByName(decision_rows)


def q_docs_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All four corpus-LM quality scores in ONE labeled gate entry
    (merged to keep the 50-entry gate all-oracle): ``unigram`` —
    CCNet-filter shape, per-doc mean -ln p(tok); ``bigram`` — the n=2
    generalization proof (context-keyed counts, model derived from the
    count table); ``kn`` — the same bigram counts under interpolated
    Kneser-Ney smoothing (D=0.75, the KenLM/CCNet smoothing family;
    continuation counts and the type total are row-counts over the
    count table); ``kn_heldout`` — the model trained on the even half,
    scoring the odd half through the OOV-capable backoff layer.  Each
    variant's scores value-check independently under the label;
    ``n_units`` is tokens for unigram rows, bigrams otherwise."""
    a = q_docs_unigram_logprob(spark, sf_dir).select(
        F.lit("unigram").alias("variant"),
        "doc_id",
        F.col("n_tokens").alias("n_units"),
        F.col("avg_neg_logprob").alias("score"),
    )
    b = q_docs_bigram_logprob(spark, sf_dir).select(
        F.lit("bigram").alias("variant"),
        "doc_id",
        F.col("n_bigrams").alias("n_units"),
        F.col("avg_neg_logprob2").alias("score"),
    )
    c = q_docs_bigram_kn_logprob(spark, sf_dir).select(
        F.lit("kn").alias("variant"),
        "doc_id",
        F.col("n_bigrams").alias("n_units"),
        F.col("avg_neg_logprob2").alias("score"),
    )
    d = q_docs_bigram_kn_heldout(spark, sf_dir).select(
        F.lit("kn_heldout").alias("variant"),
        "doc_id",
        F.col("n_bigrams").alias("n_units"),
        F.col("avg_neg_logprob2").alias("score"),
    )
    return (
        a.unionByName(b).unionByName(c).unionByName(d)
        .orderBy("variant", "doc_id")
    )


def q_docs_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023): target corpus = the French
    documents, raw = everything; importance weights under two smoothed
    bag-of-words models over the UNION vocabulary, Gumbel-max resampling
    with the deterministic md5-uniform draw on (0, 1).  Selection must
    concentrate on target-like documents; the oracle replays models,
    weights, noise and the top-k."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    target = docs.filter(F.col("lang") == "fr")
    selected = textstats.dsir_select(
        docs, target, n_select=100, persist_vocab=False
    )
    return (
        selected.join(docs.select("doc_id", "lang"), "doc_id")
        .select("doc_id", "lang", "n_tokens", "dsir_logweight")
        .orderBy("doc_id")
    )


def q_docs_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED curation pipeline (plans/curation.py) — domain
    blocklist -> canonical-URL recrawl dedup -> C4 cleaning -> PII scrub
    -> quality filter -> Gopher rules -> repetition filter -> hashed
    classifier -> per-lang token-budget sample, as ONE lazy plan; every
    stage is individually oracle-verified elsewhere, this query proves
    they fuse.  The blocklist plants ``example5.com``: the host cycle is
    example{pair % 7}.com (www/case variants), so every pair with
    pair % 7 == 5 dies at the first stage, subdomain-matched through the
    www prefix.

    Deterministic construction: documents pair up as recrawls of the same
    page (pair key doc_id div 2) — the even member carries a case-variant
    host, a utm_ tracking param and a trailing slash; the odd member a
    gclid param and the newer warc_ts (= doc_id), so canonicalization must
    merge each pair and keep='latest' must keep the odd member.  Pairs
    with pair % 11 == 4 are AMP plants: their even member lives on a
    DIFFERENT URL entirely (amp.example{h}.com/item/{pair}/amp — URL
    normalization alone can NOT fold it) but declares the pair's
    canonical via a mixed-case, single-quoted, tracking-param-laden
    ``<LINK REL=canonical HREF='...'>``, so the pair folds ONLY through
    dedup_key='canonical_hint' (the oracle's closed form assumes every
    pair folds — a broken hint extraction leaves the AMP even alive and
    hash-mismatches).  PII
    (email/IP/phone derived from doc_id) is planted into every text, so
    the scrub's placeholder suffix is part of the verified md5.  A
    trailing '.' makes the (single-line) page pass the C4 line rule with
    >= 3 sentence characters from the planted dotted suffix; docs with
    doc_id % 17 == 3 get a planted ' {' (C4 page-rule casualties — the
    corpus is brace-free, verified per-SF).  robots.txt compliance runs
    right after the blocklist from parse_robots output: the example3
    hosts disallow /item/1 with an Allow: /item/15 exception (longest-
    match prefix semantics — both pair members' paths share the /item/
    {pair} prefix, so affected pairs vanish entirely), and the example6
    hosts carry the WILDCARD rule 'Disallow: /item/*?*gclid=' which
    matches only the odd members' query strings — their even partners
    then survive the dedup stage alone, flipping the pair-survivor
    parity for the whole pair % 7 == 6 cohort.  Gopher runs with
    min_stopword_hits=1 / min_words=20 because the synthetic corpus
    carries only 'the' from the stopword list (real thresholds would
    blank it); the classifier threshold 0.5 splits on the md5-derived
    pseudo-weights the webfilters oracle pins.

    ``variant='training_prep'`` rows value-check the COMPOSED
    training-prep plan (plans/training_prep.py) over the SAME planted
    corpus: curate -> host_split (0.8/0.2, md5 host draw) -> BPE
    vocabulary from the TRAIN split (n_merges=0, the character
    tokenizer — its token counts have a closed SQL form: per word,
    len+1 subwords, plus the <eod> sentinel packing appends) ->
    bpe_encode per split -> URL-ORDERED pack_sequences (seq_len=64,
    the string-order-key path with the LCP-stripped surrogate — every
    planted url shares the 'http://' prefix).  One output row per
    (split, doc), aggregated FROM the packed windows' doc_spans:
    first/last window id, window count, token total, and the doc's
    start offset inside its first window — so the oracle's independent
    prefix-sum over the curated+split corpus pins every document's
    exact placement in the packed stream (a wrong offset, a missing
    window, a split leak, or a broken span all hash-mismatch)."""
    from sciencebeam_trainer_grobid_tools_spark.operators.robots import (
        parse_robots,
    )
    from sciencebeam_trainer_grobid_tools_spark.plans.curation import curate_corpus
    from sciencebeam_trainer_grobid_tools_spark.plans.training_prep import (
        prepare_training_data,
    )

    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    robots3 = (
        "User-agent: evilbot\nDisallow: /\n\n"
        "User-agent: *\nDisallow: /item/1\nAllow: /item/15\n"
    )
    robots6 = "User-agent: *\nDisallow: /item/*?*gclid=\n"
    robots_rules = parse_robots(
        spark.createDataFrame(
            [
                ("www.example3.com", robots3),
                ("amp.example3.com", robots3),
                ("www.example6.com", robots6),
                ("amp.example6.com", robots6),
            ],
            "host string, robots_txt string",
        )
    )
    pair = F.expr("doc_id div 2")
    host_idx = (pair % 7).cast("string")
    even = F.col("doc_id") % 2 == 0
    amp_even = even & (pair % 11 == 4)
    url = F.when(
        amp_even,
        F.concat(
            F.lit("http://amp.example"), host_idx, F.lit(".com/item/"),
            pair.cast("string"), F.lit("/amp"),
        ),
    ).when(
        even,
        F.concat(
            F.lit("http://WWW.Example"), host_idx, F.lit(".COM/item/"),
            pair.cast("string"), F.lit("/?utm_source=feed&ref=rss"),
        ),
    ).otherwise(
        F.concat(
            F.lit("http://www.example"), host_idx, F.lit(".com/item/"),
            pair.cast("string"), F.lit("?ref=rss&gclid=abc"),
        )
    )
    # the AMP page DECLARES its canonical — uppercase tag, unquoted REL,
    # single-quoted HREF, case-variant host, utm param and trailing slash
    # all at once, so the fold exercises canonical_hint's hardened
    # extraction AND canonical_url over the declared value
    html = F.when(
        amp_even,
        F.concat(
            F.lit("<html><head><LINK REL=canonical HREF='http://WWW.example"),
            host_idx, F.lit(".com/item/"), pair.cast("string"),
            F.lit("/?utm_campaign=amp&ref=rss'></head></html>"),
        ),
    ).otherwise(F.lit(""))
    base_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com via 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".77 or 555-123-4567."),
    )
    planted = docs.select(
        "doc_id",
        "lang",
        url.alias("url"),
        html.alias("html"),
        F.col("doc_id").alias("warc_ts"),
        F.when(
            F.col("doc_id") % 17 == 3, F.concat(base_text, F.lit(" {"))
        ).otherwise(base_text).alias("text"),
    )
    stage_kwargs = dict(
        url_col="url",
        dedup_key="canonical_hint",
        html_col="html",
        ts_col="warc_ts",
        strata=("lang",),
        budget_tokens=1500,
        max_dup_ngram_frac=0.09,
        rep_k=2,
        sample_mode="rate",
        blocked_domains=["example5.com"],
        robots_rules=robots_rules,
        c4={},
        gopher={"min_words": 20, "min_stopword_hits": 1},
        clf_threshold=0.5,
    )
    # curate ONCE and feed the pre-curated table into the training-prep
    # plan (curation=None): the ten-stage fused curation expression tree
    # is large, and letting prepare_training_data re-derive it per split
    # per packing pass compounds the final plan into tens of MB of
    # expression text — enough to break whole-stage codegen's 64 KB
    # method limit and exhaust a default-sized (1 GiB) driver heap.
    # prepare_training_data cuts lineage at its split table
    # (localCheckpoint), so every prep branch below reads one
    # materialized leaf instead.
    # persist_intermediate=True: cache the scrubbed intermediate so the
    # statistics branches (repetition, sampling) and the training-prep
    # legs read ONE materialized table — without it, predicate pushdown
    # duplicates the full text-rewrite chain into every branch (a 1.4 MB
    # optimized plan, thousands of regexp copies, 64 KB codegen fallback;
    # 44 s -> 14 s measured at sf0.1).  Within-invocation cache only; the
    # blocks are reclaimed by the ContextCleaner when the DataFrames drop
    # (same contract as the prep tables below).
    curated = curate_corpus(planted, persist_intermediate=True, **stage_kwargs)
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")
    # the composed training-prep plan over the same curated corpus; the
    # gate leaves the split + per-split encoded tables persisted
    # (sf-0.01-sized; the ContextCleaner reclaims them when the
    # DataFrames drop)
    prep = prepare_training_data(
        curated,
        seq_len=64,
        curation=None,
        splits=[("train", 0.8), ("val", 0.2)],
        n_merges=0,
    )
    # The 'curated' variant reads the CHECKPOINTED curated table
    # (prep.curated is host_split over the same rows — the split column is
    # simply not selected) instead of re-embedding the ten-stage fused
    # curation tree: the raw tree fused into the final union+sort stage
    # blew whole-stage codegen past Janino's 64 KB method limit
    # ("Code grows beyond 64 KB" on sort_addToSorter, five failed compiles
    # per run, interpreted fallback) AND re-executed the whole curation a
    # second time per collect.  Values are identical; the rows now come
    # from the one materialized leaf every other branch reads.
    curated_rows = prep.curated.select(
        F.lit("curated").alias("variant"),
        "doc_id",
        "lang",
        textstats.whitespace_token_count(F.col("text")).alias("n_tokens"),
        F.md5("text").alias("curated_md5"),
        null_s.alias("split"),
        null_s.alias("url"),
        null_l.alias("first_seq"),
        null_l.alias("last_seq"),
        null_l.alias("n_windows"),
        null_l.alias("n_toks"),
        null_l.alias("start_in_first"),
    )
    prep_rows = None
    for name in ("train", "val"):
        spans = prep.packed[name].select(
            "seq_id", F.explode("doc_spans").alias("sp")
        )
        agg = spans.groupBy(F.col("sp.doc").alias("url")).agg(
            F.min("seq_id").alias("first_seq"),
            F.max("seq_id").alias("last_seq"),
            F.count(F.lit(1)).alias("n_windows"),
            F.sum("sp.n").cast("long").alias("n_toks"),
            F.sum("sp.start").cast("long").alias("start_in_first"),
        ).select(
            F.lit("training_prep").alias("variant"),
            null_l.alias("doc_id"),
            null_s.alias("lang"),
            F.lit(None).cast("int").alias("n_tokens"),
            null_s.alias("curated_md5"),
            F.lit(name).alias("split"),
            "url",
            "first_seq",
            "last_seq",
            "n_windows",
            "n_toks",
            "start_in_first",
        )
        prep_rows = agg if prep_rows is None else prep_rows.unionByName(agg)
    return curated_rows.unionByName(prep_rows).orderBy(
        "variant", "doc_id", "split", "url"
    )


def q_docs_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram corpus-LM quality score — the n=2 instantiation of the
    CCNet-filter shape (proving unigram_logprob_features' claim that the
    plumbing generalizes in n): context-keyed count table, model derived
    from the count table (no second corpus scan), (w1, w2)-keyed score
    join, per-doc mean."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    # persist_counts=False: same repeated-query-harness rationale as
    # q_docs_unigram_logprob
    return textstats.bigram_logprob_features(
        docs, persist_counts=False
    ).orderBy("doc_id")


def q_docs_bigram_kn_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram scores (D=0.75) — the KenLM/CCNet
    smoothing family over the SAME count-table derivation as the additive
    bigram model: every KN statistic (continuation counts, type total) is
    a row-count over the bigram count table, no extra corpus scan."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    return textstats.bigram_logprob_features(
        docs, persist_counts=False, smoothing_mode="kn"
    ).orderBy("doc_id")


def q_docs_bigram_kn_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HELD-OUT Kneser-Ney scoring — the real CCNet/KenLM filter shape:
    the bigram model trains on the EVEN-doc_id half of the corpus and
    scores the ODD half, so unseen bigrams, unseen contexts and OOV
    continuations all exercise the backoff layer (additively-smoothed
    continuation distribution with one reserved OOV type; unseen
    contexts back off fully to it).  The oracle recomputes the split,
    the count-table model, and every LEFT-join branch."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    train = docs.filter(F.col("doc_id") % 2 == 0)
    held = docs.filter(F.col("doc_id") % 2 == 1)
    return textstats.bigram_logprob_features(
        train, persist_counts=False, smoothing_mode="kn", score_df=held
    ).orderBy("doc_id")


def q_docs_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint sets (rolling-hash family, MOSS/Schleimer):
    Rabin-Karp polynomial per 5-gram, sliding-window-of-4 minima, distinct
    — the containment/plagiarism detector complementing MinHash
    resemblance.  Every arithmetic step replays exactly in DuckDB (31-bit
    prime modulus keeps products under 2^63 on both engines)."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    return dedup.winnowing_fingerprints(docs, k=5, window=4).orderBy(
        "doc_id", "fingerprint"
    )


def q_urls_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom seen-set (operators/bloom.py), value-checked with
    its false positives INCLUDED: the filter builds over the even-doc_id
    half of a synthetic URL universe (one partial-aggregated shuffle of
    at most m/32 word rows; driver-side artifact like the IVF
    centroids), then every URL probes it through the pure-codegen
    k-bit-test conjunction — no join, no shuffle, no Python on the probe
    side.  DuckDB rebuilds the identical bitset (same md5-derived
    positions, same 32-bit words under bit_or) and evaluates the same
    bit tests, so seen URLs hash-match as True (the exact-negative
    guarantee), and the deterministic false positives among the odd half
    match too."""
    from sciencebeam_trainer_grobid_tools_spark.operators import bloom

    docs = _load(spark, sf_dir, "documents").select("doc_id")
    url = F.concat(F.lit("https://example.org/page/"), F.col("doc_id"))
    seen = docs.where(F.col("doc_id") % 2 == 0).select(url.alias("url"))
    words = bloom.bloom_build(seen, col="url", m_bits=4096, k=3)
    probes = _spread(docs, spark).select("doc_id", url.alias("url"))
    return probes.select(
        "doc_id",
        bloom.bloom_contains(words, F.col("url"), 4096, 3).alias("in_bloom"),
    )


def q_docs_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sampling, BOTH modes in one gate entry (labeled by a
    ``mode`` column so each kept row set is value-checked separately):

    - ``rate`` (the SCALE mode): per-lang keep-rate = budget /
      stratum-total via a deterministic md5-uniform draw per id — no
      window, no per-stratum sort;
    - ``exact`` (small strata only — documented single-task sort per
      stratum): md5-ordered window cumsum, keep while cum <= budget.

    The ``pack`` variant rides the same token-domain entry: GPT-style
    concat-and-chunk sequence packing (operators/packing.py — the
    distributed prefix sum + chunk-keyed assembly) over a closed-form
    tokenization both engines share (``\\w+`` word tokens, id = token
    length, eod sentinel 999, seq_len 512).  Each packed window is
    pinned by scalar summaries — n_tokens, n_docs, first/last doc,
    token-id sum, first/last token — so boundary slicing, fragment
    ordering AND the eod insertion are all value-checked; DuckDB
    replays the pack closed-form with list functions over the same
    window cumsum.

    The ``shuffle`` variant pins :func:`packing.shuffle_sequences` —
    the deterministic global pre-shard shuffle (window re-keyed to its
    ``md5(salt:seq_id)`` rank): every packed window's summary row is
    re-emitted under its SHUFFLED id, so the oracle's independent
    ``row_number() OVER (ORDER BY md5...)`` replay hash-mismatches if
    any window lands at the wrong rank, the permutation is not dense,
    or a payload is disturbed in transit.

    The ``mix`` variant pins :func:`textstats.mix_corpora` — the
    multi-source mixture with epoch upsampling (en weight 1 vs fr
    weight 3 at a 40k-token budget: en subsamples at e<1 while fr
    REPEATS for ~8 epochs).  One row per (source, doc, epoch); the
    oracle replays the per-source epoch arithmetic and the exact
    md5 membership of each fractional epoch, so a wrong epoch count,
    a duplicated/missing repetition, or a drifted draw all
    hash-mismatch."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)

    nulls = [
        F.lit(None).cast("int").alias("n_tokens"),
        F.lit(None).cast("int").alias("n_docs"),
        F.lit(None).cast("long").alias("first_doc"),
        F.lit(None).cast("long").alias("last_doc"),
        F.lit(None).cast("long").alias("tok_sum"),
        F.lit(None).cast("int").alias("first_token"),
        F.lit(None).cast("int").alias("last_token"),
    ]

    def kept(mode: str) -> DataFrame:
        return (
            textstats.token_budget_sample(docs, 2000, strata=("lang",), mode=mode)
            .select(F.lit(mode).alias("mode"), "doc_id", "lang", *nulls)
        )

    tok_ids = F.transform(
        F.coalesce(
            F.regexp_extract_all(F.col("text"), F.lit(r"\w+"), 0),
            F.array().cast("array<string>"),
        ),
        lambda t: F.length(t).cast("int"),
    )
    packed = packing.pack_sequences(
        docs.select("doc_id", tok_ids.alias("token_ids")),
        seq_len=512,
        eod_id=999,
    )
    def window_rows(df: DataFrame, mode: str) -> DataFrame:
        return df.select(
            F.lit(mode).alias("mode"),
            F.col("seq_id").alias("doc_id"),
            F.lit(None).cast("string").alias("lang"),
            "n_tokens",
            "n_docs",
            F.element_at("doc_spans", 1)["doc"].alias("first_doc"),
            F.element_at("doc_spans", -1)["doc"].alias("last_doc"),
            F.aggregate(
                "token_ids",
                F.lit(0).cast("long"),
                lambda acc, t: acc + t,
            ).alias("tok_sum"),
            F.element_at("token_ids", 1).alias("first_token"),
            F.element_at("token_ids", -1).alias("last_token"),
        )

    pack = window_rows(packed, "pack")
    shuffled = window_rows(
        packing.shuffle_sequences(packed, salt="gate"), "shuffle"
    )
    mixed = textstats.mix_corpora(
        {
            "en": docs.filter(F.col("lang") == "en"),
            "fr": docs.filter(F.col("lang") == "fr"),
        },
        {"en": 1.0, "fr": 3.0},
        40000,
        salt="gate",
    ).select(
        F.lit("mix").alias("mode"),
        "doc_id",
        F.col("source").alias("lang"),
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("epoch").cast("int").alias("n_docs"),
        F.lit(None).cast("long").alias("first_doc"),
        F.lit(None).cast("long").alias("last_doc"),
        F.lit(None).cast("long").alias("tok_sum"),
        F.lit(None).cast("int").alias("first_token"),
        F.lit(None).cast("int").alias("last_token"),
    )
    return (
        kept("rate")
        .unionByName(kept("exact"))
        .unionByName(pack)
        .unionByName(shuffled)
        .unionByName(mixed)
        .orderBy("mode", "doc_id")
    )


def q_docs_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detect + scrub (training-data hygiene): deterministic PII
    (email, IPv4, phone derived from doc_id) is planted into every
    document, then detected and redacted by the RE2-compatible Catalyst
    regexps — the oracle runs the SAME pattern strings under DuckDB's
    RE2 and must reproduce the counts and the scrubbed text md5
    value-for-value."""
    from sciencebeam_trainer_grobid_tools_spark.operators import pii

    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com via 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".77 or 555-123-4567"),
        ).alias("text"),
    )
    return (
        pii.pii_features(planted)
        .select(
            "doc_id",
            "pii_emails",
            "pii_ipv4",
            "pii_phones",
            "pii_found",
            F.md5("scrubbed_text").alias("scrubbed_md5"),
        )
        .orderBy("doc_id")
    )


def q_docs_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact bigram-shingle Jaccard pairs over a bounded id range (the
    correctness baseline the LSH path verifies against)."""
    docs = _load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    return dedup.ngram_jaccard_pairs(docs, k=2, min_jaccard=0.05).select(
        "doc_id_a", "doc_id_b", "jaccard"
    )


# ---------------------------------------------------------------------------
# embeddings: similarity search


_QUERY_VEC_CACHE: "_OrderedDict[tuple, tuple]" = _OrderedDict()


def _query_vector(spark: SparkSession, sf_dir: str):
    """The ANN queries' search PARAMETER (the needle): embedding #0.

    Memoized per (session, sf_dir) — this is part of the query definition
    (each ANN entry means "top-k closest to vector 0"), not a query result;
    it is still read from parquet once per session, and re-fetching it ran
    a full scan+filter Spark job inside every timed construction."""
    key = (id(spark), sf_dir.rstrip("/"))
    hit = _QUERY_VEC_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    row = (
        _load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .collect()[0]
    )
    vec = [float(v) for v in row["embedding"]]
    _QUERY_VEC_CACHE[key] = (spark, vec)
    while len(_QUERY_VEC_CACHE) > 16:
        _QUERY_VEC_CACHE.popitem(last=False)
    return vec


def q_emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    embeddings = _load(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(
        embeddings, _query_vector(spark, sf_dir), k=10, round_digits=4
    )


def q_emb_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed ANN — oracle-checked: hyperplanes are deterministic
    (seed 42), so DuckDB recomputes the exact bucket assignments, the
    hamming<=1 probe set, and the candidate re-rank; the gate verifies the
    bucketing machinery itself, not a recall proxy."""
    embeddings = _load(spark, sf_dir, "embeddings")
    return similarity.lsh_topk(
        embeddings, _query_vector(spark, sf_dir), k=10, round_digits=4
    )


def q_emb_lsh_prebucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-bucket LSH ANN: the ingest stage stores ``lsh_bucket``
    (add_lsh_bucket), the query filters ONLY the stored column (probe set
    computed driver-side) and re-ranks — the serving-scale pattern where the
    filter becomes partition pruning on a bucket-partitioned layout.  The
    oracle recomputes bucket assignments, probe set, and re-rank, so the
    returned bucket values check the materialization itself."""
    embeddings = _load(spark, sf_dir, "embeddings")
    prebucketed = similarity.add_lsh_bucket(embeddings)
    return similarity.lsh_topk_prebucketed(
        prebucketed, _query_vector(spark, sf_dir), k=10, round_digits=4
    )


def q_emb_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both LSH ANN serving shapes in ONE labeled gate entry (merged from
    the former emb_lsh_topk / emb_lsh_prebucketed entries to keep the
    50-entry gate all-oracle): ``adhoc`` computes buckets at query time;
    ``prebucketed`` reads the ingest-materialized ``lsh_bucket`` column
    (the serving-scale pattern where the probe filter becomes partition
    pruning — plan asserted in pytest).  Each variant's top-k
    value-checks independently under the variant column; the
    prebucketed rows also check the stored bucket values."""
    embeddings = _load(spark, sf_dir, "embeddings")
    adhoc = similarity.lsh_topk(
        embeddings, _query_vector(spark, sf_dir), k=10, round_digits=4
    ).select(
        F.lit("adhoc").alias("variant"),
        "vec_id",
        F.lit(None).cast("long").alias("lsh_bucket"),
        "cosine",
    )
    pre = similarity.lsh_topk_prebucketed(
        similarity.add_lsh_bucket(embeddings),
        _query_vector(spark, sf_dir),
        k=10,
        round_digits=4,
    ).select(F.lit("prebucketed").alias("variant"), "vec_id", "lsh_bucket", "cosine")
    return adhoc.unionByName(pre).orderBy("variant", "vec_id")


def q_emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN end-to-end: deterministic coarse quantizer (iters=0 -> the 8
    lowest-id vectors, the SQL-replicable configuration; Lloyd training is
    pytest-verified against numpy), JVM-side cell assignment
    (similarity.ivf_assign — no shuffle, no python), driver-side nprobe=2
    cell selection, exact cosine re-rank of the probed cells only.  The
    returned cell column value-checks the assignment itself."""
    embeddings = _load(spark, sf_dir, "embeddings")
    centroids = similarity.ivf_train(embeddings, n_cells=8, iters=0)
    assigned = similarity.ivf_assign(embeddings, centroids)
    return similarity.ivf_topk(
        assigned, _query_vector(spark, sf_dir), centroids,
        k=10, nprobe=2, round_digits=4,
    )


def q_emb_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFPQ (the composed FAISS-style index) end-to-end in the
    SQL-replicable iters=0 configuration: coarse quantizer = the 8
    lowest-id vectors, max-cosine cell assignment, PQ codebooks = the 8
    lowest-id vectors' subvectors, every vector's RESIDUAL against its
    own cell centroid encoded to m=8 codes, then nprobe=2 L2 cell probe
    and per-cell residual ADC.  The returned distances value-check the
    assignment, the residual subtraction, the encoding AND the per-cell
    LUT dispatch in one oracle; Lloyd-trained models are pinned by the
    numpy differential pytest."""
    embeddings = _load(spark, sf_dir, "embeddings")
    centroids = similarity.ivf_train(embeddings, n_cells=8, iters=0)
    assigned = similarity.ivf_assign(embeddings, centroids)
    books = similarity.pq_train(embeddings, m=8, n_codes=8, iters=0, dim=64)
    encoded = similarity.pq_residual_encode(assigned, centroids, books)
    return similarity.ivf_pq_topk(
        encoded, _query_vector(spark, sf_dir), centroids, books,
        k=10, nprobe=2, round_digits=4,
    )


def q_emb_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three quantized-ANN searches in ONE labeled gate entry (merged
    to keep the 50-entry gate all-oracle): ``ivf`` — coarse-cell probe +
    exact cosine re-rank (cell column value-checks the assignment);
    ``pq`` — whole-corpus ADC over PQ codes; ``ivfpq`` — the composed
    index, per-probed-cell residual ADC.  Each variant's values check
    independently under the label; ``cell`` is the probed IVF cell for
    ivf rows and NULL for the code-only rankings."""
    a = q_emb_ivf_topk(spark, sf_dir).select(
        F.lit("ivf").alias("variant"),
        "vec_id",
        F.col("ivf_cell").cast("int").alias("cell"),
        F.col("cosine").alias("score"),
    )
    b = q_emb_pq_adc_topk(spark, sf_dir).select(
        F.lit("pq").alias("variant"),
        "vec_id",
        F.lit(None).cast("int").alias("cell"),
        F.col("adc_dist").alias("score"),
    )
    c = q_emb_ivfpq_topk(spark, sf_dir).select(
        F.lit("ivfpq").alias("variant"),
        "vec_id",
        F.lit(None).cast("int").alias("cell"),
        F.col("adc_dist").alias("score"),
    )
    return a.unionByName(b).unionByName(c).orderBy("variant", "vec_id")


def q_emb_ivf_train_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One FULL Lloyd iteration of the IVF coarse quantizer, value-checked:
    deterministic seed (8 lowest-id vectors), max-cosine assignment
    (lowest-cell tie-break) and the per-cell elementwise mean — the
    `ivf_train` reduce itself, previously pinned only by numpy-parity
    pytest.  The assignment + reduce run IN SPARK (one projection + one
    groupBy shuffle; the k x dim collect is the documented model artifact);
    the artifact is returned exploded to scalar ``(cell, dim, value)`` rows
    so the oracle hash covers every element."""
    embeddings = _load(spark, sf_dir, "embeddings")
    centroids = similarity.ivf_train(embeddings, n_cells=8, iters=1)
    rows = [
        (cell, i, float(v))
        for cell, vec in enumerate(centroids)
        for i, v in enumerate(vec)
    ]
    return (
        spark.createDataFrame(rows, "cell int, dim int, value double")
        .withColumn("value", F.round("value", 6))
        .orderBy("cell", "dim")
    )


def q_emb_centroid_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid-family entries merged into ONE labeled entry (same-family
    gate merge, freeing a 50-cap slot for `hosts_pagerank`).

    `label_stats` variant: per-label counts, first-coordinate mean and
    mean norm (one partial-aggregated shuffle).  `centroid_topk`
    variant: each vector's cosine to its LABEL CENTROID, top-5 per label
    (similarity.pairwise_topk_by_label — one centroid shuffle with
    map-side partials, broadcast join back, window top-k).  Columns the
    other variant lacks are NULL-padded, the established merge shape."""
    embeddings = _load(spark, sf_dir, "embeddings")
    stats = embeddings.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg(F.col("embedding")[0]), 4).alias("c0"),
        F.round(F.avg(similarity.embedding_norm(F.col("embedding"))), 4).alias("avg_norm"),
    ).select(
        F.lit("label_stats").alias("variant"),
        "label",
        F.lit(None).cast("long").alias("vec_id"),
        "n_vectors",
        "c0",
        "avg_norm",
        F.lit(None).cast("double").alias("cosine"),
    )
    topk = similarity.pairwise_topk_by_label(
        embeddings, k=5, round_digits=4
    ).select(
        F.lit("centroid_topk").alias("variant"),
        "label",
        "vec_id",
        F.lit(None).cast("long").alias("n_vectors"),
        F.lit(None).cast("double").alias("c0"),
        F.lit(None).cast("double").alias("avg_norm"),
        "cosine",
    )
    return stats.unionByName(topk)


def q_hosts_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The host link-graph family end to end (operators/linkgraph.py):
    each document becomes a synthetic page — url on host
    ``h{doc_id % 40}.com``, html with two anchors pointing at hosts
    ``h{(3*doc_id+1) % 40}.com`` and ``h{(7*doc_id+2) % 40}.com`` (the
    second with a fragment, exercising the strip) — then
    ``extract_outlinks`` -> ``host_edges`` (explode in the scan stage,
    ONE distinct shuffle of bare host pairs) -> 3 damped PageRank
    iterations over the 40-host graph in the fully-lazy configuration.
    The markup is ADVERSARIAL by doc_id % 3: style 0 is canonical
    lowercase double-quoted, style 1 uppercase tags with single-quoted
    attributes and an uppercase ``REL='NOFOLLOW'`` on the first anchor
    (which must still count — host_edges follows all links), style 2
    unquoted attribute values; every style must extract the SAME two
    edges, which is what the closed-form DuckDB edge list pins.  Ranks
    compare at ROUND(., 6).  The ``anchors`` variant aggregates the same
    pages' anchor TEXT per destination host (anchor_text_table with its
    default skip_nofollow=True), so the style-1 uppercase
    REL='NOFOLLOW' now has a visible effect — its 'a' anchors drop from
    the counts — pinning inner-text extraction AND the nofollow filter
    against the closed form.  The ``split`` variant runs
    urlfilter.host_split over the same pages: per-host page counts under
    the leakage-safe train/val assignment, the md5-uniform draw replayed
    verbatim by DuckDB (exact membership, not just proportions)."""
    from sciencebeam_trainer_grobid_tools_spark.operators import linkgraph

    docs = _spread(_load(spark, sf_dir, "documents").select("doc_id"), spark)

    def host(expr):
        return F.concat(F.lit("h"), expr.cast("string"), F.lit(".com"))

    h1 = host((F.col("doc_id") * 3 + 1) % 40)
    h2 = host((F.col("doc_id") * 7 + 2) % 40)
    style = F.col("doc_id") % 3
    html = (
        F.when(
            style == 0,
            F.concat(
                F.lit('<html><a href="https://'), h1,
                F.lit('/x">a</a> <a href="https://'), h2,
                # the mailto anchor must NOT ride the relative-link
                # fallback into the page's own anchor-text counts
                F.lit('/y#frag">b</a> <a href="mailto:c@'), h1,
                F.lit('">contact</a></html>'),
            ),
        )
        .when(
            style == 1,
            F.concat(
                F.lit("<HTML><A HREF='https://"), h1,
                F.lit("/x' REL='NOFOLLOW'>a</A> <A HREF='https://"), h2,
                F.lit("/y#frag'>b</A></HTML>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("<html><a href=https://"), h1,
                F.lit("/x>a</a> <a href=https://"), h2,
                # the RELATIVE link must still attribute to the page's
                # own host — on-site nav text is anchor-text signal
                F.lit("/y#frag>b</a> <a href=/local>nav</a></html>"),
            )
        )
    )
    pages = docs.select(
        F.col("doc_id"),
        F.concat(
            F.lit("https://"), host(F.col("doc_id") % 40), F.lit("/p/"),
            F.col("doc_id"),
        ).alias("url"),
        html.alias("html"),
    )
    edges = linkgraph.host_edges(pages)
    std = linkgraph.pagerank(edges, iters=3, persist_each=False).select(
        F.lit("standard").alias("variant"),
        "host",
        F.round("rank", 6).alias("rank"),
        F.lit(None).cast("string").alias("label"),
        F.lit(None).cast("long").alias("n"),
    )
    # `redistribute` variant: pages on hosts h30..h39 emit no outlinks
    # (their docs are filtered out of the edge-source set), so those
    # hosts become DANGLING receivers and the published dangling-mass
    # redistribution (Page et al. 1999) actually changes the numbers —
    # DuckDB unrolls the same three redistributed iterations
    edges_d = linkgraph.host_edges(pages.filter(F.col("doc_id") % 40 < 30))
    red = linkgraph.pagerank(
        edges_d, iters=3, persist_each=False, dangling="redistribute"
    ).select(
        F.lit("redistribute").alias("variant"),
        "host",
        F.round("rank", 6).alias("rank"),
        F.lit(None).cast("string").alias("label"),
        F.lit(None).cast("long").alias("n"),
    )
    # `anchors` variant: the aggregated anchor-text corpus over the SAME
    # adversarial pages — skip_nofollow=True drops style-1 'a' anchors
    # (uppercase REL='NOFOLLOW'), so the per-style counts pin both the
    # inner-text extraction and the nofollow filter closed-form
    anchors = linkgraph.anchor_text_table(pages).select(
        F.lit("anchors").alias("variant"),
        F.col("dst_host").alias("host"),
        F.lit(None).cast("double").alias("rank"),
        F.col("anchor_text").alias("label"),
        "n",
    )
    # `split` variant: leakage-safe host-level train/val assignment
    # (urlfilter.host_split) over the SAME pages — every host's page
    # count lands under exactly one split label, and the md5-uniform
    # draw is replayed verbatim by DuckDB, pinning both co-location and
    # the exact membership closed-form
    from sciencebeam_trainer_grobid_tools_spark.operators import urlfilter

    split_rows = (
        urlfilter.host_split(pages, [("train", 0.8), ("val", 0.2)])
        .groupBy(
            urlfilter.url_host(F.col("url")).alias("host"),
            F.col("split").alias("label"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.lit("split").alias("variant"),
            "host",
            F.lit(None).cast("double").alias("rank"),
            "label",
            "n",
        )
    )
    return (
        std.unionByName(red).unionByName(anchors).unionByName(split_rows)
    )


def q_align_exact_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fuzzy-alignment kernel located an exact needle: for each document,
    the needle is text[100:140]; the kernel's span must equal the first
    occurrence (DuckDB strpos).  Runs the real Smith-Waterman + masking +
    windowing path inside mapInPandas."""
    import pandas as pd
    from sciencebeam_trainer_grobid_tools_spark.kernel.fuzzy import fuzzy_search

    # _spread: the single-row-group local table would otherwise feed the
    # WHOLE per-document kernel to one scan task / one Python worker
    # (measured: the map stage ran 1-way while 31 cores idled)
    docs = _spread(
        _load(spark, sf_dir, "documents").filter(F.col("n_chars") >= 200).select(
            "doc_id", "text"
        ),
        spark,
    )

    def align_batches(batches):
        for pdf in batches:
            # columnar accumulation (lists -> one DataFrame) instead of a
            # per-row dict list: the per-row pandas overhead was measurable
            # next to the fuzzy kernel call itself (guide §4.2)
            starts = []
            ends = []
            needles = []
            for text in pdf["text"].tolist():
                needle = text[100:140]
                fm = fuzzy_search(text, needle, threshold=1.0)
                if fm is None:
                    start, end = -1, -1
                else:
                    start, end = fm.a_index_range()
                starts.append(start)
                ends.append(end)
                needles.append(needle)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "span_start": pd.Series(starts, dtype="int32"),
                    "span_end": pd.Series(ends, dtype="int32"),
                    "needle": needles,
                }
            )

    return docs.mapInPandas(
        align_batches, schema="doc_id long, span_start int, span_end int, needle string"
    )


# ---------------------------------------------------------------------------
# flagship: full extraction + alignment pipeline


_CORPUS_CACHE: "_OrderedDict[tuple, tuple]" = _OrderedDict()


def _documents_as_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap the driver's documents table into the Common-Crawl-style input
    shape (url, warc_ts, html, text, lang, target_xml): html adds boilerplate
    chrome around the text; the target title is the first 8 words.

    The HANDLE is memoized per (session, sf_dir) exactly like ``_load`` —
    this is the synthesized input corpus six flagship-family queries share,
    and rebuilding its expression tree cost ~0.05 s of py4j driver time per
    query construction.  No data or results are cached; every action still
    computes from the parquet scan.

    The salted spread happens HERE, on the narrow (url, text, lang) rows,
    BEFORE the html/target blobs are synthesized — the single-threaded
    single-row-group scan then only builds and shuffle-writes ~15 MB of
    text instead of ~100 MB of built html, and the blob construction runs
    on all cores after the exchange (guide §8: move light rows, build heavy
    bytes after the shuffle).  Same key (xxhash64(url)) and partition count
    as annotate_documents' own spread, so row placement is unchanged —
    callers skip the second repartition."""
    key = (id(spark), sf_dir.rstrip("/"))
    hit = _CORPUS_CACHE.get(key)
    if hit is not None and hit[0] is spark:
        return hit[1]
    docs = _load(spark, sf_dir, "documents").select(
        F.concat(F.lit("doc://"), F.col("doc_id").cast("string")).alias("url"),
        F.col("text"),
        F.col("lang"),
    ).repartition(spark.sparkContext.defaultParallelism, F.xxhash64("url"))
    title = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
    html = F.concat(
        F.lit(
            "<html><head><title>ignored</title><script>var x=1;</script></head>"
            "<body><nav>Home | About</nav><div id='content'><p>"
        ),
        F.replace(F.col("text"), F.lit("\n"), F.lit("</p><p>")),
        F.lit("</p></div><footer>Copyright</footer></body></html>"),
    )
    target_xml = F.concat(
        F.lit(
            "<article><front><article-meta><title-group><article-title>"
        ),
        title,
        F.lit("</article-title></title-group></article-meta></front></article>"),
    )
    corpus = docs.select(
        "url",
        F.encode(html, "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
        target_xml.alias("target_xml"),
    )
    _CORPUS_CACHE[key] = (spark, corpus)
    while len(_CORPUS_CACHE) > 16:
        _CORPUS_CACHE.popitem(last=False)
    return corpus


def q_flagship_extract_align(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end: html parse -> tokenize -> target extraction -> fuzzy align
    -> BIO spans + checks.  Value-checked: on the deterministic corpus the
    summary columns (n_lines, n_tokens, n_spans, alignment_hits, passed) have
    a closed form DuckDB recomputes from documents.text; span OFFSETS and
    byte-identity of the extracted text are value-checked by the
    flagship_title_spans twin + pytest."""
    corpus = _documents_as_corpus(spark, sf_dir)
    annotated = annotate_documents(corpus)
    return annotated.select(
        "url",
        "n_lines",
        "n_tokens",
        F.size("spans").alias("n_spans"),
        "alignment_hits",
        "passed",
    )


def q_flagship_title_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pipeline, title spans only — oracle-checked end-to-end: the
    synthesized target title is the first 8 words of the text, the document
    renders it at offset 0, so the emitted span must be exactly
    [0, len(first 8 words)) with the title text."""
    corpus = _documents_as_corpus(spark, sf_dir)
    annotated = annotate_documents(corpus)
    flat = spans_table(annotated)
    return (
        flat.filter(F.col("field") == "title")
        .select(
            F.expr("CAST(substring(url, 7) AS BIGINT)").alias("doc_id"),
            F.col("start").alias("span_start"),
            F.col("end").alias("span_end"),
            F.col("text").alias("span_text"),
        )
    )


def q_docs_layout_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-number detection (A4) + page-header frequency detection (A3)
    oracle-checked end-to-end in ONE labeled entry over ONE corpus scan
    (same-family gate merge, freeing a 50-cap slot for `warc_records`).

    `line_numbers` variant: each document is laid out as 20 five-word
    lines where line i carries a sequential margin number unless
    ``(doc_id + i) % 7 == 0`` (deterministic positional gaps, different
    per document); the detector must tag exactly the numbered
    first-tokens.  `page_headers` variant: the document is laid out as
    ``3 + doc_id % 3`` pages, every page opening with the same repeated
    running-head line; the segmentation annotator's repeated-untagged-line
    detector must tag exactly that many headnote lines.  DuckDB
    recomputes both closed forms per document."""
    import pandas as pd

    from sciencebeam_trainer_grobid_tools_spark.kernel.doc import tokenize_lines
    from sciencebeam_trainer_grobid_tools_spark.operators.annotate import strip_tag_prefix
    from sciencebeam_trainer_grobid_tools_spark.operators.line_numbers import (
        annotate_line_numbers,
    )
    from sciencebeam_trainer_grobid_tools_spark.plans.flavors import segmentation_flavor

    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    chain = segmentation_flavor()

    def batches(it):
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                words = (row.text.split() + ["w"] * 100)[:100]
                lines = []
                number = 0
                for i in range(1, 21):
                    chunk = " ".join(words[(i - 1) * 5 : i * 5])
                    if (row.doc_id + i) % 7 == 0:
                        # un-numbered line; 'x' guard keeps the first token
                        # non-numeric regardless of the text content
                        lines.append("x %s" % chunk)
                    else:
                        number += 1
                        lines.append("%d %s" % (number, chunk))
                doc = tokenize_lines(lines)
                annotate_line_numbers(doc)
                detected = sum(
                    1
                    for t in doc.iter_tokens()
                    if strip_tag_prefix(t.tag) == "line_no"
                )
                rows.append(
                    {"doc_id": row.doc_id, "signal": "line_numbers", "value": detected}
                )

                n_pages = 3 + row.doc_id % 3
                header = "Journal of Mice volume %d" % (row.doc_id % 10)
                page_lines = []
                w = 0
                for _ in range(n_pages):
                    page_lines.append(header)
                    for _ in range(3):  # 3 body lines per page, each unique
                        page_lines.append(
                            "x%d %s" % (w, " ".join(words[w : w + 4]))
                        )
                        w += 4
                doc = tokenize_lines(page_lines)
                chain(doc, [])
                headnotes = sum(
                    1
                    for line in doc.lines
                    if line and strip_tag_prefix(line[0].tag) == "headnote"
                )
                rows.append(
                    {"doc_id": row.doc_id, "signal": "page_headers", "value": headnotes}
                )
            yield pd.DataFrame(rows, columns=["doc_id", "signal", "value"])

    return docs.select("doc_id", "text").mapInPandas(
        batches, "doc_id long, signal string, value int"
    )


def q_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC (ISO 28500) build + parse round-trip, value-checked end to
    end (sources/warc.py — the Common-Crawl on-disk format seam of the
    north-star input table): each document becomes TWO WARC/1.0 records
    (a `response` carrying text, a `metadata` carrying lang) via the
    pure-Catalyst builder, the concatenated blob is parsed back by the
    pure-Catalyst Content-Length-checked parser, and every recovered
    header and the payload md5 must match the closed form DuckDB
    rebuilds directly from the table.  Content-Length is BYTES
    (multi-byte text lengths differ from char counts — `strlen` on the
    DuckDB side, `octet_length` on the Spark side, both re-derived
    independently of the parsed header).  Zero Python, zero shuffles:
    build, parse and explode are all per-row projections in the scan
    stage.  The byte-exact `parse_warc_stream` twin (arbitrary payloads,
    embedded-marker adversary) is differential-pytest-pinned against
    this parser on well-formed blobs in tests/test_warc.py."""
    from sciencebeam_trainer_grobid_tools_spark.sources import warc

    docs = _spread(
        _load(spark, sf_dir, "documents").select("doc_id", "text", "lang"), spark
    )
    uri = F.concat(F.lit("https://example.org/doc/"), F.col("doc_id"))
    date = F.concat(
        F.lit("2026-08-17T12:"),
        F.lpad((F.col("doc_id") % 60).cast("string"), 2, "0"),
        F.lit(":00Z"),
    )
    blob = F.concat(
        warc.warc_record_expr(uri, date, F.col("text")),
        warc.warc_record_expr(uri, date, F.col("lang"), warc_type="metadata"),
    )
    parsed = docs.select(
        "doc_id",
        F.posexplode(warc.parse_warc_records_expr(blob)).alias("rec_index", "rec"),
    )
    return parsed.select(
        "doc_id",
        "rec_index",
        F.col("rec.warc_type").alias("warc_type"),
        F.col("rec.target_uri").alias("target_uri"),
        F.col("rec.warc_date").alias("warc_date"),
        F.col("rec.content_length").alias("content_length"),
        F.md5(F.col("rec.payload")).alias("payload_md5"),
        F.col("rec.length_ok").alias("length_ok"),
    )


def q_docs_segmentation_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmentation FSM (W7-W9) oracle-checked on a deterministic layout:
    line 1 is the target title (matched -> front), followed by
    ``8 + doc_id % 5`` unique body lines; the matcher -> majority vote ->
    merge FSM -> body-default chain must tag exactly one front line and all
    remaining lines body — DuckDB recomputes both counts per document.
    (flagship_segmentation stays rows-only over the real HTML corpus where
    line structure varies; this twin pins the FSM's values.)"""
    import pandas as pd

    from sciencebeam_trainer_grobid_tools_spark.kernel.doc import tokenize_lines
    from sciencebeam_trainer_grobid_tools_spark.operators.annotate import strip_tag_prefix
    from sciencebeam_trainer_grobid_tools_spark.operators.targets import (
        parse_xml_mapping_string,
        xml_string_to_target_annotations,
    )
    from sciencebeam_trainer_grobid_tools_spark.plans.flavors import segmentation_flavor
    from sciencebeam_trainer_grobid_tools_spark.sources.corpus import DEFAULT_XML_MAPPING

    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    mapping = parse_xml_mapping_string(DEFAULT_XML_MAPPING)
    chain = segmentation_flavor()

    def batches(it):
        for pdf in it:
            rows = []
            for row in pdf.itertuples(index=False):
                words = row.text.split() + ["w"] * 80
                title = " ".join(words[:8])
                n_body = 8 + row.doc_id % 5
                lines = [title]
                w = 8
                for i in range(n_body):
                    lines.append("x%d %s" % (i, " ".join(words[w : w + 5])))
                    w += 5
                target_xml = (
                    "<article><front><article-meta><title-group><article-title>"
                    + title
                    + "</article-title></title-group></article-meta></front></article>"
                )
                doc = tokenize_lines(lines)
                targets = xml_string_to_target_annotations(target_xml, mapping)
                chain(doc, targets)
                counts = {}
                for line in doc.lines:
                    seg = strip_tag_prefix(line[0].tag) or "untagged"
                    counts[seg] = counts.get(seg, 0) + 1
                rows.append(
                    {
                        "doc_id": row.doc_id,
                        "front_lines": counts.get("front", 0),
                        "body_lines": counts.get("body", 0),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "front_lines", "body_lines"])

    return docs.select("doc_id", "text").mapInPandas(
        batches, "doc_id long, front_lines int, body_lines int"
    )


def q_flagship_title_spans_complex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same end-to-end contract as flagship_title_spans but through the
    COMPLEX matcher (the reference's legacy MatchingAnnotator: fuzzy scoring
    + choice scan + bonding) — oracle-checks that matcher's full path, not
    just its unit tests: on the synthetic corpus both matchers must place
    the title at exactly [0, len(first 8 words))."""
    corpus = _documents_as_corpus(spark, sf_dir)
    annotated = annotate_documents(corpus, matcher="complex")
    flat = spans_table(annotated)
    return (
        flat.filter(F.col("field") == "title")
        .select(
            F.expr("CAST(substring(url, 7) AS BIGINT)").alias("doc_id"),
            F.col("start").alias("span_start"),
            F.col("end").alias("span_end"),
            F.col("text").alias("span_text"),
        )
    )


def q_flagship_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segmentation flavor over the corpus: matcher -> per-line majority vote
    -> merge FSM -> body default; emits per-url segment-class line counts.

    Value-checked (rows-only until r7): on the deterministic corpus the
    chain has a closed form DuckDB recomputes — extracted lines equal
    newline-split text; the matcher tags the title (first 8 words, at line-1
    offset 0); the per-line vote makes line 1 front iff the 8 tagged tokens
    are a (tie-winning: Counter.most_common insertion order, and the tagged
    tokens come first) majority of its tokens, i.e. ``2*min(8, l1) >= l1``;
    every other line defaults to body; no reference targets exist.  The
    corpus guarantees the title never wraps (min first-line tokens is 10 at
    every shipped SF) — the ``min(8, l1)`` keeps the form honest below 8."""
    import pandas as pd
    from sciencebeam_trainer_grobid_tools_spark.kernel.doc import tokenize_lines
    from sciencebeam_trainer_grobid_tools_spark.operators.extract import html_to_lines
    from sciencebeam_trainer_grobid_tools_spark.operators.annotate import strip_tag_prefix
    from sciencebeam_trainer_grobid_tools_spark.operators.targets import (
        parse_xml_mapping_string,
        xml_string_to_target_annotations,
    )
    from sciencebeam_trainer_grobid_tools_spark.plans.flavors import segmentation_flavor
    from sciencebeam_trainer_grobid_tools_spark.sources.corpus import DEFAULT_XML_MAPPING

    corpus = _documents_as_corpus(spark, sf_dir)
    mapping = parse_xml_mapping_string(DEFAULT_XML_MAPPING)
    chain = segmentation_flavor()

    def segment_batches(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                doc = tokenize_lines(html_to_lines(row.html))
                targets = xml_string_to_target_annotations(row.target_xml, mapping)
                chain(doc, targets)
                counts = {}
                for line in doc.lines:
                    if not line:
                        continue
                    seg = strip_tag_prefix(line[0].tag) or "untagged"
                    counts[seg] = counts.get(seg, 0) + 1
                rows.append(
                    {
                        "url": row.url,
                        "front_lines": counts.get("front", 0),
                        "body_lines": counts.get("body", 0),
                        "reference_lines": counts.get("reference", 0),
                        "n_lines": len(doc.lines),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["url", "front_lines", "body_lines", "reference_lines", "n_lines"]
            )

    return corpus.repartition(
        spark.sparkContext.defaultParallelism, F.xxhash64("url")
    ).mapInPandas(
        segment_batches,
        schema="url string, front_lines int, body_lines int, reference_lines int, n_lines int",
    )


def q_tei_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship pipeline with TEI training-XML serialization (rows-only)."""
    corpus = _documents_as_corpus(spark, sf_dir).limit(100)
    annotated = annotate_documents(
        corpus, repartition=spark.sparkContext.defaultParallelism, render_tei=True
    )
    return annotated.select("url", F.length("tei_xml").alias("tei_len"), "passed")


def q_tei_render_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TEI render FSM oracle-checked by ROUND-TRIP: flagship pipeline with
    TEI serialization, then the emitted training XML is re-parsed and the
    docTitle/titlePart text extracted — it must be exactly the first 8 words
    of the document text (what the title annotation covers), which DuckDB
    computes directly.  Value-checks tag emission, path nesting, and
    whitespace fidelity of the renderer per document."""
    import xml.etree.ElementTree as ET

    import pandas as pd

    corpus = _documents_as_corpus(spark, sf_dir)
    annotated = annotate_documents(corpus, render_tei=True)

    def extract_title(batches):
        for pdf in batches:
            rows = []
            for url, tei_xml in zip(pdf["url"], pdf["tei_xml"]):
                title = None
                if tei_xml:
                    root = ET.fromstring(tei_xml)
                    nodes = root.findall(".//docTitle/titlePart")
                    if nodes:
                        title = " ".join("".join(n.itertext()) for n in nodes)
                rows.append({"doc_id": int(url[6:]), "tei_title": title})
            yield pd.DataFrame(rows, columns=["doc_id", "tei_title"])

    return annotated.select("url", "tei_xml").mapInPandas(
        extract_title, "doc_id long, tei_title string"
    )


_PREDICATE_MAPPING = """
[article]
author = front/article-meta/contrib-group/contrib[not(@contrib-type) or @contrib-type="author"]/name
issn = front/journal-meta/issn[@pub-id-type="epub"]
keyword = front/article-meta/kwd-group/kwd[@kwd-group-type='author-keywords' or not(@kwd-group-type)]
second_keyword = front/article-meta/kwd-group/kwd[2]
back_para = back//sec[not(ancestor::ack)]/p[not(ancestor::ack)]
free_para = back//p[not(ancestor::sec) and not(ancestor::ack)]
"""


def q_targets_predicate_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full XPath-1.0 predicate evaluation (reference config/xml-mapping.conf
    forms: or / not(@attr) / not(ancestor::..) / positional), oracle-checked:
    a JATS doc is synthesized per documents row with known decoy nodes
    (editor contribs, ppub issn, 'other' keywords, ack paragraphs) that the
    predicates must exclude; DuckDB recomputes the expected values directly."""
    import pandas as pd

    from sciencebeam_trainer_grobid_tools_spark.operators.targets import (
        parse_xml_mapping_string,
        xml_string_to_target_annotations,
    )

    # _spread: the single-row-group local table would otherwise run the
    # whole per-document Python stage on one scan task (same fix as
    # align_exact_spans)
    docs = _spread(
        _load(spark, sf_dir, "documents").select("doc_id"), spark
    )
    i = F.col("doc_id").cast("string")
    jats = F.concat(
        F.lit("<article><front><journal-meta>"
              "<issn pub-id-type=\"ppub\">P"), i,
        F.lit("</issn><issn pub-id-type=\"epub\">E"), i,
        F.lit("</issn></journal-meta><article-meta><contrib-group>"
              "<contrib contrib-type=\"author\"><name><surname>Smith"), i,
        F.lit("</surname><given-names>John"), i,
        F.lit("</given-names></name></contrib>"
              "<contrib><name><surname>Anon"), i,
        F.lit("</surname><given-names>Ano"), i,
        F.lit("</given-names></name></contrib>"
              "<contrib contrib-type=\"editor\"><name><surname>Nope"), i,
        F.lit("</surname><given-names>Ed"), i,
        F.lit("</given-names></name></contrib></contrib-group>"
              "<kwd-group><kwd>kw"), i,
        F.lit("</kwd><kwd kwd-group-type=\"author-keywords\">ak"), i,
        F.lit("</kwd><kwd kwd-group-type=\"other\">no"), i,
        F.lit("</kwd></kwd-group></article-meta></front><body/>"
              "<back><ack><sec><p>ackpara"), i,
        F.lit("</p></sec></ack><sec><p>secpara"), i,
        F.lit("</p></sec><p>freepara"), i,
        F.lit("</p></back></article>"),
    )
    mapping = parse_xml_mapping_string(_PREDICATE_MAPPING)

    def extract_batches(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                for ann in xml_string_to_target_annotations(row.jats, mapping):
                    value = (
                        " ".join(ann.value) if isinstance(ann.value, list) else ann.value
                    )
                    rows.append(
                        {"doc_id": row.doc_id, "field": ann.name, "value": value}
                    )
            yield pd.DataFrame(rows, columns=["doc_id", "field", "value"])

    return docs.select("doc_id", jats.alias("jats")).mapInPandas(
        extract_batches, schema="doc_id long, field string, value string"
    )


def _run_flavor_query(
    spark: SparkSession,
    sf_dir: str,
    mapping_text: str,
    load_mapping: dict,
    tei_fmt: str,
    jats_fmt: str,
    flavor_factory,
    tei_render_mapping: dict,
    out_fields: list,
    container_path: str = "text/front",
) -> DataFrame:
    """Shared driver for the flavor gate queries: synthesize (TEI, JATS)
    per documents row from doc_id literals, run the full chain
    (load TEI -> extract targets -> flavor annotate -> TEI render), emit the
    rendered field texts — DuckDB recomputes the expected literals."""
    import pandas as pd
    import xml.etree.ElementTree as ET

    from sciencebeam_trainer_grobid_tools_spark.operators.annotate import MatcherConfig
    from sciencebeam_trainer_grobid_tools_spark.operators.targets import (
        get_tag_config_map,
        parse_xml_mapping_string,
        xml_string_to_target_annotations,
    )
    from sciencebeam_trainer_grobid_tools_spark.operators.tei_render import (
        render_tagged_lines,
    )
    from sciencebeam_trainer_grobid_tools_spark.sources.tei import load_tei_doc

    # _spread: the single-row-group local table would otherwise run the
    # whole per-document Python stage on one scan task (same fix as
    # align_exact_spans)
    docs = _spread(
        _load(spark, sf_dir, "documents").select("doc_id"), spark
    )
    mapping = parse_xml_mapping_string(mapping_text)
    matcher_config = MatcherConfig(
        use_sub_annotations=True,
        extend_to_line_enabled=False,
        tag_config_map=get_tag_config_map(mapping),
    )
    chain = flavor_factory(matcher_config)
    schema = "doc_id long, " + ", ".join("%s string" % f for f, _ in out_fields)

    def extract_batches(batches):
        for pdf in batches:
            rows = []
            for row in pdf.itertuples(index=False):
                i = str(row.doc_id)
                doc = load_tei_doc(
                    tei_fmt.format(i=i), load_mapping, container_path=container_path
                )
                targets = xml_string_to_target_annotations(
                    jats_fmt.format(i=i), mapping
                )
                chain(doc, targets)
                container = ET.Element("text")
                render_tagged_lines(container, doc, tei_render_mapping)
                out = {"doc_id": row.doc_id}
                for field, xpath in out_fields:
                    node = container.find(xpath)
                    out[field] = "".join(node.itertext()) if node is not None else None
                rows.append(out)
            yield pd.DataFrame(
                rows, columns=["doc_id"] + [f for f, _ in out_fields]
            )

    return docs.mapInPandas(extract_batches, schema=schema)


def q_flavor_refseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-segmenter flavor gate (auto_annotate_reference_segmenter.py):
    label + citation per doc -> listBibl/bibl with label sub field."""
    from sciencebeam_trainer_grobid_tools_spark.plans.flavors import (
        reference_segmenter_flavor,
    )

    return _run_flavor_query(
        spark,
        sf_dir,
        mapping_text="""
[article]
reference = back/ref-list/ref
reference.children = .//*
reference.use-raw-text = true
reference.sub.reference-label = ./label
""",
        load_mapping={},
        tei_fmt="<tei><text><note>{i} Ref title {i} words</note></text></tei>",
        jats_fmt=(
            "<article><front/><body/><back><ref-list><ref><label>{i}</label>"
            "<mixed-citation>Ref title {i} words</mixed-citation></ref>"
            "</ref-list></back></article>"
        ),
        flavor_factory=lambda cfg: reference_segmenter_flavor(cfg),
        tei_render_mapping={
            "DEFAULT": 'note[@type="other"]',
            "reference": "listBibl/bibl",
            "reference-label": "listBibl/bibl/label",
        },
        out_fields=[
            ("bibl", ".//listBibl/bibl"),
            ("label", ".//listBibl/bibl/label"),
        ],
        container_path="text",
    )


def q_flavor_affiliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Affiliation flavor gate (auto_annotate_affiliation_address.py):
    preserved affiliation + sub fields incl. the address group merge."""
    from sciencebeam_trainer_grobid_tools_spark.plans.flavors import affiliation_flavor

    return _run_flavor_query(
        spark,
        sf_dir,
        mapping_text="""
[article]
author_aff = front/article-meta/contrib-group/aff
author_aff.children = .//*
author_aff.unmatched-parent-text = true
author_aff.sub.author_aff-label = ./label
author_aff.sub.author_aff-institution = ./institution
author_aff.sub.author_aff-address-city = ./addr-line/named-content[@content-type="city"]
author_aff.sub.author_aff-address-country = ./country
author_aff.match-prefix-regex = ({author_aff-label})\\s*[\\.-]*\\s*$
""",
        load_mapping={"author_aff": "affiliation"},
        tei_fmt=(
            "<tei><text><front><affiliation>{i} Institute{i}, City{i}, Country{i}"
            "</affiliation></front></text></tei>"
        ),
        jats_fmt=(
            "<article><front><article-meta><contrib-group>"
            "<aff><label>{i}</label> <institution>Institute{i}</institution>, "
            '<addr-line><named-content content-type="city">City{i}</named-content>'
            "</addr-line>, <country>Country{i}</country></aff>"
            "</contrib-group></article-meta></front><body/><back/></article>"
        ),
        flavor_factory=lambda cfg: affiliation_flavor(cfg),
        tei_render_mapping={
            "DEFAULT": 'note[@type="other"]',
            "author_aff": "affiliation",
            "author_aff-label": "affiliation/marker",
            "author_aff-institution": 'affiliation/orgName[@type="institution"]',
            "author_aff-address": "affiliation/address",
            "author_aff-address-city": "affiliation/address/settlement",
            "author_aff-address-country": "affiliation/address/country",
        },
        out_fields=[
            ("marker", ".//affiliation/marker"),
            ("institution", './/affiliation/orgName[@type="institution"]'),
            ("city", ".//affiliation/address/settlement"),
            ("country", ".//affiliation/address/country"),
        ],
    )


def q_flavor_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Table flavor gate (auto_annotate_table.py): label/caption sub fields
    within the preserved table figure."""
    from sciencebeam_trainer_grobid_tools_spark.plans.flavors import table_flavor

    return _run_flavor_query(
        spark,
        sf_dir,
        mapping_text="""
[article]
table = //table-wrap
table.children = ./label | ./caption
table.children.concat = [[{"xpath": "./label"}, {"value": " "}, {"xpath": "./caption"}]]
table.sub.table-label = ./label
table.sub.table-caption = ./caption
""",
        load_mapping={"table": 'figure[@type="table"]'},
        tei_fmt=(
            '<tei><text><figure type="table">Table {i} Caption text {i}</figure>'
            "</text></tei>"
        ),
        jats_fmt=(
            "<article><front/><body><table-wrap><label>Table {i}</label>"
            "<caption><p>Caption text {i}</p></caption></table-wrap></body>"
            "<back/></article>"
        ),
        flavor_factory=lambda cfg: table_flavor(cfg),
        tei_render_mapping={
            "DEFAULT": 'note[@type="other"]',
            "table": 'figure[@type="table"]',
            "table-label": 'figure[@type="table"]/head/label',
            "table-caption": 'figure[@type="table"]/figDesc',
        },
        out_fields=[
            ("label", './/figure[@type="table"]/head/label'),
            ("caption", './/figure[@type="table"]/figDesc'),
        ],
        container_path="text",
    )


def q_jats_fix_identifiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JATS repair pipeline (reference fix_jats_xml.py), oracle-checked: a
    deliberately-broken citation is synthesized per documents row (upper-case
    pub-id-type, doi: prefix + [doi] suffix, PMID: label inside the pmid
    value, un-annotated PMCID in a child tail, two concatenated urls in one
    ext-link); after ``fix_jats_xml_column`` the repaired identifiers are
    extracted JVM-side (regexp over the serialized XML) and must equal the
    literals DuckDB derives from doc_id."""
    from sciencebeam_trainer_grobid_tools_spark.operators.jats_fix import (
        fix_jats_xml_column,
    )

    # _spread: the single-row-group local table would otherwise run the
    # whole per-document Python stage on one scan task (same fix as
    # align_exact_spans)
    docs = _spread(
        _load(spark, sf_dir, "documents").select("doc_id"), spark
    )
    i = F.col("doc_id").cast("string")
    url_a = F.concat(F.lit("https://doi.org/10.1/a"), i)
    url_b = F.concat(F.lit("https://doi.org/10.1/b"), i)
    jats = F.concat(
        F.lit(
            '<article xmlns:xlink="http://www.w3.org/1999/xlink">'
            "<back><ref-list><ref><mixed-citation>Some title "
        ),
        i,
        F.lit('. <pub-id pub-id-type="DOI">doi:10.1234/j.x.'),
        i,
        F.lit(" [doi]</pub-id> PMCID: PMC77"),
        i,
        F.lit('; <pub-id pub-id-type="pmid">PMID: 99'),
        i,
        F.lit('</pub-id> <ext-link xlink:href="'),
        url_a, url_b,
        F.lit('">'),
        url_a, url_b,
        F.lit("</ext-link></mixed-citation></ref></ref-list></back></article>"),
    )
    fixed = fix_jats_xml_column(
        docs.select("doc_id", jats.alias("jats_xml")), xml_col="jats_xml"
    )
    pub_id = lambda t: F.regexp_extract(  # noqa: E731
        F.col("fixed_xml"), '<pub-id pub-id-type="%s">([^<]*)</pub-id>' % t, 1
    )
    return fixed.select(
        "doc_id",
        pub_id("doi").alias("doi"),
        pub_id("pmid").alias("pmid"),
        pub_id("pmcid").alias("pmcid"),
        F.array_join(
            F.regexp_extract_all(F.col("fixed_xml"), F.lit("<ext-link[^>]*>([^<]*)</ext-link>"), 1),
            "|",
        ).alias("ext_links"),
    )


def q_media_payload_digests(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-plumbing family, oracle-checked: the binary transfer check
    plus (since round 8) Unicode NFC normalization as a labeled variant.

    `image/fake` rows: the Arrow-batched stage digests each binary
    payload (sha256 via hashlib) and DuckDB recomputes sha256(md5(text))
    over the same derivation — byte-exact binary-column transfer through
    scan -> Arrow -> pandas is value-verified.  `text/nfc` rows
    (operators/textnorm.py): each document's text gets a PLANTED
    decomposed suffix (e + combining acute, so NFC genuinely rewrites),
    normalizes in the honest one-Arrow-stage path, and the md5 + byte
    length of the composed result must equal what DuckDB's independent
    ``nfc_normalize`` implementation produces."""
    from sciencebeam_trainer_grobid_tools_spark.operators import textnorm
    from sciencebeam_trainer_grobid_tools_spark.operators.multimodal import (
        media_payload_digests,
    )

    docs = _load(spark, sf_dir, "documents")
    payload = media_payload_digests(attach_fake_media(docs))
    aug = docs.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40), F.lit("Café au lait")
        ).alias("text"),
    )
    nfc = textnorm.normalize_text(aug).select(
        "doc_id",
        F.lit("text/nfc").alias("media_type"),
        F.octet_length("text_norm").cast("int").alias("n_bytes"),
        F.md5("text_norm").alias("digest"),
    )
    return payload.unionByName(nfc)


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payload column -> Arrow-batched decode stub
    -> typed features (rows-only; decode is deterministic-fake here)."""
    docs = _load(spark, sf_dir, "documents")
    return extract_media_features(attach_fake_media(docs))


# ---------------------------------------------------------------------------
# contract functions


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_flagship_extract_align(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "pricing_summary": q_pricing_summary,
        "top_revenue_orders": q_top_revenue_orders,
        "region_supplier_volume": q_region_supplier_volume,
        "resume_anti_join": q_resume_anti_join,
        "regex_rename_join": q_regex_rename_join,
        "event_sessionization": q_event_sessionization,
        "event_windows": q_event_windows,
        "crawl_snapshot_diff": q_crawl_snapshot_diff,
        "events_json_extraction": q_events_json_extraction,
        "levenshtein_check": q_levenshtein_check,
        "docs_fingerprint_dedup": q_docs_fingerprint_dedup,
        "docs_text_features": q_docs_text_features,
        "docs_quality": q_docs_quality,
        "docs_web_filters": q_docs_web_filters,
        "docs_rewrite_dedup": q_docs_rewrite_dedup,
        "robots_policy": q_robots_policy,
        "docs_minhash": q_docs_minhash,
        "docs_simhash": q_docs_simhash,
        "docs_ngram_jaccard": q_docs_ngram_jaccard,
        "docs_pii_scrub": q_docs_pii_scrub,
        "urls_bloom_membership": q_urls_bloom_membership,
        "docs_token_budget": q_docs_token_budget,
        "docs_lm_logprob": q_docs_lm_logprob,
        "docs_dsir_sample": q_docs_dsir_sample,
        "docs_curation_pipeline": q_docs_curation_pipeline,
        "docs_repetition": q_docs_repetition,
        "docs_decontaminate": q_docs_decontaminate,
        "docs_ppl_buckets": q_docs_ppl_buckets,
        "emb_cosine_topk": q_emb_cosine_topk,
        "emb_ann_topk": q_emb_ann_topk,
        "emb_lsh": q_emb_lsh,
        "emb_centroid_family": q_emb_centroid_family,
        "hosts_pagerank": q_hosts_pagerank,
        "emb_near_dup_pairs": q_emb_near_dup_pairs,
        "emb_ivf_train_step": q_emb_ivf_train_step,
        "align_exact_spans": q_align_exact_spans,
        "flagship_extract_align": q_flagship_extract_align,
        "flagship_title_spans": q_flagship_title_spans,
        "flagship_title_spans_complex": q_flagship_title_spans_complex,
        "docs_layout_signals": q_docs_layout_signals,
        "warc_records": q_warc_records,
        "tei_render_roundtrip": q_tei_render_roundtrip,
        "docs_segmentation_layout": q_docs_segmentation_layout,
        "media_payload_digests": q_media_payload_digests,
        "flagship_segmentation": q_flagship_segmentation,
        "targets_predicate_extract": q_targets_predicate_extract,
        "flavor_refseg": q_flavor_refseg,
        "flavor_affiliation": q_flavor_affiliation,
        "flavor_table": q_flavor_table,
        "jats_fix_identifiers": q_jats_fix_identifiers,
    }


def demo_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Rows-only demos kept OUT of the driver's gate dict (the gate records
    at most 50 entries; every ``queries()`` entry must carry an oracle so
    none can silently drop).  Each demo's values are pinned by an
    oracle-bearing twin inside the gate plus byte-level pytest:

    - ``docs_minhash_near_dups`` (production xxhash64 path) — twin
      ``docs_minhash_xxhash_crosscheck`` value-checks it against the
      portable hash at j >= 0.95; ``docs_minhash_portable`` value-checks
      the shared pipeline end-to-end;
    - ``tei_render`` (training-XML lengths over the flagship path) — twin
      ``tei_render_roundtrip`` value-checks render -> reparse;
    - ``media_features`` (fake-codec features) — twin
      ``media_payload_digests`` value-checks the binary transfer
      byte-for-byte;
    - ``emb_pq_adc_topk`` / ``emb_ivf_topk`` — folded into the labeled
      gate entry ``emb_ann_topk`` (variants ``pq`` / ``ivf``, alongside
      the composed ``ivfpq``); kept addressable for bench.py."""
    return {
        "docs_minhash_near_dups": q_docs_minhash_near_dups,
        "tei_render": q_tei_render,
        "media_features": q_media_features,
        "emb_semantic_dedup": q_emb_semantic_dedup,
        "emb_pq_adc_topk": q_emb_pq_adc_topk,
        "emb_ivf_topk": q_emb_ivf_topk,
        "docs_bpe_stats": q_docs_bpe_stats,
        # kept addressable so bench.py's HEADLINE workload stays identical
        # round-over-round after the gate merged this into
        # docs_fingerprint_dedup (variant='groups' value-checks it there)
        "docs_exact_dedup": q_docs_exact_dedup,
        # same rationale after the gate merged lang-id + token counts into
        # docs_text_features (which value-checks every column)
        "docs_token_counts": q_docs_token_counts,
    }


def q_docs_bpe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-scale BPE tokenizer training demo (rows-only: the iterative
    merge construction has no closed SQL form — the value oracle is the
    pure-python Sennrich reference the pytest differential runs): train 8
    merges on the corpus's own word-count table, then report per-document
    (n_tokens, n_subwords) under the learned tokenizer."""
    from sciencebeam_trainer_grobid_tools_spark.operators import bpe

    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    merges = bpe.bpe_train(docs, n_merges=8)
    return bpe.bpe_encode_stats(docs, merges).orderBy("doc_id")


def q_docs_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail perplexity bucketing: unigram corpus-LM
    scores -> cutoffs-mode thirds per language (exact interpolated
    percentiles, the checkable definition; the DuckDB oracle replays the
    scores, the quantile_cont cutoffs and the <=-cutoff assignment).
    The cutoffs_approx sketch mode's agreement, null-stratum parity and
    the no-Window scale claim are pinned by pytest."""
    docs = _spread(_load(spark, sf_dir, "documents"), spark)
    scored = textstats.unigram_logprob_features(docs, persist_vocab=False)
    scored = scored.join(docs.select("doc_id", "lang"), "doc_id")
    out = textstats.perplexity_buckets(scored, strata=("lang",), mode="cutoffs")
    return out.select("doc_id", "lang", "avg_neg_logprob", "ppl_bucket").orderBy(
        "doc_id"
    )


def q_emb_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shape semantic dedup demo (rows-only: the testdata
    embeddings are unclustered gaussians, so the interesting behavior —
    keep-lowest-per-group — is pinned by the planted-group pytest; this
    demo exercises the full cell-local pairwise plan on real data at a
    DEMO threshold)."""
    embeddings = _load(spark, sf_dir, "embeddings")
    centroids = similarity.ivf_train(embeddings, n_cells=8, iters=0, dim=64)
    out = similarity.semantic_dedup(embeddings, centroids, threshold=0.35)
    return out.select("vec_id", "ivf_cell", "semdedup_keep").orderBy("vec_id")


def q_emb_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup via banded signed-random-projection LSH
    (dedup.embedding_near_dup_pairs): band/bucket keys JVM-side, id-only
    band shuffle, exact cosine only on candidates.  The testdata embeddings
    are unclustered gaussians (pairwise cosine max ~0.44), so the DEMO
    threshold is 0.35 to yield a non-trivial pair set; the production
    operating point (threshold 0.9, recall >= 0.999) is pinned by pytest on
    a seeded clustered corpus.  The oracle recomputes the same banding, so
    the value check covers bucket assignment + candidate generation + the
    cosine verification."""
    embeddings = _load(spark, sf_dir, "embeddings")
    return dedup.embedding_near_dup_pairs(
        embeddings, threshold=0.35, n_bands=8, rows_per_band=4, seed=7, dim=64
    )


def _emb_near_dup_oracle_sql() -> str:
    """DuckDB replica of q_emb_near_dup_pairs: the seed-7 hyperplanes are
    inlined; band buckets (4 sign bits per band, 8 bands), the candidate
    self-join, and the exact-cosine filter are recomputed in SQL."""
    from sciencebeam_trainer_grobid_tools_spark.operators.similarity import (
        random_hyperplanes,
    )

    planes = random_hyperplanes(dim=64, n_planes=32, seed=7)
    plane_rows = ",\n".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join("%.17g" % v for v in plane))
        for i, plane in enumerate(planes)
    )
    return """
        WITH planes(plane_id, plane) AS (VALUES %s),
        buckets AS (
            SELECT e.vec_id,
                   p.plane_id // 4 AS band,
                   CAST(SUM(
                       CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.plane) >= 0
                            THEN 1 << (p.plane_id %% 4) ELSE 0 END
                   ) AS BIGINT) AS bucket
            FROM embeddings e, planes p
            GROUP BY e.vec_id, p.plane_id // 4
        ),
        pairs AS (
            SELECT DISTINCT l.vec_id AS id_a, r.vec_id AS id_b
            FROM buckets l
            JOIN buckets r
              ON l.band = r.band AND l.bucket = r.bucket
             AND l.vec_id < r.vec_id
        ),
        cosines AS (
            SELECT p.id_a, p.id_b,
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                   / (SQRT(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                      * SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))
                       AS c
            FROM pairs p
            JOIN embeddings a ON a.vec_id = p.id_a
            JOIN embeddings b ON b.vec_id = p.id_b
        )
        SELECT id_a, id_b, ROUND(c, 4) AS cosine
        FROM cosines WHERE c >= 0.35
    """ % plane_rows


# DuckDB replica of q_emb_ivf_topk: centroids are the 8 lowest-id vectors
# (the deterministic iters=0 quantizer), assignment is max-cosine with
# lowest-cell tie-break (correlated ORDER BY ... LIMIT 1), the probe set is
# the 2 best cells for the vec_id=0 query, and the probed cells re-rank by
# exact cosine.
_EMB_IVF_ORACLE_SQL = """
    WITH cent AS (
        SELECT vec_id AS cell, embedding AS cvec,
               SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS cnorm
        FROM embeddings WHERE vec_id < 8
    ),
    assigned AS (
        SELECT e.vec_id, e.embedding,
               (SELECT c.cell FROM cent c
                ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[])
                         / (SQRT(list_dot_product(e.embedding::DOUBLE[],
                                                  e.embedding::DOUBLE[]))
                            * c.cnorm) DESC, c.cell
                LIMIT 1) AS ivf_cell
        FROM embeddings e
    ),
    q AS (
        SELECT embedding AS qe,
               SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS qn
        FROM embeddings WHERE vec_id = 0
    ),
    probe AS (
        SELECT c.cell FROM cent c, q
        ORDER BY list_dot_product(q.qe::DOUBLE[], c.cvec::DOUBLE[])
                 / (c.cnorm * q.qn) DESC, c.cell
        LIMIT 2
    )
    SELECT a.vec_id, CAST(a.ivf_cell AS INT) AS ivf_cell,
           ROUND(list_dot_product(a.embedding::DOUBLE[], q.qe::DOUBLE[])
                 / (SQRT(list_dot_product(a.embedding::DOUBLE[],
                                          a.embedding::DOUBLE[])) * q.qn),
                 4) AS cosine
    FROM assigned a, q
    WHERE a.ivf_cell IN (SELECT cell FROM probe)
    ORDER BY list_dot_product(a.embedding::DOUBLE[], q.qe::DOUBLE[])
             / (SQRT(list_dot_product(a.embedding::DOUBLE[],
                                      a.embedding::DOUBLE[])) * q.qn)
             DESC, a.vec_id
    LIMIT 10
"""


# DuckDB replica of q_emb_pq_adc_topk: iters=0 codebooks come from the
# TABLE (subvectors of vec_id < 8), so no literal injection is needed;
# encode = per-(vec, subspace) squared-L2 argmin with lowest-code
# tie-break (row_number), ADC = LUT join + per-vector sum.  dim 64, m 8,
# sub 8 per TESTDATA.md.
_EMB_PQ_ADC_ORACLE_SQL = """
    WITH s_axis AS (SELECT unnest(range(0, 8)) AS s),
    cb AS (
        SELECT e.vec_id AS code, sa.s,
               (e.embedding::DOUBLE[])[sa.s*8+1 : sa.s*8+8] AS cvec
        FROM embeddings e, s_axis sa
        WHERE e.vec_id < 8
    ),
    sv AS (
        SELECT e.vec_id, sa.s,
               (e.embedding::DOUBLE[])[sa.s*8+1 : sa.s*8+8] AS vvec
        FROM embeddings e, s_axis sa
    ),
    dists AS (
        SELECT sv.vec_id, sv.s, cb.code,
               list_sum([(sv.vvec[i] - cb.cvec[i])^2
                         for i in range(1, 9)]) AS d
        FROM sv JOIN cb USING (s)
    ),
    enc AS (
        SELECT vec_id, s, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d, code) AS rn
        FROM dists
    ),
    q AS (SELECT embedding::DOUBLE[] AS qe
          FROM embeddings WHERE vec_id = 0),
    lut AS (
        SELECT cb.s, cb.code,
               list_sum([(q.qe[cb.s*8+i] - cb.cvec[i])^2
                         for i in range(1, 9)]) AS ld
        FROM cb, q
    ),
    adc AS (
        SELECT e.vec_id, SUM(l.ld) AS d
        FROM enc e JOIN lut l ON l.s = e.s AND l.code = e.code
        WHERE e.rn = 1
        GROUP BY e.vec_id
    )
    SELECT vec_id, ROUND(d, 4) AS adc_dist
    FROM adc ORDER BY d, vec_id LIMIT 10
"""


# DuckDB replica of q_emb_ivfpq_topk: the IVF oracle's max-cosine cell
# assignment, residual = vector - own-cell centroid, the PQ oracle's
# iters=0 codebooks (RAW subvectors of vec_id < 8 — the seed is shared,
# only the encoded stream is residual), nprobe=2 cells by L2 distance of
# the query to the centroids (ties by cell), per-probed-cell residual
# LUTs, ADC restricted to probed cells by the lut-cell join.
_EMB_IVFPQ_ORACLE_SQL = """
    WITH cent AS (
        SELECT vec_id AS cell, embedding::DOUBLE[] AS cvec,
               SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS cnorm
        FROM embeddings WHERE vec_id < 8
    ),
    assigned AS (
        SELECT e.vec_id, e.embedding,
               (SELECT c.cell FROM cent c
                ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cvec)
                         / (SQRT(list_dot_product(e.embedding::DOUBLE[],
                                                  e.embedding::DOUBLE[]))
                            * c.cnorm) DESC, c.cell
                LIMIT 1) AS ivf_cell
        FROM embeddings e
    ),
    res AS (
        SELECT a.vec_id, a.ivf_cell,
               [(a.embedding::DOUBLE[])[i] - c.cvec[i]
                for i in range(1, 65)] AS rvec
        FROM assigned a JOIN cent c ON c.cell = a.ivf_cell
    ),
    s_axis AS (SELECT unnest(range(0, 8)) AS s),
    cb AS (
        SELECT e.vec_id AS code, sa.s,
               (e.embedding::DOUBLE[])[sa.s*8+1 : sa.s*8+8] AS cvec
        FROM embeddings e, s_axis sa
        WHERE e.vec_id < 8
    ),
    sv AS (
        SELECT r.vec_id, r.ivf_cell, sa.s,
               r.rvec[sa.s*8+1 : sa.s*8+8] AS vvec
        FROM res r, s_axis sa
    ),
    dists AS (
        SELECT sv.vec_id, sv.ivf_cell, sv.s, cb.code,
               list_sum([(sv.vvec[i] - cb.cvec[i])^2
                         for i in range(1, 9)]) AS d
        FROM sv JOIN cb USING (s)
    ),
    enc AS (
        SELECT vec_id, ivf_cell, s, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, s
                                  ORDER BY d, code) AS rn
        FROM dists
    ),
    q AS (SELECT embedding::DOUBLE[] AS qe
          FROM embeddings WHERE vec_id = 0),
    probe AS (
        SELECT c.cell,
               [q.qe[i] - c.cvec[i] for i in range(1, 65)] AS rqvec
        FROM cent c, q
        ORDER BY list_sum([(q.qe[i] - c.cvec[i])^2 for i in range(1, 65)]),
                 c.cell
        LIMIT 2
    ),
    lut AS (
        SELECT p.cell, cb.s, cb.code,
               list_sum([(p.rqvec[cb.s*8+i] - cb.cvec[i])^2
                         for i in range(1, 9)]) AS ld
        FROM probe p, cb
    ),
    adc AS (
        SELECT e.vec_id, SUM(l.ld) AS d
        FROM enc e
        JOIN lut l ON l.cell = e.ivf_cell AND l.s = e.s AND l.code = e.code
        WHERE e.rn = 1
        GROUP BY e.vec_id
    )
    SELECT vec_id, ROUND(d, 4) AS adc_dist
    FROM adc ORDER BY d, vec_id LIMIT 10
"""


# the three quantized-ANN variants' labeled union (column names aligned)
_EMB_ANN_TOPK_ORACLE_SQL = """
    SELECT 'ivf' AS variant, vec_id, ivf_cell AS cell, cosine AS score
    FROM (%s)
    UNION ALL
    SELECT 'pq' AS variant, vec_id, CAST(NULL AS INT) AS cell,
           adc_dist AS score
    FROM (%s)
    UNION ALL
    SELECT 'ivfpq' AS variant, vec_id, CAST(NULL AS INT) AS cell,
           adc_dist AS score
    FROM (%s)
    ORDER BY variant, vec_id
"""


# DuckDB replica of q_docs_ppl_buckets: the unigram-LM oracle's scores,
# per-language cutoffs via quantile_cont (the same interpolated exact
# percentile Spark's `percentile` computes; the fraction literals are
# injected with python str() so both engines parse the identical
# doubles), bucket = first cutoff with score <= cutoff else the last.
_DOCS_PPL_BUCKETS_ORACLE_SQL = """
    WITH scored AS (%(unigram)s),
    j AS (
        SELECT s.doc_id, d.lang, s.avg_neg_logprob
        FROM scored s JOIN documents d USING (doc_id)
    ),
    cuts AS (
        SELECT lang,
               quantile_cont(avg_neg_logprob, [%(q1)s, %(q2)s]) AS c
        FROM j GROUP BY lang
    )
    SELECT j.doc_id, j.lang, j.avg_neg_logprob,
           CAST(CASE WHEN j.avg_neg_logprob <= cuts.c[1] THEN 1
                     WHEN j.avg_neg_logprob <= cuts.c[2] THEN 2
                     ELSE 3 END AS INT) AS ppl_bucket
    FROM j JOIN cuts USING (lang)
    ORDER BY j.doc_id
"""


# DuckDB replica of q_docs_web_filters: the three heuristic-filter families
# recomputed from scratch — Gopher statistics over the corpus tokenization
# (rounded BEFORE thresholding, exactly as the Spark operator thresholds its
# own rounded columns), the C4 line/page rules with the cleaned text pinned
# by md5, and the hashed classifier through the same
# md5-first-8-hex-chars bucket/weight derivation ('0x'||substr idiom shared
# with the sampler oracles).  clf_keep mirrors the UNROUNDED sigmoid
# comparison; zero-token documents have no classifier row (LEFT JOIN keeps
# their NULLs).
_DOCS_WEB_FILTERS_ORACLE_SQL = """
    WITH base AS (
        SELECT doc_id, text,
               list_filter(
                   string_split(LOWER(REPLACE(text, chr(10), ' ')), ' '),
                   t -> t <> ''
               ) AS words,
               list_filter(
                   list_transform(string_split(text, chr(10)), l -> TRIM(l)),
                   t -> t <> ''
               ) AS glines,
               string_split(text, chr(10)) AS rawlines
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               CAST(LEN(words) AS INT) AS g_words,
               ROUND(COALESCE(list_sum(list_transform(words, w -> LENGTH(w))), 0)
                     / GREATEST(LEN(words), 1), 6) AS g_mean_word_len,
               ROUND(LEN(regexp_extract_all(text, '#|\\.\\.\\.'))
                     / GREATEST(LEN(words), 1), 6) AS g_symbol_ratio,
               ROUND(LEN(list_filter(glines,
                         t -> starts_with(t, '-') OR starts_with(t, '*')
                              OR starts_with(t, '•')))
                     / GREATEST(LEN(glines), 1), 6) AS g_bullet_ratio,
               ROUND(LEN(list_filter(glines,
                         t -> ends_with(t, '...') OR ends_with(t, '…')))
                     / GREATEST(LEN(glines), 1), 6) AS g_ellipsis_ratio,
               ROUND(LEN(list_filter(words, w -> regexp_matches(w, '[a-z]')))
                     / GREATEST(LEN(words), 1), 6) AS g_alpha_ratio,
               (CAST(list_contains(words, 'the') AS INT)
                + CAST(list_contains(words, 'be') AS INT)
                + CAST(list_contains(words, 'to') AS INT)
                + CAST(list_contains(words, 'of') AS INT)
                + CAST(list_contains(words, 'and') AS INT)
                + CAST(list_contains(words, 'that') AS INT)
                + CAST(list_contains(words, 'have') AS INT)
                + CAST(list_contains(words, 'with') AS INT)) AS g_stopword_hits
        FROM base
    ),
    gk AS (
        SELECT *,
               (g_words >= 50 AND g_words <= 100000
                AND g_mean_word_len >= 3.0 AND g_mean_word_len <= 10.0
                AND g_symbol_ratio <= 0.1
                AND g_bullet_ratio <= 0.9
                AND g_ellipsis_ratio <= 0.3
                AND g_alpha_ratio >= 0.8
                AND g_stopword_hits >= 2) AS g_keep
        FROM g
    ),
    c4pre AS (
        SELECT doc_id, text, rawlines,
               list_filter(rawlines, l ->
                   (ends_with(TRIM(l), '.') OR ends_with(TRIM(l), '!')
                    OR ends_with(TRIM(l), '?') OR ends_with(TRIM(l), '"')
                    OR ends_with(TRIM(l), '”'))
                   AND LEN(list_filter(string_split(TRIM(l), ' '),
                                       w -> w <> '')) >= 5
                   AND NOT contains(LOWER(TRIM(l)), 'javascript')
               ) AS kept
        FROM base
    ),
    c4 AS (
        SELECT doc_id,
               CAST(LEN(rawlines) AS INT) AS c4_total_lines,
               CAST(LEN(kept) AS INT) AS c4_kept_lines,
               CAST(LEN(regexp_extract_all(clean, '[.!?]')) AS INT)
                   AS c4_sentences,
               contains(text, '{') AS c4_has_brace,
               contains(LOWER(text), 'lorem ipsum') AS c4_has_lorem,
               (LEN(regexp_extract_all(clean, '[.!?]')) >= 3
                AND NOT contains(text, '{')
                AND NOT contains(LOWER(text), 'lorem ipsum')) AS c4_keep,
               md5(clean) AS c4_clean_md5
        FROM (
            -- array_to_string is NULL on an empty list in DuckDB;
            -- Spark's array_join gives '' — pin the Spark semantics
            SELECT *, COALESCE(array_to_string(kept, chr(10)), '') AS clean
            FROM c4pre
        )
    ),
    wtok AS (
        SELECT doc_id,
               CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % 64 AS bucket
        FROM (SELECT doc_id, unnest(words) AS tok FROM base)
    ),
    clf AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS clf_tokens,
               ROUND(1.0 / (1.0 + EXP(-(0.0 + SUM(w) / COUNT(*)))), 6)
                   AS clf_score,
               (1.0 / (1.0 + EXP(-(0.0 + SUM(w) / COUNT(*)))) >= 0.5)
                   AS clf_keep
        FROM (
            SELECT doc_id,
                   CAST('0x' || substr(md5('w' || CAST(bucket AS VARCHAR)),
                                       1, 8) AS BIGINT)
                   / 4294967296.0 - 0.5 AS w
            FROM wtok
        )
        GROUP BY doc_id
    )
    SELECT gk.*,
           c4.c4_total_lines, c4.c4_kept_lines, c4.c4_sentences,
           c4.c4_has_brace, c4.c4_has_lorem, c4.c4_keep, c4.c4_clean_md5,
           clf.clf_tokens, clf.clf_score, clf.clf_keep
    FROM gk
    LEFT JOIN c4 USING (doc_id)
    LEFT JOIN clf USING (doc_id)
    ORDER BY doc_id
"""


# DuckDB replica of q_docs_repetition: identical tokenization to the minhash
# oracles, k-gram OCCURRENCES (multiplicity) grouped by the gram string —
# the fractions are hash-identity-independent, so string grouping verifies
# the xxhash64 production path's output values directly.
_DOCS_REPETITION_ORACLE_SQL = """
    WITH tok AS (
        SELECT doc_id,
               string_split(LOWER(REPLACE(text, chr(10), ' ')), ' ') AS tokens
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(CASE WHEN LEN(tokens) >= 2 THEN
                   [array_to_string(tokens[i:i+1], ' ')
                    for i in range(1, LEN(tokens))]
                 ELSE [array_to_string(tokens, ' ')] END) AS g
        FROM tok
    ),
    cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2)
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_ngrams,
           ROUND(MAX(c) / SUM(c), 6) AS top_ngram_frac,
           ROUND(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / SUM(c), 6)
               AS dup_ngram_frac
    FROM cnt GROUP BY doc_id ORDER BY doc_id
"""

# DuckDB replica of q_docs_decontaminate: 13-gram collision counts against
# the deterministic prompt eval set (first 20 tokens of doc_id % 83 == 1
# documents); short prompts/documents degrade to a whole-text identity on
# both sides, exactly like the Spark fallback.
_DOCS_DECONTAMINATE_ORACLE_SQL = """
    WITH tok AS (
        SELECT doc_id,
               string_split(LOWER(REPLACE(text, chr(10), ' ')), ' ') AS tokens
        FROM documents
    ),
    grams AS (
        SELECT doc_id,
               unnest(CASE WHEN LEN(tokens) >= 13 THEN
                   [array_to_string(tokens[i:i+12], ' ')
                    for i in range(1, LEN(tokens) - 11)]
                 ELSE [array_to_string(tokens, ' ')] END) AS g
        FROM tok
    ),
    ev AS (
        SELECT string_split(array_to_string(tokens[1:20], ' '), ' ') AS etoks
        FROM tok WHERE doc_id % 83 = 1
    ),
    eval_grams AS (
        SELECT DISTINCT unnest(CASE WHEN LEN(etoks) >= 13 THEN
                   [array_to_string(etoks[i:i+12], ' ')
                    for i in range(1, LEN(etoks) - 11)]
                 ELSE [array_to_string(etoks, ' ')] END) AS g
        FROM ev
    ),
    hits AS (
        SELECT DISTINCT gr.doc_id, gr.g
        FROM grams gr JOIN eval_grams e USING (g)
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_ngrams
    FROM hits GROUP BY doc_id ORDER BY doc_id
"""


# DuckDB replica of q_docs_winnowing: identical tokenization, the exact
# polynomial chain ((h*B + t) % P per token, t = 32-bit md5 prefix) and
# the same window-of-4 minima + distinct.
def _winnowing_oracle_sql(k: int = 5, window: int = 4) -> str:
    from sciencebeam_trainer_grobid_tools_spark.operators.dedup import (
        _WINNOW_B,
        _WINNOW_P,
    )

    h = "CAST(0 AS BIGINT)"
    for j in range(k):
        t = (
            "CAST('0x' || substr(md5(toks[i + %d]), 1, 8) AS BIGINT)" % j
        )
        # %% here renders ONE literal % for SQL; the outer template below
        # substitutes h as a VALUE, which % formatting does not re-scan
        h = "((%s * %d + %s) %% %d)" % (h, _WINNOW_B, t, _WINNOW_P)
    return """
    WITH tok AS (
        SELECT doc_id,
               string_split(LOWER(REPLACE(text, chr(10), ' ')), ' ') AS toks
        FROM documents
    ),
    sized AS (
        SELECT doc_id, toks, LEN(toks) AS n FROM tok WHERE LEN(toks) >= %(k)d
    ),
    pos AS (
        SELECT doc_id, toks, n, unnest(range(1, n - %(k)d + 2)) AS i
        FROM sized
    ),
    hashed AS (SELECT doc_id, n, i AS pos, %(h)s AS h FROM pos),
    winnowed AS (
        SELECT doc_id, pos, n,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND %(wm1)d FOLLOWING)
                   AS fp
        FROM hashed
    )
    SELECT DISTINCT doc_id, fp AS fingerprint
    FROM winnowed
    WHERE pos <= GREATEST(n - %(k)d + 1 - %(wm1)d, 1)
    ORDER BY doc_id, fingerprint
    """ % {"k": k, "h": h, "wm1": window - 1}


# DuckDB replicas of the token-budget sampling modes: the md5-uniform
# draw is CAST('0x' || substr(md5(id),1,8) AS BIGINT) / 2^32 — exact in
# double on both engines, so the kept row sets match exactly.
_DOCS_TOKEN_BUDGET_RATE_ORACLE_SQL = """
    WITH t AS (
        SELECT doc_id, lang, LEN(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    tot AS (SELECT lang, CAST(SUM(n_tok) AS DOUBLE) AS st FROM t GROUP BY lang)
    SELECT t.doc_id, t.lang
    FROM t JOIN tot USING (lang)
    WHERE CAST('0x' || substr(md5(CAST(t.doc_id AS VARCHAR)), 1, 8) AS BIGINT)
              / 4294967296.0
          < LEAST(1.0, 2000.0 / tot.st)
    ORDER BY t.doc_id
"""

_DOCS_TOKEN_BUDGET_EXACT_ORACLE_SQL = """
    WITH t AS (
        SELECT doc_id, lang, LEN(string_split(text, ' ')) AS n_tok,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    c AS (
        SELECT doc_id, lang,
               SUM(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT doc_id, lang FROM c WHERE cum <= 2000 ORDER BY doc_id
"""

# merged gate entry: both sampling modes, labeled; each mode's kept row
# set value-checks independently under the mode column
_DOCS_TOKEN_BUDGET_PACK_ORACLE_SQL = """
    WITH tk AS (
        SELECT doc_id,
               list_concat(
                   CASE WHEN text IS NULL THEN CAST([] AS INTEGER[])
                        ELSE list_transform(
                            regexp_extract_all(text, '\\w+'),
                            t -> CAST(length(t) AS INTEGER))
                   END,
                   [CAST(999 AS INTEGER)]) AS toks
        FROM documents
    ),
    lens AS (
        SELECT doc_id, toks, len(toks) AS ln,
               CAST(COALESCE(SUM(len(toks)) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS off
        FROM tk
    ),
    frags AS (
        SELECT doc_id, toks, ln, off,
               unnest(generate_series(off // 512, (off + ln - 1) // 512))
                   AS seq_id
        FROM lens WHERE ln > 0
    ),
    sl AS (
        SELECT seq_id, doc_id,
               GREATEST(off, seq_id * 512) AS gs,
               list_slice(toks,
                   CAST(GREATEST(off, seq_id * 512) - off + 1 AS BIGINT),
                   CAST(LEAST(off + ln, (seq_id + 1) * 512) - off AS BIGINT)
               ) AS piece
        FROM frags
    )
    SELECT seq_id,
           CAST(SUM(len(piece)) AS INT) AS n_tokens,
           CAST(COUNT(*) AS INT) AS n_docs,
           arg_min(doc_id, gs) AS first_doc,
           arg_max(doc_id, gs) AS last_doc,
           CAST(SUM(list_aggregate(piece, 'sum')) AS BIGINT) AS tok_sum,
           arg_min(piece[1], gs) AS first_token,
           arg_max(piece[len(piece)], gs) AS last_token
    FROM sl GROUP BY seq_id
"""

# DuckDB replica of the mix variant: per-source epoch arithmetic
# (e = (budget * w / sum_w) / total_tokens, textually parallel to the
# python float expression so IEEE doubles agree bit-for-bit), full
# epochs unconditional, the fractional epoch by the exact md5-uniform
# draw on 'gate:<source>:<n_full>:<doc_id>'
_DOCS_TOKEN_BUDGET_MIX_ORACLE_SQL = """
    WITH t AS (
        SELECT doc_id, lang, LEN(string_split(text, ' ')) AS n_tok
        FROM documents WHERE lang IN ('en', 'fr')
    ),
    par AS (
        SELECT lang,
               (40000.0 * CASE lang WHEN 'en' THEN 1.0 ELSE 3.0 END / 4.0)
                   / CAST(SUM(n_tok) AS DOUBLE) AS e
        FROM t GROUP BY lang
    ),
    joined AS (
        -- pre-join before the unnest: DuckDB's binder cannot carry an
        -- unnest output column out of a SELECT whose FROM is a join
        SELECT t.doc_id, t.lang, t.n_tok,
               CAST(FLOOR(p.e) AS INT) AS n_full,
               p.e - FLOOR(p.e) AS frac
        FROM t JOIN par p USING (lang)
    ),
    ex AS (
        SELECT doc_id, lang, n_tok, n_full, frac,
               unnest(generate_series(0, n_full)) AS epoch
        FROM joined
    )
    SELECT doc_id, lang, n_tok, epoch
    FROM ex
    WHERE epoch < n_full
       OR CAST('0x' || substr(md5('gate:' || lang || ':' ||
              CAST(n_full AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)),
              1, 8) AS BIGINT) / 4294967296.0 < frac
"""

_DOCS_TOKEN_BUDGET_ORACLE_SQL = """
    SELECT 'rate' AS mode, doc_id, lang,
           CAST(NULL AS INT) AS n_tokens, CAST(NULL AS INT) AS n_docs,
           CAST(NULL AS BIGINT) AS first_doc,
           CAST(NULL AS BIGINT) AS last_doc,
           CAST(NULL AS BIGINT) AS tok_sum,
           CAST(NULL AS INT) AS first_token,
           CAST(NULL AS INT) AS last_token
    FROM (%s)
    UNION ALL
    SELECT 'exact', doc_id, lang,
           CAST(NULL AS INT), CAST(NULL AS INT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS INT), CAST(NULL AS INT)
    FROM (%s)
    UNION ALL
    SELECT 'pack', seq_id, CAST(NULL AS VARCHAR),
           n_tokens, n_docs, first_doc, last_doc, tok_sum,
           first_token, last_token
    FROM (%s)
    UNION ALL
    -- the shuffle variant: every pack window re-keyed to its global
    -- md5('gate:'||seq_id) rank (dense, 0-based, id tie-break) — the
    -- independent replay of operators/packing.py shuffle_sequences
    SELECT 'shuffle',
           CAST(row_number() OVER (
               ORDER BY md5('gate:' || CAST(seq_id AS VARCHAR)), seq_id
           ) - 1 AS BIGINT),
           CAST(NULL AS VARCHAR),
           n_tokens, n_docs, first_doc, last_doc, tok_sum,
           first_token, last_token
    FROM (%s)
    UNION ALL
    SELECT 'mix', doc_id, lang,
           CAST(n_tok AS INT), CAST(epoch AS INT),
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS INT), CAST(NULL AS INT)
    FROM (%s)
    ORDER BY mode, doc_id
""" % (
    _DOCS_TOKEN_BUDGET_RATE_ORACLE_SQL,
    _DOCS_TOKEN_BUDGET_EXACT_ORACLE_SQL,
    _DOCS_TOKEN_BUDGET_PACK_ORACLE_SQL,
    _DOCS_TOKEN_BUDGET_PACK_ORACLE_SQL,
    _DOCS_TOKEN_BUDGET_MIX_ORACLE_SQL,
)


# DuckDB replica of q_docs_unigram_logprob: same tokenization, same
# additive smoothing p = (c + 0.5) / (N + 0.5 V), score = mean -ln p.
_DOCS_UNIGRAM_LOGPROB_ORACLE_SQL = """
    WITH tokens AS (
        SELECT doc_id,
               unnest(string_split(LOWER(REPLACE(text, chr(10), ' ')), ' ')) AS tok
        FROM documents
    ),
    tok AS (SELECT doc_id, tok FROM tokens WHERE tok <> ''),
    vocab AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    nv AS (SELECT CAST(SUM(c) AS DOUBLE) AS n, CAST(COUNT(*) AS DOUBLE) AS v
           FROM vocab)
    SELECT t.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           ROUND(AVG(-LN((vo.c + 0.5) / (nv.n + 0.5 * nv.v))), 6)
               AS avg_neg_logprob
    FROM tok t JOIN vocab vo USING (tok) CROSS JOIN nv
    GROUP BY t.doc_id ORDER BY t.doc_id
"""


# the three LM variants' labeled union (column names aligned on both sides)
_DOCS_LM_LOGPROB_ORACLE_SQL = """
    SELECT 'unigram' AS variant, doc_id, n_tokens AS n_units,
           avg_neg_logprob AS score
    FROM (%s)
    UNION ALL
    SELECT 'bigram' AS variant, doc_id, n_bigrams AS n_units,
           avg_neg_logprob2 AS score
    FROM (%s)
    UNION ALL
    SELECT 'kn' AS variant, doc_id, n_bigrams AS n_units,
           avg_neg_logprob2 AS score
    FROM (%s)
    UNION ALL
    SELECT 'kn_heldout' AS variant, doc_id, n_bigrams AS n_units,
           avg_neg_logprob2 AS score
    FROM (%s)
    ORDER BY variant, doc_id
"""


# DuckDB replica of q_docs_dsir_sample: union-vocabulary models from the
# two count tables, per-doc summed log-ratio, the SAME open-interval
# md5-uniform Gumbel draw, top-100 by (weight + gumbel) with doc_id
# tie-break, lang joined back for the selection-concentration evidence.
_DOCS_DSIR_ORACLE_SQL = """
    WITH raw_tok AS (
        SELECT doc_id,
               unnest(string_split(LOWER(REPLACE(text, chr(10), ' ')), ' '))
                   AS tok
        FROM documents
    ),
    rt AS (SELECT doc_id, tok FROM raw_tok WHERE tok <> ''),
    tt AS (
        SELECT t.doc_id, t.tok FROM rt t
        JOIN documents d USING (doc_id) WHERE d.lang = 'fr'
    ),
    rc AS (SELECT tok, COUNT(*) AS cr FROM rt GROUP BY tok),
    tc AS (SELECT tok, COUNT(*) AS ct FROM tt GROUP BY tok),
    vocab AS (
        SELECT COALESCE(rc.tok, tc.tok) AS tok,
               COALESCE(cr, 0) AS cr, COALESCE(ct, 0) AS ct
        FROM rc FULL OUTER JOIN tc ON rc.tok = tc.tok
    ),
    nv AS (SELECT CAST(SUM(ct) AS DOUBLE) AS nt,
                  CAST(SUM(cr) AS DOUBLE) AS nr,
                  CAST(COUNT(*) AS DOUBLE) AS v
           FROM vocab),
    scored AS (
        SELECT t.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               SUM(LN((vo.ct + 0.5) / (nv.nt + 0.5 * nv.v))
                   - LN((vo.cr + 0.5) / (nv.nr + 0.5 * nv.v))) AS w
        FROM rt t JOIN vocab vo USING (tok) CROSS JOIN nv
        GROUP BY t.doc_id
    ),
    keyed AS (
        SELECT doc_id, n_tokens, w,
               w + (-LN(-LN(
                   (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)
                         AS BIGINT) + 0.5) / 4294967296.0
               ))) AS gk
        FROM scored
    ),
    top AS (SELECT * FROM keyed ORDER BY gk DESC, doc_id LIMIT 100)
    SELECT t.doc_id, d.lang, t.n_tokens, ROUND(t.w, 6) AS dsir_logweight
    FROM top t JOIN documents d USING (doc_id)
    ORDER BY t.doc_id
"""


# DuckDB replica of q_docs_remove_repeated_spans: the same planted
# boilerplate, then the duplicated-k-gram construction replayed
# relationally (k = 8): md5 gram digests, HAVING count >= 2, covered
# token = some duplicated-gram start in [t-7, t], rebuild via ordered
# string_agg (an all-tokens-removed doc coalesces to the empty string,
# matching Spark's array_join over an empty filter result).
_DOCS_REMOVE_REPEATED_SPANS_ORACLE_SQL = """
    WITH planted AS (
        SELECT doc_id,
               CASE WHEN doc_id % 4 = 0
                    THEN text ||
                         ' subscribe to our newsletter for updates and offers today'
                    ELSE text END AS text
        FROM documents
    ),
    toks AS (
        SELECT doc_id,
               list_filter(
                   string_split(REPLACE(text, chr(10), ' '), ' '),
                   t -> t <> ''
               ) AS arr
        FROM planted
    ),
    g AS (
        SELECT doc_id, i AS pos,
               md5(array_to_string(arr[i:i+7], ' ')) AS gh
        FROM (SELECT doc_id, arr,
                     unnest(range(1, GREATEST(len(arr) - 7, 0) + 1)) AS i
              FROM toks)
    ),
    dupg AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
    dup_pos AS (SELECT g.doc_id, g.pos FROM g JOIN dupg USING (gh)),
    tokpos AS (
        SELECT doc_id, t, arr[t] AS tok
        FROM (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS t
              FROM toks)
    ),
    kept AS (
        SELECT tp.doc_id, tp.t, tp.tok
        FROM tokpos tp
        WHERE NOT EXISTS (
            SELECT 1 FROM dup_pos dp
            WHERE dp.doc_id = tp.doc_id AND dp.pos BETWEEN tp.t - 7 AND tp.t
        )
    ),
    rebuilt AS (
        SELECT doc_id, COUNT(*) AS n_kept,
               string_agg(tok, ' ' ORDER BY t) AS clean_text
        FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(len(t.arr) AS INT) AS n_tokens_before,
           CAST(len(t.arr) - COALESCE(r.n_kept, 0) AS INT) AS n_tokens_removed,
           md5(COALESCE(r.clean_text, '')) AS clean_md5
    FROM toks t LEFT JOIN rebuilt r USING (doc_id)
    ORDER BY t.doc_id
"""


# merged gate entry for the two LSH serving shapes: adhoc rows carry a
# NULL bucket (they never materialize one), prebucketed rows value-check
# the stored column
def _lsh_merged_oracle_sql() -> str:
    return """
        SELECT 'adhoc' AS variant, vec_id,
               CAST(NULL AS BIGINT) AS lsh_bucket, cosine
        FROM (%s)
        UNION ALL
        SELECT 'prebucketed' AS variant, vec_id, lsh_bucket, cosine
        FROM (%s)
        ORDER BY variant, vec_id
    """ % (_lsh_topk_oracle_sql(), _lsh_prebucketed_oracle_sql())


# DuckDB replica of q_docs_curation_pipeline: replays all ten stages —
# the domain-blocklist stage's closed form is that the planted host cycle
# www.example{(doc_id div 2) % 7}.com makes exactly the pair % 7 == 5
# rows subdomain-match the blocked 'example5.com' (the AMP plant's
# amp.example5.com subdomain included); the robots stage's closed form:
# the example3 hosts' 'Disallow: /item/1' + 'Allow: /item/15' kill whole
# pairs (both members share the path prefix) whose pair number starts
# with '1' but not '15', and the example6 hosts' wildcard
# 'Disallow: /item/*?*gclid=' matches only odd members' query strings,
# so the pair % 7 == 6 cohort's survivor flips to the EVEN member (the
# odd never reaches dedup); the dedup stage's
# closed form is that each (2k, 2k+1) recrawl pair folds
# to one canonical URL and keep='latest' keeps the odd member (plus an
# unpaired trailing even doc, if the table ever ends on one) — for the
# pair % 11 == 4 AMP plants that fold happens ONLY via the declared
# <link rel=canonical> (dedup_key='canonical_hint'), so this unchanged
# closed form is precisely what verifies the hint path: a broken hint
# extraction leaves the AMP even member alive and the hash diverges; the C4
# stage's closed form is that on this single-line brace-free corpus with a
# planted trailing '.' the page survives (with clean == text) iff its
# brace was not planted (doc_id % 17 <> 3); scrub / quality / Gopher /
# repetition / classifier / rate-sampling reuse the verified per-stage
# oracle fragments verbatim, applied in the pipeline's order on the
# pipeline's intermediate text.
def _curation_pipeline_oracle_sql() -> str:
    from sciencebeam_trainer_grobid_tools_spark.operators import pii

    return """
    WITH planted AS (
        SELECT doc_id, lang,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com via 10.0.'
                    || CAST(doc_id %% 256 AS VARCHAR) || '.77 or 555-123-4567.'
                    || CASE WHEN doc_id %% 17 = 3 THEN ' {' ELSE '' END
                   AS text
        FROM documents
    ),
    survivors AS (
        SELECT * FROM planted
        WHERE (doc_id // 2) %% 7 <> 5
          AND NOT ((doc_id // 2) %% 7 = 3
                   AND starts_with(CAST(doc_id // 2 AS VARCHAR), '1')
                   AND NOT starts_with(CAST(doc_id // 2 AS VARCHAR), '15'))
          AND CASE WHEN (doc_id // 2) %% 7 = 6
                   THEN doc_id %% 2 = 0
                   ELSE (doc_id %% 2 = 1
                         OR doc_id + 1 NOT IN (SELECT doc_id FROM documents))
              END
    ),
    c4kept AS (
        SELECT * FROM survivors WHERE doc_id %% 17 <> 3
    ),
    scrubbed AS (
        SELECT doc_id, lang,
               regexp_replace(regexp_replace(regexp_replace(
                   text, '%(email)s', '<EMAIL>', 'g'),
                         '%(ip)s', '<IP>', 'g'),
                         '%(phone)s', '<PHONE>', 'g') AS text
        FROM c4kept
    ),
    quality AS (
        SELECT * FROM scrubbed
        WHERE LENGTH(text) >= 100
          AND ((LENGTH(text) - LENGTH(REPLACE(text, '.', '')))
               + (LENGTH(text) - LENGTH(REPLACE(text, ',', ''))))
              / GREATEST(LENGTH(text), 1) < 0.1
          AND (LENGTH(text) - (LEN(string_split(text, ' ')) - 1))
              / LEN(string_split(text, ' ')) BETWEEN 3 AND 12
    ),
    gwords AS (
        SELECT doc_id, lang, text,
               list_filter(
                   string_split(LOWER(REPLACE(text, chr(10), ' ')), ' '),
                   t -> t <> ''
               ) AS words,
               list_filter(
                   list_transform(string_split(text, chr(10)), l -> TRIM(l)),
                   t -> t <> ''
               ) AS glines
        FROM quality
    ),
    gopher AS (
        SELECT doc_id, lang, text FROM gwords
        WHERE LEN(words) >= 20 AND LEN(words) <= 100000
          AND ROUND(COALESCE(list_sum(list_transform(words, w -> LENGTH(w))), 0)
                    / GREATEST(LEN(words), 1), 6) BETWEEN 3.0 AND 10.0
          AND ROUND(LEN(regexp_extract_all(text, '#|\\.\\.\\.'))
                    / GREATEST(LEN(words), 1), 6) <= 0.1
          AND ROUND(LEN(list_filter(glines,
                        t -> starts_with(t, '-') OR starts_with(t, '*')
                             OR starts_with(t, '•')))
                    / GREATEST(LEN(glines), 1), 6) <= 0.9
          AND ROUND(LEN(list_filter(glines,
                        t -> ends_with(t, '...') OR ends_with(t, '…')))
                    / GREATEST(LEN(glines), 1), 6) <= 0.3
          AND ROUND(LEN(list_filter(words, w -> regexp_matches(w, '[a-z]')))
                    / GREATEST(LEN(words), 1), 6) >= 0.8
          AND (CAST(list_contains(words, 'the') AS INT)
               + CAST(list_contains(words, 'be') AS INT)
               + CAST(list_contains(words, 'to') AS INT)
               + CAST(list_contains(words, 'of') AS INT)
               + CAST(list_contains(words, 'and') AS INT)
               + CAST(list_contains(words, 'that') AS INT)
               + CAST(list_contains(words, 'have') AS INT)
               + CAST(list_contains(words, 'with') AS INT)) >= 1
    ),
    tok AS (
        SELECT doc_id,
               string_split(LOWER(REPLACE(text, chr(10), ' ')), ' ') AS tokens
        FROM gopher
    ),
    grams AS (
        SELECT doc_id,
               unnest(CASE WHEN LEN(tokens) >= 2 THEN
                   [array_to_string(tokens[i:i+1], ' ')
                    for i in range(1, LEN(tokens))]
                 ELSE [array_to_string(tokens, ' ')] END) AS g
        FROM tok
    ),
    cnt AS (SELECT doc_id, g, COUNT(*) AS c FROM grams GROUP BY 1, 2),
    rep AS (
        SELECT doc_id FROM cnt GROUP BY doc_id
        HAVING ROUND(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) / SUM(c), 6)
               <= 0.09
    ),
    kept AS (SELECT q.* FROM gopher q JOIN rep USING (doc_id)),
    clfkeep AS (
        SELECT doc_id FROM (
            SELECT doc_id, SUM(w) / COUNT(*) AS mw
            FROM (
                SELECT doc_id,
                       CAST('0x' || substr(md5('w' || CAST(
                            CAST('0x' || substr(md5(tk), 1, 8) AS BIGINT)
                            %% 64 AS VARCHAR)), 1, 8) AS BIGINT)
                       / 4294967296.0 - 0.5 AS w
                FROM (
                    SELECT doc_id,
                           unnest(list_filter(string_split(
                               LOWER(REPLACE(text, chr(10), ' ')), ' '),
                               t -> t <> '')) AS tk
                    FROM kept
                )
            )
            GROUP BY doc_id
        )
        WHERE 1.0 / (1.0 + EXP(-(0.0 + mw))) >= 0.5
    ),
    kept2 AS (SELECT k.* FROM kept k JOIN clfkeep USING (doc_id)),
    tot AS (
        SELECT lang, CAST(SUM(LEN(string_split(text, ' '))) AS DOUBLE) AS st
        FROM kept2 GROUP BY lang
    ),
    sampled AS (
        SELECT k.doc_id, k.lang, k.text
        FROM kept2 k JOIN tot USING (lang)
        WHERE CAST('0x' || substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8)
                   AS BIGINT) / 4294967296.0
              < LEAST(1.0, 1500.0 / tot.st)
    ),
    -- training_prep variant: reconstruct each survivor's url/host from
    -- its doc_id (the planted construction's closed form), replay the
    -- host_split md5 draw, then an independent per-split prefix sum over
    -- url order gives every document's exact placement in the packed
    -- stream.  Token count under the n_merges=0 tokenizer: per word
    -- len+1 (chars + </w>), plus the <eod> sentinel packing appends.
    prep AS (
        SELECT text,
               CASE WHEN doc_id %% 2 = 1
                    THEN 'http://www.example' || h || '.com/item/' || p
                         || '?ref=rss&gclid=abc'
                    WHEN (doc_id // 2) %% 11 = 4
                    THEN 'http://amp.example' || h || '.com/item/' || p
                         || '/amp'
                    ELSE 'http://WWW.Example' || h || '.COM/item/' || p
                         || '/?utm_source=feed&ref=rss'
               END AS url,
               CASE WHEN doc_id %% 2 = 0 AND (doc_id // 2) %% 11 = 4
                    THEN 'amp.example' || h || '.com'
                    ELSE 'www.example' || h || '.com'
               END AS host
        FROM (SELECT doc_id, text,
                     CAST((doc_id // 2) %% 7 AS VARCHAR) AS h,
                     CAST(doc_id // 2 AS VARCHAR) AS p
              FROM sampled)
    ),
    spl2 AS (
        SELECT text, url,
               CASE WHEN CAST('0x' || substr(md5('split:' || host), 1, 8)
                         AS BIGINT) / 4294967296.0 < 0.8
                    THEN 'train' ELSE 'val' END AS split
        FROM prep
    ),
    plens AS (
        SELECT split, url,
               CAST(COALESCE(list_sum(list_transform(pwords, w -> LENGTH(w))), 0)
                    + LEN(pwords) + 1 AS BIGINT) AS len
        FROM (SELECT split, url,
                     list_filter(string_split(REPLACE(text, chr(10), ' '), ' '),
                                 w -> w <> '') AS pwords
              FROM spl2)
    ),
    poff AS (
        SELECT split, url, len,
               COALESCE(SUM(len) OVER (PARTITION BY split ORDER BY url
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        0) AS off
        FROM plens
    )
    SELECT 'curated' AS variant, doc_id, lang,
           CAST(LEN(string_split(text, ' ')) AS INT) AS n_tokens,
           md5(text) AS curated_md5,
           CAST(NULL AS VARCHAR) AS split, CAST(NULL AS VARCHAR) AS url,
           CAST(NULL AS BIGINT) AS first_seq,
           CAST(NULL AS BIGINT) AS last_seq,
           CAST(NULL AS BIGINT) AS n_windows,
           CAST(NULL AS BIGINT) AS n_toks,
           CAST(NULL AS BIGINT) AS start_in_first
    FROM sampled
    UNION ALL
    SELECT 'training_prep', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS INT), CAST(NULL AS VARCHAR),
           split, url,
           CAST(off // 64 AS BIGINT),
           CAST((off + len - 1) // 64 AS BIGINT),
           CAST((off + len - 1) // 64 - off // 64 + 1 AS BIGINT),
           len,
           CAST(off %% 64 AS BIGINT)
    FROM poff
    ORDER BY variant, doc_id, split, url
    """ % {
        "email": pii.EMAIL_PATTERN,
        "ip": pii.IPV4_PATTERN,
        "phone": pii.PHONE_PATTERN,
    }


# DuckDB replica of q_docs_bigram_logprob: same tokenization as the unigram
# oracle, bigrams via 1-based list indexing over i in [2, len], additive
# smoothing p = (c2 + 0.5) / (c1 + 0.5 V) with V = distinct tokens in any
# bigram position, score = mean -ln p; docs with < 2 tokens drop.
_DOCS_BIGRAM_LOGPROB_ORACLE_SQL = """
    WITH arrs AS (
        SELECT doc_id,
               list_filter(
                   string_split(LOWER(REPLACE(text, chr(10), ' ')), ' '),
                   t -> t <> ''
               ) AS arr
        FROM documents
    ),
    idx AS (
        SELECT doc_id, arr, unnest(range(2, len(arr) + 1)) AS i
        FROM arrs WHERE len(arr) >= 2
    ),
    bg AS (SELECT doc_id, arr[i - 1] AS w1, arr[i] AS w2 FROM idx),
    bcounts AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
    ccounts AS (SELECT w1, SUM(c2) AS c1 FROM bcounts GROUP BY w1),
    vocab AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS v
        FROM (SELECT w1 AS t FROM bcounts UNION SELECT w2 FROM bcounts)
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-LN((bc.c2 + 0.5) / (cc.c1 + 0.5 * vocab.v))), 6)
               AS avg_neg_logprob2
    FROM bg b
    JOIN bcounts bc USING (w1, w2)
    JOIN ccounts cc USING (w1)
    CROSS JOIN vocab
    GROUP BY b.doc_id ORDER BY b.doc_id
"""


# DuckDB replica of q_docs_bigram_kn_logprob: the SAME bigram count table
# as the additive oracle, scored under interpolated Kneser-Ney with
# D=0.75 — max(c2-D,0)/c1 + (D*N1+(w1,*)/c1) * N1+(*,w2)/N1+(*,*); every
# KN statistic is a row-count over bcounts.  The arithmetic repeats the
# Spark expression's association order exactly so ROUND(.,6) agrees.
_DOCS_BIGRAM_KN_ORACLE_SQL = """
    WITH arrs AS (
        SELECT doc_id,
               list_filter(
                   string_split(LOWER(REPLACE(text, chr(10), ' ')), ' '),
                   t -> t <> ''
               ) AS arr
        FROM documents
    ),
    idx AS (
        SELECT doc_id, arr, unnest(range(2, len(arr) + 1)) AS i
        FROM arrs WHERE len(arr) >= 2
    ),
    bg AS (SELECT doc_id, arr[i - 1] AS w1, arr[i] AS w2 FROM idx),
    bcounts AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY w1, w2),
    ccounts AS (
        SELECT w1, SUM(c2) AS c1, COUNT(*) AS n1p_fwd
        FROM bcounts GROUP BY w1
    ),
    cont AS (SELECT w2, COUNT(*) AS n1p_bwd FROM bcounts GROUP BY w2),
    tt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS t FROM bcounts)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-LN(
               GREATEST(bc.c2 - 0.75, 0.0) / cc.c1
               + 0.75 * cc.n1p_fwd / cc.c1 * (co.n1p_bwd / tt.t)
           )), 6) AS avg_neg_logprob2
    FROM bg b
    JOIN bcounts bc USING (w1, w2)
    JOIN ccounts cc USING (w1)
    JOIN cont co USING (w2)
    CROSS JOIN tt
    GROUP BY b.doc_id ORDER BY b.doc_id
"""


# DuckDB replica of q_docs_bigram_kn_heldout: the model trains on the
# even-doc_id half, the odd half is scored through LEFT joins so unseen
# events keep their rows.  pc gains additive OOV mass (s=0.5, one reserved
# OOV type -> denominator T + s*(V2+1)); a seen context interpolates
# max(c2-D,0)/c1 + D*N1+(w1,*)/c1 * pc with c2 coalesced to 0; an unseen
# context backs off fully to pc.  Arithmetic repeats the Spark
# expression's association order exactly so ROUND(.,6) agrees.
_DOCS_BIGRAM_KN_HELDOUT_ORACLE_SQL = """
    WITH arrs AS (
        SELECT doc_id,
               list_filter(
                   string_split(LOWER(REPLACE(text, chr(10), ' ')), ' '),
                   t -> t <> ''
               ) AS arr
        FROM documents
    ),
    tr_idx AS (
        SELECT doc_id, arr, unnest(range(2, len(arr) + 1)) AS i
        FROM arrs WHERE doc_id % 2 = 0 AND len(arr) >= 2
    ),
    tr_bg AS (SELECT arr[i - 1] AS w1, arr[i] AS w2 FROM tr_idx),
    bcounts AS (SELECT w1, w2, COUNT(*) AS c2 FROM tr_bg GROUP BY w1, w2),
    ccounts AS (
        SELECT w1, SUM(c2) AS c1, COUNT(*) AS n1p_fwd
        FROM bcounts GROUP BY w1
    ),
    cont AS (SELECT w2, COUNT(*) AS n1p_bwd FROM bcounts GROUP BY w2),
    stats AS (
        SELECT (SELECT CAST(COUNT(*) AS DOUBLE) FROM bcounts) AS t,
               (SELECT CAST(COUNT(*) AS DOUBLE) FROM cont) AS v2
    ),
    hd_idx AS (
        SELECT doc_id, arr, unnest(range(2, len(arr) + 1)) AS i
        FROM arrs WHERE doc_id % 2 = 1 AND len(arr) >= 2
    ),
    hd_bg AS (SELECT doc_id, arr[i - 1] AS w1, arr[i] AS w2 FROM hd_idx),
    scored AS (
        SELECT b.doc_id,
               CASE WHEN cc.c1 IS NULL THEN
                   (COALESCE(co.n1p_bwd, 0) + 0.5)
                   / (stats.t + 0.5 * (stats.v2 + 1.0))
               ELSE
                   GREATEST(COALESCE(bc.c2, 0) - 0.75, 0.0) / cc.c1
                   + 0.75 * cc.n1p_fwd / cc.c1
                     * ((COALESCE(co.n1p_bwd, 0) + 0.5)
                        / (stats.t + 0.5 * (stats.v2 + 1.0)))
               END AS p
        FROM hd_bg b
        LEFT JOIN bcounts bc USING (w1, w2)
        LEFT JOIN ccounts cc USING (w1)
        LEFT JOIN cont co USING (w2)
        CROSS JOIN stats
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           ROUND(AVG(-LN(p)), 6) AS avg_neg_logprob2
    FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# DuckDB replica of q_docs_pii_scrub: identical planted-PII construction,
# the SAME RE2-compatible pattern strings (operators/pii.py documents the
# dialect constraint), counts via regexp_extract_all and a global ('g')
# regexp_replace chain in the same email -> IP -> phone order.
def _pii_scrub_oracle_sql() -> str:
    from sciencebeam_trainer_grobid_tools_spark.operators import pii

    return """
    WITH planted AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com via 10.0.'
                    || CAST(doc_id %% 256 AS VARCHAR) || '.77 or 555-123-4567'
                   AS text
        FROM documents
    )
    SELECT doc_id,
           CAST(LEN(regexp_extract_all(text, '%(email)s')) AS INT) AS pii_emails,
           CAST(LEN(regexp_extract_all(text, '%(ip)s')) AS INT) AS pii_ipv4,
           CAST(LEN(regexp_extract_all(text, '%(phone)s')) AS INT) AS pii_phones,
           (LEN(regexp_extract_all(text, '%(email)s'))
            + LEN(regexp_extract_all(text, '%(ip)s'))
            + LEN(regexp_extract_all(text, '%(phone)s'))) > 0 AS pii_found,
           md5(regexp_replace(
                 regexp_replace(
                   regexp_replace(text, '%(email)s', '<EMAIL>', 'g'),
                   '%(ip)s', '<IP>', 'g'),
                 '%(phone)s', '<PHONE>', 'g')) AS scrubbed_md5
    FROM planted ORDER BY doc_id
    """ % {
        # DuckDB single-quoted literals do not process backslash escapes,
        # so the pattern strings drop in verbatim
        "email": pii.EMAIL_PATTERN,
        "ip": pii.IPV4_PATTERN,
        "phone": pii.PHONE_PATTERN,
    }


# DuckDB replica of q_emb_ivf_train_step: the same seed/assignment CTEs as
# the topk oracle, then one Lloyd step — per-cell elementwise AVG over the
# assigned vectors, an emptied cell keeping its seed centroid (the same
# deterministic rule ivf_train applies).
_EMB_IVF_TRAIN_STEP_ORACLE_SQL = """
    WITH cent AS (
        SELECT vec_id AS cell, embedding AS cvec,
               SQRT(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS cnorm
        FROM embeddings WHERE vec_id < 8
    ),
    assigned AS (
        SELECT e.vec_id, e.embedding,
               (SELECT c.cell FROM cent c
                ORDER BY list_dot_product(e.embedding::DOUBLE[], c.cvec::DOUBLE[])
                         / (SQRT(list_dot_product(e.embedding::DOUBLE[],
                                                  e.embedding::DOUBLE[]))
                            * c.cnorm) DESC, c.cell
                LIMIT 1) AS ivf_cell
        FROM embeddings e
    ),
    dims AS (SELECT UNNEST(RANGE(64)) AS dim),
    means AS (
        SELECT a.ivf_cell AS cell, d.dim,
               AVG(a.embedding[d.dim + 1]::DOUBLE) AS value
        FROM assigned a CROSS JOIN dims d
        GROUP BY 1, 2
    )
    SELECT CAST(c.cell AS INT) AS cell, CAST(d.dim AS INT) AS dim,
           ROUND(COALESCE(m.value, c.cvec[d.dim + 1]::DOUBLE), 6) AS value
    FROM cent c CROSS JOIN dims d
    LEFT JOIN means m ON m.cell = c.cell AND m.dim = d.dim
    ORDER BY cell, dim
"""


def _lsh_topk_oracle_sql() -> str:
    """DuckDB replica of q_emb_lsh_topk: the seed-42 hyperplanes are inlined
    as literals; buckets, the hamming<=1 probe set and the cosine re-rank
    are recomputed in SQL (dim=64 per TESTDATA.md)."""
    from sciencebeam_trainer_grobid_tools_spark.operators.similarity import (
        random_hyperplanes,
    )

    planes = random_hyperplanes(dim=64, n_planes=8, seed=42)
    plane_rows = ",\n".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join("%.17g" % v for v in plane))
        for i, plane in enumerate(planes)
    )
    return """
        WITH planes(plane_id, plane) AS (VALUES %s),
        buckets AS (
            SELECT e.vec_id, e.embedding,
                   CAST(SUM(
                       CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.plane) >= 0
                            THEN 1 << p.plane_id ELSE 0 END
                   ) AS BIGINT) AS bucket
            FROM embeddings e, planes p
            GROUP BY e.vec_id, e.embedding
        ),
        q AS (
            SELECT b.bucket AS qbucket, e.embedding AS qe
            FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
            WHERE b.vec_id = 0
        ),
        candidates AS (
            SELECT b.vec_id,
                   list_dot_product(b.embedding::DOUBLE[], q.qe::DOUBLE[])
                   / (SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))
                      * SQRT(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))) AS cos
            FROM buckets b, q
            WHERE bit_count(xor(b.bucket, q.qbucket)) <= 1
        )
        SELECT vec_id, ROUND(cos, 4) AS cosine
        FROM candidates
        ORDER BY cos DESC, vec_id
        LIMIT 10
    """ % plane_rows


def _lsh_prebucketed_oracle_sql() -> str:
    """DuckDB replica of q_emb_lsh_prebucketed: identical bucket/probe/re-rank
    math, but the result carries the bucket column so the stored-column
    materialization (add_lsh_bucket) is value-checked too."""
    from sciencebeam_trainer_grobid_tools_spark.operators.similarity import (
        random_hyperplanes,
    )

    planes = random_hyperplanes(dim=64, n_planes=8, seed=42)
    plane_rows = ",\n".join(
        "(%d, [%s]::DOUBLE[])" % (i, ", ".join("%.17g" % v for v in plane))
        for i, plane in enumerate(planes)
    )
    return """
        WITH planes(plane_id, plane) AS (VALUES %s),
        buckets AS (
            SELECT e.vec_id, e.embedding,
                   CAST(SUM(
                       CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.plane) >= 0
                            THEN 1 << p.plane_id ELSE 0 END
                   ) AS BIGINT) AS bucket
            FROM embeddings e, planes p
            GROUP BY e.vec_id, e.embedding
        ),
        q AS (
            SELECT b.bucket AS qbucket, e.embedding AS qe
            FROM buckets b JOIN embeddings e ON e.vec_id = b.vec_id
            WHERE b.vec_id = 0
        ),
        candidates AS (
            SELECT b.vec_id, b.bucket AS lsh_bucket,
                   list_dot_product(b.embedding::DOUBLE[], q.qe::DOUBLE[])
                   / (SQRT(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))
                      * SQRT(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))) AS cos
            FROM buckets b, q
            WHERE bit_count(xor(b.bucket, q.qbucket)) <= 1
        )
        SELECT vec_id, lsh_bucket, ROUND(cos, 4) AS cosine
        FROM candidates
        ORDER BY cos DESC, vec_id
        LIMIT 10
    """ % plane_rows


# DuckDB replica of the full portable MinHash+LSH banding pipeline
# (q_docs_minhash_portable); also the expected-side of the xxhash64-path
# cross-check when restricted to jaccard >= 0.8
def _minhash_portable_sql(num_hashes: int = 8, bands: int = 4) -> str:
    """DuckDB replica of the portable MinHash+LSH banding pipeline at the
    given (num_hashes, bands); rows_per_band = num_hashes // bands."""
    rows_per_band = num_hashes // bands
    seeds = ", ".join(str(i) for i in range(num_hashes))
    band_ids = ", ".join(str(b) for b in range(bands))
    band_key = " || ',' || ".join(
        "sig[%d * b.band + %d]" % (rows_per_band, r + 1)
        for r in range(rows_per_band)
    )
    return """
    WITH tok AS (
        SELECT doc_id,
               string_split(LOWER(REPLACE(text, chr(10), ' ')), ' ') AS tokens
        FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(CASE WHEN LEN(tokens) >= 5 THEN
                   [array_to_string(tokens[i:i+4], ' ')
                    for i in range(1, LEN(tokens) - 5 + 2)]
                 ELSE [array_to_string(tokens, ' ')] END) AS shingles
        FROM tok
    ),
    sig AS (
        SELECT doc_id, shingles,
               [list_aggregate(
                    list_transform(shingles, s -> md5(seed::VARCHAR || ':' || s)),
                    'min')
                for seed in [%(seeds)s]] AS sig
        FROM sh
    ),
    buckets AS (
        SELECT doc_id, b.band AS band,
               md5(%(band_key)s) AS band_key
        FROM sig, (SELECT unnest([%(band_ids)s]) AS band) b
    ),
    pairs AS (
        SELECT DISTINCT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b
        FROM buckets l JOIN buckets r
          ON l.band = r.band AND l.band_key = r.band_key AND l.doc_id < r.doc_id
    )
    SELECT p.doc_id_a, p.doc_id_b,
           ROUND(LEN(list_intersect(a.shingles, b.shingles))
                 / LEN(list_distinct(list_concat(a.shingles, b.shingles))), 6)
               AS jaccard
    FROM pairs p
    JOIN sig a ON a.doc_id = p.doc_id_a
    JOIN sig b ON b.doc_id = p.doc_id_b
    """ % {"seeds": seeds, "band_ids": band_ids, "band_key": band_key}


_MINHASH_PORTABLE_SQL = _minhash_portable_sql(8, 4)

def _trigram_score_sql(pad: str) -> "dict[str, str]":
    """Per-language DuckDB score expressions generated from the SAME
    ``textstats.TRIGRAM_PROFILES`` constants the Spark expression path
    compiles from — identical trigram order (sorted), identical term
    shape ((len diff)/3 * weight), identical left-fold association, so
    the doubles agree bit-for-bit before the ROUND."""
    scores = {}
    for lang, profile in sorted(textstats.TRIGRAM_PROFILES.items()):
        terms = " + ".join(
            "(LENGTH({p}) - LENGTH(REPLACE({p}, '{t}', ''))) / 3 * {w}".format(
                p=pad, t=tri, w=float(w)
            )
            for tri, w in sorted(profile.items())
        )
        scores[lang] = "(({terms}) / GREATEST(LENGTH({p}), 1))".format(
            terms=terms, p=pad
        )
    return scores


def _docs_text_features_sql() -> str:
    pad = "(' ' || LOWER(text) || ' ')"
    score_exprs = _trigram_score_sql(pad)
    langs = sorted(score_exprs)
    inner_scores = ",\n                       ".join(
        "{e} AS s_{l}".format(e=score_exprs[lang], l=lang) for lang in langs
    )
    best = "GREATEST({})".format(", ".join("s_" + lang for lang in langs))
    argmax = "CASE WHEN {m} > 0 THEN CASE {whens} ELSE '{last}' END ELSE 'unknown' END".format(
        m=best,
        whens=" ".join(
            "WHEN s_{l} = {m} THEN '{l}'".format(l=lang, m=best)
            for lang in langs[:-1]
        ),
        last=langs[-1],
    )
    rounded = ",\n                   ".join(
        "ROUND(s_{l}, 6) AS tri_{l}".format(l=lang) for lang in langs
    )
    return """
            SELECT doc_id, lang,
                   CASE
                     WHEN (' ' || LOWER(text) || ' ') LIKE '% der %'
                       OR (' ' || LOWER(text) || ' ') LIKE '% und %'
                       OR (' ' || LOWER(text) || ' ') LIKE '% die %'
                       OR (' ' || LOWER(text) || ' ') LIKE '% nicht %'
                       OR (' ' || LOWER(text) || ' ') LIKE '% das %' THEN 'de'
                     WHEN (' ' || LOWER(text) || ' ') LIKE '% le %'
                       OR (' ' || LOWER(text) || ' ') LIKE '% la %'
                       OR (' ' || LOWER(text) || ' ') LIKE '% les %'
                       OR (' ' || LOWER(text) || ' ') LIKE '% et %'
                       OR (' ' || LOWER(text) || ' ') LIKE '% est %' THEN 'fr'
                     WHEN (' ' || LOWER(text) || ' ') LIKE '% the %'
                       OR (' ' || LOWER(text) || ' ') LIKE '% and %'
                       OR (' ' || LOWER(text) || ' ') LIKE '% of %'
                       OR (' ' || LOWER(text) || ' ') LIKE '% is %'
                       OR (' ' || LOWER(text) || ' ') LIKE '% this %' THEN 'en'
                     ELSE 'unknown'
                   END AS lang_guess,
                   CAST(LEN(string_split(text, ' ')) AS INT) AS ws_tokens,
                   CAST(LEN(regexp_extract_all(text, '\\w+')) AS INT)
                       AS word_tokens,
                   LENGTH(text) AS n_chars_computed,
                   CAST(LEN(regexp_extract_all(dmg, chr(65533))) AS INT)
                       AS replacement_chars,
                   ROUND(LEN(regexp_extract_all(dmg,
                         '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]'))
                         / GREATEST(LENGTH(dmg), 1), 6) AS control_ratio,
                   ROUND(LEN(regexp_extract_all(dmg, '[^\\x00-\\x7f]'))
                         / GREATEST(LENGTH(dmg), 1), 6) AS non_ascii_ratio,
                   ROUND(LEN(regexp_extract_all(dmg, '[0-9]'))
                         / GREATEST(LENGTH(dmg), 1), 6) AS digit_ratio,
                   ROUND(LEN(regexp_extract_all(dmg, '[A-Z]'))
                         / GREATEST(LENGTH(dmg), 1), 6) AS upper_ratio,
                   {argmax} AS lang_trigram,
                   {rounded}
            FROM (
                SELECT *,
                       {inner_scores}
                FROM (
                    SELECT *,
                           CASE WHEN doc_id % 5 = 0 THEN
                               text || ' ' || chr(65533) || chr(1)
                                    || 'Ünïcødé 42 UPPER'
                           ELSE text END AS dmg
                    FROM documents
                )
            )
        """.format(argmax=argmax, rounded=rounded, inner_scores=inner_scores)


def oracle_sql() -> dict[str, str]:
    sqls = {
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   ROUND(SUM(l_quantity), 2) AS sum_qty,
                   ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
                   ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   ROUND(AVG(l_quantity), 4) AS avg_qty,
                   ROUND(AVG(l_discount), 6) AS avg_disc,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_revenue_orders": """
            SELECT o.o_orderkey AS o_orderkey, o.o_orderdate AS o_orderdate,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
            FROM customer c
            JOIN orders o ON c.c_custkey = o.o_custkey
            JOIN lineitem l ON l.l_orderkey = o.o_orderkey
            WHERE c.c_mktsegment = 'MACHINERY'
            GROUP BY o.o_orderkey, o.o_orderdate
            ORDER BY revenue DESC, o_orderkey
            LIMIT 10
        """,
        "region_supplier_volume": """
            SELECT n.n_name AS nation,
                   ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
                   COUNT(*) AS n_lineitems
            FROM region r
            JOIN nation n ON n.n_regionkey = r.r_regionkey
            JOIN supplier s ON s.s_nationkey = n.n_nationkey
            JOIN lineitem l ON l.l_suppkey = s.s_suppkey
            WHERE r.r_name = 'ASIA'
            GROUP BY n.n_name
        """,
        "resume_anti_join": """
            SELECT c_custkey, c_name FROM customer c
            WHERE NOT EXISTS (
                SELECT 1 FROM orders o
                WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
            )
        """,
        "regex_rename_join": """
            SELECT CAST(regexp_extract(c.c_name, '([0-9]+)', 1) AS BIGINT) AS derived_key,
                   COUNT(*) AS n_orders
            FROM customer c
            JOIN orders o ON o.o_custkey = CAST(regexp_extract(c.c_name, '([0-9]+)', 1) AS BIGINT)
            GROUP BY 1
        """,
        "event_sessionization": """
            WITH deltas AS (
                SELECT user_id, ts,
                       CASE WHEN epoch(ts) - epoch(
                                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            ) > 1800 OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                            THEN 1 ELSE 0 END AS new_session
                FROM events
            )
            SELECT user_id,
                   CAST(SUM(new_session) AS BIGINT) AS n_sessions,
                   COUNT(*) AS n_events
            FROM deltas
            GROUP BY user_id
        """,
        "event_majority_vote": """
            SELECT user_id, event_type AS top_event, cnt AS n_events
            FROM (
                SELECT user_id, event_type, COUNT(*) AS cnt,
                       ROW_NUMBER() OVER (
                           PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type
                       ) AS rn
                FROM events GROUP BY user_id, event_type
            ) t WHERE rn = 1
        """,
        "event_hourly_rollup": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n, ROUND(SUM(value), 4) AS total_value
            FROM events GROUP BY 1, 2
        """,
        "events_json_extraction": """
            SELECT event_type, COUNT(*) AS n,
                   CAST(SUM(CAST(props->>'$.k' AS INT)) AS BIGINT) AS k_sum,
                   MAX(CAST(props->>'$.k' AS INT)) AS k_max
            FROM events GROUP BY event_type
        """,
        "levenshtein_check": """
            SELECT c_custkey,
                   levenshtein(c_name, 'Customer#000000000') AS lev,
                   ROUND(1.0 - levenshtein(c_name, 'Customer#000000000')
                         / GREATEST(LENGTH(c_name), 18), 6) AS lev_ratio
            FROM customer
        """,
        "docs_fingerprint_dedup": """
            SELECT 'per_doc' AS variant, doc_id,
                   SUBSTRING(md5(LOWER(REPLACE(text, chr(10), ' '))), 1, 16)
                       AS fingerprint,
                   CAST(NULL AS BIGINT) AS n_docs,
                   CAST(NULL AS BIGINT) AS keep_id
            FROM documents
            UNION ALL
            SELECT 'groups', NULL,
                   md5(LOWER(REPLACE(text, chr(10), ' '))),
                   COUNT(*), MIN(doc_id)
            FROM documents GROUP BY 3
            ORDER BY variant, doc_id, fingerprint
        """,
        "docs_remove_common_lines": """
            WITH planted AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 5 = 0
                            THEN text || chr(10) ||
                                 'copyright example press all rights reserved'
                            ELSE text END AS text
                FROM documents
            ),
            lines AS (
                SELECT doc_id, i AS pos, string_split(text, chr(10))[i] AS line
                FROM (SELECT doc_id, text,
                             unnest(range(1, len(string_split(text, chr(10))) + 1))
                                 AS i
                      FROM planted)
            ),
            common AS (
                SELECT line FROM lines GROUP BY line
                HAVING COUNT(DISTINCT doc_id) >= 2
            ),
            kept AS (
                SELECT l.* FROM lines l
                WHERE NOT EXISTS (SELECT 1 FROM common c WHERE c.line = l.line)
            ),
            rebuilt AS (
                SELECT doc_id, COUNT(*) AS n_kept,
                       string_agg(line, chr(10) ORDER BY pos) AS clean_text
                FROM kept GROUP BY doc_id
            )
            SELECT p.doc_id,
                   CAST(len(string_split(p.text, chr(10))) AS INT)
                       AS n_lines_before,
                   CAST(len(string_split(p.text, chr(10)))
                        - COALESCE(r.n_kept, 0) AS INT) AS n_lines_removed,
                   md5(COALESCE(r.clean_text, '')) AS clean_md5
            FROM planted p LEFT JOIN rebuilt r USING (doc_id)
            ORDER BY p.doc_id
        """,
        # "docs_text_features" is GENERATED below (the trigram-profile
        # fragment derives from textstats.TRIGRAM_PROFILES so the oracle
        # can never drift from the Spark expression's profile)
        "docs_quality": """
            SELECT doc_id,
                   LENGTH(text) AS q_chars,
                   CAST(LEN(string_split(text, ' ')) AS INT) AS q_tokens,
                   ROUND((LENGTH(text) - (LEN(string_split(text, ' ')) - 1))
                         / LEN(string_split(text, ' ')), 4) AS q_mean_word_len,
                   ROUND(((LENGTH(text) - LENGTH(REPLACE(text, '.', '')))
                          + (LENGTH(text) - LENGTH(REPLACE(text, ',', ''))))
                         / GREATEST(LENGTH(text), 1), 6) AS q_punct_ratio,
                   (LENGTH(text) >= 100
                    AND ((LENGTH(text) - LENGTH(REPLACE(text, '.', '')))
                         + (LENGTH(text) - LENGTH(REPLACE(text, ',', ''))))
                        / GREATEST(LENGTH(text), 1) < 0.1
                    AND (LENGTH(text) - (LEN(string_split(text, ' ')) - 1))
                        / LEN(string_split(text, ' ')) >= 3
                    AND (LENGTH(text) - (LEN(string_split(text, ' ')) - 1))
                        / LEN(string_split(text, ' ')) <= 12) AS q_passed
            FROM documents
        """,
        "docs_token_counts": """
            SELECT doc_id,
                   CAST(LEN(string_split(text, ' ')) AS INT) AS ws_tokens,
                   CAST(LEN(regexp_extract_all(text, '\\w+')) AS INT) AS word_tokens,
                   LENGTH(text) AS n_chars_computed
            FROM documents
        """,
        "docs_web_filters": _DOCS_WEB_FILTERS_ORACLE_SQL,

        "docs_ngram_jaccard": """
            WITH shingled AS (
                SELECT doc_id,
                       list_distinct([
                           array_to_string(tokens[i:i+1], ' ')
                           for i in range(1, GREATEST(LEN(tokens) - 1, 0) + 1)
                       ]) AS shingles
                FROM (
                    SELECT doc_id, string_split(LOWER(REPLACE(text, chr(10), ' ')), ' ') AS tokens
                    FROM documents WHERE doc_id < 60
                )
            )
            SELECT l.doc_id AS doc_id_a, r.doc_id AS doc_id_b,
                   ROUND(LEN(list_intersect(l.shingles, r.shingles))
                         / LEN(list_distinct(list_concat(l.shingles, r.shingles))), 6) AS jaccard
            FROM shingled l JOIN shingled r ON l.doc_id < r.doc_id
            WHERE LEN(list_intersect(l.shingles, r.shingles))
                  / LEN(list_distinct(list_concat(l.shingles, r.shingles))) >= 0.05
        """,
        "docs_repetition": _DOCS_REPETITION_ORACLE_SQL,
        "docs_pii_scrub": _pii_scrub_oracle_sql(),
        "docs_winnowing": _winnowing_oracle_sql(),
        "docs_token_budget": _DOCS_TOKEN_BUDGET_ORACLE_SQL,
        "docs_lm_logprob": _DOCS_LM_LOGPROB_ORACLE_SQL
        % (
            _DOCS_UNIGRAM_LOGPROB_ORACLE_SQL,
            _DOCS_BIGRAM_LOGPROB_ORACLE_SQL,
            _DOCS_BIGRAM_KN_ORACLE_SQL,
            _DOCS_BIGRAM_KN_HELDOUT_ORACLE_SQL,
        ),
        "docs_dsir_sample": _DOCS_DSIR_ORACLE_SQL,
        "docs_remove_repeated_spans": _DOCS_REMOVE_REPEATED_SPANS_ORACLE_SQL,
        "docs_curation_pipeline": _curation_pipeline_oracle_sql(),
        "docs_decontaminate": _DOCS_DECONTAMINATE_ORACLE_SQL,
        "emb_lsh": _lsh_merged_oracle_sql(),
        "emb_near_dup_pairs": _emb_near_dup_oracle_sql(),
        "emb_ann_topk": _EMB_ANN_TOPK_ORACLE_SQL
        % (
            _EMB_IVF_ORACLE_SQL,
            _EMB_PQ_ADC_ORACLE_SQL,
            _EMB_IVFPQ_ORACLE_SQL,
        ),
        "emb_ivf_train_step": _EMB_IVF_TRAIN_STEP_ORACLE_SQL,
        "docs_ppl_buckets": _DOCS_PPL_BUCKETS_ORACLE_SQL
        % {
            "unigram": _DOCS_UNIGRAM_LOGPROB_ORACLE_SQL,
            "q1": str(1 / 3),
            "q2": str(2 / 3),
        },
        "docs_simhash": """
            WITH tok AS (
                SELECT doc_id,
                       unnest(string_split(LOWER(REPLACE(text, chr(10), ' ')), ' ')) AS tok
                FROM documents
            ),
            h AS (SELECT doc_id, md5(tok) AS h FROM tok WHERE tok <> ''),
            votes AS (
                SELECT doc_id, j,
                       SUM(CASE WHEN substr(h, j, 1) >= '8' THEN 1 ELSE -1 END) AS v
                FROM h, range(1, 33) t(j)
                GROUP BY doc_id, j
            )
            SELECT doc_id,
                   string_agg(CASE WHEN v > 0 THEN '1' ELSE '0' END, '' ORDER BY j)
                       AS simhash_bits
            FROM votes GROUP BY doc_id
        """,
        # the three variants' labeled union (schemas already aligned);
        # 'clusters' recomputes the components by recursive closure over
        # the symmetric portable pair set — label = MIN reachable id
        "docs_minhash": (
            """
            SELECT 'portable' AS variant, doc_id_a, doc_id_b, jaccard
            FROM (%s)
            UNION ALL
            SELECT 'xxhash_crosscheck' AS variant, doc_id_a, doc_id_b, jaccard
            FROM (SELECT * FROM (%s) WHERE jaccard >= 0.95)
            UNION ALL
            SELECT 'clusters' AS variant, doc_id_a, doc_id_b,
                   CAST(NULL AS DOUBLE) AS jaccard
            FROM (
                WITH RECURSIVE prs AS (%s),
                edges AS (
                    SELECT doc_id_a AS u, doc_id_b AS v FROM prs
                    UNION
                    SELECT doc_id_b, doc_id_a FROM prs
                ),
                reach(src, dst) AS (
                    SELECT u, u FROM (SELECT DISTINCT u FROM edges)
                    UNION
                    SELECT r.src, e.v
                    FROM reach r JOIN edges e ON r.dst = e.u
                )
                SELECT src AS doc_id_a, MIN(dst) AS doc_id_b
                FROM reach GROUP BY src
            )
            ORDER BY variant, doc_id_a, doc_id_b
            """
            % (
                _MINHASH_PORTABLE_SQL,
                _minhash_portable_sql(32, 8),
                _MINHASH_PORTABLE_SQL,
            )
        ),
        "emb_cosine_topk": """
            WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   ROUND(list_dot_product(e.embedding, q.qe)
                         / (SQRT(list_dot_product(e.embedding, e.embedding))
                            * SQRT(list_dot_product(q.qe, q.qe))), 4) AS cosine
            FROM embeddings e, q
            ORDER BY list_dot_product(e.embedding, q.qe)
                     / (SQRT(list_dot_product(e.embedding, e.embedding))
                        * SQRT(list_dot_product(q.qe, q.qe))) DESC, e.vec_id
            LIMIT 10
        """,
        "emb_centroid_family": """
            SELECT 'label_stats' AS variant, label,
                   CAST(NULL AS BIGINT) AS vec_id,
                   COUNT(*) AS n_vectors,
                   ROUND(AVG(embedding[1]), 4) AS c0,
                   ROUND(AVG(SQRT(list_dot_product(embedding, embedding))), 4) AS avg_norm,
                   CAST(NULL AS DOUBLE) AS cosine
            FROM embeddings GROUP BY label
            UNION ALL
            SELECT 'centroid_topk' AS variant, label, vec_id,
                   CAST(NULL AS BIGINT) AS n_vectors,
                   CAST(NULL AS DOUBLE) AS c0,
                   CAST(NULL AS DOUBLE) AS avg_norm,
                   cosine
            FROM (
            WITH flat AS (
                -- dim=64 per TESTDATA.md (same convention as the LSH oracle)
                SELECT e.label, e.vec_id,
                       CAST(r.range AS INT) AS i,
                       e.embedding[CAST(r.range AS INT)] AS v
                FROM embeddings e, range(1, 65) r
            ),
            cent AS (
                SELECT label, i, AVG(v) AS cv FROM flat GROUP BY label, i
            ),
            cos AS (
                SELECT f.label, f.vec_id,
                       SUM(f.v * c.cv)
                           / (SQRT(SUM(f.v * f.v)) * SQRT(SUM(c.cv * c.cv)))
                           AS cosine
                FROM flat f
                JOIN cent c ON f.label = c.label AND f.i = c.i
                GROUP BY f.label, f.vec_id
            )
            SELECT label, vec_id, ROUND(cosine, 4) AS cosine
            FROM (
                SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY label ORDER BY cosine DESC, vec_id
                ) AS rn FROM cos
            )
            WHERE rn <= 5
            )
        """,
        # closed-form replica of the link-graph entry: the synthetic page on
        # host h(doc_id%40).com links to h((3*doc_id+1)%40).com and
        # h((7*doc_id+2)%40).com; DuckDB rebuilds that edge list and unrolls
        # the same three damped iterations (dangling mass dropped, matching
        # the operator's documented convention)
        "hosts_pagerank": """
            WITH raw AS (
                SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) || '.com' AS src,
                       'h' || CAST((doc_id * 3 + 1) % 40 AS VARCHAR) || '.com' AS dst
                FROM documents
                UNION ALL
                SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) || '.com',
                       'h' || CAST((doc_id * 7 + 2) % 40 AS VARCHAR) || '.com'
                FROM documents
            ),
            edges AS (SELECT DISTINCT src, dst FROM raw WHERE src <> dst),
            nodes AS (SELECT src AS host FROM edges
                      UNION SELECT dst FROM edges),
            nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes),
            outdeg AS (SELECT src AS host, CAST(COUNT(*) AS DOUBLE) AS deg
                       FROM edges GROUP BY src),
            r0 AS (SELECT host, 1.0 / (SELECT n FROM nn) AS rank FROM nodes),
            r1 AS (
                SELECT nd.host,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * COALESCE(s.c, 0) AS rank
                FROM nodes nd LEFT JOIN (
                    SELECT e.dst AS host, SUM(r0.rank / od.deg) AS c
                    FROM edges e
                    JOIN r0 ON e.src = r0.host
                    JOIN outdeg od ON od.host = e.src
                    GROUP BY e.dst
                ) s ON nd.host = s.host
            ),
            r2 AS (
                SELECT nd.host,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * COALESCE(s.c, 0) AS rank
                FROM nodes nd LEFT JOIN (
                    SELECT e.dst AS host, SUM(r1.rank / od.deg) AS c
                    FROM edges e
                    JOIN r1 ON e.src = r1.host
                    JOIN outdeg od ON od.host = e.src
                    GROUP BY e.dst
                ) s ON nd.host = s.host
            ),
            r3 AS (
                SELECT nd.host,
                       0.15 / (SELECT n FROM nn)
                           + 0.85 * COALESCE(s.c, 0) AS rank
                FROM nodes nd LEFT JOIN (
                    SELECT e.dst AS host, SUM(r2.rank / od.deg) AS c
                    FROM edges e
                    JOIN r2 ON e.src = r2.host
                    JOIN outdeg od ON od.host = e.src
                    GROUP BY e.dst
                ) s ON nd.host = s.host
            ),
            -- redistribute variant: edge sources restricted to hosts
            -- h0..h29 (docs with doc_id % 40 >= 30 emit no outlinks), so
            -- h30..h39 dangle; each iteration adds d * dangling-mass / N
            raw_d AS (
                SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) || '.com' AS src,
                       'h' || CAST((doc_id * 3 + 1) % 40 AS VARCHAR) || '.com' AS dst
                FROM documents WHERE doc_id % 40 < 30
                UNION ALL
                SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) || '.com',
                       'h' || CAST((doc_id * 7 + 2) % 40 AS VARCHAR) || '.com'
                FROM documents WHERE doc_id % 40 < 30
            ),
            edges_d AS (SELECT DISTINCT src, dst FROM raw_d WHERE src <> dst),
            nodes_d AS (SELECT src AS host FROM edges_d
                        UNION SELECT dst FROM edges_d),
            nn_d AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM nodes_d),
            outdeg_d AS (SELECT src AS host, CAST(COUNT(*) AS DOUBLE) AS deg
                         FROM edges_d GROUP BY src),
            dang_d AS (SELECT host FROM nodes_d
                       WHERE host NOT IN (SELECT host FROM outdeg_d)),
            d0 AS (SELECT host, 1.0 / (SELECT n FROM nn_d) AS rank
                   FROM nodes_d),
            d1 AS (
                SELECT nd.host,
                       0.15 / (SELECT n FROM nn_d)
                           + 0.85 * (COALESCE(s.c, 0)
                               + (SELECT COALESCE(SUM(r.rank), 0)
                                  FROM d0 r JOIN dang_d g ON r.host = g.host)
                                 / (SELECT n FROM nn_d)) AS rank
                FROM nodes_d nd LEFT JOIN (
                    SELECT e.dst AS host, SUM(r.rank / od.deg) AS c
                    FROM edges_d e
                    JOIN d0 r ON e.src = r.host
                    JOIN outdeg_d od ON od.host = e.src
                    GROUP BY e.dst
                ) s ON nd.host = s.host
            ),
            d2 AS (
                SELECT nd.host,
                       0.15 / (SELECT n FROM nn_d)
                           + 0.85 * (COALESCE(s.c, 0)
                               + (SELECT COALESCE(SUM(r.rank), 0)
                                  FROM d1 r JOIN dang_d g ON r.host = g.host)
                                 / (SELECT n FROM nn_d)) AS rank
                FROM nodes_d nd LEFT JOIN (
                    SELECT e.dst AS host, SUM(r.rank / od.deg) AS c
                    FROM edges_d e
                    JOIN d1 r ON e.src = r.host
                    JOIN outdeg_d od ON od.host = e.src
                    GROUP BY e.dst
                ) s ON nd.host = s.host
            ),
            d3 AS (
                SELECT nd.host,
                       0.15 / (SELECT n FROM nn_d)
                           + 0.85 * (COALESCE(s.c, 0)
                               + (SELECT COALESCE(SUM(r.rank), 0)
                                  FROM d2 r JOIN dang_d g ON r.host = g.host)
                                 / (SELECT n FROM nn_d)) AS rank
                FROM nodes_d nd LEFT JOIN (
                    SELECT e.dst AS host, SUM(r.rank / od.deg) AS c
                    FROM edges_d e
                    JOIN d2 r ON e.src = r.host
                    JOIN outdeg_d od ON od.host = e.src
                    GROUP BY e.dst
                ) s ON nd.host = s.host
            ),
            -- anchors variant: skip_nofollow drops style-1 (doc_id%3==1)
            -- 'a' anchors; 'b' anchors always count; texts already
            -- lowercase.  Style-0 pages also carry a mailto: anchor
            -- ('contact') which must NOT appear anywhere (non-http
            -- scheme, dropped before the relative-link fallback);
            -- style-2 pages carry a RELATIVE '/local' anchor ('nav')
            -- which attributes to the page's OWN host
            anch AS (
                SELECT 'h' || CAST((doc_id * 3 + 1) % 40 AS VARCHAR) || '.com'
                           AS host,
                       'a' AS anchor_text
                FROM documents WHERE doc_id % 3 <> 1
                UNION ALL
                SELECT 'h' || CAST((doc_id * 7 + 2) % 40 AS VARCHAR) || '.com',
                       'b'
                FROM documents
                UNION ALL
                SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) || '.com',
                       'nav'
                FROM documents WHERE doc_id % 3 = 2
            ),
            -- split variant: the SAME md5-uniform draw host_split uses
            spl AS (
                SELECT host,
                       CASE WHEN CAST('0x' || substr(
                                md5('split:' || host), 1, 8) AS BIGINT)
                                / 4294967296.0 < 0.8
                            THEN 'train' ELSE 'val' END AS label,
                       COUNT(*) AS n
                FROM (
                    SELECT 'h' || CAST(doc_id % 40 AS VARCHAR) || '.com'
                               AS host
                    FROM documents
                ) GROUP BY host
            )
            SELECT 'standard' AS variant, host, ROUND(rank, 6) AS rank,
                   CAST(NULL AS VARCHAR) AS label,
                   CAST(NULL AS BIGINT) AS n
            FROM r3
            UNION ALL
            SELECT 'redistribute', host, ROUND(rank, 6),
                   CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
            FROM d3
            UNION ALL
            SELECT 'anchors', host, CAST(NULL AS DOUBLE), anchor_text,
                   CAST(COUNT(*) AS BIGINT)
            FROM anch GROUP BY host, anchor_text
            UNION ALL
            SELECT 'split', host, CAST(NULL AS DOUBLE), label,
                   CAST(n AS BIGINT)
            FROM spl
        """,
        "flagship_extract_align": """
            -- closed-form replica of the flagship kernel's summary columns on
            -- the deterministic corpus: extracted lines equal newline-split
            -- text (the html wrapper turns newlines into paragraph breaks and
            -- the extractor strips the nav/script/footer chrome), tokens are
            -- whitespace runs, and the synthesized title (first 8 words,
            -- rendered at offset 0) always aligns: one span, one hit, passed
            SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
                   CAST(LENGTH(string_split(text, chr(10))) AS INT) AS n_lines,
                   CAST(LENGTH(regexp_extract_all(text, '\\S+')) AS INT)
                       AS n_tokens,
                   1 AS n_spans,
                   1 AS alignment_hits,
                   TRUE AS passed
            FROM documents
        """,
        "flagship_title_spans": """
            SELECT doc_id,
                   0 AS span_start,
                   CAST(LENGTH(array_to_string((string_split(text, ' '))[1:8], ' ')) AS INT)
                       AS span_end,
                   array_to_string((string_split(text, ' '))[1:8], ' ') AS span_text
            FROM documents
        """,
        "docs_layout_signals": """
            SELECT d.doc_id,
                   'line_numbers' AS signal,
                   CAST(20 - (SELECT COUNT(*) FROM range(1, 21) r
                              WHERE (d.doc_id + r.range) % 7 = 0) AS INT)
                       AS value
            FROM documents d
            UNION ALL
            SELECT doc_id,
                   'page_headers' AS signal,
                   CAST(3 + doc_id % 3 AS INT) AS value
            FROM documents
        """,
        # closed-form replica of the WARC round-trip: DuckDB rebuilds every
        # header and the payload digest directly from the table (strlen =
        # byte length, matching the builder's octet_length Content-Length)
        "warc_records": """
            SELECT doc_id,
                   0 AS rec_index,
                   'response' AS warc_type,
                   'https://example.org/doc/' || doc_id AS target_uri,
                   '2026-08-17T12:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
                       || ':00Z' AS warc_date,
                   strlen(text) AS content_length,
                   md5(text) AS payload_md5,
                   TRUE AS length_ok
            FROM documents
            UNION ALL
            SELECT doc_id,
                   1 AS rec_index,
                   'metadata' AS warc_type,
                   'https://example.org/doc/' || doc_id AS target_uri,
                   '2026-08-17T12:' || lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0')
                       || ':00Z' AS warc_date,
                   strlen(lang) AS content_length,
                   md5(lang) AS payload_md5,
                   TRUE AS length_ok
            FROM documents
        """,
        "tei_render_roundtrip": """
            SELECT doc_id,
                   array_to_string((string_split(text, ' '))[1:8], ' ') AS tei_title
            FROM documents
        """,
        "docs_segmentation_layout": """
            SELECT doc_id,
                   1 AS front_lines,
                   CAST(8 + doc_id % 5 AS INT) AS body_lines
            FROM documents
        """,
        # closed-form replica of the segmentation chain on the deterministic
        # corpus (see q_flagship_segmentation's docstring for the derivation)
        "flagship_segmentation": """
            WITH lines AS (
                SELECT doc_id,
                       LENGTH(string_split(text, chr(10))) AS n_lines,
                       LENGTH(regexp_extract_all(
                           string_split(text, chr(10))[1], '\\S+')) AS l1
                FROM documents
            )
            SELECT 'doc://' || CAST(doc_id AS VARCHAR) AS url,
                   CAST(CASE WHEN 2 * LEAST(8, l1) >= l1 THEN 1 ELSE 0 END
                        AS INT) AS front_lines,
                   CAST(n_lines
                        - CASE WHEN 2 * LEAST(8, l1) >= l1 THEN 1 ELSE 0 END
                        AS INT) AS body_lines,
                   0 AS reference_lines,
                   CAST(n_lines AS INT) AS n_lines
            FROM lines
        """,
        "media_payload_digests": """
            SELECT doc_id,
                   'image/fake' AS media_type,
                   32 AS n_bytes,
                   sha256(md5(text)) AS digest
            FROM documents
            UNION ALL
            SELECT doc_id,
                   'text/nfc' AS media_type,
                   CAST(strlen(nfc_normalize(
                       substr(text, 1, 40) || 'Cafe' || chr(769) || ' au lait'
                   )) AS INT) AS n_bytes,
                   md5(nfc_normalize(
                       substr(text, 1, 40) || 'Cafe' || chr(769) || ' au lait'
                   )) AS digest
            FROM documents
        """,
        # the complex-matcher path must land the identical spans
        "flagship_title_spans_complex": """
            SELECT doc_id,
                   0 AS span_start,
                   CAST(LENGTH(array_to_string((string_split(text, ' '))[1:8], ' ')) AS INT)
                       AS span_end,
                   array_to_string((string_split(text, ' '))[1:8], ' ') AS span_text
            FROM documents
        """,
        "targets_predicate_extract": """
            SELECT doc_id, field, value FROM (
                SELECT doc_id, 'issn' AS field, 'E' || doc_id AS value FROM documents
                UNION ALL
                SELECT doc_id, 'author', 'Smith' || doc_id || ' John' || doc_id FROM documents
                UNION ALL
                SELECT doc_id, 'author', 'Anon' || doc_id || ' Ano' || doc_id FROM documents
                UNION ALL
                SELECT doc_id, 'keyword', 'kw' || doc_id FROM documents
                UNION ALL
                SELECT doc_id, 'keyword', 'ak' || doc_id FROM documents
                UNION ALL
                SELECT doc_id, 'second_keyword', 'ak' || doc_id FROM documents
                UNION ALL
                SELECT doc_id, 'back_para', 'secpara' || doc_id FROM documents
                UNION ALL
                SELECT doc_id, 'free_para', 'freepara' || doc_id FROM documents
            )
        """,
        "flavor_refseg": """
            SELECT doc_id,
                   doc_id || ' Ref title ' || doc_id || ' words' AS bibl,
                   doc_id::VARCHAR AS label
            FROM documents
        """,
        "flavor_affiliation": """
            SELECT doc_id,
                   doc_id::VARCHAR AS marker,
                   'Institute' || doc_id AS institution,
                   'City' || doc_id AS city,
                   'Country' || doc_id AS country
            FROM documents
        """,
        "flavor_table": """
            SELECT doc_id,
                   'Table ' || doc_id AS label,
                   'Caption text ' || doc_id AS caption
            FROM documents
        """,
        "jats_fix_identifiers": """
            SELECT doc_id,
                   '10.1234/j.x.' || doc_id AS doi,
                   '99' || doc_id AS pmid,
                   'PMC77' || doc_id AS pmcid,
                   'https://doi.org/10.1/a' || doc_id || '|'
                       || 'https://doi.org/10.1/b' || doc_id AS ext_links
            FROM documents
        """,
        "align_exact_spans": """
            -- the kernel masks whitespace before aligning, so a needle's
            -- leading/trailing spaces are outside the matched range
            WITH needles AS (
                SELECT doc_id, text, SUBSTRING(text, 101, 40) AS needle
                FROM documents WHERE n_chars >= 200
            )
            SELECT doc_id,
                   CAST(strpos(text, needle) - 1
                        + (40 - LENGTH(LTRIM(needle))) AS INT) AS span_start,
                   CAST(strpos(text, needle) - 1
                        + LENGTH(RTRIM(needle)) AS INT) AS span_end,
                   needle
            FROM needles
        """,
    }
    sqls["docs_text_features"] = _docs_text_features_sql()
    # merged rewrite-dedup entry: wraps the two standalone replicas
    # verbatim (kept under their own keys for local value-checking)
    sqls["docs_rewrite_dedup"] = (
        "SELECT 'common_lines' AS variant, doc_id,"
        " n_lines_before AS units_before,"
        " n_lines_removed AS units_removed, clean_md5 FROM ("
        + sqls["docs_remove_common_lines"]
        + ") UNION ALL SELECT 'repeated_spans' AS variant, doc_id,"
        " n_tokens_before AS units_before,"
        " n_tokens_removed AS units_removed, clean_md5 FROM ("
        + sqls["docs_remove_repeated_spans"]
        + ")"
    )
    # merged event-window entry: wraps the two standalone replicas
    # verbatim (kept under their own keys for local value-checking)
    sqls["event_windows"] = (
        "SELECT 'majority_vote' AS variant, user_id,"
        " CAST(NULL AS TIMESTAMP) AS hour, top_event AS event_type,"
        " CAST(n_events AS BIGINT) AS n,"
        " CAST(NULL AS DOUBLE) AS total_value FROM ("
        + sqls["event_majority_vote"]
        + ") UNION ALL SELECT 'hourly_rollup' AS variant,"
        " CAST(NULL AS BIGINT) AS user_id, hour, event_type,"
        " CAST(n AS BIGINT) AS n, total_value FROM ("
        + sqls["event_hourly_rollup"]
        + ")"
    )
    # the sitemap-discovery and metadata-extraction legs pin to their
    # planted closed forms: membership doc_id%5<>2 (what the sitemaps
    # list), title 'Doc {id}', declared canonical, og:description —
    # NULL on removed rows (no page fetched in the new crawl)
    sqls["crawl_snapshot_diff"] = """
        SELECT 'https://example.org/page/' || CAST(doc_id AS VARCHAR) AS url,
               CASE WHEN doc_id % 5 = 1 THEN NULL ELSE md5(text) END
                   AS old_fingerprint,
               CASE WHEN doc_id % 5 = 2 THEN NULL
                    WHEN doc_id % 5 = 3 THEN md5(text || 'X')
                    ELSE md5(text) END AS new_fingerprint,
               CASE doc_id % 5
                   WHEN 1 THEN 'added'
                   WHEN 2 THEN 'removed'
                   WHEN 3 THEN 'changed'
                   ELSE 'same' END AS status,
               CASE WHEN doc_id % 5 = 2 THEN NULL
                    ELSE 'Doc ' || CAST(doc_id AS VARCHAR) END AS title,
               CASE WHEN doc_id % 5 = 2 THEN NULL
                    ELSE 'https://example.org/canon/' || CAST(doc_id AS VARCHAR)
                    END AS canonical_decl,
               CASE WHEN doc_id % 5 = 2 THEN NULL
                    ELSE 'd' || CAST(doc_id AS VARCHAR) END AS og_desc
        FROM documents
    """
    # winnowing joins the fingerprint-family entry as a third variant;
    # its generated replica is wrapped verbatim
    sqls["docs_fingerprint_dedup"] = (
        "SELECT * FROM ("
        + sqls["docs_fingerprint_dedup"]
        + ") UNION ALL SELECT 'winnowing' AS variant, doc_id,"
        " CAST(fingerprint AS VARCHAR) AS fingerprint,"
        " CAST(NULL AS BIGINT) AS n_docs, CAST(NULL AS BIGINT) AS keep_id"
        " FROM (" + sqls["docs_winnowing"] + ")"
    )
    sqls["urls_bloom_membership"] = """
        WITH seen AS (
            SELECT 'https://example.org/page/' || CAST(doc_id AS VARCHAR)
                       AS url
            FROM documents WHERE doc_id % 2 = 0
        ),
        pos AS (
            SELECT (CAST('0x' || substr(md5(CAST(t.i AS VARCHAR) || ':' || url),
                         1, 8) AS BIGINT) % 4096) AS p
            FROM seen, (VALUES (0), (1), (2)) t(i)
        ),
        words AS (
            SELECT p // 32 AS w,
                   bit_or(1::BIGINT << CAST(p % 32 AS INT)) AS word
            FROM pos GROUP BY p // 32
        ),
        probes AS (
            SELECT doc_id,
                   'https://example.org/page/' || CAST(doc_id AS VARCHAR)
                       AS url
            FROM documents
        ),
        probe_pos AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5('0:' || url), 1, 8) AS BIGINT)
                       % 4096 AS p0,
                   CAST('0x' || substr(md5('1:' || url), 1, 8) AS BIGINT)
                       % 4096 AS p1,
                   CAST('0x' || substr(md5('2:' || url), 1, 8) AS BIGINT)
                       % 4096 AS p2
            FROM probes
        )
        SELECT doc_id,
               ((COALESCE((SELECT word FROM words WHERE w = p0 // 32), 0)
                 >> CAST(p0 % 32 AS INT)) & 1) = 1
               AND ((COALESCE((SELECT word FROM words WHERE w = p1 // 32), 0)
                 >> CAST(p1 % 32 AS INT)) & 1) = 1
               AND ((COALESCE((SELECT word FROM words WHERE w = p2 // 32), 0)
                 >> CAST(p2 % 32 AS INT)) & 1) = 1 AS in_bloom
        FROM probe_pos
    """
    sqls["robots_policy"] = """
        WITH ks AS (SELECT DISTINCT doc_id % 40 AS k FROM documents),
        rules AS (
            SELECT 'h' || CAST(k AS VARCHAR) || '.com' AS host,
                   0 AS seq, FALSE AS allow,
                   '/d' || CAST(k AS VARCHAR) || '/' AS prefix
            FROM ks
            UNION ALL
            SELECT 'h' || CAST(k AS VARCHAR) || '.com', 1, TRUE,
                   '/d' || CAST(k AS VARCHAR) || '/pub/'
            FROM ks
            UNION ALL
            SELECT 'h' || CAST(k AS VARCHAR) || '.com', 2, FALSE, '/q'
            FROM ks
            UNION ALL
            SELECT 'h' || CAST(k AS VARCHAR) || '.com', 3, FALSE,
                   '/wild*card'
            FROM ks
            UNION ALL
            SELECT 'h' || CAST(k AS VARCHAR) || '.com', 4, FALSE,
                   '/*.pdf$'
            FROM ks
        )
        SELECT 'rule' AS variant, host, seq, allow, prefix,
               CAST(NULL AS BIGINT) AS doc_id,
               CAST(NULL AS VARCHAR) AS url,
               CAST(NULL AS BOOLEAN) AS blocked
        FROM rules
        UNION ALL
        SELECT 'decision',
               'h' || CAST(doc_id % 40 AS VARCHAR) || '.com',
               CAST(NULL AS INT), CAST(NULL AS BOOLEAN),
               CAST(NULL AS VARCHAR),
               doc_id,
               CASE WHEN doc_id % 8 = 6 THEN 'HTTPS://' ELSE 'https://' END
                   || 'h' || CAST(doc_id % 40 AS VARCHAR) || '.com'
                   || CASE doc_id % 8
                      WHEN 0 THEN '/d' || CAST(doc_id % 40 AS VARCHAR) || '/x'
                      WHEN 1 THEN '/d' || CAST(doc_id % 40 AS VARCHAR) || '/pub/x'
                      WHEN 2 THEN '/q?y=1'
                      WHEN 3 THEN '/open'
                      WHEN 4 THEN ''
                      WHEN 5 THEN '/wildAAAcard'
                      WHEN 6 THEN '/file.pdf'
                      ELSE '/file.pdfx' END,
               -- blocked: /d{k}/x (prefix), /q?y=1 (prefix), /wildAAAcard
               -- (the /wild*card pattern), /file.pdf (the anchored /*.pdf$
               -- — served with an UPPERCASE scheme: case-insensitive
               -- scheme parsing must not fail open)
               (doc_id % 8) IN (0, 2, 5, 6)
        FROM documents
    """
    return sqls
