"""Relational operators (SURVEY.md §2.2 filters, §2.4 aggregations,
§2.5 ordering/windows) over the driver-provided tables.

Every function takes ``(spark, sf_dir)`` and returns a DataFrame whose
column names match the paired oracle SQL in ``__spark_entry__.oracle_sql``.
Floating aggregates are rounded to stabilize cross-engine value hashes.

Scale notes are inline per query (broadcast hints for dim tables, partial
aggregation, AQE-friendly shapes).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with partial (map-side) aggregation.
    A1/A4-style rollup analogue (reference document_converter.py:214-223)."""
    li = _read(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.
    The filtered customer segment's broadcast hint is gated on the
    customer table's on-disk size (driver-side stat, no Spark job): under
    the bound it is hinted — the static planner then builds the broadcast
    directly instead of shuffling first and letting AQE promote — and
    above it the optimizer owns the call, degrading to a shuffle join at
    extreme SF; deterministic tiebreaker on the top-k."""
    cust = _read(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    if _parquet_bytes(f"{sf_dir}/customer.parquet") < 64 << 20:
        cust = F.broadcast(cust)
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem")
    # Dim-reduction order: filter orders through the selective customer
    # segment FIRST (~1/5 survive), so the expensive join against the
    # fact table sees a pre-shrunk build side — AQE converts it to a
    # broadcast join when the surviving set is small enough, and at 100 TB
    # it degrades gracefully to a shuffle join on the reduced side.
    building_orders = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    # The surviving BUILDING orders are ~1/5 of the orders table projected
    # to three columns — broadcast-sized far beyond the 10 MB auto
    # threshold's reach (estimates after a join are unreliable, so AQE
    # sometimes leaves this as a sort-merge join that shuffles AND sorts
    # the whole fact table).  Gate the hint on the orders table's on-disk
    # size: under the bound the lineitem side is never shuffled at all;
    # above it (extreme SF) the optimizer owns the call and degrades to
    # the shuffle join.  Measured at sf1.0: SMJ 1.1-4.0 s -> BHJ ~0.6 s.
    if _parquet_bytes(f"{sf_dir}/orders.parquet") < 256 << 20:
        building_orders = F.broadcast(building_orders)
    return (
        li.join(building_orders, li.l_orderkey == building_orders.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def _parquet_bytes(path: str) -> int:
    """On-disk size of a parquet file/directory — a free, exact driver-side
    stat for broadcast decisions (no Spark job, no estimate blow-up).
    Unknown sizes (remote hdfs://s3a:// URIs this local stat can't see,
    or a missing path) return a sentinel LARGER than any broadcast bound,
    so the gate fails safe to "don't hint" — Catalyst/AQE then picks the
    strategy from its own stats instead of being forced into a
    potentially fact-scale broadcast."""
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    if os.path.isdir(path):
        for root, _dirs, files in os.walk(path):
            total += sum(
                os.path.getsize(os.path.join(root, f)) for f in files
            )
    return total if total > 0 else (1 << 62)


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dim star join: constant dims (nation/region) broadcast by
    hint.  The supplier-derived dim SCALES with SF, so its hint is gated
    on the actual on-disk size of the supplier table (cheap driver-side
    stat, not a Spark job): under the broadcast bound it is hinted —
    skipping the shuffle-then-AQE-promote detour whose extra exchange
    materialization cost ~0.3 s at sf0.1 (round-4 regression, plan-
    diffed) — and above the bound it is left to the optimizer, which
    degrades to a shuffle join rather than forcing a fact-scale
    broadcast.  Single shuffle for the agg either way."""
    li = _read(spark, sf_dir, "lineitem")
    supplier = _read(spark, sf_dir, "supplier")
    nation = _read(spark, sf_dir, "nation")
    region = _read(spark, sf_dir, "region")
    dims = (
        supplier.join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "r_name")
    )
    if _parquet_bytes(f"{sf_dir}/supplier.parquet") < 64 << 20:
        dims = F.broadcast(dims)
    return (
        li.join(dims, li.l_suppkey == dims.s_suppkey)
        .groupBy("r_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def f_filters_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1+F2+F3 ingest predicates (temp-file prefix, validity, size cap) with
    quarantine routing flag — pushed down to the parquet scan by Catalyst."""
    docs = _read(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        "n_chars",
        (
            F.col("text").isNotNull()
            & ~F.col("text").startswith("~$")
            & (F.col("n_chars") <= F.lit(50 * 1024 * 1024))
        ).alias("accepted"),
    )


def f4_path_safety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 path-safety validator (reference app/models.py:27-31): a relative
    path must not start with '/' or '\\\\' and must not contain '..'.
    The path column is synthesized deterministically from (source, doc_id)
    — with unsafe variants injected on doc_id strides — because the corpus
    is table-native; the operator under test is the quarantine predicate,
    a pure codegen'd expression that Catalyst can push/reuse anywhere."""
    docs = _read(spark, sf_dir, "documents")
    rel = F.concat(
        F.when(F.col("doc_id") % 101 == 0, F.lit("/")).otherwise(F.lit("")),
        F.col("source"),
        F.lit("/"),
        F.when(F.col("doc_id") % 97 == 0, F.lit("../")).otherwise(F.lit("")),
        F.col("doc_id").cast("string"),
        F.lit(".docx"),
    )
    safe = ~(
        rel.startswith("/") | rel.startswith("\\") | rel.contains("..")
    )
    return docs.select(
        "doc_id", rel.alias("relative_path"), safe.alias("path_safe")
    )


def a4_batch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch status rollup (reference document_converter.py:214-223,257-263):
    completed/failed counters + all-fail->FAILED status per group."""
    ev = _read(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("total"),
        F.sum((F.col("value") > 100).cast("bigint")).alias("completed"),
        F.sum((F.col("value") <= 100).cast("bigint")).alias("failed"),
    )
    return agg.select(
        "event_type",
        "total",
        "completed",
        "failed",
        F.when(F.col("completed") == 0, "FAILED")
        .when(F.col("failed") == 0, "COMPLETED")
        .otherwise("PARTIAL")
        .alias("status"),
    )


def o1_turn_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 stable ordering as a window: first 3 events per user by (ts, id) —
    the sequential-loop order guarantee, distributed."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("user_id", "rn", "event_id", "event_type")
    )


def a6_collision_suffix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 upload-name dedup counter (dependencies.py:52-58) as
    row_number()-suffixed names instead of a probe loop."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        F.format_string(
            "%s_%d", F.col("event_type"), F.row_number().over(w)
        ).alias("unique_name"),
    )


def o3_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (async-task analogue): lag + running sum.
    Two window passes over the same (user_id, ts) sort — one shuffle."""
    ev = _read(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("timestamp").cast("long")  # NTZ-safe, UTC session
    gap = epoch - F.lag(epoch, 1).over(w)
    with_flag = ev.withColumn(
        "new_session", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    return with_flag.select(
        "event_id",
        "user_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )


def hourly_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed rollup (O6 metrics shape)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("hour", "ts").alias("hour"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


def a2_array_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 step-duration sum as a higher-order array aggregate
    (document_converter.py:154): sum over a per-row array column."""
    ev = _read(spark, sf_dir, "events")
    steps = F.array(
        F.round(F.col("value"), 2),
        F.round(F.col("value") * 2, 2),
        F.lit(1.0),
    )
    return ev.select(
        "event_id",
        F.round(
            F.aggregate(steps, F.lit(0.0), lambda acc, x: acc + x), 2
        ).alias("total_duration"),
    )


def s7_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S7 download-one-doc point lookup (routes.py:226-244): predicate
    pushed to the parquet scan (PushedFilters in the physical plan)."""
    docs = _read(spark, sf_dir, "documents")
    return docs.where(F.col("doc_id") == 42).select("doc_id", "lang", "n_chars")


def f5_existence_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5 existence/validity gate (dependencies.py:75-102) as a left ANTI
    join: orders with no lineitems — the 'empty directory -> 404' analogue.
    Also the checkpoint-resume join shape (O2)."""
    orders = _read(spark, sf_dir, "orders")
    li = _read(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        orders.join(li, "o_orderkey", "left_anti")
        .select("o_orderkey", "o_orderstatus")
    )


def set_op_retry_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retry-round result merge (watermark.py:277-279) as unionByName +
    dedup-by-key keeping the latest round (row_number over rounds)."""
    ev = _read(spark, sf_dir, "events")
    round1 = ev.where(F.col("value") <= 100).select(
        "event_id", F.lit(1).alias("round"), F.lit("failed").alias("status")
    )
    round2 = ev.where((F.col("value") <= 100) & (F.col("value") > 30)).select(
        "event_id", F.lit(2).alias("round"), F.lit("completed").alias("status")
    )
    merged = round1.unionByName(round2)
    w = Window.partitionBy("event_id").orderBy(F.col("round").desc())
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("event_id", "round", "status")
    )


def t14_lineage_stamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14 watermark stamp (watermark.py:55-141 '{ts}_AI Race' header) as a
    provenance column: deterministic per-row tag, idempotent by construction
    (re-running produces the same tag -> overwrite-by-key semantics)."""
    ev = _read(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.format_string(
            "%s_AI Race", F.date_format("ts", "yyyy-MM-dd HH.mm.ss")
        ).alias("lineage_tag"),
    )


def rollup_event_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-set rollup over (event_type, hour): subtotals + grand total
    in one pass (partial-agg friendly)."""
    ev = _read(spark, sf_dir, "events")
    return (
        ev.rollup("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def o1_ordered_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-reassembly shape: per-group ordered concatenation
    (collect_list of (ts, id, value) structs -> sort_array -> concat_ws) —
    the distributed form of 'join the turns back in order' that validates
    O1 ordering end-to-end through an aggregation."""
    ev = _read(spark, sf_dir, "events")
    packed = F.sort_array(
        F.collect_list(F.struct("ts", "event_id", "event_type"))
    )
    return ev.groupBy("user_id").agg(
        F.concat_ws(
            "|", F.transform(packed, lambda s: s["event_type"])
        ).alias("event_seq"),
        F.count("*").alias("n_events"),
    )


def s8_delete_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 row-level delete (routes.py:247-265 DELETE endpoint) as a
    copy-on-write anti-join rewrite — how an Iceberg DELETE FROM executes:
    keep every row whose key is not in the delete set."""
    docs = _read(spark, sf_dir, "documents")
    delete_keys = docs.where(F.col("doc_id") % 10 == 0).select("doc_id")
    return (
        docs.join(F.broadcast(delete_keys), "doc_id", "left_anti")
        .select("doc_id", "lang", "n_chars")
    )


def s3_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg ``MERGE INTO`` (upsert) as a copy-on-write rewrite: a staged
    change-set (updates for doc_id%7==0, brand-new rows above the key
    space) merges into documents — matched rows take the source values,
    unmatched targets pass through, unmatched sources insert.

    Plan note: a naive full-outer-join formulation CANNOT broadcast (Spark
    only broadcasts the non-preserved side, and full outer preserves both
    -> forced SortMergeJoin, i.e. a full shuffle of the 100 TB target).
    Decomposed instead as (target LEFT JOIN source -> coalesce) UNION ALL
    (source LEFT ANTI matched) -- identical semantics -- where every hash
    table Spark builds is bounded by the CHANGE-SET size, never the target:

    * the upsert branch broadcasts ``source`` onto the streamed target;
    * the insert branch does NOT anti-join source against the target's key
      set (broadcasting 10^12 keys = driver OOM).  Instead ``matched`` =
      target INNER JOIN broadcast(source_keys) -- a map-side probe over the
      streamed target whose OUTPUT is <= |source| -- and the anti join
      broadcasts that small matched-key set.  The target table is only ever
      the streamed/probe side; it never sorts, shuffles, or becomes a
      broadcast build side.

    With the bucket layout from ``extractor.checkpoint`` the rewrite then
    touches only buckets containing matched/inserted keys (dynamic
    partition overwrite), not the whole table."""
    docs = _read(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    updates = docs.where(F.col("doc_id") % 7 == 0).select(
        "doc_id",
        F.lit("xx").alias("lang"),
        (F.col("n_chars") + 1).alias("n_chars"),
    )
    inserts = docs.where(F.col("doc_id") % 13 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.lit("new").alias("lang"),
        F.lit(0).alias("n_chars"),
    )
    source = updates.unionByName(inserts)
    t, s = docs.alias("t"), F.broadcast(source).alias("s")
    upserted = t.join(s, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("s.lang"), F.col("t.lang")).alias("lang"),
        F.coalesce(F.col("s.n_chars"), F.col("t.n_chars")).alias("n_chars"),
    )
    # Matched keys via a broadcast of the *change-set* keys probed against
    # the streamed target: output cardinality <= |source|, so broadcasting
    # it back for the anti join is safe at any target scale.
    matched = docs.select("doc_id").join(
        F.broadcast(source.select("doc_id")), "doc_id"
    )
    inserted = source.join(F.broadcast(matched), "doc_id", "left_anti")
    return upserted.unionByName(inserted)


def snapshot_diff_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level snapshot diff — the Iceberg changelog/CDC read
    (``table_changes`` between snapshots) expressed as a relational op:
    classify every key as inserted / deleted / updated between two table
    states and emit the change rows.  Complements ``changed_buckets``
    (bucket-granular fingerprint diff for incremental runs) when the
    consumer needs the actual row deltas.

    The "new" snapshot is synthesized deterministically from the old one
    (delete every 97th doc, rewrite text of every 31st, insert a shifted
    id range), so DuckDB rebuilds both sides bit-for-bit.

    Plan: one full-outer equi join on the key, change class from null-side
    and content-hash comparison — the join shuffles both sides by key once
    (sort-merge at fact scale), no broadcast of anything unbounded; at
    10^12 rows the same diff runs bucket-parallel after
    ``changed_buckets`` prunes untouched buckets (two-level: cheap
    fingerprints first, row join only on changed buckets)."""
    old = _read(spark, sf_dir, "documents").select("doc_id", "text")
    new = (
        old.where(F.pmod(F.col("doc_id"), F.lit(97)) != 0)
        .select(
            "doc_id",
            F.when(
                F.pmod(F.col("doc_id"), F.lit(31)) == 0,
                F.concat(F.lit("rewritten: "), F.substring("text", 1, 40)),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            old.where(F.pmod(F.col("doc_id"), F.lit(113)) == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    o = old.select("doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("h_old"))
    n = new.select("doc_id", F.md5(F.coalesce("text", F.lit(""))).alias("h_new"))
    joined = o.join(n, "doc_id", "full_outer")
    change = (
        F.when(F.col("h_old").isNull(), "insert")
        .when(F.col("h_new").isNull(), "delete")
        .when(F.col("h_old") != F.col("h_new"), "update")
        .otherwise("unchanged")
    )
    return (
        joined.select("doc_id", change.alias("change"), "h_old", "h_new")
        .where(F.col("change") != "unchanged")
    )


def morton_key(x, y, bits: int = 16):
    """Interleaved-bit (Morton / Z-order) key of two non-negative integer
    columns: x's bit i lands at position 2i, y's at 2i+1.  Pure integer
    expressions — codegen'd, map-only, engine-exact."""
    return sum(
        (
            (F.shiftright(x, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
            + (F.shiftright(y, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
        )
        for i in range(bits)
    )


def zorder_key(spark: SparkSession, sf_dir: str, bits: int = 16) -> DataFrame:
    """Z-order (Morton) clustering key over two dimensions — the layout
    optimization behind OPTIMIZE ZORDER BY / Iceberg sort orders: rows
    sorted by the interleaved-bit key cluster locally in BOTH dimensions,
    so min/max file stats prune scans filtered on either column.

    Pure integer bit math (sum over bit positions of shifted masks), so
    the oracle reproduces it exactly; computing the key is map-only, and
    the range-partitioned write that would consume it (``repartitionByRange
    (z_key).sortWithinPartitions(z_key)``) is one shuffle at any scale."""
    ev = _read(spark, sf_dir, "events")
    x = F.pmod(F.col("user_id"), F.lit(1 << bits))
    y = F.pmod(F.col("event_id"), F.lit(1 << bits))
    z = morton_key(x, y, bits)
    return ev.select(
        "event_id",
        "user_id",
        x.cast("long").alias("x_dim"),
        y.cast("long").alias("y_dim"),
        z.cast("long").alias("z_key"),
    )


def salted_skew_join(
    spark: SparkSession, sf_dir: str, salt_buckets: int = 8
) -> DataFrame:
    """Explicit key-salting for a skewed equi join — the classic hot-key
    topology for joining a fact table on a low-cardinality / Zipf key
    (per-domain stats onto a web corpus, per-language models onto mixed
    text) when the build side is too large to broadcast and a handful of
    keys dominate.

    Fact rows get ``salt = pmod(xxhash64(doc_id), K)``; the build side
    replicates each row K times (``explode(sequence(0, K-1))``); the join
    key becomes (key, salt), so a hot key spreads over K tasks instead of
    one straggler.  The output is provably identical to the unsalted join
    — the DuckDB oracle runs the plain join.  A ``shuffle_hash`` hint pins
    the shuffle topology the pattern exists for (at fixture scale the tiny
    build side would otherwise broadcast and no salt would be needed —
    which is also the right call when it fits; salting is for when it
    doesn't).  AQE's skewJoin splits oversized shuffle blocks at runtime
    too; explicit salting additionally balances any downstream
    aggregation that inherits the (key, salt) distribution."""
    docs = _read(spark, sf_dir, "documents")
    dim = docs.groupBy("lang").agg(
        F.count("*").alias("lang_docs"),
        F.sum("n_chars").alias("lang_chars"),
    )
    salted_dim = dim.select(
        "lang",
        "lang_docs",
        "lang_chars",
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))).alias("salt"),
    )
    fact = docs.select("doc_id", "lang", "n_chars").withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.lit(salt_buckets)).cast("int")
    )
    return (
        fact.join(salted_dim.hint("shuffle_hash"), ["lang", "salt"])
        .select(
            "doc_id",
            "lang",
            "lang_docs",
            F.round(F.col("n_chars") / F.col("lang_chars"), 6).alias(
                "char_share"
            ),
        )
    )


def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential-pattern funnel (MATCH_RECOGNIZE analogue): per user the
    earliest view, the earliest click strictly AFTER that view, and the
    earliest purchase strictly after that click — plus the reached stage.
    Ties on the earliest timestamp resolve identically in both engines
    (min over ts, ties collapse).

    Plan at scale: each stage is a pushed-down type filter → map-side-
    combined min-agg keyed on user_id; the stage joins are equi-joins on
    user_id whose right side shrinks monotonically (stage-2 users ⊆
    stage-1 users), and AQE broadcast-promotes the survivors as the funnel
    narrows.  No windows over raw events, no per-user sorting."""
    ev = _read(spark, sf_dir, "events")
    v = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.where(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.where(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .otherwise(1)
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "t_view",
            "t_click",
            "t_purchase",
            stage.cast("int").alias("funnel_stage"),
        )
    )


def percentile_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentile aggregation (latency-metrics shape, O6 family):
    continuous-interpolation p50/p90/p99 per group — bit-identical to
    DuckDB's quantile_cont."""
    ev = _read(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99"),
        F.count("*").alias("n"),
    )


def pivot_event_hours(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event counts per type across day-of-month columns — the
    conditional-aggregation form every pivot compiles to (one shuffle)."""
    ev = _read(spark, sf_dir, "events")
    days = [1, 2, 3, 4, 5]
    return (
        ev.withColumn("day", F.dayofmonth("ts"))
        .groupBy("event_type")
        .pivot("day", days)
        .count()
        .na.fill(0, [str(d) for d in days])
        .select(
            "event_type",
            *[F.col(str(d)).alias(f"d{d}") for d in days],
        )
    )


def argmax_latest_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arg-max aggregation: each user's latest event type + its value.
    Deterministic composite key packed into one bigint ((ts µs since the
    corpus epoch) * 1e5 + event_id) so Spark max_by and DuckDB arg_max
    agree even on tied timestamps."""
    ev = _read(spark, sf_dir, "events")
    ev = ev.withColumn(
        "ord_key",
        (F.unix_micros(F.col("ts").cast("timestamp")) - F.lit(1704067200000000))
        * 100000
        + F.col("event_id"),
    )
    return ev.groupBy("user_id").agg(
        F.expr("max_by(event_type, ord_key)").alias("last_type"),
        F.round(F.expr("max_by(value, ord_key)"), 2).alias("last_value"),
        F.max("ts").alias("last_ts"),
    )


GDPR_COND = "substr(md5(CAST(concat('gdpr:', CAST(doc_id AS STRING)) AS BINARY)), 1, 1) < '4'"


def gdpr_delete_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten cascade audit: given a deletion request set
    (here a deterministic md5 sample of doc_ids), report — per table in
    the lineage fan-out (documents, derived chunks, embeddings) — how
    many rows the cascade removes and how many survive.  This is the
    governance companion to ``s8_delete_rewrite``: S8 proves one
    table's copy-on-write rewrite; this op proves the REQUEST PROPAGATES
    to every derived artifact (the compliance question auditors actually
    ask: "is the user gone from the chunk store and the vector index
    too?").

    Scale shape: the deletion set is broadcast (GDPR batches are small
    relative to any corpus — swap for a left-semi shuffle join if not);
    each table is audited in ONE scan via a broadcast left join +
    conditional count (no second anti-join pass: rows_after =
    rows_before − rows_deleted certified by the same join).  The three
    1-row audit frames union into one plan; nothing is collected.

    Output: ``(table_name, rows_before, rows_deleted, rows_after)``."""
    from extractor.ops.dedup import chunk_documents

    docs = _read(spark, sf_dir, "documents")
    delset = (
        docs.where(F.expr(GDPR_COND))
        .select("doc_id", F.lit(1).alias("_del"))
    )
    emb = _read(spark, sf_dir, "embeddings").select(
        F.col("vec_id").cast("long").alias("doc_id")
    )
    audited = {
        "documents": docs.select("doc_id"),
        "chunks": chunk_documents(spark, sf_dir).select("doc_id"),
        "embeddings": emb,
    }
    outs = []
    for name, df in audited.items():
        j = df.join(F.broadcast(delset), "doc_id", "left")
        outs.append(
            j.agg(
                F.count(F.lit(1)).cast("long").alias("rows_before"),
                F.count("_del").cast("long").alias("rows_deleted"),
            ).select(
                F.lit(name).alias("table_name"),
                "rows_before",
                "rows_deleted",
                (F.col("rows_before") - F.col("rows_deleted"))
                .cast("long")
                .alias("rows_after"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def referential_integrity_audit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Warehouse foreign-key health check: for each FK edge of the
    schema, how many child rows dangle (no parent) — the audit every
    ingest pipeline runs before trusting joins, because a broken FK
    silently DROPS rows from inner-join analytics (revenue vanishes
    rather than erroring).  Checked edges: orders→customer,
    lineitem→orders, customer→nation, supplier→nation, nation→region.

    Scale shape: one broadcast-or-shuffle left join per edge (parent
    side deduplicated to its key column first, so the build side is
    key-cardinality, not row-cardinality) + a conditional count — the
    same single-scan audit shape as ``gdpr_delete_cascade``; five tiny
    1-row frames union into one plan.

    Output: ``(fk_edge, n_child_rows, n_orphans, orphan_ppm)`` —
    parts-per-million in BIGINT so the oracle is division-exact."""
    edges = [
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    outs = []
    for name, child, ck, parent, pk in edges:
        c = _read(spark, sf_dir, child).select(F.col(ck).alias("k"))
        p = (
            _read(spark, sf_dir, parent)
            .select(F.col(pk).alias("k"))
            .distinct()
            .withColumn("_hit", F.lit(1))
        )
        j = c.join(F.broadcast(p), "k", "left")
        outs.append(
            j.agg(
                F.count(F.lit(1)).cast("long").alias("n_child_rows"),
                (F.count(F.lit(1)) - F.count("_hit"))
                .cast("long")
                .alias("n_orphans"),
            ).select(
                F.lit(name).alias("fk_edge"),
                "n_child_rows",
                "n_orphans",
                F.expr("n_orphans * 1000000 DIV n_child_rows")
                .cast("long")
                .alias("orphan_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


def pareto_frontier(
    spark: SparkSession, sf_dir: str, bucket_width: int = 256
) -> DataFrame:
    """Skyline / Pareto-frontier query over the document corpus: the set
    of (x, y) points not DOMINATED by any other point (q dominates p iff
    q.x >= p.x, q.y >= p.y and q is strictly better on at least one
    axis).  Axes here: x = n_chars (length), y = an md5-derived utility
    score in ppm (the repo's keyed-uniform primitive, so the frontier is
    deterministic and engine-exact) — the classic multi-objective
    curation question "longest documents at every utility level".

    Scale shape — the naive skyline is an O(n²) self-join; this is the
    two-level decomposition (same pattern as ``pack_sequences``'s
    distributed prefix sum):

    1. collapse to DISTINCT points with multiplicity (one shuffle);
    2. bucket by ``x DIV bucket_width``; per-bucket max-y (map-side
       combined) → a suffix-max over the ≤ max_x/bucket_width bucket
       rows via a single-partition window over that TINY relation only
       (never the data);
    3. broadcast the per-bucket "best y in any strictly-higher bucket"
       back; in-bucket dominance is a bucket-partitioned running max
       over (x desc, y desc) — every window is bucket-scoped.

    A point survives iff its y strictly exceeds both the cross-bucket
    suffix max and its in-bucket predecessor max (with distinct points,
    "some predecessor has y >= mine" is exactly "I am dominated").

    Output: frontier ``(x, y, n_docs)`` ordered by x desc."""
    docs = _read(spark, sf_dir, "documents")
    y = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit("pareto:"), F.col("doc_id").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 1000000
    )
    pts = (
        docs.select(F.col("n_chars").cast("long").alias("x"), y.alias("y"))
        .groupBy("x", "y")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .withColumn("bx", F.expr(f"x DIV {bucket_width}"))
    )
    bmax = pts.groupBy("bx").agg(F.max("y").alias("by"))
    w_suffix = Window.orderBy(F.desc("bx")).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # single-partition window: ONLY over the <= max_x/bucket_width
    # bucket-summary rows, never the point data (two-level contract)
    suffix = bmax.coalesce(1).select(
        "bx", F.max("by").over(w_suffix).alias("hi")
    )
    w_bucket = (
        Window.partitionBy("bx")
        .orderBy(F.desc("x"), F.desc("y"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        pts.join(F.broadcast(suffix), "bx", "left")
        .withColumn("prev", F.max("y").over(w_bucket))
        .where(
            (F.col("y") > F.coalesce(F.col("hi"), F.lit(-1)))
            & (F.col("y") > F.coalesce(F.col("prev"), F.lit(-1)))
        )
        .select("x", "y", "n_docs")
        .orderBy(F.desc("x"))
    )


K_ANON_K = 5  # minimum group size for a quasi-identifier cell


def k_anonymity_audit(spark: SparkSession, sf_dir: str,
                      k: int = K_ANON_K) -> DataFrame:
    """k-anonymity audit over the events table — the privacy gate run
    before releasing activity data: a quasi-identifier cell (here
    ``(event_type, day, hour)``) occupied by fewer than *k* distinct
    users is a re-identification risk (an attacker who knows someone
    acted in that cell pins them to < k candidates).  Complements the
    direct-identifier ops (``pii_redact``, ``gdpr_delete_cascade``):
    k-anonymity is about what the REMAINING columns still leak.

    Scale shape: pre-aggregate to (cell, user) so reducer keys stay
    user-bounded (the ``retention_cohorts`` trick), then ONE cell
    rollup; both aggregates map-side combine.  Output is violating
    cells only — bounded by the cell lattice, not the event count.

    Output: ``(event_type, day, hour, n_users, n_rows)`` for cells with
    ``n_users < k``."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.dayofmonth("ts").alias("day"),
        F.hour("ts").alias("hour"),
        "user_id",
    )
    per_user = ev.groupBy("event_type", "day", "hour", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    cells = per_user.groupBy("event_type", "day", "hour").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.sum("n").cast("long").alias("n_rows"),
    )
    return cells.where(F.col("n_users") < k).select(
        "event_type",
        F.col("day").cast("long").alias("day"),
        F.col("hour").cast("long").alias("hour"),
        "n_users",
        "n_rows",
    )


def ab_experiment_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout with the two checks every experimentation
    platform runs, in exact integers: (1) sample-ratio mismatch — the
    χ² of the observed variant split against the designed 50/50 (the
    #1 silent-corruption detector: a biased assignment invalidates the
    whole test before any metric is read); (2) the treatment lift on
    revenue-per-user, computed as the exact cross-product ratio
    ``(sum_t·n_c − sum_c·n_t)·10⁶ / (sum_c·n_t)`` so no float division
    ever runs.

    Variant assignment is the engine's keyed-uniform primitive on
    user_id ("exp:" salt) — stable under traffic growth, exactly like
    every sampling op.  The per-user metric is total event value in
    cents.

    Scale shape: one (user) pre-aggregate (map-side combined), one
    2-row variant rollup, a 1×1 join — nothing after the user rollup
    touches data.

    Output: one row ``(n_control, n_treatment, srm_chi2_micro,
    sum_control_cents, sum_treatment_cents, lift_ppm)``."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "user_id", F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents")
    )
    variant = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("exp:"), F.col("user_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 2
    )
    per_user = ev.groupBy("user_id").agg(F.sum("cents").alias("cents"))
    v = per_user.select(variant.alias("v"), "cents").groupBy("v").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("cents").cast("long").alias("s"),
    )
    return v.agg(
        F.sum(F.when(F.col("v") == 0, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_control"),
        F.sum(F.when(F.col("v") == 1, F.col("n")).otherwise(0))
        .cast("long")
        .alias("n_treatment"),
        F.sum(F.when(F.col("v") == 0, F.col("s")).otherwise(0))
        .cast("long")
        .alias("sum_control_cents"),
        F.sum(F.when(F.col("v") == 1, F.col("s")).otherwise(0))
        .cast("long")
        .alias("sum_treatment_cents"),
    ).select(
        "n_control",
        "n_treatment",
        F.expr(
            "(n_control - n_treatment) * (n_control - n_treatment)"
            " * 1000000 DIV (n_control + n_treatment)"
        ).cast("long").alias("srm_chi2_micro"),
        "sum_control_cents",
        "sum_treatment_cents",
        F.expr(
            "(sum_treatment_cents * n_control"
            " - sum_control_cents * n_treatment) * 1000000"
            " DIV (sum_control_cents * n_treatment)"
        ).cast("long").alias("lift_ppm"),
    )


BANDIT_ARMS = ("click", "view", "purchase", "signup", "error")


def bandit_replay_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline policy evaluation by the REPLAY method (Li et al. 2011,
    WSDM — the unbiased offline evaluator for contextual bandits):
    score a CANDIDATE policy against logged interaction data by
    keeping exactly the logged rows where the policy's chosen arm
    matches the logged arm, and averaging their rewards.  Unbiased
    when logging was uniform-random over arms; the match-rate column
    makes the effective sample size auditable.  This is how
    recommendation / routing policies are evaluated before any online
    test.

    Deterministic modeling on the events axis: context = user_id % 10,
    logged arm = event_type, reward = value in cents; the candidate
    policy maps each context to an arm via the keyed-uniform md5 draw
    ("policy:" salt) — a pure column function, no policy table join.

    Exact integers: per-context match counts, matched-reward sums,
    and the mean reward in micro-cents by floor division.

    Scale shape: ONE map-side-combined aggregate over the logged
    stream (the policy evaluation is a filtered rollup — nothing else
    moves); contexts are the only reducer keys.

    Output: ``(context, n_logged, n_matched, match_ppm,
    sum_matched_cents, mean_reward_microcents)``."""
    arms = F.array(*[F.lit(a) for a in BANDIT_ARMS])
    policy_arm = F.element_at(
        arms,
        (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit("policy:"),
                            (F.col("user_id") % 10).cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % len(BANDIT_ARMS)
        ).cast("int")
        + 1,
    )
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        (F.col("user_id") % 10).alias("context"),
        F.col("event_type").alias("logged_arm"),
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("cents"),
        policy_arm.alias("policy_arm"),
    )
    matched = F.col("logged_arm") == F.col("policy_arm")
    return (
        ev.groupBy("context")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_logged"),
            F.sum(matched.cast("long")).cast("long").alias("n_matched"),
            F.sum(F.when(matched, F.col("cents")).otherwise(0))
            .cast("long")
            .alias("sum_matched_cents"),
        )
        .select(
            F.col("context").cast("long").alias("context"),
            "n_logged",
            "n_matched",
            F.expr("n_matched * 1000000 DIV n_logged").cast("long").alias(
                "match_ppm"
            ),
            "sum_matched_cents",
            F.expr(
                "CASE WHEN n_matched > 0 THEN"
                " sum_matched_cents * 1000000 DIV n_matched ELSE 0 END"
            ).cast("long").alias("mean_reward_microcents"),
        )
    )


def metric_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-sufficient-statistics Pearson correlation between two
    event metrics (value in cents × hour of day) per event type — the
    metric-relationship profile behind "does revenue correlate with
    time of day", computed the engine-exact way: the five sums are
    exact bigints, the only floats are two correctly-rounded sqrts and
    one division (the ``wilson_source_ranking`` recipe), and the
    result rounds once to micro-units.  Conversions bigint→double are
    IEEE round-to-nearest in both engines, so the value hash-matches
    even where the intermediate exceeds 2^53.

    Scale shape: ONE map-side-combined aggregate to event-type
    cardinality; nothing else moves.  (At extreme row counts the raw
    sums outgrow int64 — swap the sum columns to DECIMAL(38,0), same
    plan.)

    Output: ``(event_type, n, corr_micro)`` plus the raw sums for
    audit."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type",
        F.expr("CAST(round(value * 100) AS BIGINT)").alias("x"),
        F.hour("ts").cast("long").alias("y"),
    )
    a = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    corr = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        / (
            F.sqrt(F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
            * F.sqrt(F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
        )
        * F.lit(1_000_000)
    ).cast("long")
    return a.select(
        "event_type", "n", "sx", "sy", "sxy", corr.alias("corr_micro")
    )
