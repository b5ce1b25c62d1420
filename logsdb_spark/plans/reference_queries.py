"""Reference-parity queries (SURVEY.md §2) over the driver testdata.

The testdata analogue mapping (FIXTURES.md §3): ``events`` plays the
timestamped log fact (apache_access / authfail), TPC-H dims play the
mail-contact dims. Every query here cites the reference operator it
re-expresses (file:line into /root/reference/src/logsdb/).

Determinism: the reference's 24 h window is ``now() - 1 day``
(core.py:60-61); here "now" is anchored at max(ts) of the fact so the
DuckDB oracle sees the identical window on static parquet.

Double-typed aggregates are rounded to 4 dp on BOTH sides so the
order-insensitive value hash is stable across engines; counts stay
BIGINT on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.scalars import email_domain, longint
from ..operators.silver import last_day_silver
from ..operators.windows import last_day_table
from ..registry import register

# ---------------------------------------------------------------------------
# A1 — hash-agg "top requests" (apache_access.py:59-70)
# SELECT reqline, COUNT(*) qty, SUM(bytesin), SUM(bytesout) ... GROUP BY
# reqline ORDER BY qty DESC, reqline — analogue: events by event_type.
# Scale: partial (map-side) + final hash agg; low-cardinality group key
# so the shuffle moves only |distinct keys| * partitions rows.
#
# DEFAULT ROUTING (round 5): every P2 windowed query below reads the
# DATE-PARTITIONED silver layout (operators/silver.last_day_silver) —
# the daily window prunes day-directories via PartitionFilters, the
# production plan at 100 TB where the reference leans on PostgreSQL's
# index (core.py:60-61) and we lean on layout. One explicitly-named
# ``a1_top_event_types_monolithic`` baseline keeps the literal-anchor
# row-group-pruning path measurable for comparison. The routed set's
# PartitionFilters are pinned in tests/test_scale_ops.py::
# test_last_day_silver_partition_prunes_routed_set.
# ---------------------------------------------------------------------------

_A1_ORACLE = """
    SELECT event_type,
           COUNT(*) AS qty,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 DAY
    GROUP BY event_type
    ORDER BY qty DESC, event_type ASC
"""


def _a1_plan(ev: DataFrame) -> DataFrame:
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("qty"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy(F.desc("qty"), F.asc("event_type"))
    )


@register("a1_top_event_types", oracle=_A1_ORACLE)
def a1_top_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+P1+P2+O1: windowed hash-agg with multi-key mixed-direction sort
    (apache_access.py:59-70; sort O1 at :69), routed through the
    date-partitioned silver by default (see module-section note)."""
    return _a1_plan(last_day_silver(spark, sf_dir))


@register("a1_top_event_types_monolithic", oracle=_A1_ORACLE)
def a1_top_event_types_monolithic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 over the MONOLITHIC bronze parquet — the explicit baseline for
    the silver-routed default: same oracle and plan body, window pruning
    via the pushed literal anchor's row-group statistics only
    (operators/windows.last_day_table). Kept registered so the layout
    win stays measurable per round in bench.py."""
    return _a1_plan(last_day_table(spark, sf_dir))


# ---------------------------------------------------------------------------
# A2 — grand totals with empty-set-as-zero (apache_access.py:57-58,71-76)
# ---------------------------------------------------------------------------


@register(
    "a2_grand_totals",
    oracle="""
    SELECT COUNT(*) AS qty,
           ROUND(COALESCE(SUM(value), 0), 4) AS total_value
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 DAY
    """,
)
def a2_grand_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: SUM-of-window totals; empty window must yield 0 not NULL
    (§4 trap 4 — Python totals start at 0, apache_access.py:57-58).
    Silver-routed by default (module-section note above)."""
    ev = last_day_silver(spark, sf_dir)
    return ev.agg(
        F.count(F.lit(1)).alias("qty"),
        F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 4).alias("total_value"),
    )


# ---------------------------------------------------------------------------
# A3 — attacker counts (authfail.py:34-38): GROUP BY src_addr ORDER BY
# qty DESC, src_addr — analogue: events by user_id.
# ---------------------------------------------------------------------------


@register(
    "a3_top_users",
    oracle="""
    SELECT user_id, COUNT(*) AS qty
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 DAY
    GROUP BY user_id
    ORDER BY qty DESC, user_id ASC
    """,
)
def a3_top_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: COUNT('*') per key in the 24 h window (authfail.py:34-38).
    COUNT('*') counts a never-null constant == count(lit(1)) (§4 trap 3).
    Silver-routed by default (module-section note above)."""
    ev = last_day_silver(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("qty"))
        .orderBy(F.desc("qty"), F.asc("user_id"))
    )


# ---------------------------------------------------------------------------
# A4 — count-as-empty check (maillog.py:115-116)
# ---------------------------------------------------------------------------


@register(
    "a4_window_empty_check",
    oracle="""
    SELECT COUNT(*) AS n,
           (COUNT(*) = 0) AS is_empty
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 DAY
      AND event_type = 'purchase'
    """,
)
def a4_window_empty_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: `if not newmail:` empty-branch semantics (maillog.py:115-116).
    Silver-routed by default; the event_type predicate pushes into the
    pruned-partition scan alongside the ts refinement."""
    ev = last_day_silver(spark, sf_dir).filter(
        F.col("event_type") == "purchase"
    )
    return ev.agg(
        F.count(F.lit(1)).alias("n"),
        (F.count(F.lit(1)) == 0).alias("is_empty"),
    )


# ---------------------------------------------------------------------------
# A5 — first-seen-order dedup (maillog.py:88-94): recipients deduped by
# contact preserving first-seen order. Analogue: per user, event_types in
# order of first occurrence.
# ---------------------------------------------------------------------------


@register(
    "a5_first_seen_dedup",
    oracle="""
    SELECT user_id,
           STRING_AGG(event_type, ',' ORDER BY first_ts ASC, event_type ASC)
             AS types_in_first_seen_order
    FROM (
        SELECT user_id, event_type, MIN(date_trunc('second', ts)) AS first_ts
        FROM events
        GROUP BY user_id, event_type
    )
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def a5_first_seen_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: dedup preserving first-seen order (maillog.py:88-94) as a
    two-level agg: min(ts) per (user, type), then an order-by-first-seen
    string agg. Spark side sorts structs (first_ts, type) — field-ordinal
    struct ordering matches the SQL ORDER BY."""
    ev = load_table(spark, sf_dir, "events")
    # second-truncated for cross-engine precision parity (ns vs µs);
    # event_type is the deterministic tiebreaker in the struct sort.
    first = ev.groupBy("user_id", "event_type").agg(
        F.min(F.date_trunc("second", F.col("ts"))).alias("first_ts")
    )
    return (
        first.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("first_ts", "event_type"))),
                    lambda s: s.getField("event_type"),
                ),
                ",",
            ).alias("types_in_first_seen_order")
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# J1 — FK N:1 join (maillog.py:53-56): inbox.sender_id -> contacts.id.
# Analogue: orders.o_custkey -> customer.c_custkey. Dim side broadcasts.
# ---------------------------------------------------------------------------


@register(
    "j1_fk_join",
    oracle="""
    SELECT o.o_orderkey, c.c_name, ROUND(o.o_totalprice, 4) AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_orderstatus = 'O'
    """,
)
def j1_fk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: N:1 FK equi-join, dim broadcast (maillog.py:53-56,131).
    customer is tiny relative to orders → broadcast-hash join, no
    shuffle of the fact side."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    customer = load_table(spark, sf_dir, "customer")
    return orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    ).select(
        "o_orderkey",
        "c_name",
        F.round("o_totalprice", 4).alias("total_price"),
    )


# ---------------------------------------------------------------------------
# J2 — many-to-many bridge join + per-row collected array
# (maillog.py:28-44,59,128): inbox -> tocc -> contacts rendered as a
# sorted recipient list. Analogue: order -> lineitem -> supplier names.
# ---------------------------------------------------------------------------


@register(
    "j2_bridge_collect",
    oracle="""
    SELECT l_orderkey AS orderkey,
           STRING_AGG(s_name, ',' ORDER BY s_name) AS suppliers
    FROM (
        SELECT DISTINCT l.l_orderkey, s.s_name
        FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    )
    GROUP BY l_orderkey
    ORDER BY orderkey
    """,
)
def j2_bridge_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2+O3: bridge-table M:N join, then per-key sorted distinct
    collection (maillog.py:59 relationship; sorted render at :129).
    ONE shuffle: collect_set dedups inside the orderkey aggregate (with
    map-side partial aggregation), replacing the earlier
    distinct→collect_list form whose distinct added a second exchange
    on the same key. collect_set is order-nondeterministic across
    partitions, so array_sort pins O3's sort-by-tuple semantics."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    pairs = li.join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey).select(
        F.col("l_orderkey").alias("orderkey"), "s_name"
    )
    return (
        pairs.groupBy("orderkey")
        .agg(F.array_join(F.array_sort(F.collect_set("s_name")), ",").alias("suppliers"))
        .orderBy("orderkey")
    )


# ---------------------------------------------------------------------------
# J3 — existence probe / upsert precursor (maillog.py:66-78): contacts
# not yet in the dim. Analogue: customers with no orders (anti join).
# ---------------------------------------------------------------------------


@register(
    "j3_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def j3_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: get-or-insert becomes an anti-join of candidates against the
    dim (maillog.py:66-78). Broadcast the key set of the big side's
    distinct keys when small; here customer ⟕̸ orders left-anti."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# J4 — domain semi-join (maillog.py:119-128): recipients whose e-mail
# domain is in the local set. Analogue: customers in a named region.
# ---------------------------------------------------------------------------


@register(
    "j4_semi_join",
    oracle="""
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE c.c_nationkey IN (
        SELECT n.n_nationkey
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
    )
    ORDER BY c.c_custkey
    """,
)
def j4_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4/P4: membership semi-join against a tiny dim
    (maillog.py:124-128) — broadcast left-semi, no fact shuffle."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey")
    return (
        customer.join(
            F.broadcast(asia_nations),
            customer.c_nationkey == asia_nations.n_nationkey,
            "left_semi",
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# P3 — conjunctive equality predicates (maillog.py:68-70)
# ---------------------------------------------------------------------------


@register(
    "p3_conjunctive_filter",
    oracle="""
    SELECT c_custkey, c_name, ROUND(c_acctbal, 4) AS acctbal
    FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_nationkey = 5
    ORDER BY c_custkey
    """,
)
def p3_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: chained equality filters (maillog.py:68-70). Both predicates
    push down into the parquet scan (PushedFilters)."""
    return (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_nationkey") == 5))
        .select("c_custkey", "c_name", F.round("c_acctbal", 4).alias("acctbal"))
        .orderBy("c_custkey")
    )


# ---------------------------------------------------------------------------
# O2 — stable chronological sort with id tiebreaker (maillog.py:112).
# row_number materializes the order so the order-insensitive hash
# actually verifies the sort.
# ---------------------------------------------------------------------------


@register(
    "o2_stable_chronological",
    oracle="""
    SELECT ROW_NUMBER() OVER (ORDER BY date_trunc('second', ts) ASC,
                              event_id ASC) AS rn,
           event_id
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 DAY
    ORDER BY rn
    """,
)
def o2_stable_chronological(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2: ORDER BY timestamp, id — id as deterministic tiebreaker
    (maillog.py:112). Ordering key is second-truncated because the
    engines read ts at different sub-second precision (ns vs µs); the
    event_id tiebreaker then pins a total order identically on both
    sides. The single-partition window is test-only visibility of the
    order; at scale rank assignment is a range-partitioned sort.
    Silver-routed by default (module-section note above)."""
    ev = last_day_silver(spark, sf_dir)
    w = Window.orderBy(F.asc(F.date_trunc("second", F.col("ts"))), F.asc("event_id"))
    return ev.select(F.row_number().over(w).alias("rn"), "event_id").orderBy("rn")


@register(
    "o2_total_order_ranged",
    oracle="""
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY date_trunc('second', ts) ASC,
                                   event_id ASC) AS BIGINT) AS rn,
           event_id
    FROM events
    WHERE ts >= (SELECT MAX(ts) FROM events) - INTERVAL 1 DAY
    ORDER BY rn
    """,
)
def o2_total_order_ranged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 on the SCALE path: identical total order to
    o2_stable_chronological, produced by range-repartition +
    per-partition rank + broadcast prefix-sum offsets
    (operators/ordering.global_row_number) instead of one
    single-partition window over the fact table — this is the
    demonstrated 100 TB total-order plan the o2 docstring promises.
    The plan test pins that the only Exchange SinglePartition feeds
    the #partitions-row offset aggregate, never the events scan.
    Silver-routed by default (module-section note above)."""
    from ..operators.ordering import global_row_number

    ev = last_day_silver(spark, sf_dir).select(
        F.date_trunc("second", F.col("ts")).alias("_ts_s"), "event_id"
    )
    ranked = global_row_number(
        ev, [F.asc("_ts_s"), F.asc("event_id")], rn_alias="rn"
    )
    return ranked.select("rn", "event_id").orderBy("rn")


# ---------------------------------------------------------------------------
# F1 — longint digit grouping (core.py:51-57)
# ---------------------------------------------------------------------------


@register(
    "f1_longint_format",
    oracle="""
    SELECT o_orderpriority,
           REPLACE(FORMAT('{:,}', CAST(FLOOR(SUM(o_totalprice)) AS BIGINT)), ',', ' ')
             AS total_grouped
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def f1_longint_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: 1234567 -> '1 234 567' (core.py:51-57), applied to per-priority
    revenue totals. Truncation-to-int before grouping matches Python's
    int() semantics on the summed value."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(longint(F.floor(F.sum("o_totalprice"))).alias("total_grouped"))
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# F7/F8 — truncate + e-mail domain extraction (maillog.py:98,124-128)
# ---------------------------------------------------------------------------


@register(
    "f7_f8_string_ops",
    oracle="""
    SELECT c_custkey,
           SUBSTRING(c_name, 1, 12) AS name_trunc,
           LOWER(SPLIT_PART(CONCAT(REPLACE(c_name, ' ', '.'), '@Example.COM'), '@', 2))
             AS domain
    FROM customer
    ORDER BY c_custkey
    """,
)
def f7_f8_string_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7 truncate (maillog.py:98) + F8 domain-of-address lowercased
    (maillog.py:124-128), on synthesized addresses."""
    cust = load_table(spark, sf_dir, "customer")
    addr = F.concat(F.regexp_replace("c_name", " ", "."), F.lit("@Example.COM"))
    return cust.select(
        "c_custkey",
        F.substring("c_name", 1, 12).alias("name_trunc"),
        email_domain(addr).alias("domain"),
    ).orderBy("c_custkey")


# ---------------------------------------------------------------------------
# JSON props extraction (events.props) — F12/F13 analogue
# (dailyreport.py:97-99 json path access)
# ---------------------------------------------------------------------------


@register(
    "f13_json_extract",
    oracle="""
    SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           COUNT(*) AS qty,
           ROUND(SUM(value), 4) AS sum_value
    FROM events
    GROUP BY k_bucket
    ORDER BY k_bucket
    """,
)
def f13_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F13: JSON decode + nested path access (dailyreport.py:97-99) —
    get_json_object stays JVM-side; no Python UDF."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.groupBy((k % 10).alias("k_bucket"))
        .agg(
            F.count(F.lit(1)).alias("qty"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("k_bucket")
    )
