"""Driver-verified query surface (SURVEY.md §2.B).

Each entry is ``name -> (spark_fn, duckdb_sql | None)``. The driver runs
the Spark DataFrame query and the DuckDB oracle SQL side-by-side at
sf=0.01 and compares row count + schema + order-insensitive value hash
(``__spark_entry__.py``), so every computed column is aliased
identically on both sides and REPRESENTATION parity is engineered, not
hoped for. The driver's hash is representation-sensitive (round-1
lesson: DuckDB widens SUM(BIGINT)→HUGEINT and SUM(DECIMAL)→
DECIMAL(38,x), both of which ``.df()`` hands back as float64, while
Spark returns int64/Decimal — equal values, different hashes). The
rules every query here follows:

  * NO decimal output columns, ever. Money/quantity aggregates are
    integer units (cents via ``round(x*100)`` → BIGINT) — bit-exact
    and order-independent on both engines.
  * every integer SUM in the oracle SQL is wrapped ``CAST(... AS
    BIGINT)`` so DuckDB's HUGEINT widening never reaches the driver.
  * float output columns are derived from exact integers by the SAME
    IEEE expression on both sides (e.g. ``CAST(cents AS DOUBLE)/100/n``)
    — bit-identical, no tolerance needed.
  * timestamps are compared as ``unix_micros``/``epoch_us`` bigints or
    as dates, never as raw session-timezone-dependent timestamps.
  * window/running aggregates fix a total order (ties broken by keys).

``tools/oracle_check.py`` enforces all of this strictly (dtype-class
parity + bit-exact floats) and is run by tests/test_oracle.py.

Queries without an oracle entry (value ``None``) are genuinely
non-SQL-expressible ops (crawl wave, bloom filter, approx sketches);
the driver records a weaker rows-only check for those.

The registry is capped at 50 entries: round 1 registered 51 and the
driver's CORRECTNESS report contained exactly the first 50 in
insertion order (q46, inserted 51st, silently missing — VERDICT.md
"What's missing" #1). Coverage is kept by folding the dropped slots
into sibling queries (q25b's xxhash64 → q19b; q45's EXCEPT → q16).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd  # module-level: pandas_udf type hints ('pd.Series')
                     # are resolved in module globals under
                     # `from __future__ import annotations`

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # session timezone pinned per-call: the driver owns the session and
    # may not have set UTC; DuckDB timestamps are UTC-naive
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def cents(col, scale: int = 100):
    """Exact integer-units encoding of a ≤2-decimal double (×100) or a
    product of two such (×10000): both engines compute the identical
    IEEE double for ``col * scale``, round it identically (half away
    from zero on positives AND negatives), and sum in int64. SQL mirror:
    ``CAST(round(expr * scale) AS BIGINT)`` with the outer SUM wrapped
    in another ``CAST(... AS BIGINT)``.

    Residual float caveat (documented, accepted): a handful of queries
    (q22/q23/q34/q48) emit ``round(<double>, 6)`` where the double is
    NOT integer-derived (cosines, logs). Spark rounds the exact decimal
    expansion (BigDecimal HALF_UP) while DuckDB rounds via float
    multiply, so a value within an ulp of a x.xxxxxx5 boundary COULD
    differ by 1e-6 between engines. On the frozen fixture tables no
    value sits on such a boundary (verified by the strict bit-exact
    checker passing every round); a data regeneration that hit one
    would fail loudly in tools/oracle_check.py, not silently."""
    return F.round(col * scale).cast("long")


_REG: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def q(name: str, sql: str | None):
    def deco(fn):
        _REG[name] = (fn, sql)
        return fn
    return deco


def registry() -> dict[str, tuple[Callable, str | None]]:
    return dict(_REG)


# ---------------------------------------------------------------------------
# Scans / projection / filter
# ---------------------------------------------------------------------------

@q("q01_scan_filter_project", """
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1 - l_discount) AS revenue,
       CAST(l_shipdate AS DATE) AS ship_date
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1995-04-01'
  AND l_quantity > 25
""")
def q01(spark, sf):
    li = t(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1995-04-01")
            & (F.col("l_quantity") > 25)
        )
        .select(
            "l_orderkey", "l_linenumber",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.col("l_shipdate").cast("date").alias("ship_date"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregation (TPC-H Q1 shape: decimal-exact partial+final hash agg)
# ---------------------------------------------------------------------------

@q("q02_tpch_q1", """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_price_c,
       CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)) AS BIGINT) AS sum_disc_price_c4,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100 / COUNT(*) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""")
def q02(spark, sf):
    """TPC-H Q1 shape. Integer-cent aggregation (``_c`` = ×100 units,
    ``_c4`` = ×10000 for the 2-decimal × 2-decimal product); avg_qty is
    derived from the exact cent sum by the same double expression on
    both engines, so even the float column is bit-identical."""
    li = t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    qty_c = cents(F.col("l_quantity"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty_c).alias("sum_qty_c"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_price_c"),
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
            ).alias("sum_disc_price_c4"),
            (F.sum(qty_c).cast("double") / F.lit(100) / F.count("*")).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------

@q("q03_broadcast_join", """
SELECT r.r_name AS region_name,
       COUNT(*) AS n_customers,
       CAST(SUM(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT) AS total_acctbal_c
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY r.r_name
""")
def q03(spark, sf):
    c = t(spark, sf, "customer")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("n_customers"),
            F.sum(cents(F.col("c_acctbal"))).alias("total_acctbal_c"),
        )
    )


@q("q04_shuffle_join_agg", """
SELECT o.o_orderpriority,
       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_c4,
       COUNT(DISTINCT o.o_orderkey) AS n_orders
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
""")
def q04(spark, sf):
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
            ).alias("revenue_c4"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@q("q05_multi_join", """
SELECT n.n_name AS nation_name,
       CAST(SUM(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000) AS BIGINT)) AS BIGINT) AS revenue_c4
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name IN ('ASIA', 'AMERICA')
GROUP BY n.n_name
""")
def q05(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    n = t(spark, sf, "nation")
    r = t(spark, sf, "region").filter(F.col("r_name").isin("ASIA", "AMERICA"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            F.sum(
                cents(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
            ).alias("revenue_c4")
        )
    )


@q("q06_anti_join", """
SELECT c.c_mktsegment, COUNT(*) AS n_customers_without_big_orders
FROM customer c
WHERE NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000
)
GROUP BY c.c_mktsegment
""")
def q06(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers_without_big_orders"))
    )


@q("q07_semi_join", """
SELECT n.n_name AS nation_name, COUNT(*) AS n_active_customers
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
GROUP BY n.n_name
""")
def q07(spark, sf):
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    n = t(spark, sf, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(F.count("*").alias("n_active_customers"))
    )


@q("q08_left_outer_join", """
SELECT o.o_orderstatus,
       COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN l.l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
FROM orders o
LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey AND l.l_quantity > 49
GROUP BY o.o_orderstatus
""")
def q08(spark, sf):
    o = t(spark, sf, "orders")
    li = t(spark, sf, "lineitem")
    joined = o.join(
        li, (o.o_orderkey == li.l_orderkey) & (li.l_quantity > 49), "left"
    )
    return joined.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0)).alias("n_unmatched"),
    )


@q("q09_full_outer_join", """
WITH s AS (SELECT s_nationkey AS nk, COUNT(*) AS n_suppliers FROM supplier GROUP BY 1),
     c AS (SELECT c_nationkey AS nk, COUNT(*) AS n_customers FROM customer GROUP BY 1)
SELECT COALESCE(s.nk, c.nk) AS nationkey,
       COALESCE(s.n_suppliers, 0) AS n_suppliers,
       COALESCE(c.n_customers, 0) AS n_customers
FROM s FULL OUTER JOIN c ON s.nk = c.nk
""")
def q09(spark, sf):
    s = t(spark, sf, "supplier").groupBy(F.col("s_nationkey").alias("nk")).agg(
        F.count("*").alias("n_suppliers")
    )
    c = t(spark, sf, "customer").groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.count("*").alias("n_customers")
    )
    return (
        s.join(c, "nk", "full_outer")
        .select(
            F.col("nk").alias("nationkey"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
        )
    )


@q("q10_theta_band_join", """
SELECT b.band_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(e.value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events e
JOIN (SELECT n_nationkey AS band_id,
             n_nationkey * 4.0 AS lo, n_nationkey * 4.0 + 4.0 AS hi
      FROM nation) b
  ON e.value >= b.lo AND e.value < b.hi
GROUP BY b.band_id
""")
def q10(spark, sf):
    e = t(spark, sf, "events")
    bands = t(spark, sf, "nation").select(
        F.col("n_nationkey").alias("band_id"),
        (F.col("n_nationkey") * 4.0).alias("lo"),
        (F.col("n_nationkey") * 4.0 + 4.0).alias("hi"),
    )
    return (
        e.join(
            F.broadcast(bands),
            (e.value >= bands.lo) & (e.value < bands.hi),
        )
        .groupBy("band_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(cents(F.col("value"))).alias("cents"),
        )
    )


# ---------------------------------------------------------------------------
# Windows / sort / top-k (crawl ops A9/A11/A12/A20 decompose into these)
# ---------------------------------------------------------------------------

@q("q11_asof_join", """
WITH errors AS (
    SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
), ranked AS (
    SELECT e.event_id, c.value, c.ts AS click_ts, c.event_id AS click_id,
           ROW_NUMBER() OVER (
               PARTITION BY e.event_id
               ORDER BY c.ts DESC, c.event_id DESC
           ) AS rn
    FROM errors e
    JOIN events c
      ON c.user_id = e.user_id AND c.event_type = 'click' AND c.ts <= e.ts
)
SELECT e.event_id,
       r.value AS last_click_value,
       epoch_us(r.click_ts) AS click_ts_us
FROM errors e LEFT JOIN ranked r ON r.event_id = e.event_id AND r.rn = 1
""")
def q11(spark, sf):
    """As-of join (no native ASOF in Spark SQL 4.1): per error event, the
    latest prior click of the same user, via grouped-map merge_asof —
    the per-group-pandas pattern a cluster uses for time-series aligns
    (SURVEY.md §2.B range/as-of row)."""
    import pandas as pd

    e = t(spark, sf, "events")
    errors = e.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"), F.col("value"),
    )
    def asof(pdf: pd.DataFrame) -> pd.DataFrame:
        err = (
            pdf[pdf["_kind"] == "e"][["event_id", "ts"]]
            .sort_values(["ts", "event_id"])
        )
        # sort by (ts, event_id): merge_asof(backward) takes the LAST
        # row ≤ the error's ts, so among equal-ts clicks the largest
        # event_id wins — exactly the oracle's ORDER BY ts DESC,
        # event_id DESC rank-1 pick. Sorting by ts alone left equal-ts
        # winners to partition arrival order (VERDICT.md r2 "What's
        # wrong" #1: latent nondeterminism).
        clk = (
            pdf[pdf["_kind"] == "c"][["ts", "event_id", "value"]]
            .sort_values(["ts", "event_id"], kind="stable")[["ts", "value"]]
        )
        if len(err) == 0:
            return pd.DataFrame(columns=["event_id", "last_click_value", "click_ts_us"])
        merged = pd.merge_asof(
            err, clk.rename(columns={"ts": "click_ts"}),
            left_on="ts", right_on="click_ts", direction="backward",
        )
        return pd.DataFrame({
            "event_id": merged["event_id"].astype("int64"),
            "last_click_value": merged["value"],
            "click_ts_us": merged["click_ts"].map(
                lambda v: None if pd.isna(v) else int(v.value) // 1000
            ),
        })

    tagged = errors.select(
        "user_id", "event_id", "ts", F.lit(None).cast("double").alias("value"),
        F.lit("e").alias("_kind"),
    ).unionByName(
        clicks.select(
            "user_id", F.col("click_id").alias("event_id"),
            F.col("click_ts").alias("ts"), "value", F.lit("c").alias("_kind"),
        )
    )
    return tagged.groupBy("user_id").applyInPandas(
        asof, "event_id long, last_click_value double, click_ts_us long"
    )


@q("q12_window_rank", """
SELECT o_custkey, o_orderkey, rnk FROM (
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
           ) AS rnk
    FROM orders
) WHERE rnk <= 3
""")
def q12(spark, sf):
    o = t(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "rnk")
    )


@q("q13_window_running_sum", """
SELECT event_id,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS running_cents
FROM events
WHERE user_id < 20
""")
def q13(spark, sf):
    e = t(spark, sf, "events").filter(F.col("user_id") < 20)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        F.sum(cents(F.col("value"))).over(w).alias("running_cents"),
    )


@q("q14_window_lag_lead", """
SELECT event_id,
       epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS us_since_prev,
       LEAD(event_type) OVER w AS next_type
FROM events
WHERE user_id < 20
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
""")
def q14(spark, sf):
    e = t(spark, sf, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ; cast to TIMESTAMP (session tz = UTC)
    # so unix_micros matches DuckDB's epoch_us over the naive value
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return e.select(
        "event_id",
        (us - F.lag(us).over(w)).alias("us_since_prev"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@q("q15_topk", """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 10
""")
def q15(spark, sf):
    li = t(spark, sf, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Set ops / grouping sets / distinct
# ---------------------------------------------------------------------------

@q("q16_set_ops", """
SELECT c_custkey, 'intersect' AS op FROM (
    SELECT c_custkey FROM customer WHERE c_acctbal > 500
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders
)
UNION ALL
SELECT c_custkey, 'except' AS op FROM (
    SELECT c_custkey FROM customer WHERE c_acctbal > 0
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
)
""")
def q16(spark, sf):
    """INTERSECT + EXCEPT + UNION in one query (absorbs round 1's
    q45_except — the registry is capped at 50 driver slots, see module
    docstring)."""
    c = t(spark, sf, "customer")
    o = t(spark, sf, "orders")
    o_keys = o.select(F.col("o_custkey").alias("c_custkey"))
    inter = (
        c.filter(F.col("c_acctbal") > 500).select("c_custkey")
        .intersect(o_keys)
        .withColumn("op", F.lit("intersect"))
    )
    exc = (
        c.filter(F.col("c_acctbal") > 0).select("c_custkey")
        # subtract == SQL EXCEPT (DISTINCT) exactly; the previous
        # exceptAll(right.distinct()).distinct() only matched because
        # c_custkey is unique — a duplicated left key present on both
        # sides would have left a survivor (code-review r5)
        .subtract(
            o.filter(F.col("o_orderstatus") == "F")
            .select(F.col("o_custkey").alias("c_custkey"))
        )
        .withColumn("op", F.lit("except"))
    )
    return inter.unionByName(exc)


@q("q17_rollup", """
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def q17(spark, sf):
    li = t(spark, sf, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().alias("gid"),
            F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
            F.count("*").alias("n"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty_c", "n")
    )


@q("q18_cube", """
SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE ts < TIMESTAMP '2024-01-04'
GROUP BY CUBE (event_type, CAST(date_trunc('day', ts) AS DATE))
""")
def q18(spark, sf):
    e = t(spark, sf, "events").filter(F.col("ts") < "2024-01-04").withColumn(
        "day", F.date_trunc("day", F.col("ts")).cast("date")
    )
    return e.cube("event_type", "day").agg(
        F.count("*").alias("n"),
        F.sum(cents(F.col("value"))).alias("cents"),
    )


@q("q19_distinct_agg", """
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
""")
def q19(spark, sf):
    c = t(spark, sf, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count("*").alias("n_customers"),
    )


KMV_K = 128         # sketch size: keep the K smallest hashes per group
KMV_SPACE = float(1 << 60)  # hash space: 15 hex digits of md5 → [0, 2^60)
MED_SAMPLE_MOD = 4  # hash-sample 1/4 of rows for the median sketch


def _md5_60(col):
    """Uniform 60-bit hash both engines compute bit-identically:
    md5 of the value's decimal-string form, first 15 hex digits as
    int64. SQL mirror: ``('0x' || substr(md5(CAST(x AS VARCHAR)), 1,
    15))::BIGINT``."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


@q("q19b_approx_distinct", f"""
WITH h AS (
  SELECT DISTINCT event_type,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL
), r AS (
  SELECT event_type, h,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
  FROM h
), kmv AS (
  SELECT event_type, COUNT(*) AS n_mins, MAX(h) AS kth_min_hash
  FROM r WHERE rn <= {KMV_K} GROUP BY event_type
), samp AS (
  SELECT event_type, value
  FROM events
  WHERE value IS NOT NULL
    AND (('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT)
        % {MED_SAMPLE_MOD} = 0
), sr AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS s
  FROM samp
), med AS (
  SELECT event_type, value AS approx_median_value, s AS n_sampled
  FROM sr WHERE rn = CAST(floor((s + 1) / 2) AS BIGINT)
)
SELECT kmv.event_type, n_mins, kth_min_hash,
       CASE WHEN n_mins < {KMV_K} THEN CAST(n_mins AS DOUBLE)
            ELSE ({float(KMV_K - 1)} * {KMV_SPACE})
                 / CAST(kth_min_hash AS DOUBLE) END AS est_users,
       CAST(COALESCE(med.n_sampled, 0) AS BIGINT) AS n_sampled,
       COALESCE(med.approx_median_value, CAST('NaN' AS DOUBLE))
           AS approx_median_value
FROM kmv LEFT JOIN med USING (event_type)
""")
def q19b(spark, sf):
    """Approx-distinct + approx-median sketches with EXACT cross-engine
    oracle parity (upgraded from HLL/percentile_approx, which are
    implementation-defined and forced this slot to rows-only through
    round 4).

    - Distinct: KMV (k-minimum-values) — keep the K smallest 60-bit
      md5-derived hashes of ``user_id`` per group; estimate
      D ≈ (K-1) / U(K) where U(K) = kth_min_hash / 2^60. Every input to
      the double arithmetic is an exact integer (≤ 2^60) or a power of
      two, so Spark and DuckDB produce the identical IEEE-754 result.
      Plan shape at scale (verified via explain on the sf tiers): the
      distinct exchanges partially-deduped (group, hash) pairs on
      (event_type, h); the top-K window then re-exchanges on
      event_type with a map-side WindowGroupLimit BEFORE the shuffle,
      so the second exchange carries at most K rows per group per map
      partition — two exchanges, deduped 16-byte rows and then
      K-capped rows, never raw events (repartitioning raw events by
      group first would collapse it to one exchange but ships every
      raw row through a skew-prone shuffle).
    - Median: exact lower median (rank ⌈s/2⌉) of a deterministic 1/4
      hash-sample keyed on ``event_id`` — a sample-quantile sketch both
      engines draw identically, no interpolation ambiguity.
    - NULL handling, pinned identically on both engines: NULL user_id /
      NULL value rows are excluded from the sketches EXPLICITLY (Spark
      windows sort NULLs first, DuckDB last — an unfiltered NULL would
      silently occupy a KMV slot on one engine only); a group whose
      rows all miss the 1/4 sample stays visible via the LEFT join
      with (n_sampled=0, approx_median_value=NaN) — NaN compares
      bit-equal cross-engine, and 0 keeps the count column int64.

    xxhash64 coverage that previously rode this rows-only slot lives in
    the crawl trace fingerprints (pinned bit-exact in
    tests/test_crawl_equivalence.py); the Spark-only hash family
    (xxhash64/hash/crc32) is pinned to frozen golden values in
    tests/test_functions.py::test_spark_hash_family_pinned.
    """
    e = t(spark, sf, "events")
    d = (
        e.filter(F.col("user_id").isNotNull())
        .select("event_type", _md5_60(F.col("user_id")).alias("h"))
        .distinct()
    )
    rn = F.row_number().over(Window.partitionBy("event_type").orderBy("h"))
    kmv = (
        d.withColumn("rn", rn)
        .filter(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.count("*").alias("n_mins"), F.max("h").alias("kth_min_hash"))
    )
    est = F.when(
        F.col("n_mins") < KMV_K, F.col("n_mins").cast("double")
    ).otherwise(
        F.lit(float(KMV_K - 1)) * F.lit(KMV_SPACE)
        / F.col("kth_min_hash").cast("double")
    )
    kmv = kmv.select("event_type", "n_mins", "kth_min_hash",
                     est.alias("est_users"))
    samp = e.filter(
        F.col("value").isNotNull()
        & (_md5_60(F.col("event_id")) % MED_SAMPLE_MOD == 0)
    ).select("event_type", "value")
    med = (
        samp.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("event_type").orderBy("value")
            ),
        )
        .withColumn(
            "s", F.count("*").over(Window.partitionBy("event_type"))
        )
        .filter(F.col("rn") == F.floor((F.col("s") + 1) / 2))
        .select(
            "event_type",
            F.col("s").alias("n_sampled"),
            F.col("value").alias("approx_median_value"),
        )
    )
    return kmv.join(med, "event_type", "left").select(
        "event_type", "n_mins", "kth_min_hash", "est_users",
        F.coalesce(F.col("n_sampled"), F.lit(0).cast("long"))
        .alias("n_sampled"),
        F.coalesce(F.col("approx_median_value"), F.lit(float("nan")))
        .alias("approx_median_value"),
    )


# ---------------------------------------------------------------------------
# Function families (string / datetime / math / array / json / hash)
# ---------------------------------------------------------------------------

@q("q20_string_funcs", """
SELECT doc_id,
       upper(substr(text, 1, 10)) AS head10,
       length(text) AS n_chars_actual,
       len(string_split(text, ' ')) AS n_tokens,
       regexp_extract(text, '([a-z]+)', 1) AS first_word,
       concat(lang, ':', source) AS tag,
       replace(substr(text, 1, 20), ' ', '_') AS snake
FROM documents
""")
def q20(spark, sf):
    d = t(spark, sf, "documents")
    return d.select(
        "doc_id",
        F.upper(F.substring("text", 1, 10)).alias("head10"),
        F.length("text").alias("n_chars_actual"),
        F.size(F.split("text", " ", -1)).alias("n_tokens"),
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.concat(F.col("lang"), F.lit(":"), F.col("source")).alias("tag"),
        F.regexp_replace(F.substring("text", 1, 20), " ", "_").alias("snake"),
    )


@q("q21_datetime_funcs", """
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       EXTRACT(hour FROM ts) AS hr,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
WHERE ts >= TIMESTAMP '2024-01-10' AND ts < TIMESTAMP '2024-01-12'
GROUP BY 1, 2
""")
def q21(spark, sf):
    e = t(spark, sf, "events").filter(
        (F.col("ts") >= "2024-01-10") & (F.col("ts") < "2024-01-12")
    )
    return (
        e.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.hour("ts").cast("long").alias("hr"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(cents(F.col("value"))).alias("cents"),
        )
    )


@q("q22_math_funcs", """
SELECT l_orderkey, l_linenumber,
       round(sqrt(l_extendedprice), 6) AS sqrt_price,
       round(ln(l_extendedprice + 1), 6) AS ln_price,
       abs(l_discount - 0.05) AS disc_dev,
       CAST(l_partkey % 7 AS BIGINT) AS pmod7
FROM lineitem
WHERE l_orderkey < 400
""")
def q22(spark, sf):
    li = t(spark, sf, "lineitem").filter(F.col("l_orderkey") < 400)
    return li.select(
        "l_orderkey", "l_linenumber",
        F.round(F.sqrt("l_extendedprice"), 6).alias("sqrt_price"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("ln_price"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.pmod(F.col("l_partkey"), F.lit(7)).cast("long").alias("pmod7"),
    )


@q("q23_array_funcs", """
SELECT vec_id, label,
       len(embedding) AS dim,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val,
       round(sqrt(list_sum(list_transform(embedding,
             x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2_norm
FROM embeddings
""")
def q23(spark, sf):
    em = t(spark, sf, "embeddings")
    sq_sum = F.aggregate(
        "embedding",
        F.lit(0.0),
        lambda acc, x: acc + x.cast("double") * x.cast("double"),
    )
    return em.select(
        "vec_id", "label",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_val"),
        F.round(F.sqrt(sq_sum), 4).alias("l2_norm"),
    )


@q("q24_json_funcs", """
WITH parsed AS (
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           json_keys(props) AS keys
    FROM events
)
SELECT k % 10 AS k_mod,
       COUNT(*) AS n,
       MIN(k) AS k_min,
       MAX(k) AS k_max,
       MIN(len(keys)) AS min_nkeys,
       MIN(array_to_string(keys, ',')) AS first_keys_csv,
       MIN('{"k":' || CAST(k AS VARCHAR) || '}') AS min_roundtrip
FROM parsed
GROUP BY 1
""")
def q24(spark, sf):
    """Map/JSON breadth (VERDICT.md "What's missing" #3): get_json_object
    AND the full from_json → map_keys → to_json surface. The oracle
    reconstructs to_json's canonical rendering ('{"k":N}', no spaces)
    from the parsed value."""
    e = t(spark, sf, "events")
    m = F.from_json("props", "map<string,bigint>")
    k = F.get_json_object("props", "$.k").cast("long")
    parsed = e.select(
        k.alias("k"),
        F.map_keys(m).alias("keys"),
        F.to_json(m).alias("rt"),
    )
    return (
        parsed.groupBy(F.pmod(F.col("k"), F.lit(10)).alias("k_mod"))
        .agg(
            F.count("*").alias("n"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.min(F.size("keys")).cast("long").alias("min_nkeys"),
            F.min(F.array_join("keys", ",")).alias("first_keys_csv"),
            F.min("rt").alias("min_roundtrip"),
        )
    )


@q("q25_hash_funcs", """
SELECT c_custkey,
       md5(c_name) AS name_md5,
       substr(md5(concat(c_name, ':', c_mktsegment)), 1, 8) AS salted8
FROM customer WHERE c_custkey <= 200
""")
def q25(spark, sf):
    c = t(spark, sf, "customer").filter(F.col("c_custkey") <= 200)
    return c.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.substring(
            F.md5(F.concat(F.col("c_name"), F.lit(":"), F.col("c_mktsegment"))), 1, 8
        ).alias("salted8"),
    )


# ---------------------------------------------------------------------------
# URL kernel on relational data (crawl A4/A5/A6 exercised on fixture tables)
# ---------------------------------------------------------------------------

@q("q26_url_canonicalize", """
SELECT c_custkey,
       'http://d' || CAST(c_custkey AS VARCHAR) || '.onion/p/'
           || CAST(c_custkey % 7 AS VARCHAR) || '?a=1&b=2' AS canon_url,
       'd' || CAST(c_custkey AS VARCHAR) || '.onion' AS domain
FROM customer
""")
def q26(spark, sf):
    """Canonicalization parity: Spark canonicalizes NOISY synthetic URLs
    with the engine's pandas UDF; the oracle constructs the expected
    canonical form directly. Passing means the UDF's normalization is
    exactly the documented one."""
    from .functions.spark_udfs import canonicalize_udf, domain_col

    c = t(spark, sf, "customer")
    raw = F.concat(
        F.lit("HTTP://D"), F.col("c_custkey").cast("string"),
        F.lit(".ONION:80/p/"), (F.col("c_custkey") % 7).cast("string"),
        F.lit("?b=2&a=1#frag"),
    )
    canon = canonicalize_udf(raw)
    return c.select(
        "c_custkey",
        canon.alias("canon_url"),
        domain_col(canon).alias("domain"),
    )


# ---------------------------------------------------------------------------
# Pandas-UDF surfaces (grouped agg / grouped map / mapInPandas)
# ---------------------------------------------------------------------------

@q("q27_grouped_agg_pandas", """
SELECT event_type,
       COUNT(*) AS n,
       MIN(value) AS v_min,
       MAX(value) AS v_max,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
GROUP BY event_type
""")
def q27(spark, sf):
    """True GROUPED_AGG ``pandas_udf`` surface (VERDICT.md "What's
    missing" #4 — round 1 substituted applyInPandas here; the grouped
    MAP surface is q28). Each UDF receives the group's values as one
    Arrow-backed pandas Series and returns a scalar; Spark runs them as
    a vectorized aggregate (mixing with built-in aggs is unsupported,
    so all four columns are pandas UDAFs). Integer-cent sum for exact
    float-free parity with the SQL oracle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def n_rows(v: pd.Series) -> int:
        return len(v)

    @pandas_udf("double")
    def v_min(v: pd.Series) -> float:
        # all-NULL group → NULL, matching SQL MIN (float(nan) would
        # hand the driver a NaN where the oracle has NULL)
        m = v.min()
        return None if pd.isna(m) else float(m)

    @pandas_udf("double")
    def v_max(v: pd.Series) -> float:
        m = v.max()
        return None if pd.isna(m) else float(m)

    @pandas_udf("long")
    def cents_sum(v: pd.Series) -> int:
        # half AWAY FROM ZERO, the cents() contract both engines'
        # round() implements — pandas' .round() is numpy banker's
        # rounding (half-to-even), which silently diverges from the
        # oracle at exact .5-cent doubles (e.g. value=0.125).
        # NULLs are skipped like SQL SUM: a NaN reaching the int64
        # cast silently becomes INT64_MIN (code-review r5)
        x = (v.dropna() * 100).to_numpy()
        r = np.sign(x) * np.floor(np.abs(x) + 0.5)
        return int(r.astype("int64").sum())

    e = t(spark, sf, "events").select("event_type", "value")
    return e.groupBy("event_type").agg(
        n_rows("value").alias("n"),
        v_min("value").alias("v_min"),
        v_max("value").alias("v_max"),
        cents_sum("value").alias("cents"),
    )


@q("q28_grouped_map_topk", """
SELECT user_id, event_id, value FROM (
    SELECT user_id, event_id, value,
           ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY value DESC, event_id
           ) AS rn
    FROM events
) WHERE rn <= 2
""")
def q28(spark, sf):
    """Per-group top-k via applyInPandas (the politeness-budget pattern
    expressed as a grouped-map UDF)."""
    import pandas as pd

    e = t(spark, sf, "events").select("user_id", "event_id", "value")

    def topk(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf.sort_values(
            ["value", "event_id"], ascending=[False, True]
        ).head(2)[["user_id", "event_id", "value"]]

    return e.groupBy("user_id").applyInPandas(
        topk, "user_id long, event_id long, value double"
    )


@q("q29_mapinpandas_tokenize", """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       CASE WHEN text LIKE '%spark%' THEN TRUE ELSE FALSE END AS has_spark
FROM documents
WHERE n_chars > 200
""")
def q29(spark, sf):
    """mapInPandas batch transform (the decode/validate pattern)."""
    import pandas as pd

    d = t(spark, sf, "documents").filter(F.col("n_chars") > 200).select("doc_id", "text")

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_tokens": pdf["text"].str.split(" ").str.len().astype("int64"),
                "has_spark": pdf["text"].str.contains("spark", regex=False),
            })

    return d.mapInPandas(run, "doc_id long, n_tokens long, has_spark boolean")


# ---------------------------------------------------------------------------
# Deduplication family (training-data pipeline ops over `documents`)
# ---------------------------------------------------------------------------

@q("q30_dedup_exact", """
SELECT lang,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(text)) AS n_unique,
       COUNT(*) - COUNT(DISTINCT md5(text)) AS n_exact_dups,
       MIN(doc_id) AS first_doc
FROM documents
GROUP BY lang
""")
def q30(spark, sf):
    d = t(spark, sf, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct(F.md5("text")).alias("n_unique"),
        (F.count("*") - F.countDistinct(F.md5("text"))).alias("n_exact_dups"),
        F.min("doc_id").alias("first_doc"),
    )


_SHINGLE_SQL = """
WITH words AS (
    SELECT doc_id, string_split(text, ' ') AS w FROM documents
), idx AS (
    SELECT doc_id, w, unnest(range(0, len(w) - 2)) AS i
    FROM words WHERE len(w) >= 3
), sh AS (
    SELECT doc_id, w[i+1] || ' ' || w[i+2] || ' ' || w[i+3] AS shingle
    FROM idx
)
"""


def _shingles(spark, sf) -> DataFrame:
    """doc_id → exploded word-3-gram shingles (shared by q31/q33/q39)."""
    d = t(spark, sf, "documents")
    w = F.split("text", " ", -1)
    d = d.select("doc_id", w.alias("w")).filter(F.size("w") >= 3)
    sh = F.transform(
        F.sequence(F.lit(0), F.size("w") - 3),
        lambda i: F.concat_ws(
            " ",
            F.element_at("w", i + 1),
            F.element_at("w", i + 2),
            F.element_at("w", i + 3),
        ),
    )
    return d.select("doc_id", F.explode(sh).alias("shingle"))


_MINHASH_P = 8          # permutations (md5 salts)
_MINHASH_BAND = 4       # signatures per band → 2 bands


def _minhash_bands_sql() -> str:
    sigs = ",\n       ".join(
        f"MIN(md5('{p}:' || shingle)) AS sig{p}" for p in range(_MINHASH_P)
    )
    bands = []
    for b in range(_MINHASH_P // _MINHASH_BAND):
        cols = " || ".join(
            f"MIN(md5('{p}:' || shingle))"
            for p in range(b * _MINHASH_BAND, (b + 1) * _MINHASH_BAND)
        )
        bands.append(f"substr(md5({cols}), 1, 12) AS band{b}")
    return f"SELECT doc_id,\n       {sigs},\n       " + ",\n       ".join(bands) + "\nFROM sh GROUP BY doc_id"


@q("q31_dedup_minhash_lsh", _SHINGLE_SQL + _minhash_bands_sql())
def q31(spark, sf):
    """MinHash signatures + LSH band buckets. The 'permutations' are md5
    with distinct salts; min() over shingles is the MinHash; each band
    hashes a disjoint run of signatures — docs sharing ANY band bucket
    are near-dup candidates. 8 permutations × 2 bands of 4 (round 1
    shipped a toy 4×1; VERDICT.md next-round #10) — the b-band OR gives
    match probability 1-(1-j^4)^2, a usable S-curve, while staying in
    the string domain for bit-exact oracle parity. At 10^10-doc scale
    the candidate join keys on (band_id, bucket) — never all-pairs."""
    sh = _shingles(spark, sf)
    sigs = [
        F.min(F.md5(F.concat(F.lit(f"{p}:"), F.col("shingle")))).alias(f"sig{p}")
        for p in range(_MINHASH_P)
    ]
    out = sh.groupBy("doc_id").agg(*sigs)
    for b in range(_MINHASH_P // _MINHASH_BAND):
        cols = [f"sig{p}" for p in range(b * _MINHASH_BAND, (b + 1) * _MINHASH_BAND)]
        out = out.withColumn(
            f"band{b}", F.substring(F.md5(F.concat(*cols)), 1, 12)
        )
    return out


@q("q32_dedup_simhash", """
WITH toks AS (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
), bits AS (
    SELECT doc_id, """ + ",\n           ".join(
        f"SUM((strpos('0123456789abcdef', substr(md5(tok), {i + 1}, 1)) - 1) - 7.5)"
        f" AS s{i}" for i in range(16)
    ) + """
    FROM toks GROUP BY doc_id
)
SELECT doc_id,
       """ + " + ".join(
        f"(CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16)
    ) + """ AS simhash
FROM bits
""")
def q32(spark, sf):
    """16-bit SimHash: bit i = sign of Σ_tokens (hexdigit_i(md5(tok)) −
    7.5). Terms are multiples of 0.5 with small magnitude, so the double
    sum is EXACT and order-independent — safe float parity."""
    d = t(spark, sf, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ", -1)).alias("tok"))
    hexd = "0123456789abcdef"
    aggs = [
        F.sum(
            F.instr(F.lit(hexd), F.substring(F.md5("tok"), i + 1, 1)) - 1 - 7.5
        ).alias(f"s{i}")
        for i in range(16)
    ]
    bits = toks.groupBy("doc_id").agg(*aggs)
    sim = None
    for i in range(16):
        term = F.when(F.col(f"s{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = term if sim is None else (sim + term)
    return bits.select("doc_id", sim.cast("long").alias("simhash"))


# max docs sharing a shingle before it is dropped from pair
# GENERATION (the Jaccard VALUE still uses full shingle sets)
_SHINGLE_DF_CAP = 50
_Q33_CACHE: list = []  # q33's persisted shingle set; see its docstring


@q("q33_dedup_ngram_jaccard", _SHINGLE_SQL + f"""
, ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM ds GROUP BY doc_id),
rare AS (
    SELECT shingle FROM ds GROUP BY shingle
    HAVING COUNT(*) <= {_SHINGLE_DF_CAP}
),
dsr AS (SELECT ds.doc_id, ds.shingle FROM ds JOIN rare USING (shingle)),
pairs AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter_rare
    FROM dsr a JOIN dsr b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
),
exact AS (
    SELECT p.doc_a, p.doc_b, COUNT(*) AS inter
    FROM pairs p
    JOIN ds x ON x.doc_id = p.doc_a
    JOIN ds y ON y.doc_id = p.doc_b AND y.shingle = x.shingle
    GROUP BY p.doc_a, p.doc_b
)
SELECT e.doc_a, e.doc_b,
       CAST(e.inter AS DOUBLE) / (sa.n + sb.n - e.inter) AS jaccard
FROM exact e
JOIN sizes sa ON sa.doc_id = e.doc_a
JOIN sizes sb ON sb.doc_id = e.doc_b
ORDER BY jaccard DESC, e.doc_a, e.doc_b
LIMIT 20
""")
def q33(spark, sf):
    """n-gram Jaccard near-dup with a hot-shingle frequency cap
    (VERDICT.md next-round #8): round 1 blocked pairs on RAW shared
    shingles — a stop-word trigram shared by 10^6 docs makes one 10^12
    -pair join group. Now pair GENERATION only uses shingles whose
    document frequency is ≤ _SHINGLE_DF_CAP (a near-dup pair virtually
    always shares at least one sub-cap shingle), bounding every join
    group at cap² pairs, while the Jaccard VALUE for each surviving
    candidate is still computed on the full shingle sets (join back to
    ``ds``). Oracle mirrors both stages."""
    # the returned plan is lazy, so there is no point in this function
    # where the cache can be released after use; instead each invocation
    # releases its PREDECESSOR's cache, bounding the leak to one live
    # shingle set per session instead of one per driver verify run
    while _Q33_CACHE:
        try:
            _Q33_CACHE.pop().unpersist()
        except Exception:
            pass  # predecessor bound to a stopped/recycled session
    ds = _shingles(spark, sf).distinct().persist()
    _Q33_CACHE.append(ds)
    sizes = ds.groupBy("doc_id").agg(F.count("*").alias("n"))
    rare = (
        ds.groupBy("shingle")
        .agg(F.count("*").alias("_df"))
        .filter(F.col("_df") <= _SHINGLE_DF_CAP)
        .select("shingle")
    )
    dsr = ds.join(rare, "shingle")
    a = dsr.alias("a")
    b = dsr.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # exact intersection over FULL shingle sets, candidates only
    xa = ds.select(F.col("doc_id").alias("doc_a"), "shingle")
    xb = ds.select(F.col("doc_id").alias("doc_b"), "shingle")
    pairs = (
        cand.join(xa, "doc_a")
        .join(xb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    out = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("inter").cast("double") / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(20)
    )
    return out


# ---------------------------------------------------------------------------
# Similarity search over embeddings (ANN)
# ---------------------------------------------------------------------------

@q("q34_ann_cosine_topk", """
WITH qv AS (SELECT vec_id AS q_id, embedding AS qe FROM embeddings WHERE vec_id < 5),
scored AS (
    SELECT qv.q_id, e.vec_id AS neighbor,
           round(list_sum(list_transform(list_zip(qv.qe, e.embedding),
                 p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6) AS cos
    FROM qv JOIN embeddings e ON e.vec_id != qv.q_id
)
SELECT q_id, neighbor, cos FROM (
    SELECT q_id, neighbor, cos,
           ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, neighbor) AS rn
    FROM scored
) WHERE rn <= 3
""")
def q34(spark, sf):
    """Brute-force cosine top-k (baseline ANN; embeddings are unit-norm
    so cosine == dot). JVM-side zip_with/aggregate — no Python on the
    hot path. The scale path is q35 (bucketed search)."""
    em = t(spark, sf, "embeddings")
    qv = em.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe")
    )
    e = em.select(F.col("vec_id").alias("neighbor"), "embedding")
    dot = F.aggregate(
        F.zip_with("qe", "embedding", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(qv).join(e, F.col("neighbor") != F.col("q_id"))
        .select("q_id", "neighbor", F.round(dot, 6).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "neighbor")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "neighbor", "cos")
    )


IVF_K = 16          # inverted lists (centroids)
IVF_NPROBE = 6      # lists probed per query → ~nprobe/K of data scanned
IVF_ITERS = 5       # spherical k-means iterations
IVF_TRAIN_MAX = 4096  # training sample cap (faiss-style: train on a
                      # bounded sample however large the corpus is)


@q("q35_ann_ivf_bucketed", None)  # iterative k-means → rows-only by design
def q35(spark, sf):
    """IVF ANN, the scale path for q34: spherical k-means centroids
    trained on a bounded deterministic sample (first IVF_TRAIN_MAX
    vec_ids — standard IVF practice: the coarse quantizer trains on
    ~10^5 samples no matter the corpus size, so the driver holds only
    K×dim floats), then one distributed pass assigns every vector to
    its nearest-centroid inverted list (vectorized mapInPandas; at
    10^10 scale this is computed once at ingest and stored as the
    list-id partition column), and each query probes only its
    IVF_NPROBE closest lists — the candidate join keys on the list id,
    never all-pairs, scanning ~NPROBE/K of the corpus.

    Round 1 routed by the fixture ``label`` column, which is pure noise
    w.r.t. the embedding geometry — recall@3 was 0.2. Real centroids
    reach recall@3 = 1.0 (sf0.001) / 0.93 (sf0.01) vs brute-force q34,
    asserted by tests/test_ann.py (VERDICT.md next-round #9)."""
    import numpy as np

    em = t(spark, sf, "embeddings")
    train_rows = (
        em.orderBy("vec_id").limit(IVF_TRAIN_MAX).select("embedding").collect()
    )
    train = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in train_rows])
    cents = train[:IVF_K].copy()
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    for _ in range(IVF_ITERS):
        a = np.argmax(train @ cents.T, axis=1)
        for j in range(IVF_K):
            members = train[a == j]
            if len(members):
                c = members.mean(axis=0)
                n = np.linalg.norm(c)
                if n > 0:
                    cents[j] = c / n

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            yield pd.DataFrame({
                "neighbor": pdf["vec_id"].astype("int64"),
                "cluster": np.argmax(E @ cents.T, axis=1).astype("int32"),
                "embedding": pdf["embedding"],
            })

    assigned = em.select("vec_id", "embedding").mapInPandas(
        assign, "neighbor long, cluster int, embedding array<float>"
    )

    def route(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            order = np.argsort(-(E @ cents.T), axis=1)[:, :IVF_NPROBE]
            n = len(pdf)
            yield pd.DataFrame({
                "q_id": pdf["vec_id"].astype("int64").repeat(IVF_NPROBE),
                "cluster": order.reshape(-1).astype("int32"),
                "qe": pdf["embedding"].repeat(IVF_NPROBE),
            })

    routed = (
        em.filter(F.col("vec_id") < 5)
        .select("vec_id", "embedding")
        .mapInPandas(route, "q_id long, cluster int, qe array<float>")
    )
    dot = F.aggregate(
        F.zip_with("qe", "embedding", lambda a, b: a.cast("double") * b.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    scored = (
        F.broadcast(routed).join(assigned, "cluster")
        .filter(F.col("neighbor") != F.col("q_id"))
        .select("q_id", "neighbor", F.round(dot, 6).alias("cos"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), "neighbor")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("q_id", "neighbor", "cos")
    )


# ---------------------------------------------------------------------------
# Text analysis (training-data pipeline ops)
# ---------------------------------------------------------------------------

@q("q36_lang_id", """
WITH s AS (
    SELECT doc_id, lang,
           len(string_split(text, ' ')) AS n_tokens,
           len(list_filter(string_split(text, ' '), x -> x = 'the')) AS n_the,
           len(list_filter(string_split(text, ' '), x -> x = 'a')) AS n_a
    FROM documents
)
SELECT doc_id, lang, n_tokens, n_the, n_a,
       CASE WHEN (n_the + n_a) * 20 >= n_tokens THEN 'en' ELSE 'other' END AS pred_lang
FROM s
""")
def q36(spark, sf):
    """Marker-token language-ID heuristic (stopword density).

    Counts are EXACT token-equality filters over the split array (JVM
    higher-order ``filter``/``size``, mirrored by DuckDB's
    ``list_filter``), not replace-length arithmetic — an earlier
    formulation's replacement-string lengths made ``n_a`` identically 0
    and scaled ``n_the`` by 1/6, classifying every document 'other' and
    reducing the oracle parity to a vacuous constant compare. The raw
    counts are part of the output so the oracle verifies the densities
    themselves, not just the thresholded label; at the 5% threshold both
    CASE branches fire on the fixture corpus (142/218 en docs → 'en')."""
    d = t(spark, sf, "documents")
    toks = F.split("text", " ", -1)
    n_tokens = F.size(toks)
    n_the = F.size(F.filter(toks, lambda x: x == F.lit("the")))
    n_a = F.size(F.filter(toks, lambda x: x == F.lit("a")))
    return d.select(
        "doc_id", "lang",
        n_tokens.alias("n_tokens"),
        n_the.alias("n_the"),
        n_a.alias("n_a"),
        F.when((n_the + n_a) * 20 >= n_tokens, F.lit("en"))
        .otherwise(F.lit("other")).alias("pred_lang"),
    )


@q("q37_quality_score", """
SELECT doc_id,
       length(text) AS n_chars_q,
       len(string_split(text, ' ')) AS n_tokens,
       CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')) AS avg_token_len,
       CASE WHEN length(text) BETWEEN 100 AND 2000
                 AND CAST(length(text) AS DOUBLE) / len(string_split(text, ' '))
                     BETWEEN 3.0 AND 12.0
            THEN 1 ELSE 0 END AS quality_ok
FROM documents
""")
def q37(spark, sf):
    """Length/word-shape quality gate (training-data filtering op)."""
    d = t(spark, sf, "documents")
    n_chars = F.length("text")
    n_tokens = F.size(F.split("text", " ", -1))
    avg_len = n_chars.cast("double") / n_tokens
    return d.select(
        "doc_id",
        n_chars.alias("n_chars_q"),
        n_tokens.alias("n_tokens"),
        avg_len.alias("avg_token_len"),
        F.when(
            n_chars.between(100, 2000) & avg_len.between(3.0, 12.0), 1
        ).otherwise(0).alias("quality_ok"),
    )


@q("q38_token_stats", """
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(n_chars) AS DOUBLE)
           / CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS chars_per_token
FROM documents
GROUP BY lang
""")
def q38(spark, sf):
    d = t(spark, sf, "documents")
    n_tokens = F.size(F.split("text", " ", -1)).cast("long")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tokens).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        (
            F.sum("n_chars").cast("double") / F.sum(n_tokens).cast("double")
        ).alias("chars_per_token"),
    )


@q("q39_fingerprint", _SHINGLE_SQL + """
SELECT doc_id,
       MIN(md5(shingle)) AS fingerprint,
       COUNT(DISTINCT shingle) AS n_distinct_shingles
FROM sh GROUP BY doc_id
""")
def q39(spark, sf):
    """Winnowing-lite document fingerprint: min hash over rolling word
    3-gram shingles + shingle cardinality."""
    sh = _shingles(spark, sf)
    return sh.groupBy("doc_id").agg(
        F.min(F.md5("shingle")).alias("fingerprint"),
        F.countDistinct("shingle").alias("n_distinct_shingles"),
    )


# ---------------------------------------------------------------------------
# Structured Streaming (real readStream → memory sink, drained to batch;
# over a bounded replay the result equals the batch SQL, which is the oracle)
# ---------------------------------------------------------------------------

@q("q40_stream_tumbling_window", """
SELECT epoch_us(time_bucket(INTERVAL '10 minutes', ts)) AS win_start_us,
       event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events
GROUP BY 1, 2
""")
def q40(spark, sf):
    from .streaming.events import tumbling_counts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return tumbling_counts(spark, sf)


@q("q41_stream_session_window", """
WITH ordered AS (
    -- >= gap, not >: Spark's session_window is END-EXCLUSIVE
    -- ([t, t+gap)), so an event exactly gap after its predecessor
    -- starts a NEW session; the islands sum orders by (ts, event_id)
    -- to stay deterministic under tied timestamps (same tiebreak
    -- is_start was computed with)
    SELECT user_id, ts, event_id,
           CASE WHEN epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                ) >= 300000000 OR LAG(ts) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id
                ) IS NULL
                THEN 1 ELSE 0 END AS is_start
    FROM events
), islands AS (
    SELECT user_id, ts,
           SUM(is_start) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS sess
    FROM ordered
)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       COUNT(*) AS n_events
FROM islands GROUP BY user_id, sess
""")
def q41(spark, sf):
    from .streaming.events import session_counts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return session_counts(spark, sf, gap="5 minutes")


@q("q42_stream_dedup", """
SELECT event_type, COUNT(DISTINCT event_id) AS n
FROM events GROUP BY event_type
""")
def q42(spark, sf):
    # Oracle-equivalence caveat (documented, data-dependent): the batch
    # COUNT(DISTINCT event_id) matches dropDuplicatesWithinWatermark
    # only while every duplicate event_id (a) arrives within the 2h
    # watermark of its first occurrence and (b) shares its event_type.
    # A replay beyond the watermark is deliberately re-counted by the
    # stream (state evicted — that IS the bounded-state semantics the
    # operator exists to provide) but not by the batch oracle. The
    # fixtures' event_ids are unique, so the comparison is exact there.
    from .streaming.events import streaming_dedup_counts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return streaming_dedup_counts(spark, sf)


# ---------------------------------------------------------------------------
# Crawl flagship (rows-only: wave semantics are verified against the
# golden reference simulator in tests/, not expressible in one SQL)
# ---------------------------------------------------------------------------

def _derived_graph_cfg(n_docs: int):
    """Deterministic GraphConfig derived from a testdata table size."""
    from .fixtures import GraphConfig

    n_domains = max(10, min(40, n_docs // 25))
    return GraphConfig(
        seed=42, n_domains=n_domains, pages_per_domain=10,
        links_per_page=4, n_seeds=8, img_sizes=(16,),
    )


def _purge_stale_cache(
    cache: str, prefix: str, keep: str, min_age_s: int = 3600
) -> None:
    """Evict ``.cache/<prefix>_<tag>`` siblings whose tag differs from
    ``keep``. Without this every package-code edit minted a fresh
    code-hash-tagged tree and the predecessors lived forever
    (code-review r5). Age-gated: a stale-tag dir younger than
    ``min_age_s`` may still be serving a CONCURRENT session running
    older code (e.g. the driver's verify while this session tests an
    edit), and deleting parquet under a lazy scan breaks it — the
    bound is "one live tree per kind, plus the last hour's churn"."""
    import os
    import shutil
    import time

    for name in os.listdir(cache):
        if not name.startswith(prefix + "_") or name == f"{prefix}_{keep}":
            continue
        p = os.path.join(cache, name)
        try:
            if time.time() - os.path.getmtime(p) >= min_age_s:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            pass  # raced by a concurrent purge


_PKG_CODE_HASH: list = []  # computed once per process


def _pkg_code_hash() -> str:
    """Content hash of every .py source in this package. Folded into the
    derived-crawl cache tag so ANY engine/fixture change invalidates the
    cache: a tag keyed only on (graph config, waves) would keep serving
    a pre-change trace to the driver's verify queries (q43/entry) after
    the crawl's behavior changed — hiding exactly the regressions those
    queries exist to catch (bench.py's prepare_graph versions its cache
    with GEN_V for the same reason; here the hash is automatic)."""
    if not _PKG_CODE_HASH:
        import hashlib
        import os

        pkg = os.path.dirname(os.path.abspath(__file__))
        h = hashlib.md5()
        for root, _dirs, files in sorted(os.walk(pkg)):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    p = os.path.join(root, fn)
                    h.update(os.path.relpath(p, pkg).encode())
                    with open(p, "rb") as f:
                        h.update(f.read())
        _PKG_CODE_HASH.append(h.hexdigest()[:8])
    return _PKG_CODE_HASH[0]


def crawl_trace_from_documents(spark, sf, max_waves=2):
    """Run the full crawl engine over a synthetic onion graph whose size
    is derived from the sf tier's documents table; returns the trace.

    Side-effect-clean (VERDICT.md r4 next-round #4): the derived graph
    AND its crawled snapshot store are built AT MOST ONCE per
    (sf, max_waves, package code version) under the repo's ``.cache/``
    with the q50 build-into-private-tmp + atomic-rename pattern —
    reruns (every driver verify calls this via q43 and ``entry()``)
    reuse the cached crawl instead of leaking two fresh /tmp trees per
    invocation, and concurrent sessions see either nothing or a
    complete, immutable directory."""
    import hashlib
    import os
    import shutil
    import tempfile

    from . import fixtures
    from .plans import crawl as C
    from .sources.tableio import SnapshotStore

    n_docs = t(spark, sf, "documents").count()
    cfg_g = _derived_graph_cfg(n_docs)
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache"
    )
    os.makedirs(cache, exist_ok=True)
    tag = hashlib.md5(
        f"{repr(cfg_g)}|waves={max_waves}|code={_pkg_code_hash()}".encode()
    ).hexdigest()[:8]
    path = os.path.join(cache, f"crawlq_{tag}")
    _purge_stale_cache(cache, "crawlq", tag)
    if not os.path.isdir(path):
        tmp = tempfile.mkdtemp(dir=cache, prefix=f"crawlq_{tag}_tmp")
        try:
            fixtures.write_parquet(fixtures.generate_all(cfg_g), tmp)
            C.run_crawl(
                spark,
                SnapshotStore(os.path.join(tmp, "snap")),
                C.load_pagestore(spark, f"{tmp}/pagestore.parquet"),
                spark.read.parquet(f"{tmp}/seeds.parquet"),
                spark.read.parquet(f"{tmp}/robots.parquet"),
                spark.read.parquet(f"{tmp}/politeness.parquet"),
                C.CrawlConfig(max_waves=max_waves, use_bloom=True,
                              bloom_shards=4, bloom_bits=1 << 14),
            )
        except BaseException:
            # a failed build must not strand a partial graph+snapshot
            # tree in .cache forever (only the rename-race loser path
            # cleaned up before)
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        try:
            os.rename(tmp, path)  # atomic; loser of a race cleans up
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    store = SnapshotStore(os.path.join(path, "snap"))
    return store.read_outputs(spark, "trace").orderBy("wave", "seq")


@q("q43_crawl_wave_trace", None)
def q43(spark, sf):
    return crawl_trace_from_documents(spark, sf, max_waves=2)


# ---------------------------------------------------------------------------
# Remaining §2.B coverage: pivot, except/union, part-table stats
# ---------------------------------------------------------------------------

_SIZE_BUCKETS = ["XS", "S", "M", "L"]


@q("q44_pivot", """
SELECT p_type,
       COALESCE(CAST(SUM(CASE WHEN p_size <= 12
           THEN CAST(round(p_retailprice * 100) AS BIGINT) END) AS BIGINT), 0) AS XS,
       COALESCE(CAST(SUM(CASE WHEN p_size > 12 AND p_size <= 25
           THEN CAST(round(p_retailprice * 100) AS BIGINT) END) AS BIGINT), 0) AS S,
       COALESCE(CAST(SUM(CASE WHEN p_size > 25 AND p_size <= 37
           THEN CAST(round(p_retailprice * 100) AS BIGINT) END) AS BIGINT), 0) AS M,
       COALESCE(CAST(SUM(CASE WHEN p_size > 37
           THEN CAST(round(p_retailprice * 100) AS BIGINT) END) AS BIGINT), 0) AS L
FROM part GROUP BY p_type
""")
def q44(spark, sf):
    """Pivot in integer cents; empty cells coalesced to 0 on both sides
    (a NULL cell turns the whole pandas column float64 on the DuckDB
    side — the driver-hash trap again)."""
    p = t(spark, sf, "part")
    bucket = (
        F.when(F.col("p_size") <= 12, "XS")
        .when(F.col("p_size") <= 25, "S")
        .when(F.col("p_size") <= 37, "M")
        .otherwise("L")
    )
    return (
        p.withColumn("bucket", bucket)
        .groupBy("p_type")
        .pivot("bucket", _SIZE_BUCKETS)
        .agg(F.sum(cents(F.col("p_retailprice"))))
        .na.fill(0, subset=_SIZE_BUCKETS)
    )


@q("q46_union_by_name", """
SELECT entity_id, kind FROM (
    SELECT c_custkey AS entity_id, 'customer' AS kind FROM customer WHERE c_nationkey = 7
    UNION ALL
    SELECT s_suppkey AS entity_id, 'supplier' AS kind FROM supplier WHERE s_nationkey = 7
)
""")
def q46(spark, sf):
    """Registered BEFORE q47-q50 this round: round 1 registered it 51st
    and the driver's report silently contained only the first 50
    (VERDICT.md "What's missing" #1)."""
    c = t(spark, sf, "customer").filter(F.col("c_nationkey") == 7).select(
        F.col("c_custkey").alias("entity_id"), F.lit("customer").alias("kind")
    )
    s = t(spark, sf, "supplier").filter(F.col("s_nationkey") == 7).select(
        F.col("s_suppkey").alias("entity_id"), F.lit("supplier").alias("kind")
    )
    return c.unionByName(s)


@q("q47_stream_sliding_window", """
WITH starts AS (
    SELECT epoch_us(time_bucket(INTERVAL '5 minutes', ts)) AS win_start_us, value
    FROM events
    UNION ALL
    SELECT epoch_us(time_bucket(INTERVAL '5 minutes', ts)) - 300000000 AS win_start_us, value
    FROM events
)
SELECT win_start_us, COUNT(*) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM starts GROUP BY win_start_us
""")
def q47(spark, sf):
    """Sliding event-time windows (10 min / 5 min): every event belongs
    to exactly two overlapping windows; oracle materializes both window
    starts per event and aggregates."""
    from .streaming.events import sliding_counts

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return sliding_counts(spark, sf)


# q48: SRP-LSH bucketing constants. Signs are a fixed deterministic
# ±1 matrix (K hyperplanes × D dims) generated by integer arithmetic
# that both engines reproduce exactly: Python evaluates it once and
# embeds the values as Spark literals, while the oracle SQL re-derives
# the SAME values from the formula inline — no engine hash parity to
# hope for. Bucket bits use fixed-point int64 dot products
# (floor(x·10^6), exact and summation-order-independent), so bucket
# assignment is bit-identical on both sides by construction.
Q48_SRP_K, Q48_EMB_DIM = 8, 64


def _srp_sign(k: int, j: int) -> int:
    return 1 if ((k * 2654435761 + j * 40503) % 97) < 48 else -1


@q("q48_dedup_embedding_cosine", """
WITH ej AS (
  SELECT vec_id, r.j,
         CAST(floor(CAST(embedding[CAST(r.j AS INT) + 1] AS DOUBLE)
                    * 1000000.0) AS BIGINT) AS ei
  FROM embeddings, range(64) AS r(j)
),
sg AS (
  SELECT r1.k, r2.j,
         CASE WHEN ((r1.k * 2654435761 + r2.j * 40503) % 97) < 48
              THEN 1 ELSE -1 END AS s
  FROM range(8) AS r1(k), range(64) AS r2(j)
),
bits AS (
  SELECT ej.vec_id, sg.k,
         CASE WHEN CAST(SUM(ej.ei * sg.s) AS BIGINT) >= 0
              THEN (CAST(1 AS BIGINT) << sg.k) ELSE CAST(0 AS BIGINT)
         END AS bitval
  FROM ej JOIN sg USING (j)
  GROUP BY ej.vec_id, sg.k
),
bk AS (
  SELECT vec_id, CAST(SUM(bitval) AS BIGINT) AS bucket
  FROM bits GROUP BY vec_id
),
v AS (
  SELECT e.vec_id, bk.bucket, e.embedding
  FROM embeddings e JOIN bk USING (vec_id)
)
SELECT id_a, id_b, bucket, cos FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.bucket AS bucket,
         round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
               p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6) AS cos
  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE cos >= 0.3
""")
def q48(spark, sf):
    """Embedding-cosine near-dup via signed-random-projection LSH:
    each vector gets a K-bit bucket (bit k = sign of its dot product
    with fixed ±1 hyperplane k), candidate pairs are generated ONLY
    within a bucket (an equi-join on ``bucket`` — never all-pairs),
    then the exact cosine is computed on candidates and thresholded.
    Unit-norm embeddings ⇒ cosine == dot (JVM zip_with/aggregate).

    100-TB posture: bucket assignment is a narrow per-row projection
    (K·D multiply-adds in whole-stage codegen, no shuffle); the only
    shuffle is the equi-join on ``bucket``, whose groups are ~n/2^K —
    at scale K grows with log(n) to hold group sizes flat, exactly the
    SRP-LSH recipe (complements q31's MinHash-LSH for text and q35's
    IVF for top-k retrieval). Bucket bits use fixed-point int64 math
    (floor(x·10^6)) so they are exact, summation-order-independent,
    and reproduced bit-identically by the DuckDB oracle from the same
    integer sign formula."""
    em = t(spark, sf, "embeddings")
    ei = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(1000000.0)),
    )
    v = em.select("vec_id", "embedding", ei.alias("ei"))
    bucket = F.lit(0).cast("long")
    for k in range(Q48_SRP_K):
        signs = F.array(*[
            F.lit(_srp_sign(k, j)).cast("long") for j in range(Q48_EMB_DIM)
        ])
        dot_k = F.aggregate(
            F.zip_with(F.col("ei"), signs, lambda x, y: x * y),
            F.lit(0).cast("long"), lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(
            dot_k >= 0, F.lit(1 << k).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    v = v.withColumn("bucket", bucket)
    a = v.select(
        F.col("vec_id").alias("id_a"), "bucket",
        F.col("embedding").alias("ea"),
    )
    b = v.select(
        F.col("vec_id").alias("id_b"), "bucket",
        F.col("embedding").alias("eb"),
    )
    dot = F.aggregate(
        F.zip_with("ea", "eb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "bucket", F.round(dot, 6).alias("cos"))
        .filter(F.col("cos") >= 0.3)
    )


@q("q49_grouping_sets", """
SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
       CAST(SUM(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""")
def q49(spark, sf):
    li = t(spark, sf, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag", "l_linestatus",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(cents(F.col("l_quantity"))).alias("sum_qty_c"),
        )
    )


@q("q50_text_scan", """
SELECT CAST(c_custkey % 10 AS BIGINT) AS bucket,
       COUNT(*) AS n_urls,
       MIN('http://d' || CAST(c_custkey AS VARCHAR) || '.onion/') AS first_url
FROM customer
GROUP BY 1
""")
def q50(spark, sf):
    """``spark.read.text`` scan surface (SURVEY.md §2.B scans row;
    VERDICT.md "What's missing" #2). Writes a seed-list-shaped text
    file (one URL per line) derived from the customer table, ingests it
    back through ``spark.read.text`` — the A1 production seed path, see
    ``plans/crawl.py::load_seeds_text`` — and re-derives the keys by
    parsing the lines; the oracle computes the same directly from the
    table, so parity proves the text round-trip is lossless.

    NOTE: the text file is materialized AT MOST ONCE per sf tier: it is
    written to a private temp dir and atomically renamed into the cache
    path only if absent (VERDICT.md r3 next-round #7 + ADVICE.md r3 —
    the eager overwrite-in-place both charged a Spark write job to
    every query build AND raced concurrent sessions benchmarking the
    same sf against each other's scans). Reruns and concurrent sessions
    see either nothing (and write their own tmp) or a complete,
    immutable directory."""
    import hashlib
    import os
    import shutil
    import tempfile

    c = t(spark, sf, "customer")
    url = F.concat(
        F.lit("http://d"), F.col("c_custkey").cast("string"), F.lit(".onion/")
    )
    cache = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache"
    )
    os.makedirs(cache, exist_ok=True)
    # the code hash is folded in (same rationale as the derived-crawl
    # cache): a tag keyed on sf alone kept serving a stale text file
    # after the URL expression changed, while the oracle computed from
    # the live table — a permanent parity failure until a manual rm
    tag = hashlib.md5(
        f"{sf}|code={_pkg_code_hash()}".encode()
    ).hexdigest()[:8]
    path = os.path.join(cache, f"ts_seedtxt_{tag}")
    _purge_stale_cache(cache, "ts_seedtxt", tag)
    if not os.path.isdir(path):
        tmp = tempfile.mkdtemp(dir=cache, prefix=f"ts_seedtxt_{tag}_tmp")
        try:
            c.select(url.alias("value")).write.mode("overwrite").text(tmp)
        except BaseException:
            shutil.rmtree(tmp, ignore_errors=True)
            raise
        try:
            os.rename(tmp, path)  # atomic; loser of a race cleans up
        except OSError:
            shutil.rmtree(tmp, ignore_errors=True)
    lines = spark.read.text(path)
    key = F.regexp_extract("value", r"d(\d+)\.onion", 1).cast("long")
    return lines.groupBy(F.pmod(key, F.lit(10)).alias("bucket")).agg(
        F.count("*").alias("n_urls"),
        F.min("value").alias("first_url"),
    )
