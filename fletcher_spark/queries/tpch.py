"""Flagship relational queries (TPC-H shapes) over the test star schema.

These exercise the end-to-end slice from SURVEY.md §7 step 1: parquet
scan → pushed-down filter → null-aware arithmetic projection → hash
aggregate (partial+final) → sort.  The reference delegates all of this
to pandas (SURVEY.md §2.8); here it is native Catalyst.

Scale notes (100 TB): every query below is a declarative plan —
predicate pushdown reaches the parquet scan, aggregations are partial
before the shuffle, and the small dimension sides of joins are
broadcast (`F.broadcast`) so the fact table never shuffles for them.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from fletcher_spark.functions.timeutil import epoch_seconds
from fletcher_spark.io import load_tables
from fletcher_spark.queries.registry import query

#: Exact fixed-point accumulation (r13): TPC-H defines these columns
#: as DECIMAL, and at .tmp/sf10 (100×) the engines' double-sum
#: accumulation orders diverge in the 4th decimal at 1e11 magnitudes —
#: no double formulation can pass the driver's 4-decimal float canon
#: there.  Mechanism: each row's money value is converted to its EXACT
#: scaled integer (quantity/price/discount are 2-decimal; price×(1−d)
#: is exactly 4-decimal; ×(1+tax) exactly 6-decimal) via
#: floor(x·10^s + 0.5) — the per-row double products are bit-identical
#: across engines (same IEEE ops) and land within ~5e-5 of the integer
#: target, so the floor is unambiguous; BIGINT sums are then
#: associative (order-independent — bit-reproducible under any
#: partitioning/AQE layout); and the final BIGINT→double conversion
#: plus the division by the scale are the same two correctly-rounded
#: IEEE ops in both engines, even beyond 2^53.  Averages divide the
#: sum-double by the count — deterministic — with no re-rounding
#: (rounding a double re-introduces representation ties).  Integer
#: (not DECIMAL) accumulation keeps the aggregate long-typed inside
#: whole-stage codegen: the decimal form measured 3.5× slower at
#: sf0.1 (0.99 s vs 0.28 s min-of-3), and >18-digit Spark decimals
#: fall off the long-backed fast path entirely.  Overflow window:
#: charge micro-units sum ≈ 2.8e17 at sf10, bound 9.2e18 (~sf300).
_Q1_ORACLE = """
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(floor(l_quantity * 100 + 0.5)::BIGINT) AS DOUBLE) / 100.0      AS sum_qty,
  CAST(sum(floor(l_extendedprice * 100 + 0.5)::BIGINT) AS DOUBLE) / 100.0 AS sum_base_price,
  CAST(sum(floor(l_extendedprice * (1 - l_discount) * 10000 + 0.5)::BIGINT) AS DOUBLE) / 10000.0 AS sum_disc_price,
  CAST(sum(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1000000 + 0.5)::BIGINT) AS DOUBLE) / 1000000.0 AS sum_charge,
  CAST(sum(floor(l_quantity * 100 + 0.5)::BIGINT) AS DOUBLE) / 100.0 / count(*)      AS avg_qty,
  CAST(sum(floor(l_extendedprice * 100 + 0.5)::BIGINT) AS DOUBLE) / 100.0 / count(*) AS avg_price,
  CAST(sum(floor(l_discount * 100 + 0.5)::BIGINT) AS DOUBLE) / 100.0 / count(*)      AS avg_disc,
  count(*)                                                                AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


@query("q1_pricing_summary", oracle=_Q1_ORACLE)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan → filter → arithmetic → groupBy agg → sort.

    Plan shape to verify in .explain(): Parquet scan with
    PushedFilters=[LessThanOrEqual(l_shipdate,...)], partial
    HashAggregate before the exchange, final after.
    """
    li = load_tables(spark, sf_dir)["lineitem"]

    # exact fixed-point accumulation — see the _Q1_ORACLE note (r13):
    # per-row scaled-integer conversion, associative BIGINT sums
    # (order-independent = bit-reproducible at any scale/partitioning),
    # deterministic integer→double at the end; stays long-typed inside
    # whole-stage codegen (the decimal form measured 3.5× slower)
    def fx(col: Column, scale: int) -> Column:
        return F.floor(col * scale + F.lit(0.5)).cast("long")

    qty_c = fx(F.col("l_quantity"), 100)
    price_c = fx(F.col("l_extendedprice"), 100)
    disc_c = fx(F.col("l_discount"), 100)
    dp_u4 = fx(F.col("l_extendedprice") * (1 - F.col("l_discount")), 10000)
    ch_u6 = fx(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
        1000000,
    )
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(qty_c).cast("double") / 100.0).alias("sum_qty"),
            (F.sum(price_c).cast("double") / 100.0).alias("sum_base_price"),
            (F.sum(dp_u4).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(ch_u6).cast("double") / 1000000.0).alias("sum_charge"),
            (F.sum(qty_c).cast("double") / 100.0 / n).alias("avg_qty"),
            (F.sum(price_c).cast("double") / 100.0 / n).alias("avg_price"),
            (F.sum(disc_c).cast("double") / 100.0 / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q3_ORACLE = """
SELECT
  l_orderkey,
  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
  epoch(o_orderdate)::BIGINT                        AS o_orderdate_epoch,
  o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate  > TIMESTAMP '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 20
"""


@query("q3_shipping_priority", oracle=_Q3_ORACLE)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim (customer) broadcast-joined to the
    fact chain, aggregate, top-k (TakeOrderedAndProject — no full sort).
    """
    t = load_tables(spark, sf_dir)
    cust = t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    orders = t["orders"].filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = t["lineitem"].filter(F.col("l_shipdate") > F.lit("1995-03-15").cast("timestamp"))
    return (
        li.join(
            orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select(
            "l_orderkey",
            "revenue",
            epoch_seconds("o_orderdate").alias("o_orderdate_epoch"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(20)
    )


_Q5_ORACLE = """
SELECT
  n_name,
  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM customer
JOIN orders   ON c_custkey   = o_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
JOIN supplier ON l_suppkey   = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


@query("q5_local_supplier_volume", oracle=_Q5_ORACLE)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join.  region/nation/supplier/customer are
    dimension-sized → broadcast; only orders⋈lineitem shuffles, on the
    join key, once."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    dim = (
        t["supplier"]
        .join(F.broadcast(t["nation"]), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    return (
        t["lineitem"]
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        # customer is the largest sf-proportional dimension: no forced
        # broadcast — AQE picks broadcast vs shuffle from runtime stats.
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(dim),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


@query(
    "q6_forecast_revenue",
    oracle="""
SELECT round(sum(l_extendedprice * l_discount), 4) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1996-01-01'
  AND l_shipdate < DATE '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: the pure pushdown showcase — every predicate reaches
    the parquet reader (range + between + less-than all appear in
    PushedFilters), then one partial+final agg over the survivors.  At
    100 TB this query's cost is the row groups that pass min/max
    pruning, not table size."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"]
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("date"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias("revenue")
        )
    )


@query(
    "q10_returned_items",
    oracle="""
SELECT
  c_custkey,
  c_name,
  round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
  n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= DATE '1996-10-01'
  AND o_orderdate < DATE '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue by customer — fact⋈fact join
    (orders⋈lineitem, both filtered BEFORE the join so the shuffle
    carries survivors only), broadcast nation dim, top-20 via
    TakeOrderedAndProject."""
    t = load_tables(spark, sf_dir)
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    )
    li = t["lineitem"].filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "revenue"
            )
        )
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q14_promo_revenue",
    oracle="""
SELECT
  round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 4) AS promo_revenue_pct
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-02-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation over a fact⋈dim join.
    The month filter is pushed to the lineitem scan; the CASE folds
    into the partial aggregate, so the join output never materializes
    a wide row.  part is hint-broadcast: it is narrow and month-filter
    joins touch a bounded slice — but unlike nation/region it grows
    with sf, so at extreme scale drop the hint and let AQE decide
    (same reasoning that removed the q5 customer hint in round 1)."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-02-01").cast("date"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct")
        )
    )


@query(
    "q19_disjunctive_filters",
    oracle="""
SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE
  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
     AND l_quantity >= 1 AND l_quantity <= 20)
  OR (p_brand = 'Brand#7' AND p_size BETWEEN 10 AND 30
     AND l_quantity >= 10 AND l_quantity <= 30)
  OR (p_brand = 'Brand#13' AND p_size BETWEEN 20 AND 50
     AND l_quantity >= 20 AND l_quantity <= 40)
""",
)
def q19_disjunctive_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides
    (adapted to this schema's columns — no p_container here).  Catalyst
    derives single-side implications from the disjunction (l_quantity
    ∈ [1,40] pushes to the lineitem scan, p_size/p_brand bounds to the
    part scan) BEFORE the join — the classic constraint-propagation
    test; the residual OR evaluates post-join in codegen."""
    t = load_tables(spark, sf_dir)
    li, p = t["lineitem"], t["part"]
    joined = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "revenue"
        )
    )


def _subquery_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register `<table>_sq` temp views for the SQL-form subquery shapes.

    The decorrelation family (Q4/Q17/Q18/Q22) is expressed as SQL text:
    EXISTS / IN / correlated-scalar subqueries have no first-class
    DataFrame form, and the point of these queries is that Catalyst's
    RewriteCorrelatedScalarSubquery / RewritePredicateSubquery turn
    them into ordinary (semi/anti/aggregate) joins — the same SQL text
    runs on DuckDB as the oracle.
    """
    tables = load_tables(spark, sf_dir)
    for name in names:
        tables[name].createOrReplaceTempView(name + "_sq")


@query(
    "q4_order_priority_exists",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""",
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS (adapted: this schema has no
    l_commitdate/l_receiptdate, so the inner predicate is a returned
    flag).  Catalyst's RewritePredicateSubquery turns the EXISTS into a
    LEFT SEMI join on l_orderkey; the quarter filter pushes to the
    orders scan, so the semi-join probe side is already pruned — at
    100 TB the shuffle is bounded by one quarter of orders, and the
    lineitem build side carries only (l_orderkey) after column pruning.
    Reference hosts this via pandas merge (SURVEY §2.8)."""
    _subquery_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders_sq
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1996-04-01'
          AND EXISTS (SELECT 1 FROM lineitem_sq
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
        """
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
FROM lineitem l
JOIN part p ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem l2
                          WHERE l2.l_partkey = l.l_partkey)
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar-aggregate subquery.  Catalyst
    decorrelates into a per-partkey Aggregate joined back on the
    correlation key — ONE shuffle of lineitem on l_partkey computes
    every per-part average (partial aggregates map-side), instead of
    the naive per-outer-row rescan; the Brand filter broadcasts from
    part and prunes before the expensive join at scale."""
    _subquery_views(spark, sf_dir, "lineitem", "part")
    return spark.sql(
        """
        SELECT round(sum(l_extendedprice) / 7.0, 4) AS avg_yearly
        FROM lineitem_sq l
        JOIN part_sq p ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#3'
          AND l_quantity < 0.5 * (SELECT avg(l2.l_quantity) FROM lineitem_sq l2
                                  WHERE l2.l_partkey = l.l_partkey)
        """
    )


@query(
    "q18_large_volume_customers",
    oracle="""
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS DATE)   AS o_odate,
       round(o_totalprice, 4)      AS o_price,
       round(sum(l_quantity), 4)   AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 190)
GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 100
""",
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN over a grouped-HAVING subquery.  The inner
    aggregate reduces lineitem to a small qualifying-key set BEFORE
    any join (map-side partial sums, HAVING filters post-aggregate),
    so the IN becomes a semi-join against ~0.1% of keys; at 100 TB
    AQE will broadcast that key set and the 3-way join never shuffles
    orders on anything but its natural key.  Top-k via
    TakeOrderedAndProject, never a global sort."""
    _subquery_views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(
        """
        SELECT c_name, c_custkey, o_orderkey,
               CAST(o_orderdate AS DATE)   AS o_odate,
               round(o_totalprice, 4)      AS o_price,
               round(sum(l_quantity), 4)   AS total_qty
        FROM customer_sq
        JOIN orders_sq   ON c_custkey = o_custkey
        JOIN lineitem_sq ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem_sq
                             GROUP BY l_orderkey HAVING sum(l_quantity) > 190)
        GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 100
        """
    )


@query(
    "q22_idle_rich_customers",
    oracle="""
SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 4) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '2000-06-01')
GROUP BY c_mktsegment
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: no c_phone column, so the cohort key
    is c_mktsegment and "no recent orders" replaces "never ordered" —
    every synthetic customer has orders).  Two decorrelations in one
    plan: the uncorrelated scalar AVG becomes a single-row broadcast
    (one reduction pass, reused for every row), and NOT EXISTS becomes
    a LEFT ANTI join whose build side is date-pruned at the orders
    scan.  customer is scanned once for the main branch and once for
    the average — at 100 TB both are column-pruned to one float."""
    _subquery_views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_mktsegment, count(*) AS numcust, round(sum(c_acctbal), 4) AS totacctbal
        FROM customer_sq c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_sq WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM orders_sq o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= TIMESTAMP '2000-06-01')
        GROUP BY c_mktsegment
        """
    )


@query(
    "q7_volume_shipping",
    oracle="""
SELECT supp_nation, cust_nation, l_year, round(sum(volume), 4) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bi-directional trade volume between a nation pair.

    Supplier-side pruning happens BEFORE the fact shuffle: nation is
    filtered to the two names, broadcast into supplier, and the
    (tiny) qualifying supplier set broadcast into lineitem — so only
    lineitem rows from the two nations' suppliers reach the
    orders⋈lineitem shuffle.  The customer side resolves after, with
    the pair-disjunction as a residual.  At 100 TB: one fact shuffle
    on l_orderkey, every dimension broadcast, 2-year predicate pushed
    to the scan."""
    t = load_tables(spark, sf_dir)
    names = ("NATION_1", "NATION_2")
    n1 = (
        t["nation"]
        .filter(F.col("n_name").isin(*names))
        .select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        t["nation"]
        .filter(F.col("n_name").isin(*names))
        .select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    )
    supp = t["supplier"].join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("date"))
    )
    cust = t["customer"].join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
    pair = (
        (F.col("supp_nation") == names[0]) & (F.col("cust_nation") == names[1])
    ) | ((F.col("supp_nation") == names[1]) & (F.col("cust_nation") == names[0]))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(vol), 4).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
SELECT o_year,
       round(sum(CASE WHEN nation = 'NATION_5' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share
FROM (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND o_orderdate BETWEEN DATE '1996-01-01' AND DATE '1997-12-31'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one nation's share of PROMO-part revenue into ASIA.

    The deepest join tree in the suite (8 relations).  part is
    filtered to one p_type BEFORE its broadcast (1/6 of rows), so the
    first fact join is also the most selective; customer resolves to
    a region via nation⋈region broadcast; the supplier nation rides
    along only to label rows for the conditional numerator — the
    share is a single conditional-sum / sum over the same rows, one
    final 2-row aggregate.  At 100 TB the only shuffles are
    lineitem⋈orders and orders⋈customer."""
    t = load_tables(spark, sf_dir)
    part = t["part"].filter(F.col("p_type") == "PROMO")
    asia_nk = (
        t["nation"]
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("c_nk"))
    )
    n2 = t["nation"].select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("nation")
    )
    supp = t["supplier"].join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
    orders = t["orders"].filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate") <= F.lit("1997-12-31").cast("date"))
    )
    cust = t["customer"].join(F.broadcast(asia_nk), F.col("c_nationkey") == F.col("c_nk"))
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("volume", vol)
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(F.lit(0.0)))
                / F.sum("volume"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of order counts per customer (adapted:
    the o_comment NOT LIKE filter becomes an o_orderpriority exclusion
    — same shape: a filter INSIDE the outer-join condition, so
    customers whose orders all fail it still appear with count 0,
    which a WHERE clause would destroy).  Two cascaded aggregations:
    the first shuffles on c_custkey (same key as the join — AQE reuses
    the exchange), the second groups ~tens of distinct counts, so the
    final shuffle is trivially small at any scale."""
    t = load_tables(spark, sf_dir)
    joined = t["customer"].join(
        t["orders"],
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderpriority") != "1-URGENT"),
        "left",
    )
    counts = joined.groupBy("c_custkey").agg(F.count("o_orderkey").alias("c_count"))
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS s_suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1996-04-01'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s_name, total_revenue
FROM supplier s
JOIN revenue USING (s_suppkey)
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue.

    The revenue "view" is computed once and reused for both the
    per-supplier rows and the scalar MAX — Spark caches nothing here;
    instead the MAX side is a 1-row aggregate broadcast back as a
    LEFT SEMI join on the (pre-rounded) revenue value, so no global
    sort and no window over a single partition.  Rounding to 4dp
    BEFORE the max-equality comparison keeps the float tie exact on
    both engines.  At 100 TB: one shuffle on l_suppkey (bounded by
    supplier count), the max join is 1 row."""
    t = load_tables(spark, sf_dir)
    li = t["lineitem"].filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("date"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("date"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("s_suppkey")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
            "total_revenue"
        )
    )
    mx = rev.agg(F.max("total_revenue").alias("total_revenue"))
    top = rev.join(F.broadcast(mx), "total_revenue", "leftsemi")
    return (
        t["supplier"]
        .join(F.broadcast(top), "s_suppkey")
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )
