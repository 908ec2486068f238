"""Extended TPC-H query shapes (SURVEY.md §2.9, relational family).

The reference materializes a ledger schema whose consumers run exactly
these relational shapes (adjacency/volume analytics, reference
README.md:2); this module completes the TPC-H-derived coverage beyond
the Q1/Q3/Q4/Q5/Q6/Q13/Q18 entries in catalog_analytics/core.

The driver's tables omit ``partsupp`` and several TPC-H columns
(l_commitdate/l_receiptdate/l_shipmode, c_phone), so queries whose spec
needs them are *adapted shapes*: the join/subquery/aggregation structure
is preserved (that is what exercises the planner) with stand-in
predicates over the columns that exist. Each docstring names the swap.

Cross-engine exactness: terminal float aggregates round to 2 dp (money)
or 6 dp (ratios); ratios round numerator and denominator independently
before dividing so the one order-dependent reduction is the rounded sum
both engines agree on (established catalog convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import load_table, register

def _rev():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))
_REV_SQL = "l_extendedprice * (1 - l_discount)"


@register(
    "tpch_q7_bilateral_volume",
    f"""SELECT supp_nation, cust_nation, l_year,
              round(sum(volume), 2) AS revenue
       FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                    year(l.l_shipdate) AS l_year,
                    {_REV_SQL.replace('l_', 'l.l_')} AS volume
             FROM supplier s
             JOIN lineitem l ON s.s_suppkey = l.l_suppkey
             JOIN orders o ON o.o_orderkey = l.l_orderkey
             JOIN customer c ON c.c_custkey = o.o_custkey
             JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
             JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
             WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                 OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
               AND l.l_shipdate >= TIMESTAMP '1996-01-01'
               AND l.l_shipdate < TIMESTAMP '1998-01-01')
       GROUP BY 1, 2, 3""",
    doc="TPC-H Q7 shape (bilateral nation volume): the disjunctive "
        "two-nation pair predicate rides two broadcast nation joins "
        "(n1 on supplier, n2 on customer) — each filters its fact side "
        "before the one orders-lineitem shuffle. The OR-pair cannot be "
        "pushed to either scan alone, which is the planner test.",
    tags=("join", "agg", "tpch"),
)
def tpch_q7_bilateral_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    j = (
        s.join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _rev().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum("volume"), 2).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    f"""SELECT o_year,
              round(round(sum(CASE WHEN nation = 'NATION_3' THEN volume
                                   ELSE 0 END), 2)
                    / round(sum(volume), 2), 6) AS mkt_share
       FROM (SELECT year(o.o_orderdate) AS o_year,
                    {_REV_SQL.replace('l_', 'l.l_')} AS volume,
                    n2.n_name AS nation
             FROM part p
             JOIN lineitem l ON p.p_partkey = l.l_partkey
             JOIN orders o ON l.l_orderkey = o.o_orderkey
             JOIN customer c ON o.o_custkey = c.c_custkey
             JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
             JOIN region r ON n1.n_regionkey = r.r_regionkey
             JOIN supplier s ON l.l_suppkey = s.s_suppkey
             JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
             WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO')
       GROUP BY 1""",
    doc="TPC-H Q8 shape (market share): conditional-sum ratio per year — "
        "one nation's slice of a region's PROMO volume. Seven-way join "
        "where every dimension (part-filtered, nation x2, region) "
        "broadcasts and only orders-lineitem shuffles; the share is "
        "computed in ONE aggregate pass via CASE, not two joined "
        "subqueries. Num/den rounded before the divide (convention).",
    tags=("join", "agg", "tpch"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"), "n_regionkey")
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    per_year = j.select(
        F.year("o_orderdate").alias("o_year"),
        _rev().alias("volume"),
        "nation",
    ).groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(0.0)),
            2,
        ).alias("num"),
        F.round(F.sum("volume"), 2).alias("den"),
    )
    return per_year.select(
        "o_year", F.round(F.col("num") / F.col("den"), 6).alias("mkt_share")
    )


@register(
    "tpch_q9_product_profit",
    """SELECT n.n_name AS nation, year(o.o_orderdate) AS o_year,
              round(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)
                          * CAST(round((1 - l.l_discount) * 100) AS BIGINT)
                        - 50 * CAST(round(p.p_retailprice * 100) AS BIGINT)
                          * CAST(l.l_quantity AS BIGINT))
                    / 10000.0, 2) AS profit
       FROM part p
       JOIN lineitem l ON p.p_partkey = l.l_partkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN orders o ON o.o_orderkey = l.l_orderkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       WHERE p.p_name LIKE '%widget%'
       GROUP BY 1, 2""",
    doc="TPC-H Q9 shape (product-line profit by nation/year): LIKE-"
        "filtered part dimension -> fact join -> profit expression -> "
        "two-level rollup key. Adapted: no partsupp table in the driver "
        "data, so supply cost is the 0.5*p_retailprice*l_quantity "
        "stand-in — same expression shape (revenue minus joined-cost "
        "product), same join graph minus one edge. Profit accumulates "
        "in exact integer 1e-4-currency units (prices/discounts are "
        "2 dp, quantity integral) so the reduction is order-independent "
        "— the cancellation-heavy sum lands on cent boundaries that "
        "float accumulation would round differently per engine.",
    tags=("join", "agg", "tpch"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    units = (
        F.round(F.col("l_extendedprice") * 100).cast("long")
        * F.round((1 - F.col("l_discount")) * 100).cast("long")
        - F.lit(50)
        * F.round(F.col("p_retailprice") * 100).cast("long")
        * F.col("l_quantity").cast("long")
    )
    return (
        j.select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            units.alias("profit_units"),
        )
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("profit_units") / 10000.0, 2).alias("profit"))
    )


@register(
    "tpch_q10_returned_items",
    f"""SELECT c.c_custkey, c.c_name,
              round(sum({_REV_SQL.replace('l_', 'l.l_')}), 2) AS revenue,
              round(c.c_acctbal, 2) AS acctbal, n.n_name
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
         AND o.o_orderdate < TIMESTAMP '1997-01-01'
         AND l.l_returnflag = 'R'
       GROUP BY 1, 2, 4, 5
       ORDER BY revenue DESC, c.c_custkey LIMIT 20""",
    doc="TPC-H Q10 shape (returned-item customer ranking): quarter-"
        "scoped orders + returnflag-filtered lineitem -> revenue per "
        "customer -> top-20. Both fact filters push to the scans; the "
        "group key carries the customer attributes so no second join "
        "back to the dimension is needed; TakeOrderedAndProject cuts.",
    tags=("join", "agg", "topk", "tpch"),
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    j = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy(
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            "n_name",
        )
        .agg(F.round(F.sum(_rev()), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "acctbal", "n_name")
    )


@register(
    "tpch_q11_important_parts",
    """WITH pv AS (SELECT l_partkey,
                         sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                             * CAST(round((1 - l_discount) * 100) AS BIGINT))
                           AS units
                  FROM lineitem GROUP BY 1)
       SELECT l_partkey AS part_key, round(units / 10000.0, 2) AS part_value
       FROM pv
       WHERE units * 2000 > (SELECT sum(units) FROM pv)""",
    doc="TPC-H Q11 shape (important stock): per-key value vs a fraction "
        "of the GLOBAL total — a scalar subquery over the same "
        "aggregate. Adapted: no partsupp, so part value is lineitem "
        "revenue per partkey. Spark form: one groupBy produces pv, the "
        "global sum reduces pv (tiny) and broadcasts back as a cross-"
        "joined scalar — pv localCheckpointed so the shuffle runs once "
        "for both consumers. Revenue accumulates in exact integer 1e-4 "
        "units and the 0.05% threshold compares as units*2000 > total "
        "— fully integer, so the cut admits identical parts on both "
        "engines (a float threshold flips boundary parts per sum order).",
    tags=("agg", "subquery", "tpch"),
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    units = F.round(F.col("l_extendedprice") * 100).cast("long") * F.round(
        (1 - F.col("l_discount")) * 100
    ).cast("long")
    pv = (
        li.groupBy("l_partkey")
        .agg(F.sum(units).alias("units"))
        .localCheckpoint(eager=False)
    )
    thresh = pv.agg(F.sum("units").alias("total"))
    return (
        pv.crossJoin(F.broadcast(thresh))
        .filter(F.col("units") * 2000 > F.col("total"))
        .select(
            F.col("l_partkey").alias("part_key"),
            F.round(F.col("units") / 10000.0, 2).alias("part_value"),
        )
    )


@register(
    "tpch_q14_promo_share",
    f"""SELECT round(100.0 * round(sum(CASE WHEN p.p_type = 'PROMO'
                                          THEN {_REV_SQL.replace('l_', 'l.l_')}
                                          ELSE 0 END), 2)
                    / round(sum({_REV_SQL.replace('l_', 'l.l_')}), 2),
                  4) AS promo_revenue
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
         AND l.l_shipdate < TIMESTAMP '1997-04-01'""",
    doc="TPC-H Q14 shape (promotion share): month-scoped scan, broadcast "
        "part join, conditional/total ratio in one aggregate pass — the "
        "canonical CASE-inside-sum shape. Single-row output.",
    tags=("join", "agg", "tpch"),
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    agg = j.agg(
        F.round(
            F.sum(F.when(F.col("p_type") == "PROMO", _rev()).otherwise(0.0)), 2
        ).alias("num"),
        F.round(F.sum(_rev()), 2).alias("den"),
    )
    return agg.select(
        F.round(F.lit(100.0) * F.col("num") / F.col("den"), 4).alias(
            "promo_revenue"
        )
    )


@register(
    "tpch_q15_top_supplier",
    f"""WITH rev AS (SELECT l_suppkey AS supplier_no,
                          round(sum({_REV_SQL}), 2) AS total_revenue
                   FROM lineitem
                   WHERE l_shipdate >= TIMESTAMP '1997-01-01'
                     AND l_shipdate < TIMESTAMP '1997-04-01'
                   GROUP BY 1)
       SELECT s.s_suppkey, s.s_name, r.total_revenue
       FROM supplier s JOIN rev r ON s.s_suppkey = r.supplier_no
       WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)""",
    doc="TPC-H Q15 shape (top supplier): a revenue view consumed twice — "
        "once joined to the dimension, once reduced to its max as a "
        "scalar filter. The view is localCheckpointed so the quarter "
        "scan + groupBy shuffle run once; the max reduces the tiny "
        "per-supplier frame and broadcasts back.",
    tags=("agg", "subquery", "tpch"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.round(F.sum(_rev()), 2).alias("total_revenue"))
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(rev, F.col("s_suppkey") == F.col("supplier_no"))
        .crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16_supplier_variety",
    """SELECT p.p_brand, p.p_type, p.p_size,
              count(DISTINCT l.l_suppkey) AS supplier_cnt
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       WHERE p.p_brand <> 'Brand#1'
         AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
         AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                 WHERE s_acctbal < 0)
       GROUP BY 1, 2, 3""",
    doc="TPC-H Q16 shape (supplier variety per part class): negated "
        "dimension predicates + NOT IN subquery -> distinct-count per "
        "3-part key. Adapted: supplier-part pairs come from lineitem "
        "(no partsupp); the excluded-supplier subquery keys on negative "
        "acctbal (no comment column). NOT IN compiles to a broadcast "
        "left-anti join (s_suppkey is non-null, so NOT IN == anti).",
    tags=("join", "agg", "subquery", "tpch"),
)
def tpch_q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey")).join(
        F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return j.groupBy("p_brand", "p_type", "p_size").agg(
        F.countDistinct("l_suppkey").alias("supplier_cnt")
    )


@register(
    "tpch_q17_small_quantity",
    """SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       JOIN (SELECT l_partkey AS agg_pk,
                    round(0.2 * avg(l_quantity), 6) AS qty_cut
             FROM lineitem GROUP BY 1) a ON p.p_partkey = a.agg_pk
       WHERE p.p_brand = 'Brand#13' AND l.l_quantity < a.qty_cut""",
    doc="TPC-H Q17 shape (small-quantity revenue): the correlated "
        "per-part AVG subquery decorrelated into a groupBy + equi-join "
        "— the rewrite Catalyst itself applies to correlated scalar "
        "subqueries, written explicitly. The per-part average joins "
        "back to the brand-filtered fact; cut rounded to 6 dp so both "
        "engines agree on the boundary.",
    tags=("join", "agg", "subquery", "tpch"),
)
def tpch_q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    cuts = li.groupBy(F.col("l_partkey").alias("agg_pk")).agg(
        F.round(0.2 * F.avg("l_quantity"), 6).alias("qty_cut")
    )
    j = (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(cuts), F.col("p_partkey") == F.col("agg_pk"))
        .filter(F.col("l_quantity") < F.col("qty_cut"))
    )
    return j.agg(
        F.round(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly")
    )


@register(
    "tpch_q19_disjunctive_revenue",
    f"""SELECT round(sum({_REV_SQL.replace('l_', 'l.l_')}), 2) AS revenue,
              count(*) AS n_rows
       FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
       WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
              AND l.l_quantity BETWEEN 1 AND 11)
          OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 25
              AND l.l_quantity BETWEEN 10 AND 20)
          OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 35
              AND l.l_quantity BETWEEN 20 AND 30)""",
    doc="TPC-H Q19 shape (disjunctive predicate join): OR of three "
        "conjunct groups, each spanning BOTH join sides — the planner "
        "must keep the equi-join key while evaluating the residual OR "
        "above it, and can push the per-side implied disjunctions "
        "(brand IN (...), quantity <= 30) down to each scan.",
    tags=("join", "agg", "tpch"),
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return j.filter(cond).agg(
        F.round(F.sum(_rev()), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "tpch_q21_waiting_supplier",
    """WITH late AS (
         SELECT l.l_orderkey, l.l_suppkey
         FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
         WHERE o.o_orderstatus = 'F'
           AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
       SELECT s.s_name, count(*) AS numwait
       FROM late l1
       JOIN supplier s ON s.s_suppkey = l1.l_suppkey
       WHERE EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM late l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey)
       GROUP BY 1
       ORDER BY numwait DESC, s.s_name LIMIT 10""",
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): the "
        "EXISTS / NOT EXISTS pair over the same fact — a left-semi "
        "join (some OTHER supplier on the order) stacked on a "
        "left-anti join (no OTHER supplier was late). Adapted: no "
        "l_commitdate/l_receiptdate, so 'late' is shipdate > orderdate "
        "+ 90 days. `late` is localCheckpointed — it feeds both the "
        "probe side and the anti side.",
    tags=("join", "subquery", "topk", "tpch"),
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    late = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .localCheckpoint(eager=False)
    )
    others = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    l1 = late.join(
        others,
        (F.col("ok2") == F.col("l_orderkey")) & (F.col("sk2") != F.col("l_suppkey")),
        "left_semi",
    ).join(
        late_others,
        (F.col("ok3") == F.col("l_orderkey")) & (F.col("sk3") != F.col("l_suppkey")),
        "left_anti",
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        l1.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "tpch_q22_idle_customers",
    """WITH thresh AS (SELECT round(avg(c_acctbal), 2) AS ab
                      FROM customer WHERE c_acctbal > 0),
            active AS (SELECT DISTINCT o_custkey FROM orders
                       WHERE o_orderdate >= TIMESTAMP '2000-01-01')
       SELECT c.c_mktsegment AS segment, count(*) AS numcust,
              round(sum(c.c_acctbal), 2) AS totacctbal
       FROM customer c, thresh
       WHERE c.c_acctbal > thresh.ab
         AND c.c_custkey NOT IN (SELECT o_custkey FROM active)
       GROUP BY 1""",
    doc="TPC-H Q22 shape (idle wealthy customers): scalar-average "
        "threshold + anti join against recent orders, grouped "
        "counts/sums. Adapted: no c_phone, so the group key is the "
        "market segment and 'no orders at all' (empty at this SF) "
        "becomes 'no orders since 2000'. The average broadcasts as a "
        "cross-joined scalar; NOT IN compiles to left-anti on the "
        "distinct active-customer set.",
    tags=("join", "agg", "subquery", "tpch"),
)
def tpch_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    thresh = (
        c.filter(F.col("c_acctbal") > 0)
        .agg(F.round(F.avg("c_acctbal"), 2).alias("ab"))
    )
    active = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(active, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


@register(
    "tpch_q2_min_cost_supplier",
    """WITH cost AS (SELECT l_partkey, l_suppkey,
                           min(l_extendedprice / l_quantity) AS unit_cost
                    FROM lineitem
                    WHERE l_partkey IN (SELECT p_partkey FROM part
                                        WHERE p_type = 'STANDARD'
                                          AND p_size <= 15)
                    GROUP BY 1, 2),
            elig AS (SELECT c.l_partkey, c.unit_cost,
                            s.s_name, s.s_suppkey, s.s_acctbal, n.n_name
                     FROM cost c
                     JOIN supplier s ON s.s_suppkey = c.l_suppkey
                     JOIN nation n ON n.n_nationkey = s.s_nationkey
                     JOIN region r ON r.r_regionkey = n.n_regionkey
                     WHERE r.r_name = 'EUROPE'),
            best AS (SELECT *, row_number() OVER (
                                PARTITION BY l_partkey
                                ORDER BY unit_cost, s_suppkey) AS rn
                     FROM elig)
       SELECT round(s_acctbal, 2) AS acctbal, s_name, n_name AS nation,
              l_partkey AS partkey,
              floor(unit_cost * 10000) / 10000 AS best_cost
       FROM best WHERE rn = 1
       ORDER BY acctbal DESC, s_name, partkey LIMIT 100""",
    doc="TPC-H Q2 shape (min-cost supplier per part, region-scoped): the "
        "correlated MIN subquery decorrelated into argmin-by-row_number "
        "(same engine convention as argmin_cheapest_supplier, which is "
        "this query's inner core), then joined back to dims. Adapted: no "
        "partsupp, so (part, supplier) unit cost aggregates from "
        "lineitem; part filter p_type/p_size and region filter EUROPE "
        "stand in for Q2's BRASS/size/region. The planner test: the "
        "part filter is applied as a broadcast semi-join BEFORE the "
        "(partkey, suppkey) aggregation — pushdown through the agg that "
        "a naive translation (aggregate everything, filter later) "
        "misses; supplier-nation-region prunes the other input the same "
        "way. Ranks raw doubles (exact IEEE compare), display "
        "truncation floor(x*1e4)/1e4 — both bit-identical cross-engine.",
    tags=("join", "window", "subquery", "topk", "tpch"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part_keys = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        F.broadcast(part_keys),
        F.col("l_partkey") == F.col("p_partkey"),
        "left_semi",
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    dims = (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    elig = cost.join(F.broadcast(dims), F.col("s_suppkey") == F.col("l_suppkey"))
    w = Window.partitionBy("l_partkey").orderBy("unit_cost", "s_suppkey")
    return (
        elig.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.round("s_acctbal", 2).alias("acctbal"),
            "s_name",
            F.col("n_name").alias("nation"),
            F.col("l_partkey").alias("partkey"),
            (F.floor(F.col("unit_cost") * 10000) / 10000).alias("best_cost"),
        )
        .orderBy(F.desc("acctbal"), F.asc("s_name"), F.asc("partkey"))
        .limit(100)
    )


@register(
    "tpch_q12_late_priority",
    """SELECT l.l_returnflag AS flag,
              sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
              sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END)::BIGINT AS low_line_count
       FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
         AND l.l_shipdate < TIMESTAMP '1998-01-01'
         AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
       GROUP BY 1""",
    doc="TPC-H Q12 shape (late-shipment priority split): conditional "
        "counts of high/low-priority orders among late lines, grouped. "
        "Adapted: no l_shipmode/l_commitdate/l_receiptdate — the group "
        "key is l_returnflag and 'late' is shipdate > orderdate + 60 "
        "days. The planner test is the residual join predicate "
        "(shipdate vs orderdate) that references BOTH sides: it cannot "
        "push to either scan, must evaluate post-join, while the "
        "shipdate year range DOES push to the lineitem scan. One "
        "shuffle join + one hash agg; both CASE branches ride the same "
        "aggregate pass.",
    tags=("join", "agg", "tpch"),
)
def tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q20_excess_suppliers",
    """WITH vol AS (SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
                   FROM lineitem
                   WHERE l_partkey IN (SELECT p_partkey FROM part
                                       WHERE p_type = 'PROMO')
                     AND l_shipdate >= TIMESTAMP '1997-01-01'
                     AND l_shipdate < TIMESTAMP '1998-01-01'
                   GROUP BY 1, 2),
            thresh AS (SELECT avg(qty) * 1.5 AS t FROM vol),
            heavy AS (SELECT DISTINCT l_suppkey FROM vol, thresh
                      WHERE qty > t)
       SELECT s.s_name, round(s.s_acctbal, 2) AS acctbal
       FROM supplier s
       JOIN nation n ON n.n_nationkey = s.s_nationkey
       WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
         AND s.s_suppkey IN (SELECT l_suppkey FROM heavy)""",
    doc="TPC-H Q20 shape (suppliers holding excess stock): the nested "
        "IN-subquery stack — parts filtered by type, per-(supplier, "
        "part) shipped volume aggregated, a scalar threshold derived "
        "from that same aggregate (Q20's 0.5*sum(qty) flavor), then "
        "supplier semi-joined through the heavy set and a nation "
        "filter. Adapted: no partsupp/p_name, so availqty becomes "
        "shipped volume and 'forest%' becomes p_type = 'PROMO'; the "
        "single nation becomes a 3-nation IN. Plan: part keys "
        "broadcast-semi-join into lineitem BEFORE the agg; the scalar "
        "threshold broadcasts as a cross-joined 1-row frame; both "
        "IN-subqueries compile to left-semi joins, never to "
        "distinct-join-dedup. l_quantity is integer-valued, so avg() "
        "is an exact-integer sum / count — deterministic cross-engine.",
    tags=("join", "agg", "subquery", "tpch"),
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    promo = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(promo), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    )
    vol = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    # threshold and heavy both consume vol: evaluate it once
    vol = vol.localCheckpoint(eager=False)
    thresh = vol.agg((F.avg("qty") * 1.5).alias("t"))
    heavy = (
        vol.crossJoin(F.broadcast(thresh))
        .filter(F.col("qty") > F.col("t"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3")
    )
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
    )
