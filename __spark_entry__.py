"""Driver contract for the spark-graft builder (PySpark target).

Every operator family from SURVEY.md §2 is exposed as a named query with
a DuckDB oracle.  Spark implementations go through the ``scespet_spark``
package (the engine under test); oracles are plain ANSI SQL over the
same parquet views.

Float-parity convention: any aggregated money/value column is summed as
DECIMAL (exact, order-independent) and cast back to DOUBLE in *both*
engines, so value-hashes match bit-for-bit regardless of partial-agg
order.  Ratios divide those exact doubles (IEEE division is correctly
rounded, hence deterministic).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from scespet_spark import AFTER, BEFORE, Count, Every, Stream, Trigger
from scespet_spark.sources.batch import events_stream, load_table

_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
_ORACLES: dict[str, str] = {}

#: Queries that deliberately ship WITHOUT a value oracle (driver records
#: the weaker rows/schema-only check).  Membership requires a docstring
#: justification on the query; tests/test_entry_contract.py enforces
#: that everything else has full oracle SQL.
ROWS_ONLY: set[str] = set()
# r10: the tokenizer/packing family left this set — their outputs stay
# heuristic (merge order, Viterbi segmentations, FFD bin choice are
# not SQL-expressible; exact behavior pinned in pytest), but each
# query now EMITS its invariants (losslessness, conservation,
# feasibility, model structure) computed from the real operator
# output, which DuckDB predicts from the source tables — full
# hash-checked driver rows instead of rows-only.
# late-r10: the two approx sketches followed (the last members): the
# sketch estimates stay engine-specific, but each query now emits its
# exact halves plus sketch-error-bound booleans (HLL++ 5% rsd;
# approx_percentile rank-error bracket), so EVERY registered query
# carries a hash-checked oracle.


def query(name: str, oracle: str | None = None):
    def deco(fn):
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn
    return deco


def _dsum(col, scale: str = "18,2"):
    """Order-independent exact sum, emitted as double (see module doc)."""
    return F.sum(F.col(col).cast(f"decimal({scale})")).cast("double")


# ===========================================================================
# Relational surface (SURVEY §2.6 — free from Spark; checkable wrappers)
# ===========================================================================


@query("q1_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
       CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            / COUNT(*) AS DOUBLE) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""")
def q1(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    sum_qty = _dsum("l_quantity")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        sum_qty.alias("sum_qty"),
        _dsum("l_extendedprice").alias("sum_base_price"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
              * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
         .cast("double").alias("sum_disc_price"),
        (sum_qty / F.count("*")).alias("avg_qty"),
        F.count("*").alias("count_order"),
    )


@query("q3_order_revenue", """
SELECT o_orderkey, o_orderdate,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""")
def q3(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    # semi-join reduction first (filtered customer prunes ~4/5 of orders
    # before the big lineitem join); join strategy is left to AQE —
    # customer scales with SF, so a hard-coded broadcast would OOM at
    # 100TB while AQE still broadcasts it when runtime stats are small
    o_building = (o.join(c.select("c_custkey"), o.o_custkey == c.c_custkey)
                  .select("o_orderkey", "o_orderdate"))
    return (li.select("l_orderkey", rev.alias("__rev"))
              .join(o_building, li.l_orderkey == F.col("o_orderkey"))
              .groupBy("o_orderkey", "o_orderdate")
              .agg(F.sum("__rev").cast("double").alias("revenue"))
              .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
              .limit(10))


@query("q5_local_supplier_volume", """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""")
def q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-way join with the local-supplier (c_nationkey =
    s_nationkey) correlation.  nation/region are fixed-size -> explicit
    broadcast; SF-scaled joins left to AQE (q3 rationale)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01"))
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(s, (F.col("l_suppkey") == F.col("s_suppkey"))
                  & (F.col("c_nationkey") == F.col("s_nationkey")))
            .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
            .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
            .groupBy("n_name")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), F.col("n_name")))


@query("q6_forecast_revenue", """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""")
def q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure filter + aggregate — the query that proves
    predicate pushdown (every filter reaches the parquet scan) and
    map-side combine (one partial row per partition shuffles)."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * F.col("l_discount").cast("decimal(18,2)"))
    return (li.filter((F.col("l_shipdate") >= "1996-01-01")
                      & (F.col("l_shipdate") < "1997-01-01")
                      & (F.col("l_discount") >= 0.03)
                      & (F.col("l_discount") <= 0.07)
                      & (F.col("l_quantity") < 24))
            .agg(F.sum(rev).cast("double").alias("revenue"),
                 F.count("*").alias("n_lines")))


@query("q13_customer_distribution", """
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""")
def q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: distribution of per-customer order counts — a
    LEFT join (zero-order customers count as 0) feeding a double
    aggregate; both groupBys are combinable."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per = (c.join(o, c.c_custkey == o.o_custkey, "left")
           .groupBy("c_custkey")
           .agg(F.count("o_orderkey").alias("c_count")))
    return (per.groupBy("c_count").agg(F.count("*").alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


@query("q15_top_supplier", """
WITH rev AS (SELECT l_suppkey AS supplier_no,
                    CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                             * CAST(1 - l_discount AS DECIMAL(18,2)))
                         AS DOUBLE) AS total_revenue
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate < TIMESTAMP '1996-04-01'
             GROUP BY l_suppkey)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
ORDER BY s_suppkey
""")
def q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: revenue 'view' + scalar-subquery max filter —
    the max is a 1-row broadcast join, not a driver collect."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
           .agg((F.sum(F.col("l_extendedprice").cast("decimal(18,2)")
                       * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)")))
                .cast("double").alias("total_revenue")))
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (s.join(rev, s.s_suppkey == rev.supplier_no)
            .join(F.broadcast(mx), F.col("total_revenue") == F.col("__mx"))
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


@query("q7_volume_shipping", """
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l_discount AS DECIMAL(18,2)) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
             OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')))
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""")
def q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: bi-directional nation-pair revenue by ship year —
    double nation join with a disjunctive pair filter; fixed-size nation
    broadcast twice under different aliases."""
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("supp_nation"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__ck"), F.col("n_name").alias("cust_nation"))
    vol = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    pair = (((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3")))
    return (s.join(li, s.s_suppkey == li.l_suppkey)
            .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(c, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(n1), F.col("s_nationkey") == F.col("__sk"))
            .join(F.broadcast(n2), F.col("c_nationkey") == F.col("__ck"))
            .filter(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").cast("long").alias("l_year"))
            .agg(F.sum(vol).cast("double").alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


@query("q4_order_priority", """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""")
def q4_order_priority(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS correlated subquery = LEFT SEMI join (the
    fact side is reduced before the aggregate; no duplicate inflation)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey",
                                                      "l_shipdate")
    return (o.join(li, (o.o_orderkey == li.l_orderkey)
                   & (li.l_shipdate > o.o_orderdate), "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


@query("q14_promo_revenue", """
SELECT CAST(100.0 * SUM(CASE WHEN p_type LIKE 'PROMO%' THEN
                   CAST(l_extendedprice AS DECIMAL(18,2))
                   * CAST(1 - l_discount AS DECIMAL(18,2))
                 ELSE 0 END)
       / SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE)
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-07-01'
""")
def q14_promo_revenue(spark, sf_dir):
    """TPC-H Q14 shape: conditional aggregation over a fact-dim join —
    decimal-exact sums so the ratio is engine-exact before the final
    double division."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-07-01"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(18,2)"))
    return (li.join(p, li.l_partkey == p.p_partkey)
            .agg((F.lit(100.0) * F.sum(promo) / F.sum(rev)).cast("double")
                 .alias("promo_revenue_pct")))


@query("q18_large_volume_customers", """
WITH big AS (SELECT l_orderkey FROM lineitem
             GROUP BY l_orderkey HAVING SUM(l_quantity) > 250)
SELECT c_custkey, c_name, o_orderkey, o_orderdate,
       CAST(o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(SUM(l_quantity) AS DOUBLE) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN big ON big.l_orderkey = lineitem.l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""")
def q18_large_volume_customers(spark, sf_dir):
    """TPC-H Q18 shape: HAVING over an aggregate (large-volume orders)
    feeding a join — the agg-filter is a combinable groupBy whose result
    (order keys only) semi-join-reduces the wide join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("__q"))
           .filter(F.col("__q") > 250)
           .select("l_orderkey"))
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(li.join(big, "l_orderkey"),
                  F.col("o_orderkey") == F.col("l_orderkey"))
            .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                     "o_totalprice")
            .agg(F.sum("l_quantity").cast("double").alias("total_qty"))
            .select("c_custkey", "c_name", "o_orderkey", "o_orderdate",
                    F.col("o_totalprice").cast("double").alias("o_totalprice"),
                    "total_qty")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(20))


# The testdata has no partsupp table; the q2/q11/q16/q20 shapes below
# derive the part-supplier relation from lineitem (who actually supplied
# what, at what realized unit price) — the plan shapes (correlated min,
# fraction-of-total HAVING, distinct-count with anti-join, nested
# semi-joins) are the point, not the TPC-H literal text.

_PS_CTE = """
ps AS (SELECT l_partkey AS partkey, l_suppkey AS suppkey,
              CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                   AS DOUBLE) AS unit_cost
       FROM lineitem GROUP BY l_partkey, l_suppkey)
"""


def _unit_cost_ps(li):
    """Derived partsupp: realized unit cost per (part, supplier) —
    decimal-exact sums, one deterministic double division."""
    return (li.groupBy(F.col("l_partkey").alias("partkey"),
                       F.col("l_suppkey").alias("suppkey"))
            .agg((F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                  .cast("double")
                  / F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                  .cast("double")).cast("double").alias("unit_cost")))


@query("q2_min_cost_supplier", f"""
WITH {_PS_CTE},
eu AS (SELECT suppkey, partkey, unit_cost, s_acctbal, s_name, n_name
       FROM ps JOIN supplier ON s_suppkey = suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'EUROPE'),
mn AS (SELECT partkey, MIN(unit_cost) AS unit_cost FROM eu GROUP BY partkey)
SELECT s_acctbal, s_name, n_name, p_partkey, p_type, eu.unit_cost
FROM part
JOIN eu ON p_partkey = eu.partkey
JOIN mn ON mn.partkey = eu.partkey AND mn.unit_cost = eu.unit_cost
WHERE p_size <= 15 AND p_type = 'LARGE'
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 25
""")
def q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: correlated-MIN subquery (cheapest supplier per
    part within a region), computed as a per-part window MIN + filter —
    NOT a groupBy+self-join, which would scan and re-aggregate the fact
    table twice (the plan showed two full lineitem scans).  One scan,
    one (partkey, suppkey) aggregate, one partkey exchange for the
    window; the supplier/nation/region enrichment side is
    broadcast-sized.  unit_cost is exact-decimal sums divided once in
    double, so the equality filter is engine-deterministic."""
    from pyspark.sql import Window
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
         .select("p_partkey", "p_type"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = (load_table(spark, sf_dir, "region")
         .filter(F.col("r_name") == "EUROPE"))
    eu_sup = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
              .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
              .select("s_suppkey", "s_acctbal", "s_name", "n_name"))
    # push the highly selective part predicate INTO the fact scan stage
    # as a broadcast semi-join BEFORE the (partkey, suppkey) aggregate:
    # the per-partkey MIN is independent of other partkeys, so dropping
    # non-qualifying parts first is value-identical while the aggregate
    # and window see only the qualifying sliver (Catalyst cannot infer
    # this itself — the part filter sits above the aggregation)
    li_q = li.join(F.broadcast(p.select("p_partkey")),
                   li["l_partkey"] == F.col("p_partkey"), "left_semi")
    eu = _unit_cost_ps(li_q).join(
        F.broadcast(eu_sup), F.col("suppkey") == F.col("s_suppkey"))
    w = Window.partitionBy("partkey")
    return (eu.withColumn("__mn", F.min("unit_cost").over(w))
            .filter(F.col("unit_cost") == F.col("__mn"))
            .join(F.broadcast(p), F.col("p_partkey") == F.col("partkey"))
            .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_type",
                    "unit_cost")
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey")
            .limit(25))


@query("q8_market_share", """
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l_discount AS DECIMAL(18,2)) AS volume,
             n2.n_name AS nation
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region ON n1.n_regionkey = r_regionkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01')
GROUP BY o_year
ORDER BY o_year
""")
def q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of regional revenue per year —
    7-way star join (all dims broadcast), conditional/total decimal
    sums, one double division."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_type") == "PROMO").select("p_partkey"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey",
                                                     "s_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01"))
    c = load_table(spark, sf_dir, "customer").select("c_custkey",
                                                     "c_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__ck"), F.col("n_regionkey").alias("__rk"))
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("__sk"), F.col("n_name").alias("nation"))
    r = (load_table(spark, sf_dir, "region")
         .filter(F.col("r_name") == "ASIA").select("r_regionkey"))
    vol = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    cond = F.when(F.col("nation") == "NATION_5", vol).otherwise(
        F.lit(0).cast("decimal(18,2)"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(o, F.col("l_orderkey") == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(F.broadcast(n1), F.col("c_nationkey") == F.col("__ck"))
            .join(F.broadcast(r), F.col("__rk") == F.col("r_regionkey"))
            .join(F.broadcast(n2), F.col("s_nationkey") == F.col("__sk"))
            .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
            .agg((F.sum(cond).cast("double") / F.sum(vol).cast("double"))
                 .cast("double").alias("mkt_share"))
            .orderBy("o_year"))


@query("q9_product_profit", """
SELECT nation, o_year,
       CAST(CAST(SUM(rev) AS DOUBLE) - 0.8 * CAST(SUM(cost) AS DOUBLE)
            AS DOUBLE) AS sum_profit
FROM (SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l_discount AS DECIMAL(18,2)) AS rev,
             CAST(p_retailprice AS DECIMAL(18,2))
             * CAST(l_quantity AS DECIMAL(18,2)) AS cost
      FROM part
      JOIN lineitem ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN nation ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%widget%')
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
""")
def q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: profit per supplier-nation per year (cost proxy:
    80% of retail price — no partsupp).  Revenue and cost aggregate as
    exact decimals; the 0.8 factor applies once, post-aggregate, in
    double."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_name").contains("widget"))
         .select("p_partkey", "p_retailprice"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey",
                                                     "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey",
                                                   "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", F.col("n_name").alias("nation"))
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    cost = (F.col("p_retailprice").cast("decimal(18,2)")
            * F.col("l_quantity").cast("decimal(18,2)"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
            .join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
            .groupBy("nation", F.year("o_orderdate").cast("long")
                     .alias("o_year"))
            .agg((F.sum(rev).cast("double")
                  - F.lit(0.8) * F.sum(cost).cast("double"))
                 .cast("double").alias("sum_profit"))
            .orderBy("nation", F.col("o_year").desc()))


@query("q11_important_stock", """
WITH val AS (SELECT l_partkey AS partkey,
                    SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
             FROM lineitem
             JOIN supplier ON l_suppkey = s_suppkey
             JOIN nation ON s_nationkey = n_nationkey
             WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
             GROUP BY l_partkey)
SELECT partkey, CAST(v AS DOUBLE) AS part_value
FROM val
WHERE CAST(v AS DOUBLE) > (SELECT 0.001 * CAST(SUM(v) AS DOUBLE) FROM val)
ORDER BY part_value DESC, partkey
""")
def q11_important_stock(spark, sf_dir):
    """TPC-H Q11 shape: parts whose value exceeds a fraction of the
    total.  The threshold is a global window SUM over the already-
    aggregated per-part values — NOT a second aggregate branch, which
    would re-scan and re-aggregate the fact table (val's lineage runs
    twice).  The single-partition window sees one row per part (a
    dim-bounded relation), never fact rows."""
    from pyspark.sql import Window
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey",
                                                     "s_nationkey")
    n = (load_table(spark, sf_dir, "nation")
         .filter(F.col("n_name").isin("NATION_1", "NATION_2", "NATION_3"))
         .select("n_nationkey"))
    val = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
           .groupBy(F.col("l_partkey").alias("partkey"))
           .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .alias("__v")))
    thr = F.lit(0.001) * F.sum("__v").over(Window.partitionBy()).cast("double")
    return (val.withColumn("__thr", thr)
            .filter(F.col("__v").cast("double") > F.col("__thr"))
            .select("partkey", F.col("__v").cast("double")
                    .alias("part_value"))
            .orderBy(F.col("part_value").desc(), "partkey"))


@query("q12_late_shipments", """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 30 DAY
  AND l_shipdate < o_orderdate + INTERVAL 90 DAY
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
""")
def q12_late_shipments(spark, sf_dir):
    """TPC-H Q12 shape (shipmode → linestatus; late = shipped 30-90
    days after ordering): priority-split counts over a date-lag join
    predicate — the lag condition evaluates post-join, the absolute
    shipdate range pushes to the scan."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (o.join(li, (o.o_orderkey == li.l_orderkey)
                   & (li.l_shipdate >= o.o_orderdate
                      + F.expr("INTERVAL 30 DAYS"))
                   & (li.l_shipdate < o.o_orderdate
                      + F.expr("INTERVAL 90 DAYS")))
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(high, 1).otherwise(0)).cast("long")
                 .alias("high_line_count"),
                 F.sum(F.when(high, 0).otherwise(1)).cast("long")
                 .alias("low_line_count"))
            .orderBy("l_linestatus"))


@query("q16_supplier_count", """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part JOIN lineitem ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""")
def q16_supplier_count(spark, sf_dir):
    """TPC-H Q16 shape: distinct-supplier counts per part attribute,
    with a NOT-IN (anti-join) exclusion list — the exclusion side is
    supplier-sized, broadcast."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey",
                                                      "l_suppkey")
    p = (load_table(spark, sf_dir, "part")
         .filter((F.col("p_brand") != "Brand#13")
                 & (F.col("p_type") != "PROMO")
                 & F.col("p_size").isin(1, 5, 9, 14, 19, 23, 36, 45))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (load_table(spark, sf_dir, "supplier")
           .filter(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (li.join(F.broadcast(bad),
                    li.l_suppkey == bad.s_suppkey, "left_anti")
            .join(F.broadcast(p), F.col("l_partkey") == p.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size"))


@query("q17_small_quantity_revenue", """
WITH pavg AS (SELECT l_partkey AS partkey,
                     0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                                 AS DOUBLE) / COUNT(*)) AS qty_thr
              FROM lineitem GROUP BY l_partkey)
SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
            / 7.0 AS DOUBLE) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pavg ON pavg.partkey = l_partkey
WHERE p_brand = 'Brand#11' AND p_type = 'MEDIUM' AND l_quantity < qty_thr
""")
def q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated per-part average-quantity threshold
    (exact decimal sum / count, one double multiply — deterministic
    across engines) filtering the fact table against its own aggregate.

    One lineitem scan: the broadcast part semi-filter keeps EVERY
    lineitem of each selected part (partkey determines brand), so the
    per-part average over the filtered subset equals the average over
    the whole table — computed as a window aggregate instead of a
    second scan+groupBy branch."""
    from pyspark.sql import Window
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .filter((F.col("p_brand") == "Brand#11")
                 & (F.col("p_type") == "MEDIUM"))
         .select("p_partkey"))
    w = Window.partitionBy("l_partkey")
    qty_thr = (F.lit(0.2)
               * (F.sum(F.col("l_quantity").cast("decimal(18,2)")).over(w)
                  .cast("double") / F.count("*").over(w)))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .withColumn("__thr", qty_thr)
            .filter(F.col("l_quantity") < F.col("__thr"))
            .agg((F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                  .cast("double") / F.lit(7.0)).cast("double")
                 .alias("avg_yearly")))


@query("q19_disjunctive_revenue", """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
               * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""")
def q19_disjunctive_revenue(spark, sf_dir):
    """TPC-H Q19 shape: three OR'd brand/size/quantity branches — the
    disjunction evaluates post-join on broadcast part attributes; the
    derivable part-side domain (brand ∈ {...}) prunes the build side."""
    li = load_table(spark, sf_dir, "lineitem")
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_brand").isin("Brand#12", "Brand#15", "Brand#4"))
         .select("p_partkey", "p_brand", "p_size"))
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & q.between(1, 11))
        | ((F.col("p_brand") == "Brand#15") & F.col("p_size").between(1, 10)
           & q.between(10, 20))
        | ((F.col("p_brand") == "Brand#4") & F.col("p_size").between(1, 15)
           & q.between(20, 30)))
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
            .filter(branch)
            .agg(F.sum(rev).cast("double").alias("revenue")))


@query("q20_excess_suppliers", """
WITH qty AS (SELECT l_suppkey, l_partkey,
                    CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      AS total_qty
             FROM lineitem
             WHERE l_shipdate >= TIMESTAMP '1996-01-01'
               AND l_shipdate < TIMESTAMP '1997-01-01'
             GROUP BY l_suppkey, l_partkey)
SELECT s_suppkey, s_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_2', 'NATION_5', 'NATION_8', 'NATION_11')
  AND s_suppkey IN (SELECT l_suppkey FROM qty
                    JOIN part ON l_partkey = p_partkey
                    WHERE p_name LIKE 'red%' AND total_qty > 50)
ORDER BY s_suppkey
""")
def q20_excess_suppliers(spark, sf_dir):
    """TPC-H Q20 shape: nested semi-joins — suppliers who moved >50
    units of any red part in 1996, restricted to a nation set.  The
    inner aggregate reduces to supplier keys before touching the
    supplier table; everything above the fact scan is key-sized."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01"))
    p = (load_table(spark, sf_dir, "part")
         .filter(F.col("p_name").startswith("red"))
         .select("p_partkey"))
    s = load_table(spark, sf_dir, "supplier")
    n = (load_table(spark, sf_dir, "nation")
         .filter(F.col("n_name").isin("NATION_2", "NATION_5", "NATION_8",
                                      "NATION_11"))
         .select("n_nationkey"))
    movers = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
              .groupBy("l_suppkey", "l_partkey")
              .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                   .cast("double").alias("total_qty"))
              .filter(F.col("total_qty") > 50)
              .select("l_suppkey").distinct())
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(movers, s.s_suppkey == movers.l_suppkey, "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))


@query("q21_waiting_suppliers", """
WITH lo AS (SELECT l_orderkey, l_suppkey,
                   CASE WHEN l_shipdate > o_orderdate + INTERVAL 45 DAY
                        THEN 1 ELSE 0 END AS late
            FROM lineitem JOIN orders ON o_orderkey = l_orderkey
            WHERE o_orderstatus = 'F')
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN lo l1 ON s_suppkey = l1.l_suppkey
WHERE n_name = 'NATION_4' AND l1.late = 1
  AND EXISTS (SELECT 1 FROM lo l2 WHERE l2.l_orderkey = l1.l_orderkey
              AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lo l3 WHERE l3.l_orderkey = l1.l_orderkey
                  AND l3.l_suppkey <> l1.l_suppkey AND l3.late = 1)
GROUP BY s_name
ORDER BY numwait DESC, s_name
""")
def q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape (late = shipped >45 days after ordering):
    suppliers who were the SOLE late shipper on a multi-supplier
    finished order — an EXISTS (semi) and a NOT EXISTS (anti) against
    the same derived relation, both keyed on order."""
    from pyspark.sql import Window
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey", "o_orderdate"))
    s = load_table(spark, sf_dir, "supplier")
    n = (load_table(spark, sf_dir, "nation")
         .filter(F.col("n_name") == "NATION_4").select("n_nationkey"))
    lo = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select("l_orderkey", "l_suppkey",
                  (F.col("l_shipdate") > F.col("o_orderdate")
                   + F.expr("INTERVAL 45 DAYS")).cast("int").alias("late")))
    # EXISTS/NOT-EXISTS folded into one pass: per-order distinct-supplier
    # sets over a window (orders have a bounded handful of lines, so the
    # collect_set state is small).  "another supplier exists" = >=2
    # distinct suppliers; "no OTHER late supplier" = the late-supplier
    # set is exactly {this supplier} (this row is late, so size == 1).
    # The semi+anti-join form recomputed the lineitem-orders join three
    # times; this is one scan of each table and one orderkey exchange.
    w = Window.partitionBy("l_orderkey")
    lo2 = (lo.withColumn("__supps", F.size(F.collect_set("l_suppkey")
                                           .over(w)))
           .withColumn("__late_supps",
                       F.size(F.collect_set(
                           F.when(F.col("late") == 1, F.col("l_suppkey")))
                           .over(w))))
    cand = lo2.filter((F.col("late") == 1) & (F.col("__supps") >= 2)
                      & (F.col("__late_supps") == 1))
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .join(cand, s.s_suppkey == cand.l_suppkey)
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name"))


@query("q22_global_sales_opportunity", """
WITH pos AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                    / COUNT(*) AS avg_bal
             FROM customer
             WHERE c_acctbal > 0 AND c_nationkey IN (1, 3, 5, 7, 9))
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer
WHERE c_nationkey IN (1, 3, 5, 7, 9)
  AND c_acctbal > (SELECT avg_bal FROM pos)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY c_nationkey
ORDER BY c_nationkey
""")
def q22_global_sales_opportunity(spark, sf_dir):
    """TPC-H Q22 shape: above-average-balance customers dormant since
    mid-2000 (every sf0.01 customer has SOME order, so the literal
    no-orders-ever predicate is degenerate here) — scalar-subquery
    threshold (1-row broadcast) + anti-join against the recent-orders
    key set."""
    c = (load_table(spark, sf_dir, "customer")
         .filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9)))
    o = (load_table(spark, sf_dir, "orders")
         .filter(F.col("o_orderdate") >= "2000-07-01")
         .select("o_custkey"))
    avg_bal = (c.filter(F.col("c_acctbal") > 0)
               .agg((F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                     .cast("double") / F.count("*")).alias("__avg")))
    return (c.join(F.broadcast(avg_bal),
                   F.col("c_acctbal") > F.col("__avg"))
            .join(o, c.c_custkey == o.o_custkey, "left_anti")
            .groupBy("c_nationkey")
            .agg(F.count("*").alias("numcust"),
                 F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double").alias("totacctbal"))
            .orderBy("c_nationkey"))


@query("q10_returned_items", """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""")
def q10_returned_items(spark, sf_dir):
    """TPC-H Q10 shape: returned-item revenue ranking — fact-side filter
    (l_returnflag pushed to the scan) then join + top-k."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    rev = (F.col("l_extendedprice").cast("decimal(18,2)")
           * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
            .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.sum(rev).cast("double").alias("revenue"))
            .select("c_custkey", "c_name", "revenue", "n_name")
            .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
            .limit(20))


@query("region_revenue", """
SELECT r_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
""")
def region_revenue(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    # partial-aggregate orders per custkey first: the shuffle ships one
    # row per customer instead of one per order (map-side combine does
    # the same inside groupBy, but pre-agg also shrinks the join build).
    # customer scales with SF -> AQE picks its join; nation/region are
    # fixed 25/5-row dims -> always broadcast.
    per_cust = (o.groupBy("o_custkey")
                .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
                     .alias("__rev"), F.count("*").alias("__n")))
    return (per_cust.join(c.select("c_custkey", "c_nationkey"),
                          per_cust.o_custkey == c.c_custkey)
            .join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
                  c.c_nationkey == n.n_nationkey)
            .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
            .groupBy("r_name")
            .agg(F.sum("__rev").cast("double").alias("revenue"),
                 F.sum("__n").alias("n_orders")))


@query("topk_orders", """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""")
def topk_orders(spark, sf_dir):
    return (load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_custkey", "o_totalprice")
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
            .limit(25))


@query("rollup_order_status", """
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
""")
def rollup_order_status(spark, sf_dir):
    return (load_table(spark, sf_dir, "orders")
            .rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n"), _dsum("o_totalprice").alias("total")))


@query("pivot_user_event_values", """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'click' THEN
                CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS click,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN
                CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'view' THEN
                CAST(value AS DECIMAL(18,2)) END) AS DOUBLE) AS view
FROM events
GROUP BY user_id
ORDER BY user_id
""")
def pivot_user_event_values(spark, sf_dir):
    """Pivot (long → wide): per-user value totals spread across
    event-type columns.  The pivot values are declared explicitly, so
    Spark skips the extra distinct-values job and the aggregate stays
    one combinable groupBy (pivot compiles to conditional aggs — the
    same plan the oracle spells out)."""
    ev = load_table(spark, sf_dir, "events")
    return (ev.groupBy("user_id")
            .pivot("event_type", ["click", "purchase", "view"])
            .agg(_dsum("value"))
            .orderBy("user_id"))


@query("daily_revenue_delta", """
WITH d AS (SELECT DATE_TRUNC('day', o_orderdate) AS day,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    AS revenue
           FROM orders GROUP BY DATE_TRUNC('day', o_orderdate))
SELECT day, revenue,
       revenue - LAG(revenue) OVER (ORDER BY day) AS delta,
       CAST(AVG(revenue) OVER (ORDER BY day
                               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS ma7
FROM d
ORDER BY day
""")
def daily_revenue_delta(spark, sf_dir):
    """Time-series analytics verbs: day-over-day LAG delta and a 7-day
    moving average over the daily revenue series.  The ordered window
    runs AFTER aggregation, on the calendar-bounded daily table (one
    row per day — thousands of rows at any corpus scale), never on raw
    facts."""
    from pyspark.sql import Window
    o = load_table(spark, sf_dir, "orders")
    d = (o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
         .agg(_dsum("o_totalprice").alias("revenue")))
    w = Window.orderBy("day")
    ma = Window.orderBy("day").rowsBetween(-6, 0)
    return (d.withColumn("delta", F.col("revenue") - F.lag("revenue").over(w))
            .withColumn("ma7", F.avg("revenue").over(ma).cast("double"))
            .orderBy("day"))


@query("trailing_week_revenue", """
WITH d AS (SELECT DATE_TRUNC('day', o_orderdate) AS day,
                  (DATE_TRUNC('day', o_orderdate)::DATE
                   - DATE '1992-01-01') AS day_num,
                  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                    AS revenue
           FROM orders
           GROUP BY DATE_TRUNC('day', o_orderdate))
SELECT day, revenue,
       CAST(SUM(CAST(revenue AS DECIMAL(18,2)))
            OVER (ORDER BY day_num
                  RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS rev7,
       COUNT(*) OVER (ORDER BY day_num
                      RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
           AS days_present
FROM d ORDER BY day
""")
def trailing_week_revenue(spark, sf_dir):
    """RANGE-frame window (the frame variant ROWS can't express): the
    trailing CALENDAR week's revenue per day — missing days shrink the
    frame instead of pulling older rows in, unlike the ma7 ROWS frame
    in daily_revenue_delta.  Decimal-exact window sum (engine-identical
    under any incremental evaluation); the ordered window runs on the
    calendar-bounded daily table, never raw facts."""
    from pyspark.sql import Window
    o = load_table(spark, sf_dir, "orders")
    d = (o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
         .agg(_dsum("o_totalprice").alias("revenue"))
         .withColumn("day_num",
                     F.datediff(F.col("day"),
                                F.lit("1992-01-01").cast("date"))
                      .cast("long")))
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return (d.select(
        "day", "revenue",
        F.sum(F.col("revenue").cast("decimal(18,2)")).over(w)
         .cast("double").alias("rev7"),
        F.count("*").over(w).alias("days_present"))
        .orderBy("day"))


@query("cube_returnflag_status", """
SELECT l_returnflag, l_linestatus, GROUPING(l_returnflag) AS g_flag,
       GROUPING(l_linestatus) AS g_status, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
""")
def cube_returnflag_status(spark, sf_dir):
    """CUBE (all grouping-set combinations) with GROUPING() markers to
    disambiguate data NULLs from subtotal rows.

    Scale shape (r5 VERDICT item #3): COUNT/SUM distribute over a
    pre-aggregation, so we first collapse the fact scan to the base
    (returnflag, linestatus) cells with one combinable groupBy — a
    handful of rows at any corpus scale — and CUBE only the cell
    table.  The Expand operator therefore multiplies |cells| (~6 rows)
    instead of 4x the fact rows; at 100 TB that is the difference
    between a 4x shuffle blow-up and a no-op."""
    li = load_table(spark, sf_dir, "lineitem")
    cells = (li.groupBy("l_returnflag", "l_linestatus")
             .agg(F.count("*").alias("_n"),
                  F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                  .alias("_qty")))
    return (cells.cube("l_returnflag", "l_linestatus")
            .agg(F.grouping("l_returnflag").cast("long").alias("g_flag"),
                 F.grouping("l_linestatus").cast("long").alias("g_status"),
                 F.sum("_n").alias("n"),
                 F.sum("_qty").cast("double").alias("sum_qty"))
            .select("l_returnflag", "l_linestatus", "g_flag", "g_status",
                    "n", "sum_qty"))


@query("set_ops_customers", """
SELECT c_custkey FROM customer WHERE c_acctbal > 0
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""")
def set_ops_customers(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    pos = c.filter(F.col("c_acctbal") > 0).select("c_custkey")
    with_orders = o.select(F.col("o_custkey").alias("c_custkey"))
    failed = (o.filter(F.col("o_orderstatus") == "F")
              .select(F.col("o_custkey").alias("c_custkey")))
    return pos.intersect(with_orders).exceptAll(failed).distinct()


@query("window_rank_orders", """
SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
  FROM orders) WHERE rnk <= 3
""")
def window_rank_orders(spark, sf_dir):
    from pyspark.sql import Window
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (load_table(spark, sf_dir, "orders")
            .select("o_custkey", "o_orderkey", "o_totalprice",
                    F.row_number().over(w).alias("rnk"))
            .filter(F.col("rnk") <= 3))


# ===========================================================================
# CEP core over the `events` stream (SURVEY §2.2-2.5)
# ===========================================================================


@query("map_stream", """
SELECT event_id, ts, user_id, value * 2 AS doubled, UPPER(event_type) AS typ
FROM events
""")
def map_stream(spark, sf_dir):
    s = events_stream(spark, sf_dir)
    return s.map(doubled=F.col("value") * 2, typ=F.upper("event_type")).df.select(
        "event_id", "ts", "user_id", "doubled", "typ")


@query("filter_stream", """
SELECT event_id, ts, user_id, event_type, value FROM events WHERE value > 100
""")
def filter_stream(spark, sf_dir):
    s = events_stream(spark, sf_dir).filter(F.col("value") > 100)
    return s.df.select("event_id", "ts", "user_id", "event_type", "value")


@query("filter_type_purchase", """
SELECT event_id, ts, user_id, value FROM events WHERE event_type = 'purchase'
""")
def filter_type_purchase(spark, sf_dir):
    s = events_stream(spark, sf_dir).filter_type(
        "event_type", "purchase", fields=["user_id", "value"])
    return s.df.select("event_id", "ts", "user_id", "value")


@query("by_reduce_total", """
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM events GROUP BY event_type
""")
def by_reduce_total(spark, sf_dir):
    s = events_stream(spark, sf_dir).by("event_type", name="event_type")
    return s.reduce(_dsum("value").alias("total"), F.count("*").alias("n"))


@query("scan_running_sum", """
SELECT event_id, ts, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_total
FROM events
""")
def scan_running_sum(spark, sf_dir):
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.scan(running_total=F.sum(F.col("value").cast("decimal(18,2)")))
    return out.df.select("event_id", "ts", "user_id",
                         F.col("running_total").cast("double").alias("running_total"))


@query("live_scan_running_sum", _ORACLES["scan_running_sum"])
def live_scan_running_sum(spark, sf_dir):
    """The CUMULATIVE per-key fold as a streaming plan (fold_all/scan,
    MacroTerm.scala:63-84 one-expression-two-modes): per-key running
    state via scan_state, integer-quantized accumulation for decimal
    exactness — same oracle as the batch scan_running_sum."""
    from scespet_spark.streaming.live import LiveStream

    def step(st, pdf):
        import numpy as np
        cents = np.round(pdf["value"].to_numpy(dtype="float64") * 100)
        run = st["acc"] + np.cumsum(cents)
        st["acc"] = float(run[-1])
        out = pdf[["event_id", "ts"]].copy()
        out["running_total"] = run / 100.0
        return out

    live = (LiveStream.from_events(spark, sf_dir).by("user_id")
            .scan_state({"acc": 0.0}, step,
                        "user_id long, event_id long, ts timestamp, "
                        "running_total double"))
    return live.run("append").select("event_id", "ts", "user_id",
                                     "running_total")


@query("group_count_reduce", """
SELECT user_id, bucket,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS n
FROM (
  SELECT user_id, value,
         (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) // 50
           AS bucket
  FROM events)
GROUP BY user_id, bucket
""")
def group_count_reduce(spark, sf_dir):
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.group(Count(50)).reduce(total=_dsum("value"), n=F.count("*"),
                                    bucket_seq=F.min("event_id"))
    # re-derive the 0-based bucket ordinal for a stable, engine-neutral key
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("bucket_seq")
    return out.df.select("user_id", "total", "n", "bucket_seq").withColumn(
        "bucket", F.row_number().over(w) - 1).drop("bucket_seq")


@query("group_time_reduce", """
SELECT event_type, DATE_TRUNC('day', ts) AS day,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS n
FROM events GROUP BY event_type, DATE_TRUNC('day', ts)
""")
def group_time_reduce(spark, sf_dir):
    s = events_stream(spark, sf_dir).by("event_type", name="event_type")
    out = s.group(Every("1 day")).reduce(total=_dsum("value"), n=F.count("*"),
                                         day=F.min(F.date_trunc("day", F.col("ts"))))
    return out.df.select("event_type", "day", "total", "n")


# ---------------------------------------------------------------------------
# data-driven slicing (Trigger BEFORE/AFTER) over events
# ---------------------------------------------------------------------------

_SLICE_ORACLE = """
SELECT user_id, bucket_seq,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS n
FROM (
  SELECT user_id, value, event_id,
         MIN(event_id) OVER (PARTITION BY user_id, bkt) AS bucket_seq
  FROM (
    SELECT *,
           SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           {align} AS bkt
    FROM events))
GROUP BY user_id, bucket_seq
"""


@query("slice_before_signup", _SLICE_ORACLE.format(align=""))
def slice_before_signup(spark, sf_dir):
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.group(Trigger(F.col("event_type") == "signup", BEFORE)).reduce(
        total=_dsum("value"), n=F.count("*"), bucket_seq=F.min("event_id"))
    return out.df.select("user_id", "bucket_seq", "total", "n")


@query("slice_after_signup", _SLICE_ORACLE.format(
    align="- (CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)"))
def slice_after_signup(spark, sf_dir):
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.group(Trigger(F.col("event_type") == "signup", AFTER)).reduce(
        total=_dsum("value"), n=F.count("*"), bucket_seq=F.min("event_id"))
    return out.df.select("user_id", "bucket_seq", "total", "n")


# ---------------------------------------------------------------------------
# boolean-gated windows (reference window(); closed windows only)
# ---------------------------------------------------------------------------


@query("window_gated_reduce", """
WITH g AS (
  SELECT user_id, ts, event_id, value, (value >= 100) AS gate FROM events),
r AS (
  SELECT *,
         CASE WHEN gate AND NOT COALESCE(
             LAG(gate) OVER (PARTITION BY user_id ORDER BY ts, event_id), FALSE)
           THEN 1 ELSE 0 END AS rising
  FROM g),
w AS (
  SELECT *,
         SUM(rising) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS win
  FROM r),
m AS (
  SELECT *,
         MAX(win) OVER (PARTITION BY user_id) AS max_win,
         LAST_VALUE(gate) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING) AS last_gate
  FROM w)
SELECT user_id, MIN(event_id) AS win_seq,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS n
FROM m
WHERE gate AND (win < max_win OR NOT last_gate)
GROUP BY user_id, win
""")
def window_gated_reduce(spark, sf_dir):
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.window(F.col("value") >= 100).reduce(
        total=_dsum("value"), n=F.count("*"), win_seq=F.min("event_id"))
    return out.df.select("user_id", "win_seq", "total", "n")


@query("window_gated_scan", """
WITH g AS (
  SELECT user_id, ts, event_id, value, (value >= 100) AS gate FROM events),
r AS (
  SELECT *,
         CASE WHEN gate AND NOT COALESCE(
             LAG(gate) OVER (PARTITION BY user_id ORDER BY ts, event_id), FALSE)
           THEN 1 ELSE 0 END AS rising
  FROM g),
w AS (
  SELECT *,
         SUM(rising) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS win
  FROM r)
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id, win ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS total,
       CAST(COUNT(*) OVER (PARTITION BY user_id, win ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n
FROM w WHERE gate
""")
def window_gated_scan(spark, sf_dir):
    """Gated CUMULATIVE emission (``window(boolStream).scan``): every
    in-window event emits the window's running aggregate — the scan
    counterpart of window_gated_reduce (reference: window() CUMULATIVE,
    MacroTerm.scala:242-259; open windows DO emit their running rows,
    only ``reduce`` withholds un-closed windows)."""
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.window(F.col("value") >= 100).scan(
        total=F.sum(F.col("value").cast("decimal(18,2)")), n=F.count("*"))
    return out.df.select("user_id", "event_id",
                         F.col("total").cast("double").alias("total"), "n")


@query("live_window_gated_scan", _ORACLES["window_gated_scan"])
def live_window_gated_scan(spark, sf_dir):
    """Gated CUMULATIVE emission live: every in-window event emits the
    window's running aggregate as it arrives — open windows included,
    exactly the batch window_gated_scan semantics (same oracle)."""
    from scespet_spark.streaming.live import LiveStream
    live = (LiveStream.from_events(spark, sf_dir)
            .by("user_id")
            .window_scan(F.col("value") >= 100, "value", quantize=100))
    return live.run("append").select("user_id", "event_id", "total", "n")


@query("live_window_gated_reduce", _ORACLES["window_gated_reduce"])
def live_window_gated_reduce(spark, sf_dir):
    """Boolean-gated windows as a streaming plan: per-key edge-detect
    state opens on the rising edge, accumulates while the gate holds,
    emits on the falling edge — only closed windows fire, exactly like
    batch (same oracle)."""
    from scespet_spark.streaming.live import LiveStream
    live = (LiveStream.from_events(spark, sf_dir)
            .by("user_id")
            .window(F.col("value") >= 100, "value", quantize=100))
    return live.run("append").select("user_id", "win_seq", "total", "n")


@query("window_from_reduce", """
WITH d AS (SELECT user_id, ts, event_id, value FROM events
           WHERE event_type = 'purchase'),
gs AS (SELECT user_id, ts, event_id, (value >= 100) AS g FROM events
       WHERE event_type = 'click'),
u AS (
  SELECT user_id, ts, event_id, value, 1 AS side, NULL::BOOLEAN AS g FROM d
  UNION ALL
  SELECT user_id, ts, event_id, NULL::DOUBLE AS value, 0 AS side, g FROM gs),
f AS (
  SELECT *, COALESCE(LAST_VALUE(g IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, side, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), FALSE) AS gate
  FROM u),
dd AS (SELECT user_id, ts, event_id, value, gate FROM f WHERE side = 1),
r AS (
  SELECT *, CASE WHEN gate AND NOT COALESCE(
      LAG(gate) OVER (PARTITION BY user_id ORDER BY ts, event_id), FALSE)
    THEN 1 ELSE 0 END AS rising FROM dd),
w AS (
  SELECT *, SUM(rising) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS win FROM r),
m AS (
  SELECT *, MAX(win) OVER (PARTITION BY user_id) AS max_win,
      LAST_VALUE(gate) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        AS last_gate
  FROM w)
SELECT user_id, MIN(event_id) AS win_seq,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM m WHERE gate AND (win < max_win OR NOT last_gate)
GROUP BY user_id, win
""")
def window_from_reduce(spark, sf_dir):
    """Windows gated by a SEPARATE boolean stream (``window_from``,
    reference per-key window streams, VectTerm.scala:530-543): the click
    stream's value>=100 signal gates purchase accumulation.  The gate
    as-of joins onto data rows with gate-first tie order (a same-time
    close excludes the data row — close-beats-data,
    WindowedBucket_LastValue.scala:10-11); only closed windows emit."""
    ev = events_stream(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .by("user_id", name="user_id"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .by("user_id", name="user_id")
              .map(g=F.col("value") >= 100))
    out = purchases.window_from(clicks, "g").reduce(
        total=_dsum("value"), n=F.count("*"), win_seq=F.min("event_id"))
    return out.df.select("user_id", "win_seq", "total", "n")


@query("live_window_from", _ORACLES["window_from_reduce"])
def live_window_from(spark, sf_dir):
    """window_from as a Structured Streaming plan (r5 VERDICT item #4):
    the gate stream unions into the keyed stateful step and forward-
    fills onto data rows with gate-first tie order — same oracle as the
    batch window_from_reduce query (live must be value-identical)."""
    from scespet_spark.streaming.live import LiveStream
    src = LiveStream.from_events(spark, sf_dir)
    data = (src.filter(F.col("event_type") == "purchase").by("user_id"))
    gate = (src.filter(F.col("event_type") == "click")
            .map(g=F.col("value") >= 100).by("user_id"))
    live = data.window_from(gate, "g", "value", quantize=100)
    return live.run("append").select("user_id", "win_seq", "total", "n")


# ---------------------------------------------------------------------------
# temporal joins (zip / take / sample)
# ---------------------------------------------------------------------------

#: zip/asof oracles wrap each side's own value in a single-field STRUCT
#: (padding = NULL struct, skipped by IGNORE NULLS; a row's own NULL
#: value = non-null struct wrapping null — a REAL update that makes
#: "latest" null), mirroring the engine's marker-struct forward fill
#: exactly even for corpora containing null payloads.
_ZIP_ORACLE_BODY = """
WITH u AS (
  SELECT user_id, ts, event_id, 0 AS side,
         {'v': value} AS cv, NULL::STRUCT(v DOUBLE) AS pv
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS side,
         NULL::STRUCT(v DOUBLE) AS cv, {'v': value} AS pv
  FROM events WHERE event_type = 'purchase'),
f AS (
  SELECT user_id, ts, event_id, side,
         struct_extract(LAST_VALUE(cv IGNORE NULLS) OVER w, 'v') AS cv,
         struct_extract(LAST_VALUE(pv IGNORE NULLS) OVER w, 'v') AS pv
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id, side
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
"""


@query("zip_click_purchase", _ZIP_ORACLE_BODY +
       "SELECT user_id, ts, event_id, cv, pv FROM f")
def zip_click_purchase(spark, sf_dir):
    ev = events_stream(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
                .by("user_id", name="user_id").map(cv=F.col("value")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .by("user_id", name="user_id").map(pv=F.col("value")))
    out = clicks.zip_join(purchases, ["cv"], ["pv"])
    return out.df.select("user_id", "ts", "event_id", "cv", "pv")


@query("live_zip_click_purchase", _ZIP_ORACLE_BODY +
       "SELECT user_id, ts, event_id, cv, pv FROM f")
def live_zip_click_purchase(spark, sf_dir):
    """The zip join executed as a Structured Streaming plan
    (applyInPandasWithState over a tagged union) — same oracle as the
    batch zip: live mode must be value-identical, not just plausible."""
    from scespet_spark.streaming.live import (read_events_stream, run_available_now,
                                              zip_latest)
    src = read_events_stream(spark, sf_dir)
    live = zip_latest(
        src.filter(F.col("event_type") == "click").withColumn("cv", F.col("value")),
        src.filter(F.col("event_type") == "purchase").withColumn("pv", F.col("value")),
        ["user_id"], "cv", "pv")
    return run_available_now(live, "append").select(
        "user_id", "ts", "event_id", "cv", "pv")


@query("live_zip_typed", """
WITH u AS (
  SELECT user_id, ts, event_id, 0 AS side,
         {'v': props} AS sv, NULL::STRUCT(v DOUBLE) AS pv
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS side,
         NULL::STRUCT(v VARCHAR) AS sv, {'v': value} AS pv
  FROM events WHERE event_type = 'purchase'),
f AS (
  SELECT user_id, ts, event_id,
         struct_extract(LAST_VALUE(sv IGNORE NULLS) OVER w, 'v') AS sv,
         struct_extract(LAST_VALUE(pv IGNORE NULLS) OVER w, 'v') AS pv
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id, side
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id, ts, event_id, sv, pv FROM f
""")
def live_zip_typed(spark, sf_dir):
    """Typed live zip: the left payload is a STRING (the click's raw
    props JSON), the right a double — live state carries the value in
    its own type instead of casting to double (the reference's events
    are arbitrary case classes: EventSource.java:3-6,
    RealTradeTests.scala:22-23).  Same oracle pattern as
    live_zip_click_purchase."""
    from scespet_spark.streaming.live import (read_events_stream,
                                              run_available_now, zip_latest)
    src = read_events_stream(spark, sf_dir)
    live = zip_latest(
        src.filter(F.col("event_type") == "click")
           .withColumn("sv", F.col("props")),
        src.filter(F.col("event_type") == "purchase")
           .withColumn("pv", F.col("value")),
        ["user_id"], "sv", "pv")
    return run_available_now(live, "append").select(
        "user_id", "ts", "event_id", "sv", "pv")


@query("live_map_keys_bucket", """
SELECT user_id % 4 AS key,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS n
FROM events GROUP BY user_id % 4
""")
def live_map_keys_bucket(spark, sf_dir):
    """Live map_keys (re-key + null-drop, ReKeyedVector.scala:9-59) as a
    streaming plan, reduced with a complete-mode aggregation — same
    oracle as the batch map_keys_user_bucket query."""
    from scespet_spark.streaming.live import LiveStream, run_available_now
    live = (LiveStream.from_events(spark, sf_dir)
            .by("user_id")
            .map_keys(F.col("user_id") % 4, name="key"))
    out = live.df.groupBy("key").agg(_dsum("value").alias("total"),
                                     F.count("*").alias("n"))
    return run_available_now(out, "complete")


@query("live_tumbling_daily", """
SELECT user_id, DATE_TRUNC('day', ts) AS win_start,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM events
GROUP BY user_id, DATE_TRUNC('day', ts)
""")
def live_tumbling_daily(spark, sf_dir):
    """Watermarked tumbling-window aggregation as a streaming plan
    (group(Every('1 day')).reduce live) — the workhorse windowed agg,
    value-checked against the same GROUP BY oracle as batch."""
    from scespet_spark import Every
    from scespet_spark.streaming.live import LiveStream
    live = (LiveStream.from_events(spark, sf_dir)
            .by("user_id")
            .group(Every("1 day"))
            .reduce(total=_dsum("value"), n=F.count("*")))
    return live.run("complete").select("user_id", "win_start", "total", "n")


@query("live_sliding_window", """
WITH w AS (
  SELECT user_id, value,
         UNNEST([DATE_TRUNC('day', ts),
                 DATE_TRUNC('day', ts) - INTERVAL 1 DAY]) AS win_start
  FROM events)
SELECT user_id, win_start, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM w GROUP BY user_id, win_start
""")
def live_sliding_window(spark, sf_dir):
    """Sliding windows as a streaming plan (group(Sliding).reduce live):
    F.window with a slide is native in Structured Streaming — per-key
    2-day/1-day windows, watermark-bounded state, same oracle as the
    batch sliding_window_user query."""
    from scespet_spark import Sliding
    from scespet_spark.streaming.live import LiveStream
    live = (LiveStream.from_events(spark, sf_dir)
            .by("user_id")
            .group(Sliding("2 days", "1 day"))
            .reduce(n=F.count("*"), total=_dsum("value")))
    return live.run("complete").select("user_id", "win_start", "n", "total")


@query("live_map_vector_running", """
SELECT event_id, ts,
       COUNT(*) OVER w AS n_events,
       MAX(value) OVER w AS vmax
FROM events
WINDOW w AS (ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""")
def live_map_vector_running(spark, sf_dir):
    """Live mapVector (VectTerm.scala:145-176): the running cross-key
    aggregate emitted at every event, folded in one stateful group (the
    reference's push graph is likewise single-threaded) — same oracle
    as the batch map_vector_running query."""
    from scespet_spark.streaming.live import LiveStream, run_available_now
    live = (LiveStream.from_events(spark, sf_dir)
            .by("user_id")
            .map_vector(n_events=("count",), vmax=("max", "value")))
    return run_available_now(live.df, "append").select(
        "event_id", "ts", "n_events", "vmax")


@query("live_value_set", """
SELECT DISTINCT user_id, event_type FROM events
""")
def live_value_set(spark, sf_dir):
    """Streaming valueSet/toValueSet (MacroTerm.scala:160-185):
    dropDuplicatesWithinWatermark keeps one row per distinct value with
    state bounded by the watermark.  The oracle is the value SET itself
    (which surviving row's timestamp is retained is arbitrary, so it is
    not part of the contract; batch value_set owns first-occurrence
    timestamps)."""
    from scespet_spark.streaming.live import LiveStream
    live = (LiveStream.from_events(spark, sf_dir)
            .value_set(["user_id", "event_type"]))
    return live.run("append").select("user_id", "event_type")


@query("live_count_buckets", """
WITH r AS (
  SELECT user_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
           AS rn
  FROM events)
SELECT user_id, rn // 5 AS bucket,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM r GROUP BY user_id, rn // 5
HAVING COUNT(*) = 5
""")
def live_count_buckets(spark, sf_dir):
    """Count-based buckets (group(Count(5)).reduce) as a Structured
    Streaming plan: per-key bucket state, emitted the moment a bucket
    fills (reference: n.events, SliceTriggerSpec.scala:53-56).  Oracle
    = full buckets only (the trailing partial stays open — batch mode
    owns the termination flush)."""
    from scespet_spark.streaming.live import (count_reduce,
                                              read_events_stream,
                                              run_available_now)
    live = count_reduce(read_events_stream(spark, sf_dir), ["user_id"],
                        5, "value", quantize=100)
    return run_available_now(live, "append").select(
        "user_id", "bucket", "total", "n")


@query("live_trigger_slice", """
WITH e AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS b
  FROM events),
f AS (
  SELECT user_id, value, b,
         CAST(SUM(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - b
           AS BIGINT) AS bucket,
         SUM(b) OVER (PARTITION BY user_id) AS nb
  FROM e)
SELECT user_id, bucket,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM f WHERE bucket < nb
GROUP BY user_id, bucket
""")
def live_trigger_slice(spark, sf_dir):
    """Data-driven slicing (group(Trigger(cond)).reduce, AFTER align)
    executed as a Structured Streaming plan: per-key bucket state in the
    state store, a bucket emitted the moment its boundary event arrives
    (reference: SliceTriggerSpec.scala:57-73 + SliceAfterBucket.scala).
    Oracle = closed buckets only (bucket < per-key boundary count): the
    trailing open bucket awaits its boundary, batch termination owns the
    final flush (SimpleEnv.scala:93).  quantize=100 keeps the running
    total decimal-exact (the _dsum convention, sequential-order-proof)."""
    from scespet_spark.streaming.live import (read_events_stream,
                                              run_available_now,
                                              trigger_reduce)
    live = trigger_reduce(read_events_stream(spark, sf_dir), ["user_id"],
                          F.col("event_type") == "signup", "value",
                          "AFTER", quantize=100)
    return run_available_now(live, "append").select(
        "user_id", "bucket", "total", "n")


@query("live_trigger_stream_slice", """
WITH c AS (SELECT user_id, ts, event_id, value, 1 AS is_data, 1 AS ord
           FROM events WHERE event_type = 'click'),
s AS (SELECT user_id, ts, event_id, NULL::DOUBLE AS value, 0 AS is_data,
             2 AS ord
      FROM events WHERE event_type = 'signup'),
u AS (SELECT * FROM c UNION ALL SELECT * FROM s),
f AS (
  SELECT user_id, value, is_data,
         CAST(SUM(1 - is_data) OVER (
             PARTITION BY user_id ORDER BY ts, ord, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (1 - is_data) AS BIGINT) AS bucket,
         SUM(1 - is_data) OVER (PARTITION BY user_id) AS nb
  FROM u)
SELECT user_id, bucket,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM f WHERE is_data = 1 AND bucket < nb
GROUP BY user_id, bucket
""")
def live_trigger_stream_slice(spark, sf_dir):
    """Per-key vector-trigger slicing (VectSliceTriggerSpec,
    SliceTriggerSpec.scala:76-118) live: clicks sliced by each user's
    own signup events, AFTER alignment (a click simultaneous with a
    signup joins the closing bucket — ord column in the oracle mirrors
    the tagged-union tie-break)."""
    from scespet_spark.streaming.live import (read_events_stream,
                                              run_available_now,
                                              trigger_stream_reduce)
    src = read_events_stream(spark, sf_dir)
    live = trigger_stream_reduce(
        src.filter(F.col("event_type") == "click"),
        src.filter(F.col("event_type") == "signup"),
        ["user_id"], "value", "AFTER", quantize=100)
    return run_available_now(live, "append").select(
        "user_id", "bucket", "total", "n")


_ASOF_ORACLE = """
WITH c AS (SELECT user_id, ts, event_id, value AS cv FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id, ts, event_id, value AS pv FROM events
      WHERE event_type = 'purchase'),
u AS (
  SELECT user_id, ts, event_id, 0 AS side,
         {'v': cv} AS cv, NULL::DOUBLE AS pv FROM c
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS side,
         NULL::STRUCT(v DOUBLE) AS cv, pv FROM p),
f AS (
  SELECT user_id, ts, event_id, side, pv,
         struct_extract(LAST_VALUE(cv IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id, side
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'v') AS cv
  FROM u)
SELECT user_id, ts, event_id, cv, pv FROM f WHERE side = 1
"""


@query("asof_purchase_last_click", _ASOF_ORACLE)
def asof_purchase_last_click(spark, sf_dir):
    ev = events_stream(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
                .by("user_id", name="user_id").map(cv=F.col("value")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .by("user_id", name="user_id").map(pv=F.col("value")))
    out = clicks.take(purchases, ["cv"], ["pv"])
    return out.df.select("user_id", "ts", "event_id", "cv", "pv")


@query("zip_keymap_region_value", """
WITH l AS (SELECT user_id, ts, event_id, value AS xv FROM events
           WHERE event_type = 'purchase'),
r AS (SELECT user_id % 5 AS bucket, ts, event_id, value AS yv FROM events
      WHERE event_type = 'click'),
ks AS (SELECT DISTINCT user_id, user_id % 5 AS bucket FROM l),
rx AS (SELECT ks.user_id, r.ts, r.event_id, r.yv FROM r JOIN ks USING (bucket)),
u AS (
  SELECT user_id, ts, event_id, 0 AS side,
         {'v': xv} AS xv, NULL::STRUCT(v DOUBLE) AS yv, 1 AS cell FROM l
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS side,
         NULL::STRUCT(v DOUBLE) AS xv, {'v': yv} AS yv, NULL::INT AS cell
  FROM rx),
f AS (
  SELECT user_id, ts, event_id, side,
         struct_extract(LAST_VALUE(xv IGNORE NULLS) OVER w, 'v') AS xv,
         struct_extract(LAST_VALUE(yv IGNORE NULLS) OVER w, 'v') AS yv,
         LAST_VALUE(cell IGNORE NULLS) OVER w AS cell
  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id, side
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id, ts, event_id, xv, yv FROM f WHERE cell IS NOT NULL
""")
def zip_keymap_region_value(spark, sf_dir):
    """VectTerm.join with a key mapping (VectTerm.scala:454-456,
    VectorJoin.scala:16-133): purchases keyed by user_id zip-join the
    per-bucket click stream via keyMap user_id -> user_id % 5.  Every
    bucket click fires all live user cells in the bucket; every purchase
    reads the bucket's latest click value."""
    from scespet_spark.core.stream import Stream
    ev = events_stream(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .by("user_id", name="user_id").map(xv=F.col("value")))
    clicks_df = (ev.df.filter(F.col("event_type") == "click")
                 .select((F.col("user_id") % 5).alias("bucket"),
                         "ts", "event_id", F.col("value").alias("yv")))
    clicks = Stream(clicks_df, t="ts", seq="event_id", keys=("bucket",))
    out = purchases.zip_join(clicks, ["xv"], ["yv"],
                             key_map=F.col("user_id") % 5)
    return out.df.select("user_id", "ts", "event_id", "xv", "yv")


@query("keymap_take_region_value", """
WITH l AS (SELECT user_id, ts, event_id, value AS xv FROM events
           WHERE event_type = 'purchase'),
r AS (SELECT user_id % 5 AS bucket, ts, event_id, value AS yv FROM events
      WHERE event_type = 'click'),
ks AS (SELECT DISTINCT user_id, user_id % 5 AS bucket FROM l),
rx AS (SELECT ks.user_id, r.ts, r.event_id, r.yv FROM r JOIN ks USING (bucket)),
u AS (
  SELECT user_id, ts, event_id, 0 AS side,
         {'v': xv} AS xv, NULL::DOUBLE AS yv, 1 AS cell
  FROM l
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS side, NULL::STRUCT(v DOUBLE) AS xv, yv,
         NULL::INT AS cell
  FROM rx),
f AS (
  SELECT user_id, ts, event_id, side, yv,
         struct_extract(LAST_VALUE(xv IGNORE NULLS) OVER w, 'v') AS xv,
         LAST_VALUE(cell IGNORE NULLS) OVER w AS cell
  FROM u WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id, side
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT user_id, ts, event_id, xv, yv FROM f
WHERE side = 1 AND cell IS NOT NULL
""")
def keymap_take_region_value(spark, sf_dir):
    """VectTerm.take with a key mapping (VectTerm.scala:458-460): every
    bucket click fires all LIVE user cells with (latest purchase, click
    value).  Unlike the zip form's replicate-then-window plan, take
    compiles to the compact interval join (_keymap_take_join): one
    window over purchases only, clicks join their buckets one row each —
    the fan-out exists only in the emission set itself (plan-tested)."""
    from scespet_spark.core.stream import Stream
    ev = events_stream(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .by("user_id", name="user_id").map(xv=F.col("value")))
    clicks_df = (ev.df.filter(F.col("event_type") == "click")
                 .select((F.col("user_id") % 5).alias("bucket"),
                         "ts", "event_id", F.col("value").alias("yv")))
    clicks = Stream(clicks_df, t="ts", seq="event_id", keys=("bucket",))
    out = purchases.take(clicks, ["xv"], ["yv"], key_map=F.col("user_id") % 5)
    return out.df.select("user_id", "ts", "event_id", "xv", "yv")


@query("live_keymap_take", _ORACLES["keymap_take_region_value"])
def live_keymap_take(spark, sf_dir):
    """VectTerm.take with a key mapping as a Structured Streaming plan
    (VectTerm.scala:458-460; r5 VERDICT item #2): per-bucket state holds
    the live cell table, each bucket click fires every live user cell
    with (latest purchase, click value) — same oracle as the batch
    keymap_take_region_value query (live must be value-identical)."""
    from scespet_spark.streaming.live import LiveStream
    src = LiveStream.from_events(spark, sf_dir)
    purchases = (src.filter(F.col("event_type") == "purchase")
                 .map(xv=F.col("value")).by("user_id"))
    clicks = (src.filter(F.col("event_type") == "click")
              .map(bucket=F.col("user_id") % 5, yv=F.col("value"))
              .by("bucket"))
    out = purchases.take(clicks, ["xv"], ["yv"],
                         key_map=F.col("user_id") % 5)
    return out.run("append").select("user_id", "ts", "event_id", "xv", "yv")


@query("live_keymap_zip", _ORACLES["zip_keymap_region_value"])
def live_keymap_zip(spark, sf_dir):
    """VectTerm.join with a key mapping as a Structured Streaming plan
    (VectTerm.scala:454-456, VectorJoin.scala:16-133): purchases keyed
    by user_id zip-join the per-bucket click stream live — a purchase
    emits its cell with the bucket's latest click value, a click fires
    every live cell in its bucket.  Same oracle as the batch
    zip_keymap_region_value query."""
    from scespet_spark.streaming.live import LiveStream
    src = LiveStream.from_events(spark, sf_dir)
    purchases = (src.filter(F.col("event_type") == "purchase")
                 .map(xv=F.col("value")).by("user_id"))
    clicks = (src.filter(F.col("event_type") == "click")
              .map(bucket=F.col("user_id") % 5, yv=F.col("value"))
              .by("bucket"))
    out = purchases.zip_join(clicks, "xv", "yv",
                             key_map=F.col("user_id") % 5)
    return out.run("append").select("user_id", "ts", "event_id", "xv", "yv")


@query("asof_broadcast_purchase_last_click", _ASOF_ORACLE)
def asof_broadcast_purchase_last_click(spark, sf_dir):
    """The same as-of join under the broadcast-interval physical
    strategy (SURVEY §7's optional optimized as-of): click state becomes
    broadcast validity intervals, the purchase (fact) stream is never
    shuffled.  Same oracle as asof_purchase_last_click — value-identical
    by construction, different plan (plan-tested)."""
    ev = events_stream(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
                .by("user_id", name="user_id").map(cv=F.col("value")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .by("user_id", name="user_id").map(pv=F.col("value")))
    out = clicks.take(purchases, ["cv"], ["pv"], broadcast_state=True)
    return out.df.select("user_id", "ts", "event_id", "cv", "pv")


@query("live_asof_purchase_last_click", _ASOF_ORACLE)
def live_asof_purchase_last_click(spark, sf_dir):
    """The as-of join (take) as a Structured Streaming plan — closes the
    reference's one-expression-two-modes contract (EventSource.java:3-6)
    for take/sample: per-key last-left-value state, emit on right rows.
    Same oracle as the batch asof: live must be value-identical."""
    from scespet_spark.streaming.live import (asof_latest, read_events_stream,
                                              run_available_now)
    src = read_events_stream(spark, sf_dir)
    live = asof_latest(
        src.filter(F.col("event_type") == "click").withColumn("cv", F.col("value")),
        src.filter(F.col("event_type") == "purchase").withColumn("pv", F.col("value")),
        ["user_id"], ["cv"], ["pv"])
    return run_available_now(live, "append").select(
        "user_id", "ts", "event_id", "cv", "pv")


@query("sample_daily_value", """
WITH days AS (
  SELECT UNNEST(generate_series(
    (SELECT DATE_TRUNC('day', MIN(ts)) FROM events) + INTERVAL 1 DAY,
    (SELECT DATE_TRUNC('day', MAX(ts)) FROM events) + INTERVAL 1 DAY,
    INTERVAL 1 DAY)) AS ts),
spine AS (
  SELECT u.user_id, d.ts FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN days d),
u AS (
  SELECT user_id, ts, event_id, 0 AS side, {'v': value} AS value FROM events
  UNION ALL
  SELECT user_id, ts, 4611686018427387904 AS event_id, 1 AS side,
         NULL::STRUCT(v DOUBLE) AS value FROM spine),
f AS (
  SELECT user_id, ts, side,
         struct_extract(LAST_VALUE(value IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id, side
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 'v') AS value
  FROM u)
SELECT user_id, ts, value FROM f WHERE side = 1
""")
def sample_daily_value(spark, sf_dir):
    from scespet_spark.sources.batch import timer_spine
    ev = events_stream(spark, sf_dir).by("user_id", name="user_id")
    bounds = ev.df.agg(
        F.date_trunc("day", F.min("ts")).alias("lo"),
        F.date_trunc("day", F.max("ts")).alias("hi")).collect()[0]
    days = timer_spine(spark, bounds.lo, bounds.hi, "1 DAY").map(
        ts2=F.col("ts") + F.expr("INTERVAL 1 DAY")).df.select(
        F.col("ts2").alias("ts"), F.lit(2**62).cast("long").alias("event_id"))
    users = ev.key_set()
    spine = Stream(users.crossJoin(days), t="ts", seq="event_id", keys=("user_id",))
    out = ev.sample(spine, ["value"])
    return out.df.select("user_id", "ts", "value")


# ---------------------------------------------------------------------------
# value sets / key algebra / cross-key vector functions
# ---------------------------------------------------------------------------


@query("value_set_types", """
SELECT user_id, ts, event_id, event_type FROM (
  SELECT user_id, ts, event_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events) WHERE rn = 1
""")
def value_set_types(spark, sf_dir):
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.value_set(F.array("event_type"), name="etype")
    return out.df.select("user_id", "ts", "event_id",
                         F.col("etype").alias("event_type"))


@query("map_keys_user_bucket", """
SELECT user_id % 4 AS key,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total, COUNT(*) AS n
FROM events GROUP BY user_id % 4
""")
def map_keys_user_bucket(spark, sf_dir):
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    rekeyed = s.map_keys(F.col("user_id") % 4, name="key")
    return rekeyed.reduce(_dsum("value").alias("total"), F.count("*").alias("n"))


@query("subset_active_users", """
SELECT user_id, COUNT(*) AS n FROM events WHERE user_id < 8 GROUP BY user_id
""")
def subset_active_users(spark, sf_dir):
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    return s.subset(F.col("user_id") < 8).reduce(F.count("*").alias("n"))


@query("distinct_users_running", """
SELECT ts, event_id,
       CAST(SUM(first_flag) OVER (ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS BIGINT)
         AS n_users_seen
FROM (
  SELECT ts, event_id,
         CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_flag
  FROM events)
""")
def distinct_users_running(spark, sf_dir):
    from pyspark.sql import Window
    s = events_stream(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = s.map(first_flag=(F.row_number().over(w) == 1).cast("long"))
    # scalable global scan: per-day buckets + prefix of bucket totals
    out = flagged.scan(buckets=F.date_trunc("day", F.col("ts")),
                       n_users_seen=F.sum("first_flag"))
    return out.df.select("ts", "event_id", "n_users_seen")


@query("approx_distinct_users_daily", """
SELECT DATE_TRUNC('day', ts) AS day, COUNT(*) AS n_events,
       TRUE AS approx_within_3rsd
FROM events GROUP BY 1 ORDER BY day
""")
def approx_distinct_users_daily(spark, sf_dir):
    """The 100 TB cardinality path: HLL++ approx_count_distinct per day
    — a combinable sketch (fixed-size partials merge map-side) where
    exact distinct would shuffle every (day, user) pair.

    INVARIANT oracle (late-r10; sketch estimates are engine-specific,
    so the raw estimate has no SQL twin): ``n_events`` is exact, and
    ``approx_within_3rsd`` asserts the estimate sits within 3x the
    sketch's relative standard deviation (rsd=0.05 -> 15%) of the
    per-day exact cardinality — rsd is a STANDARD DEVIATION, not a
    bound (measured max excursion on this corpus: 1.9 sigma at sf0.1),
    so the honest assertion is the 3-sigma envelope.  The exact side is
    computed in-query as the test harness (a production run keeps the
    sketch alone; exactness of the underlying valueSet semantics is
    separately proven by distinct_users_running / value_set_types)."""
    s = events_stream(spark, sf_dir)
    rsd = 0.05
    agg = (s.df.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
           .agg(F.approx_count_distinct("user_id", rsd).alias("__approx"),
                F.count_distinct("user_id").alias("__exact"),
                F.count("*").alias("n_events")))
    return (agg.select(
        "day", "n_events",
        # NOTE (r10 advice): rsd is a STANDARD DEVIATION, not a bound —
        # the oracle hardcodes TRUE, so a new corpus/scale factor can
        # legitimately exceed 3 sigma and fail the sweep without the
        # operator being wrong.  Measured headroom on the fixed sfs
        # here: max excursion 1.9 sigma at sf0.1 (envelope 3.0).  If a
        # new sf is added, re-measure and widen this margin to the
        # observed excursion + slack rather than debugging a "failure".
        (F.abs(F.col("__approx") - F.col("__exact"))
         <= F.lit(3 * rsd) * F.col("__exact")).alias("approx_within_3rsd"))
        .orderBy("day"))


@query("map_vector_running", """
SELECT event_id, ts,
       COUNT(*) OVER w AS n_events,
       MAX(value) OVER w AS vmax
FROM events
WINDOW w AS (ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""")
def map_vector_running(spark, sf_dir):
    """Cross-key whole-vector function at each event (reference:
    mapVector, VectTerm.scala:145-176).  Uses the bucketed two-phase
    prefix path (daily buckets, count merges by sum / max by max) so the
    plan has no single-partition global window."""
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.map_vector(buckets=F.date_trunc("day", F.col("ts")),
                       merge={"vmax": "max"},
                       n_events=F.count("*"), vmax=F.max("value"))
    return out.df.select("event_id", "ts", "n_events", "vmax")


@query("at_single_key", """
SELECT event_id, ts, value,
       COUNT(*) OVER (ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n
FROM events WHERE user_id = 5
""")
def at_single_key(spark, sf_dir):
    """One key's stream from a vector (reference: VectTerm.apply,
    VectTerm.scala:63-111)."""
    s = events_stream(spark, sf_dir).by("user_id", name="user_id").at(5)
    return s.scan(n=F.count("*")).df.select("event_id", "ts", "value", "n")


@query("key_list_running", """
WITH fs AS (
  SELECT user_id, MIN(ROW(ts, event_id)) AS f FROM events GROUP BY user_id),
day_end AS (
  SELECT ts, event_id FROM events
  WHERE event_id IN (SELECT MAX(event_id) FROM events
                     GROUP BY DATE_TRUNC('day', ts)))
SELECT d.ts, d.event_id,
       COALESCE(array_to_string(list_sort(
           LIST(fs.user_id) FILTER (fs.user_id IS NOT NULL)), ','), '')
         AS keys
FROM day_end d LEFT JOIN fs ON fs.f <= ROW(d.ts, d.event_id)
GROUP BY d.ts, d.event_id
""")
def key_list_running(spark, sf_dir):
    """Growing key list (reference: keyList, VectTerm.scala:43-52)
    SAMPLED at daily boundaries via ``key_list_at`` — the scale form:
    the per-event running list is O(rows x keys) and inherently serial
    (it failed its own result materialization at sf0.1); the first-seen
    table range-joined against the spine gives identical list contents
    at each sampled event with no global window."""
    from scespet_spark.core.stream import Stream
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    day_end = (s.df.groupBy(F.date_trunc("day", F.col("ts")).alias("__d"))
               .agg(F.max("event_id").alias("event_id"))
               .join(s.df.select("ts", "event_id"), "event_id"))
    spine = Stream(day_end.select("ts", "event_id"), t="ts", seq="event_id")
    out = s.key_list_at(spine).df.select("ts", "event_id", "keys")
    # joined string, not a list column: driver-hashable (the pandas
    # canonicalizer crashes on list cells), same information
    return out.withColumn(
        "keys", F.array_join(F.col("keys").cast("array<string>"), ","))


@query("nested_group_reduce", """
SELECT event_type, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM events GROUP BY event_type, user_id
""")
def nested_group_reduce(spark, sf_dir):
    """Second-level grouping (reference: VectTerm.groupby /
    NestedVector.scala:14-52) — flat multi-column grouping."""
    s = (events_stream(spark, sf_dir).by("user_id", name="user_id")
         .group_by_second_key(F.col("event_type"), name="event_type"))
    return s.reduce(_dsum("value").alias("total"), F.count("*").alias("n"))


@query("key_to_stream_daily", """
WITH keys AS (SELECT DISTINCT user_id FROM events WHERE user_id < 20),
fac AS (
  SELECT user_id, DATE_TRUNC('day', ts) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
  FROM events GROUP BY user_id, DATE_TRUNC('day', ts))
SELECT k.user_id, f.day, f.total
FROM keys k LEFT JOIN fac f ON k.user_id = f.user_id
""")
def key_to_stream_daily(spark, sf_dir):
    """Keyset -> per-key stream via factory (reference: keyToStream,
    VectTerm.scala:435-440)."""
    ev = events_stream(spark, sf_dir).by("user_id", name="user_id")
    keyset = ev.subset(F.col("user_id") < 20)
    daily = ev.group(Every("1 day")).reduce(
        total=_dsum("value"), day=F.min(F.date_trunc("day", F.col("ts"))))
    factory = Stream(daily.df.select("user_id", "day", "total",
                                     F.col("day").alias("__t"),
                                     F.lit(0).cast("long").alias("__s")),
                     t="__t", seq="__s", keys=("user_id",))
    out = keyset.key_to_stream(factory)
    return out.df.select("user_id", "day", "total")


@query("slice_by_purchase_trigger", """
WITH c AS (SELECT user_id, ts, event_id, value FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
u AS (
  SELECT user_id, ts, event_id, 0 AS trig, value FROM c
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS trig, NULL::DOUBLE AS value FROM p),
f AS (
  SELECT *, SUM(trig) OVER (PARTITION BY user_id ORDER BY ts, trig, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - trig AS b
  FROM u)
SELECT user_id, MAX(ts) AS ts,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       COUNT(*) AS n
FROM f WHERE trig = 0 GROUP BY user_id, b
""")
def slice_by_purchase_trigger(spark, sf_dir):
    """Slice each user's click stream by that user's purchase events —
    external-stream slice trigger, per key (reference: MacroTerm slice
    spec SliceTriggerSpec.scala:57-73; per-key VectSliceTriggerSpec
    SliceTriggerSpec.scala:76-118)."""
    from scespet_spark import TriggerStream
    ev = events_stream(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
                .by("user_id", name="user_id"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .by("user_id", name="user_id"))
    out = clicks.group(TriggerStream(purchases, AFTER)).reduce(
        total=_dsum("value"), n=F.count("*"))
    return out.df.select("user_id", "ts", "total", "n")


@query("slice_stream_scan", """
WITH c AS (SELECT user_id, ts, event_id, value FROM events
           WHERE event_type = 'click'),
p AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'),
u AS (
  SELECT user_id, ts, event_id, 0 AS trig, value FROM c
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS trig, NULL::DOUBLE AS value FROM p),
f AS (
  SELECT *, SUM(trig) OVER (PARTITION BY user_id ORDER BY ts, trig, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - trig AS b
  FROM u)
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id, b ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS total,
       CAST(COUNT(*) OVER (PARTITION BY user_id, b ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n
FROM f WHERE trig = 0
""")
def slice_stream_scan(spark, sf_dir):
    """Trigger-stream-slice CUMULATIVE emission: every click emits its
    purchase-delimited bucket's running aggregate (the scan counterpart
    of slice_by_purchase_trigger)."""
    from scespet_spark import TriggerStream
    ev = events_stream(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
                .by("user_id", name="user_id"))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .by("user_id", name="user_id"))
    out = clicks.group(TriggerStream(purchases, AFTER)).scan(
        total=F.sum(F.col("value").cast("decimal(18,2)")), n=F.count("*"))
    return out.df.select("user_id", "event_id",
                         F.col("total").cast("double").alias("total"), "n")


@query("live_trigger_stream_scan", _ORACLES["slice_stream_scan"])
def live_trigger_stream_scan(spark, sf_dir):
    """Trigger-stream-slice scan as a streaming plan — same oracle as
    slice_stream_scan."""
    from scespet_spark.streaming.live import LiveStream
    src = LiveStream.from_events(spark, sf_dir)
    clicks = src.filter(F.col("event_type") == "click").by("user_id")
    purchases = src.filter(F.col("event_type") == "purchase").by("user_id")
    out = clicks.trigger_stream_scan(purchases, "value", "AFTER",
                                     quantize=100)
    return out.run("append").select("user_id", "event_id", "total", "n")


@query("window_from_scan", """
WITH d AS (SELECT user_id, ts, event_id, value FROM events
           WHERE event_type = 'purchase'),
gs AS (SELECT user_id, ts, event_id, (value >= 100) AS g FROM events
       WHERE event_type = 'click'),
u AS (
  SELECT user_id, ts, event_id, value, 1 AS side, NULL::BOOLEAN AS g FROM d
  UNION ALL
  SELECT user_id, ts, event_id, NULL::DOUBLE AS value, 0 AS side, g FROM gs),
f AS (
  SELECT *, COALESCE(LAST_VALUE(g IGNORE NULLS) OVER (
      PARTITION BY user_id ORDER BY ts, side, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), FALSE) AS gate
  FROM u),
dd AS (SELECT user_id, ts, event_id, value, gate FROM f WHERE side = 1),
r AS (
  SELECT *, CASE WHEN gate AND NOT COALESCE(
      LAG(gate) OVER (PARTITION BY user_id ORDER BY ts, event_id), FALSE)
    THEN 1 ELSE 0 END AS rising FROM dd),
w AS (
  SELECT *, SUM(rising) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS win FROM r)
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id, win ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS total,
       CAST(COUNT(*) OVER (PARTITION BY user_id, win ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n
FROM w WHERE gate
""")
def window_from_scan(spark, sf_dir):
    """CUMULATIVE emission inside windows gated by a separate stream:
    every in-window purchase emits the window's running aggregate (the
    scan counterpart of window_from_reduce; open windows DO emit)."""
    ev = events_stream(spark, sf_dir)
    purchases = (ev.filter(F.col("event_type") == "purchase")
                 .by("user_id", name="user_id"))
    clicks = (ev.filter(F.col("event_type") == "click")
              .by("user_id", name="user_id")
              .map(g=F.col("value") >= 100))
    out = purchases.window_from(clicks, "g").scan(
        total=F.sum(F.col("value").cast("decimal(18,2)")), n=F.count("*"))
    return out.df.select("user_id", "event_id",
                         F.col("total").cast("double").alias("total"), "n")


@query("live_window_from_scan", _ORACLES["window_from_scan"])
def live_window_from_scan(spark, sf_dir):
    """window_from scan as a streaming plan — same oracle as
    window_from_scan."""
    from scespet_spark.streaming.live import LiveStream
    src = LiveStream.from_events(spark, sf_dir)
    data = src.filter(F.col("event_type") == "purchase").by("user_id")
    gate = (src.filter(F.col("event_type") == "click")
            .map(g=F.col("value") >= 100).by("user_id"))
    out = data.window_from_scan(gate, "g", "value", quantize=100)
    return out.run("append").select("user_id", "event_id", "total", "n")


@query("funnel_view_to_purchase", """
SELECT user_id,
       MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
       MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS first_purchase,
       epoch_us(MIN(CASE WHEN event_type = 'purchase' THEN ts END))
         - epoch_us(MIN(CASE WHEN event_type = 'view' THEN ts END))
         AS micros_to_convert
FROM events
GROUP BY user_id
HAVING MIN(CASE WHEN event_type = 'view' THEN ts END) IS NOT NULL
   AND MIN(CASE WHEN event_type = 'purchase' THEN ts END) IS NOT NULL
""")
def funnel_view_to_purchase(spark, sf_dir):
    """Per-key event-lifecycle analytics (reference pattern:
    OrderReportsExample.scala:19-36 — subtype streams recombined per
    key): first view -> first purchase conversion lag."""
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.reduce(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("first_purchase"),
    ).filter(F.col("first_view").isNotNull() & F.col("first_purchase").isNotNull())
    return out.withColumn(
        "micros_to_convert",
        F.unix_micros("first_purchase") - F.unix_micros("first_view"))


@query("session_windows_user", """
WITH l AS (
  SELECT user_id, ts, event_id, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
s AS (
  SELECT *, SUM(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 1 DAY
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM l)
SELECT user_id, MAX(ts) AS ts, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM s GROUP BY user_id, sid
""")
def session_windows_user(spark, sf_dir):
    """Gap-based session windows per user (new capability beyond the
    reference, native Spark semantics)."""
    from scespet_spark import Session
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.group(Session("1 day")).reduce(n=F.count("*"), total=_dsum("value"))
    return out.df.select("user_id", "ts", "n", "total")


@query("session_windows_scan", """
WITH l AS (
  SELECT user_id, ts, event_id, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
s AS (
  SELECT *, SUM(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 1 DAY
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM l)
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS total,
       CAST(COUNT(*) OVER (PARTITION BY user_id, sid ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n
FROM s
""")
def session_windows_scan(spark, sf_dir):
    """Session-window CUMULATIVE emission: every event emits its
    session's running aggregate (the scan counterpart of
    session_windows_user)."""
    from scespet_spark import Session
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.group(Session("1 day")).scan(
        total=F.sum(F.col("value").cast("decimal(18,2)")), n=F.count("*"))
    return out.df.select("user_id", "event_id",
                         F.col("total").cast("double").alias("total"), "n")


@query("live_session_scan", _ORACLES["session_windows_scan"])
def live_session_scan(spark, sf_dir):
    """Session scan as a streaming plan (sliced_scan with the Session
    spec): per-key gap tracking + running session partials in the state
    store — same oracle as the batch session_windows_scan."""
    from scespet_spark import Session
    from scespet_spark.streaming.live import LiveStream
    live = (LiveStream.from_events(spark, sf_dir).by("user_id")
            .group(Session("1 day")).scan("value", quantize=100))
    return live.run("append").select("user_id", "event_id", "total", "n")


@query("count_buckets_scan", """
WITH b AS (
  SELECT user_id, ts, event_id, value,
         (ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id)
          - 1) // 50 AS bucket
  FROM events)
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id, bucket ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS total,
       CAST(COUNT(*) OVER (PARTITION BY user_id, bucket ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n
FROM b
""")
def count_buckets_scan(spark, sf_dir):
    """Count-bucket CUMULATIVE emission: every event emits its 50-event
    bucket's running aggregate (the scan counterpart of
    group_count_reduce)."""
    from scespet_spark import Count
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.group(Count(50)).scan(
        total=F.sum(F.col("value").cast("decimal(18,2)")), n=F.count("*"))
    return out.df.select("user_id", "event_id",
                         F.col("total").cast("double").alias("total"), "n")


@query("live_count_scan", _ORACLES["count_buckets_scan"])
def live_count_scan(spark, sf_dir):
    """Count-bucket scan as a streaming plan (sliced_scan with the
    Count spec) — same oracle as count_buckets_scan."""
    from scespet_spark import Count
    from scespet_spark.streaming.live import LiveStream
    live = (LiveStream.from_events(spark, sf_dir).by("user_id")
            .group(Count(50)).scan("value", quantize=100))
    return live.run("append").select("user_id", "event_id", "total", "n")


@query("slice_scan_signup", """
WITH r AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS b
  FROM events),
w AS (
  SELECT *, SUM(b) OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - b AS bucket
  FROM r)
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id, bucket ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS total,
       CAST(COUNT(*) OVER (PARTITION BY user_id, bucket ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS n
FROM w
""")
def slice_scan_signup(spark, sf_dir):
    """Data-driven-slice CUMULATIVE emission (AFTER alignment: the
    signup closes its bucket): every event emits its slice's running
    aggregate (the scan counterpart of slice_after_signup)."""
    from scespet_spark import AFTER, Trigger
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.group(Trigger(F.col("event_type") == "signup", AFTER)).scan(
        total=F.sum(F.col("value").cast("decimal(18,2)")), n=F.count("*"))
    return out.df.select("user_id", "event_id",
                         F.col("total").cast("double").alias("total"), "n")


@query("live_trigger_scan", _ORACLES["slice_scan_signup"])
def live_trigger_scan(spark, sf_dir):
    """Data-driven-slice scan as a streaming plan (sliced_scan with the
    Trigger spec, AFTER alignment) — same oracle as slice_scan_signup."""
    from scespet_spark import AFTER, Trigger
    from scespet_spark.streaming.live import LiveStream
    live = (LiveStream.from_events(spark, sf_dir).by("user_id")
            .group(Trigger(F.col("event_type") == "signup", AFTER))
            .scan("value", quantize=100))
    return live.run("append").select("user_id", "event_id", "total", "n")


@query("live_session_windows", """
WITH l AS (
  SELECT user_id, ts, event_id, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events),
s AS (
  SELECT *, SUM(CASE WHEN prev IS NULL OR ts - prev > INTERVAL 1 DAY
                     THEN 1 ELSE 0 END)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM l)
SELECT user_id, MAX(ts) AS ts, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM s GROUP BY user_id, sid
""")
def live_session_windows(spark, sf_dir):
    """Session windows executed as a Structured Streaming plan — native
    ``session_window`` per-key state (state purged past the watermark)
    — against the SAME sessionization oracle as the batch query: live
    mode must be value-identical, not just plausible."""
    from scespet_spark import Session
    from scespet_spark.streaming.live import LiveStream
    live = (LiveStream.from_events(spark, sf_dir)
            .by("user_id")
            .group(Session("1 day"))
            .reduce(ts=F.max("ts"), n=F.count("*"), total=_dsum("value")))
    return live.run("complete").select("user_id", "ts", "n", "total")


@query("sliding_window_user", """
WITH w AS (
  SELECT user_id, value,
         UNNEST([DATE_TRUNC('day', ts),
                 DATE_TRUNC('day', ts) - INTERVAL 1 DAY]) AS win_start
  FROM events)
SELECT user_id, win_start, COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM w GROUP BY user_id, win_start
""")
def sliding_window_user(spark, sf_dir):
    """2-day windows sliding daily per user (new capability beyond the
    reference; each event lands in duration/slide windows)."""
    from scespet_spark import Sliding
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.group(Sliding("2 days", "1 day")).reduce(
        n=F.count("*"), total=_dsum("value"))
    return out.df.select("user_id", "win_start", "n", "total")


@query("sliding_window_scan", """
WITH m AS (
  SELECT user_id, ts, event_id, value,
         UNNEST([DATE_TRUNC('day', ts),
                 DATE_TRUNC('day', ts) - INTERVAL 1 DAY]) AS win_start
  FROM events)
SELECT user_id, event_id, win_start,
       CAST(SUM(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id, win_start ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_total
FROM m
""")
def sliding_window_scan(spark, sf_dir):
    """CUMULATIVE emission on sliding windows: per-event window
    membership explodes (each event belongs to duration/slide windows)
    and every (event, window) row carries that window's running
    aggregate — completing the scan/reduce verb matrix for Sliding
    (a new capability; the reference has no sliding windows)."""
    from scespet_spark import Sliding
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    out = s.group(Sliding("2 days", "1 day")).scan(
        running_total=F.sum(F.col("value").cast("decimal(18,2)")))
    return out.df.select("user_id", "event_id", "win_start",
                         F.col("running_total").cast("double")
                          .alias("running_total"))


@query("live_sliding_scan", _ORACLES["sliding_window_scan"])
def live_sliding_scan(spark, sf_dir):
    """Sliding-window CUMULATIVE emission as a Structured Streaming plan
    (r5 VERDICT item #6): each event explodes into its member windows
    and per-(key, window) state carries the running sum — same oracle
    as the batch sliding_window_scan query (live must be
    value-identical)."""
    from scespet_spark import Sliding
    from scespet_spark.streaming.live import LiveStream
    live = (LiveStream.from_events(spark, sf_dir)
            .by("user_id")
            .group(Sliding("2 days", "1 day")).scan("value", quantize=100))
    return live.run("append").select("user_id", "event_id", "win_start",
                                     "running_total")


@query("to_stream_mux", """
SELECT user_id, ts, event_id, value FROM events
""")
def to_stream_mux(spark, sf_dir):
    """Demux then remux: vector back to a single (K, X) stream
    (reference: toStream / VectorToStream.scala:8-76 — keyed rows
    already are the multiplexed form, so this is a zero-cost plan)."""
    s = events_stream(spark, sf_dir).by("user_id", name="user_id").to_stream()
    return s.df.select("user_id", "ts", "event_id", "value")


@query("to_key_set", """
SELECT DISTINCT user_id FROM events
""")
def to_key_set(spark, sf_dir):
    """Vector of keys as values (reference: toKeySet, VectTerm.scala:355-363)."""
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    return s.key_set()


@query("reduce_all_global", """
SELECT COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total,
       MAX(value) AS vmax, MIN(ts) AS first_ts, MAX(ts) AS last_ts
FROM events
""")
def reduce_all_global(spark, sf_dir):
    """Whole-stream final aggregate flushed at termination (reference:
    reduce_all, MacroTerm.scala:63-84; termination SimpleEnv.scala:93)."""
    ev = events_stream(spark, sf_dir)
    return ev.reduce(F.count("*").alias("n"), _dsum("value").alias("total"),
                     F.max("value").alias("vmax"),
                     F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts"))


# ---------------------------------------------------------------------------
# custom reducers: EWMA (stateful pandas fold), VWAP, mode, collect
# ---------------------------------------------------------------------------


@query("live_ewma_final_per_user", """
SELECT user_id,
       LIST_REDUCE(LIST(value::DOUBLE ORDER BY ts, event_id),
                   (acc, v) -> 0.125 * v + 0.875 * acc) AS ewma
FROM events GROUP BY user_id
""")
def live_ewma_final_per_user(spark, sf_dir):
    """EWMA as a streaming plan: the reference's mutable Agg cell
    (ReduceFuncs.scala:33-38) as per-key state — the same sequential
    IEEE recurrence, so values are bit-identical to the batch fold and
    the DuckDB LIST_REDUCE oracle.  The termination read (final value
    per key) happens at the sink, as in batch (SimpleEnv.scala:93)."""
    from scespet_spark.streaming.live import (read_events_stream,
                                              run_available_now, stateful_scan)

    def step(st, pdf):
        rows = []
        for ts, sq, v in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
            v = float(v)
            st["ewma"] = v if not st["seen"] else 0.125 * v + 0.875 * st["ewma"]
            st["seen"] = 1.0
            rows.append({"ts": ts, "event_id": int(sq), "ewma": st["ewma"]})
        return rows

    live = stateful_scan(read_events_stream(spark, sf_dir), ["user_id"],
                         {"ewma": 0.0, "seen": 0.0}, step,
                         "user_id long, ts timestamp, event_id long, ewma double",
                         order_cols=["ts", "event_id"])
    out = run_available_now(live, "append")
    return (out.groupBy("user_id")
            .agg(F.max_by("ewma", F.struct("ts", "event_id")).alias("ewma")))


@query("ewma_final_per_user", """
SELECT user_id,
       LIST_REDUCE(LIST(value::DOUBLE ORDER BY ts, event_id),
                   (acc, v) -> 0.125 * v + 0.875 * acc) AS ewma
FROM events GROUP BY user_id
""")
def ewma_final_per_user(spark, sf_dir):
    from scespet_spark.functions.reducers import ewma as ewma_op
    ev = events_stream(spark, sf_dir)
    # project before the Arrow transfer: the fold only needs (key, t,
    # seq, value) — don't ship the other columns through Python
    s = Stream(ev.df.select("ts", "event_id", "user_id", "value"),
               t="ts", seq="event_id", keys=("user_id",))
    per_event = ewma_op(s, "value", alpha=0.125, out="ewma")
    return per_event.reduce(F.max_by("ewma", F.struct("ts", "event_id")).alias("ewma"))


@query("vwap_per_supplier", """
SELECT l_suppkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
       / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS vwap
FROM lineitem GROUP BY l_suppkey
""")
def vwap_per_supplier(spark, sf_dir):
    from scespet_spark.functions.reducers import vwap
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_suppkey").agg(
        vwap("l_extendedprice", "l_quantity").alias("vwap"))


@query("live_vwap_per_supplier", _ORACLES["vwap_per_supplier"])
def live_vwap_per_supplier(spark, sf_dir):
    """The VWAP reducer over a LIVE trade stream (the reference's
    canonical realtime use, RealTradeTests.scala:22-23): decimal-exact
    sum(px*qty)/sum(qty) as a complete-mode streaming aggregation —
    partials are combinable, so each micro-batch folds map-side.  Same
    oracle as the batch query."""
    from scespet_spark.functions.reducers import vwap
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    li = read_table_stream(spark, sf_dir, "lineitem")
    out = li.groupBy("l_suppkey").agg(
        vwap("l_extendedprice", "l_quantity").alias("vwap"))
    return run_available_now(out, "complete")


@query("json_props_stats", """
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
       MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
       MAX(CAST(props->>'k' AS BIGINT)) AS max_k
FROM events
GROUP BY event_type
""")
def json_props_stats(spark, sf_dir):
    """Semi-structured column extraction: parse the JSON ``props``
    payload JVM-side (``get_json_object`` — whole-stage codegen, no
    Python) and aggregate the extracted field.  The reference carries
    arbitrary host objects per event (types.scala:63-75); in a columnar
    engine ad-hoc payloads arrive as JSON strings and this is the
    map-only scan that turns them into typed columns at 100 TB (at rest,
    promote hot fields to real columns / a VariantType).  Integer sums
    — exact, no float-order concerns."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (ev.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(k).alias("sum_k"),
                 F.min(k).alias("min_k"),
                 F.max(k).alias("max_k")))


@query("corpus_source_profile", """
SELECT source, lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS DOUBLE) / COUNT(*) AS mean_chars
FROM documents
GROUP BY source, lang
""")
def corpus_source_profile(spark, sf_dir):
    """Corpus composition report (source x language doc counts and
    sizes) — the bookkeeping every training-data pipeline needs to set
    source mixing weights.  One map-side-combinable groupBy over
    metadata columns only: the text column is pruned from the scan, so
    at 100 TB this reads a few GB of metadata, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    return (docs.groupBy("source", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
                 (F.sum(F.col("n_chars").cast("long")).cast("double")
                  / F.count("*")).alias("mean_chars")))


@query("mode_event_type", """
SELECT user_id, event_type AS mode FROM (
  SELECT user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY COUNT(*) DESC, event_type) AS r
  FROM events GROUP BY user_id, event_type) WHERE r = 1
""")
def mode_event_type(spark, sf_dir):
    from scespet_spark.functions.reducers import deterministic_mode
    ev = load_table(spark, sf_dir, "events")
    return deterministic_mode(ev, ["user_id"], "event_type")


@query("collect_types_sorted", """
SELECT user_id,
       ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT event_type)), ',') AS types
FROM events GROUP BY user_id
""")
def collect_types_sorted(spark, sf_dir):
    """Set-accumulate reducer (reference: Reduce.scala collect shapes).
    Emitted as a sorted comma-joined string — same information as the
    sorted list, but hashable by the driver's pandas canonicalizer
    (list-typed cells crash ``sort_values``)."""
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    return s.reduce(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",")
        .alias("types"))


# ---------------------------------------------------------------------------
# multi-input buckets: bind (tagged union + rendezvous), collapse (lifecycle)
# ---------------------------------------------------------------------------


@query("bind_hourly_rendezvous", """
WITH u AS (
  SELECT user_id, DATE_TRUNC('hour', ts) AS cyc, event_type FROM events
  WHERE event_type IN ('click', 'purchase')),
c AS (
  SELECT user_id, cyc,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_c,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p
  FROM u GROUP BY user_id, cyc)
SELECT user_id, DATE_TRUNC('day', cyc) AS day,
       CAST(SUM(has_c) AS BIGINT) AS n_click_cycles,
       CAST(SUM(has_p) AS BIGINT) AS n_purchase_cycles,
       CAST(SUM(has_c * has_p) AS BIGINT) AS n_both_cycles
FROM c GROUP BY user_id, DATE_TRUNC('day', cyc)
""")
def bind_hourly_rendezvous(spark, sf_dir):
    """N-input bucket rendezvous, pure-columnar translation: bind click
    and purchase streams, one atomic row per (user, hour) cycle, then a
    daily bucket counting cycles where each / both sides fired
    (reference: XYCollector.countBoth, TestMultiBucketing.scala:92-98)."""
    from scespet_spark.operators.buckets import bind
    ev = events_stream(spark, sf_dir)
    clicks = (ev.filter(F.col("event_type") == "click")
                .by("user_id", name="user_id").map(cv=F.col("value")))
    purchases = (ev.filter(F.col("event_type") == "purchase")
                   .by("user_id", name="user_id").map(pv=F.col("value")))
    u = bind({"click": (clicks, ["cv"]), "purchase": (purchases, ["pv"])})
    cycles = (u.df.groupBy("user_id", F.date_trunc("hour", F.col("ts")).alias("cyc"))
              .agg(F.max((F.col("side") == "click").cast("long")).alias("has_c"),
                   F.max((F.col("side") == "purchase").cast("long")).alias("has_p")))
    return (cycles.groupBy("user_id", F.date_trunc("day", "cyc").alias("day"))
            .agg(F.sum("has_c").alias("n_click_cycles"),
                 F.sum("has_p").alias("n_purchase_cycles"),
                 F.sum(F.col("has_c") * F.col("has_p")).alias("n_both_cycles")))


@query("live_bind_hourly", """
WITH u AS (
  SELECT user_id, DATE_TRUNC('hour', ts) AS cyc, event_type FROM events
  WHERE event_type IN ('click', 'purchase')),
c AS (
  SELECT user_id, cyc,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS has_c,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_p
  FROM u GROUP BY user_id, cyc),
b AS (
  SELECT user_id, DATE_TRUNC('day', cyc) AS day,
         CAST(SUM(has_c) AS BIGINT) AS n_click_cycles,
         CAST(SUM(has_p) AS BIGINT) AS n_purchase_cycles,
         CAST(SUM(has_c * has_p) AS BIGINT) AS n_both_cycles
  FROM c GROUP BY user_id, DATE_TRUNC('day', cyc))
SELECT user_id, day, n_click_cycles, n_purchase_cycles, n_both_cycles
FROM b
WHERE day < (SELECT MAX(day) FROM b b2 WHERE b2.user_id = b.user_id)
""")
def live_bind_hourly(spark, sf_dir):
    """Live N-way bucket bind (reference Entry point C: trades+quotes
    into one Stats bucket, EnvTermBuilder.scala:113-134): click and
    purchase STREAMS rendezvous per (user, hour) cycle into one daily
    XY-collector bucket — add_cycle fires exactly once per cycle even
    when the sides land in different micro-batches (the open cycle's
    rows are state until a later cycle proves it complete,
    JoinValueRendezvous semantics).  Only closed cycles fire and only
    closed buckets emit, so the oracle is batch bind_hourly_rendezvous
    minus each user's final day."""
    from scespet_spark.operators.buckets import CycleBucket
    from scespet_spark.streaming.live import (live_bind,
                                              read_events_stream,
                                              run_available_now)

    class XY(CycleBucket):
        def open(self):
            self.c = self.p = self.b = 0

        def add_cycle(self, cycle):
            hc = bool((cycle["side"] == "click").any())
            hp = bool((cycle["side"] == "purchase").any())
            self.c += int(hc)
            self.p += int(hp)
            self.b += int(hc and hp)

        def value(self):
            return {"n_click_cycles": self.c, "n_purchase_cycles": self.p,
                    "n_both_cycles": self.b}

    src = read_events_stream(spark, sf_dir)
    clicks = (src.filter(F.col("event_type") == "click")
              .withColumn("cyc", F.date_trunc("hour", "ts")))
    purchases = (src.filter(F.col("event_type") == "purchase")
                 .withColumn("cyc", F.date_trunc("hour", "ts")))
    out = live_bind(
        {"click": (clicks, ["cyc", "value"]),
         "purchase": (purchases, ["cyc", "value"])},
        ["user_id"], XY, "1 day",
        "n_click_cycles long, n_purchase_cycles long, n_both_cycles long",
        cycle_col="cyc")
    return (run_available_now(out, "append")
            .select("user_id", F.date_trunc("day", "ts").alias("day"),
                    "n_click_cycles", "n_purchase_cycles", "n_both_cycles"))


@query("bucket_collapse_stats", """
SELECT user_id,
       MAX(ts) AS ts, MAX(event_id) AS event_id,
       COUNT(DISTINCT ts) AS n_cycles, COUNT(*) AS n_events,
       LIST_REDUCE(LIST(value ORDER BY ts, event_id),
                   (a, b) -> a + b) AS total
FROM (SELECT user_id, ts, event_id, value,
             DATE_TRUNC('day', ts) AS day FROM events)
GROUP BY user_id, day
""")
def bucket_collapse_stats(spark, sf_dir):
    """Custom lifecycle bucket (open/add-per-cycle/complete) over daily
    slices via applyInPandas — the reference's mutable-Bucket path
    (SliceCellLifecycle.scala:13-30).  Sequential in-order float sum =
    DuckDB's ordered LIST_REDUCE, bit-for-bit."""
    from scespet_spark.operators.buckets import CycleBucket, collapse
    from scespet_spark import Every

    class Stats(CycleBucket):
        def open(self):
            self.n_cycles = 0
            self.n_events = 0
            self.total = 0.0

        def add_cycle(self, cycle):
            self.n_cycles += 1
            self.n_events += len(cycle)
            for v in cycle["value"]:
                self.total += float(v)

        def value(self):
            return {"n_cycles": self.n_cycles, "n_events": self.n_events,
                    "total": self.total}

    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    return collapse(
        s.group(Every("1 day")), Stats,
        "user_id long, ts timestamp, event_id long, "
        "n_cycles long, n_events long, total double")


@query("live_bucket_collapse_stats", """
WITH b AS (
  SELECT user_id, day, MAX(ts) AS ts, MAX(event_id) AS event_id,
         COUNT(DISTINCT ts) AS n_cycles, COUNT(*) AS n_events,
         LIST_REDUCE(LIST(value ORDER BY ts, event_id),
                     (a, b) -> a + b) AS total
  FROM (SELECT user_id, ts, event_id, value,
               DATE_TRUNC('day', ts) AS day FROM events)
  GROUP BY user_id, day)
SELECT user_id, ts, event_id, n_cycles, n_events, total FROM b
WHERE day < (SELECT MAX(day) FROM b b2 WHERE b2.user_id = b.user_id)
""")
def live_bucket_collapse_stats(spark, sf_dir):
    """The custom lifecycle bucket in LIVE mode (live_collapse): the
    mutable bucket object itself is per-key state, cloudpickled across
    micro-batches; a row in a later daily slice completes the open
    bucket and emits it.  Only CLOSED buckets emit (no termination
    event live — same contract as count_reduce), so the oracle is the
    batch bucket_collapse_stats result minus each key's final day."""
    from scespet_spark.operators.buckets import CycleBucket
    from scespet_spark.streaming.live import (live_collapse,
                                              read_events_stream,
                                              run_available_now)

    class Stats(CycleBucket):
        def open(self):
            self.n_cycles = 0
            self.n_events = 0
            self.total = 0.0

        def add_cycle(self, cycle):
            self.n_cycles += 1
            self.n_events += len(cycle)
            for v in cycle["value"]:
                self.total += float(v)

        def value(self):
            return {"n_cycles": self.n_cycles, "n_events": self.n_events,
                    "total": self.total}

    src = read_events_stream(spark, sf_dir)
    out = live_collapse(src, ["user_id"], Stats, "1 day",
                        "n_cycles long, n_events long, total double")
    return run_available_now(out, "append").select(
        "user_id", "ts", "event_id", "n_cycles", "n_events", "total")


# ===========================================================================
# Training-data pipeline operators over documents / embeddings
# (dedup, similarity search, text analysis, multimodal plumbing)
# ===========================================================================

from scespet_spark.operators.dedup import sh_coeff as _shc  # noqa: E402
from scespet_spark.operators.hashing import h64_sql, h64hi_sql  # noqa: E402

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


def _shingle_hash_sql(n=3):
    """DuckDB mirror of dedup.shingle_hashes over a token-hash list
    column ``hs``: rolling digest sum_j c_j * hs[i+j] mod p, with
    out-of-range positions contributing 0 (list_extract OOB -> NULL)."""
    from scespet_spark.operators.dedup import MH_PRIME, sh_coeff
    terms = " + ".join(
        f"(coalesce(hs[i + {j}], 0) * {sh_coeff(j)}) % {MH_PRIME}"
        for j in range(n))
    return ("list_distinct(list_transform("
            f"generate_series(1, greatest(len(hs) - {n - 1}, 1)), "
            f"i -> ({terms}) % {MH_PRIME}))")


@query("dedup_exact", f"""
SELECT {h64_sql('text')} AS content_hash,
       MIN(doc_id) AS rep_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1
""")
def dedup_exact(spark, sf_dir):
    from scespet_spark.operators.dedup import exact_groups
    return exact_groups(load_table(spark, sf_dir, "documents"))


@query("dedup_exact_wide", f"""
SELECT {h64_sql('text')} AS content_hash,
       {h64hi_sql('text')} AS content_hash2,
       MIN(doc_id) AS rep_id, COUNT(*) AS n_dups
FROM documents GROUP BY 1, 2
""")
def dedup_exact_wide(spark, sf_dir):
    """Exact dedup on the WIDE two-digest key (digest-width discipline
    for corpora past the 60/64-bit birthday bound, SCALE.md r9): the
    election groups on 120 combined bits — both halves of the same md5,
    zero extra hash cost — so no innocent pair of distinct documents
    can merge at any conceivable corpus size."""
    from scespet_spark.operators.dedup import exact_groups
    return exact_groups(load_table(spark, sf_dir, "documents"), wide=True)


def _minhash_ctes(num_hashes=16, bands=4):
    from scespet_spark.operators.dedup import MH_PRIME, mh_coeffs
    rows = num_hashes // bands
    mh = ",\n       ".join(
        "list_min(list_transform(s, x -> ({a} * x + {b}) % {p})) AS mh_{i}"
        .format(a=mh_coeffs(i)[0], b=mh_coeffs(i)[1], p=MH_PRIME, i=i)
        for i in range(num_hashes))
    band_sel = "\n  UNION ALL\n  ".join(
        "SELECT doc_id, {b} AS band, {h} AS band_hash FROM mh".format(
            b=b, h=h64_sql(" || '_' || ".join(
                f"mh_{b * rows + r}::VARCHAR" for r in range(rows))))
        for b in range(bands))
    ctes = f"""toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
hs AS (SELECT doc_id,
              list_transform(t, x -> {h64_sql('x')} % {MH_PRIME}) AS hs
       FROM toks),
sh AS (SELECT doc_id, {_shingle_hash_sql()} AS s FROM hs),
mh AS (SELECT doc_id, {mh} FROM sh),
banded AS ({band_sel}),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b USING (band, band_hash)
  WHERE a.doc_id < b.doc_id)"""
    return ctes


def _minhash_oracle(num_hashes=16, bands=4):
    return (f"WITH {_minhash_ctes(num_hashes, bands)}\n"
            "SELECT id_a, id_b FROM pairs")


@query("dedup_minhash_lsh", _minhash_oracle())
def dedup_minhash_lsh(spark, sf_dir):
    from scespet_spark.operators.dedup import lsh_candidate_pairs
    return lsh_candidate_pairs(load_table(spark, sf_dir, "documents"))


@query("dedup_clusters", f"""
WITH RECURSIVE {_minhash_ctes()},
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
cc(id, label) AS (
  SELECT DISTINCT src AS id, src AS label FROM edges
  UNION
  SELECT e.src AS id, c.label
  FROM edges e JOIN cc c ON e.dst = c.id
  WHERE c.label < e.src)
SELECT id, MIN(label) AS cluster FROM cc GROUP BY id
""")
def dedup_clusters(spark, sf_dir):
    """Duplicate clusters (connected components by min-label propagation
    over the LSH candidate pairs) — join+groupBy-min per iteration with
    lineage checkpointing; oracle is DuckDB's recursive CTE closure."""
    from scespet_spark.operators.dedup import (connected_components,
                                               lsh_candidate_pairs)
    pairs = lsh_candidate_pairs(load_table(spark, sf_dir, "documents"))
    return connected_components(pairs).select("id", "cluster")


@query("dedup_incremental_clusters", f"""
WITH RECURSIVE {_minhash_ctes()},
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
cc(id, label) AS (
  SELECT DISTINCT src AS id, src AS label FROM edges
  UNION
  SELECT e.src AS id, c.label
  FROM edges e JOIN cc c ON e.dst = c.id
  WHERE c.label < e.src)
SELECT id, MIN(label) AS cluster FROM cc GROUP BY id
""")
def dedup_incremental_clusters(spark, sf_dir):
    """Generational cluster maintenance (r11; r12: artifact-served):
    the prior generation (doc_id % 3 == 0) is clustered from scratch
    ONCE by the snapshot job — this query now READS that artifact
    (`read_clusters` + the standing band table, `_artifact_snapshot`)
    instead of rebuilding it, so the registered plan is the production
    plan: only the DROP is banded in-query, the prior corpus is never
    re-read or re-banded.  The drop's pairs (drop-drop via the drop's
    own bands, drop-prior via one equi-join against the standing band
    artifact) fold in via `incremental_components`, which relabels
    only affected components with the prior label table never
    shuffling.  The oracle is the FROM-SCRATCH recursive-CTE closure
    over ALL pairs — row-identical output is the whole correctness
    claim of the generational path."""
    from scespet_spark.operators.dedup import (banded_signatures,
                                               incremental_components)
    from scespet_spark.operators.snapshot import (read_clusters,
                                                  read_snapshot)
    from scespet_spark.operators._cache import persist as _persist
    snap = _artifact_snapshot(spark, sf_dir)
    prior_labels = read_clusters(spark, snap)
    standing = read_snapshot(spark, snap)["bands"]
    drop = (load_table(spark, sf_dir, "documents")
            .filter(F.col("doc_id") % 3 != 0))
    drop_bands = _persist(banded_signatures(drop), "dedup")
    new_pairs = (drop_bands
                 .select("band", "band_hash", F.col("doc_id").alias("__a"))
                 .join(standing.unionByName(drop_bands)
                       .select("band", "band_hash",
                               F.col("doc_id").alias("__b")),
                       ["band", "band_hash"])
                 .filter(F.col("__a") != F.col("__b"))
                 .select(F.least("__a", "__b").alias("id_a"),
                         F.greatest("__a", "__b").alias("id_b"))
                 .distinct())
    return incremental_components(prior_labels, new_pairs)


_SNAP_CACHE: dict[str, str] = {}
_FULL_CLUSTER_SNAP: dict[str, str] = {}


def _full_cluster_snapshot(spark, sf_dir):
    """The production snapshot job's FULL-CORPUS near-dup cluster
    labels (``write_snapshot(cluster_labels=True)`` over the whole
    documents table, ``doc_families=()`` — the one artifact this
    family reads), built once per process into a temp dir and served
    by `read_clusters`.  Contrast `_artifact_snapshot`, which is the
    PRIOR-generation (doc_id % 3 == 0) snapshot the incremental
    queries probe against; the cluster-aware split is defined over the
    whole current corpus, so it reads this one."""
    snap = _FULL_CLUSTER_SNAP.get(sf_dir)
    if snap is not None:
        return snap
    import tempfile
    from scespet_spark.operators.snapshot import write_snapshot
    snap = tempfile.mkdtemp(prefix="scespet_entry_clsnap_") + "/snap"
    docs = load_table(spark, sf_dir, "documents")
    write_snapshot(snap, docs=docs, cluster_labels=True,
                   doc_families=())
    _FULL_CLUSTER_SNAP[sf_dir] = snap
    return snap


def _artifact_snapshot(spark, sf_dir):
    """The production snapshot job's output for ``sf_dir``'s prior
    generation (doc_id % 3 == 0): band table, resolved cluster labels,
    and the generational-IDF doc-frequency pair — built ONCE per
    process into a temp dir (mkdtemp, so a fresh process never reads a
    stale corpus) and reused by every artifact-serving live query.
    This makes the registered plans the PRODUCTION plans: the serving
    queries scan snapshot parquet, they never rebuild CC or banding
    in-query."""
    snap = _SNAP_CACHE.get(sf_dir)
    if snap is not None:
        return snap
    import tempfile
    from scespet_spark.operators.snapshot import write_snapshot
    snap = tempfile.mkdtemp(prefix="scespet_entry_snap_") + "/snap"
    prior = (load_table(spark, sf_dir, "documents")
             .filter(F.col("doc_id") % 3 == 0))
    # r12 optimization: the serving queries read exactly four
    # artifacts — the band table (+ its Bloom pre-filter), the resolved
    # cluster labels, and the doc_freq pair — so build exactly those
    # (doc_families=("bands",) + bloom_fpp); the digest/segment/gram
    # probe tables and the bigram LM were dead weight in every run of
    # this job (guide §1.2: don't compute things you throw away)
    write_snapshot(snap, docs=prior, cluster_labels=True, doc_freq=True,
                   doc_families=("bands",), bloom_fpp=0.01)
    _SNAP_CACHE[sf_dir] = snap
    return snap


@query("live_cluster_route", f"""
WITH RECURSIVE {_minhash_ctes()},
pb AS (SELECT * FROM banded WHERE doc_id % 3 = 0),
nb AS (SELECT * FROM banded WHERE doc_id % 3 <> 0),
edges AS (SELECT DISTINCT a.doc_id AS src, b.doc_id AS dst
          FROM pb a JOIN pb b USING (band, band_hash)
          WHERE a.doc_id <> b.doc_id),
cc(id, label) AS (
  SELECT DISTINCT src AS id, src AS label FROM edges
  UNION
  SELECT e.src AS id, c.label
  FROM edges e JOIN cc c ON e.dst = c.id
  WHERE c.label < e.src),
labels AS (SELECT id, MIN(label) AS cluster FROM cc GROUP BY id),
plabels AS (SELECT d.doc_id AS pid, coalesce(l.cluster, d.doc_id) AS cl
            FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
            WHERE d.doc_id % 3 = 0),
cand AS (SELECT nb.doc_id, p.cl AS cluster
         FROM nb JOIN pb USING (band, band_hash)
                 JOIN plabels p ON p.pid = pb.doc_id
         UNION ALL
         SELECT a.doc_id, b.doc_id AS cluster
         FROM nb a JOIN nb b USING (band, band_hash))
SELECT doc_id, MIN(cluster) AS cluster
FROM cand GROUP BY doc_id
""")
def live_cluster_route(spark, sf_dir):
    """Cluster ROUTING on a live crawl (r11; r12: artifact-served +
    in-drop novel-pair election): each arriving doc is assigned to its
    near-dup cluster — the min over (a) prior-cluster labels of its
    LSH band neighbors in the snapshot and (b) doc_ids of drop-mates
    sharing a band (self included), so two novel near-dups arriving in
    one drop elect a COMMON label that agrees with the next offline
    `incremental_components` merge (min-id algebra, same within-cycle
    atomicity the keyed rendezvous family takes from
    SlicedBucket.scala:33-83).

    Plan: map-only staged banding on the stream; ONE stream-static
    equi-join against the snapshot's band+label artifacts
    (`write_snapshot(cluster_labels=True)` / `read_clusters` — the
    registered plan scans the production parquet, nothing rebuilds
    in-query); ONE stream-stream self-join on the band bucket for the
    in-drop mates (state ∝ band rows seen, the standing-index cost any
    online LSH server carries — refolding the snapshot and restarting
    the route bounds it operationally); then the per-doc min via the
    `first_wins` election.  Cross-drop semantics: a later drop's doc
    also sees EARLIER drops' band rows in the join state — consistent
    with the eventual offline merge whenever smaller doc_ids arrive no
    later (crawl ids are monotone), and single-drop corpora are exact
    regardless."""
    from scespet_spark.operators.snapshot import (read_clusters,
                                                  read_snapshot)
    from scespet_spark.streaming.live import (cluster_route,
                                              read_table_stream,
                                              run_available_now)
    snap = _artifact_snapshot(spark, sf_dir)
    stream = read_table_stream(spark, sf_dir, "documents") \
        .filter(F.col("doc_id") % 3 != 0)
    out = cluster_route(stream, read_snapshot(spark, snap)["bands"],
                        read_clusters(spark, snap))
    return (run_available_now(out, "append")
            .select("doc_id", "cluster").orderBy("doc_id"))


@query("dedup_kept_corpus", f"""
WITH RECURSIVE {{ctes}},
exact_reps AS (SELECT MIN(doc_id) AS doc_id
               FROM documents
               GROUP BY ('0x' || substr(md5(text), 1, 15))::BIGINT),
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
cc(id, label) AS (
  SELECT DISTINCT src AS id, src AS label FROM edges
  UNION
  SELECT e.src AS id, c.label
  FROM edges e JOIN cc c ON e.dst = c.id
  WHERE c.label < e.src),
near_dups AS (SELECT id AS doc_id FROM (
                SELECT id, MIN(label) AS cluster FROM cc GROUP BY id)
              WHERE cluster <> id)
SELECT d.doc_id, d.source, d.n_chars
FROM documents d
JOIN exact_reps USING (doc_id)
WHERE d.doc_id NOT IN (SELECT doc_id FROM near_dups)
""".format(ctes=_minhash_ctes()))
def dedup_kept_corpus(spark, sf_dir):
    """The composed dedup decision a pipeline actually ships: exact-hash
    representatives MINUS non-representative members of LSH near-dup
    clusters.  Exercises exact_groups + lsh_candidate_pairs +
    connected_components end-to-end under one oracle (recursive-CTE
    closure), returning the kept corpus's metadata (text pruned)."""
    from scespet_spark.operators.dedup import (connected_components,
                                               exact_groups,
                                               lsh_candidate_pairs)
    docs = load_table(spark, sf_dir, "documents")
    reps = exact_groups(docs).select(F.col("rep_id").alias("doc_id"))
    kept = docs.join(reps, "doc_id", "left_semi")
    clusters = connected_components(lsh_candidate_pairs(docs))
    dupes = (clusters.filter(F.col("id") != F.col("cluster"))
             .select(F.col("id").alias("doc_id")))
    return (kept.join(dupes, "doc_id", "left_anti")
            .select("doc_id", "source", "n_chars"))


def _simhash_oracle(bits=32):
    sums = ",\n       ".join(
        f"SUM(CASE WHEN (h & {1 << j}) != 0 THEN 1 ELSE -1 END) AS b{j}"
        for j in range(bits))
    sig = " + ".join(f"(CASE WHEN b{j} > 0 THEN {1 << j} ELSE 0 END)"
                     for j in range(bits))
    # LEFT JOIN + COALESCE: token-less docs (which unnest drops) keep a
    # row with simhash 0, mirroring the engine's explode_outer
    return f"""
WITH tok AS (SELECT doc_id, unnest({_TOKS}) AS tk FROM documents),
th AS (SELECT doc_id, {h64_sql('tk')} AS h FROM tok),
b AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id),
s AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM b)
SELECT d.doc_id, COALESCE(s.simhash, 0) AS simhash
FROM documents d LEFT JOIN s USING (doc_id)
"""


@query("dedup_simhash", _simhash_oracle())
def dedup_simhash(spark, sf_dir):
    from scespet_spark.operators.dedup import simhash
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return simhash(docs).select("doc_id", "simhash")


@query("dedup_ngram_jaccard", f"""
WITH {{ctes}}
SELECT id_a, id_b, jaccard FROM (
  SELECT p.id_a, p.id_b,
         round(len(list_intersect(a.s, b.s))::DOUBLE
               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
           AS jaccard
  FROM pairs p
  JOIN sh a ON a.doc_id = p.id_a
  JOIN sh b ON b.doc_id = p.id_b)
WHERE jaccard >= 0.5
""".format(ctes=_minhash_ctes()))
def dedup_ngram_jaccard(spark, sf_dir):
    """Exact Jaccard verification of the LSH *candidate* pairs — the
    scale-safe shape: pair count is linear in near-dup density, never the
    O(n^2/blocks) of a blocked all-pairs self-join."""
    from scespet_spark.operators.dedup import (lsh_candidate_pairs,
                                               ngram_jaccard_pairs)
    docs = load_table(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, candidates=lsh_candidate_pairs(docs),
                               threshold=0.5)


_DOT = ("list_reduce(list_transform(generate_series(1, len({a})), "
        "i -> {a}[i] * {b}[i]), (x, y) -> x + y)")
_NORM = "sqrt(list_reduce(list_transform({a}, x -> x * x), (x, y) -> x + y))"


def _cosine_sql(a, b):
    return (f"({_DOT.format(a=a, b=b)}"
            f" / ({_NORM.format(a=a)} * {_NORM.format(a=b)}))")


def _sign_lsh_sql(v: str, dim: int = 64, bits: int = 6) -> str:
    """DuckDB replica of similarity.sign_lsh_code (same affine hyperplane
    parity, same sequential left-fold)."""
    from scespet_spark.operators.dedup import mh_coeffs
    terms = []
    for i in range(bits):
        a, b = mh_coeffs(i)
        dot = (f"list_reduce(list_transform(generate_series(1, {dim}), "
               f"d -> {v}[d] * (CASE WHEN ((d*{a}+{b}) % 2147483647) % 2 = 0 "
               f"THEN -1.0 ELSE 1.0 END)), (x, y) -> x + y)")
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << i} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


@query("dedup_embedding_cosine", f"""
WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id, v, {_sign_lsh_sql('v')} AS blk FROM n)
SELECT id_a, id_b, cosine FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_cosine_sql('a.v', 'b.v')}, 6) AS cosine
  FROM c a JOIN c b ON a.blk = b.blk AND a.vec_id < b.vec_id)
WHERE cosine >= 0.35
""")
def dedup_embedding_cosine(spark, sf_dir):
    """Cosine near-dup pairs blocked by a sign-random-projection LSH
    coarse code (cardinality 2^bits, chosen to match corpus size) — the
    scale-safe replacement for blocking on a fixed-cardinality column."""
    from scespet_spark.operators.dedup import embedding_near_dup_pairs
    from scespet_spark.operators.similarity import sign_lsh_code
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_dup_pairs(
        emb, block_code=sign_lsh_code(F.col("embedding"), dim=64, bits=6),
        threshold=0.35)


@query("dedup_embedding_incremental", f"""
WITH cut AS (SELECT MAX(vec_id) // 2 AS c FROM embeddings),
n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
b AS (SELECT vec_id, v, {_sign_lsh_sql('v')} AS blk FROM n),
hits AS (
  SELECT nw.vec_id, pr.vec_id AS prior_id,
         round({_cosine_sql('nw.v', 'pr.v')}, 6) AS cosine
  FROM b pr JOIN b nw ON pr.blk = nw.blk, cut
  WHERE pr.vec_id <= cut.c AND nw.vec_id > cut.c)
SELECT vec_id, prior_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                               ORDER BY cosine DESC, prior_id) AS rn
  FROM hits WHERE cosine >= 0.35) WHERE rn = 1
""")
def dedup_embedding_incremental(spark, sf_dir):
    """Incremental embedding near-dup — the cosine counterpart of the
    LSH band-table probe (completes the incremental family: text exact,
    text near, ANN index, embedding near).  The prior snapshot persists
    its sign-LSH block table (`embedding_block_table`); a new embedding
    batch probes it with a block-key equi-join and verifies cosine only
    on in-block candidates — never all-pairs, never re-coding the
    corpus.  Returns each new vector's best prior hit."""
    from scespet_spark.operators.dedup import (embedding_block_table,
                                               incremental_embedding_near_dup)
    emb = load_table(spark, sf_dir, "embeddings")
    cut = emb.agg(F.max("vec_id")).collect()[0][0] // 2
    prior = embedding_block_table(emb.filter(F.col("vec_id") <= cut))
    new = emb.filter(F.col("vec_id") > cut)
    return incremental_embedding_near_dup(new, prior, threshold=0.35)


@query("ann_brute_force_topk", f"""
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id, round({_cosine_sql('v', 'qv')}, 6) AS score
FROM n, q ORDER BY score DESC, vec_id LIMIT 20
""")
def ann_brute_force_topk(spark, sf_dir):
    from scespet_spark.operators.similarity import brute_force_topk
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return brute_force_topk(emb, qvec, k=20)


@query("dedup_semantic", f"""
WITH cent AS (
  SELECT label, list(m ORDER BY i) AS centroid FROM (
    SELECT label, i, AVG(embedding[i]::DOUBLE) AS m
    FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    GROUP BY label, i) GROUP BY label),
n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, cent.label AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY n.vec_id
             ORDER BY round({_cosine_sql('n.v', 'cent.centroid')}, 6) DESC,
                      cent.label) AS rn
    FROM n CROSS JOIN cent) WHERE rn = 1),
m AS (SELECT n.vec_id, assign.cell, n.v FROM n JOIN assign USING (vec_id))
SELECT a.vec_id, a.cell, COUNT(*) AS n_close
FROM m a JOIN m b ON a.cell = b.cell AND a.vec_id > b.vec_id
WHERE round({_cosine_sql('a.v', 'b.v')}, 6) >= 0.35
GROUP BY a.vec_id, a.cell
""")
def dedup_semantic(spark, sf_dir):
    """SemDeDup: k-means-cell-blocked semantic duplicates — items with
    a lower-id cell-mate at cosine >= 0.35 (paraphrases/re-renders that
    share no n-grams).  Cell equi-join bounds the pair check to
    (N/K)^2 per cell; assignment is the map-only ivf_assign against
    the centroid artifact."""
    from scespet_spark.operators.similarity import semantic_dedup
    return semantic_dedup(load_table(spark, sf_dir, "embeddings"),
                          threshold=0.35)


@query("ann_ivf_topk", f"""
WITH cent AS (
  SELECT label, list(m ORDER BY i) AS centroid FROM (
    SELECT label, i, AVG(embedding[i]::DOUBLE) AS m
    FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    GROUP BY label, i) GROUP BY label),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
probe AS (SELECT label FROM cent, q
          ORDER BY round({_cosine_sql('centroid', 'qv')}, 6) DESC, label
          LIMIT 2),
n AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id, round({_cosine_sql('v', 'qv')}, 6) AS score
FROM n JOIN probe USING (label), q
ORDER BY score DESC, vec_id LIMIT 20
""")
def ann_ivf_topk(spark, sf_dir):
    from scespet_spark.operators.similarity import ivf_topk
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivf_topk(emb, qvec, k=20, nprobe=2)


@query("cluster_balance_sample", f"""
WITH cent AS (
  SELECT label, list(m ORDER BY i) AS centroid FROM (
    SELECT label, i, AVG(embedding[i]::DOUBLE) AS m
    FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    GROUP BY label, i) GROUP BY label),
n AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
assign AS (
  SELECT vec_id, label, cell FROM (
    SELECT n.vec_id, n.label, cent.label AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY n.vec_id
             ORDER BY round({_cosine_sql('n.v', 'cent.centroid')}, 6) DESC,
                      cent.label) AS rn
    FROM n CROSS JOIN cent) WHERE rn = 1),
cnt AS (SELECT cell, COUNT(*) AS c FROM assign GROUP BY cell),
cut AS (SELECT cell,
               floor(least(1.0, 0.1 * 200.0 / c) * {1 << 20}) AS k
        FROM cnt)
SELECT a.vec_id, a.label, a.cell
FROM assign a JOIN cut USING (cell)
WHERE ({h64_sql('a.vec_id::VARCHAR', seed=11)}) % {1 << 20} < cut.k
""")
def cluster_balance_sample(spark, sf_dir):
    """Embedding-cluster-balanced resampling (topic rebalancing): every
    vector assigns to its embedding-space cluster (map-only argmax vs
    the centroid artifact — zero Exchange, the ivf_assign plan), then
    the corpus resamples toward a UNIFORM 10-way cluster recipe of 200
    vectors — over-represented clusters downsample, scarce ones cap at
    keep-all.  Broadcast #clusters-row cutoffs + deterministic hash
    filter: one pass, reproducible across runs/engines/partitionings,
    the corpus never shuffles."""
    from scespet_spark.operators.similarity import cluster_mixture_sample
    emb = load_table(spark, sf_dir, "embeddings")
    out = cluster_mixture_sample(emb, {c: 0.1 for c in range(10)}, 200)
    return out.select("vec_id", "label", "cell")


@query("embedding_drift_drop", f"""
WITH cut AS (SELECT MAX(vec_id) // 2 AS c FROM embeddings),
cent AS (
  SELECT label, list(m ORDER BY i) AS centroid FROM (
    SELECT label, i, AVG(embedding[i]::DOUBLE) AS m
    FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i),
         cut
    WHERE vec_id <= cut.c
    GROUP BY label, i) GROUP BY label),
n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, cent.label AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY n.vec_id
             ORDER BY round({_cosine_sql('n.v', 'cent.centroid')}, 6) DESC,
                      cent.label) AS rn
    FROM n CROSS JOIN cent) WHERE rn = 1),
pa AS (SELECT cell, COUNT(*) AS np FROM assign, cut
       WHERE vec_id <= cut.c GROUP BY cell),
na AS (SELECT cell, COUNT(*) AS nn FROM assign, cut
       WHERE vec_id > cut.c GROUP BY cell),
j AS (SELECT cell, coalesce(np, 0) AS np, coalesce(nn, 0) AS nn
      FROM pa FULL OUTER JOIN na USING (cell)),
t AS (SELECT SUM(np) AS tp, SUM(nn) AS tn FROM j)
SELECT cell, round(np / (tp + 0.0), 6) AS prior_frac,
       round(nn / (tn + 0.0), 6) AS new_frac,
       round(nn / (tn + 0.0) - np / (tp + 0.0), 6) AS delta
FROM j, t ORDER BY cell
""")
def embedding_drift_drop(spark, sf_dir):
    """Embedding-space drift (r10): the coarse-cell occupancy
    distribution of a new embedding batch (assigned to the prior
    snapshot's FIXED centroids — the incremental-IVF contract) vs the
    prior corpus's codes table — the modality sibling of
    vocab_drift_drop: a topic shift, a new content farm, or an encoder
    regression moves cell occupancy before any downstream metric.
    Map-only broadcast-centroid assignment, two model-sized count
    tables, one outer join."""
    from scespet_spark.operators.similarity import (embedding_drift,
                                                    ivf_assign,
                                                    label_centroids)
    emb = load_table(spark, sf_dir, "embeddings")
    cut = emb.agg(F.max("vec_id")).collect()[0][0] // 2
    prior = emb.filter(F.col("vec_id") <= cut)
    cents = label_centroids(prior)            # snapshot model artifact
    prior_codes = ivf_assign(prior, cents)    # snapshot codes artifact
    return embedding_drift(emb.filter(F.col("vec_id") > cut), cents,
                           prior_codes)


@query("embedding_pca_project", """
SELECT vec_id, 64 AS proj_dim, TRUE AS parseval_ok, TRUE AS contract_ok
FROM embeddings ORDER BY vec_id
""")
def embedding_pca_project(spark, sf_dir):
    """Distributed PCA over the embedding corpus (r10): fit = one
    map-side-combined pass producing per-partition (n, sum, outer-sum)
    partials (d^2 doubles each, ~#partitions rows to the driver — never
    O(rows)), eigh on the 64x64 covariance driver-side; project =
    broadcast the tiny component matrix into one Arrow-vectorized
    mapInPandas matmul (map-only, append-legal).  The 100 TB pattern:
    reduce dims BEFORE IVF-PQ indexing / semantic dedup.

    INVARIANT oracle (eigenvectors aren't SQL-expressible; the exact
    linear algebra is pinned against numpy in tests/test_similarity
    _pca): per vector, derived from the REAL projections —
    ``parseval_ok`` (the full-rank k=d rotation preserves the centered
    L2 norm to 1e-6 relative) and ``contract_ok`` (the lossy k=16
    projection can only shrink it).  DuckDB predicts both plus the
    projection arity from the source table alone."""
    from scespet_spark.operators.similarity import pca_fit, pca_project
    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb)
    mean = next(r["w"] for r in model.collect() if r["idx"] == -1)
    full = pca_project(emb, model, out="pca64")
    both = pca_project(full, model, k=16, out="pca16")
    v = F.col("embedding").cast("array<double>")
    sq = lambda c: F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)
    cn2 = F.aggregate(
        F.zip_with(v, F.array(*[F.lit(float(m)) for m in mean]),
                   lambda x, m: (x - m) * (x - m)),
        F.lit(0.0), lambda a, x: a + x)
    pn64, pn16 = sq(F.col("pca64")), sq(F.col("pca16"))
    return (both.select(
        "vec_id", F.size("pca64").alias("proj_dim"),
        (F.abs(pn64 - cn2) <= F.lit(1e-6) * F.greatest(cn2, F.lit(1.0)))
        .alias("parseval_ok"),
        (pn16 <= cn2 * F.lit(1.0 + 1e-9) + F.lit(1e-9))
        .alias("contract_ok"))
        .orderBy("vec_id"))


@query("live_pca_project", """
SELECT vec_id, 64 AS proj_dim, TRUE AS parseval_ok, TRUE AS contract_ok
FROM embeddings ORDER BY vec_id
""")
def live_pca_project(spark, sf_dir):
    """PCA projection on a LIVE embedding stream: the model is fitted
    ONCE batch-side (a stream cannot see its own covariance — the same
    train-once-per-snapshot contract as the tokenizers/classifiers)
    and broadcasts into a stateless Arrow matmul per micro-batch —
    map-only, append mode, zero state.  The reduce-dims-before-index
    step running at ingest.  Same invariant oracle as the batch form,
    computed inside the streaming plan."""
    from scespet_spark.operators.similarity import pca_fit, pca_project
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb)                       # snapshot model artifact
    mean = next(r["w"] for r in model.collect() if r["idx"] == -1)
    stream = read_table_stream(spark, sf_dir, "embeddings")
    both = pca_project(pca_project(stream, model, out="pca64"),
                       model, k=16, out="pca16")
    v = F.col("embedding").cast("array<double>")
    sq = lambda c: F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x)
    cn2 = F.aggregate(
        F.zip_with(v, F.array(*[F.lit(float(m)) for m in mean]),
                   lambda x, m: (x - m) * (x - m)),
        F.lit(0.0), lambda a, x: a + x)
    out = both.select(
        "vec_id", F.size("pca64").alias("proj_dim"),
        (F.abs(sq(F.col("pca64")) - cn2)
         <= F.lit(1e-6) * F.greatest(cn2, F.lit(1.0)))
        .alias("parseval_ok"),
        (sq(F.col("pca16")) <= cn2 * F.lit(1.0 + 1e-9) + F.lit(1e-9))
        .alias("contract_ok"))
    return run_available_now(out, "append").orderBy("vec_id")


def _zorder_oracle(cols=("l_extendedprice", "l_quantity"), bits=8):
    top = (1 << bits) - 1
    stats = ", ".join(
        f"MIN(CASE WHEN isfinite({c}::DOUBLE) THEN {c}::DOUBLE END) "
        f"AS mn_{i}, "
        f"MAX(CASE WHEN isfinite({c}::DOUBLE) THEN {c}::DOUBLE END) "
        f"AS mx_{i}"
        for i, c in enumerate(cols))
    ranks = ", ".join(
        f"CAST(CASE WHEN isfinite({c}::DOUBLE) AND mx_{i} > mn_{i} "
        f"THEN floor(({c}::DOUBLE - mn_{i}) / (mx_{i} - mn_{i}) "
        f"* {top}.0 + 0.5) ELSE 0 END AS BIGINT) AS r_{i}"
        for i, c in enumerate(cols))
    n = len(cols)
    terms = []
    for b in range(bits - 1, -1, -1):
        for i in range(n):
            pos = bits * n - 1 - ((bits - 1 - b) * n + i)
            # fully parenthesized: SQL's << binds LOOSER than +, so an
            # unwrapped "a << p1 + b << p2" chain nests the shifts
            terms.append(f"(((r_{i} >> {b}) & 1) << {pos})")
    return f"""
WITH st AS (SELECT {stats} FROM lineitem),
rk AS (SELECT l_orderkey, l_linenumber, {ranks} FROM lineitem, st)
SELECT l_orderkey, l_linenumber,
       CAST({" + ".join(terms)} AS BIGINT) AS zkey
FROM rk ORDER BY l_orderkey, l_linenumber
"""


@query("zorder_key_lineitem", _zorder_oracle())
def zorder_key_lineitem(spark, sf_dir):
    """Z-order (Morton) clustering key over (price, quantity) — the
    lakehouse multi-column data-skipping layout (Delta/Iceberg
    OPTIMIZE ZORDER BY) as plain codegen bit arithmetic: one tiny
    min/max broadcast attach + a map-only interleave, bit-exact in
    both engines.  ``zorder_layout`` composes it with ONE
    range-partition shuffle for the write; per-file min/max footers
    then prune selective scans on EITHER column (measured A/B in
    SCALE.md)."""
    from scespet_spark.operators.layout import zorder_key
    li = load_table(spark, sf_dir, "lineitem")
    return (zorder_key(li, ["l_extendedprice", "l_quantity"], bits=8)
            .select("l_orderkey", "l_linenumber", "zkey")
            .orderBy("l_orderkey", "l_linenumber"))


@query("key_skew_sources", """
WITH c AS (SELECT source, COUNT(*) AS n_rows FROM documents GROUP BY source),
t AS (SELECT SUM(n_rows) AS total, COUNT(*) AS n_keys FROM c),
top AS (SELECT source, n_rows FROM c
       ORDER BY n_rows DESC, source NULLS LAST LIMIT 20)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_rows DESC, source NULLS LAST)
            AS INTEGER) AS rank,
       source, n_rows, n_keys,
       round(n_rows / (total + 0.0), 6) AS share,
       round(SUM(n_rows / (total + 0.0)) OVER (
             ORDER BY n_rows DESC, source NULLS LAST
             ROWS UNBOUNDED PRECEDING), 6)
         AS cum_share,
       round(n_rows / (total + 0.0) * n_keys, 6) AS skew_ratio
FROM top, t ORDER BY rank
""")
def key_skew_sources(spark, sf_dir):
    """Key-skew diagnostics (r10): the top-20 heaviest ``source`` keys
    with share, cumulative share, and skew ratio (count / mean rows per
    key) — the report you run before choosing a partition/salt strategy
    for a 100 TB join or agg.  One combinable groupBy(count) is the
    only corpus shuffle; totals are a 1-row broadcast attach; the rank
    window runs over the 20-row result only."""
    from scespet_spark.operators.pipeline import key_skew_report
    docs = load_table(spark, sf_dir, "documents")
    return key_skew_report(docs, ["source"], top_n=20)


@query("ann_ivf_incremental_topk", f"""
WITH cut AS (SELECT MAX(vec_id) // 2 AS c FROM embeddings),
cent AS (
  SELECT label, list(m ORDER BY i) AS centroid FROM (
    SELECT label, i, AVG(embedding[i]::DOUBLE) AS m
    FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i),
         cut
    WHERE vec_id <= cut.c
    GROUP BY label, i) GROUP BY label),
n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, cent.label AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY n.vec_id
             ORDER BY round({_cosine_sql('n.v', 'cent.centroid')}, 6) DESC,
                      cent.label) AS rn
    FROM n CROSS JOIN cent) WHERE rn = 1),
q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
probe AS (SELECT label AS cell FROM cent, q
          ORDER BY round({_cosine_sql('centroid', 'qv')}, 6) DESC, label
          LIMIT 2)
SELECT vec_id, round({_cosine_sql('v', 'qv')}, 6) AS score
FROM n JOIN assign USING (vec_id) JOIN probe USING (cell), q
ORDER BY score DESC, vec_id LIMIT 20
""")
def ann_ivf_incremental_topk(spark, sf_dir):
    """Incremental IVF index maintenance — the ANN counterpart of the
    incremental dedup family: the coarse centroids are trained ONCE on
    the first snapshot (the model artifact), a later ingest batch is
    assigned to the EXISTING cells with `ivf_assign` (broadcast
    centroids, map-side argmax — no retraining, no corpus reshuffle),
    and serving reads the merged codes table with
    `ivf_topk_from_index` (probe nprobe cells -> exact-score members).
    The oracle replays the same split/assign/probe in SQL."""
    from scespet_spark.operators.similarity import (ivf_assign,
                                                    ivf_topk_from_index,
                                                    label_centroids)
    emb = load_table(spark, sf_dir, "embeddings")
    cut = emb.agg(F.max("vec_id")).collect()[0][0] // 2
    snap1 = emb.filter(F.col("vec_id") <= cut)
    snap2 = emb.filter(F.col("vec_id") > cut)
    cents = label_centroids(snap1)           # snapshot model artifact
    codes = ivf_assign(snap1, cents).unionByName(ivf_assign(snap2, cents))
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivf_topk_from_index(emb, codes, cents, qvec, k=20, nprobe=2)


@query("live_ann_serving", f"""
WITH cent AS (
  SELECT label, list(m ORDER BY i) AS centroid FROM (
    SELECT label, i, AVG(embedding[i]::DOUBLE) AS m
    FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    GROUP BY label, i) GROUP BY label),
n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, cent.label AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY n.vec_id
             ORDER BY round({_cosine_sql('n.v', 'cent.centroid')}, 6) DESC,
                      cent.label) AS rn
    FROM n CROSS JOIN cent) WHERE rn = 1),
q AS (SELECT vec_id AS q_id, v AS qv FROM n WHERE vec_id < 3),
probe AS (
  SELECT q_id, cell FROM (
    SELECT q.q_id, cent.label AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY q.q_id
             ORDER BY round({_cosine_sql('cent.centroid', 'q.qv')}, 6) DESC,
                      cent.label) AS rn
    FROM q CROSS JOIN cent) WHERE rn <= 2),
cand AS (
  SELECT q.q_id, n.vec_id,
         round({_cosine_sql('n.v', 'q.qv')}, 6) AS score
  FROM q JOIN probe USING (q_id)
         JOIN assign ON assign.cell = probe.cell
         JOIN n ON n.vec_id = assign.vec_id)
SELECT q_id, vec_id, score, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY score DESC, vec_id) AS rnk
  FROM cand) WHERE rnk <= 5
""")
def live_ann_serving(spark, sf_dir):
    """ANN serving over a LIVE query stream against the static IVF
    index (ann_topk_stream): per-micro-batch probe via the driver-held
    centroid matrix, stream-static equi-join to the probed cells'
    members, exact per-query top-k.  The oracle replays the same
    assign/probe/rank in SQL for queries = vec_id < 3."""
    from scespet_spark.operators.similarity import (ann_topk_stream,
                                                    ivf_assign,
                                                    label_centroids)
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    emb = load_table(spark, sf_dir, "embeddings")
    # snapshot artifacts: materialized once (persist = the local stand-in
    # for the parquet index tables a snapshot job writes), so the
    # stream-static join reads them instead of re-deriving per batch
    from scespet_spark.operators._cache import persist as _persist_
    cents = _persist_(label_centroids(emb), "similarity")
    codes = _persist_(ivf_assign(emb, cents), "similarity")
    qs = (read_table_stream(spark, sf_dir, "embeddings")
          .filter(F.col("vec_id") < 3)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_vec")))
    out = ann_topk_stream(qs, emb, cents, codes, k=5, nprobe=2)
    return run_available_now(out, "append").select(
        "q_id", "vec_id", "score", "rnk")


@query("ann_batch_topk", f"""
WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, v AS q_vec FROM n ORDER BY vec_id LIMIT 3),
scored AS (
  SELECT q.q_id, n.vec_id,
         round({_cosine_sql('n.v', 'q.q_vec')}, 6) AS score
  FROM n CROSS JOIN q)
SELECT q_id, vec_id, score, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY score DESC, vec_id) AS rnk
  FROM scored) WHERE rnk <= 5
""")
def ann_batch_topk(spark, sf_dir):
    """Top-k for a query *table* — broadcast Q queries against the
    corpus: one corpus scan total, only Q x k rows shuffle."""
    from scespet_spark.operators.similarity import batch_topk
    emb = load_table(spark, sf_dir, "embeddings")
    q = (emb.orderBy("vec_id").limit(3)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").cast("array<double>").alias("q_vec")))
    out = batch_topk(emb, q, k=5)
    return out.select("q_id", "vec_id", "score",
                      F.col("rnk").cast("long").alias("rnk"))


@query("ann_hard_negatives", f"""
WITH n AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS q_id, label AS q_label, v AS q_vec
      FROM n ORDER BY vec_id LIMIT 3),
scored AS (
  SELECT q.q_id, n.vec_id, n.label,
         round({_cosine_sql('n.v', 'q.q_vec')}, 6) AS score
  FROM n JOIN q ON n.label <> q.q_label)
SELECT q_id, vec_id, label, score, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id
                               ORDER BY score DESC, vec_id) AS rnk
  FROM scored) WHERE rnk <= 5
""")
def ann_hard_negatives(spark, sf_dir):
    """Hard-negative mining (contrastive-training data op): per anchor,
    the top-k most-similar vectors with a DIFFERENT label.  Broadcast
    anchors, one corpus scan, label mismatch filtered map-side on the
    broadcast join — only Q x k rows shuffle."""
    from scespet_spark.operators.similarity import hard_negatives
    emb = load_table(spark, sf_dir, "embeddings")
    q = (emb.orderBy("vec_id").limit(3)
         .select(F.col("vec_id").alias("q_id"),
                 F.col("label").alias("q_label"),
                 F.col("embedding").cast("array<double>").alias("q_vec")))
    out = hard_negatives(emb, q, k=5)
    return out.select("q_id", "vec_id", "label", "score",
                      F.col("rnk").cast("long").alias("rnk"))


def _kmeans_oracle_sql(k: int = 8, iters: int = 3) -> str:
    """Lloyd's k-means unrolled into chained CTE stages (the iteration
    count is a fixed hyper-parameter, so the 'iterative' algorithm is a
    finite SQL pipeline).  Distance is list-order-sequential float64
    accumulation — the same left-fold the Spark ``_sqdist`` UDF pins —
    and assignment tie-breaks on (distance, code), so integer codes are
    reproducible even though per-dim AVG float order may differ."""
    dist = ("list_sum(list_transform(list_zip({P}.p, {C}.c), "
            "z -> (z[1] - z[2]) * (z[1] - z[2])))")

    def assign(p, c):
        return (
            "SELECT id, p, code FROM ("
            "SELECT id, p, code, ROW_NUMBER() OVER "
            "(PARTITION BY id ORDER BY d, code) AS rn FROM ("
            f"SELECT {p}.id, {p}.p, {c}.code, "
            + dist.format(P=p, C=c) + " AS d "
            f"FROM {p}, {c})) WHERE rn = 1")

    def update(a):
        return (
            "SELECT code, LIST(m ORDER BY pos) AS c FROM ("
            "SELECT code, pos, AVG(x) AS m FROM ("
            "SELECT code, UNNEST(p) AS x, "
            f"UNNEST(range(1, len(p) + 1)) AS pos FROM {a}) "
            "GROUP BY code, pos) GROUP BY code")

    ctes = [
        ("pts AS (SELECT vec_id AS id, embedding::DOUBLE[] AS p "
         "FROM embeddings WHERE embedding IS NOT NULL)"),
        ("c0 AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY id) - 1 AS BIGINT)"
         " AS code, p AS c FROM "
         f"(SELECT id, p FROM pts ORDER BY id LIMIT {k}))"),
    ]
    for i in range(iters):
        ctes.append(f"a{i} AS ({assign('pts', f'c{i}')})")
        ctes.append(f"c{i + 1} AS ({update(f'a{i}')})")
    ctes.append(f"af AS ({assign('pts', f'c{iters}')})")
    return ("WITH " + ",\n".join(ctes)
            + "\nSELECT id AS vec_id, code FROM af")


def _pq_ctes(m: int = 8, dsub: int = 8, ksub: int = 16,
             iters: int = 2, train_where: str | None = None) -> str:
    """Per-subspace Lloyd's unrolled as CTEs keyed on ``sub`` — the PQ
    mirror of ``_kmeans_oracle_sql`` (same seed rule, same left-fold
    distance, same (d, code) tie-break).  ``train_where`` restricts
    the TRAINING points (seeds + iteration assignments) while the
    final ``af`` assignment still covers every point — the exact
    semantics of the ``pq_index`` artifact lifecycle (codebooks fit on
    the prior generation; appended drops encode against the standing
    model, no refit)."""
    dist = ("list_sum(list_transform(list_zip({P}.p, {C}.c), "
            "z -> (z[1] - z[2]) * (z[1] - z[2])))")

    def assign(c, keep_p=True, src="subpts"):
        p_sel = ", p" if keep_p else ""
        return (
            f"SELECT id, sub{p_sel}, code FROM ("
            "SELECT *, ROW_NUMBER() OVER "
            "(PARTITION BY id, sub ORDER BY d, code) AS rn FROM ("
            f"SELECT s.id, s.sub, s.p, c.code, "
            + dist.format(P="s", C="c") + " AS d "
            f"FROM {src} s JOIN {c} c USING (sub))) WHERE rn = 1")

    tsub = "trainsub" if train_where else "subpts"
    ctes = [
        "pts AS (SELECT vec_id AS id, embedding::DOUBLE[] AS v FROM embeddings)",
        ("subpts AS (SELECT id, j AS sub, "
         f"v[j * {dsub} + 1 : (j + 1) * {dsub}] AS p "
         "FROM pts CROSS JOIN (SELECT CAST(unnest(generate_series(0, "
         f"{m - 1})) AS BIGINT) AS j))"),
    ]
    if train_where:
        ctes.append(
            f"trainsub AS (SELECT * FROM subpts WHERE {train_where})")
    ctes.append(
        ("c0 AS (SELECT sub, CAST(rn - 1 AS BIGINT) AS code, p AS c FROM ("
         "SELECT sub, p, ROW_NUMBER() OVER (PARTITION BY sub ORDER BY id)"
         f" AS rn FROM {tsub}) WHERE rn <= {ksub})"))
    for i in range(iters):
        ctes.append(f"a{i} AS ({assign(f'c{i}', src=tsub)})")
        ctes.append(
            f"c{i + 1} AS (SELECT sub, code, LIST(mv ORDER BY pos) AS c "
            "FROM (SELECT sub, code, pos, AVG(x) AS mv FROM ("
            "SELECT sub, code, UNNEST(p) AS x, "
            f"UNNEST(range(1, len(p) + 1)) AS pos FROM a{i}) "
            "GROUP BY sub, code, pos) GROUP BY sub, code)")
    ctes.append(f"af AS ({assign(f'c{iters}', keep_p=False)})")
    return ",\n".join(ctes)


def _pq_adc_oracle(k: int = 10, shortlist: int = 50, m: int = 8,
                   dsub: int = 8, train_where: str | None = None) -> str:
    sq = ("list_sum(list_transform(list_zip(q.qp, c.c), "
          "z -> (z[1] - z[2]) * (z[1] - z[2])))")
    return f"""
WITH {_pq_ctes(m=m, dsub=dsub, train_where=train_where)},
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
qsub AS (SELECT j AS sub, v[j * {dsub} + 1 : (j + 1) * {dsub}] AS qp
         FROM qv CROSS JOIN (SELECT CAST(unnest(generate_series(0, {m - 1}))
                                    AS BIGINT) AS j)),
lut AS (SELECT c.sub, c.code, CAST(round({sq} * 1000000) AS BIGINT) AS md
        FROM c2 c JOIN qsub q USING (sub)),
adc AS (SELECT a.id, CAST(SUM(l.md) AS BIGINT) AS adc_microdist
        FROM af a JOIN lut l USING (sub, code) GROUP BY a.id),
short AS (SELECT * FROM adc ORDER BY adc_microdist, id LIMIT {shortlist})
SELECT s.id AS vec_id, s.adc_microdist,
       round({_cosine_sql('p.v', 'q.v')}, 6) AS score
FROM short s JOIN pts p ON p.id = s.id CROSS JOIN qv q
ORDER BY score DESC, vec_id LIMIT {k}
"""


@query("ann_pq_codes", f"WITH {_pq_ctes()}\n"
       "SELECT id AS vec_id, sub, code FROM af")
def ann_pq_codes(spark, sf_dir):
    """Product-quantization code build: per-subspace k-means trained in
    one keyed job set; output (vec_id, sub, code) — m byte-sized codes
    per vector, the 32x-compressed representation that makes 100 TB of
    embeddings RAM-resident for ANN shortlisting."""
    from scespet_spark.operators.similarity import pq_train
    emb = load_table(spark, sf_dir, "embeddings")
    codes, _ = pq_train(emb)
    return codes


@query("ann_pq_adc_topk", _pq_adc_oracle())
def ann_pq_adc_topk(spark, sf_dir):
    """IVF-PQ-style serving: integer-microunit ADC shortlist (order-
    independent long sums — engine-exact) + exact cosine re-rank of the
    shortlist only."""
    from scespet_spark.operators.similarity import pq_adc_topk
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return pq_adc_topk(emb, qvec, k=10, shortlist=50)


_PQ_SNAP_CACHE: dict[tuple, str] = {}


def _pq_artifact_snapshot(spark, sf_dir, incremental=False):
    """The offline ANN index job's output: a snapshot written with
    ``pq_m=8`` over the embeddings table — built ONCE per process into
    a temp dir and reused by the artifact-serving ANN queries, so the
    registered plans scan index parquet instead of re-training
    in-query (the production shape).  ``incremental=True`` builds the
    codebooks on the PRIOR generation (vec_id % 4 != 3) and generation-
    appends the drop (encoded against the standing model — the
    no-refit contract)."""
    key = (sf_dir, incremental)
    snap = _PQ_SNAP_CACHE.get(key)
    if snap is not None:
        return snap
    import tempfile
    from scespet_spark.operators.snapshot import write_snapshot
    snap = tempfile.mkdtemp(prefix="scespet_entry_pq_") + "/snap"
    emb = load_table(spark, sf_dir, "embeddings")
    if incremental:
        write_snapshot(snap, emb=emb.filter(F.col("vec_id") % 4 != 3),
                       pq_m=8)
        write_snapshot(snap, emb=emb.filter(F.col("vec_id") % 4 == 3),
                       mode="append")
    else:
        # pq_by_cell: hive-partition the codes by the IVF label so the
        # ivfpq serving query's probe filter is file pruning
        write_snapshot(snap, emb=emb, pq_m=8, pq_by_cell=True)
    _PQ_SNAP_CACHE[key] = snap
    return snap


@query("ann_pq_index_topk", _pq_adc_oracle())
def ann_pq_index_topk(spark, sf_dir):
    """PQ ANN served from the ``pq_index`` snapshot artifact family
    (r12): codes/codebooks/rotation are OFFLINE artifacts
    (``write_snapshot(pq_m=8)``, built once per process —
    `_pq_artifact_snapshot`); the query is one d x d matvec +
    model-sized LUT driver-side, one combinable ADC sum over the codes
    parquet, and a shortlist-sized exact re-rank.  The registered plan
    IS the production plan — nothing re-encodes the corpus in-query
    (contrast ``ann_pq_adc_topk``, the self-contained form).  Oracle:
    cell-exact — the artifact build pins the same training contract,
    so the unrolled-CTE PQ oracle reproduces the served rows
    bit-for-bit."""
    from scespet_spark.operators.similarity import pq_index_topk
    from scespet_spark.operators.snapshot import read_pq_index
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = (emb.filter(F.col("vec_id") == 0)
            .select("embedding").collect()[0][0])
    snap = _pq_artifact_snapshot(spark, sf_dir)
    codes, cbs, rot, _geo = read_pq_index(spark, snap)
    return pq_index_topk(emb, codes, cbs, rot, qvec, k=10, shortlist=50)


def _pq_index_batch_oracle(k: int = 10, shortlist: int = 50,
                           m: int = 8, dsub: int = 8) -> str:
    sq = ("list_sum(list_transform(list_zip(q.qp, c.c), "
          "z -> (z[1] - z[2]) * (z[1] - z[2])))")
    return f"""
WITH {_pq_ctes(m=m, dsub=dsub)},
qv AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS v FROM embeddings
       WHERE vec_id < 3),
qsub AS (SELECT qid, j AS sub, v[j * {dsub} + 1 : (j + 1) * {dsub}] AS qp
         FROM qv CROSS JOIN (SELECT CAST(unnest(generate_series(0, {m - 1}))
                                    AS BIGINT) AS j)),
lut AS (SELECT q.qid, c.sub, c.code,
               CAST(round({sq} * 1000000) AS BIGINT) AS md
        FROM c2 c JOIN qsub q USING (sub)),
adc AS (SELECT l.qid, a.id, CAST(SUM(l.md) AS BIGINT) AS adc_microdist
        FROM af a JOIN lut l USING (sub, code) GROUP BY l.qid, a.id),
short AS (SELECT qid, id, adc_microdist FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY adc_microdist, id) AS rn
    FROM adc) WHERE rn <= {shortlist}),
scored AS (SELECT s.qid, s.id, s.adc_microdist,
                  round({_cosine_sql('p.v', 'q.v')}, 6) AS score
           FROM short s JOIN pts p ON p.id = s.id
                        JOIN qv q ON q.qid = s.qid)
SELECT qid AS q_id, id AS vec_id, adc_microdist, score, rnk FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
                                 ORDER BY score DESC, id) AS rnk
    FROM scored) WHERE rnk <= {k}
"""


@query("ann_pq_index_batch_topk", _pq_index_batch_oracle())
def ann_pq_index_batch_topk(spark, sf_dir):
    """BATCH serving from the pq_index artifacts (r12): 3 queries in
    ONE job — per-query LUTs computed distributed (one Arrow pass over
    the queries, exploded into Q x m*ksub skinny rows broadcast into
    the ADC join), one combinable (query, id) ADC sum over a SINGLE
    codes scan, per-query windowed shortlist + exact re-rank.  Q
    sequential `ann_pq_index_topk` calls would scan the codes Q
    times.  Oracle: cell-exact multi-query extension of the unrolled
    PQ CTEs."""
    from scespet_spark.operators.similarity import pq_index_batch_topk
    from scespet_spark.operators.snapshot import read_pq_index
    emb = load_table(spark, sf_dir, "embeddings")
    snap = _pq_artifact_snapshot(spark, sf_dir)
    codes, cbs, rot, _geo = read_pq_index(spark, snap)
    qs = (emb.filter(F.col("vec_id") < 3)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_vec")))
    out = pq_index_batch_topk(emb, codes, cbs, rot, qs, k=10,
                              shortlist=50)
    return out.select("q_id", "vec_id", "adc_microdist", "score",
                      F.col("rnk").cast("long").alias("rnk"))


@query("ann_pq_index_incremental_topk",
       _pq_adc_oracle(train_where="id % 4 <> 3"))
def ann_pq_index_incremental_topk(spark, sf_dir):
    """The ``pq_index`` family's GENERATION-APPEND lifecycle under one
    cell-exact oracle (r12): codebooks trained on the PRIOR generation
    (vec_id % 4 != 3), the drop (% 4 == 3) appended via ``pq_encode``
    against the STANDING rotation + codebooks (no refit — appended
    distances stay comparable), then one query served over the merged
    codes table.  Oracle: the unrolled PQ CTEs with training points
    restricted to the prior but the final assignment over ALL points —
    exactly the no-refit append semantics, so rows match
    bit-for-bit.  At 100 TB: daily index refresh costs one encode pass
    over the drop, never a corpus re-train."""
    from scespet_spark.operators.similarity import pq_index_topk
    from scespet_spark.operators.snapshot import read_pq_index
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = (emb.filter(F.col("vec_id") == 0)
            .select("embedding").collect()[0][0])
    snap = _pq_artifact_snapshot(spark, sf_dir, incremental=True)
    codes, cbs, rot, _geo = read_pq_index(spark, snap)
    return pq_index_topk(emb, codes, cbs, rot, qvec, k=10, shortlist=50)


@query("ann_opq_adc_topk", """
SELECT CAST(r AS INTEGER) AS rank, TRUE AS in_corpus,
       TRUE AS score_monotone, TRUE AS neighbor_ok
FROM (SELECT unnest(generate_series(1, 10)) AS r) ORDER BY rank
""")
def ann_opq_adc_topk(spark, sf_dir):
    """OPQ serving (r12): ``opq_adc_topk`` — PQ with a learned
    orthonormal rotation (OPQ-NP, Ge et al. CVPR 2013: PCA +
    eigenvalue-allocation init, k-means/Procrustes alternation) so the
    axis-aligned subspace split loses less cross-correlated variance.
    The rotation folds into the query LUT driver-side; the ADC scan
    and exact full-dim re-rank are plan-identical to
    ``ann_pq_adc_topk`` (orthonormal rotations preserve cosine).

    INVARIANT oracle (the SVD/eigh alternation isn't SQL-expressible;
    the unrotated PQ serving path is cell-exact oracle-green as
    ``ann_pq_adc_topk``): per final rank, the returned id exists in
    the corpus, scores are non-increasing in rank, and EVERY returned
    id lies in the full-dim exact top-50 (same razor as
    ``ann_pca_ivfpq_topk`` — a broken rotation/codebook returns
    near-random vectors with ~(50/n)^10 odds of passing).  Exact
    behavior is pytest-pinned: rotation orthonormality + determinism,
    and reconstruction error strictly below axis-aligned PQ on an
    anisotropic cross-correlated fixture
    (tests/test_pipeline_ops.py::test_opq_*)."""
    from pyspark.sql import Window

    from scespet_spark.operators.similarity import (brute_force_topk,
                                                    opq_adc_topk)
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = (emb.filter(F.col("vec_id") == 0)
            .select("embedding").collect()[0][0])
    got = opq_adc_topk(emb, qvec, k=10, shortlist=50).collect()
    top50 = {r.vec_id
             for r in brute_force_topk(emb, qvec, k=50).collect()}
    corpus_ids = emb.select("vec_id")
    res = spark.createDataFrame(
        [(i + 1, int(r.vec_id), float(r.score),
          bool(r.vec_id in top50))
         for i, r in enumerate(got)],
        "rank int, vec_id long, score double, neighbor_ok boolean")
    return (res.join(corpus_ids.withColumn("__in", F.lit(True)),
                     "vec_id", "left")
            .select("rank",
                    F.coalesce("__in", F.lit(False)).alias("in_corpus"),
                    (F.coalesce(
                        F.lag("score").over(Window.orderBy("rank")),
                        F.lit(1e9)) >= F.col("score") - F.lit(1e-9))
                    .alias("score_monotone"),
                    "neighbor_ok")
            .orderBy("rank"))


def _ivfpq_oracle(k: int = 10, nprobe: int = 2, shortlist: int = 50,
                  m: int = 8, dsub: int = 8) -> str:
    sq = ("list_sum(list_transform(list_zip(q.qp, c.c), "
          "z -> (z[1] - z[2]) * (z[1] - z[2])))")
    return f"""
WITH {_pq_ctes(m=m, dsub=dsub)},
cent AS (
  SELECT label, list(mv ORDER BY i) AS centroid FROM (
    SELECT label, i, AVG(embedding[i]::DOUBLE) AS mv
    FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    GROUP BY label, i) GROUP BY label),
qv AS (SELECT embedding::DOUBLE[] AS v FROM embeddings WHERE vec_id = 0),
probe AS (SELECT label FROM cent, qv
          ORDER BY round({_cosine_sql('centroid', 'v')}, 6) DESC, label
          LIMIT {nprobe}),
members AS (SELECT vec_id FROM embeddings JOIN probe USING (label)),
qsub AS (SELECT j AS sub, v[j * {dsub} + 1 : (j + 1) * {dsub}] AS qp
         FROM qv CROSS JOIN (SELECT CAST(unnest(generate_series(0, {m - 1}))
                                    AS BIGINT) AS j)),
lut AS (SELECT c.sub, c.code, CAST(round({sq} * 1000000) AS BIGINT) AS md
        FROM c2 c JOIN qsub q USING (sub)),
adc AS (SELECT a.id, CAST(SUM(l.md) AS BIGINT) AS adc_microdist
        FROM af a JOIN lut l USING (sub, code)
        JOIN members mm ON mm.vec_id = a.id GROUP BY a.id),
short AS (SELECT * FROM adc ORDER BY adc_microdist, id LIMIT {shortlist})
SELECT s.id AS vec_id, s.adc_microdist,
       round({_cosine_sql('p.v', 'q.v')}, 6) AS score
FROM short s JOIN pts p ON p.id = s.id CROSS JOIN qv q
ORDER BY score DESC, vec_id LIMIT {k}
"""


@query("ann_ivfpq_topk", _ivfpq_oracle())
def ann_ivfpq_topk(spark, sf_dir):
    """True IVF-PQ serving: probe the best 2 coarse cells by centroid
    cosine, ADC-shortlist within the probed cells only (corpus-wide PQ
    codebooks; at scale the codes table is partitioned by cell so this
    is partition pruning), exact re-rank of the shortlist — the
    canonical 100 TB ANN query."""
    from scespet_spark.operators.similarity import ivfpq_topk
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    return ivfpq_topk(emb, qvec, k=10, nprobe=2, shortlist=50)


@query("ann_ivfpq_index_topk", _ivfpq_oracle())
def ann_ivfpq_index_topk(spark, sf_dir):
    """IVF-PQ served from the CELL-PARTITIONED artifact index (r12):
    the snapshot writes ``pq_codes`` hive-partitioned by the IVF
    coarse cell (``pq_by_cell=True``), the query ranks cells
    driver-side against the model-sized centroid artifact and filters
    the codes scan to the 2 best — a PartitionFilter, so the query
    READS nprobe/K of the index files (plan-pinned in
    tests/test_plans.py) instead of semi-joining a membership list.
    ADC + exact re-rank as ``ann_pq_index_topk``.  Oracle: cell-exact
    — same rows as ``ann_ivfpq_topk``'s unrolled CTEs (coarse probe by
    rounded centroid cosine, corpus-wide codebooks, ADC within probed
    cells only)."""
    from scespet_spark.operators.similarity import ivfpq_index_topk
    from scespet_spark.operators.snapshot import read_pq_index
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = (emb.filter(F.col("vec_id") == 0)
            .select("embedding").collect()[0][0])
    snap = _pq_artifact_snapshot(spark, sf_dir)
    codes, cbs, rot, _geo = read_pq_index(spark, snap)
    cents = spark.read.parquet(f"{snap}/centroids")
    return ivfpq_index_topk(emb, codes, cbs, rot, cents, qvec,
                            k=10, nprobe=2, shortlist=50)


@query("ann_pca_ivfpq_topk", """
SELECT CAST(r AS INTEGER) AS rank, TRUE AS in_corpus,
       TRUE AS score_monotone, TRUE AS neighbor_ok
FROM (SELECT unnest(generate_series(1, 10)) AS r) ORDER BY rank
""")
def ann_pca_ivfpq_topk(spark, sf_dir):
    """The full reduce-dims -> index -> ADC -> re-rank serving chain
    under ONE oracle (r10 verdict item #4): PCA-32 projection of the
    corpus (offline snapshot artifact), IVF-PQ serving IN THE REDUCED
    SPACE (m=8 x dsub=4 codebooks over 32 dims — half-size codes and
    LUT work vs full-dim), then exact cosine re-rank of the
    reduced-space candidates against the ORIGINAL full-dim vectors.
    At 100 TB: dim reduction shrinks both the PQ artifact and every
    ADC scan; the original vectors are touched only for the
    candidate-sized re-rank join.

    INVARIANT oracle (eigenvectors aren't SQL-expressible; each stage
    is individually oracle-green — embedding_pca_project,
    ann_pq_codes, ann_ivfpq_topk): per final rank, the returned id
    exists in the corpus, scores are non-increasing in rank, and
    EVERY returned id lies in the FULL-DIM exact top-50
    (``neighbor_ok`` — measured 10/10 at sf0.001/0.01/0.1; the
    synthetic corpus is near-isotropic, so exact top-10 recall
    through a 2x dim cut is honestly noisy (0.3-0.6, SCALE.md), but
    top-50 membership of 500-2000 vectors is a razor: any broken
    stage returns near-random vectors with ~(50/n)^10 odds of
    passing)."""
    from pyspark.sql import Window

    from scespet_spark.operators.similarity import (brute_force_topk,
                                                    cosine, ivfpq_topk,
                                                    pca_fit, pca_project)
    emb = load_table(spark, sf_dir, "embeddings")
    model = pca_fit(emb)
    red = (pca_project(emb, model, k=32, out="p32")
           .select("vec_id", "label", F.col("p32").alias("embedding")))
    from scespet_spark.operators._cache import persist as _persist
    red = _persist(red, "similarity")
    qvec = (emb.filter(F.col("vec_id") == 0)
            .select("embedding").collect()[0][0])
    qred = (red.filter(F.col("vec_id") == 0)
            .select("embedding").collect()[0][0])
    cand = ivfpq_topk(red, qred, k=50, nprobe=4, shortlist=100,
                      m=8, dsub=4)
    orig = emb.select("vec_id",
                      F.col("embedding").cast("array<double>").alias("v"))
    q = F.array(*[F.lit(float(x)) for x in qvec])
    rer = (cand.select("vec_id").join(orig, "vec_id")
           .select("vec_id", F.round(cosine(F.col("v"), q), 6)
                   .alias("score"))
           .orderBy(F.col("score").desc(), "vec_id").limit(10))
    top50 = {r.vec_id
             for r in brute_force_topk(emb, qvec, k=50).collect()}
    got = rer.collect()                       # k rows — model-sized
    corpus_ids = emb.select("vec_id")
    res = spark.createDataFrame(
        [(i + 1, int(r.vec_id), float(r.score),
          bool(r.vec_id in top50))
         for i, r in enumerate(got)],
        "rank int, vec_id long, score double, neighbor_ok boolean")
    return (res.join(corpus_ids.withColumn("__in", F.lit(True)),
                     "vec_id", "left")
            .select("rank",
                    F.coalesce("__in", F.lit(False)).alias("in_corpus"),
                    (F.coalesce(
                        F.lag("score").over(Window.orderBy("rank")),
                        F.lit(1e9)) >= F.col("score") - F.lit(1e-9))
                    .alias("score_monotone"),
                    "neighbor_ok")
            .orderBy("rank"))


@query("ann_ivf_kmeans_codes", _kmeans_oracle_sql(k=8, iters=3))
def ann_ivf_kmeans_codes(spark, sf_dir):
    """IVF coarse-code build: deterministic-seeded k-means expressed as
    broadcast-join assign + element-wise-mean update per iteration.
    Oracle = the same fixed 3 Lloyd's iterations unrolled as DuckDB CTE
    stages over the identical seed (k lowest-id vectors) and the same
    left-fold distance order."""
    from scespet_spark.operators.similarity import kmeans_codes
    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_codes(emb, k=8, iters=3)


@query("gopher_quality_docs", f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
s AS (SELECT doc_id, len(toks) AS n_words,
        round(list_sum(list_transform(toks, x -> strlen(x)))::DOUBLE
              / len(toks), 6) AS mean_word_len,
        round((len(regexp_extract_all(text, '#'))
               + len(regexp_extract_all(text, '\\.\\.\\.')))::DOUBLE
              / len(toks), 6) AS symbol_word_ratio,
        round(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
              ::DOUBLE / len(toks), 6) AS alpha_word_ratio,
        (list_contains(toks, 'the')::INT + list_contains(toks, 'be')::INT + list_contains(toks, 'to')::INT + list_contains(toks, 'of')::INT + list_contains(toks, 'and')::INT + list_contains(toks, 'that')::INT + list_contains(toks, 'have')::INT + list_contains(toks, 'with')::INT) AS n_stop_hits
      FROM t)
SELECT doc_id, n_words::BIGINT AS n_words, mean_word_len,
       symbol_word_ratio, alpha_word_ratio,
       n_stop_hits::BIGINT AS n_stop_hits,
       (n_words >= 30 AND n_words <= 100000
        AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
        AND symbol_word_ratio <= 0.1 AND alpha_word_ratio >= 0.8
        AND n_stop_hits >= 2)::INT AS keep
FROM s
""")
def gopher_quality_docs(spark, sf_dir):
    """Gopher's DOC-level quality rules (r9 — the companion to the
    line-level c4_rule_filter): word-count and mean-word-length
    bounds, symbol-to-word ratio, alpha-word fraction, required stop
    words — ONE map-only codegen projection emitting audit columns +
    the keep flag, Generate-barrier-protected against the keep-gate
    pushdown trap.  min_words tuned to the synthetic corpus (~49-word
    docs)."""
    from scespet_spark.operators.text import gopher_quality_filter
    docs = load_table(spark, sf_dir, "documents")
    return gopher_quality_filter(docs, min_words=30).select(
        "doc_id", "n_words", "mean_word_len", "symbol_word_ratio",
        "alpha_word_ratio", "n_stop_hits", "keep")


@query("live_gopher_filter", _ORACLES["gopher_quality_docs"])
def live_gopher_filter(spark, sf_dir):
    """The Gopher doc-level rules on a LIVE crawl: the same stateless
    map-only projection per micro-batch (append mode, zero state,
    Generate-barrier-protected keep gate).  Oracle = the batch rules
    over the table the stream replays."""
    from scespet_spark.operators.text import gopher_quality_filter
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    stream = read_table_stream(spark, sf_dir, "documents")
    out = gopher_quality_filter(stream, min_words=30).select(
        "doc_id", "n_words", "mean_word_len", "symbol_word_ratio",
        "alpha_word_ratio", "n_stop_hits", "keep")
    return run_available_now(out, "append")


@query("text_token_stats", f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents)
SELECT doc_id, len(toks) AS n_ws_tokens,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
         AS n_bpe_tokens,
       round(list_sum(list_transform(toks, x -> strlen(x)))::DOUBLE
             / len(toks), 6) AS mean_token_len
FROM t
""")
def text_token_stats(spark, sf_dir):
    from scespet_spark.operators.text import token_stats
    docs = load_table(spark, sf_dir, "documents")
    return token_stats(docs).select("doc_id", "n_ws_tokens", "n_bpe_tokens",
                                    "mean_token_len")


def _lang_id_oracle():
    from scespet_spark.operators.text import LANG_MARKERS

    def mc(m):
        needle = f" {m} "
        return ("CAST((strlen(' ' || text || ' ') - "
                f"strlen(replace(' ' || text || ' ', '{needle}', '')))"
                f" / {len(needle)} AS BIGINT)")

    scores = "\n  UNION ALL\n  ".join(
        f"SELECT doc_id, '{lang}' AS lang, "
        + " + ".join(mc(m) for m in markers) + " AS score FROM documents"
        for lang, markers in sorted(LANG_MARKERS.items()))
    return f"""
WITH scores AS (
  {scores})
SELECT doc_id, lang AS pred_lang FROM (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang) AS rn
  FROM scores) WHERE rn = 1
"""


@query("text_lang_id", _lang_id_oracle())
def text_lang_id(spark, sf_dir):
    from scespet_spark.operators.text import lang_id
    docs = load_table(spark, sf_dir, "documents")
    return lang_id(docs).select("doc_id", "pred_lang")


#: hashed char-3-gram language-ID classifier demo params: train split
#: is doc_id % 3 == 0 labeled by the documents table's lang column
_LC_B = 4096
_LC_GRAMS = ("list_transform(range(1, greatest(1, length(text) - 1)), "
             "g -> substring(text, g, 3))")

#: oracle CTEs for the fitted multi-class NB model (per-language bucket
#: weights over the complete observed-bucket x language grid, unseen
#: likelihoods, class priors) and the argmax scoring; {target}
#: restricts the apply side
_LC_SQL = f"""WITH tr AS (SELECT doc_id, lang, text FROM documents
            WHERE doc_id % 3 = 0),
g AS (SELECT lang, unnest({_LC_GRAMS}) AS gm FROM tr),
cnt AS (SELECT ({h64_sql('gm')}) % {_LC_B} AS bucket, lang,
               COUNT(*) AS c
        FROM g GROUP BY 1, 2),
tot AS (SELECT lang, SUM(c) AS t FROM cnt GROUP BY 1),
w AS (SELECT b.bucket, t.lang,
             ln((coalesce(c.c, 0) + 1.0) / (t.t + {_LC_B}.0)) AS w
      FROM (SELECT DISTINCT bucket FROM cnt) b
      CROSS JOIN tot t
      LEFT JOIN cnt c ON c.bucket = b.bucket AND c.lang = t.lang),
un AS (SELECT lang, ln(1.0 / (t + {_LC_B}.0)) AS w FROM tot),
nd AS (SELECT lang, COUNT(*) AS ndocs FROM tr GROUP BY 1),
pri AS (SELECT lang, ln((ndocs + 1.0)
             / ((SELECT SUM(ndocs) FROM nd)
                + (SELECT COUNT(*) FROM nd))) AS p FROM nd),
ag AS (SELECT doc_id, ({h64_sql('gm')}) % {_LC_B} AS bucket
       FROM (SELECT doc_id, unnest({_LC_GRAMS}) AS gm
             FROM documents WHERE {{target}})),
sc AS (SELECT ag.doc_id, un.lang,
              round(avg(coalesce(w.w, un.w)) + pri.p, 6) AS score
       FROM ag
       CROSS JOIN un
       JOIN pri ON pri.lang = un.lang
       LEFT JOIN w ON w.bucket = ag.bucket AND w.lang = un.lang
       GROUP BY ag.doc_id, un.lang, pri.p)
SELECT doc_id, lang AS pred_lang, score FROM (
  SELECT sc.*, ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY score DESC, lang) AS rn
  FROM sc) WHERE rn = 1"""


@query("lang_id_classifier", _LC_SQL.format(target="doc_id % 3 <> 0"))
def lang_id_classifier(spark, sf_dir):
    """Model-based language ID (the CCNet architecture rung above the
    marker-word heuristic `text_lang_id`): a hashed char-3-gram
    multi-class naive-Bayes classifier fitted on the labeled train
    split (doc_id % 3 == 0, labels = the documents table's lang
    column) and applied to the held-out docs — prediction = argmax of
    mean gram log-likelihood + class prior, lexicographic tie-break.
    Fit is one map-side-combinable gram-count pass to a <= B*L-row
    weight table (the snapshot artifact); apply is a broadcast join +
    per-doc per-language mean.  No UDF anywhere; the closed-form fit
    keeps both halves SQL-exact.

    r12 note (measured negative result): swapping apply for the
    map-only ``lang_id_apply_rowwise`` serving form — removing the
    gram explode + broadcast join + per-doc aggregation — was SLOWER
    (min 5.2s vs 3.8s A/B'd back-to-back at sf0.1): the L
    constant-folded 4096-entry weight arrays cost more in plan build
    and per-gram ``element_at`` folds than the combinable aggregation
    costs in shuffle.  The join form stays; the rowwise form remains
    the streaming-append serving shape (`live_lang_id_rowwise`)."""
    from scespet_spark.operators.text import lang_id_apply, lang_id_fit
    docs = load_table(spark, sf_dir, "documents")
    model = lang_id_fit(docs.filter(F.col("doc_id") % 3 == 0),
                        n_buckets=_LC_B)
    return lang_id_apply(docs.filter(F.col("doc_id") % 3 != 0), model,
                         n_buckets=_LC_B)


@query("live_lang_id", _LC_SQL.format(target="TRUE"))
def live_lang_id(spark, sf_dir):
    """The persisted language classifier serving a LIVE crawl stream:
    the per-bucket weight table (fitted once batch-side, pivoted to one
    row per bucket — the snapshot artifact) attaches to arriving
    documents via a broadcast stream-static join; priors and unseen
    likelihoods are the 2L scalar model rows, read once driver-side.
    Zero corpus passes at serve time.  Oracle = the batch apply over
    the full table the stream replays."""
    from scespet_spark.operators.text import lang_id_apply, lang_id_fit
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    model = lang_id_fit(docs.filter(F.col("doc_id") % 3 == 0),
                        n_buckets=_LC_B)
    stream = read_table_stream(spark, sf_dir, "documents")
    return run_available_now(
        lang_id_apply(stream, model, n_buckets=_LC_B), "complete")


@query("live_lang_id_rowwise", _LC_SQL.format(target="TRUE"))
def live_lang_id_rowwise(spark, sf_dir):
    """The APPEND-LEGAL language gate (r9): lang_id_apply aggregates
    per doc (complete mode, memory-sink only), so it could not sit in
    a checkpointed append chain; lang_id_apply_rowwise folds L literal
    per-language weight arrays over the row's own char-gram buckets —
    map-only, zero state, argmax in codegen — and runs here in APPEND
    mode, the capstone crawl-gate shape.  Scores differ from the join
    form only in float summation order (~1e-12, invisible at the 6dp
    rounding), so the oracle is the same fitted-model SQL."""
    from scespet_spark.operators.text import (lang_id_apply_rowwise,
                                              lang_id_fit)
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    model = lang_id_fit(docs.filter(F.col("doc_id") % 3 == 0),
                        n_buckets=_LC_B)
    stream = read_table_stream(spark, sf_dir, "documents")
    gated = (lang_id_apply_rowwise(stream, model, n_buckets=_LC_B)
             .filter(F.col("pred_lang").isNotNull())
             .select("doc_id", "pred_lang", "score"))
    return run_available_now(gated, "append")


#: deterministic multi-line punctuation-bearing text over `documents`
#: for the C4/Gopher rule-filter demo (the corpus text itself has no
#: newlines or punctuation): per-line keep/drop cases for every rule,
#: plus bullet-heavy (doc_id % 11) and ellipsis-heavy (doc_id % 13)
#: docs that trip the DOC-level gates
_C4_TEXT_SQL = (
    "CASE WHEN doc_id % 11 = 0 THEN "
    + " || chr(10) || ".join(f"'- item number {i} here.'"
                             for i in range(10))
    + " WHEN doc_id % 13 = 0 THEN 'first thought trails away...'"
      " || chr(10) || 'second thought trails away...'"
      " || chr(10) || 'third thought stays put.'"
      " ELSE 'The corpus line number ' || (doc_id % 5)::VARCHAR"
      " || ' reads fine.'"
      " || chr(10) || 'too short.'"
      " || chr(10) || 'this line has no terminal punctuation'"
      " || chr(10) || '- bullet point item here.'"
      " || CASE WHEN doc_id % 3 = 0 THEN chr(10) ||"
      " 'please accept our cookie policy.' ELSE '' END"
      " || CASE WHEN doc_id % 4 = 0 THEN chr(10) ||"
      " 'content continues with more to come...' ELSE '' END"
      " || chr(10) || 'the doc says ' || text || ' indeed.'"
      " END")


def _c4_demo_text():
    """Spark side of _C4_TEXT_SQL (value-identical)."""
    nl = "\n"
    base = F.concat(
        F.lit("The corpus line number "),
        (F.col("doc_id") % 5).cast("string"), F.lit(" reads fine."),
        F.lit(nl + "too short."),
        F.lit(nl + "this line has no terminal punctuation"),
        F.lit(nl + "- bullet point item here."),
        F.when(F.col("doc_id") % 3 == 0,
               F.lit(nl + "please accept our cookie policy."))
        .otherwise(F.lit("")),
        F.when(F.col("doc_id") % 4 == 0,
               F.lit(nl + "content continues with more to come..."))
        .otherwise(F.lit("")),
        F.lit(nl + "the doc says "), F.col("text"), F.lit(" indeed."))
    bullets = nl.join(f"- item number {i} here." for i in range(10))
    ell = ("first thought trails away..." + nl
           + "second thought trails away..." + nl
           + "third thought stays put.")
    return (F.when(F.col("doc_id") % 11 == 0, F.lit(bullets))
            .when(F.col("doc_id") % 13 == 0, F.lit(ell))
            .otherwise(base))


#: DuckDB mirror of text.c4_rule_filter's line-keep predicate
_C4_LINE_OK = ("regexp_matches(x, '[.!?\"'']$')"
               " AND len(list_filter(string_split(x, ' '),"
               " w -> w <> '')) >= 3"
               " AND NOT contains(lower(x), 'javascript')"
               " AND NOT contains(lower(x), 'lorem ipsum')"
               " AND NOT contains(lower(x), 'cookie policy')"
               " AND NOT contains(lower(x), 'privacy policy')"
               " AND NOT contains(lower(x), 'terms of use')"
               " AND NOT contains(lower(x), '{')")

_C4_SQL = f"""WITH d AS (SELECT doc_id, {_C4_TEXT_SQL} AS t
           FROM documents),
l AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM d),
m AS (SELECT doc_id,
             list_filter(ls, x -> {_C4_LINE_OK}) AS kept,
             len(ls) AS nl,
             len(list_filter(ls,
                 x -> regexp_matches(x, '^\\s*[-*•]'))) AS nb,
             len(list_filter(ls,
                 x -> regexp_matches(x, '\\.\\.\\.$'))) AS ne
      FROM l)
SELECT doc_id,
       array_to_string(kept, chr(10)) AS clean_text,
       CAST(nl AS BIGINT) AS n_lines,
       CAST(len(kept) AS BIGINT) AS n_kept_lines,
       round(nb::DOUBLE / nl, 6) AS bullet_ratio,
       round(ne::DOUBLE / nl, 6) AS ellipsis_ratio,
       (len(kept) >= 1 AND nb <= 0.9 * nl AND ne <= 0.3 * nl)::INT
           AS keep
FROM m"""

_C4_COLS = ["doc_id", "clean_text", "n_lines", "n_kept_lines",
            "bullet_ratio", "ellipsis_ratio", "keep"]


@query("c4_rule_filter", _C4_SQL)
def c4_rule_filter(spark, sf_dir):
    """C4/Gopher rule-based cleaning (Raffel et al. 2020 §2.2; Gopher
    A1.1): line-level terminal-punctuation / min-words / boilerplate-
    marker filters plus doc-level bullet-ratio and ellipsis-ratio
    gates, over a deterministic in-query synthesized multi-line text
    column (the corpus text carries no newlines or punctuation).  ONE
    map-only projection of codegen array/regex expressions — no UDF,
    no shuffle; runs at scan speed at any corpus size."""
    from scespet_spark.operators.text import c4_rule_filter as c4
    docs = load_table(spark, sf_dir, "documents")
    return (c4(docs.withColumn("text", _c4_demo_text()))
            .select(*_C4_COLS))


@query("live_c4_filter", _C4_SQL)
def live_c4_filter(spark, sf_dir):
    """The C4 rule gate on a LIVE crawl: the same stateless codegen
    projection applied per micro-batch (append mode, zero state) —
    cleaning quality rules cost nothing extra at serve time.  Oracle =
    the batch filter over the table the stream replays."""
    from scespet_spark.operators.text import c4_rule_filter as c4
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    stream = (read_table_stream(spark, sf_dir, "documents")
              .withColumn("text", _c4_demo_text()))
    return run_available_now(c4(stream).select(*_C4_COLS), "append")


def _stop_list_sql():
    from scespet_spark.operators.text import LANG_MARKERS
    flat = [m for ms in LANG_MARKERS.values() for m in ms]
    return "[" + ", ".join(f"'{m}'" for m in flat) + "]"


@query("text_quality", f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
c AS (SELECT doc_id, strlen(text) AS n_chars_m,
        len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS n_punct,
        len(toks) AS n_tok,
        len(list_filter(toks, x -> list_contains({_stop_list_sql()}, x)))
          AS n_stop
      FROM t)
SELECT doc_id, n_chars_m,
       round(n_punct::DOUBLE / n_chars_m, 6) AS punct_ratio,
       round(n_stop::DOUBLE / n_tok, 6) AS stopword_ratio,
       round(least(1.0, n_tok::DOUBLE / 100.0) * 0.5
             + (1.0 - least(1.0, n_punct::DOUBLE / n_chars_m)) * 0.3
             + least(1.0, n_stop::DOUBLE / n_tok * 5.0) * 0.2, 6) AS quality
FROM c
""")
def text_quality(spark, sf_dir):
    from scespet_spark.operators.text import quality_score
    docs = load_table(spark, sf_dir, "documents")
    return quality_score(docs).select("doc_id", "n_chars_m", "punct_ratio",
                                      "stopword_ratio", "quality")


@query("dedup_keep_best", f"""
WITH RECURSIVE {_minhash_ctes()},
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
cc(id, label) AS (
  SELECT DISTINCT src AS id, src AS label FROM edges
  UNION
  SELECT e.src AS id, c.label
  FROM edges e JOIN cc c ON e.dst = c.id
  WHERE c.label < e.src),
labels AS (SELECT id, MIN(label) AS cluster FROM cc GROUP BY id),
t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
c AS (SELECT doc_id, strlen(text) AS nc,
        len(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS np,
        len(toks) AS nt,
        len(list_filter(toks, x -> list_contains({_stop_list_sql()}, x)))
          AS ns
      FROM t),
q AS (SELECT doc_id,
        round(least(1.0, nt::DOUBLE / 100.0) * 0.5
              + (1.0 - least(1.0, np::DOUBLE / nc)) * 0.3
              + least(1.0, ns::DOUBLE / nt * 5.0) * 0.2, 6) AS quality
      FROM c),
b AS (SELECT d.doc_id, coalesce(l.cluster, d.doc_id) AS cluster,
             q.quality
      FROM documents d LEFT JOIN labels l ON l.id = d.doc_id
                       JOIN q ON q.doc_id = d.doc_id),
r AS (SELECT *, row_number() OVER (PARTITION BY cluster
                ORDER BY quality DESC, doc_id ASC) AS rk FROM b)
SELECT doc_id, cluster, quality FROM r WHERE rk = 1
""")
def dedup_keep_best(spark, sf_dir):
    """Quality-aware cluster canonicalization (late r11): instead of
    keeping each near-dup cluster's MIN-id member (dedup_kept_corpus's
    convention), keep its HIGHEST-QUALITY member — the policy real
    pipelines ship, where the canonical copy should be the cleanest
    one, not the first-crawled one.  Composes the LSH cluster labels
    with the heuristic quality score and `cap_per_key(k=1)` on the
    cluster key (whale-safe: WindowGroupLimit pre-prunes map-side;
    ties break by doc_id for a total order).  Singletons keep
    themselves.  Oracle: recursive-CTE closure + the same windowed
    rank in SQL."""
    from scespet_spark.operators.dedup import (connected_components,
                                               lsh_candidate_pairs)
    from scespet_spark.operators.pipeline import cap_per_key
    from scespet_spark.operators.text import quality_score
    docs = load_table(spark, sf_dir, "documents")
    labels = connected_components(lsh_candidate_pairs(docs))
    q = quality_score(docs).select("doc_id", "quality")
    scored = (docs.select("doc_id").join(q, "doc_id")
              .join(F.broadcast(labels.select(F.col("id").alias("doc_id"),
                                              "cluster")),
                    "doc_id", "left")
              .withColumn("cluster", F.coalesce("cluster",
                                                F.col("doc_id"))))
    return cap_per_key(scored, 1, "cluster",
                       [F.col("quality").desc(), F.col("doc_id").asc()]
                       ).select("doc_id", "cluster", "quality")


@query("text_repetition", f"""
WITH t AS (SELECT doc_id,
                  list_transform({_TOKS},
                                 x -> {h64_sql('x')} % {2**31 - 1}) AS hs
           FROM documents),
b AS (SELECT doc_id, len(hs) AS n_tokens,
             CASE WHEN len(hs) > 0 THEN
               round(len(list_distinct(hs))::DOUBLE / len(hs), 6)
             END AS distinct_token_ratio,
             CASE WHEN len(hs) > 0 THEN
               round(len(list_distinct(list_transform(
                       generate_series(1, greatest(len(hs) - 1, 1)),
                       i -> ((coalesce(hs[i], 0) * {_shc(0)}) % {2**31 - 1}
                             + (coalesce(hs[i + 1], 0) * {_shc(1)}) % {2**31 - 1})
                            % {2**31 - 1})))::DOUBLE
                     / greatest(len(hs) - 1, 1), 6)
             END AS distinct_bigram_ratio
      FROM t),
c AS (SELECT doc_id, MAX(c) AS maxc FROM (
        SELECT doc_id, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(hs) AS tk FROM t)
        GROUP BY doc_id, tk) GROUP BY doc_id)
SELECT b.doc_id, n_tokens, distinct_token_ratio, distinct_bigram_ratio,
       CASE WHEN n_tokens > 0 THEN round(maxc::DOUBLE / n_tokens, 6)
       END AS top_token_share
FROM b LEFT JOIN c ON b.doc_id = c.doc_id
""")
def text_repetition(spark, sf_dir):
    """Repetition/boilerplate stats (C4-style repeated-content filter)."""
    from scespet_spark.operators.text import repetition_stats
    return repetition_stats(load_table(spark, sf_dir, "documents"))


@query("text_fingerprint", f"""
SELECT doc_id,
       {h64_sql("array_to_string(list_sort(list_distinct(" + _TOKS + ")), ' ')")}
         AS fingerprint
FROM documents
""")
def text_fingerprint(spark, sf_dir):
    from scespet_spark.operators.text import fingerprint
    docs = load_table(spark, sf_dir, "documents")
    return fingerprint(docs).select("doc_id", "fingerprint")


#: BM25 demo query terms + params (Lucene idf form)
_BM25_TERMS = ("spark", "window", "merge")
_BM25_TERMS_SQL = "[" + ", ".join(f"'{t}'" for t in _BM25_TERMS) + "]"


_BM25_CTES = f"""st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   AVG(len({_TOKS})) AS avgdl FROM documents),
hits AS (SELECT doc_id, len({_TOKS}) AS dl,
                unnest(list_filter({_TOKS},
                       x -> list_contains({_BM25_TERMS_SQL}, x))) AS t
         FROM documents),
tf AS (SELECT doc_id, t, dl, COUNT(*) AS tf FROM hits GROUP BY 1, 2, 3),
dfreq AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
idf AS (SELECT t, ln((n - df + 0.5) / (df + 0.5) + 1) AS idf
        FROM dfreq, st),
sc AS (SELECT tf.doc_id,
              round(SUM(idf.idf * tf.tf
                    / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl
                                      / (SELECT avgdl FROM st)))), 6)
                  AS score,
              COUNT(*) AS n_terms_hit
       FROM tf JOIN idf ON tf.t = idf.t
       GROUP BY tf.doc_id)"""


@query("live_bm25_score", f"""
WITH {_BM25_CTES}
SELECT doc_id, score, n_terms_hit FROM sc
""")
def live_bm25_score(spark, sf_dir):
    """BM25 scoring on a LIVE crawl: the corpus constants (N, avgdl,
    per-term document frequencies — bm25_stats, ONE aggregate pass)
    are snapshot-artifact scalars; scoring is a stateless map-only
    projection per micro-batch (per-term tf is a per-row array count,
    no posting explode), append mode, zero state.  Oracle = the batch
    scores over the table the stream replays."""
    from scespet_spark.operators.text import bm25_score, bm25_stats
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    stats = bm25_stats(docs, list(_BM25_TERMS))
    stream = read_table_stream(spark, sf_dir, "documents")
    return run_available_now(
        bm25_score(stream, list(_BM25_TERMS), stats), "append")


@query("bm25_topk_docs", f"""
WITH st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   AVG(len({_TOKS})) AS avgdl FROM documents),
hits AS (SELECT doc_id, len({_TOKS}) AS dl,
                unnest(list_filter({_TOKS},
                       x -> list_contains({_BM25_TERMS_SQL}, x))) AS t
         FROM documents),
tf AS (SELECT doc_id, t, dl, COUNT(*) AS tf FROM hits GROUP BY 1, 2, 3),
dfreq AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
idf AS (SELECT t, ln((n - df + 0.5) / (df + 0.5) + 1) AS idf
        FROM dfreq, st)
SELECT doc_id, score, n_terms_hit FROM (
  SELECT tf.doc_id,
         round(SUM(idf.idf * tf.tf
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl
                                 / (SELECT avgdl FROM st)))), 6) AS score,
         COUNT(*) AS n_terms_hit
  FROM tf JOIN idf ON tf.t = idf.t
  GROUP BY tf.doc_id
  ORDER BY score DESC, doc_id LIMIT 100)
ORDER BY doc_id
""")
def bm25_topk_docs(spark, sf_dir):
    """BM25 query-relevance retrieval (Robertson/Lucene idf): top-100
    docs for a fixed term bag — the topic-targeted data-selection step.
    One corpus scan: term-filtered posting explode (map-side), tiny
    broadcast idf table, per-doc sum, distributed TakeOrdered — no
    vocabulary-sized table built."""
    from scespet_spark.operators.text import bm25_topk
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, list(_BM25_TERMS), k=100).orderBy("doc_id")


@query("hybrid_search_rrf", f"""
WITH st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                   AVG(len({_TOKS})) AS avgdl FROM documents),
hits AS (SELECT doc_id, len({_TOKS}) AS dl,
                unnest(list_filter({_TOKS},
                       x -> list_contains({_BM25_TERMS_SQL}, x))) AS t
         FROM documents),
tf AS (SELECT doc_id, t, dl, COUNT(*) AS tf FROM hits GROUP BY 1, 2, 3),
dfreq AS (SELECT t, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
idf AS (SELECT t, ln((n - df + 0.5) / (df + 0.5) + 1) AS idf
        FROM dfreq, st),
lex AS (SELECT doc_id, score FROM (
  SELECT tf.doc_id,
         round(SUM(idf.idf * tf.tf
               / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * tf.dl
                                 / (SELECT avgdl FROM st)))), 6) AS score
  FROM tf JOIN idf ON tf.t = idf.t
  GROUP BY tf.doc_id
  ORDER BY score DESC, doc_id LIMIT 100)),
lexr AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
             ORDER BY score DESC, doc_id) AS INTEGER) AS rank_0 FROM lex),
sem AS (SELECT vec_id AS doc_id, round({_cosine_sql('v', 'qv')}, 6) AS score
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) n,
             (SELECT embedding::DOUBLE[] AS qv FROM embeddings
              WHERE vec_id = 0) q
        ORDER BY score DESC, vec_id LIMIT 100),
semr AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
             ORDER BY score DESC, doc_id) AS INTEGER) AS rank_1 FROM sem)
SELECT doc_id,
       round(coalesce(1.0 / (60 + rank_0), 0)
             + coalesce(1.0 / (60 + rank_1), 0), 6) AS rrf_score,
       rank_0, rank_1
FROM lexr FULL OUTER JOIN semr USING (doc_id)
ORDER BY rrf_score DESC, doc_id
""")
def hybrid_search_rrf(spark, sf_dir):
    """Hybrid retrieval (r10): reciprocal-rank fusion of the lexical
    BM25 top-100 over `documents` and the embedding-cosine top-100
    around a query vector — the calibration-free way to combine the
    two retrievers (Cormack et al. 2009; vec_id doubles as doc_id —
    the doc's embedding row).  Each candidate list is TakeOrdered-
    bounded before fusion, so the rank windows and the full outer join
    run over 100-row tables, never the corpus; contributions sum in
    fixed list order and round to 6dp for the oracle."""
    from scespet_spark.operators.similarity import (brute_force_topk,
                                                    rrf_fuse)
    from scespet_spark.operators.text import bm25_topk
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    lex = bm25_topk(docs, list(_BM25_TERMS), k=100).select("doc_id", "score")
    sem = (brute_force_topk(emb, qvec, k=100)
           .select(F.col("vec_id").alias("doc_id"), "score"))
    return rrf_fuse([lex, sem], ["doc_id"], k=60)


@query("live_hybrid_search_rrf", f"""
WITH {_BM25_CTES},
lex AS (SELECT doc_id, score FROM sc ORDER BY score DESC, doc_id LIMIT 100),
lexr AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
             ORDER BY score DESC, doc_id) AS BIGINT) AS rank_0 FROM lex),
cent AS (
  SELECT label, list(m ORDER BY i) AS centroid FROM (
    SELECT label, i, AVG(embedding[i]::DOUBLE) AS m
    FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    GROUP BY label, i) GROUP BY label),
n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT n.vec_id, cent.label AS cell,
           ROW_NUMBER() OVER (
             PARTITION BY n.vec_id
             ORDER BY round({_cosine_sql('n.v', 'cent.centroid')}, 6) DESC,
                      cent.label) AS rn
    FROM n CROSS JOIN cent) WHERE rn = 1),
qv AS (SELECT v AS qvec FROM n WHERE vec_id = 0),
probe AS (
  SELECT cell FROM (
    SELECT cent.label AS cell,
           ROW_NUMBER() OVER (
             ORDER BY round({_cosine_sql('cent.centroid', 'qv.qvec')}, 6)
                      DESC, cent.label) AS rn
    FROM cent CROSS JOIN qv) WHERE rn <= 2),
sem AS (SELECT n.vec_id AS doc_id,
               round({_cosine_sql('n.v', 'qv.qvec')}, 6) AS score
        FROM n JOIN assign USING (vec_id)
               JOIN probe ON probe.cell = assign.cell
               CROSS JOIN qv
        ORDER BY score DESC, doc_id LIMIT 100),
semr AS (SELECT doc_id, CAST(ROW_NUMBER() OVER (
             ORDER BY score DESC, doc_id) AS BIGINT) AS rank_1 FROM sem)
SELECT CAST(0 AS BIGINT) AS q_id, doc_id,
       round(coalesce(1.0 / (60 + rank_0), 0)
             + coalesce(1.0 / (60 + rank_1), 0), 6) AS rrf_score,
       rank_0, rank_1
FROM lexr FULL OUTER JOIN semr USING (doc_id)
ORDER BY rrf_score DESC, doc_id
""")
def live_hybrid_search_rrf(spark, sf_dir):
    """Hybrid retrieval on a LIVE query stream (r11): per-micro-batch
    reciprocal-rank fusion of the static BM25 top-100 artifact with
    the ANN shortlist served from the static IVF index — the live
    counterpart of `hybrid_search_rrf`, completing the retrieval
    family's batch+live matrix.  Append-mode end to end: lexical side
    is a stream-static equi-join on q_id, semantic side the map-only
    centroid probe + stream-static cell join, fusion inside one
    stateful step per query (state = one dedup flag).  The oracle
    replays both lists and the fusion in SQL; the semantic list is
    the PROBED-CELLS top-100 (nprobe=2), not brute force — exactly
    what the serving path scans."""
    from scespet_spark.operators.similarity import (ivf_assign,
                                                    label_centroids,
                                                    rrf_fuse_stream)
    from scespet_spark.operators.text import bm25_topk
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    from scespet_spark.operators._cache import persist as _persist_
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    # snapshot artifacts (persisted = the local stand-in for the index
    # tables a snapshot job writes): IVF index + per-query BM25 lists
    cents = _persist_(label_centroids(emb), "similarity")
    codes = _persist_(ivf_assign(emb, cents), "similarity")
    lexical = _persist_(
        bm25_topk(docs, list(_BM25_TERMS), k=100)
        .select(F.lit(0).cast("long").alias("q_id"),
                F.col("doc_id").alias("vec_id"), "score"),
        "similarity")
    qs = (read_table_stream(spark, sf_dir, "embeddings")
          .filter(F.col("vec_id") == 0)
          .select(F.col("vec_id").alias("q_id"),
                  F.col("embedding").alias("q_vec")))
    out = rrf_fuse_stream(qs, lexical, emb, cents, codes,
                          k=60, topk_each=100, nprobe=2)
    return (run_available_now(out, "append")
            .select("q_id", F.col("vec_id").alias("doc_id"),
                    "rrf_score", "rank_0", "rank_1")
            .orderBy(F.desc("rrf_score"), "doc_id"))


@query("snapshot_doc_freq_lifecycle", f"""
SELECT token, COUNT(*) AS doc_freq
FROM (SELECT doc_id, unnest(list_distinct({_TOKS})) AS token
      FROM documents
      WHERE doc_id % 3 = 0
         OR (doc_id % 3 = 1 AND doc_id % 2 <> 0))
GROUP BY token
""")
def snapshot_doc_freq_lifecycle(spark, sf_dir):
    """The doc_freq snapshot artifact's FULL lifecycle under one
    oracle (r12): write the prior generation (doc_id % 3 == 0) with
    ``write_snapshot(doc_freq=True)``, APPEND a drop (% 3 == 1 — the
    fold: disjoint generations' per-token doc counts add), then
    RETRACT the drop's even-id half (exact count subtraction), and
    return the artifact table as `read_doc_freq` serves it.  The
    oracle is the from-scratch doc-frequency over exactly the
    surviving corpus — row-identity is the merge-family claim that
    makes generational IDF exact.  The snapshot is built fresh in a
    temp dir each call (the lifecycle IS the query; the shared
    `_artifact_snapshot` stays immutable for the serving queries).

    r12 optimization: the snapshot is written with
    ``doc_families=()`` — this lifecycle serves ONLY the doc_freq
    artifact, so building four dedup probe tables plus a bigram LM per
    generation was pure overhead (guide §1.2: don't compute things you
    throw away).  Append/retract are manifest-driven, so the doc_freq
    fold semantics — and the oracle rows — are unchanged."""
    import tempfile
    from scespet_spark.operators.snapshot import (read_doc_freq,
                                                  retract_snapshot,
                                                  write_snapshot)
    docs = load_table(spark, sf_dir, "documents")
    prior = docs.filter(F.col("doc_id") % 3 == 0)
    delta = docs.filter(F.col("doc_id") % 3 == 1)
    snap = tempfile.mkdtemp(prefix="scespet_dful_") + "/snap"
    write_snapshot(snap, docs=prior, doc_freq=True, doc_families=())
    write_snapshot(snap, docs=delta, mode="append")
    retract_snapshot(snap, docs=delta.filter(F.col("doc_id") % 2 == 0))
    freq, _n = read_doc_freq(spark, snap)
    return freq.select("token", F.col("doc_freq").cast("long")
                       .alias("doc_freq"))


@query("text_token_doc_freq", f"""
SELECT token, COUNT(*) AS doc_freq
FROM (SELECT doc_id, unnest(list_distinct({_TOKS})) AS token FROM documents)
GROUP BY token
""")
def text_token_doc_freq(spark, sf_dir):
    """Corpus vocabulary doc-frequency table — the word-count building
    block of frequency-based quality filters; one explode + one
    combinable groupBy, output is vocabulary-sized."""
    from scespet_spark.operators.text import token_doc_freq
    return token_doc_freq(load_table(spark, sf_dir, "documents"))


@query("text_corpus_idf", f"""
WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
tok AS (SELECT doc_id, unnest(list_distinct({_TOKS})) AS token
        FROM documents),
freq AS (SELECT token, COUNT(*) AS doc_freq FROM tok GROUP BY token)
SELECT doc_id, COUNT(*) AS n_distinct_tokens,
       round(AVG(ln(n_docs / doc_freq)), 6) AS mean_idf
FROM tok JOIN freq USING (token) CROSS JOIN n
GROUP BY doc_id
""")
def text_corpus_idf(spark, sf_dir):
    """CCNet-style corpus-frequency quality score: per-doc mean IDF over
    distinct tokens.  Two corpus passes — the vocabulary-sized frequency
    table, then a (token, id) equi-join back; text never shuffles."""
    from scespet_spark.operators.text import corpus_idf_quality
    return corpus_idf_quality(load_table(spark, sf_dir, "documents"))


@query("text_idf_incremental", f"""
WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
tok AS (SELECT doc_id, unnest(list_distinct({_TOKS})) AS token
        FROM documents),
freq AS (SELECT token, COUNT(*) AS doc_freq FROM tok GROUP BY token)
SELECT doc_id, COUNT(*) AS n_distinct_tokens,
       round(AVG(ln(n_docs / doc_freq)), 6) AS mean_idf
FROM tok JOIN freq USING (token) CROSS JOIN n
WHERE doc_id % 3 <> 0
GROUP BY doc_id
""")
def text_idf_incremental(spark, sf_dir):
    """Generational IDF (r11): the prior generation (doc_id % 3 == 0)
    contributes only its vocabulary-sized ``token_doc_freq`` table (the
    snapshot artifact); a new drop folds its counts in via
    ``token_doc_freq_merge`` — exact because disjoint generations'
    per-token doc counts ADD — and is scored by ``idf_score`` with
    full-corpus-consistent values.  The prior corpus is never re-read:
    this extends the continuous-build family (incremental dedup
    probes, generational clusters) to the text-statistics side.  The
    oracle is the FROM-SCRATCH corpus IDF restricted to the drop —
    row-identical output is the generational path's correctness
    claim."""
    from scespet_spark.operators.snapshot import read_doc_freq
    from scespet_spark.operators.text import (idf_score,
                                              token_doc_freq_merge)
    # r12: the prior generation's counts come from the snapshot's
    # doc_freq artifact (write_snapshot(doc_freq=True) / read_doc_freq)
    # — the registered plan scans the production parquet; only the
    # drop's vocabulary-sized fold stays in-query
    snap = _artifact_snapshot(spark, sf_dir)
    prior_freq, n_prior = read_doc_freq(spark, snap)
    delta = (load_table(spark, sf_dir, "documents")
             .filter(F.col("doc_id") % 3 != 0))
    merged = token_doc_freq_merge(prior_freq, delta)
    n_total = n_prior + delta.count()
    return idf_score(delta, merged, n_total)


@query("live_idf_incremental", _ORACLES["text_idf_incremental"])
def live_idf_incremental(spark, sf_dir):
    """Generational IDF on a LIVE crawl: each arriving drop document
    scores via a stream-static join against the MERGED doc-frequency
    artifact (the table the batch `token_doc_freq_merge` job wrote),
    with the manifest doc count as the literal N — the serving half of
    the generational-IDF family, mirroring live_text_bigram_lm's
    snapshot-model shape.  Same oracle as text_idf_incremental: the
    stream replays the drop the merge already folded in.

    r12: the prior generation's counts come from the snapshot's
    ``doc_freq`` artifact (`read_doc_freq` — the table
    `write_snapshot(doc_freq=True)` maintains across appends and
    retractions) instead of an in-query recount, so the registered
    plan scans the production parquet; only the DROP's vocabulary-
    sized fold stays in-query (that fold IS the ingest job)."""
    from scespet_spark.operators._cache import persist as _persist
    from scespet_spark.operators.snapshot import read_doc_freq
    from scespet_spark.operators.text import (idf_score,
                                              token_doc_freq_merge)
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    snap = _artifact_snapshot(spark, sf_dir)
    prior_freq, n_prior = read_doc_freq(spark, snap)
    delta = (load_table(spark, sf_dir, "documents")
             .filter(F.col("doc_id") % 3 != 0))
    merged = _persist(token_doc_freq_merge(prior_freq, delta),
                      "text_idf")
    n_total = n_prior + delta.count()
    stream = (read_table_stream(spark, sf_dir, "documents")
              .filter(F.col("doc_id") % 3 != 0))
    return run_available_now(idf_score(stream, merged, n_total),
                             "complete")


_LI_NUM = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
           "l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_LI_OTHER = ["l_returnflag", "l_linestatus", "l_shipdate"]


def _profile_oracle():
    parts = []
    for c in _LI_NUM:
        parts.append(f"""
SELECT '{c}' AS column, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN({c}::DOUBLE) AS vmin, MAX({c}::DOUBLE) AS vmax,
       round(AVG({c}::DOUBLE), 6) AS vmean,
       round(quantile_cont({c}::DOUBLE, 0.25), 6) AS p25,
       round(quantile_cont({c}::DOUBLE, 0.50), 6) AS p50,
       round(quantile_cont({c}::DOUBLE, 0.75), 6) AS p75
FROM lineitem""")
    for c in _LI_OTHER:
        parts.append(f"""
SELECT '{c}' AS column, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       NULL::DOUBLE AS vmin, NULL::DOUBLE AS vmax, NULL::DOUBLE AS vmean,
       NULL::DOUBLE AS p25, NULL::DOUBLE AS p50, NULL::DOUBLE AS p75
FROM lineitem""")
    return "\nUNION ALL\n".join(parts)


@query("profile_lineitem", _profile_oracle())
def profile_lineitem(spark, sf_dir):
    """Column-profile report over lineitem: one scan, one wide agg,
    exact interpolated percentiles (engine-exact vs quantile_cont)."""
    from scespet_spark.operators.text import profile_columns
    return profile_columns(load_table(spark, sf_dir, "lineitem"))


def _profile_approx_oracle():
    parts = []
    for c in _LI_NUM:
        parts.append(f"""
SELECT '{c}' AS column, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       MIN({c}::DOUBLE) AS vmin, MAX({c}::DOUBLE) AS vmax,
       round(AVG({c}::DOUBLE), 6) AS vmean,
       TRUE AS p25_ok, TRUE AS p50_ok, TRUE AS p75_ok
FROM lineitem""")
    for c in _LI_OTHER:
        parts.append(f"""
SELECT '{c}' AS column, COUNT(*) AS n_rows,
       CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       NULL::DOUBLE AS vmin, NULL::DOUBLE AS vmax, NULL::DOUBLE AS vmean,
       NULL::BOOLEAN AS p25_ok, NULL::BOOLEAN AS p50_ok,
       NULL::BOOLEAN AS p75_ok
FROM lineitem""")
    return "\nUNION ALL\n".join(parts)


@query("profile_lineitem_approx", _profile_approx_oracle())
def profile_lineitem_approx(spark, sf_dir):
    """The 100 TB profile path: approx_percentile (combinable sketch,
    bounded memory per partial) instead of the exact buffering
    percentile.

    INVARIANT oracle (late-r10; sketch values are engine-specific, so
    the raw estimates have no SQL twin): counts / min / max / mean stay
    exact and hash-checked, and each ``p{25,50,75}_ok`` asserts the
    sketch value sits inside the exact-quantile bracket at p +- 2e-4 —
    twice approx_percentile's documented rank-error bound (1/accuracy
    at accuracy=10000).  The exact brackets are computed in-query as
    the test harness (two extra profile scans at oracle scale only —
    production keeps the sketch pass alone)."""
    from scespet_spark.operators.text import profile_columns
    li = load_table(spark, sf_dir, "lineitem")
    approx = profile_columns(li, approx=True)
    eps = 2e-4
    pcts = [0.25 - eps, 0.25 + eps, 0.5 - eps, 0.5 + eps,
            0.75 - eps, 0.75 + eps]
    # ONE percentile-only aggregate for the brackets (array form: one
    # sort buffer per column) — a full second profile_columns pass
    # would re-pay the multi-count_distinct Expand for stats this
    # harness never reads (measured: 14.5s -> ~9s for the query)
    brk = li.agg(*[
        F.percentile(F.col(c).cast("double"), F.lit(pcts))
        .alias(f"__bk_{c}") for c in _LI_NUM])
    j = approx.crossJoin(F.broadcast(brk))

    def ok(p, i):
        expr = F.lit(None).cast("boolean")
        for c in reversed(_LI_NUM):
            bk = F.col(f"__bk_{c}")
            expr = F.when(
                F.col("column") == c,
                (F.element_at(bk, 2 * i + 1) <= F.col(p))
                & (F.col(p) <= F.element_at(bk, 2 * i + 2))).otherwise(expr)
        return expr.alias(f"{p}_ok")

    return j.select("column", "n_rows", "n_nulls", "n_distinct",
                    "vmin", "vmax", "vmean",
                    ok("p25", 0), ok("p50", 1), ok("p75", 2)
                    ).orderBy("column")


def _bigram_lm_oracle(k=1.0):
    from scespet_spark.operators.dedup import MH_PRIME, sh_coeff
    c0, c1 = sh_coeff(0), sh_coeff(1)
    return f"""
WITH hs AS (SELECT doc_id,
                   list_transform({_TOKS},
                                  x -> {h64_sql('x')} % {MH_PRIME}) AS hs
            FROM documents),
bg AS (SELECT doc_id, hs[i] AS pre,
              ((hs[i] * {c0}) % {MH_PRIME}
               + (hs[i + 1] * {c1}) % {MH_PRIME}) % {MH_PRIME} AS bg
       FROM (SELECT doc_id, hs, unnest(generate_series(1, len(hs) - 1)) AS i
             FROM hs WHERE len(hs) >= 2)),
bgc AS (SELECT bg, COUNT(*) AS cbg FROM bg GROUP BY bg),
prec AS (SELECT pre, COUNT(*) AS cpre FROM bg GROUP BY pre),
v AS (SELECT COUNT(DISTINCT h) AS vv
      FROM (SELECT unnest(hs) AS h FROM hs))
SELECT doc_id, COUNT(*) AS n_bigrams,
       round(AVG(ln((cbg + {k}) / (cpre + {k} * vv))), 6) AS mean_logp
FROM bg JOIN bgc USING (bg) JOIN prec USING (pre) CROSS JOIN v
GROUP BY doc_id
"""


def _ngram_lm_oracle(order=3, a=0.4):
    """DuckDB mirror of the order-N stupid-backoff score: identical
    rolled keys, identical guarded CASE chain, identical add-1 unigram
    floor — engine-identical at any rolled-key collision density."""
    from scespet_spark.operators.dedup import MH_PRIME, sh_coeff
    P = MH_PRIME
    N = order

    def roll(start, k):
        if k == 1:
            return f"hs[{start}]"
        terms = " + ".join(
            f"(hs[{start} + {j}] * {sh_coeff(j)}) % {P}" for j in range(k))
        return f"(({terms}) % {P})"

    wk = ",\n               ".join(
        f"{roll(f'i + {N - k}', k)} AS w{k}" for k in range(1, N + 1))
    pk = ",\n               ".join(
        f"{roll(f'i + {N - 1 - k}', k)} AS p{k}" for k in range(1, N))
    cnts = []
    for k in range(1, N + 1):
        if k == 1:
            cnts.append("cnt1 AS (SELECT h AS k1, COUNT(*) AS c\n"
                        "         FROM (SELECT unnest(hs) AS h FROM hs)"
                        " GROUP BY h)")
        else:
            cnts.append(
                f"cnt{k} AS (SELECT {roll('i', k)} AS k{k}, "
                f"COUNT(*) AS c\n"
                f"         FROM (SELECT hs, unnest(generate_series(1, "
                f"len(hs) - {k - 1})) AS i\n"
                f"               FROM hs WHERE len(hs) >= {k}) "
                f"GROUP BY 1)")
    joins = []
    for k in range(1, N + 1):
        joins.append(f"LEFT JOIN cnt{k} w{k}_ ON w{k}_.k{k} = occ.w{k}")
        if k < N:
            joins.append(f"LEFT JOIN cnt{k} p{k}_ ON p{k}_.k{k} = occ.p{k}")
    s = f"((coalesce(w1_.c, 0) + 1) / (tot.n + tot.v))"
    for k in range(2, N + 1):
        s = (f"CASE WHEN w{k}_.c IS NOT NULL AND p{k - 1}_.c IS NOT NULL"
             f" THEN w{k}_.c / p{k - 1}_.c ELSE {a} * ({s}) END")
    nl = chr(10)
    return f"""
WITH hs AS (SELECT doc_id,
                   list_transform({_TOKS},
                                  x -> {h64_sql('x')} % {P}) AS hs
            FROM documents),
occ AS (SELECT doc_id,
               {wk},
               {pk}
        FROM (SELECT doc_id, hs,
                     unnest(generate_series(1, len(hs) - {N - 1})) AS i
              FROM hs WHERE len(hs) >= {N})),
{("," + nl).join(cnts)},
tot AS (SELECT SUM(c) AS n, COUNT(*) AS v FROM cnt1)
SELECT doc_id, COUNT(*) AS n_ngrams,
       round(AVG(ln({s})), 6) AS mean_logp
FROM occ
{nl.join(joins)}
CROSS JOIN tot
GROUP BY doc_id
"""


@query("text_trigram_lm", _ngram_lm_oracle(3))
def text_trigram_lm(spark, sf_dir):
    """In-corpus TRIGRAM stupid-backoff LM score (r9 — the
    higher-order rung above text_bigram_lm; CCNet's real filter is a
    5-gram model, and this is the same Zipf-bounded count-table shape
    one order up): per-doc mean ln S(w | w-2, w-1) with Brants-style
    backoff (seen trigram ratio, else 0.4x the bigram ratio, else
    0.4^2 x an add-1 unigram floor — SQL-exact, unlike Kneser-Ney's
    discount recursion).  Digests end-to-end: one md5 per token, keys
    rolled arithmetically, five Zipf-bounded count joins."""
    from scespet_spark.operators.text import ngram_lm_score
    return ngram_lm_score(load_table(spark, sf_dir, "documents"))


@query("live_text_trigram_lm", _ngram_lm_oracle(3))
def live_text_trigram_lm(spark, sf_dir):
    """The snapshot trigram LM serving a LIVE crawl: the three count
    tables + totals are fitted ONCE batch-side (the snapshot
    artifact); arriving docs score via stream-static joins (unseen
    n-grams fall through the backoff chain to the always-finite
    unigram floor).  Same oracle — the stream replays the fit
    corpus."""
    from scespet_spark.operators.text import ngram_lm_apply, ngram_lm_model
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    model = ngram_lm_model(load_table(spark, sf_dir, "documents"))
    stream = read_table_stream(spark, sf_dir, "documents")
    return run_available_now(ngram_lm_apply(stream, model), "complete")


@query("perplexity_filter_trigram", f"""
WITH scores AS ({{lm}}),
thr AS (SELECT quantile_cont(mean_logp, 0.1) AS t FROM scores)
SELECT doc_id, n_ngrams, mean_logp
FROM scores, thr WHERE mean_logp >= t
""".format(lm=_ngram_lm_oracle(3)))
def perplexity_filter_trigram(spark, sf_dir):
    """The CCNet perplexity gate on the HIGHER-ORDER model (r9):
    perplexity_filter(order=3) drops the 10% tail of the trigram
    stupid-backoff score — same exact-percentile threshold shape as
    perplexity_filter_docs, one rung up the LM ladder."""
    from scespet_spark.operators.text import perplexity_filter
    return perplexity_filter(load_table(spark, sf_dir, "documents"),
                             frac=0.1, order=3)


@query("text_ngram_lm_order5", _ngram_lm_oracle(5))
def text_ngram_lm_order5(spark, sf_dir):
    """The order-5 stupid-backoff LM — CCNet's PRODUCTION filter shape
    (its perplexity model is a 5-gram LM): the same count-table fit
    one rung up (five Zipf-bounded tables from one localCheckpointed
    hash pass) and a 9-join apply whose guarded CASE chain backs off
    5-gram -> 4 -> 3 -> 2 -> add-1 unigram floor.  The order
    generalization is one code path (`ngram_lm_model(order=N)`), so
    the oracle is generated for the same N."""
    from scespet_spark.operators.text import ngram_lm_score
    return ngram_lm_score(load_table(spark, sf_dir, "documents"),
                          order=5)


@query("text_bigram_lm", _bigram_lm_oracle())
def text_bigram_lm(spark, sf_dir):
    """In-corpus bigram-LM quality score (CCNet perplexity filtering
    without an external model): add-1-smoothed mean log transition
    probability per doc; digests end-to-end, text never shuffles."""
    from scespet_spark.operators.text import bigram_lm_score
    return bigram_lm_score(load_table(spark, sf_dir, "documents"))


@query("live_text_bigram_lm", _bigram_lm_oracle())
def live_text_bigram_lm(spark, sf_dir):
    """The snapshot LM applied to a LIVE crawl stream: the model tables
    (bigram/prefix counts + vocabulary) are fitted ONCE from the batch
    corpus — the persisted snapshot artifact — and incoming documents
    score via stream-static joins as their micro-batches land (unseen
    bigrams coalesce to pure smoothing mass).  Same oracle as
    text_bigram_lm — the stream replays the same corpus, and the model
    was fitted on it."""
    from scespet_spark.operators.text import bigram_lm_apply, bigram_lm_model
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    model = bigram_lm_model(load_table(spark, sf_dir, "documents"))
    stream = read_table_stream(spark, sf_dir, "documents")
    return run_available_now(bigram_lm_apply(stream, model), "complete")
@query("perplexity_filter_docs", f"""
WITH scores AS ({{lm}}),
thr AS (SELECT quantile_cont(mean_logp, 0.1) AS t FROM scores)
SELECT doc_id, n_bigrams, mean_logp
FROM scores, thr WHERE mean_logp >= t
""".format(lm=_bigram_lm_oracle()))
def perplexity_filter_docs(spark, sf_dir):
    """CCNet-style perplexity filter: drop the 10% of documents with
    the lowest in-corpus bigram-LM mean log probability.  The threshold
    is an exact interpolated percentile (engine-exact vs quantile_cont,
    same contract as profile_lineitem) attached as a 1-row broadcast;
    approx=True is the 100 TB sketch path."""
    from scespet_spark.operators.text import perplexity_filter
    return perplexity_filter(load_table(spark, sf_dir, "documents"),
                             frac=0.1)


@query("live_perplexity_filter", _ORACLES["perplexity_filter_docs"])
def live_perplexity_filter(spark, sf_dir):
    """The full CCNet gate on a LIVE crawl: score each arriving doc
    against the snapshot LM (stream-static, as live_text_bigram_lm) and
    keep those at/above the snapshot's 10th-percentile threshold — the
    threshold is the second snapshot artifact (ONE number, computed
    batch-side with the exact percentile) applied as a map-side filter.
    Same oracle as perplexity_filter_docs: the stream replays the
    corpus the model and threshold were fitted on."""
    from scespet_spark.operators.text import (bigram_lm_apply,
                                              bigram_lm_model,
                                              bigram_lm_score)
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    model = bigram_lm_model(docs)
    thr = (bigram_lm_score(docs)
           .agg(F.percentile(F.col("mean_logp"), F.lit(0.1)))
           .collect()[0][0])                       # snapshot artifact
    stream = read_table_stream(spark, sf_dir, "documents")
    scored = bigram_lm_apply(stream, model)
    return run_available_now(
        scored.filter(F.col("mean_logp") >= F.lit(thr)), "complete")


#: deterministic split demo: 80/10/10 with the OPERATOR's own float
#: accumulation reproduced here (0.8 + 0.1 != 0.9 exactly in binary —
#: the oracle must embed the identical integer cutoffs)
_SPLIT_FRACS = {"train": 0.8, "val": 0.1, "test": 0.1}


def _split_cuts():
    cuts, cum = [], 0.0
    for name, frac in _SPLIT_FRACS.items():
        cum += frac
        cuts.append((name, round(cum * (1 << 20))))
    return cuts


@query("split_train_val_test", f"""
WITH b AS (SELECT doc_id, source,
                  ({h64_sql("doc_id::VARCHAR", seed=23)}) % {1 << 20} AS h
           FROM documents)
SELECT CASE {' '.join(f"WHEN h < {cut} THEN '{name}'"
                      for name, cut in _split_cuts())} END AS split,
       source, COUNT(*) AS n
FROM b GROUP BY 1, 2
""")
def split_train_val_test(spark, sf_dir):
    """Deterministic 80/10/10 dataset split assignment: hash-bucket
    ranges per split, reproducible across runs/engines/partitionings
    and stable under corpus growth (a doc's split never changes when
    other docs appear — frozen eval sets cannot leak into later train
    snapshots, the property randomSplit lacks).  Map-only expression;
    the demo reports per-(split, source) counts."""
    from scespet_spark.operators.pipeline import split_assign
    docs = load_table(spark, sf_dir, "documents")
    return (split_assign(docs, _SPLIT_FRACS)
            .groupBy("split", "source").agg(F.count("*").alias("n")))


@query("split_cluster_aware", f"""
WITH RECURSIVE {_minhash_ctes()},
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
cc(id, label) AS (
  SELECT DISTINCT src AS id, src AS label FROM edges
  UNION
  SELECT e.src AS id, c.label
  FROM edges e JOIN cc c ON e.dst = c.id
  WHERE c.label < e.src),
labels AS (SELECT id, MIN(label) AS cluster FROM cc GROUP BY id),
b AS (SELECT d.source, (l.id IS NOT NULL)::INT AS clustered,
             ({h64_sql("coalesce(l.cluster, d.doc_id)::VARCHAR", seed=23)})
               % {1 << 20} AS h
      FROM documents d LEFT JOIN labels l ON l.id = d.doc_id)
SELECT CASE {' '.join(f"WHEN h < {cut} THEN '{name}'"
                      for name, cut in _split_cuts())} END AS split,
       source, COUNT(*) AS n,
       CAST(SUM(clustered) AS BIGINT) AS n_clustered
FROM b GROUP BY 1, 2
""")
def split_cluster_aware(spark, sf_dir):
    """Cluster-aware train/val/test split (r11): the split hash is
    taken over each doc's near-dup CLUSTER representative (minhash-LSH
    connected components), so near-duplicates can never straddle an
    eval/train boundary — the prevention counterpart to the
    `split_leakage_report` detector.  Singletons hash on their own id,
    identical to plain `split_assign`.  Plan: one left equi-join
    against the label table (only docs in some candidate pair — the
    duplicate minority), then the same map-only bucket expression;
    the demo reports per-(split, source) counts plus how many docs
    were cluster-routed.

    r12 optimization (the r11 verdict's own note on this query: "the
    cost is the in-query iterative CC label build, not the operator —
    production amortizes labels as the clusters artifact"): the label
    table now comes from the full-corpus ``clusters`` snapshot artifact
    (`write_snapshot(cluster_labels=True)` / `read_clusters`, built
    once per process by `_full_cluster_snapshot`), so the registered
    plan is the production plan — one artifact scan + broadcast join +
    map-only bucket expression, no iterative CC in-query.  Labels are
    value-identical (same lsh_candidate_pairs/connected_components
    defaults inside the snapshot job)."""
    from scespet_spark.operators.pipeline import split_assign_by_cluster
    from scespet_spark.operators.snapshot import read_clusters
    docs = load_table(spark, sf_dir, "documents")
    labels = (read_clusters(spark, _full_cluster_snapshot(spark, sf_dir))
              .select("id", "cluster"))
    # the label table is the duplicate minority (thousands of rows
    # here) — broadcast kills both sort-merge Exchanges; the operator
    # default stays False for whale label tables
    out = split_assign_by_cluster(docs, _SPLIT_FRACS, labels,
                                  clustered_col="__clustered",
                                  broadcast_labels=True)
    return (out.groupBy("split", "source")
            .agg(F.count("*").alias("n"),
                 F.sum("__clustered").cast("long").alias("n_clustered")))


#: hashed-feature quality-classifier demo params: train split is
#: doc_id % 3 == 0 with label lang == 'en'; B buckets, alpha = 1
_QC_B = 1024

#: oracle CTEs for the fitted model (weights/unseen/bias) and the
#: scored target rows; {target} restricts the apply side
_QC_SQL = f"""WITH tok AS (SELECT doc_id, (lang = 'en')::INT AS y,
                    unnest({_TOKS}) AS tk
             FROM documents WHERE doc_id % 3 = 0),
cnt AS (SELECT ({h64_sql('tk')}) % {_QC_B} AS bucket,
               SUM(y) AS cp, SUM(1 - y) AS cn
        FROM tok GROUP BY 1),
tot AS (SELECT SUM(cp) AS tp, SUM(cn) AS tn FROM cnt),
w AS (SELECT bucket,
             ln((cp + 1.0) / (tp + {_QC_B}.0))
           - ln((cn + 1.0) / (tn + {_QC_B}.0)) AS w
      FROM cnt, tot),
wu AS (SELECT ln(1.0 / (tp + {_QC_B}.0)) - ln(1.0 / (tn + {_QC_B}.0)) AS w
       FROM tot),
bias AS (SELECT ln((SUM((lang = 'en')::INT) + 1.0)
              / (SUM((lang <> 'en')::INT) + 1.0)) AS b
         FROM documents WHERE doc_id % 3 = 0),
app AS (SELECT doc_id, ({h64_sql('tk')}) % {_QC_B} AS bucket
        FROM (SELECT doc_id, unnest({_TOKS}) AS tk
              FROM documents WHERE {{target}})),
sc AS (SELECT app.doc_id,
              round(avg(coalesce(w.w, (SELECT w FROM wu)))
                    + (SELECT b FROM bias), 6) AS score,
              COUNT(*) AS n_tokens
       FROM app LEFT JOIN w ON app.bucket = w.bucket
       GROUP BY app.doc_id)
SELECT doc_id, score, n_tokens, (score > 0.0)::INT AS pred FROM sc"""


@query("text_quality_classifier", _QC_SQL.format(target="doc_id % 3 <> 0"))
def text_quality_classifier(spark, sf_dir):
    """Model-based quality scoring (the rung above the heuristic score
    and the bigram LM): a hashed-feature linear classifier with
    NB log-count-ratio weights (fastText-style bag of buckets, NBSVM
    weights) fitted on the labeled train split (doc_id % 3 == 0,
    label = lang == 'en') and applied to the held-out docs.  Fit is one
    map-side-combinable token-count pass to a <= B-row weight table —
    the snapshot artifact; apply is a broadcast join + per-doc mean.
    No UDF anywhere; closed-form fit keeps both halves SQL-exact."""
    from scespet_spark.operators.text import (quality_classifier_apply,
                                              quality_classifier_fit)
    docs = load_table(spark, sf_dir, "documents")
    model = quality_classifier_fit(
        docs.filter(F.col("doc_id") % 3 == 0)
        .withColumn("label", (F.col("lang") == "en").cast("int")),
        n_buckets=_QC_B)
    return quality_classifier_apply(docs.filter(F.col("doc_id") % 3 != 0),
                                    model, n_buckets=_QC_B)


@query("live_quality_classifier", _QC_SQL.format(target="TRUE"))
def live_quality_classifier(spark, sf_dir):
    """The persisted quality classifier serving a LIVE crawl stream:
    the weight table (fitted once batch-side — the snapshot artifact)
    attaches to arriving documents via a broadcast stream-static join;
    bias and unseen-bucket weight are the two scalar model rows, read
    once driver-side.  Zero corpus passes at serve time.  Oracle =
    the batch apply over the full table the stream replays."""
    from scespet_spark.operators.text import (quality_classifier_apply,
                                              quality_classifier_fit)
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    model = quality_classifier_fit(
        docs.filter(F.col("doc_id") % 3 == 0)
        .withColumn("label", (F.col("lang") == "en").cast("int")),
        n_buckets=_QC_B)
    stream = read_table_stream(spark, sf_dir, "documents")
    return run_available_now(
        quality_classifier_apply(stream, model, n_buckets=_QC_B),
        "complete")


@query("text_collapse_repeats", f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents)
SELECT doc_id,
       array_to_string(
           list_filter(t, (x, i) -> i = 1 OR x <> t[i - 1]), ' ')
           AS clean_text,
       CAST(len(t) - len(list_filter(t, (x, i) -> i = 1 OR x <> t[i - 1]))
            AS BIGINT) AS n_removed
FROM toks
""")
def text_collapse_repeats(spark, sf_dir):
    """De-repetition cleaning: runs of immediately repeated tokens
    collapse to one occurrence (generation loops, scraper stutter) —
    an indexed-lambda array filter, map-only at any scale."""
    from scespet_spark.operators.text import collapse_repeats
    return collapse_repeats(load_table(spark, sf_dir, "documents")) \
        .select("doc_id", "clean_text", "n_removed")


_NGRAM_K = 5


@query("top_ngrams_source", f"""
WITH toks AS (SELECT source, {_TOKS} AS t FROM documents),
g AS (SELECT source, array_to_string(t[i:i + 1], ' ') AS ngram
      FROM (SELECT source, t, unnest(generate_series(1, len(t) - 1)) AS i
            FROM toks WHERE len(t) >= 2)),
c AS (SELECT source, ngram, COUNT(*) AS n FROM g GROUP BY source, ngram),
r AS (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY n DESC, ngram ASC) AS rank
      FROM c)
SELECT source, ngram, n, rank FROM r WHERE rank <= {_NGRAM_K}
""")
def top_ngrams_source(spark, sf_dir):
    """Per-source top-k bigram report (vocabulary drift / boilerplate
    triage): combinable n-gram count, then a top-k window over the
    count table only — the fact rows never sort."""
    from scespet_spark.operators.text import top_ngrams
    return top_ngrams(load_table(spark, sf_dir, "documents"),
                      n=2, k=_NGRAM_K)


_QUOTA_N = 10


def _quota_oracle(q=_QUOTA_N):
    hh = h64_sql("doc_id::VARCHAR", seed=7)
    return f"""
WITH h AS (SELECT *, ({hh}) % 1048576 AS __hh FROM documents),
r AS (SELECT *, row_number() OVER (PARTITION BY source
                                   ORDER BY __hh, doc_id) AS __rk
      FROM h)
SELECT doc_id, text, lang, source, n_chars FROM r WHERE __rk <= {q}
"""


@query("sample_source_quota", _quota_oracle())
def sample_source_quota(spark, sf_dir):
    """Per-source quota cap (the domain-mix step): deterministic
    hash-ordered top-``quota`` per source.  The implementation prefilters
    with a broadcast count-derived cutoff (O(quota) window input per
    source) plus an exactness fallback for under-filled sources, so the
    oracle is the plain global-rank DEFINITION of the operator — not a
    mirror of the pipeline."""
    from scespet_spark.operators.text import source_quota_sample
    docs = load_table(spark, sf_dir, "documents")
    return source_quota_sample(docs, _QUOTA_N)


@query("doc_chunking", f"""
WITH t AS (SELECT doc_id, {_TOKS} AS tk FROM documents),
n AS (SELECT doc_id, tk,
             greatest(CAST(ceil((len(tk) - 16) / 12.0) AS INT) + 1, 1) AS nc
      FROM t),
e AS (SELECT doc_id, tk, unnest(generate_series(0, nc - 1)) AS chunk_idx
      FROM n)
SELECT doc_id, chunk_idx,
       array_to_string(list_slice(tk, chunk_idx * 12 + 1,
                                  chunk_idx * 12 + 16), ' ') AS chunk_text,
       least(16, len(tk) - chunk_idx * 12) AS n_tokens
FROM e
""")
def doc_chunking(spark, sf_dir):
    """Token-window chunking with overlap — the one-to-many (UDTF-shaped)
    training-prep step, pure sequence+explode (map-only at any scale)."""
    from scespet_spark.operators.text import chunk_documents
    out = chunk_documents(load_table(spark, sf_dir, "documents"),
                          size=16, overlap=4)
    return out.select("doc_id", F.col("chunk_idx").cast("long").alias("chunk_idx"),
                      "chunk_text", F.col("n_tokens").cast("long").alias("n_tokens"))


_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PHONE_RE = r"\+?\d[\d\s().-]{7,}\d"
_IP_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


@query("redact_pii", f"""
WITH t0 AS (
  SELECT doc_id,
         text || ' contact_' || CAST(doc_id AS VARCHAR) || '@example.com'
           AS t
  FROM documents),
t1 AS (SELECT doc_id, t,
              regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g') AS r1,
              len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n1 FROM t0),
t2 AS (SELECT doc_id, r1,
              regexp_replace(r1, '{_PHONE_RE}', '<PHONE>', 'g') AS r2,
              n1 + len(regexp_extract_all(r1, '{_PHONE_RE}')) AS n2 FROM t1),
t3 AS (SELECT doc_id,
              regexp_replace(r2, '{_IP_RE}', '<IP>', 'g') AS clean_text,
              n2 + len(regexp_extract_all(r2, '{_IP_RE}')) AS n_redactions
       FROM t2)
SELECT doc_id, clean_text, CAST(n_redactions AS INT) AS n_redactions FROM t3
""")
def redact_pii(spark, sf_dir):
    """PII-style redaction (email/phone/IP) as chained codegen
    regexp_replace — map-only at any scale.  A synthetic per-doc email
    is appended so the rule actually fires on the clean corpus."""
    from scespet_spark.operators.text import redact
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "text", F.concat(F.col("text"), F.lit(" contact_"),
                         F.col("doc_id").cast("string"),
                         F.lit("@example.com")))
    return redact(docs).select("doc_id", "clean_text", "n_redactions")


@query("stratified_sample_docs", f"""
SELECT doc_id, lang
FROM documents
WHERE ({h64_sql('CAST(doc_id AS VARCHAR)')}) % 10000
      < (CASE WHEN lang = 'en' THEN 2000 ELSE 5000 END)
""")
def stratified_sample_docs(spark, sf_dir):
    """Deterministic hash-based stratified sampling: downsample dominant
    'en' to 20%, keep 50% elsewhere — reproducible across runs/engines/
    partitionings (auditable pipelines can't use rand())."""
    from scespet_spark.operators.text import stratified_sample
    out = stratified_sample(load_table(spark, sf_dir, "documents"),
                            "lang", {"en": 0.2}, default_rate=0.5)
    return out.select("doc_id", "lang")


@query("multimodal_decode", """
SELECT doc_id,
       CAST(64 + ('0x' || substr(md5(text), 1, 2))::INT % 192 AS INT) AS width,
       CAST(64 + ('0x' || substr(md5(text), 3, 2))::INT % 192 AS INT) AS height,
       octet_length(encode(text))::BIGINT AS n_bytes,
       md5(text) AS sig
FROM documents
""")
def multimodal_decode(spark, sf_dir):
    from scespet_spark.operators.multimodal import attach_payload, decode_images
    docs = load_table(spark, sf_dir, "documents")
    return decode_images(attach_payload(docs))


@query("live_multimodal_decode", _ORACLES["multimodal_decode"])
def live_multimodal_decode(spark, sf_dir):
    """Multimodal decode on a LIVE ingest stream: the Arrow
    ``mapInPandas`` decode stage runs unchanged inside the streaming
    plan (binary payloads decoded micro-batch by micro-batch as crawl
    files land) — same operator, same oracle."""
    from scespet_spark.operators.multimodal import (attach_payload,
                                                    decode_images)
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    stream = read_table_stream(spark, sf_dir, "documents")
    return run_available_now(decode_images(attach_payload(stream)), "append")


@query("multimodal_resize", """
WITH d AS (
  SELECT doc_id,
         CAST(64 + ('0x' || substr(md5(text), 1, 2))::INT % 192 AS INT)
           AS width,
         CAST(64 + ('0x' || substr(md5(text), 3, 2))::INT % 192 AS INT)
           AS height,
         md5(text) AS sig
  FROM documents)
SELECT doc_id, width, height,
       CAST(width * 128 // greatest(width, height) AS INT) AS out_w,
       CAST(height * 128 // greatest(width, height) AS INT) AS out_h,
       md5(sig || '#128') AS resized_sig
FROM d
""")
def multimodal_resize(spark, sf_dir):
    """Decode + aspect-preserving resize fused in one Arrow pass —
    integer-arithmetic target dims, stubbed pixel kernel (PIL absent in
    container; Spark-side schema/batching/fusion real)."""
    from scespet_spark.operators.multimodal import attach_payload, resize_images
    docs = load_table(spark, sf_dir, "documents")
    return resize_images(attach_payload(docs), max_side=128)


@query("multimodal_audio_features", """
WITH d AS (
  SELECT doc_id, md5(text) AS sig,
         CAST(8000 + ('0x' || substr(md5(text), 5, 2))::INT % 4 * 8000
              AS INT) AS sample_rate,
         CAST(octet_length(encode(text)) * 10 % 60000 + 1000 AS BIGINT)
           AS duration_ms
  FROM documents)
SELECT doc_id, sample_rate, duration_ms,
       CAST(unnest(generate_series(0, duration_ms // 1000)) AS BIGINT)
         AS frame_idx,
       ('0x' || substr(md5(sig || ':' ||
                           unnest(generate_series(0, duration_ms // 1000))),
                       1, 4))::INT % 1000 / 1000.0 AS energy
FROM d
""")
def multimodal_audio_features(spark, sf_dir):
    """Audio feature extraction (one-to-many frame expansion) through
    the Arrow mapInPandas shape — per-frame energy rows; codec stubbed
    (ffmpeg/torchaudio absent), expansion/batching/schema real."""
    from scespet_spark.operators.multimodal import attach_payload, audio_features
    docs = load_table(spark, sf_dir, "documents")
    return audio_features(attach_payload(docs), frame_ms=1000)


@query("multimodal_frame_sample", """
WITH b AS (SELECT doc_id, text,
                  octet_length(encode(text)) % 90 + 10 AS n_frames
           FROM documents)
SELECT doc_id,
       CAST(unnest(generate_series(0, n_frames - 1, 10)) AS BIGINT)
         AS frame_idx,
       md5(text || '#') AS stream_sig
FROM b
""")
def multimodal_frame_sample(spark, sf_dir):
    from scespet_spark.operators.multimodal import attach_payload, frame_sample
    docs = load_table(spark, sf_dir, "documents")
    out = frame_sample(attach_payload(docs))
    return out.withColumn("frame_idx", F.col("frame_idx").cast("long"))


@query("decontaminate_eval_overlap", f"""
WITH hs AS (SELECT doc_id,
                   list_transform({_TOKS},
                                  x -> {{h64x}} % {{p}}) AS hs
            FROM documents),
sh AS (SELECT doc_id, {_shingle_hash_sql()} AS s FROM hs),
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 19 = 0),
tr AS (SELECT DISTINCT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 19 <> 0)
SELECT doc_id, COUNT(*) AS n_hit_ngrams
FROM tr JOIN ev USING (g) GROUP BY doc_id
""".format(h64x=h64_sql('x'), p=2**31 - 1))
def decontaminate_eval_overlap(spark, sf_dir):
    """Train/eval decontamination: docs sharing any word 3-gram with the
    (broadcast) benchmark set.  Pseudo-benchmark = doc_id % 19 == 0."""
    from scespet_spark.operators.pipeline import decontaminate
    docs = load_table(spark, sf_dir, "documents")
    return decontaminate(docs.filter(F.col("doc_id") % 19 != 0),
                         docs.filter(F.col("doc_id") % 19 == 0))


@query("contamination_fraction_docs", f"""
WITH hs AS (SELECT doc_id,
                   list_transform({_TOKS},
                                  x -> {{h64x}} % {{p}}) AS hs
            FROM documents),
sh AS (SELECT doc_id, {_shingle_hash_sql()} AS s FROM hs),
ev AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 19 = 0),
tr AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 19 <> 0)
SELECT tr.doc_id, COUNT(*) AS n_ngrams,
       CAST(SUM(CASE WHEN ev.g IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS n_hit,
       round(CAST(SUM(CASE WHEN ev.g IS NULL THEN 0 ELSE 1 END) AS DOUBLE)
             / COUNT(*), 6) AS frac_contaminated
FROM tr LEFT JOIN ev ON tr.g = ev.g
GROUP BY tr.doc_id
""".format(h64x=h64_sql('x'), p=2**31 - 1))
def contamination_fraction_docs(spark, sf_dir):
    """Graded contamination: per-doc fraction of distinct 3-grams
    shared with the benchmark set (the GPT-3/PaLM overlap metric) for
    EVERY training doc — broadcast digest set, one map-side corpus
    pass, hit and total counts in the same aggregate."""
    from scespet_spark.operators.pipeline import contamination_fraction
    docs = load_table(spark, sf_dir, "documents")
    return contamination_fraction(docs.filter(F.col("doc_id") % 19 != 0),
                                  docs.filter(F.col("doc_id") % 19 == 0))


@query("live_contamination_fraction",
       _ORACLES["contamination_fraction_docs"])
def live_contamination_fraction(spark, sf_dir):
    """Graded contamination on the LIVE crawl: each arriving doc's
    n-gram overlap fraction vs the broadcast benchmark digest set —
    same one-pass aggregate as batch, per micro-batch (complete mode);
    the stream replays the corpus, so the batch oracle applies."""
    from scespet_spark.operators.pipeline import contamination_fraction
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    stream = read_table_stream(spark, sf_dir, "documents")
    out = contamination_fraction(stream.filter(F.col("doc_id") % 19 != 0),
                                 docs.filter(F.col("doc_id") % 19 == 0))
    return run_available_now(out, "complete")


@query("live_decontaminate", _ORACLES["decontaminate_eval_overlap"])
def live_decontaminate(spark, sf_dir):
    """Decontamination on a LIVE crawl stream: the benchmark digest set
    is the batch-side artifact (broadcast into the stream-static join);
    incoming docs are flagged row-by-row as their micro-batches land.
    Same operator, same oracle — the stream replays the same corpus."""
    from scespet_spark.operators.pipeline import decontaminate
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    stream = read_table_stream(spark, sf_dir, "documents")
    out = decontaminate(stream.filter(F.col("doc_id") % 19 != 0),
                        docs.filter(F.col("doc_id") % 19 == 0))
    return run_available_now(out, "complete")


@query("dedup_incremental", f"""
WITH newd AS (SELECT doc_id, {h64_sql('text')} AS content_hash
              FROM documents WHERE doc_id % 3 <> 0),
prior AS (SELECT DISTINCT {h64_sql('text')} AS content_hash
          FROM documents WHERE doc_id % 3 = 0)
SELECT MIN(doc_id) AS doc_id, content_hash
FROM newd WHERE content_hash NOT IN (SELECT content_hash FROM prior)
GROUP BY content_hash
""")
def dedup_incremental(spark, sf_dir):
    """Cross-snapshot incremental dedup: a new crawl batch
    (doc_id % 3 != 0) anti-joined against the prior kept corpus's digest
    set (doc_id % 3 == 0) plus within-batch first-wins — the
    continuous-corpus-build shape where BOTH sides are too large to
    broadcast (shuffle hash anti-join on 60-bit digests)."""
    from scespet_spark.operators.dedup import incremental_keep
    docs = load_table(spark, sf_dir, "documents")
    return incremental_keep(docs.filter(F.col("doc_id") % 3 != 0),
                            docs.filter(F.col("doc_id") % 3 == 0))


@query("live_dedup_exact",
       f"SELECT DISTINCT {h64_sql('text')} AS content_hash FROM documents")
def live_dedup_exact(spark, sf_dir):
    """Streaming exact dedup: the documents table as a file-stream
    (a crawl landing as parquet drops), first occurrence of each
    content digest emitted, duplicates suppressed across micro-batches
    via streaming dropDuplicates.  State is the digest set itself —
    identical to batch exact dedup's reduction, held in the state store
    (RocksDB at cluster scale); no watermark because corpus identity
    has no event-time horizon.  The oracle is the distinct digest SET
    (which physical row survives a tie is not part of the contract)."""
    from scespet_spark.operators.hashing import h64
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    src = read_table_stream(spark, sf_dir, "documents")
    dd = (src.select(h64(F.col("text")).alias("content_hash"))
          .dropDuplicates(["content_hash"]))
    return run_available_now(dd, "append")


@query("live_dedup_exact_wide", f"""
SELECT DISTINCT {h64_sql('text')} AS content_hash,
                {h64hi_sql('text')} AS content_hash2
FROM documents
""")
def live_dedup_exact_wide(spark, sf_dir):
    """Streaming exact dedup on the WIDE two-digest key (r9
    digest-width discipline): the election state keys on BOTH
    independent digests — the live counterpart of dedup_exact_wide,
    and the reason the live election APIs are key-arity agnostic.  At
    100 TB the state store holds (2x64-bit, flag) entries; a narrow
    60-bit key would silently suppress ~2^12 innocent first
    occurrences (SCALE.md birthday table)."""
    from scespet_spark.operators.dedup import digest_cols
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    src = read_table_stream(spark, sf_dir, "documents")
    d1, d2 = digest_cols(F.col("text"), wide=True)
    dd = (src.select(d1.alias("content_hash"), d2.alias("content_hash2"))
          .dropDuplicates(["content_hash", "content_hash2"]))
    return run_available_now(dd, "append")


@query("dedup_incremental_near", f"""
WITH {{ctes}}
SELECT n.doc_id, COUNT(DISTINCT n.band) AS n_hit_bands
FROM banded n
JOIN (SELECT DISTINCT band, band_hash FROM banded WHERE doc_id % 3 = 0) p
  USING (band, band_hash)
WHERE n.doc_id % 3 <> 0
GROUP BY n.doc_id
""".format(ctes=_minhash_ctes()))
def dedup_incremental_near(spark, sf_dir):
    """Near-dup counterpart of dedup_incremental: new-batch docs
    (doc_id % 3 != 0) that LSH-collide with the prior corpus's banded
    signature table (doc_id % 3 == 0) — a band-key equi-join probe; at
    100 TB the prior table is the materialized snapshot index, never
    re-minhashed."""
    from scespet_spark.operators.dedup import incremental_near_dup
    docs = load_table(spark, sf_dir, "documents")
    return incremental_near_dup(docs.filter(F.col("doc_id") % 3 != 0),
                                docs.filter(F.col("doc_id") % 3 == 0))


@query("dedup_incremental_near_bloom", _ORACLES["dedup_incremental_near"])
def dedup_incremental_near_bloom(spark, sf_dir):
    """dedup_incremental_near through the snapshot's band Bloom (r10):
    the filter keys on the derived single-column band key
    (`dedup.band_bloom_key` — the same expression builds and probes),
    new band rows the sketch rules out of the prior never enter the
    probe join, and the residue broadcasts into the prior band table.
    Row-identical to the plain probe at any fpp (a false-positive band
    row joins and finds nothing) — same oracle.

    r12 optimization: the prior band table AND its Bloom now come from
    the snapshot artifacts (`read_snapshot`/`read_bloom` over
    `_artifact_snapshot`, which writes ``bloom_fpp=0.01`` under the
    shared `_bloom_probe_key` derivation) instead of re-banding the
    prior and re-building the filter in-query — the registered plan is
    the production serving plan (probe artifacts are write-once,
    probed per drop).  Output is row-identical: same banding params,
    same key expression, and ANY filter bits yield the same rows (a
    false positive joins and finds nothing; the artifact filter holds
    every prior key, so no false negatives by construction)."""
    from scespet_spark.operators.dedup import incremental_near_dup
    from scespet_spark.operators.snapshot import read_bloom, read_snapshot
    docs = load_table(spark, sf_dir, "documents")
    snap = _artifact_snapshot(spark, sf_dir)
    pb = read_snapshot(spark, snap)["bands"]
    bloom = read_bloom(spark, snap, "bands")
    return incremental_near_dup(docs.filter(F.col("doc_id") % 3 != 0),
                                prior_bands=pb, prior_bloom=bloom)


def _winnow_ctes(n=3, w=4):
    from scespet_spark.operators.dedup import MH_PRIME, sh_coeff
    terms = " + ".join(
        f"(coalesce(hs[i + {j}], 0) * {sh_coeff(j)}) % {MH_PRIME}"
        for j in range(n))
    return f"""
hs AS (SELECT doc_id,
              list_transform({_TOKS},
                             x -> {h64_sql('x')} % {MH_PRIME}) AS hs
       FROM documents),
sh AS (SELECT doc_id,
              list_transform(generate_series(1, greatest(len(hs) - {n - 1}, 1)),
                             i -> ({terms}) % {MH_PRIME}) AS sh
       FROM hs),
fp AS (SELECT doc_id, unnest(
           list_distinct(list_transform(
               generate_series(1, greatest(len(sh) - {w - 1}, 1)),
               i -> list_aggregate(sh[i:i + {w - 1}], 'min')))) AS fingerprint
       FROM sh)
"""


@query("text_winnow_fingerprints", f"""
WITH {_winnow_ctes()}
SELECT doc_id, fingerprint FROM fp
""")
def text_winnow_fingerprints(spark, sf_dir):
    """Winnowing (MOSS) fingerprints: min shingle digest per sliding
    window, distinct per doc — any shared passage of >= window +
    shingle_n - 1 tokens is guaranteed a shared fingerprint at ~2/(w+1)
    the storage; map-side codegen arithmetic end-to-end."""
    from scespet_spark.operators.dedup import winnow_fingerprints
    return winnow_fingerprints(load_table(spark, sf_dir, "documents"))


@query("dedup_winnow_pairs", f"""
WITH {_winnow_ctes()},
rare AS (SELECT fingerprint FROM fp GROUP BY fingerprint
         HAVING COUNT(DISTINCT doc_id) <= 100),
j AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM fp a JOIN fp b USING (fingerprint)
      JOIN rare USING (fingerprint)
      WHERE a.doc_id < b.doc_id)
SELECT id_a, id_b, COUNT(*) AS n_shared
FROM j GROUP BY id_a, id_b HAVING COUNT(*) >= 2
""")
def dedup_winnow_pairs(spark, sf_dir):
    """Passage-overlap candidates: docs sharing >= 2 winnowed
    fingerprints (one copied paragraph inside otherwise-different docs
    — the case whole-doc MinHash misses).  Fingerprint equi-join,
    linear in overlap density; ubiquitous fingerprints (doc-freq >
    max_df) dropped first, the MOSS boilerplate cap."""
    from scespet_spark.operators.dedup import winnow_overlap_pairs
    return winnow_overlap_pairs(load_table(spark, sf_dir, "documents"))


_SEG_SIZE = 10

_SEG_CTES = f"""
toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
seg AS (SELECT doc_id, i AS seg_idx,
               array_to_string(t[(i * {_SEG_SIZE} + 1):((i + 1) * {_SEG_SIZE})],
                               ' ') AS seg
        FROM (SELECT doc_id, t,
                     unnest(generate_series(
                         0, CAST(ceil(len(t) / {_SEG_SIZE}.0) AS INT) - 1)) AS i
              FROM toks WHERE len(t) > 0))
"""


@query("live_dedup_segments", f"""
WITH {_SEG_CTES},
w AS (SELECT doc_id, seg_idx, {h64_sql('seg')} AS segment_hash,
             row_number() OVER (PARTITION BY {h64_sql('seg')}
                                ORDER BY doc_id, seg_idx) AS rk
      FROM seg)
SELECT doc_id, seg_idx, segment_hash FROM w WHERE rk = 1
""")
def live_dedup_segments(spark, sf_dir):
    """Streaming segment (line-level) dedup election: the crawl stream
    explodes map-side to (doc_id, seg_idx, digest) — text never enters
    the exchange — and ``first_wins`` elects each digest's winner with
    deterministic order (arrival drop first, then min (doc_id,
    seg_idx) within it), so the single-drop source is row-identical to
    batch segment_dedup's election.  Cross-drop suppression is pinned
    by test_streaming_first_wins_across_micro_batches.  State per
    digest is one flag in the state store."""
    from scespet_spark.operators.dedup import segment_digests
    from scespet_spark.streaming.live import (first_wins,
                                              read_table_stream,
                                              run_available_now)
    src = read_table_stream(spark, sf_dir, "documents")
    segs = (segment_digests(src, size=_SEG_SIZE)
            .select("doc_id", F.col("seg_idx").cast("long").alias("seg_idx"),
                    F.col("__d").alias("segment_hash")))
    out = first_wins(segs, keys=["segment_hash"],
                     order_cols=["doc_id", "seg_idx"],
                     payload_cols=["doc_id", "seg_idx"])
    return run_available_now(out, "append").select(
        "doc_id", "seg_idx", "segment_hash")


@query("dedup_segments", f"""
WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
seg AS (SELECT doc_id, i AS seg_idx,
               array_to_string(t[(i * {_SEG_SIZE} + 1):((i + 1) * {_SEG_SIZE})],
                               ' ') AS seg
        FROM (SELECT doc_id, t,
                     unnest(generate_series(
                         0, CAST(ceil(len(t) / {_SEG_SIZE}.0) AS INT) - 1)) AS i
              FROM toks WHERE len(t) > 0)),
w AS (SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY {h64_sql('seg')}
                                ORDER BY doc_id, seg_idx) AS rk
      FROM seg),
tot AS (SELECT doc_id, COUNT(*) AS n_segments FROM seg GROUP BY doc_id)
SELECT w.doc_id,
       string_agg(w.seg, ' ' ORDER BY w.seg_idx) AS clean_text,
       COUNT(*) AS n_kept,
       CAST(any_value(tot.n_segments) AS BIGINT) AS n_segments
FROM w JOIN tot ON w.doc_id = tot.doc_id
WHERE w.rk = 1
GROUP BY w.doc_id
""")
def dedup_segments(spark, sf_dir):
    """C4/RefinedWeb-style line-level dedup, re-expressed for the
    token corpus as fixed {size}-token segments: every segment whose
    digest occurred earlier in the corpus (first occurrence by
    (doc_id, seg_idx)) is removed and the survivors reassembled.
    Winner election shuffles (digest, id, idx) ints only; segment text
    never enters an Exchange — it is re-derived map-side from the
    original doc row after the kept-index list joins back."""
    from scespet_spark.operators.dedup import segment_dedup
    return segment_dedup(load_table(spark, sf_dir, "documents"),
                         size=_SEG_SIZE)


@query("dedup_incremental_segments", f"""
WITH {_SEG_CTES},
h AS (SELECT doc_id, seg_idx, seg, {h64_sql('seg')} AS d FROM seg),
pri AS (SELECT DISTINCT d FROM h WHERE doc_id % 3 = 0),
neu AS (SELECT * FROM h WHERE doc_id % 3 <> 0
        AND d NOT IN (SELECT d FROM pri)),
w AS (SELECT *, row_number() OVER (PARTITION BY d
                                   ORDER BY doc_id, seg_idx) AS rk
      FROM neu),
tot AS (SELECT doc_id, COUNT(*) AS n_segments FROM seg
        WHERE doc_id % 3 <> 0 GROUP BY doc_id)
SELECT w.doc_id,
       string_agg(w.seg, ' ' ORDER BY w.seg_idx) AS clean_text,
       COUNT(*) AS n_kept,
       CAST(any_value(tot.n_segments) AS BIGINT) AS n_segments
FROM w JOIN tot ON w.doc_id = tot.doc_id
WHERE w.rk = 1
GROUP BY w.doc_id
""")
def dedup_incremental_segments(spark, sf_dir):
    """Cross-snapshot segment dedup: a new crawl batch
    (doc_id % 3 != 0) cleaned against the prior corpus's segment-digest
    table (doc_id % 3 == 0) — digest-vs-digest shuffle anti-join,
    neither side broadcast, then the ints-only within-batch election.
    Completes the incremental family: exact, near, embedding,
    segments."""
    from scespet_spark.operators.dedup import incremental_segment_dedup
    docs = load_table(spark, sf_dir, "documents")
    return incremental_segment_dedup(
        docs.filter(F.col("doc_id") % 3 != 0),
        prior=docs.filter(F.col("doc_id") % 3 == 0), size=_SEG_SIZE)


#: deterministic URL-shaped column over `documents` for the URL-dedup
#: demo: spelling variants (case, www, default port, trailing slash,
#: fragment, tracking/query-order noise) that canonicalize together
_URL_SPARK = None  # built in the query (needs F)
_URL_SQL = """'https://WWW.Example.com:443/' || lang
  || '/Page' || (doc_id % 7)::VARCHAR
  || CASE doc_id % 4
       WHEN 0 THEN '/?utm_source=feed&b=2&a=1&ref=' || (doc_id % 5)::VARCHAR
       WHEN 1 THEN '/?a=1&b=2'
       WHEN 2 THEN '/#frag'
       ELSE '' END"""

#: DuckDB mirror of dedup.canonical_url over a column named url
_CANON_SQL = r"""CASE WHEN lower(regexp_extract(url,
         '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*).*$', 1)) <> ''
   AND regexp_extract(url,
         '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*).*$', 2) <> ''
  THEN lower(regexp_extract(url,
         '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*).*$', 1))
    || '://'
    || regexp_replace(regexp_replace(lower(regexp_extract(url,
         '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*).*$', 2)),
         '^www\.', ''), ':(80|443)$', '')
    || regexp_replace(regexp_extract(url,
         '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*).*$', 3), '/+$', '')
    || CASE WHEN array_to_string(list_sort(list_filter(
              string_split(regexp_extract(url, '^[^?#]*\?([^#]*).*$', 1),
                           '&'),
              x -> x <> '' AND NOT regexp_matches(x,
                   '^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)='))),
              '&') <> ''
       THEN '?' || array_to_string(list_sort(list_filter(
              string_split(regexp_extract(url, '^[^?#]*\?([^#]*).*$', 1),
                           '&'),
              x -> x <> '' AND NOT regexp_matches(x,
                   '^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)='))),
              '&')
       ELSE '' END
  ELSE NULL END"""


def _demo_url_col():
    """The deterministic URL-variant column (Spark side of _URL_SQL)."""
    return F.concat(
        F.lit("https://WWW.Example.com:443/"),
        F.col("lang"), F.lit("/Page"), (F.col("doc_id") % 7).cast("string"),
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("/?utm_source=feed&b=2&a=1&ref="),
                        (F.col("doc_id") % 5).cast("string")))
        .when(F.col("doc_id") % 4 == 1, F.lit("/?a=1&b=2"))
        .when(F.col("doc_id") % 4 == 2, F.lit("/#frag"))
        .otherwise(F.lit("")))


@query("dedup_url_canonical", f"""
WITH urls AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
c AS (SELECT doc_id, {_CANON_SQL} AS canon_url FROM urls)
SELECT canon_url, MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM c WHERE canon_url IS NOT NULL GROUP BY canon_url
""")
def dedup_url_canonical(spark, sf_dir):
    """URL canonicalization + first-wins URL dedup — the cheapest
    high-yield dedup signal a crawl pipeline applies before any content
    hashing: case/www/default-port/trailing-slash/fragment noise and
    tracking or reordered query params all collapse to one canonical
    key (dedup.canonical_url, pure codegen regexp/array expressions),
    then one combinable groupBy elects the min-id representative per
    canonical URL with the spelling-variant count."""
    from scespet_spark.operators.dedup import url_dedup
    docs = load_table(spark, sf_dir, "documents")
    return url_dedup(docs.withColumn("url", _demo_url_col()))


@query("live_dedup_url", f"""
WITH urls AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
c AS (SELECT doc_id, {_CANON_SQL} AS canon_url FROM urls)
SELECT canon_url, MIN(doc_id) AS doc_id
FROM c WHERE canon_url IS NOT NULL GROUP BY canon_url
""")
def live_dedup_url(spark, sf_dir):
    """The URL-canonical gate on a LIVE crawl: arriving documents map
    to their canonical URL (same codegen expression — map-only on the
    stream) and first_wins elects one winner per canonical key across
    micro-batches, suppressing every later spelling variant.  Arrival
    order decides across drops, min doc_id within a drop — on the
    single-drop replay this equals the batch min-id election."""
    from scespet_spark.operators.dedup import canonical_url
    from scespet_spark.streaming.live import (first_wins,
                                              read_table_stream,
                                              run_available_now)
    stream = (read_table_stream(spark, sf_dir, "documents")
              .withColumn("url", _demo_url_col())
              .withColumn("canon_url", canonical_url(F.col("url")))
              .filter(F.col("canon_url").isNotNull()))
    out = first_wins(stream, keys=["canon_url"], order_cols=["doc_id"],
                     payload_cols=["doc_id"], t="doc_id")
    return run_available_now(out, "append").select("canon_url", "doc_id")


#: exact-substring dedup gram length (tokens) — the "min matched
#: substring" L of the suffix-array dedup family
_SUB_L = 15

#: shared oracle CTEs: positional L-gram digest table over `documents`
#: (one row per token position of docs with >= L tokens)
_GRAM_CTES = f"""toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
g AS (SELECT doc_id, i AS pos,
             {h64_sql(f"array_to_string(t[i:i + {_SUB_L} - 1], ' ')")} AS d
      FROM (SELECT doc_id, t,
                   unnest(generate_series(1, len(t) - {_SUB_L} + 1)) AS i
            FROM toks WHERE len(t) >= {_SUB_L}))"""

#: shared oracle tail: duplicate occurrences `dup(doc_id, pos)` ->
#: coverage -> per-token anti-join -> reassembled survivors (docs
#: restricted by {where} on the doc side)
_SUB_TAIL = """cov AS (SELECT DISTINCT doc_id, pos + u AS p
        FROM (SELECT doc_id, pos,
                     unnest(generate_series(0, {L} - 1)) AS u FROM dup)),
tp AS (SELECT doc_id, unnest(t) AS tok,
              unnest(generate_series(1, len(t))) AS p
       FROM toks WHERE {where}),
kept AS (SELECT tp.doc_id, tp.tok, tp.p
         FROM tp LEFT JOIN cov ON tp.doc_id = cov.doc_id AND tp.p = cov.p
         WHERE cov.p IS NULL),
n AS (SELECT doc_id, len(t) AS n_tokens FROM toks WHERE {where})
SELECT n.doc_id,
       coalesce(string_agg(kept.tok, ' ' ORDER BY kept.p), '') AS clean_text,
       CAST(n.n_tokens AS BIGINT) AS n_tokens,
       CAST(n.n_tokens - COUNT(kept.p) AS BIGINT) AS n_removed
FROM n LEFT JOIN kept ON n.doc_id = kept.doc_id
GROUP BY n.doc_id, n.n_tokens"""


@query("dedup_substring", f"""
WITH {_GRAM_CTES},
dup AS (SELECT doc_id, pos FROM
        (SELECT doc_id, pos,
                row_number() OVER (PARTITION BY d
                                   ORDER BY doc_id, pos) AS rk
         FROM g) WHERE rk > 1),
{_SUB_TAIL.format(L=_SUB_L, where="TRUE")}
""")
def dedup_substring(spark, sf_dir):
    """Exact-substring dedup (suffix-array family, Lee et al. 2021):
    every arbitrary-offset repeated substring of >= {_SUB_L} tokens is
    cut from all but its globally-first occurrence — duplicate-marking
    overlapping L-grams is exactly the suffix-array semantics,
    re-expressed as a distributable first-occurrence election
    (dedup.substring_dedup docstring has the equivalence argument).
    Election shuffles (digest, id, pos) ints only; rebuild is
    O(tokens + cuts) map-side via the fixed-length-interval gap
    complement."""
    from scespet_spark.operators.dedup import substring_dedup
    return substring_dedup(load_table(spark, sf_dir, "documents"),
                           min_len=_SUB_L)


@query("live_substring_probe", f"""
WITH {_GRAM_CTES},
pri AS (SELECT DISTINCT d FROM g WHERE doc_id % 3 = 0)
SELECT doc_id, pos FROM g
WHERE doc_id % 3 <> 0 AND d IN (SELECT d FROM pri)
""")
def live_substring_probe(spark, sf_dir):
    """The substring-dedup snapshot probe on a LIVE crawl: arriving
    docs hash to positional gram digests map-side (gram_digests is
    streaming-legal — staged-array transforms + posexplode, no
    shuffle) and a stream-static semi-join against the prior corpus's
    gram table emits every (doc, pos) whose passage the corpus already
    contains — the serving-mode "which spans of this page are already
    known" signal (contamination detection / pre-cut coordinates; the
    batch rebuild consumes these as its cut list).  Zero corpus passes
    at serve time; per-micro-batch cost is the arriving docs' grams
    joined to the artifact."""
    from scespet_spark.operators.dedup import gram_digests
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    prior = (gram_digests(docs.filter(F.col("doc_id") % 3 == 0),
                          min_len=_SUB_L)
             .select("__g").distinct())              # snapshot artifact
    stream = read_table_stream(spark, sf_dir, "documents")
    hits = (gram_digests(stream.filter(F.col("doc_id") % 3 != 0),
                         min_len=_SUB_L)
            .join(prior, "__g", "left_semi")
            .select("doc_id", "pos"))
    return run_available_now(hits, "append")


@query("dedup_incremental_substring", f"""
WITH {_GRAM_CTES},
pri AS (SELECT DISTINCT d FROM g WHERE doc_id % 3 = 0),
newg AS (SELECT * FROM g WHERE doc_id % 3 <> 0),
dup AS (SELECT doc_id, pos FROM newg WHERE d IN (SELECT d FROM pri)
        UNION ALL
        SELECT doc_id, pos FROM
        (SELECT doc_id, pos,
                row_number() OVER (PARTITION BY d
                                   ORDER BY doc_id, pos) AS rk
         FROM newg WHERE d NOT IN (SELECT d FROM pri)) WHERE rk > 1),
{_SUB_TAIL.format(L=_SUB_L, where="doc_id % 3 <> 0")}
""")
def dedup_incremental_substring(spark, sf_dir):
    """Cross-snapshot exact-substring dedup: a new crawl batch
    (doc_id % 3 != 0) cleaned against the prior corpus's gram-digest
    table — any new-batch passage already present in the prior corpus
    is cut wholesale (digest semi-join, ints both sides, neither
    broadcast), then the within-batch first-occurrence election runs
    on the remainder."""
    from scespet_spark.operators.dedup import incremental_substring_dedup
    docs = load_table(spark, sf_dir, "documents")
    return incremental_substring_dedup(
        docs.filter(F.col("doc_id") % 3 != 0),
        prior=docs.filter(F.col("doc_id") % 3 == 0), min_len=_SUB_L)


@query("doc_novelty_vs_prior", f"""
WITH {_GRAM_CTES},
pri AS (SELECT DISTINCT d FROM g WHERE doc_id % 3 = 0),
newg AS (SELECT * FROM g WHERE doc_id % 3 <> 0),
per AS (SELECT doc_id, COUNT(*) AS n_grams,
               SUM((d IN (SELECT d FROM pri))::INT) AS n_known
        FROM newg GROUP BY doc_id)
SELECT doc_id, n_grams::BIGINT AS n_grams, n_known::BIGINT AS n_known,
       round(1 - n_known / (n_grams + 0.0), 6) AS novelty
FROM per
""")
def doc_novelty_vs_prior(spark, sf_dir):
    """Per-doc novelty vs the prior snapshot (r10): the fraction of a
    new-batch doc's {_SUB_L}-token grams absent from the prior
    corpus's gram-digest table — the analysis dual of exact-substring
    dedup (dedup CUTS known spans, novelty MEASURES them): syndication
    and templated spam score low even when no single run is long
    enough to cut; the per-source aggregate drives crawl
    prioritization.  Same probe shape as the substring dedup (map-side
    gram digests, digest semi-join, two combinable per-doc counts;
    accepts the snapshot's prior_bloom)."""
    from scespet_spark.operators.dedup import novelty_score
    docs = load_table(spark, sf_dir, "documents")
    return novelty_score(docs.filter(F.col("doc_id") % 3 != 0),
                         prior=docs.filter(F.col("doc_id") % 3 == 0),
                         min_len=_SUB_L)


@query("vocab_drift_drop", f"""
WITH nt AS (SELECT {h64_sql('tk')} AS h, COUNT(*) AS cn
            FROM (SELECT unnest({_TOKS}) AS tk FROM documents
                  WHERE doc_id % 3 <> 0) GROUP BY 1),
pt AS (SELECT {h64_sql('tk')} AS h, COUNT(*) AS cp
       FROM (SELECT unnest({_TOKS}) AS tk FROM documents
             WHERE doc_id % 3 = 0) GROUP BY 1),
j AS (SELECT coalesce(cn, 0) AS cn, coalesce(cp, 0) AS cp
      FROM nt FULL OUTER JOIN pt USING (h)),
t AS (SELECT SUM(cn) AS n_new, SUM(cp) AS n_prior, COUNT(*) AS v,
             SUM((cn > 0)::INT) AS v_new,
             SUM(CASE WHEN cn > 0 AND cp = 0 THEN cn ELSE 0 END) AS oov
      FROM j)
SELECT n_new::BIGINT AS n_tokens, v_new::BIGINT AS n_distinct,
       round(oov / (n_new + 0.0), 6) AS oov_frac,
       (SELECT round(SUM((cn / (n_new + 0.0))
                * ln((cn / (n_new + 0.0))
                     / ((cp + 1.0) / (n_prior + v)))), 6)
        FROM j, t WHERE cn > 0) AS kl
FROM t
""")
def vocab_drift_drop(spark, sf_dir):
    """Distribution-level crawl drift (r10): KL(drop || prior) between
    the new batch's unigram distribution and the prior corpus's
    (add-1-smoothed over the union vocabulary) plus the drop's OOV
    token mass — the page a crawl operator watches next to the
    content-level novelty score: a spam wave, an encoding break, or a
    domain-mix shift moves this before any model metric does.  One
    combinable count aggregate per side, one digest-keyed outer join
    of two vocabulary-sized tables, one scalar aggregate.  (Live
    monitoring runs this batch op per materialized drop — the
    foreachBatch pattern; a streaming plan cannot chain the
    per-digest and global aggregations.)"""
    from scespet_spark.operators.text import vocab_drift
    docs = load_table(spark, sf_dir, "documents")
    return vocab_drift(docs.filter(F.col("doc_id") % 3 != 0),
                       prior=docs.filter(F.col("doc_id") % 3 == 0))


@query("live_doc_novelty", _ORACLES["doc_novelty_vs_prior"])
def live_doc_novelty(spark, sf_dir):
    """Novelty scoring on a LIVE crawl: arriving docs explode to gram
    digests map-side, a stream-static LEFT join against the snapshot's
    gram table marks known grams, and the per-doc (n_grams, n_known)
    pair is a streaming aggregate (complete mode — the score is a
    per-doc aggregate, like the live LM scorers).  The per-drop
    novelty trend is the crawl-health signal a scheduler watches.
    Same oracle as doc_novelty_vs_prior: the stream replays the
    new batch against the same prior."""
    from scespet_spark.operators.dedup import gram_digests
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    pri = (gram_digests(docs.filter(F.col("doc_id") % 3 == 0),
                        min_len=_SUB_L)
           .select("__g").distinct().withColumn("__k", F.lit(1)))
    stream = read_table_stream(spark, sf_dir, "documents")
    occ = gram_digests(stream.filter(F.col("doc_id") % 3 != 0),
                       min_len=_SUB_L)
    per = (occ.join(pri, "__g", "left")
           .groupBy("doc_id")
           .agg(F.count("*").alias("n_grams"),
                F.sum(F.coalesce("__k", F.lit(0))).alias("n_known")))
    out = run_available_now(per, "complete")
    return out.select("doc_id", "n_grams",
                      F.col("n_known").cast("long").alias("n_known"),
                      F.round(1 - F.col("n_known") / F.col("n_grams"), 6)
                      .alias("novelty"))


@query("live_incremental_segments", f"""
WITH {_SEG_CTES},
h AS (SELECT doc_id, seg_idx, {h64_sql('seg')} AS segment_hash FROM seg),
pri AS (SELECT DISTINCT segment_hash FROM h WHERE doc_id % 3 = 0),
neu AS (SELECT * FROM h WHERE doc_id % 3 <> 0
        AND segment_hash NOT IN (SELECT segment_hash FROM pri)),
w AS (SELECT *, row_number() OVER (PARTITION BY segment_hash
                                   ORDER BY doc_id, seg_idx) AS rk
      FROM neu)
SELECT doc_id, seg_idx, segment_hash FROM w WHERE rk = 1
""")
def live_incremental_segments(spark, sf_dir):
    """The continuous-build segment probe on a LIVE crawl: arriving
    docs explode to segment digests map-side, the prior snapshot's
    digest table suppresses known boilerplate via a stream-static
    anti-join, and ``first_wins`` elects each novel digest's winner
    across micro-batches.  Single-drop source = row-identical to the
    batch anti-join election (the oracle)."""
    from scespet_spark.operators.dedup import segment_digests
    from scespet_spark.streaming.live import (first_wins,
                                              read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    prior = (segment_digests(docs.filter(F.col("doc_id") % 3 == 0),
                             size=_SEG_SIZE)
             .select("__d").distinct())                # snapshot artifact
    stream = read_table_stream(spark, sf_dir, "documents")
    segs = (segment_digests(stream.filter(F.col("doc_id") % 3 != 0),
                            size=_SEG_SIZE)
            .join(prior, "__d", "left_anti")
            .select("doc_id", F.col("seg_idx").cast("long").alias("seg_idx"),
                    F.col("__d").alias("segment_hash")))
    out = first_wins(segs, keys=["segment_hash"],
                     order_cols=["doc_id", "seg_idx"],
                     payload_cols=["doc_id", "seg_idx"])
    return run_available_now(out, "append").select(
        "doc_id", "seg_idx", "segment_hash")


_MIX_W = {"src0": 0.3, "src1": 0.3, "src2": 0.2, "src3": 0.1,
          "src4": 0.1}
_MIX_N = 120


def _mixture_oracle():
    vals = ", ".join(f"('{k}', {v})" for k, v in _MIX_W.items())
    hh = h64_sql("doc_id::VARCHAR", seed=11)
    return f"""
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
w AS (SELECT * FROM (VALUES {vals}) AS t(source, w)),
cut AS (SELECT source, floor(least(1.0, w * {_MIX_N} / n) * 1048576) AS cut
        FROM c JOIN w USING (source))
SELECT doc_id, text, lang, source, n_chars
FROM documents JOIN cut USING (source)
WHERE ({hh}) % 1048576 < cut
"""


_TEMP_ALPHA, _TEMP_N = 0.5, 300


@query("temperature_mixture_docs", f"""
WITH c AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
z AS (SELECT SUM(pow(n, {_TEMP_ALPHA})) AS z FROM c),
cut AS (SELECT source,
               floor(round(least(1.0, pow(n, {_TEMP_ALPHA}) / z
                                      * {_TEMP_N} / n), 12)
                     * 1048576) AS cut
        FROM c, z)
SELECT doc_id, text, lang, source, n_chars
FROM documents JOIN cut USING (source)
WHERE ({h64_sql("doc_id::VARCHAR", seed=11)}) % 1048576 < cut
""")
def temperature_mixture_docs(spark, sf_dir):
    """Temperature-sampled training mix (r9): the declared recipe is
    DERIVED from per-source availability — p_s proportional to
    n_s^alpha (Arivazhagan et al. 2019; alpha<1 upweights scarce
    sources) — then applied with the same deterministic hash filter as
    mixture_sample.  One #sources-row count agg + a 1-row normalizer,
    broadcast; keep probabilities rounded to 12 digits before the
    integer cutoff so cross-libm pow ulps cannot flip the floor."""
    from scespet_spark.operators.text import temperature_mixture_sample
    docs = load_table(spark, sf_dir, "documents")
    return temperature_mixture_sample(docs, _TEMP_ALPHA, _TEMP_N)


_TEMP_ORACLE = _ORACLES["temperature_mixture_docs"]


@query("live_temperature_mixture", _TEMP_ORACLE)
def live_temperature_mixture(spark, sf_dir):
    """The temperature recipe applied to a LIVE ingest stream (r10 —
    the one r9 batch addition that lacked its serving form): the
    #sources-row ``temperature_cutoffs`` table is fitted ONCE
    batch-side from per-source availability (the snapshot artifact —
    a stream cannot count its own future), then arriving documents
    sample against it via the same ``mixture_apply`` stream-static
    broadcast join + deterministic map-side hash filter as
    live_mixture_sample.  Append mode, zero state.  Same oracle as
    temperature_mixture_docs: the stream replays the corpus the
    cutoffs were fitted on."""
    from scespet_spark.operators.text import (mixture_apply,
                                              temperature_cutoffs)
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    cut = temperature_cutoffs(docs, _TEMP_ALPHA, _TEMP_N)
    stream = read_table_stream(spark, sf_dir, "documents")
    return run_available_now(mixture_apply(stream, cut), "append")


@query("mixture_sample_sources", _mixture_oracle())
def mixture_sample_sources(spark, sf_dir):
    """Training-mix resampling: deterministic hash sampling toward
    declared per-source weights (the data-recipe step); count agg +
    broadcast cutoffs + map-side filter — the corpus never shuffles."""
    from scespet_spark.operators.text import mixture_sample
    docs = load_table(spark, sf_dir, "documents")
    return mixture_sample(docs, _MIX_W, _MIX_N)


@query("live_mixture_sample", _mixture_oracle())
def live_mixture_sample(spark, sf_dir):
    """The mixture recipe applied to a LIVE ingest stream: cutoffs are
    the snapshot artifact (mixture_cutoffs over the batch corpus), the
    crawl stream samples against them with a stream-static broadcast
    join + map-side hash filter — row-by-row, reproducible, no corpus
    counting on the hot path.  Same oracle as mixture_sample_sources
    (the stream replays the same corpus)."""
    from scespet_spark.operators.text import mixture_cutoffs, mixture_apply
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    cut = mixture_cutoffs(docs, _MIX_W, _MIX_N)   # snapshot artifact
    stream = read_table_stream(spark, sf_dir, "documents")
    return run_available_now(mixture_apply(stream, cut), "append")


@query("weighted_sample_chars", f"""
SELECT doc_id, source, n_chars FROM (
  SELECT doc_id, source, n_chars,
         round(raw * pow(10.0, 11 - floor(log10(abs(raw)))))
           / pow(10.0, 11 - floor(log10(abs(raw)))) AS sk
  FROM (SELECT doc_id, source, n_chars,
               ln((({h64_sql("doc_id::VARCHAR", seed=17)}) % {1 << 20}
                   + 0.5) / {1 << 20}) / n_chars AS raw
        FROM documents WHERE n_chars > 0)
  ORDER BY sk DESC, doc_id LIMIT 200)
ORDER BY doc_id
""")
def weighted_sample_chars(spark, sf_dir):
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis): 200 docs drawn proportional to length — the
    quality-weighted subsampling step; reproducible across runs,
    engines, and partitionings (hash-derived uniforms, exact top-k)."""
    from scespet_spark.operators.text import weighted_sample
    docs = load_table(spark, sf_dir, "documents")
    return (weighted_sample(docs, "n_chars", 200)
            .select("doc_id", "source", "n_chars").orderBy("doc_id"))


@query("pack_training_sequences", f"""
WITH t AS (SELECT doc_id, len({_TOKS}) AS n_tokens FROM documents),
c AS (SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS cum
      FROM t)
SELECT doc_id, n_tokens,
       cum - n_tokens AS start_tok,
       (cum - n_tokens) // 2048 AS seq_first,
       CASE WHEN n_tokens > 0 THEN (cum - 1) // 2048
            ELSE (cum - n_tokens) // 2048 END AS seq_last,
       (cum - n_tokens) % 2048 AS off_in_seq
FROM c
""")
def pack_training_sequences(spark, sf_dir):
    """Concat-and-chunk packing of the corpus into 2048-token training
    sequences — global prefix sum via the two-phase bucketed scan."""
    from scespet_spark.operators.pipeline import pack_sequences
    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, budget=2048)


#: DSIR demo params: target domain sample = doc_id % 7 == 0, raw
#: corpus = the rest; hashed unigram+bigram features, B buckets
_DSIR_B = 8192
_DSIR_FEATS = (f"list_concat(t, list_transform("
               f"range(1, greatest(1, len(t))), "
               f"i -> t[i] || ' ' || t[i + 1]))")

_DSIR_SQL = f"""WITH tgt AS (SELECT {_TOKS} AS t FROM documents
             WHERE doc_id % 7 = 0),
raw AS (SELECT doc_id, {_TOKS} AS t FROM documents WHERE doc_id % 7 <> 0),
ct AS (SELECT ({h64_sql('f')}) % {_DSIR_B} AS bucket, COUNT(*) AS c
       FROM (SELECT unnest({_DSIR_FEATS}) AS f FROM tgt) GROUP BY 1),
cr AS (SELECT ({h64_sql('f')}) % {_DSIR_B} AS bucket, COUNT(*) AS c
       FROM (SELECT doc_id, unnest({_DSIR_FEATS}) AS f FROM raw)
       GROUP BY 1),
tot AS (SELECT (SELECT SUM(c) FROM ct) AS tt,
               (SELECT SUM(c) FROM cr) AS tr),
w AS (SELECT coalesce(ct.bucket, cr.bucket) AS bucket,
             ln((coalesce(ct.c, 0) + 1.0) / (tt + {_DSIR_B}.0))
           - ln((coalesce(cr.c, 0) + 1.0) / (tr + {_DSIR_B}.0)) AS w
      FROM ct FULL JOIN cr ON ct.bucket = cr.bucket, tot),
un AS (SELECT ln(1.0 / (tt + {_DSIR_B}.0))
            - ln(1.0 / (tr + {_DSIR_B}.0)) AS w FROM tot),
app AS (SELECT doc_id, ({h64_sql('f')}) % {_DSIR_B} AS bucket
        FROM (SELECT doc_id, unnest({_DSIR_FEATS}) AS f FROM raw)),
lw AS (SELECT app.doc_id,
              round(SUM(coalesce(w.w, (SELECT w FROM un))), 6) AS lw,
              COUNT(*) AS n_feats
       FROM app LEFT JOIN w ON app.bucket = w.bucket
       GROUP BY app.doc_id)
SELECT doc_id, lw, n_feats, key FROM (
  SELECT doc_id, lw, n_feats,
         round(lw - ln(-ln((({h64_sql("doc_id::VARCHAR", seed=29)})
                            % {1 << 20} + 0.5) / {1 << 20})), 6) AS key
  FROM lw ORDER BY key DESC, doc_id LIMIT 150)
ORDER BY doc_id"""


_DSIR_LW_SQL = _DSIR_SQL[:_DSIR_SQL.index("SELECT doc_id, lw, n_feats, key")] \
    + "SELECT doc_id, lw, n_feats FROM lw"


@query("live_dsir_weights", _DSIR_LW_SQL)
def live_dsir_weights(spark, sf_dir):
    """DSIR importance weighting on a LIVE crawl: the log-ratio bucket
    table (fitted once batch-side from the target sample + raw-corpus
    counts — the snapshot artifact) attaches to arriving documents via
    a broadcast stream-static join; the unseen-bucket ratio is one
    driver-side scalar.  Zero corpus passes at serve time; oracle = the
    batch weights over the raw corpus the stream replays."""
    from scespet_spark.operators.pipeline import dsir_apply, dsir_model
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    model = dsir_model(docs.filter(F.col("doc_id") % 7 != 0),
                       docs.filter(F.col("doc_id") % 7 == 0),
                       n_buckets=_DSIR_B)
    stream = (read_table_stream(spark, sf_dir, "documents")
              .filter(F.col("doc_id") % 7 != 0))
    return run_available_now(dsir_apply(stream, model,
                                        n_buckets=_DSIR_B), "complete")


@query("dsir_sample_topk", _DSIR_SQL)
def dsir_sample_topk(spark, sf_dir):
    """DSIR data selection (Xie et al. 2023): score every raw-corpus
    doc by the log importance ratio of its hashed unigram+bigram
    features under a target domain sample vs the raw corpus, then draw
    150 docs via deterministic Gumbel top-k — the importance-resampling
    step that shapes a 100 TB crawl toward a target domain.  Two
    map-combinable bucket-count passes, one broadcast log-ratio table,
    one per-doc sum, a distributed TakeOrdered; no UDF, exact SQL
    oracle."""
    from scespet_spark.operators.pipeline import dsir_sample
    docs = load_table(spark, sf_dir, "documents")
    return dsir_sample(docs.filter(F.col("doc_id") % 7 != 0),
                       docs.filter(F.col("doc_id") % 7 == 0),
                       k=150, n_buckets=_DSIR_B).orderBy("doc_id")


#: DuckDB whitespace-word mirror of text.tokens() (split on ' ',
#: empties removed) — the shared front half of the tokenizer/packing
#: invariant oracles.
_WORDS_CTE = ("SELECT doc_id, list_filter(string_split("
              "coalesce(text, ''), ' '), x -> x <> '') AS ws "
              "FROM documents")


@query("bpe_fit_merges", """
SELECT TRUE AS ranks_contiguous, TRUE AS parts_derivable,
       TRUE AS pairs_in_corpus, TRUE AS n_le_target
""")
def bpe_fit_merges(spark, sf_dir):
    """BPE tokenizer training (Sennrich et al. 2016) on the corpus:
    ONE distributed word-frequency pass (map-combinable, vocab-sized
    output), then the driver-side merge loop over the collected vocab
    — the sentencepiece/HF trainer shape; no per-merge corpus pass.

    INVARIANT oracle (the merge SEQUENCE is an iterative greedy
    optimum, not SQL-expressible — the exact classic-corpus order is
    pinned in tests/test_tokenizer.py): the fitted model's structural
    guarantees, each computed from the real model and emitted for the
    hash check — ranks contiguous from 0; every merge operand is a
    base symbol (single char / end-of-word) or the output of an
    EARLIER merge (the defining BPE property); every merged token
    occurs inside some corpus word (nothing hallucinated); merge count
    within the requested budget."""
    from scespet_spark.operators.tokenizer import EOW, bpe_fit
    from scespet_spark.operators.tokenizer import word_frequencies
    docs = load_table(spark, sf_dir, "documents")
    rows = sorted((int(r["rank"]), r["left"], r["right"]) for r in
                  bpe_fit(docs, n_merges=64, min_count=2).collect())
    ranks_ok = [r for r, _, _ in rows] == list(range(len(rows)))
    known: set = set()
    derivable = True
    for _, lft, rgt in rows:
        for part in (lft, rgt):
            if not (len(part) == 1 or part == EOW or part in known):
                derivable = False
        known.add(lft + rgt)
    # the vocab collect is bounded exactly like bpe_fit's own driver
    # loop (Zipf word table)
    words = [r["word"] for r in word_frequencies(docs).collect()]
    toks = [(lft + rgt).replace(EOW, "") for _, lft, rgt in rows]
    grounded = all(any(t in w for w in words) for t in toks if t)
    return spark.createDataFrame(
        [(ranks_ok, derivable, grounded, len(rows) <= 64)],
        "ranks_contiguous boolean, parts_derivable boolean, "
        "pairs_in_corpus boolean, n_le_target boolean")


@query("bpe_tokenize_docs", f"""
WITH w AS ({_WORDS_CTE})
SELECT doc_id, TRUE AS lossless, len(ws)::BIGINT AS n_words,
       length(array_to_string(ws, ''))::BIGINT AS n_token_chars
FROM w
""")
def bpe_tokenize_docs(spark, sf_dir):
    """Corpus tokenization under the fitted BPE model: one Arrow-
    batched mapInPandas with a per-batch word memo (Zipf: Python cost
    per DISTINCT word, not per token) and the merge ranking broadcast
    as a plain dict.

    INVARIANT oracle (the token SEQUENCE replays merges in rank order
    — not SQL-expressible; the exact encoding is pinned in
    tests/test_tokenizer.py): per doc, derived from the REAL piece
    arrays — ``lossless`` (concatenating the pieces and turning each
    end-of-word marker back into a space reproduces the normalized
    source text), ``n_words`` (pieces carrying the end-of-word marker
    — exactly one per word), and ``n_token_chars`` (total piece chars
    net of markers == source word chars: conservation).  DuckDB
    predicts all three from the source table alone."""
    from scespet_spark.operators.tokenizer import EOW, bpe_apply, bpe_fit
    from scespet_spark.operators.text import tokens
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_fit(docs, n_merges=64, min_count=2)
    out = bpe_apply(docs, merges)
    toks = F.col("bpe_tokens")
    recon = F.rtrim(F.replace(F.array_join(toks, ""), F.lit(EOW),
                              F.lit(" ")))
    norm = F.array_join(tokens(F.coalesce(F.col("text"), F.lit(""))), " ")
    n_words = F.size(F.filter(toks, lambda p: F.endswith(p, F.lit(EOW))))
    n_chars = F.aggregate(
        toks, F.lit(0).cast("long"),
        lambda acc, p: acc + F.length(p)
        - F.when(F.endswith(p, F.lit(EOW)), F.lit(len(EOW)))
           .otherwise(F.lit(0)))
    return (out.select("doc_id", (recon == norm).alias("lossless"),
                       n_words.cast("long").alias("n_words"),
                       n_chars.alias("n_token_chars"))
            .orderBy("doc_id"))


@query("pack_bestfit_sequences", f"""
WITH w AS ({_WORDS_CTE})
SELECT doc_id, len(ws)::BIGINT AS n_tokens,
       CASE WHEN len(ws) > 512 THEN 1 ELSE 0 END::INTEGER AS oversize,
       TRUE AS seq_ok
FROM w
""")
def pack_bestfit_sequences(spark, sf_dir):
    """First-fit-decreasing packing WITHOUT document splitting (the
    no-cross-doc-attention alternative to the concat-and-chunk tape):
    budget=512 so the demo corpus genuinely multi-packs.

    INVARIANT oracle (which bin each doc lands in is an
    order-dependent FFD fold — not SQL-expressible; bin equality to a
    pure-Python model plus the waste bounds are property-tested in
    tests/test_properties.py): per doc, derived from the REAL packing
    — ``n_tokens`` (token conservation: the packing carries every
    doc's true count), ``oversize`` (flagged exactly when the doc
    exceeds the budget), and ``seq_ok`` (the doc's assigned sequence
    totals within budget, or is a dedicated oversized singleton).
    DuckDB predicts all three from the source table alone."""
    from scespet_spark.operators.pipeline import pack_sequences_bestfit
    docs = load_table(spark, sf_dir, "documents")
    out = pack_sequences_bestfit(docs, budget=512)
    seqs = out.groupBy("seq_id").agg(F.sum("n_tokens").alias("__tot"),
                                     F.count("*").alias("__cnt"))
    ok = (((F.col("oversize") == 0) & (F.col("__tot") <= 512))
          | ((F.col("oversize") == 1) & (F.col("__cnt") == 1)
             & (F.col("n_tokens") > 512)))
    return (out.join(seqs, "seq_id")
            .select("doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("oversize").cast("int").alias("oversize"),
                    ok.alias("seq_ok"))
            .orderBy("doc_id"))


@query("shuffle_deterministic_shards", f"""
SELECT doc_id,
       {h64_sql("'42_' || doc_id::VARCHAR")} AS sort_key,
       {h64_sql("'42_' || doc_id::VARCHAR")} % 64 AS shard
FROM documents
""")
def shuffle_deterministic_shards(spark, sf_dir):
    """Seeded reproducible global shuffle: shard + sort-key assignment
    (write = repartition(shard) + sortWithinPartitions, no global sort)."""
    from scespet_spark.operators.pipeline import shuffle_deterministic
    return shuffle_deterministic(load_table(spark, sf_dir, "documents"))


@query("quantize_embeddings_int8", """
WITH n AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT vec_id,
       list_min(v) AS vmin, list_max(v) AS vmax,
       array_to_string(CASE WHEN list_max(v) = list_min(v)
            THEN list_transform(v, x -> 0)
            ELSE list_transform(v, x -> CAST(floor(
                 (x - list_min(v)) / ((list_max(v) - list_min(v)) / 255)
                 + 0.5) AS INTEGER)) END, ',') AS q
FROM n
""")
def quantize_embeddings_int8(spark, sf_dir):
    """Per-vector affine int8 quantization (vectorized Arrow numpy
    pass).  Codes emitted as a comma-joined string so the driver's
    pandas canonicalizer can hash the column (list cells crash it)."""
    from scespet_spark.operators.pipeline import quantize_embeddings
    out = quantize_embeddings(load_table(spark, sf_dir, "embeddings"))
    return out.withColumn(
        "q", F.array_join(F.col("q").cast("array<string>"), ","))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: per-user daily tumbling aggregation, augmented with the
    running cross-vector grand total at each bucket close — exercises
    by/group(Every)/reduce/mapVector in one plan, on sf0.001."""
    sf_dir = "/root/testdata/sf0.001"
    s = events_stream(spark, sf_dir).by("user_id", name="user_id")
    daily = s.group(Every("1 day")).reduce(total=_dsum("value"), n=F.count("*"))
    out = daily.map_vector(buckets=F.date_trunc("week", F.col("ts")),
                           grand_total=F.sum("total"),
                           buckets_seen=F.count("*"))
    return out.df.select("user_id", "ts", "total", "n",
                         "grand_total", "buckets_seen")


# ===========================================================================
# r9 extensions: CCNet head/middle/tail bucketing, URL rule filtering,
# curriculum ordering / global rank, per-source token budgets
# ===========================================================================

_CCNET_ORACLE = """
WITH scores AS ({lm}),
sl AS (SELECT s.doc_id, s.n_bigrams, s.mean_logp, d.lang
       FROM scores s JOIN documents d USING (doc_id)),
cuts AS (SELECT lang, quantile_cont(mean_logp, 1.0/3) AS p33,
                quantile_cont(mean_logp, 2.0/3) AS p67
         FROM sl GROUP BY lang)
SELECT doc_id, lang, n_bigrams, mean_logp,
       CASE WHEN mean_logp >= p67 THEN 'head'
            WHEN mean_logp >= p33 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM sl JOIN cuts USING (lang)
""".format(lm=_bigram_lm_oracle())


@query("ccnet_perplexity_buckets", _CCNET_ORACLE)
def ccnet_perplexity_buckets(spark, sf_dir):
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): score
    every doc with the in-corpus bigram LM, fit per-LANGUAGE exact
    tercile cutoffs (1/3, 2/3 quantiles of mean_logp — one combinable
    aggregate emitting |langs| rows), and label each doc's bucket via
    a broadcast map.  Head = cleanest third of its own language, so no
    language's distribution drowns another's."""
    from scespet_spark.operators.text import ccnet_buckets
    return ccnet_buckets(load_table(spark, sf_dir, "documents"))


@query("live_ccnet_bucket", _CCNET_ORACLE)
def live_ccnet_bucket(spark, sf_dir):
    """The CCNet bucket gate on a LIVE crawl: the LM count tables AND
    the |langs|-row tercile cutoffs are fitted ONCE batch-side (the
    snapshot artifacts); arriving documents score via stream-static
    joins as micro-batches land (complete mode — the per-doc score is
    a streaming aggregate), and the completed scores take the
    broadcast bucket label.  Same oracle as ccnet_perplexity_buckets:
    the stream replays the corpus the model and cutoffs were fitted
    on."""
    from scespet_spark.operators.text import (bigram_lm_apply,
                                              bigram_lm_model,
                                              bigram_lm_score,
                                              ccnet_bucket_apply,
                                              ccnet_bucket_cutoffs)
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    model = bigram_lm_model(docs)
    cuts = ccnet_bucket_cutoffs(
        bigram_lm_score(docs).join(docs.select("doc_id", "lang"),
                                   "doc_id"))
    stream = read_table_stream(spark, sf_dir, "documents")
    scored = run_available_now(bigram_lm_apply(stream, model), "complete")
    scored = scored.join(docs.select("doc_id", "lang"), "doc_id")
    return ccnet_bucket_apply(scored, cuts)


#: deterministic URL-variety column exercising every url_rule_filter
#: rule (doc_id % 8 selects the case); Spark and DuckDB mirrors.
def _rule_url_col():
    did = F.col("doc_id").cast("string")
    m = F.col("doc_id") % 8
    return (F.when(m == 0, F.concat(F.lit("https://ads.example-tracker.net/p"), did))
            .when(m == 1, F.concat(F.lit("https://fun.example.xxx/p"), did))
            .when(m == 2, F.concat(F.lit("https://docs.example.org/casino/p"), did))
            .when(m == 3, F.concat(F.lit("https://docs.example.org"),
                                   F.repeat(F.lit("/d"), 20),
                                   F.lit("/p"), did))
            .when(m == 4, F.concat(F.lit("https://docs.example.org/"),
                                   F.repeat(F.lit("a"), 3000)))
            .when(m == 5, F.lit("page-without-scheme"))
            .otherwise(F.concat(F.lit("https://docs.example.org/en/page"),
                                (F.col("doc_id") % 7).cast("string"))))


_RULE_URL_SQL = """CASE doc_id % 8
  WHEN 0 THEN 'https://ads.example-tracker.net/p' || CAST(doc_id AS VARCHAR)
  WHEN 1 THEN 'https://fun.example.xxx/p' || CAST(doc_id AS VARCHAR)
  WHEN 2 THEN 'https://docs.example.org/casino/p' || CAST(doc_id AS VARCHAR)
  WHEN 3 THEN 'https://docs.example.org' || repeat('/d', 20)
            || '/p' || CAST(doc_id AS VARCHAR)
  WHEN 4 THEN 'https://docs.example.org/' || repeat('a', 3000)
  WHEN 5 THEN 'page-without-scheme'
  ELSE 'https://docs.example.org/en/page' || CAST(doc_id % 7 AS VARCHAR)
END"""

_URL_RULE_ORACLE = f"""
WITH urls AS (SELECT doc_id, {_RULE_URL_SQL} AS url FROM documents),
c AS (SELECT doc_id, url,
  CASE WHEN regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+')
       THEN regexp_replace(lower(regexp_extract(url,
              '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*).*$', 2)),
            ':[0-9]+$', '')
       ELSE '' END AS host,
  CASE WHEN regexp_matches(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+')
       THEN regexp_extract(url,
              '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]+)([^?#]*).*$', 3)
       ELSE '' END AS path
  FROM urls)
SELECT doc_id, host,
  CASE WHEN url IS NULL OR host = '' THEN 'malformed'
       WHEN length(url) > 2048 THEN 'too_long'
       WHEN len(list_filter(string_split(path, '/'), x -> x <> '')) > 16
            THEN 'deep_path'
       WHEN host = 'example-tracker.net'
            OR host LIKE '%.example-tracker.net' THEN 'blocked_domain'
       WHEN regexp_matches(host, '\\.(xxx|adult|sex)$') THEN 'blocked_tld'
       WHEN lower(url) LIKE '%porn%' OR lower(url) LIKE '%xxx%'
            OR lower(url) LIKE '%casino%' OR lower(url) LIKE '%viagra%'
            THEN 'blocked_term'
       ELSE NULL END AS url_reason
FROM c
"""


@query("url_rule_filter_docs", _URL_RULE_ORACLE)
def url_rule_filter_docs(spark, sf_dir):
    """FineWeb/RefinedWeb URL rule filtering (Penedo et al. 2023 §3.1)
    — the gate a crawl applies BEFORE fetching: blocklisted domains
    (suffix match), adult TLDs, URL-keyword terms, crawler-trap
    structure (length/path depth), and parseability, each reported as
    the first-firing ``url_reason`` (NULL = fetchable).  ONE map-only
    codegen projection, no shuffle — scan speed at 100 TB."""
    from scespet_spark.operators.dedup import url_rule_filter
    docs = load_table(spark, sf_dir, "documents")
    return (url_rule_filter(docs.withColumn("url", _rule_url_col()),
                            blocked_domains=("example-tracker.net",))
            .select("doc_id", "host", "url_reason"))


@query("live_url_filter", _URL_RULE_ORACLE)
def live_url_filter(spark, sf_dir):
    """The URL rule gate on a LIVE crawl frontier: the same stateless
    map-only projection over arriving URLs, append mode, zero state —
    the cheapest gate in the live pipeline (runs before fetch, so a
    blocked URL costs one codegen row, not a download)."""
    from scespet_spark.operators.dedup import url_rule_filter
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    stream = (read_table_stream(spark, sf_dir, "documents")
              .withColumn("url", _rule_url_col()))
    out = url_rule_filter(stream,
                          blocked_domains=("example-tracker.net",))
    return run_available_now(out.select("doc_id", "host", "url_reason"),
                             "append")


@query("curriculum_order_docs", """
WITH r AS (SELECT doc_id, n_chars,
                  row_number() OVER (ORDER BY n_chars DESC, doc_id)
                  AS rank
           FROM documents)
SELECT doc_id, n_chars, rank,
       (rank - 1) // 64 AS shard,
       (rank - 1) % 64 AS pos
FROM r
""")
def curriculum_order_docs(spark, sf_dir):
    """Curriculum ordering: every document gets a deterministic
    (shard, pos) training position by global quality sort (n_chars
    desc as the demo difficulty proxy, doc_id tiebreak) — computed
    with the TWO-PHASE distributed rank (range-partition + per-
    partition row_number + driver-cumsum offsets; #partitions ints on
    the driver, no single-partition window), then
    shard = (rank-1) div 64, pos = (rank-1) mod 64.  Writing
    partitioned by shard, sorted by pos, yields ordered training
    shards from one range Exchange."""
    from scespet_spark.operators.pipeline import curriculum_order
    docs = load_table(spark, sf_dir, "documents")
    return (curriculum_order(docs, "n_chars", shard_size=64)
            .select("doc_id", "n_chars", "rank", "shard", "pos"))


_TOKEN_BUDGET = 700


@query("token_budget_docs", f"""
WITH t AS (SELECT doc_id, source, n_chars,
                  len(list_filter(string_split(coalesce(text, ''), ' '),
                                  x -> x <> '')) AS n_tokens
           FROM documents),
w AS (SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source
                                 ORDER BY n_chars DESC, doc_id) AS cum,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id)
             AS budget_rank
      FROM t)
SELECT doc_id, source, n_tokens, budget_rank
FROM w WHERE cum - n_tokens < {_TOKEN_BUDGET}
""")
def token_budget_docs(spark, sf_dir):
    """Per-source TOKEN budget election: spend each source's
    700-token epoch budget on its best documents first
    (n_chars desc as the demo priority, doc_id tiebreak) — a doc is
    kept iff it STARTS within the budget, so the kept set is a
    deterministic prefix of the priority order.  The budget is the
    unit training mixes actually allocate (tokens, not docs); one
    per-source running-sum window over int columns."""
    from scespet_spark.operators.text import token_budget_sample
    docs = load_table(spark, sf_dir, "documents")
    return (token_budget_sample(docs, budget=_TOKEN_BUDGET,
                                priority_col="n_chars")
            .select("doc_id", "source", "n_tokens", "budget_rank"))


@query("epoch_schedule_sources", f"""
WITH t AS (SELECT source,
                  CAST(SUM(len(list_filter(
                      string_split(coalesce(text, ''), ' '),
                      x -> x <> ''))) AS BIGINT) AS n_tokens
           FROM documents GROUP BY source
           HAVING n_tokens > 0),
z AS (SELECT SUM(pow(n_tokens, 0.5)) AS zz FROM t)
SELECT source, n_tokens,
       round(pow(n_tokens, 0.5) / zz, 12) AS share,
       round(least(2.3, round(pow(n_tokens, 0.5) / zz, 12)
                        * 60000 / n_tokens), 6) AS epochs,
       CAST(floor(round(least(2.3, round(pow(n_tokens, 0.5) / zz, 12)
                              * 60000 / n_tokens), 6) * n_tokens)
            AS BIGINT) AS realized_tokens
FROM t CROSS JOIN z
""")
def epoch_schedule_sources(spark, sf_dir):
    """Data-constrained epoch schedule (Muennighoff et al. 2023): how
    many EPOCHS of each source a 60k-token budget buys under an
    alpha=0.5 temperature share, capped at 2.3 epochs (the cap binds
    for the scarcer sources here — both branches exercised).  One tiny
    per-source token aggregate + a 1-row normalizer; |sources| rows
    end to end."""
    from scespet_spark.operators.text import epoch_schedule
    docs = load_table(spark, sf_dir, "documents")
    return epoch_schedule(docs, total_tokens=60000, alpha=0.5,
                          max_epochs=2.3)


_FILTER_STACK_ORACLE = f"""
SELECT d.doc_id,
       c4.keep AS c4_keep,
       g.keep AS gopher_keep,
       CASE WHEN p.doc_id IS NOT NULL THEN 1 ELSE 0 END AS ppl_keep,
       CASE WHEN c4.keep = 0 THEN 'c4'
            WHEN g.keep = 0 THEN 'gopher'
            WHEN p.doc_id IS NULL THEN 'perplexity'
            ELSE NULL END AS dropped_by
FROM documents d
JOIN ({{c4}}) c4 USING (doc_id)
JOIN ({{g}}) g USING (doc_id)
LEFT JOIN ({{p}}) p USING (doc_id)
"""


@query("filter_stack_docs", _FILTER_STACK_ORACLE.format(
    c4=_C4_SQL, g=_ORACLES["gopher_quality_docs"],
    p=_ORACLES["perplexity_filter_docs"]))
def filter_stack_docs(spark, sf_dir):
    """The full batch cleaning recipe in ONE call — the C4 line rules
    (over the synthesized multi-line text), the Gopher doc rules (over
    the raw text), and the CCNet perplexity gate — with a per-doc
    ``dropped_by`` audit column naming the FIRST stage that rejected
    it (NULL = survives the stack).  The two rule gates are map-only
    projections CHAINED in one pass over the doc row (no join between
    them — flags accumulate in the same projection); only the
    perplexity signal, which needs its own LM aggregation pass, joins
    back (a doc-id equi-join against the survivor id set).  This is
    the recipe shape a production pipeline runs: rules first (cheap,
    scan-speed), model gates after."""
    from scespet_spark.operators.text import (c4_rule_filter,
                                              gopher_quality_filter,
                                              perplexity_filter)
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.withColumn("c4_text", _c4_demo_text())
    flags = (gopher_quality_filter(
                 c4_rule_filter(staged, text_col="c4_text")
                 .withColumnRenamed("keep", "c4_keep"),
                 min_words=30)
             .withColumnRenamed("keep", "gopher_keep")
             .select("doc_id", "c4_keep", "gopher_keep"))
    ppl = perplexity_filter(docs, frac=0.1).select(
        "doc_id", F.lit(1).alias("ppl_keep"))
    return (flags.join(ppl, "doc_id", "left")
            .withColumn("ppl_keep", F.coalesce("ppl_keep", F.lit(0)))
            .withColumn("dropped_by",
                        F.when(F.col("c4_keep") == 0, "c4")
                        .when(F.col("gopher_keep") == 0, "gopher")
                        .when(F.col("ppl_keep") == 0, "perplexity")))


@query("filter_funnel_report", """
WITH base AS ({stack}),
c AS (SELECT dropped_by, COUNT(*) AS n FROM base
      WHERE dropped_by IS NOT NULL GROUP BY dropped_by),
t AS (SELECT COUNT(*) AS total FROM base),
o AS (SELECT * FROM (VALUES ('c4', 1), ('gopher', 2),
                            ('perplexity', 3)) AS v(stage, ord))
SELECT stage, coalesce(n, 0)::BIGINT AS n_dropped,
       (total - SUM(coalesce(n, 0)) OVER (ORDER BY ord))::BIGINT
         AS survivors_after
FROM o LEFT JOIN c ON c.dropped_by = o.stage, t
ORDER BY stage
""".format(stack=_FILTER_STACK_ORACLE.format(
    c4=_C4_SQL, g=_ORACLES["gopher_quality_docs"],
    p=_ORACLES["perplexity_filter_docs"])))
def filter_funnel_report(spark, sf_dir):
    """The cleaning-pipeline FUNNEL report (r10): per-gate drop counts
    and cumulative survivors over the filter_stack_docs chain — the
    accounting table a production pipeline publishes with every drop
    (which gate is doing the work; an unexpected shift is the first
    sign of crawl drift).  ONE combinable count aggregate over the
    corpus; the cumulative walk is a window over the <= |stages|+1
    aggregated rows, never data; unknown audit values raise rather
    than overstate survivors."""
    from scespet_spark.operators.pipeline import gate_funnel
    return gate_funnel(filter_stack_docs(spark, sf_dir),
                       ["c4", "gopher", "perplexity"])


_PR_THRESHOLDS = (-1.0, -0.5, 0.0, 0.5, 1.0)


@query("quality_pr_curve", """
WITH lab AS (SELECT s.doc_id, s.score, (d.lang = 'en')::INT AS y
             FROM ({qc}) s JOIN documents d USING (doc_id)),
thr AS (SELECT CAST(t AS DOUBLE) AS threshold
        FROM (VALUES {vals}) AS v(t)),
agg AS (SELECT threshold,
               SUM((score >= threshold AND y = 1)::INT)::BIGINT AS tp,
               SUM((score >= threshold AND y = 0)::INT)::BIGINT AS fp,
               SUM((score <  threshold AND y = 1)::INT)::BIGINT AS fn,
               SUM((score <  threshold AND y = 0)::INT)::BIGINT AS tn
        FROM lab, thr GROUP BY threshold)
SELECT threshold, tp, fp, fn, tn,
       CASE WHEN tp + fp > 0
            THEN round(tp / (tp + fp + 0.0), 6) END AS "precision",
       CASE WHEN tp + fn > 0
            THEN round(tp / (tp + fn + 0.0), 6) END AS recall,
       CASE WHEN 2*tp + fp + fn > 0
            THEN round(2.0 * tp / (2*tp + fp + fn), 6) END AS f1
FROM agg ORDER BY threshold
""".format(qc=_QC_SQL.format(target="doc_id % 3 <> 0"),
           vals=", ".join(f"({t})" for t in _PR_THRESHOLDS)))
def quality_pr_curve(spark, sf_dir):
    """Classifier calibration sweep (r10): the quality classifier's
    confusion counts + precision/recall/F1 at each candidate keep
    threshold over the held-out split — the table a pipeline publishes
    BEFORE wiring a score into a keep-gate (eyeballing one operating
    point is how a quality filter silently eats half a corpus).  ONE
    combinable aggregate pass computes all thresholds jointly; f1 uses
    the integer-derived closed form 2tp/(2tp+fp+fn) so both engines
    round the same division once."""
    from scespet_spark.operators.text import (classifier_pr_curve,
                                              quality_classifier_apply,
                                              quality_classifier_fit)
    docs = load_table(spark, sf_dir, "documents")
    model = quality_classifier_fit(
        docs.filter(F.col("doc_id") % 3 == 0)
        .withColumn("label", (F.col("lang") == "en").cast("int")),
        n_buckets=_QC_B)
    held = docs.filter(F.col("doc_id") % 3 != 0)
    scored = (quality_classifier_apply(held, model, n_buckets=_QC_B)
              .join(held.select("doc_id",
                                (F.col("lang") == "en").cast("int")
                                .alias("label")), "doc_id"))
    return classifier_pr_curve(scored, thresholds=_PR_THRESHOLDS)


@query("split_leakage_report", """
WITH {ctes},
sp AS (SELECT doc_id,
              CASE {case} END AS split
       FROM (SELECT doc_id,
                    ({h}) % {m} AS h FROM documents)),
x AS (SELECT least(a.split, b.split) AS split_a,
             greatest(a.split, b.split) AS split_b
      FROM pairs p
      JOIN sp a ON p.id_a = a.doc_id
      JOIN sp b ON p.id_b = b.doc_id
      WHERE a.split <> b.split)
SELECT split_a, split_b, COUNT(*)::BIGINT AS n_pairs
FROM x GROUP BY 1, 2 ORDER BY 1, 2
""".format(ctes=_minhash_ctes(),
           case=" ".join(f"WHEN h < {cut} THEN '{name}'"
                         for name, cut in _split_cuts()),
           h=h64_sql("doc_id::VARCHAR", seed=23), m=1 << 20))
def split_leakage_report(spark, sf_dir):
    """Cross-split contamination check (r10): LSH near-duplicate
    candidate pairs whose members landed in DIFFERENT train/val/test
    splits — a frozen eval doc with a near-duplicate in train is a
    leaked answer (Lee et al. 2021 found >1% of standard benchmark
    splits leaked this way).  Pair generation is the band-bucket
    equi-join (never all-pairs); the report is one count aggregate of
    <= |splits|^2 rows.  A nonzero row means: re-split by duplicate
    CLUSTER (connected_components), not by document."""
    from scespet_spark.operators.dedup import split_leakage
    from scespet_spark.operators.pipeline import split_assign, split_expr
    docs = load_table(spark, sf_dir, "documents")
    # r13: the split is a deterministic function of doc_id, so the
    # pair rows derive it map-side (split_of) — the two id-equi-joins
    # of the corpus-sized (id, split) projection are gone
    return split_leakage(split_assign(docs, _SPLIT_FRACS),
                         split_of=lambda c: split_expr(c, _SPLIT_FRACS))


from scespet_spark.operators.dedup import MH_PRIME  # noqa: E402

_GOPHER_REP_ORACLE = f"""
WITH t AS (SELECT doc_id, text,
                  list_transform({_TOKS},
                                 x -> {h64_sql('x')} % {MH_PRIME}) AS hs
           FROM documents),
s AS (SELECT doc_id, len(hs) AS nt, hs,
        CASE WHEN len(string_split(text, chr(10))) > 0
             THEN round(1 - len(list_distinct(
                        string_split(text, chr(10))))::DOUBLE
                        / len(string_split(text, chr(10))), 6)
             ELSE 0.0 END AS dup_line_frac
      FROM t),
g AS (SELECT doc_id, dup_line_frac,
        CASE WHEN nt >= 2 THEN round(1 -
               len({_shingle_hash_sql(2)})::DOUBLE
               / (nt - 1), 6) ELSE 0.0 END AS dup_2gram_frac,
        CASE WHEN nt >= 3 THEN round(1 -
               len({_shingle_hash_sql(3)})::DOUBLE
               / (nt - 2), 6) ELSE 0.0 END AS dup_3gram_frac,
        CASE WHEN nt >= 4 THEN round(1 -
               len({_shingle_hash_sql(4)})::DOUBLE
               / (nt - 3), 6) ELSE 0.0 END AS dup_4gram_frac
      FROM s)
SELECT doc_id, dup_line_frac, dup_2gram_frac, dup_3gram_frac,
       dup_4gram_frac,
       (dup_line_frac <= 0.30 AND dup_2gram_frac <= 0.20
        AND dup_3gram_frac <= 0.18 AND dup_4gram_frac <= 0.16)::INT
       AS keep
FROM g
"""

_GOPHER_REP_COLS = ["doc_id", "dup_line_frac", "dup_2gram_frac",
                    "dup_3gram_frac", "dup_4gram_frac", "keep"]


@query("gopher_repetition_docs", _GOPHER_REP_ORACLE)
def gopher_repetition_docs(spark, sf_dir):
    """Gopher's within-document REPETITION rules (Rae et al. 2021
    A1.1): duplicate-line fraction and duplicate 2/3/4-gram fractions
    with Gopher's 0.30/0.20/0.18/0.16 thresholds — the third sibling
    completing the rule suite (C4 line rules, Gopher doc-shape rules,
    Gopher repetition rules).  ONE map-only projection
    (`array_distinct` over per-row gram arrays — no explode, no
    shuffle); the synthetic corpus's small vocabulary makes the
    n-gram thresholds genuinely fire."""
    from scespet_spark.operators.text import gopher_repetition_filter
    docs = load_table(spark, sf_dir, "documents")
    return gopher_repetition_filter(docs).select(*_GOPHER_REP_COLS)


@query("live_gopher_repetition", _GOPHER_REP_ORACLE)
def live_gopher_repetition(spark, sf_dir):
    """The repetition rules on a LIVE crawl: stateless map-only
    projection per micro-batch, append mode, zero state — same oracle
    as the batch rules over the replayed table."""
    from scespet_spark.operators.text import gopher_repetition_filter
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    stream = read_table_stream(spark, sf_dir, "documents")
    return run_available_now(
        gopher_repetition_filter(stream).select(*_GOPHER_REP_COLS),
        "append")


# ---------------------------------------------------------------------------
# late-r9 batch 2: per-host domain caps (batch + live), exact
# distributed quantiles, unigram-LM tokenizer
# ---------------------------------------------------------------------------

#: demo host column for the domain-cap queries: 37 ordinary hosts plus
#: one deliberate WHALE host holding a third of the corpus — the skew
#: shape the salted two-phase cap exists for
_HOST_SQL = """CASE WHEN doc_id % 3 = 0 THEN 'whale.example.org'
       ELSE 'h' || CAST(doc_id % 37 AS VARCHAR) || '.example.org' END"""


def _host_col():
    return (F.when(F.col("doc_id") % 3 == 0, F.lit("whale.example.org"))
            .otherwise(F.concat(F.lit("h"),
                                (F.col("doc_id") % 37).cast("string"),
                                F.lit(".example.org"))))


@query("host_cap_docs", f"""
WITH h AS (SELECT doc_id, n_chars, {_HOST_SQL} AS host FROM documents),
r AS (SELECT doc_id, host, n_chars,
             row_number() OVER (PARTITION BY host
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM h)
SELECT doc_id, host, n_chars FROM r WHERE rk <= 5
""")
def host_cap_docs(spark, sf_dir):
    """FineWeb-style per-host domain cap: keep at most 5 docs per host
    (highest n_chars as the demo quality proxy, doc_id tiebreak) so no
    single domain dominates the training mix.  Runs the SALTED
    two-phase form (salt=8): phase 1 ranks within (host, salt-of-id)
    so the whale host spreads over 8 tasks, phase 2 ranks the <= 40
    survivors per host — exactly the same rows as the plain window
    (oracle is the plain rank definition), with no single-task whale
    sort at 100 TB.  Contrast source_quota_sample, whose driver-side
    cutoffs need a broadcastable per-key count table: hosts are
    millions of keys, so everything here stays distributed."""
    from scespet_spark.operators.pipeline import cap_per_key
    docs = load_table(spark, sf_dir, "documents")
    hosted = docs.withColumn("host", _host_col())
    return (cap_per_key(hosted, 5, "host",
                        [F.col("n_chars").desc(), F.col("doc_id").asc()],
                        salt=8)
            .select("doc_id", "host", "n_chars"))


@query("live_host_cap", f"""
WITH h AS (SELECT doc_id, n_chars, {_HOST_SQL} AS host FROM documents),
r AS (SELECT doc_id, host, n_chars,
             row_number() OVER (PARTITION BY host
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM h)
SELECT doc_id, host, n_chars FROM r WHERE rk <= 5
""")
def live_host_cap(spark, sf_dir):
    """The per-host domain cap on a LIVE crawl: once a host has
    contributed 5 pages, later drops of that host emit nothing —
    state per key is ONE counter (an int per host, not per page).
    Arrival order decides across drops, (n_chars desc, doc_id) within
    a drop; on the single-drop replay this equals the batch cap under
    the same total order (the first_wins contract, k generalized)."""
    from scespet_spark.streaming.live import (cap_first_k,
                                              read_table_stream,
                                              run_available_now)
    stream = (read_table_stream(spark, sf_dir, "documents")
              .withColumn("host", _host_col())
              .withColumn("__negq", -F.col("n_chars")))
    out = cap_first_k(stream, 5, keys=["host"],
                      order_cols=["__negq", "doc_id"],
                      payload_cols=["doc_id", "n_chars"], t="doc_id")
    return (run_available_now(out, "append")
            .select("doc_id", "host", "n_chars"))


@query("exact_quantiles_price", """
WITH v AS (SELECT CAST(l_extendedprice AS DOUBLE) AS x
           FROM lineitem WHERE l_extendedprice IS NOT NULL),
n AS (SELECT COUNT(*) AS cnt FROM v),
r AS (SELECT x, row_number() OVER (ORDER BY x) AS rn FROM v),
qs AS (SELECT * FROM (VALUES (0.01),(0.25),(0.50),(0.75),(0.99)) AS t(q))
SELECT CAST(q AS DOUBLE) AS q, MIN(x) AS value
FROM qs JOIN n ON TRUE
JOIN r ON r.rn = CAST(CEIL(q * n.cnt) AS BIGINT)
GROUP BY q
""")
def exact_quantiles_price(spark, sf_dir):
    """EXACT distributed quantiles (ceil(q*n)-th smallest — order
    statistics, not a sketch) by iterative histogram selection:
    per level ONE combinable histogram aggregate, the driver walks
    <=256 bucket counts to the bin holding the residual rank, recurses
    into that bin, and batches every pending quantile's final pick
    into ONE ranked-window job over <= threshold rows.
    Neither F.percentile's buffer-everything aggregate nor a global
    sort ever runs — memory is O(buckets) everywhere at any corpus
    size.  The oracle is the plain rank definition.

    r12 optimization: production sizing (the operator defaults —
    buckets=4096, threshold=65536) instead of the old demo thresholds
    (256/2048) that forced extra refinement levels at bench scale:
    each level is a full corpus pass (guide §1.2 — fewer passes), and
    4096 buckets resolve n <= 2.7e8 in ONE level anyway.  The
    multi-level refinement path stays pinned by the operator's unit
    tests; results are exact order statistics under any sizing."""
    from scespet_spark.operators.pipeline import exact_quantiles
    li = load_table(spark, sf_dir, "lineitem")
    return exact_quantiles(li, "l_extendedprice",
                           [0.01, 0.25, 0.50, 0.75, 0.99])


@query("range_join_price_bands", """
WITH b AS (SELECT i AS band, i*5000.0 AS lo, i*5000.0+7500.0 AS hi
           FROM range(24) t(i))
SELECT band,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS revenue
FROM b JOIN lineitem f
  ON f.l_extendedprice >= b.lo AND f.l_extendedprice < b.hi
GROUP BY band
""")
def range_join_price_bands(spark, sf_dir):
    """Interval/band join at fact scale via BUCKET EXPANSION: revenue
    per (overlapping) price band.  A raw BETWEEN join plans as
    BroadcastNestedLoopJoin in open-source Spark — O(|fact|x|bands|)
    comparisons; ``range_join`` explodes each band to its w-aligned
    buckets and equi-joins the fact's single bucket, so the plan is a
    plain HASH join (asserted: no BNLJ/Cartesian in
    tests/test_joins.py) and each fact row is compared only against
    the bands overlapping its bucket.  Overlapping bands are the
    point: a fact row legitimately lands in up to two bands here."""
    from scespet_spark.operators.joins import range_join
    li = load_table(spark, sf_dir, "lineitem")
    bands = spark.range(24).select(
        F.col("id").alias("band"),
        (F.col("id") * 5000.0).alias("lo"),
        (F.col("id") * 5000.0 + 7500.0).alias("hi"))
    return (range_join(li.select("l_orderkey", "l_linenumber",
                                 "l_extendedprice"), bands,
                       "l_extendedprice")
            .groupBy("band")
            .agg(F.count("*").alias("n_items"),
                 _dsum("l_extendedprice").alias("revenue")))


@query("live_range_join", """
WITH b AS (SELECT i AS band, i*5000.0 AS lo, i*5000.0+7500.0 AS hi
           FROM range(24) t(i))
SELECT f.l_orderkey, f.l_linenumber, b.band,
       CAST(f.l_extendedprice AS DOUBLE) AS price
FROM b JOIN lineitem f
  ON f.l_extendedprice >= b.lo AND f.l_extendedprice < b.hi
""")
def live_range_join(spark, sf_dir):
    """The band join on a LIVE fact stream: the dim side's bucket
    expansion is static (broadcast), the fact's bucket id is map-only,
    so the whole range join is a stateless stream-static hash join —
    append mode, zero state, per-micro-batch cost = the arriving rows
    only.  The shape a live enrichment pipeline needs (price bands,
    latency SLO buckets, geo boxes) without a nested-loop plan."""
    from scespet_spark.operators.joins import range_join
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    bands = spark.range(24).select(
        F.col("id").alias("band"),
        (F.col("id") * 5000.0).alias("lo"),
        (F.col("id") * 5000.0 + 7500.0).alias("hi"))
    stream = read_table_stream(spark, sf_dir, "lineitem")
    out = range_join(stream.select("l_orderkey", "l_linenumber",
                                   "l_extendedprice"), bands,
                     "l_extendedprice")
    return (run_available_now(out, "append")
            .select("l_orderkey", "l_linenumber", "band",
                    F.col("l_extendedprice").cast("double")
                    .alias("price")))


@query("exact_quantiles_by_source", """
WITH r AS (SELECT source, n_chars,
                  row_number() OVER (PARTITION BY source
                                     ORDER BY n_chars) AS rn,
                  COUNT(*) OVER (PARTITION BY source) AS cnt
           FROM documents WHERE n_chars IS NOT NULL),
qs AS (SELECT * FROM (VALUES (0.25),(0.5),(0.9)) t(q))
SELECT r.source, CAST(qs.q AS DOUBLE) AS q,
       CAST(MIN(r.n_chars) AS DOUBLE) AS value
FROM r JOIN qs ON r.rn = CAST(CEIL(qs.q * r.cnt) AS BIGINT)
GROUP BY r.source, qs.q
""")
def exact_quantiles_by_source(spark, sf_dir):
    """EXACT per-source quantiles (doc-length quartiles/p90 per
    source — the per-source calibration statistic) with bounded
    memory: every group's values normalize to [0,1] so ALL groups and
    quantiles share one histogram job per level (the level-k search
    position is one integer digit column); driver walks counts, never
    data; finals are ranked-window jobs over <= threshold-row bins.
    Contrast ``F.percentile`` per group, which buffers each group's
    full value set in the aggregation buffer.  Oracle is the per-group
    rank definition.

    r12 optimization: production sizing (the operator defaults —
    buckets=1024, threshold=65536) instead of the old demo thresholds
    (16/20) that forced ~4 refinement levels (one corpus pass each)
    at bench scale; refinement stays pinned by the operator's unit
    tests, and the per-group answers are exact under any sizing."""
    from scespet_spark.operators.pipeline import exact_quantiles_by
    docs = load_table(spark, sf_dir, "documents")
    return exact_quantiles_by(docs, "n_chars", [0.25, 0.5, 0.9],
                              "source")


@query("unigram_fit_pieces", """
SELECT TRUE AS chars_covered, TRUE AS logps_negative,
       TRUE AS has_multi_char
""")
def unigram_fit_pieces(spark, sf_dir):
    """Unigram-LM tokenizer training (the sentencepiece algorithm,
    Kudo 2018; Viterbi-EM): seed with frequent substrings, alternate
    distributed E-steps (Viterbi-segment every DISTINCT word — one
    Arrow pass over the Zipf-bounded word table per iteration) with
    driver M-steps over exact integer counts, pruning low-count
    multi-char pieces to the target vocab.

    INVARIANT oracle (the EM fixed point is an iterative optimum, not
    SQL-expressible — likelihood monotonicity, determinism under
    repartitioning, and piece-learning are pinned in
    tests/test_tokenizer.py): structural guarantees computed from the
    REAL fitted model — every character of the corpus is a piece (the
    losslessness anchor: single chars are never pruned), every
    logprob is strictly negative (a normalized distribution over >1
    piece), and the model learned at least one multi-char piece (the
    training did something)."""
    from scespet_spark.operators.text import tokens
    from scespet_spark.operators.tokenizer import unigram_fit
    docs = load_table(spark, sf_dir, "documents")
    m = unigram_fit(docs, vocab_size=44, em_iters=3)
    pieces = m.collect()  # model-sized (<= vocab_size rows)
    vocab = {r["piece"] for r in pieces}
    corpus_chars = {r["c"] for r in docs.select(
        F.explode(F.filter(
            F.split(F.array_join(tokens(F.coalesce(F.col("text"),
                                                   F.lit(""))), ""), ""),
            lambda x: x != "")).alias("c")).distinct().collect()}
    covered = corpus_chars <= vocab
    negative = all(float(r["logprob"]) < 0 for r in pieces)
    multi = any(len(r["piece"]) > 1 for r in pieces)
    return spark.createDataFrame(
        [(covered, negative, multi)],
        "chars_covered boolean, logps_negative boolean, "
        "has_multi_char boolean")


#: invariant oracle for the unigram encode (batch AND live): per doc,
#: concatenating the pieces reproduces the source's concatenated words
#: exactly (losslessness — no end-of-word markers in this family), and
#: total piece chars equal source word chars (conservation).
_UNIGRAM_TOK_ORACLE = f"""
WITH w AS ({_WORDS_CTE})
SELECT doc_id, TRUE AS lossless,
       length(array_to_string(ws, ''))::BIGINT AS n_token_chars
FROM w
"""


def _unigram_invariants(out):
    """(doc_id, lossless, n_token_chars) from a unigram_apply output —
    map-only column derivations, legal on batch and streaming plans."""
    from scespet_spark.operators.text import tokens
    recon = F.array_join("unigram_tokens", "")
    src = F.array_join(tokens(F.coalesce(F.col("text"), F.lit(""))), "")
    return out.select("doc_id", (recon == src).alias("lossless"),
                      F.length(recon).cast("long").alias("n_token_chars"))


@query("unigram_tokenize_docs", _UNIGRAM_TOK_ORACLE)
def unigram_tokenize_docs(spark, sf_dir):
    """Corpus tokenization under the fitted unigram model: Viterbi
    decoding per word, one Arrow-batched mapInPandas with a per-batch
    word memo and the (model-sized) piece table broadcast as a dict —
    the bpe_apply execution shape with a different per-word decoder.

    INVARIANT oracle (the piece SEQUENCE is a Viterbi DP optimum, not
    SQL-expressible — exact segmentations are pinned in
    tests/test_tokenizer.py): per doc, from the REAL piece arrays —
    losslessness and character conservation, both predicted by DuckDB
    from the source table alone."""
    from scespet_spark.operators.tokenizer import (unigram_apply,
                                                   unigram_fit)
    docs = load_table(spark, sf_dir, "documents")
    m = unigram_fit(docs, vocab_size=44, em_iters=3)
    return _unigram_invariants(unigram_apply(docs, m)).orderBy("doc_id")


@query("live_unigram_tokenize", _UNIGRAM_TOK_ORACLE)
def live_unigram_tokenize(spark, sf_dir):
    """Tokenization on a LIVE crawl under the snapshot's unigram
    vocabulary: the fitted piece table (the ``unigram_pieces``
    snapshot artifact — train once per snapshot) broadcasts into a
    stateless Arrow encode per micro-batch, append mode, zero state —
    arriving docs tokenize under the SAME vocabulary as the training
    corpus, the contract that keeps token counts comparable across
    crawl drops.  Same INVARIANT oracle as the batch encode
    (losslessness + char conservation per doc), computed inside the
    streaming plan."""
    from scespet_spark.operators.tokenizer import (unigram_apply,
                                                   unigram_fit)
    from scespet_spark.streaming.live import (read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    m = unigram_fit(docs, vocab_size=44, em_iters=3)
    stream = read_table_stream(spark, sf_dir, "documents")
    return (run_available_now(
        _unigram_invariants(unigram_apply(stream, m)), "append")
        .orderBy("doc_id"))


# ===========================================================================
# r10 extensions: Bloom pre-filter snapshot artifacts for the incremental
# dedup probes (r9 verdict item #1)
# ===========================================================================

#: the bloom-probed incremental election is row-identical to the plain
#: anti-join at ANY fpp (false positives resolve through the exact
#: join; false negatives are impossible for inserted keys — bloom.py),
#: so both forms share dedup_incremental's oracle.
_INC_BLOOM_ORACLE = f"""
WITH newd AS (SELECT doc_id, {h64_sql('text')} AS content_hash
              FROM documents WHERE doc_id % 3 <> 0),
prior AS (SELECT DISTINCT {h64_sql('text')} AS content_hash
          FROM documents WHERE doc_id % 3 = 0)
SELECT MIN(doc_id) AS doc_id, content_hash
FROM newd WHERE content_hash NOT IN (SELECT content_hash FROM prior)
GROUP BY content_hash
"""


@query("dedup_incremental_bloom", _INC_BLOOM_ORACLE)
def dedup_incremental_bloom(spark, sf_dir):
    """Incremental exact dedup through the snapshot Bloom pre-filter:
    the prior corpus's digest set also materializes a Bloom word table
    (one combinable bit_or aggregate — the ``bloom_digests`` snapshot
    artifact), and the crawl drop probes it MAP-SIDE: digests the
    sketch rules out of the prior skip the anti-join entirely, so the
    per-drop Exchange carries only the sketch-positive residue
    (~fpp x drop + true dups) instead of the whole drop — at a
    10^12-digest prior, the difference between a shuffle that scales
    with the DROP and one that re-processes the crawl against the
    corpus every day.  Output row-identical to dedup_incremental
    (same oracle)."""
    from scespet_spark.operators.bloom import bloom_build, bloom_row
    from scespet_spark.operators.dedup import exact_groups, incremental_keep
    docs = load_table(spark, sf_dir, "documents")
    pri_dig = (exact_groups(docs.filter(F.col("doc_id") % 3 == 0))
               .select("content_hash"))
    words, m, k = bloom_build(pri_dig, "content_hash",
                              n_items=max(1, pri_dig.count()), fpp=0.01)
    bloom = {"m": m, "k": k, "row": bloom_row(words, m)}
    return incremental_keep(docs.filter(F.col("doc_id") % 3 != 0),
                            pri_dig, prior_digest_col="content_hash",
                            prior_bloom=bloom)


@query("live_dedup_bloom", _INC_BLOOM_ORACLE)
def live_dedup_bloom(spark, sf_dir):
    """The Bloom gate on a LIVE crawl: the snapshot's Bloom word table
    broadcasts into every micro-batch as a pure-codegen membership
    test (xxhash64 + bit_get on a literal array — zero state, zero
    join, streaming-legal), splitting arrivals into definitely-novel
    rows that bypass the stream-static anti-join and a maybe residue
    that still resolves exactly against the digest table;
    ``first_wins`` then elects each surviving digest's winner across
    micro-batches.  Single-drop source = row-identical to the batch
    election (the shared oracle)."""
    from scespet_spark.operators.bloom import (bloom_attach, bloom_build,
                                               bloom_row)
    from scespet_spark.operators.dedup import exact_groups
    from scespet_spark.operators.hashing import h64
    from scespet_spark.streaming.live import (first_wins,
                                              read_table_stream,
                                              run_available_now)
    docs = load_table(spark, sf_dir, "documents")
    pri_dig = (exact_groups(docs.filter(F.col("doc_id") % 3 == 0))
               .select("content_hash"))
    words, m, k = bloom_build(pri_dig, "content_hash",
                              n_items=max(1, pri_dig.count()), fpp=0.01)
    bloom = {"m": m, "k": k, "row": bloom_row(words, m).persist()}
    stream = read_table_stream(spark, sf_dir, "documents")
    newd = (stream.filter(F.col("doc_id") % 3 != 0)
            .select("doc_id", h64(F.col("text")).alias("content_hash")))
    att = bloom_attach(newd, bloom, "content_hash")
    test = F.col("__bloom_maybe")
    maybe = (att.filter(test).drop("__bloom_maybe")
             .join(pri_dig, "content_hash", "left_anti"))
    survivors = maybe.unionByName(att.filter(~test).drop("__bloom_maybe"))
    out = first_wins(survivors, keys=["content_hash"],
                     order_cols=["doc_id"], payload_cols=["doc_id"])
    return run_available_now(out, "append").select("doc_id", "content_hash")


#: Registration-order override.  The driver's correctness gate evaluates
#: the FIRST 50 entries of ``queries()``; round 1 checked definition order
#: and left every training-pipeline operator (registered last) without a
#: driver row.  List here, in priority order, the queries that most need
#: driver evidence: (a) the LLM-pipeline operators with zero r1 rows,
#: (b) everything added or semantically changed this round, (c) one
#: representative per stream-operator family.  The already-driver-green
#: relational wrappers and the near-duplicate family members fall after
#: slot 50 — they remain covered by the local oracle gate
#: (tools/check_oracle.py runs ALL queries).
#: Queries added or semantically changed THIS round — must sit in the
#: first 50 of queries() so the driver gate re-checks them (asserted by
#: tests/test_entry_contract.py).  Rewrite each round.
_ROUND_CHANGED = [
    # semantically changed this round (r12): live_cluster_route is now
    # artifact-served (write_snapshot(cluster_labels=True) +
    # read_clusters) AND elects in-drop novel near-dup pairs to a
    # common label via a band-bucket stream-stream self-join — its
    # oracle gained the in-drop edge leg; live_idf_incremental now
    # reads the prior generation's counts from the snapshot's new
    # doc_freq artifact (read_doc_freq) instead of recounting in-query;
    # dedup_incremental_clusters likewise now reads the clusters + band
    # artifacts and bands only the drop (same oracle — the from-scratch
    # closure over all pairs)
    "live_cluster_route", "live_idf_incremental",
    "dedup_incremental_clusters", "text_idf_incremental",
    # new this round (r12): the doc_freq artifact's full
    # write/append/retract lifecycle under one from-scratch oracle;
    # OPQ serving (learned-rotation PQ); the pq_index artifact family
    # (offline ANN index: build + generation-append lifecycle, both
    # cell-exact vs the unrolled PQ CTEs)
    "snapshot_doc_freq_lifecycle", "ann_opq_adc_topk",
    "ann_pq_index_topk", "ann_pq_index_incremental_topk",
    "ann_ivfpq_index_topk", "ann_pq_index_batch_topk",
]

_PRIORITY = _ROUND_CHANGED + [
    # (verdict #3) evidence rotation, oldest driver evidence first
    # (recomputed from CORRECTNESS_r1..r11): the six r5-last-green
    # leftovers ...
    "sample_source_quota", "q2_min_cost_supplier", "q8_market_share",
    "q9_product_profit", "q21_waiting_suppliers",
    "q22_global_sales_opportunity",
    # ... the full 27-query r6-last-green cohort ...
    "ann_ivf_incremental_topk", "ann_ivfpq_topk",
    "contamination_fraction_docs", "count_buckets_scan",
    "cube_returnflag_status", "dedup_embedding_incremental",
    "dedup_incremental_near", "dedup_semantic", "dedup_winnow_pairs",
    "live_contamination_fraction", "live_count_scan",
    "live_decontaminate", "live_dedup_exact", "live_mixture_sample",
    "live_multimodal_decode", "live_perplexity_filter",
    "live_text_bigram_lm", "live_trigger_scan",
    "live_trigger_stream_scan", "mixture_sample_sources",
    "perplexity_filter_docs", "slice_scan_signup", "slice_stream_scan",
    "text_collapse_repeats", "text_winnow_fingerprints",
    "top_ngrams_source", "trailing_week_revenue",
    # ... then the first 7 (alphabetical) of the 42-query r7 cohort;
    # the rest rotate next round.  Window stays exactly 50 = the
    # driver's sample; everything rotated out remains covered by the
    # full local oracle gate (tools/check_oracle.py, all 249 queries)
    "ann_batch_topk", "ann_ivf_kmeans_codes", "ann_ivf_topk",
    "asof_broadcast_purchase_last_click", "at_single_key",
    "bind_hourly_rendezvous", "cluster_balance_sample",
]


def _reorder(d: dict) -> dict:
    head = {n: d[n] for n in _PRIORITY if n in d}
    return head | {n: v for n, v in d.items() if n not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _reorder(_QUERIES)


def oracle_sql() -> dict[str, str]:
    return _reorder(_ORACLES)
