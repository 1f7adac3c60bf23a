"""TPC-H remainder battery (Q7-Q12, Q14, Q15, Q17, Q19-Q21), adapted
to the driver's column subset (no partsupp / shipmode / commitdate /
receiptdate / container — SURVEY.md §2 testdata note).

Together with queries.py's Q1-Q6/Q13/Q16/Q18/Q22 this completes all 22
TPC-H query shapes: every decorrelation pattern (EXISTS, NOT EXISTS,
scalar subquery, correlated aggregate), conditional aggregation,
disjunctive predicate pushdown, and multi-way star joins the reference
never exercises (SURVEY §2.3 "no inner/semi joins").

Determinism follows queries.py's rules: float aggregates go through
exact DECIMAL grids sized to the true decimal width of the expression
(prices 2dp x discount 2dp -> 4dp), every output column is explicitly
aliased and cast identically on both engines, and every LIMIT has a
total order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import sum_exact
from ..sources.testdata import load_table
from .queries import register

TS = lambda s: F.lit(s).cast("timestamp")  # noqa: E731
SUM_REV = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"


def _disc_price():
    # decimal-exact revenue kernel: 2dp price x 2dp (1-disc) = 4dp exact grid
    # (built lazily — Column construction needs an active SparkContext)
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def _sum_rev():
    # rides functions.exact long-scaled fast path (aggregate contexts only)
    return sum_exact(_disc_price(), "decimal(18,4)")


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (dual-direction pair filter)
# ---------------------------------------------------------------------------


@register(
    "tpch_q7_nation_volume",
    oracle=f"""
    SELECT n1.n_name AS supp_nation,
           n2.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS l_year,
           {SUM_REV} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    """,
)
def tpch_q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume. Both nation-filtered dimension
    arms (supplier⋈nation, customer⋈nation) collapse to broadcasts, so
    the only shuffle is lineitem⋈orders on orderkey; the disjunctive
    pair filter runs after both arms attach (it references both sides).
    The shipdate range pushes to the lineitem scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= TS("1996-01-01")) & (F.col("l_shipdate") < TS("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    nation = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    joined = (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year")
    ).agg(_sum_rev().alias("revenue"))


# ---------------------------------------------------------------------------
# Q8 — national market share within a region/product slice
# ---------------------------------------------------------------------------


@register(
    "tpch_q8_market_share",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
                         THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    JOIN part     ON l_partkey = p_partkey
    WHERE r_name = 'AMERICA'
      AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: market share = conditional sum / total sum in ONE
    aggregate pass (no self-join of yearly volumes). part, and both
    nation arms broadcast; lineitem⋈orders is the lone shuffle. Both
    sums ride the same 4dp-exact decimal grid, the share division
    happens once in double on both engines."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= TS("1996-01-01")) & (F.col("o_orderdate") < TS("1998-01-01"))
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders.select("o_orderkey", "o_custkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    dec4 = _disc_price().cast("decimal(18,4)")
    national = F.when(F.col("supp_nation") == "NATION_3", dec4).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    return joined.groupBy(F.year("o_orderdate").cast("long").alias("o_year")).agg(
        (F.sum(national).cast("double") / F.sum(dec4).cast("double")).alias("mkt_share")
    )


# ---------------------------------------------------------------------------
# Q9 — product-type profit by nation and year (retailprice proxies supplycost)
# ---------------------------------------------------------------------------


@register(
    "tpch_q9_product_profit",
    headline=True,
    oracle="""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity
                         AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_type = 'STANDARD'
    GROUP BY 1, 2
    """,
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (0.6*p_retailprice*l_quantity proxies the absent
    ps_supplycost*quantity): profit per supplier nation per year. The
    profit expression stays on an exact 4dp grid (2dp price x 2dp
    discount; 1dp factor x 2dp retail x integral qty = 3dp). part and
    supplier⋈nation broadcast; the orderkey shuffle is the only one
    before the final 25-nation x 7-year aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_type") == "STANDARD")
        .select("p_partkey", "p_retailprice")
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    profit = _disc_price() - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    joined = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    )
    return joined.groupBy(
        F.col("n_name").alias("nation"), F.year("o_orderdate").cast("long").alias("o_year")
    ).agg(sum_exact(profit, "decimal(18,4)").alias("sum_profit"))


# ---------------------------------------------------------------------------
# Q10 — returned-item ranking (top 20 customers by lost revenue)
# ---------------------------------------------------------------------------


@register(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {SUM_REV} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      AND o_orderdate < TIMESTAMP '1997-04-01'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: revenue lost to returns, top-20 customers. The
    returnflag filter pushes to the lineitem scan and the quarter
    filter to orders; nation broadcasts; c_custkey breaks revenue ties
    so the LIMIT is a total order. Aggregating on the customer key
    FIRST and attaching name/balance via the (already broadcast)
    customer row avoids shuffling the wide customer columns."""
    cutoff_lo, cutoff_hi = TS("1997-01-01"), TS("1997-04-01")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    per_cust = (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(_sum_rev().alias("revenue"))
    )
    enriched = per_cust.join(
        F.broadcast(
            cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")).select(
                "c_custkey", "c_name", "c_acctbal", "n_name"
            )
        ),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    return (
        enriched.select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q11 — important stock: parts above a global-total value threshold
# ---------------------------------------------------------------------------


@register(
    "tpch_q11_important_parts",
    oracle="""
    WITH scoped AS (
        SELECT l_partkey,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS val
        FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        WHERE s_nationkey IN (0, 1)
    ),
    per_part AS (
        SELECT l_partkey, CAST(SUM(val) AS DOUBLE) AS part_value
        FROM scoped GROUP BY 1
    ),
    total AS (
        SELECT CAST(SUM(val) AS DOUBLE) AS t,
               COUNT(DISTINCT l_partkey) AS n_parts
        FROM scoped
    )
    SELECT l_partkey, part_value
    FROM per_part, total
    WHERE part_value > 3.0 * (t / n_parts)
    """,
)
def tpch_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (lineitem value standing in for ps_supplycost*availqty):
    parts whose traded value within the nation scope exceeds 3x the mean
    part value — the real Q11's fixed-fraction cutoff degenerates to 0
    rows as the part count grows (its spec scales the fraction by 1/SF),
    so the threshold is expressed scale-invariantly. The
    HAVING-over-global-total scalar subquery becomes a one-row broadcast
    cross join — both aggregates share the same decimal grid so the
    threshold comparison is bit-identical across engines."""
    supp = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey").isin(0, 1))
        .select("s_suppkey")
    )
    scoped = (
        load_table(spark, sf_dir, "lineitem")
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("l_partkey", _disc_price().cast("decimal(18,4)").alias("val"))
    )
    per_part = scoped.groupBy("l_partkey").agg(F.sum("val").cast("double").alias("part_value"))
    total = scoped.agg(
        F.sum("val").cast("double").alias("t"),
        F.countDistinct("l_partkey").alias("n_parts"),
    )
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("part_value") > F.lit(3.0) * (F.col("t") / F.col("n_parts")))
        .select("l_partkey", "part_value")
    )


# ---------------------------------------------------------------------------
# Q12 — late-shipment priority distribution (linestatus stands in for shipmode)
# ---------------------------------------------------------------------------


@register(
    "tpch_q12_late_priority",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
               AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
               AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate + INTERVAL 90 DAY
      AND l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def tpch_q12_late_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (l_shipdate lag > 90 days stands in for the absent
    receipt/commit dates; l_linestatus for l_shipmode): conditional
    counts by priority class over late shipments. The year filter
    pushes to the lineitem scan; the lateness predicate references
    both sides so it rides on the orderkey join; the two CASE counts
    are one aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= TS("1997-01-01")) & (F.col("l_shipdate") < TS("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate", "o_orderpriority")
    joined = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return joined.groupBy("l_linestatus").agg(
        F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
        F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
    )


# ---------------------------------------------------------------------------
# Q14 — promotion effect (conditional revenue share, single row)
# ---------------------------------------------------------------------------


@register(
    "tpch_q14_promo_effect",
    oracle="""
    SELECT (100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE))
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS promo_revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      AND l_shipdate < TIMESTAMP '1997-10-01'
    """,
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: % of one month's revenue from PROMO parts. part
    broadcasts into the month-filtered lineitem scan — zero shuffles,
    one global aggregate; numerator and denominator share the 4dp
    decimal grid and divide once in double."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= TS("1997-09-01")) & (F.col("l_shipdate") < TS("1997-10-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    dec4 = _disc_price().cast("decimal(18,4)")
    promo = F.when(F.col("p_type") == "PROMO", dec4).otherwise(F.lit(0).cast("decimal(18,4)"))
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                (F.lit(100.0) * F.sum(promo).cast("double")) / F.sum(dec4).cast("double")
            ).alias("promo_revenue")
        )
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier(s) by quarterly revenue (scalar-max subquery)
# ---------------------------------------------------------------------------


@register(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {SUM_REV} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1997-04-01'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM revenue JOIN supplier ON supplier_no = s_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) hitting the quarter's max revenue. The
    view + scalar subquery becomes one aggregate reused for both the
    per-supplier revenue and its broadcast one-row max — the revenue
    relation is computed once (cached via a local checkpoint-free
    reuse; Spark reuses the exchange under AQE). Equality on the
    decimal-derived double is exact, so ties all surface."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= TS("1997-01-01")) & (F.col("l_shipdate") < TS("1997-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _sum_rev().alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.join(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated per-part average)
# ---------------------------------------------------------------------------


@register(
    "tpch_q17_small_qty_revenue",
    oracle="""
    WITH part_avg AS (
        SELECT l_partkey AS avg_partkey,
               0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                      / COUNT(l_quantity)) AS qty_threshold
        FROM lineitem GROUP BY 1
    )
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN part_avg ON l_partkey = avg_partkey
    WHERE p_brand = 'Brand#3' AND p_size < 15
      AND l_quantity < qty_threshold
    """,
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (p_size < 15 stands in for the absent p_container):
    revenue from orders below 20% of the part's average quantity. The
    correlated AVG subquery decorrelates into one groupBy over
    lineitem joined back by partkey; the brand filter narrows part to
    a broadcast. The threshold (0.2 * decimal-exact mean) is computed
    identically on both engines before the < comparison."""
    li = load_table(spark, sf_dir, "lineitem")
    part = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    part_avg = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (
            F.lit(0.2)
            * (F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double") / F.count("l_quantity"))
        ).alias("qty_threshold")
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("l_partkey") == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast("double") / F.lit(7.0)).alias(
                "avg_yearly"
            )
        )
    )


# ---------------------------------------------------------------------------
# Q19 — disjunctive predicate revenue (brand x size x quantity bands)
# ---------------------------------------------------------------------------


@register(
    "tpch_q19_disjunctive_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)
           AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
    """,
)
def tpch_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (size/quantity bands stand in for container/shipmode):
    three-way disjunctive join predicate. The part arm filters to the
    union of brand x size bands BEFORE broadcasting (partial pushdown
    of the disjunction), the quantity bands apply post-join — same
    split Catalyst derives for the real Q19."""
    part_pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15))
    )
    part = load_table(spark, sf_dir, "part").filter(part_pred).select("p_partkey", "p_brand", "p_size")
    li = load_table(spark, sf_dir, "lineitem")
    full_pred = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 5) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 10) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(full_pred)
        .agg(_sum_rev().alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q20 — part-promotion suppliers (nested semi-join with correlated aggregate)
# ---------------------------------------------------------------------------


@register(
    "tpch_q20_promo_suppliers",
    oracle="""
    WITH shipped AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS supp_qty_dec
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2
    ),
    windowed AS (
        SELECT l_suppkey,
               CAST(supp_qty_dec AS DOUBLE) AS supp_qty,
               CAST(SUM(supp_qty_dec) OVER (PARTITION BY l_partkey) AS DOUBLE) AS part_total
        FROM shipped
    ),
    dominant AS (
        SELECT DISTINCT l_suppkey FROM windowed WHERE supp_qty > 0.5 * part_total
    )
    SELECT s_suppkey, s_name
    FROM supplier JOIN dominant ON s_suppkey = l_suppkey
    """,
)
def tpch_q20_promo_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (dominance over a part's yearly flow stands in
    for the availqty > 0.5*shipped test): suppliers who shipped more
    than half of some PROMO part's 1997 volume. The correlated
    per-part total decorrelates into a window sum over the
    (suppkey, partkey) aggregate — one shuffle keyed by partkey — and
    the IN-subquery becomes a left-semi broadcast join into supplier."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= TS("1997-01-01")) & (F.col("l_shipdate") < TS("1998-01-01"))
    )
    shipped = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("supp_qty_dec"))
    )
    # window-over-aggregate: per-part total without rescanning lineitem;
    # the window partitions on the grouping key, so no extra shuffle
    shipped = shipped.select(
        "l_suppkey",
        "l_partkey",
        F.col("supp_qty_dec").cast("double").alias("supp_qty"),
        F.sum("supp_qty_dec").over(Window.partitionBy("l_partkey")).cast("double").alias("part_total"),
    )
    dominant = (
        shipped.filter(F.col("supp_qty") > F.lit(0.5) * F.col("part_total"))
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return supp.join(
        F.broadcast(dominant), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS pair)
# ---------------------------------------------------------------------------


@register(
    "tpch_q21_waiting_supplier",
    headline=True,
    oracle="""
    WITH per_order AS (
        SELECT l_orderkey,
               MAX(l_shipdate) AS max_ship,
               COUNT(DISTINCT l_suppkey) AS n_supp
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY 1
    ),
    at_max AS (
        SELECT DISTINCT l.l_orderkey, l.l_suppkey, p.n_supp
        FROM lineitem l JOIN per_order p ON l.l_orderkey = p.l_orderkey
        WHERE l.l_shipdate = p.max_ship
    ),
    blamed AS (
        SELECT l_orderkey, MIN(l_suppkey) AS l_suppkey
        FROM at_max
        WHERE n_supp > 1
        GROUP BY 1
        HAVING COUNT(*) = 1
    )
    SELECT s_name, COUNT(*) AS numwait
    FROM blamed JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY 1
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def tpch_q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (last shipper stands in for the commit/receipt-date
    lateness test): for finished multi-supplier orders, blame the
    supplier who UNIQUELY shipped last — EXISTS(another supplier) AND
    NOT EXISTS(another equally-late supplier), decorrelated into one
    per-order aggregate + an equality join back on (orderkey,
    max_ship). Two shuffles on orderkey (same key — AQE reuses the
    exchange), then a broadcast of the tiny blamed set into supplier."""
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    li = load_table(spark, sf_dir, "lineitem").join(
        orders, F.col("l_orderkey") == F.col("o_orderkey")
    ).select("l_orderkey", "l_suppkey", "l_shipdate")
    per_order = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.countDistinct("l_suppkey").alias("n_supp"),
    )
    at_max = (
        li.join(
            per_order.withColumnRenamed("l_orderkey", "po_orderkey"),
            (F.col("l_orderkey") == F.col("po_orderkey")) & (F.col("l_shipdate") == F.col("max_ship")),
        )
        .select("l_orderkey", "l_suppkey", "n_supp")
        .distinct()
    )
    blamed = (
        at_max.filter(F.col("n_supp") > 1)
        .groupBy("l_orderkey")
        .agg(F.min("l_suppkey").alias("l_suppkey"), F.count(F.lit(1)).alias("n_at_max"))
        .filter(F.col("n_at_max") == 1)
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        blamed.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
