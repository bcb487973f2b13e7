"""Relational / TPC-H-shaped queries (rel_*) + their oracles.

Split from the original single-module registry (r6 verdict item 7);
bodies are unchanged — see git history of queries.py.
"""
from __future__ import annotations
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession, Window, functions as F
from ..operators import dedup, events, similarity, text
from ..operators.scale import fit_and_apply_scale
from ..operators.split import normalize_split, split_histogram_df
from ..operators.vocabulary import (
    apply_vocabulary,
    fit_vocabulary,
    fit_vocabulary_large,
)
from ._shared import (
    _PROFILE_COLS,
    _t,
)


def q_rel_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary. Money sums via DECIMAL (exact)."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= "1998-09-02")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    out = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("_sq"),
            F.sum(dec("l_extendedprice")).alias("_sbp"),
            F.sum(disc_price).alias("_sdp"),
            F.sum(charge).alias("_sc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_sbp").cast("double").alias("sum_base_price"),
            F.col("_sdp").cast("double").alias("sum_disc_price"),
            F.col("_sc").cast("double").alias("sum_charge"),
            (F.col("_sq").cast("double") / F.col("count_order")).alias("avg_qty"),
            "count_order",
        )
    )
    return out

ORACLE_REL_Q1 = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""

def q_rel_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3-style: top-10 revenue orders for one market segment.
    Dimension side (customer filter) broadcasts; revenue in DECIMAL."""
    cust = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,6)")
        .alias("rev"),
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("o_orderkey")
        .agg(F.sum("rev").alias("_r"))
        .select("o_orderkey", F.col("_r").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )

ORACLE_REL_TOP_ORDERS = """
SELECT o_orderkey,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderkey
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""

def q_rel_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style: revenue by supplier nation within one region.
    All dimension joins (region/nation/supplier) broadcast; only
    lineitem<->orders is a shuffled join."""
    region = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation")
    supp = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    dims = (
        supp.join(
            F.broadcast(nation.join(region, nation.n_regionkey == region.r_regionkey)),
            supp.s_nationkey == F.col("n_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(F.sum(rev).alias("_r"))
        .select("n_name", F.col("_r").cast("double").alias("revenue"))
    )

ORACLE_REL_REGION_REVENUE = """
SELECT n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01'
GROUP BY n_name
"""

def q_rel_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 suppliers per nation by account balance (window top-k)."""
    from pyspark.sql import Window

    supp = _t(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.desc("s_acctbal"), F.asc("s_suppkey")
    )
    return (
        supp.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 3)
        .select(
            F.col("s_nationkey").cast("long").alias("s_nationkey"),
            "s_suppkey",
            "s_acctbal",
            "rk",
        )
    )

def q_rel_topk_per_group_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same top-3-per-nation result via the salted two-phase rewrite
    (operators/skew.py): per-(key, salt) pre-rank bounds every final
    window partition at salt_buckets * k rows, so a pathologically hot
    key cannot pin one task. Identical oracle to rel_topk_per_group."""
    from ..operators.skew import salted_topk_per_key

    supp = _t(spark, sf_dir, "supplier")
    return salted_topk_per_key(
        supp,
        ["s_nationkey"],
        [F.desc("s_acctbal"), F.asc("s_suppkey")],
        k=3,
        salt_on="s_suppkey",
    ).select(
        F.col("s_nationkey").cast("long").alias("s_nationkey"),
        "s_suppkey",
        "s_acctbal",
        "rk",
    )

ORACLE_REL_TOPK_PER_GROUP = """
SELECT CAST(s_nationkey AS BIGINT) AS s_nationkey, s_suppkey, s_acctbal,
       CAST(rk AS BIGINT) AS rk
FROM (
  SELECT s_nationkey, s_suppkey, s_acctbal,
         row_number() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal DESC, s_suppkey) AS rk
  FROM supplier
) WHERE rk <= 3
"""

def q_rel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation over returnflag/linestatus (grouping sets)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "n",
            "sum_qty",
        )
    )

ORACLE_REL_ROLLUP = """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       count(*) AS n,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""

def q_rel_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set operation: customers with orders but none above 400k
    (EXCEPT), as a left-anti-style set difference."""
    orders = _t(spark, sf_dir, "orders")
    with_orders = orders.select("o_custkey").distinct()
    big = orders.where(F.col("o_totalprice") > 400000).select("o_custkey").distinct()
    return with_orders.exceptAll(big).select(F.col("o_custkey").alias("custkey"))

ORACLE_REL_SET_OPS = """
SELECT o_custkey AS custkey FROM orders
EXCEPT
SELECT o_custkey FROM orders WHERE o_totalprice > 400000
"""

def q_rel_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order counts by status per priority."""
    orders = _t(spark, sf_dir, "orders")
    return (
        orders.groupBy(F.col("o_orderpriority").alias("priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )

ORACLE_REL_PIVOT = """
SELECT o_orderpriority AS priority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
       count(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
       count(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
FROM orders GROUP BY o_orderpriority
"""

def q_rel_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no order above 300k (NOT EXISTS)."""
    cust = _t(spark, sf_dir, "customer")
    big_orders = _t(spark, sf_dir, "orders").where(F.col("o_totalprice") > 300000)
    return cust.join(
        big_orders, cust.c_custkey == big_orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")

ORACLE_REL_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
"""

def q_rel_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-style: orders whose total quantity exceeds 150 (HAVING over a
    shuffled agg, then a semi-join back to order/customer attributes)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_q"))
        .where(F.col("_q") > 150)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    return big.join(
        orders, big.l_orderkey == orders.o_orderkey
    ).select("o_orderkey", "o_custkey", "o_totalprice", "total_qty")

ORACLE_REL_BIG_ORDERS = """
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT o_orderkey, o_custkey, o_totalprice, total_qty
FROM big JOIN orders ON l_orderkey = o_orderkey
"""

def q_rel_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer order total over time (ordered window agg)."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )

ORACLE_REL_RUNNING_SUM = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
FROM orders
"""

def q_rel_above_avg_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their customer's average (correlated scalar
    subquery): declared via spark.sql so Catalyst's subquery
    decorrelation — rewrite to aggregate + join — does the planning."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("__orders_v")
    # price > avg  <=>  price * n > sum, kept in DECIMAL so the comparison
    # is exact on both engines (avg-of-doubles could flip membership of a
    # row sitting within one ulp of its group mean).
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM __orders_v o
        WHERE CAST(o_totalprice AS DECIMAL(18,2))
              * (SELECT count(*) FROM __orders_v i WHERE i.o_custkey = o.o_custkey)
              > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM __orders_v i
                 WHERE i.o_custkey = o.o_custkey)
        """
    )

ORACLE_REL_ABOVE_AVG = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE CAST(o_totalprice AS DECIMAL(18,2))
      * (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
      > (SELECT sum(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders i
         WHERE i.o_custkey = o.o_custkey)
"""

def q_rel_moving_sum_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-day moving order total per customer — a RANGE window frame
    (value-based bounds over the order-date day number, unlike the
    ROWS frame in rel_running_sum)."""
    from pyspark.sql import Window

    orders = _t(spark, sf_dir, "orders").withColumn(
        "__day", F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("__day")
        .rangeBetween(-30, 0)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("moving_30d_total"),
    )

ORACLE_REL_MOVING_SUM = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey
                  ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
                  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS moving_30d_total
FROM orders
"""

def q_rel_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median + p90 of quantity per return flag."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
    )

ORACLE_REL_MEDIAN = """
SELECT l_returnflag,
       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
FROM lineitem GROUP BY l_returnflag
"""

def q_rel_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14-style promo revenue share per brand: lineitem x part join +
    conditional aggregation. No forced broadcast — at TPC-H ratios the
    part dimension tracks fact size, so Catalyst/AQE picks the join
    strategy from measured sizes (broadcast at this SF, shuffled at
    100 TB)."""
    li = _t(spark, sf_dir, "lineitem")
    part = _t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    promo = F.when(F.col("p_type").startswith("PROMO"), rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(rev).alias("_r"),
            F.sum(promo).alias("_p"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            "p_brand",
            F.col("_r").cast("double").alias("revenue"),
            F.round(
                (F.col("_p") * 100).cast("double") / F.col("_r").cast("double"), 6
            ).alias("promo_pct"),
            "n_items",
        )
    )

ORACLE_REL_PROMO_REVENUE = """
SELECT p_brand,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)
         AS revenue,
       round(CAST(100 * sum(CASE WHEN p_type LIKE 'PROMO%'
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                 ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE),
             6) AS promo_pct,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""

def q_rel_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all 4 grouping combinations
    in one pass (Spark expands grouping sets before the hash aggregate)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_qty"),
    )

ORACLE_REL_CUBE = """
SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
"""

def q_rel_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-bounded-pass column profiler over orders: counts, nulls,
    native min/max, and stacked-HLL distinct estimates (all columns'
    sketches built in ONE shuffle whose key space is C x 2^b registers).
    String/int/date columns only in the registered query — their string
    forms are canonical across engines, so the md5-hashed HLL and the
    min/max render identically."""
    from ..operators.profile import profile_table

    return profile_table(
        _t(spark, sf_dir, "orders"), columns=list(_PROFILE_COLS), b=10
    )

def _oracle_rel_profile() -> str:
    blocks = []
    for c in _PROFILE_COLS:
        blocks.append(f"""
SELECT '{c}' AS column,
       (SELECT count(*) FROM orders) AS n_rows,
       (SELECT count(*) FROM orders WHERE {c} IS NULL) AS n_nulls,
       (
         WITH h AS (
           SELECT ('0x' || substr(md5(':' || {c}::VARCHAR), 1, 12))::BIGINT AS h48
           FROM orders WHERE {c} IS NOT NULL
         ),
         parts AS (
           SELECT (h48 // 4294967296) % 1024 AS reg, h48 % 4294967296 AS tail FROM h
         ),
         regs AS (
           SELECT reg, max(CASE WHEN tail = 0 THEN 33
                                ELSE 33 - length(bin(tail)) END) AS max_rho
           FROM parts GROUP BY reg
         ),
         agg AS (
           SELECT sum(power(2.0, -max_rho)) AS inv_sum, count(*) AS n_nonzero
           FROM regs
         )
         SELECT CAST(round(CASE WHEN raw_est <= 2560.0 AND nz > 0
                           THEN 1024 * ln(1024.0 / nz) ELSE raw_est END) AS BIGINT)
         FROM (
           SELECT round(0.7213 / (1.0 + 1.079 / 1024) * 1024 * 1024
                        / (inv_sum + (1024 - n_nonzero)), 4) AS raw_est,
                  CAST(1024 - n_nonzero AS BIGINT) AS nz
           FROM agg
         )
       ) AS n_distinct_est,
       (SELECT min({c})::VARCHAR FROM orders) AS min_value,
       (SELECT max({c})::VARCHAR FROM orders) AS max_value""")
    return "\nUNION ALL\n".join(blocks)

def q_rel_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph analytics: 5-iteration PageRank over the
    undirected customer<->supplier trading graph (edges = distinct
    (custkey, suppkey) pairs through orders x lineitem; node ids
    namespaced 2k / 2k+1). Fixed-point bigint arithmetic end-to-end,
    so the distributed join-agg loop and the SQL recursive-CTE oracle
    agree EXACTLY — no float tolerance."""
    from ..operators.graph import pagerank

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    return pagerank(edges, iterations=5)

def _oracle_pagerank(iterations: int = 5) -> str:
    """Unrolled fixed-point PageRank oracle: one CTE per iteration
    (DuckDB's recursive-CTE semantics around aggregates in the
    recursive term diverge after the first step, so the loop is
    unrolled mechanically — every arithmetic op is integer, matching
    the engine exactly)."""
    steps = []
    prev = "r0"
    for i in range(1, iterations + 1):
        steps.append(
            f"r{i} AS (\n"
            f"  SELECT nd.node,\n"
            f"         CAST((15 * 1000000000000) // (100 * pa.n)\n"
            f"              + (85 * agg.s) // 100 AS BIGINT) AS rank_units\n"
            f"  FROM (\n"
            f"    SELECT e.dst AS node, sum(p.rank_units // o.odeg) AS s\n"
            f"    FROM {prev} p\n"
            f"    JOIN outdeg o ON p.node = o.node\n"
            f"    JOIN edges e ON e.src = p.node\n"
            f"    GROUP BY e.dst\n"
            f"  ) agg JOIN nodes nd ON agg.node = nd.node, params pa\n"
            f")"
        )
        prev = f"r{i}"
    return (
        """
WITH
pairs AS (
  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT src, dst FROM pairs UNION SELECT dst AS src, src AS dst FROM pairs
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst AS node FROM edges),
outdeg AS (SELECT src AS node, count(*) AS odeg FROM edges GROUP BY src),
params AS (SELECT count(*) AS n FROM nodes),
r0 AS (
  SELECT node, CAST(1000000000000 // pa.n AS BIGINT) AS rank_units
  FROM nodes, params pa
),
"""
        + ",\n".join(steps)
        + f"""
SELECT node, rank_units,
       CAST(rank_units AS DOUBLE) / 1000000000000.0 AS rank
FROM {prev}
"""
    )

def q_rel_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational demo (TPC-H Q13 shape): distribution of customers by
    order count INCLUDING zero-order customers — a left outer join into
    a double aggregation, the one grouped shape the other rel demos
    don't cover."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    per = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("long").alias("custdist")
    ).select(F.col("c_count").cast("long").alias("c_count"), "custdist")

ORACLE_REL_CUSTDIST = """
SELECT CAST(c_count AS BIGINT) AS c_count,
       CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
"""

def q_rel_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8-style national market share: per order year, the fraction of
    ASIA-customer revenue supplied by suppliers from one nation
    (n_nationkey = 0). Six-table join where every dimension chain
    (supplier->nation, customer->nation->region) broadcasts; the only
    fact-side shuffle is lineitem->orders on the order key, then one
    bounded per-year aggregate. The share is a conditional-sum ratio —
    no second pass over the facts."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(18,6)")
        .alias("rev"),
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year")
    )
    nation = _t(spark, sf_dir, "nation")
    cust_asia = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(
                _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .select("s_suppkey", (F.col("s_nationkey") == 0).alias("is_target"))
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust_asia), orders.o_custkey == cust_asia.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("is_target"), F.col("rev"))).alias("_t"),
            F.sum("rev").alias("_a"),
        )
        .select(
            F.col("o_year").cast("long").alias("o_year"),
            # NULL (not 0) when no target-nation revenue exists for the
            # year — matches the oracle's conditional-sum semantics on
            # the zero-revenue edge (r4 advice).
            F.round(
                F.col("_t").cast("double") / F.col("_a").cast("double"), 6
            ).alias("mkt_share"),
            F.col("_a").cast("double").alias("total_revenue"),
        )
    )

ORACLE_REL_MARKET_SHARE = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CASE WHEN s_nationkey = 0
                 THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                 END) AS DOUBLE)
             / CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                             AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
            AS DOUBLE) AS total_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE r_name = 'ASIA'
GROUP BY 1
"""

def q_rel_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic over the three fact-table shuffle keys
    (customer key on orders; supplier and part keys on lineitem) — the
    profile a planner reads before choosing salting factors or AQE
    skew-join thresholds."""
    from ..operators.skew import key_skew_profile

    return key_skew_profile(
        [
            ("orders.o_custkey", _t(spark, sf_dir, "orders"), "o_custkey"),
            ("lineitem.l_suppkey", _t(spark, sf_dir, "lineitem"), "l_suppkey"),
            ("lineitem.l_partkey", _t(spark, sf_dir, "lineitem"), "l_partkey"),
        ]
    )

def _oracle_key_skew() -> str:
    blocks = []
    for label, table, key in (
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
    ):
        blocks.append(f"""
SELECT '{label}' AS key,
       CAST(sum(f) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       round(CAST(sum(f) AS DOUBLE) / count(*), 6) AS avg_freq,
       round(quantile_cont(f, 0.5), 6) AS p50_freq,
       round(quantile_cont(f, 0.99), 6) AS p99_freq,
       CAST(max(f) AS BIGINT) AS max_freq,
       round(CAST(max(f) AS DOUBLE) / (CAST(sum(f) AS DOUBLE) / count(*)), 6)
         AS skew_ratio,
       round(CAST(max(f) AS DOUBLE) / sum(f), 6) AS top_share,
       CAST(ceil(CAST(max(f) AS DOUBLE)
                 / greatest(quantile_cont(f, 0.5), 1.0)) AS BIGINT)
         AS suggested_salt
FROM (SELECT {key}, count(*) AS f FROM {table} GROUP BY {key})
""")
    return " UNION ALL ".join(blocks)

def q_rel_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21-style 'suppliers who kept orders waiting': per supplier, the
    orders where THEY were the only late shipper among multiple
    suppliers (late = shipped > 60 days after the order date; the
    testdata has no receipt/commit dates, so lateness adapts Q4's
    predicate).

    The textbook form is a correlated EXISTS + NOT-EXISTS pair — four
    probes of lineitem per row. The scalable reformulation here is a
    TWO-LEVEL aggregation keyed on the order: lines collapse first to
    (order, supplier, ever-late) — a partial agg with map-side combine
    that also avoids the Expand operator a multi-countDistinct agg
    would compile to (3x the shuffled rows) — then per order plain
    counts give supplier cardinality, late-supplier cardinality, and
    the sole late supplier; an order qualifies iff (n_supp > 1,
    n_late_supp = 1). One lineitem shuffle total, then a
    supplier-cardinality groupBy and a broadcast name join — the
    EXISTS semantics fall out of the counts. The DuckDB oracle runs
    the textbook correlated form, so the equivalence is checked, not
    assumed."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).withColumn(
        "__late",
        F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS"),
    )
    per_supp = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("__late").alias("__late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("__n_supp"),
        F.sum(F.col("__late").cast("int")).alias("__n_late"),
        F.min(F.when(F.col("__late"), F.col("l_suppkey"))).alias("__late_supp"),
    )
    waits = (
        per_order.where((F.col("__n_supp") > 1) & (F.col("__n_late") == 1))
        .groupBy("__late_supp")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
    )
    return waits.join(
        F.broadcast(supplier), waits["__late_supp"] == supplier["s_suppkey"]
    ).select("s_name", "numwait")

ORACLE_REL_WAITING_SUPPLIER = """
SELECT s_name, CAST(count(DISTINCT l1.l_orderkey) AS BIGINT) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
"""

def q_rel_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11-style 'important stock': parts whose revenue exceeds 1.5x
    the mean per-part revenue (a scale-invariant threshold — a fixed
    share-of-total fraction selects nothing as the part count grows).
    The global (total, count) enters as a broadcast scalar (one-row
    cross join), never re-aggregating the fact table; the per-part and
    global sums are EXACT decimal, so the threshold comparison is
    engine-portable at the boundary."""
    li = _t(spark, sf_dir, "lineitem")
    val = (F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))).cast(
        "decimal(18,4)"
    )
    per_part = li.groupBy("l_partkey").agg(F.sum(val).alias("__value"))
    total = per_part.agg(
        F.sum("__value").alias("__total"),
        F.count(F.lit(1)).cast("long").alias("__n"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("__value").cast("double")
            > F.col("__total").cast("double")
            / F.col("__n").cast("double")
            * F.lit(1.5)
        )
        .select(
            "l_partkey",
            F.round(F.col("__value").cast("double"), 2).alias("part_value"),
        )
    )

ORACLE_REL_IMPORTANT_PARTS = """
WITH pp AS (
  SELECT l_partkey,
         sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS v
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT sum(v) AS t, CAST(count(*) AS BIGINT) AS n FROM pp)
SELECT l_partkey, round(CAST(v AS DOUBLE), 2) AS part_value
FROM pp, tot
WHERE CAST(v AS DOUBLE) > CAST(t AS DOUBLE) / CAST(n AS DOUBLE) * 1.5
"""

def q_rel_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22-style 'global sales opportunity' (adapted to nations — the
    testdata has no phone column): customers in a target nation set
    whose balance exceeds the average POSITIVE balance of that set and
    who have placed no URGENT order, counted per nation. Three classic
    shapes in one plan: a broadcast scalar subquery (the average), a
    LEFT-ANTI join against orders (the NOT EXISTS), and a group
    rollup; the anti-join is equi-keyed on custkey — AQE-splittable,
    and at scale the orders side collapses to distinct custkeys before
    probing. The decimal-exact average keeps the threshold boundary
    engine-portable."""
    nations = [1, 3, 5, 7]
    cust = _t(spark, sf_dir, "customer").where(
        F.col("c_nationkey").isin(nations)
    )
    avg_row = cust.where(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("__avg")
    )
    elig = cust.crossJoin(F.broadcast(avg_row)).where(
        F.col("c_acctbal") > F.col("__avg")
    )
    orders = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    idle = elig.join(
        orders, elig["c_custkey"] == orders["o_custkey"], "left_anti"
    )
    return idle.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).cast("long").alias("n_custs"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double"), 2
        ).alias("total_acctbal"),
    )

ORACLE_REL_IDLE_CUSTOMERS = """
WITH avg_bal AS (
  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS a
  FROM customer
  WHERE c_nationkey IN (1, 3, 5, 7) AND c_acctbal > 0
)
SELECT c_nationkey AS nationkey,
       CAST(count(*) AS BIGINT) AS n_custs,
       round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 2)
         AS total_acctbal
FROM customer, avg_bal
WHERE c_nationkey IN (1, 3, 5, 7)
  AND c_acctbal > a
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""

def q_rel_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4-style order-priority check: orders with at least one line item
    shipped more than 60 days after the order date, counted per
    priority. The EXISTS becomes a LEFT-SEMI join on the order key with
    the date comparison as a residual predicate — equi-keyed (AQE
    skew-splittable), never a range cross product, and the semi form
    stops probing an order at its first late line."""
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.expr("o_orderdate + INTERVAL 60 DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("late_orders")
    )

ORACLE_REL_ORDER_PRIORITY = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS late_orders
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey
    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
GROUP BY 1
"""

def q_rel_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17-style small-quantity revenue: for one brand's parts, the
    total revenue of lineitems whose quantity is below 20% of that
    part's average quantity. The textbook CORRELATED scalar subquery is
    decorrelated into one pre-aggregated join: per-part floors are
    computed ONCE over the brand-filtered lineitems (a partial-agg
    groupBy bounded by the brand's part count) and broadcast back —
    the probe never evaluates a subquery per row. The brand-scoped
    3-column frame (one brand ~ 1/25 of parts) feeds BOTH the floor
    fit and the probe, so it is materialized once (localCheckpoint)
    instead of scanning lineitem twice. The DuckDB oracle keeps the
    correlated textbook form, so the hash-match doubles as a
    decorrelation-equivalence proof (the Q21 pattern the r4 review
    called out)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_parts = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == "Brand#3")
        .select("p_partkey")
    )
    scoped = li.join(
        F.broadcast(brand_parts), li.l_partkey == brand_parts.p_partkey
    ).localCheckpoint(eager=True)
    floors = scoped.groupBy("l_partkey").agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
            * F.lit(0.2)
        ).alias("qty_floor")
    ).withColumnRenamed("l_partkey", "f_partkey")
    return (
        scoped.join(
            F.broadcast(floors), scoped.l_partkey == floors.f_partkey
        )
        .where(F.col("l_quantity") < F.col("qty_floor"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,6)")).cast(
                    "double"
                )
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )

ORACLE_REL_SMALL_QTY_REVENUE = """
SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
             / 7.0, 4) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#3'
  AND l_quantity < (
    SELECT CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
           / count(*) * 0.2
    FROM lineitem l2 WHERE l2.l_partkey = p_partkey
  )
"""

def q_rel_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15-style top supplier: the supplier(s) with maximal revenue
    over one shipdate quarter — revenue per supplier is a partial-agg
    groupBy on exact DECIMAL sums (engine-exact, so the max-equality
    join has no float-tie hazard), and the maximum arrives as a
    broadcast single-row aggregate joined back. No global window, no
    second fact scan."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    # rev is supplier-cardinality-bounded and feeds BOTH the max
    # aggregate and the equality join — materialize once instead of
    # re-scanning lineitem for each consumer.
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(18,6)"
                )
            ).alias("total_revenue")
        )
        .localCheckpoint(eager=True)
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), rev.total_revenue == mx.__mx)
        .join(F.broadcast(supp), rev.l_suppkey == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )

ORACLE_REL_TOP_SUPPLIER = """
WITH rev AS (
  SELECT l_suppkey,
         sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)))
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_revenue AS DOUBLE) AS total_revenue
FROM rev JOIN supplier ON s_suppkey = l_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""

def q_rel_discount_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6-style forecast-revenue-change: one shipyear of lineitems in a
    discount band below a quantity ceiling, summed as price*discount.
    Deliberately join-free — the whole query is a scan whose
    date/discount/quantity predicates ALL push into the parquet reader
    (PushedFilters), a 4-column pruned read, and one partial aggregate.
    The plan IS the pushdown showcase."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (F.col("l_extendedprice") * F.col("l_discount")).cast(
        "decimal(18,6)"
    )
    return (
        li.where(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )

ORACLE_REL_DISCOUNT_REVENUE = """
SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,6)))
            AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""

def q_rel_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7-style volume shipping: yearly revenue flowing between two
    nations in BOTH directions (supplier nation -> customer nation).
    The supplier side collapses to a broadcast 2-nation map before
    touching facts; the customer side is nation-filtered but joined by
    shuffle (at 100 TB 2/25 of all customers does NOT broadcast);
    lineitem<->orders is the single fact-to-fact shuffle, and the
    direction filter runs on the two-value dimension columns
    post-join."""
    nation = _t(spark, sf_dir, "nation").where(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cust = (
        _t(spark, sf_dir, "customer")
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(rev).alias("_r"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.col("_r").cast("double").alias("revenue"),
        )
    )

ORACLE_REL_NATION_VOLUME = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INTEGER) AS l_year,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE sn.n_name IN ('NATION_1', 'NATION_2')
  AND cn.n_name IN ('NATION_1', 'NATION_2')
  AND sn.n_name <> cn.n_name
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY 1, 2, 3
"""

def q_rel_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-style returned-item report: top-20 customers by revenue lost
    to returns in one quarter. The quarter filter shrinks orders before
    the fact shuffle and the returnflag filter pushes into the lineitem
    scan; revenue aggregates AT CUSTOMER GRAIN FIRST (one fact
    shuffle), THEN joins the customer dimension — the dimension join
    sees |customers| rows, not |lineitems|. The final top-20 compiles
    to TakeOrderedAndProject (per-partition 20-row heaps merged on the
    driver), never a global sort."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    orders = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1996-10-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    cust = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(rev).alias("_r"))
    )
    return (
        agg.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("_r").cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )

ORACLE_REL_RETURNED_REVENUE = """
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""

def q_rel_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19-style OR-of-ANDs: revenue from three (brand, size-range,
    quantity-range) bundles. The part side pre-filters to the UNION of
    its brand/size clauses and broadcasts; the lineitem scan keeps a
    coarse quantity envelope (1..30 covers every bundle) so rows prune
    BEFORE the join; the exact per-bundle (brand AND quantity)
    disjunction — the part Catalyst cannot split across sides — runs
    as a residual filter on the joined columns. The classic test that
    a disjunctive predicate still yields per-side pushdown."""
    part = (
        _t(spark, sf_dir, "part")
        .where(
            (
                (F.col("p_brand") == "Brand#1")
                & F.col("p_size").between(1, 5)
            )
            | (
                (F.col("p_brand") == "Brand#2")
                & F.col("p_size").between(1, 10)
            )
            | (
                (F.col("p_brand") == "Brand#3")
                & F.col("p_size").between(1, 15)
            )
        )
        .select("p_partkey", "p_brand")
    )
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").between(1, 30)
    )
    bundle = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .where(bundle)
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )

ORACLE_REL_DISJUNCTIVE_REVENUE = """
SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""

def q_rel_zorder_locality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit: orders clustered by (custkey, order-day)
    Morton code, rolled up per contiguous 256-code block. Each block's
    envelope (min/max custkey, min/max day) is tight in BOTH
    dimensions simultaneously — the property that lets parquet footer
    stats prune scans for either predicate after a
    ``zorder_layout`` write. The quantize + interleave expressions are
    built by the SAME helpers for Spark and the DuckDB oracle
    (portable floor/mod arithmetic), so the hash-match proves the
    layout code engine-exact."""
    from ..operators.layout import zorder_code

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).alias("o_day"),
    )
    coded = zorder_code(
        orders, [("o_custkey", 64.0), ("o_day", 16.0)], bits=8
    )
    return (
        coded.groupBy(
            F.expr("cast(floor(zcode / 256) as bigint)").alias("zblock")
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.min("o_custkey").cast("long").alias("custkey_lo"),
            F.max("o_custkey").cast("long").alias("custkey_hi"),
            F.min("o_day").cast("long").alias("day_lo"),
            F.max("o_day").cast("long").alias("day_hi"),
        )
    )

def _oracle_zorder_locality() -> str:
    from ..operators.layout import morton_code_expr, quantize_expr

    qx = quantize_expr("o_custkey", 64.0, 8)
    qy = quantize_expr("o_day", 16.0, 8)
    code = morton_code_expr(["__z0", "__z1"], 8)
    return f"""
WITH base AS (
  SELECT o_orderkey, o_custkey,
         datediff('day', DATE '1995-01-01', o_orderdate::DATE) AS o_day
  FROM orders
),
grid AS (
  SELECT o_orderkey, o_custkey, o_day,
         {qx} AS __z0, {qy} AS __z1
  FROM base
),
coded AS (SELECT *, {code} AS zcode FROM grid)
SELECT cast(floor(zcode / 256) as bigint) AS zblock,
       count(*) AS n_orders,
       cast(min(o_custkey) as bigint) AS custkey_lo,
       cast(max(o_custkey) as bigint) AS custkey_hi,
       cast(min(o_day) as bigint) AS day_lo,
       cast(max(o_day) as bigint) AS day_hi
FROM coded GROUP BY 1
"""

def q_rel_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5-style local supplier volume: 1996 revenue by supplier nation
    within region ASIA, counting only lineitems where the ordering
    customer and the supplier share the nation. Dimension maps (region
    -> nation set, supplier -> nationkey) collapse and BROADCAST before
    touching facts; the customer side joins by shuffle (at 100 TB 1/5
    of customers does not broadcast); lineitem <-> orders is the one
    fact-to-fact shuffle; the same-nation filter runs post-join on two
    int columns. Revenue sums in DECIMAL, divides never."""
    nat = (
        _t(spark, sf_dir, "nation")
        .join(
            _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_nationkey", "n_name")
    )
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = (
        _t(spark, sf_dir, "orders")
        # range form, not year(): the predicate reaches the parquet
        # scan as PushedFilters (year() is not pushdown-translatable)
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(
                    (
                        F.col("l_extendedprice").cast("decimal(18,6)")
                        * (F.lit(1).cast("decimal(18,6)") - F.col("l_discount").cast("decimal(18,6)"))
                    ).cast("decimal(28,12)")
                ).cast("double"),
                4,
            ).alias("revenue")
        )
    )

ORACLE_REL_LOCAL_SUPPLIER_VOLUME = """
SELECT n_name,
       round(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,6))
             * (CAST(1 AS DECIMAL(18,6)) - CAST(l_discount AS DECIMAL(18,6)))
             AS DECIMAL(28,12))) AS DOUBLE), 4) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND c_nationkey = s_nationkey
  AND year(o_orderdate) = 1996
GROUP BY n_name
"""

def q_rel_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18-style large-volume customers: orders whose total lineitem
    quantity exceeds 250, with customer attribution. The HAVING
    pre-aggregate runs ON THE FACT TABLE FIRST (partial-agg groupBy on
    orderkey — map-side combine collapses lineitems before the
    shuffle), and only the ~surviving order set joins orders and
    customer; at 100 TB the qualifying-order side is a small fraction
    and drives semi-join-shaped probes instead of a second full fact
    scan. Quantity sums in DECIMAL so the > 250 boundary cannot
    float-flip."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy("l_orderkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("__q")
        )
        .where(F.col("__q") > F.lit(250))
        .select(
            "l_orderkey", F.col("__q").cast("double").alias("total_qty")
        )
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_orderdate"),
            F.round(F.col("o_totalprice"), 4).alias("o_totalprice"),
            F.round(F.col("total_qty"), 4).alias("total_qty"),
        )
    )

ORACLE_REL_LARGE_VOLUME = """
SELECT c_name, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       round(o_totalprice, 4) AS o_totalprice,
       round(CAST(q AS DOUBLE), 4) AS total_qty
FROM (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,6))) AS q
  FROM lineitem GROUP BY l_orderkey HAVING q > 250
)
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""

def q_rel_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16-style supplier variety: distinct suppliers serving each
    (p_type, p_size) among small parts, excluding one brand. The fact
    table collapses to DISTINCT (partkey, suppkey) pairs FIRST
    (partial-agg dedupe with map-side combine — at 100 TB this is the
    1000:1 collapse), and only then joins the filtered part dimension;
    the count-distinct runs over the collapsed pair set."""
    li = (
        _t(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    part = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_size") <= 15) & (F.col("p_brand") != "Brand#1"))
        .select("p_partkey", "p_type", "p_size")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )

ORACLE_REL_SUPPLIER_VARIETY = """
SELECT p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_size <= 15 AND p_brand <> 'Brand#1'
GROUP BY p_type, p_size
"""

def q_rel_profit_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9-style product-type profit: per (supplier nation, order year),
    profit on 'red' parts = revenue minus a retail-derived supply cost
    (this schema has no partsupp, so cost = 0.2 * p_retailprice *
    quantity — the join SHAPE is the point). Plan: the name-filtered
    part list, supplier->nation map ride as broadcasts into the
    lineitem scan (filter prunes facts before any shuffle);
    lineitem<->orders is the one fact-to-fact shuffle; the 25 x years
    agg is a partial-agg groupBy. TPC-H Q9's five-way star re-expressed
    Spark-first."""
    part = _t(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * F.lit(0.2)
    ).cast("decimal(18,6)")
    return (
        li.join(
            F.broadcast(part.select("p_partkey", "p_retailprice")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            "nation", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(F.sum(profit).alias("_p"))
        .select(
            "nation", "o_year", F.col("_p").cast("double").alias("profit")
        )
    )

ORACLE_REL_PROFIT_BY_NATION = """
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                     - p.p_retailprice * l.l_quantity * 0.2
                     AS DECIMAL(18,6))) AS DOUBLE) AS profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY nation, o_year
"""

def q_rel_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12-style late-shipment audit: lines shipped more than 60 days
    after their order date vs on-time, split into high-priority
    (1-URGENT / 2-HIGH) and low-priority counts — the carrier-SLA
    readout (this schema has no shipmode/receiptdate; the
    conditional-count shape is the point). Plan: one fact-to-fact
    shuffle join on orderkey, lateness + priority classified
    post-join, 2-key partial agg."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    late = F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), 60)
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.when(late, "late").otherwise("ontime").alias("lateness"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0))
            .cast("long")
            .alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1))
            .cast("long")
            .alias("low_line_count"),
        )
    )

ORACLE_REL_LATE_LINES = """
SELECT CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
            THEN 'late' ELSE 'ontime' END AS lateness,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
       sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END)::BIGINT AS low_line_count
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY lateness
"""

def q_rel_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration readout: the top-50 customers' share of
    total order revenue — the whale-dependence number every account
    review opens with. Plan: orders collapse to per-customer decimal
    totals (partial agg), the top-50 is a bounded global TakeOrdered
    (never a full sort), and both totals are order-independent decimal
    sums cast to double only at the final ratio."""
    orders = _t(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("__r")
    )
    top = (
        per_cust.orderBy(F.desc("__r"), F.asc("o_custkey"))
        .limit(50)
        .agg(F.sum("__r").alias("__top_r"))
    )
    tot = per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n_customers"),
        F.sum("__r").alias("__tot_r"),
    )
    return tot.crossJoin(F.broadcast(top)).select(
        "n_customers",
        F.col("__tot_r").cast("double").alias("total_revenue"),
        F.col("__top_r").cast("double").alias("top50_revenue"),
        F.round(
            F.col("__top_r").cast("double") / F.col("__tot_r").cast("double"),
            6,
        ).alias("top50_share"),
    )

ORACLE_REL_REVENUE_CONCENTRATION = """
WITH pc AS (
  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,6))) AS r
  FROM orders GROUP BY o_custkey
),
top AS (
  SELECT sum(r) AS top_r FROM (
    SELECT r FROM pc ORDER BY r DESC, o_custkey ASC LIMIT 50
  )
),
tot AS (SELECT count(*)::BIGINT AS n_customers, sum(r) AS tot_r FROM pc)
SELECT n_customers,
       CAST(tot_r AS DOUBLE) AS total_revenue,
       CAST(top_r AS DOUBLE) AS top50_revenue,
       round(CAST(top_r AS DOUBLE) / CAST(tot_r AS DOUBLE), 6) AS top50_share
FROM tot, top
"""

def q_rel_cheapest_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2-style min-cost selection: for each part type, the CHEAPEST
    part (min retail price, min partkey tiebreak) and how many distinct
    suppliers actually ship it. The textbook correlated
    'price = (SELECT min(price) ...)' subquery is decorrelated into a
    per-type min aggregate joined back by equality — the per-type
    floors are a |types|-row broadcast, so the probe never evaluates a
    subquery per row; the supplier count runs over the fact table
    pre-collapsed to DISTINCT (partkey, suppkey) pairs restricted by a
    broadcast semi-join on the winners."""
    part = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_type", "p_retailprice"
    )
    floors = part.groupBy("p_type").agg(
        F.min("p_retailprice").alias("__min_price")
    )
    winners = (
        part.join(F.broadcast(floors), "p_type")
        .where(F.col("p_retailprice") == F.col("__min_price"))
        .groupBy("p_type", "p_retailprice")
        .agg(F.min("p_partkey").alias("p_partkey"))
    )
    pairs = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p_partkey"), "l_suppkey")
        .join(F.broadcast(winners.select("p_partkey")), "p_partkey")
        .distinct()
        .groupBy("p_partkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_suppliers"))
    )
    return winners.join(pairs, "p_partkey", "left").select(
        "p_type",
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("min_price"),
        F.coalesce("n_suppliers", F.lit(0)).cast("long").alias("n_suppliers"),
    )

ORACLE_REL_CHEAPEST_PART = """
WITH floors AS (
  SELECT p_type, min(p_retailprice) AS min_price FROM part GROUP BY p_type
),
winners AS (
  SELECT p.p_type, f.min_price, min(p.p_partkey) AS p_partkey
  FROM part p JOIN floors f
    ON p.p_type = f.p_type AND p.p_retailprice = f.min_price
  GROUP BY p.p_type, f.min_price
),
pairs AS (
  SELECT w.p_partkey, count(DISTINCT l.l_suppkey) AS n_suppliers
  FROM winners w JOIN lineitem l ON l.l_partkey = w.p_partkey
  GROUP BY w.p_partkey
)
SELECT w.p_type, w.p_partkey,
       CAST(w.min_price AS DOUBLE) AS min_price,
       coalesce(p.n_suppliers, 0)::BIGINT AS n_suppliers
FROM winners w LEFT JOIN pairs p ON p.p_partkey = w.p_partkey
"""

def q_rel_specialized_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20-flavored supplier specialization screen: suppliers whose
    'red'-part quantity exceeds 15% of their total shipped quantity
    (this schema has no partsupp/availqty; the shape kept is Q20's
    semi-filtered per-supplier threshold). The red-part key set is a
    broadcast dimension filter resolved IN the fact scan via a
    broadcast LEFT join (one conditional-sum agg, no second fact
    pass, no Expand), then a |suppliers|-bounded name join."""
    part = _t(spark, sf_dir, "part").where(
        F.col("p_name").like("%red%")
    ).select("p_partkey", F.lit(1).alias("__is_red"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_partkey", "l_quantity"
    )
    per_supp = (
        li.join(
            F.broadcast(part), li.l_partkey == part.p_partkey, "left"
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("__q"),
            F.sum(
                F.when(F.col("__is_red") == 1, F.col("l_quantity"))
                .otherwise(0)
                .cast("decimal(18,6)")
            ).alias("__qr"),
        )
        .where(F.col("__qr") * 20 > F.col("__q") * 3)
    )
    supplier = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return per_supp.join(
        F.broadcast(supplier), per_supp.l_suppkey == supplier.s_suppkey
    ).select(
        "s_name",
        F.col("__q").cast("double").alias("total_qty"),
        F.col("__qr").cast("double").alias("red_qty"),
        F.round(
            F.col("__qr").cast("double") / F.col("__q").cast("double"), 6
        ).alias("red_share"),
    )

ORACLE_REL_SPECIALIZED_SUPPLIERS = """
WITH per AS (
  SELECT l.l_suppkey,
         sum(CAST(l.l_quantity AS DECIMAL(18,6))) AS q,
         sum(CAST(CASE WHEN p.p_partkey IS NOT NULL THEN l.l_quantity
                       ELSE 0 END AS DECIMAL(18,6))) AS qr
  FROM lineitem l
  LEFT JOIN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%') p
    ON l.l_partkey = p.p_partkey
  GROUP BY l.l_suppkey
)
SELECT s.s_name,
       CAST(per.q AS DOUBLE) AS total_qty,
       CAST(per.qr AS DOUBLE) AS red_qty,
       round(CAST(per.qr AS DOUBLE) / CAST(per.q AS DOUBLE), 6) AS red_share
FROM per JOIN supplier s ON s.s_suppkey = per.l_suppkey
WHERE per.qr * 20 > per.q * 3
"""

def q_rel_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: the top-20 part pairs that co-occur
    in the same order — the recommendation/affinity primitive. Plan:
    the within-order self-join is keyed by orderkey and bounded BY
    CONSTRUCTION — an order has at most 7 lineitems (TPC-H invariant;
    generally: basket size), so the pair explosion is O(k²) per order
    with tiny k, never corpus². Distinct (order, part) first so a
    part listed twice in one order counts once; canonical direction
    (a < b); the final top-20 is a TakeOrdered with a deterministic
    (count desc, part_a, part_b) tiebreak."""
    from ..operators.skew import skew_split_pairs

    raw = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    li = raw.distinct()
    # r8: pair generation through the conditional-salt skew operator —
    # a celebrity basket (>64 items) is salted over 16 buckets so its
    # O(k²) pair work spreads across tasks instead of pinning one;
    # TPC-H-shaped orders (≤7 lines) all carry salt 0, so the
    # uniform-data join is the naive shape plus a broadcast tag.
    # Hot keys come from the RAW line count (an upper bound on the
    # distinct-part count — over-detection is exact, the salted path
    # is exact for any group), avoiding a third scan of the distinct
    # subtree. Output identical (oracle-checked).
    hot = (
        raw.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > 64)
        .select("l_orderkey")
    )
    pairs = skew_split_pairs(
        li, "l_orderkey", "l_partkey",
        hot_threshold=64, salt_buckets=16, hot_keys=hot,
    ).groupBy(
        F.col("item_a").alias("part_a"), F.col("item_b").alias("part_b")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    return pairs.orderBy(
        F.desc("n_orders"), F.asc("part_a"), F.asc("part_b")
    ).limit(20)

ORACLE_REL_COPURCHASE = """
WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*)::BIGINT AS n_orders
FROM li a JOIN li b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT 20
"""

def q_rel_ship_latency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfillment-latency distribution: order-to-ship days bucketed
    (0-30 / 31-60 / 61-90 / 90+) per order priority — does URGENT
    actually ship faster? Plan: one orderkey-keyed fact-fact join
    (both sides shuffle on the same key once), a stateless bucket
    projection, and a (|priorities| x 4)-row aggregate; shares come
    from a |priorities|-row broadcast of per-priority totals. All
    integer counts — no window, no percentile over unbounded groups
    (the bucket census IS the scale-safe quantile substitute here)."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "o_orderpriority",
        F.expr(
            "CASE WHEN datediff(l_shipdate, o_orderdate) <= 30 THEN '00-30'"
            " WHEN datediff(l_shipdate, o_orderdate) <= 60 THEN '31-60'"
            " WHEN datediff(l_shipdate, o_orderdate) <= 90 THEN '61-90'"
            " ELSE '90+' END"
        ).alias("latency_bucket"),
    )
    counts = j.groupBy("o_orderpriority", "latency_bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines")
    )
    totals = counts.groupBy(F.col("o_orderpriority").alias("__p")).agg(
        F.sum("n_lines").cast("long").alias("__t")
    )
    return counts.join(
        F.broadcast(totals), counts["o_orderpriority"] == F.col("__p")
    ).select(
        "o_orderpriority",
        "latency_bucket",
        "n_lines",
        F.round(
            F.expr("CAST(n_lines AS DOUBLE) / CAST(__t AS DOUBLE)"), 6
        ).alias("share"),
    )

ORACLE_REL_SHIP_LATENCY = """
WITH j AS (
  SELECT o.o_orderpriority,
         CASE WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 30
                THEN '00-30'
              WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 60
                THEN '31-60'
              WHEN date_diff('day', o.o_orderdate, l.l_shipdate) <= 90
                THEN '61-90'
              ELSE '90+' END AS latency_bucket
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
c AS (
  SELECT o_orderpriority, latency_bucket, count(*)::BIGINT AS n_lines
  FROM j GROUP BY 1, 2
),
t AS (
  SELECT o_orderpriority, sum(n_lines)::BIGINT AS tot
  FROM c GROUP BY 1
)
SELECT c.o_orderpriority, c.latency_bucket, c.n_lines,
       round(CAST(c.n_lines AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share
FROM c JOIN t USING (o_orderpriority)
"""

def q_rel_segment_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer segment-migration matrix: each customer's spend tier
    (NONE / LOW < 100k / MID < 300k / HIGH) in the first half of the
    order-date range vs the second half, counted per (from, to) cell —
    the upgrade/downgrade/churn flow behind every account-health
    review. Fixed absolute thresholds keep tiers scale-safe (no
    global quantile over customers); the half-point is integer
    epoch-day arithmetic broadcast from one min/max row. Plan: orders
    collapse to per-(customer, half) decimal spend in one partial
    agg; a self-joinable pivot (FULL OUTER on customer via two
    half-filtered frames) labels both tiers; the matrix is a
    16-cell-bounded aggregate."""
    orders = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        # parquet infers NTZ here; under the pinned-UTC session the LTZ
        # cast is value-identical and unlocks unix_micros
        F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
        F.col("o_totalprice").cast("decimal(18,6)").alias("__p"),
    )
    bounds = orders.agg(
        F.min("o_orderdate").alias("__lo"), F.max("o_orderdate").alias("__hi")
    )
    halved = orders.crossJoin(F.broadcast(bounds)).withColumn(
        "__half",
        F.expr(
            "CASE WHEN unix_micros(o_orderdate) < unix_micros(__lo)"
            " + ((unix_micros(__hi) - unix_micros(__lo)) div 2)"
            " THEN 1 ELSE 2 END"
        ),
    )
    spend = halved.groupBy("o_custkey", "__half").agg(
        F.sum("__p").alias("__s")
    )
    tier = (
        "CASE WHEN __s IS NULL THEN 'NONE'"
        " WHEN __s < 100000 THEN 'LOW'"
        " WHEN __s < 300000 THEN 'MID'"
        " ELSE 'HIGH' END"
    )
    h1 = spend.where(F.col("__half") == 1).select(
        F.col("o_custkey").alias("__c1"), F.col("__s")
    )
    h2 = spend.where(F.col("__half") == 2).select(
        F.col("o_custkey").alias("__c2"), F.col("__s").alias("__s2")
    )
    joined = h1.join(h2, h1["__c1"] == h2["__c2"], "full").select(
        F.expr(tier).alias("from_tier"),
        F.expr(tier.replace("__s", "__s2")).alias("to_tier"),
    )
    return joined.groupBy("from_tier", "to_tier").agg(
        F.count(F.lit(1)).cast("long").alias("n_customers")
    )

ORACLE_REL_SEGMENT_MIGRATION = """
WITH b AS (
  SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders
),
halved AS (
  SELECT o.o_custkey, CAST(o.o_totalprice AS DECIMAL(18,6)) AS p,
         CASE WHEN epoch_us(o.o_orderdate) < epoch_us(b.lo)
                   + ((epoch_us(b.hi) - epoch_us(b.lo)) // 2)
              THEN 1 ELSE 2 END AS half
  FROM orders o CROSS JOIN b
),
spend AS (
  SELECT o_custkey, half, sum(p) AS s FROM halved GROUP BY 1, 2
),
h1 AS (SELECT o_custkey, s FROM spend WHERE half = 1),
h2 AS (SELECT o_custkey, s AS s2 FROM spend WHERE half = 2),
j AS (
  SELECT CASE WHEN h1.s IS NULL THEN 'NONE'
              WHEN h1.s < 100000 THEN 'LOW'
              WHEN h1.s < 300000 THEN 'MID'
              ELSE 'HIGH' END AS from_tier,
         CASE WHEN h2.s2 IS NULL THEN 'NONE'
              WHEN h2.s2 < 100000 THEN 'LOW'
              WHEN h2.s2 < 300000 THEN 'MID'
              ELSE 'HIGH' END AS to_tier
  FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
)
SELECT from_tier, to_tier, count(*)::BIGINT AS n_customers
FROM j GROUP BY 1, 2
"""


def q_rel_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10-style returned-item reporting: the top 20 customers by
    revenue lost to returned lineitems in 1996-H2 — the churn-risk
    list an account team reads. Plan: the return flag and the order
    date window are pushed into the two fact scans, the fact-to-fact
    equi-join shuffles only pruned rows, revenue partial-aggregates by
    custkey (map-side combine) BEFORE the broadcast joins against
    customer and nation, and the top-20 is a bounded
    TakeOrderedAndProject, never a global sort. Revenue sums through
    DECIMAL(18,4) (exact, order-independent) and surfaces as DOUBLE
    rounded to 4."""
    orders = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-07-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            F.expr(
                "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"
            ).alias("__rev"),
        )
    )
    per_cust = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("__rev").alias("__rev"))
    )
    customer = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        per_cust.join(
            F.broadcast(customer), per_cust.o_custkey == customer.c_custkey
        )
        .join(
            F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
        )
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.round(F.col("c_acctbal"), 2).alias("acctbal"),
            F.round(F.col("__rev").cast("double"), 4).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE_REL_RETURNED_CUSTOMERS = """
SELECT c_custkey, c_name, n_name AS nation,
       round(c_acctbal, 2) AS acctbal,
       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                           AS DECIMAL(18,4))) AS DOUBLE), 4) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE o_orderdate >= DATE '1996-07-01'
  AND o_orderdate < DATE '1997-01-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""
