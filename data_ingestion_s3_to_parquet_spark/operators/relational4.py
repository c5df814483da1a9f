"""Relational wave 4: grouped-HAVING join (TPC-H Q18 shape) and
top-k-per-group.

Reference scope note: the reference (/root/reference/src/main.rs, 208
lines) has no joins, aggregations, or windows — its whole operator
surface is SURVEY.md §2A. These are §2B [EXT] operators mandated by the
driver contract (BASELINE.json:6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import ACC
from ..plans.spec import Query
from ..sources.catalog import load_table


def q_tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers who placed orders above a total-
    quantity threshold — a grouped HAVING whose result then drives two
    joins.

    Scale shape: the lineitem aggregation is map-side-combinable on
    ``l_orderkey`` (the fact table's natural clustering key, so at
    100 TB the partial aggregate collapses most of the shuffle), and
    the HAVING filter passes ~1% of orders, so the subsequent joins see
    a tiny left side — AQE converts them to broadcasts at runtime.
    The decimal accumulator keeps the HAVING boundary exact: a raw
    double sum could land either side of 300.0 depending on add order.
    """
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(ACC)).alias("qty_acc"))
        .where(F.col("qty_acc") > 300)
        .select(
            "l_orderkey",
            F.round(F.col("qty_acc"), 2).cast("double").alias("total_qty"),
        )
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


SQL_TPCH_Q18 = """
WITH big AS (
  SELECT l_orderkey,
         CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,8))), 2) AS DOUBLE) AS total_qty
  FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,8))) > 300
)
SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
FROM big
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


TOPK_PER_GROUP = 5


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k rows per group: row_number over a per-group ordering,
    filtered to k — the canonical "best k items per key" pattern.

    Catalyst pushes the ``rn <= k`` predicate into the window operator
    as a group limit (``WindowGroupLimit``), so each partition keeps a
    k-row heap per key instead of fully sorting — the difference
    between O(n log k) and O(n log n) per group at 100 TB. Ordering is
    total (price desc, then both line identifiers) so the k-boundary is
    deterministic for the oracle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= TOPK_PER_GROUP)
        .select(
            "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rn"
        )
    )


SQL_TOPK_PER_GROUP = f"""
SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
       CAST(row_number() OVER (
         PARTITION BY l_returnflag
         ORDER BY l_extendedprice DESC, l_orderkey ASC, l_linenumber ASC
       ) AS INT) AS rn
FROM lineitem
QUALIFY rn <= {TOPK_PER_GROUP}
"""


def q_tpch_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier count per part attribute
    group, with a NOT IN anti-subquery excluding flagged suppliers.

    The anti-join side (supplier) is dimension-sized, so Catalyst plans
    it as a broadcast null-aware anti join; the count-distinct expands
    to a two-phase aggregate (distinct shuffle then count) — both of
    which stay scale-safe because the group count is bounded by the
    attribute domain, not row count.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    flagged = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .where(F.col("p_brand") != "Brand#13")
        .where(F.col("p_size").isin(5, 10, 15, 20, 24, 30, 35, 40))
        .join(
            flagged,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


SQL_TPCH_Q16 = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#13'
  AND p_size IN (5, 10, 15, 20, 24, 30, 35, 40)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function surface over the embedding column:
    filter / exists / fold / min-max / slice — all Catalyst
    expressions, no UDFs, so they run inside whole-stage codegen.

    The fold accumulates left-to-right in array order in double
    precision, the same order DuckDB's ``list_sum`` uses on DOUBLE[],
    so even the float reduction carries an exact oracle.

    Final projection is all scalars: the driver's canonicalizer cannot
    hash array cells (round-1 fail), so the ``slice`` demo folds its
    4-element head to a rounded sum instead of emitting the array.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    as_double = F.transform(e, lambda x: x.cast("double"))
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).alias("n_pos"),
        F.exists(e, lambda x: x > 0.5).alias("any_big"),
        F.round(
            F.aggregate(as_double, F.lit(0.0), lambda acc, x: acc + x), 6
        ).alias("esum"),
        F.array_max(as_double).alias("emax"),
        F.array_min(as_double).alias("emin"),
        F.round(
            F.aggregate(
                F.slice(as_double, 1, 4), F.lit(0.0), lambda acc, x: acc + x
            ),
            6,
        ).alias("head4_sum"),
    )


SQL_HIGHER_ORDER_FUNCS = """
SELECT vec_id,
       CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
       len(list_filter(embedding, x -> x > 0.5)) > 0 AS any_big,
       ROUND(list_sum(CAST(embedding AS DOUBLE[])), 6) AS esum,
       list_max(CAST(embedding AS DOUBLE[])) AS emax,
       list_min(CAST(embedding AS DOUBLE[])) AS emin,
       ROUND(list_sum(list_slice(CAST(embedding AS DOUBLE[]), 1, 4)), 6) AS head4_sum
FROM embeddings
"""


def q_window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lead/lag with ignoreNulls: carry the last non-null observation
    forward per user — the gap-filling idiom for sparse sensor/event
    values. Nulls are planted deterministically (every 3rd event)."""
    ev = load_table(spark, sf_dir, "events")
    sparse = F.when(F.col("event_id") % 3 != 0, F.col("value"))
    w = Window.partitionBy("user_id").orderBy("event_id")
    # the DataFrame lag() API has no ignoreNulls parameter; the SQL
    # expression form compiles to the same Lag(_, _, ignoreNulls=true)
    return ev.withColumn("sparse_value", sparse).select(
        "event_id",
        "user_id",
        "sparse_value",
        F.expr(
            "lag(sparse_value, 1) IGNORE NULLS OVER "
            "(PARTITION BY user_id ORDER BY event_id)"
        ).alias("prev_obs"),
        F.last("sparse_value", ignorenulls=True).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("filled"),
    )


SQL_WINDOW_IGNORE_NULLS = """
SELECT event_id, user_id,
       CASE WHEN event_id % 3 <> 0 THEN value END AS sparse_value,
       lag(CASE WHEN event_id % 3 <> 0 THEN value END, 1 IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY event_id
       ) AS prev_obs,
       last_value(CASE WHEN event_id % 3 <> 0 THEN value END IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS filled
FROM events
"""


QUERIES = [
    Query(
        "tpch_q18_large_orders",
        q_tpch_q18_large_orders,
        SQL_TPCH_Q18,
        ("relational", "tpch"),
    ),
    Query(
        "topk_per_group",
        q_topk_per_group,
        SQL_TOPK_PER_GROUP,
        ("relational", "window"),
    ),
    Query(
        "tpch_q16_supplier_cnt",
        q_tpch_q16_supplier_cnt,
        SQL_TPCH_Q16,
        ("relational", "tpch"),
    ),
    Query(
        "higher_order_funcs",
        q_higher_order_funcs,
        SQL_HIGHER_ORDER_FUNCS,
        ("relational", "array"),
    ),
    Query(
        "window_ignore_nulls",
        q_window_ignore_nulls,
        SQL_WINDOW_IGNORE_NULLS,
        ("relational", "window"),
    ),
]
