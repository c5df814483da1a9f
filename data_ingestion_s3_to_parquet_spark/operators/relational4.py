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
]
