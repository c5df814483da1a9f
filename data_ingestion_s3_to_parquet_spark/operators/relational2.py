"""Advanced relational operators: subqueries, percentiles, pivot, salted
joins, multi-join analytical (TPC-H-shaped) queries, and the raw-SQL
frontend (SURVEY.md §2B continuation).

Same contract as operators.relational: lazy builders + DuckDB oracle
SQL, deterministic outputs, decimal-sum pattern for float aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg, dsum
from ..plans.spec import Query
from ..sources.catalog import load_table, register_views


# --- subqueries ---------------------------------------------------------------

def q_subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders above the global average price.

    Expressed as a crossJoin with a 1-row aggregate (what Catalyst
    rewrites a scalar subquery into; at scale the 1-row side broadcasts).
    """
    o = load_table(spark, sf_dir, "orders")
    avg_price = o.agg(davg("o_totalprice", "avg_price", 6))
    return (
        o.crossJoin(F.broadcast(avg_price))
        .where(F.col("o_totalprice") > F.col("avg_price"))
        .select("o_orderkey", "o_totalprice")
    )


SQL_SUBQUERY_SCALAR = """
SELECT o_orderkey, o_totalprice
FROM orders
WHERE o_totalprice > (
  SELECT CAST(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,8))) AS DOUBLE)
              / COUNT(o_totalprice), 6) AS DOUBLE)
  FROM orders
)
"""


def q_subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT IN, via the SQL frontend (Catalyst
    decorrelates into semi/anti joins — verify with .explain)."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey, o_orderpriority
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
          AND o.o_custkey NOT IN (SELECT c_custkey FROM customer
                                  WHERE c_mktsegment = 'MACHINERY')
        """
    )


SQL_SUBQUERY_EXISTS = """
SELECT o_orderkey, o_orderpriority
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
  AND o.o_custkey NOT IN (SELECT c_custkey FROM customer
                          WHERE c_mktsegment = 'MACHINERY')
"""


# --- percentile / pivot --------------------------------------------------------

def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median, p90) per group.

    ``F.percentile`` is the exact (sort-based) aggregate — deterministic,
    unlike approx_percentile — and matches DuckDB's quantile_cont.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("median_qty"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 6).alias("p90_price"),
        F.count("*").alias("n_rows"),
    )


SQL_AGG_PERCENTILE = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       ROUND(quantile_cont(l_extendedprice, 0.9), 6) AS p90_price,
       COUNT(*) AS n_rows
FROM lineitem GROUP BY l_returnflag
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: order counts per priority (rows) × status (columns).

    ``.pivot`` with an explicit value list — never the value-discovering
    form, which costs an extra scan and breaks plan determinism.
    """
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("n_f"),
            F.coalesce(F.col("O"), F.lit(0)).alias("n_o"),
            F.coalesce(F.col("P"), F.lit(0)).alias("n_p"),
        )
    )


SQL_PIVOT = """
SELECT o_orderpriority,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS n_p
FROM orders GROUP BY o_orderpriority
"""


def q_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral array expansion (UDTF-shaped): positional explode of the
    first 4 embedding dims."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        F.posexplode(F.slice(F.col("embedding"), 1, 4)).alias("pos", "val"),
    ).select("vec_id", "pos", F.round(F.col("val").cast("double"), 6).alias("val"))


SQL_EXPLODE_POSEXPLODE = """
SELECT vec_id, CAST(u.i - 1 AS INT) AS pos,
       ROUND(CAST(embedding[u.i] AS DOUBLE), 6) AS val
FROM embeddings, LATERAL (SELECT unnest(generate_series(1, 4)) AS i) u
"""


# --- skew-aware join -----------------------------------------------------------

N_SALTS = 8


def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join: explicit skew mitigation with identical semantics.

    Pattern: add salt = hash(row) % N to the skewed (fact) side,
    replicate the dim side N×, join on (key, salt). Verified against
    the plain-join oracle — the result must be identical. At scale this
    (or AQE skew-split) is what stops one hot key from pinning a task.
    """
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    salted_fact = li.withColumn(
        "_salt", (F.xxhash64("l_orderkey", "l_linenumber") % N_SALTS + N_SALTS) % N_SALTS
    )
    salts = spark.range(N_SALTS).select(F.col("id").cast("int").alias("_salt"))
    replicated_dim = p.crossJoin(F.broadcast(salts))
    return (
        salted_fact.join(
            replicated_dim,
            (F.col("l_partkey") == F.col("p_partkey"))
            & (salted_fact["_salt"] == replicated_dim["_salt"]),
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice", "brand_revenue"))
    )


SQL_JOIN_SKEW_SALTED = """
SELECT p_brand, COUNT(*) AS n_items,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,8))), 2) AS DOUBLE) AS brand_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# --- TPC-H-shaped analytical queries -------------------------------------------

def q_tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: unshipped-order revenue by order, top 10."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-01-01").cast("timestamp_ntz")
    return (
        c.where(F.col("c_mktsegment") == "BUILDING")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .where(F.col("o_orderdate") < cutoff)
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > cutoff)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


SQL_TPCH_Q3 = """
SELECT o_orderkey, o_orderdate, o_orderpriority,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate  > TIMESTAMP '1998-01-01'
GROUP BY o_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderkey ASC
LIMIT 10
"""


def q_tpch_q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue where supplier and customer share a
    nation, grouped by nation. Exercises a 6-table join with two
    broadcast dims and a join-key equality across branches."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


SQL_TPCH_Q5 = """
SELECT r_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey
GROUP BY r_name, n_name
"""


def q_tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items, top 20 customers."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.where(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "lost_revenue"))
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


SQL_TPCH_Q10 = """
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,8))), 2) AS DOUBLE) AS lost_revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY lost_revenue DESC, c_custkey ASC
LIMIT 20
"""


# --- SQL frontend ---------------------------------------------------------------

def q_sql_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw-SQL surface: identical text runs on spark.sql and DuckDB.

    Demonstrates the engine's ANSI-SQL frontend over the registered
    catalog views — users can bring SQL instead of DataFrame code.
    """
    register_views(spark, sf_dir)
    return spark.sql(SQL_SQL_FRONTEND)


SQL_SQL_FRONTEND = """
SELECT o_orderpriority, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,8))), 2) AS DOUBLE) AS total
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01'
GROUP BY o_orderpriority
"""


# --- scalar functions, second batch ---------------------------------------------

def q_scalar_funcs2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/date functions batch 2: regexp, pad/trim, translate,
    split+element_at, date arithmetic."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.regexp_extract("o_orderpriority", "^(\\d+)-", 1).alias("prio_num"),
        F.lpad("o_orderstatus", 3, "_").alias("status_pad"),
        F.trim(F.lit("  x  ")).alias("trimmed"),
        F.translate("o_orderpriority", "-", "_").alias("prio_us"),
        F.element_at(F.split("o_orderpriority", "-"), 2).alias("prio_word"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(
            F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
        ).alias("age_days"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
    )


SQL_SCALAR_FUNCS2 = """
SELECT o_orderkey,
       regexp_extract(o_orderpriority, '^(\\d+)-', 1) AS prio_num,
       lpad(o_orderstatus, 3, '_') AS status_pad,
       trim('  x  ') AS trimmed,
       translate(o_orderpriority, '-', '_') AS prio_us,
       string_split(o_orderpriority, '-')[2] AS prio_word,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS age_days,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start
FROM orders
"""


QUERIES = [
    Query("subquery_scalar", q_subquery_scalar, SQL_SUBQUERY_SCALAR, ("relational", "subquery")),
    Query("subquery_exists", q_subquery_exists, SQL_SUBQUERY_EXISTS, ("relational", "subquery")),
    Query("agg_percentile", q_agg_percentile, SQL_AGG_PERCENTILE, ("relational", "agg")),
    Query("pivot", q_pivot, SQL_PIVOT, ("relational", "agg")),
    Query("explode_posexplode", q_explode_posexplode, SQL_EXPLODE_POSEXPLODE, ("relational", "array")),
    Query("join_skew_salted", q_join_skew_salted, SQL_JOIN_SKEW_SALTED, ("relational", "join")),
    Query("tpch_q3_shipping", q_tpch_q3_shipping, SQL_TPCH_Q3, ("relational", "tpch"), bench=True),
    Query("tpch_q5_local_supplier", q_tpch_q5_local_supplier, SQL_TPCH_Q5, ("relational", "tpch"), bench=True),
    Query("tpch_q10_returns", q_tpch_q10_returns, SQL_TPCH_Q10, ("relational", "tpch"), bench=True),
    Query("sql_frontend", q_sql_frontend, SQL_SQL_FRONTEND, ("relational", "sql")),
    Query("scalar_funcs2", q_scalar_funcs2, SQL_SCALAR_FUNCS2, ("relational",)),
]
