"""Coverage completion wave: range frames, argmin/argmax, ordered string
aggregation, conditional aggregates, null-handling surface, and the
Arrow-batched UDF family (GROUPED_AGG UDAF, mapInPandas UDTF-shape).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType
from pyspark.sql.window import Window

from ..plans.spec import Query
from ..session import tune
from ..sources.catalog import load_table, spread


def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame: count of same-priority orders within ±5000 of each
    order's price (value-based frame, not row-based)."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").asc())
        .rangeBetween(-5000, 5000)
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.count("*").over(w).alias("n_price_neighbors"),
    )


SQL_WINDOW_RANGE_FRAME = """
SELECT o_orderkey, o_orderpriority, o_totalprice,
       COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC
                      RANGE BETWEEN 5000 PRECEDING AND 5000 FOLLOWING) AS n_price_neighbors
FROM orders
"""


def q_agg_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by / max_by: the order id holding each group's price extreme.

    Deterministic because o_totalprice has no duplicate-extreme risk per
    group at these SFs — and to be safe the oracle uses the same
    arg-extreme function family (both engines pick the single extreme
    row; ties broken identically is NOT guaranteed, so the query
    guards with an unambiguous extreme: (price, orderkey) struct.
    """
    o = load_table(spark, sf_dir, "orders")
    # tie-proof comparator: cents×1e8 + orderkey packs (price, key) into
    # one exact int64 — identical extreme selection on both engines
    rank_key = (
        F.round(F.col("o_totalprice") * 100).cast("long") * 100_000_000
        + F.col("o_orderkey")
    )
    return o.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", rank_key).alias("priciest_order"),
        F.min_by("o_orderkey", rank_key).alias("cheapest_order"),
        F.max("o_totalprice").alias("max_price"),
        F.min("o_totalprice").alias("min_price"),
    )


SQL_AGG_ARGMINMAX = """
SELECT o_orderpriority,
       arg_max(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey) AS priciest_order,
       arg_min(o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) * 100000000 + o_orderkey) AS cheapest_order,
       MAX(o_totalprice) AS max_price,
       MIN(o_totalprice) AS min_price
FROM orders GROUP BY o_orderpriority
"""


def q_agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: nations per region, comma-joined.

    collect_list is order-nondeterministic under shuffle — array_sort
    before joining restores a canonical order (same trick needed at any
    scale; never rely on collect order)."""
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
            F.count("*").alias("n_nations"),
        )
    )


SQL_AGG_STRING_COLLECT = """
SELECT r_name,
       string_agg(n_name, ',' ORDER BY n_name) AS nations,
       COUNT(*) AS n_nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: count_if / FILTER-style metrics in one pass
    (the idiomatic replacement for N separate filtered scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count_if(F.col("l_returnflag") == "R").alias("n_returned"),
        F.count_if(F.col("l_discount") > 0.05).alias("n_discounted"),
        F.count_if(F.col("l_quantity") >= 40).alias("n_bulk"),
        F.count("*").alias("n_total"),
    )


SQL_AGG_CONDITIONAL = """
SELECT l_linestatus,
       COUNT(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
       COUNT(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
       COUNT(*) FILTER (WHERE l_quantity >= 40) AS n_bulk,
       COUNT(*) AS n_total
FROM lineitem GROUP BY l_linestatus
"""


def q_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL surface: nullif/coalesce/null-safe equality/null ordering.

    The fixtures are null-free, so nulls are *manufactured* with nullif
    — which also makes the null paths oracle-checkable.
    """
    o = load_table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        status_or_null.alias("status_np"),
        F.coalesce(status_or_null, F.lit("PENDING")).alias("status_filled"),
        status_or_null.eqNullSafe(F.lit(None).cast("string")).alias("is_pending"),
        F.when(status_or_null.isNull(), 0).otherwise(1).alias("has_status"),
    )


SQL_NULL_HANDLING = """
SELECT o_orderkey,
       nullif(o_orderstatus, 'P') AS status_np,
       COALESCE(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
       nullif(o_orderstatus, 'P') IS NOT DISTINCT FROM NULL AS is_pending,
       CASE WHEN nullif(o_orderstatus, 'P') IS NULL THEN 0 ELSE 1 END AS has_status
FROM orders
"""


@pandas_udf(DoubleType())
def _avg_qty_udaf(qty: pd.Series) -> float:
    # GROUPED_AGG pandas UDAF. Quantities are integer-valued doubles, so
    # the numpy sum is exact and order-independent → oracle-safe.
    return float(qty.sum() / len(qty))


def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined aggregate via pandas GROUPED_AGG (Arrow per-group).

    Spark disallows mixing GROUPED_AGG UDFs with JVM aggregates in one
    agg() — the UDAF stands alone here.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        _avg_qty_udaf("l_quantity").alias("avg_qty_udaf"),
    )


SQL_UDAF_GROUPED = """
SELECT l_returnflag,
       SUM(l_quantity) / COUNT(*) AS avg_qty_udaf
FROM lineitem GROUP BY l_returnflag
"""


def q_map_in_pandas_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-shaped mapInPandas: per-document word frequencies (one input
    row → many output rows), computed in Arrow-batched pandas."""
    d = spread(load_table(spark, sf_dir, "documents"))
    tune(spark)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = (
                pdf.assign(word=pdf["text"].str.split(" "))
                .explode("word")
                .groupby(["doc_id", "word"], as_index=False)
                .size()
                .rename(columns={"size": "cnt"})
            )
            yield out[["doc_id", "word", "cnt"]]

    return d.select("doc_id", "text").mapInPandas(
        expand, "doc_id long, word string, cnt long"
    )


SQL_MAP_IN_PANDAS_TOKENS = """
SELECT doc_id, u.word, COUNT(*) AS cnt
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) u
GROUP BY doc_id, u.word
"""


def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime surface over event time: epoch seconds, parts, formatted
    strings (Spark ``date_format`` pattern vs DuckDB ``strftime`` —
    different pattern languages, same rendered values)."""
    ev = load_table(spark, sf_dir, "events")
    ts = F.date_trunc("second", F.col("ts"))
    return ev.select(
        "event_id",
        F.unix_timestamp(ts).alias("epoch_s"),
        F.hour(ts).alias("ev_hour"),
        F.minute(ts).alias("ev_minute"),
        F.dayofweek(ts).alias("ev_dow"),
        F.date_format(ts, "yyyy-MM-dd HH:mm").alias("ts_fmt"),
        F.to_date(ts).alias("ev_date"),
    )


SQL_DATETIME_FUNCS = """
SELECT event_id,
       CAST(epoch(date_trunc('second', ts)) AS BIGINT) AS epoch_s,
       CAST(hour(ts) AS INT) AS ev_hour,
       CAST(minute(ts) AS INT) AS ev_minute,
       CAST(dayofweek(ts) + 1 AS INT) AS ev_dow,
       strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M') AS ts_fmt,
       CAST(ts AS DATE) AS ev_date
FROM events
"""


def q_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unionByName with allowMissingColumns: schema-evolution-tolerant
    append (late files missing a new column fill with nulls)."""
    o = load_table(spark, sf_dir, "orders")
    old = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    new = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    return old.unionByName(new, allowMissingColumns=True)


SQL_UNION_BY_NAME = """
SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority
FROM orders WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders WHERE o_orderkey % 2 = 1
"""


QUERIES = [
    Query("window_range_frame", q_window_range_frame, SQL_WINDOW_RANGE_FRAME, ("relational", "window")),
    Query("agg_argminmax", q_agg_argminmax, SQL_AGG_ARGMINMAX, ("relational", "agg")),
    Query("agg_string_collect", q_agg_string_collect, SQL_AGG_STRING_COLLECT, ("relational", "agg")),
    Query("agg_conditional", q_agg_conditional, SQL_AGG_CONDITIONAL, ("relational", "agg")),
    Query("null_handling", q_null_handling, SQL_NULL_HANDLING, ("relational",)),
    Query("udaf_grouped", q_udaf_grouped, SQL_UDAF_GROUPED, ("relational", "udf")),
    Query("map_in_pandas_tokens", q_map_in_pandas_tokens, SQL_MAP_IN_PANDAS_TOKENS, ("llm", "udf")),
    Query("datetime_funcs", q_datetime_funcs, SQL_DATETIME_FUNCS, ("relational",)),
    Query("union_by_name", q_union_by_name, SQL_UNION_BY_NAME, ("relational",)),
]
