"""Relational wave 5: bitwise aggregates, dedup-keep-first over event
streams, regexp function surface.

Reference scope note: absent from the reference (SURVEY.md §2A is its
whole surface); §2B [EXT] operators per the driver contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.spec import Query
from ..sources.catalog import load_table


def q_agg_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR aggregates per group — flag-mask folding
    (e.g. collapsing per-event feature bitmaps to a per-type mask).
    Associative and commutative, so fully map-side-combinable."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").alias("mask_and"),
        F.bit_or("user_id").alias("mask_or"),
        F.bit_xor("user_id").alias("mask_xor"),
        F.count("*").alias("n"),
    )


SQL_AGG_BITWISE = """
SELECT event_type,
       bit_and(user_id) AS mask_and,
       bit_or(user_id)  AS mask_or,
       bit_xor(user_id) AS mask_xor,
       COUNT(*) AS n
FROM events GROUP BY event_type
"""


def q_event_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the FIRST event per (user_id, event_type) by event time —
    the batch expression of streaming deduplication
    (``dropDuplicatesWithinWatermark`` keyed on user+type). A total
    ordering (ts, then event_id) makes the winner deterministic even
    for same-timestamp duplicates; the window runs as one shuffle on
    the dedup key, identical to the streaming state layout where the
    key partitions the state store.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


SQL_EVENT_DEDUP_FIRST = """
SELECT user_id, event_type, event_id, ts, value
FROM events
QUALIFY row_number() OVER (
  PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC
) = 1
"""


def q_regexp_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface over document text: extract-first, extract-all
    (array), boolean match, and group-referencing replace. All JVM
    regex engines — but note Spark uses Java regex and DuckDB uses RE2;
    the patterns here stay in the common subset (no backrefs in
    patterns, POSIX classes spelled explicitly).

    The extract-all array is serialized with ``array_join`` in the
    final projection — the driver's canonicalizer cannot hash array
    cells (round-1 fail), and a joined string of string matches is
    engine-exact."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.array_join(
            F.regexp_extract_all("text", F.lit("[0-9]+")), ","
        ).alias("numbers"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"))).alias("n_numbers"),
        F.col("text").rlike("data").alias("mentions_data"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
    )


SQL_REGEXP_FUNCS = """
SELECT doc_id,
       regexp_extract(text, '([a-z]+)', 1) AS first_word,
       COALESCE(array_to_string(regexp_extract_all(text, '[0-9]+'), ','), '') AS numbers,
       CAST(len(regexp_extract_all(text, '[0-9]+')) AS INT) AS n_numbers,
       regexp_matches(text, 'data') AS mentions_data,
       regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled
FROM documents
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long reshape (``DataFrame.unpivot`` / melt): lineitem's four
    numeric measures become (measure, value) rows. The inverse of
    ``pivot``; runs as a Generate (row expansion), no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        "measure",
        "value",
    )


SQL_UNPIVOT = """
SELECT l_orderkey, l_linenumber, name AS measure, value
FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
             l_discount, l_tax FROM lineitem)
UNPIVOT (value FOR name IN (l_quantity, l_extendedprice, l_discount, l_tax))
"""


def q_join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): rows with
    null keys match each other instead of disappearing — the behavior
    audits and SCD merges usually want. Planted nulls (every 7th
    event's type) make the difference visible against a plain join."""
    ev = load_table(spark, sf_dir, "events")
    typed = ev.select(
        "event_id",
        F.when(F.col("event_id") % 7 != 0, F.col("event_type")).alias("et"),
    )
    counts = (
        typed.groupBy("et")
        .agg(F.count("*").alias("n_of_type"))
        .withColumnRenamed("et", "cet")
    )
    return typed.join(
        counts, F.col("et").eqNullSafe(F.col("cet")), "inner"
    ).select("event_id", F.col("et").alias("event_type"), "n_of_type")


SQL_JOIN_NULL_SAFE = """
WITH typed AS (
  SELECT event_id,
         CASE WHEN event_id % 7 <> 0 THEN event_type END AS et
  FROM events
),
counts AS (SELECT et, COUNT(*) AS n_of_type FROM typed GROUP BY et)
SELECT t.event_id, t.et AS event_type, c.n_of_type
FROM typed t JOIN counts c ON t.et IS NOT DISTINCT FROM c.et
"""


QUERIES = [
    Query("agg_bitwise", q_agg_bitwise, SQL_AGG_BITWISE, ("relational", "agg")),
    Query("unpivot", q_unpivot, SQL_UNPIVOT, ("relational",)),
    Query(
        "join_null_safe",
        q_join_null_safe,
        SQL_JOIN_NULL_SAFE,
        ("relational", "join"),
    ),
    Query(
        "event_dedup_first",
        q_event_dedup_first,
        SQL_EVENT_DEDUP_FIRST,
        ("relational", "dedup", "streaming"),
    ),
    Query(
        "regexp_funcs",
        q_regexp_funcs,
        SQL_REGEXP_FUNCS,
        ("relational", "text"),
    ),
]
