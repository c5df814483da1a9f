"""Training-data preparation operators: deterministic splits and
per-class embedding centroids.

Reference scope note: absent from the reference (its whole surface is
SURVEY.md §2A); these are LLM-data-pipeline [EXT] operators per
BASELINE.json:6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import davg
from ..plans.spec import Query
from ..sources.catalog import load_table

# First 4 hex chars of md5(doc_id) below this bound → test split.
# 0x1999 / 0x10000 ≈ 10.0%. Lowercase-hex string comparison IS numeric
# comparison for equal-length strings, so no engine-specific hex→int
# conversion is needed — md5 renders identical lowercase hex in Spark
# and DuckDB.
SPLIT_BOUND = "1999"


def q_sample_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic hash-based train/test split over documents.

    The split must be (a) stable across runs, cluster sizes, and row
    order — so no ``rand()`` / ``df.sample`` (seeded rand is
    partition-layout-dependent in Spark); (b) a pure per-row function —
    so it needs no shuffle, survives incremental appends (a new
    document's split never depends on the rest of the corpus), and at
    100 TB is a free map over the scan. Hashing the stable primary key
    and thresholding the hex prefix gives exactly that, and both
    engines agree bitwise because md5 is standardized.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    return d.select(
        "doc_id",
        "lang",
        F.when(bucket < SPLIT_BOUND, F.lit("test"))
        .otherwise(F.lit("train"))
        .alias("split"),
    )


SQL_SAMPLE_SPLIT = f"""
SELECT doc_id, lang,
       CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '{SPLIT_BOUND}'
            THEN 'test' ELSE 'train' END AS split
FROM documents
"""


def q_emb_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroid (element-wise mean vector) — the
    building block for IVF coarse quantizers and class prototypes.

    Spark has no native vector-mean aggregate, so the vector is
    flattened with ``posexplode`` (rows × dim, all JVM-side), averaged
    per (label, position) with the order-independent decimal mean, and
    re-assembled with a position-sorted ``collect_list``. The explode
    multiplies row count by dim but the per-(label,pos) aggregation is
    map-side-combinable, so shuffle volume is labels × dim — tiny —
    regardless of input size; this is the scalable shape at 100 TB
    (the alternative, zip_with fold over collect_list of whole vectors,
    concentrates every vector of a label in one task).

    Positions are emitted 1-based to match DuckDB's
    ``generate_subscripts``; floats widen to double before the decimal
    cast so both engines round the same value.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select(
        "label", F.posexplode("embedding").alias("pos0", "val")
    ).select(
        "label",
        (F.col("pos0") + 1).alias("pos"),
        F.col("val").cast("double").alias("val"),
    )
    cent = flat.groupBy("label", "pos").agg(davg("val", "c", scale=6))
    return cent.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "c"))), lambda x: x["c"]
        ).alias("centroid")
    )


SQL_EMB_CENTROIDS = """
WITH flat AS (
  SELECT label,
         generate_subscripts(embedding, 1) AS pos,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings
),
cent AS (
  SELECT label, pos,
         CAST(ROUND(CAST(SUM(CAST(val AS DECIMAL(18,8))) AS DOUBLE) / COUNT(val), 6) AS DOUBLE) AS c
  FROM flat GROUP BY label, pos
)
SELECT label, list(c ORDER BY pos) AS centroid
FROM cent GROUP BY label
"""


QUERIES = [
    Query("sample_split", q_sample_split, SQL_SAMPLE_SPLIT, ("llm", "sampling")),
    Query(
        "emb_centroids",
        q_emb_centroids,
        SQL_EMB_CENTROIDS,
        ("llm", "similarity", "agg"),
    ),
]
