"""Similarity search over the ``embeddings`` table (SURVEY.md §2B).

- ``sim_topk``      brute-force cosine top-k vs a fixed query vector
                    (oracle: Spark's double fold matches DuckDB's
                    list_cosine_similarity on DOUBLE[] bitwise)
- ``sim_join``      pairwise similarity join above a threshold, blocked
                    on the label column (oracle)
- ``ann_ivf_topk``  IVF-style approximate top-k: deterministic
                    centroids, nearest-cluster probe (rows-only — the
                    approximation has no SQL ground truth)

Scale: brute-force top-k is a single scan + TakeOrderedAndProject —
fine whenever the query batch is small. The |D|² similarity join is the
thing to kill at 100 TB: here it's blocked on `label` (a stand-in for
any coarse partitioner); the IVF variant shows the real pattern —
assign once (cheap scan), then search only within probed cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot
from ..plans.spec import Query
from ..sources.catalog import load_table, spread

QUERY_VEC_ID = 0  # deterministic "query": the embedding of vec_id 0
TOP_K = 10


def _query_vec(emb: DataFrame) -> DataFrame:
    return emb.where(F.col("vec_id") == QUERY_VEC_ID).select(
        F.col("embedding").alias("qvec")
    )


def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: scan, score, TakeOrderedAndProject.

    The 1-row query side is crossJoin-broadcast so scoring is a map-only
    stage; no shuffle until the final k-row merge.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    scored = (
        spread(emb.where(F.col("vec_id") != QUERY_VEC_ID))
        .crossJoin(F.broadcast(_query_vec(emb)))
        .select(
            "vec_id",
            "label",
            cosine(F.col("embedding"), F.col("qvec")).alias("cos_sim"),
        )
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc()).limit(TOP_K)


SQL_SIM_TOPK = f"""
SELECT e.vec_id, e.label,
       list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                              CAST(q.embedding AS DOUBLE[])) AS cos_sim
FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = {QUERY_VEC_ID}) q
WHERE e.vec_id != {QUERY_VEC_ID}
ORDER BY cos_sim DESC, e.vec_id ASC
LIMIT {TOP_K}
"""


SIM_JOIN_THRESHOLD = 0.3


def q_sim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine-similarity join within label blocks, cos ≥ 0.3.

    Blocking on an equi key turns the quadratic crossJoin into a hash
    join + per-block pair expansion — the same shape LSH bucketing
    produces, but exact (hence oracle-checkable).
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    a = emb.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "label"
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "label"
    )
    return (
        a.join(b, "label")
        .where(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos_sim", cosine(F.col("ea"), F.col("eb")))
        .where(F.col("cos_sim") >= SIM_JOIN_THRESHOLD)
        .select("label", "vec_a", "vec_b", "cos_sim")
    )


SQL_SIM_JOIN = f"""
SELECT a.label, a.vec_id AS vec_a, b.vec_id AS vec_b,
       list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                              CAST(b.embedding AS DOUBLE[])) AS cos_sim
FROM embeddings a
JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= {SIM_JOIN_THRESHOLD}
"""


N_CENTROIDS = 16
N_PROBE = 4


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-flat approximate top-k.

    "Training" is deterministic: the first N_CENTROIDS embeddings (by
    vec_id) act as centroids. Every vector is assigned to its nearest
    centroid once (broadcast centroids, map-only argmax); the query
    probes its N_PROBE nearest cells and brute-forces only those.

    Scale: the assignment scan is one pass; each query touches
    |D|·(probe/cells) of the data. Real IVF would k-means the centroids
    — the plan shape (broadcast-assign, cell-pruned search) is identical.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    cents = F.broadcast(
        emb.where(F.col("vec_id") < N_CENTROIDS).select(
            F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
        )
    )

    # nearest-centroid assignment: argmax cosine via max_by (deterministic
    # tie-break: max_by on a (cos, -cent_id) struct orders lexicographically)
    def assign(df: DataFrame, vec_col: str, out: str) -> DataFrame:
        scored = df.crossJoin(cents).withColumn(
            "_cos", cosine(F.col(vec_col), F.col("cvec"))
        )
        return scored.groupBy(df.columns).agg(
            F.max_by(
                "cent_id", F.struct(F.col("_cos"), (-F.col("cent_id")).alias("nc"))
            ).alias(out)
        )

    assigned = assign(
        emb.where(F.col("vec_id") != QUERY_VEC_ID), "embedding", "cell"
    )

    # query's N_PROBE nearest cells
    qv = _query_vec(emb)
    probes = (
        qv.crossJoin(cents)
        .withColumn("_cos", cosine(F.col("qvec"), F.col("cvec")))
        .orderBy(F.col("_cos").desc(), F.col("cent_id").asc())
        .limit(N_PROBE)
        .select("cent_id")
    )

    return (
        assigned.join(F.broadcast(probes), assigned.cell == probes.cent_id)
        .crossJoin(F.broadcast(qv))
        .withColumn("cos_sim", cosine(F.col("embedding"), F.col("qvec")))
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(TOP_K)
        .select("vec_id", "label", "cell", "cos_sim")
    )


QUERIES = [
    Query("sim_topk", q_sim_topk, SQL_SIM_TOPK, ("llm", "similarity"), bench=True),
    Query("sim_join", q_sim_join, SQL_SIM_JOIN, ("llm", "similarity"), bench=True),
    Query("ann_ivf_topk", q_ann_ivf_topk, None, ("llm", "similarity", "approx")),
]
