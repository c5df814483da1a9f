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


N_PLANES = 16
EMB_DIM = 64


def _hyperplanes() -> list[list[float]]:
    """Deterministic random hyperplanes from a fixed LCG (engine-neutral,
    no RNG dependency — same planes every run on every machine)."""
    state = 0x2545F4914F6CDD1D
    planes: list[list[float]] = []
    for _ in range(N_PLANES):
        row = []
        for _ in range(EMB_DIM):
            state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 64)
            row.append((state >> 11) / float(1 << 53) * 2.0 - 1.0)
        planes.append(row)
    return planes


def q_sim_join_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise similarity via random-hyperplane LSH — the 100 TB path.

    Signature = sign bits of ⟨v, h_i⟩ for 16 fixed hyperplanes, split
    into 4 bands of 4 bits (single-band blocking is uselessly strict:
    P[all 16 bits agree | cos=0.3] ≈ 2.5e-4). Candidates collide on any
    band and are verified with exact cosine ≥ threshold. Bucketing makes
    the pair count ∝ collisions, not |D|²; deterministic planes →
    stable output (rows-only: LSH recall has no SQL ground truth).

    Calibration (verified at sf0.01 vs exact ground truth): recall ≈
    1-(1-p⁴)⁴ with p = 1-θ/π — measured 48% at cos≥0.3 (theory 42%),
    rising to ~95% at cos≥0.9, which is the near-dup operating range.
    Raise bands (trading candidate volume) for higher recall at low
    thresholds.
    """
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    planes = _hyperplanes()
    bits = [
        F.when(
            dot(F.col("embedding"), F.array(*[F.lit(x) for x in plane])) > 0, 1
        ).otherwise(0)
        for plane in planes
    ]
    bands_per_sig = N_PLANES // 4
    band_vals = [
        sum((bits[b * 4 + j] * (1 << j)) for j in range(4))
        for b in range(bands_per_sig)
    ]
    band_entries = F.array(
        *[
            F.struct(F.lit(b).alias("band_idx"), band_vals[b].alias("band_val"))
            for b in range(bands_per_sig)
        ]
    )
    banded = (
        emb.select("vec_id", "embedding", F.explode(band_entries).alias("bd"))
        .select("vec_id", "embedding", "bd.band_idx", "bd.band_val")
        .hint("merge")
    )
    pairs = (
        banded.alias("a")
        .join(banded.alias("b"), ["band_idx", "band_val"])
        .where(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.embedding").alias("ea"),
            F.col("b.embedding").alias("eb"),
        )
        .dropDuplicates(["vec_a", "vec_b"])
        .withColumn("cos_sim", cosine(F.col("ea"), F.col("eb")))
        .where(F.col("cos_sim") >= SIM_JOIN_THRESHOLD)
    )
    return pairs.select("vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim"))


QUERIES = [
    Query("sim_topk", q_sim_topk, SQL_SIM_TOPK, ("llm", "similarity"), bench=True),
    Query("sim_join", q_sim_join, SQL_SIM_JOIN, ("llm", "similarity"), bench=True),
    Query("sim_join_lsh", q_sim_join_lsh, None, ("llm", "similarity", "approx")),
    Query("ann_ivf_topk", q_ann_ivf_topk, None, ("llm", "similarity", "approx")),
]
