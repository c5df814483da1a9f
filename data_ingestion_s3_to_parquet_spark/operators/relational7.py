"""Round-4 additions: three more patterns a training-data pipeline
leans on, exposed as oracle-gated EXTRA-lane operators (they lead the
lane so a larger harness budget grades the never-graded entries first).

- ``window_distribution`` — the distribution window family
  (``ntile`` / ``percent_rank`` / ``cume_dist``): quota assignment and
  score calibration over ranked groups — the window shapes behind
  per-source quality-quantile bucketing of a corpus.
- ``interleave_mix`` — deterministic weighted dataset interleaving
  (stride scheduling): given per-language integer weights, emit the
  exact training-mix order a data loader should read, as a pure
  function of row values — reproducible across engines, partitionings,
  and cluster sizes (same rule as ``sample_split``: no seeded rand).
- ``text_normalize`` — canonical text normalization (lowercase, trim,
  whitespace collapse) with audit metrics and a content fingerprint:
  the first map-only pass of every corpus pipeline, and the
  normalization step exact dedup keys on.

Reference: /root/reference/src/main.rs has none of these (its surface
is the 9 §2A ingestion stages); these extend SURVEY.md §2B per the
BASELINE north star.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..plans.spec import Query
from ..sources.catalog import load_table


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows over orders: quartile (ntile), percent rank,
    cumulative distribution per order-priority group.

    One sort+shuffle serves all three functions (same window spec), and
    ``WindowExec`` streams each partition — per-task state is O(frame),
    not O(partition). Total order (o_totalprice, o_orderkey) makes
    ntile boundaries engine-deterministic. percent_rank/cume_dist are
    rebuilt from their integer ingredients (rank, peer count, n) and
    quantized by HALF-UP INTEGER DIVISION at 6 dp — rounding the
    engines' double ratios instead sits exactly on grid midpoints for
    unlucky (rank, n) pairs, the midpoint class of SCALE.md §34's
    postscript. All intermediates stay ≤ ~2e10, far inside exact
    int64/double range.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wp = Window.partitionBy("o_orderpriority")
    n = F.count("*").over(wp)
    # rank() yields INT; the micro-scaling below would overflow int32
    # for groups past ~1000 rows (measured: negative pct_rank at
    # sf0.01) — everything enters the arithmetic as long
    rk = F.rank().over(w).cast("long")
    # peers-inclusive running count == cume_dist numerator
    le = F.count("*").over(
        w.rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def micro_div(num, den):
        # round(num/den * 1e6) half-up, exact: operands < 2^53
        scaled = num * 1_000_000 * 2 + den
        return F.floor(scaled / (2 * den)).cast("long")

    pct = F.when(n == 1, F.lit(0)).otherwise(micro_div(rk - 1, n - 1))
    return o.select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.ntile(4).over(w).alias("quartile"),
        (pct.cast("double") / 1e6).alias("pct_rank"),
        (micro_div(le, n).cast("double") / 1e6).alias("cum_dist"),
    )


SQL_WINDOW_DISTRIBUTION = """
WITH b AS (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ntile(4) OVER w AS quartile,
         rank()   OVER w AS rk,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n,
         COUNT(*) OVER (PARTITION BY o_orderpriority
                        ORDER BY o_totalprice, o_orderkey
                        RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS le
  FROM orders
  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
)
SELECT o_orderpriority, o_orderkey, o_totalprice, quartile,
       CAST(CASE WHEN n = 1 THEN 0
                 ELSE ((rk - 1) * 2000000 + (n - 1)) // (2 * (n - 1))
            END AS DOUBLE) / 1000000.0 AS pct_rank,
       CAST((le * 2000000 + n) // (2 * n) AS DOUBLE) / 1000000.0 AS cum_dist
FROM b
"""


# Integer stride weights per language (higher = denser in the mix).
# LCM-based integer strides keep the interleave key exact — float
# strides would risk cross-engine rounding flips on ties.
MIX_WEIGHTS = {"en": 5, "fr": 4, "de": 3, "es": 2, "zh": 1}
_MIX_LCM = 60  # lcm(1..5)


def _stride_case() -> str:
    whens = " ".join(
        f"WHEN '{lang}' THEN {_MIX_LCM // w}" for lang, w in MIX_WEIGHTS.items()
    )
    return f"CASE lang {whens} ELSE {_MIX_LCM} END"


def q_interleave_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted corpus interleave (stride scheduling).

    Each language is an input "source" with an integer weight; the k-th
    document of source s (in md5(doc_id) order — value-derived, layout-
    independent) is scheduled at virtual time (2k-1)·(LCM/w_s), and the
    global mix order is that key ascending. The result is the classic
    stride/WFQ schedule: over any window of the output, source s
    contributes ≈ w_s/Σw of the rows — the exact composition control a
    training data loader needs, with no RNG anywhere.

    Scale: the per-language row_number is an ordinary partitioned
    window; ``mix_key`` is a pure function of row values, so
    re-running on any cluster size or appending a shard yields the
    same schedule (same invariance argument as ``sample_split``,
    SCALE.md §20). The final GLOBAL ``row_number`` exists only to
    materialize an explicit position for the oracle's hash — it is a
    single-partition window by definition. A production loader does
    NOT need it: ``mix_key`` is already the total order, so consumers
    range-sort by it (``repartitionByRange`` — fully distributed) and
    read partitions in key order.
    """
    d = load_table(spark, sf_dir, "documents")
    per_src = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    stride = F.expr(_stride_case())
    keyed = d.select(
        "doc_id",
        "lang",
        F.row_number().over(per_src).alias("rn"),
    ).withColumn("mix_key", (2 * F.col("rn") - 1) * stride)
    return keyed.select(
        F.row_number()
        .over(Window.orderBy("mix_key", "lang", "doc_id"))
        .alias("mix_pos"),
        "doc_id",
        "lang",
        "rn",
        "mix_key",
    )


def interleave_mix_distributed(
    spark: SparkSession, sf_dir: str, num_ranges: int = 8
) -> DataFrame:
    """The PRODUCTION materialization of :func:`q_interleave_mix`'s
    schedule — identical output, no single-partition sort (the one
    graded plan VERDICT r5's audit flagged as not surviving 100×).

    Distributed global ranking, the classic two-pass shape:

    1. ``repartitionByRange`` on the total order (mix_key, lang,
       doc_id) — a fully parallel range shuffle (sampled bounds) —
       then sort WITHIN each range partition only;
    2. count rows per range partition (a ``spark_partition_id``
       groupBy: one map-side-combined shuffle of ≤ num_ranges rows)
       and turn the counts into cumulative offsets driver-side —
       bounded by the partition count, never by data volume;
    3. ``mix_pos`` = offset[pid] + intra-partition row_number.

    Every stage is parallel in num_ranges; the only driver state is
    one integer per range partition. Equivalence to the graded
    single-partition materialization is pinned by
    tests/test_operators.py::test_interleave_mix_distributed_matches_graded.

    Storage lifetime (ADVICE r6): the eager ``localCheckpoint`` that
    pins partition ids across the two passes keeps one copy of the
    ranged frame in executor storage until released — it CANNOT be
    unpersisted here because the returned frame is lazy and its
    lineage is truncated at the checkpoint. The checkpointed frame is
    exposed as ``result.checkpoint_frame``; callers that invoke this
    repeatedly in one session should call
    ``result.checkpoint_frame.unpersist()`` after materializing the
    result.
    """
    d = load_table(spark, sf_dir, "documents")
    per_src = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    stride = F.expr(_stride_case())
    keyed = d.select(
        "doc_id", "lang", F.row_number().over(per_src).alias("rn")
    ).withColumn("mix_key", (2 * F.col("rn") - 1) * stride)

    ranged = (
        keyed.repartitionByRange(num_ranges, "mix_key", "lang", "doc_id")
        .sortWithinPartitions("mix_key", "lang", "doc_id")
        .withColumn("pid", F.spark_partition_id())
    )
    ranged = ranged.localCheckpoint(eager=True)  # pin pids across the two passes
    counts = {
        r.pid: r.c
        for r in ranged.groupBy("pid").agg(F.count("*").alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    intra = Window.partitionBy("pid").orderBy("mix_key", "lang", "doc_id")
    out = ranged.select(
        (off[F.col("pid")] + F.row_number().over(intra)).alias("mix_pos"),
        "doc_id",
        "lang",
        "rn",
        "mix_key",
    )
    out.checkpoint_frame = ranged  # release handle — see docstring
    return out


SQL_INTERLEAVE_MIX = f"""
WITH keyed AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents
),
strided AS (
  SELECT doc_id, lang, rn,
         (2 * rn - 1) * ({_stride_case()}) AS mix_key
  FROM keyed
)
SELECT row_number() OVER (ORDER BY mix_key, lang, doc_id) AS mix_pos,
       doc_id, lang, rn, mix_key
FROM strided
"""


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical text normalization with audit metrics: lowercase, trim,
    collapse runs of whitespace to single spaces; emit before/after
    sizes, a changed flag, and an md5 fingerprint of the normalized
    text (the key exact dedup should run on — byte-noise variants of
    the same content collapse to one fingerprint).

    Map-only: pure string expressions inside whole-stage codegen, no
    shuffle, no UDF — at 100 TB this pass is scan-bound, exactly as a
    first-pass normalizer must be.
    """
    d = load_table(spark, sf_dir, "documents")
    norm = F.trim(F.regexp_replace(F.lower(F.col("text")), r"\s+", " "))
    return d.select(
        "doc_id",
        "lang",
        F.length("text").alias("n_chars_raw"),
        F.length(norm).alias("n_chars_norm"),
        F.size(F.split(norm, " ")).alias("n_tokens_norm"),
        (norm != F.col("text")).alias("changed"),
        F.md5(norm).alias("norm_fingerprint"),
    )


SQL_TEXT_NORMALIZE = r"""
WITH n AS (
  SELECT doc_id, lang, text,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
  FROM documents
)
SELECT doc_id, lang,
       length(text) AS n_chars_raw,
       length(norm) AS n_chars_norm,
       length(string_split(norm, ' ')) AS n_tokens_norm,
       norm != text AS changed,
       md5(norm) AS norm_fingerprint
FROM n
"""


QUERIES: list[Query] = []


# The three round-6 operators (defined in trainprep/similarity/dedup)
# register HERE — the first QUERIES-contributing module after parity —
# so they lead the graded lane for round 7 (VERDICT r6 #1: they were
# the only oracle-gated entries without a driver row; their promotion
# restores the every-operator-graded invariant permanently).
def _promoted_r7() -> list[Query]:
    # dedup_keep_best and emb_gram used to register here; since their
    # round-10 demotions (see _demoted_r10_w7 / _demoted_r10_w9) this
    # helper imports only what it still returns.
    from .trainprep import SQL_DEDUP_PASSAGES, q_dedup_passages

    return [
        Query(
            "dedup_passages",
            q_dedup_passages,
            SQL_DEDUP_PASSAGES,
            ("llm", "dedup", "text"),
            bench=True,  # the substring-dedup representative
        ),
        # emb_gram (double-green r8+r9) demoted in the round-10
        # seventh-wave rotation for relational16's gini_concentration
        # — see _demoted_r10_w7 (bench flag kept); dedup_keep_best
        # (double-green r8+r9) demoted in the ninth-wave rotation for
        # graph_assortativity — see _demoted_r10_w9
    ]


# The 28 NEW round-7 operators (defined across graph / trainprep /
# similarity / textstats / dedup / relational9 / streaming.windows)
# register HERE, right after the round-6 trio, so they grade THIS
# round: the second intra-round-7 rotation promotes every
# never-driver-graded entry into the graded 50 (the same discipline
# VERDICT r6 #1 applied to the round-6 trio), demoting 28 multi-green
# veterans to the EXTRA lane in exchange. Once round 7 grades, every
# oracle-gated operator in the repo has a driver CORRECTNESS row.
def _promoted_r7_wave2() -> list[Query]:
    # After the round-10 demotions (session_paths, sim_join_kmeans,
    # entropy_score, word_filter — see the _demoted_r10_* helpers)
    # this wave registers four queries; the demoted lanes import
    # their own symbols, so only the four survivors' are needed here.
    from .relational9 import SQL_CHI2_CONTINGENCY, q_chi2_contingency
    from .similarity import SQL_ANN_TWO_STAGE, q_ann_two_stage
    from .textstats import SQL_CONTENT_CHUNKS, q_content_chunks
    from ..streaming.windows import (
        SQL_STREAM_JOIN_INTERVAL,
        q_stream_join_interval,
    )

    return [
        Query(
            "stream_join_interval",
            q_stream_join_interval,
            SQL_STREAM_JOIN_INTERVAL,
            ("streaming", "join"),
        ),
        # sim_join_kmeans (double-green r8+r9) demoted in the
        # round-10 eighth-wave rotation for relational16's
        # privacy_tcloseness — see _demoted_r10_w8
        # session_paths (double-green r8+r9) demoted in the round-10
        # sixth-wave rotation for anova_oneway — see _demoted_r10_w6
        Query(
            "chi2_contingency",
            q_chi2_contingency,
            SQL_CHI2_CONTINGENCY,
            ("relational", "analytics", "statistics"),
        ),
        Query(
            "ann_two_stage",
            q_ann_two_stage,
            SQL_ANN_TWO_STAGE,
            ("llm", "similarity", "approx", "topk", "pipeline"),
        ),
        # entropy_score (double-green r8+r9) demoted in the round-10
        # ninth-wave rotation for the eval_mrr_scale promotion — see
        # _demoted_r10_w9
        Query(
            "content_chunks",
            q_content_chunks,
            SQL_CONTENT_CHUNKS,
            ("llm", "text", "dedup", "rag"),
            bench=True,  # the token-window + fingerprint-window representative
        ),
        # word_filter (double-green r8+r9) demoted in the round-10
        # ninth-wave rotation for relational16's eval_fleiss_kappa —
        # see _demoted_r10_w9
    ]


# Graded lane contribution: the round-6 trio and the 28 round-7
# promotees. The round-5 veterans that used to sit here
# (window_distribution, interleave_mix, text_normalize — green r5+r6)
# all demoted in round 7: the first two post-wave-2 in exchange for
# the new dsir_weights / token_budget_select (registered in
# trainprep), interleave_mix in wave 2.
QUERIES = _promoted_r7() + _promoted_r7_wave2()

# New never-graded operators register HERE — the first
# EXTRA-contributing module in registry order — so they lead the lane
# and a larger harness budget (or the next swap) grades them first.
# As of the round-7 wave-2 rotation the lane holds only entries with
# prior green driver rows; the three round-5 veterans above lead it.
def _demoted_r8() -> list[Query]:
    """The round-8 final-rotation demotees (each green in r7): their
    graded slots went to the twelve never-graded round-8 lanes
    (relational12's evaluation family, mmr_rerank, join_asof_nearest,
    graph_sssp, stream_dedup, jsonl_interop, dedup_incremental,
    lm_bigram_score, eval_auc). They lead the EXTRA lane with their
    oracles and bench flags intact."""
    from .dedup import SQL_DEDUP_SOFT, q_dedup_soft
    from .relational9 import (
        SQL_MARKOV_TRANSITIONS,
        SQL_MERGE_INTERVALS,
        SQL_ROBUST_STATS,
        q_markov_transitions,
        q_merge_intervals,
        q_robust_stats,
    )
    from .textstats import (
        SQL_CMS_COUNTS,
        SQL_FREQ_ITEMS_TOPK,
        SQL_NGRAM_COUNTS,
        SQL_STRIP_MARKUP,
        SQL_URL_CANONICALIZE,
        q_cms_counts,
        q_freq_items_topk,
        q_ngram_counts,
        q_strip_markup,
        q_url_canonicalize,
    )
    from .trainprep import (
        SQL_BATCH_BY_LENGTH,
        SQL_MIX_WEIGHTS,
        SQL_SHARD_MANIFEST,
        q_batch_by_length,
        q_mix_weights,
        q_shard_manifest,
    )

    return [
        Query(
            "freq_items_topk",
            q_freq_items_topk,
            SQL_FREQ_ITEMS_TOPK,
            ("llm", "text", "agg", "approx"),
        ),
        Query(
            "dedup_soft",
            q_dedup_soft,
            SQL_DEDUP_SOFT,
            ("llm", "dedup", "agg"),
        ),
        Query(
            "mix_weights",
            q_mix_weights,
            SQL_MIX_WEIGHTS,
            ("llm", "sampling", "agg"),
        ),
        Query(
            "strip_markup",
            q_strip_markup,
            SQL_STRIP_MARKUP,
            ("llm", "text"),
        ),
        Query(
            "ngram_counts",
            q_ngram_counts,
            SQL_NGRAM_COUNTS,
            ("llm", "text", "agg"),
            bench=True,  # corpus-frequency representative (scan + one shuffle + top-k)
        ),
        Query(
            "merge_intervals",
            q_merge_intervals,
            SQL_MERGE_INTERVALS,
            ("relational", "window", "timeseries"),
        ),
        Query(
            "markov_transitions",
            q_markov_transitions,
            SQL_MARKOV_TRANSITIONS,
            ("relational", "analytics", "window"),
            bench=True,  # the bounded-key sequence-statistic representative
        ),
        Query(
            "robust_stats",
            q_robust_stats,
            SQL_ROBUST_STATS,
            ("relational", "profiling", "window"),
        ),
        Query(
            "shard_manifest",
            q_shard_manifest,
            SQL_SHARD_MANIFEST,
            ("llm", "pipeline", "agg"),
        ),
        Query(
            "batch_by_length",
            q_batch_by_length,
            SQL_BATCH_BY_LENGTH,
            ("llm", "pipeline", "window"),
        ),
        Query(
            "url_canonicalize",
            q_url_canonicalize,
            SQL_URL_CANONICALIZE,
            ("llm", "text", "dedup"),
        ),
        Query(
            "cms_counts",
            q_cms_counts,
            SQL_CMS_COUNTS,
            ("llm", "text", "agg", "approx"),
        ),
    ]


def _demoted_r9() -> list[Query]:
    # double-green r7+r8 veterans traded one-for-one for
    # relational13's eight new round-9 operators (drift_ks /
    # skew_autosalt / privacy_kanon / quantile_select / rolling_median
    # / forecast_snaive / ref_integrity_audit / reconcile_sources)
    from .graph import SQL_GRAPH_TRIANGLES, q_graph_triangles
    from .similarity import (
        SQL_ANN_PQ_TOPK,
        SQL_KMEANS_EMBEDDINGS,
        SQL_PQ_ENCODE,
        q_ann_pq_topk,
        q_kmeans_embeddings,
        q_pq_encode,
    )
    from .textstats import (
        SQL_PMI_COOCCUR,
        SQL_VOCAB_COVERAGE,
        q_pmi_cooccur,
        q_vocab_coverage,
    )
    from .trainprep import (
        SQL_BPE_APPLY,
        SQL_BPE_MERGES,
        q_bpe_apply,
        q_bpe_merges,
    )

    return [
        Query(
            "kmeans_embeddings",
            q_kmeans_embeddings,
            SQL_KMEANS_EMBEDDINGS,
            ("llm", "similarity", "iterative", "agg"),
            bench=True,  # the broadcast-model iteration, timed end-to-end
        ),
        Query(
            "graph_triangles",
            q_graph_triangles,
            SQL_GRAPH_TRIANGLES,
            ("llm", "graph", "join"),
        ),
        Query(
            "vocab_coverage",
            q_vocab_coverage,
            SQL_VOCAB_COVERAGE,
            ("llm", "text", "agg"),
        ),
        Query(
            "bpe_merges",
            q_bpe_merges,
            SQL_BPE_MERGES,
            ("llm", "text", "iterative"),
        ),
        Query(
            "bpe_apply",
            q_bpe_apply,
            SQL_BPE_APPLY,
            ("llm", "text", "iterative", "pipeline"),
        ),
        Query(
            "pq_encode",
            q_pq_encode,
            SQL_PQ_ENCODE,
            ("llm", "similarity", "iterative", "approx"),
        ),
        Query(
            "ann_pq_topk",
            q_ann_pq_topk,
            SQL_ANN_PQ_TOPK,
            ("llm", "similarity", "approx", "topk"),
        ),
        Query(
            "pmi_cooccur",
            q_pmi_cooccur,
            SQL_PMI_COOCCUR,
            ("llm", "text", "agg"),
        ),
    ]


def _demoted_r10_w6() -> list[Query]:
    # double-green r8+r9 veteran traded for relational15's
    # anova_oneway in the round-10 sixth-wave rotation
    from .relational9 import SQL_SESSION_PATHS, q_session_paths

    return [
        Query(
            "session_paths",
            q_session_paths,
            SQL_SESSION_PATHS,
            ("relational", "analytics", "window"),
        ),
    ]


def _demoted_r10_w9() -> list[Query]:
    # double-green r8+r9 veterans traded for relational16's
    # graph_assortativity and the eval_mrr_scale promotion (the
    # registry's last never-graded oracle lane) in the round-10
    # ninth-wave rotation
    from .dedup import SQL_DEDUP_KEEP_BEST as _SQL_DKB
    from .dedup import q_dedup_keep_best as _q_dkb
    from .textstats import SQL_ENTROPY_SCORE as _SQL_ES
    from .textstats import SQL_WORD_FILTER as _SQL_WF
    from .textstats import q_entropy_score as _q_es
    from .textstats import q_word_filter as _q_wf

    return [
        Query(
            "dedup_keep_best",
            _q_dkb,
            _SQL_DKB,
            ("llm", "dedup", "quality"),
        ),
        Query(
            "entropy_score",
            _q_es,
            _SQL_ES,
            ("llm", "text", "quality"),
        ),
        Query(
            "word_filter",
            _q_wf,
            _SQL_WF,
            ("llm", "text", "quality"),
        ),
    ]


def _demoted_r10_w8() -> list[Query]:
    # double-green r8+r9 veteran traded for relational16's
    # privacy_tcloseness in the round-10 eighth-wave rotation
    from .similarity import SQL_SIM_JOIN_KMEANS as _SQL_SJK
    from .similarity import q_sim_join_kmeans as _q_sjk

    return [
        Query(
            "sim_join_kmeans",
            _q_sjk,
            _SQL_SJK,
            ("llm", "similarity", "dedup", "pipeline"),
        ),
    ]


def _demoted_r10_w7() -> list[Query]:
    # double-green r8+r9 veteran traded for relational16's
    # gini_concentration in the round-10 seventh-wave rotation
    from .similarity import SQL_EMB_GRAM, q_emb_gram

    return [
        Query(
            "emb_gram",
            q_emb_gram,
            SQL_EMB_GRAM,
            ("llm", "similarity", "linalg"),
            bench=True,  # the huge-N x small-d reduction representative
        ),
    ]


EXTRA_QUERIES: list[Query] = (
    _demoted_r10_w9() + _demoted_r10_w8() + _demoted_r10_w7()
    + _demoted_r10_w6() + _demoted_r9() + _demoted_r8()
) + [
    # interleave_mix re-promoted to the graded lane in round 14 (r6
    # driver row; it registers via relational20)
    Query(
        "window_distribution",
        q_window_distribution,
        SQL_WINDOW_DISTRIBUTION,
        ("relational", "window"),
    ),
    Query(
        "text_normalize",
        q_text_normalize,
        SQL_TEXT_NORMALIZE,
        ("llm", "text"),
    ),
]
