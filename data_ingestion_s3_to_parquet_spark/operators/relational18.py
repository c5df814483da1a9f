"""Round-12 graded-lane registrations: the three NEW operators
(VERDICT r11 #2/#3/#4) plus the grade-freshness promotion cohort.

- ``eval_kripp_alpha_ordinal``  weighted Krippendorff's alpha with
                                the squared-rank-distance (interval)
                                delta over 0-3 rubric grades
                                (operators/relational16.py) — the
                                agreement family's ordinal leg for
                                LLM-judge scoring scales.
- ``graph_community_profile``   one row per LPA community — size,
                                intra/cut edges, internal
                                transitivity, modularity
                                contribution (operators/graph.py) —
                                the per-cluster trust table behind
                                ``graph_modularity``'s one verdict.
- ``event_interarrival``        per-type inter-arrival CV and
                                Goh–Barabási B-index
                                (operators/relational14.py) —
                                ``event_burstiness``'s sub-hour
                                twin: catches clumping the hourly
                                Fano grid cannot see.

All three are never-graded, so they register FIRST (the
never-graded-first rule); definitions live with their families, the
registration lives here — the relational7/relational17 pattern.
Five more round-12 waves followed, each never-graded-first with a
multi-green one-for-one demotion (see the inline wave comments):
wave 2 ``text_yule_k`` (Yule's K + Simpson repeat rate), wave 3
``len_lognormal_fit`` (doc-length shape check), wave 4
``word_adaptation`` (Church–Gale per-word burstiness), wave 5
``eval_qwk`` (quadratic-weighted kappa), wave 6 ``text_mattr``
(moving-average TTR via the closed-form window collapse).

After them: the round-12 grade-freshness rotation (VERDICT r11 #1).
The promotion set is the twelve lanes whose driver rows were
measured OLDEST from CORRECTNESS_r01–r11 at the start of round 12 —
nine last graded in ROUND 4 (window_analytic, subquery_scalar,
agg_percentile, pivot, join_skew_salted, sql_frontend,
agg_argminmax, udaf_grouped, join_null_safe) and the first three of
the ROUND-5 cohort (dedup_exact, dedup_embedding, dedup_components).
Fifteen lanes demote one-for-one from relational17's graded list:
the seven round-11 single-green first-timers plus eight of the
twelve r11-refreshed promotion veterans (all multi-green — they now
LEAD the EXTRA lane via relational17.EXTRA_QUERIES). The remaining
r5-row cohort (dedup_fuzzy, dedup_ngram_jaccard, sample_split,
decontaminate, corpus_prep, emb_centroids, sim_topk,
map_in_pandas_tokens) was promoted in round 13 via relational19;
the round-13 rotation also demoted this module's eleven round-12
first-timers plus window_analytic to EXTRA_QUERIES below (they lead
the EXTRA lane).

Reference parity note: the reference (/root/reference/src/main.rs,
208 lines) has no query surface at all; every lane here belongs to
the mandated Layer-B extension inventory (SURVEY §2B) or the
LLM-pipeline families.
"""

from __future__ import annotations

from ..plans.spec import Query
from .dedup import (
    SQL_DEDUP_COMPONENTS,
    SQL_DEDUP_EMBEDDING,
    SQL_DEDUP_EXACT,
    q_dedup_components,
    q_dedup_embedding,
    q_dedup_exact,
)
from .graph import SQL_GRAPH_COMMUNITY_PROFILE, q_graph_community_profile
from .relational import SQL_WINDOW_ANALYTIC, q_window_analytic
from .relational2 import (
    SQL_AGG_PERCENTILE,
    SQL_JOIN_SKEW_SALTED,
    SQL_PIVOT,
    SQL_SQL_FRONTEND,
    SQL_SUBQUERY_SCALAR,
    q_agg_percentile,
    q_join_skew_salted,
    q_pivot,
    q_sql_frontend,
    q_subquery_scalar,
)
from .relational3 import (
    SQL_AGG_ARGMINMAX,
    SQL_UDAF_GROUPED,
    q_agg_argminmax,
    q_udaf_grouped,
)
from .relational5 import SQL_JOIN_NULL_SAFE, q_join_null_safe
from .trainprep import (
    SQL_BOOTSTRAP_CI_MEAN,
    SQL_BOOTSTRAP_CI_RATIO,
    q_bootstrap_ci_mean,
    q_bootstrap_ci_ratio,
)
from .relational14 import (
    SQL_EVENT_INTERARRIVAL,
    q_event_interarrival,
    q_event_interarrival_scale,
)
from .relational16 import (
    SQL_EVAL_KRIPP_ALPHA_ORDINAL,
    SQL_EVAL_QWK,
    q_eval_kripp_alpha_ordinal,
    q_eval_qwk,
)
from .textstats import (
    SQL_LEN_LOGNORMAL_FIT,
    SQL_TEXT_MATTR,
    SQL_TEXT_YULE_K,
    SQL_WORD_ADAPTATION,
    q_len_lognormal_fit,
    q_text_mattr,
    q_text_yule_k,
    q_word_adaptation,
)

# Demoted to the EXTRA lane in the round-13 rotation: the eleven
# round-12 single-green first-timers plus window_analytic (the first
# of the twelve r12-refreshed promotion veterans) traded their graded
# slots for the twelve measured-oldest r5/r6-row lanes promoted via
# relational19. They LEAD the EXTRA lane (this module precedes the
# older EXTRA contributors in plans.registry._MODULES); oracles and
# bench flags intact.
EXTRA_QUERIES: list[Query] = [
    Query(
        "eval_kripp_alpha_ordinal",
        q_eval_kripp_alpha_ordinal,
        SQL_EVAL_KRIPP_ALPHA_ORDINAL,
        ("llm", "evaluation", "statistics", "quality"),
    ),
    Query(
        "graph_community_profile",
        q_graph_community_profile,
        SQL_GRAPH_COMMUNITY_PROFILE,
        ("llm", "graph", "dedup", "evaluation"),
    ),
    Query(
        "event_interarrival",
        q_event_interarrival,
        SQL_EVENT_INTERARRIVAL,
        ("relational", "timeseries", "monitoring", "statistics"),
    ),
    # --- round-12 SECOND wave (never-graded; join_broadcast — r11 +
    # r4 greens — demoted one-for-one to relational17's EXTRA) ---
    Query(
        "text_yule_k",
        q_text_yule_k,
        SQL_TEXT_YULE_K,
        ("llm", "text", "statistics", "quality"),
    ),
    # --- round-12 THIRD wave (never-graded; join_asof — r11 + r4
    # greens — demoted one-for-one to relational17's EXTRA) ---
    Query(
        "len_lognormal_fit",
        q_len_lognormal_fit,
        SQL_LEN_LOGNORMAL_FIT,
        ("llm", "text", "statistics", "quality", "monitoring"),
    ),
    # --- round-12 FOURTH wave (never-graded; dedup_containment —
    # green r10 + r11 — demoted one-for-one to relational16's
    # EXTRA) ---
    Query(
        "word_adaptation",
        q_word_adaptation,
        SQL_WORD_ADAPTATION,
        ("llm", "text", "statistics", "quality"),
    ),
    # --- round-12 FIFTH wave (never-graded; gini_concentration —
    # green r10 + r11 — demoted one-for-one to relational16's
    # EXTRA) ---
    Query(
        "eval_qwk",
        q_eval_qwk,
        SQL_EVAL_QWK,
        ("llm", "evaluation", "statistics", "quality"),
    ),
    # --- round-12 SIXTH wave (never-graded; mmr_rerank — multi-green
    # r8-r11 — demoted one-for-one to relational12's EXTRA, bench
    # flag intact) ---
    Query(
        "text_mattr",
        q_text_mattr,
        SQL_TEXT_MATTR,
        ("llm", "text", "statistics", "quality", "window"),
    ),
    # --- round-12 SEVENTH wave (never-graded; eval_auc — multi-green
    # r8-r11 — demoted one-for-one to relational11's EXTRA) ---
    Query(
        "bootstrap_ci_mean",
        q_bootstrap_ci_mean,
        SQL_BOOTSTRAP_CI_MEAN,
        ("relational", "statistics", "sampling", "evaluation"),
    ),
    # --- round-12 EIGHTH wave (never-graded; rank_bm25 — multi-green
    # r8-r11 — demoted one-for-one to relational10's EXTRA). The
    # segmented 100 TB twin shares the base lane's oracle — the two
    # formulations are row-identical by construction (pinned) ---
    Query(
        "event_interarrival_scale",
        q_event_interarrival_scale,
        SQL_EVENT_INTERARRIVAL,
        ("relational", "timeseries", "monitoring", "statistics"),
    ),
    # --- round-12 NINTH wave (never-graded; window_rank — SIX green
    # rows, the most-graded operator after ingest_parity — demoted
    # one-for-one to relational's EXTRA) ---
    Query(
        "bootstrap_ci_ratio",
        q_bootstrap_ci_ratio,
        SQL_BOOTSTRAP_CI_RATIO,
        ("relational", "statistics", "sampling", "evaluation"),
    ),
    Query(
        "window_analytic",
        q_window_analytic,
        SQL_WINDOW_ANALYTIC,
        ("relational", "window"),
        bench=True,
    ),
    # --- demoted in the round-13 FIRST wave for the new
    # bootstrap_ci_quantile (r4 + r12 greens) ---
    Query(
        "subquery_scalar",
        q_subquery_scalar,
        SQL_SUBQUERY_SCALAR,
        ("relational", "subquery"),
    ),
    # --- demoted in the round-13 SECOND wave for the new
    # perm_test_diff (r4 + r12 greens) ---
    Query(
        "agg_percentile",
        q_agg_percentile,
        SQL_AGG_PERCENTILE,
        ("relational", "agg"),
    ),
    # --- demoted in the round-13 THIRD wave for the new
    # stream_bootstrap (r4 + r12 greens) ---
    Query("pivot", q_pivot, SQL_PIVOT, ("relational", "agg")),
    # --- demoted in the round-13 FOURTH wave for the new
    # bootstrap_ci_diff (r4 + r12 greens) ---
    Query(
        "join_skew_salted",
        q_join_skew_salted,
        SQL_JOIN_SKEW_SALTED,
        ("relational", "join"),
    ),
    # --- demoted in the round-13 FIFTH wave for the new srm_check
    # (r4 + r12 greens; bench flag intact) ---
    Query(
        "sql_frontend",
        q_sql_frontend,
        SQL_SQL_FRONTEND,
        ("relational", "sql", "tpch"),
        bench=True,
    ),
    # --- demoted in the round-13 SIXTH wave for the new
    # eval_win_rate (r4 + r12 greens) ---
    Query(
        "agg_argminmax",
        q_agg_argminmax,
        SQL_AGG_ARGMINMAX,
        ("relational", "agg"),
    ),
    # --- demoted in the round-13 SEVENTH wave for the new
    # metric_winsorized (r4 + r12 greens) ---
    Query(
        "udaf_grouped",
        q_udaf_grouped,
        SQL_UDAF_GROUPED,
        ("relational", "udf"),
    ),
    # --- demoted in the round-13 EIGHTH wave for the new
    # ngram_novelty (r4 + r12 greens) ---
    Query(
        "join_null_safe",
        q_join_null_safe,
        SQL_JOIN_NULL_SAFE,
        ("relational", "join"),
    ),
    # --- demoted in the round-13 NINTH wave for the new eval_brier
    # (r5 + r12 greens; bench flag intact) ---
    Query(
        "dedup_exact",
        q_dedup_exact,
        SQL_DEDUP_EXACT,
        ("llm", "dedup"),
        bench=True,
    ),
    # --- demoted in the round-13 TENTH wave for the new
    # eval_bradley_terry (r5 + r12 greens) ---
    Query(
        "dedup_embedding",
        q_dedup_embedding,
        SQL_DEDUP_EMBEDDING,
        ("llm", "dedup"),
    ),
    # --- demoted in the round-13 ELEVENTH wave for the new
    # sample_alloc_neyman (r5 + r12 greens; bench flag intact so the
    # iterative lane stays tracked round-over-round) ---
    Query(
        "dedup_components",
        q_dedup_components,
        SQL_DEDUP_COMPONENTS,
        ("llm", "dedup", "iterative"),
        bench=True,
    ),
]

# The full round-12 promotion cohort has now rotated back out (all
# twelve demoted one-for-one across the round-13 waves); this module
# keeps no graded entries.
QUERIES: list[Query] = []
