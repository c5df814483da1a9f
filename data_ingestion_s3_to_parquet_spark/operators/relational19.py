"""Round-13 graded-lane registrations: the grade-freshness promotion
cohort (VERDICT r12 #1), with the round's NEW operators prepended
wave by wave (never-graded-first — see the inline wave comments).

The promotion set is the twelve lanes whose driver rows were
measured OLDEST from CORRECTNESS_r01–r12 at the start of round 13:
the full r5-row cohort — ``corpus_prep``, ``decontaminate``,
``dedup_fuzzy``, ``dedup_ngram_jaccard``, ``emb_centroids``,
``map_in_pandas_tokens``, ``sample_split``, ``sim_topk`` — plus the
first four (alphabetical) of the 40-lane r6-row cohort:
``agg_hll_sketch``, ``agg_skew_salted``, ``ann_ivf_topk``,
``array_map_json``. Twelve lanes demote one-for-one from
relational18's graded list: the eleven round-12 single-green
first-timers plus ``window_analytic`` (the first of the twelve
r12-refreshed promotion veterans — all now LEAD the EXTRA lane via
relational18.EXTRA_QUERIES, bench flags intact). Round 14 demoted
this module's twelve-lane promotion cohort back out (its r13 rows
were the freshest veteran greens) in exchange for the next twelve
r6-row veterans, promoted via relational20; the cohort now registers
through EXTRA_QUERIES below and leads the EXTRA lane.

Eleven round-13 waves followed the rotation, each never-graded-first
with a one-for-one demotion of the freshest (r12-refreshed) veteran
(see the inline wave comments): bootstrap_ci_quantile,
perm_test_diff, stream_bootstrap, bootstrap_ci_diff, srm_check,
eval_win_rate, metric_winsorized, ngram_novelty, eval_brier,
eval_bradley_terry, sample_alloc_neyman — by wave 11 the entire r12
promotion cohort had rotated back out through
relational18.EXTRA_QUERIES.

Definitions stay with their families (trainprep, dedup, similarity,
multimodal, relational3/6/8/9/12/15/16, streaming.windows); only the
registration lives here — the relational17/relational18 pattern.

Reference parity note: the reference (/root/reference/src/main.rs,
208 lines) has no query surface at all; every lane here belongs to
the mandated Layer-B extension inventory (SURVEY §2B) or the
LLM-pipeline families.
"""

from __future__ import annotations

from ..plans.spec import Query
from .dedup import (
    SQL_DEDUP_FUZZY,
    SQL_DEDUP_NGRAM_JACCARD,
    SQL_NGRAM_NOVELTY,
    q_dedup_fuzzy,
    q_dedup_ngram_jaccard,
    q_ngram_novelty,
)
from .multimodal import SQL_ARRAY_MAP_JSON, q_array_map_json
from .relational3 import SQL_MAP_IN_PANDAS_TOKENS, q_map_in_pandas_tokens
from .relational6 import SQL_AGG_HLL_SKETCH, q_agg_hll_sketch
from .relational12 import SQL_EVAL_BRIER, q_eval_brier
from .relational15 import (
    SQL_BOOTSTRAP_CI_WINSORIZED,
    SQL_METRIC_WINSORIZED,
    q_bootstrap_ci_winsorized,
    q_metric_winsorized,
)
from .relational16 import (
    SQL_EVAL_BRADLEY_TERRY,
    SQL_EVAL_WIN_RATE,
    q_eval_bradley_terry,
    q_eval_win_rate,
)
from .relational9 import (
    SQL_BOOTSTRAP_CI_DIFF,
    SQL_PERM_TEST_DIFF,
    SQL_PERM_TEST_RATIO,
    SQL_SRM_CHECK,
    q_bootstrap_ci_diff,
    q_perm_test_diff,
    q_perm_test_ratio,
    q_srm_check,
)
from ..streaming.windows import SQL_STREAM_BOOTSTRAP, q_stream_bootstrap
from .relational8 import SQL_AGG_SKEW_SALTED, q_agg_skew_salted
from .similarity import (
    SQL_ANN_IVF_CHECK,
    SQL_SIM_TOPK,
    q_ann_ivf_check,
    q_sim_topk,
)
from .trainprep import (
    SQL_BOOTSTRAP_CI_QUANTILE,
    SQL_CORPUS_PREP,
    SQL_DECONTAMINATE,
    SQL_EMB_CENTROIDS,
    SQL_SAMPLE_ALLOC_NEYMAN,
    SQL_SAMPLE_SPLIT,
    q_bootstrap_ci_quantile,
    q_corpus_prep,
    q_decontaminate,
    q_emb_centroids,
    q_sample_alloc_neyman,
    q_sample_split,
)

QUERIES: list[Query] = [
    # (bootstrap_ci_quantile demoted to EXTRA_QUERIES below by the
    # round-14 first wave — metric_cuped took its graded slot)
    # (perm_test_diff demoted to EXTRA_QUERIES below by the round-14
    # second wave — rank_test_u took its graded slot)
    # (stream_bootstrap demoted to EXTRA_QUERIES below by the
    # round-14 third wave — fdr_bh took its graded slot)
    # (bootstrap_ci_diff demoted to EXTRA_QUERIES below by the
    # round-14 fourth wave — chisq_independence took its slot)
    # (srm_check demoted to EXTRA_QUERIES below by the round-14
    # fifth wave — power_mde took its graded slot)
    # (eval_win_rate demoted to EXTRA_QUERIES below by the round-14
    # sixth wave — stream_srm took its graded slot)
    # (metric_winsorized demoted to EXTRA_QUERIES below by the
    # round-14 seventh wave — eval_pass_at_k took its graded slot)
    # (ngram_novelty demoted to EXTRA_QUERIES below by the round-14
    # eighth wave — survival_km took its graded slot)
    # (eval_brier demoted to EXTRA_QUERIES below by the round-14
    # ninth wave — tokenizer_vocab_overlap took its graded slot)
    # (eval_bradley_terry demoted to EXTRA_QUERIES below by the
    # round-14 tenth wave — fdr_holm took its graded slot)
    # (sample_alloc_neyman demoted to EXTRA_QUERIES below by the
    # round-14 eleventh wave — sample_alloc_executed took its slot)
    # (perm_test_ratio demoted to EXTRA_QUERIES below by the
    # round-14 twelfth wave — metric_did took its graded slot)
    # (bootstrap_ci_winsorized demoted to EXTRA_QUERIES below by the
    # round-14 thirteenth wave — eval_lang_confusion took its slot;
    # the full r13 first-timer cohort has now rotated back out)
]

# The round-13 promotion cohort, demoted one-for-one by the round-14
# grade-freshness rotation (VERDICT r13 #1 — their r13 rows are the
# freshest veteran greens, so they trade their graded slots for the
# twelve measured-oldest r6-row lanes promoted via relational20).
# They LEAD the EXTRA lane (relational19 sits right after
# relational20 in registry._MODULES), bench flags intact.
EXTRA_QUERIES: list[Query] = [
    # round-14 wave demotees (single r13 green, freshest veterans)
    # lead even the cohort: wave 1 demoted bootstrap_ci_quantile for
    # metric_cuped.
    Query(
        "bootstrap_ci_quantile",
        q_bootstrap_ci_quantile,
        SQL_BOOTSTRAP_CI_QUANTILE,
        ("relational", "statistics", "sampling", "evaluation"),
    ),
    # wave 2 demoted perm_test_diff for rank_test_u; wave 3 demoted
    # stream_bootstrap for fdr_bh.
    Query(
        "perm_test_diff",
        q_perm_test_diff,
        SQL_PERM_TEST_DIFF,
        ("relational", "statistics", "evaluation", "sampling"),
    ),
    Query(
        "stream_bootstrap",
        q_stream_bootstrap,
        SQL_STREAM_BOOTSTRAP,
        ("streaming", "statistics", "sampling"),
    ),
    # wave 4 demoted bootstrap_ci_diff for chisq_independence;
    # wave 5 demoted srm_check for power_mde.
    Query(
        "bootstrap_ci_diff",
        q_bootstrap_ci_diff,
        SQL_BOOTSTRAP_CI_DIFF,
        ("relational", "statistics", "sampling", "evaluation"),
    ),
    Query(
        "srm_check",
        q_srm_check,
        SQL_SRM_CHECK,
        ("relational", "statistics", "quality", "monitoring"),
    ),
    # wave 6 demoted eval_win_rate for stream_srm; wave 7 demoted
    # metric_winsorized for eval_pass_at_k.
    Query(
        "eval_win_rate",
        q_eval_win_rate,
        SQL_EVAL_WIN_RATE,
        ("llm", "evaluation", "statistics", "sampling"),
    ),
    Query(
        "metric_winsorized",
        q_metric_winsorized,
        SQL_METRIC_WINSORIZED,
        ("relational", "statistics", "agg", "quality"),
    ),
    # wave 8 demoted ngram_novelty for survival_km; wave 9 demoted
    # eval_brier for tokenizer_vocab_overlap.
    Query(
        "ngram_novelty",
        q_ngram_novelty,
        SQL_NGRAM_NOVELTY,
        ("llm", "dedup", "text", "quality"),
    ),
    Query(
        "eval_brier",
        q_eval_brier,
        SQL_EVAL_BRIER,
        ("llm", "evaluation", "statistics", "quality"),
    ),
    # wave 10 demoted eval_bradley_terry for fdr_holm; wave 11
    # demoted sample_alloc_neyman for sample_alloc_executed.
    Query(
        "eval_bradley_terry",
        q_eval_bradley_terry,
        SQL_EVAL_BRADLEY_TERRY,
        ("llm", "evaluation", "statistics", "iterative"),
    ),
    Query(
        "sample_alloc_neyman",
        q_sample_alloc_neyman,
        SQL_SAMPLE_ALLOC_NEYMAN,
        ("relational", "statistics", "sampling", "pipeline"),
    ),
    # wave 12 demoted perm_test_ratio for metric_did; wave 13
    # demoted bootstrap_ci_winsorized for eval_lang_confusion.
    Query(
        "perm_test_ratio",
        q_perm_test_ratio,
        SQL_PERM_TEST_RATIO,
        ("relational", "statistics", "evaluation", "sampling"),
    ),
    Query(
        "bootstrap_ci_winsorized",
        q_bootstrap_ci_winsorized,
        SQL_BOOTSTRAP_CI_WINSORIZED,
        ("relational", "statistics", "sampling", "quality"),
    ),
    Query(
        "corpus_prep",
        q_corpus_prep,
        SQL_CORPUS_PREP,
        ("llm", "pipeline"),
        bench=True,
    ),
    Query(
        "decontaminate",
        q_decontaminate,
        SQL_DECONTAMINATE,
        ("llm", "dedup", "pipeline"),
        bench=True,
    ),
    Query(
        "dedup_fuzzy",
        q_dedup_fuzzy,
        SQL_DEDUP_FUZZY,
        ("llm", "dedup", "approx"),
        bench=True,
    ),
    Query(
        "dedup_ngram_jaccard",
        q_dedup_ngram_jaccard,
        SQL_DEDUP_NGRAM_JACCARD,
        ("llm", "dedup"),
        bench=True,
    ),
    Query(
        "emb_centroids",
        q_emb_centroids,
        SQL_EMB_CENTROIDS,
        ("llm", "similarity", "agg"),
        bench=True,
    ),
    Query(
        "map_in_pandas_tokens",
        q_map_in_pandas_tokens,
        SQL_MAP_IN_PANDAS_TOKENS,
        ("llm", "udf"),
    ),
    Query("sample_split", q_sample_split, SQL_SAMPLE_SPLIT, ("llm", "sampling")),
    Query("sim_topk", q_sim_topk, SQL_SIM_TOPK, ("llm", "similarity"), bench=True),
    Query(
        "agg_hll_sketch",
        q_agg_hll_sketch,
        SQL_AGG_HLL_SKETCH,
        ("relational", "agg", "approx"),
    ),
    Query(
        "agg_skew_salted",
        q_agg_skew_salted,
        SQL_AGG_SKEW_SALTED,
        ("relational", "agg", "skew"),
    ),
    Query(
        "ann_ivf_topk",
        q_ann_ivf_check,
        SQL_ANN_IVF_CHECK,
        ("llm", "similarity", "approx"),
    ),
    Query("array_map_json", q_array_map_json, SQL_ARRAY_MAP_JSON, ("relational", "json")),
]
