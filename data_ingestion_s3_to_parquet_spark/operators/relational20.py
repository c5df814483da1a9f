"""Round-14 graded-lane registrations: the grade-freshness promotion
cohort (VERDICT r13 #1), with the round's NEW operators prepended
wave by wave (never-graded-first — see the inline wave comments).

The promotion set is the twelve lanes whose driver rows were
measured OLDEST from CORRECTNESS_r01–r13 at the start of round 14:
the first twelve (alphabetical) of the 36-lane r6-row cohort —
``cdc_apply``, ``data_expectations``, ``doc_fingerprint``,
``fuzzy_match_strings``, ``higher_order_funcs``, ``interleave_mix``,
``join_bloom_prefilter``, ``json_variant``, ``knn_graph``,
``label_propagation``, ``lang_id``, ``lm_unigram_score``. Twelve
lanes demote one-for-one from relational19's graded list: the full
round-13 promotion cohort (corpus_prep … array_map_json — all
r13-refreshed, the freshest veteran rows) now LEADS the EXTRA lane
via relational19.EXTRA_QUERIES, bench flags intact. The remaining
r6-row cohort (multimodal_cols, pagerank, profile_table, …) is next
in line for round 15.

Definitions stay with their families (relational4/6/7/8/9, graph,
textstats); only the registration lives here — the
relational17/18/19 pattern.

Reference parity note: the reference (/root/reference/src/main.rs,
208 lines) has no query surface at all; every lane here belongs to
the mandated Layer-B extension inventory (SURVEY §2B) or the
LLM-pipeline families.
"""

from __future__ import annotations

from ..plans.spec import Query
from .graph import SQL_LABEL_PROPAGATION, q_label_propagation
from .relational4 import SQL_HIGHER_ORDER_FUNCS, q_higher_order_funcs
from .relational6 import (
    SQL_CDC_APPLY,
    SQL_JOIN_BLOOM_PREFILTER,
    SQL_JSON_VARIANT,
    q_cdc_apply,
    q_join_bloom_prefilter,
    q_json_variant,
)
from .relational7 import SQL_INTERLEAVE_MIX, q_interleave_mix
from .relational8 import (
    SQL_KNN_GRAPH,
    SQL_LM_UNIGRAM_SCORE,
    q_knn_graph,
    q_lm_unigram_score,
)
from .relational15 import (
    SQL_RANK_TEST_U,
    SQL_SURVIVAL_KM,
    SQL_SURVIVAL_LOGRANK,
    q_rank_test_u,
    q_survival_km,
    q_survival_logrank,
)
from .relational16 import SQL_EVAL_PASS_AT_K, q_eval_pass_at_k
from .relational9 import (
    SQL_CHISQ_INDEPENDENCE,
    SQL_DATA_EXPECTATIONS,
    SQL_FDR_BH,
    SQL_FDR_HOLM,
    SQL_METRIC_DID,
    SQL_POWER_MDE,
    SQL_SAMPLE_SIZE_CALC,
    SQL_FUZZY_MATCH_STRINGS,
    SQL_METRIC_CUPED,
    q_chisq_independence,
    q_data_expectations,
    q_fdr_bh,
    q_fdr_holm,
    q_metric_did,
    q_power_mde,
    q_sample_size_calc,
    q_fuzzy_match_strings,
    q_metric_cuped,
)
from ..streaming.windows import SQL_STREAM_SRM, q_stream_srm
from .trainprep import (
    SQL_SAMPLE_ALLOC_EXECUTED,
    q_sample_alloc_executed,
)
from .textstats import (
    SQL_DOC_FINGERPRINT,
    SQL_EVAL_LANG_CONFUSION,
    SQL_LANG_ID,
    SQL_TOKENIZER_VOCAB_OVERLAP,
    q_doc_fingerprint,
    q_eval_lang_confusion,
    q_lang_id,
    q_tokenizer_vocab_overlap,
)

QUERIES: list[Query] = [
    # --- round-14 FIRST wave (never-graded; bootstrap_ci_quantile —
    # the first of the thirteen r13 single-green first-timers —
    # demoted one-for-one to relational19's EXTRA) ---
    Query(
        "metric_cuped",
        q_metric_cuped,
        SQL_METRIC_CUPED,
        ("relational", "statistics", "evaluation", "pipeline"),
    ),
    # --- round-14 SECOND wave (never-graded; perm_test_diff — r13
    # single green — demoted one-for-one to relational19's EXTRA) ---
    Query(
        "rank_test_u",
        q_rank_test_u,
        SQL_RANK_TEST_U,
        ("relational", "statistics", "evaluation", "sampling"),
    ),
    # --- round-14 THIRD wave (never-graded; stream_bootstrap — r13
    # single green — demoted one-for-one to relational19's EXTRA) ---
    Query(
        "fdr_bh",
        q_fdr_bh,
        SQL_FDR_BH,
        ("relational", "statistics", "evaluation", "quality"),
    ),
    # --- round-14 FOURTH wave (never-graded; bootstrap_ci_diff —
    # r13 single green — demoted one-for-one to relational19's
    # EXTRA) ---
    Query(
        "chisq_independence",
        q_chisq_independence,
        SQL_CHISQ_INDEPENDENCE,
        ("relational", "statistics", "quality", "evaluation"),
    ),
    # --- round-14 FIFTH wave (never-graded; srm_check — r13 single
    # green — demoted one-for-one to relational19's EXTRA) ---
    Query(
        "power_mde",
        q_power_mde,
        SQL_POWER_MDE,
        ("relational", "statistics", "evaluation", "pipeline"),
    ),
    # --- round-14 SIXTH wave (never-graded; eval_win_rate — r13
    # single green — demoted one-for-one to relational19's EXTRA) ---
    Query(
        "stream_srm",
        q_stream_srm,
        SQL_STREAM_SRM,
        ("streaming", "statistics", "quality", "monitoring"),
    ),
    # --- round-14 SEVENTH wave (never-graded; metric_winsorized —
    # r13 single green — demoted one-for-one to relational19's
    # EXTRA) ---
    Query(
        "eval_pass_at_k",
        q_eval_pass_at_k,
        SQL_EVAL_PASS_AT_K,
        ("llm", "evaluation", "statistics", "sampling"),
    ),
    # --- round-14 EIGHTH wave (never-graded; ngram_novelty — r13
    # single green — demoted one-for-one to relational19's EXTRA) ---
    Query(
        "survival_km",
        q_survival_km,
        SQL_SURVIVAL_KM,
        ("relational", "statistics", "timeseries", "evaluation"),
    ),
    # --- round-14 NINTH wave (never-graded; eval_brier — r13 single
    # green — demoted one-for-one to relational19's EXTRA) ---
    Query(
        "tokenizer_vocab_overlap",
        q_tokenizer_vocab_overlap,
        SQL_TOKENIZER_VOCAB_OVERLAP,
        ("llm", "text", "evaluation", "pipeline"),
    ),
    # --- round-14 TENTH wave (never-graded; eval_bradley_terry —
    # r13 single green — demoted one-for-one to relational19's
    # EXTRA) ---
    Query(
        "fdr_holm",
        q_fdr_holm,
        SQL_FDR_HOLM,
        ("relational", "statistics", "evaluation", "quality"),
    ),
    # --- round-14 ELEVENTH wave (never-graded; sample_alloc_neyman
    # — r13 single green — demoted one-for-one to relational19's
    # EXTRA; the executed draw supersedes the planner's graded
    # slot) ---
    Query(
        "sample_alloc_executed",
        q_sample_alloc_executed,
        SQL_SAMPLE_ALLOC_EXECUTED,
        ("relational", "statistics", "sampling", "pipeline"),
    ),
    # --- round-14 TWELFTH wave (never-graded; perm_test_ratio —
    # r13 single green — demoted one-for-one to relational19's
    # EXTRA) ---
    Query(
        "metric_did",
        q_metric_did,
        SQL_METRIC_DID,
        ("relational", "statistics", "evaluation", "pipeline"),
    ),
    # --- round-14 THIRTEENTH wave (never-graded;
    # bootstrap_ci_winsorized — r13 single green, the LAST of the
    # thirteen r13 first-timers — demoted one-for-one to
    # relational19's EXTRA) ---
    Query(
        "eval_lang_confusion",
        q_eval_lang_confusion,
        SQL_EVAL_LANG_CONFUSION,
        ("llm", "evaluation", "text", "quality"),
    ),
    # --- the round-14 promotion cohort (oldest driver rows first:
    # the first twelve of the r6 cohort, alphabetical) ---
    Query(
        "cdc_apply",
        q_cdc_apply,
        SQL_CDC_APPLY,
        ("relational", "window", "pipeline"),
    ),
    Query(
        "data_expectations",
        q_data_expectations,
        SQL_DATA_EXPECTATIONS,
        ("relational", "quality", "validation"),
    ),
    Query(
        "doc_fingerprint",
        q_doc_fingerprint,
        SQL_DOC_FINGERPRINT,
        ("llm", "text"),
    ),
    Query(
        "fuzzy_match_strings",
        q_fuzzy_match_strings,
        SQL_FUZZY_MATCH_STRINGS,
        ("llm", "text", "linkage"),
    ),
    Query(
        "higher_order_funcs",
        q_higher_order_funcs,
        SQL_HIGHER_ORDER_FUNCS,
        ("relational", "array"),
    ),
    Query(
        "interleave_mix",
        q_interleave_mix,
        SQL_INTERLEAVE_MIX,
        ("llm", "sampling", "window"),
    ),
    Query(
        "join_bloom_prefilter",
        q_join_bloom_prefilter,
        SQL_JOIN_BLOOM_PREFILTER,
        ("relational", "join", "approx"),
    ),
    Query("json_variant", q_json_variant, SQL_JSON_VARIANT, ("relational", "json")),
    Query(
        "knn_graph",
        q_knn_graph,
        SQL_KNN_GRAPH,
        ("llm", "similarity", "window"),
    ),
    Query(
        "label_propagation",
        q_label_propagation,
        SQL_LABEL_PROPAGATION,
        ("llm", "graph", "iterative"),
    ),
    Query("lang_id", q_lang_id, SQL_LANG_ID, ("llm", "text")),
    Query(
        "lm_unigram_score",
        q_lm_unigram_score,
        SQL_LM_UNIGRAM_SCORE,
        ("llm", "text", "quality"),
        bench=True,  # broadcast-vocab scoring over the token stream
    ),
]

# The round-15 never-graded pool: full-evidence lanes built at the
# end of round 14, AFTER the graded 50 was already committed to the
# thirteen r14 waves + the promotion cohort (every graded slot needs
# its fresh row this round). They LEAD the EXTRA lane so the next
# rotation promotes them first (never-graded-first).
EXTRA_QUERIES: list[Query] = [
    Query(
        "sample_size_calc",
        q_sample_size_calc,
        SQL_SAMPLE_SIZE_CALC,
        ("relational", "statistics", "evaluation", "pipeline"),
    ),
    Query(
        "survival_logrank",
        q_survival_logrank,
        SQL_SURVIVAL_LOGRANK,
        ("relational", "statistics", "timeseries", "evaluation"),
    ),
]
