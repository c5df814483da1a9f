"""Round-11 graded-lane registrations: the two NEW operators
(VERDICT r10 #2/#3) plus the grade-freshness promotion cohort.

- ``graph_modularity``   Newman modularity of ``label_propagation``'s
                         communities over the undirected k-NN graph
                         (operators/graph.py) — the quality scalar
                         for the detected near-dup community
                         structure, completing the graph-health
                         family next to ``graph_assortativity``.
- ``text_readability``   Flesch reading ease with the vowel-group
                         syllable proxy (operators/textstats.py) —
                         the classic readability signal the
                         text-quality family lacked.

Both are never-graded, so they register FIRST (the
never-graded-first rule); definitions live with their families, the
registration lives here — the relational7 pattern.

After them: the round-11 grade-freshness rotation (VERDICT r10 #1).
The promotion set is the twelve lanes whose driver rows were
measured OLDEST from CORRECTNESS_r01–r10 at the start of round 11 —
seven last graded in ROUND 3 (datetime_funcs, seq_pack,
embedding_quantize, quality_gopher, pii_redact, media_frame_sample,
agg_approx_quantile) and five last graded in ROUND 4 (agg_group,
join_inner, join_broadcast, join_range, join_asof). VERDICT r10
nominated the relational6 cohort, but those have r6 rows; the
measured r3/r4 cohort is strictly staler, so it rotates first (the
relational6 seven and the remaining r4 veterans are next in line for
round 12). Fourteen round-10 single-green first-timers demote
one-for-one (nine from relational14, five from relational15 — listed
there); ``eval_mrr`` stays graded because round 11 extends its
output contract with the recall@k ladder, which needs a FRESH row.

Round-12 update: the grade-freshness rotation (VERDICT r11 #1) kept
only four of this module's lanes graded (join_inner / join_broadcast
/ join_range / join_asof — r11 rows, plus earlier greens); the seven
round-11 first-timers and the other eight promotion veterans demoted
to this module's EXTRA_QUERIES, which leads the EXTRA lane (the
module registers directly after relational18). The round-12 SECOND
wave then demoted join_broadcast too, one-for-one for the new
text_yule_k, and the THIRD wave demoted join_asof for
len_lognormal_fit — leaving join_inner / join_range graded here.

Reference parity note: the reference (/root/reference/src/main.rs,
208 lines) has no query surface at all; every lane here belongs to
the mandated Layer-B extension inventory (SURVEY §2B) or the
LLM-pipeline families.
"""

from __future__ import annotations

from ..plans.spec import Query
from .graph import (
    SQL_GRAPH_CLUSTERING_COEFF,
    SQL_GRAPH_MODULARITY,
    q_graph_clustering_coeff,
    q_graph_modularity,
)
from .multimodal import SQL_MEDIA_FRAME_SAMPLE, q_media_frame_sample
from .relational import (
    SQL_AGG_GROUP,
    SQL_JOIN_ASOF,
    SQL_JOIN_BROADCAST,
    SQL_JOIN_INNER,
    SQL_JOIN_RANGE,
    q_agg_group,
    q_join_asof,
    q_join_broadcast,
    q_join_inner,
    q_join_range,
)
from .relational2 import SQL_AGG_APPROX_QUANTILE, q_agg_approx_quantile
from .relational14 import SQL_EVENT_BURSTINESS, q_event_burstiness
from .relational16 import SQL_EVAL_KRIPP_ALPHA, q_eval_kripp_alpha
from .relational3 import SQL_DATETIME_FUNCS, q_datetime_funcs
from .textstats import (
    SQL_HEAPS_FIT,
    SQL_PII_REDACT,
    SQL_QUALITY_GOPHER,
    SQL_TEXT_READABILITY,
    SQL_ZIPF_FIT,
    q_heaps_fit,
    q_pii_redact,
    q_quality_gopher,
    q_text_readability,
    q_zipf_fit,
)
from .trainprep import (
    SQL_EMBEDDING_QUANTIZE,
    SQL_SEQ_PACK,
    q_embedding_quantize,
    q_seq_pack,
)

QUERIES: list[Query] = [
    # Round 12 kept four of the r11 promotion cohort graded (their
    # r11 rows are fresh); the other fifteen r11 entries — the seven
    # round-11 first-timers and eight refreshed veterans — demoted
    # to EXTRA_QUERIES below, one-for-one against relational18's
    # three new operators + twelve-lane promotion cohort
    # (VERDICT r11 #1). Round 13's waves 12-13 demoted join_inner
    # (for the new perm_test_ratio) and join_range (for the new
    # bootstrap_ci_winsorized) — r11 + r12 greens, bench flags
    # intact; they lead this module's EXTRA lane below.
]

# The round-12 demotees: the seven round-11 single-green first-timers
# LEAD (so a larger harness budget grades them again first), then the
# eight r11-refreshed multi-green veterans. This module sits directly
# after relational18 in the registry's module order, so these lead
# the EXTRA lane.
EXTRA_QUERIES: list[Query] = [
    Query("join_inner", q_join_inner, SQL_JOIN_INNER, ("relational", "join"), bench=True),
    Query("join_range", q_join_range, SQL_JOIN_RANGE, ("relational", "join"), bench=True),
    Query(
        "graph_modularity",
        q_graph_modularity,
        SQL_GRAPH_MODULARITY,
        ("llm", "graph", "dedup", "evaluation"),
    ),
    Query(
        "text_readability",
        q_text_readability,
        SQL_TEXT_READABILITY,
        ("llm", "text", "quality"),
    ),
    Query(
        "graph_clustering_coeff",
        q_graph_clustering_coeff,
        SQL_GRAPH_CLUSTERING_COEFF,
        ("llm", "graph", "evaluation"),
    ),
    Query(
        "zipf_fit",
        q_zipf_fit,
        SQL_ZIPF_FIT,
        ("llm", "text", "statistics", "quality"),
    ),
    Query(
        "heaps_fit",
        q_heaps_fit,
        SQL_HEAPS_FIT,
        ("llm", "text", "statistics", "quality"),
    ),
    Query(
        "eval_kripp_alpha",
        q_eval_kripp_alpha,
        SQL_EVAL_KRIPP_ALPHA,
        ("llm", "evaluation", "statistics", "quality"),
    ),
    Query(
        "event_burstiness",
        q_event_burstiness,
        SQL_EVENT_BURSTINESS,
        ("relational", "timeseries", "monitoring", "statistics"),
    ),
    # --- the r11-refreshed veterans ---
    Query(
        "datetime_funcs",
        q_datetime_funcs,
        SQL_DATETIME_FUNCS,
        ("relational",),
    ),
    Query("seq_pack", q_seq_pack, SQL_SEQ_PACK, ("llm", "pipeline", "window")),
    Query(
        "embedding_quantize",
        q_embedding_quantize,
        SQL_EMBEDDING_QUANTIZE,
        ("llm", "similarity", "multimodal"),
    ),
    Query("quality_gopher", q_quality_gopher, SQL_QUALITY_GOPHER, ("llm", "text")),
    Query("pii_redact", q_pii_redact, SQL_PII_REDACT, ("llm", "text")),
    Query(
        "media_frame_sample",
        q_media_frame_sample,
        SQL_MEDIA_FRAME_SAMPLE,
        ("llm", "multimodal"),
    ),
    Query(
        "agg_approx_quantile",
        q_agg_approx_quantile,
        SQL_AGG_APPROX_QUANTILE,
        ("relational", "agg", "approx"),
    ),
    Query("agg_group", q_agg_group, SQL_AGG_GROUP, ("relational", "agg"), bench=True),
    # round-12 SECOND wave: join_broadcast (r11 + r4 greens) demoted
    # one-for-one for the new text_yule_k (relational18)
    Query("join_broadcast", q_join_broadcast, SQL_JOIN_BROADCAST, ("relational", "join")),
    # round-12 THIRD wave: join_asof (r11 + r4 greens) demoted
    # one-for-one for the new len_lognormal_fit (relational18)
    Query("join_asof", q_join_asof, SQL_JOIN_ASOF, ("relational", "join", "custom")),
]
