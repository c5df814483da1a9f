"""Physical-plan-shape regression tests.

Correctness tests prove the answers are right; these prove the PLANS
stay right — the properties that make the operators survive a 100×
scale-up (pushdown reaching the scan, broadcasts where intended and
NOT where explode fan-out breaks Catalyst's size estimate, partial
aggregation, top-k as TakeOrderedAndProject). A refactor that silently
regresses any of these still passes the oracle at sf0.01; this file is
what catches it.
"""

from __future__ import annotations

import contextlib
import io

from tests.conftest import SF_SMOKE


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_project_filter_pushes_down_to_scan(spark):
    from data_ingestion_s3_to_parquet_spark.operators.relational import (
        q_project_filter,
    )

    plan = plan_of(q_project_filter(spark, SF_SMOKE))
    assert "PushedFilters: [" in plan
    # at least one real pushed predicate, not the empty list
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert pushed.strip(), plan
    # column pruning: the scan schema must not include every lineitem column
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "l_comment" not in read_schema


def test_join_broadcast_is_broadcast(spark):
    from data_ingestion_s3_to_parquet_spark.operators.relational import (
        q_join_broadcast,
    )

    plan = plan_of(q_join_broadcast(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan


def test_exploded_self_joins_never_broadcast(spark):
    # Catalyst carries the pre-Generate size stat through explode, so
    # without the shuffle_hash pin it would broadcast the exploded
    # shingle-prefix side (measured: 8M-row broadcast attempt at 100k
    # docs -> driver OOM at scale). The pin must survive refactors.
    # The later verification joins (tiny candidate set x doc arrays)
    # SHOULD broadcast — only the shingle-keyed join is checked.
    import re

    from data_ingestion_s3_to_parquet_spark.operators.dedup import (
        q_dedup_ngram_jaccard,
    )

    plan = plan_of(q_dedup_ngram_jaccard(spark, SF_SMOKE))
    assert "ShuffledHashJoin" in plan
    # no BroadcastHashJoin may be keyed on the shingle hash column `gh`
    for m in re.finditer(r"\(\d+\) BroadcastHashJoin[^(]*", plan):
        assert "[gh#" not in m.group(0), m.group(0)


def test_sim_topk_is_take_ordered_not_global_sort(spark):
    from data_ingestion_s3_to_parquet_spark.operators.similarity import q_sim_topk

    plan = plan_of(q_sim_topk(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_agg_group_has_partial_aggregation(spark):
    # map-side combine: two HashAggregate nodes (partial + final) around
    # one exchange, so the shuffle moves pre-aggregated rows
    from data_ingestion_s3_to_parquet_spark.operators.relational import q_agg_group

    plan = plan_of(q_agg_group(spark, SF_SMOKE))
    assert plan.count("HashAggregate") >= 2


def test_flagship_broadcasts_small_dims(spark):
    # nation/customer side of the revenue rollup must not shuffle the
    # fact table against a tiny dim via sort-merge
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.entry(spark))
    assert "BroadcastHashJoin" in plan


def test_topk_per_group_uses_window_group_limit(spark):
    # rnk <= k must become WindowGroupLimit (per-group k-row heap), not
    # a full per-group sort followed by a filter
    from data_ingestion_s3_to_parquet_spark.operators.relational import (
        q_window_rank,
    )

    plan = plan_of(q_window_rank(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan


def test_jaccard_scan_filter_has_no_inlined_shingling(spark):
    # InferFiltersFromGenerate + pushdown used to inline the whole
    # shingle expression (with per-element re-split of text) into the
    # parquet scan filter — measured 6.5s -> 1.2s at sf0.1 when
    # excluded. session.RUNTIME_CONFS pins the exclusion; this guards it.
    from data_ingestion_s3_to_parquet_spark.operators.dedup import (
        q_dedup_ngram_jaccard,
    )

    plan = plan_of(q_dedup_ngram_jaccard(spark, SF_SMOKE))
    scan_region = plan.split("Generate")[0]
    assert "array_distinct(transform" not in scan_region


def test_quality_gopher_scans_documents_once(spark):
    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_quality_gopher,
    )

    plan = plan_of(q_quality_gopher(spark, SF_SMOKE))
    # the bigram ratio is carried through the aggregation keys instead of
    # joined back, so exactly one parquet scan (and no join) may appear
    # (formatted output names each node once in the tree and once in the
    # detail section — count the numbered detail headers)
    import re

    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan
    assert "Join" not in plan, plan


def test_topk_windows_get_group_limit_pushdown(spark):
    # both per-group top-k operators must plan a WindowGroupLimit so the
    # k-filter runs per-partition below the exchange — without it every
    # task ships its whole stratum/doc group through the shuffle
    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_tfidf_top_terms,
    )
    from data_ingestion_s3_to_parquet_spark.operators.trainprep import (
        q_sample_stratified,
    )

    assert "WindowGroupLimit" in plan_of(q_sample_stratified(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan_of(q_tfidf_top_terms(spark, SF_SMOKE))


def test_dedup_shuffle_keys_are_fingerprints_not_text(spark):
    # exact-dedup shuffles must key on sha2(text) — partitioning on the
    # document body makes every exchange move/compare full documents
    # (VERDICT r2 "what's wrong" #1). corpus_prep additionally projects
    # text away entirely before its only shuffle.
    from data_ingestion_s3_to_parquet_spark.operators.dedup import q_dedup_exact
    from data_ingestion_s3_to_parquet_spark.operators.trainprep import q_corpus_prep

    import re

    plan = plan_of(q_dedup_exact(spark, SF_SMOKE))
    assert "hashpartitioning(text" not in plan, plan
    assert "hashpartitioning(fp" in plan, plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1, plan
    # partial + final aggregate around the exchange: the map-side
    # combine is the hot-key defense for massively-duplicated
    # documents (Sort/ObjectHash variants appear because first()/
    # min_by(struct) buffers are not hash-aggregable)
    assert len(re.findall(r"(Hash|Sort|ObjectHash)Aggregate", plan)) >= 2, plan

    plan = plan_of(q_corpus_prep(spark, SF_SMOKE))
    assert "hashpartitioning(text" not in plan, plan
    assert "hashpartitioning(fp" in plan, plan
    assert len(re.findall(r"(Hash|Sort|ObjectHash)Aggregate", plan)) >= 2, plan
    # the document body must not cross the exchange at all: the
    # formatted node prints "(N) Exchange\nInput [...]: [cols...]"
    exch_input = plan.split(") Exchange", 1)[1].splitlines()[1]
    assert exch_input.startswith("Input"), plan
    assert "text#" not in exch_input, exch_input


def test_bloom_probe_runs_in_fact_scan_stage(spark):
    # the bloom membership test must filter the orders scan BEFORE the
    # semi-join's exchange — if it sits above the join it prunes nothing
    from data_ingestion_s3_to_parquet_spark.operators.relational6 import (
        q_join_bloom_prefilter,
    )

    import re

    plan = plan_of(q_join_bloom_prefilter(spark, SF_SMOKE))
    probe_nodes = [
        int(m.group(1))
        for m in re.finditer(r"\((\d+)\) Filter\n(?:.*\n)*?Condition :.*shiftleft", plan)
    ]
    join_nodes = [int(m.group(1)) for m in re.finditer(r"\((\d+)\) \w*Join", plan)]
    assert probe_nodes and join_nodes, plan
    # the probe Filter must execute below (= smaller node id than) the join
    assert min(probe_nodes) < min(join_nodes), plan


def test_udtf_runs_arrow_batched(spark):
    # the table function must evaluate through the Arrow UDTF node
    # (one vectorized python pass), not row-pickling BatchEvalPython
    from data_ingestion_s3_to_parquet_spark.operators.relational6 import (
        q_udtf_lateral,
    )

    plan = plan_of(q_udtf_lateral(spark, SF_SMOKE))
    assert "ArrowEvalPythonUDTF" in plan, plan


def test_cdc_apply_gets_window_group_limit(spark):
    # rn = 1 must push a per-key one-row limit below the exchange
    from data_ingestion_s3_to_parquet_spark.operators.relational6 import q_cdc_apply

    assert "WindowGroupLimit" in plan_of(q_cdc_apply(spark, SF_SMOKE))


def test_sample_weighted_is_take_ordered(spark):
    from data_ingestion_s3_to_parquet_spark.operators.relational6 import (
        q_sample_weighted,
    )

    assert "TakeOrderedAndProject" in plan_of(q_sample_weighted(spark, SF_SMOKE))


def test_seq_pack_window_is_shard_partitioned(spark):
    from data_ingestion_s3_to_parquet_spark.operators.trainprep import q_seq_pack

    plan = plan_of(q_seq_pack(spark, SF_SMOKE))
    # the running-offset window must partition by shard — a global-order
    # window (single partition) would serialize the corpus at scale
    assert "Window" in plan
    assert "hashpartitioning(shard" in plan, plan


def test_knn_graph_topk_uses_window_group_limit(spark):
    # the rank <= k filter must execute as WindowGroupLimit (k-row
    # per-group state) — a full per-source sort of the block pairs
    # would make per-task state O(block), not O(k)
    from data_ingestion_s3_to_parquet_spark.operators.relational8 import (
        q_knn_graph,
    )

    plan = plan_of(q_knn_graph(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan


def test_unpivot_is_expand_with_pushed_filter_and_no_shuffle(spark):
    # the melt must stay map-side: Expand above a pruned scan with the
    # row filter pushed down, and zero exchanges anywhere
    from data_ingestion_s3_to_parquet_spark.operators.relational8 import (
        q_unpivot_stack,
    )

    plan = plan_of(q_unpivot_stack(spark, SF_SMOKE))
    assert "Expand" in plan
    assert "EqualTo(l_linenumber,1)" in plan
    assert "Exchange" not in plan


def test_anomaly_zscore_broadcasts_the_stats_side(spark):
    # the 6-row per-type stats frame must broadcast back onto the
    # events scan — a shuffle join here would move the fact table twice
    from data_ingestion_s3_to_parquet_spark.operators.relational8 import (
        q_anomaly_zscore,
    )

    plan = plan_of(q_anomaly_zscore(spark, SF_SMOKE))
    assert "BroadcastExchange" in plan


def test_range_window_pays_exactly_one_shuffle(spark):
    # the trailing-hour RANGE frame needs one hash exchange on user_id
    # and nothing else
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational8 import (
        q_window_range_interval,
    )

    plan = plan_of(q_window_range_interval(spark, SF_SMOKE))
    # formatted explain lists exchanges as numbered "(n) Exchange" nodes
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_profile_table_is_one_expanded_aggregation(spark):
    # the multi-distinct profile must compile to Expand (one scan),
    # not one aggregation per column
    from data_ingestion_s3_to_parquet_spark.operators.relational8 import (
        q_profile_table,
    )

    import re

    plan = plan_of(q_profile_table(spark, SF_SMOKE))
    assert "Expand" in plan
    # exactly one numbered scan NODE (details sections repeat the text)
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_graph_triangles_joins_never_broadcast(spark):
    # both triangle-enumeration joins run over the corpus-proportional
    # edge table; the shuffle_hash pins must survive refactors (a
    # broadcast edge table OOMs the driver at scale)
    from data_ingestion_s3_to_parquet_spark.operators.graph import (
        q_graph_triangles,
    )

    plan = plan_of(q_graph_triangles(spark, SF_SMOKE))
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_vocab_coverage_broadcasts_only_the_bounded_vocab(spark):
    # the top-N vocab is bounded by construction (the one provably
    # safe broadcast); the coverage join must use it, and the vocab
    # election must be a TakeOrderedAndProject, not a global sort
    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_vocab_coverage,
    )

    plan = plan_of(q_vocab_coverage(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_freq_items_broadcasts_topk_and_total_only(spark):
    # two broadcasts: the 20-row top-k frame and the 1-row total; the
    # merged sketch side arrives per-partition-bounded, the exact lane
    # stays a combinable count
    import re

    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_freq_items_topk,
    )

    plan = plan_of(q_freq_items_topk(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert "TakeOrderedAndProject" in plan


def test_dedup_soft_join_is_shuffle_hash_on_fingerprints(spark):
    # the counts side is corpus-proportional (one row per distinct
    # text): must never broadcast; the shuffle keys are sha2
    # fingerprints, never the document body
    from data_ingestion_s3_to_parquet_spark.operators.dedup import (
        q_dedup_soft,
    )

    plan = plan_of(q_dedup_soft(spark, SF_SMOKE))
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_stream_join_interval_batch_twin_never_broadcasts(spark):
    # both attribution sides are event-stream-proportional; the batch
    # grading twin must keep the shuffle_hash pin (the streaming lane
    # has no broadcast path at all)
    from data_ingestion_s3_to_parquet_spark.streaming.windows import (
        q_stream_join_interval,
    )

    plan = plan_of(q_stream_join_interval(spark, SF_SMOKE))
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan


def test_kmeans_assignment_is_map_only_arrow(spark):
    # the returned frame is the final assignment pass: one Arrow
    # (mapInPandas) stage over the scan with NO exchange — the model
    # travels in the closure, nothing data-sized shuffles
    import re

    from data_ingestion_s3_to_parquet_spark.operators.similarity import (
        q_kmeans_embeddings,
    )

    plan = plan_of(q_kmeans_embeddings(spark, SF_SMOKE))
    assert "MapInPandas" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 0


def test_markov_totals_are_a_bounded_window_not_a_join(spark):
    # per-source totals come from a window sum over the 25-row pair
    # frame (the chi2 marginal trick) — no join anywhere, and exactly
    # three exchanges (per-user window, pair count, bounded-frame
    # window), no recomputed subtree
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_markov_transitions,
    )

    plan = plan_of(q_markov_transitions(spark, SF_SMOKE))
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 3


def test_robust_stats_joins_stay_broadcast(spark):
    # both join sides (per-lang medians / MADs) are group-cardinality
    # frames — broadcast; the rank windows are the only big shuffles
    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_robust_stats,
    )

    plan = plan_of(q_robust_stats(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert ") Window" in plan


def test_shard_manifest_is_one_combinable_aggregation(spark):
    # no joins anywhere; partial+final HashAggregate around exactly one
    # shuffle on the 16-row shard key space
    import re

    from data_ingestion_s3_to_parquet_spark.operators.trainprep import (
        q_shard_manifest,
    )

    plan = plan_of(q_shard_manifest(spark, SF_SMOKE))
    assert "Join" not in plan
    assert plan.count(") HashAggregate") >= 2
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_batch_by_length_reuses_the_bucket_partitioning(spark):
    # ONE shuffle total: the window partitions by bucket, and the
    # (bucket, batch_id) groupBy is satisfied by that same hash
    # partitioning (subset-of-keys clustering) — a second exchange
    # here would be the scale regression
    import re

    from data_ingestion_s3_to_parquet_spark.operators.trainprep import (
        q_batch_by_length,
    )

    plan = plan_of(q_batch_by_length(spark, SF_SMOKE))
    assert ") Window" in plan
    assert plan.count(") HashAggregate") >= 2
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_url_canonicalize_pays_one_canonical_key_shuffle(spark):
    # map-only regexp algebra plus both windows (dup count + keeper
    # election) sharing a single url_canon exchange; no joins
    import re

    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_url_canonicalize,
    )

    plan = plan_of(q_url_canonicalize(spark, SF_SMOKE))
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_cms_counts_broadcasts_sketch_and_total_only(spark):
    # the Arrow sketch pass feeds a constant-size (≤1024-cell) merge;
    # exactly two broadcasts (merged sketch, 1-row total); the exact
    # top-k lane stays TakeOrderedAndProject
    import re

    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_cms_counts,
    )

    plan = plan_of(q_cms_counts(spark, SF_SMOKE))
    assert "MapInPandas" in plan
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert "TakeOrderedAndProject" in plan


def test_pmi_joins_are_all_broadcast_after_the_topk_cut(spark):
    # the pair frame is cut to a bounded top-k BEFORE the unigram
    # joins, so every join side is constant-sized — nothing may
    # sort-merge or shuffle-hash a vocabulary-sized side
    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_pmi_cooccur,
    )

    plan = plan_of(q_pmi_cooccur(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_session_paths_broadcasts_only_the_total(spark):
    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_session_paths,
    )

    plan = plan_of(q_session_paths(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert ") Window" in plan


def test_chi2_is_cell_frame_algebra_after_one_count(spark):
    # marginal windows run over the bounded cell frame; the one
    # combinable count is the only data-sized stage, and no joins
    # appear anywhere
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_chi2_contingency,
    )

    plan = plan_of(q_chi2_contingency(spark, SF_SMOKE))
    assert "Join" not in plan
    assert plan.count(") HashAggregate") >= 2
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_ann_two_stage_broadcasts_the_shortlist(spark):
    # the PQ code joins keep their shuffle_hash pins (corpus-sized
    # sides); the bounded shortlist side broadcasts into the re-rank
    from data_ingestion_s3_to_parquet_spark.operators.similarity import (
        q_ann_two_stage,
    )

    plan = plan_of(q_ann_two_stage(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "ShuffledHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_entropy_score_pays_two_keyed_shuffles(spark):
    # (doc, word) count + doc window — both on high-cardinality doc
    # keys; no joins, no broadcast of anything data-sized
    import re

    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_entropy_score,
    )

    plan = plan_of(q_entropy_score(spark, SF_SMOKE))
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2


def test_content_chunks_shuffles_on_docs_and_fingerprints_only(spark):
    # two exchanges (doc-keyed boundary window, fingerprint-keyed copy
    # count); document text never becomes a shuffle key and no joins
    # appear
    import re

    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_content_chunks,
    )

    plan = plan_of(q_content_chunks(spark, SF_SMOKE))
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2


def test_word_filter_is_map_only(spark):
    # the C4 gate must be scan-bound: zero exchanges of any kind
    import re

    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_word_filter,
    )

    plan = plan_of(q_word_filter(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) (?:Broadcast)?Exchange", plan)) == 0


def test_dsir_weights_broadcasts_only_bounded_frames(spark):
    # the λ table (64 buckets) and the 1-row total are the only
    # broadcast sides — both bounded by construction at any corpus
    # size; the token-stream stages stay shuffle-based. Two
    # BroadcastExchange nodes exactly: more means a corpus-sized side
    # slipped in, fewer means the bounded join degraded to a shuffle.
    import re

    from data_ingestion_s3_to_parquet_spark.operators.trainprep import (
        q_dsir_weights,
    )

    plan = plan_of(q_dsir_weights(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    # per-doc scoring ends in a partial+final aggregation, not a sort
    assert "HashAggregate" in plan


def test_token_budget_select_prefix_sum_is_bucket_parallel(spark):
    # the corpus-sized running sum must be partitioned by the bounded
    # score bucket (parallel tasks), NOT a single global-order window;
    # the only unpartitioned window is over the ≤ 11-row carry frame.
    # Detect it structurally: every Window node that sorts by the
    # per-doc (micro_score, doc_id) order must carry a partition key.
    import re

    from data_ingestion_s3_to_parquet_spark.operators.trainprep import (
        q_token_budget_select,
    )

    plan = plan_of(q_token_budget_select(spark, SF_SMOKE))
    windows = re.findall(r"Arguments: \[.*?windowspecdefinition\(.*?\)", plan)
    doc_order = [w for w in windows if "doc_id" in w]
    assert doc_order, "per-doc running-sum window missing from the plan"
    assert all("bucket" in w for w in doc_order)
    # carry + total are broadcast (bounded frames)
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2


def test_corr_pearson_is_one_combinable_aggregation(spark):
    # six sufficient statistics in ONE partial+final aggregation — a
    # single exchange on the group key, no join, no window, no second
    # scan; the statistic itself is driver-free column algebra
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_corr_pearson,
    )

    plan = plan_of(q_corr_pearson(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan and "Window" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_scale_probe_inflation_preserves_the_join_graph(spark):
    # the probe's evidence is only valid if K-x inflation preserves
    # join semantics: every join key offset by the same stride on both
    # sides → the scaled join yields exactly K x the base join rows
    # (no cross-copy pairs), facts inflate exactly K x, and the fixed
    # dimensions stay 1 x. Built into the probe's /tmp cache (keyed by
    # base dir + factor), so re-runs are cheap.
    import sys

    sys.path.insert(0, ".")
    from tools.scale_probe import _build_scaled

    from data_ingestion_s3_to_parquet_spark.sources.catalog import load_table

    base = "/root/testdata/sf0.001"
    k = 3
    d = _build_scaled(spark, base, k)
    li_b = load_table(spark, base, "lineitem")
    od_b = load_table(spark, base, "orders")
    li_s = load_table(spark, d, "lineitem")
    od_s = load_table(spark, d, "orders")
    n_base = li_b.join(od_b, li_b.l_orderkey == od_b.o_orderkey).count()
    n_scaled = li_s.join(od_s, li_s.l_orderkey == od_s.o_orderkey).count()
    assert n_scaled == k * n_base
    assert li_s.count() == k * li_b.count()
    assert load_table(spark, d, "nation").count() == load_table(
        spark, base, "nation"
    ).count()


def test_doc_winnow_is_one_doc_keyed_window_pass(spark):
    # the packed-argmin trick collapses winnowing into a single
    # window pass: one doc-keyed exchange (the distinct reuses the
    # doc_id clustering — its keys are a superset), no joins, no UDF
    from data_ingestion_s3_to_parquet_spark.operators.relational10 import (
        q_doc_winnow,
    )

    plan = plan_of(q_doc_winnow(spark, SF_SMOKE))
    assert "Join" not in plan
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_inverted_index_never_broadcasts_vocabulary(spark):
    # all three aggregates and both joins are term-keyed; vocabulary
    # grows with the corpus, so no side may be broadcast-elected
    from data_ingestion_s3_to_parquet_spark.operators.relational10 import (
        q_inverted_index,
    )

    plan = plan_of(q_inverted_index(spark, SF_SMOKE))
    assert "Broadcast" not in plan
    assert "ShuffledHashJoin" in plan


def test_changepoint_cusum_shares_one_customer_exchange(spark):
    # prefix-sum window, whole-partition totals, and the argmax rank
    # all partition on o_custkey: one exchange, zero joins
    from data_ingestion_s3_to_parquet_spark.operators.relational10 import (
        q_changepoint_cusum,
    )

    plan = plan_of(q_changepoint_cusum(spark, SF_SMOKE))
    assert "Join" not in plan
    import re

    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1


def test_link_predict_never_broadcasts_graph_sides(spark):
    # adjacency, degree, and wedge-count frames all grow with the
    # corpus: every join must stay shuffle-side, and the only global
    # ordering is the bounded top-100 TakeOrdered
    from data_ingestion_s3_to_parquet_spark.operators.graph import (
        q_link_predict,
    )

    plan = plan_of(q_link_predict(spark, SF_SMOKE))
    assert "BroadcastExchange" not in plan
    assert "TakeOrderedAndProject" in plan


def test_winnow_overlap_never_broadcasts_fingerprint_sides(spark):
    # fingerprint sets, df table, and totals all grow with the corpus
    from data_ingestion_s3_to_parquet_spark.operators.relational10 import (
        q_winnow_overlap,
    )

    plan = plan_of(q_winnow_overlap(spark, SF_SMOKE))
    assert "BroadcastExchange" not in plan


def test_rank_bm25_broadcasts_are_bounded_and_topk_is_take_ordered(spark):
    # the df table (≤ |query terms| rows) and the one-row corpus stats
    # are the ONLY broadcasts; the doc-length join is pinned
    # shuffle_hash (both sides corpus-proportional); the final top-k
    # is TakeOrderedAndProject, never a single-task global sort
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational10 import (
        q_rank_bm25,
    )

    plan = plan_of(q_rank_bm25(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert "ShuffledHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    # the term filter reaches the token stream before any exchange:
    # the isin shows up as an In predicate on the exploded column
    assert re.search(r"w#\d+ IN \(", plan) or "dup" in plan


def test_ewma_smooth_is_one_exchange_one_window_sort(spark):
    # one hash exchange on user_id, K-1 lags sharing ONE window sort,
    # no join, no second scan — the whole statistic is in-frame
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational10 import (
        q_ewma_smooth,
    )

    plan = plan_of(q_ewma_smooth(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    assert "Join" not in plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_rank_fusion_rrf_heads_are_take_ordered(spark):
    # both input lists and the final cut must be
    # TakeOrderedAndProject heads — a global row_number over the full
    # scored corpus would be a one-task sort at 100 TB
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational10 import (
        q_rank_fusion_rrf,
    )

    plan = plan_of(q_rank_fusion_rrf(spark, SF_SMOKE))
    assert len(re.findall(r"TakeOrderedAndProject", plan)) >= 3
    # windows only on the post-limit constant-size frames: every
    # row_number window sits above a limit in this plan shape, so no
    # window may consume a raw corpus-sized exchange; cheap proxy —
    # the plan has no Window with a partition-less sort over more
    # than the limited frames (structural pin via window count)
    assert len(re.findall(r"\(\d+\) Window", plan)) == 3


def test_acf_lags_collapses_to_calendar_before_joining(spark):
    # the series must shrink to one row per day (partial_count before
    # the first exchange) and the lag pairing must be a broadcast of
    # the tiny calendar frame — never a sort-merge of raw orders
    from data_ingestion_s3_to_parquet_spark.operators.relational11 import (
        q_acf_lags,
    )

    plan = plan_of(q_acf_lags(spark, SF_SMOKE))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "partial_count" in plan
    # column pruning: both scans read only the date column
    for seg in plan.split("ReadSchema:")[1:]:
        assert seg.splitlines()[0].strip() == "struct<o_orderdate:timestamp_ntz>"


def test_zorder_layout_is_map_only_after_one_bounds_broadcast(spark):
    # bounds are a 1-row aggregate broadcast back (the constant-size
    # crossJoin pattern); the keying is pure projection and the cell
    # rollup pays exactly one hash exchange with map-side combine.
    # No sort, no window, no corpus-proportional broadcast.
    from data_ingestion_s3_to_parquet_spark.operators.relational11 import (
        q_zorder_layout,
    )

    plan = plan_of(q_zorder_layout(spark, SF_SMOKE))
    # node-detail headers ("(9) BroadcastNestedLoopJoin"), not the tree
    # echo of the same node
    assert plan.count(") BroadcastNestedLoopJoin") == 1
    assert "SortMergeJoin" not in plan
    assert "Sort " not in plan  # node names carry a trailing space
    assert "Window" not in plan
    assert "partial_min" in plan and "partial_count" in plan
    # exchanges: one SinglePartition (4-value bounds) + one hash (cells)
    hash_exchanges = [
        seg for seg in plan.split("Arguments: ")[1:]
        if seg.startswith("hashpartitioning")
    ]
    assert len(hash_exchanges) == 1


def test_ccnet_buckets_pays_one_window_on_lang(spark):
    # the NTILE is the only window, partitioned by lang (per-language
    # sort, the oracle-exact stand-in for CCNet's quantile cutpoints)
    from data_ingestion_s3_to_parquet_spark.operators.relational11 import (
        q_ccnet_buckets,
    )

    plan = plan_of(q_ccnet_buckets(spark, SF_SMOKE))
    assert plan.count("(Window") + plan.count("Window (") == 1
    assert "ntile(3)" in plan
    assert "lang" in plan.split("ntile(3)", 1)[1].splitlines()[0]


def test_orc_interop_readback_is_vectorized_orc(spark):
    # the read-back side must be a batched (vectorized) ORC scan with
    # map-side partial aggregation — the same scan discipline as the
    # parquet lanes, on the second format
    from data_ingestion_s3_to_parquet_spark.operators.relational11 import (
        q_orc_interop,
    )

    plan = plan_of(q_orc_interop(spark, SF_SMOKE))
    assert "Scan orc" in plan
    assert "Batched: true" in plan
    assert "partial_count" in plan


def test_dedup_incremental_never_broadcasts_the_corpus_index(spark):
    # the base fingerprint index is corpus-sized: the anti-join must
    # stay a shuffled hash join (pinned via hint) even though the
    # fixture-size estimate would happily broadcast it, and both sides
    # shuffle on the fixed-width sha2 key, not document text
    from data_ingestion_s3_to_parquet_spark.operators.dedup import (
        q_dedup_incremental,
    )

    plan = plan_of(q_dedup_incremental(spark, SF_SMOKE))
    assert "BroadcastHashJoin" not in plan
    assert "ShuffledHashJoin" in plan and "LeftAnti" in plan
    assert "sha2" in plan


def test_lm_bigram_broadcasts_only_the_bounded_vocab(spark):
    # same shape contract as the unigram lane: the only broadcasts are
    # the top-V vocab LIMIT and the 1-row total; the bigram stream
    # itself is never a broadcast side
    from data_ingestion_s3_to_parquet_spark.operators.relational11 import (
        q_lm_bigram_score,
    )

    plan = plan_of(q_lm_bigram_score(spark, SF_SMOKE))
    n_bcast = plan.count(") BroadcastExchange")
    assert n_bcast == 2, plan[:2000]
    assert "TakeOrderedAndProject" in plan  # top-V is a limit, not a sort


def test_drift_psi_is_two_combinable_aggregates_and_one_broadcast(spark):
    # one scan per dimension with PARTIAL aggregation before its
    # exchange (map-side combine on the bounded bucket space), the
    # totals as the single one-row broadcast, no sort anywhere
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational12 import (
        q_drift_psi,
    )

    plan = plan_of(q_drift_psi(spark, SF_SMOKE))
    assert plan.count(") BroadcastExchange") == 1
    assert "partial_sum" in plan  # map-side combine feeds each exchange
    assert len(re.findall(r"\(\d+\) Sort", plan)) == 0
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_stream_dedup_batch_twin_is_one_combinable_aggregate(spark):
    # the dedup relation is a single groupBy: partial min/min_by/count
    # before one exchange; no join, no window
    import re

    from data_ingestion_s3_to_parquet_spark.streaming.windows import (
        q_stream_dedup,
    )

    plan = plan_of(q_stream_dedup(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "partial_min" in plan
    assert "Join" not in plan and "Window" not in plan


def test_eval_calibration_pays_one_window_sort_and_bounded_broadcasts(spark):
    # rank + NTILE share ONE window frame (a single global sort — the
    # documented approx-quantile substitution point at scale); the
    # only other exchanges serve the bounded lm-vocab machinery and
    # one-row totals
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational12 import (
        q_eval_calibration,
    )

    plan = plan_of(q_eval_calibration(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Window", plan)) == 1
    # bin aggregation happens on the 10-bucket space with map-side
    # combine
    assert "partial_sum" in plan


def test_eval_ndcg_heads_are_take_ordered_and_discounts_are_literals(spark):
    # both top-k cuts must be TakeOrderedAndProject (never a global
    # sort of the scored corpus) and the discount table must appear as
    # a literal array, not a computed log
    from data_ingestion_s3_to_parquet_spark.operators.relational12 import (
        NDCG_DISCOUNTS_MICRO,
        q_eval_ndcg,
    )

    import re

    plan = plan_of(q_eval_ndcg(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) TakeOrderedAndProject", plan)) == 2
    assert str(NDCG_DISCOUNTS_MICRO[1]) in plan  # 630930 literal
    assert "LOG" not in plan.upper().replace("CATALOG", "")


def test_graph_sssp_rounds_are_frontier_sized_and_hash_pinned(spark):
    # the per-round join carries the FRONTIER against the symmetrized
    # edge list under shuffle_hash pins — never a broadcast of either
    # corpus-proportional side (checkpointing collapses earlier
    # rounds, so inspect the final plan only for join strategy)
    from data_ingestion_s3_to_parquet_spark.operators.graph import (
        q_graph_sssp,
    )

    plan = plan_of(q_graph_sssp(spark, SF_SMOKE))
    assert "BroadcastHashJoin" not in plan


def test_ref_integrity_audit_never_broadcasts_a_parent(spark):
    # every parent in the audit GROWS with the corpus (only
    # region/nation are fixed dims, and none of them is a parent
    # here), so a broadcast anywhere in this plan is the fixture-scale
    # trap SCALE §83 documents: stable across the probe range yet a
    # driver-OOM once a parent key set outgrows memory. Zero
    # BroadcastExchange nodes, ever.
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational13 import (
        q_ref_integrity_audit,
    )

    plan = plan_of(q_ref_integrity_audit(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    # the pinned strategy is in effect for all four parent joins
    assert len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)) == 4


def test_quantile_select_broadcasts_only_bounded_frames(spark):
    # seven BroadcastExchange nodes exactly: the located-bucket list,
    # the locate table, the approx frame, and the internal bounded
    # carry/target frames — each domain-bounded by construction. The
    # 16x probe caught Catalyst dropping to 4 when size estimates
    # grew (SCALE §83); the explicit hints pin all seven at any scale.
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational13 import (
        q_quantile_select,
    )

    plan = plan_of(q_quantile_select(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 7
    # the selection re-read is bucket-pruned at the scan (pushed
    # filters on the join keys via DPP/runtime filters or static
    # pushdown — at minimum the scans exist and no global sort does)
    assert "Sort" in plan  # bucket-local row_number sorts
    w = re.findall(r"\(\d+\) Window\b", plan)
    assert w, "expected the bucket-local row_number window"


def test_drift_ks_data_window_is_bucket_partitioned(spark):
    # the corpus-sized cumulative window must carry the bucket
    # partition key; the only unpartitioned windows are over the
    # bounded carry frame (the token_budget_select rule)
    from data_ingestion_s3_to_parquet_spark.operators.relational13 import (
        q_drift_ks,
    )

    plan = plan_of(q_drift_ks(spark, SF_SMOKE))
    assert "partitionBy" not in plan  # formatted plans spell specs out
    # structural check: at least one Window node lists bucket as a
    # partition expression, and the per-value running sums appear
    # under it rather than under a global-order window
    assert "Window" in plan
    import re

    specs = re.findall(r"Arguments: \[[^\]]*\], \[bucket[^\]]*\]", plan)
    assert specs, "per-value window lost its bucket partition key"


def test_rolling_quantile_is_one_keyed_exchange(spark):
    # the whole operator is one exchange on user_id + one in-partition
    # sort feeding a bounded ROWS-frame window: no broadcast, no
    # global (unpartitioned) sort, no second shuffle — the same keyed
    # -window shape at any scale (rolling_median's pin, generalized)
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational14 import (
        q_rolling_quantile,
    )

    plan = plan_of(q_rolling_quantile(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "hashpartitioning(user_id", plan
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1


def test_eval_mrr_broadcasts_only_bounded_frames(spark):
    # every BroadcastExchange side is bounded by DOMAIN (the |query|-
    # sized df table, the one-row corpus stats, the per-term summary,
    # the one-row MRR mean); the two corpus-proportional joins (doc
    # lengths onto tf pairs, relevance pairs onto candidates) are
    # shuffle_hash-pinned — a fixture-scale broadcast there is the
    # driver-OOM trap (SCALE §82 rule)
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational14 import (
        q_eval_mrr,
    )

    plan = plan_of(q_eval_mrr(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)) >= 2
    # broadcast count pinned by the 4x/16x probes (stable); the
    # load-bearing property: the corpus-sized ranking window is
    # evaluated exactly ONCE (the MRR mean rides a bounded-carry
    # window over the 4-row per-term summary, not a crossJoin that
    # would re-compute the ranking subtree)
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2
    assert plan.count("row_number(") == 1


def test_alert_rate_spike_bounded_by_time_domain(spark):
    # one combinable (type, hour) aggregate then one keyed window over
    # the bucket table — output bounded by |types| x |hours| (the time
    # domain), never corpus-sized; no broadcast, no global sort
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational14 import (
        q_alert_rate_spike,
    )

    plan = plan_of(q_alert_rate_spike(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_eval_mrr_scale_has_no_ranking_window(spark):
    # the 100 TB twin must contain NO row_number window at all: the
    # first-relevant rank is an aggregate (best-struct + count-before)
    # and hits@k is a union of per-term TakeOrderedAndProject heads;
    # the only Window is the bounded 4-row MRR-mean carry
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational14 import (
        q_eval_mrr_scale,
    )

    plan = plan_of(q_eval_mrr_scale(spark, SF_SMOKE))
    assert plan.count("row_number(") == 0
    assert len(re.findall(r"\(\d+\) TakeOrderedAndProject", plan)) >= 4


def test_compaction_plan_carry_is_broadcast_and_windows_bucket_local(spark):
    # the decomposition's contract: the bounded bucket-carry table is
    # the ONLY broadcast, and every window carries a partition key
    # (source for the carry build, (source, bkt) for the in-bucket
    # prefix) — no source-global single-task window exists
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational14 import (
        q_compaction_plan,
    )

    plan = plan_of(q_compaction_plan(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 2
    # both window specs are partitioned (the formatted plan prints the
    # full windowspecdefinition with its partition expressions)
    assert "windowspecdefinition(source" in plan


def test_dedup_cluster_stats_histogram_is_bounded_carry(spark):
    # on top of the checkpointed CC output the report is two
    # combinable aggregates plus ONE unpartitioned window over the
    # HISTOGRAM frame (bounded by the number of distinct cluster
    # sizes — the eval_mrr bounded-carry exception); no ranking
    # window, no corpus-sized broadcast materializes here
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational15 import (
        q_dedup_cluster_stats,
    )

    plan = plan_of(q_dedup_cluster_stats(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1
    assert plan.count("row_number(") == 0


def test_corr_spearman_stats_are_combinable_after_ranks(spark):
    # the rank transform is window work partitioned by segment (the
    # documented fixture-scale form; the 100 TB substitution is the
    # per-VALUE two-phase rank in the docstring); everything after it
    # is ONE map-side-combinable 5-group aggregate — no second
    # corpus-sized shuffle, no broadcast of a growing side, and rank()
    # (not row_number) keeps ties layout-independent
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational15 import (
        q_corr_spearman,
    )

    plan = plan_of(q_corr_spearman(spark, SF_SMOKE))
    assert plan.count("row_number(") == 0
    assert plan.count("rank(") >= 2
    # customer grows with the corpus: the population join is
    # shuffle_hash-pinned, never a fixture-scale broadcast
    assert len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)) >= 1
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    # the per-customer pre-aggregate and the final stats aggregate
    # both ship partial_ aggregates (map-side combine)
    assert len(re.findall(r"HashAggregate", plan)) >= 4


def test_trend_linfit_is_two_combinable_aggregates(spark):
    # (type, day) count bounded by the TIME domain, then a |types|-
    # group stats aggregate: no window, no join, no broadcast, and at
    # most two exchanges end-to-end (the alert_rate_spike rule)
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational15 import (
        q_trend_linfit,
    )

    plan = plan_of(q_trend_linfit(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 0
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


def test_anova_oneway_is_one_shuffle_plus_bounded_carry(spark):
    # one map-side-combinable groupBy over orders (output bounded by
    # |priorities|), then every window rides the <=|groups|-row carry
    # frame sharing ONE window spec; no join, no broadcast, at most
    # two exchanges end-to-end
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational15 import (
        q_anova_oneway,
    )

    plan = plan_of(q_anova_oneway(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2
    assert plan.count("row_number(") == 0


def test_rank_mannwhitney_carry_is_the_only_broadcast(spark):
    # the drift_ks two-phase shape: one combinable per-value groupBy,
    # in-bucket running windows, and EXACTLY one broadcast — the
    # domain-bounded (~60-row) carry table, F.broadcast-pinned so
    # fixture-scale stats never re-plan it (SCALE §82); no ranking
    # window anywhere
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational15 import (
        q_rank_mannwhitney,
    )

    plan = plan_of(q_rank_mannwhitney(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1
    assert plan.count("row_number(") == 0
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 7


def test_quantile_weighted_broadcasts_are_bounded_only(spark):
    # two broadcasts, both pinned and domain-bounded: the price-bucket
    # carry (~60 rows) and the |QW_PERCENTS|-row target table; the
    # corpus-proportional weight join is shuffle_hash-pinned; no
    # ranking window
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational16 import (
        q_quantile_weighted,
    )

    plan = plan_of(q_quantile_weighted(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)) >= 1
    assert plan.count("row_number(") == 0


def test_gini_concentration_windows_ride_the_value_domain(spark):
    # one combinable (source, n_chars) aggregate, prefix-sum windows
    # over the DOMAIN-bounded per-value frame, one bounded final
    # aggregate: no join, no broadcast, at most two exchanges
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational16 import (
        q_gini_concentration,
    )

    plan = plan_of(q_gini_concentration(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2
    assert plan.count("row_number(") == 0


def test_containment_explode_sides_never_broadcast_on_shingles(spark):
    # the dedup_ngram_jaccard rule applied to the asymmetric join:
    # every explode-derived side (prefixes, full postings, df table)
    # is shuffle_hash-pinned; no BroadcastHashJoin may key on the
    # shingle hash column
    import re

    from data_ingestion_s3_to_parquet_spark.operators.dedup import (
        q_dedup_containment,
    )

    plan = plan_of(q_dedup_containment(spark, SF_SMOKE))
    assert "ShuffledHashJoin" in plan
    for m in re.finditer(r"\(\d+\) BroadcastHashJoin[^(]*", plan):
        assert "[gh#" not in m.group(0), m.group(0)


def test_eval_cohen_kappa_is_one_combinable_aggregate(spark):
    # the whole statistic is ONE map-side-combinable groupBy over
    # documents bounded by |langs|: exactly one exchange, no window,
    # no join, no broadcast
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational16 import (
        q_eval_cohen_kappa,
    )

    plan = plan_of(q_eval_cohen_kappa(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 0
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan


def test_privacy_tcloseness_broadcast_is_global_distribution_only(spark):
    # the ldiv discipline: the QI join is shuffle_hash-pinned
    # (customer grows with the corpus); the ONLY broadcast is the
    # |values|-row global sensitive distribution, F.broadcast-pinned
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational16 import (
        q_privacy_tcloseness,
    )

    plan = plan_of(q_privacy_tcloseness(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)) >= 1
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1
    assert plan.count("row_number(") == 0


def test_graph_assortativity_degree_joins_never_broadcast(spark):
    # both degree joins are shuffle_hash-pinned (the degree table
    # grows with the graph); pinned on the CACHED-artifact plan (the
    # production read path — the edge build is a one-time artifact
    # job, not part of this lane's steady-state plan)
    import re

    from data_ingestion_s3_to_parquet_spark.operators.graph import (
        _knn_edges,
        q_graph_assortativity,
    )

    _knn_edges(spark, SF_SMOKE).count()  # ensure the artifact exists
    plan = plan_of(q_graph_assortativity(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)) >= 2
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0


def test_eval_fleiss_kappa_is_one_combinable_aggregate(spark):
    # like the Cohen lane: one map-side-combinable groupBy bounded by
    # |langs| — one exchange, no window, no join, no broadcast
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational16 import (
        q_eval_fleiss_kappa,
    )

    plan = plan_of(q_eval_fleiss_kappa(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 0
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan


def test_eval_kripp_alpha_ordinal_is_one_combinable_aggregate(spark):
    # the ordinal lane must keep the nominal lane's shape: one
    # map-side-combinable groupBy bounded by |langs| — one exchange,
    # no window, no join, no broadcast (the whole statistic collapses
    # to global sufficient statistics, so nothing else is allowed)
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational16 import (
        q_eval_kripp_alpha_ordinal,
    )

    plan = plan_of(q_eval_kripp_alpha_ordinal(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 0
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan


def test_event_interarrival_pays_exactly_one_shuffle(spark):
    # the lag window hash-partitions on event_type and the follow-up
    # groupBy reuses that partitioning — ONE exchange total, one
    # Window node, no joins/broadcasts. A second exchange here means
    # the aggregate stopped riding the window's partitioning.
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational14 import (
        q_event_interarrival,
    )

    plan = plan_of(q_event_interarrival(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 1
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan


def test_graph_community_profile_never_broadcasts_labels(spark):
    # corpus-sized label/edge tables must join shuffle_hash (the §82
    # trap); the ONLY broadcast allowed is the 1-row edge total
    import re

    from data_ingestion_s3_to_parquet_spark.operators.graph import (
        _knn_edges,
        q_graph_community_profile,
    )

    _knn_edges(spark, SF_SMOKE).count()  # ensure the artifact exists
    plan = plan_of(q_graph_community_profile(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)) >= 5
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1


def test_text_yule_k_is_two_combinable_aggregates(spark):
    # (lang, word) frequency aggregate, then the |langs|-bounded
    # moment rollup — two exchanges, no window, no join, no broadcast
    import re

    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_text_yule_k,
    )

    plan = plan_of(q_text_yule_k(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 0
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan


def test_len_lognormal_fit_band_join_is_broadcast_and_filter_pushed(spark):
    # phase-2's band table is |langs|-bounded -> must join broadcast
    # (never sort-merge/shuffle-hash a corpus scan against it), and
    # the n_chars >= 1 gate must reach the parquet scan
    import re

    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_len_lognormal_fit,
    )

    plan = plan_of(q_len_lognormal_fit(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "n_chars" in pushed or "GreaterThanOrEqual" in pushed, pushed


def test_word_adaptation_is_topk_over_two_aggregates(spark):
    # (doc, word) tf aggregate -> per-word rollup -> the bounded head
    # must compile to TakeOrderedAndProject (never a global sort of
    # the vocabulary); two exchanges, no joins, no windows
    import re

    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_word_adaptation,
    )

    plan = plan_of(q_word_adaptation(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 0
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan


def test_eval_qwk_is_one_combinable_aggregate(spark):
    # the sufficient-statistic collapse means one exchange, no
    # window, no join, no broadcast — the agreement-family shape
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational16 import (
        q_eval_qwk,
    )

    plan = plan_of(q_eval_qwk(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) Window\b", plan)) == 0
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan


def test_text_mattr_pays_exactly_one_shuffle(spark):
    # every window (position rank, per-word lag, doc max) and the
    # final aggregate cluster on doc_id or a refinement of it, so
    # ONE hash(doc_id) exchange must satisfy them all — a second
    # exchange means a window stopped riding the doc partitioning
    import re

    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_text_mattr,
    )

    plan = plan_of(q_text_mattr(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan


def test_bootstrap_ci_mean_broadcasts_only_the_replicate_table(spark):
    # the x40 explode must come from broadcasting the 40-row replicate
    # frame (never shuffling orders against it); then one combinable
    # (status, b) aggregate and the bounded rank window — two
    # exchanges, one broadcast, no sort-merge/shuffle-hash joins
    import re

    from data_ingestion_s3_to_parquet_spark.operators.trainprep import (
        q_bootstrap_ci_mean,
    )

    plan = plan_of(q_bootstrap_ci_mean(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0


def test_event_interarrival_scale_partitions_by_segment(spark):
    # the segmented twin must window on (event_type, day) — not the
    # whole type — then stitch over the bounded summary: two
    # exchanges total (segment hash, then type hash for the stitch +
    # final aggregate), no joins, no broadcasts
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational14 import (
        q_event_interarrival_scale,
    )

    plan = plan_of(q_event_interarrival_scale(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan
    # the first (segment) window's partition spec carries the day
    assert "day" in plan


def test_bootstrap_ci_ratio_broadcasts_replicates_and_plain_join(spark):
    # two broadcasts only: the 40-row replicate frame (the x40
    # explode) and the |statuses|-row plain-share frame onto the
    # bounded CI result — never a corpus-sized shuffle join
    import re

    from data_ingestion_s3_to_parquet_spark.operators.trainprep import (
        q_bootstrap_ci_ratio,
    )

    plan = plan_of(q_bootstrap_ci_ratio(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0


def test_bootstrap_ci_quantile_histogram_shape(spark):
    # the quantile lane must run over HISTOGRAMS, not sorted rows:
    # two broadcasts only (the 40-row replicate frame and the
    # |statuses|-row plain-median frame onto the bounded CI result);
    # five exchanges — the two map-side-combinable histogram
    # aggregates (plain and replicate), their two cumulative-weight
    # windows, and the bounded rank window; never a sort-merge or
    # shuffle-hash join of the exploded fact table
    import re

    from data_ingestion_s3_to_parquet_spark.operators.trainprep import (
        q_bootstrap_ci_quantile,
    )

    plan = plan_of(q_bootstrap_ci_quantile(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 5
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0


def test_perm_test_diff_combinable_counters_shape(spark):
    # the B=99 relabelings must collapse to ONE map-side-combinable
    # groupBy(p) — shuffle volume B rows of four counters — plus the
    # single-row observed aggregate and the final tiny reduce: three
    # exchanges, two broadcasts (the 99-row perms VALUES frame and
    # the 1-row observed statistic), zero sort-merge/shuffle-hash
    # joins, zero windows
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_perm_test_diff,
    )

    plan = plan_of(q_perm_test_diff(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 3
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0
    assert "Window" not in plan


def test_stream_bootstrap_monoid_counter_shape(spark):
    # the streaming-compatible shape: the x40 fan-out is a stateless
    # explode (no replicate table, no broadcast at all), ONE
    # map-side-combinable (type, b) aggregate, then the bounded rank
    # window — two exchanges, zero broadcasts, zero joins
    import re

    from data_ingestion_s3_to_parquet_spark.streaming.windows import (
        q_stream_bootstrap,
    )

    plan = plan_of(q_stream_bootstrap(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan


def test_bootstrap_ci_diff_cluster_counter_shape(spark):
    # the cluster weights are pure per-row functions of (custkey, b):
    # no customer table, no data-sized join — one broadcast x40
    # explode, ONE combinable groupBy(b) of four counters, the
    # bounded single-partition rank window, and the 1-row observed
    # broadcast: three exchanges, two broadcasts, zero SMJ/SHJ
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_bootstrap_ci_diff,
    )

    plan = plan_of(q_bootstrap_ci_diff(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 3
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0


def test_srm_check_single_rollup_shape(spark):
    # one map-side-combinable ROLLUP aggregate over the customer
    # scan: ONE exchange, zero broadcasts, zero joins, zero windows
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_srm_check,
    )

    plan = plan_of(q_srm_check(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan and "Window" not in plan


def test_eval_win_rate_explode_counter_shape(spark):
    # stateless explode fan-out (no replicate table), ONE combinable
    # (lang, b) aggregate, bounded rank window, |langs|-row plain
    # broadcast: three exchanges, one broadcast, zero SMJ/SHJ
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational16 import (
        q_eval_win_rate,
    )

    plan = plan_of(q_eval_win_rate(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 3
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0


def test_metric_winsorized_histogram_shape(spark):
    # both passes run over the bounded per-(status, cents) histogram:
    # the histogram aggregate, its cumulative window, the bounds
    # reduce, and the final clamp aggregate — four exchanges, ONE
    # broadcast (the |statuses|-row bounds frame), zero SMJ/SHJ
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational15 import (
        q_metric_winsorized,
    )

    plan = plan_of(q_metric_winsorized(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 4
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0


def test_ngram_novelty_shuffle_hash_no_broadcast(spark):
    # both join sides are corpus-proportional: the doc-keyed join is
    # shuffle_hash-pinned and NOTHING broadcasts; the gram and doc
    # attributions are two combinable aggregates — three exchanges
    import re

    from data_ingestion_s3_to_parquet_spark.operators.dedup import (
        q_ngram_novelty,
    )

    plan = plan_of(q_ngram_novelty(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 3
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert len(re.findall(r"\(\d+\) ShuffledHashJoin", plan)) == 1


def test_eval_brier_inherits_calibration_shape(spark):
    # the decomposition adds NO data-sized work to the calibration
    # frame: everything after the lm-score build is the one global
    # NTILE window, a 10-group combinable aggregate, the 1-row totals
    # broadcast, and a 10-row reduce — same exchange/broadcast budget
    # as the upstream score pipeline, zero SMJ/SHJ
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational12 import (
        q_eval_brier,
    )

    plan = plan_of(q_eval_brier(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 10
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 7
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0


def test_eval_bradley_terry_single_aggregate_shape(spark):
    # ONE combinable aggregate over documents produces the six win
    # counters; all 8 unrolled MM iterations are constant-size
    # expression rounds on the 1-row frame: one exchange total, zero
    # broadcasts, zero joins, zero windows
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational16 import (
        q_eval_bradley_terry,
    )

    plan = plan_of(q_eval_bradley_terry(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan and "Window" not in plan


def test_sample_alloc_neyman_bounded_apportionment_shape(spark):
    # one combinable moments aggregate (|strata| rows out), then the
    # whole Hamilton apportionment inside the bounded strata frame
    # (one single-partition exchange for the totals/rank windows):
    # two exchanges, zero broadcasts, zero joins
    import re

    from data_ingestion_s3_to_parquet_spark.operators.trainprep import (
        q_sample_alloc_neyman,
    )

    plan = plan_of(q_sample_alloc_neyman(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan


def test_perm_test_ratio_combinable_counters_shape(spark):
    # perm_test_diff's shape on the share statistic: three exchanges,
    # two broadcasts (perms VALUES + 1-row observed), zero SMJ/SHJ,
    # zero windows
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_perm_test_ratio,
    )

    plan = plan_of(q_perm_test_ratio(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 3
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0
    assert "Window" not in plan


def test_metric_cuped_suffstat_shape(spark):
    # the moments-lane shape: one combinable groupBy(unit), one
    # 1-row pooled aggregate, one 2-row arm aggregate, ONE broadcast
    # of the pooled stats — four exchanges, one broadcast, zero
    # SMJ/SHJ, zero windows
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_metric_cuped,
    )

    plan = plan_of(q_metric_cuped(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 4
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0
    assert "Window" not in plan


def test_rank_test_u_shape(spark):
    # the dr histogram + carry feed TWO consumers (observed split and
    # the x99 explode), so the corpus-proportional dr->scan
    # shuffle_hash join appears once per branch (2 SHJ, both pinned —
    # the anti-broadcast rule: both sides scale with the corpus);
    # everything after the joins is B-row counters. No windows over
    # data (the only windows are on the bounded bucket frame).
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational15 import (
        q_rank_test_u,
    )

    plan = plan_of(q_rank_test_u(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 4
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 2
    assert "CartesianProduct" not in plan


def test_fdr_bh_bounded_frame_shape(spark):
    # perm_test_diff's counter shape per segment: the x99 explode
    # collapses map-side to |segments|*B counter rows, the observed
    # frame broadcasts, and every window runs on the bounded m-row
    # p frame — 4 exchanges, 2 broadcasts, zero SMJ/SHJ
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_fdr_bh,
    )

    plan = plan_of(q_fdr_bh(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 4
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0


def test_chisq_independence_bounded_frame_shape(spark):
    # ONE combinable groupBy over the scan; margins, the zero-cell
    # cross join, and the reduce all on the <= r*c cell frame —
    # broadcast-or-nested-loop joins over bounded frames only, no
    # data-sized SMJ/SHJ, no Python
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_chisq_independence,
    )

    plan = plan_of(q_chisq_independence(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 8
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0
    assert "ArrowEvalPython" not in plan


def test_power_mde_single_aggregate_shape(spark):
    # one combinable moments aggregate over the scan, |statuses|
    # output rows — one exchange, nothing else
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_power_mde,
    )

    plan = plan_of(q_power_mde(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 0
    assert "Join" not in plan and "Window" not in plan


def test_stream_srm_counter_monoid_shape(spark):
    # one combinable counter aggregate over the scan, then bounded
    # finishing (pivot + all-types union) — no joins, no windows,
    # no Python
    import re

    from data_ingestion_s3_to_parquet_spark.streaming.windows import (
        q_stream_srm,
    )

    plan = plan_of(q_stream_srm(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan


def test_eval_pass_at_k_single_aggregate_shape(spark):
    # one combinable aggregate, |langs| rows, chained constant
    # expressions — one exchange, nothing else
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational16 import (
        q_eval_pass_at_k,
    )

    plan = plan_of(q_eval_pass_at_k(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "Join" not in plan and "Window" not in plan


def test_survival_km_two_aggregate_shape(spark):
    # groupBy(user) + the single-row wide counter aggregate, then
    # constant chained expressions and the 8-row stack — two
    # exchanges, no joins, no windows
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational15 import (
        q_survival_km,
    )

    plan = plan_of(q_survival_km(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert "Join" not in plan and "Window" not in plan


def test_tokenizer_vocab_overlap_wgl_shape(spark):
    # the constant-k rank filter must execute as WindowGroupLimit
    # (per-partition state = k rows, never the language's whole
    # vocabulary); the only SHJ runs on the bounded head frame
    import re

    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_tokenizer_vocab_overlap,
    )

    plan = plan_of(q_tokenizer_vocab_overlap(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) <= 1
    assert "ArrowEvalPython" not in plan


def test_fdr_holm_bounded_frame_shape(spark):
    # identical counter shape to fdr_bh (the shared p frame), the
    # walk adds only bounded-frame windows
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_fdr_holm,
    )

    plan = plan_of(q_fdr_holm(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 4
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 2
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0


def test_sample_alloc_executed_no_corpus_sort(spark):
    # the two-phase draw must NOT sort the corpus per stratum: the
    # only Window runs on boundary-bucket rows; the histogram and
    # boundary frames broadcast back onto the scan
    import re

    from data_ingestion_s3_to_parquet_spark.operators.trainprep import (
        q_sample_alloc_executed,
    )

    plan = plan_of(q_sample_alloc_executed(spark, SF_SMOKE))
    # exactly one data-side Window (the boundary-bucket rank)
    assert plan.count("WindowGroupLimit") == 0
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) <= 1
    assert "CartesianProduct" not in plan
    assert "ArrowEvalPython" not in plan


def test_metric_did_three_aggregate_shape(spark):
    # shared unit groupBy, 2-row arm aggregate, 1-row pivot —
    # three exchanges, nothing else
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational9 import (
        q_metric_did,
    )

    plan = plan_of(q_metric_did(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 3
    assert "Join" not in plan and "Window" not in plan


def test_eval_lang_confusion_bounded_frame_shape(spark):
    # one combinable aggregate to the bounded confusion frame;
    # margins/joins/divisions all on it — no data-sized SMJ/SHJ,
    # no Python
    import re

    from data_ingestion_s3_to_parquet_spark.operators.textstats import (
        q_eval_lang_confusion,
    )

    plan = plan_of(q_eval_lang_confusion(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_survival_logrank_two_aggregate_shape(spark):
    # survival_km's shape with two at-risk recursions: groupBy(user)
    # + single-row wide counters + constant chained expressions —
    # two exchanges, no joins, no windows
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational15 import (
        q_survival_logrank,
    )

    plan = plan_of(q_survival_logrank(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2
    assert "Join" not in plan and "Window" not in plan


def test_bootstrap_ci_winsorized_composed_shape(spark):
    # the composition keeps both components' scale shapes: the
    # histogram passes (bounded by the price domain), the broadcast
    # bounds onto the scan, the x40 replicate broadcast, ONE
    # combinable (status, b) aggregate, the bounded rank window —
    # eight exchanges, four broadcasts (bounds x2, reps, plain),
    # zero SMJ/SHJ
    import re

    from data_ingestion_s3_to_parquet_spark.operators.relational15 import (
        q_bootstrap_ci_winsorized,
    )

    plan = plan_of(q_bootstrap_ci_winsorized(spark, SF_SMOKE))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 8
    assert len(re.findall(r"\(\d+\) BroadcastExchange", plan)) == 4
    assert len(re.findall(r"\(\d+\) (?:SortMergeJoin|ShuffledHashJoin)", plan)) == 0
