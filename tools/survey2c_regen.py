"""Regenerate SURVEY.md §2C's graded-inventory table in registry order.

The table is pinned by tests/test_operators.py::
test_survey_2c_table_matches_registry (names and 1..50 numbering must
match the registry exactly). Rotations reorder the graded prefix, so
hand-editing the 50-row table is error-prone; this tool re-emits it:

- rows whose lane already has a table row keep their "check" text
  (updated descriptions can be passed via NEW_ROWS);
- rows new to the table (promotions whose old rows were dropped in
  earlier rounds) fall back to NEW_ROWS, which the round's author
  maintains below.

Usage: python tools/survey2c_regen.py   (rewrites SURVEY.md in place)
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, ".")

from data_ingestion_s3_to_parquet_spark.plans.registry import REGISTRY  # noqa: E402

# Check-column text for lanes that need a NEW table row this round
# (or whose text should change). Everything else keeps its prior text.
NEW_ROWS: dict[str, str] = {
    "bootstrap_ci_quantile": "full oracle (Poisson bootstrap CI for the median order price per status — the quantile case, where the normal-approximation CI needs the unknown density f(Q(p)) and the bootstrap is the standard answer; independent `q:`-salted md5 CDF-ladder weight stream; per-replicate WEIGHTED type-1 median computed over the map-side-combinable per-(status, b, cents) histogram, so shuffle volume is \\|distinct cents\\|·B — bounded by the price domain, never row count; integer cents end-to-end, no division beyond the two integer ceil-rank thresholds; type-1 CI bounds at ranks scaled to the effective replicate count (ADVICE r13 — ceil(.025 n)/ceil(.975 n), exact integer ceil); + hashlib full-recompute pytest + planted histogram pytest; NEW r13 wave 1)",
    "perm_test_diff": "full oracle (deterministic permutation test for the difference of arm mean order prices — the significance leg next to ab_test_metrics: CLUSTER-level relabeling per permutation via md5('p:' \\|\\| custkey \\|\\| ':' \\|\\| p) holds every customer's orders together (the randomization-unit discipline that keeps p honest); B = 99 relabelings collapse to ONE map-side-combinable groupBy(p) of four exact counters; arm means are pinned half-up integer divisions on decimal/HUGEINT cent sums; p is the add-one estimator (n_ge+1)/(B+1), Phipson & Smyth 2010, one pinned micro division; empty-arm relabelings NULL out and n_perms reports the effective count; + hashlib full-recompute pytest + planted no-effect/strong-effect pytest; NEW r13 wave 2)",
    "stream_bootstrap": "full oracle (the streaming uncertainty leg — Poisson bootstrap CI for the mean event value per event_type, graded through its batch twin end-to-end: the per-(type, b) (Σw, Σw·cents) counters are a commutative monoid, so the IDENTICAL _boot_counters code path runs under readStream as a plain complete-mode aggregation with \\|types\\|·B rows of state; `s:`-salted md5 weight stream independent of the other bootstrap lanes; CI finishing is the bounded rank selection (effective-count-scaled ranks, ADVICE r13) over each snapshot; + cross-micro-batch parity pytest in tests/test_streaming.py pinning two micro-batches == batch counters AND CI bitwise; NEW r13 wave 3)",
    "bootstrap_ci_diff": "full oracle (CLUSTER-bootstrap CI for the difference of arm mean order prices — the effect-size uncertainty completing the experiment readout next to ab_test_metrics and perm_test_diff: customers (the randomization unit) resample as WHOLE clusters via one d:-salted md5 Poisson weight per (custkey, b) applied to every order of the customer — a pure per-row function, no customer table, no join; per-replicate d = two pinned half-up integer divisions on decimal/HUGEINT sums, empty-arm replicates NULL out, type-1 bounds at effective-count-scaled ranks over the ≤40-row window (ADVICE r13); + hashlib full-recompute pytest + CI-brackets-point-estimate pytest; NEW r13 wave 4)",
    "srm_check": "full oracle (sample-ratio-mismatch audit, Fabijan et al. KDD 2019 — the pre-analysis hygiene gate for the A/B family: customer UNITS counted per nation + global via one map-side-combinable ROLLUP; chi-square(1 df) against the designed even md5 split collapses to (n_a−n_b)²/N — one pinned half-up micro division; the alpha = 0.001 verdict is an exact integer cross-multiplication against the published 10.828 critical value, no float compare, no p-table; zero joins/windows/broadcasts; + planted segment-loss pytest (drop 80% of one nation's arm A: that nation alerts, others don't); NEW r13 wave 5)",
    "eval_win_rate": "full oracle (arena-style pairwise win rate P(A beats B) + ½·P(tie) per language over the fixed ordinal rubric pair, WITH the deterministic Poisson-bootstrap CI over documents — the comparison unit — from a w:-salted md5 weight stream independent of the other bootstrap lanes; win = (2·gt + eq)/(2·n) on exact integer counters, ONE pinned half-up micro division per estimate (plain and per replicate), ties handled by counter algebra never a float 0.5; ×B fan-out is a stateless explode (no broadcast), ONE combinable (lang, b) aggregate, type-1 bounds at effective-count-scaled ranks (ADVICE r13); + hashlib full-recompute pytest + planted all-ties pytest (win = 0.5 exactly, CI collapses to the point); NEW r13 wave 6)",
    "metric_winsorized": "full oracle (the experimentation-platform capped metric: exact TYPE-1 p5/p95 cents bounds — smallest value whose cumulative count reaches ceil(p·n), picked never interpolated — and the winsorized (clamped, not trimmed) mean next to the raw mean; BOTH passes run over the map-side-combinable per-(status, cents) histogram (the bootstrap_ci_quantile bounded-domain idea), the \\|statuses\\|-row bounds frame broadcasts back onto the histogram, and each mean is ONE pinned half-up micro division on decimal/HUGEINT sums; + planted tail pytest (one huge outlier moves the raw mean, the winsorized mean clamps it to p95); NEW r13 wave 7)",
    "ngram_novelty": "full oracle (per-document trigram novelty share — the fraction of a doc's DISTINCT trigrams whose first corpus occurrence (min doc_id) is this doc: the pairwise-free curation score for template floods and reposts; per-doc distinct grams built ROW-LOCALLY (transform + array_distinct, n_grams never shuffles), first-occurrence attribution as ONE groupBy(gram) min(doc_id) + ONE groupBy(first_doc) count, final doc-keyed join shuffle_hash-pinned (both sides corpus-proportional — the ref_integrity_audit broadcast rule); sub-trigram docs dropped both engines; novelty = ONE pinned half-up micro division; + planted copy-chain pytest (original scores 1.0, verbatim repost 0.0) + Python recompute; NEW r13 wave 8)",
    "eval_brier": "full oracle (Brier score + Murphy 1973 REL/RES/UNC decomposition for the fluency-score detector of the planted positive language, over DISCRETE decile-midpoint forecasts p_k = (2k−1)/20 of the eval_calibration NTILE frame — the discrete alphabet makes BS = REL − RES + UNC an EXACT identity (pytest pins gap 0 on the fixture); BS collapses to one exact integer division of Σ n_k(2k−1)² − 40(2k−1)pos_k + 400pos_k; per-bin REL/RES terms are midpoint-free half-up integer divisions on exact decimal/HUGEINT squares, micro-quantized BEFORE the cross-bin sum (the anova_oneway rule; VERDICT r13 #5 closed the former pinned-double seam — RES numerator now exact to N ≈ 2.4·10⁸ docs, loud decimal overflow past it); + NTILE-replicating Python recompute pytest + identity pytest; NEW r13 wave 9)",
    "eval_bradley_terry": "full oracle (Bradley–Terry strengths for the three rubric raters from pairwise win counts — the arena-leaderboard algorithm: Hunter 2004 MM unrolled for a FIXED 8-iteration budget (the LPA fixed-rounds convention — fixpoint convergence NOT claimed; the ranking stabilizes after iteration 1) in fixed-point micro arithmetic, every update θ'_x = W_x(θ_x+θ_y)(θ_x+θ_z)/(n_xy(θ_x+θ_z)+n_xz(θ_x+θ_y)) and each Σθ = 3·10⁶ normalization ONE half-up integer division of exact decimal/HUGEINT products, zero floats; ties skipped (the BT standard), abstaining-rater pairs count only graded docs; ONE combinable aggregate → six win counters, then constant-size iterations — zero joins/windows/broadcasts; + exact-integer Python recompute of all 8 iterations + planted strict-dominance pytest; NEW r13 wave 10)",
    "sample_alloc_neyman": "full oracle (Neyman 1934 optimal allocation of a 10,000-row sampling budget across order-status strata — n_h ∝ N_h·σ_h minimizes the stratified-mean variance; the weight collapses to ONE correctly-rounded sqrt per stratum of the exact integer variance numerator V_h = n·Σy² − (Σy)² (the identity N·sqrt(V/N²) = sqrt(V) removes the division), and the integer split is HAMILTON largest-remainder apportionment with a deterministic status tie-break, so allocations sum EXACTLY to the budget (pinned); zero-variance-everywhere corpora fall back to proportional-to-size Hamilton; one combinable moments aggregate + the bounded \\|strata\\|-row apportionment frame; + exact Python recompute + planted zero-variance-stratum pytest; NEW r13 wave 11)",
    "perm_test_ratio": "full oracle (deterministic permutation test for the difference of arm URGENT-ORDER SHARES — the significance leg for the ratio metric, completing the experiment matrix's ratio column next to bootstrap_ci_ratio's CI: customer-level relabelings from an independent pr:-salted md5 stream (B = 99), each share ONE pinned half-up micro division of exact counts, add-one p-value as one more; same counter shape as perm_test_diff (one combinable groupBy(p) of four counters, zero data joins); + hashlib full-recompute pytest + planted no-effect/strong-effect pytest; NEW r13 wave 12)",
    "bootstrap_ci_winsorized": "full oracle (Poisson-bootstrap CI for the WINSORIZED mean order price per status — the capped metric's uncertainty: exact type-1 p5/p95 bounds estimated ONCE from the full sample and held fixed across replicates (the documented production convention — re-estimating per replicate answers a different question and breaks the counter monoid), broadcast onto the scan; v:-salted md5 CDF-ladder weights on the CLAMPED cents, per-(status, b) decimal/HUGEINT counters, pinned half-up micro divisions, type-1 bounds at effective-count-scaled ranks (ADVICE r13); the reported plain winsorized mean equals metric_winsorized bitwise (pinned by pytest) and the CI brackets it; NEW r13 wave 13)",
    "metric_cuped": "full oracle (CUPED variance-reduced arm means, Deng-Xu-Kohavi-Walker WSDM 2013 — the A/B matrix's variance-reduction leg: per-customer pre/experiment spend from ONE combinable groupBy(unit), pooled sufficient statistics (n, sx, sy, sxy, sxx) exact decimal/HUGEINT, theta = cov/var as ONE signed half-away pinned division (the sign-split form — VERDICT r13 #5's trick, shared as SIGNED_DIV_EXPR), arm/pooled means as house half-up micro divisions, the adjustment term one exact product + one more signed division; var(X) = 0 degrades to theta = 0 and the raw mean (pinned); zero data joins/windows — 4 exchanges, 1 broadcast; + exact Python recompute + planted CI-shrink pytest (adjusted-diff bootstrap CI < raw/2) + zero-variance pytest; NEW r14 wave 1)",
    "rank_test_u": "full oracle (Mann-Whitney U permutation test of A/B arm order spend — perm_test_diff's nonparametric twin for the heavy price tail: pooled tie-aware double-ranks computed ONCE label-free from the value histogram (two-phase bucket carry, no global window) and joined back (shuffle_hash-pinned, both sides corpus-proportional); every u:-salted customer-level relabeling then collapses to ONE combinable groupBy(perm) of three exact counters; the two-sided compare is the exact integer cross-multiplication \|num_p\|·n_a·n_b ≥ \|num_obs\|·pn_a·pn_b — exact to N ≈ 2·10⁹ where the tie-corrected normal z's radicand leaves decimal(38,0) at N ≈ 7·10⁵ (the documented reason the permutation finisher was chosen); AUC readout + add-one p, one pinned micro division each; + exact Python recompute + planted all-ties/complete-separation pytest; NEW r14 wave 2)",
    "fdr_bh": "full oracle (Benjamini-Hochberg FDR correction over per-segment permutation p-values — the multiple-comparisons gate for sliced experiment readouts: five order-priority segments each run perm_test_diff's customer-level test from ONE SHARED f:-salted relabeling stream (the many-metrics-one-experiment shape), the x99 explode collapsing map-side to \|segments\|·B counter rows; the BH walk is pure integers on the bounded m-row frame — each candidate p(k)·m/k ONE pinned half-up division, the step-up as a reversed running-min window, verdict an integer compare vs alpha = 0.05; NULL-p segments excluded (engines order NULLs differently — guarded, m counts testable segments); + hashlib full-recompute pytest + planted one-effect-among-four-nulls pytest (the effect's adjusted p = exactly alpha survives, nulls stay 1.0); NEW r14 wave 3)",
    "chisq_independence": "full oracle (Pearson chi-square independence of order priority × status — srm_check's general-df sibling: ONE combinable groupBy to the ≤ r·c cell frame, margins/zero-cell cross join/reduce all bounded; the pinned TWO-step per-cell sequence — e_u = half-up(1e6·R·C, N) then term = half-up(dev², e_u) with dev = 1e6·O − e_u — keeps dev² ≤ 1e12·N² inside decimal(38,0) to N ≈ 3·10¹² rows where the naive single division overflows at 5.6·10⁷ (capacity bounds, not row-count bounds); absent cells are SYNTHESIZED with O = 0 so their E > 0 terms count; df = (r−1)(c−1), alpha = 0.05 verdict an integer compare vs the pinned published critical table (df ≤ 24); + exact recompute pytest + planted independent/perfect-association pytest (chi2 exactly 0 / exactly N·(k−1)); NEW r14 wave 4)",
    "power_mde": "full oracle (minimum detectable effect at 80% power / alpha .05 per order status — the pre-experiment sizing readout: exact decimal/HUGEINT variance numerator from ONE combinable moments aggregate; the finisher is a pinned IEEE sequence of TWO correctly-rounded sqrts on exact operands — sqrt(2V) and sqrt(n−1) — because the single-radicand form sqrt(2V(n−1)) grows as n³·max² and leaves decimal(38,0) at n ≈ 3·10⁷ (the §105 capacity rule); pinned z-sum constant 2.801585 in micros, one ROUND; relative MDE one half-up micro division of the two readouts; \|statuses\| output rows, zero joins/windows/broadcasts — 1 exchange; + exact recompute pytest + planted zero-variance (MDE = 0) and 4n-halves-MDE pytests; NEW r14 wave 5)",
    "stream_srm": "full oracle (exposure-level sample-ratio mismatch per event_type, graded through its batch twin end-to-end — srm_check's streaming leg: the per-(type, arm) exposure counters are a count MONOID, so the identical _srm_counters code path accumulates across micro-batches as a plain streaming aggregation with \|types\|·2 rows of state (cross-micro-batch parity pinned in tests/test_streaming.py: two micro-batches == batch counters bitwise AND the finished chi² table); the all-types row sums from the bounded counter frame — the streaming-safe ROLLUP substitute; chi²(1 df) + the alpha = 0.001 verdict are srm_check's pinned expressions verbatim; + planted one-armed-segment pytest (chi² exactly 40, alerts; balanced type chi² 0); NEW r14 wave 6)",
    "eval_pass_at_k": "full oracle (unbiased pass@k, Chen et al. 2021 Codex estimator, per language with the deterministic n_chars ≥ 200 acceptance gate — the sampling-budget readout for generation-heavy pipelines: ONE combinable aggregate to (n, c) per lang, then the k-step pinned half-up division sequence q_{i+1} = round(q_i·(n−c−i)/(n−i)) in micros — NOT the closed binomial form, whose n^k numerator leaves decimal(38,0) at n ≈ 6·10³ for k = 10 (the §105 capacity rule); n−c−i ≤ 0 pins the product to 0 (pass = 1 exactly), k > n is NULL per the Codex convention; per-step drift ≤ 0.5 micro, ≤ k/2 total, pinned vs the float closed form in pytest; + exact recompute + planted boundary pytest (all-pass/none-pass/one-pass with the 1/5 and clamp-to-1 exact values); NEW r14 wave 7)",
    "cdc_apply": "full oracle (CDC latest-wins snapshot with tombstones, ts ties broken by event_id); re-promoted r14 grade-freshness rotation (r6 driver row — the registry's measured-oldest cohort)",
    "data_expectations": "full oracle (declarative expectation gate — per-rule (n_checked, n_violations, passed) rows, one designed-to-fail rule); re-promoted r14 grade-freshness rotation (r6 driver row)",
    "doc_fingerprint": "full oracle (content-address fingerprints: raw md5, whitespace-normalized md5, byte-length + sha256 of the text bytes as an opaque blob); re-promoted r14 grade-freshness rotation (r6 driver row)",
    "fuzzy_match_strings": "full oracle (Levenshtein prefix linkage within language blocks, JVM-side exact DP); re-promoted r14 grade-freshness rotation (r6 driver row)",
    "higher_order_funcs": "full oracle (filter/exists/fold/min-max/slice lambda surface over the embedding column, all codegen); re-promoted r14 grade-freshness rotation (r6 driver row)",
    "interleave_mix": "full oracle (deterministic stride/WFQ weighted corpus interleave on md5 order); re-promoted r14 grade-freshness rotation (r6 driver row)",
    "join_bloom_prefilter": "full oracle (bloom-filter semi-join prefilter, output equals the exact join); re-promoted r14 grade-freshness rotation (r6 driver row)",
    "json_variant": "full oracle (Spark 4 VARIANT parse-once + typed variant_get extraction); re-promoted r14 grade-freshness rotation (r6 driver row)",
    "knn_graph": "full oracle (exact cosine k-NN edge table within label blocks, WindowGroupLimit top-k); re-promoted r14 grade-freshness rotation (r6 driver row)",
    "label_propagation": "full oracle (4-round synchronous LPA community detection over the symmetrized k-NN graph, smallest-label ties); re-promoted r14 grade-freshness rotation (r6 driver row)",
    "lang_id": "full oracle (marker-token language ID over the documents table); re-promoted r14 grade-freshness rotation (r6 driver row)",
    "lm_unigram_score": "full oracle (broadcast-vocab unigram LM surprisal scoring); re-promoted r14 grade-freshness rotation (r6 driver row)",
}


def main() -> None:
    path = Path(__file__).resolve().parent.parent / "SURVEY.md"
    text = path.read_text()
    row_re = re.compile(r"^\| (\d+) \| `([a-z0-9_]+)` \| (.*) \|(.*)\|$", re.M)
    rows = {m.group(2): (m.group(3), m.group(4)) for m in row_re.finditer(text)}

    out_lines = ["| # | queries() key | check | absorbs (former entries) |",
                 "|---|---|---|---|"]
    missing = []
    for i, name in enumerate(REGISTRY, start=1):
        prior = rows.get(name)
        check = NEW_ROWS.get(name) or (prior[0] if prior else None)
        absorbs = prior[1] if prior else " "
        if check is None:
            missing.append(name)
            check = "full oracle"
        out_lines.append(f"| {i} | `{name}` | {check} |{absorbs}|")
    if missing:
        print("WARNING: no prior/new check text for:", missing)

    # Replace the existing table block (header through last numbered row)
    table_re = re.compile(
        r"\| # \| queries\(\) key \| check \| absorbs \(former entries\) \|\n"
        r"\|---\|---\|---\|---\|\n"
        r"(?:\|.*\|\n)+",
    )
    new_table = "\n".join(out_lines) + "\n"
    text2, n = table_re.subn(new_table, text, count=1)
    assert n == 1, "did not find the §2C table"
    path.write_text(text2)
    print(f"rewrote §2C table: {len(REGISTRY)} rows")


if __name__ == "__main__":
    main()
