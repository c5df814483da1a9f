"""Round-7 third wave: winnowing fingerprints, an inverted index,
and CUSUM changepoint detection.

- ``doc_winnow``         winnowing fingerprint selection (the MOSS
                         algorithm: Schleimer, Wilkerson, Aiken,
                         SIGMOD'03 "Winnowing: Local Algorithms for
                         Document Fingerprinting") — the
                         position-aware, guarantee-carrying
                         fingerprint family next to the repo's
                         rolling-hash ``doc_fingerprint`` and
                         MinHash/SimHash whole-doc sketches
- ``inverted_index``     term → (df, tf, bounded posting list) — the
                         retrieval-side artifact of a corpus build
- ``changepoint_cusum``  per-customer CUSUM split-point detection on
                         the order stream — the distribution-shift
                         probe next to ``anomaly_zscore``'s pointwise
                         outliers

All three are graded with full bitwise oracles: every intermediate is
integer (40-bit md5-prefix gram hashes, packed argmin keys, exact
cent sums), so there is nothing for two engines to round differently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..plans.spec import Query
from ..sources.catalog import load_table

# --------------------------------------------------------------------
# doc_winnow
# --------------------------------------------------------------------

WINNOW_GRAM_N = 3  # words per gram (matches the repo shingle convention)
WINNOW_W = 4  # winnowing window: one fingerprint per W consecutive grams
# 40-bit gram hashes and 20-bit positions pack into one int64 key:
# key = h * 2^20 + (2^20 - 1 - pos). MIN(key) over a window is then
# "smallest hash, rightmost position on ties" — exactly the winnowing
# tie rule — decoded back by div/mod. 40 + 20 = 60 bits < 63, no
# overflow; docs are capped far below 2^20 grams at this layer (longer
# inputs go through chunk_text first).
_POS_BITS = 20
_POS_MOD = 1 << _POS_BITS  # 1048576
_FP_HEX = 10  # 40-bit gram fingerprint (exact in a double: < 2^53)


def q_doc_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprint selection: from each document's rolling
    3-word-gram hashes, keep the minimum of every ``WINNOW_W``-gram
    window (rightmost on ties) and emit the distinct selected
    (position, fingerprint) pairs.

    Winnowing's guarantee (the reason MOSS uses it over "every k-th
    hash" sampling): any shared substring of at least
    ``WINNOW_W + WINNOW_GRAM_N - 1`` words produces at least one
    IDENTICAL selected fingerprint in both documents, so
    fingerprint-equality joins find all sufficiently long overlaps —
    position-aware plagiarism/quotation detection, where the whole-doc
    sketches (``dedup_fuzzy``) only score global similarity and
    ``dedup_passages`` needs a corpus-wide hot-gram table.

    Engine shape: the argmin-with-tie-break per sliding window — a
    scan-resistant imperative loop in most engines — collapses into
    ONE window-function pass by packing (hash, position) into a single
    int64 ordered so MIN() implements the tie rule (header comment).
    One gram explode, one per-doc window shuffle, a distinct; no join,
    no UDF. At 100 TB the shuffle key is doc_id (never the gram text)
    and output is ~|grams| / ((WINNOW_W + 1) / 2) rows by the
    winnowing density bound (2/(w+1)).

    Docs shorter than ``WINNOW_GRAM_N`` words have no grams and emit
    nothing; docs with fewer than ``WINNOW_W`` grams emit their single
    global minimum (the standard short-document degeneration).
    """
    return winnow_fingerprints(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """The input-pluggable winnowing core: (doc_id, text) in,
    distinct selected (doc_id, fp_pos, fp) out (docstring above)."""
    d = docs.select("doc_id", F.split("text", " ").alias("t"))
    m = F.greatest(F.size("t") - (WINNOW_GRAM_N - 1), F.lit(0))
    # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]); empty-gram
    # docs need an explicit empty array (the ngram_counts rule)
    idx = F.when(m >= 1, F.sequence(F.lit(1), m)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ",
            *[
                F.element_at(F.col("t"), (i + k).cast("int"))
                for k in range(WINNOW_GRAM_N)
            ],
        ),
    )
    g = (
        d.select("doc_id", m.alias("m"), F.posexplode(grams).alias("p0", "gram"))
        .select(
            "doc_id",
            "m",
            (F.col("p0") + 1).alias("pos"),
            F.conv(F.substring(F.md5("gram"), 1, _FP_HEX), 16, 10)
            .cast("long")
            .alias("h"),
        )
    )
    key = F.col("h") * _POS_MOD + (F.lit(_POS_MOD - 1) - F.col("pos"))
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(-(WINNOW_W - 1), 0)
    )
    sel = (
        g.select(
            "doc_id",
            "pos",
            "m",
            F.min(key.alias("k")).over(w).alias("mk"),
        )
        .where(F.col("pos") >= F.least(F.lit(WINNOW_W), F.col("m")))
        .select(
            "doc_id",
            (F.lit(_POS_MOD - 1) - F.col("mk") % _POS_MOD).alias("fp_pos"),
            # integer div, NOT `/`: float division of a 60-bit packed
            # key would round above 2^53
            F.expr(f"mk div {_POS_MOD}").alias("fp"),
        )
        .distinct()
    )
    return sel


def _sql_fp40(expr: str) -> str:
    """DuckDB mirror of the 40-bit md5-prefix fingerprint — digit-wise
    hex decode with double powers (exact below 2^53), one BIGINT cast
    (same scheme as trainprep._sql_fp48, narrowed to 10 digits)."""
    return (
        f"CAST(list_sum(list_transform(range(1, {_FP_HEX + 1}), j -> "
        f"(strpos('0123456789abcdef', substr(md5({expr}), j, 1)) - 1) "
        f"* 16 ^ ({_FP_HEX} - j))) AS BIGINT)"
    )


SQL_DOC_WINNOW = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id,
         greatest(len(t) - {WINNOW_GRAM_N - 1}, 0) AS m,
         unnest(generate_series(1, greatest(len(t) - {WINNOW_GRAM_N - 1}, 0))) AS pos,
         unnest([{_sql_fp40(f"array_to_string(t[i:i+{WINNOW_GRAM_N - 1}], ' ')")}
                 for i in generate_series(1, greatest(len(t) - {WINNOW_GRAM_N - 1}, 0))]) AS h
  FROM t
),
k AS (
  SELECT doc_id, pos, m,
         MIN(h * {_POS_MOD} + ({_POS_MOD - 1} - pos)) OVER (
           PARTITION BY doc_id ORDER BY pos
           ROWS BETWEEN {WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS mk
  FROM g
)
SELECT DISTINCT doc_id,
       {_POS_MOD - 1} - (mk % {_POS_MOD}) AS fp_pos,
       mk // {_POS_MOD} AS fp
FROM k WHERE pos >= least({WINNOW_W}, m)
"""


# --------------------------------------------------------------------
# inverted_index
# --------------------------------------------------------------------

POSTINGS_CAP = 8  # doc ids retained per posting list (smallest-first)


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus inverted index: per term, the document frequency (df),
    total occurrence count (tf), and a bounded posting list — the
    first ``POSTINGS_CAP`` doc_ids ascending, comma-joined. The
    retrieval-side artifact of a corpus build (term lookup, df-based
    stopword discovery, seed postings for BM25), where
    ``tfidf_top_terms`` ranks terms per document.

    Scale shape: the posting list is CAPPED BEFORE aggregation — a
    per-term row_number over the distinct (term, doc) pairs keeps
    ≤ ``POSTINGS_CAP`` rows per term ahead of the collect, and Spark's
    WindowGroupLimit pushes that rank filter below the exchange, so a
    stopword's million-document posting list never materializes on one
    task (the classic inverted-index skew trap; full postings would be
    written sharded-by-(term, bucket), same keys, no collect). df and
    tf come from map-side-combinable counts; the three term-keyed
    aggregates co-partition, so AQE plans the final joins without an
    extra shuffle of anything corpus-sized.
    """
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    tf = d.groupBy("term").agg(F.count("*").alias("tf"))
    pairs = d.distinct()
    df = pairs.groupBy("term").agg(F.count("*").alias("df"))
    w = Window.partitionBy("term").orderBy("doc_id")
    postings = (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= POSTINGS_CAP)
        .groupBy("term")
        .agg(
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias(
                "postings"
            )
        )
    )
    # every side is vocabulary-sized — which GROWS with the corpus
    # (typos, ids, rare tokens), so none may be broadcast-elected
    # (the §45 rule); all three aggs share the term partitioning
    return (
        df.join(tf.hint("shuffle_hash"), "term")
        .join(postings.hint("shuffle_hash"), "term")
        .select("term", "df", "tf", "postings")
    )


SQL_INVERTED_INDEX = f"""
WITH occ AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
pairs AS (SELECT DISTINCT term, doc_id FROM occ),
tf AS (SELECT term, COUNT(*) AS tf FROM occ GROUP BY term),
df AS (SELECT term, COUNT(*) AS df FROM pairs GROUP BY term),
capped AS (
  SELECT term, doc_id FROM (
    SELECT term, doc_id,
           ROW_NUMBER() OVER (PARTITION BY term ORDER BY doc_id) AS rn
    FROM pairs
  ) WHERE rn <= {POSTINGS_CAP}
),
p AS (
  SELECT term, string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
  FROM capped GROUP BY term
)
SELECT term, df.df, tf.tf, p.postings
FROM df JOIN tf USING (term) JOIN p USING (term)
"""


# --------------------------------------------------------------------
# changepoint_cusum
# --------------------------------------------------------------------


def q_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer CUSUM changepoint detection over the order stream:
    order each customer's orders by (date, key), and find the split
    position that maximizes the scaled CUSUM deviation
    ``|n·S_i − i·S_n|`` (S = prefix sums of the order totals in
    cents) — the single-changepoint estimator for a level shift in
    spend, the distribution-shift probe next to ``anomaly_zscore``'s
    pointwise outliers. Returns (custkey, n_orders, split_pos, dev)
    for customers with ≥ 2 orders; ties go to the earliest split.

    Exactness: the textbook statistic ``|S_i − (i/n)·S_n|`` is scaled
    by n so it stays in integers — cents are int64 via the decimal
    cast (the relational8 rule), prefix sums are exact int64 window
    sums (max |n·S_i| ≈ n²·maxprice·100 < 2^63 for n ≤ ~10⁶ orders
    per customer), and the argmax is an integer sort (dev DESC, i ASC)
    — nothing for two engines to round differently.

    Plan: ONE shuffle on custkey serves both window passes (prefix sum
    and whole-partition totals share the partitioning) and the
    row_number argmax — three window functions, zero joins, zero UDFs;
    at 100 TB this is a scan plus a customer-keyed exchange.
    """
    return cusum_changepoints(
        load_table(spark, sf_dir, "orders").select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            (F.col("o_totalprice").cast("decimal(18,8)") * 100)
            .cast("long")
            .alias("cents"),
        )
    )


def cusum_changepoints(o: DataFrame) -> DataFrame:
    """The input-pluggable CUSUM core: (o_custkey, o_orderkey,
    o_orderdate, cents) in, the per-customer best split out."""
    order = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    whole = Window.partitionBy("o_custkey")
    pre = o.select(
        "o_custkey",
        F.row_number().over(order).alias("i"),
        F.sum("cents").over(order.rowsBetween(Window.unboundedPreceding, 0)).alias("s_i"),
        F.count("*").over(whole).alias("n"),
        F.sum("cents").over(whole).alias("s_n"),
    )
    dev = pre.where((F.col("n") >= 2) & (F.col("i") < F.col("n"))).select(
        "o_custkey",
        "i",
        "n",
        F.abs(F.col("n") * F.col("s_i") - F.col("i") * F.col("s_n")).alias("d"),
    )
    best = Window.partitionBy("o_custkey").orderBy(F.desc("d"), "i")
    return (
        dev.withColumn("rn", F.row_number().over(best))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("n").alias("n_orders"),
            F.col("i").alias("split_pos"),
            F.col("d").alias("dev"),
        )
    )


SQL_CHANGEPOINT_CUSUM = """
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(CAST(o_totalprice AS DECIMAL(18,8)) * 100 AS BIGINT) AS cents
  FROM orders
),
pre AS (
  SELECT o_custkey,
         ROW_NUMBER() OVER w AS i,
         SUM(cents) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_i,
         COUNT(*) OVER (PARTITION BY o_custkey) AS n,
         SUM(cents) OVER (PARTITION BY o_custkey) AS s_n
  FROM o
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
),
dev AS (
  SELECT o_custkey, i, n,
         CAST(abs(n * s_i - i * s_n) AS BIGINT) AS d
  FROM pre WHERE n >= 2 AND i < n
)
SELECT o_custkey, n AS n_orders, CAST(i AS INT) AS split_pos, d AS dev
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY d DESC, i) AS rn
  FROM dev
) WHERE rn = 1
"""


# --------------------------------------------------------------------
# winnow_overlap
# --------------------------------------------------------------------

OVERLAP_MIN_SHARED = 2  # fingerprints two docs must share to pair
OVERLAP_FP_MAX_DF = 16  # fingerprints in more docs than this are boilerplate


def q_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The application of ``doc_winnow``: document pairs sharing at
    least ``OVERLAP_MIN_SHARED`` selected fingerprints — the
    MOSS-style plagiarism/quotation detector. By the winnowing
    guarantee every shared span of ≥ WINNOW_W + WINNOW_GRAM_N − 1
    words contributes an identical selected fingerprint to both
    documents, so overlap detection is an EQUALITY join on
    fingerprints, never an all-pairs comparison. Returns
    (doc_a, doc_b, n_shared, n_a, n_b) — the shared count plus each
    side's total distinct fingerprints, the exact integer parts of
    the containment ratios (num/den rule; no float ratio column).

    Skew control, the standard two-sided split: fingerprints present
    in more than ``OVERLAP_FP_MAX_DF`` documents are BOILERPLATE
    (templates, licence headers) — they would pair everything with
    everything (df² growth) while carrying no pairwise signal, and
    corpus-wide repetition is ``dedup_passages``'s job. The df cap
    bounds the pair fan-out per fingerprint at df² ≤ 256; every join
    side is corpus-proportional and shuffle_hash-pinned (§45).
    """
    from ..sources.catalog import load_table

    # localCheckpoint: four consumers (df table, both join sides,
    # totals) would otherwise each recompute the whole winnowing
    # window pass — the loop-frame rule, not a cache
    sel = (
        winnow_fingerprints(
            load_table(spark, sf_dir, "documents").select("doc_id", "text")
        )
        .select("doc_id", "fp")
        .distinct()
        .localCheckpoint()
    )
    df_ok = (
        sel.groupBy("fp")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") <= OVERLAP_FP_MAX_DF)
        .select("fp")
    )
    live = sel.join(df_ok.hint("shuffle_hash"), "fp", "left_semi")
    totals = sel.groupBy("doc_id").agg(F.count("*").alias("n_fp"))
    a = live.select(F.col("doc_id").alias("doc_a"), "fp")
    b = live.select(F.col("doc_id").alias("doc_b"), "fp")
    pairs = (
        a.join(b.hint("shuffle_hash"), "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= OVERLAP_MIN_SHARED)
    )
    ta = totals.select(F.col("doc_id").alias("doc_a"), F.col("n_fp").alias("n_a"))
    tb = totals.select(F.col("doc_id").alias("doc_b"), F.col("n_fp").alias("n_b"))
    return (
        pairs.join(ta.hint("shuffle_hash"), "doc_a")
        .join(tb.hint("shuffle_hash"), "doc_b")
        .select("doc_a", "doc_b", "n_shared", "n_a", "n_b")
    )


SQL_WINNOW_OVERLAP = f"""
WITH w AS MATERIALIZED ({SQL_DOC_WINNOW}),
sel AS (SELECT DISTINCT doc_id, fp FROM w),
ok AS (SELECT fp FROM sel GROUP BY fp HAVING COUNT(*) <= {OVERLAP_FP_MAX_DF}),
live AS (SELECT sel.doc_id, sel.fp FROM sel SEMI JOIN ok USING (fp)),
totals AS (SELECT doc_id, COUNT(*) AS n_fp FROM sel GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_shared
  FROM live a JOIN live b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
  HAVING COUNT(*) >= {OVERLAP_MIN_SHARED}
)
SELECT doc_a, doc_b, n_shared, ta.n_fp AS n_a, tb.n_fp AS n_b
FROM pairs
JOIN totals ta ON ta.doc_id = doc_a
JOIN totals tb ON tb.doc_id = doc_b
"""


# Graded lane contribution: all four are NEW in round 7 (third wave)
# and grade immediately — never-graded-first, the rotation rule.
QUERIES = [
    Query(
        "doc_winnow",
        q_doc_winnow,
        SQL_DOC_WINNOW,
        ("llm", "text", "window", "fingerprint"),
        bench=True,  # the new explode+window fingerprint lane, timed
    ),
    Query(
        "inverted_index",
        q_inverted_index,
        SQL_INVERTED_INDEX,
        ("llm", "text", "retrieval"),
    ),
    Query(
        "changepoint_cusum",
        q_changepoint_cusum,
        SQL_CHANGEPOINT_CUSUM,
        ("relational", "timeseries", "window"),
    ),
    Query(
        "winnow_overlap",
        q_winnow_overlap,
        SQL_WINNOW_OVERLAP,
        ("llm", "text", "fingerprint", "dedup"),
    ),
]

EXTRA_QUERIES: list[Query] = []
