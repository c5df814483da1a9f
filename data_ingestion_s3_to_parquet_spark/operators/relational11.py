"""Round-8 second wave: columnar-format interop, autocorrelation,
CCNet perplexity bucketing, and Z-order layout cells.

- ``orc_interop``   parquet → ORC → read-back → exact aggregate: the
                    second-columnar-format interop lane. Spark ships a
                    native vectorized ORC reader/writer next to
                    parquet; the reference's sink surface is parquet
                    only (``/root/reference/src/main.rs`` stages 8-9),
                    so this is the format axis a real lakehouse
                    migration needs. Exactness is the point of the
                    aggregate: every value that crossed the ORC
                    boundary is folded into integer-cent sums, so one
                    flipped bit anywhere in the roundtrip fails the
                    oracle.
- ``acf_lags``      autocorrelation of the daily order-count series at
                    lags 1..3 — the seasonality/persistence probe next
                    to ``ewma_smooth``'s smoothing and
                    ``changepoint_cusum``'s level shifts. Pearson over
                    (count(t), count(t+L)) pairs on calendar-day
                    offsets; all sums are exact int64, the final ratio
                    is one pinned micro-quantized expression shared
                    verbatim by both engines.
- ``ccnet_buckets`` CCNet-style perplexity bucketing (Wenzek et al.
                    2019, "CCNet: Extracting High Quality Monolingual
                    Datasets from Web Crawl Data"): per language,
                    NTILE(3) over the corpus-trained unigram-LM
                    fluency score (``lm_unigram_score``) splits the
                    corpus into head/middle/tail, the partition CCNet
                    uses to mix high-fluency web text. Output is the
                    per-(lang, bucket) corpus report.
- ``zorder_layout`` Morton/Z-order clustering key (Morton 1966) over
                    (customer, order-day) plus per-cell occupancy
                    stats — the multi-dimensional data-skipping layout
                    key behind OPTIMIZE ZORDER-style compaction.
                    Bit-interleaving is pure int64 arithmetic
                    (div/mod by powers of two), so the oracle is
                    bitwise.

Scale notes per operator live on the functions; none of the four adds
a corpus-proportional broadcast or a driver-side loop.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..artifacts import fixture_fingerprint
from ..plans.spec import Query
from ..sources.catalog import load_table

# --------------------------------------------------------------------
# orc_interop
# --------------------------------------------------------------------

# The reference's canonical projection, minus the line-level detail
# columns the aggregate never touches (ReadSchema on the ORC scan shows
# exactly these five).
ORC_COLS = (
    "l_orderkey",
    "l_quantity",
    "l_extendedprice",
    "l_returnflag",
    "l_linestatus",
)


def _sweep_stale_siblings(prefix: str, keep: str) -> None:
    """Remove superseded fingerprint generations of an interop copy
    (same prefix, different key) once they age past the artifacts
    grace period — the :mod:`..artifacts` decommission rule, minus the
    pointer file these write-once-overwrite dirs don't need. Without
    this, every fixture rewrite would strand one dir per lane in
    /tmp forever."""
    import shutil
    import time

    from ..artifacts import SWEEP_GRACE_SECONDS

    tmp = tempfile.gettempdir()
    now = time.time()
    for name in os.listdir(tmp):
        if not name.startswith(prefix) or name == keep:
            continue
        p = os.path.join(tmp, name)
        try:
            if now - os.path.getmtime(p) >= SWEEP_GRACE_SECONDS:
                shutil.rmtree(p, ignore_errors=True)
        except OSError:
            continue


def _orc_path(sf_dir: str) -> str:
    """Fingerprint-keyed ORC copy location under the system temp dir
    (the :mod:`..artifacts` identity rule: any rewrite of the fixture
    changes the path, so a stale copy can never satisfy the query)."""
    fp = fixture_fingerprint(sf_dir, "lineitem")
    name = f"spark_graft_orc_{fp}"
    _sweep_stale_siblings("spark_graft_orc_", name)
    return os.path.join(tempfile.gettempdir(), name)


def q_orc_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Columnar-format interop: project lineitem, write it as ORC,
    read the ORC copy back, and fold every surviving value into the
    pricing-summary aggregate. The oracle computes the same aggregate
    straight off the parquet fixture, so the comparison proves the
    ORC roundtrip preserved every row and every value bit-exactly
    (quantity/price via exact integer cents).

    Scale shape: the write is a map-only scan→project→encode (no
    shuffle; file-per-task, same as the parquet sink), the read-back
    aggregate is one map-side-combinable groupBy on a 6-value key.
    ORC and parquet are both splittable columnar formats with
    min/max stripe/row-group statistics, so the 100 TB data-skipping
    story carries over unchanged; Spark's ORC reader is vectorized
    (``spark.sql.orc.impl=native``). The write lands in a
    fixture-fingerprint-keyed temp dir (mode=overwrite), mirroring
    the artifact-identity discipline of :mod:`..artifacts`.
    """
    # NOT spread(), although the ORC encode runs on only the scan's 3
    # fixture partitions: measured at sf0.1 (r14, interleaved min-of-5)
    # the round-robin widen makes the lane 1.62 s → 1.80 s — the
    # repartition pass + exchange of every projected row costs more
    # than the extra encode parallelism returns. At real scale the scan
    # has many splits and per-task output files land in the 128 MB–1 GB
    # band via the input split size (guide §6).
    li = load_table(spark, sf_dir, "lineitem").select(*ORC_COLS)
    out = _orc_path(sf_dir)
    li.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.sum(F.expr("CAST(ROUND(l_quantity * 100, 0) AS BIGINT)")).alias(
            "qty_cents"
        ),
        F.sum(
            F.expr("CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)")
        ).alias("price_cents"),
    )


SQL_ORC_INTEROP = """
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       COUNT(DISTINCT l_orderkey) AS n_orders,
       CAST(SUM(CAST(ROUND(l_quantity * 100, 0) AS BIGINT)) AS BIGINT)
         AS qty_cents,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS price_cents
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------
# acf_lags
# --------------------------------------------------------------------

ACF_MAX_LAG = 3

# Pinned micro-quantized Pearson text, shared verbatim by both engines
# (the rank_bm25 / rank_fusion_rrf convention). CAST(1000000 AS DOUBLE)
# forces double arithmetic in Spark SQL, where a bare 1000000.0 literal
# is DECIMAL and divides differently. Zero-variance series (constant
# daily counts) NULL out instead of Inf (the corr_pearson lesson:
# DuckDB's CAST(ROUND(inf) AS BIGINT) raises, it doesn't mismatch).
_ACF_MICRO_EXPR = (
    "CASE WHEN n * sxx - sx * sx <= 0 OR n * syy - sy * sy <= 0 THEN NULL "
    "ELSE CAST(ROUND((CAST(1000000 AS DOUBLE) * (n * sxy - sx * sy)) / "
    "(SQRT(CAST(n * sxx - sx * sx AS DOUBLE)) * "
    "SQRT(CAST(n * syy - sy * sy AS DOUBLE))), 0) AS BIGINT) END"
)


def q_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of the daily order-count series at
    calendar lags 1..{ACF_MAX_LAG}: for each lag L, the Pearson
    correlation of (orders on day t, orders on day t+L) over all day
    pairs where both days exist.

    Fixed-point discipline: daily counts are exact ints, the six
    Pearson sufficient statistics (n, Σx, Σy, Σx², Σy², Σxy) are exact
    int64 (day counts are ~scale·60, squares ~10⁷ — five orders of
    magnitude inside int64 even at 1000× this fixture), and the final
    ratio is the one pinned micro-quantized double expression
    ``_ACF_MICRO_EXPR`` both engines evaluate verbatim.

    Scale shape: the raw table collapses to one row per day in the
    first map-side-combinable aggregate, so the lag self-join and
    everything after it run on a frame proportional to the CALENDAR
    (thousands of rows at any corpus size) — the standard trick that
    makes time-series statistics on 100 TB of events cheap. No
    windows, no global sort; the lag pairing is a calendar-offset
    equi-join on int epoch-days.
    """
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.select(
            F.datediff(
                F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
            ).alias("d")
        )
        .groupBy("d")
        .agg(F.count("*").alias("c"))
    )
    lags = spark.range(1, ACF_MAX_LAG + 1).select(
        F.col("id").cast("int").alias("lag")
    )
    a = daily.select(F.col("d").alias("da"), F.col("c").alias("x"))
    b = daily.select(F.col("d").alias("db"), F.col("c").alias("y"))
    pairs = a.crossJoin(F.broadcast(lags)).join(
        F.broadcast(b), F.col("db") == F.col("da") + F.col("lag")
    )
    agg = pairs.groupBy("lag").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    return agg.select(
        "lag",
        F.col("n").alias("n_pairs"),
        F.expr(_ACF_MICRO_EXPR).alias("acf_micro"),
    )


SQL_ACF_LAGS = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d,
         COUNT(*) AS c
  FROM orders GROUP BY 1
),
lags AS (SELECT lag FROM (VALUES {", ".join(f"({i})" for i in range(1, ACF_MAX_LAG + 1))}) AS t(lag)),
pairs AS (
  SELECT l.lag, a.c AS x, b.c AS y
  FROM daily a
  CROSS JOIN lags l
  JOIN daily b ON b.d = a.d + l.lag
),
agg AS (
  SELECT lag,
         COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(x * y) AS BIGINT) AS sxy
  FROM pairs GROUP BY lag
)
SELECT CAST(lag AS INT) AS lag,
       n AS n_pairs,
       {_ACF_MICRO_EXPR} AS acf_micro
FROM agg
"""


# --------------------------------------------------------------------
# ccnet_buckets
# --------------------------------------------------------------------

CCNET_N_BUCKETS = 3


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2019): per
    language, rank every document by the corpus-trained unigram-LM
    fluency score (``lm_unigram_score.avg_nll``, ascending — low =
    stereotypical, high = rare/garbled), NTILE(3) the ranking into
    head/middle/tail, and report per-(lang, bucket) document count,
    token mass, and the score range. CCNet keeps "head" (and samples
    "middle") when building training corpora; this operator is the
    partition that decision reads.

    Determinism: ``avg_nll`` is the fixed-point lane that is already
    bitwise-equal across engines, and the NTILE order is the total
    order (avg_nll, doc_id), so bucket boundaries cannot drift.
    NTILE's fill rule (earlier buckets one larger on non-divisible
    partitions) is the same in Spark and DuckDB.

    Scale shape: scoring is the lm lane (one token shuffle + broadcast
    vocab); the NTILE is one window sort PER LANGUAGE — at 100 TB the
    same partition comes from approx-quantile cutpoints (two passes,
    no sort) as CCNet itself does; the exact NTILE is the
    oracle-checkable fixture form of the same contract.
    """
    from .relational8 import q_lm_unigram_score

    lm = q_lm_unigram_score(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    j = lm.join(d, "doc_id")
    w = Window.partitionBy("lang").orderBy("avg_nll", "doc_id")
    t = j.select(
        "lang",
        "n_words",
        "avg_nll",
        F.ntile(CCNET_N_BUCKETS).over(w).alias("b"),
    )
    bucket = (
        F.when(F.col("b") == 1, "head")
        .when(F.col("b") == 2, "middle")
        .otherwise("tail")
    )
    return (
        t.select("lang", bucket.alias("bucket"), "n_words", "avg_nll")
        .groupBy("lang", "bucket")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_words").alias("n_tokens"),
            F.min("avg_nll").alias("min_nll"),
            F.max("avg_nll").alias("max_nll"),
        )
    )


def _sql_ccnet_buckets() -> str:
    # embedded verbatim (the rank_fusion_rrf convention) so the bucket
    # partition and the standalone lm score can never drift
    from .relational8 import SQL_LM_UNIGRAM_SCORE

    return f"""
WITH lm AS ({SQL_LM_UNIGRAM_SCORE}),
j AS (
  SELECT l.doc_id, l.n_words, l.avg_nll, d.lang
  FROM lm l JOIN documents d USING (doc_id)
),
t AS (
  SELECT lang, n_words, avg_nll,
         NTILE({CCNET_N_BUCKETS})
           OVER (PARTITION BY lang ORDER BY avg_nll, doc_id) AS b
  FROM j
)
SELECT lang,
       CASE WHEN b = 1 THEN 'head'
            WHEN b = 2 THEN 'middle'
            ELSE 'tail' END AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_tokens,
       MIN(avg_nll) AS min_nll,
       MAX(avg_nll) AS max_nll
FROM t
GROUP BY 1, 2
"""


# --------------------------------------------------------------------
# zorder_layout
# --------------------------------------------------------------------

ZORDER_BITS = 10  # per-dimension resolution: 1024 buckets
ZORDER_CELL_DIV = 1 << 12  # cell = z div 4096 → 256 coarse cells


def _zorder_interleave_expr(x: str, y: str, divop: str) -> str:
    """Bit-interleave text for two ``ZORDER_BITS``-bit nonnegative
    int64 columns: bit i of x lands at position 2i+1, bit i of y at
    2i. Pure div/mod-by-power-of-two arithmetic so the same semantics
    render for Spark (``div``) and DuckDB (``//``) with identical
    integer results."""
    terms = []
    for i in range(ZORDER_BITS):
        terms.append(f"((({x}) {divop} {1 << i}) % 2) * {1 << (2 * i + 1)}")
        terms.append(f"((({y}) {divop} {1 << i}) % 2) * {1 << (2 * i)}")
    return " + ".join(terms)


def zorder_key_py(x: int, y: int) -> int:
    """Pure-Python reference of the interleave (tests pin the SQL
    rendering against this)."""
    z = 0
    for i in range(ZORDER_BITS):
        z += ((x >> i) & 1) << (2 * i + 1)
        z += ((y >> i) & 1) << (2 * i)
    return z


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (customer, order-day),
    with per-cell occupancy stats: range-normalize both dimensions to
    ``ZORDER_BITS``-bit buckets, bit-interleave them into the Morton
    key z, and aggregate the 256 coarse cells (z div 4096) — order
    count, exact price mass, and the z range per cell.

    This is the layout key behind OPTIMIZE ZORDER-style multi-column
    compaction: sorting files by z keeps BOTH dimensions locally
    narrow in every file, so parquet/ORC min/max stats prune scans
    filtered on either column (Morton 1966; "Small Materialized
    Aggregates", Moerkotte VLDB'98 is the stats-pruning side). The
    cell histogram this query returns is exactly what a compactor
    reads to pick file split points. ``tests/test_operators.py``
    additionally pins the data-skipping claim end-to-end: writing
    z-sorted parquet yields per-file custkey ranges a fraction of the
    unsorted layout's.

    Scale shape: one 4-value aggregate for the bounds (broadcast back
    as a 1-row crossJoin — the constant-size-aggregate pattern of
    ``relational9``), then the keying is map-only int arithmetic and
    the cell rollup is one map-side-combinable groupBy on a 256-value
    key. No window, no sort, no corpus-proportional broadcast.
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ck"),
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
        ).alias("d"),
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
    )
    bounds = o.agg(
        F.min("ck").alias("min_ck"),
        F.max("ck").alias("max_ck"),
        F.min("d").alias("min_d"),
        F.max("d").alias("max_d"),
    )
    side = 1 << ZORDER_BITS
    xy = o.crossJoin(F.broadcast(bounds)).select(
        "cents",
        F.expr(
            f"CAST(((ck - min_ck) * {side}) div (max_ck - min_ck + 1)"
            " AS BIGINT)"
        ).alias("x"),
        F.expr(
            f"CAST(((d - min_d) * {side}) div (max_d - min_d + 1)"
            " AS BIGINT)"
        ).alias("y"),
    )
    z = xy.select(
        "cents", F.expr(_zorder_interleave_expr("x", "y", "div")).alias("z")
    )
    return (
        z.groupBy(F.expr(f"z div {ZORDER_CELL_DIV}").alias("cell"))
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("price_cents"),
            F.min("z").alias("min_z"),
            F.max("z").alias("max_z"),
        )
    )


SQL_ZORDER_LAYOUT = f"""
WITH o AS (
  SELECT o_custkey AS ck,
         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
),
bounds AS (
  SELECT MIN(ck) AS min_ck, MAX(ck) AS max_ck,
         MIN(d) AS min_d, MAX(d) AS max_d
  FROM o
),
xy AS (
  SELECT cents,
         CAST(((ck - min_ck) * {1 << ZORDER_BITS})
              // (max_ck - min_ck + 1) AS BIGINT) AS x,
         CAST(((d - min_d) * {1 << ZORDER_BITS})
              // (max_d - min_d + 1) AS BIGINT) AS y
  FROM o CROSS JOIN bounds
),
zt AS (
  SELECT cents, {_zorder_interleave_expr("x", "y", "//")} AS z FROM xy
)
SELECT z // {ZORDER_CELL_DIV} AS cell,
       COUNT(*) AS n_orders,
       CAST(SUM(cents) AS BIGINT) AS price_cents,
       MIN(z) AS min_z,
       MAX(z) AS max_z
FROM zt
GROUP BY 1
"""


# --------------------------------------------------------------------
# jsonl_interop (EXTRA lane)
# --------------------------------------------------------------------

# Plain exchange types only: ints and a short string. Monetary values
# quantize to exact cents BEFORE serialization so the text roundtrip
# carries integers, and the date flattens to int epoch-days — JSON
# interchange discipline: never round-trip a float or a timestamp
# through text when an exact integer encoding exists.
JSONL_SCHEMA = (
    "o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,"
    " cents BIGINT, d INT"
)


def _jsonl_path(sf_dir: str) -> str:
    fp = fixture_fingerprint(sf_dir, "orders")
    name = f"spark_graft_jsonl_{fp}"
    _sweep_stale_siblings("spark_graft_jsonl_", name)
    return os.path.join(tempfile.gettempdir(), name)


def q_jsonl_interop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-delimited-JSON interop: project orders to exchange-safe
    types (exact cents, int epoch-days), write JSONL, read it back
    with an EXPLICIT schema, and fold every surviving value into an
    exact aggregate the oracle recomputes straight off parquet — the
    text-format twin of ``orc_interop``'s binary-format roundtrip.

    The read-back pins the schema rather than inferring it: schema
    inference is a second full pass over the data at scale AND lets a
    single malformed line silently widen a column to string. Corrupt-
    line tolerance (PERMISSIVE + ``_corrupt_record``) is pinned in
    pytest with planted garbage lines; this graded lane checks the
    clean-path exactness.

    Scale shape: write and read are both map-only file-per-task
    passes (JSONL is splittable by lines); the aggregate is one
    map-side-combinable groupBy on the 3-value status key.
    """
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.expr("CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)").alias(
            "cents"
        ),
        F.datediff(
            F.to_date("o_orderdate"), F.to_date(F.lit("1970-01-01"))
        ).alias("d"),
    )
    out = _jsonl_path(sf_dir)
    o.write.mode("overwrite").json(out)
    back = spark.read.schema(JSONL_SCHEMA).json(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.sum("cents").alias("price_cents"),
        F.min("d").alias("min_day"),
        F.max("d").alias("max_day"),
    )


SQL_JSONL_INTEROP = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       COUNT(DISTINCT o_custkey) AS n_custs,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS price_cents,
       MIN(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS min_day,
       MAX(CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS max_day
FROM orders
GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------
# lm_bigram_score (EXTRA lane)
# --------------------------------------------------------------------

LM_BIGRAM_VOCAB = 1024

# 1-word documents produce no bigrams and drop out of the score on
# BOTH engines (inner explode). Spark's sequence(1, n) DESCENDS when
# n < 1, so the empty case must be guarded explicitly; DuckDB's
# generate_series is empty there already.
_BIGRAMS_EXPR = (
    "CASE WHEN size(t) < 2 THEN array() "
    "ELSE transform(sequence(1, size(t) - 1),"
    " i -> concat(element_at(t, i), ' ', element_at(t, i + 1))) END"
)


def q_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram surprisal scoring: per document, the mean negative log2
    JOINT frequency of its word bigrams under the corpus's top-V
    bigram distribution (V = {LM_BIGRAM_VOCAB}, count-ordered, ties by
    bigram text; unseen bigrams get the add-half pseudo-count) — the
    order-sensitive fluency signal next to ``lm_unigram_score``'s
    bag-of-words one. Word-salad text with a plausible vocabulary
    (which unigram scoring cannot see through) scores poorly here
    because its ADJACENCIES are rare; that gap between the two scores
    is itself a quality feature (CCNet-style LM filtering, Wenzek et
    al. 2019, at the fixture-honest n-gram order).

    Same fixed-point discipline as the unigram lane (which pinned it
    the hard way at sf0.1): per-bigram nll quantized to integer
    micro-nll, summed exactly in int64, one half-up integer division
    for the mean. Scale shape identical too: one map-side-combinable
    bigram count, a count-ordered LIMIT for the top-V table, one
    broadcast of the fixed-size vocab onto the bigram stream, one
    doc_id shuffle for the per-doc mean.
    """
    d = load_table(spark, sf_dir, "documents")
    bigrams = d.select(
        "doc_id", F.split("text", " ").alias("t")
    ).select("doc_id", F.explode(F.expr(_BIGRAMS_EXPR)).alias("bg"))
    cnt = bigrams.groupBy("bg").agg(F.count("*").alias("c"))
    total = cnt.agg(F.sum("c").alias("n_total"))
    vocab = cnt.orderBy(F.desc("c"), "bg").limit(LM_BIGRAM_VOCAB)
    scored = (
        bigrams.join(F.broadcast(vocab), "bg", "left")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.col("c").isNull().alias("oov"),
            F.round(
                -F.log2(
                    F.coalesce(F.col("c").cast("double"), F.lit(0.5))
                    / F.col("n_total")
                )
                * 1_000_000,
                0,
            )
            .cast("long")
            .alias("micro_nll"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum(F.col("oov").cast("int")).alias("n_oov"),
            F.sum("micro_nll").alias("s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_oov",
            (
                F.expr("(2 * s + n_bigrams) div (2 * n_bigrams)").cast(
                    "double"
                )
                / F.lit(1_000_000.0)
            ).alias("avg_nll"),
        )
    )


SQL_LM_BIGRAM_SCORE = f"""
WITH bg AS (
  SELECT doc_id,
         unnest([t[i] || ' ' || t[i+1]
                 for i in generate_series(1, len(t) - 1)]) AS bg
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
cnt AS (SELECT bg, COUNT(*) AS c FROM bg GROUP BY bg),
tot AS (SELECT SUM(c) AS n_total FROM cnt),
vocab AS (SELECT bg, c FROM cnt ORDER BY c DESC, bg LIMIT {LM_BIGRAM_VOCAB}),
scored AS (
  SELECT b.doc_id,
         v.c IS NULL AS oov,
         CAST(ROUND(-log2(COALESCE(CAST(v.c AS DOUBLE), 0.5) / t.n_total)
                    * 1000000, 0) AS BIGINT) AS micro_nll
  FROM bg b LEFT JOIN vocab v USING (bg) CROSS JOIN tot t
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
         SUM(micro_nll) AS s
  FROM scored GROUP BY doc_id
)
SELECT doc_id, n_bigrams, n_oov,
       CAST((2 * s + n_bigrams) // (2 * n_bigrams) AS DOUBLE) / 1000000.0
         AS avg_nll
FROM agg
"""


# --------------------------------------------------------------------
# eval_auc (EXTRA lane)
# --------------------------------------------------------------------

AUC_POS_LANG = "en"

# 2U is an exact integer (ties contribute half wins, doubled away);
# the only division is the final pinned micro-quantized expression.
_AUC_MICRO_EXPR = (
    "CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL "
    "ELSE CAST(ROUND((CAST(1000000 AS DOUBLE) * u2)"
    " / (2 * n_pos * n_neg), 0) AS BIGINT) END"
)


def q_eval_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC (Mann-Whitney U with midrank tie handling) of the
    unigram-LM fluency score as a detector for ``AUC_POS_LANG``
    documents — the model-evaluation primitive every
    classifier/quality-filter pipeline needs next to the scoring lanes
    themselves. 2U is computed exactly in int64 (ties contribute half
    wins, doubled away): per distinct score s,
    ``2U += n_pos(s) · (2 · n_neg(below s) + n_neg(s))``.

    On this synthetic corpus every language shares one word
    distribution, so the measured AUC sits near chance — the graded
    value is the exact rank machinery, not the (deliberately
    uninformative) fixture signal; the pytest plants a separable
    corpus and pins AUC = 1, 0, and a hand-computed tied case.

    Scale shape: the corpus collapses to the DISTINCT-SCORE histogram
    in one map-side-combinable aggregate, and the prefix sum runs over
    that bounded frame (micro-quantized scores ⇒ at most ~1e7 distinct
    values at ANY corpus size; here far fewer) — rank statistics
    without ranking the corpus. No row-level window, no global sort of
    the data. Exactness bound: 2U ≤ 2·n_pos·n_neg must fit int64, so
    the EXACT path holds to ~2·10⁹ documents per class; past that the
    same histogram feeds the identical formula with double
    accumulators (AUC to ~1e-9, far inside the micro quantum) — the
    overflow point is a documented constant, not a silent wrap at
    fixture scale.
    """
    from .relational8 import q_lm_unigram_score

    lm = q_lm_unigram_score(spark, sf_dir).select("doc_id", "avg_nll")
    lab = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == AUC_POS_LANG).alias("pos")
    )
    j = lm.join(lab, "doc_id")
    hist = j.groupBy(F.col("avg_nll").alias("score")).agg(
        F.sum(F.col("pos").cast("long")).alias("np"),
        F.sum((~F.col("pos")).cast("long")).alias("nn"),
    )
    w = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, -1
    )
    contrib = hist.select(
        "np",
        "nn",
        (
            F.col("np")
            * (
                2 * F.coalesce(F.sum("nn").over(w), F.lit(0))
                + F.col("nn")
            )
        ).alias("c"),
    )
    agg = contrib.agg(
        F.sum("np").alias("n_pos"),
        F.sum("nn").alias("n_neg"),
        F.sum("c").alias("u2"),
    )
    return agg.select(
        "n_pos", "n_neg", "u2", F.expr(_AUC_MICRO_EXPR).alias("auc_micro")
    )


def _sql_eval_auc() -> str:
    from .relational8 import SQL_LM_UNIGRAM_SCORE

    return f"""
WITH lm AS ({SQL_LM_UNIGRAM_SCORE}),
j AS (
  SELECT l.avg_nll AS score, (d.lang = '{AUC_POS_LANG}') AS pos
  FROM lm l JOIN documents d USING (doc_id)
),
hist AS (
  SELECT score,
         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS np,
         CAST(SUM(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS nn
  FROM j GROUP BY score
),
contrib AS (
  SELECT np, nn,
         np * (2 * COALESCE(SUM(nn) OVER (ORDER BY score
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + nn) AS c
  FROM hist
),
agg AS (
  SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
         CAST(SUM(nn) AS BIGINT) AS n_neg,
         CAST(SUM(c) AS BIGINT) AS u2
  FROM contrib
)
SELECT n_pos, n_neg, u2, {_AUC_MICRO_EXPR} AS auc_micro FROM agg
"""


# --------------------------------------------------------------------
# Registration: round-8 second wave, never-graded-first (this module
# sits ahead of relational10 in the registry order). chunk_text /
# basket_pairs / period_growth / ab_test_metrics (all green r6+r7)
# demoted to relational9's EXTRA lane one-for-one. jsonl_interop
# arrived after the wave's swap with no multi-green veteran left to
# demote, so it LEADS the EXTRA lane per the documented convention
# (new entries grade first under a larger budget or the next swap).
# --------------------------------------------------------------------

# eval_auc (multi-green r8-r11) demoted in the round-12 SEVENTH wave
# for the new bootstrap_ci_mean (relational18); it leads this
# module's EXTRA lane.
QUERIES = []

# Round-10 third wave demoted the double-green r8+r9 orc_interop /
# acf_lags / ccnet_buckets here, trading their graded slots for the
# new bpe_fertility / compaction_plan / privacy_ldiv (relational14);
# all keep their oracles, bench flags, and local-sweep coverage.
EXTRA_QUERIES: list[Query] = [
    Query(
        "eval_auc",
        q_eval_auc,
        _sql_eval_auc(),
        ("llm", "evaluation", "statistics"),
    ),
    Query(
        "lm_bigram_score",
        q_lm_bigram_score,
        SQL_LM_BIGRAM_SCORE,
        ("llm", "text", "quality"),
    ),
    Query(
        "jsonl_interop",
        q_jsonl_interop,
        SQL_JSONL_INTEROP,
        ("relational", "etl", "format", "sink"),
    ),
    Query(
        "ccnet_buckets",
        q_ccnet_buckets,
        _sql_ccnet_buckets(),
        ("llm", "text", "quality", "mixing"),
    ),
    Query(
        "zorder_layout",
        q_zorder_layout,
        SQL_ZORDER_LAYOUT,
        ("relational", "layout", "data-skipping"),
    ),
    Query(
        "orc_interop",
        q_orc_interop,
        SQL_ORC_INTEROP,
        ("relational", "etl", "format", "sink"),
        bench=True,  # the second real-sink I/O lane next to parquet ETL
    ),
    Query(
        "acf_lags",
        q_acf_lags,
        SQL_ACF_LAGS,
        ("relational", "timeseries", "statistics"),
    ),
]
