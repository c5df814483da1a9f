"""Benchmark harness: headline queries at the bench scale factor.

Runs every ``bench=True`` registry query against
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": <total_sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is fully materialized through the ``noop`` sink (forces
end-to-end execution including shuffles, without paying sink I/O or
driver collection). Each query gets one untimed warm-up run before two
timed runs (min taken), so numbers reflect steady state rather than
per-plan codegen compilation or a stray GC pause (fixed costs that
vanish at scale). ``spark.catalog.clearCache()`` runs before EVERY run
(warm-up and timed): some operators ``.cache()`` shared subtrees
(dedup_fuzzy's exact reference set, the minhash/simhash shingle
tables), and Spark's CacheManager matches canonicalized plans — so
without the clear, the warm-up would populate a cache the timed runs
silently read, and the timing would exclude the dominant build. With
it, "no run is ever faster than the real plan" holds again.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_ingestion_s3_to_parquet_spark.plans.registry import (
    BENCH_ONLY,
    EXTRA,
    REGISTRY,
)
from data_ingestion_s3_to_parquet_spark.session import get_spark


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_queries = {
        n: q
        for n, q in {**REGISTRY, **EXTRA, **BENCH_ONLY}.items()
        if q.bench
    }

    # warm-up: JVM/codegen/parquet-footer caches (merged lookup so the
    # warm-up survives graded/EXTRA rotations of scan_parquet)
    materialize({**REGISTRY, **EXTRA}["scan_parquet"].fn(spark, sf_dir))

    # Per-query: one untimed warm-up run, then the timed run. Warm
    # steady-state is the honest 100 TB proxy — whole-stage-codegen
    # compilation (1-3s per distinct plan) is a fixed cost amortized
    # over minutes of execution at scale, but at sf0.1 it would be
    # 3-5x the actual query time and would drown real regressions.
    # Min of two timed runs: single timed runs showed rare 5-10x
    # outliers from JIT/GC pauses in the shared local JVM; min-of-2 is
    # the steady-state estimator robust to those while staying honest
    # (no run is ever faster than the real plan — see module docstring
    # on clearCache).
    timings: dict[str, float] = {}
    for name, q in bench_queries.items():
        spark.catalog.clearCache()
        materialize(q.fn(spark, sf_dir))
        best = float("inf")
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            materialize(q.fn(spark, sf_dir))
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    # the reference's canonical workload: scan -> project -> parquet
    # write (real sink I/O, not noop), per SURVEY.md §2A A3+A5+A6.
    # Same warm-up + min-of-2 protocol as the noop-sink queries — a
    # single cold run was exposed to disk noise (1.31 s vs 2.15 s
    # across rounds on an unchanged plan).
    import tempfile

    def etl_run(out: str) -> None:
        (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select(
                "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice",
                "l_discount", "l_returnflag", "l_linestatus", "l_shipdate",
            )
            .write.mode("overwrite")
            .parquet(out)
        )

    with tempfile.TemporaryDirectory() as tmp:
        etl_run(f"{tmp}/warmup")
        best = float("inf")
        for i in range(2):
            t0 = time.perf_counter()
            etl_run(f"{tmp}/out{i}")
            best = min(best, time.perf_counter() - t0)
        timings["etl_scan_project_write"] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
