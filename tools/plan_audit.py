"""Plan-property audit: one line of physical-plan evidence per query.

For every registry query (graded + EXTRA + BENCH_ONLY) this prints the
scale-relevant plan properties the docstrings claim, so a reviewer can
check them in one command instead of reading 65 `.explain` dumps:

- exchanges (shuffle count), broadcast joins, sort-merge/shuffle-hash
  joins, WindowGroupLimit, TakeOrderedAndProject
- whether the parquet scan carries pushed filters
- python-boundary nodes (ArrowEvalPythonUDTF / MapInPandas / pandas
  UDF evals) — the deliberate Arrow crossings

Usage::

    python tools/plan_audit.py [--sf /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import re
import sys

sys.path.insert(0, ".")

from data_ingestion_s3_to_parquet_spark.plans.registry import (  # noqa: E402
    BENCH_ONLY,
    EXTRA,
    REGISTRY,
)
from data_ingestion_s3_to_parquet_spark.session import get_spark  # noqa: E402


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def audit(df) -> dict[str, object]:
    plan = plan_of(df)

    # count only the numbered detail headers so tree + detail sections
    # don't double-count each node
    def n(node_pattern: str) -> int:
        return len(re.findall(rf"\(\d+\) {node_pattern}", plan))

    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    return {
        "exchanges": n("Exchange"),
        "bcast_join": n("Broadcast(?:Hash|NestedLoop)Join"),
        "smj_shj": n("(?:SortMergeJoin|ShuffledHashJoin)"),
        "wgl": n("WindowGroupLimit"),
        "topk": n("TakeOrderedAndProject"),
        "python": n(
            "(?:ArrowEvalPython|BatchEvalPython|MapInPandas|FlatMapGroupsInPandas)"
        ),
        "pushed": sum(1 for p in pushed if p.strip()),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    queries = {**REGISTRY, **EXTRA, **BENCH_ONLY}
    names = args.names or list(queries)

    spark = get_spark("plan_audit")
    spark.sparkContext.setLogLevel("ERROR")

    hdr = ("query", "exch", "bcast", "smj/shj", "wgl", "topk", "py", "pushed")
    print("%-24s %5s %6s %8s %4s %5s %3s %7s" % hdr)
    for name in names:
        q = queries[name]
        try:
            a = audit(q.fn(spark, args.sf))
            print(
                "%-24s %5d %6d %8d %4d %5d %3d %7d"
                % (
                    name,
                    a["exchanges"],
                    a["bcast_join"],
                    a["smj_shj"],
                    a["wgl"],
                    a["topk"],
                    a["python"],
                    a["pushed"],
                )
            )
        except Exception as exc:  # pragma: no cover - diagnostic tool
            print(f"{name:<24} ERROR {type(exc).__name__}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
