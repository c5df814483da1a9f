"""Scale guards for the label-block-quadratic exact lanes (VERDICT r4 #5).

``dedup_embedding``, ``sim_join``, and the exact ``knn_graph`` generate
candidate pairs by joining within coarse label blocks. The block key
has ~8 values on these fixtures, so block size is LINEAR in corpus
size and pair generation is O(n²/8): exactly right as bitwise oracle
twins at fixture scale, fatally wrong if someone points them at a
production corpus. Each of those operators therefore counts its input
once (a column-pruned metadata-cheap scan) and REFUSES above
:data:`QUADRATIC_BLOCK_BOUND` rows with an error that names its
scale-safe LSH twin — failing loudly at plan time beats an executor
OOM three shuffles later. The bound is generous for every fixture SF
(2 000 embedding rows at sf0.1) and two orders of magnitude below
where the pair join would become a cluster-wide incident.

Override: callers that have ALREADY bounded block sizes upstream (for
example, feeding pre-bucketed candidates) can raise the bound via the
``SPARK_GRAFT_QUADRATIC_BOUND`` environment variable — an explicit,
greppable opt-in rather than a silent default.
"""

from __future__ import annotations

import os

QUADRATIC_BLOCK_BOUND = 250_000


def _bound() -> int:
    return int(
        os.environ.get("SPARK_GRAFT_QUADRATIC_BOUND", QUADRATIC_BLOCK_BOUND)
    )


# (sf_dir, table) → exact row count from parquet footers. The fixture
# files are immutable within a run, so the memo never invalidates; it
# exists so repeated invocations (bench warm-up + two timed runs) pay
# the footer read once.
_FIXTURE_ROWS: dict[tuple[str, str], int] = {}


def fixture_rows(sf_dir: str, table: str) -> int:
    """Exact row count of a fixture table from parquet FOOTER metadata.

    VERDICT r5 #5: the guard used to ``df.count()`` the widened
    (post-``spread``) frame — a full scan + shuffle job per invocation
    that doubled ``sim_join``'s bench time. The row count is a property
    of the INPUT, not of the plan, and parquet footers carry it exactly:
    read them driver-side with pyarrow (microseconds, zero Spark jobs).
    Handles both a single ``.parquet`` file and a directory of part
    files (the layout a real cluster writes).
    """
    key = (sf_dir, table)
    if key not in _FIXTURE_ROWS:
        import pyarrow.parquet as pq

        path = os.path.join(sf_dir, f"{table}.parquet")
        if os.path.isdir(path):
            n = sum(
                pq.read_metadata(os.path.join(root, f)).num_rows
                for root, _, files in os.walk(path)
                for f in files
                if f.endswith(".parquet")
            )
        else:
            n = pq.read_metadata(path).num_rows
        _FIXTURE_ROWS[key] = n
    return _FIXTURE_ROWS[key]


def guard_fixture_quadratic(
    sf_dir: str, table: str, op_name: str, twin: str
) -> None:
    """Refuse to run a label-block-quadratic lane on an oversized
    fixture table, naming the scale-safe twin. Metadata-cheap: reads
    parquet footers, runs no Spark job."""
    check_quadratic_rows(fixture_rows(sf_dir, table), op_name, twin)


def check_quadratic_rows(n_rows: int, op_name: str, twin: str) -> None:
    """Raise if ``n_rows`` is past the quadratic-lane bound, naming the
    scale-safe twin the caller should use instead."""
    bound = _bound()
    if n_rows > bound:
        raise ValueError(
            f"{op_name}: input has {n_rows} rows, above the "
            f"{bound}-row bound for label-block-quadratic exact pair "
            f"generation (O(n²/blocks) candidates). This lane exists as "
            f"the bitwise oracle twin at fixture scale — at this size, "
            f"use the scale-safe LSH lane `{twin}` instead, or raise "
            f"SPARK_GRAFT_QUADRATIC_BOUND if block sizes are already "
            f"bounded upstream."
        )


