"""Query plans: the registry binding each operator to its DuckDB oracle."""

from .spec import Query  # noqa: F401
from .registry import REGISTRY, queries, oracle_sql  # noqa: F401
