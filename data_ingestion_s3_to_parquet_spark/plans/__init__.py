"""Query plans: the registry binding each operator to its DuckDB oracle.

Import :mod:`.registry` directly for REGISTRY/queries/oracle_sql — it is
not re-exported here because operator modules import ``plans.spec``
while the registry imports the operator modules (keeping this __init__
minimal avoids the cycle).
"""

from .spec import Query  # noqa: F401
