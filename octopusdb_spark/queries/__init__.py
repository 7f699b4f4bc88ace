"""Query registry: merges every query module's (spark_fn, oracle_sql) pairs.

``REGISTRY`` maps name -> callable(spark, sf_dir) -> DataFrame.
``ORACLE_SQL`` maps name -> DuckDB SQL string (absent = rows-only check).
"""

from __future__ import annotations

from importlib import import_module

_MODULES = [
    "octopusdb_spark.queries.kv_semantics",
    "octopusdb_spark.queries.relational",
    "octopusdb_spark.queries.tpch_extra",
    "octopusdb_spark.queries.advanced",
    "octopusdb_spark.queries.analytics_extra",
    "octopusdb_spark.queries.scale_patterns",
    "octopusdb_spark.queries.graph",
    "octopusdb_spark.queries.text",
    "octopusdb_spark.queries.dedup",
    "octopusdb_spark.queries.similarity",
    "octopusdb_spark.queries.multimodal",
    "octopusdb_spark.queries.quality",
]

REGISTRY: dict = {}
ORACLE_SQL: dict = {}

for _m in _MODULES:
    try:
        mod = import_module(_m)
    except ModuleNotFoundError:
        continue
    for name, fn in getattr(mod, "QUERIES", {}).items():
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name} in {_m}")
        REGISTRY[name] = fn
    ORACLE_SQL.update(getattr(mod, "ORACLES", {}))
