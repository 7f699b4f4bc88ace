from octopusdb_spark.kv.column_family import ColumnFamily
from octopusdb_spark.kv.manifest import EpochFencedError, ManifestConflictError
from octopusdb_spark.kv.store import (
    Entry,
    KVStore,
    Snapshot,
    StaleWriterError,
    StoreLockedError,
)

__all__ = [
    "ColumnFamily",
    "Entry",
    "EpochFencedError",
    "KVStore",
    "ManifestConflictError",
    "Snapshot",
    "StaleWriterError",
    "StoreLockedError",
]
