from octopusdb_spark.kv.column_family import ColumnFamily
from octopusdb_spark.kv.store import Entry, KVStore, Snapshot, StaleWriterError

__all__ = ["ColumnFamily", "Entry", "KVStore", "Snapshot", "StaleWriterError"]
