from octopusdb_spark.kv.store import Entry, KVStore

__all__ = ["Entry", "KVStore"]
