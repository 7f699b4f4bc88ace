from octopusdb_spark.kv.store import Entry, KVStore, Snapshot

__all__ = ["Entry", "KVStore", "Snapshot"]
