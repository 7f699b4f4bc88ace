"""octopusdb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of zach030/OctopusDB.

The reference (/root/reference) is a single-node WiscKey-style versioned
key-value LSM store (see SURVEY.md). This package re-expresses its semantics
Spark-first:

- ``kv``        — versioned KV tables as Parquet segments + manifest
                  (set/get/delete/scan/TTL, value separation, compaction, GC).
- ``queries``   — the declarative query surface registered with the driver
                  harness: KV semantics, relational ops, graph ops, and the
                  LLM-data-pipeline extensions (dedup/similarity/text).
- ``functions`` — reusable column expressions (text stats, vector math).
- ``streaming`` — Structured Streaming ingest into the KV layout.

Everything is DataFrame-declarative so Catalyst/Tungsten pick physical plans;
no RDDs, no driver-side row loops on data paths.
"""

__version__ = "0.1.0"

from octopusdb_spark.db import Iterator, OctopusDB
from octopusdb_spark.functions.ann_index import build_ivf, query_ivf
from octopusdb_spark.functions.graph_algos import connected_components, pagerank
from octopusdb_spark.kv.store import Entry, KVStore
from octopusdb_spark.session import get_spark
from octopusdb_spark.sources.io import save_bucketed
from octopusdb_spark.streaming.ingest import ingest_stream_to_kv
from octopusdb_spark.streaming.rollup import ContinuousRollup, maintain_rollup_stream

__all__ = [
    "OctopusDB",
    "Iterator",
    "KVStore",
    "Entry",
    "get_spark",
    "pagerank",
    "connected_components",
    "build_ivf",
    "query_ivf",
    "save_bucketed",
    "ingest_stream_to_kv",
    "ContinuousRollup",
    "maintain_rollup_stream",
    "__version__",
]
