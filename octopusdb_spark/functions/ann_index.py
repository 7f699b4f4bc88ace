"""Persistent IVF index: build once, query many.

The registry's `sim_ann_ivf` recomputes centroid assignment per query so a
DuckDB oracle can check it; this is the production lifecycle: `build_ivf`
materializes the coarse quantizer and the inverted lists to Parquet —
lists written partitioned BY centroid, so a probe reads only its lists'
files (partition pruning, the on-disk analog of an IVF index's posting
lists) — and `query_ivf` answers any query batch against the prebuilt
index without touching the full corpus.

Scale shape: build is one broadcast assignment pass + one partitioned
write, O(corpus). A query batch scores K centroids (broadcast), prunes to
nprobe lists (partition filter reaches the Parquet scan), and exact-scores
only those candidates — corpus I/O per query batch is nprobe/K of the
data, the IVF contract. K and nprobe tune recall vs. cost; deterministic
given the seed centroids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from octopusdb_spark.queries.similarity import _dot, _with_norm, kmeans_centroids


def build_ivf(
    emb_df: DataFrame,
    index_dir: str,
    n_centroids: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    kmeans_iters: int = 2,
) -> None:
    """Materialize the index: TRAINED centroids — deterministic seed (first
    n_centroids vectors by id) refined by ``kmeans_iters`` Lloyd rounds
    (see `kmeans_centroids`: decimal-mean update, fixed tie-breaks, no
    randomness) — plus inverted lists partitioned by centroid id. Pass
    ``kmeans_iters=0`` for the raw-seed quantizer. Training cost is
    iters × (one broadcast assignment pass + one (cent,dim)-keyed agg),
    O(corpus) per round."""
    emb = _with_norm(
        emb_df.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"))
    )
    w = Window.orderBy("vec_id")
    cent = (
        emb.orderBy("vec_id")
        .limit(n_centroids)
        .select(
            F.row_number().over(w).alias("cent_id"),
            F.col("embedding").alias("ct_emb"),
            F.col("norm").alias("ct_norm"),
        )
    )
    if kmeans_iters > 0:
        cent = kmeans_centroids(emb, cent, iters=kmeans_iters)
    cent.write.mode("overwrite").parquet(f"{index_dir}/centroids")
    cent_r = _read_centroids(emb.sparkSession, index_dir)
    assigned = (
        emb.crossJoin(F.broadcast(cent_r))
        .select(
            "vec_id",
            "embedding",
            "norm",
            "cent_id",
            (
                _dot(F.col("embedding"), F.col("ct_emb"))
                / (F.col("norm") * F.col("ct_norm"))
            ).alias("cos"),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("vec_id").orderBy(F.desc("cos"), F.asc("cent_id"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("cent_id", "vec_id", "embedding", "norm")
    )
    (
        assigned.repartition("cent_id")
        .write.mode("overwrite")
        .partitionBy("cent_id")
        .parquet(f"{index_dir}/lists")
    )


def _read_centroids(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(f"{index_dir}/centroids")


def query_ivf(
    spark: SparkSession,
    index_dir: str,
    queries_df: DataFrame,
    top_k: int = 5,
    nprobe: int = 2,
    id_col: str = "query_id",
    vec_col: str = "embedding",
    exclude_matching_ids: bool = False,
) -> DataFrame:
    """Answer a query batch from the prebuilt index: rank centroids per
    query (broadcast, K rows), keep nprobe, and exact-score only the rows
    of those inverted lists. The union of probed centroid ids (a tiny set,
    <= nprobe x queries) is collected and pushed as a LITERAL
    ``cent_id IN (...)`` filter, so list partitions prune statically at
    the Parquet scan — no reliance on dynamic partition pruning firing.
    Returns (query_id, cand_id, rank, cosine).

    ``exclude_matching_ids=True`` drops candidates whose corpus vec_id
    equals the query's id — ONLY meaningful when query ids are drawn from
    the corpus id space (self-match suppression for in-corpus queries).
    Leave False for external query batches: their ids are unrelated, and
    excluding a coincidental collision would silently drop a legitimate
    neighbor."""
    q = _with_norm(
        queries_df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("embedding"))
    ).select("query_id", F.col("embedding").alias("q_emb"), F.col("norm").alias("q_norm"))
    cent = _read_centroids(spark, index_dir)
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "q_emb",
            "q_norm",
            "cent_id",
            (_dot(F.col("q_emb"), F.col("ct_emb")) / (F.col("q_norm") * F.col("ct_norm"))).alias(
                "ccos"
            ),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("cent_id"))
            ),
        )
        .filter(F.col("rn") <= nprobe)
        .select("query_id", "q_emb", "q_norm", "cent_id")
    )
    # static partition pruning: the probed centroid set is tiny metadata
    # (never vectors) — collecting it lets the IN filter reach the scan
    probed_ids = [r["cent_id"] for r in probes.select("cent_id").distinct().collect()]
    lists = spark.read.parquet(f"{index_dir}/lists").filter(
        F.col("cent_id").isin(probed_ids)
    )
    scored = lists.join(F.broadcast(probes), "cent_id")
    if exclude_matching_ids:
        scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    scored = (
        scored
        .select(
            "query_id",
            F.col("vec_id").alias("cand_id"),
            (_dot(F.col("embedding"), F.col("q_emb")) / (F.col("norm") * F.col("q_norm"))).alias(
                "cos"
            ),
        )
        .dropDuplicates(["query_id", "cand_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select("query_id", "cand_id", "rank", F.round("cos", 6).alias("cosine"))
        .orderBy("query_id", "rank")
    )
