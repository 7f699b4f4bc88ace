"""Persistent IVF index lifecycle: build once, query many, partition-pruned
probes, pinned recall vs. the exact brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from octopusdb_spark.functions.ann_index import build_ivf, query_ivf
from octopusdb_spark.queries.similarity import q_sim_topk_cosine


def test_ivf_index_build_query_recall(spark, sf_dir, tmp_path):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    build_ivf(emb, idx, n_centroids=8)

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # in-corpus queries: opt into self-match suppression
    got = query_ivf(spark, idx, queries, top_k=5, nprobe=2, exclude_matching_ids=True).collect()
    assert {r["query_id"] for r in got} == set(range(5))
    for r in got:
        assert r["cand_id"] != r["query_id"]
    # external-id semantics (default): a coincidental id equality is NOT
    # dropped — the self vector appears as the trivially-best match
    ext = query_ivf(spark, idx, queries, top_k=5, nprobe=2).collect()
    self_hits = [r for r in ext if r["cand_id"] == r["query_id"]]
    assert self_hits and all(r["rank"] == 1 and r["cosine"] == 1.0 for r in self_hits)

    # determinism: a second run returns the identical result set
    again = query_ivf(spark, idx, queries, top_k=5, nprobe=2, exclude_matching_ids=True).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]

    # recall floor vs the exact baseline: trained (kmeans_iters=2 default)
    # measures 0.88 at sf0.001 / 0.92 at sf0.01 — pin well above collapse
    # but below run-to-run structure noise on this random corpus
    exact = {
        (r["query_id"], r["cand_id"])
        for r in q_sim_topk_cosine(spark, sf_dir).collect()
    }
    approx = {(r["query_id"], r["cand_id"]) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"recall collapsed: {recall}"

    # the raw-seed quantizer (kmeans_iters=0) must also stay serviceable —
    # both the trained and untrained builds share the probe path
    idx0 = str(tmp_path / "ivf_seed")
    build_ivf(emb, idx0, n_centroids=8, kmeans_iters=0)
    got0 = query_ivf(spark, idx0, queries, top_k=5, nprobe=2, exclude_matching_ids=True).collect()
    approx0 = {(r["query_id"], r["cand_id"]) for r in got0}
    assert len(exact & approx0) / len(exact) >= 0.8

    # the probed-centroid IN filter statically prunes list partitions:
    # the scan node's PartitionFilters must constrain cent_id
    plan = (
        query_ivf(spark, idx, queries, top_k=5, nprobe=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    part_filters = [
        line for line in plan.splitlines() if "PartitionFilters" in line
    ]
    assert part_filters, "expected a partitioned FileScan in the plan"
    assert any("cent_id" in line and "IN" in line.upper() for line in part_filters), (
        f"cent_id IN filter did not reach PartitionFilters: {part_filters}"
    )


def test_pq_index_build_query_recall(spark, sf_dir, tmp_path):
    from octopusdb_spark.functions.ann_index import build_pq, query_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    idx = str(tmp_path / "pq")
    build_pq(emb, idx)

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    # refine path: ADC shortlist re-scored exactly against the raw corpus
    got = query_pq(
        spark, idx, queries, top_k=5, corpus_df=emb, exclude_matching_ids=True
    ).collect()
    assert {r["query_id"] for r in got} == set(range(5))
    for r in got:
        assert r["cand_id"] != r["query_id"]

    # determinism: a second run returns the identical result set
    again = query_pq(
        spark, idx, queries, top_k=5, corpus_df=emb, exclude_matching_ids=True
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in again]

    # ADC-only path (no corpus): approximate ranks, same shape
    adc = query_pq(spark, idx, queries, top_k=5, exclude_matching_ids=True).collect()
    assert {r["query_id"] for r in adc} == set(range(5))

    # recall floor vs the exact baseline (trained codebooks + exact refine)
    exact = {
        (r["query_id"], r["cand_id"])
        for r in q_sim_topk_cosine(spark, sf_dir).collect()
    }
    approx = {(r["query_id"], r["cand_id"]) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"recall collapsed: {recall}"


def test_pq_index_residual_encoding(spark, sf_dir, tmp_path):
    """Residual-encoded PQ index (build_pq(residual_ivf_dir=...)): codes
    quantize v - c(v) against an IVF index's stored centroids, queries add
    the dot(q, c) term back. Recall must not fall below the raw-encoded
    index's floor, and mismatched build/query modes must fail fast."""
    import pytest

    from octopusdb_spark.functions.ann_index import build_ivf, build_pq, query_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ivf = str(tmp_path / "ivf")
    build_ivf(emb, ivf, n_centroids=8)
    idx = str(tmp_path / "pq_res")
    build_pq(emb, idx, residual_ivf_dir=ivf)
    # codes rows carry the assigned list for the query-side centroid term
    assert "cent_id" in spark.read.parquet(f"{idx}/codes").columns

    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = query_pq(
        spark, idx, queries, top_k=5, corpus_df=emb,
        exclude_matching_ids=True, residual_ivf_dir=ivf,
    ).collect()
    assert {r["query_id"] for r in got} == set(range(5))

    exact = {
        (r["query_id"], r["cand_id"])
        for r in q_sim_topk_cosine(spark, sf_dir).collect()
    }
    approx = {(r["query_id"], r["cand_id"]) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"residual recall below the raw floor: {recall}"

    # ADC-only path works in residual mode too (approximate cosine)
    adc = query_pq(
        spark, idx, queries, top_k=5,
        exclude_matching_ids=True, residual_ivf_dir=ivf,
    ).collect()
    assert {r["query_id"] for r in adc} == set(range(5))

    # mode mismatches fail fast instead of scoring silently wrong
    with pytest.raises(ValueError, match="residual/raw mode mismatch"):
        query_pq(spark, idx, queries, top_k=5)
    raw_idx = str(tmp_path / "pq_raw")
    build_pq(emb, raw_idx)
    with pytest.raises(ValueError, match="residual/raw mode mismatch"):
        query_pq(spark, raw_idx, queries, top_k=5, residual_ivf_dir=ivf)


def test_append_ivf_serves_new_vectors(spark, sf_dir, tmp_path):
    from octopusdb_spark.functions.ann_index import append_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    total = emb.count()
    cut = int(emb.agg(F.expr("percentile(vec_id, 0.75)")).collect()[0][0])
    idx = str(tmp_path / "ivf_inc")
    build_ivf(emb.filter(F.col("vec_id") <= cut), idx, n_centroids=8)
    append_ivf(emb.filter(F.col("vec_id") > cut), idx)
    # the lists now hold the whole corpus, each id exactly once
    lists = spark.read.parquet(f"{idx}/lists")
    assert lists.count() == total
    assert lists.select("vec_id").distinct().count() == total
    # an appended vector queried against the index finds ITSELF as the
    # trivially-best match: frozen-quantizer assignment and query-side
    # probing share rank_centroids, so its own list is always probed
    new_q = emb.filter(F.col("vec_id") > cut).limit(3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = query_ivf(spark, idx, new_q, top_k=1, nprobe=1).collect()
    assert got and all(
        r["cand_id"] == r["query_id"] and r["cosine"] == 1.0 for r in got
    )


def test_append_pq_serves_new_vectors(spark, sf_dir, tmp_path):
    from octopusdb_spark.functions.ann_index import append_pq, build_ivf, build_pq, query_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    total = emb.count()
    cut = int(emb.agg(F.expr("percentile(vec_id, 0.75)")).collect()[0][0])
    old, new = emb.filter(F.col("vec_id") <= cut), emb.filter(F.col("vec_id") > cut)

    idx = str(tmp_path / "pq_inc")
    build_pq(old, idx)
    append_pq(new, idx)
    codes = spark.read.parquet(f"{idx}/codes")
    assert codes.count() == total
    assert codes.select("vec_id").distinct().count() == total
    # exact re-rank over the full corpus surfaces an appended vector as
    # its own best match (ADC shortlist must contain it)
    new_q = new.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    got = query_pq(spark, idx, new_q, top_k=1, corpus_df=emb).collect()
    assert got and all(r["cand_id"] == r["query_id"] for r in got)

    # residual mode: same lifecycle through the IVF-PQ composite, and a
    # mode-mismatched append fails fast
    import pytest

    ivf = str(tmp_path / "pq_inc_ivf")
    build_ivf(old, ivf, n_centroids=8)
    ridx = str(tmp_path / "pq_inc_res")
    build_pq(old, ridx, residual_ivf_dir=ivf)
    with pytest.raises(ValueError, match="mode mismatch"):
        append_pq(new, ridx)  # missing residual_ivf_dir
    append_pq(new, ridx, residual_ivf_dir=ivf)
    rcodes = spark.read.parquet(f"{ridx}/codes")
    assert rcodes.count() == total
    rgot = query_pq(
        spark, ridx, new_q, top_k=1, corpus_df=emb, residual_ivf_dir=ivf
    ).collect()
    assert rgot and all(r["cand_id"] == r["query_id"] for r in rgot)


def test_append_rejects_mismatched_vector_dim(spark, sf_dir, tmp_path):
    """A batch whose vectors have the wrong dimension must fail fast: a
    mismatched append would not error on its own (zip_with pads with
    nulls and null distances sort first), so the corruption would be
    silent garbage in the lists/codes tables."""
    import pytest

    from octopusdb_spark.functions.ann_index import append_ivf, append_pq, build_pq

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    truncated = emb.select("vec_id", F.slice("embedding", 1, 32).alias("embedding"))

    idx = str(tmp_path / "ivf_dim")
    build_ivf(emb, idx, n_centroids=8, kmeans_iters=0)
    with pytest.raises(ValueError, match="dim"):
        append_ivf(truncated, idx)

    pidx = str(tmp_path / "pq_dim")
    build_pq(emb, pidx)
    with pytest.raises(ValueError, match="dim"):
        append_pq(truncated, pidx)


def test_ivf_drift_ledger_and_probe(spark, sf_dir, tmp_path):
    """r13: the stats ledger lands one generation per build/append, the
    drift probe reads ONLY the ledger, appended vectors raise the mean
    residual (drift >= 1 overall), counts reconcile with the lists, and
    a build-only index reads drift exactly 1.0 everywhere."""
    from octopusdb_spark.functions.ann_index import (
        append_ivf,
        build_ivf,
        ivf_drift,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 5 != 3)
    batch = emb.filter(F.col("vec_id") % 5 == 3)
    idx = str(tmp_path / "drift_ivf")
    build_ivf(base, idx, n_centroids=8, kmeans_iters=0)

    # build-only: n_now == n_build, drift exactly 1.0, skew sums to K
    d0 = ivf_drift(spark, idx).collect()
    assert len(d0) == 8
    assert all(r["n_now"] == r["n_build"] and r["added"] == 0 for r in d0)
    assert all(r["drift_r6"] == 1.0 for r in d0)
    assert abs(sum(r["skew_r6"] for r in d0) - 8.0) < 1e-4
    assert sum(r["n_build"] for r in d0) == base.count()

    append_ivf(batch, idx)
    d1 = {r["cent_id"]: r for r in ivf_drift(spark, idx).collect()}
    # ledger reconciles with the lists on disk
    lists = spark.read.parquet(f"{idx}/lists")
    per_list = {
        r["cent_id"]: r["n"]
        for r in lists.groupBy("cent_id").agg(F.count("*").alias("n")).collect()
    }
    assert {c: r["n_now"] for c, r in d1.items()} == per_list
    assert sum(r["added"] for r in d1.values()) == batch.count()
    # the ledger is generations, not a rewrite: 8 build + appended lists
    stats = spark.read.parquet(f"{idx}/stats")
    assert stats.filter(F.col("phase") == "build").count() == 8
    assert stats.filter(F.col("phase") == "append").count() >= 1
    # frozen-quantizer appends were not in the training set: corpus-level
    # mean residual must not drop
    tot_now = sum(r["mean_res_now_r6"] * r["n_now"] for r in d1.values())
    tot_build = sum(r["mean_res_build_r6"] * r["n_build"] for r in d1.values())
    assert tot_now / sum(r["n_now"] for r in d1.values()) >= (
        tot_build / sum(r["n_build"] for r in d1.values())
    ) * 0.999


def test_ivf_drift_retrain_cycle(spark, sf_dir, tmp_path):
    """The full maintenance loop the drift probe exists for: build on a
    base split, append the held-out split (drift telemetry moves),
    RETRAIN (build_ivf over the full corpus — the documented rebuild),
    and the fresh ledger reads drift exactly 1.0 with every vector
    re-owned by the new quantizer."""
    from octopusdb_spark.functions.ann_index import (
        append_ivf,
        build_ivf,
        ivf_drift,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 5 != 3)
    idx = str(tmp_path / "retrain_ivf")
    build_ivf(base, idx, n_centroids=8, kmeans_iters=0)
    append_ivf(emb.filter(F.col("vec_id") % 5 == 3), idx)
    before = ivf_drift(spark, idx).collect()
    assert sum(r["added"] for r in before) > 0

    # retrain: rebuild over the FULL corpus (quantizer re-trained, lists
    # and stats ledger rewritten — mode overwrite end to end)
    build_ivf(emb, idx, n_centroids=8, kmeans_iters=1)
    spark.catalog.refreshByPath(f"{idx}/lists")
    spark.catalog.refreshByPath(f"{idx}/stats")
    after = ivf_drift(spark, idx).collect()
    assert sum(r["n_now"] for r in after) == emb.count()
    assert all(r["added"] == 0 and r["drift_r6"] == 1.0 for r in after)
