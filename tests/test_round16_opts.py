"""Focused tests for the round-16 optimization internals:

1. ``common.spread`` — row-preserving, fires only below the session's
   core count, and is a structural no-op on an already-parallel frame
   (the scale-adaptivity contract: at production split counts no
   exchange is added);
2. the linear char-ngram construction (split + adjacent concat) is
   ngram-for-ngram identical to the quadratic per-position substring it
   replaced, including multibyte, short and empty strings — the
   equivalence the LM-bigram / langid-trigram rewrite rests on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from octopusdb_spark.queries.common import spread


def test_spread_preserves_rows_and_fires_below_core_count(spark):
    df = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") * 7 % 13).alias("v")
    ).coalesce(1)
    assert df.rdd.getNumPartitions() == 1
    out = spread(df, "doc_id")
    target = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() == target
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(100))


def test_spread_is_noop_at_or_above_core_count(spark):
    target = spark.sparkContext.defaultParallelism
    df = spark.range(1000).select(F.col("id").alias("doc_id")).repartition(
        target, "doc_id"
    )
    out = spread(df, "doc_id")
    # same object back: no exchange added on an already-parallel frame
    assert out is df


def test_linear_char_bigrams_match_substring_form(spark):
    texts = [
        "",                       # no bigrams
        "a",                      # below the length guard
        "ab",                     # exactly one
        "hello world",            # plain ascii
        "héllo wörld — ünïcode",  # multibyte: substring counts chars, not bytes
        "aa aa aa",               # repeats (occurrence counting downstream)
        "ß" * 5,                  # all-multibyte
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    txt = df.select("doc_id", F.lower(F.col("text")).alias("txt"))
    old = F.expr(
        """CASE WHEN length(txt) >= 2
                THEN transform(sequence(1, length(txt) - 1),
                               i -> substring(txt, i, 2))
                ELSE array() END"""
    )
    cs = txt.select("doc_id", F.split("txt", "").alias("cs"))
    new = F.expr(
        """CASE WHEN size(cs) >= 2
                THEN transform(sequence(1, size(cs) - 1),
                               i -> concat(cs[i-1], cs[i]))
                ELSE array() END"""
    )
    a = txt.select("doc_id", F.posexplode(old).alias("p", "b"))
    b = cs.select("doc_id", F.posexplode(new).alias("p", "b"))
    assert a.exceptAll(b).union(b.exceptAll(a)).isEmpty()


def test_linear_char_trigrams_match_substring_form(spark):
    texts = ["", "ab", "abc", "héllo wörld", "xyzzy plugh"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    txt = df.select("doc_id", F.lower(F.col("text")).alias("txt"))
    old = F.expr(
        """CASE WHEN length(txt) >= 3
                THEN transform(sequence(1, length(txt) - 2),
                               i -> substring(txt, i, 3))
                ELSE array() END"""
    )
    cs = txt.select("doc_id", F.split("txt", "").alias("cs"))
    new = F.expr(
        """CASE WHEN size(cs) >= 3
                THEN transform(sequence(1, size(cs) - 2),
                               i -> concat(cs[i-1], cs[i], cs[i+1]))
                ELSE array() END"""
    )
    a = txt.select("doc_id", F.posexplode(old).alias("p", "g"))
    b = cs.select("doc_id", F.posexplode(new).alias("p", "g"))
    assert a.exceptAll(b).union(b.exceptAll(a)).isEmpty()
