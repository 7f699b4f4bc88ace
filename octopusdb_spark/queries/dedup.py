"""Deduplication operators over `documents` — the LLM-pipeline dedup stage
(driver mandate; SURVEY.md §2 Part B / §7.3 M5).

All families are expressed as shuffle-friendly DataFrame plans with exact
DuckDB oracles (no randomness: hash functions are md5-derived with fixed
seeds or pure integer pipelines, so Spark and DuckDB compute identical
signatures):

- exact dedup          content-hash groupBy, keep min doc_id as canonical
- n-gram Jaccard       5-word shingles → shared-shingle candidate pairs →
                       exact Jaccard (the inverted-index join; candidates
                       only, never the O(n²) cross product)
- MinHash + LSH        16 md5-seeded min-hashes → 4 bands of 4 → band-join
                       candidate pairs (the scale path: pair generation cost
                       is bounded by band collisions, not corpus size)
- SimHash              16-bit sign-aggregated fingerprint per doc
- image pHash/dHash    r15: integer perceptual hashes over decoded pixels,
                       hamming-banded pairing (pigeonhole-exact at <= 3)
- audio fingerprint    r15: amplitude-invariant DCT gradient codes,
                       4-frame shingle inverted-index pairing
- video fingerprint    r15: per-frame dHash sequences, consecutive-frame
                       shingles — near-dup across all FOUR modalities

Scale notes: every pair-generating join is on a hash/band key — at 100 TB
the shuffle is by shingle/band, and hot shingles can be frequency-capped
(drop shingles appearing in > X% of docs) without changing semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from octopusdb_spark.queries.common import session_memo_get, session_memo_put, spread, t

N_HASHES = 16
N_BANDS = 4  # 4 rows per band

# word 5-gram shingles, deduplicated per doc
_SHINGLES_SPARK = """
CASE WHEN size(ws) >= 5
     THEN transform(sequence(1, size(ws) - 4), i -> concat_ws(' ', slice(ws, i, 5)))
     ELSE array()
END
"""

SHINGLES_SQL = """
WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
idx AS (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 3, 1))) AS i FROM w),
sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+4], ' ') AS s FROM idx)
"""


def shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    # array_distinct dedupes within the doc BEFORE the explode, so the
    # (doc_id, s) output is already unique — no global distinct (which would
    # shuffle every shingle once more for zero semantic effect).
    # spread (r16, guide §2.5): the 5-gram slice+concat explode is the
    # expensive narrow stage of every shingle consumer; without it the
    # single-row-group source runs it on one core
    docs = spread(t(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id")
    return (
        docs.withColumn("ws", F.split("text", " "))
        .select("doc_id", F.explode(F.array_distinct(F.expr(_SHINGLES_SPARK))).alias("s"))
    )


def _hash_long(*cols) -> F.Column:
    """Deterministic 60-bit integer hash shared with the oracle:
    first 15 hex chars of md5, as BIGINT."""
    return F.conv(F.substring(F.md5(F.concat_ws("|", *cols)), 1, 15), 16, 10).cast("long")


def _hash_long_sql(expr: str) -> str:
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: md5(content) groups; canonical = min doc_id."""
    docs = t(spark, sf_dir, "documents").select("doc_id", F.md5("text").alias("fp"))
    canon = docs.groupBy("fp").agg(F.min("doc_id").alias("canonical_id"))
    return (
        docs.join(canon, "fp")
        .select("doc_id", "canonical_id", (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"))
        .orderBy("doc_id")
    )


def q_dedup_exact_normalized(spark, sf_dir):
    """Canonicalized exact dedup — the standard pre-hash normalization of a
    training-data pipeline (lowercase, strip non-alphanumerics, collapse
    whitespace) so trivially-reformatted copies (case, punctuation,
    spacing) hash together where raw md5 misses them. Same one-shuffle
    groupBy shape as dedup_exact; normalization is a pure projection."""
    docs = t(spark, sf_dir, "documents")
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    h = docs.select("doc_id", F.md5(norm).alias("fp"))
    canon = h.groupBy("fp").agg(
        F.min("doc_id").alias("canonical_id"), F.count("*").alias("group_size")
    )
    return (
        h.join(canon, "fp")
        .select(
            "doc_id",
            "canonical_id",
            (F.col("doc_id") != F.col("canonical_id")).alias("is_duplicate"),
            "group_size",
        )
        .orderBy("doc_id")
    )


# Hot-shingle document-frequency cap for the Jaccard/cluster default path.
# A shingle appearing in k docs yields k^2 candidate pairs out of the
# inverted-index join — boilerplate shingles at corpus scale make that
# quadratic. Dropping shingles with df > cap bounds every join bucket at
# cap^2 pairs while losing nothing discriminative (a shingle shared by 64+
# docs carries no near-dup signal). Jaccard is computed over the CAPPED
# shingle universe on both sides (sizes included), so the oracle applies
# the identical cap and values stay exact at any scale. At the test scales
# the observed max df is 4, so the cap is inactive there (results are
# unchanged vs. the uncapped definition) — but it is IN the plan, which is
# what the 100 TB guarantee needs. `dedup_minhash_capped` (df > 2) remains
# the variant where the cap actually bites at test scale.
JACCARD_MAX_SHINGLE_DF = 64


# One capped-shingle frame per (session, sf_dir): Jaccard, containment, and
# cluster-keep all start from the identical frame, so the explode + df-cap
# materializes once per gate run instead of once per caller. The inputs are
# immutable parquet, so the memo never goes stale. Lookup/eviction
# semantics live in common.session_memo_get: identity-compared owning
# session, stopped-session entries evicted on miss (ADVICE r6).
_CAPPED_SHINGLES_MEMO: dict = {}


def capped_shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, s) shingles with document frequency <= the cap. The hot
    list is tiny by construction (only shingles shared by >cap docs), so it
    broadcasts (left to AQE's runtime sizing rather than a forced hint —
    an adversarial corpus where billions of distinct shingles each clear
    the cap would make a forced broadcast the OOM, and the shuffled
    anti-join is already keyed by shingle); the anti-join removes exactly
    the keys that concentrate join buckets. Only the CAPPED result is
    checkpointed (callers reuse it on several join sides); the raw explode
    is a plain cache for the duration of that one materialization — df
    count and anti-join read it — then released, so nothing but the capped
    frame stays pinned in executor storage."""
    hit = session_memo_get(_CAPPED_SHINGLES_MEMO, spark, sf_dir)
    if hit is not None:
        return hit
    sh = shingles(spark, sf_dir).cache()
    hot = (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > JACCARD_MAX_SHINGLE_DF)
        .select("s")
    )
    capped = sh.join(hot, "s", "left_anti").localCheckpoint(eager=True)
    sh.unpersist()
    return session_memo_put(_CAPPED_SHINGLES_MEMO, spark, sf_dir, capped)


def q_dedup_ngram_jaccard(spark, sf_dir):
    """Near-dedup by exact Jaccard over 5-gram shingles, computed only for
    candidate pairs that share >= 1 shingle (inverted-index join), with the
    hot-shingle df cap active (JACCARD_MAX_SHINGLE_DF) so no join bucket
    can go quadratic at corpus scale."""
    sh = capped_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            F.round(
                F.col("n_common").cast("double") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


CONTAINMENT_THRESHOLD = 0.8


def q_dedup_containment(spark, sf_dir):
    """Shingle-containment near-dup pairs: containment(a, b) =
    |A ∩ B| / min(|A|, |B|) >= 0.8 — catches a document largely CONTAINED
    in a longer one (quote-and-extend, boilerplate wrapping), which
    symmetric Jaccard misses because the union is dominated by the longer
    doc. Same inverted-index + df-cap plan shape as the Jaccard path; only
    the denominator changes."""
    sh = capped_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("c_raw", F.col("n_common").cast("double") / F.least("n_a", "n_b"))
        .filter(F.col("c_raw") >= CONTAINMENT_THRESHOLD)  # unrounded, like the oracle
        .select("doc_a", "doc_b", "n_common", F.round("c_raw", 6).alias("containment"))
        .orderBy("doc_a", "doc_b")
    )


# Affine-rehash MinHash constants: one md5 per shingle, then 16 cheap
# (a*h + b) mod p permutations — the textbook construction. Bounds:
# h < 2^28 (7 hex chars), a,b < 2^31, so a*h + b < 2^59 (no int64 overflow
# under ANSI mode). Same literals are inlined into the DuckDB oracle.
MINHASH_P = 2_147_483_647  # 2^31 - 1
MINHASH_AB = [
    ((2_654_435_761 * (i + 1) + 12_345) % MINHASH_P or 1, (40_503 * (i + 1) + 987) % MINHASH_P)
    for i in range(N_HASHES)
]
_ROWS_PER_BAND = N_HASHES // N_BANDS


def minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, band, sig): 16-way MinHash banded 4×4.

    Scale shape: one shuffle (groupBy doc_id) computing all 16 mins as
    parallel aggregates over a single 28-bit shingle hash — no seed
    explosion, so the shuffle volume equals the shingle count, not 16× it.
    """
    sh = shingles(spark, sf_dir).select(
        "doc_id",
        F.conv(F.substring(F.md5("s"), 1, 7), 16, 10).cast("long").alias("h"),
    )
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"m{i}")
            for i, (a, b) in enumerate(MINHASH_AB)
        ]
    )
    sigs = mins.select(
        "doc_id",
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{j}").cast("string")
                        for j in range(band * _ROWS_PER_BAND, (band + 1) * _ROWS_PER_BAND)
                    ],
                )
            ).alias(f"sig{band}")
            for band in range(N_BANDS)
        ],
    )
    stack_args = ", ".join(f"{band}, sig{band}" for band in range(N_BANDS))
    return sigs.select(
        "doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) AS (band, sig)")
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    """MinHash-LSH candidate pairs: docs sharing >= 1 of 4 band signatures.
    At scale, pair cost is bounded by band-bucket sizes (tunable via
    bands×rows), never O(n²)."""
    # Materialize the (doc_id, band, sig) frame once — the self-join would
    # otherwise run the whole shingle→minhash pipeline twice (static planner
    # does not reuse the exchange across the join's two sides here).
    bands = minhash_bands(spark, sf_dir).localCheckpoint(eager=True)
    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_bands"))
        .orderBy("doc_a", "doc_b")
    )


def q_dedup_simhash(spark, sf_dir):
    """16-bit SimHash fingerprint per document (sign-sum over word hashes)."""
    docs = t(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    )
    hashed = words.select("doc_id", _hash_long(F.lit("simhash"), F.col("w")).alias("h"))
    bits = hashed.select(
        "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(15))).alias("bit")
    )
    contrib = bits.select(
        "doc_id",
        "bit",
        F.when(F.expr("(h div cast(pow(2, bit) as bigint)) % 2") == 1, 1)
        .otherwise(-1)
        .alias("c"),
    )
    bitsum = contrib.groupBy("doc_id", "bit").agg(F.sum("c").alias("s"))
    return (
        bitsum.groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("cast(pow(2, bit) as bigint)")).otherwise(0)
            ).alias("simhash")
        )
        .orderBy("doc_id")
    )


SIMHASH_MAX_HAMMING = 3  # near-dup threshold over the 16-bit fingerprint


def q_dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-duplicate pairing: docs whose 16-bit fingerprints are
    within hamming distance 3, found WITHOUT an all-pairs comparison. The
    fingerprint splits into 4 bands of 4 bits; by pigeonhole, hamming<=3
    implies at least one band matches exactly, so candidates come from a
    band-bucket equi-join (the Manku/Jarvelin banding trick), then the
    exact xor-popcount filter runs only on collisions. Scale: shuffle is
    keyed by (band, nibble) — bounded buckets — never O(n^2)."""
    fp = q_dedup_simhash(spark, sf_dir)  # (doc_id, simhash)
    bands = fp.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"(simhash div {1 << (4 * b)}) % 16").alias("nib"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("r"),
    ).select("doc_id", "simhash", "r.band", "r.nib")
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.nib") == F.col("b.nib"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .dropDuplicates(["doc_a", "doc_b"])
        .orderBy("doc_a", "doc_b")
    )


MAX_SHINGLE_DF = 2  # hot-shingle cap: drop shingles appearing in > 2 docs


def q_dedup_minhash_capped(spark, sf_dir):
    """MinHash-LSH with the hot-shingle cap — the documented skew
    mitigation implemented as a first-class variant. Shingles whose
    document frequency exceeds MAX_SHINGLE_DF are dropped BEFORE hashing:
    the hot list is tiny in practice (only shingles shared by many
    docs), so AQE broadcasts it at runtime — no forced hint, for the same
    adversarial-corpus reason as capped_shingles — and the anti-join
    removes exactly the keys that would otherwise concentrate band buckets — at 100 TB this is what
    keeps the band-join's per-bucket fan-in bounded. Deterministic, so the
    oracle applies the identical cap."""
    sh = shingles(spark, sf_dir)
    hot = (
        sh.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > MAX_SHINGLE_DF)
        .select("s")
    )
    kept = sh.join(hot, "s", "left_anti").select(
        "doc_id", F.conv(F.substring(F.md5("s"), 1, 7), 16, 10).cast("long").alias("h")
    )
    mins = kept.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % F.lit(MINHASH_P)).alias(f"m{i}")
            for i, (a, b) in enumerate(MINHASH_AB)
        ]
    )
    sigs = mins.select(
        "doc_id",
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{j}").cast("string")
                        for j in range(band * _ROWS_PER_BAND, (band + 1) * _ROWS_PER_BAND)
                    ],
                )
            ).alias(f"sig{band}")
            for band in range(N_BANDS)
        ],
    )
    stack_args = ", ".join(f"{band}, sig{band}" for band in range(N_BANDS))
    bands = sigs.select(
        "doc_id", F.expr(f"stack({N_BANDS}, {stack_args}) AS (band, sig)")
    ).localCheckpoint(eager=True)  # self-joined below; materialize once
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_shared_bands"))
        .orderBy("doc_a", "doc_b")
    )


def q_dedup_cluster_keep(spark, sf_dir):
    """Near-duplicate clustering + keep-list — the actual OUTPUT of a
    training-data dedup stage: connected components over the Jaccard>=0.5
    candidate-pair graph (3 min-label rounds, deterministic), cluster id =
    smallest member, keep exactly the canonical doc per cluster. Only docs
    that participate in at least one near-dup pair are emitted (singletons
    are trivially kept). Scale shape: pair generation is the inverted-index
    shingle join with the hot-shingle df cap active (never all-pairs, no
    quadratic bucket); each propagation round is one join + one min-agg,
    both keyed by doc id."""
    sh = capped_shingles(spark, sf_dir)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    # (r16 note: carrying n_sh through the inverted-index join to drop
    # these two joins was tried and MEASURED SLOWER warm — the sizes
    # attach re-passes the full shingle frame, while `inter` is the
    # smaller side here and both attaches stay broadcast; reverted.)
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    pairs = (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .filter(
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            >= 0.5
        )
        .select("doc_a", "doc_b")
    )
    # Cache the undirected pair graph PRE-PARTITIONED by the join key of
    # every propagation round (r16, guide §2.4 "two operations keyed the
    # same way can share one exchange"): the cached partitioning satisfies
    # the round join's distribution requirement, so only the label frame
    # moves per superstep.
    und = (
        pairs.union(
            pairs.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
        )
        .repartition("doc_a")
        .cache()
    )
    labels = (
        und.select(F.col("doc_a").alias("doc_id")).distinct().withColumn("lbl", F.col("doc_id"))
    )
    prev_ckpt = None
    for _ in range(3):
        neigh = (
            und.join(labels, und.doc_a == labels.doc_id)
            .groupBy(F.col("doc_b").alias("doc_id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        labels = labels.join(neigh, "doc_id", "left").select(
            "doc_id", F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl")
        )
        # Each round references `labels` twice (neighbor agg + left join),
        # so without truncation the plan DOUBLES per round (2^rounds subtree
        # copies — hundreds of exchanges by round 3). Eager localCheckpoint
        # materializes the (small, O(participating docs)) label frame and
        # cuts the lineage — the standard Pregel-iteration pattern; on a
        # cluster you'd use reliable checkpointing for fault tolerance.
        # Superseded rounds' blocks release immediately (only the final
        # label frame stays pinned).
        new_ckpt = labels.localCheckpoint(eager=True)
        if prev_ckpt is not None:
            prev_ckpt.unpersist()
        prev_ckpt = labels = new_ckpt
    und.unpersist()  # final labels are materialized; the pair graph is free
    return labels.select(
        "doc_id",
        F.col("lbl").alias("cluster_id"),
        (F.col("doc_id") == F.col("lbl")).alias("keep"),
    ).orderBy("doc_id")


# capped shingle universe shared by the Jaccard/cluster oracles — the
# identical df cap the Spark plans apply (see JACCARD_MAX_SHINGLE_DF)
_CAPPED_SH_SQL = f"""
    , jdf AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
    shc AS (SELECT sh.doc_id, sh.s FROM sh JOIN jdf USING (s)
            WHERE df <= {JACCARD_MAX_SHINGLE_DF})"""

_CLUSTER_SQL = (
    SHINGLES_SQL
    + _CAPPED_SH_SQL
    + """
    , sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.5
    ),
    und AS (
      SELECT doc_a, doc_b FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    l0 AS (SELECT DISTINCT doc_a AS doc_id, doc_a AS lbl FROM und),
    {rounds}
    SELECT doc_id, lbl AS cluster_id, doc_id = lbl AS keep
    FROM l3 ORDER BY doc_id"""
).format(
    rounds=",\n    ".join(
        f"""l{i + 1} AS (
      SELECT v.doc_id, least(v.lbl, coalesce(min(n.lbl), v.lbl)) AS lbl
      FROM l{i} v
      LEFT JOIN und e ON e.doc_b = v.doc_id
      LEFT JOIN l{i} n ON n.doc_id = e.doc_a
      GROUP BY v.doc_id, v.lbl
    )"""
        for i in range(3)
    )
)


_MINHASH_CAPPED_SQL = (
    SHINGLES_SQL
    + f"""
    , dfreq AS (SELECT s, count(*) AS df FROM sh GROUP BY s),
    kept AS (SELECT sh.doc_id, sh.s FROM sh JOIN dfreq USING (s)
             WHERE df <= {MAX_SHINGLE_DF}),
    hashed AS (
      SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT) AS h FROM kept
    ),
    mins AS (
      SELECT doc_id,
             {", ".join(f"min(({a} * h + {b}) % {MINHASH_P}) AS m{i}" for i, (a, b) in enumerate(MINHASH_AB))}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
      {" UNION ALL ".join(
          "SELECT doc_id, %d AS band, md5(%s) AS sig FROM mins"
          % (band, " || ',' || ".join(f"CAST(m{j} AS VARCHAR)" for j in range(band * _ROWS_PER_BAND, (band + 1) * _ROWS_PER_BAND)))
          for band in range(N_BANDS))}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    GROUP BY 1, 2 ORDER BY doc_a, doc_b"""
)

ORACLES = {
    "dedup_minhash_capped": _MINHASH_CAPPED_SQL,
    "dedup_cluster_keep": _CLUSTER_SQL,
    "dedup_exact_normalized": """
        WITH h AS (
          SELECT doc_id,
                 md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                                         ' +', ' ', 'g'))) AS fp
          FROM documents
        ),
        c AS (SELECT fp, min(doc_id) AS canonical_id, count(*) AS group_size FROM h GROUP BY fp)
        SELECT doc_id, canonical_id, doc_id != canonical_id AS is_duplicate, group_size
        FROM h JOIN c USING (fp) ORDER BY doc_id""",
    "dedup_exact": """
        WITH h AS (SELECT doc_id, md5(text) AS fp FROM documents),
        c AS (SELECT fp, min(doc_id) AS canonical_id FROM h GROUP BY fp)
        SELECT doc_id, canonical_id, doc_id != canonical_id AS is_duplicate
        FROM h JOIN c USING (fp) ORDER BY doc_id""",
    "dedup_ngram_jaccard": SHINGLES_SQL
    + _CAPPED_SH_SQL
    + """
    , sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           round(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    ORDER BY doc_a, doc_b""",
    "dedup_containment": SHINGLES_SQL
    + _CAPPED_SH_SQL
    + f"""
    , sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM shc a JOIN shc b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           round(CAST(n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh), 6) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh) >= {CONTAINMENT_THRESHOLD}
    ORDER BY doc_a, doc_b""",
    "dedup_minhash_lsh": SHINGLES_SQL
    + f"""
    , hashed AS (
      SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 7)) AS BIGINT) AS h FROM sh
    ),
    mins AS (
      SELECT doc_id,
             {", ".join(f"min(({a} * h + {b}) % {MINHASH_P}) AS m{i}" for i, (a, b) in enumerate(MINHASH_AB))}
      FROM hashed GROUP BY doc_id
    ),
    bands AS (
      {" UNION ALL ".join(
          "SELECT doc_id, %d AS band, md5(%s) AS sig FROM mins"
          % (band, " || ',' || ".join(f"CAST(m{j} AS VARCHAR)" for j in range(band * _ROWS_PER_BAND, (band + 1) * _ROWS_PER_BAND)))
          for band in range(N_BANDS))}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared_bands
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
    GROUP BY 1, 2 ORDER BY doc_a, doc_b""",
    "dedup_simhash": f"""
    WITH words AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    hashed AS (
      SELECT doc_id, {_hash_long_sql("'simhash' || '|' || w")} AS h FROM words
    ),
    bits AS (
      SELECT doc_id, bit,
             CASE WHEN (h // CAST(pow(2, bit) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END AS c
      FROM hashed, (SELECT unnest(range(0, 16)) AS bit)
    ),
    bitsum AS (SELECT doc_id, bit, sum(c) AS s FROM bits GROUP BY doc_id, bit)
    SELECT doc_id,
           CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END)
                AS BIGINT) AS simhash
    FROM bitsum GROUP BY doc_id ORDER BY doc_id""",
    "dedup_simhash_pairs": f"""
    WITH words AS (
      SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    hashed AS (
      SELECT doc_id, {_hash_long_sql("'simhash' || '|' || w")} AS h FROM words
    ),
    bits AS (
      SELECT doc_id, bit,
             CASE WHEN (h // CAST(pow(2, bit) AS BIGINT)) % 2 = 1 THEN 1 ELSE -1 END AS c
      FROM hashed, (SELECT unnest(range(0, 16)) AS bit)
    ),
    bitsum AS (SELECT doc_id, bit, sum(c) AS s FROM bits GROUP BY doc_id, bit),
    fp AS (
      SELECT doc_id,
             CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, bit) AS BIGINT) ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM bitsum GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, simhash, band, (simhash // CAST(pow(16, band) AS BIGINT)) % 16 AS nib
      FROM fp, (SELECT unnest(range(0, 4)) AS band)
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM bands a JOIN bands b
      ON a.band = b.band AND a.nib = b.nib AND a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_MAX_HAMMING}
    ORDER BY doc_a, doc_b""",
}

def q_dedup_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual IMAGE near-dup (r15, VERDICT r14 #5) — the multimodal
    analog of MinHash the pipeline brief implies: re-encoded /
    brightness-shifted copies of a picture must pair, different
    pictures must not. Each guarded doc becomes TWO images (72x64
    grayscale pattern from its text bytes): the original as PPM and a
    +40-brightness twin as BMP — a cross-container, photometrically
    shifted near-duplicate. `functions/image_hash.py` decodes both
    containers and computes the integer dHash (9x8 gradient grid) and
    integer-DCT pHash executor-side; pairing rides the SimHash band
    machinery — 4 x 16-bit dHash bands, band-equality join, exact
    hamming <= 3 re-score. By pigeonhole the banded plan returns
    EXACTLY the full cross join's pairs at this threshold, which is
    what the oracle computes (it replicates both hashes bit-for-bit
    from the closed-form pixel function, integer DCT matrix included).
    doc_id%9==4 docs get a truncated PPM, so their twin pair vanishes
    through the loud-fallback lane — under the hash. NEVER all-pairs
    on the Spark side: candidates are band collisions, the 100 TB
    shape shared with dedup_simhash_pairs."""
    import pandas as pd
    from pyspark.sql import types as T

    from octopusdb_spark.functions.image_hash import image_hashes, pattern_rgb
    from octopusdb_spark.functions.multimodal import encode_bmp, encode_ppm

    W, H = 72, 64
    docs = (
        t(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") < 60)
            & F.octet_length(F.col("text")).between(48, 599)
        )
        .select("doc_id", "text")
        .repartition(8, "doc_id")
    )
    media_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])

    def build(it):
        for pdf in it:
            ids, payloads = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                ax, ay = b[0] % 5 + 1, b[1] % 5 + 1
                k, c = b[2] % 3 + 1, int(did) % 97
                ppm = encode_ppm(pattern_rgb(ax, ay, k, c), W, H)
                # +40 never wraps: pattern values stay under 200
                twin = pattern_rgb(ax, ay, k, c, delta=40)
                if int(did) % 9 == 4:
                    ppm = ppm[: len(ppm) // 2]  # truncated: loud lane
                ids += [int(did) * 2, int(did) * 2 + 1]
                payloads += [ppm, encode_bmp(twin, W, H)]
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    hashes = (
        image_hashes(docs.mapInPandas(build, media_schema))
        .filter(F.col("decoded"))
        .select("media_id", "dhash", "phash")
    )
    bands = hashes.select(
        "media_id", "dhash", "phash",
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftrightunsigned(F.col("dhash"), 16 * j)
                .bitwiseAND(F.lit(65535)).alias("bval"),
            )
            for j in range(4)
        ])).alias("bb"),
    ).select("media_id", "dhash", "phash", "bb.band", "bb.bval")
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bval") == F.col("b.bval"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .select(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
            F.col("a.dhash").alias("dh_a"), F.col("b.dhash").alias("dh_b"),
            F.col("a.phash").alias("ph_a"), F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    return (
        cand
        .withColumn(
            "ham_dhash",
            F.bit_count(F.col("dh_a").bitwiseXOR(F.col("dh_b"))),
        )
        .withColumn(
            "ham_phash",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))),
        )
        .filter(F.col("ham_dhash") <= 3)
        .select("media_a", "media_b", "ham_dhash", "ham_phash")
        .orderBy("media_a", "media_b")
    )


def q_dedup_audio_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acoustic near-dup (r15) — the AUDIO leg of the near-dup trifecta
    (text MinHash, image dHash/pHash, and this): each guarded doc
    becomes TWO mono 16-bit WAVs — the original and a 3x-amplitude
    re-master — and `functions/audio_fp.py` fingerprints both
    executor-side (per-64-sample frames -> 8 sub-block sums -> the
    shared integer DCT -> 7-bit spectral-gradient codes; amplitude
    scaling flips no comparison, so a re-mastered copy fingerprints
    IDENTICALLY — the invariance is what's tested). Matching is the
    inverted-index n-gram shape: 4-frame shingles (28-bit ints), pairs
    meet only through equal shingle keys, and the integer
    cross-multiplied containment rule (5*shared >= 4*min) keeps the
    verdict float-free. At the r15 data point the threshold separates
    perfectly: 60 twin pairs, 0 false pairs, 208 sub-threshold
    candidate pairs pruned by the exact check. doc_id%9==4 originals
    get a corrupted RIFF magic, so their twin pair vanishes through
    the loud-fallback lane — under the hash. NEVER all-pairs: the
    shingle join is the same bounded shape as dedup_ngram_jaccard."""
    import pandas as pd
    from pyspark.sql import types as T

    from octopusdb_spark.functions.audio_fp import (
        audio_fingerprints,
        pcm_pattern,
    )
    from octopusdb_spark.functions.multimodal import encode_wav

    docs = (
        t(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") < 60)
            & F.octet_length(F.col("text")).between(48, 599)
        )
        .select("doc_id", "text")
        .repartition(8, "doc_id")
    )
    media_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])

    def build(it):
        for pdf in it:
            ids, payloads = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                did = int(did)
                a1, a2 = (b[0] + did) % 37 + 2, b[1] % 5 + 1
                c, m = did % 211, 17 + (did * 7 + b[0]) % 23
                nf = 12 + len(b) % 8
                wav = encode_wav(pcm_pattern(a1, a2, c, m, nf, 1))
                if did % 9 == 4:
                    wav = b"XX" + wav[2:]  # corrupt magic: loud lane
                ids += [did * 2, did * 2 + 1]
                payloads += [
                    wav, encode_wav(pcm_pattern(a1, a2, c, m, nf, 3)),
                ]
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    fp = (
        audio_fingerprints(docs.mapInPandas(build, media_schema))
        .filter(F.col("decoded"))
        # short-recording guard (ADVICE r15): sequence(0, size-4) goes
        # DESCENDING below 4 codes, minting null shingles the oracle's
        # lead()-based shingling never emits; drop them like it does
        .filter(F.size("codes") >= 4)
        .select("media_id", "codes")
    )
    # 4-frame shingles as 28-bit ints; distinct per recording (the
    # inverted-index key — documents meet only through equal keys)
    sh = fp.select(
        "media_id",
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(0, size(codes) - 4), i -> "
            "CAST(((codes[i] * 128 + codes[i+1]) * 128 + codes[i+2]) * 128 "
            "+ codes[i+3] AS BIGINT))"
        ))).alias("sh"),
    )
    cnt = sh.groupBy("media_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        pairs
        .join(cnt.withColumnRenamed("media_id", "media_a")
              .withColumnRenamed("n_sh", "n_a"), "media_a")
        .join(cnt.withColumnRenamed("media_id", "media_b")
              .withColumnRenamed("n_sh", "n_b"), "media_b")
        .filter(F.lit(5) * F.col("n_shared") >= F.lit(4) * F.least("n_a", "n_b"))
        .select("media_a", "media_b", "n_shared", "n_a", "n_b")
        .orderBy("media_a", "media_b")
    )


def q_dedup_video_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VIDEO near-dup (r15) — completing the near-dup family across all
    four modalities (text MinHash, image dHash/pHash, audio spectral
    gradients, and this): each guarded doc becomes TWO mono Y4M clips
    (6-10 frames of the evolving 72x64 pattern — per-frame k/c drift
    makes frames structurally distinct) — the original and a +40
    global-brightness copy. `functions/image_hash.video_fingerprints`
    dHashes every frame executor-side (the same 9x8 gradient grid as
    the image row, so the brightness invariance carries over frame by
    frame), and matching pairs CONSECUTIVE-FRAME shingles through the
    inverted-index shape with the integer containment rule — exact
    64-bit frame-hash equality twice over, so time-shifted copies of a
    shared sub-clip match while unrelated clips cannot. At the r15
    data point: 60 twin pairs, 0 false pairs, 108 sub-threshold
    candidates pruned. doc_id%9==4 originals are truncated mid-frame
    (loud lane, pair vanishes). NEVER all-pairs; frames never leave
    the Python worker — only 64-bit hashes do."""
    import pandas as pd
    from pyspark.sql import types as T

    from octopusdb_spark.functions.image_hash import video_fingerprints
    from octopusdb_spark.functions.multimodal import encode_y4m

    W, H = 72, 64
    docs = (
        t(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") < 60)
            & F.octet_length(F.col("text")).between(48, 599)
        )
        .select("doc_id", "text")
        .repartition(8, "doc_id")
    )
    media_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])

    def build(it):
        import numpy as np

        xs = np.arange(W, dtype=np.int64)[None, :]
        ys = np.arange(H, dtype=np.int64)[:, None]
        for pdf in it:
            ids, payloads = [], []
            for did, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                did = int(did)
                ax, ay = b[0] % 5 + 1, b[1] % 5 + 1
                k0, c0 = b[2] % 3, did % 97
                nf = 6 + len(b) % 5
                for delta, mid in ((0, did * 2), (40, did * 2 + 1)):
                    frames = [
                        (
                            (ax * xs + ay * ys
                             + ((xs * ys) % 7) * ((k0 + i) % 3 + 1)
                             + c0 + 13 * i) % 200 + delta
                        ).astype(np.uint8).tobytes()
                        for i in range(nf)
                    ]
                    clip = encode_y4m(frames, W, H, colorspace="mono")
                    if delta == 0 and did % 9 == 4:
                        clip = clip[:-5]  # truncated frame: loud lane
                    ids.append(mid)
                    payloads.append(clip)
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    fp = (
        video_fingerprints(docs.mapInPandas(build, media_schema))
        .filter(F.col("decoded"))
        # short-clip guard (ADVICE r15): below 2 frames the sequence()
        # shingle expr runs descending and emits nulls the oracle never does
        .filter(F.size("hashes") >= 2)
        .select("media_id", "hashes")
    )
    sh = fp.select(
        "media_id",
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(0, size(hashes) - 2), i -> "
            "concat(cast(hashes[i] AS string), ':', "
            "cast(hashes[i+1] AS string)))"
        ))).alias("sh"),
    )
    cnt = sh.groupBy("media_id").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.media_id") < F.col("b.media_id")),
        )
        .groupBy(
            F.col("a.media_id").alias("media_a"),
            F.col("b.media_id").alias("media_b"),
        )
        .agg(F.count("*").alias("n_shared"))
    )
    return (
        pairs
        .join(cnt.withColumnRenamed("media_id", "media_a")
              .withColumnRenamed("n_sh", "n_a"), "media_a")
        .join(cnt.withColumnRenamed("media_id", "media_b")
              .withColumnRenamed("n_sh", "n_b"), "media_b")
        .filter(F.lit(5) * F.col("n_shared") >= F.lit(4) * F.least("n_a", "n_b"))
        .select("media_a", "media_b", "n_shared", "n_a", "n_b")
        .orderBy("media_a", "media_b")
    )


def q_pipeline_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-level MULTIMODAL dedup keep-list (r15; video leg r16) — the
    integration the four modality operators exist for: a corpus record
    carries text + an image + an audio track + a video clip, and the
    pipeline drops it when ANY modality near-matches another record,
    keeping one canonical per match set. Image/audio are built in
    GROUPS of five sharing media content (group-keyed patterns; within
    a group images differ only by brightness and audio only by gain —
    the exact invariances the hashes are for), so every group collapses
    to its leader. VIDEO is keyed by doc_id % 30 — docs d and d+30 are
    brightness-shifted clip twins living in DIFFERENT image/audio
    groups, so the video leg contributes matches NO other modality
    sees (the r15 verdict's gap: a video-only near-dup used to survive
    the composite). Text rides real document md5 (this slice carries
    no exact text dups — the path is exercised, the count is zero).

    Matching rules are the modality rows' own: image dHash banded join
    + hamming <= 3; audio 4-frame shingles + the integer containment
    rule; video consecutive-frame dHash shingles + the same
    containment rule; text md5 equality. Canonical selection is the
    1-HOP minimum (min of self and all direct partners) —
    deterministic without a transitive closure; with the cross-group
    video edges 1-hop is NOT the full closure (doc 31 settles at its
    video twin 1 while its image group-mates settle at 30), and both
    sides compute exactly this documented rule. Output per doc:
    canonical_id, is_dup, and per-modality match counts — all integer,
    all oracle-replicated (the oracle reruns all three hash pipelines
    closed-form and the same 1-hop rule). Plans: three mapInPandas
    hash lanes + four bounded equi-joins; NEVER all-pairs."""
    import pandas as pd
    from pyspark.sql import types as T

    from octopusdb_spark.functions.audio_fp import (
        audio_fingerprints,
        pcm_pattern,
    )
    from octopusdb_spark.functions.image_hash import (
        image_hashes,
        pattern_rgb,
        video_fingerprints,
    )
    from octopusdb_spark.functions.multimodal import (
        encode_ppm,
        encode_wav,
        encode_y4m,
    )

    docs = (
        t(spark, sf_dir, "documents")
        .filter(
            (F.col("doc_id") < 60)
            & F.octet_length(F.col("text")).between(48, 599)
        )
        .select("doc_id", "text")
        .repartition(8, "doc_id")
    )
    media_schema = T.StructType([
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), False),
    ])

    def build_images(it):
        for pdf in it:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                d = int(did)
                gi = (d - d % 5) // 5
                ids.append(d)
                payloads.append(encode_ppm(pattern_rgb(
                    gi % 5 + 1, (2 * gi) % 5 + 1, gi % 3 + 1,
                    (gi * 13) % 97, delta=8 * (d % 5),
                ), 72, 64))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    def build_audio(it):
        for pdf in it:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                d = int(did)
                g = d - d % 5
                ids.append(d)
                payloads.append(encode_wav(pcm_pattern(
                    g % 37 + 2, g % 5 + 1, g % 211, 17 + (g * 7) % 23,
                    12 + g % 8, d % 5 + 1,
                )))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    def build_videos(it):
        import numpy as np

        xs = np.arange(72, dtype=np.int64)[None, :]
        ys = np.arange(64, dtype=np.int64)[:, None]
        for pdf in it:
            ids, payloads = [], []
            for did in pdf["doc_id"]:
                d = int(did)
                vg = d % 30  # the video twin key: d and d+30 share it
                # wide gradient spread: all 30 (ax, ay) combos distinct,
                # so the coarse dHash can't pair clips across families
                ax, ay = vg % 23 + 1, (vg * 7) % 19 + 1
                k0, c0 = vg % 3, (vg * 17) % 97
                nf = 6 + vg % 5
                delta = 8 * (d // 30)  # brightness-shifted second copy
                frames = [
                    (
                        (ax * xs + ay * ys
                         + ((xs * ys) % 7) * ((k0 + i) % 3 + 1)
                         + c0 + 13 * i) % 200 + delta
                    ).astype(np.uint8).tobytes()
                    for i in range(nf)
                ]
                ids.append(d)
                payloads.append(encode_y4m(frames, 72, 64, colorspace="mono"))
            yield pd.DataFrame({"media_id": ids, "payload": payloads})

    # image matches: the banded dHash join at hamming <= 3
    img = (
        image_hashes(docs.mapInPandas(build_images, media_schema))
        .filter(F.col("decoded"))
        .select(F.col("media_id").alias("doc_id"), "dhash")
    )
    bands = img.select(
        "doc_id", "dhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftrightunsigned(F.col("dhash"), 16 * j)
                .bitwiseAND(F.lit(65535)).alias("bval"),
            )
            for j in range(4)
        ])).alias("bb"),
    ).select("doc_id", "dhash", "bb.band", "bb.bval")
    ia, ib = bands.alias("a"), bands.alias("b")
    ipairs = (
        ia.join(ib, (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bval") == F.col("b.bval"))
                & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"),
                F.col("a.dhash").alias("ha"), F.col("b.dhash").alias("hb"))
        .distinct()
        .filter(F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= 3)
        .select("da", "db")
    )

    # audio matches: 4-frame shingles + the integer containment rule
    fp = (
        audio_fingerprints(docs.mapInPandas(build_audio, media_schema))
        .filter(F.col("decoded"))
        # short-recording guard (ADVICE r15) — see dedup_audio_fingerprint
        .filter(F.size("codes") >= 4)
        .select(F.col("media_id").alias("doc_id"), "codes")
    )
    ash = fp.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(0, size(codes) - 4), i -> "
            "CAST(((codes[i] * 128 + codes[i+1]) * 128 + codes[i+2]) * 128 "
            "+ codes[i+3] AS BIGINT))"
        ))).alias("sh"),
    )
    acnt = ash.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    aa, ab = ash.alias("a"), ash.alias("b")
    apairs = (
        aa.join(ab, (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("n_shared"))
        .join(acnt.withColumnRenamed("doc_id", "da")
              .withColumnRenamed("n_sh", "n_a"), "da")
        .join(acnt.withColumnRenamed("doc_id", "db")
              .withColumnRenamed("n_sh", "n_b"), "db")
        .filter(F.lit(5) * F.col("n_shared")
                >= F.lit(4) * F.least("n_a", "n_b"))
        .select("da", "db")
    )

    # video matches: consecutive-frame dHash shingles + the containment
    # rule (the cross-group leg — its pairs exist in no other modality)
    vfp = (
        video_fingerprints(docs.mapInPandas(build_videos, media_schema))
        .filter(F.col("decoded"))
        # short-clip guard (ADVICE r15) — see dedup_video_fingerprint
        .filter(F.size("hashes") >= 2)
        .select(F.col("media_id").alias("doc_id"), "hashes")
    )
    vsh = vfp.select(
        "doc_id",
        F.explode(F.array_distinct(F.expr(
            "transform(sequence(0, size(hashes) - 2), i -> "
            "concat(cast(hashes[i] AS string), ':', "
            "cast(hashes[i+1] AS string)))"
        ))).alias("sh"),
    )
    vcnt = vsh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    va, vb = vsh.alias("a"), vsh.alias("b")
    vpairs = (
        va.join(vb, (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
        .agg(F.count("*").alias("n_shared"))
        .join(vcnt.withColumnRenamed("doc_id", "da")
              .withColumnRenamed("n_sh", "n_a"), "da")
        .join(vcnt.withColumnRenamed("doc_id", "db")
              .withColumnRenamed("n_sh", "n_b"), "db")
        .filter(F.lit(5) * F.col("n_shared")
                >= F.lit(4) * F.least("n_a", "n_b"))
        .select("da", "db")
    )

    # text matches: exact md5 equality (the corpus slice's honest zero)
    fps = docs.select("doc_id", F.md5("text").alias("fp"))
    ta, tb = fps.alias("a"), fps.alias("b")
    tpairs = (
        ta.join(tb, (F.col("a.fp") == F.col("b.fp"))
                & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db"))
    )

    def sym(pairs, tag):
        return pairs.select(
            F.col("da").alias("doc_id"), F.col("db").alias("partner"),
            F.lit(tag).alias("modality"),
        ).unionByName(pairs.select(
            F.col("db").alias("doc_id"), F.col("da").alias("partner"),
            F.lit(tag).alias("modality"),
        ))

    matches = (
        sym(ipairs, "image")
        .unionByName(sym(apairs, "audio"))
        .unionByName(sym(vpairs, "video"))
        .unionByName(sym(tpairs, "text"))
    )
    agg = matches.groupBy("doc_id").agg(
        F.min("partner").alias("min_partner"),
        F.sum(F.when(F.col("modality") == "image", 1).otherwise(0))
        .alias("n_image_matches"),
        F.sum(F.when(F.col("modality") == "audio", 1).otherwise(0))
        .alias("n_audio_matches"),
        F.sum(F.when(F.col("modality") == "video", 1).otherwise(0))
        .alias("n_video_matches"),
        F.sum(F.when(F.col("modality") == "text", 1).otherwise(0))
        .alias("n_text_matches"),
    )
    return (
        docs.select("doc_id").join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.least(F.col("doc_id"), F.coalesce("min_partner", "doc_id"))
            .alias("canonical_id"),
            (F.least(F.col("doc_id"), F.coalesce("min_partner", "doc_id"))
             != F.col("doc_id")).alias("is_dup"),
            F.coalesce("n_image_matches", F.lit(0)).cast("long")
            .alias("n_image_matches"),
            F.coalesce("n_audio_matches", F.lit(0)).cast("long")
            .alias("n_audio_matches"),
            F.coalesce("n_video_matches", F.lit(0)).cast("long")
            .alias("n_video_matches"),
            F.coalesce("n_text_matches", F.lit(0)).cast("long")
            .alias("n_text_matches"),
        )
        .orderBy("doc_id")
    )


def _dct8_values_sql() -> str:
    """The integer DCT matrix as a VALUES table, generated from the
    same DCT8 constant the Python side uses — one source of truth."""
    from octopusdb_spark.functions.image_hash import DCT8

    rows = ", ".join(
        f"({u}, {k}, {DCT8[u][k]})" for u in range(8) for k in range(8)
    )
    return f"(VALUES {rows}) ctab(u, k, cv)"


# the closed-form pixel -> dHash chain, shared by the batch row's and
# the stream twin's oracles: assumes a CTE ``params(media_id, ax, ay,
# k, c, delta)`` is already in scope (one row per image)
_DHASH_CHAIN_SQL = """
    px AS (
      SELECT p.media_id,
             CAST(xx.x AS BIGINT) AS x, CAST(yy.y AS BIGINT) AS y,
             (p.ax * xx.x + p.ay * yy.y + ((xx.x * yy.y) % 7) * p.k + p.c)
               % 200 + p.delta AS v
      FROM params p,
           (SELECT unnest(range(72)) AS x) xx,
           (SELECT unnest(range(64)) AS y) yy
    ),
    dgrid AS (  -- 9x8 grid of 8x8-pixel block averages
      SELECT media_id, y // 8 AS gr, x // 8 AS gc, sum(v) // 64 AS g
      FROM px GROUP BY 1, 2, 3
    ),
    dbits AS (
      SELECT a.media_id, a.gr * 8 + a.gc AS idx,
             CASE WHEN a.g > b.g THEN 1 ELSE 0 END AS bit
      FROM dgrid a JOIN dgrid b
        ON a.media_id = b.media_id AND a.gr = b.gr AND b.gc = a.gc + 1
      WHERE a.gc < 8
    ),
    dh AS (
      -- CAST: DuckDB sum(BIGINT) widens to HUGEINT; the packed value is
      -- in signed-64 range by construction, and the xor/bit_count below
      -- must run on 64-bit two's complement to match Spark
      SELECT media_id,
             CAST(sum(CASE WHEN idx < 63 THEN bit * (CAST(1 AS BIGINT) << idx)
                           ELSE bit * CAST(-9223372036854775808 AS BIGINT)
                      END) AS BIGINT) AS dhash
      FROM dbits GROUP BY media_id
    )"""


# the same chain with every CTE renamed so the composite oracle can run
# it a SECOND time for the video leg (one WITH clause, distinct names);
# the dhash column name is untouched — only the table names shift
_VDHASH_CHAIN_SQL = (
    _DHASH_CHAIN_SQL
    .replace("params", "vparams")
    .replace("px", "vpx")
    .replace("dgrid", "vdgrid")
    .replace("dbits", "vdbits")
    .replace("dh AS", "vdh AS")
)


# bit-for-bit replication of the perceptual-hash pipeline: closed-form
# pixels -> block-average grids -> dHash comparisons / integer DCT ->
# signed-64 packing -> FULL cross join at hamming <= 3 (pigeonhole-
# equivalent to the Spark side's banded plan; tiny at oracle scale)
_IMAGE_PHASH_SQL = f"""
    WITH src AS (
      SELECT doc_id, ascii(substr(text, 1, 1)) AS b0,
             ascii(substr(text, 2, 1)) AS b1,
             ascii(substr(text, 3, 1)) AS b2
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    imgs AS (  -- PPM original (even id; %9==4 truncated -> dropped) + BMP twin
      SELECT doc_id, doc_id * 2 AS media_id, 0 AS delta
      FROM src WHERE doc_id % 9 != 4
      UNION ALL
      SELECT doc_id, doc_id * 2 + 1, 40 FROM src
    ),
    params AS (
      SELECT i.media_id, i.delta, s.b0 % 5 + 1 AS ax, s.b1 % 5 + 1 AS ay,
             s.b2 % 3 + 1 AS k, s.doc_id % 97 AS c
      FROM imgs i JOIN src s USING (doc_id)
    ),
    {_DHASH_CHAIN_SQL.lstrip()},
    pgrid AS (  -- 8x8 grid of 9x8-pixel block averages
      SELECT media_id, y // 8 AS gr, x // 9 AS gc, sum(v) // 72 AS g
      FROM px GROUP BY 1, 2, 3
    ),
    m1 AS (  -- C @ G : rows u, cols l
      SELECT g.media_id, ctab.u, g.gc AS l, sum(ctab.cv * g.g) AS s
      FROM pgrid g JOIN {_dct8_values_sql()} ON ctab.k = g.gr
      GROUP BY 1, 2, 3
    ),
    tmat AS (  -- (C @ G) @ C^T : cells (u, v)
      SELECT m.media_id, m.u, ctab2.u AS v, sum(m.s * ctab2.cv) AS t
      FROM m1 m JOIN {_dct8_values_sql().replace('ctab', 'ctab2')}
        ON ctab2.k = m.l
      GROUP BY 1, 2, 3
    ),
    acsum AS (
      SELECT media_id,
             sum(t) - sum(CASE WHEN u = 0 AND v = 0 THEN t ELSE 0 END) AS s
      FROM tmat GROUP BY media_id
    ),
    ph AS (
      SELECT t.media_id,
             CAST(sum(CASE WHEN t.u * 8 + t.v < 63 THEN
                             (CASE WHEN 63 * t.t > a.s THEN 1 ELSE 0 END)
                             * (CAST(1 AS BIGINT) << (t.u * 8 + t.v))
                           ELSE (CASE WHEN 63 * t.t > a.s THEN 1 ELSE 0 END)
                             * CAST(-9223372036854775808 AS BIGINT)
                      END) AS BIGINT) AS phash
      FROM tmat t JOIN acsum a USING (media_id) GROUP BY t.media_id
    ),
    hashes AS (SELECT media_id, dhash, phash FROM dh JOIN ph USING (media_id))
    SELECT a.media_id AS media_a, b.media_id AS media_b,
           bit_count(xor(a.dhash, b.dhash)) AS ham_dhash,
           bit_count(xor(a.phash, b.phash)) AS ham_phash
    FROM hashes a JOIN hashes b ON a.media_id < b.media_id
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 3
    ORDER BY media_a, media_b"""


# bit-for-bit replication of the acoustic fingerprint: closed-form PCM
# -> per-frame sub-block sums -> the same integer DCT table -> gradient
# codes -> lead()-built 4-frame shingles -> inverted-index pair join
# with the integer containment rule. Amplitude twins share every
# shingle by the invariance lemma; the oracle proves it from scratch.
_AUDIO_FP_SQL = f"""
    WITH src AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             ascii(substr(text, 1, 1)) AS b0,
             ascii(substr(text, 2, 1)) AS b1
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    media AS (  -- original (even id; %9==4 corrupted -> dropped) + 3x remaster
      SELECT doc_id, doc_id * 2 AS media_id, 1 AS scale
      FROM src WHERE doc_id % 9 != 4
      UNION ALL
      SELECT doc_id, doc_id * 2 + 1, 3 FROM src
    ),
    par AS (
      SELECT m.media_id, m.scale,
             (s.b0 + s.doc_id) % 37 + 2 AS a1, s.b1 % 5 + 1 AS a2,
             s.doc_id % 211 AS c, 17 + (s.doc_id * 7 + s.b0) % 23 AS md,
             12 + s.n % 8 AS nf
      FROM media m JOIN src s USING (doc_id)
    ),
    smp AS (  -- the pcm_pattern closed form; max nf = 19 -> 1216 samples
      SELECT p.media_id, CAST(tt.t AS BIGINT) AS t,
             ((p.a1 * tt.t + p.a2 * ((tt.t * tt.t) % p.md) + p.c) % 2048
               - 1024) * p.scale AS s
      FROM par p, (SELECT unnest(range(1216)) AS t) tt
      WHERE tt.t < 64 * p.nf
    ),
    ss AS (  -- 8 sub-block sums per 64-sample frame
      SELECT media_id, t // 64 AS f, (t % 64) // 8 AS sub, sum(s) AS g
      FROM smp GROUP BY 1, 2, 3
    ),
    tm AS (  -- coarse spectrum: DCT8 over the sub-block sums
      SELECT ss.media_id, ss.f, ctab.u, sum(ctab.cv * ss.g) AS tval
      FROM ss JOIN {_dct8_values_sql()} ON ctab.k = ss.sub
      GROUP BY 1, 2, 3
    ),
    code AS (  -- 7 gradient bits per frame
      SELECT x.media_id, x.f,
             CAST(sum(CASE WHEN x.tval > y.tval
                           THEN CAST(1 AS BIGINT) << x.u ELSE 0 END)
               AS BIGINT) AS cd
      FROM tm x JOIN tm y
        ON x.media_id = y.media_id AND x.f = y.f AND y.u = x.u + 1
      WHERE x.u < 7
      GROUP BY 1, 2
    ),
    sh0 AS (
      SELECT media_id, cd,
             lead(cd, 1) OVER w AS c1, lead(cd, 2) OVER w AS c2,
             lead(cd, 3) OVER w AS c3
      FROM code WINDOW w AS (PARTITION BY media_id ORDER BY f)
    ),
    sh AS (
      SELECT DISTINCT media_id,
             ((cd * 128 + c1) * 128 + c2) * 128 + c3 AS sh
      FROM sh0 WHERE c3 IS NOT NULL
    ),
    cnt AS (SELECT media_id, count(*) AS n_sh FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.media_id AS media_a, b.media_id AS media_b,
             count(*) AS n_shared
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.media_id < b.media_id
      GROUP BY 1, 2
    )
    SELECT p.media_a, p.media_b, p.n_shared, ca.n_sh AS n_a, cb.n_sh AS n_b
    FROM pairs p
    JOIN cnt ca ON ca.media_id = p.media_a
    JOIN cnt cb ON cb.media_id = p.media_b
    WHERE 5 * p.n_shared >= 4 * least(ca.n_sh, cb.n_sh)
    ORDER BY media_a, media_b"""


# registered below the dict literal because the SQL is assembled after
# ORACLES is defined (the VALUES table is generated from the Python-side
# DCT8 constant — one source of truth)
ORACLES["dedup_image_phash"] = _IMAGE_PHASH_SQL
ORACLES["dedup_audio_fingerprint"] = _AUDIO_FP_SQL

# the composite keep-list: both hash pipelines rerun closed-form (the
# image chain via the shared fragment, the audio chain with the
# group-keyed params), text via md5 equality, then the same 1-hop
# minimum canonical rule and per-modality counts
ORACLES["pipeline_multimodal_dedup"] = f"""
    WITH src AS (
      SELECT doc_id, md5(text) AS fp
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    params AS (  -- image: group-keyed pattern, brightness variant per doc
      SELECT doc_id AS media_id, 8 * (doc_id % 5) AS delta,
             ((doc_id - doc_id % 5) // 5) % 5 + 1 AS ax,
             (2 * ((doc_id - doc_id % 5) // 5)) % 5 + 1 AS ay,
             ((doc_id - doc_id % 5) // 5) % 3 + 1 AS k,
             (((doc_id - doc_id % 5) // 5) * 13) % 97 AS c
      FROM src
    ),
    {_DHASH_CHAIN_SQL.lstrip()},
    ipairs AS (
      SELECT a.media_id AS da, b.media_id AS db
      FROM dh a JOIN dh b
        ON a.media_id < b.media_id
       AND bit_count(xor(a.dhash, b.dhash)) <= 3
    ),
    apar AS (  -- audio: group-keyed signal, gain variant per doc
      SELECT doc_id AS media_id, doc_id % 5 + 1 AS scale,
             (doc_id - doc_id % 5) % 37 + 2 AS a1,
             (doc_id - doc_id % 5) % 5 + 1 AS a2,
             (doc_id - doc_id % 5) % 211 AS c,
             17 + ((doc_id - doc_id % 5) * 7) % 23 AS md,
             12 + (doc_id - doc_id % 5) % 8 AS nf
      FROM src
    ),
    smp AS (
      SELECT p.media_id, CAST(tt.t AS BIGINT) AS t,
             ((p.a1 * tt.t + p.a2 * ((tt.t * tt.t) % p.md) + p.c) % 2048
               - 1024) * p.scale AS s
      FROM apar p, (SELECT unnest(range(1216)) AS t) tt
      WHERE tt.t < 64 * p.nf
    ),
    ss AS (
      SELECT media_id, t // 64 AS f, (t % 64) // 8 AS sub, sum(s) AS g
      FROM smp GROUP BY 1, 2, 3
    ),
    tm AS (
      SELECT ss.media_id, ss.f, ctab.u, sum(ctab.cv * ss.g) AS tval
      FROM ss JOIN {_dct8_values_sql()} ON ctab.k = ss.sub
      GROUP BY 1, 2, 3
    ),
    code AS (
      SELECT x.media_id, x.f,
             CAST(sum(CASE WHEN x.tval > y.tval
                           THEN CAST(1 AS BIGINT) << x.u ELSE 0 END)
               AS BIGINT) AS cd
      FROM tm x JOIN tm y
        ON x.media_id = y.media_id AND x.f = y.f AND y.u = x.u + 1
      WHERE x.u < 7
      GROUP BY 1, 2
    ),
    sh0 AS (
      SELECT media_id, cd,
             lead(cd, 1) OVER w AS c1, lead(cd, 2) OVER w AS c2,
             lead(cd, 3) OVER w AS c3
      FROM code WINDOW w AS (PARTITION BY media_id ORDER BY f)
    ),
    ash AS (
      SELECT DISTINCT media_id,
             ((cd * 128 + c1) * 128 + c2) * 128 + c3 AS sh
      FROM sh0 WHERE c3 IS NOT NULL
    ),
    acnt AS (SELECT media_id, count(*) AS n_sh FROM ash GROUP BY 1),
    apairs AS (
      SELECT p.da, p.db FROM (
        SELECT a.media_id AS da, b.media_id AS db, count(*) AS n_shared
        FROM ash a JOIN ash b ON a.sh = b.sh AND a.media_id < b.media_id
        GROUP BY 1, 2
      ) p
      JOIN acnt ca ON ca.media_id = p.da
      JOIN acnt cb ON cb.media_id = p.db
      WHERE 5 * p.n_shared >= 4 * least(ca.n_sh, cb.n_sh)
    ),
    vparams AS (  -- video: %30-keyed clip params, one row per (doc, frame);
                  -- docs d and d+30 are brightness twins across 5-groups
      SELECT s.doc_id * 16 + ff.f AS media_id,
             8 * (s.doc_id // 30) AS delta,
             (s.doc_id % 30) % 23 + 1 AS ax,
             ((s.doc_id % 30) * 7) % 19 + 1 AS ay,
             ((s.doc_id % 30) % 3 + ff.f) % 3 + 1 AS k,
             ((s.doc_id % 30) * 17) % 97 + 13 * ff.f AS c
      FROM src s, (SELECT unnest(range(11)) AS f) ff
      WHERE ff.f < 6 + (s.doc_id % 30) % 5
    ),
    {_VDHASH_CHAIN_SQL.lstrip()},
    vseq AS (
      SELECT media_id // 16 AS vid, dhash,
             lead(dhash, 1) OVER (
               PARTITION BY media_id // 16 ORDER BY media_id % 16
             ) AS nxt
      FROM vdh
    ),
    vsh AS (
      SELECT DISTINCT vid,
             CAST(dhash AS VARCHAR) || ':' || CAST(nxt AS VARCHAR) AS sh
      FROM vseq WHERE nxt IS NOT NULL
    ),
    vcnt AS (SELECT vid, count(*) AS n_sh FROM vsh GROUP BY 1),
    vpairs AS (
      SELECT p.da, p.db FROM (
        SELECT a.vid AS da, b.vid AS db, count(*) AS n_shared
        FROM vsh a JOIN vsh b ON a.sh = b.sh AND a.vid < b.vid
        GROUP BY 1, 2
      ) p
      JOIN vcnt ca ON ca.vid = p.da
      JOIN vcnt cb ON cb.vid = p.db
      WHERE 5 * p.n_shared >= 4 * least(ca.n_sh, cb.n_sh)
    ),
    tpairs AS (
      SELECT a.doc_id AS da, b.doc_id AS db
      FROM src a JOIN src b ON a.fp = b.fp AND a.doc_id < b.doc_id
    ),
    sym AS (
      SELECT da AS doc_id, db AS partner, 'image' AS modality FROM ipairs
      UNION ALL SELECT db, da, 'image' FROM ipairs
      UNION ALL SELECT da, db, 'audio' FROM apairs
      UNION ALL SELECT db, da, 'audio' FROM apairs
      UNION ALL SELECT da, db, 'video' FROM vpairs
      UNION ALL SELECT db, da, 'video' FROM vpairs
      UNION ALL SELECT da, db, 'text' FROM tpairs
      UNION ALL SELECT db, da, 'text' FROM tpairs
    ),
    agg AS (
      SELECT doc_id, min(partner) AS mp,
             sum(CASE WHEN modality = 'image' THEN 1 ELSE 0 END) AS ni,
             sum(CASE WHEN modality = 'audio' THEN 1 ELSE 0 END) AS na,
             sum(CASE WHEN modality = 'video' THEN 1 ELSE 0 END) AS nv,
             sum(CASE WHEN modality = 'text' THEN 1 ELSE 0 END) AS nt
      FROM sym GROUP BY doc_id
    )
    SELECT s.doc_id,
           least(s.doc_id, coalesce(a.mp, s.doc_id)) AS canonical_id,
           least(s.doc_id, coalesce(a.mp, s.doc_id)) != s.doc_id AS is_dup,
           CAST(coalesce(a.ni, 0) AS BIGINT) AS n_image_matches,
           CAST(coalesce(a.na, 0) AS BIGINT) AS n_audio_matches,
           CAST(coalesce(a.nv, 0) AS BIGINT) AS n_video_matches,
           CAST(coalesce(a.nt, 0) AS BIGINT) AS n_text_matches
    FROM src s LEFT JOIN agg a USING (doc_id)
    ORDER BY s.doc_id"""

# the video row rides the SAME dHash chain, one row per (clip, frame):
# the chain's media_id key is fid = clip*16 + frame (nf <= 10 < 16),
# per-frame drift rides the chain's k/c params, and shingles pair
# consecutive frame hashes via lead() — exact equality, not hamming
ORACLES["dedup_video_fingerprint"] = f"""
    WITH src AS (
      SELECT doc_id, octet_length(encode(text)) AS n,
             ascii(substr(text, 1, 1)) AS b0,
             ascii(substr(text, 2, 1)) AS b1,
             ascii(substr(text, 3, 1)) AS b2
      FROM documents
      WHERE doc_id < 60 AND octet_length(encode(text)) BETWEEN 48 AND 599
    ),
    clips AS (  -- original (even id; %9==4 truncated -> dropped) + twin
      SELECT doc_id, doc_id * 2 AS vid, 0 AS delta
      FROM src WHERE doc_id % 9 != 4
      UNION ALL
      SELECT doc_id, doc_id * 2 + 1, 40 FROM src
    ),
    params AS (
      SELECT c.vid * 16 + ff.f AS media_id, c.delta,
             s.b0 % 5 + 1 AS ax, s.b1 % 5 + 1 AS ay,
             (s.b2 % 3 + ff.f) % 3 + 1 AS k,
             s.doc_id % 97 + 13 * ff.f AS c
      FROM clips c
      JOIN src s USING (doc_id),
           (SELECT unnest(range(10)) AS f) ff
      WHERE ff.f < 6 + s.n % 5
    ),
    {_DHASH_CHAIN_SQL.lstrip()},
    seq AS (
      SELECT media_id // 16 AS vid, media_id % 16 AS f, dhash,
             lead(dhash, 1) OVER (
               PARTITION BY media_id // 16 ORDER BY media_id % 16
             ) AS nxt
      FROM dh
    ),
    sh AS (
      SELECT DISTINCT vid,
             CAST(dhash AS VARCHAR) || ':' || CAST(nxt AS VARCHAR) AS sh
      FROM seq WHERE nxt IS NOT NULL
    ),
    cnt AS (SELECT vid, count(*) AS n_sh FROM sh GROUP BY 1),
    pairs AS (
      SELECT a.vid AS media_a, b.vid AS media_b, count(*) AS n_shared
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.vid < b.vid
      GROUP BY 1, 2
    )
    SELECT p.media_a, p.media_b, p.n_shared, ca.n_sh AS n_a, cb.n_sh AS n_b
    FROM pairs p
    JOIN cnt ca ON ca.vid = p.media_a
    JOIN cnt cb ON cb.vid = p.media_b
    WHERE 5 * p.n_shared >= 4 * least(ca.n_sh, cb.n_sh)
    ORDER BY media_a, media_b"""

QUERIES = {
    "pipeline_multimodal_dedup": q_pipeline_multimodal_dedup,
    "dedup_video_fingerprint": q_dedup_video_fingerprint,
    "dedup_audio_fingerprint": q_dedup_audio_fingerprint,
    "dedup_image_phash": q_dedup_image_phash,
    "dedup_containment": q_dedup_containment,
    "dedup_exact_normalized": q_dedup_exact_normalized,
    "dedup_minhash_capped": q_dedup_minhash_capped,
    "dedup_cluster_keep": q_dedup_cluster_keep,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_simhash": q_dedup_simhash,
    "dedup_simhash_pairs": q_dedup_simhash_pairs,
}
