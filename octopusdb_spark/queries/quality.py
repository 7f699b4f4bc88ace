"""Data-quality audit operators — the profiling pass every large-scale
pipeline runs before trusting a table (no reference analog; this round's
maintenance benchmark caught the synthetic lineitem carrying ~24% duplicate
primary keys, which is exactly what these queries surface).

Both are single-pass aggregations (map-side partial, one shuffle):
- column profile: null/distinct/min/max per column without per-column scans;
- key-uniqueness audit: duplicate composite-key groups, worst offenders
  first.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from octopusdb_spark.queries.common import t


def q_quality_column_profile(spark, sf_dir):
    """Per-column profile of orders in ONE scan: null count, distinct count,
    min/max — the multi-aggregate trick (count(when isNull) per column)
    instead of a scan per column."""
    o = t(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"{c}_nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}_distinct"),
        ]
    row = o.agg(F.count("*").alias("n_rows"), *aggs)
    # unpivot to (column, nulls, distinct) rows so the schema is stable
    pairs = [
        F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}_nulls").alias("n_nulls"),
            F.col(f"{c}_distinct").alias("n_distinct"),
        )
        for c in cols
    ]
    return (
        row.select(F.col("n_rows"), F.explode(F.array(*pairs)).alias("p"))
        .select(F.col("p.column").alias("column"), "n_rows", "p.n_nulls", "p.n_distinct")
        .orderBy("column")
    )


def q_quality_duplicate_keys(spark, sf_dir):
    """Composite-key uniqueness audit on lineitem (l_orderkey, l_linenumber):
    total rows, distinct keys, duplicated keys, and worst multiplicity —
    the check that catches silent fan-out before a join amplifies it. (This
    synthetic corpus really does have ~24% duplicate keys.)"""
    li = t(spark, sf_dir, "lineitem")
    per_key = li.groupBy("l_orderkey", "l_linenumber").agg(F.count("*").alias("copies"))
    return per_key.agg(
        F.sum("copies").alias("n_rows"),
        F.count("*").alias("n_distinct_keys"),
        F.count(F.when(F.col("copies") > 1, 1)).alias("n_duplicated_keys"),
        F.max("copies").alias("max_multiplicity"),
    )


def q_quality_pattern_scan(spark, sf_dir):
    """Pattern-based content filter — the PII/blocklist scan shape every
    corpus pipeline runs before release (emails, phone numbers, banned
    terms). The pattern here targets terms present in the synthetic corpus
    ('vector' or 'stream' as whole words); production swaps in PII regexes
    unchanged. One scan with a conditional aggregation per source — the
    regex runs codegen-side (RLIKE), no UDF."""
    docs = t(spark, sf_dir, "documents")
    hit = F.col("text").rlike(r"\b(vector|stream)\b")
    return (
        docs.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.count(F.when(hit, 1)).alias("n_flagged"),
            F.round(
                F.count(F.when(hit, 1)).cast("double") / F.count("*"), 6
            ).alias("flag_rate"),
        )
        .orderBy("source")
    )



def q_quality_filter_reasons(spark, sf_dir):
    """Rule-based document filter with REASONS — the keep/drop decision a
    training pipeline has to audit: each rule is a columnar predicate, the
    reasons column concatenates every failed rule (fixed rule order, so
    the value is deterministic), keep = no rule failed. Pure projection +
    one final order; rules are evaluated in a single pass with no UDF."""
    docs = t(spark, sf_dir, "documents")
    n_alpha = F.length(F.regexp_replace("text", "[^a-zA-Z]", ""))
    n_digit = F.length(F.regexp_replace("text", "[^0-9]", ""))
    rules = [
        ("too_short", F.col("n_chars") < 100),
        ("low_alpha", n_alpha.cast("double") / F.col("n_chars") < 0.5),
        ("digit_heavy", n_digit.cast("double") / F.col("n_chars") > 0.2),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in rules]
    )
    return (
        docs.select(
            "doc_id",
            reasons.alias("reasons"),
            (reasons == "").alias("keep"),
        )
        .orderBy("doc_id")
    )

def q_quality_distribution_drift(spark, sf_dir):
    """Distribution drift between two corpus slices — the audit a pipeline
    runs before mixing a NEW data batch into an existing training corpus
    (has the token distribution shifted?). The even-doc_id slice plays the
    reference corpus, the odd slice the incoming batch; per source-label
    token histograms are compared with two standard drift statistics over
    the top-20 reference tokens:

    - chi-square contribution: (o_new - e)^2 / e with e the count the new
      slice WOULD have at the reference rate (scaled by slice totals) —
      pure rational arithmetic, bit-exact across engines;
    - total-variation contribution: |p_new - p_ref| / 2 over the token's
      probability masses.

    One scan + two small keyed aggs; the 20-row drift report is the
    fixed-size output. At 100 TB both histograms are mergeable partial
    aggregations, and the report stays 20 rows."""
    toks = (
        t(spark, sf_dir, "documents")
        .select(
            (F.col("doc_id") % 2 == 0).alias("is_ref"),
            F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
    )
    hist = toks.groupBy("tok").agg(
        F.count(F.when(F.col("is_ref"), 1)).alias("ref_cnt"),
        F.count(F.when(~F.col("is_ref"), 1)).alias("new_cnt"),
    )
    totals = toks.groupBy().agg(
        F.count(F.when(F.col("is_ref"), 1)).alias("ref_total"),
        F.count(F.when(~F.col("is_ref"), 1)).alias("new_total"),
    )
    top = hist.orderBy(F.desc("ref_cnt"), "tok").limit(20)
    # expected count at the reference rate; spelled with the same operation
    # order as the oracle SQL so the doubles are bit-identical (integer
    # product first — exact in int64 — then ONE double division)
    e = (F.col("ref_cnt") * F.col("new_total")) / F.col("ref_total")
    d = F.col("new_cnt") - e
    return (
        top.crossJoin(F.broadcast(totals))  # 1-row totals frame
        .select(
            "tok",
            "ref_cnt",
            "new_cnt",
            F.round(d * d / e, 6).alias("chi2_r6"),
            F.round(
                F.abs(
                    F.col("new_cnt") / F.col("new_total")
                    - F.col("ref_cnt") / F.col("ref_total")
                )
                / 2,
                6,
            ).alias("tv_r6"),
        )
        .orderBy("tok")
    )


ORACLES = {
    # same rational arithmetic on both engines: histogram per slice, top-20
    # reference tokens, chi-square + total-variation contributions
    "quality_distribution_drift": """
        WITH toks AS (
          SELECT doc_id % 2 = 0 AS is_ref, t.tok
          FROM documents,
               unnest(string_split_regex(lower(text), '\\s+')) AS t(tok)
          WHERE length(t.tok) > 0
        ),
        hist AS (
          SELECT tok,
                 count(*) FILTER (WHERE is_ref) AS ref_cnt,
                 count(*) FILTER (WHERE NOT is_ref) AS new_cnt
          FROM toks GROUP BY tok
        ),
        totals AS (
          SELECT count(*) FILTER (WHERE is_ref) AS ref_total,
                 count(*) FILTER (WHERE NOT is_ref) AS new_total
          FROM toks
        ),
        top AS (SELECT * FROM hist ORDER BY ref_cnt DESC, tok LIMIT 20),
        stats AS (
          SELECT tok, ref_cnt, new_cnt,
                 (ref_cnt * new_total) / CAST(ref_total AS DOUBLE) AS e,
                 ref_total, new_total
          FROM top CROSS JOIN totals
        )
        SELECT tok,
               CAST(ref_cnt AS BIGINT) AS ref_cnt,
               CAST(new_cnt AS BIGINT) AS new_cnt,
               round((new_cnt - e) * (new_cnt - e) / e, 6) AS chi2_r6,
               round(abs(new_cnt / CAST(new_total AS DOUBLE)
                         - ref_cnt / CAST(ref_total AS DOUBLE)) / 2, 6) AS tv_r6
        FROM stats ORDER BY tok""",
    "quality_filter_reasons": """
        WITH r AS (
          SELECT doc_id,
                 n_chars < 100 AS too_short,
                 CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE) / n_chars < 0.5 AS low_alpha,
                 CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / n_chars > 0.2 AS digit_heavy
          FROM documents
        )
        SELECT doc_id,
               concat_ws(',',
                 CASE WHEN too_short THEN 'too_short' END,
                 CASE WHEN low_alpha THEN 'low_alpha' END,
                 CASE WHEN digit_heavy THEN 'digit_heavy' END) AS reasons,
               NOT (too_short OR low_alpha OR digit_heavy) AS keep
        FROM r ORDER BY doc_id""",
    "quality_pattern_scan": r"""
        SELECT source, count(*) AS n_docs,
               count(CASE WHEN regexp_matches(text, '\b(vector|stream)\b')
                     THEN 1 END) AS n_flagged,
               round(CAST(count(CASE WHEN regexp_matches(text, '\b(vector|stream)\b')
                          THEN 1 END) AS DOUBLE) / count(*), 6) AS flag_rate
        FROM documents GROUP BY source ORDER BY source""",
    "quality_column_profile": """
        WITH agg AS (
          SELECT count(*) AS n_rows,
                 count(CASE WHEN o_orderkey IS NULL THEN 1 END) AS k_nulls,
                 count(DISTINCT o_orderkey) AS k_distinct,
                 count(CASE WHEN o_custkey IS NULL THEN 1 END) AS c_nulls,
                 count(DISTINCT o_custkey) AS c_distinct,
                 count(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS s_nulls,
                 count(DISTINCT o_orderstatus) AS s_distinct,
                 count(CASE WHEN o_totalprice IS NULL THEN 1 END) AS t_nulls,
                 count(DISTINCT o_totalprice) AS t_distinct,
                 count(CASE WHEN o_orderpriority IS NULL THEN 1 END) AS p_nulls,
                 count(DISTINCT o_orderpriority) AS p_distinct
          FROM orders
        )
        SELECT 'o_custkey' AS "column", n_rows, c_nulls AS n_nulls, c_distinct AS n_distinct FROM agg
        UNION ALL
        SELECT 'o_orderkey', n_rows, k_nulls, k_distinct FROM agg
        UNION ALL
        SELECT 'o_orderpriority', n_rows, p_nulls, p_distinct FROM agg
        UNION ALL
        SELECT 'o_orderstatus', n_rows, s_nulls, s_distinct FROM agg
        UNION ALL
        SELECT 'o_totalprice', n_rows, t_nulls, t_distinct FROM agg
        ORDER BY "column" """,
    "quality_duplicate_keys": """
        WITH per_key AS (
          SELECT l_orderkey, l_linenumber, count(*) AS copies
          FROM lineitem GROUP BY 1, 2
        )
        SELECT CAST(sum(copies) AS BIGINT) AS n_rows,
               count(*) AS n_distinct_keys,
               count(CASE WHEN copies > 1 THEN 1 END) AS n_duplicated_keys,
               max(copies) AS max_multiplicity
        FROM per_key""",
}

QUERIES = {
    "quality_column_profile": q_quality_column_profile,
    "quality_duplicate_keys": q_quality_duplicate_keys,
    "quality_pattern_scan": q_quality_pattern_scan,
    "quality_filter_reasons": q_quality_filter_reasons,
    "quality_distribution_drift": q_quality_distribution_drift,
}
