"""Physical-plan regression gate: representative headline queries must stay
free of scale anti-patterns (cartesian joins, single-task windows, row-wise
Python). The full sweep is `python tools/plan_audit.py`; this keeps the
worst offenders from regressing silently inside the test suite."""

from __future__ import annotations

from tools.plan_audit import audit_one

from octopusdb_spark.queries import REGISTRY

SUBSET = [
    "kv_latest_live",
    "q3_shipping_priority",
    "q_sessionize",
    "graph_pagerank",
    "dedup_minhash_lsh",
    "dedup_cluster_keep",
    "sim_ann_bucketed",
    "q_range_join_bucketed",
    "text_decontaminate",
    "q21_waiting_shape",
]


def test_headline_plans_clean(spark):
    flagged = {}
    for name in SUBSET:
        findings = audit_one(spark, name, REGISTRY[name])
        if findings:
            flagged[name] = findings
    assert not flagged, f"plan anti-patterns: {flagged}"


def test_forced_hint_sweep_flags_sf_scaled_bases(tmp_path):
    """The source-level forced-hint audit: a hint on an SF-scaled relation
    (customer) is flagged; hints on package-wide fixed-size dimension names
    (nation) pass everywhere; generic allow-listed names (`total`, `q`) are
    scoped to the (file, name) pair where they were reviewed, so the same
    name in a DIFFERENT file is flagged (ADVICE r6). The live package must
    sweep clean."""
    import os

    from tools.plan_audit import audit_forced_hints

    pkg = tmp_path / "fakepkg"
    pkg.mkdir()
    (pkg / "bad.py").write_text(
        "df = fact.join(F.broadcast(cust), fact.k == cust.k)\n"
        "ok = fact.join(F.broadcast(nation), fact.n == nation.n)\n"
        # `total` and `q` are allow-listed ONLY in their reviewed files
        # (tpch_extra.py / similarity.py) — here they must be flagged
        "df1 = fact.crossJoin(F.broadcast(total))\n"
        "df1b = fact.join(F.broadcast(q), fact.k == q.k)\n"
        # multi-line call (the regex-era blind spot) and a chained base
        "df2 = fact.join(F.broadcast(\n"
        "    supplier.filter(x)\n"
        "), fact.k == supplier.k)\n"
        # comments/docstrings must NOT false-positive
        "# removed: F.broadcast(part) was a forced hint\n"
        '"""docs mention F.broadcast(orders) without meaning it"""\n'
    )
    flagged = audit_forced_hints(str(pkg))
    assert list(flagged) == ["fakepkg/bad.py"]
    assert sorted(f["base"] for f in flagged["fakepkg/bad.py"]) == [
        "cust", "q", "supplier", "total"
    ]

    repo_pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "octopusdb_spark",
    )
    assert audit_forced_hints(repo_pkg) == {}
