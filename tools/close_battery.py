"""One-command closing battery: the checks every round must end green.

Usage: python tools/close_battery.py [--skip-oracle] [--skip-bench]
                                     [--skip-scaling]

Runs, in order, and prints one JSON line with each result:
  1. staleness_check        — rotation-ledger invariant (fast, pure python)
  2. plan audit             — anti-pattern sweep over the whole registry
  3. driver-window oracle   — the FIRST 50 registry rows vs DuckDB at
                              sf0.01 (the composition the driver will
                              actually check)
  4. bench at sf0.01 AND sf0.1 (unless --skip-scaling: sf0.01 only) —
                              smoke that bench.py emits its JSON line,
                              and the recorded sf0.1 numbers
  5. scaling gate (r15, VERDICT r14 #7) — tools/scaling_probe.py over
                              the two bench artifacts just produced; a
                              HARD failure if any >=1 s query's implied
                              per-decade exponent exceeds 1.2 (a
                              superlinear mover must not survive a
                              round)

Exit code 1 if any stage fails. pytest is intentionally NOT run here —
it takes ~25 minutes and should run (often in the background) on its
own; this battery is the fast-feedback remainder.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd: list, timeout: int) -> tuple:
    r = subprocess.run(
        cmd, cwd=ROOT, capture_output=True, text=True, timeout=timeout
    )
    return r.returncode, (r.stdout + r.stderr).strip().splitlines()


def main() -> None:
    skip_oracle = "--skip-oracle" in sys.argv
    skip_bench = "--skip-bench" in sys.argv
    out: dict = {}
    ok = True

    rc, lines = run([sys.executable, "tools/staleness_check.py"], 300)
    # same defense as the plan-audit stage: stderr (warnings from the
    # pyspark import chain) can trail the JSON line — scan backwards
    stale = next(
        (
            json.loads(ln)
            for ln in reversed(lines)
            if ln.strip().startswith("{") and '"violations"' in ln
        ),
        {"rc": rc},
    )
    out["staleness"] = stale
    ok &= rc == 0 and not stale.get("violations")

    rc, lines = run([sys.executable, "tools/plan_audit.py"], 1800)
    # the JSON line can precede trailing Spark progress-bar stderr — scan
    # backwards for the audit line instead of trusting the last line
    audit = None
    for ln in reversed(lines):
        ln = ln.strip()
        if ln.startswith("{") and "queries_audited" in ln:
            try:
                audit = json.loads(ln)
                break
            except json.JSONDecodeError:
                continue
    if audit is None:
        audit, rc = {"unparseable": (lines[-1] if lines else "")[-200:]}, rc or 1
    out["plan_audit"] = audit
    ok &= rc == 0 and not audit.get("flagged") and not audit.get(
        "forced_hints_flagged"
    )

    if not skip_oracle:
        sys.path.insert(0, ROOT)
        from octopusdb_spark.queries import REGISTRY

        names = list(REGISTRY)[:50]
        rc, lines = run(
            [sys.executable, "tools/oracle_check.py", *names], 3000
        )
        summary = next(
            (ln for ln in reversed(lines) if "pass," in ln), "no summary"
        )
        out["window_oracle"] = {"rc": rc, "summary": summary}
        ok &= rc == 0 and " 0 fail" in summary

    if not skip_bench:
        skip_scaling = "--skip-scaling" in sys.argv
        bench_out: dict = {}
        for sf in ("0.01",) if skip_scaling else ("0.01", "0.1"):
            env = dict(
                os.environ,
                SPARK_GRAFT_SF_DIR=f"/root/testdata/sf{sf}",
                SPARK_GRAFT_SKIP_MAINTENANCE="1",
            )
            r = subprocess.run(
                [sys.executable, "bench.py"], cwd=ROOT, capture_output=True,
                text=True, timeout=1800, env=env,
            )
            path = os.path.join(ROOT, f".close_bench_sf{sf}.json")
            with open(path, "w") as f:
                f.write(r.stdout)
            bench_out[sf] = path
            line = (
                r.stdout.strip().splitlines()[-1] if r.stdout.strip() else "{}"
            )
            try:
                b = json.loads(line)
                out[f"bench_sf{sf}"] = {
                    "rc": r.returncode, "queries": len(b.get("queries", {})),
                    # the compact tail line no longer carries "value"
                    # (headroom lever) — the total is the map's sum
                    "total_sec": b.get("value") if b.get("value") is not None
                    else round(sum(b.get("queries", {}).values()), 3),
                }
                ok &= r.returncode == 0 and len(b.get("queries", {})) > 0
            except json.JSONDecodeError:
                out[f"bench_sf{sf}"] = {
                    "rc": r.returncode, "unparseable": line[-200:]
                }
                ok = False

        # empirical scale gate (VERDICT r14 #7): both SFs just ran, so
        # the 10x probe is free — any per-decade exponent above 1.2 on a
        # >=1 s query is a superlinear regression and FAILS the battery
        if not skip_scaling and "0.1" in bench_out:
            rc, lines = run(
                [
                    sys.executable, "tools/scaling_probe.py",
                    bench_out["0.01"], bench_out["0.1"],
                    "--gate-exponent=1.2",
                ],
                300,
            )
            probe = next(
                (
                    json.loads(ln)
                    for ln in reversed(lines)
                    if ln.strip().startswith("{") and '"n_common"' in ln
                ),
                {"rc": rc},
            )
            out["scaling_gate"] = {
                "rc": rc,
                "median_ratio": probe.get("median_ratio"),
                "worst": probe.get("worst"),
                "violations": (probe.get("gate") or {}).get("violations"),
            }
            ok &= rc == 0

    out["ok"] = ok
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
