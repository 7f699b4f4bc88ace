"""Compare two bench artifacts with calibration-aware ratios.

Usage: python tools/bench_compare.py BENCH_A.json BENCH_B.json [--band 1.25]

Prints one JSON line:
  - per-query wall-clock ratio B/A for every query present in both runs
    (movers outside the band listed separately, fastest/slowest first);
  - matched-total ratio (the round-over-round headline the verdict
    computes by hand every round);
  - calibration context for both runs (CPU + shuffle medians) and the
    shuffle-drift ratio, so a mover can be read against box state
    instead of guessed at;
  - queries only in one run (new rows / removed rows).

The tool is pure arithmetic on the artifacts — no Spark session — so it
runs in milliseconds and belongs in the closing battery next to
tools/staleness_check.py.
"""

from __future__ import annotations

import json
import sys


def _salvage_tail(tail: str) -> dict:
    """The driver's BENCH_r{N}.json keeps only the TAIL of the bench
    stdout, usually cutting the JSON line's head mid-queries. Salvage:
    regex the (name, seconds) pairs before the '"sf":' marker (the first
    pair may be truncated and is dropped by the leading-quote anchor) and
    brace-match the calibration object, which survives whole."""
    import re

    # bound the pair scan to the queries dict: start AFTER '"queries"' when
    # that survived the cut, stop at the '"sf":' marker — otherwise fields
    # like the top-level "value" total or the calibration medians would be
    # salvaged as phantom queries
    start = tail.find('"queries"')
    cut = tail.find('"sf":')
    if start < 0 and cut < 0:
        return {"queries": {}, "salvaged_from_tail": True,
                "salvage_note": "no queries/sf markers in tail"}
    region = tail[start if start >= 0 else 0 : cut if cut >= 0 else len(tail)]
    not_queries = {"queries", "value", "sf", "n", "rc", "cpus", "median",
                   "shuffle_median", "metric", "unit"}
    queries = {
        name: float(sec)
        for name, sec in re.findall(r'"([A-Za-z0-9_]+)": ?([0-9]+(?:\.[0-9]+)?)', region)
        if name not in not_queries
    }
    out: dict = {"queries": queries, "salvaged_from_tail": True}
    cal = tail.find('"calibration":')
    if cal >= 0:
        start = tail.find("{", cal)
        depth, end = 0, start
        for i in range(start, len(tail)):
            depth += tail[i] == "{"
            depth -= tail[i] == "}"
            if depth == 0:
                end = i + 1
                break
        try:
            out["calibration"] = json.loads(tail[start:end])
        except json.JSONDecodeError:
            pass
    return out


def load(path: str) -> dict:
    with open(path) as f:
        txt = f.read().strip()
    # bench artifacts are one JSON line, possibly with a driver wrapper
    # {"tail": "..."} — unwrap if needed
    d = json.loads(txt)
    if "queries" not in d and "tail" in d:
        # the driver's BENCH_r{N}.json stores the bench stdout tail; the
        # full JSON line survives only if the tail window was big enough
        for line in reversed(d["tail"].strip().splitlines()):
            line = line.strip()
            if line.startswith("{"):
                try:
                    inner = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "queries" in inner:
                    return inner
        return _salvage_tail(d["tail"])
    return d


def calib(d: dict) -> dict:
    c = d.get("calibration") or {}
    return {
        "cpu": c.get("median"),
        "shuffle": c.get("shuffle_median"),
    }


def main() -> None:
    argv = sys.argv[1:]
    band, args, i = 1.25, [], 0
    while i < len(argv):
        a = argv[i]
        if a == "--band":
            i += 1
            if i >= len(argv):
                raise SystemExit("--band needs a value")
            band = float(argv[i])
        elif a.startswith("--band="):
            band = float(a.split("=", 1)[1])
        elif a.startswith("--"):
            raise SystemExit(f"unknown flag {a}\n{__doc__}")
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        raise SystemExit(__doc__)
    a, b = load(args[0]), load(args[1])
    qa, qb = a["queries"], b["queries"]
    matched = sorted(set(qa) & set(qb))
    ratios = {
        q: round(qb[q] / qa[q], 3) if qa[q] > 0 else None for q in matched
    }
    total_a = sum(qa[q] for q in matched)
    total_b = sum(qb[q] for q in matched)
    ca, cb = calib(a), calib(b)
    shuffle_drift = (
        round(cb["shuffle"] / ca["shuffle"], 3)
        if ca.get("shuffle") and cb.get("shuffle")
        else None
    )
    movers = {
        q: r
        for q, r in sorted(ratios.items(), key=lambda kv: -(kv[1] or 0))
        if r is not None and (r > band or r < 1 / band)
    }
    print(
        json.dumps(
            {
                "matched": len(matched),
                "matched_total_ratio": round(total_b / total_a, 3)
                if total_a
                else None,
                "band": band,
                "movers_outside_band": movers,
                "calibration_a": ca,
                "calibration_b": cb,
                "shuffle_drift_b_over_a": shuffle_drift,
                "only_in_a": sorted(set(qa) - set(qb)),
                "only_in_b": sorted(set(qb) - set(qa)),
            }
        )
    )


if __name__ == "__main__":
    main()
