"""Empirical scale check: compare two bench artifacts (or raw bench
stdout files) taken at DIFFERENT scale factors and report per-query
wall-clock ratios — the measured answer to "would this plan survive a
10x/100x scale-up".

Usage: python tools/scaling_probe.py SMALL.json BIG.json [--sf-ratio 10]

Prints one JSON line:
  - median and per-query ratios (big/small), steepest movers first;
  - the implied per-decade exponent (log10(ratio)/log10(sf_ratio)) for
    the worst mover — anything approaching or exceeding 1.0 means the
    query's wall clock is tracking data linearly (fine for scans, a
    regression for probes/drills), and anything well ABOVE 1.0 is a
    superlinear red flag (all-pairs join, unpushed filter);
  - queries present in only one artifact.

Pure arithmetic, no Spark; belongs next to tools/bench_compare.py in
the closing battery when a small-SF bench was recorded that round.
The r14 reading (sf0.01 vs sf0.1, 68 queries): median 1.19x, worst
4.88x (dedup_semantic, inside its documented cluster-mass bound) —
recorded in BASELINE.md as the regression tripwire baseline.
"""

from __future__ import annotations

import json
import math
import re
import sys


def load(path: str) -> dict:
    """Accept a driver artifact ({"tail": ...}), a bench stdout capture,
    or a bare record; salvage a head-truncated line like bench_compare."""
    with open(path) as f:
        raw = f.read()
    i = raw.rfind('{"metric"')
    if i >= 0:
        line = raw[i:].strip().splitlines()[0]
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            pass
    try:
        d = json.loads(raw.strip().splitlines()[-1])
        if "queries" in d:
            return d
        if "tail" in d:
            return load_tail(d["tail"])
    except (json.JSONDecodeError, IndexError):
        pass
    return {"queries": salvage(raw)}


def load_tail(tail: str) -> dict:
    for line in reversed(tail.strip().splitlines()):
        try:
            d = json.loads(line)
            if "queries" in d:
                return d
        except json.JSONDecodeError:
            continue
    return {"queries": salvage(tail)}


def salvage(text: str) -> dict:
    not_queries = {"queries", "value", "sf", "median", "shuffle_median",
                   "metric", "unit", "n", "rc", "cpus"}
    return {
        k: float(v)
        for k, v in re.findall(r'"([a-z0-9_]+)": ?([0-9]+(?:\.[0-9]+)?)', text)
        if k not in not_queries
    }


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_ratio = 10.0
    gate_exponent = None
    min_big_sec = 1.0
    for a in sys.argv[1:]:
        if a.startswith("--sf-ratio="):
            sf_ratio = float(a.split("=", 1)[1])
        elif a.startswith("--gate-exponent="):
            gate_exponent = float(a.split("=", 1)[1])
        elif a.startswith("--min-big-sec="):
            min_big_sec = float(a.split("=", 1)[1])
        elif a.startswith("--"):
            # ADVICE r15: a misspelled or space-separated flag used to be
            # silently dropped, disabling the hard gate while exiting 0.
            raise SystemExit(f"unrecognized flag: {a}\n{__doc__}")
    if len(argv) != 2:
        raise SystemExit(__doc__)
    small, big = load(argv[0]), load(argv[1])
    qs, qb = small["queries"], big["queries"]
    common = sorted(k for k in qb if k in qs and qs[k] > 0)
    ratios = sorted(
        ((round(qb[k] / qs[k], 3), k) for k in common), reverse=True
    )
    med = sorted(r for r, _ in ratios)[len(ratios) // 2] if ratios else None
    worst = ratios[0] if ratios else (None, None)

    def exponent(r: float) -> float:
        return round(math.log10(r) / math.log10(sf_ratio), 3) if r > 0 else 0.0

    out = {
        "n_common": len(common),
        "median_ratio": med,
        "worst": {
            "query": worst[1],
            "ratio": worst[0],
            "per_decade_exponent": (
                exponent(worst[0]) if worst[0] else None
            ),
        },
        "steepest": [{"query": k, "ratio": r} for r, k in ratios[:10]],
        "only_small": sorted(set(qs) - set(qb)),
        "only_big": sorted(set(qb) - set(qs)),
    }
    if gate_exponent is not None:
        # the closing-battery HARD GATE (VERDICT r14 #7): any query whose
        # implied per-decade exponent exceeds the threshold fails the
        # battery — a superlinear mover (all-pairs join, unpushed filter)
        # must not survive a round. Queries under min_big_sec at the big
        # SF are exempt: fixed scheduling overhead on sub-second drills
        # produces noisy ratios that say nothing about data scaling.
        out["gate"] = {
            "max_exponent": gate_exponent,
            "min_big_sec": min_big_sec,
            "violations": [
                {"query": k, "ratio": r, "per_decade_exponent": exponent(r)}
                for r, k in ratios
                if qb[k] >= min_big_sec and exponent(r) > gate_exponent
            ],
        }
    print(json.dumps(out))
    if gate_exponent is not None and out["gate"]["violations"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
