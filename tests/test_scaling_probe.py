"""The closing battery's scaling gate (r15): the probe must flag
superlinear movers, exempt sub-second drills, and exit nonzero only
when gating — pure subprocess tests, no Spark."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(tmp_path, small, big, *flags):
    s, b = tmp_path / "s.json", tmp_path / "b.json"
    s.write_text(json.dumps({"queries": small, "sf": 0.01}))
    b.write_text(json.dumps({"queries": big, "sf": 0.1}))
    r = subprocess.run(
        [sys.executable, "tools/scaling_probe.py", str(s), str(b), *flags],
        capture_output=True, text=True, cwd="/root/repo",
    )
    line = next(
        ln for ln in reversed(r.stdout.strip().splitlines())
        if ln.startswith("{")
    )
    return r.returncode, json.loads(line)


def test_gate_flags_superlinear(tmp_path):
    rc, out = _run(
        tmp_path,
        {"scan": 1.0, "allpairs": 0.5},
        {"scan": 2.0, "allpairs": 12.0},
        "--gate-exponent=1.2",
    )
    assert rc == 1
    flagged = {v["query"] for v in out["gate"]["violations"]}
    assert flagged == {"allpairs"}  # ratio 24 -> exponent 1.38
    assert out["worst"]["query"] == "allpairs"


def test_gate_exempts_subsecond_drills(tmp_path):
    # ratio 25 but the big-SF time is 0.5 s: scheduling noise, exempt
    rc, out = _run(
        tmp_path,
        {"drill": 0.02, "scan": 1.0},
        {"drill": 0.5, "scan": 2.0},
        "--gate-exponent=1.2",
    )
    assert rc == 0 and out["gate"]["violations"] == []
    # ...unless the floor is lowered explicitly
    rc, out = _run(
        tmp_path,
        {"drill": 0.02, "scan": 1.0},
        {"drill": 0.5, "scan": 2.0},
        "--gate-exponent=1.2", "--min-big-sec=0.1",
    )
    assert rc == 1
    assert {v["query"] for v in out["gate"]["violations"]} == {"drill"}


def test_no_gate_flag_never_fails(tmp_path):
    rc, out = _run(
        tmp_path, {"a": 0.1}, {"a": 50.0},
    )
    assert rc == 0 and "gate" not in out
    assert out["worst"]["per_decade_exponent"] > 2
