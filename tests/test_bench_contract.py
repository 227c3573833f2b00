"""bench.py is a driver contract: one JSON line with a fixed key set.
This guards the schema (the r7 two-sweep restructure must not have
changed what the driver parses) without paying for an sf0.1 run —
the HEADLINE set executes at sf0.001 through the same code path."""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_bench_emits_contract_json_line():
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_LOAD_GATE="999",  # never wait in the suite
    )
    out = subprocess.run(
        [sys.executable, "bench.py"],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith('{"metric"')]
    assert len(lines) == 1, f"expected exactly one JSON line, got {lines}"
    d = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "median_value",
                "queries_median", "cold_value", "loadavg", "loadavg_end",
                "load_gate", "sweeps", "sf"):
        assert key in d, f"missing contract key {key}"
    assert d["metric"] == "headline_query_wall_sec"
    assert d["unit"] == "sec"
    assert d["sweeps"] == 2
    assert d["queries"] and set(d["queries"]) == set(d["queries_median"])
    # value is the sum of per-query minima
    assert abs(d["value"] - round(sum(d["queries"].values()), 3)) < 0.01
    # every min <= its median (4 passes, sorted)
    for name, v in d["queries"].items():
        assert v <= d["queries_median"][name] + 1e-9, name


def test_headline_near_dup_entries_are_the_collapse_twins():
    """VERDICT r8 item 2/3: the tracked bench number must measure the
    production near-dup plans (exact-collapse twins), with the raw
    pair-enumeration forms kept only as registered labeled baselines."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import HEADLINE

    assert "dd3b_neardup_after_exact_collapse" in HEADLINE
    assert "dd7b_vector_dedup_collapsed" in HEADLINE
    assert "dd3_minhash_lsh" not in HEADLINE
    assert "dd7_embedding_lsh_neardup" not in HEADLINE
