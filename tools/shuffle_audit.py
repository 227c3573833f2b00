"""Measured shuffle/spill budget per query — the evidence behind every
"one exchange, map-side combined" claim in the docstrings.

Executes registry queries at a given sf dir (noop sink, full execution)
and walks the FINALIZED adaptive plan via py4j, summing the SQL metrics
Spark attaches to each operator: shuffle bytes/records written at every
Exchange, spill sizes on aggregates/sorts/joins, and the exchange
count. Plan-shape gates (tests/test_plan_regressions.py) pin the static
plan; this audits what actually moved at runtime.

Scope caveat: the walk covers the FINAL action's plan. Pipelines that
materialize pinned caches or localCheckpoints in earlier jobs (dd3,
sm2, e1b's bucket pass) report only the last job's exchanges — their
interior shuffle volume is bounded by the plan gates instead. Zeros in
the exchanges column for those queries mean "final job reads a
materialized intermediate", not "no shuffle ever".

Usage: python tools/shuffle_audit.py [sf_dir] [query ...]
       (defaults: sf0.1, the bench HEADLINE set)
Prints one JSON line:
  {"sf_dir": ..., "queries": {name: {"exchanges": n,
   "shuffle_mb": x, "shuffle_records": n, "spill_mb": x}}}
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _walk(node, acc: dict) -> None:
    name = node.nodeName()
    if name.startswith("AdaptiveSparkPlan"):
        _walk(node.executedPlan(), acc)
        return
    if "QueryStage" in name:
        _walk(node.plan(), acc)
        return
    m = node.metrics()
    it = m.keysIterator()
    while it.hasNext():
        k = it.next()
        v = m.apply(k).value()
        if k == "shuffleBytesWritten":
            acc["shuffle_bytes"] += v
        elif k == "shuffleRecordsWritten":
            acc["shuffle_records"] += v
        elif k == "spillSize" or k == "spilledBytes":
            acc["spill_bytes"] += v
    if name.startswith("Exchange") or name.startswith("ShuffleExchange"):
        acc["exchanges"] += 1
    ch = node.children()
    for i in range(ch.size()):
        _walk(ch.apply(i), acc)


def audit(df) -> dict:
    """Execute a DataFrame fully and return its runtime shuffle budget.

    Executes via collect() on THIS frame — a noop write (or count())
    wraps the plan in a new QueryExecution whose metrics never land on
    the inspected instance. Headline outputs are aggregate-sized, so
    the driver materialization is bounded."""
    df.collect()
    acc = {"exchanges": 0, "shuffle_bytes": 0, "shuffle_records": 0, "spill_bytes": 0}
    _walk(df._jdf.queryExecution().executedPlan(), acc)
    return {
        "exchanges": acc["exchanges"],
        "shuffle_mb": round(acc["shuffle_bytes"] / 1e6, 3),
        "shuffle_records": acc["shuffle_records"],
        "spill_mb": round(acc["spill_bytes"] / 1e6, 3),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from etl_pipline_ibrd_loan_system_spark.session import get_session

    spark = get_session("shuffle_audit")
    import __spark_entry__ as entrymod
    from bench import HEADLINE

    qs = entrymod.queries()
    names = sys.argv[2:] or [n for n in HEADLINE if n in qs]
    out = {}
    for name in names:
        try:
            out[name] = audit(qs[name](spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — surfaced per query
            out[name] = {"error": str(exc).splitlines()[0][:200]}
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
