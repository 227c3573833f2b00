"""Time an arbitrary set of registry queries at a given sf dir.

Complements bench.py (whose HEADLINE set and output schema are a driver
contract and must not grow): this is the exploratory harness for scaling
measurements of non-headline families.

Usage: python tools/query_bench.py <sf_dir> <query> [query ...]
Prints one JSON line: {"sf_dir": ..., "queries": {name: steady_min_sec}}.
Each query runs once cold and twice steady (fresh plan each pass, full
execution via the noop sink); per-query value is the steady min.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir, names = sys.argv[1], sys.argv[2:]
    from etl_pipline_ibrd_loan_system_spark.session import get_session

    spark = get_session("query_bench")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        runs = []
        for _ in range(3):  # first pass is the discarded cold run
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs[1:]), 3)
    print(json.dumps({"sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
