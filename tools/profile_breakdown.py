"""Per-query breakdown for the bench headline set (optimization r11).

For each query: time the Python/plan-build phase (fn call) separately
from execution (noop sink), and count Spark jobs + stages per steady
pass via the status tracker. At sf0.1 the data is tiny, so fixed
per-job/per-stage costs dominate — this tool attributes them.

Usage: python tools/profile_breakdown.py [sf_dir] [query ...]
Prints one JSON line per query:
  {"name": ..., "build_s": ..., "exec_s": [cold, s1, s2],
   "jobs": N, "stages": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = args[1:]
    from bench import HEADLINE
    from etl_pipline_ibrd_loan_system_spark.session import (
        get_session,
        silence_bounded_window_warn,
    )

    spark = get_session("profile-breakdown")
    silence_bounded_window_warn(spark)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sc = spark.sparkContext
    st = sc.statusTracker()
    for name in names or HEADLINE:
        fn = qs[name]
        execs = []
        builds = []
        jobs = stages = 0
        for p in range(3):
            group = f"prof_{name}_{p}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(round(t1 - t0, 3))
            execs.append(round(t2 - t1, 3))
            spark.catalog.clearCache()
            if p == 2:  # steady-state pass: count jobs/stages
                jids = st.getJobIdsForGroup(group)
                jobs = len(jids)
                stages = sum(
                    len(st.getJobInfo(j).stageIds)
                    for j in jids
                    if st.getJobInfo(j) is not None
                )
        print(
            json.dumps(
                {
                    "name": name,
                    "build_s": builds,
                    "exec_s": execs,
                    "jobs": jobs,
                    "stages": stages,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
