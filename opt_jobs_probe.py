#!/usr/bin/env python3
"""Registry-wide job/stage/task census (r13 verdict task #4): times each
named query with the bench protocol (min of 2, forced GC) and, on the
SECOND run (steady-state: session memos warm, staged layers built),
counts the Spark jobs, stages and tasks the query triggers via a
per-query job group + the status tracker.

A query whose fn()+action runs >1 job in steady state is a fold
candidate (guide §1.2/§5: every extra driver job is fixed scheduling
cost at the tail); the histogram this prints is the before/after
evidence for the multi-action sweep.

Usage:
  python opt_jobs_probe.py                 # every registry query
  python opt_jobs_probe.py q1 q2 ...       # a subset
  SPARK_GRAFT_PROBE_SINK=noop ...          # noop sink instead of count

Prints one JSON line:
  {"queries": {name: {"build": s, "exec": s, "total": s,
                      "jobs": n, "stages": n, "tasks": n}},
   "job_histogram": {"1": n_queries, "2": ...}, "total": s}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wsu_cpts_415_spark.registry import all_queries  # noqa: E402
from wsu_cpts_415_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark(app_name="wsu_cpts_415_spark-jobsprobe")
    spark.sparkContext.setLogLevel("ERROR")
    sink = os.environ.get("SPARK_GRAFT_PROBE_SINK", "count")
    qs = all_queries()
    names = sys.argv[1:] or sorted(qs)
    qs["flagship_top_customers"].fn(spark, SF_DIR).count()  # warmup
    sc = spark.sparkContext
    jvm_gc = sc._jvm.System.gc
    tracker = sc.statusTracker()
    out: dict[str, dict] = {}
    for name in names:
        rec = None
        for run in range(2):
            jvm_gc()
            group = f"jobsprobe-{name}-{run}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = qs[name].fn(spark, SF_DIR)
            t1 = time.perf_counter()
            build_jobs = len(tracker.getJobIdsForGroup(group))
            if sink == "noop":
                df.write.format("noop").mode("overwrite").save()
            else:
                df.count()
            t2 = time.perf_counter()
            sc._jsc.clearJobGroup()
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = n_tasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is None:
                        continue
                    n_stages += 1
                    n_tasks += si.numTasks
            cur = {
                "build": round(t1 - t0, 3),
                "exec": round(t2 - t1, 3),
                "total": round(t2 - t0, 3),
                "jobs": len(job_ids),
                # jobs triggered DURING fn() = eager driver actions in
                # the query's build phase (gate/training actions); the
                # remainder are the timed action's own jobs (with AQE,
                # one per materialized query stage)
                "jobs_build": build_jobs,
                "stages": n_stages,
                "tasks": n_tasks,
            }
            # timing: best of both; job counts: the SECOND (steady) run
            if rec is None:
                rec = cur
            else:
                best_total = min(rec["total"], cur["total"])
                rec = cur
                rec["total"] = best_total
        out[name] = rec
    hist: dict[str, int] = {}
    for rec in out.values():
        hist[str(rec["jobs"])] = hist.get(str(rec["jobs"]), 0) + 1
    print(
        json.dumps(
            {
                "queries": out,
                "job_histogram": dict(sorted(hist.items(), key=lambda kv: int(kv[0]))),
                "total": round(sum(r["total"] for r in out.values()), 3),
                "sink": sink,
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "sf_dir": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    main()
