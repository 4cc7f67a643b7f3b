"""Per-query bottleneck profiler (round-12 optimization instrumentation).

For each named query: run it once warm (after a cold pass) with the noop
sink under an event log + setJobDescription label, then parse the event
log into a per-query breakdown:

  wall_s          wall-clock of the warm pass
  n_jobs/stages/tasks  scheduling footprint
  task_time_s     sum of task executorRunTime (the parallel work)
  ideal_s         task_time_s / cores (perfect-parallelism floor)
  gc_s            sum of JVM GC time inside tasks
  fetch_wait_s    shuffle fetch wait
  shuffle_mb      shuffle read bytes
  python_s        sum of PythonUDF eval time if exposed (0 otherwise)
  sched_gap_s     wall_s - ideal_s (scheduling + skew + driver gaps)

Usage: python scripts/profile_queries.py q1 q2 ...  [--sf DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from etl_spark_spark.session import get_spark  # noqa: E402

EVDIR = "/tmp/spark-events-profile"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--warm", type=int, default=1)
    args = ap.parse_args()

    import shutil

    shutil.rmtree(EVDIR, ignore_errors=True)
    os.makedirs(EVDIR, exist_ok=True)
    spark = get_spark(
        app_name="profile-r12",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVDIR,
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism
    qs = entrymod.queries()

    def _force(df):
        df.write.format("noop").mode("overwrite").save()

    walls: dict[str, float] = {}
    for name in args.queries:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"cold:{name}")
        _force(fn(spark, args.sf))
        best = None
        for _ in range(args.warm):
            spark.sparkContext.setJobDescription(f"warm:{name}")
            t0 = time.perf_counter()
            _force(fn(spark, args.sf))
            w = time.perf_counter() - t0
            best = w if best is None else min(best, w)
        walls[name] = best
        spark.sparkContext.setJobDescription(None)

    # flush event log
    spark.stop()

    ev = []
    for root, _dirs, files in os.walk(EVDIR):
        for f in files:
            if "appstatus" not in f:
                ev.append(os.path.join(root, f))
    assert ev, f"no event log under {EVDIR}"
    # job id -> description; stage id -> job id; task metrics per stage
    job_desc: dict[int, str] = {}
    stage_job: dict[int, int] = {}
    agg: dict[str, dict] = {
        n: dict(n_jobs=0, n_stages=0, n_tasks=0, task_time=0.0, gc=0.0,
                fetch_wait=0.0, shuffle_read=0.0, shuffle_write=0.0,
                result_ser=0.0, deser=0.0, python=0.0, input_mb=0.0,
                max_task=0.0)
        for n in args.queries
    }
    import itertools

    def _lines():
        for p in ev:
            with open(p) as f:
                yield from f

    for line in _lines():
        if True:
            try:
                e = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = e.get("Event")
            if et == "SparkListenerJobStart":
                d = e.get("Properties", {}).get("spark.job.description", "")
                job_desc[e["Job ID"]] = d
                for sid in e.get("Stage IDs", []):
                    stage_job[sid] = e["Job ID"]
                if d.startswith("warm:") and d[5:] in agg:
                    agg[d[5:]]["n_jobs"] += 1
            elif et == "SparkListenerStageCompleted":
                sid = e["Stage Info"]["Stage ID"]
                jid = stage_job.get(sid)
                d = job_desc.get(jid, "")
                if d.startswith("warm:") and d[5:] in agg:
                    agg[d[5:]]["n_stages"] += 1
            elif et == "SparkListenerTaskEnd":
                sid = e["Stage ID"]
                jid = stage_job.get(sid)
                d = job_desc.get(jid, "")
                if not (d.startswith("warm:") and d[5:] in agg):
                    continue
                a = agg[d[5:]]
                m = e.get("Task Metrics") or {}
                a["n_tasks"] += 1
                rt = m.get("Executor Run Time", 0) / 1e3
                a["task_time"] += rt
                a["max_task"] = max(a["max_task"], rt)
                a["gc"] += m.get("JVM GC Time", 0) / 1e3
                a["result_ser"] += m.get("Result Serialization Time", 0) / 1e3
                a["deser"] += m.get("Executor Deserialize Time", 0) / 1e3
                srm = m.get("Shuffle Read Metrics") or {}
                a["fetch_wait"] += srm.get("Fetch Wait Time", 0) / 1e3
                a["shuffle_read"] += (
                    srm.get("Local Bytes Read", 0) + srm.get("Remote Bytes Read", 0)
                ) / 1e6
                swm = m.get("Shuffle Write Metrics") or {}
                a["shuffle_write"] += swm.get("Shuffle Bytes Written", 0) / 1e6
                im = m.get("Input Metrics") or {}
                a["input_mb"] += im.get("Bytes Read", 0) / 1e6

    hdr = (
        f"{'query':34s} {'wall':>6s} {'jobs':>4s} {'stgs':>4s} {'tasks':>6s} "
        f"{'task_s':>7s} {'ideal':>6s} {'gap':>6s} {'gc':>5s} {'fetchw':>6s} "
        f"{'shuf_mb':>8s} {'maxtask':>7s}"
    )
    print(hdr)
    for n in args.queries:
        a = agg[n]
        w = walls[n]
        ideal = a["task_time"] / cores
        print(
            f"{n:34s} {w:6.2f} {a['n_jobs']:4d} {a['n_stages']:4d} "
            f"{a['n_tasks']:6d} {a['task_time']:7.1f} {ideal:6.2f} "
            f"{w - ideal:6.2f} {a['gc']:5.1f} {a['fetch_wait']:6.1f} "
            f"{a['shuffle_read']:8.1f} {a['max_task']:7.2f}"
        )


if __name__ == "__main__":
    main()
