#!/usr/bin/env python
"""Parse a Spark event log into per-stage wall/task-time attribution.

Usage:
    python tools/stageprof.py [path-to-eventlog | newest in /tmp/spark-events]

Prints one line per stage (submission order): job description, stage id,
name, wall seconds (completion - submission), summed executor run time,
task count.  The measurement companion of tools/qtime.py — run qtime
under ``SPARK_CONF_DIR`` pointing at a spark-defaults.conf with
``spark.eventLog.enabled true`` to produce the log.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def main() -> None:
    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        logs = sorted(
            glob.glob("/tmp/spark-events/*"), key=os.path.getmtime
        )
        path = logs[-1]
    stages = {}
    stage_job_desc = {}
    job_desc = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                job_desc[ev["Job ID"]] = desc
                for sid in ev.get("Stage IDs", []):
                    stage_job_desc[sid] = desc
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                stages[sid] = {
                    "name": si.get("Stage Name", ""),
                    "wall": (comp - sub) / 1000.0 if sub and comp else None,
                    "tasks": si.get("Number of Tasks"),
                    "sub": sub,
                }
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                st = stages.setdefault(sid, {})
                st["run"] = st.get("run", 0) + m.get("Executor Run Time", 0)
                st["cpu"] = st.get("cpu", 0) + m.get("Executor CPU Time", 0)
                srm = m.get("Shuffle Read Metrics") or {}
                st["fetch"] = st.get("fetch", 0) + srm.get("Fetch Wait Time", 0)

    order = sorted(
        (s for s in stages.items() if s[1].get("sub")),
        key=lambda kv: kv[1]["sub"],
    )
    print(f"{'stage':>5s} {'wall_s':>7s} {'run_s':>7s} {'cpu_s':>7s} "
          f"{'tasks':>5s}  desc / name")
    for sid, st in order:
        desc = stage_job_desc.get(sid, "")
        print(
            f"{sid:5d} {st.get('wall', 0) or 0:7.3f} "
            f"{(st.get('run', 0)) / 1000.0:7.2f} "
            f"{(st.get('cpu', 0)) / 1e9:7.2f} "
            f"{st.get('tasks', 0) or 0:5d}  {desc[:40]} | {st.get('name', '')[:60]}"
        )


if __name__ == "__main__":
    main()
