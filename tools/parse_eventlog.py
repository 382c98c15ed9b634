#!/usr/bin/env python
"""Summarize a Spark event log: per-stage wall span, aggregate task time,
task count, max single-task time — attributes whether a slow step is
serial (1 task / 1 long task), under-parallel (few tasks), or
scheduler-bound (task time << wall span).

Usage: python tools/parse_eventlog.py /tmp/spark-events/<app-id> [min_wall_s]
"""
import json
import sys


def main(path, min_wall=0.3):
    stages = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                st = stages.setdefault(sid, {"tasks": 0, "task_ms": 0,
                                             "max_task_ms": 0})
                st["name"] = si["Stage Name"].split("\n")[0][:70]
                st["wall_ms"] = (si.get("Completion Time", 0)
                                 - si.get("Submission Time", 0))
                st["n_parts"] = si.get("Number of Tasks")
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(sid, {"tasks": 0, "task_ms": 0,
                                             "max_task_ms": 0})
                ti = ev.get("Task Info", {})
                dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
                st["tasks"] += 1
                st["task_ms"] += dur
                st["max_task_ms"] = max(st["max_task_ms"], dur)
    print(f"{'sid':>4} {'wall_s':>7} {'task_s':>8} {'n':>5} {'max_s':>6}  name")
    for sid in sorted(stages):
        st = stages[sid]
        w = st.get("wall_ms", 0) / 1000
        if w < float(min_wall):
            continue
        print(f"{sid:>4} {w:7.2f} {st['task_ms']/1000:8.2f} "
              f"{st['tasks']:>5} {st['max_task_ms']/1000:6.2f}  "
              f"{st.get('name','?')}")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
