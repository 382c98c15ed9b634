#!/usr/bin/env python
"""Job-level timeline from a Spark event log: per-job wall, the GAP since
the previous job finished (serial driver time: planning, collects,
broadcasts, Python), and aggregate task time. The sum of gaps is the
parallelism-independent driver overhead a scaling ratio pays twice.

Usage: python tools/parse_eventlog_jobs.py <events file (decompressed)>
"""
import json
import sys


def main(path):
    jobs = {}
    stage_tasks = {}
    stage_to_job = {}
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "group": (ev.get("Properties") or {}).get(
                        "spark.jobGroup.id", ""),
                    "task_ms": 0,
                    "desc": (ev.get("Properties") or {}).get(
                        "spark.job.description", "")[:60],
                }
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                jid = stage_to_job.get(sid)
                if jid in jobs:
                    ti = ev.get("Task Info", {})
                    jobs[jid]["task_ms"] += (
                        ti.get("Finish Time", 0) - ti.get("Launch Time", 0))
    prev_end = None
    total_gap = total_wall = 0.0
    print(f"{'jid':>4} {'gap_s':>7} {'wall_s':>7} {'task_s':>8}  group/desc")
    for jid in sorted(jobs):
        j = jobs[jid]
        if "end" not in j:
            continue
        gap = (j["start"] - prev_end) / 1000 if prev_end else 0.0
        wall = (j["end"] - j["start"]) / 1000
        total_gap += max(gap, 0)
        total_wall += wall
        label = j["group"] or j["desc"]
        print(f"{jid:>4} {gap:7.2f} {wall:7.2f} {j['task_ms']/1000:8.2f}  {label[:70]}")
        prev_end = j["end"]
    print(f"\njob wall total {total_wall:.1f}s, inter-job gap total {total_gap:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1])
