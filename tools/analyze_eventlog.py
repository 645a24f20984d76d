#!/usr/bin/env python3
"""Summarize a Spark event log: per-job and per-stage wall/task time.

Usage: python3 tools/analyze_eventlog.py <eventlog-file> [--min-ms 20]

Prints, per job (with its description = the bench's setJobDescription label
when present), each stage's name, wall-clock span, summed task time, task
count, shuffle read/write bytes, and records. Local diagnosis aid for the
optimization rounds (guide §1: measure first).
"""
import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    min_ms = 20
    if "--min-ms" in sys.argv:
        min_ms = int(sys.argv[sys.argv.index("--min-ms") + 1])
    jobs = {}
    stages = {}
    stage_tasks = defaultdict(lambda: dict(n=0, time=0, sr=0, sw=0, rec_in=0,
                                           rec_sr=0, rec_sw=0, spill=0))
    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = dict(
                    desc=ev.get("Properties", {}).get(
                        "spark.job.description", ""),
                    t0=ev.get("Submission Time", 0), t1=None,
                    stages=[s["Stage ID"] for s in ev.get("Stage Infos", [])])
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev.get("Completion Time", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = dict(
                    name=si.get("Name", ""),
                    t0=si.get("Submission Time", 0),
                    t1=si.get("Completion Time", 0),
                    n=si.get("Number of Tasks", 0))
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                st = stage_tasks[sid]
                st["n"] += 1
                st["time"] += m.get("Executor Run Time", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                sw = m.get("Shuffle Write Metrics") or {}
                st["sr"] += sr.get("Local Bytes Read", 0) + \
                    sr.get("Remote Bytes Read", 0)
                st["rec_sr"] += sr.get("Total Records Read", 0)
                st["sw"] += sw.get("Shuffle Bytes Written", 0)
                st["rec_sw"] += sw.get("Shuffle Records Written", 0)
                inp = m.get("Input Metrics") or {}
                st["rec_in"] += inp.get("Records Read", 0)
                st["spill"] += m.get("Disk Bytes Spilled", 0)

    if "--per-query" in sys.argv:
        agg = defaultdict(lambda: dict(wall=0, jobs=0))
        for jid, j in jobs.items():
            if j["t1"] is None:
                continue
            agg[j["desc"]]["wall"] += j["t1"] - j["t0"]
            agg[j["desc"]]["jobs"] += 1
        for d in sorted(agg, key=lambda d: -agg[d]["wall"]):
            print(f"{d[:50]:50s} wall={agg[d]['wall']:7d}ms jobs={agg[d]['jobs']}")
        return

    tot_wall = 0
    for jid in sorted(jobs):
        j = jobs[jid]
        if j["t1"] is None:
            continue
        wall = j["t1"] - j["t0"]
        tot_wall += wall
        if wall < min_ms:
            continue
        print(f"job {jid}: {wall} ms  desc={j['desc'][:60]}")
        for sid in sorted(j["stages"]):
            if sid not in stages:
                continue  # skipped stage (reused exchange)
            s = stages[sid]
            t = stage_tasks[sid]
            span = (s["t1"] or 0) - (s["t0"] or 0)
            if span < min_ms and t["time"] < min_ms:
                continue
            print(f"  stage {sid}: span={span}ms taskSum={t['time']}ms "
                  f"tasks={t['n']} swrite={t['sw']/1e6:.2f}MB({t['rec_sw']}r) "
                  f"sread={t['sr']/1e6:.2f}MB({t['rec_sr']}r) "
                  f"in={t['rec_in']}r spill={t['spill']/1e6:.1f}MB")
            print(f"    {s['name'][:110]}")
    print(f"total job wall: {tot_wall} ms over {len(jobs)} jobs")


if __name__ == "__main__":
    main()
