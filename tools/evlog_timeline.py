"""Event-log timeline: where does wall time go inside a CDC run?

Parses a Spark event-log file (or the newest in a dir) and prints, in time
order: job spans (with first-stage name), per-stage task-time sums, and —
the interesting part — GAPS between consecutive jobs. Gaps are driver-side
serial time (planning, commit JSON, streaming offset log, py4j round trips)
that no executor parallelism can hide; at the high parallelism level they
are the Amdahl term that caps N→4N scaling efficiency.

Usage: python tools/evlog_timeline.py <evlog-file-or-dir> [--min-gap 0.05]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def newest(path: str) -> str:
    if os.path.isfile(path):
        return path
    cands = [
        f
        for f in glob.glob(os.path.join(path, "**", "*"), recursive=True)
        if os.path.isfile(f)
        and not f.endswith((".crc", ".zstd", ".inprogress"))
        and (os.path.basename(f).startswith("events_") or "local-" in os.path.basename(f))
        and os.path.getsize(f) > 0
    ]
    return max(cands, key=os.path.getmtime)


def main() -> None:
    path = newest(sys.argv[1])
    min_gap = 0.05
    if "--min-gap" in sys.argv:
        min_gap = float(sys.argv[sys.argv.index("--min-gap") + 1])

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    task_ms: dict[int, float] = {}
    t0 = None
    with open(path, errors="replace") as fh:
        for line in fh:
            try:
                e = json.loads(line)
            except Exception:
                continue
            ev = e.get("Event")
            if ev == "SparkListenerApplicationStart":
                t0 = e["Timestamp"] / 1000
            elif ev == "SparkListenerJobStart":
                names = [
                    s.get("Stage Name", "?") for s in e.get("Stage Infos", [])
                ]
                jobs[e["Job ID"]] = {
                    "start": e["Submission Time"] / 1000,
                    "name": names[-1] if names else "?",
                    "n_stages": len(names),
                }
            elif ev == "SparkListenerJobEnd":
                j = jobs.get(e["Job ID"])
                if j is not None:
                    j["end"] = e["Completion Time"] / 1000
            elif ev == "SparkListenerStageCompleted":
                si = e["Stage Info"]
                stages[si["Stage ID"]] = {
                    "id": si["Stage ID"],
                    "name": si.get("Stage Name", "?"),
                    "start": si.get("Submission Time", 0) / 1000,
                    "end": si.get("Completion Time", 0) / 1000,
                    "tasks": si.get("Number of Tasks", 0),
                }
            elif ev == "SparkListenerTaskEnd":
                m = e.get("Task Metrics") or {}
                sid = e.get("Stage ID")
                task_ms.setdefault(sid, 0.0)
                task_ms[sid] += m.get("Executor Run Time", 0)

    if t0 is None:
        t0 = min(j["start"] for j in jobs.values())

    order = sorted(jobs.items(), key=lambda kv: kv[1]["start"])
    prev_end = None
    total_gap = 0.0
    print(f"# {os.path.basename(path)}  (t=0 at app start)")
    for jid, j in order:
        if "end" not in j:
            continue
        if prev_end is not None:
            gap = j["start"] - prev_end
            if gap >= min_gap:
                print(f"  --- GAP {gap:7.2f}s ---")
                total_gap += gap
        dur = j["end"] - j["start"]
        print(
            f"job {jid:4d}  {j['start'] - t0:8.2f} +{dur:7.2f}s  "
            f"stages={j['n_stages']}  {j['name'][:90]}"
        )
        prev_end = j["end"]
    print(f"\ntotal inter-job gap (>= {min_gap}s): {total_gap:.2f}s")

    print("\n# stages by wall duration (top 20)")
    byd = sorted(
        stages.values(), key=lambda s: s["end"] - s["start"], reverse=True
    )[:20]
    for s in byd:
        wall = s["end"] - s["start"]
        cpu = task_ms.get(s["id"], 0.0) / 1000
        par = cpu / wall if wall > 0 else 0
        print(
            f"  stage {s['id']:4d} {s['start'] - t0:8.2f} +{wall:7.2f}s cpu={cpu:8.1f}s "
            f"avg-par={par:5.1f} tasks={s['tasks']:4d}  {s['name'][:80]}"
        )


if __name__ == "__main__":
    main()
