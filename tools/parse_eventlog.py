"""Summarize a Spark event log: per-stage wall, task-time sum, shuffle
bytes, input bytes — sorted by task time. Usage:
    python tools/parse_eventlog.py /tmp/bx_evlog/<app-id> [top_n]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    stages: dict[int, dict] = {}
    job_of_stage: dict[int, int] = {}
    job_desc: dict[int, str] = {}
    with open(path) as fh:
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jid = ev["Job ID"]
                job_desc[jid] = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )[:60]
                for sid in ev.get("Stage IDs", []):
                    job_of_stage[sid] = jid
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                sid = si["Stage ID"]
                st = stages.setdefault(
                    sid,
                    {
                        "name": si.get("Stage Name", "")[:70],
                        "tasks": si.get("Number of Tasks", 0),
                        "wall_ms": 0,
                        "task_ms": 0,
                        "sh_read": 0,
                        "sh_write": 0,
                        "input": 0,
                    },
                )
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                if sub and comp:
                    st["wall_ms"] = comp - sub
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                st = stages.setdefault(
                    sid,
                    {
                        "name": "",
                        "tasks": 0,
                        "wall_ms": 0,
                        "task_ms": 0,
                        "sh_read": 0,
                        "sh_write": 0,
                        "input": 0,
                    },
                )
                tm = ev.get("Task Metrics") or {}
                st["task_ms"] += tm.get("Executor Run Time", 0)
                sr = tm.get("Shuffle Read Metrics") or {}
                st["sh_read"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                sw = tm.get("Shuffle Write Metrics") or {}
                st["sh_write"] += sw.get("Shuffle Bytes Written", 0)
                im = tm.get("Input Metrics") or {}
                st["input"] += im.get("Bytes Read", 0)

    rows = sorted(stages.items(), key=lambda kv: -kv[1]["task_ms"])[:top_n]
    total_task = sum(s["task_ms"] for s in stages.values())
    total_wall = sum(s["wall_ms"] for s in stages.values())
    print(f"stages={len(stages)} total_task_s={total_task/1000:.1f} "
          f"sum_stage_wall_s={total_wall/1000:.1f}")
    for sid, s in rows:
        jid = job_of_stage.get(sid)
        print(
            f"stage {sid:4d} job {jid} wall {s['wall_ms']/1000:7.2f}s "
            f"taskSum {s['task_ms']/1000:8.2f}s tasks {s['tasks']:4d} "
            f"shR {s['sh_read']/2**20:7.1f}M shW {s['sh_write']/2**20:7.1f}M "
            f"in {s['input']/2**20:7.1f}M  desc={job_desc.get(jid, '')!r} "
            f"{s['name']}"
        )


if __name__ == "__main__":
    main()
