#!/usr/bin/env python3
"""Attribute Spark event-log time to bench queries.

Usage: python3 tools/profile_eventlog.py /tmp/graft-eventlogs/<app-id> [top_n]

Groups jobs by their spark.job.description (graft.Bench sets it to the
query name per timed pass), sums per-stage executor metrics, and prints
a per-query table: wall (job span), executor run time, shuffle bytes,
task count — plus the slowest individual stages with their details.
"""
import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25

    # stage id -> metrics accumulated from task ends (works even when
    # SparkListenerStageCompleted metrics are partial)
    stage_metrics = defaultdict(lambda: defaultdict(float))
    stage_names = {}
    job_desc = {}
    job_span = {}
    job_stages = defaultdict(list)

    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                job_desc[jid] = props.get("spark.job.description", "")
                job_span[jid] = [ev.get("Submission Time", 0), None]
                for s in ev.get("Stage Infos", []):
                    job_stages[jid].append(s["Stage ID"])
                    stage_names[s["Stage ID"]] = s.get("Stage Name", "")
            elif et == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in job_span:
                    job_span[jid][1] = ev.get("Completion Time", 0)
            elif et == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                m = ev.get("Task Metrics") or {}
                sm = stage_metrics[sid]
                sm["run_ms"] += m.get("Executor Run Time", 0)
                sm["cpu_ms"] += m.get("Executor CPU Time", 0) / 1e6
                sm["gc_ms"] += m.get("JVM GC Time", 0)
                sm["deser_ms"] += m.get("Executor Deserialize Time", 0)
                sm["result_ser_ms"] += m.get("Result Serialization Time", 0)
                sm["tasks"] += 1
                sr = m.get("Shuffle Read Metrics") or {}
                sm["shuffle_read_b"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0)
                sm["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                sm["shuffle_write_b"] += sw.get("Shuffle Bytes Written", 0)
                sm["shuffle_write_ms"] += sw.get("Shuffle Write Time", 0) / 1e6
                inm = m.get("Input Metrics") or {}
                sm["input_b"] += inm.get("Bytes Read", 0)

    # aggregate per description
    agg = defaultdict(lambda: defaultdict(float))
    for jid, desc in job_desc.items():
        a = agg[desc]
        s0, s1 = job_span.get(jid, [0, None])
        if s1:
            a["wall_ms"] += s1 - s0
        a["jobs"] += 1
        for sid in job_stages[jid]:
            sm = stage_metrics.get(sid)
            if not sm:
                continue  # skipped stage
            for k, v in sm.items():
                a[k] += v

    rows = sorted(agg.items(), key=lambda kv: -kv[1]["wall_ms"])
    hdr = (f"{'description':46s} {'wall_s':>7s} {'jobs':>5s} {'run_s':>7s} "
           f"{'cpu_s':>7s} {'gc_s':>6s} {'tasks':>6s} {'shR_MB':>7s} "
           f"{'shW_MB':>7s} {'in_MB':>7s}")
    print(hdr)
    for desc, a in rows[:top_n]:
        print(f"{(desc or '<none>')[:46]:46s} {a['wall_ms']/1e3:7.2f} "
              f"{int(a['jobs']):5d} {a['run_ms']/1e3:7.1f} "
              f"{a['cpu_ms']/1e3:7.1f} {a['gc_ms']/1e3:6.1f} "
              f"{int(a['tasks']):6d} {a['shuffle_read_b']/1e6:7.1f} "
              f"{a['shuffle_write_b']/1e6:7.1f} {a['input_b']/1e6:7.1f}")

    print("\nSlowest stages:")
    srows = sorted(stage_metrics.items(), key=lambda kv: -kv[1]["run_ms"])
    for sid, sm in srows[:top_n]:
        name = stage_names.get(sid, "?")
        print(f"  stage {sid:5d} run={sm['run_ms']/1e3:7.1f}s "
              f"cpu={sm['cpu_ms']/1e3:7.1f}s tasks={int(sm['tasks']):5d} "
              f"shR={sm['shuffle_read_b']/1e6:7.1f}MB  {name[:90]}")


if __name__ == "__main__":
    main()
