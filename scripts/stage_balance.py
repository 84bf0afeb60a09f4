#!/usr/bin/env python
"""Task-balance evidence from a Spark event log (host-noise independent).

Wall-clock scaling on this shared sandbox is bounded by the HOST ceiling
(scripts/host_ceiling_probe.py), so this tool provides the complementary,
noise-independent architectural evidence: per-stage task-time balance for
an index build. A plan scales to 4N executors iff (a) every heavy stage
has many more tasks than slots, (b) no stage is dominated by one straggler
(max task ≪ stage task-time sum — salting did its job on hot terms), and
(c) driver-side serial time between jobs is a small fraction of the total.

Usage:
    python scripts/stage_balance.py run   [--pages P] [--cpus N]
        # runs a build with event logging, then analyzes it
    python scripts/stage_balance.py <eventlog-dir>
        # analyzes an existing eventlog_v2_local-* directory
"""

from __future__ import annotations

import json
import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def read_events(d: str):
    from pyarrow import input_stream

    for fn in sorted(os.listdir(d)):
        if not fn.startswith("events_"):
            continue
        comp = "zstd" if fn.endswith(".zstd") else None
        data = input_stream(os.path.join(d, fn), compression=comp).read()
        for line in data.decode("utf-8", "replace").splitlines():
            try:
                yield json.loads(line)
            except Exception:
                continue


def analyze(d: str) -> dict:
    stages = {}
    tasks = defaultdict(list)
    app_start = app_end = None
    job_windows = []
    for e in read_events(d):
        ev = e.get("Event")
        if ev == "SparkListenerApplicationStart":
            app_start = e.get("Timestamp")
        elif ev == "SparkListenerApplicationEnd":
            app_end = e.get("Timestamp")
        elif ev == "SparkListenerJobStart":
            job_windows.append([e.get("Submission Time"), None])
        elif ev == "SparkListenerJobEnd":
            for w in reversed(job_windows):
                if w[1] is None:
                    w[1] = e.get("Completion Time")
                    break
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            stages[si["Stage ID"]] = {
                "wall_s": round((si.get("Completion Time", 0)
                                 - si.get("Submission Time", 0)) / 1000, 2),
                "n_tasks": si["Number of Tasks"],
            }
        elif ev == "SparkListenerTaskEnd":
            tm = e.get("Task Metrics") or {}
            tasks[e["Stage ID"]].append(tm.get("Executor Run Time", 0) / 1000)

    out_stages = []
    for sid, info in stages.items():
        ts = tasks.get(sid, [])
        if not ts:
            continue
        total, mx = sum(ts), max(ts)
        out_stages.append({
            "stage": sid,
            "wall_s": info["wall_s"],
            "n_tasks": info["n_tasks"],
            "task_time_sum_s": round(total, 1),
            "task_time_max_s": round(mx, 2),
            "skew_max_over_mean": round(mx / (total / len(ts)), 2) if total else 0,
            "straggler_fraction": round(mx / total, 3) if total else 0,
        })
    out_stages.sort(key=lambda s: -s["task_time_sum_s"])

    # driver-side serial fraction: app wall not covered by any running job
    serial = None
    if app_start and app_end and job_windows:
        covered = 0
        last = app_start
        for s, t in sorted(w for w in job_windows if w[0] and w[1]):
            s = max(s, last)
            if t > s:
                covered += t - s
                last = t
        serial = round(1 - covered / (app_end - app_start), 3)

    heavy = [s for s in out_stages if s["task_time_sum_s"] >= 1.0]
    return {
        "eventlog": d,
        "stages_heavy": heavy[:12],
        "max_straggler_fraction_heavy": max(
            (s["straggler_fraction"] for s in heavy), default=0.0),
        "max_skew_heavy": max(
            (s["skew_max_over_mean"] for s in heavy), default=0.0),
        "driver_serial_fraction": serial,
    }


def run_and_analyze(pages: str, cpus: int) -> dict:
    import shutil
    import subprocess
    import tempfile

    logdir = tempfile.mkdtemp(prefix="sparklogs_")
    idx = tempfile.mkdtemp(prefix="balance_idx_")
    shutil.rmtree(idx)
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    zip_path = os.path.join(REPO, ".bench_cache", "engine.zip")
    from scripts.bench_scaling import make_pyfiles_zip

    make_pyfiles_zip(zip_path)
    cmd = [
        spark_submit, "--master", f"local[{cpus}]",
        "--conf", "spark.driver.memory=48g",
        "--conf", "spark.eventLog.enabled=true",
        "--conf", f"spark.eventLog.dir={logdir}",
        "--py-files", zip_path,
        os.path.join(REPO, "scripts", "scaling_job.py"),
        "--pages", pages, "--index-path", idx, "--cpus", str(cpus),
    ]
    subprocess.run(cmd, capture_output=True, text=True, timeout=3600,
                   check=True)
    shutil.rmtree(idx, ignore_errors=True)
    d = sorted(os.path.join(logdir, x) for x in os.listdir(logdir))[-1]
    return analyze(d)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] != "run":
        print(json.dumps(analyze(sys.argv[1]), indent=1))
        return
    pages = os.path.join(REPO, ".bench_cache", "web_pages_200000.parquet")
    cpus = 8
    for i, a in enumerate(sys.argv):
        if a == "--pages":
            pages = sys.argv[i + 1]
        if a == "--cpus":
            cpus = int(sys.argv[i + 1])
    print(json.dumps(run_and_analyze(pages, cpus), indent=1))


if __name__ == "__main__":
    main()
