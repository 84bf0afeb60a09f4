#!/usr/bin/env python
"""Two-cluster-size scaling evidence (north_rule: efficiency ≥ 0.8, N→4N).

No multi-node cluster exists in this sandbox, so per BASELINE.md the
criterion is evidenced by running the SAME job (scripts/scaling_job.py,
shipped to executors with ``spark-submit --py-files engine.zip``) on the
SAME fixture input at two parallelism levels on the 32-core box:

    N  = spark-submit --master local[8]
    4N = spark-submit --master local[32]

Protocol: fixed seed-42 corpus, 1 warm-up run discarded per level (fresh
JVM per run — the warm-up warms the OS page cache), median of 3 measured
runs. Writes scaling_results.json and rewrites the results table in
BASELINE.md.

Usage:  python scripts/bench_scaling.py [--n-pages 50000] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _cpu_ticks() -> tuple[int, int]:
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    idle = vals[3] + (vals[4] if len(vals) > 4 else 0)  # idle + iowait
    return sum(vals), idle


def contention_probe(max_busy_cores: float = 2.5,
                     min_gbps: float = 3.5) -> dict:
    """Cheap host-contention check, instantaneous by construction.

    Two signals sampled over the same ~1.5 s window:

    - busy-core count from /proc/stat deltas — how many cores are busy
      RIGHT NOW (the probe itself accounts for ~1). Unlike 1-minute
      loadavg, this is not polluted by our own just-finished benchmark
      run, so a quiet host probes clean immediately after a round;
    - single-process memcpy bandwidth (clean-window reference on this
      host ~4.7 GB/s; contended windows observed <2 GB/s).

    A round only counts as *clean* when the probe passes both before and
    after it — external load arriving mid-round shows up in the post
    probe."""
    import numpy as np

    buf = np.frombuffer(np.random.bytes(64 * 1024 * 1024), np.uint8).copy()
    tot0, idle0 = _cpu_ticks()
    t0 = time.time()
    mb = 0
    while time.time() - t0 < 1.5:
        b2 = buf.copy()
        mb += 64
        del b2
    gbps = mb / (time.time() - t0) / 1024
    tot1, idle1 = _cpu_ticks()
    dtot, didle = tot1 - tot0, idle1 - idle0
    ncpu = os.cpu_count() or 32
    busy_cores = (1 - didle / dtot) * ncpu if dtot else 0.0
    return {
        "busy_cores": round(busy_cores, 2),
        "memcpy_gbps": round(gbps, 2),
        "clean": busy_cores <= max_busy_cores and gbps >= min_gbps,
    }


def make_pyfiles_zip(dest: str) -> str:
    """Package search_engine_spark/ as the --py-files artifact."""
    with zipfile.ZipFile(dest, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "search_engine_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, REPO))
    return dest


def run_one(cpus: int, pages: str, work: str, zip_path: str, tag: str,
            pin: bool = False) -> dict:
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    index_path = os.path.join(work, f"index_c{cpus}_{tag}")
    cmd = ([] if not pin else ["taskset", "-c", f"0-{cpus - 1}"]) + [
        spark_submit,
        "--master", f"local[{cpus}]",
        "--py-files", zip_path,
        "--conf", "spark.driver.memory=48g",
        os.path.join(REPO, "scripts", "scaling_job.py"),
        "--pages", pages,
        "--index-path", index_path,
        "--cpus", str(cpus),
    ]
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    shutil.rmtree(index_path, ignore_errors=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not line:
        sys.stderr.write(out.stdout[-2000:] + "\n" + out.stderr[-4000:] + "\n")
        raise RuntimeError(f"scaling_job produced no JSON (cpus={cpus})")
    rec = json.loads(line[-1])
    print(f"[local[{cpus}] {tag}] {rec}", file=sys.stderr)
    return rec


def run_levels(levels: list, pages: str, work: str, runs: int,
               zip_path: str, pin: bool = False) -> dict:
    """Interleave the levels round-robin so every level samples the same
    noise windows (this sandbox host shows multi-minute contention bursts
    that would otherwise bias whichever level ran during one).

    ``pin`` runs each level under ``taskset -c 0-(N-1)``: local[N] caps
    Spark TASK SLOTS at N but JVM helper threads (GC, shuffle, parquet
    codecs) and Python workers still run beyond N cores, inflating low-N
    throughput and deflating the measured N→4N efficiency. Pinning makes
    "cluster size N" mean N physical cores — the honest analog of an
    N-executor cluster."""
    for c in levels:  # one discarded warm-up per level (page cache)
        run_one(c, pages, work, zip_path, "warmup", pin)
    by_level: dict[int, list] = {c: [] for c in levels}
    rounds: list[dict] = []
    clean_target = int(os.environ.get("SCALING_CLEAN_ROUNDS", "0"))
    max_rounds = int(os.environ.get("SCALING_MAX_ROUNDS", str(max(runs, 12))))
    i = 0
    clean_count = 0
    while True:
        if clean_target:
            if clean_count >= clean_target or i >= max_rounds:
                break
        elif i >= runs:
            break
        pre = contention_probe()
        waited = 0
        while clean_target and not pre["clean"] and waited < 600:
            print(f"[gate] contended pre-probe {pre}, sleeping 60s",
                  file=sys.stderr)
            time.sleep(60)
            waited += 60
            pre = contention_probe()
        rnd = {"pre_probe": pre, "levels": {}}
        for c in levels:
            rec = run_one(c, pages, work, zip_path, f"run{i+1}", pin)
            rnd["levels"][str(c)] = rec
            by_level[c].append(rec)
        rnd["post_probe"] = contention_probe()
        rnd["clean"] = pre["clean"] and rnd["post_probe"]["clean"]
        clean_count += rnd["clean"]
        print(f"[round {i+1}] clean={rnd['clean']} "
              f"(total clean: {clean_count})", file=sys.stderr)
        rounds.append(rnd)
        i += 1
    out = {}
    for c, results in by_level.items():
        med = lambda k: statistics.median(r[k] for r in results)  # noqa: E731
        out[str(c)] = {
            "cpus": c,
            "runs": results,
            "median_docs_per_sec": med("docs_per_sec"),
            "best_docs_per_sec": max(r["docs_per_sec"] for r in results),
            "median_build_sec": med("build_sec"),
            "median_ms_per_query": med("ms_per_query"),
            "spread_docs_per_sec": [
                min(r["docs_per_sec"] for r in results),
                max(r["docs_per_sec"] for r in results),
            ],
            "n_docs": results[0]["n_docs"],
        }
    return out, rounds


def update_baseline_md(summary: dict) -> None:
    path = os.path.join(REPO, "BASELINE.md")
    with open(path, encoding="utf-8") as f:
        text = f.read()
    lv = summary["levels"]
    keys = sorted(lv, key=int)
    hdr = " | ".join(f"local[{c}]" for c in keys)
    n0 = lv[keys[0]]
    rows = [
        f"| metric | {hdr} | notes |",
        "|---" * (len(keys) + 2) + "|",
        "| index build docs/sec (median) | "
        + " | ".join(f"{lv[c]['median_docs_per_sec']:.0f}" for c in keys)
        + f" | {n0['n_docs']} docs, median of {len(n0['runs'])} interleaved "
          "runs, 1 warm-up/level discarded, fresh JVM per run |",
        "| index build docs/sec (best) | "
        + " | ".join(f"{lv[c]['best_docs_per_sec']:.0f}" for c in keys)
        + " | best run ≈ least host interference |",
        "| BM25 top-10 ms/query (median) | "
        + " | ".join(f"{lv[c]['median_ms_per_query']:.0f}" for c in keys)
        + " | 25-query fixture batch |",
    ]
    for pair, eff in summary.get("pairs", {}).items():
        rm = eff.get("efficiency_round_median")
        cm = eff.get("efficiency_clean_median")
        clean_part = (
            f"CLEAN-WINDOW median {cm:.2f} over "
            f"{len(eff.get('efficiency_clean_rounds', []))} gated rounds "
            f"(busy-cores+memcpy probe pre & post), "
            if cm is not None else ""
        )
        rows.append(
            f"| scaling efficiency {pair} (N→4N) | "
            + " | ".join("—" for _ in keys)
            + f" | {clean_part}all-round median {rm:.2f} "
              f"(rounds: {eff.get('efficiency_per_round')}), "
              f"level-median {eff['efficiency_median']:.2f}, "
              f"best-run {eff['efficiency_best']:.2f} |"
        )
    marker = "| metric | local"
    head = text.split(marker)[0]
    with open(path, "w", encoding="utf-8") as f:
        f.write(head + "\n".join(rows) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=50_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--levels", default="2,8")
    ap.add_argument("--pin", action="store_true",
                    help="taskset each level to exactly N cores")
    ap.add_argument("--out", default=os.path.join(REPO, "scaling_results.json"))
    args = ap.parse_args()

    work = os.path.join(REPO, ".bench_cache")
    os.makedirs(work, exist_ok=True)
    pages = os.path.join(work, f"web_pages_{args.n_pages}.parquet")
    if not os.path.exists(pages):
        from search_engine_spark.sources.fixtures import write_web_pages

        write_web_pages(pages, args.n_pages)
    zip_path = make_pyfiles_zip(os.path.join(work, "engine.zip"))

    levels = [int(x) for x in args.levels.split(",")]
    out = {"levels": {}, "n_pages": args.n_pages}
    out["levels"], rounds = run_levels(levels, pages, work, args.runs,
                                       zip_path, args.pin)
    out["rounds"] = rounds
    out["pinned"] = args.pin
    out["clean_round_count"] = sum(r["clean"] for r in rounds)

    # efficiency for every N → 4N pair present
    out["pairs"] = {}
    for lo_l in levels:
        hi_l = lo_l * 4
        if hi_l in levels:
            lo, hi = str(lo_l), str(hi_l)
            lo_runs = out["levels"][lo]["runs"]
            hi_runs = out["levels"][hi]["runs"]
            # per-round pairing: round i's levels ran back-to-back, so they
            # sampled the same host-noise window — the per-round ratio is
            # the least noise-biased efficiency estimate
            per_round = [
                round(h["docs_per_sec"] / l["docs_per_sec"] / 4, 3)
                for l, h in zip(lo_runs, hi_runs)
            ]
            clean_rounds = [
                round(r["levels"][hi]["docs_per_sec"]
                      / r["levels"][lo]["docs_per_sec"] / 4, 3)
                for r in rounds
                if r["clean"] and lo in r["levels"] and hi in r["levels"]
            ]
            out["pairs"][f"{lo}->{hi}"] = {
                "efficiency_median": round(
                    (out["levels"][hi]["median_docs_per_sec"]
                     / out["levels"][lo]["median_docs_per_sec"]) / 4, 3),
                "efficiency_best": round(
                    (out["levels"][hi]["best_docs_per_sec"]
                     / out["levels"][lo]["best_docs_per_sec"]) / 4, 3),
                "efficiency_per_round": per_round,
                "efficiency_round_median": round(
                    statistics.median(per_round), 3) if per_round else None,
                "efficiency_clean_rounds": clean_rounds,
                "efficiency_clean_median": round(
                    statistics.median(clean_rounds), 3
                ) if clean_rounds else None,
            }
    first = sorted(out["pairs"])
    out["scaling_efficiency"] = (
        out["pairs"][first[0]]["efficiency_median"] if first else None
    )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    update_baseline_md(out)
    print(json.dumps({
        "scaling_efficiency": out["scaling_efficiency"],
        "docs_per_sec": {
            c: out["levels"][c]["median_docs_per_sec"] for c in out["levels"]
        },
    }))


if __name__ == "__main__":
    main()
