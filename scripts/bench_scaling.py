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
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


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


def run_level(cpus: int, pages: str, work: str, runs: int, zip_path: str) -> dict:
    spark_submit = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"
    results = []
    for i in range(runs + 1):  # first run = warm-up, discarded
        index_path = os.path.join(work, f"index_c{cpus}_r{i}")
        cmd = [
            spark_submit,
            "--master", f"local[{cpus}]",
            "--py-files", zip_path,
            "--conf", "spark.driver.memory=8g",
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
        tag = "warmup" if i == 0 else f"run{i}"
        print(f"[local[{cpus}] {tag}] {rec}", file=sys.stderr)
        if i > 0:
            results.append(rec)
    med = lambda k: statistics.median(r[k] for r in results)  # noqa: E731
    return {
        "cpus": cpus,
        "runs": results,
        "median_docs_per_sec": med("docs_per_sec"),
        "median_build_sec": med("build_sec"),
        "median_ms_per_query": med("ms_per_query"),
        "n_docs": results[0]["n_docs"],
    }


def update_baseline_md(summary: dict) -> None:
    path = os.path.join(REPO, "BASELINE.md")
    with open(path, encoding="utf-8") as f:
        text = f.read()
    n8, n32 = summary["levels"]["8"], summary["levels"]["32"]
    table = (
        "| metric | local[8] | local[32] | efficiency | notes |\n"
        "|---|---|---|---|---|\n"
        f"| index build (docs/sec) | {n8['median_docs_per_sec']:.1f} | "
        f"{n32['median_docs_per_sec']:.1f} | "
        f"{summary['scaling_efficiency']:.2f} | "
        f"{n8['n_docs']} docs, median of {len(n8['runs'])} runs, "
        "1 warm-up discarded, fresh JVM per run |\n"
        f"| BM25 top-10 latency (ms/query, median) | "
        f"{n8['median_ms_per_query']:.1f} | {n32['median_ms_per_query']:.1f} | "
        "— | 25-query fixture batch |\n"
    )
    marker = "| metric | local[8] | local[32] | efficiency | notes |"
    head = text.split(marker)[0]
    with open(path, "w", encoding="utf-8") as f:
        f.write(head + table)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-pages", type=int, default=50_000)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--levels", default="8,32")
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
    for cpus in levels:
        out["levels"][str(cpus)] = run_level(cpus, pages, work, args.runs, zip_path)

    lo, hi = str(min(levels)), str(max(levels))
    ratio = max(levels) / min(levels)
    out["scaling_efficiency"] = round(
        (out["levels"][hi]["median_docs_per_sec"]
         / out["levels"][lo]["median_docs_per_sec"]) / ratio,
        3,
    )
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    if set(levels) == {8, 32}:
        update_baseline_md(out)
    print(json.dumps({
        "scaling_efficiency": out["scaling_efficiency"],
        "docs_per_sec": {
            c: out["levels"][c]["median_docs_per_sec"] for c in out["levels"]
        },
    }))


if __name__ == "__main__":
    main()
