"""Two-cluster-size scaling evidence (north_rule: throughput scaling
efficiency >= 0.8 between N and 4N executors).

No real cluster exists in the sandbox, so the N/4N-executor criterion is
evidenced the documented way: the SAME spark-submit job, SAME input, run
at two parallelism levels (local[N] and local[4N]); efficiency =
(docs_per_sec@4N / docs_per_sec@N) / 4.

The headline protocol (see BASELINE.md "Measured scaling"): pin each
level to a disjoint CPU budget so a "cluster of N cores" really has N
cores for its JVM and Python workers, use the 'heavy' page profile so
per-doc compute dominates fixed overhead, and pick the widest N/4N pair
below the host's memory-bandwidth knee:

    python jobs/scaling_bench.py --pin --n 2 --rows 500000 \
        --profile heavy --update-baseline

Prints one JSON line and (with --update-baseline) refreshes the
"Latest scaling_bench run" section of BASELINE.md (the hand-analyzed
"Measured scaling" section is left untouched).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_zip() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    zpath = os.path.join(dist, "paddleocr_spark.zip")
    if os.path.exists(zpath):
        os.remove(zpath)
    subprocess.run(
        ["zip", "-qr", zpath, "paddleocr_spark", "-x", "*__pycache__*"],
        cwd=REPO,
        check=True,
    )
    return zpath


def run_once(cores: int, zpath: str, input_path: str, out_dir: str,
             partitions: int, salt: int, pin: bool = False,
             mode: str = "fused") -> dict:
    if os.path.exists(out_dir):
        shutil.rmtree(out_dir)
    cmd = (["taskset", "-c", f"0-{cores - 1}"] if pin else []) + [
        "spark-submit",
        "--master", f"local[{cores}]",
        # local mode: the driver JVM hosts all executor threads — the
        # 1g spark-submit default intermittently dies with SparkExitCode
        # OOM(52) at 8 threads × dynamic-partition parquet writers.
        "--driver-memory", "8g",
        "--conf", "spark.ui.enabled=false",
        "--conf", f"spark.sql.shuffle.partitions={max(cores * 2, 16)}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--py-files", zpath,
        os.path.join(REPO, "jobs", "extract.py"),
        "--input", input_path,
        "--output", out_dir,
        "--partitions", str(partitions),
        "--salt", str(salt),
        "--mode", mode,
    ]
    load_before = os.getloadavg()[0]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO, check=True)
    last = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(last)
    # external-contention audit trail: this box is multi-tenant, and a
    # leg measured while other tenants are busy is NOT a valid scaling
    # sample (the external load competes for the pinned cores and the
    # shared disk). loadavg beyond our own job ≈ contamination.
    out["loadavg_before"] = round(load_before, 2)
    out["loadavg_after"] = round(os.getloadavg()[0], 2)
    return out


def update_baseline(result: dict) -> None:
    path = os.path.join(REPO, "BASELINE.md")
    section = (
        "## Latest scaling_bench run\n\n"
        f"Same `spark-submit --py-files` job, same input "
        f"({result['n_docs']} pages, {result['input']}):\n\n"
        f"| cores | wall (s) | docs/sec |\n|---|---|---|\n"
        f"| local[{result['n']}] | {result['wall_n']} | {result['docs_per_sec_n']} |\n"
        f"| local[{result['n4']}] | {result['wall_4n']} | {result['docs_per_sec_4n']} |\n\n"
        f"**Scaling efficiency (N -> 4N) = {result['scaling_efficiency']}** "
        f"(target >= 0.8 per BASELINE.json).\n"
    )
    with open(path) as f:
        text = f.read()
    marker = "## Latest scaling_bench run"
    if marker in text:
        text = re.sub(r"## Latest scaling_bench run.*?(?=\n## |\Z)", section, text, flags=re.S)
    else:
        text = text.rstrip() + "\n\n" + section
    with open(path, "w") as f:
        f.write(text)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--pin", action="store_true",
                    help="taskset each level to a disjoint CPU budget (honest cluster-size emulation)")
    ap.add_argument("--profile", default="base", choices=["base", "heavy"])
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--rows", type=int, default=None,
                    help="override page count (cached under .data/pages)")
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--salt", type=int, default=8)
    ap.add_argument("--mode", default="fused",
                    choices=["fused", "array", "relational"],
                    help="extraction mode under test (the job default)")
    ap.add_argument("--update-baseline", action="store_true")
    ap.add_argument("--repeat", type=int, default=1,
                    help="run the pair K times; report per-leg MIN wall "
                    "(the uncontended cost on a multi-tenant host)")
    args = ap.parse_args()

    from paddleocr_spark.sources.pages import ensure_pages

    if args.rows:
        name = f"{args.profile}{args.rows}" if args.profile != "base" else f"scale{args.rows}"
        pages_dir = ensure_pages(name, n_rows=args.rows, profile=args.profile)
    else:
        # forward --profile: ensure_pages validates cached params, so a
        # heavy request against a base cache fails loudly instead of
        # silently benchmarking the wrong corpus
        pages_dir = ensure_pages(args.sf_dir, profile=args.profile)
    input_path = os.path.join(pages_dir, "pages.parquet")

    start_load = os.getloadavg()[0]
    if start_load > 1.0:
        print(
            json.dumps({"warning": "host loadavg %.2f > 1 before start — "
                        "external tenants will contaminate the measurement; "
                        "re-run in a quiet window" % start_load}),
            file=sys.stderr,
        )

    zpath = build_zip()
    runs_n, runs_4n = [], []
    for _ in range(max(args.repeat, 1)):
        runs_n.append(run_once(
            args.n, zpath, input_path, "/tmp/scale_n",
            args.partitions, args.salt, args.pin, args.mode))
        runs_4n.append(run_once(
            args.n * 4, zpath, input_path, "/tmp/scale_4n",
            args.partitions, args.salt, args.pin, args.mode))
    r_n = min(runs_n, key=lambda r: r["wall_sec"])
    r_4n = min(runs_4n, key=lambda r: r["wall_sec"])

    eff = (r_4n["docs_per_sec"] / r_n["docs_per_sec"]) / 4.0
    result = {
        "input": input_path,
        "n_docs": r_n["rows_out"],
        "n": args.n,
        "n4": args.n * 4,
        "wall_n": r_n["wall_sec"],
        "wall_4n": r_4n["wall_sec"],
        "docs_per_sec_n": r_n["docs_per_sec"],
        "docs_per_sec_4n": r_4n["docs_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "repeat": max(args.repeat, 1),
        "mode": args.mode,
        "all_walls_n": [r["wall_sec"] for r in runs_n],
        "all_walls_4n": [r["wall_sec"] for r in runs_4n],
        "loadavg": {
            "n_before": r_n["loadavg_before"], "n_after": r_n["loadavg_after"],
            "n4_before": r_4n["loadavg_before"], "n4_after": r_4n["loadavg_after"],
        },
    }
    if args.update_baseline:
        update_baseline(result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
