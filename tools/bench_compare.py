"""Interleaved cross-round bench comparison: HEAD vs an older commit.

The ad-hoc methodology that correctly adjudicated the round-5 "ngram
1.5x regression" as box load (commit 44b7485, and the bench-noise
memory rule) institutionalized as a tool: both code versions run on the
SAME box, INTERLEAVED round-by-round (HEAD r1, REF r1, HEAD r2, REF r2,
...), min-of-N per side — so background-load swings hit both sides
roughly equally instead of whichever round ran later. A cross-round
delta is only believable as a regression if it survives this protocol;
raw per-round bench records from different days/boxes are not
comparable (BENCH_r05 vs r06 proved this twice).

Usage:
    python tools/bench_compare.py <ref_commit> \
        --entries minhash_lsh_pairs,incremental_neardup_lsh \
        [--runs 3] [--sf-dir /root/testdata/sf0.1] [--out BENCH_COMPARE.json]

Each side runs in its own subprocess with cwd/sys.path at its worktree
(two code versions can't share one interpreter); the REF side is checked
out into a temporary `git worktree` and removed afterwards. Per round a
side times each entry ONCE after a JVM/parquet warmup, using the same
full-evaluation checksum protocol as bench.py (xxhash64 over every
column, so nothing is prunable). Verdict per entry: ratio = ref_min /
head_min; > 1 means HEAD is faster. Deltas within the established
shared-box noise band (~1.3x) are labeled "noise-band"; beyond it
"investigate" — the tool reports, the human root-causes.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# runs inside each side's worktree; prints ONE json line {entry: sec}
_RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from opendata_gov_lt_mysql_import_spark.session import get_spark
from opendata_gov_lt_mysql_import_spark.queries import all_queries
import opendata_gov_lt_mysql_import_spark.queries_ml  # noqa: F401
import opendata_gov_lt_mysql_import_spark.queries_sql  # noqa: F401
try:
    import opendata_gov_lt_mysql_import_spark.queries_suites  # noqa: F401
except ImportError:
    pass
import bench  # force_eval: the full-evaluation checksum protocol

entries = sys.argv[1].split(",")
sf_dir = sys.argv[2]
spark = get_spark(app_name="bench_compare")
qs = all_queries()
qs["q1_pricing_summary"](spark, sf_dir).count()  # warm JVM + footers
out = {}
for name in entries:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    bench.force_eval(qs[name](spark, sf_dir))
    out[name] = round(time.perf_counter() - t0, 4)
print("@@RESULT@@" + json.dumps(out))
"""


def _run_side(cwd: str, entries: list[str], sf_dir: str) -> dict[str, float]:
    env = dict(os.environ, PYTHONPATH=cwd)
    proc = subprocess.run(
        [sys.executable, "-c", _RUNNER, ",".join(entries), sf_dir],
        cwd=cwd,
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("@@RESULT@@"):
            return json.loads(line[len("@@RESULT@@"):])
    raise RuntimeError(
        f"runner produced no result in {cwd}:\n{proc.stdout[-2000:]}"
        f"\n{proc.stderr[-2000:]}"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ref", help="older commit to compare HEAD against")
    ap.add_argument("--entries", required=True)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_COMPARE.json"))
    ap.add_argument(
        "--noise-band",
        type=float,
        default=1.3,
        help="interleaved delta below this ratio is shared-box noise",
    )
    args = ap.parse_args()
    entries = args.entries.split(",")

    ref_sha = subprocess.run(
        ["git", "rev-parse", args.ref], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()
    head_sha = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout.strip()

    wt = tempfile.mkdtemp(prefix="bench_compare_ref_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", wt, ref_sha],
        cwd=REPO,
        check=True,
        capture_output=True,
    )
    try:
        head_runs: list[dict[str, float]] = []
        ref_runs: list[dict[str, float]] = []
        for r in range(args.runs):
            # interleave: HEAD then REF inside every round
            print(f"# round {r + 1}/{args.runs}: HEAD", file=sys.stderr)
            head_runs.append(_run_side(REPO, entries, args.sf_dir))
            print(f"# round {r + 1}/{args.runs}: REF {ref_sha[:8]}", file=sys.stderr)
            ref_runs.append(_run_side(wt, entries, args.sf_dir))
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO,
            capture_output=True,
        )

    result = {
        "protocol": f"interleaved min-of-{args.runs}, subprocess per side per round",
        "sf_dir": args.sf_dir,
        "head": head_sha,
        "ref": ref_sha,
        "noise_band": args.noise_band,
        "entries": {},
    }
    for name in entries:
        h = min(run[name] for run in head_runs)
        f = min(run[name] for run in ref_runs)
        ratio = round(f / h, 3) if h > 0 else None
        verdict = (
            "noise-band"
            if ratio is not None and 1 / args.noise_band <= ratio <= args.noise_band
            else ("head-faster" if ratio and ratio > 1 else "investigate")
        )
        result["entries"][name] = {
            "head_min": h,
            "ref_min": f,
            "head_all": [run[name] for run in head_runs],
            "ref_all": [run[name] for run in ref_runs],
            "ratio_ref_over_head": ratio,
            "verdict": verdict,
        }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
        fh.write("\n")
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
