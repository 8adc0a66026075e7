#!/usr/bin/env python
"""Same-host A/B regression control, promoted from the manual
procedure in BENCH/BASELINE.md "Same-host A/B" (VERDICT r05 #6).

Usage:
    python scripts/bench_ab.py <ref-commit> [pairs] [only] [sf_dir]

Worktrees <ref-commit> under /tmp/bench_ab_<commit>, then runs the
FROZEN bench (``bench.py --single``, fresh JVM per run) interleaved
A,B,A,B,... so both trees sample the same host phases, and prints the
per-query best-of deltas.  Use whenever a round's totals drift >15%:
on this host a single-run comparison is noise (documented 3-4x
minute-to-minute swings), while an interleaved best-of pair is the
cheapest defensible statistic.

``only`` is a comma list for SPARK_GRAFT_BENCH_ONLY (e.g. "q5,q6");
default runs every query.  HEAD side runs from the repo root, ref
side from the worktree; both use the ref-start bench methodology
(the bench file itself is frozen across optimization rounds).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_single(cwd: str, only: str | None, sf_dir: str) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_REPS"] = env.get("SPARK_GRAFT_BENCH_REPS", "2")
    if only:
        env["SPARK_GRAFT_BENCH_ONLY"] = only
    else:
        env.pop("SPARK_GRAFT_BENCH_ONLY", None)
    out = subprocess.run(
        [sys.executable, os.path.join(cwd, "bench.py"), "--single", "32", "1"],
        capture_output=True, text=True, env=env, cwd=cwd, check=True)
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)["queries"]


def main():
    if len(sys.argv) < 2:
        sys.exit(__doc__)
    ref = sys.argv[1]
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    only = sys.argv[3] if len(sys.argv) > 3 else None
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else \
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    wt = f"/tmp/bench_ab_{ref}"
    if not os.path.isdir(wt):
        subprocess.run(["git", "worktree", "add", wt, ref],
                       cwd=ROOT, check=True)
    runs_a, runs_b = [], []
    for i in range(pairs):
        print(f"pair {i + 1}/{pairs}: HEAD ...", flush=True)
        runs_a.append(run_single(ROOT, only, sf_dir))
        print(f"pair {i + 1}/{pairs}: {ref} ...", flush=True)
        runs_b.append(run_single(wt, only, sf_dir))
    best_a = {k: min(r[k] for r in runs_a) for k in runs_a[0]}
    best_b = {k: min(r[k] for r in runs_b) for k in runs_b[0]}
    print(f"\n{'query':24} {'HEAD':>8} {ref[:10]:>10} {'delta':>8}")
    for k in best_a:
        d = best_a[k] / best_b[k] - 1.0
        print(f"{k:24} {best_a[k]:8.3f} {best_b[k]:10.3f} {d:+7.1%}")
    ta, tb = sum(best_a.values()), sum(best_b.values())
    print(f"{'TOTAL':24} {ta:8.3f} {tb:10.3f} {ta / tb - 1.0:+7.1%}")
    print(json.dumps({"head": best_a, ref: best_b,
                      "samples_head": runs_a, "samples_ref": runs_b}))


if __name__ == "__main__":
    main()
