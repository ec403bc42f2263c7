"""Targeted single-query alternating A/B (r16).

The full ``bench.py --mode=ab`` runs the whole 20-query suite per side per
round (~3 min a suite) — too coarse while iterating on ONE query on a host
whose walls fluctuate 3-10x between sessions. This runner alternates
base-worktree and head subprocesses that each time ONLY the requested
queries (same warmup + noop-sink methodology as bench.py), so a slow host
phase hits both sides symmetrically and a decision lands in ~2 min.

Usage: python tools/ab_query.py --base=<ref> q1 [q2 ...] [--rounds=N]
       python tools/ab_query.py --self q1 [...]   # head-only, for spreads
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, os, sys, time
sys.path.insert(0, os.getcwd())
from person_linkage_case_study_spark import queries as catalog
from person_linkage_case_study_spark.session import get_spark

names = json.loads(os.environ["AB_QUERIES"])
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("ab-query")
qs = catalog.queries()
for t in ("nation", "orders", "lineitem", "customer", "part"):
    spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
from pyspark.sql import functions as F
from person_linkage_case_study_spark.functions.similarity import jaro_winkler_udf
spark.range(256).repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32"))).select(
    jaro_winkler_udf(F.lit("W"), F.lit("W"))
).write.format("noop").mode("overwrite").save()
if "cascade_mini" in names:
    qs["cascade_mini"](spark, "/root/testdata/sf0.001").write.format("noop").mode(
        "overwrite").save()

t0 = time.time()
spark.read.parquet(f"{sf_dir}/lineitem.parquet").agg(
    F.sum("l_extendedprice"), F.count(F.lit(1))
).write.format("noop").mode("overwrite").save()
calib = round(time.time() - t0, 3)

# bench.py methodology: N reps per query inside the session, min is the
# comparable (the floor measures the engine; single cold shots measured
# 3-6x spreads on this host and buried real deltas in weather)
reps_n = int(os.environ.get("AB_REPS", "3"))
out = {}
raw = {}
for name in names:
    fn = qs[name]
    walls = []
    for _ in range(reps_n):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls.append(round(time.time() - t0, 3))
    out[name] = min(walls)
    raw[name] = walls
print(json.dumps({"queries": out, "raw": raw, "calib": calib}))
"""


def one(cwd: str, names: list[str]) -> dict:
    env = dict(os.environ, AB_QUERIES=json.dumps(names))
    p = subprocess.run(
        [sys.executable, "-c", _CHILD], cwd=cwd, capture_output=True,
        text=True, env=env,
    )
    line = next(
        (l for l in reversed(p.stdout.splitlines()) if l.startswith("{")), None
    )
    if p.returncode != 0 or line is None:
        sys.stderr.write(p.stderr[-4000:])
        raise SystemExit(p.returncode or 1)
    return json.loads(line)


def main() -> None:
    base_ref, rounds, self_only = None, 3, False
    names: list[str] = []
    for a in sys.argv[1:]:
        if a.startswith("--base="):
            base_ref = a.split("=", 1)[1]
        elif a.startswith("--rounds="):
            rounds = int(a.split("=", 1)[1])
        elif a == "--self":
            self_only = True
        else:
            names.append(a)
    if not names or (base_ref is None and not self_only):
        raise SystemExit(__doc__)

    if self_only:
        runs = [one(REPO, names) for _ in range(rounds)]
        for r in runs:
            print(json.dumps(r))
        return

    wt = tempfile.mkdtemp(prefix="ab_query_")
    subprocess.run(
        ["git", "worktree", "add", "--detach", "--force", wt, base_ref],
        cwd=REPO, check=True, capture_output=True,
    )
    try:
        sides: dict[str, list[dict]] = {"base": [], "head": []}
        for i in range(rounds):
            sides["base"].append(one(wt, names))
            sides["head"].append(one(REPO, names))
            print(
                f"round {i}: base={sides['base'][-1]} head={sides['head'][-1]}",
                file=sys.stderr,
            )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, capture_output=True,
        )
    summary = {
        "base_ref": base_ref,
        "rounds": rounds,
        "per_query": {
            q: {
                "base_min": min(r["queries"][q] for r in sides["base"]),
                "head_min": min(r["queries"][q] for r in sides["head"]),
                "base_all": [r["queries"][q] for r in sides["base"]],
                "head_all": [r["queries"][q] for r in sides["head"]],
            }
            for q in names
        },
        "calib": {s: [r["calib"] for r in sides[s]] for s in sides},
    }
    for q, d in summary["per_query"].items():
        d["ratio"] = round(d["head_min"] / d["base_min"], 3) if d["base_min"] else None
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
