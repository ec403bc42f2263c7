"""Dump `.explain("formatted")` for catalog queries to plans/<tag>/.

Usage: python tools/explain_dump.py <outdir> <suffix> [sf_dir] [name ...]

Writes plans/<outdir>/<query>_<suffix>.txt for each requested query
(default: the bench HEADLINE list). Building a DataFrame can itself run
small driver-side jobs (plan-time guards, localCheckpoint) — that is the
query's real construction cost and is fine here; nothing is fully
executed beyond what construction requires.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from person_linkage_case_study_spark import queries as catalog
from person_linkage_case_study_spark.session import get_spark


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "r15"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    names = sys.argv[4:]
    if not names:
        import bench

        names = list(bench.HEADLINE)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    dest = os.path.join(repo, "plans", outdir)
    os.makedirs(dest, exist_ok=True)
    spark = get_spark("explain-dump")
    qs = catalog.queries()
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            text = plan_of(df)
        except Exception as exc:  # keep going; record the failure
            text = f"EXPLAIN FAILED: {exc!r}\n"
        path = os.path.join(dest, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")


if __name__ == "__main__":
    main()
