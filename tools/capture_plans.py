#!/usr/bin/env python
"""Capture .explain('formatted') for the bench lanes into plans/<round>/.

Round dir from $SPARK_GRAFT_PLANS_ROUND (default r17).

Usage: python tools/capture_plans.py <suffix> [query ...]
With no query list, captures every HEADLINE + HEADLINE2 lane.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench
from reindexer_spark import get_query, get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r17"))


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:] or (bench.HEADLINE + bench.HEADLINE2)
    spark = get_spark("plan-capture")
    os.makedirs(OUT, exist_ok=True)
    for name in names:
        q = get_query(name)
        try:
            df = q.fn(spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as e:  # streaming lanes can't be built lazily
            text = f"(plan capture failed: {type(e).__name__}: {e})\n"
        with open(os.path.join(OUT, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(f"# {name} — sf_dir={SF_DIR}\n{text}")
        print(name, "ok" if not text.startswith("(plan") else "SKIP")
    return 0


if __name__ == "__main__":
    sys.exit(main())
