#!/usr/bin/env python
"""Dump .explain("formatted") for selected gate queries to
plans/r07/<query>_<suffix>.txt (the round-7 optimization evidence).

Usage: python tools/plans_r07.py before q83_bm25_topk q85_host_authority ...
       python tools/plans_r07.py after  q83_bm25_topk ...

PLAN_DUMP_MODE bypasses the eager localCheckpoint materialization so
the real operator tree is dumped (same mechanism as tools/dump_plans).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web_scraper_spark.operators import _materialize  # noqa: E402

_materialize.PLAN_DUMP_MODE = True

from web_scraper_spark.plans.queries import QUERIES  # noqa: E402
from web_scraper_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r07",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("plans_r07")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = QUERIES[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        short = name.split("_", 1)[0]
        path = os.path.join(out_dir, f"{short}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir}\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
