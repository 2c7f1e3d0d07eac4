"""Dump `.explain("formatted")` for declared queries to plans/r06/.

Usage: python tools/dump_plans_r06.py <before|after> <query> [query ...]

Writes plans/r06/<query>_<tag>.txt for each named query, evaluated at
sf0.01 (plan SHAPE is scale-invariant; the bench numbers come from
bench_extra.py / bench.py, not from here).
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if tag not in ("before", "after") or not names:
        print(__doc__)
        return 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

    import __spark_entry__ as entry
    from ml4logs_spark.session import get_spark

    spark = get_spark(app_name="dump_plans_r06", cores=4, shuffle_partitions=8)
    qs = entry.queries()
    out_dir = REPO / "plans" / "r06"
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = out_dir / f"{name}_{tag}.txt"
        path.write_text(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
