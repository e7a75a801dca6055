"""Capture .explain("formatted") for bench headliners (optimization round).

Writes plans/<tag>/<query>_<suffix>.txt for each requested entry.
Usage: python scripts/capture_plans.py <suffix: before|after> [entry ...]
Defaults to every bench.HEADLINERS entry at $SPARK_GRAFT_SF_DIR (sf0.1).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TAG = os.environ.get("SPARK_GRAFT_PLAN_TAG", "r12")


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from graphdb_free_mocha_sa_spark.session import get_spark
    import __spark_entry__ as em
    import bench

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    names = [n for n in bench.HEADLINERS if not only or n in only]
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", TAG)
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        try:
            df = qs[name](spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {type(e).__name__}: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"captured {name} -> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
