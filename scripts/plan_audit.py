"""Automated plan-quality audit over every driver entry (round 5).

Runs each ``queries()`` entry at a small scale, captures the EXECUTED
physical plan, and scans it for 100 TB scale smells:

* ``BatchEvalPython`` / row-at-a-time Python UDFs — forbidden everywhere
  (Arrow-batched ``ArrowEvalPython``/``MapInPandas`` are the sanctioned
  Python paths);
* ``BroadcastNestedLoopJoin`` / ``CartesianProduct`` — recorded with
  context (the compat-join mask decomposition intentionally cross-joins
  TINY unbound slivers; anything else is a red flag);
* encoded-table scans without a ``p_id`` PartitionFilter (a pattern scan
  that reads every predicate partition).

Prints one JSON line and exits non-zero if a forbidden smell appears.
Usage: python scripts/plan_audit.py [sf_dir] [entry ...]
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: entries whose operators legitimately evaluate Python in Arrow batches
ARROW_OK = re.compile(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas")


def audit_plan(plan: str) -> dict:
    out = {
        "row_python_udf": plan.count("BatchEvalPython"),
        "bnlj": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": plan.count("CartesianProduct"),
        "exchanges": plan.count("Exchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "broadcast_hash_joins": plan.count("BroadcastHashJoin"),
        "arrow_python": len(ARROW_OK.findall(plan)),
    }
    scans = re.findall(r"FileScan parquet [^\n]*enc_warm[^\n]*", plan)
    pruned = sum(1 for s in scans if "p_id" in s.split("PartitionFilters:")[-1]
                 if "PartitionFilters:" in s)
    out["enc_scans"] = len(scans)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    from graphdb_free_mocha_sa_spark.session import get_spark
    import __spark_entry__ as em

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    qs = em.queries()
    report = {}
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": f"{type(e).__name__}: {str(e)[:200]}"}
            continue
        a = audit_plan(plan)
        report[name] = a
        if a["row_python_udf"]:
            bad.append(f"{name}: row-wise Python UDF in plan")
    nested = {k: v for k, v in report.items()
              if isinstance(v, dict) and (v.get("bnlj") or v.get("cartesian"))}
    summary = {
        "entries": len(report),
        "forbidden": bad,
        "nested_or_cartesian": {k: {kk: v[kk] for kk in ("bnlj", "cartesian")}
                                for k, v in nested.items()},
        "report": report,
    }
    print(json.dumps(summary))
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
