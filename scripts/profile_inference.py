"""Phase-level profiler for the bench's inference/gate lines (opt round r11).

Reproduces bench.py's inference_materialize_60k / inference_delete_dred /
gate_checked_insert lines with per-phase wall timings and Spark job counts,
so optimization targets the measured cost, not a guess (guide §1).

Usage: python scripts/profile_inference.py [materialize|dred|gate|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class JobCounter:
    """Counts Spark jobs via the REST-less statusTracker poll (job ids are
    monotonically increasing)."""

    def __init__(self, spark):
        self.spark = spark

    def snap(self):
        st = self.spark.sparkContext.statusTracker()
        ids = st.getJobIdsForGroup(None)
        return max(ids) if ids else -1


def phase(spark, jc, label, last):
    now = time.time()
    j = jc.snap()
    print(f"  {label:<42} {now - last[0]:7.3f}s  jobs +{j - last[1]}",
          file=sys.stderr)
    last[0] = now
    last[1] = j


def run_materialize_dred(spark, jc):
    from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA, RDF_TYPE, RDFS
    from graphdb_free_mocha_sa_spark.store import QuadStore
    sc_p = RDFS + "subClassOf"
    rows = [("urn:g", f"urn:C{i}", sc_p, f"urn:C{i+1}",
             None, None, None, None) for i in range(9)]
    rows += [("urn:g", f"urn:i{k}", RDF_TYPE, f"urn:C{k % 10}",
              None, None, None, None) for k in range(60_000)]
    last = [time.time(), jc.snap()]
    store = QuadStore(spark, spark.createDataFrame(rows, QUAD_SCHEMA)
                      .repartition(8).localCheckpoint())
    phase(spark, jc, "store build", last)
    t0 = time.time()
    store.materialize_inference()
    store._inferred.count()
    phase(spark, jc, f"materialize total={time.time()-t0:.3f}", last)
    from pyspark.sql import functions as F  # noqa: F401
    victim = spark.createDataFrame(
        [("urn:g", "urn:i0", RDF_TYPE, "urn:C0", None, None, None, None)],
        QUAD_SCHEMA)
    t0 = time.time()
    store.delete_quads(victim)
    store._inferred.count()
    phase(spark, jc, f"dred delete total={time.time()-t0:.3f}", last)


def run_gate(spark, jc, sf_dir):
    import __spark_entry__ as em
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.model import RDF_TYPE
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng0 = em._engine(spark, sf_dir)
    eng0.store.df.count()
    last = [time.time(), jc.snap()]
    gate_eng = Engine(spark, QuadStore(spark, eng0.store.df),
                      check_inconsistencies=True)
    gate_eng.update(f"INSERT DATA {{ <urn:bench:gw> <{RDF_TYPE}> "
                    "<urn:bench:C> }")
    phase(spark, jc, "warmup checked insert (full check)", last)
    t0 = time.time()
    gate_eng.update(f"INSERT DATA {{ <urn:bench:g1> <{RDF_TYPE}> "
                    "<urn:bench:C> . <urn:bench:g1> <urn:p> <urn:o> }")
    phase(spark, jc, f"steady checked insert total={time.time()-t0:.3f}",
          last)
    t0 = time.time()
    gate_eng.update(f"INSERT DATA {{ <urn:bench:g2> <{RDF_TYPE}> "
                    "<urn:bench:C> . <urn:bench:g2> <urn:p> <urn:o> }")
    phase(spark, jc, f"second steady insert total={time.time()-t0:.3f}",
          last)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from graphdb_free_mocha_sa_spark.session import get_spark
    spark = get_spark("profile-inference")
    spark.sparkContext.setLogLevel("ERROR")
    jc = JobCounter(spark)
    # warm the JVM
    spark.range(0, 1_000_000, 1, 32).selectExpr("sum(id)").collect()
    if which in ("materialize", "dred", "all"):
        print("== materialize + dred ==", file=sys.stderr)
        run_materialize_dred(spark, jc)
    if which in ("gate", "all"):
        print("== gate ==", file=sys.stderr)
        run_gate(spark, jc, sf_dir)


if __name__ == "__main__":
    main()
