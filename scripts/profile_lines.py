"""Job-count profiler for the non-inference bench lines (opt round r11).

Job counts are load-independent (unlike wall time on a contended box), so
they drive optimization decisions per guide §1. Reproduces the bench's
line setup exactly; prints per-phase wall + Spark job deltas.

Usage: python scripts/profile_lines.py [fts|server|ingest|tiny|all]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def jc(spark):
    st = spark.sparkContext.statusTracker()
    ids = st.getJobIdsForGroup(None)
    return max(ids) if ids else -1


def phase(spark, label, last):
    now = time.time()
    j = jc(spark)
    print(f"  {label:<46} {now - last[0]:7.3f}s  jobs +{j - last[1]}",
          file=sys.stderr)
    last[0] = now
    last[1] = j


def _force(df):
    df.write.format("noop").mode("overwrite").save()


def run_fts(spark, sf_dir):
    print("== ext_fts_match / ext_fts_fuzzy ==", file=sys.stderr)
    import __spark_entry__ as em
    qs = em.queries()
    for name in ("ext_fts_match", "ext_fts_fuzzy"):
        for i in range(2):
            last = [time.time(), jc(spark)]
            df = qs[name](spark, sf_dir)
            phase(spark, f"{name} build(run{i})", last)
            _force(df)
            phase(spark, f"{name} force(run{i})", last)


def run_server(spark, sf_dir):
    print("== server_roundtrip_20 ==", file=sys.stderr)
    import urllib.parse
    import urllib.request
    import threading
    import __spark_entry__ as em
    from graphdb_free_mocha_sa_spark.server import serve
    eng = em._engine(spark, sf_dir)
    srv = serve(eng, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    q = urllib.parse.quote(
        "SELECT ?s ?o WHERE { ?s <urn:x:p/n_name> ?o } LIMIT 20")
    last = [time.time(), jc(spark)]
    for i in range(5):
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/sparql?query={q}",
                timeout=60) as resp:
            resp.read()
        phase(spark, f"request {i}", last)
    srv.shutdown()
    srv.server_close()


def run_ingest(spark, sf_dir):
    print("== stream_ingest_500 ==", file=sys.stderr)
    import tempfile
    from graphdb_free_mocha_sa_spark.store import DurableQuadStore
    from graphdb_free_mocha_sa_spark.streaming.ingest import (
        stream_inserts_from_files)
    msg_dir = tempfile.mkdtemp(prefix="prof_ingest_")
    for i in range(500):
        quads = " . ".join(
            f"<urn:m{i}> <urn:p{j}> {i * 10 + j}" for j in range(5))
        with open(os.path.join(msg_dir, f"u{i:04d}.ru"), "w") as fh:
            fh.write(f"INSERT DATA {{ GRAPH <urn:bench:stream> {{ {quads} }} }}")
    store = DurableQuadStore(spark, tempfile.mkdtemp(prefix="prof_store_"))
    last = [time.time(), jc(spark)]
    stream_inserts_from_files(spark, store, msg_dir)
    phase(spark, "stream drain", last)
    store.df.count()
    phase(spark, "count", last)


def run_tiny(spark, sf_dir):
    print("== b40_inference_subclass / b13_path_plus (tiny stores) ==",
          file=sys.stderr)
    import __spark_entry__ as em
    qs = em.queries()
    for name in ("b40_inference_subclass", "b13_path_plus"):
        last = [time.time(), jc(spark)]
        df = qs[name](spark, sf_dir)
        phase(spark, f"{name} build", last)
        _force(df)
        phase(spark, f"{name} force", last)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from graphdb_free_mocha_sa_spark.session import get_spark
    spark = get_spark("profile-lines")
    spark.sparkContext.setLogLevel("ERROR")
    if which in ("fts", "all"):
        run_fts(spark, sf_dir)
    if which in ("server", "all"):
        run_server(spark, sf_dir)
    if which in ("ingest", "all"):
        run_ingest(spark, sf_dir)
    if which in ("tiny", "all"):
        run_tiny(spark, sf_dir)


if __name__ == "__main__":
    main()
