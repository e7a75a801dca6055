"""10x scale probe (VERDICT r4 item 5): synthesize an sf1-equivalent
dataset (10 key-offset copies of sf0.1) and time the 5 headline probes —
b2_bgp_join, b4_optional, tpch_q3_shipping, ext_dedup_minhash, rdf_load —
at BOTH sf0.1 and the 10x scale in one session, so scale regressions stop
hiding inside sf0.1 noise.

Results land in ``<cache_root>/scale_probe_results.json``; bench.py folds
them into its output (clearly labeled as this probe's cached measurement)
so the per-round BENCH json carries the scaling numbers.

Usage: python scripts/scale_probe.py [sf0.1_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

COPIES = 10
#: key offset per copy — far above any sf0.1 key range, keeps every FK
#: relationship intact within a copy and disjoint across copies
OFF = 100_000_000

#: numeric id columns to offset per table (FK consistency across tables)
ID_COLS = {
    "customer": ["c_custkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    # r10 (VERDICT item 7): events + embeddings scale too, so the
    # streaming-window and ANN probe lines measure real 10x growth
    # instead of a fixed-size dimension
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}
#: dimension tables copied once, unscaled (they are fixed-size in TPC-H too)
DIMS = ["region", "nation"]


def synth_dir(sf_dir: str) -> str:
    from graphdb_free_mocha_sa_spark import cache as C
    fp = C.fixture_fingerprint(sf_dir, C.RDF_TABLES + ["documents"])
    return os.path.join(C.cache_root(), f"sf1synth-{fp}")


def generate(sf_dir: str, out_dir: str) -> None:
    """10 key-offset copies of the fact tables, written as single parquet
    files (duckdb COPY) so the engine's content fingerprint works on them."""
    import duckdb
    os.makedirs(out_dir + ".tmp", exist_ok=True)
    con = duckdb.connect()
    for t, ids in ID_COLS.items():
        src = os.path.join(sf_dir, f"{t}.parquet")
        cols = [c[0] for c in con.sql(
            f"describe select * from '{src}'").fetchall()]
        types = {c[0]: c[1] for c in con.sql(
            f"describe select * from '{src}'").fetchall()}
        sel = []
        for c in cols:
            if c in ids and "INT" in types[c].upper():
                sel.append(f"{c} + k * {OFF} AS {c}")
            elif c in ids:          # string id: suffix non-zero copies
                sel.append(f"CASE WHEN k = 0 THEN {c} "
                           f"ELSE {c} || '_' || k END AS {c}")
            else:
                sel.append(c)
        con.sql(f"""COPY (SELECT {', '.join(sel)}
                    FROM read_parquet('{src}')
                    CROSS JOIN (SELECT unnest(range({COPIES})) AS k) t
                    ) TO '{out_dir}.tmp/{t}.parquet' (FORMAT PARQUET)""")
    for t in DIMS:
        src = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(src):
            con.sql(f"COPY (SELECT * FROM read_parquet('{src}')) TO "
                    f"'{out_dir}.tmp/{t}.parquet' (FORMAT PARQUET)")
    os.rename(out_dir + ".tmp", out_dir)


#: r10 (VERDICT r9 item 7): EVERY bench headliner probes at 10x (the
#: r9 probe covered 13 lines; the judge asked for the complete table).
#: Non-query bench lines (stream_ingest, server_*, inference_*) are
#: covered by run_recursive_probes and the bench's own fixtures.
PROBES = [
    "b1_scan", "b2_bgp_join", "b3_filter", "b4_optional",
    "b13_path_seq", "b13_path_plus", "b13_path_negated", "b19_describe",
    "b21_group_by", "b23_min_max_sum", "b40_inference_subclass",
    "tpch_q1_pricing", "tpch_q3_shipping", "tpch_q5_local_supplier",
    "ext_window_rank", "ext_dedup_exact", "ext_dedup_minhash",
    "ext_topk_cosine", "ext_ivf_topk", "ext_embed_neardup",
    "ext_text_termstats", "ext_stream_tumbling",
    "ext_quality_gopher", "ext_pack_sequences", "ext_bm25_search",
    "ext_line_dedup", "ext_lm_score", "ext_bpe_paircounts",
    "b2b_star6", "ext_fts_match", "ext_fts_fuzzy",
]


def run_probes(spark, sf_dir: str) -> dict[str, float]:
    import __spark_entry__ as entry_mod
    qs = entry_mod.queries()
    out: dict[str, float] = {}
    # fresh engine each pass: rdf_load then measures store-open + encoded
    # state from the published on-disk artifacts (the steady-state a new
    # session pays), not a dict hit on the entry module's engine cache
    entry_mod._ENGINES.pop(f"{id(spark)}:{sf_dir}", None)
    t0 = time.time()
    eng = entry_mod._engine(spark, sf_dir)
    eng.store.df.count()
    if getattr(eng, "encoded", False) and eng._should_encode():
        eng._encoded_state()
    out["rdf_load"] = round(time.time() - t0, 3)
    out["rdf_load_mode"] = "encoded" if eng._enc is not None else "string"
    for name in PROBES:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def run_recursive_probes(spark, scale: int) -> dict[str, float]:
    """Recursive-operator probes (r8 VERDICT item 2): the property-path
    frontier closure and the inference materialize / DRed-delete pair are
    the operators Catalyst doesn't give for free — their 10x behavior was
    asserted, not measured. Synthetic graphs sized by ``scale``:

    * path closure: a forest of depth-20 chains (1000*scale blocks →
      19k*scale edges, 190k*scale closure pairs). Constant depth means
      the frontier-loop iteration count is scale-invariant; the closure
      OUTPUT grows 10x, so the ideal warm ratio is ~10x linear work on
      32 fixed cores. Edge count is far past paths.SMALL_GRAPH_EDGES, so
      both legs run the distributed frontier loop.
    * inference: the bench fixture shape (10-deep subclass chain x
      60k*scale instances; both legs far past SMALL_ABOX_QUADS). The DRed
      leg deletes ONE instance type — its cost is bounded by the deleted
      fact's consequence cone, so it should be ~flat across scales (THE
      DRed scaling claim; re-materialization is the linear-growth leg).

    Runs each probe twice: *_cold pays dictionary/JIT/first-shuffle
    build, the plain key is the steady-state number the ratios use.
    """
    import pyspark.sql.functions as F

    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.model import (QUAD_SCHEMA, RDF_TYPE,
                                                   RDFS)
    from graphdb_free_mocha_sa_spark.store import QuadStore

    out: dict[str, float] = {}
    depth, blocks = 20, 1000 * scale
    chain = (spark.range(depth * blocks)
             .filter((F.col("id") + 1) % depth != 0)
             .select(F.lit("urn:g").alias("g"),
                     F.concat(F.lit("urn:n"), F.col("id")).alias("s"),
                     F.lit("urn:next").alias("p"),
                     F.concat(F.lit("urn:n"), F.col("id") + 1).alias("o_lex"),
                     F.lit(None).cast("string").alias("o_dt"),
                     F.lit(None).cast("string").alias("o_lang"),
                     F.lit(None).cast("double").alias("o_num"),
                     F.lit(None).cast("timestamp").alias("o_ts"))
             .localCheckpoint())
    eng = Engine(spark, QuadStore(spark, chain))
    q = "SELECT ?a ?b WHERE { ?a <urn:next>+ ?b }"
    for key in ("path_plus_closure_cold", "path_plus_closure"):
        # the warm pass must re-run the frontier loop, not hit the
        # engine's prepared-query LRU (warm = JIT + checkpointed input)
        eng._plan_cache.clear()
        t0 = time.time()
        eng.query(q).finalize({"a": "str", "b": "str"}) \
            .write.format("noop").mode("overwrite").save()
        out[key] = round(time.time() - t0, 3)

    sc_p = RDFS + "subClassOf"
    rows = [("urn:g", f"urn:C{i}", sc_p, f"urn:C{i+1}",
             None, None, None, None) for i in range(9)]
    inst = (spark.range(60_000 * scale)
            .select(F.lit("urn:g").alias("g"),
                    F.concat(F.lit("urn:i"), F.col("id")).alias("s"),
                    F.lit(RDF_TYPE).alias("p"),
                    F.concat(F.lit("urn:C"), F.col("id") % 10).alias("o_lex"),
                    F.lit(None).cast("string").alias("o_dt"),
                    F.lit(None).cast("string").alias("o_lang"),
                    F.lit(None).cast("double").alias("o_num"),
                    F.lit(None).cast("timestamp").alias("o_ts")))
    store = QuadStore(
        spark, spark.createDataFrame(rows, QUAD_SCHEMA).unionByName(inst)
        .repartition(8).localCheckpoint())
    t0 = time.time()
    store.materialize_inference()
    store._inferred.count()
    out["inference_materialize"] = round(time.time() - t0, 3)
    victim = spark.createDataFrame(
        [("urn:g", "urn:i0", RDF_TYPE, "urn:C0",
          None, None, None, None)], QUAD_SCHEMA)
    t0 = time.time()
    store.delete_quads(victim)
    store._inferred.count()
    out["inference_delete_dred"] = round(time.time() - t0, 3)

    # B42 commit-gate probe (r11, VERDICT r10 item 7): a checked INSERT
    # against a store of 60k*scale typed instances + a disjointness
    # TBox, inference off. gate_full_check is the one-time pre-state
    # verification (linear leg, by design); gate_checked_insert is the
    # steady-state O(delta) commit path — THE scale claim: its cost is
    # delta x join partners, so it should be near-flat at 10x store size.
    OWL = "http://www.w3.org/2002/07/owl#"
    drows = [("urn:g", f"urn:D{2 * i}", OWL + "disjointWith",
              f"urn:D{2 * i + 1}", None, None, None, None)
             for i in range(5)]
    gstore = QuadStore(
        spark, spark.createDataFrame(drows, QUAD_SCHEMA).unionByName(inst)
        .repartition(8).localCheckpoint())
    geng = Engine(spark, gstore, check_inconsistencies=True)
    t0 = time.time()
    geng.update(f"INSERT DATA {{ <urn:gw> <{RDF_TYPE}> <urn:D0> }}")
    out["gate_full_check"] = round(time.time() - t0, 3)
    t0 = time.time()
    geng.update(f"INSERT DATA {{ <urn:g1> <{RDF_TYPE}> <urn:D2> . "
                "<urn:g1> <urn:p> <urn:o> }")
    out["gate_checked_insert"] = round(time.time() - t0, 3)
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from graphdb_free_mocha_sa_spark import cache as C
    from graphdb_free_mocha_sa_spark.session import get_spark

    big = synth_dir(sf_dir)
    if not os.path.isdir(big):
        t0 = time.time()
        generate(sf_dir, big)
        print(f"generated 10x dataset at {big} in {time.time()-t0:.1f}s",
              file=sys.stderr)

    # r6 (VERDICT items 3+4): pin the dictionary-encoded regime — on a
    # real cluster encoding IS the 100 TB path, so a probe that silently
    # flips to string mode at 10x measures the wrong engine. And run each
    # scale TWICE in-session: the first pass pays artifact build + page
    # cache + JIT ("cold"), the second is steady-state ("warm") — the
    # scaling claim rests on the warm ratios, with the cold numbers kept
    # so cache-build asymmetry is attributed, not guessed.
    os.environ.setdefault("SPARK_GRAFT_FORCE_ENCODE", "1")
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    small_cold = run_probes(spark, sf_dir)
    small = run_probes(spark, sf_dir)
    large_cold = run_probes(spark, big)
    large = run_probes(spark, big)
    rec_small = run_recursive_probes(spark, 1)
    rec_large = run_recursive_probes(spark, 10)
    rec_ratios = {k: (round(rec_large[k] / rec_small[k], 2)
                      if rec_small.get(k) else None) for k in rec_small}
    ratios = {k: (round(large[k] / small[k], 2)
                  if isinstance(small.get(k), float) and small[k] > 0
                  and isinstance(large.get(k), float) else None)
              for k in small}
    ratios_cold = {k: (round(large_cold[k] / small_cold[k], 2)
                       if isinstance(small_cold.get(k), float)
                       and small_cold[k] > 0
                       and isinstance(large_cold.get(k), float) else None)
                   for k in small_cold}
    result = {
        "probe": "10x_scale",
        "copies": COPIES,
        "sf_small": sf_dir,
        "sf_large": big,
        "encode_pinned": bool(os.environ.get("SPARK_GRAFT_FORCE_ENCODE")),
        "small_cold": small_cold,
        "small": small,
        "large_cold": large_cold,
        "large": large,
        "ratio_10x": ratios,
        "ratio_10x_cold": ratios_cold,
        "recursive_small": rec_small,
        "recursive_large": rec_large,
        "recursive_ratio_10x": rec_ratios,
        "measured_unix": int(time.time()),
    }
    path = os.path.join(C.cache_root(), "scale_probe_results.json")
    with open(path, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
