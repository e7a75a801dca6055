"""End-to-end lifecycle replay — the SURVEY M3 gate (EP1 → EP2 → EP3).

Reproduces the reference adapter's full run: versioned bulk load of staged
RDF files (EP1, GraphDBSystemAdapter.java:277-332), flip to query mode and
stream INSERT micro-batches (EP2, :188-209), then serve SELECT tasks with
SPARQL-Results-JSON output (EP3, :240-261) — all against one QuadStore.
"""

from __future__ import annotations

import json


def test_full_lifecycle_replay(spark, tmp_path):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.sources.rdf import read_rdf_file
    from graphdb_free_mocha_sa_spark.store import QuadStore
    from graphdb_free_mocha_sa_spark.streaming.ingest import (
        stream_inserts_from_files)
    from graphdb_free_mocha_sa_spark.update import rewrite_insert_with

    store = QuadStore(spark)
    eng = Engine(spark, store)

    # ---- EP1: two bulk-load phases from staged files, one graph per version
    f0 = tmp_path / "bulk0.nt"
    f0.write_text('<urn:m:a> <urn:m:score> "1"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
                  '<urn:m:b> <urn:m:score> "2"^^<http://www.w3.org/2001/XMLSchema#integer> .\n')
    f1 = tmp_path / "bulk1.nt"
    f1.write_text('<urn:m:c> <urn:m:score> "3"^^<http://www.w3.org/2001/XMLSchema#integer> .\n')
    g0 = store.load_version(read_rdf_file(spark, str(f0), graph="ignored"))
    g1 = store.load_version(read_rdf_file(spark, str(f1), graph="ignored"))
    assert (g0, g1) == ("http://graph.version.0", "http://graph.version.1")

    # version-pinned read: version-0 snapshot sees only the first load
    v0 = eng.query(f"""
        SELECT ?s WHERE {{ GRAPH <{g0}> {{ ?s <urn:m:score> ?v }} }}
    """).finalize({"s": "str"})
    assert sorted(r[0] for r in v0.collect()) == ["urn:m:a", "urn:m:b"]

    # ---- EP2: streaming INSERT micro-batches (with the A8 rewrite applied)
    ups = tmp_path / "updates"
    ups.mkdir()
    raw = ('INSERT WITH <urn:m:stream> '
           '{ <urn:m:d> <urn:m:score> 4 } WHERE {    }')
    (ups / "u1.txt").write_text(rewrite_insert_with(raw))
    (ups / "u2.txt").write_text(
        'INSERT DATA { GRAPH <urn:m:stream> { <urn:m:e> <urn:m:score> 5 } }')
    stream_inserts_from_files(spark, store, str(ups))

    # ---- EP3: SELECT task over the union of all graphs, JSON serialized
    out = json.loads(eng.query_json(
        "SELECT ?s ?v WHERE { ?s <urn:m:score> ?v } ORDER BY ?v"))
    vals = [(b["s"]["value"], b["v"]["value"])
            for b in out["results"]["bindings"]]
    assert vals == [("urn:m:a", "1"), ("urn:m:b", "2"), ("urn:m:c", "3"),
                    ("urn:m:d", "4"), ("urn:m:e", "5")]

    # a failing task still answers with the sentinel, not an exception (A13)
    assert "XXX" in eng.query_json("SELECT broken {{{")
