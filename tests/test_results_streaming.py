"""B51 bounded serialization: SPARQL-Results-JSON must stream from
``toLocalIterator`` — driver memory independent of result rows (VERDICT r4
"What's wrong" #1). The reference streams row-by-row through
``SPARQLResultsJSONWriter`` (GraphDBSystemAdapter.java:247-249); only its
final byte buffer is whole-result.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import DataFrame

from graphdb_free_mocha_sa_spark.engine import Engine
from graphdb_free_mocha_sa_spark.sparql.results import (
    SENTINEL, iter_select_json, select_json, select_json_to)
from graphdb_free_mocha_sa_spark.store import QuadStore


def _result_df(spark, n=10):
    """A df in the serializer's var-family layout (v, v__lex, v__dt, v__lang)."""
    rows = [(f"k{i}", f"val{i}", "http://www.w3.org/2001/XMLSchema#string",
             None) for i in range(n)]
    return spark.createDataFrame(
        rows, "v string, v__lex string, v__dt string, v__lang string"
    ).repartition(4)


def test_select_json_never_collects(spark, monkeypatch):
    """The serializer must not materialize the result set via collect()."""
    def boom(self):
        raise AssertionError("select_json must not call DataFrame.collect")
    monkeypatch.setattr(DataFrame, "collect", boom)
    out = json.loads(select_json(_result_df(spark, 8), ["v"]))
    assert len(out["results"]["bindings"]) == 8
    assert out["results"]["bindings"][0]["v"]["type"] == "literal"


def test_iter_select_json_chunked_per_row(spark):
    """One chunk per row (+ header/footer): a sink consuming the iterator
    holds O(1 row) regardless of result size."""
    n = 50
    chunks = list(iter_select_json(_result_df(spark, n), ["v"]))
    assert len(chunks) == n + 2
    doc = json.loads("".join(chunks))
    assert {b["v"]["value"] for b in doc["results"]["bindings"]} == \
        {f"val{i}" for i in range(n)}


def test_select_json_to_sink(spark):
    parts = []
    select_json_to(_result_df(spark, 5), ["v"], parts.append)
    doc = json.loads("".join(parts))
    assert doc["head"]["vars"] == ["v"]
    assert len(doc["results"]["bindings"]) == 5


def test_empty_result_valid_json(spark):
    doc = json.loads(select_json(_result_df(spark, 0), ["v"]))
    assert doc["results"]["bindings"] == []


@pytest.fixture()
def mini_engine(spark):
    store = QuadStore(spark)
    eng = Engine(spark, store)
    eng.update('INSERT DATA { <urn:a> <urn:p> "1" . <urn:b> <urn:p> "2" }')
    return eng


def test_query_json_to_streams(spark, mini_engine):
    parts = []
    mini_engine.query_json_to(
        "SELECT ?s ?o WHERE { ?s <urn:p> ?o }", parts.append)
    assert len(parts) >= 3          # header + 2 rows + footer (some merged)
    doc = json.loads("".join(parts))
    assert len(doc["results"]["bindings"]) == 2


def test_query_json_to_sentinel_on_error(spark, mini_engine):
    parts = []
    mini_engine.query_json_to("SELECT broken {{{", parts.append)
    assert "".join(parts) == SENTINEL


def test_query_json_to_ask(spark, mini_engine):
    parts = []
    mini_engine.query_json_to("ASK { <urn:a> <urn:p> ?o }", parts.append)
    assert json.loads("".join(parts))["boolean"] is True


def test_http_server_real_socket_roundtrip(spark):
    """r6: serve() returns the HTTPServer (callers own the loop); a real
    GET + chunked-streaming response round-trips through a socket."""
    import json
    import threading
    import urllib.parse
    import urllib.request

    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA
    from graphdb_free_mocha_sa_spark.server import serve
    from graphdb_free_mocha_sa_spark.store import QuadStore

    rows = [("urn:g", f"urn:s{i}", "urn:p", f"v{i}", None, None, None, None)
            for i in range(3)]
    eng = Engine(spark, QuadStore(spark, spark.createDataFrame(rows, QUAD_SCHEMA)))
    srv = serve(eng, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        q = urllib.parse.quote("SELECT ?s ?o WHERE { ?s <urn:p> ?o } ORDER BY ?s")
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/sparql?query={q}", timeout=60) as r:
            assert r.status == 200
            out = json.loads(r.read())
        assert [b["o"]["value"] for b in out["results"]["bindings"]] \
            == ["v0", "v1", "v2"]
        # POST an update, then re-query through the same socket server
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sparql",
            data=b'INSERT DATA { <urn:s9> <urn:p> "v9" }', method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            assert json.loads(r.read())["ok"] is True
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/sparql?query={q}", timeout=60) as r:
            assert len(json.loads(r.read())["results"]["bindings"]) == 4
    finally:
        srv.shutdown()
        srv.server_close()
