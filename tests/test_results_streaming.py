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


def test_result_formats_xml_csv_tsv(spark):
    """r6 (B51+): XML/CSV/TSV writers — streaming, spec-shaped terms,
    in-format failure sentinels, Accept-header negotiation."""
    import json
    import threading
    import urllib.request
    import xml.etree.ElementTree as ET

    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA
    from graphdb_free_mocha_sa_spark.server import serve
    from graphdb_free_mocha_sa_spark.store import QuadStore

    rows = [
        ("urn:g", "urn:s1", "urn:p", "plain, \"quoted\"",
         "http://www.w3.org/2001/XMLSchema#string", None, None, None),
        ("urn:g", "urn:s2", "urn:p", "bonjour",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "fr",
         None, None),
        ("urn:g", "urn:s3", "urn:p", "5",
         "http://www.w3.org/2001/XMLSchema#integer", None, 5.0, None),
        ("urn:g", "urn:s4", "urn:p", "urn:o", None, None, None, None),
    ]
    eng = Engine(spark, QuadStore(spark,
                                  spark.createDataFrame(rows, QUAD_SCHEMA)))
    q = "SELECT ?s ?o WHERE { ?s <urn:p> ?o } ORDER BY ?s"

    xml_doc = []
    eng.query_to(q, xml_doc.append, fmt="xml")
    root = ET.fromstring("".join(xml_doc))
    ns = "{http://www.w3.org/2005/sparql-results#}"
    results = root.findall(f"{ns}results/{ns}result")
    assert len(results) == 4
    lit = results[1].findall(f"{ns}binding")[1][0]
    assert lit.get("{http://www.w3.org/XML/1998/namespace}lang") == "fr"
    assert results[2].findall(f"{ns}binding")[1][0].get("datatype") \
        == "http://www.w3.org/2001/XMLSchema#integer"
    assert results[3].findall(f"{ns}binding")[1][0].tag == f"{ns}uri"

    csv_doc = []
    eng.query_to(q, csv_doc.append, fmt="csv")
    lines = "".join(csv_doc).split("\r\n")
    assert lines[0] == "s,o"
    assert lines[1] == 'urn:s1,"plain, ""quoted"""'
    assert lines[3] == "urn:s3,5"

    tsv_doc = []
    eng.query_to(q, tsv_doc.append, fmt="tsv")
    tlines = "".join(tsv_doc).splitlines()
    assert tlines[0] == "?s\t?o"
    assert tlines[2] == '<urn:s2>\t"bonjour"@fr'
    assert tlines[3] == ('<urn:s3>\t"5"^^'
                         "<http://www.w3.org/2001/XMLSchema#integer>")
    assert tlines[4] == "<urn:s4>\t<urn:o>"

    # in-format sentinel on a parse error
    bad = []
    eng.query_to("SELECT ?x WHERE { broken", bad.append, fmt="csv")
    assert "".join(bad) == "xxx\r\nXXX\r\n"

    # Accept negotiation through a real socket
    srv = serve(eng, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        import urllib.parse
        url = (f"http://127.0.0.1:{port}/sparql?query="
               + urllib.parse.quote(q))
        req = urllib.request.Request(url, headers={"Accept": "text/csv"})
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["Content-Type"] == "text/csv"
            assert r.read().decode().startswith("s,o\r\n")
        req = urllib.request.Request(
            url, headers={"Accept": "application/sparql-results+xml"})
        with urllib.request.urlopen(req, timeout=60) as r:
            assert "xml" in r.headers["Content-Type"]
            ET.fromstring(r.read())
    finally:
        srv.shutdown()
        srv.server_close()


def test_construct_ntriples_writer_roundtrip(spark, tmp_path):
    """r6: CONSTRUCT answers serialize as N-Triples and ROUND-TRIP through
    the repo's own N-Triples reader."""
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA
    from graphdb_free_mocha_sa_spark.sources.rdf import read_ntriples
    from graphdb_free_mocha_sa_spark.store import QuadStore

    rows = [
        ("urn:g", "urn:s1", "urn:p", "line1\nline2",
         "http://www.w3.org/2001/XMLSchema#string", None, None, None),
        ("urn:g", "urn:s2", "urn:p", "bonjour",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "fr",
         None, None),
        ("urn:g", "urn:s3", "urn:p", "7",
         "http://www.w3.org/2001/XMLSchema#integer", None, 7.0, None),
        ("urn:g", "urn:s4", "urn:p", "urn:o", None, None, None, None),
    ]
    eng = Engine(spark, QuadStore(spark,
                                  spark.createDataFrame(rows, QUAD_SCHEMA)))
    out = []
    eng.construct_to(
        "CONSTRUCT { ?s <urn:q> ?o } WHERE { ?s <urn:p> ?o }", out.append)
    doc = "".join(out)
    assert '<urn:s2> <urn:q> "bonjour"@fr .' in doc
    assert ('<urn:s3> <urn:q> "7"^^'
            "<http://www.w3.org/2001/XMLSchema#integer> .") in doc
    assert "<urn:s4> <urn:q> <urn:o> ." in doc
    assert '"line1\\nline2"' in doc
    p = tmp_path / "round.nt"
    p.write_text(doc)
    back = read_ntriples(spark, str(p), "urn:rt")
    assert back.count() == 4
    assert back.filter("o_lang = 'fr'").count() == 1
    assert back.filter("o_num = 7.0").count() == 1
    # SELECT through construct_to is a type error
    import pytest as _pytest
    with _pytest.raises(TypeError):
        eng.construct_to("SELECT ?s WHERE { ?s ?p ?o }", out.append)


def test_r6_review_fixes_server_and_replace(spark):
    """r6 review sweep: (a) negotiate_format honors q-values and client
    order; (b) update acks stay JSON-typed under a CSV Accept; (c) REPLACE
    'q' flag makes the replacement literal too."""
    import json
    import threading
    import urllib.request

    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.server import negotiate_format, serve
    from graphdb_free_mocha_sa_spark.store import QuadStore

    assert negotiate_format(
        "text/csv, application/sparql-results+xml;q=0.1") == "csv"
    assert negotiate_format("text/csv;q=0") == "json"
    assert negotiate_format("*/*") == "json"
    assert negotiate_format(
        "application/sparql-results+xml;q=0.5, text/csv;q=0.9") == "csv"
    assert negotiate_format("") == "json"

    eng = Engine(spark, QuadStore(spark))
    srv = serve(eng, port=0)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/sparql",
            data=b'INSERT DATA { <urn:s> <urn:p> "v" }', method="POST",
            headers={"Accept": "text/csv"})
        with urllib.request.urlopen(req, timeout=60) as r:
            assert r.headers["Content-Type"] \
                == "application/sparql-results+json"
            assert json.loads(r.read())["ok"] is True
    finally:
        srv.shutdown()
        srv.server_close()

    out = json.loads(eng.query_json(
        'SELECT ?a WHERE { BIND(REPLACE("price x", "x", "$5", "q") AS ?a) }'))
    assert out["results"]["bindings"][0]["a"]["value"] == "price $5"
