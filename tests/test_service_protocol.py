"""SERVICE protocol-semantics matrix (r8 VERDICT item 4).

SPARQL 1.1 Federated Query, §3-§4: the SILENT x error x empty x endpoint-form
matrix. The distinctions that matter (and that the existing unit tests in
test_round2_fixes.py did not cover as a matrix):

* SILENT turns an endpoint FAILURE (unreachable, HTTP error, undecodable
  payload) into the unit solution — it must NOT turn an EMPTY result set
  into one (empty is a successful evaluation with zero solutions).
* a variable endpoint is an error when unbound (SILENT: unit / upstream
  passthrough), evaluated per distinct upstream value when bound.
* remote bindings with per-row unbound variables join under compatibility
  semantics, exactly like a local OPTIONAL's output.

The loopback endpoint is scripted by URL path (/ok /empty /err500 /badjson
/partial), so each cell of the matrix picks its remote behavior without a
second server. Reference analogue: jena-arq federation inside GraphDB
accepts all these query shapes (GraphDBSystemAdapter.java:246 runs arbitrary
SPARQL 1.1 text).
"""

from __future__ import annotations

import json
import socket
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest


def _payload(var_rows: list[dict]) -> str:
    vs = sorted({v for row in var_rows for v in row})
    return json.dumps({
        "head": {"vars": vs},
        "results": {"bindings": var_rows},
    })


_RESPONSES = {
    "/ok": (200, _payload([
        {"s": {"type": "uri", "value": "urn:r:x"},
         "lab": {"type": "literal", "value": "remote-x"}},
        {"s": {"type": "uri", "value": "urn:r:y"},
         "lab": {"type": "literal", "value": "remote-y"}},
    ])),
    "/empty": (200, _payload([])),
    "/err500": (500, "internal error"),
    "/badjson": (200, "<html>not sparql json</html>"),
    # one row binds ?lab, one leaves it unbound (OPTIONAL-shaped remote)
    "/partial": (200, json.dumps({
        "head": {"vars": ["s", "lab"]},
        "results": {"bindings": [
            {"s": {"type": "uri", "value": "urn:r:x"},
             "lab": {"type": "literal", "value": "remote-x"}},
            {"s": {"type": "uri", "value": "urn:r:y"}},
        ]},
    })),
}


@pytest.fixture(scope="module")
def scripted_endpoint():
    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            code, body = _RESPONSES.get(self.path, (404, "no such script"))
            data = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type",
                             "application/sparql-results+json"
                             if code == 200 else "text/plain")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *args):
            pass

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = HTTPServer(("127.0.0.1", port), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


@pytest.fixture()
def eng(spark):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    e = Engine(spark, QuadStore(spark))
    e.update("""INSERT DATA {
        <urn:r:x> <urn:local> "here" .
        <urn:other> <urn:local> "nope" . }""")
    return e


def _rows(eng, q, spec):
    return sorted((tuple(r) for r in eng.query(q).finalize(spec).collect()),
                  key=lambda t: tuple((x is None, str(x)) for x in t))


# ------------------------------------------------- success x empty (no error)


def test_ok_joins_remote_bindings(eng, scripted_endpoint):
    got = _rows(eng, f"""
        SELECT ?s ?lab ?loc WHERE {{
          ?s <urn:local> ?loc .
          SERVICE <{scripted_endpoint}/ok> {{ ?s <urn:r:label> ?lab }}
        }}""", {"s": "str", "lab": "str", "loc": "str"})
    assert got == [("urn:r:x", "remote-x", "here")]


@pytest.mark.parametrize("silent", ["", "SILENT "])
def test_empty_result_is_empty_join_not_unit(eng, scripted_endpoint, silent):
    # empty remote result = successful evaluation with zero solutions;
    # SILENT must not resurrect the upstream rows
    got = _rows(eng, f"""
        SELECT ?s ?lab WHERE {{
          ?s <urn:local> ?loc .
          SERVICE {silent}<{scripted_endpoint}/empty>
            {{ ?s <urn:r:label> ?lab }}
        }}""", {"s": "str", "lab": "str"})
    assert got == []


# --------------------------------------------------- failure x SILENT matrix


@pytest.mark.parametrize("path", ["/err500", "/badjson"])
def test_failure_silent_is_unit(eng, scripted_endpoint, path):
    got = _rows(eng, f"""
        SELECT ?s WHERE {{
          ?s <urn:local> "here" .
          SERVICE SILENT <{scripted_endpoint}{path}>
            {{ ?s <urn:r:label> ?lab }}
        }}""", {"s": "str"})
    assert got == [("urn:r:x",)]


@pytest.mark.parametrize("path", ["/err500", "/badjson"])
def test_failure_without_silent_raises(eng, scripted_endpoint, path):
    with pytest.raises(Exception):
        eng.query(f"""
            SELECT ?s WHERE {{
              ?s <urn:local> "here" .
              SERVICE <{scripted_endpoint}{path}>
                {{ ?s <urn:r:label> ?lab }}
            }}""").finalize({"s": "str"}).collect()


def test_unreachable_silent_vs_not(eng, scripted_endpoint):
    got = _rows(eng, """
        SELECT ?s WHERE {
          ?s <urn:local> "here" .
          SERVICE SILENT <http://127.0.0.1:9/nope> { ?s ?q ?o }
        }""", {"s": "str"})
    assert got == [("urn:r:x",)]
    with pytest.raises(Exception):
        eng.query("""
            SELECT ?s WHERE {
              ?s <urn:local> "here" .
              SERVICE <http://127.0.0.1:9/nope> { ?s ?q ?o } }
        """).finalize({"s": "str"}).collect()


# ----------------------------------------------------- variable endpoints


def test_var_endpoint_bound_mixed_health_silent(eng, scripted_endpoint):
    # two endpoint values: one healthy, one erroring; SILENT keeps the
    # upstream row of the failing endpoint (unit) and joins the healthy one
    got = _rows(eng, f"""
        SELECT ?ep ?lab WHERE {{
          VALUES ?ep {{ <{scripted_endpoint}/ok> <{scripted_endpoint}/err500> }}
          SERVICE SILENT ?ep {{ ?s <urn:r:label> ?lab }}
        }}""", {"ep": "str", "lab": "str"})
    assert got == [
        (f"{scripted_endpoint}/err500", None),
        (f"{scripted_endpoint}/ok", "remote-x"),
        (f"{scripted_endpoint}/ok", "remote-y"),
    ]


def test_var_endpoint_bound_error_without_silent_raises(eng,
                                                        scripted_endpoint):
    with pytest.raises(Exception):
        eng.query(f"""
            SELECT ?lab WHERE {{
              VALUES ?ep {{ <{scripted_endpoint}/err500> }}
              SERVICE ?ep {{ ?s <urn:r:label> ?lab }}
            }}""").finalize({"lab": "str"}).collect()


def test_var_endpoint_unbound_error_vs_silent(eng, scripted_endpoint):
    with pytest.raises(Exception):
        eng.query("""
            SELECT ?s WHERE {
              ?s <urn:local> ?loc .
              SERVICE ?nowhere { ?s ?q ?o } }
        """).finalize({"s": "str"}).collect()
    got = _rows(eng, """
        SELECT ?s WHERE {
          ?s <urn:local> "here" .
          SERVICE SILENT ?nowhere { ?s ?q ?o }
        }""", {"s": "str"})
    assert got == [("urn:r:x",)]


# ------------------------------------------------ compatibility semantics


def test_partial_bindings_join_compat(eng, scripted_endpoint):
    # the remote row with UNBOUND ?lab is compatible with every upstream
    # row (shared-var compat join, like a local OPTIONAL output)
    got = _rows(eng, f"""
        SELECT ?s ?lab WHERE {{
          VALUES ?s {{ <urn:r:x> <urn:r:y> }}
          SERVICE <{scripted_endpoint}/partial> {{ ?s <urn:r:label> ?lab }}
        }}""", {"s": "str", "lab": "str"})
    assert got == [("urn:r:x", "remote-x"), ("urn:r:y", None)]
