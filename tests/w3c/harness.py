"""Runner for the hand-transcribed W3C SPARQL 1.1 conformance corpus.

The container has no network access, so the public ``w3c/rdf-tests``
suite cannot be fetched; the corpus under ``tests/w3c/cases_*.py`` is
hand-transcribed instead, from two author-independent public sources:

* normative examples in the SPARQL 1.1 Query/Update Recommendations
  (every case labeled ``spec §N.N``) — data, query, and result tables
  reproduced from the spec text;
* tests of the public rdf-tests sparql11 suite reproduced from memory
  (labeled ``rdf-tests <family>/<name>``) — semantics-defining cases
  whose shape is stable across implementations (ALP cycle handling,
  MINUS/NOT-EXISTS contrast pairs, function argument tables).

Each case is a dict:

    name       unique id within the family
    source     provenance label (see above)
    data       default-graph Turtle (optional)
    named      {graph-iri: turtle} for named graphs (optional)
    query      SPARQL text
    results    SELECT expectation: list of {var: term} rows (term in the
               mini-syntax below); exactly one of results/ask/syntax
    ask        ASK expectation: bool
    syntax     "pos" (must parse) | "neg" (must raise)
    ordered    compare rows as an ordered list (ORDER BY queries)
    lax_num    compare numeric literals by VALUE (datatype still exact) —
               for canonicalization-dependent lexical forms (AVG etc.)
    service    {path: spec} — start a loopback endpoint scripted by URL
               path for SERVICE cases; "{SVC}" in the query substitutes
               to its base URL and "{SVC_DOWN}" to an unreachable one.
               spec: list = SPARQL-JSON bindings, int = HTTP error code,
               {"code","body"} = verbatim response (r10, folds the
               federated-query protocol matrix into the corpus)
    error      True = evaluation must FAIL (raise or the A13 sentinel)

Term mini-syntax: ``<iri>``, ``_:label``, ``"lex"``, ``"lex"@lang``,
``"lex"^^xsd:type`` / ``"lex"^^<iri>``. A var absent from a row dict is
expected UNBOUND. Blank-node labels match under bijection (backtracking
multiset matcher, like the official DAWG harness).
"""

from __future__ import annotations

import json
import re

XSD = "http://www.w3.org/2001/XMLSchema#"

_TERM_RE = re.compile(
    r'^(?:<(?P<iri>[^>]*)>'
    r'|_:(?P<bn>\S+)'
    r'|"(?P<lex>(?:[^"\\]|\\.)*)"'
    r'(?:@(?P<lang>[A-Za-z0-9-]+)|\^\^(?:<(?P<dt>[^>]*)>|xsd:(?P<xdt>\w+)))?'
    r')$')

_ESCAPES = {'\\n': '\n', '\\t': '\t', '\\r': '\r', '\\"': '"', '\\\\': '\\'}


def _unescape(s: str) -> str:
    return re.sub(r'\\[ntr"\\]', lambda m: _ESCAPES[m.group(0)], s)


def parse_term(s: str):
    """Mini-syntax term → ('uri', v) | ('bnode', label) |
    ('lit', lex, dt, lang)."""
    m = _TERM_RE.match(s.strip())
    if not m:
        raise ValueError(f"bad expected term: {s!r}")
    if m.group("iri") is not None:
        return ("uri", m.group("iri"))
    if m.group("bn") is not None:
        return ("bnode", m.group("bn"))
    lex = _unescape(m.group("lex"))
    lang = m.group("lang")
    dt = m.group("dt") or (XSD + m.group("xdt") if m.group("xdt") else None)
    if lang:
        return ("lit", lex, "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
                lang.lower())
    return ("lit", lex, dt or XSD + "string", None)


def json_binding_term(b: dict):
    """SPARQL-Results-JSON cell → same tuple shape as parse_term."""
    t = b["type"]
    if t == "uri":
        return ("uri", b["value"])
    if t == "bnode":
        return ("bnode", b["value"])
    lang = b.get("xml:lang")
    if lang:
        return ("lit", b["value"],
                "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString",
                lang.lower())
    return ("lit", b["value"], b.get("datatype") or XSD + "string", None)


_NUM_DTS = {XSD + t for t in (
    "integer", "decimal", "double", "float", "long", "int", "short", "byte",
    "nonNegativeInteger", "nonPositiveInteger", "negativeInteger",
    "positiveInteger", "unsignedLong", "unsignedInt", "unsignedShort",
    "unsignedByte")}


def _num_value(term):
    if term[0] != "lit" or term[2] not in _NUM_DTS:
        return None
    lex = term[1]
    try:
        return float({"INF": "inf", "-INF": "-inf", "NaN": "nan"}.get(lex, lex))
    except ValueError:
        return None


def terms_equal(exp, got, bmap, rmap, lax_num=False):
    """Compare one expected term against one result term under the current
    bnode bijection (extending it on success — caller must copy maps when
    backtracking)."""
    if (exp is None) != (got is None):
        return False
    if exp is None:
        return True
    if exp[0] == "bnode" or got[0] == "bnode":
        if exp[0] != "bnode" or got[0] != "bnode":
            return False
        el, gl = exp[1], got[1]
        if el in bmap:
            return bmap[el] == gl
        if gl in rmap:
            return False
        bmap[el] = gl
        rmap[gl] = el
        return True
    if lax_num:
        ev, gv = _num_value(exp), _num_value(got)
        if ev is not None and gv is not None:
            # datatype must agree up to the numeric family; value exactly
            return ev == gv or (ev != ev and gv != gv)
    return exp == got


def rows_match(exp_rows, got_rows, ordered=False, lax_num=False):
    """Multiset equality of solution sequences under bnode bijection."""
    if len(exp_rows) != len(got_rows):
        return False
    vars_all = set()
    for r in exp_rows:
        vars_all.update(r)
    for r in got_rows:
        vars_all.update(r)
    order = sorted(vars_all)

    def row_eq(er, gr, bmap, rmap):
        for v in order:
            if not terms_equal(er.get(v), gr.get(v), bmap, rmap, lax_num):
                return False
        return True

    if ordered:
        bmap, rmap = {}, {}
        return all(row_eq(e, g, bmap, rmap)
                   for e, g in zip(exp_rows, got_rows))

    used = [False] * len(got_rows)

    def back(i, bmap, rmap):
        if i == len(exp_rows):
            return True
        for j, g in enumerate(got_rows):
            if used[j]:
                continue
            b2, r2 = dict(bmap), dict(rmap)
            if row_eq(exp_rows[i], g, b2, r2):
                used[j] = True
                if back(i + 1, b2, r2):
                    return True
                used[j] = False
        return False

    return back(0, {}, {})


def load_engine(spark, case, tmp_path):
    """Engine over the case's data (default graph + named graphs)."""
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.sources.rdf import read_turtle
    from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH, QuadStore
    from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA

    frames = []
    graphs = [(DEFAULT_GRAPH, case.get("data"))] + \
        [(g, t) for g, t in sorted(case.get("named", {}).items())]
    for i, (g, text) in enumerate(graphs):
        if not text:
            continue
        f = tmp_path / f"g{i}.ttl"
        f.write_text(text)
        frames.append(read_turtle(spark, str(f), g))
    if frames:
        df = frames[0]
        for x in frames[1:]:
            df = df.unionByName(x)
    else:
        df = spark.createDataFrame([], QUAD_SCHEMA)
    # "inference": True runs the case under the OWL-Horst closure (the
    # entailment family, r11 — the regime the reference repo configures:
    # owl-horst-optimized, repo-config.ttl:33)
    return Engine(spark, QuadStore(spark, df),
                  use_inference=bool(case.get("inference")))


def _start_scripted(responses: dict):
    """Loopback endpoint scripted by URL path (same device as the SERVICE
    protocol matrix, test_service_protocol.py): a value that is a LIST is
    served as SPARQL-Results-JSON bindings; an int is an HTTP error code;
    a dict {"code", "body"} is served verbatim."""
    import socket
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    def _payload(rows):
        vs = sorted({v for row in rows for v in row})
        return json.dumps({"head": {"vars": vs},
                           "results": {"bindings": rows}})

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            self.rfile.read(int(self.headers.get("Content-Length", 0)))
            spec = responses.get(self.path)
            if isinstance(spec, list):
                code, body, ctype = (200, _payload(spec),
                                     "application/sparql-results+json")
            elif isinstance(spec, int):
                code, body, ctype = spec, "scripted error", "text/plain"
            elif isinstance(spec, dict):
                code, body = spec["code"], spec["body"]
                ctype = spec.get("ctype", "text/plain")
            else:
                code, body, ctype = 404, "no such script", "text/plain"
            data = body.encode("utf-8")
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *args):
            pass

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    srv = HTTPServer(("127.0.0.1", port), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{port}"


def run_case(spark, case, tmp_path):
    """Execute one case → (ok: bool, detail: str)."""
    query = case["query"]
    server = None
    if "service" in case or "{SVC" in query:
        server, base = _start_scripted(case.get("service", {}))
        query = (query.replace("{SVC}", base)
                 .replace("{SVC_DOWN}", "http://127.0.0.1:9/nope"))
    try:
        return _run_case_inner(spark, dict(case, query=query), tmp_path)
    finally:
        if server is not None:
            server.shutdown()
            server.server_close()


def _run_case_inner(spark, case, tmp_path):
    if "syntax" in case:
        from graphdb_free_mocha_sa_spark.sparql.parser import (
            SparqlSyntaxError, parse_query)
        try:
            parse_query(case["query"])
            parsed = True
            err = None
        except SparqlSyntaxError as e:
            parsed = False
            err = str(e)
        except Exception as e:          # any other raise = engine bug
            return False, f"parser crashed: {e!r}"
        if parsed and case["syntax"] == "neg":
            # some static errors (e.g. BIND on an in-scope var) are
            # rejected at translation in this engine — run the query
            # against an empty store and accept a SparqlSyntaxError there
            eng = load_engine(spark, {"data": None}, tmp_path)
            try:
                eng._query_uncached(case["query"])
            except SparqlSyntaxError:
                parsed = False
            except Exception:
                pass
        if case["syntax"] == "pos":
            return parsed, (err or "")
        return (not parsed), ("parsed but must not" if parsed else "")

    eng = load_engine(spark, case, tmp_path)
    for upd in case.get("update", []):
        eng.update(upd)
    if "csv" in case or "tsv" in case:
        import io
        fmt = "csv" if "csv" in case else "tsv"
        buf = io.StringIO()
        eng.query_to(case["query"], buf.write, fmt=fmt)
        got = buf.getvalue()
        exp = case[fmt]
        return got == exp, (f"expected {exp!r} got {got!r}"
                            if got != exp else "")
    if case.get("error"):
        # expected query-evaluation error (e.g. non-SILENT SERVICE
        # failure): accept a raised exception OR the A13 error sentinel
        try:
            out = json.loads(eng.query_json(case["query"]))
        except Exception:  # noqa: BLE001
            return True, ""
        is_err = out.get("head", {}).get("vars") == ["xxx"]
        return is_err, ("" if is_err
                        else f"expected error, got {out!r}")
    out = json.loads(eng.query_json(case["query"]))
    if out.get("head", {}).get("vars") == ["xxx"]:
        return False, "error sentinel"
    if "ask" in case:
        got = out.get("boolean")
        return got == case["ask"], f"ask={got}"
    if "graph" in case:
        got_rows = [
            {v: json_binding_term(b) for v, b in row.items()}
            for row in out["results"]["bindings"]]
        exp_rows = [{"s": parse_term(s), "p": parse_term(p),
                     "o": parse_term(o)} for s, p, o in case["graph"]]
        ok = rows_match(exp_rows, got_rows)
        return ok, "" if ok else (
            f"expected graph {case['graph']!r} got "
            f"{out['results']['bindings']!r}")
    got_rows = [
        {v: json_binding_term(b) for v, b in row.items()}
        for row in out["results"]["bindings"]]
    exp_rows = [{v: parse_term(t) for v, t in row.items()}
                for row in case["results"]]
    ok = rows_match(exp_rows, got_rows,
                    ordered=case.get("ordered", False),
                    lax_num=case.get("lax_num", False))
    if ok:
        return True, ""
    return False, f"expected {case['results']!r} got {out['results']['bindings']!r}"


def all_families():
    """Import every cases_* module under tests/w3c → {family: cases}."""
    import importlib
    import pkgutil
    import tests.w3c as pkg
    fams = {}
    for m in pkgutil.iter_modules(pkg.__path__):
        if m.name.startswith("cases_"):
            mod = importlib.import_module(f"tests.w3c.{m.name}")
            fams[m.name[len("cases_"):]] = mod.CASES
    return fams
