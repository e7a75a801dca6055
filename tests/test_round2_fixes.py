"""Round-2 regression tests for the round-1 ADVICE findings.

Each test pins one verified bug: bnode-subject N-Triples lines silently
dropped, language-tagged literal constants matching across tags, deletes
leaving stale inferred triples, GRAPH ?g losing the equality constraint when
?g also appears in the triple pattern, and transitive edges derived mid-
fixpoint never chaining (rdfp4 completeness).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdb_free_mocha_sa_spark.model import OWL, QUAD_SCHEMA, RDF_TYPE, RDFS


@pytest.fixture()
def fresh_eng(spark):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    return Engine(spark, QuadStore(spark))


def _rows(eng, q, spec):
    return sorted((tuple(r) for r in eng.query(q).finalize(spec).collect()),
                  key=lambda t: tuple((x is None, str(x)) for x in t))


# ---------------------------------------------- ADVICE high: bnode NT subjects


def test_ntriples_bnode_subject_not_dropped(spark, tmp_path):
    """regexp_extract returns '' (not NULL) on no-match, so the old coalesce
    never reached the _:bnode alternative and the row vanished."""
    from graphdb_free_mocha_sa_spark.sources.rdf import read_ntriples
    nt = tmp_path / "bn.nt"
    nt.write_text(
        '<urn:a> <urn:p> <urn:b> .\n'
        '_:x1 <urn:p> <urn:c> .\n'
        '<urn:a> <urn:q> "lit" .\n'
        '_:x1 <urn:q> "v"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        '<urn:d> <urn:p> _:x1 .\n')
    df = read_ntriples(spark, str(nt), "urn:g")
    assert df.count() == 5
    subjects = {r.s for r in df.select("s").collect()}
    assert "_:x1" in subjects


# ---------------------------------------------- ADVICE med: lang-tag matching


def test_lang_tagged_literal_constant_respects_tag(fresh_eng):
    fresh_eng.update("""INSERT DATA {
        <urn:s1> <urn:label> "chat"@en .
        <urn:s2> <urn:label> "chat"@fr .
        <urn:s3> <urn:label> "chat" . }""")
    got = _rows(fresh_eng, 'SELECT ?s WHERE { ?s <urn:label> "chat"@fr }',
                {"s": "str"})
    assert got == [("urn:s2",)]
    # plain (untagged) literal must not match either tagged form
    got = _rows(fresh_eng, 'SELECT ?s WHERE { ?s <urn:label> "chat" }',
                {"s": "str"})
    assert got == [("urn:s3",)]


# ------------------------------------- ADVICE med: delete retracts inference


def test_delete_retracts_inferred_triples(spark):
    from graphdb_free_mocha_sa_spark.store import QuadStore
    SC = RDFS + "subClassOf"
    rows = [("urn:g", "urn:Dog", SC, "urn:Animal", None, None, None, None),
            ("urn:g", "urn:rex", RDF_TYPE, "urn:Dog", None, None, None, None)]
    store = QuadStore(spark, spark.createDataFrame(rows, QUAD_SCHEMA))
    store.materialize_inference()
    inf = store.df_with_inference().filter(
        (F.col("s") == "urn:rex") & (F.col("o_lex") == "urn:Animal"))
    assert inf.count() == 1
    # delete the premise: rex is no longer a Dog, so rex:Animal must go too
    victim = spark.createDataFrame(
        [("urn:g", "urn:rex", RDF_TYPE, "urn:Dog", None, None, None, None)],
        QUAD_SCHEMA)
    store.delete_quads(victim)
    inf = store.df_with_inference().filter(
        (F.col("s") == "urn:rex") & (F.col("o_lex") == "urn:Animal"))
    assert inf.count() == 0


def test_clear_graph_retracts_inferred_triples(spark):
    from graphdb_free_mocha_sa_spark.store import QuadStore
    SC = RDFS + "subClassOf"
    rows = [("urn:tbox", "urn:Dog", SC, "urn:Animal", None, None, None, None),
            ("urn:abox", "urn:rex", RDF_TYPE, "urn:Dog", None, None, None, None)]
    store = QuadStore(spark, spark.createDataFrame(rows, QUAD_SCHEMA))
    store.materialize_inference()
    store.clear_graph("urn:abox")
    derived = store.df_with_inference().filter(
        (F.col("s") == "urn:rex") & (F.col("o_lex") == "urn:Animal"))
    assert derived.count() == 0


# ------------------------------- ADVICE low: GRAPH ?g repeated in the pattern


def test_graph_var_repeated_in_triple_constrains(fresh_eng):
    fresh_eng.update("""INSERT DATA {
        GRAPH <urn:g1> { <urn:g1> <urn:p> "self" .
                         <urn:other> <urn:p> "stray" . }
        GRAPH <urn:g2> { <urn:g1> <urn:p> "cross" . } }""")
    # graph name must EQUAL the subject: only the (g1, g1) row qualifies
    got = _rows(fresh_eng,
                "SELECT ?o WHERE { GRAPH ?g { ?g <urn:p> ?o } }",
                {"o": "str"})
    assert got == [("self",)]


# ------------------------------------------------- config bootstrap (A18)


def test_engine_from_repo_config(spark, tmp_path):
    """A GraphDB-style repository template (nested bnode Turtle) drives the
    engine switches: ruleset → inference, disable-sameAs → expansion."""
    from graphdb_free_mocha_sa_spark.config import (engine_from_config,
                                                    parse_repo_config)
    cfg = tmp_path / "repo.ttl"
    cfg.write_text("""
@prefix rep: <http://www.openrdf.org/config/repository#> .
@prefix sr: <http://www.openrdf.org/config/repository/sail#> .
@prefix sail: <http://www.openrdf.org/config/sail#> .
@prefix owlim: <http://www.ontotext.com/trree/owlim#> .

[] a rep:Repository ;
   rep:repositoryID "test-repo" ;
   rep:repositoryImpl [
       rep:repositoryType "graphdb:FreeSailRepository" ;
       sr:sailImpl [
           sail:sailType "graphdb:FreeSail" ;
           owlim:ruleset "owl-horst-optimized" ;
           owlim:entity-id-size "32" ;
           owlim:disable-sameAs "false" ;
           owlim:enable-literal-index "true" ;
       ]
   ] .
""")
    params = parse_repo_config(str(cfg))
    assert params["repositoryID"] == "test-repo"
    assert params["ruleset"] == "owl-horst-optimized"

    eng = engine_from_config(spark, str(cfg))
    assert eng.use_inference and eng.use_sameas and eng.encoded
    eng.update("""INSERT DATA {
        <urn:Dog> <http://www.w3.org/2000/01/rdf-schema#subClassOf> <urn:Animal> .
        <urn:rex> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <urn:Dog> . }""")
    got = _rows(eng, """
        SELECT ?t WHERE { <urn:rex>
          <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> ?t }""",
                {"t": "str"})
    assert got == [("urn:Animal",), ("urn:Dog",)]


def test_adapter_params_ingestion():
    """B53: parameter-model env ingestion with the reference's
    empty-model-on-failure fallback."""
    from graphdb_free_mocha_sa_spark.config import adapter_params
    env = {"HOBBIT_SESSION_ID": "sess42",
           "SYSTEM_PARAMETERS_MODEL":
               '@prefix bp: <http://example.org/bench#> .\n'
               '<urn:sys> bp:queryMixes "25" ; bp:seed "7" .\n'}
    got = adapter_params(env)
    assert got["session_id"] == "sess42"
    assert got["parameters"] == {"queryMixes": "25", "seed": "7"}
    assert got["queues"]["task"].endswith(".sess42")
    # malformed model → empty parameters, no exception
    bad = adapter_params({"SYSTEM_PARAMETERS_MODEL": "<<<not turtle"})
    assert bad["parameters"] == {}


# -------------------------------------------------- SERVICE federation (B20)


@pytest.fixture()
def remote_endpoint(spark):
    """A live HTTP SPARQL endpoint (our own server) with its own store."""
    import socket
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.server import handle_request
    from graphdb_free_mocha_sa_spark.store import QuadStore

    remote = Engine(spark, QuadStore(spark))
    remote.update("""INSERT DATA {
        <urn:r:x> <urn:r:label> "remote-x" .
        <urn:r:y> <urn:r:label> "remote-y" . }""")

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode("utf-8")
            code, payload = handle_request(
                remote, body, self.headers.get("Content-Type", ""))
            data = payload.encode("utf-8")
            self.send_response(code)
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
    yield f"http://127.0.0.1:{port}/sparql"
    srv.shutdown()


def test_service_federation_joins_remote_bindings(fresh_eng, remote_endpoint):
    fresh_eng.update("""INSERT DATA {
        <urn:r:x> <urn:local> "here" . <urn:other> <urn:local> "nope" . }""")
    got = _rows(fresh_eng, f"""
        SELECT ?s ?lab ?loc WHERE {{
          ?s <urn:local> ?loc .
          SERVICE <{remote_endpoint}> {{ ?s <urn:r:label> ?lab }}
        }}""", {"s": "str", "lab": "str", "loc": "str"})
    assert got == [("urn:r:x", "remote-x", "here")]


def test_service_silent_failure_is_unit(fresh_eng):
    fresh_eng.update('INSERT DATA { <urn:a> <urn:p> 1 }')
    got = _rows(fresh_eng, """
        SELECT ?s WHERE {
          ?s <urn:p> 1 .
          SERVICE SILENT <http://127.0.0.1:9/unreachable> { ?s ?q ?o }
        }""", {"s": "str"})
    assert got == [("urn:a",)]


def test_service_non_silent_failure_raises(fresh_eng):
    import pytest as _pytest
    with _pytest.raises(Exception):
        fresh_eng.query("""
            SELECT ?s WHERE {
              SERVICE <http://127.0.0.1:9/unreachable> { ?s ?p ?o } }
        """).finalize({"s": "str"}).collect()


def test_service_variable_endpoint_values_bound(fresh_eng, remote_endpoint):
    """Round-4: SERVICE ?ep with the endpoint bound upstream (VALUES) —
    executes the group against that endpoint and joins (reference accepts
    arbitrary SPARQL incl. variable endpoints via jena-arq,
    GraphDBSystemAdapter.java:246)."""
    got = _rows(fresh_eng, f"""
        SELECT ?s ?lab WHERE {{
          VALUES ?ep {{ <{remote_endpoint}> }}
          SERVICE ?ep {{ ?s <urn:r:label> ?lab }}
        }}""", {"s": "str", "lab": "str"})
    assert got == [("urn:r:x", "remote-x"), ("urn:r:y", "remote-y")]


def test_service_variable_endpoint_silent_mixed(fresh_eng, remote_endpoint):
    """Two upstream endpoint values, one unreachable, SILENT: the reachable
    one joins its bindings; the unreachable one degrades to the unit
    solution (its upstream row survives with the service vars unbound)."""
    got = _rows(fresh_eng, f"""
        SELECT ?ep ?s ?lab WHERE {{
          VALUES ?ep {{ <{remote_endpoint}> <http://127.0.0.1:9/unreachable> }}
          SERVICE SILENT ?ep {{ ?s <urn:r:label> ?lab }}
        }}""", {"ep": "str", "s": "str", "lab": "str"})
    assert ("http://127.0.0.1:9/unreachable", None, None) in got
    assert (remote_endpoint, "urn:r:x", "remote-x") in got
    assert (remote_endpoint, "urn:r:y", "remote-y") in got
    assert len(got) == 3


def test_service_variable_endpoint_unbound_raises(fresh_eng):
    import pytest as _pytest
    fresh_eng.update('INSERT DATA { <urn:a> <urn:p> 1 }')
    with _pytest.raises(Exception):
        fresh_eng.query("""
            SELECT ?s WHERE { ?s <urn:p> 1 . SERVICE ?ep { ?s ?q ?o } }
        """).finalize({"s": "str"}).collect()


# ----------------------------------- adapter plumbing: A14 framing, A15 meter


def test_result_framing_round_trip():
    from graphdb_free_mocha_sa_spark.sparql.results import (frame_result,
                                                            unframe_results)
    buf = frame_result('{"a":1}') + frame_result("x" * 1000) + frame_result(b"")
    assert unframe_results(buf) == [b'{"a":1}', b"x" * 1000, b""]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        unframe_results(buf[:-3])


def test_progress_metering_counts_tasks(fresh_eng):
    fresh_eng.update('INSERT DATA { <urn:a> <urn:p> 1 }')
    fresh_eng.query_json("SELECT ?s WHERE { ?s <urn:p> 1 }")
    fresh_eng.query_json("broken {{{ not sparql")
    p = fresh_eng.progress()
    assert p["updates_received"] == p["updates_completed"] == 1
    assert p["tasks_received"] == 2
    assert p["tasks_completed"] == 1 and p["tasks_failed"] == 1


def test_query_framed_wraps_json(fresh_eng):
    from graphdb_free_mocha_sa_spark.sparql.results import unframe_results
    fresh_eng.update('INSERT DATA { <urn:a> <urn:p> 1 }')
    framed = fresh_eng.query_framed("SELECT ?s WHERE { ?s <urn:p> 1 }")
    (payload,) = unframe_results(framed)
    assert b'"urn:a"' in payload


def test_ingest_deadline_terminates(spark, tmp_path):
    """A deadline must stop the drain gracefully instead of hanging (A16);
    with a generous deadline everything still loads."""
    from graphdb_free_mocha_sa_spark.store import QuadStore
    from graphdb_free_mocha_sa_spark.streaming.ingest import (
        stream_inserts_from_files)
    updates = tmp_path / "ups"
    updates.mkdir()
    for i in range(3):
        (updates / f"u{i}.ru").write_text(
            f'INSERT DATA {{ <urn:d{i}> <urn:v> {i} }}')
    store = QuadStore(spark)
    stream_inserts_from_files(spark, store, str(updates),
                              deadline_seconds=120.0)
    assert store.df.count() == 3


# ------------------------------------------------------- full Turtle parser


def test_full_turtle_reader(spark, tmp_path):
    """Multi-line statements, nested bnode property lists, collections,
    long strings, numeric/boolean shorthand, @base-relative IRIs."""
    from graphdb_free_mocha_sa_spark.model import RDF
    from graphdb_free_mocha_sa_spark.sources.rdf import read_turtle
    p = tmp_path / "full.ttl"
    p.write_text("""
@base <urn:base:> .
@prefix ex: <urn:ex:> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .

ex:alice a ex:Person ;
    ex:name "Alice" ;
    ex:age 34 ;
    ex:score 1.5 ;
    ex:active true ;
    ex:bio \"\"\"line one
line "quoted" two\"\"\" ;
    ex:knows [ ex:name "Bob" ;
               ex:address [ ex:city "Berlin" ] ] ;
    ex:langs ( "en" "fr" ) ;
    ex:site <relative/path> .
""")
    df = read_turtle(spark, str(p), "urn:g")
    rows = {(r.s, r.p, r.o_lex) for r in df.collect()}
    by_sp = {(s, pred): o for s, pred, o in rows}

    assert by_sp[("urn:ex:alice", RDF + "type")] == "urn:ex:Person"
    assert by_sp[("urn:ex:alice", "urn:ex:name")] == "Alice"
    assert df.filter((F.col("p") == "urn:ex:age")
                     & (F.col("o_num") == 34.0)).count() == 1
    assert df.filter((F.col("p") == "urn:ex:score")
                     & (F.col("o_num") == 1.5)).count() == 1
    assert by_sp[("urn:ex:alice", "urn:ex:active")] == "true"
    assert by_sp[("urn:ex:alice", "urn:ex:bio")] == 'line one\nline "quoted" two'
    # @base resolution of a relative IRI object
    assert by_sp[("urn:ex:alice", "urn:ex:site")] == "urn:base:relative/path"

    # nested bnode property lists: alice -> ?b1 (name Bob) -> ?b2 (city)
    b1 = by_sp[("urn:ex:alice", "urn:ex:knows")]
    assert b1.startswith("_:") and by_sp[(b1, "urn:ex:name")] == "Bob"
    b2 = by_sp[(b1, "urn:ex:address")]
    assert b2.startswith("_:") and by_sp[(b2, "urn:ex:city")] == "Berlin"

    # collection ( "en" "fr" ) → rdf:first/rest chain ending in rdf:nil
    head = by_sp[("urn:ex:alice", "urn:ex:langs")]
    assert by_sp[(head, RDF + "first")] == "en"
    nxt = by_sp[(head, RDF + "rest")]
    assert by_sp[(nxt, RDF + "first")] == "fr"
    assert by_sp[(nxt, RDF + "rest")] == RDF + "nil"


def test_turtle_round_trip_through_store(spark, tmp_path):
    """Load a nested Turtle file through the LOAD update path and query it."""
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    p = tmp_path / "rt.ttl"
    p.write_text(
        "@prefix ex: <urn:ex:> .\n"
        "ex:doc ex:authors ( ex:a ex:b ) ;\n"
        "       ex:meta [ ex:year 2024 ] .\n")
    eng = Engine(spark, QuadStore(spark))
    eng.update(f"LOAD <file://{p}> INTO GRAPH <urn:t>")
    got = sorted(tuple(r) for r in eng.query("""
        SELECT ?y WHERE { GRAPH <urn:t> {
            ?d <urn:ex:meta> ?m . ?m <urn:ex:year> ?y } }
    """).finalize({"y": "int"}).collect())
    assert got == [(2024,)]
    first = eng.query("""
        SELECT ?a WHERE { GRAPH <urn:t> {
          ?d <urn:ex:authors> ?l .
          ?l <http://www.w3.org/1999/02/22-rdf-syntax-ns#first> ?a } }
    """).finalize({"a": "str"}).collect()
    assert [r[0] for r in first] == ["urn:ex:a"]


# ------------------------------------ spec-exact MINUS (SPARQL 1.1 §8.3)


def test_minus_both_unbound_shared_var_is_domain_disjoint(fresh_eng):
    """A var unbound in BOTH solutions is in neither domain, so the domains
    are disjoint and MINUS must remove NOTHING (the old eqNullSafe treated
    NULL=NULL as a match and wrongly removed the row)."""
    fresh_eng.update("""INSERT DATA {
        <urn:s1> <urn:p> 1 . <urn:s2> <urn:p> 2 .
        <urn:s2> <urn:q> 7 . }""")
    got = _rows(fresh_eng, """
        SELECT ?s WHERE {
          ?s <urn:p> ?v OPTIONAL { ?s <urn:q> ?x }
          MINUS { VALUES ?x { UNDEF } }
        }""", {"s": "str"})
    assert got == [("urn:s1",), ("urn:s2",)]


def test_minus_removes_when_any_shared_var_overlaps(fresh_eng):
    """Compatibility ignores vars unbound on a side: (x=1, y unbound) IS
    compatible with (x=1, y=2) and overlaps on x → removed. (x=2,y=2) is
    incompatible on x → kept."""
    got = _rows(fresh_eng, """
        SELECT ?x ?y WHERE {
          VALUES (?x ?y) { (1 UNDEF) (2 2) }
          MINUS { VALUES (?x ?y) { (1 2) } }
        }""", {"x": "int", "y": "int"})
    assert got == [(2, 2)]


def test_minus_bound_vs_unbound_still_kept_when_disjoint(fresh_eng):
    """Left x unbound vs right x bound: x is in only one domain; with no
    other shared var the domains are disjoint → kept."""
    got = _rows(fresh_eng, """
        SELECT ?x WHERE {
          VALUES ?x { UNDEF 5 }
          MINUS { VALUES ?x { 5 } }
        }""", {"x": "int"})
    assert got == [(None,)]


# ------------------------------------------- sameAs expansion on query read


def test_sameas_expansion_in_query_answering(fresh_eng):
    """owl:sameAs merges identities transparently for queries (reference:
    repo-config.ttl:45 sameAs enabled): facts about one member are visible
    through every member, subjects and IRI objects alike."""
    fresh_eng.update("""INSERT DATA {
        <urn:alice1> <http://www.w3.org/2002/07/owl#sameAs> <urn:alice2> .
        <urn:nyc> <http://www.w3.org/2002/07/owl#sameAs> <urn:newyork> .
        <urn:alice2> <urn:livesIn> <urn:nyc> .
        <urn:alice1> <urn:age> 34 . }""")
    got = _rows(fresh_eng, """
        SELECT ?who ?city WHERE { ?who <urn:livesIn> ?city .
                                  ?who <urn:age> 34 }""",
                {"who": "str", "city": "str"})
    assert got == [("urn:alice1", "urn:newyork"), ("urn:alice1", "urn:nyc"),
                   ("urn:alice2", "urn:newyork"), ("urn:alice2", "urn:nyc")]


def test_sameas_disabled_engine_sees_raw_graph(spark):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng = Engine(spark, QuadStore(spark), use_sameas=False)
    eng.update("""INSERT DATA {
        <urn:a> <http://www.w3.org/2002/07/owl#sameAs> <urn:b> .
        <urn:b> <urn:p> 1 . }""")
    got = _rows(eng, "SELECT ?s WHERE { ?s <urn:p> 1 }", {"s": "str"})
    assert got == [("urn:b",)]


# --------------------------- ADVICE low: derived transitive edges must chain


def test_transitive_edges_derived_mid_fixpoint_chain(spark):
    """Edges of a transitive property that only APPEAR via subPropertyOf must
    still participate in the transitive closure (rdfp4 after rdfs7)."""
    from graphdb_free_mocha_sa_spark.operators.inference import owl_horst_closure
    SP = RDFS + "subPropertyOf"
    triples = [
        ("urn:part", RDF_TYPE, OWL + "TransitiveProperty"),
        ("urn:directPart", SP, "urn:part"),
        # NO base urn:part edges at all — they only arise via rdfs7
        ("urn:a", "urn:directPart", "urn:b"),
        ("urn:b", "urn:directPart", "urn:c"),
        ("urn:c", "urn:directPart", "urn:d"),
    ]
    rows = [("urn:g", s, p, o, None, None, None, None) for s, p, o in triples]
    inferred = owl_horst_closure(spark, spark.createDataFrame(rows, QUAD_SCHEMA))
    got = {(r.s, r.p, r.o_lex) for r in inferred.collect()}
    assert ("urn:a", "urn:part", "urn:b") in got       # rdfs7
    assert ("urn:a", "urn:part", "urn:c") in got       # rdfp4 over derived edges
    assert ("urn:a", "urn:part", "urn:d") in got       # depth 3


# ------------------------------------------------ r5c escape-decoding fixes

def test_sparql_string_escapes_unicode_and_backslash(spark, quads):
    """\\uXXXX/\\UXXXXXXXX decode to codepoints; escaped-backslash-then-t
    stays backslash+t (the replace-chain ordering bug)."""
    from graphdb_free_mocha_sa_spark.sparql.parser import (
        SparqlSyntaxError, parse_query)
    q = parse_query('SELECT ?s WHERE { ?s ?p "\\u0041B\\U0001F600" }')
    lit = q.pattern.triples[0].o
    assert lit.lex == "AB\U0001F600"
    q2 = parse_query('SELECT ?s WHERE { ?s ?p "a\\\\tb" }')
    assert q2.pattern.triples[0].o.lex == "a\\tb"       # backslash, then t
    import pytest as _pytest
    with _pytest.raises(SparqlSyntaxError):
        parse_query('SELECT ?s WHERE { ?s ?p "bad\\z" }')


def test_ntriples_escape_decoding(spark, tmp_path):
    from graphdb_free_mocha_sa_spark.sources.rdf import read_ntriples
    p = tmp_path / "esc.nt"
    p.write_text("\n".join([
        r'<urn:b> <urn:p> "tab\tnl\nquote\"done" .',
        r'<urn:c> <urn:p> "bs\\t stays" .',
        r'<urn:d> <urn:p> "A and \U0001F600" .',
        r'<urn:e> <urn:p> "mixed\\\\double" .',
    ]) + "\n")
    rows = {r.s: r.o_lex
            for r in read_ntriples(spark, str(p), "urn:g").collect()}
    assert rows["urn:b"] == 'tab\tnl\nquote"done'
    assert rows["urn:c"] == r"bs\t stays"
    assert rows["urn:d"] == "A and \U0001F600"
    assert rows["urn:e"] == r"mixed\\double"


def test_values_arity_and_star_groupby_are_syntax_errors():
    import pytest as _pytest
    from graphdb_free_mocha_sa_spark.sparql.parser import (
        SparqlSyntaxError, parse_query)
    with _pytest.raises(SparqlSyntaxError):
        parse_query('SELECT ?s WHERE { ?s ?p ?o } '
                    'VALUES (?s ?o) { (<urn:a>) }')
    with _pytest.raises(SparqlSyntaxError):
        parse_query('SELECT * WHERE { ?s ?p ?o } GROUP BY ?s')


def test_update_trailing_garbage_is_a_syntax_error():
    import pytest as _pytest
    from graphdb_free_mocha_sa_spark.sparql.parser import (
        SparqlSyntaxError, parse_update)
    with _pytest.raises(SparqlSyntaxError):
        parse_update('INSERT DATA { <urn:e> <urn:q> "z" } TRAILING JUNK')
    # chained ops still fine
    assert len(parse_update(
        'INSERT DATA { <urn:a> <urn:q> "x" } ; '
        'DELETE DATA { <urn:a> <urn:q> "x" }')) == 2


def test_division_semantics(spark, quads):
    """r5c: division by zero is a type error (unbound) for integers but
    IEEE Inf/NaN for doubles; integer division serializes its true
    decimal value (5/2 used to serialize as "2")."""
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng = Engine(spark, QuadStore(spark, quads))
    out = eng.query_json(
        'SELECT ?x ?y WHERE { <urn:x:nation/1> <urn:x:p/n_regionkey> ?r '
        'BIND(5 / 2 AS ?x) BIND(5 / 0 AS ?y) }')
    assert '"value": "2.5"' in out
    assert '"y": {' not in out                   # unbound, row kept
    inf = eng.query_json(
        'SELECT ?s WHERE { ?s <urn:x:p/n_name> ?n '
        'FILTER(2e0 / 0 > 1) } LIMIT 1')         # 2e0 = xsd:double
    assert '"type": "uri"' in inf                # IEEE +Inf passes filter
    dec = eng.query_json(
        'SELECT ?s WHERE { ?s <urn:x:p/n_name> ?n '
        'FILTER(2.0 / 0 > 1) } LIMIT 1')         # 2.0 = xsd:decimal
    assert '"bindings":[]' in dec                # decimal/0 = type error


def test_round_ties_toward_positive_infinity(spark, quads):
    """fn:numeric-round: ROUND(-2.5) = -2, not HALF_UP's -3 (r5c fix)."""
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng = Engine(spark, QuadStore(spark, quads))
    out = eng.query_json(
        'SELECT ?a ?b ?c ?d WHERE { <urn:x:nation/1> ?p ?o '
        'BIND(ROUND(2.5) AS ?a) BIND(ROUND(-2.5) AS ?b) '
        'BIND(ROUND(-3.5) AS ?c) BIND(ROUND(2.4) AS ?d) } LIMIT 1')
    import json
    b = json.loads(out)["results"]["bindings"][0]
    assert float(b["a"]["value"]) == 3.0
    assert float(b["b"]["value"]) == -2.0
    assert float(b["c"]["value"]) == -3.0
    assert float(b["d"]["value"]) == 2.0


def test_string_functions_lang_and_xpath_semantics(spark, quads):
    """r5c: UCASE/LCASE/SUBSTR/REPLACE/STRBEFORE/STRAFTER keep the first
    argument's language tag; CONCAT keeps a tag all args share; SUBSTR
    uses fn:substring index math (start<1 consumes length, no
    count-from-end); REPLACE accepts a flags argument."""
    import json
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng = Engine(spark, QuadStore(spark, quads))
    out = json.loads(eng.query_json(
        'SELECT ?a ?b ?c ?d ?e ?f ?g WHERE { <urn:x:nation/1> ?p ?o '
        'BIND(SUBSTR("12345", 0, 3) AS ?a) '
        'BIND(SUBSTR("12345", -1, 3) AS ?b) '
        'BIND(UCASE("chat"@en) AS ?c) '
        'BIND(CONCAT("x"@en, "y"@en) AS ?d) '
        'BIND(CONCAT("x"@en, "y"@fr) AS ?e) '
        'BIND(STRBEFORE("ab"@en, "b") AS ?f) '
        'BIND(REPLACE("aBcB", "b", "X", "i") AS ?g) } LIMIT 1'))
    b = out["results"]["bindings"][0]
    assert b["a"]["value"] == "12"
    assert b["b"]["value"] == "1"
    assert (b["c"]["value"], b["c"].get("xml:lang")) == ("CHAT", "en")
    assert (b["d"]["value"], b["d"].get("xml:lang")) == ("xy", "en")
    assert (b["e"]["value"], b["e"].get("xml:lang")) == ("xy", None)
    assert (b["f"]["value"], b["f"].get("xml:lang")) == ("a", "en")
    assert b["g"]["value"] == "aXcX"


def test_unary_minus_preserves_integer_datatype(spark, quads):
    import json
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng = Engine(spark, QuadStore(spark, quads))
    out = json.loads(eng.query_json(
        'SELECT ?a ?b WHERE { <urn:x:nation/1> ?p ?o '
        'BIND(-(2) AS ?a) BIND(-(2e0) AS ?b) } LIMIT 1'))
    b = out["results"]["bindings"][0]
    assert b["a"]["value"] == "-2"
    assert b["a"]["datatype"].endswith("integer")
    assert b["b"]["datatype"].endswith("double")


def test_min_max_preserve_original_term(spark, quads):
    """r5c: MIN/MAX return the original TERM (min(num) re-serialized
    integers as doubles and dropped datatypes/lang tags)."""
    import json
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng = Engine(spark, QuadStore(spark, quads))
    out = json.loads(eng.query_json(
        'SELECT (MIN(?k) AS ?lo) (MAX(?k) AS ?hi) WHERE '
        '{ ?s <urn:x:p/n_regionkey> ?k }'))
    b = out["results"]["bindings"][0]
    assert b["lo"]["type"] == "uri"              # region IRIs, not numbers
    assert b["lo"]["value"].startswith("urn:x:region/")


def test_r6_advice_regressions(spark, quads):
    """r6 ADVICE sweep: SUBSTR rounds with fn:round tie semantics
    (floor(x+0.5), not HALF_UP); REPLACE/REGEX tolerate an empty flags
    argument and implement the XPath 'q' (quote) flag; IEEE division
    serializes the xsd:double canonical specials INF/-INF/NaN."""
    import json
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng = Engine(spark, QuadStore(spark, quads))
    out = json.loads(eng.query_json(
        'SELECT ?a ?b ?c ?d ?e ?f ?g ?h WHERE { <urn:x:nation/1> ?p ?o '
        'BIND(SUBSTR("12345", -0.5, 3) AS ?a) '
        'BIND(REPLACE("a.c", ".", "X", "") AS ?b) '
        'BIND(REPLACE("a.c", ".", "X", "q") AS ?c) '
        'BIND(REPLACE("A.c", "a.", "X", "qi") AS ?d) '
        'BIND(REGEX("abc", "a.c", "q") AS ?e) '
        'BIND(1e0 / 0 AS ?f) BIND(-1e0 / 0 AS ?g) '
        'BIND(0e0 / 0 AS ?h) } LIMIT 1'))
    b = out["results"]["bindings"][0]
    # fn:round(-0.5) = 0 (ties toward +inf) -> positions 0..2 -> "12"
    assert b["a"]["value"] == "12"
    # empty flags: '.' stays a metacharacter, no '(?)' compile error
    assert b["b"]["value"] == "XXX"
    # 'q': '.' is literal
    assert b["c"]["value"] == "aXc"
    # 'q' composes with 'i': literal "a." matched case-insensitively
    assert b["d"]["value"] == "Xc"
    assert b["e"]["value"] == "false"
    assert (b["f"]["value"], b["f"]["datatype"].rsplit("#")[-1]) \
        == ("INF", "double")
    assert b["g"]["value"] == "-INF"
    assert b["h"]["value"] == "NaN"


def test_r6_pack_token_budget_rejects_non_numeric_order_col(spark):
    import pytest as _pytest
    from graphdb_free_mocha_sa_spark.operators.pipeline import pack_token_budget
    df = spark.createDataFrame([("a", 5), ("b", 7)], "id string, n_tok int")
    with _pytest.raises(TypeError, match="must be numeric"):
        pack_token_budget(df, budget=8, order_col="id")


def test_r6_engine_literal_roundtrip_nasty_strings(spark):
    """r6 fuzz: INSERT DATA → SELECT round-trip over adversarial literals
    (escapes, quotes, unicode separators, regex metachars) through the
    full parser → store → JSON-writer path, plus the CSV and TSV writers
    parsed back with stdlib readers."""
    import csv
    import io
    import json
    import random

    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore

    rng = random.Random(7)
    alphabet = (list('abc \\"\'\t$^[](){}|.*+?,') +
                ["é", "中", "🚀", "\u2028", "\u00a0"])
    nasty = ["".join(rng.choice(alphabet) for _ in range(rng.randint(1, 25)))
             for _ in range(60)]

    def sparql_escape(s):
        return (s.replace("\\", "\\\\").replace('"', '\\"')
                .replace("\n", "\\n").replace("\r", "\\r")
                .replace("\t", "\\t"))

    eng = Engine(spark, QuadStore(spark))
    stmts = " . ".join(f'<urn:s{i}> <urn:p> "{sparql_escape(t)}"'
                       for i, t in enumerate(nasty))
    eng.update("INSERT DATA { " + stmts + " }")

    out = json.loads(eng.query_json(
        "SELECT ?s ?o WHERE { ?s <urn:p> ?o }"))
    got = {b["s"]["value"]: b["o"]["value"]
           for b in out["results"]["bindings"]}
    want = {f"urn:s{i}": t for i, t in enumerate(nasty)}
    assert got == want

    # CSV writer round-trip via the stdlib RFC-4180 reader
    chunks = []
    eng.query_to("SELECT ?s ?o WHERE { ?s <urn:p> ?o }", chunks.append,
                 fmt="csv")
    rows = list(csv.reader(io.StringIO("".join(chunks))))
    assert rows[0] == ["s", "o"]
    assert {r[0]: r[1] for r in rows[1:]} == want

    # TSV writer: terms decode with the same unescape rules as N-Triples
    chunks = []
    eng.query_to("SELECT ?o WHERE { ?s <urn:p> ?o }", chunks.append,
                 fmt="tsv")
    lines = "".join(chunks).split("\n")[1:]
    def tsv_decode(cell):
        assert cell.startswith('"') and cell.endswith('"'), cell
        body = cell[1:-1]
        outs, i = [], 0
        while i < len(body):
            if body[i] == "\\":
                if body[i + 1] == "u":          # \uXXXX codepoint escape
                    outs.append(chr(int(body[i + 2:i + 6], 16)))
                    i += 6
                else:
                    outs.append({"n": "\n", "r": "\r", "t": "\t",
                                 '"': '"', "\\": "\\"}[body[i + 1]])
                    i += 2
            else:
                outs.append(body[i])
                i += 1
        return "".join(outs)
    got_tsv = sorted(tsv_decode(l) for l in lines if l)
    assert got_tsv == sorted(nasty)


def test_r6_never_bound_var_is_row_error_not_translation_failure(fresh_eng):
    """SPARQL §17: evaluating an unbound variable is a ROW-level error —
    COALESCE recovers, BOUND answers false, and a query projecting one
    must not die to the sentinel (r6 probe fix)."""
    import json
    fresh_eng.update('INSERT DATA { <urn:a> <urn:v> 1 }')
    out = json.loads(fresh_eng.query_json(
        'SELECT (COALESCE(IF(1>2, "a", ?und), "d") AS ?c) '
        'WHERE { <urn:a> <urn:v> 1 }'))
    assert out["results"]["bindings"][0]["c"]["value"] == "d"
    out = json.loads(fresh_eng.query_json(
        'SELECT (BOUND(?und) AS ?b) WHERE { <urn:a> <urn:v> 1 }'))
    assert out["results"]["bindings"][0]["b"]["value"] == "false"
    out = json.loads(fresh_eng.query_json(
        'SELECT (?und AS ?u) ?x WHERE { <urn:a> <urn:v> ?x }'))
    b = out["results"]["bindings"][0]
    assert "u" not in b and b["x"]["value"] == "1"


def test_r6_zero_length_path_constant_endpoints(fresh_eng):
    """SPARQL §18.4 zero-length paths: */? with identical constant
    endpoints match even when the term is absent from the graph; + does
    not (r6 probe fix, matches Jena/rdf4j)."""
    import json
    fresh_eng.update('INSERT DATA { <urn:a> <urn:p> <urn:b> }')
    ask = lambda q: json.loads(fresh_eng.query_json(q))["boolean"]
    assert ask('ASK { <urn:zzz> <urn:p>* <urn:zzz> }') is True
    assert ask('ASK { <urn:zzz> <urn:p>? <urn:zzz> }') is True
    assert ask('ASK { <urn:zzz> <urn:p>+ <urn:zzz> }') is False
    assert ask('ASK { <urn:a> <urn:p>* <urn:b> }') is True
    assert ask('ASK { <urn:a> <urn:p>* <urn:zzz> }') is False


def test_r6_update_dataset_and_aggregate_semantics(spark):
    """r6 probe sweep: LOAD SILENT swallows failures; USING selects the
    WHERE dataset and overrides WITH; FROM NAMED alone empties the
    default graph; SUM is 0 over an empty group and keeps xsd:integer
    for integer inputs."""
    import json

    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng = Engine(spark, QuadStore(spark))
    eng.update('INSERT DATA { <urn:a> <urn:v> 1 . '
               'GRAPH <urn:g1> { <urn:b> <urn:v> 2 } }')

    eng.update("LOAD SILENT <file:///nonexistent-xyz.nt>")   # must not raise
    import pytest as _pytest
    with _pytest.raises(Exception):
        eng.update("LOAD <file:///nonexistent-xyz.nt>")

    eng.update('WITH <urn:zzz> DELETE { ?s <urn:v> ?o } '
               'INSERT { ?s <urn:v2> ?o } USING <urn:g1> '
               'WHERE { ?s <urn:v> ?o }')
    def q(s):
        out = json.loads(eng.query_json(s))
        return out.get("boolean", out["results"]["bindings"])
    assert [b["s"]["value"] for b in
            q('SELECT ?s WHERE { ?s <urn:v2> ?o }')] == ["urn:b"]

    assert q('SELECT ?s FROM NAMED <urn:g1> WHERE { ?s <urn:v> ?o }') == []
    assert [b["s"]["value"] for b in
            q('SELECT ?s FROM NAMED <urn:g1> '
              'WHERE { GRAPH ?g { ?s ?p ?o } }')]

    b = q('SELECT (SUM(?x) AS ?s) (MAX(?x) AS ?m) '
          'WHERE { ?z <urn:none> ?x }')[0]
    assert (b["s"]["value"], b["s"]["datatype"].rsplit("#")[-1]) \
        == ("0", "integer")
    assert "m" not in b
    # both <urn:v> values remain (the DELETE scoped to <urn:zzz> matched
    # nothing) — and the integer sum keeps xsd:integer
    b = q('SELECT (SUM(?x) AS ?s) WHERE { ?z <urn:v> ?x }')[0]
    assert (b["s"]["value"], b["s"]["datatype"].rsplit("#")[-1]) \
        == ("3", "integer")


def test_r6_avg_empty_and_iri_base(fresh_eng):
    """r6 probe round 4: AVG over an empty group is 0 (xsd:integer, spec
    §18.5.1.6); IRI()/URI() resolve relative references against the query
    prologue's BASE."""
    import json
    fresh_eng.update('INSERT DATA { <urn:a> <urn:v> 1 . <urn:a> <urn:v> 2 }')
    def q(s): return json.loads(fresh_eng.query_json(s))["results"]["bindings"]
    b = q('SELECT (AVG(?x) AS ?a) WHERE { ?z <urn:none> ?x }')[0]
    assert (b["a"]["value"], b["a"]["datatype"].rsplit("#")[-1]) \
        == ("0", "integer")
    assert q('SELECT (AVG(?x) AS ?a) WHERE { ?z <urn:v> ?x }'
             )[0]["a"]["value"] == "1.5"
    b = q('BASE <http://b.org/> SELECT (IRI("rel") AS ?i) '
          '(IRI("urn:abs") AS ?j) WHERE { <urn:a> <urn:v> ?x } LIMIT 1')[0]
    assert b["i"]["value"] == "http://b.org/rel"
    assert b["j"]["value"] == "urn:abs"


def test_r6_review_fixes_dataset_paths_iri_base(fresh_eng):
    """r6 review sweep #2: FROM alone empties the named set; GRAPH <g>
    outside the named set is empty; never-bound vars in OPTIONAL FILTERs
    are row errors; nullable composite paths (alt/seq of */?) zero-length
    match constant endpoints; IRI() resolution is RFC 3986-shaped; BASE
    reaches update WHERE expressions."""
    import json
    e = fresh_eng
    e.update('INSERT DATA { GRAPH <urn:g1> { <urn:b> <urn:v> 2 } . '
             'GRAPH <urn:g2> { <urn:c> <urn:v> 3 } . <urn:a> <urn:v> 1 }')
    def q(s):
        out = json.loads(e.query_json(s))
        return out["boolean"] if "boolean" in out \
            else out["results"]["bindings"]
    assert q('SELECT ?g FROM <urn:g1> WHERE { GRAPH ?g { ?s ?p ?o } }') == []
    assert q('ASK FROM NAMED <urn:g1> { GRAPH <urn:g2> { ?s ?p ?o } }') is False
    assert q('ASK FROM NAMED <urn:g1> { GRAPH <urn:g1> { ?s ?p ?o } }') is True
    assert q('ASK { GRAPH <urn:g2> { ?s ?p ?o } }') is True
    assert len(q('SELECT ?s WHERE { ?s <urn:v> ?o OPTIONAL { '
                 '?s <urn:w> ?w FILTER(BOUND(?never)) } }')) == 3
    assert q('ASK { <urn:zzz> (<urn:p>*|<urn:q>) <urn:zzz> }') is True
    assert q('ASK { <urn:zzz> <urn:p>*/<urn:q>? <urn:zzz> }') is True
    assert q('ASK { <urn:zzz> <urn:p>*/<urn:q> <urn:zzz> }') is False
    b = q('BASE <http://x.org/dir/doc> SELECT (IRI("rel") AS ?a) '
          '(IRI("/abs") AS ?b) (IRI("#f") AS ?c) (IRI("//h/p") AS ?d) '
          'WHERE { <urn:a> <urn:v> ?x } LIMIT 1')[0]
    assert {k: v["value"] for k, v in b.items()} == {
        "a": "http://x.org/dir/rel", "b": "http://x.org/abs",
        "c": "http://x.org/dir/doc#f", "d": "http://h/p"}
    e.update('BASE <http://u.org/> INSERT { ?s <urn:iri> ?i } WHERE '
             '{ ?s <urn:v> ?o FILTER(?o = 1) BIND(IRI("made") AS ?i) }')
    assert [r["i"]["value"]
            for r in q('SELECT ?i WHERE { ?s <urn:iri> ?i }')] \
        == ["http://u.org/made"]
