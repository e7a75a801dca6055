"""Pins for the four r8 ADVICE fixes.

* Correlated-EXISTS decorrelation vs MINUS (§8.1.4 substitute semantics):
  the injected outer-binding leaf lands on BOTH sides of a MINUS inside
  the EXISTS pattern, but under substitution those vars are CONSTANTS —
  they must not create domain overlap, so a right side whose real domain
  is disjoint from the left leaves the left untouched.
* Numeric-lexical validation in ``from_term`` / ``term_parts_py``: an
  invalid typed-numeric lexical ("1e5"^^xsd:integer) must NOT acquire a
  numeric value shadow via Python float() — it stays outside the value
  space (arithmetic errors, EBV false), preserving the engine invariant
  that non-null num ⇒ valid lexical.
* EXISTS semi-join under compatibility semantics: a row whose shared var
  is UNBOUND (OPTIONAL miss) leaves the var free in the pattern — EXISTS
  is true if the pattern matches anything, not hard-false.
* GRAPH ?g fan-out drops the stale ``__mu_<g>_*`` markers once every row
  has ?g bound, so downstream joins on ?g keep the strict fast path.
"""

from __future__ import annotations

import json

import pytest

from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA

XSD = "http://www.w3.org/2001/XMLSchema#"


@pytest.fixture()
def eng(spark):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH, QuadStore
    g = DEFAULT_GRAPH
    rows = [
        (g, "urn:a1", "urn:p", "urn:b1", None, None, None, None),
        (g, "urn:a2", "urn:p", "urn:b2", None, None, None, None),
        (g, "urn:a1", "urn:q", "v1", XSD + "string", None, None, None),
        (g, "urn:b1", "urn:r", "v1", XSD + "string", None, None, None),
        (g, "urn:b9", "urn:r", "v9", XSD + "string", None, None, None),
        # an invalid xsd:integer lexical stored as data
        (g, "urn:n1", "urn:v", "1e5", XSD + "integer", None, None, None),
        (g, "urn:n2", "urn:v", "100000", XSD + "integer", None, 100000.0, None),
    ]
    return Engine(spark, QuadStore(spark, spark.createDataFrame(rows, QUAD_SCHEMA)))


def _bindings(eng, q):
    out = json.loads(eng.query_json(q))
    assert out["head"]["vars"] != ["xxx"], "query hit the error sentinel"
    return out["results"]["bindings"]


# ---------------------------------------------------------------- MINUS × corr


def test_exists_minus_disjoint_right_is_noop(eng):
    # ADVICE (medium) repro: the MINUS right side's REAL domain {?a ?b}
    # is disjoint from its left {?s ?o}; the injected ?outer must not
    # manufacture overlap, so MINUS removes nothing and EXISTS is true.
    b = _bindings(eng, """
        SELECT ?outer WHERE {
          VALUES ?outer { 7 }
          FILTER EXISTS {
            ?s <urn:p> ?o
            MINUS { ?a <urn:q> ?b FILTER(?b = ?outer) }
          }
        }""")
    assert [x["outer"]["value"] for x in b] == ["7"]


def test_exists_minus_real_overlap_still_removes(eng):
    # control: a genuinely-shared ?s still triggers MINUS removal inside
    # the correlated pattern — only urn:a2 (no urn:q edge) survives
    b = _bindings(eng, """
        SELECT ?outer WHERE {
          VALUES ?outer { "v1" }
          FILTER EXISTS {
            ?s <urn:p> ?o
            MINUS { ?s <urn:q> ?w FILTER(?w = ?outer) }
          }
        }""")
    assert [x["outer"]["value"] for x in b] == ["v1"]


def test_exists_minus_removes_everything_when_overlap_total(eng):
    # every urn:p subject also has the urn:q edge matching ?outer=v1 ⇒
    # after MINUS the EXISTS pattern is empty for a1; but a2 has no urn:q
    # edge so it survives ⇒ EXISTS true. Flip: restrict left to a1 only.
    b = _bindings(eng, """
        SELECT ?outer WHERE {
          VALUES ?outer { "v1" }
          FILTER EXISTS {
            <urn:a1> <urn:p> ?o . ?s <urn:p> ?o .
            MINUS { ?s <urn:q> ?w FILTER(?w = ?outer) }
          }
        }""")
    assert b == []


def test_exists_minus_right_only_outer_var(eng):
    # the outer var appears POSITIONALLY only in the MINUS right side —
    # its bindings never surface from the body, so only §8.1.4
    # substitution (corr injection) can correlate it. Per outer row the
    # right side is restricted to THAT row's value:
    #   s=a1: R = {v1} removes L's (b1,v1) ⇒ EXISTS false
    #   s=a2: R = {}  ⇒ L survives       ⇒ EXISTS true
    # (pre-fix the MINUS removed v1 for EVERY outer row)
    b = _bindings(eng, """
        SELECT ?s WHERE {
          VALUES ?s { <urn:a1> <urn:a2> }
          FILTER EXISTS {
            ?x <urn:r> ?w . FILTER(?w = "v1")
            MINUS { ?s <urn:q> ?w }
          }
        }""")
    assert [x["s"]["value"] for x in b] == ["urn:a2"]


def test_exists_minus_right_only_outer_var_disjoint(eng):
    # control: right side domain-disjoint from left even with the
    # injected ?s — MINUS is a no-op, every outer row passes
    b = _bindings(eng, """
        SELECT ?s WHERE {
          VALUES ?s { <urn:a1> <urn:a2> }
          FILTER EXISTS {
            ?x <urn:r> ?w
            MINUS { ?s <urn:q> ?other }
          }
        } ORDER BY ?s""")
    assert [x["s"]["value"] for x in b] == ["urn:a1", "urn:a2"]


# ------------------------------------------------- invalid numeric lexicals


def test_invalid_integer_lexical_has_no_value(eng):
    # constant path (TCol.from_term): arithmetic on the invalid form is a
    # type error; COALESCE falls through to the marker
    b = _bindings(eng, """
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?r WHERE {
          VALUES ?one { 1 }
          BIND(COALESCE("1e5"^^xsd:integer + 1, "err") AS ?r)
        }""")
    assert [x["r"]["value"] for x in b] == ["err"]


def test_invalid_integer_lexical_ebv_false(eng):
    b = _bindings(eng, """
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?one WHERE { VALUES ?one { 1 } FILTER("1e5"^^xsd:integer) }
        """)
    assert b == []
    # a VALID integer still works end-to-end
    b = _bindings(eng, """
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?r WHERE { VALUES ?one { 1 }
                          BIND("15"^^xsd:integer + 1 AS ?r) }""")
    assert [x["r"]["value"] for x in b] == ["16"]


def test_invalid_numeric_values_row(eng):
    # term_parts_py path: the VALUES row carries the term, but it has no
    # numeric value — the comparison is a type error, the row drops
    b = _bindings(eng, """
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?x WHERE { VALUES ?x { "1e5"^^xsd:integer } FILTER(?x > 0) }
        """)
    assert b == []


def test_scan_constant_invalid_numeric_object(eng):
    # an invalid numeric constant in object position matches by exact
    # term, not by (nonexistent) value
    b = _bindings(eng, """
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?s WHERE { ?s <urn:v> "1e5"^^xsd:integer }""")
    assert [x["s"]["value"] for x in b] == ["urn:n1"]
    b = _bindings(eng, """
        PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
        SELECT ?s WHERE { ?s <urn:v> "100000"^^xsd:integer }""")
    assert [x["s"]["value"] for x in b] == ["urn:n2"]


def test_loader_rejects_invalid_numeric_lexical(spark, tmp_path):
    # reader path (sources/rdf.py): the shadow column stays NULL for the
    # invalid form
    from graphdb_free_mocha_sa_spark.sources.rdf import read_ntriples
    f = tmp_path / "t.nt"
    f.write_text(
        '<urn:n1> <urn:v> "1e5"^^<http://www.w3.org/2001/XMLSchema#integer> .\n'
        '<urn:n2> <urn:v> "7"^^<http://www.w3.org/2001/XMLSchema#integer> .\n')
    rows = {r["s"]: r["o_num"]
            for r in read_ntriples(spark, str(f), "urn:g").collect()}
    assert rows["urn:n1"] is None
    assert rows["urn:n2"] == 7.0


# ------------------------------------------- EXISTS with unbound shared var


def test_exists_unbound_shared_var_is_free(eng):
    # ?v is unbound for a2 (no urn:q edge): substitution leaves ?v free,
    # so EXISTS{ ?x urn:r ?v } is true iff ANY urn:r triple exists — a2
    # must survive (strict equality used to hard-drop it)
    b = _bindings(eng, """
        SELECT ?a WHERE {
          ?a <urn:p> ?b .
          OPTIONAL { ?a <urn:q> ?v }
          FILTER EXISTS { ?x <urn:r> ?v }
        } ORDER BY ?a""")
    assert [x["a"]["value"] for x in b] == ["urn:a1", "urn:a2"]


def test_exists_bound_shared_var_still_filters(eng):
    # bound side control: a1's ?v = "v1" has an urn:r match; if we make
    # the bound value unmatched the row must drop while unbound survives
    b = _bindings(eng, """
        SELECT ?a WHERE {
          ?a <urn:p> ?b .
          OPTIONAL { ?a <urn:q> ?v }
          FILTER EXISTS { ?x <urn:r> ?v . FILTER(?v = "v9") }
        } ORDER BY ?a""")
    # a1: ?v="v1" bound, no urn:r/v9-compatible row with v1 ⇒ drops.
    # a2: ?v free ⇒ pattern has the v9 row ⇒ survives.
    assert [x["a"]["value"] for x in b] == ["urn:a2"]


def test_not_exists_unbound_shared_var(eng):
    b = _bindings(eng, """
        SELECT ?a WHERE {
          ?a <urn:p> ?b .
          OPTIONAL { ?a <urn:q> ?v }
          FILTER NOT EXISTS { ?x <urn:r> ?v }
        }""")
    # both rows see a non-empty compatible pattern ⇒ NOT EXISTS false
    assert b == []


# -------------------------------------------------- GRAPH ?g marker hygiene


def test_graph_fanout_drops_stale_mu_markers(spark):
    from graphdb_free_mocha_sa_spark.sparql.parser import parse_query
    from graphdb_free_mocha_sa_spark.sparql.translator import Translator
    rows = [("urn:g1", "urn:s", "urn:p", "urn:o", None, None, None, None),
            ("urn:g2", "urn:s2", "urn:p", "urn:o2", None, None, None, None)]
    quads = spark.createDataFrame(rows, QUAD_SCHEMA)
    q = parse_query("""
        SELECT * WHERE {
          GRAPH ?g { { ?s <urn:p> ?o } UNION { BIND(1 AS ?k) } }
        }""")
    tr = Translator(spark, quads)
    df = tr.translate(q.pattern)
    assert not [c for c in df.columns if c.startswith("__mu_g_")], df.columns
    # and ?g is bound on every row
    assert df.filter(df["g"].isNull()).count() == 0
    assert df.count() == 2 + 2   # scan rows + BIND row fanned over 2 graphs
