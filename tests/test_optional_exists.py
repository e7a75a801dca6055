"""(NOT) EXISTS inside an OPTIONAL's FILTER (r7 fix).

The LeftJoin's embedded expression used to reach _eval with an empty
exists-map — the translation raised and the whole query degraded to the
error sentinel. Now LeftJoin(L, R, F-with-EXISTS) expands per §18.2.2.2
into Filter(F, Join(L, R)) ∪ Diff(L, R, F) with the EXISTS flags
materialized on the concrete joined frame.
"""

from __future__ import annotations

import json

import pytest

from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA


@pytest.fixture()
def eng(spark):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH, QuadStore
    g = DEFAULT_GRAPH
    rows = [(g, "urn:a1", "urn:p", "urn:b1", None, None, None, None),
            (g, "urn:a2", "urn:p", "urn:b2", None, None, None, None),
            (g, "urn:b1", "urn:r", "urn:c1", None, None, None, None)]
    return Engine(spark, QuadStore(spark, spark.createDataFrame(rows, QUAD_SCHEMA)))


def _bindings(eng, q):
    out = json.loads(eng.query_json(q))
    assert out["head"]["vars"] != ["xxx"], "query hit the error sentinel"
    return out["results"]["bindings"]


def test_exists_in_optional_filter(eng):
    # ?b has an urn:r successor only for a1's branch
    b = _bindings(eng, """
        SELECT ?a ?z WHERE {
          ?a <urn:p> ?b .
          OPTIONAL { VALUES ?z { 10 } FILTER(EXISTS { ?b <urn:r> ?w }) }
        } ORDER BY ?a""")
    got = {x["a"]["value"]: x.get("z", {}).get("value") for x in b}
    assert got == {"urn:a1": "10", "urn:a2": None}


def test_not_exists_in_optional_filter(eng):
    b = _bindings(eng, """
        SELECT ?a ?z WHERE {
          ?a <urn:p> ?b .
          OPTIONAL { VALUES ?z { 10 } FILTER(NOT EXISTS { ?b <urn:r> ?w }) }
        } ORDER BY ?a""")
    got = {x["a"]["value"]: x.get("z", {}).get("value") for x in b}
    assert got == {"urn:a1": None, "urn:a2": "10"}


def test_exists_combined_with_plain_condition(eng):
    # EXISTS AND a value condition on a right-side var, per-row outcomes
    b = _bindings(eng, """
        SELECT ?a ?z WHERE {
          ?a <urn:p> ?b .
          OPTIONAL { VALUES ?z { 1 2 }
                     FILTER(EXISTS { ?b <urn:r> ?w } && ?z > 1) }
        } ORDER BY ?a ?z""")
    got = [(x["a"]["value"], x.get("z", {}).get("value")) for x in b]
    assert got == [("urn:a1", "2"), ("urn:a2", None)]


def test_optional_exists_duplicate_left_rows(eng):
    # duplicate left solutions each keep their own row through the
    # Diff branch (multiset semantics over the id-keyed anti-join)
    b = _bindings(eng, """
        SELECT ?x ?z WHERE {
          VALUES ?x { 1 1 2 }
          OPTIONAL { VALUES ?z { 10 }
                     FILTER(EXISTS { <urn:a1> <urn:p> ?q } && ?x > 1) }
        } ORDER BY ?x""")
    got = [(x["x"]["value"], x.get("z", {}).get("value")) for x in b]
    assert got == [("1", None), ("1", None), ("2", "10")]


# --------------------------------------------------- correlated EXISTS
# §8.1.4 substitute semantics: outer vars referenced from expression
# position inside the EXISTS pattern (not bound by it) must be visible.
# The engine decorrelates by joining the distinct outer bindings into
# every group scope of the pattern (translator._inject_correlation).


def test_correlated_exists_in_filter(eng):
    b = _bindings(eng, """
        SELECT ?x WHERE { VALUES ?x { 1 2 }
          FILTER(EXISTS { VALUES ?w { 1 } FILTER(?w = ?x) }) }""")
    assert [x["x"]["value"] for x in b] == ["1"]


def test_correlated_not_exists_in_filter(eng):
    b = _bindings(eng, """
        SELECT ?x WHERE { VALUES ?x { 1 2 }
          FILTER(NOT EXISTS { VALUES ?w { 1 } FILTER(?w = ?x) }) }""")
    assert [x["x"]["value"] for x in b] == ["2"]


def test_exists_in_having_correlates_with_group_key(eng):
    b = _bindings(eng, """
        SELECT ?x (COUNT(*) AS ?c) WHERE { VALUES ?x { 1 1 2 } }
        GROUP BY ?x
        HAVING(EXISTS { VALUES ?w { 1 } FILTER(?w = ?x) })""")
    assert [(x["x"]["value"], x["c"]["value"]) for x in b] == [("1", "2")]


def test_exists_in_select_expression(eng):
    b = _bindings(eng, """
        SELECT ?x (EXISTS { VALUES ?w { 1 } FILTER(?w = ?x) } AS ?e)
        WHERE { VALUES ?x { 1 2 } } ORDER BY ?x""")
    got = [(x["x"]["value"], x["e"]["value"]) for x in b]
    assert got == [("1", "true"), ("2", "false")]


def test_exists_in_order_by(eng):
    b = _bindings(eng, """
        SELECT ?x WHERE { VALUES ?x { 2 1 } }
        ORDER BY DESC(EXISTS { VALUES ?w { 1 } FILTER(?w = ?x) }) ?x""")
    assert [x["x"]["value"] for x in b] == ["1", "2"]


def test_exists_in_aggregate_argument(eng):
    b = _bindings(eng, """
        SELECT (SUM(IF(EXISTS { VALUES ?w { 1 } FILTER(?w = ?x) },
                       10, 1)) AS ?s)
        WHERE { VALUES ?x { 1 2 } }""")
    assert b[0]["s"]["value"] == "11"


def test_nested_exists_correlates_through_levels(eng):
    # inner FILTER references BOTH the middle (?y) and outermost (?x) var
    b = _bindings(eng, """
        SELECT ?x WHERE { VALUES ?x { 0 2 }
          FILTER(EXISTS { VALUES ?y { 5 }
                 FILTER(EXISTS { VALUES ?z { 6 }
                        FILTER(?z > ?y + ?x) }) }) }""")
    assert [x["x"]["value"] for x in b] == ["0"]


def test_correlated_exists_against_store_data(eng):
    # correlation var used in an inner FILTER over a real triple scan
    b = _bindings(eng, """
        SELECT ?a WHERE {
          ?a <urn:p> ?b .
          FILTER(EXISTS { ?s <urn:r> ?c FILTER(?s = ?b) })
        }""")
    assert [x["a"]["value"] for x in b] == ["urn:a1"]
