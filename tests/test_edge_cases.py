"""SPARQL spec edge cases called out as 'hard parts' in SURVEY §7, plus the
property-based random-BGP-vs-oracle sweep (§5.5).

These are the cases where a naive relational translation silently diverges
from SPARQL semantics: MINUS with disjoint variables, term-kind ordering,
3-valued expression errors, and blank-node handling.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def eng(spark):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    e = Engine(spark, QuadStore(spark))
    e.update("""INSERT DATA {
        <urn:s1> <urn:p> 1 .  <urn:s2> <urn:p> 2 .  <urn:s3> <urn:p> 3 .
        <urn:s1> <urn:q> "a" . <urn:s2> <urn:q> "b" .
        <urn:s1> <urn:mixed> <urn:anIri> .
        <urn:s2> <urn:mixed> "literal" .
        <urn:s3> <urn:mixed> 42 .
        <urn:s1> <urn:str> "notanumber" . }""")
    return e


def _rows(eng, q, spec):
    return sorted((tuple(r) for r in eng.query(q).finalize(spec).collect()),
                  key=lambda t: tuple((x is None, x) for x in t))


# ------------------------------------------------ MINUS disjoint variables


def test_minus_disjoint_vars_removes_nothing(eng):
    """SPARQL spec: MINUS removes solutions *compatible on shared vars*; with
    no shared variables nothing is compatible, so nothing is removed."""
    got = _rows(eng, """
        SELECT ?s WHERE {
          ?s <urn:p> ?v .
          MINUS { ?x <urn:q> ?w }
        }""", {"s": "str"})
    assert got == [("urn:s1",), ("urn:s2",), ("urn:s3",)]


def test_minus_shared_vars_removes_matches(eng):
    got = _rows(eng, """
        SELECT ?s WHERE {
          ?s <urn:p> ?v .
          MINUS { ?s <urn:q> "a" }
        }""", {"s": "str"})
    assert got == [("urn:s2",), ("urn:s3",)]


# ------------------------------------------------ term-kind ORDER BY


def test_order_by_term_kind(eng):
    """SPARQL total order: unbound < blank < IRI < literal."""
    df = eng.query("""
        SELECT ?s ?o WHERE {
          ?s <urn:p> ?v .
          OPTIONAL { ?s <urn:mixed> ?o }
        } ORDER BY ?o""").finalize({"s": "str", "o": "auto"})
    kinds = []
    for r in df.collect():
        o = r["o"]
        if o is None:
            kinds.append(0)
        elif str(o).startswith("urn:"):
            kinds.append(1)
        else:
            kinds.append(2)
    assert kinds == sorted(kinds), f"term-kind order violated: {kinds}"


# ------------------------------------------------ 3-valued error semantics


def test_filter_type_error_drops_row(eng):
    """?x > 5 where ?x is a non-numeric string is an ERROR, not false —
    either way the row must be dropped, and must NOT abort the query."""
    got = _rows(eng, """
        SELECT ?s WHERE { ?s <urn:str> ?x . FILTER(?x > 5) }""", {"s": "str"})
    assert got == []


def test_filter_error_not_negated_to_true(eng):
    """!(error) is still error ⇒ row dropped (naive NOT(NULL) would keep)."""
    got = _rows(eng, """
        SELECT ?s WHERE { ?s <urn:str> ?x . FILTER(!(?x > 5)) }""",
        {"s": "str"})
    assert got == []


def test_filter_error_or_true_is_true(eng):
    """SPARQL logical-or: error || true = true ⇒ row kept."""
    got = _rows(eng, """
        SELECT ?s WHERE {
          ?s <urn:str> ?x . FILTER((?x > 5) || (STRLEN(?x) > 3))
        }""", {"s": "str"})
    assert got == [("urn:s1",)]


def test_coalesce_skips_error(eng):
    got = _rows(eng, """
        SELECT ?s ?v WHERE {
          ?s <urn:str> ?x .
          BIND(COALESCE(xsd:integer(?x), -1) AS ?v)
        }""", {"s": "str", "v": "int"})
    assert got == [("urn:s1", -1)]


# ------------------------------------------------ property-based BGP sweep


PREDS = ["urn:x:p/c_nationkey", "urn:x:p/c_mktsegment", "urn:x:p/c_acctbal",
         "urn:x:p/n_name", "urn:x:p/n_regionkey", "urn:x:p/r_name"]


def _duck_quads(duck, spark_quads):
    if not getattr(_duck_quads, "done", False):
        pdf = (spark_quads.select("s", "p", "o_lex").toPandas())
        duck.register("quads_pd", pdf)
        duck.execute(
            "CREATE TABLE IF NOT EXISTS quads_t AS SELECT * FROM quads_pd")
        _duck_quads.done = True


def test_random_bgp_vs_oracle(eng_fixtures, duck, quads):
    """20 random 2–3-pattern BGPs over the fixture quads, each checked
    against a DuckDB self-join of the identical shape (SURVEY §5.5)."""
    engine, _ = eng_fixtures
    _duck_quads(duck, quads)
    rng = random.Random(20260813)
    for case in range(20):
        n_pat = rng.choice([2, 3])
        # variable graph: chain or star on ?v0
        pats, conds, joins = [], [], []
        for i in range(n_pat):
            p = rng.choice(PREDS)
            subj = "?v0" if rng.random() < 0.7 or i == 0 else f"?v{i}"
            obj = f"?o{i}"
            pats.append(f"{subj} <{p}> {obj} .")
            joins.append((subj, p, obj))
        qvars = sorted({t for s_, _, o_ in joins for t in (s_, o_)})
        sparql = ("SELECT " + " ".join(qvars)
                  + " WHERE { " + " ".join(pats) + " }")
        sql_from, sql_where = [], []
        bind: dict[str, str] = {}
        for i, (s_, p, o_) in enumerate(joins):
            sql_from.append(f"quads_t t{i}")
            sql_where.append(f"t{i}.p = '{p}'")
            for var, col in ((s_, f"t{i}.s"), (o_, f"t{i}.o_lex")):
                if var in bind:
                    sql_where.append(f"{col} = {bind[var]}")
                else:
                    bind[var] = col
        sql = ("SELECT " + ", ".join(f"{bind[v]} AS {v[1:]}" for v in qvars)
               + " FROM " + ", ".join(sql_from)
               + " WHERE " + " AND ".join(sql_where))
        got = sorted(tuple(r) for r in engine.query(sparql).finalize(
            {v[1:]: "str" for v in qvars}).collect())
        want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
        assert got == want, f"case {case}: {sparql}\nSQL: {sql}"


@pytest.fixture(scope="module")
def eng_fixtures(spark, quads):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    return Engine(spark, QuadStore(spark, quads)), None


def test_random_union_join_vs_oracle(eng_fixtures, duck, quads):
    """Random UNION-then-join queries: the shared var is unbound in one
    branch (compatibility join — the union-of-equi-joins rewrite) and the
    oracle models the two branches explicitly (SURVEY §5.5 style)."""
    engine, _ = eng_fixtures
    _duck_quads(duck, quads)
    rng = random.Random(20260814)
    for case in range(8):
        pa, pb, pc = (rng.choice(PREDS) for _ in range(3))
        sparql = f"""
            SELECT ?v0 ?m ?om WHERE {{
              {{ ?v0 <{pa}> ?m }} UNION {{ ?v0 <{pb}> ?x }}
              ?m <{pc}> ?om .
            }}"""
        sql = f"""
            SELECT t1.s AS v0, t1.o_lex AS m, t3.o_lex AS om
            FROM quads_t t1, quads_t t3
            WHERE t1.p = '{pa}' AND t3.p = '{pc}' AND t3.s = t1.o_lex
            UNION ALL
            SELECT t2.s AS v0, t3.s AS m, t3.o_lex AS om
            FROM quads_t t2, quads_t t3
            WHERE t2.p = '{pb}' AND t3.p = '{pc}'"""
        got = sorted(tuple(r) for r in engine.query(sparql).finalize(
            {"v0": "str", "m": "str", "om": "str"}).collect())
        want = sorted(tuple(r) for r in duck.execute(sql).fetchall())
        assert got == want, f"case {case}: {sparql}"


def test_random_two_unbound_compat_join_vs_oracle(eng_fixtures, duck, quads):
    """Round-4: random queries where ONE join carries TWO maybe-unbound
    shared vars (left side mixes boundness masks (1,1)/(1,0)/(0,0) via
    OPTIONAL-inside-UNION; the subselect right side binds both) — the
    generalized mask-decomposition path. Oracle: explicit compat join with
    NULL-matches-anything semantics and COALESCE value merge."""
    engine, _ = eng_fixtures
    _duck_quads(duck, quads)
    rng = random.Random(20260816)
    none_key = lambda t: tuple((c is None, c) for c in t)
    for case in range(6):
        pa, pb, pc, pd = (rng.choice(PREDS) for _ in range(4))
        sparql = f"""
            SELECT ?v0 ?m ?n WHERE {{
              {{ ?v0 <{pa}> ?m OPTIONAL {{ ?v0 <{pb}> ?n }} }}
              UNION {{ ?v0 <{pc}> ?x }}
              {{ SELECT ?m ?n WHERE {{ ?m <{pd}> ?n }} }}
            }}"""
        sql = f"""
            WITH lhs AS (
              SELECT t1.s AS v0, t1.o_lex AS m, t2.o_lex AS n
              FROM quads_t t1 LEFT JOIN quads_t t2
                ON t2.p = '{pb}' AND t2.s = t1.s
              WHERE t1.p = '{pa}'
              UNION ALL
              SELECT t3.s AS v0, NULL AS m, NULL AS n
              FROM quads_t t3 WHERE t3.p = '{pc}'
            ), rhs AS (SELECT s AS m, o_lex AS n FROM quads_t
                       WHERE p = '{pd}')
            SELECT l.v0 AS v0, COALESCE(l.m, r.m) AS m,
                   COALESCE(l.n, r.n) AS n
            FROM lhs l JOIN rhs r
              ON (l.m IS NULL OR l.m = r.m)
             AND (l.n IS NULL OR l.n = r.n)"""
        got = sorted((tuple(r) for r in engine.query(sparql).finalize(
            {"v0": "str", "m": "str", "n": "str"}).collect()), key=none_key)
        want = sorted((tuple(r) for r in duck.execute(sql).fetchall()),
                      key=none_key)
        assert got == want, f"case {case}: {sparql}"


def test_random_minus_unbound_vs_oracle(eng_fixtures, duck, quads):
    """Random MINUS queries where a shared var may be unbound on the left
    (OPTIONAL): SPARQL 1.1 §8.3 — remove iff compatible AND domains overlap.
    The oracle encodes that as NOT EXISTS with the compat condition."""
    engine, _ = eng_fixtures
    _duck_quads(duck, quads)
    rng = random.Random(20260815)
    for case in range(8):
        pa, pb, pc = (rng.choice(PREDS) for _ in range(3))
        sparql = f"""
            SELECT ?v0 ?o0 ?x WHERE {{
              ?v0 <{pa}> ?o0 OPTIONAL {{ ?v0 <{pb}> ?x }}
              MINUS {{ ?v0 <{pc}> ?x }}
            }}"""
        sql = f"""
            WITH lhs AS (
              SELECT t1.s AS v0, t1.o_lex AS o0, t2.o_lex AS x
              FROM quads_t t1 LEFT JOIN quads_t t2
                ON t2.p = '{pb}' AND t2.s = t1.s
              WHERE t1.p = '{pa}')
            SELECT v0, o0, x FROM lhs l
            WHERE NOT EXISTS (
              SELECT 1 FROM quads_t r
              WHERE r.p = '{pc}' AND r.s = l.v0
                AND (l.x IS NULL OR l.x = r.o_lex))"""
        got = sorted((tuple(r) for r in engine.query(sparql).finalize(
            {"v0": "str", "o0": "str", "x": "str"}).collect()),
            key=lambda t: tuple((c is None, c) for c in t))
        want = sorted((tuple(r) for r in duck.execute(sql).fetchall()),
                      key=lambda t: tuple((c is None, c) for c in t))
        assert got == want, f"case {case}: {sparql}"


# ------------------------------------------------ second batch: translation traps


def test_optional_with_correlated_filter(eng):
    """FILTER inside OPTIONAL referencing an outer var is part of the
    left-join condition, NOT a post-filter (SPARQL spec §8.3 LeftJoin)."""
    got = _rows(eng, """
        SELECT ?s ?q WHERE {
          ?s <urn:p> ?v .
          OPTIONAL { ?s <urn:q> ?q . FILTER(?v < 2) }
        }""", {"s": "str", "q": "str"})
    # s1 (v=1) keeps its q="a"; s2 (v=2) keeps the row with q unbound
    assert got == [("urn:s1", "a"), ("urn:s2", None), ("urn:s3", None)]


def test_union_disjoint_vars_null_padding(eng):
    got = _rows(eng, """
        SELECT ?a ?b WHERE {
          { ?s <urn:q> ?a } UNION { ?s <urn:str> ?b }
        }""", {"a": "str", "b": "str"})
    assert got == [("a", None), ("b", None), (None, "notanumber")]


def test_implicit_group_on_empty_input(eng):
    """Aggregate over zero rows still yields ONE row (COUNT=0)."""
    got = _rows(eng, """
        SELECT (COUNT(*) AS ?n) WHERE { ?s <urn:nosuchpred> ?v }""",
        {"n": "int"})
    assert got == [(0,)]


def test_order_by_expression(eng):
    got = [r[0] for r in eng.query("""
        SELECT ?s WHERE { ?s <urn:p> ?v } ORDER BY DESC(?v * 2 + 1)
    """).finalize({"s": "str"}).collect()]
    assert got == ["urn:s3", "urn:s2", "urn:s1"]


def test_blank_node_in_data_and_pattern(spark):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    e = Engine(spark, QuadStore(spark))
    e.update("""INSERT DATA {
        _:b1 <urn:name> "anon1" . _:b1 <urn:age> 30 .
        <urn:real> <urn:name> "named" }""")
    # bnode in a query pattern behaves as a non-projected variable
    got = sorted(r[0] for r in e.query("""
        SELECT ?n WHERE { _:x <urn:name> ?n . _:x <urn:age> 30 }
    """).finalize({"n": "str"}).collect())
    assert got == ["anon1"]


def test_reduced_accepted(eng):
    got = _rows(eng, """
        SELECT REDUCED ?v WHERE { ?s <urn:p> ?v }""", {"v": "int"})
    assert len(got) <= 3 and set(got) == {(1,), (2,), (3,)}


def test_nested_optional(eng):
    got = _rows(eng, """
        SELECT ?s ?q ?m WHERE {
          ?s <urn:p> ?v .
          OPTIONAL {
            ?s <urn:q> ?q .
            OPTIONAL { ?s <urn:mixed> ?m . FILTER(isIRI(?m)) }
          }
        }""", {"s": "str", "q": "str", "m": "str"})
    assert got == [("urn:s1", "a", "urn:anIri"),
                   ("urn:s2", "b", None),
                   ("urn:s3", None, None)]


def test_values_with_undef(eng):
    got = _rows(eng, """
        SELECT ?s ?v WHERE {
          ?s <urn:p> ?v .
          VALUES (?s ?v) { (<urn:s1> UNDEF) (UNDEF 3) }
        }""", {"s": "str", "v": "int"})
    assert got == [("urn:s1", 1), ("urn:s3", 3)]


def test_random_filter_optional_vs_oracle(eng_fixtures, duck, quads):
    """Random pattern+FILTER(+OPTIONAL) queries vs DuckDB oracle — extends
    the BGP sweep to the operators where translation subtleties live."""
    engine, _ = eng_fixtures
    _duck_quads(duck, quads)
    rng = random.Random(42)
    ops = [(">", ">"), ("<", "<"), (">=", ">="), ("<=", "<=")]
    for case in range(10):
        thr = rng.choice([0, 1000, 5000, 9000])
        op, sqlop = rng.choice(ops)
        use_opt = rng.random() < 0.5
        if use_opt:
            sparql = f"""SELECT ?c ?bal ?n WHERE {{
                ?c <urn:x:p/c_acctbal> ?bal . FILTER(?bal {op} {thr})
                OPTIONAL {{ ?c <urn:x:p/c_nationkey> ?nk .
                            ?nk <urn:x:p/n_name> ?n . }} }}"""
            sql = f"""
                SELECT t0.s AS c, t0.o_lex AS bal, t2.o_lex AS n
                FROM quads_t t0
                LEFT JOIN (SELECT t1.s AS cs, t2i.o_lex
                           FROM quads_t t1
                           JOIN quads_t t2i ON t1.o_lex = t2i.s
                            AND t2i.p = 'urn:x:p/n_name'
                           WHERE t1.p = 'urn:x:p/c_nationkey') t2
                  ON t0.s = t2.cs
                WHERE t0.p = 'urn:x:p/c_acctbal'
                  AND CAST(t0.o_lex AS DOUBLE) {sqlop} {thr}"""
            spec = {"c": "str", "bal": "str", "n": "str"}
        else:
            sparql = f"""SELECT ?c ?bal WHERE {{
                ?c <urn:x:p/c_acctbal> ?bal . FILTER(?bal {op} {thr}) }}"""
            sql = f"""
                SELECT s AS c, o_lex AS bal FROM quads_t
                WHERE p = 'urn:x:p/c_acctbal'
                  AND CAST(o_lex AS DOUBLE) {sqlop} {thr}"""
            spec = {"c": "str", "bal": "str"}
        got = sorted((tuple(r) for r in engine.query(sparql)
                      .finalize(spec).collect()), key=str)
        want = sorted((tuple(r) for r in duck.execute(sql).fetchall()),
                      key=str)
        assert got == want, f"case {case} ({op} {thr}, opt={use_opt})"
