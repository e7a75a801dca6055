"""Randomized ALGEBRA-COMBINATION differential sweep (r7).

The per-operator sweeps (BGP / UNION / compat joins / MINUS / OPTIONAL+
FILTER in tests/test_edge_cases.py, paths in test_paths_fuzz.py,
expressions in test_expr_fuzz.py, aggregates in test_agg_fuzz.py) each
pin one operator; this sweep covers their INTERACTION surface: random
nested pattern trees — Join / OPTIONAL / UNION / MINUS / FILTER / BIND /
VALUES over BGP leaves — evaluated by the engine over a small random
typed graph and compared as solution MULTISETS against an independent
pure-Python evaluator implementing the SPARQL algebra directly
(§18.5 Join/LeftJoin/Union/Minus definitions, §8.3 MINUS domain
overlap, BIND errors leaving the var unbound). FILTER/BIND expressions
come from the §17 reference in tests/test_expr_fuzz.py, so the two
randomized surfaces compose.

Brace discipline: every combinator emits explicit groups, so a FILTER
generated inside an OPTIONAL stays a nested-group filter (never lifted
into the LeftJoin condition — that lifted form is pinned separately in
tests/test_optional_exists.py).
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from graphdb_free_mocha_sa_spark.model import (XSD_BOOLEAN, XSD_INTEGER,
                                               XSD_STRING)
from tests.test_expr_fuzz import ERROR, ebv, gen_expr, lit, numv

PREDS = ["urn:p", "urn:q", "urn:r"]
NODES = [f"urn:n{i}" for i in range(6)]
GRAPHS = ["urn:g1", "urn:g2"]          # plus the default graph
OBJ_TERMS = [("iri", n) for n in NODES[:3]] + [
    lit("1", XSD_INTEGER), lit("2", XSD_INTEGER), lit("3", XSD_INTEGER),
    lit("a"), lit("b"), lit("chat", lang="en"),
]
VARS = ["a", "b", "c"]


# ------------------------------------------------------------- reference
#
# Solutions are dicts var -> term (term tuples as in test_expr_fuzz).

def _compatible(m, n):
    return all(m[k] == n[k] for k in m.keys() & n.keys())


def _merge(m, n):
    out = dict(m)
    out.update(n)
    return out


def ref_join(L, R):
    return [_merge(m, n) for m in L for n in R if _compatible(m, n)]


def ref_leftjoin(L, R):
    out = []
    for m in L:
        ms = [_merge(m, n) for n in R if _compatible(m, n)]
        out.extend(ms if ms else [m])
    return out


def ref_minus(L, R):
    out = []
    for m in L:
        removed = any(_compatible(m, n) and (m.keys() & n.keys())
                      for n in R)
        if not removed:
            out.append(m)
    return out


def ref_filter(L, f):
    return [m for m in L if ebv(f(m)) is True]


def ref_extend(L, var, f):
    out = []
    for m in L:
        v = f(m)
        m2 = dict(m)
        if v is not ERROR and v is not None:
            m2[var] = v
        out.append(m2)
    return out


def match_bgp(tps, triples):
    sols = [dict()]
    for s, p, o in tps:
        new = []
        for m in sols:
            for ts, tp_, to in triples:
                m2 = dict(m)
                ok = True
                for pat, val in ((s, ts), (p, tp_), (o, to)):
                    if isinstance(pat, str):        # variable name
                        if pat in m2:
                            if m2[pat] != val:
                                ok = False
                                break
                        else:
                            m2[pat] = val
                    elif pat != val:
                        ok = False
                        break
                if ok:
                    new.append(m2)
        sols = new
    return sols


# ------------------------------------------------------------- generator
#
# Each node: (sparql_text_without_outer_braces,
#             eval_fn(triples) -> list[solution], scope_vars)

def term_sparql_t(t):
    if t[0] == "iri":
        return f"<{t[1]}>"
    _, lex, dt, lang = t
    if lang:
        return f'"{lex}"@{lang}'
    if dt == XSD_INTEGER:
        return str(lex)
    if dt == XSD_BOOLEAN:
        return str(lex)
    return f'"{lex}"'


def gen_bgp(rng):
    """Eval signature everywhere: f(quads, g) where quads maps graph name
    -> triple list and g is the ACTIVE graph: None at top level — the
    engine follows the GraphDB/rdf4j convention that with no dataset
    clause the default dataset is the UNION of all graphs
    (translator._graph_scan) — or a named graph selected by GRAPH."""
    tps, parts = [], []
    for _ in range(rng.randint(1, 2)):
        s = rng.choice(VARS + [("iri", rng.choice(NODES))])
        p = rng.choice(PREDS)
        o = rng.choice(VARS + OBJ_TERMS)
        tps.append((s if isinstance(s, str) else s,
                    ("iri", p),
                    o))
        s_txt = f"?{s}" if isinstance(s, str) else f"<{s[1]}>"
        o_txt = f"?{o}" if isinstance(o, str) else term_sparql_t(o)
        parts.append(f"{s_txt} <{p}> {o_txt} .")
    scope = {x for tp in tps for x in tp if isinstance(x, str)}
    def ev(Q, g, tps=tps):
        tris = ([t for ts in Q.values() for t in ts]
                if g is None else Q.get(g, []))
        return match_bgp(tps, tris)
    return (" ".join(parts), ev, scope)


def gen_values(rng):
    vs = rng.sample(VARS, rng.randint(1, 2))
    rows = []
    for _ in range(rng.randint(1, 3)):
        rows.append([rng.choice(OBJ_TERMS) if rng.random() < 0.8 else None
                     for _ in vs])
    body = " ".join(
        "(" + " ".join("UNDEF" if t is None else term_sparql_t(t)
                       for t in row) + ")"
        for row in rows)
    sols = [{v: t for v, t in zip(vs, row) if t is not None}
            for row in rows]
    txt = f"VALUES ({' '.join('?' + v for v in vs)}) {{ {body} }}"
    return (txt, lambda Q, g, sols=sols: [dict(s) for s in sols], set(vs))


_FRESH = [0]


def gen_pattern(rng, depth):
    if depth <= 0:
        return gen_values(rng) if rng.random() < 0.25 else gen_bgp(rng)
    kind = rng.choice(["join", "optional", "union", "minus",
                       "filter", "bind", "graphc", "leaf", "leaf"])
    if kind == "leaf":
        return gen_pattern(rng, 0)
    if kind in ("join", "optional", "union", "minus"):
        lt, lf, ls = gen_pattern(rng, depth - 1)
        rt, rf, rs = gen_pattern(rng, depth - 1)
        if kind == "join":
            return (f"{{ {lt} }} {{ {rt} }}",
                    lambda Q, g: ref_join(lf(Q, g), rf(Q, g)), ls | rs)
        if kind == "optional":
            return (f"{{ {lt} }} OPTIONAL {{ {rt} }}",
                    lambda Q, g: ref_leftjoin(lf(Q, g), rf(Q, g)), ls | rs)
        if kind == "union":
            return (f"{{ {lt} }} UNION {{ {rt} }}",
                    lambda Q, g: lf(Q, g) + rf(Q, g), ls | rs)
        return (f"{{ {lt} }} MINUS {{ {rt} }}",
                lambda Q, g: ref_minus(lf(Q, g), rf(Q, g)), ls)
    if kind == "filter":
        pt, pf, ps = gen_pattern(rng, depth - 1)
        es, ef = gen_expr(rng, rng.randint(1, 2))
        return (f"{{ {pt} FILTER({es}) }}",
                lambda Q, g: ref_filter(pf(Q, g), ef), ps)
    if kind == "graphc":
        pt, pf, ps = gen_pattern(rng, depth - 1)
        if rng.random() < 0.5:
            gn = rng.choice(GRAPHS)
            return (f"GRAPH <{gn}> {{ {pt} }}",
                    lambda Q, g, gn=gn: pf(Q, gn), ps)

        # GRAPH ?gv: union over the dataset's NAMED graphs, ?gv bound
        def ev(Q, g, pf=pf):
            out = []
            for gn in GRAPHS:
                for m in pf(Q, gn):
                    if m.get("gv", ("iri", gn)) == ("iri", gn):
                        m2 = dict(m)
                        m2["gv"] = ("iri", gn)
                        out.append(m2)
            return out
        return (f"GRAPH ?gv {{ {pt} }}", ev, ps | {"gv"})
    # bind
    pt, pf, ps = gen_pattern(rng, depth - 1)
    es, ef = gen_expr(rng, rng.randint(1, 2))
    _FRESH[0] += 1
    v = f"e{_FRESH[0]}"
    return (f"{{ {pt} BIND({es} AS ?{v}) }}",
            lambda Q, g: ref_extend(pf(Q, g), v, ef), ps | {v})


# --------------------------------------------------------------- harness

def _norm(t):
    if t[0] == "iri":
        return ("iri", t[1])
    n = numv(t)
    if n is not None:
        return ("num", n[0], round(float(n[1]), 6))
    lex, dt, lang = str(t[1]), t[2], t[3]
    if dt == XSD_BOOLEAN:
        return ("bool", lex in ("true", "1"))
    return ("lit", lex, dt, (lang or "").lower())


def _sol_key(sol):
    return frozenset((v, _norm(t)) for v, t in sol.items())


def _quad_rows(quads):
    rows = []
    for g, tris in quads.items():
        for s, p, o in tris:
            if o[0] == "iri":
                rows.append((g, s[1], p[1], o[1], None, None, None, None))
            else:
                _, lex, dt, lang = o
                num = float(lex) if dt == XSD_INTEGER else None
                rows.append((g, s[1], p[1], lex, dt, lang, num, None))
    return rows


@pytest.mark.parametrize("seed,encoded", [(5, False), (10, False),
                                          (15, False), (5, True)])
def test_algebra_fuzz_differential(spark, seed, encoded):
    """Three seeds on the string path; seed 5 repeated through the
    production BIGINT-dictionary path (encoded=True) for parity."""
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.model import local_quads_df
    from graphdb_free_mocha_sa_spark.store import QuadStore

    from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH

    rng = random.Random(seed)

    def rand_triples(n):
        return list({(("iri", rng.choice(NODES)),
                      ("iri", rng.choice(PREDS)),
                      rng.choice(OBJ_TERMS)) for _ in range(n)})

    quads = {DEFAULT_GRAPH: rand_triples(rng.randint(8, 14))}
    for gn in GRAPHS:
        quads[gn] = rand_triples(rng.randint(4, 8))
    eng = Engine(spark, QuadStore(
        spark, local_quads_df(spark, _quad_rows(quads))),
        encoded=encoded)

    for case in range(28):
        txt, f, scope = gen_pattern(rng, rng.randint(1, 3))
        q = f"SELECT * WHERE {{ {txt} }}"
        expected = Counter(_sol_key(m) for m in f(quads, None))
        res = eng.query(q)
        got = Counter()
        for row in res.df.collect():
            sol = {}
            for v in res.variables:
                if row[v] is None:
                    continue
                lex = row[v + "__lex"]
                dt = row[v + "__dt"]
                if dt is None:
                    sol[v] = ("iri", lex)
                else:
                    sol[v] = ("lit", lex, dt, row[v + "__lang"])
            got[_sol_key(sol)] += 1
        assert got == expected, (
            f"seed={seed} case={case}\nquery={q}\n"
            f"missing={expected - got}\nextra={got - expected}")
