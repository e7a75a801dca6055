"""Randomized property-path differential sweep (r7, VERDICT r6 item 7).

Random path expressions over the full grammar — `/ ^ | + * ?` plus negated
property sets with forward AND inverse members — evaluated by the engine
over small random graphs and compared against an independent pure-Python
reference implementing SPARQL 1.1 §18.4 path semantics (set semantics via
DISTINCT; zero-length paths bind to the terms of the graph, and to absent
constant endpoints). Three endpoint modes are exercised: (?s, ?o),
(const, ?o), (const, const).

The five hand-written b13 variants pin representative plans; this sweep
covers the combinatorial surface (nested modifiers over alternations,
inverses of sequences, NPS inside closures, ...).
"""

from __future__ import annotations

import random

import pytest

from graphdb_free_mocha_sa_spark.model import local_quads_df
from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH

PREDS = ["urn:p", "urn:q", "urn:r"]
NODES = [f"urn:n{i}" for i in range(10)]


# ------------------------------------------------------------- reference

def _closure(pairs):
    out = set(pairs)
    while True:
        new = {(a, d) for (a, b) in out for (c, d) in out if b == c} - out
        if not new:
            return out
        out |= new


def _ident(terms):
    return {(t, t) for t in terms}


def gen_path(rng: random.Random, depth: int):
    """Random path: returns (sparql_string, eval(edges, terms) -> pairs,
    nullable)."""
    choices = ["link", "neg"] if depth <= 0 else \
        ["link", "link", "neg", "inv", "seq", "alt", "mod"]
    kind = rng.choice(choices)
    if kind == "link":
        p = rng.choice(PREDS)
        return (f"<{p}>",
                lambda E, T, p=p: {(s, o) for s, pp, o in E if pp == p},
                False)
    if kind == "neg":
        n_f = rng.randint(0, 2)
        n_i = rng.randint(0 if n_f else 1, 1)
        fwd = rng.sample(PREDS, n_f)
        inv = rng.sample(PREDS, n_i)
        body = "|".join([f"<{p}>" for p in fwd] + [f"^<{p}>" for p in inv])

        def ev(E, T, fwd=tuple(fwd), inv=tuple(inv)):
            out = set()
            if fwd or not inv:
                out |= {(s, o) for s, pp, o in E if pp not in fwd}
            if inv:
                out |= {(o, s) for s, pp, o in E if pp not in inv}
            return out
        return (f"!({body})", ev, False)
    a_str, a_ev, a_null = gen_path(rng, depth - 1)
    if kind == "inv":
        return (f"^({a_str})",
                lambda E, T: {(o, s) for s, o in a_ev(E, T)}, a_null)
    if kind == "mod":
        mod = rng.choice("+*?")
        if mod == "+":
            return (f"({a_str})+",
                    lambda E, T: _closure(a_ev(E, T)), a_null)
        if mod == "*":
            return (f"({a_str})*",
                    lambda E, T: _closure(a_ev(E, T)) | _ident(T), True)
        return (f"({a_str})?",
                lambda E, T: a_ev(E, T) | _ident(T), True)
    b_str, b_ev, b_null = gen_path(rng, depth - 1)
    if kind == "seq":
        def ev(E, T):
            pa, pb = a_ev(E, T), b_ev(E, T)
            return {(s, o2) for s, o in pa for s2, o2 in pb if o == s2}
        return (f"({a_str}/{b_str})", ev, a_null and b_null)
    return (f"({a_str}|{b_str})",
            lambda E, T: a_ev(E, T) | b_ev(E, T), a_null or b_null)


# ------------------------------------------------------------- harness

def _random_graph(rng: random.Random, n_edges: int):
    return [(rng.choice(NODES), rng.choice(PREDS), rng.choice(NODES))
            for _ in range(n_edges)]


@pytest.mark.parametrize("seed", [101, 202, 303])
def test_path_fuzz_differential(spark, seed):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    rng = random.Random(seed)
    edges = set(_random_graph(rng, rng.randint(12, 28)))
    rows = [(DEFAULT_GRAPH, s, p, o, None, None, None, None)
            for s, p, o in edges]
    eng = Engine(spark, QuadStore(spark, local_quads_df(spark, rows)))
    E = sorted(edges)
    T = sorted({s for s, _, _ in edges} | {o for _, _, o in edges})

    for case in range(67):
        p_str, p_ev, nullable = gen_path(rng, rng.randint(1, 3))
        expect_pairs = p_ev(E, T)
        mode = case % 3
        ctx = f"seed={seed} case={case} path={p_str} mode={mode}"
        if mode == 0:
            q = f"SELECT DISTINCT ?s ?o WHERE {{ ?s {p_str} ?o }}"
            got = {(r.s, r.o) for r in
                   eng.query(q).finalize({"s": "iri", "o": "iri"}).collect()}
            assert got == expect_pairs, ctx
        elif mode == 1:
            # constant subject — sometimes a term absent from the graph,
            # which a nullable path must still self-match (§18.4 probe fix)
            x = rng.choice(NODES + ["urn:absent"])
            expect = {o for s, o in expect_pairs if s == x}
            if nullable:
                expect |= {x}
            q = f"SELECT DISTINCT ?o WHERE {{ <{x}> {p_str} ?o }}"
            got = {r.o for r in
                   eng.query(q).finalize({"o": "iri"}).collect()}
            assert got == expect, ctx
        else:
            x = rng.choice(NODES + ["urn:absent"])
            y = x if rng.random() < 0.3 else rng.choice(NODES)
            expect_hit = (x, y) in expect_pairs or (nullable and x == y)
            q = f"SELECT (1 AS ?one) WHERE {{ <{x}> {p_str} <{y}> }}"
            n = eng.query(q).finalize({"one": "int"}).count()
            assert (n > 0) == expect_hit, ctx
