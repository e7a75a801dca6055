"""Randomized UPDATE-sequence differential sweep (r8).

The SPARQL surface has four fuzzers (expressions, aggregates, algebra
composition, property paths); the UPDATE surface (B30-B36) only had
hand-written cases. This sweep drives random sequences of the
set-algebra-exact update forms — INSERT DATA, DELETE DATA, CLEAR
GRAPH, COPY/MOVE/ADD GRAPH — through the engine and compares the FULL
store contents after every operation against a trivial Python
set-of-quads reference implementing SPARQL 1.1 Update §3.1.1/3.1.2/
3.2.2/3.2.5-7 directly.

Graph-pattern-driven forms (DELETE/INSERT WHERE) are exercised by the
oracle-backed b32 entry and the W3C update family instead — their WHERE
semantics route through the (separately fuzzed) query engine.
"""

from __future__ import annotations

import random

import pytest

GRAPHS = ["urn:g1", "urn:g2", "urn:g3"]
SUBJ = [f"urn:s{i}" for i in range(4)]
PRED = ["urn:p", "urn:q"]
OBJ = [f"urn:o{i}" for i in range(3)]


def _triples_sparql(triples):
    return " . ".join(f"<{s}> <{p}> <{o}>" for s, p, o in triples)


def _rand_triples(rng, n):
    return {(rng.choice(SUBJ), rng.choice(PRED), rng.choice(OBJ))
            for _ in range(n)}


@pytest.mark.parametrize("seed", [11, 22, 33])
def test_update_fuzz_differential(spark, seed):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH, QuadStore

    rng = random.Random(seed)
    eng = Engine(spark, QuadStore(spark))
    ref: set[tuple[str, str, str, str]] = set()   # (g, s, p, o)

    def graph_of(g):
        return {t for t in ref if t[0] == g}

    history = []
    for step in range(30):
        kind = rng.choice(["insert", "insert", "delete", "clear",
                           "copy", "move", "add"])
        if kind == "insert":
            g = rng.choice(GRAPHS + [None])
            tris = _rand_triples(rng, rng.randint(1, 4))
            body = _triples_sparql(tris)
            if g is None:
                upd = f"INSERT DATA {{ {body} }}"
                ref |= {(DEFAULT_GRAPH, s, p, o) for s, p, o in tris}
            else:
                upd = f"INSERT DATA {{ GRAPH <{g}> {{ {body} }} }}"
                ref |= {(g, s, p, o) for s, p, o in tris}
        elif kind == "delete":
            g = rng.choice(GRAPHS + [None])
            # half the time aim at triples that actually exist
            pool = [t for t in ref
                    if t[0] == (g or DEFAULT_GRAPH)]
            if pool and rng.random() < 0.5:
                tris = {t[1:] for t in rng.sample(pool,
                                                  min(2, len(pool)))}
            else:
                tris = _rand_triples(rng, rng.randint(1, 3))
            body = _triples_sparql(tris)
            if g is None:
                upd = f"DELETE DATA {{ {body} }}"
                ref -= {(DEFAULT_GRAPH, s, p, o) for s, p, o in tris}
            else:
                upd = f"DELETE DATA {{ GRAPH <{g}> {{ {body} }} }}"
                ref -= {(g, s, p, o) for s, p, o in tris}
        elif kind == "clear":
            g = rng.choice(GRAPHS)
            upd = f"CLEAR GRAPH <{g}>"
            ref -= graph_of(g)
        else:
            src, dst = rng.sample(GRAPHS, 2)
            upd = f"{kind.upper()} GRAPH <{src}> TO GRAPH <{dst}>"
            moved = {(dst,) + t[1:] for t in graph_of(src)}
            if kind in ("copy", "move"):
                ref -= graph_of(dst)          # target replaced
            ref |= moved
            if kind == "move":
                ref -= graph_of(src)
        history.append(upd)
        eng.update(upd)

        got = {(r["g"], r["s"], r["p"], r["o_lex"])
               for r in eng.store.df.select("g", "s", "p", "o_lex")
               .collect()}
        assert got == ref, (
            f"seed={seed} step={step}\nop={upd}\n"
            f"history={history}\nmissing={ref - got}\nextra={got - ref}")
