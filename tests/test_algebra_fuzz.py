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


def _term_txt(t):
    return f"?{t}" if isinstance(t, str) else term_sparql_t(t)


def _closure_pairs(pairs):
    out = set(pairs)
    while True:
        new = {(a, d) for (a, b) in out for (c, d) in out if b == c} - out
        if not new:
            return out
        out |= new


def gen_path_ms(rng, depth):
    """Random property path with MULTISET semantics (§18.4): link/NPS/
    inverse/sequence/alternative preserve cardinality (PathAlt is an
    algebra union, PathSeq sums over intermediates); only + * ? are the
    set-semantics ALP/ZeroOrOne forms. The set-based evaluator in
    tests/test_paths_fuzz.py is only correct under an outer DISTINCT."""
    kind = rng.choice(["link", "link", "neg"] if depth <= 0 else
                      ["link", "link", "neg", "inv", "seq", "alt", "mod"])
    if kind == "link":
        p = rng.choice(PREDS)
        return (f"<{p}>",
                lambda E, T, p=p: [(s, o) for s, pp, o in E if pp == p])
    if kind == "neg":
        n_f = rng.randint(0, 2)
        n_i = rng.randint(0 if n_f else 1, 1)
        fwd = rng.sample(PREDS, n_f)
        inv = rng.sample(PREDS, n_i)
        body = "|".join([f"<{p}>" for p in fwd] + [f"^<{p}>" for p in inv])

        def ev(E, T, fwd=tuple(fwd), inv=tuple(inv)):
            out = []
            if fwd or not inv:
                out += [(s, o) for s, pp, o in E if pp not in fwd]
            if inv:
                out += [(o, s) for s, pp, o in E if pp not in inv]
            return out
        return (f"!({body})", ev)
    a_str, a_ev = gen_path_ms(rng, depth - 1)
    if kind == "inv":
        return (f"^({a_str})",
                lambda E, T: [(o, s) for s, o in a_ev(E, T)])
    if kind == "mod":
        mod = rng.choice("+*?")
        if mod == "+":
            return (f"({a_str})+",
                    lambda E, T: list(_closure_pairs(a_ev(E, T))))
        if mod == "*":
            return (f"({a_str})*",
                    lambda E, T: list(_closure_pairs(a_ev(E, T))
                                      | {(t, t) for t in T}))
        return (f"({a_str})?",
                lambda E, T: list(set(a_ev(E, T))
                                  | {(t, t) for t in T}))
    b_str, b_ev = gen_path_ms(rng, depth - 1)
    if kind == "seq":
        return (f"({a_str}/{b_str})",
                lambda E, T: [(s, o2) for s, o in a_ev(E, T)
                              for s2, o2 in b_ev(E, T) if o == s2])
    return (f"({a_str}|{b_str})",
            lambda E, T: a_ev(E, T) + b_ev(E, T))


def gen_path_leaf(rng):
    """Triple pattern whose predicate is a random property path (r8:
    paths compose with every algebra combinator — OPTIONAL, EXISTS,
    MINUS hosts). Reference: the multiset §18.4 evaluator above over the
    active graph's edges."""
    p_str, p_ev = gen_path_ms(rng, rng.randint(0, 2))
    s = rng.choice(VARS + [("iri", rng.choice(NODES))])
    o = rng.choice(VARS + OBJ_TERMS)
    txt = f"{_term_txt(s)} {p_str} {_term_txt(o)} ."

    def ev(Q, g, s=s, o=o, p_ev=p_ev):
        tris = ([t for ts in Q.values() for t in ts]
                if g is None else Q.get(g, []))
        E = [(ts, tp[1], to) for ts, tp, to in tris]
        T = {ts for ts, _, _ in tris} | {to for _, _, to in tris}
        # zero-length paths also bind absent CONSTANT endpoints
        for end in (s, o):
            if not isinstance(end, str):
                T.add(end)
        sols = []
        for a, b in p_ev(E, T):
            m = {}
            ok = True
            for pat, val in ((s, a), (o, b)):
                if isinstance(pat, str):
                    if pat in m and m[pat] != val:
                        ok = False
                        break
                    m[pat] = val
                elif pat != val:
                    ok = False
                    break
            if ok:
                sols.append(m)
        return sols

    scope = {x for x in (s, o) if isinstance(x, str)}
    return (txt, ev, scope)


def gen_exists_filter(rng, depth):
    """FILTER (NOT) EXISTS over a BGP / path body, optionally with an
    inner FILTER expression that sees the outer solution (§8.1.4
    substitute semantics). For BGP/path bodies substitution coincides
    with compatibility on the shared positional vars; expression-position
    outer vars are visible via the merged solution."""
    ht, hf, hs = gen_pattern(rng, depth - 1)
    neg = rng.random() < 0.5
    word = "NOT EXISTS" if neg else "EXISTS"

    if rng.random() < 0.3:
        # MINUS body: under §8.1.4 substitution the outer vars are
        # CONSTANTS on both sides — compat-filter each side by μ, strip
        # μ's vars (they leave the domains), then plain §8.3 MINUS
        lt_, lf_, ls_ = gen_bgp(rng)
        rt_, rf_, rs_ = gen_bgp(rng)

        def ev(Q, g, hf=hf, lf_=lf_, rf_=rf_, neg=neg):
            out = []
            for m in hf(Q, g):
                Ls = [{k: v for k, v in n.items() if k not in m}
                      for n in lf_(Q, g) if _compatible(m, n)]
                Rs = [{k: v for k, v in n.items() if k not in m}
                      for n in rf_(Q, g) if _compatible(m, n)]
                hit = bool(ref_minus(Ls, Rs))
                if hit != neg:
                    out.append(m)
            return out

        return (f"{{ {ht} FILTER {word} {{ {lt_} MINUS {{ {rt_} }} }} }}",
                ev, hs)

    bt, bf, bs = gen_path_leaf(rng) if rng.random() < 0.4 else gen_bgp(rng)
    inner = None
    if rng.random() < 0.5:
        es, ef = gen_expr(rng, rng.randint(1, 2))
        inner = (es, ef)
        bt = f"{bt} FILTER({es})"

    def ev(Q, g, hf=hf, bf=bf, inner=inner, neg=neg):
        out = []
        for m in hf(Q, g):
            hit = False
            for n in bf(Q, g):
                if not _compatible(m, n):
                    continue
                if inner is not None:
                    merged = dict(n)
                    merged.update(m)
                    if ebv(inner[1](merged)) is not True:
                        continue
                hit = True
                break
            if hit != neg:
                out.append(m)
        return out

    return (f"{{ {ht} FILTER {word} {{ {bt} }} }}", ev, hs)


def gen_subselect(rng, depth):
    """{ SELECT ?g (AGG(...) AS ?a) WHERE { P } GROUP BY ?g } — grouped
    aggregation as a sub-pattern leaf joining back into the host tree
    (r8: subquery × aggregate × EXISTS composition)."""
    pt, pf, ps = gen_pattern(rng, depth - 1)
    base = sorted(v for v in ps if v in VARS or v == "gv")
    if not base:
        return gen_pattern(rng, 0)
    gv = rng.choice(base)
    _FRESH[0] += 1
    av_out = f"e{_FRESH[0]}"
    pool = [v for v in base if v != gv]
    av = rng.choice(pool) if pool and rng.random() < 0.8 else None
    kind = rng.choice(["count_star"] if av is None else
                      ["count", "count_distinct", "sum"])
    agg_txt = {"count_star": "COUNT(*)",
               "count": f"COUNT(?{av})",
               "count_distinct": f"COUNT(DISTINCT ?{av})",
               "sum": f"SUM(?{av})"}[kind]

    def ev(Q, g, pf=pf, gv=gv, av=av, kind=kind):
        groups: dict = {}
        for m in pf(Q, g):
            k = _norm(m[gv]) if gv in m else None
            groups.setdefault(k, (m.get(gv), []))[1].append(m)
        out = []
        for k, (gterm, ms) in groups.items():
            row = {} if k is None else {gv: gterm}
            if kind == "count_star":
                row[av_out] = lit(str(len(ms)), XSD_INTEGER)
            elif kind == "count":
                n = sum(1 for m in ms if av in m)
                row[av_out] = lit(str(n), XSD_INTEGER)
            elif kind == "count_distinct":
                n = len({_norm(m[av]) for m in ms if av in m})
                row[av_out] = lit(str(n), XSD_INTEGER)
            else:                                   # sum
                vals, err = [], False
                for m in ms:
                    if av not in m:
                        continue
                    nv = numv(m[av])
                    if nv is None:
                        err = True
                        break
                    vals.append(nv)
                if not err:
                    # generated numerics are all xsd:integer
                    row[av_out] = lit(str(int(sum(v for _, v in vals))),
                                      XSD_INTEGER)
            out.append(row)
        return out

    txt = (f"{{ SELECT ?{gv} ({agg_txt} AS ?{av_out}) "
           f"WHERE {{ {pt} }} GROUP BY ?{gv} }}")
    return (txt, ev, {gv, av_out})


def gen_pattern(rng, depth):
    if depth <= 0:
        r = rng.random()
        if r < 0.2:
            return gen_values(rng)
        if r < 0.4:
            return gen_path_leaf(rng)
        return gen_bgp(rng)
    kind = rng.choice(["join", "optional", "union", "minus",
                       "filter", "bind", "graphc", "exists", "subsel",
                       "leaf", "leaf"])
    if kind == "leaf":
        return gen_pattern(rng, 0)
    if kind == "exists":
        return gen_exists_filter(rng, depth)
    if kind == "subsel":
        return gen_subselect(rng, depth)
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

    for case in range(50):
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
