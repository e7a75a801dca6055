"""Randomized CONSTRUCT differential fuzzer (r9).

The r9 ADVICE high defect (small-template dedup skip) and this round's
§16.2 instantiation-validity defect (literal-bound vars emitted in
subject/predicate position) both lived in the CONSTRUCT template
instantiation — the one query form the randomized differential method
had not yet covered. This sweep reuses the algebra fuzzer's random
pattern trees (tests/test_algebra_fuzz.py) as WHERE clauses, attaches a
random template (vars that may bind to IRIs or literals, IRI/literal
constants, occasionally a template bnode), and compares against a direct
Python implementation of §16.2:

* one instantiation per solution in the WHERE multiset,
* a triple with an unbound variable is skipped,
* a literal in subject position / a literal or bnode in predicate
  position skips that triple,
* template bnodes are FRESH per solution (coreferent across the
  template's triples of one solution),
* the result graph is a SET of triples (dedup after instantiation),

matched under bnode bijection with the W3C harness's backtracking
matcher. The same instantiation-validity rules are pinned for the
UPDATE template path (§3.1.3 shares them) in closed-form cases below.
"""

from __future__ import annotations

import random

import pytest

from graphdb_free_mocha_sa_spark.model import XSD_STRING
from tests.test_algebra_fuzz import (NODES, OBJ_TERMS, PREDS, _quad_rows,
                                     gen_pattern, term_sparql_t)
from tests.w3c.harness import rows_match

TEMPLATE_CONSTS = [("iri", n) for n in NODES[:2]] + OBJ_TERMS[3:6]


def gen_template(rng, scope):
    """Random template: list of (s, p, o) where each slot is a var name
    from scope, a constant term, or (rarely, s/o only) a bnode label."""
    svars = sorted(scope)
    tps = []
    for _ in range(rng.randint(1, 3)):
        def slot(pos):
            r = rng.random()
            if svars and r < 0.55:
                return rng.choice(svars)
            if r < 0.65 and pos != "p":
                return ("bnode", f"b{rng.randint(0, 1)}")
            if pos == "p":
                return ("iri", rng.choice(PREDS))
            return rng.choice(TEMPLATE_CONSTS)
        tps.append((slot("s"), slot("p"), slot("o")))
    return tps


def template_sparql(tps):
    def t_txt(t):
        if isinstance(t, str):
            return f"?{t}"
        if t[0] == "bnode":
            return f"_:{t[1]}"
        return term_sparql_t(t)
    return " . ".join(f"{t_txt(s)} {t_txt(p)} {t_txt(o)}"
                      for s, p, o in tps)


def ref_construct(tps, sols):
    """§16.2 reference: returns a SET of triples; bnode labels are
    ('bnode', '<label>#<solution-index>')."""
    triples = set()
    for i, m in enumerate(sols):
        for s, p, o in tps:
            def inst(t):
                if isinstance(t, str):
                    return m.get(t)
                if t[0] == "bnode":
                    return ("bnode", f"{t[1]}#{i}")
                return t
            sv, pv, ov = inst(s), inst(p), inst(o)
            if sv is None or pv is None or ov is None:
                continue                    # unbound var -> no triple
            if sv[0] == "lit":
                continue                    # literal subject -> no triple
            if pv[0] != "iri":
                continue                    # predicate must be an IRI
            triples.add((sv, pv, ov))
    return triples


def _norm_term(t):
    """Normalize to the harness term format; engine bnodes keep their
    engine-assigned label (the bijection matcher absorbs naming)."""
    if t[0] == "lit":
        lex, dt, lang = t[1], t[2], t[3]
        return ("lit", str(lex), dt or XSD_STRING, lang)
    return t


def engine_triples(df):
    out = []
    for r in df.collect():
        def conv(lex, dt, lang):
            if dt is not None:
                return ("lit", lex, dt, lang)
            if lex.startswith("_:"):
                return ("bnode", lex[2:])
            return ("iri", lex)
        out.append((conv(r["s"], None, None) if not r["s"].startswith("_:")
                    else ("bnode", r["s"][2:]),
                    ("iri", r["p"]),
                    conv(r["o_lex"], r["o_dt"], r["o_lang"])))
    return out


@pytest.mark.parametrize("seed,encoded", [(21, False), (22, False),
                                          (21, True)])
def test_construct_fuzz_differential(spark, seed, encoded):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.model import local_quads_df
    from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH, QuadStore
    from tests.test_algebra_fuzz import GRAPHS

    rng = random.Random(seed)

    def rand_triples(n):
        return list({(("iri", rng.choice(NODES)),
                      ("iri", rng.choice(PREDS)),
                      rng.choice(OBJ_TERMS)) for _ in range(n)})

    quads = {DEFAULT_GRAPH: rand_triples(rng.randint(8, 14))}
    for gn in GRAPHS:
        quads[gn] = rand_triples(rng.randint(4, 8))
    eng = Engine(spark, QuadStore(
        spark, local_quads_df(spark, _quad_rows(quads))), encoded=encoded)

    n_cases = 12 if encoded else 25
    for case in range(n_cases):
        txt, f, scope = gen_pattern(rng, rng.randint(0, 2))
        tps = gen_template(rng, scope)
        q = (f"CONSTRUCT {{ {template_sparql(tps)} }} "
             f"WHERE {{ {txt} }}")
        sols = [{v: t for v, t in m.items()} for m in f(quads, None)]
        exp = ref_construct(tps, [
            {v: (t if t[0] == "iri" else ("lit",) + tuple(t[1:]))
             for v, t in m.items()} for m in sols])
        got = engine_triples(eng.query(q))
        # engine result is a SET (RDF graph semantics)
        assert len(got) == len(set(got)), \
            f"seed={seed} case={case} duplicate triples\nquery={q}"
        exp_rows = [{"s": _norm_term(s), "p": p, "o": _norm_term(o)}
                    for s, p, o in sorted(exp, key=repr)]
        got_rows = [{"s": _norm_term(s), "p": p, "o": _norm_term(o)}
                    for s, p, o in got]
        # lax_num: BIND-computed numerics may differ in lexical form /
        # numeric-family datatype between the reference and the engine
        assert rows_match(exp_rows, got_rows, lax_num=True), (
            f"seed={seed} case={case}\nquery={q}\n"
            f"expected={sorted(exp, key=repr)}\ngot={sorted(got, key=repr)}")


# ---------------------------------------------------------- closed forms
# (fail on the pre-fix tree: literal/bnode leaked into s/p positions)

def _eng(spark, data):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng = Engine(spark, QuadStore(spark))
    eng.update(f"INSERT DATA {{ {data} }}")
    return eng


def test_construct_skips_literal_subject(spark):
    eng = _eng(spark, '<urn:a> <urn:p> "litval" . '
                      '<urn:a> <urn:p> <urn:iriobj> .')
    rows = eng.query("CONSTRUCT { ?o <urn:q> <urn:c> } "
                     "WHERE { <urn:a> <urn:p> ?o }").collect()
    assert [r["s"] for r in rows] == ["urn:iriobj"]


def test_construct_skips_literal_and_bnode_predicate(spark):
    eng = _eng(spark, '<urn:a> <urn:p> "litval" . '
                      '<urn:a> <urn:p> <urn:iriobj> . '
                      '<urn:a> <urn:p> _:bn .')
    rows = eng.query("CONSTRUCT { <urn:x> ?o <urn:c> } "
                     "WHERE { <urn:a> <urn:p> ?o }").collect()
    assert [r["p"] for r in rows] == ["urn:iriobj"]


def test_construct_bnode_subject_allowed(spark):
    eng = _eng(spark, '<urn:a> <urn:p> _:bn .')
    rows = eng.query("CONSTRUCT { ?o <urn:q> <urn:c> } "
                     "WHERE { <urn:a> <urn:p> ?o }").collect()
    assert len(rows) == 1 and rows[0]["s"].startswith("_:")


def test_insert_template_skips_invalid_positions(spark):
    eng = _eng(spark, '<urn:a> <urn:p> "litval" . '
                      '<urn:a> <urn:p> <urn:iriobj> .')
    eng.update("""INSERT { ?o <urn:q> <urn:c> . <urn:x> ?o <urn:c> }
                  WHERE { <urn:a> <urn:p> ?o }""")
    got = sorted((r["s"], r["p"]) for r in eng.store.df.filter(
        "o_lex = 'urn:c'").collect())
    assert got == [("urn:iriobj", "urn:q"), ("urn:x", "urn:iriobj")]


def test_insert_template_skips_unbound_predicate_var(spark):
    eng = _eng(spark, '<urn:a> <urn:p> <urn:b> .')
    eng.update("""INSERT { <urn:x> ?u <urn:c> . <urn:x> <urn:q> ?v }
                  WHERE { <urn:a> <urn:p> <urn:b>
                          OPTIONAL { <urn:none> <urn:none> ?u }
                          OPTIONAL { <urn:none> <urn:none> ?v } }""")
    assert eng.store.df.filter("s = 'urn:x'").count() == 0


def test_insert_graph_var_must_be_iri(spark):
    eng = _eng(spark, '<urn:a> <urn:p> "litval" . '
                      '<urn:a> <urn:p> <urn:g1> .')
    eng.update("""INSERT { GRAPH ?o { <urn:s> <urn:q> <urn:c> } }
                  WHERE { <urn:a> <urn:p> ?o }""")
    got = [r["g"] for r in eng.store.df.filter("s = 'urn:s'").collect()]
    assert got == ["urn:g1"]
