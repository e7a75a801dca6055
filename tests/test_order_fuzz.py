"""Randomized ORDER BY / solution-modifier differential sweep (r8).

The expression/aggregate/algebra fuzzers cover WHERE-clause semantics;
this sweep covers the solution-modifier pipeline (§15): ORDER BY over
the engine's documented total term order (term-kind rank, then the
num/ts/lex/key family — ``TCol.order_keys``), composed with DISTINCT,
LIMIT and OFFSET, over a deliberately heterogeneous term pool (IRIs,
integers incl. derived types and invalid lexicals, decimals, doubles
incl. INF/-INF/NaN/-0.0, booleans, strings, language-tagged strings,
dateTimes across timezones incl. equal instants with different
lexicals, xsd:date, invalid temporal lexicals, and OPTIONAL-produced
unbound values).

The reference is a pure-Python comparator implementing the same
documented order (spec §15.1 kind ranks; within literals the engine's
value-shadow family with nulls-first, exactly as ``order_keys`` emits
it), evaluated over pattern shapes small enough to re-implement here
directly. Every projected variable appears in ORDER BY, so the row
sequence is deterministic up to fully-identical rows and the ORDERED
lists must match exactly — a much stronger check than the multiset
compares in the other fuzzers. Engine and reference share only the
numeric-lexical validator (model.valid_num_lex, the value-space
definition already differentially tested by the expression fuzzer);
the sort machinery under test (order_keys columns, nulls-first
composition, Spark NaN/-0.0 sort normalization, encoded-mode decode
order, offset/limit placement) is disjoint from the reference code.
"""

from __future__ import annotations

import datetime as _dt
import functools
import math
import random

import pytest

from graphdb_free_mocha_sa_spark.model import (NUMERIC_DTS, XSD_BOOLEAN,
                                               XSD_DATE, XSD_DATETIME,
                                               XSD_DECIMAL, XSD_DOUBLE,
                                               XSD_INTEGER, XSD_STRING,
                                               valid_num_lex)

XSD = "http://www.w3.org/2001/XMLSchema#"
_UTC = _dt.timezone.utc

# term tuples: ("iri", value) | ("lit", lex, dt_or_None, lang_or_None)
# dt None == plain literal (xsd:string); lang implies rdf:langString.
POOL = [
    ("iri", "urn:n0"), ("iri", "urn:n1"), ("iri", "urn:zz"),
    # integers: plain, signed, leading zeros, derived types, invalid
    ("lit", "5", XSD_INTEGER, None), ("lit", "+3", XSD_INTEGER, None),
    ("lit", "-07", XSD_INTEGER, None), ("lit", "042", XSD_INTEGER, None),
    ("lit", "12", XSD + "byte", None), ("lit", "100", XSD + "long", None),
    ("lit", "0", XSD + "unsignedInt", None),
    ("lit", "abc", XSD_INTEGER, None), ("lit", "1e5", XSD_INTEGER, None),
    # decimals incl. edge lexical forms and an invalid one
    ("lit", "2.50", XSD_DECIMAL, None), ("lit", "-0.5", XSD_DECIMAL, None),
    ("lit", ".5", XSD_DECIMAL, None), ("lit", "3.", XSD_DECIMAL, None),
    ("lit", "1.2.3", XSD_DECIMAL, None),
    # doubles incl. IEEE specials and signed zero
    ("lit", "1e2", XSD_DOUBLE, None), ("lit", "-1.5E-1", XSD_DOUBLE, None),
    ("lit", "INF", XSD_DOUBLE, None), ("lit", "-INF", XSD_DOUBLE, None),
    ("lit", "NaN", XSD_DOUBLE, None),
    ("lit", "0.0", XSD_DOUBLE, None), ("lit", "-0.0", XSD_DOUBLE, None),
    # booleans (ordered by lexical form: "false" < "true"; "1" is valid)
    ("lit", "true", XSD_BOOLEAN, None), ("lit", "false", XSD_BOOLEAN, None),
    ("lit", "1", XSD_BOOLEAN, None),
    # strings: plain and typed, incl. one with a numeric lexical
    ("lit", "", None, None), ("lit", "a", None, None),
    ("lit", "B", None, None), ("lit", "aa", XSD_STRING, None),
    ("lit", "10", None, None),
    # language-tagged
    ("lit", "chat", None, "en"), ("lit", "chat", None, "EN"),
    ("lit", "a", None, "fr"),
    # dateTimes: equal instants with different lexicals, fractional
    # seconds, pre-epoch, and an invalid calendar date
    ("lit", "2001-01-01T14:45:13Z", XSD_DATETIME, None),
    ("lit", "2001-01-01T14:45:13", XSD_DATETIME, None),
    ("lit", "2001-01-01T09:45:13-05:00", XSD_DATETIME, None),
    ("lit", "1999-12-31T23:59:59Z", XSD_DATETIME, None),
    ("lit", "2001-01-01T14:45:13.5Z", XSD_DATETIME, None),
    ("lit", "2001-01-01T00:00:00Z", XSD_DATETIME, None),
    ("lit", "2001-02-30T00:00:00Z", XSD_DATETIME, None),
    ("lit", "not-a-date", XSD_DATETIME, None),
    # dates (midnight ts shadow; one equal to a dateTime instant above)
    ("lit", "2001-01-01", XSD_DATE, None),
    ("lit", "1999-12-31", XSD_DATE, None),
]

SUBJ = [f"urn:s{i}" for i in range(6)]


# ------------------------------------------------------------- reference

def _ref_parts(term):
    """(kind, num, ts, lex, key) mirroring TCol.order_keys columns."""
    if term is None:
        return (0, None, None, None, None)
    if term[0] == "iri":
        return (2, None, None, term[1], term[1])
    _, lex, dt, lang = term
    dt_eff = dt or XSD_STRING
    key = f'"{lex}"@{lang}' if lang else f'"{lex}"^^{dt_eff}'
    num = valid_num_lex(dt_eff, lex) if dt_eff in NUMERIC_DTS else None
    ts = None
    if dt_eff == XSD_DATETIME:
        try:
            t = _dt.datetime.fromisoformat(lex)
            ts = t if t.tzinfo else t.replace(tzinfo=_UTC)
        except ValueError:
            ts = None
    elif dt_eff == XSD_DATE:
        try:
            d = _dt.date.fromisoformat(lex[:10])
            ts = _dt.datetime(d.year, d.month, d.day, tzinfo=_UTC)
        except ValueError:
            ts = None
    return (3, num, ts, lex, key)


def _cmp_scalar(a, b):
    """One order_keys column, ascending nulls-first; Spark float-sort
    semantics (NaN greatest and self-equal, -0.0 == 0.0)."""
    if a is None and b is None:
        return 0
    if a is None:
        return -1
    if b is None:
        return 1
    if isinstance(a, float):
        an, bn = math.isnan(a), math.isnan(b)
        if an and bn:
            return 0
        if an:
            return 1
        if bn:
            return -1
    return -1 if a < b else (1 if a > b else 0)


def _cmp_terms_asc(ta, tb):
    for x, y in zip(_ref_parts(ta), _ref_parts(tb)):
        c = _cmp_scalar(x, y)
        if c:
            return c
    return 0


def ref_sort(sols, conditions):
    """conditions: list of (var, ascending, use_str)."""
    def keyed(sol):
        out = []
        for var, _asc, use_str in conditions:
            t = sol.get(var)
            if use_str:
                t = _ref_str(t)
            out.append(t)
        return out

    def cmp(sa, sb):
        ka, kb = keyed(sa), keyed(sb)
        for (var, asc, _u), ta, tb in zip(conditions,
                                          ka, kb):
            c = _cmp_terms_asc(ta, tb)
            if c:
                return c if asc else -c
        return 0

    return sorted(sols, key=functools.cmp_to_key(cmp))


def _ref_str(term):
    """STR(?v): simple literal of the lexical form / IRI string; an
    unbound argument is a type error -> sorts as unbound (kind 0)."""
    if term is None:
        return None
    if term[0] == "iri":
        return ("lit", term[1], XSD_STRING, None)
    return ("lit", term[1], XSD_STRING, None)


# --------------------------------------------------------- SPARQL syntax

def _term_sparql(t):
    if t[0] == "iri":
        return f"<{t[1]}>"
    _, lex, dt, lang = t
    if lang:
        return f'"{lex}"@{lang}'
    if dt is None or dt == XSD_STRING:
        return f'"{lex}"' if dt is None else f'"{lex}"^^<{XSD_STRING}>'
    return f'"{lex}"^^<{dt}>'


def _term_id(t):
    """Identity key for DISTINCT and for comparing engine rows."""
    if t is None:
        return None
    if t[0] == "iri":
        return t[1]
    _, lex, dt, lang = t
    if lang:
        return f'"{lex}"@{lang}'
    return f'"{lex}"^^{dt or XSD_STRING}'


def _row_terms(row, variables):
    out = {}
    for v in variables:
        if row[v] is None:
            continue
        lex, dt, lang = row[v + "__lex"], row[v + "__dt"], row[v + "__lang"]
        if dt is None:
            out[v] = ("iri", lex)
        else:
            out[v] = ("lit", lex, dt, lang)
    return out


# ---------------------------------------------------------------- driver

@pytest.mark.parametrize("seed,encoded", [(3, False), (7, False), (3, True)])
def test_order_fuzz_differential(spark, seed, encoded):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore

    rng = random.Random(seed)
    eng = Engine(spark, QuadStore(spark), encoded=encoded)

    triples = set()
    for s in SUBJ:
        for _ in range(rng.randint(0, 2)):
            triples.add((s, "urn:p", rng.choice(POOL)))
        if rng.random() < 0.6:
            triples.add((s, "urn:q", rng.choice(POOL)))
        for _ in range(rng.randint(0, 2)):
            triples.add((s, "urn:r", rng.choice(POOL)))
    eng.update("INSERT DATA { " + " . ".join(
        f"<{s}> <{p}> {_term_sparql(o)}" for s, p, o in triples) + " }")

    plist = sorted(triples)

    for case in range(40):
        shape = rng.randrange(3)
        if shape == 0:
            body = "?s <urn:p> ?v"
            variables = ["s", "v"]
            sols = [{"s": ("iri", s), "v": o}
                    for s, p, o in plist if p == "urn:p"]
        elif shape == 1:
            body = "?s <urn:p> ?v OPTIONAL { ?s <urn:q> ?w }"
            variables = ["s", "v", "w"]
            sols = []
            for s, p, o in plist:
                if p != "urn:p":
                    continue
                ws = [o2 for s2, p2, o2 in plist
                      if s2 == s and p2 == "urn:q"]
                if ws:
                    sols += [{"s": ("iri", s), "v": o, "w": w} for w in ws]
                else:
                    sols.append({"s": ("iri", s), "v": o})
        else:
            body = "{ ?s <urn:p> ?v } UNION { ?s <urn:r> ?v }"
            variables = ["s", "v"]
            sols = [{"s": ("iri", s), "v": o}
                    for s, p, o in plist if p in ("urn:p", "urn:r")]

        distinct = rng.random() < 0.4
        if distinct:
            seen, dd = set(), []
            for m in sols:
                k = tuple(_term_id(m.get(v)) for v in variables)
                if k not in seen:
                    seen.add(k)
                    dd.append(m)
            sols = dd

        conditions = []
        order_txt = []
        for v in rng.sample(variables, len(variables)):
            asc = rng.random() < 0.5
            use_str = v == "v" and rng.random() < 0.3
            conditions.append((v, asc, use_str))
            inner = f"STR(?{v})" if use_str else f"?{v}"
            order_txt.append(f"{'ASC' if asc else 'DESC'}({inner})")

        expected = ref_sort(sols, conditions)

        limit = rng.choice([None, None, rng.randint(1, 8)])
        offset = rng.choice([None, None, rng.randint(1, 5)])
        if offset is not None:
            expected = expected[offset:]
        if limit is not None:
            expected = expected[:limit]

        q = (f"SELECT {'DISTINCT ' if distinct else ''}"
             + " ".join(f"?{v}" for v in variables)
             + " WHERE { " + body + " } ORDER BY " + " ".join(order_txt))
        if limit is not None:
            q += f" LIMIT {limit}"
        if offset is not None:
            q += f" OFFSET {offset}"

        res = eng.query(q)
        got = [_row_terms(r, variables) for r in res.df.collect()]

        exp_keys = [tuple(_term_id(m.get(v)) for v in variables)
                    for m in expected]
        got_keys = [tuple(_term_id(m.get(v)) for v in variables)
                    for m in got]
        assert got_keys == exp_keys, (
            f"seed={seed} case={case} encoded={encoded}\nquery={q}\n"
            f"expected={exp_keys[:12]}\ngot={got_keys[:12]}")
