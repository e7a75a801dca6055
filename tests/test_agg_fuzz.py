"""Randomized aggregate differential sweep (r7, companion to
tests/test_expr_fuzz.py).

Random groups of terms fed through VALUES → GROUP BY, every aggregate of
§18.5 computed by the engine and compared against a pure-Python
reference implementing the spec semantics:

* COUNT / COUNT DISTINCT / COUNT(*) count bound values / distinct TERMS
  / rows;
* SUM/AVG: op:numeric-add folding with the §17.3 promotion ladder for
  the result datatype (any double → double; AVG of integers → decimal);
  a BOUND non-numeric value poisons the aggregate (type error), unbound
  rows are skipped, the empty / all-unbound group is 0 (xsd:integer);
  DISTINCT is TERM-distinct (5, 5.0 and 5e0 are three values);
* MIN/MAX over numeric groups: value order, engine tie-break (lexical)
  mirrored; mixed-kind groups follow a documented engine convention and
  are not fuzzed;
* GROUP_CONCAT: the engine SORTS its inputs for determinism (documented
  deviation) — the reference joins sorted lexicals; DISTINCT is
  term-distinct;
* SAMPLE: membership in the group's bound values.
"""

from __future__ import annotations

import math
import random
from fractions import Fraction

import pytest

from graphdb_free_mocha_sa_spark.model import (RDF_LANGSTRING, XSD_BOOLEAN,
                                               XSD_DECIMAL, XSD_DOUBLE,
                                               XSD_INTEGER, XSD_STRING)
from tests.test_expr_fuzz import (ERROR, UNDEF, XSD, compare, lit, numv,
                                  num_term, term_sparql)

NUM_POOL = [
    UNDEF,
    lit("5", XSD_INTEGER), lit("-3", XSD_INTEGER), lit("0", XSD_INTEGER),
    lit("7", XSD_INTEGER),
    lit("2.5", XSD_DECIMAL), lit("-0.5", XSD_DECIMAL), lit("5.0", XSD_DECIMAL),
    lit("1.5e0", XSD_DOUBLE), lit("-2.5e0", XSD_DOUBLE),
]

MIXED_POOL = NUM_POOL + [
    ("iri", "urn:x:a"),
    lit("abc"), lit("5"), lit(""),
    lit("chat", lang="en"),
    lit("true", XSD_BOOLEAN),
    lit("xy", "urn:dt:unknown"),
]


def term_key(t):
    if t[0] == "iri":
        return t[1]
    lang = (t[3] or "").lower()
    return f'"{t[1]}"@{lang}' if lang else f'"{t[1]}"^^{t[2]}'


def ref_aggs(values, numeric_only):
    """values: list of term|UNDEF for one group. Returns dict of expected
    results per aggregate alias (term tuples / ERROR semantics as in
    test_expr_fuzz.compare)."""
    bound = [v for v in values if v is not None]
    distinct = {}
    for v in bound:
        distinct.setdefault(term_key(v), v)
    dvals = list(distinct.values())
    out = {
        "c": num_term(0, len(bound)),
        "cd": num_term(0, len(dvals)),
        "call": num_term(0, len(values)),
    }

    def summarize(vals, avg):
        nums = [numv(v) for v in vals]
        if any(n is None for n in nums):
            return ERROR            # bound non-numeric poisons the fold
        if not nums:
            return num_term(0, 0)
        tier = max(n[0] for n in nums)
        if avg:
            tier = max(tier, 1)
        if tier == 2:
            s = math.fsum(float(n[1]) for n in nums)
            return num_term(2, s / len(nums) if avg else s)
        s = sum((Fraction(n[1]) for n in nums), Fraction(0))
        return num_term(tier, s / len(nums) if avg else s)

    out["s"] = summarize(bound, avg=False)
    out["sd"] = summarize(dvals, avg=False)
    out["a"] = summarize(bound, avg=True)
    if numeric_only:
        nums = sorted((numv(v) for v in bound),
                      key=lambda n: (float(n[1]), ))
        if not bound:
            out["mn"] = out["mx"] = ERROR        # unbound result
        else:
            # engine tie-break among equal values: MIN takes the smallest
            # lexical, MAX the largest (min_by/max_by key ends in lex)
            lo = min(float(numv(v)[1]) for v in bound)
            hi = max(float(numv(v)[1]) for v in bound)
            out["mn"] = min((v for v in bound
                             if float(numv(v)[1]) == lo),
                            key=lambda v: str(v[1]))
            out["mx"] = max((v for v in bound
                             if float(numv(v)[1]) == hi),
                            key=lambda v: str(v[1]))
    gc = "|".join(sorted(str(v[1]) for v in bound))
    gcd = "|".join(sorted(str(v[1]) for v in dvals))
    out["gc"] = lit(gc)
    out["gcd"] = lit(gcd)
    return out


def run_sweep(spark, seed, pool, numeric_only):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.model import local_quads_df
    from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH, QuadStore

    rng = random.Random(seed)
    eng = Engine(spark, QuadStore(spark, local_quads_df(
        spark, [(DEFAULT_GRAPH, "urn:x:a", "urn:p", "urn:x:b",
                 None, None, None, None)])), encoded=False)
    groups = {g: [rng.choice(pool) for _ in range(rng.randint(1, 7))]
              for g in range(6)}
    groups[6] = [UNDEF, UNDEF]                    # all-unbound group
    # term-distinct probe: 5 and 5.0 collide as doubles but are two terms
    groups[7] = [lit("5", XSD_INTEGER), lit("5.0", XSD_DECIMAL),
                 lit("5", XSD_INTEGER)]
    if not numeric_only:
        # bound non-numeric poisons SUM/AVG but not COUNT/GROUP_CONCAT
        groups[8] = [lit("5", XSD_INTEGER), lit("abc"), UNDEF]
    rows = " ".join(f"({g} {term_sparql(v)})"
                    for g, vs in groups.items() for v in vs)
    aggs = ['(COUNT(?v) AS ?c)', '(COUNT(DISTINCT ?v) AS ?cd)',
            '(COUNT(*) AS ?call)', '(SUM(?v) AS ?s)',
            '(SUM(DISTINCT ?v) AS ?sd)', '(AVG(?v) AS ?a)',
            '(GROUP_CONCAT(?v; SEPARATOR="|") AS ?gc)',
            '(GROUP_CONCAT(DISTINCT ?v; SEPARATOR="|") AS ?gcd)',
            '(SAMPLE(?v) AS ?sm)']
    names = ["c", "cd", "call", "s", "sd", "a", "gc", "gcd", "sm"]
    if numeric_only:
        aggs += ['(MIN(?v) AS ?mn)', '(MAX(?v) AS ?mx)']
        names += ["mn", "mx"]
    q = (f"SELECT ?g {' '.join(aggs)} WHERE "
         f"{{ VALUES (?g ?v) {{ {rows} }} }} GROUP BY ?g")
    got = {int(r["g__lex"]): r for r in eng.query(q).df.collect()}
    assert set(got) == set(groups)
    for g, vs in groups.items():
        exp = ref_aggs(vs, numeric_only)
        row = got[g]
        for n in names:
            ctx = f"seed={seed} group={g} values={vs} agg={n}"
            if n == "sm":
                bound_keys = {term_key(v) for v in vs if v is not None}
                if row["sm"] is None:
                    assert not bound_keys, ctx
                else:
                    k = (row["sm__lex"] if row["sm__dt"] is None else
                         term_key(("lit", row["sm__lex"], row["sm__dt"],
                                   row["sm__lang"])))
                    assert k in bound_keys, ctx
                continue
            b = (None if row[n] is None else
                 ("lit", row[n + "__lex"], row[n + "__dt"],
                  row[n + "__lang"]))
            compare(b, exp[n], ctx)


@pytest.mark.parametrize("seed", [7, 14])
def test_agg_fuzz_numeric(spark, seed):
    run_sweep(spark, seed, NUM_POOL, numeric_only=True)


@pytest.mark.parametrize("seed", [21, 28])
def test_agg_fuzz_mixed(spark, seed):
    run_sweep(spark, seed, MIXED_POOL, numeric_only=False)
