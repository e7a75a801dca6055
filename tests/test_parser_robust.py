"""Parser robustness fuzz (r7): every malformed input raises a CLEAN
SparqlSyntaxError — never a raw ValueError/IndexError that a caller
(the HTTP endpoint's 400 mapping, the update leg) can't classify.

Mutations: random truncation, single-character corruption, random span
deletion over representative query/update texts exercising the full
grammar (aggregates, EXISTS, paths, collections, subselects, GRAPH
templates, solution modifiers). The two raw-exception escapes this
found (int('') on a garbled LIMIT argument; IndexError consuming past
EOF) are fixed in the parser.
"""

from __future__ import annotations

import random

import pytest

from graphdb_free_mocha_sa_spark.sparql.parser import (SparqlSyntaxError,
                                                       parse_query,
                                                       parse_update)

QUERIES = [
    'SELECT ?x (SUM(?v) AS ?s) WHERE { VALUES (?x ?v) { (1 2) } '
    'FILTER(EXISTS { ?a <urn:p> ?b }) } GROUP BY ?x '
    'HAVING(SUM(?v) > 1) ORDER BY DESC(?s) LIMIT 3 OFFSET 1',
    'PREFIX x: <urn:x:> CONSTRUCT { ?s x:p ?o } WHERE '
    '{ ?s (x:p|^x:q)+ ?o . OPTIONAL { ?o x:r [ x:t ( 1 2.5 "s"@en ) ] } }',
    'SELECT * WHERE { GRAPH ?g { ?s ?p ?o } '
    '{ SELECT (COUNT(*) AS ?c) WHERE { ?a ?b ?c2 } } '
    'BIND(IF(?c > 0, STRLANG("a","en"), <urn:i>) AS ?z) }',
]
UPDATES = [
    'INSERT { GRAPH ?g { ?s <urn:c> ?o } } WHERE '
    '{ ?s <urn:p> ?o BIND(<urn:gx> AS ?g) } ; DELETE WHERE { ?s ?p ?o }',
    'WITH <urn:g> DELETE { ?s ?p ?o } INSERT { ?s ?p "x" } '
    'USING <urn:h> WHERE { ?s ?p ?o FILTER(?o != 1) }',
]


def _mutate(rng, q):
    mode = rng.random()
    if mode < 0.5:
        return q[:rng.randint(0, len(q))]
    if mode < 0.8:
        pos = rng.randint(0, len(q) - 1)
        return q[:pos] + rng.choice('(){}<>"?.;,^|!@#') + q[pos + 1:]
    a, b = sorted(rng.sample(range(len(q)), 2))
    return q[:a] + q[b:]


@pytest.mark.parametrize("seed", [43, 44])
def test_parser_mutations_raise_clean_errors(seed):
    rng = random.Random(seed)
    for q, fn in [(q, parse_query) for q in QUERIES] + \
                 [(u, parse_update) for u in UPDATES]:
        for _ in range(400):
            m = _mutate(rng, q)
            try:
                fn(m)
            except SparqlSyntaxError:
                pass
            except RecursionError:
                pass        # pathological nesting: acceptable hard stop
            # any other exception type fails the test


def test_limit_offset_garbage_is_syntax_error():
    for q in ("SELECT ?x WHERE { ?x ?p ?o } LIMIT",
              "SELECT ?x WHERE { ?x ?p ?o } LIMIT !",
              "SELECT ?x WHERE { ?x ?p ?o } OFFSET ?x",
              "SELECT ?x WHERE { ?x ?p ?o } LIMIT 2.5"):
        with pytest.raises(SparqlSyntaxError):
            parse_query(q)
