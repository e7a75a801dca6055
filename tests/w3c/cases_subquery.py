"""W3C conformance corpus — subquery scope and evaluation order.

Source: SPARQL 1.1 Query §12 (subqueries are evaluated BOTTOM-UP,
independent of outer bindings; only projected vars surface; inner
LIMIT/ORDER BY apply before the outer join) — rdf-tests subquery family
shapes (transcribed).
"""

_DATA = """@prefix : <http://example/> .
:a :p 1 . :a :q 10 .
:b :p 2 . :b :q 20 .
:c :p 3 .
"""

CASES = [
    {
        "name": "subquery-bottom-up-join",
        "source": "rdf-tests subquery sq01 shape (transcribed; §12)",
        "data": _DATA,
        "query": """PREFIX : <http://example/>
            SELECT ?s ?o ?x WHERE {
              ?s :p ?o
              { SELECT ?s ?x WHERE { ?s :q ?x } }
            }""",
        "results": [{"s": "<http://example/a>", "o": '"1"^^xsd:integer',
                     "x": '"10"^^xsd:integer'},
                    {"s": "<http://example/b>", "o": '"2"^^xsd:integer',
                     "x": '"20"^^xsd:integer'}],
    },
    {
        "name": "subquery-projection-hides-vars",
        "source": "spec §12 (only projected vars surface)",
        "data": _DATA,
        "query": """PREFIX : <http://example/>
            SELECT ?s ?x WHERE {
              { SELECT ?s WHERE { ?s :q ?x } }
              OPTIONAL { ?s :nothing ?x }
            }""",
        # inner ?x is NOT projected: the outer ?x is a fresh var, unbound
        "results": [{"s": "<http://example/a>"},
                    {"s": "<http://example/b>"}],
    },
    {
        "name": "subquery-inner-limit-before-join",
        "source": "rdf-tests subquery sq12 shape (transcribed; inner "
                  "ORDER BY+LIMIT applies before the outer join)",
        "data": _DATA,
        "query": """PREFIX : <http://example/>
            SELECT ?s ?o WHERE {
              ?s :p ?o
              { SELECT ?s WHERE { ?s :q ?x } ORDER BY DESC(?x) LIMIT 1 }
            }""",
        # inner yields only :b (highest ?x), outer join restricts to it
        "results": [{"s": "<http://example/b>", "o": '"2"^^xsd:integer'}],
    },
    {
        "name": "subquery-aggregate-then-filter",
        "source": "spec §12 (aggregate subquery feeding outer FILTER)",
        "data": _DATA,
        "query": """PREFIX : <http://example/>
            SELECT ?s WHERE {
              ?s :p ?o
              { SELECT (AVG(?v) AS ?avg) WHERE { ?x :p ?v } }
              FILTER(?o > ?avg)
            }""",
        # avg(1,2,3)=2: only :c (3) exceeds it
        "results": [{"s": "<http://example/c>"}],
    },
]
