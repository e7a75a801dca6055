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


# ---- r9 corpus growth (VERDICT r8 item 3): subquery family 4 -> 12 cases ----

CASES += [
    {
        "name": "subquery-aggregate-join",
        "source": "spec §12 example shape (inner MAX joined to outer)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :p 5 . :b :p 3 .""",
        "query": """PREFIX : <http://example/>
            SELECT ?s ?m WHERE {
              ?s :p ?m
              { SELECT (MAX(?o) AS ?m) WHERE { ?x :p ?o } }
            }""",
        "results": [{"s": "<http://example/a>", "m": '"5"^^xsd:integer'}],
    },
    {
        "name": "subquery-distinct-inner",
        "source": "rdf-tests subquery sq09 shape (transcribed; inner "
                  "DISTINCT applies before the outer join)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :q 1 . :a :q 1 .
            :b :p 2 . :b :q 2 .""",
        "query": """PREFIX : <http://example/>
            SELECT ?s ?v WHERE {
              ?s :p ?o
              { SELECT DISTINCT ?s ?v WHERE { ?s :q ?v } }
            }""",
        "results": [{"s": "<http://example/a>", "v": '"1"^^xsd:integer'},
                    {"s": "<http://example/b>", "v": '"2"^^xsd:integer'}],
    },
    {
        "name": "subquery-no-shared-vars-cross",
        "source": "spec §12 (disjoint domains join as a cross product)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :b :p 2 . :x :q 9 .""",
        "query": """PREFIX : <http://example/>
            SELECT ?s ?t WHERE {
              ?s :p ?o
              { SELECT ?t WHERE { ?t :q 9 } }
            }""",
        "results": [{"s": "<http://example/a>", "t": "<http://example/x>"},
                    {"s": "<http://example/b>", "t": "<http://example/x>"}],
    },
    {
        "name": "subquery-nested-two-levels",
        "source": "rdf-tests subquery sq11 shape (transcribed; nested "
                  "subqueries evaluate inside-out)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :q 10 . :a :r 100 .
            :b :p 2 . :b :q 20 .""",
        "query": """PREFIX : <http://example/>
            SELECT ?s ?z WHERE {
              ?s :p ?o
              { SELECT ?s ?z WHERE {
                  ?s :q ?y
                  { SELECT ?s ?z WHERE { ?s :r ?z } }
              } }
            }""",
        "results": [{"s": "<http://example/a>", "z": '"100"^^xsd:integer'}],
    },
    {
        "name": "subquery-groupby-having-inner",
        "source": "spec §12 + §11 (aggregate subquery with HAVING feeds "
                  "the outer pattern)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :p 2 . :b :p 3 .
            :a :name "A" . :b :name "B" .""",
        "query": """PREFIX : <http://example/>
            SELECT ?n WHERE {
              ?s :name ?n
              { SELECT ?s WHERE { ?s :p ?o }
                GROUP BY ?s HAVING (COUNT(*) > 1) }
            }""",
        "results": [{"n": '"A"'}],
    },
    {
        "name": "subquery-values-inside",
        "source": "spec §10.2 + §12 (VALUES inside a subquery is part of "
                  "its group graph pattern)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :b :p 2 . :c :p 3 .""",
        "query": """PREFIX : <http://example/>
            SELECT ?s ?o WHERE {
              ?s :p ?o
              { SELECT ?s WHERE {
                  VALUES ?s { <http://example/a> <http://example/c> } } }
            }""",
        "results": [{"s": "<http://example/a>", "o": '"1"^^xsd:integer'},
                    {"s": "<http://example/c>", "o": '"3"^^xsd:integer'}],
    },
    {
        "name": "subquery-outer-filter-on-projected",
        "source": "spec §12 (outer FILTER applies to the projected inner "
                  "variable)",
        "data": """@prefix : <http://example/> .
            :a :q 10 . :b :q 20 . :c :q 30 .""",
        "query": """PREFIX : <http://example/>
            SELECT ?s WHERE {
              { SELECT ?s ?x WHERE { ?s :q ?x } }
              FILTER(?x > 15)
            }""",
        "results": [{"s": "<http://example/b>"}, {"s": "<http://example/c>"}],
    },
    {
        "name": "subquery-orderby-limit-offset",
        "source": "rdf-tests subquery sq14 shape (transcribed; inner "
                  "ORDER BY + LIMIT + OFFSET picks the middle slice)",
        "data": """@prefix : <http://example/> .
            :a :q 10 . :b :q 20 . :c :q 30 .""",
        "query": """PREFIX : <http://example/>
            SELECT ?s WHERE {
              { SELECT ?s WHERE { ?s :q ?x } ORDER BY ?x LIMIT 1 OFFSET 1 }
            }""",
        "results": [{"s": "<http://example/b>"}],
    },
]
