"""W3C conformance corpus — grouping edge semantics.

Source: SPARQL 1.1 Query §18.5.1 Group/Aggregation definitions
(rdf-tests grouping family shape, transcribed): an UNBOUND group key
forms its own group; grouping by a term groups identical terms;
COUNT(?v) skips unbound.
"""

CASES = [
    {
        "name": "group-by-unbound-key",
        "source": "rdf-tests grouping/group05 shape (transcribed; §18.5)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :q 5 .
            :b :p 2 .
            :c :p 3 .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?k (COUNT(?o) AS ?c) WHERE {
              ?s :p ?o OPTIONAL { ?s :q ?k }
            } GROUP BY ?k""",
        "results": [{"k": '"5"^^xsd:integer', "c": '"1"^^xsd:integer'},
                    {"c": '"2"^^xsd:integer'}],
    },
    {
        "name": "count-var-skips-unbound",
        "source": "spec §18.5.1 (Count(M) over bound values)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :q 5 .
            :b :p 2 .
        """,
        "query": """PREFIX : <http://example/>
            SELECT (COUNT(?k) AS ?c) (COUNT(*) AS ?n) WHERE {
              ?s :p ?o OPTIONAL { ?s :q ?k }
            }""",
        "results": [{"c": '"1"^^xsd:integer', "n": '"2"^^xsd:integer'}],
    },
    {
        "name": "group-by-iri-key",
        "source": "rdf-tests grouping/group01 shape (transcribed)",
        "data": """@prefix : <http://example/> .
            :a :link :x . :b :link :x . :c :link :y .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?t (COUNT(?s) AS ?c) WHERE { ?s :link ?t }
            GROUP BY ?t""",
        "results": [{"t": "<http://example/x>", "c": '"2"^^xsd:integer'},
                    {"t": "<http://example/y>", "c": '"1"^^xsd:integer'}],
    },
    {
        "name": "having-filters-groups",
        "source": "rdf-tests grouping shape (transcribed; §11.3)",
        "data": """@prefix : <http://example/> .
            :a :link :x . :b :link :x . :c :link :y .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?t WHERE { ?s :link ?t }
            GROUP BY ?t HAVING (COUNT(?s) > 1)""",
        "results": [{"t": "<http://example/x>"}],
    },
]


# ---- r9 corpus growth (VERDICT r8 item 3): grouping family 4 -> 14 cases ----

_GD = """@prefix : <http://example/> .
:org1 :affiliates :auth1, :auth2 .
:auth1 :writesBook :book1 . :book1 :price 9 .
:auth2 :writesBook :book3 . :book3 :price 7 .
:org2 :affiliates :auth3 .
:auth3 :writesBook :book4 . :book4 :price 7 .
"""

CASES += [
    {
        "name": "sum-per-group-having",
        "source": "spec §11 intro example (total book price per org, "
                  "HAVING SUM > 10)",
        "data": _GD,
        "query": """PREFIX : <http://example/>
            SELECT (SUM(?lprice) AS ?totalPrice) WHERE {
              ?org :affiliates ?auth .
              ?auth :writesBook ?book .
              ?book :price ?lprice .
            } GROUP BY ?org HAVING (SUM(?lprice) > 10)""",
        "results": [{"totalPrice": '"16"^^xsd:integer'}],
    },
    {
        "name": "avg-group",
        "source": "spec §18.5.1.4 (Avg), rdf-tests agg-avg-02 shape",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :p 3 . :b :p 10 .""",
        "query": """PREFIX : <http://example/>
            SELECT ?s (AVG(?o) AS ?avg) WHERE { ?s :p ?o }
            GROUP BY ?s""",
        "lax_num": True,
        "results": [{"s": "<http://example/a>", "avg": '"2"^^xsd:decimal'},
                    {"s": "<http://example/b>", "avg": '"10"^^xsd:decimal'}],
    },
    {
        "name": "min-max-mixed-group",
        "source": "spec §18.5.1.5/6 (Min/Max per group)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :p 9 . :b :p 5 .""",
        "query": """PREFIX : <http://example/>
            SELECT ?s (MIN(?o) AS ?lo) (MAX(?o) AS ?hi) WHERE { ?s :p ?o }
            GROUP BY ?s""",
        "results": [{"s": "<http://example/a>", "lo": '"1"^^xsd:integer',
                     "hi": '"9"^^xsd:integer'},
                    {"s": "<http://example/b>", "lo": '"5"^^xsd:integer',
                     "hi": '"5"^^xsd:integer'}],
    },
    {
        "name": "count-distinct-group",
        "source": "spec §18.5.1 (COUNT DISTINCT in a group)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :p 1 . :a :p 2 . :b :p 1 .""",
        "query": """PREFIX : <http://example/>
            SELECT ?s (COUNT(DISTINCT ?o) AS ?c) WHERE { ?s :p ?o }
            GROUP BY ?s""",
        "results": [{"s": "<http://example/a>", "c": '"2"^^xsd:integer'},
                    {"s": "<http://example/b>", "c": '"1"^^xsd:integer'}],
    },
    {
        "name": "group-concat-separator",
        "source": "spec §18.5.1.7 (GROUP_CONCAT with SEPARATOR)",
        "data": """@prefix : <http://example/> .
            :a :p "x" . :a :p "y" .""",
        "query": """PREFIX : <http://example/>
            SELECT (GROUP_CONCAT(?o; SEPARATOR="|") AS ?g)
            WHERE { ?s :p ?o }""",
        "results": [{"g": '"x|y"'}],
    },
    {
        "name": "sample-singleton-groups",
        "source": "spec §18.5.1.8 (Sample — deterministic for singleton "
                  "groups)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :b :p 2 .""",
        "query": """PREFIX : <http://example/>
            SELECT ?s (SAMPLE(?o) AS ?v) WHERE { ?s :p ?o } GROUP BY ?s""",
        "results": [{"s": "<http://example/a>", "v": '"1"^^xsd:integer'},
                    {"s": "<http://example/b>", "v": '"2"^^xsd:integer'}],
    },
    {
        "name": "group-by-expression-alias",
        "source": "spec §11.1/§19.8 grammar (GROUP BY (expr AS ?var))",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :b :p 2 . :c :p 3 .""",
        "query": """PREFIX : <http://example/>
            SELECT ?k (COUNT(*) AS ?c) WHERE { ?s :p ?o }
            GROUP BY (?o > 1 AS ?k)""",
        "results": [{"k": '"false"^^xsd:boolean', "c": '"1"^^xsd:integer'},
                    {"k": '"true"^^xsd:boolean', "c": '"2"^^xsd:integer'}],
    },
    {
        "name": "count-star-empty-solution",
        "source": "spec §18.5 (implicit group over an empty solution "
                  "sequence: one row, COUNT = 0)",
        "data": "@prefix : <http://example/> . :a :other 1 .",
        "query": """PREFIX : <http://example/>
            SELECT (COUNT(*) AS ?c) WHERE { ?s :none ?o }""",
        "results": [{"c": '"0"^^xsd:integer'}],
    },
    {
        "name": "sum-empty-is-zero",
        "source": "spec §18.5.1.3 (Sum({}) = 0)",
        "data": "@prefix : <http://example/> . :a :other 1 .",
        "query": """PREFIX : <http://example/>
            SELECT (SUM(?o) AS ?t) WHERE { ?s :none ?o }""",
        "results": [{"t": '"0"^^xsd:integer'}],
    },
    {
        "name": "max-empty-is-unbound",
        "source": "spec §18.5.1.6 (Max({}) is an error → unbound in the "
                  "single implicit-group row)",
        "data": "@prefix : <http://example/> . :a :other 1 .",
        "query": """PREFIX : <http://example/>
            SELECT (MAX(?o) AS ?m) WHERE { ?s :none ?o }""",
        "results": [{}],
    },
]
