"""W3C conformance corpus — SELECT expressions and projection scope.

Sources: SPARQL 1.1 Query §16.1.2 (projected expressions) and the
project-expression family shapes of rdf-tests (transcribed).
"""

CASES = [
    {
        "name": "select-expression",
        "source": "spec §16.1.2",
        "data": """@prefix dc: <http://purl.org/dc/elements/1.1/> .
            @prefix : <http://example.org/book/> .
            @prefix ns: <http://example.org/ns#> .
            :book1 dc:title "SPARQL Tutorial" .
            :book1 ns:price 42 .
            :book1 ns:discount 0.2 .
        """,
        "query": """PREFIX dc: <http://purl.org/dc/elements/1.1/>
            PREFIX ns: <http://example.org/ns#>
            SELECT ?title (?p * (1 - ?discount) AS ?price)
            WHERE { ?x ns:price ?p .
                    ?x dc:title ?title .
                    ?x ns:discount ?discount }""",
        "results": [{"title": '"SPARQL Tutorial"',
                     "price": '"33.6"^^xsd:decimal'}],
        "lax_num": True,
    },
    {
        "name": "select-expr-error-unbound",
        "source": "rdf-tests project-expression (transcribed): an erroring "
                  "projected expression leaves the var unbound",
        "data": '@prefix : <http://example.org/> .\n:s :p 1 . :s :p "x" .\n',
        "query": """PREFIX : <http://example.org/>
            SELECT ?o (?o + 1 AS ?next) WHERE { ?s :p ?o }""",
        "results": [{"o": '"1"^^xsd:integer', "next": '"2"^^xsd:integer'},
                    {"o": '"x"'}],
    },
    {
        "name": "select-expr-reuse-prior-alias",
        "source": "spec §16.1.2 (later expressions see earlier AS vars)",
        "data": '@prefix : <http://example.org/> .\n:s :p 2 .\n',
        "query": """PREFIX : <http://example.org/>
            SELECT (?o * 2 AS ?double) (?double * 2 AS ?quad)
            WHERE { ?s :p ?o }""",
        "results": [{"double": '"4"^^xsd:integer',
                     "quad": '"8"^^xsd:integer'}],
    },
    {
        "name": "ask-aggregate-no-group",
        "source": "spec §11.1 (aggregate without GROUP BY = one group)",
        "data": '@prefix : <http://example.org/> .\n:a :p 1 . :b :p 2 .\n',
        "query": """PREFIX : <http://example.org/>
            ASK { { SELECT (COUNT(*) AS ?c) WHERE { ?s :p ?o } }
                  FILTER(?c = 2) }""",
        "ask": True,
    },
    {
        "name": "order-by-expression",
        "source": "spec §15.1 (ORDER BY with expression and DESC)",
        "data": """@prefix : <http://example.org/> .
            :a :v 1 . :b :v 3 . :c :v 2 .
        """,
        "query": """PREFIX : <http://example.org/>
            SELECT ?s WHERE { ?s :v ?v } ORDER BY DESC(?v * 10)""",
        "results": [{"s": "<http://example.org/b>"},
                    {"s": "<http://example.org/c>"},
                    {"s": "<http://example.org/a>"}],
        "ordered": True,
    },
]

CASES += [
    {
        "name": "select-expr-over-group-key",
        "source": "spec §11.1/§16.1.2 (projected expression over the "
                  "GROUP BY key)",
        "data": """@prefix : <http://example.org/> .
            :s1 :size 5 . :s2 :size 5 . :s3 :size 7 .""",
        "query": """PREFIX : <http://example.org/>
            SELECT (?size * 2 AS ?double) (COUNT(*) AS ?n)
            WHERE { ?s :size ?size } GROUP BY ?size
            ORDER BY ?double""",
        "ordered": True,
        "results": [{"double": '"10"^^xsd:integer',
                     "n": '"2"^^xsd:integer'},
                    {"double": '"14"^^xsd:integer',
                     "n": '"1"^^xsd:integer'}],
    },
    {
        "name": "select-distinct-expression",
        "source": "rdf-tests project-expression shape (transcribed): "
                  "DISTINCT applies AFTER projection",
        "data": """@prefix : <http://example.org/> .
            :a :p 1 . :b :p 2 . :c :p 1 .""",
        "query": """PREFIX : <http://example.org/>
            SELECT DISTINCT (?o + 1 AS ?v) WHERE { ?s :p ?o }
            ORDER BY ?v""",
        "ordered": True,
        "results": [{"v": '"2"^^xsd:integer'}, {"v": '"3"^^xsd:integer'}],
    },
    {
        "name": "select-expr-constant",
        "source": "spec §16.1.2 (constant expression projects per row)",
        "data": '@prefix : <http://example.org/> .\n:a :p 1 . :b :p 2 .\n',
        "query": """PREFIX : <http://example.org/>
            SELECT ?s ("tag" AS ?k) WHERE { ?s :p ?o } ORDER BY ?s""",
        "ordered": True,
        "results": [{"s": "<http://example.org/a>", "k": '"tag"'},
                    {"s": "<http://example.org/b>", "k": '"tag"'}],
    },
    {
        "name": "order-by-desc-expression",
        "source": "spec §15.1 (ORDER BY DESC over an expression)",
        "data": '@prefix : <http://example.org/> .\n:a :p 1 . :b :p 3 .\n',
        "query": """PREFIX : <http://example.org/>
            SELECT ?s WHERE { ?s :p ?o } ORDER BY DESC(?o * 10)""",
        "ordered": True,
        "results": [{"s": "<http://example.org/b>"},
                    {"s": "<http://example.org/a>"}],
    },
]
