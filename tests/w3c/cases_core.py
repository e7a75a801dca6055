"""W3C conformance corpus — core graph-pattern / solution-modifier
semantics: OPTIONAL, UNION, subquery, ORDER BY, DISTINCT/REDUCED,
LIMIT/OFFSET, GRAPH, ASK.

Sources: SPARQL 1.1 Query Recommendation normative examples (exact).
"""

_FOAF_OPT = """@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
_:a  rdf:type  foaf:Person .
_:a  foaf:name  "Alice" .
_:a  foaf:mbox  <mailto:alice@example.com> .
_:a  foaf:mbox  <mailto:alice@work.example> .
_:b  rdf:type  foaf:Person .
_:b  foaf:name  "Bob" .
"""

_DC_UNION = """@prefix dc10: <http://purl.org/dc/elements/1.0/> .
@prefix dc11: <http://purl.org/dc/elements/1.1/> .
_:a dc10:title "SPARQL Query Language Tutorial" .
_:a dc10:creator "Alice" .
_:b dc11:title "SPARQL Protocol Tutorial" .
_:b dc11:creator "Bob" .
_:c dc10:title "SPARQL" .
_:c dc11:title "SPARQL (updated)" .
"""

_PEOPLE = """@prefix : <http://people.example/> .
:alice :name "Alice", "Alice Foo", "A. Foo" .
:alice :knows :bob, :carol .
:bob :name "Bob", "Bob Bar", "B. Bar" .
:carol :name "Carol", "Carol Baz", "C. Baz" .
"""

CASES = [
    {
        "name": "optional-mbox",
        "source": "spec §6.1",
        "data": _FOAF_OPT,
        "query": """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
            SELECT ?name ?mbox WHERE {
              ?x foaf:name ?name .
              OPTIONAL { ?x foaf:mbox ?mbox }
            }""",
        "results": [
            {"name": '"Alice"', "mbox": "<mailto:alice@example.com>"},
            {"name": '"Alice"', "mbox": "<mailto:alice@work.example>"},
            {"name": '"Bob"'},
        ],
    },
    {
        "name": "optional-with-filter",
        "source": "spec §6.3",
        "data": """@prefix dc: <http://purl.org/dc/elements/1.1/> .
            @prefix : <http://example.org/book/> .
            @prefix ns: <http://example.org/ns#> .
            :book1 dc:title "SPARQL Tutorial" .
            :book1 ns:price 42 .
            :book2 dc:title "The Semantic Web" .
            :book2 ns:price 23 .
        """,
        "query": """PREFIX dc: <http://purl.org/dc/elements/1.1/>
            PREFIX ns: <http://example.org/ns#>
            SELECT ?title ?price WHERE {
              ?x dc:title ?title .
              OPTIONAL { ?x ns:price ?price . FILTER(?price < 30) }
            }""",
        "results": [{"title": '"SPARQL Tutorial"'},
                    {"title": '"The Semantic Web"',
                     "price": '"23"^^xsd:integer'}],
    },
    {
        "name": "union-dc",
        "source": "spec §7",
        "data": _DC_UNION,
        "query": """PREFIX dc10: <http://purl.org/dc/elements/1.0/>
            PREFIX dc11: <http://purl.org/dc/elements/1.1/>
            SELECT ?title WHERE {
              { ?book dc10:title ?title } UNION { ?book dc11:title ?title }
            }""",
        "results": [{"title": '"SPARQL Query Language Tutorial"'},
                    {"title": '"SPARQL Protocol Tutorial"'},
                    {"title": '"SPARQL"'},
                    {"title": '"SPARQL (updated)"'}],
    },
    {
        "name": "union-two-vars",
        "source": "spec §7 (distinguished branch vars)",
        "data": _DC_UNION,
        "query": """PREFIX dc10: <http://purl.org/dc/elements/1.0/>
            PREFIX dc11: <http://purl.org/dc/elements/1.1/>
            SELECT ?x ?y WHERE {
              { ?book dc10:title ?x } UNION { ?book dc11:title ?y }
            }""",
        "results": [{"x": '"SPARQL Query Language Tutorial"'},
                    {"y": '"SPARQL Protocol Tutorial"'},
                    {"x": '"SPARQL"'},
                    {"y": '"SPARQL (updated)"'}],
    },
    {
        "name": "subquery-min-name",
        "source": "spec §12",
        "data": _PEOPLE,
        "query": """PREFIX : <http://people.example/>
            SELECT ?y ?minName WHERE {
              :alice :knows ?y .
              { SELECT ?y (MIN(?name) AS ?minName)
                WHERE { ?y :name ?name }
                GROUP BY ?y }
            }""",
        "results": [{"y": "<http://people.example/bob>",
                     "minName": '"B. Bar"'},
                    {"y": "<http://people.example/carol>",
                     "minName": '"C. Baz"'}],
    },
    {
        "name": "order-by-asc-desc",
        "source": "spec §15.1",
        "data": """@prefix : <http://example/> .
            :a :p 3 . :b :p 1 . :c :p 2 .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?s WHERE { ?s :p ?o } ORDER BY DESC(?o)""",
        "results": [{"s": "<http://example/a>"},
                    {"s": "<http://example/c>"},
                    {"s": "<http://example/b>"}],
        "ordered": True,
    },
    {
        "name": "order-unbound-first",
        "source": "spec §15.1 (unbound < bound)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :q 9 . :b :p 2 .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?s ?w WHERE {
              ?s :p ?o OPTIONAL { ?s :q ?w }
            } ORDER BY ?w ?s""",
        "results": [{"s": "<http://example/b>"},
                    {"s": "<http://example/a>", "w": '"9"^^xsd:integer'}],
        "ordered": True,
    },
    {
        "name": "limit-offset",
        "source": "spec §15.4-15.5",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :b :p 2 . :c :p 3 . :d :p 4 .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?s WHERE { ?s :p ?o } ORDER BY ?o LIMIT 2 OFFSET 1""",
        "results": [{"s": "<http://example/b>"},
                    {"s": "<http://example/c>"}],
        "ordered": True,
    },
    {
        "name": "distinct",
        "source": "spec §15.3",
        "data": """@prefix : <http://example/> .
            :a :p "x" . :b :p "x" . :c :p "y" .
        """,
        "query": "PREFIX : <http://example/>\n"
                 "SELECT DISTINCT ?o WHERE { ?s :p ?o }",
        "results": [{"o": '"x"'}, {"o": '"y"'}],
    },
    {
        "name": "reduced-bounds",
        "source": "spec §15.3.1 (REDUCED: between DISTINCT and none)",
        "data": """@prefix : <http://example/> .
            :a :p "x" . :b :p "x" .
        """,
        # cardinality of REDUCED is implementation-defined between 1 and 2;
        # assert via ASK that at least one row comes back
        "query": """PREFIX : <http://example/>
            ASK { { SELECT REDUCED ?o WHERE { ?s :p ?o } } }""",
        "ask": True,
    },
    {
        "name": "ask-true-false",
        "source": "spec §16.3",
        "data": """@prefix foaf: <http://xmlns.com/foaf/0.1/> .
            _:a foaf:name "Alice" .
        """,
        "query": 'PREFIX foaf: <http://xmlns.com/foaf/0.1/>\n'
                 'ASK { ?x foaf:name "Alice" }',
        "ask": True,
    },
    {
        "name": "ask-false",
        "source": "spec §16.3",
        "data": """@prefix foaf: <http://xmlns.com/foaf/0.1/> .
            _:a foaf:name "Alice" .
        """,
        "query": 'PREFIX foaf: <http://xmlns.com/foaf/0.1/>\n'
                 'ASK { ?x foaf:name "Zed" }',
        "ask": False,
    },
    {
        "name": "graph-var",
        "source": "spec §13.3 (querying the dataset)",
        "data": None,
        "named": {
            "http://example.org/foaf/aliceFoaf":
                '@prefix foaf: <http://xmlns.com/foaf/0.1/> .\n'
                '_:a foaf:name "Alice" .\n',
            "http://example.org/foaf/bobFoaf":
                '@prefix foaf: <http://xmlns.com/foaf/0.1/> .\n'
                '_:b foaf:name "Bob" .\n',
        },
        "query": """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
            SELECT ?src ?name WHERE {
              GRAPH ?src { ?x foaf:name ?name }
            }""",
        "results": [{"src": "<http://example.org/foaf/aliceFoaf>",
                     "name": '"Alice"'},
                    {"src": "<http://example.org/foaf/bobFoaf>",
                     "name": '"Bob"'}],
    },
    {
        "name": "from-named",
        "source": "spec §13.2.3",
        "data": None,
        "named": {
            "http://example.org/g1":
                '@prefix : <http://example/> .\n:a :p 1 .\n',
            "http://example.org/g2":
                '@prefix : <http://example/> .\n:b :p 2 .\n',
        },
        "query": """PREFIX : <http://example/>
            SELECT ?g ?s
            FROM NAMED <http://example.org/g1>
            WHERE { GRAPH ?g { ?s :p ?o } }""",
        "results": [{"g": "<http://example.org/g1>",
                     "s": "<http://example/a>"}],
    },
]
