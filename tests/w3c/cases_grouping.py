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
