"""W3C conformance corpus — CONSTRUCT / DESCRIBE.

Sources: SPARQL 1.1 Query §16.2 normative examples (exact). Expected
graphs are triple lists compared under bnode isomorphism (template
bnodes are fresh per solution, §16.2.1).
"""

CASES = [
    {
        "name": "construct-vcard",
        "source": "spec §16.2",
        "data": """@prefix foaf: <http://xmlns.com/foaf/0.1/> .
            _:a foaf:name "Alice" .
            _:a foaf:mbox <mailto:alice@example.org> .
        """,
        "query": """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
            PREFIX vcard: <http://www.w3.org/2001/vcard-rdf/3.0#>
            CONSTRUCT { <http://example.org/person#Alice> vcard:FN ?name }
            WHERE { ?x foaf:name ?name }""",
        "graph": [("<http://example.org/person#Alice>",
                   "<http://www.w3.org/2001/vcard-rdf/3.0#FN>",
                   '"Alice"')],
    },
    {
        "name": "construct-template-bnode-fresh",
        "source": "spec §16.2.1 (templates with blank nodes)",
        "data": """@prefix foaf: <http://xmlns.com/foaf/0.1/> .
            _:a foaf:givenname "Alice" .
            _:a foaf:family_name "Hacker" .
            _:b foaf:givenname "Bob" .
            _:b foaf:family_name "Hacker" .
        """,
        "query": """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
            PREFIX vcard: <http://www.w3.org/2001/vcard-rdf/3.0#>
            CONSTRUCT {
              ?x vcard:N _:v .
              _:v vcard:givenName ?gname .
              _:v vcard:familyName ?fname .
            }
            WHERE {
              ?x foaf:givenname ?gname ;
                 foaf:family_name ?fname .
            }""",
        # one fresh _:v per solution; _:a/_:b are data bnodes
        "graph": [
            ("_:a", "<http://www.w3.org/2001/vcard-rdf/3.0#N>", "_:v1"),
            ("_:v1", "<http://www.w3.org/2001/vcard-rdf/3.0#givenName>",
             '"Alice"'),
            ("_:v1", "<http://www.w3.org/2001/vcard-rdf/3.0#familyName>",
             '"Hacker"'),
            ("_:b", "<http://www.w3.org/2001/vcard-rdf/3.0#N>", "_:v2"),
            ("_:v2", "<http://www.w3.org/2001/vcard-rdf/3.0#givenName>",
             '"Bob"'),
            ("_:v2", "<http://www.w3.org/2001/vcard-rdf/3.0#familyName>",
             '"Hacker"'),
        ],
    },
    {
        "name": "construct-where-shortcut",
        "source": "spec §16.2.4 (CONSTRUCT WHERE)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :b :q 2 .
        """,
        "query": """PREFIX : <http://example/>
            CONSTRUCT WHERE { ?s :p ?o }""",
        "graph": [("<http://example/a>", "<http://example/p>",
                   '"1"^^xsd:integer')],
    },
    {
        "name": "construct-unbound-skipped",
        "source": "spec §16.2.2 (solutions with unbound template vars)",
        "data": """@prefix : <http://example/> .
            :a :p :b .
            :b :name "B" .
            :a :p :c .
        """,
        "query": """PREFIX : <http://example/>
            CONSTRUCT { ?x :label ?n }
            WHERE { ?s :p ?x OPTIONAL { ?x :name ?n } }""",
        # the :c solution has ?n unbound — its template triple is omitted
        "graph": [("<http://example/b>", "<http://example/label>", '"B"')],
    },
    {
        "name": "construct-literal-subject-skipped",
        "source": "spec §16.2 (invalid RDF triples are not included)",
        "data": """@prefix : <http://example/> .
            :a :p "litval" .
            :a :p :iriobj .
        """,
        "query": """PREFIX : <http://example/>
            CONSTRUCT { ?o :q :c }
            WHERE { :a :p ?o }""",
        # ?o = "litval" would put a literal in subject position — that
        # instantiation produces NO triple (r9 fuzzer-found defect: the
        # literal's lexical form leaked through as if it were an IRI)
        "graph": [("<http://example/iriobj>", "<http://example/q>",
                   "<http://example/c>")],
    },
    {
        "name": "construct-literal-predicate-skipped",
        "source": "spec §16.2 (predicate must be an IRI)",
        "data": """@prefix : <http://example/> .
            :a :p "litval" .
            :a :p :iriobj .
            :a :p _:bn .
        """,
        "query": """PREFIX : <http://example/>
            CONSTRUCT { :x ?o :c }
            WHERE { :a :p ?o }""",
        # literal AND bnode bindings are invalid in predicate position
        "graph": [("<http://example/x>", "<http://example/iriobj>",
                   "<http://example/c>")],
    },
    {
        "name": "describe-iri",
        "source": "spec §16.4 (DESCRIBE resource)",
        "data": """@prefix : <http://example/> .
            :a :p 1 ; :q :b .
            :z :r :a .
        """,
        "query": "DESCRIBE <http://example/a>",
        # §16.4 leaves the description form to the implementation; this
        # engine (like the reference's rdf4j stack) emits the SYMMETRIC
        # description — outgoing and incoming edges, following bnodes
        "graph": [("<http://example/a>", "<http://example/p>",
                   '"1"^^xsd:integer'),
                  ("<http://example/a>", "<http://example/q>",
                   "<http://example/b>"),
                  ("<http://example/z>", "<http://example/r>",
                   "<http://example/a>")],
    },
    {
        "name": "construct-dedup-across-solutions",
        "source": "spec §16.2 (result is a GRAPH — set semantics)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :b :p 1 .
        """,
        "query": """PREFIX : <http://example/>
            CONSTRUCT { :k :hasVal ?o } WHERE { ?s :p ?o }""",
        # two solutions instantiate the SAME triple -> one graph triple
        "graph": [("<http://example/k>", "<http://example/hasVal>",
                   '"1"^^xsd:integer')],
    },
    {
        "name": "construct-ground-template-matched",
        "source": "spec §16.2 (variable-free template)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :b :p 2 .
        """,
        "query": """PREFIX : <http://example/>
            CONSTRUCT { :flag :is :set } WHERE { ?s :p ?o }""",
        # emitted once regardless of how many solutions match
        "graph": [("<http://example/flag>", "<http://example/is>",
                   "<http://example/set>")],
    },
    {
        "name": "construct-ground-template-unmatched",
        "source": "spec §16.2 (no solutions -> empty graph)",
        "data": """@prefix : <http://example/> .
            :a :p 1 .
        """,
        "query": """PREFIX : <http://example/>
            CONSTRUCT { :flag :is :set } WHERE { ?s :nosuch ?o }""",
        "graph": [],
    },
    {
        "name": "construct-order-limit-slices-solutions",
        "source": "spec §16.2 / §15 (solution modifiers apply pre-template)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :b :p 2 . :c :p 3 .
        """,
        "query": """PREFIX : <http://example/>
            CONSTRUCT { ?s :top ?o }
            WHERE { ?s :p ?o } ORDER BY DESC(?o) LIMIT 1""",
        "graph": [("<http://example/c>", "<http://example/top>",
                   '"3"^^xsd:integer')],
    },
    {
        "name": "construct-multi-triple-partial-unbound",
        "source": "spec §16.2.2 (only the unbound triple is omitted)",
        "data": """@prefix : <http://example/> .
            :a :p :b . :b :name "B" .
            :a :p :c .
        """,
        "query": """PREFIX : <http://example/>
            CONSTRUCT { ?x :seen :yes . ?x :label ?n }
            WHERE { ?s :p ?x OPTIONAL { ?x :name ?n } }""",
        # :c solution leaves ?n unbound: its :label triple is omitted but
        # its :seen triple IS emitted
        "graph": [("<http://example/b>", "<http://example/seen>",
                   "<http://example/yes>"),
                  ("<http://example/b>", "<http://example/label>", '"B"'),
                  ("<http://example/c>", "<http://example/seen>",
                   "<http://example/yes>")],
    },
    {
        "name": "construct-lang-and-datatype-preserved",
        "source": "spec §16.2 (terms carry through unchanged)",
        "data": """@prefix : <http://example/> .
            @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
            :a :p "chat"@fr .
            :a :p "2.50"^^xsd:decimal .
        """,
        "query": """PREFIX : <http://example/>
            CONSTRUCT { :out :v ?o } WHERE { :a :p ?o }""",
        "graph": [("<http://example/out>", "<http://example/v>",
                   '"chat"@fr'),
                  ("<http://example/out>", "<http://example/v>",
                   '"2.50"^^xsd:decimal')],
    },
    {
        "name": "describe-var-bound-by-where",
        "source": "spec §16.4.1 (DESCRIBE ?x WHERE)",
        "data": """@prefix : <http://example/> .
            :a :p 1 ; :kind :wanted .
            :b :p 2 .
        """,
        "query": """PREFIX : <http://example/>
            DESCRIBE ?x WHERE { ?x :kind :wanted }""",
        "graph": [("<http://example/a>", "<http://example/p>",
                   '"1"^^xsd:integer'),
                  ("<http://example/a>", "<http://example/kind>",
                   "<http://example/wanted>")],
    },
]
