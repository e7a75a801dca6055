"""W3C conformance corpus — negation (NOT EXISTS / MINUS).

Sources: SPARQL 1.1 Query Recommendation §8 (normative examples,
reproduced exactly) and the public rdf-tests sparql11/negation family
(transcribed from memory — semantics-defining shape, not byte-identical).
"""

PFX = "@prefix : <http://example/> .\n" \
      "@prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .\n" \
      "@prefix foaf: <http://xmlns.com/foaf/0.1/> .\n"

QPFX = "PREFIX : <http://example/>\n" \
       "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n" \
       "PREFIX foaf: <http://xmlns.com/foaf/0.1/>\n"

_EX81_DATA = PFX + """
_:alice  rdf:type   foaf:Person .
_:alice  foaf:name  "Alice" .
_:bob    rdf:type   foaf:Person .
"""

_MINUS_DATA = PFX + """
:alice  foaf:givenName "Alice" ;
        foaf:familyName "Smith" .
:bob    foaf:givenName "Bob" ;
        foaf:familyName "Jones" .
:carol  foaf:givenName "Carol" ;
        foaf:familyName "Smith" .
"""

CASES = [
    {
        "name": "filter-not-exists",
        "source": "spec §8.1.1",
        "data": _EX81_DATA,
        "query": QPFX + """
            SELECT ?person WHERE {
              ?person rdf:type foaf:Person .
              FILTER NOT EXISTS { ?person foaf:name ?name }
            }""",
        "results": [{"person": "_:bob"}],
    },
    {
        "name": "filter-exists",
        "source": "spec §8.1.2",
        "data": _EX81_DATA,
        "query": QPFX + """
            SELECT ?person WHERE {
              ?person rdf:type foaf:Person .
              FILTER EXISTS { ?person foaf:name ?name }
            }""",
        "results": [{"person": "_:alice"}],
    },
    {
        "name": "minus-basic",
        "source": "spec §8.2",
        "data": _MINUS_DATA,
        "query": QPFX + """
            SELECT DISTINCT ?s WHERE {
              ?s ?p ?o .
              MINUS { ?s foaf:givenName "Bob" . }
            }""",
        "results": [{"s": "<http://example/alice>"},
                    {"s": "<http://example/carol>"}],
    },
    {
        "name": "minus-disjoint-domains",
        "source": "spec §8.3.3 ex.1 (MINUS side)",
        "data": "@prefix : <http://example/> .\n:a :b :c .\n",
        "query": "PREFIX : <http://example/>\n"
                 "SELECT * WHERE { ?s ?p ?o MINUS { ?x ?y ?z } }",
        # disjoint domains: MINUS removes nothing
        "results": [{"s": "<http://example/a>", "p": "<http://example/b>",
                     "o": "<http://example/c>"}],
    },
    {
        "name": "notexists-disjoint-vars",
        "source": "spec §8.3.3 ex.1 (NOT EXISTS side)",
        "data": "@prefix : <http://example/> .\n:a :b :c .\n",
        "query": "PREFIX : <http://example/>\n"
                 "SELECT * WHERE { ?s ?p ?o FILTER NOT EXISTS { ?x ?y ?z } }",
        # the pattern matches, so NOT EXISTS eliminates every solution
        "results": [],
    },
    {
        "name": "minus-inner-filter-no-shared",
        "source": "spec §8.3.3 ex.2 (MINUS side)",
        "data": "@prefix : <http://example/> .\n:a :b :c .\n",
        "query": "PREFIX : <http://example/>\n"
                 "SELECT * WHERE { ?s ?p ?o "
                 "MINUS { ?x ?y ?z FILTER(?s = ?x) } }",
        # ?s is not in scope inside MINUS: the filter errors, the right
        # side is empty, the solution survives
        "results": [{"s": "<http://example/a>", "p": "<http://example/b>",
                     "o": "<http://example/c>"}],
    },
    {
        "name": "notexists-inner-filter-substituted",
        "source": "spec §8.3.3 ex.2 (NOT EXISTS side)",
        "data": "@prefix : <http://example/> .\n:a :b :c .\n",
        "query": "PREFIX : <http://example/>\n"
                 "SELECT * WHERE { ?s ?p ?o "
                 "FILTER NOT EXISTS { ?x ?y ?z FILTER(?s = ?x) } }",
        # §8.1.4 substitution makes ?s visible inside EXISTS: the inner
        # pattern matches with ?x = :a, so NOT EXISTS is false
        "results": [],
    },
    {
        "name": "subset-by-exclusion-nex",
        "source": "rdf-tests negation/subsetByExcl01 (transcribed)",
        "data": """@prefix : <http://example/> .
            :alice a :Mammal, :Animal .
            :spider a :Animal .
            :bird a :Animal, :Insect .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?animal WHERE {
              ?animal a :Animal .
              FILTER NOT EXISTS { ?animal a :Insect }
            }""",
        "results": [{"animal": "<http://example/alice>"},
                    {"animal": "<http://example/spider>"}],
    },
    {
        "name": "subset-by-exclusion-minus",
        "source": "rdf-tests negation/subsetByExcl02 (transcribed)",
        "data": """@prefix : <http://example/> .
            :alice a :Mammal, :Animal .
            :spider a :Animal .
            :bird a :Animal, :Insect .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?animal WHERE {
              ?animal a :Animal .
              MINUS { ?animal a :Insect }
            }""",
        "results": [{"animal": "<http://example/alice>"},
                    {"animal": "<http://example/spider>"}],
    },
    {
        "name": "minus-partial-overlap",
        "source": "rdf-tests negation/full-minuend (transcribed shape)",
        "data": """@prefix : <http://example/> .
            :a :p 1 ; :q 2 .
            :b :p 3 .
            :c :p 4 ; :q 5 .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?s ?x WHERE {
              ?s :p ?x
              MINUS { ?s :q ?y FILTER(?y = 2) }
            }""",
        "results": [{"s": "<http://example/b>", "x": '"3"^^xsd:integer'},
                    {"s": "<http://example/c>", "x": '"4"^^xsd:integer'}],
    },
    {
        "name": "minus-both-unbound-no-overlap",
        "source": "spec §8.3 (dom(μ)∩dom(μ′)=∅ keeps μ)",
        "data": """@prefix : <http://example/> .
            :a :p 1 .
            :b :q 2 .
        """,
        # left binds ?v only for :a rows; right binds ?v never ⇒ for the
        # :b-row μ the shared var set is empty-by-unboundness on the right
        # side only when both sides bind nothing in common
        "query": """PREFIX : <http://example/>
            SELECT ?s WHERE {
              { ?s :p ?v } UNION { ?s :q ?w }
              MINUS { ?x :q ?w }
            }""",
        # μ(:a,?v=1): shared ?w unbound on left ⇒ no domain overlap with
        # μ′(?x=:b,?w=2) ⇒ kept. μ(:b,?w=2): overlap on ?w, compatible ⇒
        # removed.
        "results": [{"s": "<http://example/a>"}],
    },
    {
        "name": "notexists-minus-nested",
        "source": "rdf-tests negation/set-equals shape (transcribed)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :q 1 .
            :b :p 2 .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?s WHERE {
              ?s :p ?o
              FILTER NOT EXISTS { ?s :q ?o }
            }""",
        "results": [{"s": "<http://example/b>"}],
    },
]
