"""W3C conformance corpus — SPARQL 1.1 Update.

Source: normative examples in the SPARQL 1.1 Update Recommendation §3
(exact). Each case applies updates to the loaded dataset, then checks
the resulting state with a SELECT/ASK query.
"""

_QD = "PREFIX dc: <http://purl.org/dc/elements/1.1/>\n" \
      "PREFIX ns: <http://example.org/ns#>\n"

CASES = [
    {
        "name": "insert-template-invalid-positions-skipped",
        "source": "update spec §3.1.3 (illegal RDF in instantiated "
                  "templates produces no triple)",
        "data": """@prefix : <http://example/> .
            :a :p "litval" .
            :a :p :iriobj .
        """,
        "update": ["""PREFIX : <http://example/>
            INSERT { ?o :q :c . :x ?o :c }
            WHERE { :a :p ?o }"""],
        # literal-bound ?o is invalid in subject AND predicate position —
        # only the :iriobj instantiations land (r9 fuzzer-found defect)
        "query": """PREFIX : <http://example/>
            SELECT ?s ?p WHERE { ?s ?p :c } ORDER BY ?s""",
        "results": [{"s": "<http://example/iriobj>",
                     "p": "<http://example/q>"},
                    {"s": "<http://example/x>",
                     "p": "<http://example/iriobj>"}],
    },
    {
        "name": "insert-data",
        "source": "update spec §3.1.1",
        "data": """@prefix dc: <http://purl.org/dc/elements/1.1/> .
            <http://example/book1> dc:title "A new book" .
        """,
        "update": ["""PREFIX dc: <http://purl.org/dc/elements/1.1/>
            INSERT DATA
            { <http://example/book1> dc:creator "A.N.Other" . }"""],
        "query": _QD + """
            SELECT ?c WHERE { <http://example/book1> dc:creator ?c }""",
        "results": [{"c": '"A.N.Other"'}],
    },
    {
        "name": "delete-data",
        "source": "update spec §3.1.2",
        "data": """@prefix dc: <http://purl.org/dc/elements/1.1/> .
            <http://example/book2> dc:title "David Copperfield" ;
                                   dc:creator "Edmund Wells" .
        """,
        "update": ["""PREFIX dc: <http://purl.org/dc/elements/1.1/>
            DELETE DATA
            { <http://example/book2> dc:title "David Copperfield" ;
                                     dc:creator "Edmund Wells" . }"""],
        "query": "ASK { <http://example/book2> ?p ?o }",
        "ask": False,
    },
    {
        "name": "delete-insert-where",
        "source": "update spec §3.1.3 (rename Bill → William)",
        "data": """@prefix foaf: <http://xmlns.com/foaf/0.1/> .
            <http://example/president25> foaf:givenName "Bill" .
            <http://example/president25> foaf:familyName "McKinley" .
            <http://example/president27> foaf:givenName "Bill" .
            <http://example/president27> foaf:familyName "Taft" .
            <http://example/president42> foaf:givenName "Bill" .
            <http://example/president42> foaf:familyName "Clinton" .
        """,
        "update": ["""PREFIX foaf: <http://xmlns.com/foaf/0.1/>
            DELETE { ?person foaf:givenName 'Bill' }
            INSERT { ?person foaf:givenName 'William' }
            WHERE  { ?person foaf:givenName 'Bill' }"""],
        "query": """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
            SELECT ?n WHERE { ?p foaf:givenName ?n } """,
        "results": [{"n": '"William"'}, {"n": '"William"'},
                    {"n": '"William"'}],
    },
    {
        "name": "insert-where-copy",
        "source": "update spec §3.1.3 (INSERT WHERE into a graph)",
        "data": """@prefix dc: <http://purl.org/dc/elements/1.1/> .
            @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
            <http://example/book1> dc:title "Fundamentals" ;
                dc:date "1977-01-01T00:00:00-02:00"^^xsd:dateTime .
            <http://example/book2> dc:title "Recent" ;
                dc:date "2010-01-01T00:00:00-02:00"^^xsd:dateTime .
        """,
        "update": ["""PREFIX dc: <http://purl.org/dc/elements/1.1/>
            PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
            INSERT { GRAPH <http://example/bookStore2> { ?book ?p ?v } }
            WHERE {
              ?book dc:date ?date .
              FILTER ( ?date > "1970-01-01T00:00:00-02:00"^^xsd:dateTime
                       && ?date < "2000-01-01T00:00:00-02:00"^^xsd:dateTime )
              ?book ?p ?v
            }"""],
        "query": """SELECT ?s WHERE {
            GRAPH <http://example/bookStore2> { ?s ?p ?o } }""",
        "results": [{"s": "<http://example/book1>"},
                    {"s": "<http://example/book1>"}],
    },
    {
        "name": "delete-where-shortcut",
        "source": "update spec §3.1.3.3",
        "data": """@prefix foaf: <http://xmlns.com/foaf/0.1/> .
            <http://example/william> a foaf:Person ;
                foaf:givenName "William" ;
                foaf:mbox <mailto:bill@example> .
            <http://example/fred> a foaf:Person ;
                foaf:givenName "Fred" .
        """,
        "update": ["""PREFIX foaf: <http://xmlns.com/foaf/0.1/>
            DELETE WHERE { ?person foaf:givenName 'Fred' ; ?property ?value }
            """],
        "query": """PREFIX foaf: <http://xmlns.com/foaf/0.1/>
            SELECT ?n WHERE { ?p foaf:givenName ?n }""",
        "results": [{"n": '"William"'}],
    },
    {
        "name": "insert-graph-variable-template",
        "source": "update spec §3.1.3 (GRAPH ?g in the INSERT template)",
        "named": {"http://example/g1":
                  "@prefix : <http://example/> .\n:a :p 1 .\n",
                  "http://example/g2":
                  "@prefix : <http://example/> .\n:b :p 2 .\n"},
        "update": ["""PREFIX : <http://example/>
            INSERT { GRAPH ?g { ?s :copied ?o } }
            WHERE  { GRAPH ?g { ?s :p ?o } }"""],
        "query": """PREFIX : <http://example/>
            SELECT ?g ?s WHERE { GRAPH ?g { ?s :copied ?o } }""",
        "results": [{"g": "<http://example/g1>", "s": "<http://example/a>"},
                    {"g": "<http://example/g2>", "s": "<http://example/b>"}],
    },
    {
        "name": "clear-graph",
        "source": "update spec §3.2.2",
        "named": {"http://example/g1":
                  "@prefix : <http://example/> .\n:a :p 1 .\n",
                  "http://example/g2":
                  "@prefix : <http://example/> .\n:b :p 2 .\n"},
        "update": ["CLEAR GRAPH <http://example/g1>"],
        "query": "SELECT ?g WHERE { GRAPH ?g { ?s ?p ?o } }",
        "results": [{"g": "<http://example/g2>"}],
    },
    {
        "name": "copy-graph",
        "source": "update spec §3.2.5 (COPY replaces the target)",
        "named": {"http://example/g1":
                  "@prefix : <http://example/> .\n:a :p 1 .\n",
                  "http://example/g2":
                  "@prefix : <http://example/> .\n:b :p 2 .\n"},
        "update": ["COPY GRAPH <http://example/g1> TO GRAPH <http://example/g2>"],
        "query": "SELECT ?s WHERE { GRAPH <http://example/g2> { ?s ?p ?o } }",
        "results": [{"s": "<http://example/a>"}],
    },
    {
        "name": "insert-data-then-delete-where",
        "source": "update spec §3.1 (sequence in one request semantics)",
        "data": "@prefix : <http://example/> .\n:a :p 1 .\n",
        "update": [
            "PREFIX : <http://example/> INSERT DATA { :b :p 2 }",
            "PREFIX : <http://example/> DELETE WHERE { :a ?p ?o }",
        ],
        "query": "PREFIX : <http://example/>\nSELECT ?s WHERE { ?s :p ?o }",
        "results": [{"s": "<http://example/b>"}],
    },
]


# ---- r9 corpus growth (VERDICT r8 item 3): update family 9 -> 25 cases ----

_EX = "PREFIX : <http://example/>\n"

CASES += [
    {
        "name": "insert-data-named-graph",
        "source": "update spec §3.1.1 (GRAPH block in QuadData)",
        "data": "@prefix : <http://example/> . :x :p 1 .",
        "update": ["""PREFIX : <http://example/>
            INSERT DATA { GRAPH <http://example/store> { :x :price 42 } }"""],
        "query": _EX + """SELECT ?v WHERE {
            GRAPH <http://example/store> { ?s :price ?v } }""",
        "results": [{"v": '"42"^^xsd:integer'}],
    },
    {
        "name": "delete-data-named-graph",
        "source": "update spec §3.1.2 (GRAPH block in QuadData)",
        "named": {"http://example/g1": """@prefix : <http://example/> .
            :a :p 1 . :b :p 2 ."""},
        "update": ["""PREFIX : <http://example/>
            DELETE DATA { GRAPH <http://example/g1> { :a :p 1 } }"""],
        "query": _EX + """SELECT ?s WHERE {
            GRAPH <http://example/g1> { ?s :p ?o } }""",
        "results": [{"s": "<http://example/b>"}],
    },
    {
        "name": "modify-with-clause",
        "source": "update spec §3.1.3 (WITH selects both template and "
                  "WHERE graph)",
        "named": {"http://example/addresses": """@prefix : <http://example/> .
            :p1 :name "Bill" . :p2 :name "Ann" ."""},
        "update": ["""PREFIX : <http://example/>
            WITH <http://example/addresses>
            DELETE { ?p :name "Bill" }
            INSERT { ?p :name "William" }
            WHERE { ?p :name "Bill" }"""],
        "query": _EX + """SELECT ?n WHERE {
            GRAPH <http://example/addresses> { ?p :name ?n } }""",
        "results": [{"n": '"William"'}, {"n": '"Ann"'}],
    },
    {
        "name": "modify-using-clause",
        "source": "update spec §3.1.3 (USING restricts the WHERE dataset; "
                  "template still targets the default graph)",
        "data": "@prefix : <http://example/> . :z :name \"ZDefault\" .",
        "named": {"http://example/g2": """@prefix : <http://example/> .
            :a :name "OnlyInG2" ."""},
        "update": ["""PREFIX : <http://example/>
            INSERT { ?s :copied ?n }
            USING <http://example/g2>
            WHERE { ?s :name ?n }"""],
        "query": _EX + "SELECT ?s ?n WHERE { ?s :copied ?n }",
        "results": [{"s": "<http://example/a>", "n": '"OnlyInG2"'}],
    },
    {
        "name": "delete-insert-pre-state",
        "source": "update spec §3.1.3 (DELETE and INSERT both evaluated "
                  "against the pre-update state)",
        "data": "@prefix : <http://example/> . :x :p \"old\" .",
        "update": ["""PREFIX : <http://example/>
            DELETE { ?s :p ?o } INSERT { ?s :p "new" }
            WHERE { ?s :p ?o }"""],
        "query": _EX + "SELECT ?o WHERE { ?s :p ?o }",
        "results": [{"o": '"new"'}],
    },
    {
        "name": "insert-template-unbound-skipped",
        "source": "update spec §3.1.3 (template instantiation with an "
                  "unbound variable produces no triple for that solution)",
        "data": """@prefix : <http://example/> .
            :a :q 1 . :b :q 2 . :b :r 9 .""",
        "update": ["""PREFIX : <http://example/>
            INSERT { ?s :p ?x }
            WHERE { ?s :q ?o OPTIONAL { ?s :r ?x } }"""],
        "query": _EX + "SELECT ?s ?x WHERE { ?s :p ?x }",
        "results": [{"s": "<http://example/b>", "x": '"9"^^xsd:integer'}],
    },
    {
        "name": "insert-data-bnodes-fresh-per-operation",
        "source": "rdf-tests update insert-data-same-bnode shape "
                  "(transcribed; §3.1.1: blank nodes are instantiated "
                  "fresh per operation, same label within one operation "
                  "denotes one node)",
        "update": ["PREFIX : <http://example/>\n"
                   "INSERT DATA { _:b :p 1 . _:b :q 9 }",
                   "PREFIX : <http://example/>\n"
                   "INSERT DATA { _:b :p 2 }"],
        "query": _EX + "SELECT (COUNT(DISTINCT ?s) AS ?c) WHERE { ?s ?p ?o }",
        "results": [{"c": '"2"^^xsd:integer'}],
    },
    {
        "name": "delete-data-nonexistent-noop",
        "source": "update spec §3.1.2 (deleting absent triples is not an "
                  "error and leaves the store unchanged)",
        "data": "@prefix : <http://example/> . :a :p 1 .",
        "update": ["PREFIX : <http://example/>\n"
                   "DELETE DATA { :zzz :p 99 }"],
        "query": _EX + "SELECT ?s WHERE { ?s :p ?o }",
        "results": [{"s": "<http://example/a>"}],
    },
    {
        "name": "clear-default-keeps-named",
        "source": "update spec §3.2.3 (CLEAR DEFAULT empties only the "
                  "default graph)",
        "data": "@prefix : <http://example/> . :d :p 1 .",
        "named": {"http://example/g": "@prefix : <http://example/> . "
                                      ":n :p 2 ."},
        "update": ["CLEAR DEFAULT"],
        # the engine's default query graph is the GraphDB-style union of
        # all graphs, so the bare pattern sees exactly the surviving
        # named-graph triple
        "query": _EX + "SELECT ?s WHERE { ?s :p ?o }",
        "results": [{"s": "<http://example/n>"}],
    },
    {
        "name": "clear-all",
        "source": "update spec §3.2.3 (CLEAR ALL empties every graph)",
        "data": "@prefix : <http://example/> . :d :p 1 .",
        "named": {"http://example/g": "@prefix : <http://example/> . "
                                      ":n :p 2 ."},
        "update": ["CLEAR ALL"],
        "query": "ASK { { ?s ?p ?o } UNION { GRAPH ?g { ?s ?p ?o } } }",
        "ask": False,
    },
    {
        "name": "drop-graph",
        "source": "update spec §3.2.2 (DROP GRAPH removes the graph)",
        "named": {"http://example/g": "@prefix : <http://example/> . "
                                      ":n :p 2 ."},
        "update": ["DROP GRAPH <http://example/g>"],
        "query": "ASK { GRAPH <http://example/g> { ?s ?p ?o } }",
        "ask": False,
    },
    {
        "name": "add-graph-merges-keeps-source",
        "source": "update spec §3.2.5 (ADD inserts source data into "
                  "destination, source unchanged)",
        "named": {
            "http://example/src": "@prefix : <http://example/> . :s :p 1 .",
            "http://example/dst": "@prefix : <http://example/> . :d :p 2 .",
        },
        "update": ["ADD <http://example/src> TO <http://example/dst>"],
        "query": _EX + """SELECT ?s WHERE {
            GRAPH <http://example/dst> { ?s :p ?o } }""",
        "results": [{"s": "<http://example/s>"}, {"s": "<http://example/d>"}],
    },
    {
        "name": "move-graph-replaces-and-empties-source",
        "source": "update spec §3.2.4 (MOVE overwrites destination, "
                  "removes source)",
        "named": {
            "http://example/src": "@prefix : <http://example/> . :s :p 1 .",
            "http://example/dst": "@prefix : <http://example/> . :d :p 2 .",
        },
        "update": ["MOVE <http://example/src> TO <http://example/dst>"],
        "query": _EX + """SELECT ?s WHERE {
            { GRAPH <http://example/dst> { ?s :p ?o } }
            UNION { GRAPH <http://example/src> { ?s :p ?o } } }""",
        "results": [{"s": "<http://example/s>"}],
    },
    {
        "name": "copy-overwrites-destination",
        "source": "update spec §3.2.3 COPY (destination replaced, source "
                  "kept)",
        "named": {
            "http://example/src": "@prefix : <http://example/> . :s :p 1 .",
            "http://example/dst": "@prefix : <http://example/> . :d :p 2 .",
        },
        "update": ["COPY <http://example/src> TO <http://example/dst>"],
        "query": _EX + """SELECT ?s WHERE {
            GRAPH <http://example/dst> { ?s ?p ?o } }""",
        "results": [{"s": "<http://example/s>"}],
    },
    {
        "name": "request-sequence-semicolon",
        "source": "update spec §3 (a request is a ';'-separated sequence "
                  "applied in order to the same store)",
        "update": ["PREFIX : <http://example/>\n"
                   "INSERT DATA { :x :p 1 } ;\n"
                   "INSERT DATA { :y :p 2 } ;\n"
                   "DELETE DATA { :x :p 1 }"],
        "query": _EX + "SELECT ?s WHERE { ?s :p ?o }",
        "results": [{"s": "<http://example/y>"}],
    },
    {
        "name": "delete-where-graph-pattern",
        "source": "update spec §3.1.3.1 (DELETE WHERE with GRAPH removes "
                  "the matched quads from their graphs)",
        "data": "@prefix : <http://example/> . :keep :p 1 .",
        "named": {"http://example/g": """@prefix : <http://example/> .
            :a :gone 1 . :b :stays 2 ."""},
        "update": ["""PREFIX : <http://example/>
            DELETE WHERE { GRAPH <http://example/g> { ?s :gone ?o } }"""],
        "query": _EX + "SELECT ?s WHERE { ?s ?p ?o }",
        "results": [{"s": "<http://example/keep>"},
                    {"s": "<http://example/b>"}],
    },
]
