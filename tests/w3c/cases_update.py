"""W3C conformance corpus — SPARQL 1.1 Update.

Source: normative examples in the SPARQL 1.1 Update Recommendation §3
(exact). Each case applies updates to the loaded dataset, then checks
the resulting state with a SELECT/ASK query.
"""

_QD = "PREFIX dc: <http://purl.org/dc/elements/1.1/>\n" \
      "PREFIX ns: <http://example.org/ns#>\n"

CASES = [
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
