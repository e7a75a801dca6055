"""W3C conformance corpus — BIND and VALUES.

Sources: SPARQL 1.1 Query §10.1 (BIND books example, exact), §10.2 /
§13.2 (VALUES examples, exact), plus rdf-tests sparql11/bind scope
semantics (transcribed).
"""

_BOOKS = """@prefix dc:   <http://purl.org/dc/elements/1.1/> .
@prefix :     <http://example.org/book/> .
@prefix ns:   <http://example.org/ns#> .
:book1  dc:title  "SPARQL Tutorial" .
:book1  ns:price  42 .
:book1  ns:discount 0.2 .
:book2  dc:title  "The Semantic Web" .
:book2  ns:price  23 .
:book2  ns:discount 0.25 .
"""

_VBOOKS = """@prefix dc:   <http://purl.org/dc/elements/1.1/> .
@prefix :     <http://example.org/book/> .
@prefix ns:   <http://example.org/ns#> .
:book1  dc:title  "SPARQL Tutorial" .
:book1  ns:price  42 .
:book2  dc:title  "The Semantic Web" .
:book2  ns:price  23 .
"""

_QPFX = """PREFIX dc: <http://purl.org/dc/elements/1.1/>
PREFIX : <http://example.org/book/>
PREFIX ns: <http://example.org/ns#>
"""

CASES = [
    {
        "name": "bind-price",
        "source": "spec §10.1",
        "data": _BOOKS,
        "query": _QPFX + """
            SELECT ?title ?price
            WHERE {
              ?x ns:price ?p .
              ?x ns:discount ?discount
              BIND(?p * (1 - ?discount) AS ?price)
              FILTER(?price < 20)
              ?x dc:title ?title .
            }""",
        "results": [{"title": '"The Semantic Web"',
                     "price": '"17.25"^^xsd:decimal'}],
        "lax_num": True,
    },
    {
        "name": "bind-scope-same-group",
        "source": "rdf-tests bind/bind10-11 semantics (transcribed)",
        "data": "@prefix : <http://example.org/> .\n:s :p 1 . :s :q 2 .\n",
        # BIND ends the preceding group: ?o2 is NOT visible to the BIND
        "query": """PREFIX : <http://example.org/>
            SELECT ?z WHERE {
              ?s :p ?o .
              BIND(?o + 10 AS ?z)
            }""",
        "results": [{"z": '"11"^^xsd:integer'}],
    },
    {
        "name": "bind-error-leaves-unbound",
        "source": "spec §10.1 (errors produce unbound)",
        "data": "@prefix : <http://example.org/> .\n"
                ':s :p 1 . :s :p "str" .\n',
        "query": """PREFIX : <http://example.org/>
            SELECT ?o ?z WHERE {
              ?s :p ?o .
              BIND(?o + 1 AS ?z)
            }""",
        "results": [{"o": '"1"^^xsd:integer', "z": '"2"^^xsd:integer'},
                    {"o": '"str"'}],
    },
    {
        "name": "values-one-var",
        "source": "spec §10.2.2",
        "data": _VBOOKS,
        "query": _QPFX + """
            SELECT ?book ?title ?price
            WHERE {
              VALUES ?book { :book1 :book3 }
              ?book dc:title ?title ;
                    ns:price ?price .
            }""",
        "results": [{"book": "<http://example.org/book/book1>",
                     "title": '"SPARQL Tutorial"',
                     "price": '"42"^^xsd:integer'}],
    },
    {
        "name": "values-two-vars-undef",
        "source": "spec §10.2.2 (multi-var with UNDEF)",
        "data": _VBOOKS,
        "query": _QPFX + """
            SELECT ?book ?title ?price
            WHERE {
              ?book dc:title ?title ;
                    ns:price ?price .
              VALUES (?book ?title)
              { (UNDEF "SPARQL Tutorial")
                (:book2 UNDEF)
              }
            }""",
        "results": [{"book": "<http://example.org/book/book1>",
                     "title": '"SPARQL Tutorial"',
                     "price": '"42"^^xsd:integer'},
                    {"book": "<http://example.org/book/book2>",
                     "title": '"The Semantic Web"',
                     "price": '"23"^^xsd:integer'}],
    },
    {
        "name": "values-trailing",
        "source": "spec §10.2.1 (query-level VALUES)",
        "data": _VBOOKS,
        "query": _QPFX + """
            SELECT ?book ?title ?price
            WHERE {
              ?book dc:title ?title ;
                    ns:price ?price .
            }
            VALUES (?book ?title)
            { (UNDEF "SPARQL Tutorial")
              (:book2 UNDEF)
            }""",
        "results": [{"book": "<http://example.org/book/book1>",
                     "title": '"SPARQL Tutorial"',
                     "price": '"42"^^xsd:integer'},
                    {"book": "<http://example.org/book/book2>",
                     "title": '"The Semantic Web"',
                     "price": '"23"^^xsd:integer'}],
    },
    {
        "name": "bind-redefine-is-error",
        "source": "rdf-tests syntax (BIND on in-scope var)",
        "query": """PREFIX : <http://example.org/>
            SELECT * WHERE { ?s :p ?o . BIND(1 AS ?o) }""",
        "syntax": "neg",
    },
]

CASES += [
    {
        "name": "values-all-undef-row",
        "source": "spec §10.2.2 (a row of all UNDEF is compatible with "
                  "every solution)",
        "data": _VBOOKS,
        "query": _QPFX + """
            SELECT ?book ?title WHERE {
              ?book dc:title ?title .
              VALUES (?title) { (UNDEF) ("SPARQL Tutorial") }
            } ORDER BY ?book ?title""",
        "ordered": True,
        "results": [
            {"book": "<http://example.org/book/book1>",
             "title": '"SPARQL Tutorial"'},
            {"book": "<http://example.org/book/book1>",
             "title": '"SPARQL Tutorial"'},
            {"book": "<http://example.org/book/book2>",
             "title": '"The Semantic Web"'},
        ],
    },
    {
        "name": "values-no-match-empty",
        "source": "spec §10.2 (a VALUES constraint absent from the data "
                  "joins to nothing)",
        "data": _VBOOKS,
        "query": _QPFX + """
            SELECT ?book WHERE {
              ?book dc:title ?title .
              VALUES ?title { "No Such Book" }
            }""",
        "results": [],
    },
    {
        "name": "values-then-filter",
        "source": "rdf-tests bind/values composition shape (transcribed)",
        "data": _VBOOKS,
        "query": _QPFX + """
            SELECT ?book WHERE {
              VALUES ?book { :book1 :book2 }
              ?book ns:price ?p .
              FILTER(?p > 30)
            }""",
        "results": [{"book": "<http://example.org/book/book1>"}],
    },
    {
        "name": "bind-then-join-on-bound-var",
        "source": "spec §10.1 (the BIND-ed variable joins subsequent "
                  "patterns in the group)",
        "data": _VBOOKS,
        "query": _QPFX + """
            SELECT ?title WHERE {
              BIND(:book2 AS ?b)
              ?b dc:title ?title .
            }""",
        "results": [{"title": '"The Semantic Web"'}],
    },
]
