"""W3C conformance corpus — property paths.

Sources: SPARQL 1.1 Query §9 normative examples (exact) and the
semantics-defining arbitrary-length cases of rdf-tests
sparql11/property-path (transcribed): §18.4 ALP visits each node ONCE —
cycles and diamonds yield DISTINCT nodes.
"""

_FOAF = """@prefix : <http://example/> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
:x foaf:mbox <mailto:alice> .
:x foaf:knows :y .
:y foaf:knows :z .
:y foaf:name "Bob" .
:z foaf:name "Clare" .
:z foaf:nick "CT" .
"""

_QF = "PREFIX : <http://example/>\n" \
      "PREFIX foaf: <http://xmlns.com/foaf/0.1/>\n"

CASES = [
    {
        "name": "seq-path",
        "source": "spec §9.2 (knows/knows/name)",
        "data": _FOAF,
        "query": _QF + """
            SELECT ?name WHERE {
              ?x foaf:mbox <mailto:alice> .
              ?x foaf:knows/foaf:knows/foaf:name ?name .
            }""",
        "results": [{"name": '"Clare"'}],
    },
    {
        "name": "inverse-in-seq",
        "source": "spec §9.2 (mailbox of people known by someone)",
        "data": _FOAF,
        "query": _QF + """
            SELECT ?x ?y WHERE { ?x foaf:knows/^foaf:knows ?y .
                                 FILTER(?x != ?y) }""",
        # :x knows :y; who else knows :y? nobody but :x. :y knows :z;
        # ^knows of :z = :y only ⇒ no pair with x≠y except none
        "results": [],
    },
    {
        "name": "plus-path",
        "source": "spec §9.2 (knows+/name)",
        "data": _FOAF,
        "query": _QF + """
            SELECT ?name WHERE {
              ?x foaf:mbox <mailto:alice> .
              ?x foaf:knows+/foaf:name ?name .
            }""",
        "results": [{"name": '"Bob"'}, {"name": '"Clare"'}],
    },
    {
        "name": "alternative-path",
        "source": "spec §9.2 (dc:title | rdfs:label)",
        "data": """@prefix dc: <http://purl.org/dc/elements/1.1/> .
            @prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .
            @prefix : <http://example/> .
            :b1 dc:title "T1" .
            :b2 rdfs:label "L2" .
            :b3 :other "X" .
        """,
        "query": """PREFIX dc: <http://purl.org/dc/elements/1.1/>
            PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
            SELECT ?displayString WHERE {
              ?book dc:title|rdfs:label ?displayString .
            }""",
        "results": [{"displayString": '"T1"'}, {"displayString": '"L2"'}],
    },
    {
        "name": "star-cycle-distinct",
        "source": "rdf-tests property-path cycle tests (transcribed; §18.4 ALP)",
        "data": """@prefix : <http://example/> .
            :n0 :p :n1 . :n1 :p :n2 . :n2 :p :n0 .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?x WHERE { :n0 :p* ?x }""",
        # each reachable node exactly once, including the start
        "results": [{"x": "<http://example/n0>"},
                    {"x": "<http://example/n1>"},
                    {"x": "<http://example/n2>"}],
    },
    {
        "name": "plus-diamond-distinct",
        "source": "rdf-tests property-path diamond tests (transcribed; §18.4 ALP)",
        "data": """@prefix : <http://example/> .
            :a :p :b . :a :p :c . :b :p :d . :c :p :d .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?x WHERE { :a :p+ ?x }""",
        # :d reachable two ways but reported once
        "results": [{"x": "<http://example/b>"},
                    {"x": "<http://example/c>"},
                    {"x": "<http://example/d>"}],
    },
    {
        "name": "star-unbound-both-ends",
        "source": "rdf-tests property-path pp35 shape (transcribed)",
        "data": """@prefix : <http://example/> .
            :a :p :b .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?x ?y WHERE { ?x :p* ?y }""",
        # every node in the graph reaches itself by the empty path, plus
        # the one-step pair
        "results": [{"x": "<http://example/a>", "y": "<http://example/a>"},
                    {"x": "<http://example/b>", "y": "<http://example/b>"},
                    {"x": "<http://example/a>", "y": "<http://example/b>"}],
    },
    {
        "name": "zero-or-one",
        "source": "rdf-tests property-path pp28 shape (transcribed)",
        "data": """@prefix : <http://example/> .
            :a :p :b . :b :p :c .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?x WHERE { :a :p? ?x }""",
        "results": [{"x": "<http://example/a>"},
                    {"x": "<http://example/b>"}],
    },
    {
        "name": "negated-property-set",
        "source": "spec §9.2 (!(rdf:type) forward)",
        "data": """@prefix : <http://example/> .
            @prefix rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#> .
            :x rdf:type :Class .
            :x :p "v" .
        """,
        "query": """PREFIX : <http://example/>
            PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
            SELECT ?o WHERE { :x !rdf:type ?o }""",
        "results": [{"o": '"v"'}],
    },
    {
        "name": "negated-set-with-inverse",
        "source": "rdf-tests property-path NPS shape (transcribed; §9.1 !(:p|^:q))",
        "data": """@prefix : <http://example/> .
            :a :p :b . :c :q :a . :a :r :d .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?x WHERE { :a !(:p|^:q) ?x }""",
        # forward edges of :a not labeled :p (→ :d), plus reversed edges
        # whose label is not :q (none: the only incoming edge is :q)
        "results": [{"x": "<http://example/d>"}],
    },
    {
        "name": "star-absent-constant-endpoint",
        "source": "rdf-tests property-path pp30 shape (transcribed; §18.4 "
                  "zero-length path binds absent constants)",
        "data": """@prefix : <http://example/> .
            :a :p :b .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?x WHERE { :zzz :p* ?x }""",
        # :zzz occurs nowhere, but the zero-length path still yields it
        "results": [{"x": "<http://example/zzz>"}],
    },
    {
        "name": "inverse-path",
        "source": "spec §9.2 (^foaf:mbox)",
        "data": _FOAF,
        "query": _QF + "SELECT ?x WHERE { <mailto:alice> ^foaf:mbox ?x }",
        "results": [{"x": "<http://example/x>"}],
    },
    {
        "name": "seq-star-combo",
        "source": "rdf-tests property-path pp14 shape (transcribed)",
        "data": """@prefix : <http://example/> .
            :a :p1 :b . :b :p2 :c . :c :p2 :d .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?x WHERE { :a :p1/:p2* ?x }""",
        "results": [{"x": "<http://example/b>"},
                    {"x": "<http://example/c>"},
                    {"x": "<http://example/d>"}],
    },
]
