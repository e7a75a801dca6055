"""W3C conformance corpus — nondeterministic builtins (shape checks).

Source: SPARQL 1.1 Query §17.4 definitions of RAND/UUID/STRUUID/NOW/
BNODE. Values are nondeterministic, so each case asserts the REQUIRED
shape/type via ASK (the pattern the rdf-tests functions family uses for
these).
"""

XSD = "http://www.w3.org/2001/XMLSchema#"
Q = f"PREFIX xsd: <{XSD}>\n"

CASES = [
    {
        "name": "rand-range-and-type",
        "source": "spec §17.4.4.2 (xsd:double in [0,1))",
        "query": Q + """ASK {
            VALUES ?u { 1 }
            BIND(RAND() AS ?r)
            FILTER(DATATYPE(?r) = xsd:double && ?r >= 0 && ?r < 1)
        }""",
        "ask": True,
    },
    {
        "name": "uuid-form",
        "source": "spec §17.4.2.12 (urn:uuid: IRI)",
        "query": Q + """ASK {
            VALUES ?u { 1 }
            BIND(UUID() AS ?id)
            FILTER(isIRI(?id) && REGEX(STR(?id),
              "^urn:uuid:[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$",
              "i"))
        }""",
        "ask": True,
    },
    {
        "name": "struuid-form",
        "source": "spec §17.4.2.13 (bare UUID string, simple literal)",
        "query": Q + """ASK {
            VALUES ?u { 1 }
            BIND(STRUUID() AS ?id)
            FILTER(isLITERAL(?id) && DATATYPE(?id) = xsd:string
                   && REGEX(?id,
              "^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$",
              "i"))
        }""",
        "ask": True,
    },
    {
        "name": "uuid-fresh-per-call",
        "source": "spec §17.4.2.12 (different on each call)",
        "query": "ASK { VALUES ?u { 1 } FILTER(UUID() != UUID()) }",
        "ask": True,
    },
    {
        "name": "bnode-fresh-and-stable",
        "source": "spec §17.4.2.9 (BNODE(str) stable within a solution, "
                  "distinct across solutions)",
        "data": "@prefix : <http://example/> .\n:a :p 1 . :b :p 2 .\n",
        "query": """PREFIX : <http://example/>
            ASK {
              { SELECT ?s (BNODE("x") AS ?n1) (BNODE("x") AS ?n2)
                WHERE { ?s :p ?o } }
              FILTER(isBLANK(?n1) && SAMETERM(?n1, ?n2))
            }""",
        "ask": True,
    },
]

CASES += [
    {
        "name": "now-constant-within-query",
        "source": "spec §17.4.5.1 (NOW returns the SAME value for the "
                  "whole query execution)",
        "query": Q + """ASK {
            VALUES ?u { 1 2 3 }
            BIND(NOW() AS ?a)
            BIND(NOW() AS ?b)
            FILTER(?a = ?b)
        }""",
        "ask": True,
    },
    {
        "name": "now-datatype",
        "source": "spec §17.4.5.1 (xsd:dateTime)",
        "query": Q + """ASK {
            VALUES ?u { 1 }
            BIND(NOW() AS ?t)
            FILTER(DATATYPE(?t) = xsd:dateTime)
        }""",
        "ask": True,
    },
    {
        "name": "bnode-arg-stable-within-solution",
        "source": "spec §17.4.2.9 (BNODE(str): same bnode for the same "
                  "argument WITHIN a solution, distinct across solutions)",
        "query": Q + """ASK {
            VALUES ?u { 1 }
            BIND(BNODE("k") AS ?a)
            BIND(BNODE("k") AS ?b)
            FILTER(?a = ?b && isBlank(?a))
        }""",
        "ask": True,
    },
    {
        "name": "bnode-distinct-across-solutions",
        "source": "spec §17.4.2.9 (fresh bnodes per solution)",
        "query": Q + """ASK {
            {
              SELECT (COUNT(DISTINCT ?a) AS ?n) WHERE {
                VALUES ?u { 1 2 3 }
                BIND(BNODE("k") AS ?a)
              }
            }
            FILTER(?n = 3)
        }""",
        "ask": True,
    },
    {
        "name": "rand-independent-per-bind",
        "source": "spec §17.4.4.2 (each RAND() call is an independent "
                  "draw: 3 rows x 2 binds stay in range and the query "
                  "still evaluates deterministically in SHAPE)",
        "query": Q + """ASK {
            VALUES ?u { 1 2 3 }
            BIND(RAND() AS ?r1)
            BIND(RAND() AS ?r2)
            FILTER(?r1 >= 0 && ?r1 < 1 && ?r2 >= 0 && ?r2 < 1)
        }""",
        "ask": True,
    },
]
