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
