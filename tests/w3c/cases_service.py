"""W3C conformance corpus — SERVICE (SPARQL 1.1 Federated Query).

Sources: Federated Query Recommendation §2-§4 semantics (SILENT turns an
endpoint FAILURE into the unit solution, never an EMPTY result; variable
endpoints evaluate per bound value and error when unbound) — the same
matrix test_service_protocol.py pins, folded into the corpus per the r9
verdict (item 6) with the harness's scripted loopback endpoint.
"""

_LOCAL = """@prefix : <urn:> .
    <urn:r:x> <urn:local> "here" .
    <urn:other> <urn:local> "nope" .
"""

_LABELS = [
    {"s": {"type": "uri", "value": "urn:r:x"},
     "lab": {"type": "literal", "value": "remote-x"}},
    {"s": {"type": "uri", "value": "urn:r:y"},
     "lab": {"type": "literal", "value": "remote-y"}},
]

_PARTIAL = [
    {"s": {"type": "uri", "value": "urn:r:x"},
     "lab": {"type": "literal", "value": "remote-x"}},
    {"s": {"type": "uri", "value": "urn:r:y"}},
]

CASES = [
    {
        "name": "service-join-remote-local",
        "source": "fed-query §2.1 (basic SERVICE join)",
        "data": _LOCAL,
        "service": {"/labels": _LABELS},
        "query": """SELECT ?s ?lab ?loc WHERE {
            ?s <urn:local> ?loc .
            SERVICE <{SVC}/labels> { ?s <urn:r:label> ?lab } }""",
        "results": [{"s": "<urn:r:x>", "lab": '"remote-x"',
                     "loc": '"here"'}],
    },
    {
        "name": "service-empty-is-zero-solutions",
        "source": "fed-query §2.2 (empty = success with zero solutions)",
        "data": _LOCAL,
        "service": {"/empty": []},
        "query": """SELECT ?s ?lab WHERE {
            ?s <urn:local> ?loc .
            SERVICE <{SVC}/empty> { ?s <urn:r:label> ?lab } }""",
        "results": [],
    },
    {
        "name": "service-silent-empty-not-unit",
        "source": "fed-query §3 (SILENT does not resurrect empty)",
        "data": _LOCAL,
        "service": {"/empty": []},
        "query": """SELECT ?s ?lab WHERE {
            ?s <urn:local> ?loc .
            SERVICE SILENT <{SVC}/empty> { ?s <urn:r:label> ?lab } }""",
        "results": [],
    },
    {
        "name": "service-silent-unreachable-unit",
        "source": "fed-query §3 (SILENT failure = unit solution)",
        "data": _LOCAL,
        "query": """SELECT ?s WHERE {
            ?s <urn:local> "here" .
            SERVICE SILENT <{SVC_DOWN}> { ?s ?q ?o } }""",
        "results": [{"s": "<urn:r:x>"}],
    },
    {
        "name": "service-silent-http-error-unit",
        "source": "fed-query §3 (HTTP error under SILENT)",
        "data": _LOCAL,
        "service": {"/err": 500},
        "query": """SELECT ?s WHERE {
            ?s <urn:local> "here" .
            SERVICE SILENT <{SVC}/err> { ?s <urn:r:label> ?lab } }""",
        "results": [{"s": "<urn:r:x>"}],
    },
    {
        "name": "service-silent-bad-payload-unit",
        "source": "fed-query §3 (undecodable payload under SILENT)",
        "data": _LOCAL,
        "service": {"/bad": {"code": 200, "body": "<html>not json</html>",
                             "ctype": "text/html"}},
        "query": """SELECT ?s WHERE {
            ?s <urn:local> "here" .
            SERVICE SILENT <{SVC}/bad> { ?s <urn:r:label> ?lab } }""",
        "results": [{"s": "<urn:r:x>"}],
    },
    {
        "name": "service-error-without-silent",
        "source": "fed-query §3 (failure without SILENT is a query error)",
        "data": _LOCAL,
        "service": {"/err": 500},
        "query": """SELECT ?s WHERE {
            ?s <urn:local> "here" .
            SERVICE <{SVC}/err> { ?s <urn:r:label> ?lab } }""",
        "error": True,
    },
    {
        "name": "service-var-endpoint-bound",
        "source": "fed-query §4 / rdf-tests service (variable endpoint)",
        "service": {"/labels": _LABELS},
        "query": """SELECT ?lab WHERE {
            VALUES ?ep { <{SVC}/labels> }
            SERVICE ?ep { ?s <urn:r:label> ?lab } }""",
        "results": [{"lab": '"remote-x"'}, {"lab": '"remote-y"'}],
    },
    {
        "name": "service-var-endpoint-unbound-silent-unit",
        "source": "fed-query §4 (unbound endpoint var under SILENT)",
        "data": _LOCAL,
        "query": """SELECT ?s WHERE {
            ?s <urn:local> "here" .
            SERVICE SILENT ?nowhere { ?s ?q ?o } }""",
        "results": [{"s": "<urn:r:x>"}],
    },
    {
        "name": "service-partial-bindings-compat-join",
        "source": "fed-query §2.2 (remote unbound joins compatibly)",
        "service": {"/partial": _PARTIAL},
        "query": """SELECT ?s ?lab WHERE {
            VALUES ?s { <urn:r:x> <urn:r:y> }
            SERVICE <{SVC}/partial> { ?s <urn:r:label> ?lab } }""",
        "results": [{"s": "<urn:r:x>", "lab": '"remote-x"'},
                    {"s": "<urn:r:y>"}],
    },
]
