"""RDF/JSON reader (SURVEY B50; the reference's Rio stack registers the
RDF/JSON parser via rdf4j-runtime, pom.xml:80-90 — format per the W3C
"RDF 1.1 JSON Alternate Serialization (RDF/JSON)" note,
``application/rdf+json``, extension ``.rj``).

Document shape::

    { "http://example/s": {
        "http://example/p": [
          { "value": "http://example/o", "type": "uri" },
          { "value": "text", "type": "literal", "lang": "en" },
          { "value": "4",    "type": "literal",
            "datatype": "http://www.w3.org/2001/XMLSchema#integer" },
          { "value": "b0",   "type": "bnode" } ] } }

Subject keys starting ``_:`` are blank nodes. RDF/JSON has no named-
graph slot — the format serializes a single graph (same as rdf4j's
RDFJSONWriter, which drops statement contexts). Like the other
non-splittable readers, the Spark parse unit is one FILE.
"""

from __future__ import annotations

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"


def parse_rdfjson(text: str):
    """Iterate (s, p, (o_lex, o_dt, o_lang)) triples of one RDF/JSON
    document, in the repo's quad convention (IRIs/bnodes dt=lang=None,
    plain literals xsd:string, language-tagged rdf:langString)."""
    import json

    doc = json.loads(text)
    if not isinstance(doc, dict):
        raise ValueError("rdf/json: document root must be an object")
    for s, props in doc.items():
        if not isinstance(props, dict):
            raise ValueError(f"rdf/json: subject {s!r} must map to an "
                             "object of predicates")
        for p, objs in props.items():
            if not isinstance(objs, list):
                raise ValueError(f"rdf/json: predicate {p!r} must map to "
                                 "an array of value objects")
            for o in objs:
                typ = o.get("type")
                val = o.get("value")
                if val is None:
                    raise ValueError("rdf/json: value object without "
                                     "'value'")
                if typ == "uri":
                    yield (s, p, (val, None, None))
                elif typ == "bnode":
                    yield (s, p, (val if val.startswith("_:")
                                  else "_:" + val, None, None))
                elif typ == "literal":
                    lang = o.get("lang")
                    dt = o.get("datatype")
                    if lang:
                        yield (s, p, (val, RDF + "langString",
                                      lang.lower()))
                    elif dt:
                        yield (s, p, (val, dt, None))
                    else:
                        yield (s, p, (val, XSD + "string", None))
                else:
                    raise ValueError(f"rdf/json: unknown value type "
                                     f"{typ!r}")
