"""TriX reader (SURVEY B50; the reference's Rio stack registers the TriX
parser via rdf4j-runtime, pom.xml:80-90 — format per the HPL/W3C TriX
note and rdf4j's ``application/trix`` media type).

Document shape::

    <TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
      <graph>
        <uri>http://example/g</uri>          <!-- optional graph name -->
        <triple>
          <uri>http://example/s</uri>
          <uri>http://example/p</uri>
          <plainLiteral xml:lang="en">text</plainLiteral>
        </triple>
      </graph>
    </TriX>

Term elements: ``uri``, ``id`` (blank node), ``plainLiteral`` (optional
``xml:lang``), ``typedLiteral`` (``datatype`` attribute). A ``graph``
with no ``uri`` name is the default graph (g = None). Like the other
non-splittable readers (turtle/rdfxml/jsonld), the Spark parse unit is
one FILE; directories parallelize one task per file.
"""

from __future__ import annotations

TRIX_NS = "http://www.w3.org/2004/03/trix/trix-1/"
XML_LANG = "{http://www.w3.org/XML/1998/namespace}lang"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def _term(el):
    """One term element → (lex, dt, lang) in the repo's quad convention:
    IRIs/bnodes carry dt=lang=None; plain literals are xsd:string;
    language-tagged ones rdf:langString (lang lowercased, matching the
    Turtle reader)."""
    t = _local(el.tag)
    text = el.text or ""
    if t == "uri":
        return (text.strip(), None, None)
    if t == "id":
        label = text.strip()
        return (label if label.startswith("_:") else "_:" + label,
                None, None)
    if t == "plainLiteral":
        lang = el.get(XML_LANG)
        if lang:
            return (text, RDF + "langString", lang.lower())
        return (text, XSD + "string", None)
    if t == "typedLiteral":
        dt = el.get("datatype")
        if not dt:
            raise ValueError("trix: typedLiteral without datatype")
        return (text, dt, None)
    raise ValueError(f"trix: unknown term element <{t}>")


def parse_trix(text: str):
    """Iterate (g, s, p, (o_lex, o_dt, o_lang)) quads of one TriX
    document; ``g`` is None for the unnamed (default) graph."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(text)
    if _local(root.tag) != "TriX":
        raise ValueError(f"trix: root element is <{_local(root.tag)}>, "
                         "expected <TriX>")
    for graph in root:
        if _local(graph.tag) != "graph":
            raise ValueError(f"trix: unexpected <{_local(graph.tag)}> "
                             "under <TriX>")
        gname = None
        for child in graph:
            tag = _local(child.tag)
            if tag == "uri" and gname is None:
                # graph name (the note allows one; extras would be
                # triples-element siblings and are rejected below)
                gname = (child.text or "").strip()
                continue
            if tag != "triple":
                raise ValueError(f"trix: unexpected <{tag}> under <graph>")
            terms = [_term(el) for el in child]
            if len(terms) != 3:
                raise ValueError(
                    f"trix: <triple> has {len(terms)} terms, expected 3")
            (s, s_dt, _), (p, p_dt, _), obj = terms
            if s_dt is not None:
                raise ValueError("trix: literal subject")
            if p_dt is not None or p.startswith("_:"):
                raise ValueError("trix: predicate must be a URI")
            yield (gname, s, p, obj)
