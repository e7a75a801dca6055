"""RDF/XML parser (SURVEY B50 parity: the reference's Rio stack parses
RDF/XML via rdf4j-rio-rdfxml, pom.xml:56-90; the adapter's Turtle-only use
is GraphDBSystemAdapter.java:286 — this is the format real users LOAD
``.rdf``/``.owl`` schema files in).

stdlib ``xml.etree`` striped-syntax implementation covering the common
core of the grammar:

* node elements: ``rdf:Description`` and typed nodes (element name = type
  IRI), identified by ``rdf:about`` / ``rdf:ID`` / ``rdf:nodeID`` or
  anonymous (fresh bnode);
* property attributes on node elements (plain-literal shorthand);
* property elements with ``rdf:resource`` / ``rdf:nodeID`` objects, text
  literals (``rdf:datatype``, inherited ``xml:lang``), nested node
  elements, and ``rdf:parseType`` Resource / Literal / Collection;
* ``rdf:li`` container membership (expands to ``rdf:_n``);
* ``xml:base`` scoping for relative IRI / ``rdf:ID`` resolution.

Like the Turtle/TriG readers, one FILE is one parse unit — RDF/XML is not
splittable — so a directory of files parses in parallel, one task each
(see :func:`graphdb_free_mocha_sa_spark.sources.rdf.read_rdfxml`).
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
import zlib

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XML_NS = "http://www.w3.org/XML/1998/namespace"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"

_RDF = "{" + RDF_NS + "}"
_LANG = "{" + XML_NS + "}lang"
_BASE = "{" + XML_NS + "}base"

#: rdf: attributes that are syntax, not property attributes
_SYNTAX_ATTRS = {_RDF + a for a in
                 ("about", "ID", "nodeID", "resource", "datatype",
                  "parseType", "RDF", "li")}


class RdfXmlParser:
    """One document → iterator of (s, p, (lex, dt, lang)) triples."""

    def __init__(self, text: str, base: str | None = None):
        self.text = text
        self.base = base
        self._bn = 0
        self._scope = f"{zlib.crc32(text.encode()):08x}"
        self.triples: list[tuple] = []

    def _fresh_bnode(self) -> str:
        self._bn += 1
        return f"_:rx{self._scope}_{self._bn}"

    def _resolve(self, iri: str, base: str | None) -> str:
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return iri
        b = base or self.base or ""
        if iri.startswith("#") or iri == "":
            return b.split("#")[0] + iri
        # relative path: resolve against the base's directory
        if "/" in b:
            return b.rsplit("/", 1)[0] + "/" + iri
        return b + iri

    def _uri_of_tag(self, tag: str) -> str:
        # ElementTree tags are {namespace}local
        if tag.startswith("{"):
            ns, local = tag[1:].split("}", 1)
            return ns + local
        return tag

    def parse(self):
        root = ET.fromstring(self.text)
        base = root.get(_BASE, self.base)
        lang = root.get(_LANG)
        if root.tag == _RDF + "RDF":
            for child in root:
                self._node_element(child, base, lang)
        else:
            self._node_element(root, base, lang)
        return iter(self.triples)

    def _emit(self, s, p, o):
        self.triples.append((s, p, o))

    def _subject_of(self, el, base) -> str:
        if _RDF + "about" in el.attrib:
            return self._resolve(el.get(_RDF + "about"), base)
        if _RDF + "ID" in el.attrib:
            return self._resolve("#" + el.get(_RDF + "ID"), base)
        if _RDF + "nodeID" in el.attrib:
            return "_:" + el.get(_RDF + "nodeID")
        return self._fresh_bnode()

    def _node_element(self, el, base, lang=None) -> str:
        base = el.get(_BASE, base)
        subj = self._subject_of(el, base)
        tag_uri = self._uri_of_tag(el.tag)
        if tag_uri != RDF_NS + "Description":
            self._emit(subj, RDF_NS + "type", (tag_uri, None, None))
        lang = el.get(_LANG, lang)          # xml:lang inherits (spec §6)
        # property attributes (plain-literal shorthand; a lang in scope
        # makes them rdf:langString — dt=None is reserved for IRI/bnode)
        for k, v in el.attrib.items():
            if k in _SYNTAX_ATTRS or k.startswith("{" + XML_NS + "}"):
                continue
            self._emit(subj, self._uri_of_tag(k),
                       (v, RDF_NS + "langString" if lang else XSD_STRING,
                        lang))
        li = 0
        for prop in el:
            li = self._property_element(subj, prop, base, lang, li)
        return subj

    def _property_element(self, subj, prop, base, lang, li) -> int:
        base = prop.get(_BASE, base)
        lang = prop.get(_LANG, lang)
        p_uri = self._uri_of_tag(prop.tag)
        if p_uri == RDF_NS + "li":
            li += 1
            p_uri = f"{RDF_NS}_{li}"
        parse_type = prop.get(_RDF + "parseType")
        if parse_type == "Resource":
            node = self._fresh_bnode()
            self._emit(subj, p_uri, (node, None, None))
            inner_li = 0
            for sub in prop:
                inner_li = self._property_element(node, sub, base, lang,
                                                 inner_li)
            return li
        if parse_type == "Literal":
            xml_lex = ((prop.text or "")
                       + "".join(ET.tostring(c, encoding="unicode")
                                 for c in prop))
            self._emit(subj, p_uri,
                       (xml_lex, RDF_NS + "XMLLiteral", None))
            return li
        if parse_type == "Collection":
            nodes = [self._node_element(c, base, lang) for c in prop]
            if not nodes:
                self._emit(subj, p_uri, (RDF_NS + "nil", None, None))
                return li
            cells = [self._fresh_bnode() for _ in nodes]
            self._emit(subj, p_uri, (cells[0], None, None))
            for i, (cell, node) in enumerate(zip(cells, nodes)):
                self._emit(cell, RDF_NS + "first", (node, None, None))
                nxt = cells[i + 1] if i + 1 < len(cells) else RDF_NS + "nil"
                self._emit(cell, RDF_NS + "rest", (nxt, None, None))
            return li
        if _RDF + "resource" in prop.attrib:
            obj = self._resolve(prop.get(_RDF + "resource"), base)
            self._emit(subj, p_uri, (obj, None, None))
            return li
        if _RDF + "nodeID" in prop.attrib:
            self._emit(subj, p_uri,
                       ("_:" + prop.get(_RDF + "nodeID"), None, None))
            return li
        children = list(prop)
        if children:
            # nested node element(s)
            for child in children:
                obj = self._node_element(child, base, lang)
                self._emit(subj, p_uri, (obj, None, None))
            return li
        # property attributes on an empty property element → implicit bnode
        prop_attrs = [(k, v) for k, v in prop.attrib.items()
                      if k not in _SYNTAX_ATTRS
                      and not k.startswith("{" + XML_NS + "}")]
        if prop_attrs and not (prop.text or "").strip():
            node = self._fresh_bnode()
            self._emit(subj, p_uri, (node, None, None))
            for k, v in prop_attrs:
                self._emit(node, self._uri_of_tag(k),
                           (v, RDF_NS + "langString" if lang else XSD_STRING,
                            lang))
            return li
        dt = prop.get(_RDF + "datatype")
        lex = prop.text or ""
        if dt is not None:
            self._emit(subj, p_uri, (lex, self._resolve(dt, base), None))
        elif lang:
            self._emit(subj, p_uri,
                       (lex, RDF_NS + "langString", lang))
        else:
            self._emit(subj, p_uri, (lex, XSD_STRING, None))
        return li


def parse_rdfxml(text: str, base: str | None = None):
    """Iterate (s, p, (o_lex, o_dt, o_lang)) triples of one RDF/XML
    document. IRI/bnode objects have ``o_dt`` and ``o_lang`` None."""
    return RdfXmlParser(text, base).parse()
