"""RDFa 1.1 Core parser over HTML/XHTML (SURVEY B50 parity: the
reference's rdf4j Rio registry advertises RDFa among its parse formats,
pom.xml:80-90; the adapter itself only ever feeds Turtle,
GraphDBSystemAdapter.java:286 — RDFa is the "extract triples from a web
page" path a real GraphDB user hits via LOAD <page.html>).

Implementation = the RDFa Core 1.1 §7.5 processing sequence over a DOM
built with stdlib ``html.parser`` (tolerant of real-world HTML: void
elements, unclosed tags, attribute case). Covered — which is a superset
of RDFa Lite 1.1 (the profile search engines consume):

* ``@about`` / ``@resource`` / ``@href`` / ``@src`` subject/object
  establishment, including the 1.1 `@property`-only literal/link duality;
* ``@typeof`` (typed resources, auto-bnodes for hanging types);
* ``@rel`` / ``@rev`` with incomplete-triple chaining completed by
  descendant subjects (spec §7.5 steps 10/12);
* ``@prefix`` (1.1), ``xmlns:*`` (1.0 compat), ``@vocab``, terms against
  the active vocabulary, safe CURIEs ``[p:ref]``, ``_:`` blank nodes,
  and the W3C RDFa initial-context prefixes;
* literals: ``@content``, ``@datatype`` (empty ⇒ plain), HTML5
  ``@datetime`` (type sniffed per HTML+RDFa §3.1), ``@lang`` /
  ``@xml:lang`` inheritance, and descendant text content;
* ``<base href>`` and per-document base fallback.

Not implemented (documented subset, same honesty policy as the codec
family): ``@inlist`` rdf:List collection, ``@role``, RDFa Processor
Graph diagnostics, and ``@profile`` remote context fetch (gone from 1.1
anyway). These raise nothing — RDFa processors are specified to be
lax — the attributes are simply not interpreted.

Like the other non-splittable readers, one FILE is one parse unit; a
directory of pages parses in parallel, one task each (see
:func:`graphdb_free_mocha_sa_spark.sources.rdf.read_rdfa`).
"""

from __future__ import annotations

import re
import zlib
from html.parser import HTMLParser

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
XSD_STRING = XSD + "string"
LANG_STRING = RDF_NS + "langString"

#: W3C RDFa 1.1 initial context (https://www.w3.org/2011/rdfa-context/
#: rdfa-1.1) — the predefined prefixes every conformant processor loads.
INITIAL_CONTEXT = {
    "as": "https://www.w3.org/ns/activitystreams#",
    "cc": "http://creativecommons.org/ns#",
    "csvw": "http://www.w3.org/ns/csvw#",
    "ctag": "http://commontag.org/ns#",
    "dc": "http://purl.org/dc/terms/",
    "dc11": "http://purl.org/dc/elements/1.1/",
    "dcat": "http://www.w3.org/ns/dcat#",
    "dcterms": "http://purl.org/dc/terms/",
    "dqv": "http://www.w3.org/ns/dqv#",
    "duv": "https://www.w3.org/ns/duv#",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "gr": "http://purl.org/goodrelations/v1#",
    "grddl": "http://www.w3.org/2003/g/data-view#",
    "ical": "http://www.w3.org/2002/12/cal/icaltzd#",
    "ldp": "http://www.w3.org/ns/ldp#",
    "ma": "http://www.w3.org/ns/ma-ont#",
    "oa": "http://www.w3.org/ns/oa#",
    "og": "http://ogp.me/ns#",
    "org": "http://www.w3.org/ns/org#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "prov": "http://www.w3.org/ns/prov#",
    "qb": "http://purl.org/linked-data/cube#",
    "rdf": RDF_NS,
    "rdfa": "http://www.w3.org/ns/rdfa#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "rev": "http://purl.org/stuff/rev#",
    "rif": "http://www.w3.org/2007/rif#",
    "rr": "http://www.w3.org/ns/r2rml#",
    "schema": "http://schema.org/",
    "sd": "http://www.w3.org/ns/sparql-service-description#",
    "sioc": "http://rdfs.org/sioc/ns#",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "skosxl": "http://www.w3.org/2008/05/skos-xl#",
    "ssn": "http://www.w3.org/ns/ssn/",
    "sosa": "http://www.w3.org/ns/sosa/",
    "time": "http://www.w3.org/2006/time#",
    "v": "http://rdf.data-vocabulary.org/#",
    "vcard": "http://www.w3.org/2006/vcard/ns#",
    "void": "http://rdfs.org/ns/void#",
    "wdr": "http://www.w3.org/2007/05/powder#",
    "wdrs": "http://www.w3.org/2007/05/powder-s#",
    "xhv": "http://www.w3.org/1999/xhtml/vocab#",
    "xml": "http://www.w3.org/XML/1998/namespace",
    "xsd": XSD,
}

#: HTML void elements (no closing tag) — needed so the DOM nests right.
_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input",
         "link", "meta", "param", "source", "track", "wbr"}

_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")

# HTML+RDFa 1.1 §3.1: datatype sniffing for the @datetime attribute.
_DATETIME_TYPES = (
    (re.compile(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}(:\d{2}(\.\d+)?)?"
                r"(Z|[+-]\d{2}:\d{2})?$"), XSD + "dateTime"),
    (re.compile(r"^\d{4}-\d{2}-\d{2}$"), XSD + "date"),
    (re.compile(r"^\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:\d{2})?$"),
     XSD + "time"),
    (re.compile(r"^P(\d+Y)?(\d+M)?(\d+D)?(T(\d+H)?(\d+M)?"
                r"(\d+(\.\d+)?S)?)?$"), XSD + "duration"),
    (re.compile(r"^\d{4}(-\d{2})?$"), XSD + "gYear"),
)


class _Node:
    __slots__ = ("tag", "attrs", "children", "text_parts")

    def __init__(self, tag, attrs):
        self.tag = tag
        self.attrs = attrs          # dict, lowercase attr names
        self.children = []
        self.text_parts = []        # interleaved strings (document order)

    def text(self):
        out = list(self.text_parts)
        for c in self.children:
            out.append(c.text())
        return "".join(out)


class _DomBuilder(HTMLParser):
    """Tolerant HTML → _Node tree (void elements close themselves; a
    stray close tag pops to the nearest matching open element)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("#document", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, {k.lower(): (v if v is not None else "")
                           for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in _VOID:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = _Node(tag, {k.lower(): (v if v is not None else "")
                           for k, v in attrs})
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data):
        self.stack[-1].text_parts.append(data)


class RdfaParser:
    """One HTML/XHTML document → iterator of (s, p, (lex, dt, lang))
    triples. IRI/bnode objects carry dt=None, lang=None (the same term
    convention as :class:`rdfxml.RdfXmlParser`)."""

    def __init__(self, text: str, base: str | None = None):
        self.text = text
        self.base = base or ""
        self._bn = 0
        self._scope = f"{zlib.crc32(text.encode()):08x}"
        self._bnode_map: dict[str, str] = {}
        self.triples: list[tuple] = []

    # -- term machinery ---------------------------------------------------

    def _fresh_bnode(self) -> str:
        self._bn += 1
        return f"_:ra{self._scope}_{self._bn}"

    def _named_bnode(self, name: str) -> str:
        # document-scope labelled bnodes, disjoint from other files' labels
        if name not in self._bnode_map:
            self._bnode_map[name] = f"_:ra{self._scope}_n_{name}"
        return self._bnode_map[name]

    def _resolve(self, iri: str) -> str:
        iri = iri.strip()
        if _ABS_IRI.match(iri):
            return iri
        b = self.base
        if iri.startswith("#") or iri == "":
            return b.split("#")[0] + iri
        if iri.startswith("?"):
            return b.split("#")[0].split("?")[0] + iri
        if iri.startswith("//"):
            m = _ABS_IRI.match(b)
            return (b[:m.end()] if m else "http:") + iri
        if iri.startswith("/"):
            m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", b)
            return (m.group(1) if m else b) + iri
        if "/" in b:
            return b.rsplit("/", 1)[0] + "/" + iri
        return b + iri

    def _curie_or_iri(self, value: str, prefixes: dict) -> str | None:
        """Resolve a value that may be a (safe) CURIE, a blank node, or
        an IRI — used for @about/@resource (spec: SafeCURIEorCURIEorIRI)."""
        value = value.strip()
        if value.startswith("[") and value.endswith("]"):
            inner = value[1:-1]
            got = self._curie_only(inner, prefixes)
            return got                  # malformed safe CURIE ⇒ ignored
        got = self._curie_only(value, prefixes)
        if got is not None:
            return got
        return self._resolve(value)

    def _curie_only(self, value: str, prefixes: dict) -> str | None:
        if value.startswith("_:"):
            return (self._named_bnode(value[2:]) if len(value) > 2
                    else self._named_bnode(""))
        if ":" not in value:
            return None
        pfx, ref = value.split(":", 1)
        if ref.startswith("//"):
            return None                 # looks like an absolute IRI
        ns = prefixes.get(pfx.lower())
        return ns + ref if ns is not None else None

    def _term_or_curie(self, value: str, prefixes: dict,
                       vocab: str | None) -> str | None:
        """Resolve one @property/@rel/@rev/@typeof token (spec:
        TERMorCURIEorAbsIRI): term → vocab, CURIE → prefix, else abs IRI."""
        value = value.strip()
        if not value:
            return None
        if ":" not in value:
            if re.match(r"^[A-Za-z][\w.-]*$", value) and vocab:
                return vocab + value
            return None                 # term with no vocab ⇒ ignored
        got = self._curie_only(value, prefixes)
        if got is not None:
            return got
        return value if _ABS_IRI.match(value) else None

    def _terms(self, attr_val: str | None, prefixes: dict,
               vocab: str | None) -> list[str]:
        if attr_val is None:
            return []
        out = []
        for tok in attr_val.split():
            t = self._term_or_curie(tok, prefixes, vocab)
            if t is not None:
                out.append(t)
        return out

    # -- processing sequence ----------------------------------------------

    def parse(self):
        builder = _DomBuilder()
        builder.feed(self.text)
        builder.close()
        # <base href> overrides the document base (HTML+RDFa §3.1)
        for node in self._walk(builder.root):
            if node.tag == "base" and node.attrs.get("href"):
                self.base = node.attrs["href"].strip()
                break
        ctx = dict(INITIAL_CONTEXT)
        for child in builder.root.children:
            self._process(child, parent_subject=self.base or "",
                          parent_object=self.base or "",
                          incomplete=[], lang=None, prefixes=ctx,
                          vocab=None, at_root=True)
        return iter(self.triples)

    def _walk(self, node):
        for c in node.children:
            yield c
            yield from self._walk(c)

    def _emit(self, s, p, o):
        self.triples.append((s, p, o))

    def _process(self, el, parent_subject, parent_object, incomplete,
                 lang, prefixes, vocab, at_root=False):
        a = el.attrs
        # steps 2–4: vocab / prefix / lang updates
        if "vocab" in a:
            vocab = a["vocab"].strip() or None
            if vocab:
                self._emit(self.base or "", "http://www.w3.org/ns/rdfa#"
                           "usesVocabulary", (vocab, None, None))
        new_prefixes = None
        for k, v in a.items():
            if k.startswith("xmlns:") and v:
                new_prefixes = new_prefixes or dict(prefixes)
                new_prefixes[k[6:].lower()] = v
        if a.get("prefix"):
            toks = a["prefix"].split()
            new_prefixes = new_prefixes or dict(prefixes)
            for i in range(0, len(toks) - 1, 2):
                if toks[i].endswith(":"):
                    new_prefixes[toks[i][:-1].lower()] = toks[i + 1]
        if new_prefixes is not None:
            prefixes = new_prefixes
        lang = a.get("lang", a.get("xml:lang", lang)) or None

        rel = self._terms(a.get("rel"), prefixes, vocab)
        rev = self._terms(a.get("rev"), prefixes, vocab)
        props = self._terms(a.get("property"), prefixes, vocab)
        typeof = (self._terms(a.get("typeof"), prefixes, vocab)
                  if "typeof" in a else None)

        about = (self._curie_or_iri(a["about"], prefixes)
                 if "about" in a else None)
        resource = None
        for attr in ("resource", "href", "src"):
            if attr in a:
                resource = (self._curie_or_iri(a[attr], prefixes)
                            if attr == "resource"
                            else self._resolve(a[attr]))
                if resource is not None:
                    break

        new_subject = None
        current_object = None
        typed_resource = None
        skip = False

        if not rel and not rev:
            # step 5 — no rel/rev
            if props and "content" not in a and "datatype" not in a:
                # 5.1: @property present without content/datatype
                new_subject = about
                if new_subject is None:
                    new_subject = (self.base or "") if at_root \
                        else parent_object
                if typeof is not None:
                    if about is not None:
                        typed_resource = new_subject
                    elif at_root:
                        typed_resource = self.base or ""
                    else:
                        typed_resource = (resource if resource is not None
                                          else self._fresh_bnode())
                        current_object = typed_resource
            else:
                new_subject = about if about is not None else resource
                if new_subject is None:
                    if at_root:
                        new_subject = self.base or ""
                    elif typeof is not None:
                        new_subject = self._fresh_bnode()
                    else:
                        new_subject = parent_object
                        if not props:
                            skip = True
                if typeof is not None:
                    typed_resource = new_subject
        else:
            # step 6 — rel/rev present
            new_subject = about
            if typeof is not None and about is not None:
                typed_resource = new_subject
            current_object = resource
            if typeof is not None and about is None:
                if current_object is None:
                    current_object = self._fresh_bnode()
                typed_resource = current_object
            if new_subject is None:
                new_subject = (self.base or "") if at_root else parent_object

        # step 7 — typed resources
        if typed_resource is not None:
            for t in typeof or []:
                self._emit(typed_resource, RDF_NS + "type", (t, None, None))

        # steps 9/10 — rel/rev triples or incomplete triples
        local_incomplete = []
        if current_object is not None:
            for p in rel:
                self._emit(new_subject, p, (current_object, None, None))
            for p in rev:
                self._emit(current_object, p, (new_subject, None, None))
        elif rel or rev:
            local_incomplete = ([(p, "fwd") for p in rel]
                                + [(p, "rev") for p in rev])

        # step 11 — @property literals / links
        if props:
            value = None
            dt_attr = a.get("datatype")
            if dt_attr is not None:
                dt_iri = (self._term_or_curie(dt_attr, prefixes, vocab)
                          if dt_attr.strip() else None)
                lex = a.get("content", el.text())
                if dt_iri == RDF_NS + "XMLLiteral":
                    value = (lex, dt_iri, None)
                elif dt_iri:
                    value = (lex, dt_iri, None)
                else:
                    value = (lex, LANG_STRING if lang else XSD_STRING, lang)
            elif "content" in a:
                value = (a["content"],
                         LANG_STRING if lang else XSD_STRING, lang)
            elif "datetime" in a:       # HTML+RDFa §3.1
                lex = a["datetime"]
                dt_iri = next((t for rx, t in _DATETIME_TYPES
                               if rx.match(lex)), None)
                value = ((lex, dt_iri, None) if dt_iri else
                         (lex, LANG_STRING if lang else XSD_STRING, lang))
            elif (not rel and not rev and "content" not in a
                  and resource is not None
                  and ("resource" in a or "href" in a or "src" in a)):
                value = (resource, None, None)       # 1.1 property-link
            elif typeof is not None and about is None and not rel \
                    and not rev and typed_resource is not None:
                value = (typed_resource, None, None)
            else:
                value = (el.text(),
                         LANG_STRING if lang else XSD_STRING, lang)
            for p in props:
                self._emit(new_subject, p, value)

        # step 12 — complete the parent's incomplete triples
        if not skip and new_subject is not None:
            for p, direction in incomplete:
                if direction == "fwd":
                    self._emit(parent_subject, p, (new_subject, None, None))
                else:
                    self._emit(new_subject, p, (parent_subject, None, None))

        # step 13 — recurse
        if skip:
            child_ps, child_po = parent_subject, parent_object
            child_inc = incomplete
        else:
            child_ps = new_subject if new_subject is not None \
                else parent_subject
            child_po = (current_object if current_object is not None
                        else child_ps)
            child_inc = local_incomplete
        for child in el.children:
            self._process(child, child_ps, child_po, child_inc,
                          lang, prefixes, vocab)


def parse_rdfa(text: str, base: str | None = None):
    """Iterate (s, p, (o_lex, o_dt, o_lang)) triples extracted from one
    HTML/XHTML document's RDFa 1.1 annotations."""
    return RdfaParser(text, base).parse()
