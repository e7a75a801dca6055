"""JSON-LD reader (SURVEY B50; the reference's Rio stack parses JSON-LD
via rdf4j-rio-jsonld, pom.xml:56-90 — the one serialization family the
repo still lacked after Turtle/TriG/N-Triples/N-Quads/RDF-XML).

Implements the JSON-LD 1.0 *deserialize-to-RDF* algorithm over the subset
real tools emit: inline ``@context`` (term definitions, compact IRIs,
``@base``/``@vocab``/default ``@language``, keyword aliases, ``@type`` /
``@language`` coercion, ``@container: @list/@set/@language/@index``),
node objects (``@id``/``@type``/``@reverse``/nested nodes), value objects
(``@value``/``@type``/``@language``), ``@list`` collections, and named
graphs (``@graph`` under an ``@id``). Remote contexts (a string where a
context object is expected) raise ``ValueError`` — fetching them inside
executor tasks would be a hidden network dependency, and bulk fixtures
inline their contexts.

Spark integration mirrors read_turtle (sources/rdf.py): JSON is not
line-splittable, so one FILE is one parse unit and a directory of
``.jsonld`` files parses in parallel, one task per file. Line-delimited
bulk data should ship N-Quads (the codegen fast path).

Like the Turtle parser, labeled blank nodes keep their labels
(single-file load semantics) while generated ones are scoped by a content
hash so multi-file loads cannot collide.
"""

from __future__ import annotations

import json
import re
import zlib

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF_LANGSTRING = RDF + "langString"

_KEYWORDS = {"@context", "@id", "@type", "@value", "@language", "@list",
             "@set", "@graph", "@reverse", "@index", "@base", "@vocab",
             "@container", "@nest", "@version"}

_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")


def _double_lex(x: float) -> str:
    """Canonical xsd:double lexical form per the JSON-LD 1.0 to-RDF
    algorithm (mantissa 'E' exponent, no superfluous zeros): 4.5 →
    '4.5E0', 1e21 → '1.0E21'."""
    if x != x:
        return "NaN"
    if x == float("inf"):
        return "INF"
    if x == float("-inf"):
        return "-INF"
    mant, _, exp = f"{x:.15E}".partition("E")
    mant = mant.rstrip("0")
    if mant.endswith("."):
        mant += "0"
    return f"{mant}E{int(exp)}"


class _Context:
    """One active context: term definitions + @base/@vocab/@language."""

    __slots__ = ("terms", "base", "vocab", "language")

    def __init__(self, base: str | None):
        self.terms: dict[str, dict] = {}
        self.base = base
        self.vocab: str | None = None
        self.language: str | None = None

    def child(self) -> "_Context":
        c = _Context(self.base)
        c.terms = dict(self.terms)
        c.vocab = self.vocab
        c.language = self.language
        return c


class JsonLdParser:
    """One document → iterator of (g, s, p, (lex, dt, lang)) quads;
    ``g`` is None for default-graph statements (the reader maps None
    onto the LOAD target graph, matching the TriG/N-Quads convention)."""

    def __init__(self, text: str, base: str | None = None):
        self.doc = json.loads(text)
        self.root = _Context(base)
        self._bn = 0
        self._scope = f"{zlib.crc32(text.encode()):08x}"

    def _fresh_bnode(self) -> str:
        self._bn += 1
        return f"_:genj{self._scope}_{self._bn}"

    # -- context processing ----------------------------------------------

    def _push_context(self, ctx: _Context, spec) -> _Context:
        if spec is None:
            return _Context(self.root.base)
        out = ctx.child()
        specs = spec if isinstance(spec, list) else [spec]
        for one in specs:
            if one is None:
                out = _Context(self.root.base)
                continue
            if isinstance(one, str):
                raise ValueError(
                    f"jsonld: remote contexts not supported ({one!r}); "
                    "inline the context object")
            if not isinstance(one, dict):
                raise ValueError(f"jsonld: bad @context entry {one!r}")
            if "@base" in one:
                out.base = one["@base"]
            if "@vocab" in one:
                out.vocab = one["@vocab"]
            if "@language" in one:
                lang = one["@language"]
                out.language = lang.lower() if isinstance(lang, str) else None
            for term, defn in one.items():
                if term in ("@base", "@vocab", "@language", "@version"):
                    continue
                if term in _KEYWORDS:
                    raise ValueError(f"jsonld: cannot redefine {term}")
                if defn is None:
                    out.terms[term] = {"@id": None}
                elif isinstance(defn, str):
                    out.terms[term] = {"@id": defn}
                elif isinstance(defn, dict):
                    td = {}
                    if "@id" in defn:
                        td["@id"] = defn["@id"]
                    if "@reverse" in defn:
                        td["@id"] = defn["@reverse"]
                        td["reverse"] = True
                    if "@type" in defn:
                        td["@type"] = defn["@type"]
                    if "@language" in defn:
                        lg = defn["@language"]
                        td["@language"] = lg.lower() if isinstance(lg, str) \
                            else None
                    cont = defn.get("@container")
                    if cont is not None:
                        conts = cont if isinstance(cont, list) else [cont]
                        td["@container"] = set(conts)
                    out.terms[term] = td
                else:
                    raise ValueError(f"jsonld: bad term definition for "
                                     f"{term!r}: {defn!r}")
        return out

    # -- IRI expansion -----------------------------------------------------

    def _expand_iri(self, ctx: _Context, value: str, *, vocab: bool,
                    _seen: frozenset = frozenset()) -> str | None:
        """Expand a term/compact-IRI/relative-IRI. ``vocab=True`` is the
        property/@type position (falls back to @vocab); ``vocab=False``
        is the @id position (falls back to @base). None = unmapped (the
        caller drops the entry, per the spec)."""
        if value in _KEYWORDS:
            return value
        td = ctx.terms.get(value)
        if td is not None and value not in _seen:
            mapped = td.get("@id")
            if mapped is None:
                return None
            if mapped in _KEYWORDS:
                return mapped
            return self._expand_iri(ctx, mapped, vocab=True,
                                    _seen=_seen | {value})
        if value.startswith("_:"):
            return value
        prefix, sep, suffix = value.partition(":")
        if sep and not suffix.startswith("//"):
            ptd = ctx.terms.get(prefix)
            if ptd is not None and ptd.get("@id") and prefix not in _seen:
                head = self._expand_iri(ctx, ptd["@id"], vocab=True,
                                        _seen=_seen | {prefix})
                if head is not None:
                    return head + suffix
        if _ABS_IRI.match(value):
            return value
        if vocab:
            if ctx.vocab is not None:
                return ctx.vocab + value
            return None
        if ctx.base is not None:
            return _resolve_ref(ctx.base, value)
        return value

    # -- document traversal -------------------------------------------------

    def parse(self):
        yield from self._nodes(self.root, self.doc, graph=None)

    def _nodes(self, ctx: _Context, node, graph):
        """Emit quads for a node object / array of node objects; returns
        nothing (generator)."""
        if isinstance(node, list):
            for n in node:
                yield from self._nodes(ctx, n, graph)
            return
        if not isinstance(node, dict):
            raise ValueError(f"jsonld: expected node object, got {node!r}")
        _, quads = self._node_ref(ctx, node, graph)
        yield from quads

    def _alias_of(self, ctx: _Context, node: dict, kw: str):
        """Find the node key that expands to keyword ``kw`` (covers
        aliases like ``"id": "@id"`` in the context)."""
        if kw in node:
            return kw
        for k in node:
            if k == "@context" or k in _KEYWORDS:
                continue
            if ctx.terms.get(k, {}).get("@id") == kw:
                return k
        return None

    def _node_ref(self, ctx: _Context, node: dict, graph):
        """Process one node object → (subject_term, quads_list)."""
        if "@context" in node:
            ctx = self._push_context(ctx, node["@context"])

        quads: list = []
        id_key = self._alias_of(ctx, node, "@id")
        if id_key is not None:
            raw = node[id_key]
            if not isinstance(raw, str):
                raise ValueError(f"jsonld: @id must be a string, got {raw!r}")
            subj = raw if raw.startswith("_:") else \
                self._expand_iri(ctx, raw, vocab=False)
        else:
            subj = self._fresh_bnode()

        for key, value in node.items():
            if key == "@context" or key == id_key:
                continue
            expanded = key if key in _KEYWORDS else \
                self._expand_iri(ctx, key, vocab=True)
            if expanded is None:
                continue  # unmapped term: dropped, per the spec
            if expanded == "@type":
                vals = value if isinstance(value, list) else [value]
                for v in vals:
                    t = self._expand_iri(ctx, v, vocab=True)
                    if t is not None:
                        quads.append((graph, subj, RDF + "type",
                                      (t, None, None)))
                continue
            if expanded == "@graph":
                # a node with both @id and @graph names a graph
                g = subj if id_key is not None else graph
                inner = value if isinstance(value, list) else [value]
                for n in inner:
                    _, q = self._node_ref(ctx, n, g)
                    quads.extend(q)
                continue
            if expanded == "@reverse":
                if not isinstance(value, dict):
                    raise ValueError("jsonld: @reverse takes an object")
                for rkey, rvals in value.items():
                    riri = self._expand_iri(ctx, rkey, vocab=True)
                    if riri is None:
                        continue
                    rl = rvals if isinstance(rvals, list) else [rvals]
                    for rv in rl:
                        if not isinstance(rv, dict):
                            rv = {"@id": rv}
                        rs, rq = self._node_ref(ctx, rv, graph)
                        quads.extend(rq)
                        quads.append((graph, rs, riri, (subj, None, None)))
                continue
            if expanded in _KEYWORDS:
                continue  # @index etc. — annotation, no triples
            td = ctx.terms.get(key, {})
            if td.get("reverse"):
                for rv in (value if isinstance(value, list) else [value]):
                    if not isinstance(rv, dict):
                        rv = {"@id": rv}
                    rs, rq = self._node_ref(ctx, rv, graph)
                    quads.extend(rq)
                    quads.append((graph, rs, expanded, (subj, None, None)))
                continue
            yield_obj = self._objects(ctx, td, value, graph, quads)
            for obj in yield_obj:
                quads.append((graph, subj, expanded, obj))
        return subj, quads

    def _objects(self, ctx: _Context, td: dict, value, graph,
                 quads: list) -> list:
        """Expand one property value → list of (lex, dt, lang) object
        terms, appending any subsidiary quads (nested nodes, lists)."""
        container = td.get("@container", set())
        if "@language" in container and isinstance(value, dict):
            out = []
            for lang, vals in value.items():
                for v in (vals if isinstance(vals, list) else [vals]):
                    if not isinstance(v, str):
                        raise ValueError("jsonld: language map values must "
                                         "be strings")
                    out.append((v, RDF_LANGSTRING, lang.lower()))
            return out
        if "@index" in container and isinstance(value, dict):
            out = []
            for _, vals in value.items():
                out.extend(self._objects(ctx, td, vals, graph, quads))
            return out
        if "@list" in container and not isinstance(value, dict):
            # expansion array-wraps single values before list conversion
            # (review fix: a lone scalar under @container:@list used to
            # emit a plain literal instead of a one-element rdf:List)
            value = {"@list": value if isinstance(value, list)
                     else [value]}
        if isinstance(value, dict):
            set_key = self._alias_of(ctx, value, "@set")
            if set_key is not None:
                return self._objects(ctx, td, value[set_key], graph, quads)
        if isinstance(value, list):
            out = []
            for v in value:
                out.extend(self._objects(ctx, td, v, graph, quads))
            return out
        return [self._object(ctx, td, value, graph, quads)]

    def _object(self, ctx: _Context, td: dict, value, graph, quads: list):
        if isinstance(value, dict):
            list_key = self._alias_of(ctx, value, "@list")
            if list_key is not None:
                return self._rdf_list(ctx, td, value[list_key], graph, quads)
            val_key = self._alias_of(ctx, value, "@value")
            if val_key is not None:
                return self._value_object(ctx, value, val_key)
            # node object (possibly just a reference)
            s, q = self._node_ref(ctx, value, graph)
            quads.extend(q)
            return (s, None, None)
        # scalar: apply term coercion
        coerce = td.get("@type")
        if isinstance(value, str):
            if coerce == "@id":
                iri = self._expand_iri(ctx, value, vocab=False)
                return (iri, None, None)
            if coerce == "@vocab":
                iri = self._expand_iri(ctx, value, vocab=True)
                return (iri, None, None)
            if coerce is not None:
                dt = self._expand_iri(ctx, coerce, vocab=True)
                if dt is None:
                    raise ValueError(
                        f"jsonld: @type {coerce!r} does not expand to an "
                        "IRI")
                return (value, dt, None)
            lang = td["@language"] if "@language" in td else ctx.language
            if lang:
                return (value, RDF_LANGSTRING, lang)
            return (value, XSD + "string", None)
        if isinstance(value, bool):
            return ("true" if value else "false", XSD + "boolean", None)
        if isinstance(value, int):
            if coerce is not None and coerce not in ("@id", "@vocab"):
                dt = self._expand_iri(ctx, coerce, vocab=True)
                if dt == XSD + "double":
                    return (_double_lex(float(value)), dt, None)
                return (str(value), dt, None)
            return (str(value), XSD + "integer", None)
        if isinstance(value, float):
            dt = XSD + "double"
            if coerce is not None and coerce not in ("@id", "@vocab"):
                dt = self._expand_iri(ctx, coerce, vocab=True)
            return (_double_lex(value), dt, None)
        if value is None:
            raise ValueError("jsonld: null value outside @context")
        raise ValueError(f"jsonld: bad value {value!r}")

    def _value_object(self, ctx: _Context, value: dict, val_key: str):
        v = value[val_key]
        ty_key = self._alias_of(ctx, value, "@type")
        lg_key = self._alias_of(ctx, value, "@language")
        if ty_key is not None and lg_key is not None:
            raise ValueError("jsonld: @value with both @type and @language")
        if lg_key is not None and value[lg_key] is not None:
            if not isinstance(v, str):
                raise ValueError("jsonld: @language on a non-string @value")
            return (v, RDF_LANGSTRING, value[lg_key].lower())
        if ty_key is not None:
            dt = self._expand_iri(ctx, value[ty_key], vocab=True)
            if dt is None:
                raise ValueError(
                    f"jsonld: @type {value[ty_key]!r} does not expand to "
                    "an IRI")
            if isinstance(v, bool):
                v = "true" if v else "false"
            elif isinstance(v, float):
                v = _double_lex(v)
            return (str(v), dt, None)
        if isinstance(v, bool):
            return ("true" if v else "false", XSD + "boolean", None)
        if isinstance(v, int):
            return (str(v), XSD + "integer", None)
        if isinstance(v, float):
            return (_double_lex(v), XSD + "double", None)
        if isinstance(v, str):
            if ctx.language:
                return (v, RDF_LANGSTRING, ctx.language)
            return (v, XSD + "string", None)
        raise ValueError(f"jsonld: bad @value {v!r}")

    def _rdf_list(self, ctx: _Context, td: dict, items, graph, quads: list):
        if not isinstance(items, list):
            items = [items]
        # strip the container key so element coercion still applies
        etd = {k: v for k, v in td.items() if k != "@container"}
        objs = []
        for it in items:
            objs.append(self._object(ctx, etd, it, graph, quads))
        if not objs:
            return (RDF + "nil", None, None)
        nodes = [self._fresh_bnode() for _ in objs]
        for i, (node, obj) in enumerate(zip(nodes, objs)):
            quads.append((graph, node, RDF + "first", obj))
            rest = (nodes[i + 1], None, None) if i + 1 < len(nodes) \
                else (RDF + "nil", None, None)
            quads.append((graph, node, RDF + "rest", rest))
        return (nodes[0], None, None)


def _resolve_ref(base: str, ref: str) -> str:
    """RFC 3986 relative resolution (same contract the IRI() builtin uses;
    a tiny inline version keeps executors import-light)."""
    if _ABS_IRI.match(ref):
        return ref
    if ref.startswith("//"):
        scheme = base.split(":", 1)[0]
        return f"{scheme}:{ref}"
    if ref.startswith("#"):
        return base.split("#", 1)[0] + ref
    if ref.startswith("?"):
        return base.split("#", 1)[0].split("?", 1)[0] + ref
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)([^?#]*)", base)
    if not m:
        return base + ref
    root, path = m.group(1), m.group(2)
    if ref.startswith("/"):
        merged = ref
    else:
        merged = path.rsplit("/", 1)[0] + "/" + ref if "/" in path \
            else "/" + ref
    segs: list[str] = []
    for seg in merged.split("/"):
        if seg == "..":
            if segs:
                segs.pop()
        elif seg != ".":
            segs.append(seg)
    out = "/".join(segs)
    if merged.endswith(("/.", "/..")) and not out.endswith("/"):
        out += "/"
    if not out.startswith("/"):
        out = "/" + out
    return root + out


def parse_jsonld(text: str, base: str | None = None):
    """Iterate (g, s, p, (o_lex, o_dt, o_lang)) quads of one JSON-LD
    document; ``g`` is None for default-graph statements. Objects that
    are IRIs/bnodes have ``o_dt`` and ``o_lang`` None."""
    yield from JsonLdParser(text, base=base).parse()
