"""Full Turtle parser (SURVEY B50; reference bulk-loads arbitrary Turtle,
``RDFFormat.TURTLE`` at GraphDBSystemAdapter.java:286).

A real tokenizer + recursive-descent parser covering the Turtle grammar the
subset reader could not: multi-line statements, blank-node property lists
``[...]``, collections ``(...)``, triple-quoted long strings, numeric /
boolean shorthand literals, SPARQL-style PREFIX/BASE, ``@base`` relative-IRI
resolution, escapes.

Spark integration (see :func:`graphdb_free_mocha_sa_spark.sources.rdf
.read_turtle`): Turtle is NOT line-splittable, so each FILE is one parse
unit — ``spark.read.text(wholetext=True)`` distributes per-file parses
across executors. Bulk loads that need intra-file parallelism should ship
N-Triples (line-delimited, arbitrarily splittable — the fast path in
rdf.py). Labeled blank nodes keep their labels (single-file load
semantics); generated ones (property lists / collections) are scoped by a
content hash so multi-file loads cannot collide.
"""

from __future__ import annotations

import re
import zlib

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
OWL = "http://www.w3.org/2002/07/owl#"
LOG = "http://www.w3.org/2000/10/swap/log#"


def _token_re(n3: bool = False) -> re.Pattern:
    """Assemble the token regex. Turtle and N3 share every production;
    N3 adds the operator tokens (``= => <= ! ^``), the ``has/is/of``
    keywords, and the quantifier directives (parsed so they can be
    REJECTED honestly — see :class:`N3Parser`). Alternation order
    matters: DTMARK ``^^`` before the single-``^`` path operator, the
    N3 ops before IRI so ``<=`` never starts an IRI parse."""
    atkw = r"@prefix\b|@base\b"
    kw = r"a|true|false|PREFIX|BASE|[Gg][Rr][Aa][Pp][Hh]"
    n3op = ""
    if n3:
        atkw += r"|@forAll\b|@forSome\b|@keywords\b"
        kw += r"|has|is|of"
        n3op = r"| (?P<N3OP>=>|<=|=|!|\^(?!\^))"
    return re.compile(
        r"""
      (?P<COMMENT>\#[^\n]*)
    | (?P<WS>\s+)
    | (?P<LONGSTR2>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<LONGSTR1>'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<STR2>"(?:[^"\\\n]|\\.)*")
    | (?P<STR1>'(?:[^'\\\n]|\\.)*')
    | (?P<DTMARK>\^\^)
    """ + n3op + r"""
    | (?P<IRI><[^<>"{}|^`\\\x00-\x20]*>)
    | (?P<BNODE>_:[A-Za-z0-9][A-Za-z0-9_.-]*)
    | (?P<ATKW>""" + atkw + r""")
    | (?P<LANG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
    | (?P<DOUBLE>[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
    | (?P<DECIMAL>[+-]?(?:\d+\.\d+|\.\d+))
    | (?P<INTEGER>[+-]?\d+)
    | (?P<PUNCT>[.;,\[\](){}])
    | (?P<PNAME>(?:[A-Za-z][A-Za-z0-9_.-]*)?:(?:(?:[A-Za-z0-9_%]|\\[-_~.!$&'()*+,;=/?\#@%])(?:(?:[A-Za-z0-9_.%:-]|\\[-_~.!$&'()*+,;=/?\#@%])*(?:[A-Za-z0-9_%:-]|\\[-_~.!$&'()*+,;=/?\#@%]))?)?)
    | (?P<KW>\b(?:""" + kw + r""")\b)
    """,
        re.X,
    )


_TOKEN = _token_re()
_TOKEN_N3 = _token_re(n3=True)

_ESCAPES = {"t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
            '"': '"', "'": "'", "\\": "\\"}


def _unescape(s: str) -> str:
    out, i = [], 0
    while i < len(s):
        c = s[i]
        if c != "\\":
            out.append(c)
            i += 1
            continue
        nxt = s[i + 1]
        if nxt in _ESCAPES:
            out.append(_ESCAPES[nxt])
            i += 2
        elif nxt == "u":
            out.append(chr(int(s[i + 2:i + 6], 16)))
            i += 6
        elif nxt == "U":
            out.append(chr(int(s[i + 2:i + 10], 16)))
            i += 10
        else:
            out.append(nxt)
            i += 2
    return "".join(out)


class _Tok:
    __slots__ = ("kind", "value")

    def __init__(self, kind: str, value: str):
        self.kind = kind
        self.value = value

    def __repr__(self):
        return f"{self.kind}({self.value!r})"


def _tokenize(text: str, token_re: re.Pattern = _TOKEN) -> list[_Tok]:
    toks, pos = [], 0
    n = len(text)
    while pos < n:
        m = token_re.match(text, pos)
        if m is None:
            raise ValueError(f"turtle: cannot tokenize at {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("COMMENT", "WS"):
            continue
        toks.append(_Tok(kind, m.group()))
    return toks


class TurtleParser:
    """One document → iterator of (s, p, (lex, dt, lang)) triples."""

    TOKEN_RE = _TOKEN

    def __init__(self, text: str):
        self.toks = _tokenize(text, self.TOKEN_RE)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base: str | None = None
        self._bn = 0
        self._scope = f"{zlib.crc32(text.encode()):08x}"

    # -- token stream ---------------------------------------------------

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self):
        t = self._peek()
        if t is None:
            raise ValueError("turtle: unexpected end of input")
        self.i += 1
        return t

    def _expect(self, value: str):
        t = self._next()
        if t.value != value:
            raise ValueError(f"turtle: expected {value!r}, got {t!r}")

    # -- terms ----------------------------------------------------------

    def _fresh_bnode(self) -> str:
        self._bn += 1
        return f"_:gen{self._scope}_{self._bn}"

    def _resolve_iri(self, raw: str) -> str:
        iri = _unescape(raw[1:-1])
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return self.base + iri
        return iri

    def _resolve_pname(self, raw: str) -> str:
        ns, _, local = raw.partition(":")
        if ns not in self.prefixes:
            raise ValueError(f"turtle: undefined prefix {ns!r}:")
        # PN_LOCAL_ESC: drop the escaping backslash, keep the character
        return self.prefixes[ns] + re.sub(
            r"\\([-_~.!$&'()*+,;=/?#@%])", r"\1", local)

    # -- grammar --------------------------------------------------------

    def parse(self):
        while self._peek() is not None:
            t = self._peek()
            if t.kind == "ATKW" or (t.kind == "KW" and t.value in ("PREFIX", "BASE")):
                yield from self._directive()
            else:
                yield from self._triples()
                self._expect(".")

    def _directive(self):
        t = self._next()
        sparql_style = t.kind == "KW"
        if t.value.lower().lstrip("@") == "prefix":
            pn = self._next()
            if pn.kind != "PNAME" or not pn.value.endswith(":"):
                raise ValueError(f"turtle: bad prefix name {pn!r}")
            iri_tok = self._next()
            if iri_tok.kind != "IRI":
                raise ValueError(f"turtle: bad prefix IRI {iri_tok!r}")
            self.prefixes[pn.value[:-1]] = self._resolve_iri(iri_tok.value)
        else:
            iri_tok = self._next()
            if iri_tok.kind != "IRI":
                raise ValueError(f"turtle: bad base IRI {iri_tok!r}")
            self.base = _unescape(iri_tok.value[1:-1])
        if not sparql_style:
            self._expect(".")
        return iter(())

    def _triples(self):
        t = self._peek()
        if t.kind == "PUNCT" and t.value == "[":
            subj, emitted = self._bnode_prop_list()
            yield from emitted
            if self._peek() is not None and self._peek().value != ".":
                yield from self._predicate_object_list(subj)
        elif t.kind == "PUNCT" and t.value == "(":
            subj, emitted = self._collection()
            yield from emitted
            yield from self._predicate_object_list(subj)
        else:
            subj = self._subject()
            yield from self._predicate_object_list(subj)

    def _subject(self) -> str:
        t = self._next()
        if t.kind == "IRI":
            return self._resolve_iri(t.value)
        if t.kind == "PNAME":
            return self._resolve_pname(t.value)
        if t.kind == "BNODE":
            return t.value
        raise ValueError(f"turtle: bad subject {t!r}")

    def _verb(self) -> str:
        t = self._next()
        if t.kind == "KW" and t.value == "a":
            return RDF + "type"
        if t.kind == "IRI":
            return self._resolve_iri(t.value)
        if t.kind == "PNAME":
            return self._resolve_pname(t.value)
        raise ValueError(f"turtle: bad predicate {t!r}")

    def _predicate_object_list(self, subj: str):
        while True:
            p = self._verb()
            while True:
                obj, emitted = self._object()
                yield from emitted
                yield (subj, p, obj)
                nt = self._peek()
                if nt is not None and nt.value == ",":
                    self._next()
                    continue
                break
            nt = self._peek()
            if nt is not None and nt.value == ";":
                self._next()
                # ';' may trail before '.', ']' — only continue on a verb
                nt = self._peek()
                while nt is not None and nt.value == ";":
                    self._next()
                    nt = self._peek()
                if nt is None or nt.value in (".", "]"):
                    return
                continue
            return

    def _object(self):
        """Returns ((lex, dt, lang), emitted_triples_iterable)."""
        t = self._peek()
        if t.kind == "PUNCT" and t.value == "[":
            node, emitted = self._bnode_prop_list()
            return (node, None, None), emitted
        if t.kind == "PUNCT" and t.value == "(":
            node, emitted = self._collection()
            return (node, None, None), emitted
        self._next()
        if t.kind == "IRI":
            return (self._resolve_iri(t.value), None, None), ()
        if t.kind == "PNAME":
            return (self._resolve_pname(t.value), None, None), ()
        if t.kind == "BNODE":
            return (t.value, None, None), ()
        if t.kind in ("LONGSTR2", "LONGSTR1", "STR2", "STR1"):
            q = 3 if t.kind.startswith("LONG") else 1
            lex = _unescape(t.value[q:-q])
            nt = self._peek()
            if nt is not None and nt.kind == "LANG":
                self._next()
                return (lex, RDF + "langString", nt.value[1:].lower()), ()
            if nt is not None and nt.kind == "DTMARK":
                self._next()
                dt_tok = self._next()
                if dt_tok.kind == "IRI":
                    dt = self._resolve_iri(dt_tok.value)
                elif dt_tok.kind == "PNAME":
                    dt = self._resolve_pname(dt_tok.value)
                else:
                    raise ValueError(f"turtle: bad datatype {dt_tok!r}")
                return (lex, dt, None), ()
            return (lex, XSD + "string", None), ()
        if t.kind == "INTEGER":
            return (t.value, XSD + "integer", None), ()
        if t.kind == "DECIMAL":
            return (t.value, XSD + "decimal", None), ()
        if t.kind == "DOUBLE":
            return (t.value, XSD + "double", None), ()
        if t.kind == "KW" and t.value in ("true", "false"):
            return (t.value, XSD + "boolean", None), ()
        raise ValueError(f"turtle: bad object {t!r}")

    def _bnode_prop_list(self):
        self._expect("[")
        node = self._fresh_bnode()
        if self._peek() is not None and self._peek().value == "]":
            self._next()
            return node, ()
        emitted = list(self._predicate_object_list(node))
        self._expect("]")
        return node, emitted

    def _collection(self):
        self._expect("(")
        items = []
        emitted: list = []
        while True:
            t = self._peek()
            if t is None:
                raise ValueError("turtle: unterminated collection")
            if t.kind == "PUNCT" and t.value == ")":
                self._next()
                break
            obj, em = self._object()
            emitted.extend(em)
            items.append(obj)
        if not items:
            return RDF + "nil", emitted
        nodes = [self._fresh_bnode() for _ in items]
        for i, (node, obj) in enumerate(zip(nodes, items)):
            emitted.append((node, RDF + "first", obj))
            rest = (nodes[i + 1], None, None) if i + 1 < len(nodes) \
                else (RDF + "nil", None, None)
            emitted.append((node, RDF + "rest", rest))
        return nodes[0], emitted


def parse_turtle(text: str):
    """Iterate (s, p, (o_lex, o_dt, o_lang)) triples of one Turtle document.
    Objects that are IRIs/bnodes have ``o_dt`` and ``o_lang`` None."""
    yield from TurtleParser(text).parse()


class TriGParser(TurtleParser):
    """TriG (SURVEY B50 named-graph serialization; the reference's Rio
    stack parses it via rdf4j-rio-trig, pom.xml:56-90): Turtle plus graph
    blocks. Reuses the whole Turtle grammar — a block's body is plain
    ``triples`` statements — and adds the four top-level block forms:

        GRAPH <g> { ... }      (keyword form, keyword case-insensitive)
        <g> { ... }            (label form)
        { ... }                (explicit default graph)
        <plain turtle triples> (default graph)

    Yields (g, s, p, (lex, dt, lang)) with ``g=None`` for the default
    graph — the reader maps None onto the LOAD target graph, matching the
    N-Quads reader's default-graph convention.
    """

    def parse(self):
        while self._peek() is not None:
            t = self._peek()
            if t.kind == "ATKW" or (t.kind == "KW"
                                    and t.value in ("PREFIX", "BASE")):
                self._directive()
                continue
            if t.kind == "KW" and t.value.upper() == "GRAPH":
                self._next()
                g = self._graph_label()
                yield from self._wrapped_graph(g)
                continue
            if t.kind == "PUNCT" and t.value == "{":
                yield from self._wrapped_graph(None)
                continue
            if t.kind in ("IRI", "PNAME", "BNODE"):
                # labelOrSubject: only a following '{' makes it a graph
                # label; otherwise rewind and parse as a plain subject
                save = self.i
                g = self._graph_label()
                nxt = self._peek()
                if nxt is not None and nxt.value == "{":
                    yield from self._wrapped_graph(g)
                    continue
                self.i = save
            for s, p, o in self._triples():
                yield (None, s, p, o)
            self._expect(".")

    def _graph_label(self) -> str:
        t = self._next()
        if t.kind == "IRI":
            return self._resolve_iri(t.value)
        if t.kind == "PNAME":
            return self._resolve_pname(t.value)
        if t.kind == "BNODE":
            return t.value
        raise ValueError(f"trig: bad graph label {t!r}")

    def _wrapped_graph(self, g: str | None):
        self._expect("{")
        while True:
            t = self._peek()
            if t is None:
                raise ValueError("trig: unterminated graph block")
            if t.value == "}":
                break
            for s, p, o in self._triples():
                yield (g, s, p, o)
            t = self._peek()
            if t is not None and t.value == ".":
                self._next()
            elif t is None or t.value != "}":
                raise ValueError(f"trig: expected '.' or '}}', got {t!r}")
        self._expect("}")


def parse_trig(text: str):
    """Iterate (g, s, p, (o_lex, o_dt, o_lang)) quads of one TriG document;
    ``g`` is None for default-graph statements."""
    yield from TriGParser(text).parse()


class N3Parser(TurtleParser):
    """Notation3 reader, RDF-compatible subset (SURVEY B50; the
    reference's Rio stack registers an N3 parser via rdf4j-runtime,
    pom.xml:80-90 — rdf4j reads N3 with its Turtle grammar plus the N3
    shorthands below, and that is exactly the subset with an RDF triple
    representation):

    - ``=``  → ``owl:sameAs``            (W3C N3 Team Submission §4)
    - ``=>`` → ``log:implies``; ``<=`` is the inverted form
    - ``has <p>``  → forward predicate; ``is <p> of`` → inverted
    - path expressions ``x!p`` / ``x^p`` → fresh-bnode chains
    - ``@keywords`` accepted for the standard keyword set

    Constructs with NO RDF counterpart are rejected honestly with a
    descriptive error rather than silently mangled: formulas ``{...}``,
    ``@forAll`` / ``@forSome`` quantification, bare-word IRIs from a
    non-standard ``@keywords`` list, and literal subjects produced by
    ``is…of`` / ``^`` on a literal.
    """

    TOKEN_RE = _TOKEN_N3

    _STD_KEYWORDS = {"a", "is", "of", "has", "true", "false",
                     "prefix", "base"}

    # -- directives -------------------------------------------------------

    def _directive(self):
        t = self._peek()
        if t.kind == "ATKW" and t.value in ("@forAll", "@forSome"):
            raise ValueError(
                f"n3: {t.value} quantification has no RDF counterpart")
        if t.kind == "ATKW" and t.value == "@keywords":
            self._next()
            while True:
                w = self._next()
                if w.value == ".":
                    return iter(())
                if w.value == ",":
                    continue
                if w.value.lower() not in self._STD_KEYWORDS:
                    raise ValueError(
                        "n3: @keywords beyond the standard set would make "
                        f"bare words IRIs ({w.value!r}); not representable "
                        "here")
        return super()._directive()

    def parse(self):
        while self._peek() is not None:
            t = self._peek()
            if t.kind == "ATKW" or (t.kind == "KW"
                                    and t.value in ("PREFIX", "BASE")):
                yield from self._directive()
            else:
                yield from self._triples()
                self._expect(".")

    # -- N3 verbs and paths ------------------------------------------------

    def _verb_n3(self):
        """Returns (predicate_iri, inverted)."""
        t = self._peek()
        if t.kind == "N3OP" and t.value in ("=", "=>", "<="):
            self._next()
            if t.value == "=":
                return OWL + "sameAs", False
            return LOG + "implies", t.value == "<="
        if t.kind == "KW" and t.value == "has":
            self._next()
            return self._verb(), False
        if t.kind == "KW" and t.value == "is":
            self._next()
            p = self._verb()
            of = self._next()
            if not (of.kind == "KW" and of.value == "of"):
                raise ValueError(f"n3: expected 'of' after 'is {p}', "
                                 f"got {of!r}")
            return p, True
        return self._verb(), False

    def _apply_path(self, node: str, emitted: list):
        """Consume ``!p`` / ``^p`` tails: each step mints a fresh bnode
        b and emits (node, p, b) for ``!`` or (b, p, node) for ``^``,
        then continues from b (N3 Team Submission §3: paths)."""
        while (self._peek() is not None and self._peek().kind == "N3OP"
               and self._peek().value in ("!", "^")):
            op = self._next().value
            p = self._verb()
            b = self._fresh_bnode()
            if op == "!":
                emitted.append((node, p, (b, None, None)))
            else:
                emitted.append((b, p, (node, None, None)))
            node = b
        return node

    # -- grammar overrides ---------------------------------------------------

    def _triples(self):
        t = self._peek()
        if t.kind == "PUNCT" and t.value == "{":
            raise ValueError(
                "n3: formulas ({ ... }) have no RDF counterpart")
        if t.kind == "PUNCT" and t.value in ("[", "("):
            yield from super()._triples()
            return
        subj = self._subject()
        extra: list = []
        subj = self._apply_path(subj, extra)
        yield from extra
        yield from self._predicate_object_list(subj)

    def _predicate_object_list(self, subj: str):
        while True:
            p, inverted = self._verb_n3()
            while True:
                obj, emitted = self._object()
                yield from emitted
                if inverted:
                    lex, dt, lang = obj
                    if dt is not None or lang is not None:
                        raise ValueError(
                            "n3: 'is ... of' / '<=' with a literal object "
                            "would need a literal SUBJECT — not "
                            "representable in RDF")
                    yield (lex, p, (subj, None, None))
                else:
                    yield (subj, p, obj)
                nt = self._peek()
                if nt is not None and nt.value == ",":
                    self._next()
                    continue
                break
            nt = self._peek()
            if nt is not None and nt.value == ";":
                self._next()
                nt = self._peek()
                while nt is not None and nt.value == ";":
                    self._next()
                    nt = self._peek()
                if nt is None or nt.value in (".", "]"):
                    return
                continue
            return

    def _object(self):
        t = self._peek()
        if t.kind == "PUNCT" and t.value == "{":
            raise ValueError(
                "n3: formulas ({ ... }) have no RDF counterpart")
        obj, emitted = super()._object()
        lex, dt, lang = obj
        nt = self._peek()
        if (dt is None and lang is None and nt is not None
                and nt.kind == "N3OP" and nt.value in ("!", "^")):
            extra = list(emitted)
            node = self._apply_path(lex, extra)
            return (node, None, None), extra
        if (nt is not None and nt.kind == "N3OP"
                and nt.value in ("!", "^")):
            raise ValueError(
                "n3: path expressions starting from a literal would emit "
                "a literal subject — not representable in RDF")
        return obj, emitted


def parse_n3(text: str):
    """Iterate (s, p, (o_lex, o_dt, o_lang)) triples of one Notation3
    document (RDF-compatible subset; see :class:`N3Parser`)."""
    yield from N3Parser(text).parse()
