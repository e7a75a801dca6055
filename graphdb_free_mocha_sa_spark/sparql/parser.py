"""SPARQL 1.1 tokenizer + recursive-descent parser → algebra tree.

Hand-written (no third-party grammar libs available in the image). Covers the
query surface the reference system accepts (GraphDBSystemAdapter.java:246
prepareTupleQuery / :228 prepareUpdate, semantics per W3C SPARQL 1.1):
SELECT/ASK/CONSTRUCT/DESCRIBE, BGPs with ';' ',' 'a' and property paths,
FILTER/OPTIONAL/UNION/MINUS/GRAPH/BIND/VALUES/sub-SELECT/EXISTS,
GROUP BY/HAVING/ORDER BY/LIMIT/OFFSET, expressions with the full SPARQL
operator precedence and builtin/cast function calls, and SPARQL Update
(INSERT/DELETE DATA, DELETE WHERE, WITH/DELETE/INSERT/WHERE, LOAD, CLEAR,
DROP, CREATE, COPY/MOVE/ADD).

Known simplifications (documented, not silently wrong):
* '<' is an IRI opener when it matches the IRIREF regex — write comparison
  operators with surrounding whitespace (standard SPARQL style).
* Blank-node property lists and RDF collections expand to internal variables.
"""

from __future__ import annotations

import re
from typing import Optional

from graphdb_free_mocha_sa_spark.model import RDF, XSD
from graphdb_free_mocha_sa_spark.sparql.algebra import (
    AskQuery, BGP, BNode, ClearDrop, ConstructQuery, CopyMoveAdd, CreateGraph,
    DeleteData, DescribeQuery, EAgg, EBinary, EExists, EFunc, EIn, ELit,
    EUnary, EVar, Expr, Extend, Filter, GraphPat, InsertData, IRI, Join,
    LeftJoin, Literal, LoadOp, Minus, Modify, PAlt, Path, PInv, PLink, PMod,
    PNeg, PSeq, Pattern, QuadData, Query, SelectQuery, Service, SubSelect,
    Term, TriplePattern, Union, UpdateOp, ValuesTable, Var)

RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"

# ------------------------------------------------------------------ tokenizer

TOKEN_RE = re.compile(r"""
    (?P<WS>\s+|\#[^\n]*)
  | (?P<IRIREF><[^<>"{}|^`\\\x00-\x20]*>)
  | (?P<VAR>[?$][A-Za-z_][A-Za-z0-9_]*)
  | (?P<BNODE>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
  | (?P<STRING>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*'''|"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<LANGTAG>@[A-Za-z]+(?:-[A-Za-z0-9]+)*)
  | (?P<DOUBLE>(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
  | (?P<DECIMAL>\d+\.\d*|\.\d+)
  | (?P<INTEGER>\d+)
  | (?P<PNAME>(?:[A-Za-z_][A-Za-z0-9_-]*)?:(?:(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2}|\\[-_~.!$&'()*+,;=/?\#@%])(?:(?:[A-Za-z0-9_.:-]|%[0-9A-Fa-f]{2}|\\[-_~.!$&'()*+,;=/?\#@%])*(?:[A-Za-z0-9_:-]|%[0-9A-Fa-f]{2}|\\[-_~.!$&'()*+,;=/?\#@%]))?)?)
  | (?P<NAME>[A-Za-z_][A-Za-z0-9_]*)
  | (?P<PUNCT>\^\^|&&|\|\||!=|<=|>=|[{}()\[\],;.*/|^?+\-=<>!@])
""", re.VERBOSE)


class Token:
    __slots__ = ("kind", "value", "pos")

    def __init__(self, kind: str, value: str, pos: int):
        self.kind, self.value, self.pos = kind, value, pos

    def __repr__(self):
        return f"{self.kind}({self.value!r})"


def tokenize(text: str) -> list[Token]:
    tokens, i = [], 0
    while i < len(text):
        m = TOKEN_RE.match(text, i)
        if not m:
            raise SparqlSyntaxError(f"unexpected character {text[i]!r} at {i}")
        i = m.end()
        kind = m.lastgroup
        if kind == "WS":
            continue
        tokens.append(Token(kind, m.group(), m.start()))
    tokens.append(Token("EOF", "", len(text)))
    return tokens


class SparqlSyntaxError(ValueError):
    pass


_ECHAR = {"t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
          '"': '"', "'": "'", "\\": "\\"}
_ESC_RE = re.compile(r"\\(u[0-9A-Fa-f]{4}|U[0-9A-Fa-f]{8}|.)", re.S)


def _unescape(s: str) -> str:
    """Single-pass SPARQL string unescape: ECHARs plus \\uXXXX/\\UXXXXXXXX
    codepoints. (A sequential str.replace chain mis-decodes ``\\\\t`` —
    escaped backslash followed by t — and cannot express UCHARs.)"""
    def sub(m: "re.Match[str]") -> str:
        g = m.group(1)
        if g[0] == "u" and len(g) == 5:
            return chr(int(g[1:], 16))
        if g[0] == "U" and len(g) == 9:
            return chr(int(g[1:], 16))
        if g in _ECHAR:
            return _ECHAR[g]
        raise SparqlSyntaxError(f"invalid string escape \\{g}")
    return _ESC_RE.sub(sub, s)


def _string_value(tok: str) -> str:
    if tok.startswith(('"""', "'''")):
        return _unescape(tok[3:-3])
    return _unescape(tok[1:-1])


BUILTIN_FUNCS = {
    "STR", "LANG", "LANGMATCHES", "DATATYPE", "BOUND", "IRI", "URI", "BNODE",
    "RAND", "ABS", "CEIL", "FLOOR", "ROUND", "CONCAT", "STRLEN", "UCASE",
    "LCASE", "ENCODE_FOR_URI", "CONTAINS", "STRSTARTS", "STRENDS", "STRBEFORE",
    "STRAFTER", "YEAR", "MONTH", "DAY", "HOURS", "MINUTES", "SECONDS",
    "TIMEZONE", "TZ", "NOW", "UUID", "STRUUID", "MD5", "SHA1", "SHA256",
    "SHA384", "SHA512", "COALESCE", "IF", "STRLANG", "STRDT", "SAMETERM",
    "ISIRI", "ISURI", "ISBLANK", "ISLITERAL", "ISNUMERIC", "REGEX", "SUBSTR",
    "REPLACE",
}

AGG_FUNCS = {"COUNT", "SUM", "MIN", "MAX", "AVG", "SAMPLE", "GROUP_CONCAT"}


class Parser:
    def __init__(self, text: str):
        self.text = text
        self.tokens = tokenize(text)
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.base = ""
        self._bnode_n = 0

    # ---- token helpers

    def peek(self, ahead: int = 0) -> Token:
        return self.tokens[min(self.i + ahead, len(self.tokens) - 1)]

    def next(self) -> Token:
        if self.i >= len(self.tokens):
            # consuming past the EOF token is always a malformed query —
            # clean syntax error, not an IndexError (r7 robustness fuzz)
            raise SparqlSyntaxError("unexpected end of input")
        t = self.tokens[self.i]
        self.i += 1
        return t

    def at_kw(self, *kws: str) -> bool:
        t = self.peek()
        return t.kind == "NAME" and t.value.upper() in kws

    def accept_kw(self, *kws: str) -> Optional[str]:
        if self.at_kw(*kws):
            return self.next().value.upper()
        return None

    def expect_kw(self, kw: str):
        if not self.accept_kw(kw):
            raise SparqlSyntaxError(f"expected {kw} at {self.peek()!r}")

    def at_punct(self, p: str) -> bool:
        t = self.peek()
        return t.kind == "PUNCT" and t.value == p

    def accept_punct(self, p: str) -> bool:
        if self.at_punct(p):
            self.next()
            return True
        return False

    def expect_punct(self, p: str):
        if not self.accept_punct(p):
            raise SparqlSyntaxError(f"expected {p!r} at {self.peek()!r}")

    def fresh_bnode(self) -> Var:
        self._bnode_n += 1
        return Var(f"__bn{self._bnode_n}")

    # ---- prologue

    def parse_prologue(self):
        while True:
            if self.at_kw("PREFIX"):
                self.next()
                pn = self.next()
                if pn.kind != "PNAME" or not pn.value.endswith(":"):
                    raise SparqlSyntaxError(f"bad PREFIX name {pn!r}")
                iri = self.next()
                if iri.kind != "IRIREF":
                    raise SparqlSyntaxError(f"bad PREFIX iri {iri!r}")
                self.prefixes[pn.value[:-1]] = iri.value[1:-1]
            elif self.at_kw("BASE"):
                self.next()
                iri = self.next()
                self.base = iri.value[1:-1]
            else:
                return

    def resolve_pname(self, pname: str) -> str:
        ns, _, local = pname.partition(":")
        # PN_LOCAL_ESC: backslash-escaped punctuation in local names
        # (ex:f\,g — the escape is grammar-level, the IRI keeps the
        # char); applied BEFORE either resolution branch so builtin and
        # declared prefixes agree (review fix)
        local = re.sub(r"\\([-_~.!$&'()*+,;=/?#@%])", r"\1", local)
        if ns not in self.prefixes:
            # built-in convenience prefixes
            builtin = {"rdf": RDF, "xsd": XSD,
                       "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
                       "owl": "http://www.w3.org/2002/07/owl#"}
            if ns in builtin:
                return builtin[ns] + local
            raise SparqlSyntaxError(f"unknown prefix {ns!r}")
        return self.prefixes[ns] + local

    def parse_iri(self) -> str:
        t = self.next()
        if t.kind == "IRIREF":
            return self.base + t.value[1:-1] if (self.base and not re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*:", t.value[1:-1])) else t.value[1:-1]
        if t.kind == "PNAME":
            return self.resolve_pname(t.value)
        raise SparqlSyntaxError(f"expected IRI at {t!r}")

    # ---- terms

    def parse_term(self, allow_var: bool = True) -> Term:
        t = self.peek()
        if t.kind == "VAR":
            if not allow_var:
                raise SparqlSyntaxError("variable not allowed here")
            self.next()
            return Var(t.value[1:])
        if t.kind in ("IRIREF", "PNAME"):
            return IRI(self.parse_iri())
        if t.kind == "BNODE":
            self.next()
            return BNode(t.value[2:])
        if t.kind == "STRING":
            self.next()
            lex = _string_value(t.value)
            nxt = self.peek()
            if nxt.kind == "LANGTAG":
                self.next()
                return Literal(lex, dt=RDF + "langString", lang=nxt.value[1:].lower())
            if nxt.kind == "PUNCT" and nxt.value == "^^":
                self.next()
                return Literal(lex, dt=self.parse_iri())
            return Literal(lex, dt=XSD + "string")
        if t.kind in ("INTEGER", "DECIMAL", "DOUBLE"):
            self.next()
            dt = {"INTEGER": XSD + "integer", "DECIMAL": XSD + "decimal",
                  "DOUBLE": XSD + "double"}[t.kind]
            return Literal(t.value, dt=dt)
        if t.kind == "PUNCT" and t.value in ("+", "-"):
            sign = self.next().value
            n = self.next()
            if n.kind not in ("INTEGER", "DECIMAL", "DOUBLE"):
                raise SparqlSyntaxError(f"expected number after sign at {n!r}")
            dt = {"INTEGER": XSD + "integer", "DECIMAL": XSD + "decimal",
                  "DOUBLE": XSD + "double"}[n.kind]
            lex = n.value if sign == "+" else "-" + n.value
            return Literal(lex, dt=dt)
        if t.kind == "NAME" and t.value.lower() in ("true", "false"):
            self.next()
            return Literal(t.value.lower(), dt=XSD + "boolean")
        raise SparqlSyntaxError(f"expected RDF term at {t!r}")

    # ---- property paths

    def parse_path(self) -> Path:
        return self._path_alt()

    def _path_alt(self) -> Path:
        left = self._path_seq()
        while self.at_punct("|"):
            self.next()
            left = PAlt(left, self._path_seq())
        return left

    def _path_seq(self) -> Path:
        left = self._path_elt_or_inverse()
        while self.at_punct("/"):
            self.next()
            left = PSeq(left, self._path_elt_or_inverse())
        return left

    def _path_elt_or_inverse(self) -> Path:
        if self.accept_punct("^"):
            return PInv(self._path_elt())
        return self._path_elt()

    def _path_elt(self) -> Path:
        p = self._path_primary()
        if self.at_punct("+") or self.at_punct("*") or self.at_punct("?"):
            mod = self.next().value
            return PMod(p, mod)
        return p

    # _path_primary is attached below the class body (kept separate for length)

    # ---- expressions (precedence climbing)

    def parse_expression(self) -> Expr:
        return self._expr_or()

    def _expr_or(self) -> Expr:
        left = self._expr_and()
        while self.at_punct("||"):
            self.next()
            left = EBinary("||", left, self._expr_and())
        return left

    def _expr_and(self) -> Expr:
        left = self._expr_rel()
        while self.at_punct("&&"):
            self.next()
            left = EBinary("&&", left, self._expr_rel())
        return left

    def _expr_rel(self) -> Expr:
        left = self._expr_add()
        for op in ("=", "!=", "<=", ">=", "<", ">"):
            if self.at_punct(op):
                self.next()
                return EBinary(op, left, self._expr_add())
        if self.at_kw("IN"):
            self.next()
            return EIn(left, tuple(self._expr_list()), negated=False)
        if self.at_kw("NOT"):
            save = self.i
            self.next()
            if self.accept_kw("IN"):
                return EIn(left, tuple(self._expr_list()), negated=True)
            self.i = save
        return left

    def _expr_list(self) -> list[Expr]:
        self.expect_punct("(")
        items = []
        if not self.at_punct(")"):
            items.append(self.parse_expression())
            while self.accept_punct(","):
                items.append(self.parse_expression())
        self.expect_punct(")")
        return items

    def _expr_add(self) -> Expr:
        left = self._expr_mul()
        while self.at_punct("+") or self.at_punct("-"):
            op = self.next().value
            left = EBinary(op, left, self._expr_mul())
        return left

    def _expr_mul(self) -> Expr:
        left = self._expr_unary()
        while self.at_punct("*") or self.at_punct("/"):
            op = self.next().value
            left = EBinary(op, left, self._expr_unary())
        return left

    def _expr_unary(self) -> Expr:
        if self.at_punct("!"):
            self.next()
            return EUnary("!", self._expr_unary())
        if self.at_punct("-") or self.at_punct("+"):
            sign = self.peek()
            num = self.peek(1)
            # NumericLiteralNegative/Positive are single TERMINALS in the
            # grammar: a sign DIRECTLY attached to a number is a signed
            # literal whose LEXICAL FORM keeps the sign — xsd:string(-2.5e0)
            # is "-2.5e0", not a recomputed "-2.5" (r7 fuzz-soak fix).
            # Same value space as unary minus, so only STR/xsd:string
            # observe the difference.
            if num.kind in ("INTEGER", "DECIMAL", "DOUBLE") \
                    and num.pos == sign.pos + 1:
                self.next()
                self.next()
                dt = {"INTEGER": XSD + "integer",
                      "DECIMAL": XSD + "decimal",
                      "DOUBLE": XSD + "double"}[num.kind]
                lex = num.value if sign.value == "+" else "-" + num.value
                return ELit(Literal(lex, dt=dt))
            self.next()
            # op:numeric-unary-plus is NOT the identity: a non-numeric
            # operand must be a type error, so the node is kept (r7 fuzz
            # fix: `+<iri>` used to pass the IRI through unchanged)
            return EUnary(sign.value, self._expr_unary())
        return self._expr_primary()

    def _expr_primary(self) -> Expr:
        t = self.peek()
        if t.kind == "PUNCT" and t.value == "(":
            self.next()
            e = self.parse_expression()
            self.expect_punct(")")
            return e
        if t.kind == "VAR":
            self.next()
            return EVar(t.value[1:])
        if t.kind in ("STRING", "INTEGER", "DECIMAL", "DOUBLE"):
            term = self.parse_term()
            return ELit(term)
        if t.kind == "NAME":
            up = t.value.upper()
            if up in ("TRUE", "FALSE"):
                self.next()
                return ELit(Literal(up.lower(), dt=XSD + "boolean"))
            if up == "NOT":
                self.next()
                self.expect_kw("EXISTS")
                return EExists(self.parse_group_graph_pattern(), negated=True)
            if up == "EXISTS":
                self.next()
                return EExists(self.parse_group_graph_pattern(), negated=False)
            if up in AGG_FUNCS:
                return self._parse_aggregate()
            if up in BUILTIN_FUNCS:
                self.next()
                if up == "NOW" and not self.at_punct("("):
                    return EFunc("NOW", ())
                args = tuple(self._expr_list()) if self.at_punct("(") else ()
                return EFunc(up, args)
            raise SparqlSyntaxError(f"unknown function/keyword {t.value!r}")
        if t.kind in ("IRIREF", "PNAME"):
            # IRI or cast-function call  xsd:integer(?x)
            iri = self.parse_iri()
            if self.at_punct("("):
                args = tuple(self._expr_list())
                return EFunc(iri, args)
            return ELit(IRI(iri))
        raise SparqlSyntaxError(f"unexpected token in expression: {t!r}")

    def _parse_aggregate(self) -> Expr:
        func = self.next().value.upper()
        self.expect_punct("(")
        distinct = bool(self.accept_kw("DISTINCT"))
        if func == "COUNT" and self.at_punct("*"):
            self.next()
            self.expect_punct(")")
            return EAgg("COUNT", None, distinct)
        expr = self.parse_expression()
        sep = " "
        if self.accept_punct(";"):
            self.expect_kw("SEPARATOR")
            self.expect_punct("=")
            sep_tok = self.next()
            sep = _string_value(sep_tok.value)
        self.expect_punct(")")
        return EAgg(func, expr, distinct, sep)

    # ---- triples / group graph patterns

    def parse_group_graph_pattern(self) -> Pattern:
        self.expect_punct("{")
        if self.at_kw("SELECT"):
            sub = self.parse_select_query(sub=True)
            self.expect_punct("}")
            return SubSelect(sub)
        current: Pattern = BGP([])
        filters: list[Expr] = []

        def join_in(p: Pattern):
            nonlocal current
            if isinstance(current, BGP) and not current.triples:
                current = p
            elif isinstance(current, BGP) and isinstance(p, BGP):
                current.triples.extend(p.triples)
            else:
                current = Join(current, p)

        while not self.at_punct("}"):
            if self.at_kw("FILTER"):
                self.next()
                filters.append(self._parse_constraint())
            elif self.at_kw("OPTIONAL"):
                self.next()
                inner = self.parse_group_graph_pattern()
                if isinstance(inner, Filter):
                    current = LeftJoin(current, inner.pattern, inner.expr)
                else:
                    current = LeftJoin(current, inner, None)
            elif self.at_kw("MINUS"):
                self.next()
                current = Minus(current, self.parse_group_graph_pattern())
            elif self.at_kw("GRAPH"):
                self.next()
                gterm = self.parse_term()
                # grammar: GraphGraphPattern ::= 'GRAPH' VarOrIri ... — a
                # literal or bnode graph name is a syntax error (r7 probe
                # fix: it parsed, then crashed at translation)
                if not isinstance(gterm, (Var, IRI)):
                    raise SparqlSyntaxError(
                        "GRAPH expects a variable or IRI, got "
                        f"{gterm!r}")
                inner = self.parse_group_graph_pattern()
                join_in(GraphPat(gterm, inner))
            elif self.at_kw("BIND"):
                self.next()
                self.expect_punct("(")
                expr = self.parse_expression()
                self.expect_kw("AS")
                v = self.next()
                if v.kind != "VAR":
                    raise SparqlSyntaxError("expected var after AS")
                self.expect_punct(")")
                current = Extend(current, v.value[1:], expr)
            elif self.at_kw("VALUES"):
                self.next()
                join_in(self._parse_values())
            elif self.at_kw("SERVICE"):
                self.next()
                silent = self.accept_kw("SILENT") is not None
                ep = self.parse_term()
                if not isinstance(ep, (IRI, Var)):
                    raise SparqlSyntaxError(
                        "SERVICE endpoint must be an IRI or a variable")
                start = self.peek().pos          # the '{' of the group
                inner = self.parse_group_graph_pattern()
                end = self.tokens[self.i - 1].pos  # its matching '}'
                raw = self.text[start:end + 1]
                preamble = "".join(f"PREFIX {p}: <{iri}>\n"
                                   for p, iri in self.prefixes.items())
                join_in(Service(ep, inner, silent,
                                preamble + "SELECT * WHERE " + raw))
            elif self.at_punct("{"):
                inner = self._parse_group_or_union()
                join_in(inner)
            else:
                bgp = self._parse_triples_block()
                join_in(bgp)
            self.accept_punct(".")
        self.expect_punct("}")
        for f in filters:
            current = Filter(f, current)
        return current

    def _parse_group_or_union(self) -> Pattern:
        left = self.parse_group_graph_pattern()
        while self.at_kw("UNION"):
            self.next()
            right = self.parse_group_graph_pattern()
            left = Union(left, right)
        return left

    def _parse_constraint(self) -> Expr:
        # BrackettedExpression | BuiltInCall | FunctionCall
        return self._expr_primary() if not self.at_punct("(") else self._bracketted()

    def _bracketted(self) -> Expr:
        self.expect_punct("(")
        e = self.parse_expression()
        self.expect_punct(")")
        return e

    def _parse_values(self) -> ValuesTable:
        # VALUES ?x { ... }   |   VALUES (?x ?y) { (..) (..) }
        if self.at_punct("("):
            self.next()
            names = []
            while not self.at_punct(")"):
                v = self.next()
                names.append(v.value[1:])
            self.next()
            if len(set(names)) != len(names):
                raise SparqlSyntaxError(
                    "VALUES: duplicate variable in the variable list")
            self.expect_punct("{")
            rows = []
            while self.at_punct("("):
                self.next()
                row: list[Optional[Term]] = []
                while not self.at_punct(")"):
                    if self.at_kw("UNDEF"):
                        self.next()
                        row.append(None)
                    else:
                        row.append(self.parse_term(allow_var=False))
                self.next()
                if len(row) != len(names):
                    raise SparqlSyntaxError(
                        f"VALUES row has {len(row)} terms for "
                        f"{len(names)} variables")
                rows.append(row)
            self.expect_punct("}")
            return ValuesTable(names, rows)
        v = self.next()
        name = v.value[1:]
        self.expect_punct("{")
        rows = []
        while not self.at_punct("}"):
            if self.at_kw("UNDEF"):
                self.next()
                rows.append([None])
            else:
                rows.append([self.parse_term(allow_var=False)])
        self.next()
        return ValuesTable([name], rows)

    def _parse_triples_block(self) -> BGP:
        triples: list[TriplePattern] = []
        self._parse_triples_same_subject(triples)
        while self.accept_punct("."):
            if (self.at_punct("}") or self.peek().kind == "EOF"
                    or self.at_kw("FILTER", "OPTIONAL", "MINUS", "GRAPH",
                                  "BIND", "VALUES", "UNION", "SERVICE")
                    or self.at_punct("{")):
                # trailing dot before a non-triples element: put it back
                self.i -= 1
                break
            self._parse_triples_same_subject(triples)
        return BGP(triples)

    def _parse_triples_same_subject(self, out: list[TriplePattern]):
        if self.at_punct("["):
            s = self._parse_bnode_props(out)
            if self._at_verb():
                self._parse_property_list(s, out)
            return
        if self.at_punct("("):
            s = self._parse_collection(out)
            self._parse_property_list(s, out)
            return
        s = self.parse_term()
        self._parse_property_list(s, out)

    def _at_verb(self) -> bool:
        t = self.peek()
        return (t.kind in ("IRIREF", "PNAME", "VAR")
                or (t.kind == "NAME" and t.value == "a")
                or (t.kind == "PUNCT" and t.value in ("^", "(", "!")))

    def _parse_property_list(self, s: Term, out: list[TriplePattern]):
        while True:
            p = self._parse_verb()
            while True:
                o = self._parse_object(out)
                out.append(TriplePattern(s, p, o))
                if not self.accept_punct(","):
                    break
            if not self.accept_punct(";"):
                return
            if not self._at_verb():   # dangling ';'
                return

    def _parse_verb(self):
        t = self.peek()
        if t.kind == "VAR":
            self.next()
            return Var(t.value[1:])
        if t.kind == "NAME" and t.value == "a":
            self.next()
            return PLink(RDF_TYPE)
        return self.parse_path()

    def _parse_object(self, out: list[TriplePattern]) -> Term:
        if self.at_punct("["):
            return self._parse_bnode_props(out)
        if self.at_punct("(") :
            return self._parse_collection(out)
        return self.parse_term()

    def _parse_bnode_props(self, out: list[TriplePattern]) -> Term:
        self.expect_punct("[")
        b = self.fresh_bnode()
        if not self.at_punct("]"):
            self._parse_property_list(b, out)
        self.expect_punct("]")
        return b

    def _parse_collection(self, out: list[TriplePattern]) -> Term:
        self.expect_punct("(")
        items: list[Term] = []
        while not self.at_punct(")"):
            items.append(self._parse_object(out))
        self.next()
        if not items:
            return IRI(RDF_NIL)
        head = self.fresh_bnode()
        cur = head
        for i, it in enumerate(items):
            out.append(TriplePattern(cur, PLink(RDF_FIRST), it))
            nxt = self.fresh_bnode() if i < len(items) - 1 else IRI(RDF_NIL)
            out.append(TriplePattern(cur, PLink(RDF_REST), nxt))
            cur = nxt
        return head

    # ---- queries

    def parse_query(self) -> Query:
        self.parse_prologue()
        if self.at_kw("SELECT"):
            return self.parse_select_query(sub=False)
        if self.at_kw("ASK"):
            self.next()
            dd, dn = self._parse_datasets()
            if self.at_kw("WHERE"):
                self.next()
            pat = self.parse_group_graph_pattern()
            if self.at_kw("VALUES"):            # trailing ValuesClause
                self.next()
                pat = Join(pat, self._parse_values())
            return AskQuery(pat, dd, dn)
        if self.at_kw("CONSTRUCT"):
            return self._parse_construct()
        if self.at_kw("DESCRIBE"):
            return self._parse_describe()
        raise SparqlSyntaxError(f"expected query form at {self.peek()!r}")

    def _parse_datasets(self) -> tuple[list[str], list[str]]:
        dd, dn = [], []
        while self.at_kw("FROM"):
            self.next()
            if self.accept_kw("NAMED"):
                dn.append(self.parse_iri())
            else:
                dd.append(self.parse_iri())
        return dd, dn

    def parse_select_query(self, sub: bool) -> SelectQuery:
        self.expect_kw("SELECT")
        distinct = bool(self.accept_kw("DISTINCT"))
        reduced = bool(self.accept_kw("REDUCED"))
        projections: list[tuple[str, Optional[Expr]]] = []
        if self.at_punct("*"):
            self.next()
        else:
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    projections.append((t.value[1:], None))
                elif self.at_punct("("):
                    self.next()
                    expr = self.parse_expression()
                    self.expect_kw("AS")
                    v = self.next()
                    self.expect_punct(")")
                    projections.append((v.value[1:], expr))
                else:
                    break
        names = [n for n, _ in projections]
        if len(set(names)) != len(names):
            raise SparqlSyntaxError(
                "SELECT: a variable may appear only once in the "
                "projection (duplicate or AS over a projected name)")
        dd, dn = ([], []) if sub else self._parse_datasets()
        if self.at_kw("WHERE"):
            self.next()
        pattern = self.parse_group_graph_pattern()
        q = SelectQuery(projections, pattern, distinct=distinct, reduced=reduced,
                        dataset_default=dd, dataset_named=dn)
        self._parse_solution_modifiers(q)
        if q.group_by and not q.projections:
            raise SparqlSyntaxError(
                "SELECT * cannot be used with GROUP BY (spec 18.2.4.1: "
                "projected variables must be group keys or aggregates)")
        return q

    def _parse_solution_modifiers(self, q):
        if self.at_kw("GROUP"):
            self.next()
            self.expect_kw("BY")
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    q.group_by.append((t.value[1:], EVar(t.value[1:])))
                elif self.at_punct("("):
                    self.next()
                    e = self.parse_expression()
                    name = None
                    if self.accept_kw("AS"):
                        name = self.next().value[1:]
                    self.expect_punct(")")
                    q.group_by.append((name, e))
                elif t.kind in ("IRIREF", "PNAME") or (t.kind == "NAME" and t.value.upper() in BUILTIN_FUNCS):
                    q.group_by.append((None, self._expr_primary()))
                else:
                    break
        if self.at_kw("HAVING"):
            self.next()
            while self.at_punct("("):
                q.having.append(self._bracketted())
        if self.at_kw("ORDER"):
            self.next()
            self.expect_kw("BY")
            while True:
                t = self.peek()
                if self.at_kw("ASC", "DESC"):
                    asc = self.next().value.upper() == "ASC"
                    q.order_by.append((self._bracketted(), asc))
                elif t.kind == "VAR":
                    self.next()
                    q.order_by.append((EVar(t.value[1:]), True))
                elif t.kind == "PUNCT" and t.value == "(":
                    q.order_by.append((self._bracketted(), True))
                elif t.kind == "NAME" and (
                        t.value.upper() in BUILTIN_FUNCS
                        # (NOT) EXISTS is a BuiltInCall and therefore a
                        # valid bare OrderCondition (r7 fix)
                        or t.value.upper() in ("EXISTS", "NOT")):
                    q.order_by.append((self._expr_primary(), True))
                else:
                    break
        # LIMIT/OFFSET in either order
        def _int_arg(kw: str) -> int:
            t = self.next()
            # clean syntax error instead of a raw ValueError on "LIMIT"
            # followed by EOF/garbage (r7 parser-robustness fuzz)
            if t.kind != "INTEGER" or not t.value.isdigit():
                raise SparqlSyntaxError(
                    f"{kw} expects a non-negative integer, got "
                    f"{t.value!r}")
            return int(t.value)

        for _ in range(2):
            if self.at_kw("LIMIT"):
                self.next()
                q.limit = _int_arg("LIMIT")
            elif self.at_kw("OFFSET"):
                self.next()
                q.offset = _int_arg("OFFSET")
        # query-level trailing VALUES (grammar: SolutionModifier
        # ValuesClause — applies to top-level queries AND sub-selects)
        if self.at_kw("VALUES"):
            self.next()
            q.values_clause = self._parse_values()

    def _parse_construct(self) -> ConstructQuery:
        self.expect_kw("CONSTRUCT")
        template: list[TriplePattern] = []
        if self.at_punct("{"):
            self.next()
            if not self.at_punct("}"):
                bgp = self._parse_triples_block()
                template = bgp.triples
            self.accept_punct(".")
            self.expect_punct("}")
            dd, dn = self._parse_datasets()
            if self.at_kw("WHERE"):
                self.next()
            pattern = self.parse_group_graph_pattern()
        else:
            # CONSTRUCT WHERE { template }  shorthand
            dd, dn = self._parse_datasets()
            self.expect_kw("WHERE")
            pattern = self.parse_group_graph_pattern()
            assert isinstance(pattern, BGP), "CONSTRUCT WHERE requires a plain BGP"
            template = pattern.triples
        q = ConstructQuery(template, pattern, dataset_default=dd, dataset_named=dn)
        shim = SelectQuery([], pattern)
        self._parse_solution_modifiers(shim)
        q.limit, q.offset, q.order_by = shim.limit, shim.offset, shim.order_by
        if shim.values_clause is not None:
            # CONSTRUCT has no aggregation stage, so the trailing VALUES
            # join into the pattern is exactly the spec's post-join
            q.pattern = Join(q.pattern, shim.values_clause)
        return q

    def _parse_describe(self) -> DescribeQuery:
        self.expect_kw("DESCRIBE")
        terms: list[Term] = []
        if self.at_punct("*"):
            self.next()
        else:
            while True:
                t = self.peek()
                if t.kind == "VAR":
                    self.next()
                    terms.append(Var(t.value[1:]))
                elif t.kind in ("IRIREF", "PNAME"):
                    terms.append(IRI(self.parse_iri()))
                else:
                    break
        pattern = None
        if self.at_kw("WHERE") or self.at_punct("{"):
            self.accept_kw("WHERE")
            pattern = self.parse_group_graph_pattern()
        q = DescribeQuery(terms, pattern)
        shim = SelectQuery([], pattern if pattern is not None else BGP([]))
        self._parse_solution_modifiers(shim)
        q.order_by, q.limit, q.offset = shim.order_by, shim.limit, shim.offset
        if shim.values_clause is not None and pattern is not None:
            q.pattern = Join(pattern, shim.values_clause)
        return q

    # ---- updates

    def parse_update(self) -> list[UpdateOp]:
        ops: list[UpdateOp] = []
        while True:
            self.parse_prologue()
            if self.peek().kind == "EOF":
                break
            ops.append(self._parse_update_op())
            if not self.accept_punct(";"):
                break
        t = self.peek()
        if t.kind != "EOF":
            raise SparqlSyntaxError(
                f"unexpected trailing input in update at {t.value!r} "
                f"(pos {t.pos})")
        for op in ops:                 # IRI() BASE resolution in WHERE (r6)
            try:
                op.base = self.base or None
            except Exception:
                pass
        return ops

    def _parse_update_op(self) -> UpdateOp:
        if self.at_kw("INSERT"):
            self.next()
            if self.accept_kw("DATA"):
                return InsertData(self._parse_quad_data())
            ins = self._parse_quad_template()
            using, using_named = self._parse_using()
            self.expect_kw("WHERE")
            return Modify([], ins, self.parse_group_graph_pattern(),
                          using=using, using_named=using_named)
        if self.at_kw("DELETE"):
            self.next()
            if self.accept_kw("DATA"):
                return DeleteData(self._parse_quad_data())
            if self.accept_kw("WHERE"):
                tmpl = self._parse_quad_template()
                pat = BGP([tp for _, tp in tmpl if True])
                # DELETE WHERE { qp }: template == pattern
                return Modify(tmpl, [], self._template_to_pattern(tmpl))
            dele = self._parse_quad_template()
            ins: list = []
            if self.accept_kw("INSERT"):
                ins = self._parse_quad_template()
            using, using_named = self._parse_using()
            self.expect_kw("WHERE")
            return Modify(dele, ins, self.parse_group_graph_pattern(),
                          using=using, using_named=using_named)
        if self.at_kw("WITH"):
            self.next()
            g = self.parse_iri()
            op = self._parse_update_op()
            assert isinstance(op, Modify)
            op.with_graph = g
            return op
        if self.at_kw("CLEAR", "DROP"):
            op = self.next().value.upper()
            silent = bool(self.accept_kw("SILENT"))
            if self.accept_kw("GRAPH"):
                return ClearDrop(op, self.parse_iri(), silent)
            kw = self.accept_kw("DEFAULT", "NAMED", "ALL")
            return ClearDrop(op, kw or "ALL", silent)
        if self.at_kw("CREATE"):
            self.next()
            silent = bool(self.accept_kw("SILENT"))
            self.expect_kw("GRAPH")
            return CreateGraph(self.parse_iri(), silent)
        if self.at_kw("LOAD"):
            self.next()
            silent = bool(self.accept_kw("SILENT"))
            src = self.parse_iri()
            graph = None
            if self.accept_kw("INTO"):
                self.expect_kw("GRAPH")
                graph = self.parse_iri()
            return LoadOp(src, graph, silent)
        if self.at_kw("COPY", "MOVE", "ADD"):
            op = self.next().value.upper()
            silent = bool(self.accept_kw("SILENT"))
            src = None if self.accept_kw("DEFAULT") else (self.accept_kw("GRAPH"), self.parse_iri())[1]
            self.expect_kw("TO")
            dst = None if self.accept_kw("DEFAULT") else (self.accept_kw("GRAPH"), self.parse_iri())[1]
            return CopyMoveAdd(op, src, dst, silent)
        raise SparqlSyntaxError(f"unknown update op at {self.peek()!r}")

    def _parse_using(self) -> tuple:
        """UsingClause* (SPARQL Update §3.1.3): USING <g> selects the
        WHERE pattern's default graph, USING NAMED <g> its named set."""
        using, named = [], []
        while self.at_kw("USING"):
            self.next()
            if self.accept_kw("NAMED"):
                named.append(self.parse_iri())
            else:
                using.append(self.parse_iri())
        return tuple(using), tuple(named)

    def _template_to_pattern(self, tmpl) -> Pattern:
        by_graph: dict[Optional[str], list[TriplePattern]] = {}
        for g, tp in tmpl:
            by_graph.setdefault(g if isinstance(g, (str, type(None))) else g, []).append(tp)
        pat: Optional[Pattern] = None
        for g, tps in by_graph.items():
            p: Pattern = BGP(tps)
            if g is not None:
                gterm = Var(g.name) if isinstance(g, Var) else IRI(g)
                p = GraphPat(gterm, p)
            pat = p if pat is None else Join(pat, p)
        return pat or BGP([])

    def _parse_quad_template(self) -> list[tuple[Optional[object], TriplePattern]]:
        """{ triples (GRAPH g { triples })* } with vars allowed."""
        self.expect_punct("{")
        out: list[tuple[Optional[object], TriplePattern]] = []
        while not self.at_punct("}"):
            if self.at_kw("GRAPH"):
                self.next()
                gterm = self.parse_term()
                g = gterm if isinstance(gterm, Var) else gterm.value
                self.expect_punct("{")
                if not self.at_punct("}"):
                    bgp = self._parse_triples_block()
                    out.extend((g, tp) for tp in bgp.triples)
                self.accept_punct(".")
                self.expect_punct("}")
                self.accept_punct(".")
            else:
                bgp = self._parse_triples_block()
                out.extend((None, tp) for tp in bgp.triples)
                self.accept_punct(".")
        self.next()
        return out

    def _parse_quad_data(self) -> QuadData:
        tmpl = self._parse_quad_template()
        quads = []
        for g, tp in tmpl:
            for t in (tp.s, tp.p if not isinstance(tp.p, PLink) else None, tp.o):
                if isinstance(t, Var):
                    raise SparqlSyntaxError("variables not allowed in DATA block")
            p = IRI(tp.p.iri) if isinstance(tp.p, PLink) else tp.p
            quads.append((g if not isinstance(g, Var) else None, tp.s, p, tp.o))
        return QuadData(quads)


# fix the path-primary implementation (defined after class body for clarity)
def _path_primary(self) -> Path:
    t = self.peek()
    if t.kind == "PUNCT" and t.value == "(":
        self.next()
        p = self.parse_path()
        self.expect_punct(")")
        return p
    if t.kind == "PUNCT" and t.value == "!":
        self.next()
        fwd: list[str] = []
        inv: list[str] = []
        if self.accept_punct("("):
            while True:
                if self.accept_punct("^"):
                    inv.append(RDF_TYPE if self.accept_kw("A") else self.parse_iri())
                else:
                    if self.peek().kind == "NAME" and self.peek().value == "a":
                        self.next()
                        fwd.append(RDF_TYPE)
                    else:
                        fwd.append(self.parse_iri())
                if not self.accept_punct("|"):
                    break
            self.expect_punct(")")
        else:
            if self.accept_punct("^"):
                inv.append(self.parse_iri())
            elif self.peek().kind == "NAME" and self.peek().value == "a":
                self.next()
                fwd.append(RDF_TYPE)
            else:
                fwd.append(self.parse_iri())
        return PNeg(tuple(fwd), tuple(inv))
    if t.kind == "NAME" and t.value == "a":
        self.next()
        return PLink(RDF_TYPE)
    return PLink(self.parse_iri())


Parser._path_primary = _path_primary


def parse_query(text: str) -> Query:
    p = Parser(text)
    q = p.parse_query()
    t = p.peek()
    if t.kind != "EOF":
        raise SparqlSyntaxError(
            f"unexpected trailing input at {t.value!r} (pos {t.pos})")
    # runtime IRI("rel") resolution needs the prologue's BASE (r6)
    try:
        q.base = p.base or None
    except Exception:
        pass
    return q


def parse_update(text: str) -> list[UpdateOp]:
    return Parser(text).parse_update()
