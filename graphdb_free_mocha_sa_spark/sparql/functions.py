"""SPARQL expression semantics compiled to native Spark Column expressions.

Implements SPARQL 1.1 §17 (operator mappings + builtin function library) as
*composable Column builders* — never row-at-a-time Python UDFs — so every
expression stays inside Catalyst/whole-stage-codegen (SURVEY §4 "what needs
custom work" item 3). Three-valued error semantics map to SQL NULL (SPARQL
"error" ⇒ NULL ⇒ FILTER drops the row), which coincides with Kleene logic for
&&/|| exactly as SQL defines them.

Every expression evaluates to a :class:`TCol` — the same flat term-column
family used for variables (key/lex/dt/lang/num/ts) so computed terms can be
joined, grouped, ordered and projected uniformly.

Deviations (documented): the numeric SHADOW column (``num``) is a DOUBLE for
every numeric datatype — result *datatypes* follow the §17.3 promotion ladder
(integer → decimal → double, with ``/`` promoting integer operands to
decimal) and xsd:decimal result lexicals are recovered through a
``decimal(38,15)`` rounding of the double (exact for operands with ≤ 15
significant digits), but value-space comparisons of decimal expressions use
the IEEE double approximation. GROUP_CONCAT sorts its inputs for determinism
(SURVEY B24).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from graphdb_free_mocha_sa_spark.model import (NUMERIC_DTS, RDF_LANGSTRING,
                                               XSD, XSD_BOOLEAN, XSD_DATE,
                                               XSD_DATETIME,
                                               XSD_DECIMAL, XSD_DOUBLE,
                                               XSD_FLOAT, XSD_INT,
                                               XSD_INTEGER, XSD_LONG,
                                               XSD_STRING,
                                               canonical_key_from_parts,
                                               date_shadow_col,
                                               datetime_shadow_col,
                                               term_kind_rank, valid_num_lex)

#: the integer-valued XSD types (promote together per §17.3) — the full
#: derived-integer family (r8 conformance fix: isNumeric("1"^^xsd:byte))
from graphdb_free_mocha_sa_spark.model import XSD_INT_DERIVED as INT_DTS
#: the IEEE types (promote everything they touch to double)
DBL_DTS = (XSD_DOUBLE, XSD_FLOAT)
from graphdb_free_mocha_sa_spark.sparql import algebra as A

#: per-row salt column the translator materializes whenever an expression
#: tree contains BNODE (one uuid() per row, evaluated exactly once) —
#: BNODE results are deterministic hashes of it, so a bnode's key and lex
#: agree and BNODE(str) is stable within a solution (§17.4.2.9)
BNODE_SALT = "__bnode_salt"
_BNODE_SITE = 0


def expr_has_bnode(e) -> bool:
    """True if the expression tree contains a BNODE() call (the translator
    then materializes the BNODE_SALT column before evaluation)."""
    if isinstance(e, A.EFunc):
        if e.name.upper() == "BNODE":
            return True
        return any(expr_has_bnode(x) for x in e.args)
    if isinstance(e, A.EBinary):
        return expr_has_bnode(e.left) or expr_has_bnode(e.right)
    if isinstance(e, A.EUnary):
        return expr_has_bnode(e.expr)
    if isinstance(e, A.EIn):
        return expr_has_bnode(e.expr) or any(expr_has_bnode(x)
                                             for x in e.items)
    if isinstance(e, A.EAgg) and e.expr is not None:
        return expr_has_bnode(e.expr)
    return False


# lazy: Column construction needs an active SparkSession, so no module-level lits
def _NS():
    return F.lit(None).cast("string")


def _ND():
    return F.lit(None).cast("double")


def _NT():
    return F.lit(None).cast("timestamp")


def _NB():
    return F.lit(None).cast("boolean")


class TCol:
    """A SPARQL term as a family of Spark Column expressions."""

    __slots__ = ("lex", "dt", "lang", "num", "ts", "_key", "_bool")

    def __init__(self, lex=None, dt=None, lang=None, num=None, ts=None,
                 key=None, boolean=None):
        self.lex = lex if lex is not None else _NS()
        self.dt = dt if dt is not None else _NS()
        self.lang = lang if lang is not None else _NS()
        self.num = num if num is not None else _ND()
        self.ts = ts if ts is not None else _NT()
        self._key = key
        self._bool = boolean

    # -- constructors -------------------------------------------------

    @classmethod
    def from_var(cls, name: str) -> "TCol":
        return cls(lex=F.col(name + "__lex"), dt=F.col(name + "__dt"),
                   lang=F.col(name + "__lang"), num=F.col(name + "__num"),
                   ts=F.col(name + "__ts"), key=F.col(name))

    @classmethod
    def from_term(cls, term) -> "TCol":
        if isinstance(term, A.IRI):
            return cls(lex=F.lit(term.value), key=F.lit(term.value))
        if isinstance(term, A.BNode):
            v = "_:" + term.label
            return cls(lex=F.lit(v), key=F.lit(v))
        if isinstance(term, A.Literal):
            num = ts = None
            if term.dt in NUMERIC_DTS:
                # same per-datatype lexical validation as STRDT — an
                # invalid lexical ("1e5"^^xsd:integer) has NO numeric
                # value (r8 ADVICE fix)
                v = valid_num_lex(term.dt, term.lex)
                num = F.lit(v) if v is not None else None
            if term.dt == XSD_DATETIME:
                # parse driver-side: an invalid constant must mean NO
                # temporal value, not an ANSI constant-folding crash (r9)
                import datetime as _dt
                try:
                    pyts = _dt.datetime.fromisoformat(term.lex)
                except ValueError:
                    pyts = None
                ts = (F.lit(pyts).cast("timestamp")
                      if pyts is not None else None)
            if term.dt == XSD_DATE:
                # value shadow at midnight: xsd:date joins the temporal
                # value space (GraphDB's literal index does the same;
                # date ordering/comparison is the common extension —
                # the strict §17.3 table only mandates dateTime) (r8);
                # shared tz-strip convention (r8 ADVICE: [:10] broke
                # >4-digit years; fromisoformat read tz as a time)
                ts = date_shadow_col(F.lit(term.lex))
            if term.dt == XSD_BOOLEAN:
                # "1"/"0" are valid xsd:boolean lexicals; an invalid one
                # has NO boolean value (falls through every operator)
                if term.lex in ("true", "1"):
                    return cls.from_bool(F.lit(True))
                if term.lex in ("false", "0"):
                    return cls.from_bool(F.lit(False))
                return cls(lex=F.lit(term.lex), dt=F.lit(XSD_BOOLEAN))
            return cls(lex=F.lit(term.lex), dt=F.lit(term.dt or XSD_STRING),
                       lang=F.lit(term.lang) if term.lang else None,
                       num=num, ts=ts)
        raise TypeError(f"not a constant term: {term!r}")

    @classmethod
    def from_bool(cls, col: Column) -> "TCol":
        # NO 0/1 shadow num: the engine-wide invariant is that a non-null
        # num implies a NUMERIC datatype with a valid lexical — operators
        # gate on num nullness alone, which keeps Column trees small
        # (per-level fan-out is what OOMed deeply nested expressions, r7).
        # Boolean ordering falls back to the lex ("false" < "true").
        lex = F.when(col, F.lit("true")).when(~col, F.lit("false"))
        return cls(lex=lex, dt=F.when(col.isNotNull(), F.lit(XSD_BOOLEAN)),
                   boolean=col)

    @classmethod
    def from_num(cls, col: Column, dt: str = XSD_DOUBLE) -> "TCol":
        col = col.cast("double")
        lex = (F.when(F.lit(dt) == XSD_INTEGER, col.cast("long").cast("string"))
                .otherwise(col.cast("string")))
        return cls(lex=F.when(col.isNotNull(), lex),
                   dt=F.when(col.isNotNull(), F.lit(dt)), num=col)

    @classmethod
    def from_str(cls, col: Column) -> "TCol":
        return cls(lex=col, dt=F.when(col.isNotNull(), F.lit(XSD_STRING)))

    @classmethod
    def from_ts(cls, col: Column) -> "TCol":
        lex = F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss")
        return cls(lex=lex, dt=F.when(col.isNotNull(), F.lit(XSD_DATETIME)), ts=col)

    @classmethod
    def iri(cls, col: Column) -> "TCol":
        return cls(lex=col, key=col)

    # -- accessors ----------------------------------------------------

    @property
    def key(self) -> Column:
        # memoized: repeated .key accesses (RDFterm-equal references it 3×
        # per comparison, IN once per item) must share ONE Column tree —
        # rebuilding it per access multiplied nested-expression plan size
        # enough to OOM analysis on adversarial BIND chains (r7)
        if self._key is None:
            self._key = canonical_key_from_parts(self.lex, self.dt,
                                                 self.lang)
        return self._key

    def is_literal(self) -> Column:
        return self.dt.isNotNull()

    def is_iri(self) -> Column:
        return self.dt.isNull() & self.lex.isNotNull() & ~self.lex.startswith("_:")

    def is_bnode(self) -> Column:
        return self.dt.isNull() & self.lex.isNotNull() & self.lex.startswith("_:")

    def ebv(self) -> Column:
        """Effective boolean value; NULL = SPARQL type error."""
        if self._bool is not None:
            return self._bool
        return (
            # "1"/"0" are valid xsd:boolean lexicals too; an INVALID
            # lexical form for a boolean/numeric literal has EBV false,
            # not error (§17.2.2 rule 1 — r7 fuzz fix)
            F.when(self.dt == XSD_BOOLEAN, self.lex.isin("true", "1"))
             # NaN EBV is false (§17.2.2) — Spark's `!=` puts NaN on the
             # TRUE side (NaN equals NaN in Spark SQL), so test explicitly
             .when(self.dt.isin(*NUMERIC_DTS) & self.num.isNotNull(),
                   (self.num != 0.0) & ~F.isnan(self.num))
             .when(self.dt.isin(*NUMERIC_DTS) & self.lex.isNotNull(),
                   F.lit(False))
             .when(self.dt.isin(XSD_STRING, RDF_LANGSTRING), F.length(self.lex) > 0)
             .otherwise(_NB())
        )

    def order_keys(self, ascending: bool = True) -> list[Column]:
        """SPARQL total-order sort keys: term kind, then value within kind."""
        kind = term_kind_rank(self.key, self.lex)
        cols = [kind, self.num, self.ts, self.lex, self.key]
        if ascending:
            return [c.asc_nulls_first() for c in cols]
        return [c.desc_nulls_last() for c in cols]


# ---------------------------------------------------------------- operators


def _dbl_lex(col: Column) -> Column:
    # xsd:double canonical lexical forms for the IEEE specials: Spark's
    # double→string cast yields "Infinity"/"-Infinity", which are NOT
    # valid xsd:double lexicals and would not round-trip (r6, ADVICE).
    # One regexp over ONE cast keeps the Column tree small — deeply
    # nested arithmetic multiplies every reference of the child tree,
    # and a high per-level fan-out OOMs plan construction (r7).
    return F.regexp_replace(col.cast("string"), "^(-?)Infinity$", "$1INF")


def _dec_lex(col: Column) -> Column:
    """xsd:decimal lexical recovered from the double shadow: round at 15
    fractional digits (hides IEEE representation error for operands of
    sane scale), trim trailing zeros, keep one fractional digit. A value
    outside decimal(38,15) falls back to the double lexical."""
    s = F.coalesce(col.try_cast("decimal(38,15)").cast("string"),
                   col.cast("string"))
    s = F.regexp_replace(s, r"(\.\d*?)0+$", r"$1")
    return F.regexp_replace(s, r"\.$", ".0")


def _num_tcol(num: Column, dt: Column) -> TCol:
    """Numeric result family: datatype-appropriate lexical over the double
    shadow column. ``num`` must already be null for type-error rows (the
    engine invariant: non-null num ⟹ numeric datatype, valid lexical)."""
    lex = (F.when(dt == XSD_INTEGER, num.try_cast("long").cast("string"))
           .when(dt == XSD_DECIMAL, _dec_lex(num))
           .otherwise(_dbl_lex(num)))
    return TCol(lex=lex, dt=F.when(lex.isNotNull(), dt), num=num)


def _promoted_dt(l: TCol, r: TCol, div: bool = False) -> Column:
    """§17.3 numeric promotion: any IEEE operand → double; both integer →
    integer (but ``/`` promotes to decimal); otherwise decimal."""
    is_dbl = l.dt.isin(*DBL_DTS) | r.dt.isin(*DBL_DTS)
    is_int = l.dt.isin(*INT_DTS) & r.dt.isin(*INT_DTS)
    out = F.when(is_dbl, F.lit(XSD_DOUBLE))
    if not div:
        out = out.when(is_int, F.lit(XSD_INTEGER))
    return out.otherwise(F.lit(XSD_DECIMAL))


def _num2(l: TCol, r: TCol, f, div: bool = False) -> TCol:
    # operands must be numeric literals with valid lexical forms — the
    # from_bool invariant (booleans/strings/IRIs/errors carry a NULL num)
    # makes f's null propagation the type-error gate (r7 fuzz fix:
    # `false + false` used to evaluate a 0/1 boolean shadow to 0.0e0)
    res = f(l.num, r.num).cast("double")
    return _num_tcol(res, _promoted_dt(l, r, div=div))


def _apply_regex_flags(pat: Column, flags: Column | None) -> Column:
    """Splice XPath regex flags into a Java pattern as an inline group.

    r6 fixes (ADVICE): an EMPTY flags argument used to compile '(?)' and the
    XPath 'q' flag is not a valid Java inline flag — both raised a runtime
    regex exception that killed the whole query. Now: empty flags are a
    no-op; 'q' quotes the pattern (\\Q...\\E, with embedded \\E split the
    way Pattern.quote does); remaining flags (smix) splice only when
    non-empty. Unknown flags still surface as a regex error — matching
    fn:matches, which makes them static errors."""
    if flags is None:
        return pat
    rest = F.regexp_replace(flags, "q", "")
    quoted = F.concat(
        F.lit("\\Q"),
        # Pattern.quote: an embedded \E must close the quote, emit a
        # literal \E, and reopen — otherwise it terminates quoting early
        F.replace(pat, F.lit("\\E"), F.lit("\\E\\\\E\\Q")),
        F.lit("\\E"))
    body = F.when(flags.contains("q"), quoted).otherwise(pat)
    return F.when(F.length(rest) > 0,
                  F.concat(F.lit("(?"), rest, F.lit(")"), body)) \
            .otherwise(body)


def _str_arg(t: TCol) -> Column:
    """First-argument constraint of the unary string functions
    (§17.4.3: string literal = simple / xsd:string / langString) — an
    IRI or bnode argument is a type error (r6c probe fix)."""
    return F.when(t.dt.isin(XSD_STRING, RDF_LANGSTRING), t.lex)


def _argcompat(l: TCol, r: TCol) -> Column:
    """§17.4.3.1.1 argument compatibility for two-arg string functions
    (CONTAINS/STRSTARTS/STRENDS/STRBEFORE/STRAFTER): both simple/xsd:string,
    or arg1 lang-tagged with arg2 simple/xsd:string, or both lang-tagged
    with the SAME tag. Anything else — including a lang tag only on arg2 —
    is a type error (r6c probe fix)."""
    return (l.dt.isin(XSD_STRING, RDF_LANGSTRING)
            & ((r.dt == XSD_STRING)
               | ((r.dt == RDF_LANGSTRING) & l.lang.eqNullSafe(r.lang))))


def _strlit(col: Column, lang: Column) -> TCol:
    """String-literal result carrying a (possibly null) language tag —
    the §17.4.3 rule: UCASE/LCASE/SUBSTR/REPLACE/STRBEFORE/STRAFTER
    results keep the first argument's language; CONCAT keeps a tag all
    arguments share."""
    lang = F.when(col.isNotNull(), lang)
    dt = F.when(col.isNotNull(),
                F.when(lang.isNotNull(), F.lit(RDF_LANGSTRING))
                .otherwise(F.lit(XSD_STRING)))
    return TCol(lex=col, dt=dt, lang=lang)


def _cmp(l: TCol, r: TCol, op: str) -> Column:
    import operator
    ops = {"=": operator.eq, "!=": operator.ne, "<": operator.lt,
           "<=": operator.le, ">": operator.gt, ">=": operator.ge}
    f = ops[op]
    # op:numeric-* applies to numeric literals only — booleans carry NO
    # 0/1 shadow num (from_bool invariant), so `true = 1` is never
    # numerically comparable (r7 fuzz fix)
    both_num = l.num.isNotNull() & r.num.isNotNull()
    both_ts = l.ts.isNotNull() & r.ts.isNotNull()
    # the §17.3 operator table defines `<` only for xsd:string / simple
    # literals — an ORDER comparison of lang-tagged literals is a type
    # error (r7 fuzz fix; `=`/`!=` handle same-tag pairs separately below)
    both_str = (l.dt == XSD_STRING) & (r.dt == XSD_STRING)
    # op:boolean-* works on the VALUE space (valid lexicals true/false/1/0)
    # — VALUES-sourced booleans carry no num shadow, so compare lexically
    # (r7 fuzz fix: `?b <= ?b` on a bound boolean used to error)
    lb = F.when(l.lex.isin("true", "1"), F.lit(True)) \
          .when(l.lex.isin("false", "0"), F.lit(False))
    rb = F.when(r.lex.isin("true", "1"), F.lit(True)) \
          .when(r.lex.isin("false", "0"), F.lit(False))
    both_bool = ((l.dt == XSD_BOOLEAN) & (r.dt == XSD_BOOLEAN)
                 & lb.isNotNull() & rb.isNotNull())
    # op:numeric-* with a NaN operand: every comparison is FALSE except
    # != which is TRUE (XPath) — Spark SQL instead treats NaN = NaN as
    # true and sorts NaN above everything (review fix)
    any_nan = F.isnan(F.coalesce(l.num, F.lit(0.0))) \
        | F.isnan(F.coalesce(r.num, F.lit(0.0)))
    if op in ("=", "!="):
        # §17.4.1.7 RDFterm-equal (r6c probe fix): when no operator-table
        # comparison applies, identical terms are equal, a non-literal on
        # either side makes distinct terms UNEQUAL, but two DISTINCT
        # literals outside the comparable value spaces (unknown datatypes,
        # langString pairs, string-vs-number) are a TYPE ERROR — not false
        # for '=' and not true for '!='.
        both_lang = ((l.dt == RDF_LANGSTRING) & (r.dt == RDF_LANGSTRING)
                     & F.lower(l.lang).eqNullSafe(F.lower(r.lang)))
        comparable = both_num | both_ts | both_str | both_lang
        return (F.when(both_num & any_nan, F.lit(op == "!="))
                 .when(both_num, f(l.num, r.num))
                 .when(both_ts, f(l.ts, r.ts))
                 .when(both_bool, f(lb, rb))
                 .when(comparable, f(l.lex, r.lex))
                 .when(l.key == r.key, F.lit(op == "="))
                 .when(l.key.isNotNull() & r.key.isNotNull()
                       & (l.dt.isNull() | r.dt.isNull()),
                       F.lit(op == "!="))
                 .otherwise(_NB()))
    return (F.when(both_num & any_nan, F.lit(False))
             .when(both_num, f(l.num, r.num))
             .when(both_ts, f(l.ts, r.ts))
             .when(both_str, f(l.lex, r.lex))
             .when(both_bool, f(lb, rb))
             .otherwise(_NB()))


def binary(op: str, l: TCol, r: TCol) -> TCol:
    if op == "||":
        return TCol.from_bool(l.ebv() | r.ebv())
    if op == "&&":
        return TCol.from_bool(l.ebv() & r.ebv())
    if op in ("=", "!=", "<", "<=", ">", ">="):
        return TCol.from_bool(_cmp(l, r, op))
    if op == "+":
        return _num2(l, r, lambda a, b: a + b)
    if op == "-":
        return _num2(l, r, lambda a, b: a - b)
    if op == "*":
        return _num2(l, r, lambda a, b: a * b)
    if op == "/":
        # SPARQL op:numeric-divide: division by zero is a TYPE ERROR
        # (-> unbound/null) for integer/decimal operands, but IEEE
        # +-Inf/NaN when either operand is double/float (result sign
        # honors a negative-zero divisor). The b != 0 guard keeps ANSI
        # mode from raising DIVIDE_BY_ZERO and killing the whole query
        # (CaseWhen branches evaluate lazily). Integer ÷ integer promotes
        # to DECIMAL per §17.3 (r7 fuzz fix: used to force double).
        ieee = l.dt.isin(*DBL_DTS) | r.dt.isin(*DBL_DTS)

        def div(a, b):
            # −0.0 == 0.0 numerically; its string form keeps the sign
            b_neg = b.cast("string").startswith("-")
            mag = (F.when(a > 0, F.lit(float("inf")))
                   .when(a < 0, F.lit(float("-inf")))
                   .otherwise(F.lit(float("nan"))))
            inf = F.when(b_neg, -mag).otherwise(mag)
            # the IEEE branch fires only for an ACTUAL zero divisor with a
            # bound numerator — a type-errored operand (null num) must
            # stay an error (r7 fuzz fix: `1e0 / <iri>` leaked INF)
            return (F.when(b != 0, a / b)
                    .otherwise(F.when(ieee & (b == 0) & a.isNotNull(),
                                      inf)))

        return _num2(l, r, div, div=True)
    raise ValueError(f"unknown binary op {op}")


def unary(op: str, x: TCol) -> TCol:
    if op == "!":
        return TCol.from_bool(~x.ebv())
    if op in ("-", "+"):
        # op:numeric-unary-minus/-plus: numeric literals only (an IRI,
        # boolean or string operand is a type error — r7 fuzz fix: unary
        # minus used to negate a boolean's 0/1 shadow and unary plus was
        # dropped by the parser, passing ANY term through); the numeric
        # datatype is preserved, incl. decimal (used to collapse to
        # double). The from_bool invariant makes num-null the type gate.
        col = -x.num if op == "-" else x.num
        dt = (F.when(x.dt.isin(*INT_DTS), F.lit(XSD_INTEGER))
              .when(x.dt == XSD_DECIMAL, F.lit(XSD_DECIMAL))
              .otherwise(F.lit(XSD_DOUBLE)))
        return _num_tcol(col, dt)
    return x


# ---------------------------------------------------------------- builtins


def _iri_localname_encode(c: Column) -> Column:
    # ENCODE_FOR_URI: percent-encode (url_encode does form-encoding: '+' for space)
    return F.regexp_replace(F.url_encode(c), r"\+", "%20")


def builtin(name: str, args: list[TCol], base: str | None = None) -> TCol:
    n = name.upper()
    a = args

    if n == "STR":
        # §17.4.2.5: STR takes a literal or an IRI — a blank node is a
        # type error (r6c probe fix)
        return TCol.from_str(F.when(~a[0].is_bnode(), a[0].lex))
    if n == "LANG":
        return TCol.from_str(F.coalesce(a[0].lang, F.when(a[0].is_literal(), F.lit(""))))
    if n == "DATATYPE":
        return TCol.iri(a[0].dt)
    if n in ("IRI", "URI"):
        # §17.4.2.6: IRI() takes a simple literal / xsd:string or an IRI
        # (passed through) — a numeric/boolean/typed literal or bnode is a
        # type error (r7 fuzz fix: IRI(-0.5) used to mint an IRI "-0.5")
        a = [TCol(lex=F.when(a[0].is_iri() | (a[0].dt == XSD_STRING),
                             a[0].lex),
                  key=F.when(a[0].is_iri() | (a[0].dt == XSD_STRING),
                             a[0].key))] + a[1:]
        if base:
            # RFC 3986-style resolution against the query BASE (r6; the
            # review caught the naive-concat cut mangling non-slash bases,
            # /abs-path, //net-path and #fragment refs). The BASE is a
            # Python constant, so its components split at build time and
            # only the reference is dispatched in Column logic.
            import re as _re
            m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*):(//[^/?#]*)?(.*)$",
                          base)
            scheme, auth, rest = m.group(1), m.group(2) or "", m.group(3)
            root = scheme + ":" + auth
            # dir comes from the base PATH (query/fragment stripped — r7
            # advisor fix; '?x' refs used to resolve path-relative)
            path_only = rest.split("#")[0].split("?")[0]
            dir_path = (path_only[:path_only.rfind("/") + 1]
                        if "/" in path_only else ("/" if auth else ""))
            ref = a[0].lex

            def _dedot(merged):
                # RFC 3986 §5.2.4 remove_dot_segments, column-space (same
                # contract as sources/jsonld.py _resolve_ref). merged always
                # starts with '/' here, so the join keeps the leading ''.
                segs = F.aggregate(
                    F.split(merged, "/"),
                    F.array().cast("array<string>"),
                    lambda acc, seg: (
                        F.when(seg == F.lit(".."),
                               F.when(F.size(acc) <= 1,
                                      F.array().cast("array<string>"))
                               .otherwise(F.slice(acc, 1, F.size(acc) - 1)))
                        .when(seg == F.lit("."), acc)
                        .otherwise(F.concat(acc, F.array(seg)))))
                out = F.concat_ws("/", segs)
                out = F.when(out.startswith("/"), out) \
                    .otherwise(F.concat(F.lit("/"), out))
                return F.when(merged.rlike(r"/\.\.?$") & ~out.endswith("/"),
                              F.concat(out, F.lit("/"))).otherwise(out)

            if auth or dir_path.startswith("/"):
                slash_out = F.concat(F.lit(root), _dedot(ref))
                rel_out = F.concat(F.lit(root),
                                   _dedot(F.concat(F.lit(dir_path), ref)))
            else:   # opaque base (urn:...): plain concat, nothing to dedot
                slash_out = F.concat(F.lit(root), ref)
                rel_out = F.concat(F.lit(root + dir_path), ref)
            lex = (F.when(ref.rlike("^[A-Za-z][A-Za-z0-9+.-]*:"), ref)
                   .when(ref.startswith("//"),
                         F.concat(F.lit(scheme + ":"), ref))
                   .when(ref == F.lit(""), F.lit(base.split("#")[0]))
                   .when(ref.startswith("#"),
                         F.concat(F.lit(base.split("#")[0]), ref))
                   .when(ref.startswith("?"),
                         F.concat(F.lit(root + path_only), ref))
                   .when(ref.startswith("/"), slash_out)
                   .otherwise(rel_out))
            return TCol.iri(lex)
        return TCol.iri(a[0].lex)
    if n == "BNODE":
        # §17.4.2.9: BNODE(str) returns the SAME blank node for the same
        # argument within one solution mapping (distinct across solutions);
        # BNODE() is fresh per call. Both hash the per-row salt column the
        # translator materializes (one uuid() evaluated once per row —
        # hashing it keeps key == lex, which two separate uuid() exprs
        # cannot guarantee), plus a per-call-site nonce for the no-arg form.
        global _BNODE_SITE
        _BNODE_SITE += 1
        salt = F.col(BNODE_SALT)
        if a:
            # §17.4.2.9: the argument must be a simple literal /
            # xsd:string; an errored or non-string argument is a type
            # error, NOT a fresh node (review fix: concat_ws skipped the
            # NULL and minted a bnode from the salt alone)
            ok = a[0].dt == XSD_STRING
            lex = F.when(ok, F.concat(
                F.lit("_:bl"),
                F.md5(F.concat_ws("|", salt, a[0].lex))))
        else:
            lex = F.concat(F.lit("_:b"),
                           F.md5(F.concat_ws("|", salt,
                                             F.lit(str(_BNODE_SITE)))))
        return TCol(lex=lex, key=lex)
    if n == "BOUND":
        return TCol.from_bool(a[0].key.isNotNull())
    if n == "RAND":
        return TCol.from_num(F.rand())
    if n in ("ABS", "CEIL", "FLOOR", "ROUND"):
        # fn:numeric-abs/-ceil/-floor/-round: numeric literals only, and
        # the result PRESERVES the argument's numeric type (ceil of a
        # decimal is a decimal, round of an integer an integer — r7 fuzz
        # fix: used to force xsd:integer / bare double). fn:round ties
        # round toward POSITIVE infinity (round(-2.5) = -2), which
        # HALF_UP F.round gets wrong for negative halves — floor(x + 0.5)
        # is the exact rule. NaN/±INF/huge values pass through untouched
        # (F.floor silently clamps them to Long.MAX / 0 — r7 fuzz fix).
        x = a[0]
        v = x.num
        whole = F.isnan(v) | (F.abs(v) >= F.lit(2.0 ** 62))
        if n == "ABS":
            res = F.abs(v)
        elif n == "CEIL":
            res = F.when(whole, v).otherwise(F.ceil(v).cast("double"))
        elif n == "FLOOR":
            res = F.when(whole, v).otherwise(F.floor(v).cast("double"))
        else:
            res = F.when(whole, v).otherwise(
                F.floor(v + F.lit(0.5)).cast("double"))
        dt = (F.when(x.dt.isin(*INT_DTS), F.lit(XSD_INTEGER))
              .when(x.dt == XSD_DECIMAL, F.lit(XSD_DECIMAL))
              .otherwise(F.lit(XSD_DOUBLE)))
        return _num_tcol(res, dt)
    if n == "CONCAT":
        # every argument must be a string literal (§17.4.3.12 — an IRI,
        # boolean, numeric or unknown-datatype argument is a type error;
        # r7 fuzz fix: args used to concatenate by bare lexical form)
        if not a:
            return TCol.from_str(F.lit(""))
        lang = a[0].lang
        for x in a[1:]:
            lang = F.when(lang.eqNullSafe(x.lang), lang)
        return _strlit(F.concat(*[_str_arg(x) for x in a]), lang)
    if n == "STRLEN":
        return TCol.from_num(F.length(_str_arg(a[0])).cast("double"),
                             XSD_INTEGER)
    if n == "UCASE":
        return _strlit(F.upper(_str_arg(a[0])), a[0].lang)
    if n == "LCASE":
        return _strlit(F.lower(_str_arg(a[0])), a[0].lang)
    if n == "ENCODE_FOR_URI":
        return TCol.from_str(_iri_localname_encode(_str_arg(a[0])))
    if n == "CONTAINS":
        return TCol.from_bool(F.when(_argcompat(a[0], a[1]),
                                     a[0].lex.contains(a[1].lex)))
    if n == "STRSTARTS":
        return TCol.from_bool(F.when(_argcompat(a[0], a[1]),
                                     a[0].lex.startswith(a[1].lex)))
    if n == "STRENDS":
        return TCol.from_bool(F.when(_argcompat(a[0], a[1]),
                                     a[0].lex.endswith(a[1].lex)))
    if n == "STRBEFORE":
        pos = F.position(a[1].lex, a[0].lex)
        ok = _argcompat(a[0], a[1])
        return _strlit(F.when(ok & (pos > 0),
                              F.substring(a[0].lex, F.lit(1), pos - 1))
                       .when(ok, F.lit("")),
                       F.when(pos > 0, a[0].lang))
    if n == "STRAFTER":
        pos = F.position(a[1].lex, a[0].lex)
        ok = _argcompat(a[0], a[1])
        return _strlit(
            F.when(ok & (pos > 0),
                   a[0].lex.substr(pos + F.length(a[1].lex), F.length(a[0].lex)))
            .when(ok, F.lit("")),
            F.when(pos > 0, a[0].lang))
    if n == "SUBSTR":
        # fn:substring index math: chars at 1-based positions p with
        # round(start) <= p < round(start)+round(len) — a start below 1
        # CONSUMES length (SUBSTR("12345", 0, 3) = "12", not "123"), and
        # negative starts do NOT count from the end. Rounding is fn:round
        # (ties toward +infinity) = floor(x + 0.5), NOT F.round's HALF_UP:
        # SUBSTR("12345", -0.5, 3) must yield "12" (r6, ADVICE). The source
        # must be a string literal and start/length numeric literals — a
        # dateTime/IRI/boolean source or boolean index is a type error
        # (r7 fuzz fix). A NaN start/length yields the empty string
        # (fn:substring on the empty position range), not an error.
        src = _str_arg(a[0])
        s_num = a[1].num
        start = F.when(~F.isnan(s_num),
                       F.floor(s_num + F.lit(0.5))).try_cast("int")
        empty = F.isnan(s_num)
        # F.greatest IGNORES nulls — a non-numeric start (null num) must
        # stay an error, not default to position 1 (r7 fuzz fix)
        lo = F.when(s_num.isNotNull(), F.greatest(start, F.lit(1)))
        if len(a) > 2:
            l_num = a[2].num
            empty = empty | F.isnan(l_num)
            cnt = F.when(l_num.isNotNull(), F.greatest(
                start + F.floor(F.when(~F.isnan(l_num), l_num)
                                + F.lit(0.5)).try_cast("int") - lo,
                F.lit(0)))
        else:
            cnt = F.length(src)
        out = F.when(empty & src.isNotNull(), F.lit("")) \
               .otherwise(src.substr(lo, cnt))
        return _strlit(out, a[0].lang)
    if n == "REPLACE":
        pat = _apply_regex_flags(a[1].lex, a[3].lex if len(a) > 3 else None)
        repl = a[2].lex
        if len(a) > 3:
            # fn:replace: under 'q' the replacement is literal too — quote
            # Java's $group refs and backslashes (Matcher.quoteReplacement)
            lit_repl = F.replace(
                F.replace(a[2].lex, F.lit("\\"), F.lit("\\\\")),
                F.lit("$"), F.lit("\\$"))
            repl = (F.when(a[3].lex.contains("q"), lit_repl)
                    .otherwise(a[2].lex))
        return _strlit(F.regexp_replace(_str_arg(a[0]), pat, repl),
                       a[0].lang)
    if n == "REGEX":
        pat = _apply_regex_flags(a[1].lex, a[2].lex if len(a) > 2 else None)
        return TCol.from_bool(F.regexp_like(_str_arg(a[0]), pat))
    if n == "LANGMATCHES":
        tag, rng = F.lower(a[0].lex), F.lower(a[1].lex)
        return TCol.from_bool(
            F.when(rng == "*", F.length(tag) > 0)
             .otherwise((tag == rng) | tag.startswith(F.concat(rng, F.lit("-")))))
    if n in ("YEAR", "MONTH", "DAY", "HOURS", "MINUTES"):
        # §17.4.5: the accessors read the literal's OWN timezone fields —
        # the ts shadow is normalized (HOURS("…T14:45:13-05:00") must be
        # 14, not the UTC 19 — r8 W3C-conformance fix), so extract from
        # the lexical form and fall back to the shadow only for computed
        # timestamps (NOW()) that carry no dateTime lexical
        pat = {"YEAR": r"^(-?\d{4,})-",
               "MONTH": r"^-?\d{4,}-(\d{2})-",
               # digit-boundary, not 'T': DAY works for xsd:date too (r8)
               "DAY": r"^-?\d{4,}-\d{2}-(\d{2})(?![0-9])",
               "HOURS": r"T(\d{2}):",
               "MINUTES": r"T\d{2}:(\d{2}):"}[n]
        fb = {"YEAR": F.year, "MONTH": F.month, "DAY": F.dayofmonth,
              "HOURS": F.hour, "MINUTES": F.minute}[n]
        lexv = F.regexp_extract(a[0].lex, pat, 1)
        # the shadow fallback serves computed timestamps (NOW()) — gate
        # it on a dateTime datatype so HOURS/MINUTES of an xsd:date stay
        # a type error instead of reading midnight (r8)
        fallback = F.when(a[0].dt == XSD_DATETIME,
                          fb(a[0].ts).cast("double")) \
            if n in ("HOURS", "MINUTES") else fb(a[0].ts).cast("double")
        val = F.when(a[0].ts.isNotNull(),
                     F.when(F.length(lexv) > 0, lexv.cast("double"))
                      .otherwise(fallback))
        return TCol.from_num(val, XSD_INTEGER)
    if n == "SECONDS":
        # fn:seconds-from-dateTime returns xsd:decimal INCLUDING the
        # fractional part — read it from the original lexical form (the
        # ts shadow column truncates to whole timestamps); fall back to
        # second(ts) for computed timestamps with no dateTime lexical
        # (r6c probe fix)
        sec_lex = F.regexp_extract(a[0].lex,
                                   r"T\d{2}:\d{2}:(\d{2}(?:\.\d+)?)", 1)
        val = (F.when(F.length(sec_lex) > 0, sec_lex.cast("double"))
               .otherwise(F.second(a[0].ts).cast("double")))
        # keep the EXACT extracted lexical (zero-padding canonicalized) —
        # routing through a double cast serialized 5 as '5.0' and could
        # round long fractional parts (r7 advisor fix)
        lex = (F.when(F.length(sec_lex) > 0,
                      F.regexp_replace(sec_lex, r"^0(\d)", r"$1"))
               .otherwise(F.second(a[0].ts).cast("long").cast("string")))
        # an xsd:date has a ts shadow (midnight) but NO seconds field —
        # type error unless the lexical carries a time or the term is a
        # computed dateTime (r8)
        ok = a[0].ts.isNotNull() & ((F.length(sec_lex) > 0)
                                    | (a[0].dt == XSD_DATETIME))
        return TCol(lex=F.when(ok, lex), dt=F.when(ok, F.lit(XSD_DECIMAL)),
                    num=F.when(ok, val))
    if n == "TZ":
        # simple literal: "Z", "+02:00", or "" when the literal carries
        # no timezone (r6c probe fix: used to always return "")
        tz = F.regexp_extract(a[0].lex, r"(Z|[+-]\d{2}:\d{2})$", 1)
        return TCol.from_str(F.when(a[0].ts.isNotNull(), tz))
    if n == "TIMEZONE":
        # xsd:dayTimeDuration ("PT0S" for Z, "-PT5H"/"PT2H30M" for
        # offsets); a literal WITHOUT a timezone — or any non-dateTime
        # term (review fix) — is a type error (r6c probe fix: used to
        # return "")
        tz = F.when(a[0].ts.isNotNull(),
                    F.regexp_extract(a[0].lex, r"(Z|[+-]\d{2}:\d{2})$", 1))
        hh = F.regexp_extract(tz, r"[+-](\d{2}):", 1).cast("int")
        mm = F.regexp_extract(tz, r":(\d{2})$", 1).cast("int")
        sign = F.when(tz.startswith("-") & ((hh > 0) | (mm > 0)),
                      F.lit("-")).otherwise(F.lit(""))
        body = (F.when((hh > 0) & (mm > 0),
                       F.concat(hh.cast("string"), F.lit("H"),
                                mm.cast("string"), F.lit("M")))
                .when(hh > 0, F.concat(hh.cast("string"), F.lit("H")))
                .when(mm > 0, F.concat(mm.cast("string"), F.lit("M")))
                .otherwise(F.lit("0S")))
        dur = (F.when(tz == "Z", F.lit("PT0S"))
               .when(F.length(tz) > 0,
                     F.concat(sign, F.lit("PT"), body)))
        return TCol(lex=dur,
                    dt=F.when(dur.isNotNull(),
                              F.lit(XSD + "dayTimeDuration")))
    if n == "NOW":
        return TCol.from_ts(F.current_timestamp())
    if n == "UUID":
        return TCol.iri(F.concat(F.lit("urn:uuid:"), F.expr("uuid()")))
    if n == "STRUUID":
        return TCol.from_str(F.expr("uuid()"))
    if n in ("MD5", "SHA1", "SHA256", "SHA384", "SHA512"):
        # the hash family takes a simple literal / xsd:string — a language
        # tag (or non-string datatype) is a type error (r6c probe fix)
        arg = F.when(a[0].dt == XSD_STRING, a[0].lex)
        if n == "MD5":
            return TCol.from_str(F.md5(arg))
        if n == "SHA1":
            return TCol.from_str(F.sha1(arg))
        return TCol.from_str(F.sha2(arg, int(n[3:])))
    if n == "COALESCE":
        out = a[0]
        for nxt in a[1:]:
            cond = out.key.isNotNull()
            out = TCol(lex=F.when(cond, out.lex).otherwise(nxt.lex),
                       dt=F.when(cond, out.dt).otherwise(nxt.dt),
                       lang=F.when(cond, out.lang).otherwise(nxt.lang),
                       num=F.when(cond, out.num).otherwise(nxt.num),
                       ts=F.when(cond, out.ts).otherwise(nxt.ts))
        return out
    if n == "IF":
        # §17.4.1.2: an ERROR in the condition propagates (the old
        # .otherwise() chain silently took the else-branch on a null
        # EBV — r6c probe fix): when/when leaves NULL rows NULL
        c = a[0].ebv()
        t, e = a[1], a[2]
        return TCol(lex=F.when(c, t.lex).when(~c, e.lex),
                    dt=F.when(c, t.dt).when(~c, e.dt),
                    lang=F.when(c, t.lang).when(~c, e.lang),
                    num=F.when(c, t.num).when(~c, e.num),
                    ts=F.when(c, t.ts).when(~c, e.ts))
    if n == "STRLANG":
        # both args must be simple literals / xsd:string — STRLANG on an
        # already-tagged or typed literal is a type error (r6c probe fix)
        ok = (a[0].dt == XSD_STRING) & (a[1].dt == XSD_STRING)
        return TCol(lex=F.when(ok, a[0].lex),
                    dt=F.when(ok, F.lit(RDF_LANGSTRING)),
                    lang=F.when(ok, F.lower(a[1].lex)))
    if n == "STRDT":
        ok = a[0].dt == XSD_STRING
        dt = F.when(ok, a[1].lex)
        # the numeric shadow is set only for a lexical VALID for the
        # target type (r7 fuzz fix: STRDT("2.5", xsd:integer) used to get
        # num 2.5, joining the numeric value space with an invalid form)
        num = (F.when(dt.isin(*INT_DTS)
                      & a[0].lex.rlike(r"^[+-]?[0-9]+$"),
                      a[0].lex.try_cast("double"))
               .when((dt == XSD_DECIMAL)
                     & a[0].lex.rlike(
                         r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$"),
                     a[0].lex.try_cast("double"))
               .when(dt.isin(*DBL_DTS),
                     F.when(a[0].lex == "INF", F.lit(float("inf")))
                      .when(a[0].lex == "-INF", F.lit(float("-inf")))
                      .when(a[0].lex == "NaN", F.lit(float("nan")))
                      .when(a[0].lex.rlike(
                          r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)"
                          r"([eE][+-]?[0-9]+)?$"),
                          a[0].lex.try_cast("double"))))
        return TCol(lex=F.when(ok, a[0].lex), dt=dt, num=num,
                    ts=F.when(dt == XSD_DATETIME,
                              datetime_shadow_col(a[0].lex)))
    if n == "SAMETERM":
        return TCol.from_bool(a[0].key == a[1].key)
    # the term testers propagate an errored/unbound argument as a type
    # error — isIRI(1/0) is an error, not false (r7 fuzz fix: IF/COALESCE
    # could observe a spurious `false`)
    if n in ("ISIRI", "ISURI"):
        return TCol.from_bool(F.when(a[0].key.isNotNull(), a[0].is_iri()))
    if n == "ISBLANK":
        return TCol.from_bool(F.when(a[0].key.isNotNull(), a[0].is_bnode()))
    if n == "ISLITERAL":
        return TCol.from_bool(F.when(a[0].key.isNotNull(), a[0].is_literal()))
    if n == "ISNUMERIC":
        return TCol.from_bool(F.when(
            a[0].key.isNotNull(),
            a[0].num.isNotNull() & a[0].dt.isin(*NUMERIC_DTS)))

    # casts: full XSD constructor IRIs. XPath §19 casting rules (r7 fuzz
    # fixes): the SOURCE of a string-lexical cast must itself be a
    # simple/xsd:string literal with a lexical form valid for the TARGET
    # type (xsd:integer("2.5") is an error, not 2); booleans cast by
    # value, not via their 0/1 shadow; NaN/±INF don't cast to the exact
    # types; "INF"/"-INF"/"NaN" are the only special double lexicals
    # (Spark's try_cast also accepts "Infinity", which XPath rejects).
    # try_cast: a malformed lexical form is an ERROR (→ unbound), never a
    # runtime failure (ANSI cast would throw).
    if n.startswith(XSD.upper()) or name.startswith(XSD):
        local = name[len(XSD):].lower()
        x = a[0]
        is_num = x.dt.isin(*NUMERIC_DTS)
        bool01 = F.when(x.lex.isin("true", "1"), F.lit(1.0)) \
                  .when(x.lex.isin("false", "0"), F.lit(0.0))
        finite = ~F.isnan(x.num) & (F.abs(x.num) != F.lit(float("inf")))
        if local in ("integer", "long", "int"):
            v = (F.when(is_num & finite, x.num)
                 .when(x.dt == XSD_BOOLEAN, bool01)
                 .when((x.dt == XSD_STRING)
                       & x.lex.rlike(r"^[+-]?[0-9]+$"),
                       x.lex.try_cast("double")))
            return _num_tcol(v.try_cast("long").cast("double"),
                             F.lit(XSD_INTEGER))
        if local == "decimal":
            v = (F.when(is_num & finite, x.num)
                 .when(x.dt == XSD_BOOLEAN, bool01)
                 .when((x.dt == XSD_STRING)
                       & x.lex.rlike(r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$"),
                       x.lex.try_cast("double")))
            return _num_tcol(v, F.lit(XSD_DECIMAL))
        if local in ("double", "float"):
            v = (F.when(is_num, x.num)
                 .when(x.dt == XSD_BOOLEAN, bool01)
                 .when(x.dt == XSD_STRING,
                       F.when(x.lex == "INF", F.lit(float("inf")))
                        .when(x.lex == "-INF", F.lit(float("-inf")))
                        .when(x.lex == "NaN", F.lit(float("nan")))
                        .when(x.lex.rlike(
                            r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)"
                            r"([eE][+-]?[0-9]+)?$"),
                            x.lex.try_cast("double"))))
            return _num_tcol(v, F.lit(XSD_DOUBLE))
        if local == "string":
            # literals and IRIs stringify; a bnode is a type error
            return TCol.from_str(F.when(~x.is_bnode(), x.lex))
        if local == "boolean":
            return TCol.from_bool(
                F.when(x.dt == XSD_BOOLEAN, x.lex.isin("true", "1"))
                 .when(is_num & x.num.isNotNull(),
                       (x.num != 0) & ~F.isnan(x.num))
                 .when((x.dt == XSD_STRING) & x.lex.isin("true", "1"),
                       F.lit(True))
                 .when((x.dt == XSD_STRING) & x.lex.isin("false", "0"),
                       F.lit(False)))
        if local == "datetime":
            # try-semantics: an invalid lexical is a per-row type error
            # (unbound), never a job-killing ANSI cast exception (r9)
            return TCol.from_ts(F.coalesce(
                x.ts, datetime_shadow_col(x.lex)))
        if local == "date":
            # to_date alone rejects the tz-suffixed forms of the xsd:date
            # lexical space ("2002-10-10+13:00"); admit exactly those via
            # the shared local-midnight convention (model.date_shadow_col)
            d = F.coalesce(
                x.ts.cast("date"), x.lex.try_cast("date"),
                F.when(x.lex.rlike(r"^-?\d{4,}-\d{2}-\d{2}"
                                   r"(Z|[+-]\d{2}:\d{2})$"),
                       date_shadow_col(x.lex).cast("date")))
            return TCol(lex=F.date_format(d, "yyyy-MM-dd"),
                        dt=F.when(d.isNotNull(), F.lit(XSD + "date")),
                        ts=d.cast("timestamp"))
    raise ValueError(f"unsupported function {name}")
