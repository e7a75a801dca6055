"""Randomized SPARQL expression differential sweep (r7).

Random expression trees over the full §17 operator surface — arithmetic,
comparisons (operator table + RDFterm-equal extension), logical 3VL,
EBV, IN/NOT IN, the string/term/conditional builtins and XSD constructor
casts — evaluated by the engine via ``BIND`` over a VALUES-bound term
pool (IRIs, typed/lang/unknown-datatype literals, UNDEF) and compared
against an independent pure-Python reference implementing the spec
semantics directly:

* numeric promotion ladder (§17.3 / XPath op:numeric-*): integer →
  decimal → double, with ``/`` promoting integer operands to decimal and
  division-by-zero a type error off the IEEE types;
* RDFterm-equal (§17.4.1.7): value comparison where the operator table
  applies, identical-term equality, distinct-literal TYPE ERROR outside
  the comparable value spaces, FALSE only when a non-literal is involved;
* 3VL ``&&``/``||``/``!`` with error propagation, EBV per §17.2.2
  (including FALSE for invalid numeric lexical forms);
* argument-type constraints of the builtins (string literals for the
  string family, §17.4.3.1.1 compatibility, numeric-only ABS family);
* XPath casting rules for the xsd:* constructors.

Errors map to an unbound BIND result on the engine side. Numeric results
compare by (tier, value) — integers exactly, decimals to 1e-6 relative
(decimal division precision is implementation-defined), doubles IEEE.
The companion spec sweeps (tests/test_round2_fixes.py etc.) pin
hand-written cases; this sweep covers the combinatorial surface.
"""

from __future__ import annotations

import math
import random
from fractions import Fraction

import pytest

from graphdb_free_mocha_sa_spark.model import (
    RDF_LANGSTRING,
    XSD_BOOLEAN,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
)

XSD = "http://www.w3.org/2001/XMLSchema#"
ERROR = ("«type-error»",)
UNDEF = None

# ---------------------------------------------------------------- term pool
# Reference terms: ('iri', v) | ('lit', lex_or_value, dt, lang).
# For literals drawn from the pool, position 1 is the exact lexical form;
# computed numeric results carry the Python value (int/Fraction/float).

def lit(lex, dt=XSD_STRING, lang=None):
    return ("lit", lex, RDF_LANGSTRING if lang else dt, lang)


POOL = [
    UNDEF,
    ("iri", "urn:x:a"),
    ("iri", "urn:x:b"),
    lit("5", XSD_INTEGER), lit("-3", XSD_INTEGER), lit("0", XSD_INTEGER),
    lit("2.5", XSD_DECIMAL), lit("-0.5", XSD_DECIMAL), lit("5.0", XSD_DECIMAL),
    lit("1.5e0", XSD_DOUBLE), lit("0.0e0", XSD_DOUBLE), lit("-2.5e0", XSD_DOUBLE),
    lit("abc"), lit(""), lit("Abc dEf"), lit("bc"), lit("5"),
    lit("chat", lang="en"), lit("chat", lang="fr"), lit("CHAT", lang="en"),
    lit("true", XSD_BOOLEAN), lit("false", XSD_BOOLEAN),
    lit("2024-03-01T10:00:00", XSD_DATETIME),
    lit("2023-12-31T23:59:59", XSD_DATETIME),
    lit("xy", "urn:dt:unknown"),
]


def term_sparql(t) -> str:
    if t is UNDEF:
        return "UNDEF"
    if t[0] == "iri":
        return f"<{t[1]}>"
    _, lex, dt, lang = t
    if lang:
        return f'"{lex}"@{lang}'
    if dt == XSD_STRING:
        return f'"{lex}"'
    if dt == XSD_INTEGER:
        return lex
    if dt == XSD_DECIMAL:
        return lex
    if dt == XSD_DOUBLE:
        return lex
    return f'"{lex}"^^<{dt}>'


# ------------------------------------------------------------- value model

NUM_TIER = {XSD_INTEGER: 0, XSD + "long": 0, XSD + "int": 0,
            XSD_DECIMAL: 1, XSD_DOUBLE: 2, XSD + "float": 2}


def numv(t):
    """(tier, value) for a numeric literal with a VALID lexical, else None."""
    if t is ERROR or t is UNDEF or t[0] != "lit":
        return None
    lex, dt = t[1], t[2]
    tier = NUM_TIER.get(dt)
    if tier is None:
        return None
    if isinstance(lex, (int, Fraction, float)) and not isinstance(lex, bool):
        return (tier, lex)
    s = str(lex)
    try:
        if tier == 0:
            if not s.lstrip("+-").isdigit():
                return None
            return (0, int(s))
        if tier == 1:
            if "e" in s.lower() or s in ("", "+", "-", "."):
                return None
            return (1, Fraction(s))
        if s == "INF":
            return (2, float("inf"))
        if s == "-INF":
            return (2, float("-inf"))
        if s in ("Infinity", "-Infinity", "inf", "-inf"):
            return None  # not valid xsd:double lexicals
        return (2, float(s))
    except (ValueError, ZeroDivisionError):
        return None


def num_term(tier, v):
    dt = (XSD_INTEGER, XSD_DECIMAL, XSD_DOUBLE)[tier]
    if tier == 0:
        v = int(v)
    elif tier == 1:
        v = Fraction(v)
    else:
        v = float(v)
    return ("lit", v, dt, None)


def stringy(t):
    return (t is not ERROR and t is not UNDEF and t[0] == "lit"
            and t[2] in (XSD_STRING, RDF_LANGSTRING))


def ebv(t):
    if t is ERROR or t is UNDEF or t[0] != "lit":
        return ERROR
    lex, dt = t[1], t[2]
    if dt == XSD_BOOLEAN:
        if str(lex) in ("true", "1"):
            return True
        if str(lex) in ("false", "0"):
            return False
        return False          # invalid boolean lexical → False (§17.2.2)
    if dt in NUM_TIER:
        n = numv(t)
        if n is None:
            return False      # invalid numeric lexical → False (§17.2.2)
        v = n[1]
        return not (v == 0 or (isinstance(v, float) and math.isnan(v)))
    if dt in (XSD_STRING, RDF_LANGSTRING):
        return len(str(lex)) > 0
    return ERROR


def same_term(x, y):
    if x[0] != y[0]:
        return False
    if x[0] == "iri":
        return x[1] == y[1]
    lx, ly = (x[3] or "").lower(), (y[3] or "").lower()
    return str(x[1]) == str(y[1]) and x[2] == y[2] and lx == ly


def _cmp_vals(op, a, b):
    if isinstance(a, float) or isinstance(b, float):
        a, b = float(a), float(b)
        if math.isnan(a) or math.isnan(b):
            return op == "!="
    return {"=": a == b, "!=": a != b, "<": a < b, "<=": a <= b,
            ">": a > b, ">=": a >= b}[op]


def cmp(op, x, y):
    if x is ERROR or y is ERROR or x is UNDEF or y is UNDEF:
        return ERROR
    nx, ny = numv(x), numv(y)
    if nx and ny:
        return _cmp_vals(op, nx[1], ny[1])
    both_lit = x[0] == "lit" and y[0] == "lit"

    def _valid_dt(t):
        import re
        return bool(re.match(r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}",
                             str(t[1])))

    def _boolv(t):
        if str(t[1]) in ("true", "1"):
            return True
        if str(t[1]) in ("false", "0"):
            return False
        return None
    if both_lit and x[2] == XSD_DATETIME and y[2] == XSD_DATETIME \
            and _valid_dt(x) and _valid_dt(y):
        return _cmp_vals(op, str(x[1]), str(y[1]))   # ISO lexicals, no TZ
    if both_lit and x[2] == XSD_STRING and y[2] == XSD_STRING:
        return _cmp_vals(op, str(x[1]), str(y[1]))
    if both_lit and x[2] == XSD_BOOLEAN and y[2] == XSD_BOOLEAN \
            and _boolv(x) is not None and _boolv(y) is not None:
        return _cmp_vals(op, int(_boolv(x)), int(_boolv(y)))
    if op in ("=", "!="):
        if (both_lit and x[2] == RDF_LANGSTRING and y[2] == RDF_LANGSTRING
                and (x[3] or "").lower() == (y[3] or "").lower()):
            return _cmp_vals(op, str(x[1]), str(y[1]))
        if same_term(x, y):
            return op == "="
        if both_lit:
            return ERROR      # RDFterm-equal on distinct incomparable literals
        return op == "!="
    return ERROR


def boolt(v):
    if v is ERROR:
        return ERROR
    return ("lit", "true" if v else "false", XSD_BOOLEAN, None)


# ------------------------------------------------------------ generator
#
# Each node: (sparql_string, eval_fn(env) -> term | ERROR). env maps var
# name -> pool term (absent = UNDEF).

VARS = ["a", "b", "c"]

STR_CONSTS = [lit("abc"), lit("b"), lit(""), lit("Abc dEf"),
              lit("chat", lang="en"), lit("chat", lang="fr")]
NUM_ARG_CONSTS = [lit("1", XSD_INTEGER), lit("2", XSD_INTEGER),
                  lit("-1", XSD_INTEGER), lit("0", XSD_INTEGER),
                  lit("3", XSD_INTEGER), lit("2.5", XSD_DECIMAL),
                  lit("-0.5", XSD_DECIMAL), lit("0.5", XSD_DECIMAL)]
LANG_RANGES = ["*", "en", "fr", "en-us", "EN", ""]
CAST_DTS = ["integer", "decimal", "double", "boolean", "string"]
STRDT_DTS = [XSD_INTEGER, XSD_DECIMAL, XSD_DOUBLE, XSD_BOOLEAN,
             "urn:dt:unknown", XSD_STRING]


def gen_leaf(rng):
    if rng.random() < 0.55:
        v = rng.choice(VARS)
        return (f"?{v}",
                lambda env, v=v: env.get(v) if env.get(v) is not None
                else ERROR)
    t = rng.choice([p for p in POOL if p is not UNDEF])
    return (term_sparql(t), lambda env, t=t: t)


def _arith(op, x, y):
    if x is ERROR or y is ERROR:
        return ERROR
    nx, ny = numv(x), numv(y)
    if nx is None or ny is None:
        return ERROR
    tier = max(nx[0], ny[0])
    if op == "/" and tier == 0:
        tier = 1
    a, b = nx[1], ny[1]
    if tier == 2:
        a, b = float(a), float(b)
        if op == "+":
            return num_term(2, a + b)
        if op == "-":
            return num_term(2, a - b)
        if op == "*":
            return num_term(2, a * b)
        if b == 0:
            if a == 0 or math.isnan(a):
                return num_term(2, float("nan"))
            sign = math.copysign(1, a) * math.copysign(1, b)
            return num_term(2, math.copysign(float("inf"), sign))
        return num_term(2, a / b)
    a, b = Fraction(a), Fraction(b)
    if op == "+":
        return num_term(tier, a + b)
    if op == "-":
        return num_term(tier, a - b)
    if op == "*":
        return num_term(tier, a * b)
    if b == 0:
        return ERROR          # op:numeric-divide: integer/decimal ÷0 errors
    return num_term(1, a / b)


def _round_half_up(v):
    """fn:round: ties toward positive infinity."""
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return v
        return float(math.floor(v + 0.5))
    return math.floor(Fraction(v) + Fraction(1, 2))


def _substr(s, start, length=None):
    """fn:substring character positions (1-based, fn:round on the args)."""
    st = _round_half_up(start)
    if isinstance(st, float) and (math.isnan(st) or math.isinf(st)):
        return ""
    lo = max(int(st), 1)
    if length is None:
        return s[lo - 1:]
    ln = _round_half_up(length)
    if isinstance(ln, float) and math.isnan(ln):
        return ""
    hi = int(st) + (len(s) if isinstance(ln, float) and math.isinf(ln)
                    else int(ln))
    return s[lo - 1:max(hi - 1, lo - 1)] if hi > lo else ""


def _argcompat(x, y):
    """§17.4.3.1.1: both string literals; arg2 lang only if equal to arg1's."""
    if not (stringy(x) and stringy(y)):
        return False
    if y[2] == XSD_STRING:
        return True
    return x[2] == RDF_LANGSTRING and (x[3] or "").lower() == (y[3] or "").lower()


def _strlit(s, src):
    """String result keeping the first argument's language tag."""
    if src[2] == RDF_LANGSTRING:
        return ("lit", s, RDF_LANGSTRING, src[3])
    return ("lit", s, XSD_STRING, None)


def _cast(local, x):
    if x is ERROR or x is UNDEF:
        return ERROR
    if local == "string":
        if x[0] == "iri":
            return lit(x[1])
        if x[0] == "lit":
            return lit(str(x[1]))
        return ERROR
    if x[0] != "lit":
        return ERROR
    lex, dt = x[1], x[2]
    n = numv(x)
    as_bool = (str(lex) == "true") if dt == XSD_BOOLEAN else None
    s = str(lex)
    if local == "boolean":
        if dt == XSD_BOOLEAN:
            return boolt(as_bool)
        if n is not None:
            v = n[1]
            return boolt(not (v == 0 or (isinstance(v, float)
                                         and math.isnan(v))))
        if dt == XSD_STRING:
            if s in ("true", "1"):
                return boolt(True)
            if s in ("false", "0"):
                return boolt(False)
        return ERROR
    if local == "integer":
        if dt == XSD_BOOLEAN:
            return num_term(0, 1 if as_bool else 0)
        if n is not None:
            v = n[1]
            if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
                return ERROR
            return num_term(0, int(v) if v >= 0 else -int(-v))
        if dt == XSD_STRING and s.lstrip("+-").isdigit() and s.lstrip("+-"):
            return num_term(0, int(s))
        return ERROR
    if local == "decimal":
        if dt == XSD_BOOLEAN:
            return num_term(1, 1 if as_bool else 0)
        if n is not None:
            v = n[1]
            if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
                return ERROR
            return num_term(1, Fraction(v))
        if dt == XSD_STRING:
            try:
                if "e" in s.lower() or not s.strip("+-."):
                    return ERROR
                return num_term(1, Fraction(s))
            except (ValueError, ZeroDivisionError):
                return ERROR
        return ERROR
    # double
    if dt == XSD_BOOLEAN:
        return num_term(2, 1.0 if as_bool else 0.0)
    if n is not None:
        return num_term(2, float(n[1]))
    if dt == XSD_STRING:
        if s == "INF":
            return num_term(2, float("inf"))
        if s == "-INF":
            return num_term(2, float("-inf"))
        if s == "NaN":
            return num_term(2, float("nan"))
        try:
            if s.lower() in ("inf", "-inf", "infinity", "-infinity", "nan",
                             "") or s.lstrip("+-") == "":
                return ERROR
            return num_term(2, float(s))
        except ValueError:
            return ERROR
    return ERROR


def gen_expr(rng, depth):
    if depth <= 0:
        return gen_leaf(rng)
    kind = rng.choice(
        ["arith", "arith", "cmp", "cmp", "logic", "not", "neg", "uplus",
         "if", "coalesce", "bound", "str", "lang", "datatype", "iri",
         "testers", "sameterm", "strlen", "case", "concat", "contains",
         "strbeforeafter", "substr", "langmatches", "strlang", "strdt",
         "cast", "in", "absfns", "leaf", "leaf"])
    sub = lambda: gen_expr(rng, depth - 1)          # noqa: E731

    if kind == "leaf":
        return gen_leaf(rng)
    if kind == "arith":
        op = rng.choice("+-*/")
        (xs, xf), (ys, yf) = sub(), sub()
        return (f"({xs} {op} {ys})",
                lambda env: _arith(op, xf(env), yf(env)))
    if kind == "cmp":
        op = rng.choice(["=", "!=", "<", "<=", ">", ">="])
        (xs, xf), (ys, yf) = sub(), sub()
        return (f"({xs} {op} {ys})",
                lambda env: boolt(cmp(op, xf(env), yf(env))))
    if kind == "logic":
        op = rng.choice(["&&", "||"])
        (xs, xf), (ys, yf) = sub(), sub()

        def ev(env, op=op, xf=xf, yf=yf):
            l, r = ebv(xf(env)), ebv(yf(env))
            if op == "&&":
                if l is False or r is False:
                    return boolt(False)
                if l is ERROR or r is ERROR:
                    return ERROR
                return boolt(True)
            if l is True or r is True:
                return boolt(True)
            if l is ERROR or r is ERROR:
                return ERROR
            return boolt(False)
        return (f"({xs} {op} {ys})", ev)
    if kind == "not":
        xs, xf = sub()
        return (f"(!{xs})",
                lambda env: ERROR if ebv(xf(env)) is ERROR
                else boolt(not ebv(xf(env))))
    if kind in ("neg", "uplus"):
        xs, xf = sub()
        sign = "-" if kind == "neg" else "+"

        def ev(env, xf=xf, neg=(kind == "neg")):
            n = numv(xf(env))
            if n is None or xf(env) is ERROR:
                return ERROR
            return num_term(n[0], -n[1] if neg else n[1])
        return (f"({sign}{xs})", ev)
    if kind == "if":
        (cs, cf), (ts, tf), (es, ef) = sub(), sub(), sub()

        def ev(env, cf=cf, tf=tf, ef=ef):
            c = ebv(cf(env))
            if c is ERROR:
                return ERROR
            return tf(env) if c else ef(env)
        return (f"IF({cs}, {ts}, {es})", ev)
    if kind == "coalesce":
        parts = [sub() for _ in range(rng.randint(2, 3))]

        def ev(env, parts=parts):
            for _, f in parts:
                v = f(env)
                if v is not ERROR and v is not UNDEF:
                    return v
            return ERROR
        return ("COALESCE(" + ", ".join(s for s, _ in parts) + ")", ev)
    if kind == "bound":
        v = rng.choice(VARS)
        return (f"BOUND(?{v})",
                lambda env, v=v: boolt(env.get(v) is not None))
    if kind == "str":
        xs, xf = gen_leaf(rng)

        def ev(env, xf=xf):
            t = xf(env)
            if t is ERROR or t is UNDEF:
                return ERROR
            if t[0] == "iri":
                return lit(t[1])
            return lit(str(t[1]))
        return (f"STR({xs})", ev)
    if kind == "lang":
        xs, xf = sub()

        def ev(env, xf=xf):
            t = xf(env)
            if t is ERROR or t is UNDEF or t[0] != "lit":
                return ERROR
            return lit((t[3] or "").lower())
        return (f"LANG({xs})", ev)
    if kind == "datatype":
        xs, xf = sub()

        def ev(env, xf=xf):
            t = xf(env)
            if t is ERROR or t is UNDEF or t[0] != "lit":
                return ERROR
            return ("iri", t[2])
        return (f"DATATYPE({xs})", ev)
    if kind == "iri":
        xs, xf = gen_leaf(rng)

        def ev(env, xf=xf):
            t = xf(env)
            if t is ERROR or t is UNDEF:
                return ERROR
            if t[0] == "iri":
                return t
            if t[0] == "lit" and t[2] == XSD_STRING:
                return ("iri", str(t[1]))
            return ERROR
        return (f"IRI({xs})", ev)
    if kind == "testers":
        fn = rng.choice(["isIRI", "isLiteral", "isNumeric"])
        xs, xf = sub()

        def ev(env, xf=xf, fn=fn):
            t = xf(env)
            if t is ERROR or t is UNDEF:
                return ERROR
            if fn == "isIRI":
                return boolt(t[0] == "iri")
            if fn == "isLiteral":
                return boolt(t[0] == "lit")
            return boolt(numv(t) is not None)
        return (f"{fn}({xs})", ev)
    if kind == "sameterm":
        (xs, xf), (ys, yf) = sub(), sub()

        def ev(env, xf=xf, yf=yf):
            x, y = xf(env), yf(env)
            if x in (ERROR, UNDEF) or y in (ERROR, UNDEF):
                return ERROR
            return boolt(same_term(x, y))
        return (f"sameTerm({xs}, {ys})", ev)
    if kind == "strlen":
        xs, xf = sub()

        def ev(env, xf=xf):
            t = xf(env)
            if not stringy(t):
                return ERROR
            return num_term(0, len(str(t[1])))
        return (f"STRLEN({xs})", ev)
    if kind == "case":
        fn = rng.choice(["UCASE", "LCASE"])
        xs, xf = sub()

        def ev(env, xf=xf, fn=fn):
            t = xf(env)
            if not stringy(t):
                return ERROR
            s = str(t[1])
            return _strlit(s.upper() if fn == "UCASE" else s.lower(), t)
        return (f"{fn}({xs})", ev)
    if kind == "concat":
        n = rng.randint(2, 3)
        parts = [gen_leaf(rng) if rng.random() < 0.6 else sub()
                 for _ in range(n)]

        def ev(env, parts=parts):
            vals = [f(env) for _, f in parts]
            if not all(stringy(v) for v in vals):
                return ERROR
            s = "".join(str(v[1]) for v in vals)
            tags = {(v[3] or "").lower() if v[2] == RDF_LANGSTRING else None
                    for v in vals}
            if len(tags) == 1 and None not in tags:
                return ("lit", s, RDF_LANGSTRING, tags.pop())
            return lit(s)
        return ("CONCAT(" + ", ".join(s for s, _ in parts) + ")", ev)
    if kind == "contains":
        fn = rng.choice(["CONTAINS", "STRSTARTS", "STRENDS"])
        (xs, xf), (ys, yf) = sub(), sub()

        def ev(env, xf=xf, yf=yf, fn=fn):
            x, y = xf(env), yf(env)
            if not _argcompat(x, y):
                return ERROR
            a, b = str(x[1]), str(y[1])
            if fn == "CONTAINS":
                return boolt(b in a)
            if fn == "STRSTARTS":
                return boolt(a.startswith(b))
            return boolt(a.endswith(b))
        return (f"{fn}({xs}, {ys})", ev)
    if kind == "strbeforeafter":
        fn = rng.choice(["STRBEFORE", "STRAFTER"])
        (xs, xf), (ys, yf) = sub(), sub()

        def ev(env, xf=xf, yf=yf, fn=fn):
            x, y = xf(env), yf(env)
            if not _argcompat(x, y):
                return ERROR
            a, b = str(x[1]), str(y[1])
            pos = a.find(b)
            if pos < 0:
                return lit("")
            if fn == "STRBEFORE":
                return _strlit(a[:pos], x)
            return _strlit(a[pos + len(b):], x)
        return (f"{fn}({xs}, {ys})", ev)
    if kind == "substr":
        xs, xf = sub()
        st = rng.choice(NUM_ARG_CONSTS)
        use_len = rng.random() < 0.7
        ln = rng.choice(NUM_ARG_CONSTS) if use_len else None

        def ev(env, xf=xf, st=st, ln=ln):
            t = xf(env)
            if not stringy(t):
                return ERROR
            sv = numv(st)[1]
            lv = numv(ln)[1] if ln is not None else None
            return _strlit(_substr(str(t[1]), sv, lv), t)
        args = f"{xs}, {term_sparql(st)}"
        if use_len:
            args += f", {term_sparql(ln)}"
        return (f"SUBSTR({args})", ev)
    if kind == "langmatches":
        xs, xf = sub()
        rng_s = rng.choice(LANG_RANGES)

        def ev(env, xf=xf, rng_s=rng_s):
            t = xf(env)
            if t is ERROR or t is UNDEF or t[0] != "lit" \
                    or t[2] != XSD_STRING:
                return ERROR
            tag, r = str(t[1]).lower(), rng_s.lower()
            if r == "*":
                return boolt(len(tag) > 0)
            return boolt(tag == r or tag.startswith(r + "-"))
        return (f'LANGMATCHES(LANG({xs}) , "{rng_s}")',
                lambda env, xf=xf, rng_s=rng_s: ev_langm(env, xf, rng_s))

    if kind == "strlang":
        (xs, xf) = sub()
        tag = rng.choice(["en", "fr-be", "EN"])

        def ev(env, xf=xf, tag=tag):
            t = xf(env)
            if t is ERROR or t is UNDEF or t[0] != "lit" \
                    or t[2] != XSD_STRING:
                return ERROR
            return ("lit", str(t[1]), RDF_LANGSTRING, tag.lower())
        return (f'STRLANG({xs}, "{tag}")', ev)
    if kind == "strdt":
        (xs, xf) = sub()
        dt = rng.choice(STRDT_DTS)

        def ev(env, xf=xf, dt=dt):
            t = xf(env)
            if t is ERROR or t is UNDEF or t[0] != "lit" \
                    or t[2] != XSD_STRING:
                return ERROR
            return ("lit", str(t[1]), dt, None)
        return (f"STRDT({xs}, <{dt}>)", ev)
    if kind == "cast":
        local = rng.choice(CAST_DTS)
        xs, xf = (gen_leaf(rng) if local == "string" or rng.random() < 0.5
                  else sub())
        return (f"xsd:{local}({xs})",
                lambda env, xf=xf, local=local: _cast(local, xf(env)))
    if kind == "absfns":
        fn = rng.choice(ABS_FNS)
        xs, xf = sub()

        def ev(env, xf=xf, fn=fn):
            n = numv(xf(env))
            if n is None:
                return ERROR
            tier, v = n
            if isinstance(v, float) and (math.isnan(v) or math.isinf(v)):
                return num_term(tier, abs(v) if fn == "ABS" else v)
            if fn == "ABS":
                return num_term(tier, abs(v))
            if fn == "CEIL":
                r = math.ceil(v)
            elif fn == "FLOOR":
                r = math.floor(v)
            else:
                r = _round_half_up(v)
            return num_term(tier, float(r) if tier == 2 else r)
        return (f"{fn}({xs})", ev)
    if kind == "in":
        neg = rng.random() < 0.5
        xs, xf = sub()
        consts = [rng.choice([p for p in POOL if p is not UNDEF])
                  for _ in range(rng.randint(2, 3))]

        def ev(env, xf=xf, consts=consts, neg=neg):
            x = xf(env)
            if x is ERROR or x is UNDEF:
                return ERROR
            r, saw_err = False, False
            for c in consts:
                e = cmp("=", x, c)
                if e is ERROR:
                    saw_err = True
                elif e:
                    r = True
            if r:
                return boolt(not neg)
            if saw_err:
                return ERROR
            return boolt(neg)
        body = ", ".join(term_sparql(c) for c in consts)
        return (f"({xs} {'NOT IN' if neg else 'IN'} ({body}))", ev)
    raise AssertionError(kind)


def ev_langm(env, xf, rng_s):
    t = xf(env)
    if t is ERROR or t is UNDEF or t[0] != "lit":
        return ERROR
    tag, r = (t[3] or "").lower(), rng_s.lower()
    if r == "*":
        return boolt(len(tag) > 0)
    return boolt(tag == r or tag.startswith(r + "-"))


# -------------------------------------------------------------- comparison

ABS_FNS = ["ABS", "CEIL", "FLOOR", "ROUND"]


def _tier_of_dt(dt):
    return NUM_TIER.get(dt)


def compare(engine_b, ref, ctx):
    """engine_b: None (unbound) or (kind, lex, dt, lang)."""
    if ref is ERROR:
        assert engine_b is None, f"{ctx}: expected error/unbound, got {engine_b}"
        return
    assert engine_b is not None, f"{ctx}: expected {ref}, engine unbound"
    kind, lex, dt, lang = engine_b
    if ref[0] == "iri":
        assert kind == "iri" and lex == ref[1], f"{ctx}: {engine_b} != {ref}"
        return
    assert kind == "lit", f"{ctx}: {engine_b} != {ref}"
    rlex, rdt, rlang = ref[1], ref[2], ref[3]
    et, rt = _tier_of_dt(dt), _tier_of_dt(rdt)
    if rt is not None and isinstance(rlex, str):
        # a numeric leaf passed through vs an engine-recomputed lexical
        # ("-2.5e0" vs "-2.5"): compare in the value space
        rn = numv(ref)
        if rn is not None:
            rlex = rn[1]
    if rt is not None and isinstance(rlex, (int, Fraction, float)) \
            and not isinstance(rlex, bool):
        assert et == rt, f"{ctx}: numeric tier {dt} vs {rdt}"
        ev = numv(("lit", lex, dt, None))
        assert ev is not None, f"{ctx}: engine lexical {lex!r} invalid for {dt}"
        v, rv = ev[1], rlex
        if rt == 0:
            assert int(v) == int(rv), f"{ctx}: {v} != {rv}"
        elif rt == 1:
            assert abs(Fraction(v) - Fraction(rv)) <= \
                Fraction(1, 10**6) * max(1, abs(Fraction(rv))), \
                f"{ctx}: {float(v)} != {float(rv)}"
        else:
            v, rv = float(v), float(rv)
            ok = (math.isnan(v) and math.isnan(rv)) or v == rv or \
                (math.isfinite(v) and math.isfinite(rv)
                 and math.isclose(v, rv, rel_tol=1e-9))
            assert ok, f"{ctx}: {v} != {rv}"
        return
    if rdt == XSD_BOOLEAN:
        assert dt == XSD_BOOLEAN and lex == str(rlex), \
            f"{ctx}: {engine_b} != {ref}"
        return
    if rdt == RDF_LANGSTRING:
        assert dt == RDF_LANGSTRING and lex == str(rlex) \
            and (lang or "").lower() == (rlang or "").lower(), \
            f"{ctx}: {engine_b} != {ref}"
        return
    assert dt == rdt and lex == str(rlex) and not lang, \
        f"{ctx}: {engine_b} != {ref}"


# ----------------------------------------------------------------- harness

BATCH = 8


def _values_block(rng):
    """Rows (?i ?a ?b ?c): every pool term appears at least once as ?a."""
    rows = []
    pool = POOL[:]
    rng.shuffle(pool)
    for i, t in enumerate(pool):
        b = rng.choice(POOL)
        c = rng.choice(POOL)
        rows.append((i, t, b, c))
    block = " ".join(
        f"({i} {term_sparql(a)} {term_sparql(b)} {term_sparql(c)})"
        for i, a, b, c in rows)
    envs = {i: {v: t for v, t in zip(VARS, (a, b, c)) if t is not None}
            for i, a, b, c in rows}
    return block, envs


def _extract(row, name):
    if row[name] is None:
        return None
    lex, dt, lang = row[name + "__lex"], row[name + "__dt"], row[name + "__lang"]
    if dt is None:
        return ("bnode" if lex.startswith("_:") else "iri", lex, None, None)
    return ("lit", lex, dt, lang)


def _run_cases(engine, block, envs, cases):
    binds = "\n".join(f"BIND({s} AS ?r{k})" for k, (s, _) in enumerate(cases))
    rs = " ".join(f"?r{k}" for k in range(len(cases)))
    q = (f"PREFIX xsd: <{XSD}>\n"
         f"SELECT ?i {rs} WHERE {{ VALUES (?i ?a ?b ?c) {{ {block} }} "
         f"{binds} }}")
    try:
        rows = engine.query(q).df.collect()
    except Exception:
        # adversarial batches can exceed analyzer memory when several
        # deeply nested BINDs stack in one projection — semantics are
        # what's under test, so degrade to one query per expression
        # (with one GC'd retry: the pressure is transient py4j garbage)
        import gc
        import time
        gc.collect()
        if len(cases) == 1:
            time.sleep(1)
            rows = engine.query(q).df.collect()
        else:
            for case in cases:
                _run_cases(engine, block, envs, [case])
            return
    for row in rows:
        i = int(row["i__lex"])
        env = envs[i]
        for k, (s, f) in enumerate(cases):
            ref = f(env)
            got = _extract(row, f"r{k}")
            compare(got, ref,
                    f"expr={s} env={ {v: env.get(v) for v in VARS} }")


@pytest.mark.parametrize("seed,encoded", [(11, False), (22, False),
                                          (33, False), (11, True)])
def test_expr_fuzz_differential(spark, seed, encoded):
    """Seeds 11/22/33 on the string path; seed 11 repeated through the
    production BIGINT-dictionary path (encoded=True) for parity."""
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.model import local_quads_df
    from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH, QuadStore

    rng = random.Random(seed)
    rows = [(DEFAULT_GRAPH, "urn:x:a", "urn:p", "urn:x:b",
             None, None, None, None)]
    eng = Engine(spark, QuadStore(spark, local_quads_df(spark, rows)),
                 encoded=encoded)
    block, envs = _values_block(rng)

    cases = [gen_expr(rng, rng.randint(1, 3)) for _ in range(96)]
    for lo in range(0, len(cases), BATCH):
        _run_cases(eng, block, envs, cases[lo:lo + BATCH])
        # release py4j references to the previous query's (large) Column
        # trees promptly — JVM-side plan garbage otherwise accumulates
        # across dozens of adversarial queries and can OOM the analyzer
        import gc
        gc.collect()
