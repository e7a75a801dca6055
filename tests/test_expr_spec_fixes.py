"""Deterministic pins for the r7 expression-fuzzer findings.

tests/test_expr_fuzz.py found these by randomized differential sweep
against a pure-Python §17 reference; each test here pins one verified
engine fix so the behavior stays pinned without the fuzzer's randomness:

* §17.3 numeric promotion: integer→decimal→double ladder; ``/`` promotes
  integer operands to decimal (results used to collapse to double).
* op:numeric-* / op:boolean-* operand gating: booleans are not numbers
  (``true = 1`` is a type error), VALUES-sourced booleans ARE ordered
  (``false < true``), lang-tagged literals have no ``<``.
* Division with a type-errored operand stays an error (used to leak
  ±INF/NaN through the IEEE zero-divisor branch).
* ABS/CEIL/FLOOR/ROUND: numeric-only, preserve the argument's numeric
  type, pass NaN/±INF through (F.floor silently clamps them).
* Argument-type constraints: SUBSTR/CONCAT/IRI/unary ± reject non-string
  / non-numeric terms; term testers propagate errors.
* XPath casting rules: xsd:integer("2.5") errors, xsd:double("INF") is
  +Inf but "Infinity" is not a lexical, langString never casts.
* EBV of a numeric-datatype literal with an invalid lexical form is
  FALSE (not error); "1"^^xsd:boolean is true.
"""

from __future__ import annotations

import math

import pytest

XSD = "http://www.w3.org/2001/XMLSchema#"


@pytest.fixture()
def eng(spark):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    return Engine(spark, QuadStore(spark))


def binds(eng, *exprs):
    """Evaluate expressions as BINDs over one row; return one
    (lex, dt, lang) triple per expression — (None, None, None) if the
    expression errored (unbound)."""
    bind = " ".join(f"BIND({e} AS ?r{k})" for k, e in enumerate(exprs))
    names = " ".join(f"?r{k}" for k in range(len(exprs)))
    q = (f"PREFIX xsd: <{XSD}> SELECT {names} WHERE "
         f"{{ VALUES ?one {{ 1 }} {bind} }}")
    [row] = eng.query(q).df.collect()
    return [(row[f"r{k}__lex"], row[f"r{k}__dt"], row[f"r{k}__lang"])
            for k in range(len(exprs))]


def test_numeric_promotion_ladder(eng):
    got = binds(eng, "2.5 + 0.5", "5 - 3", "2.5 * 2e0", "-(2.5)",
                "5 / 2", "1 / 4", "1e0 / 2")
    assert got[0] == ("3.0", XSD + "decimal", None)
    assert got[1] == ("2", XSD + "integer", None)
    assert got[2] == ("5.0", XSD + "double", None)
    assert got[3] == ("-2.5", XSD + "decimal", None)
    assert got[4] == ("2.5", XSD + "decimal", None)    # int÷int → decimal
    assert got[5] == ("0.25", XSD + "decimal", None)
    assert got[6] == ("0.5", XSD + "double", None)


def test_boolean_is_not_a_number(eng):
    got = binds(eng, "true = 1", "true > 0", "false + false", "-true",
                "+true", 'false < true', 'true <= true',
                "ABS(true)")
    assert got[0][0] is None                       # RDFterm-equal error
    assert got[1][0] is None
    assert got[2][0] is None                       # no 0/1 arithmetic
    assert got[3][0] is None
    assert got[4][0] is None
    assert got[5] == ("true", XSD + "boolean", None)
    assert got[6] == ("true", XSD + "boolean", None)
    assert got[7][0] is None


def test_values_sourced_boolean_order_comparisons(eng):
    # VALUES booleans carry no shadow num; op:boolean-less-than must
    # still work off the value space (fuzz: `?b <= ?b` used to error)
    q = (f"PREFIX xsd: <{XSD}> SELECT ?x ?y WHERE {{ "
         f"VALUES ?b {{ true }} BIND((?b <= ?b) AS ?x) "
         f"BIND((?b < false) AS ?y) }}")
    [row] = eng.query(q).df.collect()
    assert row["x__lex"] == "true"
    assert row["y__lex"] == "false"


def test_lang_tagged_literals_have_no_order_operator(eng):
    got = binds(eng, '"a"@en < "b"@en', '"a" < "b"@en',
                '"a"@en = "a"@en', '"a"@en = "b"@en', '"a"@en = "a"@fr')
    assert got[0][0] is None
    assert got[1][0] is None
    assert got[2] == ("true", XSD + "boolean", None)
    assert got[3] == ("false", XSD + "boolean", None)
    assert got[4][0] is None                       # RDFterm-equal error


def test_division_error_does_not_leak_ieee_specials(eng):
    got = binds(eng, "1e0 / <urn:x>", '-2.5e0 / "xy"', "1e0 / 0",
                "-1e0 / 0", "0e0 / 0")
    assert got[0][0] is None
    assert got[1][0] is None
    assert got[2] == ("INF", XSD + "double", None)
    assert got[3] == ("-INF", XSD + "double", None)
    assert got[4] == ("NaN", XSD + "double", None)


def test_abs_family_preserves_numeric_type(eng):
    got = binds(eng, "ABS(-5)", "ABS(-2.5)", "CEIL(2.5)", "FLOOR(2.5)",
                "ROUND(2)", "ROUND(2.5)", "ROUND(-2.5e0)",
                "ROUND(1e0/0)", "CEIL(0e0/0)", 'ROUND("abc")')
    assert got[0] == ("5", XSD + "integer", None)
    assert got[1] == ("2.5", XSD + "decimal", None)
    assert got[2] == ("3.0", XSD + "decimal", None)
    assert got[3] == ("2.0", XSD + "decimal", None)
    assert got[4] == ("2", XSD + "integer", None)
    assert got[5] == ("3.0", XSD + "decimal", None)
    assert got[6] == ("-2.0", XSD + "double", None)   # ties toward +inf
    assert got[7] == ("INF", XSD + "double", None)    # no Long.MAX clamp
    assert got[8] == ("NaN", XSD + "double", None)
    assert got[9][0] is None


def test_string_function_argument_gates(eng):
    got = binds(eng,
                'SUBSTR("2024-03-01T10:00:00"^^xsd:dateTime, 1)',
                "SUBSTR(<urn:x>, 1, 2)",
                'SUBSTR("abcd", true)',
                'CONCAT("a", 5)', "CONCAT()",
                'CONCAT("a", <urn:x>)', 'CONCAT("a"@en, "b"@en)',
                "IRI(5)", "IRI(<urn:x>)", 'IRI("urn:y")',
                "STRLANG(5, \"en\")")
    assert got[0][0] is None
    assert got[1][0] is None
    assert got[2][0] is None
    assert got[3][0] is None
    assert got[4] == ("", XSD + "string", None)
    assert got[5][0] is None
    assert got[6] == ("ab", "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "en")
    assert got[7][0] is None
    assert got[8] == ("urn:x", None, None)
    assert got[9] == ("urn:y", None, None)
    assert got[10][0] is None


def test_term_testers_propagate_errors(eng):
    got = binds(eng, "isIRI(1/0)", "isLiteral(!<urn:x>)",
                "isNumeric(+<urn:x>)",
                'IF(isIRI(!<urn:x>), "t", "e")')
    assert all(g[0] is None for g in got)


def test_xpath_casting_rules(eng):
    got = binds(eng,
                'xsd:integer("2.5")', "xsd:integer(2.7)",
                "xsd:integer(-2.7)", "xsd:integer(true)",
                'xsd:double("INF")', 'xsd:double("-INF")',
                'xsd:double("Infinity")', 'xsd:boolean("true"@en)',
                "xsd:decimal(0.1)", 'xsd:decimal("1e5")',
                "xsd:integer(1e0/0)", "xsd:boolean(0e0/0)",
                'xsd:string("chat"@en)')
    assert got[0][0] is None                       # invalid integer lexical
    assert got[1] == ("2", XSD + "integer", None)  # truncate toward zero
    assert got[2] == ("-2", XSD + "integer", None)
    assert got[3] == ("1", XSD + "integer", None)
    assert got[4] == ("INF", XSD + "double", None)
    assert got[5] == ("-INF", XSD + "double", None)
    assert got[6][0] is None                       # not an XSD lexical
    assert got[7][0] is None                       # langString never casts
    assert got[8] == ("0.1", XSD + "decimal", None)
    assert got[9][0] is None                       # decimal has no exponent
    assert got[10][0] is None                      # INF → integer errors
    assert got[11] == ("false", XSD + "boolean", None)   # NaN → false
    assert got[12] == ("chat", XSD + "string", None)


def test_ebv_invalid_numeric_lexical_is_false(eng):
    got = binds(eng,
                'IF(STRDT("abc", xsd:integer), "t", "f")',
                'IF("1"^^xsd:boolean, "t", "f")',
                'IF(STRDT("xyz", xsd:boolean), "t", "f")',
                'STRDT("2.5", xsd:integer) + 1',
                'STRDT("2.5", xsd:decimal) + 1')
    assert got[0][0] == "f"
    assert got[1][0] == "t"
    assert got[2][0] == "f"
    assert got[3][0] is None     # invalid lexical: no numeric value
    assert got[4] == ("3.5", XSD + "decimal", None)


def test_decimal_lexical_recovery(eng):
    # decimal(38,15) rounding hides the IEEE representation error of
    # non-binary-representable operands
    got = binds(eng, "0.1 + 0.2", "1 / 3", "2.5 * -2")
    assert got[0] == ("0.3", XSD + "decimal", None)
    assert got[1][1] == XSD + "decimal"
    assert math.isclose(float(got[1][0]), 1 / 3, rel_tol=1e-12)
    assert got[2] == ("-5.0", XSD + "decimal", None)


def test_signed_numeric_literals_keep_lexical_form(eng):
    # NumericLiteralNegative is a single terminal: the sign is part of
    # the LEXICAL FORM (r7 fuzz-soak fix: xsd:string(-2.5e0) used to
    # re-serialize the computed value as "-2.5")
    got = binds(eng, "xsd:string(-2.5e0)", "STR(-3)", "1-2", "-(1+1)",
                "DATATYPE(-0.5)")
    assert got[0] == ("-2.5e0", XSD + "string", None)
    assert got[1] == ("-3", XSD + "string", None)
    assert got[2] == ("-1", XSD + "integer", None)
    assert got[3] == ("-2", XSD + "integer", None)
    assert got[4] == (XSD + "decimal", None, None)
