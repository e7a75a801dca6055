"""W3C conformance corpus — builtin functions.

Source: the per-function example tables in SPARQL 1.1 Query §17.4
(normative, reproduced exactly). Each case evaluates expressions with
BIND over a single VALUES row; an erroring expression leaves its var
UNBOUND, so "error" rows expect the var absent.
"""

XSD = "http://www.w3.org/2001/XMLSchema#"
Q = f"PREFIX xsd: <{XSD}>\n"


def _exprs(*pairs, note=""):
    """One case evaluating expr_i, expecting term_i (None = error)."""
    binds = " ".join(f"BIND({e} AS ?r{i})" for i, (e, _) in enumerate(pairs))
    names = " ".join(f"?r{i}" for i in range(len(pairs)))
    row = {f"r{i}": t for i, (_, t) in enumerate(pairs) if t is not None}
    return {
        "query": Q + f"SELECT {names} WHERE {{ VALUES ?u {{ 1 }} {binds} }}",
        "results": [row],
    }


CASES = [
    dict(name="strlen", source="spec §17.4.3.2",
         **_exprs(('STRLEN("chat")', '"4"^^xsd:integer'),
                  ('STRLEN("chat"@en)', '"4"^^xsd:integer'),
                  ('STRLEN("chat"^^xsd:string)', '"4"^^xsd:integer'))),
    dict(name="substr", source="spec §17.4.3.3",
         **_exprs(('SUBSTR("foobar", 4)', '"bar"'),
                  ('SUBSTR("foobar"@en, 4)', '"bar"@en'),
                  ('SUBSTR("foobar"^^xsd:string, 4)', '"bar"^^xsd:string'),
                  ('SUBSTR("foobar", 4, 1)', '"b"'),
                  ('SUBSTR("foobar"@en, 4, 1)', '"b"@en'),
                  ('SUBSTR("foobar"^^xsd:string, 4, 1)', '"b"^^xsd:string'))),
    dict(name="ucase-lcase", source="spec §17.4.3.4-5",
         **_exprs(('UCASE("foo")', '"FOO"'),
                  ('UCASE("foo"@en)', '"FOO"@en'),
                  ('UCASE("foo"^^xsd:string)', '"FOO"^^xsd:string'),
                  ('LCASE("BAR")', '"bar"'),
                  ('LCASE("BAR"@en)', '"bar"@en'),
                  ('LCASE("BAR"^^xsd:string)', '"bar"^^xsd:string'))),
    dict(name="strstarts-ends", source="spec §17.4.3.6-7",
         **_exprs(('STRSTARTS("foobar", "foo")', '"true"^^xsd:boolean'),
                  ('STRSTARTS("foobar"@en, "foo"@en)', '"true"^^xsd:boolean'),
                  ('STRSTARTS("foobar"@en, "foo")', '"true"^^xsd:boolean'),
                  ('STRSTARTS("foobar", "foo"@en)', None),      # error
                  ('STRENDS("foobar", "bar")', '"true"^^xsd:boolean'),
                  ('STRENDS("foobar"@en, "bar"@fr)', None),     # error
                  ('CONTAINS("foobar", "oba")', '"true"^^xsd:boolean'),
                  ('CONTAINS("foobar"@en, "zzz")', '"false"^^xsd:boolean'))),
    dict(name="strbefore", source="spec §17.4.3.8",
         **_exprs(('STRBEFORE("abc", "b")', '"a"'),
                  ('STRBEFORE("abc"@en, "bc")', '"a"@en'),
                  ('STRBEFORE("abc"@en, "b"@cy)', None),        # error
                  ('STRBEFORE("abc"^^xsd:string, "")', '""^^xsd:string'),
                  ('STRBEFORE("abc", "xyz")', '""'),
                  ('STRBEFORE("abc"@en, "z"@en)', '""'),
                  ('STRBEFORE("abc"@en, "z")', '""'),
                  ('STRBEFORE("abc"@en, ""@en)', '""@en'),
                  ('STRBEFORE("abc"@en, "")', '""@en'))),
    dict(name="strafter", source="spec §17.4.3.9",
         **_exprs(('STRAFTER("abc", "b")', '"c"'),
                  ('STRAFTER("abc"@en, "ab")', '"c"@en'),
                  ('STRAFTER("abc"@en, "b"@cy)', None),         # error
                  ('STRAFTER("abc"^^xsd:string, "")', '"abc"^^xsd:string'),
                  ('STRAFTER("abc", "xyz")', '""'),
                  ('STRAFTER("abc"@en, "z"@en)', '""'),
                  ('STRAFTER("abc"@en, "z")', '""'),
                  ('STRAFTER("abc"@en, ""@en)', '"abc"@en'),
                  ('STRAFTER("abc"@en, "")', '"abc"@en'))),
    dict(name="encode-for-uri", source="spec §17.4.3.10",
         **_exprs(('ENCODE_FOR_URI("Los Angeles")', '"Los%20Angeles"'),
                  ('ENCODE_FOR_URI("Los Angeles"@en)', '"Los%20Angeles"'),
                  ('ENCODE_FOR_URI("Los Angeles"^^xsd:string)',
                   '"Los%20Angeles"'))),
    dict(name="concat", source="spec §17.4.3.12",
         **_exprs(('CONCAT("foo", "bar")', '"foobar"'),
                  ('CONCAT("foo"@en, "bar"@en)', '"foobar"@en'),
                  ('CONCAT("foo"^^xsd:string, "bar"^^xsd:string)',
                   '"foobar"^^xsd:string'),
                  ('CONCAT("foo", "bar"^^xsd:string)', '"foobar"'),
                  ('CONCAT("foo"@en, "bar")', '"foobar"'),
                  ('CONCAT("foo"@en, "bar"^^xsd:string)', '"foobar"'))),
    dict(name="langmatches", source="spec §17.4.3.13",
         **_exprs(('LANGMATCHES(LANG("abc"@en), "en")', '"true"^^xsd:boolean'),
                  ('LANGMATCHES(LANG("abc"@en), "*")', '"true"^^xsd:boolean'),
                  ('LANGMATCHES(LANG("abc"), "*")', '"false"^^xsd:boolean'))),
    dict(name="regex", source="spec §17.4.3.14",
         **_exprs(('REGEX("Alice", "^ali", "i")', '"true"^^xsd:boolean'),
                  ('REGEX("Alice", "^ali")', '"false"^^xsd:boolean'),
                  ('REGEX("abcd", "b.d")', '"true"^^xsd:boolean'))),
    dict(name="replace", source="spec §17.4.3.15",
         **_exprs(('REPLACE("abcd", "b", "Z")', '"aZcd"'),
                  ('REPLACE("abab", "B", "Z", "i")', '"aZaZ"'),
                  ('REPLACE("abab", "B.", "Z", "i")', '"aZb"'))),
    dict(name="abs-round-ceil-floor", source="spec §17.4.4",
         **_exprs(('ABS(1)', '"1"^^xsd:integer'),
                  ('ABS(-1.5)', '"1.5"^^xsd:decimal'),
                  ('ROUND(2.4999)', '"2"^^xsd:decimal'),
                  ('ROUND(2.5)', '"3"^^xsd:decimal'),
                  ('ROUND(-2.5)', '"-2"^^xsd:decimal'),
                  ('CEIL(10.5)', '"11"^^xsd:decimal'),
                  ('CEIL(-10.5)', '"-10"^^xsd:decimal'),
                  ('FLOOR(10.5)', '"10"^^xsd:decimal'),
                  ('FLOOR(-10.5)', '"-11"^^xsd:decimal')),
         lax_num=True),
    dict(name="in-notin", source="spec §17.4.1.9-10",
         **_exprs(('2 IN (1, 2, 3)', '"true"^^xsd:boolean'),
                  ('2 IN ()', '"false"^^xsd:boolean'),
                  ('2 IN (<http://example/iri>, "str", 2.0)',
                   '"true"^^xsd:boolean'),
                  ('2 NOT IN (1, 2, 3)', '"false"^^xsd:boolean'),
                  ('2 NOT IN ()', '"true"^^xsd:boolean'),
                  # errors in the list propagate only if no member matches
                  ('2 IN (1/0, 2)', '"true"^^xsd:boolean'),
                  ('2 IN (1/0, 3)', None),
                  ('2 NOT IN (1/0, 2)', '"false"^^xsd:boolean'))),
    dict(name="str-lang-datatype", source="spec §17.4.2",
         **_exprs(('STR(<http://example/>)', '"http://example/"'),
                  ('STR("chat"@fr)', '"chat"'),
                  ('STR(1)', '"1"'),
                  ('LANG("chat"@fr)', '"fr"'),
                  ('LANG("chat")', '""'),
                  ('DATATYPE("chat")', '<http://www.w3.org/2001/XMLSchema#string>'),
                  ('DATATYPE("chat"@fr)',
                   '<http://www.w3.org/1999/02/22-rdf-syntax-ns#langString>'),
                  ('DATATYPE(1)', '<http://www.w3.org/2001/XMLSchema#integer>'))),
    dict(name="term-testers", source="spec §17.4.2.1-4",
         **_exprs(('isIRI(<http://example/>)', '"true"^^xsd:boolean'),
                  ('isIRI("chat")', '"false"^^xsd:boolean'),
                  ('isLITERAL("chat")', '"true"^^xsd:boolean'),
                  ('isLITERAL(<http://example/>)', '"false"^^xsd:boolean'),
                  ('isNUMERIC(12)', '"true"^^xsd:boolean'),
                  ('isNUMERIC("12")', '"false"^^xsd:boolean'),
                  ('isNUMERIC("1200"^^xsd:byte)', '"true"^^xsd:boolean'),
                  ('isNUMERIC(<http://example/>)', '"false"^^xsd:boolean'))),
    dict(name="bound-if-coalesce", source="spec §17.4.1",
         **_exprs(('IF(1 = 1, "yes", "no")', '"yes"'),
                  ('IF(1 = 2, "yes", "no")', '"no"'),
                  ('COALESCE(?unbound, "def")', '"def"'),
                  ('COALESCE(1/0, "after-error")', '"after-error"'),
                  ('BOUND(?u)', '"true"^^xsd:boolean'),
                  ('BOUND(?unbound)', '"false"^^xsd:boolean'))),
    dict(name="strdt-strlang", source="spec §17.4.2.8-9",
         **_exprs(('STRDT("123", xsd:integer)', '"123"^^xsd:integer'),
                  ('STRLANG("chat", "en")', '"chat"@en'))),
    dict(name="hashes", source="spec §17.4.6",
         **_exprs(('MD5("abc")', '"900150983cd24fb0d6963f7d28e17f72"'),
                  ('SHA1("abc")',
                   '"a9993e364706816aba3e25717850c26c9cd0d89d"'),
                  ('SHA256("abc")',
                   '"ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"'))),
    dict(name="numeric-casts", source="spec §17.5 / XPath casting",
         **_exprs(('xsd:integer("13")', '"13"^^xsd:integer'),
                  ('xsd:double("1.5")', '"1.5"^^xsd:double'),
                  ('xsd:boolean("true")', '"true"^^xsd:boolean'),
                  ('xsd:boolean(1)', '"true"^^xsd:boolean'),
                  ('xsd:integer("2.5")', None),         # invalid lexical
                  ('xsd:string(1)', '"1"^^xsd:string')),
         lax_num=True),
    dict(name="uri-str", source="spec §17.4.2.7",
         **_exprs(('IRI("http://example/")', '<http://example/>'),
                  ('URI("http://example/")', '<http://example/>'))),
]


# -- r9 corpus growth: §17.5 casting table edges --

_C = "PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>\n"


def _cast_exprs(*pairs):
    binds = " ".join(f"BIND({e} AS ?r{i})" for i, (e, _) in enumerate(pairs))
    names = " ".join(f"?r{i}" for i in range(len(pairs)))
    row = {f"r{i}": t for i, (_, t) in enumerate(pairs) if t is not None}
    return {
        "query": _C + f"SELECT {names} WHERE {{ VALUES ?u {{ 1 }} {binds} }}",
        "results": [row],
    }


CASES += [
    dict(name="cast-string-to-integer-invalid",
         source="spec §17.5 casting table (string → integer requires an "
                "integer lexical; \"2.8\" is a dynamic error → unbound)",
         **_cast_exprs(('xsd:integer("2.8")', None),
                       ('xsd:integer("3")', '"3"^^xsd:integer'))),
    dict(name="cast-string-to-boolean-table",
         source="spec §17.5 (boolean lexical space: true/false/1/0 only)",
         **_cast_exprs(('xsd:boolean("yes")', None),
                       ('xsd:boolean("1")', '"true"^^xsd:boolean'),
                       ('xsd:boolean("false")', '"false"^^xsd:boolean'))),
    dict(name="cast-iri-to-string",
         source="spec §17.5 (IRI → xsd:string is the one IRI cast allowed)",
         **_cast_exprs(('xsd:string(<http://example/x>)',
                        '"http://example/x"'))),
    dict(name="cast-special-float-lexicals",
         source="spec §17.5 (XSD double lexical space: INF/-INF/NaN valid "
                "for double, INVALID for decimal)",
         **_cast_exprs(('xsd:double("INF")', '"INF"^^xsd:double'),
                       ('xsd:decimal("INF")', None),
                       ('ISNUMERIC(xsd:double("NaN"))',
                        '"true"^^xsd:boolean'))),
    dict(name="cast-boolean-to-numeric",
         source="spec §17.5 (boolean → numeric: true → 1, false → 0)",
         **_cast_exprs(('xsd:integer(true)', '"1"^^xsd:integer'),
                       ('xsd:integer(false)', '"0"^^xsd:integer'))),
    dict(name="cast-double-to-integer-truncates",
         source="spec §17.5 / XPath (numeric → integer casts toward zero)",
         **_cast_exprs(('xsd:integer(2.8)', '"2"^^xsd:integer'),
                       ('xsd:integer(-2.8)', '"-2"^^xsd:integer'))),
]
