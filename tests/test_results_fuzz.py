"""Randomized round-trip fuzzer for the B51 result writers (r9).

The wire formats are the adapter's actual output surface (A13/A14/B51 —
the reference streams SPARQLResultsJSONWriter bytes back to the harness),
and the byte-exact corpus cases only pin a handful of hand-picked shapes.
This sweep generates random solution tables over a hostile term pool
(embedded quotes/newlines/tabs/commas/backslashes/CR, unicode, empty
strings, language tags, custom datatypes, bnodes) and round-trips each
through all four writers with INDEPENDENT readers:

* JSON  → ``json.loads`` + the W3C harness's ``json_binding_term``,
* XML   → ``xml.etree.ElementTree`` (namespace-aware),
* TSV   → the harness's Turtle-style ``parse_term`` (lossless per spec §4),
* CSV   → ``csv.reader`` (RFC 4180), compared on the spec-§3 LOSSY
  lexical projection (that projection applied to the expected side too).

Any writer/escaper defect shows up as a term mismatch after the
independent decode.
"""

from __future__ import annotations

import csv
import io
import json
import random
import xml.etree.ElementTree as ET
from collections import Counter

from pyspark.sql.types import (DoubleType, StringType, StructField,
                               StructType, TimestampType)

from tests.w3c.harness import json_binding_term, parse_term

XSD = "http://www.w3.org/2001/XMLSchema#"
LANGSTR = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"

NASTY_LEX = [
    'he said "hi"', "line1\nline2", "tab\there", "comma, sep",
    "back\\slash", "", "√unicode≤ぁ", "  padded  ", "crlf\r\nend",
    "cr\ronly", "a\tb\nc", '""', "'single'", "&amp; <tag>", "42",
]

POOL = (
    [("uri", "http://example.org/x"), ("uri", "urn:weird/iri?q=1&r=2"),
     ("bnode", "b0"), ("bnode", "node-17")]
    + [("lit", lx, XSD + "string", None) for lx in NASTY_LEX]
    + [("lit", "42", XSD + "integer", None),
       ("lit", "bad\nvalue", "urn:my:custom,dt", None),
       ("lit", 'quoted "lex"', LANGSTR, "en-gb"),
       ("lit", "chat", LANGSTR, "fr")]
)

VARS = ["a", "b", "c"]


def _family_schema():
    fields = []
    for v in VARS:
        fields += [StructField(v, StringType()),
                   StructField(v + "__lex", StringType()),
                   StructField(v + "__dt", StringType()),
                   StructField(v + "__lang", StringType()),
                   StructField(v + "__num", DoubleType()),
                   StructField(v + "__ts", TimestampType())]
    return StructType(fields)


def _term_cells(t):
    if t is None:
        return (None,) * 6
    if t[0] == "uri":
        return (t[1], t[1], None, None, None, None)
    if t[0] == "bnode":
        lbl = "_:" + t[1]
        return (lbl, lbl, None, None, None, None)
    _, lex, dt, lang = t
    return (f'"{lex}"^^{dt}', lex, dt, lang, None, None)


def _mkdf(spark, rows):
    data = [sum((_term_cells(t) for t in row), ()) for row in rows]
    return spark.createDataFrame(data, _family_schema())


def _key(sol):
    return frozenset(sol.items())


def _gen_rows(rng, n):
    return [tuple(rng.choice(POOL) if rng.random() < 0.85 else None
                  for _ in VARS) for _ in range(n)]


def _expected(rows):
    out = []
    for row in rows:
        sol = {}
        for v, t in zip(VARS, row):
            if t is not None:
                sol[v] = t
        out.append(sol)
    return out


def _run(spark, seed):
    from graphdb_free_mocha_sa_spark.sparql.results import (iter_select_csv,
                                                            iter_select_json,
                                                            iter_select_tsv,
                                                            iter_select_xml)
    rng = random.Random(seed)
    rows = _gen_rows(rng, rng.randint(1, 8))
    df = _mkdf(spark, rows)
    exp = _expected(rows)

    # ---- JSON
    doc = json.loads("".join(iter_select_json(df, VARS)))
    assert doc["head"]["vars"] == VARS
    got = [{v: json_binding_term(b) for v, b in r.items()}
           for r in doc["results"]["bindings"]]
    assert Counter(map(_key, got)) == Counter(map(_key, exp)), \
        f"JSON seed={seed}\nexp={exp}\ngot={got}"

    # ---- XML
    ns = "{http://www.w3.org/2005/sparql-results#}"
    root = ET.fromstring("".join(iter_select_xml(df, VARS)))
    got = []
    for res in root.find(ns + "results"):
        sol = {}
        for b in res:
            v = b.attrib["name"]
            el = b[0]
            if el.tag == ns + "uri":
                sol[v] = ("uri", el.text or "")
            elif el.tag == ns + "bnode":
                sol[v] = ("bnode", el.text or "")
            else:
                lang = el.attrib.get(
                    "{http://www.w3.org/XML/1998/namespace}lang")
                dt = el.attrib.get("datatype")
                sol[v] = ("lit", el.text or "",
                          LANGSTR if lang else (dt or XSD + "string"),
                          lang.lower() if lang else None)
        got.append(sol)
    assert Counter(map(_key, got)) == Counter(map(_key, exp)), \
        f"XML seed={seed}\nexp={exp}\ngot={got}"

    # ---- TSV (lossless per spec §4)
    text = "".join(iter_select_tsv(df, VARS))
    lines = text.split("\n")
    assert lines[0] == "\t".join("?" + v for v in VARS)
    # literal lexicals may contain RAW newlines only via \n ESCAPES in
    # TSV — a raw newline in the payload would break line framing, which
    # is exactly what this decode asserts by splitting on '\n'
    got = []
    for line in lines[1:-1]:
        sol = {}
        for v, cell in zip(VARS, line.split("\t")):
            if cell != "":
                t = parse_term(cell)
                sol[v] = t
        got.append(sol)
    exp_tsv = []
    for sol in exp:
        fixed = {}
        for v, t in sol.items():
            # parse_term lowercases langs; writers emit stored case
            fixed[v] = t
        exp_tsv.append(fixed)
    assert Counter(map(_key, got)) == Counter(map(_key, exp_tsv)), \
        f"TSV seed={seed}\nexp={exp_tsv}\ngot={got}"

    # ---- CSV (lossy lexical projection per spec §3)
    text = "".join(iter_select_csv(df, VARS))
    rdr = csv.reader(io.StringIO(text, newline=""))
    hdr = next(rdr)
    assert hdr == VARS
    def proj(t):
        if t is None:
            return ""
        if t[0] == "uri":
            return t[1]
        if t[0] == "bnode":
            return "_:" + t[1]
        return t[1]
    got = [tuple(cells) for cells in rdr if cells]
    expc = [tuple(proj(sol.get(v)) for v in VARS) for sol in exp]
    assert Counter(got) == Counter(expc), \
        f"CSV seed={seed}\nexp={expc}\ngot={got}"


def test_results_roundtrip_fuzz(spark):
    for seed in range(40):
        _run(spark, seed)
