"""Randomized export→import round-trip fuzzer for the RDF writers (r9).

The B50 reader/writer family had per-format round-trip tests on fixed
fixtures; this sweep feeds the four streaming exporters
(N-Quads / TriG / JSON-LD / TriX — the engine's protocol-dump surface)
random quad tables over a hostile term pool (embedded quotes, newlines,
tabs, CR, backslashes, unicode, language tags, custom datatypes, blank
nodes in subject/object/graph position) and re-reads each dump with the
package's OWN readers, comparing quad multisets exactly (the writers
preserve blank-node labels, so no bijection pass is needed — a label
drift would itself be a finding).

The sibling results-format fuzzer (test_results_fuzz.py) found the
results-XML CR-normalization defect; TriX shares the XML carrier, so CR
lexicals are in the pool here on purpose.
"""

from __future__ import annotations

import random
from collections import Counter

from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA

XSD = "http://www.w3.org/2001/XMLSchema#"
LANGSTR = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
DEFAULT = "urn:x:default"          # stands in for the store default graph

NASTY_LEX = [
    'he said "hi"', "line1\nline2", "tab\there", "back\\slash", "",
    "√unicode≤ぁ", "  padded  ", "cr\rhere", "42", "<tag>&amp;",
    "trailing space ", '"""', "a\tb\nc\rd",
]

SUBJECTS = ["http://example.org/s1", "urn:s2", "_:bs"]
PREDS = ["http://example.org/p", "urn:p2"]
GRAPHS = [None, "urn:g1", "http://example.org/g2"]
OBJECTS = (
    [("iri", "http://example.org/o"), ("iri", "urn:o2"), ("bnode", "_:bo")]
    + [("lit", lx, XSD + "string", None) for lx in NASTY_LEX]
    + [("lit", "7", XSD + "integer", None),
       ("lit", "x\ny", "urn:custom#dt", None),
       ("lit", 'q"uote', LANGSTR, "en-gb"),
       ("lit", "chat", LANGSTR, "fr")]
)


def _gen_quads(rng, n):
    rows = set()
    for _ in range(n):
        g = rng.choice(GRAPHS) or DEFAULT
        s = rng.choice(SUBJECTS)
        p = rng.choice(PREDS)
        o = rng.choice(OBJECTS)
        if o[0] == "lit":
            rows.add((g, s, p, o[1], o[2], o[3]))
        else:
            rows.add((g, s, p, o[1], None, None))
    return sorted(rows)


def _mkdf(spark, rows):
    from graphdb_free_mocha_sa_spark.model import local_quads_df
    return local_quads_df(
        spark, [(g, s, p, lex, dt, lang, None, None)
                for (g, s, p, lex, dt, lang) in rows])


def _key_set(df):
    out = Counter()
    for r in df.collect():
        dt = r["o_dt"]
        lang = r["o_lang"] or None
        out[(r["g"], r["s"], r["p"], r["o_lex"], dt, lang)] += 1
    return out


def _dump(iter_fn, df, path):
    with open(path, "w", encoding="utf-8") as fh:
        for chunk in iter_fn(df, default_graph=DEFAULT):
            fh.write(chunk)


def _roundtrip(spark, tmp_path, seed, fmt):
    from graphdb_free_mocha_sa_spark.sources.rdf import (read_jsonld,
                                                         read_nquads,
                                                         read_trig,
                                                         read_trix)
    from graphdb_free_mocha_sa_spark.sparql.results import (iter_jsonld,
                                                            iter_nquads,
                                                            iter_trig,
                                                            iter_trix)
    writers = {"nquads": (iter_nquads, "nq", read_nquads),
               "trig": (iter_trig, "trig", read_trig),
               "jsonld": (iter_jsonld, "jsonld", read_jsonld),
               "trix": (iter_trix, "trix", read_trix)}
    rng = random.Random(seed)
    rows = _gen_quads(rng, rng.randint(3, 14))
    df = _mkdf(spark, rows)
    it, ext, reader = writers[fmt]
    path = str(tmp_path / f"dump_{fmt}_{seed}.{ext}")
    _dump(it, df, path)
    back = reader(spark, path, DEFAULT)
    exp = Counter({(g, s, p, lex, dt, lang): 1
                   for (g, s, p, lex, dt, lang) in rows})
    got = _key_set(back)
    assert got == exp, (f"{fmt} seed={seed}\nmissing={exp - got}\n"
                        f"extra={got - exp}")


def test_nquads_roundtrip_fuzz(spark, tmp_path):
    for seed in range(8):
        _roundtrip(spark, tmp_path, seed, "nquads")


def test_trig_roundtrip_fuzz(spark, tmp_path):
    for seed in range(8):
        _roundtrip(spark, tmp_path, seed, "trig")


def test_jsonld_roundtrip_fuzz(spark, tmp_path):
    for seed in range(8):
        _roundtrip(spark, tmp_path, seed, "jsonld")


def test_trix_roundtrip_fuzz(spark, tmp_path):
    for seed in range(8):
        _roundtrip(spark, tmp_path, seed, "trix")
