"""Round-7 Rio format family: N3, TriX, RDF/JSON, binary RDF — the last
serializations the reference's rdf4j-runtime Rio registry (pom.xml:80-90)
parses that the repo did not. Readers + writers + LOAD dispatch +
Engine.export_to round-trips."""

import random

import pytest

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
OWL = "http://www.w3.org/2002/07/owl#"
LOG = "http://www.w3.org/2000/10/swap/log#"


# ---------------------------------------------------------------- N3 ----

def test_n3_shorthands_and_paths():
    from graphdb_free_mocha_sa_spark.sources.turtle import parse_n3

    doc = """
    @prefix : <http://ex/> .
    @keywords a, is, of .
    :x = :y .
    :p1 => :p2 .
    :q1 <= :q2 .
    :child is :parentOf of :dad .
    :dad has :age 42 .
    :s :p :o!:q .
    :s2 :p2 :o2^:r .
    """
    got = set()
    bnode_of = {}
    for s, p, (lex, dt, lang) in parse_n3(doc):
        # normalize generated bnodes for assertion stability
        for t in (s, lex):
            if t.startswith("_:") and t not in bnode_of:
                bnode_of[t] = f"_:n{len(bnode_of)}"
        got.add((bnode_of.get(s, s), p, bnode_of.get(lex, lex), dt))
    E = "http://ex/"
    assert (E + "x", OWL + "sameAs", E + "y", None) in got
    assert (E + "p1", LOG + "implies", E + "p2", None) in got
    # <= inverts
    assert (E + "q2", LOG + "implies", E + "q1", None) in got
    # is ... of inverts
    assert (E + "dad", E + "parentOf", E + "child", None) in got
    assert (E + "dad", E + "age", "42", XSD + "integer") in got
    # paths mint fresh bnodes: s :p [b], o :q [b] -- b shared
    assert (E + "s", E + "p", "_:n0", None) in got
    assert (E + "o", E + "q", "_:n0", None) in got
    assert ("_:n1", E + "r", E + "o2", None) in got
    assert (E + "s2", E + "p2", "_:n1", None) in got


def test_n3_honest_rejections():
    from graphdb_free_mocha_sa_spark.sources.turtle import parse_n3

    for bad, frag in [
        ("{ <urn:a> <urn:b> <urn:c> } => <urn:d> .", "formulas"),
        ("<urn:a> <urn:b> { <urn:c> <urn:d> <urn:e> } .", "formulas"),
        ("@forAll <urn:x> .", "quantification"),
        ("@forSome <urn:x> .", "quantification"),
        ("@keywords foo . <urn:a> <urn:b> <urn:c> .", "keywords"),
        ('<urn:s> <urn:p> "lit"!<urn:q> .', "literal"),
        ('"lit" is <urn:p> of <urn:o> .', "subject"),
        ('<urn:s> is <urn:p> of "lit" .', "literal"),
    ]:
        with pytest.raises(ValueError) as e:
            list(parse_n3(bad))
        # honest, descriptive errors (a couple surface as generic
        # tokenizer/subject errors -- also fine, still hard failures)
        assert frag in str(e.value).lower() or "turtle" in str(e.value)


def test_n3_is_turtle_superset():
    """Every Turtle construct parses identically through the N3 grammar."""
    from graphdb_free_mocha_sa_spark.sources.turtle import (parse_n3,
                                                            parse_turtle)
    doc = """
    @prefix ex: <http://e/> .
    @base <http://base/> .
    ex:s ex:p "v"^^<http://dt> , [ ex:q 1.5 ] ; ex:r true .
    <rel> a ex:T ; ex:list ( 1 2 3 ) .
    _:b ex:lang "bonjour"@fr .
    """
    a = sorted(parse_turtle(doc))
    b = sorted(parse_n3(doc))
    # generated bnode COUNTERS line up (same grammar walk), so the
    # sequences are directly comparable
    assert a == b


def test_read_n3_spark_and_load(spark, tmp_path):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.sources.rdf import read_rdf_file
    from graphdb_free_mocha_sa_spark.store import QuadStore

    f = tmp_path / "data.n3"
    f.write_text("@prefix : <http://ex/> .\n"
                 ":x = :y .\n:dad has :age 42 .\n"
                 ":child is :parentOf of :dad .\n")
    df = read_rdf_file(spark, str(f), "urn:gr")
    rows = {(r.s, r.p, r.o_lex) for r in df.collect()}
    assert ("http://ex/x", OWL + "sameAs", "http://ex/y") in rows
    assert ("http://ex/dad", "http://ex/parentOf", "http://ex/child") in rows
    assert df.filter("o_num = 42.0").count() == 1

    e = Engine(spark, QuadStore(spark))
    e.update(f"LOAD <file://{f}> INTO GRAPH <urn:n3>")
    out = e.query("SELECT ?s WHERE { GRAPH <urn:n3> "
                  "{ ?s <http://ex/age> 42 } }")
    assert out.df.count() == 1


# -------------------------------------------------------------- TriX ----

def test_trix_reader_shapes():
    from graphdb_free_mocha_sa_spark.sources.trix import parse_trix

    doc = """<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">
     <graph><uri>urn:g</uri>
      <triple><uri>urn:s</uri><uri>urn:p</uri>
              <plainLiteral xml:lang="EN">hi</plainLiteral></triple>
      <triple><id>b0</id><uri>urn:p</uri>
              <typedLiteral datatype="urn:dt">5</typedLiteral></triple>
     </graph>
     <graph><triple><uri>urn:s2</uri><uri>urn:p2</uri>
            <uri>urn:o2</uri></triple></graph>
    </TriX>"""
    got = list(parse_trix(doc))
    assert ("urn:g", "urn:s", "urn:p",
            ("hi", RDF + "langString", "en")) in got
    assert ("urn:g", "_:b0", "urn:p", ("5", "urn:dt", None)) in got
    assert (None, "urn:s2", "urn:p2", ("urn:o2", None, None)) in got

    with pytest.raises(ValueError):
        list(parse_trix("<notTriX/>"))
    with pytest.raises(ValueError):
        list(parse_trix(
            '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">'
            "<graph><triple><uri>urn:s</uri><uri>urn:p</uri>"
            "</triple></graph></TriX>"))  # 2 terms


def test_trix_writer_roundtrip_fuzz(spark):
    """Quad frame → TriX → parse_trix over adversarial literals (XML
    metacharacters, quotes, unicode), named + default graphs."""
    from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA
    from graphdb_free_mocha_sa_spark.sources.trix import parse_trix
    from graphdb_free_mocha_sa_spark.sparql.results import iter_trix
    from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH

    rng = random.Random(7)
    alphabet = list("ab<>&\"' \t\n]]>") + ["é", "中", "🚀"]

    def nasty():
        return "".join(rng.choice(alphabet)
                       for _ in range(rng.randint(1, 16)))

    graphs = [DEFAULT_GRAPH, "urn:g:one", "urn:g:two"]
    rows = []
    for i in range(60):
        g = graphs[i % len(graphs)]
        kind = i % 4
        if kind == 0:
            rows.append((g, f"urn:s{i}", "urn:p", nasty(),
                         XSD + "string", None, None, None))
        elif kind == 1:
            rows.append((g, f"_:b{i}", "urn:p", nasty(),
                         RDF + "langString", "fr", None, None))
        elif kind == 2:
            rows.append((g, f"urn:s{i}", "urn:p", nasty(),
                         "urn:custom", None, None, None))
        else:
            rows.append((g, f"urn:s{i}", "urn:p", f"urn:o{i}",
                         None, None, None, None))
    df = spark.createDataFrame(rows, QUAD_SCHEMA)
    doc = "".join(iter_trix(df, default_graph=DEFAULT_GRAPH))
    back = {(g if g is not None else DEFAULT_GRAPH, s, p, lex, dt, lang)
            for g, s, p, (lex, dt, lang) in parse_trix(doc)}
    want = {(g, s, p, o_lex, o_dt, o_lang)
            for g, s, p, o_lex, o_dt, o_lang, *_ in rows}
    assert back == want, (sorted(want - back)[:3], sorted(back - want)[:3])


def test_read_trix_spark_dispatch(spark, tmp_path):
    from graphdb_free_mocha_sa_spark.sources.rdf import read_rdf_file

    f = tmp_path / "d.trix"
    f.write_text(
        '<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">'
        "<graph><uri>urn:gx</uri>"
        "<triple><uri>urn:s</uri><uri>urn:p</uri>"
        '<typedLiteral datatype="http://www.w3.org/2001/XMLSchema#integer">'
        "7</typedLiteral></triple></graph>"
        "<graph><triple><uri>urn:s2</uri><uri>urn:p</uri>"
        "<uri>urn:o</uri></triple></graph></TriX>")
    df = read_rdf_file(spark, str(f), "urn:default")
    rows = {(r.g, r.s, r.o_lex, r.o_num) for r in df.collect()}
    assert ("urn:gx", "urn:s", "7", 7.0) in rows
    assert ("urn:default", "urn:s2", "urn:o", None) in rows


# ----------------------------------------------------------- RDF/JSON ----

def test_rdfjson_reader_and_writer_roundtrip(spark):
    from graphdb_free_mocha_sa_spark.model import QUAD_SCHEMA
    from graphdb_free_mocha_sa_spark.sources.rdfjson import parse_rdfjson
    from graphdb_free_mocha_sa_spark.sparql.results import iter_rdfjson

    rng = random.Random(13)
    alphabet = list('ab"\\{}[]:, \n') + ["é", "🚀"]

    def nasty():
        return "".join(rng.choice(alphabet)
                       for _ in range(rng.randint(1, 12)))

    rows = []
    for i in range(50):
        kind = i % 4
        s = f"_:b{i}" if i % 5 == 0 else f"urn:s{i % 7}"
        if kind == 0:
            rows.append((None, s, f"urn:p{i % 3}", nasty(),
                         XSD + "string", None, None, None))
        elif kind == 1:
            rows.append((None, s, f"urn:p{i % 3}", nasty(),
                         RDF + "langString", "de", None, None))
        elif kind == 2:
            rows.append((None, s, f"urn:p{i % 3}", nasty(),
                         "urn:dtx", None, None, None))
        else:
            rows.append((None, s, f"urn:p{i % 3}", f"urn:o{i}",
                         None, None, None, None))
    df = spark.createDataFrame(rows, QUAD_SCHEMA)
    doc = "".join(iter_rdfjson(df))
    back = {(s, p, lex, dt, lang)
            for s, p, (lex, dt, lang) in parse_rdfjson(doc)}
    want = {(s, p, o_lex, o_dt, o_lang)
            for _, s, p, o_lex, o_dt, o_lang, *_ in rows}
    assert back == want, (sorted(want - back)[:3], sorted(back - want)[:3])


def test_read_rdfjson_spark_dispatch(spark, tmp_path):
    from graphdb_free_mocha_sa_spark.sources.rdf import read_rdf_file

    f = tmp_path / "d.rj"
    f.write_text('{"urn:s": {"urn:p": ['
                 '{"value": "4", "type": "literal", '
                 '"datatype": "http://www.w3.org/2001/XMLSchema#integer"},'
                 '{"value": "b9", "type": "bnode"}]}}')
    df = read_rdf_file(spark, str(f), "urn:gj")
    rows = {(r.g, r.s, r.o_lex, r.o_num) for r in df.collect()}
    assert ("urn:gj", "urn:s", "4", 4.0) in rows
    assert ("urn:gj", "urn:s", "_:b9", None) in rows


# --------------------------------------------------------- binary RDF ----

def test_binaryrdf_roundtrip_adversarial():
    from graphdb_free_mocha_sa_spark.sources.binaryrdf import (
        parse_binaryrdf, write_footer, write_header, write_statement)

    quads = [
        (None, "urn:s", "urn:p", ("urn:o", None, None)),
        ("urn:g", "_:b1", "urn:p", ("nul\x00here", XSD + "string", None)),
        ("urn:g", "urn:s", "urn:p",
         ("emoji \U0001F600 pair \U0010FFFF", RDF + "langString", "en")),
        (None, "urn:s", "urn:p", ("42", XSD + "integer", None)),
        (None, "urn:s", "urn:p", ("", XSD + "string", None)),
        (None, "urn:s", "urn:p", ("é中߿￿", "urn:dt", None)),
    ]
    buf = write_header()
    for g, s, p, (lex, dt, lang) in quads:
        buf += write_statement(g, s, p, lex, dt, lang)
    buf += write_footer()
    assert list(parse_binaryrdf(buf)) == quads


def test_binaryrdf_dictionary_and_guards():
    import struct

    from graphdb_free_mocha_sa_spark.sources.binaryrdf import (
        COMMENT, END_OF_DATA, NAMESPACE_DECL, STATEMENT, URI_VALUE,
        VALUE_DECL, VALUE_REF, _write_utf, parse_binaryrdf, write_header,
        write_statement)

    # hand-built doc exercising the reader-side records the inline-only
    # writer never emits: namespace decls, comments, value dictionary
    buf = bytearray(write_header())
    buf += bytes((NAMESPACE_DECL,)) + _write_utf("ex") \
        + _write_utf("http://ex/")
    buf += bytes((COMMENT,)) + _write_utf("a comment")
    buf += bytes((VALUE_DECL,)) + struct.pack(">i", 7) \
        + bytes((URI_VALUE,)) + _write_utf("urn:shared")
    buf += bytes((STATEMENT,))
    buf += bytes((VALUE_REF,)) + struct.pack(">i", 7)          # s
    buf += bytes((URI_VALUE,)) + _write_utf("urn:p")           # p
    buf += bytes((VALUE_REF,)) + struct.pack(">i", 7)          # o
    buf += bytes((0,))                                         # g NULL
    buf += bytes((END_OF_DATA,))
    got = list(parse_binaryrdf(bytes(buf)))
    assert got == [(None, "urn:shared", "urn:p",
                    ("urn:shared", None, None))]

    # undeclared ref
    bad = bytearray(write_header())
    bad += bytes((STATEMENT,)) + bytes((VALUE_REF,)) \
        + struct.pack(">i", 99)
    with pytest.raises(ValueError, match="undeclared"):
        list(parse_binaryrdf(bytes(bad)))

    # wrong magic / version
    with pytest.raises(ValueError, match="magic"):
        list(parse_binaryrdf(b"XXXX\x00\x00\x00\x01\x7f"))
    with pytest.raises(ValueError, match="version"):
        list(parse_binaryrdf(b"BRDF\x00\x00\x00\x63\x7f"))

    # writeUTF frame bound is an honest error, not silent truncation
    with pytest.raises(ValueError, match="65535"):
        write_statement(None, "urn:s", "urn:p", "x" * 70000,
                        XSD + "string", None)


def test_binaryrdf_spark_reader_and_export(spark, tmp_path):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.sources.binaryrdf import (
        parse_binaryrdf)
    from graphdb_free_mocha_sa_spark.sources.rdf import read_rdf_file
    from graphdb_free_mocha_sa_spark.store import QuadStore

    e = Engine(spark, QuadStore(spark))
    e.update('INSERT DATA { <urn:a> <urn:p> "v" . '
             "GRAPH <urn:g1> { <urn:b> <urn:q> 5 } }")
    chunks = []
    e.export_to(chunks.append, fmt="binaryrdf")
    blob = b"".join(chunks)
    quads = set(parse_binaryrdf(blob))
    assert (None, "urn:a", "urn:p", ("v", XSD + "string", None)) in quads
    assert ("urn:g1", "urn:b", "urn:q",
            ("5", XSD + "integer", None)) in quads

    f = tmp_path / "dump.brf"
    f.write_bytes(blob)
    df = read_rdf_file(spark, str(f), "urn:default")
    rows = {(r.g, r.s, r.o_lex, r.o_num) for r in df.collect()}
    assert ("urn:default", "urn:a", "v", None) in rows
    assert ("urn:g1", "urn:b", "5", 5.0) in rows

    # and back through LOAD
    e2 = Engine(spark, QuadStore(spark))
    e2.update(f"LOAD <file://{f}>")
    assert e2.query("SELECT ?s WHERE { GRAPH <urn:g1> "
                    "{ ?s <urn:q> 5 } }").df.count() == 1


# ------------------------------------------------- export_to coverage ----

def test_engine_export_to_trix_and_rdfjson(spark):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.sources.rdfjson import parse_rdfjson
    from graphdb_free_mocha_sa_spark.sources.trix import parse_trix
    from graphdb_free_mocha_sa_spark.store import QuadStore

    e = Engine(spark, QuadStore(spark))
    e.update('INSERT DATA { <urn:a> <urn:p> "v" . '
             "GRAPH <urn:g1> { <urn:b> <urn:q> 5 } }")

    out = []
    e.export_to(out.append, fmt="trix")
    quads = set()
    for g, s, p, (lex, dt, lang) in parse_trix("".join(out)):
        quads.add((g, s, p, lex))
    assert (None, "urn:a", "urn:p", "v") in quads
    assert ("urn:g1", "urn:b", "urn:q", "5") in quads

    out = []
    e.export_to(out.append, fmt="rdfjson")
    triples = {(s, p, lex)
               for s, p, (lex, dt, lang) in parse_rdfjson("".join(out))}
    # graph names drop (format has no slot) -- both triples present
    assert ("urn:a", "urn:p", "v") in triples
    assert ("urn:b", "urn:q", "5") in triples
