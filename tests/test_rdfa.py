"""RDFa 1.1 reader (sources/rdfa.py) — the last Rio parse format from
the reference's rdf4j registry (pom.xml:80-90) the repo lacked. Cases
track RDFa Core 1.1 §7.5 and the HTML+RDFa 1.1 notes; the Lite subset
(vocab/typeof/property/resource) is what schema.org pages actually use."""

RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"
SCHEMA = "http://schema.org/"
FOAF = "http://xmlns.com/foaf/0.1/"


def _parse(doc, base="http://pg/"):
    from graphdb_free_mocha_sa_spark.sources.rdfa import parse_rdfa
    return list(parse_rdfa(doc, base=base))


def test_rdfa_lite_schema_org_page():
    doc = """<html><body>
    <div vocab="http://schema.org/" typeof="Person" about="#me">
      <span property="name">Alan Turing</span>
      <a property="url" href="http://turing.org/">home</a>
      <span property="jobTitle" content="Mathematician">maths person</span>
    </div></body></html>"""
    got = set(_parse(doc))
    me = "http://pg/#me"
    assert (me, RDF + "type", (SCHEMA + "Person", None, None)) in got
    assert (me, SCHEMA + "name",
            ("Alan Turing", XSD + "string", None)) in got
    # @property + @href with no rel/content ⇒ IRI object (1.1 duality)
    assert (me, SCHEMA + "url", ("http://turing.org/", None, None)) in got
    # @content wins over element text
    assert (me, SCHEMA + "jobTitle",
            ("Mathematician", XSD + "string", None)) in got


def test_prefix_curie_safe_curie_and_initial_context():
    doc = """<html><body prefix="ex: http://ex.com/ns#">
    <div about="[ex:s]">
      <span property="ex:p">v1</span>
      <span property="foaf:name">v2</span>
      <link rel="ex:link" href="rel.html"/>
    </div></body></html>"""
    got = set(_parse(doc, base="http://pg/dir/page.html"))
    s = "http://ex.com/ns#s"
    assert (s, "http://ex.com/ns#p", ("v1", XSD + "string", None)) in got
    # foaf comes from the W3C initial context without declaration
    assert (s, FOAF + "name", ("v2", XSD + "string", None)) in got
    # @href resolves like a browser would: against the page directory
    assert (s, "http://ex.com/ns#link",
            ("http://pg/dir/rel.html", None, None)) in got


def test_datatype_lang_inheritance_and_plain_override():
    doc = """<html lang="en"><body>
    <div about="http://ex/s" prefix="ex: http://ex/">
      <span property="ex:a">hello</span>
      <span property="ex:b" lang="de">hallo</span>
      <span property="ex:c" datatype="xsd:integer">42</span>
      <span property="ex:d" datatype="">not typed</span>
    </div></body></html>"""
    got = set(_parse(doc))
    s = "http://ex/s"
    assert (s, "http://ex/a", ("hello", RDF + "langString", "en")) in got
    assert (s, "http://ex/b", ("hallo", RDF + "langString", "de")) in got
    assert (s, "http://ex/c", ("42", XSD + "integer", None)) in got
    # empty @datatype forces a plain literal — but lang still applies
    assert (s, "http://ex/d",
            ("not typed", RDF + "langString", "en")) in got


def test_rel_rev_chaining_completes_incomplete_triples():
    # @rel with no resource on the same element hangs; each descendant
    # subject completes it (spec §7.5 steps 10/12)
    doc = """<html><body prefix="ex: http://ex/">
    <div about="ex:alice" rel="ex:knows">
      <div about="ex:bob"><span property="ex:name">Bob</span></div>
      <div about="ex:carol"></div>
    </div>
    <div about="ex:paper" rev="ex:wrote">
      <div about="ex:dan"></div>
    </div></body></html>"""
    got = set(_parse(doc))
    E = "http://ex/"
    assert (E + "alice", E + "knows", (E + "bob", None, None)) in got
    assert (E + "alice", E + "knows", (E + "carol", None, None)) in got
    assert (E + "bob", E + "name", ("Bob", XSD + "string", None)) in got
    # @rev inverts
    assert (E + "dan", E + "wrote", (E + "paper", None, None)) in got


def test_rel_with_resource_is_immediate():
    doc = """<html><body prefix="ex: http://ex/">
    <div about="ex:s" rel="ex:p" resource="ex:o">
      <span property="ex:inner">text</span>
    </div></body></html>"""
    got = set(_parse(doc))
    E = "http://ex/"
    assert (E + "s", E + "p", (E + "o", None, None)) in got
    # children hang off the OBJECT (parent_object = resource)
    assert (E + "o", E + "inner", ("text", XSD + "string", None)) in got


def test_typeof_without_about_mints_bnode():
    doc = """<html><body vocab="http://schema.org/">
    <div typeof="Event">
      <span property="name">PyData</span>
    </div></body></html>"""
    got = _parse(doc)
    types = [(s, o) for s, p, (o, _, _) in got if p == RDF + "type"]
    assert len(types) == 1
    bnode = types[0][0]
    assert bnode.startswith("_:")
    assert types[0][1] == SCHEMA + "Event"
    assert (bnode, SCHEMA + "name",
            ("PyData", XSD + "string", None)) in got


def test_html5_datetime_sniffing():
    doc = """<html><body prefix="ex: http://ex/">
    <div about="ex:e">
      <time property="ex:when" datetime="2026-08-15T10:30:00Z">today</time>
      <time property="ex:day" datetime="2026-08-15">today</time>
      <time property="ex:dur" datetime="P2DT3H">a while</time>
      <time property="ex:weird" datetime="whenever">?</time>
    </div></body></html>"""
    got = set(_parse(doc))
    E = "http://ex/"
    assert (E + "e", E + "when",
            ("2026-08-15T10:30:00Z", XSD + "dateTime", None)) in got
    assert (E + "e", E + "day", ("2026-08-15", XSD + "date", None)) in got
    assert (E + "e", E + "dur", ("P2DT3H", XSD + "duration", None)) in got
    # unsniffable datetime degrades to a plain literal
    assert (E + "e", E + "weird", ("whenever", XSD + "string", None)) in got


def test_base_element_and_root_subject():
    doc = """<html><head><base href="http://canonical/x"/>
    <title property="http://purl.org/dc/terms/title">T</title></head>
    </html>"""
    got = set(_parse(doc, base="http://fetched/page"))
    # <base href> overrides the retrieval IRI; title attaches to the base
    assert ("http://canonical/x", "http://purl.org/dc/terms/title",
            ("T", XSD + "string", None)) in got


def test_named_bnodes_are_document_scoped():
    doc = """<html><body prefix="ex: http://ex/">
    <div about="_:a"><span property="ex:p">1</span></div>
    <div about="_:a"><span property="ex:q">2</span></div>
    </body></html>"""
    got = _parse(doc)
    subs = {s for s, p, _ in got}
    assert len(subs) == 1 and next(iter(subs)).startswith("_:")


def test_unknown_term_without_vocab_is_ignored():
    # lax processing: a bare term with no @vocab produces nothing
    doc = """<html><body>
    <div about="http://ex/s"><span property="name">x</span></div>
    </body></html>"""
    assert _parse(doc) == []


def test_tolerant_of_real_world_html():
    # unclosed <p>, void elements, attribute case, stray close tag
    doc = """<HTML><Body Prefix="ex: http://ex/">
    <p about="ex:s"><span property="ex:p">v</span>
    <br><img src="pic.png" about="ex:s" rel="ex:depicts">
    </div></Body></HTML>"""
    got = set(_parse(doc, base="http://pg/d/page.html"))
    E = "http://ex/"
    assert (E + "s", E + "p", ("v", XSD + "string", None)) in got
    assert (E + "s", E + "depicts",
            ("http://pg/d/pic.png", None, None)) in got


def test_read_rdfa_spark_and_load(spark, tmp_path):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.sources.rdf import read_rdf_file
    from graphdb_free_mocha_sa_spark.store import QuadStore

    f = tmp_path / "page.html"
    f.write_text("""<html><body vocab="http://schema.org/">
    <div typeof="Book" about="http://ex/b1">
      <span property="name">Dune</span>
      <span property="numberOfPages" datatype="xsd:integer">412</span>
    </div></body></html>""")
    df = read_rdf_file(spark, str(f), "urn:pages")
    rows = {(r.s, r.p, r.o_lex) for r in df.collect()}
    assert ("http://ex/b1", RDF + "type", SCHEMA + "Book") in rows
    assert ("http://ex/b1", SCHEMA + "name", "Dune") in rows
    # the numeric column derives for typed literals (engine filter path)
    nums = {r.o_num for r in df.collect() if r.p == SCHEMA + "numberOfPages"}
    assert nums == {412.0}

    e = Engine(spark, QuadStore(spark))
    e.update(f"LOAD <file://{f}> INTO GRAPH <urn:pages>")
    out = e.query(
        "SELECT ?n WHERE { GRAPH <urn:pages> "
        "{ ?b a <http://schema.org/Book> ; "
        "<http://schema.org/name> ?n } }")
    assert out.df.count() == 1
