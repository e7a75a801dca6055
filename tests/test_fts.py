"""B43 full-text search: the GraphDB ``luc:`` magic-predicate surface.

Reference scope note: the benchmark template DISABLES GraphDB's FTS index
(owlim:ftsIndexPolicy "never", repo-config.ttl:36-38), but FTS is a
first-class capability of the wrapped engine; this suite pins the public
Lucene-plugin protocol (setParam/createIndex/updateIndex, per-index match
predicate, luc:score) and the documented query-syntax subset.
"""

from __future__ import annotations

import pytest

from graphdb_free_mocha_sa_spark.operators.fts import (FtsError,
                                                       parse_fts_query)

LUC = "PREFIX luc: <http://www.ontotext.com/owlim/lucene#>\n"


def _engine(spark):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng = Engine(spark, QuadStore(spark))
    eng.update("""INSERT DATA {
      <urn:d1> <urn:title> "Spark analytics engine" .
      <urn:d1> <urn:body> "distributed query processing with spark" .
      <urn:d2> <urn:title> "Cooking with fire" .
      <urn:d2> <urn:body> "recipes for slow cooking" .
      <urn:d3> <urn:title> "Spark plugs and engines" .
      <urn:d4> <urn:ref> <urn:d1> .
    }""")
    eng.update(LUC + 'INSERT DATA { luc:idx luc:createIndex "true" }')
    return eng


# ------------------------------------------------------------ query parsing

def test_parse_default_or_and_required():
    s = parse_fts_query("alpha beta")
    assert s["optional"] == ["alpha", "beta"] and not s["required"]
    s = parse_fts_query("alpha AND beta")
    assert sorted(s["required"]) == ["alpha", "beta"] and not s["optional"]
    s = parse_fts_query("+alpha beta -gamma")
    assert s["required"] == ["alpha"] and s["optional"] == ["beta"] \
        and s["prohibited"] == ["gamma"]


def test_parse_phrase_and_prefix():
    s = parse_fts_query('"slow cooking" spar*')
    assert s["phrases"] == [["slow", "cooking"]]
    assert s["opt_prefixes"] == ["spar"]


@pytest.mark.parametrize("bad", ["field:value", "(group)", "mid*dle",
                                 "wild?card", "", '"a b"~2', "legacy~0.8",
                                 "deep~3", "wild*~1", "nonnum^x",
                                 'stray"quote'])
def test_parse_unsupported_syntax_raises(bad):
    with pytest.raises(FtsError):
        parse_fts_query(bad)


def test_parse_fuzzy_boost_range():
    """r11 Lucene-subset growth: fuzzy ~N (default 2), ^B boosts keyed by
    the component's qterm label, [lo TO hi] ranges with mixed brackets
    and * open bounds, and prohibited phrases."""
    s = parse_fts_query('merge~1^2 +cook~ "slow cooking"^3 '
                        '[data TO dave}^1.5 -spark* -"bad phrase" -zz~1')
    assert s["opt_fuzzy"] == [("merge", 1)]
    assert s["req_fuzzy"] == [("cook", 2)]      # ~ alone = maxEdits 2
    assert s["pro_fuzzy"] == [("zz", 1)]
    assert s["opt_ranges"] == [("data", "dave", True, False)]
    assert s["pro_phrases"] == [["bad", "phrase"]]
    assert s["pro_prefixes"] == ["spark"]
    assert s["boosts"] == {"merge~1": 2.0, '"slow cooking"': 3.0,
                           "[data TO dave}": 1.5}
    s = parse_fts_query("alpha AND beta~1 {aa TO *]")
    assert s["req_fuzzy"] == [("beta", 1)]      # AND retargets fuzzy too
    assert s["req_ranges"] == [("aa", "*", False, True)]


# ------------------------------------------------------------- end to end

def test_match_and_score_ordering(spark):
    eng = _engine(spark)
    res = eng.query(LUC + """
        SELECT ?s ?sc WHERE { ?s luc:idx "spark AND engine*" .
                              ?s luc:score ?sc }
        ORDER BY DESC(?sc) ?s""")
    rows = res.finalize({"s": "str", "sc": "num"}).collect()
    assert [r["s"] for r in rows] == ["urn:d3", "urn:d1"]
    assert rows[0]["sc"] > 0 and rows[1]["sc"] > 0


def test_phrase_and_prohibited(spark):
    eng = _engine(spark)
    rows = eng.query(LUC + """
        SELECT ?s WHERE { ?s luc:idx '"slow cooking" -spark' }""") \
        .finalize({"s": "str"}).collect()
    assert [r["s"] for r in rows] == ["urn:d2"]


def test_match_joins_plain_bgp(spark):
    eng = _engine(spark)
    rows = eng.query(LUC + """
        SELECT ?s ?t WHERE { ?s luc:idx "cooking" . ?s <urn:title> ?t }""") \
        .finalize({"s": "str", "t": "str"}).collect()
    assert [(r["s"], r["t"]) for r in rows] == [("urn:d2",
                                                 "Cooking with fire")]


def test_or_semantics_default(spark):
    eng = _engine(spark)
    rows = eng.query(LUC + """
        SELECT ?s WHERE { ?s luc:idx "fire distributed" } ORDER BY ?s""") \
        .finalize({"s": "str"}).collect()
    assert [r["s"] for r in rows] == ["urn:d1", "urn:d2"]


def test_index_is_snapshot_until_update_index(spark):
    eng = _engine(spark)
    eng.update('INSERT DATA { <urn:d9> <urn:title> "spark ignition" . }')
    q = LUC + 'SELECT ?s WHERE { ?s luc:idx "ignition" }'
    assert eng.query(q).df.count() == 0          # stale by design
    eng.update(LUC + 'INSERT DATA { luc:idx luc:updateIndex "true" }')
    assert eng.query(q).df.count() == 1          # plan cache invalidated too


def test_include_predicates_param(spark):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng = Engine(spark, QuadStore(spark))
    eng.update("""INSERT DATA {
      <urn:a> <urn:title> "visible words" .
      <urn:a> <urn:secret> "hidden words" . }""")
    eng.update(LUC + """INSERT DATA {
      luc:includePredicates luc:setParam "urn:title" .
      luc:scoped luc:createIndex "true" }""")
    hit = eng.query(LUC + 'SELECT ?s WHERE { ?s luc:scoped "visible" }')
    miss = eng.query(LUC + 'SELECT ?s WHERE { ?s luc:scoped "hidden" }')
    assert hit.df.count() == 1 and miss.df.count() == 0


def test_control_triples_are_consumed_not_stored(spark):
    eng = _engine(spark)
    rows = eng.query("""SELECT ?s ?p ?o WHERE { ?s ?p ?o .
        FILTER(STRSTARTS(STR(?p), "http://www.ontotext.com/owlim/lucene#"))
    }""").df.collect()
    assert rows == []


def test_unknown_index_sentinels_not_crashes(spark):
    eng = _engine(spark)
    out = eng.query_json(LUC + 'SELECT ?s WHERE { ?s luc:missing "x" }')
    assert '"xxx"' in out            # A13 error sentinel shape


def test_constant_subject_gate(spark):
    eng = _engine(spark)
    y = eng.query(LUC + 'ASK { <urn:d2> luc:idx "cooking" }')
    n = eng.query(LUC + 'ASK { <urn:d3> luc:idx "cooking" }')
    assert y is True and n is False


def test_literals_only_uris_never_match(spark):
    # d4 has only an IRI object; ftsLiteralsOnly semantics exclude it
    eng = _engine(spark)
    rows = eng.query(LUC + 'SELECT ?s WHERE { ?s luc:idx "d1" }') \
        .df.collect()
    assert rows == []


def test_fts_index_survives_store_reopen(spark, tmp_path):
    """GraphDB's FTS index is durable; the DurableQuadStore persists the
    doc + token tables as parquet with an atomically-renamed registry and
    re-registers them on open."""
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import DurableQuadStore
    path = str(tmp_path / "store")
    eng = Engine(spark, DurableQuadStore(spark, path))
    eng.update('INSERT DATA { <urn:d1> <urn:title> "durable spark facts" . }')
    eng.update(LUC + 'INSERT DATA { luc:idx luc:createIndex "true" }')
    q = LUC + 'SELECT ?s WHERE { ?s luc:idx "durable" }'
    assert eng.query(q).df.count() == 1

    eng2 = Engine(spark, DurableQuadStore(spark, path))   # fresh open
    rows = eng2.query(q).finalize({"s": "str"}).collect()
    assert [r["s"] for r in rows] == ["urn:d1"]


def test_bm25_scores_match_closed_form(spark):
    """Hand-computed single-term BM25 over the 3-doc literal corpus."""
    import math
    eng = _engine(spark)
    rows = eng.query(LUC + """
        SELECT ?s ?sc WHERE { ?s luc:idx "cooking" . ?s luc:score ?sc }""") \
        .finalize({"s": "str", "sc": "num"}).collect()
    assert len(rows) == 1 and rows[0]["s"] == "urn:d2"
    # corpus: d1 dl=8, d2 dl=7, d3 dl=4 -> N=3, avgdl=19/3; cooking tf=2
    n, df_t, tf, dl, avgdl = 3, 1, 2, 7, 19 / 3
    idf = math.log(1 + (n - df_t + 0.5) / (df_t + 0.5))
    expect = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
    assert abs(rows[0]["sc"] - expect) < 1e-4


# --------------------------------------------------- r10 advisor-fix pins

def test_prohibited_prefix_excludes_expansions(spark):
    """r10 advisor fix: ``-spark*`` used to degrade to the exact
    prohibited term 'spark', so a doc containing only 'sparkling'
    escaped the exclusion."""
    s = parse_fts_query("cooking -spark*")
    assert s["pro_prefixes"] == ["spark"] and not s["prohibited"]
    eng = _engine(spark)
    eng.update('INSERT DATA { <urn:d5> <urn:body> '
               '"sparkling water cooking" . }')
    eng.update(LUC + 'INSERT DATA { luc:idx luc:updateIndex "true" }')
    rows = eng.query(LUC + """
        SELECT ?s WHERE { ?s luc:idx "cooking -spark*" }""") \
        .finalize({"s": "str"}).collect()
    assert [r["s"] for r in rows] == ["urn:d2"]


def test_unknown_setparam_name_raises(spark):
    """r10 advisor fix: _KNOWN_PARAMS was dead code — a typoed parameter
    (luc:analyser) was silently accepted-and-ignored."""
    eng = _engine(spark)
    with pytest.raises(FtsError, match="unknown luc:setParam"):
        eng.update(LUC + 'INSERT DATA { luc:analyser luc:setParam "x" }')


def test_unsupported_analyzer_raises_at_setparam(spark):
    """An unimplemented analyzer must raise, not be silently ignored —
    and since r11 it raises at SETPARAM time (before the value can be
    staged at all; EnglishAnalyzer graduated to supported, so the
    unsupported probe uses GermanAnalyzer)."""
    eng = _engine(spark)
    with pytest.raises(FtsError, match="analyzer"):
        eng.update(LUC + '''INSERT DATA { luc:analyzer luc:setParam
            "org.apache.lucene.analysis.de.GermanAnalyzer" }''')
    # nothing staged: a later default-analyzer build works
    eng.update(LUC + 'INSERT DATA { luc:idx2 luc:createIndex "true" }')
    assert eng.store._fts_params == {}


def test_default_analyzer_value_accepted(spark):
    eng = _engine(spark)
    eng.update(LUC + '''INSERT DATA { luc:analyzer luc:setParam
        "org.apache.lucene.analysis.standard.StandardAnalyzer" }''')
    eng.update(LUC + 'INSERT DATA { luc:std luc:createIndex "true" }')
    assert eng.query(LUC + 'SELECT ?s WHERE { ?s luc:std "cooking" }') \
        .df.count() == 1


def test_luc_predicate_rejected_in_templated_insert(spark):
    """r10 advisor fix: INSERT ... WHERE could STORE luc:-namespace
    triples, which the BGP translator then hijacks as magic predicates —
    stored data and the FTS surface diverged. Constant predicates reject
    statically; variable predicates via a bounded probe."""
    eng = _engine(spark)
    with pytest.raises(FtsError, match="INSERT DATA"):
        eng.update(LUC +
                   'INSERT { luc:other luc:createIndex "true" } WHERE { }')
    with pytest.raises(FtsError, match="INSERT DATA"):
        eng.update('''INSERT { <urn:s> ?p "x" } WHERE {
            BIND(<http://www.ontotext.com/owlim/lucene#idx> AS ?p) }''')


def test_luc_predicate_rejected_in_load(spark, tmp_path):
    eng = _engine(spark)
    nt = tmp_path / "luc.nt"
    nt.write_text('<urn:a> <http://www.ontotext.com/owlim/lucene#idx> '
                  '"sneaky" .\n')
    with pytest.raises(FtsError, match="INSERT DATA"):
        eng.update(f'LOAD <file://{nt}>')


def test_phrase_tf_exact_occurrence_count(spark):
    """r10 fuzzer fix: a single phrase occurrence must score tf=1 — the
    old replace-length formula gave 2 (and undercounted occurrences that
    share a sentinel space). Verified against closed-form BM25."""
    import math

    from graphdb_free_mocha_sa_spark.operators.fts import (fts_match,
                                                           index_from_docs)
    docs = spark.createDataFrame(
        [("urn:p1",
          "slow cooking now and slow cooking slow cooking later"),
         ("urn:p2", "slow cooking")], "node string, text string")
    idx = index_from_docs(spark, docs)
    rows = {r["node"]: r["score"]
            for r in fts_match(spark, idx, '"slow cooking"').collect()}
    n, k1, b = 2, 1.2, 0.75
    idf = math.log(1 + n)
    avgdl = (9 + 2) / 2

    def bm25(tf, dl):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))

    assert abs(rows["urn:p1"] - bm25(3, 9)) < 1e-4   # occurrences 0,4,6
    assert abs(rows["urn:p2"] - bm25(1, 2)) < 1e-4   # exactly one

    # overlapping-adjacent occurrences both count ("a b a" at 0 AND 2)
    idx2 = index_from_docs(spark, spark.createDataFrame(
        [("urn:q", "a b a b a")], "node string, text string"))
    r2 = {r["node"]: r["score"]
          for r in fts_match(spark, idx2, '"a b a"').collect()}
    assert abs(r2["urn:q"]
               - math.log(2) * 2 * 2.2 / (2 + 1.2 * 1.0)) < 1e-4


def test_duplicate_phrase_satisfiable(spark):
    """r10 fuzzer fix: '"a b" "a b"' folds to one qterm in the match
    aggregation, so counting each repetition toward n_required made the
    query unsatisfiable; parse now dedupes phrases."""
    from graphdb_free_mocha_sa_spark.operators.fts import (fts_match,
                                                           index_from_docs)
    s = parse_fts_query('"slow cooking" "slow cooking"')
    assert s["phrases"] == [["slow", "cooking"]]
    idx = index_from_docs(spark, spark.createDataFrame(
        [("urn:p2", "slow cooking")], "node string, text string"))
    got = {r["node"] for r in
           fts_match(spark, idx, '"slow cooking" "slow cooking"').collect()}
    assert got == {"urn:p2"}


# --------------------------------------- EnglishAnalyzer (r11, B43)

def _english_engine(spark):
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import QuadStore
    eng = Engine(spark, QuadStore(spark))
    eng.update("""INSERT DATA {
      <urn:d1> <urn:body> "the cook was cooking spiced dishes" .
      <urn:d2> <urn:body> "a cooked dish cools quickly" .
      <urn:d3> <urn:body> "sparkling engines and plugs" .
    }""")
    eng.update(LUC + '''INSERT DATA {
      luc:analyzer luc:setParam "org.apache.lucene.analysis.en.EnglishAnalyzer" .
      luc:en luc:createIndex "true" }''')
    return eng


def test_porter_known_vectors():
    from graphdb_free_mocha_sa_spark.operators.porter import porter_stem
    vectors = {"caresses": "caress", "ponies": "poni", "ties": "ti",
               "cats": "cat", "agreed": "agre", "plastered": "plaster",
               "motoring": "motor", "conflated": "conflat",
               "hopping": "hop", "filing": "file", "happy": "happi",
               "sky": "sky", "relational": "relat", "digitizer": "digit",
               "vietnamization": "vietnam", "operator": "oper",
               "decisiveness": "decis", "triplicate": "triplic",
               "electriciti": "electr", "adjustable": "adjust",
               "replacement": "replac", "adoption": "adopt",
               "activate": "activ", "effective": "effect", "rate": "rate",
               "cease": "ceas", "controll": "control", "roll": "roll",
               "generalizations": "gener", "oscillators": "oscil"}
    assert {w: porter_stem(w) for w in vectors} == vectors


def test_english_analyzer_stemmed_match(spark):
    """'cooking', 'cooked' and 'cook' all stem to 'cook': a query in one
    form matches documents in the others."""
    eng = _english_engine(spark)
    res = eng.query(LUC + 'SELECT ?s WHERE { ?s luc:en "cooking" } ORDER BY ?s')
    rows = res.finalize({"s": "str"}).collect()
    assert [r["s"] for r in rows] == ["urn:d1", "urn:d2"]


def test_english_analyzer_stopwords_dropped(spark):
    """Stop words vanish at index AND query time: they are never required
    and a stop-word-only query raises matches-nothing."""
    from graphdb_free_mocha_sa_spark.operators.fts import FtsError
    eng = _english_engine(spark)
    # "the" is a stop word: "dish AND the" must behave like "dish"
    res = eng.query(LUC + 'SELECT ?s WHERE { ?s luc:en "dish AND the" } ORDER BY ?s')
    assert [r["s"] for r in res.finalize({"s": "str"}).collect()] \
        == ["urn:d1", "urn:d2"]
    with pytest.raises(FtsError, match="matches nothing"):
        eng.query(LUC + 'SELECT ?s WHERE { ?s luc:en "the was and" }').df.count()


def test_english_analyzer_phrase_stemmed(spark):
    """Phrase tokens are analyzed too: '"cooking spiced dish"' matches the
    stemmed index positions of 'cooking spiced dishes'."""
    eng = _english_engine(spark)
    res = eng.query(LUC + 'SELECT ?s WHERE { ?s luc:en "\\"cooking spiced dish\\"" }')
    assert [r["s"] for r in res.finalize({"s": "str"}).collect()] == ["urn:d1"]


def test_english_analyzer_prefix_not_stemmed(spark):
    """Lucene wildcard terms skip analysis: 'spark*' matches the stemmed
    index term 'sparkl' (from 'sparkling') literally by prefix."""
    eng = _english_engine(spark)
    res = eng.query(LUC + 'SELECT ?s WHERE { ?s luc:en "spark*" }')
    assert [r["s"] for r in res.finalize({"s": "str"}).collect()] == ["urn:d3"]


def test_english_analyzer_survives_reopen(spark, tmp_path):
    """The analyzer choice persists with the index: a reopened store still
    stems queries against the persisted english index."""
    from graphdb_free_mocha_sa_spark.engine import Engine
    from graphdb_free_mocha_sa_spark.store import DurableQuadStore
    store = DurableQuadStore(spark, str(tmp_path / "db"))
    eng = Engine(spark, store)
    eng.update('INSERT DATA { <urn:d1> <urn:body> "cooking dishes" . }')
    eng.update(LUC + '''INSERT DATA {
      luc:analyzer luc:setParam "org.apache.lucene.analysis.en.EnglishAnalyzer" .
      luc:en luc:createIndex "true" }''')
    eng2 = Engine(spark, DurableQuadStore(spark, str(tmp_path / "db")))
    res = eng2.query(LUC + 'SELECT ?s WHERE { ?s luc:en "cooked" }')
    assert [r["s"] for r in res.finalize({"s": "str"}).collect()] == ["urn:d1"]
