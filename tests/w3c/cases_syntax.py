"""W3C conformance corpus — syntax tests.

Source: shapes of the rdf-tests sparql11 syntax-query family
(transcribed): positive cases must parse, negative cases must be
rejected (at parse or static-analysis time).
"""


def _pos(name, src, q):
    return {"name": name, "source": src, "query": q, "syntax": "pos"}


def _neg(name, src, q):
    return {"name": name, "source": src, "query": q, "syntax": "neg"}


CASES = [
    _pos("select-star", "rdf-tests syntax-query (transcribed)",
         "SELECT * WHERE { ?s ?p ?o }"),
    _pos("prefixed-names", "rdf-tests syntax-query (transcribed)",
         "PREFIX : <http://example/>\nSELECT * WHERE { :s :p :o }"),
    _pos("keywords-case-insensitive", "rdf-tests syntax-query (transcribed)",
         "select * where { ?s ?p ?o }"),
    _pos("numbers-shorthand", "rdf-tests syntax-query (transcribed)",
         "SELECT * WHERE { ?s ?p 1 . ?s ?p 1.5 . ?s ?p 1e0 . "
         "?s ?p true . ?s ?p -2 }"),
    _pos("semicolon-comma-lists", "rdf-tests syntax-query (transcribed)",
         "PREFIX : <http://example/>\n"
         "SELECT * WHERE { :s :p :o1, :o2 ; :q :o3 . }"),
    _pos("blank-node-property-list", "rdf-tests syntax-query (transcribed)",
         "PREFIX : <http://example/>\n"
         "SELECT * WHERE { [ :p :o ] :q ?x }"),
    _pos("optional-filter-nested", "rdf-tests syntax-query (transcribed)",
         "PREFIX : <http://example/>\nSELECT * WHERE "
         "{ ?s :p ?o OPTIONAL { ?s :q ?w FILTER(?w != :z) } }"),
    _pos("trailing-dot-optional", "rdf-tests syntax-query (transcribed)",
         "SELECT * WHERE { ?s ?p ?o . }"),
    _pos("empty-group", "rdf-tests syntax-query (transcribed)",
         "SELECT * WHERE { }"),
    _pos("nested-group", "rdf-tests syntax-query (transcribed)",
         "SELECT * WHERE { { ?s ?p ?o } }"),
    _pos("ask-shorthand", "rdf-tests syntax-query (transcribed)",
         "ASK { ?s ?p ?o }"),
    _pos("a-keyword", "rdf-tests syntax-query (transcribed)",
         "PREFIX : <http://example/>\nSELECT * WHERE { ?s a :C }"),
    _neg("unclosed-brace", "rdf-tests syntax-query (transcribed)",
         "SELECT * WHERE { ?s ?p ?o"),
    _neg("missing-where-pattern", "rdf-tests syntax-query (transcribed)",
         "SELECT *"),
    _neg("bad-variable", "rdf-tests syntax-query (transcribed)",
         "SELECT ? WHERE { ?s ?p ?o }"),
    _neg("filter-outside-group", "rdf-tests syntax-query (transcribed)",
         "SELECT * WHERE { ?s ?p ?o } FILTER(?s)"),
    _neg("dangling-dot-only", "rdf-tests syntax-query (transcribed)",
         "SELECT * WHERE { . }"),
    _neg("agg-ungrouped-var", "rdf-tests syntax-query (transcribed): "
         "projecting an ungrouped var alongside aggregates",
         "SELECT ?s (COUNT(?o) AS ?c) WHERE { ?s ?p ?o }"),
    _neg("select-expr-needs-as", "rdf-tests syntax-query (transcribed)",
         "SELECT (?o + 1) WHERE { ?s ?p ?o }"),
    _neg("duplicate-select-alias", "rdf-tests syntax-query (transcribed)",
         "SELECT (1 AS ?x) (2 AS ?x) WHERE { ?s ?p ?o }"),
    _neg("undefined-prefix", "rdf-tests syntax-query (transcribed)",
         "SELECT * WHERE { ex:s ?p ?o }"),
]
