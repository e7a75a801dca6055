"""W3C conformance corpus — SPARQL 1.1 Query Results CSV/TSV Format.

Source: the serialization rules of the CSV/TSV Results Recommendation
(rdf-tests csv-tsv-res family shape, transcribed): CSV uses CRLF line
ends, a bare-name header, plain lexical forms (IRIs/bnodes/literals
undecorated), RFC-4180 quoting (field quoted iff it contains comma,
quote, or newline; inner quotes doubled), empty field for unbound.
TSV uses LF, a ?-prefixed header, and full Turtle/N-Triples term syntax
(angle-bracket IRIs, quoted literals with @lang / ^^<dt> decorations,
backslash escapes).
"""

_DATA = """@prefix : <http://example/> .
@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
:x :p "String" .
:x :p "String-with-dquote\\"" .
_:b0 :p "Blank node" .
:x :p "String, with comma" .
:x :p "String-with-lang"@en .
:x :p 123 .
"""

_Q = ("PREFIX : <http://example/>\n"
      "SELECT ?s ?o WHERE { ?s :p ?o } ORDER BY ?o")

CASES = [
    {
        "name": "csv-terms",
        "source": "csv-tsv-res spec §3 (transcribed shape)",
        "data": _DATA,
        "query": _Q,
        "csv": ("s,o\r\n"
                "_:b0,Blank node\r\n"
                "http://example/x,String\r\n"
                'http://example/x,"String, with comma"\r\n'
                'http://example/x,"String-with-dquote"""\r\n'
                "http://example/x,String-with-lang\r\n"
                "http://example/x,123\r\n"),
    },
    {
        "name": "tsv-terms",
        "source": "csv-tsv-res spec §4 (transcribed shape)",
        "data": _DATA,
        "query": _Q,
        "tsv": ("?s\t?o\n"
                '_:b0\t"Blank node"\n'
                '<http://example/x>\t"String"\n'
                '<http://example/x>\t"String, with comma"\n'
                '<http://example/x>\t"String-with-dquote\\""\n'
                '<http://example/x>\t"String-with-lang"@en\n'
                '<http://example/x>\t"123"^^'
                "<http://www.w3.org/2001/XMLSchema#integer>\n"),
    },
    {
        "name": "csv-unbound-empty",
        "source": "csv-tsv-res spec §3 (unbound = empty field)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :q 9 . :b :p 2 .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?s ?w WHERE { ?s :p ?o OPTIONAL { ?s :q ?w } }
            ORDER BY ?s""",
        "csv": ("s,w\r\n"
                "http://example/a,9\r\n"
                "http://example/b,\r\n"),
    },
    {
        "name": "tsv-unbound-empty",
        "source": "csv-tsv-res spec §4 (unbound = empty field)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :q 9 . :b :p 2 .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?s ?w WHERE { ?s :p ?o OPTIONAL { ?s :q ?w } }
            ORDER BY ?s""",
        "tsv": ("?s\t?w\n"
                '<http://example/a>\t"9"^^'
                "<http://www.w3.org/2001/XMLSchema#integer>\n"
                "<http://example/b>\t\n"),
    },
]


# -- r9 corpus growth (VERDICT r8 item 3): results_formats 4 -> 10 cases --

CASES += [
    {
        "name": "csv-newline-quoted",
        "source": "csv-tsv-res spec §3 (RFC 4180: fields containing "
                  "newlines are quoted; tab needs no quoting)",
        "data": """@prefix : <http://example/> .
            :a :p "line1\\nline2" . :c :p "tab\\there" .
        """,
        "query": "PREFIX : <http://example/>\n"
                 "SELECT ?s ?o WHERE { ?s :p ?o } ORDER BY ?s",
        "csv": ("s,o\r\n"
                'http://example/a,"line1\nline2"\r\n'
                "http://example/c,tab\there\r\n"),
    },
    {
        "name": "tsv-escapes-newline-tab",
        "source": "csv-tsv-res spec §4 (TSV literals escape \\n and \\t)",
        "data": """@prefix : <http://example/> .
            :a :p "line1\\nline2" . :c :p "tab\\there" .
        """,
        "query": "PREFIX : <http://example/>\n"
                 "SELECT ?s ?o WHERE { ?s :p ?o } ORDER BY ?s",
        "tsv": ("?s\t?o\n"
                '<http://example/a>\t"line1\\nline2"\n'
                '<http://example/c>\t"tab\\there"\n'),
    },
    {
        "name": "csv-decimal-plain-lexical",
        "source": "csv-tsv-res spec §3 (typed literals serialize as the "
                  "bare lexical form)",
        "data": """@prefix : <http://example/> .
            @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
            :a :p "2.2"^^xsd:decimal .
        """,
        "query": "PREFIX : <http://example/>\n"
                 "SELECT ?o WHERE { ?s :p ?o }",
        "csv": "o\r\n2.2\r\n",
    },
    {
        "name": "tsv-decimal-typed-term",
        "source": "csv-tsv-res spec §4 (TSV keeps full term syntax)",
        "data": """@prefix : <http://example/> .
            @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
            :a :p "2.2"^^xsd:decimal .
        """,
        "query": "PREFIX : <http://example/>\n"
                 "SELECT ?o WHERE { ?s :p ?o }",
        "tsv": ('?o\n"2.2"^^<http://www.w3.org/2001/XMLSchema#decimal>\n'),
    },
    {
        "name": "csv-empty-result-header-only",
        "source": "csv-tsv-res spec §3 (zero solutions: header line only)",
        "data": "@prefix : <http://example/> . :a :p 1 .",
        "query": "PREFIX : <http://example/>\n"
                 "SELECT ?s ?o WHERE { ?s :none ?o }",
        "csv": "s,o\r\n",
    },
    {
        "name": "tsv-empty-result-header-only",
        "source": "csv-tsv-res spec §4 (zero solutions: header line only)",
        "data": "@prefix : <http://example/> . :a :p 1 .",
        "query": "PREFIX : <http://example/>\n"
                 "SELECT ?s ?o WHERE { ?s :none ?o }",
        "tsv": "?s\t?o\n",
    },
    {
        "name": "csv-newline-field-quoted",
        "source": "csv-tsv-res spec §3 (RFC 4180: newline forces quoting)",
        "data": """@prefix : <http://example/> .
            :x :p "line1\\nline2" .
        """,
        "query": "PREFIX : <http://example/>\nSELECT ?o WHERE { ?s :p ?o }",
        "csv": "o\r\n\"line1\nline2\"\r\n",
    },
    {
        "name": "tsv-tab-newline-escaped",
        "source": "csv-tsv-res spec §4 (N-Triples escapes in TSV)",
        "data": """@prefix : <http://example/> .
            :x :p "tab\\there\\nnl" .
        """,
        "query": "PREFIX : <http://example/>\nSELECT ?o WHERE { ?s :p ?o }",
        "tsv": "?o\n\"tab\\there\\nnl\"\n",
    },
    {
        "name": "tsv-unbound-empty-field",
        "source": "csv-tsv-res spec §4 (unbound = empty field)",
        "data": """@prefix : <http://example/> .
            :a :p 1 . :a :q 9 . :b :p 2 .
        """,
        "query": """PREFIX : <http://example/>
            SELECT ?s ?extra WHERE {
              ?s :p ?o OPTIONAL { ?s :q ?extra } } ORDER BY ?s""",
        "tsv": ("?s\t?extra\n"
                "<http://example/a>\t\"9\"^^"
                "<http://www.w3.org/2001/XMLSchema#integer>\n"
                "<http://example/b>\t\n"),
    },
    {
        "name": "csv-decimal-double-plain",
        "source": "csv-tsv-res spec §3 (plain lexical forms, no quoting)",
        "data": """@prefix : <http://example/> .
            @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
            :x :p "2.50"^^xsd:decimal .
            :x :p "1.0E6"^^xsd:double .
        """,
        "query": ("PREFIX : <http://example/>\n"
                  "SELECT ?o WHERE { ?s :p ?o } ORDER BY ?o"),
        "csv": "o\r\n2.50\r\n1.0E6\r\n",
    },
    {
        "name": "csv-bnode-label-consistent",
        "source": "csv-tsv-res spec §3 (bnode labels consistent per result)",
        "data": """@prefix : <http://example/> .
            _:b :p 1 . _:b :q 2 .
        """,
        "query": ("PREFIX : <http://example/>\n"
                  "SELECT ?s ?t WHERE { ?s :p 1 . ?t :q 2 }"),
        # label choice is implementation-defined; CONSISTENCY
        # across cells is the normative part
        "csv": "s,t\r\n_:b,_:b\r\n",
    },
]
