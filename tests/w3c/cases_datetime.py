"""W3C conformance corpus — date/time builtins.

Source: SPARQL 1.1 Query §17.4.5 example tables (exact). The TZ /
TIMEZONE examples use the spec's literal
"2011-01-10T14:45:13.815-05:00"^^xsd:dateTime.
"""

XSD = "http://www.w3.org/2001/XMLSchema#"
Q = f"PREFIX xsd: <{XSD}>\n"
_DT = '"2011-01-10T14:45:13.815-05:00"^^xsd:dateTime'


def _exprs(*pairs):
    binds = " ".join(f"BIND({e} AS ?r{i})" for i, (e, _) in enumerate(pairs))
    names = " ".join(f"?r{i}" for i in range(len(pairs)))
    row = {f"r{i}": t for i, (_, t) in enumerate(pairs) if t is not None}
    return {
        "query": Q + f"SELECT {names} WHERE {{ VALUES ?u {{ 1 }} {binds} }}",
        "results": [row],
    }


CASES = [
    dict(name="year-month-day", source="spec §17.4.5.2-4",
         **_exprs((f'YEAR({_DT})', '"2011"^^xsd:integer'),
                  (f'MONTH({_DT})', '"1"^^xsd:integer'),
                  (f'DAY({_DT})', '"10"^^xsd:integer'))),
    dict(name="hours-minutes", source="spec §17.4.5.5-6",
         **_exprs((f'HOURS({_DT})', '"14"^^xsd:integer'),
                  (f'MINUTES({_DT})', '"45"^^xsd:integer'))),
    dict(name="seconds", source="spec §17.4.5.7",
         **_exprs((f'SECONDS({_DT})', '"13.815"^^xsd:decimal')),
         lax_num=True),
    dict(name="tz", source="spec §17.4.5.9",
         **_exprs((f'TZ({_DT})', '"-05:00"'),
                  ('TZ("2011-01-10T14:45:13.815Z"^^xsd:dateTime)', '"Z"'),
                  ('TZ("2011-01-10T14:45:13.815"^^xsd:dateTime)', '""'))),
    dict(name="timezone-duration", source="spec §17.4.5.8",
         **_exprs((f'TIMEZONE({_DT})',
                   '"-PT5H"^^<http://www.w3.org/2001/XMLSchema#dayTimeDuration>'),
                  ('TIMEZONE("2011-01-10T14:45:13.815Z"^^xsd:dateTime)',
                   '"PT0S"^^<http://www.w3.org/2001/XMLSchema#dayTimeDuration>'),
                  # no timezone ⇒ error ⇒ unbound
                  ('TIMEZONE("2011-01-10T14:45:13.815"^^xsd:dateTime)',
                   None))),
    dict(name="now-is-datetime", source="spec §17.4.5.1",
         query=Q + "SELECT ?ok WHERE { VALUES ?u { 1 } "
                   "BIND(DATATYPE(NOW()) = xsd:dateTime AS ?ok) }",
         results=[{"ok": '"true"^^xsd:boolean'}]),
    dict(name="date-extension", source="engine extension (GraphDB parity): "
         "xsd:date joins the temporal value space",
         **_exprs(('"2011-01-10"^^xsd:date < "2012-01-01"^^xsd:date',
                   '"true"^^xsd:boolean'),
                  ('"2011-01-10"^^xsd:date = "2011-01-10"^^xsd:date',
                   '"true"^^xsd:boolean'),
                  ('YEAR("2011-01-10"^^xsd:date)', '"2011"^^xsd:integer'),
                  ('MONTH("2011-01-10"^^xsd:date)', '"1"^^xsd:integer'),
                  ('DAY("2011-01-10"^^xsd:date)', '"10"^^xsd:integer'),
                  # no time fields on a date: type errors
                  ('HOURS("2011-01-10"^^xsd:date)', None),
                  ('SECONDS("2011-01-10"^^xsd:date)', None))),
    dict(name="datetime-compare", source="spec §17.3 (op:dateTime ordering)",
         **_exprs(('"2010-06-21T11:28:01Z"^^xsd:dateTime < '
                   '"2011-06-21T11:28:01Z"^^xsd:dateTime',
                   '"true"^^xsd:boolean'),
                  ('"2011-01-01T00:00:00Z"^^xsd:dateTime = '
                   '"2011-01-01T00:00:00Z"^^xsd:dateTime',
                   '"true"^^xsd:boolean'))),
]


# -- r9 corpus growth: invalid lexicals / casting edges (ANSI-audit pins) --

CASES += [
    dict(name="invalid-datetime-cast-unbound",
         source="spec §17.5 (XPath casting: invalid lexical is a dynamic "
                "error → unbound, never a query failure)",
         **_exprs(('xsd:dateTime("junk")', None),
                  ('DATATYPE(xsd:dateTime("junk"))', None),
                  ('xsd:dateTime("2002-10-10T12:00:00")',
                   '"2002-10-10T12:00:00"^^xsd:dateTime'))),
    dict(name="invalid-datetime-constant-comparison-empty",
         source="spec §17.5 + §17.2 (invalid constant has no value: "
                "comparison is a type error, the row drops, the query "
                "still answers)",
         data="""@prefix : <http://example/> .
             @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
             :x :d "2002-10-10T00:00:00"^^xsd:dateTime .
         """,
         query=Q + """PREFIX : <http://example/>
             SELECT ?s WHERE { ?s :d ?v
               FILTER(?v > "not-a-datetime"^^xsd:dateTime) }""",
         results=[]),
    dict(name="invalid-typed-literal-sameterm-equal",
         source="rdf-tests open-eq shape (transcribed; §17.4.1.7: = on "
                "identical ill-typed literals falls back to term "
                "equality → true)",
         **_exprs(('"junk"^^xsd:dateTime = "junk"^^xsd:dateTime',
                   '"true"^^xsd:boolean'),
                  ('SAMETERM("junk"^^xsd:dateTime, "junk"^^xsd:dateTime)',
                   '"true"^^xsd:boolean'))),
    dict(name="datetime-cross-day-compare",
         source="spec §17.3 (dateTime operator mapping: op:dateTime-less-"
                "than)",
         **_exprs(('xsd:dateTime("2002-10-10T12:00:00") < '
                   'xsd:dateTime("2002-10-11T00:00:00")',
                   '"true"^^xsd:boolean'),
                  ('xsd:dateTime("2002-10-10T12:00:00") > '
                   'xsd:dateTime("2002-10-11T00:00:00")',
                   '"false"^^xsd:boolean'))),
    dict(name="date-accessors",
         source="engine extension (GraphDB parity): YEAR/MONTH/DAY apply "
                "to the xsd:date value space",
         **_exprs(('YEAR("2002-10-10"^^xsd:date)', '"2002"^^xsd:integer'),
                  ('MONTH("2002-10-10"^^xsd:date)', '"10"^^xsd:integer'),
                  ('DAY("2002-10-10"^^xsd:date)', '"10"^^xsd:integer'))),
    dict(name="tz-suffixed-date-local-value",
         source="engine extension (GraphDB parity; r9 ADVICE convention: "
                "xsd:date value = local date at midnight, tz dropped — "
                "identical on every ingest path)",
         **_exprs(('"2002-10-10+13:00"^^xsd:date = "2002-10-10"^^xsd:date',
                   '"true"^^xsd:boolean'),
                  ('"2002-10-10+13:00"^^xsd:date < "2002-10-11"^^xsd:date',
                   '"true"^^xsd:boolean'))),
]
