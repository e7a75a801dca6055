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
