"""SPARQL Query Results JSON serialization (SURVEY B51, A13).

Matches the writer the reference streams results through
(``SPARQLResultsJSONWriter``, GraphDBSystemAdapter.java:249) and reproduces
its failure sentinel byte-for-byte (:254):

    {"head":{"vars":["xxx"]},"results":{"bindings":[{"xxx":{"type":"literal","value":"XXX"}}]}}
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame

from graphdb_free_mocha_sa_spark.model import RDF_LANGSTRING, XSD_STRING

SENTINEL = ('{"head":{"vars":["xxx"]},"results":{"bindings":'
            '[{"xxx":{"type":"literal","value":"XXX"}}]}}')


def _binding(row, v: str) -> dict | None:
    key = row[v]
    if key is None:
        return None
    dt = row[v + "__dt"]
    lex = row[v + "__lex"]
    if dt is None:
        if lex.startswith("_:"):
            return {"type": "bnode", "value": lex[2:]}
        return {"type": "uri", "value": lex}
    out = {"type": "literal", "value": lex}
    lang = row[v + "__lang"]
    if lang:
        out["xml:lang"] = lang
    elif dt not in (XSD_STRING, RDF_LANGSTRING):
        out["datatype"] = dt
    return out


def iter_select_json(df: DataFrame, variables: list[str] | None = None):
    """Yield the SPARQL-Results-JSON document as a sequence of string chunks.

    Driver memory is bounded: rows stream through ``toLocalIterator`` (one
    partition resident at a time, no prefetch) and each row's binding is
    serialized and released before the next — the result set NEVER exists
    as a driver-side list of Rows. This is the 100 TB-safe leg of B51: the
    reference streams through ``SPARQLResultsJSONWriter``
    (GraphDBSystemAdapter.java:247-249) row-by-row the same way; only its
    final byte buffer is whole-result, and callers here that need bounded
    output can pipe these chunks straight to a socket/file instead of
    joining them (:func:`select_json_to`)."""
    if variables is None:
        variables = [c for c in df.columns if "__" not in c]
    yield json.dumps({"head": {"vars": variables}},
                     ensure_ascii=False)[:-1] + ',"results":{"bindings":['
    first = True
    for row in df.toLocalIterator(prefetchPartitions=False):
        b = {}
        for v in variables:
            cell = _binding(row, v)
            if cell is not None:
                b[v] = cell
        yield ("" if first else ",") + json.dumps(b, ensure_ascii=False)
        first = False
    yield "]}}"


def select_json_to(df: DataFrame, variables: list[str] | None,
                   write) -> None:
    """Stream the JSON document into ``write`` (a ``fh.write``-style
    callable) with memory independent of the result-set size."""
    for chunk in iter_select_json(df, variables):
        write(chunk)


def select_json(df: DataFrame, variables: list[str] | None = None) -> str:
    """Whole-document string (API parity with the reference's byte-buffer
    result, GraphDBSystemAdapter.java:249). The final string is necessarily
    O(result bytes) — identical to the reference — but the intermediate
    state is streamed: no driver-side collect() of Row objects."""
    return "".join(iter_select_json(df, variables))


def ask_json(value: bool) -> str:
    return json.dumps({"head": {}, "boolean": bool(value)})


# ---------------------------------------- XML / CSV / TSV writers (B51+, r6)
# The reference's rdf4j stack ships SPARQL-Results XML/CSV/TSV writers
# alongside JSON (pom.xml:80-90); the adapter only exercises JSON, so these
# are parity-plus. Same streaming contract as iter_select_json: rows flow
# through toLocalIterator, driver memory independent of result size.

_XMLNS = "http://www.w3.org/2005/sparql-results#"


def _xml_escape(s: str) -> str:
    # &#13;: XML 1.0 end-of-line handling NORMALIZES a literal CR (alone
    # or in CRLF) to LF during parse — a lexical containing "\r" would
    # silently round-trip as "\n" unless emitted as a character reference
    # (r9 results-fuzzer find)
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;")
            .replace("\r", "&#13;"))


def iter_select_xml(df: DataFrame, variables: list[str] | None = None):
    """Yield the SPARQL Query Results XML document in streaming chunks."""
    if variables is None:
        variables = [c for c in df.columns if "__" not in c]
    yield ('<?xml version="1.0"?>\n<sparql xmlns="' + _XMLNS + '"><head>'
           + "".join(f'<variable name="{_xml_escape(v)}"/>'
                     for v in variables)
           + "</head><results>")
    for row in df.toLocalIterator(prefetchPartitions=False):
        parts = ["<result>"]
        for v in variables:
            cell = _binding(row, v)
            if cell is None:
                continue
            val = _xml_escape(cell["value"])
            if cell["type"] == "uri":
                term = f"<uri>{val}</uri>"
            elif cell["type"] == "bnode":
                term = f"<bnode>{val}</bnode>"
            elif "xml:lang" in cell:
                term = (f'<literal xml:lang="{_xml_escape(cell["xml:lang"])}"'
                        f">{val}</literal>")
            elif "datatype" in cell:
                term = (f'<literal datatype="{_xml_escape(cell["datatype"])}"'
                        f">{val}</literal>")
            else:
                term = f"<literal>{val}</literal>"
            parts.append(f'<binding name="{_xml_escape(v)}">{term}</binding>')
        parts.append("</result>")
        yield "".join(parts)
    yield "</results></sparql>"


def ask_xml(value: bool) -> str:
    return ('<?xml version="1.0"?>\n<sparql xmlns="' + _XMLNS
            + '"><head/><boolean>' + ("true" if value else "false")
            + "</boolean></sparql>")


def _csv_cell(s: str) -> str:
    if any(c in s for c in ',"\n\r'):
        return '"' + s.replace('"', '""') + '"'
    return s


def iter_select_csv(df: DataFrame, variables: list[str] | None = None):
    """SPARQL 1.1 Results CSV (lossy lexical forms per spec §3): IRIs bare,
    bnodes ``_:label``, literals raw lexical values, RFC 4180 quoting,
    CRLF row terminators."""
    if variables is None:
        variables = [c for c in df.columns if "__" not in c]
    yield ",".join(_csv_cell(v) for v in variables) + "\r\n"
    for row in df.toLocalIterator(prefetchPartitions=False):
        cells = []
        for v in variables:
            cell = _binding(row, v)
            if cell is None:
                cells.append("")
            elif cell["type"] == "bnode":
                cells.append(_csv_cell("_:" + cell["value"]))
            else:
                cells.append(_csv_cell(cell["value"]))
        yield ",".join(cells) + "\r\n"


def _tsv_term(cell: dict | None) -> str:
    if cell is None:
        return ""
    if cell["type"] == "uri":
        return "<" + cell["value"] + ">"
    if cell["type"] == "bnode":
        return "_:" + cell["value"]
    lex = _nt_escape(cell["value"])
    out = '"' + lex + '"'
    if "xml:lang" in cell:
        return out + "@" + cell["xml:lang"]
    if "datatype" in cell:
        return out + "^^<" + cell["datatype"] + ">"
    return out


def iter_select_tsv(df: DataFrame, variables: list[str] | None = None):
    """SPARQL 1.1 Results TSV (lossless Turtle-style terms per spec §4)."""
    if variables is None:
        variables = [c for c in df.columns if "__" not in c]
    yield "\t".join("?" + v for v in variables) + "\n"
    for row in df.toLocalIterator(prefetchPartitions=False):
        yield "\t".join(_tsv_term(_binding(row, v))
                        for v in variables) + "\n"


#: per-format (select-iterator, ask-serializer, error sentinel) — the
#: sentinel mirrors the reference's JSON error shape (var xxx literal XXX)
#: in each format, so every format degrades the same way
RESULT_FORMATS = {
    "json": (iter_select_json, ask_json, SENTINEL),
    "xml": (iter_select_xml, ask_xml,
            '<?xml version="1.0"?>\n<sparql xmlns="' + _XMLNS
            + '"><head><variable name="xxx"/></head><results><result>'
            '<binding name="xxx"><literal>XXX</literal></binding>'
            "</result></results></sparql>"),
    "csv": (iter_select_csv, lambda v: "_askResult\r\n%s\r\n"
            % ("true" if v else "false"), "xxx\r\nXXX\r\n"),
    "tsv": (iter_select_tsv, lambda v: "?_askResult\n%s\n"
            % ("true" if v else "false"), '?xxx\n"XXX"\n'),
}


#: N-Triples/TSV ECHAR table — the single source for the Python writers
#: here and the Column-expression exporter (sources/rdf.py nt_escape);
#: ORDER MATTERS: backslash first, or later escapes double-escape
NT_ESCAPES = (("\\", "\\\\"), ('"', '\\"'), ("\n", "\\n"),
              ("\r", "\\r"), ("\t", "\\t"),
              # Java regex treats these as LINE TERMINATORS (non-UNIX_LINES
              # mode): a raw U+2028/U+2029/U+0085 inside a literal stops
              # `.` and `$` in any downstream Java-regex consumer, so emit
              # them as \uXXXX (readers decode \uXXXX ECHARs anyway)
              ("\u2028", "\\u2028"), ("\u2029", "\\u2029"),
              ("\u0085", "\\u0085"))


def _nt_escape(s: str) -> str:
    for raw, esc in NT_ESCAPES:
        s = s.replace(raw, esc)
    return s


def quad_solution_df(df: DataFrame) -> DataFrame:
    """CONSTRUCT/DESCRIBE answer frame (quad-shaped columns s, p, o_lex,
    o_dt, o_lang, …) → a 3-var solution frame (?s ?p ?o with term-family
    columns) so the SELECT-style writers can flatten the graph to a
    bindings table, as the reference adapter does for graph queries.

    (r8 fix: ``select_json(res, None)`` used to treat ``o_lex``/``o_dt``
    as variable names, KeyError on ``o_lex__dt``, and every CONSTRUCT /
    DESCRIBE through the JSON/XML/CSV writers degraded to the sentinel.)"""
    from pyspark.sql import functions as F
    ns = F.lit(None).cast("string")
    return df.select(
        F.col("s"), F.col("s").alias("s__lex"),
        ns.alias("s__dt"), ns.alias("s__lang"),
        F.col("p").alias("p"), F.col("p").alias("p__lex"),
        ns.alias("p__dt"), ns.alias("p__lang"),
        F.col("o_lex").alias("o"), F.col("o_lex").alias("o__lex"),
        F.col("o_dt").alias("o__dt"), F.col("o_lang").alias("o__lang"))


def iter_construct_ntriples(df: DataFrame):
    """Serialize a CONSTRUCT/DESCRIBE triple frame (columns s, p, o_lex,
    o_dt, o_lang, ...) as N-Triples, streaming row-by-row (r6 parity-plus:
    rdf4j answers graph queries through its RDFWriters; the adapter's JSON
    path flattens to bindings instead)."""
    for row in df.toLocalIterator(prefetchPartitions=False):
        s = row["s"] if row["s"].startswith("_:") else f"<{row['s']}>"
        p = f"<{row['p']}>"
        dt, lex, lang = row["o_dt"], row["o_lex"], row["o_lang"]
        if dt is None:
            o = lex if lex.startswith("_:") else f"<{lex}>"
        else:
            o = f'"{_nt_escape(lex)}"'
            if lang:
                o += "@" + lang
            elif dt not in (XSD_STRING, RDF_LANGSTRING):
                o += f"^^<{dt}>"
        yield f"{s} {p} {o} .\n"


# -------------------------------------------------- result-sink framing (A14)


def frame_result(payload: str | bytes) -> bytes:
    """Length-prefixed result frame: 4-byte big-endian length + payload
    bytes — the wire format the reference's result sink writes per task
    (AbstractSystemAdapter1.java:195-206 packs each result byte[] behind an
    int length header)."""
    import struct
    data = payload.encode("utf-8") if isinstance(payload, str) else payload
    return struct.pack(">i", len(data)) + data


def unframe_results(buf: bytes) -> list[bytes]:
    """Split a concatenation of length-prefixed frames back into payloads."""
    import struct
    out, pos = [], 0
    while pos < len(buf):
        if pos + 4 > len(buf):
            raise ValueError("truncated frame header")
        (n,) = struct.unpack_from(">i", buf, pos)
        pos += 4
        if pos + n > len(buf):
            raise ValueError("truncated frame payload")
        out.append(buf[pos:pos + n])
        pos += n
    return out


def iter_nquads(df: DataFrame, default_graph: str | None = None):
    """Serialize a quad frame as N-Quads lines, streaming row-by-row
    (the driver-side sibling of the distributed file exporter in
    sources/rdf.py; r6). Default-graph rows emit as triples."""
    for row in df.toLocalIterator(prefetchPartitions=False):
        s = row["s"] if row["s"].startswith("_:") else f"<{row['s']}>"
        dt, lex, lang = row["o_dt"], row["o_lex"], row["o_lang"]
        if dt is None:
            o = lex if lex.startswith("_:") else f"<{lex}>"
        else:
            o = f'"{_nt_escape(lex)}"'
            if lang:
                o += "@" + lang
            elif dt not in (XSD_STRING, RDF_LANGSTRING):
                o += f"^^<{dt}>"
        g = row["g"]
        if g is None or g == default_graph:
            gpart = ""
        elif g.startswith("_:"):
            gpart = " " + g
        else:
            gpart = f" <{g}>"
        yield f"{s} <{row['p']}> {o}{gpart} .\n"


def iter_trig(df: DataFrame, default_graph: str | None = None):
    """Serialize a quad frame as TriG, streaming (r6): rows arrive sorted
    by graph (one orderBy — the only shuffle), consecutive same-graph
    rows share one block, default-graph rows emit as top-level triples.
    Terms use the N-Triples forms (always-quoted literals), which are
    valid TriG — no prefix table needed."""
    def term(lex, dt, lang):
        if dt is None:
            return lex if lex.startswith("_:") else f"<{lex}>"
        out = f'"{_nt_escape(lex)}"'
        if lang:
            return out + "@" + lang
        if dt not in (XSD_STRING, RDF_LANGSTRING):
            return out + f"^^<{dt}>"
        return out

    current = None
    opened = False
    for row in (df.orderBy("g").toLocalIterator(prefetchPartitions=False)):
        g = row["g"]
        is_default = g is None or g == default_graph
        s = row["s"] if row["s"].startswith("_:") else f"<{row['s']}>"
        line = (f"{s} <{row['p']}> "
                f"{term(row['o_lex'], row['o_dt'], row['o_lang'])} .")
        if is_default:
            if opened:
                yield "}\n"
                opened = False
            current = None
            yield line + "\n"
            continue
        if g != current:
            if opened:
                yield "}\n"
            glabel = g if g.startswith("_:") else f"<{g}>"
            yield f"{glabel} {{\n"
            current, opened = g, True
        yield "  " + line + "\n"
    if opened:
        yield "}\n"


def iter_jsonld(df: DataFrame, default_graph: str | None = None):
    """Serialize a quad frame as one JSON-LD document, streaming (r6c —
    completes the Rio writer family next to iter_trig/iter_nquads). Rows
    arrive sorted by (g, s) — one orderBy, the only shuffle — so each
    subject becomes ONE node object (bounded driver memory: a single
    subject's property map). Named graphs emit as
    ``{"@id": g, "@graph": [...]}`` wrappers; default-graph nodes are
    top-level. Output is expanded-form-compatible (full-IRI keys,
    ``@value``/``@language``/``@type`` objects) and round-trips through
    sources/jsonld.py."""
    import json as _json

    def value_obj(lex, dt, lang):
        if dt is None:
            return {"@id": lex}
        if lang:
            return {"@value": lex, "@language": lang}
        if dt == XSD_STRING:
            return {"@value": lex}
        return {"@value": lex, "@type": dt}

    def flush_node(subj, props):
        node = {"@id": subj}
        node.update(props)
        return _json.dumps(node, ensure_ascii=False)

    _UNSET = object()
    cur_g = _UNSET
    cur_s = None
    props: dict = {}
    wrapped = False      # inside a named-graph {"@graph": [ ... ]}
    first_top = True     # comma state at the top level
    first_in_g = True    # comma state inside the current @graph array

    yield "[\n"
    rows = df.orderBy("g", "s").toLocalIterator(prefetchPartitions=False)
    for row in rows:
        g = row["g"]
        if g == default_graph:
            g = None
        s = row["s"]
        if g != cur_g or s != cur_s:
            if cur_s is not None:
                chunk = flush_node(cur_s, props)
                if wrapped:
                    yield ("" if first_in_g else ",\n") + chunk
                    first_in_g = False
                else:
                    yield ("" if first_top else ",\n") + chunk
                    first_top = False
            props = {}
            if g != cur_g:
                if wrapped:
                    yield "]}"
                    wrapped = False
                if g is not None:
                    yield ("" if first_top else ",\n") \
                        + _json.dumps({"@id": g})[:-1] + ', "@graph": ['
                    first_top = False
                    first_in_g = True
                    wrapped = True
                cur_g = g
            cur_s = s
        props.setdefault(row["p"], []).append(
            value_obj(row["o_lex"], row["o_dt"], row["o_lang"]))
    if cur_s is not None:
        chunk = flush_node(cur_s, props)
        if wrapped:
            yield ("" if first_in_g else ",\n") + chunk
        else:
            yield ("" if first_top else ",\n") + chunk
    if wrapped:
        yield "]}"
    yield "\n]\n"


def iter_trix(df: DataFrame, default_graph: str | None = None):
    """Serialize a quad frame as TriX, streaming (r7 — completes the Rio
    writer family with sources/trix.py as its reader). Rows arrive
    sorted by graph (one orderBy, the only shuffle); consecutive
    same-graph rows share one <graph> block; default-graph rows emit in
    an unnamed <graph>. Unnamed-graph rows sort first (g ascending with
    the default name), so at most one unnamed block opens."""
    from xml.sax.saxutils import escape as _sax_escape, quoteattr

    def escape(s):
        # &#13;: XML end-of-line handling normalizes a literal CR to LF
        # at parse time (same defect the results-XML writer had — the r9
        # round-trip fuzzer caught both)
        return _sax_escape(s, {"\r": "&#13;"})

    def term_xml(lex, dt, lang):
        if dt is None:
            if lex.startswith("_:"):
                return f"<id>{escape(lex[2:])}</id>"
            return f"<uri>{escape(lex)}</uri>"
        if lang:
            return (f"<plainLiteral xml:lang={quoteattr(lang)}>"
                    f"{escape(lex)}</plainLiteral>")
        if dt == XSD_STRING:
            return f"<plainLiteral>{escape(lex)}</plainLiteral>"
        return (f"<typedLiteral datatype={quoteattr(dt)}>"
                f"{escape(lex)}</typedLiteral>")

    yield ('<TriX xmlns="http://www.w3.org/2004/03/trix/trix-1/">\n')
    _UNSET = object()
    current = _UNSET
    for row in df.orderBy("g").toLocalIterator(prefetchPartitions=False):
        g = row["g"]
        if g == default_graph:
            g = None
        if g != current:
            if current is not _UNSET:
                yield "  </graph>\n"
            yield "  <graph>\n"
            if g is not None:
                yield f"    <uri>{escape(g)}</uri>\n"
            current = g
        s = term_xml(row["s"], None, None)
        p = f"<uri>{escape(row['p'])}</uri>"
        o = term_xml(row["o_lex"], row["o_dt"], row["o_lang"])
        yield f"    <triple>{s}{p}{o}</triple>\n"
    if current is not _UNSET:
        yield "  </graph>\n"
    yield "</TriX>\n"


def iter_rdfjson(df: DataFrame, default_graph: str | None = None):
    """Serialize a quad frame as one RDF/JSON document, streaming (r7).
    Rows arrive sorted by (s, p) — one orderBy — so each subject becomes
    one object and each predicate one array (bounded driver memory: one
    (s, p) group's value objects never buffer; only comma state is
    kept). RDF/JSON has no named-graph slot: graph names are DROPPED,
    exactly like rdf4j's RDFJSONWriter drops statement contexts — use
    trig/nquads/trix for graph-preserving dumps."""
    def value_obj(lex, dt, lang):
        if dt is None:
            if lex.startswith("_:"):
                return {"value": lex, "type": "bnode"}
            return {"value": lex, "type": "uri"}
        out = {"value": lex, "type": "literal"}
        if lang:
            out["lang"] = lang
        elif dt not in (XSD_STRING, RDF_LANGSTRING):
            out["datatype"] = dt
        return out

    yield "{\n"
    cur_s = cur_p = None
    for row in (df.orderBy("s", "p")
                .toLocalIterator(prefetchPartitions=False)):
        s, p = row["s"], row["p"]
        if s != cur_s:
            if cur_s is not None:
                yield "]},\n"
            yield json.dumps(s) + ": {"
            cur_s, cur_p = s, None
        if p != cur_p:
            if cur_p is not None:
                yield "], "
            yield json.dumps(p) + ": ["
            cur_p = p
        else:
            yield ", "
        yield json.dumps(value_obj(row["o_lex"], row["o_dt"],
                                   row["o_lang"]), ensure_ascii=False)
    if cur_s is not None:
        yield "]}\n"
    yield "}\n"


def iter_binaryrdf(df: DataFrame, default_graph: str | None = None):
    """Serialize a quad frame as binary RDF (r7), streaming row-by-row —
    chunks are BYTES (the one binary member of the writer family; the
    callers that negotiate this format must write binary). Default-graph
    rows carry a NULL context."""
    from graphdb_free_mocha_sa_spark.sources.binaryrdf import (
        write_footer, write_header, write_statement)
    yield write_header()
    for row in df.toLocalIterator(prefetchPartitions=False):
        yield write_statement(row["g"], row["s"], row["p"], row["o_lex"],
                              row["o_dt"], row["o_lang"],
                              default_graph=default_graph)
    yield write_footer()
