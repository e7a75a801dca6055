"""RDF file readers → quad DataFrames (SURVEY B50).

The reference bulk-loads Turtle files into named graphs
(``RDFFormat.TURTLE``, GraphDBSystemAdapter.java:286). Spark-first split:

* **N-Triples fast path** — `spark.read.text` + JVM-side regex extraction
  (one `regexp_extract` per component, whole-stage codegen, fully parallel).
  This is the scale path: N-Triples is line-delimited so Spark splits files
  arbitrarily across executors.
* **Turtle subset** — a `mapPartitions` Python parser for prefix-using fixture
  files (prefixes parsed on the driver from the header; body statements are
  line-oriented `s p o .` with ';'/',' continuations within one line).
  Documented subset, not full Turtle — the reference's own bulk data is
  machine-generated triple-per-line.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_free_mocha_sa_spark.model import (NUMERIC_DTS, QUAD_COLS,
                                               XSD_DATE, XSD_DATETIME,
                                               XSD_STRING, date_shadow_col,
                                               date_shadow_py,
                                               datetime_shadow_col,
                                               num_shadow_col, valid_num_lex)

_IRI = r"<([^>]*)>"
_BN = r"(_:\S+)"
_SUBJ = rf"\s*(?:{_IRI}|{_BN})"


def read_ntriples(spark: SparkSession, path: str, graph: str) -> DataFrame:
    return _read_line_rdf(spark, path, graph, quads=False)


def read_nquads(spark: SparkSession, path: str, default_graph: str) -> DataFrame:
    """N-Quads fast path: same JVM-regex pipeline as N-Triples with an
    optional trailing graph label (IRI or bnode) per line; label-less
    lines land in ``default_graph``. Line-delimited → arbitrarily
    splittable, the natural bulk format for a named-graph store."""
    return _read_line_rdf(spark, path, default_graph, quads=True)


def nt_unescape(col: F.Column) -> F.Column:
    """Full N-Triples literal unescape as pure JVM column expressions
    (load path stays in codegen — no Python):

    1. escaped backslashes are parked on a sentinel so ``\\\\n`` decodes
       to backslash+n, not backslash+newline (the ordering bug a naive
       replace chain has);
    2. ECHARs decode via regexp_replace;
    3. ``\\uXXXX`` / ``\\UXXXXXXXX`` codepoints decode by splitting on a
       lookahead and mapping hex → UTF-32 bytes → string
       (``decode(unhex(lpad(hex, 8, '0')), 'UTF-32')`` — handles astral
       planes, no chr()-mod-256 truncation);
    4. the sentinel restores to a literal backslash.
    """
    s = F.regexp_replace(col, r"\\\\", "\x00")
    for esc, rep in ((r'\\"', '"'), (r"\\n", "\n"), (r"\\t", "\t"),
                     (r"\\r", "\r"), (r"\\b", "\b"), (r"\\f", "\f"),
                     (r"\\'", "'")):
        s = F.regexp_replace(s, esc, rep)

    def seg_dec(seg: F.Column) -> F.Column:
        cp4 = F.decode(F.unhex(F.lpad(F.substring(seg, 3, 4), 8, "0")),
                       "UTF-32")
        cp8 = F.decode(F.unhex(F.substring(seg, 3, 8)), "UTF-32")
        return (F.when(seg.rlike(r"^\\U[0-9A-Fa-f]{8}"),
                       F.concat(cp8, F.substring(seg, 11, 2147483647)))
                .when(seg.rlike(r"^\\u[0-9A-Fa-f]{4}"),
                      F.concat(cp4, F.substring(seg, 7, 2147483647)))
                .otherwise(seg))

    parts = F.split(s, r"(?=\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})")
    s = F.array_join(F.transform(parts, seg_dec), "")
    # Java regex replacement: '\\\\' (two escaped backslashes) emits ONE
    return F.regexp_replace(s, "\x00", "\\\\")


def _read_line_rdf(spark: SparkSession, path: str, graph: str,
                   quads: bool) -> DataFrame:
    lines = spark.read.text(path).filter(
        (F.length(F.trim(F.col("value"))) > 0) & ~F.trim(F.col("value")).startswith("#"))
    v = F.col("value")
    # regexp_extract yields '' (not NULL) on no-match, so coalesce would never
    # fall through to the bnode alternative — chain on length instead.
    s_iri = F.regexp_extract(v, r"^\s*<([^>]*)>", 1)
    s_bn = F.regexp_extract(v, r"^\s*(_:\S+)", 1)
    s = F.when(F.length(s_iri) > 0, s_iri).when(F.length(s_bn) > 0, s_bn)
    p = F.regexp_extract(v, r"^\s*(?:<[^>]*>|_:\S+)\s+<([^>]*)>", 1)
    # (?s): Java regex counts U+2028/U+2029/U+0085 as line terminators,
    # so without DOTALL a raw one inside a literal stops `.` mid-line and
    # the whole statement silently parses empty (r6 fuzz finding)
    rest = F.regexp_extract(v, r"(?s)^\s*(?:<[^>]*>|_:\S+)\s+<[^>]*>\s+(.*?)\s*\.\s*$", 1)

    g_col = F.lit(graph)
    if quads:
        # strip an optional trailing graph label off the object+graph tail;
        # the object alternatives are complete terms so a literal containing
        # '<...>' can never absorb the label (anchored at end-of-line)
        term = (r'(?:<[^>]*>|_:\S+|"(?:[^"\\]|\\.)*"'
                r'(?:@[A-Za-z0-9-]+|\^\^<[^>]*>)?)')
        g_iri = F.regexp_extract(rest, r"^" + term + r"\s+<([^>]*)>$", 1)
        g_bn = F.regexp_extract(rest, r"^" + term + r"\s+(_:\S+)$", 1)
        g_col = (F.when(F.length(g_iri) > 0, g_iri)
                 .when(F.length(g_bn) > 0, g_bn)
                 .otherwise(F.lit(graph)))
        rest = (F.when((F.length(g_iri) > 0) | (F.length(g_bn) > 0),
                       F.regexp_extract(
                           rest, r"^(.*?)\s+(?:<[^>]*>|_:\S+)$", 1))
                .otherwise(rest))

    o_iri = F.regexp_extract(rest, r"^<([^>]*)>$", 1)
    o_bn = F.regexp_extract(rest, r"^(_:\S+)$", 1)
    o_lexq = F.regexp_extract(rest, r'(?s)^"((?:[^"\\]|\\.)*)"', 1)
    o_lang = F.regexp_extract(rest, r'(?s)^"(?:[^"\\]|\\.)*"@([A-Za-z0-9-]+)$', 1)
    o_dt = F.regexp_extract(rest, r'(?s)^"(?:[^"\\]|\\.)*"\^\^<([^>]*)>$', 1)
    is_lit = rest.startswith('"')

    unesc = nt_unescape(o_lexq)

    o_lex = (F.when(is_lit, unesc)
              .when(F.length(o_iri) > 0, o_iri)
              .otherwise(o_bn))
    dt = (F.when(~is_lit, F.lit(None).cast("string"))
           .when(F.length(o_lang) > 0, F.lit("http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"))
           .when(F.length(o_dt) > 0, o_dt)
           .otherwise(F.lit(XSD_STRING)))
    lang = F.when(F.length(o_lang) > 0, o_lang)
    # per-datatype lexical validation keeps invalid forms out of the value
    # space (r8 ADVICE fix — a bare cast admits "1e5"^^xsd:integer)
    num = num_shadow_col(dt, o_lex)
    ts = (F.when(dt == XSD_DATETIME, datetime_shadow_col(o_lex))
          .when(dt == XSD_DATE, date_shadow_col(o_lex)))

    return (lines.select(
        g_col.alias("g"), s.alias("s"), F.when(F.length(p) > 0, p).alias("p"),
        o_lex.alias("o_lex"), dt.alias("o_dt"), lang.alias("o_lang"),
        num.alias("o_num"), ts.alias("o_ts"))
        .filter(F.col("s").isNotNull() & F.col("p").isNotNull()
                & F.col("o_lex").isNotNull()))


def read_turtle(spark: SparkSession, path: str, graph: str) -> DataFrame:
    """Full Turtle reader (sources/turtle.py tokenizer + recursive-descent
    parser: multi-line statements, ``[...]`` property lists, ``(...)``
    collections, long strings, numeric/boolean shorthand, @base).

    Turtle is not line-splittable, so the parse unit is one FILE
    (``wholetext``) — a directory of Turtle files parses in parallel, one
    task per file. Line-delimited bulk data should ship N-Triples (the
    regex fast path above, splittable at arbitrary byte offsets).
    """
    from pyspark.sql.types import (DoubleType, StringType, StructField,
                                   StructType, TimestampType)
    schema = StructType([
        StructField("g", StringType()), StructField("s", StringType()),
        StructField("p", StringType()), StructField("o_lex", StringType()),
        StructField("o_dt", StringType()), StructField("o_lang", StringType()),
        StructField("o_num", DoubleType()), StructField("o_ts", TimestampType()),
    ])

    def parse_files(rows):
        import datetime as _dt

        from graphdb_free_mocha_sa_spark.sources.turtle import parse_turtle

        for row in rows:
            for s, p, (lex, dt, lang) in parse_turtle(row.value):
                num = ts = None
                if dt in NUMERIC_DTS:
                    num = valid_num_lex(dt, lex)
                elif dt == XSD_DATETIME:
                    try:
                        ts = _dt.datetime.fromisoformat(lex)
                    except ValueError:
                        ts = None
                elif dt == XSD_DATE:
                    # shared local-midnight convention; fromisoformat(lex)
                    # would read "2002-10-10+13:00" as 13:00 (r8 ADVICE)
                    ts = date_shadow_py(lex)
                yield (graph, s, p, lex, dt, lang, num, ts)

    files = spark.read.text(path, wholetext=True)
    return spark.createDataFrame(files.rdd.mapPartitions(parse_files), schema) \
        .select(*QUAD_COLS)


def read_trig(spark: SparkSession, path: str, default_graph: str) -> DataFrame:
    """TriG reader (named-graph Turtle; reference parses it via
    rdf4j-rio-trig, pom.xml:56-90). Same Spark shape as
    :func:`read_turtle` — TriG is not line-splittable, so one FILE is one
    parse unit and a directory of files parses in parallel. Default-graph
    statements land in ``default_graph`` (the N-Quads convention)."""
    from pyspark.sql.types import (DoubleType, StringType, StructField,
                                   StructType, TimestampType)
    schema = StructType([
        StructField("g", StringType()), StructField("s", StringType()),
        StructField("p", StringType()), StructField("o_lex", StringType()),
        StructField("o_dt", StringType()), StructField("o_lang", StringType()),
        StructField("o_num", DoubleType()), StructField("o_ts", TimestampType()),
    ])

    def parse_files(rows):
        import datetime as _dt

        from graphdb_free_mocha_sa_spark.sources.turtle import parse_trig

        for row in rows:
            for g, s, p, (lex, dt, lang) in parse_trig(row.value):
                num = ts = None
                if dt in NUMERIC_DTS:
                    num = valid_num_lex(dt, lex)
                elif dt == XSD_DATETIME:
                    try:
                        ts = _dt.datetime.fromisoformat(lex)
                    except ValueError:
                        ts = None
                elif dt == XSD_DATE:
                    # shared local-midnight convention; fromisoformat(lex)
                    # would read "2002-10-10+13:00" as 13:00 (r8 ADVICE)
                    ts = date_shadow_py(lex)
                yield (g if g is not None else default_graph,
                       s, p, lex, dt, lang, num, ts)

    files = spark.read.text(path, wholetext=True)
    return spark.createDataFrame(files.rdd.mapPartitions(parse_files), schema) \
        .select(*QUAD_COLS)


def read_rdfxml(spark: SparkSession, path: str, graph: str) -> DataFrame:
    """RDF/XML reader (sources/rdfxml.py striped-syntax parser). Same
    Spark shape as :func:`read_turtle`: one FILE per parse task (XML is
    not splittable), the file's own URI as the xml:base fallback."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (DoubleType, StringType, StructField,
                                   StructType, TimestampType)
    schema = StructType([
        StructField("g", StringType()), StructField("s", StringType()),
        StructField("p", StringType()), StructField("o_lex", StringType()),
        StructField("o_dt", StringType()), StructField("o_lang", StringType()),
        StructField("o_num", DoubleType()), StructField("o_ts", TimestampType()),
    ])

    def parse_files(rows):
        import datetime as _dt

        from graphdb_free_mocha_sa_spark.sources.rdfxml import parse_rdfxml

        for row in rows:
            for s, p, (lex, dt, lang) in parse_rdfxml(row.value,
                                                      base=row.base):
                num = ts = None
                if dt in NUMERIC_DTS:
                    num = valid_num_lex(dt, lex)
                elif dt == XSD_DATETIME:
                    try:
                        ts = _dt.datetime.fromisoformat(lex)
                    except ValueError:
                        ts = None
                elif dt == XSD_DATE:
                    # shared local-midnight convention; fromisoformat(lex)
                    # would read "2002-10-10+13:00" as 13:00 (r8 ADVICE)
                    ts = date_shadow_py(lex)
                yield (graph, s, p, lex, dt, lang, num, ts)

    files = spark.read.text(path, wholetext=True) \
        .withColumn("base", F.input_file_name())
    return spark.createDataFrame(files.rdd.mapPartitions(parse_files), schema) \
        .select(*QUAD_COLS)


def read_jsonld(spark: SparkSession, path: str,
                default_graph: str) -> DataFrame:
    """JSON-LD reader (sources/jsonld.py; the reference's Rio stack maps
    ``.jsonld`` to rdf4j-rio-jsonld, pom.xml:56-90). Same Spark shape as
    :func:`read_trig`: JSON is not splittable, one FILE per parse task, a
    directory of files parses in parallel; named graphs come from
    ``@graph`` nodes, default-graph statements land in ``default_graph``."""
    from pyspark.sql.types import (DoubleType, StringType, StructField,
                                   StructType, TimestampType)
    schema = StructType([
        StructField("g", StringType()), StructField("s", StringType()),
        StructField("p", StringType()), StructField("o_lex", StringType()),
        StructField("o_dt", StringType()), StructField("o_lang", StringType()),
        StructField("o_num", DoubleType()), StructField("o_ts", TimestampType()),
    ])

    def parse_files(rows):
        import datetime as _dt

        from graphdb_free_mocha_sa_spark.sources.jsonld import parse_jsonld

        for row in rows:
            for g, s, p, (lex, dt, lang) in parse_jsonld(row.value,
                                                         base=row.base):
                num = ts = None
                if dt in NUMERIC_DTS:
                    num = valid_num_lex(dt, lex)
                elif dt == XSD_DATETIME:
                    try:
                        ts = _dt.datetime.fromisoformat(lex)
                    except ValueError:
                        ts = None
                elif dt == XSD_DATE:
                    # shared local-midnight convention; fromisoformat(lex)
                    # would read "2002-10-10+13:00" as 13:00 (r8 ADVICE)
                    ts = date_shadow_py(lex)
                yield (g if g is not None else default_graph,
                       s, p, lex, dt, lang, num, ts)

    files = spark.read.text(path, wholetext=True) \
        .withColumn("base", F.input_file_name())
    return spark.createDataFrame(files.rdd.mapPartitions(parse_files), schema) \
        .select(*QUAD_COLS)


def _typed_quad(graph, s, p, lex, dt, lang):
    """Attach the derived numeric/timestamp columns to one parsed term —
    the shared tail of every whole-file reader."""
    import datetime as _dt
    num = ts = None
    if dt in NUMERIC_DTS:
        num = valid_num_lex(dt, lex)
    elif dt == XSD_DATETIME:
        try:
            ts = _dt.datetime.fromisoformat(lex)
        except ValueError:
            ts = None
    elif dt == XSD_DATE:
        ts = date_shadow_py(lex)
    return (graph, s, p, lex, dt, lang, num, ts)


def _read_wholefile_quads(spark: SparkSession, path: str, parse_quads):
    """Shared Spark shape of the non-splittable readers (r7 — the N3 /
    TriX / RDF-JSON family): one FILE per parse task, a directory of
    files parses in parallel. ``parse_quads(text)`` yields
    (g, s, p, (lex, dt, lang)) with g=None for the default graph; the
    caller's closure maps None onto the LOAD target graph."""
    from pyspark.sql.types import (DoubleType, StringType, StructField,
                                   StructType, TimestampType)
    schema = StructType([
        StructField("g", StringType()), StructField("s", StringType()),
        StructField("p", StringType()), StructField("o_lex", StringType()),
        StructField("o_dt", StringType()), StructField("o_lang", StringType()),
        StructField("o_num", DoubleType()), StructField("o_ts", TimestampType()),
    ])

    def parse_files(rows):
        for row in rows:
            for g, s, p, (lex, dt, lang) in parse_quads(row.value):
                yield _typed_quad(g, s, p, lex, dt, lang)

    files = spark.read.text(path, wholetext=True)
    return spark.createDataFrame(files.rdd.mapPartitions(parse_files), schema) \
        .select(*QUAD_COLS)


def read_n3(spark: SparkSession, path: str, graph: str) -> DataFrame:
    """Notation3 reader (sources/turtle.py N3Parser — the Turtle grammar
    plus the N3 shorthands with an RDF representation; reference parses
    N3 via rdf4j-runtime's Rio registry, pom.xml:80-90)."""
    def parse(text):
        from graphdb_free_mocha_sa_spark.sources.turtle import parse_n3
        for s, p, o in parse_n3(text):
            yield (graph, s, p, o)
    return _read_wholefile_quads(spark, path, parse)


def read_trix(spark: SparkSession, path: str, default_graph: str) -> DataFrame:
    """TriX reader (sources/trix.py). Unnamed-graph statements land in
    ``default_graph`` (the N-Quads convention)."""
    def parse(text):
        from graphdb_free_mocha_sa_spark.sources.trix import parse_trix
        for g, s, p, o in parse_trix(text):
            yield (g if g is not None else default_graph, s, p, o)
    return _read_wholefile_quads(spark, path, parse)


def read_rdfjson(spark: SparkSession, path: str, graph: str) -> DataFrame:
    """RDF/JSON reader (sources/rdfjson.py; single-graph format — every
    triple lands in ``graph``)."""
    def parse(text):
        from graphdb_free_mocha_sa_spark.sources.rdfjson import parse_rdfjson
        for s, p, o in parse_rdfjson(text):
            yield (graph, s, p, o)
    return _read_wholefile_quads(spark, path, parse)


def read_binaryrdf(spark: SparkSession, path: str,
                   default_graph: str) -> DataFrame:
    """Binary RDF reader (sources/binaryrdf.py). Binary files come in
    through Spark's binaryFile source — one file per parse task, same
    parallelism shape as the other non-splittable readers."""
    from pyspark.sql.types import (DoubleType, StringType, StructField,
                                   StructType, TimestampType)
    schema = StructType([
        StructField("g", StringType()), StructField("s", StringType()),
        StructField("p", StringType()), StructField("o_lex", StringType()),
        StructField("o_dt", StringType()), StructField("o_lang", StringType()),
        StructField("o_num", DoubleType()), StructField("o_ts", TimestampType()),
    ])

    def parse_files(rows):
        from graphdb_free_mocha_sa_spark.sources.binaryrdf import (
            parse_binaryrdf)
        for row in rows:
            for g, s, p, (lex, dt, lang) in parse_binaryrdf(bytes(row.content)):
                yield _typed_quad(g if g is not None else default_graph,
                                  s, p, lex, dt, lang)

    files = spark.read.format("binaryFile").load(path) \
        .select("content")
    return spark.createDataFrame(files.rdd.mapPartitions(parse_files), schema) \
        .select(*QUAD_COLS)


def read_rdfa(spark: SparkSession, path: str, graph: str) -> DataFrame:
    """RDFa 1.1 reader over HTML/XHTML pages (sources/rdfa.py; the last
    member of the reference's Rio parse-format family, pom.xml:80-90).
    One PAGE per parse task — HTML is not splittable — with the file's own
    URI as the base, so relative @about/@resource/@href resolve the way a
    browser would resolve them."""
    from pyspark.sql.types import (DoubleType, StringType, StructField,
                                   StructType, TimestampType)
    schema = StructType([
        StructField("g", StringType()), StructField("s", StringType()),
        StructField("p", StringType()), StructField("o_lex", StringType()),
        StructField("o_dt", StringType()), StructField("o_lang", StringType()),
        StructField("o_num", DoubleType()), StructField("o_ts", TimestampType()),
    ])

    def parse_files(rows):
        from graphdb_free_mocha_sa_spark.sources.rdfa import parse_rdfa
        for row in rows:
            for s, p, (lex, dt, lang) in parse_rdfa(row.value,
                                                    base=row.base):
                yield _typed_quad(graph, s, p, lex, dt, lang)

    files = spark.read.text(path, wholetext=True) \
        .withColumn("base", F.input_file_name())
    return spark.createDataFrame(files.rdd.mapPartitions(parse_files), schema) \
        .select(*QUAD_COLS)


def read_rdf_file(spark: SparkSession, path: str, graph: str) -> DataFrame:
    if path.endswith((".nt", ".ntriples")):
        return read_ntriples(spark, path, graph)
    if path.endswith((".nq", ".nquads")):
        return read_nquads(spark, path, graph)
    if path.endswith(".trig"):
        return read_trig(spark, path, graph)
    if path.endswith(".trix"):
        return read_trix(spark, path, graph)
    if path.endswith(".n3"):
        return read_n3(spark, path, graph)
    if path.endswith((".rj", ".rdfjson")):
        return read_rdfjson(spark, path, graph)
    if path.endswith(".brf"):
        return read_binaryrdf(spark, path, graph)
    if path.endswith((".html", ".xhtml", ".htm")):
        return read_rdfa(spark, path, graph)
    if path.endswith((".jsonld", ".json")):
        return read_jsonld(spark, path, graph)
    if path.endswith((".rdf", ".rdfxml", ".owl", ".xml")):
        return read_rdfxml(spark, path, graph)
    return read_turtle(spark, path, graph)


def nt_escape(col: F.Column) -> F.Column:
    """N-Triples literal escape as pure JVM column expressions (the export
    stays in codegen — mirror image of :func:`nt_unescape`; r6). The ECHAR
    set comes from results.NT_ESCAPES so the Python writers (TSV /
    construct N-Triples) and this Column exporter cannot drift."""
    from graphdb_free_mocha_sa_spark.sparql.results import NT_ESCAPES
    s = col
    for raw, esc in NT_ESCAPES:
        # F.replace is a literal (non-regex) substitution
        s = F.replace(s, F.lit(raw), F.lit(esc))
    return s


def export_nquads(quads: DataFrame, path: str,
                  default_graph: str | None = None) -> None:
    """Distributed N-Quads export: each quad row is formatted into one
    line by JVM-side column expressions and written with ``df.write.text``
    — the dump parallelizes across executors with NO driver streaming, the
    shape a 100 TB store export needs (the complement of read_nquads; a
    real deployment points ``path`` at distributed storage).

    Rows whose ``g`` equals ``default_graph`` (default: the store's
    default-graph sentinel) emit as triples (no graph label), matching the
    N-Quads spec's default-graph convention.
    """
    from graphdb_free_mocha_sa_spark.model import RDF_LANGSTRING
    from graphdb_free_mocha_sa_spark.store import DEFAULT_GRAPH
    if default_graph is None:
        default_graph = DEFAULT_GRAPH
    term = F.when(F.col("s").startswith("_:"), F.col("s")) \
            .otherwise(F.concat(F.lit("<"), F.col("s"), F.lit(">")))
    pred = F.concat(F.lit("<"), F.col("p"), F.lit(">"))
    lit = F.concat(
        F.lit('"'), nt_escape(F.col("o_lex")), F.lit('"'),
        F.when(F.col("o_lang").isNotNull(),
               F.concat(F.lit("@"), F.col("o_lang")))
         .when(~F.col("o_dt").isin(XSD_STRING, RDF_LANGSTRING),
               F.concat(F.lit("^^<"), F.col("o_dt"), F.lit(">")))
         .otherwise(F.lit("")))
    obj = F.when(F.col("o_dt").isNotNull(), lit) \
           .when(F.col("o_lex").startswith("_:"), F.col("o_lex")) \
           .otherwise(F.concat(F.lit("<"), F.col("o_lex"), F.lit(">")))
    gpart = F.when(F.col("g").isNull() | (F.col("g") == default_graph),
                   F.lit("")) \
             .when(F.col("g").startswith("_:"),
                   F.concat(F.lit(" "), F.col("g"))) \
             .otherwise(F.concat(F.lit(" <"), F.col("g"), F.lit(">")))
    line = F.concat(term, F.lit(" "), pred, F.lit(" "), obj, gpart,
                    F.lit(" ."))
    quads.select(line.alias("value")).write.mode("overwrite").text(path)
