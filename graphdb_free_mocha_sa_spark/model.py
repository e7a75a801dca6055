"""RDF term / quad data model on Spark columns.

Mirrors the reference's data model — statements (s,p,o) in named graphs, i.e.
quads (reference: GraphDBSystemAdapter.java:279-286 loads files into context
IRIs; :318 names graphs "http://graph.version.N") — as one columnar DataFrame:

    quads(g STRING, s STRING, p STRING,
          o_lex STRING, o_dt STRING, o_lang STRING,
          o_num DOUBLE, o_ts TIMESTAMP)

Conventions
-----------
* ``s``/``p``/``g`` hold IRIs as plain strings; blank nodes use the ``_:``
  prefix (scoped by the loader).
* Object terms: an IRI/bnode object has ``o_dt IS NULL``; a literal always has
  ``o_dt`` set (plain strings get ``xsd:string``). ``o_lang`` is set only for
  language-tagged strings (whose ``o_dt`` is rdf:langString).
* ``o_num``/``o_ts`` are pre-parsed *shadow* columns for numeric / temporal
  literals, mirroring the reference's literal value index
  (repo-config.ttl:40-41 ``owlim:enable-literal-index``) so range predicates
  push down to Parquet min/max stats.

Inside the SPARQL translator every variable ``?v`` is carried as flat columns
``v`` (canonical term key — the join/distinct/group key), ``v__lex``,
``v__dt``, ``v__lang``, ``v__num``, ``v__ts``. Flat columns (not a struct) so
Catalyst column pruning drops the shadow columns whenever only the key
survives a join.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, StringType, StructField, StructType,
                               TimestampType)

XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
OWL = "http://www.w3.org/2002/07/owl#"

XSD_STRING = XSD + "string"
XSD_INTEGER = XSD + "integer"
XSD_LONG = XSD + "long"
XSD_INT = XSD + "int"
XSD_DECIMAL = XSD + "decimal"
XSD_DOUBLE = XSD + "double"
XSD_FLOAT = XSD + "float"
XSD_BOOLEAN = XSD + "boolean"
XSD_DATETIME = XSD + "dateTime"
XSD_DATE = XSD + "date"
RDF_LANGSTRING = RDF + "langString"
RDF_TYPE = RDF + "type"

#: the XSD integer-derived family (§17.1 operand datatypes): all promote
#: to xsd:integer under the §17.3 arithmetic ladder; lexical space is the
#: integer one (value-RANGE restrictions like byte ≤ 127 are not lexical
#: constraints — isNumeric("1200"^^xsd:byte) is true per §17.4.2.4)
XSD_INT_DERIVED = tuple(XSD + t for t in (
    "integer", "long", "int", "short", "byte",
    "nonNegativeInteger", "nonPositiveInteger", "negativeInteger",
    "positiveInteger", "unsignedLong", "unsignedInt", "unsignedShort",
    "unsignedByte"))

NUMERIC_DTS = XSD_INT_DERIVED + (XSD_DECIMAL, XSD_DOUBLE, XSD_FLOAT)

import re as _re

_INT_LEX_RE = _re.compile(r"[+-]?[0-9]+\Z")
_DEC_LEX_RE = _re.compile(r"[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)\Z")
_DBL_LEX_RE = _re.compile(r"[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)([eE][+-]?[0-9]+)?\Z")


def num_shadow_col(dt, lex):
    """Column-side twin of :func:`valid_num_lex` — the o_num shadow for a
    (datatype, lexical) column pair, NULL unless the lexical is in the
    datatype's lexical space. Used by the JVM-regex line readers; keeps the
    num-nullness-is-the-type-error-gate invariant intact for loaded data."""
    return (F.when(dt.isin(*XSD_INT_DERIVED)
                   & lex.rlike(r"^[+-]?[0-9]+$"),
                   lex.cast("double"))
            .when((dt == XSD_DECIMAL)
                  & lex.rlike(r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$"),
                  lex.cast("double"))
            .when(dt.isin(XSD_DOUBLE, XSD_FLOAT),
                  F.when(lex == "INF", F.lit(float("inf")))
                   .when(lex == "-INF", F.lit(float("-inf")))
                   .when(lex == "NaN", F.lit(float("nan")))
                   .when(lex.rlike(r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)"
                                   r"([eE][+-]?[0-9]+)?$"),
                         lex.cast("double"))))


def valid_num_lex(dt, lex):
    """float value of a numeric lexical IFF it is in the datatype's lexical
    space, else None.

    Engine-wide invariant (r7): a non-null ``num`` shadow implies a VALID
    lexical for a numeric datatype — operators use num nullness alone as the
    §17.2 type-error gate. A bare Python ``float()`` here would let
    "1e5"^^xsd:integer join the numeric value space (r8 ADVICE fix); this is
    the same per-datatype validation the STRDT builtin applies column-side."""
    if dt in XSD_INT_DERIVED:
        return float(lex) if _INT_LEX_RE.match(lex) else None
    if dt == XSD_DECIMAL:
        return float(lex) if _DEC_LEX_RE.match(lex) else None
    if dt in (XSD_DOUBLE, XSD_FLOAT):
        if lex == "INF":
            return float("inf")
        if lex == "-INF":
            return float("-inf")
        if lex == "NaN":
            return float("nan")
        return float(lex) if _DBL_LEX_RE.match(lex) else None
    return None


# One canonical convention for the xsd:date temporal shadow, shared by every
# ingest path, the VALUES/constant paths, and the line readers (r8 ADVICE:
# datetime.fromisoformat("2002-10-10+13:00") parses the timezone suffix as a
# TIME on Python 3.11+, while lex[:10] truncation both ignored it AND broke
# >4-digit/negative years):
#   value = the date component at local midnight, any timezone suffix
#   dropped (same local-value convention as the r8 YEAR()/MONTH() accessors).
# Dates outside Python datetime's representable window (years 0001-9999 —
# negative, year-zero, and >4-digit years, e.g. "-0005-01-01") have NO shadow
# on ANY path — consistently absent from the temporal value space rather than
# truncated to garbage on some paths and parsed on others. Both regexes
# enforce the window explicitly because Spark's to_date would otherwise
# accept years Python cannot represent (proleptic year <= 0, 5-digit years).
_DATE_PREFIX_RE = _re.compile(r"(?!0000)\d{4}-\d{2}-\d{2}(?!\d)")
DATE_PREFIX_SQL = r"^((?!0000)\d{4}-\d{2}-\d{2})(?:[^0-9]|$)"


def date_shadow_py(lex):
    """datetime at local midnight for an xsd:date lexical, else None."""
    m = _DATE_PREFIX_RE.match(lex)
    if not m:
        return None
    import datetime as _dt
    try:
        return _dt.datetime.fromisoformat(m.group(0))
    except ValueError:
        return None


def date_shadow_col(lex):
    """Column-side twin of :func:`date_shadow_py`. try_cast, not to_date:
    the sessions run Spark 4's default ANSI mode, where to_date THROWS on
    a malformed input ('' from a failed regexp_extract, or a lexically
    shaped non-date like 2002-13-40) instead of yielding NULL."""
    return (F.regexp_extract(lex, DATE_PREFIX_SQL, 1)
            .try_cast("date").cast("timestamp"))


def datetime_shadow_col(lex):
    """xsd:dateTime ts shadow for a lexical column. try_cast, not
    to_timestamp: under ANSI (Spark 4 default) to_timestamp THROWS on the
    first malformed value — a single bad literal in a loaded file or a
    cast argument would kill the whole job instead of that ROW's value
    being absent (SPARQL §17.5: an invalid lexical is a dynamic error for
    that solution only). Found by the r9 ANSI audit."""
    return F.regexp_replace(lex, "T", " ").try_cast("timestamp")


#: graph-name scheme used by the reference for versioned bulk loads
#: (GraphDBSystemAdapter.java:318: "http://graph.version." + loadingNumber)
GRAPH_VERSION_PREFIX = "http://graph.version."

QUAD_SCHEMA = StructType([
    StructField("g", StringType()),
    StructField("s", StringType()),
    StructField("p", StringType()),
    StructField("o_lex", StringType()),
    StructField("o_dt", StringType()),
    StructField("o_lang", StringType()),
    StructField("o_num", DoubleType()),
    StructField("o_ts", TimestampType()),
])

QUAD_COLS = [f.name for f in QUAD_SCHEMA.fields]


def local_df(spark, rows, schema):
    """Small driver-side row set as a JVM LocalRelation.

    ``spark.createDataFrame(list, schema)`` pickles the rows into a Python
    RDD — every later job over that leaf launches Python workers just to
    re-deserialize a handful of constants, and a store whose snapshot
    unions k such leaves pays k worker round-trips per read (measured
    1.5 s for a depth-7 5-row union vs 0.15 s as LocalRelations — r7
    served-path profiling). Routing through pandas engages the Arrow
    converter, which lands the data as a ``LocalTableScanExec``: pure JVM,
    no Python at job time. Falls back to the plain path if pandas/Arrow is
    unavailable or rejects the values."""
    try:
        import pandas as pd
        cols = [f.name for f in schema.fields]
        pdf = pd.DataFrame(list(rows), columns=cols, dtype=object)
        return spark.createDataFrame(pdf, schema=schema)
    except Exception:
        return spark.createDataFrame(list(rows), schema)


def local_quads_df(spark, rows):
    return local_df(spark, rows, QUAD_SCHEMA)

# Suffixes of the flat per-variable column family used by the translator.
VAR_SUFFIXES = ("", "__lex", "__dt", "__lang", "__num", "__ts")


def var_cols(name: str) -> list[str]:
    """All physical columns carrying SPARQL variable ``?name``."""
    return [name + suf for suf in VAR_SUFFIXES]


def canonical_object_key():
    """Canonical term-key expression for the object of a quad row.

    IRI/bnode → the string itself; literal → ``"lex"^^<dt>`` or ``"lex"@lang``.
    Canonical keys are what joins / DISTINCT / GROUP BY operate on, giving RDF
    term equality (lex+dt+lang) with a single-column comparison.
    """
    lit_key = F.concat(
        F.lit('"'), F.col("o_lex"), F.lit('"'),
        F.when(F.col("o_lang").isNotNull(), F.concat(F.lit("@"), F.col("o_lang")))
         .otherwise(F.concat(F.lit("^^"), F.col("o_dt"))),
    )
    return F.when(F.col("o_dt").isNull(), F.col("o_lex")).otherwise(lit_key)


def canonical_key_from_parts(lex, dt, lang):
    """Same as :func:`canonical_object_key` but from arbitrary part columns."""
    lit_key = F.concat(
        F.lit('"'), lex, F.lit('"'),
        F.when(lang.isNotNull(), F.concat(F.lit("@"), lang))
         .otherwise(F.concat(F.lit("^^"), dt)),
    )
    return F.when(dt.isNull(), lex).otherwise(lit_key)


def term_kind_rank(key_col, lex_col):
    """SPARQL ORDER BY term-kind rank: unbound(0) < bnode(1) < IRI(2) < literal(3).

    Derived from the canonical key: literals start with ``\"``, bnodes with
    ``_:``, anything else bound is an IRI.
    """
    return (
        F.when(key_col.isNull(), F.lit(0))
         .when(key_col.startswith('"'), F.lit(3))
         .when(key_col.startswith("_:"), F.lit(1))
         .otherwise(F.lit(2))
    )
