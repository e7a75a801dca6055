"""Deterministic relational → RDF-quad encoding of the fixture star schema.

Matches FIXTURES.md §2 (namespace ``urn:x:``): each row becomes a subject IRI
``urn:x:<table>/<pk>``, each column a predicate ``urn:x:p/<col>``; FK columns
emit object IRIs, other columns typed literals with pre-parsed shadow values;
every subject gets ``rdf:type urn:x:t/<table>``. Base data lands in graph
``http://graph.version.0`` (the reference's versioned-graph scheme,
GraphDBSystemAdapter.java:318).

Built entirely from native column expressions (one narrow projection per
predicate, unioned) — Catalyst sees a union of scans of the same parquet file
with disjoint projections; no Python executes per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdb_free_mocha_sa_spark.model import (GRAPH_VERSION_PREFIX, QUAD_COLS,
                                               RDF_TYPE, XSD_DATETIME,
                                               XSD_DOUBLE, XSD_LONG,
                                               XSD_STRING)

NS = "urn:x:"
BASE_GRAPH = GRAPH_VERSION_PREFIX + "0"

# table -> (subject-key expression columns, FK column -> target table)
TABLE_KEYS: dict[str, list[str]] = {
    "region": ["r_regionkey"],
    "nation": ["n_nationkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber"],
}

FK_TARGETS: dict[str, str] = {
    "c_nationkey": "nation",
    "s_nationkey": "nation",
    "n_regionkey": "region",
    "o_custkey": "customer",
    "l_orderkey": "orders",
    "l_partkey": "part",
    "l_suppkey": "supplier",
}


def subject_expr(table: str, df: DataFrame):
    keys = TABLE_KEYS[table]
    parts = [F.lit(f"{NS}{table}/")]
    for i, k in enumerate(keys):
        if i:
            parts.append(F.lit("-"))
        parts.append(F.col(k).cast("string"))
    return F.concat(*parts)


def _literal_parts(col: str, dtype: str):
    """(o_lex, o_dt, o_num, o_ts) expressions for a non-FK column."""
    c = F.col(col)
    if dtype in ("bigint", "int", "integer", "long"):
        return c.cast("string"), F.lit(XSD_LONG), c.cast("double"), F.lit(None).cast("timestamp")
    if dtype in ("double", "float"):
        return c.cast("string"), F.lit(XSD_DOUBLE), c.cast("double"), F.lit(None).cast("timestamp")
    if dtype in ("timestamp", "timestamp_ntz"):
        return F.date_format(c, "yyyy-MM-dd'T'HH:mm:ss"), F.lit(XSD_DATETIME), F.lit(None).cast("double"), c
    return c.cast("string"), F.lit(XSD_STRING), F.lit(None).cast("double"), F.lit(None).cast("timestamp")


def encode_table(table: str, df: DataFrame, graph: str = BASE_GRAPH) -> DataFrame:
    """Encode one relational table as quads."""
    subj = subject_expr(table, df)
    g = F.lit(graph)
    pieces: list[DataFrame] = []

    # rdf:type quad per row
    pieces.append(df.select(
        g.alias("g"), subj.alias("s"), F.lit(RDF_TYPE).alias("p"),
        F.lit(f"{NS}t/{table}").alias("o_lex"),
        F.lit(None).cast("string").alias("o_dt"),
        F.lit(None).cast("string").alias("o_lang"),
        F.lit(None).cast("double").alias("o_num"),
        F.lit(None).cast("timestamp").alias("o_ts"),
    ))

    for col, dtype in df.dtypes:
        pred = F.lit(f"{NS}p/{col}")
        if col in FK_TARGETS:
            obj = F.concat(F.lit(f"{NS}{FK_TARGETS[col]}/"), F.col(col).cast("string"))
            pieces.append(df.where(F.col(col).isNotNull()).select(
                g.alias("g"), subj.alias("s"), pred.alias("p"),
                obj.alias("o_lex"),
                F.lit(None).cast("string").alias("o_dt"),
                F.lit(None).cast("string").alias("o_lang"),
                F.lit(None).cast("double").alias("o_num"),
                F.lit(None).cast("timestamp").alias("o_ts"),
            ))
        else:
            lex, dt, num, ts = _literal_parts(col, dtype)
            pieces.append(df.where(F.col(col).isNotNull()).select(
                g.alias("g"), subj.alias("s"), pred.alias("p"),
                lex.alias("o_lex"), dt.alias("o_dt"),
                F.lit(None).cast("string").alias("o_lang"),
                num.alias("o_num"), ts.alias("o_ts"),
            ))

    out = pieces[0]
    for piece in pieces[1:]:
        out = out.unionByName(piece)
    return out.select(*QUAD_COLS)


def encode_star_schema(tables: dict[str, DataFrame], graph: str = BASE_GRAPH) -> DataFrame:
    """Encode every known star-schema table present in ``tables`` as one quads DF.

    Deduplicates: RDF graphs are statement *sets* (the reference's store keeps
    one copy of an identical statement), and the fixture ``lineitem`` has
    non-unique (l_orderkey, l_linenumber) pairs, which would otherwise emit
    the same quad multiple times. Properties whose source rows collide simply
    become multi-valued — valid RDF.
    """
    out = None
    for name in TABLE_KEYS:
        if name in tables:
            enc = encode_table(name, tables[name], graph)
            out = enc if out is None else out.unionByName(enc)
    assert out is not None, "no encodable tables supplied"
    return out.dropDuplicates(["g", "s", "p", "o_lex", "o_dt", "o_lang"])
