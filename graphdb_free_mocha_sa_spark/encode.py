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
    """Encode one relational table as quads in a SINGLE scan.

    One row fans out to (1 + n_cols) quads via ``inline`` over an array of
    predicate structs — Catalyst reads the parquet once per table (vs once
    per column for a union-of-projections) and the generate stays inside
    whole-stage codegen. Null columns yield a null ``o_lex`` struct entry,
    filtered after the inline (RDF has no null objects).
    """
    subj = subject_expr(table, df)
    ns, nd, nt = (F.lit(None).cast("string"), F.lit(None).cast("double"),
                  F.lit(None).cast("timestamp"))

    def quad_struct(p, o_lex, o_dt, o_num, o_ts):
        return F.struct(p.alias("p"), o_lex.alias("o_lex"), o_dt.alias("o_dt"),
                        ns.alias("o_lang"), o_num.alias("o_num"),
                        o_ts.alias("o_ts"))

    structs = [quad_struct(F.lit(RDF_TYPE), F.lit(f"{NS}t/{table}"),
                           ns, nd, nt)]
    for col, dtype in df.dtypes:
        pred = F.lit(f"{NS}p/{col}")
        if col in FK_TARGETS:
            obj = F.concat(F.lit(f"{NS}{FK_TARGETS[col]}/"),
                           F.col(col).cast("string"))
            structs.append(quad_struct(pred, obj, ns, nd, nt))
        else:
            lex, dt, num, ts = _literal_parts(col, dtype)
            structs.append(quad_struct(pred, lex, dt, num, ts))

    out = df.select(F.lit(graph).alias("g"), subj.alias("s"),
                    F.inline(F.array(*structs)))
    return out.where(F.col("o_lex").isNotNull()).select(*QUAD_COLS)


def encode_star_schema(tables: dict[str, DataFrame], graph: str = BASE_GRAPH) -> DataFrame:
    """Encode every known star-schema table present in ``tables`` as one quads DF.

    Deduplicates: RDF graphs are statement *sets* (the reference's store keeps
    one copy of an identical statement), and the fixture ``lineitem`` has
    non-unique (l_orderkey, l_linenumber) pairs, which would otherwise emit
    the same quad multiple times. Properties whose source rows collide simply
    become multi-valued — valid RDF.

    Only ``lineitem`` needs the dedup shuffle: every other table has a unique
    primary key, so its quads are distinct by construction — shuffling them
    through dropDuplicates would be pure waste at scale. Within lineitem the
    shuffle is further narrowed to rows whose key actually collides: a cheap
    narrow aggregate finds the colliding keys, those rows' quads go through
    dropDuplicates, unique-key rows bypass it entirely. (If collisions were
    pervasive rather than a fixture quirk, the broadcast would grow and plain
    dropDuplicates over everything would be the right call — AQE's broadcast
    threshold effectively arbitrates.)
    """
    out = None
    for name in TABLE_KEYS:
        if name in tables:
            if name == "lineitem":
                enc = _encode_lineitem_dedup(tables[name], graph)
            else:
                enc = encode_table(name, tables[name], graph)
            out = enc if out is None else out.unionByName(enc)
    assert out is not None, "no encodable tables supplied"
    return out


def _encode_lineitem_dedup(df: DataFrame, graph: str) -> DataFrame:
    keys = TABLE_KEYS["lineitem"]
    dup_keys = (df.groupBy(*keys).count()
                .where(F.col("count") > 1).drop("count"))
    uniq_rows = df.join(F.broadcast(dup_keys), keys, "left_anti")
    dup_rows = df.join(F.broadcast(dup_keys), keys, "left_semi")
    return encode_table("lineitem", uniq_rows, graph).unionByName(
        encode_table("lineitem", dup_rows, graph).dropDuplicates(
            ["g", "s", "p", "o_lex", "o_dt", "o_lang"]))
