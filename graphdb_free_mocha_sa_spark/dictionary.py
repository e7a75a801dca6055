"""Term-dictionary encoding (SURVEY §1.4; reference: 32-bit entity ids,
``owlim:entity-index-size``/``entity-id-size``, repo-config.ttl:22-23).

At 100 TB, joining on 8-byte BIGINT ids instead of RDF term strings cuts
shuffle bytes several-fold and makes sort-merge joins cache-friendly. The
dictionary is built with one distinct pass + ``monotonically_increasing_id``
(unique, not dense — exactly what a join key needs, no global coordination),
and the id-encoded quad table carries the original literal shadow columns so
range predicates still push down.

Round-trip: ``encode_quads_ids`` → joins on ``s_id/p_id/o_id`` →
``decode_ids`` restores term strings for result serialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_term_dict(quads: DataFrame) -> DataFrame:
    """``dict(term STRING, id BIGINT)`` over every term position.

    One wide-union distinct (single shuffle); ids assigned per-partition
    without coordination (monotonically_increasing_id), mirroring the
    reference's entity index at unbounded capacity.
    """
    terms = (quads.select(F.col("s").alias("term"))
             .unionByName(quads.select(F.col("p").alias("term")))
             .unionByName(quads.select(F.col("g").alias("term")))
             .unionByName(quads.where(F.col("o_dt").isNull())
                          .select(F.col("o_lex").alias("term")))
             .distinct())
    return terms.withColumn("id", F.monotonically_increasing_id())


def encode_quads_ids(quads: DataFrame, term_dict: DataFrame) -> DataFrame:
    """Quads with BIGINT ``g_id/s_id/p_id/o_id`` (o_id NULL for literals;
    literal lex/shadow columns ride along untouched)."""
    d = term_dict
    out = quads
    for pos in ("g", "s", "p"):
        out = (out.join(d.select(F.col("term").alias(pos),
                                 F.col("id").alias(f"{pos}_id")), pos))
    o_dict = d.select(F.col("term").alias("o_lex"), F.col("id").alias("o_id"))
    iri_o = (out.where(F.col("o_dt").isNull()).join(o_dict, "o_lex"))
    lit_o = (out.where(F.col("o_dt").isNotNull())
             .withColumn("o_id", F.lit(None).cast("long")))
    return iri_o.unionByName(lit_o).drop("g", "s", "p")


def decode_ids(df: DataFrame, term_dict: DataFrame,
               cols: dict[str, str]) -> DataFrame:
    """Join term strings back for the given ``{id_col: out_col}`` mapping."""
    out = df
    for id_col, name in cols.items():
        out = (out.join(term_dict.select(F.col("id").alias(id_col),
                                         F.col("term").alias(name)),
                        id_col, "left").drop(id_col))
    return out
