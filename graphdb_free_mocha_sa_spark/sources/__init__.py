from graphdb_free_mocha_sa_spark.sources.registry import load_tables, load_quads

__all__ = ["load_tables", "load_quads"]
