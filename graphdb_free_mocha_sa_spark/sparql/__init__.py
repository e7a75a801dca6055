from graphdb_free_mocha_sa_spark.sparql.parser import parse_query, parse_update
from graphdb_free_mocha_sa_spark.sparql.translator import Translator

__all__ = ["parse_query", "parse_update", "Translator"]
