"""graphdb_free_mocha_sa_spark — a PySpark-native analytics/graph engine.

Re-implements, Spark-first, the query and data-processing capabilities of the
reference system (a HOBBIT/MOCHA system adapter wrapping GraphDB Free 8.5:
SPARQL 1.1 Query/Update over an RDF quad store with OWL-Horst inference), plus
large-scale training-data pipeline extensions (dedup, similarity search,
multimodal columns, text analysis).

Architecture: everything is a Spark DataFrame plan. SPARQL strings are parsed
by our own recursive-descent parser into an algebra tree and translated to
DataFrame operations so Catalyst/AQE pick the physical strategy. Recursive
operators (property paths, inference fixpoints) are semi-naive DataFrame loops
with checkpointing. No row-at-a-time Python UDFs in any hot path.
"""

from graphdb_free_mocha_sa_spark.session import get_spark
from graphdb_free_mocha_sa_spark.store import (DurableQuadStore, QuadStore,
                                               open_fixture_store)
from graphdb_free_mocha_sa_spark.engine import Engine

__all__ = ["get_spark", "QuadStore", "DurableQuadStore",
           "open_fixture_store", "Engine"]
__version__ = "0.1.0"
