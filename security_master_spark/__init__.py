"""security_master_spark — a PySpark-native analytics engine.

Re-expresses the capability surface of the reference securities-master
pipeline (see SURVEY.md; reference checkout was empty, surface
reconstructed from driver metadata + public domain knowledge) as an
idiomatic Spark DataFrame/SQL engine, extended with LLM-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).

Design principles (SURVEY.md §4):
- Declarative DataFrame/SQL plans; Catalyst+AQE do the optimizing.
- Built-in JVM functions in hot paths; Arrow-batched pandas UDFs only
  where built-ins cannot express the semantics.
- Every operator designed for a 1000-executor / 100 TB deployment even
  though tests run on local mode: broadcast small dims, shuffle only on
  declared keys, no driver-side collects inside operators.
"""

from security_master_spark.session import configure_session, get_spark
from security_master_spark.datasets import TABLES, load_table, load_tables

__all__ = [
    "configure_session",
    "get_spark",
    "TABLES",
    "load_table",
    "load_tables",
]

__version__ = "0.4.0"
