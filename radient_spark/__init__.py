"""radient_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of fzliu/radient (see SURVEY.md).

Everything is expressed Spark-first: DataFrame/SQL logical plans optimized
by Catalyst, Arrow-batched Pandas UDFs only where built-ins can't express
the semantics, Structured Streaming for continuous ingest.
"""

from radient_spark.session import get_session
from radient_spark.catalog import TABLES, load_tables, register_views

__all__ = ["get_session", "TABLES", "load_tables", "register_views"]
__version__ = "0.1.0"
