"""hadoop_stuff_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the reference repo olegz/hadoop-stuff
(surveyed in SURVEY.md), re-expressed Spark-first:

- parallel compressed ingest of line-oriented records (gzip-chunk /
  base64-gzip-line legacy codecs; Parquet as the native store)
- batch queries: distributed grep (regex filter), record count
  (partial+final aggregation), plus the full relational surface of Spark SQL
- streaming "wiretap": file-tail source + dynamically registered regex
  subscriptions fanned out per micro-batch (no reflection, no restart)
- LLM-data-pipeline extensions: exact/near dedup (MinHash-LSH, SimHash,
  n-gram Jaccard), embedding similarity search, multimodal binary columns,
  text analysis

Everything is DataFrame/Catalyst-first; Python UDFs only where the JVM has
no equivalent (gzip codec, SimHash), and then always Arrow-batched.
"""

from hadoop_stuff_spark.catalog import TABLES, load_tables, register_views
from hadoop_stuff_spark.engine import Engine
from hadoop_stuff_spark.session import get_spark

__all__ = ["Engine", "get_spark", "load_tables", "register_views", "TABLES"]
__version__ = "0.4.0"  # round 4
