"""PySpark-native analytics engine with the query and data-processing
capabilities of ``aws-samples/migrate-blob-data-from-rdbms-to-amazon-s3``.

The reference (see ``SURVEY.md``) is an RDBMS→S3 blob-migration sample whose
data-processing surface is: paginated ordered scans, point lookups, keyed
mutations (insert/update/delete on a PK), blob encode/decode/externalize, a
dual-source bridge read, and a handful of scalar functions. This package
re-expresses that surface — plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns) — as
idiomatic PySpark: declarative DataFrame plans optimized by Catalyst, Parquet
columnar storage, broadcast/AQE-aware joins, and Pandas UDFs only where
built-ins genuinely cannot express the semantics.

Design stance (SURVEY.md §7): DataFrame/SQL only, no RDDs, explicit schemas,
plain Parquet as the table format, side effects confined to
``foreachPartition`` sinks.
"""

from .session import get_spark  # noqa: F401
from .catalog import Catalog, TABLES  # noqa: F401

__version__ = "0.1.0"
