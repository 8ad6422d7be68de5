"""CSV / JSON-lines ingest with an explicit schema and quarantined bad
records — the flat-file side door every warehouse keeps next to its JDBC
and object-store connectors (reference analog: none; the reference's only
tabular source is MySQL, SURVEY §2 A16 — this is the §7 source-surface
extension).

Design rules, both formats:

- **Explicit schema, never inference.** Schema inference is an extra full
  scan of 100 TB before the real one, and it lets a single malformed file
  silently retype a column for the whole read. Callers pass DDL.
- **Parse as an expression, not a file-format option.** The files are
  read with the plain ``text`` source and parsed with ``from_csv`` /
  ``from_json`` carrying a corrupt-record field. Spark's file-level
  PERMISSIVE mode forbids any query whose referenced columns are only the
  internal ``_corrupt_record`` (QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless
  the parsed read is cached — and caching a 100 TB parse to slice out bad
  lines is the wrong trade. Expression-level parsing has no such
  restriction: clean and quarantine are two pruned consumers of one text
  scan definition.
- **Quarantine, don't drop or fail.** Malformed lines come back verbatim
  as ``raw_line`` for a quarantine sink; clean rows flow on. At 100 TB
  there is *always* a malformed row, and rerun-from-scratch (FAILFAST)
  costs more than a quarantine partition; DROPMALFORMED loses the
  evidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def _split(parsed: DataFrame) -> tuple[DataFrame, DataFrame]:
    corrupt = F.col(f"r.{CORRUPT_COL}")
    clean = parsed.filter(corrupt.isNull()).select("r.*").drop(CORRUPT_COL)
    quarantine = parsed.filter(corrupt.isNotNull()).select(
        F.col("value").alias("raw_line")
    )
    return clean, quarantine


def read_csv_clean(
    spark: SparkSession,
    path: str,
    schema_ddl: str,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read CSV at ``path`` with the declared schema. Returns
    ``(clean, quarantine)``: typed clean rows, and malformed raw lines
    (one ``raw_line`` column) for the quarantine sink.

    With ``header=True`` the header line is recognized by exact match
    against the declared column names (the files' column order must match
    the DDL — the contract an explicit-schema ingest asserts anyway) and
    excluded from both outputs."""
    full_ddl = f"{schema_ddl}, {CORRUPT_COL} STRING"
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL, "sep": sep}
    raw = spark.read.text(path)
    if header:
        cols = [c.strip().split()[0] for c in schema_ddl.split(",")]
        raw = raw.filter(F.col("value") != sep.join(cols))
    parsed = raw.select("value", F.from_csv("value", full_ddl, opts).alias("r"))
    return _split(parsed)


def read_jsonl_clean(
    spark: SparkSession, path: str, schema_ddl: str
) -> tuple[DataFrame, DataFrame]:
    """Read JSON-lines at ``path`` with the declared schema; same
    clean/quarantine contract as ``read_csv_clean``."""
    full_ddl = f"{schema_ddl}, {CORRUPT_COL} STRING"
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL}
    raw = spark.read.text(path)
    parsed = raw.select("value", F.from_json("value", full_ddl, opts).alias("r"))
    return _split(parsed)
