"""Registry entries for the persisted MinHash-LSH text index
(build-once / probe-many — operators/text_index).

- ``text_index_neardup_persisted`` — builds the standing index at a
  temp path over the full documents fixture, then computes the
  registry-internal near-dup pairs purely FROM the stored tables (no
  signature/shingle/window stage at probe time). Value-identical to
  ``dedup_minhash_lsh``, so it SHARES that query's DuckDB oracle — the
  cross-engine proof the persisted path computes the same index.
- ``text_index_ingest_persisted`` — builds the index over the REGISTRY
  slice (doc_id % 3 != 0, the dedup_incremental convention), appends
  nothing, and probes it with the batch slice. Value-identical to
  ``dedup_incremental_lsh`` (shares its oracle): batch signatures are
  the only signing work; the registry side comes pre-capped from
  storage.

At 100 TB: the registry's signatures and band buckets are computed in
ONE corpus scan and every subsequent drop pays only batch-sized work —
the text-side answer to VERDICT r7 item 1's build-once/probe-many.
Append/crash-detection semantics live in operators/text_index and are
pinned by tests/test_text_index.py.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ..operators.text_index import (
    build_text_index,
    ingest_text_persisted,
    neardup_text_persisted,
)
from .dedup import ORACLES as _DEDUP_ORACLES
from .dedup import _docs


def q_text_index_neardup_persisted(spark, sf_dir):
    """dedup_minhash_lsh over the standing index (module docstring)."""
    path = tempfile.mkdtemp(prefix="text_idx_")
    build_text_index(_docs(spark, sf_dir), path)
    return neardup_text_persisted(spark, path)


def q_text_index_ingest_persisted(spark, sf_dir):
    """dedup_incremental_lsh as a probe of the standing registry index."""
    docs = _docs(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="text_idx_ing_")
    build_text_index(docs.filter(F.col("doc_id") % 3 != 0), path)
    return ingest_text_persisted(spark, docs.filter(F.col("doc_id") % 3 == 0), path)


QUERIES = {
    "text_index_neardup_persisted": q_text_index_neardup_persisted,
    "text_index_ingest_persisted": q_text_index_ingest_persisted,
}

ORACLES = {
    "text_index_neardup_persisted": _DEDUP_ORACLES["dedup_minhash_lsh"],
    "text_index_ingest_persisted": _DEDUP_ORACLES["dedup_incremental_lsh"],
}
