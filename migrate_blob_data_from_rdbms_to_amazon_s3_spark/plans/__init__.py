"""Query plans exposed through the driver contract (__spark_entry__.py).

Each module defines ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[name, str]`` (DuckDB ANSI-SQL twins). ``collect_all``
merges every module, asserting name uniqueness.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def collect_all() -> tuple[dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]]:
    from . import (
        parity,
        analytics,
        analytics_ext,
        analytics_tpch2,
        temporal,
        sql_surface,
        grouped_map,
        text,
        bpe,
        retrieval,
        dedup,
        text_index_entries,
        contamination,
        similarity,
        projection,
        ann_index_entries,
        ivf_index_entries,
        multimodal,
        quality,
        corpus_ops,
        streaming_entries,
        profiling,
        profiling_stats,
        graph_ops,
        insights,
        survival,
        timeseries_ext,
        stat_tests,
    )

    mods = (
        parity, analytics, analytics_ext, analytics_tpch2, temporal, sql_surface,
        grouped_map, text, bpe, retrieval, dedup, text_index_entries, contamination,
        similarity, projection,
        ann_index_entries,
        ivf_index_entries, multimodal, quality, corpus_ops, streaming_entries, profiling,
        profiling_stats, graph_ops, insights, survival, timeseries_ext, stat_tests,
    )
    queries: dict = {}
    oracles: dict = {}
    for mod in mods:
        q = getattr(mod, "QUERIES", {})
        o = getattr(mod, "ORACLES", {})
        dup = set(q) & set(queries)
        assert not dup, f"duplicate query names: {dup}"
        assert set(o) <= set(q), f"orphan oracles in {mod.__name__}: {set(o) - set(q)}"
        queries.update(q)
        oracles.update(o)
    return queries, oracles
