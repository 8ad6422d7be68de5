"""Multimodal-column queries: binary payload → typed metadata via the
Arrow-batched ``mapInPandas`` plumbing in operators/multimodal.py.

The payload is derived deterministically (utf-8 bytes of documents.text
standing in for an image/audio blob, exactly like the reference's LONGBLOB
fixtures), so the fake-decode output is fully oracle-checkable: n_bytes =
octet_length, content_md5 = md5 of the same bytes, dims are modular
functions of the size.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.multimodal import audio_window_stats, extract_media_meta, sample_frames

FRAME_BYTES = 64  # small stride so fixture docs produce multiple "frames"


def _payloads(spark, sf_dir):
    # repartition: one input file would mean ONE Python worker for the
    # mapInPandas stage; spreading gives a worker per core
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
        .repartition(spark.sparkContext.defaultParallelism)
    )


def q_multimodal_meta(spark, sf_dir):
    return extract_media_meta(_payloads(spark, sf_dir))


def q_multimodal_frames(spark, sf_dir):
    return sample_frames(_payloads(spark, sf_dir), "doc_id", "payload", FRAME_BYTES)


def q_multimodal_audio_windows(spark, sf_dir):
    """Per-window amplitude stats over the fake-PCM payload (see
    operators/multimodal.audio_window_stats): integer-exact sums inside
    the Arrow kernel make every float bit-reproducible in DuckDB."""
    return audio_window_stats(_payloads(spark, sf_dir), "doc_id", "payload", FRAME_BYTES)


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_audio_windows": q_multimodal_audio_windows,
}

# The audio/frames oracles index CHARACTERS (substr/ascii are
# codepoint-based) while the Spark kernels read raw payload BYTES — equal
# only while the fixture text is pure ASCII. The `_ASCII_N` guard makes
# that contract self-enforcing: any non-ASCII row raises a DuckDB error()
# at oracle time instead of silently hash-mismatching (ADVICE r4). A real
# non-ASCII corpus needs a byte-level oracle (unnest over blob bytes).
_ASCII_N = (
    "CASE WHEN length(text) <> octet_length(encode(text)) "
    "THEN error('non-ASCII document text: byte-level oracle required') "
    "ELSE octet_length(encode(text)) END"
)

ORACLES = {
    "multimodal_audio_windows": f"""
        WITH d AS (
            SELECT doc_id, text, {_ASCII_N} AS n FROM documents
        ),
        w AS (
            SELECT doc_id, text, n,
                   UNNEST(generate_series(0, n - 1, {FRAME_BYTES})) AS off
            FROM d
        ),
        s AS (
            SELECT doc_id, off,
                   CAST(off / {FRAME_BYTES} AS INTEGER) AS window_idx,
                   LEAST({FRAME_BYTES}, n - off) AS n_samples,
                   list_transform(generate_series(1, LEAST({FRAME_BYTES}, n - off)),
                                  i -> ascii(substr(text, off + i, 1))) AS codes
            FROM w
        )
        SELECT doc_id, window_idx, CAST(n_samples AS INTEGER) AS n_samples,
               ROUND(list_reduce(codes, (x, y) -> x + y) / CAST(n_samples AS DOUBLE), 4)
                 AS mean_amp,
               CAST(list_reduce(codes, (x, y) -> CASE WHEN x > y THEN x ELSE y END)
                    AS INTEGER) AS peak,
               ROUND(sqrt(list_reduce(list_transform(codes, c -> c * c),
                                      (x, y) -> x + y) / CAST(n_samples AS DOUBLE)), 4)
                 AS rms
        FROM s
    """,
    "multimodal_meta": """
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS INT) AS n_bytes,
               md5(text) AS content_md5,
               CAST(octet_length(encode(text)) % 1024 AS INT) AS width,
               CAST((octet_length(encode(text)) * 7) % 768 AS INT) AS height,
               3 AS channels
        FROM documents
    """,
    # md5 over a character substring equals md5 over the corresponding
    # payload bytes only under the ASCII contract _ASCII_N enforces.
    "multimodal_frames": f"""
        WITH d AS (
            SELECT doc_id, text, {_ASCII_N} AS n
            FROM documents
        )
        SELECT doc_id,
               CAST(i AS INT) AS frame_idx,
               CAST(i * {FRAME_BYTES} AS INT) AS frame_offset,
               md5(substring(text, 1 + i * {FRAME_BYTES}, {FRAME_BYTES})) AS frame_md5
        FROM d, LATERAL (
            SELECT unnest(generate_series(0, CAST(ceil(n / {FRAME_BYTES}.0) AS INT) - 1)) AS i
        )
    """,
}
