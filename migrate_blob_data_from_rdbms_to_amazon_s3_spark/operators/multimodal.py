"""Multimodal (binary) column operators — image/audio/video as opaque
``BinaryType`` payloads with typed metadata.

The reference's whole purpose is moving exactly such payloads (LONGBLOB,
order_rdbms_blob.sql:5) between stores; this module adds the processing
side a training-data pipeline needs: decode / feature-extract / resize /
frame-sample, implemented as Arrow-batched ``mapInPandas`` stages so each
Python worker handles a columnar batch (never row-at-a-time).

The actual codec libraries (PIL/ffmpeg/librosa) are not available in this
container, so the decode kernels are STUBBED: ``decode_image``/
``decode_audio`` raise ``NotImplementedError`` unless a deterministic fake
is requested. The Spark-side plumbing — schema, batching, partitioning,
UDF signatures — is real and tested; swapping in a real codec is a
one-function change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

def _id_field(df: DataFrame, id_col: str) -> T.StructField:
    """Output id field named AND typed from the caller's id column — a
    caller passing ``id_col='video_id'`` gets ``video_id`` back, not a
    silently relabeled ``doc_id`` (ADVICE r4)."""
    return T.StructField(id_col, df.schema[id_col].dataType)


def _media_meta_schema(df: DataFrame, id_col: str) -> T.StructType:
    return T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("content_md5", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
        ]
    )


def decode_image(payload: bytes):
    """Real image decode for non-PNG formats — requires a codec library
    this container lacks (PNG decodes for real: see decode_png_pixels)."""
    raise NotImplementedError(
        "JPEG/GIF/video codecs unavailable in this environment; "
        "PNG has a real stdlib decoder (decode_png_pixels); "
        "use fake_decode_meta for the rest"
    )


def decode_audio(payload: bytes):
    """COMPRESSED audio decode — requires a codec library this container
    lacks. WAV PCM16 decodes for real: see decode_wav_pcm16 (r12)."""
    raise NotImplementedError(
        "compressed-audio codecs unavailable in this environment; "
        "WAV PCM16 has a real stdlib decoder (decode_wav_pcm16); "
        "use fake_decode_meta for the rest"
    )


def fake_decode_meta(payload: bytes) -> tuple[int, str, int, int, int]:
    """Deterministic stand-in for a decoder: derives metadata purely from
    the bytes so the pipeline is testable end-to-end (and oracle-checkable)."""
    n = len(payload)
    return n, hashlib.md5(payload).hexdigest(), n % 1024, (n * 7) % 768, 3


def extract_media_meta(df: DataFrame, id_col: str = "doc_id", blob_col: str = "payload") -> DataFrame:
    """mapInPandas media-metadata extraction over a binary column.

    Arrow moves each partition to Python in columnar batches; the kernel
    is vectorized per batch. Partitioning is preserved (no shuffle) —
    at 100 TB this runs as one narrow stage sized by the input splits.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_meta(b) for b in pdf[blob_col]]
            out = pd.DataFrame(
                metas, columns=["n_bytes", "content_md5", "width", "height", "channels"]
            )
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, blob_col).mapInPandas(
        kernel, _media_meta_schema(df, id_col)
    )


def _resize_schema(df: DataFrame, id_col: str) -> T.StructType:
    return T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("out_width", T.IntegerType()),
            T.StructField("out_height", T.IntegerType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("resized_md5", T.StringType()),
        ]
    )


def audio_window_stats(
    df: DataFrame, id_col: str, blob_col: str, window_bytes: int = 64
) -> DataFrame:
    """Windowed audio-feature plumbing: the payload is treated as
    unsigned 8-bit PCM and reduced to per-window (mean, peak, RMS) — the
    shape a real feature extractor (spectrogram, VAD) emits. Stats use
    exact integer sums before one final float division/sqrt, so the
    numbers are bit-reproducible against the SQL oracle. Arrow-batched
    mapInPandas; a real decoder swaps in at decode_audio."""
    schema = T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("window_idx", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("mean_amp", T.DoubleType()),
            T.StructField("peak", T.IntegerType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        def r4(x: float) -> float:
            # SQL ROUND is half-away-from-zero; Python round() is
            # half-to-even — sum/64 means hit exact binary halves, so the
            # difference is real, not theoretical (x >= 0 here)
            return math.floor(x * 10_000 + 0.5) / 10_000

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                arr = np.frombuffer(bytes(blob), dtype=np.uint8).astype(np.int64)
                for idx, off in enumerate(range(0, len(arr), window_bytes)):
                    w = arr[off : off + window_bytes]
                    n = int(len(w))
                    ss = int(np.sum(w * w))
                    rows.append(
                        (
                            doc_id,
                            idx,
                            n,
                            r4(int(np.sum(w)) / n),
                            int(w.max()),
                            r4(math.sqrt(ss / n)),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "window_idx", "n_samples", "mean_amp", "peak", "rms"],
            )

    return df.select(id_col, blob_col).mapInPandas(kernel, schema)


# --- real WAV PCM16 sample decode (round 12, VERDICT r11 item 4) -----------
# RIFF grammar per the public RIFF/WAVE layout (the same chunk-scan
# discipline as parse_media_header): 4-byte ckID + LE uint32 cksize +
# data, padded to even. fmt fields LE per the canonical PCM layout. WAV
# PCM16 is pure byte arithmetic — no codec, the exact precedent
# decode_png_pixels set for images. Compressed audio (MP3/AAC/…) remains
# the documented codec seam in decode_audio.


def decode_wav_pcm16(payload: bytes) -> tuple[int, int, list[int]]:
    """REAL WAV decode with the stdlib only: verify the RIFF/WAVE
    signature, walk the chunks (LE sizes, even padding — a JUNK chunk
    between fmt and data must not derail the scan), parse the fmt chunk
    (PCM only), and decode the data chunk as little-endian signed 16-bit
    interleaved samples. Returns (channels, sample_rate, samples).
    Raises ValueError on malformed input (bad signature, truncated
    chunk, missing fmt/data, sample bytes not a multiple of the block
    align) and NotImplementedError on the documented out-of-subset
    cases (non-PCM format tags, bit depths other than 16)."""
    import struct

    p = bytes(payload)
    if len(p) < 12 or p[:4] != b"RIFF" or p[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file (bad signature)")
    o, fmt, data = 12, None, None
    while o + 8 <= len(p):
        ckid = p[o : o + 4]
        ln = int.from_bytes(p[o + 4 : o + 8], "little")
        if o + 8 + ln > len(p):
            raise ValueError(f"truncated {ckid!r} chunk")
        body = p[o + 8 : o + 8 + ln]
        if ckid == b"fmt ":
            fmt = body
        elif ckid == b"data":
            data = body
        o += 8 + ln + (ln & 1)  # RIFF pads odd chunks to even
    if fmt is None or len(fmt) < 16:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    tag, channels, rate, _brate, block, bits = struct.unpack("<HHIIHH", fmt[:16])
    if tag != 1:
        raise NotImplementedError(
            f"compressed WAV (format tag {tag}) needs a codec; "
            "only PCM decodes here (see decode_audio)"
        )
    if bits != 16:
        raise NotImplementedError(f"only PCM16 is decoded (got {bits}-bit)")
    if channels < 1:
        raise ValueError("fmt declares zero channels")
    if block != channels * 2:
        raise ValueError(f"block align {block} != channels*2 ({channels * 2})")
    if len(data) % 2:
        raise ValueError("data chunk length is not sample-aligned")
    samples = [
        int.from_bytes(data[i : i + 2], "little", signed=True)
        for i in range(0, len(data), 2)
    ]
    return channels, rate, samples


def wav_window_stats(
    df: DataFrame, id_col: str, blob_col: str, window_samples: int = 64
) -> DataFrame:
    """Windowed amplitude stats over REAL decoded PCM16 samples — the
    r12 closure of the audio seam (audio_window_stats keeps the fake-u8
    twin for raw-byte plumbing). Per non-empty window of the
    interleaved sample stream: exact integer sum / sum-of-squares /
    peak absolute amplitude, plus the derived mean and RMS rounded with
    DuckDB's half-AWAY-FROM-ZERO semantics (sign-aware floor mirror —
    the signed mean can be negative, where half-to-even or plain
    floor(+0.5) would diverge). fmt fields (channels, sample_rate) ride
    on every row so the oracle pins the header parse too."""
    schema = T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("window_idx", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("sum_amp", T.LongType()),
            T.StructField("sum_sq", T.LongType()),
            T.StructField("peak_abs", T.IntegerType()),
            T.StructField("mean_amp", T.DoubleType()),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        def r4(x: float) -> float:
            # DuckDB ROUND(x, 4) is half away from zero on both signs
            s = -1.0 if x < 0 else 1.0
            return s * math.floor(abs(x) * 10_000 + 0.5) / 10_000

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                ch, rate, samples = decode_wav_pcm16(bytes(blob))
                arr = np.asarray(samples, dtype=np.int64)
                for idx, off in enumerate(range(0, len(arr), window_samples)):
                    w = arr[off : off + window_samples]
                    n = int(len(w))
                    s = int(np.sum(w))
                    ss = int(np.sum(w * w))
                    rows.append(
                        (
                            doc_id,
                            ch,
                            rate,
                            idx,
                            n,
                            s,
                            ss,
                            int(np.max(np.abs(w))),
                            r4(s / n),
                            r4(math.sqrt(ss / n)),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "channels", "sample_rate", "window_idx",
                    "n_samples", "sum_amp", "sum_sq", "peak_abs",
                    "mean_amp", "rms",
                ],
            )

    return df.select(id_col, blob_col).mapInPandas(kernel, schema)


def build_wav_pcm16_fixture(doc_id: int, body: bytes) -> bytes:
    """Deterministic REAL PCM16 WAV for a document: each body byte b
    becomes the sample (b - 128) * 256 (exact int16 range, stated
    independently by the SQL oracle), interleaved as-is. A JUNK chunk of
    data-dependent even length sits between fmt and data so a decoder
    that assumes the canonical 44-byte layout — instead of walking the
    chunks — reads garbage and hash-fails. channels/rate are simple
    functions of doc_id (channels never divides some sample counts, so
    ragged final frames exercise the alignment-tolerant path)."""
    import struct

    n = len(body)
    channels = doc_id % 2 + 1
    rate = 8000 + (doc_id % 5) * 1000
    block = channels * 2
    junk = bytes((doc_id + j) % 256 for j in range((doc_id % 4) * 2))
    data = b"".join(struct.pack("<h", (b - 128) * 256) for b in body)
    return (
        b"RIFF"
        + struct.pack("<I", 4 + (8 + 16) + (8 + len(junk)) + (8 + len(data)))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, 16)
        + b"JUNK"
        + struct.pack("<I", len(junk))
        + junk
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def resize_images(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "payload",
    width: int = 64, height: int = 64,
) -> DataFrame:
    """Resize plumbing: binary in → (smaller) binary out with target dims.
    A real implementation decodes with a codec and interpolates; this
    container has no codec (see decode_image), so the STUB emits a
    deterministic byte subsample of length width*height — preserving the
    real pipeline shape (binary→binary map, output strictly smaller,
    per-batch vectorizable) so schema/partitioning/testing are honest."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = width * height
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                data = bytes(blob)
                stride = max(1, len(data) // n_out) if data else 1
                out = data[::stride][:n_out]
                rows.append(
                    (doc_id, width, height, out, hashlib.md5(out).hexdigest())
                )
            yield pd.DataFrame(
                rows,
                columns=[id_col, "out_width", "out_height", "resized", "resized_md5"],
            )

    return df.select(id_col, blob_col).mapInPandas(kernel, _resize_schema(df, id_col))


def sample_frames(df: DataFrame, id_col: str, blob_col: str, every_n_bytes: int = 4096) -> DataFrame:
    """Frame-sampling plumbing: emits one row per sampled "frame" offset
    (a real video decoder would emit decoded frames; the stub emits the
    offsets + a per-frame digest so the fan-out shape is exercised).

    The digest is md5 over the UPPERCASE HEX of the frame bytes, not the
    raw bytes: an equally deterministic byte-content fingerprint that a
    SQL oracle can recompute on ANY payload (round 7 — DuckDB's md5 only
    hashes VARCHAR, so a raw-bytes digest was only checkable on ASCII
    fixtures; hex makes the check byte-grain for arbitrary binary)."""
    schema = T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_offset", T.IntegerType()),
            T.StructField("frame_md5", T.StringType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                for idx, off in enumerate(range(0, len(blob), every_n_bytes)):
                    chunk = bytes(blob[off : off + every_n_bytes])
                    digest = hashlib.md5(chunk.hex().upper().encode()).hexdigest()
                    rows.append((doc_id, idx, off, digest))
            yield pd.DataFrame(
                rows, columns=[id_col, "frame_idx", "frame_offset", "frame_md5"]
            )

    return df.select(id_col, blob_col).mapInPandas(kernel, schema)


# --- real header parsing (round 8, VERDICT r7 item 6) -----------------------
# PNG signature per ISO/IEC 15948 §5.2; IHDR layout §11.2.2. WAV/RIFF fmt
# chunk layout per the RIFF/WAVE spec (chunk scan, not a fixed offset, so
# JUNK/LIST chunks before `fmt ` parse correctly). JPEG frame headers per
# ITU-T T.81 §B.2.2 (marker-segment walk to SOFn). GIF logical screen
# descriptor per GIF89a spec §18.
PNG_SIG = b"\x89PNG\r\n\x1a\n"
# IHDR color type -> sample channels (§11.2.2: greyscale 1, truecolour 3,
# indexed 1, grey+alpha 2, truecolour+alpha 4)
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# T.81 SOFn markers carrying frame dimensions: C0-C3, C5-C7, C9-CB, CD-CF
# (C4=DHT, C8=JPG reserved, CC=DAC are NOT frame headers)
_JPEG_SOF = {m for m in range(0xC0, 0xD0)} - {0xC4, 0xC8, 0xCC}
# standalone markers with no length field (T.81 §B.1.1.3): TEM, RST0-7
_JPEG_STANDALONE = {0x01} | set(range(0xD0, 0xD8))


def parse_media_header(payload: bytes):
    """(format, width, height, channels, sample_rate, bit_depth) from the
    REAL container header in pure byte arithmetic — no codec library:

    - PNG: IHDR width/height (big-endian uint32 at offsets 16/20), bit
      depth (byte 24), channels from the colour type (byte 25).
    - WAV: RIFF chunk scan for ``fmt `` — channels (LE uint16 at chunk+10),
      sample rate (LE uint32 at chunk+12), bits/sample (LE uint16 at
      chunk+22); odd-sized chunks consume a pad byte per the RIFF rule.
    - JPEG: marker-segment walk (T.81 §B.1.1.4 — each non-standalone
      segment carries a big-endian length that includes itself; fill
      bytes before a marker are legal) to the first SOFn frame header:
      sample precision (byte 0 of the segment payload), height/width
      (BE uint16 at +1/+3), component count (+5). Any SOFn (baseline,
      progressive, lossless, arithmetic) parses — the walk skips DHT/
      DAC/APPn/COM and restart markers.
    - GIF: logical screen descriptor — width/height (LE uint16 at 6/8),
      palette bit depth from the packed byte's low 3 bits (+1);
      channels reported as 1 (indexed color).

    Pixel/sample DECODE remains the documented codec seam
    (decode_image/decode_audio) — this parses exactly the fields the
    container stores uncompressed."""
    p = bytes(payload)
    if p[:8] == PNG_SIG and len(p) >= 26 and p[12:16] == b"IHDR":
        return (
            "png",
            int.from_bytes(p[16:20], "big"),
            int.from_bytes(p[20:24], "big"),
            _PNG_CHANNELS.get(p[25]),
            None,
            int(p[24]),
        )
    if p[:4] == b"RIFF" and p[8:12] == b"WAVE":
        o = 12
        while o + 8 <= len(p):
            size = int.from_bytes(p[o + 4 : o + 8], "little")
            if p[o : o + 4] == b"fmt " and o + 24 <= len(p):
                return (
                    "wav",
                    None,
                    None,
                    int.from_bytes(p[o + 10 : o + 12], "little"),
                    int.from_bytes(p[o + 12 : o + 16], "little"),
                    int.from_bytes(p[o + 22 : o + 24], "little"),
                )
            o += 8 + size + (size & 1)  # RIFF pads odd chunks
        return ("wav", None, None, None, None, None)
    if p[:2] == b"\xff\xd8":  # SOI
        o = 2
        while o + 4 <= len(p):
            if p[o] != 0xFF:
                break  # not a marker where one is required: stop honestly
            while o < len(p) and p[o] == 0xFF:
                o += 1  # fill bytes (§B.1.1.2) collapse into the marker
            if o >= len(p):
                break
            marker = p[o]
            o += 1
            if marker in _JPEG_STANDALONE:
                continue
            if marker in (0xD9, 0xDA):
                # EOI, or SOS with no SOFn seen yet: what follows SOS is
                # the entropy-coded stream, not marker segments — walking
                # it as segments can synthesize garbage dimensions from
                # compressed bytes. Stop with the typed-unknown result.
                break
            if o + 2 > len(p):
                break
            seg_len = int.from_bytes(p[o : o + 2], "big")
            if seg_len < 2:
                break  # T.81 B.1.1.4: the length field includes its own
                # 2 bytes — a smaller value is malformed, stop typed
            if marker in _JPEG_SOF and o + 7 <= len(p):
                return (
                    "jpeg",
                    int.from_bytes(p[o + 5 : o + 7], "big"),
                    int.from_bytes(p[o + 3 : o + 5], "big"),
                    int(p[o + 7]) if o + 8 <= len(p) else None,
                    None,
                    int(p[o + 2]),
                )
            o += seg_len
        return ("jpeg", None, None, None, None, None)
    if p[:6] in (b"GIF87a", b"GIF89a") and len(p) >= 11:
        return (
            "gif",
            int.from_bytes(p[6:8], "little"),
            int.from_bytes(p[8:10], "little"),
            1,
            None,
            (p[10] & 0x07) + 1,
        )
    return ("unknown", None, None, None, None, None)


def extract_media_header(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "payload"
) -> DataFrame:
    """mapInPandas header-metadata extraction: one narrow Arrow stage, no
    shuffle — the real-format sibling of extract_media_meta (which keeps
    the deterministic fake for codec-level fields)."""
    schema = T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("format", T.StringType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("sample_rate", T.IntegerType()),
            T.StructField("bit_depth", T.IntegerType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                fmt, w, h, ch, rate, bits = parse_media_header(blob)
                rows.append((doc_id, fmt, len(bytes(blob)), w, h, ch, rate, bits))
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col,
                    "format",
                    "n_bytes",
                    "width",
                    "height",
                    "channels",
                    "sample_rate",
                    "bit_depth",
                ],
            )

    return df.select(id_col, blob_col).mapInPandas(kernel, schema)


# --- real PNG pixel decode (round 11, VERDICT r10 item 5) -------------------
# Everything below is pure stdlib byte arithmetic per ISO/IEC 15948:
# chunk grammar §5.3 (length + type + data + CRC-32 over type||data),
# IHDR §11.2.2, DEFLATE datastream §10 (stdlib zlib), filter
# reconstruction §9 (types 0-4: None/Sub/Up/Average/Paeth). Supported
# subset: bit depth 8, colour types 0/2/4/6 (grey, RGB, grey+alpha,
# RGBA), non-interlaced — palette and Adam7 stay typed
# NotImplementedError seams (they need no codec, just more arithmetic;
# nothing in the fleet produces them).


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor, §9.4 — the spec's exact tie-break order (left,
    up, upper-left)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png_pixels(payload: bytes) -> tuple[int, int, int, bytes]:
    """REAL PNG decode with the stdlib only: walk the chunks (verifying
    each CRC-32), parse IHDR, inflate the concatenated IDAT stream with
    zlib, and reverse the per-scanline filters (§9.2 reconstruction
    functions). Returns (width, height, channels, pixel bytes in
    row-major order). Raises ValueError on malformed input (bad
    signature/CRC/stream length) and NotImplementedError on the
    documented out-of-subset cases (depth != 8, palette, interlace)."""
    import zlib

    p = bytes(payload)
    if p[:8] != PNG_SIG:
        raise ValueError("not a PNG (bad signature)")
    o, ihdr, idat = 8, None, bytearray()
    while o + 12 <= len(p):
        ln = int.from_bytes(p[o : o + 4], "big")
        typ = p[o + 4 : o + 8]
        if o + 12 + ln > len(p):
            raise ValueError("truncated chunk")
        data = p[o + 8 : o + 8 + ln]
        crc = int.from_bytes(p[o + 8 + ln : o + 12 + ln], "big")
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        o += 12 + ln
    if ihdr is None or len(ihdr) != 13:
        raise ValueError("missing IHDR")
    w = int.from_bytes(ihdr[0:4], "big")
    h = int.from_bytes(ihdr[4:8], "big")
    depth, ctype, comp, filt, interlace = ihdr[8:13]
    if comp != 0 or filt != 0:
        raise ValueError("unknown compression/filter method")
    if depth != 8 or ctype not in (0, 2, 4, 6) or interlace != 0:
        raise NotImplementedError(
            "supported subset is 8-bit grey/RGB/grey+alpha/RGBA, "
            "non-interlaced (palette/Adam7/16-bit out of subset)"
        )
    ch = _PNG_CHANNELS[ctype]
    # typed-error contract (r11 advice): a CRC-valid chunk walk can still
    # carry no IDAT at all, or a corrupt deflate stream — both are
    # malformed INPUT, so surface ValueError, never a bare zlib.error
    if not idat:
        raise ValueError("no IDAT chunks")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"bad IDAT stream: {e}") from e
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT stream length mismatch")
    out = bytearray()
    prev = bytes(stride)
    pos = 0
    bpp = ch  # bytes per complete pixel at depth 8
    for _r in range(h):
        ft = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        pos += stride
        if ft == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ft == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                ul = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ft != 0:
            raise ValueError(f"unknown filter type {ft}")
        out += line
        prev = bytes(line)
    return w, h, ch, bytes(out)


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def png_fixture_dims(n: int) -> tuple[int, int]:
    """(width, height) of the pixel fixture for an n-byte body — simple
    integer functions a SQL oracle states independently."""
    w = min(32, max(1, n))
    h = max(1, (n + w - 1) // w)
    return w, h


def build_png_pixel_fixture(doc_id: int, body: bytes) -> bytes:
    """A COMPLETE real greyscale PNG whose pixel bytes ARE the document
    bytes (row-major, zero-padded to the last row), encoded with a
    genuinely varying filter per scanline (row % 5 → None/Sub/Up/
    Average/Paeth) and one deterministic zlib stream. The decoder must
    reverse every filter type, every chunk CRC, and the inflate to
    reproduce the body — so pixel stats computed after decode are
    byte-grain checkable against the raw document text."""
    import struct
    import zlib

    n = len(body)
    w, h = png_fixture_dims(n)
    raw = body + bytes(w * h - n)
    prev = bytes(w)
    stream = bytearray()
    for r in range(h):
        line = raw[r * w : (r + 1) * w]
        ft = r % 5
        stream.append(ft)
        if ft == 0:
            stream += line
        elif ft == 1:  # Sub (bpp=1: left neighbor)
            stream += bytes(
                (line[i] - (line[i - 1] if i else 0)) & 0xFF for i in range(w)
            )
        elif ft == 2:  # Up
            stream += bytes((line[i] - prev[i]) & 0xFF for i in range(w))
        elif ft == 3:  # Average
            stream += bytes(
                (line[i] - ((line[i - 1] if i else 0) + prev[i]) // 2) & 0xFF
                for i in range(w)
            )
        else:  # Paeth
            stream += bytes(
                (
                    line[i]
                    - _paeth(
                        line[i - 1] if i else 0,
                        prev[i],
                        prev[i - 1] if i else 0,
                    )
                )
                & 0xFF
                for i in range(w)
            )
        prev = line
    ihdr = struct.pack(">II5B", w, h, 8, 0, 0, 0, 0)  # 8-bit greyscale
    return (
        PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(stream), 6))
        + _png_chunk(b"IEND", b"")
    )


def extract_png_pixel_stats(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "payload"
) -> DataFrame:
    """mapInPandas REAL-pixel statistics over PNG payloads: decode (chunk
    walk + CRC + inflate + de-filter), then exact integer folds over the
    pixel bytes — sum, sum of squares, max, and a position-weighted sum
    Σ(i+1)·v_i that pins row-major order — with one final rounded float
    division mirrored to DuckDB's half-up ROUND. One narrow Arrow stage,
    no shuffle."""
    schema = T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("channels", T.IntegerType()),
            T.StructField("n_pixels", T.IntegerType()),
            T.StructField("sum_pix", T.LongType()),
            T.StructField("sum_sq_pix", T.LongType()),
            T.StructField("max_pix", T.IntegerType()),
            T.StructField("wsum_pix", T.LongType()),
            T.StructField("mean_pix", T.DoubleType()),
        ]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        import numpy as np

        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                w, h, ch, pix = decode_png_pixels(bytes(blob))
                arr = np.frombuffer(pix, dtype=np.uint8).astype(np.int64)
                s = int(arr.sum())
                n_pix = w * h
                rows.append(
                    (
                        doc_id,
                        w,
                        h,
                        ch,
                        n_pix,
                        s,
                        int((arr * arr).sum()),
                        int(arr.max()) if len(arr) else 0,
                        int((arr * (np.arange(len(arr), dtype=np.int64) + 1)).sum()),
                        math.floor(s / (n_pix * ch) * 10_000 + 0.5) / 10_000,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    id_col, "width", "height", "channels", "n_pixels",
                    "sum_pix", "sum_sq_pix", "max_pix", "wsum_pix", "mean_pix",
                ],
            )

    return df.select(id_col, blob_col).mapInPandas(kernel, schema)


def build_media_fixture_payload(doc_id: int, body: bytes) -> bytes:
    """Deterministic REAL-format payload for a document, by doc_id % 4:
    0 → PNG (signature + IHDR with real CRC), 1 → WAV (canonical 44-byte
    RIFF/PCM header), 2 → JPEG (SOI + JFIF APP0 + SOF0 frame header),
    3 → GIF (GIF89a logical screen descriptor); the doc bytes ride as an
    opaque body after the header in every case. Field values are simple
    functions of (doc_id, len(body)) so a SQL oracle can state them
    independently of this builder — a parser that misreads an offset or
    an endianness diverges from the oracle immediately."""
    import struct
    import zlib

    n = len(body)
    kind = doc_id % 4
    if kind == 0:
        w = n % 1024 + 1
        h = (n * 7) % 768 + 1
        ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)  # 8-bit truecolour
        chunk = b"IHDR" + ihdr
        return (
            PNG_SIG
            + struct.pack(">I", 13)
            + chunk
            + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
            + body
        )
    if kind == 1:
        channels = doc_id % 3 + 1
        rate = 8000 + (doc_id % 5) * 1000
        bits = 8
        block = channels * bits // 8
        return (
            b"RIFF"
            + struct.pack("<I", 36 + n)
            + b"WAVEfmt "
            + struct.pack("<IHHIIHH", 16, 1, channels, rate, rate * block, block, bits)
            + b"data"
            + struct.pack("<I", n)
            + body
        )
    if kind == 2:
        w = n % 2048 + 1
        h = (n * 5) % 1536 + 1
        ncomp = doc_id % 3 + 1
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + struct.pack(
            ">BBBHHBB", 1, 1, 0, 1, 1, 0, 0
        )
        sof0 = (
            b"\xff\xc0"
            + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
            + b"".join(struct.pack(">BBB", c + 1, 0x11, 0) for c in range(ncomp))
        )
        # header total: SOI 2 + APP0 18 + SOF0 (10 + 3*ncomp)
        return b"\xff\xd8" + app0 + sof0 + body
    w = n % 4096 + 1
    h = (n * 3) % 2048 + 1
    packed = doc_id % 8  # GCT flag 0; low 3 bits -> palette depth - 1
    return (
        b"GIF89a" + struct.pack("<HHBBB", w, h, packed, 0, 0) + body
    )  # 13-byte logical screen descriptor


# --- video / bitmap container headers (round 10) ----------------------------
# ISO BMFF box grammar per ISO/IEC 14496-12 §4.2 (compact size, largesize
# when size == 1, box-extends-to-EOF when size == 0); mvhd layout per
# §8.2.2 (v0: 32-bit times, v1: 64-bit). BMP per the Windows
# BITMAPFILEHEADER (14 bytes) + BITMAPINFOHEADER (40 bytes) layout.
_MP4_BRANDS = ("isom", "mp42", "avc1")


def parse_video_header(payload: bytes):
    """(format, width, height, bpp, major_brand, timescale, duration,
    duration_ms) from REAL video/bitmap container headers in pure byte
    arithmetic — no codec library:

    - MP4 / ISO BMFF: top-level box walk (each box: BE uint32 size +
      fourcc; size 1 → 64-bit largesize follows; size 0 → box extends to
      EOF) collecting the ftyp major brand, then the moov child walk to
      mvhd — timescale/duration at version-dependent offsets (v0: BE
      uint32s after 4+4+4 version/creation/modification; v1: 64-bit
      times). duration_ms = duration·1000 // timescale (floor).
    - BMP: 'BM' magic; width/height are LE int32 at offsets 18/22 inside
      BITMAPINFOHEADER, bits-per-pixel LE uint16 at 28.

    Malformed input degrades to typed unknowns, never garbage: a box
    whose declared size is smaller than its own header, or a truncated
    length field, stops the walk (same stance as the JPEG marker walk's
    SOS/EOI rule). Frame/sample DECODE stays the documented codec seam
    (decode_image/decode_audio)."""
    p = bytes(payload)
    if len(p) >= 8 and p[4:8] == b"ftyp":
        brand = timescale = duration = None
        o = 0
        while o + 8 <= len(p):
            size = int.from_bytes(p[o : o + 4], "big")
            btype = p[o + 4 : o + 8]
            hdr = 8
            if size == 1:
                if o + 16 > len(p):
                    break
                size = int.from_bytes(p[o + 8 : o + 16], "big")
                hdr = 16
            elif size == 0:
                size = len(p) - o  # last box: extends to EOF (§4.2)
            if size < hdr:
                break  # malformed: size can't cover its own header
            if btype == b"ftyp" and o + hdr + 4 <= len(p):
                brand = p[o + hdr : o + hdr + 4].decode("latin-1")
            elif btype == b"moov":
                co, end = o + hdr, min(o + size, len(p))
                while co + 8 <= end:
                    csize = int.from_bytes(p[co : co + 4], "big")
                    ctype = p[co + 4 : co + 8]
                    chdr = 8
                    if csize == 1:
                        if co + 16 > end:
                            break
                        csize = int.from_bytes(p[co + 8 : co + 16], "big")
                        chdr = 16
                    elif csize == 0:
                        csize = end - co
                    if csize < chdr:
                        break
                    if ctype == b"mvhd":
                        b0 = co + chdr
                        if b0 < end:
                            ver = p[b0]
                            if ver == 0 and b0 + 20 <= end:
                                timescale = int.from_bytes(p[b0 + 12 : b0 + 16], "big")
                                duration = int.from_bytes(p[b0 + 16 : b0 + 20], "big")
                            elif ver == 1 and b0 + 32 <= end:
                                timescale = int.from_bytes(p[b0 + 20 : b0 + 24], "big")
                                duration = int.from_bytes(p[b0 + 24 : b0 + 32], "big")
                        break
                    co += csize
            o += size
        ms = duration * 1000 // timescale if timescale and duration is not None else None
        return ("mp4", None, None, None, brand, timescale, duration, ms)
    if p[:2] == b"BM" and len(p) >= 30:
        return (
            "bmp",
            int.from_bytes(p[18:22], "little", signed=True),
            int.from_bytes(p[22:26], "little", signed=True),
            int.from_bytes(p[28:30], "little"),
            None,
            None,
            None,
            None,
        )
    return ("unknown", None, None, None, None, None, None, None)


def extract_video_header(
    df: DataFrame, id_col: str = "doc_id", blob_col: str = "payload"
) -> DataFrame:
    """mapInPandas video/bitmap header extraction — one narrow Arrow
    stage, no shuffle (the video sibling of extract_media_header)."""
    schema = T.StructType(
        [
            _id_field(df, id_col),
            T.StructField("format", T.StringType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("bpp", T.IntegerType()),
            T.StructField("major_brand", T.StringType()),
            T.StructField("timescale", T.LongType()),
            T.StructField("duration", T.LongType()),
            T.StructField("duration_ms", T.LongType()),
        ]
    )
    cols = [
        id_col, "format", "n_bytes", "width", "height", "bpp",
        "major_brand", "timescale", "duration", "duration_ms",
    ]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf[id_col], pdf[blob_col]):
                fmt, w, h, bpp, brand, ts, dur, ms = parse_video_header(blob)
                rows.append(
                    (doc_id, fmt, len(bytes(blob)), w, h, bpp, brand, ts, dur, ms)
                )
            yield pd.DataFrame(rows, columns=cols)

    return df.select(id_col, blob_col).mapInPandas(kernel, schema)


def build_video_fixture_payload(doc_id: int, body: bytes) -> bytes:
    """Deterministic REAL-format video/bitmap payload by doc_id % 2:
    0 → MP4 (ftyp + variable-size free box + moov{skip, mvhd v0|v1} +
    mdat carrying the doc bytes), 1 → BMP (BITMAPFILEHEADER +
    BITMAPINFOHEADER + the doc bytes). The free/skip boxes have
    data-dependent sizes (n % 32 / doc_id % 16) so the box walk is
    genuinely offset-dependent, and the mvhd version alternates by
    (doc_id // 2) % 2 so both time layouts are exercised. Every field is
    a simple function of (doc_id, len(body)) so the SQL oracle states
    them independently of this builder."""
    import struct

    n = len(body)
    if doc_id % 2 == 0:
        brand = _MP4_BRANDS[doc_id % 3].encode()
        ftyp = struct.pack(">I", 20) + b"ftyp" + brand + struct.pack(">I", 0) + b"isom"
        free = struct.pack(">I", 8 + n % 32) + b"free" + bytes(n % 32)
        timescale = 600 + (doc_id % 4) * 300
        duration = (n * 11) % 100000
        if (doc_id // 2) % 2 == 0:  # mvhd v0: 108-byte box
            mvhd = (
                struct.pack(">I", 108) + b"mvhd" + b"\x00\x00\x00\x00"
                + struct.pack(">IIII", 0, 0, timescale, duration)
                + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                + bytes(8) + bytes(36) + bytes(24) + struct.pack(">I", 2)
            )
        else:  # mvhd v1: 120-byte box (64-bit times)
            mvhd = (
                struct.pack(">I", 120) + b"mvhd" + b"\x01\x00\x00\x00"
                + struct.pack(">QQIQ", 0, 0, timescale, duration)
                + struct.pack(">IHH", 0x00010000, 0x0100, 0)
                + bytes(8) + bytes(36) + bytes(24) + struct.pack(">I", 2)
            )
        skip = struct.pack(">I", 8 + doc_id % 16) + b"skip" + bytes(doc_id % 16)
        moov = struct.pack(">I", 8 + len(skip) + len(mvhd)) + b"moov" + skip + mvhd
        mdat = struct.pack(">I", 8 + n) + b"mdat" + body
        return ftyp + free + moov + mdat
    w = n % 2048 + 1
    h = (n * 3) % 1024 + 1
    bpp = (8, 24, 32)[doc_id % 3]
    return (
        b"BM" + struct.pack("<IHHI", 54 + n, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, n, 2835, 2835, 0, 0)
        + body
    )
