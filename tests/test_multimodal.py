"""Multimodal binary plumbing: Arrow batch shapes, stub gating, and
deterministic fake-decode outputs."""

import hashlib

import pytest
from pyspark.sql import functions as F

from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators import multimodal as MM


def test_decode_stubs_raise():
    with pytest.raises(NotImplementedError):
        MM.decode_image(b"\x89PNG")
    with pytest.raises(NotImplementedError):
        MM.decode_audio(b"RIFF")


def test_extract_media_meta(spark):
    payloads = [(1, b"hello world"), (2, b""), (3, bytes(range(256)) * 5)]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {r.doc_id: r for r in MM.extract_media_meta(df).collect()}
    for doc_id, blob in payloads:
        r = got[doc_id]
        assert r.n_bytes == len(blob)
        assert r.content_md5 == hashlib.md5(blob).hexdigest()
        assert (r.width, r.height, r.channels) == (len(blob) % 1024, len(blob) * 7 % 768, 3)


def test_sample_frames_counts(spark):
    df = spark.createDataFrame([(1, b"x" * 100)], "doc_id long, payload binary")
    rows = MM.sample_frames(df, "doc_id", "payload", every_n_bytes=32).collect()
    assert [r.frame_offset for r in sorted(rows, key=lambda r: r.frame_idx)] == [0, 32, 64, 96]
    # per-frame digest matches hashlib on the hex of the same slice
    # (md5-over-hex: the engine-neutral fingerprint — see sample_frames)
    first = [r for r in rows if r.frame_idx == 0][0]
    expect = hashlib.md5((b"x" * 32).hex().upper().encode()).hexdigest()
    assert first.frame_md5 == expect


def test_resize_stub_shape(spark, sf_dir):
    from pyspark.sql import functions as F

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.multimodal import (
        resize_images,
    )

    payloads = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.encode("text", "UTF-8").alias("payload"))
        .limit(100)
    )
    out = resize_images(payloads, width=8, height=8).collect()
    assert len(out) == 100
    for r in out:
        assert r.out_width == 8 and r.out_height == 8
        assert 0 < len(r.resized) <= 64
        import hashlib

        assert hashlib.md5(bytes(r.resized)).hexdigest() == r.resized_md5


def test_multibyte_payloads_value_check_against_oracle(spark, tmp_path):
    """Byte-grain oracle contract (VERDICT r6 item 5): the multimodal
    oracles must VALUE-match the Spark kernels on a fixture containing
    multi-byte UTF-8 text — no ASCII guard, no rows-only fallback. Runs
    all three multimodal queries and their DuckDB twins over a tiny
    non-ASCII documents table and compares normalized row sets."""
    import duckdb

    import __spark_entry__ as E

    texts = [
        "héllo wörld — ümlauts",
        "日本語のテキストが六十四バイトの窓をまたぐくらいには長い必要があるのでもう少し続けます",
        "emoji 🙂🙃 mixed with ASCII tail " + "x" * 80,
        "",
        "café ☕ naïve São Paulo",
    ]
    rows = [(i, t, "xx", "synthetic", len(t)) for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    fix_dir = str(tmp_path / "mb")
    df.coalesce(1).write.parquet(f"{fix_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{fix_dir}/documents.parquet/*.parquet')"
    )
    queries, oracles = E.queries(), E.oracle_sql()
    for name in ("multimodal_meta", "multimodal_frames", "multimodal_audio_windows"):
        got = queries[name](spark, fix_dir).collect()
        want = con.execute(oracles[name]).fetchall()
        assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"

        def norm(rowlist, cols):
            out = set()
            for r in rowlist:
                vals = tuple(
                    round(v, 4) if isinstance(v, float) else v
                    for v in (r[c] for c in cols)
                )
                out.add(vals)
            return out

        cols = sorted(queries[name](spark, fix_dir).columns)
        spark_rows = norm([r.asDict() for r in got], cols)
        duck_cols = [d[0] for d in con.description]
        want_dicts = [dict(zip(duck_cols, w)) for w in want]
        duck_rows = norm(want_dicts, cols)
        assert spark_rows == duck_rows, f"{name}: value mismatch on multi-byte fixture"


def test_custom_id_col_name_flows_through(spark):
    """A caller's id column name must survive every kernel — no silent
    relabeling to doc_id (ADVICE r4). Type flows through too (string id)."""
    df = spark.createDataFrame(
        [("v1", bytearray(b"x" * 100)), ("v2", bytearray(b"y" * 10))],
        "video_id string, payload binary",
    )
    for fn in (
        lambda d: MM.extract_media_meta(d, "video_id", "payload"),
        lambda d: MM.audio_window_stats(d, "video_id", "payload", 32),
        lambda d: MM.sample_frames(d, "video_id", "payload", 32),
        lambda d: MM.resize_images(d, "video_id", "payload", 4, 4),
    ):
        out = fn(df)
        assert out.columns[0] == "video_id", out.columns
        assert dict(out.dtypes)["video_id"] == "string"
        assert {r.video_id for r in out.collect()} == {"v1", "v2"}


def test_parse_media_header_golden_png():
    """A genuine spec-minimal PNG (1x1 truecolour, the canonical 67-byte
    file — signature, IHDR with its real CRC, IDAT, IEND) parses to the
    fields a real decoder would report."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.multimodal import (
        parse_media_header,
    )

    # IHDR len 13, 'IHDR', w=1, h=1, depth 8, colour 2 (truecolour),
    # CRC 0x907753DE (the published value for this exact chunk)
    png_1x1 = (
        bytes.fromhex("89504e470d0a1a0a")
        + bytes.fromhex("0000000d") + b"IHDR"
        + bytes.fromhex("0000000100000001" "08" "02" "00" "00" "00")
        + bytes.fromhex("907753de")
        + bytes.fromhex("0000000c4944415478da63f8cfc0f01f0005050202efadc5c2")
        + bytes.fromhex("0000000049454e44ae426082")
    )
    import zlib

    chunk = b"IHDR" + bytes.fromhex("0000000100000001080200000000")[:13]
    assert zlib.crc32(chunk) & 0xFFFFFFFF == 0x907753DE  # the CRC is real
    assert parse_media_header(png_1x1) == ("png", 1, 1, 3, None, 8)


def test_decode_wav_pcm16_roundtrip_and_chunk_walk():
    """The r12 sample decoder: fixture bytes round-trip to the exact
    (b - 128) * 256 sample map through a real chunk walk (JUNK chunk
    between fmt and data; odd-sized chunks padded)."""
    import struct

    body = bytes(range(256))
    wav = MM.build_wav_pcm16_fixture(7, body)
    ch, rate, samples = MM.decode_wav_pcm16(wav)
    assert (ch, rate) == (7 % 2 + 1, 8000 + (7 % 5) * 1000)
    assert samples == [(b - 128) * 256 for b in body]
    assert min(samples) == -32768 and max(samples) == 32512
    # an ODD-sized junk chunk with its pad byte must not derail the scan
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    junk_odd = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"
    data = b"data" + struct.pack("<I", 4) + struct.pack("<hh", -5, 5)
    riff_body = b"WAVE" + junk_odd + fmt + data
    wav2 = b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
    assert MM.decode_wav_pcm16(wav2) == (1, 8000, [-5, 5])


def test_decode_wav_pcm16_typed_errors():
    import struct

    import pytest as _pytest

    with _pytest.raises(ValueError, match="signature"):
        MM.decode_wav_pcm16(b"RIFX....WAVE")
    fmt16 = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)

    def wav_of(*chunks):
        body = b"WAVE" + b"".join(chunks)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    with _pytest.raises(ValueError, match="missing data"):
        MM.decode_wav_pcm16(wav_of(fmt16))
    with _pytest.raises(ValueError, match="missing fmt"):
        MM.decode_wav_pcm16(wav_of(b"data" + struct.pack("<I", 2) + b"\x00\x00"))
    with _pytest.raises(ValueError, match="truncated"):
        MM.decode_wav_pcm16(wav_of(b"data" + struct.pack("<I", 99) + b"\x00"))
    # compressed / out-of-subset depths are the documented seam
    fmt_mp3 = b"fmt " + struct.pack("<IHHIIHH", 16, 85, 1, 8000, 16000, 2, 16)
    with _pytest.raises(NotImplementedError, match="codec"):
        MM.decode_wav_pcm16(
            wav_of(fmt_mp3, b"data" + struct.pack("<I", 2) + b"\x00\x00")
        )
    fmt8 = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
    with _pytest.raises(NotImplementedError, match="16"):
        MM.decode_wav_pcm16(
            wav_of(fmt8, b"data" + struct.pack("<I", 2) + b"\x00\x00")
        )
    # sample misalignment is malformed input, not a seam
    with _pytest.raises(ValueError, match="aligned"):
        MM.decode_wav_pcm16(
            wav_of(fmt16, b"data" + struct.pack("<I", 3) + b"\x00\x00\x00")
        )


def test_wav_window_stats_signed_rounding(spark):
    """Negative means round half AWAY from zero (the DuckDB mirror) and
    exact integer sums ride next to the floats."""
    import struct

    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
    # one window of 2 samples summing to -1 -> mean -0.5 -> r4 -0.5
    data = b"data" + struct.pack("<I", 4) + struct.pack("<hh", -2, 1)
    body = b"WAVE" + fmt + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    df = spark.createDataFrame([(1, bytearray(wav))], "doc_id long, payload binary")
    row = MM.wav_window_stats(df, "doc_id", "payload", 64).collect()[0]
    assert (row.sum_amp, row.sum_sq, row.peak_abs) == (-1, 5, 2)
    assert row.mean_amp == -0.5
    assert row.n_samples == 2 and row.channels == 1 and row.sample_rate == 8000


def test_parse_media_header_wav_chunk_scan():
    """A WAV whose fmt chunk sits AFTER a JUNK chunk (and an odd-sized
    chunk exercising the RIFF pad rule) still parses — the parser scans
    chunks, it does not assume the canonical 44-byte layout."""
    import struct

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.multimodal import (
        parse_media_header,
    )

    junk_odd = b"JUNK" + struct.pack("<I", 3) + b"abc" + b"\x00"  # pad byte
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 4, 4, 16)
    data = b"data" + struct.pack("<I", 4) + b"\x00\x01\x02\x03"
    body = b"WAVE" + junk_odd + fmt + data
    wav = b"RIFF" + struct.pack("<I", len(body)) + body
    assert parse_media_header(wav) == ("wav", None, None, 2, 44100, 16)


def test_header_roundtrip_and_truncation():
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.multimodal import (
        build_media_fixture_payload,
        parse_media_header,
    )

    for i in range(16):
        body = bytes(range(i * 7 % 250))
        n = len(body)
        fmt, w, h, ch, rate, bits = parse_media_header(
            build_media_fixture_payload(i, body)
        )
        if i % 4 == 0:
            assert (fmt, w, h, ch, rate, bits) == (
                "png", n % 1024 + 1, (n * 7) % 768 + 1, 3, None, 8
            )
        elif i % 4 == 1:
            assert (fmt, ch, rate, bits) == ("wav", i % 3 + 1, 8000 + (i % 5) * 1000, 8)
        elif i % 4 == 2:
            assert (fmt, w, h, ch, rate, bits) == (
                "jpeg", n % 2048 + 1, (n * 5) % 1536 + 1, i % 3 + 1, None, 8
            )
        else:
            assert (fmt, w, h, ch, rate, bits) == (
                "gif", n % 4096 + 1, (n * 3) % 2048 + 1, 1, None, i % 8 + 1
            )
    # garbage and truncated headers degrade to 'unknown', never raise
    assert parse_media_header(b"")[0] == "unknown"
    assert parse_media_header(b"\x89PNG\r\n\x1a\x08rest")[0] == "unknown"
    assert parse_media_header(b"RIFFxxxx")[0] == "unknown"
    assert parse_media_header(b"GIF89")[0] == "unknown"
    # a JPEG whose marker walk runs off the end degrades typed, not raises
    assert parse_media_header(b"\xff\xd8\xff\xe0\x00") == (
        "jpeg", None, None, None, None, None
    )


def test_parse_media_header_jpeg_marker_walk():
    """A progressive JPEG (SOF2) whose frame header sits behind APP0,
    an APP1/Exif segment, a COM segment, a DQT, and a DRI — plus legal
    fill bytes before a marker — parses: the walk reads segment lengths,
    it does not assume a fixed SOF offset."""
    import struct

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.multimodal import (
        parse_media_header,
    )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    jpg = (
        b"\xff\xd8"
        + seg(0xE0, b"JFIF\x00" + bytes(9))
        + seg(0xE1, b"Exif\x00\x00" + bytes(20))
        + seg(0xFE, b"a comment")
        + seg(0xDB, bytes(65))
        + seg(0xDD, bytes(2))  # DRI
        + b"\xff"  # fill byte before the next marker (T.81 B.1.1.2)
        + seg(0xC2, struct.pack(">BHHB", 8, 480, 640, 3) + bytes(9))
        + b"opaque entropy data"
    )
    assert parse_media_header(jpg) == ("jpeg", 640, 480, 3, None, 8)


def test_parse_media_header_jpeg_malformed_degrades_typed():
    """Adversarial / truncated JPEG byte streams degrade to the typed
    ('jpeg', None, ...) result — never garbage dimensions synthesized
    from entropy-coded bytes, never a crash:

    - a segment length < 2 is malformed (T.81 B.1.1.4: the length field
      includes its own two bytes) — the walk stops;
    - SOS before any SOFn means what follows is the compressed stream,
      not marker segments — the walk must not keep parsing it (a byte
      pair that LOOKS like a SOFn header inside the stream used to
      yield fabricated width/height);
    - EOI is standalone — treating it as length-carrying read two
      entropy bytes as a bogus segment length."""
    import struct

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.multimodal import (
        parse_media_header,
    )

    degraded = ("jpeg", None, None, None, None, None)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    # seg_len == 0: offset would not advance past the length field
    assert parse_media_header(b"\xff\xd8\xff\xe0\x00\x00rest") == degraded
    # seg_len == 1: monotone but malformed — stop, don't misalign
    assert parse_media_header(b"\xff\xd8\xff\xe0\x00\x01\xff\xc0") == degraded
    # SOS with a fake SOF0-lookalike inside the entropy stream: the
    # 0xFF 0xC0 pair below is compressed data, not a frame header
    sos_then_fake_sof = (
        b"\xff\xd8"
        + seg(0xDA, bytes(10))  # SOS: entropy-coded data follows
        + b"\xff\xc0" + struct.pack(">H", 17)
        + struct.pack(">BHHB", 8, 9999, 9999, 3) + bytes(9)
    )
    assert parse_media_header(sos_then_fake_sof) == degraded
    # EOI immediately after a DQT: standalone, carries no length
    assert parse_media_header(
        b"\xff\xd8" + seg(0xDB, bytes(65)) + b"\xff\xd9\xc0\x11garbage"
    ) == degraded
    # sanity: the fixes don't break a well-formed baseline JPEG
    good = b"\xff\xd8" + seg(0xC0, struct.pack(">BHHB", 8, 32, 64, 1) + bytes(3))
    assert parse_media_header(good) == ("jpeg", 64, 32, 1, None, 8)


def test_parse_media_header_gif87a():
    import struct

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.multimodal import (
        parse_media_header,
    )

    # GCT flag set, color resolution 7, palette depth 8 (packed 0xF7)
    gif = b"GIF87a" + struct.pack("<HHBBB", 320, 200, 0xF7, 0, 0)
    assert parse_media_header(gif) == ("gif", 320, 200, 1, None, 8)


def test_parse_video_header_golden_mp4_largesize_and_eof_box():
    """Hand-built ISO BMFF per ISO/IEC 14496-12 §4.2/§8.2.2: ftyp, an
    mdat using the 64-bit largesize encoding (size == 1), then a moov
    with size == 0 (extends to EOF) holding a v0 mvhd — the three size
    encodings in one file."""
    import struct

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.multimodal import parse_video_header

    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 512)
    payload = b"\x00" * 5
    mdat = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + len(payload)) + payload
    mvhd = (
        struct.pack(">I", 108) + b"mvhd" + b"\x00\x00\x00\x00"
        + struct.pack(">IIII", 3600, 3600, 90000, 450000)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + bytes(8) + bytes(36) + bytes(24) + struct.pack(">I", 2)
    )
    moov = struct.pack(">I", 0) + b"moov" + mvhd  # size 0: to EOF
    fmt, w, h, bpp, brand, ts, dur, ms = parse_video_header(ftyp + mdat + moov)
    assert (fmt, brand) == ("mp4", "isom")
    assert (ts, dur) == (90000, 450000)
    assert ms == 5000  # 450000 / 90000 s


def test_parse_video_header_mvhd_v1_64bit_times():
    import struct

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.multimodal import parse_video_header

    ftyp = struct.pack(">I", 16) + b"ftyp" + b"mp42" + struct.pack(">I", 0)
    mvhd = (
        struct.pack(">I", 120) + b"mvhd" + b"\x01\x00\x00\x00"
        + struct.pack(">QQIQ", 0, 0, 1000, 2**33)  # duration > 32 bits
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + bytes(8) + bytes(36) + bytes(24) + struct.pack(">I", 2)
    )
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    fmt, _, _, _, brand, ts, dur, ms = parse_video_header(ftyp + moov)
    assert (fmt, brand, ts, dur) == ("mp4", "mp42", 1000, 2**33)
    assert ms == 2**33  # timescale 1000 -> ms == ticks


def test_parse_video_header_golden_bmp():
    """1x1 24-bpp BMP, BITMAPFILEHEADER + BITMAPINFOHEADER from the
    public layout (54-byte header + 4 bytes padded pixel row)."""
    import struct

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.multimodal import parse_video_header

    bmp = (
        b"BM" + struct.pack("<IHHI", 58, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 24, 0, 4, 2835, 2835, 0, 0)
        + b"\x00\x00\xff\x00"
    )
    assert parse_video_header(bmp) == ("bmp", 1, 1, 24, None, None, None, None)


def test_parse_video_header_malformed_degrades_typed():
    import struct

    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.multimodal import parse_video_header

    # declared box size smaller than its own header: walk stops typed
    bad = struct.pack(">I", 16) + b"ftyp" + b"avc1" + struct.pack(">I", 0)
    bad += struct.pack(">I", 4) + b"moov"
    assert parse_video_header(bad) == ("mp4", None, None, None, "avc1", None, None, None)
    # truncated largesize field
    trunc = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0)
    trunc += struct.pack(">I", 1) + b"moov" + b"\x00\x00"
    assert parse_video_header(trunc)[0] == "mp4"
    # neither magic
    assert parse_video_header(b"plainbytes")[0] == "unknown"
    # mvhd child whose declared size undercuts its header: child walk stops
    mvhd_bad = struct.pack(">I", 2) + b"mvhd"
    moov = struct.pack(">I", 8 + len(mvhd_bad)) + b"moov" + mvhd_bad
    out = parse_video_header(struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 0) + moov)
    assert out == ("mp4", None, None, None, "isom", None, None, None)


def test_video_fixture_roundtrip_properties():
    """Builder -> parser round-trip across both kinds, both mvhd
    versions, and bodies that shift the data-dependent free/skip box
    sizes through their whole modular range."""
    from migrate_blob_data_from_rdbms_to_amazon_s3_spark.operators.multimodal import (
        build_video_fixture_payload,
        parse_video_header,
    )

    for doc_id in range(12):
        for n in (0, 1, 31, 32, 57):
            body = bytes(range(256))[:n]
            fmt, w, h, bpp, brand, ts, dur, ms = parse_video_header(
                build_video_fixture_payload(doc_id, body)
            )
            if doc_id % 2 == 0:
                assert fmt == "mp4"
                assert brand == ("isom", "mp42", "avc1")[doc_id % 3]
                assert ts == 600 + (doc_id % 4) * 300
                assert dur == (n * 11) % 100000
                assert ms == dur * 1000 // ts
            else:
                assert fmt == "bmp"
                assert (w, h) == (n % 2048 + 1, (n * 3) % 1024 + 1)
                assert bpp == (8, 24, 32)[doc_id % 3]


# --- real PNG pixel decode (round 11) ---------------------------------------


def test_png_decode_roundtrip_all_filters():
    """Builder encodes filter r % 5 per scanline; bodies sized to cover
    >= 5 rows exercise None/Sub/Up/Average/Paeth on the decode path and
    must reproduce the body bytes exactly (zero-padded tail)."""
    for n in (0, 1, 31, 32, 33, 200, 997):
        body = bytes((i * 37 + n) % 256 for i in range(n))
        png = MM.build_png_pixel_fixture(7, body)
        w, h, ch, pix = MM.decode_png_pixels(png)
        assert (w, h) == MM.png_fixture_dims(n)
        assert ch == 1
        assert len(pix) == w * h
        assert pix[:n] == body and set(pix[n:]) <= {0}


def test_png_decode_known_filtered_image():
    """Hand-built 2x3 greyscale PNG with explicit Sub and Up filters —
    pixel reconstruction pinned against the spec recurrences computed
    by hand (not against the builder)."""
    import struct
    import zlib

    # rows: (10, 20), (30, 40), (35, 50)
    # encode: row0 Sub -> 10, (20-10)=10; row1 Up -> (30-10)=20, (40-20)=20;
    # row2 filter 0 -> raw
    stream = bytes([1, 10, 10]) + bytes([2, 20, 20]) + bytes([0, 35, 50])
    ihdr = struct.pack(">II5B", 2, 3, 8, 0, 0, 0, 0)
    png = (
        MM.PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", zlib.compress(stream))
        + MM._png_chunk(b"IEND", b"")
    )
    w, h, ch, pix = MM.decode_png_pixels(png)
    assert (w, h, ch) == (2, 3, 1)
    assert list(pix) == [10, 20, 30, 40, 35, 50]


def test_png_decode_paeth_and_average_by_hand():
    """4.2 spec recurrences for Average and Paeth verified on a 3x2
    image with hand-computed filtered bytes."""
    import struct
    import zlib

    # raw rows: (100, 110, 120), (130, 90, 200)
    # row0 Average (prev=0): 100-0//2=100; 110-100//2=60; 120-110//2=65
    # row1 Paeth: left,up,ul predictors:
    #   i0: a=0,b=100,c=0 -> p=100, pa=100,pb=0 -> pred=100 -> 130-100=30
    #   i1: a=130,b=110,c=100 -> p=140: pa=10,pb=30,pc=40 -> pred=a=130 -> 90-130=-40&255=216
    #   i2: a=90,b=120,c=110 -> p=100: pa=10,pb=20,pc=10 -> pred=a=90 -> 200-90=110
    stream = bytes([3, 100, 60, 65]) + bytes([4, 30, 216, 110])
    ihdr = struct.pack(">II5B", 3, 2, 8, 0, 0, 0, 0)
    png = (
        MM.PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", zlib.compress(stream))
        + MM._png_chunk(b"IEND", b"")
    )
    _w, _h, _ch, pix = MM.decode_png_pixels(png)
    assert list(pix) == [100, 110, 120, 130, 90, 200]


def test_png_decode_rejects_malformed_typed():
    png = bytearray(MM.build_png_pixel_fixture(1, b"hello world"))
    # corrupt one IDAT byte -> CRC failure, typed ValueError
    png[41] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        MM.decode_png_pixels(bytes(png))
    with pytest.raises(ValueError, match="signature"):
        MM.decode_png_pixels(b"not a png at all")


def test_png_decode_bad_deflate_and_missing_idat_typed():
    """r11 advice: a PNG with CRC-valid chunks but no IDAT, or a
    corrupt-yet-CRC-consistent deflate stream, must surface ValueError,
    never an undocumented zlib.error."""
    import struct

    ihdr = struct.pack(">II5B", 1, 1, 8, 0, 0, 0, 0)
    no_idat = MM.PNG_SIG + MM._png_chunk(b"IHDR", ihdr) + MM._png_chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="IDAT"):
        MM.decode_png_pixels(no_idat)
    # garbage bytes wrapped in a VALID chunk CRC -> zlib failure path
    bad = (
        MM.PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", b"\xff\xfe\xfd\xfc")
        + MM._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="IDAT"):
        MM.decode_png_pixels(bad)


def test_png_decode_out_of_subset_typed():
    import struct
    import zlib

    for depth, ctype, interlace in ((16, 0, 0), (8, 3, 0), (8, 0, 1)):
        ihdr = struct.pack(">II5B", 1, 1, depth, ctype, 0, 0, interlace)
        png = (
            MM.PNG_SIG
            + MM._png_chunk(b"IHDR", ihdr)
            + MM._png_chunk(b"IDAT", zlib.compress(b"\x00\x00"))
            + MM._png_chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError):
            MM.decode_png_pixels(png)


def test_png_decode_rgba_multichannel():
    """bpp > 1 reconstruction: Sub/Paeth look back one FULL pixel, not
    one byte — a 2x2 RGBA image with per-row filters pins it."""
    import struct
    import zlib

    row0 = bytes([10, 20, 30, 255, 50, 60, 70, 255])
    row1 = bytes([15, 25, 35, 255, 55, 65, 75, 255])
    # row0 Sub: first pixel raw, second minus first (bpp=4)
    f0 = bytes([1]) + row0[:4] + bytes((row0[4 + i] - row0[i]) & 0xFF for i in range(4))
    # row1 Up: minus row0 bytewise
    f1 = bytes([2]) + bytes((row1[i] - row0[i]) & 0xFF for i in range(8))
    ihdr = struct.pack(">II5B", 2, 2, 8, 6, 0, 0, 0)
    png = (
        MM.PNG_SIG
        + MM._png_chunk(b"IHDR", ihdr)
        + MM._png_chunk(b"IDAT", zlib.compress(f0 + f1))
        + MM._png_chunk(b"IEND", b"")
    )
    w, h, ch, pix = MM.decode_png_pixels(png)
    assert (w, h, ch) == (2, 2, 4)
    assert pix == row0 + row1
