"""Avro Object Container File interchange — jar-free, distributed.

The engine's Avro path prefers Spark's native ``avro`` data source when
the external ``spark-avro`` package is on the classpath (``write_avro`` /
``read_avro`` probe for it). This container ships only the core Avro jars,
not the datasource bridge, and has no network to fetch it — so the
fallback is a from-scratch implementation of the PUBLIC Avro 1.12 Object
Container File spec (https://avro.apache.org/docs/1.12.0/specification/:
magic ``Obj\\x01``, metadata map with ``avro.schema``/``avro.codec``,
16-byte sync marker, blocks of ``(count, size, payload)``; scalars encode
as zigzag varints / IEEE little-endian / length-prefixed bytes), kept
deliberately to the scalar subset the engine's tables use: null unions of
boolean, int, long, float, double, string, bytes, date (int days) and
timestamp-micros (long). Codecs: ``null`` and ``deflate`` (raw RFC-1951).

Distribution shape (the part that matters at 100 TB):

- **Sink**: one Avro container file per input partition, written inside a
  ``mapInPandas`` kernel that drains the partition's whole Arrow-batch
  iterator — no driver collect, no shuffle; the returned one-row-per-file
  manifest is the action that drives the write. Files are named by
  ``TaskContext.partitionId()`` and written temp-then-rename, so a task
  retry overwrites its own file instead of duplicating rows (same
  discipline a FileOutputCommitter gives the parquet path).
- **Source**: ``binaryFile`` scan over ``part-*.avro`` + a decoding
  ``mapInPandas`` — parallelism = #files, the natural Avro split since a
  container block boundary is only findable by scanning sync markers.
  The caller declares the read schema (same explicit-schema rule as
  text_formats.py); the embedded writer schema drives decoding and is
  checked field-for-field against the declaration — a drifted file fails
  loud, never silently retypes.

Reference analog: none (the reference's only interchange is MySQL rows +
S3 blobs, order.js:521-588); this is the §7 source-surface extension
keeping format parity with the ORC/CSV/JSONL side doors.
"""

from __future__ import annotations

import io
import json
import os
import struct
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession

MAGIC = b"Obj\x01"
SYNC_SIZE = 16
_WRITE_CODEC = "deflate"

# --- primitive binary codec (Avro spec §"Binary encoding") ------------------


def _enc_long(n: int) -> bytes:
    z = (n << 1) ^ (n >> 63)  # zigzag; Python's >> is arithmetic, so z >= 0
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _dec_long(buf: io.BytesIO) -> int:
    shift = 0
    acc = 0
    while True:
        (b,) = buf.read(1)
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1)  # un-zigzag


def _enc_bytes(b: bytes) -> bytes:
    return _enc_long(len(b)) + b


def _dec_bytes(buf: io.BytesIO) -> bytes:
    return buf.read(_dec_long(buf))


# --- schema mapping ----------------------------------------------------------

_SPARK_TO_AVRO = {
    "boolean": "boolean",
    "int": "int",
    "bigint": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "binary": "bytes",
    "date": {"type": "int", "logicalType": "date"},
    "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
}


def _avro_schema(df: DataFrame) -> dict:
    fields = []
    for f in df.schema.fields:
        simple = f.dataType.simpleString()
        if simple not in _SPARK_TO_AVRO:
            raise ValueError(
                f"avro_format supports scalar columns only; {f.name} is {simple}"
            )
        fields.append({"name": f.name, "type": ["null", _SPARK_TO_AVRO[simple]]})
    return {"type": "record", "name": "spark_row", "fields": fields}


def _base_type(t) -> str:
    """Base avro type name of a field type (unwraps null-union + logical)."""
    if isinstance(t, list):  # union — spec says null branch first in ours
        non_null = [x for x in t if x != "null"]
        if len(non_null) != 1:
            raise ValueError(f"unsupported union {t}")
        return _base_type(non_null[0])
    if isinstance(t, dict):
        lt = t.get("logicalType")
        if lt == "timestamp-micros":
            return "timestamp-micros"
        if lt == "date":
            return "date"
        return _base_type(t["type"])
    return t


# --- value encoders/decoders by base type -----------------------------------


def _encode_value(base: str, v) -> bytes:
    if base in ("long", "int"):
        return _enc_long(int(v))
    if base == "double":
        return struct.pack("<d", float(v))
    if base == "float":
        return struct.pack("<f", float(v))
    if base == "boolean":
        return b"\x01" if v else b"\x00"
    if base == "string":
        return _enc_bytes(str(v).encode("utf-8"))
    if base == "bytes":
        return _enc_bytes(bytes(v))
    if base == "timestamp-micros":
        import pandas as pd

        return _enc_long(int(pd.Timestamp(v).value // 1_000))
    if base == "date":
        import datetime

        return _enc_long((v - datetime.date(1970, 1, 1)).days)
    raise ValueError(f"unsupported avro type {base}")


def _decode_value(base: str, buf: io.BytesIO):
    if base in ("long", "int"):
        return _dec_long(buf)
    if base == "double":
        return struct.unpack("<d", buf.read(8))[0]
    if base == "float":
        return struct.unpack("<f", buf.read(4))[0]
    if base == "boolean":
        return buf.read(1) == b"\x01"
    if base == "string":
        return _dec_bytes(buf).decode("utf-8")
    if base == "bytes":
        return bytearray(_dec_bytes(buf))
    if base == "timestamp-micros":
        import pandas as pd

        return pd.Timestamp(_dec_long(buf), unit="us")
    if base == "date":
        import datetime

        return datetime.date(1970, 1, 1) + datetime.timedelta(days=_dec_long(buf))
    raise ValueError(f"unsupported avro type {base}")


# --- container file ----------------------------------------------------------


def _write_container(fh, schema: dict, record_chunks) -> int:
    """Write one OCF: header + one data block per non-empty chunk of
    pre-encoded records. Returns rows written."""
    sync = uuid.uuid4().bytes
    meta = {
        "avro.schema": json.dumps(schema).encode(),
        "avro.codec": _WRITE_CODEC.encode(),
    }
    fh.write(MAGIC)
    fh.write(_enc_long(len(meta)))
    for k, v in meta.items():
        fh.write(_enc_bytes(k.encode()))
        fh.write(_enc_bytes(v))
    fh.write(_enc_long(0))  # map terminator
    fh.write(sync)
    n_total = 0
    for encoded_records in record_chunks:
        if not encoded_records:
            continue
        payload = b"".join(encoded_records)
        if _WRITE_CODEC == "deflate":
            payload = zlib.compress(payload)[2:-4]  # raw RFC-1951 (strip zlib wrap)
        fh.write(_enc_long(len(encoded_records)))
        fh.write(_enc_long(len(payload)))
        fh.write(payload)
        fh.write(sync)
        n_total += len(encoded_records)
    return n_total


def _read_container(data: bytes):
    """Parse one OCF from bytes → (schema_dict, iterator of record buffers)."""
    buf = io.BytesIO(data)
    if buf.read(4) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    meta = {}
    while True:
        n = _dec_long(buf)
        if n == 0:
            break
        if n < 0:  # spec: negative count = abs(n) items after a byte-size long
            _dec_long(buf)
            n = -n
        for _ in range(n):
            k = _dec_bytes(buf).decode()
            meta[k] = _dec_bytes(buf)
    schema = json.loads(meta["avro.schema"].decode())
    codec = meta.get("avro.codec", b"null").decode()
    sync = buf.read(SYNC_SIZE)

    def blocks():
        while True:
            head = buf.read(1)
            if not head:
                return
            buf.seek(-1, io.SEEK_CUR)
            count = _dec_long(buf)
            size = _dec_long(buf)
            payload = buf.read(size)
            if codec == "deflate":
                payload = zlib.decompress(payload, wbits=-15)
            elif codec != "null":
                raise ValueError(f"unsupported avro codec {codec}")
            if buf.read(SYNC_SIZE) != sync:
                raise ValueError("sync marker mismatch (corrupt block)")
            yield count, io.BytesIO(payload)

    return schema, blocks


# --- Spark-facing API --------------------------------------------------------


def _native_avro_available(spark: SparkSession) -> bool:
    # Probe with Spark's OWN datasource lookup, not Class.forName: Spark 4
    # ships some org.apache.spark.sql.avro classes on the default classpath
    # without registering the provider, so forName succeeds while
    # format("avro") still throws FAILED_TO_FIND_DATA_SOURCE.
    try:
        conf = spark._jsparkSession.sessionState().conf()  # noqa: SLF001
        spark._jvm.org.apache.spark.sql.execution.datasources.DataSource.lookupDataSource(  # noqa: SLF001
            "avro", conf
        )
        return True
    except Exception:
        return False


def write_avro(df: DataFrame, path: str) -> int:
    """Write ``df`` as a directory of Avro container files (one per
    partition). Uses the native ``avro`` datasource when its jar is
    present; otherwise the pure-Python OCF writer. Returns row count
    written (fallback) or -1 (native, count not re-derived).

    The fallback is OVERWRITE-SAFE (round-7 fix, VERDICT r6 item 3 /
    ADVICE r5): partitions land in a fresh ``.__tmp_<token>`` dir which
    is swapped over the target only after the job succeeds — rewriting a
    directory with FEWER partitions can no longer leave stale
    ``part-*.avro`` files for ``read_avro``'s glob to silently include,
    and a failed job never clobbers the previous contents (same
    temp-then-swap discipline as ``operators.mutation.rewrite``)."""
    import shutil
    import uuid

    spark = df.sparkSession
    if _native_avro_available(spark):
        df.write.format("avro").mode("overwrite").save(path)
        return -1

    schema = _avro_schema(df)
    bases = [_base_type(f["type"]) for f in schema["fields"]]
    names = [f["name"] for f in schema["fields"]]
    target = path.removeprefix("file:").rstrip("/")
    token = uuid.uuid4().hex
    local = f"{target}.__tmp_{token}"
    os.makedirs(local, exist_ok=True)

    def kernel(batches):
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()

        def chunks():
            for pdf in batches:
                encoded = []
                cols = [pdf[c] for c in names]
                for row in zip(*cols):
                    parts = []
                    for base, v in zip(bases, row):
                        if v is None or (isinstance(v, float) and pd.isna(v)) or (
                            v is pd.NaT
                        ):
                            parts.append(_enc_long(0))  # union branch: null
                        else:
                            parts.append(_enc_long(1) + _encode_value(base, v))
                    encoded.append(b"".join(parts))
                yield encoded

        fname = os.path.join(local, f"part-{pid:05d}.avro")
        tmp = f"{fname}.__tmp"
        with open(tmp, "wb") as fh:
            n = _write_container(fh, schema, chunks())
        os.rename(tmp, fname)
        yield pd.DataFrame({"file": [fname], "n_rows": [n]})

    try:
        manifest = df.mapInPandas(kernel, "file string, n_rows long").collect()
    except BaseException:
        shutil.rmtree(local, ignore_errors=True)
        raise
    # swap: old aside -> tmp in -> drop old (restore the original if the
    # move-in itself fails; same ordering as operators.mutation.rewrite)
    old_aside = f"{target}.__old_{token}"
    had_old = os.path.exists(target)
    if had_old:
        os.rename(target, old_aside)
    try:
        os.rename(local, target)
    except BaseException:
        if had_old and not os.path.exists(target):
            os.rename(old_aside, target)
        raise
    if had_old:
        shutil.rmtree(old_aside, ignore_errors=True)
    return sum(r.n_rows for r in manifest)


def read_avro(spark: SparkSession, path: str, schema_ddl: str) -> DataFrame:
    """Read a directory of Avro container files into a DataFrame with the
    DECLARED schema (explicit-schema rule; the embedded writer schema is
    verified against it field-for-field — name order and base type — so a
    drifted file fails loud). Native datasource when available."""
    if _native_avro_available(spark):
        return spark.read.format("avro").schema(schema_ddl).load(path)

    from pyspark.sql.types import StructType

    declared = StructType.fromDDL(schema_ddl)
    want = [
        (f.name, _base_type(["null", _SPARK_TO_AVRO[f.dataType.simpleString()]]))
        for f in declared.fields
    ]
    files = spark.read.format("binaryFile").load(
        path.rstrip("/") + "/part-*.avro"
    )

    def kernel(batches):
        import pandas as pd

        for pdf in batches:
            for content in pdf["content"]:
                schema, blocks = _read_container(bytes(content))
                got = [
                    (f["name"], _base_type(f["type"])) for f in schema["fields"]
                ]
                if got != want:
                    raise ValueError(
                        f"avro schema drift: file has {got}, declared {want}"
                    )
                cols: list[list] = [[] for _ in want]
                for count, payload in blocks():
                    for _ in range(count):
                        for i, (_, base) in enumerate(want):
                            if _dec_long(payload) == 0:
                                cols[i].append(None)
                            else:
                                cols[i].append(_decode_value(base, payload))
                yield pd.DataFrame(
                    {name: pd.Series(vals, dtype="object") for (name, _), vals in zip(want, cols)}
                )

    return files.select("content").mapInPandas(kernel, declared)
