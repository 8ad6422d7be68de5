"""Object-store abstraction for blob externalization (SURVEY §2 A12-A15).

The reference talks to S3 via presigned URLs and per-request STS tokens
(order.js:357-448). In the engine, object I/O happens inside executor
tasks, so the contract is a small client created *per partition* (one
client per partition = the reference's batching lesson, G1: one credential/
client setup per page, never per row — order.js:277-282, README.md:219-226).

Two implementations:
- ``LocalFSObjectStore`` — file:// tree, used by tests and local runs.
- ``S3ObjectStore``      — boto3-backed, import-gated (boto3 absent here);
  identical interface, used on a real cluster.

Both honor the reference's error taxonomy: existence-check before delete,
absent object treated as success (order.js:439-446, README.md:125-126).
"""

from __future__ import annotations

import os


class LocalFSObjectStore:
    """File-tree object store: key → <root>/<key>."""

    def __init__(self, root: str):
        self.root = root.rstrip("/")

    def _path(self, key: str) -> str:
        return f"{self.root}/{key}"

    def put(self, key: str, payload: bytes) -> None:
        path = self._path(key)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "wb") as f:
            f.write(payload)

    def get(self, key: str) -> bytes:
        with open(self._path(key), "rb") as f:
            return f.read()

    def head(self, key: str) -> bool:
        return os.path.isfile(self._path(key))

    def delete(self, key: str) -> bool:
        """Absence-tolerant delete (skip = success, README.md:125-126)."""
        try:
            os.remove(self._path(key))
            return True
        except FileNotFoundError:
            return True


class S3ObjectStore:
    """boto3-backed store. Mirrors LocalFSObjectStore; one client per
    instance — construct inside foreachPartition, never on the driver."""

    def __init__(self, bucket: str, region: str | None = None):
        try:
            import boto3
        except ImportError as e:  # pragma: no cover - boto3 absent in this env
            raise NotImplementedError("boto3 not available in this environment") from e
        self.bucket = bucket.replace("arn:aws:s3:::", "")  # F6, order.js:422
        self._client = boto3.client("s3", region_name=region)

    def put(self, key: str, payload: bytes) -> None:  # pragma: no cover
        self._client.put_object(Bucket=self.bucket, Key=key, Body=payload)

    def get(self, key: str) -> bytes:  # pragma: no cover
        return self._client.get_object(Bucket=self.bucket, Key=key)["Body"].read()

    def head(self, key: str) -> bool:  # pragma: no cover
        try:
            self._client.head_object(Bucket=self.bucket, Key=key)
            return True
        except Exception:
            # NotFound/Forbidden both read as absent (order.js:439-446)
            return False

    def delete(self, key: str) -> bool:  # pragma: no cover
        try:
            self._client.delete_object(Bucket=self.bucket, Key=key)
            return True
        except Exception:
            return True


def make_store(url: str):
    """``file:///path`` or ``s3://bucket`` → store instance. Called inside
    executor tasks (the factory string travels; clients do not)."""
    if url.startswith("file://"):
        return LocalFSObjectStore(url.removeprefix("file://"))
    if url.startswith("s3://"):
        return S3ObjectStore(url.removeprefix("s3://").split("/", 1)[0])
    raise ValueError(f"unsupported object store url: {url}")
