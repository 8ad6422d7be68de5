"""OrderStore — the reference's REST surface as one Python facade.

The reference exposes its engine through five Lambda routes
(`lambda_fns/order.js`: GET /orders, GET /order/{id}, POST /order,
PUT /order/{id}, DELETE /order/{id}, plus the blob variant in
`order_rdbms_blob.js`). A user switching from the reference programs
against THIS class: each method maps 1:1 onto a route and composes the
same operators the driver contract exercises (SURVEY §2 letters cited
per method). State is a Parquet table at ``path`` — the engine's
immutable-storage analog of the reference's Aurora table — with every
mutation an atomic rewrite (``operators.mutation.rewrite``; at 100 TB
the partition-scoped ``rewrite_partitions`` or a table format takes
over, see mutation.py).

    store = OrderStore(spark, path, pk="order_id")
    store.create(rows_df)               # POST /order        (A6)
    store.list(limit="3", offset="10")  # GET /orders        (A1-A3, C2, E1-E2)
    store.get("o-17")                   # GET /order/{id}    (A4)
    store.get_blob("o-17")              # GET blob variant   (A5, F2)
    store.update(updates_df)            # PUT /order/{id}    (A7/A8)
    store.delete("o-17")                # DELETE /order/{id} (A9)

Single-writer discipline per table path (documented in mutation.rewrite);
the class itself is driver-side orchestration only — every data move is a
Spark plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators import lookup, mutation, pagination


class OrderStore:
    def __init__(self, spark: SparkSession, path: str, pk: str = "order_id"):
        self.spark = spark
        self.path = path
        self.pk = pk
        mutation.recover(path)  # WAL-replay analog at startup

    # -- reads ---------------------------------------------------------------
    def _table(self) -> DataFrame:
        return self.spark.read.parquet(self.path)

    def list(
        self,
        limit: int | str | None = None,
        offset: int | str | None = None,
        columns: list[str] | None = None,
    ) -> dict:
        """GET /orders — count → clamp → ordered page → envelope
        (order.js:259-299 semantics, including the `pages` quirk)."""
        df = self._table()
        if columns:
            df = df.select(*columns)
        return pagination.page_envelope(df, self.pk, limit, offset)

    def list_after(self, after, limit: int, columns: list[str] | None = None) -> DataFrame:
        """Keyset variant of GET /orders — the 100 TB pagination path."""
        return pagination.keyset_page(self._table(), self.pk, limit, after, columns)

    def get(self, key, columns: list[str] | None = None) -> dict | None:
        """GET /order/{id} — point lookup; None for absent keys (the
        reference's 404 taxonomy)."""
        rows = lookup.point_lookup(self._table(), self.pk, key, columns).collect()
        return rows[0].asDict() if rows else None

    def get_blob(self, key, blob_col: str = "order_blob") -> bytes | None:
        """Blob route — fetch ONE row's binary column; every other read
        path never touches it (README.md:16)."""
        rows = lookup.blob_lookup(self._table(), self.pk, key, blob_col).collect()
        return rows[0][blob_col] if rows else None

    # -- writes --------------------------------------------------------------
    def create(self, rows: DataFrame) -> None:
        """POST /order — PK-safe append (existing keys win, duplicate
        inserts are no-ops like the reference's PK violation path)."""
        mutation.rewrite(
            mutation.insert_rows(self._table(), rows, self.pk), self.path
        )

    def update(self, updates: DataFrame) -> None:
        """PUT /order/{id} — keyed column update (non-blob or blob)."""
        mutation.rewrite(
            mutation.update_rows(self._table(), updates, self.pk), self.path
        )

    def upsert(self, rows: DataFrame) -> None:
        """MERGE-style create-or-update."""
        mutation.rewrite(
            mutation.upsert_rows(self._table(), rows, self.pk), self.path
        )

    def delete(self, key) -> None:
        """DELETE /order/{id} — idempotent keyed delete (absent key is a
        no-op, test/order.test.js:433-445)."""
        keys = self.spark.createDataFrame([(key,)], f"{self.pk} string") \
            if isinstance(key, str) else \
            self.spark.createDataFrame([(key,)], f"{self.pk} long")
        mutation.rewrite(
            mutation.delete_rows(self._table(), keys, self.pk), self.path
        )

    def count(self) -> int:
        """GET /orders count half (A1)."""
        return self._table().count()
