"""JDBC source — SURVEY §2 A16 (the reference's hand-rolled MySQL connector,
order.js:521-588, replaced wholesale by Spark's JDBC DataSource).

The reference opens one connection per Lambda through RDS Proxy; Spark's
JDBC source gives the same multiplexing via ``numPartitions`` bounded
parallel range scans, plus pushdown the reference did by hand:
predicates/projection always, and COUNT/ORDER/LIMIT with
``pushDownAggregate``/``pushDownLimit`` (SURVEY §4).

No MySQL is reachable in this environment, so this module only *builds*
readers/writers (tested structurally); on a cluster it is the production
ingest path of the north-star pipeline (BASELINE.json: "Spark JDBC source
to S3 write").
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class JdbcSource:
    url: str                       # jdbc:mysql://proxy:3306/main
    table: str                     # table name or "(subquery) alias"
    user: str | None = None
    password: str | None = None    # IAM auth token in the reference's setup
    driver: str = "com.mysql.cj.jdbc.Driver"
    partition_column: str | None = None   # numeric/date PK for range splits
    num_partitions: int = 32
    fetchsize: int = 10_000
    extra: dict = field(default_factory=dict)

    def options(self, lower_bound=None, upper_bound=None) -> dict:
        opts = {
            "url": self.url,
            "dbtable": self.table,
            "driver": self.driver,
            "fetchsize": str(self.fetchsize),
            # let the DB do what the reference pushed down by hand (§4)
            "pushDownAggregate": "true",
            "pushDownLimit": "true",
        }
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        if self.partition_column and lower_bound is not None:
            opts.update(
                partitionColumn=self.partition_column,
                lowerBound=str(lower_bound),
                upperBound=str(upper_bound),
                numPartitions=str(self.num_partitions),
            )
        opts.update(self.extra)
        return opts

    def reader(self, spark: SparkSession, lower_bound=None, upper_bound=None):
        """Bounded-parallelism partitioned read. With a partition column the
        scan becomes ``num_partitions`` concurrent range queries — the
        RDS-Proxy connection-multiplexing analog, but data-parallel."""
        return spark.read.format("jdbc").options(
            **self.options(lower_bound, upper_bound)
        )

    def load(self, spark: SparkSession, lower_bound=None, upper_bound=None) -> DataFrame:
        return self.reader(spark, lower_bound, upper_bound).load()
