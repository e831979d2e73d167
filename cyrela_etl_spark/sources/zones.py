"""Zone-based data movement (reference operators S3/S5/S10-S12, SURVEY.md §2.1).

The reference moves objects between MinIO buckets
landing → processing → curated → serving with copy/delete operators
(reference dags/s3-etl-wallet-csv.py:24-27,161-176,196-201). Here a zone is
just a path prefix (local dir, s3a://, hdfs:// — anything Hadoop FS speaks);
promotion = reading from one zone and writing to the next, optionally
removing consumed inputs. The S3A connector replaces the MinIO SDK; no
byte-copy operator exists because a distributed write IS the copy.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

ZONE_ORDER = ["landing", "processing", "curated", "serving"]


@dataclass
class ZoneStore:
    """A lakehouse root with the reference's four zones under it."""

    spark: SparkSession
    root: str
    zones: list[str] = field(default_factory=lambda: list(ZONE_ORDER))

    def path(self, zone: str, key: str = "") -> str:
        if zone not in self.zones:
            raise ValueError(f"unknown zone {zone!r}; have {self.zones}")
        return f"{self.root}/{zone}/{key}".rstrip("/")

    # -- listing / cleanup (reference S9, S11/S12) --------------------------
    def _fs(self):
        jvm = self.spark._jvm
        jsc = self.spark._jsc
        return jvm.org.apache.hadoop.fs.FileSystem.get(jsc.hadoopConfiguration()), jvm

    def list_keys(self, zone: str, prefix: str = "") -> list[str]:
        """List object keys under a zone prefix (reference S3ListOperator,
        dags/s3-etl-wallet-csv.py:152-158). Driver-side metadata op."""
        fs, jvm = self._fs()
        p = jvm.org.apache.hadoop.fs.Path(self.path(zone, prefix))
        if not fs.exists(p):
            return []
        it = fs.listFiles(p, True)
        keys = []
        base = self.path(zone) + "/"
        while it.hasNext():
            keys.append(it.next().getPath().toString().split(base, 1)[-1])
        return sorted(keys)

    def delete(self, zone: str, key: str) -> bool:
        """Remove a consumed object (reference S3DeleteObjectsOperator,
        dags/s3-etl-wallet-csv.py:171-176,196-201)."""
        fs, jvm = self._fs()
        return bool(fs.delete(jvm.org.apache.hadoop.fs.Path(self.path(zone, key)), True))

    # -- promotion ----------------------------------------------------------
    def promote(
        self,
        df: DataFrame,
        to_zone: str,
        key: str,
        fmt: str = "parquet",
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> str:
        """Write a DataFrame into the next zone; returns the target path.

        Zones store Parquet internally; CSV only at the lake edges
        (ingest from landing, egress to serving consumers).
        """
        target = self.path(to_zone, key)
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        if fmt == "parquet":
            writer.parquet(target)
        elif fmt == "csv":
            writer.options(header="true").csv(target)
        else:
            raise ValueError(f"unsupported zone format {fmt!r}")
        return target
