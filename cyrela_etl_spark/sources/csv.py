"""CSV source/sink (reference operators S1/S2/S4/S5 in SURVEY.md §2.1).

The reference reads curated CSV with an explicit schema and header skip
(reference spark/jobs/pr-wallet-data-tf.py:60-64) and writes header'd CSV
with overwrite (reference spark/jobs/pr-wallet-data-tf.py:127-131). The
pandas leg additionally drops the first *data* row via ``header=1``
(reference dags/s3-etl-wallet-csv.py:103) — reproduced here behind an
explicit ``skip_first_data_row`` compat flag so golden outputs match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cyrela_etl_spark.schemas import wallet_schema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    header: bool = True,
    **options: str,
) -> DataFrame:
    """CSV scan with explicit schema (never inferred — inference is a full
    extra pass over the data, untenable at scale and version-unstable)."""
    reader = spark.read.options(header="true" if header else "false", **options)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        # No schema given: read everything as string; callers cast.
        reader = reader.option("inferSchema", "false")
    return reader.csv(path)


def read_wallet_csv(
    spark: SparkSession,
    path: str,
    skip_first_data_row: bool = False,
) -> DataFrame:
    """Read a wallet-zone CSV with the 23-column declared schema.

    ``skip_first_data_row=True`` reproduces the reference's pandas
    ``header=1`` quirk (reference dags/s3-etl-wallet-csv.py:103): the first
    data row is treated as a header and discarded, so curated output has
    N-1 rows. Implemented distributedly via a monotonic row tag on the raw
    scan — no driver collect.
    """
    df = read_csv(spark, path, schema=wallet_schema(), header=True)
    if skip_first_data_row:
        # Single-file contract: the row being dropped is defined by the
        # reference's one-file pandas header=1 semantics; with multiple
        # input files "the first data row" is meaningless.
        files = df.inputFiles()
        if len(files) != 1:
            raise ValueError(
                "skip_first_data_row requires exactly one input file "
                f"(got {len(files)}): the dropped row is the file's first "
                "data row per the reference's header=1 semantics"
            )
        # Deterministic identification of the file's first data row, robust
        # to Spark's split packing (splits are packed size-desc, so
        # partition ordinals do NOT follow file offsets): the first data
        # row lives in the byte-offset-0 block (where the CSV reader also
        # strips the header), and within that block rows are read in order
        # with ascending monotonically_increasing_id. min(id) over block-0
        # rows is therefore exactly the first data row. One tiny agg job,
        # broadcast anti-join back — no global sort, no collect.
        tagged = df.withColumn("__rowid", F.monotonically_increasing_id()).withColumn(
            "__blk0", F.input_file_block_start() == 0
        )
        first = tagged.filter(F.col("__blk0")).select(F.min("__rowid").alias("__min_rowid"))
        df = (
            tagged.join(F.broadcast(first), on=tagged["__rowid"] == first["__min_rowid"], how="left_anti")
            .drop("__rowid", "__blk0")
        )
    return df


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    """CSV sink with header (reference spark/jobs/pr-wallet-data-tf.py:127-131)."""
    df.write.mode(mode).options(header="true" if header else "false").csv(path)


def read_csv_audited(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """CSV scan that CAPTURES malformed rows instead of silently nulling
    or dropping them: PERMISSIVE mode with an explicit corrupt-record
    column appended to the declared schema. A 100 TB ingest always
    contains malformed lines; the three stock behaviors are silent-null
    (default PERMISSIVE), silent-drop (DROPMALFORMED — forbidden here:
    row counts must reconcile), and fail-the-job (FAILFAST). This wrapper
    makes the damage VISIBLE and relational: downstream splits on
    ``corrupt_col IS NULL`` and routes bad rows to an audit sink.

    Note Spark's lazy-parse caveat: a query that selects ONLY the corrupt
    column is disallowed (Spark requires a non-internal column in the
    projection) — always select data columns alongside, or cache first.
    """
    audited = T.StructType(schema.fields + [T.StructField(corrupt_col, T.StringType(), True)])
    return (
        spark.read.options(header="true" if header else "false")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(audited)
        .csv(path)
    )


def split_audited(df: DataFrame, corrupt_col: str = "_corrupt_record") -> tuple[DataFrame, DataFrame]:
    """(good_rows_without_audit_col, bad_rows_raw_text) from an audited scan.

    The input is cached here: Spark disallows a query whose only
    referenced CSV column is the internal corrupt-record column, so the
    bad-rows leg would otherwise throw AnalysisException on an uncached
    scan — and both legs re-scanning the raw CSV would double-parse
    anyway. Callers can ``unpersist()`` the returned legs' source when
    done (audit splits are bounded ingest steps, not hot-path relations).
    """
    df = df.cache()
    good = df.filter(F.col(corrupt_col).isNull()).drop(corrupt_col)
    bad = df.filter(F.col(corrupt_col).isNotNull()).select(F.col(corrupt_col).alias("raw_line"))
    return good, bad
