"""Multi-format source/sink round-trips: CSV, JSON(L), ORC, and XML.

The reference's only sink is one pretty-printed JSON file per saved run
(`/root/reference/src/flink_estimator/estimation.py:611-656`, covered by
``estimator/persistence.py``); a real analytics engine also ingests and
emits the common interchange formats.  The rule enforced here is
**write-schema == read-schema**: every read uses the explicit schema of the
DataFrame that was written (never inference), so a round-trip is lossless
and a schema drift is an error at the scan, not a silent type change
downstream.

Format notes that matter at scale:

* CSV/JSON carry no types — reads take the explicit ``StructType``;
  timestamps go through an explicit format string so the text form is
  engine-stable.
* All three writers emit one file per partition (no coalesce(1)) — at
  100 TB a single-file sink is a driver bottleneck; downstream readers
  glob the directory.
* ORC/parquet keep predicate pushdown and column pruning; CSV/JSON scans
  read whole rows — they are interchange formats, not query formats, and
  the round-trip tests document that asymmetry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


# TIMESTAMP and TIMESTAMP_NTZ columns are formatted by *different* options
# (timestampFormat vs timestampNTZFormat); setting only the first silently
# writes NTZ columns with the millis-only default and truncates micros.
_TS_OPTS = {"timestampFormat": TS_FMT, "timestampNTZFormat": TS_FMT}


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", True)
        .options(**_TS_OPTS)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", True)
        .options(**_TS_OPTS)
        .csv(path)
    )


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(**_TS_OPTS).json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).options(**_TS_OPTS).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_xml(df: DataFrame, path: str, row_tag: str = "row") -> None:
    """Spark-4 built-in XML sink (no external package): one file per
    partition, explicit rowTag.  XML is an ingest format for feeds/configs;
    like CSV/JSON it carries no types, so reads go through the writer's
    explicit schema."""
    (
        df.write.mode("overwrite")
        .format("xml")
        .option("rowTag", row_tag)
        .options(**_TS_OPTS)
        .save(path)
    )


def read_xml(spark: SparkSession, path: str, schema, row_tag: str = "row") -> DataFrame:
    return (
        spark.read.format("xml")
        .schema(schema)
        .option("rowTag", row_tag)
        .options(**_TS_OPTS)
        .load(path)
    )


def write_partitioned(df: DataFrame, path: str, *keys: str) -> None:
    """Hive-style partition-keyed parquet layout (``key=value`` directories).

    The scale contract this layout buys: a filter on a partition key becomes
    directory pruning — the scan never opens non-matching files, so a
    day-partitioned 100 TB table answers a one-day query by reading ~1/365th
    of the bytes.  ``tests/test_formats.py`` asserts the pruning actually
    happens (PartitionFilters in the scan node, matched file count drops),
    not just that the layout round-trips.

    Partition keys should be low-cardinality (day, source, language —
    thousands of values, not millions): each value is a directory, and
    millions of tiny files kill the scan's file-listing phase long before
    query time."""
    df.write.mode("overwrite").partitionBy(*keys).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partition-keyed layout; partition columns come back typed by
    directory-name inference, and filters on them prune at planning time."""
    return spark.read.parquet(path)


def write_clustered(df: DataFrame, path: str, *sort_keys: str,
                    block_bytes: int = 128 * 1024 * 1024) -> None:
    """Sort-clustered parquet write: rows sorted on ``sort_keys`` WITHIN
    each output file, with bounded row-group size — the data-skipping
    layout for high-cardinality keys that are too fine for hive
    partitioning (timestamps, numeric ranges).

    Parquet footers carry per-row-group min/max statistics for every
    column; engines (Spark parquet filter pushdown, DuckDB zone maps) skip
    any row group whose [min, max] cannot satisfy the predicate.  On
    unsorted data every group spans nearly the full key range and nothing
    skips; sorting within files makes the ranges disjoint, so a range
    predicate touches O(selectivity) groups — the poor man's z-order, at
    zero read-side cost.  ``sortWithinPartitions`` (not a global ``sort``)
    keeps the write embarrassingly parallel: clustering is per-file, which
    is exactly the granularity footer stats operate at.

    ``tests/test_formats.py`` asserts the row-group min/max ranges are
    near-disjoint and that a range predicate could skip the expected
    fraction of groups — the footer-level truth, not just a round-trip."""
    (
        df.sortWithinPartitions(*sort_keys)
        .write.mode("overwrite")
        .option("parquet.block.size", block_bytes)
        .parquet(path)
    )


def compact(spark: SparkSession, src: str, dst: str,
            target_file_bytes: int = 128 * 1024 * 1024) -> int:
    """Small-files compaction: rewrite a parquet directory into files of
    ~``target_file_bytes`` each; returns the output file count.

    Streaming sinks, partitioned writes, and incremental loads all shed
    small files; at 100 TB the file-listing and per-file open cost of a
    million 1 MB files dominates scan time long before the bytes do, and
    HDFS/object-store metadata strains first.  The rewrite sizes the
    partition count from the *source bytes on disk* (cheap file-status sum,
    no data read) rather than a row count, then round-robins rows into
    exactly that many writer tasks.  Compression ratios shift the exact
    output size; the invariant that matters is O(bytes/target) files, not
    O(input files).
    """
    import os

    total = 0
    for root, _dirs, files in os.walk(src):
        total += sum(
            os.path.getsize(os.path.join(root, f))
            for f in files
            if f.endswith(".parquet") or f.startswith("part-")
        )
    n_out = max(1, -(-total // target_file_bytes))  # ceil div
    df = spark.read.parquet(src)
    df.repartition(n_out).write.mode("overwrite").parquet(dst)
    return len([
        f for f in os.listdir(dst)
        if f.startswith("part-") and not f.endswith(".crc")
    ])


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Ingest opaque binary assets (images/audio/video) via Spark's built-in
    ``binaryFile`` source: (path, modificationTime, length, content) with
    the bytes as a ``binary`` column — the front door of the multimodal
    pipeline (operators/multimodal.py consumes exactly this shape).

    Scale notes: the source parallelizes by file (one file per task at
    most); millions of small assets should be compacted into parquet with
    a binary column first (the ``compact`` pattern), which also restores
    column pruning — binaryFile always reads whole files.
    ``pathGlobFilter`` prunes by name BEFORE any bytes are read.
    """
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def zorder_value(a, b, a_min, a_max, b_min, b_max, bits: int = 12):
    """Z-order (Morton) key from two numeric columns: each value scales to a
    ``bits``-bit code over its [min, max] range, and the codes' bits
    interleave — points close in BOTH dimensions get close z-values, so a
    z-sorted layout gives row-group min/max locality on every participating
    column at once (single-key sort clustering gives it on one).
    All built-in bit arithmetic: ~3*bits shift/and/or ops, codegen-friendly.
    """
    from pyspark.sql import functions as F

    top = (1 << bits) - 1

    def code(x, lo, hi):
        span = (hi - lo).cast("double")
        c = F.floor(((x.cast("double") - lo.cast("double")) * top) / span)
        return (
            F.when(span == 0, F.lit(0).cast("long"))
            .otherwise(F.least(F.lit(top).cast("long"),
                               F.greatest(F.lit(0).cast("long"), c.cast("long"))))
        )

    ca, cb = code(a, a_min, a_max), code(b, b_min, b_max)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(ca, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(cb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def write_zordered(df: DataFrame, path: str, col_a: str, col_b: str,
                   block_bytes: int = 128 * 1024 * 1024) -> None:
    """Z-order-clustered parquet write: rows sorted by the Morton key of
    (col_a, col_b) within each file, bounded row groups — the two-column
    extension of ``write_clustered``: a range predicate on EITHER column
    skips most row groups via footer min/max, where a single-key sort only
    serves its one key (the second column's ranges stay full-width).

    Column bounds come from one tiny aggregate broadcast back onto the
    scan; the z-key is computed inline and dropped before the write.  Like
    write_clustered this sorts WITHIN partitions (embarrassingly parallel,
    no shuffle); a global ``repartitionByRange`` on the z-key upgrades it
    to total clustering when files must also be disjoint — the deploy-time
    knob Delta's OPTIMIZE ZORDER turns."""
    from pyspark.sql import functions as F

    bounds = df.agg(
        F.min(col_a).alias("_a_min"), F.max(col_a).alias("_a_max"),
        F.min(col_b).alias("_b_min"), F.max(col_b).alias("_b_max"),
    )
    z = zorder_value(
        F.col(col_a), F.col(col_b),
        F.col("_a_min"), F.col("_a_max"), F.col("_b_min"), F.col("_b_max"),
    )
    (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("_z", z)
        .sortWithinPartitions("_z")
        .drop("_z", "_a_min", "_a_max", "_b_min", "_b_max")
        .write.mode("overwrite")
        .option("parquet.block.size", block_bytes)
        .parquet(path)
    )
