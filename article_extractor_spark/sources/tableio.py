"""Bucketed table IO + per-partition lineage (checkpoint/resume).

Iceberg-shaped layout emulated on Parquet (no Iceberg runtime jar in
this sandbox — SURVEY.md §7.0): tables are physically partitioned by
``bucket = pmod(xxhash64(doc_id), N)``, the same co-location Iceberg's
``bucket(N, doc_id)`` transform gives.  Call sites are written so that
swapping ``.format("parquet")`` for ``.format("iceberg")`` +
``PARTITIONED BY (bucket(N, doc_id))`` is a local change.

The lineage table follows the reference's append-only change-queue
pattern (storage_queue.py:87-293 — ordered, replayable commit records):
one row per (run, bucket) with extraction metrics; resume = anti-join
input buckets against committed lineage (SURVEY.md §4 item 5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_BUCKETS = 32

# Parquet row-group target for bucketed writes.  A byte-range scan
# split beyond the row-group count comes up EMPTY (a task reads the
# row groups whose midpoint falls in its range), so a bucket file
# written as ONE giant row group caps every downstream scan at one
# task per file no matter how small maxPartitionBytes is set —
# measured: a 240k-doc corpus written as 32 single-group files ran the
# whole fused extraction wave as 32 coarse tasks, turning the 32-core
# stage into a single straggler-bound round and capping 8→32 scaling
# at ~0.43.  4 MiB groups give scans row-group-granular split points
# so task width is actually governed by maxPartitionBytes.  This is
# the knob Iceberg exposes as ``write.parquet.row-group-size-bytes``
# (its 128 MiB default with 512 MiB target files keeps the same
# several-groups-per-file ratio at production scale).
ROW_GROUP_BYTES = 4 << 20

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("bucket", T.IntegerType()),
        T.StructField("doc_id_min", T.StringType()),
        T.StructField("doc_id_max", T.StringType()),
        T.StructField("docs_in", T.LongType()),
        T.StructField("docs_ok", T.LongType()),
        T.StructField("parse_failures", T.LongType()),
        T.StructField("nodes_scored", T.LongType()),
        T.StructField("spans_emitted", T.LongType()),
        T.StructField("cpu_ms", T.LongType()),
        T.StructField("committed_at", T.TimestampType()),
    ]
)


def with_bucket(
    df: DataFrame, id_col: str = "doc_id", n_buckets: int = DEFAULT_BUCKETS
) -> DataFrame:
    """Stable bucket assignment on the document key (Iceberg
    bucket-transform emulation).

    Hashes the STRING CAST of the id (``string_bucket_expr``), so a
    corpus with a natively-numeric id gets the same bucket its
    extraction output re-derives from the stringified id — hashing the
    native type decorrelated wave buckets from output buckets and
    corrupted per-wave lineage counts (ADVICE r4).  For string ids the
    cast is a no-op."""
    return df.withColumn("bucket", string_bucket_expr(n_buckets, id_col))


def write_bucketed(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    dynamic: bool = True,
    files_per_bucket: int = 1,
    n_buckets: int = DEFAULT_BUCKETS,
    preshuffled: bool = False,
) -> None:
    """Write a table partitioned by ``bucket``.

    ``dynamic=True`` only rewrites the bucket directories present in
    ``df`` (partitionOverwriteMode=dynamic) — the resume path re-writes
    only uncommitted buckets.

    The frame is re-shuffled onto the bucket key first so each bucket
    directory gets ``files_per_bucket`` files instead of one file per
    upstream task (without this, N_tasks × N_buckets small files make
    the driver-side dynamic-overwrite commit the job bottleneck —
    measured: it erased all >8-core scaling at 240k docs).

    ``preshuffled=True`` skips that exchange: the caller asserts its
    task layout is already (near-)aligned with the bucket key — true
    for any narrow pipeline over a scan of a bucket-partitioned table,
    where each split lies inside one ``bucket=k`` directory.  Then the
    clustered write needs no distribution (Iceberg's
    ``write.distribution-mode=none`` for a write whose input is
    already clustered): total file count is bounded by the number of
    scan tasks (+1 per rare split that bin-packed across two bucket
    dirs), NOT tasks × buckets, and the whole
    scan→render→extract→write pipeline runs as ONE exchange-free
    stage — the extraction job's hot path no longer re-serializes
    every output byte through a shuffle (measured: the repartition
    write added a ~flat-with-cores stage that Amdahl-capped 8→32
    scaling at 240k docs).

    ``files_per_bucket > 1`` adds a doc_id-derived salt to the
    repartition key: hashing on the bucket value alone puts each
    bucket's rows in exactly one task regardless of the partition
    count, so without the salt a bucket could never produce more than
    one file (and hash collisions could fold several buckets into one
    straggler task).
    """
    files_per_bucket = max(files_per_bucket, 1)
    if preshuffled:
        writer = df.write.mode(mode).option(
            "parquet.block.size", str(ROW_GROUP_BYTES)
        )
        if dynamic:
            writer = writer.option("partitionOverwriteMode", "dynamic")
        writer.partitionBy("bucket").parquet(path)
        return
    if files_per_bucket > 1 and "doc_id" in df.columns:
        # salt must be decorrelated from the bucket hash — bucket is
        # pmod(xxhash64(doc_id), N), so a bare xxhash64(doc_id) salt is
        # a function of the bucket for N | files_per_bucket; the extra
        # literal input gives an independent hash
        salt = F.pmod(
            F.xxhash64(F.col("doc_id"), F.lit("file-salt")),
            F.lit(files_per_bucket),
        )
        df = df.repartition(
            files_per_bucket * n_buckets, F.col("bucket"), salt
        )
    else:
        df = df.repartition(n_buckets, "bucket")
    writer = df.write.mode(mode).option(
        "parquet.block.size", str(ROW_GROUP_BYTES)
    )
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.partitionBy("bucket").parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def string_bucket_expr(n_buckets: int, id_col: str = "doc_id"):
    """Bucket of the STRING CAST of the id — the exact expression the
    extraction output re-derives its bucket with (job.py), so a corpus
    bucketed through this expression stays correlated with its output
    buckets even when ``doc_id`` is natively numeric (xxhash64 of a
    long differs from xxhash64 of its decimal string — ADVICE r4)."""
    return F.pmod(
        F.xxhash64(F.col(id_col).cast("string")), F.lit(n_buckets)
    ).cast("int")


def has_bucket_dirs(spark: SparkSession, path: str, n_buckets: int) -> bool:
    """True when ``path`` is physically laid out as ``bucket=k``
    partition directories (driver-side FS metadata glob).  A table with
    a plain ``bucket`` DATA column in unpartitioned files also exposes
    the column after read, but its task splits span buckets — the
    preshuffled write is only safe against the directory layout."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path.rstrip("/") + "/bucket=*")
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    try:
        statuses = fs.globStatus(jpath)
    except Exception:  # pragma: no cover - FS-specific glob failures
        return False
    if statuses is None:
        return False
    dirs = [s for s in statuses if s.isDirectory()]
    return 0 < len(dirs) <= n_buckets


def bucket_sample_aligned(
    df: DataFrame,
    n_buckets: int,
    id_col: str = "doc_id",
    sample_rows: int = 128,
) -> bool:
    """Cheap probabilistic check that ``df.bucket`` equals
    ``pmod(xxhash64(CAST(id AS STRING)), n_buckets)`` — the invariant
    the job's wave/lineage protocol and the preshuffled write both rest
    on.  Every failure mode this guards against (corpus bucketed with a
    different n_buckets, bucketed on a non-string id hash, or an
    arbitrary foreign bucket column) is SYSTEMATIC — each sampled row
    mismatches with probability ~(N-1)/N — so a first-rows sample of
    128 misses a misalignment with probability ~N^-128.  Cost: one
    CollectLimit job over (id, bucket), a few row groups of one file.
    """
    expected = string_bucket_expr(n_buckets, id_col)
    bad = (
        df.select(F.col(id_col), F.col("bucket"))
        .limit(sample_rows)
        .where(F.col("bucket") != expected)
        .take(1)
    )
    return not bad


def clear_buckets(spark: SparkSession, path: str, buckets) -> None:
    """Delete the given ``bucket=k`` partition directories (driver-side
    FS metadata calls, FS-agnostic via the Hadoop API).

    This is the cheap half of what ``partitionOverwriteMode=dynamic``
    does — and doing ONLY this lets wave writes be plain appends.  The
    dynamic-overwrite protocol stages every task file and then moves
    each partition directory on the driver at job commit: a fixed,
    core-count-independent cost (measured: +18.5 s on a 240k-doc wave
    on local disk, worse on object stores, where the "move" is a copy)
    that Amdahl-caps job scaling.  The job instead wipes uncommitted
    bucket dirs once up front — a no-op on the happy path, non-empty
    only after a crash — and appends, which commits task files in
    place with no staging move."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return
    for b in buckets:
        bpath = jvm.org.apache.hadoop.fs.Path(f"{path}/bucket={int(b)}")
        if fs.exists(bpath):
            fs.delete(bpath, True)


def has_iceberg(spark: SparkSession) -> bool:
    """Capability probe: True when the Iceberg Spark runtime jar is on
    the session classpath (``has_image_codec`` pattern — the real
    branch activates when the jar is dropped in, no code change).

    Probes the JVM for the Spark-runtime entry class rather than
    importing anything Python-side: Iceberg support is a jar, not a
    pip package."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.extensions."
            "IcebergSparkSessionExtensions"
        )
        return True
    except Exception:  # pragma: no cover - environment-dependent
        return False


def write_bucketed_iceberg(
    df: DataFrame,
    table: str,
    *,
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
) -> None:
    """The real-Iceberg twin of ``write_bucketed``: V2 writeTo with a
    native ``bucket(N, doc_id)`` partition transform instead of the
    emulated ``bucket`` directory column.

    Gated on ``has_iceberg`` — this sandbox ships no Iceberg jar
    (SURVEY.md §7.0), so calling it here raises; in an Iceberg-enabled
    session (``--packages org.apache.iceberg:iceberg-spark-runtime-*``
    plus a configured catalog) it creates/replaces the table with the
    same co-location guarantee the emulation provides.  ``table`` is a
    catalog-qualified name (``catalog.db.tbl``), not a path — Iceberg
    owns the layout, so no manual repartition/salting is needed: the
    fanout-on-write distribution mode handles file sizing.
    """
    if not has_iceberg(df.sparkSession):
        raise NotImplementedError(
            "Iceberg runtime jar not on the classpath; the emulated "
            "write_bucketed() Parquet layout is the active path here"
        )
    df.writeTo(table).using("iceberg").partitionedBy(
        F.bucket(n_buckets, F.col(id_col))
    ).createOrReplace()


def read_table_iceberg(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read twin of ``read_table`` (gated like the write)."""
    if not has_iceberg(spark):
        raise NotImplementedError(
            "Iceberg runtime jar not on the classpath"
        )
    return spark.read.table(table)


def lineage_path(output_path: str) -> str:
    return output_path.rstrip("/") + "_lineage"


def table_exists(spark: SparkSession, path: str) -> bool:
    """Filesystem-agnostic existence check (works for HDFS/S3A too)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return bool(fs.exists(jpath))


def dir_size_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under a table path (driver-side FS metadata call)."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return 0
    return int(fs.getContentSummary(jpath).getLength())


def read_committed_buckets(spark: SparkSession, output_path: str) -> set[int]:
    """Buckets already committed for this output table (any run)."""
    lpath = lineage_path(output_path)
    if not table_exists(spark, lpath):
        return set()
    lineage = spark.read.parquet(lpath)
    rows = lineage.select("bucket").distinct().collect()
    return {r["bucket"] for r in rows}


def build_lineage(result: DataFrame, run_id: str) -> DataFrame:
    """Aggregate per-bucket extraction metrics from the result table.
    Tiny shuffle (N_buckets rows) — the only shuffle in the job."""
    return (
        result.groupBy("bucket")
        .agg(
            F.min("doc_id").alias("doc_id_min"),
            F.max("doc_id").alias("doc_id_max"),
            F.count(F.lit(1)).alias("docs_in"),
            F.sum(F.col("success").cast("long")).alias("docs_ok"),
            F.sum((~F.col("success")).cast("long")).alias("parse_failures"),
            F.sum("nodes_scored").alias("nodes_scored"),
            F.sum("spans_emitted").alias("spans_emitted"),
            (F.sum("proc_us") / 1000).cast("long").alias("cpu_ms"),
        )
        .withColumn("run_id", F.lit(run_id))
        .withColumn("committed_at", F.current_timestamp())
        .select([f.name for f in LINEAGE_SCHEMA.fields])
    )


def append_lineage(lineage: DataFrame, output_path: str) -> None:
    # lineage is <= n_buckets rows; without the coalesce,
    # createDataFrame spreads them over defaultParallelism partitions
    # and the append runs a 32-task write job for 32 rows (measured
    # 1.5 s of pure task-launch overhead per wave at local[32])
    lineage.coalesce(1).write.mode("append").parquet(
        lineage_path(output_path)
    )


def append_lineage_rows(
    spark: SparkSession, rows: list[tuple], output_path: str
) -> None:
    """Driver-side lineage commit: serialize ≤ n_buckets rows to one
    parquet file with pyarrow and stream it through the JVM Hadoop
    filesystem handle — zero Spark jobs, any Hadoop FS.

    The Spark spelling (``append_lineage``) launches a full 1-task
    write job per wave — measured 1.5-2.3 s of scheduler + committer
    fixed cost, a core-count-independent term that Amdahl-caps the
    N→4N executor scaling (the dynamic-partition-overwrite lesson one
    layer down).  A ~2 KB metadata record is driver work — the same
    shape as Iceberg's manifest commit."""
    if not rows:
        return
    import io
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from datetime import timezone

    cols = list(zip(*rows))
    ts = [
        (t.replace(tzinfo=timezone.utc) if t.tzinfo is None else t)
        for t in cols[10]
    ]
    table = pa.table(
        {
            "run_id": pa.array(cols[0], pa.string()),
            "bucket": pa.array(cols[1], pa.int32()),
            "doc_id_min": pa.array(cols[2], pa.string()),
            "doc_id_max": pa.array(cols[3], pa.string()),
            "docs_in": pa.array(cols[4], pa.int64()),
            "docs_ok": pa.array(cols[5], pa.int64()),
            "parse_failures": pa.array(cols[6], pa.int64()),
            "nodes_scored": pa.array(cols[7], pa.int64()),
            "spans_emitted": pa.array(cols[8], pa.int64()),
            "cpu_ms": pa.array(cols[9], pa.int64()),
            "committed_at": pa.array(ts, pa.timestamp("us", tz="UTC")),
        }
    )
    buf = io.BytesIO()
    pq.write_table(table, buf)
    name = f"part-{os.urandom(8).hex()}.parquet"
    jvm = spark._jvm
    jdir = jvm.org.apache.hadoop.fs.Path(lineage_path(output_path))
    fs = jdir.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.mkdirs(jdir)
    out = fs.create(
        jvm.org.apache.hadoop.fs.Path(f"{lineage_path(output_path)}/{name}"),
        True,
    )
    out.write(bytearray(buf.getvalue()))
    out.close()
