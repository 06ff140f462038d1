"""CSV / JSON sources and sinks with declared schemas (SURVEY.md §2.1).

S1: CSV scan with explicit schema + timestamp format — replaces the
reference's ``pd.read_csv(parse_dates=..., dtype={'zip': str})``
(reference README.md:299-300,376-380). No ``inferSchema`` option exists
here on purpose: inference is the reference's headline bug (zip leading
zeros, README.md:294).

S2: CSV sink (interchange); engine-internal interchange is parquet,
optionally partitioned for pruning.

S5: JSON document sink — always ``overwrite``; the reference's
append-mode writer produced a corrupt file of 3 concatenated JSON
documents (notebooks/CitiBike-1.ipynb:243, output/nearby_stations.json).
:func:`read_json_strict` surfaces that corruption as a clear error
instead of silently parsing the first document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_TS = "yyyy-MM-dd HH:mm:ss"


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    timestamp_format: str = DEFAULT_TS,
    header: bool = True,
) -> DataFrame:
    """S1 — schema-declared CSV scan."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("timestampFormat", timestamp_format)
        .option("timestampNTZFormat", timestamp_format)
        .csv(path)
    )


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """S2 — CSV sink (overwrite; single logical dataset, many part files).

    Timestamp format pinned to match :func:`read_csv` so round-trips are
    lossless (Spark's CSV default writes ISO-8601 with 'T', which a
    reader configured for the reference's 'yyyy-MM-dd HH:mm:ss' would
    null out).
    """
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("timestampFormat", DEFAULT_TS)
        .option("timestampNTZFormat", DEFAULT_TS)
        .csv(path)
    )


def write_parquet_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    files_per_partition: int | None = None,
) -> None:
    """Engine-internal interchange: parquet partitioned for pruning.

    The availability fact is partitioned by day (SURVEY.md §4
    "Partitioning") so date-ranged queries prune at the file-listing
    level — at 100 TB this is the difference between listing a day and
    scanning two months.

    ``files_per_partition`` bounds the SMALL-FILES blowup (r06 prune
    rehearsal): a bare ``partitionBy`` writes one file per (upstream
    task × partition dir) — 32 slivers/day on local[32], and at 1000
    executors a million-file layout whose LISTING (not reading)
    becomes the query cost. A shuffle on (partition cols, deterministic
    row-hash bucket) routes each partition's rows through at most
    ``files_per_partition`` writer buckets, so layout file count is
    ``≤ dirs × files_per_partition`` regardless of upstream
    parallelism. Size it to the target file size (~128 MB–1 GB per
    file at scale); the bucket is a hash of the full row, so writes
    stay deterministic under task retry.

    Compaction is OPT-IN (default ``None`` = no extra shuffle, upstream
    parallelism preserved): a blanket ``=1`` default would cap write
    parallelism at #dirs and produce unbounded per-file sizes as
    per-partition volume grows — the r07 ADVICE item. Callers size the
    bucket count from expected per-partition volume
    (≈ partition_bytes / 512 MB); small audit fixtures pass ``1``.
    """
    if files_per_partition is not None:
        if files_per_partition < 1:
            # pmod by 0 yields NULL buckets (everything one partition)
            raise ValueError(
                f"files_per_partition must be >= 1 or None, got {files_per_partition}"
            )
        bucket = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(int(files_per_partition)),
        )
        df = df.repartition(*partition_cols, bucket)
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def register_partitioned_table(
    spark: SparkSession,
    table: str,
    path: str,
    partition_cols: list[str],
    schema: T.StructType | None = None,
) -> None:
    """Register an existing partitioned parquet layout as an EXTERNAL
    catalog table, with partition metadata recovered into the catalog.

    Why this exists (r07 verdict #7): a path-based
    ``spark.read.parquet(layout)`` builds an ``InMemoryFileIndex`` that
    LISTS THE ENTIRE LAYOUT up front — partition pruning then selects
    from the already-listed files, so files-READ stays constant but
    files-LISTED grows with history length (the named growth axis in
    the r06 prune rehearsal: at 1000 executors × years of days the
    listing, not the reading, becomes the query cost). A catalog table
    stores one partition→location row per day in the metastore; the
    planner prunes PARTITIONS from catalog metadata first
    (``PruneFileSourcePartitions`` over a ``CatalogFileIndex``) and
    only then lists the surviving directories — a 3-day query lists 3
    directories whether the table holds 30 days or 30 years.

    The table is EXTERNAL (explicit ``LOCATION``): dropping it never
    deletes data, so the pre-drop here (rebuild idempotence) is
    metadata-only. ``schema=None`` infers from the layout's footers —
    a one-time registration (ETL) cost, paid when the layout is built,
    not per query. Partition columns are appended last (Spark
    canonicalizes them to the tail of the schema).

    ``ALTER TABLE ... RECOVER PARTITIONS`` walks the layout ONCE at
    registration; incremental loaders add new days with ``ALTER TABLE
    ... ADD PARTITION`` instead of re-walking.
    """
    if schema is None:
        schema = spark.read.parquet(path).schema
    pset = set(partition_cols)
    missing = pset - {f.name for f in schema.fields}
    if missing:
        raise ValueError(
            f"partition column(s) {sorted(missing)} not in layout schema "
            f"{[f.name for f in schema.fields]}"
        )
    data_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in schema.fields
        if f.name not in pset
    )
    part_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for c in partition_cols
        for f in schema.fields
        if f.name == c
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({data_ddl}, {part_ddl}) USING parquet "
        f"PARTITIONED BY ({', '.join(partition_cols)}) "
        f"LOCATION '{path}'"
    )
    spark.sql(f"ALTER TABLE {table} RECOVER PARTITIONS")


def write_sharded(
    df: DataFrame,
    path: str,
    max_records_per_file: int,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Size-bounded shard writer + manifest — the output stage of a
    corpus build (training loaders want many same-sized shards, not one
    multi-TB file or a million slivers).

    ``maxRecordsPerFile`` splits each task's output at the bound, so
    shard size is enforced regardless of partition skew; combine with
    ``df.repartition(n)`` upstream to set the floor on parallelism.
    Returns the manifest — one row per written shard with its row count,
    read GENUINELY from the written files' parquet footers: the shard
    list comes from the scan's file index (``inputFiles()``, a listing,
    no data read) and each footer's ``num_rows`` is read by pyarrow on
    the executors via ``mapInPandas`` — a few KB per file, never a
    re-scan of the rows just written. The manifest lands next to the
    shards as ``<path>_manifest`` JSON for loaders that can't list the
    filesystem.
    """
    spark = df.sparkSession
    w = df.write.mode("overwrite").option(
        "maxRecordsPerFile", str(max_records_per_file)
    )
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.parquet(path)

    # a PARTITIONED write of zero rows commits only _SUCCESS — no data
    # files — and a plain read of that directory raises
    # UNABLE_TO_INFER_SCHEMA; an empty input is a legitimate incremental
    # build outcome, not a post-write crash (r04 review), so it yields an
    # empty manifest
    written = read_parquet_if_exists(spark, path)
    files = written.inputFiles() if written is not None else []
    paths_df = spark.createDataFrame(
        [(f,) for f in files], "shard: string"
    ).repartition(max(1, min(len(files), 32)))

    def _footer_counts(batches):
        import pandas as pd

        for pdf in batches:
            counts = []
            for uri in pdf["shard"]:
                counts.append(_parquet_footer_rows(uri))
            yield pd.DataFrame({"shard": pdf["shard"], "n_rows": counts})

    manifest = paths_df.mapInPandas(_footer_counts, "shard string, n_rows long")
    manifest_path = path.rstrip("/") + "_manifest"
    manifest.coalesce(1).write.mode("overwrite").json(manifest_path)
    # hand back the WRITTEN manifest, not the lazy footer plan: the
    # caller's every action would otherwise re-open every shard footer
    # a second time (remote I/O at corpus scale — r04 review)
    return spark.read.schema("shard string, n_rows long").json(manifest_path)


def _parquet_footer_rows(uri: str) -> int:
    """num_rows from one parquet footer (metadata-only read). Resolves
    the filesystem from the URI scheme (file://, s3://, hdfs:// — any
    pyarrow.fs-supported scheme); a bare path is treated as local.

    Remote-scheme contract (r03 ADVICE): this runs on EXECUTORS inside
    mapInPandas, where pyarrow's own credential chain applies — env
    vars / instance profile for S3, a libhdfs install for HDFS — NOT
    the cluster's Hadoop configuration (no JVM gateway exists in a
    Python worker, so the Hadoop FileSystem API is unreachable here).
    Deployments whose object-store credentials live only in Hadoop
    confs must mirror them into the executor environment, or the
    footer read fails even though the shard write (Spark-native)
    succeeded. Spark's Hadoop-flavored ``s3a://``/``s3n://`` URIs are
    normalized to the ``s3://`` scheme pyarrow understands; failures
    raise with this contract spelled out rather than a bare pyarrow
    error.
    """
    import pyarrow.parquet as pq

    if "://" in uri or uri.startswith("file:/"):
        import pyarrow.fs as pafs

        pa_uri = uri
        for hadoop_scheme in ("s3a://", "s3n://"):
            if pa_uri.startswith(hadoop_scheme):
                pa_uri = "s3://" + pa_uri[len(hadoop_scheme):]
                break
        try:
            fs, p = pafs.FileSystem.from_uri(pa_uri)
            with fs.open_input_file(p) as fh:
                return pq.ParquetFile(fh).metadata.num_rows
        except (OSError, ValueError) as exc:
            raise RuntimeError(
                f"manifest footer read failed for {uri!r}: executors "
                "resolve remote URIs through pyarrow.fs, which uses "
                "pyarrow's credential chain (env/instance profile; "
                "libhdfs for hdfs://), not the cluster's Hadoop "
                "configuration — make credentials visible to pyarrow "
                "on every executor"
            ) from exc
    return pq.ParquetFile(uri).metadata.num_rows


def hadoop_fs(spark: SparkSession, path: str):
    """``(FileSystem, Path, PathClass)`` for ``path`` via the session's
    Hadoop configuration — the one py4j Hadoop-FS construction, shared by
    the streaming snapshot swap/recovery and the admission marker so an
    FS-behavior fix (scheme resolution, credentials) lands once (review
    finding: three inline copies had grown in the streaming package).
    ``PathClass`` lets callers build sibling paths (staging/old) against
    the same filesystem."""
    jvm = spark.sparkContext._jvm
    path_cls = jvm.org.apache.hadoop.fs.Path
    jpath = path_cls(path)
    fs = jpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, jpath, path_cls


def read_parquet_if_exists(spark: SparkSession, path: str) -> DataFrame | None:
    """``spark.read.parquet(path)``, or ``None`` when the path does not
    exist yet / holds no files — and ONLY then. Any other analysis
    failure (permissions, corrupt footer, transient FS error) propagates:
    the callers (dimension upsert, streaming admission) treat ``None``
    as "first run, nothing landed", and swallowing a real failure there
    silently loses or re-admits data (ADVICE r1). Shared by
    streaming/rollup.py and streaming/enrich.py so the allowed-condition
    set cannot drift between them (r04 review)."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        if (exc.getCondition() or "") not in (
            "PATH_NOT_FOUND",
            "UNABLE_TO_INFER_SCHEMA",
        ):
            raise
        return None


def read_orc(spark: SparkSession, path: str, schema) -> DataFrame:
    """ORC scan with a declared schema — same contract as :func:`read_csv`:
    never infer (inference re-reads data and can flip types between
    files). ORC is Spark-native (no extra package), columnar, and
    predicate-pushdown-capable like parquet — the interchange format when
    the surrounding warehouse is Hive/ORC rather than parquet."""
    return spark.read.schema(schema).orc(path)


def write_orc_partitioned(
    df: DataFrame, path: str, partition_cols: list[str] | None = None
) -> None:
    """ORC sink, optionally hive-partitioned (same pruning rationale as
    :func:`write_parquet_partitioned`)."""
    w = df.write.mode("overwrite")
    if partition_cols:
        w = w.partitionBy(*partition_cols)
    w.orc(path)


def write_json(df: DataFrame, path: str) -> None:
    """S5 — JSON sink, overwrite mode (never append: the reference's
    append-mode bug concatenated documents into an unparseable file)."""
    df.write.mode("overwrite").json(path)


def read_json_strict(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """JSON scan that REJECTS concatenated-document corruption loudly.

    Guards against exactly the corruption the reference shipped
    (output/nearby_stations.json: 3 appended documents). Spark's
    Jackson-based JSON source — even in FAILFAST mode — parses the first
    object on a line and silently DROPS trailing documents, so a plain
    schema'd read cannot detect this. Validation runs as an Arrow-batched
    pandas UDF using Python's strict decoder (raises on trailing data);
    it touches each line once and only on this explicitly-strict path.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def _is_single_doc(lines):  # type: ignore[no-untyped-def]
        import json

        dec = json.JSONDecoder()

        def ok(s: str) -> bool:
            s = s.strip()
            if not s:
                return True
            try:
                _, end = dec.raw_decode(s)
            except ValueError:
                return False
            return s[end:].strip() == ""

        return lines.map(ok)

    text = spark.read.text(path)
    bad = text.filter(~_is_single_doc(F.col("value"))).limit(1).collect()
    if bad:
        raise ValueError(
            f"rejected JSON in {path}: a line is not exactly one complete "
            f"document (first offender: {bad[0]['value'][:120]!r}). Two "
            "causes look identical here: (a) append-mode corruption — "
            "concatenated documents on one line; regenerate with an "
            "overwrite-mode writer — or (b) a PRETTY-PRINTED (multi-line) "
            "file: this strict path validates JSONL only; re-serialize "
            "one document per line (r04 review: the old message "
            "misdiagnosed (b) as corruption)."
        )
    reader = spark.read.option("mode", "FAILFAST")
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)
