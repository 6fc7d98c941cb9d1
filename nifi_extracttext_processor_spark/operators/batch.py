"""B13 MergeContent + B14 PutFile: batching and file sinks.

Reference: Bin-Packing merge, 5–15000 records/bin, Avro output
(56409-tika.xml:1325-1348), then PutFile with Conflict Resolution=ignore
(:1127-1175). In Spark, "bins" are output files: we size them by target
records-per-file, which both bounds file counts at 100 TB (the
small-files problem) and keeps bin semantics (row preservation, bounded
entries per file).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame


def bin_pack(
    df: DataFrame,
    min_entries: int = 5,
    max_entries: int = 15_000,
    approx_rows: int | None = None,
) -> DataFrame:
    """Repartition so each output file holds ≤ max_entries rows.

    Uses a cheap count (or caller-provided approx_rows) — at scale
    prefer `maxRecordsPerFile`, applied by write_files below, which
    needs no count at all; this explicit variant exists for parity
    with MergeContent's bin-count behavior.
    """
    n = approx_rows if approx_rows is not None else df.count()
    bins = max(1, math.ceil(n / max_entries))
    # repartition unconditionally: coalesce can't widen, and probing
    # df.rdd.getNumPartitions() forces an RDD conversion per call
    return df.repartition(bins)


def write_files(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "ignore",
    max_records_per_file: int = 15_000,
    partition_by: list[str] | None = None,
) -> None:
    """B14 PutFile. mode='ignore' mirrors Conflict Resolution=ignore.

    `maxRecordsPerFile` enforces MergeContent's max-entries bound
    without a driver-side count — the scalable path. Avro needs the
    spark-avro package; parquet is the default here (columnar, splittable
    — the right call at 100 TB) with fmt='avro' available when the
    runtime ships the connector.
    """
    if fmt == "avro":
        from ..sinks.connectors import avro_available

        if not avro_available(df.sparkSession):
            raise RuntimeError(
                "Avro format unavailable: spark-avro is not on the "
                "classpath. Launch with SPARK_GRAFT_PACKAGES="
                "org.apache.spark:spark-avro_2.13:<spark-version> "
                "(or use the parquet default)")
    writer = (df.write.mode(mode)
              .option("maxRecordsPerFile", max_records_per_file))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def write_avro_portable(
    df: DataFrame,
    path: str,
    record_name: str = "PDF",
    max_records_per_file: int = 15_000,
) -> dict:
    """B13's `Merge Format=Avro` WITHOUT the spark-avro jar: each
    partition serializes its rows to a spec-compliant Avro object
    container file (formats.avro_codec, null codec) and writes
    `part-<pid>.avro` — executor-side I/O, no driver collect, one file
    per partition (MergeContent bin ≈ partition). Readable by any Avro
    implementation, including spark-avro where it exists.

    Python-side serialization is the slow path next to the jar-backed
    writer — use it for parity/portability, and write_files(fmt='avro')
    wherever SPARK_GRAFT_PACKAGES supplies the connector. Returns the
    Avro schema used.
    """
    import os

    from ..formats.avro_codec import avro_schema_of, write_container

    schema = avro_schema_of(df, record_name)
    cols = [f.name for f in df.schema.fields]
    os.makedirs(path, exist_ok=True)

    def _write(rows_iter):
        from pyspark import TaskContext
        pid = TaskContext.get().partitionId()
        rows = [dict(zip(cols, r)) for r in rows_iter]
        if not rows:
            return
        data = write_container(schema, rows,
                               records_per_block=max_records_per_file)
        with open(os.path.join(path, f"part-{pid:05d}.avro"), "wb") as f:
            f.write(data)

    df.foreachPartition(_write)
    return schema


def read_avro_portable(spark, path: str) -> DataFrame:
    """Read back files written by write_avro_portable (driver-light:
    binaryFile scan + per-file container parse in executors)."""
    from ..formats.avro_codec import read_container

    files = spark.read.format("binaryFile").load(f"{path}/*.avro")

    # schema discovered from the first file (driver reads 1 header)
    first = files.select("content").first()
    if first is None:
        raise FileNotFoundError(
            f"no .avro files found under {path!r} — nothing to read "
            "(was write_avro_portable pointed elsewhere, or the write "
            "empty?)")
    schema, _ = read_container(bytes(first["content"]))
    col_names = [f["name"] for f in schema["fields"]]

    def _parse(iterator):
        import pandas as pd
        for pdf in iterator:
            out = []
            for content in pdf["content"]:
                _, rows = read_container(bytes(content))
                out.extend(rows)
            # empty parses still need the output columns, or Arrow
            # conversion fails against the declared non-empty schema
            yield pd.DataFrame(out, columns=col_names)
    _AVRO_TO_SPARK = {"long": "long", "int": "int", "double": "double",
                      "float": "float", "string": "string",
                      "boolean": "boolean", "bytes": "binary"}

    def _ftype(t):
        if isinstance(t, list):  # nullable union
            t = next(b for b in t if b != "null")
        return _AVRO_TO_SPARK[t if isinstance(t, str) else t["type"]]

    ddl = ", ".join(f"`{f['name']}` {_ftype(f['type'])}"
                    for f in schema["fields"])
    return files.select("content").mapInPandas(_parse, schema=ddl)
