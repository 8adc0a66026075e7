"""Table-format-agnostic source for the pages/corpus tables.

The north rule's production input is an Iceberg table of
Common-Crawl-style pages.  This sandbox ships no Iceberg runtime, so
the reader is capability-gated: if the session has an Iceberg catalog
(``spark.sql.catalog.*`` config + the runtime jar), identifiers are
read via ``spark.read.table`` / ``format("iceberg")`` — which gives
snapshot isolation, hidden-partition pruning, and metadata-level
split planning for free; otherwise a parquet directory path is read
directly.  Either way the downstream engine sees the same DataFrame
of (url, warc_ts, html, text, lang) and every plan property
(column pruning, pushdown, narrow transform) is format-independent.

``time_travel`` maps to Iceberg's ``VERSION AS OF`` — exposed so a
resumed 100 TB run can pin the exact snapshot its checkpoint
manifests were computed against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg catalog is configured and loadable.

    Catalogs are SESSION-level SQL confs: a catalog registered at
    runtime (``spark.conf.set``) or on a builder reusing an existing
    SparkContext never appears in ``sparkContext.getConf()``, so the
    check consults the session's SET output (round-5 review)."""
    try:
        keys = [r["key"] for r in spark.sql("SET").collect()]
        keys += [k for k, _ in spark.sparkContext.getConf().getAll()]
    except Exception:
        return False
    if not any(k.startswith("spark.sql.catalog.") for k in keys):
        return False
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, source: str,
               snapshot_version: int | None = None) -> DataFrame:
    """Read a corpus table from an Iceberg identifier (when the
    runtime is present) or a parquet path (sandbox fallback).

    ``source`` containing a path separator or ending in ``.parquet``
    is treated as a parquet location; otherwise as a catalog
    identifier, which requires Iceberg.
    """
    is_path = "/" in source or source.endswith(".parquet")
    if not is_path:
        if not iceberg_available(spark):
            raise RuntimeError(
                f"catalog identifier {source!r} requires an Iceberg runtime "
                "(spark.sql.catalog.* + iceberg-spark-runtime jar); "
                "pass a parquet path in environments without one")
        reader = spark.read
        if snapshot_version is not None:
            reader = reader.option("snapshot-id", snapshot_version)
        return reader.format("iceberg").load(source)
    if snapshot_version is not None:
        raise ValueError("time travel requires an Iceberg catalog table")
    return spark.read.parquet(source)
