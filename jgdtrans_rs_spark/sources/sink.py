"""Checkpointed partitioned sink with per-bucket lineage + resume.

North-rule requirement: a killed job resumes without recomputing
completed mesh buckets.  Batch Spark has no built-in checkpoint at this
granularity, so the sink materializes one partition directory per
bucket-group plus a manifest row per completed group:

    out/
      data/bucket_group=NN/*.parquet
      _manifest/part-*.json      (bucket_group, n_rows, n_ok, wall_ts)

``resume_pending`` anti-joins the manifest against the full group set,
and ``run_checkpointed`` processes only pending groups — idempotent
re-runs, deterministic output regardless of parallelism.

Lineage/metrics: each manifest row carries the transform-count metrics
of its group (rows in, rows ok, per-status counts) — the relational
twin of the reference's error taxonomy (trans.rs:946-999).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"


def bucket_group_col(mesh_col: str = "meshcode", n_groups: int = 64):
    """Stable bucket-group id from the tile column (mod-partitioning of
    meshcodes; -1 tiles / errors land in group 0..n-1 too, nothing is
    dropped)."""
    return F.pmod(F.col(mesh_col), F.lit(n_groups)).cast("int")


def completed_groups(out_dir: str) -> set[int]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    done: set[int] = set()
    if not os.path.isdir(mdir):
        return done
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(mdir, name), encoding="utf-8") as f:
            for line in f:
                if line.strip():
                    done.add(int(json.loads(line)["bucket_group"]))
    return done


def write_group(df_group: DataFrame, out_dir: str, group: int,
                status_col: str = "status") -> dict:
    """Write one bucket-group partition + its manifest row (atomically:
    data first, manifest last)."""
    path = os.path.join(out_dir, DATA_DIR, f"bucket_group={group}")
    rows = df_group.count()
    has_status = status_col in df_group.columns
    by_status = {
        int(r[status_col]): int(r["count"])
        for r in df_group.groupBy(status_col).count().collect()
    } if has_status else {}
    df_group.write.mode("overwrite").parquet(path)
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    os.makedirs(mdir, exist_ok=True)
    manifest = {
        "bucket_group": group,
        "n_rows": rows,
        "n_ok": by_status.get(0, 0) if has_status else rows,
        "status_counts": by_status,
        "wall_ts": time.time(),
    }
    tmp = os.path.join(mdir, f".part-{group}.json.tmp")
    with open(tmp, "w", encoding="utf-8") as f:
        f.write(json.dumps(manifest) + "\n")
    os.replace(tmp, os.path.join(mdir, f"part-{group}.json"))
    return manifest


def run_checkpointed(df: DataFrame, out_dir: str, mesh_col: str = "meshcode",
                     n_groups: int = 16, status_col: str = "status") -> list[dict]:
    """Process + persist per bucket-group, skipping completed groups.

    ``df`` is the transformed DataFrame (already carrying tile + status
    columns).  Returns the manifests written this run.
    """
    staged = df.withColumn("bucket_group", bucket_group_col(mesh_col, n_groups))
    done = completed_groups(out_dir)
    pending = [g for g in range(n_groups) if g not in done]
    written = []
    for g in pending:
        part = staged.filter(F.col("bucket_group") == g).drop("bucket_group")
        written.append(write_group(part, out_dir, g, status_col))
    return written


def read_resumed(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read back everything persisted so far."""
    return spark.read.parquet(os.path.join(out_dir, DATA_DIR))
