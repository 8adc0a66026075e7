#!/usr/bin/env python
"""Decompose q4 (fused transform+tile+PIP -> mask join) stage times at
a given core count, to attribute scaling loss (BENCH/BASELINE.md).

Usage: taskset -c 0-1 python scripts/probe_q4_scaling.py 1 10
       taskset -c 0-7 python scripts/probe_q4_scaling.py 4 10
"""
import json
import os
import sys
import time

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

cpus = int(sys.argv[1])
mult = int(sys.argv[2]) if len(sys.argv) > 2 else 10

import bench
import __spark_entry__ as entry_mod
from pyspark.sql import functions as F
from jgdtrans_rs_spark.plans import oracle
from jgdtrans_rs_spark.engine import Engine

spark = bench.make_spark(cpus)
sf_dir = bench.SF_DIR
eng = entry_mod._engine(spark)
spark.read.parquet(f"{sf_dir}/lineitem.parquet").createOrReplaceTempView("lineitem")
src = "(SELECT l_orderkey * 8 + l_linenumber AS o_orderkey FROM lineitem)"
if mult > 1:
    src = (f"(SELECT b.o_orderkey * {mult} + r.id AS o_orderkey "
           f"FROM {src} b CROSS JOIN (SELECT id FROM range({mult})) r)")
pts = spark.sql(oracle.points_sql(src)).repartition(cpus * 3).persist()
n = pts.count()


def timed(name, df, reps=2):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


out = {"cpus": cpus, "mult": mult, "rows": n}
fused = eng.transform_tile_pip(pts, entry_mod.POLYGONS, "lat", "lon", "alt",
                               fields=["status", "poly_mask"])
narrow = fused.filter(F.col("status") == 0).select("pkey", "poly_mask")
out["udf_only"] = timed("udf_only", narrow)
# isolate the JVM join: persist the narrow UDF output first
cached = narrow.persist()
cached.count()
out["join_only"] = timed("join_only",
                         Engine.poly_mask_rows(cached, entry_mod.POLYGONS)
                         .select("pkey", "poly_idx"))
cached.unpersist()
out["full_chain"] = timed("full",
                          Engine.poly_mask_rows(narrow, entry_mod.POLYGONS)
                          .select("pkey", "poly_idx"))
# q8 reference point for the same session
out["q8_roundtrip"] = timed(
    "q8", eng.roundtrip_verify(pts, "lat", "lon", "alt").select(
        "pkey", "roundtrip_exact", "status"))
print(json.dumps(out))
spark.stop()
