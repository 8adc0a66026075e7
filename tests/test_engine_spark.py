"""Spark-layer end-to-end tests: entry pipeline, extraction invariant,
DataFrame kernels vs numpy, spatial operators, checkpoint/resume,
streaming smoke."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from jgdtrans_rs_spark import kernel
from jgdtrans_rs_spark.engine import Engine
from jgdtrans_rs_spark.operators import spatial
from jgdtrans_rs_spark.plans import oracle
from jgdtrans_rs_spark.sources import pages as pages_src
from jgdtrans_rs_spark.sources import sink
from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def engine(spark, semidyna_grid):
    return Engine(spark, semidyna_grid)


@pytest.fixture(scope="module")
def points(spark):
    spark.read.parquet(f"{SF_TINY}/orders.parquet").createOrReplaceTempView("orders")
    return spark.sql(oracle.points_sql("orders")).cache()


def test_entry_runs(spark):
    import __spark_entry__ as entry_mod

    df = entry_mod.entry(spark)
    rows = df.limit(10).collect()
    assert len(rows) > 0
    assert set(df.columns) >= {"url", "out_lat", "out_lon", "status", "meshcode", "quadkey"}


def test_engine_cache_evicts_only_stopped_sessions(spark):
    """The contract's engine cache must keep entries of OTHER
    still-live sessions (clearing the whole dict made alternating
    calls across two live sessions re-broadcast the grid every call —
    ADVICE r02) while dropping entries whose context stopped."""
    from types import SimpleNamespace

    import __spark_entry__ as entry_mod

    live = entry_mod._engine(spark)
    key = spark.sparkContext.applicationId
    dead = SimpleNamespace(
        spark=SimpleNamespace(sparkContext=SimpleNamespace(_jsc=None)))
    other_live = SimpleNamespace(spark=spark)  # another live session's engine
    entry_mod._ENGINES["dead-app"] = dead
    entry_mod._ENGINES["other-live-app"] = other_live
    del entry_mod._ENGINES[key]  # force the rebuild path (which evicts)
    try:
        rebuilt = entry_mod._engine(spark)
        assert "dead-app" not in entry_mod._ENGINES
        assert entry_mod._ENGINES.get("other-live-app") is other_live
        assert rebuilt is not live  # rebuilt for this session
        assert entry_mod._engine(spark) is rebuilt  # and now cached
    finally:
        entry_mod._ENGINES.pop("other-live-app", None)


def test_pages_text_invariant(spark):
    """Byte-identical extracted text per url (BASELINE input_hint)."""
    pages = pages_src.synth_pages(spark, SF_TINY)
    ex = pages_src.extract_geotags(pages)
    j = pages.select("url", "text", "true_lat", "true_lon").join(
        ex.select("url", F.col("text").alias("text_ex"), "lat", "lon"), "url")
    bad_text = j.filter(F.col("text") != F.col("text_ex")).count()
    assert bad_text == 0
    # geotag round-trips through the %.17g embedding bit-exactly
    bad_geo = j.filter(
        (F.col("true_lat") != F.col("lat")) | (F.col("true_lon") != F.col("lon"))
    ).count()
    assert bad_geo == 0


def test_forward_df_matches_numpy(engine, points, semidyna_grid):
    pdf = points.toPandas().sort_values("pkey")
    la = pdf["lat"].to_numpy()
    lo = pdf["lon"].to_numpy()
    al = pdf["alt"].to_numpy()
    exp_lat, exp_lon, exp_alt, exp_c = kernel.forward(la, lo, al, semidyna_grid)

    out = engine.forward(points, "lat", "lon", "alt").toPandas().sort_values("pkey")
    ok = exp_c.status == 0
    got_lat = out["out_lat"].to_numpy()
    assert (got_lat[ok] == exp_lat[ok]).all()
    assert (out["status"].to_numpy() == exp_c.status).all()
    assert (out["err_corner"].to_numpy() == exp_c.err_corner).all()


def test_validate_split(engine, points):
    valid, quarantine = engine.validate(points, "lat", "lon")
    assert valid.count() + quarantine.count() == points.count()
    assert quarantine.count() == 0  # generated points are in [-90, 90]
    wild = points.withColumn("lat", F.col("lat") + 200.0)
    v2, q2 = engine.validate(wild, "lat", "lon")
    assert v2.count() == 0


def test_validate_null_coordinates_quarantined(engine, spark):
    """A failed geotag extraction yields NULL coordinates; those rows
    must land in quarantine — a NULL predicate would drop them from
    BOTH filter halves (silent data loss)."""
    df = spark.createDataFrame(
        [(1, 36.1, 140.1), (2, None, 140.1), (3, 36.1, None), (4, None, None)],
        "pkey long, lat double, lon double")
    valid, quarantine = engine.validate(df, "lat", "lon")
    assert valid.count() == 1
    assert quarantine.count() == 3  # nothing vanishes
    assert {r["pkey"] for r in quarantine.collect()} == {2, 3, 4}


def test_salted_join_equals_broadcast(engine, points):
    polys = [
        ("p0", [(36.0833, 140.0625), (36.0833, 140.125), (36.125, 140.125), (36.125, 140.0625)]),
        ("p1", [(24.76, 141.29), (24.76, 141.34), (24.80, 141.34), (24.80, 141.29)]),
    ]
    a = spatial.point_in_polygon(points, polys).toPandas()
    tiled = engine.assign_tiles(points)
    b = spatial.bucketed_spatial_join(tiled, polys, 5, hot_threshold=10, num_salts=4).toPandas()
    sa = set(map(tuple, a[["pkey", "poly_id"]].itertuples(index=False)))
    sb = set(map(tuple, b[["pkey", "poly_id"]].itertuples(index=False)))
    assert sa == sb and len(sa) > 0


def test_knn_spark_matches_numpy_kernel(points):
    """The Spark operator (pandas_udf + posexplode) emits exactly the
    numpy kernel's ordered lists — which test_properties pins to the
    all-nodes brute force."""
    import numpy as np

    src = points.limit(200).toPandas().sort_values("pkey")
    out = spatial.knn_mesh_nodes(points.limit(200), 5, 3).toPandas()
    want = spatial.knn_codes_np(
        src["lat"].to_numpy(np.float64), src["lon"].to_numpy(np.float64), 5, 3)
    expect = {
        (int(pk), r + 1): int(code)
        for pk, codes in zip(src["pkey"], want)
        for r, code in enumerate(codes)
    }
    got = {
        (int(row.pkey), int(row.rank)): int(row.node_code)
        for row in out.itertuples(index=False)
    }
    assert got == expect and len(got) > 0


def test_checkpoint_resume(engine, points, tmp_path):
    out_dir = str(tmp_path / "ckpt")
    df = engine.assign_tiles(engine.forward(points, "lat", "lon", "alt"), "lat", "lon")
    m1 = sink.run_checkpointed(df, out_dir, n_groups=4)
    assert len(m1) == 4
    assert sum(m["n_rows"] for m in m1) == points.count()
    # simulate a killed job: drop one manifest, rerun -> only 1 group redone
    os.remove(os.path.join(out_dir, sink.MANIFEST_DIR, "part-2.json"))
    m2 = sink.run_checkpointed(df, out_dir, n_groups=4)
    assert [m["bucket_group"] for m in m2] == [2]
    # fully resumed: nothing pending
    m3 = sink.run_checkpointed(df, out_dir, n_groups=4)
    assert m3 == []
    total = sink.read_resumed(engine.spark, out_dir).count()
    assert total == points.count()


def test_checkpoint_resume_hadoop_fs_uri(engine, points, tmp_path):
    """The manifest layer must work against a Hadoop FileSystem URI
    (here ``file:``) — on the 100 TB target out_dir is object storage
    (s3a://...), where driver-local os.listdir/open silently diverged
    from the data location (VERDICT r02).  Exercises completed_groups
    + _write_manifest end-to-end through the Hadoop FS API, including
    the killed-job resume path."""
    out_dir = f"file://{tmp_path}/ckpt_uri"
    df = engine.assign_tiles(engine.forward(points, "lat", "lon", "alt"), "lat", "lon")
    m1 = sink.run_checkpointed(df, out_dir, n_groups=4)
    assert len(m1) == 4
    assert sink.completed_groups(out_dir, engine.spark) == {0, 1, 2, 3}
    # simulate a killed job through the FS API itself (no POSIX escape
    # hatch): drop one manifest, rerun -> only that group is redone
    jvm, fs, mdir = sink._hadoop(engine.spark, f"{out_dir}/{sink.MANIFEST_DIR}")
    assert fs.delete(jvm.org.apache.hadoop.fs.Path(mdir, "part-1.json"), False)
    assert sink.completed_groups(out_dir, engine.spark) == {0, 2, 3}
    m2 = sink.run_checkpointed(df, out_dir, n_groups=4)
    assert [m["bucket_group"] for m in m2] == [1]
    assert sink.run_checkpointed(df, out_dir, n_groups=4) == []
    assert sink.read_resumed(engine.spark, out_dir).count() == points.count()


def test_checkpoint_resume_after_partial_failure(engine, points, tmp_path):
    """Fault injection (VERDICT r04 #1): a job killed MID-WRITE leaves
    a bucket-group data directory in an arbitrary broken state — some
    task files missing, a stray half-written extra file — and no
    committed manifest.  Resume must (a) recompute exactly the
    manifest-less groups, (b) fully REPLACE the broken partition
    directory (dynamic partition overwrite — leftover garbage must not
    survive into the read path), and (c) produce output identical to a
    clean single-pass run."""
    df = engine.assign_tiles(
        engine.forward(points, "lat", "lon", "alt"), "lat", "lon")

    # ground truth: one clean uninterrupted run
    clean_dir = str(tmp_path / "clean")
    sink.run_checkpointed(df, clean_dir, n_groups=4)
    expect = sorted(
        (r.pkey, r.meshcode, r.status)
        for r in sink.read_resumed(engine.spark, clean_dir)
        .select("pkey", "meshcode", "status").collect()
    )

    # the run we will injure
    out_dir = str(tmp_path / "chaos")
    m1 = sink.run_checkpointed(df, out_dir, n_groups=4)
    assert len(m1) == 4

    # kill scenario, via POSIX on the partition dir the way a real
    # mid-job SIGKILL would leave it.  Injure the largest non-empty
    # group (the fixture's meshcodes need not hit every residue class).
    g = max(m1, key=lambda m: m["n_rows"])["bucket_group"]
    assert max(m["n_rows"] for m in m1) > 0
    gdir = os.path.join(out_dir, sink.DATA_DIR, f"bucket_group={g}")
    parts = sorted(f for f in os.listdir(gdir) if f.endswith(".parquet"))
    assert parts, f"fixture must produce at least one file in group {g}"
    # (1) a stray half-written task attempt survives (valid parquet
    # bytes under an uncommitted name — the worst case: readable
    # garbage that would DOUBLE rows if merged instead of replaced)
    stray = os.path.join(gdir, "part-99999-stray-attempt.c000.snappy.parquet")
    with open(os.path.join(gdir, parts[-1]), "rb") as fsrc, open(stray, "wb") as fdst:
        fdst.write(fsrc.read())
    # (2) half the committed files vanish (all of them if only one)
    for f in parts[: max(1, len(parts) // 2)]:
        os.remove(os.path.join(gdir, f))
    # (3) the group's manifest was never committed
    os.remove(os.path.join(out_dir, sink.MANIFEST_DIR, f"part-{g}.json"))

    # resume: exactly the injured group recomputes
    m2 = sink.run_checkpointed(df, out_dir, n_groups=4)
    assert [m["bucket_group"] for m in m2] == [g]
    assert not os.path.exists(stray), "partition dir must be replaced, not merged"
    # third run: nothing pending
    assert sink.run_checkpointed(df, out_dir, n_groups=4) == []

    got = sorted(
        (r.pkey, r.meshcode, r.status)
        for r in sink.read_resumed(engine.spark, out_dir)
        .select("pkey", "meshcode", "status").collect()
    )
    assert got == expect
    # the recomputed manifest matches the clean run's for that group
    clean_m2 = [m for m in sink.run_checkpointed(df, str(tmp_path / "c2"), n_groups=4)
                if m["bucket_group"] == g][0]
    assert m2[0]["n_rows"] == clean_m2["n_rows"]
    assert m2[0]["status_counts"] == clean_m2["status_counts"]


def test_checkpoint_sink_single_pass(spark, points, tmp_path):
    """The sink must consume its input exactly once (the partitioned
    write), not once per bucket group: an accumulator inside a
    pass-through pandas_udf counts how many input rows flow through
    the upstream stage."""
    import pandas as pd
    from pyspark.sql import functions as F

    n = points.count()
    acc = spark.sparkContext.accumulator(0)

    @F.pandas_udf("double")
    def counted(x: pd.Series) -> pd.Series:
        acc.add(len(x))
        return x

    df = points.withColumn("lat", counted(F.col("lat"))).withColumn(
        "meshcode", (F.col("pkey") % 7).cast("long"))
    sink.run_checkpointed(df, str(tmp_path / "once"), n_groups=7)
    assert acc.value == n, f"input scanned {acc.value / n:.1f}x"


def test_streaming_events_window(spark, tmp_path):
    """Structured Streaming twin of events_window: one availableNow
    micro-batch over the events parquet, checked against the batch agg."""
    from jgdtrans_rs_spark.streaming.ingest import stream_events_window

    import shutil

    stream_dir = str(tmp_path / "events_stream")
    os.makedirs(stream_dir, exist_ok=True)
    shutil.copy(f"{SF_TINY}/events.parquet", os.path.join(stream_dir, "part-0.parquet"))
    batch_src = spark.read.parquet(f"{SF_TINY}/events.parquet")
    stream = stream_events_window(spark, stream_dir, batch_src.schema)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory").queryName("ev_win")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT event_type, sum(n_events) AS n FROM ev_win GROUP BY event_type")
    exp = batch_src.groupBy("event_type").count()
    g = {r["event_type"]: r["n"] for r in got.collect()}
    e = {r["event_type"]: r["count"] for r in exp.collect()}
    assert g == e


def test_explain_no_shuffle_in_transform(engine, points):
    """The transform chain must be one narrow stage: no Exchange in the
    physical plan."""
    df = engine.assign_tiles(engine.forward(points, "lat", "lon", "alt"), "lat", "lon")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan


def test_dms_column_parser_matches_scalar(spark):
    """functions.columns.dms_to_degree (pure Column, zero Python) must
    equal dms.dms_to_degree_scalar on every grammar case, including
    FromStr's permissive out-of-range minutes/seconds and the NaN
    error paths."""
    import math

    from pyspark.sql import functions as F

    from jgdtrans_rs_spark import dms
    from jgdtrans_rs_spark.functions import columns as C

    corpus = [
        "360613.58925", "-360613.58925", "1400516.27815", "1.2", "1", "+1.",
        "-.2", ".5", "36_06_13.5", "1_2_.5_", "9099", "366113.0", "1810000",
        "2550000", "2560000", "1800001", "0", "-0", "000360613.5", "",
        "_1", "1._5", "abc", "1.2.3", "+", "-", ".", "99999999999999999999999",
        "180", "0.000001", None,
    ]
    df = spark.createDataFrame([(s,) for s in corpus], "s string")
    got = {r["s"]: r["v"] for r in df.select("s", C.dms_to_degree(F.col("s")).alias("v")).collect()}
    plan = df.select(C.dms_to_degree(F.col("s")).alias("v"))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Python" not in plan  # stays in codegen
    for s in corpus:
        want = dms.dms_to_degree_scalar(s) if s is not None else None
        have = got[s]
        if want is None:
            assert have is None, s
        elif math.isnan(want):
            assert have is not None and math.isnan(have), (s, have)
        else:
            assert have == want, (s, have, want)  # bit-exact


def test_streaming_stateful_cell_lineage(spark, tmp_path):
    """applyInPandasWithState keeps per-meshcode running counters
    across micro-batches: two files forced into separate batches via
    maxFilesPerTrigger=1; the second emission for a shared cell must
    carry the accumulated total, and final totals must equal the batch
    aggregation."""
    import pandas as pd

    from jgdtrans_rs_spark.streaming.stateful import stream_cell_lineage

    d = str(tmp_path / "tstream")
    os.makedirs(d)
    rows1 = pd.DataFrame({"meshcode": [54401005] * 3 + [54401100] * 2,
                          "status": [0, 0, 1, 0, 0]})
    rows2 = pd.DataFrame({"meshcode": [54401005] * 4, "status": [0, 2, 0, 0]})
    schema = "meshcode long, status int"
    spark.createDataFrame(rows1, schema).coalesce(1).write.parquet(d + "/f1")
    spark.createDataFrame(rows2, schema).coalesce(1).write.parquet(d + "/f2")
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d + "/f*")
    )
    q = (
        stream_cell_lineage(src)
        .writeStream.format("memory").queryName("cell_lineage")
        .outputMode("update").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM cell_lineage").toPandas()
    assert out["batch_rows"].max() < 7  # really ran as multiple batches
    # last emission per cell = running totals = batch aggregation
    last = out.groupby("meshcode").last()
    assert int(last.loc[54401005, "n_rows"]) == 7
    assert int(last.loc[54401005, "n_ok"]) == 5
    assert int(last.loc[54401100, "n_rows"]) == 2
    # the shared cell emitted twice, second time with accumulated state
    emissions = out[out["meshcode"] == 54401005]
    assert len(emissions) == 2
    assert emissions["n_rows"].max() > emissions["batch_rows"].max()


def test_streaming_dedup_exact(spark, tmp_path):
    """Dedup-on-arrival drops repeated content across micro-batches
    (two files, forced into separate batches)."""
    import datetime

    from jgdtrans_rs_spark.streaming.ingest import stream_dedup_exact

    d = str(tmp_path / "dstream")
    os.makedirs(d)
    schema = "url string, warc_ts timestamp, text string"
    t0 = datetime.datetime(2023, 1, 1)
    f1 = [("u1", t0, "alpha beta"), ("u2", t0, "gamma delta"), ("u3", t0, "alpha beta")]
    f2 = [("u4", t0, "alpha beta"), ("u5", t0, "epsilon zeta")]
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(d + "/f1")
    spark.createDataFrame(f2, schema).coalesce(1).write.parquet(d + "/f2")
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(d + "/f*")
    )
    q = (
        stream_dedup_exact(src)
        .writeStream.format("memory").queryName("dedup_stream")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT text FROM dedup_stream").toPandas()
    texts = sorted(out["text"])
    assert texts == ["alpha beta", "epsilon zeta", "gamma delta"]


def test_streaming_watermark_finalizes_windows(spark, tmp_path):
    """Watermark semantics that Spark actually guarantees: in append
    mode, exactly the windows whose END the watermark has passed are
    finalized/emitted; younger windows stay in state.  (Dropping of
    late input rows is explicitly best-effort in Spark — verified on
    this build: a 05:00 event arriving after the watermark reached
    09:30 is still accepted — so this test pins finalization, not
    dropping.)"""
    import datetime

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    d = str(tmp_path / "late")
    os.makedirs(d)

    def write_file(name, rows, mtime):
        pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                          "event_type", "value", "props"])
        pq.write_table(pa.Table.from_pandas(pdf), f"{d}/{name}",
                       coerce_timestamps="us", allow_truncated_timestamps=True)
        os.utime(f"{d}/{name}", (mtime, mtime))

    def ev(i, hour, minute=0):
        return (i, datetime.datetime(2023, 1, 1, hour, minute), 1, "click", 1.0, "{}")

    # deterministic single files with spaced mtimes -> f1 before f2
    write_file("f1.parquet", [ev(1, 5), ev(2, 10), ev(3, 11, 30)], 1_600_000_000)
    write_file("f2.parquet", [ev(4, 12)], 1_600_000_100)
    src_schema = spark.read.parquet(d + "/f1.parquet").schema
    src = (
        spark.readStream.schema(src_schema)
        .option("maxFilesPerTrigger", 1).parquet(d + "/f*.parquet")
    )
    stream = (
        src.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n_events"))
    )
    q = (
        stream.writeStream.format("memory").queryName("late_win")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    # final watermark = 12:00 - 2h = 10:00; finalized windows are
    # exactly those ending at or before 10:00 -> only 05:00-06:00
    final_wm = max(p["eventTime"].get("watermark", "")
                   for p in q.recentProgress if p.get("eventTime"))
    assert final_wm.startswith("2023-01-01T10:00")
    out = spark.sql("SELECT window.start AS ws FROM late_win").toPandas()
    hours = sorted(int(ts.hour) for ts in out["ws"])
    assert hours == [5], hours  # 10/11/12 windows not yet finalized


def test_transform_tile_pip_fields_pruning(engine, points):
    """fields= must (a) reject unknown names, (b) enforce the 63-bit
    mask bound, (c) produce values identical to the full output on the
    kept columns."""
    import __spark_entry__ as entry_mod

    polys = entry_mod.POLYGONS
    with pytest.raises(ValueError, match="unknown output fields"):
        engine.transform_tile_pip(points, polys, fields=["nope"])
    many = [(f"p{i}", polys[0][1]) for i in range(64)]
    with pytest.raises(ValueError, match="63-bit"):
        engine.transform_tile_pip(points, many)

    pts = points.limit(500)
    full = engine.transform_tile_pip(pts, polys, "lat", "lon", "alt")
    pruned = engine.transform_tile_pip(pts, polys, "lat", "lon", "alt",
                                       fields=["status", "poly_mask"])
    assert set(pruned.columns) == set(pts.columns) | {"status", "poly_mask"}
    a = {r.pkey: (r.status, r.poly_mask)
         for r in full.select("pkey", "status", "poly_mask").collect()}
    b = {r.pkey: (r.status, r.poly_mask)
         for r in pruned.select("pkey", "status", "poly_mask").collect()}
    assert a == b and len(a) == 500


def test_poly_mask_rows_matches_explode_semantics(engine, points, spark):
    """poly_mask_rows == explode_outer over the decoded index list:
    multi-hit rows fan out, zero-hit rows keep one NULL row."""
    import __spark_entry__ as entry_mod

    polys = entry_mod.POLYGONS
    fused = engine.transform_tile_pip(
        points.limit(2000), polys, fields=["status", "poly_mask"])
    via_join = Engine.poly_mask_rows(fused, polys)
    got = {(r.pkey, r.poly_idx) for r in via_join.select("pkey", "poly_idx").collect()}
    # reference expansion driver-side from the mask bits
    exp = set()
    for r in fused.select("pkey", "poly_mask").collect():
        idxs = [i for i in range(len(polys)) if (r.poly_mask >> i) & 1]
        if idxs:
            exp.update((r.pkey, i) for i in idxs)
        else:
            exp.add((r.pkey, None))
    assert got == exp and any(i is not None for _, i in got)


def test_checkpoint_sink_tile_sorted_layout(engine, points, tmp_path):
    """sort_within=True must leave every output file meshcode-ordered
    (the property parquet row-group pruning relies on) without
    changing WHAT is written."""
    import glob

    import pyarrow.parquet as pq

    from jgdtrans_rs_spark.sources import sink as sink_mod

    tiled = engine.transform_and_tile(points, "lat", "lon", "alt")
    out = str(tmp_path / "sorted_out")
    manifests = sink_mod.run_checkpointed(tiled, out, n_groups=4,
                                          sort_within=True)
    assert sum(m["n_rows"] for m in manifests) == points.count()

    files = glob.glob(f"{out}/data/bucket_group=*/*.parquet")
    assert files
    for f in files:
        codes = pq.read_table(f, columns=["meshcode"])["meshcode"].to_pylist()
        assert codes == sorted(codes), f"unsorted file {f}"

    # filtered read returns exactly the matching rows
    spark = points.sparkSession
    some_code = next(c for fpath in files[:1]
                     for c in pq.read_table(fpath, columns=["meshcode"])
                     ["meshcode"].to_pylist() if c > 0)
    got = (spark.read.parquet(f"{out}/data")
           .filter(F.col("meshcode") == some_code).count())
    want = tiled.filter(F.col("meshcode") == some_code).count()
    assert got == want > 0


def test_q4_chain_plan_shape(engine, points):
    """The headline join chain (pruned fused UDF -> broadcast bit-test
    join) must plan as: ONE Python stage, a broadcast nested-loop
    probe, and NO shuffle exchange (broadcast exchange is expected)."""
    import __spark_entry__ as entry_mod

    fused = engine.transform_tile_pip(
        points, entry_mod.POLYGONS, "lat", "lon", "alt",
        fields=["status", "poly_mask"])
    chain = Engine.poly_mask_rows(
        fused.filter(F.col("status") == 0).select("pkey", "poly_mask"),
        entry_mod.POLYGONS,
    ).select("pkey", "poly_idx")
    plan = chain._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "BroadcastExchange" in line, plan


def test_expand_struct_preserves_underscore_r_column(engine, spark):
    """A passthrough column literally named `_r` must survive a kernel
    transform unchanged (the internal struct temp name is chosen
    collision-free)."""
    df = spark.createDataFrame(
        [(1, 36.09, 140.08, 10.0, "keepme")],
        "pkey long, lat double, lon double, alt double, _r string")
    row = engine.forward(df).collect()[0]
    assert row["_r"] == "keepme"
    assert row["status"] == 0 and row["out_lat"] is not None


def test_tile_bounds_node_mode_reference_parity(spark, semidyna_grid):
    """Tile assignment under strict_bounds=False follows
    MeshNode::try_from_point (node-level bounds): longitude exactly
    180.0 gets the (80,0,0) maximum node and a top-latitude-cell point
    gets its valid sw node, while the strict default keeps lon 180.0
    out of domain.  The transform kernels in the SAME parity engine
    still fail those points (cell-level bounds) — matching the
    reference, where node construction succeeds and cell construction
    fails."""
    ref = Engine(spark, semidyna_grid, strict_bounds=False)
    strict = Engine(spark, semidyna_grid)
    df = spark.createDataFrame(
        [(1, 36.09, 180.0, 0.0), (2, 66.63, 140.1, 0.0), (3, 36.09, 140.08, 0.0)],
        "pkey long, lat double, lon double, alt double")
    t_ref = {r.pkey: r.meshcode for r in ref.assign_tiles(df).collect()}
    t_strict = {r.pkey: r.meshcode for r in strict.assign_tiles(df).collect()}
    # lon 180.0: node (80,0,0) under parity mode, out of domain strictly
    assert t_strict[1] == -1
    lon1 = (t_ref[1] // 10_000) % 100
    lon2 = (t_ref[1] // 100) % 10
    lon3 = t_ref[1] % 10
    assert (lon1, lon2, lon3) == (80, 0, 0)
    # top latitude cell: valid sw node in BOTH modes (strict accepts
    # v < 100 here too); in-grid point identical in both
    assert t_ref[2] == t_strict[2] != -1
    assert t_ref[3] == t_strict[3] != -1
    # but the parity engine's TRANSFORM still rejects both boundary
    # points (cell-level inclusive bounds: lon_max node / top-lat cell
    # -> OutOfBounds), while the in-grid point transforms fine
    s_ref = {r.pkey: r.status for r in ref.forward_corr(df).collect()}
    assert s_ref[1] == 1 and s_ref[2] == 1 and s_ref[3] == 0


def test_salted_join_zero_extra_passes_with_stats(spark, engine, points):
    """VERDICT r04 #3: with hot_codes supplied, bucketed_spatial_join
    must consume its input exactly ONCE (the join itself) — the skew
    detection aggregation must not run.  Without stats it is allowed
    its one documented extra pass.  Counted with an accumulator inside
    a pass-through pandas_udf on the tile column (detection groups by
    exactly that column, so pruning cannot skip the probe)."""
    import pandas as pd

    polys = [("p0", [(36.0833, 140.0625), (36.0833, 140.125),
                     (36.125, 140.125), (36.125, 140.0625)])]
    tiled = engine.assign_tiles(points)
    n = tiled.count()
    acc = spark.sparkContext.accumulator(0)

    @F.pandas_udf("long")
    def counted(x: pd.Series) -> pd.Series:
        acc.add(len(x))
        return x

    counted = counted.asNondeterministic()
    probe = tiled.withColumn("meshcode", counted(F.col("meshcode")))

    # stats supplied -> exactly one pass
    out = spatial.bucketed_spatial_join(
        probe, polys, 5, hot_threshold=10, num_salts=4,
        hot_codes=[54401005])
    rows_with = out.count()
    assert acc.value == n, f"{acc.value / n:.1f} passes with stats supplied"

    # auto-detection -> exactly one extra pass (the documented cost)
    acc2 = spark.sparkContext.accumulator(0)

    @F.pandas_udf("long")
    def counted2(x: pd.Series) -> pd.Series:
        acc2.add(len(x))
        return x

    counted2 = counted2.asNondeterministic()
    probe2 = tiled.withColumn("meshcode", counted2(F.col("meshcode")))
    out2 = spatial.bucketed_spatial_join(
        probe2, polys, 5, hot_threshold=10, num_salts=4)
    rows_without = out2.count()
    assert acc2.value == 2 * n, f"{acc2.value / n:.1f} passes on auto-detect"
    assert rows_with == rows_without > 0


def test_hot_codes_from_manifests_feeds_salted_join(spark, engine, points, tmp_path):
    """End-to-end statistics feeder: run_checkpointed records per-group
    top-tile counts in the manifests; hot_codes_from_manifests reads
    them back (zero passes over the corpus) and the salted join fed
    with them reproduces the broadcast PIP oracle exactly."""
    polys = [("p0", [(36.0833, 140.0625), (36.0833, 140.125),
                     (36.125, 140.125), (36.125, 140.0625)])]
    tiled = engine.assign_tiles(
        engine.forward(points, "lat", "lon", "alt"), "lat", "lon")
    out_dir = str(tmp_path / "stats_sink")
    ms = sink.run_checkpointed(tiled, out_dir, n_groups=4, top_tiles=4)
    assert all("top_tiles" in m for m in ms)
    assert any(m["top_tiles"] for m in ms)
    # recorded counts are real row counts per code
    recorded = {c: k for m in ms for c, k in m["top_tiles"]}
    sample_code = max(recorded, key=recorded.get)
    true_n = tiled.filter(F.col("meshcode") == sample_code).count()
    assert recorded[sample_code] == true_n

    hot = sink.hot_codes_from_manifests(out_dir, spark, threshold=10)
    assert hot and -1 not in hot
    got = spatial.bucketed_spatial_join(
        engine.assign_tiles(points), polys, 5, num_salts=4,
        hot_codes=hot).toPandas()
    want = spatial.point_in_polygon(points, polys).toPandas()
    assert (set(map(tuple, got[["pkey", "poly_id"]].itertuples(index=False)))
            == set(map(tuple, want[["pkey", "poly_id"]].itertuples(index=False))))


def test_hot_codes_truncation_is_loud(spark, tmp_path):
    """The manifests' top-N tile cap must never be a SILENT performance
    cliff: when a group records fewer tiles than it holds (n_tiles >
    len(top_tiles)) AND every recorded count is above the read-side
    threshold, hotter-than-threshold tiles may be hidden — exactly that
    condition warns.  When the recorded floor is <= threshold the hot
    set is provably complete (hidden tiles are all <= the floor) and no
    warning fires."""
    import warnings

    # 3 tiles, all congruent mod 4 -> one group holds all of them; the
    # cap of 1 must truncate and say so (counts 30/20/10 rows)
    rows = [(i, code, 0) for code, n in ((54400000, 30), (54400004, 20),
                                         (54400008, 10))
            for i in range(n)]
    tiled = spark.createDataFrame(
        rows, "pkey long, meshcode long, status int")
    out_dir = str(tmp_path / "trunc_sink")
    ms = sink.run_checkpointed(tiled, out_dir, n_groups=4, top_tiles=1)
    assert all("n_tiles" in m for m in ms)
    assert any(m["n_tiles"] > len(m["top_tiles"]) for m in ms)
    # threshold below every recorded count -> incomplete-set hazard
    with pytest.warns(UserWarning, match="truncated at top_tiles"):
        sink.hot_codes_from_manifests(out_dir, spark, threshold=0)
    # threshold at/above the recorded floor -> provably complete, quiet
    floor = min(n for m in ms for _, n in m["top_tiles"])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        sink.hot_codes_from_manifests(out_dir, spark, threshold=floor)


def test_sink_tile_stats_exclude_error_sentinel(spark, tmp_path):
    """meshcode -1 (dead-lettered rows) is never a join key, so it must
    not occupy a top_tiles slot, count toward n_tiles, or poison the
    truncation proof: a group whose dominant 'tile' is the error bucket
    must still record its real tiles and stay warning-free, with the
    error volume visible in status_counts instead."""
    import warnings

    rows = ([(i, -1, 1) for i in range(50)]          # dominant error mass
            + [(100 + i, 54400000, 0) for i in range(8)]
            + [(200 + i, 54400004, 0) for i in range(3)])
    tiled = spark.createDataFrame(
        rows, "pkey long, meshcode long, status int")
    out_dir = str(tmp_path / "sentinel_sink")
    ms = sink.run_checkpointed(tiled, out_dir, n_groups=1, top_tiles=2)
    (m,) = ms
    assert [c for c, _ in m["top_tiles"]] == [54400000, 54400004]
    assert m["n_tiles"] == 2                     # sentinel not a tile
    assert m["status_counts"].get("1", m["status_counts"].get(1)) == 50
    # sentinel-heavy group must not trip the truncation warning: the
    # recorded set IS complete over real tiles
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        hot = sink.hot_codes_from_manifests(out_dir, spark, threshold=5)
    assert hot == [54400000]


def test_sink_null_meshcode_and_status_accounting(spark, tmp_path):
    """NULL-tolerant sink accounting (round-5 review): NULL meshcodes
    (a left-joined or nullable tile column) must land in a real bucket
    group — pmod(NULL) is NULL and previously fell out of the pending
    filter, vanishing from data AND manifests — and a NULL status must
    count under the -1 key instead of raising int(None) after the
    data write already committed."""
    df = spark.createDataFrame(
        [(1, 54400000, 0), (2, 54400001, 0),
         (3, None, 1),                      # NULL meshcode
         (4, 54400002, None)],              # NULL status
        "pkey long, meshcode long, status int")
    out_dir = str(tmp_path / "null_sink")
    ms = sink.run_checkpointed(df, out_dir, n_groups=2)
    assert sum(m["n_rows"] for m in ms) == 4       # nothing dropped
    assert sink.read_resumed(spark, out_dir).count() == 4
    merged: dict = {}
    for m in ms:
        for k, v in m["status_counts"].items():
            merged[k] = merged.get(k, 0) + v
    # string keys, identical live and after a json round-trip
    assert merged == {"0": 2, "1": 1, "-1": 1}
    reread: dict = {}
    for m in sink.read_manifests(out_dir, spark):
        for k, v in m["status_counts"].items():
            reread[k] = reread.get(k, 0) + v
    assert reread == merged


def test_hot_codes_warns_when_stats_disabled(spark, tmp_path):
    """An empty hot set from manifests WITHOUT tile statistics means
    'unknown', not 'no skew' — it must warn instead of letting the
    caller join unsalted on faith (round-5 review)."""
    import warnings

    df = spark.createDataFrame(
        [(i, 54400000, 0) for i in range(20)],
        "pkey long, meshcode long, status int")
    out_dir = str(tmp_path / "nostats_sink")
    sink.run_checkpointed(df, out_dir, n_groups=1, top_tiles=0)
    with pytest.warns(UserWarning, match="NO tile statistics"):
        assert sink.hot_codes_from_manifests(out_dir, spark,
                                             threshold=5) == []


def test_streaming_dedup_exact_dead_letters_survive(spark, tmp_path):
    """NULL text md5s to NULL and dropDuplicates* groups NULLs as ONE
    key — without the surrogate, every dead letter after the first
    was silently swallowed.  NULL warc_ts rows (unparseable WARC-Date)
    must also flow instead of parking in a never-closing NULL window."""
    import datetime

    from jgdtrans_rs_spark.streaming.ingest import stream_dedup_exact

    t0 = datetime.datetime(2023, 1, 1)
    schema = "url string, warc_ts timestamp, text string"
    rows = [("u1", t0, "alpha"),
            ("d1", t0, None),            # dead letter 1
            ("d2", t0, None),            # dead letter 2 — must survive
            ("d3", None, None),          # dead letter, NULL event time
            ("u2", t0, "alpha")]         # true duplicate — dropped
    d = str(tmp_path / "dl_stream")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(d)
    src = spark.readStream.schema(schema).parquet(d)
    q = (stream_dedup_exact(src)
         .writeStream.format("memory").queryName("dl_dedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.sql("SELECT url FROM dl_dedup").toPandas()
    assert sorted(out["url"]) == ["d1", "d2", "d3", "u1"]


def test_bucketed_join_rejects_duplicate_poly_ids(spark):
    """pid_to_idx would silently collapse duplicate poly_ids onto one
    ring (last wins), diverging from point_in_polygon's per-entry
    masks on identical input — must fail loudly (round-5 review)."""
    pts = spark.createDataFrame([(1, 36.1, 140.09, 54401005)],
                                "pkey long, lat double, lon double, "
                                "meshcode long")
    ring = [(36.0, 140.0), (36.2, 140.0), (36.2, 140.2), (36.0, 140.2)]
    with pytest.raises(ValueError, match="duplicate poly_id"):
        spatial.bucketed_spatial_join(pts, [("A", ring), ("A", ring)],
                                      unit=1)
