"""Source-layer tests: distributed par reader, Engine.from_par,
streaming transform."""

import numpy as np
from pyspark.sql import functions as F

from jgdtrans_rs_spark.engine import Engine
from jgdtrans_rs_spark.grid import parse_par
from jgdtrans_rs_spark.sources.par import grid_from_par_df, read_par_df
from tests.conftest import SEMIDYNA

PAR_TEXT = (
    "\n" * 15
    + "MeshCode dB(sec)  dL(sec) dH(m)\n"
    + "".join(
        f"{c:8d} {a:9.5f} {b:9.5f} {h:9.5f}\n"
        for c, (a, b, h) in sorted(SEMIDYNA.items())
    )
)


def test_distributed_par_reader_matches_driver_parse(spark, tmp_path):
    p = tmp_path / "semidyna.par"
    p.write_text(PAR_TEXT)
    df = read_par_df(spark, str(p), "SemiDynaEXE")
    g_dist = grid_from_par_df(df, "SemiDynaEXE")
    g_drv = parse_par(PAR_TEXT, "SemiDynaEXE")
    assert (g_dist.codes == g_drv.codes).all()
    assert (g_dist.dlat_sec == g_drv.dlat_sec).all()
    assert (g_dist.dlon_sec == g_drv.dlon_sec).all()
    assert (g_dist.dalt_m == g_drv.dalt_m).all()


def test_engine_from_par(spark, tmp_path):
    p = tmp_path / "semidyna.par"
    p.write_text(PAR_TEXT)
    eng = Engine.from_par(spark, str(p), "SemiDynaEXE")
    df = spark.createDataFrame(
        [(1, 36.10377479, 140.087855041, 2.34)], "pkey long, lat double, lon double, alt double"
    )
    row = eng.forward(df).collect()[0]
    # transformer.rs:301-305 bit-exact constants
    assert row.out_lat == 36.103773017086695
    assert row.out_lon == 140.08785924333452
    assert row.out_alt == 2.4363138578103


def test_streaming_pages_transform(spark, semidyna_grid, tmp_path):
    """Stateless streaming transform: one availableNow micro-batch of
    extracted pages produces the same rows as the batch path."""
    from jgdtrans_rs_spark.sources import pages as pages_src
    from jgdtrans_rs_spark.streaming.ingest import stream_pages_transform

    eng = Engine(spark, semidyna_grid)
    batch = pages_src.extract_geotags(
        pages_src.synth_pages(spark, "/root/testdata/sf0.001")
    ).select("url", "lat", "lon")
    src_dir = str(tmp_path / "pages_src")
    batch.write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(batch.schema).parquet(src_dir)
    out = stream_pages_transform(eng, stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory").queryName("pages_tf")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) AS n, sum(CASE WHEN status = 0 THEN 1 ELSE 0 END) AS ok FROM pages_tf").collect()[0]
    exp = eng.forward(eng.validate(batch)[0], "lat", "lon", None)
    assert got.n == exp.count()
    assert got.ok == exp.filter(F.col("status") == 0).count()
