"""Spatial operators: point-in-polygon, bucketed/salted spatial join,
kNN over mesh nodes.

The reference has no joins beyond its 4-corner HashMap probe
(trans.rs:34-53); these operators are the north-rule additions, with
semantics anchored to the JGD mesh system.

Scale design:

* ``point_in_polygon`` — broadcast path: the polygon set rides a
  closure (small dims broadcast), the containment test is a vectorized
  numpy crossing-number kernel inside ``mapInPandas`` — one narrow
  stage, no shuffle.  From-scratch kernel (no shapely dependency).
* ``bucketed_spatial_join`` — shuffle path for large polygon sets:
  polygons are exploded onto the meshcodes their bbox covers, points
  shuffle on meshcode; hot cells (dense Tokyo/Osaka buckets) are
  salted explicitly: hot points get a deterministic salt from their
  key, the polygon side is replicated per salt — bounded reducer fan-in
  regardless of skew.  Output is a set of (key, poly_id) pairs,
  identical across parallelism levels.
* ``knn_mesh_nodes`` — for a point inside a rectangular lattice cell
  the 4 nearest nodes are exactly the cell corners, so the candidate
  set is local: compute 4 distances per point in the batch kernel and
  emit the top-k — zero shuffle, unlike the naive
  explode + Window.row_number plan.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .. import mesh

Polygon = tuple[str, list[tuple[float, float]]]  # (poly_id, [(lat, lon), ...])


def _crossings(lat: np.ndarray, lon: np.ndarray, ring: list[tuple[float, float]]) -> np.ndarray:
    """Crossing-number parity, edge formula pinned to the SQL oracle
    (plans/oracle.py::point_in_polygon_sql): for each edge,
    ((y1 > lat) != (y2 > lat)) and lon < (x2-x1)*(lat-y1)/(y2-y1)+x1."""
    inside = np.zeros(lat.shape[0], dtype=np.int64)
    n = len(ring)
    for i in range(n):
        y1, x1 = ring[i]
        y2, x2 = ring[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never crosses the test ray
        cross = ((y1 > lat) != (y2 > lat)) & (
            lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
        )
        inside += cross
    return inside % 2


def point_in_polygon(df: DataFrame, polygons: Sequence[Polygon],
                     key: str = "pkey", lat: str = "lat", lon: str = "lon") -> DataFrame:
    """Broadcast point-in-polygon join -> (key, poly_id) pairs.

    Polygon bboxes pre-filter each batch before the exact parity test.
    """
    polys = [(pid, [(float(a), float(b)) for a, b in ring]) for pid, ring in polygons]
    bboxes = [
        (
            min(p[0] for p in ring), max(p[0] for p in ring),
            min(p[1] for p in ring), max(p[1] for p in ring),
        )
        for _, ring in polys
    ]
    key_field = df.schema[key]
    schema = StructType([key_field, StructField("poly_id", StringType(), False)])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            la = pdf[lat].to_numpy(dtype=np.float64, na_value=np.nan)
            lo = pdf[lon].to_numpy(dtype=np.float64, na_value=np.nan)
            keys = pdf[key].to_numpy()
            out_keys, out_pids = [], []
            for (pid, ring), (la0, la1, lo0, lo1) in zip(polys, bboxes):
                cand = (la >= la0) & (la <= la1) & (lo >= lo0) & (lo <= lo1)
                if not cand.any():
                    continue
                hit = np.zeros(la.shape[0], dtype=bool)
                hit[cand] = _crossings(la[cand], lo[cand], ring) == 1
                if hit.any():
                    out_keys.append(keys[hit])
                    out_pids.append(np.full(int(hit.sum()), pid, dtype=object))
            if out_keys:
                yield pd.DataFrame({key: np.concatenate(out_keys),
                                    "poly_id": np.concatenate(out_pids)})
            else:
                yield pd.DataFrame({key: keys[:0], "poly_id": np.array([], dtype=object)})

    return df.mapInPandas(run, schema=schema)


def polygon_mesh_cover(polygons: Sequence[Polygon], unit: int) -> list[tuple[int, str]]:
    """Explode each polygon's bbox onto the meshcodes it covers:
    (meshcode, poly_id) candidate pairs for the bucketed join."""
    out: list[tuple[int, str]] = []
    for pid, ring in polygons:
        la0 = min(p[0] for p in ring)
        la1 = max(p[0] for p in ring)
        lo0 = min(p[1] for p in ring)
        lo1 = max(p[1] for p in ring)
        step_lat = (2.0 / 3.0) / 80.0 * unit
        step_lon = (1.0 / 80.0) * unit
        lats = np.arange(la0 - step_lat, la1 + step_lat, step_lat)
        lons = np.arange(lo0 - step_lon, lo1 + step_lon, step_lon)
        gl, gn = np.meshgrid(lats, lons)
        latd, lond, valid = mesh.point_to_digits(gl.ravel(), gn.ravel(), unit)
        codes = np.unique(mesh.digits_to_meshcode(latd, lond)[valid])
        out.extend((int(c), pid) for c in codes)
    return out


def bucketed_spatial_join(points: DataFrame, polygons: Sequence[Polygon], unit: int,
                          key: str = "pkey", lat: str = "lat", lon: str = "lon",
                          mesh_col: str = "meshcode",
                          hot_threshold: int = 50_000, num_salts: int = 16) -> DataFrame:
    """Meshcode-bucketed spatial join with explicit skew salting.

    points must carry a ``mesh_col`` tile column (engine.assign_tiles).
    Hot buckets (count > hot_threshold) are detected with a cheap
    pre-aggregation; their points get ``salt = pmod(hash(key), n)`` and
    the polygon candidate side is replicated across all salts, so no
    single reducer receives an entire dense city cell.  Output rows are
    (key, poly_id), independent of parallelism.
    """
    spark = points.sparkSession
    cover = polygon_mesh_cover(polygons, unit)
    if not cover:
        return spark.createDataFrame([], schema=f"{key} long, poly_id string")
    cand = spark.createDataFrame(cover, schema=f"{mesh_col} long, poly_id string")

    hot = (
        points.groupBy(mesh_col).count()
        .filter(F.col("count") > hot_threshold)
        .select(mesh_col, F.lit(True).alias("_hot"))
    )
    pts = (
        points.join(F.broadcast(hot), mesh_col, "left")
        .withColumn(
            "_salt",
            F.when(F.col("_hot").isNotNull(),
                   F.pmod(F.hash(F.col(key)), F.lit(num_salts)))
            .otherwise(F.lit(0)),
        )
    )
    salts = spark.range(num_salts).select(F.col("id").cast("int").alias("_salt"))
    cand_salted = cand.join(
        F.broadcast(hot.select(mesh_col)), mesh_col, "left_semi"
    ).crossJoin(salts).unionByName(
        cand.join(F.broadcast(hot.select(mesh_col)), mesh_col, "left_anti")
        .withColumn("_salt", F.lit(0))
    )

    joined = pts.join(cand_salted, [mesh_col, "_salt"])

    # exact containment test on the surviving candidates
    polys = {pid: [(float(a), float(b)) for a, b in ring] for pid, ring in polygons}
    key_field = points.schema[key]
    schema = StructType([key_field, StructField("poly_id", StringType(), False)])

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame({key: pdf[key][:0], "poly_id": pdf["poly_id"][:0]})
                continue
            la = pdf[lat].to_numpy(dtype=np.float64, na_value=np.nan)
            lo = pdf[lon].to_numpy(dtype=np.float64, na_value=np.nan)
            keep = np.zeros(len(pdf), dtype=bool)
            for pid, grp in pdf.groupby("poly_id"):
                idx = grp.index.to_numpy()
                pos = pdf.index.get_indexer(idx)
                keep[pos] = _crossings(la[pos], lo[pos], polys[pid]) == 1
            out = pdf.loc[keep, [key, "poly_id"]]
            yield out

    return joined.select(key, lat, lon, "poly_id").mapInPandas(refine, schema=schema)


def knn_mesh_nodes(df: DataFrame, unit: int, k: int = 3,
                   key: str = "pkey", lat: str = "lat", lon: str = "lon") -> DataFrame:
    """k nearest mesh nodes per point -> (key, rank, node_code).

    Candidates are the 4 cell corners (exact for k <= 4 on a
    rectangular lattice); squared-degree distance, ties broken by
    meshcode.  Entirely batch-local: no shuffle, no window.
    """
    key_field = df.schema[key]
    schema = StructType([
        key_field,
        StructField("rank", IntegerType(), False),
        StructField("node_code", LongType(), False),
    ])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            la = pdf[lat].to_numpy(dtype=np.float64, na_value=np.nan)
            lo = pdf[lon].to_numpy(dtype=np.float64, na_value=np.nan)
            keys = pdf[key].to_numpy()
            lat_d, lon_d, valid = mesh.point_to_digits(la, lo, unit)
            east = mesh.next_east(lon_d, unit)
            north = mesh.next_north(lat_d, unit)
            codes = np.stack([
                mesh.digits_to_meshcode(lat_d, lon_d),
                mesh.digits_to_meshcode(lat_d, east),
                mesh.digits_to_meshcode(north, lon_d),
                mesh.digits_to_meshcode(north, east),
            ], axis=1)
            node_lat = np.stack([
                mesh.digits_to_lat(lat_d), mesh.digits_to_lat(lat_d),
                mesh.digits_to_lat(north), mesh.digits_to_lat(north),
            ], axis=1)
            node_lon = np.stack([
                mesh.digits_to_lon(lon_d), mesh.digits_to_lon(east),
                mesh.digits_to_lon(lon_d), mesh.digits_to_lon(east),
            ], axis=1)
            dy = la[:, None] - node_lat
            dx = lo[:, None] - node_lon
            d2 = dy * dy + dx * dx
            order = np.lexsort((codes, d2), axis=-1)[:, :k]
            rows = valid.nonzero()[0]
            if rows.size == 0:
                yield pd.DataFrame({key: keys[:0],
                                    "rank": np.array([], dtype=np.int32),
                                    "node_code": np.array([], dtype=np.int64)})
                continue
            sel = order[rows]
            yield pd.DataFrame({
                key: np.repeat(keys[rows], k),
                "rank": np.tile(np.arange(1, k + 1, dtype=np.int32), rows.size),
                "node_code": np.take_along_axis(codes[rows], sel, axis=1).ravel(),
            })

    return df.mapInPandas(run, schema=schema)
