"""The Spark layer: broadcast mesh grid + DataFrame -> DataFrame transforms.

Execution model (designed for 1000-executor / 100 TB scale, tested on
local[*]):

* The parameter grid (O(10^5..10^6) rows) is ``sc.broadcast`` once —
  the Spark equivalent of the reference's in-process HashMap probe
  (par.rs:283-285).  Executor-side lookup is an in-UDF ``searchsorted``
  gather, i.e. broadcast-hash-join semantics with zero shuffles instead
  of 4 joins (one per cell corner).
* The whole transform chain (validate -> forward/backward -> tile
  assign) is one narrow stage: Scan -> Filter -> Project ->
  PythonMapInArrow -> Project.  Catalyst prunes the parquet scan down
  to the 2-3 coordinate columns; no shuffle occurs until a downstream
  aggregation/join keys on the tile.
* Kernels run over Arrow record batches (mapInPandas / pandas_udf) —
  no per-row Python anywhere.

Error semantics are dead-letter columns (status / err_meshcode /
err_corner), never task failures — mirroring trans.rs:946-999
relationally.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)

from . import kernel, mesh
from .grid import MeshGrid

_RESULT_FIELDS = [
    StructField("status", IntegerType(), False),
    StructField("err_meshcode", LongType(), False),
    StructField("err_corner", IntegerType(), False),
]


def _appended_schema(df: DataFrame, new_fields: list[StructField]) -> StructType:
    names = {f.name for f in new_fields}
    kept = [f for f in df.schema.fields if f.name not in names]
    return StructType(kept + new_fields)


class Engine:
    """Broadcast grid + a library of DataFrame->DataFrame transforms.

    The Spark counterpart of ``Transformer<T>`` (transformer.rs:309-311):
    ``mesh_unit`` comes from the grid's format; ``get`` is the
    vectorized gather inside the kernels.
    """

    def __init__(self, spark: SparkSession, grid: MeshGrid):
        self.spark = spark
        self.grid = grid
        self._bc = spark.sparkContext.broadcast(grid)

    # -- constructors -----------------------------------------------------

    @classmethod
    def from_par(cls, spark: SparkSession, path: str, format: str) -> "Engine":
        """``Transformer::from_str`` (transformer.rs:395-449)."""
        from .grid import load_par

        return cls(spark, load_par(path, format))

    # -- core transforms --------------------------------------------------

    def _map_kernel(self, df: DataFrame, lat: str, lon: str, alt: str | None,
                    fn_name: str, prefix: str) -> DataFrame:
        """Run a point->point kernel over Arrow batches, appending
        `{prefix}lat`, `{prefix}lon`, `{prefix}alt` + status columns."""
        bc = self._bc
        out_fields = [
            StructField(f"{prefix}lat", DoubleType(), True),
            StructField(f"{prefix}lon", DoubleType(), True),
            StructField(f"{prefix}alt", DoubleType(), True),
        ] + _RESULT_FIELDS
        schema = _appended_schema(df, out_fields)
        out_names = [f.name for f in schema.fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            grid = bc.value
            fn = getattr(kernel, fn_name)
            for pdf in batches:
                la = pdf[lat].to_numpy(dtype=np.float64, na_value=np.nan)
                lo = pdf[lon].to_numpy(dtype=np.float64, na_value=np.nan)
                al = (
                    pdf[alt].to_numpy(dtype=np.float64, na_value=np.nan)
                    if alt is not None and alt in pdf.columns
                    else np.zeros_like(la)
                )
                out_la, out_lo, out_al, c = fn(la, lo, al, grid)
                pdf = pdf.copy()
                pdf[f"{prefix}lat"] = out_la
                pdf[f"{prefix}lon"] = out_lo
                pdf[f"{prefix}alt"] = out_al
                pdf["status"] = c.status.astype(np.int32)
                pdf["err_meshcode"] = c.err_meshcode
                pdf["err_corner"] = c.err_corner.astype(np.int32)
                yield pdf[out_names]

        return df.mapInPandas(run, schema=schema)

    def forward(self, df: DataFrame, lat: str = "lat", lon: str = "lon",
                alt: str | None = "alt", prefix: str = "out_") -> DataFrame:
        """``Transformer::forward`` (trans.rs:134-136) over a DataFrame."""
        return self._map_kernel(df, lat, lon, alt, "forward", prefix)

    def backward(self, df: DataFrame, lat: str = "lat", lon: str = "lon",
                 alt: str | None = "alt", prefix: str = "out_") -> DataFrame:
        """``Transformer::backward`` (trans.rs:233-235): verified Newton
        inverse, residual < 5e-14 deg."""
        return self._map_kernel(df, lat, lon, alt, "backward", prefix)

    def backward_compat(self, df: DataFrame, lat: str = "lat", lon: str = "lon",
                        alt: str | None = "alt", prefix: str = "out_") -> DataFrame:
        """``Transformer::backward_compat`` (trans.rs:179-181)."""
        return self._map_kernel(df, lat, lon, alt, "backward_compat", prefix)

    def _corr(self, df: DataFrame, lat: str, lon: str, fn_name: str) -> DataFrame:
        bc = self._bc
        out_fields = [
            StructField("dlat_deg", DoubleType(), True),
            StructField("dlon_deg", DoubleType(), True),
            StructField("dalt_m", DoubleType(), True),
        ] + _RESULT_FIELDS
        schema = _appended_schema(df, out_fields)
        out_names = [f.name for f in schema.fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            grid = bc.value
            fn = getattr(kernel, fn_name)
            for pdf in batches:
                la = pdf[lat].to_numpy(dtype=np.float64, na_value=np.nan)
                lo = pdf[lon].to_numpy(dtype=np.float64, na_value=np.nan)
                c = fn(la, lo, grid)
                pdf = pdf.copy()
                pdf["dlat_deg"] = c.dlat
                pdf["dlon_deg"] = c.dlon
                pdf["dalt_m"] = c.dalt
                pdf["status"] = c.status.astype(np.int32)
                pdf["err_meshcode"] = c.err_meshcode
                pdf["err_corner"] = c.err_corner.astype(np.int32)
                yield pdf[out_names]

        return df.mapInPandas(run, schema=schema)

    def forward_corr(self, df: DataFrame, lat: str = "lat", lon: str = "lon") -> DataFrame:
        """``forward_corr`` (trans.rs:428-451): correction columns only."""
        return self._corr(df, lat, lon, "forward_corr")

    def backward_corr(self, df: DataFrame, lat: str = "lat", lon: str = "lon") -> DataFrame:
        return self._corr(df, lat, lon, "backward_corr")

    def backward_compat_corr(self, df: DataFrame, lat: str = "lat", lon: str = "lon") -> DataFrame:
        return self._corr(df, lat, lon, "backward_compat_corr")

    # -- tiling -----------------------------------------------------------

    def assign_tiles(self, df: DataFrame, lat: str = "lat", lon: str = "lon",
                     level: int = 15, with_position: bool = False) -> DataFrame:
        """Tile assignment: exact JGD ``meshcode`` (the reference's native
        tile id, with the ulp-parity boundary semantics of
        coord.rs:260-283) plus a ``quadkey`` S2-style quadtree id.

        meshcode = -1 for points outside the mesh domain.
        """
        unit = self.grid.mesh_unit
        out_fields = [
            StructField("meshcode", LongType(), False),
            StructField("quadkey", LongType(), False),
        ]
        if with_position:
            out_fields += [
                StructField("pos_y", DoubleType(), True),
                StructField("pos_x", DoubleType(), True),
            ]
        schema = _appended_schema(df, out_fields)
        out_names = [f.name for f in schema.fields]

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                la = pdf[lat].to_numpy(dtype=np.float64, na_value=np.nan)
                lo = pdf[lon].to_numpy(dtype=np.float64, na_value=np.nan)
                lat_d, lon_d, valid = mesh.point_to_digits(la, lo, unit)
                code = mesh.digits_to_meshcode(lat_d, lon_d)
                pdf = pdf.copy()
                pdf["meshcode"] = np.where(valid, code, -1)
                pdf["quadkey"] = mesh.quadkey(la, lo, level)
                if with_position:
                    y, x = mesh.cell_position(la, lo, lat_d, lon_d, unit)
                    pdf["pos_y"] = np.where(valid, y, np.nan)
                    pdf["pos_x"] = np.where(valid, x, np.nan)
                yield pdf[out_names]

        return df.mapInPandas(run, schema=schema)

    # -- validation (pure Column, JVM-side) -------------------------------

    @staticmethod
    def valid_point(lat_col, lon_col):
        """``Point::new`` bounds predicate (point.rs:212-223) as a pure
        Column — pushes down to the scan."""
        lat_col, lon_col = F.col(lat_col), F.col(lon_col)
        return (
            lat_col.between(-90.0, 90.0)
            & lon_col.between(-180.0, 180.0)
            & ~F.isnan(lat_col)
            & ~F.isnan(lon_col)
        )

    def validate(self, df: DataFrame, lat: str = "lat", lon: str = "lon"):
        """Split into (valid, quarantine) — the validate-once-as-filter
        strategy that gates the unchecked fast kernel
        (trans.rs:247-250)."""
        pred = self.valid_point(lat, lon)
        return df.filter(pred), df.filter(~pred)

    # -- grid as a DataFrame ----------------------------------------------

    def grid_df(self) -> DataFrame:
        """The broadcast grid as a small DataFrame (for F.broadcast joins
        / coverage anti-joins)."""
        return self.spark.createDataFrame(
            self.grid.to_rows(),
            schema="meshcode long, dlat_sec double, dlon_sec double, dalt_m double",
        )

    def statistics(self) -> dict:
        """Exact compensated grid statistics (transformer.rs:504-528)."""
        return self.grid.statistics()
