"""Distributed par-file reader (DataFrame-native variant).

``load_par`` in grid.py parses driver-side (par files are small and
the result broadcasts).  This module provides the DataFrame-native
twin for very large or many par files: ``spark.read.text`` + fixed
``substring`` Column slicing per the same layout table
(par.rs:642-653) — fully JVM-side, no Python in the parse.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import FORMAT_MESH_UNIT, PAR_LAYOUTS, MeshGrid


def read_par_df(spark: SparkSession, path: str, format: str) -> DataFrame:
    """Par file -> DataFrame(meshcode long, dlat_sec double,
    dlon_sec double, dalt_m double) via Column slicing.

    Absent component columns fill 0.0 (par.rs:396-466); header lines
    are dropped by zipWithIndex-free filtering on the meshcode parse
    (headers never parse as 8-digit ints at columns 0..8).
    """
    header, code_rng, lat_rng, lon_rng, alt_rng = PAR_LAYOUTS[format]
    lines = spark.read.text(path)

    def slice_col(rng, name):
        if rng is None:
            return F.lit(0.0).alias(name)
        start, end = rng
        # try_cast: header/malformed lines yield null instead of an
        # ANSI cast error
        return (
            F.trim(F.substring(F.col("value"), start + 1, end - start))
            .try_cast("double").alias(name)
        )

    code = (
        F.trim(F.substring(F.col("value"), code_rng[0] + 1, code_rng[1] - code_rng[0]))
        .try_cast("long").alias("meshcode")
    )
    df = lines.select(
        code,
        slice_col(lat_rng, "dlat_sec"),
        slice_col(lon_rng, "dlon_sec"),
        slice_col(alt_rng, "dalt_m"),
    )
    # header/comment lines fail the integer parse -> null meshcode
    return df.filter(F.col("meshcode").isNotNull()).na.fill(0.0)


def grid_from_par_df(df: DataFrame, format: str) -> MeshGrid:
    """Collect a (small) parsed par DataFrame into a broadcastable
    MeshGrid."""
    rows = df.collect()
    params = {int(r.meshcode): (r.dlat_sec, r.dlon_sec, r.dalt_m) for r in rows}
    return MeshGrid.from_dict(params, format=format)
