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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
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


def _no_duplicate(udf):
    """Mark a (genuinely deterministic) kernel UDF nondeterministic so
    the optimizer may not clone it.

    Without this, ``transform(...).filter(status == 0).select(other
    fields)`` plans TWO ArrowEvalPython nodes running the same kernel:
    predicate pushdown substitutes the UDF expression into the filter
    while the projection keeps its own copy — the whole transform
    executes twice per row (measured: every filtered bench chain).
    The flag only removes optimizer liberties (no pushdown through /
    no common-subexpression cloning of this projection); results are
    identical.  Consequence to document: a downstream filter on a
    PASSTHROUGH column no longer pushes below the kernel either —
    filter source columns BEFORE the transform (validate() already
    structures chains this way)."""
    return udf.asNondeterministic()


def _expand_struct(df: DataFrame, new_names: set[str], struct_col) -> DataFrame:
    """Attach a kernel's struct column and expand it, replacing any
    same-named input columns.  The temporary column name is chosen
    collision-free: a fixed "_r" would silently overwrite (and then
    re-emit) a user passthrough column named "_r"."""
    kept = [c for c in df.columns if c not in new_names]
    tmp = "_r"
    while tmp in df.columns:
        tmp += "_"
    return df.withColumn(tmp, struct_col).select(*kept, f"{tmp}.*")


def _select_fields(all_fields: list[StructField],
                   fields: list[str] | None) -> list[StructField]:
    """The fused kernels' output-struct pruning contract (shared by
    transform_and_tile and transform_tile_pip): None = everything,
    else the named subset in the caller's order; unknown names raise."""
    if fields is None:
        return all_fields
    known = {f.name: f for f in all_fields}
    unknown = [f for f in fields if f not in known]
    if unknown:
        raise ValueError(f"unknown output fields {unknown}; "
                         f"choose from {sorted(known)}")
    return [known[f] for f in fields]


class Engine:
    """Broadcast grid + a library of DataFrame->DataFrame transforms.

    The Spark counterpart of ``Transformer<T>`` (transformer.rs:309-311):
    ``mesh_unit`` comes from the grid's format; ``get`` is the
    vectorized gather inside the kernels.
    """

    def __init__(self, spark: SparkSession, grid: MeshGrid,
                 strict_bounds: bool = True):
        self.spark = spark
        self.grid = grid
        # strict_bounds=False opts the kernels into exact reference
        # checked-path boundary error-kind parity (kernel._bounds_mode)
        self.strict_bounds = strict_bounds
        self._bc = spark.sparkContext.broadcast(grid)

    # -- constructors -----------------------------------------------------

    @classmethod
    def from_par(cls, spark: SparkSession, path: str, format: str,
                 strict_bounds: bool = True) -> "Engine":
        """``Transformer::from_str`` (transformer.rs:395-449).
        ``strict_bounds`` forwards to the constructor so the file-path
        route can build reference-parity engines too."""
        from .grid import load_par

        return cls(spark, load_par(path, format), strict_bounds=strict_bounds)

    def _tile_bounds(self) -> str:
        """Bounds mode for TILE assignment: strict by default; under
        reference parity (strict_bounds=False) the checked path for a
        tile is ``MeshNode::try_from_point`` — NODE-level inclusive
        bounds (mesh.BOUNDS_NODE), which accepts the top latitude cell
        and longitude 180.0 that CELL construction (the transform
        kernels' BOUNDS_INCLUSIVE) rejects.  Without this split the
        engine would mix strict tiles with inclusive transforms."""
        return mesh.BOUNDS_STRICT if self.strict_bounds else mesh.BOUNDS_NODE

    # -- core transforms --------------------------------------------------
    #
    # Hot kernels ride scalar pandas_udf returning a struct column (the
    # ArrowEvalPython path).  On this Spark build the MapInPandas /
    # MapInArrow input writer costs ~9us/row JVM-side regardless of
    # width, capping at ~3.5M rows/s per JVM; the scalar-UDF writer is
    # ~8x cheaper.  pandas_udf also only ships the referenced columns
    # through Python — passthrough columns (urls, payloads) stay JVM-side.

    def _struct_udf(self, fn_name: str, prefix: str):
        bc = self._bc
        sb = self.strict_bounds
        schema = StructType([
            StructField(f"{prefix}lat", DoubleType(), True),
            StructField(f"{prefix}lon", DoubleType(), True),
            StructField(f"{prefix}alt", DoubleType(), True),
        ] + _RESULT_FIELDS)

        @_no_duplicate
        @F.pandas_udf(schema)
        def run(lat_s: pd.Series, lon_s: pd.Series, alt_s: pd.Series) -> pd.DataFrame:
            grid = bc.value
            fn = getattr(kernel, fn_name)
            la = lat_s.to_numpy(dtype=np.float64, na_value=np.nan)
            lo = lon_s.to_numpy(dtype=np.float64, na_value=np.nan)
            al = alt_s.to_numpy(dtype=np.float64, na_value=np.nan)
            out_la, out_lo, out_al, c = fn(la, lo, al, grid, strict_bounds=sb)
            return pd.DataFrame({
                f"{prefix}lat": out_la,
                f"{prefix}lon": out_lo,
                f"{prefix}alt": out_al,
                "status": c.status.astype(np.int32),
                "err_meshcode": c.err_meshcode,
                "err_corner": c.err_corner.astype(np.int32),
            })

        return run

    def _map_kernel(self, df: DataFrame, lat: str, lon: str, alt: str | None,
                    fn_name: str, prefix: str) -> DataFrame:
        """Run a point->point kernel, appending `{prefix}lat`,
        `{prefix}lon`, `{prefix}alt` + status columns."""
        udf = self._struct_udf(fn_name, prefix)
        alt_col = F.col(alt) if alt is not None and alt in df.columns else F.lit(0.0)
        new_names = {f"{prefix}lat", f"{prefix}lon", f"{prefix}alt",
                     "status", "err_meshcode", "err_corner"}
        return _expand_struct(df, new_names, udf(F.col(lat), F.col(lon), alt_col))

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
        sb = self.strict_bounds
        schema = StructType([
            StructField("dlat_deg", DoubleType(), True),
            StructField("dlon_deg", DoubleType(), True),
            StructField("dalt_m", DoubleType(), True),
        ] + _RESULT_FIELDS)

        @_no_duplicate
        @F.pandas_udf(schema)
        def run(lat_s: pd.Series, lon_s: pd.Series) -> pd.DataFrame:
            grid = bc.value
            fn = getattr(kernel, fn_name)
            la = lat_s.to_numpy(dtype=np.float64, na_value=np.nan)
            lo = lon_s.to_numpy(dtype=np.float64, na_value=np.nan)
            c = fn(la, lo, grid, strict_bounds=sb)
            return pd.DataFrame({
                "dlat_deg": c.dlat, "dlon_deg": c.dlon, "dalt_m": c.dalt,
                "status": c.status.astype(np.int32),
                "err_meshcode": c.err_meshcode,
                "err_corner": c.err_corner.astype(np.int32),
            })

        new_names = {"dlat_deg", "dlon_deg", "dalt_m", "status", "err_meshcode", "err_corner"}
        return _expand_struct(df, new_names, run(F.col(lat), F.col(lon)))

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

        meshcode = -1 for points outside the mesh domain (domain =
        strict bounds, or node-level checked-path bounds under
        ``strict_bounds=False`` — see _tile_bounds).
        """
        unit = self.grid.mesh_unit
        bounds = self._tile_bounds()
        out_fields = [
            StructField("meshcode", LongType(), False),
            StructField("quadkey", LongType(), False),
        ]
        if with_position:
            out_fields += [
                StructField("pos_y", DoubleType(), True),
                StructField("pos_x", DoubleType(), True),
            ]
        schema = StructType(out_fields)

        @_no_duplicate
        @F.pandas_udf(schema)
        def run(lat_s: pd.Series, lon_s: pd.Series) -> pd.DataFrame:
            la = lat_s.to_numpy(dtype=np.float64, na_value=np.nan)
            lo = lon_s.to_numpy(dtype=np.float64, na_value=np.nan)
            lat_d, lon_d, valid = mesh.point_to_digits(la, lo, unit, bounds)
            code = mesh.digits_to_meshcode(lat_d, lon_d)
            out = {
                "meshcode": np.where(valid, code, -1),
                "quadkey": mesh.quadkey(la, lo, level),
            }
            if with_position:
                y, x = mesh.cell_position(la, lo, lat_d, lon_d, unit)
                out["pos_y"] = np.where(valid, y, np.nan)
                out["pos_x"] = np.where(valid, x, np.nan)
            return pd.DataFrame(out)

        new_names = {f.name for f in out_fields}
        return _expand_struct(df, new_names, run(F.col(lat), F.col(lon)))

    def transform_and_tile(self, df: DataFrame, lat: str = "lat", lon: str = "lon",
                           alt: str | None = "alt", level: int = 15,
                           prefix: str = "out_",
                           fields: list[str] | None = None) -> DataFrame:
        """Fused forward-transform + tile-assignment in ONE Arrow hop.

        Chaining forward() then assign_tiles() costs two Python stages
        with a full Arrow (de)serialization between them; at scale the
        serialization dominates, so the hot pipeline fuses them.

        ``fields`` prunes the UDF output struct (same contract as
        transform_tile_pip: Catalyst cannot prune struct fields through
        a pandas UDF, so pass the projection explicitly; skipping
        ``quadkey`` also skips its encode).
        """
        bc = self._bc
        sb = self.strict_bounds
        unit = self.grid.mesh_unit
        bounds = self._tile_bounds()
        all_fields = [
            StructField(f"{prefix}lat", DoubleType(), True),
            StructField(f"{prefix}lon", DoubleType(), True),
            StructField(f"{prefix}alt", DoubleType(), True),
        ] + _RESULT_FIELDS + [
            StructField("meshcode", LongType(), False),
            StructField("quadkey", LongType(), False),
        ]
        out_fields = _select_fields(all_fields, fields)
        names = [f.name for f in out_fields]
        want_mesh = "meshcode" in names
        want_quadkey = "quadkey" in names
        schema = StructType(out_fields)

        @_no_duplicate
        @F.pandas_udf(schema)
        def run(lat_s: pd.Series, lon_s: pd.Series, alt_s: pd.Series) -> pd.DataFrame:
            grid = bc.value
            la = lat_s.to_numpy(dtype=np.float64, na_value=np.nan)
            lo = lon_s.to_numpy(dtype=np.float64, na_value=np.nan)
            al = alt_s.to_numpy(dtype=np.float64, na_value=np.nan)
            out_la, out_lo, out_al, c = kernel.forward(la, lo, al, grid, strict_bounds=sb)
            cols: dict = {
                f"{prefix}lat": out_la,
                f"{prefix}lon": out_lo,
                f"{prefix}alt": out_al,
                "status": c.status.astype(np.int32),
                "err_meshcode": c.err_meshcode,
                "err_corner": c.err_corner.astype(np.int32),
            }
            if want_mesh:
                lat_d, lon_d, valid = mesh.point_to_digits(out_la, out_lo, unit, bounds)
                code = mesh.digits_to_meshcode(lat_d, lon_d)
                cols["meshcode"] = np.where(valid, code, -1)
            if want_quadkey:
                cols["quadkey"] = mesh.quadkey(out_la, out_lo, level)
            return pd.DataFrame({n: cols[n] for n in names})

        alt_col = F.col(alt) if alt is not None and alt in df.columns else F.lit(0.0)
        new_names = {f.name for f in out_fields}
        return _expand_struct(df, new_names,
                              run(F.col(lat), F.col(lon), alt_col))

    @staticmethod
    def poly_mask_rows(df: DataFrame, polygons, mask_col: str = "poly_mask",
                       how: str = "left") -> DataFrame:
        """Expand a containment bitmask into (row, poly_idx, poly_id)
        rows with a broadcast bit-test join — the JVM-side twin of
        ``explode_outer`` over an index array (a no-hit row keeps one
        output row with NULL poly columns under ``how='left'``).
        The tiny nested-loop probe (one AND per polygon per row) is
        far cheaper than shipping an array column through Arrow.
        The name relation is a LocalRelation (localrel.py): its
        broadcast rebuilds on every downstream action, and the
        LocalRelation build is job-free where a pickled-RDD frame
        costs a ~32-task job per action."""
        from .localrel import local_rows_df

        spark = df.sparkSession
        names = local_rows_df(
            spark,
            [(i, pid) for i, (pid, _) in enumerate(polygons)],
            schema="poly_idx int, poly_id string",
        )
        # expr form: the DataFrame shiftright() only takes a literal
        # shift, the SQL function accepts a column
        hit = F.expr(f"(shiftright({mask_col}, poly_idx) & 1) = 1")
        return df.join(F.broadcast(names), hit, how)

    def transform_tile_pip(self, df: DataFrame, polygons, lat: str = "lat",
                           lon: str = "lon", alt: str | None = "alt",
                           level: int = 15, prefix: str = "out_",
                           fields: list[str] | None = None) -> DataFrame:
        """Fully fused hot chain for broadcast-size polygon sets:
        forward transform + tile assignment + point-in-polygon
        containment in ONE Arrow hop, emitting a ``poly_mask`` LONG
        bitmask (bit i = inside polygons[i]; expand JVM-side with
        ``poly_mask_rows``).  The mask replaced round 1-2's
        ``poly_idxs`` int array: building the per-row arrays was a
        Python loop over every row inside the UDF (np.nonzero per row
        — measured ~70 s of q4's 82 s at 18M rows) and the array
        column paid the expensive Arrow list writer; the mask is pure
        vectorized numpy and a single int64 column.

        ``fields`` selects which output columns the UDF emits (default:
        all of out_lat/out_lon/out_alt/status/err_meshcode/err_corner/
        meshcode/quadkey/poly_mask).  Catalyst cannot prune struct
        fields through a pandas UDF, so a downstream ``.select`` does
        NOT stop the unused columns from being computed and shipped
        through the Arrow channel — pass the projection explicitly.
        A classification chain that keeps only status+poly_mask ships
        2 columns instead of 9, and skips the tile encode entirely;
        the Arrow write is the per-JVM shared cost that caps scaling
        on this box (BENCH/BASELINE.md), so pruning here is worth
        more than pruning after any JVM operator.

        This is the 100 TB plan when the polygon side fits a broadcast:
        zero shuffles, one Python stage.  Use
        operators.spatial.bucketed_spatial_join when it doesn't.
        """
        from .operators.spatial import _crossings  # avoid cycle at import time

        bc = self._bc
        sb = self.strict_bounds
        unit = self.grid.mesh_unit
        bounds = self._tile_bounds()
        polys = [[(float(a), float(b)) for a, b in ring] for _, ring in polygons]
        if len(polys) > 63:
            raise ValueError(
                f"{len(polys)} polygons exceed the 63-bit containment mask; "
                "use operators.spatial.bucketed_spatial_join for large polygon sets")
        bboxes = [
            (min(p[0] for p in ring), max(p[0] for p in ring),
             min(p[1] for p in ring), max(p[1] for p in ring))
            for ring in polys
        ]
        all_fields = [
            StructField(f"{prefix}lat", DoubleType(), True),
            StructField(f"{prefix}lon", DoubleType(), True),
            StructField(f"{prefix}alt", DoubleType(), True),
        ] + _RESULT_FIELDS + [
            StructField("meshcode", LongType(), False),
            StructField("quadkey", LongType(), False),
            StructField("poly_mask", LongType(), False),
        ]
        out_fields = _select_fields(all_fields, fields)
        names = [f.name for f in out_fields]
        want_mesh = "meshcode" in names
        want_quadkey = "quadkey" in names
        schema = StructType(out_fields)

        @_no_duplicate
        @F.pandas_udf(schema)
        def run(lat_s: pd.Series, lon_s: pd.Series, alt_s: pd.Series) -> pd.DataFrame:
            grid = bc.value
            la = lat_s.to_numpy(dtype=np.float64, na_value=np.nan)
            lo = lon_s.to_numpy(dtype=np.float64, na_value=np.nan)
            al = alt_s.to_numpy(dtype=np.float64, na_value=np.nan)
            out_la, out_lo, out_al, c = kernel.forward(la, lo, al, grid, strict_bounds=sb)
            cols: dict = {
                f"{prefix}lat": out_la,
                f"{prefix}lon": out_lo,
                f"{prefix}alt": out_al,
                "status": c.status.astype(np.int32),
                "err_meshcode": c.err_meshcode,
                "err_corner": c.err_corner.astype(np.int32),
            }
            if want_mesh:
                lat_d, lon_d, valid = mesh.point_to_digits(out_la, out_lo, unit, bounds)
                code = mesh.digits_to_meshcode(lat_d, lon_d)
                cols["meshcode"] = np.where(valid, code, -1)
            if want_quadkey:
                cols["quadkey"] = mesh.quadkey(out_la, out_lo, level)
            mask = np.zeros(la.shape[0], dtype=np.int64)
            for i, (ring, (la0, la1, lo0, lo1)) in enumerate(zip(polys, bboxes)):
                cand = (out_la >= la0) & (out_la <= la1) & (out_lo >= lo0) & (out_lo <= lo1)
                if cand.any():
                    h = np.zeros(la.shape[0], dtype=bool)
                    h[cand] = _crossings(out_la[cand], out_lo[cand], ring) == 1
                    mask |= h.astype(np.int64) << i
            cols["poly_mask"] = mask
            return pd.DataFrame({n: cols[n] for n in names})

        alt_col = F.col(alt) if alt is not None and alt in df.columns else F.lit(0.0)
        new_names = {f.name for f in out_fields}
        return _expand_struct(df, new_names,
                              run(F.col(lat), F.col(lon), alt_col))

    def roundtrip_verify(self, df: DataFrame, lat: str = "lat", lon: str = "lon",
                         alt: str | None = "alt") -> DataFrame:
        """Fused forward + Newton inverse + bit-identity check in ONE
        Arrow hop: per row, out = forward(p), back = backward(out), and
        ``roundtrip_exact`` = (back == p) bitwise.

        The production guardrail for a 100 TB run: transform the corpus
        and prove invertibility in the same pass (the reference's
        round-trip identity tests, trans.rs:1628-1644, as a streaming
        column instead of a test suite).
        """
        bc = self._bc
        sb = self.strict_bounds

        # TWO independent UDF structs so Catalyst can drop the one a
        # downstream projection never reads (it cannot prune fields
        # INSIDE one UDF struct): the verification verdict
        # (roundtrip_exact + status — the 100 TB guardrail columns, 5
        # bytes/row) separate from the transformed coordinates (24
        # bytes/row).  A guardrail-only consumer
        # (``.select(key, "roundtrip_exact", "status")``, the bench q8
        # shape) then ships one bool + one int through Arrow instead
        # of five columns; a consumer reading everything runs both
        # kernels (the duplicated forward+backward compute costs ~0.3
        # us/row — far below the Arrow write it would take to share).
        verdict_schema = StructType([
            StructField("roundtrip_exact", BooleanType(), True),
            StructField("status", IntegerType(), False),
        ])
        coords_schema = StructType([
            StructField("out_lat", DoubleType(), True),
            StructField("out_lon", DoubleType(), True),
            StructField("out_alt", DoubleType(), True),
        ])

        def _run(la, lo, al):
            grid = bc.value
            f_la, f_lo, f_al, fc = kernel.forward(la, lo, al, grid, strict_bounds=sb)
            b_la, b_lo, _, bc_res = kernel.backward(f_la, f_lo, f_al, grid, strict_bounds=sb)
            status = np.where(fc.status != 0, fc.status, bc_res.status).astype(np.int32)
            exact = (b_la == la) & (b_lo == lo) & (status == 0)
            return f_la, f_lo, f_al, exact, status

        def _np(s: pd.Series) -> np.ndarray:
            return s.to_numpy(dtype=np.float64, na_value=np.nan)

        @_no_duplicate
        @F.pandas_udf(verdict_schema)
        def run_verdict(lat_s: pd.Series, lon_s: pd.Series) -> pd.DataFrame:
            # the verdict is altitude-free (status comes from the
            # lat/lon cell resolves, exactness from the lat/lon bit
            # compare; altitude is a pure passthrough sum), so this
            # UDF does not reference the alt column and a
            # guardrail-only consumer ships 2 input doubles, not 3
            la = _np(lat_s)
            _, _, _, exact, status = _run(la, _np(lon_s), np.zeros(la.shape[0]))
            return pd.DataFrame({"roundtrip_exact": exact, "status": status})

        @_no_duplicate
        @F.pandas_udf(coords_schema)
        def run_coords(lat_s: pd.Series, lon_s: pd.Series, alt_s: pd.Series) -> pd.DataFrame:
            f_la, f_lo, f_al, _, _ = _run(_np(lat_s), _np(lon_s), _np(alt_s))
            return pd.DataFrame({"out_lat": f_la, "out_lon": f_lo, "out_alt": f_al})

        alt_col = F.col(alt) if alt is not None and alt in df.columns else F.lit(0.0)
        kept = [c for c in df.columns
                if c not in {"out_lat", "out_lon", "out_alt", "roundtrip_exact", "status"}]
        tmp_c, tmp_v = "_rc", "_rv"
        while tmp_c in df.columns:
            tmp_c += "_"
        while tmp_v in df.columns:
            tmp_v += "_"
        return (
            df.withColumn(tmp_c, run_coords(F.col(lat), F.col(lon), alt_col))
            .withColumn(tmp_v, run_verdict(F.col(lat), F.col(lon)))
            .select(*kept, f"{tmp_c}.*", f"{tmp_v}.*")
        )

    # -- validation (pure Column, JVM-side) -------------------------------

    @staticmethod
    def valid_point(lat_col, lon_col):
        """``Point::new`` bounds predicate (point.rs:212-223) as a pure
        Column — pushes down to the scan.

        NULL-safe: the leading isNotNull conjuncts force the predicate
        to FALSE (not NULL) for missing coordinates, so a
        failed-extraction row lands in the quarantine split instead of
        silently vanishing from both filter halves (filter(NULL) and
        filter(NOT NULL) each drop the row)."""
        lat_col, lon_col = F.col(lat_col), F.col(lon_col)
        return (
            lat_col.isNotNull()
            & lon_col.isNotNull()
            & lat_col.between(-90.0, 90.0)
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
        / coverage anti-joins).  LocalRelation-backed for broadcastable
        grids (localrel.py): zero-job broadcast builds per action."""
        from .localrel import local_rows_df

        return local_rows_df(
            self.spark,
            self.grid.to_rows(),
            schema="meshcode long, dlat_sec double, dlon_sec double, dalt_m double",
        )

    def statistics(self) -> dict:
        """Exact compensated grid statistics (transformer.rs:504-528)."""
        return self.grid.statistics()

    def statistics_df(self) -> DataFrame:
        """Distributed statistics twin (SURVEY §2.5) for parameter
        grids too large to collect: the same four components as
        ``Transformer::statistics`` computed with Spark aggregates —
        one shuffle on the 4-way component key.

        Caveats vs the exact path (documented, tested to agree within
        ~1e-12 relative on the fixture grids): plain double sums (not
        the reference's compensated ksum, transformer.rs:9-22);
        ``horizontal`` uses sqrt(a*a + b*b) rather than numpy's
        ulp-careful hypot.  The std keeps the reference's unusual
        total-based formula sqrt(ksum((sum - v)^2) / n)
        (transformer.rs:190-237).

        Determinism: the grid is coalesced to ONE partition so the
        sums accumulate in meshcode order — the same serial order the
        DuckDB oracle uses — making the output run-to-run stable.
        That is sound because parameter grids are small relative to
        the cluster by design (they broadcast; <= ~1M rows): a
        multi-partition window sum would be shuffle-fetch-order
        dependent and no rounding granularity truly fixes that.

        NaN grids: ``StatisticData::from_array`` early-returns all-NaN
        when the compensated total is NaN (transformer.rs:200-207).
        Spark's F.min/F.max sort NaN above every double, so without
        the explicit override below ``vmin`` would report the smallest
        *real* value of a NaN-containing component; the final select
        pins every stat of such a component to NaN for reference
        parity (ADVICE r02).
        """
        from pyspark.sql import Window

        melted = self.grid_df().coalesce(1).selectExpr(
            "stack(4, 'latitude', dlat_sec, 'longitude', dlon_sec, "
            "'altitude', dalt_m, "
            "'horizontal', sqrt(dlat_sec * dlat_sec + dlon_sec * dlon_sec)) "
            "AS (component, v)"
        )
        total = F.sum("v").over(Window.partitionBy("component"))
        agged = (
            melted.withColumn("total", total)
            .groupBy("component")
            .agg(
                F.count("v").cast("long").alias("n"),
                (F.max("total") / F.count("v")).alias("mean"),
                F.sqrt(F.sum((F.col("total") - F.col("v")) * (F.col("total") - F.col("v")))
                       / F.count("v")).alias("std"),
                (F.sum(F.abs(F.col("v"))) / F.count("v")).alias("abs_mean"),
                F.min("v").alias("vmin"),
                F.max("v").alias("vmax"),
            )
        )
        nan = F.lit(float("nan"))
        return agged.select(
            "component", "n",
            *[F.when(F.isnan(F.col("mean")), nan).otherwise(F.col(c)).alias(c)
              for c in ("mean", "std", "abs_mean", "vmin", "vmax")],
        )
