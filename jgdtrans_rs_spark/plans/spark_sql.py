"""JVM-only engine variant: the dual-dialect SQL builders run directly
on Spark SQL.

The Arrow-kernel engine (engine.py) is bound by the per-JVM Arrow
channel (~30 M simple rows/s through a scalar pandas_udf on this
build — BENCH/BASELINE.md saturation notes).  This variant executes
the exact same semantics as pure Spark SQL — the generators in
plans/oracle.py were written dual-dialect from day one — so the whole
transform stays inside whole-stage codegen: zero Python workers, no
Arrow serialization, and Catalyst is free to push filters below the
transform and prune columns through it.  On a 1000-executor cluster
this is the preferred path for the forward/tile hot loop; the Arrow
kernels remain the reference implementation and the only path with
the ulp-parity bump.

Caveat (documented in plans/oracle.py): the SQL digit path omits the
ulp-parity bump of coord.rs:271-275 (no float bit view in SQL), which
can differ from the kernel only for inputs within one ulp of a mesh
node boundary.  tests/test_sql_engine.py proves bit-identity to the
Arrow kernel path on the fixture inputs.

The parameter grid rides a broadcast-hinted temp view — the SQL twin
of the engine's ``sc.broadcast`` HashMap probe (par.rs:283-285): four
broadcast-hash joins, no shuffle.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..grid import MeshGrid
from ..localrel import local_rows_df
from . import oracle

_view_ids = itertools.count()


class SqlEngine:
    """Pure-SQL twin of ``engine.Engine`` for the SQL-expressible
    operators (forward / backward_compat / backward Newton / tiling /
    cell position)."""

    def __init__(self, spark: SparkSession, grid: MeshGrid, grid_view: str | None = None):
        self.spark = spark
        self.grid = grid
        self.unit = grid.mesh_unit
        self.grid_view = grid_view or f"_mesh_grid_{next(_view_ids)}"
        # LocalRelation-backed for broadcastable grids (localrel.py):
        # each downstream ACTION rebuilds the corner-join broadcasts,
        # and over a pickled-RDD frame every build is a full job of
        # ~defaultParallelism tiny tasks — measured ~0.25 s of every
        # q1s action at local[32]; a LocalRelation build is job-free
        gdf = local_rows_df(
            spark, grid.to_rows(),
            schema="meshcode long, dlat_sec double, dlon_sec double, dalt_m double",
        )
        # the broadcast hint is part of the view's logical plan, so every
        # corner join below becomes a BroadcastHashJoin (no shuffle)
        gdf.hint("broadcast").createOrReplaceTempView(self.grid_view)
        self.grid_rel = (
            f"(SELECT meshcode, dlat_sec, dlon_sec, dalt_m FROM {self.grid_view})"
        )

    def _input_rel(self, df: DataFrame) -> str:
        # fixed per-engine name, replaced per call: spark.sql analyzes
        # (and resolves the view) eagerly, so later replacement cannot
        # disturb previously built DataFrames — and the session catalog
        # stays bounded instead of accreting one view per call
        name = f"{self.grid_view}_in"
        df.createOrReplaceTempView(name)
        return name

    def forward(self, df: DataFrame, key: str = "pkey") -> DataFrame:
        """``Transformer::forward`` (trans.rs:134-136), JVM-only."""
        return self.spark.sql(
            oracle.forward_sql(self._input_rel(df), self.grid_rel, self.unit, key))

    def forward_corr(self, df: DataFrame, key: str = "pkey") -> DataFrame:
        return self.spark.sql(
            oracle.forward_corr_only_sql(self._input_rel(df), self.grid_rel, self.unit, key))

    def backward_compat(self, df: DataFrame, key: str = "pkey") -> DataFrame:
        """``Transformer::backward_compat`` (trans.rs:179-181)."""
        return self.spark.sql(
            oracle.backward_compat_sql(self._input_rel(df), self.grid_rel, self.unit, key))

    def backward(self, df: DataFrame, key: str = "pkey") -> DataFrame:
        """Verified Newton inverse (trans.rs:556-672) as 4 unrolled SQL
        iterations with per-lane freezing.

        Each iteration is composed through a temp view (the fully
        inlined 4-iteration tree exceeds Spark's analyzer fixed-point
        budget) and the plan is CUT with a lazy ``localCheckpoint``
        after every iteration: through purely logical views Catalyst
        re-inlines the whole upstream into each stage and spends ~12 s
        per action re-optimizing the composed tree (measured at sf0.1
        in r06 — the optimizer, not the 20 grid joins, was >90% of the
        query; guide §3.3 'very large plans: planning time itself can
        become the bottleneck').  The checkpoint materializes each
        iteration's ~20-column state once per action instead — 15.6 s
        -> ~1.5 s noop — and block cleanup rides the ContextCleaner
        when the returned DataFrame is dropped.  Results are
        bit-identical: the per-stage SQL is unchanged, only the plan
        boundary moves."""
        stages = oracle.backward_newton_stages(
            self._input_rel(df), self.grid_rel, self.unit, key)
        state = self.spark.sql(stages[0])
        last = len(stages) - 2
        for i, st in enumerate(stages[1:]):
            name = f"{self.grid_view}_newton_{i}"  # fixed names, see _input_rel
            state.createOrReplaceTempView(name)
            state = self.spark.sql(st.replace("__STATE__", name))
            if i < last:
                state = state.localCheckpoint(eager=False)
        return state

    def assign_tiles(self, df: DataFrame, level: int = 15, key: str = "pkey") -> DataFrame:
        """meshcode + quadkey tile assignment, JVM-only (floor digit
        path — no ulp bump)."""
        return self.spark.sql(
            oracle.tile_sql(self._input_rel(df), self.unit, level, key))

    def cell_position(self, df: DataFrame, key: str = "pkey") -> DataFrame:
        return self.spark.sql(
            oracle.cell_position_sql(self._input_rel(df), self.unit, key))

    def transform_pip(self, df: DataFrame, polygons, key: str = "pkey") -> DataFrame:
        """JVM-only fused forward transform + point-in-polygon spatial
        join -> (key, poly_id) hit pairs: the headline chain with ZERO
        Python workers — whole-stage codegen end to end, so it rides
        the JVM scaling curve instead of the Arrow channel.

        The polygon edges are an inline VALUES relation (tiny ->
        Catalyst broadcasts it); containment is the same crossing-
        number edge-parity SQL the DuckDB oracle runs
        (oracle.point_in_polygon_sql — identical float64 op order, so
        the output is engine-independent).

        The (key, lat, lon) probe input is PERSISTED before the join:
        the nested-loop probe evaluates its condition once per
        (point, edge) pair, and through a purely logical view Catalyst
        inlines the transform's output expressions (bilinear CASE +
        wrapping normalize) into that condition — measured 3.2 s vs
        1.2 s at 600k x 20 edges once the normalize landed.  The
        cached projection is 3 columns; at corpus scale this is the
        stage boundary you would materialize anyway (the transform
        output IS the dataset being spatially joined)."""
        from ..operators.spatial import _ring_parity_col

        fwd = self.forward(df, key)
        name = f"{self.grid_view}_fwd"  # fixed name, see _input_rel
        fwd.createOrReplaceTempView(name)
        ok = self.spark.sql(
            f"SELECT {key}, out_lat AS lat, out_lon AS lon "
            f"FROM {name} WHERE status = 0").persist()
        # Containment as one codegen filter per polygon over the cached
        # projection, unioned — value-identical to the oracle's
        # edge-relation form (point_in_polygon_sql: identical float64
        # edge formula via _ring_parity_col; a point outside a
        # polygon's bbox always has even parity, so the short-circuit
        # bbox conjunct cannot change the verdict).  The r06 rewrite:
        # the previous BroadcastNestedLoopJoin against the edge VALUES
        # relation evaluated the crossing predicate row-at-a-time per
        # (point, edge) and shuffled the crossing pairs into a
        # COUNT/parity aggregation; this form has no join and no
        # aggregation Exchange at all (guide §2.4).
        lat, lon = F.col("lat"), F.col("lon")
        out = None
        for pid, ring in polygons:
            r = [(float(a), float(b)) for a, b in ring]
            la0, la1 = min(p[0] for p in r), max(p[0] for p in r)
            lo0, lo1 = min(p[1] for p in r), max(p[1] for p in r)
            inside = (
                (lat >= la0) & (lat <= la1) & (lon >= lo0) & (lon <= lo1)
                & _ring_parity_col(r, lat, lon)
            )
            branch = ok.filter(inside).select(
                key, F.lit(pid).alias("poly_id"))
            out = branch if out is None else out.unionByName(branch)
        if out is None:
            return ok.select(key).limit(0).withColumn(
                "poly_id", F.lit(None).cast("string"))
        return out
