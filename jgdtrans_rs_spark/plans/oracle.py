"""ANSI-SQL generators mirroring the engine's kernels bit-for-bit.

These emit plain SQL (runnable by DuckDB *and* Spark SQL) that
reproduces the numpy kernels' float64 arithmetic in the exact same
operation order, so a value-hash comparison of engine output vs oracle
output succeeds exactly:

* mesh digits: floor-based extraction (coord.rs:203-229).  The SQL
  path intentionally omits the ulp-parity bump of coord.rs:271-275 (no
  float bit view in SQL) — it only matters for inputs sitting within
  one ulp of a node boundary, which the deterministic synthetic inputs
  never do.
* Newton DIVERGED-lane error attribution — CLOSED in round 5: the
  verify corr of every iteration now runs the reference's UNCHECKED
  MeshCode path in SQL too (corr_sql(newton_verify=True) over
  digits_select_unchecked — saturating f64-as-u32, u32 wrap, as-u8
  truncation), so an iterate that left the domain fails as
  ParameterNotFound with the bit-identical digit-wrapped meshcode,
  never OutOfBounds; the next iteration's checked prepare verdict
  (kernel._rebound_cell) rides along as status_p/ec_p/eco_p.
  Pinned on the crafted pathological grid by BOTH arms of
  test_newton_verify_unchecked_parity (kernel + DuckDB SQL).
* node degrees: the pinned two-step rounding ``t*(1/80) + (s*0.125 + f)``
  (coord.rs:322-326).
* bilinear: ``sw*(mx*my) + (se*(x*my) + (nw*(mx*y) + ne*x*y))``
  (trans.rs:10-19, non-fma path).

Every numeric literal carries an ``e0`` exponent so both Spark SQL and
DuckDB type it DOUBLE — bare decimals parse as DECIMAL in both engines
and would silently change the rounding behaviour.
"""

from __future__ import annotations

UNIT_BOUND = {1: 9, 5: 5}

# ---------------------------------------------------------------------------
# Synthetic geotagged points, derived deterministically from the orders
# table (so both engines see identical input doubles).  Distribution per
# FIXTURES.md: 70% inside the SemiDynaEXE fixture cell, 10% Iwo-Jima-ish
# (in mesh domain but absent from the grid -> PARAMETER_NOT_FOUND), 10%
# one hot cell (skew), 10% out of the mesh domain (OUT_OF_BOUNDS).
# ---------------------------------------------------------------------------

POINTS_LAT_EXPR = (
    "CASE WHEN k % 10 = 9 THEN 2.0e0 + (k % 100) / 50.0e0 "
    "WHEN k % 10 = 8 THEN 36.090125e0 "
    "WHEN k % 10 = 7 THEN 24.77e0 + (k % 50) / 5000.0e0 "
    "ELSE 36.084e0 + ((k * 7919) % 9973) / 9973.0e0 * 0.04e0 END"
)
POINTS_LON_EXPR = (
    "CASE WHEN k % 10 = 9 THEN 3.0e0 + (k % 100) / 50.0e0 "
    "WHEN k % 10 = 8 THEN 140.071875e0 "
    "WHEN k % 10 = 7 THEN 141.30e0 + (k % 50) / 5000.0e0 "
    "ELSE 140.063e0 + ((k * 104729) % 9973) / 9973.0e0 * 0.06e0 END"
)
POINTS_ALT_EXPR = "(k % 1000) / 100.0e0"


def points_sql(orders: str = "orders") -> str:
    """Deterministic geotagged point set keyed by o_orderkey."""
    return (
        "SELECT k AS pkey, "
        f"{POINTS_LAT_EXPR} AS lat, {POINTS_LON_EXPR} AS lon, {POINTS_ALT_EXPR} AS alt "
        f"FROM (SELECT o_orderkey AS k FROM {orders}) _pk"
    )


def grid_values(rows: list[tuple]) -> str:
    """Inline un-aliased VALUES relation for a (small) parameter grid —
    corr_sql aliases it per corner join."""
    vals = ", ".join(
        f"({int(c)}, CAST({a!r} AS DOUBLE), CAST({b!r} AS DOUBLE), CAST({h!r} AS DOUBLE))"
        for c, a, b, h in rows
    )
    return f"(VALUES {vals})"


# ---------------------------------------------------------------------------
# Mesh digit / meshcode fragments
# ---------------------------------------------------------------------------

def _u32sat(e: str) -> str:
    """Rust's saturating ``f64 as u32`` of floor(e) as dual-dialect SQL
    (mesh._floor_as_u32 twin): NaN -> 0, -inf/negative -> 0,
    +inf/huge -> u32::MAX.  isnan() is the ONLY portable NaN test here
    — both engines treat NaN as equal to itself AND greater than every
    number, so neither ``e <> e`` nor ``e > 0`` can distinguish it."""
    return (f"CAST(CASE WHEN isnan({e}) THEN 0.0e0 "
            f"ELSE LEAST(GREATEST(floor({e}), 0.0e0), 4294967295.0e0) END AS BIGINT)")


def _pm32(e: str) -> str:
    """u32 wrap of an int64 expression (numpy ``% 2**32`` with
    Python-sign semantics, mesh.value_to_digits twin): both engines'
    native ``%`` follows the dividend's sign, so the wrap is explicit."""
    return f"((({e}) % 4294967296 + 4294967296) % 4294967296)"


def digits_select_unchecked(lat: str = "lat", lon: str = "lon",
                            unit: int = 5) -> str:
    """digits_select twin for the UNCHECKED MeshCode path
    (code.rs:16-57 / mesh.value_to_digits out-of-domain semantics):
    saturating f64-as-u32 casts, u32 wrap on the second/third digit
    arithmetic, final as-u8 truncation (mod 256).  In-domain values
    take none of the saturation/wrap branches, so checked and
    unchecked digits agree wherever mesh_valid is true; mesh_valid
    itself still tests the raw values (the Newton loop's REBOUND view
    needs it for the next iteration's checked prepare)."""
    third_lat = "(flat3r % 256)" if unit == 1 else "(CASE WHEN flat3r < 5 THEN 0 ELSE 5 END)"
    third_lon = "(flon3r % 256)" if unit == 1 else "(CASE WHEN flon3r < 5 THEN 0 ELSE 5 END)"
    return f"""
      SELECT *,
             {third_lat} AS lat3,
             {third_lon} AS lon3,
             (lat2u % 256) AS lat2,
             (lon2u % 256) AS lon2,
             (latv >= 0.0e0 AND latv < 100.0e0 AND {lon} >= 100.0e0 AND {lon} < 180.0e0) AS mesh_valid
      FROM (
        SELECT *,
               (ilat % 100) AS lat1,
               {_pm32(f"{_u32sat('80.0e0 * latv')} - 80 * ilat - 10 * lat2u")} AS flat3r,
               (ilon % 100) AS lon1,
               {_pm32(f"{_u32sat('80.0e0 * lonv')} - 80 * ilon - 10 * lon2u")} AS flon3r
        FROM (
          SELECT *,
                 {_pm32(f"{_u32sat('8.0e0 * latv')} - 8 * ilat")} AS lat2u,
                 {_pm32(f"{_u32sat('8.0e0 * lonv')} - 8 * ilon")} AS lon2u
          FROM (
            SELECT *,
                   {_u32sat('latv')} AS ilat,
                   {_u32sat('lonv')} AS ilon
            FROM (
              SELECT *,
                     3.0e0 * {lat} / 2.0e0 AS latv,
                     {lon} AS lonv
              FROM __IN__
            ) _v0
          ) _i
        ) _s
      ) _d
    """


def digits_select(lat: str = "lat", lon: str = "lon", unit: int = 5) -> str:
    """SELECT-list fragment computing digit columns + validity for the
    south-west node of the containing cell (code.rs:16-57).

    Digit math runs over finite-guarded twins (latv_f / lonv_f: NaN
    and Inf become 0.0, finite magnitude clamped to 1e15) so one
    non-finite coordinate cannot abort the whole oracle statement —
    DuckDB hard-errors on CAST(NaN AS BIGINT) while Spark yields 0.
    Validity (mesh_valid) still tests the RAW values, so guarded lanes
    are always invalid and their digits never surface (digits of
    invalid lanes are unspecified, as in the numpy kernels)."""
    third_lat = "(flat3r)" if unit == 1 else "(CASE WHEN flat3r < 5 THEN 0 ELSE 5 END)"
    third_lon = "(flon3r)" if unit == 1 else "(CASE WHEN flon3r < 5 THEN 0 ELSE 5 END)"
    return f"""
      SELECT *,
             {third_lat} AS lat3,
             {third_lon} AS lon3,
             (latv >= 0.0e0 AND latv < 100.0e0 AND {lon} >= 100.0e0 AND {lon} < 180.0e0) AS mesh_valid
      FROM (
        SELECT *,
               (ilat % 100) AS lat1,
               (CAST(floor(8.0e0 * latv_f) AS BIGINT) - 8 * ilat) AS lat2,
               (CAST(floor(80.0e0 * latv_f) AS BIGINT) - 80 * ilat - 10 * (CAST(floor(8.0e0 * latv_f) AS BIGINT) - 8 * ilat)) AS flat3r,
               (ilon % 100) AS lon1,
               (CAST(floor(8.0e0 * lonv_f) AS BIGINT) - 8 * ilon) AS lon2,
               (CAST(floor(80.0e0 * lonv_f) AS BIGINT) - 80 * ilon - 10 * (CAST(floor(8.0e0 * lonv_f) AS BIGINT) - 8 * ilon)) AS flon3r
        FROM (
          SELECT *,
                 CAST(floor(latv_f) AS BIGINT) AS ilat,
                 CAST(floor(lonv_f) AS BIGINT) AS ilon
          FROM (
            SELECT *,
                   CASE WHEN latv - latv = 0.0e0
                        THEN LEAST(GREATEST(latv, -1.0e15), 1.0e15)
                        ELSE 0.0e0 END AS latv_f,
                   CASE WHEN lonv - lonv = 0.0e0
                        THEN LEAST(GREATEST(lonv, -1.0e15), 1.0e15)
                        ELSE 0.0e0 END AS lonv_f
            FROM (
              SELECT *,
                     3.0e0 * {lat} / 2.0e0 AS latv,
                     {lon} AS lonv
              FROM __IN__
            ) _v0
          ) _v
        ) _i
      ) _d
    """


def _carry_up(f: str, s: str, t: str, unit: int) -> tuple[str, str, str]:
    """One tile step up with digit carry (code.rs:100-140) as CASE text."""
    bound = UNIT_BOUND[unit]
    nt = f"(CASE WHEN {t} = {bound} THEN 0 ELSE {t} + {unit} END)"
    ns = f"(CASE WHEN {t} = {bound} THEN (CASE WHEN {s} = 7 THEN 0 ELSE {s} + 1 END) ELSE {s} END)"
    nf = f"(CASE WHEN {t} = {bound} AND {s} = 7 THEN {f} + 1 ELSE {f} END)"
    return nf, ns, nt


def _carry_down(f: str, s: str, t: str, unit: int) -> tuple[str, str, str]:
    """One tile step down with digit borrow (coord.rs:466-514) as CASE
    text; first may go to -1 (caller filters with the validity expr)."""
    bound = UNIT_BOUND[unit]
    nt = f"(CASE WHEN {t} = 0 THEN {bound} ELSE {t} - {unit} END)"
    ns = f"(CASE WHEN {t} = 0 THEN (CASE WHEN {s} = 0 THEN 7 ELSE {s} - 1 END) ELSE {s} END)"
    nf = f"(CASE WHEN {t} = 0 AND {s} = 0 THEN {f} - 1 ELSE {f} END)"
    return nf, ns, nt


def _code(fla: str, sla: str, tla: str, flo: str, slo: str, tlo: str) -> str:
    return (
        f"(({fla} * 100 + {flo}) * 10000 + ({sla} * 10 + {slo}) * 100 + ({tla} * 10 + {tlo}))"
    )


def corners_select(unit: int) -> str:
    """Adds sw/se/nw/ne meshcode columns to a digit relation."""
    nlo = _carry_up("lon1", "lon2", "lon3", unit)
    nla = _carry_up("lat1", "lat2", "lat3", unit)
    sw = _code("lat1", "lat2", "lat3", "lon1", "lon2", "lon3")
    se = _code("lat1", "lat2", "lat3", *nlo)
    nw = _code(*nla, "lon1", "lon2", "lon3")
    ne = _code(*nla, *nlo)
    return f"""
      SELECT *, {sw} AS sw_code, {se} AS se_code, {nw} AS nw_code, {ne} AS ne_code
      FROM __IN__
    """


def node_lat_expr(f: str, s: str, t: str) -> str:
    """to_latitude with pinned rounding (coord.rs:322-353)."""
    return f"(2.0e0 * ({t} * (1.0e0 / 80.0e0) + ({s} * 0.125e0 + {f})) / 3.0e0)"


def node_lon_expr(f: str, s: str, t: str) -> str:
    """to_longitude (coord.rs:376-380)."""
    return f"(100.0e0 + ({t} * (1.0e0 / 80.0e0) + ({s} * 0.125e0 + {f})))"


def position_select(lat: str, lon: str, unit: int) -> str:
    """Cell-local (y, x) columns (cell.rs:483-491 / code.rs:86-96)."""
    ky, kx = ("120.0e0", "80.0e0") if unit == 1 else ("24.0e0", "16.0e0")
    swlat = node_lat_expr("lat1", "lat2", "lat3")
    swlon = node_lon_expr("lon1", "lon2", "lon3")
    return f"""
      SELECT *, {ky} * ({lat} - {swlat}) AS pos_y, {kx} * ({lon} - {swlon}) AS pos_x
      FROM __IN__
    """


def bilinear_expr(sw: str, se: str, nw: str, ne: str, y: str = "pos_y", x: str = "pos_x") -> str:
    """trans.rs:10-19 non-fma nesting, verbatim association."""
    return (
        f"({sw} * ((1.0e0 - {x}) * (1.0e0 - {y})) + "
        f"({se} * ({x} * (1.0e0 - {y})) + "
        f"({nw} * ((1.0e0 - {x}) * {y}) + {ne} * {x} * {y})))"
    )


def norm_lat_expr(e: str, s: str | None = None) -> str:
    """``normalize_latitude`` (point.rs:9-19) as a dual-dialect SQL
    expression — ``%`` on doubles is fmod (sign of dividend) in BOTH
    Spark SQL and DuckDB.  Every Point+Correction add in the SQL twins
    runs through this (the kernels' _add_normalized), so outputs match
    bit-for-bit at the lat/lon wrap edges too; in-range values take
    the identity branch.  The sign CASE vs the reference's copysign
    differs only at s == -0.0, which cannot reach the wrapping
    branches (they require |s| > 90).

    PERF: pass ``e`` (and ideally ``s`` = e % 360) as plain COLUMN
    references precomputed in an inner projection, not compound
    expressions — the CASE references them ~8x, and inlining a large
    expression that many times pushed the whole stage past Spark's
    codegen limits (plan fell back to interpreted: measured 0.35 s ->
    2.2 s at sf0.1 before the _add_normalized_select staging)."""
    s = s or f"({e} % 360.0e0)"
    return f"""
      CASE WHEN isnan({e}) OR ({e} >= -90.0e0 AND {e} <= 90.0e0) THEN {e}
           WHEN NOT ({s} >= -270.0e0 AND {s} <= 270.0e0)
             THEN {s} - (CASE WHEN {s} >= 0.0e0 THEN 360.0e0 ELSE -360.0e0 END)
           WHEN NOT ({s} >= -90.0e0 AND {s} <= 90.0e0)
             THEN (CASE WHEN {s} >= 0.0e0 THEN 180.0e0 ELSE -180.0e0 END) - {s}
           ELSE {s} END"""


def norm_lon_expr(e: str, s: str | None = None) -> str:
    """``normalize_longitude`` (point.rs:23-32), dual-dialect (see
    norm_lat_expr for the column-reference performance contract)."""
    s = s or f"({e} % 360.0e0)"
    return f"""
      CASE WHEN isnan({e}) OR ({e} >= -180.0e0 AND {e} <= 180.0e0) THEN {e}
           WHEN NOT ({s} >= -180.0e0 AND {s} < 180.0e0)
             THEN {s} - (CASE WHEN {s} >= 0.0e0 THEN 360.0e0 ELSE -360.0e0 END)
           ELSE {s} END"""


def _add_normalized_select(inner: str, lat_add: str, lon_add: str,
                           keep: str, out_lat: str, out_lon: str,
                           guard: str = "status = 0") -> str:
    """``Point + Correction`` with wrapping normalize (the kernels'
    _add_normalized) as a two-level SELECT: the adds and their moduli
    are computed ONCE as inner columns, the outer normalize CASEs
    reference only those attributes (codegen stays alive — see
    norm_lat_expr).  ``keep`` = passthrough output columns."""
    return f"""
      SELECT {keep},
             CASE WHEN {guard} THEN {norm_lat_expr('_nla', '_nsla')} END AS {out_lat},
             CASE WHEN {guard} THEN {norm_lon_expr('_nlo', '_nslo')} END AS {out_lon}
      FROM (
        SELECT *, ({lat_add}) AS _nla, ({lat_add}) % 360.0e0 AS _nsla,
               ({lon_add}) AS _nlo, ({lon_add}) % 360.0e0 AS _nslo
        FROM {inner}
      ) _nrm
    """


def _pipe(*stages: str) -> str:
    """Chain stage templates: each stage's __IN__ is the previous stage."""
    out = stages[0]
    for st in stages[1:]:
        out = st.replace("__IN__", f"({out})")
    return out


def corr_sql(input_rel: str, grid_rel: str, unit: int,
             lat: str = "lat", lon: str = "lon",
             expose_params: bool = False,
             newton_verify: bool = False) -> str:
    """forward_corr (trans.rs:428-451) over ``input_rel`` (an aliased
    relation with ``lat``/``lon`` + passthrough columns), joined against
    ``grid_rel`` (un-aliased; columns meshcode, dlat_sec, dlon_sec,
    dalt_m assigned per corner).

    Emits the input columns + dlat_deg/dlon_deg/dalt_m (NULL unless
    OK) + status/err_meshcode/err_corner.

    ``newton_verify=True`` is the UNCHECKED twin for the Newton verify
    step (trans.rs:657-668 — kernel._resolve_cell with
    bounds='unchecked'): digits come from digits_select_unchecked
    (saturate + wrap, so a diverged iterate fails as ParameterNotFound
    with the digit-WRAPPED meshcode, never OutOfBounds), the corner
    joins probe regardless of validity, values are computed whenever
    all four corners are found, and status/err_* carry the VERIFY
    verdict (no OOB lane).  The CHECKED verdict for the next
    iteration's prepare (kernel._rebound_cell) is additionally emitted
    as status_p/ec_p/eco_p — OOB when out of bounds (no meshcode
    attribution), else the same missing-corner classes (in-domain
    unchecked digits equal checked digits, so those codes agree).
    This closes the r03/r04 documented divergence: SQL-Newton now
    reports diverged lanes exactly like the kernel
    (test_newton_verify_unchecked_parity's SQL arm).
    """
    dig = (digits_select_unchecked(lat, lon, unit) if newton_verify
           else digits_select(lat, lon, unit))
    cells = _pipe(
        dig.replace("__IN__", input_rel),
        corners_select(unit),
        position_select(lat, lon, unit),
    )
    b_lat = bilinear_expr("psw.dlat_sec", "pse.dlat_sec", "pnw.dlat_sec", "pne.dlat_sec")
    b_lon = bilinear_expr("psw.dlon_sec", "pse.dlon_sec", "pnw.dlon_sec", "pne.dlon_sec")
    b_alt = bilinear_expr("psw.dalt_m", "pse.dalt_m", "pnw.dalt_m", "pne.dalt_m")
    found = ("psw.meshcode IS NOT NULL AND pse.meshcode IS NOT NULL "
             "AND pnw.meshcode IS NOT NULL AND pne.meshcode IS NOT NULL")
    ok = found if newton_verify else f"c.mesh_valid AND {found}"
    params_cols = ""
    if expose_params:
        # corner parameter values for the Newton Jacobian
        params_cols = "".join(
            f", p{c}.dlat_sec AS {c}_lat_sec, p{c}.dlon_sec AS {c}_lon_sec"
            for c in ("sw", "se", "nw", "ne")
        )
    # error priority: OOB, then first missing corner sw, se, nw, ne
    # (trans.rs:76-87)
    pnf_status = """CASE WHEN psw.meshcode IS NULL OR pse.meshcode IS NULL
                    OR pnw.meshcode IS NULL OR pne.meshcode IS NULL THEN 2
                  ELSE 0 END"""
    pnf_code = """CASE WHEN psw.meshcode IS NULL THEN c.sw_code
                  WHEN pse.meshcode IS NULL THEN c.se_code
                  WHEN pnw.meshcode IS NULL THEN c.nw_code
                  WHEN pne.meshcode IS NULL THEN c.ne_code
                  ELSE -1 END"""
    pnf_corner = """CASE WHEN psw.meshcode IS NULL THEN 0
                  WHEN pse.meshcode IS NULL THEN 1
                  WHEN pnw.meshcode IS NULL THEN 2
                  WHEN pne.meshcode IS NULL THEN 3
                  ELSE -1 END"""
    if newton_verify:
        status_cols = f"""
             CAST({pnf_status} AS INTEGER) AS status,
             CAST({pnf_code} AS BIGINT) AS err_meshcode,
             CAST({pnf_corner} AS INTEGER) AS err_corner,
             CAST(CASE WHEN NOT c.mesh_valid THEN 1 ELSE {pnf_status} END AS INTEGER) AS status_p,
             CAST(CASE WHEN NOT c.mesh_valid THEN -1 ELSE {pnf_code} END AS BIGINT) AS ec_p,
             CAST(CASE WHEN NOT c.mesh_valid THEN -1 ELSE {pnf_corner} END AS INTEGER) AS eco_p"""
        join_on = ""
    else:
        status_cols = f"""
             CAST(CASE WHEN NOT c.mesh_valid THEN 1 ELSE {pnf_status} END AS INTEGER) AS status,
             CAST(CASE WHEN NOT c.mesh_valid THEN -1 ELSE {pnf_code} END AS BIGINT) AS err_meshcode,
             CAST(CASE WHEN NOT c.mesh_valid THEN -1 ELSE {pnf_corner} END AS INTEGER) AS err_corner"""
        join_on = "c.mesh_valid AND "
    return f"""
      SELECT c.*{params_cols},
             CASE WHEN {ok} THEN {b_lat} / 3600.0e0 END AS dlat_deg,
             CASE WHEN {ok} THEN {b_lon} / 3600.0e0 END AS dlon_deg,
             CASE WHEN {ok} THEN {b_alt} END AS dalt_m,
             {status_cols}
      FROM ({cells}) c
      LEFT JOIN {grid_rel} AS psw(meshcode, dlat_sec, dlon_sec, dalt_m) ON {join_on}psw.meshcode = c.sw_code
      LEFT JOIN {grid_rel} AS pse(meshcode, dlat_sec, dlon_sec, dalt_m) ON {join_on}pse.meshcode = c.se_code
      LEFT JOIN {grid_rel} AS pnw(meshcode, dlat_sec, dlon_sec, dalt_m) ON {join_on}pnw.meshcode = c.nw_code
      LEFT JOIN {grid_rel} AS pne(meshcode, dlat_sec, dlon_sec, dalt_m) ON {join_on}pne.meshcode = c.ne_code
    """


def forward_sql(input_rel: str, grid_rel: str, unit: int, key: str = "pkey") -> str:
    """Full forward transform: point + corr (trans.rs:134-136).

    Output: (key, out_lat, out_lon, out_alt, status, err_meshcode,
    err_corner); coordinate outputs NULL unless status = 0.
    """
    c = corr_sql(input_rel, grid_rel, unit)
    keep = (f"{key}, CASE WHEN status = 0 THEN alt + dalt_m END AS out_alt, "
            "status, err_meshcode, err_corner")
    return _add_normalized_select(
        f"({c}) _fwd", "lat + dlat_deg", "lon + dlon_deg",
        keep=keep, out_lat="out_lat", out_lon="out_lon")


def forward_corr_only_sql(input_rel: str, grid_rel: str, unit: int, key: str = "pkey") -> str:
    c = corr_sql(input_rel, grid_rel, unit)
    return f"""
      SELECT {key}, dlat_deg, dlon_deg, dalt_m, status, err_meshcode, err_corner
      FROM ({c}) _fc
    """


def backward_compat_sql(input_rel: str, grid_rel: str, unit: int, key: str = "pkey") -> str:
    """backward_compat (trans.rs:491-512): two chained forward_corr
    evaluations; first failure wins.

    ``lat - (1.0/300.0)`` is bit-identical to the kernel's
    ``lat + (-DELTA)`` (negation and subtraction are exact)."""
    temporal = _add_normalized_select(
        f"(SELECT pkey, lat AS q_lat, lon AS q_lon, alt AS q_alt "
        f"FROM {input_rel}) _t0",
        "q_lat - (1.0e0 / 300.0e0)", "q_lon + (1.0e0 / 300.0e0)",
        keep="pkey, q_lat, q_lon, q_alt",
        out_lat="lat", out_lon="lon", guard="TRUE")
    c1 = corr_sql(f"({temporal}) _t1", grid_rel, unit)
    ref = _add_normalized_select(
        f"({c1}) _r0", "q_lat - dlat_deg", "q_lon - dlon_deg",
        keep=("pkey, q_lat, q_lon, q_alt, status AS status1, "
              "err_meshcode AS err_meshcode1, err_corner AS err_corner1"),
        out_lat="lat", out_lon="lon", guard="TRUE")
    c2 = corr_sql(f"({ref}) _r1", grid_rel, unit)
    keep = ("pkey, "
            "CASE WHEN status1 = 0 AND status = 0 THEN q_alt - dalt_m END AS out_alt, "
            "CAST(CASE WHEN status1 <> 0 THEN status1 ELSE status END AS INTEGER) AS status, "
            "CAST(CASE WHEN status1 <> 0 THEN err_meshcode1 ELSE err_meshcode END AS BIGINT) AS err_meshcode, "
            "CAST(CASE WHEN status1 <> 0 THEN err_corner1 ELSE err_corner END AS INTEGER) AS err_corner")
    return _add_normalized_select(
        f"({c2}) _bc", "q_lat - dlat_deg", "q_lon - dlon_deg",
        keep=keep, out_lat="out_lat", out_lon="out_lon",
        guard="status1 = 0 AND status = 0")


STATE_COLS = ("q_lat, q_lon, q_alt, done, st, e_code, e_corner, "
              "o_dlat, o_dlon, o_dalt, yn, xn")
# prepare-corr columns carried in the state: the correction, its
# status, and the 4-corner parameters for the Jacobian — renamed from
# a corr_sql(expose_params=True) output
PREP_COLS = """dlat_deg AS corr_y, dlon_deg AS corr_x,
             status AS st1, err_meshcode AS ec1, err_corner AS eco1,
             sw_lat_sec AS swla, se_lat_sec AS sela,
             nw_lat_sec AS nwla, ne_lat_sec AS nela,
             sw_lon_sec AS swlo, se_lon_sec AS selo,
             nw_lon_sec AS nwlo, ne_lon_sec AS nelo"""

# the verify corr's next-prepare verdict is the CHECKED (rebound) view
# — status_p/ec_p/eco_p (kernel._rebound_cell), while status/err_*
# carry the unchecked verify verdict consumed in this iteration
PREP_COLS_V = """dlat_deg AS corr_y, dlon_deg AS corr_x,
             status_p AS st1, ec_p AS ec1, eco_p AS eco1,
             sw_lat_sec AS swla, se_lat_sec AS sela,
             nw_lat_sec AS nwla, ne_lat_sec AS nela,
             sw_lon_sec AS swlo, se_lon_sec AS selo,
             nw_lon_sec AS nwlo, ne_lon_sec AS nelo"""


def backward_newton_stages(input_rel: str, grid_rel: str, unit: int,
                           key: str = "pkey", iterations: int = 4) -> list[str]:
    """The Newton inverse as composable stages: element 0 is the
    initial state + prepare-corr over ``input_rel``; element i is
    iteration i's SQL with ``__STATE__`` standing for the previous
    stage's relation; the last element is the output projection.

    Each iteration runs ONE corr (at the updated iterate) and carries
    it as the next iteration's prepare values — the verification
    resolve of iteration i is at the same point as the preparation
    resolve of iteration i+1, exactly the carry the numpy kernel uses
    (kernel.backward_corr).  20 grid joins total instead of 32.

    backward_newton_sql inlines the chain into ONE statement (the
    DuckDB oracle path); plans/spark_sql.py materializes each stage as
    a temp view instead, because the fully inlined tree exceeds
    Spark's analyzer fixed-point budget.
    """
    stages = [_newton_state0(input_rel, key), _newton_prep0(grid_rel, unit, key)]
    for i in range(iterations):
        stages.append(_newton_iteration(grid_rel, unit, key, i))
    stages.append(_add_normalized_select(
        "__STATE__", "q_lat + o_dlat", "q_lon + o_dlon",
        keep=(f"{key}, CASE WHEN st = 0 THEN q_alt + o_dalt END AS out_alt, "
              "st AS status, e_code AS err_meshcode, e_corner AS err_corner"),
        out_lat="out_lat", out_lon="out_lon", guard="st = 0"))
    return stages


def backward_newton_sql(input_rel: str, grid_rel: str, unit: int,
                        key: str = "pkey", iterations: int = 4) -> str:
    """Verified backward transform (trans.rs:556-672) as fully
    unrolled SQL: per iteration, Jacobian from the carried
    prepare-corr, Newton update, one corr at the updated iterate
    (doubling as verification AND the next iteration's prepare),
    per-lane freeze on convergence (|residual| < 5e-14 on both axes)
    or error.

    The Jacobian uses the reference's absolute-coordinate quirk
    (trans.rs:624-648) and every float op is pinned to the kernel's
    order, so output is bit-identical to kernel.backward.
    """
    stages = backward_newton_stages(input_rel, grid_rel, unit, key, iterations)
    state = stages[0]
    for n, st in enumerate(stages[1:]):
        state = st.replace("__STATE__", f"({state}) _st{n}")
    return state


def _newton_state0(input_rel: str, key: str) -> str:
    return f"""
      SELECT {key}, lat AS q_lat, lon AS q_lon, alt AS q_alt,
             lat AS yn, lon AS xn,
             FALSE AS done, CAST(3 AS INTEGER) AS st,
             CAST(-1 AS BIGINT) AS e_code, CAST(-1 AS INTEGER) AS e_corner,
             CAST(NULL AS DOUBLE) AS o_dlat, CAST(NULL AS DOUBLE) AS o_dlon,
             CAST(NULL AS DOUBLE) AS o_dalt
      FROM {input_rel}
    """


def _newton_prep0(grid_rel: str, unit: int, key: str) -> str:
    """Initial prepare-corr at the query point itself."""
    pre = "(SELECT *, yn AS lat, xn AS lon FROM __STATE__) _p0"
    c = corr_sql(pre, grid_rel, unit, expose_params=True)
    return f"SELECT {key}, {STATE_COLS}, {PREP_COLS} FROM ({c}) _c0"


def _newton_iteration(grid_rel: str, unit: int, key: str, i: int) -> str:
    """One Newton iteration over a state carrying prepare-corr columns:
    Jacobian + update, one corr at the updated iterate (verification +
    next prepare), per-lane freeze."""
    jac = f"""
      SELECT *,
             q_lon - (xn + corr_x) AS fx,
             q_lat - (yn + corr_y) AS fy,
             -1.0e0 - ((selo - swlo) * (1.0e0 - yn) + (nelo - nwlo) * yn) / 3600.0e0 AS fx_x,
             -((nwlo - swlo) * (1.0e0 - xn) + (nelo - selo) * xn) / 3600.0e0 AS fx_y,
             -((sela - swla) * (1.0e0 - yn) + (nela - nwla) * yn) / 3600.0e0 AS fy_x,
             -1.0e0 - ((nwla - swla) * (1.0e0 - xn) + (nela - sela) * xn) / 3600.0e0 AS fy_y
      FROM __STATE__
    """
    upd = f"""
      SELECT {key}, q_lat, q_lon, q_alt, done, st, e_code, e_corner,
             o_dlat, o_dlon, o_dalt, st1, ec1, eco1,
             CASE WHEN done OR st1 <> 0 THEN yn
                  ELSE yn - (fx_x * fy - fy_x * fx) / (fx_x * fy_y + (-fx_y) * fy_x) END AS yn,
             CASE WHEN done OR st1 <> 0 THEN xn
                  ELSE xn - (fy_y * fx - fx_y * fy) / (fx_x * fy_y + (-fx_y) * fy_x) END AS xn
      FROM ({jac}) _u{i}
    """
    # verification corr is UNCHECKED (trans.rs:658, kernel parity):
    # diverged iterates fail as ParameterNotFound with wrapped codes;
    # the carried next-prepare verdict (st1) is the rebound CHECKED one
    c2 = corr_sql(f"(SELECT *, yn AS lat, xn AS lon FROM ({upd}) _p{i}) _pl{i}",
                  grid_rel, unit, expose_params=True, newton_verify=True)
    return f"""
      SELECT {key}, q_lat, q_lon, q_alt, yn, xn,
             (done OR st1 <> 0 OR status <> 0 OR _conv) AS done,
             CAST(CASE WHEN done THEN st
                  WHEN st1 <> 0 THEN st1
                  WHEN status <> 0 THEN status
                  WHEN _conv THEN 0
                  ELSE st END AS INTEGER) AS st,
             CAST(CASE WHEN done THEN e_code WHEN st1 <> 0 THEN ec1
                  WHEN status <> 0 THEN err_meshcode ELSE e_code END AS BIGINT) AS e_code,
             CAST(CASE WHEN done THEN e_corner WHEN st1 <> 0 THEN eco1
                  WHEN status <> 0 THEN err_corner ELSE e_corner END AS INTEGER) AS e_corner,
             CASE WHEN _conv THEN -dlat_deg ELSE o_dlat END AS o_dlat,
             CASE WHEN _conv THEN -dlon_deg ELSE o_dlon END AS o_dlon,
             CASE WHEN _conv THEN -dalt_m ELSE o_dalt END AS o_dalt,
             {PREP_COLS_V}
      FROM (
        SELECT *, (NOT done AND st1 = 0 AND status = 0
                   AND abs(q_lat - (yn + dlat_deg)) < 5e-14
                   AND abs(q_lon - (xn + dlon_deg)) < 5e-14) AS _conv
        FROM ({c2}) _v{i}
      ) _w{i}
    """


# ---------------------------------------------------------------------------
# Tiling
# ---------------------------------------------------------------------------

def tile_sql(input_rel: str, unit: int, level: int = 15, key: str = "pkey") -> str:
    """meshcode (floor path) + quadkey tile assignment.

    Non-finite coordinates substitute the domain corner (-90 / -180)
    before the quadkey floor-cast — the exact rule mesh.quadkey uses —
    so NaN/Inf lanes neither abort DuckDB (CAST(NaN AS BIGINT) errors
    there) nor diverge between the engines; huge finite values clamp
    in double space (numpy's int64 overflow there is unspecified
    anyway, and such lanes are invalid in every bounds mode)."""
    cells = digits_select("lat", "lon", unit).replace("__IN__", input_rel)
    code = _code("lat1", "lat2", "lat3", "lon1", "lon2", "lon3")
    n = 1 << level
    lon_g = ("(CASE WHEN lon - lon = 0.0e0 "
             "THEN LEAST(GREATEST(lon, -1.0e6), 1.0e6) ELSE -180.0e0 END)")
    lat_g = ("(CASE WHEN lat - lat = 0.0e0 "
             "THEN LEAST(GREATEST(lat, -1.0e6), 1.0e6) ELSE -90.0e0 END)")
    ix = f"LEAST(GREATEST(CAST(floor(({lon_g} + 180.0e0) / 360.0e0 * {n}.0e0) AS BIGINT), 0), {n - 1})"
    iy = f"LEAST(GREATEST(CAST(floor(({lat_g} + 90.0e0) / 180.0e0 * {n}.0e0) AS BIGINT), 0), {n - 1})"
    terms = []
    for b in range(level):
        terms.append(f"((CAST(floor(_ix / {1 << b}.0e0) AS BIGINT) % 2) * {1 << (2 * b)})")
        terms.append(f"((CAST(floor(_iy / {1 << b}.0e0) AS BIGINT) % 2) * {1 << (2 * b + 1)})")
    qk = " + ".join(terms)
    return f"""
      SELECT {key},
             CAST(CASE WHEN mesh_valid THEN {code} ELSE -1 END AS BIGINT) AS meshcode,
             CAST({qk} AS BIGINT) AS quadkey
      FROM (SELECT *, {ix} AS _ix, {iy} AS _iy FROM ({cells}) _c) _q
    """


def tile_rollup_sql(input_rel: str, unit: int, key: str = "pkey") -> str:
    """Hierarchical tile aggregation pyramid in ONE pass: per-point
    alt values rolled up over the 3-level JGD mesh hierarchy
    (3rd-order cell -> its 2nd-order parent -> its 1st-order parent)
    with GROUP BY ROLLUP — Spark plans a single Expand + one shuffle
    with map-side partial aggregation for all three levels at once,
    instead of three cascaded groupBys.

    Parent codes are pure meshcode arithmetic: 2nd-order = code DIV
    100, 1st-order = code DIV 10000 (mesh.rs digit layout).  Output:
    (level 1|2|3, cell, n_points, alt_milli_sum) — exact integers
    (alt is an exact 2-decimal double in the fixture, x1000 is exact).
    GROUPING() tags the level; the all-NULL grand-total row is
    dropped.  Works identically in DuckDB (the oracle).
    """
    # the grand-total filter is a projected GROUPING() column, not a
    # HAVING: Spark cannot resolve GROUPING(col) in HAVING once the
    # aggregate output is aliased
    return f"""
      SELECT level, cell, n_points, alt_milli_sum
      FROM (
        SELECT CAST(3 - GROUPING(c2) - GROUPING(c3) AS INTEGER) AS level,
               CAST(COALESCE(c3, c2, c1) AS BIGINT) AS cell,
               CAST(COUNT(*) AS BIGINT) AS n_points,
               CAST(SUM(CAST(round(alt * 1000.0e0) AS BIGINT)) AS BIGINT) AS alt_milli_sum,
               GROUPING(c1) AS _g1
        FROM (
          SELECT {key}, alt,
                 meshcode AS c3,
                 CAST(floor(meshcode / 100.0e0) AS BIGINT) AS c2,
                 CAST(floor(meshcode / 10000.0e0) AS BIGINT) AS c1
          FROM {input_rel}
          WHERE meshcode <> -1
        ) _h
        GROUP BY ROLLUP(c1, c2, c3)
      ) _z
      WHERE _g1 = 0
    """


def cell_position_sql(input_rel: str, unit: int, key: str = "pkey") -> str:
    """(y, x) in-cell position, NULL outside the mesh domain."""
    cells = _pipe(
        digits_select("lat", "lon", unit).replace("__IN__", input_rel),
        position_select("lat", "lon", unit),
    )
    return f"""
      SELECT {key},
             CASE WHEN mesh_valid THEN pos_y END AS pos_y,
             CASE WHEN mesh_valid THEN pos_x END AS pos_x
      FROM ({cells}) _p
    """


# ---------------------------------------------------------------------------
# Spatial join / kNN
# ---------------------------------------------------------------------------

def polygon_edges_values(polygons: list[tuple[str, list[tuple[float, float]]]],
                         alias: str = "e") -> str:
    """Closed rings -> inline edge relation (poly_id, y1, x1, y2, x2).

    Coordinates are (lat, lon) pairs; ring closure is implicit.
    Default alias "e" matches the references point_in_polygon_sql
    emits."""
    rows = []
    for pid, ring in polygons:
        for i in range(len(ring)):
            y1, x1 = ring[i]
            y2, x2 = ring[(i + 1) % len(ring)]
            rows.append(
                f"({pid!r}, CAST({y1!r} AS DOUBLE), CAST({x1!r} AS DOUBLE), "
                f"CAST({y2!r} AS DOUBLE), CAST({x2!r} AS DOUBLE))"
            )
    return f"(VALUES {', '.join(rows)}) AS {alias}(poly_id, y1, x1, y2, x2)"


def point_in_polygon_sql(input_rel: str, edges_rel: str, key: str = "pkey") -> str:
    """Crossing-number containment as edge-parity aggregation.

    A point is inside iff an odd number of edges crosses the ray
    x -> +inf: ((y1 > lat) != (y2 > lat)) AND
    lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1.
    (Horizontal edges: the parity test is false and IEEE inf/nan keeps
    the division harmless.)  Integer parity output -> hash-robust.

    The crossing predicate sits IN the join condition, not in a CASE
    under the aggregate: the broadcast nested-loop probe still
    evaluates it once per (point, edge), but only the crossing pairs
    (0-2 per point in practice) reach the aggregation, so the groupBy
    shuffle carries ~n_points rows instead of n_points x n_edges
    (measured 1.4 s -> ~1 s at 600k points x 20 edges; at corpus
    scale it is the difference between shuffling the corpus and
    shuffling the corpus times the polygon complexity).
    """
    return f"""
      SELECT {key}, poly_id
      FROM (
        SELECT _pp.{key}, e.poly_id, COUNT(*) AS crossings
        FROM (SELECT * FROM {input_rel}) _pp
        JOIN {edges_rel}
          ON ((e.y1 > _pp.lat) <> (e.y2 > _pp.lat))
         AND _pp.lon < (e.x2 - e.x1) * (_pp.lat - e.y1) / (e.y2 - e.y1) + e.x1
        GROUP BY _pp.{key}, e.poly_id
      ) _x
      WHERE crossings % 2 = 1
    """


def knn_nodes_sql(input_rel: str, unit: int, k: int = 3, key: str = "pkey") -> str:
    """k nearest existing mesh nodes (k <= 4).

    Candidates = the 4x4 node window around the containing cell (lat
    offsets -1..+2, lon offsets -1..+2 from the SW corner) — the same
    provably sufficient superset the engine kernel uses
    (operators/spatial.py::knn_candidate_rows_cols): every cell corner
    is within h^2 + (1.5h)^2 = 3.25 h^2 while any node outside the
    window is >= 4 h^2 away.  Nodes whose digits under/overflow the
    mesh domain are dropped (node.rs:430-558 None semantics); rank by
    squared degree distance, ties broken by meshcode.
    Output (key, rank, node_code) — all integers.
    """
    if k > 4:
        raise ValueError("knn_nodes_sql supports k <= 4 (candidate window proof)")
    cells = digits_select("lat", "lon", unit).replace("__IN__", input_rel)
    lat0 = ("lat1", "lat2", "lat3")
    lon0 = ("lon1", "lon2", "lon3")
    lat_up = _carry_up(*lat0, unit)
    lon_up = _carry_up(*lon0, unit)
    rows = [_carry_down(*lat0, unit), lat0, lat_up, _carry_up(*lat_up, unit)]
    cols = [_carry_down(*lon0, unit), lon0, lon_up, _carry_up(*lon_up, unit)]
    selects = []
    for la in rows:
        lat_ok = f"({la[0]} >= 0 AND {la[0]} <= 99)"
        nlat = node_lat_expr(*la)
        for lo in cols:
            lon_ok = (
                f"({lo[0]} >= 0 AND ({lo[0]} < 80 OR "
                f"({lo[0]} = 80 AND {lo[1]} = 0 AND {lo[2]} = 0)))"
            )
            nlon = node_lon_expr(*lo)
            code = _code(*la, *lo)
            selects.append(
                f"SELECT {key}, {code} AS node_code, "
                f"(lat - {nlat}) * (lat - {nlat}) + (lon - {nlon}) * (lon - {nlon}) AS d2 "
                f"FROM _cells WHERE mesh_valid AND {lat_ok} AND {lon_ok}"
            )
    union = " UNION ALL ".join(selects)
    return f"""
      WITH _cells AS ({cells})
      SELECT {key}, CAST(rnk AS INTEGER) AS rank, node_code
      FROM (
        SELECT {key}, node_code,
               ROW_NUMBER() OVER (PARTITION BY {key} ORDER BY d2, node_code) AS rnk
        FROM ({union}) _u
      ) _r
      WHERE rnk <= {k}
    """
