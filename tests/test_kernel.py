"""Transform kernel tests pinned to the reference's own fixtures.

Four layers mirroring SURVEY.md §5:
1. golden values vs the GIAJ web app (1e-8 deg / 1e-3 m),
2. exact-decimal regression (bit equality on doctest constants,
   1e-13 on the FMA-generated test table),
3. round-trip identities backward(forward(p)) == p bit-exact over the
   reference's maximally-distorted grids + 40 sampled origins,
4. error taxonomy as data.
"""

import numpy as np
import pytest

from jgdtrans_rs_spark import kernel
from jgdtrans_rs_spark.grid import MeshGrid
from tests.conftest import SEMIDYNA, reference_origins, reference_table


@pytest.fixture(scope="module")
def semi():
    return MeshGrid.from_dict(SEMIDYNA, "SemiDynaEXE")


@pytest.fixture(scope="module")
def tky2jgd_web():
    # trans.rs:1038-1048
    return MeshGrid.from_dict({
        54401027: (11.49105, -11.80078, 0.0),
        54401037: (11.48732, -11.80198, 0.0),
        54401028: (11.49096, -11.80476, 0.0),
        54401038: (11.48769, -11.80555, 0.0),
        54401047: (11.48373, -11.80318, 0.0),
        54401048: (11.48438, -11.80689, 0.0),
    }, "TKY2JGD")


@pytest.fixture(scope="module")
def iwo_jima():
    # trans.rs:1340-1383 (42-node Iwo Jima TKY2JGD grid)
    return MeshGrid.from_dict(
        reference_table("pub(crate) const TKY2JGD: [(u32, (f64, f64, f64)); 42]",
                        "pub(crate) const PatchJGD: [(u32, (f64, f64, f64)); 20]"),
        "TKY2JGD",
    )


@pytest.fixture(scope="module")
def kongoji():
    # trans.rs:1386-1408 (20-node PatchJGD Kongōji grid)
    return MeshGrid.from_dict(
        reference_table("pub(crate) const PatchJGD: [(u32, (f64, f64, f64)); 20]",
                        "// randomly sampling points"),
        "PatchJGD",
    )


def _one(fn, lat, lon, alt, grid):
    la, lo, al, c = fn(np.array([lat]), np.array([lon]), np.array([alt]), grid)
    return la[0], lo[0], al[0], c


def test_forward_doctest_exact(semi):
    # transformer.rs:301-305 (bit-exact asserted constants)
    la, lo, al, c = _one(kernel.forward, 36.10377479, 140.087855041, 2.34, semi)
    assert c.status[0] == kernel.STATUS_OK
    assert la == 36.103773017086695
    assert lo == 140.08785924333452
    assert al == 2.4363138578103


def test_forward_exact_result(semi):
    # trans.rs:1149-1172 (tolerance 1e-13; constants are FMA-path)
    la, lo, al, _ = _one(kernel.forward, 36.103774791666666, 140.08785504166664, 0.0, semi)
    assert abs(la - 36.10377301875335) < 1e-13
    assert abs(lo - 140.08785924400115) < 1e-13
    assert abs(al - 0.09631385775572238) < 1e-13


def test_backward_corr_doctest_exact(semi):
    # trans.rs:542-551 non-fma constants, bit-exact
    c = kernel.backward_corr(
        np.array([36.103773017086695]), np.array([140.08785924333452]), semi)
    assert c.status[0] == kernel.STATUS_OK
    assert c.dlat[0] == 1.7729133100878255e-06
    assert c.dlon[0] == -4.202334510058886e-06
    assert c.dalt[0] == -0.09631385781030005


def test_backward_compat_corr_doctest_exact(semi):
    # trans.rs:481-486
    c = kernel.backward_compat_corr(
        np.array([36.103773017086695]), np.array([140.08785924333452]), semi)
    assert c.dlat[0] == 1.772913321983159e-06
    assert c.dlon[0] == -4.202334509042612e-06
    assert c.dalt[0] == -0.09631385823205689


def test_vs_semidyna_web_app(semi):
    # trans.rs:1123-1147, tolerance 1e-8 deg / 1e-3 m
    la, lo, al, _ = _one(kernel.forward, 36.103774791666666, 140.08785504166664, 0.0, semi)
    assert abs(36.103773019 - la) < 1e-8
    assert abs(140.087859244 - lo) < 1e-8
    assert abs(0.096 - al) < 1e-3
    la, lo, al, _ = _one(kernel.backward_compat, 36.10377301875336, 140.08785924400115, 0.0, semi)
    assert abs(36.103774792 - la) < 1e-8
    assert abs(140.087855042 - lo) < 1e-8
    assert abs(-0.096 - al) < 1e-3


def test_vs_tky2jgd_web_app(tky2jgd_web):
    # trans.rs:1070-1095 (GIAJ HQ landmark)
    la, lo, al, _ = _one(kernel.forward, 36.103774791666666, 140.08785504166664, 0.0, tky2jgd_web)
    assert abs(36.106966281 - la) < 1e-8
    assert abs(140.084576867 - lo) < 1e-8
    assert al == 0.0
    la, lo, al, _ = _one(kernel.backward_compat, 36.10696628160147, 140.08457686629436, 0.0, tky2jgd_web)
    assert abs(36.103774792 - la) < 1e-8
    assert abs(140.087855042 - lo) < 1e-8


@pytest.mark.parametrize("grid_name,origin_marker", [
    ("iwo_jima", "pub(crate) const TKY2JGD: [Point; 40]"),
    ("kongoji", "pub(crate) const PatchJGD: [Point; 40]"),
])
def test_roundtrip_identity_bitexact(request, grid_name, origin_marker):
    # trans.rs:1628-1644, 1767-1783: backward(forward(p)) == p exactly
    grid = request.getfixturevalue(grid_name)
    end = ("pub(crate) const PatchJGD: [Point; 40]"
           if grid_name == "iwo_jima" else "#[allow(non_snake_case)]\n        mod PatchJGD")
    pts = reference_origins(origin_marker, end)
    assert len(pts) == 40
    lat = np.array([p[0] for p in pts])
    lon = np.array([p[1] for p in pts])
    alt = np.zeros(40)
    fla, flo, fal, fc = kernel.forward(lat, lon, alt, grid)
    assert (fc.status == kernel.STATUS_OK).all()
    bla, blo, bal, bc = kernel.backward(fla, flo, fal, grid)
    assert (bc.status == kernel.STATUS_OK).all()
    assert (bla == lat).all()
    assert (blo == lon).all()


def test_backward_precision(semi, iwo_jima):
    """Residual of the Newton inverse < MAX_ERROR = 5e-14 deg."""
    for grid, (la0, lo0) in ((semi, (36.09, 140.08)), (iwo_jima, (24.78, 141.31))):
        rng = np.random.RandomState(7)
        lat = la0 + rng.rand(200) * 0.01
        lon = lo0 + rng.rand(200) * 0.01
        fla, flo, fal, fc = kernel.forward(lat, lon, np.zeros(200), grid)
        ok = fc.status == kernel.STATUS_OK
        bla, blo, _, bc = kernel.backward(fla[ok], flo[ok], fal[ok], grid)
        assert (bc.status == kernel.STATUS_OK).all()
        # verify the defining property q == p' + forward_corr(p')
        c2 = kernel.forward_corr(bla, blo, grid)
        assert np.abs(fla[ok] - (bla + c2.dlat)).max() < kernel.MAX_ERROR
        assert np.abs(flo[ok] - (blo + c2.dlon)).max() < kernel.MAX_ERROR


def test_error_taxonomy(semi):
    # OOB / PNF{corner} / statuses as data (trans.rs:946-999)
    lat = np.array([2.0, 36.09, 24.78, np.nan])
    lon = np.array([3.0, 140.08, 141.31, 140.0])
    c = kernel.forward_corr(lat, lon, semi)
    assert c.status.tolist() == [
        kernel.STATUS_OUT_OF_BOUNDS, kernel.STATUS_OK,
        kernel.STATUS_PARAMETER_NOT_FOUND, kernel.STATUS_OUT_OF_BOUNDS,
    ]
    assert c.err_corner[2] == kernel.CORNER_SW
    assert c.err_meshcode[2] != -1
    assert np.isnan(c.dlat[0]) and not np.isnan(c.dlat[1])


def test_parameter_not_found_corner_priority(semi):
    """A point whose cell has sw present but ne missing reports the
    first missing corner in probe order sw, se, nw, ne
    (trans.rs:76-87)."""
    partial = MeshGrid.from_dict({54401005: (-0.00622, 0.01516, 0.0946)}, "SemiDynaEXE")
    c = kernel.forward_corr(np.array([36.09]), np.array([140.08]), partial)
    assert c.status[0] == kernel.STATUS_PARAMETER_NOT_FOUND
    assert c.err_corner[0] == kernel.CORNER_SE
    assert c.err_meshcode[0] == 54401100  # the se neighbor of 54401005


# ---------------------------------------------------------------------------
# Boundary error-kind parity (round 3, VERDICT r02 #5/#6)
# ---------------------------------------------------------------------------

def _status_of(fn, lat, lon, grid, **kw):
    c = fn(np.array([lat]), np.array([lon]), grid, **kw)
    return int(c.status[0]), int(c.err_meshcode[0]), int(c.err_corner[0])


def test_boundary_error_kinds_inclusive_mode(semi):
    """Exact reference checked-path parity at the domain's top edge
    (strict_bounds=False).  Pinned from the source, not assumptions:

    * lat = 200/3 (the unique double with raw 3*lat/2 == 100.0) has an
      ODD bit pattern, so the ulp bump (coord.rs:271-275) pushes its
      mesh value past the inclusive bound -> OutOfBounds in BOTH
      modes; the reference's (0,0,0) digit-wrap is unreachable for
      latitude.
    * the top latitude CELL (coord (99,7,5) at unit five) is accepted
      by try_from_latitude but has no next_up (coord.rs:409-427) ->
      reference OutOfBounds at cell construction (trans.rs:429-430);
      strict mode reports ParameterNotFound(99xx..) instead — the one
      reachable divergence, closed by the flag.
    * lon = 180.0 -> coord (80,0,0); the east node (80,0,x) violates
      the MeshNode longitude maximum (node.rs:152-160) -> OutOfBounds
      in both modes.
    * lon just below 180 (coord (79,7,5)) builds a legal cell whose
      east nodes are (80,0,0) -> ParameterNotFound on this grid, in
      both modes, attributed to the first-probed missing corner
      (sw, trans.rs:76-87).
    """
    oob, pnf = kernel.STATUS_OUT_OF_BOUNDS, kernel.STATUS_PARAMETER_NOT_FOUND

    lat_boundary = 200.0 / 3.0  # 66.66666666666667, odd bits
    assert np.float64(lat_boundary).view(np.int64) % 2 == 1
    for sb in (True, False):
        s, code, corner = _status_of(kernel.forward_corr, lat_boundary, 140.08,
                                     semi, strict_bounds=sb)
        assert (s, code, corner) == (oob, -1, -1), (sb, s, code, corner)

    top_cell_lat = 66.66666666666666  # even bits, mesh value 99.99999999999999
    s, code, corner = _status_of(kernel.forward_corr, top_cell_lat, 140.08, semi)
    assert s == pnf and code // 1_000_000 == 99 and corner == kernel.CORNER_SW
    s, code, corner = _status_of(kernel.forward_corr, top_cell_lat, 140.08,
                                 semi, strict_bounds=False)
    assert (s, code, corner) == (oob, -1, -1)

    for sb in (True, False):
        s, code, corner = _status_of(kernel.forward_corr, 36.1, 180.0,
                                     semi, strict_bounds=sb)
        assert (s, code, corner) == (oob, -1, -1), (sb, s)

    for sb in (True, False):
        s, code, corner = _status_of(kernel.forward_corr, 36.1, 179.99,
                                     semi, strict_bounds=sb)
        assert s == pnf and corner == kernel.CORNER_SW
        assert (code // 10_000) % 100 == 79  # sw lon first digit

    # in-domain results are bit-identical across modes
    lat = np.array([36.103774791666666])
    lon = np.array([140.087855041666666])
    a = kernel.forward_corr(lat, lon, semi)
    b = kernel.forward_corr(lat, lon, semi, strict_bounds=False)
    assert a.dlat[0] == b.dlat[0] and a.dlon[0] == b.dlon[0] and a.dalt[0] == b.dalt[0]
    assert a.status[0] == b.status[0] == kernel.STATUS_OK


def test_newton_verify_unchecked_parity():
    """A Newton step that diverges out of the mesh domain must fail at
    the VERIFY step like the reference's forward_corr_unchecked
    (trans.rs:658): ParameterNotFound with a digit-WRAPPED meshcode
    (MeshCode::from_point has no bounds, code.rs:16-57) — never
    OutOfBounds (r01/r02's documented divergence, now closed).

    Grid: one unit-one cell with a huge (-137 deg) longitude
    correction; the first Newton update lands at lon ~ q+137 (~277),
    whose unchecked first digit wraps to 277 % 100 = 77."""
    grid = MeshGrid.from_dict({
        54401027: (0.0, -493200.0, 0.0),   # -137 deg * 3600 sec
        54401028: (0.0, -493200.0, 0.0),
        54401037: (0.0, -493200.0, 0.0),
        54401038: (0.0, -493200.0, 0.0),
    }, "TKY2JGD")
    c = kernel.backward_corr(np.array([36.1003]), np.array([140.0878]), grid)
    assert int(c.status[0]) == kernel.STATUS_PARAMETER_NOT_FOUND
    assert int(c.err_corner[0]) == kernel.CORNER_SW
    code = int(c.err_meshcode[0])
    assert (code // 10_000) % 100 == 77, code  # wrapped lon first digit
    assert code // 1_000_000 == 54          # latitude digits unchanged

    # the SQL twin reports the SAME diverged-lane verdict (round 5 —
    # closes the r03/r04 documented SQL-vs-kernel divergence): the
    # verify corr runs over saturate+wrap unchecked digits
    # (oracle.digits_select_unchecked), so the lane fails PNF with the
    # bit-identical wrapped meshcode, never OOB.
    import duckdb

    from jgdtrans_rs_spark.plans import oracle as osql

    gv = osql.grid_values(grid.to_rows())
    sql = osql.backward_newton_sql(
        "(SELECT 1 AS pkey, 36.1003e0 AS lat, 140.0878e0 AS lon, "
        "0.0e0 AS alt) _in", gv, grid.mesh_unit)
    row = duckdb.sql(sql).df().iloc[0]
    assert int(row["status"]) == kernel.STATUS_PARAMETER_NOT_FOUND
    assert int(row["err_meshcode"]) == code
    assert int(row["err_corner"]) == kernel.CORNER_SW
