"""Mesh kernel unit tests pinned to reference fixtures.

Citations: coord.rs doctests (245-254, 299-308, 342-345, 368-372),
node.rs:596-658 meshcode vectors, cell.rs:466-477 position goldens,
coord.rs:768-798 identity sweeps, point.rs:442-504 normalization.
"""

import numpy as np
import pytest

from jgdtrans_rs_spark import mesh

LAT = 36.103774791666666
LON = 140.08785504166664


def test_meshcode_fixture_unit1():
    latd, lond, valid = mesh.point_to_digits(np.array([LAT]), np.array([LON]), 1)
    assert valid.all()
    assert mesh.digits_to_meshcode(latd, lond)[0] == 54401027
    assert latd[0][0] == 54 and latd[1][0] == 1 and latd[2][0] == 2
    assert lond[0][0] == 40 and lond[1][0] == 0 and lond[2][0] == 7


def test_meshcode_fixture_unit5():
    latd, lond, valid = mesh.point_to_digits(np.array([LAT]), np.array([LON]), 5)
    assert mesh.digits_to_meshcode(latd, lond)[0] == 54401005


def test_node_to_degrees():
    # coord.rs:342-345, 368-372
    lat1 = mesh.digits_to_lat((np.array([54]), np.array([1]), np.array([2])))
    assert lat1[0] == 36.1
    lat5 = mesh.digits_to_lat((np.array([54]), np.array([1]), np.array([0])))
    assert lat5[0] == 36.083333333333336
    lon1 = mesh.digits_to_lon((np.array([40]), np.array([0]), np.array([7])))
    assert lon1[0] == 140.0875
    lon5 = mesh.digits_to_lon((np.array([40]), np.array([0]), np.array([5])))
    assert lon5[0] == 140.0625


def test_cell_position_goldens():
    # cell.rs:466-477
    p = np.array([36.10377479])
    q = np.array([140.087855041])
    latd, lond, _ = mesh.point_to_digits(p, q, 1)
    y, x = mesh.cell_position(p, q, latd, lond, 1)
    assert (y[0], x[0]) == (0.4529748000001632, 0.028403280000475206)
    latd, lond, _ = mesh.point_to_digits(p, q, 5)
    y, x = mesh.cell_position(p, q, latd, lond, 5)
    assert (y[0], x[0]) == (0.4905949600000099, 0.405680656000186)


def test_meshcode_decode_validity():
    # node.rs:621-626 rejected codes
    codes = np.array([54401027, 54401827, 54408027, 54801021, 100000000])
    _, _, valid = mesh.meshcode_to_digits(codes)
    assert valid.tolist() == [True, False, False, False, False]


def test_decode_encode_roundtrip():
    codes = np.array([54401027, 54401005, 37411203, 57413454])
    latd, lond, valid = mesh.meshcode_to_digits(codes)
    assert valid.all()
    assert (mesh.digits_to_meshcode(latd, lond) == codes).all()


@pytest.mark.parametrize("unit", [1, 5])
def test_identity_sweep(unit):
    """coord.rs:768-798: from(to(coord)) == coord over the whole space.

    The ulp-parity trick (coord.rs:265-276) is what makes the latitude
    direction exact; this sweep fails without it.
    """
    firsts = np.arange(0, 99)
    seconds = np.arange(0, 8)
    thirds = np.arange(0, 10, unit)
    f, s, t = np.meshgrid(firsts, seconds, thirds)
    digits = (f.ravel().astype(np.int64), s.ravel().astype(np.int64), t.ravel().astype(np.int64))
    lat = mesh.digits_to_lat(digits)
    ok = (lat <= 66.66) & (lat >= 0)
    latv = mesh.lat_mesh_value(lat[ok])
    f2, s2, t2 = mesh.value_to_digits(latv, unit)
    assert (f2 == digits[0][ok]).all()
    assert (s2 == digits[1][ok]).all()
    assert (t2 == digits[2][ok]).all()

    lon = mesh.digits_to_lon(digits)
    ok = (lon >= 100.0) & (lon < 180.0)
    f2, s2, t2 = mesh.value_to_digits(lon[ok], unit)
    assert (f2 == (digits[0][ok] + 100) % 100).all()
    assert (s2 == digits[1][ok]).all()
    assert (t2 == digits[2][ok]).all()


def test_neighbors_carry():
    # coord.rs:409-514 digit carry across second/first
    d = (np.array([54]), np.array([7]), np.array([9]))
    f, s, t = mesh.next_north(d, 1)
    assert (f[0], s[0], t[0]) == (55, 0, 0)
    d = (np.array([54]), np.array([1]), np.array([5]))
    f, s, t = mesh.next_north(d, 5)
    assert (f[0], s[0], t[0]) == (54, 2, 0)
    f, s, t = mesh.next_south((np.array([55]), np.array([0]), np.array([0])), 1)
    assert (f[0], s[0], t[0]) == (54, 7, 9)


def test_normalize_latitude_table():
    # point.rs:442-504 (selected rows incl. sign/NaN handling)
    cases = [
        (35.0, 35.0), (-35.0, -35.0), (80.0, 80.0), (-80.0, -80.0),
        (90.0, 90.0), (-90.0, -90.0), (100.0, 80.0), (-100.0, -80.0),
        (180.0, 0.0), (-180.0, 0.0), (270.0, -90.0), (-270.0, 90.0),
        (360.0, 0.0), (-360.0, 0.0), (450.0, 90.0), (-450.0, -90.0),
    ]
    vals = np.array([c[0] for c in cases])
    exp = np.array([c[1] for c in cases])
    got = mesh.normalize_latitude(vals)
    assert (got == exp).all(), (got, exp)
    assert np.isnan(mesh.normalize_latitude(np.array([np.nan])))[0]


def test_normalize_longitude_table():
    cases = [
        (145.0, 145.0), (180.0, 180.0), (-180.0, -180.0),
        (190.0, -170.0), (-190.0, 170.0), (360.0, 0.0), (-360.0, 0.0),
        # 540 % 360 = 180, and the reference's half-open [-180, 180)
        # check wraps it to -180 (point.rs:27-29)
        (540.0, -180.0), (-540.0, -180.0), (720.0, 0.0),
    ]
    vals = np.array([c[0] for c in cases])
    exp = np.array([c[1] for c in cases])
    got = mesh.normalize_longitude(vals)
    assert (got == exp).all(), (got, exp)


def test_quadkey_locality():
    lat = np.array([36.1, 36.1000001, 10.0])
    lon = np.array([140.08, 140.0800001, 100.0])
    qk = mesh.quadkey(lat, lon, 15)
    assert qk[0] == qk[1]            # near points share a cell
    assert qk[0] != qk[2]
    assert (qk >= 0).all() and (qk < (1 << 30)).all()


def test_value_to_digits_unchecked_saturating_cast_parity():
    """Out-of-domain values follow Rust's `f64 as u32` saturating cast
    (code.rs:28: negative / NaN -> 0, huge -> u32::MAX) — NOT Python
    modulo: a diverged Newton iterate at a negative mesh value must
    report the same digit-wrapped meshcode the reference does."""
    import numpy as np

    from jgdtrans_rs_spark import mesh

    f, s, t = mesh.value_to_digits(np.array([-0.5, float("nan")]), mesh.UNIT_ONE)
    # negative: integer saturates to 0 -> first 0 (old Python-mod gave 99)
    assert f[0] == 0 and f[1] == 0
    # second for -0.5: floor(8*-0.5) as u32 saturates to 0 - 0 = 0
    assert s[0] == 0 and t[0] == 0
    # huge: integer saturates at u32::MAX -> first = 4294967295 % 100
    f2, _, _ = mesh.value_to_digits(np.array([1.0e300]), mesh.UNIT_ONE)
    assert f2[0] == 4294967295 % 100
    # in-domain digits unchanged by the cast emulation
    f3, s3, t3 = mesh.value_to_digits(np.array([54.135]), mesh.UNIT_ONE)
    assert (f3[0], s3[0]) == (54, 1)
