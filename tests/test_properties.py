"""Property-based tests (hypothesis) for the pure-numpy layers."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from jgdtrans_rs_spark import dms, kernel, mesh
from jgdtrans_rs_spark.grid import MeshGrid
from tests.conftest import SEMIDYNA

finite_angle = st.floats(allow_nan=False, allow_infinity=False,
                         min_value=-1e6, max_value=1e6)


@given(st.lists(finite_angle, min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_normalize_latitude_range(vals):
    out = mesh.normalize_latitude(np.array(vals))
    assert ((out >= -90.0) & (out <= 90.0)).all()


@given(st.lists(finite_angle, min_size=1, max_size=50))
@settings(max_examples=200, deadline=None)
def test_normalize_longitude_range(vals):
    out = mesh.normalize_longitude(np.array(vals))
    assert ((out >= -180.0) & (out <= 180.0)).all()


@given(st.floats(min_value=0.0, max_value=66.6, allow_nan=False),
       st.floats(min_value=100.0, max_value=179.99, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_meshcode_node_containment(lat, lon):
    """The decoded SW node of a point's meshcode lies at or below the
    point in both axes (greatest node <= point), within one ulp of the
    boundary semantics."""
    for unit in (1, 5):
        lat_d, lon_d, valid = mesh.point_to_digits(np.array([lat]), np.array([lon]), unit)
        if not valid[0]:
            continue
        node_lat = mesh.digits_to_lat(lat_d)[0]
        node_lon = mesh.digits_to_lon(lon_d)[0]
        # the ulp-parity bump can push points exactly on a boundary
        # into the upper cell; allow a 1-ulp tolerance
        assert node_lat <= lat + abs(np.spacing(lat)) * 2
        assert node_lon <= lon + abs(np.spacing(lon)) * 2
        step_lat = (2.0 / 3.0) / 80.0 * unit
        step_lon = (1.0 / 80.0) * unit
        assert lat < node_lat + step_lat * 1.001
        assert lon < node_lon + step_lon * 1.001


@given(st.floats(min_value=36.084, max_value=36.124, allow_nan=False),
       st.floats(min_value=140.063, max_value=140.124, allow_nan=False))
@settings(max_examples=100, deadline=None)
def test_roundtrip_property_semidyna(lat, lon):
    """backward(forward(p)) == p bit-exact on arbitrary in-cell points
    (not just the reference's 80 sampled origins)."""
    g = MeshGrid.from_dict(SEMIDYNA, "SemiDynaEXE")
    fla, flo, fal, fc = kernel.forward(np.array([lat]), np.array([lon]), np.zeros(1), g)
    assert fc.status[0] == 0
    bla, blo, _, bc = kernel.backward(fla, flo, fal, g)
    assert bc.status[0] == 0
    assert bla[0] == lat
    assert blo[0] == lon


@given(st.floats(min_value=1e-6, max_value=179.999, allow_nan=False),
       st.sampled_from([1.0, -1.0]))
@settings(max_examples=300, deadline=None)
def test_dms_roundtrip_property(mag, sign):
    # |v| >= 1e-6: for subnormal fractions the reference's own Display
    # emits scientific notation that its parser rejects (dms.rs:117-126
    # quirk), so the round-trip only holds for practical magnitudes.
    v = mag * sign
    s = dms.format_dms_scalar(v)
    back = dms.dms_to_degree_scalar(s)
    assert abs(back - v) < 1e-11, (v, s, back)
