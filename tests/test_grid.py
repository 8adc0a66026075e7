"""Par parser + MeshGrid + statistics tests.

Citations: layouts par.rs:642-653, fill-0 semantics par.rs:396-466,
description par.rs:360-366, positional errors par.rs:744-859,
statistics goldens transformer.rs:585-651.
"""

import math

import numpy as np
import pytest

from jgdtrans_rs_spark.grid import MeshGrid, ParseParError, parse_par
from tests.conftest import SEMIDYNA

# fixed-width per par.rs:647-648: meshcode 0..8, lat 9..18, lon 19..28,
# alt 29..38
SEMIDYNA_PAR = (
    "\n" * 15
    + "MeshCode dB(sec)  dL(sec) dH(m)\n"
    + "".join(
        f"{c:8d} {a:9.5f} {b:9.5f} {h:9.5f}\n"
        for c, a, b, h in [
            (54401005, -0.00622, 0.01516, 0.0946),
            (54401055, -0.00620, 0.01529, 0.08972),
            (54401100, -0.00663, 0.01492, 0.10374),
            (54401150, -0.00664, 0.01506, 0.10087),
        ]
    )
)

TKY2JGD_PAR = (
    "header line 1\nheader line 2\n"
    + f"{54401027:8d} {11.49105:9.5f} {-11.80078:9.5f}\n"
    + f"{54401028:8d} {11.49096:9.5f} {-11.80476:9.5f}\n"
)


def test_parse_semidyna():
    g = parse_par(SEMIDYNA_PAR, "SemiDynaEXE")
    assert len(g) == 4
    assert g.mesh_unit == 5
    assert g.codes.tolist() == sorted(SEMIDYNA)
    dlat, dlon, dalt, found = g.lookup(np.array([54401005, 54401150, 99999999]))
    assert found.tolist() == [True, True, False]
    assert dlat[0] == -0.00622 and dlon[1] == 0.01506 and dalt[1] == 0.10087
    assert g.description.startswith("\n") and "MeshCode" in g.description


def test_parse_tky2jgd_fills_zero_altitude():
    # TKY2JGD has no altitude column -> dalt filled 0.0 (par.rs:174-175)
    g = parse_par(TKY2JGD_PAR, "TKY2JGD")
    assert g.mesh_unit == 1
    assert (g.dalt_m == 0.0).all()
    assert g.description == "header line 1\nheader line 2\n"


def test_parse_patchjgd_h_altitude_only():
    # PatchJGD_H: altitude at columns 9..18
    text = "\n" * 16 + f"{54401005:8d} {0.12345:9.5f}\n"
    g = parse_par(text, "PatchJGD_H")
    assert (g.dlat_sec == 0.0).all() and (g.dlon_sec == 0.0).all()
    assert g.dalt_m[0] == 0.12345


def test_parse_geonetf3_layout():
    # geonetF3: 18 header lines, columns at 12..21, 22..31, 32..41
    text = "\n" * 18 + f"{54401005:8d}    {-0.00622:9.5f} {0.01516:9.5f} {0.0946:9.5f}\n"
    g = parse_par(text, "geonetF3")
    assert g.dlat_sec[0] == -0.00622 and g.dlon_sec[0] == 0.01516 and g.dalt_m[0] == 0.0946
    assert g.mesh_unit == 5


def test_parse_all_formats():
    """Every format variant parses with its own layout (par.rs:642-653)."""
    from jgdtrans_rs_spark.grid import FORMAT_MESH_UNIT, PAR_LAYOUTS

    for fmt, (header, _, lat_rng, lon_rng, alt_rng) in PAR_LAYOUTS.items():
        line = [" "] * 60
        line[0:8] = f"{54401005:8d}"
        for rng, val in ((lat_rng, "-0.00622"), (lon_rng, "0.01516"), (alt_rng, "0.09460")):
            if rng:
                start, end = rng
                field = f"{float(val):>{end - start}.5f}"
                line[start:end] = field
        text = "\n" * header + "".join(line).rstrip() + "\n"
        g = parse_par(text, fmt)
        assert len(g) == 1, fmt
        assert g.mesh_unit == FORMAT_MESH_UNIT[fmt]
        assert g.dlat_sec[0] == (-0.00622 if lat_rng else 0.0), fmt
        assert g.dlon_sec[0] == (0.01516 if lon_rng else 0.0), fmt
        assert g.dalt_m[0] == (0.0946 if alt_rng else 0.0), fmt


def test_parse_errors_positional():
    with pytest.raises(ParseParError) as e:
        parse_par("only one line\n", "SemiDynaEXE")
    assert e.value.kind == "Header"

    bad = "\n" * 16 + "notanint -0.00622  0.01516 0.0946\n"
    with pytest.raises(ParseParError) as e:
        parse_par(bad, "SemiDynaEXE")
    assert e.value.kind == "ParseInt"
    assert e.value.column == "Meshcode"
    assert e.value.lineno == 17
    assert (e.value.start, e.value.end) == (0, 8)

    short = "\n" * 16 + f"{54401005:8d} {-0.00622:9.5f}\n"
    with pytest.raises(ParseParError) as e:
        parse_par(short, "SemiDynaEXE")
    assert e.value.kind == "ColumnNotFound"
    assert e.value.column == "Longitude"


def test_statistics_goldens():
    # transformer.rs:593-651 (horizontal uses hypot — linux values)
    g = MeshGrid.from_dict(SEMIDYNA, "SemiDynaEXE")
    s = g.statistics()
    assert s["latitude"]["count"] == 4
    assert s["latitude"]["mean"] == -0.0064225
    assert s["latitude"]["std"] == 0.019268673410486777
    assert s["latitude"]["abs"] == 0.006422499999999999
    assert s["latitude"]["min"] == -0.00664
    assert s["latitude"]["max"] == -0.0062
    assert s["longitude"]["mean"] == 0.0151075
    assert s["longitude"]["std"] == 0.045322702644480496
    assert s["altitude"]["mean"] == 0.0972325
    assert s["altitude"]["std"] == 0.29174846730531423
    assert s["horizontal"]["min"] == 0.016326766366920303
    assert s["horizontal"]["max"] == 0.016499215132847987
    assert s["horizontal"]["mean"] == 0.016417802947905496


def test_statistics_empty_and_nan():
    # transformer.rs:653-699 (empty -> all None); NaN propagation
    g = MeshGrid.from_dict({}, "TKY2JGD")
    s = g.statistics()
    assert all(v is None for v in s["latitude"].values())

    g = MeshGrid.from_dict({54401005: (float("nan"), 1.0, 2.0)}, "SemiDynaEXE")
    s = g.statistics()
    assert s["latitude"]["count"] == 1
    assert math.isnan(s["latitude"]["mean"]) and math.isnan(s["latitude"]["std"])
    assert s["longitude"]["mean"] == 1.0


def test_statistics_df_matches_exact(spark, semidyna_grid):
    """The distributed statistics twin agrees with the exact ksum path
    within documented tolerance (plain sums vs compensated sums)."""
    from jgdtrans_rs_spark.engine import Engine

    eng = Engine(spark, semidyna_grid)
    got = {r["component"]: r for r in eng.statistics_df().collect()}
    exact = semidyna_grid.statistics()
    assert set(got) == set(exact)
    for comp, e in exact.items():
        g = got[comp]
        assert g["n"] == e["count"]
        for spark_key, exact_key in [("mean", "mean"), ("std", "std"),
                                     ("abs_mean", "abs"), ("vmin", "min"), ("vmax", "max")]:
            assert abs(g[spark_key] - e[exact_key]) <= 1e-12 + 1e-9 * abs(e[exact_key]), \
                (comp, spark_key, g[spark_key], e[exact_key])


def test_statistics_df_nan_grid_matches_reference(spark):
    """NaN-containing component: StatisticData::from_array early-returns
    all-NaN (transformer.rs:200-207).  Spark's F.min would otherwise
    report the smallest REAL value (NaN sorts above every double);
    statistics_df must pin every stat of that component to NaN."""
    from jgdtrans_rs_spark.engine import Engine

    g = MeshGrid.from_dict(
        {54401005: (float("nan"), 1.0, 2.0), 54401055: (0.5, 3.0, 4.0)},
        "SemiDynaEXE")
    eng = Engine(spark, g)
    got = {r["component"]: r for r in eng.statistics_df().collect()}
    exact = g.statistics()
    # latitude (and horizontal, which derives from it) are NaN-poisoned
    for comp in ("latitude", "horizontal"):
        assert got[comp]["n"] == exact[comp]["count"]
        for k in ("mean", "std", "abs_mean", "vmin", "vmax"):
            assert math.isnan(got[comp][k]), (comp, k, got[comp][k])
    # clean components still report real stats
    assert got["longitude"]["vmin"] == 1.0
    assert got["altitude"]["vmax"] == 4.0


def test_parse_with_description_override():
    """parse_with_description / from_str_with_description parity
    (par.rs:368-394): an explicit description replaces the header."""
    text = "header line 1\nheader line 2\n46303582   11.49105   -9.88759\n"
    g = parse_par(text, "TKY2JGD", description="my dataset")
    assert g.description == "my dataset"
    assert 46303582 in g.codes


def test_grid_builder_fluent():
    """TransformerBuilder parity (builder.rs:32-230): fluent
    format/parameter/parameters, last-insert-wins, 2-tuple altitude
    fill, and the unassigned-format panic."""
    import pytest

    from jgdtrans_rs_spark.grid import GridBuilder

    g = (
        GridBuilder()
        .format("SemiDynaEXE")
        .parameter(54401005, (-0.00622, 0.01516, 0.0946))
        .parameters([
            (54401055, (-0.0062, 0.01529, 0.08972)),
            (54401100, (-0.00663, 0.01492, 0.10374)),
            (54401150, (-0.00664, 0.01506, 0.10087)),
        ])
        .build()
    )
    ref = MeshGrid.from_dict({
        54401005: (-0.00622, 0.01516, 0.0946),
        54401055: (-0.0062, 0.01529, 0.08972),
        54401100: (-0.00663, 0.01492, 0.10374),
        54401150: (-0.00664, 0.01506, 0.10087),
    }, "SemiDynaEXE")
    assert (g.codes == ref.codes).all()
    assert (g.dlat_sec == ref.dlat_sec).all() and g.mesh_unit == ref.mesh_unit

    # last insert wins (HashMap semantics); 2-tuple fills altitude 0.0
    g2 = (
        GridBuilder().format("TKY2JGD")
        .parameter(46303582, (1.0, 2.0, 3.0))
        .parameter(46303582, (11.49105, -9.88759))
        .build()
    )
    assert g2.dlat_sec[0] == 11.49105 and g2.dalt_m[0] == 0.0

    with pytest.raises(ValueError, match="mesh_unit is not assigned"):
        GridBuilder().parameter(54401005, (0.0, 0.0, 0.0)).build()
    with pytest.raises(ValueError, match="unknown format"):
        GridBuilder().format("NotAFormat")


def test_grid_builder_engine(spark):
    from jgdtrans_rs_spark.grid import GridBuilder

    eng = (
        GridBuilder().format("SemiDynaEXE")
        .parameters(SEMIDYNA)
        .build_engine(spark)
    )
    df = spark.createDataFrame(
        [(1, 36.103774791666666, 140.087855041666666, 2.34)],
        "pkey long, lat double, lon double, alt double")
    r = eng.forward(df).collect()[0]
    assert r["status"] == 0
    # bit-identical to the kernel path (itself pinned to trans.rs
    # doctest constants in test_kernel.py)
    import numpy as np

    from jgdtrans_rs_spark import kernel

    want = kernel.forward(np.array([36.103774791666666]),
                          np.array([140.087855041666666]),
                          np.array([2.34]),
                          eng.grid)[0][0]
    assert r["out_lat"] == want


def test_par_numeric_parsing_rust_strictness():
    """Python's int()/float() are looser than Rust's u32/f64 parse:
    underscore separators, Unicode digits, and negative meshcodes must
    raise positional ParseParError instead of silently building a
    grid."""
    import pytest

    from jgdtrans_rs_spark.grid import ParseParError, parse_par

    header = "\n" * 2  # TKY2JGD: 2 header lines
    ok = "12345678   1.00000   2.00000\n"

    def line(code="12345678", lat="   1.00000", lon="   2.00000"):
        return header + f"{code}{lat}{lon}\n"

    parse_par(header + ok, "TKY2JGD")  # sanity: well-formed parses
    with pytest.raises(ParseParError) as e:
        parse_par(line(code="1_234567"), "TKY2JGD")
    assert e.value.kind == "ParseInt"
    with pytest.raises(ParseParError) as e:
        parse_par(line(code="-1234567"), "TKY2JGD")
    assert e.value.kind == "ParseInt"
    with pytest.raises(ParseParError) as e:
        parse_par(line(lat="    1_0.50"), "TKY2JGD")
    assert e.value.kind == "ParseFloat"
