"""DMS scalar function tests (dms.rs fixtures)."""

import math

from jgdtrans_rs_spark import dms


def test_dms_to_degree_fixtures():
    # dms.rs:497-507
    assert dms.dms_to_degree_scalar("360613.58925") == 36.103774791666666
    assert dms.dms_to_degree_scalar("-360613.58925") == -36.103774791666666
    # dms.rs:186-190
    assert dms.dms_to_degree_scalar("1400516.27815") == 140.08785504166667


def test_parse_forms():
    # dms.rs:168-171: 1.2, 1, +1., -.2 forms; '_' separators
    assert dms.parse_dms_str("1.2") == (1, 0, 0, 1, 0.2)
    assert dms.parse_dms_str("1") == (1, 0, 0, 1, 0.0)
    assert dms.parse_dms_str("+1.") == (1, 0, 0, 1, 0.0)
    assert dms.parse_dms_str("-.2") == (-1, 0, 0, 0, 0.2)
    assert dms.parse_dms_str("36_06_13.5") == (1, 36, 6, 13, 0.5)
    assert dms.parse_dms_str("") is None
    assert dms.parse_dms_str("_1") is None
    assert dms.parse_dms_str("abc") is None
    assert dms.parse_dms_str("366113.0") is None  # minute 61 out of range


def test_degree_to_dms_parts():
    # dms.rs:318-325
    p = dms.degree_to_dms_parts(36.103774791666666)
    assert p[:4] == (1, 36, 6, 13)
    assert p[4] == 0.589249999997719
    p = dms.degree_to_dms_parts(140.08785504166664)
    assert p[:4] == (1, 140, 5, 16)
    assert p[4] == 0.2781499999141488
    assert dms.degree_to_dms_parts(float("nan")) is None
    assert dms.degree_to_dms_parts(180.5) is None


def test_format_compact():
    # dms.rs:106-110 + the long-fraction doctest from SURVEY §2.8
    assert dms.format_dms_scalar(36.103774791666666) == "360613.589249999997719"
    assert dms.format_dms_scalar(0.0) == "0"
    assert dms.format_dms_scalar(-36.103774791666666) == "-360613.589249999997719"


def test_roundtrip():
    for v in (36.103774791666666, 140.08785504166664, -0.5, 0.25, 179.999):
        s = dms.format_dms_scalar(v)
        back = dms.dms_to_degree_scalar(s)
        assert math.isclose(back, v, rel_tol=0, abs_tol=1e-12), (v, s, back)
