"""Degree-minute-second scalar functions (reference dms.rs).

Vectorized numpy kernels plus pandas-UDF wrappers.  Semantics pinned:

* ``dms_to_degree`` — dms.rs:513-522: ``(min*(1/60) + deg) +
  (sec+fract)*(1/3600)`` non-fma order, sign applied last.
* ``degree_to_dms`` — dms.rs:329-352: trunc/fract decomposition,
  bounds [-180, 180], NaN rejected.
* parse/format — dms.rs:96-163, 194-299: compact form
  ``DDMMSS.fffff`` with ``_`` separators tolerated, ``.5``/``1.``/``+1``
  forms; format trims the fraction's leading "0." and trailing zeros.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType


def dms_to_degree_np(sign: np.ndarray, degree: np.ndarray, minute: np.ndarray,
                     second: np.ndarray, fract: np.ndarray) -> np.ndarray:
    """dms.rs:513-522, non-fma path."""
    temp = minute * (1.0 / 60.0) + degree
    temp = (second + fract) * (1.0 / 3600.0) + temp
    return np.where(sign < 0, -temp, temp)


def parse_dms_str(s: str):
    """dms.rs:194-299 grammar -> (sign, deg, min, sec, fract) or None.

    Accepts optional +/-, '_' digit separators, missing integer or
    fraction part (not both).
    """
    if s is None or s == "":
        return None
    sign = 1
    if s.startswith("-"):
        sign, s = -1, s[1:]
    elif s.startswith("+"):
        s = s[1:]
    if "." in s:
        int_part, _, frac_part = s.partition(".")
    else:
        int_part, frac_part = s, ""
    if int_part.startswith("_") or frac_part.startswith("_"):
        return None
    int_part = int_part.replace("_", "")
    frac_part = frac_part.replace("_", "")
    if int_part == "" and frac_part == "":
        return None
    if int_part and not int_part.isdigit():
        return None
    if frac_part and not frac_part.isdigit():
        return None
    acc = int(int_part) if int_part else 0
    degree, rest = acc // 10_000, acc % 10_000
    minute, second = rest // 100, rest % 100
    if degree > 180 or minute > 59 or second > 59:
        return None
    fract = float("0." + frac_part) if frac_part else 0.0
    if degree == 180 and (minute > 0 or second > 0 or fract != 0.0):
        return None
    return sign, degree, minute, second, fract


def dms_to_degree_scalar(s: str) -> float:
    p = parse_dms_str(s)
    if p is None:
        return float("nan")
    sign, d, m, sec, fr = p
    return float(
        dms_to_degree_np(
            np.array([sign], dtype=np.float64), np.array([d], dtype=np.float64),
            np.array([m], dtype=np.float64), np.array([sec], dtype=np.float64),
            np.array([fr], dtype=np.float64),
        )[0]
    )


def degree_to_dms_parts(value: float):
    """dms.rs:329-352 -> (sign, degree, minute, second, fract) or None."""
    if value != value or not (-180.0 <= value <= 180.0):
        return None
    mm = 60.0 * (value - np.trunc(value))
    ss = 60.0 * (mm - np.trunc(mm))
    sign = 1 if (value > 0 or (value == 0 and not np.signbit(value))) else -1
    return (
        sign,
        int(abs(np.trunc(value))),
        int(abs(np.trunc(mm))),
        int(abs(np.trunc(ss))),
        abs(ss - np.trunc(ss)),
    )


def _fract_str(fract: float) -> str:
    """dms.rs:117-126: shortest round-trip decimal of the fraction in
    positional notation (Rust's f64 Display never uses scientific
    form), leading '0' and trailing zeros trimmed ('' when zero)."""
    if fract == 0.0:
        return ""
    s = np.format_float_positional(fract, unique=True, trim="-")
    return s.lstrip("0").rstrip("0")


def format_dms_scalar(value: float) -> str | None:
    """Compact DMS notation (dms.rs:146-159), e.g.
    36.103774791666666 -> '360613.589249999997719'."""
    parts = degree_to_dms_parts(value)
    if parts is None:
        return None
    sign, deg, minute, sec, fract = parts
    fs = _fract_str(fract)
    if deg == 0 and minute == 0 and sec == 0 and fs == "":
        body = "0"
    elif deg == 0 and minute == 0:
        body = f"{sec}{fs}"
    elif deg == 0:
        body = f"{minute}{sec:02d}{fs}"
    else:
        body = f"{deg}{minute:02d}{sec:02d}{fs}"
    return ("-" if sign < 0 else "") + body


@F.pandas_udf(DoubleType())
def dms_to_degree_udf(s: pd.Series) -> pd.Series:
    return s.map(lambda v: dms_to_degree_scalar(v) if v is not None else None)


@F.pandas_udf(StringType())
def degree_to_dms_udf(v: pd.Series) -> pd.Series:
    return v.map(lambda x: format_dms_scalar(x) if x == x else None)
