"""Pure Column expression helpers — JVM-side, whole-stage-codegen
friendly (no Python in the plan).

These are the declarative twins of the numpy kernels for the pieces
that don't need the float-bit ulp trick: validation/normalization
(point.rs:9-32, 212-223), floor-path meshcode, quadkey.  Use the
engine's kernels when reference-exact boundary semantics matter; use
these when staying inside codegen matters (filters pushed to the scan,
no Arrow hop).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_latitude(c: Column) -> Column:
    """point.rs:9-19 as nested CASE; NaN passes through."""
    s = c % F.lit(360.0)
    in_range = c.between(-90.0, 90.0) | F.isnan(c)
    case1 = ~s.between(-270.0, 270.0)
    case2 = ~s.between(-90.0, 90.0)
    wrapped = (
        F.when(case1, s - F.signum(s) * 360.0)
        .when(case2, F.signum(s) * 180.0 - s)
        .otherwise(s)
    )
    return F.when(in_range, c).otherwise(wrapped)


def normalize_longitude(c: Column) -> Column:
    """point.rs:23-32 as nested CASE; NaN passes through."""
    s = c % F.lit(360.0)
    in_range = c.between(-180.0, 180.0) | F.isnan(c)
    case1 = ~((s >= -180.0) & (s < 180.0))
    wrapped = F.when(case1, s - F.signum(s) * 360.0).otherwise(s)
    return F.when(in_range, c).otherwise(wrapped)


def valid_point(lat: Column, lon: Column) -> Column:
    """Point::new bounds (point.rs:212-223) — pushes to the scan.
    NULL-safe: FALSE (not NULL) for missing coordinates, so the
    negated filter keeps them in the quarantine split."""
    return (lat.isNotNull() & lon.isNotNull()
            & lat.between(-90.0, 90.0) & lon.between(-180.0, 180.0)
            & ~F.isnan(lat) & ~F.isnan(lon))


def mesh_digits(v: Column):
    """floor-path digit extraction (coord.rs:203-229; no ulp bump)."""
    i = F.floor(v).cast("long")
    first = i % 100
    second = F.floor(v * 8.0).cast("long") - i * 8
    third = F.floor(v * 80.0).cast("long") - i * 80 - second * 10
    return first, second, third


def meshcode(lat: Column, lon: Column, unit: int = 1) -> Column:
    """South-west meshcode of the containing cell, -1 outside the mesh
    domain.  Pure Column math — partition-prunable tile key."""
    latv = lat * 3.0 / 2.0
    la1, la2, la3 = mesh_digits(latv)
    lo1, lo2, lo3 = mesh_digits(lon)
    if unit == 5:
        la3 = F.when(la3 < 5, 0).otherwise(5)
        lo3 = F.when(lo3 < 5, 0).otherwise(5)
    code = (la1 * 100 + lo1) * 10000 + (la2 * 10 + lo2) * 100 + (la3 * 10 + lo3)
    valid = (latv >= 0.0) & (latv < 100.0) & (lon >= 100.0) & (lon < 180.0)
    return F.when(valid, code).otherwise(F.lit(-1)).cast("long")


def quadkey(lat: Column, lon: Column, level: int = 15) -> Column:
    """S2-style interleaved quadtree cell id (mesh.quadkey twin)."""
    n = 1 << level
    ix = F.least(
        F.greatest(F.floor((lon + 180.0) / 360.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    iy = F.least(
        F.greatest(F.floor((lat + 90.0) / 180.0 * n).cast("long"), F.lit(0)),
        F.lit(n - 1),
    )
    out = F.lit(0).cast("long")
    for b in range(level):
        out = out + F.shiftleft(F.shiftright(ix, b) % 2, 2 * b)
        out = out + F.shiftleft(F.shiftright(iy, b) % 2, 2 * b + 1)
    return out


def dms_to_degree(c: Column) -> Column:
    """Pure-Column DMS-string parser — the zero-Python fast path for
    ``dms.dms_to_degree_scalar`` (identical output, including NaN on
    the grammar/bounds errors of dms.rs:194-299 FromStr).

    Grammar: optional +/-, '_' separators allowed anywhere except
    leading a digit group, integer or fraction part may be absent (not
    both).  degree = acc/10000 must fit a u8; minute/second are
    unvalidated (FromStr parity).  Arithmetic is pinned to the
    reference's non-fma order (dms.rs:513-522):
    (sec + fract)*(1/3600) + (min*(1/60) + deg).
    """
    valid = c.rlike(r"^[+-]?([0-9][0-9_]*(\.([0-9][0-9_]*)?)?|\.[0-9][0-9_]*)$")
    clean = F.regexp_replace(F.translate(c, "_", ""), r"^[+-]", "")
    neg = c.startswith("-")
    int_str = F.regexp_replace(F.substring_index(clean, ".", 1), r"^0+", "")
    frac_str = F.when(clean.contains("."), F.substring_index(clean, ".", -1)).otherwise(F.lit(""))
    # 8+ significant integer digits -> degree > 255 -> OutOfBounds
    # (u8::try_from); also covers u64-overflow-length inputs without a
    # bigint cast
    acc = F.when(int_str == "", F.lit(0)).otherwise(int_str.cast("long"))
    degree = (acc / 10000).cast("long")
    minute = ((acc % 10000) / 100).cast("long")
    second = acc % 100
    fract = (
        F.when(frac_str == "", F.lit(0.0))
        .otherwise(F.concat(F.lit("0."), frac_str).cast("double"))
    )
    temp = minute.cast("double") * F.lit(1.0 / 60.0) + degree.cast("double")
    temp = (second.cast("double") + fract) * F.lit(1.0 / 3600.0) + temp
    value = F.when(neg, -temp).otherwise(temp)
    ok = valid & (F.length(int_str) <= F.lit(7)) & (degree <= 255)
    return (
        F.when(c.isNull(), F.lit(None).cast("double"))
        .when(ok, value)
        .otherwise(F.lit(float("nan")))
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns as a pure
    Column expression (F.zip_with product + F.aggregate fold) — the
    zero-Python dot product.  Elements are cast to double before
    multiplying so float32 inputs don't lose precision in the products.
    """
    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    # try_divide: a zero-norm vector yields NULL (ANSI division by
    # zero would throw); callers must treat NULL as "no similarity"
    return F.try_divide(dot(a, b), F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def degree_to_dms_compact(c: Column) -> Column:
    """Pure-Column compact DMS formatter (dms.rs:115-163) for the
    common case: values whose seconds-fraction is EXACTLY a <= 6-digit
    decimal (fract parses back bit-equal from its 6-digit rounding).
    Returns NULL outside that case — callers needing full
    shortest-round-trip parity use ``degree_to_dms_hybrid`` (or the
    UDF directly); hot pipelines formatting tile labels / web output
    stay entirely in codegen here.

    Decomposition is bit-pinned to dms.rs:329-352 (trunc/fract
    two-step, magnitudes via abs — float-symmetric, so identical bits
    to the reference's signed path); the shortest-repr contract holds
    because at most ONE <= 6-digit decimal can round-trip any double
    (decimal spacing 1e-6 dwarfs the ulp), so the trimmed 6-digit
    string IS the shortest form whenever the round-trip test passes.
    """
    in_bounds = c.isNotNull() & ~F.isnan(c) & c.between(-180.0, 180.0)
    av = F.abs(c)
    deg = F.floor(av).cast("long")
    mm = (av - deg.cast("double")) * 60.0
    minute = F.floor(mm).cast("long")
    ss = (mm - minute.cast("double")) * 60.0
    sec = F.floor(ss).cast("long")
    fract = ss - sec.cast("double")
    sixn = F.floor(fract * 1000000.0 + 0.5).cast("long")
    sixs = F.lpad(sixn.cast("string"), 6, "0")
    roundtrip_ok = F.concat(F.lit("0."), sixs).cast("double") == fract
    fs = (
        F.when(sixn == 0, F.lit(""))
        .otherwise(F.concat(F.lit("."), F.regexp_replace(sixs, "0+$", "")))
    )
    deg_s = deg.cast("string")
    min2 = F.lpad(minute.cast("string"), 2, "0")
    sec2 = F.lpad(sec.cast("string"), 2, "0")
    body = (
        F.when((deg == 0) & (minute == 0) & (sec == 0) & (fs == ""), F.lit("0"))
        .when((deg == 0) & (minute == 0), F.concat(sec.cast("string"), fs))
        .when(deg == 0, F.concat(minute.cast("string"), sec2, fs))
        .otherwise(F.concat(deg_s, min2, sec2, fs))
    )
    # sign: negative values AND negative zero ('-0' per Rust Display;
    # CAST(-0.0 AS STRING) keeps the sign in Spark and DuckDB alike)
    negative = c.cast("string").startswith("-")
    out = F.when(negative, F.concat(F.lit("-"), body)).otherwise(body)
    return F.when(in_bounds & roundtrip_ok, out).otherwise(F.lit(None).cast("string"))


def degree_to_dms_hybrid(c: Column) -> Column:
    """Column formatter with shortest-round-trip UDF fallback: exact
    <= 6-digit fractions format in codegen, the rest through
    dms.degree_to_dms_udf.  NOTE: Spark extracts Python UDFs into an
    unconditional ArrowEvalPython stage, so the fallback EXECUTES for
    every row even when the Column branch wins — use
    degree_to_dms_compact alone when the corpus is known 6-digit-exact
    and the Arrow hop matters."""
    from ..dms import degree_to_dms_udf

    return F.coalesce(degree_to_dms_compact(c), degree_to_dms_udf(c))
