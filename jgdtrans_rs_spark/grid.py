"""Par-file parsing and the broadcastable mesh parameter grid.

Reimplements the reference's par module (/root/reference/src/par.rs)
semantics: fixed-width per-format layouts (par.rs:642-653), absent
columns filled with 0.0 — not NaN — (par.rs:396-466), description =
first N header lines joined (par.rs:360-366), positional parse errors
(par.rs:744-859).

The grid itself is stored as numpy arrays sorted by meshcode so that
executor-side lookup is an O(log n) ``searchsorted`` gather — the
Spark-side equivalent of the reference's HashMap probe
(par.rs:283-285) without paying 4 broadcast-hash-join shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .mesh import UNIT_FIVE, UNIT_ONE

# (header_lines, meshcode_slice, lat_slice, lon_slice, alt_slice)
# verbatim from par.rs:642-653 (Rust半open ranges -> Python slices).
PAR_LAYOUTS: dict[str, tuple] = {
    "TKY2JGD": (2, (0, 8), (9, 18), (19, 28), None),
    "PatchJGD": (16, (0, 8), (9, 18), (19, 28), None),
    "PatchJGD_H": (16, (0, 8), None, None, (9, 18)),
    "HyokoRev": (16, (0, 8), None, None, (12, 21)),
    "PatchJGD_HV": (16, (0, 8), (9, 18), (19, 28), (29, 38)),
    "SemiDynaEXE": (16, (0, 8), (9, 18), (19, 28), (29, 38)),
    "geonetF3": (18, (0, 8), (12, 21), (22, 31), (32, 41)),
    "ITRF2014": (18, (0, 8), (12, 21), (22, 31), (32, 41)),
}

# par.rs:57-66: format -> mesh unit.
FORMAT_MESH_UNIT: dict[str, int] = {
    "TKY2JGD": UNIT_ONE,
    "PatchJGD": UNIT_ONE,
    "PatchJGD_H": UNIT_ONE,
    "PatchJGD_HV": UNIT_ONE,
    "HyokoRev": UNIT_ONE,
    "SemiDynaEXE": UNIT_FIVE,
    "geonetF3": UNIT_FIVE,
    "ITRF2014": UNIT_FIVE,
}


class ParseParError(ValueError):
    """Positional parse error (par.rs:744-859)."""

    def __init__(self, kind: str, lineno: int, start: int, end: int, column: str | None):
        self.kind = kind
        self.lineno = lineno
        self.start = start
        self.end = end
        self.column = column
        super().__init__(
            f"parse error: {kind}, column {column}, line {lineno}, range {start}..{end}"
        )


def _ksum(vs) -> float:
    """Improved Kahan–Babuška compensated sum (transformer.rs:9-22).

    Serial by construction — float addition is not associative and the
    reference's statistics goldens depend on this exact algorithm over
    meshcode-sorted input.
    """
    s = 0.0
    c = 0.0
    for v in vs:
        v = float(v)
        t = s + v
        if s >= v:
            c += (s - t) + v
        else:
            c += (v - t) + s
        s = t
    return s + c


def _stat_from_array(vs: np.ndarray) -> dict:
    """``StatisticData::from_array`` (transformer.rs:190-237).

    Note the reference's (unusual) std formula: sqrt(ksum((sum-v)^2)/n)
    where ``sum`` is the *total*, not the mean — reproduced verbatim.
    """
    none = {"count": None, "mean": None, "std": None, "abs": None, "min": None, "max": None}
    if vs.size == 0:
        return none
    total = _ksum(vs)
    count = int(vs.size)
    if np.isnan(total):
        nan = float("nan")
        return {"count": count, "mean": nan, "std": nan, "abs": nan, "min": nan, "max": nan}
    length = float(count)
    std_terms = [(total - float(v)) ** 2 for v in vs]
    abs_terms = [abs(float(v)) for v in vs]
    return {
        "count": count,
        "mean": total / length,
        "std": (_ksum(std_terms) / length) ** 0.5,
        "abs": _ksum(abs_terms) / length,
        "min": float(np.min(vs)),
        "max": float(np.max(vs)),
    }


@dataclass
class MeshGrid:
    """The broadcastable parameter table: ``ParData`` re-expressed as
    meshcode-sorted columnar arrays (transformer.rs:43-50, par.rs:72-93).

    Units: dlat/dlon in **seconds**, dalt in metres (transformer.rs:26).
    """

    codes: np.ndarray          # int64, sorted ascending, unique
    dlat_sec: np.ndarray       # float64
    dlon_sec: np.ndarray       # float64
    dalt_m: np.ndarray         # float64
    mesh_unit: int             # 1 or 5
    format: str = "SemiDynaEXE"
    description: str | None = field(default=None, repr=False)

    @classmethod
    def from_dict(cls, parameters: dict[int, tuple], format: str = "SemiDynaEXE",
                  description: str | None = None) -> "MeshGrid":
        codes = np.array(sorted(parameters), dtype=np.int64)
        p = np.array([parameters[int(c)] for c in codes], dtype=np.float64).reshape(-1, 3)
        return cls(
            codes=codes,
            dlat_sec=np.ascontiguousarray(p[:, 0]),
            dlon_sec=np.ascontiguousarray(p[:, 1]),
            dalt_m=np.ascontiguousarray(p[:, 2]),
            mesh_unit=FORMAT_MESH_UNIT[format],
            format=format,
            description=description,
        )

    def __len__(self) -> int:
        return int(self.codes.size)

    def lookup(self, codes: np.ndarray):
        """Vectorized ``ParameterSet::get`` (transformer.rs:257-263):
        gather (dlat_sec, dlon_sec, dalt_m, found_mask) for an int64
        meshcode array.  Missing codes return 0.0 with found=False."""
        codes = np.asarray(codes, dtype=np.int64)
        idx = np.searchsorted(self.codes, codes)
        idx_c = np.minimum(idx, len(self.codes) - 1) if len(self.codes) else idx * 0
        if len(self.codes) == 0:
            found = np.zeros(codes.shape, dtype=bool)
            z = np.zeros(codes.shape, dtype=np.float64)
            return z, z.copy(), z.copy(), found
        found = self.codes[idx_c] == codes
        dlat = np.where(found, self.dlat_sec[idx_c], 0.0)
        dlon = np.where(found, self.dlon_sec[idx_c], 0.0)
        dalt = np.where(found, self.dalt_m[idx_c], 0.0)
        return dlat, dlon, dalt, found

    def lookup_carry(self, codes: np.ndarray, prev_codes: np.ndarray, prev):
        """``lookup`` that reuses a previous gather where the meshcode
        is unchanged — bit-identical by construction (same code ->
        same parameter row).

        The chained kernels (backward_compat's two forward_corr steps,
        the Newton prepare/verify pair) resolve points that moved by
        ~the correction magnitude (1e-5 deg) or DELTA (3.3e-3 deg),
        far below the cell size, so typically >90%% of lanes keep all
        four corner codes and skip the searchsorted entirely."""
        prev_dlat, prev_dlon, prev_dalt, prev_found = prev
        same = codes == prev_codes
        if same.all():
            return prev_dlat, prev_dlon, prev_dalt, prev_found
        miss = ~same
        d1, d2, d3, f = self.lookup(codes[miss])
        dlat = prev_dlat.copy()
        dlon = prev_dlon.copy()
        dalt = prev_dalt.copy()
        found = prev_found.copy()
        dlat[miss] = d1
        dlon[miss] = d2
        dalt[miss] = d3
        found[miss] = f
        return dlat, dlon, dalt, found

    def statistics(self) -> dict[str, dict]:
        """``Transformer::statistics`` (transformer.rs:504-528): exact
        compensated stats per component over meshcode-sorted params."""
        horizontal = np.hypot(self.dlat_sec, self.dlon_sec)
        return {
            "latitude": _stat_from_array(self.dlat_sec),
            "longitude": _stat_from_array(self.dlon_sec),
            "altitude": _stat_from_array(self.dalt_m),
            "horizontal": _stat_from_array(horizontal),
        }

    def to_json(self) -> str:
        """serde-style (de)serialization round-trip (lib.rs:98-136,
        par.rs:71-92): format + description + parameter map."""
        import json

        return json.dumps({
            "format": self.format,
            "description": self.description,
            "parameter": {
                str(int(c)): {"latitude": float(a), "longitude": float(b), "altitude": float(h)}
                for c, a, b, h in zip(self.codes, self.dlat_sec, self.dlon_sec, self.dalt_m)
            },
        })

    @classmethod
    def from_json(cls, s: str) -> "MeshGrid":
        import json

        d = json.loads(s)
        params = {
            int(c): (p["latitude"], p["longitude"], p["altitude"])
            for c, p in d["parameter"].items()
        }
        return cls.from_dict(params, format=d["format"], description=d.get("description"))

    def to_rows(self) -> list[tuple]:
        """(meshcode, dlat_sec, dlon_sec, dalt_m) rows, sorted by code —
        for building a small Spark/DuckDB side table."""
        return [
            (int(c), float(a), float(b), float(h))
            for c, a, b, h in zip(self.codes, self.dlat_sec, self.dlon_sec, self.dalt_m)
        ]


_ASCII_DIGITS = frozenset("0123456789")


def _u32_cast(raw: str) -> int:
    """Rust ``u32::from_str`` parity: optional leading '+', ASCII
    digits only, overflow errors.  Python's bare int() is looser — it
    accepts '_' separators ('1_2' -> 12), Unicode decimal digits, and
    negatives, all of which the reference rejects as ParseInt."""
    s = raw[1:] if raw.startswith("+") else raw
    if not s or not all(c in _ASCII_DIGITS for c in s):
        raise ValueError(raw)
    v = int(s)
    if v > 4294967295:
        raise ValueError(raw)
    return v


def _f64_cast(raw: str) -> float:
    """Rust ``f64::from_str`` parity: no '_' separators, ASCII only
    (Python float() accepts both)."""
    if "_" in raw or not raw.isascii():
        raise ValueError(raw)
    return float(raw)


def _parse_field(line: str, rng, lineno: int, column: str, caster):
    start, end = rng
    if end > len(line):
        raise ParseParError("ColumnNotFound", lineno, start, end, column)
    raw = line[start:end].strip()
    try:
        return caster(raw)
    except ValueError:
        kind = "ParseInt" if caster is _u32_cast else "ParseFloat"
        raise ParseParError(kind, lineno, start, end, column) from None


def parse_par(text: str, format: str, description: str | None = None) -> MeshGrid:
    """Deserialize par-formatted text (par.rs:335-481, 641-671).

    Lines split as Rust ``str::lines`` (\\n, tolerating trailing \\r).
    Header lines become the description (joined + trailing newline);
    an explicit ``description`` overrides it
    (``ParParser::parse_with_description`` /
    ``Transformer::from_str_with_description``, par.rs:368-394);
    absent component columns fill 0.0.
    """
    header, code_rng, lat_rng, lon_rng, alt_rng = PAR_LAYOUTS[format]
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines = lines[:-1]
    lines = [ln[:-1] if ln.endswith("\r") else ln for ln in lines]
    if len(lines) < header:
        last_len = len(lines[-1]) if lines else 0
        raise ParseParError("Header", len(lines), 0, last_len, None)

    if description is None:
        description = "\n".join(lines[:header]) + "\n"
    parameters: dict[int, tuple] = {}
    for off, line in enumerate(lines[header:]):
        lineno = header + off + 1
        code = _parse_field(line, code_rng, lineno, "Meshcode", _u32_cast)
        lat = _parse_field(line, lat_rng, lineno, "Latitude", _f64_cast) if lat_rng else 0.0
        lon = _parse_field(line, lon_rng, lineno, "Longitude", _f64_cast) if lon_rng else 0.0
        alt = _parse_field(line, alt_rng, lineno, "Altitude", _f64_cast) if alt_rng else 0.0
        parameters[code] = (lat, lon, alt)

    return MeshGrid.from_dict(parameters, format=format, description=description)


def load_par(path: str, format: str) -> MeshGrid:
    """``Transformer::from_str`` file-path convenience
    (transformer.rs:395-449).  Driver-side: par files are small
    relative to the cluster (O(10^5..10^6) rows) and the result is
    broadcast, so a distributed parse would only add overhead."""
    with open(path, encoding="utf-8") as f:
        return parse_par(f.read(), format)


class GridBuilder:
    """Fluent incremental builder for a ``MeshGrid`` / ``Engine`` —
    the relational twin of the reference's ``TransformerBuilder``
    (builder.rs:32-230): ``format()`` + ``parameter()``/
    ``parameters()`` accumulate, ``build()`` produces the sorted
    columnar grid (``build_engine(spark)`` wraps it in an Engine).

    Semantics pinned to the reference: later inserts of the same
    meshcode overwrite (HashMap insert), ``build()`` raises when the
    format was never assigned (builder.rs:153-159 panics with
    'mesh_unit is not assigned'), and a parameter may be a 2-tuple
    (horizontal-only formats fill altitude 0.0 like
    ``Parameter::from((f64, f64))``)."""

    def __init__(self) -> None:
        self._format: str | None = None
        self._params: dict[int, tuple] = {}
        self._description: str | None = None

    def format(self, format: str) -> "GridBuilder":
        if format not in FORMAT_MESH_UNIT:
            raise ValueError(f"unknown format: {format!r}")
        self._format = format
        return self

    def description(self, description: str) -> "GridBuilder":
        self._description = description
        return self

    def parameter(self, meshcode: int, parameter) -> "GridBuilder":
        p = tuple(float(v) for v in parameter)
        if len(p) == 2:  # Parameter::from((latitude, longitude))
            p = (*p, 0.0)
        if len(p) != 3:
            raise ValueError("parameter must be (dlat_sec, dlon_sec[, dalt_m])")
        self._params[int(meshcode)] = p
        return self

    def parameters(self, parameters) -> "GridBuilder":
        items = parameters.items() if hasattr(parameters, "items") else parameters
        for meshcode, p in items:
            self.parameter(meshcode, p)
        return self

    def build(self) -> MeshGrid:
        if self._format is None:
            raise ValueError("mesh_unit is not assigned")  # builder.rs:155
        return MeshGrid.from_dict(self._params, format=self._format,
                                  description=self._description)

    def build_engine(self, spark, strict_bounds: bool = True):
        """Build and broadcast: the Spark-shaped ``build()``."""
        from .engine import Engine

        return Engine(spark, self.build(), strict_bounds=strict_bounds)
