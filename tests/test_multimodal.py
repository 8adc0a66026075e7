"""Multimodal binary-column operator tests."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jgdtrans_rs_spark.operators import multimodal
from jgdtrans_rs_spark.sources import pages as pages_src
from tests.conftest import SF_TINY


@pytest.fixture(scope="module")
def pages(spark):
    return pages_src.synth_pages(spark, SF_TINY).limit(50).cache()


def test_binary_meta(pages):
    out = multimodal.binary_meta(pages, "html").select("n_bytes", "magic", "modality")
    rows = out.collect()
    assert all(r.modality == "html" for r in rows)
    assert all(r.magic == "<html>" for r in rows)
    assert all(r.n_bytes > 50 for r in rows)


def test_binary_meta_magic_detection(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x89PNG\r\n\x1a\n1234")),
         (2, bytearray(b"RIFF1234WAVE")),
         (3, bytearray(b"garbage"))],
        "id long, html binary",
    )
    rows = {r.id: r.modality for r in multimodal.binary_meta(df, "html").collect()}
    assert rows[1] == "image/png"
    assert rows[2] == "audio/wav"
    assert rows[3] == "unknown"


def test_byte_histogram_features(pages):
    out = multimodal.byte_histogram_features(pages, "html").select("pkey", "features")
    rows = out.collect()
    for r in rows:
        f = np.array(r.features)
        assert f.shape == (multimodal.N_BUCKETS,)
        assert abs(f.sum() - 1.0) < 1e-12
    # determinism: same payload -> same features
    again = {r.pkey: r.features for r in out.collect()}
    assert all(again[r.pkey] == r.features for r in rows)


def test_sample_offsets(pages):
    rows = multimodal.sample_offsets(pages, "html", n=4).select("html", "frame_offsets").collect()
    for r in rows:
        n = len(bytes(r.html))
        assert list(r.frame_offsets) == [0, n // 4, (2 * n) // 4, (3 * n) // 4]


def test_decode_image_stub_for_codec_formats(pages):
    """jpeg (entropy-coded) still requires an imaging library (absent
    here) — the stub with real plumbing remains.  png no longer stubs:
    it decodes from scratch via stdlib zlib (test_decode_png_real)."""
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(pages, "html", format="jpeg")


def _bmp_bytes(pixels, top_down=False, pad_garbage=b"\x00"):
    """Hand-rolled 24-bit BI_RGB BMP encoder (independent of the
    decoder under test): ``pixels`` is an HxWx3 RGB list; rows are
    BGR, padded to 4 bytes, bottom-up unless top_down."""
    h = len(pixels)
    w = len(pixels[0])
    stride = (w * 3 + 3) & ~3
    off = 14 + 40
    body = bytearray()
    rows = pixels if top_down else pixels[::-1]
    for row in rows:
        line = bytearray()
        for r, g, b in row:
            line += bytes((b, g, r))
        line += pad_garbage * (stride - len(line))
        body += line
    hdr = (b"BM" + (off + len(body)).to_bytes(4, "little") + b"\x00" * 4
           + off.to_bytes(4, "little")
           + (40).to_bytes(4, "little")
           + w.to_bytes(4, "little", signed=True)
           + ((-h if top_down else h)).to_bytes(4, "little", signed=True)
           + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
           + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
           + b"\x00" * 16)
    return bytes(hdr + body)


def test_decode_bmp_real(spark):
    """The from-scratch BMP decoder: exact pixels for bottom-up AND
    top-down crafted files (stride padding exercised by w=3), NULL
    struct fields for non-BMP payloads, and the same payload flows
    through the resize kernel (the decode -> downstream plumbing)."""
    px = [[(255, 0, 0), (0, 255, 0), (0, 0, 255)],
          [(1, 2, 3), (4, 5, 6), (7, 8, 9)]]     # 3x2 -> stride pad 3 bytes
    flat = [float(v) for row in px for pix in row for v in pix]
    rows = [
        (1, _bmp_bytes(px)),
        (2, _bmp_bytes(px, top_down=True, pad_garbage=b"\xaa")),
        (3, b"<html>not an image</html>"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "pkey long, html binary")
    out = {r.pkey: r.pixels for r in
           multimodal.decode_image(df, "html").select("pkey", "html", "pixels").collect()}
    for k in (1, 2):
        assert out[k].width == 3 and out[k].height == 2 and out[k].channels == 3
        assert list(out[k].pixels) == flat
    assert out[3].width is None and out[3].pixels is None
    assert out[4].width is None
    # numpy kernel direct: truncated file rejected
    assert multimodal.decode_bmp_np(_bmp_bytes(px)[:-4]) is None
    # the identical payload drives the resize kernel (shared plumbing)
    resized = multimodal.resize_bytes(df, k=8).select("pkey", "resized").collect()
    assert all(len(r.resized) == 8 for r in resized)


def test_grid_json_roundtrip(semidyna_grid):
    from jgdtrans_rs_spark.grid import MeshGrid

    s = semidyna_grid.to_json()
    g2 = MeshGrid.from_json(s)
    assert (g2.codes == semidyna_grid.codes).all()
    assert (g2.dlat_sec == semidyna_grid.dlat_sec).all()
    assert g2.format == semidyna_grid.format
    assert g2.mesh_unit == semidyna_grid.mesh_unit


def test_raster_roundtrip(spark, semidyna_grid):
    """rasterize -> vectorize: every point lies inside its cell's
    recovered corner geometry."""
    from jgdtrans_rs_spark.engine import Engine
    from jgdtrans_rs_spark.operators import raster
    from jgdtrans_rs_spark.plans import oracle as osql

    spark.read.parquet("/root/testdata/sf0.001/orders.parquet").createOrReplaceTempView("orders")
    pts = spark.sql(osql.points_sql("orders"))
    eng = Engine(spark, semidyna_grid)
    tiled = eng.assign_tiles(pts)
    r = raster.rasterize(tiled, "alt")
    v = raster.vectorize(r.select("meshcode"), semidyna_grid.mesh_unit)
    j = tiled.filter(F.col("meshcode") != -1).join(v, "meshcode")
    outside = j.filter(
        (F.col("lat") < F.col("sw_lat")) | (F.col("lat") >= F.col("ne_lat"))
        | (F.col("lon") < F.col("sw_lon")) | (F.col("lon") >= F.col("ne_lon"))
    ).count()
    assert outside == 0
    assert r.count() > 0


def test_resize_bytes_shape_and_values(spark):
    """resize plumbing: always exactly k values; block means match a
    hand computation; empty/NULL payloads give zeros."""
    import numpy as np

    from jgdtrans_rs_spark.operators.multimodal import resize_bytes

    rows = [
        (1, bytes(range(8))),       # 8 bytes -> k=4 blocks of 2
        (2, b"\xff" * 3),           # shorter than k
        (3, b""),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "pkey long, html binary")
    out = {r["pkey"]: r["resized"]
           for r in resize_bytes(df, k=4).select("pkey", "resized").collect()}
    assert all(len(v) == 4 for v in out.values())
    assert out[1] == [0.5, 2.5, 4.5, 6.5]
    assert out[2][:3] != [0.0, 0.0, 0.0]  # data present
    assert out[3] == [0.0] * 4 and out[4] == [0.0] * 4


def test_decode_pnm_real(spark):
    """The from-scratch Netpbm decoder (VERDICT r04 #5): exact pixels
    for binary PPM (P6) with header comments, binary PGM (P5), and the
    ASCII twins (P3/P2); NULL struct fields for malformed payloads;
    the identical payload flows through the resize kernel — mirroring
    test_decode_bmp_real."""
    import numpy as np

    px = [[(255, 0, 0), (0, 255, 0), (0, 0, 255)],
          [(1, 2, 3), (4, 5, 6), (7, 8, 9)]]       # 3x2 RGB
    flat_rgb = [float(v) for row in px for pix in row for v in pix]
    raster = bytes(v for row in px for pix in row for v in pix)
    p6 = b"P6\n# comment line\n3 2\n# another\n255\n" + raster
    gray = [[10, 20, 30], [40, 50, 60]]
    flat_gray = [float(v) for row in gray for v in row]
    p5 = b"P5 3 2 255 " + bytes(v for row in gray for v in row)
    p3 = ("P3\n3 2\n255\n" +
          " ".join(str(v) for row in px for pix in row for v in pix)).encode()
    p2 = ("P2  3\t2\n255\n" +
          "\n".join(str(v) for row in gray for v in row)).encode()
    rows = [
        (1, p6), (2, p5), (3, p3), (4, p2),
        (5, b"P6\n3 2\n255\n" + raster[:-1]),      # truncated raster
        (6, b"P6\n3 2\n65535\n" + raster),          # 16-bit: unsupported
        (7, b"P7 arbitrary"), (8, None),
        # ASCII sample wider than int64: OverflowError (NOT a
        # ValueError subclass) must dead-letter, not kill the task
        (9, b"P2 1 1 255 99999999999999999999"),
    ]
    df = spark.createDataFrame(rows, "pkey long, html binary")
    out = {r.pkey: r.pixels for r in
           multimodal.decode_image(df, "html", format="ppm")
           .select("pkey", "pixels").collect()}
    assert out[1].width == 3 and out[1].height == 2 and out[1].channels == 3
    assert list(out[1].pixels) == flat_rgb
    assert out[2].width == 3 and out[2].height == 2 and out[2].channels == 1
    assert list(out[2].pixels) == flat_gray
    assert list(out[3].pixels) == flat_rgb and out[3].channels == 3
    assert list(out[4].pixels) == flat_gray and out[4].channels == 1
    for k in (5, 6, 7, 8, 9):
        assert out[k].width is None and out[k].pixels is None
    # numpy kernel direct: P5 16-bit and header-garbage rejected
    assert multimodal.decode_pnm_np(b"P5 3 2 999 " + b"\x00" * 12) is None
    assert multimodal.decode_pnm_np(b"P6 3 -2 255 " + raster) is None
    # P6 vs BMP decoder separation: a BMP payload is not a PNM
    assert multimodal.decode_pnm_np(b"BM" + b"\x00" * 60) is None
    # shared downstream plumbing
    resized = multimodal.resize_bytes(df, k=8).select("pkey", "resized").collect()
    assert all(len(r.resized) == 8 for r in resized)


def _png_bytes(img, ctype, filters, split_idat=False):
    """Minimal reference PNG encoder for the decoder test: 8-bit,
    non-interlaced; ``filters[y]`` picks the per-scanline filter type
    and the filtered bytes are computed forward per the spec, so a
    correct decoder must invert them exactly."""
    import struct
    import zlib

    import numpy as np

    h, w, c = img.shape
    raw = img.reshape(h, w * c).astype(np.int64)
    lines = []
    for y in range(h):
        f = filters[y % len(filters)]
        cur = raw[y]
        prev = raw[y - 1] if y else np.zeros(w * c, dtype=np.int64)
        filt = np.zeros(w * c, dtype=np.int64)
        for x in range(w * c):
            a = cur[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (cur[x] - pred) % 256
        lines.append(bytes([f]) + bytes(filt.astype(np.uint8)))

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    comp = zlib.compress(b"".join(lines))
    if split_idat:
        mid = len(comp) // 2
        idat = chunk(b"IDAT", comp[:mid]) + chunk(b"IDAT", comp[mid:])
    else:
        idat = chunk(b"IDAT", comp)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + idat + chunk(b"IEND", b"")


def test_decode_png_real(spark):
    """The from-scratch PNG decoder: exact round-trip through a
    reference encoder for every filter type and every supported color
    type (gray/RGB/gray+alpha/RGBA), multi-IDAT streams, and dead
    letters for CRC corruption, palette/16-bit/interlaced headers,
    truncation, and undecompressible IDAT."""
    import numpy as np

    rng = np.random.RandomState(7)
    cases = {}
    for ctype, c in ((0, 1), (2, 3), (4, 2), (6, 4)):
        img = rng.randint(0, 256, size=(6, 5, c)).astype(np.uint8)
        cases[ctype] = img
        # every filter type appears (rows cycle 0,1,2,3,4,0)
        got = multimodal.decode_png_np(
            _png_bytes(img, ctype, filters=[0, 1, 2, 3, 4]))
        assert got is not None and got.shape == img.shape, ctype
        assert (got == img).all(), f"ctype {ctype} round-trip"

    rgb = cases[2]
    # multi-IDAT: same pixels
    got = multimodal.decode_png_np(
        _png_bytes(rgb, 2, filters=[4], split_idat=True))
    assert (got == rgb).all()

    ok = _png_bytes(rgb, 2, filters=[0])
    # CRC corruption: flip one IDAT payload byte -> dead letter
    idx = ok.index(b"IDAT") + 6
    corrupt = ok[:idx] + bytes([ok[idx] ^ 0xFF]) + ok[idx + 1:]
    assert multimodal.decode_png_np(corrupt) is None
    # truncation mid-chunk
    assert multimodal.decode_png_np(ok[:len(ok) // 2]) is None
    # unsupported headers: palette (3), 16-bit, interlaced — rebuild
    # with a valid CRC so the header check itself is what rejects
    import struct
    import zlib as _z

    def hdr_variant(depth, ct, interlace):
        ihdr = struct.pack(">IIBBBBB", 5, 6, depth, ct, 0, 0, interlace)
        chk = (struct.pack(">I", 13) + b"IHDR" + ihdr
               + struct.pack(">I", _z.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF))
        return ok[:8] + chk + ok[8 + 25:]

    assert multimodal.decode_png_np(hdr_variant(8, 3, 0)) is None
    assert multimodal.decode_png_np(hdr_variant(16, 2, 0)) is None
    assert multimodal.decode_png_np(hdr_variant(8, 2, 1)) is None
    # garbage deflate stream
    bad_idat = (ok[:8] + ok[8:8 + 25]
                + struct.pack(">I", 4) + b"IDAT" + b"\x00\x01\x02\x03"
                + struct.pack(">I", _z.crc32(b"IDAT\x00\x01\x02\x03") & 0xFFFFFFFF)
                + ok[-12:])
    assert multimodal.decode_png_np(bad_idat) is None
    # not a PNG at all
    assert multimodal.decode_png_np(b"BM" + b"\x00" * 64) is None
    assert multimodal.decode_png_np(None) is None

    # Spark plumbing: format='png' through decode_image + resize
    rows = [(1, _png_bytes(rgb, 2, filters=[0, 1, 2, 3, 4])),
            (2, corrupt), (3, None)]
    df = spark.createDataFrame(rows, "pkey long, html binary")
    out = {r.pkey: r.pixels for r in
           multimodal.decode_image(df, "html", format="png")
           .select("pkey", "pixels").collect()}
    assert list(out[1].pixels) == [float(v) for v in rgb.ravel()]
    assert out[2].width is None and out[3].pixels is None
    resized = multimodal.resize_bytes(df, k=8).select("resized").collect()
    assert all(len(r.resized) == 8 for r in resized)


def _wav_bytes(samples, rate=16000, bits=16, extra_chunk=True,
               fmt_tag=1):
    """Minimal RIFF/WAVE PCM encoder for the decoder test: ``samples``
    is an (n_frames, n_channels) float array in [-1, 1]."""
    import struct

    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    ch = arr.shape[1]
    if bits == 16:
        raw = np.clip(np.round(arr * 32768.0), -32768, 32767).astype(
            "<i2").tobytes()
    else:
        raw = (np.clip(np.round(arr * 128.0 + 128.0), 0, 255)
               .astype(np.uint8).tobytes())
    fmt = struct.pack("<HHIIHH", fmt_tag, ch, rate,
                      (rate * ch * bits // 8) & 0xFFFFFFFF,
                      ch * bits // 8, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:  # unknown chunk with odd length: word-align skip
        chunks += b"LIST" + struct.pack("<I", 3) + b"abc\x00"
    chunks += b"data" + struct.pack("<I", len(raw)) + raw
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def test_decode_wav_real(spark):
    """The from-scratch RIFF/WAVE PCM decoder: exact samples for
    16-bit stereo (with an unknown odd-length chunk exercising RIFF
    word alignment) and 8-bit mono; NULL structs for compressed
    formats, truncation, and non-WAV payloads; decoded samples flow
    through the frame-RMS feature kernel."""
    import numpy as np

    t = np.arange(64) / 16000.0
    stereo = np.stack([np.sin(2 * np.pi * 440 * t),
                       np.cos(2 * np.pi * 220 * t)], axis=1) * 0.5
    mono = (np.sin(2 * np.pi * 100 * t) * 0.25).reshape(-1, 1)

    dec = multimodal.decode_wav_np(_wav_bytes(stereo))
    assert dec is not None
    rate, mat = dec
    assert rate == 16000 and mat.shape == (64, 2)
    # bit-exact round trip through the int16 quantizer
    want = np.round(np.clip(stereo * 32768.0, -32768, 32767)) / 32768.0
    assert (mat == want).all()

    rate8, mat8 = multimodal.decode_wav_np(_wav_bytes(mono, bits=8))
    assert mat8.shape == (64, 1)
    want8 = (np.clip(np.round(mono * 128.0 + 128.0), 0, 255) - 128.0) / 128.0
    assert (mat8 == want8).all()

    # rejects: compressed fmt tag, truncated data, not RIFF, 24-bit
    assert multimodal.decode_wav_np(_wav_bytes(mono, fmt_tag=85)) is None
    assert multimodal.decode_wav_np(_wav_bytes(stereo)[:-9]) is None
    assert multimodal.decode_wav_np(b"OggS" + b"\x00" * 60) is None
    assert multimodal.decode_wav_np(None) is None
    # hostile header: rate is 4 unsigned LE bytes but the decode_audio
    # struct is int32 — >= 2^31 must dead-letter, never wrap negative
    assert multimodal.decode_wav_np(_wav_bytes(mono, rate=3_000_000_000)) is None
    assert multimodal.decode_wav_np(_wav_bytes(mono, rate=2**31 - 1)) is not None

    rows = [(1, _wav_bytes(stereo)), (2, _wav_bytes(mono, bits=8)),
            (3, b"not audio"), (4, None)]
    df = spark.createDataFrame(rows, "pkey long, html binary")
    decoded = multimodal.decode_audio(df, "html")
    out = {r.pkey: r.audio for r in decoded.select("pkey", "audio").collect()}
    assert out[1].sample_rate == 16000 and out[1].n_channels == 2
    assert out[1].n_frames == 64 and len(out[1].samples) == 128
    assert list(out[1].samples) == [float(v) for v in want.ravel()]
    assert out[2].n_channels == 1
    assert out[3].sample_rate is None and out[4].samples is None

    featd = multimodal.audio_frame_features(decoded, n_frames=4)
    f = {r.pkey: r.audio_features
         for r in featd.select("pkey", "audio_features").collect()}
    assert len(f[1]) == 4 and all(v > 0 for v in f[1])
    # hand-check frame 0: RMS of the first 32 interleaved samples
    exp0 = float(np.sqrt((want.ravel()[:32] ** 2).mean()))
    assert abs(f[1][0] - exp0) < 1e-12
    assert f[3] is None and f[4] is None  # dead letters propagate
