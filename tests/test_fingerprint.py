"""Perceptual fingerprint + banded-Hamming pair tests.

Covers the decode->dedup bridge three ways: kernel behavior (distance
separation, invariances, degenerate inputs), exact equivalence of
``hamming_pairs`` against a brute-force all-pairs oracle, and the
end-to-end Spark composition (mixed-format corpus -> fingerprints ->
pairs -> dedup_components clusters).
"""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

_SLOW = os.environ.get("SPARK_GRAFT_SLOW", "")

from jgdtrans_rs_spark.operators import fingerprint as fp
from jgdtrans_rs_spark.operators.dedup import dedup_components
from jgdtrans_rs_spark.operators.multimodal import (decode_bmp_np,
                                                    decode_png_np,
                                                    decode_pnm_np)
from tests.test_multimodal import (_bmp_bytes, _gif_bytes, _png_bytes,
                                   _wav_bytes)


def _ham(a, b):
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def _base_img(h=48, w=64):
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    base = (x * 2 + y * 3) % 256
    return np.stack([base, (base * 2) % 256, 255 - base],
                    axis=-1).astype(np.uint8)


def _ppm_bytes(img):
    h, w, _ = img.shape
    return (f"P6 {w} {h} 255\n".encode()
            + img.astype(np.uint8).tobytes())


# ---------------------------------------------------------------------------
# image hash kernels
# ---------------------------------------------------------------------------

def test_image_hash_distance_separation():
    rng = np.random.default_rng(7)
    img = _base_img()
    noisy = np.clip(img.astype(int) + rng.integers(-6, 7, img.shape),
                    0, 255).astype(np.uint8)
    bright = np.clip(img.astype(int) + 30, 0, 255).astype(np.uint8)
    other = rng.integers(0, 256, img.shape).astype(np.uint8)
    for hashfn in (fp.phash64_np, fp.dhash64_np):
        h0 = hashfn(img)
        assert _ham(h0, hashfn(noisy)) <= 3, "small noise must stay near"
        assert _ham(h0, hashfn(bright)) <= 1, \
            "uniform brightness shift must barely move the hash"
        assert _ham(h0, hashfn(other)) >= 16, "unrelated image must be far"


def test_image_hash_cross_format_identity():
    """The same raster encoded as BMP, PNG, and PPM must fingerprint
    IDENTICALLY through the from-scratch decoders — re-encoded exact
    copies are the most common image duplicates in a crawl, and any
    decoder disagreement would break their Hamming distance 0."""
    img = _base_img(32, 40)
    via_bmp = decode_bmp_np(_bmp_bytes(img.tolist()))
    via_png = decode_png_np(_png_bytes(img, 2, [0, 1, 2, 3, 4]))
    via_ppm = decode_pnm_np(_ppm_bytes(img))
    assert np.array_equal(via_bmp, via_png.reshape(via_bmp.shape))
    for hashfn in (fp.phash64_np, fp.dhash64_np):
        assert hashfn(via_bmp) == hashfn(via_png) == hashfn(via_ppm)


def test_image_hash_grayscale_and_degenerate():
    g = _base_img()[:, :, :1]
    assert fp.phash64_np(g) is not None
    assert fp.dhash64_np(g) is not None
    # gray+alpha (PNG color type 4) hashes by its luma channel — this
    # 2-channel lane crashed the matmul before the round-5 review
    ga = np.concatenate([g, np.full_like(g, 200)], axis=2)
    assert fp.phash64_np(ga) == fp.phash64_np(g)
    assert fp.dhash64_np(ga) == fp.dhash64_np(g)
    for bad in (None, np.zeros((0, 0, 3))):
        assert fp.phash64_np(bad) is None
        assert fp.dhash64_np(bad) is None
    # constant image: all DCT ACs equal the median -> deterministic hash
    flat = np.full((16, 16, 3), 127, dtype=np.uint8)
    assert fp.phash64_np(flat) == fp.phash64_np(flat)


def test_dct_matrix_orthonormal():
    d = fp._dct_mat(32)
    assert np.allclose(d @ d.T, np.eye(32), atol=1e-12)


def test_area_resize2d_exact_and_stretch():
    a = np.arange(24, dtype=float).reshape(4, 6)
    r = fp.area_resize2d_np(a, 2, 3)
    expect = a.reshape(2, 2, 3, 2).mean(axis=(1, 3))
    assert np.allclose(r, expect)
    # smaller-than-target input stretches (no divide by zero)
    s = fp.area_resize2d_np(np.ones((2, 3)), 8, 9)
    assert s.shape == (8, 9) and np.allclose(s, 1.0)


def test_pack_bits64_signed_range():
    assert fp._pack_bits64(np.ones(64, dtype=bool)) == -1
    bits = np.zeros(64, dtype=bool)
    bits[0] = True  # MSB
    assert fp._pack_bits64(bits) == -(1 << 63)
    bits = np.zeros(64, dtype=bool)
    bits[63] = True  # LSB
    assert fp._pack_bits64(bits) == 1


# ---------------------------------------------------------------------------
# audio fingerprint kernel
# ---------------------------------------------------------------------------

def _tone(freq, n=16000, rate=16000.0):
    return np.sin(2 * np.pi * freq * np.arange(n) / rate)


def test_audio_fp_distance_separation():
    rng = np.random.default_rng(7)
    a0 = _tone(440)
    near = a0 * 0.3 + rng.normal(0, 0.01, a0.shape)
    far = _tone(880) + 0.5 * _tone(1760)
    assert _ham(fp.audio_fp64_np(a0), fp.audio_fp64_np(near)) <= 3
    assert _ham(fp.audio_fp64_np(a0), fp.audio_fp64_np(far)) >= 6
    # broadband: same shaping filter far from a differently shaped one
    lp = np.convolve(rng.normal(0, 1, 16500), np.ones(8) / 8, "valid")[:16000]
    hp = np.convolve(rng.normal(0, 1, 16500),
                     np.array([1.0, -1.0] * 4) / 8, "valid")[:16000]
    assert _ham(fp.audio_fp64_np(lp), fp.audio_fp64_np(lp * 2.5)) == 0
    assert _ham(fp.audio_fp64_np(lp), fp.audio_fp64_np(hp)) >= 10


def test_audio_fp_invariances():
    a0 = _tone(440)
    # global gain: exact (both sides of every comparison scale together)
    assert fp.audio_fp64_np(a0 * 0.25) == fp.audio_fp64_np(a0)
    # 16-bit quantization (the WAV round trip): exact for a clean tone
    q = np.round(a0 * 32767) / 32767
    assert fp.audio_fp64_np(q) == fp.audio_fp64_np(a0)
    # dual-mono stereo mixdown == the mono clip
    st = np.stack([a0, a0], axis=1).ravel()
    assert fp.audio_fp64_np(st, 2) == fp.audio_fp64_np(a0)


def test_audio_fp_degenerate():
    assert fp.audio_fp64_np(None) is None
    assert fp.audio_fp64_np(np.array([])) is None
    assert fp.audio_fp64_np(np.arange(5.0), n_channels=2) is None  # ragged
    assert fp.audio_fp64_np(np.arange(4.0), n_channels=0) is None
    # shorter than one FFT frame: zero-padded, still hashes
    assert fp.audio_fp64_np(np.array([0.1, -0.2])) is not None


def test_stft_shape():
    mag = fp.stft_mag_np(np.zeros(1000), n_fft=256, hop=128)
    assert mag.shape == ((1000 - 256) // 128 + 1, 129)
    assert fp.stft_mag_np(np.zeros(10)).shape[0] == 1  # padded single frame


# ---------------------------------------------------------------------------
# hamming_pairs vs brute force
# ---------------------------------------------------------------------------

def _brute_pairs(hashes, tau):
    ids = sorted(hashes)
    return {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
            if _ham(hashes[a], hashes[b]) <= tau}


@pytest.mark.parametrize("tau,n_bands", [(0, 4), (1, 4), (3, 4), (7, 8)])
def test_hamming_pairs_matches_brute_force(spark, tau, n_bands):
    rng = np.random.default_rng(11)
    hashes = {}
    # random base hashes over the full signed range
    for i in range(40):
        hashes[i] = int(rng.integers(-(1 << 63), 1 << 63))
    # planted near-dups at controlled distances, including flips in
    # the top band (sign bit) — the arithmetic-shiftright lane
    for i in range(40, 70):
        base = hashes[i - 40]
        flips = rng.choice(64, size=int(rng.integers(0, 5)), replace=False)
        v = base
        for b in flips:
            v ^= 1 << int(b)
        hashes[i] = v - (1 << 64) if v >= (1 << 63) else \
            (v + (1 << 64) if v < -(1 << 63) else v)
    hashes[70] = -(1 << 63)            # only bit 63 set
    hashes[71] = -(1 << 63) | 1        # Hamming 1 from it, still negative
    hashes[72] = (1 << 53) - 1         # the float-cliff shape from round 5
    hashes[73] = (1 << 53) - 2
    df = spark.createDataFrame(
        [(i, h) for i, h in hashes.items()], "doc_id long, fp long")
    got = {(r.id_a, r.id_b)
           for r in fp.hamming_pairs(df, "doc_id", "fp", tau=tau,
                                     n_bands=n_bands).collect()}
    assert got == _brute_pairs(hashes, tau)


def test_hamming_pairs_reports_exact_distance(spark):
    df = spark.createDataFrame(
        [(1, 0), (2, 7), (3, None)], "doc_id long, fp long")
    rows = fp.hamming_pairs(df, "doc_id", "fp", tau=3).collect()
    assert [(r.id_a, r.id_b, r.hamming) for r in rows] == [(1, 2, 3)]


def test_hamming_topk_matches_radius_bounded_brute_force(spark):
    """Within radius tau the banded probe is COMPLETE (pigeonhole),
    so hamming_topk must EQUAL the brute-force radius-limited top-k —
    not merely approximate it."""
    rng = np.random.default_rng(29)
    corpus = {i: int(rng.integers(-(1 << 63), 1 << 63))
              for i in range(3000)}
    queries = {}
    for qi in range(25):
        if qi < 15:  # perturbed corpus member, distance 0-3
            base = corpus[qi * 100]
            v = base
            for b in rng.choice(64, size=int(rng.integers(0, 4)),
                                replace=False):
                v ^= 1 << int(b)
            v = v - (1 << 64) if v >= (1 << 63) else \
                (v + (1 << 64) if v < -(1 << 63) else v)
            queries[qi] = v
        else:  # random query — usually nothing in radius
            queries[qi] = int(rng.integers(-(1 << 63), 1 << 63))
    cdf = spark.createDataFrame(list(corpus.items()), "doc_id long, fp long")
    qdf = spark.createDataFrame(list(queries.items()), "query_id long, fp long")
    got = {}
    for r in fp.hamming_topk(cdf, qdf, k=5, tau=3).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.doc_id, r.hamming))
    for qi, qfp in queries.items():
        brute = sorted(((_ham(qfp, h), i) for i, h in corpus.items()
                        if _ham(qfp, h) <= 3))[:5]
        expect = [(rk + 1, i, d) for rk, (d, i) in enumerate(brute)]
        assert sorted(got.get(qi, [])) == expect, f"query {qi}"


def test_hamming_topk_duplicate_query_id_ranks_independently(spark):
    """A query_id appearing with two different fingerprints gets one
    independent correct ranking per fingerprint (keyed on (id, fp)),
    not a merged candidate pool — which silently corrupted the
    ranking before the round-5 review."""
    cdf = spark.createDataFrame(
        [(1, 0), (2, 1), (3, 1 << 40)], "doc_id long, fp long")
    qdf = spark.createDataFrame(
        [(7, 0), (7, 1 << 40)], "query_id long, fp long")
    rows = sorted((r.query_id, r.doc_id, r.hamming, r.rank)
                  for r in fp.hamming_topk(cdf, qdf, k=2, tau=1).collect())
    # fp=0:    doc 1 (d=0) rank 1, doc 2 (d=1) rank 2 (doc 3 ties at
    #          d=1 but loses the (hamming, doc_id) tiebreak, > k)
    # fp=2^40: doc 3 (d=0) rank 1, doc 1 (d=1, single set bit) rank 2
    assert rows == [(7, 1, 0, 1), (7, 1, 1, 2),
                    (7, 2, 1, 2), (7, 3, 0, 1)]


def test_hamming_topk_corpus_side_never_shuffles(spark):
    """The 100-TB contract in the docstring, pinned on the plan: the
    banded query side broadcasts, so the corpus is probed map-side —
    the only Exchange below the top-k window is the tiny candidate
    set, never the corpus."""
    cdf = spark.range(1000).select(
        F.col("id").alias("doc_id"), (F.col("id") * 2654435761).alias("fp"))
    qdf = spark.range(4).select(
        F.col("id").alias("query_id"), (F.col("id") * 97).alias("fp"))
    plan = fp.hamming_topk(cdf, qdf)._jdf.queryExecution() \
             .executedPlan().toString()
    # one BroadcastHashJoin building the QUERY side, verify predicate
    # folded into the join condition
    assert plan.count("BroadcastHashJoin") == 1
    assert "BuildRight" in plan and "bit_count" in plan.split(
        "BroadcastHashJoin")[1].split("\n")[0]
    # the only hash Exchange is the per-query window over VERIFIED
    # candidates (and Spark pre-limits with a partial WindowGroupLimit
    # before even that); the corpus never shuffles
    assert plan.count("Exchange hashpartitioning") == 1
    assert "hashpartitioning(_qid" in plan
    assert plan.count("BroadcastExchange") == 1


def test_hamming_pairs_guards():
    # ValueError, not assert: soundness preconditions must survive
    # python -O (round-5 review)
    with pytest.raises(ValueError):
        fp.hamming_pairs(None, tau=4, n_bands=4)  # pigeonhole violated
    with pytest.raises(ValueError):
        fp.hamming_pairs(None, tau=2, n_bands=5)  # 64 % 5 != 0


# ---------------------------------------------------------------------------
# end-to-end Spark composition
# ---------------------------------------------------------------------------

def _image_corpus():
    rng = np.random.default_rng(3)
    img_a = _base_img()
    img_a_noisy = np.clip(img_a.astype(int)
                          + rng.integers(-5, 6, img_a.shape),
                          0, 255).astype(np.uint8)
    img_b = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
    return [
        (1, bytearray(_bmp_bytes(img_a.tolist()))),            # family A
        (2, bytearray(_png_bytes(img_a, 2, [0, 1, 2, 3, 4]))),  # A re-encoded
        (3, bytearray(_ppm_bytes(img_a_noisy))),                # A + noise
        (4, bytearray(_bmp_bytes(img_b.tolist()))),             # unrelated
        (5, bytearray(b"BM" + b"\x00" * 40)),    # sniffs bmp, decode fails
        (6, bytearray(b"not an image at all")),  # unknown container
    ]


def test_image_fingerprints_to_clusters(spark):
    df = spark.createDataFrame(_image_corpus(), "doc_id long, html binary")
    fps = fp.image_fingerprints(df, "html").select("doc_id", "image_fp.*")
    rows = {r.doc_id: r for r in fps.collect()}
    assert rows[1].format == "bmp" and rows[2].format == "png"
    assert rows[3].format == "pnm" and rows[4].format == "bmp"
    # two failure classes stay distinguishable
    assert rows[5].format == "bmp" and rows[5].phash is None
    assert rows[6].format is None and rows[6].phash is None
    # exact re-encode: identical hashes across formats
    assert rows[1].phash == rows[2].phash
    assert rows[1].dhash == rows[2].dhash
    # pairs: the A family only (1,2) exact + (x,3) near; 4 unrelated
    pairs = fp.hamming_pairs(fps, "doc_id", "phash", tau=3)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert set(got) == {(1, 2), (1, 3), (2, 3)}
    assert got[(1, 2)] == 0
    # clusters: dedup_components assigns the family one canonical id
    decoded = fps.where(F.col("phash").isNotNull()).select("doc_id")
    clusters = {r.doc_id: (r.canonical_id, r.cluster_size)
                for r in dedup_components(
                    pairs, decoded, a="id_a", b="id_b").collect()}
    assert clusters[1] == clusters[2] == clusters[3] == (1, 3)
    assert clusters[4] == (4, 1)


def test_image_fingerprints_gray_alpha_png_in_batch(spark):
    """A color-type-4 (gray+alpha) PNG must hash, not kill the Arrow
    batch — the 2-channel raster crashed to_gray_np's matmul before
    the round-5 review pass."""
    g = _base_img(16, 16)[:, :, :1]
    ga = np.concatenate([g, np.full_like(g, 200)], axis=2)
    df = spark.createDataFrame(
        [(1, bytearray(_png_bytes(ga, 4, [0, 2]))),
         (2, bytearray(_png_bytes(g, 0, [1, 3])))],
        "doc_id long, html binary")
    rows = {r.doc_id: r for r in
            fp.image_fingerprints(df, "html")
              .select("doc_id", "image_fp.*").collect()}
    assert rows[1].format == "png" and rows[1].phash is not None
    # alpha is ignored: gray+alpha of the same luma hashes identically
    assert rows[1].phash == rows[2].phash
    assert rows[1].dhash == rows[2].dhash


def test_audio_fingerprints_to_pairs(spark):
    rng = np.random.default_rng(5)
    a = _tone(440, 8000)
    corpus = [
        (1, bytearray(_wav_bytes(a[:, None]))),
        (2, bytearray(_wav_bytes((a * 0.5)[:, None]))),        # gain copy
        (3, bytearray(_wav_bytes(
            np.stack([a, a], axis=1)))),                        # stereo copy
        (4, bytearray(_wav_bytes(
            (_tone(880, 8000) + 0.5 * _tone(1760, 8000))[:, None]))),
        (5, bytearray(b"RIFFgarbage")),                         # dead letter
    ]
    df = spark.createDataFrame(corpus, "doc_id long, html binary")
    fps = fp.audio_fingerprints(df, "html").select("doc_id", "audio_fp.*")
    rows = {r.doc_id: r for r in fps.collect()}
    assert rows[1].sample_rate == 16000 and rows[1].n_frames == 8000
    assert rows[5].afp is None
    pairs = {(r.id_a, r.id_b): r.hamming
             for r in fp.hamming_pairs(fps, "doc_id", "afp",
                                       tau=3).collect()}
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    # 16-bit WAV round trip + gain + stereo mixdown: all exact copies
    assert all(v == 0 for v in pairs.values())


def _anim_gif(rng, n_frames, w=24, h=16, pal=None, clip=None,
              interlace=()):
    """Full-frame random animation through the independent test
    encoder; ``clip`` keeps only the first k frames."""
    if pal is None:
        pal = rng.integers(0, 256, size=(16, 3)).astype(np.uint8)
    frames = [(0, 0, w, h, rng.integers(0, 16, size=(h, w)), None, 0)
              for _ in range(n_frames)]
    if clip is not None:
        frames = frames[:clip]
    return _gif_bytes(w, h, pal, frames, interlace_frames=interlace), frames


def test_video_fingerprints_and_pairs(spark):
    rng = np.random.default_rng(21)
    gif_a, frames_a = _anim_gif(rng, 6)
    # re-encode of A: same frames, interlaced rows on two frames —
    # different bitstream, pixel-identical decode
    w, h = 24, 16
    gif_a2 = _gif_bytes(w, h,
                        np.frombuffer(gif_a[13:13 + 48],
                                      dtype=np.uint8).reshape(16, 3),
                        frames_a, interlace_frames=(1, 3))
    gif_clip = _gif_bytes(w, h,
                          np.frombuffer(gif_a[13:13 + 48],
                                        dtype=np.uint8).reshape(16, 3),
                          frames_a[:3])
    gif_b, _ = _anim_gif(rng, 6)
    corpus = [(1, bytearray(gif_a)), (2, bytearray(gif_a2)),
              (3, bytearray(gif_clip)), (4, bytearray(gif_b)),
              (5, bytearray(b"GIF89a garbage"))]
    df = spark.createDataFrame(corpus, "doc_id long, html binary")
    fps = fp.video_fingerprints(df, "html", n_frames=4).select(
        "doc_id", "video_fp.*")
    rows = {r.doc_id: r for r in fps.collect()}
    assert rows[1].n_frames_total == 6
    assert rows[3].n_frames_total == 3
    assert rows[5].frame_hashes is None  # dead letter
    # re-encode decodes pixel-identical -> identical frame-hash lists
    assert list(rows[1].frame_hashes) == list(rows[2].frame_hashes)
    pairs = {(r.id_a, r.id_b): r
             for r in fp.video_pairs(fps, "doc_id", "frame_hashes",
                                     tau=2, min_matches=2).collect()}
    assert set(pairs) == {(1, 2), (1, 3), (2, 3)}
    full = pairs[(1, 2)]
    assert full.matched_a == full.matched_b == len(rows[1].frame_hashes)
    # the clip overlaps A exactly on the jointly-sampled frames:
    # A samples raster frames {0,1,3,4} of 6, the 3-frame clip samples
    # {0,1,2} — frames 0 and 1 are shared, frame 2 was not sampled on
    # A's side, so both slot counts are 2 (>= min_matches, pair kept)
    clip = pairs[(1, 3)]
    assert (clip.matched_a, clip.matched_b) == (2, 2)
    assert clip.n_frames_a == len(rows[1].frame_hashes)
    assert clip.n_frames_b == len(rows[3].frame_hashes)


def test_streaming_dedup_media(spark, tmp_path):
    """Perceptual dedup-on-arrival: a PNG re-encode of a BMP that
    already arrived is dropped across micro-batches (same pHash,
    different bytes — an md5 digest would keep it), while BOTH dead
    letters survive (NULL phash must bypass the dedup state: NULL is
    a grouping value to dropDuplicates*, so riding through would
    swallow every dead letter after the first)."""
    import datetime
    import os

    from jgdtrans_rs_spark.streaming.ingest import stream_dedup_media

    img_a = _base_img(32, 40)
    img_b = np.random.default_rng(9).integers(
        0, 256, (32, 40, 3)).astype(np.uint8)
    t0 = datetime.datetime(2023, 1, 1)
    f1 = [("u1", t0, bytearray(_bmp_bytes(img_a.tolist()))),
          ("u2", t0, bytearray(b"BM corrupt payload"))]
    f2 = [("u3", t0, bytearray(_png_bytes(img_a, 2, [0, 1]))),  # re-encode
          ("u4", t0, bytearray(_bmp_bytes(img_b.tolist()))),
          ("u5", t0, bytearray(b"also not an image"))]
    d = str(tmp_path / "mstream")
    os.makedirs(d)
    schema = "url string, warc_ts timestamp, html binary"
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(d + "/f1")
    spark.createDataFrame(f2, schema).coalesce(1).write.parquet(d + "/f2")
    src = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(d + "/f*"))
    q = (stream_dedup_media(src)
         .writeStream.format("memory").queryName("media_dedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    urls = sorted(r.url for r in spark.sql(
        "SELECT url FROM media_dedup").collect())
    # u3 (the re-encoded copy) is gone; both dead letters survive
    assert urls == ["u1", "u2", "u4", "u5"]


def test_audio_spectrogram_features(spark):
    """The dense feature surface: fixed shape, tone energy lands in a
    stable band column, stereo mixdown matches mono, dead letters and
    empty waveforms propagate NULL."""
    from jgdtrans_rs_spark.operators.multimodal import decode_audio

    a = _tone(440, 8000)
    corpus = [(1, bytearray(_wav_bytes(a[:, None]))),
              (2, bytearray(_wav_bytes(np.stack([a, a], axis=1)))),
              (3, bytearray(b"RIFFgarbage"))]
    df = decode_audio(
        spark.createDataFrame(corpus, "doc_id long, html binary"), "html")
    rows = {r.doc_id: r.spectrogram for r in
            fp.audio_spectrogram(df).select("doc_id", "spectrogram")
              .collect()}
    g1 = np.array(rows[1]).reshape(16, 16)
    assert rows[3] is None
    # dual-mono stereo mixdown == mono, exactly
    assert np.array_equal(np.array(rows[2]), np.array(rows[1]))
    # a stationary 440 Hz tone puts its peak in the same band column
    # of every time row
    assert len(set(np.argmax(g1, axis=1))) == 1
    assert (g1 >= 0).all()


def test_product_encoders_roundtrip_decoders():
    """The write-side encoders (encode_bmp_np / encode_png_np) must
    round-trip pixel-exact through the from-scratch decoders — they
    generate the probe and scale-tier corpora, so a drift here would
    measure the wrong thing."""
    from jgdtrans_rs_spark.operators.multimodal import (decode_bmp_np,
                                                        decode_png_np,
                                                        encode_bmp_np,
                                                        encode_png_np)

    rng = np.random.default_rng(17)
    rgb = rng.integers(0, 256, (13, 9, 3)).astype(np.uint8)
    assert np.array_equal(decode_bmp_np(encode_bmp_np(rgb)), rgb)
    for c in (1, 2, 3, 4):
        img = rng.integers(0, 256, (7, 11, c)).astype(np.uint8)
        back = decode_png_np(encode_png_np(img))
        assert np.array_equal(back.reshape(img.shape), img)


def test_video_pairs_single_frame_duplicates(spark):
    """min_matches is clamped to the shorter side's sampled-frame
    count: two re-encodes of a SINGLE-frame GIF have exactly one slot
    each, and the pair must still be reported (it dropped silently
    before the round-5 review)."""
    rng = np.random.default_rng(33)
    gif, frames = _anim_gif(rng, 1)
    pal = np.frombuffer(gif[13:13 + 48], dtype=np.uint8).reshape(16, 3)
    gif2 = _gif_bytes(24, 16, pal, frames, interlace_frames=(0,))
    df = spark.createDataFrame(
        [(1, bytearray(gif)), (2, bytearray(gif2))],
        "doc_id long, html binary")
    fps = fp.video_fingerprints(df, "html", n_frames=4).select(
        "doc_id", "video_fp.*")
    rows = fp.video_pairs(fps, "doc_id", "frame_hashes",
                          tau=2, min_matches=2).collect()
    assert [(r.id_a, r.id_b, r.matched_a, r.matched_b)
            for r in rows] == [(1, 2, 1, 1)]


@pytest.mark.skipif(_SLOW != "4",
                    reason="fingerprint scale tier — SPARK_GRAFT_SLOW=4")
def test_fingerprint_scale_recall(spark):
    """Scale tier for the perceptual-dedup path (the big-SF
    discipline applied to the new family): a 44k-payload corpus is
    GENERATED IN THE EXECUTORS (seeded per id — the driver ships only
    ids), fingerprinted, and paired; gates are planted-family recall
    and exact family precision.

    Families: ids < 10^5 are distinct random rasters; 2,000 ids at
    10^5+i are PNG re-encodes of base i (must pair at Hamming 0,
    recall 1.0); 2,000 ids at 2*10^5+i are +-4-noise copies of base i
    (recall >= 0.95 at tau 3).  EVERY reported pair must connect
    members of one family — 40k random rasters give ~8e8 candidate
    pairs and an iid-bits estimate of ~2e-6 expected chance
    collisions at tau 3, so any cross-family pair is a real bug, not
    noise."""
    from pyspark.sql.types import BinaryType

    from jgdtrans_rs_spark.operators.multimodal import (encode_bmp_np,
                                                        encode_png_np)

    n_base, n_fam = 40000, 2000

    @F.pandas_udf(BinaryType())
    def gen_payload(ids):
        import pandas as pd

        out = []
        for i in ids:
            i = int(i)
            base_id = i % 100000
            img = np.random.default_rng(base_id).integers(
                0, 256, (48, 64, 3)).astype(np.uint8)
            if i >= 200000:  # noisy copy
                noise = np.random.default_rng(i).integers(
                    -4, 5, img.shape)
                img = np.clip(img.astype(np.int64) + noise,
                              0, 255).astype(np.uint8)
                out.append(encode_bmp_np(img))
            elif i >= 100000:  # exact re-encode
                out.append(encode_png_np(img))
            else:
                out.append(encode_bmp_np(img))
        return pd.Series(out)

    ids = (spark.range(n_base)
           .union(spark.range(100000, 100000 + n_fam))
           .union(spark.range(200000, 200000 + n_fam))
           .repartition(32))
    fps = (fp.image_fingerprints(
               ids.withColumn("html", gen_payload(F.col("id"))), "html")
           .select(F.col("id").alias("doc_id"), "image_fp.phash"))
    pairs = fp.hamming_pairs(fps, "doc_id", "phash", tau=3).collect()
    fam = lambda i: i % 100000  # noqa: E731
    assert all(fam(r.id_a) == fam(r.id_b) for r in pairs), \
        "cross-family pair: either a hash defect or a band-join bug"
    exact = {fam(r.id_a) for r in pairs
             if {r.id_a // 100000, r.id_b // 100000} == {0, 1}}
    noisy = {fam(r.id_a) for r in pairs
             if {r.id_a // 100000, r.id_b // 100000} == {0, 2}}
    assert len(exact) == n_fam, \
        f"exact re-encode recall {len(exact)}/{n_fam} != 1.0"
    assert len(noisy) >= 0.95 * n_fam, \
        f"noisy-copy recall {len(noisy)}/{n_fam} < 0.95"
    print(f"fingerprint scale: {n_base + 2 * n_fam} payloads, "
          f"{len(pairs)} pairs, exact {len(exact)}/{n_fam}, "
          f"noisy {len(noisy)}/{n_fam}", flush=True)


def test_fingerprint_kernels_never_raise_on_garbage():
    rng = np.random.default_rng(13)
    payloads = [b"", b"\x00", rng.bytes(64), rng.bytes(4096)]
    img = _base_img(8, 8)
    for hashfn in (fp.phash64_np, fp.dhash64_np):
        for p in payloads:
            # kernels take decoded arrays; garbage arrays still hash
            arr = np.frombuffer(p.ljust(192, b"\x00")[:192],
                                dtype=np.uint8).reshape(8, 8, 3)
            assert isinstance(hashfn(arr), int)
        assert isinstance(hashfn(img), int)
