"""Throughput probe for the perceptual-fingerprint pipeline.

Measures, with full materialization (noop write — never count(), the
round-4 lesson):

1. image_fingerprints over a synthetic mixed BMP/PNG corpus
   (images/sec through sniff+decode+hash in one Arrow pass), and
2. hamming_pairs over n random 64-bit hashes (the pure-JVM banded
   join), including the candidate-volume sanity ratio n^2/2^16.

Usage: python scripts/probe_fingerprint.py [n_images] [n_hashes]
Prints one JSON line.
"""

import json
import os
import sys
import time
import numpy as np

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n_images = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    n_hashes = int(sys.argv[2]) if len(sys.argv) > 2 else 200000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(f"local[{cpus}]")
             .config("spark.sql.shuffle.partitions", cpus)
             .config("spark.driver.memory", "8g")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from jgdtrans_rs_spark.operators import fingerprint as fng
    from jgdtrans_rs_spark.operators.multimodal import (encode_bmp_np,
                                                        encode_png_np)

    # corpus: 16 base 64x48 rasters, each payload a per-index noised
    # variant, alternating BMP/PNG containers
    rng = np.random.default_rng(42)
    bases = [rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
             for _ in range(16)]
    payloads = []
    for i in range(2048):  # distinct payload pool, replicated below
        img = bases[i % 16].copy()
        img[(i * 7) % 48, (i * 13) % 64] ^= 0xFF
        payloads.append(
            bytearray(encode_bmp_np(img) if i % 2 else encode_png_np(img)))
    rows = [(i, payloads[i % 2048]) for i in range(n_images)]
    df = spark.createDataFrame(rows, "doc_id long, html binary") \
              .repartition(int(cpus)).persist()
    df.count()

    t0 = time.time()
    (fng.image_fingerprints(df, "html")
        .select("doc_id", "image_fp.phash", "image_fp.dhash")
        .write.format("noop").mode("overwrite").save())
    t_fp = time.time() - t0

    hashes = [(int(i), int(h)) for i, h in enumerate(
        rng.integers(-(1 << 63), 1 << 63, n_hashes))]
    hdf = spark.createDataFrame(hashes, "doc_id long, fp long") \
               .repartition(int(cpus)).persist()
    hdf.count()
    t0 = time.time()
    (fng.hamming_pairs(hdf, "doc_id", "fp", tau=3)
        .write.format("noop").mode("overwrite").save())
    t_pairs = time.time() - t0

    print(json.dumps({
        "n_images": n_images, "fingerprint_sec": round(t_fp, 3),
        "images_per_sec": round(n_images / t_fp, 1),
        "n_hashes": n_hashes, "pairs_sec": round(t_pairs, 3),
        "hashes_per_sec": round(n_hashes / t_pairs, 1),
        "expected_candidates_per_band": round(n_hashes**2 / 65536.0, 1),
        "cpus": cpus,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
