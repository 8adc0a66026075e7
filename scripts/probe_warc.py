"""Throughput probe for the WARC source.

Generates a synthetic Common-Crawl-style corpus ON THE EXECUTORS
(n_files .warc.gz files, records_per_file gzip-member records each,
~1 KB HTML bodies with geotags) into a temp dir, then measures
`read_warc` -> `pages_from_warc` end to end with full materialization
(noop write — never count(), which can skip column work).

Two parallelism levels (SPARK_GRAFT_CPUS, default 8 then 32 when run
twice by the wrapper loop below) give the reader's scaling shape: the
stage is one mapInPandas over per-file tasks, so efficiency is the
per-task decode cost staying flat as tasks spread over cores.

Usage: python scripts/probe_warc.py [n_files] [records_per_file]
Prints one JSON line with pages/sec at each level + efficiency.
"""

import json
import os
import shutil
import sys
import tempfile
import time

os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _make_corpus(out_dir: str, n_files: int, per_file: int) -> None:
    """Write the corpus with a throwaway local[8] session so generation
    itself is parallel; deterministic content keyed by (file, record)."""
    from pyspark.sql import SparkSession

    from jgdtrans_rs_spark.sources.warc import encode_warc_bytes

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false").getOrCreate())

    def write_one(fi: int) -> int:
        recs = []
        for ri in range(per_file):
            k = fi * per_file + ri
            lat = 36.1005 + (k % 700) * 1e-5
            lon = 140.0880 + (k % 390) * 3e-5
            body = (" ".join(f"tok{(k * p) % 97}" for p in
                             (3, 5, 7, 11, 13, 17, 19, 23)) + " ") * 8
            html = (f'<html><head><meta name="geo.position" '
                    f'content="{lat};{lon}"></head>'
                    f"<body>{body}</body></html>").encode()
            recs.append({"rec_type": "response",
                         "url": f"http://probe.example/{k:09d}",
                         "ts": "2024-05-01T00:00:00Z", "lang": "ja",
                         "payload": html})
        with open(os.path.join(out_dir, f"part-{fi:05d}.warc.gz"),
                  "wb") as f:
            f.write(encode_warc_bytes(recs, gzip_members=True))
        return per_file

    n = (spark.sparkContext.parallelize(range(n_files), n_files)
         .map(write_one).sum())
    spark.stop()
    assert n == n_files * per_file


def _measure(cpus: int, corpus: str, n_pages: int) -> float:
    """pages/sec through read_warc -> pages_from_warc at local[cpus],
    fresh JVM (SparkSession.stop between levels does not reset executor
    threads in local mode, so each level runs in its own process)."""
    import subprocess

    code = f"""
import os, sys, time, json
os.environ.setdefault('PYSPARK_PYTHON', sys.executable)
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master('local[{cpus}]')
         .config('spark.sql.shuffle.partitions', '{cpus}')
         # the probe's files are ~100 KB; without this the binaryFile
         # scan packs ALL of them into one partition (one task) and no
         # parallelism level can show scaling.  Real Common Crawl files
         # are ~1 GB > the 128 MB default, so production gets per-file
         # tasks with the default conf (see read_warc docstring).
         .config('spark.sql.files.maxPartitionBytes', '65536')
         .config('spark.sql.files.openCostInBytes', '65536')
         .config('spark.ui.enabled', 'false')
         .config('spark.ui.showConsoleProgress', 'false').getOrCreate())
spark.sparkContext.setLogLevel('ERROR')
from jgdtrans_rs_spark.sources.warc import pages_from_warc
pages_from_warc(spark, {corpus!r}).write.format('noop').mode('overwrite').save()  # warm
best = float('inf')
for _ in range(3):
    t0 = time.perf_counter()
    pages_from_warc(spark, {corpus!r}).write.format('noop').mode('overwrite').save()
    best = min(best, time.perf_counter() - t0)
print(json.dumps({{'sec': best}}))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=600)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if out.returncode != 0 or not lines:
        sys.stderr.write(out.stderr[-4000:])
        raise RuntimeError(f"probe child failed (rc={out.returncode})")
    return n_pages / json.loads(lines[-1])["sec"]


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    per_file = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    n_pages = n_files * per_file
    corpus = tempfile.mkdtemp(prefix="warc_probe_")
    try:
        t0 = time.perf_counter()
        _make_corpus(corpus, n_files, per_file)
        gen_sec = time.perf_counter() - t0
        r8 = _measure(8, corpus, n_pages)
        r32 = _measure(32, corpus, n_pages)
        print(json.dumps({
            "n_files": n_files, "records_per_file": per_file,
            "gen_sec": round(gen_sec, 2),
            "pages_per_sec_local8": round(r8, 1),
            "pages_per_sec_local32": round(r32, 1),
            "efficiency_8_to_32": round(r32 / r8 / 4, 3),
        }))
    finally:
        shutil.rmtree(corpus, ignore_errors=True)


if __name__ == "__main__":
    main()
