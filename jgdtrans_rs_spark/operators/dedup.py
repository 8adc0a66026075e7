"""Deduplication operators for training-data pipelines.

All variants are declarative Spark SQL plans (generated from
plans/webops.py, shared with the DuckDB oracle), so Catalyst owns the
physical strategy:

* exact          — hash-groupBy on md5(text): one shuffle on the digest.
* minhash_lsh    — shingle -> 12 minhashes -> 3 bands of 4 -> band
                   self-join -> exact-Jaccard verify.  Shuffles on band
                   keys and shingle ids; at 100 TB the band join is the
                   scalable candidate generator (pair count stays near
                   linear instead of quadratic).
* simhash        — 32-bit fingerprint per doc (near-dup by Hamming
                   distance on the int).
* ngram_jaccard  — exact blocked self-join (the small-corpus verifier
                   for minhash_lsh's recall).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

from ..plans import webops
from ..plans.textsql import SPARK

# Staged operators below persist their stage boundary and expose it to
# the follow-up SQL through a temp view.  View names are unique per
# call (counter suffix, like plans/spark_sql.py) so concurrent or
# repeated calls in one session never clobber each other's plans.
# CACHE CONTRACT (applies to every persist() here and to
# similarity.embedding_near_dup): the staged frame is MEMORY_AND_DISK
# and LRU-evicted; callers running many dedup passes in a long-lived
# session should reclaim explicitly once the returned DataFrame has
# been consumed — either ``spark.catalog.clearCache()`` or
# ``spark.table(<returned-plan's view>).unpersist()``; results stay
# correct either way (Spark recomputes evicted stages).
_view_ids = itertools.count()


def _stage(spark: SparkSession, sql: str, base_name: str) -> str:
    """Persist a stage and register it under a unique view name."""
    df = spark.sql(sql).persist()
    name = f"{base_name}_{next(_view_ids)}"
    df.createOrReplaceTempView(name)
    return name


def exact_duplicates(spark: SparkSession, docs: str = "documents") -> DataFrame:
    """(doc_id, canonical_id, group_size) over the dup-test corpus."""
    return spark.sql(webops.dedup_exact_sql(SPARK, docs))


def minhash_lsh_pairs(spark: SparkSession, docs: str = "documents",
                      tau_pct: int = 60) -> DataFrame:
    """Near-duplicate pairs (doc_a, doc_b, inter_n, union_n).

    Staged with persisted boundaries: the shingle pipeline is computed
    once (not re-inlined into every minhash column / band reference by
    CollapseProject), then signatures once, then the band join — at
    corpus scale each stage is a clean shuffle boundary.
    """
    sints = _stage(spark, webops.minhash_sints_sql(SPARK, docs), "_mh_sints")
    sigs = _stage(spark, webops.minhash_sigs_from(SPARK, sints), "_mh_sigs")
    return spark.sql(webops.minhash_pairs_from(SPARK, sigs, tau_pct))


def simhash(spark: SparkSession, docs: str = "documents") -> DataFrame:
    """(doc_id, simhash) SIMHASH_BITS-bit fingerprints."""
    return spark.sql(webops.simhash_sql(SPARK, docs))


def ngram_jaccard_pairs(spark: SparkSession, docs: str = "documents",
                        tau_pct: int = 50) -> DataFrame:
    """Exact shingle-Jaccard pairs (doc_a, doc_b, inter_n, union_n),
    with the shingle stage materialized (it feeds both sides of the
    blocked self-join)."""
    base = _stage(spark, webops.ngram_base_sql(SPARK, docs), "_ng_base")
    return spark.sql(webops.ngram_pairs_from(SPARK, base, tau_pct))


def winnowing_fingerprints(spark: SparkSession, docs: str = "documents",
                           window: int = 4) -> DataFrame:
    """Winnowing fingerprints, relational formulation: shingle stage
    materialized (persist + temp view — CollapseProject would inline
    the shingle pipeline into every window slice: measured minutes at
    5k docs), then the sliding minimum as a ROWS window frame over the
    exploded (doc_id, i, shingle) rows — one shuffle on doc_id, no
    per-window array slicing.  Output set identical to the
    single-statement array form (webops.winnowing_from — the DuckDB
    oracle)."""
    base = _stage(spark, webops.winnowing_base_sql(SPARK, docs), "_win_base")
    return spark.sql(f"""
      SELECT DISTINCT doc_id, fp
      FROM (
        SELECT doc_id, i, n,
               MIN(s) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS BETWEEN CURRENT ROW AND {window - 1} FOLLOWING) AS fp
        FROM (
          SELECT doc_id, i, element_at(sints, i) AS s, size(sints) AS n
          FROM {base} LATERAL VIEW explode(sequence(1, size(sints))) _e AS i
          WHERE size(sints) >= {window}
        ) _rows
      ) _mins
      WHERE i <= n - {window} + 1
    """)


def simhash_pairs(spark: SparkSession, docs: str = "documents",
                  tau: int = 1) -> DataFrame:
    """Banded-Hamming simhash pairs with the signature stage
    materialized (the 32-term signature would otherwise be recomputed
    per band reference through CTE inlining; 26 s -> ~2 s at 5k docs)."""
    sigs = _stage(spark, webops.simhash_sigs_sql(SPARK, docs), "_sh_sigs")
    return spark.sql(webops.simhash_pairs_from(SPARK, sigs, tau))
