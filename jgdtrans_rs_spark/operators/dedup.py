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

# Stage views registered PER SESSION (ADVICE r04; the reclaim route
# for long-lived sessions) — one call unpersists every staged block
# AND drops its catalog entry, instead of leaving one uniquely-named
# view per operator call to LRU eviction.  Keyed by the session
# object, not applicationId: temp views are session-scoped, and two
# sessions on one SparkContext share an applicationId — a shared key
# let one session's reclaim pop (and then fail to drop) the OTHER
# session's views, leaking them permanently (round-5 review).  A
# WeakKeyDictionary so a garbage-collected session doesn't pin its
# name list forever.
import weakref

_stage_views: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _register_stage_view(spark: SparkSession, df, base_name: str) -> str:
    name = f"{base_name}_{next(_view_ids)}"
    df.createOrReplaceTempView(name)
    _stage_views.setdefault(spark, []).append(name)
    return name


def reclaim_stages(spark: SparkSession) -> int:
    """Unpersist and drop every stage view this module (and
    operators/similarity) registered on ``spark``; returns the number
    reclaimed.  Safe to call at any time — results built from the
    stages stay correct (Spark recomputes evicted stages); this only
    releases storage-memory blocks and catalog entries."""
    names = _stage_views.pop(spark, [])
    n = 0
    for name in names:
        try:
            spark.table(name).unpersist()
            spark.catalog.dropTempView(name)
            n += 1
        except Exception:
            pass  # view already dropped / session torn down
    return n


def _stage(spark: SparkSession, sql: str, base_name: str) -> str:
    """Persist a stage and register it under a unique view name."""
    df = spark.sql(sql).persist()
    return _register_stage_view(spark, df, base_name)


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


def dedup_incremental(spark: SparkSession, docs: str = "documents",
                      tau_pct: int = 60, short_shingles: int = 8,
                      band_size: int = 2) -> DataFrame:
    """Incremental dedup (webops.dedup_incremental_sql semantics) with
    the sints and signature stages materialized: Spark re-executes a
    multi-referenced CTE per reference (PLANS.md 'Expression staging'
    #3 — the digest probe, band probe, shingle explode and sizes arms
    all read the corpus), which cost 57 s at sf0.1 vs 2.2 s staged
    (26x).  At 100 TB these stages ARE the precomputed corpus-side
    signature tables the docstring describes.  Cache contract as
    above."""
    sints = _stage(spark, webops.dedup_incremental_sints_sql(SPARK, docs),
                   "_inc_sints")
    sigs = _stage(spark, webops.dedup_incremental_sigs_from(SPARK, sints),
                  "_inc_sigs")
    body = webops.dedup_incremental_from(SPARK, sigs, sints, tau_pct,
                                         short_shingles, band_size)
    return spark.sql(f"WITH {body.lstrip()}")


def dedup_components(pairs: DataFrame, nodes: DataFrame,
                     a: str = "doc_a", b: str = "doc_b",
                     id_col: str = "doc_id", max_iter: int = 25,
                     stats: dict | None = None) -> DataFrame:
    """Connected components over a near-duplicate pair graph ->
    (doc_id, canonical_id, cluster_size): the cluster-assignment step
    a training-data pipeline runs AFTER pair generation, so every
    document maps to one canonical representative (min doc_id in its
    component; singletons map to themselves).

    Algorithm: min-label propagation WITH pointer doubling — per round
    each node takes (1) the min of its own and its neighbours' labels,
    then (2) the label OF that label (label values are always node ids
    of the same component, so the lookup is sound and min-monotone).
    Step (2) doubles the distance information travels per round, so
    convergence is O(log2(diameter)) rounds instead of O(diameter):
    a 65,536-node chain converges in ~17 rounds where plain
    propagation needs 65,535 (VERDICT r04 #2; pinned by
    test_dedup_components_deep_graph_log_rounds).  The driver loop
    stops at the fixpoint (one scalar count per round, control-plane
    only) and MATERIALIZES each round's labels (localCheckpoint) so
    the next round's plan reads a stable snapshot instead of
    re-executing an ever-deepening join lineage.  ``pairs`` is
    checkpointed BEFORE the symmetrizing self-union: the union's two
    branches would otherwise each re-execute the whole upstream
    candidate-join per action (measured 38 s -> 0.6 s for the edge
    build at sf0.01; rounds 4.5 s -> 0.6 s because every round's join
    re-read that lineage).

    100 TB design: each round is two keyed shuffle-joins (neighbour
    min against the symmetrized edge list + the doubling self-lookup)
    plus a groupBy-min — all keyed, all AQE-skew-splittable; rounds
    needed = log2(component diameter).  Web near-dup graphs are
    overwhelmingly stars/cliques around a canonical document
    (exact-copy families, template clusters) and fix in 2-3 rounds;
    even pathological chains are now bounded by ~log2(n) << max_iter.
    At that scale swap localCheckpoint for reliable ``checkpoint()``
    (executor loss under localCheckpoint forfeits blocks mid-loop).
    Output is deterministic regardless of partitioning: min() is
    order-free.  ``stats``, if given a dict, receives
    {'rounds': r, 'changed_per_round': [...]} for convergence audits.
    """
    from pyspark.sql import functions as F

    p = pairs.select(F.col(a).alias("src"), F.col(b).alias("dst")).localCheckpoint()
    edges = (
        p.unionByName(p.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = nodes.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("label")).localCheckpoint()
    changed_hist: list[int] = []
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src").agg(F.min("label").alias("nmin"))
        )
        half = (
            labels.join(neigh, labels.node == neigh.src, "left")
            .select(
                "node",
                F.col("label").alias("old"),
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label")))
                .alias("mid"),
            )
        )
        # pointer doubling: mid -> label currently held by node `mid`.
        # Labels only ever hold ids of same-component nodes and only
        # decrease, so least(mid, label[mid]) stays in-component and
        # min-monotone; a label whose node is outside `nodes` (possible
        # only round 1 if pairs mention unknown ids) passes through.
        # half is materialized first: lut re-projects it, and the
        # doubling join shuffles the two branches on DIFFERENT keys
        # (mid vs node), so without the cut each round executed the
        # neighbour-min pipeline twice (round-5 review — the same
        # lesson already applied to `pairs` and the per-round labels)
        half = half.localCheckpoint()
        lut = half.select(F.col("node").alias("_ln"), F.col("mid").alias("_lm"))
        new = (
            half.join(lut, half.mid == lut._ln, "left")
            .select(
                "node",
                F.least(F.col("mid"), F.coalesce(F.col("_lm"), F.col("mid")))
                .alias("label"),
                (F.least(F.col("mid"), F.coalesce(F.col("_lm"), F.col("mid")))
                 < F.col("old")).alias("chg"),
            )
            .localCheckpoint()
        )
        changed = new.filter("chg").count()  # cheap: reads the checkpoint
        changed_hist.append(changed)
        labels = new.select("node", "label")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_components did not converge in {max_iter} rounds — "
            "the pair graph has a longer diameter than any dedup graph should")
    if stats is not None:
        stats["rounds"] = len(changed_hist)
        stats["changed_per_round"] = changed_hist
    sizes = labels.groupBy("label").agg(F.count("*").cast("long").alias("cluster_size"))
    return (
        labels.join(sizes, "label")
        .select(F.col("node").alias(id_col), F.col("label").alias("canonical_id"),
                "cluster_size")
    )
