"""Text-cleaning operators for training-data pipelines.

Declarative Spark SQL plans generated from plans/webops.py (shared
with the DuckDB oracle):

* boilerplate_strip — corpus-level repeated-segment removal (the
  CCNet-style paragraph-dedup pass reshaped for single-line synthetic
  docs): hash every fixed-width token segment, mark segments that
  appear in >= min_docs distinct documents as boilerplate, drop every
  occurrence, rebuild the text in order.
* vocab_topn — corpus-wide token frequency + document frequency,
  ranked, top-N (tokenizer-prep).

Scale notes are on the SQL builders (plans/webops.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans import webops
from ..plans.textsql import SPARK
from .dedup import _stage


def boilerplate_strip(spark: SparkSession, docs: str = "documents",
                      seg_len: int = 3, min_docs: int = 3) -> DataFrame:
    """(doc_id, n_segs, n_boiler, clean_text).

    The segment relation feeds BOTH the boilerplate aggregate and the
    rejoin, so it is materialized (persist + unique temp view, the
    dedup.py staging convention — Spark's CTE inlining would otherwise
    recompute the tokenize+slice pipeline per consumer; same pathology
    PLANS.md documents for minhash/winnowing).  Cache contract as in
    operators/dedup.py."""
    segrows = _stage(spark, webops.boiler_segments_sql(SPARK, docs, seg_len),
                     "_bp_segrows")
    return spark.sql(webops.boilerplate_from(SPARK, segrows, min_docs))


def vocab_topn(spark: SparkSession, docs: str = "documents",
               topn: int = 128) -> DataFrame:
    """(token_id, token, tf, df) for the ``topn`` most frequent tokens
    (single consumer chain — no staging needed)."""
    return spark.sql(webops.vocab_topn_sql(SPARK, docs, topn))


def text_profile(spark: SparkSession, docs: str = "documents") -> DataFrame:
    """Per-doc token statistics + language heuristic in one pass
    (webops.text_profile_sql semantics) with the tokenize stage
    materialized — eight consuming expressions would otherwise each
    inline the split pipeline (PLANS.md 'Expression staging' #1).
    Cache contract as in operators/dedup.py."""
    base = _stage(spark, webops.text_profile_base_sql(SPARK, docs), "_prof_base")
    return spark.sql(webops.text_profile_from(SPARK, base))


def decontaminate(spark: SparkSession, docs: str = "documents",
                  holdout_mod: int = 50) -> DataFrame:
    """Benchmark decontamination (webops.decontaminate_sql semantics)
    with the perdoc shingle stage materialized: the stage feeds the
    holdout set, the train probe AND the final left join — three CTE
    references Spark would otherwise each re-execute (~40 s at the
    sf0.1 probe vs under a second staged).  Cache contract as in
    operators/dedup.py."""
    perdoc = _stage(spark, webops.decontaminate_perdoc_sql(SPARK, docs),
                    "_dec_perdoc")
    body = webops.decontaminate_from(SPARK, perdoc, holdout_mod)
    return spark.sql(f"WITH {body.lstrip()}")


def corpus_filter_audit(spark: SparkSession, docs: str = "documents",
                        holdout_mod: int = 50) -> DataFrame:
    """(doc_id, source, quality_bucket, dup_shingle_pct, is_exact_dup,
    is_contaminated, keep, reject_reason) — the end-to-end corpus
    cleaning verdict (webops.corpus_filter_audit_sql semantics).

    The tokenize/shingle base stage (corpus_audit_base_sql) is
    materialized ONCE (persist + unique temp view) and every audit
    stage — quality, repetition, exact-dup, decontamination — reads
    its staged _tids/_sints columns: one tokenizer pass over the
    corpus instead of one per stage (VERDICT r03 #2; CollapseProject
    would re-inline the token pipeline into every CTE consumer
    otherwise).  Cache contract as in operators/dedup.py."""
    base = _stage(spark, webops.corpus_audit_base_sql(SPARK, docs), "_audit_base")
    return spark.sql(webops.corpus_filter_audit_from(SPARK, base, holdout_mod))
