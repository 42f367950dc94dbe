"""Training-corpus scrubbing operators: PII masking, benchmark
decontamination, intra-document repetition scoring.

All pure Catalyst expressions / native joins — no Python on the scan path;
each scales as a single projection or one broadcast/shuffle join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .hof import let

#: deliberately simple, deterministic patterns (same regex dialect runs in
#: the DuckDB oracle); production systems would swap in stricter ones
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
PHONE_RE = r"\+?\d[\d\s().-]{7,}\d"


def pii_scrub(
    text: Column,
    email_token: str = "<EMAIL>",
    ip_token: str = "<IP>",
    phone_token: str = "<PHONE>",
) -> Column:
    """Mask emails, IPv4 addresses and phone-shaped digit runs with typed
    placeholder tokens. Order matters: emails first (their domains would
    otherwise partially match the phone pattern's digit runs is not an
    issue, but IPs inside URLs are), then IPs, then phones."""
    out = F.regexp_replace(text, EMAIL_RE, email_token)
    out = F.regexp_replace(out, IPV4_RE, ip_token)
    out = F.regexp_replace(out, PHONE_RE, phone_token)
    return out


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-grams of a normalized text column (array<string>).
    The word array is let-bound — referencing it raw inside the transform
    lambda would re-tokenize the text once per position (O(n²)/doc)."""

    def build(ws: Column) -> Column:
        cnt = F.size(ws)
        idx = F.when(
            cnt >= n, F.sequence(F.lit(1), cnt - F.lit(n - 1))
        ).otherwise(F.array().cast("array<int>"))
        return F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(ws, i, n), " "))
        )

    return let(
        F.filter(
            F.split(F.lower(text), r"[^\p{L}\p{N}_]+"),
            lambda w: F.length(w) > 0,
        ),
        build,
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    doc_id: str,
    doc_text: str,
    bench_text: str,
    n: int = 8,
) -> DataFrame:
    """Flag documents sharing ANY word n-gram with a benchmark/eval set —
    the standard n-gram-overlap contamination test for training corpora.

    Returns the input docs plus ``contaminated BOOLEAN``. The benchmark's
    n-gram set is usually tiny next to the corpus → broadcast left-semi
    join on the exploded n-grams; the corpus side stays a single pass.
    """
    bench_grams = benchmark.select(
        F.explode(word_ngrams(F.col(bench_text), n)).alias("gram")
    ).distinct()
    doc_grams = docs.select(
        F.col(doc_id).alias("__did"),
        F.explode(word_ngrams(F.col(doc_text), n)).alias("gram"),
    )
    hit_ids = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("__did")
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        docs.join(hit_ids, docs[doc_id] == hit_ids["__did"], "left")
        .drop("__did")
        .withColumn("contaminated", F.coalesce(F.col("contaminated"), F.lit(False)))
    )


def repetition_ratio(text: Column, n: int = 3) -> Column:
    """1 - distinct/total word n-grams: 0 for novel text, →1 for looping
    boilerplate (the within-document repetition signal corpus filters cut
    on). Documents shorter than n words score 0."""
    def build(ws: Column) -> Column:
        # let-bound words: a raw reference inside the transform would
        # re-tokenize per position (O(n²)/doc)
        total = F.size(ws) - F.lit(n - 1)
        idx = F.when(total >= 1, F.sequence(F.lit(1), total)).otherwise(
            F.array().cast("array<int>")
        )
        grams = F.transform(
            idx, lambda i: F.array_join(F.slice(ws, i, n), " ")
        )
        return F.when(
            total >= 1,
            F.lit(1.0) - F.size(F.array_distinct(grams)) / total.cast("double"),
        ).otherwise(F.lit(0.0))

    return let(
        F.filter(
            F.split(F.lower(text), r"[^\p{L}\p{N}_]+"),
            lambda w: F.length(w) > 0,
        ),
        build,
    )


def fuzzy_contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    doc_id: str,
    doc_text: str,
    bench_id: str,
    bench_text: str,
    n: int = 3,
    threshold: float = 0.5,
    max_df: int = 100,
) -> DataFrame:
    """Document-level fuzzy contamination: (corpus doc, benchmark doc)
    pairs whose EXACT word-n-gram Jaccard similarity reaches
    ``threshold`` — the pair-level refinement of :func:`decontaminate`
    (which only flags any-single-n-gram overlap). This is the standard
    fuzzy train/test-overlap check (GPT-3 appendix C / PaLM-style
    13-gram decontamination reports pairs, not booleans).

    Mechanics: distinct n-gram set per doc on both sides; n-grams whose
    document frequency across BOTH sides exceeds ``max_df`` are dropped
    (stop-gram cap); the sides join on the n-gram, intersections are
    counted per pair, and Jaccard = inter / (|A| + |B| - inter).

    100 TB posture: one shuffle keyed by n-gram for the join; the
    ``max_df`` cap bounds every join key's fanout to max_df^2 pairs, so
    a boilerplate n-gram ("all rights reserved ...") cannot quadratically
    explode the shuffle — the same frequency cutoff production dedup
    pipelines apply. Set sizes are map-side-combinable counts.

    Output: ``(doc_id, bench_id, inter BIGINT, jaccard DOUBLE)``.
    """
    def gram_sets(frame: DataFrame, idc: str, textc: str, side: str) -> DataFrame:
        return frame.select(
            F.col(idc).alias(f"__{side}_id"),
            F.explode(word_ngrams(F.col(textc), n)).alias("gram"),
        ).distinct()

    d = gram_sets(docs, doc_id, doc_text, "d")
    b = gram_sets(benchmark, bench_id, bench_text, "b")
    df_cap = (
        d.select("gram").unionAll(b.select("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= max_df)
        .select("gram")
    )
    d = d.join(df_cap, "gram", "left_semi")
    b = b.join(df_cap, "gram", "left_semi")
    d_sizes = d.groupBy("__d_id").agg(F.count(F.lit(1)).alias("__na"))
    b_sizes = b.groupBy("__b_id").agg(F.count(F.lit(1)).alias("__nb"))
    inter = (
        d.join(b, "gram")
        .groupBy("__d_id", "__b_id")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        inter.join(d_sizes, "__d_id")
        .join(b_sizes, "__b_id")
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.col("__na") + F.col("__nb") - F.col("inter")).cast("double"),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("__d_id").alias(doc_id),
            F.col("__b_id").alias(bench_id),
            "inter",
            "jaccard",
        )
    )
