"""Training-corpus scrubbing operators: PII masking, benchmark
decontamination, intra-document repetition scoring.

All pure Catalyst expressions / native joins — no Python on the scan path;
each scales as a single projection or one broadcast/shuffle join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    """Distinct word n-grams of a normalized text column (array<string>)."""
    words = F.split(F.lower(text), r"[^\p{L}\p{N}_]+")
    words = F.filter(words, lambda w: F.length(w) > 0)
    cnt = F.size(words)
    idx = F.when(
        cnt >= n, F.sequence(F.lit(1), cnt - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))
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
    words = F.split(F.lower(text), r"[^\p{L}\p{N}_]+")
    words = F.filter(words, lambda w: F.length(w) > 0)
    cnt = F.size(words)
    total = cnt - F.lit(n - 1)
    idx = F.when(total >= 1, F.sequence(F.lit(1), total)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(idx, lambda i: F.array_join(F.slice(words, i, n), " "))
    return F.when(
        total >= 1,
        F.lit(1.0) - F.size(F.array_distinct(grams)) / total.cast("double"),
    ).otherwise(F.lit(0.0))
