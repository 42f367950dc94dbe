"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions over the
``documents`` table schema (doc_id, text, lang, source, n_chars)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_RE = r"[^\p{L}\p{N}_]+"

# Tiny per-language stopword lists for the n-gram/stopword heuristic
# language identifier (public common words).
_LANG_STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "por", "para"],
}


def words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), _WORD_RE), lambda w: F.length(w) > 0)


def token_count(text: Column) -> Column:
    """Whitespace-word count — the cheap token counter."""
    return F.size(words(text))


def bpe_ish_token_count(text: Column) -> Column:
    """BPE-ish token estimate: count regex splits on word/punct boundaries
    plus a length/4 correction for long words (approximates subword
    splitting without a tokenizer model)."""
    ws = words(text)
    long_extra = F.aggregate(
        ws,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.floor(F.length(w) / F.lit(4)).cast("long"),
    )
    return (F.size(ws) + long_extra).cast("long")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    sw = _LANG_STOPWORDS[lang]
    ws = words(text)
    n_sw = F.size(F.filter(ws, lambda w: w.isin(*sw)))
    return F.when(F.size(ws) > 0, n_sw / F.size(ws)).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Heuristic quality in [0,1]: mean word length sanity + alpha ratio +
    stopword presence, the usual cheap pretraining-data filters."""
    ws = words(text)
    n = F.size(ws)
    mean_len = F.when(n > 0, F.length(F.array_join(ws, "")) / n).otherwise(F.lit(0.0))
    len_ok = F.when((mean_len >= 2) & (mean_len <= 12), F.lit(1.0)).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        F.length(text) > 0,
        F.length(F.regexp_replace(F.lower(text), r"[^a-z]", "")) / F.length(text),
    ).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    sw_ok = F.when(sw > 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    return (len_ok + alpha_ratio + sw_ok) / F.lit(3.0)


def detect_lang(text: Column) -> Column:
    """Stopword-vote language guess over the supported set; 'und' when no
    votes. A real system would plug fasttext via mapInPandas — this keeps
    the operator SQL-expressible and deterministic."""
    ws = words(text)
    best = F.lit("und")
    best_score = F.lit(0)
    def in_set(words_set):
        return lambda w: w.isin(*words_set)

    for lang, sw in _LANG_STOPWORDS.items():
        score = F.size(F.filter(ws, in_set(tuple(sw))))
        better = score > best_score
        best = F.when(better, F.lit(lang)).otherwise(best)
        best_score = F.when(better, score).otherwise(best_score)
    return best


def fingerprint_md5(text: Column) -> Column:
    """Portable md5 fingerprint of the normalized text (same normalization
    as :func:`fingerprint`; md5 so SQL oracles can reproduce it)."""
    return F.md5(F.array_join(words(text), " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: xxhash64 of the
    whitespace-normalized, case-folded text (rolling-hash equivalent for
    exact near-canonical dedup)."""
    normalized = F.array_join(words(text), " ")
    return F.xxhash64(normalized)


#: optional `user:password@` userinfo is consumed before the host capture —
#: credentials-in-URL appear in real web corpora, and without the skip the
#: "domain" of `http://user@host/...` would be `user`
_URL_RE = r"https?://(?:[^/@\s]+@)?[\w\.\-]+(?::\d+)?(?:/[^\s\"'<>]*)?"
_DOMAIN_RE = r"https?://(?:[^/@\s]+@)?([\w\.\-]+)"


def extract_urls(text: Column) -> Column:
    """All http(s) URLs in the text (array<string>) — regexp_extract_all,
    JVM-side."""
    return F.regexp_extract_all(text, F.lit(_URL_RE), 0)


def extract_domains(text: Column) -> Column:
    """Distinct lower-cased host names of the text's URLs. Feeds per-domain
    corpus stats: at 100 TB, domain-level dedup/quotas (groupBy on the
    exploded domain) are how web corpora are rebalanced and blocklisted."""
    return F.array_distinct(
        F.transform(
            F.regexp_extract_all(text, F.lit(_DOMAIN_RE), 1),
            lambda d: F.lower(d),
        )
    )


def domain_stats(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """(domain, n_docs, n_urls): explode per URL, group by its host — the
    domain histogram that drives blocklists and per-domain sampling quotas.
    One explode + one groupBy; at 100 TB the shuffle key is the domain,
    whose cardinality is millions, not the corpus size."""
    per_url = df.select(
        F.col(id_col).alias("__id"),
        F.explode(extract_urls(F.col(text_col))).alias("url"),
    ).withColumn("domain", F.lower(F.regexp_extract("url", _DOMAIN_RE, 1)))
    return per_url.groupBy("domain").agg(
        F.count_distinct("__id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_urls"),
    )


def document_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count(t).cast("long"),
            "n_tokens_bpe": bpe_ish_token_count(t),
            "stopword_ratio": stopword_ratio(t),
            "quality": quality_score(t),
            "lang_guess": detect_lang(t),
            "fingerprint": fingerprint(t),
        }
    )
