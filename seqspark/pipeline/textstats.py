"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure Catalyst expressions over the
``documents`` table schema (doc_id, text, lang, source, n_chars)."""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hof import let

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


#: the eight Gopher "required words" (Rae et al. 2021, §A1.1 — public)
_GOPHER_REQUIRED = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_required_hits: int = 2,
) -> DataFrame:
    """Gopher-style rule-based quality flags (Rae et al. 2021 §A1.1, the
    standard web-corpus pre-filter). Adds one boolean column per rule plus
    ``gopher_keep`` (AND of all rules) — callers filter or inspect the
    per-rule rejection mix. Pure Catalyst projection: at 100 TB this is a
    narrow map over the scan, no shuffle, no Python.

    Rules: word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; '#'/'…'-symbol-to-word ratio
    ≤ max_symbol_ratio; ≥ min_alpha_word_ratio of words contain a letter;
    ≥ min_required_hits distinct Gopher required words present."""
    t = F.col(text_col)
    ws = words(t)
    n = F.size(ws)
    mean_len = F.when(n > 0, F.length(F.array_join(ws, "")) / n).otherwise(
        F.lit(0.0)
    )
    # symbols: '#', the one-char ellipsis, and each non-overlapping '...'
    symbols = F.length(F.regexp_replace(t, r"[^#…]", "")) + F.size(
        F.regexp_extract_all(t, F.lit(r"\.\.\."), 0)
    )
    alpha_words = F.size(F.filter(ws, lambda w: w.rlike(r"\p{L}")))
    required_hits = F.size(
        F.array_intersect(ws, F.array(*[F.lit(w) for w in _GOPHER_REQUIRED]))
    )
    rules = {
        "rule_word_count": (n >= min_words) & (n <= max_words),
        "rule_mean_word_len": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "rule_symbol_ratio": F.when(
            n > 0, (symbols / n) <= max_symbol_ratio
        ).otherwise(F.lit(False)),
        "rule_alpha_words": F.when(
            n > 0, (alpha_words / n) >= min_alpha_word_ratio
        ).otherwise(F.lit(False)),
        "rule_required_words": required_hits >= min_required_hits,
    }
    out = df.withColumns(rules)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else (keep & F.col(name))
    return out.withColumn("gopher_keep", keep)


def _dup_members(items: Column) -> Column:
    """Occurrences belonging to duplicate groups: sort the array, keep every
    element equal to a neighbor — Σ over groups with count>1 of count
    elements, in O(n log n) JVM expressions (no shuffle, no Python).
    The sorted array is let-bound: referencing the sort expression inside
    the filter lambda would RE-SORT per element (O(n² log n)/doc)."""
    return let(
        F.array_sort(items),
        lambda s: F.filter(
            s,
            lambda x, i: F.coalesce(F.get(s, i - 1) == x, F.lit(False))
            | F.coalesce(F.get(s, i + 1) == x, F.lit(False)),
        ),
    )


def _chars_of(items: Column) -> Column:
    return F.aggregate(
        items, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )


def word_ngrams(ws: Column, n: int) -> Column:
    """Space-joined word n-grams (overlapping). ``ws`` is let-bound —
    callers pass a tokenize EXPRESSION, and a raw reference inside the
    transform lambda would re-run it per position (O(n²)/doc)."""
    return let(
        ws,
        lambda w: F.when(
            F.size(w) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(w) - n),
                lambda i: F.array_join(F.slice(w, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>")),
    )


def _top_gram_chars(grams: Column) -> Column:
    """max over distinct grams of count × len(gram), via one sorted fold:
    track the current run length and the best count×len seen."""
    s = F.array_sort(grams)
    init = F.struct(
        F.lit("").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).cast("long").alias("best"),
    )

    def step(acc, g):
        run = F.when(g == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        # a gram seen ONCE is not repetition — it must not dominate short
        # docs, so only runs of >= 2 compete
        return F.struct(
            g.alias("prev"),
            run.alias("run"),
            F.when(
                run >= 2,
                F.greatest(acc["best"], (run * F.length(g)).cast("long")),
            )
            .otherwise(acc["best"])
            .alias("best"),
        )

    return F.aggregate(s, init, step, lambda acc: acc["best"])


#: Gopher §A1.2 thresholds (Rae et al. 2021, public)
_TOP_NGRAM_MAX = {2: 0.20, 3: 0.18, 4: 0.16}
_DUP_NGRAM_MAX = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def gopher_repetition_filter(
    df: DataFrame,
    text_col: str = "text",
    max_dup_line_frac: float = 0.30,
    max_dup_para_frac: float = 0.30,
    max_dup_line_char_frac: float = 0.20,
    max_dup_para_char_frac: float = 0.20,
    top_ngram_max: dict | None = None,
    dup_ngram_max: dict | None = None,
) -> DataFrame:
    """Gopher repetition-removal rules (Rae et al. 2021 §A1.2) — the
    companion to :func:`gopher_filter`'s quality rules. Pure Catalyst
    projection: every statistic is computed per document with array
    expressions (sorted-neighbor duplicate detection, a sorted fold for
    the top n-gram), so at 100 TB this is a narrow map over the scan with
    NO shuffle and NO Python — corpus-wide explode+groupBy would shuffle
    ~9 n-gram rows per word for no reason when the aggregation is
    per-document.

    Definitions (documented because implementations vary):

    - lines / paragraphs are the non-blank ``\\n`` / blank-line splits;
    - ``dup_*_frac``        = occurrences in duplicate groups / items;
    - ``dup_*_char_frac``   = their characters / len(text);
    - ``top_Ngram_char_frac`` = max over grams WITH count≥2 of
      count×len(gram) / len(text) (a gram seen once is not repetition);
    - ``dup_Ngram_char_frac`` = Σ over grams with count>1 of
      count×len(gram) / len(text).

    Adds the fraction columns, one boolean per rule, and
    ``gopher_rep_keep`` (AND of all rules)."""
    top_ngram_max = _TOP_NGRAM_MAX if top_ngram_max is None else top_ngram_max
    dup_ngram_max = _DUP_NGRAM_MAX if dup_ngram_max is None else dup_ngram_max
    t = F.col(text_col)
    text_chars = F.length(t)
    ws = words(t)

    def _frac(num, den):
        return F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))

    cols: dict = {}
    rules: dict = {}
    for name, items, max_frac, max_char_frac in (
        (
            "line",
            F.filter(F.split(t, r"\n"), lambda l: F.length(F.trim(l)) > 0),
            max_dup_line_frac,
            max_dup_line_char_frac,
        ),
        (
            "para",
            F.filter(F.split(t, r"\n{2,}"), lambda p: F.length(F.trim(p)) > 0),
            max_dup_para_frac,
            max_dup_para_char_frac,
        ),
    ):
        dups = _dup_members(items)
        cols[f"dup_{name}_frac"] = _frac(F.size(dups), F.size(items))
        cols[f"dup_{name}_char_frac"] = _frac(_chars_of(dups), text_chars)
        rules[f"rule_dup_{name}_frac"] = (
            F.col(f"dup_{name}_frac") <= max_frac
        )
        rules[f"rule_dup_{name}_char_frac"] = (
            F.col(f"dup_{name}_char_frac") <= max_char_frac
        )
    for n, mx in top_ngram_max.items():
        cols[f"top_{n}gram_char_frac"] = _frac(
            _top_gram_chars(word_ngrams(ws, n)), text_chars
        )
        rules[f"rule_top_{n}gram"] = F.col(f"top_{n}gram_char_frac") <= mx
    for n, mx in dup_ngram_max.items():
        cols[f"dup_{n}gram_char_frac"] = _frac(
            _chars_of(_dup_members(word_ngrams(ws, n))), text_chars
        )
        rules[f"rule_dup_{n}gram"] = F.col(f"dup_{n}gram_char_frac") <= mx
    out = df.withColumns(cols).withColumns(rules)
    keep = None
    for name in rules:
        keep = F.col(name) if keep is None else (keep & F.col(name))
    return out.withColumn("gopher_rep_keep", keep)


def c4_filter(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4-style cleaning (Raffel et al. 2020 §2.2, the public rules):
    keep only lines that end in terminal punctuation AND have at least
    ``min_line_words`` words; flag pages containing ``lorem ipsum`` or a
    curly brace, or with fewer than ``min_sentences`` sentences after line
    cleaning. Adds ``text_clean`` (kept lines re-joined), per-rule
    booleans, and ``c4_keep``. Pure Catalyst projection — no shuffle, no
    Python."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    line_ok = lambda l: l.rlike(r'[.!?"]\s*$') & (
        F.size(F.filter(F.split(l, r"\s+"), lambda w: F.length(w) > 0))
        >= F.lit(min_line_words)
    )
    kept = F.filter(lines, line_ok)
    clean = F.array_join(kept, "\n")
    n_sentences = F.size(F.regexp_extract_all(clean, F.lit(r"[.!?]"), 0))
    rules = {
        "text_clean": clean,
        "rule_no_lorem": ~F.lower(t).contains("lorem ipsum"),
        "rule_no_brace": ~t.contains("{"),
    }
    out = df.withColumns(rules).withColumn(
        "rule_min_sentences", n_sentences >= F.lit(min_sentences)
    )
    return out.withColumn(
        "c4_keep",
        F.col("rule_no_lorem")
        & F.col("rule_no_brace")
        & F.col("rule_min_sentences"),
    )


#: sentinel vocab row carrying the out-of-vocabulary log-probability —
#: words() never yields an empty string, so the key cannot collide
_OOV_WORD = ""


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(word, c)`` corpus token counts — ONE explode + one word-keyed
    agg. The shared sufficient statistic of the unigram and bigram LMs;
    compute it once and pass it to both trainers."""
    return (
        df.select(F.explode(words(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def train_unigram_lm(
    df: DataFrame, text_col: str = "text", vocab_k: int = 50_000,
    counts: Optional[DataFrame] = None,
) -> DataFrame:
    """Train a unigram language model for perplexity-proxy quality scoring
    (the CCNet-style LM filter, Wenzek et al. 2020, with a unigram model
    instead of KenLM — no external model files).

    Returns ``(word STRING, logp DOUBLE)``: the ``vocab_k`` most frequent
    words with Laplace-smoothed log probabilities
    ``ln((c_w + 1) / (total + V + 1))`` plus one sentinel row
    (word = \"\") holding the OOV log probability ``ln(1 / (total + V + 1))``.
    Ties at the vocabulary boundary break deterministically by word.

    Cost: one explode + one groupBy keyed by WORD (cardinality = vocab,
    not corpus) + a TakeOrdered — at 100 TB train on a sample
    (``df.sample(...)``), exactly like production CCNet does. Pass a
    precomputed :func:`word_counts` frame via ``counts`` to share the
    corpus-token aggregation with other trainers (``train_bigram_lm``
    does)."""
    if counts is None:
        counts = word_counts(df, text_col)
    agg = counts.agg(
        F.sum("c").alias("total"), F.count(F.lit(1)).alias("v")
    )
    top = counts.orderBy(F.desc("c"), "word").limit(vocab_k)
    vocab = top.crossJoin(F.broadcast(agg)).select(
        "word",
        F.log((F.col("c") + 1) / (F.col("total") + F.col("v") + 1)).alias(
            "logp"
        ),
    )
    oov = agg.select(
        F.lit(_OOV_WORD).alias("word"),
        F.log(1.0 / (F.col("total") + F.col("v") + 1)).alias("logp"),
    )
    return vocab.unionByName(oov)


def unigram_logprob_score(
    df: DataFrame, lm: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Score each document with the mean per-token log probability under a
    :func:`train_unigram_lm` model — low (very negative) means
    gibberish/boilerplate, the cut corpus filters apply. Adds ``n_tokens``
    and ``mean_logp`` (0.0 for empty docs, pinned).

    The LM is broadcast (≤ vocab_k+1 rows); the only shuffle is the
    per-document re-aggregation keyed by id."""
    oov = lm.filter(F.col("word") == _OOV_WORD).select(
        F.col("logp").alias("__oov")
    )
    toks = df.select(
        F.col(id_col), F.explode(words(F.col(text_col))).alias("word")
    )
    scored = (
        toks.join(F.broadcast(lm.filter(F.col("word") != _OOV_WORD)), "word", "left")
        .crossJoin(F.broadcast(oov))
        .select(id_col, F.coalesce("logp", "__oov").alias("logp"))
    )
    per_doc = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.avg("logp").alias("mean_logp"),
    )
    return (
        df.join(per_doc, id_col, "left")
        .withColumn("n_tokens", F.coalesce("n_tokens", F.lit(0)))
        .withColumn("mean_logp", F.coalesce("mean_logp", F.lit(0.0)))
    )


#: query params dropped at canonicalization — tracking/session noise that
#: makes byte-identical pages look distinct at URL-level dedup
_TRACKING_PARAMS = (
    "gclid", "fbclid", "yclid", "msclkid", "ref", "mc_cid", "mc_eid",
)


def canonical_url(url: Column) -> Column:
    """Canonical form for URL-level dedup (the first dedup pass of every
    web-corpus pipeline — far cheaper than content dedup because the key
    is the URL string itself):

    - fragment stripped; scheme and host:port lowercased;
    - default ports dropped (``:80`` for http, ``:443`` for https);
    - tracking query params dropped (``utm_*`` + the usual click ids);
    - surviving query params sorted (param order never changes content);
    - trailing slashes collapsed (empty path → ``/``).

    Pure Catalyst string expressions — a narrow map, no Python. A string
    with no ``scheme://`` prefix passes through unchanged."""
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    hostport = F.lower(
        F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?\s]+)", 1)
    )
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, r":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    pathq = F.regexp_extract(
        u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?\s]+([/?][^\s]*)?$", 1
    )
    path = F.regexp_replace(F.regexp_extract(pathq, r"^([^?]*)", 1), r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    params = F.filter(
        F.split(query, "&"),
        lambda p: (F.length(p) > 0)
        & ~F.regexp_extract(p, r"^([^=]*)", 1).startswith("utm_")
        & ~F.regexp_extract(p, r"^([^=]*)", 1).isin(*_TRACKING_PARAMS),
    )
    qpart = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&"))
    ).otherwise(F.lit(""))
    return F.when(
        scheme == "", url
    ).otherwise(F.concat(scheme, F.lit("://"), hostport, path, qpart))


def url_dedup(
    df: DataFrame, url_col: str, id_col: str, out_col: str = "canonical_url"
) -> DataFrame:
    """Keep ONE row per canonical URL (the lowest id wins, deterministic):
    one shuffle keyed by the canonical string — corpus-size-proportional
    but embarrassingly partitionable, the standard first pass before
    content-level dedup."""
    from .dedup import exact_dedup

    return exact_dedup(
        df.withColumn(out_col, canonical_url(F.col(url_col))),
        [out_col],
        id_col,
    )


def token_budget_report(
    df: DataFrame, group_col: str, text_col: str = "text"
) -> DataFrame:
    """Per-group token accounting for mixture design: docs, whitespace
    tokens, and each group's share of the corpus token budget. One
    group-key shuffle (group cardinality ≪ corpus) + a scalar total —
    the bookkeeping behind source-mixing weights."""
    per = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).cast("long").alias("n_tokens"),
    )
    total = F.sum("n_tokens").over(Window.partitionBy())
    return per.withColumn(
        "token_share", F.round(F.col("n_tokens") / total, 6)
    )


# ------------------------------------------------- quality classifier (GPT-3 style)


def hashed_token_index(word: Column, dim: int) -> Column:
    """Deterministic hashed-feature index of a token: the first 4 hex
    chars of md5 parsed as an int, mod ``dim``. md5 is available and
    bit-identical in every engine (Spark, DuckDB, Python), so scores are
    reproducible outside Spark — unlike murmur-based ``F.hash``."""
    return (
        F.conv(F.substring(F.md5(word), 1, 4), 16, 10).cast("int") % dim
    )


def train_quality_classifier(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    dim: int = 256,
    sample_docs: int = 2000,
    iters: int = 300,
    lr: float = 0.5,
    l2: float = 1e-3,
) -> tuple[list[float], float]:
    """Train a fasttext-style linear quality classifier: logistic
    regression over hashed mean-token features — the GPT-3/PaLM corpus
    curation step (classify docs as reference-corpus-like vs crawl-like,
    keep high scorers; GPT-3 appendix A trains exactly this shape against
    WebText as the positive class).

    Feature extraction is distributed Catalyst (explode + groupBy); only
    a ``sample_docs``-bounded dense matrix (sample_docs x dim doubles)
    ever reaches the driver, where a deterministic full-batch gradient
    descent fits (weights, bias). At 100 TB the sample cap IS the design:
    classifier quality saturates in thousands of examples while scoring
    (see :func:`quality_classifier_score`) stays corpus-side.

    Returns ``(weights[dim], bias)``.
    """
    import numpy as np

    # deterministic, layout-independent sample: rank every candidate by a
    # content hash and take the lowest `sample_docs` — a TakeOrdered of
    # sample_docs rows, not a full sort. `.limit()` alone would take
    # whatever partitions enumerate first (biased toward early files and
    # unstable under repartition); the hash rank is a uniform draw that
    # survives any physical layout. Rank ties (identical (text, label)
    # rows) are interchangeable, so membership is layout-independent even
    # when the cutoff lands inside a tie. The per-doc grouping key is a
    # FRESH id assigned AFTER sampling, so k copies of a common reference
    # doc stay k training examples (weight k, not 1) — full-batch GD is
    # row-order invariant, so the id's arbitrary values cannot affect the
    # learned weights.
    feats = (
        df.select(
            F.col(label_col).cast("double").alias("__y"),
            F.xxhash64(F.col(text_col), F.col(label_col)).alias("__rk"),
            words(F.col(text_col)).alias("__ws"),
        )
        .filter(F.size("__ws") > 0)
        .orderBy("__rk")
        .limit(sample_docs)
        .withColumn("__doc", F.monotonically_increasing_id())
        .select(
            "__doc", "__y", F.explode("__ws").alias("__w"),
        )
        .withColumn("__idx", hashed_token_index(F.col("__w"), dim))
        .groupBy("__doc", "__y")
        .agg(
            F.collect_list("__idx").alias("__idxs"),
            F.count(F.lit(1)).alias("__n"),
        )
        .collect()
    )
    if not feats:
        raise ValueError("no non-empty documents to train on")
    # content-deterministic row order: groupBy collect order is not
    # guaranteed, and float summation is not associative — sort by the
    # example's content so the learned weights are bit-reproducible
    feats.sort(key=lambda r: (r["__y"], r["__n"], sorted(r["__idxs"])))
    X = np.zeros((len(feats), dim))
    y = np.zeros(len(feats))
    for i, row in enumerate(feats):
        y[i] = row["__y"]
        n = row["__n"]
        for idx in row["__idxs"]:
            X[i, idx] += 1.0 / n  # mean token features, fasttext-style
    w = np.zeros(dim)
    b = 0.0
    for _ in range(iters):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g / len(y) + l2 * w)
        b -= lr * float(g.mean())
    return [float(v) for v in w], float(b)


def quality_classifier_score(
    text: Column, weights: list[float], bias: float
) -> Column:
    """Score a document with a trained :func:`train_quality_classifier`
    model — PURE Catalyst (no UDF, no model files): mean of the hashed
    token weights through a sigmoid. Weights are a broadcast-size literal
    array riding the plan; the expression runs inside whole-stage codegen
    on every executor. Empty documents score ``sigmoid(bias)``."""
    dim = len(weights)
    warr = F.array(*[F.lit(float(v)) for v in weights])
    ws = words(text)
    n = F.size(ws)
    total = F.aggregate(
        ws,
        F.lit(0.0),
        lambda acc, w: acc
        + F.element_at(warr, hashed_token_index(w, dim) + 1),
    )
    z = F.lit(float(bias)) + F.when(n > 0, total / n).otherwise(F.lit(0.0))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


# ------------------------------------------------- DSIR importance resampling


def dsir_ngram_buckets(
    text: Column, dim: int = 10_000, bucket_fn=None
) -> Column:
    """Hashed unigram+bigram feature buckets of a document (DSIR, Xie et
    al. 2023, "Data Selection for Language Models via Importance
    Resampling" — the public method): every word and every adjacent word
    pair hashed into ``dim`` buckets. ``bucket_fn(gram, dim)`` picks the
    hash: the default md5-prefix index (:func:`hashed_token_index`) is
    engine-PORTABLE (scores reproduce bit-identically outside Spark — the
    oracle requirement); :func:`murmur_token_index` is ~1.7× faster per
    corpus pass (measured, 30M grams) and the right choice for production
    selection runs, where only self-consistency matters. Pure Catalyst —
    a narrow map, no Python."""
    if bucket_fn is None:
        bucket_fn = hashed_token_index
    return let(
        words(text),
        lambda ws: F.transform(
            F.concat(ws, word_ngrams(ws, 2)),
            lambda g: bucket_fn(g, dim),
        ),
    )


def murmur_token_index(word: Column, dim: int) -> Column:
    """Fast non-portable hashed-feature index: Spark's murmur3 ``F.hash``
    mod ``dim`` (pmod: murmur is signed). ~1.7× cheaper than the md5
    prefix per corpus pass; use wherever the buckets only need to be
    SELF-consistent (production DSIR runs) — never where an external
    engine must reproduce them (oracles, cross-system scoring)."""
    return F.pmod(F.hash(word), F.lit(dim)).cast("int")


def dsir_bucket_counts(
    df: DataFrame, text_col: str = "text", dim: int = 10_000,
    bucket_fn=None,
) -> DataFrame:
    """``(bucket INT, c BIGINT)`` hashed-feature counts of a corpus — the
    sufficient statistics of DSIR's bag-of-hashed-ngrams model. One
    explode + one groupBy keyed by BUCKET: cardinality is ``dim`` (10k),
    not corpus size, so map-side partial aggregation reduces each task's
    output to ≤dim rows no matter how many documents it scanned — the
    whole 100 TB raw corpus contributes one dim-sized frame.

    ``bucket_fn`` must match the one used at scoring time — thread ONE
    choice through the whole selection (``dsir_select`` does)."""
    return (
        df.select(
            F.explode(
                dsir_ngram_buckets(F.col(text_col), dim, bucket_fn)
            ).alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dsir_log_ratios(
    target_counts: DataFrame, raw_counts: DataFrame, dim: int = 10_000
) -> DataFrame:
    """``(bucket, log_ratio)`` for EVERY bucket in [0, dim): Laplace-
    smoothed ``ln p_target(b) − ln p_raw(b)``. Densified over
    ``spark.range(dim)`` so a gram whose bucket appears in neither corpus
    still gets the correct smoothed ratio instead of a silent null. The
    result is dim rows — broadcast-sized by construction."""
    spark = target_counts.sparkSession
    buckets = spark.range(dim).select(F.col("id").cast("int").alias("bucket"))
    # coalesce: sum() over an EMPTY counts frame is null, and a null total
    # would null every ratio — which dsir_score's coalesce then pins to
    # 0.0, silently degrading the draw to uniform. A zero total keeps the
    # Laplace arithmetic well-defined for a degenerate (empty) corpus.
    t_tot = target_counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("t_total"))
    r_tot = raw_counts.agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("r_total"))
    return (
        buckets.join(
            target_counts.withColumnRenamed("c", "ct"), "bucket", "left")
        .join(raw_counts.withColumnRenamed("c", "cr"), "bucket", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("ct", F.lit(0)) + 1)
                    / (F.col("t_total") + F.lit(dim))
                )
                - F.log(
                    (F.coalesce("cr", F.lit(0)) + 1)
                    / (F.col("r_total") + F.lit(dim))
                )
            ).alias("log_ratio"),
        )
    )


def dsir_weights(
    df: DataFrame,
    log_ratios: DataFrame,
    id_col: str,
    text_col: str = "text",
    dim: int = 10_000,
    bucket_fn=None,
) -> DataFrame:
    """NARROW per-document DSIR frame: ``(id, n_grams, log_importance)``
    — the aggregate :func:`dsir_score` computes, without re-attaching the
    document columns. ``explode_outer`` keeps zero-gram documents in the
    frame (n_grams 0, weight 0.0 — same pinned semantics), so coverage
    equals ``df`` without a second pass over the corpus. This is the
    frame a 100 TB selection should rank on: one text-column scan, one
    id-keyed shuffle of three narrow columns, nothing wide."""
    grams = df.select(
        F.col(id_col),
        F.explode_outer(
            dsir_ngram_buckets(F.col(text_col), dim, bucket_fn)
        ).alias("bucket"),
    )
    return (
        grams.join(F.broadcast(log_ratios), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.count("bucket").alias("n_grams"),
            F.coalesce(F.sum("log_ratio"), F.lit(0.0)).alias(
                "log_importance"
            ),
        )
    )


def dsir_score(
    df: DataFrame,
    log_ratios: DataFrame,
    id_col: str,
    text_col: str = "text",
    dim: int = 10_000,
    bucket_fn=None,
) -> DataFrame:
    """Per-document DSIR log importance weight: ``Σ_grams
    log_ratio(bucket(gram))`` — how much more likely the doc's hashed
    n-grams are under the target distribution than the raw one. Adds
    ``n_grams`` and ``log_importance`` (0.0 for empty docs, pinned).

    The ratio table is broadcast (dim rows); the only shuffle is the
    per-document re-aggregation keyed by id — the same shape as
    :func:`unigram_logprob_score`, corpus-scan-proportional and nothing
    more. Callers that only rank on the weight should use
    :func:`dsir_weights` directly and skip the wide re-attach join."""
    per = dsir_weights(df, log_ratios, id_col, text_col, dim, bucket_fn)
    return (
        df.join(per, id_col, "left")
        .withColumn("n_grams", F.coalesce("n_grams", F.lit(0)))
        .withColumn(
            "log_importance", F.coalesce("log_importance", F.lit(0.0))
        )
    )


def gumbel_key(id_expr: Column, seed: int = 0) -> Column:
    """Deterministic standard-Gumbel noise from md5(id || seed):
    ``u = (x₃₂ + 0.5) / 2³²`` (never 0 or 1), ``g = −ln(−ln u)``.
    Seeded and engine-portable — the same doc gets the same noise in any
    engine, so a resample is reproducible and oracle-checkable, unlike
    ``F.rand`` (partition-order-dependent) or ``Math.random``."""
    x = F.conv(
        F.substring(
            F.md5(F.concat_ws("|", id_expr.cast("string"), F.lit(str(seed)))),
            1,
            8,
        ),
        16,
        10,
    ).cast("double")
    u = (x + F.lit(0.5)) / F.lit(float(2**32))
    return -F.log(-F.log(u))


def dsir_resample(
    scored: DataFrame,
    id_col: str,
    k: int,
    seed: int = 0,
    weight_col: str = "log_importance",
    temperature: float = 1.0,
) -> DataFrame:
    """Gumbel top-k resampling: draw ``k`` documents WITHOUT replacement
    with probability ∝ ``exp(weight / temperature)`` — the sampling half
    of DSIR (and of any weighted corpus selection). ``key = weight/T +
    Gumbel(id, seed)``; the top-k by key IS the weighted sample (the
    Gumbel-max trick), and ``orderBy(...).limit(k)`` compiles to
    TakeOrderedAndProject — per-partition heaps of size k, no global
    sort, no shuffle of anything but k rows per partition. The key is
    ordered on directly (never added as a column), so the output schema
    is exactly the input's and a caller's own ``sample_key`` column is
    never clobbered."""
    key = (F.col(weight_col) / F.lit(float(temperature))) + gumbel_key(
        F.col(id_col), seed
    )
    return scored.orderBy(key.desc()).limit(k)


def dsir_select(
    raw_df: DataFrame,
    target_df: DataFrame,
    id_col: str,
    k: int,
    text_col: str = "text",
    dim: int = 10_000,
    seed: int = 0,
    temperature: float = 1.0,
    bucket_fn=None,
) -> DataFrame:
    """End-to-end DSIR data selection: fit hashed-ngram distributions on
    the target (small, quality) and raw (huge) corpora, score every raw
    doc's importance ratio, and Gumbel-top-k resample ``k`` docs. At
    100 TB: two dim-cardinality aggregations + one broadcast-join scoring
    pass over the text column + one TakeOrdered over the NARROW
    ``(id, n_grams, log_importance)`` frame — the resample never sees a
    wide row. Document columns are re-attached ONLY for the k winners
    (broadcast inner join: the corpus side is scan + hash-probe, no
    shuffle), so the former third full-width corpus pass — and the wide
    id-keyed shuffle it fed — is gone. For production runs pass
    ``bucket_fn=murmur_token_index`` (~1.7× cheaper per corpus pass; the
    md5 default exists for engine-portable, oracle-checkable scores) —
    ONE choice is threaded through fit and score, which must agree."""
    tc = dsir_bucket_counts(target_df, text_col, dim, bucket_fn)
    rc = dsir_bucket_counts(raw_df, text_col, dim, bucket_fn)
    ratios = dsir_log_ratios(tc, rc, dim)
    weights = dsir_weights(raw_df, ratios, id_col, text_col, dim, bucket_fn)
    winners = dsir_resample(weights, id_col, k, seed, temperature=temperature)
    return raw_df.join(F.broadcast(winners), id_col, "inner")


# ------------------------------------------------- HTML text extraction


#: block-level tags that imply a line break when stripped — keeping the
#: line structure is what makes the downstream line-based filters
#: (C4 rules, paragraph dedup) work on extracted text
_HTML_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|blockquote|"
    "section|article|header|footer|pre|nav|aside|form|hr"
)

#: named entities decoded (most-common set; ``&amp;`` must decode LAST or
#: ``&amp;lt;`` would double-decode into ``<``)
_HTML_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)


def html_to_text(html: Column) -> Column:
    """Pragmatic HTML→text extraction for web-corpus ingestion — the
    C4/CommonCrawl-style regex stripper, NOT a DOM parser (pipelines at
    corpus scale use exactly this class of extractor; a browser-grade
    parser buys little on the boilerplate-heavy tail and costs a UDF):

    - ``<script>``/``<style>`` elements dropped with their CONTENT;
      HTML comments dropped;
    - block-level tags (`p div li h1-h6 tr table ...`) become line
      breaks, so line-based filters (C4 rules, paragraph dedup) keep
      working on the output; all other tags become spaces;
    - the common named entities are decoded (``&amp;`` last, so
      ``&amp;lt;`` round-trips to ``&lt;`` not ``<``); numeric entities
      are left as-is (decoding them needs per-match codepoint
      arithmetic, which no regexp engine expression can do);
    - whitespace canonicalized: runs of spaces/tabs collapse, lines are
      trimmed, empty lines dropped, output joined with ``\\n``.

    Pure Catalyst regexp expressions — a narrow map inside whole-stage
    codegen, no Python. Every pattern is RE2-compatible (no
    backreferences), so the identical chain runs in DuckDB for the
    oracle."""
    t = F.regexp_replace(html, r"(?is)<script\b[^>]*>.*?</script\s*>", " ")
    t = F.regexp_replace(t, r"(?is)<style\b[^>]*>.*?</style\s*>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(
        t, r"(?is)</?(" + _HTML_BLOCK_TAGS + r")\b[^>]*/?>", "\n"
    )
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, ch in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(ch))
    # NB: \x0B spelled out — Java regex \v is the VERTICAL-WHITESPACE
    # CLASS (it matches \n too) and would flatten the line structure
    t = F.regexp_replace(t, "[ \\t\\r\\f\\x0B]+", " ")
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda l: F.trim(l)),
        lambda l: F.length(l) > 0,
    )
    return F.array_join(lines, "\n")


# --------------------------------------------- bigram LM (stupid backoff)


def train_bigram_lm(
    df: DataFrame,
    text_col: str = "text",
    vocab_k: int = 50_000,
    bigram_k: int = 200_000,
) -> tuple:
    """Train a stupid-backoff bigram LM (Brants et al. 2007, "Large
    Language Models in Machine Translation" — the standard web-scale
    backoff: no discounting to tune, scores are NOT normalized
    probabilities, which is exactly right for corpus quality scoring).

    Returns ``(vocab, bigrams)``:

    - ``vocab``: ``(word, logp)`` — the Laplace-smoothed top ``vocab_k``
      unigram model of :func:`train_unigram_lm`, with its OOV sentinel;
    - ``bigrams``: ``(bigram, logs)`` — top ``bigram_k`` space-joined
      word pairs with ``logs = ln(c(w1 w2) / c(w1))``, the conditional
      score a scoring pass uses directly (ties at the boundary break by
      bigram, deterministic).

    Cost: two corpus-token aggs (ONE word-keyed — shared with the
    unigram model via :func:`word_counts` — and one bigram-keyed, both
    map-side combined) + two TakeOrdereds. At 100 TB train on a sample
    (``hash_sample``), exactly like production CCNet/KenLM setups."""
    counts = word_counts(df, text_col)
    vocab = train_unigram_lm(df, text_col, vocab_k, counts=counts)
    uni_counts = counts.select(
        F.col("word").alias("w1"), F.col("c").alias("c1"))
    bi_counts = (
        df.select(
            F.explode(word_ngrams(words(F.col(text_col)), 2)).alias("bigram")
        )
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("cb"))
    )
    bigrams = (
        bi_counts.orderBy(F.desc("cb"), "bigram")
        .limit(bigram_k)
        .withColumn("w1", F.substring_index("bigram", " ", 1))
        .join(uni_counts, "w1")
        .select("bigram", F.log(F.col("cb") / F.col("c1")).alias("logs"))
    )
    return vocab, bigrams


#: stupid-backoff factor (Brants et al. 2007 §4: alpha = 0.4)
_BACKOFF_ALPHA = 0.4


def bigram_logprob_score(
    df: DataFrame,
    vocab: DataFrame,
    bigrams: DataFrame,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """Score each document with the mean stupid-backoff bigram score:
    for every adjacent pair ``w1 w2``, ``S = logs(w1 w2)`` when the
    bigram is in the model, else ``ln(0.4) + unigram_logp(w2)`` (OOV
    sentinel when the word is unknown too). Adds ``n_bigrams`` and
    ``mean_logs`` (0.0 for docs with <2 words, pinned) — low means the
    word ORDER is improbable, which catches shuffled/boilerplate text
    that per-token unigram scores cannot.

    Both model tables are broadcast (≤ vocab_k+1 / bigram_k rows); the
    only shuffle is the per-document re-aggregation keyed by id."""
    oov = vocab.filter(F.col("word") == _OOV_WORD).select(
        F.col("logp").alias("__oov"))
    uni = vocab.filter(F.col("word") != _OOV_WORD).select(
        F.col("word").alias("__w2"), F.col("logp").alias("__logp"))
    pairs = df.select(
        F.col(id_col),
        F.explode(word_ngrams(words(F.col(text_col)), 2)).alias("bigram"),
    ).withColumn("__w2", F.substring_index("bigram", " ", -1))
    scored = (
        pairs.join(F.broadcast(bigrams), "bigram", "left")
        .join(F.broadcast(uni), "__w2", "left")
        .crossJoin(F.broadcast(oov))
        .select(
            id_col,
            F.coalesce(
                "logs",
                F.lit(float(math.log(_BACKOFF_ALPHA)))
                + F.coalesce("__logp", "__oov"),
            ).alias("logs"),
        )
    )
    per = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.avg("logs").alias("mean_logs"),
    )
    return (
        df.join(per, id_col, "left")
        .withColumn("n_bigrams", F.coalesce("n_bigrams", F.lit(0)))
        .withColumn("mean_logs", F.coalesce("mean_logs", F.lit(0.0)))
    )


def dsir_merge_counts(*counts: DataFrame) -> DataFrame:
    """Fold :func:`dsir_bucket_counts` frames — the DAILY-INCREMENT shape
    of DSIR at corpus scale: bucket counts are additive sufficient
    statistics, so the raw distribution of corpus ∪ batch is
    ``merge(saved_counts, batch_counts)`` — a union + one
    dim-cardinality aggregation over frames of ≤dim rows each. The
    100 TB corpus is never rescanned when it grows; persist the counts
    frame per snapshot exactly like :func:`corpus_digests` persists
    dedup state, and refresh ratios/scores from the fold."""
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.groupBy("bucket").agg(F.sum("c").alias("c"))


def dsir_update_state(
    spark,
    state_path: str,
    batch_df: DataFrame,
    text_col: str = "text",
    dim: int = 10_000,
    bucket_fn=None,
) -> DataFrame:
    """Maintain a PERSISTED DSIR counts frame as the corpus grows — the
    ``foreachBatch``-callable state updater: fold the batch's bucket
    counts into the parquet state at ``state_path`` (creating it on
    first call) with a crash-safe write-then-swap, and return the
    updated counts frame.

    The swap discipline matches the doc store's compaction: the merged
    frame lands in a ``_tmp`` sibling first, the live directory is moved
    aside, tmp renamed in, the old state dropped — a crash at any point
    leaves either the old or the new state readable, never a
    half-written directory (Spark ignores the underscore-prefixed tmp).
    State size is ≤dim rows regardless of corpus size; the historical
    corpus is never rescanned (see :func:`dsir_merge_counts`). The swap
    itself is the shared :func:`seqspark.pipeline.state.
    update_parquet_state` discipline."""
    from .state import update_parquet_state

    batch = dsir_bucket_counts(batch_df, text_col, dim, bucket_fn)
    return update_parquet_state(spark, state_path, batch, dsir_merge_counts)
