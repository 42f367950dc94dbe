"""Unigram-LM subword tokenizer (SentencePiece family, Kudo 2018) —
the second tokenizer family next to BPE (``bpe.py``).

Where BPE greedily merges pairs, the unigram model OWNS a piece
vocabulary with log-probabilities and segments by Viterbi (the max-
likelihood segmentation). Training is EM over the segmentation lattice:

1. **seed**: every substring up to ``max_piece_len`` of the top
   ``vocab_k`` corpus words, scored by occurrence mass; the corpus
   alphabet (single chars) is always included and never pruned, so any
   word of the training alphabet segments.
2. **EM**: E-step runs forward–backward (log-space) over each word's
   lattice and accumulates expected piece counts weighted by word
   frequency; M-step renormalizes to log-probs.
3. **prune**: non-char pieces with the least expected count drop by a
   ``shrink`` factor per round until ``vocab_size`` remains (a
   documented simplification of SentencePiece's loss-based pruning —
   same fixed point on Zipfian corpora, one pass cheaper).

The corpus-side work is IDENTICAL in shape to BPE's scalable path: one
word-count aggregation feeds the driver-side trainer (the word
histogram is the additive sufficient statistic, bounded by
``vocab_k``), and encoding reuses ``bpe.encoded_via_word_dict`` — each
DISTINCT word is Viterbi-segmented ONCE driver-side, broadcast, and
joined back onto the positionally-exploded corpus (Zipf makes the
distinct set tiny next to the token stream; one shuffle total).

Determinism (everything the frozen-literal oracle needs): word ranking
is (count DESC, word ASC); seed ranking (mass DESC, piece ASC); pruning
(count DESC, piece ASC); Viterbi tie-break prefers the LONGER last
piece, then the lexicographically smaller one; log-probs round to 6dp.

Reference anchor: the reference has no tokenizer training (seq-db
indexes via its text tokenizer only); this module serves SURVEY §2's
LLM-pipeline amendments like ``bpe.py``.
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bpe import bpe_word_counts, encoded_via_word_dict
from .textstats import words

#: fallback log-prob penalty for characters outside the training
#: alphabet (they segment as single-char pieces and never win ties)
_UNK_PENALTY = 10.0


def _lse(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def _em_pass(
    words_n: Sequence[Tuple[str, int]],
    logp: Dict[str, float],
    max_piece_len: int,
) -> Dict[str, float]:
    """One E-step: expected piece counts by forward–backward (log-space)
    over every word's segmentation lattice, weighted by word count."""
    exp: Dict[str, float] = defaultdict(float)
    for word, n in words_n:
        ln = len(word)
        alpha = [None] * (ln + 1)
        alpha[0] = 0.0
        for i in range(1, ln + 1):
            acc = None
            for j in range(max(0, i - max_piece_len), i):
                if alpha[j] is None:
                    continue
                lp = logp.get(word[j:i])
                if lp is None:
                    continue
                v = alpha[j] + lp
                acc = v if acc is None else _lse(acc, v)
            alpha[i] = acc
        if alpha[ln] is None:
            continue  # unreachable with char coverage; defensive
        beta = [None] * (ln + 1)
        beta[ln] = 0.0
        for i in range(ln - 1, -1, -1):
            acc = None
            for j in range(i + 1, min(ln, i + max_piece_len) + 1):
                if beta[j] is None:
                    continue
                lp = logp.get(word[i:j])
                if lp is None:
                    continue
                v = beta[j] + lp
                acc = v if acc is None else _lse(acc, v)
            beta[i] = acc
        z = alpha[ln]
        for i in range(ln):
            if beta[i] is None or alpha[i] is None:
                continue
            for j in range(i + 1, min(ln, i + max_piece_len) + 1):
                piece = word[i:j]
                lp = logp.get(piece)
                if lp is None or beta[j] is None:
                    continue
                post = math.exp(alpha[i] + lp + beta[j] - z)
                if post > 0.0:
                    exp[piece] += n * post
    return exp


def train_unigram_from_counts(
    counts: DataFrame,
    vocab_size: int = 300,
    vocab_k: int = 4000,
    max_piece_len: int = 8,
    seed_size: int = 1500,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> List[Tuple[str, float]]:
    """Train from a ``(w, n)`` word-count frame (the additive sufficient
    statistic — same incremental-state story as BPE). Returns
    ``[(piece, logp)]`` sorted (logp DESC, piece ASC), logp at 6dp."""
    rows = (
        counts.orderBy(F.col("n").desc(), F.col("w").asc())
        .limit(vocab_k)
        .collect()
    )
    words_n = [(r["w"], int(r["n"])) for r in rows]
    if not words_n:
        raise ValueError("empty corpus")
    # ---- seed: substring mass + the full alphabet
    mass: Dict[str, float] = defaultdict(float)
    chars = set()
    for w, n in words_n:
        for c in w:
            chars.add(c)
        ln = len(w)
        for i in range(ln):
            for j in range(i + 2, min(ln, i + max_piece_len) + 1):
                mass[w[i:j]] += n
    seed = sorted(mass.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_size]
    pieces = {p for p, _m in seed} | chars
    # init log-probs from seed mass (chars get their unigram char mass)
    cmass: Dict[str, float] = defaultdict(float)
    for w, n in words_n:
        for c in w:
            cmass[c] += n
    init = {p: mass.get(p, 0.0) + cmass.get(p, 0.0) + 1.0 for p in pieces}
    tot = sum(init.values())
    logp = {p: math.log(v / tot) for p, v in init.items()}
    target = max(vocab_size, len(chars))

    def m_step(exp: Dict[str, float]) -> Dict[str, float]:
        # chars keep a floor so coverage never dies
        c = {p: exp.get(p, 0.0) + (1e-6 if p in chars else 0.0)
             for p in logp}
        c = {p: v for p, v in c.items() if v > 0.0 or p in chars}
        t = sum(c.values())
        return {p: math.log(max(v, 1e-12) / t) for p, v in c.items()}

    while True:
        for _ in range(em_iters):
            logp = m_step(_em_pass(words_n, logp, max_piece_len))
        n_now = len(logp)
        if n_now <= target:
            break
        keep = max(target, int(n_now * shrink))
        exp = _em_pass(words_n, logp, max_piece_len)
        non_char = sorted(
            ((p, exp.get(p, 0.0)) for p in logp if p not in chars),
            key=lambda kv: (-kv[1], kv[0]),
        )
        kept = {p for p, _v in non_char[: max(0, keep - len(chars))]} | chars
        logp = {p: lp for p, lp in logp.items() if p in kept}
        if len(logp) == n_now:
            break  # nothing prunable; all chars
    for _ in range(em_iters):
        logp = m_step(_em_pass(words_n, logp, max_piece_len))
    out = [(p, round(lp, 6)) for p, lp in logp.items()]
    out.sort(key=lambda kv: (-kv[1], kv[0]))
    return out


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 300,
    vocab_k: int = 4000,
    max_piece_len: int = 8,
    seed_size: int = 1500,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> List[Tuple[str, float]]:
    """Train a unigram-LM vocabulary from the corpus: one distributed
    word-count aggregation + the deterministic driver-side EM loop."""
    return train_unigram_from_counts(
        bpe_word_counts(df, text_col),
        vocab_size, vocab_k, max_piece_len, seed_size, em_iters, shrink,
    )


def viterbi_segment(
    word: str,
    pieces: Sequence[Tuple[str, float]] | Dict[str, float],
    max_piece_len: int = 8,
) -> List[str]:
    """Max-likelihood segmentation under the piece log-probs.

    Tie-break at equal path score: the LONGER last piece wins, then the
    lexicographically smaller one — a total order, so segmentation is a
    pure function of (word, pieces). Characters outside the vocabulary
    segment as themselves with a large penalty (UNK-as-char)."""
    logp = dict(pieces) if not isinstance(pieces, dict) else pieces
    floor = min(logp.values()) - _UNK_PENALTY if logp else -_UNK_PENALTY
    ln = len(word)
    best: List[Tuple[float, int, str] | None] = [None] * (ln + 1)
    best[0] = (0.0, 0, "")
    for i in range(1, ln + 1):
        cand = None
        for j in range(max(0, i - max_piece_len), i):
            if best[j] is None:
                continue
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                if i - j > 1:
                    continue
                lp = floor  # single unknown char fallback
            score = best[j][0] + lp
            key = (score, len(piece), _neg_lex(piece))
            if cand is None or key > cand[0]:
                cand = (key, j, piece)
        best[i] = (cand[0][0], cand[1], cand[2])
    out: List[str] = []
    i = ln
    while i > 0:
        _s, j, piece = best[i]
        out.append(piece)
        i = j
    out.reverse()
    return out


class _neg_lex(str):
    """Ordering adapter: smaller string compares GREATER, so a max() on
    (score, len, _neg_lex(piece)) prefers the lexicographically smaller
    piece on full ties."""

    def __lt__(self, other):  # type: ignore[override]
        return str.__gt__(self, other)

    def __gt__(self, other):  # type: ignore[override]
        return str.__lt__(self, other)


def unigram_word_dict(
    words_df: DataFrame,
    pieces: Sequence[Tuple[str, float]],
    word_col: str = "w",
    max_piece_len: int = 8,
    max_driver_vocab: int = 2_000_000,
) -> DataFrame:
    """``(w, toks)`` Viterbi dictionary over a DISTINCT-word frame —
    the unigram counterpart of ``bpe.bpe_word_dict(mode='driver')``."""
    rows = words_df.select(F.col(word_col).alias("w")).limit(
        max_driver_vocab + 1
    ).collect()
    if len(rows) > max_driver_vocab:
        raise ValueError(
            f"distinct vocabulary exceeds max_driver_vocab="
            f"{max_driver_vocab}; shard the word frame or raise the bound"
        )
    logp = dict(pieces)
    spark = words_df.sparkSession
    return spark.createDataFrame(
        [(r["w"], viterbi_segment(r["w"], logp, max_piece_len))
         for r in rows],
        "w string, toks array<string>",
    )


def unigram_encoded(
    df: DataFrame,
    pieces: Sequence[Tuple[str, float]],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 8,
    broadcast_dict: bool = True,
) -> DataFrame:
    """Corpus encode: distinct words Viterbi-segmented once, broadcast,
    joined back in word order — ``bpe_encoded_via_dict``'s plan with the
    unigram dictionary. Output: (id, unigram_text, n_unigram_tokens)."""
    wcol = words(F.col(text_col))
    # array_distinct BEFORE the explode: per-doc dedup runs in codegen
    # and shrinks the distinct shuffle's input by the per-doc repetition
    # factor; distinct(explode(array_distinct(x))) == distinct(explode(x))
    distinct_words = df.select(
        F.explode(F.array_distinct(wcol)).alias("w")).distinct()
    wd = unigram_word_dict(distinct_words, pieces,
                           max_piece_len=max_piece_len)
    if broadcast_dict:
        wd = F.broadcast(wd)
    return encoded_via_word_dict(
        df, wd, id_col, text_col, "unigram_text", "n_unigram_tokens"
    )


def sample_segmentations(
    word: str,
    pieces,
    k: int = 4,
    seed: int = 7,
    alpha: float = 0.5,
    max_piece_len: int = 8,
) -> List[List[str]]:
    """``k`` segmentations sampled from P(seg)^alpha (subword
    regularization, Kudo 2018): forward-filtering over the lattice with
    alpha-scaled scores, then backward sampling. Deterministic: the RNG
    seeds from (seed, word, variant index), so the variant list is a
    pure function of its arguments — freezable as oracle literals.
    alpha=0 samples uniformly over segmentations; large alpha approaches
    Viterbi. Unknown chars fall back like :func:`viterbi_segment`."""
    import random

    logp = dict(pieces) if not isinstance(pieces, dict) else pieces
    floor = min(logp.values()) - _UNK_PENALTY if logp else -_UNK_PENALTY
    ln = len(word)

    def lp_of(j: int, i: int):
        piece = word[j:i]
        lp = logp.get(piece)
        if lp is None:
            return floor if i - j == 1 else None
        return lp

    # forward: alpha[i] = log sum over segmentations of word[:i] of
    # exp(alpha * logP(seg))
    fwd: List[float | None] = [None] * (ln + 1)
    fwd[0] = 0.0
    for i in range(1, ln + 1):
        acc = None
        for j in range(max(0, i - max_piece_len), i):
            if fwd[j] is None:
                continue
            lp = lp_of(j, i)
            if lp is None:
                continue
            v = fwd[j] + alpha * lp
            acc = v if acc is None else _lse(acc, v)
        fwd[i] = acc
    out: List[List[str]] = []
    for v in range(k):
        rng = random.Random(f"{seed}:{word}:{v}")
        segs: List[str] = []
        i = ln
        while i > 0:
            cands = []
            for j in range(max(0, i - max_piece_len), i):
                if fwd[j] is None:
                    continue
                lp = lp_of(j, i)
                if lp is None:
                    continue
                cands.append((j, fwd[j] + alpha * lp))
            mx = max(w_ for _j, w_ in cands)
            ws = [math.exp(w_ - mx) for _j, w_ in cands]
            r = rng.random() * sum(ws)
            acc = 0.0
            pick = cands[-1][0]
            for (j, _w), wgt in zip(cands, ws):
                acc += wgt
                if r <= acc:
                    pick = j
                    break
            segs.append(word[pick:i])
            i = pick
        segs.reverse()
        out.append(segs)
    return out


def unigram_sampled_dict(
    words_df: DataFrame,
    pieces: Sequence[Tuple[str, float]],
    k: int = 4,
    seed: int = 7,
    alpha: float = 0.5,
    word_col: str = "w",
    max_piece_len: int = 8,
    max_driver_vocab: int = 2_000_000,
) -> DataFrame:
    """``(w, variants array<array<string>>)`` — k sampled segmentations
    per DISTINCT word (driver-side, bounded like the Viterbi dict)."""
    rows = words_df.select(F.col(word_col).alias("w")).limit(
        max_driver_vocab + 1
    ).collect()
    if len(rows) > max_driver_vocab:
        raise ValueError("distinct vocabulary exceeds max_driver_vocab")
    logp = dict(pieces)
    spark = words_df.sparkSession
    return spark.createDataFrame(
        [(r["w"], sample_segmentations(r["w"], logp, k, seed, alpha,
                                       max_piece_len)) for r in rows],
        "w string, variants array<array<string>>",
    )


def _portable_pick(id_col: str, k: int, seed: int):
    """1-based variant index from a PORTABLE hash of (doc_id, pos, seed)
    — md5-prefix, reproducible in DuckDB (xxhash64 is Spark-only), so
    the oracle can replay exactly which variant each occurrence took."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col), F.col("pos"),
                              F.lit(str(seed)))),
            1, 4,
        ),
        16, 10,
    ).cast("long")
    return (h % k + 1).cast("int")


def unigram_encoded_sampled(
    df: DataFrame,
    pieces: Sequence[Tuple[str, float]],
    k: int = 4,
    seed: int = 7,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 8,
    broadcast_dict: bool = True,
) -> DataFrame:
    """Subword-REGULARIZED corpus encode: every word OCCURRENCE draws one
    of k sampled segmentations (the augmentation that makes downstream
    models robust to segmentation ambiguity), while the corpus pass
    stays the dictionary-join plan — sampling cost is distinct_words x k
    driver-side, and the per-occurrence choice is pure Catalyst (a
    portable md5 pick over (doc_id, pos, seed), no Python, no RNG state
    on executors). Same output shape/NULL semantics as
    :func:`unigram_encoded`."""
    wcol = words(F.col(text_col))
    distinct_words = df.select(F.explode(wcol).alias("w")).distinct()
    wd = unigram_sampled_dict(distinct_words, pieces, k, seed, alpha,
                              max_piece_len=max_piece_len)
    if broadcast_dict:
        wd = F.broadcast(wd)
    ex = df.select(
        F.col(id_col),
        F.col(text_col).isNotNull().alias("__has"),
        F.posexplode_outer(wcol).alias("pos", "w"),
    )
    joined = ex.join(wd, "w", "left").withColumn(
        "toks", F.element_at("variants", _portable_pick(id_col, k, seed))
    )
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.filter(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                        lambda s: s["toks"],
                    ),
                    lambda t: t.isNotNull(),
                )
            ).alias("__toks"),
            F.first("__has").alias("__has"),
        )
        .select(
            F.col(id_col),
            F.when(F.col("__has"), F.array_join("__toks", " ")).alias(
                "unigram_text"
            ),
            F.when(F.col("__has"), F.size("__toks"))
            .cast("long")
            .alias("n_unigram_tokens"),
        )
    )
