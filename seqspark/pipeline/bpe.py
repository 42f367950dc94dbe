"""Byte-pair-encoding subword tokenizer, Spark-first.

Training (Sennrich et al. 2016, "Neural Machine Translation of Rare
Words with Subword Units") counts words with ONE distributed
aggregation over the whole corpus, collects only the top ``vocab_k``
(word, count) rows to the driver, and runs the classic merge loop over
that bounded table — the same sample-bounded-driver / corpus-side-apply
split as the quality classifier (`textstats.train_quality_classifier`).
At 100 TB the word-count agg is the only corpus-scale work (a single
shuffle on the word key with map-side partial aggregation); driver
traffic is ``vocab_k`` rows regardless of corpus size.

Encoding applies a FROZEN merge list in pure Catalyst — no UDF, no
shuffle, a narrow per-row projection that whole-stage codegen compiles.
The trick that makes greedy BPE expressible as a literal
``replace``-chain: each symbol is wrapped as ``\\x1f<sym>\\x1e``
(prefix + suffix delimiters, two DISTINCT control characters that the
``[\\p{L}\\p{N}_]+`` word tokenizer can never emit). A merge (a, b)
is then the literal replacement

    \\x1fa\\x1e\\x1fb\\x1e  ->  \\x1fab\\x1e

which is exactly greedy left-to-right pair merging:

- no false match can cross a symbol boundary (the pattern requires the
  COMPLETE symbol ``a`` between its delimiters, and ``b``'s terminating
  ``\\x1e`` anchors the full second symbol — ``\\x1fab..`` cannot match
  a pattern ending in ``b\\x1e`` unless the symbol IS ``b``), and
- adjacent occurrences never share a boundary character (the pattern is
  self-delimited), so ``replace``'s left-to-right non-overlapping scan
  merges every eligible pair in one pass, exactly like the reference
  greedy implementation.

Because the chain is nothing but ``regexp_replace`` + literal
``replace`` + ``split``, a DuckDB oracle can run the IDENTICAL chain —
the ``bpe_encode`` contract entry (frozen 48-merge list in
``__spark_entry__.BPE_MERGES``) is hash-verified, not rows-only.

The chain is the right plan ONLY for small frozen vocabularies: its
measured envelope (BASELINE.md round 10) ends at 320 merges, where
Catalyst's Column-tree conversion overflows the driver stack. Real
vocabularies (32k merges) go through :func:`bpe_encoded_via_dict` —
encode each DISTINCT word once (:func:`encode_word_ranked`, cost
independent of merge count), broadcast-join the dictionary back, and
reassemble token streams positionally.

Reference parity: seq-db has no subword tokenizer (its tokenizer is the
word/keyword splitter, ``tokenizer/tokenizer.go``); this operator is
part of the LLM-training-data pipeline family (token accounting for
corpus budgeting, vocabulary induction), alongside
``textstats.token_count`` / ``bpe_ish_token_count``.
"""

from __future__ import annotations

from bisect import bisect_left
from typing import Dict, List, Sequence, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import words

#: end-of-word marker appended to every word before char-splitting, so
#: merges can learn word-final subwords ("ing</w>") distinct from
#: word-internal ones — the classic Sennrich formulation. Rendered as
#: the readable "</w>" in token output.
EOW = "\x17"
#: per-symbol wrapper delimiters (see module docstring). Control chars
#: outside anything the word tokenizer can emit.
SEP_L = "\x1f"
SEP_R = "\x1e"
EOW_DISPLAY = "</w>"


def train_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 160,
    vocab_k: int = 4000,
    min_pair_count: int = 2,
) -> List[Tuple[str, str]]:
    """Learn a BPE merge list from the corpus.

    One distributed word-count aggregation (explode -> groupBy word,
    map-side combined) feeds a deterministic driver-side merge loop over
    the top ``vocab_k`` words. Returns merges in rank order; feed them
    to :func:`bpe_tokens` / :func:`bpe_encoded` as literals.

    Determinism: word ranking is (count DESC, word ASC) — a total order
    because words are unique; pair selection is (count DESC, pair ASC).
    Two runs over the same corpus produce identical merge lists
    regardless of partitioning or layout.
    """
    return train_bpe_from_counts(
        bpe_word_counts(df, text_col), n_merges, vocab_k, min_pair_count
    )


def bpe_word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """``(w, n)`` word counts — the ADDITIVE sufficient statistics of BPE
    training. One explode + one word-keyed groupBy, map-side combined;
    persist per snapshot (:func:`bpe_update_state`) and the historical
    corpus is never rescanned when the vocabulary is refreshed."""
    return (
        df.select(F.explode(words(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_merge_counts(*counts: DataFrame) -> DataFrame:
    """Fold word-count frames (corpus ∪ batch = sum of counts) — the
    daily-increment shape, same as ``textstats.dsir_merge_counts``."""
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out.groupBy("w").agg(F.sum("n").alias("n"))


def bpe_update_state(
    spark, state_path: str, batch_df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Maintain a PERSISTED word-count frame as the corpus grows — the
    ``foreachBatch``-callable state updater (crash-safe write-then-swap
    via :func:`seqspark.pipeline.state.update_parquet_state`). Retrain
    the vocabulary from state with :func:`train_bpe_from_counts` — no
    corpus rescan, identical merges to training on the full union
    (pytest-pinned). State is distinct-vocabulary-sized, so keep its own
    partitioning (word counts can outgrow a single file at web scale)."""
    from .state import update_parquet_state

    batch = bpe_word_counts(batch_df, text_col)
    return update_parquet_state(
        spark, state_path, batch, bpe_merge_counts, coalesce=None
    )


def train_bpe_from_counts(
    counts: DataFrame,
    n_merges: int = 160,
    vocab_k: int = 4000,
    min_pair_count: int = 2,
) -> List[Tuple[str, str]]:
    """The driver-side merge loop over a ``(w, n)`` counts frame — the
    back half of :func:`train_bpe`, callable on persisted incremental
    state. Only the top ``vocab_k`` rows ever reach the driver.

    The loop is the INCREMENTAL trainer (:func:`_merge_loop_fast`):
    pair counts update by delta on only the words a merge touched, and
    the next best pair pops from a lazy-invalidation heap — per-merge
    cost ∝ touched words, not vocab size. The naive rebuild-all-counts
    loop (O(vocab × merges); measured 94 s for 10k merges at
    vocab_k=4000 and HOURS at a production 50k-word/32k-merge setting,
    BASELINE.md round 11) survives as :func:`_merge_loop_reference`,
    and a hypothesis property pins the two EQUAL on arbitrary counts
    tables — same merges, same order, same tie-breaks."""
    top = counts.orderBy(F.desc("n"), F.asc("w")).limit(vocab_k).collect()
    vocab: dict[Tuple[str, ...], int] = {}
    for row in top:
        syms = tuple(row["w"]) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + row["n"]
    return _merge_loop_fast(vocab, n_merges, min_pair_count)


def _pairs_of(syms: Tuple[str, ...]) -> dict:
    out: dict = {}
    for p in zip(syms, syms[1:]):
        out[p] = out.get(p, 0) + 1
    return out


def _merge_word(syms: Tuple[str, ...], a: str, b: str) -> Tuple[str, ...]:
    """Greedy left-to-right non-overlapping merge of (a, b) — the single
    definition both driver loops and :func:`encode_word` share
    semantically (kept inline there for the property tests' benefit)."""
    merged = a + b
    out: List[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(merged)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def _merge_loop_fast(
    vocab: dict, n_merges: int, min_pair_count: int
) -> List[Tuple[str, str]]:
    """Exact incremental BPE merge loop: maintain ``pair -> count`` and
    ``pair -> {word ids}``, update both by DELTA on only the words that
    contain the merged pair, and select each round's best pair from a
    heap with lazy invalidation (every count change pushes a fresh
    entry; stale ones are skipped when their recorded count no longer
    matches). Heap entries order by (-count, pair) — the identical
    tie-break as the reference loop's ``min(..., key=(-count, pair))``,
    so the output is byte-identical (property-pinned), just O(touched)
    per merge instead of O(vocab)."""
    import heapq

    words_list: List[Tuple[str, ...]] = []
    word_n: List[int] = []
    for syms, n in vocab.items():
        words_list.append(syms)
        word_n.append(n)
    pair_counts: dict = {}
    pair_words: dict = {}
    for wi, syms in enumerate(words_list):
        n = word_n[wi]
        for p, k in _pairs_of(syms).items():
            pair_counts[p] = pair_counts.get(p, 0) + k * n
            pair_words.setdefault(p, set()).add(wi)
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: List[Tuple[str, str]] = []
    while len(merges) < n_merges and heap:
        negc, pair = heapq.heappop(heap)
        cur = pair_counts.get(pair, 0)
        if cur != -negc or cur == 0:
            continue  # stale entry; the live one is still queued
        if cur < min_pair_count:
            break
        a, b = pair
        merges.append(pair)
        touched = pair_words.pop(pair, set())
        for wi in touched:
            old = words_list[wi]
            new = _merge_word(old, a, b)
            words_list[wi] = new
            n = word_n[wi]
            op, np_ = _pairs_of(old), _pairs_of(new)
            for p in op.keys() | np_.keys():
                delta = (np_.get(p, 0) - op.get(p, 0)) * n
                if delta:
                    c = pair_counts.get(p, 0) + delta
                    if c > 0:
                        pair_counts[p] = c
                        heapq.heappush(heap, (-c, p))
                    else:
                        pair_counts.pop(p, None)
                if p in np_ and p not in op:
                    pair_words.setdefault(p, set()).add(wi)
                elif p in op and p not in np_:
                    s = pair_words.get(p)
                    if s is not None:
                        s.discard(wi)
        pair_counts.pop(pair, None)
    return merges


def _merge_loop_reference(
    vocab: dict, n_merges: int, min_pair_count: int
) -> List[Tuple[str, str]]:
    """The naive recount-everything merge loop — O(vocab × merges), kept
    ONLY as the parity oracle for :func:`_merge_loop_fast`."""
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[Tuple[str, str], int] = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), count = best
        if count < min_pair_count:
            break
        merges.append((a, b))
        merged = a + b
        new_vocab: dict[Tuple[str, ...], int] = {}
        for syms, n in vocab.items():
            out: List[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + n
        vocab = new_vocab
    return merges


def encode_word(word: str, merges: Sequence[Tuple[str, str]]) -> List[str]:
    """Reference (driver-side) greedy encoder: apply merges in rank
    order, each pass merging left-to-right. The Catalyst replace-chain
    in :func:`bpe_tokens` is pinned against this by property test."""
    syms: List[str] = list(word) + [EOW]
    for a, b in merges:
        merged = a + b
        out: List[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return [s.replace(EOW, EOW_DISPLAY) for s in syms]


def merge_ranks(
    merges: Sequence[Tuple[str, str]],
) -> Dict[Tuple[str, str], List[int]]:
    """Pair -> SORTED list of every index where it appears in the merge
    list. A plain ``{pair: index}`` map silently drops all but one index
    of a duplicated pair and diverges from :func:`encode_word` (which
    applies a pair at its FIRST listed rank); keeping every index keeps
    :func:`encode_word_ranked` exact for arbitrary merge lists."""
    ranks: Dict[Tuple[str, str], List[int]] = {}
    for i, pair in enumerate(merges):
        ranks.setdefault(pair, []).append(i)
    return ranks


def encode_word_ranked(
    word: str,
    merges: Sequence[Tuple[str, str]],
    ranks: Dict[Tuple[str, str], List[int]] = None,
) -> List[str]:
    """Rank-map greedy encoder — EXACTLY :func:`encode_word`'s output
    (property-pinned), in O(len² ) dict lookups per word, independent of
    the merge-list size. :func:`encode_word` scans ALL merges per word
    (32k-merge vocab → 32k passes per word); this walks a forward rank
    pointer instead: repeatedly apply the lowest-ranked merge ≥ the last
    applied rank that is PRESENT in the word. The forward pointer (not a
    plain global min) is what makes it exact for arbitrary merge lists —
    a pathological list can order a merge BEFORE the merge that creates
    its input symbol, and encode_word (one forward pass) never revisits
    it. Duplicate pairs in the merge list are exact too: the rank map
    keeps EVERY index of a pair (:func:`merge_ranks`) and bisect picks
    the lowest one ≥ the forward pointer, matching encode_word's
    first-listed-occurrence behavior. Pass a precomputed ``ranks``
    (from :func:`merge_ranks`) when encoding many words against one
    vocabulary."""
    if ranks is None:
        ranks = merge_ranks(merges)
    syms: List[str] = list(word) + [EOW]
    prev = 0
    while len(syms) > 1:
        best = None
        for pair in zip(syms, syms[1:]):
            idxs = ranks.get(pair)
            if not idxs:
                continue
            j = bisect_left(idxs, prev)
            if j < len(idxs):
                r = idxs[j]
                if best is None or r < best:
                    best = r
        if best is None:
            break
        a, b = merges[best]
        merged = a + b
        out: List[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
        prev = best + 1
    return [s.replace(EOW, EOW_DISPLAY) for s in syms]


def _encode_symbols(word: Column, merges: Sequence[Tuple[str, str]]) -> Column:
    """Wrapped-symbol string for one word after the full merge chain."""
    # "low" -> "\x1fl\x1e\x1fo\x1e\x1fw\x1e\x1f\x17\x1e"
    s = F.regexp_replace(
        F.concat(word, F.lit(EOW)), "(.)", SEP_L + "$1" + SEP_R
    )
    for a, b in merges:
        s = F.replace(
            s,
            F.lit(SEP_L + a + SEP_R + SEP_L + b + SEP_R),
            F.lit(SEP_L + a + b + SEP_R),
        )
    return s


def bpe_tokens(text: Column, merges: Sequence[Tuple[str, str]]) -> Column:
    """``array<string>`` of BPE tokens for a document, words in order.

    Pure Catalyst: tokenize -> per-word replace-chain -> unwrap + split.
    No shuffle, no UDF; the merge list is frozen into the plan as
    literals (the quality-classifier deployment shape). End-of-word
    markers render as ``</w>``.
    """
    return F.flatten(
        F.transform(words(text), lambda w: bpe_word_tokens_col(w, merges))
    )


def bpe_encoded(
    df: DataFrame,
    merges: Sequence[Tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode a corpus: (id, bpe_text, n_bpe_tokens) — tokens joined by
    a single space for engine-portable hashing, plus the count the
    token-budget accounting consumes. Narrow projection; scales as a
    map-only stage."""
    toks = bpe_tokens(F.col(text_col), merges)
    return df.select(
        F.col(id_col),
        F.array_join(toks, " ").alias("bpe_text"),
        F.size(toks).cast("long").alias("n_bpe_tokens"),
    )


def bpe_word_tokens_col(word: Column, merges: Sequence[Tuple[str, str]]) -> Column:
    """``array<string>`` of BPE tokens for ONE word column (the per-word
    kernel :func:`bpe_tokens` maps over a document's words)."""
    return F.transform(
        F.filter(
            F.split(F.replace(_encode_symbols(word, merges), F.lit(SEP_L)), SEP_R),
            lambda t: F.length(t) > 0,
        ),
        lambda t: F.replace(t, F.lit(EOW), F.lit(EOW_DISPLAY)),
    )


def bpe_word_dict(
    words_df: DataFrame,
    merges: Sequence[Tuple[str, str]],
    word_col: str = "w",
    mode: str = "chain",
    max_driver_vocab: int = 2_000_000,
) -> DataFrame:
    """``(w, toks array<string>)`` encoding dictionary over a DISTINCT-word
    frame — each word encoded ONCE, however many times it occurs in the
    corpus.

    ``mode="chain"``: the Catalyst replace-chain runs over the word frame
    (distributed, no driver traffic) — right whenever the chain itself is
    viable. MEASURED envelope (tools/bench_bpe_encode.py, BASELINE.md):
    the chain analyzes fine at 160 merges and dies with a driver
    ``StackOverflowError`` at 320 — Catalyst's Column-tree conversion
    recurses per nesting level, so the depth budget, not codegen, is the
    binding constraint.

    ``mode="driver"``: the bounded distinct-word set is collected and
    encoded with :func:`encode_word_ranked` (rank-map greedy — cost
    independent of BOTH plan depth and merge-list size), then returned
    as a LocalRelation — the production path for real vocabularies
    (32k merges: measured flat ~1 s over the fixture vocab). Raises if
    the vocabulary exceeds ``max_driver_vocab`` (at that point shard the
    word frame and encode per shard, or raise the bound consciously)."""
    if mode == "chain":
        return words_df.select(
            F.col(word_col).alias("w"),
            bpe_word_tokens_col(F.col(word_col), merges).alias("toks"),
        )
    if mode != "driver":
        raise ValueError(f"mode must be chain|driver, got {mode!r}")
    rows = words_df.select(F.col(word_col).alias("w")).limit(
        max_driver_vocab + 1
    ).collect()
    if len(rows) > max_driver_vocab:
        raise ValueError(
            f"distinct vocabulary exceeds max_driver_vocab={max_driver_vocab}; "
            "encode the dictionary with mode='chain' or raise the bound"
        )
    spark = words_df.sparkSession
    ranks = merge_ranks(merges)
    return spark.createDataFrame(
        [(r["w"], encode_word_ranked(r["w"], merges, ranks)) for r in rows],
        "w string, toks array<string>",
    )


def bpe_encoded_via_dict(
    df: DataFrame,
    merges: Sequence[Tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
    dict_mode: str = "chain",
    broadcast_dict: bool = True,
) -> DataFrame:
    """Scalable corpus encode: encode each DISTINCT word once, then join
    the dictionary back onto the positionally-exploded corpus and
    reassemble per-document token streams in word order. Same output as
    :func:`bpe_encoded` (pinned by parity test).

    Why this exists: :func:`bpe_encoded`'s replace-chain is linear in
    ``n_merges`` PER WORD OCCURRENCE — at a production 32k-merge
    vocabulary that is a 32k-deep expression tree evaluated per token
    (codegen/constant-pool risk, and re-paying the chain for every
    repetition of "the"). Here the chain (or the driver encoder, see
    :func:`bpe_word_dict`) runs once per distinct word — Zipf makes the
    distinct set orders of magnitude smaller than the token stream — and
    the corpus pass is one posexplode + one dictionary join + one id-keyed
    reassembly shuffle. ``broadcast_dict=True`` (default) hints the
    dictionary side: a word dictionary (even 10M rows of short strings)
    is broadcast-sized next to a 100 TB corpus; pass False to let AQE
    decide when the dictionary is itself huge."""
    wcol = words(F.col(text_col))
    # per-doc array_distinct first (codegen) — shrinks the distinct
    # shuffle by the in-doc repetition factor, result-identical (r15)
    distinct_words = df.select(
        F.explode(F.array_distinct(wcol)).alias("w")).distinct()
    wd = bpe_word_dict(distinct_words, merges, "w", mode=dict_mode)
    if broadcast_dict:
        wd = F.broadcast(wd)
    return encoded_via_word_dict(
        df, wd, id_col, text_col, "bpe_text", "n_bpe_tokens"
    )


def encoded_via_word_dict(
    df: DataFrame,
    wd: DataFrame,
    id_col: str,
    text_col: str,
    text_out: str,
    count_out: str,
) -> DataFrame:
    """Shared dictionary-join reassembly (r12b: also the unigram
    tokenizer's corpus pass): join a ``(w, toks)`` dictionary onto the
    positionally-exploded corpus and rebuild per-document token streams
    in word order.

    posexplode_OUTER keeps zero-word documents as a (null pos, null w)
    row, so the id-keyed aggregation below covers the whole corpus and
    no second corpus-sized re-attach join is needed (one shuffle total);
    the left dictionary join leaves those rows with null toks, filtered
    out of the flatten. __has carries text-NULLness through the agg so
    NULL-text docs yield (NULL, NULL) exactly like the chain path
    (whose words(NULL) propagates NULL) — pinned by the parity test."""
    wcol = words(F.col(text_col))
    ex = df.select(
        F.col(id_col),
        F.col(text_col).isNotNull().alias("__has"),
        F.posexplode_outer(wcol).alias("pos", "w"),
    )
    return (
        ex.join(wd, "w", "left")
        .groupBy(id_col)
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
                text_out
            ),
            F.when(F.col("__has"), F.size("__toks"))
            .cast("long")
            .alias(count_out),
        )
    )


def bpe_oracle_chain_sql(merges: Sequence[Tuple[str, str]], word_expr: str) -> str:
    """The DuckDB expression mirroring :func:`_encode_symbols` +
    unwrap/split for one word — generated from the same frozen merge
    list so the oracle runs the IDENTICAL chain. ``word_expr`` is the
    SQL expression holding the word (e.g. a lambda variable)."""

    def lit(s: str) -> str:
        # control chars via chr() so the SQL stays printable
        parts = []
        buf = ""
        for ch in s:
            if ord(ch) < 32:
                if buf:
                    parts.append("'" + buf.replace("'", "''") + "'")
                    buf = ""
                parts.append(f"chr({ord(ch)})")
            else:
                buf += ch
        if buf:
            parts.append("'" + buf.replace("'", "''") + "'")
        return " || ".join(parts) if parts else "''"

    s = (
        f"regexp_replace({word_expr} || chr({ord(EOW)}), '(.)', "
        f"chr({ord(SEP_L)}) || '\\1' || chr({ord(SEP_R)}), 'g')"
    )
    for a, b in merges:
        s = (
            f"replace({s}, {lit(SEP_L + a + SEP_R + SEP_L + b + SEP_R)}, "
            f"{lit(SEP_L + a + b + SEP_R)})"
        )
    unwrapped = (
        f"list_filter(string_split(replace({s}, chr({ord(SEP_L)}), ''), "
        f"chr({ord(SEP_R)})), t -> len(t) > 0)"
    )
    return unwrapped
