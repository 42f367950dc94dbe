"""Unigram-LM tokenizer (seqspark/pipeline/unigram.py, r12b): trainer
determinism, EM likelihood ascent, Viterbi segmentation properties, and
the corpus-encode parity with a pure-driver recomputation."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from seqspark.pipeline import unigram


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quicker brown foxes are jumping over lazy dogs"),
            (3, "internationalization and internationalisation differ"),
            (4, "Fox DOG the the the quick brown"),
            (5, None),
            (6, ""),
            (7, "unknowable zebra-like QUIRKS!!! 42"),
        ],
        "doc_id long, text string",
    )


def test_trainer_deterministic(spark):
    docs = _docs(spark)
    a = unigram.train_unigram(docs, vocab_size=50, seed_size=200, em_iters=2)
    b = unigram.train_unigram(
        docs.repartition(7), vocab_size=50, seed_size=200, em_iters=2)
    assert a == b
    # sorted (logp desc, piece asc); probabilities normalized-ish
    assert a == sorted(a, key=lambda kv: (-kv[1], kv[0]))
    assert abs(sum(math.exp(lp) for _p, lp in a) - 1.0) < 0.01


def test_em_increases_likelihood(spark):
    # corpus log-likelihood under the final model must beat the seed
    # init (EM ascent; pruning only drops near-zero-mass pieces)
    from seqspark.pipeline.bpe import bpe_word_counts

    docs = _docs(spark)
    counts = bpe_word_counts(docs)
    rows = counts.collect()
    words_n = [(r["w"], int(r["n"])) for r in rows]

    def ll(logp):
        total = 0.0
        for w, n in words_n:
            seg = unigram.viterbi_segment(w, logp)
            total += n * sum(logp.get(p, min(logp.values()) - 10.0)
                             for p in seg)
        return total

    pieces = unigram.train_unigram(docs, vocab_size=60, seed_size=300,
                                   em_iters=3)
    final = dict(pieces)
    # char-only baseline: uniform over the alphabet
    chars = {c for w, _n in words_n for c in w}
    base = {c: math.log(1.0 / len(chars)) for c in chars}
    assert ll(final) > ll(base)


def test_viterbi_properties():
    logp = {"ab": -1.0, "a": -2.0, "b": -2.5, "abc": -1.2, "c": -3.0}
    # max-likelihood: 'abc' (one piece, -1.2) beats 'ab'+'c' (-4.0)
    assert unigram.viterbi_segment("abc", logp) == ["abc"]
    # concatenation invariant + unknown-char fallback
    seg = unigram.viterbi_segment("abzab", logp)
    assert "".join(seg) == "abzab"
    assert "z" in seg  # unknown char segments as itself
    # deterministic tie-break: equal scores prefer the longer last piece
    tie = {"xy": -2.0, "x": -1.0, "y": -1.0}
    assert unigram.viterbi_segment("xy", tie) == ["xy"]


@settings(max_examples=80, deadline=None)
@given(st.text(alphabet="abcdefgz01_é中", min_size=1, max_size=24))
def test_viterbi_concat_roundtrip_fuzz(word):
    logp = {"ab": -1.0, "a": -2.0, "b": -2.5, "cd": -1.5, "c": -2.2,
            "d": -2.9, "e": -2.0, "f": -2.4, "g": -2.6, "0": -3.0,
            "1": -3.0, "_": -3.1, "é": -3.2}
    seg = unigram.viterbi_segment(word, logp)
    assert "".join(seg) == word
    assert all(seg)  # no empty pieces


def test_encoded_matches_driver_recomputation(spark):
    docs = _docs(spark)
    pieces = unigram.train_unigram(docs, vocab_size=60, seed_size=300,
                                   em_iters=2)
    logp = dict(pieces)
    out = {r["doc_id"]: r for r in
           unigram.unigram_encoded(docs, pieces).collect()}
    import re

    for row in docs.collect():
        did, text = row["doc_id"], row["text"]
        if text is None:
            assert out[did]["unigram_text"] is None
            assert out[did]["n_unigram_tokens"] is None
            continue
        words = [w for w in re.split(r"[^\w]+", text.lower()) if w]
        toks = [t for w in words for t in unigram.viterbi_segment(w, logp)]
        assert out[did]["unigram_text"] == " ".join(toks)
        assert out[did]["n_unigram_tokens"] == len(toks)


def test_encoded_plan_is_one_shuffle(spark):
    docs = _docs(spark)
    pieces = unigram.train_unigram(docs, vocab_size=40, seed_size=150,
                                   em_iters=1)
    plan = unigram.unigram_encoded(docs, pieces)._jdf.queryExecution(
    ).executedPlan().toString()
    # dictionary side broadcast; corpus side shuffles once for the
    # id-keyed reassembly
    assert "BroadcastHashJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 2


def test_train_from_counts_additivity(spark):
    # counts are the sufficient statistic: training from the corpus and
    # from its (pre-aggregated) word counts is identical
    from seqspark.pipeline.bpe import bpe_word_counts

    docs = _docs(spark)
    a = unigram.train_unigram(docs, vocab_size=50, seed_size=200,
                              em_iters=2)
    b = unigram.train_unigram_from_counts(
        bpe_word_counts(docs), vocab_size=50, seed_size=200, em_iters=2)
    assert a == b


class TestSubwordRegularization:
    def test_sampling_diversity_and_concat(self):
        logp = {"ab": -1.0, "a": -2.0, "b": -2.5, "abc": -1.2, "c": -3.0,
                "bc": -1.4}
        segs = unigram.sample_segmentations("abcabc", logp, k=12, seed=3,
                                            alpha=0.0)
        assert all("".join(s) == "abcabc" for s in segs)
        assert len({tuple(s) for s in segs}) >= 3  # uniform alpha=0 varies

    def test_alpha_limits(self):
        logp = {"ab": -1.0, "a": -2.0, "b": -2.5, "abc": -1.2, "c": -3.0}
        vit = unigram.viterbi_segment("abcabc", logp)
        segs = unigram.sample_segmentations("abcabc", logp, k=8, seed=3,
                                            alpha=50.0)
        assert all(s == vit for s in segs)  # high alpha -> Viterbi

    def test_sampling_deterministic(self):
        logp = {"ab": -1.0, "a": -2.0, "b": -2.5}
        a = unigram.sample_segmentations("ababab", logp, k=6, seed=11,
                                         alpha=0.1)
        b = unigram.sample_segmentations("ababab", logp, k=6, seed=11,
                                         alpha=0.1)
        assert a == b
        c = unigram.sample_segmentations("ababab", logp, k=6, seed=12,
                                         alpha=0.1)
        assert a != c  # seed feeds the RNG

    def test_encoded_sampled_matches_driver_pick(self, spark):
        import hashlib
        import re

        docs = _docs(spark)
        pieces = unigram.train_unigram(docs, vocab_size=60, seed_size=300,
                                       em_iters=2)
        logp = dict(pieces)
        out = {r["doc_id"]: r for r in unigram.unigram_encoded_sampled(
            docs, pieces, k=4, seed=7, alpha=0.2).collect()}
        for row in docs.collect():
            did, text = row["doc_id"], row["text"]
            if text is None:
                assert out[did]["unigram_text"] is None
                continue
            ws = [w for w in re.split(r"[^\w]+", text.lower()) if w]
            toks = []
            for pos, w in enumerate(ws):
                vs = unigram.sample_segmentations(w, logp, k=4, seed=7,
                                                  alpha=0.2)
                h = int(hashlib.md5(f"{did}:{pos}:7".encode()).hexdigest()[:4],
                        16)
                toks.extend(vs[h % 4])
            assert out[did]["unigram_text"] == " ".join(toks), did

    def test_occurrences_vary_within_document(self, spark):
        # alpha=0 on an ambiguous word: repeated occurrences should pick
        # different variants via the positional hash
        docs = spark.createDataFrame(
            [(1, " ".join(["abab"] * 12))], "doc_id long, text string")
        pieces = [("ab", -1.0), ("a", -1.1), ("b", -1.2), ("abab", -1.3)]
        out = unigram.unigram_encoded_sampled(
            docs, pieces, k=6, seed=3, alpha=0.0).collect()[0]
        # reconstructible and non-constant across occurrences
        txt = out["unigram_text"]
        assert txt.replace(" ", "") == "abab" * 12
        per_word = txt.split(" ")
        assert out["n_unigram_tokens"] == len(per_word)


def test_incremental_counts_feed_unigram(spark, tmp_path):
    # the SAME persisted word-count state BPE maintains retrains the
    # unigram vocabulary without a corpus rescan: training from the
    # incrementally-updated state equals training on the full union
    from seqspark.pipeline.bpe import bpe_update_state

    docs = _docs(spark)
    b1 = docs.filter(F.col("doc_id") <= 3)
    b2 = docs.filter(F.col("doc_id") > 3)
    path = str(tmp_path / "wc_state")
    bpe_update_state(spark, path, b1)
    state = bpe_update_state(spark, path, b2)
    inc = unigram.train_unigram_from_counts(
        state, vocab_size=50, seed_size=200, em_iters=2)
    full = unigram.train_unigram(docs, vocab_size=50, seed_size=200,
                                 em_iters=2)
    assert inc == full
