"""BPE subword tokenizer: training determinism, Catalyst/Python encode
parity (the replace-chain delimiter trick), and oracle-chain edge cases
— identical pairs, adjacent occurrences, symbol-boundary false matches."""

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from seqspark.pipeline.bpe import (
    EOW,
    EOW_DISPLAY,
    bpe_encoded,
    bpe_tokens,
    encode_word,
    train_bpe,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )


def test_train_tiny_corpus_exact_merges(spark):
    # "aaab" x3 + "aab" x2: chars a,b + EOW. Pair counts round 1:
    # (a,a): 3*2 + 2*1 = 8; (a,b): 5; (b,EOW): 5 -> merge (a,a).
    # round 2: aa,a,b / aa,b vocab -> (aa,a):3, (a,b):3, (aa,b):2,
    # (b,EOW):5 -> (b,EOW) wins. round 3: counts tie at 3,3 ->
    # lexicographic pair order breaks the tie deterministically.
    df = _df(spark, ["aaab aaab aaab aab aab"])
    merges = train_bpe(df, n_merges=3, vocab_k=10)
    assert merges[0] == ("a", "a")
    assert merges[1] == ("b", EOW)
    assert merges[2] == ("a", "b" + EOW)  # ('a','b\x17') < ('aa','a')


def test_train_deterministic_under_repartition(spark):
    texts = [f"alpha beta gamma delta w{i} w{i % 7}" for i in range(60)]
    df = _df(spark, texts)
    m1 = train_bpe(df, n_merges=20, vocab_k=50)
    m2 = train_bpe(df.repartition(13), n_merges=20, vocab_k=50)
    assert m1 == m2


def test_encode_identical_pair_greedy_left_to_right(spark):
    # merge (a,a) on "aaa": greedy LTR -> [aa, a], never [a, aa]
    merges = [("a", "a")]
    assert encode_word("aaa", merges) == ["aa", "a", EOW_DISPLAY]
    row = (
        _df(spark, ["aaa"])
        .select(bpe_tokens(F.col("text"), merges).alias("t"))
        .head()
    )
    assert list(row["t"]) == ["aa", "a", EOW_DISPLAY]


def test_encode_adjacent_occurrences_no_shared_boundary_miss(spark):
    # merge (a,b) on "abab": both occurrences must merge in one pass —
    # the failure mode of space-delimited replace patterns.
    merges = [("a", "b")]
    assert encode_word("abab", merges) == ["ab", "ab", EOW_DISPLAY]
    row = (
        _df(spark, ["abab"])
        .select(bpe_tokens(F.col("text"), merges).alias("t"))
        .head()
    )
    assert list(row["t"]) == ["ab", "ab", EOW_DISPLAY]


def test_encode_no_cross_symbol_false_match(spark):
    # after merging (b,a) the sequence [ba, b] must NOT match a
    # pattern for (a,b) even though "a b" appears in a naive
    # space-delimited rendering of "ba b".
    merges = [("b", "a"), ("a", "b")]
    # "bab": (b,a) -> [ba, b, EOW]; (a,b) must not fire.
    assert encode_word("bab", merges) == ["ba", "b", EOW_DISPLAY]
    row = (
        _df(spark, ["bab"])
        .select(bpe_tokens(F.col("text"), merges).alias("t"))
        .head()
    )
    assert list(row["t"]) == ["ba", "b", EOW_DISPLAY]


def test_encode_no_prefix_false_match(spark):
    # pattern for (a,b) must not match symbol "bc" just because it
    # STARTS with b: "abc" with merges [(b,c),(a,b)] -> after (b,c):
    # [a, bc]; (a,b) must not merge a with the prefix of "bc".
    merges = [("b", "c"), ("a", "b")]
    assert encode_word("abc", merges) == ["a", "bc", EOW_DISPLAY]
    row = (
        _df(spark, ["abc"])
        .select(bpe_tokens(F.col("text"), merges).alias("t"))
        .head()
    )
    assert list(row["t"]) == ["a", "bc", EOW_DISPLAY]


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdeé0_", min_size=1, max_size=12),
        min_size=1,
        max_size=6,
    )
)
def test_encode_catalyst_matches_python(spark, words_list):
    text = " ".join(words_list)
    df = _df(spark, [text])
    merges = train_bpe(df, n_merges=12, vocab_k=30, min_pair_count=1)
    expect = []
    for w in words_list:
        expect.extend(encode_word(w.lower(), merges))
    got = df.select(bpe_tokens(F.col("text"), merges).alias("t")).head()["t"]
    assert list(got) == expect


def test_bpe_encoded_shape_and_budget(spark, documents):
    merges = train_bpe(documents, n_merges=40, vocab_k=500)
    out = bpe_encoded(documents, merges)
    assert out.columns == ["doc_id", "bpe_text", "n_bpe_tokens"]
    row = out.filter(F.col("n_bpe_tokens") > 0).head()
    assert row["bpe_text"].count(" ") + 1 == row["n_bpe_tokens"]
    # encoding is a narrow map: no exchange in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcdeé0_", min_size=1, max_size=12),
        min_size=1,
        max_size=5,
    )
)
def test_oracle_chain_matches_python_encoder(words_list):
    # CI guard for bpe_oracle_chain_sql: DuckDB running the generated
    # replace-chain must reproduce encode_word exactly (this is the chain
    # the bpe_encode contract entry's oracle runs)
    import duckdb

    from seqspark.pipeline.bpe import bpe_oracle_chain_sql

    corpus_words = [w.lower() for w in words_list]
    # train driver-side on the same words (no spark needed: train only
    # shapes the merge list; the subject under test is the SQL chain)
    merges = []
    vocab = {}
    for w in corpus_words:
        key = tuple(w) + (EOW,)
        vocab[key] = vocab.get(key, 0) + 1
    for _ in range(12):
        pairs = {}
        for syms, n in vocab.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        (a, b), _n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        new_vocab = {}
        for syms, n in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + n
        vocab = new_vocab

    chain = bpe_oracle_chain_sql(merges, "w")
    con = duckdb.connect()
    for w in corpus_words:
        got = con.execute(
            f"SELECT {chain} FROM (SELECT ? AS w)", [w]
        ).fetchone()[0]
        assert [t.replace(EOW, EOW_DISPLAY) for t in got] == encode_word(
            w, merges
        ), f"word={w!r} merges={merges!r}"


def test_bpe_encode_contract_entry_matches_oracle(spark, duck):
    # end-to-end pin of the __spark_entry__ wiring: the bpe_encode entry
    # and its oracle_sql twin agree row-for-row at sf0.001
    import __spark_entry__ as em

    sdf = em.queries()["bpe_encode"](spark, "/root/testdata/sf0.001")
    spark_rows = sorted(
        (r["doc_id"], r["bpe_text"], r["n_bpe_tokens"]) for r in sdf.collect()
    )
    duck_rows = sorted(
        duck.execute(
            em.oracle_sql()["bpe_encode"]
        ).fetchall()
    )
    assert spark_rows == duck_rows
    assert len(spark_rows) > 0 and any(n > 0 for _, _, n in spark_rows)


def test_encode_plan_stays_jvm_side(spark):
    # no Python eval nodes: the chain is Catalyst expressions only
    df = _df(spark, ["hello world"])
    out = df.select(bpe_tokens(F.col("text"), [("l", "l"), ("h", "e")]).alias("t"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "Arrow" not in plan


@pytest.mark.parametrize("dict_mode", ["chain", "driver"])
def test_encoded_via_dict_matches_chain(spark, documents, dict_mode):
    # the scalable dictionary encode (distinct words -> encode once ->
    # join back -> positional reassembly) must reproduce the per-token
    # replace-chain exactly, empty-word docs included
    from seqspark.pipeline.bpe import bpe_encoded_via_dict

    merges = train_bpe(documents, n_merges=40, vocab_k=500)
    base = {
        r["doc_id"]: (r["bpe_text"], r["n_bpe_tokens"])
        for r in bpe_encoded(documents, merges).collect()
    }
    got = {
        r["doc_id"]: (r["bpe_text"], r["n_bpe_tokens"])
        for r in bpe_encoded_via_dict(
            documents, merges, dict_mode=dict_mode
        ).collect()
    }
    assert got == base


def test_encoded_via_dict_zero_word_doc(spark):
    from seqspark.pipeline.bpe import bpe_encoded_via_dict

    df = _df(spark, ["hello world", "", "...!!!"])
    merges = [("l", "l"), ("o", EOW)]
    rows = {r["doc_id"]: r for r in bpe_encoded_via_dict(df, merges).collect()}
    assert rows[1]["bpe_text"] == "" and rows[1]["n_bpe_tokens"] == 0
    assert rows[2]["bpe_text"] == "" and rows[2]["n_bpe_tokens"] == 0
    assert rows[0]["n_bpe_tokens"] > 0


@settings(max_examples=40, deadline=None)
@given(
    st.text(alphabet="abcde", min_size=0, max_size=14),
    st.lists(
        st.tuples(
            st.text(alphabet="abcde", min_size=1, max_size=3),
            st.text(alphabet="abcde", min_size=1, max_size=3),
        ),
        min_size=0,
        max_size=24,
    ),
)
def test_encode_word_ranked_exact_parity(word, merges):
    # the rank-map encoder must equal the scan-all-merges reference on
    # ARBITRARY merge lists — including pathological ones that order a
    # merge before the merge creating its input symbol (the forward
    # pointer is what keeps those exact)
    from seqspark.pipeline.bpe import encode_word_ranked

    assert encode_word_ranked(word, merges) == encode_word(word, merges)


def test_encode_word_ranked_pathological_order():
    # (x, ab) ranked BEFORE (a, b): a naive global-min-rank encoder would
    # merge x+ab after (a,b) fires; encode_word's forward pass does not
    from seqspark.pipeline.bpe import encode_word_ranked

    merges = [("x", "a" + "b"), ("a", "b")]
    assert encode_word("xab", merges) == encode_word_ranked("xab", merges) == [
        "x", "ab", EOW_DISPLAY
    ]


def test_encode_word_ranked_duplicate_pairs():
    # a DUPLICATED pair must apply at its FIRST listed rank, exactly like
    # encode_word's forward pass — a {pair: last_index} rank map diverged
    # here (r10 advisor repro): ('a','b') at rank 2 shadowed rank 0, so
    # ('b','c') fired first and 'abc' came out ['a','bc'] not ['ab','c']
    from seqspark.pipeline.bpe import encode_word_ranked, merge_ranks

    merges = [("a", "b"), ("b", "c"), ("a", "b")]
    expected = ["ab", "c", EOW_DISPLAY]
    assert encode_word("abc", merges) == expected
    assert encode_word_ranked("abc", merges) == expected
    # precomputed-ranks path (what bpe_word_dict mode='driver' uses)
    assert encode_word_ranked("abc", merges, merge_ranks(merges)) == expected


def test_word_dict_driver_mode_bound(spark):
    from seqspark.pipeline.bpe import bpe_word_dict

    df = _df(spark, ["a b c d e f"])
    wdf = df.select(F.explode(F.split(F.col("text"), " ")).alias("w")).distinct()
    with pytest.raises(ValueError, match="max_driver_vocab"):
        bpe_word_dict(wdf, [("a", "b")], mode="driver", max_driver_vocab=3)


def test_incremental_state_equals_full_retrain(spark, tmp_path):
    # fold A then B into persisted word-count state; training from state
    # must equal training on A ∪ B directly (additive sufficient stats)
    from seqspark.pipeline.bpe import (
        bpe_update_state,
        train_bpe_from_counts,
    )

    a = _df(spark, ["low lower lowest", "new newer newest"] * 3)
    b = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(["wide wider widest", "low new"] * 2)],
        "doc_id int, text string",
    )
    state = str(tmp_path / "bpe_state")
    bpe_update_state(spark, state, a)
    counts = bpe_update_state(spark, state, b)
    merges_inc = train_bpe_from_counts(counts, n_merges=20, vocab_k=50)
    merges_full = train_bpe(a.unionByName(b), n_merges=20, vocab_k=50)
    assert merges_inc == merges_full
    # the persisted state is readable cold (crash-safe swap discipline)
    cold = spark.read.parquet(state)
    assert train_bpe_from_counts(cold, n_merges=20, vocab_k=50) == merges_full


def test_incremental_state_idempotent_readback(spark, tmp_path):
    from seqspark.pipeline.bpe import bpe_update_state, bpe_word_counts

    docs = _df(spark, ["alpha beta alpha", "beta gamma"])
    state = str(tmp_path / "s")
    out = bpe_update_state(spark, state, docs)
    direct = {
        (r["w"], r["n"]) for r in bpe_word_counts(docs).collect()
    }
    assert {(r["w"], r["n"]) for r in out.collect()} == direct


def test_bpe_state_under_real_foreachbatch(spark, tmp_path):
    # the docstring's "foreachBatch-callable" claim pinned: word-count
    # state maintained as text files stream in; retraining from the final
    # state equals a batch train over everything that arrived
    import json as _json

    from seqspark.pipeline.bpe import (
        bpe_update_state,
        train_bpe_from_counts,
    )

    indir = tmp_path / "in"
    indir.mkdir()
    state = str(tmp_path / "wc_state")
    batches = [["low lower", "lowest low"], ["newest newer new"]]
    for i, lines in enumerate(batches):
        (indir / f"b{i}.txt").write_text(
            "\n".join(_json.dumps({"text": t}) for t in lines))

    stream = (spark.readStream.format("text")
              .schema("value string").load(str(indir)))

    def fold(batch_df, _batch_id):
        docs = batch_df.select(
            F.get_json_object("value", "$.text").alias("text"))
        bpe_update_state(spark, state, docs)

    q = (stream.writeStream.foreachBatch(fold)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    all_docs = spark.createDataFrame(
        [(i, t) for i, lines in enumerate(batches) for t in lines],
        "doc_id int, text string")
    got = train_bpe_from_counts(
        spark.read.parquet(state), n_merges=16, vocab_k=50)
    assert got == train_bpe(all_docs, n_merges=16, vocab_k=50)


def test_state_swap_crash_window_recovers_history(spark, tmp_path):
    # simulate the two crash windows of the write-then-swap: (a) live
    # renamed aside with the COMPLETE new state still in _tmp-, (b) live
    # renamed aside with no tmp. Both must recover the history instead of
    # treating the next batch as the entire state.
    import os
    import shutil

    from seqspark.pipeline.bpe import bpe_update_state, bpe_word_counts

    state = str(tmp_path / "s")
    a = _df(spark, ["alpha beta", "alpha"])
    b = spark.createDataFrame([(10, "gamma")], "doc_id int, text string")
    c = spark.createDataFrame([(11, "delta")], "doc_id int, text string")
    bpe_update_state(spark, state, a)
    parent, name = os.path.dirname(state), os.path.basename(state)
    tmp, old = os.path.join(parent, "_tmp-" + name), os.path.join(
        parent, "_old-" + name
    )
    # window (a): between rename(live, old) and rename(tmp, live)
    shutil.copytree(state, tmp)
    os.rename(state, old)
    out = {(r.w, r.n) for r in bpe_update_state(spark, state, b).collect()}
    want = {
        (r.w, r.n)
        for r in bpe_word_counts(a.unionByName(b)).collect()
    }
    assert out == want, "tmp-phase crash lost history"
    # window (b): live moved aside, no tmp survived
    os.rename(state, old)
    out = {(r.w, r.n) for r in bpe_update_state(spark, state, c).collect()}
    want = {
        (r.w, r.n)
        for r in bpe_word_counts(
            a.unionByName(b).unionByName(c)
        ).collect()
    }
    assert out == want, "old-phase crash lost history"


def test_encoded_via_dict_null_text_parity(spark):
    # NULL text must round-trip as (NULL, NULL) in BOTH encode paths —
    # the chain propagates words(NULL); the dict path must not turn it
    # into ("", 0), which would diverge the shared oracle on real corpora
    from seqspark.pipeline.bpe import bpe_encoded_via_dict

    df = spark.createDataFrame(
        [(0, "hello"), (1, None), (2, "")], "doc_id int, text string"
    )
    merges = [("l", "l")]
    chain = {r["doc_id"]: (r["bpe_text"], r["n_bpe_tokens"])
             for r in bpe_encoded(df, merges).collect()}
    for mode in ("chain", "driver"):
        got = {r["doc_id"]: (r["bpe_text"], r["n_bpe_tokens"])
               for r in bpe_encoded_via_dict(df, merges, dict_mode=mode).collect()}
        assert got == chain, (mode, got, chain)
    assert chain[1] == (None, None)
    assert chain[2] == ("", 0)


@settings(max_examples=120, deadline=None)
@given(
    st.dictionaries(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        st.integers(min_value=1, max_value=50),
        min_size=0,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=1, max_value=3),
)
def test_fast_merge_loop_equals_reference(word_counts, n_merges, min_pair):
    # the incremental trainer (pair-delta updates + lazy-invalidation
    # heap) must be byte-identical to the naive recount-everything loop:
    # same merges, same order, same tie-breaks, same stopping point —
    # including re-emergent pairs created by later merges
    from seqspark.pipeline.bpe import (
        EOW,
        _merge_loop_fast,
        _merge_loop_reference,
    )

    vocab = {tuple(w) + (EOW,): n for w, n in word_counts.items()}
    assert _merge_loop_fast(dict(vocab), n_merges, min_pair) == \
        _merge_loop_reference(dict(vocab), n_merges, min_pair)
