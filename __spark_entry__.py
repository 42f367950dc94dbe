"""Driver contract for the seqspark engine.

``entry(spark)`` runs the flagship query at sf0.001; ``queries()`` exposes
one callable per implemented operator from SURVEY.md §2 (plus the
LLM-pipeline operators); ``oracle_sql()`` gives the DuckDB-equivalent SQL
for every SQL-expressible entry. Column aliases match between the Spark
side and the SQL side; timestamps are compared as ``epoch_us`` BIGINTs and
floating aggregates are rounded to 3 decimals on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from seqspark import AggQuery, SearchTable
from seqspark.data import load_table

# text-tokenizer separator class (same regex dialect in Spark/RE2)
TOKRE = r"[^\p{L}\p{N}_*]+"

EVENTS_MAPPING = {
    "event_type": "keyword",
    "user_id": "keyword",
    "value": "keyword",
    "event_id": "keyword",
    "props": "text",
}

DOCS_MAPPING = {
    "text": "text",
    "lang": "keyword",
    "source": "keyword",
    "doc_id": "keyword",
}

#: FROZEN BPE merge list — trained once via
#: ``train_bpe(sf0.001 documents, n_merges=48, vocab_k=4000)`` (deterministic:
#: ranking is (count DESC, word ASC), pair choice (count DESC, pair ASC)) and
#: pinned here as literals so queries() and oracle_sql() run the IDENTICAL
#: replace-chain — the deployment shape for a production tokenizer, where the
#: vocabulary is an artifact, not re-learned per query. "\x17" is the
#: end-of-word symbol (rendered "</w>" in output).
BPE_MERGES = [
    ("e", "r"), ("e", "\x17"), ("n", "\x17"), ("o", "r"), ("t", "\x17"),
    ("er", "\x17"), ("o", "w"), ("ow", "\x17"), ("l", "u"), ("i", "n"),
    ("y", "\x17"), ("a", "r"), ("p", "ar"), ("g", "\x17"), ("a", "s"),
    ("h", "\x17"), ("a", "\x17"), ("s", "t"), ("a", "t"), ("a", "n\x17"),
    ("c", "an\x17"), ("s", "can\x17"), ("c", "o"), ("co", "lu"),
    ("colu", "m"), ("colum", "n\x17"), ("d", "ow\x17"), ("in", "dow\x17"),
    ("w", "indow\x17"), ("d", "er\x17"), ("or", "der\x17"), ("or", "t\x17"),
    ("s", "ort\x17"), ("p", "\x17"), ("par", "t\x17"), ("u", "p\x17"),
    ("a", "g"), ("ag", "g\x17"), ("a", "lu"), ("alu", "e\x17"),
    ("v", "alue\x17"), ("in", "e\x17"), ("l", "ine\x17"), ("e", "y\x17"),
    ("k", "ey\x17"), ("i", "n\x17"), ("j", "o"), ("jo", "in\x17"),
]


def _events_table(spark: SparkSession, sf_dir: str) -> SearchTable:
    # assume_folded: the synthetic keyword values are lower-case on disk (as
    # the reference's index guarantees by folding at ingest) — this is the
    # same fast path bench.py runs, so the pushed-down plans are
    # oracle-verified here (VERDICT r2 "What's wrong #6")
    ev = load_table(spark, sf_dir, "events")
    return SearchTable.from_typed(
        ev, EVENTS_MAPPING, ts_col="ts", rid_col="event_id", assume_folded=True
    )


def _docs_table(spark: SparkSession, sf_dir: str) -> SearchTable:
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "ts", F.timestamp_millis(F.col("doc_id") * 1000)
    )
    return SearchTable.from_typed(
        docs, DOCS_MAPPING, ts_col="ts", rid_col="doc_id", assume_folded=True
    )


def _ev_cols(df: DataFrame) -> DataFrame:
    return df.select(
        "event_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        "user_id",
        "event_type",
        "value",
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: compound seq-ql filter + top-100 page, newest first."""
    st = _events_table(spark, "/root/testdata/sf0.001")
    return _ev_cols(
        st.search(
            "event_type:in(click, view) and value:[10, *] or event_type:error",
            size=100,
            order="desc",
        )
    )


# --------------------------------------------------------------------------
# queries: name -> callable(spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------


def _search(q: str, **kw):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        return _ev_cols(_events_table(spark, sf_dir).search(q, **kw))

    return run


def q_keyword_eq(spark, sf_dir):
    return _search("event_type:click")(spark, sf_dir)


def q_keyword_eq_native(spark, sf_dir):
    # integral keyword equality: compiles to a bare typed EqualTo
    # (pushable + bloom-skippable on store tables) while keeping
    # string-token semantics — the oracle states those semantics directly
    # user_id:7 exists at every scale factor (sf0.001 caps ids at 14;
    # 42 was vacuous there)
    return _search("user_id:7")(spark, sf_dir)


def q_keyword_wildcard(spark, sf_dir):
    return _search("event_type:c*ck")(spark, sf_dir)


def q_filter_in(spark, sf_dir):
    return _search("event_type:in(click, view)")(spark, sf_dir)


def q_range_numeric(spark, sf_dir):
    return _search("value:[10, 20)")(spark, sf_dir)


def q_legacy_query(spark, sf_dir):
    # legacy dialect (reference `parser/query_parser.go:148` ParseQuery, the
    # default when `use-seq-ql` is absent): uppercase operators, AND binds
    # tighter than OR, `[a TO b]` inclusive range
    return _search(
        "event_type: click OR event_type: view AND value:[10 TO 50]",
        dialect="legacy",
    )(spark, sf_dir)


def q_sessionize(spark, sf_dir):
    # gap-based sessionization: per-user session stats with a 1h gap
    from seqspark.pipeline.sessions import session_stats

    ev = load_table(spark, sf_dir, "events")
    return session_stats(ev, "user_id", "ts", gap_ms=3600_000)


def q_sessionize_scalable(spark, sf_dir):
    # EXACT sessionize with bounded window partitions (r11): two-phase
    # per-(actor, 2-day-bucket) windows + summary-level stitch. The
    # oracle is the SAME single-window gap-and-islands SQL as the plain
    # `sessionize` entry — the hash gate itself is the exactness proof.
    from seqspark.pipeline.sessions import sessionize_scalable

    ev = load_table(spark, sf_dir, "events")
    # hot_threshold=66 ~ the median per-user count at sf0.01, so BOTH
    # branches of the hybrid (plain window for cold actors, two-phase
    # for hot) execute and their union must still hash-match the
    # single-window oracle
    s = sessionize_scalable(
        ev, "user_id", "ts", gap_ms=3600_000,
        bucket_ms=2 * 24 * 3600 * 1000, hot_threshold=66,
    )
    ts_ms = F.unix_millis(F.col("ts"))
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(ts_ms).alias("start_ms"),
            F.max(ts_ms).alias("end_ms"),
        )
        .withColumn("duration_ms", F.col("end_ms") - F.col("start_ms"))
    )


def q_sessionize_bucketed(spark, sf_dir):
    # the sessionize skew mitigation (r11): window partitioned by
    # (actor, day bucket) — a mega-actor shards into day slices; the
    # stated semantics delta (sessions split at bucket boundaries,
    # bucket-local seq) is replayed exactly by the oracle's
    # two-key gap-and-islands
    from seqspark.pipeline.sessions import sessionize_bucketed

    ev = load_table(spark, sf_dir, "events")
    out = sessionize_bucketed(
        ev, "user_id", "ts", gap_ms=3600_000, bucket_ms=7 * 24 * 3600 * 1000
    )
    return (
        out.groupBy("user_id", "session_bucket", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_millis("ts")).alias("start_ms"),
        )
    )


def q_sessionize_native(spark, sf_dir):
    # the BUILT-IN session_window variant (pure JVM streaming state when
    # run as a stream; identical grouping expression in batch) — 10-min
    # gap per user; end = last event ts, matching the stateful operator
    from seqspark.streaming import sessionize_native

    ev = load_table(spark, sf_dir, "events")
    return sessionize_native(ev, "user_id", "ts", gap_ms=600_000).select(
        "user_id", "session_start_ms", "session_end_ms", "n_events"
    )


def q_sketch_balanced_sample(spark, sf_dir):
    # topic-balanced selection: hyperplane-sketch buckets capped at 5
    # hash-uniform members each — deterministic, oracle-reproducible
    # (literal planes + md5 ranks)
    from seqspark.pipeline.sampling import sketch_balanced_sample

    emb = load_table(spark, sf_dir, "embeddings")
    out = sketch_balanced_sample(emb, per_bucket=5, bits=8, dim=64)
    return out.select("vec_id", "sketch")


def q_ivf_update(spark, sf_dir):
    # one Lloyd step of the IVF coarse-quantizer training (k=4 seeds = the
    # 4 lowest-id vectors): assignment by max cosine, element-wise mean per
    # cell; only k x dim floats cross the driver
    from seqspark.pipeline.ann import ivf_update

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    seeds = [
        list(map(float, r["embedding"]))
        for r in emb.orderBy("vec_id").limit(4).select("embedding").collect()
    ]
    return ivf_update(emb, seeds).select(
        F.col("cell").cast("int").alias("cell"),
        F.col("pos").cast("int").alias("pos"),
        F.round("v", 4).alias("v"),
    )


def q_cap_per_group(spark, sf_dir):
    # deterministic per-group caps: at most 10 docs per source, hash-ranked
    # (sources hold 25 docs at sf0.01, so the cap BINDS on every group —
    # a 40-cap would be a vacuous pass)
    from seqspark.pipeline.sampling import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    return cap_per_group(docs, "doc_id", "source", 10, seed="v1").select(
        "doc_id", "source"
    )


def q_cap_per_group_salted(spark, sf_dir):
    # the r11 skew knob, contract-verified: the hot-only two-stage rank
    # must be EXACTLY the single-stage result, hash-checked through the
    # same window-SQL oracle. n*salt_groups = 12 < the 25 docs per
    # source at sf0.01, so every source is detected hot and the
    # pre-stage genuinely executes (a vacuous no-op would test nothing).
    from seqspark.pipeline.sampling import cap_per_group

    docs = load_table(spark, sf_dir, "documents")
    return cap_per_group(
        docs, "doc_id", "source", 3, seed="v1", salt_groups=4
    ).select("doc_id", "source")


def q_top_per_group(spark, sf_dir):
    # top-3 events by value per event_type (value DESC, event_id tiebreak)
    from seqspark.pipeline.sampling import top_per_group

    ev = load_table(spark, sf_dir, "events")
    return top_per_group(ev, "event_type", "value", 3, key_col="event_id").select(
        "event_id", "event_type", "value"
    )


def q_heavy_hitters(spark, sf_dir):
    # composition: exact per-language token frequencies -> top-5 tokens per
    # lang (token-frequency heavy hitters; ties break lexicographically)
    from seqspark.pipeline.sampling import top_per_group
    from seqspark.pipeline.textstats import words

    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("lang", F.explode(words(F.col("text"))).alias("token"))
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return top_per_group(freq, "lang", "cnt", 5, key_col="token")


def q_domain_stats(spark, sf_dir):
    # per-domain URL histogram (blocklists / domain quotas): documents have
    # no URLs, so synthesize two per doc from its columns (like
    # path_prefix_tokens synthesizes paths)
    from seqspark.pipeline.textstats import domain_stats

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "t",
        F.concat(
            F.lit("intro https://"),
            F.col("source"),
            F.lit(".Example.com/"),
            F.col("lang"),
            F.lit(" mid https://cdn.shared.net/a end"),
            # credentials-in-URL: the host, never the userinfo, is the domain
            F.lit(" auth http://user:pw@secure.shared.net/b"),
        ),
    )
    return domain_stats(docs, "doc_id", "t")


def q_stratified_sample(spark, sf_dir):
    # per-stratum deterministic quotas: corpus rebalance by language
    from seqspark.pipeline.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs,
        "doc_id",
        "lang",
        {"en": 0.5, "de": 0.2, "zh": 1.0},
        seed="v1",
        default_fraction=0.1,
    ).select("doc_id", "lang")


def _dedup_kernel_subset(docs):
    """Bounded subset for the exact-verification kernels: the first 200 ids
    (where sf0.01 plants near-dups) PLUS every doc whose text is exactly
    duplicated anywhere (where larger SFs plant dups across the full id
    space) — keeps the oracle's crossJoin small at ANY scale factor while
    guaranteeing non-vacuous pairs."""
    dup_texts = (
        docs.groupBy("text")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("text")
    )
    return docs.filter(F.col("doc_id") < 200).unionByName(
        docs.join(dup_texts, "text", "left_semi").filter(F.col("doc_id") >= 200)
    )


#: SQL twin of `_dedup_kernel_subset`
_KERNEL_WHERE = (
    "(doc_id < 200 OR text IN "
    "(SELECT text FROM documents GROUP BY text HAVING count(*) > 1))"
)


def q_dup_clusters(spark, sf_dir):
    # connected components over verified jaccard pairs (cluster-level
    # dedup survivor selection): iterative min-label propagation, verified
    # against a DuckDB recursive CTE over the same pair set
    from seqspark.pipeline.dedup import dup_clusters, jaccard_pairs

    docs = _dedup_kernel_subset(load_table(spark, sf_dir, "documents"))
    ids = (
        docs.select(F.col("doc_id").alias("id_a"))
        .crossJoin(docs.select(F.col("doc_id").alias("id_b")))
        .filter(F.col("id_a") < F.col("id_b"))
    )
    pairs = jaccard_pairs(docs, ids, "doc_id", "text", k=3, threshold=0.3)
    return dup_clusters(pairs).select(
        F.col("id").alias("doc_id"), F.col("root").alias("cluster_root")
    )


def q_legacy_range(spark, sf_dir):
    # `{a TO b}` exclusive bounds + NOT (`parser/token_range.go`)
    return _search(
        "NOT event_type:error AND value:{10 TO 50}", dialect="legacy"
    )(spark, sf_dir)


def q_range_open(spark, sf_dir):
    return _search("value:[15, *]")(spark, sf_dir)


def q_range_lexicographic(spark, sf_dir):
    return _search("event_type:[click, error]")(spark, sf_dir)


def q_exists(spark, sf_dir):
    return _search("_exists_:props")(spark, sf_dir)


def q_match_all(spark, sf_dir):
    return _search("*")(spark, sf_dir)


def q_bool_precedence(spark, sf_dir):
    return _search(
        "event_type:click and value:[10, *] or event_type:error and value:[30, *]"
    )(spark, sf_dir)


def q_bool_not(spark, sf_dir):
    return _search("not event_type:click and value:[50, *]")(spark, sf_dir)


def q_comment_strip(spark, sf_dir):
    return _search("event_type:click # this comment is stripped\nor event_type:view")(
        spark, sf_dir
    )


def q_time_range(spark, sf_dir):
    # [2024-01-05 00:00, 2024-01-10 00:00] UTC in unix-ms
    return _search("*", from_ms=1704412800000, to_ms=1704844800000)(spark, sf_dir)


def q_fields_pipe(spark, sf_dir):
    st = _events_table(spark, sf_dir)
    return st.search("* | fields event_id, event_type")


def q_order_limit_desc(spark, sf_dir):
    return _search("*", size=100, order="desc")(spark, sf_dir)


def q_order_limit_asc(spark, sf_dir):
    return _search("*", size=100, order="asc")(spark, sf_dir)


def q_offset_pagination(spark, sf_dir):
    return _search("*", size=200, offset=500, order="asc")(spark, sf_dir)


def q_merge_dedup(spark, sf_dir):
    # replica merge: duplicate the source, dedup on doc id at read
    st = _events_table(spark, sf_dir)
    doubled = st.df.union(st.df)
    st2 = SearchTable(doubled, st.mapping, st.resolver, "ts", "event_id")
    return _ev_cols(st2.search("event_type:error", dedup_cols=["event_id"]))


def q_fetch_by_ids(spark, sf_dir):
    st = _events_table(spark, sf_dir)
    return _ev_cols(st.fetch_ids(list(range(0, 500, 7)), "event_id"))


def q_store_bloom_fetch(spark, sf_dir):
    # store-path equivalence pin for bloom row-group skipping
    # (store.py:380-402): the same fetch-by-ids as `fetch_by_ids`, but
    # read THROUGH a DocStore with a bloom filter on event_id — the rows
    # must equal the plain-parquet oracle exactly, proving the bloom skip
    # never drops a matching row group. Day buckets bound the dir count.
    import hashlib
    import os
    import tempfile

    from seqspark.store import DocStore

    ev = load_table(spark, sf_dir, "events")
    # deterministic per-sf_dir cache: repeated contract runs reuse one
    # store copy instead of leaking a fresh sf-sized table into /tmp
    # every invocation. The sentinel is a CONTENT fingerprint (source
    # parquet paths + sizes + mtimes), not a bare row count — a
    # regenerated dataset at the same path with the same cardinality
    # must invalidate the cached DocStore copy, or the bloom-path
    # contract entry would compare stale store rows against a fresh
    # DuckDB oracle.
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    base = os.path.join(
        tempfile.gettempdir(), f"seqspark-bloom-entry-{tag}"
    )
    path = base + "/store"
    sentinel = os.path.join(base, "_src")
    src = os.path.join(sf_dir, "events.parquet")
    parts = [src] if os.path.isfile(src) else sorted(
        os.path.join(src, p) for p in os.listdir(src)
        if not p.startswith(("_", "."))
    )
    stamp = hashlib.md5(
        "\n".join(
            f"{p}:{os.path.getsize(p)}:{os.path.getmtime(p)}" for p in parts
        ).encode()
    ).hexdigest()
    store = DocStore(
        spark, path, bucket_fmt="yyyy-MM-dd", bloom_cols=("event_id",)
    )
    if not (
        os.path.exists(sentinel)
        and open(sentinel).read() == stamp
    ):
        import shutil

        shutil.rmtree(base, ignore_errors=True)
        store = DocStore(
            spark, path, bucket_fmt="yyyy-MM-dd", bloom_cols=("event_id",)
        )
        store.append(ev, ts_col="ts")
        with open(sentinel, "w") as f:
            f.write(stamp)
    st = SearchTable.from_typed(
        store.read(),
        EVENTS_MAPPING,
        ts_col="ts",
        rid_col="event_id",
        assume_folded=True,
    )
    return _ev_cols(st.fetch_ids(list(range(0, 500, 7)), "event_id"))


def q_with_total(spark, sf_dir):
    return _events_table(spark, sf_dir).total("event_type:click")


def q_fulltext_and(spark, sf_dir):
    st = _docs_table(spark, sf_dir)
    return st.search('text:"table scan"').select("doc_id", "lang", "source")


def q_fulltext_wildcard(spark, sf_dir):
    st = _docs_table(spark, sf_dir)
    return st.search("text:sc*n").select("doc_id", "source")


def q_agg_count_group(spark, sf_dir):
    st = _events_table(spark, sf_dir)
    out = st.aggregate(AggQuery(func="count", field="event_type"))
    return out.select("name", F.col("value").cast("long").alias("cnt"))


def q_agg_unique(spark, sf_dir):
    st = _events_table(spark, sf_dir)
    return st.aggregate(AggQuery(func="unique", field="event_type")).select("name")


def q_agg_sum_group(spark, sf_dir):
    st = _events_table(spark, sf_dir)
    out = st.aggregate(AggQuery(func="sum", field="value", group_by="event_type"))
    return out.select("name", F.round("value", 3).alias("sum_value"))


def q_agg_min_group(spark, sf_dir):
    st = _events_table(spark, sf_dir)
    out = st.aggregate(AggQuery(func="min", field="value", group_by="event_type"))
    return out.select("name", F.col("value").alias("min_value"))


def q_agg_max_group(spark, sf_dir):
    st = _events_table(spark, sf_dir)
    out = st.aggregate(AggQuery(func="max", field="value", group_by="event_type"))
    return out.select("name", F.col("value").alias("max_value"))


def q_agg_avg_group(spark, sf_dir):
    st = _events_table(spark, sf_dir)
    out = st.aggregate(AggQuery(func="avg", field="value", group_by="event_type"))
    return out.select("name", F.round("value", 3).alias("avg_value"))


def q_agg_filtered(spark, sf_dir):
    st = _events_table(spark, sf_dir)
    out = st.aggregate(
        AggQuery(func="sum", field="value", group_by="event_type"),
        q="value:[10, *] and not event_type:view",
    )
    return out.select("name", F.round("value", 3).alias("sum_value"))


def q_agg_quantile(spark, sf_dir):
    st = _events_table(spark, sf_dir)
    out = st.aggregate(
        AggQuery(
            func="quantile",
            field="value",
            group_by="event_type",
            quantiles=[0.5, 0.9],
            exact_quantiles=True,
        )
    )
    return out.select(
        "name", F.round("q0", 3).alias("p50"), F.round("q1", 3).alias("p90")
    )


def q_agg_timeseries(spark, sf_dir):
    st = _events_table(spark, sf_dir)
    week = 7 * 86400000
    out = st.aggregate(
        AggQuery(func="count", field="event_type", interval_ms=week)
    )
    return out.select(
        "mid_ms", "name", F.col("value").cast("long").alias("cnt")
    )


def q_date_histogram(spark, sf_dir):
    st = _events_table(spark, sf_dir)
    return st.histogram("event_type:error", interval_ms=6 * 3600 * 1000)


def q_notexists_accounting(spark, sf_dir):
    # docs missing the agg field are counted separately
    # (`frac/processor/aggregator.go:77-117`): here, events where the json
    # props lacks 'k2' vs has it
    ev = load_table(spark, sf_dir, "events")
    k2 = F.get_json_object(F.col("props"), "$.k2")
    return (
        ev.select(F.when(k2.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("not_exists"))
        .groupBy("not_exists")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def q_json_field_extract(spark, sf_dir):
    # ingest-transform building block: JSON field extraction + numeric cast
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").try_cast("long")
    return (
        ev.select(F.col("event_id"), k.alias("k"))
        .filter(F.col("k") >= 50)
    )


def q_auto_mapping_search(spark, sf_dir):
    # --mapping=auto end to end (`cmd/seq-db/seq-db.go:297`,
    # `tests/integration_tests/single_test.go:476` TestIndexingAllFields):
    # raw JSON ingested with NO mapping, every top-level field
    # keyword-indexed under its own name; exact + wildcard search works
    from seqspark import AutoMapping, SearchTable
    from seqspark.ingest import ingest_docs

    ev = load_table(spark, sf_dir, "events")
    raw = ev.select(
        F.to_json(
            F.struct(
                F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSS").alias(
                    "timestamp"
                ),
                F.col("event_id").cast("string").alias("event_id"),
                F.col("event_type"),
                F.col("user_id").cast("string").alias("user_id"),
            )
        ).alias("raw")
    )
    docs = ingest_docs(
        raw,
        AutoMapping(),
        ingest_ts=F.timestamp_millis(F.lit(1704067200000)),
        allowed_drift_ms=1 << 60,
        future_drift_ms=1 << 60,
    )
    st = SearchTable.from_docs(docs, AutoMapping())
    hits = st.search("event_type:click and user_id:1*", size=None)
    return hits.select(
        F.get_json_object("raw", "$.event_id").cast("long").alias("event_id")
    )


def q_ingest_tokenize(spark, sf_dir):
    # text tokenizer parity: exploded (doc_id, token) pairs
    from seqspark.tokenize import text_tokens

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.explode(text_tokens(F.col("text"))).alias("token")
    )


def q_path_prefix_tokens(spark, sf_dir):
    # path tokenizer: every /-prefix of a synthesized /lang/source path
    from seqspark.tokenize import path_tokens

    docs = load_table(spark, sf_dir, "documents")
    path = F.concat(F.lit("/"), F.col("lang"), F.lit("/"), F.col("source"))
    return docs.select("doc_id", F.explode(path_tokens(path)).alias("token"))


def q_ann_batch_topk(spark, sf_dir):
    # exact batched cosine top-5 for three query vectors in one corpus pass
    from seqspark.pipeline.ann import batch_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    corpus = emb.filter(F.col("vec_id") >= 3)
    out = batch_topk(corpus, queries, k=5)
    return out.select("query_id", "vec_id", F.round("score", 4).alias("score"))


def q_gopher_quality(spark, sf_dir):
    # Gopher rule-based quality flags (Rae et al. 2021 A1.1) with
    # fixture-scaled thresholds so both keep outcomes occur
    from seqspark.pipeline.textstats import gopher_filter

    docs = load_table(spark, sf_dir, "documents")
    return gopher_filter(docs, min_words=5, max_words=500).select(
        "doc_id",
        "rule_word_count",
        "rule_mean_word_len",
        "rule_symbol_ratio",
        "rule_alpha_words",
        "rule_required_words",
        "gopher_keep",
    )


def q_gopher_repetition(spark, sf_dir):
    # Gopher repetition rules (Rae et al. 2021 A1.2): dup line/para
    # fractions + top-2-gram and dup-5-gram char fractions (the n-gram
    # family restricted to one member each so the oracle stays tractable;
    # the full 13-rule default is pytest-covered)
    from seqspark.pipeline.textstats import gopher_repetition_filter

    docs = load_table(spark, sf_dir, "documents")
    out = gopher_repetition_filter(
        docs, top_ngram_max={2: 0.20}, dup_ngram_max={5: 0.15}
    )
    return out.select(
        "doc_id",
        F.round("dup_line_frac", 4).alias("dup_line_frac"),
        F.round("dup_line_char_frac", 4).alias("dup_line_char_frac"),
        F.round("dup_para_frac", 4).alias("dup_para_frac"),
        F.round("dup_para_char_frac", 4).alias("dup_para_char_frac"),
        F.round("top_2gram_char_frac", 4).alias("top_2gram_char_frac"),
        F.round("dup_5gram_char_frac", 4).alias("dup_5gram_char_frac"),
        "gopher_rep_keep",
    )


def q_unigram_perplexity(spark, sf_dir):
    # CCNet-style LM quality score: unigram model trained on the corpus
    # itself (vocab_k=100 so OOV hits occur), mean per-token logprob per doc
    from seqspark.pipeline.textstats import train_unigram_lm, unigram_logprob_score

    docs = load_table(spark, sf_dir, "documents")
    lm = train_unigram_lm(docs, vocab_k=100)
    out = unigram_logprob_score(docs, lm, "doc_id")
    return out.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round("mean_logp", 4).alias("mean_logp"),
    )


def q_dsir_score(spark, sf_dir):
    # DSIR importance weights (Xie et al. 2023): hashed unigram+bigram
    # distributions fit on target (lang='en') vs raw (all docs); per-doc
    # log importance ratio. dim=512 so bucket collisions occur and the
    # densified-ratio path is exercised.
    from seqspark.pipeline.textstats import (
        dsir_bucket_counts, dsir_log_ratios, dsir_score)

    docs = load_table(spark, sf_dir, "documents")
    dim = 512
    tc = dsir_bucket_counts(docs.filter(F.col("lang") == "en"), dim=dim)
    rc = dsir_bucket_counts(docs, dim=dim)
    out = dsir_score(docs, dsir_log_ratios(tc, rc, dim=dim), "doc_id", dim=dim)
    return out.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.round("log_importance", 3).alias("log_importance"),
    )


def q_dsir_resample(spark, sf_dir):
    # Gumbel top-k resampling of the DSIR-scored corpus: k=60 docs drawn
    # without replacement with P ∝ exp(log_importance), seeded md5 Gumbel
    # noise so the draw is deterministic and engine-portable.
    from seqspark.pipeline.textstats import (
        dsir_bucket_counts, dsir_log_ratios, dsir_resample, dsir_score)

    docs = load_table(spark, sf_dir, "documents")
    dim = 512
    tc = dsir_bucket_counts(docs.filter(F.col("lang") == "en"), dim=dim)
    rc = dsir_bucket_counts(docs, dim=dim)
    scored = dsir_score(
        docs, dsir_log_ratios(tc, rc, dim=dim), "doc_id", dim=dim)
    return dsir_resample(scored, "doc_id", 60, seed=7).select(
        "doc_id", "lang", "source")


def q_lang_detect(spark, sf_dir):
    # stopword-vote language ID: the oracle replicates the sequential
    # strictly-greater fold exactly — earliest language among those at
    # the max wins, all-zero votes → 'und'
    from seqspark.pipeline.textstats import detect_lang

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", detect_lang(F.col("text")).alias("lang_guess"))


def q_frame_sample(spark, sf_dir):
    # frame sampling: assets synthesized from the documents table (content
    # = utf-8 text bytes), fake decoder derives n_frames from sha256 —
    # portable, so the uniformly-spaced SELECTION (the Spark-side logic)
    # is hash-checked; the binary frame column is excluded (DuckDB views
    # carry no binaries)
    from seqspark.pipeline.multimodal import sample_frames

    docs = load_table(spark, sf_dir, "documents")
    assets = docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("{}").alias("meta_json"),
    )
    out = sample_frames(assets, n_samples=3, fake=True)
    return out.select("asset_id", "n_frames", "frame_index")


def q_bigram_perplexity(spark, sf_dir):
    # stupid-backoff bigram LM quality score (Brants et al. 2007):
    # trained on the corpus itself with small vocab/bigram caps so the
    # backoff AND OOV paths are both exercised
    from seqspark.pipeline.textstats import (
        bigram_logprob_score, train_bigram_lm)

    docs = load_table(spark, sf_dir, "documents")
    vocab, bi = train_bigram_lm(docs, vocab_k=100, bigram_k=300)
    out = bigram_logprob_score(docs, vocab, bi, "doc_id")
    return out.select(
        "doc_id",
        F.col("n_bigrams").cast("long").alias("n_bigrams"),
        F.round("mean_logs", 4).alias("mean_logs"),
    )


def q_html_extract(spark, sf_dir):
    # HTML→text extraction: synthetic page per document wrapping the text
    # in boilerplate (style/script with TRAP markup inside, comments,
    # block tags, entities incl. the &amp;amp; double-decode trap); the
    # oracle runs the identical RE2-compatible regexp chain in DuckDB
    from seqspark.pipeline.textstats import html_to_text

    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit("</title><style>p { color: red; }</style>"
              "<script>var t = \"<p>trap</p>\";</script></head><body><h1>"),
        F.col("source"),
        F.lit(" &amp;amp; co</h1><!-- meta "),
        F.col("lang"),
        F.lit(" --><p>"),
        F.col("text"),
        F.lit("</p><div>tail&nbsp;&lt;"),
        F.col("lang"),
        F.lit("&gt;</div><br/>fin</body></html>"),
    )
    return docs.select(
        "doc_id", html_to_text(html).alias("text_extracted"))


def q_url_canonical(spark, sf_dir):
    # URL canonicalization + URL-level dedup: two messy variants per doc
    # (tracking params / default port / fragment / unsorted params /
    # trailing slash / uppercase VS an already-canonical twin with an
    # offset id) must collapse to ONE row each with the canonical string —
    # every rule is cross-checked because the variants disagree on it
    from seqspark.pipeline.textstats import url_dedup

    docs = load_table(spark, sf_dir, "documents")
    messy = docs.select(
        "doc_id",
        F.concat(
            F.lit("HTTPS://"), F.col("source"), F.lit(".Example.com:443/"),
            F.col("lang"), F.lit("/page"), F.col("doc_id"),
            F.lit("/?utm_source=x&b=2&a=1#frag"),
        ).alias("url"),
    )
    clean_twin = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/"),
            F.col("lang"), F.lit("/page"), F.col("doc_id"),
            F.lit("?a=1&b=2"),
        ).alias("url"),
    )
    out = url_dedup(messy.unionByName(clean_twin), "url", "doc_id")
    return out.select("doc_id", "canonical_url")


def q_c4_filter(spark, sf_dir):
    # C4 line/page cleaning over synthesized multi-line pages: line 1 keeps
    # (long + terminal '.'), lines 2-3 drop (short / no punctuation),
    # line 4 varies the brace flag, line 5 varies the lorem flag
    from seqspark.pipeline.textstats import c4_filter

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "t",
        F.concat_ws(
            "\n",
            F.concat(F.col("text"), F.lit(".")),
            F.lit("tiny line."),
            F.lit("this line has no terminal punctuation"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.lit("curly { brace sentence appears right here today."),
            ).otherwise(F.lit("clean closing sentence for the document.")),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.lit("lorem ipsum dolor sit amet line here."),
            ).otherwise(F.lit("regular final line of this document page.")),
        ),
    )
    return c4_filter(docs, "t").select(
        "doc_id", "text_clean", "rule_no_lorem", "rule_no_brace",
        "rule_min_sentences", "c4_keep",
    )


def q_token_budget(spark, sf_dir):
    # per-source token accounting behind mixture weights
    from seqspark.pipeline.textstats import token_budget_report

    docs = load_table(spark, sf_dir, "documents")
    return token_budget_report(docs, "source")


def q_index_hot_tokens(spark, sf_dir):
    # doc-frequency hot list that drives selectivity-based index routing
    # (seqspark.index.collect_index_stats): top-50 (field, token) pairs by
    # doc frequency over the materialized inverted index
    from seqspark.engine import materialize_tokens
    from seqspark.index import build_inverted_index

    docs = load_table(spark, sf_dir, "documents")
    tok = materialize_tokens(docs, {"text": "text"})
    idx = build_inverted_index(tok, {"text": "__tok_text"}, id_cols=["doc_id"])
    return (
        idx.groupBy("field", "token")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy(F.desc("df"), "field", "token")
        .limit(50)
    )


def q_timestamp_parse_chain(spark, sf_dir):
    # 3-format fallback chain (`proxy/bulk/processor.go:101-126`) over
    # synthesized doc strings in each format
    from seqspark.ingest import parse_event_time

    ev = load_table(spark, sf_dir, "events")
    es = F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSS")
    rfc = F.date_format(F.col("ts"), "yyyy-MM-dd'T'HH:mm:ssXXX")
    raw = F.when(
        F.col("event_id") % 2 == 0,
        F.concat(F.lit('{"timestamp":"'), es, F.lit('"}')),
    ).otherwise(F.concat(F.lit('{"time":"'), rfc, F.lit('"}')))
    return ev.select(
        "event_id", F.unix_micros(parse_event_time(raw)).alias("parsed_us")
    )


def q_doc_size_tracking(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select("event_id", F.length("props").alias("doc_size"))


# ---------------------------------------------------------------- pipeline


def q_dedup_exact(spark, sf_dir):
    from seqspark.pipeline.dedup import exact_dedup

    docs = load_table(spark, sf_dir, "documents")
    with_h = docs.withColumn("h", F.md5(F.col("text")))
    return exact_dedup(with_h, ["h"], "doc_id").select("doc_id", "h")


def q_incremental_dedup(spark, sf_dir):
    # daily-increment corpus build: dedup a NEW batch against the digest
    # set of an already-ingested corpus (docs with id % 4 == 0), then
    # within-batch. The batch plants cross-corpus dupes (% 8 == 0 texts
    # re-labeled +100000) and within-batch dupes (% 4 == 1 re-labeled
    # +200000); only the original % 4 in {1,2,3} rows survive.
    from seqspark.pipeline.dedup import corpus_digests, incremental_dedup

    docs = load_table(spark, sf_dir, "documents")
    seen = corpus_digests(docs.filter(F.col("doc_id") % 4 == 0))
    batch = (
        docs.filter(F.col("doc_id") % 4 != 0)
        .unionByName(
            docs.filter(F.col("doc_id") % 8 == 0)
            .withColumn("doc_id", F.col("doc_id") + F.lit(100000))
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 4 == 1)
            .withColumn("doc_id", F.col("doc_id") + F.lit(200000))
        )
    )
    return incremental_dedup(batch, seen).select(
        "doc_id", F.md5(F.col("text")).alias("h")
    )


def q_paragraph_dedup(spark, sf_dir):
    # corpus-wide exact paragraph dedup (boilerplate removal): documents
    # have no paragraph breaks, so synthesize three paragraphs per doc —
    # its own text, a footer shared by ALL docs (survives only in doc 0),
    # and a per-language closer (survives once per language)
    from seqspark.pipeline.dedup import paragraph_dedup

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "t",
        F.concat(
            F.col("text"),
            F.lit("\n\nstandard corpus footer paragraph\n\n"),
            F.col("lang"),
            F.lit(" closing paragraph"),
        ),
    )
    return paragraph_dedup(docs, "doc_id", "t").select(
        "doc_id", F.col("t").alias("text_dedup")
    )


def q_ngram_jaccard(spark, sf_dir):
    # exact 3-gram Jaccard over the bounded kernel subset (verification
    # kernel of the LSH pipeline; bounded so the oracle can cross-join).
    # The subset contains planted pairs at EVERY scale factor — id < 200
    # holds sf0.01's near-dups, the exact-dup-text branch holds larger
    # SFs' pairs (r2's id < 40 returned 0 rows — a vacuous pass)
    from seqspark.pipeline.dedup import jaccard_pairs, shingles

    docs = _dedup_kernel_subset(load_table(spark, sf_dir, "documents"))
    ids = docs.select(F.col("doc_id").alias("id_a")).crossJoin(
        docs.select(F.col("doc_id").alias("id_b"))
    ).filter(F.col("id_a") < F.col("id_b"))
    out = jaccard_pairs(docs, ids, "doc_id", "text", k=3, threshold=0.3)
    return out.select("id_a", "id_b", F.round("jaccard", 3).alias("jaccard"))


def q_minhash_lsh_pairs(spark, sf_dir):
    # hash-green (r10): the portable md5 minhash variant lets DuckDB
    # replicate the ENTIRE pipeline — shingles, 32-permutation signature,
    # 8 band keys, bucket cap, candidate join, exact-Jaccard verify
    from seqspark.pipeline.dedup import jaccard_pairs, minhash_lsh_candidates

    docs = load_table(spark, sf_dir, "documents")
    cands = minhash_lsh_candidates(
        docs, "doc_id", "text", k=3, num_hashes=32, bands=8, portable=True
    )
    return jaccard_pairs(docs, cands, "doc_id", "text", k=3, threshold=0.3).select(
        "id_a", "id_b", F.round("jaccard", 3).alias("jaccard")
    )


def q_incremental_lsh_dupes(spark, sf_dir):
    # hash-green (r10): near-dup increment — batch docs verified (3-gram
    # Jaccard) against a PERSISTED corpus band state plus within-batch;
    # portable md5 minhash so the oracle replicates state + increment.
    # Planted: every doc_id % 10 == 0 corpus text re-enters re-labeled.
    from seqspark.pipeline.dedup import (
        incremental_lsh_candidates,
        jaccard_pairs,
        minhash_band_state,
    )

    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1).unionByName(
        docs.filter(F.col("doc_id") % 10 == 0)
        .withColumn("doc_id", F.col("doc_id") + F.lit(500000))
    )
    state = minhash_band_state(
        corpus, "doc_id", "text", k=3, num_hashes=32, bands=8, portable=True
    )
    cands = incremental_lsh_candidates(
        batch, state, "doc_id", "text", k=3, num_hashes=32, bands=8, portable=True
    )
    union = corpus.unionByName(batch)
    return jaccard_pairs(union, cands, "doc_id", "text", k=3, threshold=0.3).select(
        "id_a", "id_b", F.round("jaccard", 3).alias("jaccard")
    )


def q_simhash_candidates(spark, sf_dir):
    # hash-green (r10): portable 60-bit md5 SimHash — the oracle rebuilds
    # the fingerprint (per-token hash, 60 bit votes, sign) and the 15-bit
    # band join bit-for-bit
    from seqspark.pipeline.dedup import simhash_candidates

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return simhash_candidates(
        docs, "doc_id", "text", bands=4, portable=True
    ).select("id_a", "id_b")


def q_ann_brute_topk(spark, sf_dir):
    from seqspark.pipeline.ann import brute_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    out = brute_topk(emb.filter(F.col("vec_id") != 0), list(qv), k=10)
    return out.select("vec_id", F.round("score", 4).alias("score"))


def q_ann_lsh_topk(spark, sf_dir):
    # hash-green (r10): the hyperplanes are seed-deterministic Gaussians,
    # so the oracle embeds them as literals and rebuilds sketch + band
    # filter + exact cosine top-k (ann.lsh_oracle_sql)
    from seqspark.pipeline.ann import lsh_topk

    emb = load_table(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).head()["embedding"]
    out = lsh_topk(emb.filter(F.col("vec_id") != 0), list(qv), k=10, bits=12, bands=4)
    return out.select("vec_id", F.round("score", 4).alias("score"))


def q_embedding_cosine_pairs(spark, sf_dir):
    # exact cosine over a bounded id range (oracle cross-joins the same)
    from seqspark.pipeline.ann import cosine

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 60)
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", F.round(cosine(F.col("va"), F.col("vb")), 4))
        .filter(F.col("cos") >= 0.3)
        .select("id_a", "id_b", "cos")
    )


def q_text_token_count(spark, sf_dir):
    from seqspark.pipeline.textstats import token_count

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", token_count(F.col("text")).cast("long").alias("n_tokens"))


def q_text_quality(spark, sf_dir):
    from seqspark.pipeline.textstats import quality_score, stopword_ratio

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(stopword_ratio(F.col("text")), 4).alias("stopword_ratio"),
        F.round(quality_score(F.col("text")), 4).alias("quality"),
    )


def q_text_fingerprint(spark, sf_dir):
    from seqspark.pipeline.textstats import fingerprint_md5

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint_md5(F.col("text")).alias("fp"))


def q_bpe_encode(spark, sf_dir):
    # subword tokenization with the FROZEN merge list (BPE_MERGES): pure
    # Catalyst replace-chain per word, no UDF/shuffle; the oracle runs the
    # byte-identical chain generated from the same literals
    from seqspark.pipeline.bpe import bpe_encoded

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encoded(docs, BPE_MERGES, id_col="doc_id", text_col="text")


def q_bpe_encode_dict(spark, sf_dir):
    # the SCALABLE encode path (distinct-word dictionary + positional
    # reassembly — the 32k-merge production shape) pinned to the same
    # oracle as the replace-chain: identical output by construction
    from seqspark.pipeline.bpe import bpe_encoded_via_dict

    docs = load_table(spark, sf_dir, "documents")
    return bpe_encoded_via_dict(
        docs, BPE_MERGES, id_col="doc_id", text_col="text",
        dict_mode="driver",
    )


#: frozen expected outputs of the real-codec multimodal kernels
#: over make_real_assets — generated ONCE by
#: tools/gen_multimodal_expected.py and committed; the oracle
#: compares the live Spark pipeline against these, so a kernel
#: regression fails the contract instead of moving the oracle.
MULTIMODAL_DECODE_EXPECTED = [
    (0, 'image', 198, '67d5bb70648e6bcf1902f52193abca057d252f1a0a85a33767e85c377365ca4f', 8, 6, 1),
    (1, 'image', 240, '2769baaacaeb2bff6f51b995c698120bfe3187ada7cc852bcb52821b4a4d6c4b', 9, 7, 1),
    (2, 'image', 288, 'dc0c55b1633eb002ded48501419bf9950c9649dc6b67c5fc7ade5417c7e06959', 10, 8, 1),
    (3, 'audio', 300, '1011300d1284917e5fc9379b0e78589459ca704cc90b6f01469debeedff73afb', 2, 16, 64),
    (4, 'image', 269, '5901b855db891961c23ed9f1762c368063ae542416ffdfbd0b0567ce67517cc8', 12, 6, 1),
    (5, 'image', 224, '7bcf2cff159818db474c9587088c071706218f0a740c5c2db9ab2237db03314a', 8, 7, 1),
    (6, 'image', 262, 'c07d1362689c5e5c3ccd44aa4262ca4f64fec86419b99d93c849cd38f2589f02', 9, 8, 1),
    (7, 'audio', 268, 'd34e03bdc8189a52d284d57bd1d2fd14a8b14f6697525c62f1c702a31892adaa', 2, 16, 56),
    (8, 'image', 252, '4452c2cc206dd19a58c7d1a8dab1aeaf604691ab6ec83e717c2c5bc64f713870', 11, 6, 1),
    (9, 'image', 295, '9389f02d6fc1cd50669675505ccd0abee3fab8f233a00b48ee644174c6adb621', 12, 7, 1),
    (10, 'image', 246, '230fda5953c07f0377aa5847981c0f5c919fd6eb2b64990f9308402bbd2e1eab', 8, 8, 1),
    (11, 'audio', 236, '82aa48f3d4afbd7651a460e9ce48163810d440ff545723aa7bef4450f276d77d', 2, 16, 48),
    (12, 'image', 235, '0db073a413a2d034acdbd5da5527ea41fa452df23948b4ceee14e05b63cb5fbb', 10, 6, 1),
    (13, 'image', 276, '1b99e2c7adc0c108aa443fd757e63ee48e61305205738d858905a33c708a7294', 11, 7, 1),
    (14, 'image', 327, '54b7106ad167a5ab426736a8767e529f15d60b0d321dbaa41d0c667304768deb', 12, 8, 1),
    (15, 'audio', 204, 'd34c027e45fe47ee65e62d8d2d63ab2ec4c9a95eba3d18cf4d1734a0b1d44b40', 2, 16, 40),
    (16, 'image', 215, 'f0a42fb37617dc17cf916fc8a6a2c8be47e1ef859d054e74c645b740105dac67', 9, 6, 1),
    (17, 'image', 266, '8f3d682f129ace167a0011cf744d63c4a2783375dd8b03fa6bedce1355770f1c', 10, 7, 1),
    (18, 'image', 308, '8226301f1fe58fbce21fcffdca4c83e2af6d1f9288ae61edae79281866f7642d', 11, 8, 1),
    (19, 'audio', 332, 'b2e91c502d39905adf844bc91b695c20cb97602226b0703dbffd82d1b4630430', 2, 16, 72),
    (20, 'image', 205, '60b76c2979605015320b698d7d3f37cda08dfa68af150067dc4f73585535eaed', 8, 6, 1),
    (21, 'image', 243, 'b9ac2b7f6cc35b0ad92cb91a73c9b01e260ce85108b80b82f01b946a5e47417d', 9, 7, 1),
    (22, 'image', 282, '68a20eeb799252229648e6d61d9686a21d812b803a3c382e84c8f11f3f9acd20', 10, 8, 1),
    (23, 'audio', 300, '4f6964c804b353dd161dc97657bfd7eca2dd3129ba15424b84fcc8683ab22f92', 2, 16, 64),
    (24, 'image', 269, '874fd0674c2fcb1d91a901d4a0417237455971fd206c577a60cd5147a90389f3', 12, 6, 1),
    (25, 'image', 226, 'e872fdc99a09a02419969ac3609c3691cc40600a9416c7d4b1d6580b7dea285c', 8, 7, 1),
    (26, 'image', 261, 'f80194301ec6f6a15d46581bcdd15d53fc1b93da41c51d9f7582d23587a7bff5', 9, 8, 1),
    (27, 'audio', 268, '70037c7edb1eec6e0404a56bd3aa8859dc7f24e0537b1c92ec91a887d273e09f', 2, 16, 56),
    (28, 'image', 253, '218c0c3d34d4571cee8d812ee0a2e5ec20842f5273a2c4dda424d45d117edbed', 11, 6, 1),
    (29, 'image', 296, '0d8d07c57c5e52c0aa075134fa63e9d2212d1bac41a10098e6fd5fc0135c2322', 12, 7, 1),
    (30, 'image', 243, '835e9b7114805a4f786e411dfaa83040e41f838bc233770a78e0e3a3feb2d5a0', 8, 8, 1),
    (31, 'audio', 236, 'a58ba23ddaa2c840b8b984d6d085cd0d8b7fd50f69ca2ad28b119e4f22207b6b', 2, 16, 48),
    (32, 'image', 239, 'c04c7bec9a9c96584251ac689483eb7ec8b0eced72155de1092b3c5ff7e618b6', 10, 6, 1),
    (33, 'image', 278, 'b10612ef958c3e1caab9763f11a8d96c37d273df34eb7c6baa7a9d65b952a338', 11, 7, 1),
    (34, 'image', 330, '8d8eaf5bd5c3d823f5a9f02b3a5aedee3a79e2a5e68ab858484101db6c9e8100', 12, 8, 1),
    (35, 'audio', 204, 'd63e5618b41c2e0ff6740ae7158f07e6314d3d820ab86dbabf978223b24f6e9a', 2, 16, 40),
    (36, 'image', 219, '0445c8c3fdc11088aba722dec5ad4ab32a849edd632c2941cd7113533ac9256d', 9, 6, 1),
    (37, 'image', 262, '479d674743bef0d79711b7dfcae4c04b50473341efc7fc6a1842fe0c17212c22', 10, 7, 1),
    (38, 'image', 305, '158086e85084c5a7e2475148db10651a2399633227bd36c6312c4d864771f78e', 11, 8, 1),
    (39, 'audio', 332, '1a4867f91c60117e2025038f0f029cfcaea9a02224faa5af927ec241a47df10f', 2, 16, 72),
    (40, 'image', 207, '8ea82b397f9ace2760ea2810e6f75e45aa4bfbdab72a66a8bd3427778083d9c2', 8, 6, 1),
    (41, 'image', 246, '73a9869b5ad8782723a29f44655fa0bb1e3843881e49ebc6738a0f0026082cf9', 9, 7, 1),
    (42, 'image', 288, '047b3fff35ee47d8a572ba05dfd6bc3b47d79abaf2aff5316399f899222d7c38', 10, 8, 1),
    (43, 'audio', 300, '788fecd6ebfef3d9af5bdca8d04aa679efd2cc05f7ff64313657ec246cd596f7', 2, 16, 64),
    (44, 'image', 268, '49481eafe210a92696ff412ad9fb0e995e38872f5f5b9c15c78061cf9d76afbd', 12, 6, 1),
    (45, 'image', 225, 'f8114b721c102a21d295c3530e4318fc2f77863445b24da1e8856d86a1b07ea5', 8, 7, 1),
    (46, 'image', 264, '822d3eb637d8c720de94d4c28160f927f74a7387ec9f246c1d74ebf1f961dab3', 9, 8, 1),
    (47, 'audio', 268, '4ab7fb2aff5e67b27834149e0d82d7a3ebe6e061fee8738034ded24cfc8a4c25', 2, 16, 56),
    (48, 'image', 249, 'f833206aa170fdc8074f78527e0d1c5cd58bbb18ff210691af7ff1b14bd21c8d', 11, 6, 1),
    (49, 'image', 293, 'e1bbcb1ae771394236fc5b32492e59b5e089b5c6422acb0b7f542edd93636aac', 12, 7, 1),
    (50, 'image', 244, '71956d96d69048ceefff774527feb14e08cd111455d711eba7886d06cd406d92', 8, 8, 1),
    (51, 'audio', 236, '47a8eb08c36afe438024ae1bce86c00cfae6bd4871db5f70127f057368d112c5', 2, 16, 48),
    (52, 'image', 233, '6ad3e49a83d5a6f3f70065e6e2ea5e653c553cb6bb6125bf33bdba415cba333f', 10, 6, 1),
    (53, 'image', 280, 'e98840c58ef4047a05845932dd8a37e28651b954ebfaf3042ae7a6e9a218b3c0', 11, 7, 1),
    (54, 'image', 329, '970b80013b34f4178f859fdf719909d1935083dafce777b464afa69304c36178', 12, 8, 1),
    (55, 'audio', 204, '86797648ef4a763a5fa211dee273e9af27f51719a5213737504f05b5f0f68f97', 2, 16, 40),
    (56, 'image', 220, '8c784b89d17d57ee00f49dcb11bab08478143d15190a1a753a6d6f08edb18d13', 9, 6, 1),
    (57, 'image', 263, '8702b181577253008bbec0c1cd82cab15a5d13324b7825456bce220ce3137a06', 10, 7, 1),
    (58, 'image', 302, '95a956d52535ab83b5a2f2853897973f885b97c77ed27c29f87dbc9c5967f0e2', 11, 8, 1),
    (59, 'audio', 332, 'e9e5ab71332b7a46f832f6f94c1491d8c6265e6fa26aeeb3db18f1ce1fcbbd70', 2, 16, 72),
    (60, 'image', 202, '7693e78cdc448e2cf536a162f344829d58cd04923e16de5c42dedb33e9458105', 8, 6, 1),
    (61, 'image', 244, 'bb040d89a6e15f53fdd621509b20d3eaa1bef9ca6ec69c79c21eea0241b42cec', 9, 7, 1),
    (62, 'image', 278, '9f51ef9529d31a6f8d6febde7e9940c7549ecaad3533accf8b934d0050c358d5', 10, 8, 1),
    (63, 'audio', 300, '6b6a0f609c681f72970967d43f68891ef0b21cd97a4c3529cec5b553155e8af6', 2, 16, 64),
]

MULTIMODAL_RESIZE_EXPECTED = [
    (0, '9b9e81be6cceef262557bea9a787c37cd1359915cb33873ed518f62a94a19f58', 237, 32, 16),
    (1, '449024abbfad4d66db2792294b7df409aa5ea77c569dcc647cd48934862c67cc', 291, 32, 16),
    (2, 'bfbe4bcceda16e1351cda4f673f1b48b596e376b83ea9571b43ac535d7d9fcad', 344, 32, 16),
    (4, 'e3c52078e903e9ccde4fa9712f41fd32ff5cfb77f138dba070c6d2a239d36070', 322, 32, 16),
    (5, '8764371145e8a36effe4469456de37e7b39d82a850c28751174d7d86d6efd41d', 265, 32, 16),
    (6, '6f83bce92800598671fc953022b6c8438c87b1b8c03e2645cc893d53c9dd419c', 316, 32, 16),
    (8, '757ba9e6396c177e3b2c50d0dd4a3f662cc5f411de573e6bc00065b9db0f5d65', 297, 32, 16),
    (9, 'e5d5004808e0d421b70073680f6636fa8e206e45b5fe41f6a311e2f8818ee38a', 356, 32, 16),
    (10, '238b7b3a38691e7fcc79e2909328b3d2d0da9cef75860abf62f13fcd671835a2', 287, 32, 16),
    (12, '717c88c62fb4324ffced4bbf284dcb9a0c008fe0473b009962e4a8bdf5c732df', 280, 32, 16),
    (13, '5305acda1ab1ff83bdef670334ccb76891deba7ad6a53641108a6b10e40ee681', 329, 32, 16),
    (14, '0ba497ee478dd2a40f0285ab7fe7addf02135da29fbd00e6a55a276b5f43786f', 397, 32, 16),
    (16, 'b9869ee5ca0a4d6f51d6fb2e7f517c63cd1e039d9268074b57041c60f9a40292', 262, 32, 16),
    (17, '702aa8575a4d5d6ea25c1a7cca58d0d4b0addcf3ccbf0f9a71916db5e19fac30', 317, 32, 16),
    (18, '7baa5c914a38a6e777c24fb836d172a7a4db67d037138d207c00e8612fc3e578', 367, 32, 16),
    (20, '32f1658023e02a5f3459af51bbf161672387cabfef8adc6960c55cab214f7f04', 239, 32, 16),
    (21, '6ee0d64be480cffbd9ae00e8c00b35090e260149199d95c2d9be4fb3e12a1068', 293, 32, 16),
    (22, '35615f00e77bf3f2338aff5453bb0d8456fc0a35be6ce66cc4a150bd77a60209', 340, 32, 16),
    (24, 'd7bcc647d156c6e81d43de1dced25b8690221577e4c4fe255f65bef4fe44160c', 322, 32, 16),
    (25, 'd72ef20f54447f7fc5024f7a26823ce0a0f5c763e9f84004f4fa85d2e1eba980', 266, 32, 16),
    (26, '9fd062ba7b798c57d20bbcb9dd92b291fad926cbac6b0fb34f3461b0ad18a868', 317, 32, 16),
    (28, '2de8c9ec15203fe67332584e174ba311e03a243fbea2646783e8b5b486b08abf', 298, 32, 16),
    (29, '61200a83e34b16e0658d2b6c034363af85dcc047a831852db7fb24e479768632', 358, 32, 16),
    (30, 'c7a3a2e33e176b7b0899d4a1044baa0f6e3b669863851845d1c7d9a10d800bce', 285, 32, 16),
    (32, '1dfd1b127357c934a1c0d31a45d42e3056bd26cb8f805348a37b016c71e53668', 285, 32, 16),
    (33, 'bd4208b44a6d7826fcf1b4700f564724767280bae612c25b6f37f4ef075461b0', 330, 32, 16),
    (34, '93c576e6b57686c73949a019d1e06128238a543644f7000016adbc5d24079390', 399, 32, 16),
    (36, '0300fac61e27e2cce44d17f356718741c0919c76ef90bda6f232b905790a57fd', 266, 32, 16),
    (37, '60e14af0f667f4336afa6907f773154cc47eb25b10c21ffa43bf14c8e84e9b39', 314, 32, 16),
    (38, '867144926b62caaaf621303e429c0ec87f046eced3622914f64216bce7932d6c', 363, 32, 16),
    (40, '0de9521a8bd172f3eaf068debf31a3959c0e608c1a803b6d02d3fa710e7fa90d', 240, 32, 16),
    (41, 'cd0285ac99e4fc34de653fe55ff0f666dfc242c1960640e8e999a8d52446e758', 295, 32, 16),
    (42, '32f28e5040c7b0223a9a87d6c2867030db1f2d1bbee0015ed2cef33c02b824a8', 343, 32, 16),
    (44, '580c24d5cf93166ece64a4dde4efa867ccfe931f2bdb0b72c5e82f2368cae8e3', 321, 32, 16),
    (45, '5dd9b1425a3936b0b07e2a16f5afc356c465ac4475a4b51e95f8df8246117787', 261, 32, 16),
    (46, '4440e674c0d5687d5a7017a254bf3faa2c678ec22d962d516279cf09cdce0800', 321, 32, 16),
    (48, '2e368fd30ec112584291f8d90736852d9c217abfe28c0aaa9d150173ba4fff74', 295, 32, 16),
    (49, 'df7029449dca880ef148f30decc81141540a1af986f799cc5ccb117f2ede781a', 356, 32, 16),
    (50, '588040dee595ebe6c3b41728e94a3cd925c0665f42712961bd7078e54d7cba74', 285, 32, 16),
    (52, '2b52c8705cccf69f00a04aca8e6b3aaaeae4b757090fb4f3c2293e51a34fe94e', 280, 32, 16),
    (53, '07d4dd3dc46d96d547e2c6f7f00a4c6564ad7a58fae81ea335c33659938c101c', 331, 32, 16),
    (54, '6116eeb2762abb27b1e2a80b1e3c0e28d464f25fe0ab2ca873f1c240f8dd9f53', 399, 32, 16),
    (56, '075b39755ea96877b531a8c162bf1589c9f4389b06ef6c92c1f50e9f507ed0d3', 266, 32, 16),
    (57, 'ebf95796cd92d968d7fb53b7120e3a0bbd61b8528e8b59237bb43bd213c52afe', 314, 32, 16),
    (58, '738c70a9a12758441eee78ee92d94f5970a7a9343df210f6578c234fecd47f69', 358, 32, 16),
    (60, '0a066be8db3f7f101504912a627a795f4d29e3a806fcf082671bcc99bc56ba15', 237, 32, 16),
    (61, 'c802a2b8608b2572fa1cc275fecb2597b55962f8480f9f600cef57e454605cec', 294, 32, 16),
    (62, '046f73dac67c2482aa06ee5298d160c1d6fbc385b6e701690083cd70ec99a210', 336, 32, 16),
]

#: (asset_id, dhash) — audio rows carry None (dhash_images
#: hashes non-decodable payloads to NULL, and NULLs never pair)
IMAGE_DHASH_EXPECTED = [
    (0, 56524518407061696),
    (1, 20486445324058688),
    (2, -5610249112296349664),
    (3, None),
    (4, 12464166896404488),
    (5, 65487672233205920),
    (6, 2623531708667928608),
    (7, None),
    (8, 12534535644776456),
    (9, 7930004751780876),
    (10, -5996392714063017848),
    (11, None),
    (12, 19153647174943748),
    (13, 37335620619895940),
    (14, 4778994589627466306),
    (15, None),
    (16, 39428779030086660),
    (17, 46660566068068737),
    (18, 4883421286287622465),
    (19, None),
    (20, 38722329932562817),
    (21, 56727729428595073),
    (22, -3214649527805853375),
    (23, None),
    (24, 14724762799443984),
    (25, 55389894884769984),
    (26, 7225119949746880576),
    (27, None),
    (28, 17055727455049752),
    (29, 7367037278488584),
    (30, -5416536704614887280),
    (31, None),
    (32, 21400997411162120),
    (33, 38892509552183304),
    (34, -8748624062042569596),
    (35, None),
    (36, 38307156910934024),
    (37, 9647158282289666),
    (38, -4430795969549663614),
    (39, None),
    (40, 39004771276980866),
    (41, 19855058854347266),
    (42, -3196494115860545151),
    (43, None),
    (44, 10451034117841185),
    (45, 46594629730140545),
    (46, -6510646427721301631),
    (47, None),
]


#: (asset_id, n_frames, frame_index, sha256 of the RGBA PNG
#: re-encode of the composited canvas) over real_gif_asset_rows
FRAME_SAMPLE_GIF_EXPECTED = [
    (0, 2, 0, '543941e5fd2baa53dc763324f7bc23027fa57ebf7f698354b7b11a8f3eef5efd'),
    (0, 2, 1, '02536e479d026c596cfda8e4784bf56344fefb331a34de3e3b1df7cdb27f20df'),
    (1, 3, 0, 'f3ad630915dfaa0860ac43ac37e1e80037a090cf52b8c0441e9a2f90fdd331a9'),
    (1, 3, 1, '92127009cccd83d0707b2028ea6fb4984699a34990541486c663aa7094c5acc9'),
    (1, 3, 2, 'a7d740bdd84aa2d0fd8937c40671210ddf93e88f43184364b0ffda13b563f59d'),
    (2, 4, 0, '733d04462416dfcc98f8f415b2234b3a0808a4aa8ffb85a7bd1fa0d02200e1ae'),
    (2, 4, 1, '297a1f5660279a765f5f49da0af9484a3d33ab2e9a6af2386b1a14600d77a630'),
    (2, 4, 2, 'ede857e87477a9d5d79f293a78dd12a08c39b69d0b43cdf0c65fddcf16b688cb'),
    (3, 5, 0, 'abbcc4df6cb68b4d64934a2c93cddbabf0fb43dcaed08327ac0ea712095194f2'),
    (3, 5, 1, 'b0a0b073942115e1cbc574c29ba921ca612e3527461f61ac6071d344cdc76b90'),
    (3, 5, 3, '729b7486e85e3e378e7d829e1b4db2a0d956936a5fbc774032c1a54efbeb0c01'),
    (4, 2, 0, '2bc19880a6a50fd3cce9c111298f316aa029b296fda21d162051a59a6a512f0b'),
    (4, 2, 1, '63bdf6d1d20e6f42bc4544af88682612f60052db938d9449a188d13efe3cc93d'),
    (5, 3, 0, 'ab3353a03068e45c206b1036353c93a5fe74ea7fa9097f36f3ad2ea96ad98a7b'),
    (5, 3, 1, '0774c7539e76451c94adad938d7e4ce6a31ce480d5fb696fe9ae4dd3f30668f3'),
    (5, 3, 2, 'dec4c71ad0bdc40d78ce06f788911acf77bcf867795f2a179a3e79c72528f533'),
    (6, 4, 0, 'ba75991700728a1d7989b2002beafc3596dc7ab0ec41c64ddbbd9f755cab2559'),
    (6, 4, 1, '30a9c20696d7cf2e2334021773bdcf2d1b7a428105e545abd7a326a92cb0049e'),
    (6, 4, 2, '2b1158575a69532088a1e3b8066f467db5f6e5a6ec833dcd149d8ec389e0565c'),
    (7, 5, 0, 'e12ac0494dcd5d836be9d59f63853d20c2b20357f78b42ed1373f1d86f8444f4'),
    (7, 5, 1, '3d70b762cca03576890a00500fa12d989420cb1d2f54ee172c1623932e26d8b0'),
    (7, 5, 3, '431a604dd78a0b29f0581033d267f544a292df8fbef9dfcb624585166c550cf2'),
    (8, 2, 0, 'decc685f6da9222c16cfacd74d8d90f2310b3090ee4c47d01621616bd7966868'),
    (8, 2, 1, 'decc685f6da9222c16cfacd74d8d90f2310b3090ee4c47d01621616bd7966868'),
    (9, 3, 0, 'c3e5a15c28754a962766ebe48f7e8392f115406d81af04cab8f9c51122ed965d'),
    (9, 3, 1, '16ad527312ca54e043ac9195d6971ea3c4fefbfb05664cec25bf3f47781dcd39'),
    (9, 3, 2, 'c732d8a9034a8ccfbb786b0cac18478120141b6d1a90fc6b8846eff934646d95'),
    (10, 4, 0, '4a070fae064f5c162a3a0029b667c8fff587b22caba0b1a22892f6dbdabfcc45'),
    (10, 4, 1, '8e450d7eaf6bf219a8f11019df5c1d2183148536da3adb442f78da12cde1ee16'),
    (10, 4, 2, '7722cd9a5478bcc519e503113875a33607c3682d48408b0246792fab3eaf39eb'),
    (11, 5, 0, '8acb37e3e55c425bec0b0570f13d7a45b7cc84557313a8110345cc6e17bde1a0'),
    (11, 5, 1, 'aa22aeea64228e03f456fa34442d7016e3b2aeff16ced1ce334ea9b30f623042'),
    (11, 5, 3, '661cfb8f47db7b9d7ab8ac9b696849fea507e48b68ebd6cc19f3fc1eccd49e13'),
    (12, 2, 0, '7804cd94c465d7f4b38f37bb8c562676a2f45dfc0aeb7a7f9ed938db5d39a0f0'),
    (12, 2, 1, '5f72b97fb3f42fa361e25be4c39006cee159386290486fd9020c5939da837b50'),
    (13, 3, 0, 'e6626a1575c03a29a09fc1e1d8b4f528ccab38ad2d563ae6fd5185cfc6ed8b3a'),
    (13, 3, 1, '7a1739e6b3c286852aa9a8070adb68f770973871b1d60ce1707ff793e6a78ee0'),
    (13, 3, 2, '51e97318745c4ee0f735d91a9a5794a2a0b4fff94fdf5f45c516291bb3211246'),
    (14, 4, 0, '0a5041edaf3fbb65415b43fb2a13bf4c03fffaaad1615678af4aae9aa05bdcd1'),
    (14, 4, 1, '0a5041edaf3fbb65415b43fb2a13bf4c03fffaaad1615678af4aae9aa05bdcd1'),
    (14, 4, 2, '85e10ad3fa7b0b3627311c177df80c584a538d861256ba879afe84452dd40395'),
    (15, 5, 0, '5381c63c8fefc2e6c1118ef36d1b5962e28f5e09882d9975a82f8fac4b9c813e'),
    (15, 5, 1, 'd9e63acf08515cd2f9a1a94f4eabd3edf09c34addc9a92cc5a4b6759350f699f'),
    (15, 5, 3, 'b4e5a9303cc21d5d68a1866632621ba937d98557ed216417b17886602c50b1ca'),
]


#: same shape over real_apng_asset_rows (stdlib APNG extractor)
FRAME_SAMPLE_APNG_EXPECTED = [
    (0, 2, 0, '36ff20e654b51d4700d535b144ce9859a45981572b420ee355e6ec4f3aecab09'),
    (0, 2, 1, '53964f01208f6a35b6cebeff8e0b8f8526aa072c1c8e796fb7ae3469141d06f1'),
    (1, 3, 0, '128a958eb166db260e20217b4f326d8d29d2263c059cb3f205bf4e92a41d8f43'),
    (1, 3, 1, 'cada00015e353ec556b20a9c5050433633b691eda9215e99d0b8f3f3fea5a9c9'),
    (1, 3, 2, '8d25f92f001f5b619eebf283d34bafb203d09695077d50c7466b549e0be8d279'),
    (2, 4, 0, '7cd5f1db7bc62da717f8d48b2a078a530066a4ecaca2051f1a659143fb239ef9'),
    (2, 4, 1, '21f0dec228b9b9eb0681689cf2bce619599c7adb313e9a3d865ce198e3f8b955'),
    (2, 4, 2, '39978e92ee4dae49c512ec183b24f2329c061d58ac404e605f7c15ac97fd88fc'),
    (3, 2, 0, '70ea16cf8803b75db2c80131055a4a7b22c0b3218274ffa3b358e318ba3aff14'),
    (3, 2, 1, 'f8850c8c728cc48e7dfb2e7b342bbab1a0b901fea96e435c5846b1459c495044'),
    (4, 3, 0, '60a609bdc0af6ebe356b53e7835ba81c0247b7c3527f8275475dfbba2a5cb524'),
    (4, 3, 1, 'fd5ff4fcd5b8fb5c40c08fd39d0e2dadbb1aecf601fdc11a0898315e3e3309fe'),
    (4, 3, 2, '3eed2c0c887d5732ea29463e2db767944b63656b663df8c2b79ecc520776b34a'),
    (5, 4, 0, '478c02600b4775ae8266682cb96752b99d150b102fc63665de94310b92bd23f2'),
    (5, 4, 1, 'd669bcc61a90c593cffccb0a1a6b95ddd4b952a7574b544c1d03c9193267d5a3'),
    (5, 4, 2, '1dee27c47115161fc6fc4f7eb8139f060902d2c68edd67080942c575842b8c66'),
    (6, 2, 0, 'cc7c036b19d99a3c478bf7d2cc89d917bcc604219b28097052753a2b4bf33feb'),
    (6, 2, 1, '01ef0dbf029ddbbdaf7211b96a58c6bcb5a7596a40bd553fdafa5bf5bad1e6f1'),
    (7, 3, 0, 'a904dfd7256073b5a9aa3717d7a0386703d9ad687027be0da615094fa524defe'),
    (7, 3, 1, '0779c4ee9baf5840245849ff06a154d0e87c69e41b93c3a6946cc10399fe6472'),
    (7, 3, 2, '2c73065722c439111359a6177328f5cb9a456968124e366f691c7ead826abfe6'),
    (8, 4, 0, '5a9ba81cf4f46f12c3d479693a5ea74aef2f578d80dd38649f116ea6591f9560'),
    (8, 4, 1, 'edc4d90b5965a240b9beaec9efb2005add599dfd19ebd0493680e28793a3aea7'),
    (8, 4, 2, '2187e7306a62a5fc7de3c76d3e97a32bd03b464f01c2fb2f012bd52547a78137'),
    (9, 2, 0, 'cfa198b2212daa67495764391420fd52b34e6d0b3504441c9d284f75ffa1213b'),
    (9, 2, 1, 'c0f69e5f16ed51e7ea1ae1acf613879aa4282cfb8cda1ec8222a5a5205116b23'),
    (10, 3, 0, '6e856897fc7d3d717c20daef0b16bc9f9015646b3567a92b25f856da8abaf8be'),
    (10, 3, 1, 'df632c5035b204a9144e83382129ad101e2393118ed88315c139a9c403f92ede'),
    (10, 3, 2, '8267133af540240e42e94f9f7435488f00acdcec44b74a9aaa8582552baa1876'),
    (11, 4, 0, 'c9fd536dde5ba0e83f9d07465a1ab4d1c13b5b13fa0cc8922d4d4d97a4f8b175'),
    (11, 4, 1, '196fab6003cb1c7de806bf12e931cd255d0f8b5e2d4dae6b6223bfc7af1666e2'),
    (11, 4, 2, 'c82234f9b28eb0012dfb350f44f41af46084be11d44d96328fe665cf16342740'),
    (12, 2, 0, 'b0d9a6609a88a5cf6b511a2a0b91224b7a1b5ecec760337af2eea1197be6ac8a'),
    (12, 2, 1, '58b08407726e910e08b39dbe50f9d8d740fd2ba8e776700cf934bde6e5cf0ef7'),
    (13, 3, 0, 'dd509c0a0f3efb7ca0afc0b30cf040551ea94e39466d0f88b059791888f63b2a'),
    (13, 3, 1, 'e6590c826c952ae030291ac8493232017115e758db906e244646ef79e2a3409a'),
    (13, 3, 2, '8e5e2a4d1f5ff493d1d072b5bff1a01890e2f0dd391b181ec2e393b19f28a1cc'),
    (14, 4, 0, '8ff7ce1811552e43416177c7cf4d8bfac43dd569121c9e9825161822002fccca'),
    (14, 4, 1, 'd9607a197b53db0e10e2b1c979397081fc7231dafac4624483429ee6df275663'),
    (14, 4, 2, '243290e05084cad01b53aa74802d93c105e26973e5fe312d542246eb491e0b69'),
    (15, 2, 0, '1e0d046c51c27e51162a0fe05fa925ccf08027a227ed50de4e387b5fbd081522'),
    (15, 2, 1, 'cc422559d75790db42aedb9e6debc9cdf1978c34e9a77c7432afa47858a72c79'),
]


#: same shape over real_y4m_asset_rows (stdlib Y4M video
#: decoder; frames are RGB PNG re-encodes)
FRAME_SAMPLE_Y4M_EXPECTED = [
    (0, 2, 0, '821c9ae6c829975055668dfed3363c729f3f857e3789bf56e86a419e56c2b7e5'),
    (0, 2, 1, '7e2505149de72ef3d1fa66f19100559ae71edfcfdf85bdea1d18ac872335c6f0'),
    (1, 3, 0, '6ae4838969e92d39bd68e3f9c4aceed70c789343c7ff443e12644ed4b7b69ae5'),
    (1, 3, 1, 'd4ae7a2223621d352ec48b018bb95087b47560571a74924065555df084859d97'),
    (1, 3, 2, '9b492540e59969cf754a132b2e464e8b2e2234684cbff3827736c0113ded6942'),
    (2, 4, 0, '8ef0df08f0721aafbe9f9c8dc6ad9b73b618b79470847ef641c5d266b2da5bbd'),
    (2, 4, 1, 'e0fe0ef5813e8ed70c074bca59adade84e0bb657e975dace68cbf217ee08c9ee'),
    (2, 4, 2, 'afc5b2a92125d9c0062d3499dc7d69f36a8833956a6718ba80548d4abdf7791d'),
    (3, 5, 0, '307944dd8293517c2c4686b43a7146ffe14c61c1adf0d040d050c6007fd61f9f'),
    (3, 5, 1, '7d4841fe4a6e5c635058cc2855baca68362a6c92c301532aea4fd2384175850e'),
    (3, 5, 3, '247c78fc6c07a754f74db79d6af5855c275eeac6341a90e664e7b08303935bb3'),
    (4, 2, 0, '5ac4c3afd235152cfb8bf30287c9eee9e15a633f03909ec43ce76353f90ceb79'),
    (4, 2, 1, '8d592ac36ee2ab889fcc11340ae5e27d3ff9e2b5ece7bfa45c6c0486c30f7a16'),
    (5, 3, 0, 'ed63e4e666584536052ffe7eff1b608a6d31a0166bca57d7f31d0afa0be55b3e'),
    (5, 3, 1, 'c7fda346a30279094a8168edd1e26ff3ee4a6601d67574d49c2eafd24dca0566'),
    (5, 3, 2, 'fd748ce9ed9deb691ddb054e0cb0a4e40bb534eae85bf8358c2e59dc47a70a73'),
    (6, 4, 0, '5fdce2d79aa218eb5e25f5771a56a4f6e8b9e935756b3c73a2835df08b1bab40'),
    (6, 4, 1, 'e372c7ccaa7b2ccadc63a6673ae2fbed8d36ac0d001f0ff2f5891ca5ffe7130d'),
    (6, 4, 2, '7fb4da43a0e38205f4280d515b9464e9f05bfe23a268adb4726aabc3b0b924c1'),
    (7, 5, 0, 'ad03cddafe3fe1d3818b75b7c0fd2e0125de253899e09b4aaa687159133567aa'),
    (7, 5, 1, 'e0c1a5d978c842e52a123979377722bf5d229b9df54d32847c7c5207a98d837b'),
    (7, 5, 3, '7953301b1d40b9a07af30af1f73cbb6706e4b0884a496be275927270f4885a91'),
    (8, 2, 0, '80f48eb5ae4ca8c28b8e019a3cf06fded355c010aac6e25d54be4ebb20e8dd55'),
    (8, 2, 1, 'c5536fe7bb37096f8179299c5b99c5145972e3af04158a937bd3463b773b0eb0'),
    (9, 3, 0, '82ccccf10dfc28fea587d62a7855d781ccf8994e5698ca4bf7b8b2a7fe3dfda8'),
    (9, 3, 1, '51e0ffe65989252dbe48486b22797a75fc8c76d0bb42a69725a3847b8e6c1ad3'),
    (9, 3, 2, '75c09ca6dfe3b23d9e5f9ae69c5a28a7248a820ee9f5e1a20559251e8462bd38'),
    (10, 4, 0, 'a4cac654e023fefa7a9f9a012fbfc3d4fb3713a173642d4b7fa459970d924c16'),
    (10, 4, 1, 'd016437d59181165500d7052ca03adc64821e7b819145e95cb4f5b5690c5ad9f'),
    (10, 4, 2, 'a6d687ef0ca6eb693b1abe77979a91ff2967b2a0a8925aa7f1f91a5f3db66afb'),
    (11, 5, 0, 'f7dd50f3978af95d00c28d1eee904160b9d1858e9c748ea550733aaf026dd387'),
    (11, 5, 1, '30bd3954429932171b8a70b71f4f198ec89c52f3a34398f017b520568992a595'),
    (11, 5, 3, 'cd28a57b024f6995e838b68ca0054af7c6c678d94391af384c98209bf799c3b8'),
    (12, 2, 0, '72e67f768cbb3242723858720f331a89ce3e2534a250e3608fa9fdd2a7b7adeb'),
    (12, 2, 1, '974c4e63e73e897e126763226f7891b3506113ae0955ebb4bb93f5a28a13ce56'),
    (13, 3, 0, 'f95f1635094bc7967b52713f9dbb7449888e66ac01417986992ac750c5ad7ae2'),
    (13, 3, 1, 'f48713663101ce0c18cbc05204e85c82b21bd3af75683826883fa5db8cf3edfa'),
    (13, 3, 2, 'c75011a87dc0c1a4048ff4d5816b4a2950eede07a5fa9c58944d82fe128a5d72'),
    (14, 4, 0, '5f41aef91702d08c38032d487ecd5036257befc4092558f4fccd6259306787d2'),
    (14, 4, 1, 'c420901597f65d6b97370be485ceb3015aaa84df7d1b2ef070a782ecee83b391'),
    (14, 4, 2, '4d9810f2aed4a0c2e11ef8032fdac9b8f2afb1bedd1092cbe8ed01142ee5c4b8'),
    (15, 5, 0, 'bc7c33320a934e509e6e10833b23b94d6c053acdc4eb60be1744fd7d5b8d4cb8'),
    (15, 5, 1, 'c0fa19792be98998bd4a44ad522133a8499d646c680781686d3eca4b885c4b3d'),
    (15, 5, 3, 'c1068408bee6845e47c594a1409fa931545b74e534fd891ebcfdaba69c62b494'),
]


#: (asset_id, sha256, n_bytes, w, h) of the stdlib resize of
#: each baseline-JPEG fixture asset (r12b JPEG decoder)
JPEG_RESIZE_EXPECTED = [
    (0, '79be2dd74dc3a248a111f705f0594f5a304709bd247f17070df745107d5f14e2', 467, 32, 16),
    (1, 'cf36eb85be21220bc5eb3f9c882e59077a9defabb2b6f9fcbca25492bbafceae', 984, 32, 16),
    (2, 'd5a53e6d8a132c2f962e639a5f132edc2f71fa2a6dc065f5e42dc6fa328d890f', 1177, 32, 16),
    (3, 'd958b6e01072051641d405c5060793b8cdb5a14bd90909f8928fdee8d40fa9a3', 1305, 32, 16),
    (4, '7550afe12b5c60aa7e3f8dec1e2451ab8ef78d9f905f693e2978360288554e31', 714, 32, 16),
    (5, 'aac2922ec8fa99c1022114477e1d7b3ccf1f19419eafd83a1c7449a0d2cd6a43', 870, 32, 16),
    (6, 'cc1f6608341b780efe2d8636ec8b9af64d21049b275a41a629f96d6d1757e202', 1104, 32, 16),
    (7, '3302d2884a2b34dae23f27d27c6da3963785c092f7a2a3136b977a0168198772', 1247, 32, 16),
    (8, 'aa40228aa6c4aa2fc4ffaf745467a017bf40fa3875a02d3d4ff79ab179772294', 724, 32, 16),
    (9, '23c5a2dc605b55afcf38da2ef0764ee2b84431a15550afb5359f9365dd33e008', 1080, 32, 16),
    (10, 'd7240a524e25a53af9d9a7a85134b7810d5d3c5e3b37901771133742dc25580c', 1017, 32, 16),
    (11, 'f11b79997299d288ab095e3ff9b0fe0548eb55db6fa45df4770c99ad151e9a0e', 1158, 32, 16),
    (12, 'c61908ab6f89d748490314c628d0634fc82da2c923c92e680d9029c56bfd12b6', 634, 32, 16),
    (13, 'd07dcdeab464a4ec7fe4f4c11486ad840e225f43eb0a4fc914ce50dfdc37958e', 1114, 32, 16),
    (14, 'c714a2a21401639dfb163eab45c64eac908d65dfbc7ca8bd4d898534dd178c0d', 1315, 32, 16),
    (15, '6cd2d5966d3972a8d6efce17d0f67aa3ada7c123a187d36ca1f04b70a307121a', 1061, 32, 16),
]


#: (asset_id, dhash) over real_jpeg_asset_rows
IMAGE_DHASH_JPEG_EXPECTED = [
    (0, 2531693994477127832),
    (1, -9187343239835811840),
    (2, 6944621819861155904),
    (3, 3472310912078061600),
    (4, 5280833241313612470),
    (5, -2242686647380451232),
    (6, 3490448659631312912),
    (7, 1740756466463672328),
    (8, 5534301462153310770),
    (9, 1600508525971670534),
    (10, 2622436404562756612),
    (11, 807098449597235971),
    (12, 5534230809773552162),
    (13, -7948394013784964735),
    (14, 7235156429326311648),
    (15, 580999813328273408),
]


#: same shape over real_mjpeg_asset_rows (MJPEG-in-AVI: the
#: r12b compressed-video path; frames are RGB PNG re-encodes)
FRAME_SAMPLE_MJPEG_EXPECTED = [
    (0, 2, 0, '9da73c645937fa51cb769fe259080578fd5deb19ca8f6ee4a3a47e6c211ed71b'),
    (0, 2, 1, '9f85bd5fd6f3791b46b88a4d6d04e4288bebe752fb053ce7a130f8da5457e5dc'),
    (1, 3, 0, 'f87925e03593cd14d7c589ae3f580e328226711d226569545142ea2fc9f4be21'),
    (1, 3, 1, '085209af93a4c51024d0b979b158c9f8d2150510f4f8e44d4bf2a56644ca84fc'),
    (1, 3, 2, '880e3f7abd1bf4a23ef6c1d81d7fdcf62f35c1aa69314afba004ae59022bd371'),
    (2, 4, 0, 'e6ac28b05b6a08b4744ea0b22797ea7ebf98cd8589a928f4d35a95245910f349'),
    (2, 4, 1, '296c855c9d3c44e2d2ac23a854b33bd72842d343eb0870046f5236d17aa7ab12'),
    (2, 4, 2, 'c5d99d65c16113d8db0dd315e3a1eaf748633660c5a5175723d7efaeaa9fa5c5'),
    (3, 5, 0, '025bc39373c6c47b4b78da65946a2845c0119820e705d7e0cdd4319cd2ffc550'),
    (3, 5, 1, 'f4b574455284faf4e30252360cb224499a8763fac899091e5c0def578e55a0b0'),
    (3, 5, 3, '2bd3255468c9288c5f9a0570046f5860e873e858a7b1644580b13ac062a81e9b'),
    (4, 2, 0, '4b9ec1d9c493d352f233700486909f134accada3dd2bb46079017c312c1df285'),
    (4, 2, 1, '75d203141379141a4b96ba1eb4dcdaf9894766566cad9e01b2183596fe9f12a1'),
    (5, 3, 0, 'c434de227619c448633441e1e83034848adb3a023359bc93759b7eab58b8bed8'),
    (5, 3, 1, '6ccf4423d0cc598d762a22433d3052815cb398c6208846a041507a9838c837e1'),
    (5, 3, 2, 'e295ca0cf969a71b3227ba1d470147ecd18438ed577e8a1fd0367357269d8fa5'),
    (6, 4, 0, 'a33de87ad6e66055544b65c3b5202f78381126a9498836af6cc9040fddbb1709'),
    (6, 4, 1, 'a29aa60c551201cceb086c4ca9484951e0618bdadb3ee8f5cc3914af9598fd51'),
    (6, 4, 2, '71a924da661bbfcbbe9da3391d38019bb4c554601e6679d5dd147eb2cb5021b7'),
    (7, 5, 0, '6dbc878b508fbafb0b262ecf2109ea8593c7070e76f9e4bba1d3696a0334b45e'),
    (7, 5, 1, '071fcf7305163eedd5aa2fc0442b14f924e1e311c9e7848b2411317d03c29b5a'),
    (7, 5, 3, '112fed2c3e271115e3ee058d9f281cc9249fa475df433894438d0f0e33d8feec'),
    (8, 2, 0, '81674a382bcd18ab905bef9f43a656e6c3efb0e562c3a8a209a9b5e4905a41de'),
    (8, 2, 1, '304aa03eee0471da11b27d6b95dc2a6916681400cff193bb316a7ef823c98d9c'),
    (9, 3, 0, '7f43257b5698cda82bc422abbb6bab0337bdc0078196d99b7b604e8e0867b90d'),
    (9, 3, 1, '2b709b14e052a3adf143404f5350ca6c23cd3057b3c63d4585a494066baa805c'),
    (9, 3, 2, '4bfdd972b5896472e27a33906d0837bb516a46293daa22132d03409f4a70c7c9'),
    (10, 4, 0, '72749aa24ae679d3593a742a78826ef5266a6bcf2284321614490272d3f54dd9'),
    (10, 4, 1, '37e1f4fb5115cad3bfef03af7e006b179e558c0dbe2682b4fdffc815ec4275d8'),
    (10, 4, 2, 'fbc239fe170edebb374e70717584467d6a98d89f6396ac8a12a1bf380c895a85'),
    (11, 5, 0, '7666b1d984325a5831f1705dfc88aff4bf72bd132ef49c2905a7a4359844124e'),
    (11, 5, 1, '47904560acbcad252add59deb10e33f11690b80864752faccf37f348d804a69d'),
    (11, 5, 3, '22a066e981765890eabbee263ebbef1d0356bacdae83b4ab27e48ca8a1c4d229'),
]


#: (asset_id, sample_rate, n_channels, n_samples, rms, zcr,
#: centroid_hz, fingerprint) over real_asset_rows' WAV rows
AUDIO_FEATURES_EXPECTED = [
    (3, 8000, 2, 64, 0.459711, 0.52381, 2220.094542, 72340172838076673),
    (7, 8000, 2, 56, 0.452555, 0.527273, 2285.280397, 72340172838076673),
    (11, 8000, 2, 48, 0.462356, 0.531915, 2308.037228, 144680345676153346),
    (15, 8000, 2, 40, 0.477328, 0.538462, 2340.567176, 72340172838076673),
    (19, 8000, 2, 72, 0.459995, 0.535211, 2274.17046, 361700864190383365),
    (23, 8000, 2, 64, 0.459711, 0.539683, 2220.094542, 72340172838076673),
    (27, 8000, 2, 56, 0.444335, 0.527273, 2225.179222, 72340172838076673),
    (31, 8000, 2, 48, 0.456857, 0.553191, 2264.022446, 144680345676153346),
    (35, 8000, 2, 40, 0.47243, 0.512821, 2150.341604, 72058697861366017),
    (39, 8000, 2, 72, 0.469692, 0.521127, 2313.241175, 361700864190383365),
    (43, 8000, 2, 64, 0.459711, 0.52381, 2220.094542, 72340172838076673),
    (47, 8000, 2, 56, 0.446747, 0.527273, 2306.404398, 72340172838076673),
    (51, 8000, 2, 48, 0.461658, 0.531915, 2346.906088, 144680345676153346),
    (55, 8000, 2, 40, 0.481721, 0.538462, 2388.953185, 72340172838076673),
    (59, 8000, 2, 72, 0.47133, 0.535211, 2292.331885, 361700864190383365),
    (63, 8000, 2, 64, 0.459711, 0.539683, 2220.094542, 72340172838076673),
]


#: (asset_id, sample_rate, n_channels, n_samples, rms, zcr,
#: centroid_hz, fingerprint) over real_flac_asset_rows (r13)
AUDIO_FEATURES_FLAC_EXPECTED = [
    (0, 8000, 1, 400, 0.195707, 0.007519, 498.555718, 4557149413822119743),
    (1, 8000, 2, 480, 0.176883, 0.006263, 587.445205, 4557430888798830398),
    (2, 8000, 1, 560, 0.196541, 0.007156, 446.106493, 6872313121065623391),
    (3, 8000, 2, 640, 0.171444, 0.00939, 302.743405, 8682516213269429886),
    (4, 8000, 1, 720, 0.192273, 0.011127, 405.613939, 8681953263416671870),
    (5, 8000, 2, 400, 0.174817, 0.010025, 328.99712, 4485372195249274687),
    (6, 8000, 1, 480, 0.196618, 0.012526, 442.679579, 4557430875913928510),
    (7, 8000, 2, 560, 0.177197, 0.005367, 567.966301, 6872316419617283928),
    (8, 8000, 1, 640, 0.197105, 0.00626, 410.977797, 9115141057846148990),
    (9, 8000, 2, 720, 0.170818, 0.008345, 195.855955, 8682516213135212158),
    (10, 8000, 1, 400, 0.197918, 0.007519, 498.821801, 4557430888798764862),
    (11, 8000, 2, 480, 0.171961, 0.010438, 331.755283, 4341258106684587839),
    (12, 8000, 1, 560, 0.191632, 0.012522, 469.101846, 6800258825461915487),
    (13, 8000, 2, 640, 0.172927, 0.010955, 498.629326, 8970177016493013116),
    (14, 8000, 1, 720, 0.195764, 0.005563, 452.13647, 9114859578540850814),
    (15, 8000, 2, 400, 0.17193, 0.007519, 383.906387, 4557430888798830143),
]


def q_frame_sample_y4m(spark, sf_dir):
    # hash-pinned (r12): REAL video frame extraction — the Y4M raw
    # container (BT.601 YUV->RGB, C420/C422/C444/Cmono) — against frozen
    # per-frame digests like the GIF/APNG twins; compressed video keeps
    # the honest raise
    from seqspark.pipeline.multimodal import (
        make_real_y4m_assets, sample_frames)

    assets = make_real_y4m_assets(spark, 16)
    out = sample_frames(assets, n_samples=3, fake=False)
    return out.select(
        "asset_id", "n_frames", "frame_index",
        F.sha2(F.col("frame"), 256).alias("frame_sha"),
    )


def q_frame_sample_apng(spark, sf_dir):
    # hash-pinned (r12): REAL APNG frame extraction — acTL/fcTL/fdAT over
    # the stdlib PNG codec with dispose 0/1/2 and source/over blending —
    # digested against frozen literals like the GIF twin
    from seqspark.pipeline.multimodal import (
        make_real_apng_assets, sample_frames)

    assets = make_real_apng_assets(spark, 16)
    out = sample_frames(assets, n_samples=3, fake=False)
    return out.select(
        "asset_id", "n_frames", "frame_index",
        F.sha2(F.col("frame"), 256).alias("frame_sha"),
    )


#: (asset_id, fingerprint) over real_audio_pair_rows: each
#: signal twice (16-bit PCM at id i, 8-bit re-encode at 1000+i)
AUDIO_PAIR_FP_EXPECTED = [
    (0, -3980961305908428608),
    (1000, -3980961305908428608),
    (1, 3472893997115159216),
    (1001, 3472893997115159216),
    (2, 2894737211004816428),
    (1002, 2894737211004816428),
    (3, 146941769450963650),
    (1003, 146941769450963650),
    (4, 3602881909543284738),
    (1004, 3602881910625415170),
    (5, -4555179054625406776),
    (1005, -4555179054625406776),
    (6, -5570336255781064014),
    (1006, -5570336255781064014),
    (7, 877089273311661096),
    (1007, 877089273311661096),
]


#: frozen PQ codebooks (m=8 subspaces x k=16 centroids x 8 dims):
#: trained ONCE by pq_train(m=8, k=16, iters=5, sample=2048) on the
#: sf0.01 embeddings (id-ordered sample), rounded to 6dp — inputs
#: of the entry, not outputs (the SEMDEDUP_CENTROIDS standing)
PQ_CODEBOOKS = [
    [
        [0.012859, 0.013619, -0.009693, -0.168309, 0.126119, -0.016715, -0.018597, -0.073433],
        [-0.025805, -0.036216, 0.018403, -0.078993, -0.107258, -0.038468, -0.099874, 0.04038],
        [-0.035956, 0.018762, -0.072683, 0.12468, -0.07429, 0.056772, 0.057499, 0.116225],
        [-0.131971, -0.009962, 0.042848, -0.009281, 0.082347, 0.02472, 0.13394, -0.049054],
        [-0.042456, 0.007868, 0.036853, -0.002063, -0.002995, -0.186276, 0.133386, 0.102663],
        [-0.0438, -0.083376, 0.113974, 0.012733, 0.129384, -0.128552, -0.105614, 0.113016],
        [-0.018357, 0.12519, 0.075665, -0.083004, -0.1128, 0.123085, 0.000129, -0.014775],
        [0.209998, 0.003257, 0.063111, -0.044647, -0.031576, -0.048839, 0.03284, 0.072002],
        [-0.079185, -0.178864, -0.00683, -0.020504, 0.002652, 0.11012, -0.111179, 0.072901],
        [0.118378, -0.133206, 0.005464, 0.012723, 0.006899, 0.117573, -0.045236, -0.10373],
        [0.063084, -0.023545, -0.190447, 0.010826, -0.033894, 0.028936, 0.046479, -0.095156],
        [-0.083156, 0.024359, -0.056401, 0.037033, 0.054482, 0.025135, -0.150168, -0.148707],
        [0.003082, 0.012749, 0.104312, 0.01128, 0.141019, 0.189989, -0.176455, 0.001631],
        [0.062907, 0.045705, 0.056701, 0.154362, 0.049436, -0.014768, -0.064279, -0.017743],
        [0.061637, -0.006512, -0.079647, -0.059722, 0.105062, 0.014832, -0.04859, 0.166301],
        [-0.076173, 0.064662, 0.014294, 0.049649, -0.147118, -0.189359, -0.039901, -0.083767],
    ],
    [
        [0.174202, 0.014292, -0.034179, 0.028693, -0.143812, -0.047185, -0.00282, -0.034856],
        [-0.070827, 0.109327, -0.089531, 0.128235, 0.086699, -0.085118, 0.049588, -0.021581],
        [-0.118232, -0.122399, -0.016212, -0.006584, -0.094321, 0.103812, 0.072862, 0.103385],
        [-0.076645, 0.02381, -0.093896, 0.052144, 0.100697, 0.236806, 0.016962, -0.010097],
        [-0.008744, 0.10759, 0.15329, 0.010447, 0.001123, -0.001544, 0.109709, -0.080299],
        [-0.064607, 0.043402, 0.092151, 0.173662, -0.039587, -0.016434, -0.12971, 0.02238],
        [0.020215, 0.233595, 0.024836, 0.021339, -0.082837, 0.126726, -0.004261, -0.018094],
        [-0.068434, -0.113549, 0.060048, -0.04232, -0.092562, -0.03216, 0.076573, -0.153632],
        [0.005775, 0.032519, -0.094892, 0.054506, 0.024285, 0.026938, -0.075873, 0.184311],
        [-0.083913, 0.039549, -0.019805, -0.094875, -0.151051, -0.018739, -0.119449, -0.033255],
        [0.025973, -0.080675, -0.081485, -0.081508, 0.044228, -0.124432, -0.008137, 0.005065],
        [0.047856, 0.019793, 0.065187, -0.135011, 0.089861, 0.076182, -0.092747, 0.046373],
        [0.070243, -0.116911, 0.068911, 0.037073, 0.069384, 0.050195, 0.111039, 0.074085],
        [-0.031163, -0.044603, 0.168388, -0.116047, 0.037851, -0.172222, -0.038475, 0.070504],
        [0.115721, 0.136459, -0.05412, -0.004761, 0.09378, -0.057913, 0.169922, -0.008662],
        [-0.037462, -0.153897, -0.029976, 0.039945, -0.00923, 0.070947, -0.097543, -0.147433],
    ],
    [
        [0.033848, 0.072905, -0.061131, 0.116909, -0.111294, -0.04772, 0.039464, -0.12123],
        [-0.063883, -0.022777, 0.06888, -0.098495, 0.018975, 0.202137, -0.003158, -0.02992],
        [-0.120114, 0.01427, -0.016174, -0.206656, 0.117225, 0.033118, 0.189145, -0.157616],
        [0.025816, -0.084067, -0.111066, 0.087083, 0.118033, -0.031118, -0.072741, 0.011175],
        [-0.037391, 0.204173, -0.029844, -0.00497, 0.050856, 0.080009, -0.051513, 0.007739],
        [0.163054, -0.036941, 0.020476, 0.031753, -0.072245, -0.082213, -0.060399, 0.120985],
        [-0.036611, 0.147881, -0.035381, -0.073235, 0.015761, -0.144577, -0.023912, -0.030263],
        [0.051878, -0.007175, -0.094519, 0.130701, 0.006516, 0.109481, 0.0832, 0.042755],
        [0.025198, -0.065129, 0.126337, 0.063666, 0.0732, -0.020391, 0.114703, -0.008181],
        [-0.006541, 0.043052, 0.032392, -0.081234, -0.011917, 0.068988, 0.100888, 0.234609],
        [0.023316, 0.112049, 0.066049, -0.070346, -0.161042, 0.075513, 0.011096, -0.047282],
        [0.163743, -0.035646, -0.018159, -0.10304, -0.041559, -0.052588, 0.092705, -0.045755],
        [-0.08333, -0.130774, -0.130409, -0.072883, -0.026925, 0.046539, -0.01934, -0.023906],
        [0.068776, 0.059419, 0.086543, -0.038534, 0.134785, -0.009109, -0.010824, -0.227654],
        [-0.022694, -0.068568, 0.114857, 0.014987, 0.043955, -0.054618, -0.140642, 0.042576],
        [-0.159487, 0.003433, 0.018443, 0.08272, -0.047019, -0.057732, 0.016253, -0.000564],
    ],
    [
        [0.040045, 0.179615, 0.126953, 0.022332, 0.03494, 0.023965, 0.000782, 0.160368],
        [0.081063, 0.060074, -0.05877, -0.016866, 0.025826, 0.165471, -0.070227, 0.037855],
        [-0.07452, -0.063046, -0.079238, -0.125672, 0.064449, 0.021883, -0.053716, -0.140252],
        [-0.060253, -0.015038, 0.00668, -0.101365, -0.131132, -0.042812, -0.079328, 0.045248],
        [-0.010574, -0.088836, 0.168465, -0.027419, 0.065512, 0.044147, 0.071017, -0.024196],
        [0.139294, 0.070983, -0.002376, -0.040639, 0.072198, 0.079791, 0.094438, -0.137618],
        [-0.068971, -0.120281, 0.023271, 0.135726, 0.066026, 0.000303, 0.03483, -0.027138],
        [0.061361, -0.103268, -0.096214, -0.012076, -0.048219, 0.049051, 0.130411, 0.093153],
        [-0.071679, 0.149378, 0.013661, -0.042863, 0.035268, -0.245379, 0.059828, -0.032684],
        [0.009275, -0.090184, -0.104053, 0.099642, -0.076333, -0.089637, 0.016837, -0.144509],
        [0.053024, 0.051235, -0.076668, 0.188581, -0.038065, 0.035438, -0.10822, -0.000366],
        [0.130697, 0.10455, 0.056357, 0.01124, -0.107829, -0.039386, -0.014573, 0.046467],
        [-0.078013, 0.212023, -0.076663, 0.039164, -0.030279, -0.036325, 0.053717, -0.130588],
        [0.042297, -0.02482, 0.022003, 0.026041, 0.087683, -0.127728, -0.076258, 0.073021],
        [-0.189248, 0.05481, -0.026813, -0.009342, 0.058882, 0.094326, -0.060456, 0.041372],
        [-0.079375, -0.000586, 0.01827, 0.029795, -0.146052, -0.013307, 0.161603, -0.083236],
    ],
    [
        [-0.219611, -0.117912, 0.040049, 0.079997, -0.013532, 0.035266, 0.007505, 0.070366],
        [-0.015733, -0.005111, -0.004816, 0.087796, -0.052134, -0.071696, 0.05839, -0.167006],
        [0.054576, 0.016349, -0.062473, 0.178176, 0.093338, 0.019643, 0.114339, 0.045076],
        [0.156577, -0.039246, -0.09603, -0.045837, -0.024052, -0.051027, 0.051478, -0.088362],
        [-0.13945, 0.009977, -0.024384, -0.100454, -0.079119, 0.066591, -0.077657, -0.074534],
        [0.00423, -0.021505, 0.02485, 0.131244, 0.002501, 0.069419, -0.161938, -0.034397],
        [-0.067658, -0.088602, -0.07879, 0.037852, 0.157294, 0.116401, 0.008374, -0.001223],
        [-0.055038, -0.063033, -0.054632, 0.012511, -0.039287, -0.153355, 0.050625, 0.137236],
        [0.003938, -0.055914, 0.156403, -0.035316, 0.093552, -0.023351, 0.083038, -0.059959],
        [-0.028049, -0.011223, 0.084837, 0.0741, -0.240779, -0.045938, 0.13093, 0.036836],
        [0.118475, -0.103619, 0.06165, -0.017, 0.034194, 0.036171, -0.012493, 0.117375],
        [0.007051, -0.131238, -0.079092, -0.098894, 0.052787, -0.115653, -0.140622, 0.010402],
        [0.014418, 0.105849, -0.059404, -0.028026, -0.072149, 0.067264, -0.009301, 0.132005],
        [0.084996, 0.113769, 0.09888, -0.003029, -0.017754, 0.181662, 0.038372, -0.013476],
        [0.071206, 0.146179, 0.024994, 0.039407, 0.06761, -0.137123, -0.126528, -0.049537],
        [0.030529, 0.018843, 0.04855, -0.192431, -0.075457, -0.082229, 0.104247, -0.032014],
    ],
    [
        [0.002852, 0.010014, -0.07021, 0.055924, -0.022896, 0.159912, 0.080954, -0.083579],
        [0.042129, -0.069252, 0.198499, 0.017111, 0.066201, 0.038426, -0.005562, -0.114882],
        [0.01972, -0.004294, 0.118267, 0.05431, -0.170302, 0.091637, -0.115529, -0.054477],
        [-0.053684, -0.087066, -0.08662, 0.048206, 0.105641, 0.071414, -0.085249, -0.029715],
        [-0.020099, 0.068091, -0.143058, -0.057941, 0.002669, 0.001236, -0.108336, 0.15629],
        [-0.055283, 0.101917, -0.123549, 0.035877, -0.147587, -0.053818, 0.055551, 0.035577],
        [0.170194, -0.065908, -0.009938, -0.074605, 0.025034, 0.076299, 0.056576, 0.124702],
        [-0.109898, -0.109096, 0.039789, 0.077468, -0.037661, 0.03411, 0.032448, 0.120379],
        [-0.052391, -0.065577, -0.066477, 0.017999, 0.087285, -0.074533, 0.112522, -0.088459],
        [0.13041, 0.088412, 0.101304, 0.064038, -0.113562, -0.008641, 0.100006, -0.110084],
        [0.005098, -0.196287, -0.032998, -0.10405, -0.055511, -0.064745, 0.033038, -0.057053],
        [0.077638, 0.011678, -0.014125, -0.14532, 0.053843, -0.082911, -0.11191, -0.011856],
        [0.065174, 0.01885, -0.023906, 0.155192, 0.038911, -0.061727, -0.046609, 0.054568],
        [-0.101383, -0.006019, -0.026026, -0.131029, -0.109549, 0.017463, -0.103174, -0.014827],
        [-0.058994, 0.075377, 0.105589, -0.048408, -0.062816, -0.187219, 0.033567, 0.003412],
        [-0.063586, 0.182082, 0.042206, -0.049822, 0.107185, 0.003279, 0.074648, 0.100103],
    ],
    [
        [0.032525, -0.15025, -0.061239, 0.126997, 0.075919, -0.07476, 0.057948, -0.0191],
        [-0.031354, -0.178971, 0.057618, 0.015762, 0.001921, 0.089924, 0.015072, 0.125012],
        [0.056591, 0.034604, 0.107531, -0.080725, -0.000281, -0.090885, 0.121376, 0.205488],
        [0.227353, -0.185555, -0.003138, -0.055173, 0.011197, 0.094963, -0.09523, 0.02063],
        [-0.068162, -0.021611, 0.032543, 0.029188, 0.012146, 0.160785, 0.101248, -0.021046],
        [-0.003578, -0.005035, 0.103302, 0.013616, -0.03202, 0.055851, -0.137477, -0.175354],
        [0.036029, 0.017196, -0.111384, 0.101533, -0.015798, -0.014872, -0.024826, 0.123274],
        [-0.033766, 0.002747, 0.152092, 0.083561, 0.03631, -0.061626, -0.060876, 0.090797],
        [-0.151284, 0.040178, -0.037483, 0.099727, -0.163326, 0.058131, -0.024172, -0.095999],
        [0.070823, -0.060535, 0.0915, -0.130154, -0.147485, 0.021682, -0.029406, 0.030668],
        [0.092103, 0.151705, 0.088958, -0.032658, 0.085686, -0.021835, -0.00514, -0.039433],
        [0.078677, 0.049625, -0.107457, -0.125481, 0.015659, 0.049343, 0.104918, 0.006821],
        [-0.116733, 0.00045, -0.019703, -0.02486, 0.168735, -0.000666, -0.069751, -0.007945],
        [-0.12255, -0.112454, -0.096459, -0.069707, -0.055328, -0.067266, -0.052903, -0.010974],
        [-0.066112, 0.010196, 0.073421, 0.086879, 0.017349, -0.090967, 0.144675, -0.02499],
        [0.040118, 0.027689, -0.030081, -0.06691, -0.024911, -0.154892, -0.034067, -0.121635],
    ],
    [
        [-0.020601, -0.100702, -0.109734, -0.073984, -0.073384, -0.045013, 0.07533, -0.168375],
        [0.043057, -0.064547, -0.00229, 0.094902, -0.098467, 0.045241, -0.087893, -0.08793],
        [0.062848, -0.088374, -0.000322, 0.098482, 0.022767, 0.160051, 0.076112, 0.003017],
        [-0.082587, -0.062345, -0.041423, -0.136568, 0.104758, -0.043956, -0.033367, -0.05208],
        [0.090478, -0.124654, -0.013652, -0.079244, -0.017054, 0.00186, 0.079122, 0.106241],
        [-0.021266, 0.074724, -0.000883, 0.02025, -0.165596, 0.041928, -0.049922, 0.091756],
        [-0.10972, 0.035538, 0.000391, 0.026153, 0.068618, 0.001233, 0.175576, 0.026525],
        [-0.000388, 0.13845, -0.171764, -0.082166, 0.009415, 0.049212, -0.069278, -0.083467],
        [-0.110403, 0.04984, 0.095041, -0.099318, -0.07662, -0.114995, 0.033396, 0.030437],
        [0.022187, 0.025446, 0.040997, -0.141332, 0.003586, 0.135214, -0.006411, -0.026025],
        [0.144982, 0.059397, 0.019014, 0.032246, 0.109379, -0.120277, -0.034754, 0.050478],
        [-0.035263, 0.108075, -0.091067, 0.00617, 0.127725, 0.022109, -0.075716, 0.180495],
        [0.031842, -0.058302, 0.182221, -0.015982, 0.097894, 0.067066, -0.110174, -0.092326],
        [-0.128308, 0.037415, 0.034043, 0.138463, 0.053611, -0.002425, -0.123772, -0.028069],
        [0.001126, -0.00488, -0.182643, 0.103306, 0.013413, -0.091941, 0.082699, 0.004194],
        [0.059142, 0.086522, 0.132134, 0.054755, -0.076822, -0.049169, -0.007578, -0.131976],
    ],
]



#: frozen unigram-LM vocabulary: trained ONCE by train_unigram(
#: vocab_size=400, vocab_k=4000, seed_size=2000, em_iters=2) on the
#: sf0.01 documents; (piece, logp@6dp) — inputs of the entry, the
#: SEMDEDUP_CENTROIDS standing
UNIGRAM_PIECES = [
    ('join', -3.338593),
    ('hash', -3.356386),
    ('row', -3.360618),
    ('batch', -3.367001),
    ('scan', -3.368069),
    ('column', -3.370208),
    ('customer', -3.370208),
    ('filter', -3.37128),
    ('small', -3.376653),
    ('merge', -3.387487),
    ('slow', -3.387487),
    ('order', -3.394045),
    ('vector', -3.394045),
    ('line', -3.39624),
    ('table', -3.39844),
    ('data', -3.398442),
    ('agg', -3.406181),
    ('value', -3.410629),
    ('key', -3.411744),
    ('stream', -3.420713),
    ('window', -3.422968),
    ('a', -3.42976),
    ('spark', -3.429763),
    ('group', -3.432038),
    ('part', -3.432038),
    ('big', -3.434319),
    ('sort', -3.438895),
    ('query', -3.440043),
    ('fast', -3.459754),
    ('the', -3.476283),
    ('dup', -6.951588),
    ('dat', -17.006816),
    ('gg', -17.014555),
    ('b', -24.025195),
    ('c', -24.025195),
    ('d', -24.025195),
    ('e', -24.025195),
    ('f', -24.025195),
    ('g', -24.025195),
    ('h', -24.025195),
    ('i', -24.025195),
    ('j', -24.025195),
    ('k', -24.025195),
    ('l', -24.025195),
    ('m', -24.025195),
    ('n', -24.025195),
    ('o', -24.025195),
    ('p', -24.025195),
    ('q', -24.025195),
    ('r', -24.025195),
    ('s', -24.025195),
    ('t', -24.025195),
    ('u', -24.025195),
    ('v', -24.025195),
    ('w', -24.025195),
    ('y', -24.025195),
    ('ab', -37.840706),
    ('abl', -37.840706),
    ('able', -37.840706),
    ('ag', -37.840706),
    ('al', -37.840706),
    ('all', -37.840706),
    ('alu', -37.840706),
    ('alue', -37.840706),
    ('am', -37.840706),
    ('an', -37.840706),
    ('ar', -37.840706),
    ('ark', -37.840706),
    ('art', -37.840706),
    ('as', -37.840706),
    ('ash', -37.840706),
    ('ast', -37.840706),
    ('at', -37.840706),
    ('ata', -37.840706),
    ('atc', -37.840706),
    ('atch', -37.840706),
    ('ba', -37.840706),
    ('bat', -37.840706),
    ('batc', -37.840706),
    ('bi', -37.840706),
    ('bl', -37.840706),
    ('ble', -37.840706),
    ('ca', -37.840706),
    ('can', -37.840706),
    ('ch', -37.840706),
    ('co', -37.840706),
    ('col', -37.840706),
    ('colu', -37.840706),
    ('colum', -37.840706),
    ('ct', -37.840706),
    ('cto', -37.840706),
    ('ctor', -37.840706),
    ('cu', -37.840706),
    ('cus', -37.840706),
    ('cust', -37.840706),
    ('custo', -37.840706),
    ('custom', -37.840706),
    ('custome', -37.840706),
    ('da', -37.840706),
    ('de', -37.840706),
    ('der', -37.840706),
    ('do', -37.840706),
    ('dow', -37.840706),
    ('du', -37.840706),
    ('ea', -37.840706),
    ('eam', -37.840706),
    ('ec', -37.840706),
    ('ect', -37.840706),
    ('ecto', -37.840706),
    ('ector', -37.840706),
    ('er', -37.840706),
    ('erg', -37.840706),
    ('erge', -37.840706),
    ('ery', -37.840706),
    ('ey', -37.840706),
    ('fa', -37.840706),
    ('fas', -37.840706),
    ('fi', -37.840706),
    ('fil', -37.840706),
    ('filt', -37.840706),
    ('filte', -37.840706),
    ('ge', -37.840706),
    ('gr', -37.840706),
    ('gro', -37.840706),
    ('grou', -37.840706),
    ('ha', -37.840706),
    ('has', -37.840706),
    ('he', -37.840706),
    ('ig', -37.840706),
    ('il', -37.840706),
    ('ilt', -37.840706),
    ('ilte', -37.840706),
    ('ilter', -37.840706),
    ('in', -37.840706),
    ('ind', -37.840706),
    ('indo', -37.840706),
    ('indow', -37.840706),
    ('ine', -37.840706),
    ('jo', -37.840706),
    ('joi', -37.840706),
    ('ke', -37.840706),
    ('le', -37.840706),
    ('li', -37.840706),
    ('lin', -37.840706),
    ('ll', -37.840706),
    ('lo', -37.840706),
    ('low', -37.840706),
    ('lt', -37.840706),
    ('lte', -37.840706),
    ('lter', -37.840706),
    ('lu', -37.840706),
    ('lue', -37.840706),
    ('lum', -37.840706),
    ('lumn', -37.840706),
    ('ma', -37.840706),
    ('mal', -37.840706),
    ('mall', -37.840706),
    ('me', -37.840706),
    ('mer', -37.840706),
    ('merg', -37.840706),
    ('mn', -37.840706),
    ('nd', -37.840706),
    ('ndo', -37.840706),
    ('ndow', -37.840706),
    ('ne', -37.840706),
    ('oi', -37.840706),
    ('oin', -37.840706),
    ('ol', -37.840706),
    ('olu', -37.840706),
    ('olum', -37.840706),
    ('olumn', -37.840706),
    ('om', -37.840706),
    ('ome', -37.840706),
    ('omer', -37.840706),
    ('or', -37.840706),
    ('ord', -37.840706),
    ('orde', -37.840706),
    ('ort', -37.840706),
    ('ou', -37.840706),
    ('oup', -37.840706),
    ('ow', -37.840706),
    ('pa', -37.840706),
    ('par', -37.840706),
    ('park', -37.840706),
    ('qu', -37.840706),
    ('que', -37.840706),
    ('quer', -37.840706),
    ('rd', -37.840706),
    ('rde', -37.840706),
    ('rder', -37.840706),
    ('re', -37.840706),
    ('rea', -37.840706),
    ('ream', -37.840706),
    ('rg', -37.840706),
    ('rge', -37.840706),
    ('rk', -37.840706),
    ('ro', -37.840706),
    ('rou', -37.840706),
    ('roup', -37.840706),
    ('rt', -37.840706),
    ('ry', -37.840706),
    ('sc', -37.840706),
    ('sca', -37.840706),
    ('sh', -37.840706),
    ('sl', -37.840706),
    ('slo', -37.840706),
    ('sm', -37.840706),
    ('sma', -37.840706),
    ('smal', -37.840706),
    ('so', -37.840706),
    ('sor', -37.840706),
    ('sp', -37.840706),
    ('spa', -37.840706),
    ('spar', -37.840706),
    ('st', -37.840706),
    ('sto', -37.840706),
    ('stom', -37.840706),
    ('stome', -37.840706),
    ('stomer', -37.840706),
    ('str', -37.840706),
    ('stre', -37.840706),
    ('strea', -37.840706),
    ('ta', -37.840706),
    ('tab', -37.840706),
    ('tabl', -37.840706),
    ('tc', -37.840706),
    ('tch', -37.840706),
    ('te', -37.840706),
    ('ter', -37.840706),
    ('th', -37.840706),
    ('to', -37.840706),
    ('tom', -37.840706),
    ('tome', -37.840706),
    ('tomer', -37.840706),
    ('tor', -37.840706),
    ('tr', -37.840706),
    ('tre', -37.840706),
    ('trea', -37.840706),
    ('tream', -37.840706),
    ('ue', -37.840706),
    ('uer', -37.840706),
    ('uery', -37.840706),
    ('um', -37.840706),
    ('umn', -37.840706),
    ('up', -37.840706),
    ('us', -37.840706),
    ('ust', -37.840706),
    ('usto', -37.840706),
    ('ustom', -37.840706),
    ('ustome', -37.840706),
    ('ustomer', -37.840706),
    ('va', -37.840706),
    ('val', -37.840706),
    ('valu', -37.840706),
    ('ve', -37.840706),
    ('vec', -37.840706),
    ('vect', -37.840706),
    ('vecto', -37.840706),
    ('wi', -37.840706),
    ('win', -37.840706),
    ('wind', -37.840706),
    ('windo', -37.840706),
]


#: the unigram contract entry's fixture corpus — literal docs, so
#: (NULL-text docs stay out of the CONTRACT fixture — DuckDB's
#: pandas bridge renders a NULL BIGINT as NaN, which the checker
#: cannot distinguish from a real NaN; NULL semantics are pinned by
#: the pytest parity suite instead)
#: the frozen segmentation map below is closed over its words at
#: ANY scale factor (the entry is corpus-independent by design)
UNIGRAM_FIXTURE_DOCS = [
    (1, 'the hash join scans every row group in the partitioned table'),
    (2, 'broadcast joins skip the shuffle when one side is small'),
    (3, 'Tokenization and tokenizers: internationalization-ready!'),
    (4, 'ZZZ unknowns: qwxyzzy 42 rows'),
    (5, 'the the the the'),
    (6, ''),
    (8, 'predicate pushdown prunes partitions before any scan happens'),
]

#: frozen Viterbi segmentations of every fixture word under
#: UNIGRAM_PIECES — generated ONCE and committed, so a Viterbi or
#: trainer regression FAILS the contract instead of moving the
#: oracle (the frozen-digest principle)
UNIGRAM_SEG = [
    ('42', ['4', '2']),
    ('and', ['a', 'nd']),
    ('any', ['a', 'n', 'y']),
    ('before', ['b', 'e', 'f', 'o', 're']),
    ('broadcast', ['b', 'ro', 'a', 'd', 'c', 'ast']),
    ('every', ['e', 'v', 'ery']),
    ('group', ['group']),
    ('happens', ['h', 'a', 'p', 'p', 'e', 'n', 's']),
    ('hash', ['hash']),
    ('in', ['in']),
    ('internationalization', ['in', 'ter', 'n', 'a', 't', 'i', 'o', 'n', 'a', 'li', 'z', 'a', 't', 'i', 'o', 'n']),
    ('is', ['i', 's']),
    ('join', ['join']),
    ('joins', ['join', 's']),
    ('one', ['o', 'ne']),
    ('partitioned', ['part', 'i', 't', 'i', 'o', 'ne', 'd']),
    ('partitions', ['part', 'i', 't', 'i', 'o', 'n', 's']),
    ('predicate', ['p', 're', 'd', 'i', 'c', 'a', 'te']),
    ('prunes', ['p', 'r', 'u', 'ne', 's']),
    ('pushdown', ['p', 'us', 'h', 'dow', 'n']),
    ('qwxyzzy', ['q', 'w', 'x', 'y', 'z', 'z', 'y']),
    ('ready', ['rea', 'd', 'y']),
    ('row', ['row']),
    ('rows', ['row', 's']),
    ('scan', ['scan']),
    ('scans', ['scan', 's']),
    ('shuffle', ['sh', 'u', 'f', 'f', 'le']),
    ('side', ['s', 'i', 'de']),
    ('skip', ['s', 'k', 'i', 'p']),
    ('small', ['small']),
    ('table', ['table']),
    ('the', ['the']),
    ('tokenization', ['to', 'ke', 'n', 'i', 'z', 'a', 't', 'i', 'o', 'n']),
    ('tokenizers', ['to', 'ke', 'n', 'i', 'z', 'er', 's']),
    ('unknowns', ['u', 'n', 'k', 'n', 'ow', 'n', 's']),
    ('when', ['w', 'he', 'n']),
    ('zzz', ['z', 'z', 'z']),
]


#: frozen SAMPLED segmentations (k=4, seed=7, alpha=0.2) of every
#: fixture word — subword regularization's variant table; the
#: oracle replays the per-occurrence md5 pick against these
UNIGRAM_VARIANTS = [
    ('42', [['4', '2'], ['4', '2'], ['4', '2'], ['4', '2']]),
    ('and', [['a', 'nd'], ['a', 'nd'], ['a', 'nd'], ['a', 'nd']]),
    ('any', [['a', 'n', 'y'], ['a', 'n', 'y'], ['a', 'n', 'y'], ['a', 'n', 'y']]),
    ('before', [['b', 'e', 'f', 'or', 'e'], ['b', 'e', 'f', 'o', 're'], ['b', 'e', 'f', 'or', 'e'], ['b', 'e', 'f', 'or', 'e']]),
    ('broadcast', [['b', 'ro', 'a', 'd', 'c', 'a', 'st'], ['b', 'ro', 'a', 'd', 'c', 'ast'], ['b', 'ro', 'a', 'd', 'c', 'ast'], ['b', 'ro', 'a', 'd', 'c', 'ast']]),
    ('every', [['e', 'v', 'ery'], ['e', 'v', 'ery'], ['e', 've', 'ry'], ['e', 'v', 'ery']]),
    ('group', [['group'], ['group'], ['group'], ['group']]),
    ('happens', [['h', 'a', 'p', 'p', 'e', 'n', 's'], ['h', 'a', 'p', 'p', 'e', 'n', 's'], ['h', 'a', 'p', 'p', 'e', 'n', 's'], ['h', 'a', 'p', 'p', 'e', 'n', 's']]),
    ('hash', [['hash'], ['hash'], ['hash'], ['hash']]),
    ('in', [['in'], ['in'], ['in'], ['in']]),
    ('internationalization', [['in', 'ter', 'n', 'at', 'i', 'o', 'n', 'a', 'li', 'z', 'a', 't', 'i', 'o', 'n'], ['in', 'ter', 'n', 'a', 't', 'i', 'o', 'n', 'a', 'li', 'z', 'a', 't', 'i', 'o', 'n'], ['in', 'ter', 'n', 'a', 't', 'i', 'o', 'n', 'a', 'li', 'z', 'a', 't', 'i', 'o', 'n'], ['in', 'ter', 'n', 'a', 't', 'i', 'o', 'n', 'a', 'li', 'z', 'at', 'i', 'o', 'n']]),
    ('is', [['i', 's'], ['i', 's'], ['i', 's'], ['i', 's']]),
    ('join', [['join'], ['join'], ['join'], ['join']]),
    ('joins', [['join', 's'], ['join', 's'], ['join', 's'], ['join', 's']]),
    ('one', [['o', 'ne'], ['o', 'ne'], ['o', 'ne'], ['o', 'ne']]),
    ('partitioned', [['part', 'i', 't', 'i', 'o', 'ne', 'd'], ['part', 'i', 't', 'i', 'o', 'n', 'e', 'd'], ['part', 'i', 't', 'i', 'o', 'ne', 'd'], ['part', 'i', 't', 'i', 'o', 'ne', 'd']]),
    ('partitions', [['part', 'i', 't', 'i', 'o', 'n', 's'], ['part', 'i', 't', 'i', 'o', 'n', 's'], ['part', 'i', 't', 'i', 'o', 'n', 's'], ['part', 'i', 't', 'i', 'o', 'n', 's']]),
    ('predicate', [['p', 're', 'd', 'i', 'c', 'a', 'te'], ['p', 're', 'd', 'i', 'c', 'at', 'e'], ['p', 're', 'd', 'i', 'c', 'a', 'te'], ['p', 're', 'd', 'i', 'c', 'a', 'te']]),
    ('prunes', [['p', 'r', 'u', 'ne', 's'], ['p', 'r', 'u', 'ne', 's'], ['p', 'r', 'u', 'ne', 's'], ['p', 'r', 'u', 'ne', 's']]),
    ('pushdown', [['p', 'u', 'sh', 'dow', 'n'], ['p', 'u', 'sh', 'dow', 'n'], ['p', 'u', 'sh', 'dow', 'n'], ['p', 'us', 'h', 'dow', 'n']]),
    ('qwxyzzy', [['q', 'w', 'x', 'y', 'z', 'z', 'y'], ['q', 'w', 'x', 'y', 'z', 'z', 'y'], ['q', 'w', 'x', 'y', 'z', 'z', 'y'], ['q', 'w', 'x', 'y', 'z', 'z', 'y']]),
    ('ready', [['rea', 'd', 'y'], ['rea', 'd', 'y'], ['rea', 'd', 'y'], ['rea', 'd', 'y']]),
    ('row', [['row'], ['row'], ['row'], ['row']]),
    ('rows', [['row', 's'], ['row', 's'], ['row', 's'], ['row', 's']]),
    ('scan', [['scan'], ['scan'], ['scan'], ['scan']]),
    ('scans', [['scan', 's'], ['scan', 's'], ['scan', 's'], ['scan', 's']]),
    ('shuffle', [['sh', 'u', 'f', 'f', 'le'], ['sh', 'u', 'f', 'f', 'le'], ['sh', 'u', 'f', 'f', 'le'], ['sh', 'u', 'f', 'f', 'le']]),
    ('side', [['s', 'i', 'de'], ['s', 'i', 'de'], ['s', 'i', 'de'], ['s', 'i', 'de']]),
    ('skip', [['s', 'k', 'i', 'p'], ['s', 'k', 'i', 'p'], ['s', 'k', 'i', 'p'], ['s', 'k', 'i', 'p']]),
    ('small', [['small'], ['small'], ['small'], ['small']]),
    ('table', [['table'], ['table'], ['table'], ['table']]),
    ('the', [['the'], ['the'], ['the'], ['the']]),
    ('tokenization', [['to', 'ke', 'n', 'i', 'z', 'a', 't', 'i', 'o', 'n'], ['to', 'k', 'e', 'n', 'i', 'z', 'a', 't', 'i', 'o', 'n'], ['to', 'k', 'e', 'n', 'i', 'z', 'a', 't', 'i', 'o', 'n'], ['to', 'k', 'e', 'n', 'i', 'z', 'a', 't', 'i', 'o', 'n']]),
    ('tokenizers', [['to', 'ke', 'n', 'i', 'z', 'er', 's'], ['to', 'k', 'e', 'n', 'i', 'z', 'er', 's'], ['to', 'ke', 'n', 'i', 'z', 'er', 's'], ['to', 'ke', 'n', 'i', 'z', 'e', 'r', 's']]),
    ('unknowns', [['u', 'n', 'k', 'n', 'ow', 'n', 's'], ['u', 'n', 'k', 'n', 'ow', 'n', 's'], ['u', 'n', 'k', 'n', 'ow', 'n', 's'], ['u', 'n', 'k', 'n', 'ow', 'n', 's']]),
    ('when', [['w', 'he', 'n'], ['w', 'h', 'e', 'n'], ['w', 'he', 'n'], ['w', 'h', 'e', 'n']]),
    ('zzz', [['z', 'z', 'z'], ['z', 'z', 'z'], ['z', 'z', 'z'], ['z', 'z', 'z']]),
]


#: frozen per-frame dHashes over the MJPEG (ids 0..7) and Y4M
#: (ids 1000..1007) video fixtures — the keyframe oracle replays
#: the lag-window novelty selection over these literals
FRAME_DHASH_EXPECTED = [
    (0, 2, 0, 0),
    (0, 2, 1, 0),
    (1, 3, 0, 0),
    (1, 3, 1, 0),
    (1, 3, 2, 0),
    (2, 4, 0, 0),
    (2, 4, 1, 0),
    (2, 4, 2, 0),
    (2, 4, 3, -3974196938173005632),
    (3, 5, 0, 0),
    (3, 5, 1, 0),
    (3, 5, 2, 0),
    (3, 5, 3, 871499719992410112),
    (3, 5, 4, 6944656592472335980),
    (4, 2, 0, 0),
    (4, 2, 1, 0),
    (5, 3, 0, 0),
    (5, 3, 1, 0),
    (5, 3, 2, -4557501533498867584),
    (6, 4, 0, 0),
    (6, 4, 1, 0),
    (6, 4, 2, 0),
    (6, 4, 3, -2814502511195406144),
    (7, 5, 0, 0),
    (7, 5, 1, 0),
    (7, 5, 2, -4575515932008349568),
    (7, 5, 3, 3690203156701016304),
    (7, 5, 4, 434041037028460295),
    (1000, 2, 0, 41095973674549394),
    (1000, 2, 1, 41095973674549394),
    (1001, 3, 0, 36170084271554688),
    (1001, 3, 1, 36170084271554688),
    (1001, 3, 2, 36170084271554688),
    (1002, 4, 0, 0),
    (1002, 4, 1, 0),
    (1002, 4, 2, 0),
    (1002, 4, 3, 0),
    (1003, 5, 0, 41256502372242066),
    (1003, 5, 1, 41256502372242066),
    (1003, 5, 2, 41256502372242066),
    (1003, 5, 3, 41256502372242066),
    (1003, 5, 4, 41256502372242066),
    (1004, 2, 0, 36029346783166592),
    (1004, 2, 1, 36029346783166592),
    (1005, 3, 0, 0),
    (1005, 3, 1, 0),
    (1005, 3, 2, 0),
    (1006, 4, 0, 41095973674549394),
    (1006, 4, 1, 41095973674549394),
    (1006, 4, 2, 41095973674549394),
    (1006, 4, 3, 41095973674549394),
    (1007, 5, 0, 36170084271554688),
    (1007, 5, 1, 36170084271554688),
    (1007, 5, 2, 36170084271554688),
    (1007, 5, 3, 36170084271554688),
    (1007, 5, 4, 54114114036859008),
]


def q_video_keyframes(spark, sf_dir):
    # hash-pinned (r12b): scene-change key-frame selection — one Python
    # crossing computes per-frame dHashes (decode once per asset), then
    # the selection is PURE CATALYST: novelty = bit_count(dhash XOR
    # lag(dhash)) per asset, frame 0 always kept, top-(k-1) by novelty.
    # The oracle freezes the per-frame hashes and replays the window SQL
    # in DuckDB.
    from pyspark.sql import functions as FF

    from seqspark.pipeline.multimodal import (
        frame_dhashes, keyframes, make_real_mjpeg_assets,
        make_real_y4m_assets)

    mj = make_real_mjpeg_assets(spark, 8)
    y4 = make_real_y4m_assets(spark, 8).withColumn(
        "asset_id", FF.col("asset_id") + 1000)
    fdh = frame_dhashes(mj.unionByName(y4), fake=False)
    return keyframes(fdh, k=3)


def q_unigram_sample_encode(spark, sf_dir):
    # hash-pinned (r12b): subword REGULARIZATION — each word occurrence
    # draws one of k sampled segmentations (forward-filtering backward-
    # sampling from P(seg)^alpha, frozen as variant literals); the
    # per-occurrence pick is a PORTABLE md5 hash of (doc_id, pos, seed)
    # in pure Catalyst, so the oracle replays the exact variant choice
    from seqspark.pipeline.unigram import unigram_encoded_sampled

    docs = spark.createDataFrame(
        UNIGRAM_FIXTURE_DOCS, "doc_id long, text string")
    return unigram_encoded_sampled(
        docs, UNIGRAM_PIECES, k=4, seed=7, alpha=0.2)


def q_unigram_encode(spark, sf_dir):
    # hash-pinned (r12b): the SECOND tokenizer family — unigram-LM
    # (SentencePiece-style): EM-trained piece vocabulary (frozen as
    # literals), Viterbi segmentation of each DISTINCT word once
    # driver-side, broadcast dictionary join + in-order reassembly (the
    # BPE dict path's plan). The fixture corpus is literal, so the
    # frozen segmentation map is closed over its words at any sf; the
    # oracle replays the word split + dictionary join + reassembly in
    # DuckDB against the frozen map.
    from seqspark.pipeline.unigram import unigram_encoded

    docs = spark.createDataFrame(
        UNIGRAM_FIXTURE_DOCS, "doc_id long, text string")
    return unigram_encoded(docs, UNIGRAM_PIECES)


def q_ann_pq_batch(spark, sf_dir):
    # hash-pinned (r12b): batched ADC — a literal query SET scored in ONE
    # pass over the codes (m numpy gathers per Arrow batch, running
    # per-query bottom-k, window merge); every row must be bit-identical
    # to single-query pq_topk, so the oracle is the UNION of per-query
    # replays
    from seqspark.pipeline.ann import pq_batch_topk, pq_encode

    emb = load_table(spark, sf_dir, "embeddings")
    codes = pq_encode(emb, PQ_CODEBOOKS)
    queries = spark.createDataFrame(
        [(0, PQ_QUERY), (1, SEMDEDUP_CENTROIDS[1])],
        "query_id int, query_vec array<double>",
    )
    return pq_batch_topk(codes, queries, PQ_CODEBOOKS, k=10)


def q_ann_pq_rerank(spark, sf_dir):
    # hash-pinned (r12b): the production IVF-PQ pattern — ADC shortlist
    # over 64x-compressed codes, exact squared-L2 re-rank of only the
    # broadcast-shortlisted raw vectors (recall@10 0.52 -> 0.97 measured,
    # BASELINE.md). Oracle replays shortlist + rerank with the identical
    # sequential 64-term float sum.
    from seqspark.pipeline.ann import pq_encode, pq_rerank_topk

    emb = load_table(spark, sf_dir, "embeddings")
    codes = pq_encode(emb, PQ_CODEBOOKS)
    out = pq_rerank_topk(codes, emb, PQ_CODEBOOKS, PQ_QUERY, k=10)
    return out.select("vec_id", F.round(F.col("d2"), 6).alias("d2"))


def q_ann_pq_topk(spark, sf_dir):
    # hash-pinned (r12b): IVF-PQ's scoring half — vectors encoded to m=8
    # uint8 codes (one numpy GEMM per subspace at ingest), then top-k by
    # ADC entirely in Catalyst: the per-query lookup table is m literal
    # arrays, the score an element_at chain in whole-stage codegen, the
    # top-k a TakeOrderedAndProject. Codebooks are frozen literals
    # (inputs, like SEMDEDUP_CENTROIDS); the oracle replays encode + ADC
    # + top-k in DuckDB with the same 6dp-before-argmin discipline.
    from seqspark.pipeline.ann import pq_encode, pq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    codes = pq_encode(emb, PQ_CODEBOOKS)
    return pq_topk(codes, PQ_CODEBOOKS, PQ_QUERY, k=10)


def q_audio_dupes(spark, sf_dir):
    # hash-pinned (r12b): near-duplicate AUDIO via the spectral
    # fingerprint — each fixture signal appears as 16-bit PCM and as an
    # 8-bit re-encode (different bytes, same sound); the banded Hamming
    # join must pair them. Oracle freezes the per-asset fingerprints and
    # replays the pair semantics brute-force in DuckDB (pigeonhole
    # banding is exact) — the image_dhash_dupes discipline on audio
    from seqspark.pipeline.dedup import hamming_dupes
    from seqspark.pipeline.multimodal import (
        audio_features, make_real_audio_pair_assets)

    assets = make_real_audio_pair_assets(spark, 8)
    feats = audio_features(assets, fake=False).select(
        "asset_id", F.col("fingerprint").alias("fp"))
    return hamming_dupes(feats, "asset_id", "fp", max_distance=3)


def q_audio_features(spark, sf_dir):
    # hash-pinned (r12b): audio DSP features over the WAV rows of the
    # real-codec fixture — RMS / zero-crossing rate / spectral centroid
    # (6dp-rounded in the kernel) and the 64-bit spectral fingerprint
    # (8 time slices x 9 log bands, per-slice normalized with a 5%
    # noise-floor clamp: bit-depth / gain / stereo-downmix invariant,
    # property-pinned in tests/test_audio.py) — vs frozen literals
    from seqspark.pipeline.multimodal import audio_features, make_real_assets

    assets = make_real_assets(spark, 64)
    return audio_features(assets, fake=False)


def q_audio_features_flac(spark, sf_dir):
    # hash-pinned (r13): the SAME audio DSP kernel over FLAC assets —
    # every sample flows through the stdlib FLAC decoder (Rice
    # residuals, FIXED predictors, mid/side reconstruction on every
    # third stereo asset), so a decoder bug anywhere in that path flips
    # a frozen literal. Real web corpora are FLAC, not WAV — this was
    # the largest honest-raise left in the audio path (r12 verdict #3).
    from seqspark.pipeline.multimodal import (
        audio_features, make_real_flac_assets)

    assets = make_real_flac_assets(spark, 16)
    return audio_features(assets, fake=False)


def q_frame_sample_mjpeg(spark, sf_dir):
    # hash-pinned (r12b): REAL frame extraction from a COMPRESSED video
    # container — MJPEG-in-AVI, each frame an independent baseline JPEG
    # through the stdlib Huffman+IDCT decoder (seqspark/pipeline/jpeg.py)
    # — digested against frozen literals like the GIF/APNG/Y4M siblings;
    # inter-frame codecs keep the honest raise
    from seqspark.pipeline.multimodal import (
        make_real_mjpeg_assets, sample_frames)

    assets = make_real_mjpeg_assets(spark, 12)
    out = sample_frames(assets, n_samples=3, fake=False)
    return out.select(
        "asset_id", "n_frames", "frame_index",
        F.sha2(F.col("frame"), 256).alias("frame_sha"),
    )


def q_multimodal_resize_jpeg(spark, sf_dir):
    # hash-pinned (r12b): stdlib resize over BASELINE JPEG pixels — the
    # r12b Huffman + vectorized-IDCT decoder covering gray/444/422/420,
    # restart intervals, 16-bit DQT and odd dimensions — digests frozen
    # by tools/gen_multimodal_expected.py like the PNG set
    from seqspark.pipeline.multimodal import (
        make_real_jpeg_assets, resize_images)

    assets = make_real_jpeg_assets(spark, 16)
    return resize_images(assets, 32, 16, fake=False, codec="stdlib").select(
        "asset_id",
        F.lower(F.sha2(F.col("content"), 256)).alias("sha256"),
        F.length("content").alias("n_bytes"),
        "width",
        "height",
    )


def q_image_dhash_jpeg(spark, sf_dir):
    # hash-pinned (r12b): perceptual dHash over decoded JPEG rasters —
    # frozen per-asset hash values (a JPEG pixel-path regression moves
    # the luma grid and fails the contract)
    from seqspark.pipeline.multimodal import dhash_images, make_real_jpeg_assets

    assets = make_real_jpeg_assets(spark, 16)
    # project=: only (asset_id, dhash) crosses back from Python — the
    # JPEG bytes never make the return Arrow trip (r12b)
    return dhash_images(assets, fake=False, project=("asset_id",))


def q_frame_sample_gif(spark, sf_dir):
    # hash-pinned (r12): REAL animated-GIF frame extraction — the stdlib
    # LZW decoder + disposal/transparency/interlace compositing — over the
    # deterministic GIF fixture; each selected frame's RGBA-PNG re-encode
    # is digested against literals frozen ONCE by
    # tools/gen_multimodal_expected.py (converting the last honest-raise
    # in sample_frames' real path into hash-checked coverage)
    from seqspark.pipeline.multimodal import (
        make_real_gif_assets, sample_frames)

    assets = make_real_gif_assets(spark, 16)
    out = sample_frames(assets, n_samples=3, fake=False)
    return out.select(
        "asset_id", "n_frames", "frame_index",
        F.sha2(F.col("frame"), 256).alias("frame_sha"),
    )


def q_multimodal_decode(spark, sf_dir):
    # hash-pinned (r11, formerly rows-only): REAL stdlib-codec decode —
    # PNG header parse + WAV meta — over the deterministic real-asset
    # fixture, compared against digests frozen ONCE by
    # tools/gen_multimodal_expected.py (a regression in the decode
    # kernels fails the contract instead of moving the oracle)
    from seqspark.pipeline.multimodal import decode_assets, make_real_assets

    assets = make_real_assets(spark, 64)
    return decode_assets(assets, fake=False).select(
        "asset_id", "media_type", "n_bytes", "sha256", "width", "height", "n_frames"
    )


def q_join_broadcast(spark, sf_dir):
    # beyond-reference: broadcast dim join (orders ⋈ customer) — the pattern
    # every enrichment join should take at 100 TB (no shuffle of the fact side)
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


def q_shipping_priority(spark, sf_dir):
    # TPC-H Q3 shape. Only the true dim (customer, 150k rows/sf1) gets a
    # broadcast hint; orders is a FACT table (1.5M rows/sf1, TB at the 100×
    # target) so its join is left to AQE — at bench sf it still broadcasts,
    # at scale it becomes a shuffle join instead of OOMing executors
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")
    cutoff = F.to_timestamp(F.lit("1995-03-15"))
    return (
        li.filter(F.col("l_shipdate") > cutoff)
        .join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_local_supplier_volume(spark, sf_dir):
    # TPC-H Q5 shape: the true dims (region/nation/customer/supplier)
    # broadcast; orders is a FACT table so its join is left to AQE —
    # broadcast at bench sf, shuffle join at the 100× target where a
    # forced hint would OOM executors
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey")
        )
        .join(
            F.broadcast(cust),
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


def q_lineitem_pricing_summary(spark, sf_dir):
    # TPC-H Q1-shaped scan-heavy aggregate — the bench workhorse
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.to_timestamp(F.lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ------------------------------------------------------------ round-3 entries


def q_complex_search(spark, sf_dir):
    # one filtered scan → total + date histogram + two aggs, stacked into a
    # tagged union (reference `proxyapi/grpc_complex_search.go:14-60`)
    st = _events_table(spark, sf_dir)
    week = 7 * 86400000
    res = st.complex_search(
        "event_type:click or event_type:view",
        size=0,
        with_total=True,
        hist_interval_ms=week,
        aggs=[
            AggQuery(func="count", field="event_type"),
            AggQuery(func="sum", field="value", group_by="event_type"),
        ],
    )
    total = res.total.select(
        F.lit("total").alias("part"),
        F.lit("").alias("name"),
        F.col("total").cast("double").alias("value"),
    )
    hist = res.histogram.select(
        F.lit("hist").alias("part"),
        F.col("bucket_ms").cast("string").alias("name"),
        F.col("cnt").cast("double").alias("value"),
    )
    agg0 = res.aggs[0].select(
        F.lit("count").alias("part"), F.col("name"), F.col("value")
    )
    agg1 = res.aggs[1].select(
        F.lit("sum").alias("part"), F.col("name"), F.round("value", 3).alias("value")
    )
    return total.union(hist).union(agg0).union(agg1)


def q_agg_notexists_bucket(spark, sf_dir):
    # engine-path NotExists: docs whose group token is missing land in the
    # legacy `_not_exists` bucket (`frac/processor/aggregator.go:219-227`)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "maybe_type", F.when(F.col("event_id") % 3 != 0, F.col("event_type"))
    )
    st = SearchTable.from_typed(
        ev,
        {"maybe_type": "keyword", "event_id": "keyword"},
        ts_col="ts",
        rid_col="event_id",
        assume_folded=True,
    )
    out = st.aggregate(AggQuery(func="count", field="maybe_type"))
    return out.select("name", F.col("value").cast("long").alias("cnt"))


def q_agg_sum_notexists(spark, sf_dir):
    # per-group bucket NotExists for field aggs (`aggregator.go:83-87`)
    ev = load_table(spark, sf_dir, "events").withColumn(
        "maybe_val", F.when(F.col("event_id") % 4 != 0, F.col("value"))
    )
    st = SearchTable.from_typed(
        ev,
        {"maybe_val": "keyword", "event_type": "keyword", "event_id": "keyword"},
        ts_col="ts",
        rid_col="event_id",
        assume_folded=True,
    )
    out = st.aggregate(AggQuery(func="sum", field="maybe_val", group_by="event_type"))
    return out.select(
        "name", F.round("value", 3).alias("sum_value"), "not_exists"
    )


def q_agg_unique_total(spark, sf_dir):
    # distinct-count the unique agg exposes as its Total
    st = _events_table(spark, sf_dir)
    out = st.aggregate(AggQuery(func="unique", field="event_type"))
    return out.agg(F.count(F.lit(1)).cast("long").alias("total_unique"))


def q_agg_bucket_order(spark, sf_dir):
    # reference bucket ordering (`seq/qpr.go:216-253`): value DESC, name ASC
    # — materialized as a rank column so the hash compare verifies ORDER
    from pyspark.sql import Window

    st = _events_table(spark, sf_dir)
    out = st.aggregate(AggQuery(func="count", field="event_type"))
    w = Window.orderBy(*SearchTable.bucket_order_cols("count"))
    return out.withColumn("rank", F.row_number().over(w)).select(
        "rank", "name", F.col("value").cast("long").alias("cnt")
    )


def q_keyset_pagination(spark, sf_dir):
    # search-after cursor pagination: strictly after (ts, rid) — the deep-
    # paging path that costs one top-k scan instead of O(offset)
    st = _events_table(spark, sf_dir)
    return _ev_cols(
        st.search_after(
            "*", last_ts_ms=1704412800000, last_rid=5000, size=100, order="asc"
        )
    )


def q_multitype_keyword_title(spark, sf_dir):
    # multi-type field on a typed table: `props` is text by default and
    # keyword through the implicit `props.keyword` title
    # (`seq/mapping.go:125-166`, integration_test.go:1773-1860)
    ev = load_table(spark, sf_dir, "events")
    st = SearchTable.from_typed(
        ev,
        {
            "props": {
                "types": [
                    {"type": "text"},
                    {"title": "keyword", "type": "keyword"},
                ]
            },
            "event_id": "keyword",
        },
        ts_col="ts",
        rid_col="event_id",
        assume_folded=True,
    )
    # wildcard over the WHOLE value (keyword semantics) — a text match
    # could never see the `9}` punctuation sequence; quoted because `}` is
    # not a bare-token rune, with `*` still a wildcard inside quotes
    # (`parser/seqql.go:276-292`)
    return st.search("props.keyword:'*9}*'").select("event_id")


def q_inverted_index_and(spark, sf_dir):
    # SURVEY §7.2: materialized (field, token, id) index; a token-AND query
    # = pruned index scan → group/having → semi-join (posting-list
    # intersection, `node/node_and.go:41-56` / `frac/sealed_index.go:218-266`)
    from seqspark.engine import materialize_tokens
    from seqspark.index import build_inverted_index, search_tokens

    docs = load_table(spark, sf_dir, "documents")
    tok = materialize_tokens(docs, {"text": "text"})
    idx = build_inverted_index(tok, {"text": "__tok_text"}, id_cols=["doc_id"])
    out = search_tokens(docs, idx, "text", ["table", "scan"], id_cols=["doc_id"])
    return out.select("doc_id", "lang", "source")


def q_export_keyset(spark, sf_dir):
    # export-style full ordered drain of a filtered set (size=None)
    st = _events_table(spark, sf_dir)
    return _ev_cols(st.search("event_type:error and value:[40, *]", order="asc"))


def q_pii_scrub(spark, sf_dir):
    # PII masking over synthetic-PII-bearing text (the corpus itself is
    # clean, so plant deterministic emails/IPs per doc)
    from seqspark.pipeline.scrub import pii_scrub

    docs = load_table(spark, sf_dir, "documents")
    dirty = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com at 10.0.0."), (F.col("doc_id") % 256).cast("string"),
    )
    return docs.select("doc_id", pii_scrub(dirty).alias("clean"))


def q_decontaminate(spark, sf_dir):
    # flag corpus docs sharing any 8-gram with a benchmark set (docs 0-19)
    from seqspark.pipeline.scrub import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") < 20).select(
        F.col("text").alias("btext")
    )
    out = decontaminate(docs, bench, "doc_id", "text", "btext", n=8)
    return out.select("doc_id", "contaminated")


def q_repetition_ratio(spark, sf_dir):
    from seqspark.pipeline.scrub import repetition_ratio

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(repetition_ratio(F.col("text"), n=3), 4).alias("rep")
    )


def q_case_sensitive_eq(spark, sf_dir):
    # --case-sensitive mode: no folding at index or query time
    # (`tokenizer/tokenizer.go:15-48` gate)
    ev = load_table(spark, sf_dir, "events")
    st = SearchTable.from_typed(
        ev,
        {"event_type": "keyword", "event_id": "keyword"},
        ts_col="ts",
        rid_col="event_id",
        case_sensitive=True,
    )
    return st.search("event_type:click").select("event_id", "event_type")


def q_corpus_curation(spark, sf_dir):
    # LLM-training-data curation chain: quality gate → exact dedup →
    # per-doc token budget — one declarative plan, no Python in the loop
    from seqspark.pipeline.dedup import exact_dedup
    from seqspark.pipeline.textstats import quality_score, token_count

    docs = load_table(spark, sf_dir, "documents")
    scored = docs.withColumn("q", quality_score(F.col("text"))).filter(
        F.col("q") >= 0.5
    )
    kept = exact_dedup(scored.withColumn("h", F.md5("text")), ["h"], "doc_id")
    return kept.select(
        "doc_id",
        F.round("q", 4).alias("quality"),
        token_count(F.col("text")).cast("long").alias("n_tokens"),
    )


def q_hash_sample(spark, sf_dir):
    # deterministic content-keyed sampling: membership is a pure function
    # of (doc_id, seed) — stable across reruns/repartitions, unlike
    # df.sample (seqspark/pipeline/sampling.py)
    from seqspark.pipeline.sampling import hash_sample

    docs = load_table(spark, sf_dir, "documents")
    return hash_sample(docs, "doc_id", 0.25, seed="v1").select("doc_id", "source")


def q_hash_split(spark, sf_dir):
    # disjoint deterministic train/val/test split from the same hash
    from seqspark.pipeline.sampling import hash_split

    docs = load_table(spark, sf_dir, "documents")
    return hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, seed="v1"
    ).select("doc_id", "split")


def q_train_shuffle(spark, sf_dir):
    # training OUTPUT layout: deterministic global shuffle + fixed shard
    # assignment — (shard, pos) is a pure function of (doc_id, seed), so
    # reruns/repartitions/incremental rebuilds produce the identical
    # layout. One hash-partitioned shuffle, per-shard window rank: no
    # global sort funnel (seqspark/pipeline/sampling.py train_shuffle)
    from seqspark.pipeline.sampling import train_shuffle

    docs = load_table(spark, sf_dir, "documents")
    return train_shuffle(docs, "doc_id", shards=8, seed="v1").select(
        "doc_id", "shard", "pos"
    )


def q_mix_sources(spark, sf_dir):
    # epoch mixing: per-source up/down-weighting by deterministic
    # repetition — weight 2.5 → 2 copies + hash-chosen 50% a third
    from seqspark.pipeline.sampling import mix_sources

    docs = load_table(spark, sf_dir, "documents")
    return mix_sources(
        docs,
        "source",
        {"src0": 2.5, "src1": 2.0, "src2": 0.5, "src3": 0.0},
        key_col="doc_id",
        seed="v1",
    ).select("doc_id", "source", "copy")


def q_embedding_dup_clusters(spark, sf_dir):
    # composition: exact embedding near-dup pairs (the same bounded kernel
    # as embedding_cosine_pairs) -> connected components -> cluster roots;
    # shows embedding dedup and graph labeling compose end-to-end
    from seqspark.pipeline.dedup import dup_clusters

    pairs = q_embedding_cosine_pairs(spark, sf_dir)
    return dup_clusters(pairs).select(
        F.col("id").alias("vec_id"), F.col("root").alias("cluster_root")
    )


def q_multimodal_resize(spark, sf_dir):
    # hash-pinned (r11, formerly rows-only): REAL stdlib nearest-neighbor
    # PNG resize (decode → resample → re-encode), output bytes digested
    # IN-ENGINE (F.sha2 over the binary column) and compared against the
    # frozen expected digests — audio rows drop per on_other='drop'
    from seqspark.pipeline.multimodal import make_real_assets, resize_images

    assets = make_real_assets(spark, 64)
    # codec='stdlib' pins the kernel the frozen digests were generated
    # from — an environment gaining Pillow must not shift the contract
    return resize_images(assets, 32, 16, fake=False, codec="stdlib").select(
        "asset_id",
        F.lower(F.sha2(F.col("content"), 256)).alias("sha256"),
        F.length("content").alias("n_bytes"),
        "width",
        "height",
    )


#: fixed k-means centroids (k=4, dim=64) for the semantic-dedup entries:
#: trained ONCE via `ivf_train(k=4, iters=5)` on the sf0.01 embeddings,
#: rounded to 6 decimals and frozen as literals so the DuckDB oracle can
#: replicate the exact cell assignment (centroids are inputs, not outputs,
#: of SemDeDup-style dedup)
SEMDEDUP_CENTROIDS: list[list[float]] = [
    [0.033493, -0.020694, 0.020575, -0.029421, 0.018005, -0.012202, -0.013685, 0.016735, 0.046333, -0.019294, 0.027382, -0.050595, -0.028354, -0.035077, -0.033433, 0.014992, 0.020965, 0.047931, 0.022585, 0.039306, -0.035204, 0.012499, 0.001258, -0.013402, -0.037954, 0.014519, 0.029393, 0.034704, -0.005512, 0.02856, 0.002477, 0.055549, 0.006289, -0.01476, 0.008219, 0.009777, -0.034968, 0.00374, -0.005019, 0.040447, -0.001016, -0.028123, 0.008404, 0.028389, -0.006417, 0.033034, 0.015913, -0.000636, -0.023682, 0.002282, 0.016692, 0.014679, 0.039796, -0.052296, 0.027627, -0.014513, 0.003416, -0.001111, -0.025128, -0.033078, -0.029792, -0.004926, -0.023516, -0.032204],
    [-0.023607, 0.002035, 0.031498, -0.010068, -0.017604, 0.022323, -0.039918, 0.026526, -0.021199, 0.079815, -0.055989, 0.027718, 0.033003, -0.044653, 0.026257, -0.004664, 0.011041, -0.020246, 0.002886, -0.010216, 0.017778, 0.011819, 0.000543, -0.026992, 0.035869, 0.033793, -0.021592, 0.004533, -0.000531, 0.016636, 0.006151, 0.009759, -0.005063, 0.018737, 0.033127, 0.00425, -0.015879, -0.032559, -0.001087, -0.049307, -0.013274, -0.008386, 0.030975, 0.007542, -0.017674, -0.006888, -0.037751, 0.010071, -0.054993, -0.025741, -0.014282, 0.01933, -0.015865, 0.033191, 0.003753, 0.007921, 0.014469, -0.000662, -0.0025, 0.034269, -0.037721, 0.008029, -0.016919, -0.039698],
    [0.015107, 0.008254, -0.012395, 0.027636, 0.036129, 0.02194, -0.032059, 0.003643, -0.015696, -0.059878, 0.016905, 0.004369, -0.036848, 0.025284, -0.019475, 0.019216, -0.017409, 0.015974, -0.019557, -0.026872, 0.007989, 0.0052, 0.031819, -0.011817, 0.002384, -0.035861, -0.015318, -0.003497, 0.020325, -0.007305, 0.0099, -0.063695, -0.020171, -0.00816, -0.00682, 0.011142, 0.001687, 0.033864, 0.009187, 0.02448, -0.000568, -0.012333, 0.021796, 0.014797, -0.052058, 0.003985, 0.016363, 0.021776, 0.026582, 0.028875, 0.017322, -0.009146, 0.000239, 0.00713, 0.02328, 0.020145, 0.014, -0.020598, -0.02216, 0.014377, 0.033707, -0.004156, 0.043042, 0.043965],
    [-0.018408, -0.009435, -0.021001, -0.011904, -0.000802, -0.002635, 0.014054, -0.008816, -0.01747, 0.006482, 0.034709, 0.031948, 0.026714, 0.058162, 0.028697, -0.007833, 0.001794, -0.021981, -0.004984, 0.006425, -0.007196, -0.020371, -0.020685, 0.019977, -0.007792, 0.045695, 0.00269, 0.008665, -0.021732, -0.03469, 0.003316, -0.016305, 0.055679, -0.021765, -0.011619, -0.021622, 0.026395, -0.016788, -0.008316, -0.024388, 0.007449, 0.001523, -0.061918, -0.054559, 0.035274, -0.014844, 8.1e-05, -0.009684, 0.031694, -0.051884, 0.016212, -0.029142, 0.007579, -0.004628, -0.038092, -0.03078, -0.013773, 0.014923, 0.032572, -0.052624, 0.027062, 0.022264, -0.013611, -0.033439],
]


#: fixed 64-d query for the PQ entry: SEMDEDUP centroid 0 (already a
#: frozen literal input)
PQ_QUERY = SEMDEDUP_CENTROIDS[0]


def _semdedup_rounded_pairs(spark, sf_dir):
    """Within-cell pairs with the cosine ROUNDED to 4dp before the
    threshold, so Spark and the DuckDB oracle apply the identical cut."""
    from seqspark.pipeline.dedup import semantic_dedup_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    return (
        semantic_dedup_pairs(emb, SEMDEDUP_CENTROIDS, threshold=-1.0)
        .withColumn("cos", F.round(F.col("cos"), 4))
        .filter(F.col("cos") >= 0.4)
    )


def q_semantic_dedup_pairs(spark, sf_dir):
    # SemDeDup cells: nearest-centroid assignment, then within-cell pairs
    # only (sum(|cell|^2) pair work, never |corpus|^2)
    return _semdedup_rounded_pairs(spark, sf_dir).select("a", "b", "cell", "cos")


def q_semantic_dedup(spark, sf_dir):
    # survivors under the deterministic min-id keep rule
    emb = load_table(spark, sf_dir, "embeddings")
    losers = (
        _semdedup_rounded_pairs(spark, sf_dir)
        .select(F.col("b").alias("vec_id"))
        .distinct()
    )
    return emb.join(losers, "vec_id", "left_anti").select("vec_id", "label")


def q_span_dedup(spark, sf_dir):
    # corpus-wide duplicated-span removal (k-gram exact-substring dedup):
    # first occurrence by (doc_id, pos) wins, later copies are cut out
    from seqspark.pipeline.dedup import duplicate_span_removal

    docs = load_table(spark, sf_dir, "documents")
    return duplicate_span_removal(docs, k=8).select("doc_id", "clean_text")


def q_fuzzy_contamination(spark, sf_dir):
    # doc-pair word-3-gram Jaccard across a train/test split (fuzzy
    # decontamination), with a document-frequency cap on join keys
    from seqspark.pipeline.scrub import fuzzy_contamination_pairs

    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 2 == 0).withColumnRenamed(
        "doc_id", "train_id"
    )
    test = docs.filter(F.col("doc_id") % 2 == 1).withColumnRenamed(
        "doc_id", "test_id"
    )
    out = fuzzy_contamination_pairs(
        train, test, "train_id", "text", "test_id", "text",
        n=3, threshold=0.4, max_df=100,
    )
    return out.withColumn("jaccard", F.round(F.col("jaccard"), 6))



#: frozen quality-classifier model for the `quality_classifier` entry:
#: trained ONCE via `train_quality_classifier(dim=256)` on the sf0.01
#: documents (label = lang == 'en'; the synthetic corpus shares one
#: vocabulary across langs, so the learned separation is weak — the entry
#: verifies the hashed-feature SCORING machinery, which is the Spark-side
#: deliverable; tests/test_pipeline.py proves learning on separable data)
QC_BIAS = -0.248626
QC_WEIGHTS: list[float] = [
    0.168454, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.094456,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, -0.046585, -0.143228, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    -0.002956, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -0.093176, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, -0.041879, 0.0, 0.0, 0.0,
    0.0, 0.094616, 0.0, -0.062047, 0.0, -0.031478, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -0.037835, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -0.102361,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, -0.027611, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, -0.038594, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.000674,
    0.0, 0.203775, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    -0.038439, 0.0, 0.0, 0.0, 0.0, 0.0, -0.113738, 0.0,
    0.0, 0.0, 0.0, 0.0, -0.154289, 0.0, 0.0, 0.0,
    0.147417, 0.18755, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.167775, 0.0, 0.0, -0.061226, 0.0, 0.0, 0.0,
    0.0, -0.036155, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, -0.070779, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, -0.013573, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, -0.091576, 0.0, 0.0, -0.05994, 0.0, 0.0, 0.0,
    0.0, 0.088965, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
    0.0, 0.0, 0.0, 0.0, 0.0, -0.101048, 0.0, 0.0,
]


def q_quality_classifier(spark, sf_dir):
    # GPT-3-style corpus-quality classifier scoring: pure Catalyst (md5
    # hashed-feature lookup in a literal weight array inside codegen)
    from seqspark.pipeline.textstats import quality_classifier_score

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.round(
            quality_classifier_score(F.col("text"), QC_WEIGHTS, QC_BIAS), 6
        ).alias("quality_p"),
    )



def q_pack_sequences(spark, sf_dir):
    # GPT-style concat-then-chunk packing: per-shard prefix sums place
    # every doc's token span into seq_len-sized training sequences
    from seqspark.pipeline.sampling import pack_sequences
    from seqspark.pipeline.textstats import token_count

    docs = load_table(spark, sf_dir, "documents").withColumn(
        "n_tokens", token_count(F.col("text")).cast("long")
    )
    out = pack_sequences(docs, "doc_id", "n_tokens", seq_len=512, shards=8)
    return out.select(
        "doc_id", "pack_shard", "start_tok", "first_seq", "last_seq"
    )



def q_hamming_dupes(spark, sf_dir):
    # generic Hamming-bounded near-dup join (shared by simhash text
    # sketches and perceptual image dHashes), driven here by a 60-bit
    # md5-prefix hash so the SQL oracle can brute-force the same
    # predicate; duplicate texts surface as distance-0 pairs
    from seqspark.pipeline.dedup import hamming_dupes

    # hash the 2-word prefix (not the whole text — the synthetic corpus
    # has no full-text dups, but ~180 docs share an opening bigram), so
    # shared openings collide at distance 0 and the entry is non-vacuous
    pre = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 2), " ")
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "h", F.conv(F.substring(F.md5(pre), 1, 15), 16, 10).cast("long")
    )
    return hamming_dupes(docs, "doc_id", "h", max_distance=4, bits=60)



def q_hamming_dedup(spark, sf_dir):
    # survivor side of the Hamming near-dup join: same 60-bit prefix hash
    # as `hamming_dupes`, higher-id member of each pair dropped
    from seqspark.pipeline.dedup import hamming_dedup

    pre = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 2), " ")
    docs = load_table(spark, sf_dir, "documents").withColumn(
        "h", F.conv(F.substring(F.md5(pre), 1, 15), 16, 10).cast("long")
    )
    return hamming_dedup(docs, "doc_id", "h", max_distance=4, bits=60).select(
        "doc_id", "h"
    )


def q_image_dhash_dupes(spark, sf_dir):
    # hash-pinned (r11, formerly rows-only): REAL dHash (stdlib PNG
    # raster decode → luma grid → difference bits) over the real-asset
    # fixture plus byte-identical copies under shifted ids, then the
    # exact Hamming-banded pair join. The oracle freezes only the
    # per-asset dHash values (IMAGE_DHASH_EXPECTED) and REPLAYS the pair
    # semantics in DuckDB as brute-force bit_count(xor) over the literal
    # table — pigeonhole banding is exact, so the sets must be equal.
    # Audio rows dhash to NULL and never pair.
    from seqspark.pipeline.dedup import hamming_dupes
    from seqspark.pipeline.multimodal import dhash_images, make_real_assets

    assets = make_real_assets(spark, 48)
    copies = assets.withColumn("asset_id", F.col("asset_id") + 1000)
    hashed = dhash_images(
        assets.unionByName(copies), fake=False, project=("asset_id",)
    )
    return hamming_dupes(hashed, "asset_id", "dhash", max_distance=4)


#: entries that deliberately have no SQL oracle twin. EMPTY since r11:
#: the last three (binary multimodal kernels) moved to hash-green via
#: frozen expected digests over the deterministic real-codec fixture
#: (tools/gen_multimodal_expected.py — the literal-hyperplane trick of
#: r10's LSH conversions, applied to binary outputs). Every contract
#: entry now carries a full rows+schema+hash oracle; tests/test_contract
#: pins queries().keys() == oracle_sql().keys().
ROWS_ONLY = frozenset()


def contract_diagnostics() -> dict[str, Callable[[SparkSession, str], str]]:
    """Optional per-entry failure diagnostics the oracle checker runs when
    an entry MISMATCHes, so an engine-noise artifact is distinguishable
    from a real regression in the failure report. Today: the LSH sketch
    entries' sign parity relies on Spark's sequential float dot and
    DuckDB's list_dot_product agreeing on sign — a dot within rounding
    distance of zero can flip a bit in exactly one engine (advisor r10)."""

    def _lsh_margin(dim: int, bits: int, seed: int):
        def diag(spark: SparkSession, sf_dir: str) -> str:
            from seqspark.pipeline.ann import lsh_sign_margin

            emb = load_table(spark, sf_dir, "embeddings")
            mn, n = lsh_sign_margin(emb, dim=dim, bits=bits, seed=seed)
            return (
                f"lsh sign margin (dim={dim} bits={bits} seed={seed}): "
                f"min |dot|={mn:.3g}, rows within 1e-6 of a sign flip={n} "
                "(n>0 => likely Spark/DuckDB float-order sign flip, "
                "not a regression; n=0 => real divergence)"
            )

        return diag

    return {
        "ann_lsh_topk": _lsh_margin(64, 12, 7),
        "sketch_balanced_sample": _lsh_margin(64, 8, 7),
    }


#: Driver-window rotation (r12): the driver's CORRECTNESS artifact checks
#: the FIRST 50 queries() entries. The r11 window front-loaded the 46
#: entries that had never appeared in any driver artifact; after it ran,
#: only the 3 operators ADDED in r11 (after that window was cut) remained
#: never-driver-checked: `cap_per_group_salted`, `sessionize_bucketed`,
#: `sessionize_scalable`. This window leads with exactly those 3 (plus
#: the same four long-stable canaries), then re-verifies the 43 entries
#: whose last driver-green is OLDEST (r5-r10), so the window doubles as a
#: staleness sweep. After this round every contract entry has been
#: driver-green at least once.
DRIVER_WINDOW = [
    # canaries: stable since r1, keep a cross-round comparison anchor
    "keyword_eq",
    "match_all",
    "agg_count_group",
    "time_range",
    # r13 additions: never driver-checked yet, so they lead the window
    "audio_features_flac",
    # the five entries rotated out in r12 (last driver-green r10) —
    # cycled back per the r12 verdict so no entry goes >2 rounds stale
    "agg_avg_group",
    "agg_max_group",
    "agg_sum_group",
    "agg_timeseries",
    "ann_batch_topk",
    # r12b additions, driver-checked once (r12) — keep one more round
    "audio_features",
    "audio_dupes",
    "ann_pq_topk",
    "ann_pq_rerank",
    "ann_pq_batch",
    "unigram_encode",
    "unigram_sample_encode",
    "video_keyframes",
    # least-recently driver-checked (last seen r5)
    "join_broadcast",
    "lineitem_pricing_summary",
    "multimodal_decode",
    "text_fingerprint",
    "text_quality",
    "text_token_count",
    # last seen r6
    "ann_brute_topk",
    "ann_lsh_topk",
    "embedding_cosine_pairs",
    # last seen r7
    "minhash_lsh_pairs",
    "simhash_candidates",
    # last seen r8
    "dedup_exact",
    "doc_size_tracking",
    "incremental_dedup",
    "ngram_jaccard",
    "paragraph_dedup",
    "timestamp_parse_chain",
    # last seen r9
    "c4_filter",
    "path_prefix_tokens",
    # last seen r10 (agg_avg/max/sum_group, agg_timeseries and
    # ann_batch_topk rotated out to make room for the five r12b entries
    # — the operator families stay covered via agg_min_group/
    # agg_filtered/agg_quantile, date_histogram and ann_brute_topk)
    "agg_filtered",
    "agg_min_group",
    "agg_quantile",
    "agg_unique",
    "bool_not",
    "bool_precedence",
    "exists",
    "fetch_by_ids",
    "fields_pipe",
    "frame_sample_y4m",
    "frame_sample",
    "frame_sample_apng",
    # r12 addition: never driver-checked yet
    "frame_sample_gif",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q = _all_queries()
    ordered = {name: q[name] for name in DRIVER_WINDOW}
    ordered.update((k, v) for k, v in q.items() if k not in ordered)
    return ordered


def _all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "keyword_eq": q_keyword_eq,
        "keyword_eq_native": q_keyword_eq_native,
        "keyword_wildcard": q_keyword_wildcard,
        "filter_in": q_filter_in,
        "range_numeric": q_range_numeric,
        "range_open": q_range_open,
        "range_lexicographic": q_range_lexicographic,
        "exists": q_exists,
        "match_all": q_match_all,
        "bool_precedence": q_bool_precedence,
        "bool_not": q_bool_not,
        "comment_strip": q_comment_strip,
        "time_range": q_time_range,
        "fields_pipe": q_fields_pipe,
        "order_limit_desc": q_order_limit_desc,
        "order_limit_asc": q_order_limit_asc,
        "offset_pagination": q_offset_pagination,
        "merge_dedup": q_merge_dedup,
        "fetch_by_ids": q_fetch_by_ids,
        "store_bloom_fetch": q_store_bloom_fetch,
        "with_total": q_with_total,
        "fulltext_and": q_fulltext_and,
        "fulltext_wildcard": q_fulltext_wildcard,
        "agg_count_group": q_agg_count_group,
        "agg_unique": q_agg_unique,
        "agg_sum_group": q_agg_sum_group,
        "agg_min_group": q_agg_min_group,
        "agg_max_group": q_agg_max_group,
        "agg_avg_group": q_agg_avg_group,
        "agg_filtered": q_agg_filtered,
        "agg_quantile": q_agg_quantile,
        "agg_timeseries": q_agg_timeseries,
        "date_histogram": q_date_histogram,
        "notexists_accounting": q_notexists_accounting,
        "json_field_extract": q_json_field_extract,
        "auto_mapping_search": q_auto_mapping_search,
        "ingest_tokenize": q_ingest_tokenize,
        "index_hot_tokens": q_index_hot_tokens,
        "ann_batch_topk": q_ann_batch_topk,
        "gopher_quality": q_gopher_quality,
        "gopher_repetition": q_gopher_repetition,
        "url_canonical": q_url_canonical,
        "unigram_perplexity": q_unigram_perplexity,
        "dsir_score": q_dsir_score,
        "dsir_resample": q_dsir_resample,
        "html_extract": q_html_extract,
        "bigram_perplexity": q_bigram_perplexity,
        "frame_sample": q_frame_sample,
        "lang_detect": q_lang_detect,
        "token_budget": q_token_budget,
        "c4_filter": q_c4_filter,
        "path_prefix_tokens": q_path_prefix_tokens,
        "timestamp_parse_chain": q_timestamp_parse_chain,
        "doc_size_tracking": q_doc_size_tracking,
        "dedup_exact": q_dedup_exact,
        "incremental_dedup": q_incremental_dedup,
        "paragraph_dedup": q_paragraph_dedup,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "incremental_lsh_dupes": q_incremental_lsh_dupes,
        "simhash_candidates": q_simhash_candidates,
        "ann_brute_topk": q_ann_brute_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "embedding_cosine_pairs": q_embedding_cosine_pairs,
        "text_token_count": q_text_token_count,
        "text_quality": q_text_quality,
        "text_fingerprint": q_text_fingerprint,
        "bpe_encode": q_bpe_encode,
        "bpe_encode_dict": q_bpe_encode_dict,
        "multimodal_decode": q_multimodal_decode,
        "frame_sample_gif": q_frame_sample_gif,
        "frame_sample_apng": q_frame_sample_apng,
        "frame_sample_y4m": q_frame_sample_y4m,
        "frame_sample_mjpeg": q_frame_sample_mjpeg,
        "multimodal_resize_jpeg": q_multimodal_resize_jpeg,
        "image_dhash_jpeg": q_image_dhash_jpeg,
        "audio_features": q_audio_features,
        "audio_features_flac": q_audio_features_flac,
        "audio_dupes": q_audio_dupes,
        "ann_pq_topk": q_ann_pq_topk,
        "ann_pq_rerank": q_ann_pq_rerank,
        "ann_pq_batch": q_ann_pq_batch,
        "unigram_encode": q_unigram_encode,
        "unigram_sample_encode": q_unigram_sample_encode,
        "video_keyframes": q_video_keyframes,
        "join_broadcast": q_join_broadcast,
        "lineitem_pricing_summary": q_lineitem_pricing_summary,
        "complex_search": q_complex_search,
        "agg_notexists_bucket": q_agg_notexists_bucket,
        "agg_sum_notexists": q_agg_sum_notexists,
        "agg_unique_total": q_agg_unique_total,
        "agg_bucket_order": q_agg_bucket_order,
        "keyset_pagination": q_keyset_pagination,
        "multitype_keyword_title": q_multitype_keyword_title,
        "inverted_index_and": q_inverted_index_and,
        "export_keyset": q_export_keyset,
        "corpus_curation": q_corpus_curation,
        "case_sensitive_eq": q_case_sensitive_eq,
        "pii_scrub": q_pii_scrub,
        "decontaminate": q_decontaminate,
        "repetition_ratio": q_repetition_ratio,
        "shipping_priority": q_shipping_priority,
        "local_supplier_volume": q_local_supplier_volume,
        "hash_sample": q_hash_sample,
        "hash_split": q_hash_split,
        "train_shuffle": q_train_shuffle,
        "mix_sources": q_mix_sources,
        "legacy_query": q_legacy_query,
        "legacy_range": q_legacy_range,
        "dup_clusters": q_dup_clusters,
        "stratified_sample": q_stratified_sample,
        "domain_stats": q_domain_stats,
        "cap_per_group": q_cap_per_group,
        "cap_per_group_salted": q_cap_per_group_salted,
        "ivf_update": q_ivf_update,
        "sessionize": q_sessionize,
        "sessionize_scalable": q_sessionize_scalable,
        "sessionize_bucketed": q_sessionize_bucketed,
        "sessionize_native": q_sessionize_native,
        "sketch_balanced_sample": q_sketch_balanced_sample,
        "multimodal_resize": q_multimodal_resize,
        "embedding_dup_clusters": q_embedding_dup_clusters,
        "top_per_group": q_top_per_group,
        "heavy_hitters": q_heavy_hitters,
        "semantic_dedup_pairs": q_semantic_dedup_pairs,
        "semantic_dedup": q_semantic_dedup,
        "span_dedup": q_span_dedup,
        "fuzzy_contamination": q_fuzzy_contamination,
        "quality_classifier": q_quality_classifier,
        "pack_sequences": q_pack_sequences,
        "hamming_dupes": q_hamming_dupes,
        "hamming_dedup": q_hamming_dedup,
        "image_dhash_dupes": q_image_dhash_dupes,
    }


# --------------------------------------------------------------------------
# oracle SQL (DuckDB dialect) — same aliases, same row sets
# --------------------------------------------------------------------------

_EV = "event_id, epoch_us(ts) AS ts_us, user_id, event_type, value"
_TOKS = r"string_split_regex(lower(text), '[^\p{L}\p{N}_*]+')"
_WORDS = r"list_filter(string_split_regex(lower(text), '[^\p{L}\p{N}_]+'), w -> len(w) > 0)"


def oracle_sql() -> dict[str, str]:
    sql = {
        "keyword_eq": f"SELECT {_EV} FROM events WHERE lower(event_type) = 'click'",
        "keyword_eq_native": f"SELECT {_EV} FROM events WHERE CAST(user_id AS VARCHAR) = '7'",
        "keyword_wildcard": f"SELECT {_EV} FROM events WHERE lower(event_type) LIKE 'c%ck'",
        "filter_in": f"SELECT {_EV} FROM events WHERE lower(event_type) IN ('click', 'view')",
        "range_numeric": (
            f"SELECT {_EV} FROM events WHERE "
            "TRY_CAST(lower(CAST(value AS VARCHAR)) AS DOUBLE) >= 10 AND "
            "TRY_CAST(lower(CAST(value AS VARCHAR)) AS DOUBLE) < 20"
        ),
        "range_open": (
            f"SELECT {_EV} FROM events WHERE "
            "TRY_CAST(lower(CAST(value AS VARCHAR)) AS DOUBLE) >= 15"
        ),
        "range_lexicographic": (
            f"SELECT {_EV} FROM events WHERE "
            "lower(event_type) >= 'click' AND lower(event_type) <= 'error'"
        ),
        "exists": f"SELECT {_EV} FROM events WHERE props IS NOT NULL",
        "match_all": f"SELECT {_EV} FROM events",
        "bool_precedence": (
            f"SELECT {_EV} FROM events WHERE "
            "(lower(event_type) = 'click' AND value >= 10) OR "
            "(lower(event_type) = 'error' AND value >= 30)"
        ),
        "bool_not": (
            f"SELECT {_EV} FROM events WHERE "
            "lower(event_type) <> 'click' AND value >= 50"
        ),
        "comment_strip": (
            f"SELECT {_EV} FROM events WHERE lower(event_type) IN ('click', 'view')"
        ),
        "time_range": (
            f"SELECT {_EV} FROM events WHERE "
            "epoch_ms(ts) >= 1704412800000 AND epoch_ms(ts) <= 1704844800000"
        ),
        "fields_pipe": "SELECT event_id, event_type FROM events",
        "order_limit_desc": (
            f"SELECT {_EV} FROM events ORDER BY epoch_ms(ts) DESC, event_id DESC, ts DESC LIMIT 100"
        ),
        "order_limit_asc": (
            f"SELECT {_EV} FROM events ORDER BY epoch_ms(ts) ASC, event_id ASC, ts ASC LIMIT 100"
        ),
        "offset_pagination": (
            f"SELECT {_EV} FROM events ORDER BY epoch_ms(ts) ASC, event_id ASC, ts ASC LIMIT 200 OFFSET 500"
        ),
        "merge_dedup": f"SELECT {_EV} FROM events WHERE lower(event_type) = 'error'",
        "fetch_by_ids": (
            f"SELECT {_EV} FROM events WHERE event_id IN "
            f"({', '.join(str(i) for i in range(0, 500, 7))})"
        ),
        # identical row set through the DocStore bloom path: a bloom
        # row-group skip that dropped a matching group would diverge here
        "store_bloom_fetch": (
            f"SELECT {_EV} FROM events WHERE event_id IN "
            f"({', '.join(str(i) for i in range(0, 500, 7))})"
        ),
        "with_total": "SELECT count(*) AS total FROM events WHERE lower(event_type) = 'click'",
        "fulltext_and": (
            "SELECT doc_id, lang, source FROM documents WHERE "
            f"list_contains({_TOKS}, 'table') AND list_contains({_TOKS}, 'scan')"
        ),
        "fulltext_wildcard": (
            "SELECT doc_id, source FROM documents WHERE "
            f"len(list_filter({_TOKS}, t -> t LIKE 'sc%n')) > 0"
        ),
        "agg_count_group": (
            "SELECT lower(event_type) AS name, count(*) AS cnt FROM events GROUP BY 1"
        ),
        "agg_unique": "SELECT DISTINCT lower(event_type) AS name FROM events",
        "agg_sum_group": (
            "SELECT lower(event_type) AS name, round(sum(value), 3) AS sum_value "
            "FROM events GROUP BY 1"
        ),
        "agg_min_group": (
            "SELECT lower(event_type) AS name, min(value) AS min_value "
            "FROM events GROUP BY 1"
        ),
        "agg_max_group": (
            "SELECT lower(event_type) AS name, max(value) AS max_value "
            "FROM events GROUP BY 1"
        ),
        "agg_avg_group": (
            "SELECT lower(event_type) AS name, round(avg(value), 3) AS avg_value "
            "FROM events GROUP BY 1"
        ),
        "agg_filtered": (
            "SELECT lower(event_type) AS name, round(sum(value), 3) AS sum_value "
            "FROM events WHERE value >= 10 AND lower(event_type) <> 'view' GROUP BY 1"
        ),
        "agg_quantile": (
            "SELECT lower(event_type) AS name, "
            "round(quantile_cont(value, 0.5), 3) AS p50, "
            "round(quantile_cont(value, 0.9), 3) AS p90 "
            "FROM events GROUP BY 1"
        ),
        "agg_timeseries": (
            "SELECT epoch_ms(ts) - epoch_ms(ts) % 604800000 AS mid_ms, "
            "lower(event_type) AS name, count(*) AS cnt FROM events GROUP BY 1, 2"
        ),
        "date_histogram": (
            "SELECT epoch_ms(ts) - epoch_ms(ts) % 21600000 AS bucket_ms, "
            "count(*) AS cnt FROM events WHERE lower(event_type) = 'error' GROUP BY 1"
        ),
        "notexists_accounting": (
            "SELECT CASE WHEN json_extract_string(props, '$.k2') IS NULL THEN 1 ELSE 0 END "
            "AS not_exists, count(*) AS cnt FROM events GROUP BY 1"
        ),
        "json_field_extract": (
            "SELECT event_id, TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) AS k "
            "FROM events WHERE TRY_CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50"
        ),
        "ingest_tokenize": (
            # strlen = BYTE length, matching the reference's len([]byte) caps
            "SELECT doc_id, unnest(list_filter("
            f"{_TOKS}, t -> len(t) > 0 AND strlen(t) <= 72)) AS token FROM documents"
        ),
        "auto_mapping_search": (
            "SELECT event_id FROM events "
            "WHERE lower(event_type) = 'click' "
            "AND CAST(user_id AS VARCHAR) LIKE '1%'"
        ),
        "ann_batch_topk": (
            "WITH q AS (SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv "
            "FROM embeddings WHERE vec_id < 3), "
            "c AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings "
            "WHERE vec_id >= 3) "
            "SELECT q.query_id, c.vec_id, "
            "round(list_cosine_similarity(c.v, q.qv), 4) AS score "
            "FROM q, c "
            "QUALIFY row_number() OVER (PARTITION BY q.query_id "
            "ORDER BY list_cosine_similarity(c.v, q.qv) DESC, c.vec_id) <= 5"
        ),
        "gopher_quality": (
            "WITH g AS (SELECT doc_id, text, " + _WORDS + " AS w FROM documents), "
            "m AS (SELECT doc_id, text, w, len(w) AS n, "
            "CASE WHEN len(w) > 0 THEN length(array_to_string(w, ''))::DOUBLE / len(w) ELSE 0 END AS mean_len, "
            r"length(regexp_replace(text, '[^#…]', '', 'g')) + len(regexp_extract_all(text, '\.\.\.')) AS symbols, "
            r"len(list_filter(w, x -> regexp_matches(x, '\p{L}'))) AS alpha_words, "
            "len(list_intersect(w, ['the','be','to','of','and','that','have','with'])) AS req FROM g) "
            "SELECT doc_id, "
            "(n >= 5 AND n <= 500) AS rule_word_count, "
            "(mean_len >= 3.0 AND mean_len <= 10.0) AS rule_mean_word_len, "
            "(n > 0 AND symbols::DOUBLE / n <= 0.1) AS rule_symbol_ratio, "
            "(n > 0 AND alpha_words::DOUBLE / n >= 0.8) AS rule_alpha_words, "
            "(req >= 2) AS rule_required_words, "
            "((n >= 5 AND n <= 500) AND (mean_len >= 3.0 AND mean_len <= 10.0) "
            "AND (n > 0 AND symbols::DOUBLE / n <= 0.1) "
            "AND (n > 0 AND alpha_words::DOUBLE / n >= 0.8) AND req >= 2) AS gopher_keep "
            "FROM m"
        ),
        "gopher_repetition": (
            "WITH base AS (SELECT doc_id, length(text) AS tc, "
            "list_filter(string_split(text, chr(10)), l -> len(trim(l)) > 0) AS lines, "
            r"list_filter(string_split_regex(text, '\n{2,}'), p -> len(trim(p)) > 0) AS paras, "
            + _WORDS
            + " AS w FROM documents), "
            "lg AS (SELECT doc_id, item, count(*) AS c, length(item) AS ln FROM "
            "(SELECT doc_id, unnest(lines) AS item FROM base) GROUP BY doc_id, item), "
            "ls AS (SELECT doc_id, sum(c) AS n, "
            "coalesce(sum(c) FILTER (WHERE c > 1), 0) AS dup_n, "
            "coalesce(sum(c * ln) FILTER (WHERE c > 1), 0) AS dup_ch FROM lg GROUP BY doc_id), "
            "pg AS (SELECT doc_id, item, count(*) AS c, length(item) AS ln FROM "
            "(SELECT doc_id, unnest(paras) AS item FROM base) GROUP BY doc_id, item), "
            "ps AS (SELECT doc_id, sum(c) AS n, "
            "coalesce(sum(c) FILTER (WHERE c > 1), 0) AS dup_n, "
            "coalesce(sum(c * ln) FILTER (WHERE c > 1), 0) AS dup_ch FROM pg GROUP BY doc_id), "
            "g2 AS (SELECT doc_id, gram, count(*) AS c, length(gram) AS ln FROM "
            "(SELECT doc_id, unnest(list_transform(range(1, len(w)), "
            "i -> array_to_string(w[i:i+1], ' '))) AS gram FROM base) GROUP BY doc_id, gram), "
            "g2s AS (SELECT doc_id, coalesce(max(c * ln) FILTER (WHERE c > 1), 0) AS top_ch "
            "FROM g2 GROUP BY doc_id), "
            "g5 AS (SELECT doc_id, gram, count(*) AS c, length(gram) AS ln FROM "
            "(SELECT doc_id, unnest(list_transform(range(1, len(w) - 3), "
            "i -> array_to_string(w[i:i+4], ' '))) AS gram FROM base) GROUP BY doc_id, gram), "
            "g5s AS (SELECT doc_id, coalesce(sum(c * ln) FILTER (WHERE c > 1), 0) AS dup_ch "
            "FROM g5 GROUP BY doc_id), "
            "f AS (SELECT b.doc_id, "
            "CASE WHEN coalesce(ls.n, 0) > 0 THEN ls.dup_n::DOUBLE / ls.n ELSE 0 END AS dlf, "
            "CASE WHEN b.tc > 0 THEN coalesce(ls.dup_ch, 0)::DOUBLE / b.tc ELSE 0 END AS dlc, "
            "CASE WHEN coalesce(ps.n, 0) > 0 THEN ps.dup_n::DOUBLE / ps.n ELSE 0 END AS dpf, "
            "CASE WHEN b.tc > 0 THEN coalesce(ps.dup_ch, 0)::DOUBLE / b.tc ELSE 0 END AS dpc, "
            "CASE WHEN b.tc > 0 THEN coalesce(g2s.top_ch, 0)::DOUBLE / b.tc ELSE 0 END AS t2, "
            "CASE WHEN b.tc > 0 THEN coalesce(g5s.dup_ch, 0)::DOUBLE / b.tc ELSE 0 END AS d5 "
            "FROM base b LEFT JOIN ls USING (doc_id) LEFT JOIN ps USING (doc_id) "
            "LEFT JOIN g2s USING (doc_id) LEFT JOIN g5s USING (doc_id)) "
            "SELECT doc_id, round(dlf, 4) AS dup_line_frac, "
            "round(dlc, 4) AS dup_line_char_frac, "
            "round(dpf, 4) AS dup_para_frac, "
            "round(dpc, 4) AS dup_para_char_frac, "
            "round(t2, 4) AS top_2gram_char_frac, "
            "round(d5, 4) AS dup_5gram_char_frac, "
            "(dlf <= 0.30 AND dlc <= 0.20 AND dpf <= 0.30 AND dpc <= 0.20 "
            "AND t2 <= 0.20 AND d5 <= 0.15) AS gopher_rep_keep FROM f"
        ),
        "unigram_perplexity": (
            "WITH toks AS (SELECT doc_id, unnest(" + _WORDS + ") AS word "
            "FROM documents), "
            "counts AS (SELECT word, count(*) AS c FROM toks GROUP BY word), "
            "agg AS (SELECT sum(c) AS total, count(*) AS v FROM counts), "
            "top AS (SELECT word, c FROM counts ORDER BY c DESC, word LIMIT 100), "
            "vocab AS (SELECT word, ln((c + 1)::DOUBLE / (total + v + 1)) AS logp "
            "FROM top, agg), "
            "oovp AS (SELECT ln(1.0 / (total + v + 1)) AS oov FROM agg), "
            "scored AS (SELECT t.doc_id, coalesce(vocab.logp, oovp.oov) AS logp "
            "FROM toks t LEFT JOIN vocab USING (word), oovp), "
            "per AS (SELECT doc_id, count(*) AS n_tokens, avg(logp) AS mean_logp "
            "FROM scored GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(per.n_tokens, 0)::BIGINT AS n_tokens, "
            "round(coalesce(per.mean_logp, 0.0), 4) AS mean_logp "
            "FROM documents d LEFT JOIN per USING (doc_id)"
        ),
        "url_canonical": (
            # the canonical form is computable in closed form for the
            # synthesized variants; the lowest id (the messy variant's
            # doc_id) survives dedup — any broken canonicalization rule
            # makes the two variants' canonicals disagree and the row
            # count/values mismatch
            "SELECT doc_id, 'https://' || lower(source) || '.example.com/' "
            "|| lang || '/page' || doc_id || '?a=1&b=2' AS canonical_url "
            "FROM documents"
        ),
        "c4_filter": (
            "WITH synth AS (SELECT doc_id, text || '.' || chr(10) || "
            "'tiny line.' || chr(10) || "
            "'this line has no terminal punctuation' || chr(10) || "
            "(CASE WHEN doc_id % 7 = 0 THEN "
            "'curly { brace sentence appears right here today.' ELSE "
            "'clean closing sentence for the document.' END) || chr(10) || "
            "(CASE WHEN doc_id % 11 = 0 THEN "
            "'lorem ipsum dolor sit amet line here.' ELSE "
            "'regular final line of this document page.' END) AS t "
            "FROM documents), "
            "c AS (SELECT doc_id, t, array_to_string(list_filter("
            "string_split(t, chr(10)), "
            "l -> regexp_matches(l, '[.!?\"]\\s*$') AND "
            r"len(list_filter(string_split_regex(l, '\s+'), w -> len(w) > 0)) >= 5"
            "), chr(10)) AS text_clean FROM synth) "
            "SELECT doc_id, text_clean, "
            "NOT contains(lower(t), 'lorem ipsum') AS rule_no_lorem, "
            "NOT contains(t, '{') AS rule_no_brace, "
            r"len(regexp_extract_all(text_clean, '[.!?]')) >= 3 AS rule_min_sentences, "
            "(NOT contains(lower(t), 'lorem ipsum') AND NOT contains(t, '{') "
            r"AND len(regexp_extract_all(text_clean, '[.!?]')) >= 3) AS c4_keep "
            "FROM c"
        ),
        "token_budget": (
            "WITH per AS (SELECT source, count(*) AS n_docs, "
            f"sum(len({_WORDS}))::BIGINT AS n_tokens FROM documents GROUP BY source) "
            "SELECT source, n_docs, n_tokens, "
            "round(n_tokens::DOUBLE / sum(n_tokens) OVER (), 6) AS token_share FROM per"
        ),
        "index_hot_tokens": (
            "WITH tok AS (SELECT doc_id, unnest(list_distinct(list_filter("
            f"{_TOKS}, t -> len(t) > 0 AND strlen(t) <= 72))) AS token "
            "FROM documents) "
            "SELECT 'text' AS field, token, count(*) AS df FROM tok "
            "GROUP BY token ORDER BY df DESC, token LIMIT 50"
        ),
        "path_prefix_tokens": (
            "SELECT doc_id, unnest(["
            "'/' || lower(lang), "
            "'/' || lower(lang) || '/' || lower(source)"
            "]) AS token FROM documents"
        ),
        "timestamp_parse_chain": "SELECT event_id, epoch_us(date_trunc('milliseconds', ts)) AS parsed_us FROM events WHERE event_id % 2 = 0 UNION ALL SELECT event_id, epoch_us(date_trunc('second', ts)) AS parsed_us FROM events WHERE event_id % 2 = 1",
        "doc_size_tracking": "SELECT event_id, len(props) AS doc_size FROM events",
        "dedup_exact": (
            "SELECT doc_id, md5(text) AS h FROM documents "
            "QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1"
        ),
        "incremental_dedup": (
            "WITH seen AS (SELECT DISTINCT md5(text) AS digest "
            "FROM documents WHERE doc_id % 4 = 0), "
            "batch AS ("
            "SELECT doc_id, text FROM documents WHERE doc_id % 4 <> 0 "
            "UNION ALL SELECT doc_id + 100000, text FROM documents "
            "WHERE doc_id % 8 = 0 "
            "UNION ALL SELECT doc_id + 200000, text FROM documents "
            "WHERE doc_id % 4 = 1), "
            "fresh AS (SELECT b.* FROM batch b LEFT JOIN seen s "
            "ON md5(b.text) = s.digest WHERE s.digest IS NULL) "
            "SELECT doc_id, md5(text) AS h FROM fresh "
            "QUALIFY row_number() OVER (PARTITION BY md5(text) "
            "ORDER BY doc_id) = 1"
        ),
        "paragraph_dedup": (
            "WITH synth AS (SELECT doc_id, text || e'\\n\\n' || "
            "'standard corpus footer paragraph' || e'\\n\\n' || lang || "
            "' closing paragraph' AS t FROM documents), "
            "p AS (SELECT doc_id, unnest(string_split(t, e'\\n\\n')) AS para, "
            "unnest(range(1, len(string_split(t, e'\\n\\n')) + 1)) AS ord "
            "FROM synth), "
            "pf AS (SELECT * FROM p WHERE length(para) > 0), "
            "w AS (SELECT doc_id, para, ord, row_number() OVER "
            "(PARTITION BY para ORDER BY doc_id, ord) AS rn FROM pf) "
            "SELECT s.doc_id, coalesce(string_agg(w.para, e'\\n\\n' "
            "ORDER BY w.ord), '') AS text_dedup "
            "FROM synth s LEFT JOIN w ON w.doc_id = s.doc_id AND w.rn = 1 "
            "GROUP BY s.doc_id"
        ),
        "ngram_jaccard": (
            "WITH w AS (SELECT doc_id, " + _WORDS + " AS w FROM documents "
            "WHERE " + _KERNEL_WHERE + "), "
            "sh AS (SELECT doc_id, list_distinct(list_transform("
            "range(1, greatest(len(w) - 2, 1) + 1), "
            "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM w) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "round(len(list_intersect(a.s, b.s))::DOUBLE / "
            "len(list_distinct(list_concat(a.s, b.s))), 3) AS jaccard "
            "FROM sh a, sh b WHERE a.doc_id < b.doc_id AND "
            "len(list_intersect(a.s, b.s))::DOUBLE / "
            "len(list_distinct(list_concat(a.s, b.s))) >= 0.3"
        ),
        "ann_brute_topk": (
            "WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0) "
            "SELECT vec_id, round(list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)), 4) AS score "
            "FROM embeddings WHERE vec_id <> 0 "
            "ORDER BY list_cosine_similarity(embedding::DOUBLE[], (SELECT qv FROM q)) DESC, vec_id ASC LIMIT 10"
        ),
        "embedding_cosine_pairs": (
            "SELECT a.vec_id AS id_a, b.vec_id AS id_b, "
            "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos "
            "FROM embeddings a, embeddings b "
            "WHERE a.vec_id < b.vec_id AND a.vec_id < 60 AND b.vec_id < 60 AND "
            "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.3"
        ),
        "text_token_count": (
            f"SELECT doc_id, len({_WORDS}) AS n_tokens FROM documents"
        ),
        "text_quality": None,  # filled below (long expression)
        "text_fingerprint": (
            f"SELECT doc_id, md5(array_to_string({_WORDS}, ' ')) AS fp FROM documents"
        ),
        "join_broadcast": (
            "SELECT c_mktsegment, count(*) AS n_orders, "
            "round(sum(o_totalprice), 2) AS total_price "
            "FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY 1"
        ),
        "lineitem_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, "
            "round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_base_price, "
            "round(avg(l_discount), 6) AS avg_disc, "
            "count(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' GROUP BY 1, 2"
        ),
        "complex_search": (
            "WITH f AS (SELECT * FROM events WHERE lower(event_type) IN ('click', 'view')) "
            "SELECT 'total' AS part, '' AS name, count(*)::DOUBLE AS value FROM f "
            "UNION ALL "
            "SELECT 'hist', CAST(epoch_ms(ts) - epoch_ms(ts) % 604800000 AS VARCHAR), "
            "count(*)::DOUBLE FROM f GROUP BY 2 "
            "UNION ALL "
            "SELECT 'count', lower(event_type), count(*)::DOUBLE FROM f GROUP BY 2 "
            "UNION ALL "
            "SELECT 'sum', lower(event_type), round(sum(value), 3) FROM f GROUP BY 2"
        ),
        "agg_notexists_bucket": (
            "SELECT CASE WHEN event_id % 3 <> 0 THEN lower(event_type) "
            "ELSE '_not_exists' END AS name, count(*) AS cnt FROM events GROUP BY 1"
        ),
        "agg_sum_notexists": (
            "SELECT lower(event_type) AS name, "
            "round(sum(CASE WHEN event_id % 4 <> 0 THEN value END), 3) AS sum_value, "
            "count(*) FILTER (WHERE event_id % 4 = 0) AS not_exists "
            "FROM events GROUP BY 1"
        ),
        "agg_unique_total": (
            "SELECT count(DISTINCT lower(event_type)) AS total_unique FROM events"
        ),
        "agg_bucket_order": (
            "SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, name ASC) AS rank, "
            "name, cnt FROM (SELECT lower(event_type) AS name, count(*) AS cnt "
            "FROM events GROUP BY 1)"
        ),
        "keyset_pagination": (
            f"SELECT {_EV} FROM events WHERE "
            "epoch_ms(ts) > 1704412800000 OR "
            "(epoch_ms(ts) = 1704412800000 AND event_id > 5000) "
            "ORDER BY ts ASC, event_id ASC LIMIT 100"
        ),
        "multitype_keyword_title": (
            "SELECT event_id FROM events WHERE lower(props) LIKE '%9}%'"
        ),
        "inverted_index_and": (
            "SELECT doc_id, lang, source FROM documents WHERE "
            f"list_contains({_TOKS}, 'table') AND list_contains({_TOKS}, 'scan')"
        ),
        "export_keyset": (
            f"SELECT {_EV} FROM events WHERE "
            "lower(event_type) = 'error' AND value >= 40 "
            "ORDER BY ts ASC, event_id ASC"
        ),
        "case_sensitive_eq": (
            "SELECT event_id, event_type FROM events WHERE event_type = 'click'"
        ),
        "pii_scrub": (
            "SELECT doc_id, "
            "regexp_replace(regexp_replace(regexp_replace("
            "text || ' contact user' || doc_id || '@example.com at 10.0.0.' || (doc_id % 256), "
            r"'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            r"'\b(?:\d{1,3}\.){3}\d{1,3}\b', '<IP>', 'g'), "
            r"'\+?\d[\d\s().-]{7,}\d', '<PHONE>', 'g') AS clean "
            "FROM documents"
        ),
        "decontaminate": (
            "WITH grams AS (SELECT doc_id, unnest(list_distinct(list_transform("
            "range(1, greatest(len(w) - 7, 0) + 1), "
            "i -> array_to_string(w[i:i+7], ' ')))) AS gram "
            f"FROM (SELECT doc_id, {_WORDS} AS w FROM documents)), "
            "bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 20), "
            "hits AS (SELECT DISTINCT g.doc_id FROM grams g JOIN bench b USING (gram)) "
            "SELECT d.doc_id, (h.doc_id IS NOT NULL) AS contaminated "
            "FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id"
        ),
        "repetition_ratio": (
            "SELECT doc_id, CASE WHEN len(w) - 2 >= 1 THEN round("
            "1.0 - len(list_distinct(list_transform(range(1, len(w) - 1), "
            "i -> array_to_string(w[i:i+2], ' '))))::DOUBLE / (len(w) - 2), 4) "
            "ELSE 0.0 END AS rep "
            f"FROM (SELECT doc_id, {_WORDS} AS w FROM documents)"
        ),
        "shipping_priority": (
            "SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE l_shipdate > TIMESTAMP '1995-03-15' "
            "AND o_orderdate < TIMESTAMP '1995-03-15' "
            "AND c_mktsegment = 'BUILDING' "
            "GROUP BY 1 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"
        ),
        "local_supplier_volume": (
            "SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' GROUP BY 1"
        ),
    }
    # deterministic sampling twin: same md5-prefix bucket both engines
    # (15 hex digits = 60 bits, exact in a signed 64-bit int)
    # each operator namespaces the seed (sample:/split:/mix: prefix) so one
    # seed string yields independent hash streams across operators
    def bucket(ns):
        return (
            "(CAST(CONCAT('0x', SUBSTR(md5(CONCAT(CAST(doc_id AS VARCHAR), "
            f"'{ns}v1')), 1, 15)) AS BIGINT) % 1000000)"
        )

    sql["hash_sample"] = (
        f"SELECT doc_id, source FROM documents WHERE {bucket('sample:')} < 250000"
    )
    sql["hash_split"] = (
        "SELECT doc_id, CASE "
        f"WHEN {bucket('split:')} < 800000 THEN 'train' "
        f"WHEN {bucket('split:')} < 900000 THEN 'val' "
        "ELSE 'test' END AS split FROM documents"
    )
    # DSIR: hashed unigram+bigram buckets, Laplace-smoothed target/raw
    # log-ratios densified over all 512 buckets, per-doc importance sums
    dsir_pre = (
        f"WITH w AS (SELECT doc_id, lang, {_WORDS} AS ws FROM documents), "
        "grams AS ("
        "SELECT doc_id, lang, unnest(ws) AS gram FROM w "
        "UNION ALL "
        "SELECT doc_id, lang, ws[i] || ' ' || ws[i+1] AS gram "
        "FROM (SELECT doc_id, lang, ws, "
        "unnest(generate_series(1, len(ws) - 1)) AS i FROM w)), "
        "b AS (SELECT doc_id, lang, "
        "('0x' || substring(md5(gram), 1, 4))::INTEGER % 512 AS bucket "
        "FROM grams), "
        "tc AS (SELECT bucket, count(*) AS ct FROM b WHERE lang = 'en' "
        "GROUP BY bucket), "
        "rc AS (SELECT bucket, count(*) AS cr FROM b GROUP BY bucket), "
        "tot AS (SELECT (SELECT sum(ct) FROM tc) AS t_total, "
        "(SELECT sum(cr) FROM rc) AS r_total), "
        "buckets AS (SELECT unnest(generate_series(0, 511)) AS bucket), "
        "ratios AS (SELECT bucket, "
        "ln((coalesce(ct, 0) + 1)::DOUBLE / (t_total + 512)) - "
        "ln((coalesce(cr, 0) + 1)::DOUBLE / (r_total + 512)) AS log_ratio "
        "FROM buckets LEFT JOIN tc USING (bucket) "
        "LEFT JOIN rc USING (bucket), tot), "
        "per AS (SELECT doc_id, count(*) AS n_grams, "
        "sum(log_ratio) AS log_importance "
        "FROM b JOIN ratios USING (bucket) GROUP BY doc_id)"
    )
    sql["dsir_score"] = (
        dsir_pre +
        " SELECT d.doc_id, coalesce(per.n_grams, 0)::BIGINT AS n_grams, "
        "round(coalesce(per.log_importance, 0.0), 3) AS log_importance "
        "FROM documents d LEFT JOIN per USING (doc_id)"
    )
    # seeded md5 Gumbel noise: u = (x32 + 0.5) / 2^32, g = -ln(-ln u);
    # top-60 by (log_importance + g) IS the weighted sample
    sql["dsir_resample"] = (
        dsir_pre +
        ", keyed AS (SELECT d.doc_id, d.lang, d.source, "
        "coalesce(per.log_importance, 0.0) + "
        "(-ln(-ln((('0x' || substring(md5(d.doc_id::VARCHAR || '|7'), 1, 8))"
        "::BIGINT + 0.5) / 4294967296.0))) AS sample_key "
        "FROM documents d LEFT JOIN per USING (doc_id)) "
        "SELECT doc_id, lang, source FROM keyed "
        "ORDER BY sample_key DESC LIMIT 60"
    )
    # lang_detect: per-language stopword votes (lists verbatim from
    # seqspark.pipeline.textstats._LANG_STOPWORDS); earliest language at
    # the max wins, zero votes -> 'und' — the exact fold semantics
    def _vote(words_sql):
        return (f"len(list_filter(ws, w -> list_contains({words_sql}, w)))")

    _sw = {
        "en": "['the','a','and','of','to','in','is','that','it','for']",
        "de": "['der','die','das','und','ist','nicht','ein','mit','zu']",
        "fr": "['le','la','les','et','est','un','une','pour','dans']",
        "es": "['el','la','los','y','es','un','una','por','para']",
    }
    sql["lang_detect"] = (
        f"WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents), "
        "s AS (SELECT doc_id, "
        + ", ".join(f"{_vote(v)} AS s_{k}" for k, v in _sw.items())
        + " FROM w), "
        "m AS (SELECT *, greatest(s_en, s_de, s_fr, s_es) AS mx FROM s) "
        "SELECT doc_id, CASE WHEN mx <= 0 THEN 'und' "
        "WHEN s_en = mx THEN 'en' WHEN s_de = mx THEN 'de' "
        "WHEN s_fr = mx THEN 'fr' ELSE 'es' END AS lang_guess FROM m"
    )
    # frame_sample: the fake decoder's n_frames = 1 + (3rd sha256 byte % 8)
    # — sha256 over the SAME utf-8 bytes in both engines; selection =
    # distinct floor(i*n/k) for i in 0..k-1
    sql["frame_sample"] = (
        "WITH d AS (SELECT doc_id AS asset_id, "
        "1 + (('0x' || substring(sha256(text), 5, 2))::INTEGER % 8) "
        "AS n_frames FROM documents), "
        "k AS (SELECT asset_id, n_frames, "
        "least(3, n_frames) AS kk FROM d), "
        "idx AS (SELECT asset_id, n_frames, "
        "list_distinct(list_transform(generate_series(0, kk - 1), "
        "i -> ((i * n_frames) // kk)::INTEGER)) AS fs FROM k) "
        "SELECT asset_id, n_frames, unnest(fs) AS frame_index FROM idx"
    )
    # bigram_perplexity: stupid-backoff bigram LM — known-bigram scores
    # ln(cb/c1) against FULL unigram counts, unseen pairs ln(0.4) +
    # Laplace top-100 unigram logp, unknown words the OOV sentinel
    sql["bigram_perplexity"] = (
        f"WITH w AS (SELECT doc_id, {_WORDS} AS ws FROM documents), "
        "toks AS (SELECT doc_id, unnest(ws) AS word FROM w), "
        "counts AS (SELECT word, count(*) AS c FROM toks GROUP BY word), "
        "agg AS (SELECT sum(c) AS total, count(*) AS v FROM counts), "
        "top AS (SELECT word, c FROM counts ORDER BY c DESC, word LIMIT 100), "
        "vocab AS (SELECT word, ln((c + 1)::DOUBLE / (total + v + 1)) AS logp "
        "FROM top, agg), "
        "oovp AS (SELECT ln(1.0 / (total + v + 1)) AS oov FROM agg), "
        "bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS bigram "
        "FROM (SELECT doc_id, ws, "
        "unnest(generate_series(1, len(ws) - 1)) AS i FROM w)), "
        "bcounts AS (SELECT bigram, count(*) AS cb FROM bg GROUP BY bigram), "
        "btop AS (SELECT bigram, cb FROM bcounts "
        "ORDER BY cb DESC, bigram LIMIT 300), "
        "bmodel AS (SELECT bigram, ln(cb::DOUBLE / c1) AS logs FROM "
        "(SELECT bigram, cb, split_part(bigram, ' ', 1) AS w1 FROM btop) "
        "JOIN (SELECT word AS w1, c AS c1 FROM counts) USING (w1)), "
        "sp AS (SELECT g.doc_id, coalesce(bm.logs, "
        "ln(0.4) + coalesce(vb.logp, oovp.oov)) AS logs "
        "FROM bg g LEFT JOIN bmodel bm USING (bigram) "
        "LEFT JOIN vocab vb ON vb.word = split_part(g.bigram, ' ', 2), oovp), "
        "per AS (SELECT doc_id, count(*) AS n_bigrams, avg(logs) AS mean_logs "
        "FROM sp GROUP BY doc_id) "
        "SELECT d.doc_id, coalesce(per.n_bigrams, 0)::BIGINT AS n_bigrams, "
        "round(coalesce(per.mean_logs, 0.0), 4) AS mean_logs "
        "FROM documents d LEFT JOIN per USING (doc_id)"
    )
    # html_extract: the IDENTICAL RE2-compatible regexp chain as
    # seqspark.pipeline.textstats.html_to_text (no backreferences, \x0B
    # spelled out — \v is a vertical-whitespace CLASS in Java regex)
    _blk = ("p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|blockquote|"
            "section|article|header|footer|pre|nav|aside|form|hr")
    sql["html_extract"] = (
        "WITH h AS (SELECT doc_id, "
        "'<html><head><title>Doc ' || doc_id::VARCHAR || "
        "'</title><style>p { color: red; }</style>"
        "<script>var t = \"<p>trap</p>\";</script></head><body><h1>' || "
        "source || ' &amp;amp; co</h1><!-- meta ' || lang || ' --><p>' || "
        "text || '</p><div>tail&nbsp;&lt;' || lang || "
        "'&gt;</div><br/>fin</body></html>' AS x FROM documents), "
        "s1 AS (SELECT doc_id, regexp_replace(x, "
        r"'(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g') AS x FROM h), "
        "s2 AS (SELECT doc_id, regexp_replace(x, "
        r"'(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g') AS x FROM s1), "
        "s3 AS (SELECT doc_id, regexp_replace(x, "
        "'(?s)<!--.*?-->', ' ', 'g') AS x FROM s2), "
        "s4 AS (SELECT doc_id, regexp_replace(x, "
        rf"'(?is)</?({_blk})\b[^>]*/?>', e'\n', 'g') AS x FROM s3), "
        "s5 AS (SELECT doc_id, regexp_replace(x, "
        "'(?s)<[^>]*>', ' ', 'g') AS x FROM s4), "
        "e AS (SELECT doc_id, replace(replace(replace(replace(replace("
        "replace(replace(x, '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), "
        "'&quot;', '\"'), '&#39;', ''''), '&apos;', ''''), "
        "'&amp;', '&') AS x FROM s5), "
        "w AS (SELECT doc_id, regexp_replace(x, "
        r"'[ \t\r\f\x0B]+', ' ', 'g') AS x FROM e) "
        "SELECT doc_id, array_to_string(list_filter(list_transform("
        "string_split(x, e'\n'), l -> trim(l)), l -> len(l) > 0), e'\n') "
        "AS text_extracted FROM w"
    )
    shard8 = (
        "(CAST(CONCAT('0x', SUBSTR(md5(CONCAT(CAST(doc_id AS VARCHAR), "
        "'shard:v1')), 1, 15)) AS BIGINT) % 8)"
    )
    sql["train_shuffle"] = (
        f"SELECT doc_id, CAST({shard8} AS INTEGER) AS shard, "
        f"CAST(row_number() OVER (PARTITION BY {shard8} "
        "ORDER BY md5(CONCAT(CAST(doc_id AS VARCHAR), 'order:v1')), doc_id)"
        " - 1 AS BIGINT) AS pos FROM documents"
    )
    sql["mix_sources"] = (
        "WITH weighted AS (SELECT doc_id, source, "
        "CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 2.0 "
        "WHEN 'src2' THEN 0.5 WHEN 'src3' THEN 0.0 ELSE 1.0 END AS w, "
        f"{bucket('mix:')} AS b FROM documents), "
        "counted AS (SELECT doc_id, source, "
        "CAST(FLOOR(w) + (CASE WHEN b < ROUND((w - FLOOR(w)) * 1000000) "
        "THEN 1 ELSE 0 END) AS INT) AS n FROM weighted) "
        "SELECT c.doc_id, c.source, CAST(u.g AS INT) AS copy "
        "FROM counted c, LATERAL unnest(range(1, c.n + 1)) u(g)"
    )
    sw = "('the','a','and','of','to','in','is','that','it','for')"
    n_sw = f"len(list_filter({_WORDS}, w -> w IN {sw}))"
    n_w = f"len({_WORDS})"
    mean_len = f"(CASE WHEN {n_w} > 0 THEN len(array_to_string({_WORDS}, ''))::DOUBLE / {n_w} ELSE 0 END)"
    alpha = (
        "(CASE WHEN len(text) > 0 THEN "
        "len(regexp_replace(lower(text), '[^a-z]', '', 'g'))::DOUBLE / len(text) "
        "ELSE 0 END)"
    )
    sw_ratio = f"(CASE WHEN {n_w} > 0 THEN {n_sw}::DOUBLE / {n_w} ELSE 0 END)"
    quality = (
        "(("
        f"(CASE WHEN {mean_len} >= 2 AND {mean_len} <= 12 THEN 1.0 ELSE 0.0 END) + "
        f"{alpha} + "
        f"(CASE WHEN {sw_ratio} > 0.01 THEN 1.0 ELSE 0.0 END)"
        ") / 3.0)"
    )
    sql["text_quality"] = (
        "SELECT doc_id, "
        f"round({sw_ratio}, 4) AS stopword_ratio, "
        f"round({quality}, 4) AS quality FROM documents"
    )
    sql["corpus_curation"] = (
        f"WITH scored AS (SELECT doc_id, text, {quality} AS q "
        f"FROM documents WHERE {quality} >= 0.5), "
        "deduped AS (SELECT doc_id, q, text FROM scored "
        "QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1) "
        "SELECT doc_id, round(q, 4) AS quality, "
        f"len({_WORDS}) AS n_tokens FROM deduped"
    )
    # legacy dialect (`parser/query_parser.go:148`): AND binds tighter than
    # OR, [a TO b] inclusive-inclusive, text values token-AND-ed
    sql["legacy_query"] = (
        f"SELECT {_EV} FROM events WHERE "
        "lower(event_type) = 'click' OR "
        "(lower(event_type) = 'view' AND value >= 10 AND value <= 50)"
    )
    sql["legacy_range"] = (
        f"SELECT {_EV} FROM events WHERE "
        "NOT (lower(event_type) = 'error') AND value > 10 AND value < 50"
    )
    sql["sessionize"] = (
        "WITH s AS (SELECT user_id, epoch_ms(ts) AS ts_ms, "
        "CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL "
        "OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 3600000 THEN 1 ELSE 0 END AS brk "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
        "numbered AS (SELECT user_id, ts_ms, CAST(sum(brk) OVER "
        "(PARTITION BY user_id ORDER BY ts_ms ROWS UNBOUNDED PRECEDING) AS INT) AS session_seq "
        "FROM s) "
        "SELECT user_id, session_seq, count(*) AS n_events, "
        "min(ts_ms) AS start_ms, max(ts_ms) AS end_ms, "
        "max(ts_ms) - min(ts_ms) AS duration_ms "
        "FROM numbered GROUP BY 1, 2"
    )
    # bucketed sessionization: identical gap-and-islands with the bucket
    # folded into BOTH window partition keys (7-day buckets, 1h gap)
    _bkt = "epoch_ms(ts) - epoch_ms(ts) % 604800000"
    sql["sessionize_bucketed"] = (
        f"WITH s AS (SELECT user_id, epoch_ms(ts) AS ts_ms, ({_bkt}) AS session_bucket, "
        "CASE WHEN lag(epoch_ms(ts)) OVER w IS NULL "
        "OR epoch_ms(ts) - lag(epoch_ms(ts)) OVER w > 3600000 THEN 1 ELSE 0 END AS brk "
        f"FROM events WINDOW w AS (PARTITION BY user_id, ({_bkt}) ORDER BY ts)), "
        "numbered AS (SELECT user_id, ts_ms, session_bucket, CAST(sum(brk) OVER "
        "(PARTITION BY user_id, session_bucket ORDER BY ts_ms ROWS UNBOUNDED PRECEDING) AS INT) AS session_seq "
        "FROM s) "
        "SELECT user_id, session_bucket, session_seq, count(*) AS n_events, "
        "min(ts_ms) AS start_ms FROM numbered GROUP BY 1, 2, 3"
    )
    # the scalable two-phase sessionize must equal the plain single
    # window exactly — same oracle
    sql["sessionize_scalable"] = sql["sessionize"]
    sql["ivf_update"] = (
        "WITH seeds AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell, "
        "embedding::DOUBLE[] AS c FROM embeddings ORDER BY vec_id LIMIT 4), "
        "assigned AS (SELECT e.vec_id, e.embedding::DOUBLE[] AS v, "
        "(SELECT s.cell FROM seeds s "
        "ORDER BY list_cosine_similarity(e.embedding::DOUBLE[], s.c) DESC, s.cell ASC "
        "LIMIT 1) AS cell FROM embeddings e), "
        "exploded AS (SELECT cell, generate_subscripts(v, 1) - 1 AS pos, "
        "unnest(v) AS val FROM assigned) "
        "SELECT CAST(cell AS INT) AS cell, CAST(pos AS INT) AS pos, "
        "round(avg(val), 4) AS v FROM exploded GROUP BY 1, 2"
    )
    sql["heavy_hitters"] = (
        f"WITH w AS (SELECT lang, unnest({_WORDS}) AS token FROM documents), "
        "freq AS (SELECT lang, token, count(*) AS cnt FROM w GROUP BY 1, 2) "
        "SELECT lang, token, cnt FROM freq "
        "QUALIFY row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, token) <= 5"
    )
    sql["top_per_group"] = (
        "SELECT event_id, event_type, value FROM events "
        "QUALIFY row_number() OVER (PARTITION BY event_type "
        "ORDER BY value DESC, event_id) <= 3"
    )
    cap_bucket = (
        "(CAST(CONCAT('0x', SUBSTR(md5(CONCAT(CAST(doc_id AS VARCHAR), "
        "'cap:v1')), 1, 15)) AS BIGINT) % 1000000)"
    )
    sql["cap_per_group"] = (
        "SELECT doc_id, source FROM documents "
        f"QUALIFY row_number() OVER (PARTITION BY source ORDER BY {cap_bucket}, doc_id) <= 10"
    )
    # the salted (hot-only two-stage) variant must produce the IDENTICAL
    # set — the oracle is the same single-stage window, cap 3
    sql["cap_per_group_salted"] = (
        "SELECT doc_id, source FROM documents "
        f"QUALIFY row_number() OVER (PARTITION BY source ORDER BY {cap_bucket}, doc_id) <= 3"
    )
    sql["domain_stats"] = (
        "WITH synth AS (SELECT doc_id, 'intro https://' || source || "
        "'.Example.com/' || lang || ' mid https://cdn.shared.net/a end' || "
        "' auth http://user:pw@secure.shared.net/b' AS t "
        "FROM documents), "
        r"u AS (SELECT doc_id, unnest(regexp_extract_all(t, 'https?://(?:[^/@\s]+@)?([\w\.\-]+)', 1)) AS d "
        "FROM synth) "
        "SELECT lower(d) AS domain, count(DISTINCT doc_id) AS n_docs, "
        "count(*) AS n_urls FROM u GROUP BY 1"
    )
    sql["embedding_dup_clusters"] = (
        "WITH RECURSIVE pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b "
        "FROM embeddings a, embeddings b "
        "WHERE a.vec_id < b.vec_id AND a.vec_id < 60 AND b.vec_id < 60 AND "
        "round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) >= 0.3), "
        "sym AS (SELECT id_a AS u, id_b AS v FROM pairs "
        "UNION ALL SELECT id_b, id_a FROM pairs), "
        "reach(u, r) AS (SELECT u, u FROM (SELECT DISTINCT u FROM sym) "
        "UNION SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.u) "
        "SELECT u AS vec_id, min(r) AS cluster_root FROM reach GROUP BY u"
    )
    sql["stratified_sample"] = (
        "SELECT doc_id, lang FROM documents WHERE "
        f"{bucket('strata:')} < CASE lang WHEN 'en' THEN 500000 "
        "WHEN 'de' THEN 200000 WHEN 'zh' THEN 1000000 ELSE 100000 END"
    )
    # connected components over the same jaccard pairs as ngram_jaccard,
    # via a recursive min-root propagation CTE
    sql["dup_clusters"] = (
        "WITH RECURSIVE "
        "w AS (SELECT doc_id, " + _WORDS + " AS w FROM documents "
        "WHERE " + _KERNEL_WHERE + "), "
        "sh AS (SELECT doc_id, list_distinct(list_transform("
        "range(1, greatest(len(w) - 2, 1) + 1), "
        "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS s FROM w), "
        "pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b "
        "FROM sh a, sh b WHERE a.doc_id < b.doc_id AND "
        "len(list_intersect(a.s, b.s))::DOUBLE / "
        "len(list_distinct(list_concat(a.s, b.s))) >= 0.3), "
        "sym AS (SELECT id_a AS u, id_b AS v FROM pairs "
        "UNION ALL SELECT id_b, id_a FROM pairs), "
        "reach(u, r) AS (SELECT u, u FROM (SELECT DISTINCT u FROM sym) "
        "UNION SELECT s.v, reach.r FROM reach JOIN sym s ON s.u = reach.u) "
        "SELECT u AS doc_id, min(r) AS cluster_root FROM reach GROUP BY u"
    )
    # SemDeDup cells: nearest-centroid (max cosine, first-wins ties exactly
    # like ivf_assign's strict-greater chain) from the frozen literal
    # centroids; DOUBLE[] casts make DuckDB compute in the same precision
    # Spark does
    def _clit(c):
        return "[" + ",".join(repr(float(x)) for x in c) + "]"

    _sims = ", ".join(
        f"list_cosine_similarity(e, {_clit(c)}) AS s{i}"
        for i, c in enumerate(SEMDEDUP_CENTROIDS)
    )
    _cells_cte = (
        "WITH sims AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings), "
        f"simv AS (SELECT vec_id, e, {_sims} FROM sims), "
        "cells AS (SELECT vec_id, e, CASE "
        "WHEN s0 >= s1 AND s0 >= s2 AND s0 >= s3 THEN 0 "
        "WHEN s1 >= s2 AND s1 >= s3 THEN 1 "
        "WHEN s2 >= s3 THEN 2 ELSE 3 END AS cell FROM simv) "
    )
    sql["semantic_dedup_pairs"] = (
        _cells_cte
        + "SELECT x.vec_id AS a, y.vec_id AS b, x.cell AS cell, "
        "round(list_cosine_similarity(x.e, y.e), 4) AS cos "
        "FROM cells x JOIN cells y ON x.cell = y.cell AND x.vec_id < y.vec_id "
        "WHERE round(list_cosine_similarity(x.e, y.e), 4) >= 0.4"
    )
    sql["semantic_dedup"] = (
        _cells_cte
        + "SELECT vec_id, label FROM embeddings WHERE vec_id NOT IN ("
        "SELECT y.vec_id FROM cells x JOIN cells y "
        "ON x.cell = y.cell AND x.vec_id < y.vec_id "
        "WHERE round(list_cosine_similarity(x.e, y.e), 4) >= 0.4)"
    )
    # duplicated-span removal: md5 over the space-joined 8-word window on
    # both sides; first occurrence by (doc_id, pos) wins corpus-wide
    sql["span_dedup"] = (
        "WITH words AS (SELECT doc_id, string_split(text, ' ') AS ws "
        "FROM documents), "
        "pos_list AS (SELECT doc_id, ws, "
        "unnest(generate_series(1, len(ws) - 8 + 1)) AS p FROM words), "
        "occ AS (SELECT doc_id, p - 1 AS pos, "
        "md5(array_to_string(ws[p : p + 7], ' ')) AS h FROM pos_list), "
        "ranked AS (SELECT *, row_number() OVER "
        "(PARTITION BY h ORDER BY doc_id, pos) AS rn FROM occ), "
        "cov_raw AS (SELECT doc_id, "
        "unnest(generate_series(pos, pos + 7)) AS cp FROM ranked WHERE rn > 1), "
        "covered AS (SELECT DISTINCT doc_id, cp FROM cov_raw), "
        "tok_idx AS (SELECT doc_id, ws, "
        "unnest(generate_series(1, len(ws))) AS i FROM words), "
        "toks AS (SELECT doc_id, i - 1 AS idx, ws[i] AS w FROM tok_idx), "
        "kept AS (SELECT t.doc_id, t.idx, t.w FROM toks t "
        "LEFT JOIN covered c ON c.doc_id = t.doc_id AND c.cp = t.idx "
        "WHERE c.doc_id IS NULL) "
        "SELECT w.doc_id, coalesce(k.ct, '') AS clean_text FROM words w "
        "LEFT JOIN (SELECT doc_id, string_agg(w, ' ' ORDER BY idx) AS ct "
        "FROM kept GROUP BY doc_id) k ON k.doc_id = w.doc_id"
    )
    # fuzzy contamination: doc-pair 3-gram Jaccard across the parity
    # train/test split with a document-frequency cap on join grams
    _g3 = (
        "list_distinct(list_transform(range(1, greatest(len(W) - 2, 1) + 1), "
        "i -> W[i] || ' ' || W[i+1] || ' ' || W[i+2]))"
    ).replace("W", "w")
    sql["fuzzy_contamination"] = (
        "WITH tr AS (SELECT doc_id AS train_id, " + _WORDS + " AS w "
        "FROM documents WHERE doc_id % 2 = 0), "
        "te AS (SELECT doc_id AS test_id, " + _WORDS + " AS w "
        "FROM documents WHERE doc_id % 2 = 1), "
        f"dg AS (SELECT DISTINCT train_id, unnest({_g3}) AS gram FROM tr), "
        f"bg AS (SELECT DISTINCT test_id, unnest({_g3}) AS gram FROM te), "
        "capg AS (SELECT gram FROM (SELECT gram FROM dg UNION ALL "
        "SELECT gram FROM bg) GROUP BY gram HAVING count(*) <= 100), "
        "dgc AS (SELECT dg.* FROM dg JOIN capg USING (gram)), "
        "bgc AS (SELECT bg.* FROM bg JOIN capg USING (gram)), "
        "ds AS (SELECT train_id, count(*) AS na FROM dgc GROUP BY 1), "
        "bs AS (SELECT test_id, count(*) AS nb FROM bgc GROUP BY 1), "
        "ix AS (SELECT train_id, test_id, count(*) AS inter "
        "FROM dgc JOIN bgc USING (gram) GROUP BY 1, 2) "
        "SELECT ix.train_id, ix.test_id, ix.inter, "
        "round(ix.inter / (ds.na + bs.nb - ix.inter)::DOUBLE, 6) AS jaccard "
        "FROM ix JOIN ds USING (train_id) JOIN bs USING (test_id) "
        "WHERE ix.inter / (ds.na + bs.nb - ix.inter)::DOUBLE >= 0.4"
    )
    # quality classifier: identical hashed-feature scoring in SQL — the
    # weight vector rides as a literal list, the md5-prefix index matches
    # hashed_token_index exactly
    _qw = "[" + ",".join(repr(float(x)) for x in QC_WEIGHTS) + "]"
    sql["quality_classifier"] = (
        "WITH w AS (SELECT doc_id, " + _WORDS + " AS w FROM documents), "
        "s AS (SELECT doc_id, len(w) AS n, list_sum(list_transform(w, "
        f"x -> ({_qw}::DOUBLE[])[(('0x' || substring(md5(x), 1, 4))::INTEGER "
        f"% {len(QC_WEIGHTS)}) + 1])) AS tot FROM w) "
        f"SELECT doc_id, round(1.0 / (1.0 + exp(-({QC_BIAS!r} + "
        "CASE WHEN n > 0 THEN tot / n ELSE 0.0 END))), 6) AS quality_p FROM s"
    )
    # sequence packing: same shard hash (md5-prefix bucket % shards) and
    # per-shard running token offsets via a window sum
    sql["pack_sequences"] = (
        "WITH t AS (SELECT doc_id, len(" + _WORDS + ") AS n, "
        "(CAST(CONCAT('0x', SUBSTR(md5(CONCAT(CAST(doc_id AS VARCHAR), "
        "'pack')), 1, 15)) AS BIGINT) % 1000000) % 8 AS pack_shard "
        "FROM documents), "
        "o AS (SELECT doc_id, n, pack_shard, sum(n) OVER ("
        "PARTITION BY pack_shard ORDER BY doc_id "
        "ROWS UNBOUNDED PRECEDING) AS end_tok FROM t) "
        "SELECT doc_id, CAST(pack_shard AS INTEGER) AS pack_shard, "
        "CAST(end_tok - n AS BIGINT) AS start_tok, "
        "CAST(floor((end_tok - n) / 512) AS BIGINT) AS first_seq, "
        "CAST(greatest(floor((end_tok - 1) / 512), "
        "floor((end_tok - n) / 512)) AS BIGINT) AS last_seq FROM o"
    )
    # hamming near-dup join: brute-forced in SQL (bit_count over xor)
    sql["hamming_dupes"] = (
        "WITH h AS (SELECT doc_id, ('0x' || substring(md5("
        "array_to_string(string_split(text, ' ')[1:2], ' ')"
        "), 1, 15))::BIGINT AS h FROM documents) "
        "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
        "bit_count(xor(a.h, b.h))::INTEGER AS distance "
        "FROM h a JOIN h b ON a.doc_id < b.doc_id "
        "WHERE bit_count(xor(a.h, b.h)) <= 4"
    )
    sql["hamming_dedup"] = (
        "WITH h AS (SELECT doc_id, ('0x' || substring(md5("
        "array_to_string(string_split(text, ' ')[1:2], ' ')"
        "), 1, 15))::BIGINT AS h FROM documents), "
        "losers AS (SELECT DISTINCT b.doc_id FROM h a JOIN h b "
        "ON a.doc_id < b.doc_id WHERE bit_count(xor(a.h, b.h)) <= 4) "
        "SELECT h.doc_id, h.h FROM h LEFT JOIN losers l "
        "ON l.doc_id = h.doc_id WHERE l.doc_id IS NULL"
    )
    # MinHash-LSH, hash-green via the portable md5 variant: the oracle
    # replicates the ENTIRE pipeline (shingles → 32-perm signature →
    # 8 band keys → bucket cap → candidate join → exact-Jaccard verify)
    # from the same parameters — dedup.portable_lsh_sql is the generator
    from seqspark.pipeline.dedup import portable_lsh_sql

    _lsh = portable_lsh_sql(k=3, num_hashes=32, bands=8, seed=73)
    _lsh_stages = (
        "sh AS (SELECT id, {sh} AS sh FROM ws), "
        "sig AS (SELECT id, {sig} AS sig FROM sh), "
        "keyed AS (SELECT id, unnest({bands}) AS band FROM sig)"
    ).format(sh=_lsh["shingles"]("ws"), sig=_lsh["sig"]("sh"), bands=_lsh["bands"]("sig"))
    sql["minhash_lsh_pairs"] = (
        f"WITH ws AS (SELECT doc_id AS id, {_WORDS} AS ws FROM documents), "
        + _lsh_stages
        + ", capped AS (SELECT id, band FROM keyed "
        "QUALIFY row_number() OVER (PARTITION BY band ORDER BY id) <= 200), "
        "cands AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b "
        "FROM capped a JOIN capped b USING (band) WHERE a.id < b.id), "
        "j AS (SELECT c.id_a, c.id_b, "
        "len(list_intersect(sa.sh, sb.sh))::DOUBLE / "
        "len(list_distinct(sa.sh || sb.sh)) AS jac "
        "FROM cands c JOIN sh sa ON sa.id = c.id_a "
        "JOIN sh sb ON sb.id = c.id_b) "
        "SELECT id_a, id_b, round(jac, 3) AS jaccard FROM j WHERE jac >= 0.3"
    )
    # incremental LSH: corpus band STATE (uncapped, as persisted) joined
    # by a batch increment; within-batch side capped at 200 like the
    # Spark path; batch = odd ids + re-labeled %10==0 texts (planted dups)
    _b_stages = (
        "bsh AS (SELECT id, {sh} AS sh FROM bws), "
        "bsig AS (SELECT id, {sig} AS sig FROM bsh), "
        "bkeyed AS (SELECT id, unnest({bands}) AS band FROM bsig)"
    ).format(sh=_lsh["shingles"]("ws"), sig=_lsh["sig"]("sh"), bands=_lsh["bands"]("sig"))
    sql["incremental_lsh_dupes"] = (
        "WITH corpus AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 2 = 0), "
        "batch AS (SELECT doc_id AS id, text FROM documents WHERE doc_id % 2 = 1 "
        "UNION ALL SELECT doc_id + 500000 AS id, text "
        "FROM documents WHERE doc_id % 10 = 0), "
        f"ws AS (SELECT id, {_WORDS} AS ws FROM corpus), "
        + _lsh_stages
        + f", bws AS (SELECT id, {_WORDS} AS ws FROM batch), "
        + _b_stages
        + ", "
        "vs_corpus AS (SELECT b.id AS id_a, s.id AS id_b "
        "FROM bkeyed b JOIN keyed s USING (band) WHERE b.id != s.id), "
        "bcapped AS (SELECT id, band FROM bkeyed "
        "QUALIFY row_number() OVER (PARTITION BY band ORDER BY id) <= 200), "
        "within AS (SELECT a.id AS id_a, b.id AS id_b "
        "FROM bcapped a JOIN bcapped b USING (band) WHERE a.id > b.id), "
        "cands AS (SELECT DISTINCT id_a, id_b FROM "
        "(SELECT * FROM vs_corpus UNION ALL SELECT * FROM within)), "
        "ush AS (SELECT * FROM sh UNION ALL SELECT * FROM bsh), "
        "j AS (SELECT c.id_a, c.id_b, "
        "len(list_intersect(sa.sh, sb.sh))::DOUBLE / "
        "len(list_distinct(sa.sh || sb.sh)) AS jac "
        "FROM cands c JOIN ush sa ON sa.id = c.id_a "
        "JOIN ush sb ON sb.id = c.id_b) "
        "SELECT id_a, id_b, round(jac, 3) AS jaccard FROM j WHERE jac >= 0.3"
    )
    # built-in session_window twin: SQL gap-and-islands at MICROSECOND
    # precision (the gap compares event times before ms truncation, like
    # Spark's TimestampType), outputs truncated to ms like unix_millis
    sql["sessionize_native"] = (
        "WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events), "
        "m AS (SELECT user_id, us, CASE WHEN "
        "lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL "
        "OR us - lag(us) OVER (PARTITION BY user_id ORDER BY us) >= 600000000 "
        "THEN 1 ELSE 0 END AS brk FROM e), "
        "s AS (SELECT user_id, us, sum(brk) OVER (PARTITION BY user_id "
        "ORDER BY us ROWS UNBOUNDED PRECEDING) AS sid FROM m) "
        "SELECT user_id, CAST(min(us) // 1000 AS BIGINT) AS session_start_ms, "
        "CAST(max(us) // 1000 AS BIGINT) AS session_end_ms, "
        "count(*) AS n_events FROM s GROUP BY user_id, sid"
    )
    # sketch-balanced sampling: literal hyperplanes (lsh_oracle_sql) +
    # md5 rank — the whole selection replays in DuckDB
    from seqspark.pipeline.ann import lsh_oracle_sql

    _bal = lsh_oracle_sql(dim=64, bits=8, bands=1, seed=7)
    sql["sketch_balanced_sample"] = (
        f"WITH sk AS (SELECT vec_id, {_bal['sketch']('embedding::DOUBLE[]')} "
        "AS sketch FROM embeddings) "
        "SELECT vec_id, sketch FROM sk QUALIFY row_number() OVER ("
        "PARTITION BY sketch ORDER BY "
        "('0x' || substring(md5(vec_id::VARCHAR || 'balance:'), 1, 15))"
        "::BIGINT % 1000000, vec_id) <= 5"
    )
    # hyperplane-LSH ANN, hash-green: planes are seed-deterministic and
    # embedded as literals; same cosine idiom as ann_brute_topk
    _alsh = lsh_oracle_sql(dim=64, bits=12, bands=4, seed=7)
    _cos = "list_cosine_similarity(s.embedding::DOUBLE[], (SELECT qv FROM q))"
    sql["ann_lsh_topk"] = (
        "WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0), "
        f"qs AS (SELECT {_alsh['sketch']('(SELECT qv FROM q)')} AS qsk), "
        "sk AS (SELECT vec_id, embedding, "
        f"{_alsh['sketch']('embedding::DOUBLE[]')} AS sketch "
        "FROM embeddings WHERE vec_id <> 0) "
        f"SELECT s.vec_id, round({_cos}, 4) AS score FROM sk s, qs "
        f"WHERE {_alsh['band_cond']('s.sketch', 'qs.qsk')} "
        f"ORDER BY {_cos} DESC, s.vec_id ASC LIMIT 10"
    )
    # SimHash, hash-green via the portable 60-bit md5 fingerprint: the
    # oracle rebuilds per-token hashes, 60 sign-of-vote bits, and the
    # 15-bit band self-join from the same parameters
    from seqspark.pipeline.dedup import simhash_oracle_sql

    _sim = simhash_oracle_sql(bands=4, seed=73)
    sql["simhash_candidates"] = (
        f"WITH ws AS (SELECT doc_id AS id, {_WORDS} AS ws "
        "FROM documents WHERE doc_id < 100), "
        f"h AS (SELECT id, {_sim['hashes']('ws')} AS hs FROM ws), "
        f"fp AS (SELECT id, {_sim['fp']('hs')} AS fp FROM h), "
        f"keyed AS (SELECT id, unnest({_sim['bands']('fp')}) AS band FROM fp) "
        "SELECT DISTINCT a.id AS id_a, b.id AS id_b "
        "FROM keyed a JOIN keyed b USING (band) WHERE a.id < b.id"
    )
    # BPE encode: the oracle runs the IDENTICAL frozen replace-chain,
    # generated from the same BPE_MERGES literals the Spark plan froze in
    # (seqspark/pipeline/bpe.py docstring proves the chain == greedy BPE).
    # EOW (\x17) renders as '</w>' after the join — tokens never contain
    # spaces, so the post-join replace equals Spark's per-token replace.
    from seqspark.pipeline.bpe import EOW, bpe_oracle_chain_sql

    _chain = bpe_oracle_chain_sql(BPE_MERGES, "w")
    sql["bpe_encode"] = (
        f"WITH t AS (SELECT doc_id, flatten(list_transform({_WORDS}, "
        f"w -> {_chain})) AS toks FROM documents) "
        f"SELECT doc_id, replace(array_to_string(toks, ' '), "
        f"chr({ord(EOW)}), '</w>') AS bpe_text, "
        "CAST(len(toks) AS BIGINT) AS n_bpe_tokens FROM t"
    )
    # the dictionary encode path produces the identical output — same oracle
    sql["bpe_encode_dict"] = sql["bpe_encode"]
    # multimodal entries, hash-green (r11, formerly the last rows-only
    # three): the real-codec kernels are deterministic functions of the
    # deterministic fixture, so their outputs were digested ONCE
    # (tools/gen_multimodal_expected.py) and frozen as literals — the
    # same trick as ann_lsh_topk's literal hyperplanes, applied to
    # binary kernels. A decode/resize/dhash regression now FAILS the
    # contract; it cannot silently move the oracle.
    sql["frame_sample_gif"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {nf}, {fi}, '{sha}')"
            for i, nf, fi, sha in FRAME_SAMPLE_GIF_EXPECTED
        )
        + ") AS t(asset_id, n_frames, frame_index, frame_sha)"
    )
    sql["frame_sample_y4m"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {nf}, {fi}, '{sha}')"
            for i, nf, fi, sha in FRAME_SAMPLE_Y4M_EXPECTED
        )
        + ") AS t(asset_id, n_frames, frame_index, frame_sha)"
    )
    sql["frame_sample_apng"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {nf}, {fi}, '{sha}')"
            for i, nf, fi, sha in FRAME_SAMPLE_APNG_EXPECTED
        )
        + ") AS t(asset_id, n_frames, frame_index, frame_sha)"
    )
    sql["multimodal_decode"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{m}', CAST({nb} AS BIGINT), '{sha}', {w}, {h}, {nf})"
            for i, m, nb, sha, w, h, nf in MULTIMODAL_DECODE_EXPECTED
        )
        + ") AS t(asset_id, media_type, n_bytes, sha256, width, height, n_frames)"
    )
    sql["multimodal_resize"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{sha}', {nb}, {w}, {h})"
            for i, sha, nb, w, h in MULTIMODAL_RESIZE_EXPECTED
        )
        + ") AS t(asset_id, sha256, n_bytes, width, height)"
    )
    # dHash pairs: only the per-asset dHash values are frozen; the pair
    # SEMANTICS (every id<id pair within Hamming distance 4, planted
    # +1000 copies included, NULL audio hashes never pairing) are
    # REPLAYED in DuckDB as brute-force bit_count(xor) over the literal
    # table — pigeonhole banding is exact, so the sets must be equal
    _dh_vals = ", ".join(
        f"({i}, {'CAST(NULL AS BIGINT)' if d is None else f'CAST({d} AS BIGINT)'})"
        for i, d in IMAGE_DHASH_EXPECTED
    )
    sql["image_dhash_dupes"] = (
        f"WITH h(asset_id, dhash) AS (VALUES {_dh_vals}), "
        "hh AS (SELECT asset_id, dhash FROM h WHERE dhash IS NOT NULL "
        "UNION ALL "
        "SELECT asset_id + 1000, dhash FROM h WHERE dhash IS NOT NULL) "
        "SELECT a.asset_id AS id_a, b.asset_id AS id_b, "
        "CAST(bit_count(xor(a.dhash, b.dhash)) AS INTEGER) AS distance "
        "FROM hh a JOIN hh b ON a.asset_id < b.asset_id "
        "WHERE bit_count(xor(a.dhash, b.dhash)) <= 4"
    )
    # r12b baseline-JPEG entries: same frozen-digest discipline over the
    # JPEG fixture (gray/444/422/420, restart, wide DQT, odd dims) and
    # the MJPEG-AVI video fixture
    sql["multimodal_resize_jpeg"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, '{sha}', {nb}, {w}, {h})"
            for i, sha, nb, w, h in JPEG_RESIZE_EXPECTED
        )
        + ") AS t(asset_id, sha256, n_bytes, width, height)"
    )
    sql["image_dhash_jpeg"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, CAST({d} AS BIGINT))" for i, d in IMAGE_DHASH_JPEG_EXPECTED
        )
        + ") AS t(asset_id, dhash)"
    )
    sql["frame_sample_mjpeg"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {nf}, {fi}, '{sha}')"
            for i, nf, fi, sha in FRAME_SAMPLE_MJPEG_EXPECTED
        )
        + ") AS t(asset_id, n_frames, frame_index, frame_sha)"
    )
    sql["audio_features"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {sr}, {nc}, CAST({ns} AS BIGINT), {rms!r}, {zc!r}, "
            f"{cent!r}, CAST({fp} AS BIGINT))"
            for i, sr, nc, ns, rms, zc, cent, fp in AUDIO_FEATURES_EXPECTED
        )
        + ") AS t(asset_id, sample_rate, n_channels, n_samples, rms, zcr,"
        " centroid_hz, fingerprint)"
    )
    sql["audio_features_flac"] = (
        "SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, {sr}, {nc}, CAST({ns} AS BIGINT), {rms!r}, {zc!r}, "
            f"{cent!r}, CAST({fp} AS BIGINT))"
            for i, sr, nc, ns, rms, zc, cent, fp
            in AUDIO_FEATURES_FLAC_EXPECTED
        )
        + ") AS t(asset_id, sample_rate, n_channels, n_samples, rms, zcr,"
        " centroid_hz, fingerprint)"
    )
    from seqspark.pipeline.ann import pq_oracle_sql

    sql["ann_pq_topk"] = pq_oracle_sql(PQ_CODEBOOKS, PQ_QUERY, k=10)
    from seqspark.pipeline.ann import pq_rerank_oracle_sql

    sql["ann_pq_rerank"] = pq_rerank_oracle_sql(PQ_CODEBOOKS, PQ_QUERY, k=10)
    sql["ann_pq_batch"] = " UNION ALL ".join(
        f"SELECT {qi} AS query_id, vec_id, adist FROM ("
        + pq_oracle_sql(PQ_CODEBOOKS, qv, k=10)
        + ")"
        for qi, qv in ((0, PQ_QUERY), (1, SEMDEDUP_CENTROIDS[1]))
    )
    _udocs = ", ".join(
        f"({i}, {('NULL' if t is None else chr(39) + t.replace(chr(39), chr(39)*2) + chr(39))})"
        for i, t in UNIGRAM_FIXTURE_DOCS
    )
    _useg = ", ".join(
        "(" + repr(w) + ", [" + ", ".join(repr(t) for t in toks) + "])"
        for w, toks in UNIGRAM_SEG
    )
    sql["unigram_encode"] = (
        f"WITH docs(doc_id, text) AS (VALUES {_udocs}), "
        f"seg(w, toks) AS (VALUES {_useg}), "
        f"t AS (SELECT doc_id, text, {_WORDS} AS ws FROM docs), "
        "ex AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos, "
        "ws FROM t), "
        "exw AS (SELECT doc_id, pos, ws[pos] AS w FROM ex), "
        "j AS (SELECT e.doc_id, e.pos, s.toks FROM exw e "
        "JOIN seg s ON s.w = e.w), "
        "agg AS (SELECT doc_id, flatten(list(toks ORDER BY pos)) AS toks "
        "FROM j GROUP BY doc_id) "
        "SELECT d.doc_id, CASE WHEN d.text IS NULL THEN NULL "
        "ELSE coalesce(array_to_string(a.toks, ' '), '') END "
        "AS unigram_text, CASE WHEN d.text IS NULL THEN NULL ELSE "
        "CAST(coalesce(len(a.toks), 0) AS BIGINT) END AS n_unigram_tokens "
        "FROM docs d LEFT JOIN agg a USING (doc_id)"
    )
    _uvar = ", ".join(
        "(" + repr(w) + ", ["
        + ", ".join(
            "[" + ", ".join(repr(t) for t in v) + "]" for v in vs
        )
        + "])"
        for w, vs in UNIGRAM_VARIANTS
    )
    sql["unigram_sample_encode"] = (
        f"WITH docs(doc_id, text) AS (VALUES {_udocs}), "
        f"seg(w, variants) AS (VALUES {_uvar}), "
        f"t AS (SELECT doc_id, text, {_WORDS} AS ws FROM docs), "
        "ex AS (SELECT doc_id, unnest(generate_series(1, len(ws))) AS pos, "
        "ws FROM t), "
        # Spark's posexplode is 0-based: the md5 pick hashes pos-1
        "exw AS (SELECT doc_id, pos, ws[pos] AS w, "
        "(('0x' || substring(md5(doc_id::VARCHAR || ':' || "
        "(pos - 1)::VARCHAR || ':' || '7'), 1, 4))::INTEGER % 4 + 1) "
        "AS pick FROM ex), "
        "j AS (SELECT e.doc_id, e.pos, s.variants[e.pick] AS toks "
        "FROM exw e JOIN seg s ON s.w = e.w), "
        "agg AS (SELECT doc_id, flatten(list(toks ORDER BY pos)) AS toks "
        "FROM j GROUP BY doc_id) "
        "SELECT d.doc_id, CASE WHEN d.text IS NULL THEN NULL "
        "ELSE coalesce(array_to_string(a.toks, ' '), '') END "
        "AS unigram_text, CASE WHEN d.text IS NULL THEN NULL ELSE "
        "CAST(coalesce(len(a.toks), 0) AS BIGINT) END AS n_unigram_tokens "
        "FROM docs d LEFT JOIN agg a USING (doc_id)"
    )
    _fdh = ", ".join(
        f"({a}, {nf}, {fi}, CAST({d} AS BIGINT))"
        for a, nf, fi, d in FRAME_DHASH_EXPECTED
    )
    sql["video_keyframes"] = (
        f"WITH fdh(asset_id, n_frames, frame_index, dhash) AS "
        f"(VALUES {_fdh}), "
        "d AS (SELECT asset_id, n_frames, frame_index, CAST(CASE WHEN "
        "frame_index = 0 THEN 64 ELSE bit_count(xor(dhash, "
        "lag(dhash) OVER (PARTITION BY asset_id ORDER BY frame_index))) "
        "END AS INTEGER) AS novelty FROM fdh), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY asset_id "
        "ORDER BY novelty DESC, frame_index ASC) AS rk FROM d) "
        "SELECT asset_id, n_frames, frame_index, novelty FROM r "
        "WHERE rk <= 3"
    )
    _afp_vals = ", ".join(
        f"({i}, CAST({fp} AS BIGINT))" for i, fp in AUDIO_PAIR_FP_EXPECTED
    )
    sql["audio_dupes"] = (
        f"WITH h(asset_id, fp) AS (VALUES {_afp_vals}) "
        "SELECT a.asset_id AS id_a, b.asset_id AS id_b, "
        "CAST(bit_count(xor(a.fp, b.fp)) AS INTEGER) AS distance "
        "FROM h a JOIN h b ON a.asset_id < b.asset_id "
        "WHERE bit_count(xor(a.fp, b.fp)) <= 3"
    )
    return {k: v for k, v in sql.items() if v is not None}
