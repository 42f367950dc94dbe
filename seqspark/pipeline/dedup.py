"""Deduplication operators for large-scale training-data pipelines.

All variants are shuffle-frugal by construction:

- exact: hash-groupBy on a digest — one shuffle on a short key;
- MinHash-LSH: shingles → minhash signature → banded bucket keys →
  candidates join only *within buckets* (never an all-pairs crossJoin);
- SimHash: 64-bit signature, near-dups = bucket join on band keys;
- n-gram Jaccard: exact verification on LSH candidates only.

At 100 TB the bucket join is the only pairwise step and its fan-in is
bounded by bucket size; skewed buckets (boilerplate docs) should be salted
or capped with a per-bucket limit.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hof import let

# Large primes for the universal-hash family (public-domain constants).
_MERSENNE = (1 << 61) - 1


def exact_dedup(df: DataFrame, cols: Sequence[str], keep_by: str) -> DataFrame:
    """Keep one row per distinct value of ``cols`` (lowest ``keep_by``)."""
    w = Window.partitionBy(*[F.col(c) for c in cols]).orderBy(F.col(keep_by))
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def corpus_digests(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Distinct md5 digests of a corpus's documents — the compact "seen"
    state for :func:`incremental_dedup`. Narrow (one 32-char column);
    persist it per snapshot so the next batch dedups against digests,
    never against the corpus text."""
    return df.select(F.md5(F.col(text_col)).alias("digest")).distinct()


def incremental_dedup(
    new_df: DataFrame,
    seen: DataFrame,
    text_col: str = "text",
    keep_by: str = "doc_id",
    digest_col: str = "digest",
) -> DataFrame:
    """Exact-dedup a NEW batch against an already-ingested corpus: drop
    any document whose md5(text) appears in ``seen`` (a digests frame
    from :func:`corpus_digests`), then keep one survivor per digest
    WITHIN the batch (lowest ``keep_by``) — the daily-increment shape of
    production corpus builds, where re-deduping the full corpus per
    batch would be O(corpus) instead of O(batch).

    100 TB posture: the seen side is digests only (32 bytes/doc, not
    text), the anti-join and the within-batch window share the digest
    key (one hash partitioning serves both), and nothing rescans the
    historical corpus. Output: the surviving new rows plus ``__digest``
    dropped.
    """
    keyed = new_df.withColumn("__digest", F.md5(F.col(text_col)))
    # no .distinct() on the seen side: anti-join semantics never need a
    # deduplicated right side, and the aggregate would shuffle the whole
    # corpus digest set on every increment
    fresh = keyed.join(
        seen.select(F.col(digest_col).alias("__digest")),
        "__digest",
        "left_anti",
    )
    w = Window.partitionBy("__digest").orderBy(F.col(keep_by))
    return (
        fresh.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__digest")
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    sep: str = "\n\n",
    min_len: int = 0,
) -> DataFrame:
    """Corpus-wide EXACT paragraph dedup: split every document on ``sep``,
    keep each distinct paragraph's FIRST occurrence (ordered by
    (id, position)), and reassemble documents from their surviving
    paragraphs — the standard boilerplate-paragraph removal of web-corpus
    pipelines (repeated footers/cookie banners vanish from every document
    but the first).

    Paragraphs shorter than ``min_len`` characters bypass dedup entirely
    (headings like "Introduction" should not collapse across documents).

    Scale shape: one shuffle keyed by the paragraph digest (short key, not
    the paragraph text) to pick winners, one shuffle on ``id_col`` to
    reassemble. No window over the corpus, no join wider than
    (digest → winner). Output: (id_col, text_col) with ``text_col``
    rebuilt from surviving paragraphs in original order (possibly empty).
    """
    import re as _re

    pid = F.col(id_col)
    # F.split takes a Java REGEX while array_join below takes a literal —
    # escape the separator so both sides agree for any sep (a bare "|" or
    # ". " would otherwise split between every character)
    paras = (
        df.select(
            pid,
            F.posexplode(F.split(F.col(text_col), _re.escape(sep))).alias(
                "__pos", "__para"
            ),
        )
        .filter(F.length("__para") > 0)
    )
    protected = F.length("__para") < F.lit(min_len)
    digest = F.sha2(F.col("__para"), 256)
    keyed = paras.withColumn("__protected", protected).withColumn("__d", digest)
    # keyed feeds BOTH the winners aggregation and the reassembly join;
    # checkpoint lazily so the split/explode/digest computes once (same
    # pattern as the salted-LSH keyed frame)
    keyed = keyed.localCheckpoint(eager=False)
    # first occurrence per digest: min (id, pos) struct — map-side combining
    # aggregation, never a corpus-wide window
    winners = (
        keyed.filter(~F.col("__protected"))
        .groupBy("__d")
        .agg(F.min(F.struct(pid.alias("id"), F.col("__pos").alias("pos"))).alias("__w"))
    )
    # winners is distinct-paragraph-sized (not broadcastable at scale):
    # plain shuffle join on the digest, AQE picks the strategy
    kept = keyed.join(winners, "__d", "left").filter(
        F.col("__protected")
        | (
            (F.col("__w.id") == pid) & (F.col("__w.pos") == F.col("__pos"))
        )
    )
    rebuilt = kept.groupBy(pid).agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__pos"), F.col("__para")))
                ),
                lambda s: s["__para"],
            ),
            sep,
        ).alias(text_col)
    )
    # a document whose every paragraph deduped away keeps its row with an
    # empty text (callers decide whether to drop empties)
    return (
        df.select(pid)
        .join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col(text_col), F.lit("")))
    )


def shingles(text: Column, k: int = 5) -> Column:
    """Word k-shingles of a normalized text column (array<string>).

    The word array is :func:`~seqspark.pipeline.hof.let`-bound: referenced
    raw inside the transform lambda it would re-tokenize the whole text
    once per position (O(n²) per document)."""

    def build(ws: Column) -> Column:
        n = F.size(ws)
        idx = F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1)))
        return F.array_distinct(
            F.transform(idx, lambda i: F.array_join(F.slice(ws, i, k), " "))
        )

    return let(
        F.filter(
            F.split(F.lower(text), r"[^\p{L}\p{N}_]+"),
            lambda w: F.length(w) > 0,
        ),
        build,
    )


def _portable_perm_hash(s: Column, i: int) -> Column:
    """Engine-portable 60-bit permutation hash: md5-prefix of
    ``shingle || '|' || i`` parsed as an int — reproducible in any engine
    with md5 (DuckDB: ``('0x'||substring(md5(s||'|'||i),1,15))::BIGINT``),
    which is what lets the LSH contract entries be HASH-verified instead
    of rows-only. ~md5-cost per gram; the xxhash64 default stays the
    production path."""
    return F.conv(
        F.substring(F.md5(F.concat_ws("|", s, F.lit(str(i)))), 1, 15), 16, 10
    ).cast("long")


def minhash_signature(
    shingle_col: Column,
    num_hashes: int = 64,
    seed: int = 73,
    portable: bool = False,
) -> Column:
    """Array of ``num_hashes`` minima of per-permutation hashes.

    Permutation i is ``xxhash64(shingle, i)`` — xxhash64 is a built-in JVM
    expression, so the signature computes inside codegen, no UDFs. The
    shingle collection is ``let``-bound so the ``num_hashes`` transforms
    share ONE shingle evaluation instead of re-running the (split +
    k-gram) expression per permutation.

    ``portable=True`` swaps each permutation for the md5-prefix hash
    (:func:`_portable_perm_hash`, seeded ``seed + i``) so an external
    engine can replicate the signature bit-for-bit — the oracle
    requirement; keep the default for production runs.
    """
    def perm(i):
        if portable:
            return lambda s: _portable_perm_hash(s, seed + i)
        return lambda s: F.xxhash64(s, F.lit(seed + i))

    return let(
        shingle_col,
        lambda sh: F.array(
            *[
                F.array_min(F.transform(sh, perm(i)))
                for i in range(num_hashes)
            ]
        ),
    )


def band_keys(
    sig: Column, bands: int, rows_per_band: int, portable: bool = False
) -> Column:
    """LSH band keys: hash of each contiguous signature slice.

    ``portable=True`` keys on the joined slice ITSELF (no xxhash64 —
    hashing a band key only compacts it, never changes bucket identity),
    so an external engine reproduces the exact buckets."""
    def slice_str(b: int) -> Column:
        return F.array_join(
            F.transform(
                F.slice(sig, b * rows_per_band + 1, rows_per_band),
                lambda v: v.cast("string"),
            ),
            ",",
        )

    return F.array(
        *[
            F.concat(
                F.lit(f"b{b}:"),
                slice_str(b) if portable else F.xxhash64(slice_str(b)).cast("string"),
            )
            for b in range(bands)
        ]
    )


def portable_lsh_sql(
    k: int, num_hashes: int, bands: int, seed: int = 73
) -> dict:
    """DuckDB expression fragments mirroring the ``portable=True`` LSH
    path bit-for-bit, generated from the same parameters — what makes the
    LSH contract entries hash-verifiable instead of rows-only (same
    pattern as ``bpe.bpe_oracle_chain_sql``). Returns ``{"shingles":
    fn(ws_col), "sig": fn(sh_col), "bands": fn(sig_col)}`` — each a
    function of the column NAME holding the previous stage (use CTEs so
    every stage evaluates once, like the Spark side's ``let`` binding).

    Parity notes (verified by the contract entries + pytest):
    - ``coalesce(..., '')``: a zero-word document slices an empty list,
      which DuckDB turns into NULL where Spark's ``array_join`` gives
      ``''``;
    - DuckDB list slicing is 1-based inclusive (``ws[i:i+k-1]`` ==
      ``F.slice(ws, i, k)``), clamped at both ends like ``F.slice``;
    - the permutation hash is the md5-prefix 60-bit int
      (:func:`_portable_perm_hash`), identical text both engines.
    """
    rows = bands and num_hashes // bands

    def shingles_sql(ws: str) -> str:
        return (
            f"list_distinct(list_transform("
            f"generate_series(1, greatest(len({ws}) - {k - 1}, 1)), "
            f"i -> coalesce(array_to_string({ws}[i:i+{k - 1}], ' '), '')))"
        )

    def sig_sql(sh: str) -> str:
        mins = ", ".join(
            f"list_min(list_transform({sh}, s -> "
            f"('0x' || substring(md5(s || '|{seed + i}'), 1, 15))::BIGINT))"
            for i in range(num_hashes)
        )
        return f"[{mins}]"

    def bands_sql(sig: str) -> str:
        keys = ", ".join(
            f"'b{b}:' || array_to_string({sig}[{b * rows + 1}:{(b + 1) * rows}], ',')"
            for b in range(bands)
        )
        return f"[{keys}]"

    return {"shingles": shingles_sql, "sig": sig_sql, "bands": bands_sql}


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 200,
    salt: bool = False,
    portable: bool = False,
) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) via banded MinHash-LSH.

    Plan shape: project → explode band keys → self-join per bucket. The
    join key is the band bucket, so work scales with Σ bucket², not n².

    Pathological boilerplate buckets (every near-identical doc lands in the
    same bucket for every band) are handled one of two ways:

    - ``salt=False`` (default): members past ``max_bucket`` are DROPPED —
      bounded work, but docs past the cap are never candidates;
    - ``salt=True``: an oversized bucket splits into
      ``ceil(size / max_bucket)`` hash-assigned salt groups and pairs form
      within each group. Every doc stays a candidate (a boilerplate
      cluster resolves to one survivor per salt group instead of 300
      unexamined docs), and per-bucket work drops from size² to
      ~size × max_bucket — the right trade at 100 TB where web
      boilerplate makes million-doc buckets.
    """
    rows = bands and num_hashes // bands
    sig = minhash_signature(
        shingles(F.col(text_col), k), num_hashes, portable=portable
    )
    keyed = (
        df.select(F.col(id_col).alias("id"), sig.alias("sig"))
        .withColumn(
            "band",
            F.explode(band_keys(F.col("sig"), bands, rows, portable=portable)),
        )
        .select("id", "band")
    )
    if salt:
        # keyed feeds BOTH the hot-bucket count and the salted join, and
        # the two have different exchanges (no ReusedExchange): checkpoint
        # the (id, band) rows lazily so the minhash signatures compute once
        keyed = keyed.localCheckpoint(eager=False)
        # find the OVERSIZED buckets with a map-side-combining count (only
        # (band, partial) rows shuffle, never the full bucket through one
        # task) and broadcast just those — hot boilerplate buckets are few
        # by nature, so the broadcast side stays tiny and the keyed frame
        # is never re-shuffled before the salted join
        hot = (
            keyed.groupBy("band")
            .count()
            .filter(F.col("count") > max_bucket)
            .select(
                "band",
                F.ceil(F.col("count") / F.lit(max_bucket)).alias("__groups"),
            )
        )
        keyed = (
            keyed.join(F.broadcast(hot), "band", "left")
            .withColumn(
                "band",
                F.when(
                    F.col("__groups").isNotNull(),
                    F.concat(
                        F.col("band"),
                        F.lit("#"),
                        F.pmod(
                            F.xxhash64(F.col("id")), F.col("__groups")
                        ).cast("string"),
                    ),
                ).otherwise(F.col("band")),
            )
            .drop("__groups")
        )
    else:
        w = Window.partitionBy("band").orderBy("id")
        keyed = keyed.withColumn("__bn", F.row_number().over(w)).filter(
            F.col("__bn") <= max_bucket
        )
    a = keyed.select(F.col("band"), F.col("id").alias("id_a"))
    b = keyed.select(F.col("band"), F.col("id").alias("id_b"))
    pairs = (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    return pairs


def jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact n-gram Jaccard verification of candidate pairs.

    Joins each side's shingle set onto the (small) candidate list —
    broadcast when candidates fit — and computes |∩|/|∪| with
    array_intersect/union: JVM-side, no UDF.

    Only docs that APPEAR in a candidate pair shingle: ``df`` is
    semi-joined to the candidate id set before the (tokenize + k-gram)
    projection runs, so verification cost scales with the candidate
    set, not the corpus — an incremental caller can hand in
    ``corpus.unionByName(batch)`` without re-shingling history.
    """
    cand_ids = (
        candidates.select(F.col("id_a").alias("id"))
        .unionByName(candidates.select(F.col("id_b").alias("id")))
        .distinct()
    )
    sh = df.join(
        cand_ids, df[id_col] == cand_ids["id"], "left_semi"
    ).select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh")
    )
    out = (
        candidates.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b"))
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return out


def minhash_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.7,
    max_bucket: int = 200,
    salt: bool = False,
) -> DataFrame:
    """Rows surviving near-dedup: drop the higher-id member of every
    verified near-duplicate pair (greedy, deterministic)."""
    cands = minhash_lsh_candidates(
        df, id_col, text_col, k, num_hashes, bands, max_bucket, salt
    )
    dupes = (
        jaccard_pairs(df, cands, id_col, text_col, k, threshold)
        .select(F.col("id_b").alias("__dup_id"))
        .distinct()
    )
    # no broadcast hint (same reasoning as hamming_dedup): dupes is
    # corpus-dup-scale; AQE broadcasts when it fits
    return df.join(dupes, df[id_col] == dupes["__dup_id"], "left_anti")


def hamming_dedup(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_distance: int = 4,
    bits: int = 64,
    max_bucket: Optional[int] = None,
    salt: bool = False,
) -> DataFrame:
    """Rows surviving Hamming near-dedup: drop the higher-id member of
    every :func:`hamming_dupes` pair (greedy, deterministic) — the
    survivor-keep wrapper :func:`minhash_dedup` provides for the MinHash
    family, for bit-sketches (simhash text, dHash images). Greedy
    over-drops on chains like every greedy dedup; compose
    :func:`hamming_dupes` with :func:`dup_clusters`/:func:`cluster_dedup`
    when one-survivor-per-component semantics matter."""
    losers = (
        hamming_dupes(df, id_col, hash_col, max_distance, bits, max_bucket, salt)
        .select(F.col("id_b").alias("__dup"))
        .distinct()
    )
    # no broadcast hint: the loser set is corpus-dup-scale (potentially
    # billions at 100 TB) — let AQE pick broadcast when it actually fits
    return df.join(losers, df[id_col] == losers["__dup"], "left_anti")


def minhash_band_state(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: Optional[int] = None,
    portable: bool = False,
) -> DataFrame:
    """The persistable LSH state of a corpus snapshot: one (band, id) row
    per document per band. Store this next to the corpus (it is
    ``bands`` short rows per doc, no text) and the next increment
    near-dedups against it WITHOUT recomputing corpus signatures — the
    near-dup companion to :func:`corpus_digests`.

    Pass ``max_bucket`` to cap each band bucket at build time (lowest
    ids win): the cap is paid ONCE when the snapshot is persisted, so
    increments never re-sort the corpus state —
    :func:`incremental_lsh_candidates` joins the state as-is."""
    sig = minhash_signature(
        shingles(F.col(text_col), k), num_hashes, portable=portable
    )
    rows = bands and num_hashes // bands
    state = (
        df.select(F.col(id_col).alias("id"), sig.alias("sig"))
        .withColumn(
            "band",
            F.explode(band_keys(F.col("sig"), bands, rows, portable=portable)),
        )
        .select("band", "id")
    )
    if max_bucket is not None:
        state = _cap_buckets(state, max_bucket)
    return state


def _cap_buckets(frame: DataFrame, max_bucket: int) -> DataFrame:
    """Keep the ``max_bucket`` lowest-id members per (band) bucket — the
    one shared cap implementation for persisted state and batch sides
    (diverging cap semantics would silently desynchronize the join)."""
    w = Window.partitionBy("band").orderBy("id")
    return (
        frame.withColumn("__bn", F.row_number().over(w))
        .filter(F.col("__bn") <= max_bucket)
        .drop("__bn")
    )


def incremental_lsh_candidates(
    batch: DataFrame,
    state: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_hashes: int = 64,
    bands: int = 16,
    max_bucket: int = 200,
    portable: bool = False,
) -> DataFrame:
    """Near-duplicate CANDIDATE pairs for a new batch: ``(id_a, id_b)``
    where ``id_a`` is a batch doc and ``id_b`` is either a corpus doc
    (from :func:`minhash_band_state`'s persisted bands) or an
    earlier-id batch doc. Verify with :func:`jaccard_pairs` over
    ``corpus.select(id, text).unionByName(batch.select(id, text))``
    restricted to the candidates — verification joins texts for
    CANDIDATE ids only, so the corpus is touched selectively, not
    rescanned.

    100 TB posture: the batch band frame is built once via
    :func:`minhash_band_state` (one source of truth with the persisted
    side) and ``localCheckpoint``-ed; both joins key on the band
    bucket. ``max_bucket`` caps ONLY the within-batch self-join — a
    boilerplate-heavy batch must not pay bucket² there — and never the
    batch-vs-corpus join: that side is |batch bucket| x |capped state
    bucket|, linear in the batch, and capping it would silently let
    capped docs enter the corpus as undetected duplicates. The corpus
    state joins AS-IS: cap it once at persist time
    (``minhash_band_state(..., max_bucket=...)``), not per increment —
    re-sorting the whole corpus state every batch would be the
    O(corpus) work this function exists to avoid.
    """
    b_keyed = minhash_band_state(
        batch, id_col, text_col, k, num_hashes, bands, portable=portable
    ).localCheckpoint(eager=False)
    vs_corpus = (
        b_keyed.join(state.withColumnRenamed("id", "id_b"), "band")
        .select(F.col("id").alias("id_a"), "id_b")
        # a retried/overlapping increment can carry ids already present
        # in the persisted state — a doc must not candidate with itself
        # (it would then verify at jaccard 1.0 and greedily delete itself)
        .filter(F.col("id_a") != F.col("id_b"))
    )
    b_capped = _cap_buckets(b_keyed, max_bucket)
    a = b_capped.select("band", F.col("id").alias("id_a"))
    b = b_capped.select("band", F.col("id").alias("id_b"))
    within = (
        a.join(b, "band")
        .filter(F.col("id_a") > F.col("id_b"))  # earlier batch doc wins
        .select("id_a", "id_b")
    )
    return vs_corpus.unionByName(within).distinct()


def semantic_dedup_auto(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    iters: int = 5,
    kmin: int = 4,
    kmax: int = 65536,
) -> DataFrame:
    """One-call SemDeDup: size the quantizer with :func:`auto_k`
    (k ~ sqrt(N) from parquet footers), train centroids with
    :func:`seqspark.pipeline.ann.ivf_train`, and prune with
    :func:`semantic_dedup` — the measured operating point from
    BASELINE.md's k-sweep, packaged so callers don't re-derive it."""
    from .ann import ivf_train

    k = auto_k(emb, kmin, kmax)
    centroids = ivf_train(emb, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    return semantic_dedup(emb, centroids, threshold, id_col, vec_col)


class ClusterConvergenceError(RuntimeError):
    """dup_clusters did not converge within max_iter rounds."""


def dup_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over verified duplicate pairs → (id, root).

    Pairwise greedy dedup over-drops on chains (a~b, b~c drops both b and
    c even though a~c may be false); cluster-level dedup keeps exactly one
    survivor per component. Min-label propagation: every node starts as
    its own root and repeatedly takes the minimum root among itself and
    its neighbors — converges in O(component diameter) rounds (LSH dup
    components are star-ish, so a handful), each round one join + one
    groupBy over the PAIRS frame only (≪ corpus at 100 TB; the corpus
    itself is never touched until the final keep-join).
    """
    edges = pairs.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    sym = sym.persist()
    # per-round localCheckpoint: eager, truncates the lineage (which would
    # otherwise double per iteration) and lets Spark GC the previous
    # round's blocks once unreferenced
    labels = sym.select("u").distinct().withColumn("root", F.col("u"))
    labels = labels.localCheckpoint()
    changed = 1
    # diameter-d components need d improving rounds plus ONE round that
    # observes zero change, so a converged-at-exactly-max_iter component
    # must not trip the error: iterate max_iter + 1 times
    for _ in range(max_iter + 1):
        neigh = (
            sym.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("root").alias("nroot"))
        )
        new = (
            labels.join(neigh, "u", "left")
            .select(
                "u",
                F.least(
                    F.col("root"), F.coalesce(F.col("nroot"), F.col("root"))
                ).alias("root"),
                (F.col("nroot") < F.col("root")).alias("__chg"),
            )
            .localCheckpoint()
        )
        changed = new.filter(F.col("__chg")).limit(1).count()
        labels = new.drop("__chg")
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        # propagation distance exceeded max_iter: labels would silently
        # split one component into several "roots" — fail loudly instead
        # (`max_iter` bounds the component DIAMETER; raise it for long
        # chains)
        raise ClusterConvergenceError(
            f"label propagation did not converge in {max_iter} rounds; "
            "a component's diameter exceeds max_iter — raise max_iter"
        )
    return labels.select(F.col("u").alias("id"), F.col("root"))


def cluster_dedup(
    df: DataFrame, id_col: str, pairs: DataFrame, max_iter: int = 20
) -> DataFrame:
    """Keep one row (the cluster-min id) per duplicate component; rows in
    no component always survive. Anti-join against the non-root members —
    no broadcast hint: at web-corpus dup rates the loser set is
    corpus-sized, so the join must be allowed to shuffle (AQE still
    broadcasts it when it is actually small)."""
    comp = dup_clusters(pairs, max_iter)
    losers = comp.filter(F.col("id") != F.col("root")).select("id")
    return df.join(losers, df[id_col] == losers["id"], "left_anti")


def simhash(text: Column, bits: int = 64, portable: bool = False) -> Column:
    """64-bit SimHash of the token multiset.

    Classic Charikar scheme: per-token 64-bit hash votes ±1 on each bit;
    sign of the per-bit sum forms the fingerprint. Bit j extracted with
    shiftright/bitwise-and — all built-ins. The token-hash array is
    ``let``-bound so the ``bits`` per-bit vote folds share ONE
    tokenize+hash pass instead of re-running it per bit (a 64× constant
    saved on every row).

    ``portable=True`` swaps the per-token hash for the md5-prefix 60-bit
    int (:func:`_portable_perm_hash`, seed 73) so an external engine can
    replicate the fingerprint — pass ``bits=60`` with it (the hash has
    no entropy above bit 59). The xxhash64 default stays the production
    path.
    """
    def bit_set(h, j):
        # bit j of a signed 64-bit hash; sign bit read via h < 0 (1 << 63
        # overflows a SQL long literal)
        if j == 63:
            return h < 0
        return h.bitwiseAND(F.lit(1 << j)) != 0

    def vote_fn(j):
        # PySpark derives the lambda's SQL arity from its signature, so the
        # bit index must be closed over, not a default argument
        return lambda acc, h: acc + F.when(bit_set(h, j), 1).otherwise(-1)

    def build(hashes: Column) -> Column:
        bit_votes = [
            F.aggregate(hashes, F.lit(0).cast("long"), vote_fn(j))
            for j in range(bits)
        ]
        fp = F.lit(0).cast("long")
        for j, v in enumerate(bit_votes):
            weight = -(1 << 63) if j == 63 else (1 << j)  # two's-complement
            fp = fp + F.when(v > 0, F.lit(weight).cast("long")).otherwise(F.lit(0))
        return fp

    words = F.filter(
        F.split(F.lower(text), r"[^\p{L}\p{N}_]+"), lambda w: F.length(w) > 0
    )
    tok_hash = (
        (lambda w: _portable_perm_hash(w, 73)) if portable
        else (lambda w: F.xxhash64(w))
    )
    return let(F.transform(words, tok_hash), build)


def simhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bands: int = 4,
    portable: bool = False,
) -> DataFrame:
    """Near-dup candidates: docs sharing any 16-bit SimHash band
    (Hamming-distance ≤ bands-1 guarantee by pigeonhole). ``portable``
    switches to the 60-bit md5 fingerprint (15-bit bands at bands=4) an
    oracle can replicate — see :func:`simhash_oracle_sql`."""
    hash_bits = 60 if portable else 64
    width = hash_bits // bands
    fp = simhash(F.col(text_col), bits=hash_bits, portable=portable)
    keyed = df.select(F.col(id_col).alias("id"), fp.alias("fp"))
    keyed = keyed.withColumn(
        "band",
        F.explode(
            F.array(
                *[
                    F.concat(
                        F.lit(f"s{b}:"),
                        F.shiftright(F.col("fp"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .cast("string"),
                    )
                    for b in range(bands)
                ]
            )
        ),
    )
    a = keyed.select("band", F.col("id").alias("id_a"), F.col("fp").alias("fp_a"))
    b = keyed.select("band", F.col("id").alias("id_b"), F.col("fp").alias("fp_b"))
    return (
        a.join(b, "band")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "fp_a", "fp_b")
        .distinct()
    )


def simhash_oracle_sql(bands: int = 4, seed: int = 73) -> dict:
    """DuckDB fragments replicating the ``portable=True`` SimHash path
    (60-bit md5 token hashes): ``{"fp": fn(hashes_col), "bands":
    fn(fp_col), "hashes": fn(ws_col)}`` — the same
    generated-from-parameters pattern as :func:`portable_lsh_sql`."""
    hash_bits = 60
    width = hash_bits // bands

    def hashes_sql(ws: str) -> str:
        return (
            f"list_transform({ws}, w -> "
            f"('0x' || substring(md5(w || '|{seed}'), 1, 15))::BIGINT)"
        )

    def fp_sql(hs: str) -> str:
        terms = []
        for j in range(hash_bits):
            vote = (
                f"list_sum(list_transform({hs}, h -> "
                f"CASE WHEN (h >> {j}) & 1 = 1 THEN 1 ELSE -1 END))"
            )
            terms.append(
                f"CASE WHEN coalesce({vote}, 0) > 0 "
                f"THEN {1 << j}::BIGINT ELSE 0 END"
            )
        return "(" + " + ".join(terms) + ")"

    def bands_sql(fp: str) -> str:
        keys = ", ".join(
            f"'s{b}:' || (({fp} >> {b * width}) & {(1 << width) - 1})::VARCHAR"
            for b in range(bands)
        )
        return f"[{keys}]"

    return {"hashes": hashes_sql, "fp": fp_sql, "bands": bands_sql}


def embedding_cosine_dupes(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bits: int = 16,
    seed: int = 7,
    dim: int | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via random-hyperplane LSH prefilter +
    exact cosine on candidates (see :mod:`seqspark.pipeline.ann`).

    Pass ``dim`` (the embedding length) so the sketch builds without a
    driver-side probe; a pre-persisted ``sketch`` column is reused as-is."""
    from .ann import cosine, hyperplane_sketch

    if "sketch" in emb.columns:
        sk = emb
    else:
        sk = hyperplane_sketch(emb, vec_col, bits=bits, seed=seed, dim=dim)
    keyed = sk.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.col("sketch"))
    a = keyed.select("sketch", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = keyed.select("sketch", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        a.join(b, "sketch")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("v_a"), F.col("v_b")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
        .distinct()
    )


def auto_k(emb: DataFrame, kmin: int = 4, kmax: int = 65536) -> int:
    """The k ~ sqrt(N) operating point for :func:`seqspark.pipeline.ann.
    ivf_train` / :func:`semantic_dedup`: small k leaves fat cells (pair
    work is sum(|cell|^2)), large k pays k x dim assignment cost per row —
    the measured sweep in BASELINE.md (k=4/16/64 at fixed N) bottoms out
    near sqrt(N), the SemDeDup paper's own choice. This encodes that knob
    so callers don't re-derive it.

    N comes from the frame's parquet FOOTER metadata (driver-side reads
    of a few KB per file, zero Spark jobs — the same discipline as
    ``DocStore.bucket_row_count``); a frame with no parquet file source
    (in-memory test data, post-shuffle views) falls back to one
    ``count()`` job. The count is the SOURCE row count — an upstream
    filter makes it an overestimate, which only nudges k upward: fine
    for a knob.
    """
    import math

    files = [f for f in emb.inputFiles() if f.endswith(".parquet")]
    if files:
        spark = emb.sparkSession
        jvm = spark._jvm
        conf = spark._jsc.hadoopConfiguration()
        n = 0
        for f in files:
            inp = jvm.org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
                jvm.org.apache.hadoop.fs.Path(f), conf
            )
            reader = jvm.org.apache.parquet.hadoop.ParquetFileReader.open(inp)
            try:
                n += reader.getRecordCount()
            finally:
                reader.close()
    else:
        n = emb.count()
    return max(kmin, min(kmax, round(math.sqrt(max(n, 1)))))


def semantic_dedup_pairs(
    emb: DataFrame,
    centroids: Sequence[Sequence[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): assign every embedding to its nearest k-means
    centroid (max cosine, first-wins ties — :func:`seqspark.pipeline.ann.
    ivf_assign`), then compare pairs only WITHIN a cell.

    100 TB posture: centroids are a broadcast-size literal (k x dim
    floats), assignment is a narrow projection, and the pair join is
    keyed by cell — the pair count is sum(|cell|^2) instead of |corpus|^2,
    the paper's own scaling argument. Train centroids with
    :func:`seqspark.pipeline.ann.ivf_train` (k ~ sqrt(N) keeps cells
    small); a skewed cell shows up in the Spark UI as one fat join key
    and is fixed by retraining with larger k, not by salting (splitting a
    cell across salts would lose within-cell pairs).

    Output: ``(a, b, cell, cos)`` with a < b, cos >= threshold.
    """
    from .ann import cosine, ivf_assign

    cells = ivf_assign(emb, centroids, vec_col=vec_col, out_col="__cell").select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), "__cell"
    )
    a = cells.select(
        "__cell", F.col("__id").alias("a"), F.col("__v").alias("__va")
    )
    b = cells.select(
        "__cell", F.col("__id").alias("b"), F.col("__v").alias("__vb")
    )
    return (
        a.join(b, "__cell")
        .filter(F.col("a") < F.col("b"))
        .withColumn("cos", cosine(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos") >= threshold)
        .select("a", "b", F.col("__cell").alias("cell"), "cos")
    )


def semantic_dedup(
    emb: DataFrame,
    centroids: Sequence[Sequence[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Drop semantic near-duplicates: a row survives unless some
    SMALLER-id row in its cell sits within the cosine threshold.

    The keep rule is deterministic one-shot min-id (SemDeDup's one-shot
    within-cluster pruning with id rank standing in for the paper's
    centroid-distance rank — rank choice is a policy knob, the scaling
    shape is identical). Anti-join on the loser set: one shuffle beyond
    the pair join."""
    losers = (
        semantic_dedup_pairs(emb, centroids, threshold, id_col, vec_col)
        .select(F.col("b").alias(id_col))
        .distinct()
    )
    return emb.join(losers, id_col, "left_anti")


def duplicate_span_removal(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    out_col: str = "clean_text",
) -> DataFrame:
    """Corpus-wide duplicated-span removal — the k-gram approximation of
    exact substring deduplication (Lee et al. 2021, "Deduplicating
    Training Data Makes Language Models Better", which uses suffix
    arrays; a distributed engine approximates the same effect at k-word
    granularity, the approach NeMo-Curator/Dolma-style pipelines take).

    Every k-word window is hashed (md5 over the space-joined words); the
    FIRST occurrence corpus-wide — ordered by (doc id, position) — is
    kept, and every other occurrence marks its k positions for removal.
    A document's surviving words are re-joined in order (documents made
    entirely of duplicated text collapse to '').

    100 TB posture: two hash-keyed shuffles (winner-agg is map-side
    combinable min; occurrence/winner join shares the key) plus
    (doc, position)-keyed shuffles for reassembly — no corpus-wide
    window, no driver state; the covered-position explode is bounded by
    k x duplicate volume, not corpus size. Uniform md5 keys cannot skew.
    Reassembly is a positional anti-join over TOUCHED docs only (docs
    with no duplicated span never explode their words): per-doc cost is
    O(words + covered), strictly linear — the earlier
    ``array_contains(cover, i)`` membership scan was
    O(words x covered) per doc, which let one pathological
    100k-word mostly-duplicated document pin an executor core.

    Output: the input columns plus ``out_col``.
    """
    words = F.split(F.col(text_col), " ")

    def build_shingles(ws: Column) -> Column:
        # ws is let-bound: a raw `words` reference inside the transform
        # would re-split the whole text once per position (O(n²)/doc)
        n = F.size(ws)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - F.lit(k - 1)),
                lambda p: F.struct(
                    (p - 1).alias("pos"),
                    F.md5(F.array_join(F.slice(ws, p, k), " ")).alias("h"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<pos:int,h:string>>"))

    shingles = let(words, build_shingles)

    occ = df.select(
        F.col(id_col).alias("__did"), F.explode(shingles).alias("s")
    ).select("__did", F.col("s.pos").alias("__pos"), F.col("s.h").alias("__h"))

    winners = occ.groupBy("__h").agg(
        F.min(F.struct(F.col("__did").alias("d"), F.col("__pos").alias("p"))).alias(
            "__w"
        )
    )
    dups = occ.join(winners, "__h").filter(
        (F.col("__did") != F.col("__w.d")) | (F.col("__pos") != F.col("__w.p"))
    )
    covered = dups.select(
        "__did",
        F.explode(
            F.sequence(F.col("__pos"), F.col("__pos") + F.lit(k - 1))
        ).alias("__cp"),
    ).distinct()
    touched = covered.select("__did").distinct()
    # posexplode ONLY the touched docs' words, anti-join out the covered
    # positions, and rebuild in order — each stage linear in the doc
    doc_words = (
        df.join(touched, df[id_col] == touched["__did"], "left_semi")
        .select(
            F.col(id_col).alias("__did"),
            F.posexplode(words).alias("__wp", "__w"),
        )
    )
    rebuilt = (
        doc_words.join(
            covered,
            (doc_words["__did"] == covered["__did"])
            & (doc_words["__wp"] == covered["__cp"]),
            "left_anti",
        )
        .groupBy("__did")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("__wp", "__w"))
                    ),
                    lambda s: s["__w"],
                ),
                " ",
            ).alias("__clean")
        )
    )
    out = (
        df.join(
            touched.withColumn("__touched", F.lit(True)),
            df[id_col] == touched["__did"],
            "left",
        )
        .drop("__did")
        .join(rebuilt, df[id_col] == rebuilt["__did"], "left")
        .drop("__did")
    )
    # untouched docs keep their words verbatim (array_join(split(...))
    # round-trips exactly); a fully-covered doc collapses to ''
    clean = F.when(
        F.col("__touched").isNotNull(),
        F.coalesce(F.col("__clean"), F.lit("")),
    ).otherwise(F.array_join(words, " "))
    return out.withColumn(out_col, clean).drop("__touched", "__clean")


def hamming_dupes(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_distance: int = 4,
    bits: int = 64,
    max_bucket: Optional[int] = None,
    salt: bool = False,
) -> DataFrame:
    """Near-duplicate pairs under a Hamming-distance bound on a 64-bit
    hash column — exact, via pigeonhole banding: two hashes within
    distance d must agree on at least one of d+1 disjoint bit bands, so
    candidates come from equality joins on band values and ONLY
    candidates pay the popcount verify. Works on any bit-sketch —
    :func:`simhash` text sketches and
    :func:`seqspark.pipeline.multimodal.dhash_images` perceptual image
    hashes alike.

    100 TB posture: explode to d+1 rows per doc, shuffle keyed by
    (band index, band value) — pair work is Σ bucket² like every LSH
    family here, never corpus²; the verify is a single JVM
    ``bit_count(a ^ b)``. NULL hashes (undecodable images) never pair.

    Hot buckets: a degenerate asset population (constant-color images all
    share one dHash; near-empty texts all simhash to 0) puts every such
    row in the same band bucket → bucket² pair work. ``max_bucket``
    bounds that, via the same two mechanics as
    :func:`minhash_lsh_candidates`:

    - ``salt=False``: members past ``max_bucket`` per (band, value)
      bucket are DROPPED — bounded work, capped docs never pair through
      that band (they may still pair through their other d other bands);
    - ``salt=True``: an oversized bucket splits into
      ``ceil(size / max_bucket)`` hash-of-id salt groups and pairs form
      within each group — per-bucket work drops from size² to
      ~size × max_bucket. Like the MinHash salt this is an approximation
      on the hot key only: a pair whose ONLY agreeing band was salted
      apart is lost, but an identical-hash cluster (the case that makes
      buckets hot) still collapses transitively — every salt group pairs
      internally, so cluster-level dedup keeps one survivor per group
      instead of leaving a million-image bucket unexamined.

    ``max_bucket=None`` (default) is the exact unbounded join — identical
    output to pre-salt versions.

    Output: ``(id_a, id_b, distance INT)`` with id_a < id_b, distance
    <= max_distance, distinct.
    """
    n_bands = max_distance + 1
    if not 1 <= n_bands <= bits:
        raise ValueError(f"need 1..{bits} bands, got {n_bands}")
    width = bits // n_bands
    keyed = df.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("__id"), F.col(hash_col).alias("__h")
    )
    bands = []
    for i in range(n_bands):
        off = i * width
        if i == n_bands - 1:
            # last band = all remaining high bits: arithmetic shiftright
            # alone is a band-equality key (sign extension is a function
            # of the top bit, itself part of the band), and a 64-bit
            # all-ones mask would not even fit a long literal
            val = F.shiftright(F.col("__h"), off)
        else:
            mask = (1 << width) - 1
            val = F.shiftright(F.col("__h"), off).bitwiseAND(F.lit(mask))
        bands.append(F.struct(F.lit(i).alias("band"), val.alias("val")))
    exploded = keyed.select(
        "__id", "__h", F.explode(F.array(*bands)).alias("b")
    ).select("__id", "__h", F.col("b.band").alias("__band"), F.col("b.val").alias("__val"))
    if max_bucket is not None:
        if salt:
            # both the hot-bucket count and the salted join read this
            # frame through different exchanges — checkpoint lazily so
            # the band explode computes once (same shape as the MinHash
            # salt at minhash_lsh_candidates)
            exploded = exploded.localCheckpoint(eager=False)
            hot = (
                exploded.groupBy("__band", "__val")
                .count()
                .filter(F.col("count") > max_bucket)
                .select(
                    "__band", "__val",
                    F.ceil(F.col("count") / F.lit(max_bucket)).alias("__groups"),
                )
            )
            exploded = (
                exploded.join(F.broadcast(hot), ["__band", "__val"], "left")
                .withColumn(
                    "__salt",
                    F.when(
                        F.col("__groups").isNotNull(),
                        F.pmod(F.xxhash64(F.col("__id")), F.col("__groups")),
                    ).otherwise(F.lit(0)),
                )
                .drop("__groups")
            )
        else:
            w = Window.partitionBy("__band", "__val").orderBy("__id")
            exploded = exploded.withColumn(
                "__bn", F.row_number().over(w)
            ).filter(F.col("__bn") <= max_bucket).drop("__bn").withColumn(
                "__salt", F.lit(0)
            )
    else:
        exploded = exploded.withColumn("__salt", F.lit(0))
    a = exploded.select(
        F.col("__band").alias("band"), F.col("__val").alias("val"),
        F.col("__salt").alias("slt"),
        F.col("__id").alias("id_a"), F.col("__h").alias("ha"),
    )
    b = exploded.select(
        F.col("__band").alias("band"), F.col("__val").alias("val"),
        F.col("__salt").alias("slt"),
        F.col("__id").alias("id_b"), F.col("__h").alias("hb"),
    )
    return (
        a.join(b, ["band", "val", "slt"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "distance",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).cast("int"),
        )
        .filter(F.col("distance") <= max_distance)
        .select("id_a", "id_b", "distance")
        .distinct()
    )
