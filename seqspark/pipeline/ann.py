"""Similarity search over embedding columns (``array<float>``).

- :func:`brute_topk` — exact cosine top-k against one query vector: a
  single narrow projection + TakeOrderedAndProject; the correctness
  baseline and still the right answer for one-off queries (it reads each
  row once, no shuffle).
- :func:`hyperplane_sketch` / :func:`lsh_topk` — random-hyperplane LSH:
  sign-bit sketch per vector, candidates = rows whose sketch matches the
  query's in any band; exact cosine only on candidates. The scale path:
  at 100 TB the sketch is computed once at ingest and stored, so a query
  touches only matching buckets (partition by sketch prefix for pruning).
- :func:`ivf_assign` / :func:`ivf_topk` — IVF-style coarse quantization
  with provided centroids: probe only the nearest ``nprobe`` cells.

Dot products use ``F.zip_with`` + ``F.aggregate`` — vectorized JVM
expressions, no Python on the scan path.
"""

from __future__ import annotations

import math
import random
from typing import List, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_topk(
    emb: DataFrame, query_vec: Sequence[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: orderBy(score desc).limit(k) compiles to
    TakeOrderedAndProject — per-partition heaps + driver merge, no shuffle."""
    qn = math.sqrt(sum(v * v for v in query_vec)) or 1.0
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    score = (dot(F.col(vec_col), q) / (norm(F.col(vec_col)) * F.lit(qn))).alias("score")
    return (
        emb.select(F.col(id_col), score)
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def batch_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k for a SET of query vectors in ONE corpus pass.

    The query table is broadcast (it must be small — batch lookups, not a
    second corpus), every corpus row scores against every query via a
    BroadcastNestedLoopJoin (the one place an all-pairs product is
    *principled*: |corpus| × |Q| with tiny Q), and a per-query window
    keeps the top k (ties broken by id).

    Scale note: the window shuffles scored rows by query id, so each
    query's candidates funnel through one task — fine for the intended
    |Q| (≲ thousands); for query sets that are themselves corpus-sized,
    use the sketch/IVF paths per query instead. Output:
    (q_id_col, id_col, score DOUBLE) with exactly ≤ k rows per query.
    """
    from pyspark.sql import Window

    score = (
        dot(F.col(vec_col), F.col(q_vec_col))
        / (norm(F.col(vec_col)) * norm(F.col(q_vec_col)))
    ).alias("score")
    scored = emb.crossJoin(F.broadcast(queries)).select(
        F.col(q_id_col), F.col(id_col), score
    )
    w = Window.partitionBy(q_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> List[List[float]]:
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def hyperplane_sketch(
    emb: DataFrame, vec_col: str = "embedding", bits: int = 16, seed: int = 7,
    dim: int | None = None, out_col: str = "sketch",
) -> DataFrame:
    """Append an integer sign-sketch column: bit i = sign(v · h_i).

    Pass ``dim`` explicitly (library callers all do); the ``head()``
    fallback exists for interactive use only — it runs a driver-side probe,
    which a pipeline operator must not.

    The sketch is deterministic in (bits, seed), so compute it ONCE at
    ingest, persist the column (sketch-at-rest, like tokens-at-rest), and
    :func:`lsh_topk` will reuse it without touching the vectors."""
    if dim is None:
        import warnings

        warnings.warn(
            "sketching without an explicit dim runs a driver-side head() "
            "probe; pass dim=<embedding length> to hyperplane_sketch / "
            "embedding_cosine_dupes in pipelines",
            stacklevel=2,
        )
        first = emb.select(F.size(F.col(vec_col)).alias("d")).head()
        dim = int(first["d"]) if first else 0
    planes = _hyperplanes(dim, bits, seed)
    sketch = F.lit(0).cast("long")
    for i, h in enumerate(planes):
        hv = F.array(*[F.lit(float(x)) for x in h])
        sketch = sketch + F.when(dot(F.col(vec_col), hv) > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return emb.withColumn(out_col, sketch)


def _sketch_of(vec: Sequence[float], planes: List[List[float]]) -> int:
    s = 0
    for i, h in enumerate(planes):
        if sum(x * y for x, y in zip(vec, h)) > 0:
            s |= 1 << i
    return s


def lsh_topk(
    emb: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    bands: int = 4,
    seed: int = 7,
    sketch_col: str = "sketch",
) -> DataFrame:
    """Approximate top-k: keep rows whose sketch agrees with the query's on
    at least one band of bits, then exact cosine on the (small) candidate
    set. Recall is tuned with bits/bands; candidates shrink ~2^-bits/bands
    per band.

    Sketch-at-rest: if ``sketch_col`` already exists on the frame (persisted
    at ingest with :func:`hyperplane_sketch` under the same bits/seed), it
    is used as-is — the query then reads only the sketch column to prune
    and the vector column for the surviving candidates, never recomputing
    ``bits`` dot products per row."""
    dim = len(query_vec)
    planes = _hyperplanes(dim, bits, seed)
    qs = _sketch_of(list(query_vec), planes)
    width = bits // bands
    mask = (1 << width) - 1
    if sketch_col in emb.columns:
        sk = emb
    else:
        sk = hyperplane_sketch(
            emb, vec_col, bits=bits, seed=seed, dim=dim, out_col=sketch_col
        )
    cond = None
    for b in range(bands):
        qband = (qs >> (b * width)) & mask
        c = (
            F.shiftright(F.col(sketch_col), b * width).bitwiseAND(F.lit(mask))
            == F.lit(qband)
        )
        cond = c if cond is None else (cond | c)
    cands = sk.filter(cond)
    return brute_topk(cands, query_vec, k, id_col, vec_col)


def write_ivf(
    emb_with_cells: DataFrame, path: str, cell_col: str = "cell",
    mode: str = "overwrite",
) -> None:
    """Persist an IVF-assigned table partitioned by cell: `ivf_topk` filters
    on the partition column, so non-probed cells are pruned at the directory
    level and never read — the inverted-file property at 100 TB."""
    (
        emb_with_cells.repartition(cell_col)
        .write.partitionBy(cell_col)
        .mode(mode)
        .parquet(path)
    )


def ivf_assign(
    emb: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine) — the coarse
    quantizer of an IVF index. Centroids are a broadcast-size literal array."""
    if not centroids:
        raise ValueError("centroids must be non-empty (empty corpus?)")
    best = None
    best_cell = None
    for ci, c in enumerate(centroids):
        cv = F.array(*[F.lit(float(x)) for x in c])
        s = cosine(F.col(vec_col), cv)
        if best is None:
            best, best_cell = s, F.lit(ci)
        else:
            better = s > best
            best_cell = F.when(better, F.lit(ci)).otherwise(best_cell)
            best = F.when(better, s).otherwise(best)
    return emb.withColumn(out_col, best_cell)


def ivf_topk(
    emb_with_cells: DataFrame,
    centroids: Sequence[Sequence[float]],
    query_vec: Sequence[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """Probe the ``nprobe`` cells nearest to the query; exact cosine inside.
    With the table partitioned/bucketed by cell, non-probed cells are never
    read."""
    qn = math.sqrt(sum(v * v for v in query_vec)) or 1.0

    def cos_py(c: Sequence[float]) -> float:
        cn = math.sqrt(sum(x * x for x in c)) or 1.0
        return sum(x * y for x, y in zip(c, query_vec)) / (cn * qn)

    order = sorted(range(len(centroids)), key=lambda i: -cos_py(centroids[i]))
    probe = order[:nprobe]
    cands = emb_with_cells.filter(F.col(cell_col).isin(probe))
    return brute_topk(cands, query_vec, k, id_col, vec_col)


def ivf_update(
    emb: DataFrame,
    centroids: Sequence[Sequence[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """One Lloyd step for the IVF coarse quantizer: assign every vector to
    its max-cosine centroid, then element-wise mean per cell. Output
    ``(cell INT, pos INT, v DOUBLE)`` — the updated centroid coordinates.

    Plan: one narrow assignment projection + one (cell, pos) shuffle whose
    key space is k x dim, independent of corpus size."""
    assigned = ivf_assign(emb, centroids, vec_col=vec_col)
    return (
        assigned.select("cell", F.posexplode(F.col(vec_col)))
        .groupBy("cell", "pos")
        .agg(F.avg("col").alias("v"))
    )


def ivf_train(
    emb: DataFrame,
    k: int = 8,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> List[List[float]]:
    """Lloyd's k-means for the coarse quantizer. Deterministic: seeds are
    the ``k`` lowest-id vectors; assignment is max-cosine (the same metric
    :func:`ivf_topk` probes with); update is the element-wise mean.

    Only k x dim floats ever cross the driver per iteration — the same
    broadcast-centroid shape in which :func:`ivf_assign` consumes the
    result; the corpus itself never leaves the executors. Cells that lose
    every member keep their previous centroid."""
    if k < 1:
        raise ValueError("k must be >= 1")
    seeds = emb.orderBy(id_col).limit(k).select(vec_col).collect()
    if len(seeds) < k:
        raise ValueError(
            f"corpus has only {len(seeds)} vectors, fewer than k={k} — "
            "callers sizing structures to k would get a mismatched quantizer"
        )
    centroids = []
    for r in seeds:
        v = r[vec_col]
        if v is None or any(x is None for x in v):
            raise ValueError(
                "seed vectors are ragged or contain nulls — clean the "
                "embedding column before training"
            )
        centroids.append([float(x) for x in v])
    dim = len(centroids[0]) if centroids else 0
    for _ in range(iters):
        by_cell: dict = {}
        for r in ivf_update(emb, centroids, vec_col).collect():
            by_cell.setdefault(r["cell"], {})[r["pos"]] = r["v"]
        for ci in range(len(centroids)):
            got = by_cell.get(ci)
            if not got:
                continue  # empty cell keeps its previous centroid
            # a NULL mean (all-null elements) or a non-dense position set
            # (ragged vectors) would corrupt the centroid far from the bad
            # input — fail at the source instead
            if sorted(got) != list(range(dim)) or any(
                got[p] is None for p in got
            ):
                raise ValueError(
                    f"cell {ci}: vectors are ragged or contain nulls "
                    f"(positions {sorted(got)[:5]}..., expected dense "
                    f"0..{dim - 1})"
                )
            centroids[ci] = [got[p] for p in range(dim)]
    return centroids
