"""OPQ rotation + residual IVF-PQ (r13): the two public recall levers
production tunes at fixed scan cost (Ge et al. 2013 OPQ-NP; residual
encoding as in the original IVFADC of Jégou et al. 2011). Pins:
orthogonality, recall improvement on adversarial (rotated-basis /
clustered) corpora, DuckDB oracle parity for both paths, NULL hygiene,
and the identity-rotation degenerate case."""

import math

import numpy as np
import pytest

from seqspark.pipeline import ann


def _rot_corpus(n=160, dim=16, seed=5):
    """Data with variance concentrated along a NON-axis-aligned basis:
    axis-aligned subspace split (plain PQ) sees correlated coordinates
    everywhere; OPQ should recover (approximately) the mixing rotation."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.normal(0, 1, (dim, dim)))
    scales = np.geomspace(3.0, 0.05, dim)
    Z = rng.normal(0, 1, (n, dim)) * scales
    X = Z @ Q.T
    return [(i, [float(x) for x in X[i]], "x") for i in range(n)]


@pytest.fixture(scope="module")
def rot_emb(spark):
    rows = _rot_corpus()
    return rows, spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).cache()


def _recall(spark_df_ids, exact_ids):
    return len(set(spark_df_ids) & set(exact_ids)) / len(exact_ids)


def test_opq_rotation_is_orthogonal(spark, rot_emb):
    rows, emb = rot_emb
    R, books = ann.opq_train(emb, m=4, k=8, iters=3, opq_iters=4)
    Rm = np.array(R)
    assert Rm.shape == (16, 16)
    # 6dp rounding of the literals -> loose orthogonality tolerance
    assert np.abs(Rm @ Rm.T - np.eye(16)).max() < 1e-4
    m, k, dsub = ann._pq_check(books)
    assert (m, k, dsub) == (4, 8, 4)


def test_opq_beats_pq_on_rotated_basis(spark, rot_emb):
    rows, emb = rot_emb
    X = np.array([r[1] for r in rows])
    pq_books = ann.pq_train(emb, m=4, k=8, iters=3)
    R, opq_books = ann.opq_train(emb, m=4, k=8, iters=3, opq_iters=6)
    pq_codes = ann.pq_encode(emb, pq_books).cache()
    opq_codes = ann.pq_encode(emb, opq_books, rotation=R).cache()
    r_pq, r_opq = [], []
    for qi in (3, 17, 42, 71, 99):
        q = rows[qi][1]
        exact = np.argsort(
            ((X - np.array(q)) ** 2).sum(axis=1), kind="stable"
        )[:10].tolist()
        pq_ids = [r["vec_id"] for r in
                  ann.pq_topk(pq_codes, pq_books, q, k=10).collect()]
        opq_ids = [r["vec_id"] for r in
                   ann.opq_topk(opq_codes, opq_books, R, q, k=10).collect()]
        r_pq.append(_recall(pq_ids, exact))
        r_opq.append(_recall(opq_ids, exact))
    # rotation-aligned quantization must recover strictly more of the
    # exact top-10 on this construction (typical gap here is ~2x)
    assert sum(r_opq) > sum(r_pq), (r_pq, r_opq)
    assert sum(r_opq) / 5 >= 0.5, r_opq


def test_opq_oracle_sql_parity(spark, rot_emb):
    import duckdb
    import pandas as pd

    rows, emb = rot_emb
    R, books = ann.opq_train(emb, m=4, k=8, iters=3, opq_iters=3)
    q = rows[7][1]
    sp = pd.DataFrame(
        [(r["vec_id"], r["adist"]) for r in
         ann.opq_topk(ann.pq_encode(emb, books, rotation=R),
                      books, R, q, k=8).collect()],
        columns=["vec_id", "adist"],
    )
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}))
    oc = con.execute(ann.pq_oracle_sql(books, q, k=8, rotation=R)).df()
    assert sp.reset_index(drop=True).equals(oc.reset_index(drop=True))


def test_pq_encode_identity_rotation_matches_plain(spark):
    # vectors already at 6dp -> the rotation path's round(X @ I, 6) is a
    # no-op and codes must equal the unrotated encoder's exactly
    rng = np.random.default_rng(8)
    rows = [(i, [round(float(x), 6) for x in rng.normal(0, 1, 16)], "x")
            for i in range(60)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")
    books = ann.pq_train(emb, m=4, k=8, iters=2)
    eye = [[1.0 if i == j else 0.0 for j in range(16)] for i in range(16)]
    plain = {r["vec_id"]: r["code"]
             for r in ann.pq_encode(emb, books).collect()}
    rot = {r["vec_id"]: r["code"]
           for r in ann.pq_encode(emb, books, rotation=eye).collect()}
    assert plain == rot


def _clustered_corpus(n=180, dim=16, nc=3, seed=11, spread=0.15):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 2.0, (nc, dim))
    X = np.array([centers[i % nc] + rng.normal(0, spread, dim)
                  for i in range(n)])
    return centers, [(i, [float(x) for x in X[i]], "x") for i in range(n)]


def test_residual_beats_plain_ivfpq_recall(spark):
    centers, rows = _clustered_corpus()
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string").cache()
    X = np.array([r[1] for r in rows])
    cents = ann.ivf_train(emb, k=3, iters=4)
    books_plain = ann.pq_train(emb, m=4, k=8, iters=3)
    cells = ann.ivf_assign(emb, cents).select("vec_id", "cell", "embedding")
    plain = ann.pq_encode(emb, books_plain).join(
        cells.select("vec_id", "cell"), "vec_id").cache()

    # residual codebooks: train on residual vectors (sampled driver-side
    # like pq_train, via the residual of each row against its cell)
    crows = cells.orderBy("vec_id").limit(512).collect()
    Xr = np.array([
        np.array(r["embedding"]) - np.array(cents[r["cell"]])
        for r in crows
    ])
    books_res = [
        [[round(float(x), 6) for x in c] for c in C]
        for C in ann._pq_fit(Xr, 4, 8, 3)
    ]
    res = ann.pq_encode_residual(cells, cents, books_res).cache()

    rec_plain, rec_res = [], []
    for qi in (2, 31, 64, 97, 120):
        q = rows[qi][1]
        exact = np.argsort(
            ((X - np.array(q)) ** 2).sum(axis=1), kind="stable"
        )[:10].tolist()
        p_ids = [r["vec_id"] for r in ann.ivf_pq_topk(
            plain, cents, books_plain, q, k=10, nprobe=2).collect()]
        r_ids = [r["vec_id"] for r in ann.ivf_pq_residual_topk(
            res, cents, books_res, q, k=10, nprobe=2).collect()]
        rec_plain.append(_recall(p_ids, exact))
        rec_res.append(_recall(r_ids, exact))
    # residuals are tiny vs cluster offsets here: the same codebook
    # budget resolves them far better (measured: 0.58 vs 0.36 mean
    # recall@10 with m=4,k=8 — the relative gap is the pinned claim)
    assert sum(rec_res) > sum(rec_plain) + 0.5, (rec_plain, rec_res)
    assert sum(rec_res) / 5 >= 0.5, rec_res


def test_residual_oracle_sql_parity(spark):
    import duckdb
    import pandas as pd

    centers, rows = _clustered_corpus(n=120, seed=23)
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string")
    cents = ann.ivf_train(emb, k=3, iters=3)
    cells = ann.ivf_assign(emb, cents).select("vec_id", "cell", "embedding")
    crows = cells.orderBy("vec_id").limit(256).collect()
    Xr = np.array([
        np.array(r["embedding"]) - np.array(cents[r["cell"]])
        for r in crows
    ])
    books = [
        [[round(float(x), 6) for x in c] for c in C]
        for C in ann._pq_fit(Xr, 4, 8, 2)
    ]
    codes = ann.pq_encode_residual(cells, cents, books)
    q = rows[9][1]
    sp = pd.DataFrame(
        [(r["vec_id"], r["adist"]) for r in ann.ivf_pq_residual_topk(
            codes, cents, books, q, k=8, nprobe=2).collect()],
        columns=["vec_id", "adist"],
    )
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}))
    oc = con.execute(
        ann.ivf_pq_residual_oracle_sql(cents, books, q, k=8, nprobe=2)
    ).df()
    assert sp.reset_index(drop=True).equals(oc.reset_index(drop=True))


def test_residual_null_hygiene(spark):
    cents = [[0.0] * 8, [10.0] * 8]
    books = [[[0.0] * 4, [1.0] * 4] for _ in range(2)]
    emb = spark.createDataFrame(
        [(1, 0, [0.5] * 8), (2, 0, None), (3, 1, [1.0] * 7),
         (4, None, [0.5] * 8), (5, 7, [0.5] * 8)],
        "vec_id long, cell int, embedding array<double>",
    )
    got = {r["vec_id"]: r["code"] for r in
           ann.pq_encode_residual(emb, cents, books).collect()}
    assert got[1] is not None
    assert got[2] is None and got[3] is None  # null / ragged vector
    assert got[4] is None and got[5] is None  # null / out-of-range cell
    top = ann.ivf_pq_residual_topk(
        ann.pq_encode_residual(emb, cents, books), cents, books,
        [0.5] * 8, k=5, nprobe=2)
    assert [r["vec_id"] for r in top.collect()] == [1]


def test_opq_and_residual_plan_shapes(spark, rot_emb):
    rows, emb = rot_emb
    R, books = ann.opq_train(emb, m=4, k=8, iters=2, opq_iters=2)
    codes = ann.pq_encode(emb, books, rotation=R)
    plan = ann.opq_topk(codes, books, R, rows[0][1], k=5)._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan

    cents = [[0.0] * 16, [1.0] * 16]
    emb_cells = ann.ivf_assign(emb, cents).select(
        "vec_id", "cell", "embedding")
    rcodes = ann.pq_encode_residual(emb_cells, cents, books)
    rplan = ann.ivf_pq_residual_topk(
        rcodes, cents, books, rows[0][1], k=5, nprobe=2)._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in rplan
    assert "Exchange" not in rplan  # union of pruned branches, no shuffle


def test_opq_batch_matches_per_query(spark, rot_emb):
    # pq_batch_topk(rotation=R) must be row-identical to per-query
    # opq_topk — the single-query path is the pinned semantics
    rows, emb = rot_emb
    R, books = ann.opq_train(emb, m=4, k=8, iters=2, opq_iters=2)
    codes = ann.pq_encode(emb, books, rotation=R).cache()
    queries = spark.createDataFrame(
        [(0, rows[3][1]), (1, rows[40][1])],
        "query_id int, query_vec array<double>",
    )
    batched = {}
    for r in ann.pq_batch_topk(codes, queries, books, k=7,
                               rotation=R).collect():
        batched.setdefault(r["query_id"], []).append(
            (r["vec_id"], r["adist"]))
    for qi, qv in ((0, rows[3][1]), (1, rows[40][1])):
        single = [(r["vec_id"], r["adist"]) for r in
                  ann.opq_topk(codes, books, R, qv, k=7).collect()]
        assert batched[qi] == single, qi


class TestTrainSampleOrder:
    """r14 (verdict #3): the trainers' bounded sample must not be the
    lowest-id slice by default — ids in this engine embed the ingest
    timestamp, so id-order sampling trains quantizers on only the OLDEST
    corpus slice and content drift goes unrepresented at 100 TB. The
    default is now md5(id) order (deterministic, layout-independent,
    uniform over the whole id range); ``sample_order="id"`` keeps the
    legacy mode the frozen oracle fixtures replay as SQL."""

    def _drift_emb(self, spark, n=200, dim=8):
        # first half centered at -1, second half (later ids) at +1:
        # a corpus whose content drifted over ingest time
        rows = [
            (i, [(-1.0 if i < n // 2 else 1.0) + 0.001 * ((i * 7) % 10)]
             * dim, "x")
            for i in range(n)
        ]
        return rows, spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label string")

    def test_hash_sample_spans_id_range(self, spark):
        rows, emb = self._drift_emb(spark)
        got = ann._train_sample(emb, "vec_id", 40, "hash") \
            .select("vec_id").collect()
        ids = [r["vec_id"] for r in got]
        assert len(ids) == 40
        # a uniform draw of 40 from [0, 200) lands in both halves;
        # the id-order draw by construction cannot
        assert any(i < 100 for i in ids) and any(i >= 100 for i in ids)
        id_ids = [r["vec_id"] for r in
                  ann._train_sample(emb, "vec_id", 40, "id")
                  .select("vec_id").collect()]
        assert id_ids == list(range(40))  # legacy mode unchanged

    def test_hash_sample_is_layout_independent(self, spark):
        rows, emb = self._drift_emb(spark)
        a = [r["vec_id"] for r in
             ann._train_sample(emb.repartition(7), "vec_id", 25, "hash")
             .select("vec_id").collect()]
        b = [r["vec_id"] for r in
             ann._train_sample(emb.coalesce(1), "vec_id", 25, "hash")
             .select("vec_id").collect()]
        assert a == b

    def test_default_codebooks_see_drifted_content(self, spark):
        rows, emb = self._drift_emb(spark)
        import numpy as np
        # id-order sample = only the old (-1) mode: every centroid near -1
        books_id = ann.pq_train(emb, m=2, k=4, iters=3, sample=64,
                                sample_order="id")
        assert all(c[0] < 0 for cb in books_id for c in cb)
        # hash-order default: centroids cover BOTH modes
        books_hash = ann.pq_train(emb, m=2, k=4, iters=3, sample=64)
        signs = {c[0] > 0 for cb in books_hash for c in cb}
        assert signs == {True, False}

    def test_ivf_train_seed_order_modes(self, spark):
        rows, emb = self._drift_emb(spark)
        # legacy seeding reproduces lowest-id seeds (oracle-replay mode)
        cents_id = ann.ivf_train(emb, k=2, iters=0, sample_order="id")
        assert cents_id == [list(map(float, rows[0][1])),
                            list(map(float, rows[1][1]))]
        # default seeding converges on the true two-mode structure
        cents = ann.ivf_train(emb, k=2, iters=4)
        m0, m1 = sorted(c[0] for c in cents)
        assert m0 < 0 < m1

    def test_bad_sample_order_rejected(self, spark):
        rows, emb = self._drift_emb(spark)
        with pytest.raises(ValueError, match="sample_order"):
            ann.pq_train(emb, m=2, k=4, sample_order="random")


class TestScalarQuantization:
    """r14: SQ8 — per-dim linear uint8 (the faiss SQ8 operating point).
    Pins: near-exact recall (the 4x point should dominate PQ's 32x on
    recall), DuckDB replay parity via floor(x+0.5), pure-JVM plans,
    NULL hygiene, constant-dimension degenerate case."""

    def test_recall_near_exact_and_beats_pq(self, spark, rot_emb):
        rows, emb = rot_emb
        q = [float(v) for v in rows[3][1]]
        exact = [r["vec_id"] for r in ann.brute_l2_topk(emb, q, k=10).collect()]
        bounds = ann.sq_train(emb, sample=160, sample_order="id")
        codes = ann.sq_encode(emb, bounds)
        sq_ids = [r["vec_id"] for r in
                  ann.sq_topk(codes, bounds, q, k=10).collect()]
        sq_rec = _recall(sq_ids, exact)
        assert sq_rec >= 0.9, sq_rec
        books = ann.pq_train(emb, m=8, k=8, sample=160, sample_order="id")
        pq_ids = [r["vec_id"] for r in ann.pq_topk(
            ann.pq_encode(emb, books), books, q, k=10).collect()]
        assert sq_rec >= _recall(pq_ids, exact)

    def test_duckdb_replay_parity(self, spark, rot_emb):
        import duckdb

        rows, emb = rot_emb
        q = [float(v) for v in rows[7][1]]
        bounds = ann.sq_train(emb, sample=160, sample_order="id")
        got = [(r["vec_id"], r["adist"]) for r in ann.sq_topk(
            ann.sq_encode(emb, bounds), bounds, q, k=10).collect()]
        con = duckdb.connect()
        con.register("embeddings_src", __import__("pandas").DataFrame(
            {"vec_id": [r[0] for r in rows],
             "embedding": [r[1] for r in rows]}))
        con.execute("CREATE VIEW embeddings AS SELECT * FROM embeddings_src")
        want = con.execute(ann.sq_oracle_sql(bounds, q, k=10)).fetchall()
        assert got == [(a, b) for a, b in want]

    def test_plans_pure_jvm(self, spark, rot_emb):
        _rows, emb = rot_emb
        bounds = ann.sq_train(emb, sample=160, sample_order="id")
        codes = ann.sq_encode(emb, bounds)
        p_enc = codes._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in p_enc  # no crossing anywhere
        q = [0.0] * 16
        p_top = ann.sq_topk(codes, bounds, q, k=5)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "TakeOrderedAndProject" in p_top and "Python" not in p_top

    def test_null_and_constant_dim_hygiene(self, spark):
        emb = spark.createDataFrame(
            [(1, [0.5, 2.0]), (2, [0.25, 2.0]), (3, None),
             (4, [0.1]), (5, [None, 2.0])],
            "vec_id long, embedding array<double>",
        )
        # dim 2 is CONSTANT in the sample -> inv 1.0, codes clamp to 0
        bounds = ann.sq_train(
            emb.filter("vec_id <= 2"), sample=10, sample_order="id")
        assert bounds[1][1] == 1.0
        rows = {r["vec_id"]: r["code"] for r in
                ann.sq_encode(emb, bounds).collect()}
        assert rows[3] is None and rows[4] is None and rows[5] is None
        assert rows[1] is not None and rows[1][1] == 0
        got = ann.sq_topk(ann.sq_encode(emb, bounds), bounds,
                          [0.5, 2.0], k=10).collect()
        assert [r["vec_id"] for r in got] == [1, 2]  # NULLs filtered


def test_ivf_sq_compose_and_prune(spark, rot_emb):
    """r14: IVF + SQ8 (the faiss IVF-SQ8 shape) — probed-cells-only SQ
    scoring equals plain sq_topk restricted to those cells, and recall
    rises with nprobe toward the full-scan SQ result."""
    rows, emb = rot_emb
    q = [float(v) for v in rows[11][1]]
    bounds = ann.sq_train(emb, sample=160, sample_order="id")
    cents = ann.ivf_train(emb, k=4, iters=4, sample_order="id")
    assigned = ann.ivf_assign(emb, cents)
    codes = ann.sq_encode(assigned, bounds, extra_cols=("cell",))
    full = [r["vec_id"] for r in ann.sq_topk(
        codes, bounds, q, k=10).collect()]
    rec = {}
    for nprobe in (1, 2, 4):
        ids = [r["vec_id"] for r in ann.ivf_sq_topk(
            codes, cents, bounds, q, k=10, nprobe=nprobe).collect()]
        rec[nprobe] = len(set(ids) & set(full)) / 10
    assert rec[4] == 1.0  # all cells probed == full-scan SQ
    assert rec[1] <= rec[2] <= rec[4]
    # plan stays pure-JVM with the cell filter visible
    p = ann.ivf_sq_topk(codes, cents, bounds, q, k=5, nprobe=2)\
        ._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in p and "TakeOrderedAndProject" in p


class TestSQIncrementalBounds:
    """r16 (verdict #6): SQ8 min/max bounds are additive sufficient
    statistics — folded batch-by-batch through the shared crash-safe
    state swap, so growing the corpus never rescans it. Pins:
    fold == retrain-on-the-union (bit-for-bit, including sq_train's 6dp
    rounding), fold order independence, re-derivation from the persisted
    state alone, and the staleness contract (old bounds only SATURATE
    new out-of-range dims to 0/255, in-range dims quantize exactly)."""

    def test_fold_equals_retrain_on_union(self, spark, tmp_path, rot_emb):
        from pyspark.sql import functions as F

        rows, emb = rot_emb
        b1 = emb.filter(F.col("vec_id") % 2 == 0)
        b2 = emb.filter(F.col("vec_id") % 2 == 1)
        path = str(tmp_path / "sqstate")
        ann.sq_bounds_update(spark, path, b1)
        state = ann.sq_bounds_update(spark, path, b2)
        got = ann.sq_state_bounds(state)
        # sample >= corpus makes sq_train the exact union answer
        want = ann.sq_train(emb, sample=10**6, sample_order="hash")
        assert got == want
        # fold order must not matter (min/max are associative+commutative)
        path2 = str(tmp_path / "sqstate2")
        ann.sq_bounds_update(spark, path2, b2)
        assert ann.sq_state_bounds(
            ann.sq_bounds_update(spark, path2, b1)) == want
        # re-derive later from the persisted state alone — no corpus scan
        assert ann.sq_state_bounds(spark.read.parquet(path)) == want
        # the state never grows past dim rows
        assert spark.read.parquet(path).count() == len(rows[0][1])
        # and codes under folded bounds are the retrained codes
        a = ann.sq_encode(emb, got).orderBy("vec_id").collect()
        b = ann.sq_encode(emb, want).orderBy("vec_id").collect()
        assert [r["code"] for r in a] == [r["code"] for r in b]

    def test_stale_bounds_saturate_only_new_outliers(self, spark, tmp_path):
        old = spark.createDataFrame(
            [(i, [float(i % 7), float(10 + i % 5)]) for i in range(20)],
            "vec_id long, embedding array<double>",
        )
        path = str(tmp_path / "sqstate")
        stale = ann.sq_state_bounds(ann.sq_bounds_update(spark, path, old))
        # new batch: dim 0 explodes past the old max, dim 1 stays in range
        new = spark.createDataFrame(
            [(100, [1000.0, 12.0]), (101, [-1000.0, 11.0]),
             (102, [3.0, 13.0])],
            "vec_id long, embedding array<double>",
        )
        codes = {r["vec_id"]: r["code"] for r in
                 ann.sq_encode(new, stale).collect()}
        assert codes[100][0] == 255 and codes[101][0] == 0  # saturated
        mins, invs = stale
        for vid, vec in ((100, [1000.0, 12.0]), (101, [-1000.0, 11.0]),
                         (102, [3.0, 13.0])):
            want = math.floor((vec[1] - mins[1]) * invs[1] + 0.5)
            assert codes[vid][1] == want  # in-range dims quantize exactly
        # folding the new batch extends exactly the outlier dims
        fresh = ann.sq_state_bounds(ann.sq_bounds_update(spark, path, new))
        assert fresh[0][0] == -1000.0 and fresh[0][1] == stale[0][1]

    def test_state_hygiene(self, spark, tmp_path):
        from pyspark.sql import functions as F

        # NULL and ragged-NULL vectors are skipped like sq_encode
        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (2, None), (3, [None, 9.0])],
            "vec_id long, embedding array<double>",
        )
        b = ann.sq_dim_bounds(df).orderBy("pos").collect()
        assert [(r["pos"], r["mn"], r["mx"]) for r in b] == [
            (0, 1.0, 1.0), (1, 2.0, 2.0)]
        with pytest.raises(ValueError, match="empty"):
            ann.sq_state_bounds(df.limit(0).select(
                F.lit(0).alias("pos"), F.lit(0.0).alias("mn"),
                F.lit(0.0).alias("mx")))
