"""Similarity-search tests: brute-force vs numpy, ANN recall, near-dup
pair detection on planted duplicates."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import types as T

from chapterhousedb_spark.operators.similarity import (
    cosine_topk,
    embedding_near_dup_pairs,
    ivf_ann_topk,
    srp_ann_topk,
)

DIMS = 16
N = 200


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(42)
    # two clusters + noise, plus planted near-duplicates of vector 0
    centers = rng.normal(size=(2, DIMS))
    vecs = []
    for i in range(N):
        c = centers[i % 2]
        vecs.append(c + 0.3 * rng.normal(size=DIMS))
    vecs[1] = vecs[0] + 0.001 * rng.normal(size=DIMS)  # planted near-dup pair (0,1)
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        ]
    )
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], schema
    )
    return df, np.array([np.array(v, dtype=np.float32) for v in vecs])


def _numpy_topk(mat: np.ndarray, q: np.ndarray, k: int) -> list[int]:
    qd = q.astype(np.float64)
    md = mat.astype(np.float64)
    cos = (md @ qd) / (np.linalg.norm(md, axis=1) * np.linalg.norm(qd))
    order = sorted(range(len(cos)), key=lambda i: (-cos[i], i))
    return order[:k]


def test_bruteforce_topk_matches_numpy(vectors):
    df, mat = vectors
    q = [1.0] * DIMS
    got = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
    assert got == _numpy_topk(mat, np.array(q), 10)


def test_bruteforce_is_take_ordered(vectors):
    df, _ = vectors
    plan = cosine_topk(df, [1.0] * DIMS, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrdered" in plan, "top-k must not be a full sort"


def test_ann_recall(vectors):
    df, mat = vectors
    q = [1.0] * DIMS
    exact = set(_numpy_topk(mat, np.array(q), 10))
    got = {r["vec_id"] for r in srp_ann_topk(df, q, k=10, planes=4, multiprobe=1).collect()}
    # 4 planes / 16 buckets on clustered data: expect most of the true top-k
    assert len(got & exact) >= 5


def test_multiprobe_expands_probe_set_and_recall_is_monotone(vectors):
    from chapterhousedb_spark.operators.similarity import srp_probe_buckets

    # probe-set algebra: hamming<=h shells are disjoint and complete
    p1 = srp_probe_buckets(0b1010, planes=4, multiprobe=1)
    p2 = srp_probe_buckets(0b1010, planes=4, multiprobe=2)
    assert len(p1) == 1 + 4 and len(set(p1)) == len(p1)
    assert len(p2) == 1 + 4 + 6 and set(p1) < set(p2)
    p_all = srp_probe_buckets(0, planes=4, multiprobe=4)
    assert sorted(p_all) == list(range(16))  # full hamming ball = all buckets

    # recall is monotone in multiprobe; multiprobe=planes == exact
    df, mat = vectors
    q = [1.0] * DIMS
    exact = _numpy_topk(mat, np.array(q), 10)
    hits = []
    for mp in (0, 1, 2, 4):
        got = {
            r["vec_id"]
            for r in srp_ann_topk(df, q, k=10, planes=4, multiprobe=mp).collect()
        }
        hits.append(len(got & set(exact)))
    assert hits == sorted(hits), f"recall not monotone in multiprobe: {hits}"
    full = [
        r["vec_id"] for r in srp_ann_topk(df, q, k=10, planes=4, multiprobe=4).collect()
    ]
    assert full == exact, "multiprobe=planes must equal brute force"
    with pytest.raises(ValueError):
        srp_ann_topk(df, q, planes=4, multiprobe=5)


def test_ivf_ann_recall_and_full_probe_exactness(vectors):
    df, mat = vectors
    q = [1.0] * DIMS
    exact = _numpy_topk(mat, np.array(q), 10)
    # partial probe: clustered data, cells adapt -> high recall
    got = {
        r["vec_id"]
        for r in ivf_ann_topk(df, q, k=10, n_cells=4, nprobe=2).collect()
    }
    assert len(got & set(exact)) >= 7
    # probing every cell must equal brute force exactly (incl. order)
    full = [
        r["vec_id"]
        for r in ivf_ann_topk(df, q, k=10, n_cells=4, nprobe=4).collect()
    ]
    assert full == exact


def test_pinned_srp_signs_match_spark_derivation(spark):
    """The oracle SQL embeds the SRP hyperplane sign matrix as literals
    (DuckDB can't compute Spark's xxhash64). Assert the pinned matrix
    and probe set still equal the live derivation — any change to
    planes/seed/hash must break here before it breaks the oracle."""
    from pyspark.sql import functions as F

    from chapterhousedb_spark.workload.llm import _SRP_SIGNS, _srp_probes

    rows = (
        spark.range(6 * 64)
        .select(
            F.col("id").cast("int").alias("i"),
            F.expr("(xxhash64(CAST(id AS INT), 7) & 1) * 2 - 1").alias("s"),
        )
        .collect()
    )
    live = [0] * (6 * 64)
    for r in rows:
        live[r["i"]] = r["s"]
    assert [live[p * 64 : (p + 1) * 64] for p in range(6)] == _SRP_SIGNS
    assert _srp_probes() == [3, 33, 34, 35, 39, 43, 51]
    # the second hash table's matrix (seed 101 — srp_multitable_ann)
    from chapterhousedb_spark.workload.llm import _SRP_SIGNS_101

    rows101 = (
        spark.range(6 * 64)
        .select(
            F.col("id").cast("int").alias("i"),
            F.expr("(xxhash64(CAST(id AS INT), 101) & 1) * 2 - 1").alias("s"),
        )
        .collect()
    )
    live101 = [0] * (6 * 64)
    for r in rows101:
        live101[r["i"]] = r["s"]
    assert [live101[p * 64 : (p + 1) * 64] for p in range(6)] == _SRP_SIGNS_101
    assert _SRP_SIGNS_101 != _SRP_SIGNS  # genuinely independent tables


def test_srp_multitable_union_semantics(spark):
    """srp_ann_topk(seeds=[...]) — multi-table LSH (VERDICT r14 #5):
    seeds=[s] equals the single-table seed=s path exactly; the
    multi-table candidate set CONTAINS every member table's (so its
    top-k cosine can only improve toward exact); multiprobe=planes
    degenerates every table to a full scan == brute force; seeds=[]
    raises."""
    import pytest as _pytest

    from chapterhousedb_spark.operators.similarity import (
        cosine_topk,
        srp_ann_topk,
    )

    df = spark.createDataFrame(
        [
            (i, [float((i * 7 + j * 3) % 11 - 5) / 5.0 for j in range(8)])
            for i in range(60)
        ],
        "vec_id long, embedding array<float>",
    )
    qv = [0.4, -0.2, 0.9, 0.1, -0.6, 0.3, 0.2, -0.8]
    one = srp_ann_topk(
        df, qv, k=10, planes=6, multiprobe=1, seed=7
    ).collect()
    one_as_list = srp_ann_topk(
        df, qv, k=10, planes=6, multiprobe=1, seeds=[7]
    ).collect()
    assert [r["vec_id"] for r in one] == [r["vec_id"] for r in one_as_list]
    # containment: every single-table top-k cosine <= the union's kth
    multi = srp_ann_topk(
        df, qv, k=10, planes=6, multiprobe=1, seeds=[7, 101, 211]
    ).collect()
    exact = cosine_topk(df, qv, k=10).collect()
    def score_sum(rows):
        return sum(r["cosine"] for r in rows)
    assert (
        score_sum(one) <= score_sum(multi) + 1e-12 <= score_sum(exact) + 2e-12
    )
    # degenerate: multiprobe=planes on every table == brute force
    full = srp_ann_topk(
        df, qv, k=10, planes=6, multiprobe=6, seeds=[7, 101]
    ).collect()
    assert [(r["vec_id"], r["cosine"]) for r in full] == [
        (r["vec_id"], r["cosine"]) for r in exact
    ]
    with _pytest.raises(ValueError, match="at least one"):
        srp_ann_topk(df, qv, k=10, planes=6, seeds=[])


def test_embedding_near_dup_finds_planted_pair(vectors):
    df, _ = vectors
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_near_dup_pairs(df, threshold=0.999, planes=4).collect()
    }
    assert (0, 1) in pairs
    assert pairs[(0, 1)] > 0.999


def test_embedding_near_dup_multi_seed_raises_recall(spark):
    """Each extra blocking seed is an independent SRP pass: at planes=12
    a cosine~0.96 pair collides per pass with p~0.3, so 3 seeds must
    strictly beat 1 on a corpus of planted pairs, while candidates are
    deduped before the exact verify (no duplicate output pairs)."""
    import math
    import random

    random.seed(11)
    dims, n_pairs = 16, 40
    rows = []
    for i in range(n_pairs):
        v = [random.gauss(0, 1) for _ in range(dims)]
        nv = math.sqrt(sum(x * x for x in v))
        v = [x / nv for x in v]
        # perturb to land near cosine ~0.96
        w = [x + random.gauss(0, 0.28 / math.sqrt(dims)) for x in v]
        rows.append((2 * i, v))
        rows.append((2 * i + 1, w))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])

    def planted_found(seeds):
        found = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                df, threshold=0.9, seeds=seeds
            ).collect()
        }
        assert len(found) == len(set(found))
        return sum((2 * i, 2 * i + 1) in found for i in range(n_pairs))

    single = planted_found([7])
    multi = planted_found([7, 8, 9])
    assert multi > single, (single, multi)
    assert multi <= n_pairs
    # single-seed shorthand unchanged: seeds=None + seed=7 == seeds=[7]
    a = sorted(
        map(tuple, embedding_near_dup_pairs(df, threshold=0.9, seed=7).collect())
    )
    b = sorted(
        map(tuple, embedding_near_dup_pairs(df, threshold=0.9, seeds=[7]).collect())
    )
    assert a == b


def test_ivf_fit_assign_probe_split(spark):
    """The split quantizer: ivf_assign (pure JVM expression) must agree
    with Spark ML's own transform-time assignment, the precomputed-
    centroid path must equal the fit-inline path, and the assign plan
    must contain no Python eval (usable at streaming ingest)."""
    import random

    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    from chapterhousedb_spark.operators.similarity import (
        _unit_expr,
        ivf_ann_topk,
        ivf_assign,
        ivf_fit,
        ivf_probe_cells,
    )
    from chapterhousedb_spark.plans import physical_plan

    random.seed(3)
    rows = [
        (i, [random.gauss(c, 0.3) for _ in range(8)])
        for c in (-2.0, 0.0, 2.0)
        for i in range(100 * int(c + 3), 100 * int(c + 3) + 60)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = ivf_fit(df, n_cells=3, seed=7)
    assert len(cents) == 3 and all(len(c) == 8 for c in cents)

    got = {
        r["vec_id"]: r["ivf_cell"] for r in ivf_assign(df, cents).collect()
    }
    model = KMeans(k=3, seed=7, featuresCol="__v").fit(
        df.select(array_to_vector(_unit_expr("embedding")).alias("__v"))
    )
    # rebuild the reference assignment against OUR centroids (KMeans
    # label ids may permute between fits; distances may not)
    import numpy as np

    centers = np.asarray(cents)
    ref = {}
    for r in df.collect():
        v = np.asarray(r["embedding"], dtype=float)
        v = v / np.linalg.norm(v)
        ref[r["vec_id"]] = int(((centers - v) ** 2).sum(axis=1).argmin())
    assert got == ref

    plan = physical_plan(ivf_assign(df, cents))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    q = rows[0][1]
    a = [tuple(r) for r in ivf_ann_topk(df, q, k=5, n_cells=3, nprobe=1).collect()]
    b = [
        tuple(r)
        for r in ivf_ann_topk(df, q, k=5, nprobe=1, centroids=cents).collect()
    ]
    assert a == b
    assert set(ivf_probe_cells(cents, q, 3)) == {0, 1, 2}


def test_ivf_index_roundtrip_across_sessions(spark, tmp_path):
    """The fit-once-per-corpus-version production shape: ivf_write_index
    persists a cell-PARTITIONED corpus + plain-JSON centroids;
    ivf_read_index in a FRESH session reloads both, probe results are
    identical to the in-memory path, and the probe's scan touches only
    the probed cells' files (partition pruning)."""
    from chapterhousedb_spark.operators.similarity import (
        ivf_ann_topk,
        ivf_fit,
        ivf_probe_cells,
        ivf_probe_topk,
        ivf_read_index,
        ivf_write_index,
    )
    from chapterhousedb_spark.workload.registry import load
    from tests.conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    cents = ivf_fit(emb, n_cells=4, seed=7)
    path = str(tmp_path / "ivf_index")
    ivf_write_index(emb, cents, path)

    q = emb.orderBy("vec_id").first()["embedding"]
    expected = [
        tuple(r)
        for r in ivf_ann_topk(
            emb, q, k=5, nprobe=2, centroids=cents
        ).collect()
    ]

    fresh = spark.newSession()
    corpus, cents2 = ivf_read_index(fresh, path)
    assert cents2 == cents  # JSON round-trip is exact (plain lists)
    got_df = ivf_probe_topk(corpus, cents2, q, k=5, nprobe=2)
    assert [tuple(r) for r in got_df.collect()] == expected

    # partition pruning: the cell filter reaches the scan as a
    # PARTITION filter (file-level pruning on the cell directories),
    # not a post-scan predicate (inputFiles() can't show this — it
    # lists the relation's full file set pre-pruning)
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    pf = scan.split("PartitionFilters: [")[1].split("]")[0]
    assert "ivf_cell" in pf
    for cell in ivf_probe_cells(cents2, q, 2):
        assert str(cell) in pf


def test_embedding_cross_equals_self_join_cross_pairs(spark, sf_dir):
    """Bipartite SRP gate == union self-join restricted to
    batch><corpus pairs, on a real embeddings split (ids renumbered so
    the sides are disjoint namespaces)."""
    from pyspark.sql import functions as F

    from chapterhousedb_spark.operators.dedup import release_self_join_caches
    from chapterhousedb_spark.operators.similarity import (
        embedding_near_dup_pairs,
        embedding_near_dup_pairs_cross,
    )

    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    corpus = embs.filter(F.col("vec_id") % 5 != 0)
    batch = embs.filter(F.col("vec_id") % 5 == 0).withColumn(
        "vec_id", F.col("vec_id") + 1_000_000
    )
    # 0.2 / 3 seeds is the non-vacuous setting on the sf0.001 vectors
    # (16 cross-split pairs measured); 0.45 single-seed finds none here
    cross = {
        (r["batch_id"], r["corpus_id"], round(r["cosine"], 9))
        for r in embedding_near_dup_pairs_cross(
            batch, corpus, threshold=0.2, seeds=[7, 11, 13]
        ).collect()
    }
    union = corpus.unionByName(batch)
    want = {
        (max(r["id_a"], r["id_b"]), min(r["id_a"], r["id_b"]), round(r["cosine"], 9))
        for r in embedding_near_dup_pairs(
            union, threshold=0.2, seeds=[7, 11, 13]
        ).collect()
        if (r["id_a"] >= 1_000_000) != (r["id_b"] >= 1_000_000)
    }
    release_self_join_caches()
    assert len(cross) > 0, "threshold must be non-vacuous on this data"
    assert cross == want


def test_ivf_append_incremental_index_maintenance(spark, tmp_path):
    """The vector-side ingest twin of the cross-dedup gates: ivf_append
    assigns a batch against the FROZEN centroids and appends only the
    touched cell partitions. Invariants: (a) the appended index equals
    a full rebuild with the same centroids over the union — probe
    results identical at any nprobe; (b) a full probe (nprobe=n_cells)
    equals brute-force cosine over the union; (c) probes stay
    partition-pruned after the append."""
    from chapterhousedb_spark.operators.similarity import (
        cosine_topk,
        ivf_fit,
        ivf_probe_topk,
        ivf_read_index,
        ivf_append,
        ivf_write_index,
    )
    from chapterhousedb_spark.workload.registry import load
    from tests.conftest import SF_SMOKE

    from pyspark.sql import functions as F

    emb = load(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    base = emb.filter(F.col("vec_id") < n // 2)
    batch = emb.filter(F.col("vec_id") >= n // 2).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    cents = ivf_fit(base, n_cells=4, seed=7)
    path = str(tmp_path / "ivf_inc")
    ivf_write_index(base, cents, path)
    got_cents = ivf_append(batch, path)
    assert got_cents == cents  # centroids frozen, read from metadata

    corpus, cents2 = ivf_read_index(spark, path)
    union = base.unionByName(batch)
    assert corpus.count() == union.count()

    q = emb.orderBy("vec_id").first()["embedding"]
    # (a) == rebuild with same centroids
    rebuilt_path = str(tmp_path / "ivf_rebuilt")
    ivf_write_index(union, cents, rebuilt_path)
    rebuilt, _ = ivf_read_index(spark, rebuilt_path)
    for nprobe in (2, 4):
        got = [tuple(r) for r in ivf_probe_topk(corpus, cents2, q, k=5, nprobe=nprobe).collect()]
        want = [tuple(r) for r in ivf_probe_topk(rebuilt, cents, q, k=5, nprobe=nprobe).collect()]
        assert got == want, nprobe
    # (b) full probe == brute force over the union
    full = [tuple(r) for r in ivf_probe_topk(corpus, cents2, q, k=5, nprobe=4).collect()]
    brute = [tuple(r) for r in cosine_topk(union, q, k=5).collect()]
    assert full == brute
    # (c) pruning survives the append
    pruned = ivf_probe_topk(corpus, cents2, q, k=5, nprobe=1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan


@pytest.mark.parametrize("by_residual", [False, True])
def test_pq_append_equals_rebuild_with_frozen_state(
    spark, tmp_path, vectors, by_residual
):
    """pq_append (VERDICT r9 #2): a batch encoded against the FROZEN
    centroids/codebooks from pq.json and appended to the touched cell
    partitions must be indistinguishable — at any nprobe and refine,
    for both the plain and by_residual layouts — from a rebuild that
    encodes the union with the same frozen state. Partition pruning
    must survive the append."""
    from chapterhousedb_spark.operators.similarity import (
        _write_json_artifact,
        ivf_assign,
        pq_append,
        pq_encode,
        pq_probe_topk,
        pq_write_index,
        residual_frame,
    )
    from pyspark.sql import functions as F

    df, _ = vectors
    base = df.filter(F.col("vec_id") < N // 2)
    batch = df.filter(F.col("vec_id") >= N // 2).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    path = str(tmp_path / "pq_inc")
    meta = pq_write_index(
        base, path, n_cells=4, m=4, nbits=4, max_iter=2, by_residual=by_residual
    )
    got_meta = pq_append(batch, path)
    assert got_meta["centroids"] == meta["centroids"]
    assert got_meta["codebooks"] == meta["codebooks"]

    # rebuild: the union encoded with the SAME frozen state (what a
    # pq_write_index would produce if its fit were skipped)
    union = base.unionByName(batch)
    if by_residual:
        coded = pq_encode(
            residual_frame(union, meta["centroids"]),
            meta["codebooks"],
            "pq_resid",
            normalize=False,
        ).drop("pq_resid")
    else:
        coded = pq_encode(
            ivf_assign(union, meta["centroids"]), meta["codebooks"]
        )
    rebuilt = str(tmp_path / "pq_rebuilt")
    coded.write.partitionBy("ivf_cell").parquet(rebuilt + "/corpus")
    _write_json_artifact(spark, rebuilt, "pq.json", meta)

    q = [1.0] * DIMS
    for nprobe in (2, 4):
        for refine in (0, 8):
            got = [
                tuple(r)
                for r in pq_probe_topk(
                    spark, path, q, k=5, nprobe=nprobe, refine=refine
                ).collect()
            ]
            want = [
                tuple(r)
                for r in pq_probe_topk(
                    spark, rebuilt, q, k=5, nprobe=nprobe, refine=refine
                ).collect()
            ]
            assert got == want, (nprobe, refine)
    # appended rows are actually present and reachable
    full = pq_probe_topk(spark, path, q, k=N + 100, nprobe=4)
    assert full.count() == union.count()
    # pruning survives the append
    pruned = pq_probe_topk(spark, path, q, k=5, nprobe=1)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan


@pytest.mark.parametrize("n_cells", [0, 4])
def test_sq8_append_equals_rebuild_with_frozen_bounds(
    spark, tmp_path, vectors, n_cells
):
    """sq8_append (VERDICT r9 #2): a batch quantized against the FROZEN
    per-dim bounds (and, for the celled layout, assigned against the
    frozen centroids) must probe identically to a rebuild quantizing
    the union with the same frozen state, at any nprobe/refine."""
    from chapterhousedb_spark.operators.similarity import (
        _write_json_artifact,
        ivf_assign,
        sq8_append,
        sq8_probe_topk,
        sq8_quantize,
        sq8_write_index,
    )
    from pyspark.sql import functions as F

    df, _ = vectors
    base = df.filter(F.col("vec_id") < N // 2)
    batch = df.filter(F.col("vec_id") >= N // 2).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    path = str(tmp_path / "sq8_inc")
    meta = sq8_write_index(base, path, n_cells=n_cells, max_iter=2)
    got_meta = sq8_append(batch, path)
    assert got_meta["mins"] == meta["mins"] and got_meta["maxs"] == meta["maxs"]

    union = base.unionByName(batch)
    coded = sq8_quantize(union, meta["mins"], meta["maxs"])
    rebuilt = str(tmp_path / "sq8_rebuilt")
    if n_cells > 0:
        coded = ivf_assign(coded, meta["centroids"])
        coded.write.partitionBy("ivf_cell").parquet(rebuilt + "/corpus")
    else:
        coded.write.parquet(rebuilt + "/corpus")
    _write_json_artifact(spark, rebuilt, "sq8.json", meta)

    q = [1.0] * DIMS
    probe_opts = [(0, 0), (0, 8)] if n_cells == 0 else [
        (2, 0), (2, 8), (4, 0), (4, 8)
    ]
    for nprobe, refine in probe_opts:
        got = [
            tuple(r)
            for r in sq8_probe_topk(
                spark, path, q, k=5, nprobe=nprobe, refine=refine
            ).collect()
        ]
        want = [
            tuple(r)
            for r in sq8_probe_topk(
                spark, rebuilt, q, k=5, nprobe=nprobe, refine=refine
            ).collect()
        ]
        assert got == want, (nprobe, refine)
    full = sq8_probe_topk(spark, path, q, k=N + 100, nprobe=max(n_cells, 0))
    assert full.count() == union.count()
    if n_cells > 0:
        pruned = sq8_probe_topk(spark, path, q, k=5, nprobe=1)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "ivf_cell" in plan


def test_retrieval_funnel_indexed_twin(spark, tmp_path):
    """The pipeline_retrieval docstring's economics claim, proven on
    the PRODUCTION path (VERDICT r9 finding #1 / next-step #4): the
    same BQ -> SQ8 -> exact funnel run over a write-time persisted
    index (bq_encode codes + sq8_write_index bounds/codes) must (a)
    return EXACTLY the gated in-query shape's rows, (b) scan codes
    only in stages 1-2 — the float column absent from those scans'
    ReadSchema — and (c) read the float column only in the final
    exact-rerank scan, gated by a broadcast semi-join of the 32
    candidate ids."""
    from chapterhousedb_spark.operators.similarity import (
        bq_encode,
        bq_scores,
        cosine_scores,
        sq8_write_index,
    )
    from chapterhousedb_spark.operators.similarity import sq8_scores
    from chapterhousedb_spark.plans import physical_plan, read_schema_columns
    from chapterhousedb_spark.workload.registry import QUERIES, load
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    ones = [1.0] * 64

    # write time: persist BQ codes + SQ8 codes/bounds next to the
    # vectors (one index layout serving the whole funnel)
    path = str(tmp_path / "funnel")
    meta = sq8_write_index(bq_encode(emb), path)
    corpus = spark.read.parquet(path + "/corpus")

    # query time, stage 1: hamming over a (vec_id, bq_code)-only scan
    s1 = (
        bq_scores(corpus.select("vec_id", "bq_code"), ones)
        .orderBy(F.col("hamming").asc(), "vec_id")
        .limit(256)
        .select("vec_id", "hamming")
    )
    # stage 2: sq8 rerank over a (vec_id, qvec)-only scan, survivors
    # selected by broadcast id join
    s2 = (
        sq8_scores(
            corpus.select("vec_id", "qvec").join(F.broadcast(s1), "vec_id"),
            meta["mins"],
            meta["maxs"],
            ones,
        )
        .withColumnRenamed("approx_cosine", "sq8_cosine")
        .orderBy(F.col("sq8_cosine").desc(), "vec_id")
        .limit(32)
        .select("vec_id", "hamming", "sq8_cosine")
    )
    # stage 3: exact cosine — the ONLY stage that touches the floats,
    # for the 32 surviving ids
    out = (
        cosine_scores(
            corpus.select("vec_id", "embedding").join(F.broadcast(s2), "vec_id"),
            ones,
        )
        .select("vec_id", "hamming", "sq8_cosine", "cosine")
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(10)
    )

    # (a) == the gated in-query shape, bit-for-bit
    want = [tuple(r) for r in QUERIES["pipeline_retrieval"](spark, SF_SMOKE).collect()]
    got = [tuple(r) for r in out.collect()]
    assert got == want

    # (b) stages 1-2 never read the float column
    for stage, needed in ((s1, {"vec_id", "bq_code"}), (s2, {"vec_id", "qvec"})):
        scans = read_schema_columns(stage)
        assert scans, "expected at least one parquet scan"
        for cols in scans:
            assert "embedding" not in cols, cols
        assert any(needed <= set(cols) for cols in scans)
    # (c) the final stage reads embedding exactly once, and the id
    # gate is a broadcast join (no shuffle of the float column)
    emb_scans = [cols for cols in read_schema_columns(out) if "embedding" in cols]
    assert len(emb_scans) == 1
    assert "BroadcastHashJoin" in physical_plan(out)


def test_l2_normalize_unit_norm_and_zero_safe(spark):
    import math

    from pyspark.sql import functions as F

    from chapterhousedb_spark.operators.similarity import l2_normalize

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        T.StructType([
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]),
    )
    got = {r["vec_id"]: r.asDict() for r in l2_normalize(df).collect()}
    assert got[1]["norm"] == 5.0
    assert got[1]["embedding"] == [0.6, 0.8]
    assert got[2]["norm"] == 0.0 and got[2]["embedding"] == [0.0, 0.0]
    # normalized vectors have unit norm (within fp)
    n3 = math.sqrt(sum(x * x for x in got[3]["embedding"]))
    assert abs(n3 - 1.0) < 1e-12
    # post-normalization, cosine == dot: check on real data
    from chapterhousedb_spark.operators.similarity import cosine_topk
    from chapterhousedb_spark.workload.registry import load
    from tests.conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings").limit(50)
    unit = l2_normalize(emb)
    q = [1.0] * 64
    top = cosine_topk(emb, q, k=5)
    top_unit = cosine_topk(unit, q, k=5)
    assert [r["vec_id"] for r in top.collect()] == [
        r["vec_id"] for r in top_unit.collect()
    ]


def test_srp_index_roundtrip_and_pruning(spark, tmp_path):
    """The bucket-once production SRP shape (the recall probe showed
    per-query signature recompute dwarfs the scan savings):
    srp_write_index persists a bucket-PARTITIONED corpus + the
    4-scalar hash family; srp_probe_topk in a fresh session equals
    the in-memory srp_ann_topk bit-for-bit, multiprobe=planes
    degenerates to exact brute force, and the probe prunes at the
    PARTITION level."""
    from chapterhousedb_spark.operators.similarity import (
        cosine_topk,
        srp_ann_topk,
        srp_probe_topk,
        srp_read_index,
        srp_write_index,
    )
    from chapterhousedb_spark.workload.registry import load
    from tests.conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    path = str(tmp_path / "srp_index")
    srp_write_index(emb, path, planes=8)
    q = emb.orderBy("vec_id").first()["embedding"]

    fresh = spark.newSession()
    corpus, meta = srp_read_index(fresh, path)
    assert meta["planes"] == 8 and meta["dims"] == 64
    got = srp_probe_topk(corpus, meta, q, k=5, multiprobe=1)
    want = srp_ann_topk(emb, q, k=5, planes=8, multiprobe=1)
    assert [tuple(r) for r in got.collect()] == [
        tuple(r) for r in want.collect()
    ]
    # full multiprobe == exact brute force
    full = srp_probe_topk(corpus, meta, q, k=5, multiprobe=8)
    assert [tuple(r) for r in full.collect()] == [
        tuple(r) for r in cosine_topk(emb, q, k=5).collect()
    ]
    # the bucket filter reaches the scan as a PARTITION filter
    plan = got._jdf.queryExecution().executedPlan().toString()
    scan = next(ln for ln in plan.splitlines() if "PartitionFilters" in ln)
    assert "srp_bucket" in scan.split("PartitionFilters: [")[1].split("]")[0]


def test_srp_append_equals_rebuild(spark, tmp_path):
    """srp_append admits a batch at O(batch): the appended layout's
    probe equals a full rebuild with the same (stateless) hash family
    at any multiprobe — no drift caveat at all."""
    from pyspark.sql import functions as F

    from chapterhousedb_spark.operators.similarity import (
        srp_append,
        srp_probe_topk,
        srp_read_index,
        srp_write_index,
    )
    from chapterhousedb_spark.workload.registry import load
    from tests.conftest import SF_SMOKE

    emb = load(spark, SF_SMOKE, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") % 4 != 0)
    batch = emb.filter(F.col("vec_id") % 4 == 0)
    inc_path = str(tmp_path / "srp_inc")
    srp_write_index(base, inc_path, planes=8)
    srp_append(batch, inc_path)
    full_path = str(tmp_path / "srp_full")
    srp_write_index(emb, full_path, planes=8)
    q = emb.orderBy(F.desc("vec_id")).first()["embedding"]
    inc_c, inc_m = srp_read_index(spark, inc_path)
    full_c, full_m = srp_read_index(spark, full_path)
    for mp in (0, 1, 8):
        got = [
            tuple(r)
            for r in srp_probe_topk(inc_c, inc_m, q, k=7, multiprobe=mp).collect()
        ]
        want = [
            tuple(r)
            for r in srp_probe_topk(full_c, full_m, q, k=7, multiprobe=mp).collect()
        ]
        assert got == want, mp

def test_srp_write_index_dims_validation(spark, tmp_path):
    """ADVICE r8: dims is derived from the corpus's own vector length
    by default, and an explicit dims longer than the shortest vector
    raises instead of silently hashing every row to bucket 0 (the
    out-of-bounds components go NULL -> plane dot-products go NULL ->
    the index degenerates to a full scan with recall preserved but all
    pruning lost). srp_append re-validates each batch the same way."""
    import pytest

    from chapterhousedb_spark.operators.similarity import (
        srp_append,
        srp_read_index,
        srp_write_index,
    )

    short = spark.createDataFrame(
        [(i, [float(i + j) for j in range(8)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    path = str(tmp_path / "srp_short")
    # derived dims == actual vector length
    srp_write_index(short, path, planes=4)
    _, meta = srp_read_index(spark, path)
    assert meta["dims"] == 8
    # explicit oversize dims refuses to build a degenerate index
    with pytest.raises(ValueError, match="dims=64 exceeds"):
        srp_write_index(short, str(tmp_path / "srp_bad"), planes=4, dims=64)
    # an append whose batch is shorter than the layout's dims refuses too
    wide_path = str(tmp_path / "srp_wide")
    wide = spark.createDataFrame(
        [(i, [float(i + j) for j in range(16)]) for i in range(6)],
        "vec_id long, embedding array<double>",
    )
    srp_write_index(wide, wide_path, planes=4)
    with pytest.raises(ValueError, match="srp_append"):
        srp_append(short, wide_path)
    # ...and a batch LONGER than the layout's dims refuses too (ADVICE
    # r10: the one-sided min check let oversize vectors through —
    # ivf_assign's zip_with then pads the centroid with NULLs, every
    # distance goes NULL, and the row lands in the unreachable
    # NULL-cell partition)
    narrow_path = str(tmp_path / "srp_narrow")
    srp_write_index(short, narrow_path, planes=4)
    with pytest.raises(ValueError, match="size 16"):
        srp_append(wide, narrow_path)


def test_srp_index_records_id_col(spark, tmp_path):
    """ADVICE r8: the srp.json layout metadata records the corpus id
    column, and srp_probe_topk reads it from there — an index written
    over a differently-named id column probes without the caller
    having to repeat the name."""
    from chapterhousedb_spark.operators.similarity import (
        srp_probe_topk,
        srp_read_index,
        srp_write_index,
    )
    from chapterhousedb_spark.workload.registry import load
    from tests.conftest import SF_SMOKE

    emb = (
        load(spark, SF_SMOKE, "embeddings")
        .select("vec_id", "embedding")
        .withColumnRenamed("vec_id", "doc_key")
    )
    path = str(tmp_path / "srp_idcol")
    srp_write_index(emb, path, planes=8, id_col="doc_key")
    q = emb.orderBy("doc_key").first()["embedding"]
    corpus, meta = srp_read_index(spark.newSession(), path)
    assert meta["id_col"] == "doc_key"
    got = srp_probe_topk(corpus, meta, q, k=5, multiprobe=1)
    assert "doc_key" in got.columns and got.count() == 5
    # a pre-id_col srp.json (no key) still defaults to vec_id
    assert srp_probe_topk.__defaults__[-1] is None

def test_embedding_dedup_survivors_greedy_semantics(spark):
    """SemDeDup keep-one: the smallest id of every near-dup pair
    survives, and the rule is GREEDY — a dropped vector still
    dominates larger ids it pairs with (chain a~b, b~c, a!~c keeps
    only a: b falls to a, c falls to b even though b is gone —
    transitive-clustering semantics would be a different operator).
    Survivors keep all their columns."""
    import math

    from chapterhousedb_spark.operators.similarity import (
        embedding_dedup_survivors,
        embedding_near_dup_pairs,
    )

    def vec(deg):
        r = math.radians(deg)
        return [math.cos(r), math.sin(r)] + [0.0] * 6

    # 0°, 25°, 50°: cos(25°)≈0.906 >= τ=0.86; cos(50°)≈0.64 < τ
    rows = [(10, vec(0), "a"), (20, vec(25), "b"), (30, vec(50), "c"),
            (40, [0.0] * 7 + [1.0], "lone")]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, tag string"
    )
    # many 1-plane passes => the 25°-apart pairs certainly collide
    seeds = list(range(8))
    pairs = {
        (r["id_a"], r["id_b"])
        for r in embedding_near_dup_pairs(
            df, threshold=0.86, planes=1, seeds=seeds
        ).collect()
    }
    assert pairs == {(10, 20), (20, 30)}
    surv = embedding_dedup_survivors(
        df, threshold=0.86, planes=1, seeds=seeds
    )
    assert sorted(r["vec_id"] for r in surv.collect()) == [10, 40]
    assert set(surv.columns) == {"vec_id", "embedding", "tag"}


# ---------------------------------------------------------------- PQ / SQ8


def _unit_rows(mat: np.ndarray) -> np.ndarray:
    md = mat.astype(np.float64)
    return md / np.maximum(np.linalg.norm(md, axis=1), 1e-12)[:, None]


def test_pq_adc_exact_under_lossless_codebook(spark):
    """With a codebook holding every distinct unit subvector, encoding
    is lossless and ADC == exact cosine (1 - d^2/2 on the unit sphere
    is an identity, not an approximation)."""
    from chapterhousedb_spark.operators.similarity import (
        pq_adc_scores,
        pq_encode,
    )

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(6, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    unit = _unit_rows(mat)
    m, dsub = 4, 2
    books = [
        [[float(x) for x in unit[r, s * dsub : (s + 1) * dsub]] for r in range(6)]
        for s in range(m)
    ]
    q = [1.0] * 8
    scored = pq_adc_scores(
        pq_encode(df, books, "embedding"), books, q
    ).orderBy("vec_id")
    got = [r["approx_cosine"] for r in scored.collect()]
    qd = np.array(q) / np.linalg.norm(q)
    want = unit @ qd
    assert np.allclose(got, want, atol=1e-9)


def test_pq_refine_full_equals_bruteforce(vectors):
    from chapterhousedb_spark.operators.similarity import pq_topk

    df, mat = vectors
    q = [1.0] * DIMS
    got = [
        r["vec_id"]
        for r in pq_topk(df, q, k=10, m=4, nbits=4, refine=N, max_iter=3).collect()
    ]
    assert got == _numpy_topk(mat, np.array(q), 10)


def test_pq_encode_partitioning_invariant(vectors):
    from chapterhousedb_spark.operators.similarity import pq_encode, pq_fit

    df, _ = vectors
    books = pq_fit(df, m=4, nbits=3, max_iter=2)
    a = {
        r["vec_id"]: r["pq_code"]
        for r in pq_encode(df, books).select("vec_id", "pq_code").collect()
    }
    b = {
        r["vec_id"]: r["pq_code"]
        for r in pq_encode(df.repartition(7), books)
        .select("vec_id", "pq_code")
        .collect()
    }
    assert a == b and len(a) == N


def test_ivf_pq_full_probe_refine_equals_bruteforce(vectors):
    from chapterhousedb_spark.operators.similarity import ivf_pq_topk

    df, mat = vectors
    q = [0.5] * DIMS
    got = [
        r["vec_id"]
        for r in ivf_pq_topk(
            df, q, k=10, n_cells=4, nprobe=4, m=4, nbits=4, refine=N, max_iter=3
        ).collect()
    ]
    assert got == _numpy_topk(mat, np.array(q), 10)


def test_pq_adc_recall_without_refine(vectors):
    """ADC alone (no rerank) on clustered data keeps most of the true
    top-10 — the quality floor a user tunes m/nbits against."""
    from chapterhousedb_spark.operators.similarity import pq_topk

    df, mat = vectors
    q = [1.0] * DIMS
    exact = set(_numpy_topk(mat, np.array(q), 10))
    got = {
        r["vec_id"]
        for r in pq_topk(df, q, k=10, m=8, nbits=4, refine=0, max_iter=5).collect()
    }
    assert len(got & exact) >= 5
    # a modest rerank (refine=3k) recovers at least as much
    ref = {
        r["vec_id"]
        for r in pq_topk(df, q, k=10, m=8, nbits=4, refine=30, max_iter=5).collect()
    }
    assert len(ref & exact) >= len(got & exact)


def test_pq_dims_validation(spark):
    from chapterhousedb_spark.operators.similarity import pq_dims, pq_fit

    ragged = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [1.0, 2.0, 3.0])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="ragged"):
        pq_dims(ragged)
    ok = spark.createDataFrame(
        [(1, [1.0] * 6)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="divisible"):
        pq_fit(ok, m=4, nbits=2)


def test_pq_index_roundtrip_prunes_and_refines(spark, tmp_path, vectors):
    from chapterhousedb_spark.operators.similarity import (
        pq_probe_topk,
        pq_write_index,
    )

    df, mat = vectors
    path = str(tmp_path / "pqidx")
    meta = pq_write_index(
        df, path, n_cells=4, m=4, nbits=4, max_iter=3
    )
    assert meta["dims"] == DIMS and len(meta["codebooks"]) == 4
    q = [1.0] * DIMS
    # full probe + full refine == brute force (the exactness anchor)
    got = [
        r["vec_id"]
        for r in pq_probe_topk(spark, path, q, k=10, nprobe=4, refine=N).collect()
    ]
    assert got == _numpy_topk(mat, np.array(q), 10)
    # ADC-only narrow probe: k rows from a pruned, code-only scan
    adc = pq_probe_topk(spark, path, q, k=10, nprobe=2, refine=0)
    rows = adc.collect()
    assert len(rows) == 10
    assert set(adc.columns) == {"vec_id", "approx_cosine"}


def test_sq8_codes_hit_extremes_and_bounds_are_invariant(spark):
    from chapterhousedb_spark.operators.similarity import (
        sq8_bounds,
        sq8_quantize,
    )

    df = spark.createDataFrame(
        [(1, [0.0, -2.0]), (2, [10.0, 2.0]), (3, [5.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    mins, maxs = sq8_bounds(df)
    assert mins == [0.0, -2.0] and maxs == [10.0, 2.0]
    assert sq8_bounds(df.repartition(5)) == (mins, maxs)
    codes = {
        r["vec_id"]: r["qvec"]
        for r in sq8_quantize(df, mins, maxs).collect()
    }
    # x == mn -> -128, x == mx -> 127, midpoint -> floor(127.5+0.5)-128
    assert codes[1] == [-128, -128]
    assert codes[2] == [127, 127]
    assert codes[3] == [0, 0]


def test_sq8_caller_bounds_clamp_out_of_range(spark):
    from chapterhousedb_spark.operators.similarity import sq8_quantize

    df = spark.createDataFrame(
        [(1, [-5.0, 50.0])], "vec_id long, embedding array<double>"
    )
    codes = sq8_quantize(df, [0.0, 0.0], [1.0, 1.0]).collect()[0]["qvec"]
    assert codes == [-128, 127]


def test_sq8_topk_tracks_exact_ranking(vectors):
    from chapterhousedb_spark.operators.similarity import sq8_topk

    df, mat = vectors
    q = [1.0] * DIMS
    exact = _numpy_topk(mat, np.array(q), 10)
    got = [r["vec_id"] for r in sq8_topk(df, q, k=10).collect()]
    # 255 steps per dim: top-1 exact, top-10 nearly identical
    assert got[0] == exact[0]
    assert len(set(got) & set(exact)) >= 8


def test_sq8_quantize_reproducible_under_repartition(vectors):
    from chapterhousedb_spark.operators.similarity import (
        sq8_bounds,
        sq8_quantize,
        sq8_scores,
    )

    df, _ = vectors
    mins, maxs = sq8_bounds(df)
    q = [1.0] * DIMS

    def run(frame):
        out = sq8_scores(sq8_quantize(frame, mins, maxs), mins, maxs, q)
        return {
            r["vec_id"]: (r["qvec"], r["approx_cosine"])
            for r in out.select("vec_id", "qvec", "approx_cosine").collect()
        }

    a, b = run(df), run(df.repartition(9))
    assert a == b and len(a) == N  # bit-identical scores, not just close


def test_sq8_empty_corpus(spark):
    from chapterhousedb_spark.operators.similarity import sq8_topk

    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<double>"
    )
    assert sq8_topk(empty, [1.0, 1.0], k=5).count() == 0


def test_sq8_index_roundtrip_prunes_and_refines(spark, tmp_path, vectors):
    from chapterhousedb_spark.operators.similarity import (
        sq8_probe_topk,
        sq8_write_index,
    )

    df, mat = vectors
    q = [1.0] * DIMS
    # flat layout (no cells): code-only scan must column-prune the
    # float vectors away entirely
    flat = str(tmp_path / "sq8flat")
    meta = sq8_write_index(df, flat)
    assert meta["dims"] == DIMS and len(meta["mins"]) == DIMS
    adc = sq8_probe_topk(spark, flat, q, k=10)
    got = [r["vec_id"] for r in adc.collect()]
    exact = _numpy_topk(mat, np.array(q), 10)
    assert got[0] == exact[0] and len(set(got) & set(exact)) >= 8
    from chapterhousedb_spark.plans import read_schema_columns

    [cols] = read_schema_columns(adc)
    assert "embedding" not in cols and "qvec" in cols
    # celled layout: partition pruning + full refine == brute force
    celled = str(tmp_path / "sq8cells")
    sq8_write_index(df, celled, n_cells=4, max_iter=3)
    ref = sq8_probe_topk(spark, celled, q, k=10, nprobe=4, refine=N)
    assert [r["vec_id"] for r in ref.collect()] == exact
    from chapterhousedb_spark.plans import physical_plan

    pruned = sq8_probe_topk(spark, celled, q, k=5, nprobe=2)
    plan = physical_plan(pruned)
    assert "PartitionFilters: [ivf_cell" in plan or "ivf_cell IN" in plan
    assert len(pruned.collect()) == 5


def test_sq8_empty_corpus_guards(spark, tmp_path):
    from chapterhousedb_spark.operators.similarity import (
        sq8_scores,
        sq8_write_index,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty corpus"):
        sq8_write_index(empty, str(tmp_path / "sq8empty"))
    with pytest.raises(ValueError, match="dims=0"):
        sq8_scores(empty, [], [], [])


def test_pq_fit_bit_identical_under_repartition(vectors):
    """The Lloyd's rewrite makes codebook fits DETERMINISTIC: hash-
    smallest init, lowest-id tie-break, decimal-exact means — the
    fitted books are bit-identical lists under any partitioning (the
    1000-executor fit equals the local one, like the classifier)."""
    from chapterhousedb_spark.operators.similarity import pq_fit

    df, _ = vectors
    a = pq_fit(df, m=4, nbits=3, max_iter=3)
    b = pq_fit(df.repartition(11), m=4, nbits=3, max_iter=3)
    assert a == b
    c = pq_fit(df, m=4, nbits=3, max_iter=3, seed=99)
    assert a != c  # re-seeding re-draws the init


def test_ivf_fit_bit_identical_under_repartition(vectors):
    from chapterhousedb_spark.operators.similarity import ivf_fit

    df, _ = vectors
    a = ivf_fit(df, n_cells=4, max_iter=3)
    b = ivf_fit(df.repartition(9), n_cells=4, max_iter=3)
    assert a == b
    assert a != ivf_fit(df, n_cells=4, max_iter=3, seed=23)


def test_ivf_pq_residual_full_probe_refine_equals_bruteforce(vectors):
    from chapterhousedb_spark.operators.similarity import ivf_pq_topk

    df, mat = vectors
    q = [0.5] * DIMS
    got = [
        r["vec_id"]
        for r in ivf_pq_topk(
            df, q, k=10, n_cells=4, nprobe=4, m=4, nbits=4, refine=N,
            max_iter=3, by_residual=True,
        ).collect()
    ]
    assert got == _numpy_topk(mat, np.array(q), 10)


def test_ivf_pq_residual_adc_beats_or_matches_raw(vectors):
    """The reason by_residual exists: with the same bit budget, coding
    the within-cell residual keeps more resolution than coding the raw
    vector. Statistical claim (a tendency, not pointwise): summed
    ADC-only recall over several queries at an aggressively small
    codebook (nbits=2 -> 4 centers/subspace, where resolution is
    scarcest) must not be worse on clustered data."""
    from chapterhousedb_spark.operators.similarity import (
        ivf_fit,
        ivf_pq_topk,
        pq_fit,
        residual_frame,
    )

    df, mat = vectors
    queries = [
        [1.0] * DIMS,
        [0.5] * DIMS,
        [1.0, -1.0] * (DIMS // 2),
        list(mat[0].astype(float)),
        list(mat[100].astype(float)),
    ]
    # fit each quantizer ONCE (the production shape) and reuse per query
    cents = ivf_fit(df, n_cells=4, max_iter=5)
    books_raw = pq_fit(df, m=8, nbits=2, max_iter=5)
    books_res = pq_fit(
        residual_frame(df, cents), "pq_resid", m=8, nbits=2, max_iter=5,
        normalize=False, max_abs=2.0,
    )

    def recall(q, by_residual):
        exact = set(_numpy_topk(mat, np.array(q), 10))
        got = {
            r["vec_id"]
            for r in ivf_pq_topk(
                df, q, k=10, n_cells=4, nprobe=4, m=8, nbits=2, refine=0,
                centroids=cents,
                codebooks=books_res if by_residual else books_raw,
                by_residual=by_residual,
            ).collect()
        }
        return len(got & exact)

    raw = sum(recall(q, False) for q in queries)
    res = sum(recall(q, True) for q in queries)
    assert res >= raw, (raw, res)
    assert res >= len(queries) * 4  # a real quality floor, not vacuous


def test_ivf_pq_residual_scores_exact_under_lossless_codebook(spark):
    """With codebooks holding every distinct residual subvector, the
    per-cell ADC LUT reproduces exact cosine: (q-c)-(v-c) = q-v."""
    import numpy as np

    from chapterhousedb_spark.operators.similarity import (
        ivf_fit,
        pq_adc_scores_residual,
        pq_encode,
        residual_frame,
        ivf_probe_cells,
    )

    rng = np.random.default_rng(5)
    mat = rng.normal(size=(6, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    cents = ivf_fit(df, n_cells=2, max_iter=2)
    res = residual_frame(df, cents)
    res_rows = {r["vec_id"]: r["pq_resid"] for r in res.collect()}
    m, dsub = 4, 2
    books = [
        [
            [float(x) for x in res_rows[i][s * dsub : (s + 1) * dsub]]
            for i in range(6)
        ]
        for s in range(m)
    ]
    q = [1.0] * 8
    probes = ivf_probe_cells(cents, q, 2)  # every cell
    coded = pq_encode(
        res.select("vec_id", "ivf_cell", "pq_resid"),
        books,
        "pq_resid",
        normalize=False,
    )
    scored = pq_adc_scores_residual(coded, books, cents, q, probes).orderBy(
        "vec_id"
    )
    got = [r["approx_cosine"] for r in scored.collect()]
    md = mat / np.linalg.norm(mat, axis=1)[:, None]
    want = md @ (np.array(q) / np.linalg.norm(q))
    assert np.allclose(got, want, atol=1e-9)


def test_pq_residual_index_roundtrip(spark, tmp_path, vectors):
    from chapterhousedb_spark.operators.similarity import (
        pq_probe_topk,
        pq_write_index,
    )

    df, mat = vectors
    path = str(tmp_path / "pqres")
    meta = pq_write_index(
        df, path, n_cells=4, m=4, nbits=4, max_iter=3, by_residual=True
    )
    assert meta["by_residual"] is True
    q = [1.0] * DIMS
    got = [
        r["vec_id"]
        for r in pq_probe_topk(spark, path, q, k=10, nprobe=4, refine=N).collect()
    ]
    assert got == _numpy_topk(mat, np.array(q), 10)
    adc = pq_probe_topk(spark, path, q, k=10, nprobe=2, refine=0)
    assert len(adc.collect()) == 10


# ------------------------------------------------------------ binary quant


def test_bq_encode_matches_python_reference(vectors):
    from chapterhousedb_spark.operators.similarity import (
        bq_encode,
        bq_query_code,
    )

    df, mat = vectors
    got = {r["vec_id"]: r["bq_code"] for r in bq_encode(df).collect()}
    for i, v in enumerate(mat):
        assert got[i] == bq_query_code([float(x) for x in v]), i
    # 16 dims -> one 63-bit word, always non-negative
    assert all(len(c) == 1 and c[0] >= 0 for c in got.values())


def test_bq_refine_full_equals_bruteforce_and_hamming_sane(vectors):
    from chapterhousedb_spark.operators.similarity import bq_topk

    df, mat = vectors
    q = [1.0] * DIMS
    got = [r["vec_id"] for r in bq_topk(df, q, k=10, refine=N).collect()]
    assert got == _numpy_topk(mat, np.array(q), 10)
    # ADC-only: hamming of the true top-1 should be small (signs agree)
    adc = bq_topk(df, q, k=10, refine=0).collect()
    assert all(0 <= r["hamming"] <= DIMS for r in adc)
    assert adc[0]["approx_cosine"] == 1.0 - 2.0 * adc[0]["hamming"] / DIMS


def test_bq_multiword_packing(spark):
    """dims > 63 spills into a second word; hamming sums across words."""
    from chapterhousedb_spark.operators.similarity import (
        bq_encode,
        bq_query_code,
        bq_scores,
    )

    v = [1.0 if i % 3 == 0 else -1.0 for i in range(70)]
    df = spark.createDataFrame([(1, v)], "vec_id long, embedding array<double>")
    code = bq_encode(df).collect()[0]["bq_code"]
    assert code == bq_query_code(v) and len(code) == 2
    # against itself: hamming 0; against its negation: hamming = dims
    r = bq_scores(bq_encode(df), v).collect()[0]
    assert r["hamming"] == 0 and r["approx_cosine"] == 1.0
    neg = [-x for x in v]
    r2 = bq_scores(bq_encode(df), neg).collect()[0]
    assert r2["hamming"] == 70


def test_knn_join_graph_properties(vectors):
    """kNN self-join invariants: no self edges, contiguous ranks from
    1 per src capped at k, cosine non-increasing with rank, and the
    planted near-dup pair (0, 1) is each other's rank-1 neighbor."""
    from chapterhousedb_spark.operators.similarity import knn_join

    df, mat = vectors
    out = knn_join(df, k=3, planes=4).collect()
    assert all(r["src_id"] != r["nbr_id"] for r in out)
    by_src = {}
    for r in out:
        by_src.setdefault(r["src_id"], []).append(r)
    for src, rows in by_src.items():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= 3
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
    assert by_src[0][0]["nbr_id"] == 1 and by_src[1][0]["nbr_id"] == 0
    assert by_src[0][0]["cosine"] > 0.999
    # deterministic: identical graph on a repartitioned input
    again = knn_join(df.repartition(7), k=3, planes=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_knn_join_matches_numpy_within_buckets(vectors):
    """Exactness anchor: the rank-1 neighbor per src equals the numpy
    argmax over that src's actual bucket-mates (blocking included in
    the reference, so this checks ranking, not recall)."""
    from chapterhousedb_spark.operators.similarity import (
        knn_join,
        srp_signature,
    )

    df, mat = vectors
    buckets = {
        r["vec_id"]: r["b"]
        for r in df.select(
            "vec_id", srp_signature("embedding", 4, DIMS, 7).alias("b")
        ).collect()
    }
    got = {}
    for r in knn_join(df, k=1, planes=4).collect():
        got[r["src_id"]] = r["nbr_id"]
    md = mat.astype(np.float64)
    md = md / np.linalg.norm(md, axis=1)[:, None]
    for src, nbr in got.items():
        mates = [i for i in range(N) if i != src and buckets[i] == buckets[src]]
        assert mates, src
        best = max(mates, key=lambda i: (md[i] @ md[src], -i))
        assert nbr == best, (src, nbr, best)


def test_embedding_clusters_composition(spark, sf_dir):
    """The declared embedding_clusters query: labels form a valid
    partition (every vector labeled once, label = min id in its
    cluster, planted near-dups share a cluster) and it is non-vacuous
    on the testdata (at least one multi-member cluster AND at least
    one singleton)."""
    from chapterhousedb_spark.workload import QUERIES

    out = QUERIES["embedding_clusters"](spark, sf_dir).collect()
    labels = {r["vec_id"]: r["cluster_id"] for r in out}
    n = len(labels)
    assert n == len(out)  # one row per vector
    from collections import Counter

    sizes = Counter(labels.values())
    assert all(cid == min(v for v, c in labels.items() if c == cid)
               for cid in sizes)
    assert any(s > 1 for s in sizes.values())
    assert any(s == 1 for s in sizes.values())


def test_knn_join_cross_equals_self_join_cross_edges(vectors, spark):
    """The bipartite lookup must agree with the self-join restricted
    to cross edges: split the corpus into batch/base halves, run
    knn_join on the union with the SAME blocking, keep only edges
    src in batch AND nbr in base, re-rank per src — identical graph
    to knn_join_cross(batch, base)."""
    from pyspark.sql import functions as F

    from chapterhousedb_spark.operators.similarity import (
        knn_join,
        knn_join_cross,
    )

    df, _ = vectors
    batch = df.filter(F.col("vec_id") < 20)
    base = df.filter(F.col("vec_id") >= 20)
    got = {
        (r["src_id"], r["nbr_id"], r["rank"]): r["cosine"]
        for r in knn_join_cross(batch, base, k=3, planes=4).collect()
    }
    # reference: all candidate edges of the union (huge k), restricted
    full = knn_join(df, k=N, planes=4).collect()
    ref_edges = {}
    for r in full:
        if r["src_id"] < 20 and r["nbr_id"] >= 20:
            ref_edges.setdefault(r["src_id"], []).append(
                (r["nbr_id"], r["cosine"])
            )
    want = {}
    for src, nbrs in ref_edges.items():
        nbrs.sort(key=lambda t: (-t[1], t[0]))
        for rank, (nbr, cos) in enumerate(nbrs[:3], start=1):
            want[(src, nbr, rank)] = cos
    assert set(got) == set(want)
    for key in got:
        assert got[key] == want[key], key


def test_retrieval_funnel_full_width_equals_bruteforce(vectors):
    """BQ -> SQ8 -> exact with stage widths >= corpus degenerates to
    brute force (the funnel's exactness anchor); at production widths
    (256/32) the funnel keeps most of the true top-10 on this corpus."""
    from pyspark.sql import functions as F

    from chapterhousedb_spark.operators.similarity import (
        bq_encode,
        bq_scores,
        cosine_scores,
        cosine_topk,
        sq8_bounds,
        sq8_quantize,
        sq8_scores,
    )

    df, mat = vectors
    q = [1.0] * DIMS
    mins, maxs = sq8_bounds(df)

    def funnel(w1, w2):
        s1 = (
            bq_scores(bq_encode(df.select("vec_id", "embedding")), q)
            .orderBy(F.col("hamming").asc(), "vec_id")
            .limit(w1)
            .select("vec_id", "embedding")
        )
        s2 = (
            sq8_scores(sq8_quantize(s1, mins, maxs), mins, maxs, q)
            .orderBy(F.col("approx_cosine").desc(), "vec_id")
            .limit(w2)
            .select("vec_id", "embedding")
        )
        return [
            r["vec_id"]
            for r in cosine_scores(s2, q)
            .orderBy(F.col("cosine").desc(), "vec_id")
            .limit(10)
            .collect()
        ]

    exact = [r["vec_id"] for r in cosine_topk(df, q, k=10).collect()]
    assert funnel(N, N) == exact
    narrow = funnel(64, 24)
    assert len(set(narrow) & set(exact)) >= 7, (narrow, exact)


# ------------------------------------------- round-9 review-fix regressions


def test_bq_scores_word_mismatch_is_null_both_directions(spark):
    from chapterhousedb_spark.operators.similarity import bq_encode, bq_scores

    wide = spark.createDataFrame(
        [(1, [1.0] * 126)], "vec_id long, embedding array<double>"
    )
    narrow_q = [1.0] * 63  # 1 word vs the corpus's 2
    r = bq_scores(bq_encode(wide), narrow_q).collect()[0]
    assert r["hamming"] is None and r["approx_cosine"] is None
    narrow = spark.createDataFrame(
        [(1, [1.0] * 63)], "vec_id long, embedding array<double>"
    )
    wide_q = [1.0] * 126
    r2 = bq_scores(bq_encode(narrow), wide_q).collect()[0]
    assert r2["hamming"] is None and r2["approx_cosine"] is None


def test_knn_join_zero_vector_not_silently_dropped(spark):
    """A zero (failed-embedder) vector must neither crash the job
    (Spark 4 ANSI raises DIVIDE_BY_ZERO on an unguarded norm) nor be
    silently dropped: under the guarded denominator its pairs score
    cosine 0.0 and rank below every real neighbor."""
    from chapterhousedb_spark.operators.similarity import knn_join

    rows = [(1, [1.0, 0.5]), (2, [0.9, 0.6]), (3, [0.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = knn_join(df, k=3, planes=1, persist=False).collect()
    for r in out:
        if 3 in (r["src_id"], r["nbr_id"]):
            assert r["cosine"] == 0.0
    # the well-formed pair is present with a real cosine and rank 1
    pair12 = [r for r in out if r["src_id"] == 1 and r["nbr_id"] == 2]
    assert pair12 and pair12[0]["rank"] == 1 and pair12[0]["cosine"] > 0.9


def test_refine_keeps_schema_stable(vectors, spark, tmp_path):
    from chapterhousedb_spark.operators.similarity import (
        bq_topk,
        ivf_pq_topk,
        pq_topk,
        sq8_topk,  # noqa: F401  (no refine knob — bounds-only)
        pq_write_index,
        pq_probe_topk,
    )

    df, _ = vectors
    q = [1.0] * DIMS
    assert (
        pq_topk(df, q, k=3, m=4, nbits=3, refine=0, max_iter=2).columns
        == pq_topk(df, q, k=3, m=4, nbits=3, refine=20, max_iter=2).columns
    )
    assert (
        ivf_pq_topk(df, q, k=3, n_cells=4, nprobe=2, m=4, nbits=3,
                    refine=0, max_iter=2).columns
        == ivf_pq_topk(df, q, k=3, n_cells=4, nprobe=2, m=4, nbits=3,
                       refine=20, max_iter=2).columns
    )
    a = bq_topk(df, q, k=3, refine=0)
    b = bq_topk(df, q, k=3, refine=20)
    assert a.columns == b.columns == ["vec_id", "hamming", "approx_cosine"]
    path = str(tmp_path / "pqschema")
    pq_write_index(df, path, n_cells=4, m=4, nbits=3, max_iter=2)
    assert (
        pq_probe_topk(spark, path, q, k=3, nprobe=2, refine=0).columns
        == pq_probe_topk(spark, path, q, k=3, nprobe=2, refine=20).columns
    )


def test_residual_scorer_self_filters_out_of_probe_rows(spark):
    import numpy as np

    from chapterhousedb_spark.operators.similarity import (
        ivf_fit,
        pq_adc_scores_residual,
        pq_encode,
        residual_frame,
    )

    rng = np.random.default_rng(8)
    mat = rng.normal(size=(12, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    cents = ivf_fit(df, n_cells=3, max_iter=2)
    res = residual_frame(df, cents)
    books = [[[0.0, 0.0]] for _ in range(4)]
    coded = pq_encode(
        res.select("vec_id", "ivf_cell", "pq_resid"), books, "pq_resid",
        normalize=False,
    )
    # probe only cell 0 but feed the UNfiltered frame: rows in other
    # cells must be dropped, not crash the job on element_at(lut, 0)
    out = pq_adc_scores_residual(coded, books, cents, [1.0] * 8, [0]).collect()
    cells = {
        r["vec_id"]: r["ivf_cell"]
        for r in res.select("vec_id", "ivf_cell").collect()
    }
    assert {r["vec_id"] for r in out} == {v for v, c in cells.items() if c == 0}


def test_temperature_mix_zero_mass_source_dropped(spark):
    from chapterhousedb_spark.operators.sampling import temperature_mix

    rows = [(i, "good", 50) for i in range(40)] + [
        (100 + i, "junk", 0) for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    out = temperature_mix(
        df, alpha=0.5, target_frac=0.5, weight_col="n_tok", salt="zm"
    ).collect()
    assert all(r["source"] == "good" for r in out), out
    assert out  # the real source still samples


def test_mrl_topk_full_prefix_is_brute_force(vectors):
    """Matryoshka retrieval exactness anchors: prefix_dims == full
    dims (refine=0) must equal brute-force cosine exactly, and any
    prefix with refine >= corpus must too (the rerank restores
    exactness regardless of the coarse cut)."""
    from chapterhousedb_spark.operators.similarity import mrl_topk

    df, mat = vectors
    q = [1.0] * DIMS
    exact = _numpy_topk(mat, np.array(q), 10)
    full = [r["vec_id"] for r in mrl_topk(df, q, k=10, prefix_dims=DIMS).collect()]
    assert full == exact
    reranked = [
        r["vec_id"]
        for r in mrl_topk(df, q, k=10, prefix_dims=4, refine=N).collect()
    ]
    assert reranked == exact
    # coarse-only prefix ranking still finds most of the true top-10
    coarse = [
        r["vec_id"] for r in mrl_topk(df, q, k=10, prefix_dims=8).collect()
    ]
    assert len(set(coarse) & set(exact)) >= 5
    # refine < k still returns k rows (refine widens the rerank pool,
    # never the output — the bq_topk contract; review r10)
    assert mrl_topk(df, q, k=10, prefix_dims=8, refine=5).count() == 10
    with pytest.raises(ValueError, match="prefix_dims"):
        mrl_topk(df, q, prefix_dims=0)


def test_mrl_index_roundtrip_column_prunes_and_appends(spark, tmp_path, vectors):
    """The persisted MRL layout: the coarse probe's scan must read the
    prefix column ONLY (ReadSchema excludes the full vector), refine
    reranks exactly, and appends (stateless slice) equal a rebuild."""
    from chapterhousedb_spark.operators.similarity import (
        mrl_append,
        mrl_probe_topk,
        mrl_write_index,
    )
    from chapterhousedb_spark.plans import read_schema_columns
    from pyspark.sql import functions as F

    df, mat = vectors
    q = [1.0] * DIMS
    base = df.filter(F.col("vec_id") < N // 2)
    batch = df.filter(F.col("vec_id") >= N // 2)
    path = str(tmp_path / "mrl")
    meta = mrl_write_index(base, path, prefix_dims=4)
    assert meta["prefix_dims"] == 4 and meta["dims"] == DIMS
    got_meta = mrl_append(batch, path)
    assert got_meta["prefix_dims"] == 4

    coarse = mrl_probe_topk(spark, path, q, k=10)
    scans = read_schema_columns(coarse)
    assert scans and all("embedding" not in cols for cols in scans)
    assert coarse.count() == 10
    # full refine over the appended index == brute force over the union
    got = [
        r["vec_id"]
        for r in mrl_probe_topk(spark, path, q, k=10, refine=N).collect()
    ]
    assert got == _numpy_topk(mat, np.array(q), 10)
    # append == rebuild (stateless slice: identical layout)
    rebuilt = str(tmp_path / "mrl_rb")
    mrl_write_index(df, rebuilt, prefix_dims=4)
    a = [tuple(r) for r in mrl_probe_topk(spark, path, q, k=25, refine=40).collect()]
    b = [tuple(r) for r in mrl_probe_topk(spark, rebuilt, q, k=25, refine=40).collect()]
    assert a == b


# ------------------------------------------------------------ semdedup


def _sd_centroids():
    # two orthogonal unit centroids in 4-d
    return [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]


@pytest.fixture(scope="module")
def sd_corpus(spark):
    """Cell 0: vectors 0/1 near-dup (cos ~0.9999), 0 MORE aligned with
    the centroid than 1; vector 2 unrelated (cos to 0/1 well below
    threshold). Cell 1: vectors 10/11 exact duplicates (alignment
    tie). Cross-cell near-dups impossible by construction."""
    rows = [
        (0, [1.0, 0.01, 0.0, 0.0]),
        (1, [1.0, 0.02, 0.0, 0.0]),
        (2, [0.6, 0.0, 0.8, 0.0]),
        (10, [0.0, 1.0, 0.0, 0.5]),
        (11, [0.0, 1.0, 0.0, 0.5]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_far_from_centroid_keeps_less_aligned(spark, sd_corpus):
    from chapterhousedb_spark.operators.similarity import semdedup_survivors

    out = semdedup_survivors(
        sd_corpus, _sd_centroids(), threshold=0.99, tag_cols=True
    )
    rows = {r["vec_id"]: r for r in out.collect()}
    # vector 0 is MORE centroid-aligned than 1 -> 0 is dropped, the
    # diversity-preserving survivor is 1; 2 survives (below threshold);
    # the exact-duplicate tie at cell 1 falls to the larger id
    assert set(rows) == {1, 2, 10}
    assert rows[1]["semdedup_cell"] == 0
    assert rows[10]["semdedup_cell"] == 1


def test_semdedup_min_id_matches_srp_sibling_convention(spark, sd_corpus):
    from chapterhousedb_spark.operators.similarity import semdedup_survivors

    out = semdedup_survivors(
        sd_corpus, _sd_centroids(), threshold=0.99, keep="min_id"
    )
    assert {r["vec_id"] for r in out.collect()} == {0, 2, 10}
    # all original columns intact, no diagnostic columns by default
    assert out.columns == ["vec_id", "embedding"]


def test_semdedup_cell_blocking_is_a_real_boundary(spark):
    """Identical vectors assigned to the same cell always pair; the
    blocking never compares across cells, so survivors in different
    cells coexist even at cosine 1 (use SRP or more centroids if the
    corpus straddles cell boundaries)."""
    from chapterhousedb_spark.operators.similarity import semdedup_survivors

    rows = [
        (0, [1.0, 0.01, 0.0, 0.0]),
        (1, [0.01, 1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = semdedup_survivors(df, _sd_centroids(), threshold=0.5)
    assert {r["vec_id"] for r in out.collect()} == {0, 1}


def test_semdedup_threshold_and_guard(spark, sd_corpus):
    from chapterhousedb_spark.operators.similarity import semdedup_survivors

    # threshold above every pair's cosine -> nothing dropped
    out = semdedup_survivors(sd_corpus, _sd_centroids(), threshold=1.5)
    assert out.count() == 5
    with pytest.raises(ValueError, match="keep"):
        semdedup_survivors(sd_corpus, _sd_centroids(), keep="random")


def test_semdedup_pair_join_is_equi_not_cartesian(spark, sd_corpus):
    """The within-cell pair stage must be a cell-keyed equi-join —
    never a cartesian product — and all-JVM."""
    from chapterhousedb_spark.operators.similarity import semdedup_survivors

    out = semdedup_survivors(sd_corpus, _sd_centroids(), threshold=0.99)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_fit_training_cap_deterministic_and_identity(vectors):
    """VERDICT r12 #4: the FAISS-practice training cap. A cap ABOVE
    the corpus size selects everything (fit unchanged vs cap
    disabled); a binding cap still yields bit-identical centroids
    under repartitioning (content-keyed md5 selection, never
    Bernoulli); the compositions inherit the default cap without any
    signature change at the call sites."""
    df, _ = vectors
    from chapterhousedb_spark.operators.similarity import ivf_fit, pq_fit

    # default cap (256 * k) is far above N=200 -> identical to uncapped
    assert ivf_fit(df, n_cells=4) == ivf_fit(df, n_cells=4, max_train=0)
    assert pq_fit(df, m=4, nbits=2) == pq_fit(
        df, m=4, nbits=2, max_train=0
    )
    # a binding cap: partitioning-independent (the determinism contract
    # sample_fraction could never give)
    a = ivf_fit(df, n_cells=4, max_train=64)
    b = ivf_fit(df.repartition(13), n_cells=4, max_train=64)
    assert a == b
    pa = pq_fit(df, m=4, nbits=2, max_train=64)
    pb = pq_fit(df.repartition(7), m=4, nbits=2, max_train=64)
    assert pa == pb
    # the capped fit is a real fit: right shape, unit-scale centroids
    assert len(a) == 4 and len(a[0]) == DIMS


def test_lloyd_early_stop_is_output_identical(vectors):
    """The Lloyd loop breaks on an exact fixed point (new books ==
    old books): running MORE iterations past convergence must return
    the bit-identical codebooks — the early stop only skips redundant
    Spark jobs."""
    df, _ = vectors
    from chapterhousedb_spark.operators.similarity import ivf_fit, pq_fit

    # two well-separated clusters converge almost immediately at k=2
    short = ivf_fit(df, n_cells=2, max_iter=6)
    long = ivf_fit(df, n_cells=2, max_iter=25)
    assert short == long
    ps = pq_fit(df, m=2, nbits=1, max_iter=6)
    pl = pq_fit(df, m=2, nbits=1, max_iter=25)
    assert ps == pl


def test_pq_topk_normalize_false_refine_degenerates_to_brute_force(spark):
    """pq_topk(normalize=False) threads the raw-space flag through
    encode AND scoring (the pinned-codebook twins' shape —
    pq_refine_fixed runs this exact path); refine >= corpus still
    degenerates to exact brute force regardless of the flag."""
    from chapterhousedb_spark.operators.similarity import (
        cosine_topk,
        pq_topk,
    )
    from chapterhousedb_spark.workload.llm import (
        _pq_fixed_books,
        _pq_fixed_query,
    )

    df = spark.createDataFrame(
        [
            (i, [float((i * 13 + j * 5) % 9 - 4) / 4.0 for j in range(64)])
            for i in range(40)
        ],
        "vec_id long, embedding array<float>",
    )
    qv = _pq_fixed_query()
    got = pq_topk(
        df, qv, k=5, refine=1000, codebooks=_pq_fixed_books(), normalize=False
    ).collect()
    exact = cosine_topk(df, qv, k=5).collect()
    assert [(r["vec_id"], r["approx_cosine"]) for r in got] == [
        (r["vec_id"], r["cosine"]) for r in exact
    ]
