"""Similarity search over embedding columns (``array<float>``).

* ``cosine_topk`` — brute-force exact top-k: query×candidate join with a
  JVM-side fold (``aggregate``/``zip_with``) for the dot product, window
  top-k per query. Correctness baseline; cost O(|Q|·|C|·d) — fine when the
  query set is small or as the verify stage.
* ``lsh_cosine_topk`` — sign-random-projection LSH: vectors hash to a
  small bit-bucket; candidates share a bucket in ≥1 table; exact rerank of
  candidates only. The 100 TB path: bucket join instead of cross join, and
  the planes are a broadcast literal (deterministic seed) so every executor
  hashes identically.
"""

# NOTE: no `from __future__ import annotations` here — pandas_udf resolves
# real type hints, and stringified annotations break its signature check.

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from incubator_stormcrawler_spark.session import cut_iteration_lineage


def clustered_embeddings(
    spark,
    n: int = 2000,
    dim: int = 16,
    n_clusters: int = 64,
    noise: float = 0.15,
) -> DataFrame:
    """Deterministic CLUSTERED embedding fixture: ``n_clusters`` uniform
    random centers in [-1,1]^dim, each vector = its cluster's center plus
    per-vector noise of amplitude ``noise`` (cluster = vec_id mod
    n_clusters). Within-cluster cosine ≈ 0.99, cross-cluster ≈ 0 — the
    geometry real text/image embeddings have and the driver's random
    `embeddings` table deliberately lacks (IVF's worst case, where recall
    can only track scan fraction). All randomness is md5-derived
    arithmetic, so DuckDB reproduces the exact same vectors from the same
    expressions (see `_CLUSTERED_FIXTURE_SQL` in __spark_entry__.py) —
    the fixture itself is oracle-checkable, not just the queries over it.
    """
    elems = []
    for j in range(dim):
        # integer-in-[-1000,1000] / double → exact IEEE division, so
        # DuckDB reproduces every element bit-for-bit (1e3 not 1000.0:
        # a decimal literal would make the whole expression DECIMAL)
        c = (
            f"(cast(conv(substr(md5(concat('c-', cast(id % {n_clusters} "
            f"as string), '-{j}')), 1, 8), 16, 10) as bigint) % 2001 "
            f"- 1000) / 1e3"
        )
        nz = (
            f"((cast(conv(substr(md5(concat('n-', cast(id as string), "
            f"'-{j}')), 1, 8), 16, 10) as bigint) % 2001 - 1000) / 1e3)"
            f" * {noise}"
        )
        elems.append(f"({c} + {nz})")
    # Truncate the fixture's lineage (r14): the projection above is a
    # ~dim*2 md5/conv expression FOREST, and every consumer (query
    # filter, exact baseline, projection, rerank) clones it into its own
    # analysis/compile — the recall queries repeated it 4-6x per plan.
    # A lazy localCheckpoint materializes the 2000-row fixture once and
    # hands consumers a LogicalRDD; values are unchanged (deterministic
    # md5 arithmetic). Measured on ann_jl_recall_clustered at sf0.1:
    # build+exec 1.73 -> 1.32 s warm (5.8 -> 1.8 cold).
    return spark.range(n).selectExpr(
        "id as vec_id", f"array({', '.join(elems)}) as embedding"
    ).localCheckpoint(eager=False)


def ivf_scan_stats(
    embeddings: DataFrame,
    queries: DataFrame,
    n_centroids: int = 32,
    n_probe: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-query CANDIDATE COUNT of the IVF index (how many vectors the
    probe set actually scores) — the cost half of the recall/cost curve.
    Built from the SAME candidate pipeline as ``ivf_cosine_topk``
    (shared ``_ivf_index`` — r7 review fix: a duplicated pipeline would
    silently drift from the index whose recall is measured); returns
    (query_id, n_candidates, scan_frac)."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    n_total = e.count()
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    assign, probes = _ivf_index(e, q, n_centroids, n_probe)
    return (
        assign.join(F.broadcast(probes.select("query_id", "cid")), "cid")
        .where(F.col("query_id") != F.col("vec_id"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_candidates"))
        .select(
            "query_id",
            "n_candidates",
            F.round(F.col("n_candidates") / F.lit(n_total), 4).alias(
                "scan_frac"
            ),
        )
    )


def _dot(a, b):
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    sq = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.sqrt(sq)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    Returns (query_id, vec_id, sim, rank). ``sim`` is rounded for stable
    cross-engine comparison; ranking uses the unrounded value (ties then
    broken by vec_id, so output is deterministic).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    )
    sim = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn("sim_raw", sim)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim_raw"), 4).alias("sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH (broadcast literal)."""
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).round(6).tolist()


def lsh_bucket_expr(vec, planes: list[list[float]]):
    """Bucket id = bits of sign(v·p) over the plane set — a tiny int key."""
    bits = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        bits.append(
            F.when(_dot(vec, plane) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_planes: int = 12,
    n_tables: int = 8,
    mp_depth: int = 3,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via MULTI-PROBE sign-LSH: candidates = vectors
    whose bucket is within Hamming distance ``mp_depth`` of the query's
    bucket in any of ``n_tables`` independent plane sets; exact cosine
    rerank of candidates only (Lv et al., VLDB 2007 multi-probe idea:
    probe the neighboring buckets instead of hashing more tables).

    Probing happens on the QUERY side only — each query row explodes into
    C(n_planes, ≤mp_depth) probe buckets per table and the corpus keeps
    exactly ``n_tables`` index rows per vector, so deeper probing costs
    broadcast width (small side), never corpus-index replication. That is
    the 100 TB knob ordering: index size scales with n_tables, recall per
    index byte scales with mp_depth.

    Default 12 planes × 8 tables × Hamming≤3 was chosen from a measured
    sweep against ``cosine_topk`` on the worst case for sign-LSH (random
    64-dim vectors, neighbors at cosine ≈0.3-0.5): recall@5 = 0.86 at
    sf0.01 / 0.92 at sf0.1 while scoring ~46% of the corpus — vs 0.56
    recall for the old no-probe 4×6 config at 33%, and vs 0.92-1.0 recall
    configs that scored 60-90%+ (see BASELINE.md cost curve). Clustered
    real embeddings prune far harder at the same recall.
    """
    c = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # All tables' buckets in ONE Arrow-vectorized pass per side: a single
    # (batch × dim) · (dim × tables·planes) GEMM + sign-bit packing per
    # batch, then an unpivot to (table, bucket) join keys. The expression-
    # fold alternative (aggregate over zip_with) is a ~30 µs/row
    # interpreted path — higher-order functions don't join whole-stage
    # codegen — which made bucket hashing cost more than the brute-force
    # scan it was replacing; one numpy GEMM per Arrow batch is ~1000×.
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    all_planes = [
        random_hyperplanes(dim, n_planes, seed=42 + t) for t in range(n_tables)
    ]
    plane_mat = np.concatenate(
        [np.asarray(p, dtype=np.float64) for p in all_planes], axis=0
    )  # (n_tables*n_planes, dim)
    weights = (1 << np.arange(n_planes, dtype=np.int64))

    @pandas_udf("array<int>")
    def all_buckets(vs: pd.Series) -> pd.Series:
        a = np.array(list(vs), dtype=np.float64)  # (batch, dim)
        bits = (a @ plane_mat.T) >= 0  # (batch, tables*planes)
        bk = bits.reshape(len(a), n_tables, n_planes) @ weights
        return pd.Series(list(bk.astype(np.int32)))

    def with_buckets(df, vcol):
        return df.withColumn("bk", all_buckets(F.col(vcol))).select(
            "*", F.posexplode("bk").alias("t", "bucket")
        ).drop("bk")

    # Multi-probe masks: every XOR mask with ≤ mp_depth bits set. Applied
    # to the query side AFTER bucketing, so the join stays a plain equi
    # join on (table, bucket) — the only shape that hash-partitions at
    # scale (a hamming-distance theta join would plan a nested loop).
    masks = [m for m in range(1 << n_planes)
             if bin(m).count("1") <= mp_depth]
    # one parsed expr string instead of ~300 F.lit py4j round trips
    # (identical Catalyst tree — same lesson as random_projection, r13)
    mask_arr = F.expr(f"array({','.join(str(m) for m in masks)})")
    probes = (
        with_buckets(q, "qv")
        .withColumn("mask", F.explode(mask_arr))
        .withColumn("bucket", F.col("bucket").bitwiseXOR(F.col("mask")))
        .drop("mask")
    )
    cands = (
        with_buckets(c, "cv")
        .join(F.broadcast(probes), ["t", "bucket"])
        .select("query_id", "qv", "vec_id", "cv")
        .where(F.col("query_id") != F.col("vec_id"))
        .dropDuplicates(["query_id", "vec_id"])
    )

    @pandas_udf("double")
    def cosine(qv: pd.Series, cv: pd.Series) -> pd.Series:
        a = np.array(list(qv), dtype=np.float64)
        b = np.array(list(cv), dtype=np.float64)
        an = np.linalg.norm(a, axis=1)
        bn = np.linalg.norm(b, axis=1)
        an[an == 0] = 1.0
        bn[bn == 0] = 1.0
        return pd.Series(np.einsum("ij,ij->i", a, b) / (an * bn))

    sim = cosine(F.col("qv"), F.col("cv"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("vec_id")
    )
    return (
        cands.withColumn("sim_raw", sim)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim_raw"), 4).alias("sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def _arrow_cosine():
    """Arrow-batched cosine pandas_udf shared by the IVF stages."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cosine(qv: pd.Series, cv: pd.Series) -> pd.Series:
        a = np.array(list(qv), dtype=np.float64)
        b = np.array(list(cv), dtype=np.float64)
        an = np.linalg.norm(a, axis=1)
        bn = np.linalg.norm(b, axis=1)
        an[an == 0] = 1.0
        bn[bn == 0] = 1.0
        return pd.Series(np.einsum("ij,ij->i", a, b) / (an * bn))

    return cosine


def _ivf_index(e, q, n_centroids: int, n_probe: int):
    """The IVF index pipeline shared by ``ivf_cosine_topk`` (recall) and
    ``ivf_scan_stats`` (cost) so the two halves of the published curve
    can never drift apart: deterministic md5-sample centroids, one
    Arrow-cosine assignment pass collapsed by a partial-aggregable
    max_by (ties to the lowest cid, matching the oracle's window
    tiebreak), query-side probe selection of the ``n_probe`` nearest
    cells. Takes e(vec_id, v) and q(query_id, qv); returns
    (assign(vec_id, cid), probes(query_id, qv, cid))."""
    cosine = _arrow_cosine()
    cents = (
        e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(n_centroids)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )
    scored = e.crossJoin(F.broadcast(cents)).withColumn(
        "csim", cosine(F.col("v"), F.col("cv"))
    )
    assign = scored.groupBy("vec_id").agg(
        F.max_by(
            F.col("cid"), F.struct(F.col("csim"), -F.col("cid"))
        ).alias("cid")
    )
    qs = q.crossJoin(F.broadcast(cents)).withColumn(
        "csim", cosine(F.col("qv"), F.col("cv"))
    )
    wq = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cid")
    )
    probes = (
        qs.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= n_probe)
        .select("query_id", "qv", "cid")
    )
    return assign, probes


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 32,
    n_probe: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: partition vectors into ``n_centroids`` cells by
    nearest centroid, probe only the ``n_probe`` cells nearest each query,
    exact-rerank the survivors. The cluster-pruned complement to
    ``lsh_cosine_topk`` — candidates shrink ~n_probe/n_centroids, and the
    cell assignment is reusable across query batches (an index, where LSH
    re-hashes per table).

    Default 32 cells × 12 probes from a measured sweep on worst-case
    random vectors (no cluster structure, so recall ≈ scanned fraction):
    recall@5 = 0.69 (sf0.01) / 0.75 (sf0.1) scanning ~38% — the best
    frontier point below half-corpus scans; 16×4 (the old default)
    measured 0.58 at 25%. Clustered real embeddings concentrate neighbors
    in the probed cells and do far better at the same probe fraction
    (see BASELINE.md curve).

    Centroids are a deterministic sample — the ``n_centroids`` vectors
    with smallest md5(id) (IVF seeding by random sample, no Lloyd
    iterations, so the index is reproducible and oracle-checkable).
    Assignment is one pass over the corpus against the broadcast centroid
    set with an Arrow-batched cosine, collapsed by a partial-aggregable
    max_by groupBy — no window over the corpus, no driver collect.
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    assign, probes = _ivf_index(e, q, n_centroids, n_probe)
    cosine = _arrow_cosine()
    cells = e.join(assign, "vec_id")
    cands = (
        cells.join(F.broadcast(probes), "cid")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "qv", "vec_id", "v")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("vec_id")
    )
    return (
        cands.withColumn("sim_raw", cosine(F.col("qv"), F.col("v")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim_raw"), 4).alias("sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|x|/127,
    q_i = round(x_i/scale) — 4× memory shrink for the ANN candidate
    store (the rerank stage keeps float32). Pure higher-order-function
    expressions (transform/aggregate), fully JVM-side; the quantized
    column is emitted as a compact csv string so the row is
    engine-portable, plus the reconstruction RMSE so the quality loss is
    auditable per vector.

    At 100 TB the point is the scan: an int8 candidate table is a quarter
    of the bytes off object storage, and the (scale, qvec) pair
    dequantizes inside the same projection that scores it.
    """
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    # zero vector → scale 1 (quantizes to all-zeros, no div-by-zero)
    scale = F.when(amax > 0, amax / F.lit(127.0)).otherwise(F.lit(1.0))
    q = F.transform(v, lambda x: F.round(x.cast("double") / F.col("scale")).cast("int"))
    err2 = F.aggregate(
        F.zip_with(
            v,
            F.col("q"),
            lambda x, qi: (x.cast("double") - qi * F.col("scale"))
            * (x.cast("double") - qi * F.col("scale")),
        ),
        F.lit(0.0),
        lambda acc, e: acc + e,
    )
    return (
        embeddings.select(F.col(id_col), v.alias(vec_col))
        .withColumn("scale", scale)
        .withColumn("q", q)
        .withColumn(
            "rmse", F.round(F.sqrt(err2 / F.size(v)), 6)
        )
        .select(
            id_col,
            F.round(F.col("scale"), 6).alias("scale"),
            F.concat_ws(",", F.transform(F.col("q"), lambda x: x.cast("string")))
            .alias("qvec"),
            "rmse",
        )
    )


def _pq_codebook(e: DataFrame, k: int) -> DataFrame:
    """Deterministic k-entry codebook: smallest-md5(id) seed sample (same
    reproducible rule as ``ivf_cosine_topk`` / ``kmeans_embeddings``)."""
    return (
        e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )


def _pq_subspaces(
    df: DataFrame, id_name: str, vec_name: str, m: int, out: str,
    guard: str | None = None,
) -> DataFrame:
    """Explode (id, vec) into m rows of (id, s, subvector). With ``guard``
    set, adds an ``__chk`` column asserting dim % m == 0 (a non-divisible
    dim would silently drop trailing dimensions — fail loudly instead;
    consumers fold ``__chk`` into d2 so column pruning can't drop it)."""
    d = (F.size(vec_name) / m).cast("int")
    cols = [
        F.col(id_name),
        F.col("s"),
        F.slice(vec_name, F.col("s") * d + 1, d).alias(out),
    ]
    if guard:
        cols.append(
            F.assert_true(
                F.size(vec_name) % m == 0,
                F.lit(f"{guard}: vector length not divisible by m"),
            ).alias("__chk")
        )
    return df.select(
        id_name,
        F.explode(F.sequence(F.lit(0), F.lit(m - 1))).alias("s"),
        vec_name,
    ).select(*cols)


def _sq_l2(a, b):
    """Squared L2 distance between two float arrays — a strict
    index-order JVM fold, so every engine accumulates identically."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, z: acc + z,
    )


def _pq_assignments(
    e: DataFrame, m: int, k: int, guard: str
) -> DataFrame:
    """Per-(vector, subspace) nearest codeword: (vec_id, s, b(cid, d2),
    subdim). The codebook broadcasts; the corpus explodes ×m, scores
    against k codewords (partial-aggregable argmin via ``min_by``)."""
    csub = _pq_subspaces(_pq_codebook(e, k), "cid", "cv", m, "csv")
    sub = _pq_subspaces(e, "vec_id", "v", m, "sv", guard=guard)
    scored = sub.join(F.broadcast(csub), "s").withColumn(
        "d2",
        _sq_l2(F.col("sv"), F.col("csv"))
        + F.coalesce(F.col("__chk").cast("double"), F.lit(0.0)),
    )
    return scored.groupBy("vec_id", "s").agg(
        F.min_by(F.struct("cid", "d2"), F.struct("d2", "cid")).alias("b"),
        F.first(F.size("sv")).alias("subdim"),
    )


def pq_encode(
    embeddings: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product quantization (Jégou et al. 2011): split each vector into
    ``m`` subvectors and encode each against a ``k``-entry per-subspace
    codebook — the memory layout of IVF-PQ ANN indexes (m bytes per vector
    at k≤256 instead of 4·dim). Codebooks here are the deterministic
    smallest-md5(id) seed sample (same reproducible rule as
    ``ivf_cosine_topk`` / ``kmeans_embeddings`` seeding; Lloyd refinement
    composes via ``kmeans_embeddings`` on the sliced subvectors).

    Returns (vec_id, pq_code "c0-c1-…", rmse). Scale shape: the codebook
    (k full vectors) broadcasts; the corpus explodes ×m subspaces, scores
    against k candidates per subspace (partial-aggregable argmin via
    ``min_by``), and regroups on vec_id — O(corpus·m·k) flops, ONE
    corpus shuffle, no driver-side collect of data.
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    best = _pq_assignments(e, m, k, guard="pq_encode")
    return best.groupBy("vec_id").agg(
        F.concat_ws(
            "-",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("s", F.col("b.cid").alias("cid")))
                ),
                lambda p: p["cid"].cast("string"),
            ),
        ).alias("pq_code"),
        F.round(
            F.sqrt(F.sum("b.d2") / F.sum("subdim")), 6
        ).alias("rmse"),
    )


def kmeans_embeddings(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cut_every: int = 3,
) -> DataFrame:
    """Lloyd's k-means over the embedding column, fixed iterations,
    deterministic seeding — the centroid-training step ``ivf_cosine_topk``
    presupposes (its cells are exactly these clusters; more iterations →
    tighter cells → fewer probes for the same recall).

    Seeds: the k vectors with smallest md5(id) (reproducible sample, same
    rule as IVF). Each iteration: (1) assignment — corpus × broadcast
    centroids, squared-euclidean argmin via ``min_by`` (partial-aggregable
    groupBy, no window over the corpus); (2) update — per-dimension mean
    via posexplode + groupBy(cid, dim), rebuilt into centroid arrays with
    array_sort over (dim, mean) structs. Both stages shuffle only
    O(corpus) and O(k·dim) rows respectively; nothing collects to the
    driver, so the loop scales to any corpus that partitions.

    Returns (vec_id, cid, dist2) — final assignments with rounded squared
    distance; cluster sizes/inertia are one groupBy away.
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    cents = (
        e.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )

    def d2(a, b):
        diffs = F.zip_with(
            a, b, lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double"))
        )
        return F.aggregate(diffs, F.lit(0.0), lambda acc, x: acc + x)

    def assign(cent_df):
        scored = e.crossJoin(F.broadcast(cent_df)).withColumn(
            "dist2", d2(F.col("v"), F.col("cv"))
        )
        # argmin with deterministic ties: smallest (dist2, cid)
        return scored.groupBy("vec_id").agg(
            F.min_by(
                F.struct("cid", "dist2"), F.struct("dist2", "cid")
            ).alias("best")
        ).select(
            "vec_id",
            F.col("best.cid").alias("cid"),
            F.col("best.dist2").alias("dist2"),
        )

    for it in range(iterations):
        assigned = assign(cents).join(e, "vec_id")
        dims = assigned.select(
            "cid", F.posexplode("v").alias("dim", "x")
        )
        means = (
            dims.groupBy("cid", "dim")
            .agg(F.avg(F.col("x").cast("double")).alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
        # a centroid that attracted zero points produces no mean row —
        # keep its previous position (left join + coalesce) so k never
        # silently shrinks between iterations
        kept = (
            cents.select("cid", F.col("cv").alias("__prev_cv"))
            .join(means, "cid", "left")
            .select(
                "cid",
                F.coalesce(
                    F.col("cv"),
                    F.transform("__prev_cv", lambda x: x.cast("double")),
                ).alias("cv"),
            )
        )
        # Lineage cut on the shared cadence (rationale + measurements in
        # session.cut_iteration_lineage: a lazy checkpoint compiles its
        # plan at call time, exchange reuse dedupes the repeated cents
        # subtrees between cuts; 1.36 -> 0.48 s solo on the registered
        # query, byte-identical assignments).
        # cut_every: the per-centroid-tree lineage-cut cadence. The
        # default 3 is the measured optimum for kmeans consumed DIRECTLY
        # (embedding_kmeans: a per-iteration cut costs more compile than
        # it saves at iterations=2). A consumer that re-truncates the
        # final assignment itself (semdedup persists it for its pair
        # stage) passes cut_every=1: there the downstream persist/compile
        # pays O(plan depth) AGAIN, and keeping the centroid tree shallow
        # measured 2.5 -> 1.9 s warm on the full semdedup build+exec.
        cents = cut_iteration_lineage(kept, it, iterations, every=cut_every)
    final = assign(cents)

    return final.select(
        "vec_id", "cid", F.round(F.col("dist2"), 4).alias("dist2")
    )


def embedding_cosine_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 16,
) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold, id1 < id2.

    Physical plan — distributed block outer product, NO driver-side
    materialization: rows hash into ``num_blocks`` blocks, each block packs
    into one (ids, matrix) row via a partial-aggregable collect_list, and
    the B·(B+1)/2 block pairs GEMM against each other in an Arrow-batched
    stage (one numpy/BLAS multiply per block pair — vectorized, never
    per-pair Python). Exact all-pairs is inherently quadratic in compute,
    but memory per task is two blocks (2·N/B·dim doubles — size B so a
    block fits an executor), and shuffle is B× replication of the matrix,
    both tunable. This is the exact/verify stage; the sub-quadratic scale
    path for candidate GENERATION is ``lsh_cosine_topk``'s bucket join with
    this same rerank math.
    """
    import pandas as pd

    b = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks)).alias("blk"),
    )
    packed = b.groupBy("blk").agg(
        F.collect_list("id").alias("ids"), F.collect_list("v").alias("vecs")
    )
    left = packed.select(
        F.col("blk").alias("b1"),
        F.col("ids").alias("ids1"),
        F.col("vecs").alias("vecs1"),
    )
    right = packed.select(
        F.col("blk").alias("b2"),
        F.col("ids").alias("ids2"),
        F.col("vecs").alias("vecs2"),
    )
    # B rows per side → the b1<=b2 nested-loop join is over B² tiny rows;
    # each unordered block pair materializes exactly once.
    block_pairs = left.join(F.broadcast(right), F.col("b1") <= F.col("b2"))

    def run(batches):
        def normed(vecs):
            m = np.array(list(vecs), dtype=np.float64)
            n = np.linalg.norm(m, axis=1)
            n[n == 0] = 1.0
            return m / n[:, None]

        for pdf in batches:
            for _, row in pdf.iterrows():
                ids1 = np.asarray(row["ids1"], dtype=np.int64)
                ids2 = np.asarray(row["ids2"], dtype=np.int64)
                if len(ids1) == 0 or len(ids2) == 0:
                    continue
                sims = np.round(normed(row["vecs1"]) @ normed(row["vecs2"]).T, 4)
                ai, bj = np.where(sims >= threshold)
                if row["b1"] == row["b2"]:
                    # diagonal block: every unordered pair shows up in both
                    # triangles of sims — keep the strict upper one only
                    keep = ids1[ai] < ids2[bj]
                    id1, id2 = ids1[ai][keep], ids2[bj][keep]
                else:
                    # disjoint blocks: each pair occurs once; orient by id
                    keep = np.ones(len(ai), dtype=bool)
                    id1 = np.minimum(ids1[ai], ids2[bj])
                    id2 = np.maximum(ids1[ai], ids2[bj])
                yield pd.DataFrame(
                    {"id1": id1, "id2": id2, "sim": sims[ai, bj][keep]}
                )

    return block_pairs.mapInPandas(
        run, schema="id1 bigint, id2 bigint, sim double"
    )


def semdedup(
    embeddings: DataFrame,
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.92,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv 2303.09540): semantic
    deduplication = k-means partition the embedding space, then inside
    each cluster drop every vector that has a higher-similarity twin —
    cosine >= threshold — with a smaller id. Returns one row per vector:
    (vec_id, cid, kept, dup_of) where dup_of is the smallest same-cluster
    id that shadows a dropped vector (NULL for survivors).

    Keep rule: the paper keeps the member farthest from the centroid; we
    keep the smallest id of each duplicate relation instead — same corpus
    shrink, but deterministic and expressible in ANSI SQL so the DuckDB
    oracle can value-check it (documented swap point; changing the rule is
    a one-line edit of the min()).

    Scale: this is the whole point of SemDeDup — the quadratic pair stage
    is confined WITHIN clusters. k grows with corpus size (the paper uses
    50k clusters for LAION-440M) so the expected cluster N/k stays
    bounded; the self-join shuffles both sides once on cid and AQE splits
    a skewed mega-cluster. The k-means assignment is localCheckpoint'd so
    the pair join and the final survivor join don't each replay Lloyd's
    iterations.
    """
    # persist(), not localCheckpoint (r14): both make the two consumers
    # (the pair join and the final survivor join) share ONE computation
    # of the assignment, but a lazy localCheckpoint COMPILES the full
    # Lloyd plan at call time (measured 1.7-5.3 s of pure driver-side
    # physical planning on the k=8/2-iteration plan) while persist defers
    # to the single action. cut_every=1 keeps the centroid lineage
    # shallow so that one compile is cheap. A/B warm totals at sf0.1:
    # checkpoint 2.51 s, persist 2.37, cut_every=1 + persist 1.92.
    assigned = (
        kmeans_embeddings(
            embeddings, k=k, iterations=iterations,
            id_col=id_col, vec_col=vec_col, cut_every=1,
        )
        .select("vec_id", "cid")
        .persist()
    )
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    # precompute each vector's norm ONCE (O(N) folds) — the intra-cluster
    # self-join is the quadratic stage, and recomputing both norms per
    # candidate pair would triple its per-pair flops
    withv = assigned.join(e, "vec_id").withColumn(
        "nrm", _norm(F.col("v"))
    )
    a = withv.select(
        F.col("vec_id").alias("id1"), "cid",
        F.col("v").alias("v1"), F.col("nrm").alias("n1"),
    )
    b = withv.select(
        F.col("vec_id").alias("id2"), "cid",
        F.col("v").alias("v2"), F.col("nrm").alias("n2"),
    )
    sim = _dot(F.col("v1"), F.col("v2")) / (F.col("n1") * F.col("n2"))
    shadows = (
        a.join(b, "cid")
        .where(F.col("id1") < F.col("id2"))
        .where(F.round(sim, 4) >= threshold)
        .groupBy(F.col("id2").alias("vec_id"))
        .agg(F.min("id1").alias("dup_of"))
    )
    return assigned.join(shadows, "vec_id", "left").select(
        "vec_id",
        "cid",
        F.col("dup_of").isNull().alias("kept"),
        "dup_of",
    )


def rademacher_matrix(
    in_dim: int, out_dim: int, seed: int = 42
) -> list[list[int]]:
    """Deterministic ±1 (Rademacher) projection matrix, ``out_dim`` rows of
    ``in_dim`` signs, derived from md5 parity (Achlioptas 2003: ±1 entries
    satisfy the Johnson–Lindenstrauss lemma with the same distortion bound
    as Gaussians). hashlib-only — platform-independent, no RNG state — so
    BOTH engines can be handed the identical literal matrix."""
    import hashlib

    return [
        [
            1
            if hashlib.md5(f"jl|{seed}|{j}|{i}".encode()).digest()[0] & 1
            else -1
            for i in range(in_dim)
        ]
        for j in range(out_dim)
    ]


def random_projection(
    embeddings: DataFrame,
    out_dim: int = 8,
    seed: int = 42,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    unroll: bool = False,
) -> DataFrame:
    """Johnson–Lindenstrauss random projection: reduce ``in_dim`` float
    vectors to ``out_dim`` doubles via a seeded ±1 matrix scaled by
    1/√out_dim — the cheap dimensionality cut in front of ANN / clustering
    / dedup stages (project once, then run LSH or k-means in the small
    space; pairwise distances are preserved within (1±ε) w.h.p.).

    Scale shape: a PURE per-row projection — the matrix rides the plan as
    literals, no shuffle, no UDF, no collect; the scan prunes to (id,
    vec). Two physical forms producing BIT-IDENTICAL doubles (same IEEE
    op order — the leading 0.0 preserves the fold's -0.0 normalization):
    the default ``aggregate`` fold, and ``unroll=True`` which flattens
    each dot product into a codegen'd add chain (``0.0 + v[1]·s₁ + …``).
    The unroll trades a FIXED janino-compilation cliff (~2.5 s for the
    64×8 matrix, paid per fresh plan) for 2.2× faster per-row execution
    (HOF lambdas evaluate interpreted): it amortizes above ~1 M vectors
    — the 100 TB default — while the fold wins on small/interactive
    plans, so the caller picks. Division is by the SAME IEEE √out_dim on
    every engine; rounded to 6 for the oracle hash.
    """
    mat = rademacher_matrix(in_dim, out_dim, seed)
    scale = float(out_dim) ** 0.5
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).withColumn(
        "__chk",
        F.assert_true(
            F.size("v") == in_dim,
            F.lit("random_projection: vector length != in_dim"),
        ),
    )

    # Each component is built as ONE parsed SQL expression instead of the
    # equivalent ~70 py4j DSL calls (F.lit per matrix entry + the fold
    # lambdas): the parser produces the IDENTICAL Catalyst tree (same
    # fold, same casts, same IEEE op order — verified exceptAll = 0 both
    # ways), but the 64×8 matrix costs 8 driver→JVM round-trips instead
    # of ~1500, which measured ~0.6 s of pure plan-BUILD time per call on
    # the profiled JL queries (each builds two projections).
    def dot_row(row):
        arr = "array(" + ",".join(str(s) for s in row) + ")"
        if not unroll:
            return F.expr(
                f"aggregate(zip_with(v, CAST({arr} AS ARRAY<DOUBLE>),"
                " (x, s) -> CAST(x AS DOUBLE) * s),"
                " 0.0D, (acc, z) -> acc + z)"
            )
        terms = " + ".join(
            f"CAST(element_at(v, {i + 1}) AS DOUBLE) * {float(s)}D"
            for i, s in enumerate(row)
        )
        return F.expr(f"0.0D + {terms}")

    comps = [
        F.round(
            dot_row(row) / F.lit(scale)
            + F.coalesce(F.col("__chk").cast("double"), F.lit(0.0)),
            6,
        )
        for row in mat
    ]
    return e.select("vec_id", F.array(*comps).alias("proj"))


def random_projection_sql(
    out_dim: int = 8, seed: int = 42, in_dim: int = 64
) -> str:
    """DuckDB oracle: the IDENTICAL literal matrix (same hashlib
    derivation) applied with the same sequential fold order —
    ``list_sum(list_transform(range ...))`` multiplies and accumulates in
    index order exactly like the Spark ``aggregate`` fold. Emits the
    registered query's EXPLODED scalar shape (vec_id, pos, component) —
    one row per output component, 0-based pos like Spark's posexplode —
    because the driver's comparator cannot canonicalize array cells."""
    mat = rademacher_matrix(in_dim, out_dim, seed)
    comps = []
    for j, row in enumerate(mat):
        lit = "[" + ",".join(f"{s}.0" for s in row) + "]"
        comps.append(
            f"round(list_sum(list_transform(range(1, {in_dim + 1}),"
            f" i -> v[i] * ({lit})[i])) / sqrt({out_dim}), 6) AS c{j}"
        )
    case = " ".join(f"WHEN {j} THEN c{j}" for j in range(out_dim))
    return (
        "SELECT vec_id, CAST(pos AS BIGINT) AS pos,"
        f" CASE pos {case} END AS component"
        " FROM (SELECT vec_id, " + ", ".join(comps) +
        " FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings))"
        f" CROSS JOIN (SELECT unnest(generate_series(0, {out_dim - 1}))"
        " AS pos)"
    )


def pq_adc_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    m: int = 8,
    k: int = 16,
    topk: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """PQ asymmetric-distance (ADC) top-k search (Jégou et al. 2011 §IV):
    the query stays a FULL float vector while the corpus is its m-byte PQ
    code, and distance is looked up, not computed — ``adc(q, x) = Σ_s
    lut[q][s][code(x, s)]`` where the LUT holds the query-subvector →
    codeword squared distances. This is the search half of an IVF-PQ
    index: ``pq_encode`` is the storage layout, this is how queries read
    it without decompressing the corpus.

    Scale shape: corpus vectors are touched EXACTLY ONCE (the same
    ``_pq_assignments`` pass that encodes them — at serving time those
    codes are precomputed and this stage is a scan of m-byte codes); the
    LUT is nq·m·k rows built from a broadcast codebook and broadcast into
    the distance join, so the per-candidate cost is m lookups + an add —
    no per-pair O(dim) fold, which is the whole point of ADC. One shuffle
    groups (query, candidate) partial sums; per-query top-k is a window
    over rounded distance with id tiebreak (deterministic cross-engine).
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    codes = _pq_assignments(e, m, k, guard="pq_adc_topk").select(
        "vec_id", "s", F.col("b.cid").alias("cid")
    )
    qsub = _pq_subspaces(
        e.where(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("qid"), "v"),
        "qid", "v", m, "qsv",
    )
    csub = _pq_subspaces(_pq_codebook(e, k), "cid", "cv", m, "csv")
    lut = qsub.join(F.broadcast(csub), "s").select(
        "qid", "s", "cid", _sq_l2(F.col("qsv"), F.col("csv")).alias("qd2")
    )
    dist = (
        codes.join(F.broadcast(lut), ["s", "cid"])
        .groupBy("qid", "vec_id")
        .agg(F.round(F.sum("qd2"), 6).alias("adc_dist"))
    )
    w = Window.partitionBy("qid").orderBy("adc_dist", "vec_id")
    return (
        dist.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("qid", "vec_id", "adc_dist", "rank")
    )


def pq_adc_topk_sql(
    query_ids: list[int],
    m: int = 8,
    k: int = 16,
    topk: int = 5,
    subdim: int = 8,
) -> str:
    """DuckDB oracle: replays codebook seeding, per-subspace assignment,
    the query LUT, and the ADC sum — same rounded-distance + id tiebreak."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), seeds AS (
  SELECT vec_id AS cid, v AS cv FROM e
  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT {k}
), pairs AS (
  SELECT e.vec_id, t.s, c.cid,
         list_sum(list_transform(range(1, {subdim + 1}),
           i -> (e.v[t.s * {subdim} + i] - c.cv[t.s * {subdim} + i])
              * (e.v[t.s * {subdim} + i] - c.cv[t.s * {subdim} + i]))) AS d2
  FROM e, unnest(generate_series(0, {m - 1})) t(s) CROSS JOIN seeds c
), codes AS (
  SELECT vec_id, s, cid FROM (
    SELECT vec_id, s, cid,
           row_number() OVER (PARTITION BY vec_id, s ORDER BY d2, cid) AS rn
    FROM pairs
  ) WHERE rn = 1
), lut AS (
  SELECT q.vec_id AS qid, t.s, c.cid,
         list_sum(list_transform(range(1, {subdim + 1}),
           i -> (q.v[t.s * {subdim} + i] - c.cv[t.s * {subdim} + i])
              * (q.v[t.s * {subdim} + i] - c.cv[t.s * {subdim} + i]))) AS qd2
  FROM e q, unnest(generate_series(0, {m - 1})) t(s) CROSS JOIN seeds c
  WHERE q.vec_id IN ({ids})
), dist AS (
  SELECT lut.qid, codes.vec_id, round(sum(lut.qd2), 6) AS adc_dist
  FROM codes JOIN lut ON codes.s = lut.s AND codes.cid = lut.cid
  GROUP BY lut.qid, codes.vec_id
)
SELECT qid, vec_id, adc_dist, rank FROM (
  SELECT qid, vec_id, adc_dist,
         row_number() OVER (
           PARTITION BY qid ORDER BY adc_dist, vec_id
         )::INT AS rank
  FROM dist
) WHERE rank <= {topk}
"""


def jl_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    out_dim: int = 8,
    seed: int = 8,
    shortlist: int = 50,
    in_dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-stage ANN through the JL projection: shortlist the top
    ``shortlist`` candidates per query by squared L2 distance in the
    ``out_dim``-dim PROJECTED space (distances preserved within (1±ε)
    w.h.p.), then exact-cosine rerank only the shortlist in the original
    space. The third index family next to sign-LSH (bucket collision)
    and IVF (cell probe): no index structure at all — the projection cuts
    the per-pair scoring cost by in_dim/out_dim (8× at 64→8) and the
    rerank touches shortlist·|Q| full vectors instead of |corpus|·|Q|.

    Scale shape: corpus projected in ONE fold pass (no shuffle); the
    query-side projections broadcast; shortlist selection is a window
    top-C per query (partial per-partition heads); the rerank joins the
    C·|Q| candidate ids back to full vectors — broadcast-sized by
    construction. Deterministic cross-engine: projections are the
    bit-reproducible rounded JL outputs, distances fold identically, ties
    break by vec_id.
    """
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    # localCheckpoint the projections: the unrolled literal-matrix
    # expression is ~in_dim·out_dim nodes, and without the cut it is
    # CLONED into every downstream stage (both window sides, the rerank
    # probe) — at 64×8 the repeated codegen compilation alone measured
    # ~5 s on a 2000-row corpus. The checkpoint materializes the small
    # (id, out_dim) frame once and keeps the giant expression out of
    # every later plan.
    p = random_projection(
        embeddings, out_dim=out_dim, seed=seed, in_dim=in_dim,
        id_col=id_col, vec_col=vec_col,
    ).localCheckpoint(eager=False)
    pq = (
        random_projection(
            queries, out_dim=out_dim, seed=seed, in_dim=in_dim,
            id_col=id_col, vec_col=vec_col,
        )
        .select(
            F.col("vec_id").alias("query_id"), F.col("proj").alias("qproj")
        )
        .localCheckpoint(eager=False)
    )
    wshort = Window.partitionBy("query_id").orderBy("pd2", "vec_id")
    short = (
        p.crossJoin(F.broadcast(pq))
        .where(F.col("query_id") != F.col("vec_id"))
        .withColumn("pd2", _sq_l2(F.col("proj"), F.col("qproj")))
        .withColumn("rn", F.row_number().over(wshort))
        .where(F.col("rn") <= shortlist)
        .select("query_id", "vec_id")
    )
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    sim = _dot(F.col("qv"), F.col("cv")) / (
        _norm(F.col("qv")) * _norm(F.col("cv"))
    )
    wrank = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("vec_id")
    )
    return (
        short.join(e.select("vec_id", F.col("v").alias("cv")), "vec_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("sim_raw", sim)
        .withColumn("rank", F.row_number().over(wrank))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round(F.col("sim_raw"), 4).alias("sim"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def jl_cand_sql(
    out_dim: int = 8, seed: int = 8, shortlist: int = 50, in_dim: int = 64,
    n_queries: int = 20,
) -> str:
    """The JL shortlist pipeline as a CTE block over ``e(vec_id, v)``:
    the IDENTICAL literal matrix (shared hashlib derivation with
    ``random_projection``), the same rounded projections, the same
    sequential L2 fold and (distance, id) ordering."""
    mat = rademacher_matrix(in_dim, out_dim, seed)
    comps = []
    for row in mat:
        lit = "[" + ",".join(f"{s}.0" for s in row) + "]"
        comps.append(
            f"round(list_sum(list_transform(range(1, {in_dim + 1}),"
            f" i -> v[i] * ({lit})[i])) / sqrt({out_dim}), 6)"
        )
    arr = "[" + ", ".join(comps) + "]"
    return f"""p AS (
  SELECT vec_id, {arr} AS proj FROM e
), pq AS (
  SELECT vec_id AS query_id, proj AS qproj FROM p
  WHERE vec_id < {n_queries}
), cand AS (
  SELECT query_id, vec_id FROM (
    SELECT pq.query_id, p.vec_id,
           row_number() OVER (
             PARTITION BY pq.query_id
             ORDER BY list_sum(list_transform(range(1, {out_dim + 1}),
               i -> (p.proj[i] - pq.qproj[i]) * (p.proj[i] - pq.qproj[i]))),
               p.vec_id
           ) AS rn
    FROM p, pq WHERE p.vec_id <> pq.query_id
  ) WHERE rn <= {shortlist}
)"""


def ivf_pq_adc_topk(
    embeddings: DataFrame,
    query_ids: list[int],
    m: int = 8,
    k: int = 16,
    topk: int = 5,
    n_centroids: int = 32,
    n_probe: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ search — the standard billion-scale serving composition
    (Jégou et al. 2011 §V; the FAISS ``IVFx,PQy`` read path): the IVF
    coarse quantizer restricts each query to its ``n_probe`` nearest
    cells (~n_probe/n_centroids of the corpus) and ADC scores ONLY those
    survivors from their m-byte PQ codes via the broadcast query LUT —
    no full-vector distance anywhere in the scan path. Composes the two
    registered halves unchanged: ``_ivf_index`` (cells + probes, the
    ann_ivf_* pipeline) and ``pq_adc_topk``'s code/LUT stages.

    Scale shape at 10^9 vectors: cell assignment and PQ codes are
    index-build artifacts (one pass each, reusable across query
    batches); a query batch touches n_probe/n_centroids of the m-byte
    codes (semi-join through the probed cells), each candidate costing m
    LUT lookups + an add. The LUT is nq*m*k rows — broadcastable at any
    corpus size. One shuffle groups candidate partial sums; per-query
    top-k is a window over rounded distance with id tiebreak
    (deterministic cross-engine). Non-residual variant (codes quantize
    raw vectors, not cell residuals) so the PQ codebook stays
    cell-independent and oracle-replayable; residual encoding is the
    accuracy upgrade a production index would add."""
    e = embeddings.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    )
    q = e.where(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    assign, probes = _ivf_index(e, q, n_centroids, n_probe)
    cand = (
        probes.select("query_id", "cid")
        .join(assign, "cid")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
    )
    codes = _pq_assignments(e, m, k, guard="ivf_pq_adc_topk").select(
        "vec_id", "s", F.col("b.cid").alias("pq_cid")
    )
    qsub = _pq_subspaces(
        q.select(F.col("query_id").alias("qid"), F.col("qv").alias("v")),
        "qid", "v", m, "qsv",
    )
    csub = _pq_subspaces(_pq_codebook(e, k), "cid", "cv", m, "csv")
    lut = qsub.join(F.broadcast(csub), "s").select(
        F.col("qid").alias("query_id"), "s",
        F.col("cid").alias("pq_cid"),
        _sq_l2(F.col("qsv"), F.col("csv")).alias("qd2"),
    )
    dist = (
        cand.join(codes, "vec_id")
        .join(F.broadcast(lut), ["query_id", "s", "pq_cid"])
        .groupBy("query_id", "vec_id")
        .agg(F.round(F.sum("qd2"), 6).alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "vec_id")
    return (
        dist.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= topk)
        .select("query_id", "vec_id", "adc_dist", "rank")
    )


def ivf_pq_adc_topk_sql(
    query_ids: list[int],
    m: int = 8,
    k: int = 16,
    topk: int = 5,
    subdim: int = 8,
    n_centroids: int = 32,
    n_probe: int = 12,
) -> str:
    """DuckDB oracle for :func:`ivf_pq_adc_topk`: replays centroid
    seeding, cell assignment, probe selection, PQ codebook/codes, the
    query LUT, and the cell-restricted ADC sum — same rounded distance
    and id tiebreak."""
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), cents AS (
  SELECT vec_id AS cid, v AS cv FROM e
  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT {n_centroids}
), assign AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cid
           ) AS rn
    FROM e CROSS JOIN cents c
  ) WHERE rn = 1
), probes AS (
  SELECT query_id, cid FROM (
    SELECT q.vec_id AS query_id, c.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY list_cosine_similarity(q.v, c.cv) DESC, c.cid
           ) AS rn
    FROM (SELECT * FROM e WHERE vec_id IN ({ids})) q CROSS JOIN cents c
  ) WHERE rn <= {n_probe}
), cand AS (
  SELECT p.query_id, a.vec_id
  FROM probes p JOIN assign a USING (cid)
  WHERE p.query_id <> a.vec_id
), seeds AS (
  SELECT vec_id AS pq_cid, v AS cv FROM e
  ORDER BY md5(cast(vec_id AS VARCHAR)), vec_id LIMIT {k}
), pairs AS (
  SELECT e.vec_id, t.s, c.pq_cid,
         list_sum(list_transform(range(1, {subdim + 1}),
           i -> (e.v[t.s * {subdim} + i] - c.cv[t.s * {subdim} + i])
              * (e.v[t.s * {subdim} + i] - c.cv[t.s * {subdim} + i]))) AS d2
  FROM e, unnest(generate_series(0, {m - 1})) t(s) CROSS JOIN seeds c
), codes AS (
  SELECT vec_id, s, pq_cid FROM (
    SELECT vec_id, s, pq_cid,
           row_number() OVER (
             PARTITION BY vec_id, s ORDER BY d2, pq_cid) AS rn
    FROM pairs
  ) WHERE rn = 1
), lut AS (
  SELECT q.vec_id AS query_id, t.s, c.pq_cid,
         list_sum(list_transform(range(1, {subdim + 1}),
           i -> (q.v[t.s * {subdim} + i] - c.cv[t.s * {subdim} + i])
              * (q.v[t.s * {subdim} + i] - c.cv[t.s * {subdim} + i]))) AS qd2
  FROM e q, unnest(generate_series(0, {m - 1})) t(s) CROSS JOIN seeds c
  WHERE q.vec_id IN ({ids})
), dist AS (
  SELECT c.query_id, c.vec_id, round(sum(lut.qd2), 6) AS adc_dist
  FROM cand c
  JOIN codes ON codes.vec_id = c.vec_id
  JOIN lut ON lut.query_id = c.query_id
          AND lut.s = codes.s AND lut.pq_cid = codes.pq_cid
  GROUP BY c.query_id, c.vec_id
)
SELECT query_id, vec_id, adc_dist, rank FROM (
  SELECT query_id, vec_id, adc_dist,
         row_number() OVER (
           PARTITION BY query_id ORDER BY adc_dist, vec_id
         )::INT AS rank
  FROM dist
) WHERE rank <= {topk}
"""
