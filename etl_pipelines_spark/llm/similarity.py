"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; LSH-bucketed variant
(random-hyperplane signs) as the scale path. The dot products run as
JVM-side higher-order functions (zip_with + aggregate) — no Python
boundary.

Cross-engine determinism: float x float products are exact in double;
accumulation goes through DECIMAL(38,18) so the fold order can't change
the result.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_pipelines_spark.operators.partitioning import spread_narrow as _spread

# Quantization factor for cross-engine-exact accumulation: FLOOR(x * S)
# is bit-identical on identical doubles and the long sums are exact in
# any order (64-dim * |x|<1e3 stays far below 2^63).
SCALE = 1e12


def _dot_scaled(a: Column, b: Column) -> Column:
    """Order-independent dot product of two float arrays -> double,
    quantized at 1/SCALE."""
    prods = F.zip_with(
        a,
        b,
        lambda x, y: F.floor(x.cast("double") * y.cast("double") * F.lit(SCALE)).cast("long"),
    )
    return (
        F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v).cast("double")
        / F.lit(SCALE)
    )


def _dot_scaled_pandas() -> Column:
    """Arrow-vectorized twin of `_dot_scaled` for high-volume pair
    verification: zip_with/aggregate HOFs are interpreted per element
    (~boxed lambda per component), which dominates once candidate pairs
    reach the hundreds of thousands. numpy does the identical IEEE
    double multiply + floor + exact int64 sum at SIMD speed, so results
    are bit-identical to the JVM path and the DuckDB oracle."""
    import numpy as np
    import pandas as pd

    @F.pandas_udf("double")
    def dot(a, b):  # (pd.Series, pd.Series) -> pd.Series; hints omitted:
        # `from __future__ import annotations` stringifies them and
        # pyspark's signature inference then fails to resolve pd.*
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        av = np.vstack(a.to_numpy()).astype("float64")
        bv = np.vstack(b.to_numpy()).astype("float64")
        scaled = np.floor(av * bv * SCALE).astype("int64").sum(axis=1)
        return pd.Series(scaled / SCALE)

    return dot


def _norm_pandas() -> Column:
    """Arrow-vectorized twin of `_norm` for corpus-wide norm passes:
    identical IEEE ops (double square, floor-scale, exact int64 sum,
    int64->double conversion, division, correctly-rounded sqrt), so
    results are bit-equal to the JVM path and the DuckDB oracle."""
    import numpy as np
    import pandas as pd

    @F.pandas_udf("double")
    def nrm(a):
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.vstack(a.to_numpy()).astype("float64")
        s = np.floor(A * A * SCALE).astype("int64").sum(axis=1)
        return pd.Series(np.sqrt(s / SCALE))

    return nrm


def _norm(a: Column) -> Column:
    sq = F.transform(
        a, lambda x: F.floor(x.cast("double") * x.cast("double") * F.lit(SCALE)).cast("long")
    )
    return F.sqrt(
        F.aggregate(sq, F.lit(0).cast("long"), lambda acc, v: acc + v).cast("double")
        / F.lit(SCALE)
    )


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast the query set against the corpus.

    At 100 TB the corpus side stays partitioned and only queries
    broadcast — one pass, no shuffle of the corpus. Returns
    (query_id, neighbor_id, rank, cosine).
    """
    nrm = _norm_pandas()
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        nrm(F.col(vec_col)).alias("_qn"),
    )
    c = embeddings.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        nrm(F.col(vec_col)).alias("_cn"),
    )
    dot = _dot_scaled_pandas()
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qn") * F.col("_cn")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lcg_hyperplanes(n_planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1), pure Python
    so the exact same doubles can be embedded as literals into both
    the Spark plan and the DuckDB oracle SQL.

    Generator is splitmix64 (Steele et al.), NOT a raw LCG: stride
    sampling one LCG stream lands on Marsaglia's lattice — measured
    plane-pairwise |cos| ~0.74 with the Knuth-MMIX constants, i.e.
    sixteen nearly-PARALLEL hyperplanes whose sign bits all agree.
    That degeneracy put ~20% of the sf1 corpus into one sign bucket
    (quadratic candidate blowup that more bits could not split,
    because every added bit was the same direction again). splitmix64
    mixes each counter value independently; plane |cos| drops to the
    ~1/sqrt(dim) a random basis gives, and bucket occupancy follows
    the uniform law the banding math assumes. (Name kept for
    call-site stability.)"""
    planes: list[list[float]] = []
    counter = (seed & 0xFFFFFFFFFFFFFFFF) or 0x9E3779B97F4A7C15
    mask = 0xFFFFFFFFFFFFFFFF
    for _ in range(n_planes):
        row = []
        for _ in range(dim):
            counter = (counter + 0x9E3779B97F4A7C15) & mask
            z = counter
            z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & mask
            z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & mask
            z = z ^ (z >> 31)
            row.append(((z >> 11) / float(1 << 52)) - 1.0)
        planes.append(row)
    return planes


def _plane_projections_pandas(planes: list[list[float]]) -> Column:
    """Arrow-vectorized projection pass: for each vector, an
    array<long> of the floor-scaled dot products against every plane,
    with the floor-scaled squared norm appended as the final element.
    One matrix multiply replaces n_planes interpreted zip_with/
    aggregate evaluations per row; every scalar op (IEEE double
    multiply, floor, exact int64 sum) is identical to `_dot_scaled` /
    `_norm`, so results are bit-equal to the JVM path and the oracle."""
    import numpy as np
    import pandas as pd

    P = np.array(planes, dtype="float64").T  # dim x n_planes

    @F.pandas_udf("array<long>")
    def proj(v):
        if len(v) == 0:
            return pd.Series([], dtype=object)
        A = np.vstack(v.to_numpy()).astype("float64")
        scaled = np.floor(A[:, :, None] * P[None, :, :] * SCALE).astype("int64").sum(axis=1)
        normsq = np.floor(A * A * SCALE).astype("int64").sum(axis=1)
        return pd.Series(list(np.concatenate([scaled, normsq[:, None]], axis=1)))

    return proj


def cosine_near_dups(
    embeddings: DataFrame,
    plane_bands: list[list[list[float]]],
    threshold: float = 0.4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_a, vec_b, cosine) pairs with cosine >= threshold, found via
    multi-band random-hyperplane LSH.

    Each band's planes hash every vector into a sign-pattern bucket;
    candidate pairs come from equi-self-joins on (band, bucket) — the
    corpus is never all-pairs joined. Exact cosine then prunes. Recall
    is tunable by band count; precision is exact.

    One persisted projection frame serves everything: all bands' plane
    dots AND the norm come from a single Arrow pass over the corpus
    (`_plane_projections_pandas`), then each band's bucket key is a
    sign-pattern read off that frame, and the verify stage's norms are
    element lookups — the embedding column is scanned once, not
    2 x bands + 1 times.
    """
    from etl_pipelines_spark.llm.dedup import salted_self_pairs

    flat_planes = [p for band in plane_bands for p in band]
    proj = embeddings.repartition(id_col).select(
        id_col,
        F.col(vec_col).alias("_vec"),
        _plane_projections_pandas(flat_planes)(F.col(vec_col)).alias("_d"),
    ).persist()
    proj.count()  # every band self-join and the verify joins read this

    # ONE salted self-join over all bands at once (band id inside the
    # join key, the lsh_candidate_pairs shape) instead of a join per
    # band + union: same candidate set — pairs sharing any band's
    # bucket — through half the join machinery. Each vector explodes
    # to `bands` (band, bucket) rows first; bucket strings are
    # band-prefixed so cross-band collisions are impossible.
    bucket_structs = []
    offset = 0
    for b, planes in enumerate(plane_bands):
        bits = [
            F.when(F.element_at("_d", offset + j + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for j in range(len(planes))
        ]
        bucket_structs.append(F.concat(F.lit(f"{b}|"), *bits))
        offset += len(planes)
    keyed = proj.select(
        F.col(id_col), F.explode(F.array(*bucket_structs)).alias("bucket")
    )
    cands = (
        salted_self_pairs(keyed, ["bucket"], id_col)
        .distinct()
        .select(F.col("doc_a").alias("vec_a"), F.col("doc_b").alias("vec_b"))
    )

    nrm = F.sqrt(F.element_at("_d", len(flat_planes) + 1).cast("double") / F.lit(SCALE))
    va = proj.select(
        F.col(id_col).alias("vec_a"), F.col("_vec").alias("_va"), nrm.alias("_na")
    )
    vb = proj.select(
        F.col(id_col).alias("vec_b"), F.col("_vec").alias("_vb"), nrm.alias("_nb")
    )
    dot = _dot_scaled_pandas()
    return (
        cands.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cosine", dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")))
        .filter(F.col("cosine") >= threshold)
        .select("vec_a", "vec_b", "cosine")
    )


# ---------------------------------------------------------------- k-means
#
# Trained coarse quantizer for IVF (the upgrade over hyperplane signs
# when the corpus distribution is known): classic Lloyd's iterations
# expressed as DataFrame algebra. Each round is one broadcast of the
# k-row centroid table onto the point stream (assignment is map-side —
# argmin over k JVM-evaluated distance expressions, no shuffle) plus
# one groupBy(cluster) aggregation (one shuffle of partial sums, k rows
# out). Centroids collect to the driver between rounds — k * dim
# floats, the legitimate driver-side scalar of this algorithm (same
# class as the 1-row max in ids.py).
#
# CROSS-ENGINE EXACT, so a SQL oracle can recompute the same codebook
# bit-for-bit (q38's correctness gate unrolls these rounds as DuckDB
# CTEs): init picks the k points with the smallest md5(seed|id) (md5
# exists in both engines; xxhash64 does not exist in DuckDB), argmin
# distances and the mean numerators accumulate as floor-scaled BIGINTs
# (exact in any fold order), ties in argmin break toward the lowest
# cluster index, and each mean runs the identical IEEE op sequence
# float(S) / SCALE / n in both engines.


# row-chunk for the batch x k x dim distance tensor inside the Arrow
# UDFs: bounds peak temp memory at CHUNK*k*dim doubles (~16 MB at
# k=128, dim=64) instead of arrow_batch*k*dim (~650 MB), independent
# of the Arrow batch size the session negotiated
_DIST_CHUNK = 256


def _exact_sq_dists(A, C):
    """floor-scaled int64 squared-L2 of every row of A against every
    centroid row of C, row-chunked; exact in any order/engine."""
    import numpy as np

    out = np.empty((A.shape[0], C.shape[0]), dtype="int64")
    for lo in range(0, A.shape[0], _DIST_CHUNK):
        blk = A[lo : lo + _DIST_CHUNK]
        out[lo : lo + blk.shape[0]] = (
            np.floor((blk[:, None, :] - C[None, :, :]) ** 2 * SCALE)
            .astype("int64")
            .sum(axis=2)
        )
    return out


def kmeans_centroids(
    embeddings: DataFrame,
    k: int = 8,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """k centroid vectors after `n_iter` Lloyd's rounds. When the frame
    holds fewer than k rows, k clamps to the row count (each point its
    own centroid); an empty frame is a ValueError."""
    embeddings = _spread(embeddings)
    init = (
        embeddings.select(id_col, vec_col)
        .orderBy(
            F.md5(F.concat(F.lit(f"{seed}|"), F.col(id_col).cast("string"))),
            F.col(id_col),
        )
        .limit(k)
        .collect()
    )
    if not init:
        raise ValueError("kmeans_centroids: embeddings frame is empty")
    centroids = [list(map(float, r[vec_col])) for r in init]
    k = len(centroids)  # clamp: frame may hold fewer than k rows
    dim = len(centroids[0])
    for _ in range(n_iter):
        # the pair API instead of assign_clusters: each round's
        # TorrentBroadcast (k > KM_CLOSURE_MAX_K) is destroyed right
        # after its collect — without release, n_iter codebooks
        # accumulate on the driver and every executor
        probes_udf, release = _nearest_probes_pandas(
            embeddings.sparkSession,
            centroids,
            1,
            _resolve_transport("auto", k),
        )
        assigned = embeddings.withColumn(
            "cluster", F.element_at(probes_udf(F.col(vec_col)), 1)
        )
        sums = (
            assigned.select(
                "cluster",
                *[
                    F.floor(F.element_at(vec_col, i + 1).cast("double") * F.lit(SCALE))
                    .cast("long")
                    .alias(f"_d{i}")
                    for i in range(dim)
                ],
            )
            .groupBy("cluster")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[F.sum(f"_d{i}").alias(f"_s{i}") for i in range(dim)],
            )
            .collect()
        )
        # float(S) / SCALE / n — the exact op sequence the SQL oracle
        # runs (CAST(S AS DOUBLE) / SCALE / n), so means are bit-equal
        new = {
            r["cluster"]: [float(r[f"_s{i}"]) / SCALE / r["_n"] for i in range(dim)]
            for r in sums
        }
        release()
        # empty clusters keep their previous centroid (standard Lloyd's)
        centroids = [new.get(c, centroids[c]) for c in range(k)]
    return centroids


# ------------------------------------------------------ codebook transport
#
# How the k x dim codebook reaches executor tasks. Three tiers, all
# producing BIT-IDENTICAL assignments (same _exact_sq_dists int64
# distances, same (d, cluster) tie-break order; pinned in
# test_operators):
#
# - "closure"   (k <= KM_CLOSURE_MAX_K): the matrix rides the pandas-
#   UDF closure, serialized into every task. Zero extra plan nodes —
#   right while the codebook is a few MB.
# - "broadcast" (default past the threshold): the matrix ships ONCE
#   per executor as a TorrentBroadcast variable — the same transport
#   Spark's own broadcast joins use — and the closure holds only the
#   handle. Scales to executor-memory-sized codebooks (10^6+ centroids
#   at dim 64 ~ 512 MB) with per-task cost independent of k.
# - "table"     (opt-in, beyond-executor-memory tier): the codebook is
#   a DataFrame of G-centroid group rows; vectors meet the group table
#   through a PARTITIONED cartesian join (each task holds one group
#   partition, never the whole codebook), an Arrow UDF emits each
#   group's top-nprobe (d, cluster) partials, and a groupBy(id) merge
#   keeps the global bottom-nprobe — exact because the k-wide argmin
#   distributes over a partition of the clusters (a global best is its
#   own group's best) and min over (d, cluster) pairs reproduces the
#   flat argmin's lowest-index tie-break (groups partition clusters in
#   ascending index order). The merge shuffle carries only (id, d,
#   cluster) partials — k/G small rows per vector, never the vectors
#   and never the codebook. Cost shape: vectors replicate once per
#   group partition (block-matrix-product shape) and each joined row
#   re-carries its group's centroid array across the Arrow boundary,
#   so keep G modest. Caveat this tier does NOT remove: the Python
#   `centroids` list itself is built driver-side (it is the API input
#   — kmeans_centroids returns a list), so the DRIVER still holds the
#   codebook once at plan build; past that, no executor ever does. A
#   codebook too big for the driver needs a table-to-table join
#   against a persisted codebook table, same shape as this plan.
#
# adaptive_km_k (queries/llmops.py) grows k with the corpus; at 10^9+
# vectors the closure transport was the named 100 TB ceiling — the
# broadcast/table tiers remove it, and KM_MAX_K is raised accordingly.

KM_CLOSURE_MAX_K = 256
KM_TABLE_GROUP = 64


def _nearest_probes_pandas(
    spark, centroids, nprobe: int, transport: str, distance: str = "exact"
):
    """(Arrow UDF, release) pair: the UDF returns each vector's
    `nprobe` nearest cluster ids, nearest first — shared by assign
    (nprobe=1) and multi-probe. The codebook rides the closure or a
    TorrentBroadcast per `transport`; `release()` destroys the
    broadcast once every job reading the UDF has finished (a no-op
    for the closure tier) — iterative callers like kmeans_centroids
    MUST call it per round or k x dim x 8 bytes leak per iteration.

    nprobe == 1 takes np.argmin (O(k) per row, first-occurrence =
    lowest-index tie-break) instead of a full stable argsort
    (O(k log k)) — same winner, measurably cheaper on the hot
    assignment path now that k can reach 4096.

    `distance` picks the kernel:
    - "exact" (default, the gate path): floor-scaled per-component
      int64 squared-L2 — bit-identical across engines/plans, but an
      interpreted O(n*k*dim) loop no BLAS can touch.
    - "matmul": float32 GEMM — d2(a, c) ~ |c|^2 - 2 a.c (the per-row
      |a|^2 constant drops out of argmin/ordering, so it is never
      computed). One A @ C.T per Arrow batch: 50-100x the exact
      kernel's throughput at k >= 10^3, the production assignment
      path past ~10^7 vectors (SCALE.md). NOT oracle-bit-exact: ties
      and near-ties (|d2 gap| within float32 rounding of the dot) may
      order differently — use on corpora, not on gate fixtures."""
    import numpy as np
    import pandas as pd

    if distance not in ("exact", "matmul"):
        raise ValueError(f"unknown distance kernel: {distance!r}")

    C0 = np.array(centroids, dtype="float64")
    if distance == "matmul":
        C0 = C0.astype("float32")

    if transport == "broadcast":
        bc = spark.sparkContext.broadcast(C0)

        def get_C():
            return bc.value

        def release():
            bc.destroy()

    else:
        def get_C():
            return C0

        def release():
            pass

    @F.pandas_udf("array<int>")
    def probes(v):
        if len(v) == 0:
            return pd.Series([], dtype=object)
        C = get_C()
        A = np.vstack(v.to_numpy())
        if distance == "matmul":
            A = A.astype("float32")
            # |c|^2 - 2 a.c ranks identically to true squared-L2
            d = (C * C).sum(axis=1)[None, :] - 2.0 * (A @ C.T)
        else:
            d = _exact_sq_dists(A.astype("float64"), C)
        if nprobe == 1:
            # argmin returns the FIRST minimum: identical tie-break
            # to stable argsort's head (lowest cluster index)
            order = np.argmin(d, axis=1).astype("int32")[:, None]
        else:
            order = np.argsort(d, axis=1, kind="stable")[:, :nprobe].astype(
                "int32"
            )
        return pd.Series(list(order))

    return probes, release


def _table_probes(
    embeddings: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    vec_col: str,
    id_col: str,
    group: int = KM_TABLE_GROUP,
) -> DataFrame:
    """(id_col, probes array<int>) via the centroid-TABLE join tier.
    `id_col` must be unique per row (it keys the partial merge)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    spark = embeddings.sparkSession
    k = len(centroids)
    nprobe = min(nprobe, k)
    rows = [
        (g0, [list(map(float, c)) for c in centroids[g0 : g0 + group]])
        for g0 in range(0, k, group)
    ]
    groups = spark.createDataFrame(
        rows,
        StructType(
            [
                StructField("_base", IntegerType(), False),
                StructField("_cents", ArrayType(ArrayType(DoubleType())), False),
            ]
        ),
    )

    @F.pandas_udf("array<array<long>>")
    def tops(v, base, cents):
        if len(v) == 0:
            return pd.Series([], dtype=object)
        out = [None] * len(v)
        base_np = base.to_numpy()
        # rows sharing a _base share one centroid chunk: vectorize per
        # distinct group within the batch
        for b in np.unique(base_np):
            idx = np.nonzero(base_np == b)[0]
            A = np.vstack(v.iloc[idx].to_numpy()).astype("float64")
            C = np.vstack(
                [np.asarray(c, dtype="float64") for c in cents.iloc[idx[0]]]
            )
            d = _exact_sq_dists(A, C)
            order = np.argsort(d, axis=1, kind="stable")[:, :nprobe]
            for j, row_i in enumerate(idx):
                out[row_i] = [
                    [int(d[j, c]), int(b) + int(c)] for c in order[j]
                ]
        return pd.Series(out)

    # PARTITIONED cross join — deliberately NOT broadcast: a broadcast
    # would materialize the whole grouped codebook on the driver and
    # every executor, re-creating exactly the memory ceiling this tier
    # exists to remove. As a CartesianProduct, each task pairs one
    # vector partition with one group partition, so a task holds only
    # its slice of the codebook (G x dim x 8 bytes per group row) and
    # the vectors replicate per group partition — the cost shape of
    # every shared-nothing block-matrix product.
    part = (
        embeddings.select(id_col, vec_col)
        .crossJoin(
            # shuffle_replicate_nl pins the CartesianProduct strategy:
            # without it the planner sees a kilobyte-sized group table
            # and silently picks BroadcastNestedLoop — the exact
            # transport this tier must avoid
            groups.repartition(max(2, len(rows))).hint(
                "shuffle_replicate_nl"
            )
        )
        .select(
            id_col,
            tops(F.col(vec_col), F.col("_base"), F.col("_cents")).alias("_t"),
        )
    )
    merged = (
        part.select(id_col, F.explode("_t").alias("_p"))
        .groupBy(id_col)
        # lexicographic [d, cluster] ascending == (dist, index) order
        .agg(F.slice(F.array_sort(F.collect_list("_p")), 1, nprobe).alias("_top"))
    )
    return merged.select(
        id_col,
        F.transform("_top", lambda x: F.element_at(x, 2).cast("int")).alias(
            "probes"
        ),
    )


def _resolve_transport(transport: str, k: int) -> str:
    if transport == "auto":
        return "closure" if k <= KM_CLOSURE_MAX_K else "broadcast"
    if transport not in ("closure", "broadcast", "table"):
        raise ValueError(f"unknown codebook transport: {transport!r}")
    return transport


def assign_clusters(
    embeddings: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out: str = "cluster",
    id_col: str = "vec_id",
    transport: str = "auto",
    distance: str = "exact",
) -> DataFrame:
    """Nearest-centroid assignment, Arrow-batched: squared-L2 against
    each centroid as floor-scaled int64 sums (exact in any order, so
    identical in every engine/plan/transport); ties break toward the
    lowest cluster index — the same (dist, index) order the SQL
    oracle's ROW_NUMBER uses. One matrix op per batch replaces a
    k*dim-literal expression tree that blows past JVM codegen limits.

    `transport` picks how the codebook reaches tasks (see the
    transport note above); "auto" = closure for small k, broadcast
    past KM_CLOSURE_MAX_K. The "table" tier needs `id_col` unique.
    `distance="matmul"` swaps in the float32 GEMM kernel (see
    _nearest_probes_pandas) — the production assignment path past
    ~10^7 vectors, where oracle bit-equality is not required; the
    table tier is exact-only (its partial merge compares int64
    distances across tasks)."""
    transport = _resolve_transport(transport, len(centroids))
    if transport == "table":
        if distance != "exact":
            raise ValueError(
                "table transport merges int64 distance partials across "
                "tasks and is exact-only; use closure/broadcast for matmul"
            )
        probes = _table_probes(embeddings, centroids, 1, vec_col, id_col)
        assigned = probes.select(
            id_col, F.element_at("probes", 1).alias(out)
        )
        return embeddings.join(assigned, id_col).select(
            *embeddings.columns, out
        )
    probes_udf, _release = _nearest_probes_pandas(
        embeddings.sparkSession, centroids, 1, transport, distance
    )
    # the returned frame is lazy: the broadcast must outlive every
    # consumer job, so release is the caller's (or GC's) business here
    return embeddings.withColumn(
        out, F.element_at(probes_udf(F.col(vec_col)), 1)
    )


def nearest_clusters(
    embeddings: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    vec_col: str = "embedding",
    out: str = "probes",
    id_col: str = "vec_id",
    transport: str = "auto",
    distance: str = "exact",
) -> DataFrame:
    """Array of the `nprobe` nearest cluster indices per vector,
    nearest first — the multi-probe query side of IVF. Same exact
    floor-scaled int64 distances as `assign_clusters`; ties break
    toward the lower cluster index (np.argsort stable over an index-
    ordered distance matrix == ORDER BY (d, cluster)). `transport`
    and `distance` as in `assign_clusters`."""
    transport = _resolve_transport(transport, len(centroids))
    if transport == "table":
        if distance != "exact":
            raise ValueError(
                "table transport merges int64 distance partials across "
                "tasks and is exact-only; use closure/broadcast for matmul"
            )
        probes = _table_probes(
            embeddings, centroids, nprobe, vec_col, id_col
        ).withColumnRenamed("probes", out)
        return embeddings.join(probes, id_col).select(
            *embeddings.columns, out
        )
    probes_udf, _release = _nearest_probes_pandas(
        embeddings.sparkSession,
        centroids,
        min(nprobe, len(centroids)),
        transport,
        distance,
    )
    return embeddings.withColumn(out, probes_udf(F.col(vec_col)))


def ivf_topk(
    embeddings: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_queries: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF ANN with a TRAINED coarse quantizer: vectors partition into
    nearest-centroid cells (`assign_clusters` over a `kmeans_centroids`
    codebook); each query exactly re-ranks only its `nprobe` nearest
    cells (FAISS's nprobe knob — the recall/cost dial: a neighbor just
    across a cell boundary is invisible at nprobe=1 and found at 2+).

    At 100 TB the codebook is trained once (k x dim floats) and the
    cell id becomes the table's physical partition/cluster key, so a
    query probes nprobe partitions instead of the corpus. Returns
    (query_id, neighbor_id, rank, cosine)."""
    bucketed = assign_clusters(_spread(embeddings), centroids, vec_col=vec_col, out="bucket")
    nrm = _norm_pandas()
    q = (
        nearest_clusters(
            bucketed.filter(F.col(id_col) < n_queries), centroids, nprobe, vec_col
        )
        .select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qvec"),
            nrm(F.col(vec_col)).alias("_qn"),
            F.explode("probes").alias("_qbucket"),
        )
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        nrm(F.col(vec_col)).alias("_cn"),
        F.col("bucket"),
    )
    dot = _dot_scaled_pandas()
    scored = (
        c.join(F.broadcast(q), F.col("bucket") == F.col("_qbucket"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qn") * F.col("_cn")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


# ------------------------------------------- two-level (coarse+fine) quantizer
#
# The last named 100 TB ceiling (SCALE.md): a FLAT codebook at the
# ~250-vector occupancy law needs k ~ 4 x 10^6 cells for 10^9 vectors —
# assignment is O(k * dim) per row and the argmin matrix no longer fits
# a sane Arrow batch budget. The classical escape (IVF-HNSW aside) is a
# TWO-LEVEL quantizer (coarse k1, then k2 fine cells per coarse cell,
# k_eff = k1 * k2): per-row assignment cost drops from O(k_eff * dim)
# to O((k1 + k2) * dim) — sqrt(k_eff) vs k_eff — while the full fine
# codebook (k1 * k2 * dim doubles) still ships ONCE per executor via
# the same TorrentBroadcast transport tier `assign_clusters` uses.
# At k_eff = 4M, dim 64: codebook 2 GB broadcast (executor-memory-
# sized, the broadcast tier's documented ceiling) but per-row work is
# ~4k dots, 1000x less than flat.
#
# Training is fully distributed: the coarse level is plain
# kmeans_centroids; the fine level trains ALL cells simultaneously —
# one deterministic md5-ranked init per cell (a window, not a driver
# loop), then Lloyd rounds where assignment indexes the broadcast
# [cell -> fine block] and the update is one groupBy((cell, fine))
# shuffle of floor-scaled partial sums. No per-cell driver iteration
# anywhere, so k1 cells train in O(n) per round regardless of k1.


def two_level_centroids(
    embeddings: DataFrame,
    k1: int = 256,
    k2: int = 256,
    n_iter: int = 3,
    fine_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> tuple[list[list[float]], list[list[list[float]]]]:
    """(coarse, fine): `coarse` is a k1-row codebook; `fine[c]` holds
    the fine centroids of coarse cell c (<= k2 rows — cells with fewer
    members than k2 clamp to their member count, so k_eff =
    sum(len(fine[c])) <= k1 * k2). Same exact floor-scaled BIGINT
    arithmetic as `kmeans_centroids`, so results are deterministic
    across partitionings and engines."""
    from pyspark.sql import Window

    coarse = kmeans_centroids(
        embeddings, k=k1, n_iter=n_iter, id_col=id_col, vec_col=vec_col, seed=seed
    )
    k1 = len(coarse)  # may have clamped
    dim = len(coarse[0])
    spark = embeddings.sparkSession

    assigned = assign_clusters(
        _spread(embeddings), coarse, vec_col=vec_col, out="_c1", id_col=id_col
    ).select(id_col, vec_col, "_c1")
    # fine Lloyd rounds re-read the assignment; cache the thin frame
    assigned = assigned.persist()

    # deterministic per-cell init: the k2 members with the smallest
    # md5(seed|id) within each coarse cell — one window, no driver loop
    w = Window.partitionBy("_c1").orderBy(
        F.md5(F.concat(F.lit(f"{seed}|f|"), F.col(id_col).cast("string"))),
        F.col(id_col),
    )
    init_rows = (
        assigned.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= k2)
        .select("_c1", "_r", vec_col)
        .collect()
    )
    fine: list[list[list[float]]] = [[] for _ in range(k1)]
    for r in sorted(init_rows, key=lambda r: (r["_c1"], r["_r"])):
        fine[r["_c1"]].append(list(map(float, r[vec_col])))

    for _ in range(fine_iter):
        fidx_udf, release = _fine_assign_pandas(spark, fine, vec_col)
        sums = (
            assigned.withColumn("_f", fidx_udf(F.col("_c1"), F.col(vec_col)))
            .select(
                "_c1",
                "_f",
                *[
                    F.floor(
                        F.element_at(vec_col, i + 1).cast("double") * F.lit(SCALE)
                    )
                    .cast("long")
                    .alias(f"_d{i}")
                    for i in range(dim)
                ],
            )
            .groupBy("_c1", "_f")
            .agg(
                F.count(F.lit(1)).alias("_n"),
                *[F.sum(f"_d{i}").alias(f"_s{i}") for i in range(dim)],
            )
            .collect()
        )
        release()
        new = {
            (r["_c1"], r["_f"]): [
                float(r[f"_s{i}"]) / SCALE / r["_n"] for i in range(dim)
            ]
            for r in sums
        }
        fine = [
            [new.get((c, j), fine[c][j]) for j in range(len(fine[c]))]
            for c in range(k1)
        ]
    assigned.unpersist()
    return coarse, fine


_LAST_FINE_BC = None


def release_fine_codebook() -> None:
    """Free the session's live fine-codebook broadcast (if any) —
    call after the last frame built on a `two_level_assign` has been
    materialized. Registration is single-slot: shipping a new fine
    codebook frees the previous one automatically."""
    global _LAST_FINE_BC
    if _LAST_FINE_BC is not None:
        _LAST_FINE_BC.destroy()
        _LAST_FINE_BC = None


def _fine_assign_pandas(spark, fine, vec_col: str, transport: str = "broadcast"):
    """(Arrow UDF, release): given (coarse_cell, vector) columns,
    return the argmin fine index WITHIN that cell's fine block — the
    second hop of the two-level assignment. The ragged fine codebook
    rides one TorrentBroadcast (the existing transport tier); per-row
    work is O(len(fine[cell]) * dim) regardless of k_eff. Same
    floor-scaled int64 distances and lowest-index tie-break as the
    flat kernel."""
    import numpy as np
    import pandas as pd

    blocks0 = [np.array(b, dtype="float64") if b else None for b in fine]
    if transport == "broadcast":
        bc = spark.sparkContext.broadcast(blocks0)

        def get_blocks():
            return bc.value

        def release():
            global _LAST_FINE_BC
            bc.destroy()
            if _LAST_FINE_BC is bc:
                _LAST_FINE_BC = None

        # single-slot registry (the dedup gram-cache pattern): at the
        # 2 GB-codebook scale, repeated two_level_assign calls in one
        # session must not accumulate TorrentBroadcasts until GC finds
        # the handles — registering here frees the PREVIOUS codebook
        # the moment a new one ships, bounding the session to one live
        # fine codebook; release_fine_codebook() frees the last one.
        global _LAST_FINE_BC
        if _LAST_FINE_BC is not None:
            _LAST_FINE_BC.destroy()
        _LAST_FINE_BC = bc

    else:  # closure tier: small codebooks ride the task closure
        def get_blocks():
            return blocks0

        def release():
            pass

    @F.pandas_udf("int")
    def fidx(c1, v):
        if len(v) == 0:
            return pd.Series([], dtype="int32")
        blocks = get_blocks()
        out = np.zeros(len(v), dtype="int32")
        c1v = c1.to_numpy()
        # rows sharing a coarse cell share one fine block: vectorize
        # per distinct cell within the batch
        for c in np.unique(c1v):
            idx = np.nonzero(c1v == c)[0]
            B = blocks[int(c)]
            if B is None or len(B) == 1:
                continue  # empty/singleton block: fine index 0
            A = np.vstack(v.iloc[idx].to_numpy()).astype("float64")
            d = _exact_sq_dists(A, B)
            out[idx] = np.argmin(d, axis=1).astype("int32")
        return pd.Series(out)

    return fidx, release


def two_level_assign(
    embeddings: DataFrame,
    coarse: list[list[float]],
    fine: list[list[list[float]]],
    vec_col: str = "embedding",
    out: str = "cell",
    id_col: str = "vec_id",
    transport: str = "auto",
    distance: str = "exact",
) -> DataFrame:
    """Assign every vector a GLOBAL cell id in [0, k_eff): coarse
    argmin (O(k1)) then fine argmin within the winning cell (O(k2)),
    cell = base_offset[coarse] + fine_idx with offsets the cumsum of
    per-cell fine block sizes. Adds `out` (long) plus `_c1` (int, the
    coarse cell — callers that route physical partitioning by coarse
    cell read it directly). `transport`/`distance` control the COARSE
    hop exactly as in `assign_clusters`; the fine hop always rides a
    broadcast of the ragged fine codebook."""
    offsets = [0] * len(fine)
    acc = 0
    for c, b in enumerate(fine):
        offsets[c] = acc
        acc += max(1, len(b))
    spark = embeddings.sparkSession
    assigned = assign_clusters(
        embeddings, coarse, vec_col=vec_col, out="_c1",
        id_col=id_col, transport=transport, distance=distance,
    )
    fidx_udf, _release = _fine_assign_pandas(spark, fine, vec_col)
    off_expr = F.element_at(
        F.array(*[F.lit(o) for o in offsets]), F.col("_c1") + 1
    ).cast("long")
    # broadcast must outlive every consumer job of the lazy frame; it
    # sits in the single-slot registry, so the NEXT two-level call (or
    # release_fine_codebook()) frees it — at most one live fine
    # codebook per session, never an unbounded accumulation
    return assigned.withColumn(
        out, off_expr + fidx_udf(F.col("_c1"), F.col(vec_col)).cast("long")
    )


def two_level_topk(
    embeddings: DataFrame,
    coarse: list[list[float]],
    fine: list[list[list[float]]],
    k: int = 10,
    n_queries: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe1: int = 4,
    nprobe2: int = 4,
    transport: str = "auto",
    distance: str = "exact",
) -> DataFrame:
    """IVF ANN over the TWO-LEVEL quantizer — the composed end-to-end
    path for 10^9-vector corpora where a flat codebook at the ~250
    occupancy law would need k ~ 4M and O(k*dim) per-row assignment.

    Corpus side: every vector gets a global cell in [0, k_eff) via
    `two_level_assign` (O((k1+k2)*dim) per row). Query side: each
    query probes its `nprobe1` nearest coarse cells, and within each,
    its `nprobe2` nearest fine centroids — nprobe1*nprobe2 global
    cells out of k_eff. Candidates join on the cell id (queries
    broadcast; the corpus never shuffles), exact-cosine re-rank,
    row_number <= k. At 100 TB the global cell is the table's
    physical partition key, so a query reads nprobe1*nprobe2
    partitions instead of the corpus. Returns
    (query_id, neighbor_id, rank, cosine)."""
    import numpy as np
    import pandas as pd

    offsets = [0] * len(fine)
    acc = 0
    for c, b in enumerate(fine):
        offsets[c] = acc
        acc += max(1, len(b))

    bucketed = two_level_assign(
        _spread(embeddings), coarse, fine, vec_col=vec_col, out="cell",
        id_col=id_col, transport=transport, distance=distance,
    )

    # query-side probe set: nprobe1 coarse probes (the existing
    # multi-probe kernel), then nprobe2 fine probes INSIDE each probed
    # block via the broadcast ragged fine codebook
    qside = nearest_clusters(
        embeddings.filter(F.col(id_col) < n_queries).select(id_col, vec_col),
        coarse, min(nprobe1, len(coarse)), vec_col,
        transport=transport, distance=distance,
    )
    blocks0 = [np.array(b, dtype="float64") if b else None for b in fine]
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(blocks0)
    off_arr = list(offsets)
    np2 = nprobe2

    @F.pandas_udf("array<long>")
    def qcells(probes, v):
        if len(v) == 0:
            return pd.Series([], dtype="object")
        blocks = bc.value
        out = []
        for pr, vec in zip(probes, v):
            a = np.asarray(vec, dtype="float64")[None, :]
            cells: list[int] = []
            for c in pr:
                B = blocks[int(c)]
                if B is None or len(B) == 1:
                    cells.append(off_arr[int(c)])
                    continue
                d = _exact_sq_dists(a, B)[0]
                order = np.argsort(d, kind="stable")[: min(np2, len(B))]
                cells.extend(off_arr[int(c)] + int(j) for j in order)
            out.append(cells)
        return pd.Series(out)

    nrm = _norm_pandas()
    q = qside.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        nrm(F.col(vec_col)).alias("_qn"),
        F.explode(qcells(F.col("probes"), F.col(vec_col))).alias("_qcell"),
    )
    c = bucketed.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        nrm(F.col(vec_col)).alias("_cn"),
        F.col("cell"),
    )
    dot = _dot_scaled_pandas()
    scored = (
        c.join(F.broadcast(q), F.col("cell") == F.col("_qcell"))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine", dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qn") * F.col("_cn"))
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def semantic_dedup(
    embeddings: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    near-duplicate removal that only ever compares vectors INSIDE the
    same k-means cell. Assign every vector to its nearest centroid
    (`assign_clusters` over a `kmeans_centroids` codebook), generate
    within-cell (a < b) pairs, exact-cosine verify, and drop any
    vector that has a lower-id neighbor at cosine >= threshold (the
    deterministic keep-lowest-id keeper rule; greedy by id, so a
    removal chain a~b, b~c drops both b and c even when a !~ c —
    the paper's one-representative-per-group approximation).

    Scale shape: candidates are sum-over-cells of |cell|^2, never
    corpus^2 — k grows with the corpus so |cell| stays bounded, the
    cell id is the physical partition key, and hot cells split via
    `salted_self_pairs`. Returns one row per input vector:
    (id_col, cluster, keep)."""
    from etl_pipelines_spark.llm.dedup import salted_self_pairs

    nrm = _norm_pandas()
    proj = (
        assign_clusters(_spread(embeddings), centroids, vec_col=vec_col, out="cluster")
        .select(
            id_col,
            F.col("cluster").cast("long").alias("cluster"),
            F.col(vec_col).alias("_vec"),
            nrm(F.col(vec_col)).alias("_n"),
        )
        .persist()
    )
    # eager: the pair self-join and both verify joins re-read this
    proj.count()

    pairs = salted_self_pairs(proj.select(id_col, "cluster"), ["cluster"], id_col)
    va = proj.select(
        F.col(id_col).alias("doc_a"), F.col("_vec").alias("_va"), F.col("_n").alias("_na")
    )
    vb = proj.select(
        F.col(id_col).alias("doc_b"), F.col("_vec").alias("_vb"), F.col("_n").alias("_nb")
    )
    dot = _dot_scaled_pandas()
    removed = (
        pairs.join(va, "doc_a")
        .join(vb, "doc_b")
        .withColumn(
            "cosine", dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
        )
        .filter(F.col("cosine") >= threshold)
        .select(F.col("doc_b").alias("_rm"))
        .distinct()
        # removed-set-sized (small): pin it so the cached projection
        # can be released before returning — the heavy pair self-join
        # and verify joins have consumed the cache by the time this
        # materializes; the final thin (id, cluster) projection then
        # re-derives from lineage instead of leaking cached blocks for
        # the lifetime of the session
        .localCheckpoint(eager=True)
    )
    proj.unpersist()
    return (
        proj.join(removed, proj[id_col] == removed["_rm"], "left")
        .select(
            id_col,
            "cluster",
            F.col("_rm").isNull().alias("keep"),
        )
    )
