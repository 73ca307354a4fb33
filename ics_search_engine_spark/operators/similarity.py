"""Similarity search over embedding columns (array<float>).

Training-pipeline requirement: brute-force cosine top-k as the exact
baseline; LSH-bucketed and IVF variants as the scale path.

Scale analysis:
* brute force is a full scan per query — O(N·d); fine as a correctness
  oracle and for small N, linear-unscalable for ANN serving;
* random-hyperplane LSH: bucket = sign bits of ``R·v`` for P seeded
  hyperplanes → candidates share a bucket (optionally multi-probe by
  hamming-adjacent buckets); the probe set is a broadcast filter, so
  the scan prunes to matching buckets (partition by bucket at write
  time to turn this into partition pruning);
* IVF: k centroids learned via seeded k-means-lite (a few Lloyd
  iterations as DataFrame joins), cell = argmin centroid; queries probe
  ``n_probe`` nearest cells.

Hyperplanes/centroid init are seeded from numpy RandomState — no
wall-clock, deterministic across runs (resume/rank-identity ethos).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, SparkSession


def _dot_lit(vec_col: Column, q: list[float]) -> Column:
    qcol = F.array(*[F.lit(float(x)) for x in q])
    return F.aggregate(
        F.zip_with(vec_col, qcol, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(vec_col: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            vec_col, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine_topk_bruteforce(
    emb: DataFrame, qvec: list[float], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: one scan, TakeOrderedAndProject."""
    qnorm = float(np.sqrt(np.dot(qvec, qvec)))
    cos = _dot_lit(F.col(vec_col), qvec) / (_norm(F.col(vec_col)) * F.lit(qnorm))
    return (
        emb.select(F.col(id_col), cos.alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_filtered(
    emb: DataFrame, qvec: list[float], predicate: Column, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ES knn-with-filter semantics: the filter applies BEFORE the k
    selection (pre-filter), so the result is exactly k hits that ALL
    satisfy the predicate — never a post-filtered short page.  One
    filtered scan + TakeOrderedAndProject; the predicate participates
    in parquet pushdown when it references scannable columns.

    With the IVF layout the same pre-filter composes after cell-probe
    partition pruning (read_ivf_partitioned(...).filter(probe).filter(
    predicate)) — the probe prunes directories, the predicate prunes
    rows, and k is selected from survivors only."""
    return cosine_topk_bruteforce(
        emb.filter(predicate), qvec, k, id_col=id_col, vec_col=vec_col
    )


def hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim)


def lsh_bucket_col(vec_col: Column, planes: np.ndarray) -> Column:
    """Bucket id = sign-bit integer of the hyperplane projections —
    pure column expression (no UDF): bit p set iff dot(v, plane_p) > 0."""
    bits = []
    for p, plane in enumerate(planes):
        bits.append(
            F.when(_dot_lit(vec_col, list(plane)) > 0,
                   F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def with_lsh_buckets(
    emb: DataFrame, n_planes: int = 6, seed: int = 42,
    vec_col: str = "embedding", dim: int | None = None,
) -> tuple[DataFrame, np.ndarray]:
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    planes = hyperplanes(dim, n_planes, seed)
    return emb.withColumn("lsh_bucket", lsh_bucket_col(F.col(vec_col), planes)), planes


def cosine_topk_lsh(
    emb_bucketed: DataFrame, planes: np.ndarray, qvec: list[float],
    k: int = 10, n_probe_bits: int = 1,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: probe the query's bucket plus all buckets within
    ``n_probe_bits`` hamming distance (multi-probe LSH), exact cosine
    within the probed candidates.  The bucket filter prunes the scan."""
    q = np.asarray(qvec, dtype=np.float64)
    qbucket = 0
    for p, plane in enumerate(planes):
        if float(np.dot(plane, q)) > 0:
            qbucket |= 1 << p
    probes = {qbucket}
    if n_probe_bits >= 1:
        for p in range(len(planes)):
            probes.add(qbucket ^ (1 << p))
    if n_probe_bits >= 2:
        for p1 in range(len(planes)):
            for p2 in range(p1 + 1, len(planes)):
                probes.add(qbucket ^ (1 << p1) ^ (1 << p2))
    cand = emb_bucketed.filter(F.col("lsh_bucket").isin([int(x) for x in probes]))
    return cosine_topk_bruteforce(cand, qvec, k, id_col, vec_col)


def _chunked_argmin(
    X: np.ndarray, cents: np.ndarray, chunk_bytes: int = 256 << 20
) -> np.ndarray:
    """Nearest-centroid assignment via the expanded form
    ``d2 = |x|^2 - 2 x.c + |c|^2`` over row chunks.

    The naive broadcast ``((X[:,None,:]-C[None,:,:])**2).sum(2)``
    materialises an (n, k, d) transient — hundreds of GB at the 1M-row
    fit cap with 768-dim vectors and realistic cell counts.  This form
    peaks at one (chunk, k) distance block instead: the chunk size is
    derived so that block stays under ``chunk_bytes`` (default 256 MB)
    for ANY k, so the fit is cap-safe at every (dims, n_cells) a caller
    can reach.  The ``|x|^2`` term is constant per row, so dropping it
    would not change the argmin — it is kept (cheap, (chunk,1)) so the
    returned distances-free argmin matches the geometric definition
    under the same tie-break (first/lowest index, as np.argmin)."""
    k = max(len(cents), 1)
    chunk = max(256, int(chunk_bytes // (8 * k)))
    c_norm2 = (cents * cents).sum(axis=1)
    out = np.empty(len(X), dtype=np.int64)
    for s in range(0, len(X), chunk):
        xc = X[s : s + chunk]
        d2 = xc @ (-2.0 * cents.T)
        d2 += c_norm2[None, :]
        d2 += (xc * xc).sum(axis=1)[:, None]
        out[s : s + chunk] = d2.argmin(axis=1)
    return out


def _lloyd_fit(
    X: np.ndarray, n_cells: int, iters: int, seed: int
) -> np.ndarray:
    """Seeded Lloyd iterations, cap-safe at the 1M-row fit ceiling.

    Assignment goes through :func:`_chunked_argmin` (bounded transient)
    and the centroid update is a single stable sort + segmented
    ``np.add.reduceat`` — O(n log n + n d) total, no per-cell boolean
    mask sweep (which is O(k n) and dominates at thousands of cells).
    Empty cells keep their previous centroid.  Deterministic for a
    given (X, seed): RandomState init + stable sort."""
    rng = np.random.RandomState(seed)
    cents = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        assign = _chunked_argmin(X, cents)
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        starts = np.r_[0, np.flatnonzero(np.diff(sorted_assign)) + 1]
        sums = np.add.reduceat(X[order], starts, axis=0)
        counts = np.bincount(assign, minlength=len(cents))
        for i, c in enumerate(sorted_assign[starts]):
            cents[c] = sums[i] / counts[c]
    return cents


def ivf_centroids(
    emb: DataFrame, n_cells: int = 16, iters: int = 3, seed: int = 42,
    vec_col: str = "embedding", sample_fraction: float | None = None,
    max_fit_rows: int = 1_000_000,
) -> np.ndarray:
    """Seeded Lloyd iterations on a bounded driver-side sample.

    Centroid learning is a bounded-size model fit; assignment stays
    distributed.  The driver-side collect is capped UNCONDITIONALLY at
    ``max_fit_rows`` (a 10^12-row table fits on ~1M sampled vectors) —
    callers no longer have to remember to pass ``sample_fraction`` for
    the fit to be scale-safe; passing it still pre-thins the sample."""
    df = emb.select(vec_col)
    if sample_fraction:
        df = df.sample(fraction=sample_fraction, seed=seed)
    # cheap cap probe: count a LIMITed plan (short-circuits after
    # cap+1 rows, ships no vectors) to learn which side of the cap the
    # table is on, then collect exactly once — never shipping vectors
    # that get discarded
    over_cap = (
        df.limit(max_fit_rows + 1).selectExpr("1 as one").count()
        > max_fit_rows
    )
    if over_cap:
        n = df.count()
        # slight over-sample, then hard-cap: sample() is Bernoulli and
        # only approximately hits the fraction
        rows = df.sample(
            fraction=min(1.0, 1.05 * max_fit_rows / n), seed=seed
        ).limit(max_fit_rows).collect()
    else:
        rows = df.collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    return _lloyd_fit(X, n_cells, iters, seed)


# Above this cell count the literal-expression assignment would inline
# n_cells * dim array literals into ONE Catalyst expression — plan-size
# explosion at the thousands of cells real IVF needs.  The pandas path
# ships the centroid matrix once per executor as a broadcast instead.
IVF_LITERAL_MAX_CELLS = 32


def with_ivf_cells(
    emb: DataFrame, cents: np.ndarray, vec_col: str = "embedding",
    method: str = "auto",
) -> DataFrame:
    """Assign each vector to its nearest centroid.

    ``method='literal'``: pure column expression argmin over squared
    distance — centroids become constant-folded array literals.  Great
    plan (whole-stage codegen, no Python) but the expression grows with
    n_cells * dim, so it is only safe for small centroid sets.

    ``method='pandas'``: Arrow-batched scalar pandas UDF over a
    BROADCAST centroid matrix — the plan carries one UDF node no matter
    how many cells; the executor-side math is the same chunked
    |x|^2 - 2x.c + |c|^2 argmin as the fit.  This is the 100 TB path
    for realistic IVF (thousands of cells, 768-dim).

    ``method='auto'`` (default): literal up to
    ``IVF_LITERAL_MAX_CELLS``, pandas beyond.  Both paths break argmin
    ties toward the lowest cell index; parity is property-tested."""
    if method == "auto":
        method = "literal" if len(cents) <= IVF_LITERAL_MAX_CELLS else "pandas"
    if method == "pandas":
        bc = emb.sparkSession.sparkContext.broadcast(
            np.asarray(cents, dtype=np.float64)
        )

        @F.pandas_udf("int")
        def assign_cell(v: pd.Series) -> pd.Series:
            if len(v) == 0:
                return pd.Series([], dtype="int32")
            X = np.array(v.tolist(), dtype=np.float64)
            return pd.Series(
                _chunked_argmin(X, bc.value).astype(np.int32)
            )

        return emb.withColumn("ivf_cell", assign_cell(F.col(vec_col)))
    dists = []
    for c, cent in enumerate(cents):
        d2 = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                F.array(*[F.lit(float(x)) for x in cent]),
                lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        dists.append(F.struct(d2.alias("d2"), F.lit(c).alias("cell")))
    best = F.aggregate(
        F.array(*dists),
        F.struct(F.lit(float("inf")).alias("d2"), F.lit(-1).alias("cell")),
        lambda acc, x: F.when(x["d2"] < acc["d2"], x).otherwise(acc),
    )
    return emb.withColumn("ivf_cell", best["cell"])


def cosine_topk_ivf(
    emb_celled: DataFrame, cents: np.ndarray, qvec: list[float],
    k: int = 10, n_probe: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    q = np.asarray(qvec, dtype=np.float64)
    d2 = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d2)[:n_probe]]
    cand = emb_celled.filter(F.col("ivf_cell").isin(probe))
    return cosine_topk_bruteforce(cand, qvec, k, id_col, vec_col)


def cosine_pair_col(a_vec: Column, b_vec: Column) -> Column:
    """cosine(a, b) as a pure column expression (double fold)."""
    dot = F.aggregate(
        F.zip_with(a_vec, b_vec, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return dot / (_norm(a_vec) * _norm(b_vec))


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — the dedup-family member
    for embedded content: ``n_tables`` independent random-hyperplane
    LSH tables block candidates (a pair is a candidate when it shares a
    bucket in ANY table), exact cosine verifies them, pairs with
    cosine >= threshold survive.  Output: (a_<id>, b_<id>, cosine) with
    a < b.

    Recall math (sign LSH): a pair at cosine c agrees on one plane with
    prob p = 1 - arccos(c)/pi; per-table collision p^n_planes; overall
    recall 1 - (1 - p^n_planes)^n_tables.  At the near-dup regime
    (c >= 0.95 → p ≈ 0.90) the defaults give ~0.94 recall; below ~0.8
    cosine sign-LSH blocks poorly by design — that regime is similarity
    SEARCH (cosine_topk_*), not dedup.  n_planes=0 degenerates to the
    exact brute-force all-pairs scan (single bucket) used as the test
    oracle.  Bucket sizes — and the per-bucket quadratic join — are
    controlled by n_planes; AQE's skew join handles residual imbalance.
    """
    if n_planes <= 0:
        bucketed = emb.withColumn(
            "probe", F.lit(0).cast("long")
        )
    else:
        dim = len(emb.select(vec_col).first()[0])
        probes = []
        for t in range(n_tables):
            planes = hyperplanes(dim, n_planes, seed + t)
            # bucket id namespaced by table: (table << n_planes) | bits
            probes.append(
                lsh_bucket_col(F.col(vec_col), planes)
                + F.lit(t << n_planes).cast("long")
            )
        bucketed = emb.withColumn("probe", F.explode(F.array(*probes)))
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    pairs = (
        a.join(
            b,
            on=[
                F.col("a.probe") == F.col("b.probe"),
                F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
            ],
        )
        .select(
            F.col(f"a.{id_col}").alias(f"a_{id_col}"),
            F.col(f"b.{id_col}").alias(f"b_{id_col}"),
            cosine_pair_col(
                F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}")
            ).alias("cosine"),
        )
        .distinct()
    )
    return pairs.filter(F.col("cosine") >= threshold)


def write_ivf_partitioned(
    emb_celled: DataFrame, path: str, mode: str = "overwrite"
) -> None:
    """Persist the embedding table PHYSICALLY partitioned by IVF cell
    (``partitionBy('ivf_cell')``): a query's ``ivf_cell IN (probes)``
    filter then becomes directory-level PARTITION PRUNING — at 10^12
    rows the scan touches only the probed cells' files instead of
    filtering after reading everything.  This is the ANN analog of the
    packed index's term-hash layout (format-level skipping instead of
    a hand-rolled secondary index)."""
    emb_celled.write.mode(mode).partitionBy("ivf_cell").parquet(path)


def read_ivf_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# ---------------------------------------------------------------------------
# Product quantization (Jégou, Douze, Schmid 2011) — the memory-bounded
# ANN path: a D-dim float vector compresses to M small codes (D·4 bytes
# → M bytes at 256 centroids/subspace), and query-time distance becomes
# M table lookups per vector (ADC, asymmetric distance computation).
# At 10^12 vectors the raw embeddings cannot live hot; the PQ code
# table is ~100× smaller and scans at memory bandwidth.
# ---------------------------------------------------------------------------


def pq_fit(
    emb: DataFrame,
    m: int = 8,
    k_cents: int = 256,
    iters: int = 3,
    seed: int = 42,
    vec_col: str = "embedding",
    max_fit_rows: int = 1_000_000,
) -> np.ndarray:
    """Train PQ codebooks: split the vector into ``m`` equal subspaces
    and run the capped Lloyd fit (ivf_centroids' bounded-sample
    discipline) independently per subspace → (m, k_cents, d/m) float64.

    Requires dim % m == 0 (the standard PQ layout).  The fit sample is
    collected ONCE and sliced per subspace — one driver-side array of
    ≤ max_fit_rows × dim, the same cap class as the IVF fit."""
    first = emb.select(vec_col).first()
    if first is None:
        raise ValueError("cannot fit PQ on an empty table")
    dim = len(first[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    over_cap = (
        emb.select(vec_col).limit(max_fit_rows + 1)
        .selectExpr("1 as one").count() > max_fit_rows
    )
    df = emb.select(vec_col)
    if over_cap:
        n = df.count()
        rows = df.sample(
            fraction=min(1.0, 1.05 * max_fit_rows / n), seed=seed
        ).limit(max_fit_rows).collect()
    else:
        rows = df.collect()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    dsub = dim // m
    return np.stack([
        _lloyd_fit(X[:, i * dsub:(i + 1) * dsub], k_cents, iters, seed + i)
        for i in range(m)
    ])


def pq_encode(
    emb: DataFrame,
    codebooks: np.ndarray,
    vec_col: str = "embedding",
) -> DataFrame:
    """Append ``pq_codes`` (array<int>, one nearest-centroid id per
    subspace) — the compressed representation; every other column
    passes through.  Assignment is an Arrow-batched pandas UDF over a
    BROADCAST codebook matrix (the IVF pandas-dispatch note: literal
    centroid expressions explode the plan at realistic sizes), each
    batch going through the cap-safe chunked argmin."""
    from pyspark.sql import SparkSession

    m, k_cents, dsub = codebooks.shape
    sc = SparkSession.getActiveSession().sparkContext
    bc = sc.broadcast(codebooks)

    @F.pandas_udf("array<int>")
    def _encode(vecs: pd.Series) -> pd.Series:
        if len(vecs) == 0:  # empty Arrow batch: [] is 1-D, can't slice
            return pd.Series([], dtype=object)
        cb = bc.value
        X = np.array(vecs.tolist(), dtype=np.float64)
        codes = np.empty((len(X), len(cb)), dtype=np.int64)
        for i in range(len(cb)):
            sub = X[:, i * dsub:(i + 1) * dsub]
            codes[:, i] = _chunked_argmin(sub, cb[i])
        return pd.Series(list(codes))

    return emb.withColumn("pq_codes", _encode(F.col(vec_col)))


def pq_topk_adc(
    coded: DataFrame,
    codebooks: np.ndarray,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k by ADC: the query builds one (m, k_cents)
    lookup table of squared subdistances, and each row's distance is
    the sum of m table lookups over its codes — no float vectors are
    read at all.  → (id, approx_d2) ascending, TakeOrderedAndProject.

    Approximate BY DESIGN (quantization error; recall is
    pytest-bounded); compose with :func:`pq_topk_rerank` for the
    exact-on-shortlist contract."""
    from pyspark.sql import SparkSession

    m, k_cents, dsub = codebooks.shape
    q = np.asarray(qvec, dtype=np.float64)
    if len(q) != m * dsub:
        raise ValueError(f"query dim {len(q)} != {m * dsub}")
    lut = np.stack([
        ((codebooks[i] - q[i * dsub:(i + 1) * dsub][None, :]) ** 2)
        .sum(axis=1)
        for i in range(m)
    ])
    sc = SparkSession.getActiveSession().sparkContext
    bc = sc.broadcast(lut)

    @F.pandas_udf("double")
    def _adc(codes: pd.Series) -> pd.Series:
        if len(codes) == 0:  # empty Arrow batch: [] is 1-D, can't .T
            return pd.Series([], dtype=float)
        t = bc.value
        C = np.array(codes.tolist(), dtype=np.int64)
        d = np.take_along_axis(
            t, C.T, axis=1
        ).sum(axis=0)
        return pd.Series(d)

    return (
        coded.select(F.col(id_col), _adc(F.col("pq_codes")).alias("approx_d2"))
        .orderBy(F.asc("approx_d2"), F.asc(id_col))
        .limit(k)
    )


def pq_topk_rerank(
    coded: DataFrame,
    codebooks: np.ndarray,
    qvec: list[float],
    k: int = 10,
    n_candidates: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectors: DataFrame | None = None,
) -> DataFrame:
    """Two-phase PQ search: ADC shortlist of ``n_candidates``, then
    EXACT cosine re-rank of the shortlist's true vectors → (id,
    cosine) — the standard IVFADC+rerank serving shape.  With
    n_candidates ≥ |table| the shortlist is everything and the result
    is EXACTLY brute force (the gate's configuration, the IVF
    n_probe=all convention).  The rerank join is a broadcast of ≤
    n_candidates ids against the vector table.

    ``vectors``: at scale the code table is stored WITHOUT the float
    vectors (that compression is the point of PQ) — pass the separate
    vector table here and only the shortlist's rows of it are ever
    read (id-pushdown scan); default None reads ``vec_col`` from
    ``coded`` itself (the small-data convenience)."""
    short = pq_topk_adc(coded, codebooks, qvec, k=n_candidates,
                        id_col=id_col)
    source = coded if vectors is None else vectors
    cand = source.join(
        F.broadcast(short.select(id_col)), id_col
    )
    return cosine_topk_bruteforce(cand, qvec, k, id_col, vec_col)


def ivfadc_topk(
    coded_celled: DataFrame,
    cents: np.ndarray,
    codebooks: np.ndarray,
    qvec: list[float],
    k: int = 10,
    n_probe: int = 4,
    n_candidates: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectors: DataFrame | None = None,
) -> DataFrame:
    """IVFADC (Jégou et al. 2011, the canonical composition): coarse
    IVF cells prune the scan to ``n_probe`` partitions, PQ codes rank
    the survivors by ADC lookup tables, and the ≤ ``n_candidates``
    shortlist re-ranks with exact cosine → (id, cosine).

    ``coded_celled`` carries BOTH ``ivf_cell`` (with_ivf_cells) and
    ``pq_codes`` (pq_encode); with the IVF-partitioned layout
    (write_ivf_partitioned) the cell filter is directory-level
    partition pruning, so a probe touches n_probe/n_cells of the code
    table — and the code table is already ~32× smaller than the
    vectors.  With n_probe = n_cells and n_candidates ≥ |table| this
    must equal brute force exactly (the gate's configuration); both
    knobs trade recall for cost independently (pytest-bounded)."""
    q = np.asarray(qvec, dtype=np.float64)
    d2 = ((cents - q[None, :]) ** 2).sum(axis=1)
    probe = [int(c) for c in np.argsort(d2)[:n_probe]]
    cand = coded_celled.filter(F.col("ivf_cell").isin(probe))
    return pq_topk_rerank(
        cand, codebooks, qvec, k=k, n_candidates=n_candidates,
        id_col=id_col, vec_col=vec_col, vectors=vectors,
    )


def semdedup(
    emb: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str | None = None,
    iters: int = 3,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic deduplication by
    clustering embeddings and dropping near-identical members WITHIN
    each cluster — the embedding-space analog of the lexical near-dup
    family, catching paraphrases MinHash can't.

    1. cluster: k-means cells (ivf_centroids — capped driver fit), or
       any caller-provided ``cell_col`` (the gate uses a deterministic
       one so DuckDB can replay the pair logic);
    2. pair: within-cell self-join on (a.id < b.id) with exact cosine
       >= threshold — the join is CELL-BOUNDED: cost Σ|cell|², with
       n_cells the knob that keeps cells shuffle-partition-sized at
       scale (the paper's own trick; cross-cell near-dups are the
       documented recall loss);
    3. keep: min-id member of each near-dup pair survives — the same
       deterministic keeper rule as simhash_dedup/exact_dedup.

    Returns the surviving rows of ``emb`` (original columns).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    out_cols = emb.columns
    if cell_col is None:
        cents = ivf_centroids(
            emb, n_cells=n_cells, iters=iters, seed=seed, vec_col=vec_col
        )
        celled = with_ivf_cells(emb, cents, vec_col=vec_col)
        cell_col = "ivf_cell"
    else:
        celled = emb
    a = celled.select(
        F.col(cell_col).alias("_cell"),
        F.col(id_col).alias("_ida"),
        F.col(vec_col).alias("_va"),
    )
    b = celled.select(
        F.col(cell_col).alias("_cell"),
        F.col(id_col).alias("_idb"),
        F.col(vec_col).alias("_vb"),
    )
    # element-wise double casts (the module's cross-engine convention:
    # float32 values are exact in double, so this matches the oracle's
    # DOUBLE[] math bit-for-bit)
    dot = F.aggregate(
        F.zip_with(
            "_va", "_vb", lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    cos = dot / (_norm(F.col("_va")) * _norm(F.col("_vb")))
    losers = (
        a.join(b, "_cell")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(F.round(cos, 9) >= threshold)
        .select(F.col("_idb").alias(id_col))
        .distinct()
    )
    return emb.join(losers, id_col, "left_anti").select(*out_cols)


# Scalar int8 quantization — the hot-tier compression between raw
# floats (4 bytes/dim) and PQ codes (sub-byte/dim): 1 byte/dim plus
# one scale per vector, ~4× smaller scans with far less distortion
# than PQ.  The per-vector symmetric scheme (scale = max|x|/127,
# code = round(x/scale)) is the standard used by Lucene/Elasticsearch
# int8_hnsw and faiss SQ8 — public designs.  Everything here is pure
# Catalyst (transform/aggregate over array columns): no UDF, stays in
# whole-stage codegen, and the quantized scan reads 1/4 the bytes of
# the float tier — at 10^12 vectors that is the difference between a
# memory-bandwidth-bound shortlist pass and a disk-bound one.
# ---------------------------------------------------------------------------


def quantize_int8(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append ``q_scale`` (double) and ``q_codes`` (array<tinyint>):
    per-vector symmetric int8 quantization.  A zero vector gets
    scale 0 and all-zero codes (dequantizes exactly back to zero).
    Dequantization is ``code * q_scale`` per element."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.when(maxabs > 0, maxabs / F.lit(127.0)).otherwise(F.lit(0.0))
    emb = emb.withColumn("q_scale", scale)
    codes = F.transform(
        v,
        lambda x: F.when(
            F.col("q_scale") > 0, F.round(x / F.col("q_scale"), 0)
        ).otherwise(F.lit(0.0)).cast("tinyint"),
    )
    return emb.withColumn("q_codes", codes)


def _int8_query(qvec: list[float]) -> tuple[float, list[int]]:
    q = np.asarray(qvec, dtype=np.float64)
    mx = float(np.max(np.abs(q))) if len(q) else 0.0
    if mx <= 0:
        return 0.0, [0] * len(q)
    scale = mx / 127.0
    return scale, [int(x) for x in np.round(q / scale)]


def cosine_topk_int8(
    coded: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate cosine top-k reading ONLY the int8 tier (codes +
    scale; the float column is never touched): both sides dequantize
    implicitly through their scales, which cancel in cosine except for
    rounding error.  → (id, approx_cosine) desc, TakeOrderedAndProject.

    Approximate BY DESIGN (≤ ~0.4% per-element distortion at int8);
    recall is pytest-bounded and :func:`cosine_topk_int8_rerank` gives
    the exact-on-shortlist contract."""
    q_scale, q_codes = _int8_query(qvec)
    qc = F.array(*[F.lit(int(c)) for c in q_codes])
    # integer dot of the code arrays; scales & norms restore cosine
    dot = F.aggregate(
        F.zip_with(
            F.col("q_codes"), qc,
            lambda a, b: a.cast("double") * b.cast("double"),
        ),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    d_norm = F.sqrt(
        F.aggregate(
            F.col("q_codes"), F.lit(0.0),
            lambda acc, x: acc + x.cast("double") * x.cast("double"),
        )
    )
    q_norm = float(np.sqrt(sum(c * c for c in q_codes))) or 1.0
    cos = F.when(
        d_norm > 0, dot / (d_norm * F.lit(q_norm))
    ).otherwise(F.lit(0.0))
    return (
        coded.select(F.col(id_col), cos.alias("approx_cosine"))
        .orderBy(F.desc("approx_cosine"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_int8_rerank(
    coded: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_candidates: int = 100,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Two-tier search: int8 shortlist of ``n_candidates`` (reads only
    codes), then exact float cosine on the shortlist — the same
    shortlist-then-rerank contract as :func:`pq_topk_rerank`.  With
    ``n_candidates`` ≥ |table| the result equals
    :func:`cosine_topk_bruteforce` bit-for-bit (the rerank IS the
    brute force then).  The candidate join is broadcast: n_candidates
    rows against the full table.  Keep ``n_candidates`` proportionate
    — the shortlist is a TakeOrderedAndProject whose bounded queue is
    sized by it (an absurd value like 10^9 allocates that queue; if
    you want the whole table, call cosine_topk_bruteforce)."""
    from pyspark.sql.functions import broadcast

    short = cosine_topk_int8(
        coded, qvec, k=n_candidates, id_col=id_col
    ).select(id_col)
    cand = coded.join(broadcast(short), id_col)
    return cosine_topk_bruteforce(cand, qvec, k, id_col=id_col, vec_col=vec_col)


# Binary (1-bit) quantization — the 32× compression rung below int8:
# one sign bit per dimension packed into 32-bit words, distance =
# popcount(xor).  The public design behind Elasticsearch's BBQ /
# faiss binary indexes: for mean-centered data sign agreement tracks
# angle (the same Goemans-Williamson fact the sign-LSH bucketer above
# uses), so hamming ASC orders like cosine DESC, well enough for a
# shortlist that an exact rerank then fixes.  Pure Catalyst: packing
# is a per-word sum of shifted sign bits, distance is
# bit_count(xor) — both whole-stage-codegen'd, no UDF.
# ---------------------------------------------------------------------------


def _bin_words(dim: int) -> int:
    return (dim + 31) // 32


def quantize_binary(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Append ``b_codes`` (array<int> of 32-bit words, little-endian
    bit order: bit j of word w is sign(x[32w+j]) > 0).  Dim is read
    from the first row (static packing layout, like pq_fit)."""
    first = emb.select(vec_col).first()
    if first is None:
        return emb.withColumn(
            "b_codes", F.array().cast("array<bigint>")
        )
    dim = len(first[0])
    v = F.col(vec_col)
    words = []
    for w in range(_bin_words(dim)):
        bits = [
            F.when(
                F.element_at(v, 32 * w + j + 1).cast("double") > 0,
                F.lit(1 << j),
            ).otherwise(F.lit(0))
            for j in range(min(32, dim - 32 * w))
        ]
        acc = bits[0]
        for b in bits[1:]:
            acc = acc + b
        # bigint words: bit 31 (value 2^31) overflows a signed int
        words.append(acc.cast("long"))
    return emb.withColumn("b_codes", F.array(*words))


def _query_bin_words(qvec: list[float]) -> list[int]:
    words = []
    for w in range(_bin_words(len(qvec))):
        word = 0
        for j in range(min(32, len(qvec) - 32 * w)):
            if qvec[32 * w + j] > 0:
                word |= 1 << j
        words.append(word)
    return words


def hamming_topk_binary(
    coded: DataFrame,
    qvec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate neighbor shortlist from the binary tier alone:
    → (id, hamming) ASC (sign-agreement distance; smaller ≈ closer in
    angle).  Reads 1 bit/dim — at 10^12 vectors this tier fits where
    nothing else does.  Approximate BY DESIGN; compose with
    :func:`cosine_topk_binary_rerank` for exactness on a shortlist."""
    qwords = _query_bin_words(qvec)
    qc = F.array(*[F.lit(int(w)) for w in qwords])
    ham = F.aggregate(
        F.zip_with(
            F.col("b_codes"), qc,
            lambda a, b: F.bit_count(a.bitwiseXOR(b)),
        ),
        F.lit(0), lambda acc, x: acc + x,
    )
    return (
        coded.select(F.col(id_col), ham.alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(k)
    )


def cosine_topk_binary_rerank(
    coded: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_candidates: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary shortlist → exact float cosine rerank (the
    pq_topk_rerank / cosine_topk_int8_rerank contract at 1 bit/dim):
    with ``n_candidates`` ≥ |table| the result equals
    :func:`cosine_topk_bruteforce` bit-for-bit."""
    from pyspark.sql.functions import broadcast

    short = hamming_topk_binary(
        coded, qvec, k=n_candidates, id_col=id_col
    ).select(id_col)
    cand = coded.join(broadcast(short), id_col)
    return cosine_topk_bruteforce(cand, qvec, k, id_col=id_col, vec_col=vec_col)
