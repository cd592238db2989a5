"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exact baseline: a broadcast of the query
vector + one narrow pass computing dot/norm via higher-order functions
(``zip_with`` + ``aggregate`` — JVM-side, no Python). The IVF variant is
the scale path: partition the corpus into coarse cells, probe only the
nearest cells — at 100 TB this turns a full scan into a pruned scan of
nprobe/ncells of the data (pair it with cell-partitioned parquet so pruning
happens at the file level).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.exact import dmean


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as a strict left-to-right fold (deterministic fp order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _np_round_half_up(x, decimals: int):
    """HALF_UP (half away from zero) rounding for the numpy kernels —
    the semantics of Spark's F.round and DuckDB's round(), which the
    expression kernels and shared oracles use. np.round is half-EVEN, so
    on an exact .5·10^-d grid hit (integer-valued embeddings make these
    reachable) a kernel-rounded score could flip a threshold comparison
    relative to the oracle (r10 ADVICE). Exactness note: for |x| ≤ 2 and
    d ≤ 9, x·10^d is exact enough that the +0.5/floor trip reproduces
    decimal HALF_UP on every representable grid hit."""
    import numpy as np

    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def cosine_scores_arrow(df: DataFrame, query_vec: Sequence[float],
                        vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Arrow-vectorized cosine scores: a scalar pandas_udf stacks each batch
    into an (n, d) float64 matrix and does one BLAS matvec — the scale path
    for brute-force scoring (~10-100× over per-element expression folds).

    Products are computed in float64 exactly like the expression form; only
    summation order differs (ulp-level), which the 6-decimal rounding of
    the public queries absorbs.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    q = np.asarray(list(query_vec), dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    def _score(vecs):
        m = np.vstack(vecs.to_numpy()).astype(np.float64, copy=False)
        dots = m @ q
        norms = np.sqrt((m * m).sum(axis=1))
        return pd.Series(dots / (norms * qn))

    # explicit returnType form: string annotations from `__future__` aren't
    # resolvable by pandas_udf's typehint inspection
    score = pandas_udf(_score, "double")

    return df.select(id_col, score(F.col(vec_col)).alias("cosine_sim"))


def cosine_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id",
                arrow: bool = True) -> DataFrame:
    """Exact brute-force cosine top-k against a broadcast query vector.

    One narrow scoring pass (Arrow-vectorized by default, pure-expression
    fold with ``arrow=False``) + a global top-k (TakeOrderedAndProject —
    no full sort). Tie-break pinned on id.
    """
    if arrow:
        scored = cosine_scores_arrow(df, query_vec, vec_col, id_col)
        scored = scored.select(id_col, F.round("cosine_sim", 6).alias("cosine_sim"))
    else:
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        scored = df.select(
            id_col,
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
    return scored.orderBy(F.desc("cosine_sim"), F.asc(id_col)).limit(k)


def cosine_topk_by_id(df: DataFrame, query_id: int, k: int = 10,
                      vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Top-k with the query looked up from the corpus itself (excluded from
    results). Lookup is a driver-side 1-row collect — O(1) at any scale."""
    row = df.filter(F.col(id_col) == query_id).select(vec_col).first()
    if row is None:
        raise KeyError(f"{id_col}={query_id} not found")
    qv = [float(x) for x in row[0]]
    return cosine_topk(df.filter(F.col(id_col) != query_id), qv, k, vec_col, id_col)


def centroids_by_label(df: DataFrame, vec_col: str = "embedding",
                       label_col: str = "label") -> DataFrame:
    """Element-wise mean vector per label: posexplode → groupBy(label, pos)
    → avg → re-assemble with array_agg sorted by position.

    This is the IVF coarse-quantizer build step (here labels play the role
    of k-means cells; swap in Spark ML KMeans for unlabeled corpora).
    """
    pe = df.select(label_col, F.posexplode(vec_col).alias("pos", "v"))
    # decimal-exact mean: the centroid feeds distance rankings downstream,
    # so a fold-order ulp would make probe/top-k selection nondeterministic
    means = pe.groupBy(label_col, "pos").agg(dmean(F.col("v").cast("double")).alias("m"))
    return means.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("centroid")
    )


def ivf_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10, nprobe: int = 1,
             vec_col: str = "embedding", id_col: str = "vec_id",
             label_col: str = "label") -> DataFrame:
    """IVF-style ANN: probe the nprobe nearest cells, brute-force inside.

    The cell assignment filter prunes the scan (with cell-partitioned
    storage it prunes at file level); accuracy/cost trades via nprobe.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cents = centroids_by_label(df, vec_col, label_col)
    probed = [
        r[0]
        for r in cents.select(label_col, cosine(F.col("centroid"), q).alias("s"))
        .orderBy(F.desc("s"), F.asc(label_col))
        .limit(nprobe)
        .collect()
    ]
    return cosine_topk(df.filter(F.col(label_col).isin(probed)), query_vec, k, vec_col, id_col)


def ivf_filtered_topk(df: DataFrame, query_vec: Sequence[float], pred: Column,
                      k: int = 10, oversample: int = 2,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      label_col: str = "label") -> DataFrame:
    """Filtered vector search over the IVF index — the production ANN
    case a plain nprobe constant gets wrong: a metadata predicate shrinks
    every cell, so a FIXED probe count silently under-fills k. Adaptive
    probing instead: rank cells by centroid similarity, pre-count the
    PREDICATE-MATCHING rows per cell (one tiny agg — this is the
    "filtered IVF" cardinality trick), and scan the minimal prefix of
    ranked cells whose matching count reaches k·oversample (all cells if
    the predicate is rarer than that).

    Index stays predicate-agnostic (centroids over ALL vectors — built
    once, filtered at query time). Driver state is O(ncells): the ranked
    cell list and the per-cell counts; the corpus scan is pruned to the
    chosen cells AND the predicate (both reach the parquet scan).
    Returns (vec_id, cosine_sim, n_probed).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cents = centroids_by_label(df, vec_col, label_col)
    ranked = [
        r[0]
        for r in cents.select(label_col, cosine(F.col("centroid"), q).alias("s"))
        .orderBy(F.desc("s"), F.asc(label_col))
        .collect()
    ]
    counts = {
        r[0]: r[1]
        for r in df.filter(pred).groupBy(label_col).agg(F.count(F.lit(1))).collect()
    }
    need = k * oversample
    probed, have = [], 0
    for cell in ranked:
        probed.append(cell)
        have += counts.get(cell, 0)
        if have >= need:
            break
    out = cosine_topk(
        df.filter(pred & F.col(label_col).isin(probed)), query_vec, k, vec_col, id_col
    )
    return out.select("*", F.lit(len(probed)).alias("n_probed"))


def pca_top_component(df: DataFrame, vec_col: str = "embedding",
                      n_iter: int = 2, round_to: int = 6) -> DataFrame:
    """Top principal component by distributed power iteration — PCA
    without ever materializing the covariance matrix: each iteration
    computes y = E[x·(xᵀv)] − μ·(μᵀv) (= Cv) with one per-row dot fold
    plus one (pos)-keyed mean, i.e. O(n·dim) work and O(dim) driver
    state — the same footprint class as kmeans' centroid loop.

    Determinism pins (oracle replays the recurrence as unrolled CTEs):
    - μ is the per-dim DECIMAL-exact mean rounded to 6;
    - v₀ = e₁ (unit first coordinate);
    - each iteration's y_j = round(exact-mean of x_j·s, 9) − μ_j·(μᵀv),
      with μᵀv a Python left-fold over pos order (SQL: list fold in the
      same order);
    - v_{t+1} = round(y/‖y‖, 6) — the norm is an arbitrary double, so
      the rounding is never grid-aligned (no cross-engine .5 ties).

    Returns (pos, component, eigenvalue) — eigenvalue is the Rayleigh
    estimate ‖y‖ from the final iteration, rounded to 6."""
    pe = df.select(F.posexplode(vec_col).alias("pos", "x"))
    mu_rows = (
        pe.groupBy("pos")
        .agg(F.round(dmean(F.col("x").cast("double")), round_to).alias("m"))
        .orderBy("pos")
        .collect()
    )
    mu = [float(r.m) for r in mu_rows]
    dim = len(mu)
    v = [1.0] + [0.0] * (dim - 1)
    eig = 0.0
    for _ in range(n_iter):
        varr = F.array(*[F.lit(x) for x in v])
        s = dot(F.col(vec_col), varr)
        y_rows = (
            df.select(s.alias("s"), F.posexplode(vec_col).alias("pos", "x"))
            .groupBy("pos")
            .agg(F.round(dmean(F.col("x").cast("double") * F.col("s")), 9).alias("y"))
            .orderBy("pos")
            .collect()
        )
        mudotv = sum(m * w for m, w in zip(mu, v))  # pos-order left fold
        y = [float(r.y) - m * mudotv for r, m in zip(y_rows, mu)]
        norm_y = sum(t * t for t in y) ** 0.5
        v = [round(t / norm_y, round_to) for t in y]
        eig = round(norm_y, round_to)
    spark = df.sparkSession
    return spark.createDataFrame(
        [(i, v[i], eig) for i in range(dim)],
        "pos int, component double, eigenvalue double",
    )


def matryoshka_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                    prefix_dim: int = 16, shortlist_factor: int = 4,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Truncated-dimension ANN for Matryoshka-style embeddings (MRL,
    Kusupati et al., arXiv:2205.13147): shortlist by cosine over the FIRST
    ``prefix_dim`` coordinates (MRL trains nested prefixes to be usable
    embeddings), then re-rank the ``k·shortlist_factor`` shortlist with
    full-dimension cosine.

    The scale shape: the corpus scan touches only the prefix slice (with
    column-chunked storage, a fraction of the bytes), and the full vectors
    are read for the O(k·factor) shortlist alone. Ties pinned on id at
    both stages; both scores rounded to 6 so the oracle can replay the
    exact shortlist and final selection.
    """
    qpre = F.array(*[F.lit(float(x)) for x in query_vec[:prefix_dim]])
    qfull = F.array(*[F.lit(float(x)) for x in query_vec])
    pre = F.slice(F.col(vec_col), 1, prefix_dim)
    short = (
        df.select(
            id_col, vec_col,
            F.round(cosine(pre, qpre), 6).alias("prefix_sim"),
        )
        .orderBy(F.desc("prefix_sim"), F.asc(id_col))
        .limit(k * shortlist_factor)
    )
    return (
        short.select(
            id_col,
            "prefix_sim",
            F.round(cosine(F.col(vec_col), qfull), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )


def mmr_rerank(df: DataFrame, query_id: int, k: int = 8, shortlist: int = 25,
               lam: float = 0.7, vec_col: str = "embedding",
               id_col: str = "vec_id") -> DataFrame:
    """Maximal-marginal-relevance rerank (Carbonell & Goldstein, SIGIR
    1998): greedily pick k results trading query relevance against
    redundancy with the already-picked set —
    mmr(d) = λ·sim(q,d) − (1−λ)·max_{s∈S} sim(d,s).

    Scale posture: MMR is inherently sequential, so — exactly as every
    production retrieval service does — it runs on a SHORTLIST. The only
    distributed work is the corpus-wide cosine top-``shortlist`` scan
    (one pass + TakeOrderedAndProject); the collected shortlist and its
    pairwise-similarity matrix are bounded O(shortlist·dim + shortlist²)
    driver state BY DESIGN (same class as the k-means/PQ codebooks), and
    the greedy loop is O(k·shortlist) driver arithmetic.

    Determinism/parity pins (the oracle replays the greedy recurrence as
    unrolled CTEs): relevance and pairwise sims are cosine rounded to 6;
    pairwise dots are strict left-to-right float64 folds (mirroring the
    expression fold / list_sum). The greedy score itself is an INTEGER-
    UNIT recurrence (the PageRank lesson — float λ·rel−(1−λ)·pen on
    grid-quantized inputs lands exactly on .5 display boundaries where
    the engines' rounding rules diverge; observed once at sf0.001):
    λ is taken as integer thousandths L (λ=0.7 → L=700, M=300), rel and
    sim as exact 1e-6 fixed-point longs, so
    mmr_units = L·rel_u − M·max(sim_u) is exact integer arithmetic in
    1e-9 units and ``mmr_score = mmr_units/1e9`` needs no rounding at
    all. The empty-set penalty is exactly 0; argmax ties break on the
    smaller id. Returns (mmr_rank, vec_id, relevance, mmr_score).
    """
    row = df.filter(F.col(id_col) == query_id).select(vec_col).first()
    if row is None:
        raise KeyError(f"{id_col}={query_id} not found")
    qv = [float(x) for x in row[0]]
    qarr = F.array(*[F.lit(x) for x in qv])
    short = (
        df.filter(F.col(id_col) != query_id)
        .select(id_col, vec_col, F.round(cosine(F.col(vec_col), qarr), 6).alias("rel"))
        .orderBy(F.desc("rel"), F.asc(id_col))
        .limit(shortlist)
        .collect()
    )
    vecs = {r[0]: [float(x) for x in r[1]] for r in short}
    rel = {r[0]: float(r[2]) for r in short}

    def _cos(a: list[float], b: list[float]) -> float:
        # strict left-to-right folds, like the Column-expression form
        d = 0.0
        for x, y in zip(a, b):
            d += x * y
        na = 0.0
        for x in a:
            na += x * x
        nb = 0.0
        for y in b:
            nb += y * y
        return round(d / (na ** 0.5 * nb ** 0.5), 6)

    ids = sorted(vecs)
    sim_u = {
        (a, b): int(round(_cos(vecs[a], vecs[b]) * 1e6))
        for a in ids for b in ids if a != b
    }
    rel_u = {d: int(round(rel[d] * 1e6)) for d in ids}

    lam_t = int(round(lam * 1000))  # λ in thousandths; 1000-lam_t is (1−λ)
    picked: list[int] = []
    out_rows = []
    for step in range(min(k, len(ids))):
        best_id, best_score = None, None
        for d in ids:
            if d in picked:
                continue
            pen_u = max(sim_u[(d, s)] for s in picked) if picked else 0
            score = lam_t * rel_u[d] - (1000 - lam_t) * pen_u  # exact 1e-9 units
            if best_id is None or score > best_score or (score == best_score and d < best_id):
                best_id, best_score = d, score
        picked.append(best_id)
        out_rows.append((step + 1, best_id, rel[best_id], best_score / 1e9))
    return df.sparkSession.createDataFrame(
        out_rows, "mmr_rank int, vec_id long, relevance double, mmr_score double"
    )


def rrf_fuse(sparse: DataFrame, dense: DataFrame, k: int = 10, c: int = 60,
             id_col: str = "doc_id",
             sparse_score: str = "bm25", dense_score: str = "cosine_sim") -> DataFrame:
    """Reciprocal-rank fusion of a sparse (lexical) and a dense (embedding)
    shortlist — the standard hybrid-retrieval combiner (Cormack et al.,
    SIGIR 2009): rrf(d) = Σ_lists 1/(c + rank_list(d)), robust to the two
    scores living on incomparable scales.

    Both inputs are already top-N shortlists (each O(N) rows — the corpus
    never reaches this operator), so everything here is driver-scale tiny:
    per-list ranks come from a row_number over the deterministic
    (rounded score desc, id) order each shortlist was selected with, and
    the fusion is a full outer join of the two rank tables.

    Determinism/parity: each reciprocal term is quantized to fixed-point
    1e-9 units (round(1e9/(c+r)) as an integer — exact in both engines)
    and the fused score is the exact integer sum of the two terms, so
    ordering is bit-identical cross-engine with ties pinned on id; the
    visible score is the exact fused value in double (≤ 2e9 units, exact).
    """
    def ranked(df: DataFrame, score: str, alias: str) -> DataFrame:
        from pyspark.sql import Window

        w = Window.orderBy(F.desc(score), F.asc(id_col))
        return df.select(id_col, F.row_number().over(w).alias(alias))

    sr = ranked(sparse, sparse_score, "rank_sparse")
    dr = ranked(dense, dense_score, "rank_dense")

    def term(rank_col: str) -> Column:
        return F.coalesce(
            F.round(F.lit(1e9) / (F.lit(c) + F.col(rank_col))).cast("long"), F.lit(0)
        )

    fused = sr.join(dr, id_col, "full_outer").select(
        id_col,
        F.col("rank_sparse").cast("int").alias("rank_sparse"),
        F.col("rank_dense").cast("int").alias("rank_dense"),
        ((term("rank_sparse") + term("rank_dense")) / 1e9).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc(id_col)).limit(k)


def sign_pack(vec_col: Column, lo: int, hi: int) -> Column:
    """Pack sign bits of vec[lo:hi] into a non-negative long (big-endian
    fold: acc*2 + (vᵢ>0)) — binary quantization, 32× smaller than float32.

    The fold form avoids shift-by-column expressions, which neither engine
    accepts uniformly; the DuckDB twin reproduces the same integer via
    an explicit power-of-two sum (see _SQL_SIGN_PACK in plans/ext.py).
    ``hi - lo`` must stay ≤ 62 so the accumulator cannot touch the sign bit.
    """
    return F.aggregate(
        F.sequence(F.lit(lo), F.lit(hi - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc * 2
        + F.when(F.element_at(vec_col, i + 1) > 0, 1).otherwise(0).cast("long"),
    )


def hamming_topk(df: DataFrame, query_id: int, k: int = 10, dim: int = 64,
                 vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Binary-quantized ANN: sign-bit codes + Hamming distance top-k.

    The corpus collapses to two packed longs per vector (codes for dims
    [0,32) and [32,64)); distance is ``bit_count(xor)`` — pure codegen
    integer ops, no floats in the scan. At 100 TB this is the
    memory-bandwidth-optimal candidate generator (32× less data than
    float32 brute force) feeding an exact re-rank; here the query returns
    the Hamming ranking itself, ties pinned on id. One narrow pass +
    TakeOrderedAndProject — no shuffle, no sort of the full corpus.
    """
    half = dim // 2
    codes = df.select(
        id_col,
        sign_pack(F.col(vec_col), 0, half).alias("code_lo"),
        sign_pack(F.col(vec_col), half, dim).alias("code_hi"),
    )
    q = codes.filter(F.col(id_col) == query_id).select(
        F.col("code_lo").alias("q_lo"), F.col("code_hi").alias("q_hi")
    )
    ham = (
        F.bit_count(F.col("code_lo").bitwiseXOR(F.col("q_lo")))
        + F.bit_count(F.col("code_hi").bitwiseXOR(F.col("q_hi")))
    ).cast("int")
    return (
        codes.filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q))  # 1-row broadcast scalar, not a real cross
        .select(id_col, ham.alias("hamming"))
        .orderBy(F.asc("hamming"), F.asc(id_col))
        .limit(k)
    )


def scalar_quantize_int8(df: DataFrame, vec_col: str = "embedding",
                         id_col: str = "vec_id") -> DataFrame:
    """Per-vector int8 scalar quantization: code_i = floor((x_i - min) /
    scale + 0.5) with scale = (max - min)/255 — 4× smaller storage for
    ANN candidate scans, exact arithmetic reproducible in ANSI SQL
    (floor(+0.5) avoids the engines' differing round-half conventions).

    One narrow projection, no shuffle. Constant vectors (scale 0) emit
    all-zero codes via the nullif guard. Codes are emitted as a
    comma-joined string so differential comparison is representation-
    stable across engines; a storage writer would keep the array form.
    """
    v = F.col(vec_col)
    vmin = F.array_min(F.transform(v, lambda x: x.cast("double")))
    vmax = F.array_max(F.transform(v, lambda x: x.cast("double")))
    scale = (vmax - vmin) / F.lit(255.0)
    code = F.transform(
        v,
        lambda x: F.floor((x.cast("double") - vmin) / F.nullif(scale, F.lit(0.0)) + 0.5)
        .cast("int"),
    )
    codes = F.transform(code, lambda c: F.coalesce(c, F.lit(0)).cast("string"))
    return df.select(
        id_col,
        F.round(vmin, 6).alias("offset"),
        F.round(scale, 6).alias("scale"),
        F.concat_ws(",", codes).alias("codes"),
    )


def quantized_cosine_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                          vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Asymmetric quantized search (ADC): corpus vectors are scored through
    their int8 quantization (dequantize = offset + code·scale) against the
    EXACT query vector — the memory/recall trade every production ANN
    system makes (score 4× more candidates per byte of cache, re-rank the
    short list exactly if needed).

    Quantize→dequantize→cosine is one narrow expression chain; results are
    deterministic, so the DuckDB oracle reproduces the exact ranking.
    """
    v = F.col(vec_col)
    vmin = F.array_min(F.transform(v, lambda x: x.cast("double")))
    vmax = F.array_max(F.transform(v, lambda x: x.cast("double")))
    scale = (vmax - vmin) / F.lit(255.0)
    dq = F.transform(
        v,
        lambda x: vmin
        + F.coalesce(
            F.floor((x.cast("double") - vmin) / F.nullif(scale, F.lit(0.0)) + 0.5),
            F.lit(0),
        )
        * scale,
    )
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(id_col, F.round(cosine(dq, q), 6).alias("approx_cosine"))
    return scored.orderBy(F.desc("approx_cosine"), F.asc(id_col)).limit(k)


def rp_lsh_signs(n_planes: int, dim: int) -> list[tuple[int, int, int]]:
    """Deterministic ±1 random-hyperplane components: sign(p,d) from the
    parity of a 60-bit md5 hash of 'p|d' — reproducible in ANSI SQL
    (mirrored by the emb_lsh oracles), no RNG state to ship."""
    import hashlib

    out = []
    for p in range(n_planes):
        for d in range(dim):
            h = int(hashlib.md5(f"{p}|{d}".encode()).hexdigest()[:15], 16)
            out.append((p, d, 1 if h % 2 == 0 else -1))
    return out


def _plane_sign_lists(n_planes: int, dim: int) -> list[list[int]]:
    """``rp_lsh_signs`` regrouped as one ±1 list per plane."""
    per = [[0] * dim for _ in range(n_planes)]
    for p, d, s in rp_lsh_signs(n_planes, dim):
        per[p][d] = s
    return per


def _rp_dot(vec_col: Column, signs: list[int]) -> Column:
    """Σ_d sign_d·v_d as a flat ±element_at arithmetic chain — plain codegen
    expressions (no higher-order functions, no join, no shuffle); summation
    order is d ascending, deterministic."""
    acc: Column | None = None
    for d, s in enumerate(signs):
        term = F.element_at(vec_col, d + 1).cast("double")
        term = term if s > 0 else -term
        acc = term if acc is None else acc + term
    assert acc is not None
    return acc


def rp_lsh_buckets(df: DataFrame, n_planes: int = 4, dim: int = 64,
                   vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Sign-LSH bucket per vector: bit p = [Σ_d sign(p,d)·v_d > 0].

    One narrow projection: each plane's dot product is a ±element_at
    arithmetic fold (signs are ±1, so no multiplies) and the bucket
    assembles bits with when/otherwise — whole-stage codegen, ZERO
    shuffles/joins before the bucket column exists. (The earlier
    formulation posexploded dim×n rows through a broadcast join and two
    groupBys — two shuffles to compute what is a per-row expression.)
    """
    signs = _plane_sign_lists(n_planes, dim)
    bucket: Column | None = None
    for p in range(n_planes):
        bit = F.when(_rp_dot(F.col(vec_col), signs[p]) > 0, F.lit(2 ** p)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    assert bucket is not None
    return df.select(id_col, bucket.cast("long").alias("bucket"))


def rp_lsh_buckets_banded(df: DataFrame, n_tables: int = 4, n_planes: int = 16,
                          dim: int = 64, vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """Banded sign-LSH: ``n_tables`` independent hash tables of ``n_planes``
    bits each → rows (id, table_idx, bucket).

    Table t uses global planes [t·n_planes, (t+1)·n_planes); all
    n_tables×n_planes dot products are computed in ONE Arrow-vectorized
    batch matmul (V·Sᵀ) — a single narrow pass, no shuffle before the
    bucket columns exist. Banding is what keeps recall at high bucket
    resolution: two vectors are candidates if they collide in ANY table,
    so occupancy per bucket is ~n/2^n_planes while recall compounds
    across tables (the MinHash-banding construction applied to sign-LSH).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    total = n_tables * n_planes
    smat = np.asarray(_plane_sign_lists(total, dim), dtype=np.float64)  # (total, dim)
    weights = np.tile(2.0 ** np.arange(n_planes), n_tables)  # bit weight within table
    table_of = np.repeat(np.arange(n_tables), n_planes)

    # no typehints: string annotations from `__future__` break pandas_udf
    # inspection; returnType is given explicitly below
    def _buckets(vecs):
        m = np.vstack(vecs.to_numpy()).astype(np.float64, copy=False)  # (n, dim)
        bits = (m @ smat.T) > 0  # (n, total)
        weighted = bits * weights  # (n, total)
        out = np.zeros((m.shape[0], n_tables), dtype=np.int64)
        for t in range(n_tables):
            out[:, t] = weighted[:, table_of == t].sum(axis=1).astype(np.int64)
        return pd.Series(list(out))

    bucket_arr = pandas_udf(_buckets, "array<long>")
    # posexplode_outer: the array is always exactly n_tables entries, so
    # outer == inner — but plain posexplode makes the optimizer push an
    # inferred (size(_b) > 0 AND isnotnull(_b)) filter BELOW the projection,
    # which re-evaluates the Arrow matmul a second time just for the filter
    return (
        df.select(id_col, bucket_arr(F.col(vec_col)).alias("_b"))
        .select(id_col, F.posexplode_outer("_b").alias("table_idx", "bucket"))
    )


def pairwise_cosine_arrow() -> "F.Column":
    """Arrow-vectorized pairwise cosine over two array columns: each batch
    stacks into two (n, d) float64 matrices → one rowwise einsum. The
    verify stage of LSH pipelines scores millions of candidate pairs; the
    interpreted per-element fold is ~10× slower here."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    def _score(va, vb):
        a = np.vstack(va.to_numpy()).astype(np.float64, copy=False)
        b = np.vstack(vb.to_numpy()).astype(np.float64, copy=False)
        dots = np.einsum("ij,ij->i", a, b)
        na = np.sqrt(np.einsum("ij,ij->i", a, a))
        nb = np.sqrt(np.einsum("ij,ij->i", b, b))
        return pd.Series(dots / (na * nb))

    return pandas_udf(_score, "double")


def lsh_near_dup_pairs(df: DataFrame, threshold: float = 0.25, n_tables: int = 4,
                       n_planes: int = 16, dim: int = 64,
                       vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Embedding-cosine near-dup pairs via BANDED sign-LSH: candidates
    share a bucket in ≥1 of ``n_tables`` independent tables, then exact
    cosine verifies (Arrow-vectorized).

    Candidate generation is ONE aggregation per (table_idx, bucket) with an
    in-bucket pair fan-out (the same formulation as minhash_lsh_pairs) —
    never the n² cross product, and the Arrow matmul that computes the 64
    plane dots runs ONCE. The earlier bucket self-join re-ran
    rp_lsh_buckets_banded's pandas_udf on both join sides (Spark does not
    reuse the subtree across self-join sides). distinct() collapses
    multi-table collisions before the verify stage so each pair is scored
    once. At the defaults, per-table occupancy is ~n/2^16 (sub-quadratic
    past 10⁹ rows) while recall compounds to 1-(1-p^16)^4 across the four
    tables — the fix for a single 2^8-bucket table whose occupancy went
    quadratic at ~10⁷.
    """
    from .dedup import _pairs_from_sorted_ids

    buckets = rp_lsh_buckets_banded(df, n_tables, n_planes, dim, vec_col, id_col)
    cand = (
        buckets.groupBy("table_idx", "bucket")
        .agg(F.array_sort(F.collect_list(id_col)).alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(_pairs_from_sorted_ids("ids")).alias("p"))
        .select(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .distinct()
    )
    va = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    vb = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    # asNondeterministic stops the optimizer from substituting the scoring
    # expression through the projection when it pushes the threshold filter
    # down — with a deterministic UDF that substitution re-evaluates the
    # Arrow verify pass a second time just for the filter (the function IS
    # deterministic; the flag only pins evaluate-once placement). The UDF
    # is referenced exactly once, so the plan has ONE _score invocation;
    # the threshold therefore compares the ROUNDED score, and the oracle
    # mirrors that (ROUND(...,6) >= t).
    score = pairwise_cosine_arrow().asNondeterministic()
    scored = cand.join(va, "id_a").join(vb, "id_b").select(
        "id_a",
        "id_b",
        F.round(score(F.col("va"), F.col("vb")), 6).alias("cosine_sim"),
    )
    return scored.filter(F.col("cosine_sim") >= threshold)


def pairwise_topk_join(df: DataFrame, k: int = 5, vec_col: str = "embedding",
                       id_col: str = "vec_id", label_col: str = "label") -> DataFrame:
    """All-pairs top-k *within label cells* — the LSH/IVF-bucketed pattern
    for corpus-vs-corpus similarity: self-join restricted to the cell key,
    never the full n² cross product."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col(label_col).alias("cell"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col(label_col).alias("cell"))
    pairs = a.join(b, ["cell"]).filter(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "cell", "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cosine_sim")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("id_a").orderBy(F.desc("cosine_sim"), F.asc("id_b"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop("rn")


def kmeans_assign(df: DataFrame, k: int = 4, n_iter: int = 2,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  round_to: int = 6) -> DataFrame:
    """Lloyd's k-means, Spark-shaped: vectors never leave the executors;
    only the k×dim centroid table moves (collected once per iteration —
    O(k·dim), the same driver-side footprint as ``ivf_topk``'s probe).

    Determinism pins (so an ANSI oracle can replay the algorithm):
    - init = the vectors of the k smallest ids, cluster index in id order;
    - assignment = argmin of squared L2 (strict left-to-right double fold),
      ties broken by the lower cluster index via lexicographic struct min;
    - updated centroid coordinates are ROUNDED to ``round_to`` decimals —
      the cross-engine state stays bit-identical instead of accumulating
      float drift across iterations;
    - an emptied cluster keeps its previous centroid.

    ``n_iter`` counts assignment rounds: n_iter-1 centroid updates happen
    in between, and the returned frame is the final assignment
    (vec_id, cluster, sqdist).
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    seed_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = [[float(x) for x in r[0]] for r in seed_rows]

    def _assign(frame: DataFrame) -> DataFrame:
        scored = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col(vec_col),
                            F.array(*[F.lit(x) for x in c]),
                            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    ).alias("d"),
                    F.lit(i).alias("c"),
                )
                for i, c in enumerate(cents)
            ]
        )
        best = F.array_min(scored)
        return frame.select(
            id_col,
            vec_col,
            best["c"].alias("cluster"),
            F.round(best["d"], round_to).alias("sqdist"),
        )

    for _ in range(n_iter - 1):
        assigned = _assign(df)
        cents = _centroid_update(assigned, vec_col, cents, round_to)
    return _assign(df).drop(vec_col)


def _centroid_update(assigned: DataFrame, vec_col: str,
                     cents: list[list[float]], round_to: int) -> list[list[float]]:
    """One Lloyd centroid update shared by the expression and Arrow
    assignment kernels: decimal-exact per-coordinate mean, rounded to
    ``round_to``; an emptied cluster keeps its previous centroid."""
    means = (
        assigned.select("cluster", F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("cluster", "pos")
        .agg(F.round(dmean(F.col("v").cast("double")), round_to).alias("m"))
        .groupBy("cluster")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
            ).alias("cv")
        )
        .collect()
    )
    updated = {r["cluster"]: [float(x) for x in r["cv"]] for r in means}
    return [updated.get(i, c) for i, c in enumerate(cents)]


def kmeans_assign_arrow(df: DataFrame, k: int = 4, n_iter: int = 2,
                        vec_col: str = "embedding", id_col: str = "vec_id",
                        round_to: int = 6,
                        centroid_chunk: int = 2048) -> DataFrame:
    """:func:`kmeans_assign` with the assignment computed by a chunked
    Arrow kernel instead of k unrolled struct expressions — the LARGE-k
    path (the expression form inlines k×dim literals into the plan:
    fine at k ≈ dozens, pathological at the 50k-cluster scale SemDeDup
    actually runs). Identical contract, BIT-EQUAL output:

    - same id-ordered seeding, same shared decimal-exact rounded
      centroid update (:func:`_centroid_update`), emptied clusters keep
      their centroid;
    - the kernel accumulates (x_j − c_j)² over dimensions IN ORDER
      (one vectorized pass per dimension), reproducing the expression
      fold's strict left-to-right float64 summation exactly — not a
      gemm, whose blocked summation would differ at ulp and could flip
      a near-tie assignment;
    - ties (equal squared distance) resolve to the LOWER cluster index:
      chunks scan in index order and a later chunk must be strictly
      smaller to win, matching the lexicographic struct-min.

    Per-batch memory is O(rows × centroid_chunk); centroids live in the
    task closure (k·dim doubles — at k=50k, dim=768 that is ~300 MB
    broadcast once per executor, the standard SemDeDup deployment
    shape). The visible sqdist rounds via numpy (half-even) vs the
    expression's HALF_UP — indistinguishable off the exact .5e-6 grid,
    which float sums of squares do not hit (equivalence pinned in
    tests).
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.pandas.functions import pandas_udf

    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    seed_rows = df.orderBy(id_col).limit(k).select(vec_col).collect()
    cents = [[float(x) for x in r[0]] for r in seed_rows]

    def _assign(frame: DataFrame, cents_now: list[list[float]]) -> DataFrame:
        C = np.asarray(cents_now, dtype=np.float64)

        # no type hints: string annotations (future-imported) break
        # pandas_udf's signature inspection — returnType carries the schema
        def _score(vecs):
            X = np.vstack(vecs.to_numpy()).astype(np.float64, copy=False)
            n, d = X.shape
            best_d = np.full(n, np.inf)
            best_c = np.zeros(n, dtype=np.int64)
            for s in range(0, C.shape[0], centroid_chunk):
                Cc = C[s:s + centroid_chunk]
                acc = np.zeros((n, Cc.shape[0]))
                for j in range(d):
                    diff = X[:, j:j + 1] - Cc[None, :, j][0]
                    acc += diff * diff
                loc = acc.argmin(axis=1)          # first occurrence wins
                loc_d = acc[np.arange(n), loc]
                take = loc_d < best_d             # strict: earlier chunk keeps ties
                best_d = np.where(take, loc_d, best_d)
                best_c = np.where(take, loc + s, best_c)
            return pd.DataFrame({
                "cluster": best_c.astype(np.int32),
                "sqdist": _np_round_half_up(best_d, round_to),
            })

        score = pandas_udf(_score, "cluster int, sqdist double")
        return frame.select(
            id_col, vec_col, score(F.col(vec_col)).alias("_s")
        ).select(id_col, vec_col, "_s.cluster", "_s.sqdist")

    for _ in range(n_iter - 1):
        cents = _centroid_update(_assign(df, cents), vec_col, cents, round_to)
    return _assign(df, cents).drop(vec_col)


def _sqdist_expr(sub: Column, center: list[float]) -> Column:
    """Squared L2 against a literal center — strict left-to-right fold."""
    return F.aggregate(
        F.zip_with(
            sub,
            F.array(*[F.lit(x) for x in center]),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _lloyd_codebook(df: DataFrame, sub_col: str, id_col: str, k: int,
                    n_iter: int, round_to: int = 6) -> list[list[float]]:
    """Per-subspace Lloyd returning the final CENTROIDS (kmeans_assign's
    pins: id-ordered seeds, struct-min tie-break, rounded updates, emptied
    cluster keeps its centroid). Driver state is O(k·d_sub)."""
    seeds = df.orderBy(id_col).limit(k).select(sub_col).collect()
    cents = [[float(x) for x in r[0]] for r in seeds]
    for _ in range(n_iter - 1):
        scored = F.array(
            *[
                F.struct(_sqdist_expr(F.col(sub_col), c).alias("d"), F.lit(i).alias("c"))
                for i, c in enumerate(cents)
            ]
        )
        assigned = df.select(sub_col, F.array_min(scored)["c"].alias("cluster"))
        means = (
            assigned.select("cluster", F.posexplode(sub_col).alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(F.round(dmean(F.col("v").cast("double")), round_to).alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("cv")
            )
            .collect()
        )
        updated = {r["cluster"]: [float(x) for x in r["cv"]] for r in means}
        cents = [updated.get(i, c) for i, c in enumerate(cents)]
    return cents


def pq_train(df: DataFrame, m: int = 4, k: int = 16, n_iter: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id",
             round_to: int = 6) -> list[list[list[float]]]:
    """Product-quantization codebooks (Jégou et al., TPAMI 2011): split the
    dim into ``m`` subspaces, run Lloyd independently in each → ``m``
    codebooks of ``k`` centroids. Storage after encoding is m·log2(k) bits
    per vector (m=4,k=16 → 2 bytes vs 256 for float32-64d).

    Returns driver-side codebooks (O(m·k·d/m) = O(k·dim) floats — same
    footprint class as ivf/kmeans probes). Each subspace's training is the
    deterministic kmeans recurrence, so an ANSI oracle can replay it per
    subspace exactly like O_KMEANS does (planned for the r5 window)."""
    dim = len(df.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    return [
        _lloyd_codebook(
            df.select(id_col, F.slice(vec_col, j * d + 1, d).alias("_sub")),
            "_sub", id_col, k, n_iter, round_to,
        )
        for j in range(m)
    ]


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Encode each vector as m nearest-centroid indices — one narrow
    per-row expression pass, no shuffle; ties break to the lower index
    (struct-min, the same pin as assignment)."""
    d = len(codebooks[0][0])
    cols = []
    for j, book in enumerate(codebooks):
        sub = F.slice(F.col(vec_col), j * d + 1, d)
        scored = F.array(
            *[
                F.struct(_sqdist_expr(sub, c).alias("d"), F.lit(i).alias("c"))
                for i, c in enumerate(book)
            ]
        )
        cols.append(F.array_min(scored)["c"].cast("int").alias(f"code_{j}"))
    return df.select(id_col, *cols)


def pq_adc_topk(df: DataFrame, query_vec: Sequence[float],
                codebooks: list[list[list[float]]], topk: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query builds m lookup
    tables of k entries driver-side (exact float query vs quantized
    corpus), then the scan is m integer array lookups + adds per vector —
    no per-row float vector math at all. TakeOrderedAndProject global
    top-k; ties pinned on id. The 100 TB shape: encode once at ingest,
    store the m small code columns, scan only codes at query time."""
    d = len(codebooks[0][0])
    luts = [
        [
            round(sum((float(query_vec[j * d + t]) - c[t]) ** 2 for t in range(d)), 9)
            for c in book
        ]
        for j, book in enumerate(codebooks)
    ]
    codes = pq_encode(df, codebooks, vec_col, id_col)
    dist = None
    for j, lut in enumerate(luts):
        term = F.element_at(F.array(*[F.lit(x) for x in lut]), F.col(f"code_{j}") + 1)
        dist = term if dist is None else dist + term
    return (
        codes.select(id_col, F.round(dist, 6).alias("adc_sqdist"))
        .orderBy(F.asc("adc_sqdist"), F.asc(id_col))
        .limit(topk)
    )


def ivf_pq_topk(df: DataFrame, query_vec: Sequence[float],
                codebooks: list[list[list[float]]], topk: int = 10,
                nprobe: int = 1, vec_col: str = "embedding",
                id_col: str = "vec_id", label_col: str = "label") -> DataFrame:
    """IVF cell pruning over PQ codes — the standard IVFPQ composition
    (inverted file + product quantizer): probe the nprobe nearest cells by
    centroid cosine, then ADC-rank ONLY those cells' members through their
    m-byte codes. At 100 TB: cell-partitioned code storage means the query
    touches nprobe/ncells of an already 100×-compressed representation.
    Codebooks are trained corpus-wide (pq_train) so codes are comparable
    across cells."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cents = centroids_by_label(df, vec_col, label_col)
    probed = [
        r[0]
        for r in cents.select(label_col, cosine(F.col("centroid"), q).alias("s"))
        .orderBy(F.desc("s"), F.asc(label_col))
        .limit(nprobe)
        .collect()
    ]
    cell = df.filter(F.col(label_col).isin(probed))
    return pq_adc_topk(cell, query_vec, codebooks, topk, vec_col, id_col)


def semdedup(df: DataFrame, k: int = 4, n_iter: int = 2, threshold: float = 0.35,
             vec_col: str = "embedding", id_col: str = "vec_id",
             labels: DataFrame | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic dedup =
    k-means clustering + within-cluster cosine pruning, confining the
    quadratic pairwise stage to cluster blocks (pick k ~ sqrt(n) so block
    sizes stay tractable; the paper runs 50k clusters over LAION).

    Deterministic keep rule (the paper picks a per-group representative by
    centroid distance; we pin the lexicographic variant so an ANSI oracle
    can replay it): a vector is DROPPED iff some lower-id member of its
    cluster has cosine >= threshold with it — the upper-triangle
    max-similarity pruning production curation stacks use. The default
    threshold suits the synthetic near-orthogonal test corpus; real-corpus
    deployments run 0.95+.

    Plan shape (r10 — block kernel): the k-means assignment is
    localCheckpoint'ed because it feeds BOTH the drop computation and the
    final decision join — without the checkpoint Spark re-evaluates the
    whole Lloyd assignment subtree per branch. Vectors attach to their
    cluster label with ONE id-equi-join, then ``applyInPandas`` per
    cluster computes the whole block's upper-triangle max-similarity
    pruning as a chunked float64 BLAS gemm — each vector crosses the
    wire ONCE (the r5-r9 form fanned out explicit pairs and shipped BOTH
    vectors per pair through the Arrow kernel: ~n²/k rows × 2 vectors;
    measured 4.3 s materialized at sf0.1, 1.6 s with the block kernel).
    Per-group memory is O(block · chunk) — the gemm runs in 2048-column
    chunks, so a block never materializes its full n² similarity matrix.
    Block sizes are the k-means cluster sizes (pick k ~ sqrt(n) — the
    paper's posture — and blocks stay ~sqrt(n)).

    Determinism/parity: scores are the same float64 cosine ratios the
    pair kernel computed (gemm vs rowwise einsum differ only in
    summation order — ulp-level, absorbed by the 6-decimal rounding the
    threshold compares against, same contract as cosine_scores_arrow);
    the drop rule compares the ROUNDED score, oracle mirrors.

    ``labels`` (optional, (id, cluster)) plugs in ANY clusterer instead
    of the built-in deterministic Lloyd — the paper runs faiss k-means
    over 50k clusters, and a production corpus often carries cluster or
    shard labels already; the pruning contract is identical (r10).

    Returns (vec_id, cluster, keep).
    """
    import numpy as np
    import pandas as pd

    if labels is None:
        assigned = kmeans_assign(
            df, k=k, n_iter=n_iter, vec_col=vec_col, id_col=id_col
        ).localCheckpoint()
    else:
        assigned = labels.select(id_col, "cluster").localCheckpoint()
    withvec = assigned.join(df.select(id_col, vec_col), id_col)
    thr = float(threshold)

    def _block_drops(pdf: "pd.DataFrame") -> "pd.DataFrame":
        ids = pdf[id_col].to_numpy()
        order = np.argsort(ids, kind="stable")  # ids are unique per corpus
        ids = ids[order]
        n = len(ids)
        if n < 2:
            return pd.DataFrame({id_col: ids[:0]})
        m = np.vstack(pdf[vec_col].to_numpy()[order]).astype(np.float64, copy=False)
        norms = np.sqrt(np.einsum("ij,ij->i", m, m))
        dropped = np.zeros(n, dtype=bool)
        rows = np.arange(n)
        chunk = 2048
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            sims = (m @ m[s:e].T) / np.outer(norms, norms[s:e])
            hit = _np_round_half_up(sims, 6) >= thr
            lower = rows[:, None] < np.arange(s, e)[None, :]  # i < j only
            dropped[s:e] |= (hit & lower).any(axis=0)
        return pd.DataFrame({id_col: ids[dropped]})

    drops = (
        withvec.groupBy("cluster")
        .applyInPandas(_block_drops, schema=f"{id_col} long")
        .withColumn("_drop", F.lit(True))
    )
    return (
        assigned.join(drops, id_col, "left")
        .select(id_col, "cluster", F.col("_drop").isNull().alias("keep"))
    )


def ivf_quantized_topk(df: DataFrame, query_vec: Sequence[float], k: int = 10,
                       nprobe: int = 1, rerank_factor: int = 4,
                       vec_col: str = "embedding", id_col: str = "vec_id",
                       label_col: str = "label") -> DataFrame:
    """The full production-ANN composition: IVF cell pruning → int8 ADC
    scoring → exact re-rank of the short list.

    At 100 TB each stage cuts the next one's input: the probe reads
    nprobe/ncells of the corpus (file-level pruning with cell-partitioned
    storage), ADC scores those candidates through 4×-smaller codes, and
    only ``rerank_factor × k`` survivors get the exact float cosine. The
    whole chain is ONE scan — vectors ride along to the short list (tiny
    after the TakeOrdered) instead of re-joining the corpus for re-rank.
    Everything is deterministic expressions, so the DuckDB oracle replays
    the identical three stages bit-for-bit.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    cents = centroids_by_label(df, vec_col, label_col)
    probed = [
        r[0]
        for r in cents.select(label_col, cosine(F.col("centroid"), q).alias("s"))
        .orderBy(F.desc("s"), F.asc(label_col))
        .limit(nprobe)
        .collect()
    ]
    cell = df.filter(F.col(label_col).isin(probed))

    v = F.col(vec_col)
    vmin = F.array_min(F.transform(v, lambda x: x.cast("double")))
    vmax = F.array_max(F.transform(v, lambda x: x.cast("double")))
    scale = (vmax - vmin) / F.lit(255.0)
    dq = F.transform(
        v,
        lambda x: vmin
        + F.coalesce(
            F.floor((x.cast("double") - vmin) / F.nullif(scale, F.lit(0.0)) + 0.5),
            F.lit(0),
        )
        * scale,
    )
    shortlist = (
        cell.select(id_col, vec_col, F.round(cosine(dq, q), 6).alias("approx_cosine"))
        .orderBy(F.desc("approx_cosine"), F.asc(id_col))
        .limit(rerank_factor * k)
    )
    return (
        shortlist.select(
            id_col,
            "approx_cosine",
            F.round(cosine(F.col(vec_col), q), 6).alias("cosine_sim"),
        )
        .orderBy(F.desc("cosine_sim"), F.asc(id_col))
        .limit(k)
    )
