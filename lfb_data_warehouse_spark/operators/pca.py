"""Distributed PCA over an embedding column.

The 100 TB shape: ONE aggregate pass computes the exact integer moment
sums (count, per-dimension sums, upper-triangle cross-product sums —
dim + dim·(dim+1)/2 scalars, map-side partial aggregation so each
executor contributes one partial row), the driver eigendecomposes the
dim×dim covariance (trivial at embedding dims), and the projection is
a map-only expression over the corpus with the components as plan
literals — no shuffle anywhere except the moment aggregate's single
1-row exchange. This is the standard fit/transform split: the model is
tiny, the data never moves.

Exactness: moments are computed in :func:`quantize`'s integer space,
so the covariance input — and the gate's ``trace_num`` invariant
n·ΣSxx − ΣSx² (the trace numerator, a pure integer) — replays
bit-for-bit on any engine. Eigenvectors are float (LAPACK), so the
gate grades them as CLAIMS (orthonormality, monotone spectrum,
projection variance == eigenvalue) rather than by bit parity — the
int8_ann_topk_claim pattern.

Scale notes: BIGINT moment sums hold to ~1e14 rows at this value
scale (|q| ≤ 1e4 → products ≤ 1e8); beyond that, widen the SUM casts
to DECIMAL — the plan shape is unchanged. Eigen-decomposition is
O(dim³) on the driver: fine to dim ~10⁴, which covers embedding
widths by orders of magnitude.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import quantize


@dataclass
class PCAModel:
    n: int
    mean: list[float]  # per-dimension mean of the quantized vectors
    components: list[list[float]]  # k rows, each a dim-length eigenvector
    eigenvalues: list[float]  # descending, matching components
    trace_num: int  # n·ΣSxx − ΣSx² — integer-exact covariance trace · n²


def pca_fit(emb: DataFrame, id_col: str, vec_col: str, dim: int, k: int) -> PCAModel:
    """Fit PCA with one exact-integer moment pass + driver eigh.

    The aggregate is built as a single selectExpr call (one py4j
    round-trip, one parse) carrying COUNT + dim SUMs + the
    dim·(dim+1)/2 upper-triangle cross sums; the collect is exactly
    one row of bounded width. Eigenvector sign is normalized
    deterministically (largest-|component| entry made positive) so
    repeated fits are identical."""
    import numpy as np

    q = quantize(emb, id_col, vec_col)
    aggs = ["COUNT(1) AS n"]
    aggs += [f"SUM(element_at(q, {i + 1})) AS s{i}" for i in range(dim)]
    aggs += [
        f"SUM(element_at(q, {i + 1}) * element_at(q, {j + 1})) AS p{i}_{j}"
        for i in range(dim)
        for j in range(i, dim)
    ]
    row = q.selectExpr(*aggs).first()  # bounded: one row, O(dim²) scalars
    n = int(row["n"])
    if n == 0:
        raise ValueError("pca_fit: empty input")
    s = [int(row[f"s{i}"]) for i in range(dim)]
    p = {}
    for i in range(dim):
        for j in range(i, dim):
            p[(i, j)] = int(row[f"p{i}_{j}"])
    trace_num = n * sum(p[(i, i)] for i in range(dim)) - sum(v * v for v in s)
    mean = [v / n for v in s]
    cov = np.empty((dim, dim), dtype=np.float64)
    for i in range(dim):
        for j in range(i, dim):
            c = p[(i, j)] / n - mean[i] * mean[j]
            cov[i, j] = c
            cov[j, i] = c
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps, eig = [], []
    for idx in order:
        vec = v[:, idx]
        pivot = int(np.argmax(np.abs(vec)))
        if vec[pivot] < 0:
            vec = -vec
        comps.append([float(x) for x in vec])
        eig.append(float(w[idx]))
    return PCAModel(n=n, mean=mean, components=comps, eigenvalues=eig, trace_num=trace_num)


def pca_project(emb: DataFrame, id_col: str, vec_col: str, model: PCAModel) -> DataFrame:
    """Map-only projection: ``(id, y: array<double>)`` with
    y_j = Σ_i (q_i − μ_i)·V_j,i. Components and mean are plan literals
    (one parsed expression per output column); no shuffle, no join —
    the shape that projects 100 TB in a single scan."""
    q = quantize(emb, id_col, vec_col)
    cols = []
    for j, comp in enumerate(model.components):
        terms = " + ".join(
            f"(element_at(q, {i + 1}) - ({model.mean[i]!r}D)) * ({comp[i]!r}D)"
            for i in range(len(comp))
        )
        cols.append(f"({terms}) AS y{j}")
    out = q.selectExpr(id_col, *cols)
    return out.select(
        F.col(id_col),
        F.array(*[F.col(f"y{j}") for j in range(len(model.components))]).alias("y"),
    )


def pca_claims(emb: DataFrame, id_col: str, vec_col: str, dim: int, k: int) -> DataFrame:
    """The gate frame: one row per component with the integer-exact
    trace numerator (oracle-replayable) and three engine-verified
    claims — eigenvector orthonormality, descending spectrum, and
    Var(projection_j) == λ_j (the distributed check that ties the
    map-only projection back to the fit: vᵀCv = λ)."""
    import math

    import numpy as np

    model = pca_fit(emb, id_col, vec_col, dim, k)
    v = np.array(model.components)
    gram = v @ v.T
    orthonormal_ok = bool(np.max(np.abs(gram - np.eye(len(v)))) < 1e-9)
    monotone_ok = all(
        a >= b - 1e-12 for a, b in zip(model.eigenvalues, model.eigenvalues[1:])
    )
    proj = pca_project(emb, id_col, vec_col, model)
    stats = proj.selectExpr(
        "COUNT(1) AS n",
        *[f"SUM(element_at(y, {j + 1})) AS sy{j}" for j in range(k)],
        *[
            f"SUM(element_at(y, {j + 1}) * element_at(y, {j + 1})) AS syy{j}"
            for j in range(k)
        ],
    ).first()
    n = int(stats["n"])
    rows = []
    for j in range(k):
        var = stats[f"syy{j}"] / n - (stats[f"sy{j}"] / n) ** 2
        lam = model.eigenvalues[j]
        ok = math.isclose(var, lam, rel_tol=1e-6, abs_tol=1e-6)
        rows.append(
            (j, str(model.trace_num), orthonormal_ok, monotone_ok, bool(ok))
        )
    spark = emb.sparkSession
    return spark.createDataFrame(
        rows,
        "component long, trace_num string, orthonormal_ok boolean, "
        "monotone_ok boolean, var_matches_eigenvalue boolean",
    )
