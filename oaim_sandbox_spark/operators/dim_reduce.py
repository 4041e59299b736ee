"""Distributed PCA for embedding columns — the learned counterpart of the
matryoshka prefix-truncation tier (`matryoshka_topk`).

Why it exists: matryoshka truncation only works when the embedding model was
*trained* to front-load information; for arbitrary vectors (or legacy stores)
PCA finds the best linear k-dim subspace after the fact. The fitted projection
feeds the same two-stage funnel (project -> coarse top-k -> exact re-rank).

Scale design (the part that matters at 100 TB):
  - fit: one scan; each Arrow batch emits a (dim x dim) Gram partial, a mean
    partial, and a count — the driver reduces #batches x dim² floats
    (dim-bounded, never row-bounded) and eigendecomposes the dim x dim
    covariance. No iteration, no second scan, no collect of vectors.
  - transform: vectorized numpy matmul per Arrow batch (BLAS), no shuffle,
    column-pruned scan.

Reference parity note: the reference has no dimensionality reduction at all
(embeddings go to Oracle VECTOR columns as-is, src/server/utils/
embedding.py:312-318); this is a beyond-reference scale path.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


@dataclass
class PCAModel:
    """Fitted PCA: ``components`` is (n_components, dim) row-orthonormal,
    ``mean`` is (dim,), ``explained_variance_ratio`` sums to <= 1."""

    components: np.ndarray
    mean: np.ndarray
    explained_variance_ratio: np.ndarray = field(default=None)

    @property
    def n_components(self) -> int:
        return int(self.components.shape[0])


def fit_pca(
    df: DataFrame,
    n_components: int = 16,
    vec_col: str = "embedding",
    center: bool = True,
) -> PCAModel:
    """Fit PCA over a vector column in ONE distributed pass.

    Per Arrow batch: X^T X (dim x dim), column sums (dim,), row count — all
    dim-bounded partials; the driver sums them, forms the covariance, and
    runs a dim x dim ``eigh``. Sign convention: each component's
    largest-|coordinate| entry is made positive, so the fit is deterministic
    across partitionings (eigh sign is otherwise arbitrary)."""

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            if x.size == 0:
                continue
            yield pd.DataFrame(
                {
                    "gram": [(x.T @ x).ravel().tolist()],
                    "colsum": [x.sum(axis=0).tolist()],
                    "n": [int(x.shape[0])],
                }
            )

    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(partials, schema="gram array<double>, colsum array<double>, n long")
        .collect()
    )
    if not rows:
        raise ValueError("fit_pca: empty input")
    n = sum(r["n"] for r in rows)
    gram = np.sum([np.asarray(r["gram"]) for r in rows], axis=0)
    colsum = np.sum([np.asarray(r["colsum"]) for r in rows], axis=0)
    dim = colsum.shape[0]
    gram = gram.reshape(dim, dim)
    mean = colsum / n if center else np.zeros(dim)
    cov = gram / n - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:n_components]
    comps = evecs[:, order].T.copy()
    signs = np.sign(comps[np.arange(comps.shape[0]), np.abs(comps).argmax(axis=1)])
    signs[signs == 0] = 1.0
    comps *= signs[:, None]
    top = np.clip(evals[order], 0.0, None)
    total = max(float(np.clip(evals, 0.0, None).sum()), 1e-300)
    return PCAModel(
        components=comps,
        mean=mean,
        explained_variance_ratio=top / total,
    )


def project_pca(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca_vec",
) -> DataFrame:
    """Project the vector column onto the fitted components (appends
    ``out_col`` ARRAY<DOUBLE> of length n_components). BLAS matmul per Arrow
    batch; the (n_components x dim) matrix ships once per task via closure."""
    comps_t = model.components.T.copy()  # (dim, k)
    mean = model.mean.copy()
    names = [f.name for f in df.schema.fields]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"`{out_col}` array<double>"]
    )

    def proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            y = (x - mean) @ comps_t
            out = pdf[names].copy()
            out[out_col] = [row.tolist() for row in y]
            yield out

    return df.mapInPandas(proj, schema=out_schema)


def reconstruction_error(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
) -> float:
    """Mean squared L2 reconstruction error — the quality scalar for choosing
    n_components. Same one-pass dim-bounded partial shape as fit_pca."""
    comps = model.components
    mean = model.mean

    def err(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col]])
            y = (x - mean) @ comps.T
            rec = y @ comps + mean
            sq = ((x - rec) ** 2).sum(axis=1)
            yield pd.DataFrame({"s": [float(sq.sum())], "n": [int(len(sq))]})

    rows = (
        df.select(F.col(vec_col).cast("array<double>").alias(vec_col))
        .mapInPandas(err, schema="s double, n long")
        .collect()
    )
    tot_n = sum(r["n"] for r in rows)
    if tot_n == 0:
        # fit_pca raises on empty input; returning 0.0 here would report a
        # PERFECT score for a model evaluated on nothing
        raise ValueError("reconstruction_error evaluated on an empty DataFrame")
    return float(sum(r["s"] for r in rows) / tot_n)
