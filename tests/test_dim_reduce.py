"""Tests for distributed PCA (operators/dim_reduce.py): correctness vs a
local numpy PCA, determinism across partitionings, projection funnel value
vs naive prefix truncation on structured vectors."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from oaim_sandbox_spark.operators.dim_reduce import (
    PCAModel,
    fit_pca,
    project_pca,
    reconstruction_error,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _local_matrix(df, vec_col="embedding"):
    rows = df.select(F.col(vec_col).cast("array<double>")).collect()
    return np.asarray([r[0] for r in rows])


def test_fit_matches_local_numpy_pca(spark, emb):
    model = fit_pca(emb, n_components=8)
    x = _local_matrix(emb)
    cov = np.cov(x, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    want = evecs[:, np.argsort(evals)[::-1][:8]].T
    # eigenvectors match up to sign
    for i in range(8):
        dot = abs(float(np.dot(model.components[i], want[i])))
        assert dot == pytest.approx(1.0, abs=1e-8), f"component {i} mismatch ({dot})"
    assert model.mean == pytest.approx(x.mean(axis=0), abs=1e-10)


def test_components_orthonormal_and_ratio_sane(emb):
    model = fit_pca(emb, n_components=8)
    g = model.components @ model.components.T
    assert np.allclose(g, np.eye(8), atol=1e-8)
    r = model.explained_variance_ratio
    assert (r >= -1e-12).all() and (np.diff(r) <= 1e-12).all()
    assert 0.0 < float(r.sum()) <= 1.0 + 1e-9


def test_fit_deterministic_across_partitionings(emb):
    a = fit_pca(emb.repartition(1), n_components=4)
    b = fit_pca(emb.repartition(13), n_components=4)
    assert np.allclose(a.components, b.components, atol=1e-8)
    assert np.allclose(a.mean, b.mean, atol=1e-10)


def test_project_shape_and_values(spark, emb):
    model = fit_pca(emb, n_components=4)
    out = project_pca(emb, model).select("vec_id", "pca_vec").collect()
    assert len(out) == emb.count()
    x = _local_matrix(emb)
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    want = {i: ((v - model.mean) @ model.components.T) for i, v in zip(ids, x)}
    for r in out[:50]:
        assert np.asarray(r["pca_vec"]) == pytest.approx(want[r["vec_id"]], abs=1e-8)


def test_reconstruction_error_decreases_with_components(emb):
    errs = [reconstruction_error(emb, fit_pca(emb, n_components=k)) for k in (2, 8, 32)]
    assert errs[0] > errs[1] > errs[2] >= 0.0


def test_pca_beats_prefix_truncation_on_structured_vectors(spark):
    # vectors whose information lives in the BACK dims: prefix truncation
    # (matryoshka without matryoshka training) keeps noise, PCA finds the
    # signal subspace regardless of coordinate order.
    n, dim = 400, 32
    df = spark.range(n).selectExpr(
        "id AS vec_id",
        f"transform(sequence(0, {dim - 1}), i -> CASE WHEN i >= {dim - 4} "
        "THEN 5.0 * sin((id % 8) * 1.3 + i) "
        "ELSE 0.05 * (cast(hash(id, i) as double) / 2147483647.0) END) AS embedding",
    )
    model = fit_pca(df, n_components=4)
    x = _local_matrix(df)
    xp = (x - model.mean) @ model.components.T
    var_pca = float(xp.var(axis=0).sum())
    var_prefix = float(x[:, :4].var(axis=0).sum())
    assert var_pca > 10 * var_prefix


def test_model_roundtrip_fields():
    m = PCAModel(components=np.eye(3)[:2], mean=np.zeros(3))
    assert m.n_components == 2
