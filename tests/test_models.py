"""SURVEY S10 — weekly model pipeline: walk-forward purity vs a numpy
OLS twin, artifact-store round-trip, and the no-leak guarantee."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from housing_crawler_spark.queries_etl_pipeline import _raw_ads_df
from housing_crawler_spark.sources.models import (
    RIDGE_LAMBDA,
    apply_weekly_models,
    read_models,
    tag_ads,
    tag_ads_multi,
    train_weekly_models,
    train_weekly_models_multi,
    write_models,
)


def _fit_numpy(rows, wk):
    train = [(r["size_sqm"], math.log(r["price_euros"])) for r in rows if r["wk"] < wk]
    x = np.array([t[0] for t in train], dtype=float)
    y = np.array([t[1] for t in train], dtype=float)
    n = len(x)
    denom = n * (x * x).sum() - x.sum() ** 2
    slope = (n * (x * y).sum() - x.sum() * y.sum()) / denom
    return slope, (y.sum() - slope * x.sum()) / n


def test_walk_forward_matches_numpy_twin(spark, sf_smoke):
    tagged = tag_ads(_raw_ads_df(spark, sf_smoke))
    rows = tagged.collect()
    models = {m["wk"]: m for m in train_weekly_models(tagged).collect()}
    assert len(models) > 5
    weeks = sorted(models)
    # every model = a direct OLS on strictly-earlier rows
    for wk in (weeks[0], weeks[len(weeks) // 2], weeks[-1]):
        slope, intercept = _fit_numpy(rows, wk)
        assert abs(models[wk]["slope"] - slope) < 1e-9, wk
        assert abs(models[wk]["intercept"] - intercept) < 1e-9, wk
        assert models[wk]["n_train"] == sum(1 for r in rows if r["wk"] < wk)
    # the earliest week present has no earlier data → no model (no leak)
    first_wk = min(r["wk"] for r in rows)
    assert first_wk not in models


def _fit_numpy_ridge(rows, wk, lam=RIDGE_LAMBDA):
    """Reference solve for the k=3 ridge with unpenalized intercept:
    b = (Xc'Xc + lam*I)^-1 Xc'yc on centered data, b0 = ybar - xbar.b
    — the exact optimum of ||y - b0 - Xb||^2 + lam*||b||^2."""
    train = [r for r in rows if r["wk"] < wk]
    X = np.array([[r["x1"], r["x2"], r["x3"]] for r in train], dtype=float)
    y = np.array([r["y"] for r in train], dtype=float)
    Xc, yc = X - X.mean(axis=0), y - y.mean()
    b = np.linalg.solve(Xc.T @ Xc + lam * np.eye(3), Xc.T @ yc)
    return float(y.mean() - X.mean(axis=0) @ b), b


def test_multi_ridge_matches_numpy_twin(spark, sf_smoke):
    """The shared Cramer expression (ridge3_exprs) must agree with
    numpy's linalg.solve on the same walk-forward training sets — the
    closed form's numerical ACCURACY, complementing the v3 oracle's
    cross-engine bit-parity."""
    tagged = tag_ads_multi(_raw_ads_df(spark, sf_smoke))
    rows = tagged.collect()
    models = {m["wk"]: m for m in train_weekly_models_multi(tagged).collect()}
    assert len(models) > 5
    weeks = sorted(models)
    for wk in (weeks[0], weeks[len(weeks) // 3], weeks[-1]):
        b0, b = _fit_numpy_ridge(rows, wk)
        got = models[wk]
        assert abs(got["b0"] - b0) < 1e-7, wk
        for i in range(3):
            assert abs(got[f"b{i + 1}"] - b[i]) < 1e-7, (wk, i)
        assert got["n_train"] == sum(1 for r in rows if r["wk"] < wk)
    # walk-forward purity: earliest week has no model (no leak)
    assert min(r["wk"] for r in rows) not in models
    # the ridge actually predicts: in-sample R^2 of the last week's
    # model on its own training set must beat the mean-only baseline
    wk = weeks[-1]
    b0, b = _fit_numpy_ridge(rows, wk)
    train = [r for r in rows if r["wk"] < wk]
    X = np.array([[r["x1"], r["x2"], r["x3"]] for r in train], dtype=float)
    y = np.array([r["y"] for r in train], dtype=float)
    resid = y - (b0 + X @ b)
    assert (resid**2).sum() < ((y - y.mean()) ** 2).sum()


def test_artifact_roundtrip_and_apply(spark, sf_smoke, tmp_path):
    tagged = tag_ads(_raw_ads_df(spark, sf_smoke))
    models = train_weekly_models(tagged)
    path = str(tmp_path / "models.parquet")
    write_models(models, path)
    back = read_models(spark, path)
    assert {tuple(r) for r in back.collect()} == {tuple(r) for r in models.collect()}

    preds = apply_weekly_models(tagged, back).collect()
    assert len(preds) > 0
    model_weeks = {m["wk"] for m in models.collect()}
    assert {p["wk"] for p in preds} <= model_weeks
    for p in preds[:50]:
        want = math.exp(p["intercept"] + p["slope"] * p["size_sqm"])
        assert abs(p["pred"] - want) < 1e-6


def test_k6_gauss_ridge_matches_numpy_twin(spark, sf_smoke):
    """The Gaussian-elimination stage chain (gauss_ridge_stages, k=6)
    must agree with numpy's linalg.solve on the same walk-forward
    training sets — accuracy of the staged solve, complementing v5's
    cross-engine bit-parity oracle."""
    from housing_crawler_spark.queries_models import _K6_MIN_TRAIN, _tagged_k6
    from housing_crawler_spark.sources.models import train_weekly_models_k

    k = 6
    tagged = _tagged_k6(spark, sf_smoke)
    rows = tagged.collect()
    models = {
        m["wk"]: m
        for m in train_weekly_models_k(tagged, k, min_train=_K6_MIN_TRAIN).collect()
    }
    assert len(models) > 5
    weeks = sorted(models)
    for wk in (weeks[0], weeks[len(weeks) // 2], weeks[-1]):
        train = [r for r in rows if r["wk"] < wk]
        X = np.array([[r[f"x{i}"] for i in range(1, k + 1)] for r in train], float)
        y = np.array([r["y"] for r in train], float)
        Xc, yc = X - X.mean(axis=0), y - y.mean()
        b = np.linalg.solve(Xc.T @ Xc + RIDGE_LAMBDA * np.eye(k), Xc.T @ yc)
        b0 = float(y.mean() - X.mean(axis=0) @ b)
        got = models[wk]
        assert abs(got["b0"] - b0) < 1e-6, wk
        for i in range(k):
            assert abs(got[f"b{i + 1}"] - b[i]) < 1e-6, (wk, i)
        assert got["n_train"] == len(train)
    # lstsq cross-check on the augmented (1|X) system at lam→its ridge
    # optimum: residuals must beat the mean-only baseline (model is real)
    wk = weeks[-1]
    train = [r for r in rows if r["wk"] < wk]
    X = np.array([[r[f"x{i}"] for i in range(1, k + 1)] for r in train], float)
    y = np.array([r["y"] for r in train], float)
    got = models[wk]
    pred = got["b0"] + X @ np.array([got[f"b{i}"] for i in range(1, k + 1)])
    assert ((y - pred) ** 2).sum() < ((y - y.mean()) ** 2).sum()
