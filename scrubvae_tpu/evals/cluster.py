"""Latent clustering with pickle caching
(/root/reference/src/scrubvae/eval/cluster.py): GMM (k-means++ init,
reg_covar 1e-5) and HDBSCAN, cached model + predictions per label.
"""

from __future__ import annotations

import functools
import pickle
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["gmm", "dbscan"]


def _check_model_exists(func):
    @functools.wraps(func)
    def wrapper(
        latents: np.ndarray,
        label: str = "cluster",
        path: Optional[str] = None,
        **kwargs,
    ):
        model_path = preds_path = None
        model_exists = False
        if path is not None:
            model_path = Path(f"{path}{label}_{func.__name__}.p")
            preds_path = Path(f"{path}{label}_{func.__name__}.npy")
            model_exists = model_path.exists()

        if model_exists:
            model = pickle.load(open(model_path, "rb"))
        else:
            model = func(latents=latents, **kwargs)
            if path is not None:
                pickle.dump(model, open(model_path, "wb"))

        if model_exists and preds_path is not None and preds_path.exists():
            k_pred = np.load(preds_path)
        else:
            k_pred = model.predict(latents)
            if path is not None:
                np.save(preds_path, k_pred)
        return k_pred, model

    return wrapper


@_check_model_exists
def gmm(latents, n_components: int = 25, covariance_type: str = "full"):
    from sklearn.mixture import GaussianMixture

    return GaussianMixture(
        n_components=n_components,
        covariance_type=covariance_type,
        max_iter=150,
        init_params="k-means++",
        reg_covar=1e-5,
        verbose=1,
    ).fit(latents)


def dbscan(
    latents,
    min_samples: int = 500,
    label: str = "cluster",
    path: str = "./results/",
):
    from sklearn.cluster import HDBSCAN

    k_pred = HDBSCAN(min_cluster_size=min_samples).fit_predict(latents)
    if path is not None:
        np.save(f"{path}{label}_sc_pred.npy", k_pred)
    return k_pred
