"""Canned feature pipelines — reference architectures as fixed operator DAGs.

SURVEY §2.13: every TSFE-DL model is (windowed weighted agg | downsample |
normalize | gate/residual | global agg) composed in a DAG. These pipelines
re-express three representative shapes as deterministic feature extractors
over the same NumPy kernel vocabulary, one Arrow batch at a time
(``mapInPandas``, vectorized per doc, no learned weights — uniform/derivative
kernels stand in for the learned filters, cf. conv-as-filter SURVEY §2.9):

* ``ohshulih``  — 3×(full-pad conv → relu → maxpool/2) → EWMA scan → global
  stats  (reference models_keras.py:13-78: conv/pool stack → LSTM → MLP)
* ``shihaotian`` — 3 parallel conv branches (k=3/5/7) → concat(time) → global
  stats per branch  (reference models_keras.py:582-661)
* ``autoenc``   — downsample ×2 twice (avg-pool) → upsample back → residual
  vs input → reconstruction-error stats  (reference YildirimOzal
  models_keras.py:999-1091)

Output: one row per doc with a fixed-length feature struct — the engine twin
of the reference's penultimate-layer feature vector.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

PIPELINE_SCHEMA = ("doc_id string, f_mean double, f_var double, f_min double, "
                   "f_max double, f_last double, f_len int")


def _conv_full(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """'full' convolution, reference utils.py:107-130 (zero-pad k-1 each end)."""
    return np.convolve(x, w, mode="full")


def _relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def _maxpool2(x: np.ndarray) -> np.ndarray:
    n = (x.shape[0] // 2) * 2
    if n == 0:
        return x
    return x[:n].reshape(-1, 2).max(axis=1)


def _avgpool2(x: np.ndarray) -> np.ndarray:
    n = (x.shape[0] // 2) * 2
    if n == 0:
        return x
    return x[:n].reshape(-1, 2).mean(axis=1)


def _ewma(x: np.ndarray, alpha: float = 0.125) -> np.ndarray:
    # sequential scan ≙ the LSTM pass; vectorized via the log-space trick is
    # numerically different, so keep the honest O(n) loop in C via lfilter-
    # style recursion written with np.frompyfunc-free cumulative products:
    out = np.empty_like(x, dtype=np.float64)
    acc = 0.0
    first = True
    for i in range(x.shape[0]):  # n is already pooled down 8x; short
        acc = x[i] if first else alpha * x[i] + (1 - alpha) * acc
        first = False
        out[i] = acc
    return out


def run_pipeline(x: np.ndarray, pipeline: str) -> np.ndarray:
    """One doc through the named pipeline → 1-D feature sequence."""
    x = np.asarray(x, dtype=np.float64)
    if pipeline == "ohshulih":
        h = x
        for k in (3, 3, 3):
            h = _maxpool2(_relu(_conv_full(h, np.full(k, 1.0 / k))))
        return _ewma(h)
    if pipeline == "shihaotian":
        branches = [_conv_full(x, np.full(k, 1.0 / k)) for k in (3, 5, 7)]
        return np.concatenate(branches)  # concat along time axis (:645)
    if pipeline == "autoenc":
        code = _avgpool2(_avgpool2(x))            # encoder: ÷4
        recon = np.repeat(np.repeat(code, 2), 2)  # decoder: ×4
        m = min(recon.shape[0], x.shape[0])
        return x[:m] - recon[:m]                  # residual = recon error
    raise ValueError(pipeline)


def pipeline_features(df: DataFrame, pipeline: str = "ohshulih",
                      tokens_col: str = "tokens") -> DataFrame:
    """Per-doc global stats of the pipeline's output sequence (the engine twin
    of the reference model's feature vector)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                x = np.asarray(pdf[tokens_col].values[i], dtype=np.float64)
                if x.shape[0] == 0:
                    continue
                h = run_pipeline(x, pipeline)
                if h.shape[0] == 0:
                    continue
                rows.append({
                    "doc_id": pdf["doc_id"].values[i],
                    "f_mean": float(h.mean()),
                    "f_var": float(h.var()),
                    "f_min": float(h.min()),
                    "f_max": float(h.max()),
                    "f_last": float(h[-1]),
                    "f_len": int(h.shape[0]),
                })
            if rows:
                yield pd.DataFrame(rows)

    return df.select("doc_id", tokens_col).mapInPandas(run, PIPELINE_SCHEMA)
