"""Canned feature pipelines — reference architectures as fixed operator DAGs.

SURVEY §2.13: every TSFE-DL model is (windowed weighted agg | downsample |
normalize | gate/residual | global agg) composed in a DAG. These pipelines
re-express five representative shapes as deterministic feature extractors
over the same NumPy kernel vocabulary, one Arrow batch at a time
(``mapInPandas``, no learned weights — uniform/derivative kernels stand in
for the learned filters, cf. conv-as-filter SURVEY §2.9):

* ``ohshulih``  — 3×(full-pad conv → relu → maxpool/2) → EWMA scan → global
  stats  (reference models_keras.py:13-78: conv/pool stack → LSTM → MLP)
* ``shihaotian`` — 3 parallel conv branches (k=3/5/7) → concat(time) → global
  stats per branch  (reference models_keras.py:582-661)
* ``autoenc``   — downsample ×2 twice (avg-pool) → upsample back → residual
  vs input → reconstruction-error stats  (reference YildirimOzal
  models_keras.py:999-1091)
* ``caiwenjuan`` — inception-style parallel branches (k=1/3/5 convs +
  maxpool) each SE-gated by sigmoid(branch mean), concatenated
  (reference DDNN CaiWenjuan models_keras.py:1094-1166: dense concat +
  squeeze-excitation over channels)
* ``kimmingu``  — ensemble of 3 conv→relu→maxpool branches averaged
  elementwise (reference KimMinGu CNN ensemble models_keras.py:1169-1242)

Execution: the per-doc conv/pool chains run in C (np.convolve / reshape
reductions); the EWMA recurrence is batched ACROSS docs (one vectorized loop
over the time axis of a padded (n_docs, max_len) matrix — no per-element
Python, bit-identical to the per-doc scalar fold since the ops are
elementwise); row assembly is columnar (preallocated arrays, one DataFrame
per Arrow batch).

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

PIPELINES = ("ohshulih", "shihaotian", "autoenc", "caiwenjuan", "kimmingu")


def _conv_full(x: np.ndarray, w: np.ndarray) -> np.ndarray:
    """'full' convolution, reference utils.py:107-130 (zero-pad k-1 each end)."""
    return np.convolve(x, w, mode="full")


def _relu(x: np.ndarray) -> np.ndarray:
    return np.maximum(x, 0.0)


def _sigmoid(x: float) -> float:
    return 1.0 / (1.0 + np.exp(-x))


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
    """Per-doc EWMA scan (the oracle form; the Spark path uses the batched
    _ewma_batch, bit-identical — tested)."""
    out = np.empty_like(x, dtype=np.float64)
    acc = 0.0
    first = True
    for i in range(x.shape[0]):
        acc = x[i] if first else alpha * x[i] + (1 - alpha) * acc
        first = False
        out[i] = acc
    return out


def _ewma_batch(seqs: list[np.ndarray], alpha: float = 0.125) -> list[np.ndarray]:
    """EWMA over many ragged sequences at once: one vectorized recurrence over
    the time axis of a zero-padded (n_docs, max_len) matrix — the per-step op
    ``acc = α·x + (1−α)·acc`` is elementwise, so each doc's lane computes the
    exact same float sequence as the scalar fold (padding lanes are sliced
    away afterwards)."""
    if not seqs:
        return []
    lens = np.array([s.shape[0] for s in seqs], dtype=np.intp)
    mx = int(lens.max())
    buf = np.zeros((len(seqs), mx), dtype=np.float64)
    for i, s in enumerate(seqs):
        buf[i, :lens[i]] = s
    out = np.empty_like(buf)
    out[:, 0] = buf[:, 0]
    acc = buf[:, 0].copy()
    for t in range(1, mx):
        acc = alpha * buf[:, t] + (1 - alpha) * acc
        out[:, t] = acc
    # lanes shorter than t hold garbage past their length — sliced away here;
    # out[:, 0] is the first element for every lane, matching the scalar fold
    return [out[i, :lens[i]] for i in range(len(seqs))]


def _pre_pipeline(x: np.ndarray, pipeline: str) -> np.ndarray:
    """Everything before the (optional) EWMA stage — per-doc C-level ops."""
    if pipeline == "ohshulih":
        h = x
        for k in (3, 3, 3):
            h = _maxpool2(_relu(_conv_full(h, np.full(k, 1.0 / k))))
        return h
    if pipeline == "shihaotian":
        branches = [_conv_full(x, np.full(k, 1.0 / k)) for k in (3, 5, 7)]
        return np.concatenate(branches)  # concat along time axis (:645)
    if pipeline == "autoenc":
        code = _avgpool2(_avgpool2(x))            # encoder: ÷4
        recon = np.repeat(np.repeat(code, 2), 2)  # decoder: ×4
        m = min(recon.shape[0], x.shape[0])
        return x[:m] - recon[:m]                  # residual = recon error
    if pipeline == "caiwenjuan":
        # inception-style parallel branches + SE gating (models_keras.py:
        # 1094-1166: dense concat of conv paths, squeeze-excitation scale)
        branches = [
            x.astype(np.float64),                       # k=1 conv (identity)
            _conv_full(x, np.full(3, 1.0 / 3)),
            _conv_full(x, np.full(5, 1.0 / 5)),
            _maxpool2(x.astype(np.float64)),            # pooling path
        ]
        gated = [b * _sigmoid(float(b.mean())) if b.shape[0] else b
                 for b in branches]                     # SE: scale by squeeze
        return np.concatenate(gated)
    if pipeline == "kimmingu":
        # CNN ensemble (models_keras.py:1169-1242): n branches of the same
        # conv→relu→pool shape, predictions averaged
        branches = [_maxpool2(_relu(_conv_full(x, np.full(k, 1.0 / k))))
                    for k in (3, 5, 7)]
        m = min(b.shape[0] for b in branches)
        if m == 0:
            return np.empty(0, np.float64)
        stack = np.stack([b[:m] for b in branches])
        return stack.mean(axis=0)                       # ensemble average
    raise ValueError(pipeline)


_NEEDS_EWMA = {"ohshulih"}


def run_pipeline(x: np.ndarray, pipeline: str) -> np.ndarray:
    """One doc through the named pipeline → 1-D feature sequence (the per-doc
    oracle; tests compare the batched Spark path against this)."""
    x = np.asarray(x, dtype=np.float64)
    h = _pre_pipeline(x, pipeline)
    return _ewma(h) if pipeline in _NEEDS_EWMA and h.shape[0] else h


def pipeline_features(df: DataFrame, pipeline: str = "ohshulih",
                      tokens_col: str = "tokens") -> DataFrame:
    """Per-doc global stats of the pipeline's output sequence (the engine twin
    of the reference model's feature vector). Columnar assembly + batched
    EWMA; per-doc stats keep np.mean/np.var float semantics so the output
    bit-matches run_pipeline."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hs: list[np.ndarray] = []
            ids: list[str] = []
            for i in range(len(pdf)):
                x = np.asarray(pdf[tokens_col].values[i], dtype=np.float64)
                if x.shape[0] == 0:
                    continue
                h = _pre_pipeline(x, pipeline)
                if h.shape[0] == 0:
                    continue
                hs.append(h)
                ids.append(pdf["doc_id"].values[i])
            if not hs:
                continue
            if pipeline in _NEEDS_EWMA:
                hs = _ewma_batch(hs)
            n = len(hs)
            out = {
                "doc_id": np.asarray(ids, dtype=object),
                "f_mean": np.empty(n), "f_var": np.empty(n),
                "f_min": np.empty(n), "f_max": np.empty(n),
                "f_last": np.empty(n),
                "f_len": np.empty(n, dtype=np.int32),
            }
            for i, h in enumerate(hs):
                out["f_mean"][i] = h.mean()
                out["f_var"][i] = h.var()
                out["f_min"][i] = h.min()
                out["f_max"][i] = h.max()
                out["f_last"][i] = h[-1]
                out["f_len"][i] = h.shape[0]
            yield pd.DataFrame(out)

    return df.select("doc_id", tokens_col).mapInPandas(run, PIPELINE_SCHEMA)
