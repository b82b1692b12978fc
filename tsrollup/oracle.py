"""Single-node NumPy oracle for the full rollup semantics.

Pytest compares Spark output against this module under exact equality
(BASELINE per-row token-array-equality invariant) — the analog of the
reference's save/reload determinism tests (``test/test_keras.py:84-91``).
The Spark UDFs import the SAME kernels (``tsrollup.kernels``), so parity is
by construction; the oracle differs only in its driver loop (plain Python
over rows instead of Arrow batches on executors).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from . import BASE_WINDOW, TIER_FACTOR
from .kernels import base_window_partials, derive_stats, gap_fill, tier_chain

ROLLUP_COLUMNS = [
    "doc_id", "source", "tier", "window_start",
    "count", "sum", "sumsq", "min", "max",
    "mean", "var", "spec_energy", "spec_mass", "spec_centroid", "band_energy",
]


def rollup_doc(doc_id: str, source: str, tokens: np.ndarray,
               gap_mask: np.ndarray | None = None,
               window: int = BASE_WINDOW,
               tiers: dict[str, int] = TIER_FACTOR) -> list[dict]:
    """All retention tiers for one document. Returns one dict per rolled-up point."""
    filled = gap_fill(np.asarray(tokens, dtype=np.int32), gap_mask)
    base = base_window_partials(filled, window)
    chain = tier_chain(base, tiers)
    rows: list[dict] = []
    for tier, p in chain.items():
        d = derive_stats(p)
        nw = p["count"].shape[0]
        for i in range(nw):
            rows.append({
                "doc_id": doc_id,
                "source": source,
                "tier": tier,
                "window_start": int(p["window_start"][i]),
                "count": int(p["count"][i]),
                "sum": int(p["sum"][i]),
                "sumsq": int(p["sumsq"][i]),
                "min": int(p["min"][i]),
                "max": int(p["max"][i]),
                "mean": float(d["mean"][i]),
                "var": float(d["var"][i]),
                "spec_energy": float(p["spec_energy"][i]),
                "spec_mass": float(p["spec_mass"][i]),
                "spec_centroid": float(d["spec_centroid"][i]),
                "band_energy": p["band_energy"][i].tolist(),
            })
    return rows


def rollup_table(rows, window: int = BASE_WINDOW,
                 tiers: dict[str, int] = TIER_FACTOR) -> pd.DataFrame:
    """Oracle rollup of an iterable of row dicts/records with keys
    (doc_id, source, tokens[, gap_mask])."""
    out: list[dict] = []
    for r in rows:
        mask = r.get("gap_mask")
        out.extend(rollup_doc(
            r["doc_id"], r["source"],
            np.asarray(r["tokens"], dtype=np.int32),
            None if mask is None else np.asarray(mask, dtype=bool),
            window=window, tiers=tiers))
    df = pd.DataFrame(out, columns=ROLLUP_COLUMNS)
    return df.sort_values(["tier", "doc_id", "window_start"]).reset_index(drop=True)
