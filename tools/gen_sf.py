"""Generate a driver-shaped sf1.0 (or larger) star schema for perf work.

The driver's round-end MEASUREMENT may run bench.py at a scale factor above
the committed fixtures (BENCH_r05.json records sf=1.0), but /root/testdata is
read-only and only ships sf{0.001,0.01,0.1}. This tool builds a
distribution-matched sf1.0 locally so optimizations can be measured at the
scale the driver grades:

* region/nation copied verbatim (fixed-size dimensions),
* customer/supplier/part/orders/lineitem/events replicated K=10x from sf0.1
  with per-replica key offsets (o_custkey / l_partkey / l_suppkey / user_id
  offset consistently so join fanouts and group sizes are preserved) and
  deterministic timestamp jitter on events (same 30-day window, 10x density,
  no mass ties — matches the driver's fixed-window scaling: sf0.01 and sf0.1
  share the same ts range),
* documents regenerated at 50k docs from the empirical sf0.1 word/length/
  lang distributions (31-word vocab, 10-100 word docs, 20 uniform sources)
  with ~0.5% planted near-duplicate pairs (5% word mutation) and a few exact
  dups — replicating texts verbatim would plant 10-deep duplicate groups and
  quadratically inflate every near-dup pair generator, which the driver's
  data does not do,
* embeddings regenerated at 20k unit-norm 64-dim vectors, labels 0..9
  (sf0.1's embeddings are random unit vectors: max sampled cosine 0.6,
  cluster centers ~0).

Row counts at sf1.0 follow the observed per-table scaling law:
lineitem 6M, orders 1.5M, events 1M, customer 150k, part 200k, supplier 10k,
documents 50k, embeddings 20k.

Usage::

    python tools/gen_sf.py /root/sfgen/sf1.0 [--k 10] [--src /root/testdata/sf0.1]

Deterministic (seed fixed); one parquet file per table, pyarrow-default row
groups, like the shipped fixtures.
"""

from __future__ import annotations

import argparse
import os
import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42


def _read(src: str, name: str) -> pd.DataFrame:
    return pq.read_table(os.path.join(src, name + ".parquet")).to_pandas()


def _write(out: str, name: str, df: pd.DataFrame) -> None:
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   os.path.join(out, name + ".parquet"),
                   coerce_timestamps="us", allow_truncated_timestamps=True)


def _replicate(df: pd.DataFrame, k: int, offsets: dict[str, int]) -> pd.DataFrame:
    parts = []
    for r in range(k):
        rep = df.copy()
        for col, base in offsets.items():
            rep[col] = rep[col] + r * base
        parts.append(rep)
    return pd.concat(parts, ignore_index=True)


def gen_documents(n_docs: int, src_docs: pd.DataFrame, rng: np.random.Generator) -> pd.DataFrame:
    words = src_docs.text.str.split()
    vocab, counts = np.unique(np.concatenate([np.asarray(w, dtype=object) for w in words]),
                              return_counts=True)
    probs = counts / counts.sum()
    lengths_emp = words.str.len().to_numpy()
    langs, lang_counts = np.unique(src_docs.lang.to_numpy(), return_counts=True)
    lang_probs = lang_counts / lang_counts.sum()
    n_sources = src_docs.source.nunique()

    lengths = rng.choice(lengths_emp, size=n_docs)
    texts: list[str] = []
    flat = rng.choice(vocab, size=int(lengths.sum()), p=probs)
    pos = 0
    for ln in lengths:
        texts.append(" ".join(flat[pos:pos + ln]))
        pos += ln
    # planted near-dup pairs: ~0.5% of docs get a 5%-mutated twin
    n_pairs = max(1, n_docs // 200)
    twins = rng.choice(n_docs - n_pairs, size=n_pairs, replace=False)
    for i, src_i in enumerate(twins):
        toks = texts[src_i].split()
        mut = rng.random(len(toks)) < 0.05
        toks = [rng.choice(vocab) if m else t for t, m in zip(toks, mut)]
        texts[n_docs - n_pairs + i] = " ".join(toks)
    # a few exact dups, like the fixture's 8-in-5000
    n_exact = max(1, n_docs // 625)
    for i, src_i in enumerate(rng.choice(n_docs // 2, size=n_exact, replace=False)):
        texts[n_docs // 2 + i] = texts[src_i]
    return pd.DataFrame({
        "doc_id": np.arange(n_docs, dtype=np.int64),
        "text": texts,
        "lang": rng.choice(langs, size=n_docs, p=lang_probs),
        "source": np.array([f"src{i % n_sources}" for i in range(n_docs)], dtype=object),
        "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
    })


def gen_embeddings(n: int, dim: int, rng: np.random.Generator) -> pd.DataFrame:
    X = rng.standard_normal((n, dim)).astype(np.float32)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype=np.int64),
        "embedding": [row for row in X],
        "label": rng.integers(0, 10, size=n).astype(np.int32),
    })


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--k", type=int, default=10, help="replication factor vs --src")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    rng = np.random.default_rng(SEED)
    os.makedirs(args.out, exist_ok=True)

    for name in ("region", "nation"):
        shutil.copy(os.path.join(args.src, name + ".parquet"),
                    os.path.join(args.out, name + ".parquet"))

    cust = _read(args.src, "customer")
    n_cust = len(cust)
    _write(args.out, "customer", _replicate(cust, args.k, {"c_custkey": n_cust}))

    supp = _read(args.src, "supplier")
    _write(args.out, "supplier", _replicate(supp, args.k, {"s_suppkey": len(supp)}))

    part = _read(args.src, "part")
    _write(args.out, "part", _replicate(part, args.k, {"p_partkey": len(part)}))

    orders = _read(args.src, "orders")
    okey_base = int(orders.o_orderkey.max()) + 1
    _write(args.out, "orders", _replicate(orders, args.k, {
        "o_orderkey": okey_base, "o_custkey": n_cust}))

    li = _read(args.src, "lineitem")
    _write(args.out, "lineitem", _replicate(li, args.k, {
        "l_orderkey": okey_base, "l_partkey": len(part), "l_suppkey": len(supp)}))

    ev = _read(args.src, "events")
    n_ev = len(ev)
    n_users = int(ev.user_id.max()) + 1
    reps = []
    for r in range(args.k):
        rep = ev.copy()
        rep["event_id"] = rep["event_id"] + r * n_ev
        rep["user_id"] = rep["user_id"] + r * n_users
        if r > 0:  # jitter within the inter-event spacing so ts stays ordered-ish, no 10-deep ties
            jit = rng.integers(-13_000_000, 13_000_000, size=n_ev)  # microseconds
            rep["ts"] = rep["ts"] + pd.to_timedelta(jit, unit="us")
        reps.append(rep)
    evk = pd.concat(reps, ignore_index=True).sort_values("ts", kind="stable")
    evk = evk.reset_index(drop=True)
    _write(args.out, "events", evk)

    docs = _read(args.src, "documents")
    _write(args.out, "documents", gen_documents(len(docs) * args.k, docs, rng))

    emb = _read(args.src, "embeddings")
    dim = len(emb.embedding.iloc[0])
    _write(args.out, "embeddings", gen_embeddings(len(emb) * args.k, dim, rng))

    for t in ("customer", "supplier", "part", "orders", "lineitem", "events",
              "documents", "embeddings"):
        md = pq.ParquetFile(os.path.join(args.out, t + ".parquet")).metadata
        print(t, md.num_rows, "rows,", md.num_row_groups, "row groups")
    return 0


if __name__ == "__main__":
    main()
