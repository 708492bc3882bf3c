#!/usr/bin/env python3
"""Replicate-with-remap fixture scaler (round-10 verdict #1).

Builds a K-times-larger copy of a driver fixture dir (default sf0.1)
under an output dir, with IDENTICAL schemas, so measured Spark scaling
slopes replace the task-dispatch-dominated sf0.01->sf0.1 ratios.

Replication rules (replica R = 0..K-1; R=0 is the identity copy):
- region/nation: copied once (fixed-size dims).
- customer/supplier/part/orders/lineitem: surrogate keys offset by
  R * OFFSET_<table> consistently across fact and dims, so referential
  joins hold and key cardinality scales xK with constant group sizes
  (the realistic growth shape: more pools/users/orders, same per-key
  history).
- events: event_id/user_id offset; ts kept (same window, xK traffic).
- documents: doc_id offset; every word gets a replica-specific
  alphabetic suffix EXCEPT the engine's stopwords, language-marker
  words, and the BM25 bench terms -- quality scores, langid, and term
  matches keep their distributions, while shingle/vocab spaces stay
  disjoint across replicas (no artificial cross-replica near-dup
  families, which would blow candidate pairs up x K^2 instead of xK).
  n_chars is recomputed from the salted text.
- embeddings: vec_id offset; vector dims rolled by R and sign-flipped
  by a replica-seeded mask -- norm-preserving, within-replica
  neighbor structure identical, cross-replica cosines ~0 (so near-dup
  and kNN-graph work scales xK, not x K^2).

Usage: scale_fixtures.py SRC_DIR OUT_DIR K
"""
import sys, os, json
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

# keep in sync with graft.functions.Text: stopwords + langMarkers,
# plus the t22 bench query terms
PRESERVE = {"the", "a", "of", "window", "hash", "data", "row",
            "query", "table", "spark", "stream",
            "dup", "vector", "merge", "scan"}

OFF = {"c_custkey": 100_000, "s_suppkey": 100_000, "p_partkey": 1_000_000,
       "o_orderkey": 10_000_000, "o_custkey": 100_000,
       "l_orderkey": 10_000_000, "l_partkey": 1_000_000,
       "l_suppkey": 100_000,
       "event_id": 10_000_000, "user_id": 100_000,
       "doc_id": 10_000_000, "vec_id": 10_000_000}


def salt_for(r):
    if r == 0:
        return ""
    s, n = "", r
    while True:
        s += chr(ord("b") + n % 25)  # letters b..z, never empty
        n //= 25
        if n == 0:
            return "q" + s


def offset_keys(tbl, r):
    cols = {}
    for name in tbl.schema.names:
        col = tbl.column(name)
        if name in OFF and r > 0:
            col = pc.add(col, pa.scalar(r * OFF[name], type=col.type))
        cols[name] = col
    return pa.table(cols, schema=tbl.schema)


def salt_docs(tbl, r):
    tbl = offset_keys(tbl, r)
    if r == 0:
        return tbl
    salt = salt_for(r)
    texts = tbl.column("text").to_pylist()
    out = [" ".join(w if w.lower() in PRESERVE else w + salt
                    for w in t.split()) if t is not None else None
           for t in texts]
    n_chars = [len(t) if t is not None else None for t in out]
    d = {n: tbl.column(n) for n in tbl.schema.names}
    d["text"] = pa.array(out, type=pa.string())
    d["n_chars"] = pa.array(n_chars, type=pa.int64())
    return pa.table(d, schema=tbl.schema)


def perturb_embeddings(tbl, r):
    tbl = offset_keys(tbl, r)
    if r == 0:
        return tbl
    emb = tbl.column("embedding").combine_chunks()
    arr = emb.chunk(0) if isinstance(emb, pa.ChunkedArray) else emb
    flat = arr.flatten().to_numpy(zero_copy_only=False)
    n = len(arr)
    dim = len(flat) // n
    m = flat.reshape(n, dim)
    rng = np.random.default_rng(42 + r)
    signs = rng.choice([-1.0, 1.0], size=dim).astype(np.float32)
    m2 = np.roll(m, r % dim, axis=1) * signs
    new_emb = pa.FixedSizeListArray.from_arrays(
        pa.array(m2.reshape(-1), type=pa.float32()), dim).cast(
        tbl.schema.field("embedding").type)
    d = {n2: tbl.column(n2) for n2 in tbl.schema.names}
    d["embedding"] = new_emb
    return pa.table(d, schema=tbl.schema)


def main(src, out, k):
    os.makedirs(out, exist_ok=True)
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        name = fname[:-8]
        t = pq.read_table(os.path.join(src, fname))
        if name in ("region", "nation"):
            reps = [t]
        elif name == "documents":
            reps = [salt_docs(t, r) for r in range(k)]
        elif name == "embeddings":
            reps = [perturb_embeddings(t, r) for r in range(k)]
        else:
            reps = [offset_keys(t, r) for r in range(k)]
        big = pa.concat_tables(reps)
        pq.write_table(big, os.path.join(out, fname),
                       compression="snappy")
        print(f"{name}: {t.num_rows} -> {big.num_rows} rows", flush=True)
    meta = {"src": src, "k": k}
    with open(os.path.join(out, "SCALE.json"), "w") as f:
        json.dump(meta, f)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
