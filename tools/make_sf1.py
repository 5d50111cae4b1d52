#!/usr/bin/env python3
"""Synthesize an sf1 corpus (10x the sf0.1 bench corpus) for the full-suite
scale gate: Verify + check.py + Bench at a third operating point.

Driver-side tooling (like check.py) -- NOT part of the shipped library.

Construction: each table is 10 stacked copies of the sf0.1 table with
per-copy key offsets chosen so the copies' key spaces never collide.
Copy 0 is the untouched original, so any literal key referenced by a
query (ANN query vectors, eval-doc ids) still resolves. Foreign keys are
offset consistently (lineitem.l_orderkey tracks orders.o_orderkey, etc.)
so join selectivity and referential integrity match the driver corpus.

Deliberate distribution choices:
 - documents: odd copies append a short ' r<k>' suffix (near-dups for the
   MinHash/SimHash family), even copies are exact duplicates (exact-dedup
   groups of 5). n_chars tracks the suffix so n_chars == length(text)
   stays invariant.
 - embeddings: copies k>0 get a deterministic per-(vec,copy,dim) jitter of
   at most 5e-3 so replicated vectors are near- but not exact-duplicates:
   cosine top-k stays tie-free (exact ties would make rank order an
   engine coin-flip) while the LSH/SemDeDup family sees real near-dup
   groups. Jitter is hash-free arithmetic -- no RNG, fully reproducible.
 - events: ts is copied bit-for-bit (pyarrow preserves the TIMESTAMP(NANOS)
   physical type the driver writes; Spark reads it via Tables.events'
   nanosAsLong path, DuckDB truncates to micros -- same as sf0.1);
   user_id is offset per copy, so the corpus has 10x users each with the
   sf0.1 per-user event pattern (streaming state scales in keys, not in
   per-key history).

Usage: python3 tools/make_sf1.py [outDir]   (default /tmp/graft_sf1)
Env:   GRAFT_SFX_K (copies, default 10), GRAFT_SFX_SRC (default sf0.1) --
       GRAFT_SFX_K=100 yields the sf10 (100x bench) corpus and
       GRAFT_SFX_K=1000 the sf100 (1000x) corpus; strides keep key spaces
       disjoint up to K=1000 (max derived key ~1e10; every oracle-side
       arithmetic on keys stays far below 2^62).

Copies stream through one ParquetWriter per table (a row group per copy)
instead of concat-then-write: at K=1000 the offset columns alone would
otherwise hold ~14 GB before the first byte hits disk. The writer is
opened with the source table's arrow schema, so events.ts keeps its
TIMESTAMP(NANOS) physical type exactly as pq.write_table preserved it.
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = os.environ.get("GRAFT_SFX_SRC", "/root/testdata/sf0.1")
K = int(os.environ.get("GRAFT_SFX_K", "10"))

STRIDE = {
    "custkey": 1_000_000,
    "orderkey": 10_000_000,
    "partkey": 1_000_000,
    "suppkey": 100_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}


def read(name):
    return pq.read_table(os.path.join(SRC, f"{name}.parquet"))


def write(out_dir, name, copies):
    """Stream an iterable of same-schema tables into one parquet file."""
    path = os.path.join(out_dir, f"{name}.parquet")
    writer = None
    rows = 0
    try:
        for t in copies:
            if writer is None:
                writer = pq.ParquetWriter(path, t.schema)
            writer.write_table(t)
            rows += t.num_rows
    finally:
        # close even when a copy generator raises mid-stream (otherwise the
        # open writer leaks and a truncated file is left behind); an empty
        # iterable never opened one
        if writer is not None:
            writer.close()
    if writer is None:
        raise ValueError(f"no copies produced for table {name}")
    print(f"  {name}: {rows} rows")


def offset_col(table, col, delta):
    i = table.column_names.index(col)
    arr = pa.compute.add(table.column(col), pa.scalar(delta, type=table.column(col).type))
    return table.set_column(i, col, arr)


def replicate(table, offsets):
    """K stacked copies; offsets = {col: stride} applied as k*stride."""
    for k in range(K):
        t = table
        for col, stride in offsets.items():
            if k:
                t = offset_col(t, col, k * stride)
        yield t


def documents_sf1(table):
    # tolerate a GRAFT_SFX_COLS projection: doc_id+text are required (the
    # near-dup suffix construction needs them), lang/source/n_chars ride
    # along only when present — in their source column order
    cols = table.column_names
    texts = table.column("text").to_pylist()
    doc_ids = table.column("doc_id").to_pylist()
    n_chars = table.column("n_chars").to_pylist() if "n_chars" in cols else None
    for k in range(K):
        if k % 2 == 1:
            suffix = f" r{k}"
            t_texts = pa.array([t + suffix for t in texts], type=pa.string())
            t_chars = (pa.array([n + len(suffix) for n in n_chars], type=pa.int64())
                       if n_chars is not None else None)
        else:
            t_texts = pa.array(texts, type=pa.string())
            t_chars = pa.array(n_chars, type=pa.int64()) if n_chars is not None else None
        t_ids = pa.array([d + k * STRIDE["doc_id"] for d in doc_ids], type=pa.int64())
        out = {}
        for c in cols:
            if c == "doc_id":
                out[c] = t_ids
            elif c == "text":
                out[c] = t_texts
            elif c == "n_chars":
                out[c] = t_chars
            else:
                out[c] = table.column(c)
        yield pa.table(out)


def embeddings_sf1(table):
    ids = np.asarray(table.column("vec_id").to_pylist(), dtype=np.int64)
    labels = table.column("label") if "label" in table.column_names else None
    emb = np.array(table.column("embedding").to_pylist(), dtype=np.float64)
    n, dim = emb.shape
    dims = np.arange(dim, dtype=np.int64)
    for k in range(K):
        if k:
            jitter = (((ids[:, None] * 31 + k * 7 + dims[None, :] * 13) % 997)
                      - 498).astype(np.float64) * 1e-5
            vecs = (emb + jitter).astype(np.float32)
        else:
            vecs = emb.astype(np.float32)
        flat = pa.array(vecs.reshape(-1), type=pa.float32())
        lists = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * dim, dim), type=pa.int32()), flat)
        out = {"vec_id": pa.array(ids + k * STRIDE["vec_id"], type=pa.int64()),
               "embedding": lists}
        if labels is not None:
            out["label"] = labels
        yield pa.table(out)


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_sf1"
    os.makedirs(out_dir, exist_ok=True)
    # GRAFT_SFX_TABLES: comma-separated subset (default all) — the sf100
    # diffv rung only needs documents+embeddings; skipping the 600M-row
    # lineitem stack saves ~15 GB of scratch disk and most of the gen time
    only = os.environ.get("GRAFT_SFX_TABLES")
    wanted = set(only.split(",")) if only else None
    # GRAFT_SFX_COLS: optional per-table column projection, e.g.
    #   GRAFT_SFX_COLS="lineitem=l_orderkey,l_suppkey,l_extendedprice"
    # Kept columns are byte-identical to the full generation (projection
    # happens BEFORE replication; strides apply only to present columns).
    # Exists for disk-bounded rungs: full lineitem at K=3000 is ~32 GB on a
    # ~94 GB box while the graph chain reads exactly three of its columns.
    cols_env = os.environ.get("GRAFT_SFX_COLS", "")
    proj = {}
    for part in filter(None, cols_env.split(";")):
        t, cs = part.split("=", 1)
        proj[t] = cs.split(",")
    consumed = set()

    # stride-carrying columns per table: projecting one OUT would silently
    # skip its offset and make replicas share key values — refuse loudly
    KEYCOLS = {
        "customer": ["c_custkey"], "supplier": ["s_suppkey"],
        "part": ["p_partkey"], "orders": ["o_orderkey", "o_custkey"],
        "lineitem": ["l_orderkey"],  # l_partkey/l_suppkey offset only if kept
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"], "embeddings": ["vec_id"],
    }

    def base(name):
        t = read(name)
        if name not in proj:
            return t
        consumed.add(name)
        missing = [c for c in proj[name] if c not in t.column_names]
        if missing:
            raise ValueError(f"GRAFT_SFX_COLS: {name} has no column(s) {missing}")
        dropped_keys = [c for c in KEYCOLS.get(name, []) if c not in proj[name]]
        if dropped_keys:
            raise ValueError(
                f"GRAFT_SFX_COLS: projection for {name} drops stride key "
                f"column(s) {dropped_keys} — replicas would share key values")
        return t.select(proj[name])
    print(f"writing sf1 (10x {SRC}) to {out_dir}" +
          (f" tables={sorted(wanted)}" if wanted else ""))

    def want(name):
        return wanted is None or name in wanted

    # dimension tables: unchanged (queries group on the 25 nations / 5 regions)
    for name in ("region", "nation"):
        if want(name):
            write(out_dir, name, [base(name)])

    if want("customer"):
        write(out_dir, "customer", replicate(base("customer"), {"c_custkey": STRIDE["custkey"]}))
    if want("supplier"):
        write(out_dir, "supplier", replicate(base("supplier"), {"s_suppkey": STRIDE["suppkey"]}))
    if want("part"):
        write(out_dir, "part", replicate(base("part"), {"p_partkey": STRIDE["partkey"]}))
    if want("orders"):
        write(out_dir, "orders", replicate(base("orders"), {
            "o_orderkey": STRIDE["orderkey"], "o_custkey": STRIDE["custkey"]}))
    if want("lineitem"):
        li = base("lineitem")
        offs = {c: s for c, s in (("l_orderkey", STRIDE["orderkey"]),
                                  ("l_partkey", STRIDE["partkey"]),
                                  ("l_suppkey", STRIDE["suppkey"]))
                if c in li.column_names}
        write(out_dir, "lineitem", replicate(li, offs))
    if want("events"):
        write(out_dir, "events", replicate(base("events"), {
            "event_id": STRIDE["event_id"], "user_id": STRIDE["user_id"]}))
    if want("documents"):
        write(out_dir, "documents", documents_sf1(base("documents")))
    if want("embeddings"):
        write(out_dir, "embeddings", embeddings_sf1(base("embeddings")))
    unconsumed = set(proj) - consumed
    if unconsumed:
        raise ValueError(
            f"GRAFT_SFX_COLS names table(s) not generated this run: "
            f"{sorted(unconsumed)} (check GRAFT_SFX_TABLES / spelling)")
    print("done")


if __name__ == "__main__":
    main()
