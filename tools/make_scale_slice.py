#!/usr/bin/env python3
"""Dev tool: build an sfN-equivalent slice by replicating /root/testdata/sf0.1
(driver-generated testdata tops out at sf0.1 = ~17 MB, which cannot exercise
spill/AQE-skew paths). NOT part of the engine — scale-smoke input generation only.

Replication is perturbed so the workload SHAPE scales the way real data would:
 - documents: per-copy deterministic token permutation — same token/char
   distributions (t* text stats unchanged per row) but copies share few word
   3-gram shingles, so cross-copy rows are NOT near-dups and the LSH/dedup
   candidate structure scales ~linearly instead of exploding quadratically on
   artificial exact duplicates;
 - embeddings: per-copy mix v' = 0.6*v + 0.8*|v|*u (u = seeded random unit
   vector) keeps norms comparable but cross-copy cosine ~0.6 < every near-dup
   threshold in the suite (d5 uses 0.8);
 - events: user_id/event_id shifted per copy — series count scales N x, series
   LENGTH stays constant (the production shape: more stations, same record span).
   ts keeps the source encoding verbatim (timestamp[us] since the r8 testdata
   regeneration), so SparkEntry.loadTable's type-probing branch is exercised.

Usage: python3 tools/make_scale_slice.py <copies> <outdir>
"""
import random
import sys

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def scaled_documents(copies: int):
    t = pq.read_table(f"{SRC}/documents.parquet")
    n = t.num_rows
    cols = t.to_pydict()
    out = {k: [] for k in cols}
    for c in range(copies):
        rng = random.Random(1000 + c)
        for i in range(n):
            out["doc_id"].append(cols["doc_id"][i] + c * n)
            if c == 0:
                out["text"].append(cols["text"][i])
            else:
                toks = cols["text"][i].split()
                rng.shuffle(toks)
                out["text"].append(" ".join(toks))
            for k in ("lang", "source", "n_chars"):
                out[k].append(cols[k][i])
    return pa.table(out, schema=t.schema.remove_metadata())


def scaled_embeddings(copies: int):
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    n = t.num_rows
    cols = t.to_pydict()
    out = {k: [] for k in cols}
    for c in range(copies):
        rng = random.Random(2000 + c)
        for i in range(n):
            out["vec_id"].append(cols["vec_id"][i] + c * n)
            v = cols["embedding"][i]
            if c == 0:
                out["embedding"].append(v)
            else:
                norm = sum(x * x for x in v) ** 0.5
                u = [rng.gauss(0, 1) for _ in v]
                un = sum(x * x for x in u) ** 0.5 or 1.0
                out["embedding"].append(
                    [0.6 * x + 0.8 * norm * y / un for x, y in zip(v, u)])
            out["label"].append(cols["label"][i])
    return pa.table(out, schema=t.schema.remove_metadata())


def scaled_events(copies: int):
    t = pq.read_table(f"{SRC}/events.parquet")
    n = t.num_rows
    max_user = pa.compute.max(t["user_id"]).as_py() + 1
    parts = []
    for c in range(copies):
        shifted = t.set_column(
            t.schema.get_field_index("event_id"), "event_id",
            pa.compute.add(t["event_id"], c * n))
        shifted = shifted.set_column(
            shifted.schema.get_field_index("user_id"), "user_id",
            pa.compute.add(t["user_id"], c * max_user))
        parts.append(shifted)
    return pa.concat_tables(parts).replace_schema_metadata(None)


def scaled_facts(name: str, keycols, copies: int):
    """Replicate a TPC-H fact table with per-copy key shifts: primary/order keys
    shift so copies don't collide; dim foreign keys (custkey/partkey/suppkey)
    stay, so dim joins fan out N x — the production shape (more facts, same
    dims). Full-suite scale smoke needs lineitem/orders to grow too (r8)."""
    t = pq.read_table(f"{SRC}/{name}.parquet")
    parts = []
    for c in range(copies):
        shifted = t
        for k in keycols:
            mx = pa.compute.max(t[k]).as_py() + 1
            shifted = shifted.set_column(
                shifted.schema.get_field_index(k), k,
                pa.compute.add(shifted[k], c * mx))
        parts.append(shifted)
    return pa.concat_tables(parts).replace_schema_metadata(None)


def main():
    copies, outdir = int(sys.argv[1]), sys.argv[2]
    import os
    os.makedirs(outdir, exist_ok=True)
    for name, fn in [("documents", scaled_documents),
                     ("embeddings", scaled_embeddings),
                     ("events", scaled_events)]:
        out = f"{outdir}/{name}.parquet"
        pq.write_table(fn(copies), out, row_group_size=50000)
        print(f"wrote {out}: {pq.ParquetFile(out).metadata.num_rows} rows")
    # fact tables scale with key shifts; true dims stay fixed (linked unchanged)
    for name, keys in [("lineitem", ["l_orderkey"]), ("orders", ["o_orderkey"])]:
        out = f"{outdir}/{name}.parquet"
        pq.write_table(scaled_facts(name, keys, copies), out, row_group_size=100000)
        print(f"wrote {out}: {pq.ParquetFile(out).metadata.num_rows} rows")
    for name in ("region", "nation", "customer", "supplier", "part"):
        dst = f"{outdir}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print("done")


if __name__ == "__main__":
    main()
