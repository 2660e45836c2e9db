#!/usr/bin/env python
"""Synthesize a larger benchmark dataset by key-shifted replication.

Scaling evidence only: SCALING.md's measured curve stops at the
largest driver-generated SF (sf0.1), one decade short of where scale
problems usually surface. This tool manufactures the next decade from
sf0.1 itself — 10 key-shifted copies of every fact table — so
bench.py can record a measured sf1.0 point. Correctness stays pinned
to the driver SFs (the DuckDB oracle gate never runs here).

Replication is NOT naive duplication, because several operators would
then measure an artifact instead of scale:

- Keys shift per copy (custkey/orderkey/partkey/suppkey/doc_id/
  vec_id/event_id/user_id and every foreign key, consistently), so
  join fan-outs, group counts, and per-user session shapes grow the
  way real data growth grows them. region/nation stay fixed — they
  are bounded dimensions at any scale.
- Document text is word-permuted per copy (seeded by (copy, doc_id)),
  not copied: verbatim copies would make every shingle bucket hold 10
  near-identical docs and the near-dup pair output would grow
  quadratically (x45 per doc), so the bench would time a pathological
  cluster blow-up rather than a x10 corpus. Permutation keeps the
  token/char distributions while making cross-copy n-gram overlap
  negligible. p_name gets a per-copy suffix for the same reason (the
  typo-pair blocker groups on name equality).
- Embeddings for copies are fresh seeded unit Gaussians (the driver
  vectors are 64-dim unit-norm): verbatim copies would put 10 exact
  twins in every LSH bucket, turning the near-dup scan into an
  all-pairs explosion that real x10 growth does not have.

Usage:
    python tools/scale_testdata.py [--src /root/testdata/sf0.1] \
        [--out /tmp/sf1.0] [--copies 10]
"""

from __future__ import annotations

import argparse
import os
import random

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: per-table int64 key columns -> shift unit per copy. Units are
#: comfortably above each table's max base key at sf0.1 and chosen so
#: shifted foreign keys land exactly on the shifted primary keys.
KEY_SHIFTS: dict[str, dict[str, int]] = {
    "customer": {"c_custkey": 10**6},
    "supplier": {"s_suppkey": 10**6},
    "part": {"p_partkey": 10**6},
    "orders": {"o_orderkey": 10**7, "o_custkey": 10**6},
    "lineitem": {"l_orderkey": 10**7, "l_partkey": 10**6, "l_suppkey": 10**6},
    "events": {"event_id": 10**7, "user_id": 10**6},
    "documents": {"doc_id": 10**6},
    "embeddings": {"vec_id": 10**6},
}
COPY_AS_IS = ("region", "nation")


def _shift_keys(t: pa.Table, shifts: dict[str, int], i: int) -> pa.Table:
    for col, unit in shifts.items():
        idx = t.schema.get_field_index(col)
        t = t.set_column(idx, col, pc.add(t.column(col), pa.scalar(i * unit, pa.int64())))
    return t


def _permute_documents(t: pa.Table, i: int) -> pa.Table:
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    out = []
    for doc_id, text in zip(doc_ids, texts):
        if text is None:
            out.append(None)
            continue
        words = text.split()
        random.Random((i << 32) ^ doc_id).shuffle(words)
        out.append(" ".join(words))
    t = t.set_column(t.schema.get_field_index("text"), "text", pa.array(out, pa.string()))
    n_chars = pa.array([None if s is None else len(s) for s in out], pa.int64())
    return t.set_column(t.schema.get_field_index("n_chars"), "n_chars", n_chars)


def _fresh_embeddings(t: pa.Table, i: int) -> pa.Table:
    vec_ids = t.column("vec_id").to_pylist()
    dims = [len(v) for v in t.column("embedding").to_pylist() if v is not None]
    dim = dims[0] if dims else 64
    rng = np.random.default_rng(1_000_003 * i)
    mat = rng.standard_normal((len(vec_ids), dim))
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    emb = pa.array(mat.astype(np.float32).tolist(), pa.list_(pa.float32()))
    return t.set_column(t.schema.get_field_index("embedding"), "embedding", emb)


def _suffix_part_names(t: pa.Table, i: int) -> pa.Table:
    # str(i)*3 keeps every pair of copy suffixes (and copy vs base) at
    # levenshtein distance >= 3: the typo-pair operator joins names
    # within distance 2, so a shorter suffix would make all 10 copies
    # of a name mutual "typos" and inflate that query's output x45.
    names = pc.binary_join_element_wise(
        t.column("p_name").cast(pa.string()), pa.scalar(str(i) * 3), " "
    )
    return t.set_column(t.schema.get_field_index("p_name"), "p_name", names)


def scale(src: str, out: str, copies: int) -> None:
    os.makedirs(out, exist_ok=True)
    for name in COPY_AS_IS:
        pq.write_table(pq.read_table(os.path.join(src, f"{name}.parquet")),
                       os.path.join(out, f"{name}.parquet"))
        print(f"{name}: copied as-is")
    for name, shifts in KEY_SHIFTS.items():
        base = pq.read_table(os.path.join(src, f"{name}.parquet"))
        parts = [base]
        for i in range(1, copies):
            t = _shift_keys(base, shifts, i)
            if name == "documents":
                t = _permute_documents(t, i)
            elif name == "embeddings":
                t = _fresh_embeddings(t, i)
            elif name == "part":
                t = _suffix_part_names(t, i)
            parts.append(t)
        full = pa.concat_tables(parts).combine_chunks()
        if name == "events":
            # one file per copy, in a directory Spark/pyarrow read
            # transparently: a single ~12 MB-per-copy file is ONE input
            # split (< spark.sql.files.maxPartitionBytes), which
            # serializes the whole scan onto one core and shows up as
            # fake superlinear growth for scan-bound queries
            # (event_props_json, SCALING.md r6). The driver's own
            # sf* dirs stay single-file — only this stress generator
            # controls its file layout.
            d = os.path.join(out, f"{name}.parquet")
            os.makedirs(d, exist_ok=True)
            for i, t in enumerate(parts):
                pq.write_table(t.combine_chunks(), os.path.join(d, f"part-{i:05d}.parquet"))
        else:
            pq.write_table(full, os.path.join(out, f"{name}.parquet"))
        print(f"{name}: {base.num_rows} -> {full.num_rows}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1.0")
    ap.add_argument("--copies", type=int, default=10)
    a = ap.parse_args()
    scale(a.src, a.out, a.copies)


if __name__ == "__main__":
    main()
