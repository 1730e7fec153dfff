"""Synthesize an sf1-equivalent fixture by upsampling the driver's sf0.1
parquet 10x with hash-perturbed keys (round-5 verdict item 2).

Purpose: a THIRD scaling decade for tools/scaling.py. The driver ships
sf{0.001,0.01,0.1}; the 100 TB scale claims rest on the 0.01->0.1 decade
alone, so this tool manufactures a 0.1->1.0 decade locally. Design goals, in
order:

1. Referential integrity — every foreign key still resolves: copy k offsets
   each id family by k * (its dense domain size), consistently on both sides
   of every relationship (o_custkey/c_custkey, l_orderkey/o_orderkey,
   l_partkey/p_partkey, l_suppkey/s_suppkey, and the shared doc_id/vec_id
   id space pipeline7 relies on). nation/region stay single-copy: real
   dimension tables do not grow with fact volume.
2. No degenerate duplication — a naive 10x copy makes every document an
   exact 10-way duplicate and every embedding a 10-way cosine-1 clone, which
   inflates every dedup/LSH bucket 10x and every pair join 100x: that would
   measure data degeneracy, not plan scaling (a real 10x corpus is ~10x new
   content). So copy 0 keeps the original text/vectors verbatim while copies
   1..9 get a seeded per-document word permutation (preserves length, word
   multiset, vocabulary and token statistics; destroys 3-shingle overlap)
   and a per-copy circular dimension roll of each embedding (preserves the
   norm and the isotropic geometry; decorrelates copies).
3. Distribution preservation — timestamps, amounts, statuses, languages and
   every non-key column are kept verbatim, so per-day / per-group densities
   scale exactly 10x.

Usage: python tools/make_sfbig.py [src_dir] [dst_dir] [factor]
                                  [--open-vocab] [--tables=t1,t2]
Defaults: /root/testdata/sf0.1 /tmp/sf1 10

--open-vocab (round-6 verdict item 4): copies k>0 additionally suffix every
word with "~k", so each copy introduces NEW vocabulary — the Heaps'-law
behavior of a real growing corpus. Closed-vocabulary fixtures make every
shingle's document frequency grow linearly with the corpus, which degrades
exact prefix-filter set-similarity joins quadratically BY CONSTRUCTION
(sum-of-df² over prefix tokens); the open-vocab fixture measures the plan
against realistic df growth instead. Timing-only fixture: word lengths (and
hence n_chars consistency) change, so it is NOT parity-suitable.

--tables=a,b (round-6 verdict item 8): multiply only the named fact tables;
every other table is copied single-copy. Used for the fourth scaling decade
(documents/embeddings x100) where multiplying lineitem/orders 100x would
cost minutes of fixture build for queries that never read them. The doc_id/
vec_id id family is self-contained (no other table references it), so
referential integrity holds.

The writer preserves each source file's arrow schema bit-for-bit (the
events.ts physical-type gotcha in the verify notes), so readers see the same
types they see on driver fixtures.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_FLAGS = [a for a in sys.argv[1:] if a.startswith("--")]
_ARGS = [a for a in sys.argv[1:] if not a.startswith("--")]
SRC = _ARGS[0] if len(_ARGS) > 0 else "/root/testdata/sf0.1"
DST = _ARGS[1] if len(_ARGS) > 1 else "/tmp/sf1"
FACTOR = int(_ARGS[2]) if len(_ARGS) > 2 else 10
OPEN_VOCAB = "--open-vocab" in _FLAGS
ONLY_TABLES = None
for f in _FLAGS:
    if f.startswith("--tables="):
        ONLY_TABLES = set(f[len("--tables="):].split(","))

# id family -> (table, column) pairs that must move together, with the
# offset stride = dense domain size of the family at sf0.1 (min id is 0).
KEY_FAMILIES: dict[str, list[tuple[str, str]]] = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "eventid": [("events", "event_id")],
    "userid": [("events", "user_id")],
    # documents and embeddings share one id space (pipeline7: vec_id ==
    # doc_id), so both use the documents stride.
    "docid": [("documents", "doc_id"), ("embeddings", "vec_id")],
}

COPY_UNCHANGED = ["region", "nation"]
FACT_TABLES = [
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _family_strides(src: str) -> dict[str, int]:
    strides: dict[str, int] = {}
    for fam, cols in KEY_FAMILIES.items():
        # stride from the OWNING table (first entry): max id + 1
        table, col = cols[0]
        t = pq.read_table(os.path.join(src, f"{table}.parquet"), columns=[col])
        strides[fam] = int(pc.max(t.column(0)).as_py()) + 1
    return strides


def _offset_columns(tbl: pa.Table, table_name: str, k: int, strides: dict[str, int]) -> pa.Table:
    for fam, cols in KEY_FAMILIES.items():
        for tname, cname in cols:
            if tname != table_name:
                continue
            idx = tbl.schema.get_field_index(cname)
            col = tbl.column(idx)
            shifted = pc.add(col, pa.scalar(k * strides[fam], type=col.type))
            tbl = tbl.set_column(idx, tbl.schema.field(idx), shifted.cast(col.type))
    return tbl


def _permute_texts(tbl: pa.Table, k: int) -> pa.Table:
    """Copies > 0: deterministic per-document word permutation. Word
    multiset, length (texts are single-spaced; verified n_chars==len(text)
    on the source) and vocabulary are preserved; shingle continuity is not —
    so copies are NOT near-duplicates of each other and dedup joins scale
    with true content growth, not with synthetic cloning.

    --open-vocab additionally suffixes every word with "~k": copy k's
    vocabulary is disjoint from every other copy's, so per-shingle document
    frequency stays CONSTANT as the corpus grows (Heaps'-law growth) instead
    of growing linearly (the closed-31-word degeneracy)."""
    idx_text = tbl.schema.get_field_index("text")
    idx_id = tbl.schema.get_field_index("doc_id")
    texts = tbl.column(idx_text).to_pylist()
    ids = tbl.column(idx_id).to_pylist()
    out = []
    for doc_id, text in zip(ids, texts):
        if text is None:
            out.append(None)
            continue
        words = text.split(" ")
        if OPEN_VOCAB:
            words = [f"{w}~{k}" for w in words]
        rng = np.random.default_rng((k << 32) ^ (doc_id & 0xFFFFFFFF))
        out.append(" ".join(words[i] for i in rng.permutation(len(words))))
    return tbl.set_column(idx_text, tbl.schema.field(idx_text), pa.array(out, type=tbl.schema.field(idx_text).type))


def _roll_embeddings(tbl: pa.Table, k: int) -> pa.Table:
    """Copies > 0: circular-roll each vector's dimensions by k*7 (coprime
    with 64). Norms are exactly preserved; cross-copy cosines decorrelate on
    near-isotropic data, so the ANN corpus grows with new geometry instead
    of cosine-1 clones."""
    idx = tbl.schema.get_field_index("embedding")
    field = tbl.schema.field(idx)
    col = tbl.column(idx).combine_chunks()
    vals = np.asarray(col.flatten())
    offsets = np.asarray(col.offsets)
    lens = np.diff(offsets)
    assert (lens == lens[0]).all(), "embedding dim must be constant to roll"
    dim = int(lens[0])
    mat = vals.reshape(-1, dim)
    rolled = np.roll(mat, (k * 7) % dim, axis=1)
    arr = pa.ListArray.from_arrays(pa.array(offsets), pa.array(rolled.reshape(-1), type=field.type.value_type))
    return tbl.set_column(idx, field, arr.cast(field.type))


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    strides = _family_strides(SRC)
    print("id-family strides:", strides)
    multiply = [t for t in FACT_TABLES if ONLY_TABLES is None or t in ONLY_TABLES]
    single = COPY_UNCHANGED + [t for t in FACT_TABLES if t not in multiply]
    for name in single:
        src = os.path.join(SRC, f"{name}.parquet")
        tbl = pq.read_table(src)
        pq.write_table(tbl, os.path.join(DST, f"{name}.parquet"))
        print(f"{name}: {tbl.num_rows} rows (single copy)")
    for name in multiply:
        src = pq.read_table(os.path.join(SRC, f"{name}.parquet"))
        copies = []
        for k in range(FACTOR):
            tbl = _offset_columns(src, name, k, strides)
            if k > 0 and name == "documents":
                tbl = _permute_texts(tbl, k)
            if k > 0 and name == "embeddings":
                tbl = _roll_embeddings(tbl, k)
            copies.append(tbl)
        big = pa.concat_tables(copies).combine_chunks()
        assert big.schema.equals(src.schema), f"{name}: schema drifted"
        pq.write_table(big, os.path.join(DST, f"{name}.parquet"))
        print(f"{name}: {src.num_rows} -> {big.num_rows} rows")
    # Completion marker, written LAST: consumers (tools/scaling.py) treat a
    # directory without it as a partial run and regenerate, so an interrupted
    # build can never be silently timed against missing/stale tables.
    with open(os.path.join(DST, "_COMPLETE"), "w") as f:
        f.write(
            f"src={SRC} factor={FACTOR} open_vocab={OPEN_VOCAB} "
            f"multiplied={','.join(multiply)}\n"
        )
    print(f"wrote sf{FACTOR}x fixture to {DST}")


if __name__ == "__main__":
    main()
