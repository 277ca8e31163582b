"""Build a measurement-only sf1.0-scale replica of the testdata layout.

The driver measures BENCH at its own generated sf1.0, which is deleted
between rounds. For in-session A/B at that scale we replicate sf0.1
10x with shifted id spaces and lightly perturbed content, preserving
the layout property that drives the round's findings: ONE parquet file
with ONE row group per table (a scan cannot split it).

Measurement infrastructure only — never used by queries, oracles or
tests; distributions are approximate (ids unique, text/vectors
perturbed per copy so dedup families see near- not exact duplicates).

    python tools/make_sf_replica.py [copies] [out_dir]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
COPIES = int(sys.argv[1]) if len(sys.argv) > 1 else 10
OUT = sys.argv[2] if len(sys.argv) > 2 else "/root/sfbig/sf1.0"

# id columns shifted by copy * stride (stride > max id in sf0.1)
SHIFT = {
    "lineitem": {"l_orderkey": 1 << 22, "l_partkey": 1 << 18, "l_suppkey": 1 << 12},
    "orders": {"o_orderkey": 1 << 22, "o_custkey": 1 << 18},
    "customer": {"c_custkey": 1 << 18},
    "part": {"p_partkey": 1 << 18},
    "supplier": {"s_suppkey": 1 << 12},
    "events": {"event_id": 1 << 22, "user_id": 1 << 18},
    "documents": {"doc_id": 1 << 18},
    "embeddings": {"vec_id": 1 << 18},
    "nation": {},
    "region": {},
}


def one_copy(name: str, tbl: pa.Table, c: int) -> pa.Table:
    if c:
        for col, stride in SHIFT[name].items():
            i = tbl.schema.get_field_index(col)
            tbl = tbl.set_column(
                i, tbl.schema.field(i), pc.add(tbl.column(col), c * stride)
            )
    if name == "documents" and c:
        # perturb text so replicas are near- not exact duplicates; keep
        # n_chars consistent with the new text
        i = tbl.schema.get_field_index("text")
        txt = pc.binary_join_element_wise(
            tbl.column("text").cast(pa.string()), f" rev{c}", ""
        )
        tbl = tbl.set_column(i, tbl.schema.field(i), txt)
        j = tbl.schema.get_field_index("n_chars")
        tbl = tbl.set_column(
            j, tbl.schema.field(j), pc.utf8_length(txt).cast(pa.int64())
        )
    if name == "embeddings" and c:
        # nudge dim 0 so copies are near-duplicates, not exact
        import numpy as np

        emb = tbl.column("embedding").combine_chunks()
        vals = emb.values.to_numpy(zero_copy_only=False).copy()
        offs = emb.offsets.to_numpy()
        first = offs[:-1][offs[:-1] < len(vals)]
        vals[first] = vals[first] + np.float32(c * 1e-3)
        new = pa.ListArray.from_arrays(emb.offsets, pa.array(vals, pa.float32()))
        i = tbl.schema.get_field_index("embedding")
        tbl = tbl.set_column(i, tbl.schema.field(i).with_type(new.type), new)
    return tbl


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for f in sorted(os.listdir(SRC)):
        if not f.endswith(".parquet"):
            continue
        name = f[: -len(".parquet")]
        src = pq.read_table(os.path.join(SRC, f))
        if name in ("nation", "region"):  # fixed dimension tables
            out = src
        else:
            out = pa.concat_tables(
                [one_copy(name, src, c) for c in range(COPIES)]
            ).combine_chunks()
        # match the driver generator's layout: ~1M-row row groups
        # (observed: sf1.0 lineitem 6 groups / orders 2 / events 1)
        pq.write_table(
            out, os.path.join(OUT, f), row_group_size=1_000_000,
            compression="snappy",
        )
        print(f"{name}: {src.num_rows} -> {out.num_rows} rows")
    open(os.path.join(OUT, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
