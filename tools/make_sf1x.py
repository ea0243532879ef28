"""Build a 10x-replicated copy of an sf dir for TIMING work only.

The driver's sf1.0 fixtures (used for round measurement) are generated
by the driver and not present between rounds. For optimization
profiling at that scale we approximate them by replicating each
scaling table R times with per-replica key offsets that keep every
foreign key consistent (orders.o_custkey -> customer, lineitem keys ->
orders/part/supplier, events.user_id per-replica user namespaces).
Row groups are written at the pyarrow-default 1Mi rows, which exactly
reproduces the group counts observed in the driver's fixtures at every
sf (sf1.0: lineitem 6M rows = 6 groups, orders 1.5M = 2, everything
else 1), so scan parallelism matches at any --reps. nation/region are
fixed-size and copied as-is.

NOT test data: oracle correctness always runs against the real
driver-generated /root/testdata/sf* dirs. This output is only read by
bench_extra.py-style timing runs.

  python tools/make_sf1x.py [--src /root/testdata/sf0.1] [--dst /tmp/sf1x] [--reps 10]
"""

from __future__ import annotations

import argparse
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> (table defining the namespace). Offsets use the
# source table's max(key) so replicated keys never collide.
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
# key -> table whose max value defines the stride
NAMESPACE = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
COPY_AS_IS = ["nation", "region"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/tmp/sf1x")
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.dst, exist_ok=True)
    strides: dict[str, int] = {}
    for key, (tab, col) in NAMESPACE.items():
        t = pq.read_table(os.path.join(args.src, f"{tab}.parquet"), columns=[col])
        # stride = max+1, NOT max: 0-based key namespaces would otherwise
        # collide at every replica boundary (9 duplicate custkeys at
        # reps=10 — caught by a 449,973-row kNN output)
        strides[key] = int(pc.max(t.column(0)).as_py()) + 1

    for tab in COPY_AS_IS:
        shutil.copy(
            os.path.join(args.src, f"{tab}.parquet"),
            os.path.join(args.dst, f"{tab}.parquet"),
        )
        print(f"{tab}: copied")

    for tab, keys in KEYED.items():
        t = pq.read_table(os.path.join(args.src, f"{tab}.parquet"))
        chunks = []
        for i in range(args.reps):
            if i == 0:
                chunks.append(t)
                continue
            rep = t
            for key in keys:
                idx = rep.schema.get_field_index(key)
                col = rep.column(idx)
                shifted = pc.add(col, pa.scalar(i * strides[key], type=col.type))
                rep = rep.set_column(idx, rep.schema.field(idx), shifted)
            chunks.append(rep)
        out = pa.concat_tables(chunks)
        pq.write_table(
            out,
            os.path.join(args.dst, f"{tab}.parquet"),
            row_group_size=1 << 20,
        )
        print(f"{tab}: {t.num_rows} -> {out.num_rows} rows")

    open(os.path.join(args.dst, "_DONE"), "w").close()


if __name__ == "__main__":
    main()
