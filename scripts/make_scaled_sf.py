"""Derive a scaled-up copy of a testdata sf dir (BASELINE.md
amortization experiment): fact tables are replicated FACTOR times with
key columns shifted by a per-replica offset (so joins stay valid and
keys stay unique), dimension tables (region, nation) keep one copy,
and document text is replica-tagged on every token so near-dup
structure is preserved WITHIN a replica but no spurious cross-replica
duplicate pairs appear (which would grow dedup output quadratically
instead of linearly and distort the workload).

Writes into a NEW directory (never the source). Usage:

    python scripts/make_scaled_sf.py /root/testdata/sf0.1 /tmp/sf1x10 10
"""

from __future__ import annotations

import os
import sys

import duckdb

#: key offset between replicas — far above any key at the source scales
SHIFT = 10_000_000

#: per-table integer key columns to shift per replica
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
DIMS = ["region", "nation"]


def scale_table(con, src: str, dst: str, table: str, factor: int) -> None:
    cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM '{src}/{table}.parquet'"
        ).fetchall()
    ]
    exprs = []
    for c in cols:
        if c in KEYED.get(table, []):
            exprs.append(f"{c} + i * {SHIFT} AS {c}")
        elif table == "documents" and c == "text":
            # tag every token after the first with the replica id:
            # all 3-gram shingles become replica-unique, so near-dup
            # pairs replicate linearly, not quadratically
            exprs.append(
                "CASE WHEN i = 0 THEN text "
                "ELSE replace(text, ' ', ' r' || CAST(i AS VARCHAR)) END AS text"
            )
        else:
            exprs.append(c)
    reps = "" if table in DIMS else f", range({factor}) t(i)"
    if table in DIMS:
        sel = f"SELECT * FROM '{src}/{table}.parquet'"
    else:
        sel = f"SELECT {', '.join(exprs)} FROM '{src}/{table}.parquet'{reps}"
    if table == "events":
        # The source's ts is physical TIMESTAMP(NANOS); DuckDB's parquet
        # writer downcasts to µs, which Spark 4 would read as
        # TIMESTAMP_NTZ and change engine behavior vs the original
        # fixtures. Round-trip through Arrow and restore the ns type so
        # the scaled table exercises the same nanosAsLong read path.
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = con.execute(sel).arrow()
        i = tbl.schema.get_field_index("ts")
        tbl = tbl.set_column(i, "ts", tbl.column("ts").cast(pa.timestamp("ns")))
        pq.write_table(tbl, f"{dst}/{table}.parquet")
        return
    con.execute(f"COPY ({sel}) TO '{dst}/{table}.parquet' (FORMAT PARQUET)")


def main() -> int:
    src, dst, factor = sys.argv[1], sys.argv[2], int(sys.argv[3])
    assert os.path.abspath(dst) != os.path.abspath(src)
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    for table in list(KEYED) + DIMS:
        scale_table(con, src, dst, table, factor)
        n = con.execute(f"SELECT count(*) FROM '{dst}/{table}.parquet'").fetchone()[0]
        print(f"{table}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
