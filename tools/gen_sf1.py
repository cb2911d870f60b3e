#!/usr/bin/env python3
"""Local sf1.0 stress fixture: scale /root/testdata/sf0.1 by 10x into
/tmp/sf1.0 (or argv[1]) by key-offset replication.

Purpose (VERDICT r3 #4): rounding/overflow contracts historically break only
at larger data (q15-class traps). The driver ships no sf1.0, so this builds a
deterministic 10x copy locally: fact tables replicate with primary keys
offset per copy (uniqueness preserved; FK targets replicate identically so
joins fan out 10x), dimension-group keys (returnflag, user_id, nation, ...)
stay the SAME values so aggregate groups get 10x bigger — exactly the regime
where a sum crosses a precision/overflow boundary. Run the full oracle gate
against it:

    python3 tools/gen_sf1.py /tmp/sf1.0
    sbt "runMain graft.Verify /tmp/sf1.0 /tmp/verify_sf1"
    python3 tools/oracle_check.py /tmp/sf1.0 /tmp/verify_sf1

Replication is data-derived only (no wall-clock, no RNG) so both engines see
the identical bytes.
"""
import sys
import duckdb

SRC = "/root/testdata/sf0.1"
COPIES = 10

# per-table: (primary-key-ish columns to offset, offset stride per copy)
# Strides exceed each table's max key so copies never collide.
PLAIN = ["region", "nation"]  # tiny dims: keep as-is (FK targets must exist once)


def main(dst):
    con = duckdb.connect()
    import os
    os.makedirs(dst, exist_ok=True)
    for t in PLAIN:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{dst}/{t}.parquet' (FORMAT parquet)")
        print(t, "copied")

    # one stride per key FAMILY (PK and its FKs share it, else joins break
    # for copies i>0): derived from the dimension table's max key
    fam = {}
    for fam_key, table, col in [
            ("orderkey", "orders", "o_orderkey"), ("custkey", "customer", "c_custkey"),
            ("partkey", "part", "p_partkey"), ("suppkey", "supplier", "s_suppkey"),
            ("event_id", "events", "event_id"), ("doc_id", "documents", "doc_id"),
            ("vec_id", "embeddings", "vec_id")]:
        fam[fam_key] = int(con.execute(
            f"SELECT max({col}) FROM '{SRC}/{table}.parquet'").fetchone()[0]) + 1

    def family_of(k):
        for f in fam:
            if k.endswith(f):
                return f
        raise KeyError(k)

    def scale(t, key_cols, keep_cols_sql):
        strides = {k: fam[family_of(k)] for k in key_cols}
        sel = ", ".join(
            f"{k} + c.i * {strides[k]} AS {k}" if k in key_cols else k
            for k in keep_cols_sql)
        con.execute(
            f"COPY (SELECT {sel} FROM '{SRC}/{t}.parquet', "
            f"(SELECT unnest(range({COPIES})) AS i) c ORDER BY c.i) "
            f"TO '{dst}/{t}.parquet' (FORMAT parquet)")
        n = con.execute(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(t, n, "rows")

    cols = lambda t: [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'").fetchall()]

    # customer/supplier/part keys replicate so orders/lineitem FKs resolve in
    # every copy; group keys (nationkey, mktsegment, brand...) stay shared
    scale("customer", ["c_custkey"], cols("customer"))
    scale("supplier", ["s_suppkey"], cols("supplier"))
    scale("part", ["p_partkey"], cols("part"))
    scale("orders", ["o_orderkey", "o_custkey"], cols("orders"))
    scale("lineitem", ["l_orderkey", "l_partkey", "l_suppkey"], cols("lineitem"))
    # events: user_id kept shared (10x bigger sessions/windows per user)
    scale("events", ["event_id"], cols("events"))
    # documents/embeddings: ids offset; text/vectors repeat -> 10x duplicate
    # mass for the dedup/ANN family
    scale("documents", ["doc_id"], cols("documents"))
    scale("embeddings", ["vec_id"], cols("embeddings"))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1.0")
