#!/usr/bin/env python3
"""Build a Kx scale fixture from an existing testdata dir (driver-side tool).

Usage: python3 tools/make_scale_fixture.py <srcDir> <dstDir> [K=10]

Replicates the fact tables K times with shifted primary keys (dims copy
through). `documents.text` gets a per-replica suffix so replicas are NEAR-
duplicates, not exact copies — otherwise the near-dup queries degenerate
into a pure exact-dup pair blowup that measures the fixture, not the
engine. Events keep their timestamp type as written by DuckDB (plain
microsecond TIMESTAMP); `Tables.load` only rewrites the nanos-as-long form.
"""
import os
import sys

import duckdb


def main(src, dst, k=10):
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    def copy(t):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO '{dst}/{t}.parquet'"
            " (FORMAT PARQUET)")

    def scale(t, sql):
        con.execute(
            f"CREATE OR REPLACE VIEW base AS SELECT * FROM '{src}/{t}.parquet'")
        con.execute(f"COPY ({sql}) TO '{dst}/{t}.parquet' (FORMAT PARQUET)")

    for t in ["region", "nation", "part"]:
        copy(t)
    rk = f"range({k}) r(k)"
    mx = {t: con.sql(f"SELECT max({c}) FROM '{src}/{t}.parquet'").fetchone()[0]
          for t, c in [("customer", "c_custkey"), ("supplier", "s_suppkey"),
                       ("orders", "o_orderkey"), ("events", "event_id"),
                       ("documents", "doc_id"), ("embeddings", "vec_id")]}
    scale("customer",
          f"SELECT c_custkey + k*{mx['customer']+1} AS c_custkey, c_name,"
          f" c_nationkey, c_acctbal, c_mktsegment FROM base, {rk}")
    scale("supplier",
          f"SELECT s_suppkey + k*{mx['supplier']+1} AS s_suppkey, s_name,"
          f" s_nationkey, s_acctbal FROM base, {rk}")
    scale("orders",
          f"SELECT o_orderkey + k*{mx['orders']+1} AS o_orderkey,"
          f" o_custkey + k*{mx['customer']+1} AS o_custkey, o_orderstatus,"
          f" o_totalprice, o_orderdate, o_orderpriority FROM base, {rk}")
    scale("lineitem",
          f"SELECT l_orderkey + k*{mx['orders']+1} AS l_orderkey, l_partkey,"
          f" l_suppkey + k*{mx['supplier']+1} AS l_suppkey, l_linenumber,"
          " l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag,"
          f" l_linestatus, l_shipdate FROM base, {rk}")
    scale("events",
          f"SELECT event_id + k*{mx['events']+1} AS event_id, ts, user_id,"
          f" event_type, value, props FROM base, {rk}")
    scale("documents",
          f"SELECT doc_id + k*{mx['documents']+1} AS doc_id,"
          " text || ' v' || k AS text, lang, source,"
          f" n_chars + 3 AS n_chars FROM base, {rk}")
    scale("embeddings",
          f"SELECT vec_id + k*{mx['embeddings']+1} AS vec_id, embedding,"
          f" label FROM base, {rk}")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        n = con.sql(f"SELECT count(*) FROM '{dst}/{t}.parquet'").fetchone()[0]
        print(t, n)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 10)
