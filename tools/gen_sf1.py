#!/usr/bin/env python
"""Deterministic sf1-scale bench data derived from sf0.1 by 10x key-shifted
replication (the driver generates sf0.001/0.01/0.1 only; SURVEY.md S6 needs
a scale where operator work dominates Spark's per-query dispatch so the
2x-of-DuckDB criterion is decidable).

Every copy k shifts each table's primary key by k*(max_key+1), with the
SAME shift applied to foreign keys (l_orderkey/o_orderkey, o_custkey/
c_custkey, ...), so join selectivities and group cardinalities match the
source distribution. region/nation stay fixed (TPC-H dims don't scale).

events.ts is TIMESTAMP(NANOS) in the source; DuckDB reads it at micro
precision, so it is persisted as BIGINT nanoseconds (epoch_ns) — exactly
the representation Spark's nanosAsLong loader sees — and the baseline
runner re-derives a timestamp view (see bench_duckdb.py).

Usage: python tools/gen_sf1.py [src_sf_dir] [dst_dir]
Defaults: /root/testdata/sf0.1 -> /root/repo/testdata-sf1 (gitignored).
"""
import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata-sf1"
K = int(os.environ.get("GRAFT_SCALE_COPIES", "10"))

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()
con.execute("SET TimeZone='UTC'")
# Stream COPY row groups to disk as they are produced instead of
# materializing the whole result first: at GRAFT_SCALE_COPIES=1000 the
# replicated lineitem is ~600M rows, which otherwise buffers ~60 GB of
# RSS before the first byte lands. Row order within the parquet files is
# irrelevant to every consumer (bench queries aggregate/sort; the DuckDB
# twins scan the same files).
con.execute("SET preserve_insertion_order=false")
con.execute(f"CREATE VIEW r AS SELECT range AS k FROM range({K})")


def src(t):
    return f"read_parquet('{SRC}/{t}.parquet')"


def copy(sql, t):
    con.execute(f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')").fetchone()[0]
    print(f"{t}: {n} rows")


# fixed dims
for t in ("region", "nation"):
    copy(f"SELECT * FROM {src(t)}", t)

offs = {}
for t, key in (("customer", "c_custkey"), ("part", "p_partkey"),
               ("supplier", "s_suppkey"), ("orders", "o_orderkey"),
               ("documents", "doc_id"), ("embeddings", "vec_id"),
               ("events", "event_id")):
    offs[t] = con.execute(f"SELECT max({key}) + 1 FROM {src(t)}").fetchone()[0]

CUST, PART, SUPP, ORD = (offs["customer"], offs["part"], offs["supplier"],
                         offs["orders"])

copy(f"""SELECT CAST(c_custkey + k*{CUST} AS BIGINT) AS c_custkey, c_name,
         c_nationkey, c_acctbal, c_mktsegment
         FROM {src('customer')} CROSS JOIN r""", "customer")
copy(f"""SELECT CAST(p_partkey + k*{PART} AS BIGINT) AS p_partkey, p_name,
         p_brand, p_type, p_size, p_retailprice
         FROM {src('part')} CROSS JOIN r""", "part")
copy(f"""SELECT CAST(s_suppkey + k*{SUPP} AS BIGINT) AS s_suppkey, s_name,
         s_nationkey, s_acctbal FROM {src('supplier')} CROSS JOIN r""", "supplier")
copy(f"""SELECT CAST(o_orderkey + k*{ORD} AS BIGINT) AS o_orderkey,
         CAST(o_custkey + k*{CUST} AS BIGINT) AS o_custkey, o_orderstatus,
         o_totalprice, o_orderdate, o_orderpriority
         FROM {src('orders')} CROSS JOIN r""", "orders")
copy(f"""SELECT CAST(l_orderkey + k*{ORD} AS BIGINT) AS l_orderkey,
         CAST(l_partkey + k*{PART} AS BIGINT) AS l_partkey,
         CAST(l_suppkey + k*{SUPP} AS BIGINT) AS l_suppkey,
         l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
         l_returnflag, l_linestatus, l_shipdate
         FROM {src('lineitem')} CROSS JOIN r""", "lineitem")
copy(f"""SELECT CAST(doc_id + k*{offs['documents']} AS BIGINT) AS doc_id,
         text, lang, source, n_chars
         FROM {src('documents')} CROSS JOIN r""", "documents")
copy(f"""SELECT CAST(vec_id + k*{offs['embeddings']} AS BIGINT) AS vec_id,
         embedding, label FROM {src('embeddings')} CROSS JOIN r""", "embeddings")
copy(f"""SELECT CAST(event_id + k*{offs['events']} AS BIGINT) AS event_id,
         epoch_ns(ts) AS ts, user_id, event_type, value, props
         FROM {src('events')} CROSS JOIN r""", "events")
print(f"done -> {DST} ({K} copies of {SRC})")
