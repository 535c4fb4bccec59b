#!/usr/bin/env python3
"""Build the 10x scaling corpus at /tmp/graft-sf1 from sf0.1.

Method (SCALING_r07.md): 10 copies with collision-free key shifts and
content decorrelation so dedup/ANN queries see 10x REAL work, not 10
artificial exact-dup cliques:

  documents   doc_id + i*5e4; copies 1..9 get a per-doc UNIQUE text
              tail " pc<i>x<doc_id>" (no shared suffix shingles)
  embeddings  vec_id + i*2e4; component j perturbed by
              i*1e-4*sin(vec_id + j)
  orders      o_orderkey + i*1.5e6, o_custkey + i*1.5e5
  lineitem    l_orderkey + i*1.5e6, l_suppkey + i*1e4
  customer    c_custkey + i*1.5e5
  supplier    s_suppkey + i*1e4
  nation/region/part  unchanged (fixed dimensions by design)
  events      event_id-free; user/session ids shifted + i*1e5 with
              timestamps unchanged (sessionization per user is intact)

Usage: python3 tools/make_sf10.py [--tables documents,embeddings,...]
Driver-side tooling only (duckdb), like selfcheck.py.
"""
import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = "/tmp/graft-sf1"

ap = argparse.ArgumentParser()
ap.add_argument("--tables", default="documents")
args = ap.parse_args()
tables = [t.strip() for t in args.tables.split(",") if t.strip()]

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


def copies(expr_by_copy):
    return "\nUNION ALL\n".join(expr_by_copy(i) for i in range(10))


GEN = {
    "documents": lambda: copies(lambda i: f"""
        SELECT doc_id + {i * 50000} AS doc_id,
               text{f" || ' pc{i}x' || CAST(doc_id AS VARCHAR)" if i else ""} AS text,
               lang, source, n_chars
        FROM read_parquet('{SRC}/documents.parquet')"""),
    "embeddings": lambda: copies(lambda i: f"""
        SELECT vec_id + {i * 20000} AS vec_id,
               list_transform(embedding, (x, j) ->
                 CAST(x + {i} * 1e-4 * sin(vec_id + j) AS FLOAT)) AS embedding,
               label
        FROM read_parquet('{SRC}/embeddings.parquet')"""),
    "orders": lambda: copies(lambda i: f"""
        SELECT o_orderkey + {int(i * 1.5e6)} AS o_orderkey,
               o_custkey + {int(i * 1.5e5)} AS o_custkey,
               * EXCLUDE (o_orderkey, o_custkey)
        FROM read_parquet('{SRC}/orders.parquet')"""),
    "lineitem": lambda: copies(lambda i: f"""
        SELECT l_orderkey + {int(i * 1.5e6)} AS l_orderkey,
               l_suppkey + {int(i * 1e4)} AS l_suppkey,
               * EXCLUDE (l_orderkey, l_suppkey)
        FROM read_parquet('{SRC}/lineitem.parquet')"""),
    "customer": lambda: copies(lambda i: f"""
        SELECT c_custkey + {int(i * 1.5e5)} AS c_custkey,
               * EXCLUDE (c_custkey)
        FROM read_parquet('{SRC}/customer.parquet')"""),
    "supplier": lambda: copies(lambda i: f"""
        SELECT s_suppkey + {int(i * 1e4)} AS s_suppkey,
               * EXCLUDE (s_suppkey)
        FROM read_parquet('{SRC}/supplier.parquet')"""),
}

for t in tables:
    if t in ("nation", "region", "part", "events"):
        con.execute(f"""
            COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))
            TO '{DST}/{t}.parquet' (FORMAT PARQUET)""")
        print(f"{t}: copied unchanged")
        continue
    sql = GEN[t]()
    con.execute(
        f"COPY ({sql}) TO '{DST}/{t}.parquet' (FORMAT PARQUET)")
    n = con.execute(
        f"SELECT count(*) FROM read_parquet('{DST}/{t}.parquet')"
    ).fetchone()[0]
    print(f"{t}: {n} rows")
