#!/usr/bin/env python3
"""Synthesize a 10x scale replica of the sf0.1 tables for PERFORMANCE
measurement only (never correctness gates — oracles keep running on the
driver-generated SFs). Each replica offsets every BIGINT key by
i * 100_000_000, so join cardinalities and key distributions match a real
10x scale-up; dimension tables (region, nation) stay fixed, mirroring
TPC-H semantics. events.ts is rewritten as epoch-nanos BIGINT, the layout
graft.Tables.events expects.

With --perturb RATE (e.g. --perturb 0.01), replica copies i >= 1 are
NEAR-duplicates instead of byte-identical: each documents token is
substituted with probability RATE by a fresh vocabulary token
(deterministic per (doc_id, position, copy) via hash — runs reproduce),
and each embeddings dimension gets small deterministic additive noise.
Copy 0 stays verbatim. Purpose: byte-identical replicas are absorbed by
the engines' identical-text collapse, so identical-copy columns
understate the NEAR-dup path (LSH banding, candidate verify, span-index
suffix sort over non-collapsed candidates, semantic dedup) — the
perturbed variant exercises exactly that path.

Usage: python3 tools/make_sf1.py [dstDir] [copies] [--perturb RATE]
"""
import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
# consume --perturb and its VALUE by argv position, not string equality:
# a rate spelled '0.010' or '1e-2' would not equal str(float(...)) and
# leak into the positionals (wrong dstDir / int() failure), and a
# positional that happens to equal the canonical rate string was stripped
argv = list(sys.argv[1:])
PERTURB = 0.0
if "--perturb" in argv:
    i = argv.index("--perturb")
    PERTURB = float(argv[i + 1])
    del argv[i:i + 2]
args = [a for a in argv if not a.startswith("--")]
DST = args[0] if len(args) > 0 else "/tmp/sf1"
COPIES = int(args[1]) if len(args) > 1 else 10
K = 100_000_000

os.makedirs(DST, exist_ok=True)
con = duckdb.connect()


# Small row groups keep the replica SPLITTABLE: parquet parallelism is
# bounded by row-group count, and DuckDB's default (~122k rows) packs the
# heavily-compressible documents table into ONE group — a single-task scan
# that serializes every downstream map stage and masquerades as operator
# superlinearity at sf1. Real 100 TB corpora are thousands of files; ~32
# groups per table mirrors that.
def rgs(table, replicated):
    # size row groups from the ACTUAL output row count: copy() tables are
    # not replicated, so scaling them by COPIES would yield one oversized
    # group instead of ~32
    n = con.execute(f"SELECT count(*) FROM '{SRC}/{table}.parquet'").fetchone()[0]
    n_out = n * COPIES if replicated else n
    return max(2048, n_out // 32)


def copy(table):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{table}.parquet') TO "
                f"'{DST}/{table}.parquet' (FORMAT PARQUET, "
                f"ROW_GROUP_SIZE {rgs(table, replicated=False)})")


# documents is written UNCOMPRESSED: the synthetic 30-word vocabulary
# zstd-compresses ~20x, so the whole 50k-doc table lands under one 4 MB
# scan split and every text query serializes on one core — an artifact
# real text parquet (~2-4x compression, thousands of files) doesn't have.
def rep(table, select_tpl, perturbed_tpl=None):
    def tpl(i):
        t = perturbed_tpl if (PERTURB > 0 and i > 0 and perturbed_tpl) \
            else select_tpl
        return t.format(off=i * K, src=f"{SRC}/{table}.parquet", copy=i,
                        ppm=int(PERTURB * 1_000_000))
    sql = " UNION ALL ".join(tpl(i) for i in range(COPIES))
    codec = ", CODEC 'UNCOMPRESSED'" if table == "documents" else ""
    con.execute(f"COPY ({sql}) TO '{DST}/{table}.parquet' "
                f"(FORMAT PARQUET, "
                f"ROW_GROUP_SIZE {rgs(table, replicated=True)}{codec})")


copy("region")
copy("nation")
rep("customer", "SELECT c_custkey + {off} AS c_custkey, c_name, "
    "c_nationkey, c_acctbal, c_mktsegment FROM '{src}'")
rep("supplier", "SELECT s_suppkey + {off} AS s_suppkey, s_name, "
    "s_nationkey, s_acctbal FROM '{src}'")
rep("part", "SELECT p_partkey + {off} AS p_partkey, p_name, p_brand, "
    "p_type, p_size, p_retailprice FROM '{src}'")
rep("orders", "SELECT o_orderkey + {off} AS o_orderkey, "
    "o_custkey + {off} AS o_custkey, o_orderstatus, o_totalprice, "
    "o_orderdate, o_orderpriority FROM '{src}'")
rep("lineitem", "SELECT l_orderkey + {off} AS l_orderkey, "
    "l_partkey + {off} AS l_partkey, l_suppkey + {off} AS l_suppkey, "
    "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
    "l_returnflag, l_linestatus, l_shipdate FROM '{src}'")
rep("events", "SELECT event_id + {off} AS event_id, "
    "epoch_ns(ts) AS ts, user_id + {off} AS user_id, event_type, "
    "value, props FROM '{src}'")
rep("documents", "SELECT doc_id + {off} AS doc_id, text, lang, source, "
    "n_chars FROM '{src}'",
    # per-token substitution at {ppm}/1e6, deterministic per
    # (doc_id, position, copy); replacement drawn from a fresh 9973-token
    # vocabulary so a substituted position almost never matches the other
    # copies. n_chars kept as-is (a numeric payload column, not derived
    # from text by any gate).
    perturbed_tpl=(
        "SELECT doc_id + {off} AS doc_id, "
        "list_aggregate(list_transform(string_split(text, ' '), "
        "(t, j) -> CASE WHEN t <> '' AND "
        "hash(doc_id, j, {copy}) % 1000000 < {ppm} "
        "THEN 'v' || ((hash(doc_id, j, {copy}) // 7) % 9973) "
        "ELSE t END), 'string_agg', ' ') AS text, "
        "lang, source, n_chars FROM '{src}'"))
rep("embeddings", "SELECT vec_id + {off} AS vec_id, embedding, label "
    "FROM '{src}'",
    # small deterministic additive noise per (vec_id, dim, copy): copies
    # become cosine NEAR-duplicates instead of exact ones
    perturbed_tpl=(
        "SELECT vec_id + {off} AS vec_id, "
        "list_transform(embedding, (x, j) -> CAST(x + "
        "(CAST(hash(vec_id, j, {copy}) % 1001 AS BIGINT) - 500) * 1e-5 "
        "AS FLOAT)) "
        "AS embedding, label FROM '{src}'"))

for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    n = con.execute(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n}")
