#!/usr/bin/env python
"""Generate a derived sf1 dataset (10x sf0.1) for the scale-proof run.

The driver ships parquet at sf{0.001,0.01,0.1} only and /root/testdata
is read-only, so the 10x corpus for SCALE.md is generated HERE, inside
the repo (scaledata/sf1/, gitignored; this recipe is the committed
artifact). Everything is deterministic.

Scaling recipe ("same distribution, 10x size" — what a larger scale
factor of the same generator would produce):

- region/nation: fixed dimension tables, copied as-is (TPC-H shape).
- customer/supplier/part/orders/lineitem/events: replicated FACTOR
  times; every key column is offset by replica * key_span (keys are
  dense 0-based, verified below), so join integrity and per-key row
  distributions are preserved exactly — 10x more orders with the SAME
  lineitems-per-order profile, 10x more users with the same
  events-per-user profile. Timestamps are kept: the same time window
  at 10x density (what real traffic growth looks like; windowed aggs
  get 10x rows per window).
- documents: replica 0 is the original corpus. Replicas 1..9 shuffle
  each doc's words with an rng seeded by (md5(text), replica):
  token/word-count/TF-IDF/quality distributions are preserved
  verbatim (same word multiset), EXACT-duplicate groups are preserved
  per replica (identical texts shuffle identically), while shuffled
  replicas are not shingle-near-dups of their originals — so dup
  structure scales linearly instead of every doc becoming a 10-clone
  near-dup clique, which would distort the dedup workload.
- embeddings: replica 0 original; replicas 1..9 add seeded Gaussian
  noise (0.25 * global component std) to each vector — planted
  cluster labels keep their geometry (clusters get denser) without
  creating degenerate exact-clone neighbor lists for the ANN queries.
- planted dense graph block (r8 verdict item 7): replication
  preserves per-customer co-purchase distributions BY DESIGN, which
  keeps the tau=5 co-occurrence graph sparse forever (370 vertices at
  sf1 — under edge_betweenness's 500-vertex local cap). To give the
  distributed Brandes/Girvan-Newman paths a real sf1 instance, a
  deterministic block of 640 extra customers is appended: 40 chained
  groups of 16, each group sharing a group-specific set of 5 new
  parts (every in-group pair co-purchases 5 parts → a tau=5 16-
  clique), with group g's first member also buying group g-1's part
  set (bridge edges with high betweenness → one connected 640-vertex
  chain-of-cliques). Appended as ordinary customer/part/orders/
  lineitem rows with keys past the replicated spans, so the block is
  invisible to join integrity and adds ~0.03% rows to lineitem.

Usage: python scripts/make_scaledata.py [--factor 10]
           [--src /root/testdata/sf0.1] [--out scaledata/sf1]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import random

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# key columns per table -> the span table that keys them (span =
# max+1 of the OWNING table, so foreign keys shift with their parent)
REPLICATED_SQL = {
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events.event_id"), ("user_id", "events.user_id")],
}


def key_span(con, src: str, table_key: str) -> int:
    if "." in table_key:
        table, key = table_key.split(".")
    else:
        table = table_key
        key = {
            "customer": "c_custkey",
            "supplier": "s_suppkey",
            "part": "p_partkey",
            "orders": "o_orderkey",
            "events": "event_id",
        }[table]
    mn, mx = con.execute(
        f"SELECT MIN({key}), MAX({key}) FROM "
        f"read_parquet('{src}/{table}.parquet')"
    ).fetchone()
    assert mn == 0, f"{table}.{key} keys are not dense 0-based (min={mn})"
    return mx + 1


def scale_relational(con, src: str, out: str, factor: int) -> None:
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet')) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"  {t}: copied (dimension table)")
    for t, keys in REPLICATED_SQL.items():
        desc = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
        ).fetchall()
        offset_for = {k: key_span(con, src, span_of) for k, span_of in keys}
        cols = ", ".join(
            f"{name} + r * {offset_for[name]} AS {name}"
            if name in offset_for
            else name
            for name, *_ in desc
        )
        con.execute(
            f"COPY (SELECT {cols} FROM read_parquet('{src}/{t}.parquet') "
            f"CROSS JOIN range({factor}) AS reps(r) ORDER BY r) TO "
            f"'{out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"  {t}: {n} rows")


def scale_documents(src: str, out: str, factor: int) -> None:
    tbl = pq.read_table(f"{src}/documents.parquet")
    doc_ids = tbl.column("doc_id").to_pylist()
    texts = tbl.column("text").to_pylist()
    langs = tbl.column("lang").to_pylist()
    sources = tbl.column("source").to_pylist()
    span = max(doc_ids) + 1
    out_ids, out_text, out_lang, out_src, out_n = [], [], [], [], []
    for r in range(factor):
        for did, text, lang, source in zip(doc_ids, texts, langs, sources):
            if r == 0:
                new_text = text
            else:
                words = text.split(" ")
                seed = int.from_bytes(
                    hashlib.md5(text.encode()).digest()[:8], "big"
                )
                random.Random(seed ^ r).shuffle(words)
                new_text = " ".join(words)
            out_ids.append(did + r * span)
            out_text.append(new_text)
            out_lang.append(lang)
            out_src.append(source)
            out_n.append(len(new_text))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "text": pa.array(out_text, pa.string()),
                "lang": pa.array(out_lang, pa.string()),
                "source": pa.array(out_src, pa.string()),
                "n_chars": pa.array(out_n, pa.int64()),
            }
        ),
        f"{out}/documents.parquet",
    )
    print(f"  documents: {len(out_ids)} rows")


def scale_embeddings(src: str, out: str, factor: int) -> None:
    tbl = pq.read_table(f"{src}/embeddings.parquet")
    vec_ids = np.asarray(tbl.column("vec_id").to_pylist())
    labels = np.asarray(tbl.column("label").to_pylist())
    vecs = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    order = np.argsort(vec_ids)  # seed-stable row order
    vec_ids, labels, vecs = vec_ids[order], labels[order], vecs[order]
    span = int(vec_ids.max()) + 1
    sigma = 0.25 * float(vecs.std())
    ids_out, lab_out, vec_out = [], [], []
    for r in range(factor):
        if r == 0:
            v = vecs
        else:
            rng = np.random.default_rng(777 + r)
            v = (vecs + sigma * rng.standard_normal(vecs.shape)).astype(
                np.float32
            )
        ids_out.append(vec_ids + r * span)
        lab_out.append(labels)
        vec_out.append(v)
    all_vecs = np.concatenate(vec_out)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.concatenate(ids_out), pa.int64()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(all_vecs.ravel(), pa.float32()),
                    all_vecs.shape[1],
                ).cast(pa.list_(pa.float32())),
                "label": pa.array(
                    np.concatenate(lab_out).astype(np.int32), pa.int32()
                ),
            }
        ),
        f"{out}/embeddings.parquet",
    )
    print(f"  embeddings: {len(all_vecs)} rows")


def plant_dense_graph(
    con,
    out: str,
    n_groups: int = 40,
    group_size: int = 16,
    parts_per_group: int = 5,
) -> None:
    """Append the deterministic chain-of-cliques block (see module
    docstring): 640 customers in 40 bridged 16-cliques on the tau=5
    co-occurrence graph, pushing its sf1 vertex count past the
    betweenness local cap so the batched distributed Brandes path has
    a real instance. Pure SQL over range() — no randomness."""
    spans = {}
    for t, k in (
        ("customer", "c_custkey"),
        ("part", "p_partkey"),
        ("orders", "o_orderkey"),
    ):
        spans[t] = (
            con.execute(
                f"SELECT MAX({k}) + 1 FROM read_parquet('{out}/{t}.parquet')"
            ).fetchone()[0]
        )
    cb, pb, ob = spans["customer"], spans["part"], spans["orders"]
    # memberships: (customer, part-set) — every group member buys its
    # group's set; the first member of group g>0 also buys g-1's set
    member_sql = f"""
        SELECT {cb} + g * {group_size} + m AS cid, g AS pset
        FROM range({n_groups}) t(g) CROSS JOIN range({group_size}) u(m)
        UNION ALL
        SELECT {cb} + g * {group_size} AS cid, g - 1 AS pset
        FROM range(1, {n_groups}) t(g)
    """
    orders_sql = f"""
        SELECT {ob} + ROW_NUMBER() OVER (ORDER BY cid, pset) - 1
                   AS o_orderkey,
               cid AS o_custkey, 'F' AS o_orderstatus,
               1000.0 AS o_totalprice,
               TIMESTAMP '1995-06-15 12:00:00' AS o_orderdate,
               '3-MEDIUM' AS o_orderpriority
        FROM ({member_sql})
    """
    plants = {
        "customer": f"""
            SELECT {cb} + g AS c_custkey,
                   'Customer#planted' || g AS c_name,
                   0 AS c_nationkey, 0.0 AS c_acctbal,
                   'BUILDING' AS c_mktsegment
            FROM range({n_groups * group_size}) t(g)
        """,
        "part": f"""
            SELECT {pb} + j AS p_partkey,
                   'planted dense graph part' AS p_name,
                   'Brand#99' AS p_brand, 'PLANTED BLOCK' AS p_type,
                   1 AS p_size, 100.0 AS p_retailprice
            FROM range({n_groups * parts_per_group}) t(j)
        """,
        "orders": orders_sql,
        "lineitem": f"""
            SELECT o.o_orderkey AS l_orderkey,
                   {pb} + o.pset * {parts_per_group} + j AS l_partkey,
                   0 AS l_suppkey, CAST(j + 1 AS INTEGER) AS l_linenumber,
                   1.0 AS l_quantity, 100.0 AS l_extendedprice,
                   0.0 AS l_discount, 0.0 AS l_tax,
                   'N' AS l_returnflag, 'O' AS l_linestatus,
                   TIMESTAMP '1995-07-01 12:00:00' AS l_shipdate
            FROM (
                SELECT {ob} + ROW_NUMBER() OVER (ORDER BY cid, pset) - 1
                           AS o_orderkey, pset
                FROM ({member_sql})
            ) o CROSS JOIN range({parts_per_group}) r(j)
        """,
    }
    for t, sql in plants.items():
        tmp = f"{out}/{t}.parquet.tmp"
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{out}/{t}.parquet') "
            f"UNION ALL BY NAME ({sql})) TO '{tmp}' (FORMAT PARQUET)"
        )
        os.replace(tmp, f"{out}/{t}.parquet")
        n = con.execute(f"SELECT COUNT(*) FROM ({sql})").fetchone()[0]
        print(f"  {t}: +{n} planted rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "scaledata", "sf1"),
    )
    args = ap.parse_args()
    out = os.path.abspath(args.out)
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    print(f"scaling {args.src} x{args.factor} -> {out}")
    scale_relational(con, args.src, out, args.factor)
    plant_dense_graph(con, out)
    scale_documents(args.src, out, args.factor)
    scale_embeddings(args.src, out, args.factor)
    print("done")


if __name__ == "__main__":
    main()
