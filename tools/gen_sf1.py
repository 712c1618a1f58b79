"""Generate /tmp/sf1 fixtures for the scaling-decade measurement
(judge r12 ask #5): ~10x sf0.1, built by DETERMINISTIC replication of
/root/testdata/sf0.1 so per-key workload densities stay constant and a
wall-vs-sf slope is meaningful:

- star tables (customer/orders/lineitem/part/supplier, events): replica
  i shifts every key column by i x (max_key + 1) — orders-per-customer,
  lineitems-per-order, events-per-user densities are EXACTLY preserved,
  which is what makes the decade a scaling measurement instead of a new
  workload. nation/region stay fixed (they are fixed in TPC-H too).
- documents: replica i maps every whitespace token w -> w + "~i" — a
  BIJECTION on the vocabulary, so within-replica shingle/Jaccard/near-dup
  structure is preserved EXACTLY while cross-replica token sets are
  disjoint (replicas are not near-dups of each other; pair density per
  doc stays constant instead of exploding quadratically).
- embeddings: replica i circularly shifts the vector dims by i — cosine
  structure within a replica is exactly preserved; cross-replica cosine
  decorrelates.

Timestamps are left unchanged: the simulated time window is a property
of the workload, not the scale (more users in the same window — the way
a real corpus grows).

Output: /tmp/sf1/{table}.parquet. Pure duckdb+pandas — no Spark, so it
can run alongside a pytest session without JVM contention.
"""

from __future__ import annotations

import os

import duckdb

SRC = "/root/testdata/sf0.1"
DST = os.environ.get("SF1_DIR", "/tmp/sf1")
REPL = 10

TABLES_KEYED = {
    # table -> {column: key-space it offsets in}
    "customer": {"c_custkey": "custkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "part": {"p_partkey": "partkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "events": {"event_id": "eventid", "user_id": "userid"},
}


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO {max(4, os.cpu_count() // 4)}")

    # key-space strides: max + 1 per key space so replicas never collide
    strides = {}
    for space, (tbl, col) in {
        "custkey": ("customer", "c_custkey"),
        "orderkey": ("orders", "o_orderkey"),
        "partkey": ("part", "p_partkey"),
        "suppkey": ("supplier", "s_suppkey"),
        "eventid": ("events", "event_id"),
        "userid": ("events", "user_id"),
        "docid": ("documents", "doc_id"),
        "vecid": ("embeddings", "vec_id"),
    }.items():
        strides[space] = (
            con.execute(
                f"SELECT max({col}) + 1 FROM read_parquet('{SRC}/{tbl}.parquet')"
            ).fetchone()[0]
        )

    # fixed-size dims: straight copies
    for tbl in ("nation", "region"):
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')) "
            f"TO '{DST}/{tbl}.parquet' (FORMAT PARQUET)"
        )
        print(tbl, "copied")

    for tbl, keymap in TABLES_KEYED.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')"
            ).fetchall()
        ]
        parts = []
        for i in range(REPL):
            sel = ", ".join(
                f"{c} + {i} * {strides[keymap[c]]} AS {c}" if c in keymap else c
                for c in cols
            )
            parts.append(
                f"SELECT {sel} FROM read_parquet('{SRC}/{tbl}.parquet')"
            )
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{DST}/{tbl}.parquet' "
            "(FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/{tbl}.parquet')"
        ).fetchone()[0]
        print(tbl, n)

    # documents: per-replica vocabulary bijection (token w -> w || '~i'
    # for i > 0; replica 0 is the original corpus verbatim)
    doc_parts = ["SELECT * FROM read_parquet('" + SRC + "/documents.parquet')"]
    for i in range(1, REPL):
        doc_parts.append(
            f"""
            SELECT doc_id + {i} * {strides['docid']} AS doc_id,
                   array_to_string(
                     list_transform(string_split(text, ' '),
                                    w -> CASE WHEN w = '' THEN w
                                              ELSE w || '~{i}' END),
                     ' ') AS text,
                   lang, source,
                   CAST(length(array_to_string(
                     list_transform(string_split(text, ' '),
                                    w -> CASE WHEN w = '' THEN w
                                              ELSE w || '~{i}' END),
                     ' ')) AS BIGINT) AS n_chars
            FROM read_parquet('{SRC}/documents.parquet')
            """
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(doc_parts)}) TO '{DST}/documents.parquet' "
        "(FORMAT PARQUET)"
    )
    print(
        "documents",
        con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/documents.parquet')"
        ).fetchone()[0],
    )

    # embeddings: circular dim shift per replica
    emb_parts = ["SELECT * FROM read_parquet('" + SRC + "/embeddings.parquet')"]
    dim = con.execute(
        f"SELECT len(embedding) FROM read_parquet('{SRC}/embeddings.parquet') LIMIT 1"
    ).fetchone()[0]
    for i in range(1, REPL):
        s = i % dim
        emb_parts.append(
            f"""
            SELECT vec_id + {i} * {strides['vecid']} AS vec_id,
                   embedding[{s + 1}:] || embedding[:{s}] AS embedding,
                   label
            FROM read_parquet('{SRC}/embeddings.parquet')
            """
        )
    con.execute(
        f"COPY ({' UNION ALL '.join(emb_parts)}) TO '{DST}/embeddings.parquet' "
        "(FORMAT PARQUET)"
    )
    print(
        "embeddings",
        con.execute(
            f"SELECT count(*) FROM read_parquet('{DST}/embeddings.parquet')"
        ).fetchone()[0],
    )


if __name__ == "__main__":
    main()
