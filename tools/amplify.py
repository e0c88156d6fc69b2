#!/usr/bin/env python3
"""Scale-test amplifier: build an sf1-equivalent dataset from sf0.1 by
10x key-offset replication (driver-side tooling, like check.py — not
part of the library).

Usage: python3 tools/amplify.py [srcDir] [dstDir] [copies]

Design: each copy k gets disjoint key ranges with referential links
preserved (orders->customer, lineitem->orders/part/supplier,
events.user_id->customer). Dimension tables (region, nation) stay
fixed — they are bounded alphabets at any scale. Document text gets a
per-copy word suffix and embeddings a per-copy dimension rotation, so
copies are NOT near-duplicates of each other: the amplified corpus
models a 10x bigger crawl with the same duplicate RATE, which is the
right null model for scaling exponents (verbatim replication would
blow near-dup pair counts quadratically and measure an artifact).
Timestamps keep their range: 10x rows in the same window = 10x
traffic density, so watermark/session/window semantics are exercised
at higher key cardinality, not over a longer horizon.
"""
import os
import sys

import duckdb

C_OFF = 10_000_000      # customer / user keys
S_OFF = 10_000_000      # supplier keys
P_OFF = 10_000_000      # part keys
O_OFF = 100_000_000     # order keys
E_OFF = 1_000_000_000   # event ids
D_OFF = 100_000_000     # doc ids
V_OFF = 100_000_000     # vec ids


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()

    def t(name):
        return f"'{src}/{name}.parquet'"

    def write(name, union_sql):
        out = f"{dst}/{name}.parquet"
        con.execute(f"COPY ({union_sql}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{name}: {n} rows")

    def fanout(per_copy_sql):
        return "\nUNION ALL\n".join(per_copy_sql(k) for k in range(copies))

    # bounded dimension alphabets: fixed at any scale
    for name in ("region", "nation"):
        write(name, f"SELECT * FROM {t(name)}")

    write("customer", fanout(lambda k: f"""
        SELECT c_custkey + {k * C_OFF} AS c_custkey, c_name,
               c_nationkey, c_acctbal, c_mktsegment
        FROM {t('customer')}"""))
    write("supplier", fanout(lambda k: f"""
        SELECT s_suppkey + {k * S_OFF} AS s_suppkey, s_name,
               s_nationkey, s_acctbal
        FROM {t('supplier')}"""))
    write("part", fanout(lambda k: f"""
        SELECT p_partkey + {k * P_OFF} AS p_partkey, p_name,
               p_brand, p_type, p_size, p_retailprice
        FROM {t('part')}"""))
    write("orders", fanout(lambda k: f"""
        SELECT o_orderkey + {k * O_OFF} AS o_orderkey,
               o_custkey + {k * C_OFF} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {t('orders')}"""))
    write("lineitem", fanout(lambda k: f"""
        SELECT l_orderkey + {k * O_OFF} AS l_orderkey,
               l_partkey + {k * P_OFF} AS l_partkey,
               l_suppkey + {k * S_OFF} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
               l_returnflag, l_linestatus, l_shipdate
        FROM {t('lineitem')}"""))
    write("events", fanout(lambda k: f"""
        SELECT event_id + {k * E_OFF} AS event_id, ts,
               user_id + {k * C_OFF} AS user_id,
               event_type, value, props
        FROM {t('events')}"""))
    # per-copy word suffix: copies are distinct documents, not
    # near-duplicates of the originals (see module doc)
    write("documents", fanout(lambda k: f"""
        SELECT doc_id + {k * D_OFF} AS doc_id,
               {'text' if k == 0 else
                f"array_to_string(list_transform(string_split(text, ' '), w -> concat(w, '_{k}')), ' ')"} AS text,
               lang, source,
               CAST(len({'text' if k == 0 else
                f"array_to_string(list_transform(string_split(text, ' '), w -> concat(w, '_{k}')), ' ')"}) AS BIGINT) AS n_chars
        FROM {t('documents')}"""))
    # per-copy dimension rotation: preserves every within-copy cosine,
    # decorrelates across copies
    write("embeddings", fanout(lambda k: f"""
        SELECT vec_id + {k * V_OFF} AS vec_id,
               CAST([embedding[((i - 1 + {k}) % len(embedding)) + 1]
                     for i in range(1, len(embedding) + 1)] AS FLOAT[]) AS embedding,
               label
        FROM {t('embeddings')}"""))


if __name__ == "__main__":
    main()
