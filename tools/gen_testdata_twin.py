#!/usr/bin/env python3
"""Seed-shifted TWIN of the driver's synthetic testdata (VERDICT-r10 §next #2).

The 149 oracle hash gates all run against the one fixed TESTDATA generation
(seed=42). This regenerates a schema- and domain-identical corpus from a
DIFFERENT seed, so re-running graft.Verify + tools/check_correctness.py over
the twin proves the gates bind to the OPERATORS, not to fixture accidents:

    python3 tools/gen_testdata_twin.py testdata_twin/sf0.01 [seed]
    sbt 'runMain graft.Verify testdata_twin/sf0.01 /tmp/verify_twin'
    python3 tools/check_correctness.py testdata_twin/sf0.01 /tmp/verify_twin

Schemas (pyarrow types), row counts, key relationships (FKs), and value
DOMAINS (status codes, 2-decimal money, integral quantities, date ranges,
vocab, langs, label count, embedding dim) mirror the sf0.01 originals —
measured from the parquet files themselves, since the driver's generator
script is not shipped. Distributional shape is deliberately NOT copied
bit-for-bit: the point is a different corpus through the same gates.
"""
import json
import os
import random
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def main(out_dir, seed=4242):
    os.makedirs(out_dir, exist_ok=True)
    rng = random.Random(seed)
    nrng = np.random.RandomState(seed)

    def write(name, cols, schema):
        t = pa.table(cols, schema=schema)
        pq.write_table(t, f"{out_dir}/{name}.parquet")
        print(f"  {name}: {t.num_rows} rows")

    # region / nation -------------------------------------------------------
    regions = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
    write("region",
          {"r_regionkey": list(range(5)), "r_name": regions},
          pa.schema([("r_regionkey", pa.int32()), ("r_name", pa.string())]))
    write("nation",
          {"n_nationkey": list(range(25)),
           "n_name": [f"NATION_{i}" for i in range(25)],
           "n_regionkey": [rng.randrange(5) for _ in range(25)]},
          pa.schema([("n_nationkey", pa.int32()), ("n_name", pa.string()),
                     ("n_regionkey", pa.int32())]))

    # customer / supplier / part -------------------------------------------
    n_cust, n_supp, n_part = 1500, 100, 2000
    segs = ["MACHINERY", "AUTOMOBILE", "HOUSEHOLD", "FURNITURE", "BUILDING"]
    write("customer",
          {"c_custkey": list(range(n_cust)),
           "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
           "c_nationkey": [rng.randrange(25) for _ in range(n_cust)],
           "c_acctbal": [round(rng.uniform(-1000, 10000), 2) for _ in range(n_cust)],
           "c_mktsegment": [rng.choice(segs) for _ in range(n_cust)]},
          pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string()),
                     ("c_nationkey", pa.int32()), ("c_acctbal", pa.float64()),
                     ("c_mktsegment", pa.string())]))
    write("supplier",
          {"s_suppkey": list(range(n_supp)),
           "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
           "s_nationkey": [rng.randrange(25) for _ in range(n_supp)],
           "s_acctbal": [round(rng.uniform(-1000, 10000), 2) for _ in range(n_supp)]},
          pa.schema([("s_suppkey", pa.int64()), ("s_name", pa.string()),
                     ("s_nationkey", pa.int32()), ("s_acctbal", pa.float64())]))
    colors = ["red", "blue", "green", "hot", "cold", "small", "large", "dim"]
    nouns = ["widget", "gizmo", "bolt", "ring", "gear", "cog", "spring", "plate"]
    types = ["ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO"]
    write("part",
          {"p_partkey": list(range(n_part)),
           "p_name": [f"{rng.choice(colors)} {rng.choice(nouns)}" for _ in range(n_part)],
           "p_brand": [f"Brand#{rng.randrange(1, 26)}" for _ in range(n_part)],
           "p_type": [rng.choice(types) for _ in range(n_part)],
           "p_size": [rng.randrange(1, 51) for _ in range(n_part)],
           "p_retailprice": [round(rng.uniform(900, 1000), 2) for _ in range(n_part)]},
          pa.schema([("p_partkey", pa.int64()), ("p_name", pa.string()),
                     ("p_brand", pa.string()), ("p_type", pa.string()),
                     ("p_size", pa.int32()), ("p_retailprice", pa.float64())]))

    # orders / lineitem ------------------------------------------------------
    n_ord, n_li = 15000, 60000
    day_us = 86400 * 10**6
    epoch_1995 = 788918400 * 10**6  # 1995-01-01 UTC in microseconds
    statuses = ["O", "F", "P"]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    odate = [epoch_1995 + rng.randrange(0, 2400) * day_us for _ in range(n_ord)]
    write("orders",
          {"o_orderkey": list(range(n_ord)),
           "o_custkey": [rng.randrange(n_cust) for _ in range(n_ord)],
           "o_orderstatus": [rng.choice(statuses) for _ in range(n_ord)],
           "o_totalprice": [round(rng.uniform(1000, 400000), 2) for _ in range(n_ord)],
           "o_orderdate": pa.array(odate, pa.timestamp("us")),
           "o_orderpriority": [rng.choice(prios) for _ in range(n_ord)]},
          pa.schema([("o_orderkey", pa.int64()), ("o_custkey", pa.int64()),
                     ("o_orderstatus", pa.string()), ("o_totalprice", pa.float64()),
                     ("o_orderdate", pa.timestamp("us")),
                     ("o_orderpriority", pa.string())]))
    li_order = [rng.randrange(n_ord) for _ in range(n_li)]
    write("lineitem",
          {"l_orderkey": li_order,
           "l_partkey": [rng.randrange(n_part) for _ in range(n_li)],
           "l_suppkey": [rng.randrange(n_supp) for _ in range(n_li)],
           "l_linenumber": [rng.randrange(1, 8) for _ in range(n_li)],
           "l_quantity": [float(rng.randrange(1, 51)) for _ in range(n_li)],
           "l_extendedprice": [round(rng.uniform(900, 105000), 2) for _ in range(n_li)],
           "l_discount": [round(rng.randrange(0, 11) / 100.0, 2) for _ in range(n_li)],
           "l_tax": [round(rng.randrange(0, 9) / 100.0, 2) for _ in range(n_li)],
           "l_returnflag": [rng.choice(["A", "N", "R"]) for _ in range(n_li)],
           "l_linestatus": [rng.choice(["O", "F"]) for _ in range(n_li)],
           "l_shipdate": pa.array(
               [odate[o] + rng.randrange(1, 121) * day_us for o in li_order],
               pa.timestamp("us"))},
          pa.schema([("l_orderkey", pa.int64()), ("l_partkey", pa.int64()),
                     ("l_suppkey", pa.int64()), ("l_linenumber", pa.int32()),
                     ("l_quantity", pa.float64()), ("l_extendedprice", pa.float64()),
                     ("l_discount", pa.float64()), ("l_tax", pa.float64()),
                     ("l_returnflag", pa.string()), ("l_linestatus", pa.string()),
                     ("l_shipdate", pa.timestamp("us"))]))

    # events -----------------------------------------------------------------
    n_ev = 10000
    epoch_2024 = 1704067200 * 10**6  # 2024-01-01 UTC in microseconds
    etypes = ["click", "view", "purchase", "signup", "error"]
    write("events",
          {"event_id": list(range(n_ev)),
           "ts": pa.array(sorted(epoch_2024 + rng.randrange(0, 30 * day_us)
                                 for _ in range(n_ev)), pa.timestamp("us")),
           "user_id": [rng.randrange(150) for _ in range(n_ev)],
           "event_type": [rng.choice(etypes) for _ in range(n_ev)],
           "value": [round(rng.uniform(0, 500), 2) for _ in range(n_ev)],
           "props": [json.dumps({"k": rng.randrange(100)}) for _ in range(n_ev)]},
          pa.schema([("event_id", pa.int64()), ("ts", pa.timestamp("us")),
                     ("user_id", pa.int64()), ("event_type", pa.string()),
                     ("value", pa.float64()), ("props", pa.string())]))

    # documents ---------------------------------------------------------------
    n_doc = 500
    vocab = ("key agg row scan slow fast table value part hash merge batch a "
             "the line sort window spark order data column join small customer "
             "query big stream group vector filter").split()
    langs = ["en", "en", "en", "fr", "de", "es", "zh"]  # en-weighted
    texts = []
    for i in range(n_doc):
        n_words = rng.randrange(25, 90)
        texts.append(" ".join(rng.choice(vocab) for _ in range(n_words)))
    write("documents",
          {"doc_id": list(range(n_doc)),
           "text": texts,
           "lang": [rng.choice(langs) for _ in range(n_doc)],
           "source": [f"src{rng.randrange(20)}" for _ in range(n_doc)],
           "n_chars": [len(t) for t in texts]},
          pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                     ("lang", pa.string()), ("source", pa.string()),
                     ("n_chars", pa.int64())]))

    # embeddings --------------------------------------------------------------
    n_vec, dim, n_label = 500, 64, 10
    labels = [rng.randrange(n_label) for _ in range(n_vec)]
    centers = nrng.randn(n_label, dim).astype(np.float32) * 2.0
    vecs = [(centers[l] + nrng.randn(dim).astype(np.float32)).tolist()
            for l in labels]
    write("embeddings",
          {"vec_id": list(range(n_vec)),
           "embedding": vecs,
           "label": labels},
          pa.schema([("vec_id", pa.int64()),
                     ("embedding", pa.list_(pa.float32())),
                     ("label", pa.int32())]))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "testdata_twin/sf0.01"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 4242
    main(out, seed)
