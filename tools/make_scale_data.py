"""Synthesize an sf≈N derivative of the sf0.1 testdata into /tmp.

Scale rehearsal (VERDICT r2 next-round #3): union-replicate each
sf0.1 table K times with per-replica key shifts so FK integrity holds
(replica i's lineitem rows point at replica i's orders/part/supplier
rows), then run bench + sweep once at the larger size to confirm
nothing quadratic or memory-fragile hides below the tested sizes.

Key handling per table:
- region/nation: dimension vocab — copied once, never shifted
  (nationkey references from customer/supplier stay valid).
- customer/supplier/part/orders/lineitem: surrogate + foreign keys
  shifted by ``i * stride`` with one stride per key domain.
- events: event_id/user_id shifted (user cardinality grows K×,
  matching how a K× event log actually looks).
- documents: doc_id shifted; text gets a per-replica suffix token so
  replicas are NEAR-duplicates, not byte-duplicates — which is what
  a K× web corpus looks like and is the honest stress shape for the
  MinHash/SimHash/cluster operators (byte-identical copies would let
  exact-dedup shortcut everything).
- embeddings: id shifted, vectors kept — K× identical neighborhoods
  stress top-k tie handling at scale.

``--skew`` (VERDICT r3 next-round #3) turns the uniform replication
into the Zipfian shape a real 100 TB corpus has:
- lineitem: ~30 % of all lines are reassigned to ONE hot supplier
  (l_suppkey = 1, which exists in every replica set since supplier
  keys start at 1) — a plain shuffle join on l_suppkey serializes
  one reducer, salted/broadcast plans do not;
- documents: every 10th doc_id becomes a NEAR-duplicate of one fixed
  boilerplate paragraph (per-doc id token appended, so shingle sets
  differ slightly) — one ~10 % clique that lands in a single LSH
  bucket per band, the worst case for banded dedup.
FK integrity and row counts are unchanged; only value distributions
move.

Usage: python tools/make_scale_data.py [--out /tmp/sf1] [--copies 10]
       [--src /root/testdata/sf0.1] [--skew]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# key columns to shift, per table, grouped by key domain (stride is
# computed per domain from the source max so shifted ranges never
# collide)
SHIFTS: dict[str, dict[str, str]] = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "eventid", "user_id": "userid"},
    "documents": {"doc_id": "docid"},
    "embeddings": {"vec_id": "embid"},
}
COPY_ONCE = ("region", "nation")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sf1")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--skew", action="store_true",
                    help="Zipfian shape: hot supplier owns ~30%% of "
                         "lineitem; ~10%% of documents form one "
                         "near-duplicate clique")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from doin_fine_ance__spark.session import get_spark
    from doin_fine_ance__spark.sources.testdata import load_table

    spark = get_spark("make-scale-data")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)

    # one stride per key DOMAIN (max over every column in the domain),
    # so e.g. o_orderkey and l_orderkey shift identically
    domain_max: dict[str, int] = {}
    for table, cols in SHIFTS.items():
        df = load_table(spark, args.src, table)
        for colname, domain in cols.items():
            m = df.agg(F.max(colname)).first()[0] or 0
            domain_max[domain] = max(domain_max.get(domain, 0), int(m))
    stride = {d: m + 1 for d, m in domain_max.items()}

    for table in COPY_ONCE:
        load_table(spark, args.src, table).write.mode("overwrite").parquet(
            os.path.join(args.out, f"{table}.parquet")
        )
        print(f"{table}: copied once", flush=True)

    for table, cols in SHIFTS.items():
        src = load_table(spark, args.src, table)
        replicas = []
        for i in range(args.copies):
            r = src
            for colname, domain in cols.items():
                r = r.withColumn(
                    colname, (F.col(colname) + F.lit(i * stride[domain])).cast("long")
                )
            if table == "documents" and i > 0:
                r = r.withColumn(
                    "text", F.concat(F.col("text"), F.lit(f" replica r{i}"))
                ).withColumn("n_chars", F.length("text").cast("long"))
            replicas.append(r)
        out = replicas[0]
        for r in replicas[1:]:
            out = out.unionByName(r)
        if args.skew and table == "lineitem":
            # deterministic per-row choice (hash of the line identity),
            # ~30% of ALL lines land on supplier 1
            out = out.withColumn(
                "l_suppkey",
                F.when(
                    F.pmod(F.xxhash64("l_orderkey", "l_linenumber",
                                      "l_partkey"), F.lit(10)) < 3,
                    F.lit(1).cast("long"),
                ).otherwise(F.col("l_suppkey")),
            )
        if args.skew and table == "documents":
            # one giant near-dup clique: every 10th doc becomes the
            # boilerplate paragraph + its own id token (so the clique
            # members are near- not byte-duplicates)
            boiler = (
                "this website uses cookies to improve your experience "
                "we assume you are ok with this but you can opt out if "
                "you wish privacy policy terms of service all rights "
                "reserved copyright contact us about careers sitemap "
                "subscribe to our newsletter for the latest updates "
            ) * 2
            out = out.withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 10 == 0,
                    F.concat(F.lit(boiler), F.lit("doc token "),
                             F.col("doc_id").cast("string")),
                ).otherwise(F.col("text")),
            ).withColumn("n_chars", F.length("text").cast("long"))
        out.write.mode("overwrite").parquet(
            os.path.join(args.out, f"{table}.parquet")
        )
        n = spark.read.parquet(os.path.join(args.out, f"{table}.parquet")).count()
        print(f"{table}: {n} rows ({args.copies}x)", flush=True)
    print(f"done -> {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
