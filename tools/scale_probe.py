"""Scale probe: synthesize a ~10× (sf1-shaped) dataset from sf0.1 and
time a query list at both scales to measure per-query scaling exponents
(VERDICT r6 ask #7).  Evidence for the 100× story: a query whose
wall-clock grows ~linearly (ratio ≈ 10× work / 32 cores, i.e. anything
clearly sub-quadratic) has no hidden all-pairs or funnel; a
super-linear ratio gets a plan diff note in SCALE.md.

The synthetic sf1 is NOT a naive 10× copy — verbatim replication would
plant every doc/vector as a 10-way duplicate and blow the near-dup
candidate generation up quadratically BY CONSTRUCTION (a measurement
artifact, not a scale signal).  Instead each copy is made disjoint in
the similarity spaces while preserving within-copy structure:

* documents: every token suffixed ``_<copy>`` → cross-copy shingle
  vocabularies are disjoint (jaccard 0), within-copy dup/near-dup
  structure identical to sf0.1; ``doc_id`` shifted; ``n_chars``
  recomputed.
* embeddings: element-wise ±1 mask per copy (a diagonal orthogonal
  transform) → within-copy cosines EXACTLY preserved, cross-copy
  cosines ≈ 0; ``vec_id`` shifted.
* events/orders/customer: entity keys shifted per copy (disjoint
  users/customers), value columns untouched.
* lineitem: ``l_orderkey`` shifted; part/supp keys kept (dimension
  tables stay single-copy, as at real scale).
* region/nation/part/supplier: copied verbatim (dims don't scale).

Writes to ``<repo>/.tmp/sf1`` (gitignored scratch — never committed).

Usage:
    python tools/scale_probe.py gen                # build .tmp/sf1
    python tools/scale_probe.py run [q1,q2,...]    # time sf0.1 vs sf1
        (default query list: the 10 slowest in BENCH.out)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = "/root/testdata/sf0.1"
DST = os.path.join(REPO, ".tmp", "sf1")
COPIES = 10
OFFSET = 100_000_000


def gen() -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(DST, exist_ok=True)
    # drop a prior run's completion sentinel FIRST: a regeneration (e.g.
    # after changing COPIES/OFFSET) killed mid-write must not leave the
    # stale _SUCCESS validating a torn/mixed file set
    sentinel = os.path.join(DST, "_SUCCESS")
    if os.path.exists(sentinel):
        os.remove(sentinel)

    for t in ("region", "nation", "part", "supplier"):
        pq.write_table(pq.read_table(f"{SRC}/{t}.parquet"), f"{DST}/{t}.parquet")

    def shifted(table: str, key_cols: list[str]) -> None:
        src = pq.read_table(f"{SRC}/{table}.parquet")
        parts = []
        for i in range(COPIES):
            cols = {}
            for name in src.column_names:
                col = src.column(name)
                if name in key_cols:
                    col = pa.compute.add(col, i * OFFSET)
                cols[name] = col
            parts.append(pa.table(cols))
        pq.write_table(pa.concat_tables(parts), f"{DST}/{table}.parquet")

    shifted("customer", ["c_custkey"])
    shifted("orders", ["o_orderkey", "o_custkey"])
    shifted("lineitem", ["l_orderkey"])
    shifted("events", ["event_id", "user_id"])

    # documents: disjoint token vocab per copy
    src = pq.read_table(f"{SRC}/documents.parquet").to_pylist()
    rows = []
    for i in range(COPIES):
        suf = f"_{i}"
        for r in src:
            t = r["text"]
            nt = None if t is None else " ".join(w + suf for w in t.split(" "))
            rows.append(
                {
                    "doc_id": r["doc_id"] + i * OFFSET,
                    "text": nt,
                    "lang": r["lang"],
                    "source": r["source"],
                    "n_chars": None if nt is None else len(nt),
                }
            )
    pq.write_table(pa.Table.from_pylist(rows), f"{DST}/documents.parquet")

    # embeddings: per-copy ±1 diagonal mask (orthogonal, cosine-preserving
    # within a copy, decorrelating across copies)
    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vecs = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    vid = emb.column("vec_id").to_numpy()
    lab = emb.column("label").to_numpy(zero_copy_only=False)
    dim = vecs.shape[1]
    rng = np.random.default_rng(7)
    parts = []
    for i in range(COPIES):
        mask = (rng.integers(0, 2, size=dim) * 2 - 1).astype(np.float32)
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vid + i * OFFSET),
                    "embedding": pa.array((vecs * mask).tolist(), pa.list_(pa.float32())),
                    "label": pa.array(lab, pa.int32()),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{DST}/embeddings.parquet")
    # completion sentinel, written LAST: a generation killed mid-write
    # leaves a torn parquet behind an otherwise-complete file set, so
    # consumers (tests/test_scale_probe.py) gate on this, not the files
    with open(os.path.join(DST, "_SUCCESS"), "w") as f:
        f.write("ok\n")
    for t in sorted(os.listdir(DST)):
        if t.endswith(".parquet"):
            print(t, pq.read_metadata(f"{DST}/{t}").num_rows)


def run(names: list[str]) -> None:
    from pyspark.sql import SparkSession

    from fletcher_spark.queries import registry
    from fletcher_spark.session import apply_runtime_confs

    registry.load_all()
    spark = (
        SparkSession.builder.appName("scale-probe")
        .master("local[32]")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.shuffle.partitions", "32")
        # sf1 working sets (15M-row gram/shingle tables + persists) blow
        # the 1g local-mode default heap; the probe box has 128 GiB
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )
    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    def one(name: str, sf_dir: str) -> float:
        t0 = time.perf_counter()
        registry.QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        return time.perf_counter() - t0

    one("q1_pricing_summary", SRC)  # warm-up
    print(f"{'query':36s} {'sf0.1':>8s} {'sf1':>8s} {'ratio':>7s}")
    out = {}
    for n in names:
        a = min(one(n, SRC), one(n, SRC))
        b = min(one(n, DST), one(n, DST))
        out[n] = (round(a, 2), round(b, 2), round(b / a, 2))
        print(f"{n:36s} {a:8.2f} {b:8.2f} {b / a:7.2f}")
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "run"
    if mode == "gen":
        gen()
    else:
        if len(sys.argv) > 2:
            names = sys.argv[2].split(",")
        else:
            with open(os.path.join(REPO, "BENCH.out")) as f:
                q = json.load(f)["queries"]
            names = [n for n, t in sorted(q.items(), key=lambda kv: -kv[1])[:10]]
        run(names)
