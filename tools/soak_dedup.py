"""Round-5 soak (VERDICT r4 #7): the dedup chain at sf1-equivalent
document volume inside the 128 GiB sandbox.

Synthesizes a deterministic 50k-doc corpus (10× the sf0.1 documents
table — the same 500→5,000→50,000 progression the driver's sf ladder
follows) with REALISTIC web-shaped structure, not adversarial fixtures:

- ~1.5% of docs belong to near-duplicate clusters (template + small
  token edits — what MinHash-LSH is for);
- ONE boilerplate document repeated 2,500× (cookie-banner-style mass
  duplication, the organic way a band bucket exceeds the 1,024-doc cap
  and exercises band_pairs' streaming-join overflow path);
- ~2% of docs share a verbatim 12-token passage with one other doc
  (what span_dedup_docs is for).

Runs minhash_band_pairs → dedup_clusters_docs and span_dedup_docs over
it, records per-stage wall seconds, JVM peak RSS (VmHWM of the child
java process), driver peak RSS, and the bucket-cap overflow count.
Output: one JSON line (pasted into BENCH.md).

Usage: python tools/soak_dedup.py [n_docs]
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

TOKENS = (
    "the a of to and in for on with data query table scan join filter "
    "sort merge hash group agg window stream batch row column key value "
    "fast slow small large part order line customer spark vector dup"
).split()


def synth_docs(n: int, seed: int = 55) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    lens = rng.integers(40, 80, size=n)
    docs = [
        " ".join(rng.choice(TOKENS, size=ln)) for ln in lens
    ]
    # near-duplicate clusters: 150 templates × 5 members, one token edited
    for c in range(150):
        base = docs[10 * c]
        toks = base.split()
        for m in range(1, 5):
            t2 = list(toks)
            t2[rng.integers(0, len(t2))] = TOKENS[int(rng.integers(0, len(TOKENS)))]
            docs[10 * c + m] = " ".join(t2)
    # boilerplate mass duplication: one doc repeated 2,500x (organic
    # >cap bucket: identical signature -> identical band keys)
    boiler = " ".join(rng.choice(TOKENS, size=60))
    for i in range(2500):
        docs[n - 1 - i] = boiler
    # shared passages: 500 donor->receiver verbatim 12-token spans
    for k in range(500):
        donor, recv = 2000 + 2 * k, 2001 + 2 * k
        span = docs[donor].split()[10:22]
        rt = docs[recv].split()
        docs[recv] = " ".join(rt[:15] + span + rt[15:])
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": docs,
            "lang": [["en", "es", "fr", "de", "zh"][i % 5] for i in range(n)],
            "source": [f"src{i % 20}" for i in range(n)],
        }
    )
    pdf["n_chars"] = pdf["text"].str.len().astype(np.int64)
    return pdf


def jvm_peak_rss_gb() -> float | None:
    """VmHWM of the child java process (local-mode executor memory)."""
    try:
        import subprocess

        out = subprocess.run(
            ["pgrep", "-P", str(os.getpid()), "java"],
            capture_output=True, text=True,
        ).stdout.split()
        pids = out or subprocess.run(
            ["pgrep", "java"], capture_output=True, text=True
        ).stdout.split()
        best = 0
        for pid in pids:
            with open(f"/proc/{pid}/status") as f:
                for line in f:
                    if line.startswith("VmHWM"):
                        best = max(best, int(line.split()[1]))
        return round(best / 1024**2, 2) if best else None
    except Exception:
        return None


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import functions as F

    from query_cost_feature_engineering_spark.queries import (
        _MINHASH_BUCKET_CAP,
        dedup_clusters_docs,
        minhash_band_pairs,
        minhash_signatures,
        span_dedup_docs,
    )
    from query_cost_feature_engineering_spark.session import get_spark

    spark = get_spark(
        app="soak-dedup", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    import tempfile

    d = tempfile.mkdtemp(prefix="qcfe_soak_")
    synth = synth_docs(n)
    spark.createDataFrame(synth).repartition(16).write.mode(
        "overwrite"
    ).parquet(f"{d}/documents.parquet")

    res: dict = {"metric": "soak_dedup_chain", "n_docs": n, "cpus": int(cpus)}

    t0 = time.time()
    pairs = minhash_band_pairs(spark, d)
    res["minhash_band_pairs_rows"] = pairs.count()
    res["minhash_band_pairs_sec"] = round(time.time() - t0, 1)

    # bucket-cap overflow census over the same banded frame
    sigs = minhash_signatures(spark, d)
    keys = F.array(
        *[
            F.concat_ws("_", *[F.col(f"sig_{4 * b + r}") for r in range(4)])
            for b in range(2)
        ]
    )
    banded = sigs.select("doc_id", F.posexplode(keys).alias("band", "key"))
    sizes = banded.groupBy("band", "key").count()
    res["buckets_total"] = sizes.count()
    res["buckets_over_cap"] = sizes.filter(
        F.col("count") > _MINHASH_BUCKET_CAP
    ).count()
    res["largest_bucket"] = sizes.agg(F.max("count")).first()[0]

    t0 = time.time()
    clusters = dedup_clusters_docs(spark, d)
    n_clusters = clusters.filter("is_survivor").count()
    res["dedup_clusters_survivors"] = n_clusters
    res["dedup_clusters_sec"] = round(time.time() - t0, 1)

    t0 = time.time()
    spans = span_dedup_docs(spark, d)
    res["span_dedup_rows"] = spans.count()
    res["span_dedup_sec"] = round(time.time() - t0, 1)

    # round-5 addition: the C4 cleaning pass (line synthesis + gates +
    # corpus-level exact line dedup) over the same 10x corpus — its
    # boilerplate/footer duplication is exactly the Zipf-hot-key shape
    # the min-struct dedup join is built for
    from query_cost_feature_engineering_spark.queries import c4_clean_docs

    t0 = time.time()
    c4 = c4_clean_docs(spark, d)
    agg = c4.agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("page_kept").cast("long")).alias("kept"),
        F.sum("dup_removed").alias("dups"),
    ).first()
    res["c4_clean_rows"] = agg["rows"]
    res["c4_clean_pages_kept"] = agg["kept"]
    res["c4_clean_dup_lines_removed"] = agg["dups"]
    res["c4_clean_sec"] = round(time.time() - t0, 1)

    # round-5 addition #2: Bloom reference dedup over the same corpus —
    # exercises the bitset build (distinct -> bit_or -> 512 KiB collect)
    # at 10x line volume and pins the no-shuffle probe's wall cost; the
    # exact-join comparison asserts zero false positives at this volume
    # too (the oracle's zero-FP premise, re-checked at soak scale).
    from query_cost_feature_engineering_spark.queries import (
        _bloom_lines,
        bloom_dedup_docs,
    )

    t0 = time.time()
    bl = bloom_dedup_docs(spark, d)
    bagg = bl.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_dup_lines").alias("dups"),
        F.sum(F.col("kept").cast("long")).alias("kept"),
    ).first()
    res["bloom_dedup_docs"] = bagg["docs"]
    res["bloom_dedup_dup_lines"] = bagg["dups"]
    res["bloom_dedup_kept"] = bagg["kept"]
    res["bloom_dedup_sec"] = round(time.time() - t0, 1)
    lines = _bloom_lines(spark, d)
    ref = (
        lines.filter((F.col("doc_id") % 3 == 0) & F.col("line").isNotNull())
        .select("line").distinct().withColumn("_m", F.lit(1))
    )
    exact_dups = (
        lines.filter(F.col("doc_id") % 3 != 0)
        .join(ref, "line", "left")
        .agg(F.sum(F.coalesce("_m", F.lit(0)))).first()[0]
    )
    res["bloom_false_positives"] = int(bagg["dups"] - exact_dups)

    res["jvm_peak_rss_gb"] = jvm_peak_rss_gb()
    res["driver_peak_rss_gb"] = round(
        resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024**2, 2
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
