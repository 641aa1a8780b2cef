"""pq_adc at the advertised query cap (r11 verdict #4).

SCALE.md's r11 hardening claims the chunked ADC LUT build turned an
~8.6 GB transient (an executor OOM dressed as a scale path) into a
~67 MB one at the documented `max_broadcast_queries` cap. This harness
proves the cap is actually runnable:

1. KERNEL: the exact per-worker LUT construction + scoring arithmetic
   of operators/pq.pq_adc_topk run standalone over 65,536 x 64d queries
   (m=8, 256 codes), with peak-RSS instrumentation (ru_maxrss) — the
   number the monolithic tensor would have needed is reported next to
   it from the closed form nq x m x n_codes x dsub x 8 bytes.
2. END-TO-END: pq_adc_topk itself at the full cap over the sf0.1 codes
   table on local[32], wall time + row count + min MemAvailable sampled
   during the run (the whole-box pressure the 32 concurrent workers,
   each holding one nq x m x n_codes LUT, actually exert).

Prints one JSON line; SCALE.md r12 records it.
"""

from __future__ import annotations

import json
import os
import resource
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
NQ = 65_536
DIM = 64
M, N_CODES = 8, 256


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def kernel_at_cap() -> dict:
    """The worker-side arithmetic at cap, standalone: chunked LUT build
    (bit-equal to pq_adc_topk's) + one scoring pass over a 4k-row code
    partition."""
    rng = np.random.RandomState(20260816)
    qmat = rng.normal(size=(NQ, DIM)).astype(np.float64)
    books = rng.normal(size=(M, N_CODES, DIM // M)).astype(np.float64)
    codes = rng.randint(0, N_CODES, size=(4096, M)).astype(np.int64)
    dsub = DIM // M
    rss0 = _rss_mb()
    t0 = time.time()
    lut = np.empty((NQ, M, N_CODES), dtype=np.float64)
    for q0 in range(0, NQ, 4096):
        q1 = min(q0 + 4096, NQ)
        for s in range(M):
            diff = (
                qmat[q0:q1, s * dsub : (s + 1) * dsub].reshape(-1, 1, dsub)
                - books[s][None, :, :]
            )
            lut[q0:q1, s, :] = (diff * diff).sum(axis=2)
    lut_sec = time.time() - t0
    subs = np.arange(M)
    t0 = time.time()
    acc = 0.0
    for j in range(0, NQ, 1024):  # sample scoring cost: 1/64 of queries
        d2 = lut[j][subs[None, :], codes].sum(axis=1)
        acc += float(d2[0])
    score_64th_sec = time.time() - t0
    return {
        "lut_build_sec": round(lut_sec, 2),
        "lut_resident_mb": round(lut.nbytes / 2**20, 1),
        "chunk_transient_mb": round(4096 * N_CODES * dsub * 8 / 2**20, 1),
        "monolith_would_be_mb": round(NQ * M * N_CODES * dsub * 8 / 2**20, 1),
        "peak_rss_delta_mb": round(_rss_mb() - rss0, 1),
        "score_pass_est_sec_per_4krows": round(score_64th_sec * 64, 1),
        "_acc": acc,  # defeat dead-code elimination
    }


def end_to_end_at_cap() -> dict:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from vettore_spark.operators import pq as PQ

    spark = (
        SparkSession.builder.master("local[32]")
        .appName("vettore-pq-capbench")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    samp = np.array(
        [
            r["embedding"]
            for r in emb.select("embedding").orderBy("vec_id").limit(2000).collect()
        ],
        dtype=np.float64,
    )
    books = PQ.pq_train_kmeans(samp, m=M, n_codes=N_CODES, iters=5)
    codes_df = PQ.pq_encode(emb, books, id_col="vec_id", vector_col="embedding")
    codes_df = codes_df.persist()
    n_rows = codes_df.count()

    rng = np.random.RandomState(7)
    qpdf = [
        (int(i), [float(x) for x in rng.normal(size=DIM)]) for i in range(NQ)
    ]
    qdf = spark.createDataFrame(qpdf, "query_id long, query_vector array<double>")

    mem_min = [float("inf")]
    stop = threading.Event()

    def sampler() -> None:
        while not stop.is_set():
            with open("/proc/meminfo") as fh:
                for line in fh:
                    if line.startswith("MemAvailable:"):
                        mem_min[0] = min(mem_min[0], int(line.split()[1]) / 1024)
                        break
            stop.wait(0.5)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.time()
    out = PQ.pq_adc_topk(
        codes_df, qdf, books, k=10, id_col="vec_id",
        max_broadcast_queries=NQ,
    )
    n_out = out.count()
    wall = time.time() - t0
    stop.set()
    th.join(2)
    codes_df.unpersist()
    spark.stop()
    return {
        "corpus_rows": n_rows,
        "n_queries": NQ,
        "result_rows": n_out,
        "wall_sec": round(wall, 1),
        "min_mem_available_gb": round(mem_min[0] / 1024, 1),
    }


def main() -> int:
    rec = {"kernel_at_cap": kernel_at_cap()}
    rec["kernel_at_cap"].pop("_acc")
    rec["end_to_end_at_cap"] = end_to_end_at_cap()
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
