"""Generate RECALL.md — the recall/latency trade-off table for every
approximate search strategy, against exact brute force as ground truth.

The reference's benchmarks measure latency only (BASELINE.md); an ANN
engine must publish BOTH axes, since nprobe/bits/codebook size buy speed
with recall. Usage:

    python recall_report.py [sf_dir] > RECALL.md
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from distributed_vector_database_spark.session import get_session
from distributed_vector_database_spark.operators.ivf import IVFIndex
from distributed_vector_database_spark.operators.ann import (
    lsh_index,
    lsh_search,
    random_hyperplanes,
)
from distributed_vector_database_spark.operators.pq import (
    fit_pq_codebooks,
    pq_adc_topk,
    pq_encode_arrow,
)
from distributed_vector_database_spark.operators.topk import topk

K = 10
N_QUERIES = 20
NPROBES = (1, 2, 4, 8, 16)


def timed(fn, warmups=1, trials=3):
    for _ in range(warmups):
        fn()
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return statistics.mean(ts)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_session(app_name="recall-report")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    qs = [
        [float(x) for x in r["embedding"]]
        for r in emb.orderBy("vec_id").limit(N_QUERIES).collect()
    ]

    truth = []
    for q in qs:
        truth.append(
            {r["vec_id"] for r in topk(emb, q, K, metric="cosine").collect()}
        )
    exact_sec = timed(lambda: topk(emb, qs[0], K, metric="cosine").collect())

    print(f"# RECALL — recall@{K} vs latency, {n} vectors (64-d), {sf_dir}")
    print()
    print(f"Ground truth: exact cosine top-{K} ({exact_sec:.3f} s/query).")
    print(f"Mean over {N_QUERIES} queries; latency = mean of 3 runs, 1 warm-up.")
    print()
    print("| strategy | params | recall@10 | sec/query | corpus read |")
    print("|---|---|---|---|---|")
    print(f"| exact brute force | — | 1.000 | {exact_sec:.3f} | 100% floats |")

    # IVF
    idx = IVFIndex.build(emb, 16, sample_fraction=0.5)
    for nprobe in NPROBES:
        recs = []
        for q, t in zip(qs, truth):
            got = {
                r["vec_id"] for r in idx.search(q, K, nprobe=nprobe).collect()
            }
            recs.append(len(got & t) / len(t))
        sec = timed(lambda: idx.search(qs[0], K, nprobe=nprobe).collect())
        print(
            f"| IVF | nprobe={nprobe}/16 | {statistics.mean(recs):.3f} "
            f"| {sec:.3f} | ~{nprobe / 16:.0%} floats |"
        )

    # PQ ADC (+ exact re-rank)
    for m, kc in ((16, 16), (32, 16)):
        books = fit_pq_codebooks(emb, m=m, k=kc, sample_n=2048, iters=8)
        enc = pq_encode_arrow(emb, books).select("vec_id", "codes").cache()
        enc.count()
        recs, rr_recs = [], []
        for q, t in zip(qs, truth):
            short = pq_adc_topk(enc, books, q, k=50, method="gather")
            got = {
                r["vec_id"]
                for r in short.limit(K).collect()
            }
            recs.append(len(got & t) / len(t))
            rr = topk(
                emb.join(F.broadcast(short.select("vec_id")), "vec_id"),
                q,
                K,
                metric="cosine",
            )
            rr_ids = {r["vec_id"] for r in rr.collect()}
            rr_recs.append(len(rr_ids & t) / len(t))
        sec = timed(
            lambda: pq_adc_topk(enc, books, qs[0], k=K, method="gather").collect()
        )
        bytes_frac = m / (64 * 4)
        print(
            f"| PQ-ADC | m={m},k={kc} | {statistics.mean(recs):.3f} "
            f"| {sec:.3f} | {bytes_frac:.0%} bytes (codes) |"
        )
        print(
            f"| PQ-ADC → exact re-rank | m={m}, R=50 | "
            f"{statistics.mean(rr_recs):.3f} | {sec:.3f}+ε | codes + 50 floats |"
        )
        enc.unpersist()

    # SQ8 scalar quantization: 1 byte/dim, inline dequant in codegen —
    # near-lossless (error <= scale/2 per dim), the 4x-bytes cut that
    # keeps recall while PQ trades it.
    from distributed_vector_database_spark.operators.sq import (
        fit_sq_bounds,
        sq_encode_col,
        sq_topk,
    )

    bounds = fit_sq_bounds(emb)
    coded8 = emb.select(
        "vec_id", sq_encode_col("embedding", bounds).alias("codes")
    ).cache()
    coded8.count()
    recs = []
    for q, t in zip(qs, truth):
        got = {r["vec_id"] for r in sq_topk(coded8, q, bounds, k=K).collect()}
        recs.append(len(got & t) / len(t))
    sec = timed(lambda: sq_topk(coded8, qs[0], bounds, k=K).collect())
    print(
        f"| SQ8 scalar quant | 1 byte/dim | {statistics.mean(recs):.3f} "
        f"| {sec:.3f} | 25% bytes (codes) |"
    )
    coded8.unpersist()

    # residual IVF-PQ (IVFADC): PQ on centroid residuals, per-cell LUTs.
    # Same bits as PQ-ADC m=16 above; the residual basis concentrates the
    # quantizer on within-cell displacement -> better codes, and nprobe
    # composes pruning with the compressed scan.
    from distributed_vector_database_spark.operators.ivf import (
        assign_shards,
        fit_centroids,
    )
    from distributed_vector_database_spark.operators.pq import (
        ivfpq_residual_topk,
        pq_encode,
        residual_col,
    )

    cents16 = fit_centroids(emb, 16, sample_fraction=0.5)
    assigned = assign_shards(emb, cents16)
    res_books = fit_pq_codebooks(
        assigned.select(
            "vec_id",
            residual_col("embedding", "shard_id", cents16).alias("embedding"),
        ),
        m=16,
        k=16,
        sample_n=2048,
        iters=8,
    )
    renc = assigned.select(
        "vec_id",
        "shard_id",
        pq_encode(
            residual_col("embedding", "shard_id", cents16), res_books
        ).alias("codes"),
    ).cache()
    renc.count()
    for nprobe in (2, 4, 16):
        recs = []
        for q, t in zip(qs, truth):
            got = {
                r["vec_id"]
                for r in ivfpq_residual_topk(
                    renc, cents16, res_books, q, k=K, nprobe=nprobe,
                    method="gather",
                ).collect()
            }
            recs.append(len(got & t) / len(t))
        sec = timed(
            lambda: ivfpq_residual_topk(
                renc, cents16, res_books, qs[0], k=K, nprobe=nprobe,
                method="gather",
            ).collect()
        )
        print(
            f"| residual IVF-PQ | m=16,k=16, nprobe={nprobe}/16 | "
            f"{statistics.mean(recs):.3f} | {sec:.3f} "
            f"| ~{nprobe / 16:.0%} of 6% bytes (codes) |"
        )
    renc.unpersist()

    # sign-LSH
    for bits, multiprobe in ((8, False), (8, True)):
        planes = random_hyperplanes(64, n_planes=bits, seed=42)
        indexed = lsh_index(emb, planes).cache()
        indexed.count()
        recs = []
        for q, t in zip(qs, truth):
            got = {
                r["vec_id"]
                for r in lsh_search(
                    indexed, planes, q, k=K, multiprobe=multiprobe
                ).collect()
            }
            recs.append(len(got & t) / len(t))
        sec = timed(
            lambda: lsh_search(
                indexed, planes, qs[0], k=K, multiprobe=multiprobe
            ).collect()
        )
        label = "multiprobe(H1)" if multiprobe else "single bucket"
        frac = (bits + 1 if multiprobe else 1) / (2**bits)
        print(
            f"| sign-LSH | {bits} bits, {label} | {statistics.mean(recs):.3f} "
            f"| {sec:.3f} | ~{frac:.1%} floats |"
        )
        indexed.unpersist()

    # binary (1-bit sign) quantization: symmetric Hamming, asymmetric
    # dot(q, sign(d)) at the same storage, and Hamming with exact re-rank
    from distributed_vector_database_spark.operators.ann import (
        binary_asym_topk,
        binary_rerank_topk,
        binary_topk,
    )

    recs, asym_recs, rr_recs = [], [], []
    for q, t in zip(qs, truth):
        got = {r["vec_id"] for r in binary_topk(emb, q, K).collect()}
        recs.append(len(got & t) / len(t))
        asym = {r["vec_id"] for r in binary_asym_topk(emb, q, K).collect()}
        asym_recs.append(len(asym & t) / len(t))
        rr = {
            r["vec_id"]
            for r in binary_rerank_topk(emb, q, k=K, shortlist=50).collect()
        }
        rr_recs.append(len(rr & t) / len(t))
    sec = timed(lambda: binary_topk(emb, qs[0], K).collect())
    asym_sec = timed(lambda: binary_asym_topk(emb, qs[0], K).collect())
    rr_sec = timed(
        lambda: binary_rerank_topk(emb, qs[0], k=K, shortlist=50).collect()
    )
    print(
        f"| binary (sign) Hamming | 1 bit/dim | {statistics.mean(recs):.3f} "
        f"| {sec:.3f} | 3% bytes (signs) |"
    )
    print(
        f"| binary asymmetric dot(q, sign(d)) | 1 bit/dim "
        f"| {statistics.mean(asym_recs):.3f} "
        f"| {asym_sec:.3f} | 3% bytes (signs) |"
    )
    print(
        f"| binary → exact re-rank | R=50 | {statistics.mean(rr_recs):.3f} "
        f"| {rr_sec:.3f} | signs + 50 floats |"
    )

    # Matryoshka truncated-dim shortlist + full re-rank
    from distributed_vector_database_spark.operators.ann import (
        matryoshka_rerank_topk,
    )

    for pdim in (8, 16, 32):
        recs = []
        for q, t in zip(qs, truth):
            got = {
                r["vec_id"]
                for r in matryoshka_rerank_topk(
                    emb, q, k=K, prefix_dim=pdim, shortlist=50
                ).collect()
            }
            recs.append(len(got & t) / len(t))
        sec = timed(
            lambda: matryoshka_rerank_topk(
                emb, qs[0], k=K, prefix_dim=pdim, shortlist=50
            ).collect()
        )
        print(
            f"| matryoshka → re-rank | prefix={pdim}/64, R=50 "
            f"| {statistics.mean(recs):.3f} | {sec:.3f} "
            f"| {pdim / 64:.0%} floats + 50 full |"
        )

    print()
    print(
        "Note on binary/matryoshka recall HERE: the synthetic embeddings are\n"
        "~zero-mean i.i.d., the regime sign bits and dim prefixes like least\n"
        "(every projection carries equal variance). Trained embeddings are\n"
        "anisotropic (and MRL-trained ones front-loaded), where these two\n"
        "sit near PQ's recall at a fraction of its compute.\n"
    )
    print(
        "Reading: IVF trades recall linearly in probed fraction; PQ keeps\n"
        "whole-corpus coverage at 1/16-1/8 of the bytes (re-rank recovers\n"
        "most of the quantization loss); LSH reads the least but pays the\n"
        "most recall. At 100 TB the strategies compose: IVF prune -> PQ\n"
        "ADC shortlist -> exact re-rank of R rows (queries `ivfpq_search`,\n"
        "`pq_rerank_topk`). Residual IVF-PQ (IVFADC) reconstructs strictly\n"
        "better than plain PQ at equal bits (tested invariant) but ties it\n"
        "on recall@10 for THIS corpus — the synthetic embeddings have weak\n"
        "cluster structure, so centroid residuals shrink little variance;\n"
        "on clustered real corpora the residual basis is the right default."
    )
    spark.stop()


if __name__ == "__main__":
    main()
