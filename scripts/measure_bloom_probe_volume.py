"""Round-8 Bloom measurement (VERDICT r7 item 5):

1. MEASURE the screened protocol's probe-volume cut (grams_probed vs
   grams exact-verified) — the ~400x SCALING.md asserted.
2. Size the direct-flag configuration: 32 bits/gram k=8 doc-level FPR,
   measured next to the 16/4 cell's 11%.

Protocol identical to the round-7 SCALING measurement: x10 NATURAL
corpus, eval = the 1,000 rep-0 originals of source docs 0..999
(doc_id < 10000 AND doc_id % 10 == 0), train = the other 49,000.
"""
import sys, time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from distributed_vector_database_spark.session import get_session
from distributed_vector_database_spark.operators.curation import (
    _shingles,
    bloom_screened_contaminated_ids,
)
from distributed_vector_database_spark.operators.sketch import (
    bloom_build,
    bloom_contains,
)

spark = get_session(app_name="bloom-probe-volume")
docs = spark.read.parquet("/tmp/dvdb_x10_normal/documents.parquet")
is_eval = (F.col("doc_id") < 10000) & (F.col("doc_id") % 10 == 0)
ev = docs.filter(is_eval)
tr = docs.filter(~is_eval)
print("eval docs:", ev.count(), "train docs:", tr.count(), flush=True)

# --- 1. screened-protocol work ledger at 16 bits/gram k=4 ---
t0 = time.time()
flags, stats = bloom_screened_contaminated_ids(
    tr, ev, ngram=3, bits_per_gram=16, num_hashes=4, with_gram_stats=True
)
row = stats.collect()[0]
n_flag_screened = flags.count()
print(
    f"screened 16/4: probed={row['grams_probed']} maybe={row['grams_maybe']}"
    f" contaminated={row['grams_contaminated']}"
    f" probe_volume_cut={row['grams_probed']/max(row['grams_maybe'],1):.1f}x"
    f" flagged_docs={n_flag_screened} wall={time.time()-t0:.1f}s",
    flush=True,
)

# --- exact flags (ground truth) ---
eval_sh = (
    ev.select(F.explode(_shingles("text", 3)).alias("shingle"))
    .distinct()
    .localCheckpoint(eager=True)
)
n_grams = eval_sh.count()
tr_sh = tr.select(
    F.col("doc_id"), F.explode(_shingles("text", 3)).alias("shingle")
)
exact_ids = (
    tr_sh.join(F.broadcast(eval_sh), "shingle", "left_semi")
    .select("doc_id").distinct().localCheckpoint(eager=True)
)
n_exact = exact_ids.count()
print(f"exact: eval grams={n_grams} flagged_docs={n_exact}", flush=True)

# --- 2. direct-flag doc FPR at 16/4 and 32/8 ---
for bits, k in ((16, 4), (32, 8)):
    num_bits = max(bits * n_grams, 1024)
    bloom = bloom_build(eval_sh, "shingle", num_bits=num_bits, num_hashes=k)
    probe = tr_sh.select("shingle").distinct()
    maybe = (
        bloom_contains(bloom, probe, "shingle", num_bits=num_bits, num_hashes=k)
        .filter(F.col("maybe_present")).select("shingle")
    )
    direct_ids = (
        tr_sh.join(F.broadcast(maybe), "shingle", "left_semi")
        .select("doc_id").distinct()
    )
    n_direct = direct_ids.count()
    n_false = direct_ids.join(exact_ids, "doc_id", "left_anti").count()
    print(
        f"direct {bits}/{k}: bitmap={num_bits//8//1024}KB"
        f" flagged={n_direct} false_docs={n_false}"
        f" doc_fpr={100.0*n_false/49000:.4f}%",
        flush=True,
    )
print("DONE", flush=True)
