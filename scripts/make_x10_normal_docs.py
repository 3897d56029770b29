"""Build a x10 documents corpus at NATURAL duplication density.

The main x10 dataset (scripts/make_x10_testdata.py) deliberately makes
documents dup-DENSE (every replica half-spliced from two parents —
352k candidate pairs vs ~2.5k/slice) to stress the excision pipeline's
worst case. That corpus answers "what does pathological duplication
cost"; it cannot answer "what does the COMMON case cost at 10x data"
(VERDICT r6 item 8). This builds the complement: 10 replicas per doc
where replica r > 0 suffixes every token with "~r", so

  - cross-replica shared token runs are ZERO (every gram differs),
  - within-replica duplication is exactly sf0.1's,
  - total duplication MASS scales linearly with the corpus (10x docs,
    10x duplicate pairs) — constant dup density, the natural law.

Only documents.parquet is produced (the substring-dedup rows read
nothing else). Reproducible re-run:

    python scripts/make_x10_normal_docs.py [OUT_DIR]   # default /tmp/dvdb_x10_normal
"""
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F

from distributed_vector_database_spark.session import get_session

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dvdb_x10_normal"
    spark = get_session(app_name="make-x10-normal")
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    reps = spark.range(10).select(F.col("id").cast("int").alias("rep"))
    tiled = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
        F.when(F.col("rep") == 0, F.col("text"))
        .otherwise(
            F.array_join(
                F.transform(
                    F.split(F.col("text"), r"\s+"),
                    lambda w: F.concat(
                        w, F.lit("~"), F.col("rep").cast("string")
                    ),
                ),
                " ",
            )
        )
        .alias("text"),
        "lang",
        "source",
        F.length(
            F.when(F.col("rep") == 0, F.col("text")).otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), r"\s+"),
                        lambda w: F.concat(
                            w, F.lit("~"), F.col("rep").cast("string")
                        ),
                    ),
                    " ",
                )
            )
        )
        .cast("long")
        .alias("n_chars"),
    )
    os.makedirs(out, exist_ok=True)
    tiled.repartition(8).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    n = spark.read.parquet(f"{out}/documents.parquet").count()
    print(f"wrote {out}/documents.parquet: {n} docs")
    spark.stop()


if __name__ == "__main__":
    main()
