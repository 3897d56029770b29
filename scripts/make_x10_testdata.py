"""Build the x10 (sf1.0-equivalent) synthetic dataset used by
SCALING.md's decade sweep. Reproducible re-run:

    python scripts/make_x10_testdata.py [OUT_DIR]     # default /tmp/dvdb_sf1

Construction (FK-consistent tiling of /root/testdata/sf0.1, 10 replicas
per row, new key = key*10 + rep):

- embeddings: replica vectors get a small deterministic per-rep per-dim
  perturbation (x + rep*0.001*((i%7)-3)), so replicas are distinct but
  realistically near-duplicate. NOTE the id interleaving this implies:
  vec_ids 0..9 are the TEN REPLICAS OF PARENT 0 — so any "first-k
  embeddings as LSH planes" construction becomes degenerate here
  (pairwise cosine >= 0.994, near-parallel planes; see SCALING.md's
  knn_graph_lsh section). That property is intentional: it is the
  stress case that motivated the capped adaptive-LSH path.
- documents: replica r of doc i = first half of doc i's words + second
  half of a rotated partner doc (rn + r*997 mod n), so replicas are NOT
  near-dups of their parents and dup density stays realistic
  (Jaccard ~0.5 against the parent).
- relational tables (events/orders/lineitem/customer/supplier/part):
  every key and each FK referencing it gets the same key*10+rep mapping,
  so join selectivity matches a true sf1.0. region/nation copy as-is.
"""

import os
import shutil
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import Window
from pyspark.sql import functions as F

from distributed_vector_database_spark.session import get_session

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(out: str) -> None:
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    spark = get_session(app_name="x10-synth")
    reps = F.explode(F.sequence(F.lit(0), F.lit(9))).alias("rep")

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    emb10 = emb.select("*", reps).select(
        (F.col("vec_id") * 10 + F.col("rep")).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: (
                x + (F.col("rep") * 0.001) * ((i % 7) - 3.0)
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )
    emb10.repartition(8).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )

    doc = spark.read.parquet(f"{SRC}/documents.parquet")
    n = doc.count()
    base = doc.withColumn(
        "rn", F.row_number().over(Window.orderBy("doc_id")) - 1
    )
    pairs = (
        base.select("rn", "doc_id", "text", "lang", "source")
        .select("*", reps)
        .withColumn("partner_rn", (F.col("rn") + F.col("rep") * 997) % n)
    )
    partner = base.select(
        F.col("rn").alias("partner_rn"), F.col("text").alias("ptext")
    )
    words = F.split(F.col("text"), " ")
    pwords = F.split(F.col("ptext"), " ")
    doc10 = (
        pairs.join(partner, "partner_rn")
        .select(
            (F.col("doc_id") * 10 + F.col("rep")).alias("doc_id"),
            F.when(F.col("rep") == 0, F.col("text"))
            .otherwise(
                F.concat_ws(
                    " ",
                    F.slice(
                        words, 1, F.floor(F.size(words) / 2).cast("int")
                    ),
                    F.slice(
                        pwords,
                        F.greatest(
                            F.floor(F.size(pwords) / 2).cast("int"),
                            F.lit(1),
                        ),
                        F.size(pwords),
                    ),
                )
            )
            .alias("text"),
            "lang",
            "source",
        )
        .withColumn("n_chars", F.length("text"))
    )
    doc10.repartition(8).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )

    def tile(t, keymap, n_parts=16):
        schema = spark.read.parquet(f"{SRC}/{t}.parquet").schema
        df = spark.read.parquet(f"{SRC}/{t}.parquet").select("*", reps)
        cols = [
            (F.col(f.name) * 10 + F.col("rep"))
            .cast(f.dataType)
            .alias(f.name)
            if f.name in keymap
            else F.col(f.name)
            for f in schema.fields
        ]
        df.select(*cols).repartition(n_parts).write.mode(
            "overwrite"
        ).parquet(f"{out}/{t}.parquet")

    tile("events", {"event_id", "user_id"})
    tile("orders", {"o_orderkey", "o_custkey"})
    tile("lineitem", {"l_orderkey", "l_partkey", "l_suppkey"}, 32)
    tile("customer", {"c_custkey"}, 4)
    tile("supplier", {"s_suppkey"}, 2)
    tile("part", {"p_partkey"}, 4)
    for t in ("region", "nation"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{out}/{t}.parquet")

    for t in (
        "embeddings documents events orders lineitem customer supplier "
        "part"
    ).split():
        print(t, spark.read.parquet(f"{out}/{t}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/dvdb_sf1")
