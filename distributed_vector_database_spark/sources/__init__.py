from distributed_vector_database_spark.sources.vector_store import VectorStore

__all__ = ["VectorStore"]
