from riot_spark.streaming.incremental import StreamingIndexer

__all__ = ["StreamingIndexer"]
