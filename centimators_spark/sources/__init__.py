from centimators_spark.sources.formats import (
    read_any,
    read_text_corpus,
    write_partitioned,
    write_bucketed_table,
)

__all__ = ["read_any", "read_text_corpus", "write_partitioned", "write_bucketed_table"]
