"""Sources & sinks: table catalog, batch readers, and lake writers."""

from music_recommendation_service_spark.sources.catalog import Catalog, TABLES
from music_recommendation_service_spark.sources.writers import (
    write_table,
    write_partitioned,
    append_table,
)

__all__ = ["Catalog", "TABLES", "write_table", "write_partitioned", "append_table"]
