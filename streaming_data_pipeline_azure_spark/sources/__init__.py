"""Source & sink registry."""

from streaming_data_pipeline_azure_spark.sources.registry import (  # noqa: F401
    SOURCES,
    read_source,
)
