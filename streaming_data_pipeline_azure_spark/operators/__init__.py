"""Operator library — each module maps to SURVEY.md §2 inventory rows.

Import submodules directly, e.g.::

    from streaming_data_pipeline_azure_spark.operators import enrich, relational
"""
