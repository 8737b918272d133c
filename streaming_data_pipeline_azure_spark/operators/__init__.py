"""Operator library — each module maps to SURVEY.md §2 inventory rows
(see §2.4 for the full implementation map).

Import submodules directly, e.g.::

    from streaming_data_pipeline_azure_spark.operators import enrich, dedup

Modules: ``enrich`` (flagship J1+P1 join), ``relational`` (F1/A1-A3/T1),
``dedup`` (exact / normalized / MinHash-LSH / OPH / SimHash / char-ngram /
prefix-filter-exact / embedding / connected-components), ``similarity``
(brute-force, batched multi-query, all-pairs BLAS, IVF index), ``text``
(tokens, BPE-ish counts, language ID, quality, fingerprints), ``multimodal``
(binary payload decode/feature/resize/frames), ``temporal`` (as-of join,
range join, top-N per group), ``skew`` (salted join/agg), ``profile``
(column profiling, sketches), ``sampling`` (deterministic splits,
stratified domain mixing), ``packing`` (sequence packing), ``corpus``
(n-gram decontamination, repetition filters, chunking, TF-IDF).
"""
