"""Large-scale training-data pipeline operators over Ray Data.

Beyond the extraction engine (``ollama_ocr_ray.pipelines``), these are
the text-analysis, deduplication and similarity-search stages a 100 TB
corpus pipeline needs; each is a vectorized ``map_batches`` transform or
an actor-pool stage, exposed as a driver-checkable query in
``ollama_ocr_ray.queries``.
"""
