"""ollama_ocr_ray — a Ray-Data-native main-content extraction engine.

A from-scratch rebuild of the data-processing capabilities of the
reference OCR toolkit (ranga-NSL/ollama-ocr, see /root/reference) as a
streaming ``ray.data.Dataset`` pipeline over Arrow tables of interleaved
text + media documents:

    documents(doc_id: string,
              spans: list<struct<kind, text, media_ref, offset:int32>>)
        -> extracted(doc_id: string,
                     spans: list<struct<kind, text, media_ref, order:int32>>)

The reference processes one file at a time in a single process
(``ocr_router.py:391``); here every stage is a ``map_batches`` transform
over zero-copy Arrow batches, stateful OCR runs on an actor pool, and
span reassembly is a hash-partitioned group-by.  See SURVEY.md for the
full operator mapping and ``ollama_ocr_ray.spec`` for the extraction
contract both the engine and the sequential oracle implement.

IMPORTANT: nothing in this package calls ``ray.init()``/``ray.shutdown``;
sessions are owned by the caller (bench.py, CLI, test fixture, driver).
"""

__version__ = "0.1.0"
