"""ocr_proofreader_ray — a from-scratch Ray-Data-native batch extraction engine.

Capabilities modeled on the reference ``porcpine1967/ocr-proofreader`` (an OCR
clean-text tool; see SURVEY.md — the reference tree at /root/reference was empty,
so all semantics anchor to BASELINE.json), re-expressed Ray-Data-first:

* ``pipelines.extraction`` — the flagship two-pass pipeline: a streaming
  ``groupby(lang)`` dictionary build, then a stateful actor-pool correction pass
  (hyphen rejoin, garbage filter, edit-distance spell correction) over
  HTML-boilerplate-stripped Common-Crawl-style pages.
* ``pipelines.relational`` — the generic relational operator surface
  (scan/filter/project/aggregate/join/sort/dedup/...) oracle-checked vs DuckDB.
* ``pipelines.dedup`` / ``pipelines.similarity`` / ``pipelines.text_analysis`` —
  training-data-pipeline operators (MinHash-LSH, SimHash, ANN, lang-id, ...).

Everything is expressed over ``ray.data.Dataset`` with zero-copy Arrow batches;
no module in this package calls ``ray.init()``.
"""

__version__ = "0.1.0"
