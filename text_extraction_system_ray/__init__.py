"""text_extraction_system_ray — a Ray-Data-native main-content extraction engine.

A from-scratch rebuild of the *capabilities* of LexPredict
``text-extraction-system`` (reference at ``/root/reference``, v1.3.2.1) as a
streaming ``ray.data.Dataset`` pipeline over Parquet tables of
Common-Crawl-style web pages ``(url, warc_ts, html, text, lang)``:

- HTML branch: DOM block tree + text-density / link-density boilerplate
  classification (Readability/Boilerpipe-style) built on the stdlib parser.
- PDF branch: an in-process layout parse of PDF content streams emitting
  text + per-character bounding boxes (the reference shells out to a Java
  PDFBox driver per document; see SURVEY.md §2.2 M4).
- Structure enrichment: pages / paragraphs / sentences / sections / TOC /
  title / language as character-offset spans, mirroring the reference DTOs
  (``text_extraction_system_api/dto.py:84-206``).
- Stateful stages as map_batches actor pools; one optional shuffle
  (groupby(url) reassembly of page-split PDF chunks); partitioned,
  resumable checkpoint sink.

The per-row extraction function (:func:`extract.extract_row`) is the
engine's *oracle*: applying it serially in plain Python yields byte-identical
text/spans to the distributed pipeline, which is the correctness contract.
"""

__version__ = "0.1.0"
