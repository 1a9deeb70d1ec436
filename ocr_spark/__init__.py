"""ocr_spark — a PySpark-native document-extraction analytics engine.

A from-scratch re-expression of the query/data-processing semantics of the
reference OCR service (MahmoudM69/OCR, read-only at /root/reference) as an
idiomatic Spark pipeline:

* input:  ``documents(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
          plus a ``media(media_ref, png, width, height)`` side table
* media spans:  analyze -> conditional preprocess -> content-aware split ->
          per-chunk extract -> reading-order merge with overlap dedup
* text spans:   text-density / link-density boilerplate classifier
* pdf spans:    page render -> per-page media flow -> page-marker reassembly
* output: ordered spans per doc + metrics + lineage, checkpointed per partition

All pixel work is pure numpy inside Arrow-batched pandas UDFs (mapInPandas /
applyInPandas); everything relational is plain DataFrame ops so Catalyst can
prune/push down/broadcast.  See SURVEY.md for the full operator inventory and
reference file:line citations.
"""

__version__ = "0.1.0"
