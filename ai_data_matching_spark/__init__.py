"""PySpark-native record-linkage / entity-resolution engine.

A from-scratch re-expression of the semantics of ``cchen362/AI-Data-Matching``
(two-phase exact+fuzzy entity matcher, see /root/reference) as an idiomatic
Spark DataFrame pipeline over Common-Crawl-style web pages:

* phase 1 — exact blocking on normalized-domain + simhash-band keys
  (salted hash join, skew splitting)                      [operators.blocking]
* phase 2 — vectorized candidate-pair scoring (Jaro-Winkler, token-set /
  InDel Levenshtein, MinHash-Jaccard) via pandas/Arrow UDFs [operators.scoring]
* phase 3 — transitive clustering via iterative large-star/small-star
  connected components                                    [operators.clustering]
* entity rollups mirroring the reference's consolidation   [operators.consolidate]
* training-data-pipeline extras: dedup (exact / MinHash-LSH / SimHash /
  n-gram Jaccard / embedding cosine), ANN similarity search (brute force /
  LSH / IVF), text analysis, multimodal binary plumbing    [operators.*]
* incremental ER — fold new-page batches into a committed run
  without rescoring old-old pairs                          [operators.incremental]
* continuous ER — drop-folder stream → foreachBatch incremental fold,
  restart-chained through the snapshot manifest            [streaming.resolve]

All heavy work is DataFrame/SQL (Catalyst + whole-stage codegen); Python
appears only inside Arrow-batched pandas UDFs.
"""

__version__ = "0.1.0"
