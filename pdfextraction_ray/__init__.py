"""pdfextraction_ray — a Ray-Data-native document/main-content extraction engine.

A from-scratch rebuild of the query & data-processing capabilities of the
reference repo ``manikumarthati/pdfExtraction`` (see SURVEY.md), expressed as
``ray.data.Dataset`` pipelines: ``map_batches`` over zero-copy Arrow batches,
actor pools for stateful parser stages, explicit partitioning/shuffle for the
wide steps, and per-partition lineage manifests for resumability.

Nothing here imports from the reference; reference file:line citations in
docstrings document which behaviors are reproduced.
"""

__version__ = "0.1.0"
