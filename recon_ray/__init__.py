"""recon_ray — a Ray-Data-native knowledge-graph construction engine.

A brand-new engine with the query/data-processing capabilities of
kabirkhan/recon (reference at /root/reference, studied for *semantics* only),
re-expressed as idiomatic Ray Data pipelines:

- ``ray.data.Dataset`` pipelines of ``map_batches`` over zero-copy Arrow
  batches (the analogue of recon's per-Example loops,
  reference: recon/operations.py:153-269);
- actor pools for stateful stages (mention detector, entity linker —
  analogue of recon/recognizer.py + recon/linker.py);
- groupby/aggregate/sort shuffles for the wide steps (entity coverage,
  label disparities, canonicalization — analogue of recon/stats.py,
  recon/insights.py);
- per-partition lineage manifests for checkpoint/resume (analogue of the
  OperationState log + commit_hash replay, recon/dataset.py:323-383).

Flagship pipeline: triple extraction over a Parquet source-code corpus
``(repo, path, commit, lang, content)`` → canonical ``(subj, pred, obj)``
Parquet triple tables. See recon_ray/pipelines/kg.py.
"""

__version__ = "0.1.0"
