"""ocr_engine_ray — a Ray-Data-native document-extraction engine.

Rebuilt from scratch from the semantics of ``DarkStar1997/ocr-engine``
(read-only reference at ``/root/reference``): per-document OCR/parse →
reading-order reconstruction → ordered span sequences → order-sensitive field
merging, re-expressed as streaming ``ray.data.Dataset`` pipelines over
zero-copy Arrow batches with actor pools for the stateful OCR stage.

Never calls ``ray.init()`` — sessions are owned by the caller (driver,
bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"
