"""ocrs_spark: a from-scratch PySpark-native OCR extraction engine with
the capabilities of robertknight/ocrs (reference at /root/reference).

Layers:
- ``kernels``: pure-numpy pipeline stages (preprocess, detection
  post-processing, layout analysis, recognition, CTC);
- ``engine``: per-image OcrEngine mirroring the reference's public API;
- ``models``: model seam (fake hermetic models + gated onnxruntime);
- ``pipeline``: the Spark orchestration (explode -> skew-balanced
  mapInPandas OCR -> ordered span reweave -> checkpointed sink);
- ``ops``: large-scale training-data operators (dedup, similarity
  search, text analysis, multimodal plumbing) over the test tables.
"""

from .engine import OcrEngine, OcrEngineParams
from .models import DEFAULT_ALPHABET, FakeDetectionModel, FakeRecognitionModel

__all__ = [
    "OcrEngine",
    "OcrEngineParams",
    "DEFAULT_ALPHABET",
    "FakeDetectionModel",
    "FakeRecognitionModel",
]
