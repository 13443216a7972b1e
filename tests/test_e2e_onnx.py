"""Real-model end-to-end goldens, mirroring the reference's
``tools/test-e2e.py:32-86``: run the full engine with the published ocrs
ONNX exports over the reference CLI's test images and require exact
text equality with the committed ``.expected.txt`` baselines.

This sandbox has no onnxruntime and no network, so the suite SKIPS
cleanly here (the fake-model layer mirrors the reference's own hermetic
strategy, ``ocrs/src/lib.rs:339-422``). The moment the environment
grows onnxruntime + the model files, these tests run for real and probe
the resize/fillPoly/contour parity risks (SURVEY.md §7) on real masks.

Model discovery (first hit wins):
  1. ``$OCRS_DETECTION_ONNX`` / ``$OCRS_RECOGNITION_ONNX``
  2. ``~/.cache/ocrs/text-detection.onnx`` +
     ``~/.cache/ocrs/text-recognition.onnx`` (the cache dir the
     reference CLI downloads models into, ocrs-cli/src/models.rs)
"""

import os

import pytest

TEST_DATA = "/root/reference/ocrs-cli/test-data"
CASES = ["polar-bears", "why-rust"]


def _model_paths():
    det = os.environ.get("OCRS_DETECTION_ONNX")
    rec = os.environ.get("OCRS_RECOGNITION_ONNX")
    if det and rec and os.path.exists(det) and os.path.exists(rec):
        return det, rec
    cache = os.path.expanduser("~/.cache/ocrs")
    det = os.path.join(cache, "text-detection.onnx")
    rec = os.path.join(cache, "text-recognition.onnx")
    if os.path.exists(det) and os.path.exists(rec):
        return det, rec
    return None


def _runtime_available() -> bool:
    try:
        import onnxruntime  # noqa: F401

        return True
    except ImportError:
        return False


requires_real_models = pytest.mark.skipif(
    not (_runtime_available() and _model_paths() and os.path.isdir(TEST_DATA)),
    reason="needs onnxruntime + ocrs ONNX models + reference test images",
)


@pytest.fixture(scope="module")
def real_engine():
    from ocrs_spark.engine import OcrEngine, OcrEngineParams
    from ocrs_spark.models import DEFAULT_ALPHABET, OnnxModel

    det_path, rec_path = _model_paths()
    with open(det_path, "rb") as f:
        det = OnnxModel(f.read())
    with open(rec_path, "rb") as f:
        rec = OnnxModel(f.read())
    return OcrEngine(
        OcrEngineParams(
            detection_model=det,
            recognition_model=rec,
            alphabet=DEFAULT_ALPHABET,
        )
    )


@requires_real_models
@pytest.mark.parametrize("case", CASES)
def test_real_model_golden_text(real_engine, case):
    from ocrs_spark.codec import decode_image

    with open(f"{TEST_DATA}/{case}.png", "rb") as f:
        img = decode_image(f.read())
    with open(f"{TEST_DATA}/{case}.expected.txt") as f:
        expected = f.read().strip()
    grey = real_engine.prepare_input(img)
    text = real_engine.get_text(grey).strip()
    assert text == expected
