"""Model abstraction for the two neural nets (detection + recognition).

Mirrors the seam the reference uses for hermetic tests
(``ocrs/src/model.rs:6-17``): a model exposes ``input_shape()`` (dims are
ints or None for symbolic) and ``run(input) -> np.ndarray``.

``FakeDetectionModel`` / ``FakeRecognitionModel`` reproduce the behavior
of the reference's test models (``ocrs/src/lib.rs:339-422``) so the whole
pipeline is testable without ONNX runtimes:

- fake detection: identity probability map (input + 0.5), fixed 200x100
  input;
- fake recognition: C=1, H=64 input; max-pool width by 4 and re-interpret
  each input row as a class probability, output ``[W/4, N, H]``
  (seq, batch, class).

``OnnxModel`` wraps an onnxruntime session when that package is
available (it is not in this sandbox; the wrapper is import-gated).
"""

from __future__ import annotations

import numpy as np

# 96-char default alphabet; index 0 in CTC labels is blank, label i+1 is
# alphabet[i] (lib.rs:34,153-170). The "E" before "ABCDE" stands in for
# the euro sign in the reference too.
DEFAULT_ALPHABET = (
    " 0123456789!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~E"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
)


class Model:
    """Protocol: input_shape() -> list[int | None]; run(np.ndarray) -> np.ndarray."""

    def input_shape(self) -> list:
        raise NotImplementedError

    def run(self, input: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class FakeDetectionModel(Model):
    """Adds +0.5 to the [-0.5, 0.5] input, producing a probability map
    equal to the original pixel intensity (lib.rs:339-362)."""

    def __init__(self, height: int = 200, width: int = 100):
        self._h, self._w = height, width

    def input_shape(self):
        return [None, 1, self._h, self._w]

    def run(self, input: np.ndarray) -> np.ndarray:
        out = np.asarray(input, dtype=np.float32) + np.float32(0.5)
        return out.astype(np.float32, copy=False)


class FakeRecognitionModel(Model):
    """Max-pools width by 4 and transposes to [W/4, N, H]: each input row
    acts as the log-prob of one class (lib.rs:364-422)."""

    W_SCALE = 4

    def __init__(self, height: int = 64):
        self._h = height

    def input_shape(self):
        return [None, 1, self._h, None]

    def run(self, input: np.ndarray) -> np.ndarray:
        nchw = np.asarray(input, dtype=np.float32)
        assert nchw.ndim == 4 and nchw.shape[1] == 1
        nhw = nchw[:, 0]
        n, h, w = nhw.shape
        assert h == self._h
        wp = w // self.W_SCALE
        pooled = nhw[:, :, : wp * self.W_SCALE].reshape(n, h, wp, self.W_SCALE).max(axis=3)
        # [N, H(class), W/4(seq)] -> [seq, batch, class]
        return np.ascontiguousarray(pooled.transpose(2, 0, 1))


def fake_alphabet(n_classes: int = 64) -> str:
    """Alphabet sized to the fake recognition model's class count
    (lib.rs:424-427): first n_classes - 1 chars of the default alphabet."""
    return DEFAULT_ALPHABET[: n_classes - 1]


class OnnxModel(Model):
    """onnxruntime-backed model (real ocrs ONNX exports,
    ocrs/examples/download-models.sh). Import-gated: raises a clear error
    if onnxruntime is unavailable."""

    def __init__(self, model_bytes: bytes, intra_op_threads: int = 1):
        try:
            import onnxruntime as ort
        except ImportError as exc:  # pragma: no cover - not installed here
            raise RuntimeError(
                "onnxruntime is not installed; use the fake models or install onnxruntime"
            ) from exc
        opts = ort.SessionOptions()
        opts.intra_op_num_threads = intra_op_threads
        self._session = ort.InferenceSession(model_bytes, sess_options=opts)
        self._input = self._session.get_inputs()[0]

    def input_shape(self):
        return [d if isinstance(d, int) else None for d in self._input.shape]

    def run(self, input: np.ndarray) -> np.ndarray:
        (out,) = self._session.run(None, {self._input.name: np.asarray(input, dtype=np.float32)})
        return out


# ---------------------------------------------------------------------------
# Model-source resolution (parity: ocrs-cli/src/models.rs:14-107).
# The reference CLI accepts a URL or a local path for each model,
# downloads URLs once into ~/.cache/ocrs/<filename>, and reuses the
# cached copy on every later run. Same contract here, with the fetch
# itself injectable so the resolution logic is testable (and usable)
# without network access; the default fetcher is stdlib urllib. In a
# Spark job the driver resolves the source once and broadcasts the
# bytes / ships the file via SparkFiles — executors never fetch.

# Default model URLs published by the reference CLI
# (ocrs-cli/src/main.rs:305-309). The reference serves .rten; the same
# bucket's ONNX exports (ocrs/examples/download-models.sh) are what
# OnnxModel consumes.
DETECTION_MODEL_URL = (
    "https://ocrs-models.s3-accelerate.amazonaws.com/text-detection.rten"
)
RECOGNITION_MODEL_URL = (
    "https://ocrs-models.s3-accelerate.amazonaws.com/text-recognition.rten"
)


def cache_dir() -> str:
    """``~/.cache/ocrs``, created if missing (models.rs:17-26)."""
    import os

    d = os.path.join(os.path.expanduser("~"), ".cache", "ocrs")
    os.makedirs(d, exist_ok=True)
    return d


def filename_from_url(url: str) -> str | None:
    """Last path segment of ``url``, or None if it has no usable file
    name (models.rs:31-39)."""
    from urllib.parse import urlparse

    name = urlparse(url).path.rsplit("/", 1)[-1]
    return name or None


def _default_fetcher(url: str) -> bytes:  # pragma: no cover - needs network
    from urllib.request import urlopen

    with urlopen(url) as resp:
        return resp.read()


def download_file(url: str, filename: str | None = None, fetcher=None) -> str:
    """Fetch ``url`` into the cache unless already present; return the
    local path (models.rs:44-64). ``fetcher``: url -> bytes (default:
    urllib). The cache hit never calls the fetcher, so repeated runs
    are offline-safe once a model is cached."""
    import os

    name = filename or filename_from_url(url)
    if name is None:
        raise ValueError(f"could not derive a destination filename from {url!r}")
    path = os.path.join(cache_dir(), name)
    if os.path.exists(path):
        return path
    data = (fetcher or _default_fetcher)(url)
    tmp = f"{path}.tmp-{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: concurrent resolvers never see a torn file
    return path


def resolve_model_source(source: str, fetcher=None) -> str:
    """URL or local path -> local path (ModelSource, models.rs:74-107):
    http(s) URLs download-and-cache; anything else must be an existing
    file."""
    import os

    if source.startswith(("http://", "https://")):
        return download_file(source, fetcher=fetcher)
    if not os.path.exists(source):
        raise FileNotFoundError(f"model file not found: {source}")
    return source
