"""ctypes loader for the native (C++) data-path library.

Builds ``csrc/libmmu_native.so`` on first use (g++, no pybind11 in this
environment) and exposes :class:`NativeTokenizer` — an ASCII-fast-path
WordPiece tokenizer that produces *identical* output to the Python
implementation (non-ASCII texts are routed to Python; verified by
``tests/test_native_tokenizer.py``). Falls back to pure Python transparently
if no C++ toolchain is available.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import List, Optional

import numpy as np

logger = logging.getLogger(__name__)

_CSRC = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "csrc")
_LIB_PATH = os.path.join(_CSRC, "build", "libmmu_native.so")

_lib = None
_build_failed = False
_load_lock = threading.Lock()


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:  # fast path, no lock once loaded
        return _lib
    with _load_lock:  # one builder: concurrent first callers (loader
        # worker threads) must not race `make` relinking the .so another
        # thread is dlopening
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        # Always invoke make: a no-op when build/ is current, and rebuilds
        # a stale .so after a csrc/ source change (mtime-driven).
        try:
            subprocess.run(
                ["make", "-C", _CSRC], check=True, capture_output=True
            )
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            if not os.path.exists(_LIB_PATH):
                logger.warning(
                    "native build failed (%s); using Python tokenizer", e
                )
                _build_failed = True
                return None
            logger.warning("native rebuild failed (%s); using existing library", e)
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as e:  # pragma: no cover
            logger.warning("native load failed (%s)", e)
            _build_failed = True
            return None
        try:
            _bind(lib)
        except AttributeError as e:  # stale .so surviving a failed rebuild
            logger.warning(
                "native library missing symbols (%s); using Python", e
            )
            _build_failed = True
            return None
        _lib = lib
        return _lib


def _bind(lib) -> None:
    lib.mmu_tokenizer_create.restype = ctypes.c_void_p
    lib.mmu_tokenizer_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.mmu_tokenizer_destroy.argtypes = [ctypes.c_void_p]
    lib.mmu_tokenize.restype = ctypes.c_int
    lib.mmu_tokenize.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
    ]
    lib.mmu_encode_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_longlong), ctypes.c_int, ctypes.c_int,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_longlong), ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.mmu_decode_resize_crop.restype = ctypes.c_int
    lib.mmu_decode_resize_crop.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.mmu_decode_resize_crop_batch.restype = None
    lib.mmu_decode_resize_crop_batch.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_longlong), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.mmu_quantize_rows_int8.restype = None
    lib.mmu_quantize_rows_int8.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_longlong, ctypes.c_longlong,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_float),
    ]


def native_available() -> bool:
    return _load_lib() is not None


def native_decode_resize_crop(
    jpeg_bytes: bytes, resize: int = 256, crop: int = 224
) -> Optional[np.ndarray]:
    """C++ pipeline: libjpeg DCT-scaled decode (M/8 granularity) + fused
    bilinear resize/center-crop -> (crop, crop, 3) uint8. Returns None when
    the native lib is unavailable or the bytes aren't decodable JPEG
    (caller falls back to PIL)."""
    lib = _load_lib()
    if lib is None:
        return None
    out = np.empty((crop, crop, 3), np.uint8)
    rc = lib.mmu_decode_resize_crop(
        jpeg_bytes, len(jpeg_bytes), resize, crop,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out if rc == 0 else None


def native_decode_resize_crop_batch(
    images: List[Optional[bytes]],
    resize: int = 256,
    crop: int = 224,
    n_threads: int = 0,
):
    """Decode a whole batch in one native call with an internal C++ thread
    pool (GIL released for the duration — the decode stage scales with host
    cores even from Python threads, unlike per-image Python-side decoding).

    ``images`` entries may be ``None`` (e.g. drop_img gray frames — left
    zero-filled and reported as failed so the caller fills them). Returns
    ``(batch, failed)``: ``batch`` is (N, crop, crop, 3) uint8 and
    ``failed`` lists the indices the caller must decode/fill itself
    (non-JPEG bytes, None entries), or ``None`` if the native library is
    unavailable."""
    lib = _load_lib()
    if lib is None:
        return None
    n = len(images)
    out = np.zeros((n, crop, crop, 3), np.uint8)
    if n == 0:
        return out, []
    rcs = np.empty(n, np.int32)
    payload = [b if b else b"\0" for b in images]  # keep offsets monotonic
    blob = b"".join(payload)
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum([len(b) for b in payload], out=offsets[1:])
    if n_threads <= 0:
        n_threads = os.cpu_count() or 1
    lib.mmu_decode_resize_crop_batch(
        blob,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        n, resize, crop, n_threads,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        rcs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out, [i for i in range(n) if rcs[i] != 0]


def native_quantize_rows(x: np.ndarray, n_threads: int = 0):
    """Per-row (trailing axis) symmetric int8 quantization in C++ — the
    fast path of ``data/transfer_quant.quantize_rows`` (bit-identical to its
    numpy fallback, row-threaded, GIL released). Accepts float32 or
    ml_dtypes.bfloat16 arrays with ``ndim >= 1``. Returns ``(q, scale)``
    with ``q`` int8 of ``x.shape`` and ``scale`` fp32 of
    ``x.shape[:-1] + (1,)``, or ``None`` when the native library is
    unavailable or the dtype is unsupported."""
    lib = _load_lib()
    if lib is None:
        return None
    if x.dtype == np.float32:
        code = 0
    elif x.dtype.itemsize == 2 and x.dtype.kind in "Vf":  # ml_dtypes bf16
        import ml_dtypes

        if x.dtype != np.dtype(ml_dtypes.bfloat16):
            return None
        code = 1
    else:
        return None
    x = np.ascontiguousarray(x)
    d = x.shape[-1]
    rows = x.size // d
    q = np.empty(x.shape, np.int8)
    scale = np.empty(x.shape[:-1] + (1,), np.float32)
    lib.mmu_quantize_rows_int8(
        x.ctypes.data_as(ctypes.c_void_p), code, rows, d, n_threads,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        scale.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return q, scale


class NativeTokenizer:
    """WordPiece tokenizer: C++ for ASCII texts, Python otherwise."""

    def __init__(self, vocab_file: str, do_lower_case: bool = True):
        from multimodal_uncertainty_tpu.data.tokenization import BertTokenizer

        self.py = BertTokenizer(vocab_file, do_lower_case)
        self.vocab = self.py.vocab
        self.ids_to_tokens = self.py.ids_to_tokens
        self._handle = None
        lib = _load_lib()
        if lib is not None:
            handle = lib.mmu_tokenizer_create(
                vocab_file.encode(), int(do_lower_case)
            )
            if handle:
                self._handle = handle
                self._lib = lib

    def __del__(self):  # pragma: no cover
        if getattr(self, "_handle", None):
            try:
                self._lib.mmu_tokenizer_destroy(self._handle)
            except Exception:
                pass

    def encode(self, text: str, max_ids: int = 512) -> List[int]:
        """text -> wordpiece ids (no special tokens)."""
        if self._handle is not None and text.isascii():
            out = (ctypes.c_int * max_ids)()
            n = self._lib.mmu_tokenize(
                self._handle, text.encode(), out, max_ids
            )
            return list(out[:n])
        toks = self.py.tokenize(text)[:max_ids]
        return self.py.convert_tokens_to_ids(toks)

    def tokenize(self, text: str) -> List[str]:
        """Wordpiece strings (Python-path semantics; used for parity)."""
        return [self.ids_to_tokens[i] for i in self.encode(text)]

    def encode_batch(
        self, texts: List[str], max_len: int, add_cls_sep: bool = True
    ):
        """Batch encode to padded (N, max_len) int64 ids + mask arrays."""
        n = len(texts)
        ids = np.zeros((n, max_len), np.int64)
        mask = np.zeros((n, max_len), np.int64)
        ascii_idx = [i for i, t in enumerate(texts) if t.isascii()]
        ascii_set = set(ascii_idx)
        other_idx = [i for i in range(n) if i not in ascii_set]

        if self._handle is not None and ascii_idx:
            blob = b"\0".join(texts[i].encode() for i in ascii_idx) + b"\0"
            offsets = np.zeros(len(ascii_idx), np.int64)
            pos = 0
            for j, i in enumerate(ascii_idx):
                offsets[j] = pos
                pos += len(texts[i].encode()) + 1
            sub_ids = np.zeros((len(ascii_idx), max_len), np.int64)
            sub_mask = np.zeros((len(ascii_idx), max_len), np.int64)
            self._lib.mmu_encode_batch(
                self._handle,
                blob,
                offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                len(ascii_idx),
                max_len,
                int(add_cls_sep),
                sub_ids.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
                sub_mask.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
            )
            ids[ascii_idx] = sub_ids
            mask[ascii_idx] = sub_mask
        else:
            other_idx = list(range(n))

        cls_id = self.vocab.get("[CLS]", 0)
        sep_id = self.vocab.get("[SEP]", 0)
        for i in other_idx:
            body = self.encode(texts[i], max_len - 2 if add_cls_sep else max_len)
            row = ([cls_id] + body + [sep_id]) if add_cls_sep else body
            ids[i, : len(row)] = row
            mask[i, : len(row)] = 1
        return ids, mask
