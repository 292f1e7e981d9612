"""Native (C++) tokenizer: exact parity with the Python path + batch encode."""
import numpy as np
import pytest

from multimodal_uncertainty_tpu.data.native import NativeTokenizer, native_available
from multimodal_uncertainty_tpu.data.tokenization import BertTokenizer

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)

VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
    "the", "quick", "brown", "fox", "jump", "##s", "##ed", "##ing",
    "over", "lazy", "dog", "pizza", "cheese", "un", "##believ", "##able",
    "!", ",", ".", "'",
]

TEXTS = [
    "The quick brown fox jumps over the lazy dog!",
    "unbelievable, PIZZA with cheese...",
    "jumping jumped JUMPS",
    "  weird   spacing\tand\nnewlines ",
    "a" * 150 + " short",  # overlong word -> [UNK]
    "",  # empty
    "café résumé unicode",  # non-ASCII -> python path
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_native_builds(vocab_file):
    assert native_available(), "C++ toolchain present but native build failed"


def test_native_matches_python(vocab_file):
    nat = NativeTokenizer(vocab_file)
    py = BertTokenizer(vocab_file)
    assert nat._handle is not None
    for text in TEXTS:
        expected = py.convert_tokens_to_ids(py.tokenize(text))
        assert nat.encode(text, max_ids=512) == expected, repr(text)


def test_encode_batch_matches_rowwise(vocab_file):
    nat = NativeTokenizer(vocab_file)
    py = BertTokenizer(vocab_file)
    max_len = 16
    ids, mask = nat.encode_batch(TEXTS, max_len=max_len, add_cls_sep=True)
    assert ids.shape == (len(TEXTS), max_len)
    cls_id, sep_id = py.vocab["[CLS]"], py.vocab["[SEP]"]
    for i, text in enumerate(TEXTS):
        body = py.convert_tokens_to_ids(py.tokenize(text))[: max_len - 2]
        row = [cls_id] + body + [sep_id]
        np.testing.assert_array_equal(ids[i, : len(row)], row)
        assert mask[i].sum() == len(row)
        assert (ids[i, len(row):] == 0).all()


def test_native_is_faster(vocab_file):
    import time

    nat = NativeTokenizer(vocab_file)
    py = BertTokenizer(vocab_file)
    text = "the quick brown fox jumps over the lazy dog pizza cheese " * 20
    n = 200
    t0 = time.perf_counter()
    for _ in range(n):
        nat.encode(text)
    t_nat = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n):
        py.convert_tokens_to_ids(py.tokenize(text))
    t_py = time.perf_counter() - t0
    assert t_nat < t_py, (t_nat, t_py)


def test_native_decode_resize_crop_matches_pil():
    """C++ JPEG pipeline: correct geometry and pixel agreement with the PIL
    path on photo-like content (shared DCT downscale; bilinear tail)."""
    import io

    from PIL import Image

    from multimodal_uncertainty_tpu.data.images import (
        decode_rgb,
        resize_center_crop,
    )
    from multimodal_uncertainty_tpu.data.native import (
        native_available,
        native_decode_resize_crop,
    )

    if not native_available():
        import pytest

        pytest.skip("native lib unavailable")

    yy, xx = np.meshgrid(np.arange(480), np.arange(480), indexing="ij")
    img = np.stack(
        [128 + 80 * np.sin(xx / 60), 128 + 70 * np.cos(yy / 45), yy % 255],
        axis=-1,
    ).clip(0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, "JPEG", quality=92)
    data = buf.getvalue()

    out = native_decode_resize_crop(data, 256, 224)
    assert out is not None and out.shape == (224, 224, 3)
    ref = resize_center_crop(decode_rgb(io.BytesIO(data)), 256, 224)
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    assert diff.mean() < 4.0, diff.mean()

    # non-JPEG bytes -> graceful None (PIL fallback path)
    assert native_decode_resize_crop(b"not a jpeg", 256, 224) is None


def test_jsonl_dataset_native_fast_decode(tmp_path):
    """JsonlDataset(fast_decode=True) consumes JPEGs through the native
    pipeline and falls back to PIL for PNGs."""
    import json

    from PIL import Image

    from multimodal_uncertainty_tpu.data.food101 import JsonlDataset
    from multimodal_uncertainty_tpu.data.tokenization import Vocab

    rng = np.random.default_rng(0)
    for name, fmt in (("a.jpg", "JPEG"), ("b.png", "PNG")):
        arr = rng.integers(0, 255, size=(300, 300, 3)).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / name, fmt)
    rows = [
        {"img": "a.jpg", "text": "hello", "label": "x"},
        {"img": "b.png", "text": "world", "label": "x"},
    ]
    with open(tmp_path / "train.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    vocab = Vocab()
    vocab.add(["hello", "world"])
    ds = JsonlDataset(
        str(tmp_path / "train.jsonl"), lambda t: t.split(), vocab, 1,
        0.0, 32, 3, ["x"], fast_decode=True,
    )
    for i in range(2):
        _, _, image, _ = ds[i]
        assert image.shape == (224, 224, 3) and image.dtype == np.uint8


def test_native_batch_decode_matches_single_and_handles_failures():
    """mmu_decode_resize_crop_batch (C++ thread pool, GIL-free): identical
    pixels to the single-image entry point, per-image failure reporting,
    threaded == serial."""
    import io

    from PIL import Image

    from multimodal_uncertainty_tpu.data.native import (
        native_decode_resize_crop,
        native_decode_resize_crop_batch,
    )

    if not native_available():
        pytest.skip("native lib unavailable")

    rng = np.random.default_rng(3)
    jpegs = []
    for i in range(4):
        arr = rng.integers(
            0, 255, size=(280 + 23 * i, 300 + 13 * i, 3)
        ).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, "JPEG", quality=90)
        jpegs.append(buf.getvalue())
    batch = [jpegs[0], None, jpegs[1], b"corrupt", jpegs[2], jpegs[3]]

    out, failed = native_decode_resize_crop_batch(batch, 256, 224, n_threads=4)
    assert out.shape == (6, 224, 224, 3) and out.dtype == np.uint8
    assert failed == [1, 3]
    for i, raw in enumerate(batch):
        if i in failed:
            continue
        np.testing.assert_array_equal(
            out[i], native_decode_resize_crop(raw, 256, 224)
        )
    out1, failed1 = native_decode_resize_crop_batch(batch, 256, 224, n_threads=1)
    np.testing.assert_array_equal(out, out1)
    assert failed1 == failed

    empty, none_failed = native_decode_resize_crop_batch([], 256, 224)
    assert empty.shape == (0, 224, 224, 3) and none_failed == []


def test_food101_batch_decode_collate(tmp_path):
    """get_food101(batch_decode=True): same batches as the per-item decode
    path — JPEG via native batch call, PNG via PIL fallback, drop_img gray."""
    import json

    from PIL import Image

    from multimodal_uncertainty_tpu.data.food101 import (
        JsonlDataset,
        collate_fn,
        make_batch_decode_collate,
    )
    from multimodal_uncertainty_tpu.data.tokenization import Vocab

    rng = np.random.default_rng(5)
    yy, xx = np.meshgrid(np.arange(300), np.arange(320), indexing="ij")
    for k, (name, fmt) in enumerate(
        (("a.jpg", "JPEG"), ("b.png", "PNG"), ("c.jpg", "JPEG"))
    ):
        # photo-like (smooth) content: DCT-scaled decode tracks PIL closely
        # there, unlike white noise where any resample chain diverges
        arr = np.stack(
            [
                128 + 80 * np.sin(xx / (40 + 10 * k)),
                128 + 70 * np.cos(yy / (30 + 5 * k)),
                (yy + 3 * k * xx) % 255,
            ],
            axis=-1,
        ).clip(0, 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / name, fmt)
    rows = [
        {"img": "a.jpg", "text": "hello world", "label": "x"},
        {"img": "b.png", "text": "world", "label": "y"},
        {"img": "c.jpg", "text": "hello", "label": "x"},
        {"img": None, "text": "hello hello", "label": "y"},
    ]
    with open(tmp_path / "train.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    vocab = Vocab()
    vocab.add(["hello", "world"])

    def make(decode_in_collate):
        return JsonlDataset(
            str(tmp_path / "train.jsonl"), lambda t: t.split(), vocab, 2,
            0.0, 32, 3, ["x", "y"], decode_in_collate=decode_in_collate,
        )

    ref_ds, raw_ds = make(False), make(True)
    (rt, rs, rm, rimg), ry = collate_fn([ref_ds[i] for i in range(4)])
    collate = make_batch_decode_collate()
    (bt, bs, bm, bimg), by = collate([raw_ds[i] for i in range(4)])

    np.testing.assert_array_equal(rt, bt)
    np.testing.assert_array_equal(rs, bs)
    np.testing.assert_array_equal(rm, bm)
    np.testing.assert_array_equal(ry, by)
    assert bimg.shape == rimg.shape
    # PNG row (PIL both sides) and gray row must be byte-identical; JPEG rows
    # agree closely (native DCT-scaled decode vs PIL full decode).
    np.testing.assert_array_equal(rimg[1], bimg[1])
    np.testing.assert_array_equal(rimg[3], bimg[3])
    for i in (0, 2):
        diff = np.abs(rimg[i].astype(np.int32) - bimg[i].astype(np.int32))
        assert diff.mean() < 6.0, diff.mean()
