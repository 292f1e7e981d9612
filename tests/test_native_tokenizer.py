"""Native (C++) tokenizer: exact parity with the Python path + batch encode."""
import numpy as np
import pytest

from multimodal_uncertainty_tpu.data.native import NativeTokenizer, native_available
from multimodal_uncertainty_tpu.data.tokenization import BertTokenizer

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
