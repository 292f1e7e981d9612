"""WordPiece tokenizer parity vs HuggingFace BertTokenizer (local vocab)."""
import os

import pytest

from multimodal_uncertainty_tpu.data.tokenization import BertTokenizer, get_vocab

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
    "café résumé",  # accents stripped by lowercase basic tokenizer
    "emoji \U0001f600 and chinese 你好 tokens",
]


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return str(p)


def test_matches_huggingface_wordpiece(vocab_file):
    from transformers import BertTokenizer as HFTokenizer

    hf = HFTokenizer(vocab_file, do_lower_case=True)
    ours = BertTokenizer(vocab_file, do_lower_case=True)
    for text in TEXTS:
        assert ours.tokenize(text) == hf.tokenize(text), text
        ids = ours.convert_tokens_to_ids(ours.tokenize(text))
        assert ids == hf.convert_tokens_to_ids(hf.tokenize(text)), text


def test_get_vocab_contract(vocab_file):
    v = get_vocab(vocab_file)
    assert v.stoi["[PAD]"] == 0
    assert v.itos[3] == "[SEP]"
    assert v.vocab_sz == len(VOCAB)
