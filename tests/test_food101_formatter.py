"""Offline UPMC-Food-101 formatter (data/food101.py::format_food101_dataset,
reference data/food101.py:21-78): directory-walk pairing, reference-exact
text cleaning, stratified dev split, jsonl output consumable by get_food101.

This is the one component that runs exactly once on the real-data day; a
wrong texts_txt pairing or cleaning difference would silently corrupt every
downstream parity number (VERDICT r4 weak #7 / next-round #4).
"""
import json
import os

import numpy as np
import pytest

from multimodal_uncertainty_tpu.data.food101 import (
    format_food101_dataset,
    format_txt_file,
    get_food101,
    get_labels_and_frequencies,
)

pytestmark = pytest.mark.quick  # <=2-min smoke tier (make check)


def _make_upmc_tree(root, labels=("apple_pie", "baby_back_ribs", "sushi"),
                    n_train=8, n_test=3, px=48):
    """Fabricate the reference-format UPMC tree: images/{train,test}/<label>/
    <label>_<num>.jpg + texts_txt/<label>/<label>_<num>.txt."""
    from PIL import Image

    rng = np.random.default_rng(0)
    texts = {}
    for split, n in (("train", n_train), ("test", n_test)):
        for label in labels:
            os.makedirs(os.path.join(root, "images", split, label),
                        exist_ok=True)
            os.makedirs(os.path.join(root, "texts_txt", label), exist_ok=True)
            for i in range(n):
                num = f"{i}" if split == "train" else f"9{i}"
                arr = rng.integers(0, 255, size=(px, px, 3)).astype(np.uint8)
                Image.fromarray(arr).save(os.path.join(
                    root, "images", split, label, f"{label}_{num}.jpg"))
                body = (f"Recipe #{i}: e-mail chef@{label}.com!\n"
                        f"Step 1; mix {label} (gently) -- then BAKE.\n")
                with open(os.path.join(root, "texts_txt", label,
                                       f"{label}_{num}.txt"), "w") as f:
                    f.write(body)
                texts[f"{label}_{num}"] = body
    return texts


def test_cleaning_matches_reference_algorithm():
    # reference format_txt_file: listed punct -> spaces, collapse \s\s+,
    # lower, newline -> space. '?' and '|' are NOT in the reference set.
    raw = "Hello, World! e-mail a_b [x] {y} (z); keep? pipe|this\nNew  line"
    assert format_txt_file(raw) == (
        "hello world e mail a b x y z keep? pipe|this new line"
    )
    # hyphens split words (NOT deleted — string.punctuation would yield
    # 'email', a different WordPiece token on the real corpus)
    assert format_txt_file("e-mail") == "e mail"


def test_formatter_pairs_cleans_splits_and_feeds_training(tmp_path):
    root = str(tmp_path)
    _make_upmc_tree(root)
    # an unpaired image (no texts_txt counterpart) must be skipped, like
    # reference parse_data's os.path.exists guard (:55-56)
    from PIL import Image

    Image.fromarray(np.zeros((48, 48, 3), np.uint8)).save(
        os.path.join(root, "images", "train", "sushi", "sushi_777.jpg"))

    counts = format_food101_dataset(root, dev_size=6, seed=4)
    assert counts == {"train": 18, "dev": 6, "test": 9}

    rows = {}
    for split in ("train", "dev", "test"):
        with open(os.path.join(root, f"{split}.jsonl")) as f:
            rows[split] = [json.loads(line) for line in f]
        assert len(rows[split]) == counts[split]
    all_train = rows["train"] + rows["dev"]
    # unpaired image excluded everywhere
    assert not any("777" in r["img"] for r in all_train)
    # stratified: each of 3 labels contributes exactly 2 of the 6 dev rows
    from collections import Counter

    dev_labels = Counter(r["label"] for r in rows["dev"])
    assert dev_labels == {"apple_pie": 2, "baby_back_ribs": 2, "sushi": 2}
    # row schema matches the reference jsonl contract
    r = rows["test"][0]
    assert set(r) == {"id", "label", "text", "img"}
    assert r["img"].startswith(os.path.join("images", "test"))
    assert os.path.exists(os.path.join(root, r["img"]))
    # text went through reference-exact cleaning (lowercase, punct->space)
    assert "e mail" in r["text"] and ";" not in r["text"]
    # cleaning is idempotent: the collapse runs before the \n->space
    # replace, so cleaned text never holds consecutive whitespace and a
    # second pass is the identity
    assert format_txt_file(r["text"]) == r["text"]

    # determinism: same seed -> identical files
    sig1 = [tuple(sorted(x.items())) for x in rows["dev"]]
    format_food101_dataset(root, dev_size=6, seed=4)
    with open(os.path.join(root, "dev.jsonl")) as f:
        sig2 = [tuple(sorted(json.loads(line).items())) for line in f]
    assert sig1 == sig2

    # the formatted tree feeds the real loader stack end-to-end
    labels, freqs = get_labels_and_frequencies(
        os.path.join(root, "train.jsonl"))
    assert len(labels) == 3
    with open(os.path.join(root, "vocab.txt"), "w") as f:
        for tok in ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "recipe",
                    "mix", "bake", "step", "e", "mail", "chef"]:
            f.write(tok + "\n")
    train, dev, test, n_classes, vocab = get_food101(
        datapath=root, batch_size=4, n_workers=0, max_seq_len=64,
        num_image_embeds=3)
    assert n_classes == 3
    (text, segment, mask, imgs), y = next(iter(train))
    assert text.shape[0] == 4 and imgs.shape[-1] == 3
    assert int(np.asarray(y).max()) < 3


def test_dev_split_apportionment_unbalanced(tmp_path):
    """Largest-remainder stratification: dev quota follows label frequency
    and sums exactly to dev_size even when labels are unbalanced."""
    root = str(tmp_path)
    from PIL import Image

    for label, n in (("big", 12), ("small", 4)):
        os.makedirs(os.path.join(root, "images", "train", label))
        os.makedirs(os.path.join(root, "images", "test", label))
        os.makedirs(os.path.join(root, "texts_txt", label))
        for i in range(n):
            Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
                os.path.join(root, "images", "train", label,
                             f"{label}_{i}.jpg"))
            with open(os.path.join(root, "texts_txt", label,
                                   f"{label}_{i}.txt"), "w") as f:
                f.write("some text")
    counts = format_food101_dataset(root, dev_size=4, seed=0)
    assert counts["dev"] == 4 and counts["train"] == 12
    with open(os.path.join(root, "dev.jsonl")) as f:
        devs = [json.loads(line)["label"] for line in f]
    # 4 * 12/16 = 3 big, 4 * 4/16 = 1 small
    assert sorted(devs) == ["big", "big", "big", "small"]


@pytest.mark.parametrize("fname,expected_txt", [
    ("apple_pie_42.jpg", "apple_pie_42.txt"),        # UPMC contract
    ("oddly-named_3.jpg", "apple_pie_3.txt"),        # label_<num> wins
])
def test_text_pairing_uses_label_and_parsed_num(tmp_path, fname,
                                                expected_txt):
    root = str(tmp_path)
    from PIL import Image

    label = "apple_pie"
    os.makedirs(os.path.join(root, "images", "train", label))
    os.makedirs(os.path.join(root, "images", "test", label))
    os.makedirs(os.path.join(root, "texts_txt", label))
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
        os.path.join(root, "images", "train", label, fname))
    with open(os.path.join(root, "texts_txt", label, expected_txt),
              "w") as f:
        f.write("THE paired text")
    counts = format_food101_dataset(root, dev_size=0, seed=0)
    assert counts["train"] == 1
    with open(os.path.join(root, "train.jsonl")) as f:
        row = json.loads(f.readline())
    assert row["text"].strip() == "the paired text"
