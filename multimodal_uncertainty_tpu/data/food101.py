"""Raw-pixel Food-101 pipeline for MMBT (+ the offline dataset formatter).

Reference: ``JsonlDataset``/``collate_fn``/``get_food101``
(``src/dataset.py:348-545``) and the offline formatter
(``data/food101.py:21-78``). Text is tokenized to BERT wordpieces with the
[SEP] start-token convention and truncated to ``max_seq_len -
num_image_embeds``; images get resize-256/center-crop-224; ``drop_img_percent``
replaces images with a constant gray frame under a fixed numpy seed (0).
Collation left-aligns text with a 0/1 mask. Images travel to device as uint8
(normalization is fused on-device — see data/images.py).
"""
from __future__ import annotations

import json
import os
from collections import Counter
from typing import List, Optional

import numpy as np

from multimodal_uncertainty_tpu.data.images import (
    decode_rgb,
    gray_image,
    resize_center_crop,
)
from multimodal_uncertainty_tpu.data.loaders import MapLoader
from multimodal_uncertainty_tpu.data.tokenization import Vocab, get_vocab
from multimodal_uncertainty_tpu.utils.seeding import numpy_seed


def get_labels_and_frequencies(path: str):
    """Reference ``src/dataset.py:408-417``."""
    label_freqs = Counter()
    data_labels = [json.loads(line)["label"] for line in open(path)]
    if data_labels and isinstance(data_labels[0], list):
        for row in data_labels:
            label_freqs.update(row)
    else:
        label_freqs.update(data_labels)
    return list(label_freqs.keys()), label_freqs


class JsonlDataset:
    """Reference ``JsonlDataset`` (``src/dataset.py:348-405``)."""

    def __init__(
        self,
        data_path: str,
        tokenizer,  # callable: text -> wordpiece list
        vocab: Vocab,
        n_classes: int,
        drop_img_percent: float,
        max_seq_len: int,
        num_image_embeds: int,
        labels: List,
        image_size: int = 224,
        fast_decode: bool = False,
        decode_in_collate: bool = False,
    ):
        self.data = [json.loads(l) for l in open(data_path)]
        self.data_dir = os.path.dirname(data_path)
        self.tokenizer = tokenizer
        self.vocab = vocab
        self.n_classes = n_classes
        self.text_start_token = ["[SEP]"]
        self.labels = labels
        self.image_size = image_size
        self.fast_decode = fast_decode
        self.decode_in_collate = decode_in_collate

        with numpy_seed(0):
            for row in self.data:
                if np.random.random() < drop_img_percent:
                    row["img"] = None

        self.max_seq_len = max_seq_len - num_image_embeds

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index):
        if hasattr(self.tokenizer, "encode"):
            # native fast path: ids directly (identical output, C++ speed)
            sep_id = self.vocab.stoi["[SEP]"]
            body = self.tokenizer.encode(
                self.data[index]["text"], max_ids=self.max_seq_len - 1
            )
            token_ids = np.asarray([sep_id] + body, np.int64)
            sentence = token_ids  # length reference below
        else:
            sentence = (
                self.text_start_token
                + self.tokenizer(self.data[index]["text"])[: self.max_seq_len - 1]
            )
            token_ids = np.asarray(
                [
                    self.vocab.stoi.get(w, self.vocab.stoi["[UNK]"])
                    for w in sentence
                ],
                np.int64,
            )
        segment = np.zeros(len(sentence), np.int64)
        label = self.labels.index(self.data[index]["label"])

        if self.decode_in_collate:
            # Batch-decode mode: hand raw encoded bytes (or None for the
            # drop_img gray frame) to make_batch_decode_collate, which
            # decodes the whole batch in one GIL-free native call.
            image = None
            if self.data[index]["img"]:
                path = os.path.join(self.data_dir, self.data[index]["img"])
                with open(path, "rb") as f:
                    image = f.read()
            segment = segment[1:]
            token_ids = token_ids[1:]
            segment += 1
            return token_ids, segment, image, label

        if self.data[index]["img"]:
            path = os.path.join(self.data_dir, self.data[index]["img"])
            image = None
            if self.fast_decode:
                # native C++ path first: libjpeg DCT-scaled decode (M/8,
                # finer than PIL draft's powers of two) + fused bilinear
                # resize/crop; returns None for non-JPEGs or if the lib
                # is unavailable
                from multimodal_uncertainty_tpu.data.native import (
                    native_decode_resize_crop,
                )

                with open(path, "rb") as f:
                    image = native_decode_resize_crop(
                        f.read(), 256, self.image_size
                    )
            if image is None:
                img = decode_rgb(path, fast=self.fast_decode)
                image = resize_center_crop(img, 256, self.image_size)
        else:
            image = resize_center_crop(
                _pil_from_array(gray_image()), 256, self.image_size
            )

        # First [SEP] belongs to the image segment (reference :399-403).
        segment = segment[1:]
        token_ids = token_ids[1:]
        segment += 1
        return token_ids, segment, image, label


def _pil_from_array(arr):
    from PIL import Image

    return Image.fromarray(arr)


def collate_fn(batch, pad_multiple: int = 32):
    """Left-aligned padded text + mask, stacked uint8 images
    (reference ``src/dataset.py:420-438``). Pad length rounds up to
    ``pad_multiple`` to bound the number of compiled shapes.

    Return order is (text, segment, mask, imgs) and the model consumes
    (txt, mask, segment, img) — the reference has the same transposition
    (``src/framework.py:175`` passes collate output positionally into
    ``forward(txt, mask, segment, img)``), and it is HARMLESS there and
    here because segment and mask are numerically identical tensors: every
    real text token has segment id 1 (``src/dataset.py:399-403``) and mask
    1, padding is 0 in both. Preserved for bit-parity; do not "fix" one
    side without the other."""
    lens = [len(row[0]) for row in batch]
    bsz = len(batch)
    max_seq_len = ((max(lens) + pad_multiple - 1) // pad_multiple) * pad_multiple
    text = np.zeros((bsz, max_seq_len), np.int64)
    segment = np.zeros((bsz, max_seq_len), np.int64)
    mask = np.zeros((bsz, max_seq_len), np.int64)
    imgs = np.stack([row[2] for row in batch])
    targets = np.asarray([row[3] for row in batch], np.int64)
    for i, (row, length) in enumerate(zip(batch, lens)):
        text[i, :length] = row[0]
        segment[i, :length] = row[1]
        mask[i, :length] = 1
    return (text, segment, mask, imgs), targets


def make_batch_decode_collate(
    image_size: int = 224, pad_multiple: int = 32, n_threads: int = 0
):
    """Collate for ``JsonlDataset(decode_in_collate=True)`` rows: same text
    layout as :func:`collate_fn`, but images arrive as raw encoded bytes and
    are decoded by ONE native call (`mmu_decode_resize_crop_batch`) running
    a C++ thread pool with the GIL released — the decode stage scales with
    host cores where Python-thread per-item decoding serializes. Non-JPEG
    bytes fall back to PIL; ``None`` (drop_img) becomes the reference's
    gray-128 frame."""
    from multimodal_uncertainty_tpu.data.native import (
        native_decode_resize_crop_batch,
    )

    gray = resize_center_crop(_pil_from_array(gray_image()), 256, image_size)

    def _pil_decode(raw: bytes) -> np.ndarray:
        import io

        return resize_center_crop(
            decode_rgb(io.BytesIO(raw)), 256, image_size
        )

    def collate(batch):
        raws = [row[2] for row in batch]
        res = native_decode_resize_crop_batch(
            raws, 256, image_size, n_threads=n_threads
        )
        if res is None:  # no native lib: per-image PIL
            imgs = np.stack(
                [gray if raw is None else _pil_decode(raw) for raw in raws]
            )
        else:
            imgs, failed = res
            for i in failed:
                imgs[i] = gray if raws[i] is None else _pil_decode(raws[i])
        rows = [(r[0], r[1], img, r[3]) for r, img in zip(batch, imgs)]
        return collate_fn(rows, pad_multiple=pad_multiple)

    return collate


def get_food101(
    vocab_file: Optional[str] = None,
    datapath: Optional[str] = None,
    drop_img_percent: float = 0.0,
    max_seq_len: int = 512,
    num_image_embeds: int = 3,
    batch_size: int = 128,
    n_workers: int = 4,
    sample_size: Optional[int] = None,
    seed: int = 42,
    fast_decode: bool = False,
    batch_decode: bool = False,
):
    """Reference ``get_food101`` (``src/dataset.py:474-545``). ``vocab_file``
    is a local BERT vocab.txt (no network in this environment).
    ``batch_decode=True`` moves image decoding into the collate stage, one
    GIL-free native thread-pool call per batch (see
    :func:`make_batch_decode_collate`)."""
    datapath = datapath or os.environ["DATA_DIR"]
    if vocab_file is None:
        vocab_file = os.path.join(datapath, "vocab.txt")
    from multimodal_uncertainty_tpu.data.native import NativeTokenizer

    tokenizer = NativeTokenizer(vocab_file, do_lower_case=True)
    vocab = get_vocab(vocab_file)

    labels, _ = get_labels_and_frequencies(os.path.join(datapath, "train.jsonl"))
    n_classes = len(labels)

    def make(split):
        return JsonlDataset(
            os.path.join(datapath, f"{split}.jsonl"),
            tokenizer,
            vocab,
            n_classes,
            drop_img_percent,
            max_seq_len,
            num_image_embeds,
            labels,
            fast_decode=fast_decode,
            decode_in_collate=batch_decode,
        )

    collate = make_batch_decode_collate() if batch_decode else collate_fn
    train, dev, test = make("train"), make("dev"), make("test")
    train_loader = MapLoader(
        train, batch_size, collate, shuffle=True, seed=seed,
        num_workers=n_workers, sample_size=sample_size,
    )
    val_loader = MapLoader(dev, batch_size, collate, num_workers=n_workers)
    test_loader = MapLoader(test, batch_size, collate, num_workers=n_workers)
    return train_loader, val_loader, test_loader, n_classes, vocab


# Reference cleaning char set (data/food101.py:33-37): these exact chars —
# NOT string.punctuation (which adds '?', '|', '"' variants the reference
# keeps) — become SPACES (not deleted: "e-mail" -> "e mail"), then runs of
# whitespace collapse, then lowercase with newlines -> spaces. Any other
# cleaning produces different WordPiece tokens on the real corpus.
_FOOD101_PUNCT = "<>/\\+=-_[]{}'\";:.,()*&^%$#@!~`"


def format_txt_file(content: str) -> str:
    """Reference-exact text cleaning (``data/food101.py:33-37``)."""
    import re

    for c in _FOOD101_PUNCT:
        content = content.replace(c, " ")
    content = re.sub(r"\s\s+", " ", content)
    return content.lower().replace("\n", " ")


def format_food101_dataset(datapath: str, dev_size: int = 5000, seed: int = 4):
    """Offline formatter (reference ``data/food101.py:21-78``): walk
    ``images/{train,test}/<label>/*``, pair each image with its
    ``texts_txt/<label>/<label>_<num>.txt`` page text (num parsed from the
    image filename, the UPMC-Food-101 naming contract), clean the text
    reference-exactly, make a stratified ``dev_size`` dev split from train,
    and write ``{train,dev,test}.jsonl`` rows ``{id, label, text, img}``.

    Deviations from the reference (documented, not behavioral on real
    UPMC data): deterministic (seeded) split instead of sklearn's global
    RNG; directory walks are sorted; a flat ``texts_txt/<stem>.txt``
    fallback is accepted for images that don't match the UPMC naming."""
    import re

    rng = np.random.default_rng(seed)
    img_re = re.compile(r"(?P<name>\w+)_(?P<num>[\d-]+)\.(?P<ext>\w+)")

    def rows_for(split):
        rows = []
        img_root = os.path.join(datapath, "images", split)
        for label in sorted(os.listdir(img_root)):
            label_dir = os.path.join(img_root, label)
            if not os.path.isdir(label_dir):
                continue
            for fname in sorted(os.listdir(label_dir)):
                # UPMC pairing (reference data/food101.py:45-56): the text
                # file is <label>_<num>.txt, num from the IMAGE filename
                m = img_re.search(fname)
                candidates = []
                if m is not None:
                    candidates.append(os.path.join(
                        datapath, "texts_txt", label,
                        f"{label}_{m.group('num')}.txt"))
                stem = os.path.splitext(fname)[0]
                candidates.append(os.path.join(datapath, "texts_txt", label,
                                               f"{stem}.txt"))
                candidates.append(os.path.join(datapath, "texts_txt",
                                               f"{stem}.txt"))
                txt_path = next((p for p in candidates if os.path.exists(p)),
                                None)
                if txt_path is None:  # unpaired image: skipped (reference :56)
                    continue
                with open(txt_path, encoding="utf-8", errors="ignore") as f:
                    text = format_txt_file(f.read())
                rows.append(
                    {
                        "id": f"{label}_{fname}",
                        "label": label,
                        "text": text,
                        "img": os.path.join("images", split, label, fname),
                    }
                )
        return rows

    train_rows = rows_for("train")
    test_rows = rows_for("test")
    # stratified dev split: exactly dev_size rows, apportioned per label by
    # largest remainder (reference: sklearn train_test_split with
    # stratify=labels, test_size=5000). Real UPMC (~67k train) is far above
    # the default; on small/rehearsal trees the split is clamped to half of
    # train so the formatter can never starve the train split (the
    # reference's sklearn call would simply error there).
    if dev_size > len(train_rows) // 2:
        dev_size = len(train_rows) // 2
        print(f"[format_food101] dev_size clamped to {dev_size} "
              f"(half of {len(train_rows)} paired train rows)")
    by_label: dict = {}
    for i, r in enumerate(train_rows):
        by_label.setdefault(r["label"], []).append(i)
    n = max(1, len(train_rows))
    quotas = {lab: dev_size * len(ix) / n for lab, ix in by_label.items()}
    take = {lab: int(q) for lab, q in quotas.items()}
    short = dev_size - sum(take.values())
    for lab in sorted(quotas, key=lambda l: (-(quotas[l] - take[l]), l))[:short]:
        take[lab] += 1
    dev_idx = set()
    for lab, idxs in sorted(by_label.items()):
        sel = rng.permutation(len(idxs))[: take[lab]]
        dev_idx.update(idxs[j] for j in sel)
    splits = {
        "train": [r for i, r in enumerate(train_rows) if i not in dev_idx],
        "dev": [r for i, r in enumerate(train_rows) if i in dev_idx],
        "test": test_rows,
    }
    for split, rows in splits.items():
        with open(os.path.join(datapath, f"{split}.jsonl"), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    return {k: len(v) for k, v in splits.items()}
