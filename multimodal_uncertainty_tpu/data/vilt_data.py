"""ViLT dataset: on-the-fly image+text preprocessing.

Reference ``VILTDataset``/``collate_fn_vilt`` (``src/dataset.py:229-284``)
wraps HF ``ViltProcessor``. Native equivalent: resize-shorter-side-384 +
center-crop-384 + 0.5/0.5 normalize (stored as uint8; normalized on device),
WordPiece tokenization to max_length 40 with [CLS]/[SEP], and a pixel_mask of
ones (fixed square crop — documented deviation from HF's aspect-preserving
pad-and-mask)."""
from __future__ import annotations

import os
import numpy as np

from multimodal_uncertainty_tpu.data.flava_encoded import BaseDataset
from multimodal_uncertainty_tpu.data.images import resize_center_crop


class VILTDataset(BaseDataset):
    def __init__(self, prefix_dir, phase, label_dict, error_cases_remover=False,
                 *, vocab_file: str, max_length: int = 40, image_size: int = 384,
                 **kwargs):
        super().__init__(prefix_dir, phase, label_dict, error_cases_remover)
        self.data_path = prefix_dir
        from multimodal_uncertainty_tpu.data.native import NativeTokenizer

        self.tokenizer = NativeTokenizer(vocab_file)
        self.max_length = max_length
        self.image_size = image_size
        self.cls_id = self.tokenizer.vocab.get("[CLS]", 101)
        self.sep_id = self.tokenizer.vocab.get("[SEP]", 102)

    def __getitem__(self, idx):
        from PIL import Image

        row = self.rows[idx]
        image = Image.open(os.path.join(self.data_path, row["img"])).convert("RGB")
        pixels = resize_center_crop(image, self.image_size, self.image_size)

        ids = (
            [self.cls_id]
            + self.tokenizer.encode(row["text"], max_ids=self.max_length - 2)
            + [self.sep_id]
        )
        input_ids = np.zeros(self.max_length, np.int64)
        attention = np.zeros(self.max_length, np.int64)
        input_ids[: len(ids)] = ids
        attention[: len(ids)] = 1

        label = self.label_dict.index(row["label"])
        return {
            "input_ids": input_ids,
            "attention_mask": attention,
            "token_type_ids": np.zeros(self.max_length, np.int64),
            "pixel_values": pixels,  # uint8 HWC; normalized on device
            "labels": np.int64(label),
        }


def collate_fn_vilt(batch):
    out = {
        k: np.stack([item[k] for item in batch])
        for k in ("input_ids", "attention_mask", "token_type_ids", "pixel_values")
    }
    h, w = out["pixel_values"].shape[1:3]
    out["pixel_mask"] = np.ones((len(batch), h, w), np.int64)
    labels = np.asarray([item["labels"] for item in batch], np.int64)
    return out, labels


def get_dataset_vilt(args, datapath: str):
    """Reference ``get_dataset_vilt`` (``src/dataset.py:339-345``)."""
    from multimodal_uncertainty_tpu.data.loaders import subset_then_loaders

    vocab_file = getattr(args, "vocab_file", None) or os.path.join(
        datapath, "vocab.txt"
    )

    def make(phase):
        return VILTDataset(
            datapath, phase, args.labels, args.error_cases_remover,
            vocab_file=vocab_file,
        )

    return subset_then_loaders(
        make("train"), make("dev"), make("test"), collate_fn_vilt, args
    )
