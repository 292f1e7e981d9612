"""Precomputed-FLAVA-embedding datasets (Hateful-Memes / Food-101 path).

Reference (``src/dataset.py:177-226``): jsonl metadata + per-sample
``.img``/``.text`` embedding tensors loaded with two ``torch.load`` calls per
item — the throughput bottleneck of the flava runs (SURVEY §3.1).

TPU re-design: embeddings are packed once into consolidated **memory-mapped
.npy shards** (one per split) with a row-offset index; batches are assembled
with vectorized slicing into fixed padded buckets (padding value 0.0, parity
with ``collate_fn_flava``), so steady-state input cost is a memcpy. The
legacy per-file layout is still readable (``FlavaEncodedDataset``) and a
``pack_split`` converter upgrades it to shards.
"""
from __future__ import annotations

import functools
import json
import os
from typing import Callable, List, Tuple

import numpy as np



def read_jsonl(path: str) -> List[dict]:
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


def load_error_cases(prefix_dir: str, phase: str) -> List[int]:
    p = os.path.join(prefix_dir, "flava_embeds", f"{phase}_error_cases.txt")
    with open(p) as f:
        return [int(x) for x in f.read().split("\n")[:-1]]


class BaseDataset:
    """jsonl metadata, optional FLAVA-error-case removal
    (reference ``src/dataset.py:177-194``)."""

    def __init__(self, prefix_dir, phase, label_dict=None, error_cases_remover=True,
                 **kwargs):
        rows = read_jsonl(os.path.join(prefix_dir, f"{phase}.jsonl"))
        self.label_dict = label_dict
        if error_cases_remover:
            drop = set(load_error_cases(prefix_dir, phase))
            rows = [r for i, r in enumerate(rows) if i not in drop]
        self.rows = rows

    def __len__(self):
        return len(self.rows)


def _load_tensor_file(path: str) -> np.ndarray:
    """Read a per-sample embedding file: .npy, or torch-pickled tensor."""
    if path.endswith(".npy") or _is_npy(path):
        return np.load(path, allow_pickle=False)
    import torch  # noqa: PLC0415 — legacy format only

    return torch.load(path, map_location="cpu", weights_only=True).numpy()


def _is_npy(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(6) == b"\x93NUMPY"
    except OSError:
        return False


class FlavaEncodedDataset(BaseDataset):
    """Per-item loader over the legacy file-per-sample layout."""

    def __init__(self, prefix_dir, phase, label_dict, error_cases_remover=True,
                 *, name_extractor: Callable, **kwargs):
        super().__init__(prefix_dir, phase, label_dict, error_cases_remover)
        self.name_extractor = name_extractor
        self.emb_dir = os.path.join(prefix_dir, "flava_embeds")

    def __getitem__(self, idx):
        row = self.rows[idx]
        save_name = self.name_extractor(row["img"])
        img = _load_tensor_file(os.path.join(self.emb_dir, save_name + ".img"))
        txt = _load_tensor_file(os.path.join(self.emb_dir, save_name + ".text"))
        label = self.label_dict.index(row["label"])
        return img, txt, label


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def collate_fn_flava(
    batch, pad_multiple: int = 32
) -> Tuple[Tuple[np.ndarray, np.ndarray], np.ndarray]:
    """Zero-pad variable-length embedding sequences
    (reference ``src/dataset.py:216-226``).

    TPU addition: pad lengths round up to ``pad_multiple`` so the number of
    distinct compiled shapes is bounded (per-batch exact-max padding would
    trigger an XLA recompile for nearly every batch).

    Dtype-preserving: bf16-packed shards (see :func:`pack_split`) flow
    through as bf16 — half the host->device transfer bytes, and the model
    computes in bf16 anyway on TPU."""
    imgs, txts, labels = zip(*batch)
    li = _round_up(max(i.shape[0] for i in imgs), pad_multiple)
    lt = _round_up(max(t.shape[0] for t in txts), pad_multiple)
    d = imgs[0].shape[-1]
    dtype = imgs[0].dtype
    img_out = np.zeros((len(batch), li, d), dtype)
    txt_out = np.zeros((len(batch), lt, d), dtype)
    for n, (i, t) in enumerate(zip(imgs, txts)):
        img_out[n, : i.shape[0]] = i
        txt_out[n, : t.shape[0]] = t
    return (img_out, txt_out), np.asarray(labels, np.int64)


# ---------------------------------------------------------------------------
# Packed memory-mapped shards (the TPU-native fast path)
# ---------------------------------------------------------------------------


def pack_split(
    dataset: FlavaEncodedDataset, out_dir: str, phase: str, dtype=np.float32
) -> None:
    """Convert a per-file split into consolidated shards:
    {phase}_img.npy (rows, concatenated), {phase}_img_offsets.npy, same for
    text, plus {phase}_labels.npy.

    ``dtype=ml_dtypes.bfloat16`` halves shard size and host->device transfer
    bytes; on TPU the model computes in bf16 regardless, so storing the
    precomputed FLAVA embeddings at bf16 loses nothing downstream."""
    os.makedirs(out_dir, exist_ok=True)
    img_parts, txt_parts, labels = [], [], []
    img_off, txt_off = [0], [0]
    for i in range(len(dataset)):
        img, txt, label = dataset[i]
        img_parts.append(np.asarray(img).astype(dtype))
        txt_parts.append(np.asarray(txt).astype(dtype))
        labels.append(label)
        img_off.append(img_off[-1] + img.shape[0])
        txt_off.append(txt_off[-1] + txt.shape[0])
    np.save(os.path.join(out_dir, f"{phase}_img.npy"), np.concatenate(img_parts))
    np.save(os.path.join(out_dir, f"{phase}_txt.npy"), np.concatenate(txt_parts))
    np.save(os.path.join(out_dir, f"{phase}_img_offsets.npy"), np.asarray(img_off))
    np.save(os.path.join(out_dir, f"{phase}_txt_offsets.npy"), np.asarray(txt_off))
    np.save(os.path.join(out_dir, f"{phase}_labels.npy"), np.asarray(labels, np.int64))


def _as_numeric(arr: np.ndarray) -> np.ndarray:
    """npy round-trips of ml_dtypes.bfloat16 come back as raw void ('|V2');
    re-view them as bfloat16 (zero-copy, works on memmaps)."""
    if arr.dtype.kind == "V" and arr.dtype.itemsize == 2:
        import ml_dtypes

        return arr.view(ml_dtypes.bfloat16)
    return arr


class PackedFlavaDataset:
    """Memory-mapped consolidated shards; O(1) open, zero-copy row access."""

    def __init__(self, shard_dir: str, phase: str):
        self.img = _as_numeric(
            np.load(os.path.join(shard_dir, f"{phase}_img.npy"), mmap_mode="r")
        )
        self.txt = _as_numeric(
            np.load(os.path.join(shard_dir, f"{phase}_txt.npy"), mmap_mode="r")
        )
        self.img_off = np.load(os.path.join(shard_dir, f"{phase}_img_offsets.npy"))
        self.txt_off = np.load(os.path.join(shard_dir, f"{phase}_txt_offsets.npy"))
        self.labels = np.load(os.path.join(shard_dir, f"{phase}_labels.npy"))

    def __len__(self):
        return len(self.labels)

    def __getitem__(self, idx):
        i0, i1 = self.img_off[idx], self.img_off[idx + 1]
        t0, t1 = self.txt_off[idx], self.txt_off[idx + 1]
        return self.img[i0:i1], self.txt[t0:t1], int(self.labels[idx])


def has_packed(shard_dir: str, phase: str) -> bool:
    return os.path.exists(os.path.join(shard_dir, f"{phase}_labels.npy"))


def get_dataset_flava(args, datapath: str):
    """Reference ``get_dataset_flava`` (``src/dataset.py:324-336``): build
    train/dev/test loaders. Prefers packed shards under
    ``{datapath}/flava_packed`` and falls back to the per-file layout."""
    shard_dir = os.path.join(datapath, "flava_packed")

    def make(phase):
        if has_packed(shard_dir, phase):
            return PackedFlavaDataset(shard_dir, phase)
        return FlavaEncodedDataset(
            datapath,
            phase,
            args.labels,
            args.error_cases_remover,
            name_extractor=args.name_extractor,
        )

    training, dev, testing = make("train"), make("dev"), make("test")
    from multimodal_uncertainty_tpu.data.loaders import subset_then_loaders

    collate = collate_fn_flava
    pad = getattr(args, "seq_pad_multiple", None)
    if pad:
        # sequence parallelism (train.py --sequence_parallel): each modality
        # pads to 128*sp so the concatenated img+txt sequence divides into
        # 128-multiple ring shards (ops/ring.py requirement)
        collate = functools.partial(collate_fn_flava, pad_multiple=int(pad))
    return subset_then_loaders(training, dev, testing, collate, args)


def _simple_args(labels, error_cases_remover, name_extractor, batch_size,
                 seed, sample_size, n_workers):
    import types

    return types.SimpleNamespace(
        labels=labels,
        error_cases_remover=error_cases_remover,
        name_extractor=name_extractor,
        batch_size=batch_size,
        seed=seed,
        sample_size=sample_size,
        n_workers=n_workers,
    )


def get_hatefulmeme(datapath: str, batch_size: int = 128, shuffle: bool = True,
                    seed: int = 42, sample_size=None, n_workers: int = 0):
    """Convenience loader under the name the reference's robustness script
    expects (``eval_transformer_robustness.py:64`` calls a
    ``dataset.get_hatefulmeme`` that no longer existed there)."""
    del shuffle  # train shuffles, eval doesn't — fixed policy like get_dataset
    args = _simple_args(
        list(range(2)), True, lambda x: x.split("/")[-1].split(".")[0],
        batch_size, seed, sample_size, n_workers,
    )
    return get_dataset_flava(args, datapath)


def get_food101_flava(datapath: str, batch_size: int = 128, shuffle: bool = True,
                      seed: int = 42, sample_size=None, n_workers: int = 0):
    """Counterpart of :func:`get_hatefulmeme` for Food-101 FLAVA embeddings
    (``eval_transformer_robustness.py:61``)."""
    from multimodal_uncertainty_tpu.data.food101 import get_labels_and_frequencies

    del shuffle
    labels, _ = get_labels_and_frequencies(os.path.join(datapath, "train.jsonl"))
    args = _simple_args(
        labels, False, lambda x: x.split(".")[0],
        batch_size, seed, sample_size, n_workers,
    )
    return get_dataset_flava(args, datapath)
