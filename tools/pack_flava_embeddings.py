#!/usr/bin/env python3
"""Convert a reference-layout FLAVA embedding directory (per-sample
``.img``/``.text`` torch files under ``flava_embeds/``) into the packed
memory-mapped shards the TPU training path consumes.

Usage:
    python tools/pack_flava_embeddings.py --datapath $DATA_DIR/hateful-meme-dataset \
        [--dataset hateful-meme-dataset|food101]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_uncertainty_tpu.data.flava_encoded import (  # noqa: E402
    FlavaEncodedDataset,
    pack_split,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datapath", required=True)
    parser.add_argument("--dataset", default="hateful-meme-dataset",
                        choices=["hateful-meme-dataset", "food101"])
    parser.add_argument("--phases", nargs="*", default=["train", "dev", "test"])
    args = parser.parse_args()

    if args.dataset == "hateful-meme-dataset":
        labels = list(range(2))
        error_cases_remover = True
        name_extractor = lambda x: x.split("/")[-1].split(".")[0]  # noqa: E731
    else:
        from multimodal_uncertainty_tpu.data.food101 import (
            get_labels_and_frequencies,
        )

        labels, _ = get_labels_and_frequencies(
            os.path.join(args.datapath, "train.jsonl")
        )
        error_cases_remover = False
        name_extractor = lambda x: x.split(".")[0]  # noqa: E731

    out_dir = os.path.join(args.datapath, "flava_packed")
    for phase in args.phases:
        ds = FlavaEncodedDataset(
            args.datapath, phase, labels, error_cases_remover,
            name_extractor=name_extractor,
        )
        print(f"packing {phase}: {len(ds)} samples -> {out_dir}")
        pack_split(ds, out_dir, phase)
    print("done")


if __name__ == "__main__":
    main()
