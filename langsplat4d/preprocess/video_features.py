"""Video (temporal) language features: per-(frame, object) sentence embeddings
assembled into per-frame feature tables + shifted seg maps.

Rebuild of `preprocess/generate_video_features.py:7-62`: caption CSVs (one per
object id, rows of (frame_path, ..., state_caption)) -> E5 embeddings
[max_id+1, 4096] per frame -> final `*_f.npy` (rows 1.. as 0-based) and
`*_s.npy` (seg ids shifted by -1, level axis added).

The sentence embedder (E5-mistral-7b) is pluggable for offline operation.
"""
from __future__ import annotations

import csv
import os
from typing import Callable

import numpy as np


def encode_feature(caption_dir: str, feature_name: str,
                   segmentation_dir: str,
                   encode_text: Callable[[str], np.ndarray],
                   embed_dim: int = 4096) -> None:
    """Per-frame [max_id+1, D] feature tables from caption CSVs."""
    seg_files = sorted(os.listdir(segmentation_dir))
    num_frames = len(seg_files)
    max_id = 0
    for file in seg_files:
        data = np.load(os.path.join(segmentation_dir, file))
        max_id = max(max_id, int(np.max(data)))
    features = [np.zeros((max_id + 1, embed_dim)) for _ in range(num_frames)]

    out_dir = os.path.join(caption_dir, feature_name)
    os.makedirs(out_dir, exist_ok=True)
    caption_files = [f for f in os.listdir(caption_dir)
                     if "output_text_id" in f]
    for caption_file in caption_files:
        obj_id = int(caption_file.split("id")[1].split(".")[0])
        with open(os.path.join(caption_dir, caption_file), encoding="utf-8") as f:
            reader = csv.reader(f)
            next(reader)  # header
            for row in reader:
                frame_id = int(row[0].split("/")[-1].split(".")[0])
                features[frame_id - 1][obj_id] = encode_text(row[-1])
    for i, feat in enumerate(features):
        np.save(os.path.join(out_dir, f"{i + 1:06}"), feat)


def assemble_final_features(features_dir: str, segmentation_dir: str,
                            output_dir: str) -> None:
    """Shift object ids to 0-based, drop the background row, add the level
    axis (reference :48-62)."""
    os.makedirs(output_dir, exist_ok=True)
    n = len(os.listdir(features_dir))
    assert n == len(os.listdir(segmentation_dir))
    for i in range(1, n + 1):
        seg = np.load(os.path.join(segmentation_dir, f"{i:06}.npy"))
        feat = np.load(os.path.join(features_dir, f"{i:06}.npy"))
        np.save(os.path.join(output_dir, f"{i:06}_f.npy"), feat[1:])
        np.save(os.path.join(output_dir, f"{i:06}_s.npy"),
                (seg - 1)[np.newaxis, :, :])


class E5SentenceEmbedder:
    """intfloat/e5-mistral-7b-instruct via sentence_transformers, when the
    checkpoint is available locally (reference :11-13)."""

    def __init__(self, model_name: str = "intfloat/e5-mistral-7b-instruct"):
        from sentence_transformers import SentenceTransformer
        self.model = SentenceTransformer(model_name)
        self.model.max_seq_length = 4096

    def __call__(self, text: str) -> np.ndarray:
        return np.asarray(self.model.encode(text))


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--feature_name", type=str, default="features")
    p.add_argument("--segmentation_dir", type=str, required=True)
    p.add_argument("--output_name", type=str, default="final_features")
    p.add_argument("--caption_dir", type=str, required=True)
    args = p.parse_args(argv)
    embedder = E5SentenceEmbedder()
    encode_feature(args.caption_dir, args.feature_name,
                   args.segmentation_dir, embedder)
    assemble_final_features(
        os.path.join(args.caption_dir, args.feature_name),
        args.segmentation_dir,
        os.path.join(args.caption_dir, args.output_name))


if __name__ == "__main__":
    main()
