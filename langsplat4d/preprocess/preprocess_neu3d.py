"""Extract per-frame images from Neu3D cam*.mp4 videos ahead of training
(reference preprocess/preprocess_neu3d.py:1-14: instantiating the dataset for
the train and test splits triggers the frame extraction as a side effect;
our Neu3DDataset does the same in its constructor).

Usage: python -m langsplat4d.preprocess.preprocess_neu3d --datadir <scene>
"""
from __future__ import annotations

import sys
from argparse import ArgumentParser


def main(argv=None):
    parser = ArgumentParser(description="Extract images from neu3d videos")
    parser.add_argument("--datadir", type=str, required=True)
    args = parser.parse_args(argv)

    from langsplat4d.data.readers import Neu3DDataset
    train = Neu3DDataset(args.datadir, "train", downsample=1.0, eval_index=0)
    test = Neu3DDataset(args.datadir, "test", downsample=1.0, eval_index=0)
    print(f"extracted frames: train {len(train.image_paths)} images, "
          f"test {len(test.image_paths)} images")


if __name__ == "__main__":
    main(sys.argv[1:])
