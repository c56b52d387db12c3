"""Per-object visual prompts for the MLLM captioner: red-outline highlight +
blur-grayscale background composites, then per-object mp4s.

Rebuild of `preprocess/generate_image_prompt.py:8-85` (pure PIL/numpy).
"""
from __future__ import annotations

import os
from typing import Iterable, Set

import numpy as np


def highlight_object(image, mask_for_id: np.ndarray):
    """One composite: object sharp, background blurred+grayscale, red dotted
    outline along the mask boundary."""
    from PIL import Image, ImageDraw, ImageFilter
    image = image.convert("RGBA")
    blurred = image.filter(ImageFilter.GaussianBlur(radius=10))
    image_bw = blurred.convert("L").convert("RGBA")
    final = Image.composite(
        image, image_bw,
        Image.fromarray((mask_for_id * 255).astype(np.uint8)))

    ys, xs = np.where(mask_for_id)
    if ys.size:
        draw = ImageDraw.Draw(final)
        h, w = mask_for_id.shape
        # boundary pixels: any 4-neighbor outside the mask (or image edge)
        pad = np.pad(mask_for_id, 1, constant_values=False)
        inner = (pad[:-2, 1:-1] & pad[2:, 1:-1]
                 & pad[1:-1, :-2] & pad[1:-1, 2:])
        boundary = mask_for_id & ~inner
        r = 2
        for y, x in zip(*np.where(boundary)):
            draw.ellipse((x - r, y - r, x + r, y + r), outline="red", width=2)
    return final


def process_frames(unique_ids: Iterable[int], num_frames: int, mask_dir: str,
                   image_dir: str, output_dir: str, begin_idx: int = 1,
                   end_str: str = "png") -> None:
    from PIL import Image
    for i in range(begin_idx, num_frames + begin_idx):
        image = Image.open(f"{image_dir}/{i:06}.{end_str}")
        mask = np.load(f"{mask_dir}/{i:06}.npy")
        for mask_id in unique_ids:
            mask_for_id = mask == mask_id
            if not np.any(mask_for_id):
                continue
            final = highlight_object(image, mask_for_id)
            os.makedirs(f"{output_dir}/{mask_id:02}", exist_ok=True)
            final.save(f"{output_dir}/{mask_id:02}/{i:06}.png")


def pic2video(input_dir: str, output_path: str, fps: int = 30) -> None:
    import imageio
    from PIL import Image
    names = sorted(os.listdir(input_dir))
    images = [np.asarray(Image.open(os.path.join(input_dir, n)).convert("RGB"))
              for n in names]
    imageio.mimwrite(output_path, images, fps=fps)


def collect_unique_ids(mask_dir: str, num_frames: int,
                       begin_idx: int = 1) -> Set[int]:
    ids: Set[int] = set()
    for i in range(begin_idx, num_frames + begin_idx):
        ids.update(np.unique(np.load(f"{mask_dir}/{i:06}.npy")).tolist())
    return ids


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--mask_dir", type=str, required=True)
    p.add_argument("--image_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./prompt_images")
    p.add_argument("--begin_idx", type=int, default=1)
    p.add_argument("--end_str", type=str, default="png")
    args = p.parse_args(argv)
    num_frames = len(os.listdir(args.image_dir))
    ids = collect_unique_ids(args.mask_dir, num_frames, args.begin_idx)
    process_frames(ids, num_frames, args.mask_dir, args.image_dir,
                   args.output_dir, args.begin_idx, args.end_str)
    for i in range(max(ids)):
        d = f"{args.output_dir}/{i:02}"
        if os.path.isdir(d):
            pic2video(d, f"{args.output_dir}/{i:02}.mp4")


if __name__ == "__main__":
    main()
