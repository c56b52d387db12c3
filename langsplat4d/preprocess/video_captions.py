"""Object state captions via a multimodal LLM (Qwen2-VL in the reference).

Rebuild of `preprocess/generate_video_captions.py`: per object, (1) one
video-level caption over the highlighted-object mp4, then (2) per-frame state
captions conditioned on the video caption with +-3-frame context, written as
`output_text_id{obj}.csv` rows of (frame_path, video_caption, state_caption)
consumed by video_features.encode_feature.

The MLLM is pluggable; Qwen2VLCaptioner requires a locally cached checkpoint
(offline MLLM stage — SURVEY §2.14).
"""
from __future__ import annotations

import csv
import os
from typing import List, Optional

VIDEO_PROMPT = ("Please describe the motion of the object highlighted by the "
                "red outline in the video, focusing on its state changes "
                "over time.")
FRAME_PROMPT = ("The video shows: {video_caption}\nDescribe the current "
                "state of the highlighted object in this frame, given the "
                "surrounding frames as context.")


class Qwen2VLCaptioner:
    """Qwen2-VL-7B-Instruct captioner (requires local checkpoint)."""

    def __init__(self, model_name: str = "Qwen/Qwen2-VL-7B-Instruct"):
        from transformers import AutoProcessor, Qwen2VLForConditionalGeneration
        self.model = Qwen2VLForConditionalGeneration.from_pretrained(model_name)
        self.processor = AutoProcessor.from_pretrained(model_name)

    def caption_video(self, frame_paths: List[str], prompt: str) -> str:
        import torch
        messages = [{"role": "user", "content": [
            {"type": "video", "video": frame_paths},
            {"type": "text", "text": prompt}]}]
        text = self.processor.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=True)
        inputs = self.processor(text=[text], videos=[frame_paths],
                                return_tensors="pt")
        with torch.no_grad():
            out = self.model.generate(**inputs, max_new_tokens=256)
        return self.processor.batch_decode(
            out[:, inputs["input_ids"].shape[1]:],
            skip_special_tokens=True)[0]

    def caption_frames(self, frame_paths: List[str], prompt: str) -> str:
        return self.caption_video(frame_paths, prompt)


def generate_captions(prompt_image_dir: str, output_dir: str,
                      captioner, context: int = 3,
                      object_ids: Optional[List[int]] = None) -> None:
    """Caption every object directory under prompt_image_dir."""
    os.makedirs(output_dir, exist_ok=True)
    if object_ids is None:
        object_ids = sorted(int(d) for d in os.listdir(prompt_image_dir)
                            if os.path.isdir(os.path.join(prompt_image_dir, d)))
    for obj_id in object_ids:
        obj_dir = os.path.join(prompt_image_dir, f"{obj_id:02}")
        frames = sorted(os.listdir(obj_dir))
        frame_paths = [os.path.join(obj_dir, f) for f in frames]
        video_caption = captioner.caption_video(frame_paths, VIDEO_PROMPT)
        out_path = os.path.join(output_dir, f"output_text_id{obj_id}.csv")
        with open(out_path, "w", newline="", encoding="utf-8") as f:
            writer = csv.writer(f)
            writer.writerow(["frame", "video_caption", "state_caption"])
            for i, fp in enumerate(frame_paths):
                lo = max(0, i - context)
                hi = min(len(frame_paths), i + context + 1)
                state = captioner.caption_frames(
                    frame_paths[lo:hi],
                    FRAME_PROMPT.format(video_caption=video_caption))
                writer.writerow([fp, video_caption, state])


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--prompt_image_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, required=True)
    p.add_argument("--context", type=int, default=3)
    args = p.parse_args(argv)
    generate_captions(args.prompt_image_dir, args.output_dir,
                      Qwen2VLCaptioner(), args.context)


if __name__ == "__main__":
    main()
