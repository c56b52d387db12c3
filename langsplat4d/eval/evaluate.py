"""Open-vocabulary localization + time-sensitive query evaluation.

Rebuild of `eval/eval.py` (mIoU over SAM levels 1-3, vIoU/accuracy for video
features) and `eval/eval_utils.py` helpers: COCO annotation parsing with
polygon masks, avg-pool heatmap smoothing, the smooth_cuda mask cleanup, and
the relevancy->threshold->IoU->best-level pipeline (activate_stream,
eval/eval.py:143-315).
"""
from __future__ import annotations

import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from langsplat4d.eval.relevancy import relevancy_maps
from langsplat4d.utils.logging import get_logger

logger = get_logger()


# ---------------------------------------------------------------------------
# Mask helpers (eval/eval_utils.py)
# ---------------------------------------------------------------------------

def polygon_to_mask(img_shape: Tuple[int, int], points_list) -> np.ndarray:
    import cv2
    points = np.asarray(points_list, dtype=np.int32)
    mask = np.zeros(img_shape, dtype=np.uint8)
    cv2.fillPoly(mask, [points], 1)
    return mask


def stack_mask(mask_base: np.ndarray, mask_add: np.ndarray) -> np.ndarray:
    mask = mask_base.copy()
    mask[mask_add != 0] = 1
    return mask


def _avg_pool_same(x: jnp.ndarray, kernel: int, padding: int) -> jnp.ndarray:
    """AvgPool2d(kernel, stride=1, padding, count_include_pad=False) on
    [H, W]."""
    ones = jnp.ones_like(x)
    window = (kernel, kernel)
    pads = ((padding, padding), (padding, padding))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, window, (1, 1), pads)
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, window, (1, 1),
                                   pads)
    return summed / counts


def smooth_mask(mask: jnp.ndarray) -> jnp.ndarray:
    """smooth_cuda (eval_utils.py:95-100): 7x7 avg pool (pad 3) > 0.5.
    Note: torch pad=3 with k=7 yields same-size output."""
    return (_avg_pool_same(mask.astype(jnp.float32), 7, 3) > 0.5)


def majority_smooth(mask: np.ndarray) -> np.ndarray:
    """Reference `smooth` (eval/eval_utils.py:46-55): per-pixel majority vote
    over a 7x7 window, including the reference's exact boundary clamp (the
    upper bounds clamp to h-1 / w-1 EXCLUSIVE, so edge windows drop the last
    row/column). Integral-image formulation replaces the O(H*W*49) python
    loop; bincount-argmax tie-breaking picks 0, i.e. strictly-greater-than-
    half wins."""
    m = np.asarray(mask)
    h, w = m.shape[:2]
    ii = np.zeros((h + 1, w + 1), np.int64)
    ii[1:, 1:] = m.astype(np.int64).cumsum(0).cumsum(1)
    i = np.arange(h)
    j = np.arange(w)
    lo_i = np.maximum(0, i - 3)
    hi_i = np.minimum(i + 4, h - 1)
    lo_j = np.maximum(0, j - 3)
    hi_j = np.minimum(j + 4, w - 1)
    s = (ii[hi_i[:, None], hi_j[None, :]] - ii[lo_i[:, None], hi_j[None, :]]
         - ii[hi_i[:, None], lo_j[None, :]] + ii[lo_i[:, None], lo_j[None, :]])
    cnt = (hi_i - lo_i)[:, None] * (hi_j - lo_j)[None, :]
    return (2 * s > cnt).astype(m.dtype)


def vis_mask_save(mask: np.ndarray, save_path) -> None:
    """Binary mask -> white-on-black PNG (eval_utils.py:75-79)."""
    import cv2
    from pathlib import Path
    save_path = Path(save_path)
    out = mask.copy().astype(np.uint8)
    out[mask == 1] = 255
    save_path.parent.mkdir(exist_ok=True, parents=True)
    cv2.imwrite(str(save_path), out)


def colormap_saving(image: np.ndarray, colormap_options, save_path) -> None:
    """Apply colormap and write PNG (eval_utils.py:57-72)."""
    from pathlib import Path
    from langsplat4d.eval.colormaps import apply_colormap
    import cv2
    out = apply_colormap(image, colormap_options)
    save_path = Path(save_path).with_suffix(".png")
    save_path.parent.mkdir(exist_ok=True, parents=True)
    cv2.imwrite(str(save_path),
                (np.clip(out, 0, 1)[..., ::-1] * 255).astype(np.uint8))


# ---------------------------------------------------------------------------
# COCO GT parsing (eval_gt_lerfdata, eval/eval.py:48-140)
# ---------------------------------------------------------------------------

def load_coco_annotations(json_folder: str, prompts: Optional[Sequence[str]]
                          = None, replace_prompts: Optional[Dict] = None,
                          dataset_type: str = "hypernerf",
                          visualize_results: bool = False,
                          vis_output_path: Optional[str] = None):
    with open(os.path.join(json_folder, "_annotations.coco.json")) as f:
        data = json.load(f)
    id2name = {int(it["id"]): it["name"] for it in data["categories"]}
    name2id = {v: k for k, v in id2name.items()}
    gt_ann: Dict[str, Dict] = {}
    img_paths: List[str] = []
    im_id2imidx: Dict[int, int] = {}
    h = w = 0
    for img_data in data["images"]:
        img_ann: Dict[str, Dict] = defaultdict(dict)
        idx = img_data["id"]
        img_name = img_data["file_name"]
        img_paths.append(os.path.join(json_folder, img_name))
        h, w = img_data["height"], img_data["width"]
        for annotation in data["annotations"]:
            if annotation["image_id"] != idx:
                continue
            label = id2name[annotation["category_id"]]
            if prompts is not None and label not in prompts:
                continue
            box = np.asarray(annotation["bbox"], dtype=np.float64).reshape(-1)
            box[2] += box[0]
            box[3] += box[1]
            segmentation = annotation["segmentation"][0]
            assert len(segmentation) % 2 == 0
            pts = [[segmentation[i], segmentation[i + 1]]
                   for i in range(0, len(segmentation), 2)]
            mask = polygon_to_mask((h, w), pts)
            label_list = [label]
            if replace_prompts is not None and label in replace_prompts:
                label_list = list(replace_prompts[label]) + [label]
            for lbl in label_list:
                if img_ann[lbl].get("mask") is not None:
                    mask2 = stack_mask(img_ann[lbl]["mask"], mask)
                    img_ann[lbl]["bboxes"] = np.concatenate(
                        [np.asarray(img_ann[lbl]["bboxes"]).reshape(-1, 4),
                         box.reshape(-1, 4)], axis=0)
                    img_ann[lbl]["mask"] = mask2
                else:
                    img_ann[lbl]["bboxes"] = box
                    img_ann[lbl]["mask"] = mask
                if visualize_results and vis_output_path is not None:
                    # GT-mask dump (eval/eval.py:118-122)
                    vis_mask_save(
                        img_ann[lbl]["mask"],
                        os.path.join(vis_output_path, "gt",
                                     img_name.split(".")[0], f"{lbl}.jpg"))
        gt_ann[f"{idx}"] = img_ann
    for item in data["images"]:
        idx = item["id"]
        stem = int(item["file_name"].split("_")[0])
        im_id2imidx[idx] = stem - 1 if dataset_type == "hypernerf" else stem
    return gt_ann, (h, w), img_paths, id2name, name2id, im_id2imidx


# ---------------------------------------------------------------------------
# activate_stream (eval/eval.py:143-315)
# ---------------------------------------------------------------------------

def activate_stream(sem_map: np.ndarray, prompts: List[str],
                    pos_embeds: np.ndarray, neg_embeds: np.ndarray,
                    gt_masks: Dict[str, np.ndarray], thresh: float = 0.4,
                    scale: int = 29,
                    chose_mask_strategy: str = "point",
                    adaptive_thresh: bool = False,
                    adaptive_alpha: Optional[float] = None,
                    low_thresh_filter: int = 0,
                    image: Optional[np.ndarray] = None,
                    image_name=None,
                    visualize_results: bool = False,
                    colormap_options=None):
    """Per-prompt relevancy -> smoothing -> threshold -> IoU per level,
    best level by max relevancy point.

    sem_map: [L, H, W, D] decoded CLIP-space features.
    Returns (chosen_iou_list, chosen_lvl_list, per_prompt dict, masks).

    `adaptive_thresh` reproduces the reference's env-gated adaptive
    thresholding (eval/eval.py:226-239): the cut moves to
    (mean_relevancy - 1) * alpha + 1, where the mean is over the whole map
    or (low_thresh_filter > 0) over the majority-smoothed fixed-thresh mask.
    Like the reference, the updated threshold persists across levels and
    prompts within one call (the reference mutates its `thresh` argument).

    `visualize_results` writes the reference's per-prompt composites under
    `image_name/` (eval/eval.py:178-224,300-307): relevancy heatmaps,
    turbo-composited cutouts over the dimmed RGB image, the dimmed
    background, the GT-annotation overlay, and the chosen masks.
    `image` is the [H, W, 3] float RGB frame (needed for composites).
    """
    from pathlib import Path
    from langsplat4d.eval.colormaps import ColormapOptions, apply_colormap
    if colormap_options is None:
        colormap_options = ColormapOptions(
            colormap="turbo", normalize=True,
            colormap_min=-1.0, colormap_max=1.0)
    valid_map = np.asarray(relevancy_maps(
        jnp.asarray(sem_map), jnp.asarray(pos_embeds),
        jnp.asarray(neg_embeds)))  # [L, P, H, W]
    n_head, n_prompt = valid_map.shape[:2]

    # heatmap smoothing: 0.5*(avgpool + raw); torch AvgPool2d(k=scale, pad=14)
    pad = 14
    smoothed = np.stack([
        np.stack([
            np.asarray(_avg_pool_same(jnp.asarray(valid_map[i, k]), scale,
                                      pad))
            for k in range(n_prompt)]) for i in range(n_head)])
    valid_map = 0.5 * (smoothed + valid_map)

    chosen_iou_list, chosen_lvl_list = [], []
    prompt_iou_lvl_dict = {}
    mask_dict, mask_for_video_dict = {}, {}
    thresh_val = thresh  # mutated by adaptive mode, persists (ref parity)
    for k in range(n_prompt):
        iou_lvl = np.zeros(n_head)
        mask_lvl = []
        mask_video = []
        thresh_list = []
        for i in range(n_head):
            if visualize_results and image_name is not None:
                colormap_saving(
                    valid_map[i, k][..., None], colormap_options,
                    Path(image_name) / "heatmap" / f"{prompts[k]}_{i}")
            output = valid_map[i, k]
            output = output - output.min()
            output = output / (output.max() + 1e-9)
            output = output * 2.0 - 1.0
            output = np.clip(output, 0, 1)
            thresh_list.append(thresh_val)

            if visualize_results and image_name is not None and \
                    image is not None:
                # composited cutout: turbo(relevancy-0.5) over dimmed RGB
                p_i = np.clip(valid_map[i, k] - 0.5, 0, 1)[..., None]
                compo = apply_colormap(p_i / (p_i.max() + 1e-6),
                                       ColormapOptions("turbo"))
                lowrel = valid_map[i, k] < 0.5
                compo[lowrel] = image[lowrel] * 0.6
                colormap_saving(
                    compo, colormap_options,
                    Path(image_name) / "composited" / f"{prompts[k]}_{i}")
                if i == 0:
                    colormap_saving(
                        image * 0.6, colormap_options,
                        Path(image_name) / "background" / f"{prompts[k]}_{i}")
                    overlay = np.array([128 / 255, 0.0, 128 / 255]) * 0.5
                    annot = image.copy()
                    gt = gt_masks[prompts[k]].astype(bool)
                    # the reference adds overlay_layer * 255 (eval/eval.py:
                    # 220), saturating annotated pixels to strong magenta
                    # after the save-time clip — reproduced byte-for-byte
                    annot[gt] = np.clip(annot[gt] * 0.5 + overlay * 255.0,
                                        0.0, 1.0)
                    colormap_saving(
                        annot, colormap_options,
                        Path(image_name) / "annotation" / f"{prompts[k]}_{i}")

            if adaptive_thresh:
                if low_thresh_filter > 0:
                    mask_area = (output > thresh_val).astype(np.uint8)
                    mask_area = majority_smooth(mask_area)
                    sel = valid_map[i, k][mask_area.astype(bool)]
                    # DELIBERATE deviation: the reference's empty-selection
                    # .mean() yields NaN and poisons the threshold
                    # (eval/eval.py:231 — torch-version-dependent uint8
                    # indexing, too); fall back to the whole-map mean instead
                    mean_ = float(sel.mean()) if sel.size else \
                        float(valid_map[i, k].mean())
                else:
                    mean_ = float(valid_map[i, k].mean())
                alpha = float(adaptive_alpha)
                assert 0.0 < alpha < 1.0, alpha
                thresh_val = (mean_ - 1.0) * alpha + 1.0
                logger.info(f"mean_:{mean_}, adaptive thresh: {thresh_val}")

            mask_pred = (output > thresh_val).astype(np.uint8)
            mask_video.append(mask_pred)
            mask_pred = np.asarray(smooth_mask(jnp.asarray(mask_pred))
                                   ).astype(np.uint8)
            mask_lvl.append(mask_pred)

            mask_gt = gt_masks[prompts[k]].astype(np.uint8)
            inter = np.logical_and(mask_gt, mask_pred).sum()
            union = np.logical_or(mask_gt, mask_pred).sum()
            iou_lvl[i] = inter / union if union > 0 else 0.0

        if chose_mask_strategy == "point":
            score_lvl = np.array([valid_map[i, k].max()
                                  for i in range(n_head)])
        elif chose_mask_strategy == "mean":
            score_lvl = np.zeros(n_head)
            for i in range(n_head):
                # the reference reassigns its outer `thresh` to thresh_list[i]
                # here (eval/eval.py:271), so when adaptive_thresh and 'mean'
                # combine, the value persisted into the next prompt/level is
                # the PRE-adaptive thresh_list entry — mirrored exactly
                thresh_val = thresh_list[i]
                output = valid_map[i, k]
                o = output - output.min()
                o = o / (o.max() + 1e-9) * 2 - 1
                area = np.clip(o, 0, 1) > thresh_list[i]
                score_lvl[i] = valid_map[i, k][area].mean() if area.sum() \
                    else 0.0
        else:
            raise NotImplementedError(chose_mask_strategy)

        chosen = int(np.argmax(score_lvl))
        chosen_iou_list.append(iou_lvl[chosen])
        chosen_lvl_list.append(chosen)
        if visualize_results and image_name is not None:
            vis_mask_save(mask_lvl[chosen],
                          Path(image_name) / f"chosen_{prompts[k]}.png")
            vis_mask_save(
                mask_video[chosen],
                Path(image_name) / f"chosen_for_video_{prompts[k]}.png")
        prompt_iou_lvl_dict[prompts[k]] = (iou_lvl[chosen], chosen, score_lvl,
                                           thresh_list)
        mask_dict[prompts[k]] = mask_lvl[chosen]
        mask_for_video_dict[prompts[k]] = [mask_video[chosen]]
    return (chosen_iou_list, chosen_lvl_list, prompt_iou_lvl_dict, mask_dict,
            mask_for_video_dict)


# ---------------------------------------------------------------------------
# Time-sensitive query metrics (eval/eval.py:317-327,355-402)
# ---------------------------------------------------------------------------

def cal_avg_video_feature(decode_fn, mask: np.ndarray,
                          video_features_dim: np.ndarray,
                          query_embedding: np.ndarray) -> float:
    """Mean cosine similarity between decoded masked video features and the
    query embedding."""
    chosen = video_features_dim[mask == 1]
    if len(chosen) == 0:
        return 0.0
    decoded = np.asarray(decode_fn(jnp.asarray(chosen)))
    q = query_embedding.reshape(-1)
    q = q / (np.linalg.norm(q) + 1e-12)
    d = decoded / (np.linalg.norm(decoded, axis=-1, keepdims=True) + 1e-12)
    return float(np.mean(d @ q))


def _idx_in_intervals(idx: int, intervals) -> bool:
    return any(lo <= idx <= hi for lo, hi in intervals)


def evaluate_video_feature(similarity_list, ground_truth_list, threshold):
    """Accuracy/precision/recall/vIoU over frame intervals
    (eval/eval.py:355-402). similarity_list: [(idx, sim, iou), ...]."""
    label_list = [_idx_in_intervals(fm[0], ground_truth_list)
                  for fm in similarity_list]
    predict_list = [fm[1] >= threshold for fm in similarity_list]
    tp = sum(1 for p, l in zip(predict_list, label_list) if p and l)
    fp = sum(1 for p, l in zip(predict_list, label_list) if p and not l)
    fn = sum(1 for p, l in zip(predict_list, label_list) if not p and l)
    accuracy = sum(1 for p, l in zip(predict_list, label_list)
                   if p == l) / len(predict_list)
    precision = tp / (tp + fp) if (tp + fp) > 0 else 0
    recall = tp / (tp + fn) if (tp + fn) > 0 else 0
    iou_values = []
    for (pred, fm), lbl in zip(zip(predict_list, similarity_list),
                               label_list):
        if lbl or pred:
            iou_values.append(fm[2] if (lbl and pred) else 0)
    avg_iou = sum(iou_values) / len(iou_values) if iou_values else 0
    return {"accuracy": accuracy, "precision": precision, "recall": recall,
            "average_iou": avg_iou, "label_list": label_list,
            "predict_list": predict_list}


def save_similarity_plot(similarity_list, save_path: str,
                         thresh_hold: float = 0.0) -> None:
    """Per-frame similarity curve with the decision threshold
    (drawn_similarity_images, eval/eval.py:329-343)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    indices = [x[0] for x in similarity_list]
    values = [x[1] for x in similarity_list]
    plt.figure(figsize=(10, 6))
    plt.plot(indices, values, marker="o", linestyle="-", color="b",
             label="Similarity")
    plt.axhline(y=thresh_hold, color="r", linestyle="--",
                label=f"Threshold: {thresh_hold}")
    plt.title("Similarity across Different Indices")
    plt.xlabel("Index")
    plt.ylabel("Cosine Similarity")
    plt.legend()
    plt.grid(True)
    plt.savefig(save_path)
    plt.close()


def plot_confusion_matrix(y_true, y_pred, labels=None, title: str = "default",
                          output_path: str = ".") -> None:
    """2x2 in-interval confusion matrix PNG (eval/eval.py:345-352;
    matplotlib-only — no seaborn dependency)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    labels = list(labels) if labels is not None else sorted(set(y_true))
    n = len(labels)
    cm = np.zeros((n, n), np.int64)
    lut = {l: i for i, l in enumerate(labels)}
    for t, p in zip(y_true, y_pred):
        cm[lut[t], lut[p]] += 1
    plt.figure(figsize=(6, 4))
    plt.imshow(cm, cmap="Blues")
    for r in range(n):
        for c in range(n):
            plt.text(c, r, str(cm[r, c]), ha="center", va="center",
                     color="black")
    plt.xticks(range(n), [str(l) for l in labels])
    plt.yticks(range(n), [str(l) for l in labels])
    plt.xlabel("Predicted")
    plt.ylabel("True")
    plt.title(f"{title} Confusion Matrix")
    plt.savefig(os.path.join(output_path, f"{title}_Confusion_matrix.png"))
    plt.close()


def smooth_similarity(sorted_sims, frames: int, coff: Sequence[float]):
    """Temporal smoothing of (idx, sim, iou) lists (eval/eval.py:721-758)."""
    assert frames * 2 + 1 == len(coff)
    out = []
    for i in range(len(sorted_sims)):
        acc = 0.0
        ok = True
        for j in range(-frames, frames + 1):
            if 0 <= i + j < len(sorted_sims):
                acc += sorted_sims[i + j][1] * coff[j + frames]
            else:
                acc = sorted_sims[i][1]
                ok = False
                break
        out.append(acc)
    return [(s[0], v, s[2]) for s, v in zip(sorted_sims, out)]
