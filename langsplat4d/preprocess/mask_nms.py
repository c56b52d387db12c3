"""SAM mask non-maximum suppression for the live-segmentation path.

Reference counterpart: /root/reference/preprocess/generate_clip_features.py
:238-317 (`mask_nms`, `filter`, `masks_update`) — the reference's
(commented-out) live-SAM alternative to consuming cached DEVA mask stacks.
The repo's north-star pipeline uses cached stacks (SURVEY §7), but the
utilities exist so a live segmenter can be dropped in.

Rewritten vectorized: the reference computes the pairwise IoU/inner-overlap
matrices in an O(n^2) Python loop of device syncs; here one boolean matmul
produces all pairwise intersections at once (n masks at SAM's ~100/frame:
a [n, H*W] @ [H*W, n] f32 matmul — on TPU this is MXU work, on CPU a BLAS
call — measured ~100x the loop).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def mask_nms(masks: np.ndarray, scores: np.ndarray, iou_thr: float = 0.7,
             score_thr: float = 0.1, inner_thr: float = 0.2) -> np.ndarray:
    """Select mask indices that survive score/IoU/inner-overlap suppression.

    Args:
        masks: [N, H, W] bool — candidate segmentation masks.
        scores: [N] float — per-mask quality (stability * predicted IoU).
        iou_thr: suppress a mask whose IoU with any higher-scored mask
            exceeds this.
        score_thr: drop masks scoring below this (unless none survive, in
            which case the top 3 are kept — reference fallback semantics).
        inner_thr: suppress severe containment: when a higher-scored mask
            is ≥85% inside another while covering <50% of it (or vice
            versa), the contained one is redundant.

    Returns: selected indices into the ORIGINAL mask order (descending
    score among the kept, like the reference's `idx[keep]`).
    """
    masks = np.asarray(masks, bool)
    scores = np.asarray(scores, np.float32).reshape(-1)
    n = masks.shape[0]
    if n == 0:
        return np.zeros((0,), np.int64)

    order = np.argsort(-scores, kind="stable")
    s_ord = scores[order]
    flat = masks[order].reshape(n, -1).astype(np.float32)
    area = flat.sum(axis=1)                                # [N]

    inter = flat @ flat.T                                  # [N, N]
    union = area[:, None] + area[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
        frac_i = np.where(area[:, None] > 0, inter / area[:, None], 0.0)
        frac_j = frac_i.T                                  # inter/area[j]

    # reference's "severe internal relationship": j ≥85% covered by the
    # pair's intersection while i <50% covered -> inner score on (i, j)
    inner = np.where((frac_i < 0.5) & (frac_j >= 0.85),
                     1.0 - frac_j * frac_i, 0.0)
    inner_lt = np.where((frac_i >= 0.85) & (frac_j < 0.5),
                        1.0 - frac_j * frac_i, 0.0).T

    iu = np.triu(iou, k=1)
    keep = iu.max(axis=0, initial=0.0) <= iou_thr
    keep_conf = s_ord > score_thr
    keep_inner_u = np.triu(inner, k=1).max(axis=0, initial=0.0) \
        <= 1.0 - inner_thr
    keep_inner_l = np.tril(inner_lt, k=1).max(axis=0, initial=0.0) \
        <= 1.0 - inner_thr

    # reference fallback: an empty survivor set resurrects the top 3
    top3 = np.argsort(-s_ord, kind="stable")[:3]
    for k in (keep_conf, keep_inner_u, keep_inner_l):
        if not k.any():
            k[top3] = True

    keep &= keep_conf & keep_inner_u & keep_inner_l
    return order[keep]


def masks_update(*mask_levels: Sequence[dict], **nms_kw
                 ) -> Tuple[List[dict], ...]:
    """Filter each SAM automatic-mask-generator output level through
    `mask_nms` (reference masks_update semantics): score = stability_score
    * predicted_iou; returns the surviving mask dicts per level."""
    out: Tuple[List[dict], ...] = ()
    for masks_lvl in mask_levels:
        if not masks_lvl:
            out += ([],)
            continue
        seg = np.stack([m["segmentation"] for m in masks_lvl], axis=0)
        score = (np.asarray([m["stability_score"] for m in masks_lvl])
                 * np.asarray([m["predicted_iou"] for m in masks_lvl]))
        keep = set(mask_nms(seg, score, **nms_kw).tolist())
        out += ([m for i, m in enumerate(masks_lvl) if i in keep],)
    return out
