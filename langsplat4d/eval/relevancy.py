"""CLIP relevancy scoring (reference eval/openclip_encoder.py).

The relevancy math — softmax(10*sims) against the 4 canonical negatives with
the min-over-negatives pair selection (:41-56) — is pure array math, rebuilt
in JAX so the per-pixel matmuls ride the MXU. Text embedding acquisition is
pluggable: a transformers CLIP encoder (when the checkpoint is available
locally) or precomputed embeddings from an .npz cache — this framework treats
MLLM feature extraction as an offline stage (SURVEY §2.13-2.14).
"""
from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

NEGATIVES = ("object", "things", "stuff", "texture")


def relevancy(embeds: jnp.ndarray, pos_embeds: jnp.ndarray,
              neg_embeds: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel relevancy of each positive phrase.

    Args:
        embeds: [N, D] (L2-normalized CLIP features).
        pos_embeds: [P, D] positive phrase embeddings (normalized).
        neg_embeds: [G, D] negative embeddings (normalized).

    Returns: [N, P] positive probability, min over negatives (reference
    get_relevancy: softmax over (pos, neg) pairs at temperature 10, take the
    pair with the smallest positive probability).
    """
    hp = jax.lax.Precision.HIGHEST
    pos_sim = jnp.matmul(embeds, pos_embeds.T, precision=hp)  # [N,P]
    neg_sim = jnp.matmul(embeds, neg_embeds.T, precision=hp)  # [N,G]
    # softmax over the pair (pos, neg_g): p = e^{10 pos} / (e^{10 pos} + e^{10 neg_g})
    pos10 = 10.0 * pos_sim[:, :, None]                        # [N,P,1]
    neg10 = 10.0 * neg_sim[:, None, :]                        # [N,1,G]
    pair_pos_prob = jax.nn.sigmoid(pos10 - neg10)             # [N,P,G]
    return jnp.min(pair_pos_prob, axis=-1)                    # [N,P]


def relevancy_maps(sem_map: jnp.ndarray, pos_embeds: jnp.ndarray,
                   neg_embeds: jnp.ndarray) -> jnp.ndarray:
    """[L,H,W,D] decoded features -> [L,P,H,W] relevancy maps
    (reference get_max_across, openclip_encoder.py:96-112)."""
    l, h, w, d = sem_map.shape
    flat = sem_map.reshape(-1, d)
    rel = relevancy(flat, pos_embeds, neg_embeds)   # [L*H*W, P]
    p = pos_embeds.shape[0]
    return rel.reshape(l, h, w, p).transpose(0, 3, 1, 2)


class TextEmbedder:
    """Pluggable prompt -> CLIP text embedding provider."""

    def encode(self, prompts: Sequence[str]) -> np.ndarray:
        raise NotImplementedError

    def negatives(self) -> np.ndarray:
        out = self.encode(list(NEGATIVES))
        return out / np.linalg.norm(out, axis=-1, keepdims=True)


class CachedTextEmbedder(TextEmbedder):
    """Embeddings from an .npz file {prompt: [D] array} produced offline."""

    def __init__(self, path: str):
        self.table: Dict[str, np.ndarray] = dict(np.load(path))

    def encode(self, prompts: Sequence[str]) -> np.ndarray:
        rows = []
        for p in prompts:
            if p not in self.table:
                raise KeyError(f"prompt {p!r} missing from embedding cache; "
                               f"available: {sorted(self.table)[:10]}...")
            rows.append(self.table[p])
        out = np.stack(rows).astype(np.float32)
        return out / np.linalg.norm(out, axis=-1, keepdims=True)


class TransformersClipEmbedder(TextEmbedder):
    """CLIP ViT-B-16 (laion2b) text tower via transformers, when the
    checkpoint is available locally (reference uses open_clip ViT-B-16
    laion2b_s34b_b88k, openclip_encoder.py:18-19)."""

    def __init__(self, model_name: str = "laion/CLIP-ViT-B-16-laion2B-s34b-b88k"):
        from transformers import CLIPModel, CLIPProcessor
        self.model = CLIPModel.from_pretrained(model_name)
        self.processor = CLIPProcessor.from_pretrained(model_name)

    def encode(self, prompts: Sequence[str]) -> np.ndarray:
        import torch
        inputs = self.processor(text=list(prompts), return_tensors="pt",
                                padding=True)
        with torch.no_grad():
            out = self.model.get_text_features(**inputs)
        out = out.numpy().astype(np.float32)
        return out / np.linalg.norm(out, axis=-1, keepdims=True)


def make_text_embedder(cache_path: Optional[str] = None) -> TextEmbedder:
    if cache_path:
        return CachedTextEmbedder(cache_path)
    return TransformersClipEmbedder()
