"""Colormap application for relevancy/heatmap visualization
(reference eval/colormaps.py + eval/colors.py, nerfstudio-derived)."""
from __future__ import annotations

from dataclasses import dataclass

import numpy as np


@dataclass
class ColormapOptions:
    colormap: str = "turbo"
    normalize: bool = False
    colormap_min: float = 0.0
    colormap_max: float = 1.0
    invert: bool = False


def apply_colormap(image: np.ndarray,
                   colormap_options: ColormapOptions = ColormapOptions(),
                   eps: float = 1e-9) -> np.ndarray:
    """[H,W,1] scalar map -> [H,W,3] colors; [H,W,3] passes through; higher
    dims are PCA-compressed (reference eval_utils.colormap_saving doc)."""
    if image.shape[-1] == 3:
        return np.clip(image, 0, 1)
    if image.shape[-1] == 1:
        out = image[..., 0].astype(np.float64)
        if colormap_options.normalize:
            out = out - out.min()
            out = out / (out.max() + eps)
        out = (out * (colormap_options.colormap_max
                      - colormap_options.colormap_min)
               + colormap_options.colormap_min)
        out = np.clip(out, 0, 1)
        if colormap_options.invert:
            out = 1 - out
        return _scalar_colormap(out, colormap_options.colormap)
    # PCA to 3 channels
    from sklearn.decomposition import PCA
    h, w, c = image.shape
    flat = image.reshape(-1, c)
    out = PCA(n_components=3).fit_transform(flat).reshape(h, w, 3)
    out = (out - out.min()) / (out.max() - out.min() + eps)
    return out


def _scalar_colormap(x: np.ndarray, name: str) -> np.ndarray:
    import matplotlib.cm as cm
    mapper = cm.get_cmap(name)
    return mapper(x)[..., :3]
