"""Loss and image-metric functions (reference utils/loss_utils.py,
utils/image_utils.py) in JAX."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def l1_loss(pred, gt):
    return jnp.mean(jnp.abs(pred - gt))


def l2_loss(pred, gt):
    return jnp.mean((pred - gt) ** 2)


def cos_loss(pred, gt, axis: int = -1, eps: float = 1e-8):
    """1 - mean cosine similarity (reference cos_loss uses dim=-1)."""
    num = jnp.sum(pred * gt, axis=axis)
    den = (jnp.linalg.norm(pred, axis=axis)
           * jnp.linalg.norm(gt, axis=axis))
    return 1.0 - jnp.mean(num / jnp.maximum(den, eps))


def psnr(img1, img2, mask=None):
    """PSNR over [C,H,W] or batched images (utils/image_utils.py:16-38)."""
    if mask is None:
        mse = jnp.mean((img1 - img2) ** 2)
    else:
        diff2 = ((img1 - img2) ** 2) * mask
        mse = jnp.sum(diff2) / jnp.maximum(jnp.sum(mask) * img1.shape[-3], 1)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))


def _gaussian_window(window_size: int, sigma: float) -> jnp.ndarray:
    xs = jnp.arange(window_size, dtype=jnp.float32)
    g = jnp.exp(-((xs - window_size // 2) ** 2) / (2 * sigma ** 2))
    return g / jnp.sum(g)


def ssim(img1, img2, window_size: int = 11):
    """SSIM with an 11x11 sigma-1.5 Gaussian window (loss_utils.py:39-69).

    img*: [..., C, H, W]. Depthwise conv via two separable 1D convolutions.
    """
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    c = img1.shape[-3]
    w1d = _gaussian_window(window_size, 1.5)

    def blur(x):
        # x: [B, C, H, W]; separable depthwise gaussian, SAME padding
        kh = w1d.reshape(1, 1, window_size, 1)
        kw = w1d.reshape(1, 1, 1, window_size)
        x = jax.lax.conv_general_dilated(
            x, jnp.tile(kh, (c, 1, 1, 1)), (1, 1), "SAME",
            feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        x = jax.lax.conv_general_dilated(
            x, jnp.tile(kw, (c, 1, 1, 1)), (1, 1), "SAME",
            feature_group_count=c,
            dimension_numbers=("NCHW", "OIHW", "NCHW"))
        return x

    mu1, mu2 = blur(img1), blur(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = blur(img1 * img1) - mu1_sq
    sigma2_sq = blur(img2 * img2) - mu2_sq
    sigma12 = blur(img1 * img2) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2))
    return jnp.mean(ssim_map)


def lpips_loss(img1, img2, lpips_model):
    """Perceptual loss wrapper (reference utils/loss_utils.py:17-19 — note
    the reference imports but never calls it in the training loop; the model
    is caller-supplied there too). `lpips_model` is any callable returning
    per-image distances; mean-reduced."""
    return jnp.mean(lpips_model(img1, img2))
