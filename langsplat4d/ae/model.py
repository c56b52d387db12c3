"""Language-feature autoencoder (512->3 CLIP / 4096->6 video compressor).

Functional JAX rebuild of `autoencoder/model.py:5-46`: encoder is
Linear -> [BatchNorm1d, ReLU, Linear]*; decoder is Linear -> [ReLU, Linear]*;
outputs L2-normalized after BOTH encode and decode. Checkpoints convert to and
from the reference's torch state_dict layout so `best_ckpt.pth` files are
interchangeable with the CUDA pipeline and eval.
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from langsplat4d.core.transforms import safe_normalize
from langsplat4d.field.nets import linear_init

BN_EPS = 1e-5
BN_MOMENTUM = 0.1  # torch BatchNorm1d default


def init_ae(key, encoder_dims: Sequence[int], decoder_dims: Sequence[int],
            feature_dim: int = 512) -> Dict[str, Any]:
    keys = jax.random.split(key, len(encoder_dims) + len(decoder_dims))
    enc: List[Dict] = []
    prev = feature_dim
    for i, d in enumerate(encoder_dims):
        layer = {"linear": linear_init(keys[i], prev, d)}
        if i > 0:
            layer["bn"] = {
                "gamma": jnp.ones((prev,)), "beta": jnp.zeros((prev,)),
                "mean": jnp.zeros((prev,)), "var": jnp.ones((prev,)),
            }
        enc.append(layer)
        prev = d
    dec: List[Dict] = []
    for i, d in enumerate(decoder_dims):
        layer = {"linear": linear_init(keys[len(encoder_dims) + i], prev, d)}
        dec.append(layer)
        prev = d
    return {"encoder": enc, "decoder": dec}


def _batchnorm(x, bn, train: bool):
    if train:
        mean = jnp.mean(x, axis=0)
        var = jnp.var(x, axis=0)
        n = x.shape[0]
        unbiased = var * n / max(n - 1, 1)
        new_mean = (1 - BN_MOMENTUM) * bn["mean"] + BN_MOMENTUM * mean
        new_var = (1 - BN_MOMENTUM) * bn["var"] + BN_MOMENTUM * unbiased
        stats = {"mean": new_mean, "var": new_var}
    else:
        mean, var = bn["mean"], bn["var"]
        stats = {"mean": bn["mean"], "var": bn["var"]}
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS)
    return y * bn["gamma"] + bn["beta"], stats


def encode(params, x, train: bool = False):
    """Returns (latent, updated_params) — BN running stats update in train."""
    new_enc = []
    for i, layer in enumerate(params["encoder"]):
        if "bn" in layer:
            x, stats = _batchnorm(x, layer["bn"], train)
            x = jax.nn.relu(x)
            new_enc.append({"linear": layer["linear"],
                            "bn": dict(layer["bn"], **stats)})
        else:
            new_enc.append(layer)
        x = x @ layer["linear"]["w"] + layer["linear"]["b"]
    x = safe_normalize(x)
    return x, dict(params, encoder=new_enc)


def decode(params, x):
    for i, layer in enumerate(params["decoder"]):
        if i > 0:
            x = jax.nn.relu(x)
        x = x @ layer["linear"]["w"] + layer["linear"]["b"]
    return safe_normalize(x)


def forward(params, x, train: bool = False):
    z, new_params = encode(params, x, train)
    return decode(params, z), new_params


# ---------------------------------------------------------------------------
# torch state_dict interop (encoder.0.weight, encoder.1.* = BN, ...)
# ---------------------------------------------------------------------------

def _enc_indices(n_layers: int):
    """Torch ModuleList indices: Linear at 0; then (BN, ReLU, Linear) per
    subsequent layer -> Linear i at 3i, BN i at 3i-2."""
    return [(3 * i, 3 * i - 2 if i > 0 else None) for i in range(n_layers)]


def to_torch_state_dict(params) -> Dict[str, np.ndarray]:
    sd: Dict[str, np.ndarray] = {}
    for i, (li, bi) in enumerate(_enc_indices(len(params["encoder"]))):
        layer = params["encoder"][i]
        sd[f"encoder.{li}.weight"] = np.asarray(layer["linear"]["w"]).T.copy()
        sd[f"encoder.{li}.bias"] = np.asarray(layer["linear"]["b"]).copy()
        if bi is not None:
            bn = layer["bn"]
            sd[f"encoder.{bi}.weight"] = np.asarray(bn["gamma"]).copy()
            sd[f"encoder.{bi}.bias"] = np.asarray(bn["beta"]).copy()
            sd[f"encoder.{bi}.running_mean"] = np.asarray(bn["mean"]).copy()
            sd[f"encoder.{bi}.running_var"] = np.asarray(bn["var"]).copy()
            sd[f"encoder.{bi}.num_batches_tracked"] = np.asarray(0)
    for i, layer in enumerate(params["decoder"]):
        di = 0 if i == 0 else 2 * i
        sd[f"decoder.{di}.weight"] = np.asarray(layer["linear"]["w"]).T.copy()
        sd[f"decoder.{di}.bias"] = np.asarray(layer["linear"]["b"]).copy()
    return sd


def from_torch_state_dict(sd, encoder_dims, decoder_dims,
                          feature_dim: int = 512):
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    enc = []
    for i, (li, bi) in enumerate(_enc_indices(len(encoder_dims))):
        layer = {"linear": {"w": jnp.asarray(sd[f"encoder.{li}.weight"]).T,
                            "b": jnp.asarray(sd[f"encoder.{li}.bias"])}}
        if bi is not None:
            layer["bn"] = {
                "gamma": jnp.asarray(sd[f"encoder.{bi}.weight"]),
                "beta": jnp.asarray(sd[f"encoder.{bi}.bias"]),
                "mean": jnp.asarray(sd[f"encoder.{bi}.running_mean"]),
                "var": jnp.asarray(sd[f"encoder.{bi}.running_var"]),
            }
        enc.append(layer)
    dec = []
    for i in range(len(decoder_dims)):
        di = 0 if i == 0 else 2 * i
        dec.append({"linear": {"w": jnp.asarray(sd[f"decoder.{di}.weight"]).T,
                               "b": jnp.asarray(sd[f"decoder.{di}.bias"])}})
    return {"encoder": enc, "decoder": dec}


def save_ckpt(path: str, params) -> None:
    import torch
    sd = (vae_to_torch_state_dict(params) if "fc_mu" in params
          else to_torch_state_dict(params))
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                if isinstance(v, np.ndarray) and v.ndim else torch.tensor(v)
                for k, v in sd.items()}, path)


def load_ckpt(path: str, encoder_dims, decoder_dims, feature_dim: int = 512):
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=False)
    if any(k.startswith("fc_mu") for k in sd):
        return vae_from_torch_state_dict(sd, encoder_dims, decoder_dims)
    return from_torch_state_dict(sd, encoder_dims, decoder_dims, feature_dim)


# ---------------------------------------------------------------------------
# VanillaVAE (`use_vae` alternative, autoencoder/model.py:80-246)
# ---------------------------------------------------------------------------
#
# Encoder: Linear(feature_dim -> enc[0]); then [BatchNorm1d, LeakyReLU,
# Linear] per layer; fc_mu / fc_var project enc[-1] -> latent_dim. Decoder:
# Linear(latent_dim -> dec[0]); then [LeakyReLU, Linear]*; output
# L2-normalized. reparameterize() samples z = mu + eps*exp(0.5*logvar) and
# L2-normalizes it (model.py:173-185) — that normalized sample is what
# test.py:77-90 exports as the compressed feature. The reference hardcodes
# the 512-d input (model.py:95); `feature_dim` generalizes it.

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default


def init_vae(key, encoder_dims: Sequence[int], decoder_dims: Sequence[int],
             latent_dim: int = 9, feature_dim: int = 512) -> Dict[str, Any]:
    keys = jax.random.split(key, len(encoder_dims) + len(decoder_dims) + 2)
    enc: List[Dict] = []
    prev = feature_dim
    for i, d in enumerate(encoder_dims):
        layer = {"linear": linear_init(keys[i], prev, d)}
        if i > 0:
            layer["bn"] = {
                "gamma": jnp.ones((prev,)), "beta": jnp.zeros((prev,)),
                "mean": jnp.zeros((prev,)), "var": jnp.ones((prev,)),
            }
        enc.append(layer)
        prev = d
    k_mu, k_var = keys[len(encoder_dims)], keys[len(encoder_dims) + 1]
    dec: List[Dict] = []
    prev_d = latent_dim
    for i, d in enumerate(decoder_dims):
        dec.append({"linear": linear_init(
            keys[len(encoder_dims) + 2 + i], prev_d, d)})
        prev_d = d
    return {
        "encoder": enc,
        "fc_mu": linear_init(k_mu, prev, latent_dim),
        "fc_var": linear_init(k_var, prev, latent_dim),
        "decoder": dec,
    }


def vae_encode(params, x, train: bool = False):
    """-> (mu, log_var, updated_params)."""
    new_enc = []
    for layer in params["encoder"]:
        if "bn" in layer:
            x, stats = _batchnorm(x, layer["bn"], train)
            x = jax.nn.leaky_relu(x, LEAKY_SLOPE)
            new_enc.append({"linear": layer["linear"],
                            "bn": dict(layer["bn"], **stats)})
        else:
            new_enc.append(layer)
        x = x @ layer["linear"]["w"] + layer["linear"]["b"]
    mu = x @ params["fc_mu"]["w"] + params["fc_mu"]["b"]
    log_var = x @ params["fc_var"]["w"] + params["fc_var"]["b"]
    return mu, log_var, dict(params, encoder=new_enc)


def vae_reparameterize(key, mu, log_var):
    """z = mu + eps * exp(0.5*logvar), L2-normalized (model.py:173-185)."""
    std = jnp.exp(0.5 * log_var)
    eps = jax.random.normal(key, std.shape, std.dtype)
    return safe_normalize(eps * std + mu)


def vae_decode(params, z):
    for i, layer in enumerate(params["decoder"]):
        if i > 0:
            z = jax.nn.leaky_relu(z, LEAKY_SLOPE)
        z = z @ layer["linear"]["w"] + layer["linear"]["b"]
    return safe_normalize(z)


def vae_forward(key, params, x, train: bool = False):
    """-> (recon, mu, log_var, updated_params) (reference forward order
    [decode(z), input, mu, log_var], model.py:187-190)."""
    mu, log_var, new_params = vae_encode(params, x, train)
    z = vae_reparameterize(key, mu, log_var)
    return vae_decode(params, z), mu, log_var, new_params


def vae_loss(recon, x, mu, log_var, kld_weight: float):
    """MSE + kld_weight * KL(N(mu, sigma) || N(0, 1))
    (loss_function, model.py:198-219)."""
    recons_loss = jnp.mean((recon - x) ** 2)
    kld = jnp.mean(-0.5 * jnp.sum(1 + log_var - mu ** 2 - jnp.exp(log_var),
                                  axis=1))
    return recons_loss + kld_weight * kld, recons_loss, kld


def vae_to_torch_state_dict(params) -> Dict[str, np.ndarray]:
    """nn.Sequential layout: encoder Linear at 3i (BN at 3i-2), fc_mu/fc_var,
    decoder Linear at 2i."""
    sd: Dict[str, np.ndarray] = {}
    for i, (li, bi) in enumerate(_enc_indices(len(params["encoder"]))):
        layer = params["encoder"][i]
        sd[f"encoder.{li}.weight"] = np.asarray(layer["linear"]["w"]).T.copy()
        sd[f"encoder.{li}.bias"] = np.asarray(layer["linear"]["b"]).copy()
        if bi is not None:
            bn = layer["bn"]
            sd[f"encoder.{bi}.weight"] = np.asarray(bn["gamma"]).copy()
            sd[f"encoder.{bi}.bias"] = np.asarray(bn["beta"]).copy()
            sd[f"encoder.{bi}.running_mean"] = np.asarray(bn["mean"]).copy()
            sd[f"encoder.{bi}.running_var"] = np.asarray(bn["var"]).copy()
            sd[f"encoder.{bi}.num_batches_tracked"] = np.asarray(0)
    for name in ("fc_mu", "fc_var"):
        sd[f"{name}.weight"] = np.asarray(params[name]["w"]).T.copy()
        sd[f"{name}.bias"] = np.asarray(params[name]["b"]).copy()
    for i, layer in enumerate(params["decoder"]):
        di = 0 if i == 0 else 2 * i
        sd[f"decoder.{di}.weight"] = np.asarray(layer["linear"]["w"]).T.copy()
        sd[f"decoder.{di}.bias"] = np.asarray(layer["linear"]["b"]).copy()
    return sd


def vae_from_torch_state_dict(sd, encoder_dims, decoder_dims):
    sd = {k: (v.numpy() if hasattr(v, "numpy") else np.asarray(v))
          for k, v in sd.items()}
    enc = []
    for i, (li, bi) in enumerate(_enc_indices(len(encoder_dims))):
        layer = {"linear": {"w": jnp.asarray(sd[f"encoder.{li}.weight"]).T,
                            "b": jnp.asarray(sd[f"encoder.{li}.bias"])}}
        if bi is not None:
            layer["bn"] = {
                "gamma": jnp.asarray(sd[f"encoder.{bi}.weight"]),
                "beta": jnp.asarray(sd[f"encoder.{bi}.bias"]),
                "mean": jnp.asarray(sd[f"encoder.{bi}.running_mean"]),
                "var": jnp.asarray(sd[f"encoder.{bi}.running_var"]),
            }
        enc.append(layer)
    dec = []
    for i in range(len(decoder_dims)):
        di = 0 if i == 0 else 2 * i
        dec.append({"linear": {"w": jnp.asarray(sd[f"decoder.{di}.weight"]).T,
                               "b": jnp.asarray(sd[f"decoder.{di}.bias"])}})
    return {
        "encoder": enc,
        "fc_mu": {"w": jnp.asarray(sd["fc_mu.weight"]).T,
                  "b": jnp.asarray(sd["fc_mu.bias"])},
        "fc_var": {"w": jnp.asarray(sd["fc_var.weight"]).T,
                   "b": jnp.asarray(sd["fc_var.bias"])},
        "decoder": dec,
    }
