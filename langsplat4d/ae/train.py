"""Autoencoder training CLI (reference autoencoder/train.py:28-185).

L2 + weighted cosine loss, Adam, best-checkpoint selection after epoch 90,
`split_dataset` env knob for an 80/20 eval split. Checkpoints are written in
torch state_dict format (ckpt/<model_name>/best_ckpt.pth) for interop.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    from langsplat4d.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from langsplat4d.ae import model as M
    from langsplat4d.ae.data import load_feature_dataset
    from langsplat4d.train.optim import adam_init, adam_update
    from langsplat4d.utils.logging import get_logger

    logger = get_logger()
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--num_epochs", type=int, default=100)
    p.add_argument("--lr", type=float, default=0.0001)
    p.add_argument("--encoder_dims", nargs="+", type=int,
                   default=[256, 128, 64, 32, 3])
    p.add_argument("--decoder_dims", nargs="+", type=int,
                   default=[32, 64, 128, 256, 256, 512])
    p.add_argument("--hidden_dims", type=int, default=3)
    p.add_argument("--feature_dims", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=64)
    p.add_argument("--cos_weight", type=float, default=1e-3)
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--language_name", type=str, default=None)
    p.add_argument("--ckpt_dir", type=str, default="ckpt")
    p.add_argument("--eval_from_epoch", type=int, default=90)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--latent_dim", type=int, default=9,
                   help="VanillaVAE latent width (use_vae=t)")
    p.add_argument("--kld_weight", type=float, default=0.00025,
                   help="VanillaVAE KL weight (loss_function M_N)")
    args = p.parse_args(argv)
    use_vae = os.getenv("use_vae", "f") == "t"

    if not use_vae:
        assert args.hidden_dims == args.encoder_dims[-1]
    assert args.feature_dims == args.decoder_dims[-1]

    data_dir = os.path.join(args.dataset_path,
                            args.language_name or "language_features")
    out_dir = os.path.join(args.ckpt_dir, args.model_name)
    os.makedirs(out_dir, exist_ok=True)
    data, _ = load_feature_dataset(data_dir)
    rng = np.random.default_rng(args.seed)
    if os.getenv("split_dataset", "f") == "t":
        perm = rng.permutation(len(data))
        cut = int(0.8 * len(data))
        train_data, test_data = data[perm[:cut]], data[perm[cut:]]
    else:
        train_data = test_data = data
    logger.info(f"AE training on {len(train_data)} features "
                f"({args.feature_dims}->{args.hidden_dims})")

    rng_key = jax.random.PRNGKey(args.seed + 1)
    if use_vae:
        params = M.init_vae(jax.random.PRNGKey(args.seed), args.encoder_dims,
                            args.decoder_dims, args.latent_dim,
                            args.feature_dims)
    else:
        params = M.init_ae(jax.random.PRNGKey(args.seed), args.encoder_dims,
                           args.decoder_dims, args.feature_dims)
    opt = adam_init(params)

    def loss_fn(params, batch, key):
        if use_vae:
            # MSE + weighted KLD (VanillaVAE.loss_function, model.py:198-219)
            recon, mu, log_var, new_params = M.vae_forward(key, params, batch,
                                                           train=True)
            loss, recons, kld = M.vae_loss(recon, batch, mu, log_var,
                                           args.kld_weight)
            return loss, (new_params, recons, kld)
        out, new_params = M.forward(params, batch, train=True)
        l2 = jnp.mean((out - batch) ** 2)
        cos = 1.0 - jnp.mean(jnp.sum(out * batch, -1) / (
            jnp.linalg.norm(out, axis=-1)
            * jnp.maximum(jnp.linalg.norm(batch, axis=-1), 1e-8)))
        return l2 + cos * args.cos_weight, (new_params, l2, cos)

    @jax.jit
    def train_batch(params, opt, batch, key):
        (loss, (new_params, l2, cos)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch, key)
        lr_tree = jax.tree.map(lambda _: jnp.asarray(args.lr), grads)
        tr_tree = jax.tree.map(lambda _: True, grads)
        upd_params, new_opt = adam_update(params, grads, opt, lr_tree,
                                          tr_tree, eps=1e-8)
        # keep BN running stats from forward, Adam-updated weights otherwise
        for i, layer in enumerate(new_params["encoder"]):
            if "bn" in layer:
                upd_params["encoder"][i]["bn"]["mean"] = layer["bn"]["mean"]
                upd_params["encoder"][i]["bn"]["var"] = layer["bn"]["var"]
        return upd_params, new_opt, loss, l2, cos

    @jax.jit
    def eval_batch(params, batch):
        if use_vae:
            # deterministic eval: decode the normalized mean latent
            from langsplat4d.core.transforms import safe_normalize
            mu, _, _ = M.vae_encode(params, batch, train=False)
            out = M.vae_decode(params, safe_normalize(mu))
        else:
            out, _ = M.forward(params, batch, train=False)
        l2 = jnp.mean((out - batch) ** 2)
        cos = 1.0 - jnp.mean(jnp.sum(out * batch, -1) / (
            jnp.linalg.norm(out, axis=-1)
            * jnp.maximum(jnp.linalg.norm(batch, axis=-1), 1e-8)))
        return l2 + cos, l2, cos

    bs = args.batch_size
    best_eval, best_epoch = 100.0, 0
    n = len(train_data)
    for epoch in range(args.num_epochs):
        perm = rng.permutation(n)
        for i in range(0, n - bs + 1, bs):
            rng_key, sub = jax.random.split(rng_key)
            batch = jnp.asarray(train_data[perm[i:i + bs]])
            params, opt, loss, l2, cos = train_batch(params, opt, batch, sub)
        tail = n % bs
        if tail:
            rng_key, sub = jax.random.split(rng_key)
            batch = jnp.asarray(train_data[perm[n - tail:]])
            params, opt, loss, l2, cos = train_batch(params, opt, batch, sub)

        if epoch > args.eval_from_epoch:
            tot = 0.0
            m = len(test_data)
            for i in range(0, m, 256):
                batch = jnp.asarray(test_data[i:i + 256])
                l, _, _ = eval_batch(params, batch)
                tot += float(l) * len(batch)
            eval_loss = tot / m
            logger.info(f"epoch {epoch} eval_loss:{eval_loss:.8f}")
            if eval_loss < best_eval:
                best_eval, best_epoch = eval_loss, epoch
                M.save_ckpt(os.path.join(out_dir, "best_ckpt.pth"), params)
            if epoch % 10 == 0:
                M.save_ckpt(os.path.join(out_dir, f"{epoch}_ckpt.pth"),
                            params)
    if not os.path.exists(os.path.join(out_dir, "best_ckpt.pth")):
        M.save_ckpt(os.path.join(out_dir, "best_ckpt.pth"), params)
    logger.info(f"best_epoch: {best_epoch} best_loss: {best_eval:.8f}")


if __name__ == "__main__":
    main(sys.argv[1:])
