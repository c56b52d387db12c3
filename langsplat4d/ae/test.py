"""Autoencoder export CLI (reference autoencoder/test.py:11-107): encodes the
full feature set to `language_features_dim{3,6}` directories and copies the
`_s.npy` seg maps through."""
from __future__ import annotations

import argparse
import os
import shutil
import sys

import numpy as np


def main(argv=None):
    from langsplat4d.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from langsplat4d.ae import model as M
    from langsplat4d.ae.data import load_feature_dataset
    from langsplat4d.utils.logging import get_logger

    logger = get_logger()
    p = argparse.ArgumentParser()
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--encoder_dims", nargs="+", type=int,
                   default=[256, 128, 64, 32, 3])
    p.add_argument("--decoder_dims", nargs="+", type=int,
                   default=[16, 32, 64, 128, 256, 256, 512])
    p.add_argument("--hidden_dims", type=int, default=3)
    p.add_argument("--feature_dims", type=int, default=512)
    p.add_argument("--language_name", type=str, default=None)
    p.add_argument("--output_name", type=str, default=None)
    p.add_argument("--ckpt_dir", type=str, default="ckpt")
    p.add_argument("--latent_dim", type=int, default=9,
                   help="VanillaVAE latent width (reference test.py:77)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    use_vae = os.getenv("use_vae", "f") == "t"

    if args.language_name is None:
        data_dir = os.path.join(args.dataset_path, "language_features")
        output_dir = os.path.join(
            args.dataset_path,
            f"language_features_dim{args.encoder_dims[-1]}")
    else:
        data_dir = os.path.join(args.dataset_path, args.language_name)
        suffix = (f"{args.output_name}" if args.output_name
                  else "language_features")
        output_dir = os.path.join(
            args.dataset_path,
            f"{args.language_name}-{suffix}_dim{args.encoder_dims[-1]}")
    os.makedirs(output_dir, exist_ok=True)

    for filename in os.listdir(data_dir):
        if filename.endswith("_s.npy"):
            shutil.copy(os.path.join(data_dir, filename),
                        os.path.join(output_dir, filename))

    ckpt_path = os.path.join(args.ckpt_dir, args.model_name, "best_ckpt.pth")
    params = M.load_ckpt(ckpt_path, args.encoder_dims, args.decoder_dims,
                         args.feature_dims)
    data, data_dic = load_feature_dataset(data_dir)

    if use_vae:
        # VanillaVAE export path (reference test.py:77-90): the compressed
        # feature is the L2-normalized reparameterized sample
        key = jax.random.PRNGKey(args.seed)

        def encode_batch(k, x):
            mu, log_var, _ = M.vae_encode(params, x, train=False)
            return M.vae_reparameterize(k, mu, log_var)

        encode_jit = jax.jit(encode_batch)
        outs = []
        for i in range(0, len(data), 256):
            key, sub = jax.random.split(key)
            outs.append(np.asarray(encode_jit(sub,
                                              jnp.asarray(data[i:i + 256]))))
    else:
        encode = jax.jit(lambda x: M.encode(params, x, train=False)[0])
        outs = []
        for i in range(0, len(data), 256):
            outs.append(np.asarray(encode(jnp.asarray(data[i:i + 256]))))
    features = np.concatenate(outs, axis=0)

    start = 0
    for k, v in data_dic.items():
        np.save(os.path.join(output_dir, k), features[start:start + v])
        start += v
    logger.info(f"exported {len(features)} encoded features to {output_dir}")


if __name__ == "__main__":
    main(sys.argv[1:])
