"""AE tests: torch-model parity, state_dict round-trip, end-to-end train/test
CLIs on a tiny synthetic feature set (BASELINE graded config 1)."""
import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from langsplat4d.ae import model as M


class TestAEModelParity:
    def _torch_model(self, enc_dims, dec_dims, feat):
        import torch
        import torch.nn as nn

        class TorchAE(nn.Module):
            def __init__(self):
                super().__init__()
                layers = []
                for i in range(len(enc_dims)):
                    if i == 0:
                        layers.append(nn.Linear(feat, enc_dims[i]))
                    else:
                        layers.append(nn.BatchNorm1d(enc_dims[i - 1]))
                        layers.append(nn.ReLU())
                        layers.append(nn.Linear(enc_dims[i - 1], enc_dims[i]))
                self.encoder = nn.ModuleList(layers)
                layers = []
                for i in range(len(dec_dims)):
                    if i == 0:
                        layers.append(nn.Linear(enc_dims[-1], dec_dims[i]))
                    else:
                        layers.append(nn.ReLU())
                        layers.append(nn.Linear(dec_dims[i - 1], dec_dims[i]))
                self.decoder = nn.ModuleList(layers)

            def forward(self, x):
                for m in self.encoder:
                    x = m(x)
                x = x / x.norm(dim=-1, keepdim=True)
                for m in self.decoder:
                    x = m(x)
                return x / x.norm(dim=-1, keepdim=True)

        return TorchAE()

    def test_forward_matches_torch(self, rng):
        import torch
        enc, dec, feat = [16, 8, 3], [8, 16, 32], 32
        params = M.init_ae(jax.random.PRNGKey(0), enc, dec, feat)
        tm = self._torch_model(enc, dec, feat)
        tm.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            if np.ndim(v) else torch.tensor(v)
                            for k, v in M.to_torch_state_dict(params).items()})
        tm.eval()
        x = rng.normal(size=(10, feat)).astype(np.float32)
        ours, _ = M.forward(params, jnp.asarray(x), train=False)
        theirs = tm(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_state_dict_roundtrip(self, tmp_path):
        enc, dec, feat = [16, 8, 3], [8, 16, 32], 32
        params = M.init_ae(jax.random.PRNGKey(1), enc, dec, feat)
        path = str(tmp_path / "ckpt.pth")
        M.save_ckpt(path, params)
        back = M.load_ckpt(path, enc, dec, feat)
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(4, feat)).astype(np.float32))
        a, _ = M.forward(params, x)
        b, _ = M.forward(back, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


class TestVanillaVAE:
    """VanillaVAE (`use_vae`) parity: autoencoder/model.py:80-246."""

    def _torch_vae(self, enc_dims, dec_dims, latent, feat):
        import torch
        import torch.nn as nn

        class TorchVAE(nn.Module):
            def __init__(self):
                super().__init__()
                layers = []
                for i in range(len(enc_dims)):
                    if i == 0:
                        layers.append(nn.Linear(feat, enc_dims[i]))
                    else:
                        layers.append(nn.BatchNorm1d(enc_dims[i - 1]))
                        layers.append(nn.LeakyReLU())
                        layers.append(nn.Linear(enc_dims[i - 1], enc_dims[i]))
                self.encoder = nn.Sequential(*layers)
                self.fc_mu = nn.Linear(enc_dims[-1], latent)
                self.fc_var = nn.Linear(enc_dims[-1], latent)
                layers = []
                for i in range(len(dec_dims)):
                    if i == 0:
                        layers.append(nn.Linear(latent, dec_dims[i]))
                    else:
                        layers.append(nn.LeakyReLU())
                        layers.append(nn.Linear(dec_dims[i - 1], dec_dims[i]))
                self.decoder = nn.Sequential(*layers)

            def encode(self, x):
                r = self.encoder(x)
                return self.fc_mu(r), self.fc_var(r)

            def decode(self, z):
                r = self.decoder(z)
                return r / r.norm(dim=-1, keepdim=True)

        return TorchVAE()

    def test_encode_decode_match_torch(self, rng):
        import torch
        enc, dec, latent, feat = [16, 8], [8, 16, 32], 5, 32
        params = M.init_vae(jax.random.PRNGKey(0), enc, dec, latent, feat)
        tm = self._torch_vae(enc, dec, latent, feat)
        tm.load_state_dict(
            {k: torch.from_numpy(np.ascontiguousarray(v)) if np.ndim(v)
             else torch.tensor(v)
             for k, v in M.vae_to_torch_state_dict(params).items()})
        tm.eval()
        x = rng.normal(size=(10, feat)).astype(np.float32)
        mu, log_var, _ = M.vae_encode(params, jnp.asarray(x), train=False)
        tmu, tvar = tm.encode(torch.from_numpy(x))
        np.testing.assert_allclose(np.asarray(mu), tmu.detach().numpy(),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(log_var), tvar.detach().numpy(),
                                   atol=1e-5)
        z = rng.normal(size=(10, latent)).astype(np.float32)
        ours = M.vae_decode(params, jnp.asarray(z))
        theirs = tm.decode(torch.from_numpy(z)).detach().numpy()
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)

    def test_state_dict_roundtrip_and_sniff(self, tmp_path):
        enc, dec, latent, feat = [16, 8], [8, 16, 32], 5, 32
        params = M.init_vae(jax.random.PRNGKey(1), enc, dec, latent, feat)
        path = str(tmp_path / "vae_ckpt.pth")
        M.save_ckpt(path, params)          # routes via vae_to_torch (fc_mu)
        back = M.load_ckpt(path, enc, dec, feat)   # sniffs fc_mu keys
        assert "fc_mu" in back
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(4, feat)).astype(np.float32))
        a = M.vae_encode(params, x)[0]
        b = M.vae_encode(back, x)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_loss_and_reparameterize(self):
        mu = jnp.zeros((6, 5))
        log_var = jnp.zeros((6, 5))
        z = M.vae_reparameterize(jax.random.PRNGKey(0), mu, log_var)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1),
                                   1.0, atol=1e-5)
        # KLD of N(0,1) vs N(0,1) is 0; loss reduces to the MSE
        recon = jnp.ones((6, 32)) * 0.5
        x = jnp.zeros((6, 32))
        loss, recons, kld = M.vae_loss(recon, x, mu, log_var, 0.1)
        np.testing.assert_allclose(float(kld), 0.0, atol=1e-6)
        np.testing.assert_allclose(float(loss), 0.25, atol=1e-6)


@pytest.mark.slow
def test_vae_train_test_cli_end_to_end(tmp_path, rng, monkeypatch):
    """use_vae=t trains, exports latent-dim features, and the eval decode
    path accepts the checkpoint (reference test.py:77-90, eval.py:613)."""
    monkeypatch.setenv("use_vae", "t")
    from langsplat4d.ae.train import main as train_main
    from langsplat4d.ae.test import main as test_main

    feat_dim, latent = 32, 3
    data_dir = tmp_path / "scene" / "language_features"
    data_dir.mkdir(parents=True)
    for i in range(2):
        feats = rng.normal(size=(30, feat_dim)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        np.save(data_dir / f"{i:06d}_f.npy", feats)
        np.save(data_dir / f"{i:06d}_s.npy",
                rng.integers(-1, 5, size=(4, 8, 8)).astype(np.int32))

    ckpt_dir = str(tmp_path / "ckpt")
    common = ["--dataset_path", str(tmp_path / "scene"),
              "--model_name", "tinyvae",
              "--encoder_dims", "16", "8", "3",
              "--decoder_dims", "8", "16", "32",
              "--feature_dims", "32", "--latent_dim", str(latent),
              "--ckpt_dir", ckpt_dir]
    train_main([*common, "--num_epochs", "8", "--eval_from_epoch", "3",
                "--batch_size", "16", "--hidden_dims", "3"])
    ckpt = os.path.join(ckpt_dir, "tinyvae", "best_ckpt.pth")
    assert os.path.exists(ckpt)

    test_main([*common, "--hidden_dims", "3"])
    out_dir = tmp_path / "scene" / "language_features_dim3"
    fs = sorted(glob.glob(str(out_dir / "*_f.npy")))
    assert len(fs) == 2
    enc = np.load(fs[0])
    assert enc.shape == (30, latent)
    np.testing.assert_allclose(np.linalg.norm(enc, axis=-1), 1.0, atol=1e-5)

    # eval-side decode accepts the sniffed VAE checkpoint
    params = M.load_ckpt(ckpt, [16, 8, 3], [8, 16, 32], feat_dim)
    out = M.vae_decode(params, jnp.asarray(enc))
    assert out.shape == (30, feat_dim)


@pytest.mark.slow
def test_ae_train_test_cli_end_to_end(tmp_path, rng):
    """BASELINE graded config 1: AE train + export on tiny *_f.npy files."""
    from langsplat4d.ae.train import main as train_main
    from langsplat4d.ae.test import main as test_main

    feat_dim = 32
    data_dir = tmp_path / "scene" / "language_features"
    data_dir.mkdir(parents=True)
    for i in range(3):
        feats = rng.normal(size=(40, feat_dim)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        np.save(data_dir / f"{i:06d}_f.npy", feats)
        np.save(data_dir / f"{i:06d}_s.npy",
                rng.integers(-1, 5, size=(4, 8, 8)).astype(np.int32))

    ckpt_dir = str(tmp_path / "ckpt")
    args = ["--dataset_path", str(tmp_path / "scene"),
            "--model_name", "tiny",
            "--encoder_dims", "16", "8", "3",
            "--decoder_dims", "8", "16", "32",
            "--feature_dims", "32", "--hidden_dims", "3",
            "--num_epochs", "12", "--eval_from_epoch", "5",
            "--batch_size", "16", "--ckpt_dir", ckpt_dir]
    train_main(args)
    assert os.path.exists(os.path.join(ckpt_dir, "tiny", "best_ckpt.pth"))

    test_main(["--dataset_path", str(tmp_path / "scene"),
               "--model_name", "tiny",
               "--encoder_dims", "16", "8", "3",
               "--decoder_dims", "8", "16", "32",
               "--feature_dims", "32", "--hidden_dims", "3",
               "--ckpt_dir", ckpt_dir])
    out_dir = tmp_path / "scene" / "language_features_dim3"
    fs = sorted(glob.glob(str(out_dir / "*_f.npy")))
    assert len(fs) == 3
    enc = np.load(fs[0])
    assert enc.shape == (40, 3)
    np.testing.assert_allclose(np.linalg.norm(enc, axis=-1), 1.0, atol=1e-5)
    assert len(glob.glob(str(out_dir / "*_s.npy"))) == 3
