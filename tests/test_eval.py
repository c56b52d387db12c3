"""Eval-layer tests: relevancy math parity vs the torch reference, mask
helpers, video metrics, and an end-to-end eval CLI run on synthetic data."""
import json
import os

import numpy as np
import jax.numpy as jnp
import pytest

from langsplat4d.eval import evaluate as E
from langsplat4d.eval import relevancy as R


class TestRelevancy:
    def test_matches_torch_reference_math(self, rng):
        """Replicates OpenCLIPNetwork.get_relevancy (softmax pairs, min over
        negatives) in torch and compares."""
        import torch
        n, d, p, g = 50, 16, 3, 4
        emb = rng.normal(size=(n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=-1, keepdims=True)
        pos = rng.normal(size=(p, d)).astype(np.float32)
        pos /= np.linalg.norm(pos, axis=-1, keepdims=True)
        neg = rng.normal(size=(g, d)).astype(np.float32)
        neg /= np.linalg.norm(neg, axis=-1, keepdims=True)

        ours = np.asarray(R.relevancy(jnp.asarray(emb), jnp.asarray(pos),
                                      jnp.asarray(neg)))

        te, tp_, tn = map(torch.from_numpy, (emb, pos, neg))
        phrases = torch.cat([tp_, tn], dim=0)
        out = te @ phrases.T
        for pid in range(p):
            positive_vals = out[..., pid:pid + 1]
            negative_vals = out[..., p:]
            repeated_pos = positive_vals.repeat(1, g)
            sims = torch.stack((repeated_pos, negative_vals), dim=-1)
            softmax = torch.softmax(10 * sims, dim=-1)
            best_id = softmax[..., 0].argmin(dim=1)
            ref = torch.gather(
                softmax, 1,
                best_id[..., None, None].expand(n, g, 2))[:, 0, 0]
            np.testing.assert_allclose(ours[:, pid], ref.numpy(), atol=1e-5)

    def test_relevancy_maps_shape(self, rng):
        sem = jnp.asarray(rng.normal(size=(3, 8, 8, 16)).astype(np.float32))
        pos = jnp.asarray(rng.normal(size=(2, 16)).astype(np.float32))
        neg = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
        maps = R.relevancy_maps(sem, pos, neg)
        assert maps.shape == (3, 2, 8, 8)


class TestMaskHelpers:
    def test_polygon_to_mask(self):
        mask = E.polygon_to_mask((10, 10), [[1, 1], [8, 1], [8, 8], [1, 8]])
        assert mask[5, 5] == 1
        assert mask[0, 0] == 0

    def test_smooth_mask_matches_torch(self, rng):
        import torch
        m = (rng.uniform(size=(16, 16)) > 0.5).astype(np.uint8)
        ours = np.asarray(E.smooth_mask(jnp.asarray(m))).astype(np.uint8)
        avg = torch.nn.AvgPool2d(kernel_size=7, stride=1, padding=3,
                                 count_include_pad=False)
        ref = (avg(torch.from_numpy(m).float()[None, None]) > 0.5
               ).to(torch.uint8)[0, 0].numpy()
        np.testing.assert_array_equal(ours, ref)

    def test_avg_pool_matches_torch(self, rng):
        import torch
        x = rng.normal(size=(20, 24)).astype(np.float32)
        ours = np.asarray(E._avg_pool_same(jnp.asarray(x), 29, 14))
        avg = torch.nn.AvgPool2d(kernel_size=29, stride=1, padding=14,
                                 count_include_pad=False)
        ref = avg(torch.from_numpy(x)[None, None])[0, 0].numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestVideoMetrics:
    def test_evaluate_video_feature(self):
        sims = [(0, 0.9, 0.8), (1, 0.2, 0.5), (2, 0.8, 0.6), (3, 0.1, 0.4)]
        gt = [(0, 0), (2, 2)]  # frames 0 and 2 are positive
        res = E.evaluate_video_feature(sims, gt, threshold=0.5)
        assert res["accuracy"] == 1.0
        assert res["precision"] == 1.0
        assert res["recall"] == 1.0
        # vIoU = mean over union frames {0,2}: (0.8+0.6)/2
        np.testing.assert_allclose(res["average_iou"], 0.7)

    def test_smooth_similarity(self):
        sims = [(0, 1.0, 0.0), (1, 0.0, 0.0), (2, 1.0, 0.0)]
        out = E.smooth_similarity(sims, 1, [0.25, 0.5, 0.25])
        assert out[0][1] == 1.0  # boundary keeps raw value
        np.testing.assert_allclose(out[1][1], 0.5)


@pytest.mark.slow
def test_eval_cli_end_to_end(tmp_path, rng):
    """Synthetic rendered maps + COCO annotations + cached text embeddings ->
    Mean IoU close to 1 for a perfectly-aligned feature field."""
    from eval import main as eval_main
    from langsplat4d.ae import model as AE
    import jax

    h = w = 64
    d_clip = 16
    feat_dim = 3
    # AE whose decoder we control: identity-ish random; we just need
    # consistency between rendered maps (encoded) and prompt embeddings.
    enc_dims, dec_dims = [8, feat_dim], [8, d_clip]
    ae_params = AE.init_ae(jax.random.PRNGKey(0), enc_dims, dec_dims, d_clip)
    ae_path = str(tmp_path / "best_ckpt.pth")
    AE.save_ckpt(ae_path, ae_params)

    # prompt embedding = decoded feature of a chosen latent => relevancy ~1
    latent_obj = np.array([2.0, 0.1, 0.3], np.float32)
    latent_bg = np.array([-1.0, 1.0, -0.5], np.float32)
    dec_obj = np.asarray(AE.decode(ae_params, jnp.asarray(latent_obj[None])))[0]
    neg = rng.normal(size=(4, d_clip)).astype(np.float32)
    cache = {"target": dec_obj, "object": neg[0], "things": neg[1],
             "stuff": neg[2], "texture": neg[3]}
    cache_path = str(tmp_path / "text_cache.npz")
    np.savez(cache_path, **cache)

    # synthetic rendered feature maps: object square in the center
    lat_obj_n = latent_obj / np.linalg.norm(latent_obj)
    lat_bg_n = latent_bg / np.linalg.norm(latent_bg)
    base = np.tile(lat_bg_n, (h, w, 1)).astype(np.float32)
    base[20:44, 20:44] = lat_obj_n
    exp_root = tmp_path / "exps"
    for level in (1, 2, 3):
        d = exp_root / f"myexp_{level}" / "video_lang" / "ours_100" / \
            "renders_npy"
        d.mkdir(parents=True)
        np.save(d / "00000.npy", base)

    # COCO annotations: one image, one 'target' polygon matching the square
    ann_dir = tmp_path / "annot" / "train"
    ann_dir.mkdir(parents=True)
    from PIL import Image
    Image.fromarray(np.zeros((h, w, 3), np.uint8)).save(
        ann_dir / "00001_png.rf.x.jpg")
    coco = {
        "categories": [{"id": 1, "name": "target"}],
        "images": [{"id": 0, "file_name": "00001_png.rf.x.jpg",
                    "height": h, "width": w}],
        "annotations": [{
            "id": 0, "image_id": 0, "category_id": 1,
            "bbox": [20, 20, 24, 24],
            "segmentation": [[20, 20, 43, 20, 43, 43, 20, 43]],
        }],
    }
    with open(ann_dir / "_annotations.coco.json", "w") as f:
        json.dump(coco, f)

    eval_main([
        "--exp_name", "myexp", "--iterations", "100",
        "--annotation_folder", str(tmp_path / "annot"),
        "--ae_ckpt_path", ae_path,
        "--encoder_hidden_dims", "8", "3",
        "--decoder_hidden_dims", "8", "16",
        "--feat_dim", "3",
        "--dataset_type", "hypernerf",
        "--output_path", str(tmp_path / "eval_out"),
        "--text_embedding_cache", cache_path,
        "--feat_root", str(exp_root),
    ])
