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


class TestMajoritySmooth:
    def test_matches_reference_loop(self, rng):
        """Integral-image majority filter == the reference's python loop
        (eval/eval_utils.py:46-55), including its h-1/w-1 boundary clamp."""
        m = (rng.uniform(size=(17, 13)) > 0.4).astype(np.uint8)

        def ref_smooth(mask):
            h, w = mask.shape[:2]
            out = mask.copy()
            scale = 3
            for i in range(h):
                for j in range(w):
                    sq = mask[max(0, i - scale): min(i + scale + 1, h - 1),
                              max(0, j - scale): min(j + scale + 1, w - 1)]
                    out[i, j] = np.argmax(np.bincount(sq.reshape(-1)))
            return out

        np.testing.assert_array_equal(E.majority_smooth(m), ref_smooth(m))


class TestAdaptiveThresh:
    def test_adaptive_moves_threshold(self, rng):
        """adaptive_thresh=(mean-1)*alpha+1 (eval/eval.py:226-239): with a
        high-relevancy map the adaptive cut rises above the fixed 0.4 and
        shrinks the predicted mask."""
        d = 8
        pos = rng.normal(size=(1, d)).astype(np.float32)
        neg = rng.normal(size=(4, d)).astype(np.float32)
        h = w = 32
        sem = np.tile(pos[0] / np.linalg.norm(pos[0]), (1, h, w, 1)).astype(
            np.float32)
        gt = {"p": np.ones((h, w), np.uint8)}
        _, _, per_fixed, mask_fixed, _ = E.activate_stream(
            sem, ["p"], pos, neg, gt, thresh=0.4, scale=29)
        _, _, per_adap, mask_adap, _ = E.activate_stream(
            sem, ["p"], pos, neg, gt, thresh=0.4, scale=29,
            adaptive_thresh=True, adaptive_alpha=0.9)
        # recorded thresholds: fixed run keeps 0.4 everywhere; adaptive run
        # records 0.4 for level 0 then the updated value for later levels
        assert per_fixed["p"][3] == [0.4]
        thr_adap = per_adap["p"][3]
        assert thr_adap[0] == 0.4
        assert mask_adap["p"].sum() <= mask_fixed["p"].sum()

    def test_visualization_outputs(self, tmp_path, rng):
        d = 8
        pos = rng.normal(size=(2, d)).astype(np.float32)
        neg = rng.normal(size=(4, d)).astype(np.float32)
        h = w = 24
        sem = rng.normal(size=(2, h, w, d)).astype(np.float32)
        gt = {"a": np.ones((h, w), np.uint8),
              "b": np.zeros((h, w), np.uint8)}
        img = rng.uniform(size=(h, w, 3)).astype(np.float32)
        E.activate_stream(sem, ["a", "b"], pos, neg, gt, thresh=0.4, scale=29,
                          image=img, image_name=tmp_path / "00001",
                          visualize_results=True)
        base = tmp_path / "00001"
        for sub in ("heatmap/a_0", "heatmap/b_1", "composited/a_0",
                    "background/a_0", "annotation/b_0"):
            assert (base / f"{sub}.png").exists(), sub
        assert (base / "chosen_a.png").exists()
        assert (base / "chosen_for_video_b.png").exists()

    def test_plot_helpers(self, tmp_path):
        E.save_similarity_plot([(0, 0.5, 0.1), (1, 0.7, 0.2)],
                               str(tmp_path / "sim.png"), 0.6)
        E.plot_confusion_matrix([True, False, True], [True, True, False],
                                [False, True], "t", str(tmp_path))
        assert (tmp_path / "sim.png").exists()
        assert (tmp_path / "t_Confusion_matrix.png").exists()


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
