#!/usr/bin/env python
"""End-to-end quality measurement on a recorded-fixture scene.

Runs the full reference acceptance path (SURVEY §4: train -> render -> eval)
on the structured moving-ball scene (tests/scene_fixture.make_structured_scene)
and reports PSNR (test split) + localization mIoU (eval.py), writing
quality_metrics.json + QUALITY.md at the repo root.

The pipeline mirrors the reference end-to-end:
  raw "CLIP"-space features -> AE train + export (language_features_dim3)
  -> 4-stage curriculum training -> render rgb + lang -> AE decode +
  relevancy -> mIoU vs the analytically-known ball masks.

Usage: [JAX_PLATFORMS=cpu] python scripts/quality_e2e.py [workdir]
"""
import glob
import json
import os
import subprocess
import sys
import time

import numpy as np

# The axon TPU plugin ignores JAX_PLATFORMS from the environment alone; the
# CLIs call jax.config.update when the env var is set, and the in-process
# margin/export epilogue here must do the same or a cpu-pinned run still
# initializes (and can hang on) the remote TPU backend.
if os.environ.get("JAX_PLATFORMS"):
    import jax
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def sh(args, **kw):
    print("+", " ".join(args), flush=True)
    t0 = time.time()
    r = subprocess.run(args, cwd=REPO, capture_output=True, text=True, **kw)
    dt = time.time() - t0
    if r.returncode != 0:
        print(r.stdout[-4000:])
        print(r.stderr[-4000:])
        raise SystemExit(f"step failed ({args[0]} {args[1] if len(args)>1 else ''})")
    print(f"  ok ({dt:.0f}s)", flush=True)
    return r.stdout


def main():
    work = os.path.abspath(sys.argv[1] if len(sys.argv) > 1
                           else "/tmp/quality_e2e")
    os.makedirs(work, exist_ok=True)
    scene = os.path.join(work, "scene")
    model = os.path.join(work, "model")
    env = dict(os.environ)

    from scene_fixture import make_structured_scene
    n_imgs, hw, clip_dim = 16, 64, 16
    if not os.path.exists(os.path.join(scene, "dataset.json")):
        _, info = make_structured_scene(scene, n_imgs=n_imgs, hw=hw,
                                        clip_dim=clip_dim)
        np.savez(os.path.join(work, "scene_info.npz"),
                 f_obj=info["f_obj"], f_bg=info["f_bg"],
                 **{f"mask_{i}": m for i, m in info["masks"].items()})
    info = np.load(os.path.join(work, "scene_info.npz"))

    # ---- 1. AE: train on raw clip-space features, export dim3 ----
    # (no --language_name: the default triggers the reference's clean
    # language_features_dim{d} output naming, autoencoder/test.py:36-44)
    ae_args = ["--dataset_path", scene, "--model_name", "quality",
               "--encoder_dims", "8", "3", "--decoder_dims", "8",
               str(clip_dim), "--feature_dims", str(clip_dim),
               "--ckpt_dir", os.path.join(work, "ae")]
    if not os.path.exists(os.path.join(work, "ae", "quality",
                                       "best_ckpt.pth")):
        sh([sys.executable, "-m", "langsplat4d.ae.train", *ae_args,
            "--num_epochs", "300", "--lr", "1e-2"], env=env)
    if not os.path.exists(os.path.join(scene, "language_features_dim3")):
        sh([sys.executable, "-m", "langsplat4d.ae.test", *ae_args], env=env)

    # ---- 2. train the 4-stage curriculum ----
    # QUALITY_SCALE < 1 shrinks every stage budget proportionally (the test
    # suite's reduced gate; floors must be loosened to match)
    scale = float(os.getenv("QUALITY_SCALE", "1.0"))
    its = {k: max(int(v * scale), 20) for k, v in
           dict(cb=1200, cl=300, fb=1500, fl=1200).items()}
    cfgp = os.path.join(work, "quality_cfg.py")
    with open(cfgp, "w") as f:
        f.write(f"""
capacity_granule = 4096
tile_capacity = 256
# plane_reg: the time-axis regularizers every reference preset configures
# (dead upstream behind the `stage == "fine"` guard, train.py:331). With 4
# train frames over 8 time cells, an unregularized time axis lets the
# optimizer collapse the moving object inside a sparsely-supervised cell
# (observed: one train view at 21.6 dB vs 38 dB siblings, flat across the
# whole cell). Smoothing ties neighboring cells together.
plane_reg = True
ModelHiddenParams = dict(
    kplanes_out_dim=8, kplanes_resolution=[32, 32, 32, 8], multires=[1, 2],
    net_width=64, defor_depth=1, no_do=False, no_ds=False,
    time_smoothness_weight=0.01, l1_time_planes=0.0001,
    plane_tv_weight=0.0001,
)
OptimizationParams = dict(
    coarse_base_iterations={its['cb']}, coarse_lang_iterations={its['cl']},
    fine_base_iterations={its['fb']}, fine_lang_iterations={its['fl']},
    densify_from_iter={max(int(300 * scale), 5)},
    densify_until_iter={max(int(2000 * scale), 10)},
    densification_interval={max(int(200 * scale), 5)},
    pruning_from_iter=99999,
    opacity_reset_interval=99999, max_points=20000, batch_size=1,
)
{os.getenv("QUALITY_EXTRA_CFG", "")}
""")
    trained_marker = os.path.join(model, "point_cloud",
                                  f"fine-lang_iteration_{its['fl']}")
    if not os.path.exists(trained_marker):
        sh([sys.executable, "train.py", "--source_path", scene,
            "--model_path", model, "--language_features_name",
            "language_features_dim3", "--feature_level", "1", "--expname",
            "quality", "--configs", cfgp, "--port", "-1",
            "--save_iterations", str(its['fl']),
            "--checkpoint_iterations", str(its['fl']),
            "--test_iterations", str(its['fl'])], env=env)

    # ---- 3. render rgb (PSNR) + lang (eval input) ----
    common = ["--model_path", model, "--source_path", scene,
              "--language_features_name", "language_features_dim3",
              "--feature_level", "1", "--configs", cfgp,
              "--load_stage", "fine-lang", "--novideo", "1"]
    sh([sys.executable, "render.py", *common, "--mode", "rgb",
        "--skip_video"], env=env)
    sh([sys.executable, "render.py", *common, "--mode", "lang",
        "--skip_train"], env=env)

    from PIL import Image
    # PSNR: driver-saved renders vs gt on the held-out test split
    it_dirs = glob.glob(os.path.join(model, "test_rgb", "ours_*"))
    base = sorted(it_dirs)[-1]
    iters = int(base.split("_")[-1])
    renders = sorted(glob.glob(os.path.join(base, "renders_npy", "*.npy")))
    gts = sorted(glob.glob(os.path.join(base, "gt_npy", "*.npy")))
    if not gts:
        gts = sorted(glob.glob(os.path.join(base, "gt", "*.png")))
    psnrs = []
    for rp, gp in zip(renders, gts):
        img = np.load(rp)
        if img.ndim == 3 and img.shape[0] in (3, 4):
            img = img.transpose(1, 2, 0)
        if gp.endswith(".npy"):
            gt = np.load(gp)
            if gt.ndim == 3 and gt.shape[0] in (3, 4):
                gt = gt.transpose(1, 2, 0)
        else:
            gt = np.asarray(Image.open(gp)).astype(np.float32) / 255.0
        mse = np.mean((img[..., :3] - gt[..., :3]) ** 2)
        psnrs.append(-10.0 * np.log10(mse + 1e-12))
    psnr = float(np.mean(psnrs))
    print(f"PSNR (test split, {len(psnrs)} views): {psnr:.2f} dB")

    # ---- 4. eval: annotations from known masks + text cache ----
    exps = os.path.join(work, "exps")
    for level in (1, 2, 3):
        d = os.path.join(exps, f"quality_{level}", "video_lang")
        os.makedirs(d, exist_ok=True)
        tgt = os.path.join(d, f"ours_{iters}")
        if not os.path.exists(tgt):
            os.symlink(os.path.join(model, "video_lang", f"ours_{iters}"),
                       tgt)

    ann_dir = os.path.join(work, "annot", "train")
    os.makedirs(ann_dir, exist_ok=True)
    images, annotations = [], []
    eval_frames = [2, 7, 12]
    for k, fi in enumerate(eval_frames):
        mask = info[f"mask_{fi}"]
        name = f"{fi + 1:05d}_png.rf.q{k}.jpg"
        Image.fromarray(np.zeros((hw, hw, 3), np.uint8)).save(
            os.path.join(ann_dir, name))
        images.append({"id": k, "file_name": name, "height": hw, "width": hw})
        import cv2
        cnts, _ = cv2.findContours(mask, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_SIMPLE)
        for c in cnts:
            seg = c.reshape(-1, 2).astype(float).reshape(-1).tolist()
            if len(seg) < 6:
                continue
            x, y, w, h = cv2.boundingRect(c)
            annotations.append({
                "id": len(annotations), "image_id": k, "category_id": 1,
                "bbox": [float(x), float(y), float(w), float(h)],
                "segmentation": [seg]})
    coco = {"categories": [{"id": 1, "name": "ball"}],
            "images": images, "annotations": annotations}
    with open(os.path.join(ann_dir, "_annotations.coco.json"), "w") as f:
        json.dump(coco, f)

    rng = np.random.default_rng(7)
    negs = rng.normal(size=(4, clip_dim)).astype(np.float32)
    negs /= np.linalg.norm(negs, axis=-1, keepdims=True)
    cache = {"ball": info["f_obj"], "object": negs[0], "things": negs[1],
             "stuff": negs[2], "texture": negs[3]}
    cache_path = os.path.join(work, "text_cache.npz")
    np.savez(cache_path, **cache)

    out = sh([sys.executable, "eval.py", "--exp_name", "quality",
              "--iterations", str(iters),
              "--annotation_folder", os.path.join(work, "annot"),
              "--ae_ckpt_path",
              os.path.join(work, "ae", "quality", "best_ckpt.pth"),
              "--encoder_hidden_dims", "8", "3",
              "--decoder_hidden_dims", "8", str(clip_dim),
              "--feat_dim", "3", "--dataset_type", "hypernerf",
              "--feat_root", exps, "--output_path",
              os.path.join(work, "eval_out"),
              "--text_embedding_cache", cache_path], env=env)
    miou = None
    for line in out.splitlines():
        if line.startswith("Mean IoU:"):
            miou = float(line.split(":")[1])
    print(f"mIoU: {miou}")

    # Language discriminability MARGIN: mean relevancy (cosine vs the known
    # object feature, AE-decoded) inside the GT mask minus outside, averaged
    # over the eval frames. Unlike thresholded mIoU — measured to swing
    # 0.08<->0.51 between runs whose renders correlate 0.9999 at reduced
    # scale (the adaptive threshold sits on a knife-edge when the object is
    # a few hundred pixels) — the margin moves smoothly with render quality,
    # so it is the reduced-scale regression gate's primary floor.
    from langsplat4d.ae.model import decode as ae_decode, load_ckpt
    ae_params = load_ckpt(os.path.join(work, "ae", "quality",
                                       "best_ckpt.pth"),
                          [8, 3], [8, clip_dim], feature_dim=clip_dim)
    import jax.numpy as _jnp
    f_obj = info["f_obj"] / (np.linalg.norm(info["f_obj"]) + 1e-9)
    margins = []
    for fi in eval_frames:
        rp = os.path.join(model, "video_lang", f"ours_{iters}",
                          "renders_npy", f"{fi:05d}.npy")
        r = np.load(rp)                                   # [H, W, 3]
        dec = np.asarray(ae_decode(ae_params,
                                   _jnp.asarray(r.reshape(-1, 3))))
        dec = dec.reshape(hw, hw, clip_dim)
        dn = dec / (np.linalg.norm(dec, axis=-1, keepdims=True) + 1e-9)
        sim = dn @ f_obj
        m = info[f"mask_{fi}"] > 0
        margins.append(float(sim[m].mean() - sim[~m].mean()))
    lang_margin = float(np.mean(margins))
    print(f"lang margin (in-mask minus out-of-mask relevancy): "
          f"{lang_margin:.4f}")

    metrics = {
        "scene": "structured moving-ball fixture "
                 f"({n_imgs} views, {hw}x{hw}, clip_dim {clip_dim})",
        "train_iterations": {"coarse_base": its['cb'],
                             "coarse_lang": its['cl'],
                             "fine_base": its['fb'], "fine_lang": its['fl']},
        "quality_scale": scale,
        "psnr_db": round(psnr, 2),
        "miou": round(miou, 4) if miou is not None else None,
        "lang_margin": round(lang_margin, 4),
        "platform": os.environ.get("JAX_PLATFORMS", "tpu(axon)"),
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
    }
    # reduced-scale (gate) runs stay in the work dir; only full-scale runs
    # update the repo-root flagship metrics file
    metrics_dir = REPO if scale >= 1.0 else work
    with open(os.path.join(metrics_dir, "quality_metrics.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))

    # Regression gate (VERDICT r2 #5): a kernel/gradient regression must fail
    # this script, not just lower a number nobody reads. Round-2 hardware
    # reference: PSNR 28.54 dB / mIoU 0.827 (QUALITY.md); floors leave ~1.5
    # dB / ~0.05 of seed noise headroom.
    psnr_floor = float(os.getenv("QUALITY_PSNR_FLOOR", 27.0))
    miou_floor = float(os.getenv("QUALITY_MIOU_FLOOR", 0.78))
    margin_floor = float(os.getenv("QUALITY_MARGIN_FLOOR", 0.1))
    failures = []
    if psnr < psnr_floor:
        failures.append(f"PSNR {psnr:.2f} dB < floor {psnr_floor}")
    if miou is None or miou < miou_floor:
        failures.append(f"mIoU {miou} < floor {miou_floor}")
    if lang_margin < margin_floor:
        failures.append(f"lang margin {lang_margin:.4f} < floor "
                        f"{margin_floor}")
    # GOLDEN_EXPORT=<dir>: snapshot the trained model + AE + metrics as the
    # committed golden fixture consumed by tests/test_golden_quality.py (the
    # default-suite render+eval regression gate — no training required).
    golden = os.getenv("GOLDEN_EXPORT")
    if golden:
        import shutil
        dst = os.path.abspath(golden)
        dst_pc = os.path.join(dst, "point_cloud",
                              os.path.basename(trained_marker))
        if os.path.exists(dst_pc):
            shutil.rmtree(dst_pc)
        os.makedirs(os.path.dirname(dst_pc), exist_ok=True)
        shutil.copytree(trained_marker, dst_pc)
        for fn, src in (("cfg_args", os.path.join(model, "cfg_args")),
                        ("quality_cfg.py", cfgp),
                        ("ae_best_ckpt.pth",
                         os.path.join(work, "ae", "quality",
                                      "best_ckpt.pth"))):
            shutil.copy(src, os.path.join(dst, fn))
        with open(os.path.join(dst, "metrics.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print(f"golden fixture exported to {dst}")

    if failures:
        raise SystemExit("QUALITY GATE FAILED: " + "; ".join(failures))
    print(f"quality gate passed: PSNR {psnr:.2f} >= {psnr_floor}, "
          f"mIoU {miou:.3f} >= {miou_floor}")


if __name__ == "__main__":
    main()
