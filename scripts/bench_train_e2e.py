#!/usr/bin/env python
"""End-to-end training throughput WITH host IO at HyperNeRF scale.

Round 2's 23.1 it/s was the jitted train step alone on a cached device batch
(bench.py --train-only). This benchmark runs the REAL `scene_reconstruction`
loop (train/loop.py) — PNG decode from disk, GT language-feature `.npy` load
+ per-pixel gather, H2D transfer, loss watchdog, telemetry — on a
trained-checkpoint-realistic 100k-Gaussian scene at 536x960 (the reference
HyperNeRF workload at 0.5 ratio, scene/dataset_readers.py:375-376), and
reports full-loop it/s for prefetch_depth=2 (pipelined host path) vs
prefetch_depth=0 (the reference's synchronous behavior, train.py:146-151).

Target (VERDICT r2 #3): end-to-end it/s >= 0.9x the step-only figure.

Usage: python scripts/bench_train_e2e.py [--iters 240]
"""
import argparse
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

H, W = 536, 960
N_IMGS = 24
N_SEGS = 64
LANG_DIM = 3


def make_dataset(root: str) -> None:
    """Random-textured PNGs + nerfies-convention language features on disk
    (decode/load cost is what we are measuring; content is irrelevant)."""
    from PIL import Image
    rng = np.random.default_rng(0)
    img_dir = os.path.join(root, "images")
    lf_dir = os.path.join(root, "language_features_dim3")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(lf_dir, exist_ok=True)
    for i in range(N_IMGS):
        # realistic PNG entropy: smooth gradients + noise (all-noise PNGs
        # decode unrealistically slowly, flat ones unrealistically fast)
        yy, xx = np.mgrid[0:H, 0:W]
        base = (np.sin(xx / 37.0 + i) + np.cos(yy / 53.0)) * 0.25 + 0.5
        img = np.stack([base] * 3, -1) + rng.normal(0, 0.08, (H, W, 3))
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(img_dir, f"{i:06d}.png"))
        # nerfies train-split mapping: colmap_id*4+1 (data/cameras.py:88-95)
        seg = rng.integers(-1, N_SEGS, size=(4, H, W)).astype(np.int16)
        feats = rng.normal(size=(N_SEGS, LANG_DIM)).astype(np.float32)
        feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
        np.save(os.path.join(lf_dir, f"{i * 4 + 1:06d}_s.npy"), seg)
        np.save(os.path.join(lf_dir, f"{i * 4 + 1:06d}_f.npy"), feats)


def make_scene_shim(root: str):
    """CameraDataset over lazy CameraInfo records: every access decodes its
    PNG from disk, exactly like the real readers' lazy path."""
    from langsplat4d.data.readers import CameraInfo
    from langsplat4d.data.scene import CameraDataset

    infos = []
    for i in range(N_IMGS):
        ang = 2.0 * np.pi * i / N_IMGS * 0.2
        R = np.array([[np.cos(ang), 0, np.sin(ang)],
                      [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        infos.append(CameraInfo(
            uid=i, R=R, T=np.array([0.0, 0.0, 4.5]), FovY=0.8, FovX=1.0,
            image=None, image_path=os.path.join(root, "images",
                                                f"{i:06d}.png"),
            image_name=f"{i:06d}", width=W, height=H,
            time=i / max(N_IMGS - 1, 1)))

    class SceneShim:
        dataset_type = "nerfies"
        cameras_extent = 3.0
        train_camera = CameraDataset(infos, "nerfies")
        test_camera = CameraDataset([], "nerfies")
        video_camera = CameraDataset([], "nerfies")

        def getTrainCameras(self):
            return self.train_camera

        def getTestCameras(self):
            return self.test_camera

        def getVideoCameras(self):
            return self.video_camera

    return SceneShim()


def run(iters: int, prefetch_depth: int, scene, state, dcfg, cfg) -> float:
    from langsplat4d.train.loop import scene_reconstruction
    from langsplat4d.utils.timer import Timer
    cfg.runtime.prefetch_depth = prefetch_depth
    t0 = time.time()
    scene_reconstruction(cfg, scene, state, dcfg, "fine-lang", False, iters,
                         Timer())
    return iters / (time.time() - t0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=240)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--workdir", default="/tmp/bench_train_e2e")
    args = ap.parse_args()

    root = args.workdir
    if not os.path.exists(os.path.join(root, "images",
                                       f"{N_IMGS - 1:06d}.png")):
        make_dataset(root)

    from langsplat4d.utils.platform import apply_platform_env
    apply_platform_env()
    import jax
    from langsplat4d.config import Config
    from langsplat4d.field.deformation import DeformConfig, init_deform_params
    from langsplat4d.train.trainstate import make_train_state
    from langsplat4d.utils.synth import realistic_gaussians

    gs = realistic_gaussians(args.n, lang_dim=LANG_DIM, seed=1)
    dcfg = DeformConfig(
        lang_dim=LANG_DIM, no_dlang=False, kplanes_out_dim=16,
        kplanes_resolution=(64, 64, 64, 150), multires=(1, 2), net_width=128,
        defor_depth=0, no_do=False, no_dshs=False, no_ds=False)
    dparams = init_deform_params(jax.random.PRNGKey(0), dcfg)
    aabb = np.asarray([[2.6] * 3, [-2.6] * 3], np.float32)

    scene = make_scene_shim(root)
    cfg = Config()
    cfg.model.source_path = root
    cfg.model.model_path = ""          # disables debug dumps / saving
    cfg.model.language_features_name = "language_features_dim3"
    cfg.model.feature_level = 1
    cfg.extras.test_iterations = []
    cfg.extras.save_iterations = []
    cfg.extras.checkpoint_iterations = []
    cfg.runtime.language_feature_hiddendim = LANG_DIM
    cfg.runtime.watchdog_execv = False  # synthetic GT; a restart loop here
                                        # would re-exec the benchmark forever

    state0 = make_train_state(gs, dparams, aabb, active_sh_degree=3)

    # warm-up: pays the train_step compile (jit cache persists in-process)
    run(20, 2, scene, state0, dcfg, cfg)

    its_pipelined = run(args.iters, 2, scene, state0, dcfg, cfg)
    its_sync = run(args.iters, 0, scene, state0, dcfg, cfg)
    print(f"E2E_IT_PER_S pipelined {its_pipelined:.2f}")
    print(f"E2E_IT_PER_S synchronous {its_sync:.2f}")


if __name__ == "__main__":
    main()
