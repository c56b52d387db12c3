#!/usr/bin/env python
"""Render CLI — parity with reference `python render.py` (render.py:181-210).

Renders train/video/test splits in rgb or lang mode at a chosen
stage/iteration, writes PNG renders + raw .npy feature maps (consumed by
eval) + mp4 videos, and prints the FPS line.
"""
import argparse
import sys


def _apply_platform_env():
    """Honor JAX_PLATFORMS even when a platform plugin (axon TPU) ignores it;
    lets CPU-only users run the CLIs without the TPU tunnel."""
    import os
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax
        jax.config.update("jax_platforms", plats)


def main(argv=None):
    _apply_platform_env()
    from langsplat4d.config import load_cfg_args, parse_cli
    from langsplat4d.utils.logging import get_logger

    parser = argparse.ArgumentParser(add_help=False)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--skip_video", action="store_true")
    parser.add_argument("--mode", choices=["rgb", "lang"], default="rgb")
    parser.add_argument("--novideo", type=int, default=0)
    parser.add_argument("--noimage", type=int, default=0)
    parser.add_argument("--nonpy", type=int, default=0)
    parser.add_argument("--load_stage", type=str, default="fine-lang")
    args, rest = parser.parse_known_args(argv)

    cfg = parse_cli(rest, description="Testing script parameters")
    if cfg.model.model_path:
        cfg = load_cfg_args(cfg.model.model_path, cfg)
        # re-apply CLI overrides on top of persisted cfg_args
        cfg2 = parse_cli(rest)
        if cfg2.model.source_path:
            cfg.model.source_path = cfg2.model.source_path
        cfg.model.model_path = cfg2.model.model_path or cfg.model.model_path
    logger = get_logger()
    logger.info(f"Rendering {cfg.model.model_path}")

    from langsplat4d.checkpoint import load_trained_model
    from langsplat4d.data.scene import Scene
    from langsplat4d.field.deformation import DeformConfig
    from langsplat4d.render.driver import render_set

    scene = Scene(cfg.model.source_path, images=cfg.model.images,
                  eval_split=cfg.model.eval, llffhold=cfg.model.llffhold,
                  white_background=cfg.model.white_background,
                  extension=cfg.model.extension,
                  model_path=cfg.model.model_path)
    dcfg = DeformConfig.from_config(cfg.hidden, cfg.runtime,
                                    max_sh_degree=cfg.model.sh_degree)
    state, loaded_iter = load_trained_model(
        cfg.model.model_path, args.load_stage, args.iteration, dcfg,
        max_sh_degree=cfg.model.sh_degree, aabb=scene.aabb)

    class A:
        pass

    kw = dict(noimage=bool(args.noimage), nonpy=bool(args.nonpy),
              novideo=bool(args.novideo), load_stage=args.load_stage,
              mode=args.mode)
    if not args.skip_train:
        render_set(cfg, state, dcfg, scene, "train", loaded_iter,
                   scene.getTrainCameras(), **kw)
    if not args.skip_video:
        render_set(cfg, state, dcfg, scene, "video", loaded_iter,
                   scene.getVideoCameras(), **kw)
    if not args.skip_test:
        render_set(cfg, state, dcfg, scene, "test", loaded_iter,
                   scene.getTestCameras(), **kw)


if __name__ == "__main__":
    main(sys.argv[1:])
