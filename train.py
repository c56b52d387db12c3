#!/usr/bin/env python
"""Training CLI — parity with reference `python train.py` (train.py:559-622).

Flags mirror the reference argparse groups (--source_path, --model_path,
--expname, --configs, stage iteration counts, --joint_coarse/--joint_fine,
--lam/--beta, --resume_from_final_stage, ...); python config files with
`_base_` inheritance are supported via --configs.
"""
import os
import sys
import time


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
    from langsplat4d.config import parse_cli
    from langsplat4d.utils.logging import add_file_sink, get_logger, safe_state

    cfg = parse_cli(argv, description="Training script parameters",
                    strict=True)
    logger = get_logger()

    if not cfg.model.model_path:
        cfg.model.model_path = os.path.join(cfg.runtime.exps_dir,
                                            cfg.extras.expname)
    timestamp = time.strftime("%Y%m%d_%H%M%S")
    base_save_path = os.path.join(cfg.runtime.exps_dir, cfg.extras.expname)
    add_file_sink(os.path.join(base_save_path, "log"),
                  f"log_{timestamp}_train.log")
    logger.info(f"Optimizing {cfg.model.model_path}")

    safe_state(seed=cfg.extras.seed)
    # Start the viewer bridge (reference train.py:614); --port -1 disables.
    if cfg.extras.port >= 0:
        from langsplat4d.utils import network_gui
        try:
            network_gui.init(cfg.extras.ip, cfg.extras.port)
            logger.info(f"GUI server listening on "
                        f"{cfg.extras.ip}:{cfg.extras.port}")
        except OSError as e:
            logger.warning(f"GUI server unavailable ({e}); training without "
                           "viewer bridge.")
    if cfg.extras.detect_anomaly:
        # torch.autograd.set_detect_anomaly equivalent (train.py:615)
        from langsplat4d.utils.profiling import enable_nan_debug
        enable_nan_debug(True)
    # default save marks (train.py:617-618)
    for it in (10000, 20000):
        if it not in cfg.extras.save_iterations:
            cfg.extras.save_iterations.append(it)

    from langsplat4d.train.loop import training
    training(cfg)
    logger.info("\nTraining complete.")


if __name__ == "__main__":
    main(sys.argv[1:])
