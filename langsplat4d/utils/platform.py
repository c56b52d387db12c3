"""Backend/platform selection helper shared by all CLIs.

The axon TPU plugin registers itself regardless of the JAX_PLATFORMS env var,
so honoring the variable requires an explicit jax.config update before the
backend initializes. Every CLI entry point (train/render/eval and the AE
train/test modules) must call this first; otherwise a `JAX_PLATFORMS=cpu`
invocation silently runs on — and serializes behind — the single TPU tunnel.
"""
import os


def apply_platform_env() -> None:
    plats = os.environ.get("JAX_PLATFORMS")
    if plats:
        import jax
        try:
            jax.config.update("jax_platforms", plats)
        except RuntimeError:
            pass  # backend already initialized
