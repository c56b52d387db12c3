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
    _enable_compile_cache()


def _enable_compile_cache() -> None:
    """Point jax's persistent compilation cache at a local directory.

    The axon tunnel compiles remotely and COLD: without a cache every CLI
    process re-compiles the full render/train programs (minutes to hours
    server-side this round — observed wedging the shared tunnel). The axon
    client wires jax's cache to a fingerprint-keyed executable sidechannel
    (axon/register/ifrt.py _install_compile_cache_hooks), so a warm cache
    skips the remote compile entirely. Opt out with LS4D_JAX_CACHE_DIR="".
    """
    cache_dir = os.environ.get("LS4D_JAX_CACHE_DIR",
                               "/tmp/ls4d_jax_cache")
    if not cache_dir:
        return
    import jax
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # big programs only by default; the render/train programs all
        # qualify, while tiny utility jits stay out of the way
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except (RuntimeError, OSError):
        pass
