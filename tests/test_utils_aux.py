"""Aux subsystem tests: timers, logging, profiling hooks, triptych writer."""
import os

import numpy as np


def test_timer_pause_excludes_time(monkeypatch):
    from langsplat4d.utils.timer import Timer
    import time as time_mod
    t = Timer()
    now = [100.0]
    monkeypatch.setattr(time_mod, "time", lambda: now[0])
    t.start()
    now[0] += 5
    t.pause()
    now[0] += 100  # paused time must not count
    t.start()
    now[0] += 2
    assert abs(t.get_elapsed_time() - 7.0) < 1e-9


def test_step_timer_ema():
    from langsplat4d.utils.profiling import StepTimer
    st = StepTimer(ema=0.5)
    st.start()
    st.stop()
    assert st.ema_ms is not None and st.ema_ms >= 0


def test_checked_flags_nan():
    import jax.numpy as jnp
    from langsplat4d.utils.profiling import checked

    def bad(x):
        return jnp.log(x)  # NaN for negative input

    err, val = checked(bad)(jnp.asarray(-1.0))
    assert err.get() is not None  # NaN reported


def test_render_training_image(tmp_path, rng):
    from langsplat4d.utils.scene_vis import render_training_image
    gt = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    rend = rng.uniform(size=(3, 32, 32)).astype(np.float32)
    depth = rng.uniform(1, 5, size=(1, 32, 32)).astype(np.float32)
    path = render_training_image(str(tmp_path), "fine-lang", 7, 65.0, gt,
                                 rend, depth, 1234)
    assert os.path.exists(path)
    from PIL import Image
    img = Image.open(path)
    assert img.size[0] == 96  # 3 panels


def test_telemetry_noop_without_sinks(tmp_path):
    from langsplat4d.utils.telemetry import Telemetry
    t = Telemetry(log_dir=None)
    t.scalars({"a": 1.0}, 0)  # must not raise
    t.close()
