"""Profiling/stats subsystem tests."""

import numpy as np

from rt.utils import RenderStats, Timer, device_sync


def test_render_stats_accounting():
    s = RenderStats(width=100, height=50, bounces=4, samples_per_frame=2)
    s.update(10, 2.0)
    s.update(10, 2.0)
    assert s.frames == 20 and s.seconds == 4.0
    assert s.fps == 5.0
    assert s.camera_rays_per_s == 100 * 50 * 2 * 20 / 4.0
    assert s.ray_segments_per_s == s.camera_rays_per_s * 4
    assert "20 frames" in s.summary()


def test_timer_syncs_device_work():
    import jax.numpy as jnp
    x = jnp.arange(1024.0)
    with Timer(x) as t:
        y = x * 2 + 1
        device_sync(y)
    assert t.seconds > 0.0


def test_profile_trace_never_raises(tmp_path):
    from rt.utils import profile_trace
    with profile_trace(str(tmp_path / "trace")):
        import jax.numpy as jnp
        np.asarray(jnp.ones(8) + 1)
