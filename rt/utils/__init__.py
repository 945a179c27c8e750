from rt.utils.profiling import (RenderStats, Timer, device_sync,
                                profile_trace, setup_logging)

__all__ = ["RenderStats", "Timer", "device_sync", "profile_trace",
           "setup_logging"]
