from sgnn_tpu.utils.resource_monitor import ResourceMonitor

__all__ = ["ResourceMonitor"]
