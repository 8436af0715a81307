"""Runtime services: metrics registry, async device executor."""

from mere_fusion_tpu.runtime.metrics import metrics, MetricsRegistry  # noqa: F401
