"""Host-side utilities: metrics, visualization, FLOPs accounting, profiling."""

from ewvit_tpu.utils.metrics import (  # noqa: F401
    binary_metrics,
    calculate_eer,
)
