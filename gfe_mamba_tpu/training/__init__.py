from gfe_mamba_tpu.training.metrics import (
    BinaryMetrics,
    binary_metrics,
    confusion_counts,
)
