from gfe_mamba_tpu.utils.experiment import (
    ExperimentDir,
    count_parameters,
    save_plot_data,
    volume_grid,
    save_volume_grid,
)
from gfe_mamba_tpu.utils import profiling  # noqa: F401
