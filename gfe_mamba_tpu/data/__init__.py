from gfe_mamba_tpu.data.nifti import load_nifti, save_nifti
from gfe_mamba_tpu.data.table import prepare_table, TablePreprocessor
from gfe_mamba_tpu.data.datasets import (
    MRI2PETDataset,
    MRIClassifyDataset,
    form_dataloader,
    classi_dataloader,
)
from gfe_mamba_tpu.data.loader import DataLoader
from gfe_mamba_tpu.data import augment2d
