"""Standalone 3D segmentation stack (parity with the reference's
vendored pytorch3dunet framework, SURVEY.md 2.17): losses, metrics,
patch slicing, sliding-window prediction, augmentation, HDF5 datasets,
and a config-driven trainer."""

from gfe_mamba_tpu.segmentation.losses import get_loss_criterion
from gfe_mamba_tpu.segmentation.metrics import get_evaluation_metric
from gfe_mamba_tpu.segmentation.slicers import SliceBuilder, FilterSliceBuilder
from gfe_mamba_tpu.segmentation.predictor import sliding_window_predict
from gfe_mamba_tpu.segmentation.transforms import build_transforms
from gfe_mamba_tpu.segmentation.hdf5 import HDF5Dataset, save_predictions_h5
from gfe_mamba_tpu.segmentation.dsb import DSB2018Dataset
from gfe_mamba_tpu.segmentation.trainer import UNetTrainer, create_optimizer
