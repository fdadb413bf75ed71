"""EigenTrajectory-TPU: a TPU-native (JAX/XLA/Pallas) trajectory-forecasting
representation framework with the capabilities of InhwanBae/EigenTrajectory.

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):
  config          typed experiment configuration
  data            ETH-UCY ingestion + static-shape padded batching
  etspace         normalizer / SVD descriptor / k-means anchors / facade
  models          Flax predictor zoo operating in ET coefficient space
  metrics         min-of-S ADE/FDE/TCC/COL (masked, vmappable)
  train           jitted train/eval loops, checkpointing
  parallel        jax.sharding Mesh utilities for data-parallel scaling
  ops             Pallas TPU kernels for the hot ET-space ops
  analysis        descriptor evaluation (Table 1) + curve models
"""

from . import config, metrics
from .config import ExpConfig, load_config
from .etspace.descriptor import ETBasis, fit_basis, project, reconstruct, truncated_svd
from .etspace.facade import ETParams, calculate_parameters, et_forward, moving_mask
from .etspace.normalizer import NormParams, compute_norm_params, denormalize, normalize

__version__ = "0.1.0"
