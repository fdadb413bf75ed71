"""Predictor zoo registry.

Each baseline module exports:
  make_model(cfg) -> flax Module     (the predictor, ET-space wiring)
  prepare(c_obs, obs_ori, aux)       (pre-hook: build model inputs)
  finalize(output, aux)              (post-hook: -> C_pred_refine (k, N, s))
  BATCHING in {"sequenced", "collated"}

mirroring the reference's 3-hook bridge contract (EigenTrajectory/model.py:93-95,
baseline/*/bridge.py) and the registry at baseline/__init__.py:1-10.
"""
from __future__ import annotations

import importlib

_BASELINES = (
    "stgcnn",
    "sgcn",
    "pecnet",
    "agentformer",
    "lbebm",
    "dmrgcn",
    "gpgraphstgcnn",
    "gpgraphsgcn",
    "graphtern",
    "implicit",
)


def available_baselines():
    return _BASELINES


def get_baseline(name: str):
    """Resolve a baseline module by config name (trainval.py:24 equivalent)."""
    if name not in _BASELINES:
        raise KeyError(f"Unknown baseline '{name}'; available: {_BASELINES}")
    return importlib.import_module(f"eigentrajectory_tpu.models.{name}")
