"""Typed experiment configuration.

Unifies the reference's three coexisting config systems (JSON+DotDict at
utils/utils.py:20-39, AgentFormer YAML at baseline/agentformer/utils/config.py,
PECNet optimal.yaml / LB-EBM hardcoded dict at utils/trainer.py:304-427) into a
single dataclass tree with per-baseline sub-configs.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional

# Per-dataset static-distance thresholds from the reference configs
# (/root/reference/config/eigentrajectory-{baseline}-*.json, key "static_dist").
STATIC_DIST = {
    "eth": 0.419,
    "hotel": 0.353,
    "univ": 0.227,
    "zara1": 0.338,
    "zara2": 0.35,
}


@dataclasses.dataclass
class ExpConfig:
    """Experiment hyper-parameters.

    Field names and defaults mirror the reference JSON schema
    (config/eigentrajectory-{baseline}-eth.json:1-28) so reference config files
    load unchanged.
    """

    dataset_dir: str = "./datasets/"
    checkpoint_dir: str = "./checkpoints/"

    dataset: str = "eth"
    traj_dim: int = 2
    obs_len: int = 8
    obs_step: int = 10
    pred_len: int = 12
    pred_step: int = 10
    skip: int = 1

    k: int = 6
    static_dist: float = 0.419
    num_samples: int = 20
    obs_svd: bool = True
    pred_svd: bool = True
    baseline: str = "stgcnn"

    batch_size: int = 128
    num_epochs: int = 256
    lr: float = 1e-3
    weight_decay: float = 1e-4
    clip_grad: Optional[float] = 10.0
    lr_schd: bool = True
    lr_schd_step: int = 64
    lr_schd_gamma: float = 0.5

    # TPU-specific knobs (new capability; absent in the reference).
    seed: int = 0
    n_max_peds: Optional[int] = None   # pad target; inferred from data if None
    mesh_data_axis: int = 1            # data-parallel shard count (1 = single chip)
    use_pallas: bool = True            # fused Pallas reconstruction/metrics path
    micro_batches: int = 1             # split sequenced batches into M chunks with
                                       # host-side grad accumulation (identical math,
                                       # 1/M the compiled graph — for XL predictors)
    scan_chunks: int = 0               # device-side lax.scan over M chunks inside ONE
                                       # jitted sequenced step: same summation order as
                                       # micro_batches (bit-identical), one dispatch,
                                       # but the XLA backend compiles only the chunk
                                       # body — cuts the cold compile cliff (compile
                                       # probe: 215 s at B=128 vs 13 s at B=8).
                                       # 0 = auto: smallest M whose chunk width
                                       # (batch_size/M) is <= 8, i.e. the largest
                                       # chunk width below the measured cliff, when
                                       # batch_size divides evenly and no data mesh
                                       # is active; 1 disables (unrolled step)
    warmup_epochs: int = 0             # linear LR warmup over the first N epochs
                                       # (training-dynamics experiment knob)
    wd_exclude: tuple = ()             # param-path substrings excluded from AdamW
                                       # weight decay (e.g. ("out_fc",))

    # Free-form per-baseline overrides (subsumes optimal.yaml etc.).
    baseline_config: Dict[str, Any] = dataclasses.field(default_factory=dict)

    def replace(self, **kw) -> "ExpConfig":
        return dataclasses.replace(self, **kw)


REFERENCE_DATASETS = "/root/reference/datasets/"


def resolve_dataset_dir(dataset_dir: str, dataset: str) -> str:
    """Resolve the per-split data directory with a reference-mount fallback.

    Configs default to the standalone layout `./datasets/<name>` (populated by
    scripts/download_datasets.sh); when that is absent but the read-only
    reference mount exists (driver sandbox), fall back to it so the same
    config files work in both environments.
    """
    path = os.path.join(dataset_dir, dataset)
    if not os.path.isdir(path):
        fallback = os.path.join(REFERENCE_DATASETS, dataset)
        if os.path.isdir(fallback):
            return fallback
    return path


def load_config(path: str, **overrides) -> ExpConfig:
    """Load a JSON config file (reference-schema compatible) into ExpConfig."""
    assert os.path.exists(path), f"Config file {path} does not exist"
    with open(path) as f:
        raw = json.load(f)
    known = {f.name for f in dataclasses.fields(ExpConfig)}
    extra = {k: v for k, v in raw.items() if k not in known}
    kept = {k: v for k, v in raw.items() if k in known}
    cfg = ExpConfig(**kept)
    if extra:
        cfg.baseline_config.update(extra)
    if overrides:
        cfg = cfg.replace(**overrides)
    return cfg
