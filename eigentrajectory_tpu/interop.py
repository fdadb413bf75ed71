"""Reference-checkpoint import: torch state_dict -> this framework.

The reference saves `model.state_dict()` of the whole EigenTrajectory module
(utils/trainer.py:101-105): frozen ET parameters under `ET_{m,s}_descriptor.*`
/ `ET_{m,s}_anchor.C_anchor` plus the trained predictor under
`baseline_model.*`. This module converts such a .pth into our
(params, batch_stats, ETParams) triple so a reference-trained model evaluates
in this framework without retraining — the strongest possible parity evidence,
decoupled from training stochasticity.

The ET basis/anchors are imported VERBATIM (no sign canonicalization): a
trained checkpoint's predictor weights are consistent with exactly the basis
it was trained against, and the end-to-end metrics are invariant to the
convention as long as basis and anchors stay paired.

CLI:
  python -m eigentrajectory_tpu.interop --cfg configs/eigentrajectory-stgcnn-hotel.json \
      --pth /path/model_best.pth --tag imported
then evaluate with `python trainval.py --test --cfg ... --tag imported`.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import numpy as np

PyTree = Dict


# --------------------------------------------------------------------------
# torch-module-kind -> our-param-block helpers (state_dict side is numpy)
# --------------------------------------------------------------------------

def _conv(sd, key, bias=True):
    out = {"kernel": sd[f"{key}.weight"]}          # OIHW on both sides
    if bias:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _conv1d(sd, key):
    # torch Conv1d (O, I, k) -> our Conv1dTorch wraps a (O, I, k, 1) Conv2d
    return {"conv": {"kernel": sd[f"{key}.weight"][..., None],
                     "bias": sd[f"{key}.bias"]}}


def _linear(sd, key, bias=True):
    out = {"kernel": sd[f"{key}.weight"].T}        # (out,in) -> (in,out)
    if bias and f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _prelu(sd, key):
    return {"alpha": sd[f"{key}.weight"]}


def _bn_params(sd, key):
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


def _bn_stats(sd, key):
    return {"mean": sd[f"{key}.running_mean"], "var": sd[f"{key}.running_var"]}


# --------------------------------------------------------------------------
# per-baseline converters: flat predictor state_dict -> (params, batch_stats)
# --------------------------------------------------------------------------

def _import_stgcnn(sd) -> Tuple[PyTree, PyTree]:
    """social_stgcnn (baseline/stgcnn/model.py:111-146) -> SocialSTGCNN."""
    params = {
        "st_gcn_0": {
            "gcn_conv": _conv(sd, "st_gcns.0.gcn.conv"),
            "tcn_bn1": _bn_params(sd, "st_gcns.0.tcn.0"),
            "tcn_prelu": _prelu(sd, "st_gcns.0.tcn.1"),
            "tcn_conv": _conv(sd, "st_gcns.0.tcn.2"),
            "tcn_bn2": _bn_params(sd, "st_gcns.0.tcn.3"),
            "res_conv": _conv(sd, "st_gcns.0.residual.0"),
            "res_bn": _bn_params(sd, "st_gcns.0.residual.1"),
            "out_prelu": _prelu(sd, "st_gcns.0.prelu"),
        },
        "tpcnn_output": _conv(sd, "tpcnn_ouput"),
    }
    # tpcnns[4]/prelus[4] are constructed-but-never-called in the reference
    # (model.py:133-137), and our Flax module materializes no params for them.
    for i in range(4):
        params[f"tpcnn_{i}"] = _conv(sd, f"tpcnns.{i}")
        params[f"prelu_{i}"] = _prelu(sd, f"prelus.{i}")
    batch_stats = {
        "st_gcn_0": {
            "tcn_bn1": _bn_stats(sd, "st_gcns.0.tcn.0"),
            "tcn_bn2": _bn_stats(sd, "st_gcns.0.tcn.3"),
            "res_bn": _bn_stats(sd, "st_gcns.0.residual.1"),
        }
    }
    return params, batch_stats


def _import_mlp(sd, key):
    """TorchMLP (models/common.py) <- pecnet-style MLP (Linear stack)."""
    out = {}
    i = 0
    while f"{key}.layers.{i}.weight" in sd:
        out[f"layer_{i}"] = {"kernel": sd[f"{key}.layers.{i}.weight"].T,
                             "bias": sd[f"{key}.layers.{i}.bias"]}
        i += 1
    assert out, f"no MLP layers found under {key}"
    return out


def _import_pecnet(sd):
    """PECNet predict() path (baseline/pecnet/model.py:166-176)."""
    params = {name: _import_mlp(sd, name) for name in
              ("encoder_past", "encoder_dest", "non_local_theta",
               "non_local_phi", "non_local_g", "predictor")}
    return params, {}


def _import_lbebm(sd):
    """LBEBM predict() path (baseline/lbebm/model.py:190-196)."""
    params = {name: _import_mlp(sd, name) for name in
              ("encoder_past", "encoder_dest", "predictor")}
    return params, {}


def _import_sgcn(sd):
    """TrajectoryModel (baseline/sgcn/model.py:224-272) -> SGCNTrajectoryModel.
    Also used for the GP-Graph reformatted copy (gpgraphsgcn/model_baseline.py)."""
    swa = "sparse_weighted_adjacency_matrices"
    adj = {
        "spa_fusion_conv": _conv(sd, f"{swa}.spa_fusion.conv.0"),
        "spa_fusion_prelu": _prelu(sd, f"{swa}.spa_fusion.conv.1"),
    }
    for attn in ("spatial_attention", "temporal_attention"):
        adj[attn] = {name: _linear(sd, f"{swa}.{attn}.{name}")
                     for name in ("embedding", "query", "key")}
    im = {}
    for stream in ("spatial", "temporal"):
        for j in range(7):
            base = f"{swa}.interaction_mask.{stream}_asymmetric_convolutions.{j}"
            im[f"{stream}_{j}"] = {
                "conv1": _conv(sd, f"{base}.conv1", bias=False),
                "conv2": _conv(sd, f"{base}.conv2"),
                "activation": _prelu(sd, f"{base}.activation"),
            }
    adj["interaction_mask"] = im

    st = {}
    for ours, theirs in (("st_gcn", "spatial_temporal_sparse_gcn"),
                         ("ts_gcn", "temporal_spatial_sparse_gcn")):
        for i in range(2):
            st[f"{ours}_{i}"] = {
                "embedding": _linear(sd, f"stsgcn.{theirs}.{i}.embedding"),
                "activation": _prelu(sd, f"stsgcn.{theirs}.{i}.activation"),
            }

    params = {"sparse_adjacency": adj, "stsgcn": st,
              "fusion": _conv(sd, "fusion_", bias=False),
              "output": _linear(sd, "output")}
    for j in range(5):
        params[f"tcn_{j}"] = _conv(sd, f"tcns.{j}.0")
        params[f"tcn_prelu_{j}"] = _prelu(sd, f"tcns.{j}.1")
    return params, {}


def _import_dmrgcn(sd):
    """social_dmrgcn (baseline/dmrgcn/predictor.py:61-98) -> SocialDMRGCN."""
    g = {
        "tcn_prelu": _prelu(sd, "st_dmrgcns.0.tcn.0"),
        "tcn_conv": _conv(sd, "st_dmrgcns.0.tcn.1"),
        "res_conv": _conv(sd, "st_dmrgcns.0.residual.0"),
        "out_prelu": _prelu(sd, "st_dmrgcns.0.prelu"),
    }
    for r in range(2):
        g[f"gcn_{r}"] = {"conv": _conv(sd, f"st_dmrgcns.0.gcns.{r}.conv")}
    params = {"st_dmrgcn_0": g}
    for i in range(4):
        q = {
            "gta_0": _conv(sd, f"tpcnns.{i}.gtacn.0.0"),
            "gta_prelu_0": _prelu(sd, f"tpcnns.{i}.gtacn.0.1"),
        }
        for j in range(2):
            q[f"tpcn_{j}"] = _conv(sd, f"tpcnns.{i}.tpcn.{j}.0")
            q[f"tpcn_prelu_{j}"] = _prelu(sd, f"tpcnns.{i}.tpcn.{j}.1")
        if i == 0:
            q["res_conv"] = _conv(sd, f"tpcnns.{i}.residual.0")
        params[f"tpcnn_{i}"] = q
    return params, {}


def _import_graphtern(sd):
    """graph_tern_light (baseline/graphtern/model.py:220-264) -> GraphTERNLight."""
    params = {"tp_mrgcn_0": {
        "gcn": {"conv": _conv(sd, "tp_mrgcns.0.gcn.conv")},
        "tcn_prelu": _prelu(sd, "tp_mrgcns.0.tcn.0"),
        "tcn_conv": _conv(sd, "tp_mrgcns.0.tcn.1"),
        "res_conv": _conv(sd, "tp_mrgcns.0.residual.0"),
    }}
    for k in range(6):
        q = {
            "tpcn": {"conv": _conv(sd, f"tpcnns.{k}.tpcns.0.0")},
            "tpcn_prelu": _prelu(sd, f"tpcnns.{k}.tpcns.0.1"),
            "cpcn": {"conv": _conv(sd, f"tpcnns.{k}.cpcns.0.0")},
            "cpcn_prelu": _prelu(sd, f"tpcnns.{k}.cpcns.0.1"),
        }
        if k == 0:    # seq 8->6, channels equal: time residual conv only
            q["restconv"] = _conv(sd, f"tpcnns.{k}.restconv.0")
        elif k == 5:  # channels 16->20, seq equal: channel residual conv only
            q["rescconv"] = _conv(sd, f"tpcnns.{k}.rescconv.0")
        params[f"epcnn_{k}"] = q
    return params, {}


def _import_implicit(sd):
    """SocialImplicitLight (baseline/implicit/model.py:126-159)."""
    params = {}
    for i in range(4):
        base = f"implicit_cells.{i}"
        params[f"cell_{i}"] = {
            "noise_w": sd[f"{base}.noise_w"],
            "global_w": sd[f"{base}.global_w"],
            "local_w": sd[f"{base}.local_w"],
            "feat": _conv(sd, f"{base}.feat"),
            "highway_input": _conv(sd, f"{base}.highway_input"),
            "highway": _conv(sd, f"{base}.highway"),
            "tpcnn": _conv(sd, f"{base}.tpcnn"),
            "ped": {name: _conv1d(sd, f"{base}.ped.{name}")
                    for name in ("feat", "highway_input", "highway", "tpcnn")},
        }
    return params, {}


def _import_gpgraph(sd, baseline_converter):
    """GPGraph wrapper (model_groupwrapper.py:181-240): weight-shared baseline
    + GroupGenerator (learned_l2norm) + GroupIntegrator (mlp)."""
    inner = {k[len("baseline_model."):]: v for k, v in sd.items()
             if k.startswith("baseline_model.")}
    params, batch_stats = baseline_converter(inner)
    wrapped = {"baseline_model": params,
               "group_gen": {"group_cnn": _conv(sd, "group_gen.group_cnn.0"),
                             "th": sd["group_gen.th"]},
               "group_mix": {"mix_prelu": _prelu(sd, "group_mix.st_gcns_mix.0"),
                             "mix_conv": _conv(sd, "group_mix.st_gcns_mix.1")}}
    wrapped_stats = {"baseline_model": batch_stats} if batch_stats else {}
    return wrapped, wrapped_stats


def _import_agentformer(sd):
    """AgentFormerLight (baseline/agentformer/model.py:440-539)."""
    params = {
        "ctx_input_fc": _linear(sd, "context_encoder.input_fc"),
        "ctx_pos_encoder": {"fc": _linear(sd, "context_encoder.pos_encoder.fc")},
        "dec_input_fc": _linear(sd, "future_decoder.input_fc"),
        "dec_pos_encoder": {"fc": _linear(sd, "future_decoder.pos_encoder.fc")},
        "out_fc_kernel": sd["future_decoder.out_fc.weight"].T,
        "out_fc_bias": sd["future_decoder.out_fc.bias"],
    }

    def norm(key):
        return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}

    def attn_self(key):
        return {"in_proj": {"kernel": sd[f"{key}.in_proj_weight"].T,
                            "bias": sd[f"{key}.in_proj_bias"]},
                "in_proj_self": {"kernel": sd[f"{key}.in_proj_weight_self"].T,
                                 "bias": sd[f"{key}.in_proj_bias_self"]},
                "out_proj": _linear(sd, f"{key}.out_proj")}

    def attn_cross(key):
        return {"in_proj_kernel": sd[f"{key}.in_proj_weight"].T,
                "in_proj_bias": sd[f"{key}.in_proj_bias"],
                "in_proj_self_kernel": sd[f"{key}.in_proj_weight_self"].T,
                "in_proj_self_bias": sd[f"{key}.in_proj_bias_self"],
                "out_proj": _linear(sd, f"{key}.out_proj")}

    for i in range(2):
        base = f"context_encoder.tf_encoder.layers.{i}"
        params[f"enc_layer_{i}"] = {
            "self_attn": attn_self(f"{base}.self_attn"),
            "linear1": _linear(sd, f"{base}.linear1"),
            "linear2": _linear(sd, f"{base}.linear2"),
            "norm1": norm(f"{base}.norm1"), "norm2": norm(f"{base}.norm2"),
        }
    for i in range(2):
        base = f"future_decoder.tf_decoder.layers.{i}"
        params[f"dec_layer_{i}"] = {
            "self_attn": attn_self(f"{base}.self_attn"),
            "multihead_attn": attn_cross(f"{base}.multihead_attn"),
            "linear1": _linear(sd, f"{base}.linear1"),
            "linear2": _linear(sd, f"{base}.linear2"),
            "norm1": norm(f"{base}.norm1"), "norm2": norm(f"{base}.norm2"),
            "norm3": norm(f"{base}.norm3"),
        }
    return params, {}


def _import_stgcnn_gpgraph_variant(sd):
    return _import_stgcnn(sd)


CONVERTERS: Dict[str, Callable] = {
    "stgcnn": _import_stgcnn,
    "sgcn": _import_sgcn,
    "pecnet": _import_pecnet,
    "lbebm": _import_lbebm,
    "dmrgcn": _import_dmrgcn,
    "graphtern": _import_graphtern,
    "implicit": _import_implicit,
    "agentformer": _import_agentformer,
    "gpgraphsgcn": lambda sd: _import_gpgraph(sd, _import_sgcn),
    "gpgraphstgcnn": lambda sd: _import_gpgraph(sd, _import_stgcnn_gpgraph_variant),
}


# --------------------------------------------------------------------------
# whole-checkpoint import
# --------------------------------------------------------------------------

def import_et_params(sd):
    """ET_{m,s}_descriptor / ET_{m,s}_anchor (descriptor.py:26-27, anchor.py:20)."""
    import jax.numpy as jnp

    from .etspace.descriptor import ETBasis
    from .etspace.facade import ETParams

    def basis(tag):
        return ETBasis(
            U_obs=jnp.asarray(sd[f"ET_{tag}_descriptor.U_obs_trunc"]),
            U_pred=jnp.asarray(sd[f"ET_{tag}_descriptor.U_pred_trunc"]))

    return ETParams(
        basis_m=basis("m"), basis_s=basis("s"),
        anchor_m=jnp.asarray(sd["ET_m_anchor.C_anchor"]),
        anchor_s=jnp.asarray(sd["ET_s_anchor.C_anchor"]))


def import_state_dict(baseline: str, state_dict) -> Tuple[PyTree, PyTree, object]:
    """Convert a torch EigenTrajectory state_dict (tensors or arrays) into
    (params, batch_stats, ETParams) for `baseline`."""
    import jax.numpy as jnp

    if baseline not in CONVERTERS:
        raise NotImplementedError(
            f"no reference-checkpoint converter for '{baseline}' yet; "
            f"available: {sorted(CONVERTERS)}")
    sd = {k: np.asarray(getattr(v, "detach", lambda: v)().cpu().numpy()
                        if hasattr(v, "cpu") else v)
          for k, v in state_dict.items()}
    pred_sd = {k[len("baseline_model."):]: v for k, v in sd.items()
               if k.startswith("baseline_model.")}
    params, batch_stats = CONVERTERS[baseline](pred_sd)
    to_jnp = lambda tree: {k: to_jnp(v) if isinstance(v, dict) else jnp.asarray(v)
                           for k, v in tree.items()}
    return to_jnp(params), to_jnp(batch_stats), import_et_params(sd)


def import_checkpoint_to_trainer(cfg, pth_path: str, tag: str, unsafe: bool = False):
    """Load a reference .pth, convert, and save as a framework checkpoint
    under <checkpoint_dir>/<tag>/<dataset>/model_best.msgpack.

    A state_dict is plain tensors, so the restricted unpickler suffices;
    ``unsafe=True`` (CLI ``--unsafe``) re-enables full pickle for exotic
    checkpoints the caller explicitly trusts."""
    import torch

    from .train.trainer import ETJaxTrainer

    state_dict = torch.load(pth_path, map_location="cpu",
                            weights_only=not unsafe)
    params, batch_stats, et = import_state_dict(cfg.baseline, state_dict)
    tr = ETJaxTrainer(cfg, tag=tag, test_mode=True)
    tr.params, tr.batch_stats, tr.et = params, batch_stats, et
    tr.save_model()
    return tr


def main():
    import argparse

    from .config import load_config

    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", required=True)
    ap.add_argument("--pth", required=True)
    ap.add_argument("--tag", default="imported")
    ap.add_argument("--test", action="store_true",
                    help="evaluate immediately after importing")
    ap.add_argument("--unsafe", action="store_true",
                    help="allow full (arbitrary-code) unpickling of the .pth")
    args = ap.parse_args()

    cfg = load_config(args.cfg)
    tr = import_checkpoint_to_trainer(cfg, args.pth, args.tag,
                                      unsafe=args.unsafe)
    print(f"imported {args.pth} -> {tr.checkpoint_dir}")
    if args.test:
        results = tr.test()
        print({k: round(float(v), 6) for k, v in results.items()})


if __name__ == "__main__":
    main()
