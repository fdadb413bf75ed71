"""Helpers to load the read-only upstream reference (/root/reference) for
numerical parity tests. The reference is imported, never copied; tests that
use it are skipped when it is absent."""
import os
import sys

import pytest

REFERENCE_PATH = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_PATH)


def reference_module(name: str):
    """Import a module from the reference tree (e.g. 'EigenTrajectory' or
    'utils.metrics'). Skips the calling test when unavailable."""
    if not has_reference():
        pytest.skip("reference tree not available")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import importlib

    try:
        return importlib.import_module(name)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")


def patch_torch_cpu():
    """Make the reference's CUDA-hardcoded modules run on CPU torch:
    no-op .cuda() moves and remap hardcoded device='cuda' factory calls
    (baseline/sgcn/model.py:53-54)."""
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if not getattr(torch.zeros_like, "_cpu_patched", False):
        _zeros_like = torch.zeros_like

        def _zeros_like_cpu(x, *a, **k):
            if str(k.get("device")) == "cuda":
                k["device"] = "cpu"
            return _zeros_like(x, *a, **k)

        _zeros_like_cpu._cpu_patched = True
        torch.zeros_like = _zeros_like_cpu
    return torch
