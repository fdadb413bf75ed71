"""Driver entry points: single-chip forward compile + multichip dryrun."""
import sys

import numpy as np
import jax
import pytest


def _load():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g
    return g


def test_entry_compiles():
    g = _load()
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 4 and np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    g = _load()
    g.dryrun_multichip(8)
