"""The driver contract in __graft_entry__ must keep working."""

import sys
import os

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 8, 128)


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)
