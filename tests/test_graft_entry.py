"""Driver contract tests for __graft_entry__.py."""

import sys

import jax
import pytest


def test_entry_compiles_and_runs():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    out = jax.device_get(out)
    assert out["boxes"].shape[0] == args[1].shape[0]
    assert out["valid"].dtype == bool


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    ge.dryrun_multichip(8)
