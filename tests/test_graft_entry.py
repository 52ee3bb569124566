"""Pin the driver contract: entry() compiles single-device, dryrun_multichip
runs the full sharded step on the simulated 8-device mesh."""

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    dist, idx = out
    assert dist.shape == (128, 10)
    assert idx.shape == (128, 10)


def test_dryrun_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
