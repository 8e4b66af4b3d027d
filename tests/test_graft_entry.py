"""Driver contract: entry() compiles, dryrun_multichip runs on 8 devices."""

import sys

import jax
import numpy as np


def test_entry_jits():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    shapes = jax.tree.map(lambda x: x.shape, out)
    assert shapes == ((4, 32, 9), (4, 32, 32, 2))
    assert all(np.isfinite(np.asarray(x)).all() for x in out)


def test_dryrun_multichip_8():
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    g.dryrun_multichip(8)
