import sys
import os

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, example_args = ge.entry()
    out = jax.jit(fn)(*example_args)
    actions, value, new_rnn = out
    assert value.shape == (64,)
    assert actions["discrete"].shape == (64, 4)
    assert actions["aim"].shape == (64, 2)
    assert np.all(np.isfinite(np.asarray(value)))


def test_dryrun_multichip_8():
    import __graft_entry__ as ge

    assert len(jax.devices()) >= 8
    ge.dryrun_multichip(8)
