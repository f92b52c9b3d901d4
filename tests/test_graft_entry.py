"""Driver entry points: entry() lowers single-device; dryrun_multichip runs a
real DP x TP training step on the virtual 8-device mesh."""

import jax


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_entry_lowers():
    import __graft_entry__ as g

    fn, args = g.entry()
    jax.jit(fn).lower(*args)
