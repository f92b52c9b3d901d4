"""Driver entry points: entry() lowers single-device; dryrun_multichip runs a
real DP x TP training step on the virtual 8-device mesh — including in a fresh
subprocess with the production environment (no conftest env), which is the
exact driver invocation that failed in round 1 (MULTICHIP_r01.json rc=1)."""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_driver_invocation():
    """Run the exact driver command in a fresh subprocess WITHOUT the conftest
    environment (JAX_PLATFORMS / XLA_FLAGS stripped, axon sitecustomize
    active), so dryrun_multichip must self-provision the virtual mesh."""
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, (
        f"driver invocation failed rc={proc.returncode}\n"
        f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip(8)" in proc.stdout


def test_entry_lowers():
    import __graft_entry__ as g

    fn, args = g.entry()
    jax.jit(fn).lower(*args)
