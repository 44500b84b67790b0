"""Driver-contract tests for __graft_entry__.

The driver runs ``dryrun_multichip(8)`` in an environment whose default
platform is a single tunneled TPU chip; round 1 failed because the entry
point assumed the caller had pre-forced a virtual platform. These tests pin
the fixed contract: the function bootstraps its own n-device platform (direct
path when enough devices exist, clean-subprocess fallback otherwise).
"""

import sys

import jax

sys.path.insert(0, str(__import__("pathlib").Path(__file__).parents[1]))
import __graft_entry__ as ge


def test_dryrun_direct_path_on_virtual_mesh(capsys):
    """Under conftest's 8 virtual CPU devices the direct path must run."""
    ge.dryrun_multichip(4)
    out = capsys.readouterr().out
    assert "dryrun_multichip(4): ok" in out


def test_dryrun_subprocess_fallback(capsys):
    """More devices than the live backend has -> clean-subprocess rerun."""
    assert len(jax.devices()) == 8
    # 16 > 8 forces the fallback; the child forces a 16-device CPU platform.
    ge.dryrun_multichip(16)
    out = capsys.readouterr().out
    assert "dryrun_multichip(16): ok" in out


def test_entry_signature():
    fn, args = ge.entry()
    assert callable(fn) and isinstance(args, tuple)
    out = jax.eval_shape(fn, *args)
    assert out.shape[0] == args[1].shape[0]
