"""Instrumented wall-clock timing of dryrun_multichip on the virtual CPU mesh.

Usage:  XLA_FLAGS=--xla_force_host_platform_device_count=8 python tools/time_dryrun.py

Prints cumulative seconds after each dryrun stage (stages are delimited by the
jax.block_until_ready calls), by monkeypatching block_until_ready.  Used to keep
the driver's MULTICHIP gate inside its timeout budget (VERDICT round-3 Weak #1).
"""

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

t0 = time.time()
_orig = jax.block_until_ready
_stage = [0]


def _timed(x):
    out = _orig(x)
    _stage[0] += 1
    print(f"stage {_stage[0]:2d} done at {time.time() - t0:7.1f}s", flush=True)
    return out


jax.block_until_ready = _timed

import __graft_entry__  # noqa: E402

print(f"imports at {time.time() - t0:.1f}s", flush=True)
__graft_entry__.dryrun_multichip(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
print(f"TOTAL {time.time() - t0:.1f}s", flush=True)
