"""Shared script bootstrap: repo-root sys.path + platform forcing.

Every benchmark/analysis script must import this FIRST (before jax or any
gm3d_tpu module that touches a backend): it puts the repo root on sys.path
and imports ``gm3d_tpu.cli.common``, which honors ``GM3D_PLATFORM=cpu``
BEFORE backend init. The axon TPU plugin ignores ``JAX_PLATFORMS``
(CLAUDE.md); without this a "CPU" run grabs the real chip and collides with
any TPU process already running.

Usage (first non-stdlib import of the script)::

    import _bootstrap  # noqa: F401
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import gm3d_tpu.cli.common  # noqa: F401,E402
