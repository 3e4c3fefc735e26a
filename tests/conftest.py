"""Test configuration: force a virtual 8-device CPU mesh.

Tests never require real TPU hardware; multi-chip sharding is validated on a
virtual CPU mesh (``--xla_force_host_platform_device_count=8``), mirroring the
reference's "fake backend" affordances (mock denoiser inputs, forced compute
fallback — /root/reference/src/DXRExperimentsApp.cpp:19-23).
"""

import os
import sys

# Import the package from the repo root without installation (no egress for
# pip build isolation in this environment).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Must be set before jax is imported anywhere. NOTE: this environment exports
# JAX_PLATFORMS=axon (a remote TPU tunnel) globally and the plugin re-appends
# itself, so we must both override the env var AND force the config after
# import — otherwise "cpu" arrays silently live across the tunnel and every
# host transfer costs seconds.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Persistent XLA compilation cache: the suite is compile-bound on this 1-CPU
# box (same graphs recompiled every run), and warm runs are ~3x faster. The
# cpu_aot_loader "machine feature mismatch" stderr it triggers is a pseudo-
# feature (prefer-no-scatter/gather) bookkeeping quirk — artifacts are built
# and loaded on the same host. Opt out with DXR_NO_JAX_CACHE=1.
if not os.environ.get("DXR_NO_JAX_CACHE"):
    os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")  # silence the loader
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
