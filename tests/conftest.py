"""Test configuration: force an 8-virtual-device CPU platform so the
shard_map/psum data-parallel path is exercised without TPU hardware
(SURVEY.md §4 implication (c)).

Two hazards handled here:
- the surrounding environment may point JAX at a remote TPU tunnel
  (JAX_PLATFORMS=axon) where every eager op is a network round-trip, and a
  sitecustomize may re-force that platform at interpreter start via
  ``jax.config.update("jax_platforms", ...)`` — so we both hard-set the env
  var *and* re-update the config after importing jax;
- XLA_FLAGS must carry the host-device-count flag before backend init.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
