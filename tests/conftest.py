"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test session.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# neutralize the TPU-tunnel sitecustomize so tests get a virtual CPU mesh
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The TPU-tunnel sitecustomize force-selects the axon platform via
# jax.config at interpreter startup; override it back to the CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
