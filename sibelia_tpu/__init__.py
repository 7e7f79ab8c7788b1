"""sibelia_tpu — a TPU-native synteny block / variant calling framework.

A ground-up re-design of the capabilities of bioinf/Sibelia 3.0.7 (synteny
block finding via iterative de Bruijn graph simplification, plus pairwise
variant calling) as array programs for JAX/XLA/Pallas on TPU.

Layout:
  core/     config, stage presets, deterministic RNG parity helpers
  io/       FASTA reader/writer, all output writers (coords/coverage/perm/...)
  index/    device-side k-mer ranking and bifurcation enumeration
  graph/    mutable sequence arrays, bifurcation store, simplification
  blocks/   edge listing, overlap resolution, trimming, gluing, numbering
  variants/ batched alignment + variant extraction (C-Sibelia capability)
  parallel/ device mesh, sharded index build (multi-chip)
  kernels/  Pallas TPU kernels
  cli/      command line drivers
"""

__version__ = "0.1.0"
VERSION = "3.0.7"  # reference compatibility version reported in outputs

# Honor an explicit platform choice even under harnesses whose
# sitecustomize force-selects a platform via jax.config at interpreter
# startup (which silently overrides the JAX_PLATFORMS env var).
# SIBELIA_TPU_PLATFORM takes precedence; it re-asserts the choice through
# jax.config before any backend is initialized.
import os as _os

_plat = _os.environ.get("SIBELIA_TPU_PLATFORM")
if _plat:
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _plat)
    except Exception:
        pass
del _os
