"""lra_tpu: TPU-native long-read / assembly-contig alignment engine.

A from-scratch JAX/XLA/Pallas re-design of the method implemented by the
reference C++ aligner lra (ChaissonLab/lra): two-tiered minimizer indexing,
seed anchoring, concave-gap sparse-DP chaining with inversion-aware
forward/back-diagonal scoring, local-index refinement, linear anchor
extension, banded affine base-level alignment, and SAM/PAF/BED output with
lra's presets and tags.

Layering:
  host (numpy/C++): I/O, index build, ragged bookkeeping, chain surgery,
      CIGAR emission;
  device (jnp/Pallas): the numeric cores — chaining SDP, banded affine
      alignment, extension — on fixed, bucketed shapes, batched over reads
      and sharded data-parallel over a device mesh.
"""

from .options import Options, ReadType, preset

__version__ = "0.1.0"


def enable_compile_cache(path: str = "/root/.cache/jax_compilation") -> None:
    """Persist XLA compilations across processes (tunneled-TPU compiles are
    expensive: ~10s per kernel shape)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
