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

def _raise_stack_limit(soft_bytes: int = 256 * 1024 * 1024) -> None:
    """Raise RLIMIT_STACK (best-effort) before any XLA compilation.

    XLA:CPU lowers our large scan bodies (the unrolled L=64 SDP block
    triangle, the R=8-row affine/one-gap steps) into single huge LLVM
    functions; several of LLVM's codegen passes recurse per-instruction
    and overflow the default 8MB thread stack — observed as a hard
    SIGSEGV inside ``backend_compile_and_load`` partway through a test
    run (whichever large kernel missed the compile cache first).  The
    main thread's stack grows on fault up to the *current* soft rlimit,
    and glibc sizes new pthread stacks from the soft rlimit at thread
    creation, so raising it here (package import, before jax compiles
    anything) protects both the importing thread and later worker
    threads (pipeline/stream.py).  A finite value is used rather than
    RLIM_INFINITY because glibc maps infinity back to its own 8MB
    default for new threads."""
    try:
        import resource

        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        cap = hard if hard != resource.RLIM_INFINITY else soft_bytes
        want = min(soft_bytes, cap) if cap > 0 else soft_bytes
        if soft != resource.RLIM_INFINITY and 0 < soft < want:
            resource.setrlimit(resource.RLIMIT_STACK, (want, hard))
    except Exception:
        pass  # platforms without RLIMIT_STACK or without permission


_raise_stack_limit()

from .options import Options, ReadType, preset

__version__ = "0.1.0"


def enable_compile_cache(path: str = "/root/.cache/jax_compilation") -> None:
    """Persist XLA compilations across processes (tunneled-TPU compiles are
    expensive: ~10s per kernel shape)."""
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
