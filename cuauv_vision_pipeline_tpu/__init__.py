"""cuauv_vision_pipeline_tpu — a TPU-native real-time vision streaming framework.

A brand-new framework with the capabilities of the CUAUV vision pipeline
(reference: ayf7/cuauv-vision-pipeline), re-designed TPU-first:

* ``native/``   — C++ lock-free shared-memory frame bus (seqlock ring, futex
                  blocking reads, C ABI) replacing the reference's
                  camera_message_framework.
* ``core/``     — the module framework: BlockAccessor, ModuleBase/@sources,
                  tuners, handlers, capture-source harness, module reader,
                  in-repo typed shm result store, module toggler.
* ``ops/``      — batched JAX/Pallas vision ops (colorspace, threshold,
                  morphology, connected components, color balance, warps),
                  bit-exact against OpenCV's u8 paths where the reference
                  relies on them.
* ``engine/``   — the TPU executor: staging buffers, async dispatch, fused
                  per-module pipelines.
* ``models/``   — JAX model families (YOLO detect/OBB/pose with fused
                  decode+NMS).
* ``parallel/`` — jax.sharding mesh helpers for multi-chip scaling.
* ``utils/``    — reference-compatible vision op API (color/feature/
                  transform/draw/sift) built on ops/.
* ``capture_sources/``, ``modules/``, ``handlers/``, ``misc/`` — the
  user-facing programs matching the reference's inventory (SURVEY.md §2).
"""

__version__ = "0.1.0"

# Honor $JAX_PLATFORMS before anything in the package can touch jax: device
# plugins that force-select their platform at jax-import time (the
# remote-attached TPU harness does) ignore the env var in fresh processes,
# and several submodules build jnp constants at import, which initializes
# the backend. Doing the config override here makes `JAX_PLATFORMS=cpu
# python -m cuauv_vision_pipeline_tpu.modules.X` behave as documented
# (toggler on a CPU mesh, tests, CI).
from .core.jaxconfig import apply_env_platform as _apply_env_platform

_apply_env_platform()
del _apply_env_platform
