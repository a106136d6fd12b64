"""Distribution layer: mesh sharding, four-step large-N FFT, halo streams.

The reference is single-node (SURVEY.md §2.8: no MPI/NCCL/threads; its
parallelism is 4-lane SIMD + read-only plan shareability).  This package is
the TPU-native scaling story that replaces those axes, per BASELINE.json:

  * batch/channel sharding (the DP analog)  -> :mod:`.mesh`
  * four-step (Bailey) large-N single FFT with all-to-all transposes over
    ICI (the TP/SP analog)                  -> :mod:`.fourstep`
  * overlap-save halo exchange via ppermute (the CP analog)
                                             -> :mod:`.stream`

All entry points take an explicit ``jax.sharding.Mesh``; nothing here spawns
processes.  On a single device everything degrades to the local engine.
"""

from .mesh import make_mesh, batch_sharding, shard_batch
from .fourstep import fourstep_cfft, fourstep_icfft, fourstep_rfft, fourstep_irfft, FourStepPlan
from .stream import sharded_fastconv_valid, halo_exchange_right
from .pencil import Pencil2D

__all__ = [
    "make_mesh",
    "batch_sharding",
    "shard_batch",
    "FourStepPlan",
    "fourstep_cfft",
    "fourstep_icfft",
    "fourstep_rfft",
    "fourstep_irfft",
    "sharded_fastconv_valid",
    "halo_exchange_right",
    "Pencil2D",
]
