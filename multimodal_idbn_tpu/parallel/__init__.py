"""Multi-chip scaling: mesh construction + data-parallel training.

The reference is strictly single-process single-device (SURVEY.md §2 rows
20-21: no torch.distributed / NCCL / any parallelism). The TPU-native
scaling story (SURVEY.md §5.8) is pure-JAX data parallelism: a 1-D
``jax.sharding.Mesh`` over all chips, batch sharded along it, and the CD
statistics (``pos_assoc``, ``neg_assoc``, bias sums — plain sums over the
batch) reduced by XLA-inserted ICI collectives. Randomness stays invariant
to chip count because threefry is counter-based and partitionable.
"""

from multimodal_idbn_tpu.parallel.distributed import (  # noqa: F401
    initialize_distributed,
    is_multi_process,
    local_batch_slice,
)
from multimodal_idbn_tpu.parallel.data_parallel import (  # noqa: F401
    batch_sharding,
    dp_bimodal_epoch_block,
    dp_bimodal_joint_epoch,
    dp_cd_update,
    dp_idbn_epoch,
    dp_idbn_epoch_block,
    dp_joint_epoch,
    dp_joint_epoch_block,
    make_mesh,
    pad_to_multiple,
    replicate,
    resolve_mesh,
    shard_batch,
)
from multimodal_idbn_tpu.parallel.mesh2d import (  # noqa: F401
    make_mesh_2d,
    shard_state,
    tp_cd_update,
    tp_idbn_epoch,
)
