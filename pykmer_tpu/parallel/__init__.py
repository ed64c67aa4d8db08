from .._jax_setup import ensure_x64

ensure_x64()

from .mesh import make_mesh, DATA_AXIS, SHARD_AXIS
from .histogram import (
    make_sharded_accumulate,
    interleaved_to_flat,
    flat_to_interleaved,
    shard_batch_chunks_packed,
)
from .encode import make_halo_encode
from .compare import make_sharded_pair_matrix
