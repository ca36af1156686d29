"""Multi-chip scaling: frame/view data parallelism + vertex tensor
parallelism over jax.sharding meshes."""

from bodyfitting_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    fit_sequence_sharded,
)
from bodyfitting_tpu.parallel.tensor import (  # noqa: F401
    shard_model_vertices,
    replicate_params,
)
