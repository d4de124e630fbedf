"""Device-mesh / sharding layer (first-class new component, SURVEY.md §2
"Parallelism strategies" and §5 "Distributed communication backend")."""

from .mesh import (
    make_mesh,
    chain_mesh,
    particle_mesh,
    batch_mesh,
    initialize_distributed,
    shard_leading_axis,
)
