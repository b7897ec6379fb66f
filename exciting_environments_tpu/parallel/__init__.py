"""Multi-chip parallelism: device meshes, batch sharding, collectives.

The batch axis of an environment fleet shards over a ``jax.sharding.Mesh``;
steps are embarrassingly parallel, so the only cross-chip traffic is metric
reduction (see SURVEY §5).
"""

from exciting_environments_tpu.parallel.mesh import (
    BATCH_AXIS,
    ShardedEnv,
    batch_sharding,
    make_batch_mesh,
    replicated_sharding,
    shard_batched_tree,
)
from exciting_environments_tpu.parallel.metrics import (
    RunningStats,
    gather_to_host,
    mean_metric,
    sum_metric,
    violation_fraction,
    Window,
    across_mesh,
    merge,
    running_init,
    running_summary,
    running_update,
    window_init,
    window_max,
    window_mean,
    window_min,
    window_push,
)
