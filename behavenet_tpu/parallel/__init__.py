"""Device-mesh parallelism: sharded data-parallel training + grid fan-out."""

from behavenet_tpu.parallel.mesh import (  # noqa
    make_mesh, shard_batch, replicate, make_dp_train_functions)
