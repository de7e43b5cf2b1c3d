"""Device-mesh parallelism: sharded data-parallel training + grid fan-out."""

from behavenet_tpu.parallel.mesh import (  # noqa
    make_mesh, shard_batch, replicate, make_dp_train_functions)
from behavenet_tpu.parallel.tp import (  # noqa
    make_mesh_2d, tp_param_shardings, tp_shard, make_tp_train_functions)
from behavenet_tpu.parallel.seq import (  # noqa
    sp_scan, sp_forward_backward, sp_viterbi, sp_sample_posterior,
    sp_kalman_filter, sp_kalman_smooth)
