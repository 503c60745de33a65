from neddf_tpu.parallel.mesh import (  # noqa: F401
    data_sharded,
    field_param_specs,
    make_mesh,
    make_sharded_grads,
    make_sharded_render,
    make_sharded_train_step,
    replicated,
    shard_field_params,
    tp_renderer,
)
