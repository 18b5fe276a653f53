from .mesh import (batch_sharding, make_dp_eval_step, make_dp_train_step,
                   make_mesh, replicate_state, replicated, shard_batch)
