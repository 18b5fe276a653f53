from .mesh import (batch_sharding, make_dp_eval_step, make_dp_train_step,
                   make_mesh, replicate_state, replicated, shard_batch)
from .spatial import (make_dp_sp_eval_step, make_dp_sp_mesh,
                      make_dp_sp_train_step, make_sp_inference_fn,
                      make_sp_mesh, place_spatial, spatial_sharding)
