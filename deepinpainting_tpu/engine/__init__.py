from .inpaint import (build_models, create_state, init_params,
                      make_coarse_fn, make_eval_step, make_inference_fn,
                      make_serving_fn,
                      make_train_step, prepare_masks, resolve_mask,
                      two_stage_forward)
from .schedules import EarlyStopping, PlateauScheduler, lr_for_epoch
from .state import (TrainState, create_train_state, current_learning_rate,
                    make_optimizer, set_learning_rate)
from .checkpoint import CheckpointManager
