from .state import TrainState, adam_tx, apply_net_update, build_networks, init_state
from .api import StochCycleGAN, AugmentedCycleGAN, create_model
