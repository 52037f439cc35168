from .ape_wrapper import APE
from .defaults import DefaultPredictor, default_argument_parser
from .optimizer import build_optimizer, lr_multiplier_tree, multistep_schedule
from .train_step import TrainState, create_train_state, make_train_step
from .trainer import Trainer, inference_on_dataset
