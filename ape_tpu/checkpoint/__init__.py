from .checkpointer import Checkpointer, PeriodicCheckpointer
from .convert import convert_torch_state_dict, flatten_tree, load_params_tolerant, unflatten_tree
