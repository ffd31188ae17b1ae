from .convert import (convert_state_dict, load_params, nest, save_params,
                      verify_against_init)
from .unet_map import controlled_unet_name_map, trunk_name_map
from . import layout
