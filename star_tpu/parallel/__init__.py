from .mesh import (AXIS_CONTEXT, AXIS_DATA, AXIS_TENSOR, data_sharding,
                   make_mesh, replicated, single_device_mesh)
from .sharding import param_specs, shard_params, spec_for_path, TP_RULES
