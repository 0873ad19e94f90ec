from .mesh import make_mesh, sam_param_shardings, shard_params
