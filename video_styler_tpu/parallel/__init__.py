from .mesh import make_mesh, local_device_count
from .context import ShardingContext, use_sharding, current_sharding, constrain
from .fsdp import shard_params_fsdp, replicate_params
from .ulysses import ulysses_attention
from .distributed import (
    initialize as initialize_distributed, is_distributed, is_main_process,
    make_global_mesh, sync_processes, broadcast_object)
