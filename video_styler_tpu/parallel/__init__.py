from .mesh import make_mesh, local_device_count
from .context import ShardingContext, use_sharding, current_sharding, constrain
from .fsdp import shard_params_fsdp, replicate_params
from .ulysses import ulysses_attention
