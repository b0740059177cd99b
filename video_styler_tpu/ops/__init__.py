from .basic import (
    linear,
    layer_norm,
    rms_norm,
    gelu_tanh,
    silu,
    modulate,
    sinusoidal_embedding_1d,
    init_linear,
    init_layer_norm,
    init_rms_norm,
)
from .rope import precompute_freqs_3d, assemble_freqs_grid, rope_apply
from .attention import sdpa, attention
