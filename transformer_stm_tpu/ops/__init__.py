"""Functional neural-net ops with reference-parity semantics.

Each op is a pair of pure functions:
    init_*(key, ...) -> params (a pytree of jnp arrays)
    *(params, x, ...) -> y
Stateful ops (BatchNorm) additionally thread a `state` pytree.
"""

from .common import (  # noqa: F401
    glorot_uniform,
    same_padding,
    conv2d, init_conv2d,
    depthwise_conv2d, init_depthwise_conv2d,
    dense, init_dense,
    layer_norm, init_layer_norm,
    batch_norm, init_batch_norm,
    avg_pool_same,
    gelu, dropout,
)
from .projection import init_projection, projection  # noqa: F401
from .attention import (  # noqa: F401
    init_mha, mha, init_conv_attention, conv_attention,
)
from .conv_embed import init_conv_embed, conv_embed  # noqa: F401
from .blocks import (  # noqa: F401
    init_mlp, mlp, init_conv_transformer_block, conv_transformer_block,
)
