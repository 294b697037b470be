from pcdms_tpu.nn.layers import (
    linear_init, linear_apply,
    conv2d_init, conv2d_apply,
    layer_norm_init, layer_norm_apply,
    group_norm_init, group_norm_apply,
    timestep_sinusoidal_embedding,
    timestep_embedding_init, timestep_embedding_apply,
    gelu, silu,
)
from pcdms_tpu.nn.transformer import (
    feed_forward_init, feed_forward_apply,
    attention_init, attention_apply,
    transformer_block_init, transformer_block_apply,
)
