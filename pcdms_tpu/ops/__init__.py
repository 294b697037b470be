from pcdms_tpu.ops.flash_attention import (
    attention_reference, flash_attention, flash_attention_packed,
)
from pcdms_tpu.ops.fused_conv import fits_fused_conv, gn_silu_conv3x3
