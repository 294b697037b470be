from pcdms_tpu.models.unet2d import UNetConfig, unet_init, unet_apply
from pcdms_tpu.models.prior_transformer import (
    PriorConfig, prior_init, prior_apply, prior_post_process_latents,
)
from pcdms_tpu.models.projections import (
    image_proj_mlp_init, image_proj_mlp_apply,
    pose_cond_embedding_init, pose_cond_embedding_apply,
)
