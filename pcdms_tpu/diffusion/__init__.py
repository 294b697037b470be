from pcdms_tpu.diffusion.schedules import (
    NoiseSchedule, make_schedule, scaled_linear_betas,
    squaredcos_cap_v2_betas, sd21_schedule, prior_schedule,
    pred_to_x0, pred_to_eps,
)
from pcdms_tpu.diffusion.ddpm import (
    ddpm_add_noise, ddpm_velocity, sample_timesteps, offset_noise,
)
from pcdms_tpu.diffusion.ddim import ddim_timesteps, ddim_step_tables
from pcdms_tpu.diffusion.unclip import (
    unclip_timesteps, unclip_step_tables, unclip_clip_x0,
)
from pcdms_tpu.diffusion.unipc import (
    unipc_timesteps, unipc_coeffs, UniPCCoeffs, unipc_sample,
)
from pcdms_tpu.diffusion.guidance import apply_cfg, rescale_noise_cfg
