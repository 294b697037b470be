from pcdms_tpu.eval.metrics import (
    compare_psnr, compare_ssim, compare_l1, compare_mae,
    ReconstructionMetrics, FID, frechet_distance,
    preprocess_path_for_deform_task, cosine_similarity,
)
