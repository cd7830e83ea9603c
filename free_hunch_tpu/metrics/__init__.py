from free_hunch_tpu.metrics.quality import psnr, ssim, lpips_fn  # noqa: F401
