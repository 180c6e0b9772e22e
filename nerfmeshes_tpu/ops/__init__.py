from nerfmeshes_tpu.ops.math import cumprod_exclusive, img2mse, mse2psnr, ssim
from nerfmeshes_tpu.ops.encoding import (
    frequency_bands,
    positional_encoding,
    positional_encoding_output_size,
)
from nerfmeshes_tpu.ops.rays import get_ray_bundle, intervals_to_ray_points, ndc_rays
from nerfmeshes_tpu.ops.sampling import (
    hierarchical_intervals,
    ray_sample_interval,
    sample_pdf,
)
from nerfmeshes_tpu.ops.render import RenderOutput, density_weights, volume_render
from nerfmeshes_tpu.ops.depth_sampling import depth_guided_intervals

__all__ = [
    "density_weights",
    "depth_guided_intervals",
    "cumprod_exclusive",
    "img2mse",
    "mse2psnr",
    "ssim",
    "frequency_bands",
    "positional_encoding",
    "positional_encoding_output_size",
    "get_ray_bundle",
    "intervals_to_ray_points",
    "ndc_rays",
    "hierarchical_intervals",
    "ray_sample_interval",
    "sample_pdf",
    "RenderOutput",
    "volume_render",
]
