from nerfmeshes_tpu.train.optim import build_optimizer, build_schedule
from nerfmeshes_tpu.train.render import RenderSettings, render_rays
from nerfmeshes_tpu.train.step import (
    TrainState,
    init_train_state,
    make_render_chunk,
    make_train_step,
    render_image,
)
from nerfmeshes_tpu.train.system import NeRFSystem, create_models, init_params

__all__ = [
    "build_optimizer",
    "build_schedule",
    "RenderSettings",
    "render_rays",
    "TrainState",
    "init_train_state",
    "make_render_chunk",
    "make_train_step",
    "render_image",
    "NeRFSystem",
    "create_models",
    "init_params",
]
