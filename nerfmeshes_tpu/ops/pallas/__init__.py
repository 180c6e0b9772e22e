from nerfmeshes_tpu.ops.pallas.fused_mlp import (
    MLPSpec,
    fused_flexible_apply,
    fused_mlp_infer,
    fused_mlp_train,
    spec_from_model,
    supports_fused,
)

__all__ = [
    "MLPSpec",
    "fused_flexible_apply",
    "fused_mlp_infer",
    "fused_mlp_train",
    "spec_from_model",
    "supports_fused",
]
