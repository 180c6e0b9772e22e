from nerfmeshes_tpu.utils.logging import MetricsLogger, acronym

__all__ = ["MetricsLogger", "acronym"]
