from nerfmeshes_tpu.config.cfgnode import CfgNode, flatten_dict, nest_dict
from nerfmeshes_tpu.config.schema import get_default_cfg, load_config

__all__ = ["CfgNode", "flatten_dict", "nest_dict", "get_default_cfg", "load_config"]
