"""Config system: YAML with recursive ``_base_`` merge + string registries.

Collapses the reference's three overlapping mechanisms (argparse + raw-yaml
DotDict + EasyDict ``_base_`` merge + pickled namespaces, SURVEY.md §5.6)
into one: YAML files (same keys as the reference's cfgs/) loaded into an
attribute-dict, and registries mapping config NAMEs to builders.
"""

from gm3d_tpu.config.config import ConfigDict, cfg_from_yaml_file, merge_new_config
from gm3d_tpu.config.registry import Registry, MODELS, DATASETS, build_model_from_cfg

__all__ = [
    "ConfigDict",
    "cfg_from_yaml_file",
    "merge_new_config",
    "Registry",
    "MODELS",
    "DATASETS",
    "build_model_from_cfg",
]
