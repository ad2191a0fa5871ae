from .export import (
    export_program,
    load_program,
    export_cfg_sampler,
    load_cfg_sampler,
    export_vq_codec,
    load_vq_codec,
)

__all__ = [
    "export_program",
    "load_program",
    "export_cfg_sampler",
    "load_cfg_sampler",
    "export_vq_codec",
    "load_vq_codec",
]
