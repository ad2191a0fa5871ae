from .export import (
    export_program,
    load_program,
    export_cfg_sampler,
    load_cfg_sampler,
)

__all__ = [
    "export_program",
    "load_program",
    "export_cfg_sampler",
    "load_cfg_sampler",
]
