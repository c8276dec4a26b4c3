"""Per-role network constructors.

Parity target: mmsr/models/networks.py (:4-76): define_net_g/_d/_map/
_extractor/_student/_teacher, each instantiating the class named in the
YAML block with the block's remaining kwargs (dynamical_instantiation,
networks.py:4-23) — here via the explicit ARCH_REGISTRY.
"""
from ..utils.registry import ARCH_REGISTRY
from . import archs  # noqa: F401  (populates the registry)


def _instantiate(opt_net):
    opt_net = dict(opt_net)
    cls = ARCH_REGISTRY.get(opt_net.pop('type'))
    kwargs = {k: v for k, v in opt_net.items() if v is not None}
    if isinstance(kwargs.get('dtype'), str):
        # mixed precision via YAML: e.g. ``dtype: bfloat16`` on any
        # network block (params stay float32; compute in bf16)
        import jax.numpy as jnp
        kwargs['dtype'] = jnp.dtype(kwargs['dtype'])
    return cls(**kwargs)


def define_net_g(opt):
    return _instantiate(opt['network_g'])


def define_net_d(opt):
    return _instantiate(opt['network_d'])


def define_net_map(opt):
    return _instantiate(opt['network_map'])


def define_net_extractor(opt):
    return _instantiate(opt['network_extractor'])


def define_net_student(opt):
    return _instantiate(opt['network_student'])


def define_net_teacher(opt):
    return _instantiate(opt['network_teacher'])
