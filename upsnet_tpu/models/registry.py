"""Model registry.

The reference resolves ``config.symbol`` via ``eval(config.symbol)()``
(stringly-typed, SURVEY.md §1 L2). Here: an explicit registry keyed by the
same symbol names (``resnet_50_upsnet``, ``resnet_101_upsnet``), so reference
experiment yamls resolve unchanged without eval().
"""

from __future__ import annotations

_REGISTRY: dict = {}


def register_model(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn

    return deco


def get_model(name: str, *args, **kwargs):
    if name not in _REGISTRY:
        # import side-effect registration
        import upsnet_tpu.models.upsnet  # noqa: F401
    if name not in _REGISTRY:
        raise KeyError(f"unknown model symbol {name!r}; have {sorted(_REGISTRY)}")
    return _REGISTRY[name](*args, **kwargs)
