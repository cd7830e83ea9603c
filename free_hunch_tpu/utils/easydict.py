"""Attribute-style dict used throughout the config/driver layers.

Parity: reference ``config_utils.py:7-20`` / ``dnnlib/util.py:37``.
"""
from typing import Any


class EasyDict(dict):
    """dict subclass that exposes keys as attributes."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name) from None

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]
