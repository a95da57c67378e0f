"""Minimal omegaconf stand-in for running the reference scripts unmodified.

Only what the reference uses: ``OmegaConf.load(path)`` returning an
attribute-accessible config, plus ``.get``. Not a general implementation.
"""

from __future__ import annotations

from typing import Any


class _Node(dict):
    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get(self, name: str, default: Any = None) -> Any:  # noqa: A003
        return super().get(name, default)


def _wrap(obj: Any) -> Any:
    if isinstance(obj, dict):
        return _Node({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return obj


class OmegaConf:
    @staticmethod
    def load(path) -> _Node:
        # Reuse nerfjax's from-scratch YAML+interpolation loader.
        from nerfjax.config import load_config

        return _wrap(load_config(path).to_dict())

    @staticmethod
    def create(obj: dict) -> _Node:
        return _wrap(obj)

    @staticmethod
    def to_container(cfg, resolve: bool = True) -> dict:
        return dict(cfg)


DictConfig = _Node
