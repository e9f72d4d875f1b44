"""Operator registry — name -> class, with whitelist filtering.

Reference parity: @OPERATOR_REGISTRY.register() + lazy discovery +
apply_whitelist (/root/reference/dataflow/utils/registry.py:85-206). Ours
is eager (the operator classes are plain Column-expression builders, no
heavy imports) and therefore simpler.
"""

from __future__ import annotations

from typing import Callable, Iterable, Type


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._obj_map: dict[str, Type] = {}
        self._aliases: dict[str, str] = {}
        self._whitelist: set[str] | None = None

    def register(self, name: str | None = None) -> Callable[[Type], Type]:
        def deco(cls: Type) -> Type:
            key = name or cls.__name__
            if key in self._obj_map and self._obj_map[key] is not cls:
                raise KeyError(f"{key!r} already registered in {self.name} registry")
            self._obj_map[key] = cls
            return cls

        return deco

    def alias(self, alias_name: str, target: str) -> None:
        """Register a reference-exact name for an engine operator so
        pipelines written against the reference resolve unchanged
        (e.g. 'KBCChunkGenerator' -> ChunkGenerator). Aliases resolve in
        get() but are not listed in keys() — one canonical name each."""
        self._aliases[alias_name] = target

    def get(self, name: str) -> Type:
        name = self._aliases.get(name, name)
        if name not in self._obj_map:
            raise KeyError(
                f"{name!r} not found in {self.name} registry; "
                f"known: {sorted(self._obj_map)[:20]}..."
            )
        if self._whitelist is not None and name not in self._whitelist:
            raise KeyError(f"{name!r} is registered but excluded by whitelist")
        return self._obj_map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map or name in self._aliases

    def keys(self) -> list[str]:
        ks = sorted(self._obj_map)
        if self._whitelist is not None:
            ks = [k for k in ks if k in self._whitelist]
        return ks

    def items(self):
        for k in self.keys():
            yield k, self._obj_map[k]

    def apply_whitelist(self, names: Iterable[str]) -> None:
        """Restrict visible operators (reference: registry.py:131-206)."""
        self._whitelist = set(names)

    def clear_whitelist(self) -> None:
        self._whitelist = None

    def describe(self, lang: str = "en") -> dict[str, str]:
        """Introspection surface for a WebUI/agent (reference:
        webui/operator_pipeline.py:48-130)."""
        return {k: cls.get_desc(lang) for k, cls in self.items()}


OPERATOR_REGISTRY = Registry("operator")


def get_operator(name: str, args: dict | None = None):
    """Instantiate a registered operator by name (reference:
    core/operator.py:17-28)."""
    cls = OPERATOR_REGISTRY.get(name)
    return cls(**(args or {}))
