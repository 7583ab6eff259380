"""Entry-point plugin discovery for methods and dataparsers.

The reference extends nerfstudio by registering into its entry-point
groups (`nerfstudio.method_configs` / `nerfstudio.dataparser_configs`,
reference pyproject.toml:27-46). This framework is the host instead of a
plugin, so it exposes the same extension mechanism under its own groups:
third-party packages add

    [project.entry-points."dnsplatter_tpu.methods"]
    my-method = "my_pkg.presets:MY_PRESET"      # dict of ModelConfig overrides

    [project.entry-points."dnsplatter_tpu.dataparsers"]
    my-format = "my_pkg.parser:parse"           # parse(cfg, split) callable

and `dnsplatter train my-method my-format --data ...` picks them up.
Built-in names always win: a plugin cannot hijack a registered method or
parser name (same policy as nerfstudio's plugin loader).
"""

from __future__ import annotations

import importlib.metadata as _md
import warnings
from typing import Callable, Dict, List, Optional

METHODS_GROUP = "dnsplatter_tpu.methods"
DATAPARSERS_GROUP = "dnsplatter_tpu.dataparsers"

# Names that load_group itself put into a registry, keyed by registry id:
# a second discovery pass (e.g. get_parser called again, or cmd_train's
# eager load plus the lazy path) must not mistake an already-loaded
# plugin for a built-in and emit a misleading "shadows a built-in"
# warning.
_plugin_loaded: Dict[int, set] = {}


def iter_entry_points(group: str) -> List:
    """All installed entry points in `group` (portable across the
    pre-/post-3.10 `entry_points()` APIs)."""
    try:
        return list(_md.entry_points(group=group))
    except TypeError:  # legacy dict-returning API
        return list(_md.entry_points().get(group, []))


def load_group(
    group: str,
    registry: Dict[str, object],
    transform: Optional[Callable[[object], object]] = None,
) -> None:
    """Merge entry points from `group` into `registry` in place.

    Existing (built-in) names are never overridden. A plugin that fails
    to import or validate is skipped with a warning rather than breaking
    the CLI for every other method.
    """
    loaded = _plugin_loaded.setdefault(id(registry), set())
    loaded.intersection_update(registry)  # drop names removed since
    for ep in iter_entry_points(group):
        if ep.name in registry:
            if ep.name not in loaded:  # genuine built-in collision
                warnings.warn(
                    f"plugin {ep.name!r} in {group} shadows a built-in "
                    "name; ignored"
                )
            continue
        try:
            obj = ep.load()
            registry[ep.name] = transform(obj) if transform else obj
            loaded.add(ep.name)
        except Exception as exc:  # plugin bugs must not kill the host CLI
            warnings.warn(f"failed to load plugin {ep.name!r} ({group}): {exc}")
