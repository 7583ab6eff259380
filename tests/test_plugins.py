"""Plugin registration + packaging surface.

The reference extends nerfstudio via entry points (reference
pyproject.toml:27-46); this framework hosts the equivalent groups
(`dnsplatter_tpu.methods`, `dnsplatter_tpu.dataparsers`) and ships the
console scripts itself. These tests fake installed entry points by
patching the discovery helper.
"""

import dataclasses
from pathlib import Path

import pytest

try:  # pyproject declares requires-python >= 3.10; tomllib is 3.11+
    import tomllib
except ImportError:  # pragma: no cover - exercised on 3.10 only
    tomllib = pytest.importorskip("tomli")

from dnsplatter_tpu import configs
from dnsplatter_tpu.utils import plugins

REPO = Path(__file__).resolve().parents[1]


class _EP:
    def __init__(self, name, obj):
        self.name = name
        self.value = f"fake.module:{name}"
        self._obj = obj

    def load(self):
        if isinstance(self._obj, Exception):
            raise self._obj
        return self._obj


@pytest.fixture
def fake_eps(monkeypatch):
    """Install a controllable entry-point table; restore registries."""
    table = {}
    monkeypatch.setattr(
        plugins, "iter_entry_points", lambda group: table.get(group, [])
    )
    before_methods = dict(configs.METHOD_PRESETS)
    from dnsplatter_tpu.data import parsers

    before_parsers = dict(parsers.PARSERS)
    yield table
    configs.METHOD_PRESETS.clear()
    configs.METHOD_PRESETS.update(before_methods)
    parsers.PARSERS.clear()
    parsers.PARSERS.update(before_parsers)


def test_method_plugin_registers_and_builds_config(fake_eps):
    fake_eps[plugins.METHODS_GROUP] = [
        _EP("my-method", dict(regularization_strategy="ags-mesh",
                              depth_lambda=0.5)),
        # callables returning a preset are accepted too
        _EP("my-callable", lambda: dict(depth_lambda=0.25)),
    ]
    configs.load_method_plugins()
    cfg = configs.model_config_for_method("my-method")
    assert cfg.regularization_strategy == "ags-mesh"
    assert cfg.depth_lambda == 0.5
    assert configs.model_config_for_method("my-callable").depth_lambda == 0.25


def test_method_plugin_cannot_shadow_builtin(fake_eps):
    fake_eps[plugins.METHODS_GROUP] = [
        _EP("dn-splatter", dict(depth_lambda=99.0))
    ]
    with pytest.warns(UserWarning, match="shadows a built-in"):
        configs.load_method_plugins()
    assert configs.model_config_for_method("dn-splatter").depth_lambda != 99.0


def test_broken_method_plugin_is_skipped(fake_eps):
    fake_eps[plugins.METHODS_GROUP] = [
        _EP("boom", ImportError("missing dep")),
        _EP("bad-fields", dict(not_a_model_field=1)),
        _EP("ok", dict(depth_lambda=0.3)),
    ]
    with pytest.warns(UserWarning, match="failed to load plugin"):
        configs.load_method_plugins()
    assert "boom" not in configs.METHOD_PRESETS
    assert "bad-fields" not in configs.METHOD_PRESETS
    assert configs.METHOD_PRESETS["ok"] == {"depth_lambda": 0.3}


def test_dataparser_plugin_discovered_on_unknown_name(fake_eps):
    from dnsplatter_tpu.data import parsers

    sentinel = lambda cfg, split: ("parsed", split)  # noqa: E731
    fake_eps[plugins.DATAPARSERS_GROUP] = [_EP("my-format", sentinel)]
    parse = parsers.get_parser("my-format")
    assert parse("cfg", "train") == ("parsed", "train")
    # builtins still resolve (and were not clobbered)
    assert parsers.get_parser("replica") is not sentinel


def test_unknown_parser_still_raises(fake_eps):
    from dnsplatter_tpu.data import parsers

    with pytest.raises(KeyError, match="unknown dataparser"):
        parsers.get_parser("no-such-format")


def test_pyproject_console_scripts_resolve():
    meta = tomllib.loads((REPO / "pyproject.toml").read_text())
    scripts = meta["project"]["scripts"]
    assert set(scripts) == {"dnsplatter", "gs-mesh"}
    import importlib

    for target in scripts.values():
        mod, attr = target.split(":")
        assert callable(getattr(importlib.import_module(mod), attr))
    # the plugin groups documented in utils/plugins.py match the constants
    assert plugins.METHODS_GROUP == "dnsplatter_tpu.methods"
    assert plugins.DATAPARSERS_GROUP == "dnsplatter_tpu.dataparsers"


def test_preset_dicts_are_copied(fake_eps):
    """Mutating a built config must not leak back into the registry."""
    fake_eps[plugins.METHODS_GROUP] = [_EP("m", dict(depth_lambda=0.1))]
    configs.load_method_plugins()
    cfg = configs.model_config_for_method("m", depth_lambda=0.7)
    assert cfg.depth_lambda == 0.7
    assert configs.METHOD_PRESETS["m"] == {"depth_lambda": 0.1}
