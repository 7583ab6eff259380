"""Dataparsers: one module per supported dataset format.

Registry mirrors the reference's nerfstudio DataParserSpecification entry
points (pyproject.toml:33-42): normal-nerfstudio, mushroom, scannetpp,
replica, nrgbd, coolermap, gsdf.
"""

from typing import Callable, Dict

PARSERS: Dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        PARSERS[name] = fn
        return fn

    return deco


def get_parser(name: str):
    # Import for side-effect registration.
    from dnsplatter_tpu.data.parsers import (  # noqa: F401
        coolermap,
        gsdf,
        normal_nerfstudio,
        nrgbd,
        replica,
    )

    try:
        from dnsplatter_tpu.data.parsers import mushroom, scannetpp  # noqa: F401
    except ImportError:
        pass
    if name not in PARSERS:
        # Third-party parsers via the dnsplatter_tpu.dataparsers
        # entry-point group (reference registers its parsers into
        # nerfstudio.dataparser_configs, pyproject.toml:33-42).
        from dnsplatter_tpu.utils.plugins import DATAPARSERS_GROUP, load_group

        load_group(DATAPARSERS_GROUP, PARSERS)
    if name not in PARSERS:
        raise KeyError(f"unknown dataparser {name!r}; have {sorted(PARSERS)}")
    return PARSERS[name]
