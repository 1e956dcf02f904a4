"""L1 building blocks + the three string registries.

The reference resolves blocks/fusions/classifiers by name from config
strings (`/root/reference/modules/__init__.py:12-26`), and every component
tolerates extra kwargs. Here the registries filter the config kwargs to the
target's accepted fields (flax modules are dataclasses), which preserves the
"accepts and ignores extras" contract while keeping the modules themselves
strictly typed. List-valued config fields are coerced to tuples so flax
static fields stay hashable.
"""

from __future__ import annotations

import dataclasses
import inspect
import sys

from .mixer import *  # noqa: F401,F403
from .gmlp import *  # noqa: F401,F403
from .dynamixer import *  # noqa: F401,F403
from .fusion import *  # noqa: F401,F403
from .classification import *  # noqa: F401,F403
from .mlp import *  # noqa: F401,F403
from .recurrent import *  # noqa: F401,F403
from .losses import *  # noqa: F401,F403
from .pallas_blocks import *  # noqa: F401,F403
from .paired import *  # noqa: F401,F403
from .stacked import *  # noqa: F401,F403
from .pipelined import *  # noqa: F401,F403
from .moe import *  # noqa: F401,F403

from . import mixer, gmlp, dynamixer, fusion, classification, mlp, recurrent, losses, pallas_blocks, paired, stacked, pipelined, moe  # noqa: F401


def _tuplify(v):
    if isinstance(v, list):
        return tuple(_tuplify(x) for x in v)
    return v


def build_component(cls, **kwargs):
    """Instantiate ``cls`` with only the kwargs it accepts.

    flax modules are dataclasses → filter on field names; plain classes
    (parameter-free fusions) typically take ``**kwargs`` already.
    """
    if dataclasses.is_dataclass(cls):
        names = {f.name for f in dataclasses.fields(cls) if f.init}
        accepted = {k: _tuplify(v) for k, v in kwargs.items() if k in names}
        return cls(**accepted)
    sig = inspect.signature(cls.__init__)
    has_var_kw = any(p.kind is inspect.Parameter.VAR_KEYWORD for p in sig.parameters.values())
    if has_var_kw:
        return cls(**kwargs)
    names = set(sig.parameters) - {"self"}
    return cls(**{k: _tuplify(v) for k, v in kwargs.items() if k in names})


def get_block_by_name(**kwargs):
    """Resolve ``kwargs['block_type']`` to a block instance
    (parity: `/root/reference/modules/__init__.py:12-15`)."""
    cls = getattr(sys.modules[__name__], kwargs["block_type"])
    return build_component(cls, **kwargs)


def get_fusion_by_name(**kwargs):
    """Resolve ``kwargs['fusion_function']`` to a fusion instance
    (parity: `/root/reference/modules/__init__.py:18-21`)."""
    cls = getattr(sys.modules[__name__], kwargs["fusion_function"])
    return build_component(cls, **kwargs)


def get_classifier_by_name(**kwargs):
    """Resolve ``kwargs['classifier']`` to a classifier head instance
    (parity: `/root/reference/modules/__init__.py:23-26`)."""
    cls = getattr(sys.modules[__name__], kwargs["classifier"])
    return build_component(cls, **kwargs)
