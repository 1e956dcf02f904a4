"""L2 data-module registry (parity: `/root/reference/datasets/__init__.py`).

Unlike the reference, the Memotion data module IS registered (the reference
omits its import — SURVEY.md §2.4; fixed here).
"""

from __future__ import annotations

import sys

from .avmnist import *  # noqa: F401,F403
from .base import ArrayDataModule, DataModule  # noqa: F401
from .imagenet import *  # noqa: F401,F403
from .lazy import LazyDataModule  # noqa: F401
from .memotion import *  # noqa: F401,F403
from .mimic import *  # noqa: F401,F403
from .mmhs150 import *  # noqa: F401,F403
from .mmimdb import *  # noqa: F401,F403
from .mosi import *  # noqa: F401,F403
from .multioff import *  # noqa: F401,F403
from .pnlp import *  # noqa: F401,F403


def get_data_module(data_type: str):
    return getattr(sys.modules[__name__], data_type)
