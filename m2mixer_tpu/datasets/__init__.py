"""L2 data-module registry (parity: `/root/reference/datasets/__init__.py`).

Unlike the reference, the Memotion data module IS registered (the reference
omits its import — SURVEY.md §2.4; fixed here).
"""

from __future__ import annotations

import sys

from .avmnist import *  # noqa: F401,F403
from .base import ArrayDataModule, DataModule  # noqa: F401


def get_data_module(data_type: str):
    return getattr(sys.modules[__name__], data_type)
