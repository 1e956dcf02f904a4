"""L3 task-model registry (parity: `/root/reference/models/__init__.py`).

``get_model(name)`` resolves the config's ``model.type`` string. Unlike the
reference, the memotion and pnlp models ARE registered (the reference omits
their imports — a latent registry bug noted in SURVEY.md §2.2; fixed here).
"""

from __future__ import annotations

import sys

from .avmnist import *  # noqa: F401,F403
from .base import MultiLossTask, TrainTask  # noqa: F401


def get_model(model_type: str):
    return getattr(sys.modules[__name__], model_type)
