"""L3 task-model registry (parity: `/root/reference/models/__init__.py`).

``get_model(name)`` resolves the config's ``model.type`` string. Unlike the
reference, the memotion and pnlp models ARE registered (the reference omits
their imports — a latent registry bug noted in SURVEY.md §2.2; fixed here).
"""

from __future__ import annotations

import sys

from .avmnist import *  # noqa: F401,F403
from .avmnist_post import *  # noqa: F401,F403
from .base import MultiLossTask, TrainTask  # noqa: F401
from .memotion import *  # noqa: F401,F403
from .mimic import *  # noqa: F401,F403
from .mmhs150 import *  # noqa: F401,F403
from .mmimdb import *  # noqa: F401,F403
from .mosi import *  # noqa: F401,F403
from .multioff import *  # noqa: F401,F403
from .pnlp import *  # noqa: F401,F403


def get_model(model_type: str):
    return getattr(sys.modules[__name__], model_type)
