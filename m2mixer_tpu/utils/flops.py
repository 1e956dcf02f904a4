"""FLOPs accounting shared by ``bench.py`` and the trainer's MFU meter.

The reference has no utilization reporting at all; here MFU (model FLOPs
utilization — achieved model FLOPs/s over the chip's bf16 MXU peak) is a
first-class observable: ``bench.py`` prints it for the headline, and
``train.log_mfu: true`` logs ``train_mfu`` per epoch for ANY model family by
asking XLA itself for the compiled step's FLOPs (``Compiled.cost_analysis``)
instead of relying on a hand-derived formula.
"""

from __future__ import annotations

from typing import Optional

import jax

__all__ = ["peak_flops", "compiled_step_flops"]

# bf16 MXU peak per chip, by device_kind prefix (jax.Device.device_kind)
_PEAK_BF16 = {
    "TPU v4": 275e12,
    "TPU v5 lite": 197e12,  # v5e
    "TPU v5": 459e12,       # v5p (checked after the 'lite' prefix)
    "TPU v6 lite": 918e12,  # v6e / Trillium
}


def peak_flops(device) -> float:
    kind = getattr(device, "device_kind", "")
    for prefix in ("TPU v5 lite", "TPU v6 lite", "TPU v5", "TPU v4"):
        if kind.startswith(prefix):
            return _PEAK_BF16[prefix]
    return 197e12  # conservative default: v5e


def compiled_step_flops(jitted, *abstract_args) -> Optional[float]:
    """Total FLOPs of one invocation of ``jitted`` per XLA's cost model.

    ``abstract_args``: ``jax.ShapeDtypeStruct`` trees (shapes only — no
    data, no execution). Lowering + compiling a shape already compiled by
    the live jit path is nearly free through the persistent compile cache.
    Returns None when the backend's cost analysis has no flops entry.
    """
    try:
        compiled = jitted.lower(*abstract_args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):  # older jax: one dict per module
            cost = cost[0] if cost else {}
        flops = float(cost.get("flops", -1.0))
        return flops if flops > 0 else None
    except Exception:
        return None
