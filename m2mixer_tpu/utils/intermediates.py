"""Export per-modality intermediate vectors + correctness labels.

Re-expresses the reference's ``intermediate_step``
(`/root/reference/models/avmnist.py:424-444`) plus the offline step that
writes the ``corrects_data`` layout consumed by
``AVMnistIntermediateDataModule`` (`/root/reference/datasets/avmnist.py:
193-261`): per split, flattened encoder token outputs for each branch and
binary "was this branch's prediction correct" labels — the training corpus
for the post-hoc confidence probe (``AVMnistMixerMultiLossTP``).
"""

from __future__ import annotations

import os
from typing import Dict

import jax
import numpy as np

__all__ = ["export_intermediates"]


def export_intermediates(task, params, datamodule, out_dir: str) -> Dict[str, int]:
    """Run the trained MultiLoss model over train/test and write the
    corrects_data layout. Returns per-split sample counts."""
    from ..modules.lora import resolve_lora

    eval_step = jax.jit(lambda p, b, ctx: task.step(p, b, ctx, {}, train=False))
    net_apply = jax.jit(
        lambda p, inputs: task.network.apply(
            resolve_lora(p), inputs=inputs, deterministic=True)
    )
    counts = {}
    for split, batches in (("train", datamodule.train_batches),
                           ("test", datamodule.test_batches)):
        root = os.path.join(out_dir, split)
        os.makedirs(root, exist_ok=True)
        ctx = {k: np.asarray(v) for k, v in task.make_ctx(0, "test").items()}
        vecs = {m: [] for m in (*task.modalities, "fusion")}
        corrects = {m: [] for m in (*task.modalities, "fusion")}
        for batch in batches():
            inputs = task.network_inputs(batch)["inputs"]
            outputs = net_apply(params, inputs)
            _, aux = eval_step(params, batch, ctx)
            labels = np.asarray(aux["labels"])
            encs = [np.asarray(e) for e in outputs["encodings"]]
            fused = np.asarray(outputs["fusion_tokens"])
            for i, m in enumerate(task.modalities):
                vecs[m].append(encs[i].reshape(len(labels), -1))
                corrects[m].append(
                    (np.asarray(aux[f"preds_{m}"]) == labels).astype(np.int64)
                )
            vecs["fusion"].append(fused.reshape(len(labels), -1))
            corrects["fusion"].append((np.asarray(aux["preds"]) == labels).astype(np.int64))
        n = 0
        for m in vecs:
            v = np.concatenate(vecs[m])
            c = np.concatenate(corrects[m])
            n = len(v)
            np.save(os.path.join(root, f"{m}_vectors.npy"), v)
            np.save(os.path.join(root, f"{m}_corrects.npy"), c)
        counts[split] = n
        print(f"[intermediates] {split}: {n} samples -> {root}")
    return counts
