"""GradBlend loss-weight estimation (Wang et al., CVPR 2020).

Re-expresses ``/root/reference/modules/gradblend.py``: per modality, copy
encoder+head, train them for ``epochs`` on a 90% split with a fresh Adam,
measure overfitting ``O = dO_Nn - dO_N`` and generalization
``G = L_val_after - L_val_before``, weight ``w = |O / G^2|``; then the same
for the fused model with frozen unimodal encoders; normalize to sum 1.

The TPU-native shape: parameters are pytrees so "deepcopy the encoder" is
free (functional updates never alias), and the nested training loop reuses
ONE jitted step per branch — the expensive part (epochs x dataset sweeps)
runs entirely on device.
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = ["GradBlend", "estimate_gradblend_weights"]


class GradBlend:
    """Generic estimator.

    Parameters
    ----------
    branch_loss_fns : list of callables ``fn(params, batch, train, rng) -> loss``
        One per modality, plus ONE fused-branch callable appended last whose
        params exclude the (frozen) unimodal encoders.
    branch_params : list of matching parameter pytrees (copied by value).
    """

    def __init__(self, branch_loss_fns: List[Callable], branch_params: List,
                 epochs: int = 20, learning_rate: float = 1e-3):
        assert len(branch_loss_fns) == len(branch_params)
        self.branch_loss_fns = branch_loss_fns
        self.branch_params = branch_params
        self.epochs = epochs
        self.learning_rate = learning_rate

    def _make_steps(self, loss_fn):
        opt = optax.adam(self.learning_rate)

        @jax.jit
        def train_step(params, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(lambda p: loss_fn(p, batch, True, rng))(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def eval_loss(params, batch):
            return loss_fn(params, batch, False, None)

        return opt, train_step, eval_loss

    def _sum_loss(self, eval_loss, params, batches) -> float:
        # reference sums batch losses over the loader (`gradblend.py:52-59`)
        total = 0.0
        for batch in batches():
            total += float(eval_loss(params, batch))
        return total

    def get_weights(self, train_batches: Callable[[], Iterable],
                    val_batches: Callable[[], Iterable], rng) -> np.ndarray:
        weights = []
        for fn, params in zip(self.branch_loss_fns, self.branch_params):
            opt, train_step, eval_loss = self._make_steps(fn)
            params = jax.tree.map(jnp.asarray, params)
            opt_state = opt.init(params)
            l_n_train = self._sum_loss(eval_loss, params, train_batches)
            l_n_val = self._sum_loss(eval_loss, params, val_batches)
            step = 0
            for _ in range(self.epochs):
                for batch in train_batches():
                    params, opt_state, _ = train_step(params, opt_state, batch,
                                                      jax.random.fold_in(rng, step))
                    step += 1
            l_nn_train = self._sum_loss(eval_loss, params, train_batches)
            l_nn_val = self._sum_loss(eval_loss, params, val_batches)
            o_n = l_n_val - l_n_train
            o_nn = l_nn_val - l_nn_train
            o = o_nn - o_n
            g = l_nn_val - l_n_val
            weights.append(abs(o / (g * g + 1e-12)))
        w = np.asarray(weights, np.float64)
        return (w / w.sum()).astype(np.float32)


def estimate_gradblend_weights(task, trainer) -> Optional[np.ndarray]:
    """Adapter wiring GradBlend into a MultiLossTask + Trainer.

    Builds per-branch loss closures over the task's network submodules and a
    90/10 split of the training set (`/root/reference/models/avmnist.py:
    223-229`), then returns weights ordered like ``task.loss_names``.
    """
    datamodule = trainer.datamodule
    if datamodule is None or trainer.params is None:
        return None
    net = task.network
    params = trainer.params["params"]
    n_mod = len(task.modalities)

    import copy

    split = getattr(datamodule, "splits", None)
    if split is None or "train" not in split:
        return None
    train_arrays = split["train"]
    n = len(next(iter(train_arrays.values())))
    cut = int(n * 0.1)
    bs = datamodule.batch_size

    def make_batches(lo, hi):
        def gen():
            for start in range(lo, hi, bs):
                stop = min(start + bs, hi)
                yield {k: v[start:stop] for k, v in train_arrays.items()}

        return gen

    gb_train = make_batches(cut, n)
    gb_val = make_batches(0, cut)

    branch_fns, branch_params = [], []
    modality_keys = task.gradblend_modality_keys()

    for i in range(n_mod):
        enc, head = net.encoders[i], net.heads[i]
        key = modality_keys[i]

        def fn(p, batch, train, rng, enc=enc, head=head, key=key):
            rngs = {"dropout": rng, "stochastic": rng} if train and rng is not None else None
            feats = enc.apply({"params": p["enc"]}, batch[key], not train, rngs=rngs)
            if feats.ndim > 2:
                feats = feats.reshape(feats.shape[0], -1, feats.shape[-1]).mean(axis=1)
            logits = head.apply({"params": p["head"]}, feats)
            return task.gradblend_loss(logits, batch)

        branch_fns.append(fn)
        branch_params.append({
            "enc": copy.deepcopy(params[f"encoders_{i}"]),
            "head": copy.deepcopy(params[f"heads_{i}"]),
        })

    # fused branch: frozen unimodal encoders, trainable fusion mixer + head.
    # like the reference's MultiModalEncoder (`gradblend.py:9-21`), encodings
    # are rank-harmonized (unsqueeze at axis 1) and concatenated on axis 1 —
    # NOT run through the task's fusion_function.
    frozen_enc_params = [params[f"encoders_{i}"] for i in range(n_mod)]
    mixer_field = "fusion_mixer" if hasattr(net, "fusion_mixer") else "fusion_encoder"
    mixer_mod = getattr(net, mixer_field)

    def fused_fn(p, batch, train, rng):
        rngs = {"dropout": rng, "stochastic": rng} if train and rng is not None else None
        encs = [
            net.encoders[i].apply({"params": frozen_enc_params[i]}, batch[modality_keys[i]], not train)
            for i in range(n_mod)
        ]
        max_rank = max(e.ndim for e in encs)
        encs = [e[:, None] if e.ndim < max_rank else e for e in encs]
        fused = jnp.concatenate(encs, axis=1)
        tokens = mixer_mod.apply({"params": p["mixer"]}, fused, not train, rngs=rngs)
        if tokens.ndim > 2:
            tokens = tokens.reshape(tokens.shape[0], -1, tokens.shape[-1]).mean(axis=1)
        logits = net.classifier.apply({"params": p["cls"]}, tokens) if hasattr(
            net.classifier, "apply"
        ) else net.classifier(tokens)
        return task.gradblend_loss(logits, batch)

    branch_fns.append(fused_fn)
    branch_params.append({
        "mixer": copy.deepcopy(params[mixer_field]),
        "cls": copy.deepcopy(params["classifier"]),
    })

    gb = GradBlend(branch_fns, branch_params)
    rng = jax.random.PRNGKey(trainer.seed + 17)
    w = gb.get_weights(gb_train, gb_val, rng)
    print(f"[gradblend] weights (order {task.loss_names}): {w}")
    return w
