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
    branch_loss_fns : list of callables
        ``fn(params, static, batch, train, rng) -> loss`` — one per modality,
        plus ONE fused-branch callable appended last. ``static`` carries
        non-trained inputs (e.g. the fused branch's FROZEN unimodal encoder
        params) as a traced argument, so the jitted sub-steps built here can
        be reused across ``gb_update_freq`` invocations with fresh values and
        never retrace/recompile.
    """

    def __init__(self, branch_loss_fns: List[Callable],
                 epochs: int = 20, learning_rate: float = 1e-3):
        self.branch_loss_fns = branch_loss_fns
        self.epochs = epochs
        self.learning_rate = learning_rate
        # jitted steps are built ONCE per estimator; cache the estimator on
        # the task and every gb_update_freq re-estimation reuses them
        self._steps = [self._make_steps(fn) for fn in branch_loss_fns]

    def _make_steps(self, loss_fn):
        opt = optax.adam(self.learning_rate)

        @jax.jit
        def train_step(params, static, opt_state, batch, rng):
            loss, grads = jax.value_and_grad(
                lambda p: loss_fn(p, static, batch, True, rng))(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def eval_loss(params, static, batch):
            return loss_fn(params, static, batch, False, None)

        return opt, train_step, eval_loss

    def _sum_loss(self, eval_loss, params, static, batches) -> float:
        # reference sums batch losses over the loader (`gradblend.py:52-59`)
        total = 0.0
        for batch in batches():
            total += float(eval_loss(params, static, batch))
        return total

    def get_weights(self, branch_params: List, train_batches: Callable[[], Iterable],
                    val_batches: Callable[[], Iterable], rng,
                    branch_static: Optional[List] = None) -> np.ndarray:
        if branch_static is None:
            branch_static = [None] * len(branch_params)
        weights = []
        dev = jax.devices()[0]
        for (opt, train_step, eval_loss), params, static in zip(
                self._steps, branch_params, branch_static):
            # committed placement up front: the same jit cache entry then
            # serves both host-fed (pre-training) and jit-output
            # (post-training) parameter evaluations
            params = jax.device_put(jax.tree.map(jnp.asarray, params), dev)
            if static is not None:
                static = jax.device_put(jax.tree.map(jnp.asarray, static), dev)
            opt_state = jax.device_put(opt.init(params), dev)
            l_n_train = self._sum_loss(eval_loss, params, static, train_batches)
            l_n_val = self._sum_loss(eval_loss, params, static, val_batches)
            step = 0
            for _ in range(self.epochs):
                for batch in train_batches():
                    params, opt_state, _ = train_step(params, static, opt_state, batch,
                                                      jax.random.fold_in(rng, step))
                    step += 1
            l_nn_train = self._sum_loss(eval_loss, params, static, train_batches)
            l_nn_val = self._sum_loss(eval_loss, params, static, val_batches)
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
    if getattr(net, "paired_encoder", None) is not None:
        # the paired-encoder perf path stacks both encoders' params in one
        # subtree; GradBlend's per-modality sub-trainings need the modular
        # layout — run with model.paired_encoders=false when using gradblend
        print("[gradblend] paired_encoders is enabled; per-modality weight "
              "estimation is unavailable — keeping previous weights")
        return None
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
        # full batches only (drop-last): ONE batch shape per branch, so the
        # jitted sub-steps compile exactly once instead of once per ragged
        # tail shape (the reference's loaders include the tail; dropping
        # <=bs-1 of thousands of samples does not move the O/G^2 ratios)
        n_full = (hi - lo) // bs

        def gen():
            if n_full == 0:  # split smaller than a batch: keep the one batch
                yield {k: v[lo:hi] for k, v in train_arrays.items()}
                return
            for i in range(n_full):
                start = lo + i * bs
                yield {k: v[start : start + bs] for k, v in train_arrays.items()}

        return gen

    gb_train = make_batches(cut, n)
    gb_val = make_batches(0, cut)
    modality_keys = task.gradblend_modality_keys()
    mixer_field = "fusion_mixer" if hasattr(net, "fusion_mixer") else "fusion_encoder"

    # the estimator (and its jitted sub-steps) is built once per task and
    # reused by every gb_update_freq re-estimation — only the parameter
    # VALUES (fresh copies / current frozen encoders) change per call
    gb = getattr(task, "_gb_estimator", None)
    if gb is None:
        branch_fns = []
        for i in range(n_mod):
            enc, head = net.encoders[i], net.heads[i]
            key = modality_keys[i]

            def fn(p, static, batch, train, rng, enc=enc, head=head, key=key):
                rngs = {"dropout": rng, "stochastic": rng} if train and rng is not None else None
                feats = enc.apply({"params": p["enc"]}, batch[key], not train, rngs=rngs)
                if feats.ndim > 2:
                    feats = feats.reshape(feats.shape[0], -1, feats.shape[-1]).mean(axis=1)
                logits = head.apply({"params": p["head"]}, feats)
                return task.gradblend_loss(logits, batch)

            branch_fns.append(fn)

        # fused branch: frozen unimodal encoders (passed as ``static`` so the
        # cached jit sees fresh values without retracing), trainable fusion
        # mixer + head. Like the reference's MultiModalEncoder
        # (`gradblend.py:9-21`), encodings are rank-harmonized (unsqueeze at
        # axis 1) and concatenated on axis 1 — NOT via the task's
        # fusion_function.
        mixer_mod = getattr(net, mixer_field)

        def fused_fn(p, static, batch, train, rng):
            rngs = {"dropout": rng, "stochastic": rng} if train and rng is not None else None
            # frozen encoders still run in TRAIN mode during the fused-branch
            # sub-training (reference keeps them active, `gradblend.py:99-105`),
            # so they need the dropout rng when the model has dropout
            encs = [
                net.encoders[i].apply({"params": static[i]}, batch[modality_keys[i]],
                                      not train, rngs=rngs)
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
        gb = GradBlend(branch_fns, epochs=int(getattr(task, "gb_epochs", 20)))
        task._gb_estimator = gb

    # jax.device_get both copies (the reference deepcopies, `gradblend.py:
    # 27-31`) and normalizes placement to host numpy, so the cached jitted
    # steps see identical avals/shardings on every invocation (device-placed
    # params would otherwise carry epoch-dependent committed shardings and
    # grow the jit cache once per layout)
    branch_params = [
        {"enc": jax.device_get(params[f"encoders_{i}"]),
         "head": jax.device_get(params[f"heads_{i}"])}
        for i in range(n_mod)
    ]
    branch_params.append({
        "mixer": jax.device_get(params[mixer_field]),
        "cls": jax.device_get(params["classifier"]),
    })
    branch_static = [None] * n_mod + [
        tuple(jax.device_get(params[f"encoders_{i}"]) for i in range(n_mod))
    ]

    rng = jax.random.PRNGKey(trainer.seed + 17)
    w = gb.get_weights(branch_params, gb_train, gb_val, rng, branch_static)
    print(f"[gradblend] weights (order {task.loss_names}): {w}")
    return w
