"""Task base classes: the TPU-native replacement for LightningModules.

The reference couples model, criteria, metrics, and training-loop hooks in
``AbstractTrainTestModule`` (`/root/reference/modules/train_test_module.py`)
and repeats a ~200-line "MultiLoss" recipe per task model. Here a task is a
thin object around a **pure step function**:

    step(params, batch, ctx, rngs, train) -> (loss, aux)

Everything the reference does with Python-side mutable state inside
``shared_step`` (modality muting, freezing, loss-weight schedules, SoftAdapt,
GradBlend) is split TPU-style:

- *traced* per-step state enters through ``ctx`` — a dict of scalars/vectors
  (epoch, loss_weights, frozen flag, mute code, random-mute flag) so the
  train step compiles once and never recompiles when the schedule changes;
- *host* logic (annealing, SoftAdapt weight refits, GradBlend sub-training)
  lives in epoch hooks that only mutate what goes into the next ``ctx``;
- muting randomness is drawn **inside** the jitted step from the 'mute' rng
  collection (the reference draws with ``np.random.choice`` per step,
  `/root/reference/models/avmnist.py:247-250`).

Freezing (`/root/reference/models/avmnist.py:314-324`) is a 0/1 mask over
parameter subtrees applied to both gradients and optimizer updates, switched
by the traced ``frozen`` flag — exactly "these params stop changing at epoch
N" without re-jitting or rebuilding optimizer state.
"""

from __future__ import annotations

import abc
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DictConfig
from ..modules.softadapt import LossWeightedSoftAdapt

MUTE_NONE = -1


def _config_uses_moe(model_cfg) -> bool:
    """True when any block_type in the model config names an MoE block."""

    def scan(node) -> bool:
        if isinstance(node, dict) or hasattr(node, "items"):
            for k, v in node.items():
                if k == "block_type" and "MoE" in str(v):
                    return True
                if scan(v):
                    return True
        return False

    try:
        return scan(model_cfg)
    except Exception:
        return False


def resolve_dtype(precision):
    """``model.precision`` -> compute dtype (params always stay float32).
    'bf16'/'bfloat16' selects bfloat16 compute for every block GEMM — the
    TPU-native mixed-precision policy; None/'f32' keeps float32."""
    if precision in ("bf16", "bfloat16"):
        return jnp.bfloat16
    if precision in (None, "f32", "float32", "fp32"):
        return None
    raise ValueError(f"Unknown precision: {precision}")


def pool_tokens(x: jnp.ndarray) -> jnp.ndarray:
    """``x.reshape(B, -1, D).mean(axis=1)`` — the per-modality head pooling
    used throughout the reference (e.g. `models/avmnist.py:267-272`)."""
    return x.reshape(x.shape[0], -1, x.shape[-1]).mean(axis=1)


class TrainTask(abc.ABC):
    """Contract between task models and the Trainer."""

    RNG_COLLECTIONS = ("dropout", "stochastic", "mute")
    #: whether this task family collects the MoE balance loss (see
    #: MultiLossTask.step); construction fails for MoE configs on tasks
    #: that would silently drop it
    _supports_moe = False
    #: flax variable collections updated in-step during training (e.g.
    #: ("batch_stats",) for true-BN fine-tuning). When non-empty, ``step``
    #: returns the refreshed collections under ``aux["_mutable_state"]`` and
    #: the trainer threads them into the variables for the next step.
    mutable_collections: Tuple[str, ...] = ()

    def __init__(self, model_cfg: DictConfig, optimizer_cfg: DictConfig, **kwargs):
        self.model_cfg = model_cfg
        self.optimizer_cfg = DictConfig(optimizer_cfg)
        self.scheduler_patience = self.optimizer_cfg.pop("scheduler_patience", 5)
        self.loss_pos_weight = self.optimizer_cfg.pop("loss_pos_weight", None)
        self.log_confusion_matrix = False
        # trace-time block flavors (measured TPU levers; see common.py).
        # Stored per task and re-asserted by bind_trace_flavors() at every
        # trace entry point, so a model's math follows ITS config even when
        # several tasks with different flavors live in one process.
        self._gelu_approximate = bool(model_cfg.get("approximate_gelu", False))
        self._bits_dropout = bool(model_cfg.get("bits_dropout", False))
        # MoE blocks sow a load-balance loss into the 'moe' collection;
        # detect statically from config block types so non-MoE tasks keep
        # their exact apply signature (modules/moe.py)
        # model.lora (beyond reference): parameter-efficient fine-tuning —
        # low-rank adapters in a 'lora' variable collection; the base tree
        # is frozen out of gradients AND optimizer state (modules/lora.py)
        lora_cfg = model_cfg.get("lora", None)
        if lora_cfg and not hasattr(lora_cfg, "get"):
            # `model.lora: true` — all defaults
            lora_cfg = {}
        if lora_cfg is not None and hasattr(lora_cfg, "get"):
            self.lora_rank = int(lora_cfg.get("rank", 8))
            self.lora_alpha = float(lora_cfg.get("alpha", self.lora_rank))
            self.lora_targets = tuple(lora_cfg.get("targets", []) or []) or None
            if self.lora_rank <= 0:
                raise ValueError(
                    f"model.lora.rank must be > 0 (got {self.lora_rank})")
        else:
            self.lora_rank, self.lora_alpha, self.lora_targets = 0, 0.0, None
        # model.qat (beyond reference): quantization-aware training —
        # eligible weight leaves fake-quantize (STE) inside the traced
        # forward with EXACTLY the serving PTQ math, so `serving export
        # --quantize <mode>` reproduces the trained eval forward
        # (modules/qat.py; applied in apply_network after the LoRA merge)
        from ..modules.qat import parse_qat_config

        self.qat_mode, self.qat_min_size, self.qat_group_size = \
            parse_qat_config(model_cfg.get("qat", None))
        # model.prune (beyond reference): gradual magnitude pruning — the
        # smallest-|w| fraction of eligible leaves zeroes inside the traced
        # forward, sparsity following a cubic epoch schedule carried by
        # ctx['epoch'] (modules/prune.py; applied in apply_network after the
        # LoRA merge and BEFORE QAT fake-quant — prune-then-quantize)
        from ..modules.prune import parse_prune_config

        (self.prune_final, self.prune_begin, self.prune_end,
         self.prune_min_size, self.prune_targets) = \
            parse_prune_config(model_cfg.get("prune", None))
        self._uses_moe = _config_uses_moe(model_cfg)
        if self._uses_moe and not self._supports_moe:
            raise ValueError(
                f"{type(self).__name__} does not support MoE blocks: the "
                "load-balance aux loss is collected and applied by the "
                "MultiLossTask family only — a task that bypassed it would "
                "silently train without the advertised regularizer. Use an "
                "MoE block under a MultiLoss task, or a dense block here.")
        self.moe_aux_weight = float(model_cfg.get("moe_aux_weight", 0.01))
        #: set by the trainer from ``train.distill`` (training/distill.py);
        #: when present, MultiLossTask.step blends a soft-target KD term
        self.distiller = None
        # model.label_smoothing (beyond reference): CE targets become
        # (1-eps)·one_hot + eps/K; BCE targets move toward 0.5. Consumed by
        # the task families through self.ce / self.bce
        self.label_smoothing = float(model_cfg.get("label_smoothing", 0.0))
        if not 0.0 <= self.label_smoothing < 1.0:
            raise ValueError("model.label_smoothing must be in [0, 1) "
                             f"(got {self.label_smoothing})")
        # model.focal_gamma (beyond reference, Lin et al. 2017): focal
        # modulation (1-p_t)^gamma on every CE/BCE head — the standard lever
        # for the imbalanced binary tasks (MMHS150/MultiOFF). Consumed
        # through self.ce / self.bce like label smoothing; the two levers
        # define conflicting target semantics, so combining is rejected.
        self.focal_gamma = float(model_cfg.get("focal_gamma", 0.0))
        if self.focal_gamma < 0:
            raise ValueError(
                f"model.focal_gamma must be >= 0 (got {self.focal_gamma})")
        if self.focal_gamma and self.label_smoothing:
            raise ValueError(
                "model.focal_gamma and model.label_smoothing cannot "
                "combine: focal scaling is defined on the hard true-class "
                "probability, smoothing redefines the targets. Pick one.")
        self.bind_trace_flavors()
        self.network = self.build_network()

    def bind_trace_flavors(self) -> None:
        """Point the trace-time GELU/dropout flavor switches at THIS task's
        config. Called at construction and again inside every jitted
        function right before the network traces (tracing runs this Python,
        so each compile picks up the owning task's flavors)."""
        from ..modules.common import set_bits_dropout, set_gelu_approximate

        set_gelu_approximate(self._gelu_approximate)
        set_bits_dropout(self._bits_dropout)

    # -- model -------------------------------------------------------------
    @abc.abstractmethod
    def build_network(self):
        """Return the flax module implementing the forward pass."""

    @abc.abstractmethod
    def step(self, params, batch, ctx, rngs, train: bool) -> Tuple[jnp.ndarray, Dict]:
        """Pure, jittable loss computation. Returns (total_loss, aux) where
        aux carries 'losses' (dict of scalars), 'preds', 'labels', and any
        extra arrays the task wants logged or dumped."""

    def init_params(self, rng, batch):
        self.bind_trace_flavors()
        rngs = {"params": rng}
        for name in self.RNG_COLLECTIONS:
            rng, sub = jax.random.split(rng)
            rngs[name] = sub
        # jit the whole init: eager init dispatches hundreds of tiny ops,
        # which is very slow through a remote-device tunnel
        init = jax.jit(
            lambda rngs, batch: self.network.init(
                rngs, **self.network_inputs(batch), deterministic=True
            )
        )
        variables = init(rngs, batch)
        if isinstance(variables, dict) and "moe" in variables:
            # sown MoE balance losses are per-step byproducts, not state:
            # drop them so they never enter params/checkpoints/optimizer
            variables = {k: v for k, v in variables.items() if k != "moe"}
        if self.lora_rank:
            from ..modules.lora import init_lora

            rng, lora_rng = jax.random.split(rng)
            variables = dict(variables)
            variables["lora"] = init_lora(
                lora_rng, variables["params"], self.lora_rank,
                self.lora_alpha, self.lora_targets)
        return variables

    @abc.abstractmethod
    def network_inputs(self, batch) -> Dict[str, Any]:
        """Map a batch dict to the network's call kwargs (minus rng/flags)."""

    # -- metrics -----------------------------------------------------------
    @abc.abstractmethod
    def setup_scores(self) -> List[Optional[Dict]]:
        """[train, val, test] dicts of metric accumulators (or Nones)."""

    # -- schedules / context -------------------------------------------------
    def make_ctx(self, epoch: int, mode: str) -> Dict[str, np.ndarray]:
        """Host-side per-step context; all values are traced arguments.
        'frozen' is consumed by the trainer's gradient/update masking even
        for tasks that never freeze (always 0 here)."""
        return {"epoch": np.float32(epoch), "frozen": np.float32(0.0)}

    def frozen_mask(self, params):
        """Pytree of 1.0 (trainable when frozen-flag set) / 0.0 (frozen).
        Default: nothing freezes."""
        return jax.tree.map(lambda _: 1.0, params)

    def trainable_mask(self, variables) -> Optional[Any]:
        """Static 0/1 pytree zeroing gradients/updates of NON-parameter
        collections (BN running stats etc.). Only the ``params`` collection
        is gradient-trained; returns None (no masking needed) when the
        variables hold nothing else. Without this, frozen-statistics BN
        means/vars would receive loss gradients and be silently
        Adam-updated as if they were weights.

        With a ``lora`` collection present the polarity flips: ONLY the
        adapter factors train (the merge scale stays fixed); the whole base
        tree is excluded from gradients and optimizer moments — the LoRA
        memory contract."""
        if isinstance(variables, dict) and "lora" in variables:
            from ..modules.lora import SCALE_KEY

            def lora_mask(path, _):
                top = getattr(path[0], "key", None) if path else None
                if top != "lora":
                    return 0.0
                leaf = getattr(path[-1], "key", None)
                return 0.0 if leaf == SCALE_KEY else 1.0

            return jax.tree_util.tree_map_with_path(lora_mask, variables)
        if isinstance(variables, dict) and set(variables) == {"params"}:
            return None

        def mask(path, _):
            top = getattr(path[0], "key", None) if path else None
            return 1.0 if top in (None, "params") else 0.0

        return jax.tree_util.tree_map_with_path(mask, variables)

    def ce(self, logits, labels, weight=None):
        """Task-level cross-entropy: plain CE plus the task's configured
        ``model.label_smoothing`` / ``model.focal_gamma``."""
        from ..modules.losses import cross_entropy_loss

        return cross_entropy_loss(logits, labels, weight=weight,
                                  label_smoothing=self.label_smoothing,
                                  focal_gamma=self.focal_gamma)

    def bce(self, logits, targets, pos_weight=None):
        """Task-level BCE-with-logits plus ``model.label_smoothing`` /
        ``model.focal_gamma``."""
        from ..modules.losses import bce_with_logits_loss

        return bce_with_logits_loss(logits, targets, pos_weight=pos_weight,
                                    label_smoothing=self.label_smoothing,
                                    focal_gamma=self.focal_gamma)

    def prune_sparsity(self, ctx):
        """Traced sparsity for this step (None when model.prune is off) —
        every task step passes this into apply_network so the schedule rides
        ctx['epoch'] without recompiles."""
        if not self.prune_final:
            return None
        from ..modules.prune import prune_schedule

        return prune_schedule(ctx["epoch"], self.prune_final,
                              self.prune_begin, self.prune_end)

    def apply_network(self, params, kwargs, rngs, train: bool,
                      prune_sparsity=None):
        """``network.apply`` with the task's rng/mutable plumbing: returns
        ``(outputs, new_state)`` where ``new_state`` is the refreshed
        mutable-collection dict (None unless training a task with
        ``mutable_collections``). Any ``lora`` collection is merged into the
        effective weights here — inside the trace — so every execution path
        (per-step, epoch scan, ensemble vmap, eval) sees the adapted model.
        ``prune_sparsity``: the traced model.prune sparsity from
        ``self.prune_sparsity(ctx)`` — required when pruning is on (a step
        that forgot to thread it would silently train dense)."""
        self.bind_trace_flavors()
        from ..modules.lora import resolve_lora

        params = resolve_lora(params)
        if self.prune_final and prune_sparsity is None:
            raise ValueError(
                f"{type(self).__name__}.step did not thread the model.prune "
                "sparsity into apply_network (pass prune_sparsity="
                "self.prune_sparsity(ctx)) — it would silently train dense.")
        if prune_sparsity is not None:
            from ..modules.prune import fake_prune

            params = fake_prune(params, prune_sparsity,
                                self.prune_min_size, self.prune_targets)
        if self.qat_mode:
            # fake-quantize AFTER the LoRA merge (QLoRA-style: adapter
            # gradients flow through the STE); latent weights stay f32 in
            # checkpoints/optimizer state — this is trace-time only
            from ..modules.qat import fake_quantize

            params = fake_quantize(params, self.qat_mode,
                                   self.qat_min_size, self.qat_group_size)
        apply_rngs = {k: v for k, v in rngs.items() if k != "mute"} if train else None
        mutable = list(self.mutable_collections)
        if train and self._uses_moe:
            # MoE blocks sow their load-balance losses here (modules/moe.py)
            mutable.append("moe")
        if train and mutable:
            out, new_state = self.network.apply(
                params, **kwargs, rngs=apply_rngs, mutable=mutable,
            )
            new_state = dict(new_state)
            moe = new_state.pop("moe", None)
            if moe is not None:
                if not isinstance(out, dict):
                    raise TypeError(
                        "MoE blocks sowed a balance loss but the network "
                        "output is not a dict — the aux loss would be "
                        "silently dropped (network outputs must be dicts "
                        "to carry _moe_aux)")
                leaves = jax.tree_util.tree_leaves(moe)
                out = dict(out, _moe_aux=sum(leaves) if leaves else jnp.float32(0.0))
            return out, (new_state or None)
        return self.network.apply(params, **kwargs, rngs=apply_rngs), None

    # -- host hooks ----------------------------------------------------------
    def on_train_epoch_start(self, trainer, epoch: int) -> None:
        pass

    def on_train_epoch_end(self, trainer, epoch: int, logs: Dict[str, float]) -> None:
        pass

    def on_validation_epoch_end(self, trainer, epoch: int, logs: Dict[str, float]) -> None:
        pass

    def epoch_log_keys(self) -> Sequence[str]:
        """aux['losses'] entries to average & log per epoch."""
        return ()

    def epoch_scalar_keys(self) -> Sequence[str]:
        """extra per-step scalar aux entries to average & log per epoch
        (e.g. the UQ model's uncertainties, `models/avmnist.py:556-572`)."""
        return ()

    def test_artifact_keys(self) -> Sequence[str]:
        """aux keys concatenated across test batches into test_preds.npz."""
        return ()


class MultiLossTask(TrainTask):
    """The shared multimodal multi-head-loss recipe.

    Concrete tasks define: ``modalities`` (branch names, fusion last is
    implicit), ``build_network``, ``branch_losses`` (per-branch criteria),
    ``predictions``. This class provides: loss-weight schedules (fixed /
    annealed / SoftAdapt / GradBlend), modality freezing, random muting, and
    the weighted-sum combine including the reference's x3 scaling rule for
    fixed weighting (`/root/reference/models/avmnist.py:290-291`).
    """

    #: branch names, e.g. ("image", "audio"); the fusion branch is implicit.
    modalities: Tuple[str, ...] = ()
    _supports_moe = True  # step() collects and applies the MoE balance loss
    _supports_distill = True  # step() blends the train.distill KD term
    #: fixed-weighting flavor per reference task family:
    #:   'fixed_scaled' — (w_f*l_f + ow*sum(l_i)) * n   (avmnist, `avmnist.py:290-291`)
    #:   'fixed'        —  w_f*l_f + ow*sum(l_i)        (mimic `mimic.py:115-121`, mmhs `mmhs150.py:106-107`)
    #:   'sum'          —  plain sum                    (mmimdb/multioff/memotion)
    weighting: str = "fixed_scaled"
    #: where fusion_loss_weight annealing happens: 'val' (avmnist/mimic,
    #: gated by loss_change_epoch), 'train_end' (mmhs, ungated), or None
    anneal_on: str = "val"

    def __init__(self, model_cfg: DictConfig, optimizer_cfg: DictConfig, **kwargs):
        super().__init__(model_cfg, optimizer_cfg, **kwargs)
        self.log_confusion_matrix = True
        m = model_cfg
        self.mute = m.get("mute", None)
        self.freeze_modalities_on_epoch = m.get("freeze_modalities_on_epoch", None)
        self.random_modality_muting_on_freeze = m.get("random_modality_muting_on_freeze", False)
        self.muting_probs = m.get("muting_probs", None)
        self.modalities_frozen = False

        n = self.num_branches
        self.fusion_loss_weight = float(m.get("fusion_loss_weight", 1.0 / n))
        self.fusion_loss_change = float(m.get("fusion_loss_change", 0))
        self.loss_change_epoch = int(m.get("loss_change_epoch", 0))

        # model.mixup_alpha (beyond reference, Zhang et al. 2018): in-step
        # convex input mixing with lam ~ Beta(a, a); losses combine as
        # lam·L(y) + (1-lam)·L(y_perm). Traced entirely inside the jitted
        # step (one draw per step from the 'mute' rng stream), so the
        # epoch-compiled scan path needs no host work.
        self.mixup_alpha = float(m.get("mixup_alpha", 0.0))
        if self.mixup_alpha < 0:
            raise ValueError(
                f"model.mixup_alpha must be >= 0 (got {self.mixup_alpha})")

        # model.cutmix_alpha (beyond reference, Yun et al. 2019): in-step
        # CutMix — per step one lam ~ Beta(a, a) draw and one permutation;
        # each modality swaps a contiguous region (a box over the last two
        # axes for 4-D inputs, a token span for 3-D) with its permuted
        # batch, and losses combine with lam set to the KEPT fraction
        # (recomputed from the integer region sizes). Same traced-loss
        # contract as mixup; the two are mutually exclusive.
        self.cutmix_alpha = float(m.get("cutmix_alpha", 0.0))
        if self.cutmix_alpha < 0:
            raise ValueError(
                f"model.cutmix_alpha must be >= 0 (got {self.cutmix_alpha})")
        if self.cutmix_alpha and self.mixup_alpha:
            raise ValueError(
                "model.mixup_alpha and model.cutmix_alpha cannot combine: "
                "each defines its own lam-weighted two-label loss; pick one")

        #: eval-time modality ablation (run.py -m ablate, beyond reference):
        #: when set to modality index i, EVERY eval forward mutes modality i
        #: (input zeroed before its encoder — the same mechanism train-time
        #: muting uses, `/root/reference/models/avmnist.py:247-256`). Flows
        #: through ctx, so switching conditions never recompiles.
        self.eval_mute_code: Optional[int] = None

        self.use_softadapt = bool(m.get("use_softadapt", False))
        if self.use_softadapt:
            self.loss_histories = [[] for _ in range(n)]
            self.loss_weights = np.full((n,), 1.0 / n, dtype=np.float32)
            self.update_loss_weights_per_epoch = int(m.get("update_loss_weights_per_epoch", 6))
            self.softadapt = LossWeightedSoftAdapt(
                beta=-0.1, accuracy_order=self.update_loss_weights_per_epoch - 1
            )

        # model.gradnorm (beyond reference, Chen et al. 2018 "GradNorm"):
        # adaptive loss-weight balancing from measured per-branch gradient
        # norms. Host-side per-epoch refit like SoftAdapt/GradBlend: each
        # update measures G_i = ||grad of w_i*l_i|| on a probe batch
        # (modules/gradnorm.py), solves the weights that put every branch at
        # its target norm mean(G)*r_i^alpha (r_i = relative inverse training
        # rate vs the epoch-0 losses), and renormalizes to sum n.
        gn_cfg = m.get("gradnorm", None)
        if gn_cfg and not hasattr(gn_cfg, "get"):
            gn_cfg = {}  # `model.gradnorm: true` — all defaults
        self.use_gradnorm = gn_cfg is not None and hasattr(gn_cfg, "get")
        if self.use_gradnorm:
            self.gn_alpha = float(gn_cfg.get("alpha", 1.5))
            self.gn_update_every = int(gn_cfg.get("update_every", 1))
            if self.gn_update_every < 1:
                raise ValueError("model.gradnorm.update_every must be >= 1 "
                                 f"(got {self.gn_update_every})")
            self.gn_weights: Optional[np.ndarray] = None
            self.gn_initial_losses: Optional[np.ndarray] = None
            if self.use_softadapt:
                raise ValueError(
                    "model.gradnorm and model.use_softadapt cannot combine: "
                    "both adapt the same loss-weight vector. Pick one.")

        self.use_gradblend = bool(m.get("gradblend", False))
        if self.use_gradblend and self.use_gradnorm:
            raise ValueError(
                "model.gradnorm and model.gradblend cannot combine: both "
                "adapt the same loss-weight vector. Pick one.")
        if self.use_gradblend and self.lora_rank:
            raise ValueError(
                "model.gradblend and model.lora cannot combine: GradBlend "
                "sub-trains raw encoder/head subtrees and would estimate "
                "weights from the UNadapted base model. Fine-tune with "
                "fixed/annealed/SoftAdapt weighting instead.")
        if self.use_gradblend:
            self.gb_update_freq = int(m.get("gb_update_freq", 20))
            # beyond reference: the nested sub-training length is hardcoded
            # to 20 in the reference (`/root/reference/modules/gradblend.py:27`);
            # model.gb_epochs exposes it (the parity harness pins the weight
            # math against torch at small epochs)
            self.gb_epochs = int(m.get("gb_epochs", 20))
            self.gb_weights: Optional[np.ndarray] = None

    # -- structure -----------------------------------------------------------
    @property
    def num_branches(self) -> int:
        return len(self.modalities) + 1

    @property
    def loss_names(self) -> Tuple[str, ...]:
        return tuple(self.modalities) + ("fusion",)

    @abc.abstractmethod
    def branch_losses(self, outputs, batch, ctx) -> Dict[str, jnp.ndarray]:
        """Per-branch scalar losses keyed by ``loss_names``."""

    @abc.abstractmethod
    def predictions(self, outputs, batch) -> Dict[str, jnp.ndarray]:
        """At least {'preds', 'labels'}; extra branch preds welcome."""

    # -- context -------------------------------------------------------------
    def current_loss_weights(self) -> np.ndarray:
        """The weight vector (branch order = loss_names) for this epoch."""
        n = self.num_branches
        if self.use_softadapt:
            return np.asarray(self.loss_weights, np.float32)
        if self.use_gradblend and self.gb_weights is not None:
            return np.asarray(self.gb_weights, np.float32)
        if self.use_gradnorm and self.gn_weights is not None:
            return np.asarray(self.gn_weights, np.float32)
        if self.weighting == "sum":
            return np.ones((n,), np.float32)
        ow = (1.0 - self.fusion_loss_weight) / (n - 1)
        w = np.full((n,), ow, dtype=np.float32)
        w[-1] = self.fusion_loss_weight
        if self.weighting == "fixed_scaled":
            w = w * n
        return w

    def _static_mute_code(self) -> int:
        if self.mute in (None, "multimodal"):
            return MUTE_NONE
        return list(self.modalities).index(self.mute)

    def make_ctx(self, epoch: int, mode: str) -> Dict[str, np.ndarray]:
        frozen = (
            self.freeze_modalities_on_epoch is not None
            and epoch >= self.freeze_modalities_on_epoch
        )
        random_mute = bool(
            self.random_modality_muting_on_freeze
            and self.freeze_modalities_on_epoch is not None
            and epoch >= self.freeze_modalities_on_epoch
        )
        if mode != "train":
            mute_code = (MUTE_NONE if self.eval_mute_code is None
                         else int(self.eval_mute_code))
            random_mute, frozen_f = False, 0.0
        else:
            mute_code = self._static_mute_code()
            frozen_f = 1.0 if frozen else 0.0
        probs = np.full((len(self.modalities) + 1,), 0.0, dtype=np.float32)
        if self.muting_probs is not None:
            for i, name in enumerate(self.modalities):
                probs[i] = float(self.muting_probs[name])
            probs[-1] = float(self.muting_probs.get("multimodal", 0.0))
        return {
            "epoch": np.float32(epoch),
            "loss_weights": self.current_loss_weights(),
            "frozen": np.float32(frozen_f),
            "mute_code": np.int32(mute_code),
            "random_mute": np.float32(1.0 if random_mute else 0.0),
            "mute_probs": probs,
        }

    # -- step ----------------------------------------------------------------
    def resolve_mute_code(self, ctx, rngs) -> jnp.ndarray:
        """Traced mute decision: static code, or a categorical draw over
        (modalities..., 'multimodal') when random muting is active. Code i
        zeroes modality i; the 'multimodal' outcome maps to no muting."""
        static_code = ctx["mute_code"]
        if "mute" not in rngs:
            return static_code
        drawn = jax.random.categorical(rngs["mute"], jnp.log(ctx["mute_probs"] + 1e-9))
        n_mod = len(self.modalities)
        drawn = jnp.where(drawn >= n_mod, MUTE_NONE, drawn).astype(jnp.int32)
        return jnp.where(ctx["random_mute"] > 0, drawn, static_code)

    def mixup_keys(self) -> Tuple[str, ...]:
        """Batch keys holding the network inputs to mix; every other key
        (labels, masks, lengths) is permuted wholesale for the lam-weighted
        second loss term. Matches the batch layout of every shipped family
        (batch keys == modality names)."""
        return tuple(self.modalities)

    def _mixup(self, batch, rngs):
        """Returns (mixed-input batch with ORIGINAL labels, permuted-label
        batch, lam). Forward runs once on the mixed inputs; losses evaluate
        against both label sets."""
        key = jax.random.fold_in(rngs["mute"], 0x6D78)  # 'mx': distinct stream
        k_lam, k_perm = jax.random.split(key)
        a = self.mixup_alpha
        lam = jax.random.beta(k_lam, a, a, dtype=jnp.float32)
        keys = self.mixup_keys()
        n = batch[keys[0]].shape[0]
        perm = jax.random.permutation(k_perm, n)
        mixed = {k: lam.astype(batch[k].dtype) * batch[k]
                 + (1.0 - lam).astype(batch[k].dtype) * batch[k][perm]
                 for k in keys}
        rest_perm = {k: v[perm] for k, v in batch.items() if k not in mixed}
        return dict(batch, **mixed), dict(rest_perm, **mixed), lam

    def _cutmix(self, batch, rngs):
        """Returns (cut-mixed-input batch with ORIGINAL labels, permuted-label
        batch, lam). One ``lam ~ Beta(a, a)`` draw and one permutation per
        step; each modality pastes a contiguous region from its permuted
        batch — a box over the trailing two axes for >= 4-D inputs (NCHW
        images/spectrograms), a span over the token axis for 3-D, a feature
        span for 2-D. The loss lam is recomputed as the mean KEPT fraction
        over modalities from the integer region sizes (Yun et al. 2019
        adjust-lambda semantics). Fully traced: region sizes/positions are
        traced scalars over static-shape iota masks, so nothing recompiles
        across steps."""
        key = jax.random.fold_in(rngs["mute"], 0x636D)  # 'cm': distinct stream
        k_lam, k_perm, k_pos = jax.random.split(key, 3)
        a = self.cutmix_alpha
        lam = jax.random.beta(k_lam, a, a, dtype=jnp.float32)
        keys = self.mixup_keys()
        n = batch[keys[0]].shape[0]
        perm = jax.random.permutation(k_perm, n)
        mixed, kept = {}, []
        for i, name in enumerate(keys):
            x = batch[name]
            if x.ndim >= 4:
                axes = (x.ndim - 2, x.ndim - 1)
            elif x.ndim == 3:
                axes = (1,)
            else:
                axes = (x.ndim - 1,)
            # per-axis side fraction: sqrt for a 2-axis box so the cut AREA
            # tracks (1 - lam); the span fraction directly otherwise
            frac = jnp.sqrt(1.0 - lam) if len(axes) == 2 else (1.0 - lam)
            mask, cut_frac = None, jnp.float32(1.0)
            for j, ax in enumerate(axes):
                size = x.shape[ax]
                k_ax = jax.random.fold_in(jax.random.fold_in(k_pos, i), j)
                cut = jnp.floor(size * frac).astype(jnp.int32)
                start = jnp.floor(jax.random.uniform(k_ax)
                                  * (size - cut + 1).astype(jnp.float32)
                                  ).astype(jnp.int32)
                idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, ax)
                ax_mask = (idx >= start) & (idx < start + cut)
                mask = ax_mask if mask is None else (mask & ax_mask)
                cut_frac = cut_frac * cut.astype(jnp.float32) / size
            mixed[name] = jnp.where(mask, x[perm], x)
            kept.append(1.0 - cut_frac)
        lam_eff = jnp.mean(jnp.stack(kept))
        rest_perm = {k: v[perm] for k, v in batch.items() if k not in mixed}
        return dict(batch, **mixed), dict(rest_perm, **mixed), lam_eff

    def step(self, params, batch, ctx, rngs, train: bool):
        total, _, aux = self._step_parts(params, batch, ctx, rngs, train)
        return total, aux

    def step_components(self, params, batch, ctx, rngs, train: bool):
        """``(components, (total, aux))``: the per-branch weighted loss
        contributions whose sum equals ``step()``'s total (branch order =
        ``loss_names``; the KD term, when active, appends one extra entry).
        This is the gradient-surgery entry point: PCGrad
        (``train.optimizer.pcgrad``) takes one backward pass per component
        and de-conflicts them before the optimizer sees a gradient
        (training/compiled.py::pcgrad_value_and_grad)."""
        total, comps, aux = self._step_parts(params, batch, ctx, rngs, train)
        return comps, (total, aux)

    def _step_parts(self, params, batch, ctx, rngs, train: bool):
        # eval consumes ctx['mute_code'] directly: MUTE_NONE normally, the
        # ablated modality index under `run.py -m ablate` (a traced arg —
        # switching ablation conditions never recompiles the eval step)
        mute_code = (self.resolve_mute_code(ctx, rngs) if train
                     else jnp.asarray(ctx["mute_code"], jnp.int32))
        batch_b, mix_lam = None, None
        if train and "mute" in rngs:
            if self.mixup_alpha > 0:
                batch, batch_b, mix_lam = self._mixup(batch, rngs)
            elif self.cutmix_alpha > 0:
                batch, batch_b, mix_lam = self._cutmix(batch, rngs)
        outputs, new_state = self.apply_network(
            params,
            dict(self.network_inputs(batch), deterministic=not train,
                 mute_code=mute_code),
            rngs, train, prune_sparsity=self.prune_sparsity(ctx),
        )
        moe_aux = outputs.pop("_moe_aux", None) if isinstance(outputs, dict) else None
        losses = self.branch_losses(outputs, batch, ctx)
        if batch_b is not None:
            losses_b = self.branch_losses(outputs, batch_b, ctx)
            lam = mix_lam.astype(next(iter(losses.values())).dtype)
            losses = {k: lam * losses[k] + (1.0 - lam) * losses_b[k]
                      for k in losses}
        vec = jnp.stack([losses[n] for n in self.loss_names])
        w = ctx["loss_weights"].astype(vec.dtype)
        total = jnp.dot(w, vec)
        # per-component contributions (sum == total up to reassociation):
        # only consumed by step_components/PCGrad — `total` keeps the exact
        # historical expression so default-path numerics never move
        comps = w * vec
        if train:
            # after freezing, only the fusion head trains and only its loss
            # backprops (`/root/reference/models/avmnist.py:292-293`)
            total = jnp.where(ctx["frozen"] > 0, losses["fusion"], total)
            fusion_only = jnp.zeros_like(comps).at[-1].set(losses["fusion"])
            comps = jnp.where(ctx["frozen"] > 0, fusion_only, comps)
        if moe_aux is not None:
            # Switch-style load-balance regularizer (modules/moe.py); rides
            # the fusion component — routing is shared infrastructure, not a
            # per-modality objective to de-conflict against
            t = jnp.asarray(self.moe_aux_weight, moe_aux.dtype) * moe_aux
            total = total + t
            comps = comps.at[-1].add(t.astype(comps.dtype))
        if self.distiller is not None:
            # train.distill (beyond reference, training/distill.py): the KD
            # gap is computed in EVERY mode (logged as {split}_loss_kd) but
            # only trained on — teacher weights are jit-captured constants,
            # so nothing about checkpoints/optimizer state changes
            kd = self.distiller.loss(outputs, batch)
            self.bind_trace_flavors()  # teacher apply re-bound the globals
            losses = dict(losses, kd=kd)
            if train:
                wk = jnp.asarray(self.distiller.weight, total.dtype)
                total = (1.0 - wk) * total + wk * kd
                comps = jnp.concatenate(
                    [(1.0 - wk) * comps, (wk * kd.astype(comps.dtype))[None]])
        aux = {"losses": losses, **self.predictions(outputs, batch)}
        if moe_aux is not None:
            aux["moe_aux"] = moe_aux
        if new_state is not None:
            aux["_mutable_state"] = new_state
        return total, comps, aux

    # -- freezing ------------------------------------------------------------
    def frozen_param_prefixes(self) -> Tuple[str, ...]:
        """Top-level param subtrees frozen at the freeze epoch: the modality
        encoders and their heads (`/root/reference/models/avmnist.py:314-324`).
        Matches the ``MultimodalNet`` field naming (encoders_i / heads_i);
        with ``model.paired_encoders`` the batched encoder chain lives under
        one ``paired_encoder`` subtree instead."""
        paired = getattr(self.network, "paired_encoder", None) is not None
        names = ["paired_encoder"] if paired else []
        for i, _ in enumerate(self.modalities):
            if not paired:
                names.append(f"encoders_{i}")
            names.append(f"heads_{i}")
        return tuple(names)

    def frozen_mask(self, params):
        prefixes = self.frozen_param_prefixes()

        def mask(path, leaf):
            top = None
            for p in path:
                key = getattr(p, "key", None)
                # 'params'/'lora' are collection wrappers, not modules: the
                # freeze applies to a branch's LoRA adapters exactly as to
                # its base weights
                if key is not None and key not in ("params", "lora"):
                    top = key
                    break
            return 0.0 if top in prefixes else 1.0

        return jax.tree_util.tree_map_with_path(mask, params)

    # -- host hooks ------------------------------------------------------------
    def epoch_log_keys(self) -> Sequence[str]:
        keys = tuple(f"loss_{n}" for n in self.loss_names)
        if self.distiller is not None:
            keys += ("loss_kd",)
        return keys

    def epoch_scalar_keys(self) -> Sequence[str]:
        # moe_aux only exists in train-step aux; the trainer's scalar
        # aggregation skips absent keys, so declaring it is safe for eval
        return ("moe_aux",) if self._uses_moe else ()

    def on_train_epoch_end(self, trainer, epoch: int, logs: Dict[str, float]) -> None:
        if self.anneal_on == "train_end":
            # mmhs-style ungated annealing (`mmhs150.py:135`)
            self.fusion_loss_weight = min(1.0, self.fusion_loss_weight + self.fusion_loss_change)

    def on_validation_epoch_end(self, trainer, epoch: int, logs: Dict[str, float]) -> None:
        # fixed-weight annealing (`/root/reference/models/avmnist.py:338-339`)
        if self.anneal_on == "val" and epoch >= self.loss_change_epoch:
            self.fusion_loss_weight = min(1.0, self.fusion_loss_weight + self.fusion_loss_change)
        if self.use_softadapt:
            for i, name in enumerate(self.loss_names):
                self.loss_histories[i].append(logs.get(f"val_loss_{name}", 0.0))
            if epoch != 0 and epoch % self.update_loss_weights_per_epoch == 0:
                self.loss_weights = self.softadapt.get_component_weights(
                    *[np.asarray(h, np.float64) for h in self.loss_histories]
                ).astype(np.float32)
                self.loss_histories = [[] for _ in self.loss_names]

    def on_train_epoch_start(self, trainer, epoch: int) -> None:
        if self.use_gradblend and epoch % self.gb_update_freq == 0:
            from ..modules.gradblend import estimate_gradblend_weights

            self.gb_weights = estimate_gradblend_weights(self, trainer)
        if self.use_gradnorm and epoch % self.gn_update_every == 0:
            from ..modules.gradnorm import measure_gradnorm_weights

            w = measure_gradnorm_weights(self, trainer, epoch)
            if w is not None:
                self.gn_weights = w

    # -- gradblend adapter -----------------------------------------------------
    def gradblend_modality_keys(self) -> Tuple[str, ...]:
        """Batch keys feeding each modality encoder (order = modalities)."""
        return tuple(self.modalities)

    def gradblend_loss(self, logits, batch):
        """Criterion for GradBlend sub-training (CE by default, matching
        `models/avmnist.py:232`); binary tasks override with BCE."""
        from ..modules.losses import cross_entropy_loss

        return cross_entropy_loss(logits, batch["label"])
