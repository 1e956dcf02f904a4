"""Behavioral e2e parity: the reference's math in torch vs this framework
on IDENTICAL data (m2mixer_tpu/parity.py).

The lockstep protocol — bit-identical initial weights (native init exported
through the reference-named state dict), dropout 0, the reference's own
``shuffle=False`` AV-MNIST order (`/root/reference/datasets/avmnist.py:181`),
same Adam hyperparameters — must produce near-identical per-epoch loss
curves and the SAME test accuracy. This is the strongest form of the
SURVEY §6 "metric parity within seed noise" requirement: not statistically
compatible, numerically locked."""

import os

import numpy as np


def test_lockstep_parity(tmp_path):
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment

    data = str(tmp_path / "avmnist")
    # 384 -> train split 352 = 11 full batches of 32, val exactly one batch:
    # both frameworks see identical batch boundaries (no drop-last ambiguity)
    generate("avmnist", data, n=384)
    res = lockstep_experiment(data, str(tmp_path), epochs=3)

    nv = np.asarray(res["native"]["history"]["val_loss"])
    tv = np.asarray(res["torch"]["history"]["val_loss"])
    ntr = np.asarray(res["native"]["history"]["train_loss"])
    ttr = np.asarray(res["torch"]["history"]["train_loss"])
    assert nv.shape == tv.shape == (3,)
    # float-reassociation noise only (measured |d| ~1e-6 on CPU); 1e-3 gives
    # headroom for backend-dependent reductions without ever letting a real
    # math divergence through
    assert np.abs(nv - tv).max() < 1e-3, (nv, tv)
    assert np.abs(ntr - ttr).max() < 1e-3, (ntr, ttr)
    # the two frameworks pick the same best epoch and score identically
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    # the 1e-3 loss tolerance admits weight drift that can flip an argmax on
    # one borderline test sample, changing acc by 1/n_test — allow exactly
    # that much (test split = 384//6 = 64 samples) instead of bit equality
    assert abs(res["native"]["test_acc"] - res["torch"]["test_acc"]) <= 1 / 64 + 1e-9
    assert abs(res["native"]["test_f1m"] - res["torch"]["test_f1m"]) < 1e-6
    assert abs(res["native"]["test_loss"] - res["torch"]["test_loss"]) < 1e-3


def test_lockstep_parity_gmu_fusion(tmp_path):
    """GMU-fusion topology lockstep (the avmnist_gated_4loss variant,
    `/root/reference/cfg/avmnist/avmnist_gated_4loss.yml:39-56`): the
    parametered BiModalGatedUnit — ``z*tanh(W1 m1)+(1-z)*tanh(W2 m2)``,
    gate on the concatenated features (`fusion.py:7-23`) — fuses per token,
    so the fusion mixer sees image-token count, and the gate weights ride
    the exported state dict (``fusion_function.*`` keys)."""
    from m2mixer_tpu import config as cfg_lib
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment

    data = str(tmp_path / "avmnist")
    generate("avmnist", data, n=384)
    cfg = cfg_lib.load("cfg/avmnist/avmnist_m2-mixer_S.yml")
    cfg.dataset.params.data_dir = data
    cfg.dataset.params.num_workers = 0
    cfg.train.epochs = 3
    cfg.train.tensorboard_path = str(tmp_path / "logs")
    cfg.train.mesh_data = 1
    cfg.train.mesh_model = 1
    cfg.model.dropout = 0.0
    # shrink + switch the fusion to the gated unit (config-driven, same
    # string-registry path the shipped gated config uses)
    for mod in ("image", "audio", "multimodal"):
        mc = cfg.model.modalities[mod]
        mc.hidden_dim = 16
        mc.channel_dim = 32
        mc.token_dim = 8
        mc.num_mixers = 1
    cfg.model.modalities.image.patch_size = 14
    cfg.model.modalities.audio.patch_size = 56
    mm = cfg.model.modalities.multimodal
    mm.fusion_function = "BiModalGatedUnit"
    mm.mod1_in = 16
    mm.mod2_in = 16
    mm.out_size = 16
    cfg.model.modalities.classification.input_shape = [16, 4, 16]

    res = lockstep_experiment(data, str(tmp_path), epochs=3, cfg=cfg)
    nv = np.asarray(res["native"]["history"]["val_loss"])
    tv = np.asarray(res["torch"]["history"]["val_loss"])
    assert nv.shape == tv.shape == (3,)
    assert np.abs(nv - tv).max() < 1e-3, (nv, tv)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    assert abs(res["native"]["test_acc"] - res["torch"]["test_acc"]) <= 1 / 64 + 1e-9
    assert abs(res["native"]["test_f1m"] - res["torch"]["test_f1m"]) < 0.02


def test_lockstep_parity_gmlp(tmp_path):
    """gMLP-encoder topology lockstep (the avmnist_gmlp intent — its
    reference model type is unresolvable, PARITY.md; the BLOCK math is the
    reference's `/root/reference/modules/gmpl.py`): VisiongMLP patchify +
    SpatialGatingUnit blocks per modality, cls-token FusiongMLP over the
    concatenated tokens. prob_0_L=[1,1] pins stochastic depth off so both
    frameworks are deterministic."""
    from m2mixer_tpu import config as cfg_lib
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment

    data = str(tmp_path / "avmnist")
    generate("avmnist", data, n=384)
    cfg = cfg_lib.load("cfg/avmnist/avmnist_m2-mixer_S.yml")
    cfg.dataset.params.data_dir = data
    cfg.dataset.params.num_workers = 0
    cfg.train.epochs = 3
    cfg.train.tensorboard_path = str(tmp_path / "logs")
    cfg.train.mesh_data = 1
    cfg.train.mesh_model = 1
    cfg.model.dropout = 0.0
    m = cfg.model.modalities
    for mod, patch in (("image", 14), ("audio", 56)):
        mc = m[mod]
        mc.block_type = "VisiongMLP"
        mc.patch_size = patch
        mc.d_model = 16
        mc.d_ffn = 32
        mc.n_blocks = 2
        mc.prob_0_L = [1.0, 1.0]
        for stale in ("hidden_dim", "token_dim", "channel_dim", "num_mixers"):
            if stale in mc:
                del mc[stale]
    mm = m.multimodal
    mm.block_type = "FusiongMLP"
    mm.d_model = 16
    mm.d_ffn = 32
    mm.n_blocks = 1
    mm.prob_0_L = [1.0, 1.0]
    for stale in ("hidden_dim", "token_dim", "channel_dim", "num_mixers"):
        if stale in mm:
            del mm[stale]
    m.classification.input_shape = [16, 9, 16]

    res = lockstep_experiment(data, str(tmp_path), epochs=3, cfg=cfg)
    nv = np.asarray(res["native"]["history"]["val_loss"])
    tv = np.asarray(res["torch"]["history"]["val_loss"])
    assert nv.shape == tv.shape == (3,)
    # the SGU's bias-1 token projection makes untrained losses O(10^2-10^3)
    # at this geometry, so float-reassociation noise scales with them:
    # tolerances are RELATIVE here (measured ~1.4e-4 rel over 3 epochs)
    assert (np.abs(nv - tv) / np.abs(tv)).max() < 1e-3, (nv, tv)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    assert abs(res["native"]["test_acc"] - res["torch"]["test_acc"]) <= 1 / 64 + 1e-9
    assert abs(res["native"]["test_f1m"] - res["torch"]["test_f1m"]) < 0.05


def test_lockstep_parity_dynamixer(tmp_path):
    """DynaMixer topology lockstep (the live avmnist_3loss_dyna config,
    `/root/reference/cfg/avmnist/avmnist_3loss_dyna.yml`): input-dependent
    per-sample L×L mixing weights softmaxed over dim −2
    (`/root/reference/modules/dynamixer.py:10-31`), row+column mixes with a
    learned 3-way softmax reweighting, elementwise MaxFusion over the 2-D
    grids, FusionDynaMixer."""
    from m2mixer_tpu import config as cfg_lib
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment

    data = str(tmp_path / "avmnist")
    generate("avmnist", data, n=384)
    cfg = cfg_lib.load("cfg/avmnist/avmnist_3loss_dyna.yml")
    cfg.dataset.params.data_dir = data
    cfg.dataset.params.num_workers = 0
    cfg.dataset.params.batch_size = 32
    cfg.train.epochs = 3
    cfg.train.tensorboard_path = str(tmp_path / "logs")
    cfg.train.mesh_data = 1
    cfg.train.mesh_model = 1
    cfg.model.dropout = 0.0
    m = cfg.model.modalities
    for mod, patch in (("image", 14), ("audio", 56)):
        mc = m[mod]
        mc.patch_size = patch  # 2x2 grids
        mc.hidden_dim = 16
        mc.num_head = 2
        mc.num_mixers = 1
    m.multimodal.hidden_dim = 16
    m.multimodal.num_head = 2
    m.multimodal.num_mixers = 1
    m.classification.input_shape = [16, 4, 16]

    res = lockstep_experiment(data, str(tmp_path), epochs=3, cfg=cfg)
    nv = np.asarray(res["native"]["history"]["val_loss"])
    tv = np.asarray(res["torch"]["history"]["val_loss"])
    assert nv.shape == tv.shape == (3,)
    assert np.abs(nv - tv).max() < 1e-3, (nv, tv)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    assert abs(res["native"]["test_acc"] - res["torch"]["test_acc"]) <= 1 / 64 + 1e-9
    assert abs(res["native"]["test_f1m"] - res["torch"]["test_f1m"]) < 0.05


def test_lockstep_parity_mimic(tmp_path):
    """MIMIC topology lockstep (VERDICT r3 #2b): tuple-semantics batch, MLP
    static encoder + MLPMixerNoPatching time encoder, CE branches with
    fixed weighting and NO x3 scale (`/root/reference/models/mimic.py:95-124`).
    Measured gap: ~2.7e-6 absolute on both curves."""
    from m2mixer_tpu import config as cfg_lib
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment_mimic

    data = str(tmp_path / "mimic")
    # 400 stays -> val 40 / test 40 / train 320: the TRAIN split is whole
    # batches of 16 (no drop-last ambiguity); the 40-sample val/test splits
    # are not multiples of 16 — their parity relies on both frameworks
    # sharing the same datamodule iterator (identical tail batches)
    generate("mimic", data, n=400)
    cfg = cfg_lib.load("cfg/mimic/mimic_m2-mixer_H.yml")
    cfg.dataset.params.data_dir = data
    cfg.dataset.params.batch_size = 16
    cfg.dataset.params.num_workers = 0
    cfg.train.epochs = 3
    cfg.model.dropout = 0.0
    res = lockstep_experiment_mimic(data, str(tmp_path), cfg, epochs=3)

    for key in ("train_loss", "val_loss"):
        a = np.asarray(res["native"]["history"][key])
        b = np.asarray(res["torch"]["history"][key])
        assert a.shape == b.shape == (3,)
        assert np.abs(a - b).max() < 1e-3, (key, a, b)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    # test split = 40 samples; one borderline argmax flip moves f1/acc 1/40
    assert abs(res["native"]["test_f1_micro"] - res["torch"]["test_f1_micro"]) <= 1 / 40 + 1e-9
    assert abs(res["native"]["test_acc"] - res["torch"]["test_acc"]) <= 1 / 40 + 1e-9
    assert abs(res["native"]["test_loss"] - res["torch"]["test_loss"]) < 1e-3


def test_lockstep_parity_mmhs(tmp_path):
    """MMHS150K topology lockstep (VERDICT r4 #2): the only 3-modal,
    masked-flag, 4-way-weighted topology — image MLPMixer + two PNLPMixers,
    3-ary concat, four BCE(pos_weight=3.57) heads with the text/OCR losses
    masked by per-sample ``use_features`` flags (~30% zero rows, so the
    masks genuinely fire), ``ow=(1-w_f)/3`` weighting without the x3
    (`/root/reference/models/mmhs150.py:36-54,100-107`)."""
    from m2mixer_tpu.parity import lockstep_experiment_mmhs, small_image_text_cfg

    cfg = small_image_text_cfg("mmhs150", str(tmp_path), epochs=3)
    res = lockstep_experiment_mmhs(str(tmp_path), cfg, epochs=3)
    for key in ("train_loss", "val_loss"):
        a = np.asarray(res["native"]["history"][key])
        b = np.asarray(res["torch"]["history"][key])
        assert a.shape == b.shape == (3,)
        assert np.abs(a - b).max() < 1e-3, (key, a, b)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    # 64-sample test split: one sigmoid-threshold flip moves acc by 1/64
    assert abs(res["native"]["test_accuracy"] - res["torch"]["test_accuracy"]) <= 1 / 64 + 1e-9
    assert abs(res["native"]["test_f1"] - res["torch"]["test_f1"]) < 0.05
    assert abs(res["native"]["test_auc"] - res["torch"]["test_auc"]) < 0.02
    assert abs(res["native"]["test_loss"] - res["torch"]["test_loss"]) < 1e-3


def test_lockstep_parity_multioff(tmp_path):
    """MultiOFF topology lockstep (VERDICT r4 #8): unweighted BCE on all
    three heads, plain-sum combine, sigmoid>0.5 preds
    (`/root/reference/models/multioff.py:47-50,115-136`)."""
    from m2mixer_tpu.parity import lockstep_experiment_multioff, small_image_text_cfg

    cfg = small_image_text_cfg("multioff", str(tmp_path), epochs=3)
    res = lockstep_experiment_multioff(str(tmp_path), cfg, epochs=3)
    for key in ("train_loss", "val_loss"):
        a = np.asarray(res["native"]["history"][key])
        b = np.asarray(res["torch"]["history"][key])
        assert a.shape == b.shape == (3,)
        assert np.abs(a - b).max() < 1e-3, (key, a, b)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    assert abs(res["native"]["test_accuracy"] - res["torch"]["test_accuracy"]) <= 1 / 64 + 1e-9
    assert abs(res["native"]["test_f1"] - res["torch"]["test_f1"]) < 0.05
    assert abs(res["native"]["test_loss"] - res["torch"]["test_loss"]) < 1e-3


def test_lockstep_parity_memotion(tmp_path):
    """Memotion topology lockstep (VERDICT r4 #8): CE on all three heads,
    PLAIN SUM — no weighting, no x3 — argmax preds, macro F1
    (`/root/reference/models/memotion.py:105-112,187-192`)."""
    from m2mixer_tpu.parity import lockstep_experiment_memotion, small_image_text_cfg

    cfg = small_image_text_cfg("memotion", str(tmp_path), epochs=3)
    res = lockstep_experiment_memotion(str(tmp_path), cfg, epochs=3)
    for key in ("train_loss", "val_loss"):
        a = np.asarray(res["native"]["history"][key])
        b = np.asarray(res["torch"]["history"][key])
        assert a.shape == b.shape == (3,)
        assert np.abs(a - b).max() < 1e-3, (key, a, b)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    assert abs(res["native"]["test_f1m"] - res["torch"]["test_f1m"]) < 0.05
    assert abs(res["native"]["test_loss"] - res["torch"]["test_loss"]) < 1e-3


def test_lockstep_parity_uq(tmp_path):
    """UQ/EDL topology lockstep (VERDICT r4 #4): EDL MSE Bayes risk per
    branch with the x0 KL quirk, plain-sum combine, least-uncertain-branch
    prediction — the torch side implements the reference's strict-< masks
    verbatim (`/root/reference/models/avmnist.py:447-572,525-537`,
    `modules/losses.py:5-49`). Measured gap: ~2.4e-7 on both curves,
    identical test predictions."""
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment_uq

    data = str(tmp_path / "avmnist")
    generate("avmnist", data, n=384)
    res = lockstep_experiment_uq(data, str(tmp_path), epochs=3)
    for key in ("train_loss", "val_loss"):
        a = np.asarray(res["native"]["history"][key])
        b = np.asarray(res["torch"]["history"][key])
        assert a.shape == b.shape == (3,)
        assert np.abs(a - b).max() < 1e-3, (key, a, b)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    # the combined (least-uncertain-branch) predictions drive acc/F1: one
    # borderline uncertainty flip moves acc by 1/64
    assert abs(res["native"]["test_acc"] - res["torch"]["test_acc"]) <= 1 / 64 + 1e-9
    assert abs(res["native"]["test_f1m"] - res["torch"]["test_f1m"]) < 0.05
    assert abs(res["native"]["test_loss"] - res["torch"]["test_loss"]) < 1e-3


def test_lockstep_softadapt_in_loop(tmp_path):
    """Estimator-in-the-loop lockstep (VERDICT r4 #3a): SoftAdapt ACTIVE in
    both frameworks — refits every 2 epochs from each side's OWN val
    branch-loss histories, reweighted loss feeding the next epochs
    (`/root/reference/models/avmnist.py:284-286,340-361`). Asserts the
    per-epoch APPLIED weight vectors agree (measured 4.8e-7) on top of the
    usual curve/metric lockstep — the estimator->training feedback loop,
    not just the estimator in isolation."""
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment_softadapt

    data = str(tmp_path / "avmnist")
    generate("avmnist", data, n=384)
    res = lockstep_experiment_softadapt(data, str(tmp_path), epochs=6,
                                        update_every=2)
    nw = np.asarray(res["native_weights"], np.float64)
    tw = np.asarray(res["torch_weights"], np.float64)
    assert nw.shape == tw.shape == (6, 3)
    # the weights must actually CHANGE (refits at epochs 2 and 4 apply
    # from epochs 3 and 5) — otherwise the loop never fed back
    assert not np.allclose(nw[0], nw[3]) and not np.allclose(nw[3], nw[5])
    assert np.abs(nw - tw).max() < 1e-4, (nw, tw)
    for key in ("train_loss", "val_loss"):
        a = np.asarray(res["native"]["history"][key])
        b = np.asarray(res["torch"]["history"][key])
        assert a.shape == b.shape == (6,)
        assert np.abs(a - b).max() < 1e-3, (key, a, b)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    assert abs(res["native"]["test_acc"] - res["torch"]["test_acc"]) <= 1 / 64 + 1e-9


def test_lockstep_gradblend_in_loop(tmp_path):
    """Estimator-in-the-loop lockstep (VERDICT r4 #3b): GradBlend ACTIVE
    with ``gb_update_freq=1`` — an O/G^2 re-estimation from the CURRENT
    weights at every train-epoch start, feeding that epoch's loss combine
    (`/root/reference/models/avmnist.py:219-234,287-289`). The weight
    vectors diverge epoch to epoch as training moves the parameters; both
    frameworks must track (measured 6.6e-6)."""
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment_gradblend_loop

    data = str(tmp_path / "avmnist")
    generate("avmnist", data, n=384)
    res = lockstep_experiment_gradblend_loop(data, str(tmp_path), epochs=3,
                                             gb_epochs=2)
    nw = np.asarray(res["native_weights"], np.float64)
    tw = np.asarray(res["torch_weights"], np.float64)
    assert nw.shape == tw.shape == (3, 3)
    # each epoch's re-estimation sees different params -> different weights
    assert not np.allclose(nw[0], nw[1]) and not np.allclose(nw[1], nw[2])
    assert np.abs(nw - tw).max() < 1e-3, (nw, tw)
    for key in ("train_loss", "val_loss"):
        a = np.asarray(res["native"]["history"][key])
        b = np.asarray(res["torch"]["history"][key])
        assert a.shape == b.shape == (3,)
        assert np.abs(a - b).max() < 1e-3, (key, a, b)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    assert abs(res["native"]["test_acc"] - res["torch"]["test_acc"]) <= 1 / 64 + 1e-9


def test_lockstep_parity_mimic_gru(tmp_path):
    """MimicRecurrent lockstep (round-5 addition): the GRU-encoder baseline
    (`/root/reference/models/mimic.py:210-283`) — lax.scan recurrence vs
    torch nn.GRU through a full training loop. Requires the double-bias
    ``TorchGRUCell`` (modules/recurrent.py): torch's redundant per-gate
    input+hidden biases receive identical gradients, so a single-bias cell
    would move the effective bias at HALF torch's Adam rate and the curves
    would diverge. Measured gap: ~1.2e-6."""
    from m2mixer_tpu import config as cfg_lib
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment_mimic_gru

    data = str(tmp_path / "mimic")
    generate("mimic", data, n=400)
    cfg = cfg_lib.load("cfg/mimic/mimic_gru.yml")
    cfg.dataset.params.data_dir = data
    cfg.dataset.params.batch_size = 16
    cfg.dataset.params.num_workers = 0
    cfg.train.epochs = 3
    cfg.train.mesh_data = 1
    cfg.train.mesh_model = 1
    cfg.model.dropout = 0.0
    cfg.model.gradblend = False  # lockstep pins the base recipe
    res = lockstep_experiment_mimic_gru(data, str(tmp_path), cfg, epochs=3)

    for key in ("train_loss", "val_loss"):
        a = np.asarray(res["native"]["history"][key])
        b = np.asarray(res["torch"]["history"][key])
        assert a.shape == b.shape == (3,)
        assert np.abs(a - b).max() < 1e-3, (key, a, b)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    assert abs(res["native"]["test_f1_micro"] - res["torch"]["test_f1_micro"]) <= 1 / 40 + 1e-9
    assert abs(res["native"]["test_acc"] - res["torch"]["test_acc"]) <= 1 / 40 + 1e-9
    assert abs(res["native"]["test_loss"] - res["torch"]["test_loss"]) < 1e-3


def test_lockstep_gradblend_in_loop_mimic_gru(tmp_path):
    """GradBlend-in-the-loop lockstep on MimicRecurrent — the reference's
    ONLY shipped config that trains with GradBlend active
    (`/root/reference/cfg/mimic/mimic_gru.yml:26`). ``gb_update_freq=1``:
    both frameworks re-estimate O/G^2 from their CURRENT weights at every
    train-epoch start (`/root/reference/models/mimic.py:305-320`) and apply
    ``gb[0]*static + gb[1]*time + gb[2]*fusion`` (`mimic.py:283-285`).
    Unlike the flagship loop (mixer branches), this drives the estimator's
    sub-trainings through an MLP branch, a scan-GRU branch (double-bias
    ``TorchGRUCell`` Adam dynamics inside the sub-training), and a
    1-D-concat MLP fused branch."""
    from m2mixer_tpu import config as cfg_lib
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment_mimic_gru_gradblend

    data = str(tmp_path / "mimic")
    # 400 stays -> train 320; the estimator's 90/10 cut (32) is whole
    # batches of 16 on both sides of the split
    generate("mimic", data, n=400)
    cfg = cfg_lib.load("cfg/mimic/mimic_gru.yml")
    cfg.dataset.params.data_dir = data
    cfg.dataset.params.batch_size = 16
    cfg.dataset.params.num_workers = 0
    cfg.train.epochs = 3
    cfg.train.mesh_data = 1
    cfg.train.mesh_model = 1
    cfg.model.dropout = 0.0
    res = lockstep_experiment_mimic_gru_gradblend(data, str(tmp_path), cfg,
                                                  epochs=3, gb_epochs=2)

    nw = np.asarray(res["native_weights"], np.float64)
    tw = np.asarray(res["torch_weights"], np.float64)
    assert nw.shape == tw.shape == (3, 3)
    # each epoch's re-estimation sees different params -> different weights
    assert not np.allclose(nw[0], nw[1]) and not np.allclose(nw[1], nw[2])
    assert np.abs(nw - tw).max() < 1e-3, (nw, tw)
    for key in ("train_loss", "val_loss"):
        a = np.asarray(res["native"]["history"][key])
        b = np.asarray(res["torch"]["history"][key])
        assert a.shape == b.shape == (3,)
        assert np.abs(a - b).max() < 1e-3, (key, a, b)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    assert abs(res["native"]["test_f1_micro"] - res["torch"]["test_f1_micro"]) <= 1 / 40 + 1e-9
    assert abs(res["native"]["test_acc"] - res["torch"]["test_acc"]) <= 1 / 40 + 1e-9


def test_lockstep_parity_mmimdb(tmp_path):
    """MM-IMDB topology lockstep (VERDICT r3 #2a): multilabel
    ``BCEWithLogitsLoss(pos_weight)`` on all three heads, plain-sum combine,
    sigmoid>0.5 preds, weighted/macro multilabel F1
    (`/root/reference/models/mmimdb.py:47-50,128-133,184-192`). Measured
    gap: ~1.8e-6 relative on both curves (losses are pos_weight-scaled, so
    tolerances are relative)."""
    from m2mixer_tpu import config as cfg_lib
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment_mmimdb

    data = str(tmp_path / "mmimdb")
    # 320 samples -> train 224 / dev 32 / test 64: whole batches of 16
    generate("mmimdb_ext", data, n=320)
    cfg = cfg_lib.load("cfg/mmimdb/mmimdb_3loss.yml")
    cfg.dataset.params.data_dir = data
    cfg.dataset.params.batch_size = 16
    cfg.dataset.params.num_workers = 0
    cfg.train.epochs = 3
    cfg.train.seed = 0
    cfg.model.dropout = 0.0
    # shrink dims for CI speed; data shapes (160x256 posters, text grid)
    # and the multilabel loss math stay the shipped ones
    for mod in ("image", "text", "multimodal"):
        cfg.model.modalities[mod].hidden_dim = 32
        cfg.model.modalities[mod].channel_dim = 64
        cfg.model.modalities[mod].token_dim = 8
        cfg.model.modalities[mod].num_mixers = 1
    cfg.model.modalities.classification.input_shape = [16, 80, 32]
    res = lockstep_experiment_mmimdb(data, str(tmp_path), cfg, epochs=3)

    for key in ("train_loss", "val_loss"):
        a = np.asarray(res["native"]["history"][key])
        b = np.asarray(res["torch"]["history"][key])
        assert a.shape == b.shape == (3,)
        assert (np.abs(a - b) / np.abs(b)).max() < 1e-4, (key, a, b)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    # multilabel F1 over 64 samples x 23 labels: one sigmoid-threshold flip
    # moves the weighted F1 by well under 0.02
    assert abs(res["native"]["test_f1w"] - res["torch"]["test_f1w"]) < 0.02
    assert abs(res["native"]["test_f1m"] - res["torch"]["test_f1m"]) < 0.02


def test_lockstep_softadapt_in_loop_mmimdb(tmp_path):
    """SoftAdapt-in-the-loop lockstep on MM-IMDB — a LIVE weight
    application the flagship loop doesn't cover: the weighted combine
    replaces the plain 3-way sum (`/root/reference/models/mmimdb.py:
    119-123`, initial weights 1/3) and the refit histories are val means
    of multilabel ``BCEWithLogitsLoss(pos_weight)`` branch losses
    (`:156-177`), not CE. update_every=2 over 6 epochs -> refits at val
    end of epochs 2 and 4, applied from epochs 3 and 5 on BOTH sides."""
    from m2mixer_tpu import config as cfg_lib
    from m2mixer_tpu.datasets.surrogate import generate
    from m2mixer_tpu.parity import lockstep_experiment_mmimdb_softadapt

    data = str(tmp_path / "mmimdb")
    generate("mmimdb_ext", data, n=320)
    cfg = cfg_lib.load("cfg/mmimdb/mmimdb_3loss.yml")
    cfg.dataset.params.data_dir = data
    cfg.dataset.params.batch_size = 16
    cfg.dataset.params.num_workers = 0
    cfg.train.epochs = 6
    cfg.train.seed = 0
    cfg.model.dropout = 0.0
    for mod in ("image", "text", "multimodal"):
        cfg.model.modalities[mod].hidden_dim = 32
        cfg.model.modalities[mod].channel_dim = 64
        cfg.model.modalities[mod].token_dim = 8
        cfg.model.modalities[mod].num_mixers = 1
    cfg.model.modalities.classification.input_shape = [16, 80, 32]
    res = lockstep_experiment_mmimdb_softadapt(data, str(tmp_path), cfg,
                                               epochs=6, update_every=2)

    nw = np.asarray(res["native_weights"], np.float64)
    tw = np.asarray(res["torch_weights"], np.float64)
    assert nw.shape == tw.shape == (6, 3)
    # epochs 0-2 run the 1/3 init; refits land at epochs 3 and 5
    assert np.allclose(nw[0], 1.0 / 3.0) and np.allclose(nw[2], 1.0 / 3.0)
    assert not np.allclose(nw[3], 1.0 / 3.0)
    assert np.abs(nw - tw).max() < 1e-3, (nw, tw)
    for key in ("train_loss", "val_loss"):
        a = np.asarray(res["native"]["history"][key])
        b = np.asarray(res["torch"]["history"][key])
        assert a.shape == b.shape == (6,)
        assert (np.abs(a - b) / np.abs(b)).max() < 1e-4, (key, a, b)
    assert res["native"]["best_epoch"] == res["torch"]["best_epoch"]
    assert abs(res["native"]["test_f1w"] - res["torch"]["test_f1w"]) < 0.02
    assert abs(res["native"]["test_f1m"] - res["torch"]["test_f1m"]) < 0.02
    assert abs(res["native"]["test_loss"] - res["torch"]["test_loss"]) / abs(
        res["torch"]["test_loss"]) < 1e-4
