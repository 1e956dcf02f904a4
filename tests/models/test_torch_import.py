"""Checkpoint-fidelity test: a torch model with the REFERENCE's module
structure (hence its state_dict naming) must produce the same outputs as our
network loaded from its exported state_dict."""

import jax
import numpy as np
import torch
from torch import nn

from m2mixer_tpu.config import loads
from m2mixer_tpu.models import get_model
from m2mixer_tpu.utils.torch_import import (
    convert_reference_state_dict,
    export_reference_state_dict,
)

CFG = """
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {num_classes: 10, classifier: StandardClassifier,
                     input_shape: [16, 8, 16]}
    image: {block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 14,
            image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 2}
    audio: {block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
            image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 2}
    multimodal: {block_type: FusionMixer, fusion_function: ConcatFusion,
                 hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}
train:
  optimizer: {lr: 1e-3}
"""


# -- a torch model with the reference's exact module structure -> exact names
class _FF(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.net = nn.Sequential(nn.Linear(dim, hidden), nn.GELU(), nn.Dropout(0.0),
                                 nn.Linear(hidden, dim), nn.Dropout(0.0))

    def forward(self, x):
        return self.net(x)


class _Rearrange(nn.Module):
    def forward(self, x):
        return x.transpose(-1, -2)


class _Block(nn.Module):
    def __init__(self, hidden, n_tok, token_dim, channel_dim):
        super().__init__()
        self.token_mix = nn.Sequential(nn.LayerNorm(hidden), _Rearrange(),
                                       _FF(n_tok, token_dim), _Rearrange())
        self.channel_mix = nn.Sequential(nn.LayerNorm(hidden), _FF(hidden, channel_dim))

    def forward(self, x):
        x = x + self.token_mix(x)
        return x + self.channel_mix(x)


class _TorchMixer(nn.Module):
    def __init__(self, in_ch, hidden, patch, img, n_blocks, token_dim, channel_dim):
        super().__init__()
        n_tok = (img[0] // patch) * (img[1] // patch)
        self.to_patch_embedding = nn.Sequential(nn.Conv2d(in_ch, hidden, patch, patch))
        self.mixer_blocks = nn.ModuleList(
            [_Block(hidden, n_tok, token_dim, channel_dim) for _ in range(n_blocks)])
        self.layer_norm = nn.LayerNorm(hidden)

    def forward(self, x):
        x = self.to_patch_embedding(x).flatten(2).transpose(1, 2)
        for b in self.mixer_blocks:
            x = b(x)
        return self.layer_norm(x)


class _TorchFusionMixer(nn.Module):
    def __init__(self, hidden, n_tok, n_blocks, token_dim, channel_dim):
        super().__init__()
        self.mixer_blocks = nn.ModuleList(
            [_Block(hidden, n_tok, token_dim, channel_dim) for _ in range(n_blocks)])
        self.layer_norm = nn.LayerNorm(hidden)

    def forward(self, x):
        for b in self.mixer_blocks:
            x = b(x)
        return self.layer_norm(x)


class _TorchStdClassifier(nn.Module):
    def __init__(self, hidden, classes):
        super().__init__()
        self.classifer = nn.Linear(hidden, classes)  # reference typo kept

    def forward(self, x):
        return self.classifer(x.reshape(x.shape[0], -1, x.shape[-1]).mean(dim=1))


class _TorchMultiLoss(nn.Module):
    def __init__(self):
        super().__init__()
        self.image_mixer = _TorchMixer(1, 16, 14, (28, 28), 2, 8, 32)
        self.audio_mixer = _TorchMixer(1, 16, 56, (112, 112), 2, 8, 32)
        self.fusion_mixer = _TorchFusionMixer(16, 8, 1, 8, 32)
        self.classifier_image = nn.Linear(16, 10)
        self.classifier_audio = nn.Linear(16, 10)
        self.classifier_fusion = _TorchStdClassifier(16, 10)

    def forward(self, image, audio):
        ti = self.image_mixer(image)
        ta = self.audio_mixer(audio)
        tf = self.fusion_mixer(torch.cat([ti, ta], dim=1))
        return (self.classifier_fusion(tf),
                self.classifier_image(ti.mean(1)),
                self.classifier_audio(ta.mean(1)))


def test_reference_checkpoint_roundtrip():
    torch.manual_seed(0)
    ref_model = _TorchMultiLoss().eval()
    state = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}

    cfg = loads(CFG)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    variables = convert_reference_state_dict(state, ("image", "audio"))

    rng = np.random.RandomState(0)
    image = rng.randn(2, 1, 28, 28).astype(np.float32)
    audio = rng.randn(2, 1, 112, 112).astype(np.float32)

    outputs = task.network.apply(variables, inputs=(image, audio), deterministic=True)
    with torch.no_grad():
        t_fusion, t_img, t_aud = ref_model(torch.tensor(image), torch.tensor(audio))

    np.testing.assert_allclose(np.asarray(outputs["logits"]), t_fusion.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(outputs["branch_logits"][0]), t_img.numpy(), atol=3e-5)
    np.testing.assert_allclose(np.asarray(outputs["branch_logits"][1]), t_aud.numpy(), atol=3e-5)


def test_export_import_inverse():
    cfg = loads(CFG)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    batch = {"image": np.zeros((1, 1, 28, 28), np.float32),
             "audio": np.zeros((1, 1, 112, 112), np.float32),
             "label": np.zeros((1,), np.int32)}
    variables = task.init_params(jax.random.PRNGKey(0), batch)
    sd = export_reference_state_dict(
        variables, ("image", "audio"),
        patch_conv_shapes={"image": (1, 14, 14), "audio": (1, 56, 56)})
    back = convert_reference_state_dict(sd, ("image", "audio"))
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back["params"]))
    # every leaf of ours must roundtrip exactly (fusion callable has no params)
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[path]),
                                      err_msg=str(path))


MIMIC_CFG = """
model:
  type: MimicMixerMultiLoss
  dropout: 0.0
  modalities:
    classification: {num_classes: 6, classifier: StandardClassifier,
                     input_shape: [16, 1024, 16]}
    static: {block_type: MLP, input_dim: 5, hidden_dim: 8, num_blocks: 2,
             output_dim: 16}
    time: {block_type: MLPMixerNoPatching, embedding_dim: 12, proj_dim: 16,
           hidden_dim: 16, num_patch: 24, num_mixers: 1, token_dim: 8,
           channel_dim: 32}
    multimodal: {block_type: FusionMixer, fusion_function: ConcatFusion,
                 hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}
train:
  optimizer: {lr: 1e-3}
"""

GRU_CFG = """
model:
  type: MimicRecurrent
  dropout: 0.0
  modalities:
    classification: {num_classes: 6, classifier: StandardClassifier,
                     input_shape: [16, 1024, 12]}
    static: {block_type: MLP, input_dim: 5, hidden_dim: 8, num_blocks: 1,
             output_dim: 10}
    time: {block_type: GRU, input_dim: 12, hidden_dim: 6, flatten: true,
           batch_first: true}
    multimodal: {block_type: MLP, fusion_function: ConcatFusion,
                 input_dim: 154, hidden_dim: 12, num_blocks: 1}
train:
  optimizer: {lr: 1e-3}
"""


def _assert_roundtrip(variables, back):
    import jax as _jax

    flat_a = _jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = dict(_jax.tree_util.tree_leaves_with_path(back["params"]))
    for path, leaf in flat_a:
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(flat_b[path]),
                                      err_msg=str(path))


def test_mimic_export_import_inverse():
    """convert_mimic_state_dict is the exact inverse of
    export_mimic_state_dict (MLP module_list indices, NoPatching proj)."""
    from m2mixer_tpu.utils.torch_import import (
        convert_mimic_state_dict, export_mimic_state_dict)

    cfg = loads(MIMIC_CFG)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    batch = {"static": np.zeros((2, 5), np.float32),
             "time": np.zeros((2, 24, 12), np.float32),
             "label": np.zeros((2,), np.int32)}
    variables = task.init_params(jax.random.PRNGKey(1), batch)
    sd = export_mimic_state_dict(variables)
    _assert_roundtrip(variables, convert_mimic_state_dict(sd, cfg.model))


def test_mimic_gru_export_import_inverse():
    """convert_mimic_gru_state_dict inverts export_mimic_gru_state_dict
    bit-for-bit — possible only because TorchGRUCell carries torch's exact
    double-bias parameterization (no bias folding)."""
    from m2mixer_tpu.utils.torch_import import (
        convert_mimic_gru_state_dict, export_mimic_gru_state_dict)

    cfg = loads(GRU_CFG)
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    batch = {"static": np.zeros((2, 5), np.float32),
             "time": np.zeros((2, 24, 12), np.float32),
             "label": np.zeros((2,), np.int32)}
    variables = task.init_params(jax.random.PRNGKey(2), batch)
    sd = export_mimic_gru_state_dict(variables)
    # torch GRU stacked layout present
    assert sd["time_encoder.gru.weight_ih_l0"].shape == (18, 12)
    assert sd["time_encoder.gru.bias_hh_l0"].shape == (18,)
    _assert_roundtrip(variables, convert_mimic_gru_state_dict(sd, cfg.model))


def test_pnlp_text_export_import_inverse():
    """The PNLP-text families (MMHS 3-modal incl. the text_ocr naming)
    roundtrip through the generic reference converter."""
    from m2mixer_tpu.parity import small_image_text_cfg

    cfg = small_image_text_cfg("mmhs150", "/tmp/unused_ti")
    task = get_model(cfg.model.type)(cfg.model, cfg.train.optimizer)
    mi = cfg.model.modalities.image
    batch = {"image": np.zeros((2, 3, 32, 32), np.float32),
             "text": np.zeros((2, 8, 48), np.float32),
             "ocr": np.zeros((2, 8, 48), np.float32),
             "label": np.zeros((2,), np.int32),
             "use_features": np.ones((2,), np.float32),
             "use_features_ocr": np.ones((2,), np.float32)}
    variables = task.init_params(jax.random.PRNGKey(3), batch)
    sd = export_reference_state_dict(
        variables, ("image", "text", "text_ocr"),
        patch_conv_shapes={"image": (3, 16, 16)})
    back = convert_reference_state_dict(sd, ("image", "text", "ocr"))
    _assert_roundtrip(variables, back)
