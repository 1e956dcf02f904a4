"""VGG19-bn torch-weight import parity.

A randomly-initialized plain-torch VGG19-bn (built with torchvision's exact
module layout and state_dict naming — torchvision itself is not installed in
this image) is converted via ``load_torch_state`` and must produce the same
logits as the flax ``VGG19BN`` in eval mode. This is the importer the
reference baseline needs to reproduce its pretrained fine-tune
(`/root/reference/models/mmimdb_gmlp.py:19-28`).
"""

import numpy as np
import pytest
import torch
from torch import nn as tnn

import jax

from m2mixer_tpu.models.mmimdb import VGG19BN, _VGG19_PLAN, load_torch_state


def _torch_vgg19_bn(num_classes: int) -> tnn.Module:
    """torchvision.models.vgg19_bn layout: features/avgpool/classifier with
    the same Sequential indices, so state_dict keys match torchvision's."""
    layers, in_ch = [], 3
    for spec in _VGG19_PLAN:
        if spec == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(in_ch, spec, 3, padding=1),
                       tnn.BatchNorm2d(spec), tnn.ReLU(inplace=True)]
            in_ch = spec

    class VGG(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(*layers)
            self.avgpool = tnn.AdaptiveAvgPool2d((7, 7))
            self.classifier = tnn.Sequential(
                tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(True), tnn.Dropout(),
                tnn.Linear(4096, 4096), tnn.ReLU(True), tnn.Dropout(),
                tnn.Linear(4096, num_classes),
            )

        def forward(self, x):
            x = self.avgpool(self.features(x))
            return self.classifier(torch.flatten(x, 1))

    return VGG()


@pytest.fixture(scope="module")
def torch_net():
    torch.manual_seed(0)
    net = _torch_vgg19_bn(23)
    # non-trivial running stats so the batch_stats import is actually tested
    with torch.no_grad():
        net(torch.rand(2, 3, 64, 64))  # train=false; update stats manually
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.normal_(0, 0.1)
                m.running_var.uniform_(0.5, 1.5)
    net.eval()
    return net


def test_forward_parity_after_import(torch_net):
    x = np.random.RandomState(1).rand(2, 3, 224, 224).astype(np.float32)
    with torch.no_grad():
        ref = torch_net(torch.from_numpy(x)).numpy()

    flax_net = VGG19BN(num_classes=23)
    variables = flax_net.init(jax.random.PRNGKey(0), np.zeros((1, 3, 224, 224), np.float32))
    variables = load_torch_state(variables, torch_net.state_dict())
    out = np.asarray(flax_net.apply(variables, x, deterministic=True))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_imagenet_head_is_swapped_not_imported(torch_net):
    """A 1000-class (ImageNet-pretrained-shaped) state_dict keeps the fresh
    23-class head — the reference's classifier[6] swap."""
    torch.manual_seed(1)
    imagenet = _torch_vgg19_bn(1000)
    imagenet.eval()
    flax_net = VGG19BN(num_classes=23)
    variables = flax_net.init(jax.random.PRNGKey(0), np.zeros((1, 3, 224, 224), np.float32))
    fresh_head = np.asarray(variables["params"]["fc3"]["linear"]["kernel"])
    imported = load_torch_state(variables, imagenet.state_dict())
    assert imported["params"]["fc3"]["linear"]["kernel"].shape == (4096, 23)
    np.testing.assert_array_equal(imported["params"]["fc3"]["linear"]["kernel"], fresh_head)
    # but the trunk IS imported
    got = imported["params"]["conv_0"]["kernel"]
    want = imagenet.state_dict()["features.0.weight"].numpy().transpose(2, 3, 1, 0)
    np.testing.assert_array_equal(got, want)
    # and BN running stats landed in batch_stats
    np.testing.assert_array_equal(
        imported["batch_stats"]["bn_0"]["mean"],
        imagenet.state_dict()["features.1.running_mean"].numpy())
