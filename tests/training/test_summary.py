"""Model inspection CLI (python -m m2mixer_tpu.summary).

The reference surfaces only Lightning's fit-time parameter count; the
summary tool must report the module tree, per-branch parameter totals, and
XLA cost-model FLOPs for any shipped config WITHOUT training (and without a
device round trip — cost analysis comes from the pre-optimization HLO).
"""

import json

from m2mixer_tpu.config import loads
from m2mixer_tpu.summary import main, summarize

CFG = """
train:
  epochs: 1
  optimizer: {{lr: 1e-3, weight_decay: 0.0}}
  seed: 3
dataset:
  type: AVMnistDataModule
  params: {{data_dir: unused, batch_size: 16, num_workers: 0, synthetic: true,
            synthetic_sizes: [32, 16, 16]}}
model:
  type: AVMnistMixerMultiLoss
  dropout: 0.1
  modalities:
    classification: {{num_classes: 10, classifier: StandardClassifier,
                      input_shape: [16, 8, 16]}}
    image: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 14,
             image_size: [28, 28], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    audio: {{block_type: MLPMixer, in_channels: 1, hidden_dim: 16, patch_size: 56,
             image_size: [112, 112], token_dim: 8, channel_dim: 32, num_mixers: 1}}
    multimodal: {{block_type: FusionMixer, fusion_function: ConcatFusion,
                  hidden_dim: 16, token_dim: 8, channel_dim: 32, num_mixers: 1}}
"""


def test_summarize_reports_params_and_flops(tmp_path):
    cfg = loads(CFG.format(tmp=tmp_path))
    info = summarize(cfg, batch_size=8, depth=1)

    assert info["batch_size"] == 8
    totals = info["params"]
    # every top-level branch accounted for, totals consistent
    for branch in ("encoders_0", "encoders_1", "fusion_mixer", "classifier"):
        assert totals[branch]["params"] > 0
    assert totals["total"]["params"] == sum(
        t["params"] for k, t in totals.items() if k != "total")
    # dropout collections must not leak into parameter totals
    assert totals["total"]["bytes"] == sum(
        t["bytes"] for k, t in totals.items() if k != "total")

    # XLA cost-model FLOPs: train step strictly dominates eval forward
    fl = info["flops"]
    assert fl["forward_per_sample"] and fl["forward_per_sample"] > 0
    assert fl["train_step_per_sample"] > fl["forward_per_sample"]

    # module tree rendered with the requested batch
    assert "MLPMixer" in info["table"] and "FusionMixer" in info["table"]
    assert "[8," in info["table"].replace(" ", "").replace("float32", "")

    # throughput ceiling is labeled a projection on non-TPU hosts
    if "ceiling_samples_per_sec" in info:
        assert info["device"]["projected"] is True
        assert info["ceiling_samples_per_sec"]["mfu_100"] > 0


def test_summary_cli_json_and_overrides(tmp_path, capsys):
    cfg_path = tmp_path / "cfg.yml"
    cfg_path.write_text(CFG.format(tmp=tmp_path))
    info = main(["-c", str(cfg_path), "--batch", "4", "--json",
                 "model.dropout=0.0"])
    out = capsys.readouterr().out
    payload = json.loads(out)
    assert payload["batch_size"] == 4
    assert payload["params"]["total"]["params"] == \
        info["params"]["total"]["params"]
    assert "table" not in payload  # --json omits the rendered tree

    # human-readable mode prints the table and the totals line
    main(["-c", str(cfg_path), "--batch", "4", "--depth", "1"])
    out = capsys.readouterr().out
    assert "TOTAL" in out and "flops/sample" in out
