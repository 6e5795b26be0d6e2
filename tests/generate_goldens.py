"""Regenerate tests/goldens/*.npz — the frozen torch-parity goldens.

Requires torch (+ transformers for the BERT golden). Run from the repo
root:  python tests/generate_goldens.py

Each golden records INPUTS and EXPECTED OUTPUTS only; the (large) weights
are re-synthesized deterministically on both sides from golden_utils specs.
Before writing a golden this script loads the synthesized state_dict into a
real torch module with strict naming, so a spec that drifts from the
torchvision/HF contract fails here, not silently in CI.

The goldens freeze the same computations the live torch tests check
(test_logmel.py, test_torch_import.py::test_{resnet18,vgg11_bn,lstm}_
conversion_numerics, test_bert.py::test_hf_bert_conversion_parity) so the
default lane keeps numeric parity coverage in torch-free images.
"""

import os
import sys

import numpy as np
import torch
import torch.nn as tnn

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import golden_utils as G  # noqa: E402

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def gen_logmel():
    from multimodal_lipread_tpu.ops import logmel as lm

    r = np.random.default_rng(G.SEED)
    waves = (r.standard_normal((2, lm.NUM_SAMPLES)) * 5000).astype(np.float32)
    x = torch.from_numpy(waves.astype(np.float64))
    window = torch.hann_window(lm.N_FFT, dtype=torch.float64)
    stft = torch.stft(x, n_fft=lm.N_FFT, hop_length=lm.HOP_LENGTH,
                      win_length=lm.N_FFT, window=window, center=True,
                      pad_mode="reflect", normalized=False, onesided=True,
                      return_complex=True)
    power = stft.abs() ** 2 / window.pow(2).sum()
    fb = torch.from_numpy(lm.mel_filterbank().astype(np.float64))
    mel = torch.matmul(power.transpose(-1, -2), fb).transpose(-1, -2)
    raw = torch.log(mel + lm.LOG_EPS)
    norm = torch.stack([(s - s.mean()) / (s.std() + lm.NORM_EPS) for s in raw])
    np.savez_compressed(os.path.join(OUT, "logmel.npz"), waves=waves,
                        want_raw=raw.numpy().astype(np.float32),
                        want_norm=norm.numpy().astype(np.float32))
    print("logmel.npz", raw.shape)


def gen_lstm():
    spec = G.lstm_spec(**G.LSTM_CFG)
    sd = G.synth_state(spec, G.SEED)
    tlstm = tnn.LSTM(input_size=12, hidden_size=8, num_layers=2,
                     bidirectional=True, batch_first=True).eval()
    tlstm.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    x = np.random.default_rng(G.SEED + 1).standard_normal((3, 5, 12)).astype(np.float32)
    with torch.no_grad():
        ref, _ = tlstm(torch.from_numpy(x))
    np.savez_compressed(os.path.join(OUT, "lstm.npz"), x=x, want=ref.numpy())
    print("lstm.npz", ref.shape)


class _BasicBlock(tnn.Module):
    def __init__(self, c_in, c_out, stride=1):
        super().__init__()
        self.conv1 = tnn.Conv2d(c_in, c_out, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(c_out)
        self.conv2 = tnn.Conv2d(c_out, c_out, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(c_out)
        self.downsample = None
        if stride != 1 or c_in != c_out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(c_in, c_out, 1, stride, bias=False),
                tnn.BatchNorm2d(c_out))

    def forward(self, x):
        idt = x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return torch.relu(y + idt)


class _ResNet18(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(64)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        chans = [64, 64, 128, 256, 512]
        for i in range(4):
            stride = 1 if i == 0 else 2
            setattr(self, f"layer{i + 1}", tnn.Sequential(
                _BasicBlock(chans[i], chans[i + 1], stride),
                _BasicBlock(chans[i + 1], chans[i + 1])))

    def forward(self, x):
        x = torch.relu(self.bn1(self.conv1(x)))
        x = self.maxpool(x)
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        return x.mean(dim=(2, 3))


def gen_resnet18():
    spec = G.resnet18_spec()
    sd = G.synth_state(spec, G.SEED)
    tmodel = _ResNet18().eval()
    tmodel.load_state_dict({k: torch.from_numpy(v) for k, v in sd.items()})
    x = np.random.default_rng(G.SEED + 2).standard_normal((2, 3, 44, 44)).astype(np.float32)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(x)).numpy()
    assert np.abs(ref).max() > 1e-3, "degenerate activations"
    np.savez_compressed(os.path.join(OUT, "resnet18.npz"), x=x, want=ref)
    print("resnet18.npz", ref.shape, "absmax", np.abs(ref).max())


def gen_vgg11():
    spec = G.vgg11_bn_features_spec()
    sd = G.synth_state(spec, G.SEED)
    cfg = [64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"]
    layers, c_in = [], 3
    for v in cfg:
        if v == "M":
            layers.append(tnn.MaxPool2d(2, 2))
        else:
            layers += [tnn.Conv2d(c_in, v, 3, padding=1), tnn.BatchNorm2d(v),
                       tnn.ReLU(True)]
            c_in = v
    features = tnn.Sequential(*layers).eval()
    features.load_state_dict(
        {k[len("features."):]: torch.from_numpy(v) for k, v in sd.items()})
    x = np.random.default_rng(G.SEED + 3).standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = features(torch.from_numpy(x)).numpy()
    assert np.abs(ref).max() > 1e-3, "degenerate activations"
    np.savez_compressed(os.path.join(OUT, "vgg11.npz"), x=x,
                        want_nhwc=np.transpose(ref, (0, 2, 3, 1)))
    print("vgg11.npz", ref.shape, "absmax", np.abs(ref).max())


def gen_bert():
    import transformers

    c = G.BERT_CFG
    hf_cfg = transformers.BertConfig(
        vocab_size=c["vocab"], hidden_size=c["hidden"], num_hidden_layers=c["layers"],
        num_attention_heads=4, intermediate_size=c["intermediate"],
        max_position_embeddings=c["max_pos"], num_labels=c["num_labels"],
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    tmodel = transformers.BertForSequenceClassification(hf_cfg).eval()
    spec = G.hf_bert_cls_spec(**c)
    sd = G.synth_state(spec, G.SEED)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False)
    assert not unexpected, unexpected
    # HF versions keep non-parameter buffers (position_ids) out of our spec
    assert all("position_ids" in k for k in missing), missing
    ids = np.array([[101, 5, 6, 7, 102, 0, 0, 0],
                    [101, 9, 102, 0, 0, 0, 0, 0]], np.int32)
    mask = (ids != 0).astype(np.int64)
    with torch.no_grad():
        ref = tmodel(torch.from_numpy(ids.astype(np.int64)),
                     attention_mask=torch.from_numpy(mask)).logits.numpy()
    np.savez_compressed(os.path.join(OUT, "bert.npz"), ids=ids, want=ref)
    print("bert.npz", ref.shape)


if __name__ == "__main__":
    os.makedirs(OUT, exist_ok=True)
    gen_logmel()
    gen_lstm()
    gen_resnet18()
    gen_vgg11()
    gen_bert()
    print("done:", sorted(os.listdir(OUT)))
