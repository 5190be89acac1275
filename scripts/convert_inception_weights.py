#!/usr/bin/env python3
"""Convert torchvision InceptionV3 weights to the npz layout
models/inception.py loads (run where the .pth is available; this container
has no egress).

Source: torchvision ``inception_v3`` state_dict (or the pytorch-fid variant
``pt_inception-2015-12-05`` for bit-exact FID parity with the TF graph).
Mapping: torchvision module paths → our '<block>.<branch>' names; the TF
graph's BN has scale=False (weight ≡ 1); when the torch source carries a
trained gamma we fold it EXACTLY into (weight, mean, var) so our scale-free
BN (models/inception.py::_bconv, eps=1e-3) reproduces the affine BN:

    g·(c−m)/sqrt(v+eps) + b  ≡  (c′−m′)/sqrt(v′+eps) + b
    with  c′ = conv(x, w·sign(g)),  m′ = m·sign(g),
          v′ = (v+eps)/g² − eps   (may be slightly negative; v′+eps > 0
                                   always holds, which is all rsqrt needs)

The naive fold (w·g, m·g, v·g²) is NOT exact: sqrt(g²v+eps) ≠ g·sqrt(v+eps),
with relative error up to tens of percent when v ≲ eps and g is far from 1.
"""

import argparse

import numpy as np

BN_EPS = 1e-3  # must match models/inception.py::BN_EPS


def convert(state_dict, num_logits=1008, eps=BN_EPS):
    out = {}
    names = {k for k in state_dict}
    convs = sorted({k[:-len(".conv.weight")] for k in names
                    if k.endswith(".conv.weight")})
    for mod in convs:
        w = state_dict[f"{mod}.conv.weight"].numpy()       # [O,I,kh,kw]
        beta = state_dict[f"{mod}.bn.bias"].numpy()
        mean = state_dict[f"{mod}.bn.running_mean"].numpy()
        var = state_dict[f"{mod}.bn.running_var"].numpy()
        gamma = state_dict.get(f"{mod}.bn.weight")
        if gamma is not None:
            g = gamma.numpy().astype(np.float64)
            dead = np.abs(g) < 1e-8       # g≈0 ⇒ channel output is just beta
            s = np.where(dead, 0.0, np.sign(g))
            w = w * s[:, None, None, None].astype(w.dtype)
            mean = np.where(dead, 0.0, mean * s)
            var = np.where(dead, 1.0,
                           (var + eps) / np.maximum(g * g, 1e-16) - eps)
            mean = mean.astype(np.float32)
            var = var.astype(np.float32)
        name = mod  # torchvision names match ours (Mixed_5b.branch1x1, ...)
        out[f"{name}.w"] = np.transpose(w, (2, 3, 1, 0))   # HWIO
        out[f"{name}.beta"] = beta
        out[f"{name}.mean"] = mean
        out[f"{name}.var"] = var
    if "fc.weight" in names:
        fc_w = state_dict["fc.weight"].numpy()  # [1000, 2048]
        w = np.zeros((2048, num_logits), np.float32)
        w[:, 1:1 + fc_w.shape[0]] = fc_w.T      # TF's 1008-way layout offset
        b = np.zeros((num_logits,), np.float32)
        b[1:1 + fc_w.shape[0]] = state_dict["fc.bias"].numpy()
        out["logits.w"] = w
        out["logits.b"] = b
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--inception-pth", required=True)
    parser.add_argument("--out", required=True)
    args = parser.parse_args()
    import torch
    sd = torch.load(args.inception_pth, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = convert(sd)
    np.savez(args.out, **out)
    print(f"saved {args.out} with {len(out)} arrays")


if __name__ == "__main__":
    main()
