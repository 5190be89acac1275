#!/usr/bin/env python3
"""Convert torchvision InceptionV3 weights to the npz layout
models/inception.py loads (run where the .pth is available; this container
has no egress).

Source: torchvision ``inception_v3`` state_dict (or the pytorch-fid variant
``pt_inception-2015-12-05`` for bit-exact FID parity with the TF graph).
Mapping: torchvision module paths → our '<block>.<branch>' names; BN has
scale=None in both (weight ≡ 1) — we export beta/mean/var and fold the BN
weight if present.
"""

import argparse

import numpy as np


def convert(state_dict, num_logits=1008):
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
            g = gamma.numpy()
            # fold scale into conv weight so our scale-free BN is exact
            w = w * g[:, None, None, None]
            beta = beta  # beta already in output units
            mean = mean * g
            var = var * g * g
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
