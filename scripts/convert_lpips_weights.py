#!/usr/bin/env python3
"""Convert public LPIPS-VGG16 weights to the npz layout models/lpips.py loads.

Two supported sources (run wherever you have the files; this container has
no egress):
  1. torchvision VGG16 ``features`` state_dict (vgg16-*.pth) + the LPIPS
     repo's ``vgg.pth`` linear heads (richzhang/PerceptualSimilarity),
  2. the reference's ``vgg16_zhang_perceptual.pkl`` (TF Network pickle) —
     requires a TF1 environment to unpickle; extract variables first with
     scripts/dump_reference_pkl.py there, then feed the npz here.

Output keys: ``<convN_M>_w`` [3,3,Cin,Cout] (HWIO), ``<convN_M>_b`` [Cout],
``lin_<tap>`` [C]."""

import argparse

import numpy as np

_TORCH_FEATURE_IDX = {  # torchvision vgg16.features conv indices
    "conv1_1": 0, "conv1_2": 2, "conv2_1": 5, "conv2_2": 7,
    "conv3_1": 10, "conv3_2": 12, "conv3_3": 14,
    "conv4_1": 17, "conv4_2": 19, "conv4_3": 21,
    "conv5_1": 24, "conv5_2": 26, "conv5_3": 28,
}
_TAPS = ["conv1_2", "conv2_2", "conv3_3", "conv4_3", "conv5_3"]


def convert(vgg_sd, lpips_sd=None):
    """torchvision vgg16 state_dict (+ optional richzhang LPIPS linear
    heads) → our npz key layout. Testable core of the CLI."""
    out = {}
    for name, idx in _TORCH_FEATURE_IDX.items():
        w = vgg_sd[f"features.{idx}.weight"].numpy()  # [O,I,kh,kw]
        out[f"{name}_w"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        out[f"{name}_b"] = vgg_sd[f"features.{idx}.bias"].numpy()

    if lpips_sd is not None:
        for i, tap in enumerate(_TAPS):
            w = lpips_sd[f"lin{i}.model.1.weight"].numpy()  # [1,C,1,1]
            out[f"lin_{tap}"] = w.reshape(-1)
    else:
        for tap in _TAPS:
            c = out[f"{tap}_w"].shape[-1]
            out[f"lin_{tap}"] = np.full((c,), 1.0 / c, np.float32)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--vgg16-pth", required=True,
                        help="torchvision vgg16 state_dict .pth")
    parser.add_argument("--lpips-pth", default=None,
                        help="richzhang LPIPS vgg.pth linear heads")
    parser.add_argument("--out", required=True)
    args = parser.parse_args()

    import torch
    sd = torch.load(args.vgg16_pth, map_location="cpu")
    lp = (torch.load(args.lpips_pth, map_location="cpu")
          if args.lpips_pth else None)
    out = convert(sd, lp)
    np.savez(args.out, **out)
    print(f"saved {args.out} with {len(out)} arrays")


if __name__ == "__main__":
    main()
